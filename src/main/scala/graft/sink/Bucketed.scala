package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed (hash-clustered, sorted) tables: the storage-side answer to
  * repeated big-to-big joins on the same key. Writing both sides
  * bucketed by the join key means the join's distribution requirement
  * is already satisfied — no Exchange at query time. At 100 TB this
  * converts every recurring fact-to-fact join (e.g. lineitem-orders)
  * from a full shuffle into a zipped per-bucket merge.
  */
object Bucketed {

  def write(df: DataFrame, table: String, bucketCols: Seq[String], buckets: Int): Unit =
    df.write
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
