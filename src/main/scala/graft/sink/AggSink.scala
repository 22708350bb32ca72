package graft.sink

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Incremental AGGREGATE maintenance — the materialized-view twin of
  * `MergeSink` (same hash-bucketed, partition-pruned table layout;
  * different merge algebra): where MergeSink keeps the LATEST row per
  * key, AggSink keeps commutative-monoid aggregates (sums + counts)
  * per key and FOLDS each micro-batch's partials in, so a 100 TB
  * events history never has to be re-scanned to refresh the analytics
  * table.
  *
  * Per batch: (1) the batch pre-aggregates to one partial row per key
  * (map-side combinable); (2) only the bucket partitions containing
  * those keys are read; (3) partials add to the stored aggregates —
  * sums of sums, counts of counts, all associative + commutative, so
  * any batch slicing converges to the whole-history aggregate; (4)
  * only touched buckets rewrite via dynamic partition overwrite.
  *
  * EXACTNESS: sum columns should be decimal or integral — float sums
  * depend on addition order across batches, exact types do not (the
  * same discipline as q73's integer moments). avg = sum/count at read.
  *
  * Replay caution: unlike the LWW merge, addition is NOT idempotent —
  * re-delivering a batch double-counts. Structured Streaming's
  * checkpoint provides the exactly-once batch-id fence (foreachBatch
  * re-runs a failed batch only from its recorded offset range, and
  * `lastBatchId` lets the caller skip an already-applied batch id).
  */
final class AggSink(
    spark: SparkSession,
    val path: String,
    keys: Seq[String],
    sumCols: Seq[String],
    nBuckets: Int = 64) {

  import MergeSink.BucketCol
  private val CountCol = "n_rows"

  private def bucketOf: Column = pmod(hash(keys.map(col): _*), lit(nBuckets))

  private def tableExists: Boolean = {
    val p = new Path(path)
    p.getFileSystem(spark.sessionState.newHadoopConf()).exists(p)
  }

  /** Current aggregate state: keys ++ sumCols ++ n_rows. */
  def read(): DataFrame = spark.read.parquet(path).drop(BucketCol)

  private def aggregate(df: DataFrame): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
           (sumCols.tail.map(c => sum(col(c)).as(c)) :+
             sum(col(CountCol)).as(CountCol)): _*)

  /** Fold one micro-batch of RAW rows into the aggregate table. */
  def merge(batch: DataFrame): Unit = {
    val partial = batch.groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
           (sumCols.tail.map(c => sum(col(c)).as(c)) :+
             count(lit(1)).cast("long").as(CountCol)): _*)
    val touched = partial.select(bucketOf.as(BucketCol)).distinct()
      .collect().map(_.getInt(0)).toSeq
    if (touched.isEmpty) return
    val base =
      if (tableExists)
        spark.read.parquet(path)
          .filter(col(BucketCol).isin(touched: _*)).drop(BucketCol)
          .unionByName(partial)
      else partial
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    aggregate(base)
      .withColumn(BucketCol, bucketOf)
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
  }

  /** foreachBatch adapter with an applied-batch-id fence: re-delivered
    * batch ids (restart replay of a batch whose write completed) are
    * skipped, keeping the non-idempotent addition effectively-once.
    */
  def forEachBatch: (DataFrame, Long) => Unit = {
    (batch, id) =>
      if (id > lastBatchId) { merge(batch); writeLastBatchId(id) }
  }

  private def fenceFile = new Path(path + "_applied_batch")

  /** Highest batch id applied through `forEachBatch` (-1 if none). */
  def lastBatchId: Long = {
    val fs = fenceFile.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(fenceFile)) -1L
    else {
      val in = fs.open(fenceFile)
      try scala.io.Source.fromInputStream(in).mkString.trim.toLong
      finally in.close()
    }
  }

  private def writeLastBatchId(id: Long): Unit = {
    val fs = fenceFile.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(fenceFile, true)
    try out.write(id.toString.getBytes("UTF-8")) finally out.close()
  }
}
