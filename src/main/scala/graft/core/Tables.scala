package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. /root/testdata/sf0.01) so the same
  * code runs at any scale factor. At cluster scale these would be
  * catalog tables; a plain parquet read keeps predicate pushdown +
  * column pruning (verify via .explain: PushedFilters / ReadSchema).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** events.parquet's `ts` encoding has varied across testdata
    * generations: TIMESTAMP(NANOS) in some drops (which Spark's
    * vectorized reader rejects — [PARQUET_TYPE_ILLEGAL] — unless read
    * as raw Long nanos via the legacy conf) and TIMESTAMP(MICROS,
    * isAdjustedToUTC=false) in others (read as TIMESTAMP_NTZ). Adapt
    * to whatever the footer says and normalize `ts` to session-UTC
    * TimestampType, which is what every downstream query (and the
    * DuckDB oracle, session tz = UTC) assumes.
    *
    * The nanos→micros conversion uses integer division — `ts div 1000`
    * stays in Long; a double intermediate would lose precision at
    * 1.7e18 ns. The legacy conf is only set on the nanos path (a plain
    * read throws there), never unconditionally.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw =
      try load(s, d, "events")
      catch {
        // ONLY the nanos-footer schema rejection takes the legacy-conf
        // retry; anything else (missing file, corrupt footer, perms)
        // must propagate as itself — a blanket catch would misdiagnose
        // real failures as encoding problems AND leave the legacy conf
        // flipped on the session.
        case e: Throwable if e.toString.contains("PARQUET_TYPE_ILLEGAL") ||
            e.toString.contains("Illegal Parquet type") =>
          s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
          load(s, d, "events")
      }
    raw.schema("ts").dataType match {
      case LongType            => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType    => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType       => raw
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet type $other (expected long/timestamp/timestamp_ntz)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
