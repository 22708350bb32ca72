package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import graft.core.Schemas

/** Text-format ingestion for the reference's wire formats
  * (SURVEY.md §2.1): the CDC envelope travels as JSON
  * (producer/producer.py:68, json_util.dumps), so a user replaying a
  * captured queue dump has JSON-lines, not parquet.
  *
  * Scale posture:
  *  - schema is ALWAYS explicit — `inferSchema` makes an extra full
  *    pass over 100 TB before the real read, and JSON inference can
  *    widen types per-file;
  *  - PERMISSIVE mode with a corrupt-record column: one malformed
  *    line must not kill a 1000-executor job (the reference nack+
  *    requeues poison messages forever, README.md:225-226 — we
  *    quarantine them instead);
  *  - the same schema object drives batch and readStream, so the
  *    streaming path can't drift from the batch one.
  */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType =
    StructType(schema.fields :+ StructField(CorruptCol, StringType, nullable = true))

  /** Batch JSON-lines CDC envelopes: (good rows, quarantined lines).
    *
    * Caches the parsed input to split it in ONE scan (Spark requires a
    * materialization boundary before filtering on the corrupt column).
    * Right default when the batch fits cluster cache — a micro-batch
    * or an hourly drop does; for a 100 TB backfill use
    * `cdcJsonTwoPass`, which trades a second file scan for zero
    * memory pressure.
    */
  private def cdcJsonSplit(spark: SparkSession, path: String)
      : (DataFrame, DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(Schemas.envelopeSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (raw, good, bad)
  }

  def cdcJson(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val (_, good, bad) = cdcJsonSplit(spark, path)
    (good, bad)
  }

  /** Loan-pattern variant of [[cdcJson]]: runs `body` over the split
    * and UNPERSISTS the shared parsed frame on every exit path — the
    * variant to use when the caller isn't a harness that clears the
    * session cache itself (Bench/Verify do; ad-hoc callers forget).
    */
  def withCdcJson[T](spark: SparkSession, path: String)
                    (body: (DataFrame, DataFrame) => T): T = {
    val (raw, good, bad) = cdcJsonSplit(spark, path)
    try body(good, bad)
    finally raw.unpersist()
  }

  /** Cache-free split for inputs larger than cluster cache capacity:
    * lines are read as text; syntactic validity is decided by
    * `get_json_object(value, '$')` (NULL for an unparseable line —
    * `from_json`'s PERMISSIVE mode can't be the detector because it
    * returns an all-null ROW for malformed input, indistinguishable
    * from a valid `{}`). Each side is an independent scan + filter,
    * nothing is materialized, and the JSON reader's
    * "corrupt-column-only queries need a cache" restriction never
    * applies. Costs a second pass over the files — the right trade at
    * backfill scale, where caching 100 TB is not an option and the
    * quarantine side is read rarely.
    *
    * Semantic note vs `cdcJson`: quarantine means UNPARSEABLE line
    * here; a parseable line with a type-mismatched field degrades that
    * field to NULL (PERMISSIVE) instead of quarantining the line —
    * downstream `Quarantine.split` validity rules catch those.
    */
  def cdcJsonTwoPass(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val parseable = get_json_object(col("value"), "$").isNotNull
    def lines = spark.read.textFile(path).toDF("value") // fresh plan per side
    val good = lines.filter(parseable)
      .select(from_json(col("value"), Schemas.envelopeSchema).as("r"))
      .select(col("r.*"))
    val bad = lines.filter(!parseable).select(col("value").as("raw_line"))
    (good, bad)
  }

  /** Streaming JSON-lines CDC envelopes over a directory (the file-
    * drop twin of the reference's queue consumer, S4). Same explicit
    * schema as batch.
    */
  def cdcJsonStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream
      .schema(Schemas.envelopeSchema)
      .option("mode", "PERMISSIVE")
      .json(dir)

  /** Schema-evolution parquet read: a long-lived lake accretes columns
    * over time, and `mergeSchema` unions the per-file footers so old
    * files surface the new columns as NULL. Off by default in Spark
    * because footer-merging costs a pass over file metadata — at
    * 100 TB pin the evolved schema explicitly (`.schema(...)`) once
    * known and fall back to this only at discovery time.
    */
  def parquetEvolving(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** CSV for flat (non-nested) tables with an explicit schema; header
    * tolerated but never used for typing.
    */
  def flatCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("mode", "PERMISSIVE")
      .csv(path)
}
