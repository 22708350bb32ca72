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

  /** Batch JSON-lines CDC envelopes: (good rows, quarantined lines). */
  def cdcJson(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val raw = spark.read
      .schema(withCorrupt(Schemas.envelopeSchema))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)
      // Spark requires referencing the corrupt column via a cached
      // plan only after a select touching all columns; keep it simple
      // and split eagerly on nullity of the corrupt column.
      .cache()
    val good = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val bad = raw.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
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
