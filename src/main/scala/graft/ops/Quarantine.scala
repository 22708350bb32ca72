package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference swallows malformed rows silently (every DoFn catches,
  * logs, yields nothing — SURVEY.md §2 P5). We split instead: valid
  * rows flow on, invalid rows land in a quarantine side-channel with a
  * reason column — nothing is silently dropped, and the split is two
  * filters over one scan (Spark reuses the cached/columnar scan; no
  * extra shuffle).
  */
object Quarantine {

  /** The reference pipeline's validity contract for CDC envelopes:
    * known operation; upserts carry data; watched/duration invariant.
    */
  def envelopeValidity(opCol: String = "operation", dataCol: String = "data"): Column = {
    val op = col(opCol)
    val knownOp = op.isin("insert", "update", "delete")
    val dataPresent = (op === "delete") || col(dataCol).isNotNull
    val invariant = (op === "delete") ||
      (col(s"$dataCol.watched_seconds") >= 0 &&
        col(s"$dataCol.watched_seconds") <= col(s"$dataCol.video_duration_seconds"))
    knownOp && dataPresent && invariant
  }

  /** (valid, quarantined-with-reason) split. */
  def split(df: DataFrame, validity: Column): (DataFrame, DataFrame) = {
    val valid = df.filter(validity)
    val bad = df.filter(!coalesce(validity, lit(false)))
      .withColumn("quarantine_reason",
        when(!col("operation").isin("insert", "update", "delete"), "unknown_operation")
          .when(col("operation") =!= "delete" && col("data").isNull, "missing_data")
          .otherwise("invariant_violation"))
    (valid, bad)
  }
}
