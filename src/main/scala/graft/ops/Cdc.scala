package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference pipeline's operator surface, re-expressed as pure
  * Catalyst column transforms (no UDFs — everything whole-stage
  * codegen'd).
  *
  * Reference behavior being reproduced (see SURVEY.md §2):
  *  - P1 enrich: `consumer/DoFns/calculate_watched_ratio.py:4-19` —
  *    watched_ratio = round(watched/duration, 4), 0 when duration <= 0,
  *    missing watched -> 0, missing duration -> 1.
  *  - P2 flatten: `consumer/DoFns/modify_structure.py:4-21` — un-nest
  *    the CDC envelope {operation, document_id, data:{...}}.
  *  - P3 route: `consumer/DoFns/load_data.py:22-25` — insert/update ->
  *    upsert, delete -> tombstone, anything else dropped.
  *  - A1 LWW dedup: `clickhouse/init.sql:22-24` ReplacingMergeTree —
  *    keep the last-written row per key. We make tie-breaking
  *    deterministic (reference is last-physical-insert, i.e. arbitrary).
  *  - S7 soft delete: `consumer/DoFns/load_data.py:68-101` — tombstone
  *    rows with is_deleted=true, filtered at read.
  *  - A2 analytics: `README.md:221` — avg watched ratio per video.
  */
object Cdc {

  /** P1. Null-safe watched-ratio enrichment.
    * Divide-by-zero guard and missing-field defaults mirror
    * calculate_watched_ratio.py:9-13. Rounding is Spark HALF_UP
    * (documented divergence from Python banker's rounding, SURVEY §7).
    */
  def watchedRatio(watched: Column, duration: Column): Column =
    round(watchedRatioRaw(watched, duration), 4)

  /** Unrounded variant: per-row IEEE division is bit-identical across
    * engines, which keeps oracle hash-compares stable; round(x, 4)
    * near half-boundaries is where engines disagree.
    */
  def watchedRatioRaw(watched: Column, duration: Column): Column = {
    val w = coalesce(watched, lit(0.0))
    val d = coalesce(duration, lit(1.0))
    when(d > 0, w / d).otherwise(lit(0.0))
  }

  def enrichWatchedRatio(df: DataFrame,
                         watchedCol: String = "watched_seconds",
                         durationCol: String = "video_duration_seconds",
                         rounded: Boolean = true): DataFrame = {
    val ratio =
      if (rounded) watchedRatio(col(watchedCol), col(durationCol))
      else watchedRatioRaw(col(watchedCol), col(durationCol))
    df.withColumn("watched_ratio", ratio)
  }

  /** P2. Flatten the nested CDC envelope {operation, document_id,
    * timestamp, data:{...}} into a flat record. Null-safe for delete
    * events where data is NULL (producer.py:61). Pure projection —
    * Catalyst prunes unused envelope fields at the scan.
    */
  def flattenEnvelope(df: DataFrame, dataCol: String = "data"): DataFrame = {
    val dataFields = df.schema(dataCol).dataType match {
      case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
      case other => sys.error(s"$dataCol is not a struct: $other")
    }
    val top = df.columns.filterNot(_ == dataCol).map(col).toSeq
    df.select(top ++ dataFields.map(f => col(s"$dataCol.$f").as(f)): _*)
  }

  /** P3. Operation routing: upserts vs tombstones; unknown ops dropped
    * (reference logs a warning and drops — load_data.py:22-25).
    */
  def routeUpserts(df: DataFrame, opCol: String = "operation"): DataFrame =
    df.filter(col(opCol).isin("insert", "update"))

  def routeTombstones(df: DataFrame, opCol: String = "operation"): DataFrame =
    df.filter(col(opCol) === "delete")

  /** A1. Last-write-wins dedup: keep, per key, the row with the largest
    * (orderCols...) — deterministic version of ReplacingMergeTree.
    *
    * Implemented as max(struct(ord..., payload...)) in a hash aggregate
    * rather than a row_number window: the aggregate gets map-side
    * partial combine, so at 100 TB each executor reduces its input to
    * one row per local key BEFORE the shuffle — the window form would
    * shuffle every duplicate and then sort. Struct comparison is
    * lexicographic, so ordCols form the version and the remaining
    * payload breaks exact ties deterministically.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], orderCols: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(c => keys.contains(c)).toSeq
    // version columns first (they dominate the comparison), then the
    // remaining payload so exact version ties still resolve determinately.
    // Key columns are dropped from the struct: they are constant within
    // the group, and emitting them again would duplicate the output
    // column (ambiguous references downstream).
    val ordered = orderCols.filterNot(keys.contains) ++
      payload.filterNot(orderCols.contains)
    val packed = struct(ordered.map(col): _*)
    df.groupBy(keys.map(col): _*)
      .agg(max(packed).as("__latest"))
      .select(keys.map(col) ++ ordered.map(c => col(s"__latest.$c").as(c)): _*)
  }

  /** S7 read path: resolve LWW state, then drop keys whose latest
    * record is a delete tombstone.
    */
  def liveView(df: DataFrame, keys: Seq[String], orderCols: Seq[String],
               opCol: String = "operation"): DataFrame =
    latestByKey(df, keys, orderCols).filter(col(opCol) =!= "delete")

  /** A2. The reference's declared analytics: watched ratio per video
    * over the deduplicated, tombstone-filtered state (README.md:221).
    */
  def videoAnalytics(state: DataFrame, videoCol: String = "video_id",
                     ratioCol: String = "watched_ratio"): DataFrame =
    state.groupBy(col(videoCol)).agg(
      count(lit(1)).as("n_sessions"),
      round(avg(col(ratioCol)), 4).as("avg_watched_ratio"),
      round(max(col(ratioCol)), 4).as("max_watched_ratio"))
}
