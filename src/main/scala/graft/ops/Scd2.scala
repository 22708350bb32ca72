package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD TYPE-2 dimension history — validity-interval tracking, the
  * history-table complement of the LWW upsert (MergeSink is SCD1: last
  * write wins, history discarded; this keeps every attribute version
  * as [valid_from, valid_to) with valid_to NULL = current).
  *
  * Scale shape: one merge round touches ONLY the open rows and the
  * arriving batch — closed history rides through untouched (in
  * production it lives in a MergeSink/TableManifest table and is never
  * rescanned; see the incremental-index gates for the same
  * discipline). The ordered change-compression windows partition by
  * the ENTITY KEY over (open ∪ batch) — per-key data is a handful of
  * rows, so the sort is bounded and the shuffle is one hash exchange
  * on the key, never a global sort.
  *
  * Batch-boundary invariance: rounds must respect the global
  * (ts, tie) order across batches (ts-range slicing gives this; the
  * streaming gates' slice discipline). Within that contract, folding N
  * batches equals the one-shot computation — the q139 oracle replays
  * the one-shot form in SQL.
  *
  * Reference lineage: the reference's warehouse keeps only LWW state
  * (`clickhouse/init.sql:8-24`, ReplacingMergeTree); SCD2 is the
  * standard extension a dimension table needs at 100 TB when "what was
  * the value at time T" queries arrive (time travel answers table-
  * level versions, q104; SCD2 answers per-entity attribute history).
  */
object Scd2 {

  /** Merge one batch of updates into an SCD2 history.
    *
    * @param history (key, attr, valid_from_ms, valid_to_ms) — NULL
    *                valid_to_ms marks the open (current) row; pass an
    *                empty frame with that schema to bootstrap
    * @param updates (key, attr, ts_ms, tie) — tie breaks equal
    *                timestamps deterministically (e.g. a document id)
    *
    * A row whose attr equals the entity's current open attr is a
    * no-op (compressed away); a changed attr closes the open interval
    * at the new row's ts and opens a new one. All updates in the batch
    * must sort at-or-after every history valid_from (ts-range batch
    * discipline).
    */
  def merge(history: DataFrame, updates: DataFrame): DataFrame = {
    val closed = history.filter(col("valid_to_ms").isNotNull)
    // the open row re-enters compression as a pseudo-update at its own
    // valid_from: an arriving first change with an equal attr then
    // compresses away (extends the open row), an unequal one closes it
    val open = history.filter(col("valid_to_ms").isNull)
      .select(col("key"), col("attr"),
        col("valid_from_ms").as("ts_ms"), lit(Long.MinValue).as("tie"))
    val all = open.unionByName(
      updates.select(col("key"), col("attr"), col("ts_ms"), col("tie")))
    val ord = Window.partitionBy(col("key")).orderBy(col("ts_ms"), col("tie"))
    val changes = all
      .withColumn("prev", lag(col("attr"), 1).over(ord))
      .filter(col("prev").isNull || col("attr") =!= col("prev"))
    val intervals = changes
      .withColumn("valid_to_ms", lead(col("ts_ms"), 1).over(
        Window.partitionBy(col("key")).orderBy(col("ts_ms"), col("tie"))))
      .select(col("key"), col("attr"),
        col("ts_ms").as("valid_from_ms"), col("valid_to_ms"))
    closed.select(col("key"), col("attr"), col("valid_from_ms"), col("valid_to_ms"))
      .unionByName(intervals)
  }

  /** Point-in-time lookup over an SCD2 history: the attribute each key
    * had at `atMs` (half-open intervals [from, to)).
    */
  def asOf(history: DataFrame, atMs: Long): DataFrame =
    history.filter(col("valid_from_ms") <= atMs &&
      (col("valid_to_ms").isNull || col("valid_to_ms") > atMs))
      .select(col("key"), col("attr"))
}
