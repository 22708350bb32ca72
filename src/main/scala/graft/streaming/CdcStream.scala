package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.ops.Cdc

/** Streaming twin of the reference pipeline (SURVEY.md §2.9): an
  * unbounded CDC stream upserted into a latest-per-key view with
  * at-least-once input and effectively-once output.
  *
  * Reference semantics being reproduced:
  *  - at-least-once + manual ack (consumer/consumer.py:16,40,44) ->
  *    Structured Streaming checkpointing + idempotent LWW merge;
  *  - order-independence (README.md:207,223) -> LWW by (ts, id), a
  *    commutative/associative merge;
  *  - ClickHouse ReplacingMergeTree background merge (init.sql:22-24)
  *    -> deterministic per-micro-batch merge, no stale-read window.
  *
  * State sizing at 100 TB: one EntityState row per live key. The
  * mapGroupsWithState path needs a TTL policy for unbounded key spaces
  * (expire via GroupStateTimeout); the foreachBatch path keeps state in
  * the table itself, so it scales with storage not memory — that's the
  * production route (SURVEY.md §7 trap 7).
  */
object CdcStream {

  /** Flat CDC change event (post-flatten envelope) for typed streaming. */
  case class ChangeEvent(operation: String, document_id: Long, user_id: Long,
                         ts_ms: Long, watched: Double, duration: Int)

  /** Latest-record-per-entity state. */
  case class EntityState(user_id: Long, document_id: Long, operation: String,
                         ts_ms: Long, watched_ratio: Double)

  def toState(e: ChangeEvent): EntityState = {
    val d = if (e.duration > 0) e.duration else 1
    val ratio = if (e.operation == "delete") 0.0
                else if (e.duration > 0) e.watched / d else 0.0
    EntityState(e.user_id, e.document_id, e.operation, e.ts_ms, ratio)
  }

  /** LWW merge: (ts, document_id) version order — same as
    * Cdc.latestByKey's struct comparison, deterministic under ties.
    */
  private def newer(a: EntityState, b: EntityState): EntityState =
    if (a.ts_ms > b.ts_ms || (a.ts_ms == b.ts_ms && a.document_id >= b.document_id)) a
    else b

  /** Stateful LWW upsert view: one state row per key, updated per
    * micro-batch. Works identically on a batch Dataset (Spark runs
    * mapGroups) — used by tests to cross-check against Cdc.latestByKey.
    */
  def latestByKeyStream(events: Dataset[ChangeEvent]): Dataset[EntityState] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[ChangeEvent], state: GroupState[EntityState]) =>
          val best = (state.getOption.iterator ++ it.map(toState))
            .reduceLeft(newer)
          state.update(best)
          best
      }
  }

  /** TTL'd LWW upsert view — the state-bounding policy SURVEY.md §7
    * trap 7 calls for: with an unbounded key space (100 TB of entities)
    * the NoTimeout variant grows state forever. Here each key's state
    * carries an event-time timeout of `ttlMs` past its last version;
    * when the watermark passes it, the key emits a final `"expired"`
    * tombstone and its state is dropped. Keys that keep receiving
    * versions keep sliding their deadline forward, so live entities
    * never expire. State size = rows active within the TTL horizon,
    * not all rows ever seen.
    *
    * `events` must be a streaming Dataset; the event-time column is
    * derived from `ts_ms` and watermarked with `watermarkDelay`.
    */
  def latestByKeyStreamTTL(events: Dataset[ChangeEvent], watermarkDelay: String,
                           ttlMs: Long): Dataset[EntityState] = {
    import events.sparkSession.implicits._
    val watermarked = events
      .withColumn("event_ts", timestamp_millis(col("ts_ms")))
      .withWatermark("event_ts", watermarkDelay)
      .as[ChangeEvent]
    watermarked.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.EventTimeTimeout()) {
        (_: Long, it: Iterator[ChangeEvent], state: GroupState[EntityState]) =>
          if (state.hasTimedOut) {
            val last = state.get
            state.remove()
            Iterator(last.copy(operation = "expired"))
          } else {
            val best = (state.getOption.iterator ++ it.map(toState))
              .reduceLeft(newer)
            state.update(best)
            // deadline must sit strictly past the current watermark or
            // Spark rejects it (late-arriving updates to an old key)
            state.setTimeoutTimestamp(
              math.max(best.ts_ms + ttlMs, state.getCurrentWatermarkMs() + 1))
            Iterator(best)
          }
      }
  }

  /** foreachBatch merge against an abstract whole-table store — the
    * SEMANTIC baseline (read all + merge + write all, O(|state|) per
    * batch). Tests use it as the oracle for the real sink; production
    * uses `graft.sink.MergeSink.forEachBatch`, which keeps the same
    * LWW semantics but hash-partitions the state table and rewrites
    * only the bucket partitions a batch touches (O(|touched| +
    * |batch|) per micro-batch).
    */
  def foreachBatchMerge(keys: Seq[String], orderCols: Seq[String])
                       (store: BatchStore): (DataFrame, Long) => Unit = {
    (batch: DataFrame, _: Long) =>
      val merged = store.read() match {
        case Some(existing) => Cdc.latestByKey(existing.unionByName(batch), keys, orderCols)
        case None           => Cdc.latestByKey(batch, keys, orderCols)
      }
      store.write(merged)
  }

  trait BatchStore {
    def read(): Option[DataFrame]
    def write(df: DataFrame): Unit
  }

  /** Watermarked tumbling-window event-rate aggregation (streaming twin
    * of q14): late data beyond the watermark is dropped, windows close
    * deterministically.
    */
  def windowedRates(events: DataFrame, tsCol: String, window_ : String,
                    watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), window_), col("operation"))
      .agg(count(lit(1)).as("n"))

  /** At-least-once -> effectively-once dedup of redelivered CDC
    * messages inside the watermark horizon.
    */
  def dedupRedeliveries(events: DataFrame, tsCol: String, watermark: String): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("document_id")
}
