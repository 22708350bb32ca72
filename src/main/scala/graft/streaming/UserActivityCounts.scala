package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{ListState, MapState, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig}

/** Per-user activity counters on the v2 arbitrary-state API, using the
  * two COMPOSITE state primitives `transformWithState` adds over the
  * old flatMapGroupsWithState surface (which offered only one opaque
  * value per key):
  *
  *  - a [[MapState]] keyed by event type — per-(user, type) counts
  *    live as individual RocksDB entries, so updating one type touches
  *    ONE map cell, not a serialized blob of all of them (the v1 API
  *    rewrites the whole per-key value every batch; at a 100 TB key
  *    space with wide per-key composites that rewrite is the
  *    bottleneck);
  *  - a [[ListState]] appended once per micro-batch the user appears
  *    in — an append is a constant-size RocksDB write, never a
  *    read-modify-write of the whole list.
  *
  * Emission (Update mode): every map entry, stamped with the number of
  * batches this user has appeared in (the list length). Counts are
  * cumulative and the map holds ALL of the user's types, so the
  * emission from the user's LAST batch carries the final count for
  * every type — resolvable downstream by max(struct(batches, n)), both
  * components nondecreasing. Exact integer counts make the streamed
  * fold equal the one-shot batch aggregate for ANY batch split (the
  * q162 invariant).
  */
class UserActivityCounts
    extends StatefulProcessor[Long, (Long, String), (Long, String, Long, Long)] {

  @transient private var counts: MapState[String, Long] = _
  @transient private var batches: ListState[Long] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    counts = getHandle.getMapState[String, Long](
      "counts", Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)
    batches = getHandle.getListState[Long](
      "batches", Encoders.scalaLong, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, String)],
      timerValues: TimerValues): Iterator[(Long, String, Long, Long)] = {
    var rowsInBatch = 0L
    rows.foreach { case (_, tpe) =>
      val cur = if (counts.containsKey(tpe)) counts.getValue(tpe) else 0L
      counts.updateValue(tpe, cur + 1L)
      rowsInBatch += 1L
    }
    batches.appendValue(rowsInBatch)
    val nBatches = batches.get().size.toLong
    counts.iterator().map { case (tpe, n) => (key, tpe, n, nBatches) }
  }
}
