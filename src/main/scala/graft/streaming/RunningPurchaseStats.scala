package graft.streaming

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Per-user running purchase statistics on Spark's arbitrary-state v2
  * API (`transformWithState`, the successor to
  * flatMapGroupsWithState): one `ValueState` cell per key holding
  * (count, sum-cents, max-cents), folded over each batch's rows and
  * re-emitted — so the LATEST emission per key (the one with the
  * largest count; counts are strictly increasing) IS the exact batch
  * aggregate over everything ingested. Integer cents keep every
  * intermediate exact (the q73 discipline), so the streamed fold and
  * the one-shot oracle aggregate agree bit-for-bit regardless of how
  * rows split across micro-batches.
  *
  * State is a fixed-width triple per key in RocksDB (TTL NONE here —
  * the gate ingests a bounded history; production sets a TTL horizon),
  * mergeable across restarts via changelog checkpointing like every
  * other stateful gate.
  */
class RunningPurchaseStats
    extends StatefulProcessor[Long, (Long, Long), (Long, Long, Long, Long)] {

  @transient private var st: ValueState[(Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
    implicit val enc: Encoder[(Long, Long, Long)] =
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong, Encoders.scalaLong)
    st = getHandle.getValueState[(Long, Long, Long)]("agg", enc, TTLConfig.NONE)
  }

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long)] = {
    var (n, sum, mx) =
      if (st.exists()) st.get() else (0L, 0L, Long.MinValue)
    rows.foreach { case (_, cents) =>
      n += 1; sum += cents; mx = math.max(mx, cents)
    }
    st.update((n, sum, mx))
    Iterator.single((key, n, sum, mx))
  }
}
