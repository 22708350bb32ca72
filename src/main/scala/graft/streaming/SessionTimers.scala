package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}

/** Event-time SESSIONIZATION via explicit TIMERS on the v2 arbitrary-
  * state API — the mechanism `session_window` (q84) hides, exercised
  * directly: a per-user [[ValueState]] carries the open session
  * `(start_us, last_us, n, sum_cents)`, and a registered event-time
  * timer at `last + gap` closes it when the WATERMARK passes — i.e.
  * when the engine can prove no earlier event is still in flight.
  * This is the general shape of every timeout-driven operator
  * (session close, SLA breach detection, abandoned-cart emission):
  * state writes are O(events), timer fires are O(sessions), and both
  * live in RocksDB — nothing scales with corpus size.
  *
  * Two close paths, both exercised by the gate:
  *  - IN-BATCH: a gap observed between two sorted events of the same
  *    micro-batch closes the older session immediately (sound here
  *    because the feed is globally time-sliced — no late data below
  *    the gap; the general-case guard is the timer);
  *  - TIMER: the last session of a batch stays open, its timer set to
  *    `last_ms + gapMs`; when a later batch's watermark passes that,
  *    [[handleExpiredTimer]] emits it. The guard comparing the fired
  *    expiry against the CURRENT state's own deadline makes a stale
  *    timer (superseded by newer events whose deregistration raced
  *    the expiry scan) a no-op instead of a premature close.
  *
  * Session boundary matches `session_window` exactly: `diff >= gap`
  * breaks (exclusive end — q78's documented rule), and the emitted
  * `end = last + gap`.
  */
class SessionTimers(gapMs: Long)
    extends StatefulProcessor[Long, (Long, Long, Long), (Long, Long, Long, Long, Long)] {

  private val gapUs = gapMs * 1000L

  @transient private var sess: ValueState[(Long, Long, Long, Long)] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    sess = getHandle.getValueState[(Long, Long, Long, Long)](
      "sess",
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong,
        Encoders.scalaLong, Encoders.scalaLong),
      TTLConfig.NONE)

  private def closed(key: Long, s: (Long, Long, Long, Long)): (Long, Long, Long, Long, Long) =
    (key, s._1 / 1000L, s._2 / 1000L + gapMs, s._3, s._4)

  private def deadlineMs(s: (Long, Long, Long, Long)): Long = s._2 / 1000L + gapMs

  override def handleInputRows(
      key: Long,
      rows: Iterator[(Long, Long, Long)],
      timerValues: TimerValues): Iterator[(Long, Long, Long, Long, Long)] = {
    // micro-batch rows arrive unordered; the fold needs event-time order
    val sorted = rows.toArray.sortBy(_._2)
    var out = List.empty[(Long, Long, Long, Long, Long)]
    var cur: (Long, Long, Long, Long) = if (sess.exists()) sess.get() else null
    sorted.foreach { case (_, ts, cents) =>
      if (cur == null) cur = (ts, ts, 1L, cents)
      else if (ts - cur._2 >= gapUs) {
        out ::= closed(key, cur)
        cur = (ts, ts, 1L, cents)
      } else cur = (cur._1, ts, cur._3 + 1L, cur._4 + cents)
    }
    if (cur != null) {
      sess.update(cur)
      // exactly one live timer per key: the open session's deadline
      getHandle.listTimers().foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
      getHandle.registerTimer(deadlineMs(cur))
    }
    out.reverseIterator
  }

  override def handleExpiredTimer(
      key: Long,
      timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[(Long, Long, Long, Long, Long)] =
    if (sess.exists() && deadlineMs(sess.get()) == expiredTimerInfo.getExpiryTimeInMs) {
      val s = sess.get()
      sess.clear()
      Iterator.single(closed(key, s))
    } else Iterator.empty
}
