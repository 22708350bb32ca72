package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger


import graft.streaming.{FileBus, FileBusSource}

/** The DSv2 connector's engine-facing contract: set-difference
  * offsets, admission control, ack-on-commit (and its one-batch lag +
  * commit-log shutdown settle), crash replay into an idempotent sink,
  * and tap (group-less / batch) reads that never settle.
  */
class FileBusSourceSpec extends SparkSpec {

  private def freshDirs(tag: String): (String, String) = {
    val base = graft.core.TempDirs.scoped(s"graft_bussrc_${tag}_")
    (s"$base/bus", s"$base/ckpt")
  }

  private def drain(busDir: String, ckpt: String, group: Option[String],
                    maxPerTrigger: Option[Int] = None,
                    onBatch: (DataFrame, Long) => Unit = (_, _) => ()): Long = {
    var reader = spark.readStream.format("filebus").option("path", busDir)
    group.foreach(g => reader = reader.option("group", g))
    maxPerTrigger.foreach(n =>
      reader = reader.option("maxSegmentsPerTrigger", n.toString))
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val q = reader.load().writeStream
      .foreachBatch { (df: DataFrame, bid: Long) =>
        seen.addAndGet(df.count()); onBatch(df, bid); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    seen.get()
  }

  test("late-arriving LOWER segment id is still picked up (set offsets)") {
    val (busDir, ckpt) = freshDirs("lateid")
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("a", "b"), 0L)
    bus.publish(Seq("c"), 7L)
    assert(drain(busDir, ckpt, Some("g")) === 3L)
    // a distributed producer lands a segment with a LOWER id than ones
    // already consumed — a high-water-mark offset would silently skip it
    bus.publish(Seq("d", "e"), 3L)
    assert(drain(busDir, ckpt, Some("g")) === 2L)
    FileBusSource.settleCommitted(ckpt, busDir, "g")
    assert(bus.depth("g") === 0L)
  }

  test("admission control bounds each micro-batch by segments") {
    val (busDir, ckpt) = freshDirs("admission")
    val bus = new FileBus(busDir, 60000L, 3)
    (0 until 7).foreach(i => bus.publish(Seq(s"m$i"), i.toLong))
    var batchSegCounts = List.empty[Long]
    val n = drain(busDir, ckpt, Some("g"), maxPerTrigger = Some(2),
      onBatch = (df, _) => {
        batchSegCounts :+= df.select("segment").distinct().count()
      })
    assert(n === 7L)
    assert(batchSegCounts.size === 4) // ceil(7/2)
    assert(batchSegCounts.forall(_ <= 2L))
  }

  test("crash between sink work and checkpoint commit replays the batch; " +
       "settle never outruns durable progress") {
    val (busDir, ckpt) = freshDirs("crash")
    val bus = new FileBus(busDir, 60000L, 3)
    (0 until 4).foreach(i => bus.publish(Seq(s"m$i-0", s"m$i-1"), i.toLong))
    // first run: batch 0 (2 segments) succeeds, batch 1 CRASHES after
    // counting — the foreachBatch work ran but the offset never commits
    val crashed = new java.util.concurrent.atomic.AtomicBoolean(false)
    val ex = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      drain(busDir, ckpt, Some("g"), maxPerTrigger = Some(2),
        onBatch = (_, bid) => if (bid >= 1) {
          crashed.set(true); sys.error("injected crash before commit")
        })
    }
    assert(crashed.get() && ex.getMessage.contains("injected crash"))
    // only batch 0's segments may be settled — never the crashed batch's
    assert(bus.depth("g") >= 4L)
    // restart: the crashed batch REDELIVERS (at-least-once), then the rest
    val replayed = drain(busDir, ckpt, Some("g"), maxPerTrigger = Some(2))
    assert(replayed === 4L) // segments 2,3 rerun + nothing duplicated from batch 0
    FileBusSource.settleCommitted(ckpt, busDir, "g")
    assert(bus.depth("g") === 0L)
  }

  test("group-less stream and batch backfill are taps: nothing settles") {
    val (busDir, ckpt) = freshDirs("tap")
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("x", "y", "z"), 0L)
    assert(drain(busDir, ckpt, None) === 3L)
    assert(spark.read.format("filebus").load(busDir).count() === 3L)
    assert(bus.depth("anygroup") === 3L)
  }

  test("two consumer groups settle independently over one log") {
    val (busDir, ckptA) = freshDirs("groups")
    val ckptB = ckptA + "_b"
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("p", "q"), 0L)
    assert(drain(busDir, ckptA, Some("a")) === 2L)
    FileBusSource.settleCommitted(ckptA, busDir, "a")
    assert(bus.depth("a") === 0L && bus.depth("b") === 2L)
    assert(drain(busDir, ckptB, Some("b")) === 2L)
    FileBusSource.settleCommitted(ckptB, busDir, "b")
    assert(bus.depth("b") === 0L)
  }

  test("commit-log settle is safe on fresh/empty checkpoints and never " +
       "un-dead-letters a poison message") {
    val (busDir, ckpt) = freshDirs("dlq")
    FileBusSource.settleCommitted(s"$busDir/nonexistent", busDir, "g") // no-op
    val bus = new FileBus(busDir, 1L, 1)
    bus.publish(Seq("poison", "fine"), 0L)
    val d = bus.consume("g", 10, nowMs = 5L)
    bus.nack("g", 0L, 0, requeue = true) // attempt 1 == maxDeliveries -> DLQ
    bus.ack("g", 0L, 1)
    assert(bus.deadLetters("g") === Seq("poison"))
    assert(drain(busDir, ckpt, Some("g")) === 2L) // log read sees everything
    FileBusSource.settleCommitted(ckpt, busDir, "g")
    assert(bus.deadLetters("g") === Seq("poison"), "DLQ stays terminal")
    assert(bus.depth("g") === 0L)
    assert(d.size === 2)
  }

  test("retention prune: settled segments vanish, set offsets stay valid, " +
       "a restarted stream re-reads nothing") {
    val (busDir, ckpt) = freshDirs("prune")
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("a", "b"), 0L)
    bus.publish(Seq("c"), 1L)
    assert(drain(busDir, ckpt, Some("g")) === 3L)
    FileBusSource.settleCommitted(ckpt, busDir, "g")
    assert(bus.prune(Seq("g")) === Seq(0L, 1L))
    assert(bus.published() === 0L)
    // the checkpoint's offset set still references pruned ids — the
    // connector's set difference must treat them as consumed, not missing
    assert(drain(busDir, ckpt, Some("g")) === 0L)
    // and new traffic still flows
    bus.publish(Seq("d"), 9L)
    assert(drain(busDir, ckpt, Some("g")) === 1L)
  }

  test("prune refuses partially-settled segments and DLQ evidence by default") {
    val base = graft.core.TempDirs.scoped("graft_bussrc_prune2_")
    val busDir = s"$base/bus"
    val bus = new FileBus(busDir, 1L, 1)
    bus.publish(Seq("ok1", "poison"), 0L)
    bus.publish(Seq("ok2"), 1L)
    val ds = bus.consume("g", 10, nowMs = 5L)
    assert(ds.size === 3)
    bus.ack("g", 0L, 0)
    assert(bus.prune(Seq("g")) === Nil) // 0 has an open msg, 1 unsettled? no: 1's msg leased-open
    bus.ack("g", 1L, 0)
    bus.nack("g", 0L, 1, requeue = true) // maxDeliveries=1 -> DLQ
    assert(bus.prune(Seq("g")) === Seq(1L), "DLQ evidence retains segment 0")
    assert(bus.deadLetters("g") === Seq("poison"))
    assert(bus.prune(Seq("g"), includeDlq = true) === Seq(0L))
    assert(bus.published() === 0L)
  }

  test("prune requires ALL listed groups to have settled") {
    val base = graft.core.TempDirs.scoped("graft_bussrc_prune3_")
    val busDir = s"$base/bus"
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("m"), 0L)
    bus.consume("a", 10, 0L); bus.ack("a", 0L, 0)
    assert(bus.prune(Seq("a", "b")) === Nil, "group b never settled")
    bus.consume("b", 10, 0L); bus.ack("b", 0L, 0)
    assert(bus.prune(Seq("a", "b")) === Seq(0L))
  }

  test("composes with event-time watermarks and windowed aggregation") {
    val (busDir, ckpt) = freshDirs("wm")
    val bus = new FileBus(busDir, 60000L, 3)
    // minute-bucketed events across two windows, one late arrival
    bus.publish(Seq(
      """{"k":"a","ts":"2026-01-01 00:00:10"}""",
      """{"k":"a","ts":"2026-01-01 00:00:40"}""",
      """{"k":"b","ts":"2026-01-01 00:01:20"}"""), 0L)
    bus.publish(Seq("""{"k":"a","ts":"2026-01-01 00:00:55"}"""), 1L)
    val agg = spark.readStream.format("filebus")
      .option("path", busDir).option("group", "wm").load()
      .select(from_json(col("value"),
        org.apache.spark.sql.types.StructType.fromDDL(
          "k STRING, ts TIMESTAMP")).as("r"))
      .select(col("r.k"), col("r.ts"))
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("k"))
      .count()
    val out = new java.util.concurrent.atomic.AtomicReference[Seq[(String, Long)]](Nil)
    val q = agg.writeStream.outputMode("complete")
      .foreachBatch { (df: DataFrame, _: Long) =>
        out.set(df.select("k", "count").collect().toSeq
          .map(r => (r.getString(0), r.getLong(1)))); ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(out.get().sorted === Seq(("a", 3L), ("b", 1L)))
  }

  test("maxBytesPerTrigger: soft byte cap with an at-least-one floor") {
    val (busDir, ckpt) = freshDirs("bytes")
    val bus = new FileBus(busDir, 60000L, 3)
    bus.publish(Seq("x" * 100), 0L)          // ~101 B
    bus.publish(Seq("y" * 100), 1L)
    bus.publish(Seq("z" * 5000), 2L)          // oversized vs the cap
    bus.publish(Seq("w" * 100), 3L)
    var batches = List.empty[Set[Long]]
    var reader = spark.readStream.format("filebus").option("path", busDir)
      .option("maxBytesPerTrigger", "250")
    val q = reader.load().writeStream
      .foreachBatch { (df: DataFrame, _: Long) =>
        batches :+= df.select("segment").distinct()
          .collect().map(_.getLong(0)).toSet; ()
      }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(batches.flatten.toSet === Set(0L, 1L, 2L, 3L))
    // two small segments fit one batch; the oversized one flows ALONE
    // (at-least-one floor — it must not wedge the stream)
    assert(batches.contains(Set(0L, 1L)))
    assert(batches.contains(Set(2L)))
    assert(batches.contains(Set(3L)))
  }

  test("source metrics: backlog and depth reported in query progress") {
    val (busDir, ckpt) = freshDirs("metrics")
    val bus = new FileBus(busDir, 60000L, 3)
    (0 until 4).foreach(i => bus.publish(Seq(s"m$i"), i.toLong))
    val q = spark.readStream.format("filebus")
      .option("path", busDir).option("group", "g")
      .option("maxSegmentsPerTrigger", "2").load()
      .writeStream.foreachBatch { (_: DataFrame, _: Long) => () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val progs = q.recentProgress.toSeq
    val withMetrics = progs.flatMap(p => p.sources.toSeq)
      .flatMap(s => Option(s.metrics).map(_.asScala.toMap))
      .filter(_.contains("publishedSegments"))
    assert(withMetrics.nonEmpty, "source metrics must surface in progress")
    assert(withMetrics.forall(_("publishedSegments") == "4"))
    assert(withMetrics.exists(m => m("backlogSegments").toInt > 0),
      "mid-drain progress shows a backlog")
    assert(withMetrics.forall(_.contains("unsettledDepth")))
  }

  test("checkpointed offset compacts to retained segments after prune") {
    val (busDir, ckpt) = freshDirs("compact")
    val bus = new FileBus(busDir, 60000L, 3)
    (0 until 5).foreach(i => bus.publish(Seq(s"m$i"), i.toLong))
    assert(drain(busDir, ckpt, Some("g")) === 5L)
    FileBusSource.settleCommitted(ckpt, busDir, "g")
    assert(bus.prune(Seq("g")) === Seq(0L, 1L, 2L, 3L, 4L))
    assert(bus.publishNext(Seq("new")) === 5L, "allocator never recycles pruned ids")
    assert(drain(busDir, ckpt, Some("g")) === 1L)
    // the newest checkpointed offset line holds ONLY retained ids — the
    // set is bounded by retained segments, not by all segments ever
    val offsets = Paths.get(ckpt, "offsets")
    val lastBatch = Files.list(offsets).iterator().asScala
      .map(_.getFileName.toString).filter(_.forall(_.isDigit)).map(_.toLong).max
    val line = Files.readAllLines(offsets.resolve(lastBatch.toString))
      .asScala.drop(2).head.trim
    assert(FileBusSource.parseOffsetJson(line) === Set(5L))
  }

  test("settleCommitted selects THIS source's offset line positionally " +
       "(a multi-source query must not over-ack another source's ids)") {
    val (busA, ckpt) = freshDirs("multisrc")
    val busB = busA + "_b"
    val a = new FileBus(busA, 60000L, 3)
    val b = new FileBus(busB, 60000L, 3)
    a.publish(Seq("a0"), 0L); a.publish(Seq("a1"), 1L)
    b.publish(Seq("b5"), 5L)
    val seen = new java.util.concurrent.atomic.AtomicLong(0L)
    val left = spark.readStream.format("filebus").option("path", busA).load()
    val right = spark.readStream.format("filebus").option("path", busB).load()
    val q = left.unionByName(right).writeStream
      .foreachBatch { (df: DataFrame, _: Long) => seen.addAndGet(df.count()); () }
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    assert(seen.get() === 3L)
    // AFTER the drain, bus B gains segments whose ids overlap bus A's
    // consumed ids — they were never processed by anyone
    b.publish(Seq("late0"), 0L); b.publish(Seq("late1"), 1L)
    FileBusSource.settleCommitted(ckpt, busB, "gb", sourceIndex = 1)
    assert(b.depth("gb") === 2L,
      "only segment 5 settles; shape-matching on '[' would settle bus A's " +
        "ids 0/1 into bus B's group — over-acking messages never processed, " +
        "which prune() would then permanently delete")
    assert(b.prune(Seq("gb")) === Seq(5L))
    FileBusSource.settleCommitted(ckpt, busA, "ga", sourceIndex = 0)
    assert(a.depth("ga") === 0L)
    // an out-of-range index fails loudly instead of settling blind
    intercept[IllegalArgumentException] {
      FileBusSource.settleCommitted(ckpt, busA, "ga", sourceIndex = 7)
    }
  }

  test("offset json roundtrip, sparse and empty") {
    assert(FileBusSource.parseOffsetJson("[]") === Set.empty[Long])
    assert(FileBusSource.parseOffsetJson("[7,0,500]") === Set(0L, 7L, 500L))
    assert(FileBusSource.offsetJson(Set(500L, 0L, 7L)) === "[0,7,500]")
  }
}
