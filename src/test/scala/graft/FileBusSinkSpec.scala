package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.{FileBus, FileBusSink, FileBusCommit}

/** The DSv2 write path: two-phase tmp+rename publish, exactly-once on
  * epoch replay (deterministic ids + skip-if-exists), batch append
  * semantics, abort hygiene, and the full write->read roundtrip.
  */
class FileBusSinkSpec extends SparkSpec {

  private def freshBus(tag: String): String =
    graft.core.TempDirs.scoped(s"graft_bussink_${tag}_") + "/bus"

  test("streaming write publishes one confirmed segment per nonempty partition, " +
       "ids deterministic in (epoch, partition)") {
    val busDir = freshBus("stream")
    val ckpt = busDir + "_ckpt"
    val inDir = busDir + "_in"
    import spark.implicits._
    (0 until 6).map(i => s"m$i").toDF("value").repartition(3)
      .write.json(inDir)
    val q = spark.readStream.schema("value STRING").json(inDir)
      .select(col("value"))
      .writeStream.format("filebus").option("path", busDir)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val bus = new FileBus(busDir, 1000L, 3)
    assert(bus.published() === 6L)
    // epoch 0, partitions 0..k -> ids are (0 << 16) | pid
    assert(FileBus.segments(busDir).forall(_ < (1L << 16)))
    // roundtrip through the source
    assert(spark.read.format("filebus").load(busDir).count() === 6L)
  }

  test("epoch replay after a PARTIAL commit republishes nothing (exactly-once)") {
    val busDir = freshBus("replay")
    Files.createDirectories(Paths.get(busDir, "msgs"))
    val w = new graft.streaming.FileBusStreamingWrite(busDir)
    def tmpWith(body: String, tag: String): FileBusCommit = {
      val p = Paths.get(busDir, "msgs", s"pending-$tag.tmp")
      Files.write(p, body.getBytes)
      FileBusCommit(p.toString, tag.takeRight(1).toInt, body.count(_ == '\n') + 1L)
    }
    // first attempt: partition 0 confirmed, then CRASH (partition 1's
    // tmp never renamed)
    w.commit(5L, Array(tmpWith("a\nb", "x0")))
    assert(FileBus.segments(busDir) === Seq((5L << 16) | 0L))
    // replayed epoch 5: both partitions retry; p0 must skip, p1 lands
    w.commit(5L, Array(tmpWith("a\nb", "y0"), tmpWith("c", "y1")))
    assert(FileBus.segments(busDir).toSet ===
      Set((5L << 16) | 0L, (5L << 16) | 1L))
    val bus = new FileBus(busDir, 1000L, 3)
    assert(bus.published() === 3L, "no duplicate from the replayed partition")
    // all tmps consumed or dropped
    assert(!Files.list(Paths.get(busDir, "msgs")).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".tmp")))
  }

  test("replayed epoch with DIFFERENT content fails loudly instead of " +
       "silently dropping the new batch") {
    val busDir = freshBus("collide")
    Files.createDirectories(Paths.get(busDir, "msgs"))
    val w = new graft.streaming.FileBusStreamingWrite(busDir)
    def tmpWith(body: String, tag: String): FileBusCommit = {
      val p = Paths.get(busDir, "msgs", s"pending-$tag.tmp")
      Files.write(p, body.getBytes)
      FileBusCommit(p.toString, tag.takeRight(1).toInt, body.count(_ == '\n') + 1L)
    }
    w.commit(7L, Array(tmpWith("a", "x0")))
    // two queries sharing one bus root land on the same (epoch, pid) id
    // with different rows — the loser must NOT be silently discarded
    val e = intercept[IllegalStateException] {
      w.commit(7L, Array(tmpWith("OTHER QUERY", "y0")))
    }
    assert(e.getMessage.contains("DIFFERENT content"))
    // the established segment is untouched; the colliding tmp remains on
    // disk as evidence (commit failed — abort hygiene is the engine's)
    val seg = FileBus.segFile(busDir, (7L << 16) | 0L)
    assert(Files.readAllLines(seg).asScala.toSeq === Seq("a"))
    assert(new FileBus(busDir, 1000L, 3).published() === 1L)
  }

  test("batch append never reuses a pruned id (DSv2 path, persistent allocator)") {
    val busDir = freshBus("bprune")
    val bus = new FileBus(busDir, 1000L, 3)
    import spark.implicits._
    Seq("a").toDF("value").coalesce(1)
      .write.format("filebus").mode("append").save(busDir)
    val first = FileBus.segments(busDir)
    assert(first.size === 1)
    bus.consume("g", 10, 0L).foreach(d => bus.ack("g", d.segment, d.index))
    assert(bus.prune(Seq("g")) === first)
    Seq("b").toDF("value").coalesce(1)
      .write.format("filebus").mode("append").save(busDir)
    assert(FileBus.segments(busDir) === Seq(first.max + 1),
      "a recycled id would sit in connectors' committed offsets and never deliver")
  }

  test("batch append takes fresh ids past the current max; abort leaves no debris") {
    val busDir = freshBus("batch")
    val bus = new FileBus(busDir, 1000L, 3)
    bus.publish(Seq("pre"), 42L)
    import spark.implicits._
    Seq("x", "y", "z").toDF("value").repartition(2)
      .write.format("filebus").mode("append").save(busDir)
    assert(bus.published() === 4L)
    assert(FileBus.segments(busDir).min === 42L)
    assert(FileBus.segments(busDir).filter(_ > 42L).size === 2)
    // abort path: a failing write keeps the log intact, no tmp debris
    intercept[Exception] {
      Seq("ok", "bad\nnewline").toDF("value").coalesce(1)
        .write.format("filebus").mode("append").save(busDir)
    }
    assert(bus.published() === 4L)
    assert(!Files.list(Paths.get(busDir, "msgs")).iterator().asScala
      .exists(_.getFileName.toString.endsWith(".tmp")))
  }

  test("sink rejects multi-column and non-string schemas up front") {
    val busDir = freshBus("schema")
    import spark.implicits._
    intercept[Exception] {
      Seq((1, "a")).toDF("i", "s").write.format("filebus")
        .mode("append").save(busDir)
    }
    intercept[Exception] {
      Seq(1, 2).toDF("i").write.format("filebus").mode("append").save(busDir)
    }
  }

  test("end-to-end: stream INTO the bus, stream OUT of it, states agree") {
    val busDir = freshBus("e2e")
    val ckptW = busDir + "_wckpt"; val ckptR = busDir + "_rckpt"
    val inDir = busDir + "_in"
    import spark.implicits._
    (0 until 20).map(i => (i % 5, i)).toDF("k", "v")
      .repartition(4).write.json(inDir)
    // producer: file stream -> json envelope -> bus
    val wq = spark.readStream.schema("k INT, v INT").json(inDir)
      .select(to_json(struct(col("k"), col("v"))).as("value"))
      .writeStream.format("filebus").option("path", busDir)
      .option("checkpointLocation", ckptW)
      .trigger(Trigger.AvailableNow()).start()
    wq.awaitTermination()
    // consumer: bus -> parse -> max per key
    val got = new java.util.concurrent.atomic.AtomicLong(0L)
    val rq = spark.readStream.format("filebus")
      .option("path", busDir).option("group", "agg").load()
      .select(from_json(col("value"), org.apache.spark.sql.types.StructType.fromDDL("k INT, v INT")).as("r"))
      .writeStream.foreachBatch { (df: DataFrame, _: Long) =>
        got.addAndGet(df.count()); ()
      }
      .option("checkpointLocation", ckptR)
      .trigger(Trigger.AvailableNow()).start()
    rq.awaitTermination()
    assert(got.get() === 20L)
  }
}
