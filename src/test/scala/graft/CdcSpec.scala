package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.ops.Cdc

/** Unit specs for the reference pipeline operators (SURVEY.md §2):
  * P1 ratio math incl. duration<=0 and missing fields, P2 null-safe
  * flatten, P3 routing, A1 LWW dedup incl. ties, S7 live view.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  test("P1 watchedRatio: happy path, rounding to 4") {
    val df = Seq((120.0, 240), (1.0, 3)).toDF("w", "d")
      .select(Cdc.watchedRatio($"w", $"d").as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.5, 0.3333))
  }

  test("P1 watchedRatio: duration 0 / negative guards -> 0.0") {
    val df = Seq((120.0, 0), (50.0, -3)).toDF("w", "d")
      .select(Cdc.watchedRatio($"w", $"d").as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 0.0))
  }

  test("P1 watchedRatio: missing watched -> 0, missing duration -> 1") {
    val df = Seq((None: Option[Double], Some(10)), (Some(3.0), None))
      .toDF("w", "d")
      .select(Cdc.watchedRatio($"w", $"d").as("r"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 3.0))
  }

  private val envSchema = StructType(Seq(
    StructField("operation", StringType),
    StructField("document_id", LongType),
    StructField("data", StructType(Seq(
      StructField("video_id", StringType),
      StructField("watched_seconds", IntegerType))))))

  test("P2 flattenEnvelope un-nests and is null-safe for deletes") {
    val rows = Seq(
      Row("insert", 1L, Row("v1", 42)),
      Row("delete", 2L, null))
    val df = spark.createDataFrame(spark.sparkContext.parallelize(rows), envSchema)
    val flat = Cdc.flattenEnvelope(df)
    assert(flat.columns.toSeq == Seq("operation", "document_id", "video_id", "watched_seconds"))
    val out = flat.orderBy($"document_id").collect()
    assert(out(0).getString(2) == "v1" && out(0).getInt(3) == 42)
    assert(out(1).isNullAt(2) && out(1).isNullAt(3))
  }

  test("P3 routing: unknown ops dropped, deletes isolated") {
    val df = Seq("insert", "update", "delete", "replace")
      .toDF("operation")
    assert(Cdc.routeUpserts(df).count() == 2)
    assert(Cdc.routeTombstones(df).count() == 1)
  }

  private def cdcFixture = Seq(
    // (user, doc, ts, op)
    (1L, 10L, 100L, "insert"),
    (1L, 11L, 200L, "update"),   // latest for user 1
    (1L, 11L, 200L, "update"),   // exact duplicate (redelivery)
    (2L, 20L, 100L, "insert"),
    (2L, 21L, 300L, "delete"),   // latest for user 2 = tombstone
    (3L, 30L, 100L, "insert"),
    (3L, 31L, 100L, "update")    // same ts: doc_id 31 wins tie
  ).toDF("user_id", "document_id", "ts_ms", "operation")

  test("A1 latestByKey: LWW with deterministic tie-break") {
    val latest = Cdc.latestByKey(cdcFixture, Seq("user_id"), Seq("ts_ms", "document_id"))
      .orderBy($"user_id").collect()
    assert(latest.map(r => (r.getLong(0), r.getLong(2), r.getString(3))).toSeq ==
      Seq((1L, 11L, "update"), (2L, 21L, "delete"), (3L, 31L, "update")))
  }

  test("A1 latestByKey is idempotent and order-insensitive") {
    val once = Cdc.latestByKey(cdcFixture, Seq("user_id"), Seq("ts_ms", "document_id"))
    val twice = Cdc.latestByKey(once, Seq("user_id"), Seq("ts_ms", "document_id"))
    assert(once.orderBy($"user_id").collect().toSeq ==
      twice.orderBy($"user_id").collect().toSeq)
    val shuffled = Cdc.latestByKey(cdcFixture.orderBy(rand(7)),
      Seq("user_id"), Seq("ts_ms", "document_id"))
    assert(once.orderBy($"user_id").collect().toSeq ==
      shuffled.orderBy($"user_id").collect().toSeq)
  }

  test("S7 liveView filters tombstoned entities") {
    val live = Cdc.liveView(cdcFixture, Seq("user_id"), Seq("ts_ms", "document_id"))
    assert(live.select("user_id").as[Long].collect().sorted.toSeq == Seq(1L, 3L))
  }

  test("A2 videoAnalytics aggregates the live state") {
    val state = Seq(("v1", 0.5), ("v1", 0.7), ("v2", 1.0))
      .toDF("video_id", "watched_ratio")
    val out = Cdc.videoAnalytics(state).orderBy($"video_id").collect()
    assert(out(0).getLong(1) == 2 && out(0).getDouble(2) == 0.6)
    assert(out(1).getLong(1) == 1 && out(1).getDouble(2) == 1.0)
  }

  test("SCD2 merge: no-change updates extend, changes version, batches stitch like one-shot") {
    import graft.ops.Scd2
    def ups(rows: (Long, String, Long, Long)*) =
      rows.toDF("key", "attr", "ts_ms", "tie")
    val empty = ups().select($"key", $"attr",
      $"ts_ms".as("valid_from_ms"), $"ts_ms".as("valid_to_ms"))
    // batch 1: key 1 goes a@10, a@20 (no-op), b@30; key 2: x@15
    val h1 = Scd2.merge(empty, ups((1L, "a", 10L, 1L), (1L, "a", 20L, 2L),
      (1L, "b", 30L, 3L), (2L, "x", 15L, 4L)))
    val rows1 = h1.orderBy($"key", $"valid_from_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(rows1.toSeq == Seq((1L, "a", 10L, 30L), (1L, "b", 30L, -1L),
      (2L, "x", 15L, -1L)), rows1.mkString(","))
    // batch 2: key 1 b@40 must EXTEND the open b (no new version);
    // key 1 a@50 re-versions; key 2 unchanged rides through open
    val h2 = Scd2.merge(h1, ups((1L, "b", 40L, 5L), (1L, "a", 50L, 6L)))
    val rows2 = h2.orderBy($"key", $"valid_from_ms")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3)))
    assert(rows2.toSeq == Seq((1L, "a", 10L, 30L), (1L, "b", 30L, 50L),
      (1L, "a", 50L, -1L), (2L, "x", 15L, -1L)), rows2.mkString(","))
    // equals the one-shot merge of all updates in one batch
    val oneShot = Scd2.merge(empty, ups((1L, "a", 10L, 1L), (1L, "a", 20L, 2L),
      (1L, "b", 30L, 3L), (2L, "x", 15L, 4L), (1L, "b", 40L, 5L), (1L, "a", 50L, 6L)))
    assert(oneShot.exceptAll(h2).isEmpty && h2.exceptAll(oneShot).isEmpty,
      "batched fold diverged from the one-shot merge")
    // point-in-time lookups over the half-open intervals
    assert(Scd2.asOf(h2, 29L).orderBy($"key").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a"), (2L, "x")))
    assert(Scd2.asOf(h2, 30L).filter($"key" === 1L).head().getString(1) == "b")
    assert(Scd2.asOf(h2, 9L).count() == 0L)
  }
}
