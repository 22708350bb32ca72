package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.Workload
import graft.sink.Warehouse
import graft.ops.Cdc

/** Golden end-to-end replay (SURVEY.md §5.4): seeded CDC workload ->
  * warehouse sink -> LWW live state -> analytics, with determinism,
  * idempotent-replay, and invariant checks on the reference's own
  * schema.
  */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  private def freshDir() = Files.createTempDirectory("graft_wh_").toString

  private lazy val env = Workload.cdcEnvelopes(spark, n = 300, nDocs = 40, seed = 42L)

  test("workload simulator is deterministic and honors the reference contract") {
    val a = Workload.cdcEnvelopes(spark, 300, 40, 42L).collect()
    val b = Workload.cdcEnvelopes(spark, 300, 40, 42L).collect()
    assert(a.toSeq == b.toSeq)
    val rows = env.cache()
    // 50/30/20-ish mix, data null exactly for deletes, invariant holds
    val mix = rows.groupBy("operation").count().as[(String, Long)].collect().toMap
    assert(mix.keySet == Set("insert", "update", "delete"))
    assert(mix("insert") > mix("update") && mix("update") > mix("delete"))
    assert(rows.filter($"operation" === "delete" && $"data".isNotNull).count() == 0)
    assert(rows.filter($"operation" =!= "delete" && $"data".isNull).count() == 0)
    assert(rows.filter($"data".isNotNull &&
      ($"data.watched_seconds" < 0 ||
       $"data.watched_seconds" > $"data.video_duration_seconds")).count() == 0)
  }

  test("end-to-end: sink -> live state matches direct batch LWW; analytics sane") {
    val dir = freshDir()
    Warehouse.append(Warehouse.toWarehouseRows(env), dir)
    val live = Warehouse.liveState(spark, dir)
    // live state == LWW computed directly on the in-flight rows
    val direct = Cdc.latestByKey(Warehouse.toWarehouseRows(env),
        Warehouse.DedupKeys, Warehouse.VersionCols)
      .filter(!$"is_deleted")
      .select($"original_id", $"ingestion_seq").as[(String, Long)].collect().toSet
    val fromSink = live.select($"original_id", $"ingestion_seq")
      .as[(String, Long)].collect().toSet
    assert(fromSink == direct && fromSink.nonEmpty)
    // one row per key, ratios in [0,1]
    assert(live.count() == live.select("original_id").distinct().count())
    val mm = live.agg(min($"watched_ratio"), max($"watched_ratio")).first()
    assert(mm.getDouble(0) >= 0.0 && mm.getDouble(1) <= 1.0)
    val analytics = Warehouse.videoAnalytics(live)
    assert(analytics.count() > 0)
  }

  test("replaying the same batch is idempotent under dynamic partition overwrite") {
    val dir = freshDir()
    val rows = Warehouse.toWarehouseRows(env)
    Warehouse.append(rows, dir)
    val once = Warehouse.liveState(spark, dir)
      .select($"original_id", $"ingestion_seq").as[(String, Long)].collect().toSet
    // replay the identical batch with partition overwrite (backfill path)
    Warehouse.append(rows, dir, overwritePartitions = true)
    val twice = Warehouse.liveState(spark, dir)
      .select($"original_id", $"ingestion_seq").as[(String, Long)].collect().toSet
    assert(twice == once)
    // plain append (at-least-once duplicate) also converges via LWW
    Warehouse.append(rows, dir)
    val thrice = Warehouse.liveState(spark, dir)
      .select($"original_id", $"ingestion_seq").as[(String, Long)].collect().toSet
    assert(thrice == once)
  }

  test("P5 quarantine split: bad rows captured with reasons, nothing dropped") {
    import graft.ops.Quarantine
    val good = env
    val badOp = env.limit(3).withColumn("operation", lit("replace"))
    val noData = env.filter($"operation" === "insert").limit(2)
      .withColumn("data", lit(null).cast(env.schema("data").dataType))
    val all = good.unionByName(badOp).unionByName(noData)
    val (valid, bad) = Quarantine.split(all, Quarantine.envelopeValidity())
    assert(valid.count() + bad.count() == all.count())
    val reasons = bad.groupBy("quarantine_reason").count()
      .as[(String, Long)].collect().toMap
    assert(reasons == Map("unknown_operation" -> 3L, "missing_data" -> 2L))
  }

  test("tombstone wins when it is the latest record for a key") {
    val dir = freshDir()
    Warehouse.append(Warehouse.toWarehouseRows(env), dir)
    val all = Cdc.latestByKey(spark.read.parquet(dir),
      Warehouse.DedupKeys, Warehouse.VersionCols)
    val deletedKeys = all.filter($"is_deleted").select("original_id")
      .as[String].collect().toSet
    val liveKeys = Warehouse.liveState(spark, dir).select("original_id")
      .as[String].collect().toSet
    assert(deletedKeys.nonEmpty)
    assert(deletedKeys.intersect(liveKeys).isEmpty)
  }
}
