package graft

import java.nio.file.{Files, Paths, StandardOpenOption}
import org.apache.spark.sql.functions._
import graft.sources.{Ingest, Workload}

/** JSON/CSV ingestion: explicit-schema reads, corrupt-line quarantine,
  * and batch/stream schema agreement (SURVEY.md §2.1 wire formats).
  */
class IngestSpec extends SparkSpec {
  import spark.implicits._

  private val envelopeCols =
    Seq($"operation", $"document_id", $"timestamp", $"data")

  test("JSON-lines CDC envelopes round-trip losslessly with explicit schema") {
    val dir = Files.createTempDirectory("graft_json_").toString
    val env = Workload.cdcEnvelopes(spark, n = 200, nDocs = 30, seed = 11L)
      .select(envelopeCols: _*)
    env.write.mode("overwrite").json(dir)

    val (good, bad) = Ingest.cdcJson(spark, dir)
    assert(bad.isEmpty, "clean input produced quarantined lines")
    val key = concat_ws("|", $"operation", $"document_id", $"timestamp",
      coalesce($"data.video_id", lit("-")), coalesce($"data.watched_seconds".cast("string"), lit("-")))
    val a = env.select(key).as[String].collect().sorted.toSeq
    val b = good.select(key).as[String].collect().sorted.toSeq
    assert(a == b && a.size == 200)
    // deletes must come back with data = NULL, not a struct of nulls
    assert(good.filter($"operation" === "delete" && $"data".isNotNull).isEmpty)
  }

  test("malformed JSON lines are quarantined, not fatal and not dropped silently") {
    val dir = Files.createTempDirectory("graft_jsonbad_").toString
    Workload.cdcEnvelopes(spark, n = 50, nDocs = 10, seed = 3L)
      .select(envelopeCols: _*)
      .coalesce(1).write.mode("overwrite").json(dir)
    // poison lines: truncated JSON and a wrong-shape record
    val poison = Paths.get(dir, "poison.json")
    Files.write(poison,
      "{\"operation\": \"insert\", \"document_id\"\nnot json at all\n".getBytes,
      StandardOpenOption.CREATE)

    // the cache-free backfill-scale variant first (before cdcJson's
    // cache exists — the cache manager would otherwise substitute the
    // cached fragment into any identical fresh plan)
    val (good2, bad2) = Ingest.cdcJsonTwoPass(spark, dir)
    assert(good2.count() == 50 && bad2.count() == 2)
    assert(!good2.queryExecution.optimizedPlan.toString.contains("InMemoryRelation"),
      "two-pass variant must not materialize a cache")

    val (good, bad) = Ingest.cdcJson(spark, dir)
    assert(good.count() == 50)
    assert(bad.count() == 2)
    assert(bad.filter($"raw_line".contains("not json")).count() == 1)
    assert(good2.schema == good.schema && bad2.schema == bad.schema)
  }

  test("withCdcJson loan pattern unpersists the parsed cache on every exit path") {
    val dir = Files.createTempDirectory("graft_jsonloan_").toString
    Workload.cdcEnvelopes(spark, n = 20, nDocs = 5, seed = 7L)
      .select(envelopeCols: _*).write.mode("overwrite").json(dir)
    spark.catalog.clearCache() // isolate from earlier suites' entries
    def cachedCount = spark.sharedState.cacheManager
    val n = Ingest.withCdcJson(spark, dir) { (good, bad) =>
      assert(bad.isEmpty); good.count()
    }
    assert(n == 20)
    assert(cachedCount.isEmpty, "normal exit must unpersist the shared frame")
    intercept[RuntimeException] {
      Ingest.withCdcJson(spark, dir)((_, _) => throw new RuntimeException("boom"))
    }
    assert(cachedCount.isEmpty, "exceptional exit must unpersist too")
  }

  test("CSV flat reads honor the explicit schema (no inference)") {
    val dir = Files.createTempDirectory("graft_csv_").toString
    val orders = graft.core.Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice", $"o_orderdate")
    orders.write.mode("overwrite").option("header", "true").csv(dir)

    val back = Ingest.flatCsv(spark, dir, orders.schema)
    assert(back.schema == orders.schema)
    val sumA = orders.agg(sum($"o_orderkey"), count(lit(1))).first()
    val sumB = back.agg(sum($"o_orderkey"), count(lit(1))).first()
    assert(sumA == sumB)
  }

  test("schema evolution: mergeSchema surfaces late columns as NULL on old files") {
    val dir = Files.createTempDirectory("graft_evolve_").toString
    // v1 files: two columns; v2 files add a quality score
    Seq((1L, "a"), (2L, "b")).toDF("doc_id", "text")
      .write.mode("append").parquet(dir)
    Seq((3L, "c", 0.9), (4L, "d", 0.7)).toDF("doc_id", "text", "quality")
      .write.mode("append").parquet(dir)
    val evolved = Ingest.parquetEvolving(spark, dir)
    assert(evolved.columns.toSet == Set("doc_id", "text", "quality"))
    val rows = evolved.select($"doc_id", $"quality")
      .as[(Long, Option[Double])].collect().toMap
    assert(rows == Map(1L -> None, 2L -> None, 3L -> Some(0.9), 4L -> Some(0.7)))
  }

  test("streaming JSON source uses the same schema as batch") {
    val dir = Files.createTempDirectory("graft_jsonstream_").toString
    Workload.cdcEnvelopes(spark, n = 40, nDocs = 10, seed = 5L)
      .select(envelopeCols: _*)
      .write.mode("overwrite").json(dir)
    val stream = Ingest.cdcJsonStream(spark, dir)
    assert(stream.isStreaming)
    // file sources force every field nullable; names/types must match
    assert(stream.schema.simpleString == graft.core.Schemas.envelopeSchema.simpleString)
    val q = stream.groupBy($"operation").count()
      .writeStream.format("memory").queryName("json_stream_out")
      .outputMode("complete").start()
    try {
      q.processAllAvailable()
      val n = spark.table("json_stream_out").agg(sum($"count")).first().getLong(0)
      assert(n == 40)
    } finally q.stop()
  }
}
