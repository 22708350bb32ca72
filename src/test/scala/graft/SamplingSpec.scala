package graft

import org.apache.spark.sql.functions._

/** Gates for the sketch and sampling queries. q52/q53 now carry their
  * error-bound witnesses IN the query output (hash-checked against the
  * DuckDB oracle); these specs assert the witnesses hold and pin the
  * stronger properties the boolean can't carry (exact-percentile
  * parity with q43, sampler determinism, the fraction-1.0 stratum).
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("q52 witnesses hold and exact percentiles agree with q43") {
    val rows = SparkEntry.queries("q52_approx_percentile")(spark, sfDir)
      .select($"event_type", $"p50_exact", $"p95_exact", $"p50_ok", $"p95_ok")
      .as[(String, Double, Double, Boolean, Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (k, _, _, ok50, ok95) =>
      assert(ok50, s"$k: approx p50 outside exact [p45, p55] band")
      assert(ok95, s"$k: approx p95 outside exact [p93, p97] band")
    }
    val exact = SparkEntry.queries("q43_percentiles")(spark, sfDir)
      .select($"event_type", $"p50", $"p95")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    rows.foreach { case (k, p50, p95, _, _) =>
      assert(exact(k) == ((p50, p95)), s"$k: q52 exact percentiles diverge from q43")
    }
  }

  test("q53 stratified sample honors per-language quotas, deterministically") {
    val fractions = graft.queries.ExtQueries.q53Fractions
    def run() = SparkEntry.queries("q53_stratified_sample")(spark, sfDir)
      .select($"lang", $"n_total", $"quota_ok")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    val s1 = run()
    assert(s1 == run(), "sampleBy with a fixed seed must be deterministic")
    assert(s1.map(_._1) == fractions.keys.toSeq.sorted)
    s1.foreach { case (lang, _, ok) => assert(ok, s"$lang: sample quota violated") }
    // fr has fraction 1.0: the raw sampler must keep every row
    val docs = graft.core.Tables.documents(spark, sfDir)
    val frTotal = docs.filter($"lang" === "fr").count()
    val frKept = docs.stat.sampleBy("lang", fractions, seed = 42L)
      .filter($"lang" === "fr").count()
    assert(frKept == frTotal, s"fraction-1.0 stratum lost rows: $frKept/$frTotal")
  }
}
