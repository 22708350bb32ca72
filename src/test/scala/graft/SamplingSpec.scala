package graft

import org.apache.spark.sql.functions._

/** Gates for the rows-only (non-SQL-oracle) sketch and sampling
  * queries: q52's approx percentiles must sit inside the GK error
  * bound of q43's exact percentiles, and q53's stratified sample must
  * honor its per-language quotas and be deterministic.
  */
class SamplingSpec extends SparkSpec {
  import spark.implicits._

  test("q52 approx percentiles land within the sketch error bound of exact") {
    val approx = SparkEntry.queries("q52_approx_percentile")(spark, sfDir)
      .select($"event_type", $"p50_approx", $"p95_approx")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val exact = SparkEntry.queries("q43_percentiles")(spark, sfDir)
      .select($"event_type", $"p50", $"p95")
      .as[(String, Double, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(approx.keySet == exact.keySet)
    // accuracy=1000 -> rank error <= n/1000; translate to a generous
    // value-tolerance via the observed value range per group
    val ranges = graft.core.Tables.events(spark, sfDir)
      .groupBy($"event_type")
      .agg((max($"value") - min($"value")).as("range"))
      .as[(String, Double)].collect().toMap
    approx.foreach { case (k, (a50, a95)) =>
      val (e50, e95) = exact(k)
      val tol = ranges(k) * 0.05 + 1e-9
      assert(math.abs(a50 - e50) <= tol, s"$k p50: $a50 vs exact $e50")
      assert(math.abs(a95 - e95) <= tol, s"$k p95: $a95 vs exact $e95")
    }
  }

  test("q53 stratified sample honors per-language quotas, deterministically") {
    val totals = graft.core.Tables.documents(spark, sfDir)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val fractions = Map("en" -> 0.5, "zh" -> 0.6, "es" -> 0.8, "de" -> 0.8, "fr" -> 1.0)
    def run() = SparkEntry.queries("q53_stratified_sample")(spark, sfDir)
      .select($"lang", $"n_sampled").as[(String, Long)].collect().toMap
    val s1 = run()
    assert(s1 == run(), "sampleBy with a fixed seed must be deterministic")
    s1.foreach { case (lang, n) =>
      val expected = totals(lang) * fractions(lang)
      // Bernoulli draw: allow 4 sigma of binomial noise
      val sigma = math.sqrt(totals(lang) * fractions(lang) * (1 - fractions(lang)))
      assert(math.abs(n - expected) <= 4 * sigma + 1,
        s"$lang: sampled $n of ${totals(lang)}, wanted ~$expected")
    }
    // fr has fraction 1.0: must keep every row
    assert(s1("fr") == totals("fr"))
  }
}
