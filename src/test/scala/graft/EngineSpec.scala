package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.functions._

import graft.ext.{Graph, SetSimJoin}
import graft.functions.BloomFunctions

/** Round-5 engine tier: bloom-pruned joins, exact set-similarity join,
  * frontier BFS — semantics on hand-built inputs plus the plan shapes
  * the 100 TB story needs.
  */
class EngineSpec extends SparkSpec {
  import spark.implicits._

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.explainString(FormattedMode)

  /** Collect first so AQE finalizes and codegen spans appear. */
  private def executedPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    df.queryExecution.explainString(FormattedMode)
  }

  // ------------------------------------------------------------ bloom

  test("bloom pruning never changes join results (false positives discharged)") {
    val dim = Seq(2L, 4L, 6L, 8L).toDF("k")
    val fact = (1L to 100L).toDF("v")
    val bloom = BloomFunctions.buildBloom(dim, "k", 4, 0.01)
    val pruned = fact
      .filter(BloomFunctions.mightContain(col("v"), bloom))
      .join(dim, col("v") === col("k"))
      .select(col("v")).as[Long].collect().sorted
    assert(pruned.toSeq == Seq(2L, 4L, 6L, 8L))
  }

  test("bloom sketch has zero false negatives over every dim key") {
    val dim = (1L to 5000L).map(_ * 7L).toDF("k")
    val bloom = BloomFunctions.buildBloom(dim, "k", 5000, 0.03)
    // every true key must pass the probe — a miss would drop real rows
    val misses = dim.filter(!BloomFunctions.mightContain(col("k"), bloom)).count()
    assert(misses == 0L, s"bloom dropped $misses genuine keys")
  }

  test("q144 plan: bloom probe filters the fact scan below the join, in codegen") {
    val p = executedPlan("q144_bloom_pruned_join")
    assert(p.contains("bloom_might_contain"), "bloom probe missing from the plan")
    // the probe must sit in a Filter on the fact scan side, BELOW the
    // join (pre-shuffle at scale), not applied after it: the detail
    // section lists nodes bottom-up, so the bloom Filter's detail
    // entry must precede the join's
    val filterDetail = p.indexOf("Condition : (bloom_might_contain")
    val joinDetail = p.indexOf("BroadcastHashJoin")
    assert(filterDetail >= 0, "bloom probe is not a Filter condition")
    assert(joinDetail >= 0, "join missing")
    // native expression ⇒ the filter stage stays in whole-stage codegen
    // (formatted AQE-final plans mark spans as "[codegen id : n]")
    val filterLine = p.linesIterator
      .find(l => l.contains("Filter") && l.contains("codegen id"))
    assert(filterLine.isDefined, "bloom filter stage fell out of codegen")
  }

  // ------------------------------------------------------- setsim join

  test("SetSimJoin matches brute-force all-pairs exactly (no false negatives)") {
    // sets engineered so some qualifying pairs share only their RARE
    // tokens — the case banded-LSH can miss but prefix filtering cannot
    val docs = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),          // j(1,2)=3/5=0.6   ✓
      (3L, Seq("a", "b", "x", "y")),          // j(1,3)=2/6=0.33  ✗
      (4L, Seq("p", "q", "r", "s", "t")),
      (5L, Seq("p", "q", "r", "s", "u")),     // j(4,5)=4/6=0.67  ✓
      (6L, Seq("zz", "ww")),
      (7L, Seq("zz", "ww")),                  // j(6,7)=1.0       ✓
      (8L, Seq("a", "p", "zz"))               // stop-ish mix, no match
    ).toDF("doc_id", "sh")
    val got = SetSimJoin.pairs(docs, "doc_id", "sh", 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    // brute oracle computed in-test over the same frame
    val a = docs.select(col("doc_id").as("id_a"), col("sh").as("sa"))
    val b = docs.select(col("doc_id").as("id_b"), col("sh").as("sb"))
    val brute = a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("double"))
      .withColumn("j", col("i") / (size(col("sa")) + size(col("sb")) - col("i")))
      .filter(col("j") >= 0.5)
      .select(col("id_a"), col("id_b")).as[(Long, Long)].collect().toSet
    assert(got == brute, s"got $got, brute $brute")
    assert(got == Set((1L, 2L), (4L, 5L), (6L, 7L)))
  }

  test("q145 plan: prefix-filtered candidates, no cartesian product") {
    val p = plan("q145_setsim_join")
    assert(!p.contains("CartesianProduct"), "setsim join degenerated to all-pairs")
    assert(!p.contains("BroadcastNestedLoopJoin"), "setsim join is nested-loop")
  }

  // -------------------------------------------------------------- bfs

  test("bfsHops: shortest distances on a hand graph, bounded by maxHops") {
    // 0-1-2-3-4 path, plus shortcut 0-9-3: dist(3) = 2 via 9, not 3
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (0L, 9L), (9L, 3L))
      .toDF("a", "b")
    val got = Graph.bfsHops(edges, 0L, 3)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 1L -> 1L, 9L -> 1L, 2L -> 2L, 3L -> 2L, 4L -> 3L))
    // bounded frontier: maxHops=1 must not reach distance-2 nodes
    val near = Graph.bfsHops(edges, 0L, 1).as[(Long, Long)].collect().toMap
    assert(near == Map(0L -> 0L, 1L -> 1L, 9L -> 1L))
  }

  test("bfsHops retains only the result's own frontier checkpoints (no superseded copies)") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("a", "b")
    val maxHops = 3
    val out = Graph.bfsHops(edges, 0L, maxHops)
    out.count()
    val during = spark.sparkContext.getPersistentRDDs.size
    // the returned frame IS the union of the per-hop frontier
    // checkpoints (round 15: no per-round visited re-copy), so at most
    // maxHops checkpointed frontiers may be live — all of them part of
    // the escaping result (ContextCleaner's once the caller drops it),
    // never a superseded round's copy
    assert(during - before <= maxHops,
      s"checkpoint blocks leaked beyond the result's own frontiers: $before -> $during")
  }

  // ------------------------------------------------------ plan shapes

  test("q147 plan: profiler reads lineitem exactly once (one scan, Expand)") {
    val p = plan("q147_column_profile")
    // count detail-section headers "(n) Scan parquet" — the tree line
    // and detail header would double-count a single scan otherwise
    val scans = """\(\d+\) Scan parquet""".r.findAllIn(p).size
    assert(scans == 1, s"profiler scanned the corpus $scans times")
    assert(p.contains("Expand"), "multi-distinct lost its Expand rewrite")
  }

  test("q146 plan: phrase probe filters postings on the grouping key below the agg") {
    val p = plan("q146_phrase_search")
    // token equality predicates must reach the scan side (pushed under
    // the aggregate by Catalyst), so only 2 tokens' postings shuffle
    assert(p.contains("PushedFilters:") && p.contains("hash"),
      "probe-token filter not pushed toward the scan")
    assert(!p.contains("CartesianProduct"))
  }

  test("q148/q150 plans: no cartesian products in BFS or KS drift") {
    assert(!plan("q148_bfs_hops").contains("CartesianProduct"))
    assert(!plan("q150_ks_drift").contains("CartesianProduct"))
  }

  // ------------------------------------------------------------- sssp

  test("ssspRounds: weighted shortest paths, bounded horizon, min multi-edge") {
    // 0-1 (5, plus a parallel 7 that must collapse to 5), 1-2 (1),
    // 0-2 (10): best dist(2) = 6 via two hops, only visible at rounds>=2
    val edges = Seq((0L, 1L, 5), (0L, 1L, 7), (1L, 2L, 1), (0L, 2L, 10))
      .toDF("a", "b", "w")
    val r2 = Graph.ssspRounds(edges, 0L, 2).as[(Long, Long)].collect().toMap
    assert(r2 == Map(0L -> 0L, 1L -> 5L, 2L -> 6L))
    // horizon 1: the 2-hop improvement is out of reach, direct edge wins
    val r1 = Graph.ssspRounds(edges, 0L, 1).as[(Long, Long)].collect().toMap
    assert(r1 == Map(0L -> 0L, 1L -> 5L, 2L -> 10L))
  }

  // ------------------------------------------------------------- rank

  test("globalRowNumber matches the single-partition window on a total order") {
    val df = spark.range(1000).select(
      (col("id") * 37 % 101).as("k"), col("id"))
    val got = graft.ops.Rank
      .globalRowNumber(df, Seq(col("k"), col("id")), "rn", numPartitions = 7)
      .select(col("k"), col("id"), col("rn"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    val exp = df.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))).cast("long"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2))
    assert(got.toSeq == exp.toSeq)
    // rn is a permutation of 1..N
    assert(got.map(_._3).sorted.toSeq == (1L to 1000L).toSeq)
  }

  test("q152 plan: equi-depth rank range-partitions, never a single-partition window") {
    val p = plan("q152_equidepth_hist")
    // the rank's own range exchange is materialized inside the lineage
    // checkpoint; what the final plan must show is a Window PARTITIONED
    // by the partition id (parallel) and no single-partition funnel
    assert(p.contains("Window"), "rank window missing")
    assert(p.contains("__pid"), "window is not partitioned by partition id")
    assert(!p.contains("SinglePartition"),
      "plan funnels through a single partition")
  }

  test("q153 plan: group sample is a bounded aggregate, not a window") {
    val p = plan("q153_group_sample")
    assert(p.contains("ObjectHashAggregate"), "TopK aggregator not planned")
    assert(!p.contains("(\\d+\\) Window"), "sample fell back to a window sort")
  }

  test("q154 plan: attribution runs the native as-of operator") {
    assert(plan("q154_attribution").contains("AsOfJoin"),
      "attribution lost the custom as-of exec")
  }

  test("q156: grid join generates each qualifying pair exactly once, no cartesian") {
    val p = plan("q156_grid_eps_join")
    assert(!p.contains("CartesianProduct"), "grid join degenerated to all-pairs")
    // duplicate pairs would double rows vs the brute oracle; assert
    // uniqueness directly too
    val df = SparkEntry.queries("q156_grid_eps_join")(spark, sfDir)
    val n = df.count()
    val distinctPairs = df.select(col("ia"), col("ib")).distinct().count()
    assert(n == distinctPairs, s"grid join emitted duplicate pairs: $n vs $distinctPairs")
  }

  // ------------------------------------------------ batch-3 analytics

  test("q158: transition probabilities sum to 1 per current state") {
    val rows = SparkEntry.queries("q158_markov_transitions")(spark, sfDir)
      .groupBy(col("cur")).agg(sum(col("p")).as("s"))
      .as[(String, Double)].collect()
    rows.foreach { case (cur, s) =>
      assert(math.abs(s - 1.0) < 1e-9, s"P(.|$cur) sums to $s") }
    assert(rows.length == 5)
  }

  test("q159: lag-1 autocorrelation is a valid correlation") {
    val r = SparkEntry.queries("q159_autocorr")(spark, sfDir)
      .select(col("autocorr_lag1")).as[Double].collect().head
    assert(r >= -1.0 && r <= 1.0, s"autocorr = $r")
  }

  test("EWMA ordered fold matches the recurrence by hand") {
    // x = [10, 20, 40], a = 0.25, seed = x1:
    // s2 = .25*20 + .75*10 = 12.5 ; s3 = .25*40 + .75*12.5 = 19.375
    val vs = Seq((1L, Seq(10.0, 20.0, 40.0))).toDF("user_id", "vs")
    val got = vs.select(aggregate(
        expr("slice(vs, 2, greatest(size(vs) - 1, 0))"),
        element_at(col("vs"), 1),
        (acc, x) => lit(0.25) * x + lit(0.75) * acc).as("ewma"))
      .as[Double].collect().head
    assert(got == 19.375, s"ewma = $got")
  }

  test("q161: largest-remainder allocation sums to exactly 100, k rows per stratum") {
    val sel = SparkEntry.queries("q161_stratified_split")(spark, sfDir)
    val perLang = sel.groupBy(col("lang"))
      .agg(count(lit(1)).as("picked"), max(col("k")).as("k"), max(col("rank")).as("maxr"))
      .as[(String, Long, Long, Long)].collect()
    perLang.foreach { case (lang, picked, k, maxr) =>
      assert(picked == k, s"$lang picked $picked != k $k")
      assert(maxr == k, s"$lang max rank $maxr != k $k")
    }
    assert(perLang.map(_._3).sum == 100L, "allocation does not sum to 100")
  }

  test("q164: stream-static enrich equals the batch three-way join") {
    val streamed = SparkEntry.queries("q164_stream_static_join")(spark, sfDir)
    val batch = graft.core.Tables.events(spark, sfDir)
      .filter(col("event_type") === lit("purchase"))
      .join(graft.core.Tables.customer(spark, sfDir),
        col("user_id") === col("c_custkey"))
      .join(graft.core.Tables.nation(spark, sfDir),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("event_id"), col("user_id"), col("n_name").as("nation"),
        round(col("value") * 100).cast("long").as("cents"))
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).isEmpty && batch.except(streamed).isEmpty)
  }

  test("q165: map/list state folds match batch counts; batch appearances in [1,4]") {
    val got = SparkEntry.queries("q165_map_list_state")(spark, sfDir)
    val batchCounts = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    assert(got.select(col("user_id"), col("event_type"), col("n_events"))
      .except(batchCounts).isEmpty)
    val nb = got.select(col("batches_seen")).as[Long].collect()
    assert(nb.nonEmpty && nb.forall(b => b >= 1L && b <= 4L),
      s"batches_seen out of [1,4]: ${nb.distinct.sorted.mkString(",")}")
  }

  test("q168: balance resets at each marker on a hand-built timeline") {
    // purchase 100 -> error -> purchase 50 -> purchase 25:
    // segment 0 balance 100; segment 1 balances 50, 75
    val ev = Seq(
      (1L, 1L, "purchase", 1000L, 100L),
      (2L, 1L, "error",    2000L,   0L),
      (3L, 1L, "purchase", 3000L,  50L),
      (4L, 1L, "purchase", 4000L,  25L))
      .toDF("event_id", "user_id", "event_type", "us", "cents")
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
    val seg = ev.withColumn("seg",
      sum(when(col("event_type") === lit("error"), 1L).otherwise(0L)).over(w1))
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"), col("seg")).orderBy(col("us"), col("event_id"))
    val got = seg.withColumn("bal",
        sum(when(col("event_type") === lit("purchase"), col("cents"))
          .otherwise(0L)).over(w2))
      .filter(col("event_type") === lit("purchase"))
      .select(col("event_id"), col("seg"), col("bal"))
      .as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq((1L, 0L, 100L), (3L, 1L, 50L), (4L, 1L, 75L)), got.toString)
  }

  test("q163: every rolling sketch estimate passes the witness bound") {
    val rows = SparkEntry.queries("q163_rolling_distinct")(spark, sfDir)
      .select(col("sketch_ok")).as[Boolean].collect()
    assert(rows.nonEmpty && rows.forall(identity),
      s"${rows.count(!_)} of ${rows.length} sketch estimates out of bound")
  }

  test("q155: time-weighted average on a hand-built day") {
    // one user, one day: v=10 held 2s, v=20 held 6s -> TWA = 17.5
    val base = java.sql.Timestamp.valueOf("2024-03-01 00:00:00")
    def at(sec: Int) = new java.sql.Timestamp(base.getTime + sec * 1000L)
    val ev = Seq(
      (1L, at(0), 10.0, 100L), (2L, at(2), 20.0, 100L), (3L, at(8), 99.0, 100L))
      .toDF("event_id", "ts", "value", "user_id")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), to_date(col("ts")))
      .orderBy(unix_micros(col("ts")), col("event_id"))
    val seg = ev
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("v", col("value").cast("decimal(18,6)"))
      .withColumn("nxt", lead(col("us"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .withColumn("dur", col("nxt") - col("us"))
    val r = seg.groupBy(col("user_id"))
      .agg((round(sum(col("v") * col("dur")), 2).cast("double")
        / sum(col("dur")).cast("double")).as("twa"))
      .as[(Long, Double)].collect().head
    assert(math.abs(r._2 - 17.5) < 1e-12, s"TWA = ${r._2}")
  }

  test("q174: journey element count equals n_events for every user") {
    val rows = SparkEntry.queries("q174_listagg")(spark, sfDir)
      .select(size(split(col("journey"), "\\|")).cast("long"), col("n_events"))
      .as[(Long, Long)].collect()
    assert(rows.nonEmpty && rows.forall { case (k, n) => k == n },
      "listagg dropped or duplicated elements")
  }

  test("q176: r-squared within [0,1], moments present for every type") {
    val rows = SparkEntry.queries("q176_ols_regression")(spark, sfDir)
      .select(col("n"), col("slope"), col("r2"))
      .as[(Long, Option[Double], Option[Double])].collect()
    assert(rows.length == 5)
    rows.foreach { case (n, slope, r2) =>
      assert(n > 1 && slope.nonEmpty, "degenerate regression on real data")
      r2.foreach(v => assert(v >= 0.0 && v <= 1.0, s"r2 out of range: $v"))
    }
  }

  test("q177: Welch df lies between min(n)-1 and n1+n2-2 for every pair") {
    // the Welch-Satterthwaite estimate is bracketed by these bounds —
    // a formula slip (wrong denominator order) lands outside them
    val rows = SparkEntry.queries("q177_welch_ttest")(spark, sfDir)
      .select(col("a_n"), col("b_n"), col("t"), col("df"))
      .as[(Long, Long, Double, Double)].collect()
    assert(rows.length == 10) // C(5,2) type pairs
    rows.foreach { case (na, nb, t, df) =>
      assert(!t.isNaN && !t.isInfinite)
      assert(df >= (math.min(na, nb) - 1).toDouble - 1e-9 &&
             df <= (na + nb - 2).toDouble + 1e-9,
        s"df $df outside [${math.min(na, nb) - 1}, ${na + nb - 2}]")
    }
  }

  test("q180: doubled U statistic within [0, 2*n1*n2] and U1+U2 identity") {
    val (n1, n2, twoR1, twoU1, z) =
      SparkEntry.queries("q180_mann_whitney_u")(spark, sfDir)
        .as[(Long, Long, Long, Long, Double)].collect().head
    assert(twoU1 >= 0L && twoU1 <= 2L * n1 * n2, s"2*U1 out of range: $twoU1")
    // 2*R1 + 2*R2 = 2 * N(N+1)/2 rank-sum identity => U1 + U2 = n1*n2
    val n = n1 + n2
    val twoR2 = n * (n + 1L) - twoR1
    val twoU2 = 2L * n1 * n2 + n2 * (n2 + 1L) - twoR2
    assert(twoU1 + twoU2 == 2L * n1 * n2, "U1 + U2 != n1*n2")
    assert(!z.isNaN && !z.isInfinite)
  }

  test("q182: kept paragraphs across the corpus equal the distinct paragraph hashes") {
    // first-occurrence dedup keeps exactly one chunk per distinct hash
    val kept = SparkEntry.queries("q182_paragraph_dedup")(spark, sfDir)
      .agg(sum(col("n_kept"))).as[Long].collect().head
    val W = 10
    val distinctChunks = graft.core.Tables.documents(spark, sfDir)
      .select(split(col("text"), " ").as("ts"))
      .select(explode(expr(
        s"""transform(sequence(0, CAST((size(ts) - 1) / $W AS INT)),
           |  i -> array_join(slice(ts, i * $W + 1, $W), ' '))""".stripMargin)).as("p"))
      .select(md5(col("p"))).distinct().count()
    assert(kept == distinctChunks, s"kept $kept != distinct $distinctChunks")
  }

  test("q186: every quartile bucket 1-4 is populated on real data") {
    val rows = SparkEntry.queries("q186_rfm_segments")(spark, sfDir)
      .select(col("r_q"), col("f_q"), col("m_q"))
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    for ((name, vs) <- Seq("r" -> rows.map(_._1), "f" -> rows.map(_._2),
                           "m" -> rows.map(_._3))) {
      assert(vs.forall(q => q >= 1 && q <= 4), s"$name quartile out of range")
      assert(vs.distinct.length >= 3, // >=3 distinct buckets: thresholds real
        s"$name quartiles degenerate: ${vs.distinct.sorted.mkString(",")}")
    }
  }

  test("q190: LOCF never leaves a null after the first observation; gaps marked") {
    val rows = SparkEntry.queries("q190_gap_fill_locf")(spark, sfDir)
      .select(col("user_id"), col("day"), col("observed"), col("filled"),
        col("is_gap"))
      .as[(Long, String, Option[Long], Option[Long], Boolean)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, obs, filled, gap) =>
      assert(gap == obs.isEmpty, "is_gap must mark exactly the imputed rows")
      // grid starts at each user's first observed day -> always fillable
      assert(filled.nonEmpty, "LOCF left a null inside the span")
      if (obs.nonEmpty) assert(filled == obs, "observed row must pass through")
    }
  }

  test("q189: every mined negative carries a different label than its anchor") {
    val anchors = graft.core.Tables.embeddings(spark, sfDir)
      .filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("label").cast("long").as("qlabel"))
    val joined = SparkEntry.queries("q189_hard_negatives")(spark, sfDir)
      .join(anchors, "qid")
      .select(col("qid"), col("neg_label"), col("qlabel"))
      .as[(Long, Long, Long)].collect()
    assert(joined.length == 60) // 20 anchors x top-3
    joined.foreach { case (q, neg, ql) =>
      assert(neg != ql, s"anchor $q mined a same-label 'negative'")
    }
  }

  test("q191: corrupt accounting is total — categories partition the feed") {
    val got = SparkEntry.queries("q191_corrupt_records")(spark, sfDir)
      .select(col("category"), col("n")).as[(String, Long)].collect().toMap
    val total = graft.core.Tables.events(spark, sfDir).count()
    assert(got.values.sum == total, "rows vanished in PERMISSIVE parse")
    assert(got.contains("_corrupt") && got("_corrupt") > 0)
  }

  test("q192: every event lands in exactly two hopping windows") {
    val winTotal = SparkEntry.queries("q192_hopping_windows")(spark, sfDir)
      .agg(sum(col("n"))).as[Long].collect().head
    val events = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull).count()
    assert(winTotal == 2 * events, s"window total $winTotal != 2 x $events")
  }

  test("q193: dynamic-gap sessions partition each user's events; intervals disjoint") {
    val sess = SparkEntry.queries("q193_dynamic_gap_sessions")(spark, sfDir)
      .select(col("user_id"), col("start_ms"), col("end_ms"), col("n_events"))
      .as[(Long, Long, Long, Long)].collect()
    assert(sess.map(_._4).sum == graft.core.Tables.events(spark, sfDir).count(),
      "session membership must cover every event exactly once")
    sess.groupBy(_._1).foreach { case (u, ss) =>
      val sorted = ss.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, _, e1, _), (_, s2, _, _)) =>
          assert(e1 <= s2, s"user $u: overlapping sessions ($e1 > $s2)")
        case _ => ()
      }
    }
  }

  test("q183: copy counts match the tier policy exactly") {
    val got = SparkEntry.queries("q183_dataset_mixing")(spark, sfDir)
      .groupBy(col("source")).agg(
        countDistinct(col("doc_id")).as("docs"), count(lit(1)).as("copies"))
      .select(col("source"), col("docs"), col("copies"))
      .as[(String, Long, Long)].collect()
    got.foreach { case (src, docs, copies) =>
      val tier = src.drop(3).toInt match {
        case n if n <= 4 => 3L
        case n if n <= 9 => 2L
        case _           => 1L
      }
      assert(copies == docs * tier, s"$src: $copies copies for $docs docs")
    }
  }
}
