package graft

import org.apache.spark.sql.execution.FormattedMode
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Locks for the round-7 curation/statistics tier: q212's Z-order
  * locality bound and the two-sided file pruning it buys, q213's
  * span-dedup invariants, q216's multiplier-weight law, q217's
  * one-sided CMS guarantee against an independently computed truth,
  * and q218's distributed (partial-aggregate) percentile shape.
  */
class CurationSpec extends SparkSpec {
  import spark.implicits._

  test("q212 zbuckets bound both dimensions to <= 1/16 of their range (+floor slack)") {
    val rows = SparkEntry.queries("q212_zorder")(spark, sfDir).collect()
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey"))
      .head()
    val (minp, maxp, mins, maxs) =
      (li.getLong(0), li.getLong(1), li.getLong(2), li.getLong(3))
    // a zbucket fixes the top 4 normalized bits of EACH dimension, so
    // its raw span is at most range/16 plus one normalization cell
    val pBound = (maxp - minp + 1) / 16 + (maxp - minp + 1) / 256 + 2
    val sBound = (maxs - mins + 1) / 16 + (maxs - mins + 1) / 256 + 2
    rows.foreach { r =>
      val (pSpan, sSpan) =
        (r.getAs[Long]("max_p") - r.getAs[Long]("min_p"),
         r.getAs[Long]("max_s") - r.getAs[Long]("min_s"))
      assert(pSpan <= pBound, s"zbucket ${r.get(0)}: partkey span $pSpan > $pBound")
      assert(sSpan <= sBound, s"zbucket ${r.get(0)}: suppkey span $sSpan > $sBound")
    }
  }

  test("q212 z-partitioned layout prunes a 2-D rectangle probe in BOTH dimensions") {
    val dir = java.nio.file.Files.createTempDirectory("graft_zorder_").toString
    val li = graft.core.Tables.lineitem(spark, sfDir).select("l_partkey", "l_suppkey")
    val st = li.agg(min("l_partkey"), max("l_partkey"), min("l_suppkey"), max("l_suppkey")).head()
    val (minp, maxp, mins, maxs) = (st.getLong(0), st.getLong(1), st.getLong(2), st.getLong(3))
    val z = (0 until 8).map { i =>
      s"((xb div ${1L << i}) % 2) * ${1L << (2 * i)} + ((yb div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    li.withColumn("xb", expr(s"((l_partkey - $minp) * 256) div (${maxp - minp + 1})"))
      .withColumn("yb", expr(s"((l_suppkey - $mins) * 256) div (${maxs - mins + 1})"))
      .withColumn("zbucket", expr(s"($z) div 256"))
      .write.partitionBy("zbucket").mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
    // files touched at EXECUTION time (inputFiles is planning-time and
    // ignores partition pruning)
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    val total = filesRead(back)
    // rectangle = lower quarter of both dims -> xhi, yhi in 0..3 ->
    // 16 of the 256 possible zbuckets (the z-range rewrite every
    // Z-order reader does: rectangle -> Morton bucket set)
    val buckets = for (xh <- 0 to 3; yh <- 0 to 3) yield {
      (0 until 4).map(i => ((xh >> i) & 1).toLong * (1L << (2 * i)) +
        ((yh >> i) & 1).toLong * (1L << (2 * i + 1))).sum
    }
    val pHi = minp + (maxp - minp + 1) / 4 - 1
    val sHi = mins + (maxs - mins + 1) / 4 - 1
    val probe = back.filter(col("zbucket").isin(buckets: _*) &&
      col("l_partkey") <= pHi && col("l_suppkey") <= sHi)
    val read = filesRead(probe)
    assert(read < total / 4,
      s"2-D probe read $read of $total files — z layout should prune to ~1/16")
    // the bucket-set rewrite loses no rows vs the raw rectangle
    val exact = back.filter(col("l_partkey") <= pHi && col("l_suppkey") <= sHi).count()
    assert(probe.count() == exact, "z-bucket rewrite dropped rows")
    graft.core.TempDirs.deleteRecursively(dir)
  }

  test("q213 span-dedup invariants: counts bounded, boilerplate found, grams flagged consistently") {
    val rows = SparkEntry.queries("q213_exact_substr")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, d) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_dup_pos"))
      assert(d >= 0 && d <= n, s"doc ${r.get(0)}: dup positions $d outside [0, $n]")
    }
    assert(rows.count(_.getAs[Long]("n_dup_pos") > 0) > 0,
      "no duplicated 8-token span found — the gate is not exercising the dup path")
  }

  test("q216 multiplier weights follow the {0,1,1,2} law (mean-1 resampling)") {
    val wts = graft.core.Tables.events(spark, sfDir)
      .select(col("event_id")).withColumn("b", explode(sequence(lit(0), lit(15))))
      .withColumn("wt", expr(
        """CASE CAST(conv(substring(md5(concat(CAST(event_id AS STRING), '#',
          |  CAST(b AS STRING))), 1, 7), 16, 10) AS BIGINT) % 4
          |  WHEN 0 THEN 0L WHEN 3 THEN 2L ELSE 1L END""".stripMargin))
      .groupBy("wt").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(wts.keySet == Set(0L, 1L, 2L), s"unexpected weight values: ${wts.keySet}")
    val total = wts.values.sum.toDouble
    // md5 uniformity: P(0)=P(2)=1/4, P(1)=1/2, so mass ~ total
    val mass = wts.map { case (w, n) => w * n }.sum.toDouble
    assert(math.abs(mass / total - 1.0) < 0.05,
      s"replica mass ${mass / total} per row drifts from the mean-1 law")
  }

  test("q217 CMS estimate is one-sided against an independently joined truth") {
    val r = SparkEntry.queries("q217_join_size_cms")(spark, sfDir).head()
    val truth = graft.core.Tables.orders(spark, sfDir).as("o")
      .join(graft.core.Tables.customer(spark, sfDir).as("c"),
        col("o.o_custkey") === col("c.c_custkey"))
      .count()
    assert(r.getAs[Long]("exact_pairs") == truth, "exact twin disagrees with a direct join")
    assert(r.getAs[Long]("cms_est") >= truth, "CMS inner product lost its one-sided guarantee")
    assert(r.getAs[Boolean]("est_ge_exact"))
  }

  test("MortonInterleave: native codegen expression == unrolled arithmetic twin, both eval paths") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select((col("l_partkey") % 256).as("xb"), (col("l_suppkey") % 256).as("yb"))
    val z = (0 until 8).map { i =>
      s"((xb div ${1L << i}) % 2) * ${1L << (2 * i)} + ((yb div ${1L << i}) % 2) * ${1L << (2 * i + 1)}"
    }.mkString(" + ")
    val both = li.withColumn("zn", graft.functions.MortonInterleave.morton(col("xb"), col("yb"), 8))
      .withColumn("zu", expr(z))
    assert(both.filter(col("zn") =!= col("zu")).count() == 0,
      "native interleave diverges from the unrolled arithmetic")
    // interpreted path (codegen off) agrees too
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try assert(both.filter(col("zn") =!= col("zu")).count() == 0, "interpreted eval diverges")
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    // known bit pattern: x=0b1010, y=0b0101 -> z alternates = 0b01100110
    assert(graft.functions.MortonInterleave.interleave(10L, 5L, 8) == 0x66L)
    // and the expression stays inside whole-stage codegen (no fallback)
    // formatted explain prefixes codegen'd operators with '*'
    val p = both.queryExecution.explainString(FormattedMode)
    assert(p.contains("* Project"), "projection fell out of whole-stage codegen")
  }

  test("q219/q220/q221/q222/q223 structural invariants") {
    val cf = SparkEntry.queries("q219_item_item_cf")(spark, sfDir).collect()
    assert(cf.nonEmpty)
    cf.foreach { r =>
      assert(r.getAs[Long]("rank") >= 1 && r.getAs[Long]("rank") <= 3)
      assert(r.getAs[Long]("item") != r.getAs[Long]("partner"))
      val c = r.getAs[Double]("cos")
      assert(c > 0.0 && c <= 1.0, s"cosine $c outside (0, 1]")
    }
    val bars = SparkEntry.queries("q220_ohlc_bars")(spark, sfDir).collect()
    bars.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h && l <= c && c <= h, s"OHLC order violated: $l $o $c $h")
    }
    val jac = SparkEntry.queries("q221_vocab_jaccard")(spark, sfDir).collect()
    assert(jac.nonEmpty)
    jac.foreach { r =>
      val j = r.getAs[Double]("jaccard")
      assert(j > 0.0 && j <= 1.0 && r.getAs[String]("source_a") < r.getAs[String]("source_b"))
    }
    SparkEntry.queries("q222_concentration")(spark, sfDir).collect().foreach { r =>
      val (h, k) = (r.getAs[Double]("hhi"), r.getAs[Long]("n_types"))
      assert(h >= 1.0 / k - 1e-12 && h <= 1.0, s"HHI $h outside [1/$k, 1]")
    }
    SparkEntry.queries("q223_inverted_index")(spark, sfDir).collect().foreach { r =>
      val ids = r.getAs[String]("postings").split(",").map(_.toLong)
      assert(ids.length <= 10 && (ids sameElements ids.sorted),
        s"postings not a sorted <=10 cap: ${ids.toSeq}")
      assert(r.getAs[Long]("df") >= ids.length)
    }
  }

  test("q224 runs partition the timeline: contiguous, state-alternating, counts add up") {
    val runs = SparkEntry.queries("q224_scd2_runs")(spark, sfDir).collect()
      .groupBy(_.getAs[Long]("user_id"))
    val totalEvents = graft.core.Tables.events(spark, sfDir).count()
    assert(runs.values.map(_.map(_.getAs[Long]("n_events")).sum).sum == totalEvents,
      "run n_events don't partition the event count")
    runs.values.foreach { rs =>
      val sorted = rs.sortBy(_.getAs[Long]("run_id"))
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("state") != b.getAs[String]("state"),
            "adjacent runs share a state — the collapse missed a merge")
          assert(a.getAs[Long]("eff_to_us") == b.getAs[Long]("eff_from_us"),
            "validity intervals not contiguous")
        case _ =>
      }
      assert(sorted.last.isNullAt(sorted.last.fieldIndex("eff_to_us")),
        "current (last) run must be the open interval")
    }
  }

  test("q225 greedy coverage: gains non-increasing, cumulative coverage consistent") {
    val picks = SparkEntry.queries("q225_greedy_coverage")(spark, sfDir)
      .collect().sortBy(_.getAs[Long]("round"))
    assert(picks.length == 5)
    assert(picks.map(_.getAs[String]("source")).distinct.length == 5, "a source was re-picked")
    val gains = picks.map(_.getAs[Long]("gain"))
    assert(gains.sliding(2).forall(w => w(0) >= w(1)),
      s"greedy gains increased: ${gains.toSeq} — submodularity violated")
    val cums = picks.map(_.getAs[Long]("cum_covered"))
    assert(cums.head == gains.head && cums.sliding(2).forall(w => w(0) <= w(1)))
    assert((1 until 5).forall(i => cums(i) == cums(i - 1) + gains(i)),
      "cum_covered != running sum of gains")
  }

  test("q226 FD profiler agrees with hand-checked dependencies") {
    val fds = SparkEntry.queries("q226_fd_profiler")(spark, sfDir).collect()
      .map(r => r.getAs[String]("fd") -> r.getAs[Boolean]("held")).toMap
    assert(fds("nation.n_nationkey->n_regionkey"), "keyed nation FD must hold")
    assert(fds("customer.c_custkey->c_nationkey"), "customer key FD must hold")
    assert(!fds("lineitem.l_partkey->l_suppkey"), "part->supplier should be violated")
  }

  test("q227 IVM: both split sides contribute and the merged view equals a direct recompute") {
    val orders = graft.core.Tables.orders(spark, sfDir)
      .withColumn("is_delta",
        expr("CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 7), 16, 10) AS BIGINT) % 10 = 0"))
    val nDelta = orders.filter(col("is_delta")).count()
    val nBase = orders.filter(!col("is_delta")).count()
    assert(nDelta > 0 && nBase > 0,
      s"degenerate split (delta=$nDelta, base=$nBase) — the IVM merge would be vacuous")
    val merged = SparkEntry.queries("q227_incremental_view")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("nationkey") ->
        (r.getAs[Long]("n_orders"), r.getAs[Double]("rev"))).toMap
    val direct = graft.core.Tables.orders(spark, sfDir)
      .join(graft.core.Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n"),
        expr("CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)").as("rev"))
      .collect().map(r => r.getAs[Long]("c_nationkey") ->
        (r.getAs[Long]("n"), r.getAs[Double]("rev"))).toMap
    assert(merged == direct, "incrementally maintained view diverges from full recompute")
  }

  test("q228/q229 coverage and lift invariants") {
    val cov = SparkEntry.queries("q228_vocab_coverage")(spark, sfDir).collect()
    cov.foreach { r =>
      val ratio = r.getAs[Double]("oov_ratio")
      assert(ratio >= 0.0 && ratio <= 1.0)
      assert(r.getAs[Long]("n_oov") <= r.getAs[Long]("n_tokens"))
    }
    // any corpus word outside the top-256 must surface as OOV somewhere;
    // a corpus whose whole vocabulary fits in 256 legitimately has none
    val vocabSize = graft.core.Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("w")).filter(col("w") =!= "")
      .select(countDistinct(col("w"))).head().getLong(0)
    assert(cov.exists(_.getAs[Long]("n_oov") > 0) == (vocabSize > 256),
      s"OOV presence must track vocab size ($vocabSize words)")
    val lift = SparkEntry.queries("q229_decile_lift")(spark, sfDir).collect()
    assert(lift.map(_.getAs[Long]("bucket")).sorted.toSeq == (0L to 7L),
      "equi-depth bucketing must populate all 8 octiles")
    val total = lift.map(_.getAs[Long]("n")).sum
    assert(total == graft.core.Tables.events(spark, sfDir).count())
    // equi-depth: no bucket holds more than ~2x its fair share
    lift.foreach(r => assert(r.getAs[Long]("n") <= total / 4,
      s"bucket ${r.getAs[Long]("bucket")} holds ${r.getAs[Long]("n")} of $total — not equi-depth"))
  }

  test("q230 frequent triples satisfy downward closure against independently counted pairs") {
    val li = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairCounts = li.select(col("l_orderkey"), col("l_partkey").as("a"))
      .join(li.select(col("l_orderkey"), col("l_partkey").as("b")), "l_orderkey")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).count()
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val triples = SparkEntry.queries("q230_apriori_triples")(spark, sfDir).collect()
    assert(triples.nonEmpty)
    triples.foreach { r =>
      val (x, y, z, sup) = (r.getAs[Long]("x"), r.getAs[Long]("y"),
        r.getAs[Long]("z"), r.getAs[Long]("support"))
      assert(sup >= 2)
      Seq((x, y), (x, z), (y, z)).foreach { p =>
        assert(pairCounts.getOrElse(p, 0L) >= sup,
          s"sub-pair $p of ($x,$y,$z) has support below the triple's $sup — closure violated")
      }
    }
  }

  test("q230 pair-count and pruned-basket frames are cached, not recomputed per consumer") {
    val df = SparkEntry.queries("q230_apriori_triples")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    val inMem = "InMemoryTableScan".r.findAllIn(p).size
    // fp has 3 semi-join probes + fi; poi has 3 triple-join sides
    assert(inMem >= 6,
      s"expected >=6 cached reads (3 fp probes + fi + 3 poi sides), saw $inMem")
    spark.catalog.clearCache()
  }

  test("q231 rendezvous property: dropping a shard moves only that shard's keys") {
    def assign(nShards: Int) = graft.core.Tables.documents(spark, sfDir).select(col("doc_id"))
      .withColumn("sh", explode(sequence(lit(0), lit(nShards - 1))))
      .withColumn("h", expr(
        "CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '@', CAST(sh AS STRING))), 1, 7), 16, 10) AS BIGINT)"))
      .groupBy(col("doc_id"))
      .agg(max(struct(col("h"), col("sh"))).getField("sh").as("shard"))
      .collect().map(r => r.getLong(0) -> r.getAs[Int]("shard")).toMap
    val with16 = assign(16)
    val with15 = assign(15)
    with16.foreach { case (doc, s16) =>
      if (s16 != 15)
        assert(with15(doc) == s16,
          s"doc $doc moved from shard $s16 to ${with15(doc)} when shard 15 was dropped")
    }
    assert(with16.values.toSet.contains(15), "shard 15 owned no docs — the property check is vacuous")
    val counts = SparkEntry.queries("q231_rendezvous_shards")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("shard") -> r.getAs[Long]("n_docs")).toMap
    assert(counts.values.sum == with16.size)
  }

  test("q232 interpolation stays on-grid and inside each user's observed envelope") {
    val rows = SparkEntry.queries("q232_linear_interp")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getAs[Long]("grid_us") % 21600000000L == 0L, "off-grid point"))
    val env = graft.core.Tables.events(spark, sfDir)
      .groupBy(col("user_id")).agg(min(col("value")).as("lo"), max(col("value")).as("hi"))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    rows.foreach { r =>
      val (lo, hi) = env(r.getAs[Long]("user_id"))
      val v = r.getAs[Double]("v_interp")
      assert(v >= lo - 1e-9 && v <= hi + 1e-9,
        s"interpolated $v escapes the user's observed [$lo, $hi] — not a convex combination")
    }
  }

  test("q233 CUSUM argmax matches a driver-side brute recomputation") {
    val cps = SparkEntry.queries("q233_cusum_changepoint")(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") -> (r.getAs[Long]("cp_index"), r.getAs[Long]("s_scaled"))).toMap
    val byUser = graft.core.Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .collect()
      .groupBy(_.getAs[Long]("user_id"))
    byUser.take(5).foreach { case (uid, rows) =>
      val xs = rows.sortBy(r => (r.getAs[Long]("us"), r.getAs[Long]("event_id")))
        .map(_.getAs[Long]("cents"))
      val (n, t) = (xs.length.toLong, xs.sum)
      val series = xs.scanLeft(0L)(_ + _).drop(1).zipWithIndex
        .map { case (cum, i) => (i + 1L, cum * n - (i + 1L) * t) }
      val best = series.maxBy { case (idx, sv) => (math.abs(sv), -idx) }
      assert(cps(uid) == ((best._1, best._2)),
        s"user $uid: spark cp ${cps(uid)} != brute $best")
    }
  }

  test("q234 skyline is exactly the non-dominated set (brute dominance check)") {
    val sky = SparkEntry.queries("q234_skyline")(spark, sfDir).collect()
      .map(r => (math.round(r.getAs[Double]("price") * 100),
        r.getAs[Number]("size").longValue))
    val pts = graft.core.Tables.part(spark, sfDir)
      .select(expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("pc"),
        col("p_size").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    def dominates(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 <= b._1 && a._2 >= b._2 && (a._1 < b._1 || a._2 > b._2)
    sky.foreach { p =>
      assert(!pts.exists(q => dominates(q, p)), s"skyline point $p is dominated")
    }
    val skySet = sky.toSet
    pts.foreach { p =>
      if (!pts.exists(q => dominates(q, p)))
        assert(skySet.contains(p), s"non-dominated part $p missing from the skyline")
    }
  }

  test("q235/q236 invariants: ppm budgets close, digits exhaustive; lift ranked with support") {
    val ben = SparkEntry.queries("q235_benford_audit")(spark, sfDir).collect()
    assert(ben.map(_.getAs[Long]("digit")).sorted.toSeq == (1L to 9L),
      "all nine leading digits must appear")
    val obsSum = ben.map(_.getAs[Long]("obs_ppm")).sum
    assert(obsSum >= 999991L && obsSum <= 1000000L,
      s"observed ppm sums to $obsSum — floor-div should lose < 9 ppm")
    assert(ben.map(_.getAs[Long]("benford_ppm")).sum == 1000000L)
    val coll = SparkEntry.queries("q236_collocations")(spark, sfDir).collect()
    assert(coll.nonEmpty && coll.length <= 100)
    coll.foreach(r => assert(r.getAs[Long]("nxy") >= 5))
    val lifts = coll.map(_.getAs[Double]("lift"))
    assert(lifts.sliding(2).forall(w => w(0) >= w(1)), "top-100 not ordered by lift")
  }

  test("q237 shares close to 1 within each parent") {
    val rows = SparkEntry.queries("q237_percent_of_parent")(spark, sfDir).collect()
    rows.groupBy(_.getAs[String]("r_name")).foreach { case (r, ns) =>
      val sum = ns.map(_.getAs[Double]("share_of_region")).sum
      assert(math.abs(sum - 1.0) < 1e-9, s"region $r nation shares sum to $sum")
    }
    val regionShares = rows.groupBy(_.getAs[String]("r_name"))
      .map(_._2.head.getAs[Double]("region_share_of_total")).sum
    assert(math.abs(regionShares - 1.0) < 1e-9, s"region shares sum to $regionShares")
  }

  test("q238 two-phase prefix sum: multiple buckets exercised, equals the naive global window") {
    val nBuckets = graft.core.Tables.orders(spark, sfDir)
      .select(expr("o_orderkey div 512").as("b")).distinct().count()
    assert(nBuckets > 1, s"only $nBuckets bucket — the two-phase path is vacuous at this sf")
    val twoPhase = SparkEntry.queries("q238_prefix_sum")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val w = Window.orderBy(col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val naive = graft.core.Tables.orders(spark, sfDir)
      .withColumn("running",
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).over(w))
      .filter(col("o_orderkey") % 128 === 0)
      .collect().map(r => r.getAs[Long]("o_orderkey") -> r.getAs[Long]("running")).toMap
    assert(twoPhase == naive, "two-phase scan diverges from the single-partition window")
  }

  test("q239 deltoids: top-20 by |delta| with halves partitioning the timeline") {
    val rows = SparkEntry.queries("q239_deltoids")(spark, sfDir).collect()
    assert(rows.length == 20)
    val deltas = rows.map(r => math.abs(r.getAs[Long]("delta")))
    assert(deltas.sliding(2).forall(w => w(0) >= w(1)), "not ordered by |delta|")
    rows.foreach(r => assert(r.getAs[Long]("delta") ==
      r.getAs[Long]("c2") - r.getAs[Long]("c1")))
    // both halves carry events — a degenerate split would gut the gate
    assert(rows.map(_.getAs[Long]("c1")).sum > 0 && rows.map(_.getAs[Long]("c2")).sum > 0)
  }

  test("q218 histogram form: partial hash-agg, no imperative percentile state") {
    val df = SparkEntry.queries("q218_table_stats")(spark, sfDir)
    df.collect()
    val p = df.queryExecution.explainString(FormattedMode)
    // the corpus-scale step must be the map-side-combinable value
    // histogram; the old imperative percentile_disc aggregate (585k-
    // entry state maps merged at one reducer) must be gone
    assert(p.contains("HashAggregate"), "value histogram lost its hash aggregation")
    assert(!p.contains("percentile_disc"),
      "imperative percentile state is back — boundaries must come from histogram crossings")
    val stats = df.collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val li = graft.core.Tables.lineitem(spark, sfDir)
    val qty = stats("l_quantity")
    assert(qty.getAs[Long]("ndv") ==
      li.select(countDistinct(col("l_quantity"))).head().getLong(0))
    assert(qty.getAs[Double]("min_v") ==
      li.agg(min(col("l_quantity")).cast("double")).head().getDouble(0))
    // the equi-depth boundaries are nondecreasing and inside [min, max]
    val ps = (1 to 7).map(i => qty.getAs[Double](s"p$i"))
    assert(ps.sliding(2).forall(w => w(0) <= w(1)), s"histogram not monotone: $ps")
    assert(ps.head >= qty.getAs[Double]("min_v") && ps.last <= qty.getAs[Double]("max_v"))
  }

  /** Data-dependent edge cases the shipped testdata happens to dodge
    * (round-7 ADVICE): a synthetic sfDir exercises each one directly.
    */
  private lazy val edgeDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge_sf_").toString
    // q232: user 1's whole span sits inside one 6h grid cell (grid
    // start > hi — Spark's sequence() throws unguarded); user 2 spans
    // the 06:00 boundary with a known midpoint interpolation.
    Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 1L, "view", 10.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 02:00:00"), 1L, "view", 20.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 05:00:00"), 2L, "view", 10.0, "{}"),
      (4L, java.sql.Timestamp.valueOf("2024-01-01 07:00:00"), 2L, "view", 20.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.parquet(s"$dir/events.parquet")
    // q225: only 3 distinct sources — fewer than the 5 greedy rounds
    Seq((1L, "alpha beta gamma", "en", "src_a", 16L),
        (2L, "beta delta", "en", "src_b", 10L),
        (3L, "alpha epsilon", "en", "src_c", 13L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .coalesce(1).write.parquet(s"$dir/documents.parquet")
    // q235: totals at $100M+ (cents >= 1e10, past the old CASE's last
    // arm) plus an ordinary one
    Seq((1L, 1L, "O", 2.5e8, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
        (2L, 1L, "O", 7.0e9, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"),
        (3L, 1L, "O", 12.34, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
      .coalesce(1).write.parquet(s"$dir/orders.parquet")
    dir
  }

  test("q248 winsorized/trimmed means match a driver-side sorted-slice brute") {
    val rows = SparkEntry.queries("q248_robust_means")(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Double]("mean_cents"), r.getAs[Double]("winsor_mean_cents"),
         r.getAs[Double]("trimmed_mean_cents"))).toMap
    val data = graft.core.Tables.events(spark, sfDir)
      .filter(col("value").isNotNull)
      .select(col("event_type"), expr("CAST(round(value * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    data.groupBy(_._1).foreach { case (g, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length; val k = n / 20
      def pd(q: Int) = sorted(math.ceil(q * n / 20.0).toInt - 1) // percentile_disc(q/20)
      val (lo, hi) = (pd(1), pd(19))
      val winsor = sorted.map(v => math.max(lo, math.min(hi, v))).sum.toDouble / n
      val trimmed = sorted.slice(k, n - k)
      val (m, w, t) = rows(g)
      assert(math.abs(m - sorted.sum.toDouble / n) < 1e-9)
      assert(math.abs(w - winsor) < 1e-9, s"$g winsor: $w vs $winsor")
      assert(math.abs(t - trimmed.sum.toDouble / trimmed.length) < 1e-9,
        s"$g trimmed: $t vs brute")
    }
  }

  test("q243 Spearman matches a driver-side average-rank brute recomputation") {
    val rows = SparkEntry.queries("q243_spearman_rho")(spark, sfDir).collect()
      .map(r => r.getAs[String]("l_returnflag") -> r.getAs[Double]("rho")).toMap
    val data = graft.core.Tables.lineitem(spark, sfDir)
      .select(col("l_returnflag"),
        expr("CAST(round(l_quantity) AS BIGINT)"),
        expr("CAST(round(l_discount * 100) AS BIGINT)"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def midRanks(vs: Seq[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.count(_ < v); val c = sorted.count(_ == v)
        v -> (lo + (c + 1) / 2.0)
      }.toMap
    }
    data.groupBy(_._1).foreach { case (g, rs) =>
      val (xs, ys) = (rs.map(_._2).toSeq, rs.map(_._3).toSeq)
      val (rx, ry) = (midRanks(xs), midRanks(ys))
      val n = rs.length.toDouble
      val px = xs.map(rx); val py = ys.map(ry)
      val (mx, my) = (px.sum / n, py.sum / n)
      val num = px.zip(py).map { case (a, b) => (a - mx) * (b - my) }.sum
      val den = math.sqrt(px.map(a => (a - mx) * (a - mx)).sum) *
                math.sqrt(py.map(b => (b - my) * (b - my)).sum)
      val expected = num / den
      assert(math.abs(rows(g) - expected) < 1e-9,
        s"group $g: rho ${rows(g)} vs brute $expected")
    }
  }

  test("q213 adaptive gram salt: parity with unsalted form on a Zipf-hot corpus") {
    // 40 docs all sharing one boilerplate 8-gram (position count 40,
    // far past hotThreshold = 8) + unique framing tokens per doc, plus
    // 4 all-unique docs — the Zipf shape the shipped testdata never
    // produces at a strength that trips the guard.
    val docs = ((0 until 40).map { i =>
      (i.toLong, s"u${i}a u${i}b h h h h h h h h u${i}c u${i}d")
    } ++ (100 until 104).map { i =>
      (i.toLong, s"x${i}a x${i}b x${i}c x${i}d x${i}e x${i}f x${i}g x${i}h x${i}i")
    }).toDF("doc_id", "text")
    def rows(hotThreshold: Long) =
      graft.queries.CurationQueries.spanDedupCoverage(docs, hotThreshold, S = 4)
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_pos"),
                   r.getAs[Long]("n_dup_pos"))).toSet
    val salted = rows(hotThreshold = 8L)
    val unsalted = rows(hotThreshold = Long.MaxValue)
    assert(salted == unsalted, "adaptive salt changed the result")
    // every boilerplate doc must see duplicated span positions
    assert((0 until 40).forall(i => salted.exists(t => t._1 == i && t._3 >= 1L)))
    // the guard only bounds fan-in if the hot gram's rows actually
    // spread over several salts: assert the doc_id hash distribution
    // lands on >= 2 of the 4 salt buckets (deterministic — Spark's
    // hash is a fixed Murmur3)
    val nSalts = docs.filter(col("doc_id") < 40)
      .select(pmod(hash(col("doc_id")), lit(4)).as("s")).distinct().count()
    assert(nSalts >= 2, s"hot rows all hashed to $nSalts salt bucket(s) — no fan-in bound")
  }

  test("q232 single-cell user: no sequence crash, degenerate user emits no grid rows") {
    val rows = SparkEntry.queries("q232_linear_interp")(spark, edgeDir).collect()
    assert(!rows.exists(_.getAs[Long]("user_id") == 1L),
      "user inside one grid cell must produce zero grid points")
    val u2 = rows.filter(_.getAs[Long]("user_id") == 2L)
    // 2024-01-01 06:00 UTC in epoch micros — the only 6h boundary in span
    assert(u2.length == 1 && u2.head.getAs[Long]("grid_us") == 1704088800000000L)
    assert(math.abs(u2.head.getAs[Double]("v_interp") - 15.0) < 1e-9,
      "06:00 midpoint of (05:00, 10.0)..(07:00, 20.0) must interpolate to 15.0")
  }

  test("q225 with fewer sources than rounds stops early instead of throwing") {
    val picks = SparkEntry.queries("q225_greedy_coverage")(spark, edgeDir).collect()
    assert(picks.length == 3, s"3 distinct sources -> 3 rounds, got ${picks.length}")
    assert(picks.map(_.getAs[String]("source")).distinct.length == 3)
    // all 5 distinct words covered once every source is picked
    assert(picks.map(_.getAs[Long]("cum_covered")).max == 5L)
  }

  test("q235 leading digit is exact for amounts >= $100M (no NULL digit group)") {
    val rows = SparkEntry.queries("q235_benford_audit")(spark, edgeDir).collect()
    val byDigit = rows.map(r => r.getAs[Long]("digit") -> r.getAs[Long]("n")).toMap
    // $250M -> digit 2, $7B -> digit 7, $12.34 -> digit 1
    assert(byDigit == Map(1L -> 1L, 2L -> 1L, 7L -> 1L), s"got $byDigit")
    assert(rows.forall(r => !r.isNullAt(r.fieldIndex("digit"))), "NULL digit group leaked")
  }

  test("q277 packing arithmetic closes per shard (bins = ceil, waste < bin)") {
    val rows = SparkEntry.queries("q277_sequence_packing")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, bins, waste) = (r.getAs[Long]("total_tokens"),
        r.getAs[Long]("n_bins"), r.getAs[Long]("tail_waste"))
      assert(bins == (tot + 511) / 512, s"shard ${r.get(0)}: bins $bins vs tokens $tot")
      assert(waste == bins * 512 - tot && waste >= 0 && waste < 512,
        s"shard ${r.get(0)}: waste $waste")
      assert(r.getAs[Long]("n_crossing") <= r.getAs[Long]("n_docs"))
    }
  }

  test("q278 finds every planted PII instance and redacts to zero residual") {
    val rows = SparkEntry.queries("q278_pii_redaction")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val n = r.getAs[Long]("n_rows")
      assert(r.getAs[Long]("emails") == n && r.getAs[Long]("phones") == n &&
        r.getAs[Long]("cards") == n,
        s"segment ${r.get(0)}: planted-one-per-class violated")
      assert(r.getAs[Long]("residual_pii") == 0L, s"segment ${r.get(0)}: residual PII")
      assert(r.getAs[Long]("chars_removed") > 0L)
    }
  }

  test("q279 repetition ppms bounded, flags subset of docs") {
    val rows = SparkEntry.queries("q279_repetition_filters")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val docs = r.getAs[Long]("docs")
      assert(r.getAs[Long]("flagged") <= docs)
      // top2_ppm <= 2e6 per doc (a bigram covers at most every token twice)
      assert(r.getAs[Long]("sum_top2_ppm") <= 2000000L * docs)
      assert(r.getAs[Long]("sum_dup5_ppm") >= 0L &&
        r.getAs[Long]("sum_dup5_ppm") <= 1000000L * docs)
    }
  }

  test("q280 chunk geometry: stride/overlap arithmetic and materialized checksums") {
    val rows = SparkEntry.queries("q280_context_chunking")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var multi = 0
    rows.foreach { r =>
      val (n, k) = (r.getAs[Long]("n_tok"), r.getAs[Long]("n_chunks"))
      val expectK = if (n <= 32) 1L else (n - 32 + 23) / 24 + 1
      assert(k == expectK, s"doc ${r.get(0)}: chunks $k != $expectK for n=$n")
      assert(r.getAs[Long]("redundancy") == (k - 1) * 8,
        s"doc ${r.get(0)}: overlap arithmetic broken")
      assert(r.getAs[Long]("covered") == n + (k - 1) * 8)
      assert(r.getAs[Long]("chunk_sum") > 0L, s"doc ${r.get(0)}: empty checksum")
      if (k > 1) multi += 1
    }
    assert(multi > 0, "no multi-chunk docs — gate exercises nothing")
  }

  test("q281 temperature quotas: exact budget, flatter than proportional") {
    val rows = SparkEntry.queries("q281_temperature_mixture")(spark, sfDir).collect()
    assert(rows.length >= 2)
    assert(rows.map(_.getAs[Long]("quota")).sum == 100000L, "largest-remainder budget broken")
    // temperature flattening: the largest stratum's quota share must be
    // strictly below its token share; the smallest strictly above
    val byTok = rows.sortBy(_.getAs[Long]("tokens"))
    val totTok = rows.map(_.getAs[Long]("tokens")).sum.toDouble
    val big = byTok.last; val small = byTok.head
    assert(big.getAs[Long]("quota") / 100000.0 < big.getAs[Long]("tokens") / totTok)
    assert(small.getAs[Long]("quota") / 100000.0 > small.getAs[Long]("tokens") / totTok)
  }

  test("q287 maintained-index decontamination == the one-shot batch screen") {
    // independent oracle: the plain one-shot screen (no index, no
    // waves) computed with vanilla DataFrame ops over the same corpus
    val sh = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), explode(graft.ext.TextAnalysis.shingles(
        graft.ext.TextAnalysis.tokens(col("text")), 3)).as("g"))
      .distinct()
    val tr = sh.filter(col("doc_id") >= 100L).withColumnRenamed("doc_id", "train_id")
    val keep = tr.groupBy(col("g")).agg(count(lit(1)).as("df"))
      .filter(col("df") <= 50L).select(col("g"))
    val ev = sh.filter(col("doc_id") < 100L).withColumnRenamed("doc_id", "eval_id")
    val expected = tr.join(keep, "g").join(ev, "g")
      .groupBy(col("train_id"), col("eval_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= 5L)
    val got = SparkEntry.queries("q287_incremental_decontamination")(spark, sfDir)
    assert(got.exceptAll(expected).isEmpty && expected.exceptAll(got).isEmpty,
      "wave-probed index verdicts diverge from the one-shot batch screen")
  }

  test("q288 span excision: islands match a local brute recomputation") {
    // fully independent re-derivation in driver-local Scala: tokenize,
    // collect the benchmark gram set, find hit positions, merge
    // overlapping [p, p+2] spans, account removed tokens
    val all = graft.core.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    def grams(ts: Seq[String]): Seq[(Long, String)] =
      (1 to math.max(ts.length - 2, 1))
        .map(i => i.toLong -> ts.slice(i - 1, i + 2).mkString(" "))
    val bench: Set[String] =
      all.filter(_._1 < 100L).values.flatMap(grams(_).map(_._2)).toSet
    val expected: Map[Long, (Long, Long, Long)] = all.collect {
      case (id, ts) if id >= 100L =>
        val hits = grams(ts).collect { case (p, g) if bench(g) => p }.sorted
        if (hits.isEmpty) None
        else {
          val nTok = ts.length.toLong
          // gaps-and-islands on start positions: overlap while gap <= 2
          val islands = hits.tail.foldLeft(Seq(Seq(hits.head))) { (acc, p) =>
            if (p - acc.last.last <= 2) acc.init :+ (acc.last :+ p)
            else acc :+ Seq(p)
          }
          val removed = islands.map(i => math.min(i.last + 2, nTok) - i.head + 1).sum
          Some(id -> ((nTok, islands.size.toLong, removed)))
        }
    }.flatten.toMap
    val got = SparkEntry.queries("q288_decontam_span_excise")(spark, sfDir)
      .collect().map(r => r.getAs[Long]("train_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("n_removed")))).toMap
    assert(got == expected,
      s"span accounting diverges: only-got=${(got.keySet -- expected.keySet).take(5)} " +
        s"only-exp=${(expected.keySet -- got.keySet).take(5)} " +
        s"diff=${expected.collect { case (k, v) if got.get(k).exists(_ != v) => (k, v, got(k)) }.take(5)}")
  }
}
