package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Round-6 batch: attribution, frequent-items sketch, bounded label
  * propagation, and weighted sampling — each oracle-gated and shaped
  * for the 1000-executor case.
  */
object AdvancedQueries {

  // ---------------------------------------------------------------- q197
  /** LINEAR MULTI-TOUCH attribution: each purchase's value is credited
    * across the user's click/view touches in the trailing 24 h,
    * proportionally by touch-type share (the multi-touch complement of
    * q154's last-touch). The touch counts come from one RANGE-framed
    * window pass over the per-user timeline — never a purchases x
    * touches range join, which re-materializes the fan-out the frame
    * already bounds. One shuffle (by user), frame state is O(window
    * content), and the emitted credit is an exact IEEE quotient of
    * integer-valued terms (cents * n_t < 2^53), identical cross-engine.
    */
  def q197MultiTouchAttribution(s: SparkSession, d: String): DataFrame = {
    val dayUs = 86400000000L
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-dayUs, 0L)
    val counted = ev
      .withColumn("n_click", sum(when(col("event_type") === "click", 1L).otherwise(0L)).over(w))
      .withColumn("n_view",  sum(when(col("event_type") === "view",  1L).otherwise(0L)).over(w))
      .filter(col("event_type") === "purchase" && col("value").isNotNull)
      .withColumn("cents", round(col("value") * 100).cast("long"))
      .withColumn("n_touch", col("n_click") + col("n_view"))
      .filter(col("n_touch") > 0)
    counted
      .select(col("event_id"), col("user_id"), col("cents"), col("n_touch"),
        expr("stack(2, 'click', n_click, 'view', n_view) AS (touch_type, n_t)"))
      .filter(col("n_t") > 0)
      .select(col("event_id"), col("user_id"), col("touch_type"), col("n_t"),
        ((col("cents") * col("n_t")).cast("double") / col("n_touch")).as("credit"))
  }

  val q197Sql: String =
    """WITH ev AS (SELECT event_id, user_id, event_type, epoch_us(ts) AS us, value FROM events),
      |c AS (SELECT event_id, user_id, event_type, value,
      |    sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) OVER w AS n_click,
      |    sum(CASE WHEN event_type = 'view'  THEN 1 ELSE 0 END) OVER w AS n_view
      |  FROM ev
      |  WINDOW w AS (PARTITION BY user_id ORDER BY us
      |    RANGE BETWEEN 86400000000 PRECEDING AND CURRENT ROW)),
      |p AS (SELECT event_id, user_id, CAST(round(value * 100) AS BIGINT) AS cents,
      |    n_click, n_view, n_click + n_view AS n_touch
      |  FROM c WHERE event_type = 'purchase' AND value IS NOT NULL
      |    AND n_click + n_view > 0),
      |u AS (SELECT event_id, user_id, cents, n_touch, 'click' AS touch_type, n_click AS n_t FROM p
      |  UNION ALL
      |  SELECT event_id, user_id, cents, n_touch, 'view', n_view FROM p)
      |SELECT event_id, user_id, touch_type, CAST(n_t AS BIGINT) AS n_t,
      |  CAST(cents * n_t AS DOUBLE) / n_touch AS credit
      |FROM u WHERE n_t > 0""".stripMargin

  // ---------------------------------------------------------------- q198
  /** FREQUENT ITEMS via a Misra-Gries summary
    * ([[graft.functions.MisraGries]]) — deterministic heavy hitters
    * with a one-sided guarantee: every item with true count > n/k is
    * in the k-counter sketch. The sketch is a mergeable Aggregator
    * (map-side combine carries <= k counters per partition, never the
    * item stream), next to the randomized count-min estimates (q52/
    * q108) and the bounded top-k by value (q128).
    *
    * Witness discipline (SEMANTICS.md): the candidate SET beyond the
    * guarantee is merge-order-dependent, so the gate emits the
    * EXACT frequent items (count > n/64 from an exact aggregate) plus
    * the in-band boolean "item is in the sketch", which the guarantee
    * forces TRUE — a sketch that lost a guaranteed item fails the
    * hash. Items are floor(value) buckets — naturally skewed enough
    * that several buckets clear the n/64 bar on the synthetic data.
    */
  def q198FrequentItems(s: SparkSession, d: String): DataFrame = {
    val k = 64
    val items = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(floor(col("value")).cast("long").cast("string").as("item"))
    val mg = udaf(graft.functions.MisraGries(k))
    val sketch = items.agg(mg(col("item")).as("cands")) // 1 row, <= k entries
    val totals = items.agg(count(lit(1)).as("n_total")) // 1 row
    items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
      .crossJoin(broadcast(totals))
      .filter(col("n_item") > col("n_total") / lit(k.toDouble))
      .crossJoin(broadcast(sketch))
      .select(col("item"), col("n_item"),
        array_contains(col("cands"), col("item")).as("in_sketch"))
  }

  val q198Sql: String =
    """WITH i AS (SELECT CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS item
      |    FROM events WHERE value IS NOT NULL),
      |t AS (SELECT count(*) AS n_total FROM i)
      |SELECT item, CAST(count(*) AS BIGINT) AS n_item, TRUE AS in_sketch
      |FROM i, t GROUP BY item, n_total
      |HAVING count(*) > n_total / 64.0""".stripMargin

  // ---------------------------------------------------------------- q199
  /** BOUNDED LABEL PROPAGATION over the co-purchase graph: 3
    * synchronous min-label rounds (label := min(own, neighbors')) from
    * identity labels — the community-seeding primitive between a
    * single groupBy (no structure) and full connected components
    * (q71's log-diameter star escalation). Each round is one shuffle
    * join (edges x labels) plus a min-aggregate; 3 rounds means the
    * plan stays O(1) deep without lineage checkpoints. Fixed round
    * count is what makes the semantics SQL-expressible — the oracle
    * is the same 3 chained joins — and is the honest contract at
    * 100 TB: rounds, not convergence, bound the cost (full closure is
    * q71's job).
    */
  def q199LabelPropagation(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey").cast("long").as("p"))
      .distinct()
    val e = li.as("x").join(li.as("y"), "l_orderkey")
      .select(col("x.p").as("src"), col("y.p").as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
    var labels = li.select(col("p").as("vx")).distinct()
      .withColumn("lbl", col("vx"))
    for (_ <- 1 to 3) {
      val nbr = e.join(labels, e("src") === labels("vx"))
        .groupBy(col("dst")).agg(min(col("lbl")).as("nl"))
      labels = labels.join(nbr, labels("vx") === nbr("dst"), "left")
        .select(labels("vx"),
          least(col("lbl"), coalesce(col("nl"), col("lbl"))).as("lbl"))
    }
    labels.select(col("vx").as("part"), col("lbl").as("community"))
  }

  val q199Sql: String =
    """WITH li AS (SELECT DISTINCT l_orderkey, CAST(l_partkey AS BIGINT) AS p FROM lineitem),
      |e AS (SELECT DISTINCT a.p AS src, b.p AS dst
      |  FROM li a JOIN li b USING (l_orderkey) WHERE a.p <> b.p),
      |v AS (SELECT DISTINCT p AS vx FROM li),
      |l0 AS (SELECT vx, vx AS lbl FROM v),
      |n1 AS (SELECT e.dst AS vx, min(x.lbl) AS nl FROM e JOIN l0 x ON e.src = x.vx GROUP BY e.dst),
      |l1 AS (SELECT l.vx, least(l.lbl, coalesce(n1.nl, l.lbl)) AS lbl FROM l0 l LEFT JOIN n1 USING (vx)),
      |n2 AS (SELECT e.dst AS vx, min(x.lbl) AS nl FROM e JOIN l1 x ON e.src = x.vx GROUP BY e.dst),
      |l2 AS (SELECT l.vx, least(l.lbl, coalesce(n2.nl, l.lbl)) AS lbl FROM l1 l LEFT JOIN n2 USING (vx)),
      |n3 AS (SELECT e.dst AS vx, min(x.lbl) AS nl FROM e JOIN l2 x ON e.src = x.vx GROUP BY e.dst),
      |l3 AS (SELECT l.vx, least(l.lbl, coalesce(n3.nl, l.lbl)) AS lbl FROM l2 l LEFT JOIN n3 USING (vx))
      |SELECT vx AS part, lbl AS community FROM l3""".stripMargin

  // ---------------------------------------------------------------- q200
  /** WEIGHTED SAMPLING WITHOUT REPLACEMENT (Efraimidis-Spirakis A-ES):
    * per language, the top-10 documents by priority u^(1/w), where w
    * is the document's char count and u is a deterministic md5-derived
    * uniform (the q121 hash-draw idiom: first 13 md5 hex digits / 2^52
    * — 52 bits, exact in double on both engines). A-ES turns weighted
    * sampling into a plain top-k: the priority is a per-row expression
    * (zero shuffles), and the selection runs through the bounded top-k
    * Aggregator (q128) — map-side combine carries <= 10 (priority, id)
    * pairs per partition per language, never the corpus, which is the
    * 100 TB path a row_number() window (full shuffle + sort of every
    * row) cannot take. Cross-engine pow() agrees far inside the
    * harness tolerance: adjacent priorities differ by >= ~1e-6 while
    * libm/JDK pow disagree at <= 1 ulp (~1e-16).
    */
  def q200WeightedSample(s: SparkSession, d: String): DataFrame = {
    val twoTo52 = 4503599627370496.0 // 16^13
    val base = Tables.documents(s, d)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .filter(col("n_chars") > 0)
    val u = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("double") / lit(twoTo52)
    val scored = base.withColumn("priority",
      pow(u, lit(1.0) / col("n_chars").cast("double")))
    val topk = udaf(graft.functions.TopK(10))
    val top = scored.groupBy(col("lang"))
      .agg(topk(col("priority"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")))
      .select(col("lang"), (col("pos") + 1).cast("long").as("rk"),
        col("col._2").as("doc_id"))
    top.join(base.select(col("doc_id"), col("n_chars")), Seq("doc_id"))
      .select(col("lang"), col("rk"), col("doc_id"), col("n_chars"))
  }

  val q200Sql: String =
    """WITH b AS (SELECT doc_id, lang, n_chars,
      |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))::BIGINT
      |      / 4503599627370496.0 AS u
      |  FROM documents WHERE n_chars > 0),
      |r AS (SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY pow(u, 1.0 / n_chars) DESC, doc_id) AS rk
      |  FROM b)
      |SELECT lang, CAST(rk AS BIGINT) AS rk, doc_id, n_chars
      |FROM r WHERE rk <= 10""".stripMargin

  // ---------------------------------------------------------------- q201
  /** BOUNDED K-CORE PEELING (3 rounds, K=16) over the word-adjacency
    * graph (tokens that appear consecutively in a document): each
    * round drops vertices whose degree in the surviving subgraph is
    * < K, then restricts edges to survivors — the cohesion filter
    * between raw degree (one agg) and full k-core decomposition
    * (data-dependent round count). The word graph is the right
    * substrate: Zipfian degrees peel gently into a stable hub core,
    * where the near-regular co-purchase graph collapses all-or-nothing
    * under any interesting K. Each round is one degree aggregate + two
    * semi-join-shaped edge restrictions; 3 fixed rounds keeps the plan
    * O(1) deep and the semantics SQL-chainable (q199's fixed-round
    * contract). At 100 TB the same loop runs to fixpoint with lineage
    * checkpoints per round (q71's escalation discipline); bounded
    * rounds are the gate-able prefix of that loop. Output is
    * operational and engine-agnostic: post-round-3 edge-set degrees.
    */
  def q201KCorePeeling(s: SparkSession, d: String): DataFrame = {
    val K = 16
    val bg = Tables.documents(s, d)
      .select(split(col("text"), " ").as("ts"))
      .select(explode(expr(
        """zip_with(slice(ts, 1, greatest(size(ts) - 1, 0)),
          |         slice(ts, 2, greatest(size(ts) - 1, 0)),
          |         (x, y) -> struct(x AS a, y AS b))""".stripMargin)).as("p"))
      .select(col("p.a").as("a"), col("p.b").as("b"))
      .filter(col("a") =!= col("b"))
    var e = bg.select(col("a").as("src"), col("b").as("dst"))
      .union(bg.select(col("b").as("src"), col("a").as("dst")))
      .distinct()
    for (_ <- 1 to 3) {
      val alive = e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= K).select(col("src").as("v"))
      e = e.join(alive.select(col("v").as("src")), "src")
           .join(alive.select(col("v").as("dst")), "dst")
           .select(col("src"), col("dst"))
    }
    e.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      .select(col("src").as("token"), col("deg"))
  }

  val q201Sql: String =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      |bg AS (SELECT unnest(list_transform(generate_series(1, len(ts) - 1),
      |    i -> [ts[i], ts[i+1]])) AS pr FROM t),
      |e0 AS (SELECT DISTINCT pr[1] AS src, pr[2] AS dst FROM bg WHERE pr[1] <> pr[2]
      |  UNION SELECT DISTINCT pr[2], pr[1] FROM bg WHERE pr[1] <> pr[2]),
      |a1 AS (SELECT src AS v FROM e0 GROUP BY src HAVING count(*) >= 16),
      |e1 AS (SELECT e.src, e.dst FROM e0 e JOIN a1 x ON e.src = x.v JOIN a1 y ON e.dst = y.v),
      |a2 AS (SELECT src AS v FROM e1 GROUP BY src HAVING count(*) >= 16),
      |e2 AS (SELECT e.src, e.dst FROM e1 e JOIN a2 x ON e.src = x.v JOIN a2 y ON e.dst = y.v),
      |a3 AS (SELECT src AS v FROM e2 GROUP BY src HAVING count(*) >= 16),
      |e3 AS (SELECT e.src, e.dst FROM e2 e JOIN a3 x ON e.src = x.v JOIN a3 y ON e.dst = y.v)
      |SELECT src AS token, CAST(count(*) AS BIGINT) AS deg
      |FROM e3 GROUP BY src""".stripMargin

  // ---------------------------------------------------------------- q203
  /** SPARSE RANDOM PROJECTION (Johnson-Lindenstrauss, Achlioptas +-1
    * signs): 64-dim embeddings down to 16 dims via p_j = sum_i s_ij *
    * v_i / sqrt(16), where the sign matrix s_ij is derived from md5
    * parity of "i_j" — deterministic, seedless, and recomputable by
    * ANY engine, which is what makes the projection itself (not just a
    * witness) the gate. The 16x64 sign matrix is computed once on the
    * driver (metadata scale — the broadcast-literal discipline of the
    * k-means centroids) and folded into per-row zip_with/aggregate
    * expressions: the projection is a single codegen'd map over the
    * scan, zero shuffles, zero joins. Long-format output (q115's
    * melt): the explode is over the 16 PROJECTED dims, never the input
    * fact.
    */
  val JlOutDims = 16
  val JlInDims = 64

  /** Same formula both engines: +1 if the first md5 hex digit of
    * "i_j" is even, else -1. */
  private def jlSign(i: Int, j: Int): Double = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"${i}_$j".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    if (Integer.parseInt(hex.substring(0, 1), 16) % 2 == 0) 1.0 else -1.0
  }

  def q203RandomProjection(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
    val projected = (1 to JlOutDims).map { j =>
      val signs = array((1 to JlInDims).map(i => lit(jlSign(i, j))): _*)
      (aggregate(zip_with(col("v"), signs, (x, sg) => x * sg),
        lit(0.0), (acc, x) => acc + x) / lit(4.0)).as(s"p_$j")
    }
    emb.select(col("vec_id") +: projected: _*)
      .select(col("vec_id"),
        posexplode(array((1 to JlOutDims).map(j => col(s"p_$j")): _*)))
      .select(col("vec_id"), (col("pos") + 1).cast("long").as("dim_j"),
        col("col").as("p"))
  }

  /** The fold is pinned ascending-i on BOTH engines: Spark's
    * aggregate() is a left fold, and the twin uses list_reduce (also a
    * left fold) over the per-row dim list — an unnest + hash-agg
    * sum() would accumulate in morsel order and could differ at the
    * last ulp, exactly at rounding boundaries. */
  val q203Sql: String =
    s"""SELECT vec_id, CAST(j AS BIGINT) AS dim_j,
       |  list_reduce(list_transform(generate_series(1, $JlInDims),
       |    i -> (CASE WHEN ('0x' || substr(md5(CAST(i AS VARCHAR) || '_' || CAST(j AS VARCHAR)), 1, 1))::INT % 2 = 0
       |          THEN 1.0 ELSE -1.0 END) * CAST(embedding[i] AS DOUBLE)),
       |    (x, y) -> x + y) / 4.0 AS p
       |FROM embeddings, unnest(generate_series(1, $JlOutDims)) t(j)""".stripMargin

  // ---------------------------------------------------------------- q204
  /** NATIVE approx_top_k (Spark 4.1's DataSketches frequent-items
    * aggregate) — completes the native sketch surface next to HLL
    * (q39), count-min (q52/q108), quantile (q116), and the custom MG
    * Aggregator (q198). Witness discipline: the sketch's top list is
    * engine-specific, so the gate ranks by the EXACT counts (count
    * DESC, item ASC — deterministic) and emits, per exact-top-10 item,
    * the in-band boolean that the sketch tracked it within a 1%-of-n
    * error bound. At the gate's cardinalities the sketch is exact; the
    * bound is the honest contract for open-vocabulary streams where
    * compaction kicks in.
    */
  def q204ApproxTopK(s: SparkSession, d: String): DataFrame = {
    val items = Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(floor(col("value")).cast("long").cast("string").as("item"))
    val est = items.agg(expr("approx_top_k(item, 20)").as("tk"))
      .select(explode(col("tk")).as("e"))
      .select(col("e.item").as("item"), col("e.count").as("est"))
    val exact = items.groupBy(col("item")).agg(count(lit(1)).as("n_item"))
    val totals = items.agg(count(lit(1)).as("n_total"))
    // top-10 selection via orderBy+limit — plans as TakeOrderedAndProject
    // (per-partition top-10, merged on the driver), never a global sort
    // of all distinct items; the rank window then runs over the
    // 10-row result (bounded input — the q37 probe-set precedent)
    val top10 = exact.orderBy(col("n_item").desc, col("item").asc).limit(10)
    val w = Window.orderBy(col("n_item").desc, col("item").asc)
    top10
      .withColumn("rk", row_number().over(w).cast("long"))
      .join(est, Seq("item"), "left")
      .crossJoin(broadcast(totals))
      .select(col("item"), col("rk"), col("n_item"),
        (col("est").isNotNull &&
          abs(col("est") - col("n_item")) <= col("n_total") / lit(100.0)).as("tracked_ok"))
  }

  val q204Sql: String =
    """WITH i AS (SELECT CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) AS item
      |    FROM events WHERE value IS NOT NULL),
      |x AS (SELECT item, count(*) AS n_item FROM i GROUP BY item),
      |r AS (SELECT item, n_item,
      |    row_number() OVER (ORDER BY n_item DESC, item) AS rk FROM x)
      |SELECT item, CAST(rk AS BIGINT) AS rk, CAST(n_item AS BIGINT) AS n_item,
      |  TRUE AS tracked_ok
      |FROM r WHERE rk <= 10""".stripMargin

  // ---------------------------------------------------------------- q205
  /** PRODUCT QUANTIZATION ANN (PQ-flat with asymmetric distance): the
    * 64-dim embedding splits into 8 subspaces of 8 dims; each subspace
    * has a 16-entry codebook, so a vector compresses to 8 code bytes
    * (64x smaller than float32); queries score candidates by ADC —
    * summing 8 precomputed query-to-centroid subdistances instead of
    * 64-dim float math. q37's determinism trick makes the ORACLE exact
    * rather than witness-weak: codebooks are data-derived (stride-25
    * vec_ids), so DuckDB recomputes encode + ADC + ranking bit-for-bit
    * (identical IEEE op order: ascending-i fold per subspace, round-6 +
    * id tie-break at every argmin/rank — the q37 discipline).
    *
    * Scale shape: encoding is one crossJoin against a BROADCAST
    * 128-row codebook + packed-long argmin inside HashAggregate (the
    * q37 pack — no sort, no window over the corpus); ADC joins the
    * 8-row-per-vector code table against a broadcast query-distance
    * table on (subspace, code) — shuffle-free compute, ONE shuffle for
    * the per-(query, candidate) sum. At 100 TB, PQ composes with the
    * IVF cells (q37/q75): probe only in-cell codes (IVF-PQ) — the gate
    * pins the PQ half of that pipeline.
    */
  val PqSubspaces = 8
  val PqSubDim = 8
  val PqCents = 16

  def q205ProductQuantization(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    // 8-dim subvector L2^2, ascending-i fold — DuckDB list_sum twin
    // runs the identical op order, so the doubles agree bit-for-bit
    def subDist(v: org.apache.spark.sql.Column, c: org.apache.spark.sql.Column,
                sCol: org.apache.spark.sql.Column) =
      aggregate(
        zip_with(slice(v, (sCol - 1) * PqSubDim + 1, lit(PqSubDim)),
                 slice(c, (sCol - 1) * PqSubDim + 1, lit(PqSubDim)),
          (x, y) => (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x)
    val subs = s.range(1, PqSubspaces + 1).select(col("id").cast("int").as("s"))
    val cents = emb.filter(col("vec_id") % 25 === 0 && col("vec_id") < (25 * PqCents))
      .select(expr("vec_id div 25").as("cent_idx"), col("embedding").as("ce"))
      .crossJoin(subs)
    val m = lit(PqCents.toLong)
    // encode: argmin via the packed-long min (round-6 snap + idx tie-break)
    val dist6i = round(round(subDist(col("embedding"), col("ce"), col("s")), 6) * 1e6, 0)
      .cast("long")
    val codes = emb.select(col("vec_id").as("vid"), col("embedding"))
      .crossJoin(broadcast(cents))
      .withColumn("packed", dist6i * m + col("cent_idx"))
      .groupBy(col("vid"), col("s"))
      .agg(min(col("packed")).as("p"))
      .withColumn("cent_idx", pmod(col("p"), m))
      .select(col("vid"), col("s"), col("cent_idx"))
    // ADC lookup table: |Q| x 8 x 16 rows — broadcast metadata. The
    // per-subspace distance is snapped to INTEGER micros before the
    // 8-way sum: the ADC accumulation order is shuffle-dependent (and
    // DuckDB's hash-agg order is its own), so a double sum would break
    // the exact-oracle contract exactly at rounding boundaries;
    // integer addition is order-free on both engines.
    val qd = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("qd6i",
        round(round(subDist(col("qe"), col("ce"), col("s")), 6) * 1e6, 0).cast("long"))
      .select(col("qid"), col("s"), col("cent_idx"), col("qd6i"))
    val w = Window.partitionBy(col("qid")).orderBy(col("adist6").asc, col("cid").asc)
    codes.join(broadcast(qd), Seq("s", "cent_idx"))
      .filter(col("vid") =!= col("qid"))
      .groupBy(col("qid"), col("vid"))
      .agg(sum(col("qd6i")).as("a6i"))
      .withColumn("adist6", col("a6i") / lit(1e6))
      .select(col("qid"), col("vid").as("cid"), col("adist6"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("adist6"))
  }

  val q205Sql: String =
    s"""WITH sub AS (SELECT unnest(generate_series(1, $PqSubspaces)) AS s),
       |cents AS (SELECT CAST(vec_id // 25 AS BIGINT) AS cent_idx, embedding AS ce
       |  FROM embeddings WHERE vec_id % 25 = 0 AND vec_id < ${25 * PqCents}),
       |encd AS (SELECT e.vec_id AS vid, sub.s, c.cent_idx,
       |    list_reduce(list_transform(generate_series(1, $PqSubDim),
       |      i -> (CAST(e.embedding[(sub.s - 1) * $PqSubDim + i] AS DOUBLE)
       |            - CAST(c.ce[(sub.s - 1) * $PqSubDim + i] AS DOUBLE))
       |         * (CAST(e.embedding[(sub.s - 1) * $PqSubDim + i] AS DOUBLE)
       |            - CAST(c.ce[(sub.s - 1) * $PqSubDim + i] AS DOUBLE))),
       |      (x, y) -> x + y) AS dist
       |  FROM embeddings e, sub, cents c),
       |enc AS (SELECT vid, s, cent_idx FROM (
       |    SELECT vid, s, cent_idx,
       |      row_number() OVER (PARTITION BY vid, s ORDER BY round(dist, 6), cent_idx) AS rn
       |    FROM encd) WHERE rn = 1),
       |qd AS (SELECT e.vec_id AS qid, sub.s, c.cent_idx,
       |    CAST(round(round(list_reduce(list_transform(generate_series(1, $PqSubDim),
       |      i -> (CAST(e.embedding[(sub.s - 1) * $PqSubDim + i] AS DOUBLE)
       |            - CAST(c.ce[(sub.s - 1) * $PqSubDim + i] AS DOUBLE))
       |         * (CAST(e.embedding[(sub.s - 1) * $PqSubDim + i] AS DOUBLE)
       |            - CAST(c.ce[(sub.s - 1) * $PqSubDim + i] AS DOUBLE))),
       |      (x, y) -> x + y), 6) * 1e6) AS BIGINT) AS qd6i
       |  FROM embeddings e, sub, cents c WHERE e.vec_id < 20),
       |adc AS (SELECT qd.qid, enc.vid, CAST(sum(qd.qd6i) AS BIGINT) AS a6i
       |  FROM enc JOIN qd ON enc.s = qd.s AND enc.cent_idx = qd.cent_idx
       |  WHERE enc.vid <> qd.qid GROUP BY qd.qid, enc.vid)
       |SELECT qid, CAST(rk AS BIGINT) AS rank, vid AS cid, a6i / 1e6 AS adist6
       |FROM (SELECT qid, vid, a6i,
       |    row_number() OVER (PARTITION BY qid ORDER BY a6i, vid) AS rk
       |  FROM adc)
       |WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- q206
  /** INTERVAL-OVERLAP JOIN (intervals x intervals — the shape point-
    * in-range as-of joins (q36/q60) and grid epsilon joins (q156)
    * don't cover): per-user activity sessions (4h-gap islands) joined
    * against every OTHER user's overlapping session, emitted as a
    * per-session concurrency count. The scale path is TEMPORAL
    * BANDING: each interval explodes to the 6h bands it spans
    * (span-bounded — sessions are gap-bounded, so bands-per-interval
    * is small), the join runs as a band EQUI-join, and each
    * overlapping pair is counted exactly once by pinning it to the
    * band of the later interval start (floor(max(st1,st2)/B) lies in
    * both intervals' band ranges whenever they overlap). A plain
    * interval theta join is quadratic-per-time-region; banding makes
    * the work proportional to sum of per-band concurrency^2 — the
    * calendar/genomics interval-join discipline. Band arithmetic uses
    * integral div (epoch-micros magnitudes exceed 2^53 — the q134
    * lesson).
    */
  def q206IntervalOverlapJoin(s: SparkSession, d: String): DataFrame = {
    val gapUs = 4L * 3600000000L
    // 1h bands, not 6h: candidate volume is sum of per-band
    // concurrency^2, and on burst-heavy data narrower bands cut the
    // quadratic term faster than they grow the linear band-row term
    // (measured at sf1: 5.2e9 candidates at 6h vs 2.3e9 at 1h; below
    // 1h the band-row growth wins and volume rises again). The band
    // width is internal — the pair-once pinning argument holds for
    // any width.
    val bandUs = 3600000000L
    val ev = Tables.events(s, d)
      .select(col("user_id"), unix_micros(col("ts")).as("us"))
    val wLag = Window.partitionBy(col("user_id")).orderBy(col("us"))
    val sess = ev
      .withColumn("brk",
        when(col("us") - lag(col("us"), 1).over(wLag) > gapUs, 1L).otherwise(0L))
      .withColumn("isl", sum(col("brk")).over(
        wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("isl"))
      .agg(min(col("us")).as("st"), max(col("us")).as("en"))
      .withColumn("sid", col("user_id") * lit(1000000L) + col("isl"))
    def bandOf(c: org.apache.spark.sql.Column) =
      call_function("div", c, lit(bandUs))
    val bands = sess.withColumn("band",
      explode(sequence(bandOf(col("st")), bandOf(col("en")))))
    val a = bands.select(col("sid").as("a_sid"), col("user_id").as("a_uid"),
      col("st").as("a_st"), col("en").as("a_en"), col("band"))
    val b = bands.select(col("sid").as("b_sid"), col("user_id").as("b_uid"),
      col("st").as("b_st"), col("en").as("b_en"), col("band"))
    val overlaps = a.join(b, Seq("band"))
      .filter(col("a_uid") =!= col("b_uid") &&
        col("a_st") <= col("b_en") && col("b_st") <= col("a_en") &&
        col("band") === bandOf(greatest(col("a_st"), col("b_st"))))
      .groupBy(col("a_sid")).agg(count(lit(1)).as("n"))
    sess.join(overlaps, sess("sid") === overlaps("a_sid"), "left")
      .select(col("sid"), coalesce(col("n"), lit(0L)).as("n_concurrent"))
  }

  val q206Sql: String =
    """WITH ev AS (SELECT user_id, epoch_us(ts) AS us FROM events),
      |o AS (SELECT user_id, us, CASE WHEN us - lag(us) OVER
      |    (PARTITION BY user_id ORDER BY us) > 14400000000 THEN 1 ELSE 0 END AS brk
      |  FROM ev),
      |i AS (SELECT user_id, us, sum(brk) OVER (PARTITION BY user_id ORDER BY us
      |    ROWS UNBOUNDED PRECEDING) AS isl FROM o),
      |sess AS (SELECT user_id, CAST(user_id * 1000000 + isl AS BIGINT) AS sid,
      |    min(us) AS st, max(us) AS en
      |  FROM i GROUP BY user_id, isl)
      |SELECT s.sid, CAST(count(t.sid) AS BIGINT) AS n_concurrent
      |FROM sess s LEFT JOIN sess t
      |  ON s.user_id <> t.user_id AND s.st <= t.en AND t.st <= s.en
      |GROUP BY s.sid""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q197_multitouch_attribution" -> (q197MultiTouchAttribution _, q197Sql),
    "q198_frequent_items" -> (q198FrequentItems _, q198Sql),
    "q199_label_propagation" -> (q199LabelPropagation _, q199Sql),
    "q200_weighted_sample" -> (q200WeightedSample _, q200Sql),
    "q201_kcore_peeling" -> (q201KCorePeeling _, q201Sql),
    "q203_random_projection" -> (q203RandomProjection _, q203Sql),
    "q204_approx_top_k" -> (q204ApproxTopK _, q204Sql),
    "q205_product_quantization" -> (q205ProductQuantization _, q205Sql),
    "q206_interval_overlap_join" -> (q206IntervalOverlapJoin _, q206Sql),
  )
}
