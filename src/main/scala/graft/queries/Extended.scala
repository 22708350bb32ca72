package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables
import graft.functions.VectorFunctions
import graft.ops.Cdc

/** Second-wave operator coverage: P4 timestamp normalization, CUBE
  * grouping sets, as-of join, IVF-flat ANN.
  */
object Extended {

  // ---------------------------------------------------------------- q34
  /** P4 timestamp normalize (load_data.py:35-37): event-time to the
    * reference's 'yyyy-MM-dd HH:mm:ss' string plus a proper epoch
    * column kept alongside (SURVEY.md §7 trap 5).
    */
  def q34TsNormalize(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("ts_str"),
      (unix_millis(col("ts")) - pmod(unix_millis(col("ts")), lit(1000L))).as("ts_sec_ms"))

  val q34Sql: String =
    """SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts_str,
      |  epoch_ms(ts) - epoch_ms(ts) % 1000 AS ts_sec_ms
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q35
  /** CUBE over region x market segment (all four grouping sets). */
  def q35Cube(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val n = Tables.nation(s, d).select("n_nationkey", "n_regionkey")
    val r = Tables.region(s, d).select("r_regionkey", "r_name")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .cube(col("r_name"), col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
           round(sum(col("c_acctbal").cast(DecimalType(18, 2))), 2)
             .cast("double").as("total_acctbal"))
  }

  val q35Sql: String =
    """SELECT r_name, c_mktsegment, count(*) AS n_customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, c_mktsegment)""".stripMargin

  // ---------------------------------------------------------------- q36
  /** As-of join: for each event, the customer's latest order with
    * o_orderdate <= a per-event deadline. Implemented as equi-join on
    * the key + version predicate, then the latestByKey arg-max — the
    * scale shape for as-of (shuffle by key only, matches stay
    * per-key; no range cross-product). Left join preserves events
    * with no match.
    */
  def q36AsofJoin(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      date_add(lit("1995-01-01").cast("date"),
        pmod(col("event_id"), lit(2400)).cast("int")).as("deadline"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    val matched = e.join(o,
        col("user_id") === col("o_custkey") &&
          col("o_orderdate") <= col("deadline").cast("timestamp"))
    val best = Cdc.latestByKey(
        matched.select(col("event_id").as("m_event_id"), col("o_orderkey"), col("o_orderdate")),
        Seq("m_event_id"), Seq("o_orderdate", "o_orderkey"))
      .select(col("m_event_id"), col("o_orderkey").as("asof_orderkey"))
    e.join(best, col("event_id") === col("m_event_id"), "left")
      .select(col("event_id"), col("user_id"), col("asof_orderkey"))
  }

  val q36Sql: String =
    """WITH e AS (SELECT event_id, user_id,
      |    DATE '1995-01-01' + INTERVAL 1 DAY * (event_id % 2400) AS deadline
      |  FROM events),
      |  best AS (SELECT event_id AS m_event_id, o_orderkey AS asof_orderkey FROM
      |    (SELECT e.event_id, o.o_orderkey,
      |       row_number() OVER (PARTITION BY e.event_id
      |         ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
      |     FROM e JOIN orders o ON e.user_id = o.o_custkey
      |       AND o.o_orderdate <= CAST(e.deadline AS TIMESTAMP))
      |    WHERE rn = 1)
      |SELECT event_id, user_id, asof_orderkey
      |FROM e LEFT JOIN best ON event_id = m_event_id""".stripMargin

  // ---------------------------------------------------------------- q60
  /** Same as-of semantics as q36, through the custom whole-operator
    * path (graft.plans.AsOfJoin: custom LogicalPlan + Strategy +
    * merge-join SparkPlan). One merge pass after co-partitioning —
    * never materializes the per-event candidate set the composed q36
    * form builds. Shares q36's oracle.
    */
  def q60AsofNative(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      date_add(lit("1995-01-01").cast("date"),
        pmod(col("event_id"), lit(2400)).cast("int")).cast("timestamp").as("deadline"))
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"))
    graft.plans.AsOf.join(e, o,
        Seq("user_id"), Seq("o_custkey"), "deadline", "o_orderdate",
        rightTiebreaks = Seq("o_orderkey"))
      .select(col("event_id"), col("user_id"), col("o_orderkey").as("asof_orderkey"))
  }

  // ---------------------------------------------------------------- q37
  /** IVF-flat ANN: coarse cells = 16 data-derived centroids (stride-25
    * vec_ids — deterministic, self-contained in both engines); every
    * vector is assigned to its argmax-cosine cell once (the inverted
    * list build — one linear pass at any scale); each query probes its
    * 4 nearest cells and ranks candidates there. Approximate by
    * design, same ranking discipline as q30/q31.
    */
  /** Inverted-list build: every corpus vector to its argmax-cosine cell
    * via an AGGREGATE (partial-aggregates map-side, shuffles ~N rows) —
    * NOT a `row_number` window, which would shuffle + sort all
    * N x nCents scored rows; at 100 TB that is a 16x shuffle-volume
    * difference for nCents = 16. `max_by(struct)` would also work but
    * its struct buffer falls back to SortAggregate (per-partition sort
    * of the scored rows); packing (cos6, centIdx) into ONE long keeps
    * the whole argmax a primitive `max()` inside HashAggregate — no
    * sort anywhere. Tie-break: higher (nCents-1-idx) = lower cent_id,
    * matching the oracle's (cos DESC, cent_id ASC). `cents` must carry
    * (cent_idx in [0, nCents), cent_id, cent); the idx -> id decode is
    * a broadcast join against the (tiny) centroid table.
    */
  def ivfAssignCells(emb: DataFrame, cents: DataFrame, nCents: Int): DataFrame = {
    val m = lit(nCents.toLong)
    // double-round: round(,6) matches the oracle's ranking scale exactly,
    // round(,0) snaps the *1e6 rescale onto the integer it is within 1
    // ulp of
    val cos6i = round(round(VectorFunctions.cosineSim(col("ce"), col("cent")), 6) * 1e6, 0)
      .cast("long")
    val assigned = emb.crossJoin(broadcast(cents))
      .withColumn("packed", cos6i * m + (m - lit(1L) - col("cent_idx")))
      .groupBy(col("cid"), col("ce")) // ce is functionally dependent on cid
      .agg(max(col("packed")).as("p"))
      .withColumn("cent_idx", m - lit(1L) - pmod(col("p"), m))
    assigned.join(broadcast(cents.select(col("cent_idx"), col("cent_id"))), Seq("cent_idx"))
      .select(col("cid"), col("ce"), col("cent_id"))
  }

  def q37IvfAnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val cents = emb.filter(col("vec_id") % 25 === 0 && col("vec_id") < 400)
      .select(expr("vec_id div 25").as("cent_idx"),
              col("vec_id").as("cent_id"), col("embedding").as("cent"))
    // probe-side keep=4 stays a window: it runs over |queries| x nCents
    // rows (bounded by the query set, not the corpus)
    def assign(df: DataFrame, idCol: String, embCol: String, keep: Int) = {
      val w = Window.partitionBy(col(idCol))
        .orderBy(col("cent_cos").desc, col("cent_id").asc)
      df.crossJoin(broadcast(cents))
        .withColumn("cent_cos", round(VectorFunctions.cosineSim(col(embCol), col("cent")), 6))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= keep)
        .drop("cent", "cent_cos", "crank", "cent_idx")
    }
    val cells = ivfAssignCells(
      emb.select(col("vec_id").as("cid"), col("embedding").as("ce")), cents, nCents = 16)
    val probes = assign(
      emb.filter(col("vec_id") < 20).select(col("vec_id").as("qid"), col("embedding").as("qe")),
      "qid", "qe", keep = 4)
    val w = Window.partitionBy(col("qid")).orderBy(col("cos6").desc, col("cid").asc)
    probes.join(cells, Seq("cent_id")).filter(col("cid") =!= col("qid"))
      .withColumn("cos6", round(VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("qid"), col("rank"), col("cid"), col("cos6"))
  }

  val q37Sql: String = {
    val cosEC = VectorFunctions.cosineSqlDuck("e", "cent")
    val cosQC = VectorFunctions.cosineSqlDuck("qe", "ce")
    s"""WITH cents AS (SELECT vec_id AS cent_id, embedding AS cent FROM embeddings
       |    WHERE vec_id % 25 = 0 AND vec_id < 400),
       |  cells AS (SELECT cid, ce, cent_id FROM
       |    (SELECT v.vec_id AS cid, v.embedding AS ce, c.cent_id,
       |       row_number() OVER (PARTITION BY v.vec_id
       |         ORDER BY round($cosEC, 6) DESC, c.cent_id) AS crank
       |     FROM (SELECT vec_id, embedding, embedding AS e FROM embeddings) v, cents c)
       |    WHERE crank = 1),
       |  probes AS (SELECT qid, qe, cent_id FROM
       |    (SELECT v.vec_id AS qid, v.embedding AS qe, c.cent_id,
       |       row_number() OVER (PARTITION BY v.vec_id
       |         ORDER BY round($cosEC, 6) DESC, c.cent_id) AS crank
       |     FROM (SELECT vec_id, embedding, embedding AS e FROM embeddings
       |           WHERE vec_id < 20) v, cents c)
       |    WHERE crank <= 4),
       |  sc AS (SELECT qid, cid, round($cosQC, 6) AS cos6
       |         FROM probes JOIN cells USING (cent_id) WHERE cid <> qid)
       |SELECT qid, rank, cid, cos6 FROM
       |  (SELECT qid, cid, cos6, row_number() OVER
       |     (PARTITION BY qid ORDER BY cos6 DESC, cid) AS rank FROM sc)
       |WHERE rank <= 3""".stripMargin
  }

  // ---------------------------------------------------------------- q38
  /** Full outer join: per-nation customer/supplier presence, nulls on
    * either unmatched side.
    */
  def q38FullOuter(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(s, d).groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("c_nationkey") === col("s_nationkey"), "full_outer")
      .select(coalesce(col("c_nationkey"), col("s_nationkey")).as("nationkey"),
              coalesce(col("n_cust"), lit(0L)).as("n_cust"),
              coalesce(col("n_supp"), lit(0L)).as("n_supp"))
  }

  val q38Sql: String =
    """SELECT coalesce(c.k, s.k) AS nationkey,
      |  coalesce(c.n_cust, 0) AS n_cust, coalesce(s.n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS k, count(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS k, count(*) AS n_supp FROM supplier GROUP BY 1) s
      |ON c.k = s.k""".stripMargin

  // ---------------------------------------------------------------- q75
  /** IVF ANN with TRAINED centroids: the full production shape —
    * k-means (Lloyd's, 2 rounds, fixed-point integer-moment means)
    * trains 8 centroids on a 400-vector sample, the corpus is
    * inverted-listed under the trained cells (aggregate argmax, no
    * window), queries probe their best 2 cells. HASH-CHECKED end to
    * end: the fixed-point means are exact BIGINT sums, so the oracle
    * replays the entire training loop in SQL and lands on
    * bit-identical centroids — a float k-means could never be
    * oracle-gated this way.
    */
  def q75IvfTrained(s: SparkSession, d: String): DataFrame = {
    import graft.ext.Similarity
    val emb = Tables.embeddings(s, d)
    val cents = Similarity.kmeansCentroids(
      emb.filter(col("vec_id") < 400), "vec_id", "embedding", k = 8, iters = 2)
    val cells = Similarity.assignCells(
        emb.select(col("vec_id").as("__id"), col("embedding").as("__v")), cents, 8)
      .select(col("__id").as("cid"), col("__v").as("ce"), col("cent_idx"))
    val wProbe = Window.partitionBy(col("qid"))
      .orderBy(col("cent_cos").desc, col("cent_idx").asc)
    val probes = emb.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      .crossJoin(broadcast(cents))
      .withColumn("cent_cos", round(VectorFunctions.cosineSim(col("qe"), col("cent")), 6))
      .withColumn("crank", row_number().over(wProbe))
      .filter(col("crank") <= 2)
      .select(col("qid"), col("qe"), col("cent_idx"))
    val wRank = Window.partitionBy(col("qid"))
      .orderBy(col("cos6").desc, col("cid").asc)
    cells.join(probes, "cent_idx")
      .filter(col("cid") =!= col("qid"))
      .withColumn("cos6", round(VectorFunctions.cosineSim(col("qe"), col("ce")), 6))
      .withColumn("rank", row_number().over(wRank).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("cid"), col("cos6"))
  }

  /** The whole pipeline — training included — replayed in DuckDB SQL.
    * Generated: one assign+means+rebuild CTE triple per Lloyd round.
    * The packed-argmax decode uses ((x % k) + k) % k because DuckDB's
    * % keeps the dividend's sign while Spark's pmod is non-negative.
    */
  private def cosDuck(a: String, b: String) = VectorFunctions.cosineSqlDuck(a, b)

  /** Shared k-means-replay CTE generators (q75 IVF + q117 SemDeDup):
    * packed-argmax cell assignment and one Lloyd round (assign + fixed-
    * point means + rebuild). The packed-argmax decode uses
    * ((x % k) + k) % k because DuckDB's % keeps the dividend's sign
    * while Spark's pmod is non-negative.
    */
  private def packedAssignCte(from: String, cents: String, out: String, k: Int): String =
    s"""$out AS (
       |  SELECT t.vec_id, t.embedding,
       |    CAST($k - 1 - ((max(CAST(round(round(${cosDuck("t.embedding", "c.cent")}, 6) * 1e6) AS BIGINT) * $k
       |      + ($k - 1 - c.cent_idx))) % $k + $k) % $k AS INT) AS cent_idx
       |  FROM $from t CROSS JOIN $cents c
       |  GROUP BY t.vec_id, t.embedding)""".stripMargin

  private def lloydRoundCte(train: String, i: Int, k: Int): String = {
    val prev = s"c${i - 1}"
    s"""${packedAssignCte(train, prev, s"a$i", k)},
       |  m$i AS (
       |    SELECT cent_idx, pos,
       |      CAST(sum(xm) AS DOUBLE) / count(*) / 1e6 AS mval
       |    FROM (SELECT cent_idx, i AS pos,
       |            CAST(round(embedding[CAST(i AS INT)] * 1e6) AS BIGINT) AS xm
       |          FROM (SELECT cent_idx, embedding,
       |                  unnest(range(1, len(embedding) + 1)) AS i FROM a$i))
       |    GROUP BY cent_idx, pos),
       |  c$i AS (
       |    SELECT p.cent_idx, coalesce(n.cent, p.cent) AS cent
       |    FROM $prev p LEFT JOIN
       |      (SELECT cent_idx, list(CAST(mval AS FLOAT) ORDER BY pos) AS cent
       |       FROM m$i GROUP BY cent_idx) n
       |    ON p.cent_idx = n.cent_idx)""".stripMargin
  }

  /** c0 init (first k by vec_id) + `iters` Lloyd rounds over `train`. */
  private def kmeansReplayCtes(train: String, k: Int, iters: Int): String =
    s"""c0 AS (SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cent_idx,
       |           embedding AS cent
       |         FROM (SELECT * FROM $train ORDER BY vec_id LIMIT $k)),
       |  ${(1 to iters).map(lloydRoundCte(train, _, k)).mkString(",\n  ")}""".stripMargin

  /** The whole q75 pipeline — training included — replayed in DuckDB SQL. */
  val q75Sql: String = {
    val k = 8
    def cos(a: String, b: String) = cosDuck(a, b)
    s"""WITH train AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 400),
       |  ${kmeansReplayCtes("train", k, 2)},
       |  ${packedAssignCte("embeddings", "c2", "cells", k)},
       |  probes AS (
       |    SELECT qid, qe, cent_idx FROM (
       |      SELECT q.vec_id AS qid, q.embedding AS qe, c.cent_idx,
       |        row_number() OVER (PARTITION BY q.vec_id
       |          ORDER BY round(${cos("q.embedding", "c.cent")}, 6) DESC, c.cent_idx ASC) AS crank
       |      FROM embeddings q CROSS JOIN c2 c WHERE q.vec_id < 20)
       |    WHERE crank <= 2)
       |SELECT qid, rank, cid, cos6 FROM (
       |  SELECT p.qid,
       |    row_number() OVER (PARTITION BY p.qid ORDER BY
       |      round(${cos("p.qe", "s.embedding")}, 6) DESC, s.vec_id ASC) AS rank,
       |    s.vec_id AS cid,
       |    round(${cos("p.qe", "s.embedding")}, 6) AS cos6
       |  FROM cells s JOIN probes p ON s.cent_idx = p.cent_idx
       |  WHERE s.vec_id <> p.qid)
       |WHERE rank <= 5""".stripMargin
  }

  // ---------------------------------------------------------------- q117
  /** SemDeDup-style SEMANTIC deduplication: cluster the corpus with the
    * q75 fixed-point k-means, then enumerate near-duplicate pairs ONLY
    * within each cluster (equi-join on the trained cell id) and drop
    * every vector that has a lower-id in-cell neighbor at cosine >=
    * 0.9, keeping the lowest such id as the survivor. Cross-cluster
    * duplicates are missed BY DESIGN — that is SemDeDup's documented
    * trade: pair work is bounded per cell instead of O(n^2) corpus-
    * wide. The corpus is q32's planted near-dup corpus, so the gate is
    * fully deterministic end to end (training replayed in SQL, float32
    * jitter bit-identical).
    *
    * Scale note: k=8 keeps the oracle tractable; at production scale k
    * grows with the corpus (k ~ n / target-cell-size), so the per-cell
    * self-join stays bounded and the 8-key skew visible here
    * disappears.
    */
  def q117SemanticDedup(s: SparkSession, d: String): DataFrame = {
    import graft.ext.Similarity
    val corpus = Similarity.plantedNearDupCorpus(Tables.embeddings(s, d), idCap = 500L)
    val cents = Similarity.kmeansCentroids(corpus, "vec_id", "embedding", k = 8, iters = 2)
    val cells = Similarity.assignCells(
        corpus.select(col("vec_id").as("__id"), col("embedding").as("__v")), cents, 8)
      .select(col("__id").as("cid"), col("__v").as("ce"), col("cent_idx"))
    val a = cells.select(col("cid").as("id_a"), col("ce").as("ea"), col("cent_idx"))
    val b = cells.select(col("cid").as("id_b"), col("ce").as("eb"), col("cent_idx"))
    a.join(b, "cent_idx")
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos6", round(VectorFunctions.cosineSim(col("ea"), col("eb")), 6))
      .filter(col("cos6") >= 0.9)
      .groupBy(col("id_b"))
      .agg(min(struct(col("id_a"), col("cent_idx"), col("cos6"))).as("kp"))
      .select(col("id_b").as("vec_id"), col("kp.id_a").as("keeper"),
              col("kp.cent_idx").as("cell"), col("kp.cos6").as("cos6"))
  }

  val q117Sql: String = {
    val k = 8
    s"""WITH ${graft.ext.Similarity.plantedCorpusSqlCtes(500L)},
       |  ${kmeansReplayCtes("corpus", k, 2)},
       |  ${packedAssignCte("corpus", "c2", "cells", k)},
       |  p AS (
       |    SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cent_idx AS cell,
       |      round(${cosDuck("a.embedding", "b.embedding")}, 6) AS cos6
       |    FROM cells a JOIN cells b
       |      ON a.cent_idx = b.cent_idx AND a.vec_id < b.vec_id
       |    WHERE round(${cosDuck("a.embedding", "b.embedding")}, 6) >= 0.9)
       |SELECT id_b AS vec_id, id_a AS keeper, cell, cos6 FROM (
       |  SELECT *, row_number() OVER (PARTITION BY id_b ORDER BY id_a ASC) AS rn FROM p)
       |WHERE rn = 1""".stripMargin
  }

  // ---------------------------------------------------------------- q39
  /** Approximate distinct (HLL++): per event type. The sketch estimate
    * itself is engine-specific, so the HASH-CHECKED output is the
    * deterministic witness pair: the exact count plus a boolean
    * asserting the HLL estimate landed within 5% of it (rsd = 0.02, so
    * the bound has 2.5 sigma of slack). DuckDB emits TRUE for the
    * witness; a drifting sketch flips the boolean and fails the gate.
    */
  def q39ApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
           countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users"))
           <= col("exact_users").cast("double") * 0.05).as("approx_ok"))

  val q39Sql: String =
    """SELECT event_type, count(DISTINCT user_id) AS exact_users,
      |  TRUE AS approx_ok
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q88
  /** PageRank authority scores (fixed-point longs) over the
    * supplier -> customer fulfillment graph (edges from lineitem x
    * orders; customer ids offset so the two key spaces don't collide).
    * 4 power-iteration rounds; see [[graft.ext.Graph.pageRank]] for the
    * integer-arithmetic discipline. The oracle replays every round as
    * a chained CTE — bit-identical because all updates are integer
    * multiply/div/sum.
    */
  def q88PageRank(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val edges = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .select(col("l_suppkey").cast("long").as("src"),
              (col("o_custkey").cast("long") + 100000L).as("dst"))
    graft.ext.Graph.pageRank(edges, iters = 4)
  }

  val q88Sql: String = {
    def round(k: Int): String =
      s"""r$k AS (SELECT n.node, CAST(150000 + (85 * coalesce(s.s, 0)) // 100 AS BIGINT) AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.dst AS node, sum(p.r // o.outdeg) AS s
         |    FROM e JOIN outd o ON e.src = o.src JOIN r${k - 1} p ON p.node = e.src
         |    GROUP BY e.dst) s ON n.node = s.node)""".stripMargin
    s"""WITH e AS (SELECT CAST(l_suppkey AS BIGINT) AS src,
       |    CAST(o_custkey AS BIGINT) + 100000 AS dst
       |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
       |  outd AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |  nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e),
       |  r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM nodes),
       |  ${(1 to 4).map(round).mkString(",\n")}
       |SELECT node, r FROM r4""".stripMargin
  }

  // ---------------------------------------------------------------- q143
  /** TRIANGLE COUNTS over the co-purchase graph (parts sharing an
    * order) — the graph-cohesion primitive next to q88 (PageRank) and
    * q71 (connected components). The implementation is compact-forward
    * with DEGREE ORDERING ([[graft.ext.Graph.triangleCounts]]): edges
    * orient from the lower-(degree, id) endpoint, capping a hub part's
    * wedge fan-out at O(sqrt(|E|)) — the skew guard a 100 TB
    * co-occurrence graph needs, since "appears in every order" parts
    * are exactly the hubs that blow up id-only orientation. The count
    * is orientation-independent, so the oracle checks it with the
    * simple id-ordered triple join.
    */
  def q143Triangles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    val l1 = li.select(col("l_orderkey"), col("l_partkey").as("a"))
    val l2 = li.select(col("l_orderkey"), col("l_partkey").as("b"))
    val edges = l1.join(l2, "l_orderkey").filter(col("a") < col("b"))
      .select(col("a").cast("long").as("a"), col("b").cast("long").as("b"))
    graft.ext.Graph.triangleCounts(edges)
      .select(col("node").as("part"), col("n_triangles"))
  }

  val q143Sql: String =
    """WITH e AS (SELECT DISTINCT a.l_partkey AS x, b.l_partkey AS y
      |           FROM lineitem a JOIN lineitem b
      |             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |t AS (SELECT e1.x AS p, e1.y AS q, e2.y AS r
      |      FROM e e1 JOIN e e2 ON e2.x = e1.y
      |      JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y)
      |SELECT CAST(node AS BIGINT) AS part, CAST(count(*) AS BIGINT) AS n_triangles
      |FROM (SELECT unnest([p, q, r]) AS node FROM t)
      |GROUP BY node""".stripMargin

  // ---------------------------------------------------------------- q89
  /** Symmetric int8 embedding quantization — the compression step
    * before shipping an ANN corpus (q = floor(x * 127 / max|x|)
    * clamped to [-127, 127] — the two-rounding chain can land one ulp
    * past an endpoint, e.g. floor(-127.0000…1) = -128, so the clamp is
    * part of the contract, identically on both engines). floor, not
    * round: floor of identical IEEE doubles is engine-identical,
    * round's half-tie behavior is not. Per-vector
    * witness: quantized checksum + extrema + the reconstruction-error
    * bound (|x - q*m/127| <= m/127 must hold for every dim — emitted
    * as a boolean the oracle answers TRUE).
    */
  def q89QuantizeInt8(s: SparkSession, d: String): DataFrame = {
    val m = array_max(transform(col("embedding"), x => abs(x.cast("double"))))
    Tables.embeddings(s, d)
      .withColumn("m", m)
      .withColumn("q", when(col("m") > 0,
          transform(col("embedding"),
            x => greatest(lit(-127L), least(lit(127L),
              floor(x.cast("double") * lit(127.0) / col("m")).cast("long")))))
        .otherwise(transform(col("embedding"), _ => lit(0L))))
      .select(
        col("vec_id"),
        size(col("embedding")).cast("long").as("n_dims"),
        aggregate(col("q"), lit(0L), _ + _).as("q_sum"),
        array_min(col("q")).as("q_min"),
        array_max(col("q")).as("q_max"),
        (array_max(zip_with(col("embedding"), col("q"),
            (x, qv) => abs(x.cast("double") - qv * col("m") / lit(127.0))))
          <= col("m") / lit(127.0) + lit(1e-12)).as("recon_ok"))
  }

  val q89Sql: String =
    """WITH b AS (SELECT vec_id, embedding,
      |    (SELECT max(abs(CAST(u AS DOUBLE))) FROM unnest(embedding) AS t(u)) AS m
      |  FROM embeddings),
      |  q AS (SELECT vec_id, m, len(embedding) AS n_dims,
      |    CASE WHEN m > 0
      |      THEN list_transform(embedding, u -> greatest(CAST(-127 AS BIGINT), least(CAST(127 AS BIGINT), CAST(floor(CAST(u AS DOUBLE) * 127.0 / m) AS BIGINT))))
      |      ELSE list_transform(embedding, u -> CAST(0 AS BIGINT)) END AS qs
      |  FROM b)
      |SELECT vec_id, CAST(n_dims AS BIGINT) AS n_dims,
      |  CAST(list_sum(qs) AS BIGINT) AS q_sum,
      |  list_min(qs) AS q_min, list_max(qs) AS q_max,
      |  TRUE AS recon_ok
      |FROM q""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q88_pagerank" -> (q88PageRank _, q88Sql),
    "q143_triangle_counts" -> (q143Triangles _, q143Sql),
    "q89_quantize_int8" -> (q89QuantizeInt8 _, q89Sql),
    "q34_ts_normalize" -> (q34TsNormalize _, q34Sql),
    "q35_cube" -> (q35Cube _, q35Sql),
    "q36_asof_join" -> (q36AsofJoin _, q36Sql),
    "q60_asof_native" -> (q60AsofNative _, q36Sql),
    "q37_ivf_ann" -> (q37IvfAnn _, q37Sql),
    "q38_full_outer" -> (q38FullOuter _, q38Sql),
    "q39_approx_distinct" -> (q39ApproxDistinct _, q39Sql),
    "q75_ivf_trained" -> (q75IvfTrained _, q75Sql),
    "q117_semantic_dedup" -> (q117SemanticDedup _, q117Sql),
  )
}
