package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.ext.TextAnalysis

/** The SQL entry path (SURVEY.md §3 E4: parse -> analyze -> optimize ->
  * execute inside the engine) plus generator/pivot operators:
  * spark.sql over registered views with scalar + correlated subqueries
  * (Catalyst decorrelates), explode (the UDTF surface §2.10), and pivot.
  */
object SqlSurface {

  private def registerViews(s: SparkSession, d: String): Unit =
    Seq("customer", "orders", "lineitem", "documents").foreach { t =>
      Tables.load(s, d, t).createOrReplaceTempView(t)
    }

  // ---------------------------------------------------------------- q40
  /** Scalar + correlated subqueries through spark.sql: customers whose
    * average order price beats the global average (Catalyst rewrites
    * the correlated aggregate into joins).
    */
  private val q40Text =
    """SELECT c.c_custkey, c.c_name,
      |  CAST(round(sum(CAST(o.o_totalprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS total_spent,
      |  count(*) AS n_orders
      |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY c.c_custkey, c.c_name
      |HAVING CAST(sum(CAST(o.o_totalprice AS DECIMAL(18,3))) AS DOUBLE) / count(*) >
      |  (SELECT CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) AS DOUBLE) / count(*)
      |   FROM orders)
      |  AND EXISTS (SELECT 1 FROM lineitem l
      |              JOIN orders o2 ON l.l_orderkey = o2.o_orderkey
      |              WHERE o2.o_custkey = c.c_custkey AND l.l_quantity >= 49)""".stripMargin

  def q40Subqueries(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(q40Text)
  }

  val q40Sql: String = q40Text

  // ---------------------------------------------------------------- q41
  /** Generator/UDTF surface: explode each document into its shingles,
    * rank the 20 most common (deterministic tiebreak on the shingle).
    */
  def q41Explode(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(TextAnalysis.shingles(TextAnalysis.tokens(col("text")), 3))
        .as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("shingle").asc)
      .limit(20)

  val q41Sql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
       |  s AS (SELECT doc_id, ${TextAnalysis.Sql.shinglesOf("ts")} AS sh FROM t)
       |SELECT shingle, count(*) AS n
       |FROM (SELECT unnest(sh) AS shingle FROM s)
       |GROUP BY shingle ORDER BY n DESC, shingle LIMIT 20""".stripMargin

  // ---------------------------------------------------------------- q42
  /** Pivot: language x fixed source columns (explicit value list keeps
    * the output schema deterministic; oracle mirrors with CASE sums).
    */
  private val PivotSources = Seq("src0", "src1", "src2", "src3")

  def q42Pivot(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .groupBy(col("lang"))
      .pivot("source", PivotSources)
      .agg(count(lit(1)))
      .na.fill(0L, PivotSources)

  val q42Sql: String = {
    val cols = PivotSources.map(src =>
      s"CAST(sum(CASE WHEN source = '$src' THEN 1 ELSE 0 END) AS BIGINT) AS $src")
    s"SELECT lang, ${cols.mkString(", ")} FROM documents GROUP BY lang"
  }

  // ---------------------------------------------------------------- q54
  /** Correlated LATERAL subquery: top-2 orders per nation's customers —
    * the "per-row dependent subplan" shape. Catalyst decorrelates the
    * lateral into a ranked window join; no per-row re-execution.
    * Deterministic: (o_totalprice DESC, o_orderkey) total order.
    */
  private val q54Text =
    """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      |FROM customer c,
      |LATERAL (SELECT o_orderkey, o_totalprice
      |         FROM orders o WHERE o.o_custkey = c.c_custkey
      |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c.c_custkey <= 200""".stripMargin

  def q54Lateral(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(q54Text)
  }

  // ---------------------------------------------------------------- q56
  /** RANGE window frames (value- and interval-based, tie-inclusive —
    * deterministic under ties, unlike ROWS): per-customer rolling sum
    * of order value within 10k below current, and rolling 90-day order
    * count by date.
    */
  private val q56Text =
    """SELECT o_orderkey, o_custkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,3))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_totalprice
      |    RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS near_sum,
      |  CAST(count(*) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL '90' DAY PRECEDING AND CURRENT ROW) AS BIGINT) AS n_90d
      |FROM orders""".stripMargin

  def q56RangeFrames(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(q56Text)
  }

  // ---------------------------------------------------------------- q79
  /** Recursive CTE (new SQL surface in Spark 4): ancestor walk up the
    * implicit binary tree parent(u) = u div 2 over the distinct event
    * users — per user, the depth to root and ancestor count. Both
    * engines run the same UNION ALL recursion; only the integer-div
    * operator differs (Spark `div`, DuckDB `//`).
    */
  def q79RecursiveCte(s: SparkSession, d: String): DataFrame = {
    graft.core.Tables.events(s, d).select(col("user_id")).distinct()
      .createOrReplaceTempView("rc_users")
    s.sql(
      """WITH RECURSIVE anc AS (
        |  SELECT user_id, user_id AS anc_id, CAST(0 AS BIGINT) AS depth
        |  FROM rc_users
        |  UNION ALL
        |  SELECT user_id, anc_id div 2 AS anc_id, depth + 1 AS depth
        |  FROM anc WHERE anc_id > 0)
        |SELECT user_id, max(depth) AS depth_to_root,
        |  CAST(count(*) AS BIGINT) AS n_nodes
        |FROM anc GROUP BY user_id""".stripMargin)
  }

  val q79Sql: String =
    """WITH RECURSIVE u AS (SELECT DISTINCT user_id FROM events),
      |  anc AS (
      |    SELECT user_id, user_id AS anc_id, CAST(0 AS BIGINT) AS depth FROM u
      |    UNION ALL
      |    SELECT user_id, anc_id // 2 AS anc_id, depth + 1 AS depth
      |    FROM anc WHERE anc_id > 0)
      |SELECT user_id, max(depth) AS depth_to_root,
      |  CAST(count(*) AS BIGINT) AS n_nodes
      |FROM anc GROUP BY user_id""".stripMargin

  // ---------------------------------------------------------------- q80
  /** VARIANT (Spark 4's semi-structured type): parse once, then typed
    * `variant_get` extraction — the engine keeps a binary-encoded
    * value instead of re-parsing JSON text per access, the
    * semi-structured answer at scale. `try_variant_get` on a missing
    * path degrades to NULL (matched by the oracle's literal).
    */
  def q80Variant(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(
      col("event_id"),
      expr("variant_get(parse_json(props), '$.k', 'int')").as("k_int"),
      expr("try_variant_get(parse_json(props), '$.missing', 'int')").as("missing_int"),
      expr("variant_get(parse_json(props), '$.k', 'double')").as("k_dbl"))

  val q80Sql: String =
    """SELECT event_id,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k_int,
      |  CAST(NULL AS INT) AS missing_int,
      |  CAST(json_extract_string(props, '$.k') AS DOUBLE) AS k_dbl
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q94
  /** NOT IN with three-valued-logic semantics — the null-aware anti
    * join, a DIFFERENT operator from q06's null-naive `left_anti`:
    * a single NULL in the subquery annihilates every NOT IN match.
    * Both behaviors gated in one query: the null-free branch returns
    * real survivors (count + id checksum); the with-null branch's
    * subquery runs over ALL orders, NULLing exactly the max-price
    * key — the max always exists, so the subquery carries >= 1 NULL
    * at ANY scale factor and the branch must return zero. Spark plans
    * the broadcast null-aware anti join for the single-column case.
    */
  private val q94Text =
    """SELECT 'no_nulls' AS variant, CAST(count(*) AS BIGINT) AS n,
      |  CAST(coalesce(sum(c_custkey), 0) AS BIGINT) AS id_sum
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT o_custkey FROM orders WHERE o_totalprice > 300000)
      |UNION ALL
      |SELECT 'with_null', CAST(count(*) AS BIGINT),
      |  CAST(coalesce(sum(c_custkey), 0) AS BIGINT)
      |FROM customer
      |WHERE c_custkey NOT IN
      |  (SELECT CASE WHEN o_totalprice = (SELECT max(o_totalprice) FROM orders)
      |               THEN NULL ELSE o_custkey END
      |   FROM orders)""".stripMargin

  def q94NotInNullAware(s: SparkSession, d: String): DataFrame = {
    registerViews(s, d)
    s.sql(q94Text)
  }

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q94_not_in_null_aware" -> (q94NotInNullAware _, q94Text),
    "q79_recursive_cte" -> (q79RecursiveCte _, q79Sql),
    "q80_variant" -> (q80Variant _, q80Sql),
    "q40_subqueries" -> (q40Subqueries _, q40Sql),
    "q41_explode" -> (q41Explode _, q41Sql),
    "q42_pivot" -> (q42Pivot _, q42Sql),
    "q54_lateral" -> (q54Lateral _, q54Text),
    "q56_range_frames" -> (q56RangeFrames _,
      q56Text.replace("INTERVAL '90' DAY", "INTERVAL 90 DAY")),
  )
}
