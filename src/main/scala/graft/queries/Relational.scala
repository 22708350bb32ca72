package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Relational query surface: scans, filters, joins (broadcast / semi /
  * anti), aggregations, windows, top-k, set ops, rollup — each with an
  * ANSI-SQL oracle for the driver's DuckDB compare.
  *
  * Determinism discipline (this is what makes the hash-compare work):
  *  - money sums go through DECIMAL(18,4) so the result is exact and
  *    independent of partition/accumulation order (double sums are not);
  *  - every aggregate is rounded and cast back to DOUBLE in BOTH engines
  *    so schemas line up;
  *  - window orderings always carry a unique tiebreak column;
  *  - raw nanosecond timestamps are never emitted (epoch_ms instead).
  */
object Relational {

  /** Source money/rate columns are exact <=2-decimal values (verified
    * against the data), o_totalprice <=3 — so casting the COLUMN to
    * DECIMAL is exact in both engines (the double sits ~1e-11 from the
    * true value, the cast boundary is 5e-3 away). All arithmetic then
    * happens in DECIMAL (exact, order-independent), and only the final
    * round(...,2) touches representation — where Spark (HALF_UP) and
    * DuckDB (half-away-from-zero) agree for positive values. Casting a
    * double PRODUCT to decimal instead would round at the 4th decimal
    * where the two engines disagree near ties.
    */
  private def dec2(c: Column): Column = c.cast(DecimalType(18, 2))
  private def dec3(c: Column): Column = c.cast(DecimalType(18, 3))
  private def money(c: Column): Column = round(sum(dec2(c)), 2).cast("double")
  private def avg4(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 4).cast("double")
  /** (1 - l_discount) / (1 + l_tax) as exact decimals. */
  private def oneMinus(c: Column): Column =
    lit(1).cast(DecimalType(3, 2)) - c.cast(DecimalType(4, 2))
  private def onePlus(c: Column): Column =
    lit(1).cast(DecimalType(3, 2)) + c.cast(DecimalType(4, 2))

  // ---------------------------------------------------------------- q01
  /** TPC-H Q1-style pricing summary: hash aggregate with map-side
    * partial combine; scan prunes to 7 columns + pushes the shipdate
    * filter to parquet.
    */
  def q01PricingSummary(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        money(col("l_quantity")).as("sum_qty"),
        money(col("l_extendedprice")).as("sum_base_price"),
        round(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount"))), 2)
          .cast("double").as("sum_disc_price"),
        round(sum(dec2(col("l_extendedprice")) * oneMinus(col("l_discount")) * onePlus(col("l_tax"))), 2)
          .cast("double").as("sum_charge"),
        avg4(col("l_quantity")).as("avg_qty"),
        avg4(col("l_extendedprice")).as("avg_price"),
        avg4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  val q01Sql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_disc_price,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2))) * (1.00 + CAST(l_tax AS DECIMAL(4,2)))), 2) AS DOUBLE) AS sum_charge,
      |  CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
      |  CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_price,
      |  CAST(round(CAST(sum(CAST(l_discount AS DECIMAL(18,2))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- q02
  /** TPC-H Q6-style selective filter: every predicate reaches the
    * parquet scan (PushedFilters), aggregate reduces to one row.
    */
  def q02SelectiveFilter(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
              col("l_shipdate") <  lit("1996-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(round(sum(dec2(col("l_extendedprice")) * col("l_discount").cast(DecimalType(4, 2))), 2)
             .cast("double").as("revenue"),
           count(lit(1)).as("n_rows"))

  val q02Sql: String =
    """SELECT
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(4,2))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  // ---------------------------------------------------------------- q03
  /** TPC-H Q5-style star join: lineitem (fact) joined to orders, then
    * broadcast dims customer/nation/region. Catalyst/AQE picks
    * broadcast-hash for every dim side; only the lineitem-orders join
    * shuffles — and that shuffle carries pre-projected narrow rows.
    */
  def q03JoinRevenue(s: SparkSession, d: String): DataFrame = {
    // Partial aggregation pushed BELOW the join: revenue/count per
    // orderkey first (decimal sums regroup exactly), so the fact-side
    // shuffle carries one row per order (~4:1 vs raw lineitems — the
    // ratio holds at any scale). Dims broadcast.
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"),
              (dec2(col("l_extendedprice")) * oneMinus(col("l_discount"))).as("rev"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("rev")).as("rev"), count(lit(1)).as("cnt"))
    val o  = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val c  = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val n  = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r  = Tables.region(s, d).select("r_regionkey", "r_name")
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(c), col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(round(sum(col("rev")), 2).cast("double").as("revenue"),
           sum(col("cnt")).as("n_items"))
  }

  val q03Sql: String =
    """SELECT r_name, n_name,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1.00 - CAST(l_discount AS DECIMAL(4,2)))), 2) AS DOUBLE) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN orders   ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name, n_name""".stripMargin

  // ---------------------------------------------------------------- q04
  /** Broadcast join fact->dim: part is tiny at every SF, so the join is
    * shuffle-free (BroadcastHashJoin) and the aggregate partial-combines.
    */
  def q04BroadcastDim(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_partkey", "l_extendedprice", "l_quantity")
    val p  = Tables.part(s, d).select("p_partkey", "p_brand")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(money(col("l_extendedprice")).as("brand_revenue"),
           avg4(col("l_quantity")).as("avg_qty"),
           count(lit(1)).as("n_items"))
  }

  val q04Sql: String =
    """SELECT p_brand,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS brand_revenue,
      |  CAST(round(CAST(sum(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / count(*), 4) AS DOUBLE) AS avg_qty,
      |  count(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand""".stripMargin

  // ---------------------------------------------------------------- q05
  /** Left-semi join (EXISTS): customers holding at least one big order.
    * Semi join ships only the key column of the probe side.
    */
  def q05SemiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val bigOrders = Tables.orders(s, d).filter(col("o_totalprice") > 150000.0)
      .select(col("o_custkey"))
    c.join(bigOrders, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
  }

  val q05Sql: String =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer c
      |WHERE EXISTS (SELECT 1 FROM orders o
      |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 150000.0)""".stripMargin

  // ---------------------------------------------------------------- q06
  /** Left-anti join (NOT EXISTS): customers with no orders at all. */
  def q06AntiJoin(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).select(col("o_custkey"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"),
              round(dec2(col("c_acctbal")), 2).cast("double").as("acctbal"))
  }

  val q06Sql: String =
    """SELECT c_custkey, c_name,
      |  CAST(round(CAST(c_acctbal AS DECIMAL(18,4)), 2) AS DOUBLE) AS acctbal
      |FROM customer c
      |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin

  // ---------------------------------------------------------------- q07
  /** Window top-k per group: top-3 orders per customer. Unique
    * (o_totalprice DESC, o_orderkey) ordering keeps ranks deterministic.
    */
  def q07WindowTopK(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 3)
      .select(col("o_custkey"), col("rk"), col("o_orderkey"),
              round(dec3(col("o_totalprice")), 2).cast("double").as("totalprice"))
  }

  val q07Sql: String =
    """SELECT o_custkey, rk, o_orderkey,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS totalprice
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |      FROM orders)
      |WHERE rk <= 3""".stripMargin

  // ---------------------------------------------------------------- q08
  /** Running (cumulative) window sum per customer over order date.
    * DECIMAL inside the frame => result independent of the engine's
    * accumulation strategy (running vs segment-tree).
    */
  def q08WindowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("cum_spend", round(sum(dec3(col("o_totalprice"))).over(w), 2).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"), col("cum_spend"))
  }

  val q08Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,4)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS DOUBLE) AS cum_spend
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q09
  /** Global ordered top-k: Spark plans TakeOrderedAndProject (per-
    * partition heap + driver merge — no full sort, no full shuffle).
    */
  def q09TopKOrders(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
      .select(col("o_orderkey"), col("o_custkey"),
              round(dec3(col("o_totalprice")), 2).cast("double").as("totalprice"))

  val q09Sql: String =
    """SELECT o_orderkey, o_custkey,
      |  CAST(round(CAST(o_totalprice AS DECIMAL(18,4)), 2) AS DOUBLE) AS totalprice
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin

  // ---------------------------------------------------------------- q10
  /** Set operations: nation keys present among customers vs suppliers,
    * tagged union of INTERSECT / EXCEPT both ways.
    */
  def q10SetOps(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    val both     = cn.intersect(sn).withColumn("tag", lit("both"))
    val custOnly = cn.except(sn).withColumn("tag", lit("cust_only"))
    val suppOnly = sn.except(cn).withColumn("tag", lit("supp_only"))
    both.unionByName(custOnly).unionByName(suppOnly)
  }

  val q10Sql: String =
    """SELECT nationkey, 'both' AS tag FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'cust_only' AS tag FROM
      |  (SELECT DISTINCT c_nationkey AS nationkey FROM customer
      |   EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT nationkey, 'supp_only' AS tag FROM
      |  (SELECT DISTINCT s_nationkey AS nationkey FROM supplier
      |   EXCEPT SELECT DISTINCT c_nationkey FROM customer)""".stripMargin

  // ---------------------------------------------------------------- q11
  /** ROLLUP over region -> nation with broadcast dims; grouping-set
    * nulls surface as NULL in both engines.
    */
  def q11Rollup(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select("c_custkey", "c_nationkey", "c_acctbal")
    val n = Tables.nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
    val r = Tables.region(s, d).select("r_regionkey", "r_name")
    c.join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
           money(col("c_acctbal")).as("total_acctbal"))
  }

  val q11Sql: String =
    """SELECT r_name, n_name, count(*) AS n_customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)""".stripMargin

  // ---------------------------------------------------------------- q12
  /** Distinct aggregation: exact distinct counts per market segment
    * (Spark expands to a two-phase aggregate automatically).
    */
  def q12DistinctAgg(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .groupBy(col("c_mktsegment"))
      .agg(countDistinct(col("c_nationkey")).as("n_nations"),
           count(lit(1)).as("n_customers"),
           money(col("c_acctbal")).as("total_acctbal"))

  val q12Sql: String =
    """SELECT c_mktsegment,
      |  count(DISTINCT c_nationkey) AS n_nations,
      |  count(*) AS n_customers,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_acctbal
      |FROM customer GROUP BY c_mktsegment""".stripMargin

  // ---------------------------------------------------------------- q13
  /** JSON extraction from the events.props payload (semi-structured
    * column), aggregated per event type.
    */
  def q13JsonEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           sum(col("k")).as("sum_k"),
           money(col("value")).as("sum_value"))

  val q13Sql: String =
    """SELECT event_type, count(*) AS n_events,
      |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q14
  /** Tumbling-window (hourly) event-time aggregation — the batch twin
    * of the streaming windowed agg in graft.streaming.
    */
  def q14TimeWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour_ms", unix_millis(date_trunc("hour", col("ts"))))
      .groupBy(col("hour_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
           money(col("value")).as("sum_value"))

  val q14Sql: String =
    """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
      |  count(*) AS n_events,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_value
      |FROM events GROUP BY 1, 2""".stripMargin

  // ---------------------------------------------------------------- q15
  /** Sessionization via gap detection: a 30-minute silence starts a new
    * session (lag + conditional cumulative sum), then per-session stats.
    * The two windows share one (user_id, ts, event_id) sort.
    */
  def q15Sessionize(s: SparkSession, d: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    Tables.events(s, d)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
             unix_millis(col("ts")) - unix_millis(col("prev_ts")) > 30L * 60 * 1000, 1)
          .otherwise(0))
      .withColumn("session_seq", sum(col("new_sess")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"),
           min(unix_millis(col("ts"))).as("start_ms"),
           max(unix_millis(col("ts"))).as("end_ms"),
           money(col("value")).as("session_value"))
  }

  val q15Sql: String =
    """SELECT user_id, session_seq, count(*) AS n_events,
      |  min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,4))), 2) AS DOUBLE) AS session_value
      |FROM (
      |  SELECT user_id, ts, event_id, value,
      |    CAST(sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
      |  FROM (
      |    SELECT user_id, ts, event_id, value,
      |      CASE WHEN prev_ts IS NULL OR epoch_ms(ts) - epoch_ms(prev_ts) > 1800000
      |           THEN 1 ELSE 0 END AS new_sess
      |    FROM (SELECT user_id, ts, event_id, value,
      |            lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      |          FROM events)))
      |GROUP BY user_id, session_seq""".stripMargin

  /** name -> (query fn, oracle sql) */
  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q01_pricing_summary" -> (q01PricingSummary _, q01Sql),
    "q02_selective_filter" -> (q02SelectiveFilter _, q02Sql),
    "q03_join_revenue" -> (q03JoinRevenue _, q03Sql),
    "q04_broadcast_dim" -> (q04BroadcastDim _, q04Sql),
    "q05_semi_join" -> (q05SemiJoin _, q05Sql),
    "q06_anti_join" -> (q06AntiJoin _, q06Sql),
    "q07_window_topk" -> (q07WindowTopK _, q07Sql),
    "q08_window_running" -> (q08WindowRunning _, q08Sql),
    "q09_topk_orders" -> (q09TopKOrders _, q09Sql),
    "q10_set_ops" -> (q10SetOps _, q10Sql),
    "q11_rollup" -> (q11Rollup _, q11Sql),
    "q12_distinct_agg" -> (q12DistinctAgg _, q12Sql),
    "q13_json_events" -> (q13JsonEvents _, q13Sql),
    "q14_time_window" -> (q14TimeWindow _, q14Sql),
    "q15_sessionize" -> (q15Sessionize _, q15Sql),
  )
}
