package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.core.Tables

/** Function-surface breadth: exact percentiles, datetime scalar
  * functions, string functions, the long tail of window functions,
  * and a range (theta) join.
  */
object Breadth {

  // ---------------------------------------------------------------- q43
  /** Exact interpolated percentiles per event type (percentile_cont
    * semantics in both engines). Interpolation is pure IEEE arithmetic
    * over sorted exact 2-dec values.
    */
  def q43Percentiles(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, 0.5)").as("p50"),
           expr("percentile(value, 0.95)").as("p95"),
           min(col("value")).as("vmin"),
           max(col("value")).as("vmax"))

  val q43Sql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50,
      |  quantile_cont(value, 0.95) AS p95,
      |  min(value) AS vmin, max(value) AS vmax
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q44
  /** Datetime scalar functions over order dates. Spark dayofweek is
    * 1=Sunday; DuckDB dayofweek is 0=Sunday — normalized to 0-based.
    */
  def q44Datetime(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("dom"),
      (dayofweek(col("o_orderdate")) - 1).cast("long").as("dow0"),
      unix_millis(date_trunc("month", col("o_orderdate"))).as("month_start_ms"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).cast("long").as("days_since"))

  val q44Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS BIGINT) AS y,
      |  CAST(month(o_orderdate) AS BIGINT) AS m,
      |  CAST(day(o_orderdate) AS BIGINT) AS dom,
      |  CAST(dayofweek(o_orderdate) AS BIGINT) AS dow0,
      |  epoch_ms(date_trunc('month', o_orderdate)) AS month_start_ms,
      |  CAST(datediff('day', DATE '1995-01-01', o_orderdate) AS BIGINT) AS days_since
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q45
  /** String scalar functions + null handling over customer names. */
  def q45Strings(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      upper(col("c_name")).as("uname"),
      substring(col("c_name"), 10, 5).as("midpart"),
      lpad(col("c_custkey").cast("string"), 9, "0").as("padded"),
      regexp_replace(col("c_name"), "0+", "#").as("squeezed"),
      instr(col("c_name"), "Customer").cast("long").as("pos"),
      (col("c_name") like "%001%").as("has001"),
      coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("OTHER")).as("seg"))

  val q45Sql: String =
    """SELECT c_custkey,
      |  upper(c_name) AS uname,
      |  substr(c_name, 10, 5) AS midpart,
      |  lpad(CAST(c_custkey AS VARCHAR), 9, '0') AS padded,
      |  regexp_replace(c_name, '0+', '#', 'g') AS squeezed,
      |  CAST(strpos(c_name, 'Customer') AS BIGINT) AS pos,
      |  c_name LIKE '%001%' AS has001,
      |  coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q46
  /** Window-function long tail: lag/lead, dense_rank, ntile,
    * percent_rank, first/last over a deterministic per-customer order.
    */
  def q46WindowTail(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_orderkey"), 1).over(w).as("prev_order"),
      lead(col("o_orderkey"), 1).over(w).as("next_order"),
      dense_rank().over(w).cast("long").as("drank"),
      ntile(4).over(w).cast("long").as("quartile"),
      percent_rank().over(w).as("prank"),
      first(col("o_orderkey")).over(wf).as("first_order"),
      last(col("o_orderkey")).over(wf).as("last_order"))
  }

  val q46Sql: String =
    """SELECT o_custkey, o_orderkey,
      |  lag(o_orderkey) OVER w AS prev_order,
      |  lead(o_orderkey) OVER w AS next_order,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drank,
      |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
      |  percent_rank() OVER w AS prank,
      |  first_value(o_orderkey) OVER wf AS first_order,
      |  last_value(o_orderkey) OVER wf AS last_order
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
      |  wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin

  // ---------------------------------------------------------------- q47
  /** Range (theta) join: bucket events against a derived interval
    * table via value >= lo AND value < hi. Spark plans a broadcast
    * nested-loop; at scale the interval side stays tiny (broadcast) so
    * the probe is one pass over events.
    */
  def q47RangeJoin(s: SparkSession, d: String): DataFrame = {
    val buckets = s.range(0, 21).select(
      (col("id") * 10).cast("double").as("lo"),
      ((col("id") + 1) * 10).cast("double").as("hi"))
    Tables.events(s, d)
      .join(broadcast(buckets), col("value") >= col("lo") && col("value") < col("hi"))
      .groupBy(col("lo"), col("hi"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("sum_v"))
  }

  val q47Sql: String =
    """SELECT lo, hi, count(*) AS n,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_v
      |FROM events
      |JOIN (SELECT CAST(i * 10 AS DOUBLE) AS lo, CAST((i + 1) * 10 AS DOUBLE) AS hi
      |      FROM range(21) t(i)) b
      |  ON value >= lo AND value < hi
      |GROUP BY lo, hi""".stripMargin

  // ---------------------------------------------------------------- q48
  /** GROUPING SETS (the general form behind rollup q11 / cube q35)
    * with grouping() null-vs-aggregated markers. One shuffle: Spark
    * expands rows per set map-side, aggregates once.
    */
  def q48GroupingSets(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderstatus").as("status"),
              col("o_orderpriority").as("prio"),
              col("o_totalprice").cast(DecimalType(18, 3)).as("price"))
    o.groupingSets(
        Seq(Seq(col("status"), col("prio")), Seq(col("status")), Seq()),
        col("status"), col("prio"))
      .agg(grouping(col("status")).cast("long").as("g_status"),
           grouping(col("prio")).cast("long").as("g_prio"),
           count(lit(1)).as("n"),
           round(sum(col("price")), 2).cast("double").as("sum_price"))
  }

  val q48Sql: String =
    """SELECT o_orderstatus AS status, o_orderpriority AS prio,
      |  CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
      |  count(*) AS n,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,3))), 2) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())""".stripMargin

  // ---------------------------------------------------------------- q49
  /** Array higher-order functions over per-order quantity lists.
    * Quantities are exact 2-dec decimals -> cents (BIGINT) so every
    * fold is integer-exact cross-engine. transform/aggregate/zip_with
    * run inside codegen; the only shuffle is the collect_list groupBy.
    */
  def q49ArrayHof(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
              (col("l_quantity").cast(DecimalType(18, 2)) * 100).cast("long").as("qty_c"))
      .groupBy(col("l_orderkey"))
      .agg(expr("transform(sort_array(collect_list(struct(l_linenumber, qty_c))), x -> x.qty_c)").as("arr"))
      .select(
        col("l_orderkey"),
        size(col("arr")).cast("long").as("n"),
        expr("aggregate(arr, 0L, (a, x) -> a + x)").as("total_c"),
        array_max(col("arr")).as("max_c"),
        expr("array_position(arr, array_max(arr))").cast("long").as("pos_max"),
        expr("element_at(zip_with(arr, reverse(arr), (a, b) -> a + b), 1)").as("firstlast_c"),
        expr("aggregate(slice(arr, 1, 3), 0L, (a, x) -> a + x)").as("head3_c"),
        expr("size(filter(arr, x -> x >= 2500))").cast("long").as("n_big"))

  val q49Sql: String =
    """WITH a AS (
      |  SELECT l_orderkey,
      |    list(CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
      |         ORDER BY l_linenumber, l_quantity) AS arr
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(arr) AS BIGINT) AS n,
      |  CAST(list_sum(arr) AS BIGINT) AS total_c,
      |  list_max(arr) AS max_c,
      |  CAST(list_position(arr, list_max(arr)) AS BIGINT) AS pos_max,
      |  arr[1] + arr[-1] AS firstlast_c,
      |  CAST(list_sum(arr[1:3]) AS BIGINT) AS head3_c,
      |  CAST(len(list_filter(arr, x -> x >= 2500)) AS BIGINT) AS n_big
      |FROM a""".stripMargin

  // ---------------------------------------------------------------- q50
  /** Selective / ordered-argument aggregates: count_if, bool_and/or,
    * max_by/min_by (deterministic: argument column o_orderkey is
    * unique), filtered sum, distinct count. All hash-aggregate with
    * map-side partials.
    */
  def q50SelectiveAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("price_c", (col("o_totalprice").cast(DecimalType(18, 3)) * 1000).cast("long"))
      .groupBy(col("o_orderpriority"))
      .agg(expr("count_if(o_orderstatus = 'F')").as("n_f"),
           expr("bool_and(o_totalprice > 0)").as("all_pos"),
           expr("bool_or(o_totalprice > 400000)").as("any_high"),
           expr("max_by(o_custkey, o_orderkey)").as("cust_of_last"),
           expr("min_by(o_custkey, o_orderkey)").as("cust_of_first"),
           countDistinct(col("o_custkey")).as("n_cust"),
           sum(when(col("o_orderstatus") === "O", col("price_c"))).as("open_price_c"))

  val q50Sql: String =
    """SELECT o_orderpriority,
      |  CAST(count_if(o_orderstatus = 'F') AS BIGINT) AS n_f,
      |  bool_and(o_totalprice > 0) AS all_pos,
      |  bool_or(o_totalprice > 400000) AS any_high,
      |  max_by(o_custkey, o_orderkey) AS cust_of_last,
      |  min_by(o_custkey, o_orderkey) AS cust_of_first,
      |  count(DISTINCT o_custkey) AS n_cust,
      |  CAST(sum(CAST(CAST(o_totalprice AS DECIMAL(18,3)) * 1000 AS BIGINT))
      |       FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS open_price_c
      |FROM orders GROUP BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- q51
  /** Bitwise scalar + aggregate surface: xor/shift/bit_count scalars,
    * bit_and/bit_or/bit_xor aggregates, hex encoding.
    */
  def q51Bitwise(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_nationkey"),
              col("c_custkey"),
              col("c_custkey").bitwiseXOR(lit(255L)).as("xored"),
              shiftleft(col("c_custkey"), 3).as("shifted"),
              bit_count(col("c_custkey")).cast("long").as("bits"),
              hex(col("c_custkey")).as("hexkey"))
      .groupBy(col("c_nationkey"))
      .agg(expr("bit_and(c_custkey)").as("band"),
           expr("bit_or(c_custkey)").as("bor"),
           expr("bit_xor(xored)").as("bxor"),
           sum(col("shifted")).as("sum_shifted"),
           sum(col("bits")).as("sum_bits"),
           max(col("hexkey")).as("max_hex"))

  val q51Sql: String =
    """SELECT c_nationkey,
      |  bit_and(c_custkey) AS band,
      |  bit_or(c_custkey) AS bor,
      |  bit_xor(xor(c_custkey, 255)) AS bxor,
      |  CAST(sum(c_custkey * 8) AS BIGINT) AS sum_shifted,
      |  CAST(sum(bit_count(c_custkey)) AS BIGINT) AS sum_bits,
      |  max(to_hex(c_custkey)) AS max_hex
      |FROM customer GROUP BY c_nationkey""".stripMargin

  // ---------------------------------------------------------------- q55
  /** Unpivot (melt) — the inverse of q42's pivot: three lineitem
    * measures into (name, value) rows, then decimal-exact sums per
    * (returnflag, measure). Unpivot is a zero-shuffle projection
    * (each input row fans out map-side).
    */
  def q55Unpivot(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"),
              col("l_extendedprice"), col("l_discount"))
      .unpivot(Array(col("l_returnflag")),
               Array(col("l_quantity"), col("l_extendedprice"), col("l_discount")),
               "measure", "value")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(round(sum(col("value").cast(DecimalType(18, 2))), 2).cast("double").as("total"),
           count(lit(1)).as("n"))

  val q55Sql: String =
    """SELECT l_returnflag, name AS measure,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total,
      |  count(*) AS n
      |FROM (SELECT l_returnflag, l_quantity, l_extendedprice, l_discount FROM lineitem)
      |  UNPIVOT (value FOR name IN (l_quantity, l_extendedprice, l_discount))
      |GROUP BY l_returnflag, name""".stripMargin

  // ---------------------------------------------------------------- q57
  /** Map-type surface: per-customer order-status histogram built as a
    * map (map_from_entries), read back via explode + map_keys count.
    * Output is flat rows, so the oracle stays plain SQL while the
    * Spark side round-trips through MapType.
    */
  def q57MapFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("o_custkey"))
      .agg(map_from_entries(sort_array(collect_list(struct(col("o_orderstatus"), col("n")))))
        .as("hist"))
      .select(col("o_custkey"),
              size(map_keys(col("hist"))).cast("long").as("n_statuses"),
              explode(col("hist")).as(Seq("status", "n_orders")))

  val q57Sql: String =
    """SELECT o_custkey,
      |  CAST(count(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_statuses,
      |  o_orderstatus AS status, count(*) AS n_orders
      |FROM orders GROUP BY o_custkey, o_orderstatus""".stripMargin

  // ---------------------------------------------------------------- q58
  /** ANSI-safety surface (Spark 4 runs ANSI mode by default): try_divide
    * and try_cast yield NULL instead of failing the job — the posture a
    * 100 TB batch needs for dirty rows. Plus least/greatest.
    * Division is IEEE double (bit-identical cross-engine).
    *
    * try_cast failures throw-and-catch a JVM exception per failing row
    * — fine for dirty-minority data, pathological when every row fails
    * — so the demo input fails on ~1% of rows (the realistic shape).
    */
  def q58TrySafety(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      expr("try_divide(CAST(o_totalprice AS DOUBLE), CAST(o_custkey % 3 AS DOUBLE))")
        .as("ratio_or_null"),
      expr("""CAST(try_cast(CASE WHEN o_custkey % 100 = 0 THEN o_orderstatus
              ELSE CAST(o_custkey AS STRING) END AS INT) AS BIGINT)""").as("status_num"),
      expr("CAST(try_cast(substr(o_orderpriority, 1, 1) AS INT) AS BIGINT)").as("prio_num"),
      least(col("o_totalprice"), lit(100000.0)).as("capped"),
      greatest(col("o_totalprice"), lit(100000.0)).as("floored"))

  val q58Sql: String =
    """SELECT o_orderkey,
      |  CAST(o_totalprice AS DOUBLE) / NULLIF(CAST(o_custkey % 3 AS DOUBLE), 0.0) AS ratio_or_null,
      |  CAST(TRY_CAST(CASE WHEN o_custkey % 100 = 0 THEN o_orderstatus
      |       ELSE CAST(o_custkey AS VARCHAR) END AS INTEGER) AS BIGINT) AS status_num,
      |  CAST(TRY_CAST(substr(o_orderpriority, 1, 1) AS INTEGER) AS BIGINT) AS prio_num,
      |  least(o_totalprice, 100000.0) AS capped,
      |  greatest(o_totalprice, 100000.0) AS floored
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Gap-filling: forward- and backward-fill of "missing" measurements
    * (IGNORE NULLS window semantics) — the standard time-series repair
    * pass. 'click' events are treated as carrying no measurement;
    * their value is taken from the nearest real one per user. One
    * shuffle on user_id serves both directions.
    */
  def q59GapFill(s: SparkSession, d: String): DataFrame = {
    val measured = when(col("event_type") =!= "click", col("value"))
    val wf = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wb = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("event_id").asc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    Tables.events(s, d).select(
      col("event_id"), col("user_id"),
      last(measured, ignoreNulls = true).over(wf).as("ffill"),
      first(measured, ignoreNulls = true).over(wb).as("bfill"))
  }

  val q59Sql: String =
    """SELECT event_id, user_id,
      |  last_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ffill,
      |  first_value(CASE WHEN event_type <> 'click' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY ts, event_id
      |          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS bfill
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q61
  /** Regexp array extraction + generated sequences: all digit runs per
    * customer name, plus a sequence fold keyed off the row. Both
    * engines evaluate these per-row in one codegen'd projection.
    */
  def q61RegexpSeq(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      expr("CAST(size(regexp_extract_all(c_name, '([0-9]+)', 1)) AS BIGINT)").as("n_runs"),
      expr("try_cast(element_at(regexp_extract_all(c_name, '([0-9]+)', 1), 1) AS BIGINT)")
        .as("first_num"),
      expr("aggregate(sequence(1L, pmod(c_custkey, 5) + 1), 0L, (a, x) -> a + x)")
        .as("seq_sum"))

  val q61Sql: String =
    """SELECT c_custkey,
      |  CAST(len(regexp_extract_all(c_name, '[0-9]+')) AS BIGINT) AS n_runs,
      |  TRY_CAST(regexp_extract_all(c_name, '[0-9]+')[1] AS BIGINT) AS first_num,
      |  CAST(list_sum(generate_series(1, c_custkey % 5 + 1)) AS BIGINT) AS seq_sum
      |FROM customer""".stripMargin

  // ---------------------------------------------------------------- q62
  /** Multiset set-ops (ALL variants — q10 covers the distinct forms):
    * per-nation customer vs supplier cardinality overlap via
    * intersectAll/exceptAll, re-aggregated to counts.
    */
  def q62SetOpsAll(s: SparkSession, d: String): DataFrame = {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey"))
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey"))
    val common = cn.intersectAll(sn).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("common"))
    val extra = cn.exceptAll(sn).groupBy(col("nationkey"))
      .agg(count(lit(1)).as("n")).withColumn("tag", lit("cust_extra"))
    common.unionByName(extra)
  }

  val q62Sql: String =
    """SELECT nationkey, count(*) AS n, 'common' AS tag FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   INTERSECT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nationkey
      |UNION ALL
      |SELECT nationkey, count(*) AS n, 'cust_extra' AS tag FROM
      |  (SELECT c_nationkey AS nationkey FROM customer
      |   EXCEPT ALL SELECT s_nationkey FROM supplier)
      |GROUP BY nationkey""".stripMargin

  // ---------------------------------------------------------------- q63
  /** Month-granularity date arithmetic: add_months, last_day,
    * make_date, and an integer month index (months_between has
    * engine-specific fractional semantics — the integer form is
    * portable and what partitioning schemes actually use).
    */
  def q63MonthArith(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      ((year(col("o_orderdate")) * 12 + month(col("o_orderdate"))) -
        lit(1995 * 12 + 1)).cast("long").as("month_idx"),
      date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd").as("plus3m"),
      date_format(last_day(col("o_orderdate")), "yyyy-MM-dd").as("eom"),
      date_format(make_date(lit(1995), month(col("o_orderdate")), lit(1)), "yyyy-MM-dd")
        .as("anchor"))

  val q63Sql: String =
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) * 12 + month(o_orderdate) - 23941 AS BIGINT) AS month_idx,
      |  strftime(o_orderdate + to_months(3), '%Y-%m-%d') AS plus3m,
      |  strftime(last_day(o_orderdate), '%Y-%m-%d') AS eom,
      |  strftime(make_date(1995, month(o_orderdate), 1), '%Y-%m-%d') AS anchor
      |FROM orders""".stripMargin

  // ---------------------------------------------------------------- q64
  /** Skew-salted two-phase aggregation surfaced at the driver gate:
    * result is provably identical to the plain aggregate (associative
    * merges over exact types), so the oracle is the plain SQL — while
    * the Spark plan scatters each hot key over 8 salts before merging.
    */
  def q64SaltedAgg(s: SparkSession, d: String): DataFrame =
    graft.ops.Skew.saltedAggregate(
        Tables.events(s, d).select(
          col("event_type"),
          col("value").cast(DecimalType(18, 2)).as("value_c"),
          col("event_id"), col("user_id")),
        keys = Seq("event_type"), salt = 8,
        aggs = Map("value_c" -> "sum", "event_id" -> "count", "user_id" -> "max"))
      .select(col("event_type"),
              round(col("sum_value_c"), 2).cast("double").as("sum_v"),
              col("count_event_id").as("n"),
              col("max_user_id").as("max_u"))

  val q64Sql: String =
    """SELECT event_type,
      |  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_v,
      |  count(event_id) AS n,
      |  max(user_id) AS max_u
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q52
  /** Approximate percentiles (Greenwald-Khanna sketch): the scale path
    * for quantiles — mergeable fixed-size sketch per partition, one
    * shuffle of sketches, never a global sort. q43 is its exact
    * (sort-based) twin. The sketch values are engine-specific, so the
    * HASH-CHECKED output carries the exact percentiles plus rank-bound
    * witnesses: with accuracy 1000 the GK rank error is 1e-3, so the
    * approx p50 must land inside the exact [p45, p55] value band (p95
    * inside [p93, p97]) — enormous slack, deterministic both sides.
    */
  def q52ApproxPercentile(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(expr("percentile(value, array(0.45, 0.5, 0.55, 0.93, 0.95, 0.97))").as("ex"),
           expr("approx_percentile(value, array(0.5, 0.95), 1000)").as("ap"),
           count(lit(1)).as("n"))
      .select(col("event_type"),
              col("ex")(1).as("p50_exact"),
              col("ex")(4).as("p95_exact"),
              (col("ap")(0) >= col("ex")(0) && col("ap")(0) <= col("ex")(2)).as("p50_ok"),
              (col("ap")(1) >= col("ex")(3) && col("ap")(1) <= col("ex")(5)).as("p95_ok"),
              col("n"))

  val q52Sql: String =
    """SELECT event_type,
      |  quantile_cont(value, 0.5) AS p50_exact,
      |  quantile_cont(value, 0.95) AS p95_exact,
      |  TRUE AS p50_ok, TRUE AS p95_ok,
      |  count(*) AS n
      |FROM events GROUP BY event_type""".stripMargin

  // ---------------------------------------------------------------- q67
  /** stack() — the generator twin of unpivot (q55): n column groups ->
    * rows in one projection pass, no join, no shuffle.
    */
  def q67Stack(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).selectExpr("o_orderkey",
      """stack(3,
        |  'totalprice', o_totalprice,
        |  'custkey', CAST(o_custkey AS DOUBLE),
        |  'orderkey2x', CAST(o_orderkey * 2 AS DOUBLE)) AS (metric, v)""".stripMargin)

  val q67Sql: String =
    """SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS v FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
      |UNION ALL
      |SELECT o_orderkey, 'orderkey2x', CAST(o_orderkey * 2 AS DOUBLE) FROM orders""".stripMargin

  // ---------------------------------------------------------------- q68
  /** Date-spine gap fill — the companion to q59's window fill: a
    * generated `sequence` of days left-joined to daily aggregates so
    * empty days surface as explicit zeros. The spine is generated, not
    * scanned (a few hundred rows broadcast against the fact table's
    * pre-aggregated dailies — at 100 TB the heavy side is reduced
    * BEFORE the join touches it).
    */
  def q68DateSpine(s: SparkSession, d: String): DataFrame = {
    val spine = s.sql(
      "SELECT explode(sequence(DATE'1995-03-01', DATE'1995-06-30', interval 1 day)) AS day")
    val daily = Tables.orders(s, d)
      .select(to_date(col("o_orderdate")).as("day"))
      .filter(col("day").between("1995-03-01", "1995-06-30"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"))
    spine.join(daily, Seq("day"), "left")
      .select(
        datediff(col("day"), lit("1970-01-01").cast("date")).cast("long").as("epoch_day"),
        coalesce(col("n"), lit(0L)).as("n_orders"))
  }

  val q68Sql: String =
    """WITH spine AS (
      |    SELECT CAST(unnest(generate_series(DATE '1995-03-01', DATE '1995-06-30',
      |                                       INTERVAL 1 DAY)) AS DATE) AS day),
      |  daily AS (
      |    SELECT CAST(o_orderdate AS DATE) AS day, count(*) AS n
      |    FROM orders
      |    WHERE CAST(o_orderdate AS DATE) BETWEEN DATE '1995-03-01' AND DATE '1995-06-30'
      |    GROUP BY 1)
      |SELECT CAST(datediff('day', DATE '1970-01-01', spine.day) AS BIGINT) AS epoch_day,
      |  CAST(coalesce(daily.n, 0) AS BIGINT) AS n_orders
      |FROM spine LEFT JOIN daily ON spine.day = daily.day""".stripMargin

  // ---------------------------------------------------------------- q69
  /** Regexp split to array: Spark `split` keeps leading/trailing empty
    * strings (Java split with limit -1), and so does DuckDB's
    * regexp_split_to_array — asserted by splitting JSON text on
    * non-digit runs, which produces both. The array is emitted
    * re-joined with '|' (not as a raw array column): split semantics
    * stay fully under test — every element and boundary empty string
    * survives into the joined string — while the output stays hashable
    * for the oracle compare (raw parquet arrays arrive driver-side as
    * unhashable ndarrays).
    */
  def q69RegexpSplit(s: SparkSession, d: String): DataFrame = {
    val parts = split(col("props"), "[^0-9]+")
    Tables.events(s, d).select(
      col("event_id"),
      array_join(parts, "|").as("parts"),
      size(parts).cast("long").as("n_parts"),
      element_at(parts, 2).as("k_str"))
  }

  val q69Sql: String =
    """SELECT event_id,
      |  array_to_string(regexp_split_to_array(props, '[^0-9]+'), '|') AS parts,
      |  CAST(len(regexp_split_to_array(props, '[^0-9]+')) AS BIGINT) AS n_parts,
      |  regexp_split_to_array(props, '[^0-9]+')[2] AS k_str
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- q70
  /** width_bucket histogram: equi-width bucketing of event values into
    * a 20-bucket histogram — one narrow shuffle of (bucket, partial
    * counts). DuckDB has no width_bucket; the oracle replicates
    * Spark's exact float arithmetic (n * (v - min) / (max - min),
    * multiply FIRST — the other association diverges at bucket
    * boundaries) plus the standard under/overflow buckets 0 and n+1.
    */
  def q70WidthBucket(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(expr("width_bucket(value, 0.0D, 500.0D, 20)").as("bucket"), col("value"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), min(col("value")).as("vmin"), max(col("value")).as("vmax"))

  val q70Sql: String =
    """SELECT bucket, count(*) AS n, min(value) AS vmin, max(value) AS vmax
      |FROM (SELECT
      |    CASE WHEN value < 0.0 THEN 0
      |         WHEN value >= 500.0 THEN 21
      |         ELSE CAST(floor(20.0 * (value - 0.0) / (500.0 - 0.0)) AS BIGINT) + 1
      |    END AS bucket, value
      |  FROM events)
      |GROUP BY bucket""".stripMargin

  // ---------------------------------------------------------------- q73
  /** Statistical aggregates the ORDER-INDEPENDENT way: float sums
    * depend on partition/merge order, so corr/var/stddev built-ins are
    * not bit-reproducible across runs, let alone engines. The scale
    * discipline: accumulate EXACT integer moments (values are exact
    * 2-dec -> integer cents; BIGINT sums are associative/commutative,
    * so any partitioning and any merge order gives THE SAME moments),
    * then derive the float statistics from those exact aggregates —
    * identical IEEE arithmetic on identical inputs on every engine and
    * every rerun. Built-in var_samp/stddev_samp/corr ride along as
    * tolerance-witness booleans (they are approximately right; the
    * moment-derived values are exactly reproducible).
    */
  def q73StatsMoments(s: SparkSession, d: String): DataFrame = {
    val xc = round(col("value") * 100).cast("long")           // exact cents
    val y = get_json_object(col("props"), "$.k").cast("long") // exact int
    val agg = Tables.events(s, d)
      .select(col("event_type"), xc.as("xc"), y.as("y"), col("value"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
           sum(col("xc")).as("sx"), sum(col("xc") * col("xc")).as("sxx"),
           sum(col("y")).as("sy"), sum(col("y") * col("y")).as("syy"),
           sum(col("xc") * col("y")).as("sxy"),
           var_samp(col("value")).as("v_b"),
           stddev_samp(col("value")).as("s_b"),
           corr(col("value"), col("y").cast("double")).as("c_b"))
    val n = col("n").cast("double")
    def d_(c: String) = col(c).cast("double")
    val varCents = (n * d_("sxx") - d_("sx") * d_("sx")) / (n * (n - 1))
    val variance = varCents / 1e4
    val stddev = sqrt(varCents) / 1e2
    val corrExact = (n * d_("sxy") - d_("sx") * d_("sy")) /
      (sqrt(n * d_("sxx") - d_("sx") * d_("sx")) * sqrt(n * d_("syy") - d_("sy") * d_("sy")))
    agg.select(
      col("event_type"), col("n"),
      (d_("sx") / n / 1e2).as("mean"),
      variance.as("var_exact"),
      stddev.as("stddev_exact"),
      corrExact.as("corr_exact"),
      (abs(col("v_b") - variance) <= variance * 1e-9 + 1e-9).as("var_ok"),
      (abs(col("s_b") - stddev) <= stddev * 1e-9 + 1e-9).as("stddev_ok"),
      (abs(col("c_b") - corrExact) <= lit(1e-6)).as("corr_ok"))
  }

  val q73Sql: String =
    """WITH m AS (
      |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
      |    sum(xc) AS sx, sum(xc * xc) AS sxx,
      |    sum(y) AS sy, sum(y * y) AS syy, sum(xc * y) AS sxy
      |  FROM (SELECT event_type,
      |          CAST(round(value * 100) AS BIGINT) AS xc,
      |          CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
      |        FROM events)
      |  GROUP BY event_type)
      |SELECT event_type, n,
      |  CAST(sx AS DOUBLE) / n / 1e2 AS mean,
      |  (n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (n * (n - 1.0)) / 1e4 AS var_exact,
      |  sqrt((n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx) / (n * (n - 1.0))) / 1e2 AS stddev_exact,
      |  (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy)
      |    / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx)
      |       * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy)) AS corr_exact,
      |  TRUE AS var_ok, TRUE AS stddev_ok, TRUE AS corr_ok
      |FROM m""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Deterministic mode + discrete percentile: built-in mode() breaks
    * frequency ties arbitrarily, so the dedup-grade form is
    * max(struct(freq, value)) — larger value wins exact ties, same
    * map-side-combinable aggregate shape as LWW. percentile_disc(0.5)
    * is the value at rank ceil(n/2) in value order — a window rank +
    * filter, no interpolation (stays exact for any value type).
    */
  def q74ModeDisc(s: SparkSession, d: String): DataFrame = {
    val freq = Tables.events(s, d)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("f"))
    val mode = freq.groupBy(col("event_type"))
      .agg(max(struct(col("f"), col("value"))).as("m"),
           sum(col("f")).as("n"))
      .select(col("event_type"), col("m.value").as("mode_value"),
              col("m.f").as("mode_freq"), col("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("value").asc)
    val disc = Tables.events(s, d)
      .select(col("event_type"), col("value"),
              row_number().over(w).as("rn"),
              count(lit(1)).over(Window.partitionBy(col("event_type"))).as("cnt"))
      .filter(col("rn") === ceil(col("cnt") * 0.5).cast("int"))
      .select(col("event_type"), col("value").as("p50_disc"))
    mode.join(disc, "event_type")
  }

  val q74Sql: String =
    """WITH freq AS (SELECT event_type, value, CAST(count(*) AS BIGINT) AS f
      |              FROM events GROUP BY 1, 2),
      |  md AS (SELECT event_type, value AS mode_value, f AS mode_freq,
      |           CAST(tot AS BIGINT) AS n FROM
      |      (SELECT event_type, value, f,
      |         sum(f) OVER (PARTITION BY event_type) AS tot,
      |         row_number() OVER (PARTITION BY event_type
      |           ORDER BY f DESC, value DESC) AS rn
      |       FROM freq)
      |    WHERE rn = 1),
      |  disc AS (SELECT event_type, value AS p50_disc FROM
      |      (SELECT event_type, value,
      |         row_number() OVER (PARTITION BY event_type ORDER BY value ASC) AS rn,
      |         count(*) OVER (PARTITION BY event_type) AS cnt
      |       FROM events)
      |    WHERE rn = CAST(ceil(cnt * 0.5) AS BIGINT))
      |SELECT event_type, mode_value, mode_freq, n, p50_disc
      |FROM md JOIN disc USING (event_type)""".stripMargin

  // ---------------------------------------------------------------- q77
  /** Heavy hitters: `df.stat.freqItems` (the Karp-Papadimitriou-
    * Shenker one-pass streaming summary — mergeable, sketch-sized
    * state, the 100 TB path for "what dominates this column").
    * The sketch's raw item list is engine-specific (it may include
    * false positives by design), so the HASH-CHECKED output is the
    * exact heavy-hitter table plus the sketch's guarantee as a
    * witness: every TRUE heavy hitter (freq > support) MUST appear in
    * the sketch's candidate set. The oracle emits TRUE.
    */
  def q77FreqItems(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val support = 0.1
    val sketch = ev.stat.freqItems(Seq("event_type"), support)
      .select(col("event_type_freqItems").as("cand"))
    val total = ev.agg(count(lit(1)).as("tot"))
    ev.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(total))
      .filter(col("n") > col("tot") * support)
      .crossJoin(broadcast(sketch))
      .select(col("event_type"), col("n"),
              array_contains(col("cand"), col("event_type")).as("in_sketch"))
  }

  val q77Sql: String =
    """SELECT event_type, CAST(count(*) AS BIGINT) AS n, TRUE AS in_sketch
      |FROM events GROUP BY event_type
      |HAVING count(*) > (SELECT count(*) FROM events) * 0.1""".stripMargin

  // ---------------------------------------------------------------- q78
  /** Built-in `session_window` BATCH aggregation, proven against the
    * classic gaps-and-islands SQL formulation — the two must agree
    * exactly, including the boundary rule: Spark sessions span
    * [start, last + gap) with an EXCLUSIVE end, so an event arriving
    * exactly `gap` after the previous one starts a NEW session
    * (island break is `diff >= gap`, not `>`).
    */
  def q78SessionWindow(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
              unix_millis(col("session_window.start")).as("start_ms"),
              unix_millis(col("session_window.end")).as("end_ms"),
              col("n_events"))

  val q78Sql: String =
    """WITH marked AS (
      |  SELECT user_id, ts,
      |    CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
      |              >= INTERVAL 30 MINUTE
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
      |      THEN 1 ELSE 0 END AS brk
      |  FROM events),
      |  islands AS (
      |    SELECT user_id, ts,
      |      sum(brk) OVER (PARTITION BY user_id ORDER BY ts
      |        ROWS UNBOUNDED PRECEDING) AS sid
      |    FROM marked)
      |SELECT user_id,
      |  epoch_ms(min(ts)) AS start_ms,
      |  epoch_ms(max(ts)) + 30 * 60 * 1000 AS end_ms,
      |  CAST(count(*) AS BIGINT) AS n_events
      |FROM islands GROUP BY user_id, sid""".stripMargin

  // ---------------------------------------------------------------- q109
  /** Retention cohort matrix — the product-analytics staple over the
    * events table: users cohorted by first-activity week, counted per
    * (cohort, activity week). Plan shape at 100 TB: two hash
    * aggregates keyed user_id (first-month + distinct activity) and
    * one equi-join on user_id — the join reuses the aggregates'
    * hash partitioning, so the only data-sized shuffle is the initial
    * key exchange; the cohort matrix itself is weeks², metadata.
    */
  def q109RetentionCohorts(s: SparkSession, d: String): DataFrame = {
    val ev = graft.core.Tables.events(s, d)
    val first = ev.groupBy(col("user_id"))
      .agg(min(date_trunc("week", col("ts"))).as("cohort"))
    ev.select(col("user_id"), date_trunc("week", col("ts")).as("am"))
      .distinct()
      .join(first, "user_id")
      .groupBy(col("cohort"), col("am"))
      .agg(count(lit(1)).cast("long").as("n_users"))
      .select(
        date_format(col("cohort"), "yyyy-MM-dd").as("cohort_week"),
        date_format(col("am"), "yyyy-MM-dd").as("activity_week"),
        (datediff(col("am"), col("cohort")) / 7).cast("long").as("weeks_since"),
        col("n_users"))
  }

  val q109Sql: String =
    """WITH f AS (SELECT user_id, min(date_trunc('week', ts)) AS cohort
      |           FROM events GROUP BY user_id),
      |  a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS am FROM events)
      |SELECT strftime(cohort, '%Y-%m-%d') AS cohort_week,
      |  strftime(am, '%Y-%m-%d') AS activity_week,
      |  CAST(datediff('day', cohort, am) // 7 AS BIGINT) AS weeks_since,
      |  CAST(count(*) AS BIGINT) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY cohort, am""".stripMargin

  // ---------------------------------------------------------------- q142
  /** ORDERED EVENT FUNNEL — view -> click -> purchase, each step
    * within 7 days of the previous, first qualifying timestamp per
    * step: the product-analytics staple. Scale shape: each step is ONE
    * hash aggregate over that step's filtered events joined to the
    * previous step's per-user frame (user-cardinality, broadcast-able
    * at dim scale) — never a per-user event sort or a sequence scan
    * over the raw stream; step k's shuffle carries only step-k events.
    * Emits per-user stage reached + the step timestamps, NULL where
    * the funnel broke (strict > ordering, so a click at exactly the
    * view's ts does not advance).
    */
  def q142EventFunnel(s: SparkSession, d: String): DataFrame = {
    val ev = graft.core.Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts"))
    val win = expr("INTERVAL 7 DAYS")
    val a = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("ta"))
    val b = ev.filter(col("event_type") === "click").join(a, "user_id")
      .filter(col("ts") > col("ta") && col("ts") <= col("ta") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("tb"))
    val c = ev.filter(col("event_type") === "purchase").join(b, "user_id")
      .filter(col("ts") > col("tb") && col("ts") <= col("tb") + win)
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    a.join(b, Seq("user_id"), "left").join(c, Seq("user_id"), "left")
      .select(col("user_id"),
        when(col("tc").isNotNull, 3L).when(col("tb").isNotNull, 2L)
          .otherwise(1L).as("stage"),
        unix_millis(col("ta")).as("ta_ms"),
        unix_millis(col("tb")).as("tb_ms"),
        unix_millis(col("tc")).as("tc_ms"))
  }

  val q142Sql: String =
    """WITH a AS (SELECT user_id, min(ts) AS ta FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |b AS (SELECT e.user_id, min(e.ts) AS tb
      |      FROM events e JOIN a ON e.user_id = a.user_id
      |      WHERE e.event_type = 'click'
      |        AND e.ts > a.ta AND e.ts <= a.ta + INTERVAL 7 DAY
      |      GROUP BY e.user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS tc
      |      FROM events e JOIN b ON e.user_id = b.user_id
      |      WHERE e.event_type = 'purchase'
      |        AND e.ts > b.tb AND e.ts <= b.tb + INTERVAL 7 DAY
      |      GROUP BY e.user_id)
      |SELECT a.user_id,
      |  CAST(CASE WHEN c.tc IS NOT NULL THEN 3
      |            WHEN b.tb IS NOT NULL THEN 2 ELSE 1 END AS BIGINT) AS stage,
      |  epoch_ms(a.ta) AS ta_ms, epoch_ms(b.tb) AS tb_ms, epoch_ms(c.tc) AS tc_ms
      |FROM a LEFT JOIN b ON a.user_id = b.user_id
      |       LEFT JOIN c ON a.user_id = c.user_id""".stripMargin

  // ---------------------------------------------------------------- q260
  /** The remaining ranking-function surface — ntile / percent_rank /
    * cume_dist (q07/q46 cover rank/dense_rank/row_number and frames):
    * per event_type over the exact-cents total order (event_id
    * tiebreak). Definitions agree across engines: percent_rank =
    * (rank-1)/(n-1), cume_dist = peers-at-or-below/n, ntile fills
    * larger tiles first. All windows PARTITIONED by event_type —
    * parallel at any corpus size. The quotients divide exact
    * integers, so even the doubles hash cross-engine.
    */
  def q260RankSurface(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents").asc, col("event_id").asc)
    Tables.events(s, d)
      .filter(col("value").isNotNull)
      .select(col("event_id"), col("event_type"),
        round(col("value") * 100).cast("long").as("cents"))
      .select(col("event_id"), col("event_type"), col("cents"),
        ntile(4).over(w).cast("long").as("tile"),
        percent_rank().over(w).as("pr"),
        cume_dist().over(w).as("cd"))
  }

  val q260Sql: String =
    """SELECT event_id, event_type,
      |  CAST(round(value * 100) AS BIGINT) AS cents,
      |  CAST(ntile(4) OVER w AS BIGINT) AS tile,
      |  percent_rank() OVER w AS pr,
      |  cume_dist() OVER w AS cd
      |FROM events WHERE value IS NOT NULL
      |WINDOW w AS (PARTITION BY event_type
      |  ORDER BY CAST(round(value * 100) AS BIGINT), event_id)""".stripMargin

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q260_rank_surface" -> (q260RankSurface _, q260Sql),
    "q109_retention_cohorts" -> (q109RetentionCohorts _, q109Sql),
    "q142_event_funnel" -> (q142EventFunnel _, q142Sql),
    "q43_percentiles" -> (q43Percentiles _, q43Sql),
    "q44_datetime" -> (q44Datetime _, q44Sql),
    "q45_strings" -> (q45Strings _, q45Sql),
    "q46_window_tail" -> (q46WindowTail _, q46Sql),
    "q47_range_join" -> (q47RangeJoin _, q47Sql),
    "q48_grouping_sets" -> (q48GroupingSets _, q48Sql),
    "q49_array_hof" -> (q49ArrayHof _, q49Sql),
    "q50_selective_agg" -> (q50SelectiveAgg _, q50Sql),
    "q51_bitwise" -> (q51Bitwise _, q51Sql),
    "q52_approx_percentile" -> (q52ApproxPercentile _, q52Sql),
    "q55_unpivot" -> (q55Unpivot _, q55Sql),
    "q67_stack" -> (q67Stack _, q67Sql),
    "q68_date_spine" -> (q68DateSpine _, q68Sql),
    "q69_regexp_split" -> (q69RegexpSplit _, q69Sql),
    "q70_width_bucket" -> (q70WidthBucket _, q70Sql),
    "q73_stats_moments" -> (q73StatsMoments _, q73Sql),
    "q77_freq_items" -> (q77FreqItems _, q77Sql),
    "q78_session_window" -> (q78SessionWindow _, q78Sql),
    "q74_mode_disc" -> (q74ModeDisc _, q74Sql),
    "q57_map_funcs" -> (q57MapFuncs _, q57Sql),
    "q58_try_safety" -> (q58TrySafety _, q58Sql),
    "q59_gap_fill" -> (q59GapFill _, q59Sql),
    "q61_regexp_seq" -> (q61RegexpSeq _, q61Sql),
    "q62_setops_all" -> (q62SetOpsAll _, q62Sql),
    "q63_month_arith" -> (q63MonthArith _, q63Sql),
    "q64_salted_agg" -> (q64SaltedAgg _, q64Sql),
  )
}
