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

  val entries: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q43_percentiles" -> (q43Percentiles _, q43Sql),
    "q44_datetime" -> (q44Datetime _, q44Sql),
    "q45_strings" -> (q45Strings _, q45Sql),
    "q46_window_tail" -> (q46WindowTail _, q46Sql),
    "q47_range_join" -> (q47RangeJoin _, q47Sql),
  )
}
