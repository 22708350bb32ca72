package graft.core

import org.apache.spark.sql.SparkSession

/** Testdata schema preflight.
  *
  * The driver regenerates /root/testdata between rounds and has shipped
  * different physical encodings across drops (events.ts was
  * TIMESTAMP(NANOS) in one generation, TIMESTAMP(MICROS,NTZ) in the
  * next — the latter silently analysis-errored 89 queries in round 5).
  * This check runs once at Bench/Verify startup and turns any future
  * drift into ONE clear line naming table/column/found-vs-expected,
  * instead of dozens of identical stack traces downstream.
  *
  * Types are matched against an accept-set per column, not a single
  * type: the loaders normalize known variants (Tables.events), and
  * date-ish columns may legitimately arrive as date / timestamp /
  * timestamp_ntz. A column whose normalized type is outside its
  * accept-set, or a missing column, fails the preflight.
  */
object Preflight {

  private val T  = Set("timestamp", "timestamp_ntz", "date")
  private val I  = Set("int", "bigint")

  /** column -> acceptable Spark simpleString types, per table, as seen
    * AFTER the Tables loader (i.e. events.ts already normalized). */
  private val expected: Map[String, Seq[(String, Set[String])]] = Map(
    "region" -> Seq("r_regionkey" -> I, "r_name" -> Set("string")),
    "nation" -> Seq("n_nationkey" -> I, "n_name" -> Set("string"), "n_regionkey" -> I),
    "customer" -> Seq("c_custkey" -> I, "c_name" -> Set("string"), "c_nationkey" -> I,
      "c_acctbal" -> Set("double"), "c_mktsegment" -> Set("string")),
    "supplier" -> Seq("s_suppkey" -> I, "s_name" -> Set("string"), "s_nationkey" -> I,
      "s_acctbal" -> Set("double")),
    "part" -> Seq("p_partkey" -> I, "p_name" -> Set("string"), "p_brand" -> Set("string"),
      "p_type" -> Set("string"), "p_size" -> I, "p_retailprice" -> Set("double")),
    "orders" -> Seq("o_orderkey" -> I, "o_custkey" -> I, "o_orderstatus" -> Set("string"),
      "o_totalprice" -> Set("double"), "o_orderdate" -> T, "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq("l_orderkey" -> I, "l_partkey" -> I, "l_suppkey" -> I,
      "l_linenumber" -> I, "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"), "l_returnflag" -> Set("string"),
      "l_linestatus" -> Set("string"), "l_shipdate" -> T),
    "events" -> Seq("event_id" -> I, "ts" -> Set("timestamp"), "user_id" -> I,
      "event_type" -> Set("string"), "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq("doc_id" -> I, "text" -> Set("string"), "lang" -> Set("string"),
      "source" -> Set("string"), "n_chars" -> I),
    "embeddings" -> Seq("vec_id" -> I,
      "embedding" -> Set("array<float>", "array<double>"), "label" -> I))

  /** Throws IllegalStateException with every mismatch on one line each;
    * returns silently when all 10 tables conform. */
  def check(spark: SparkSession, sfDir: String): Unit = {
    val problems = expected.toSeq.sortBy(_._1).flatMap { case (table, cols) =>
      try {
        val df = table match {
          case "events" => Tables.events(spark, sfDir)
          case t        => Tables.load(spark, sfDir, t)
        }
        val actual = df.schema.map(f => f.name -> f.dataType.simpleString).toMap
        cols.flatMap { case (col, accept) =>
          actual.get(col) match {
            case None =>
              Some(s"$table.$col: MISSING (have: ${df.schema.fieldNames.mkString(",")})")
            case Some(t) if !accept(t) =>
              Some(s"$table.$col: found $t, expected one of {${accept.mkString(",")}}")
            case _ => None
          }
        }
      } catch {
        case e: Throwable =>
          Seq(s"$table: unreadable at $sfDir — ${e.toString.takeWhile(_ != '\n').take(200)}")
      }
    }
    if (problems.nonEmpty)
      throw new IllegalStateException(
        "testdata preflight FAILED:\n" + problems.mkString("\n"))
    // Type checks can't catch a silent UNIT change (seconds-vs-micros
    // in the raw ts would still normalize to a well-typed timestamp,
    // just centuries off) or an empty regeneration. Two value checks:
    //  - every table non-empty (limit(1) scan — one split per table);
    //  - post-normalization events.ts years in a plausible band.
    val valueProblems = {
      val empties = expected.keys.toSeq.sorted.flatMap { table =>
        val df = if (table == "events") Tables.events(spark, sfDir)
                 else Tables.load(spark, sfDir, table)
        if (df.limit(1).count() == 0L) Some(s"$table: EMPTY at $sfDir") else None
      }
      val tsRange = {
        import org.apache.spark.sql.functions.{max, min, year}
        val r = Tables.events(spark, sfDir)
          .agg(min(year(org.apache.spark.sql.functions.col("ts"))).as("lo"),
               max(year(org.apache.spark.sql.functions.col("ts"))).as("hi"))
          .head()
        val (lo, hi) = (r.getInt(0), r.getInt(1))
        if (lo < 2000 || hi > 2100)
          Some(s"events.ts: year range [$lo, $hi] outside plausible [2000, 2100]" +
            " — likely a ts unit drift (seconds-vs-micros) in this testdata drop")
        else None
      }
      // q204's tracked_ok witness equals the oracle's constant TRUE
      // only if (a) distinct floor(value) buckets fit the sketch's
      // maxItemsTracked=4096 (counts then exact) and (b) no tie group
      // spans the top-20 boundary (no exact-top-10 item can be pushed
      // off the 20-entry list by tie ordering). AdvancedSpec pins this
      // on sf0.001; this pins it for WHATEVER sfDir a gated run uses
      // (driver sf0.01, bench sf0.1, synthesized sf1) — an unlucky
      // regeneration fails in one line here, not as a q204 hash diff.
      val q204Witness = {
        import org.apache.spark.sql.functions.{col, count, floor, lit}
        val counts = Tables.events(spark, sfDir)
          .filter(col("value").isNotNull)
          .groupBy(floor(col("value")).cast("long").as("item"))
          .agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("item").asc)
          .limit(4097).collect()
        val overflow =
          if (counts.length > 4096)
            Some(s"events: > 4096 distinct floor(value) buckets — q204's sketch no longer exact")
          else None
        val tieSpan =
          if (counts.length > 20) {
            val rank10 = counts(math.min(9, counts.length - 1)).getLong(1)
            val atOrAbove = counts.count(_.getLong(1) >= rank10)
            if (atOrAbove > 20)
              Some(s"events: $atOrAbove floor(value) buckets tie at-or-above the rank-10 count" +
                " — q204's top-20 sketch list could drop an exact-top-10 item")
            else None
          } else None
        overflow ++ tieSpan
      }
      empties ++ tsRange ++ q204Witness
    }
    if (valueProblems.nonEmpty)
      throw new IllegalStateException(
        "testdata preflight FAILED:\n" + valueProblems.mkString("\n"))
  }
}
