package graft

import org.apache.spark.sql.functions._
import graft.plans.{AsOf, AsOfJoinExec}

/** The custom as-of join operator (plans/AsOfJoin.scala) must agree
  * exactly with the composed join+argmax form (q36's shape) and plan
  * as one merge pass after co-partitioning.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def eventsWithDeadline = graft.core.Tables.events(spark, sfDir).select(
    $"event_id", $"user_id",
    date_add(lit("1995-01-01").cast("date"),
      pmod($"event_id", lit(2400)).cast("int")).cast("timestamp").as("deadline"))

  private def orders = graft.core.Tables.orders(spark, sfDir)
    .select($"o_custkey", $"o_orderkey", $"o_orderdate")

  test("custom as-of exec matches the composed join+argmax on real data") {
    val viaExec = AsOf.join(eventsWithDeadline, orders,
        Seq("user_id"), Seq("o_custkey"), "deadline", "o_orderdate",
        rightTiebreaks = Seq("o_orderkey"))
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    // composed form: all candidates then latest-by-key (q36's shape)
    val e = eventsWithDeadline
    val matched = e.join(orders,
      $"user_id" === $"o_custkey" && $"o_orderdate" <= $"deadline")
    val best = graft.ops.Cdc.latestByKey(
        matched.select($"event_id".as("m_id"), $"o_orderkey", $"o_orderdate"),
        Seq("m_id"), Seq("o_orderdate", "o_orderkey"))
      .select($"m_id", $"o_orderkey")
    val viaCompose = e.join(best, $"event_id" === $"m_id", "left")
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap

    assert(viaExec.size == viaCompose.size && viaExec.nonEmpty)
    assert(viaExec == viaCompose)
    // both populated and null matches must occur for this to test anything
    assert(viaExec.values.exists(_.isDefined) && viaExec.values.exists(_.isEmpty))
  }

  test("as-of plans as one AsOfJoinExec with co-partitioned sorted children") {
    val df = AsOf.join(eventsWithDeadline, orders,
      Seq("user_id"), Seq("o_custkey"), "deadline", "o_orderdate",
      rightTiebreaks = Seq("o_orderkey"))
    df.collect() // finalize AQE
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"custom exec missing:\n${p.take(800)}")
    assert("Sort ".r.findAllIn(p).size >= 2, "children not sorted for the merge")
    assert(p.contains("Exchange") || p.contains("ShuffleQueryStage"),
      "children not hash-clustered")
  }

  test("forward direction takes the first right row at-or-after the left time") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 95L), (3L, 11L, 50L)).toDF("id", "k", "t")
    val r = Seq((10L, 90L, 7L), (10L, 100L, 8L), (10L, 100L, 9L), (10L, 120L, 5L))
      .toDF("rk", "rt", "payload")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"),
        direction = "forward")
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    // t=100 -> first rt>=100 in (rt, payload) order = (100, 8);
    // t=95 -> same; k=11 has no rows at all
    assert(out == Map(1L -> Some(8L), 2L -> Some(8L), 3L -> None))
  }

  test("forward matches the composed min-struct form on real data") {
    val viaExec = AsOf.join(eventsWithDeadline, orders,
        Seq("user_id"), Seq("o_custkey"), "deadline", "o_orderdate",
        rightTiebreaks = Seq("o_orderkey"), direction = "forward")
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    val e = eventsWithDeadline
    val matched = e.join(orders,
      $"user_id" === $"o_custkey" && $"o_orderdate" >= $"deadline")
    val best = matched.groupBy($"event_id".as("m_id"))
      .agg(min(struct($"o_orderdate", $"o_orderkey")).as("s"))
      .select($"m_id", $"s.o_orderkey".as("o_orderkey"))
    val viaCompose = e.join(best, $"event_id" === $"m_id", "left")
      .select($"event_id", $"o_orderkey")
      .as[(Long, Option[Long])].collect().toMap
    assert(viaExec == viaCompose && viaExec.values.exists(_.isDefined))
  }

  test("NULL keys and times never match, mirroring the composed ===/<= form") {
    // left: id 4 has a null key, id 5 a null time; right: one null-key
    // row and one null-time row that must both be invisible to matching
    val l = Seq((1L, Some(10L), Some(100L)), (2L, Some(10L), Some(95L)),
                (4L, None, Some(100L)), (5L, Some(10L), None))
      .toDF("id", "k", "t")
    val r = Seq((Some(10L), Some(90L), 7L), (None, Some(85L), 6L),
                (Some(10L), None, 99L), (Some(10L), Some(94L), 8L))
      .toDF("rk", "rt", "payload")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"))
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    // ids 1/2 match the latest non-null row at/before t; null-key and
    // null-time left rows emit unmatched (left join), never payload
    // 6 (null rk) or 99 (null rt)
    assert(out == Map(1L -> Some(8L), 2L -> Some(8L), 4L -> None, 5L -> None))
    // forward direction: same null discipline
    val fwd = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"),
        direction = "forward")
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    assert(fwd == Map(1L -> None, 2L -> None, 4L -> None, 5L -> None))
  }

  test("self-as-of-join re-aliases the right side (no ambiguous ExprIds)") {
    // previous version of each event per user: left and right derive
    // from the SAME analyzed plan, so every right attribute shares its
    // ExprId with the left twin unless the API re-aliases
    val ev = Seq((1L, 9L, 100L), (2L, 9L, 200L), (3L, 9L, 300L), (4L, 8L, 50L))
      .toDF("eid", "uid", "ts")
    val prior = ev.withColumn("pts", $"ts" - 1)
    val out = AsOf.join(prior, ev.withColumnRenamed("eid", "peid")
        .withColumnRenamed("uid", "puid").withColumnRenamed("ts", "prev_ts"),
        Seq("uid"), Seq("puid"), "pts", "prev_ts", Seq("peid"))
      .select($"eid", $"peid").as[(Long, Option[Long])].collect().toMap
    assert(out == Map(1L -> None, 2L -> Some(1L), 3L -> Some(2L), 4L -> None))
    // the raw self-join (zero renames, exact same lineage both sides)
    // must at minimum bind unambiguously and produce one row per left
    val raw = AsOf.join(ev, ev, Seq("uid"), Seq("uid"), "ts", "ts", Seq("eid"))
    assert(raw.count() == 4)
    // every left row matches ITSELF (rt <= lt includes equality)
    val matchedPairs = raw.collect()
    assert(matchedPairs.forall(row => row.getLong(0) == row.getLong(3)))
  }

  test("tolerance bounds the match distance; inner drops the unmatched") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 200L), (3L, 11L, 50L)).toDF("id", "k", "t")
    val r = Seq((10L, 95L, 7L), (10L, 120L, 8L)).toDF("rk", "rt", "payload")
    // backward, tolerance 10: id1 matches rt=95 (gap 5); id2's nearest
    // at-or-before is rt=120... no, 120 <= 200 so gap 80 > 10 -> null
    val tol = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"),
        tolerance = Some(10L))
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    assert(tol == Map(1L -> Some(7L), 2L -> None, 3L -> None))
    // inner: unmatched left rows disappear entirely
    val inner = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"),
        tolerance = Some(10L), joinType = "inner")
      .select($"id", $"payload").as[(Long, Long)].collect().toMap
    assert(inner == Map(1L -> 7L))
    // tolerance parity with pandas merge_asof on the forward direction
    val fwdTol = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"),
        direction = "forward", tolerance = Some(25L))
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    // id1: first rt>=100 is 120, gap 20 <= 25 -> match; id2: none after
    assert(fwdTol == Map(1L -> Some(8L), 2L -> None, 3L -> None))
  }

  test("handles empty right side and duplicate left timestamps") {
    val l = Seq((1L, 10L, 100L), (2L, 10L, 100L), (3L, 11L, 50L))
      .toDF("id", "k", "t")
    val r = Seq((10L, 90L, 7L), (10L, 100L, 8L), (10L, 100L, 9L), (12L, 10L, 1L))
      .toDF("rk", "rt", "payload")
    val out = AsOf.join(l, r, Seq("k"), Seq("rk"), "t", "rt", Seq("payload"))
      .select($"id", $"payload").as[(Long, Option[Long])].collect().toMap
    // rt=100 ties: payload 9 wins (max tiebreak); k=11 has no match
    assert(out == Map(1L -> Some(9L), 2L -> Some(9L), 3L -> None))
  }
}
