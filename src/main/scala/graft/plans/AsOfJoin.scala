package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.PlanBridge

/** Whole-operator as-of join as a first-class Catalyst citizen — the
  * tier-(c) rung of the custom-operator ladder (custom `LogicalPlan` +
  * `Strategy` + `SparkPlan`), for the one relational shape the built-in
  * operators can't express without materializing every candidate match:
  * "for each left row, the latest right row with the same key and
  * rightTime <= leftTime".
  *
  * The composed form (q36: equi-join on key + range predicate, then
  * arg-max per left row — `queries/Extended.scala`) is correct but its
  * join inflates each left row by ALL qualifying right versions before
  * the arg-max collapses them. This operator never materializes that
  * intermediate: after hash-clustering both sides by key and sorting
  * partitions by (key, time), a single forward merge pass emits exactly
  * one output row per left row. Shuffle volume = inputs, not matches —
  * at 100 TB with long version histories that is the difference between
  * |L| + |R| and |L| x avg-versions.
  *
  * Right-side tie order within equal (key, time) is broken by
  * `rightTiebreaks` (ascending; last kept wins), making the pick
  * deterministic — same convention as `Cdc.latestByKey`.
  *
  * NULL semantics match the composed `===`/`<=` form: a NULL join key
  * or NULL time on either side never matches (SQL predicates are
  * never true on NULL) — null-keyed left rows emit unmatched under
  * `keepUnmatched` and are dropped under inner. `tolerance` bounds the
  * match distance in the time column's internal units (micros for
  * timestamps, days for dates) — pandas merge_asof parity.
  */
case class AsOfJoinPlan(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreaks: Seq[Expression],
    forward: Boolean = false,
    tolerance: Option[Long] = None,
    keepUnmatched: Boolean = true) extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy: lower the logical node to the merge exec. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tb, fwd, tol, keep) =>
      AsOfJoinExec(lk, rk, lt, rt, tb, fwd, tol, keep,
        planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join.
  *
  * Distribution/ordering contract (EnsureRequirements inserts the
  * exchanges and sorts): both children hash-clustered on their keys
  * (co-partitioned), each partition sorted by (keys..., time[,
  * tiebreaks]). One buffered forward pass per partition; the right
  * cursor never rewinds, so the merge is O(|L| + |R|) with one live
  * candidate row of state.
  *
  * Whole-stage codegen: deliberately NOT implemented (no
  * CodegenSupport). The produce/consume contract drives generated code
  * from one child's loop; a two-cursor merge with a buffered right
  * side and cross-row candidate state requires the SortMergeJoin-style
  * generated scanner machinery — large complexity for little gain
  * here, because the per-row work is already a handful of primitive
  * comparisons through code-generated `UnsafeProjection`s (the
  * projections ARE codegen'd; only the loop shell is interpreted, and
  * it JITs). The cost is one codegen-stage boundary on each side —
  * the same boundary SortMergeJoin pays at its sorts. Benchmarked
  * 2.3x FASTER than the fully-codegen'd composed join+argmax plan
  * (q60 0.354 s vs q36 0.830 s, sf0.1 min-of-3 — SEMANTICS.md),
  * because algorithm beats codegen at this shape: the composed form
  * materializes every candidate match, the merge never does.
  */
case class AsOfJoinExec(
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    rightTiebreaks: Seq[Expression],
    forward: Boolean,
    tolerance: Option[Long],
    keepUnmatched: Boolean,
    left: SparkPlan,
    right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  /** Raw time value as a comparable long (only used under tolerance). */
  private def timeAsLong(timeType: org.apache.spark.sql.types.DataType,
                         row: InternalRow): Long = {
    import org.apache.spark.sql.types._
    timeType match {
      case DateType | IntegerType         => row.getInt(0).toLong
      case TimestampType | TimestampNTZType | LongType => row.getLong(0)
      case ShortType                      => row.getShort(0).toLong
      case other => throw new IllegalArgumentException(
        s"tolerance not supported for time type $other")
    }
  }

  override lazy val metrics: Map[String, SQLMetric] = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"),
    "numMatched" -> SQLMetrics.createMetric(sparkContext, "rows with an as-of match"))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys ++ (rightTime +: rightTiebreaks)).map(SortOrder(_, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lOutput = left.output
    val rOutput = right.output
    val lKeys = leftKeys
    val rKeys = rightKeys
    val lTime = leftTime
    val rTime = rightTime
    val keyTypes = lKeys.map(_.dataType)
    val timeType = lTime.dataType
    val allOutput = output
    val numOutputRows = longMetric("numOutputRows")
    val numMatched = longMetric("numMatched")
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // generated projections are created per-partition on the executor
      val lKeyProj = UnsafeProjection.create(lKeys, lOutput)
      val rKeyProj = UnsafeProjection.create(rKeys, rOutput)
      val lTimeProj = UnsafeProjection.create(Seq(lTime), lOutput)
      val rTimeProj = UnsafeProjection.create(Seq(rTime), rOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      val outProj = UnsafeProjection.create(allOutput, allOutput)
      val nullRight = new GenericInternalRow(rOutput.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      var cand: InternalRow = null
      var candKey: InternalRow = null
      val fwd = forward
      val tol = tolerance
      val keep = keepUnmatched

      // NULL key/time never matches (`===`/`<=` are never true on
      // NULL); nulls sort FIRST under natural ascending order, so a
      // null-key/null-time right head can always be consumed outright.
      def headIsNull: Boolean = {
        val h = rBuf.head
        rKeyProj(h).anyNull || rTimeProj(h).isNullAt(0)
      }

      lIter.flatMap { lRow =>
        val lKey = lKeyProj(lRow)
        val lTimeRow = lTimeProj(lRow)
        val lNull = lKey.anyNull || lTimeRow.isNullAt(0)
        val lT = lTimeRow.copy()
        var matched: InternalRow = null
        if (!lNull && !fwd) {
          // candidate from a previous left key is stale
          if (cand != null && keyOrd.compare(candKey, lKey) != 0) {
            cand = null; candKey = null
          }
          // backward: latest right with rTime <= lTime — consume
          // qualifying versions, the last one kept wins
          var advance = true
          while (advance && rBuf.hasNext) {
            if (headIsNull) { rBuf.next() }
            else {
              val rKey = rKeyProj(rBuf.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) { rBuf.next() } // keys before ours: skip
              else if (c == 0 && timeOrd.compare(rTimeProj(rBuf.head), lT) <= 0) {
                cand = rBuf.head.copy()
                candKey = rKey.copy()
                rBuf.next()
              } else advance = false
            }
          }
          matched = cand
          // tolerance: the kept candidate is the CLOSEST at-or-before
          // match, so out-of-band here means no in-band match exists
          if (matched != null && tol.isDefined &&
              timeAsLong(timeType, lT) - timeAsLong(timeType, rTimeProj(matched)) > tol.get) {
            matched = null
          }
        } else if (!lNull) {
          // forward: first right with rTime >= lTime — skip earlier
          // versions (later left rows only move forward), peek the head
          cand = null; candKey = null
          var advance = true
          while (advance && rBuf.hasNext) {
            if (headIsNull) { rBuf.next() }
            else {
              val rKey = rKeyProj(rBuf.head)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0 ||
                  (c == 0 && timeOrd.compare(rTimeProj(rBuf.head), lT) < 0)) {
                rBuf.next()
              } else {
                if (c == 0) cand = rBuf.head
                advance = false
              }
            }
          }
          matched = cand
          if (matched != null && tol.isDefined &&
              timeAsLong(timeType, rTimeProj(matched)) - timeAsLong(timeType, lT) > tol.get) {
            matched = null
          }
        }
        if (matched != null) {
          numOutputRows += 1; numMatched += 1
          Some(outProj(joined(lRow, matched)))
        } else if (keep) {
          numOutputRows += 1
          Some(outProj(joined(lRow, nullRight)))
        } else None
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Column-name API: `AsOf.join(events, orders, Seq("user_id"),
  * Seq("o_custkey"), "deadline", "o_orderdate", Seq("o_orderkey"))`.
  * Registers the strategy on the session once (idempotent); also
  * injectable globally via `graft.ext.GraftExtensions`.
  */
object AsOf {
  /** @param tolerance max |leftTime - rightTime| for a match, in the
    *                  time column's internal units (micros for
    *                  timestamps, days for dates, raw for integers) —
    *                  pandas merge_asof `tolerance` parity
    * @param joinType  "left" (unmatched left rows kept with nulls,
    *                  the default and pandas behavior) or "inner"
    */
  def join(left: DataFrame, right: DataFrame,
           leftKeys: Seq[String], rightKeys: Seq[String],
           leftTime: String, rightTime: String,
           rightTiebreaks: Seq[String] = Nil,
           direction: String = "backward",
           tolerance: Option[Long] = None,
           joinType: String = "left"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    require(joinType == "left" || joinType == "inner",
      s"joinType must be left|inner, got $joinType")
    require(tolerance.forall(_ >= 0), "tolerance must be >= 0")
    val spark: SparkSession = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    val lPlan = left.queryExecution.analyzed
    val rPlanRaw = right.queryExecution.analyzed
    // Self-as-of-join: the analyzer's dedupRight only covers built-in
    // Join nodes, so overlapping ExprIds in a custom BinaryNode would
    // bind ambiguously. Re-alias the right side with fresh ExprIds.
    val rPlan: LogicalPlan =
      if (lPlan.outputSet.intersect(rPlanRaw.outputSet).isEmpty) rPlanRaw
      else org.apache.spark.sql.catalyst.plans.logical.Project(
        rPlanRaw.output.map(a =>
          org.apache.spark.sql.catalyst.expressions.Alias(a, a.name)()),
        rPlanRaw)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in [${plan.output.map(_.name).mkString(", ")}]"))
    val lt = attr(lPlan, leftTime)
    val rtRaw = attr(rPlan, rightTime)
    // the merge compares raw time values; align the right type to the
    // left's (e.g. timestamp_ntz vs timestamp) so ordering is sound
    val rt: Expression =
      if (rtRaw.dataType == lt.dataType) rtRaw
      else org.apache.spark.sql.catalyst.expressions.Cast(
        rtRaw, lt.dataType, Some(spark.sessionState.conf.sessionLocalTimeZone))
    PlanBridge.ofRows(spark, AsOfJoinPlan(
      lPlan, rPlan,
      leftKeys.map(attr(lPlan, _)), rightKeys.map(attr(rPlan, _)),
      lt, rt,
      rightTiebreaks.map(attr(rPlan, _)),
      forward = direction == "forward",
      tolerance = tolerance,
      keepUnmatched = joinType == "left"))
  }
}
