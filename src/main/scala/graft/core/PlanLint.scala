package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{CoalesceExec, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.execution.window.WindowExec

/** Executed-plan anti-pattern lint: the failure modes that are
  * invisible at test scale but fatal on a 1000-executor cluster,
  * detected on the FINAL (post-AQE) physical plan so a refactor or a
  * new operator cannot silently reintroduce one. Used by the PlanSpec
  * full-surface sweep (every SparkEntry query) and by the PlanAudit
  * dev main.
  *
  * Why each kind is on the list:
  *  - `cartesian`: CartesianProductExec is an all-pairs shuffle-less
  *    NxM loop over two UNbroadcast inputs — O(corpus^2) at scale.
  *  - `global-window`: a Window with an empty PARTITION BY moves the
  *    entire input through ONE task (Spark plans it as an Exchange
  *    SinglePartition); fine over a 9-row digit table, fatal over a
  *    corpus frame.
  *  - `single-partition-sort`: a SortExec fed by a SinglePartition
  *    exchange (coalesce(1)/repartition(1) upstream) — a global
  *    range sort is distributed and fine; a one-task sort is not.
  *  - `coalesce-1`: CoalesceExec(1) in a RETURNED frame funnels the
  *    result through one task (single-file writes inside query
  *    bodies never appear in the returned plan, so any hit here is a
  *    real result-path funnel).
  *  - `bnlj`: BroadcastNestedLoopJoin is an O(|left| x |broadcast|)
  *    per-row loop — sound only when the broadcast side is bounded
  *    metadata (theta-join gates, <=128-row constant frames), so
  *    every use must be declared.
  *
  * The traversal unwraps what TreeNode.collect cannot see: the AQE
  * wrapper's final plan, materialized query stages (LeafExecNodes
  * holding the real stage under `plan`), reused exchanges, cached
  * relations, and subquery plans.
  */
object PlanLint {
  final case class Violation(query: String, kind: String, node: String) {
    override def toString = s"$query: $kind [$node]"
  }

  /** Final physical plan, AQE-resolved. The frame must already be
    * materialized (collect/write) or AQE returns the initial plan.
    */
  def finalPlan(df: DataFrame): SparkPlan =
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p                        => p
    }

  /** Every node reachable from `p`, descending through AQE/stage/
    * reuse/cache wrappers and subqueries (dedup'd by identity to cut
    * reused-exchange cycles).
    */
  def allNodes(p: SparkPlan): Seq[SparkPlan] = {
    val seen = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[SparkPlan, java.lang.Boolean]())
    val out = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    def walk(n: SparkPlan): Unit = if (seen.add(n)) {
      out += n
      val extra: Seq[SparkPlan] = n match {
        case a: AdaptiveSparkPlanExec  => Seq(a.executedPlan)
        case s: QueryStageExec         => Seq(s.plan)
        case r: ReusedExchangeExec     => Seq(r.child)
        case c: InMemoryTableScanExec  => Seq(c.relation.cachedPlan)
        case _                         => Seq.empty
      }
      (n.children ++ extra ++ n.subqueries).foreach(walk)
    }
    walk(p)
    out.toSeq
  }

  /** STRUCTURAL single-partition only — the plan REQUIRED all rows on
    * one task (global window/limit funnel, coalesce(1)). AQE
    * coalescing a tiny test-scale shuffle down to one partition shows
    * up as numPartitions == 1 too, but its partitioning is NOT the
    * SinglePartition distribution and it disappears at real scale, so
    * testing numPartitions would flood the lint with scale artifacts
    * (observed: ~90 false hits at sf0.001).
    */
  private def isSinglePartition(p: SparkPlan): Boolean =
    p.outputPartitioning == org.apache.spark.sql.catalyst.plans.physical.SinglePartition

  /** Plan-SHAPE fingerprint of an already-executed frame: exchange
    * counts, join-strategy multiset (with join type), aggregate-node
    * multiset, and sort count. [[lint]] checks anti-pattern ABSENCE;
    * this locks the intended shape — a refactor that silently flips a
    * broadcast join to sort-merge, or adds an Exchange to a bucketed
    * path, changes the fingerprint and fails FullPlanSpec's golden
    * diff even though no lint rule trips.
    *
    * Cache-invariant by construction: [[allNodes]] descends THROUGH
    * InMemoryTableScan wrappers into the cached plan and the wrapper
    * itself is not counted, so whether a deterministic fragment
    * happened to be served from cache does not move the fingerprint.
    */
  /** ALL fingerprint counts are DISTINCT CANONICALIZED nodes, not node
    * instances: AQE's exchange reuse is timing-dependent for two
    * identical stages submitted in parallel (whichever materializes
    * first gets reused by the other — or neither, if both were already
    * running), so instance counts flap run-to-run on self-joining
    * plans (q257's twin window branches measured 2 vs 4 exchanges
    * across solo runs of identical code). And reuse replaces the
    * duplicate stage's WHOLE subtree, so every operator below a
    * racily-reused exchange — partial aggregates, sorts, joins —
    * flaps with it (q88 references its `nodes.distinct()` frame five
    * times and measured HashAggregate*17 vs *20 across solo runs).
    * Distinct-canonical counts are what the plan COMPUTES — reuse only
    * changes how often the same computation is paid, and that is AQE's
    * racy business, not the plan shape this golden locks.
    */
  def fingerprint(df: DataFrame): String = {
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ShuffleExchangeExec}
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    val nodes = allNodes(finalPlan(df))
    // Dedup must be blind to AQE's stage structure: whether a subtree
    // was materialized as its own stage, reused from a twin stage, or
    // inlined is a RUNTIME race (parallel stage submission), and a
    // node's canonical form differs across those shapes (a
    // ReusedExchange child canonicalizes unlike the original exchange
    // it references — q88 measured BroadcastHashJoin:Inner*7 vs *8
    // across solo JVMs from exactly this). Unwrap every stage/reuse
    // wrapper to the plan it stands for BEFORE canonicalizing, so two
    // occurrences of one computation always canonicalize equal.
    // ReusedExchangeExec substitution must REMAP the substituted
    // subtree's output ExprIds onto the reuse node's own output ids:
    // the reusing parent's expressions reference r.output, and Spark's
    // positional exprId normalization can only line them up when the
    // child it normalizes against actually exposes those ids. Without
    // the remap, a parent over a reused exchange canonicalizes into a
    // DIFFERENT group than its non-reused twin — and since AQE's reuse
    // decision is a stage-submission race, the distinct-canonical
    // counts flapped run-to-run (the q88 HashAggregate 16<->15 golden
    // flake of rounds 10-12: 4 identical outdeg finals split 1+3 by
    // whether their exchange was reused).
    def unwrap(p: SparkPlan): SparkPlan = p.transformUp {
      case s: QueryStageExec        => unwrap(s.plan)
      case r: ReusedExchangeExec    =>
        val c = unwrap(r.child)
        val remap = c.output.zip(r.output).collect {
          case (from, to) if from.exprId != to.exprId => from.exprId -> to
        }.toMap
        if (remap.isEmpty) c
        else c.transformUp { case n => n.transformExpressions {
          case a: org.apache.spark.sql.catalyst.expressions.Attribute
            if remap.contains(a.exprId) => remap(a.exprId)
          // the producing side of an output id is usually an Alias —
          // its exprId must move with the references or the subtree is
          // left with dangling ids ("!Exchange hashpartitioning(...)")
          // that canonicalize per-instance
          case al: org.apache.spark.sql.catalyst.expressions.Alias
            if remap.contains(al.exprId) =>
            org.apache.spark.sql.catalyst.expressions.Alias(al.child, al.name)(
              exprId = remap(al.exprId).exprId, qualifier = al.qualifier,
              explicitMetadata = al.explicitMetadata,
              nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
        } }
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    }
    // some canonicalized copies detach from the session and NPE on
    // lazy state (observed: OneRowRelationExec under a canonicalized
    // parent) — fall back to instance identity for that node, which
    // only ever OVER-counts back to the pre-dedup behavior
    def canon(p: SparkPlan): SparkPlan =
      try unwrap(p).canonicalized
      catch { case scala.util.control.NonFatal(_) => p }
    val shuffles = scala.collection.mutable.Set.empty[SparkPlan]
    val bcasts = scala.collection.mutable.Set.empty[SparkPlan]
    val sorts = scala.collection.mutable.Set.empty[SparkPlan]
    val joinNodes = scala.collection.mutable.Set.empty[SparkPlan]
    val aggNodes = scala.collection.mutable.Set.empty[SparkPlan]
    nodes.foreach {
      case s: ShuffleExchangeExec   => shuffles += canon(s)
      case b: BroadcastExchangeExec => bcasts += canon(b)
      case s: SortExec              => sorts += canon(s)
      case c: CartesianProductExec  => joinNodes += canon(c)
      case j: BaseJoinExec          => joinNodes += canon(j)
      case a: BaseAggregateExec     => aggNodes += canon(a)
      case _                        => ()
    }
    val joins = joinNodes.toSeq.map {
      case j: BaseJoinExec => s"${j.nodeName}:${j.joinType}"
      case _               => "CartesianProduct"
    }
    val aggs = aggNodes.toSeq.map(_.nodeName)
    def ms(xs: Seq[String]) =
      if (xs.isEmpty) "-"
      else xs.groupBy(identity).toSeq.sortBy(_._1)
        .map { case (k, v) => s"$k*${v.size}" }.mkString(",")
    s"shuffle=${shuffles.size} broadcast=${bcasts.size} sort=${sorts.size} " +
      s"joins=${ms(joins)} aggs=${ms(aggs)}"
  }

  /** Lint one ALREADY-EXECUTED frame. Returns every violation; the
    * caller subtracts its reviewed whitelist.
    */
  def lint(query: String, df: DataFrame): Seq[Violation] = {
    val nodes = allNodes(finalPlan(df))
    nodes.flatMap {
      case n: CartesianProductExec =>
        Some(Violation(query, "cartesian", n.nodeName))
      case w: WindowExec if w.partitionSpec.isEmpty =>
        Some(Violation(query, "global-window", w.nodeName))
      case s: SortExec if isSinglePartition(s.child) =>
        Some(Violation(query, "single-partition-sort", s.nodeName))
      case c: CoalesceExec if c.numPartitions == 1 =>
        Some(Violation(query, "coalesce-1", c.nodeName))
      case j: BroadcastNestedLoopJoinExec =>
        Some(Violation(query, "bnlj", j.nodeName))
      case _ => None
    }
  }
}
