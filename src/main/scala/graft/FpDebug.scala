package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan

/** TEMP diagnostic (round 13): root-cause the q88 HashAggregate 16<->15
  * plan-golden flake. Executes one query solo, then prints every
  * BaseAggregateExec node instance with its canonicalization outcome
  * (success hash vs fallback), so two runs can be diffed to see WHICH
  * canonical group merges or splits.
  */
object FpDebug {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q88_pagerank")
    val sfDir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(name)(spark, sfDir)
    df.collect()
    println("FP: " + graft.core.PlanLint.fingerprint(df))

    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    val fp = df.queryExecution.executedPlan
    def walk(p: SparkPlan, acc: scala.collection.mutable.ArrayBuffer[SparkPlan]): Unit = {
      p match {
        case a: AdaptiveSparkPlanExec => walk(a.executedPlan, acc)
        case s: QueryStageExec        => walk(s.plan, acc)
        case r: ReusedExchangeExec    => acc += r; walk(r.child, acc)
        case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
          acc += im
          walk(im.relation.cachedPlan, acc)
        case other => acc += other
      }
      p.children.foreach(walk(_, acc))
      p.subqueries.foreach(walk(_, acc))
    }
    val acc = scala.collection.mutable.ArrayBuffer.empty[SparkPlan]
    walk(fp, acc)
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
          case al: org.apache.spark.sql.catalyst.expressions.Alias
            if remap.contains(al.exprId) =>
            org.apache.spark.sql.catalyst.expressions.Alias(al.child, al.name)(
              exprId = remap(al.exprId).exprId, qualifier = al.qualifier,
              explicitMetadata = al.explicitMetadata,
              nonInheritableMetadataKeys = al.nonInheritableMetadataKeys)
        } }
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
    }
    val aggs = acc.collect { case a: BaseAggregateExec => a }
    println(s"agg instances: ${aggs.size}")
    val groups = scala.collection.mutable.Map.empty[String, Int]
    aggs.foreach { a =>
      val key =
        try {
          val c = unwrap(a).canonicalized
          "OK:" + c.semanticHash()
        } catch { case scala.util.control.NonFatal(e) =>
          "FALLBACK(" + e.getClass.getSimpleName + "):" + System.identityHashCode(a)
        }
      groups(key) = groups.getOrElse(key, 0) + 1
      println(f"  ${a.nodeName}%-22s $key  modes=${a.aggregateExpressions.map(_.mode).distinct.mkString("/")} groupBy=${a.groupingExpressions.map(_.sql).mkString(",").take(60)} aggExprs=${a.aggregateExpressions.map(_.sql).mkString(";").take(100)}")
    }
    println(s"distinct canonical agg groups: ${groups.size}")
    // dump the canonical trees of the two outdeg-final groups to see
    // what context leaks into the canonical form
    val byKey = scala.collection.mutable.Map.empty[String, SparkPlan]
    aggs.foreach { a =>
      try {
        val c = unwrap(a).canonicalized
        val key = "OK:" + c.semanticHash()
        if (!byKey.contains(key)) byKey(key) = c
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    // auto-diff: groups with the same local signature (name/modes/
    // grouping/aggExprs) but different canonical hashes — print trees
    val sigOf = scala.collection.mutable.Map.empty[String, scala.collection.mutable.LinkedHashSet[String]]
    aggs.foreach { a =>
      try {
        val c = unwrap(a).canonicalized
        val key = "OK:" + c.semanticHash()
        val sig = a.nodeName + "|" + a.aggregateExpressions.map(_.mode).distinct.mkString("/") +
          "|" + a.groupingExpressions.map(_.sql).mkString(",") +
          "|" + a.aggregateExpressions.map(_.sql).mkString(";")
        sigOf.getOrElseUpdate(sig, scala.collection.mutable.LinkedHashSet.empty) += key
      } catch { case scala.util.control.NonFatal(_) => () }
    }
    sigOf.foreach { case (sig, keys) =>
      if (keys.size > 1) {
        println(s"===== SPLIT signature: $sig -> ${keys.size} canonical groups =====")
        keys.foreach { k =>
          println(s"--- $k ---")
          println(byKey(k).treeString.take(3000))
        }
      }
    }
    spark.stop()
  }
}
