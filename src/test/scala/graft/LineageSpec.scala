package graft

import graft.ext.Lineage
import org.apache.spark.sql.functions._

/** Pins [[Lineage.checkpointObserved]] — the fused checkpoint+witness
  * primitive every iterative loop's convergence check rides on: the
  * observed metric must be computed during the checkpoint's own
  * materialization job (not a separate scan), must equal the plain
  * aggregate, and the returned frame must be a true materialized
  * checkpoint (LogicalRDD leaves, freeable blocks).
  */
class LineageSpec extends SparkSpec {

  test("checkpointObserved: metrics equal plain aggregates, frame unchanged") {
    import spark.implicits._
    val df = (1L to 1000L).toDF("v").repartition(7)
    val (ck, m, free) = Lineage.checkpointObserved(df,
      sum(col("v")).as("s"), count(lit(1)).as("n"))
    assert(m("s") == 500500L && m("n") == 1000L)
    // the frame is the same data, now backed by a materialized RDD
    assert(ck.agg(sum(col("v"))).head().getLong(0) == 500500L)
    assert(ck.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l }.nonEmpty,
      "checkpointObserved must return a checkpointed (LogicalRDD) frame")
    free()
  }

  test("checkpointObserved: empty frame yields SQL aggregate semantics") {
    import spark.implicits._
    val df = Seq.empty[Long].toDF("v")
    val (ck, m, free) = Lineage.checkpointObserved(df,
      sum(col("v")).as("s"), count(lit(1)).as("n"))
    assert(m("s") == null && m("n") == 0L)
    assert(ck.isEmpty)
    free()
  }

  test("checkpointObserved: decimal sum matches the CC labelSum form") {
    import spark.implicits._
    val df = Seq(3L, 1L, 2L).toDF("cluster_id")
    val (_, m, free) = Lineage.checkpointObserved(df,
      sum(col("cluster_id").cast("decimal(38,0)")).as("s"))
    assert(m("s").asInstanceOf[java.math.BigDecimal].longValueExact() == 6L)
    free()
  }
}
