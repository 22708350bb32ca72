package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic block lifecycle for iterative-loop localCheckpoints.
  *
  * `Dataset.unpersist()` clears CacheManager entries but NOT the RDD
  * blocks a `localCheckpoint` persisted — those otherwise wait for
  * driver GC + ContextCleaner, so a long loop accumulates every
  * superseded round's blocks for the session's lifetime (the same
  * persist-leak class that distorted the round-2 bench). The fix is a
  * release handle with EXACT attribution: the checkpointed frame's own
  * `LogicalRDD` leaves are unpersisted, never a diff of global state —
  * concurrent persists elsewhere (parallel test suites, other queries)
  * are untouched.
  */
object Lineage {

  /** Eager localCheckpoint plus a handle that frees ITS blocks.
    * Call the handle once the frame is superseded (the next round's
    * checkpoint has materialized and every read of this one is done);
    * never call it on a frame that escapes to the caller.
    */
  def checkpoint(df: DataFrame): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint(true)
    val rdds = ck.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    (ck, () => rdds.foreach(_.unpersist(blocking = true)))
  }

  /** LAZY localCheckpoint: materializes as a side effect of the
    * CALLER'S first action instead of a dedicated job here — one fewer
    * full pass + job launch for the two-pass rank/cumsum shape, whose
    * offsets collect follows immediately and IS that first action.
    * Determinism is identical to the eager form: lineage is truncated
    * either way, so a re-execution that could re-sample range
    * boundaries is impossible — an evicted block fails the job loudly
    * rather than recomputing differently. Only for callers whose first
    * action runs before any other use of the frame; iterative loops
    * keep the eager form (their free-handle lifecycle needs the
    * materialization point explicit).
    */
  def checkpointLazy(df: DataFrame): (DataFrame, () => Unit) = {
    val ck = df.localCheckpoint(false)
    val rdds = ck.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    (ck, () => rdds.foreach(_.unpersist(blocking = true)))
  }

  /** Eager localCheckpoint with OBSERVED aggregate metrics riding the
    * materialization job itself (optimization guide §1/§2: iterative
    * loops paid TWO job launches per round — one to checkpoint the
    * round's frame, one to scan the just-written blocks for the
    * convergence witness. `Dataset.observe` attaches the witness
    * aggregates to the checkpoint's own execution, so each round is
    * ONE job and the convergence value arrives with it — across the
    * CC / label-prop / k-core / star loops this halves per-round job
    * count with bit-identical frames and witnesses).
    *
    * Returns (checkpointed frame, metric values by name, free handle).
    * Metrics must be named aggregate expressions (`sum(c).as("s")`).
    * An empty input frame yields SQL aggregate semantics (sum -> null,
    * count -> 0) — callers handle null exactly as they handled the
    * old separate-aggregate result.
    */
  def checkpointObserved(df: DataFrame, metrics: Column*): (DataFrame, Map[String, Any], () => Unit) = {
    val obs = Observation()
    val ck = df.observe(obs, metrics.head, metrics.tail: _*).localCheckpoint(true)
    val rdds = ck.queryExecution.analyzed.collect { case l: LogicalRDD => l.rdd }
    (ck, obs.get, () => rdds.foreach(_.unpersist(blocking = true)))
  }
}
