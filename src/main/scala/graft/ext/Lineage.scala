package graft.ext

import org.apache.spark.sql.DataFrame
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
}
