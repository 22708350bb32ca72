package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** `SparkContext.listenerBus.waitUntilEmpty()` is `private[spark]`;
  * the bench's per-query shuffle-volume accounting needs a drained bus
  * before reading its byte counter, or a query's trailing stage events
  * would be attributed to the next query (same re-export idiom as
  * [[ColumnBridge]] / [[PlanBridge]]).
  */
object ListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
