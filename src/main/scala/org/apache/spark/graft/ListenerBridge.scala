package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Access to `private[spark]` members for the benchmark tools (the same
  * trick as `org.apache.spark.sql.graft.ColumnBridge`). */
object ListenerBridge {
  /** Block until every queued listener event has been delivered — stage
    * metrics arrive asynchronously, so reading an accumulating listener
    * right after an action would race the bus. */
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
