package org.apache.spark.graft

import org.apache.spark.SparkContext

/** Test-only access to `private[spark]` members (the same trick as
  * `org.apache.spark.sql.graft.ColumnBridge` in main sources). */
object SparkTestBridge {
  /** Block until every queued listener event has been delivered — task
    * metrics arrive asynchronously, so a spec reading them right after an
    * action would race the bus. */
  def drainListenerBus(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
