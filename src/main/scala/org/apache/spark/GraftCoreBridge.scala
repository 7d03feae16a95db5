package org.apache.spark

/** Bridge into `private[spark]` SparkContext internals (the sql-side
  * sibling is [[org.apache.spark.sql.GraftBridge]]). The listener bus is
  * async: measurement tools that read SparkListener counters after an
  * action must drain the bus first or risk silently undercounting an
  * arm. Contains no copied Spark code.
  */
object GraftCoreBridge {
  /** Block until every already-posted listener event has been processed. */
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
