package org.apache.spark

/** Test-only bridge into `private[spark]` listener internals: the
  * QueryExecutionListener bus is async, so plan-watching specs must
  * drain it before asserting (same role as GraftBridge for Column).
  */
object GraftTestBridge {
  def waitForListeners(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
