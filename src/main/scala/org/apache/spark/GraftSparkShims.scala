package org.apache.spark

/** Core-side `private[spark]` bridge (sibling of
  * org.apache.spark.sql.GraftSqlShims): drain the listener bus so
  * metrics listeners observe every event of a just-finished action
  * before we read their accumulators.
  */
object GraftSparkShims {
  def waitUntilListenerBusEmpty(sc: SparkContext, timeoutMillis: Long = 30000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
