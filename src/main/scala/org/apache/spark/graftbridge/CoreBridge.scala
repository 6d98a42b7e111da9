package org.apache.spark.graftbridge

import org.apache.spark.SparkContext

/** Core-side private-API shim (the scheduler twin of
  * [[org.apache.spark.sql.graftbridge.Bridge]]).
  *
  * Spark posts listener events asynchronously; a benchmark that reads a
  * metrics accumulator right after `collect()` races the bus and
  * attributes late task-end events to the NEXT query. `waitUntilEmpty`
  * is `private[spark]`, so the drain lives in an org.apache.spark
  * subpackage — the same access path Spark's own test utilities use.
  */
object CoreBridge {
  def drainListenerBus(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
