package org.apache.spark.sql.graftbridge

/** Bridge to the private[spark] listener bus: plan-evidence mains
  * capture executed plans via QueryExecutionListener, whose events
  * post asynchronously — draining the bus makes "every execution so
  * far is captured" deterministic. Measurement-only scaffolding. */
object ListenerBridge {
  def drain(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
