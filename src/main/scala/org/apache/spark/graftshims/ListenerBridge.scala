/*
 * SparkContext.listenerBus is private[spark]; the bench harness needs to
 * drain it between queries so per-query stage metrics attribute to the
 * query that ran them, not the next one. This object sits inside the
 * org.apache.spark package hierarchy so it can legally call it.
 */
package org.apache.spark.graftshims

import org.apache.spark.SparkContext

object ListenerBridge {
  /** Block until all queued listener events have been delivered. */
  def waitUntilEmpty(sc: SparkContext, timeoutMillis: Long): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMillis)
    catch { case _: Throwable => () } // metrics are best-effort; never fail bench
}
