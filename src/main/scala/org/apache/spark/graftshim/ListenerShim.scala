package org.apache.spark.graftshim

import org.apache.spark.SparkContext

/**
 * Bench-side bridge to the `private[spark]` listener bus (the same minimal-
 * shim technique as sql.graftshim.ColumnShim): block until every queued
 * listener event is delivered, so a per-query metrics snapshot taken right
 * after an action includes all of that job's task-end events instead of
 * whatever happened to drain before the read.
 */
object ListenerShim {
  /** Best-effort: a congested bus (CPU-steal storm) makes waitUntilEmpty hit
    * Spark's 10 s default and throw TimeoutException. Telemetry must never be
    * able to fail the bench run — a slightly stale metrics delta is acceptable,
    * a dead run is not — so swallow and continue.
    */
  def drain(sc: SparkContext): Unit =
    try sc.listenerBus.waitUntilEmpty()
    catch { case _: Throwable => () }
}
