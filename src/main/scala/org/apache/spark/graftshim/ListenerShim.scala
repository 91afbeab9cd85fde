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
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
