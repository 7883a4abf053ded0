package org.apache.spark.sql.graftshim

import org.apache.spark.SparkContext

/**
 * Accessor for `SparkContext.listenerBus` (private[spark]) so metric
 * listeners can be DRAINED deterministically after a node finishes —
 * listener delivery is asynchronous, and reading aggregates without a
 * drain races the last task-end events. Same package-placement
 * technique as [[ColumnShim]].
 */
object ListenerShim {
  def drain(sc: SparkContext, timeoutMs: Long = 10000L): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMs)
}
