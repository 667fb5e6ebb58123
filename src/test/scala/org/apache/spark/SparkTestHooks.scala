package org.apache.spark

/** Test-only bridge into `private[spark]` internals.
  *
  * The listener bus delivers task-end events asynchronously; specs that
  * assert on task metrics need a deterministic "all events delivered"
  * barrier instead of wall-clock polling. `LiveListenerBus
  * .waitUntilEmpty` is exactly that barrier but is `private[spark]`, so
  * this object lives in the `org.apache.spark` package (test sources
  * only) to expose it.
  */
object SparkTestHooks {
  /** Block until every queued listener event has been delivered. */
  def waitUntilListenerBusEmpty(sc: SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
