package org.apache.spark

/** Bridge to the `private[spark]` listener bus — needed because
  * `QueryExecutionListener` events are delivered ASYNCHRONOUSLY: an
  * action that completed before a listener registered can still have
  * its event dispatched after registration. Draining the bus at a
  * known point makes "register after the eager jobs" mean what it
  * says (graft.CacheHygiene). Lives in the spark package for
  * visibility only; no internals are modified.
  */
object GraftListenerBridge {
  /** Block until all currently-queued listener events have been
    * delivered, or the timeout elapses (best effort — a timeout just
    * means the caller keeps the tiny premature-release window).
    * Interruption is preserved for the caller; fatal errors are not
    * swallowed.
    */
  def drainListenerBus(sc: SparkContext, timeoutMs: Long = 5000L): Unit =
    try sc.listenerBus.waitUntilEmpty(timeoutMs)
    catch {
      case _: java.util.concurrent.TimeoutException => ()
      case _: InterruptedException => Thread.currentThread().interrupt()
    }
}
