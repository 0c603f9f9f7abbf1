package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Release persisted intermediates without leaking them for the
  * session lifetime (operators return lazy DataFrames, so they cannot
  * unpersist before the caller's action has actually run).
  *
  * [[unpersistAfterUse]] registers a QueryExecutionListener that
  * drops the cache entry after the FIRST completed action whose plan
  * contains the cached frame, then unregisters itself. Long-lived
  * sessions (notebooks, Verify dumps) thus hold at most one in-flight
  * cached intermediate per operator call instead of accumulating one
  * per invocation. Re-running the same returned DataFrame after its
  * first action recomputes instead of hitting cache — correct, just
  * cold; callers that want repeated fast actions should persist the
  * RESULT themselves.
  */
object CacheHygiene {

  /** Arrange for `cached` (already persisted by the caller) to be
    * unpersisted after the next completed action that consumes it.
    * Returns `cached` for chaining.
    *
    * Listener events are delivered asynchronously, so an eager job
    * the caller ran BEFORE this call (the dedup rarity sketch, a
    * bloom build) could otherwise have its completion event arrive
    * after registration and release the cache prematurely — the bus
    * is drained first so registration is a real happens-after fence.
    */
  def unpersistAfterUse(cached: DataFrame): DataFrame = {
    org.apache.spark.GraftListenerBridge.drainListenerBus(
      cached.sparkSession.sparkContext)
    val lm = cached.sparkSession.listenerManager
    val target = cached.queryExecution.analyzed
    val listener = new QueryExecutionListener {
      private def maybeRelease(qe: QueryExecution): Unit = {
        val consumed =
          try qe.analyzed.exists(_.sameResult(target))
          catch { case _: Throwable => false }
        if (consumed) {
          cached.unpersist(blocking = false)
          lm.unregister(this)
        }
      }
      override def onSuccess(funcName: String, qe: QueryExecution,
          durationNs: Long): Unit = maybeRelease(qe)
      override def onFailure(funcName: String, qe: QueryExecution,
          exception: Exception): Unit = maybeRelease(qe)
    }
    lm.register(listener)
    cached
  }
}
