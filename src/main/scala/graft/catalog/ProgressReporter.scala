package graft.catalog

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerTaskEnd}

/** Live progress for the BATCH upload path (SURVEY.md §2.A6).
  *
  * The reference updates `rows_done`/`bytes_done` every 10 rows while
  * its insert loop streams (datasette_upload_csvs/__init__.py:186-190),
  * so a poller watching `_csv_progress_` sees the upload advance.
  * Spark's batch write is one distributed job, not a row loop — the
  * equivalent signal is task-level input metrics: a SparkListener
  * sums `recordsRead`/`bytesRead` of completed tasks of the upload's
  * job group, and a side thread appends a progress row every
  * `intervalMs` while the job runs.
  *
  * Scoping: jobs submitted inside [[around]] (on the calling thread)
  * carry the task's job group; the listener counts only stages of
  * those jobs, so concurrent queries on the session don't pollute the
  * numbers. The flusher thread explicitly CLEARS the job group it
  * inherits (Spark local properties are an InheritableThreadLocal and
  * the thread is spawned inside the group) — so even if a progress
  * append ever runs a Spark job again, it cannot count itself.
  *
  * At scale this is O(tasks) listener callbacks on the driver and one
  * tiny parquet append per interval — no data-path cost at all.
  */
class ProgressReporter(db: GraftDatabase, taskId: String, table: String,
    bytesTodo: Long, intervalMs: Long = 250L) {

  private val spark = db.spark
  private val rowsRead = new AtomicLong(0L)
  private val bytesRead = new AtomicLong(0L)
  private val stages = ConcurrentHashMap.newKeySet[Integer]()
  private val seq = new AtomicLong(0L)
  private val done = new java.util.concurrent.CountDownLatch(1)
  @volatile private var running = false

  private val listener = new SparkListener {
    override def onJobStart(js: SparkListenerJobStart): Unit =
      if (js.properties != null &&
          taskId == js.properties.getProperty("spark.jobGroup.id"))
        js.stageIds.foreach(id => stages.add(id))
    override def onTaskEnd(te: SparkListenerTaskEnd): Unit =
      if (stages.contains(te.stageId) && te.taskMetrics != null) {
        rowsRead.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
        bytesRead.addAndGet(te.taskMetrics.inputMetrics.bytesRead)
      }
  }

  /** Run `body` inside the metrics window. Mid-load counts are
    * approximate (they track the scan feeding the write, like the
    * reference tracks its insert loop); the caller's final
    * `complete()` records the exact totals.
    */
  def around[T](body: => T): T = {
    spark.sparkContext.addSparkListener(listener)
    spark.sparkContext.setJobGroup(taskId, s"graft-upload-$taskId")
    running = true
    val flusher = new Thread({ () =>
      // inherited from the spawning thread — drop it (see scaladoc)
      spark.sparkContext.clearJobGroup()
      var last = 0L
      // Adaptive decay (r15 review): every append is a NEW parquet
      // part-file (the event log is append-only), so a fixed
      // sub-second cadence over a long corpus load accumulates
      // thousands of tiny files in _csv_progress_ — the small-files
      // pathology compact() exists to fight. Short uploads keep the
      // configured cadence (the first appends land at intervalMs);
      // the gap then doubles per append up to a 10 s ceiling, so a
      // 3-hour load leaves ~1k bookkeeping files instead of ~43k
      // while a poller still sees it advance.
      var gapMs = intervalMs
      var lastAppendAt = 0L
      while (running) {
        // Latch-paced, not sleep+interrupt: the latch drops instantly
        // at completion (no residual tick wait), and the thread is
        // never interrupted — an interrupt landing inside the parquet
        // bookkeeping write would kill the stream mid-file
        // (ClosedByInterruptException) and strand a corrupt part.
        done.await(intervalMs, java.util.concurrent.TimeUnit.MILLISECONDS)
        val r = rowsRead.get()
        val nowMs = System.currentTimeMillis()
        if (running && r > 0L && r != last &&
            nowMs - lastAppendAt >= gapMs) {
          last = r
          lastAppendAt = nowMs
          gapMs = math.min(gapMs * 2, math.max(intervalMs, 10000L))
          // A transient FS failure on a bookkeeping row must not kill
          // the flusher (or the upload): drop the tick, try next time.
          try db.progress.update(taskId, table, bytesTodo,
            math.min(bytesRead.get(), bytesTodo), r, seq.incrementAndGet())
          catch { case _: Exception => }
        }
      }
    }: Runnable, s"graft-progress-$taskId")
    flusher.setDaemon(true)
    flusher.start()
    try body
    finally {
      running = false
      done.countDown()
      spark.sparkContext.clearJobGroup()
      spark.sparkContext.removeSparkListener(listener)
      flusher.join(5000)
    }
  }
}
