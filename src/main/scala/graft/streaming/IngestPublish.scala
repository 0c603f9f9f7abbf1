package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.catalog.GraftDatabase

/** Shared exactly-once batch publish + resume-aware progress for the
  * streaming ingest paths (CSV and JSONL — SURVEY §2.A9/G2).
  *
  * `foreachBatch` is only at-least-once (a batch replays if the write
  * succeeded but the checkpoint commit didn't), so a blind append
  * would duplicate rows. Each batch stages to a scratch dir and
  * renames into the table under a batchId-unique file prefix, with
  * any files from an earlier attempt of the same batch deleted first
  * — a replay converges to exactly one copy no matter where the
  * previous attempt died. Progress rows are keyed seq=batchId+1 and
  * replayed batches at-or-below the resume point don't re-count.
  */
private[graft] object IngestPublish {

  /** Resume state for `taskId`: (max published seq, cumulative-row
    * counter primed with the recorded rows_done). Starts the progress
    * row if the task has never run.
    */
  def resumeState(db: GraftDatabase, taskId: String,
      table: String): (Long, java.util.concurrent.atomic.AtomicLong) = {
    val (maxSeqAtStart, already): (Long, Long) =
      if (db.progress.exists)
        db.progress.current().filter(col("id") === taskId)
          .select(col("seq"), col("rows_done")).collect()
          .headOption.map(r => (r.getLong(0), r.getLong(1)))
          .getOrElse((-1L, 0L))
      else (-1L, 0L)
    if (maxSeqAtStart < 0L) db.progress.start(taskId, table, bytesTodo = 0L)
    (maxSeqAtStart,
      new java.util.concurrent.atomic.AtomicLong(already))
  }

  /** Publish one (already typed) micro-batch idempotently and bump
    * progress unless the batch is a replay.
    */
  def publishBatch(db: GraftDatabase, table: String, taskId: String,
      typed: DataFrame, batchId: Long, maxSeqAtStart: Long,
      counter: java.util.concurrent.atomic.AtomicLong): Unit = {
    val n = publishFiles(db, table, typed, batchId)
    if (batchId + 1 > maxSeqAtStart) {
      val total = counter.addAndGet(n)
      db.progress.update(taskId, table, bytesTodo = 0L, bytesDone = 0L,
        rowsDone = total, seq = batchId + 1)
    }
  }

  /** The progress-free core: stage `df` and rename its files into
    * `table` under a batchId-unique prefix, deleting any files from
    * an earlier attempt of the same batch first — a replay converges
    * to exactly one copy. Returns the staged row count (parquet
    * footer scan, no source recompute). Shared by ingest progress
    * publishing and the index-maintenance appends (D10).
    */
  def publishFiles(db: GraftDatabase, table: String, df: DataFrame,
      batchId: Long): Long = {
    val spark = df.sparkSession
    val dest = new Path(db.tablePath(table))
    val staging = new Path(db.tablePath(s"_staging_$table"),
      batchId.toString)
    val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(staging, true)
    df.write.mode("overwrite").parquet(staging.toString)
    val n = spark.read.parquet(staging.toString).count()
    moveUnderPrefix(fs, staging, dest, batchId)
    fs.delete(staging, true)
    n
  }

  /** The exactly-once move core, ONE definition (r15 review: a
    * verbatim copy lived in StreamingTextIndex, the divergence class
    * the ServedArtifact consolidation already documented): delete any
    * earlier attempt's files under the batch's zero-padded prefix,
    * then rename every staged data file in — with the rename result
    * CHECKED. Hadoop rename reports failure by returning `false`
    * (the renameOrThrow rule at GraftDatabase.scala): unchecked, a
    * failed rename silently drops part of a batch while the
    * checkpoint commits and the batch never replays — data loss
    * reported as success. Throwing instead fails the micro-batch;
    * the restart replays it and the earlier-attempt delete converges
    * to exactly one copy.
    */
  private[streaming] def moveUnderPrefix(
      fs: org.apache.hadoop.fs.FileSystem, staging: Path, dest: Path,
      batchId: Long): Unit = {
    val prefix = f"b$batchId%019d-"
    fs.mkdirs(dest)
    fs.listStatus(dest).filter(_.getPath.getName.startsWith(prefix))
      .foreach(s => fs.delete(s.getPath, false))
    fs.listStatus(staging)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .foreach { f =>
        val to = new Path(dest, prefix + f.getPath.getName)
        if (!fs.rename(f.getPath, to))
          throw new java.io.IOException(
            s"publish rename failed: ${f.getPath} -> $to")
      }
  }
}
