package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.catalog.GraftDatabase
import graft.sources.{CsvUploader, EncodingDetector, TypeInference}

/** Streaming CSV ingest (SURVEY.md §2.A9/G2): the Spark-native
  * re-expression of the reference's incremental load loop
  * (datasette_upload_csvs/__init__.py:172-198 — parse rows, insert
  * every 100, update `_csv_progress_` every 10).
  *
  * Micro-batches take the place of the 100-row insert batches: each
  * `foreachBatch` publishes to the destination table and writes a
  * progress row with cumulative counts; new CSV files dropped into
  * the directory are picked up automatically. At scale this is the
  * continuous-ingest topology: file-arrival-driven, state bounded by
  * the file index.
  *
  * Exactly-once publish: `foreachBatch` is only at-least-once (a
  * batch replays if the write succeeded but the checkpoint commit
  * didn't), so a blind append would duplicate rows. Each batch is
  * instead staged to a scratch dir and renamed into the table under a
  * batchId-unique file prefix, with any files from an earlier attempt
  * of the same batch deleted first — a replay therefore converges to
  * exactly one copy of the batch no matter where the previous attempt
  * died. Progress rows are keyed seq=batchId+1 and replayed batches
  * at-or-below the resume point don't re-count.
  */
object StreamingCsvIngest {

  /** Start ingesting `csvDir` into `db.table`. Schema and charset are
    * sniffed from files already present (the reference likewise
    * detects from the first bytes of the upload). Caller drives the
    * query (processAllAvailable / awaitTermination).
    */
  def start(db: GraftDatabase, csvDir: String, table: String,
      taskId: String): StreamingQuery = {
    val spark = db.spark
    val encoding = EncodingDetector.detect(spark, firstFile(spark, csvDir))

    // Static sniff pass: header + type verdicts from what's on disk.
    val staticRaw = spark.read
      .option("header", "true").option("encoding", encoding)
      .option("inferSchema", "false").csv(csvDir)
    val types = TypeInference.infer(staticRaw)
    val stringSchema = StructType(
      staticRaw.columns.map(StructField(_, StringType, nullable = true)))

    // Resume state: a restarted query continues the task's cumulative
    // count, and batches whose seq (= batchId+1) was already recorded
    // are replays — their data is re-published idempotently but not
    // re-counted.
    val (maxSeqAtStart, already): (Long, Long) =
      if (db.progress.exists)
        db.progress.current().filter(col("id") === taskId)
          .select(col("seq"), col("rows_done")).collect()
          .headOption.map(r => (r.getLong(0), r.getLong(1)))
          .getOrElse((-1L, 0L))
      else (-1L, 0L)
    if (maxSeqAtStart < 0L) db.progress.start(taskId, table, bytesTodo = 0L)
    val counter = new java.util.concurrent.atomic.AtomicLong(already)

    spark.readStream
      .option("header", "true").option("encoding", encoding)
      .schema(stringSchema)
      .csv(csvDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", db.tablePath(s"_checkpoint_$table"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        val typed = TypeInference.applyTypes(batch, types)
        val dest = new Path(db.tablePath(table))
        val staging = new Path(db.tablePath(s"_staging_$table"),
          batchId.toString)
        val fs = dest.getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(staging, true)
        typed.write.mode("overwrite").parquet(staging.toString)
        // Row count from the staged parquet (footer metadata scan) —
        // counting `batch` directly would recompute the CSV source.
        val n = spark.read.parquet(staging.toString).count()
        // Idempotent publish: clear any files from an earlier attempt
        // of this batch, then rename the staged files in under a
        // batchId-unique prefix.
        val prefix = f"b$batchId%019d-"
        fs.mkdirs(dest)
        fs.listStatus(dest).filter(_.getPath.getName.startsWith(prefix))
          .foreach(s => fs.delete(s.getPath, false))
        fs.listStatus(staging)
          .filter(_.getPath.getName.endsWith(".parquet"))
          .foreach(f =>
            fs.rename(f.getPath, new Path(dest, prefix + f.getPath.getName)))
        fs.delete(staging, true)
        if (batchId + 1 > maxSeqAtStart) {
          val total = counter.addAndGet(n)
          db.progress.update(taskId, table, bytesTodo = 0L, bytesDone = 0L,
            rowsDone = total, seq = batchId + 1)
        }
      }
      .start()
  }

  private def firstFile(spark: SparkSession, dir: String): String = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st = fs.getFileStatus(p)
    if (st.isDirectory) {
      val files = fs.listStatus(p).filter(_.isFile).map(_.getPath)
        .filterNot(_.getName.startsWith("_")).sortBy(_.getName)
      require(files.nonEmpty, s"no files to sniff in $dir")
      files.head.toString
    } else p.toString
  }
}
