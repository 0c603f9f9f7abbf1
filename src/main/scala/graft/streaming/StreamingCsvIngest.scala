package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}
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
  * `foreachBatch` appends to the destination table and writes a
  * progress row with cumulative counts; new CSV files dropped into
  * the directory are picked up automatically. At scale this is the
  * continuous-ingest topology: file-arrival-driven, per-batch
  * exactly-once appends, state bounded by the file index.
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

    // Resume-aware cumulative count: a restarted query continues the
    // task's progress rather than resetting it (the checkpoint already
    // guarantees each file is appended exactly once).
    val already: Long =
      if (db.progress.exists)
        db.progress.current().filter(col("id") === taskId)
          .select(max(col("rows_done"))).collect()
          .headOption.flatMap(r => Option(r.get(0)).map(_ => r.getLong(0)))
          .getOrElse(0L)
      else 0L
    if (already == 0L) db.progress.start(taskId, table, bytesTodo = 0L)
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
        typed.write.mode("append").parquet(db.tablePath(table))
        val total = counter.addAndGet(batch.count())
        db.progress.update(taskId, table, bytesTodo = 0L, bytesDone = 0L,
          rowsDone = total, seq = batchId + 1)
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
