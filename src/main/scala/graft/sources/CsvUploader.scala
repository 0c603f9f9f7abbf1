package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.catalog.GraftDatabase

/** End-to-end CSV upload (SURVEY.md §2.A10): the Spark-native
  * re-expression of the reference's whole pipeline
  * (datasette_upload_csvs/__init__.py:70-241):
  *
  *   sniff charset (≤2 MiB, driver-side) → distributed CSV parse
  *   (header row, all-string schema) → one-pass distributed type
  *   inference → typed cast → parquet table in the target database,
  *   with `_csv_progress_` bookkeeping and error capture.
  *
  * Differences from the reference, by design: the decode+parse is a
  * splittable distributed scan instead of a single-threaded
  * csv.reader loop; the "insert then transform types" two-step
  * becomes infer-then-cast-on-write (the cast pipelines into the
  * write, so the data is read twice total — once for inference, once
  * for the load — regardless of size); incremental per-100-row
  * progress maps to per-microbatch progress in the streaming variant
  * (graft.streaming.StreamingCsvIngest).
  */
object CsvUploader {

  case class UploadResult(
      database: String,
      tableName: String,
      taskId: String,
      rowsDone: Long,
      bytesTodo: Long,
      encoding: String,
      types: Seq[(String, TypeInference.InferredType)],
      error: Option[String])

  def upload(
      db: GraftDatabase,
      csvPath: String,
      tableName: Option[String] = None,
      taskId: String = java.util.UUID.randomUUID().toString,
      sniffBytes: Int = EncodingDetector.DefaultSniffBytes): UploadResult = {
    val spark = db.spark
    val p = new Path(csvPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytesTodo = fs.getContentSummary(p).getLength
    val base = tableName.getOrElse(db.tableNameForFile(csvPath))
    val resolved = db.resolveTableName(base)
    val started = java.time.Instant.now().toString

    db.progress.start(taskId, resolved, bytesTodo, started)
    try {
      val encoding = detectEncoding(spark, csvPath, sniffBytes)
      val raw = readRaw(spark, csvPath, encoding)
      val (types, rows) = TypeInference.inferWithCount(raw)
      val typed = TypeInference.applyTypes(raw, types)
      db.write(typed, resolved, SaveMode.ErrorIfExists)
      db.progress.complete(taskId, resolved, bytesTodo, rows)
      UploadResult(db.name, resolved, taskId, rows, bytesTodo, encoding,
        types, None)
    } catch {
      case e: Exception =>
        db.progress.fail(taskId, resolved, String.valueOf(e.getMessage))
        UploadResult(db.name, resolved, taskId, 0L, bytesTodo, "", Nil,
          Some(String.valueOf(e.getMessage)))
    }
  }

  /** Sniff the first file of a path (file or directory of parts). */
  private def detectEncoding(spark: SparkSession, csvPath: String,
      sniffBytes: Int): String = {
    val p = new Path(csvPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val target =
      if (fs.getFileStatus(p).isDirectory) {
        val parts = fs.listStatus(p).filter(_.isFile)
          .map(_.getPath).filterNot(_.getName.startsWith("_")).sortBy(_.getName)
        if (parts.isEmpty) p else parts.head
      } else p
    EncodingDetector.detect(spark, target.toString, sniffBytes)
  }

  /** Distributed parse with an all-string schema — inference is ours
    * (§A3), never the CSV reader's.
    */
  private def readRaw(spark: SparkSession, csvPath: String,
      encoding: String): DataFrame =
    spark.read
      .option("header", "true")
      .option("encoding", encoding)
      .option("inferSchema", "false")
      .csv(csvPath)
}
