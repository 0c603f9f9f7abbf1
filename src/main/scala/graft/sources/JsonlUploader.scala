package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SaveMode

import graft.catalog.GraftDatabase

/** JSONL upload (SURVEY.md §2.A13) — the same upload contract as
  * [[CsvUploader]] for the format training corpora actually arrive
  * in. The reference is CSV-only; this extends its pipeline shape —
  * naming + conflict suffixes, `_csv_progress_` bookkeeping, live
  * mid-load updates, error capture — to line-delimited JSON.
  *
  * Type inference is Spark's native JSON schema inference (one
  * distributed sampling pass): JSON already carries types, so the
  * TypeTracker re-implementation the CSV path needs does not apply —
  * longs/doubles/booleans/strings land typed, absent fields are
  * NULL, and nested objects become struct columns (which the CSV
  * engine cannot represent at all). `.gz` members decompress
  * transparently in the reader, like the CSV path.
  */
object JsonlUploader {

  case class UploadResult(
      database: String,
      tableName: String,
      taskId: String,
      rowsDone: Long,
      bytesTodo: Long,
      schema: Seq[(String, String)],
      error: Option[String])

  /** The JSONL extension list for [[GraftDatabase.tableNameForFile]]
    * — one naming authority shared with the CSV path.
    */
  val Extensions: Seq[String] = Seq(".jsonl", ".json")

  def upload(
      db: GraftDatabase,
      jsonlPath: String,
      tableName: Option[String] = None,
      taskId: String = java.util.UUID.randomUUID().toString,
      progressIntervalMs: Long = 250L): UploadResult = {
    val spark = db.spark
    val p = new Path(jsonlPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val base = tableName.getOrElse(
      db.tableNameForFile(jsonlPath, Extensions))
    val resolved = db.resolveTableName(base)
    val started = java.time.Instant.now().toString

    // size lookup inside the error envelope, like the CSV path
    var bytesTodo = 0L
    try {
      bytesTodo = fs.getContentSummary(p).getLength
      db.progress.start(taskId, resolved, bytesTodo, started)
      // line-delimited JSON is byte-splittable like CSV — same
      // adaptive split sizing so the schema-inference pass and the
      // load both use the cluster (r15 OPT; see CsvUploader)
      CsvUploader.withAdaptiveSplits(spark, bytesTodo) {
      val df = spark.read.json(jsonlPath)
      if (df.schema.isEmpty)
        throw new IllegalArgumentException(
          s"no JSON records found under $jsonlPath")
      // _corrupt_record appears when lines fail to parse — surface it
      // as the loud error the CSV path's parse failures produce, not
      // a silently half-typed table
      if (df.schema.fieldNames.contains("_corrupt_record"))
        throw new IllegalArgumentException(
          s"malformed JSON lines under $jsonlPath (corrupt-record " +
            "column present) — fix or drop the bad lines and re-upload")
      new graft.catalog.ProgressReporter(db, taskId, resolved, bytesTodo,
        progressIntervalMs).around {
        db.write(df, resolved, SaveMode.ErrorIfExists)
      }
      // count the WRITTEN parquet (footer-stats scan), not the JSON —
      // the input is read twice total (inference + load), like CSV
      val rows = db.read(resolved).count()
      db.progress.complete(taskId, resolved, bytesTodo, rows)
      UploadResult(db.name, resolved, taskId, rows, bytesTodo,
        df.schema.fields.toSeq.map(f => f.name -> f.dataType.simpleString),
        None)
      }
    } catch {
      case e: Exception =>
        db.progress.fail(taskId, resolved, String.valueOf(e.getMessage))
        UploadResult(db.name, resolved, taskId, 0L, bytesTodo, Nil,
          Some(String.valueOf(e.getMessage)))
    }
  }
}
