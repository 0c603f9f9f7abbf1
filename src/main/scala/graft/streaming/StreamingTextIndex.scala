package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.catalog.GraftDatabase
import graft.operators.TextIndex

/** G10: incremental maintenance of the E11–E13 text index AT INGEST
  * (SURVEY.md §2.G) — new documents become searchable as their
  * micro-batch commits, without ever rebuilding the corpus-scale
  * postings. The batch twin's build-once/serve-many lifecycle plus
  * the G2 exactly-once publish discipline:
  *
  * - each micro-batch's postings/lengths are staged as a BUCKETED
  *   write (same term/doc_id bucketing and bucket count as the base
  *   index) and renamed into the artifact under a batchId-unique
  *   file prefix — a foreachBatch replay deletes its earlier
  *   attempt's files first, so retries converge to exactly one copy
  *   (the bucket id rides in the Spark-native `_NNNNN` filename
  *   suffix, which the prefix rename preserves, so the bucketed
  *   scan's exchange elision and bucket pruning keep working over
  *   base + appended files alike);
  * - corpus stats are BATCH-KEYED rows (one per micro-batch, summed
  *   at serve time) — no read-modify-write for a replay to
  *   double-apply;
  * - appended documents must be NEW doc_ids: postings merge by
  *   (term, doc_id) at build time only, so re-ingesting an existing
  *   document is a rebuild's job (`buildIndex` resets all three
  *   artifacts), exactly like the reference's per-table replace.
  *
  * Streaming state is ZERO — every batch is a stateless map+agg over
  * its own documents; nothing watermark-bounded accumulates.
  */
object StreamingTextIndex {

  /** Start-ready writer maintaining `table` in `db` from a streaming
    * (doc_id, text) frame. Caller sets checkpoint/trigger and
    * `.start()`s.
    */
  def maintainIndex(db: GraftDatabase, table: String, docStream: DataFrame,
      nBuckets: Int): DataStreamWriter[Row] =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        appendBatch(db, table, batch, nBuckets, batchId)
    }

  /** Publish one micro-batch of new documents into the index,
    * idempotently under `batchId`. Also the batch-mode incremental
    * append (a backfill appending a day's partition is the same
    * operation with a caller-chosen batch id).
    */
  def appendBatch(db: GraftDatabase, table: String, docs: DataFrame,
      nBuckets: Int, batchId: Long): Unit = {
    require(batchId >= 0, s"negative batchId $batchId is reserved for the base build")
    // Four artifact actions share one tokenize subtree — persist it
    // for the span of the publishes (r13 VERDICT #1; micro-batches
    // are small, so this is a batch-sized cache, released before
    // return). Without it every publish re-tokenizes the batch.
    val tok = TextIndex.tokenized(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val (postings, lens, stats) = TextIndex.batchArtifacts(tok, batchId)
      publishBucketed(db, table, postings, "term", nBuckets, batchId)
      publishBucketed(db, s"${table}_len", lens, "doc_id", nBuckets, batchId)
      // per-term df PARTIAL for this batch (appended doc_ids are new by
      // the contract above, so serve-time SUM over batch partials is the
      // exact corpus df) — keeps the `_df` artifact searchRanked plans
      // against current without a read-modify-write
      val dfs = postings.groupBy(col("term"))
        .agg(count(lit(1)).as("df"))
        .select(lit(batchId).as("batch_id"), col("term"), col("df"))
      publishBucketed(db, s"${table}_df", dfs, "term", nBuckets, batchId)
      publishPlain(db, s"${table}_corpus", stats, batchId)
    } finally tok.unpersist(blocking = false)
  }

  /** E23b streaming twin: maintain a persisted token-cardinality
    * sketch table from a streaming (source, text) document frame —
    * each micro-batch publishes its per-source HLL partials
    * exactly-once under its batch id
    * ([[graft.operators.TextQueries.appendTokenSketches]]), and the
    * corpus card serves from the sketch table at any moment
    * (`tokenCardinalityFromSketches`) without touching document
    * text. Caller sets checkpoint/trigger and `.start()`s.
    */
  def maintainTokenSketches(db: GraftDatabase, name: String,
      docStream: DataFrame): DataStreamWriter[Row] =
    docStream.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        graft.operators.TextQueries.appendTokenSketches(
          db, name, batch, batchId)
    }

  /** Stage `df` as a bucketed write (one file per non-empty bucket),
    * then rename into the artifact dir under the batch prefix —
    * clearing any files from an earlier attempt of the same batch.
    * The catalog's relation cache holds the OLD file listing, so the
    * publish ends with a refresh — without it a served query planned
    * after the append would silently miss the new postings.
    */
  private def publishBucketed(db: GraftDatabase, table: String,
      df: DataFrame, bucketCol: String, nBuckets: Int,
      batchId: Long): Unit = {
    val spark = df.sparkSession
    val stageIdent = s"${table.replace('.', '_')}__stage_$batchId"
    val stagePath = new Path(db.tablePath(s"_staging_$table"), batchId.toString)
    val fs = stagePath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(stagePath, true)
    spark.sql(s"DROP TABLE IF EXISTS $stageIdent")
    df.repartition(nBuckets, df(bucketCol))
      .write.mode(SaveMode.Overwrite)
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
      .option("path", stagePath.toString)
      .format("parquet")
      .saveAsTable(stageIdent)
    spark.sql(s"DROP TABLE IF EXISTS $stageIdent") // files stay; catalog entry goes
    moveUnderPrefix(fs, stagePath, new Path(db.tablePath(table)), batchId)
    db.refreshBucketed(table)
  }

  private def publishPlain(db: GraftDatabase, table: String,
      df: DataFrame, batchId: Long): Unit = {
    val stagePath = new Path(db.tablePath(s"_staging_$table"), batchId.toString)
    val fs = stagePath.getFileSystem(
      df.sparkSession.sparkContext.hadoopConfiguration)
    fs.delete(stagePath, true)
    df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(stagePath.toString)
    moveUnderPrefix(fs, stagePath, new Path(db.tablePath(table)), batchId)
  }

  /** [[IngestPublish.moveUnderPrefix]] (the ONE checked-rename
    * publish core) plus this path's staging-parent cleanup. */
  private def moveUnderPrefix(fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, dest: Path, batchId: Long): Unit = {
    IngestPublish.moveUnderPrefix(fs, staging, dest, batchId)
    fs.delete(staging.getParent, true)
  }
}
