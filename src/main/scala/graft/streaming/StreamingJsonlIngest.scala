package graft.streaming

import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.catalog.GraftDatabase

/** Streaming JSONL ingest — the continuous form of
  * [[graft.sources.JsonlUploader]], exactly as
  * [[StreamingCsvIngest]] is for CSV (SURVEY §2.A9/G2): new `.jsonl`
  * files dropped into the directory land as micro-batches with the
  * shared exactly-once publish and resume-aware progress
  * ([[IngestPublish]]).
  *
  * Streams require an explicit schema (no inference mid-stream), so
  * the schema comes from a static pass over the files already
  * present — later files must fit it (new fields need a restart,
  * which re-infers; the batch uploader's native union covers the
  * one-shot case).
  */
object StreamingJsonlIngest {

  def start(db: GraftDatabase, jsonlDir: String, table: String,
      taskId: String): StreamingQuery = {
    val spark = db.spark
    val schema = spark.read.json(jsonlDir).schema
    require(schema.nonEmpty, s"no JSON records to sniff under $jsonlDir")
    require(!schema.fieldNames.contains("_corrupt_record"),
      s"malformed JSON lines under $jsonlDir — fix or drop them first")

    val (maxSeqAtStart, counter) =
      IngestPublish.resumeState(db, taskId, table)

    spark.readStream
      .schema(schema)
      .json(jsonlDir)
      .writeStream
      .trigger(Trigger.AvailableNow())
      .option("checkpointLocation", db.tablePath(s"_checkpoint_$table"))
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        IngestPublish.publishBatch(db, table, taskId, batch, batchId,
          maxSeqAtStart, counter)
      }
      .start()
  }
}
