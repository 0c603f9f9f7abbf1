package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.operators.Curation

/** Streaming corpus curation (SURVEY.md §2.G6): the ingest-time face
  * of the batch cleaning pipeline (§C8) — quality gate → language
  * gate → watermark-bounded exact dedup → PII redaction, one
  * streaming plan.
  *
  * What stays batch, deliberately: near-dup pair generation (AllPairs
  * / MinHash) needs cross-document candidate state that no watermark
  * bounds — a streaming build runs THIS pipeline at ingest and the
  * §C3/C4 near-dup pass as the periodic batch compaction. The gates
  * here are stateless map work; the only state is the dedup
  * fingerprint set, bounded by the watermark horizon.
  */
object StreamingCuration {

  /** (ts timestamp, doc_id long, text string) stream → curated
    * (ts, doc_id, pred_lang, quality, clean_text).
    */
  def curate(docs: DataFrame, minQuality: Double = 0.7,
      lang: String = "en", watermark: String = "1 hour"): DataFrame =
    docs
      .withColumn("quality", TextFunctions.qualityScore(col("text")))
      .withColumn("pred_lang", TextFunctions.langId(col("text")))
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select(col("ts"), col("doc_id"), col("pred_lang"), col("quality"),
        Curation.piiRedact(col("text")).as("clean_text"))
}
