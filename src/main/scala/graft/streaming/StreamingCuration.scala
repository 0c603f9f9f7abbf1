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
      .withColumn("quality", TextFunctions.qualityFromGate(
        graft.functions.GraftFunctions.gateStats(col("text"))))
      .withColumn("pred_lang", TextFunctions.langId(col("text")))
      .filter(col("quality") >= minQuality && col("pred_lang") === lang)
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")
      .select(col("ts"), col("doc_id"), col("pred_lang"), col("quality"),
        Curation.piiRedact(col("text")).as("clean_text"))

  /** G11: streaming LM scoring — a (ts, doc_id, text) stream scored
    * against a persisted E19 model (`buildLmModel` artifacts) with no
    * re-training: the ingest-time statistical quality gate. The model
    * joins are STREAM-STATIC (stateless — no state store, no
    * watermark bound on the model side); the only stateful operator
    * is the per-document fold, bounded by the `ts` watermark. V is
    * embedded as a literal read once at plan build (a stream cannot
    * cross-join a one-row static frame), matching D9's
    * load-the-quantizer-not-the-corpus rule.
    *
    * Emits (ts, doc_id, n_bigrams, oov_bigrams, bits_per_bigram) in
    * append mode once the watermark passes — identical arithmetic to
    * the batch `perplexityFromModel` (spec-pinned).
    */
  def scorePerplexity(db: graft.catalog.GraftDatabase, name: String,
      docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val lm = graft.operators.LanguageModel
    val c2 = db.read(s"${name}_bigrams")
    val c1 = db.read(s"${name}_contexts")
    val v = db.read(s"${name}_meta").collect()(0).getLong(0)
    lm.scoreRows(
      lm.explodedPairs(docs.withWatermark("ts", watermark), Seq("ts")),
      c2, c1, lit(v), Seq("ts", "doc_id"))
  }

  /** G16: streaming Moore-Lewis selection — a (ts, doc_id, text)
    * stream scored under a persisted C31 two-model artifact
    * (`buildMlModel`) at ingest: the domain-relevance gate that
    * keeps a crawl increment only where the in-domain target model
    * predicts the text better than the background model. STATELESS —
    * both bits are single-expression byte passes against the
    * broadcast count-map pair, so unlike G11/G14 there is no state
    * store and no watermark requirement: verdicts emit with the
    * micro-batch. Identical arithmetic to the batch
    * `mooreLewisFromModel` fast path (spec-pinned); the model must
    * fit the broadcast cap (vocabulary-sized artifact — the same
    * driver-bounded rule as G9's Bloom filter).
    *
    * Emits (ts, doc_id, bits_target, bits_background, ml_score,
    * keep_doc) per micro-batch.
    */
  def scoreMooreLewis(db: graft.catalog.GraftDatabase, name: String,
      docs: DataFrame): DataFrame =
    graft.operators.LanguageModel.mooreLewisStream(db, name, docs)

  /** G18: streaming per-source quality-percentile gate — a
    * (ts, doc_id, source, text) stream gated under a persisted C36b
    * artifact ([[Curation.buildQualityGate]]) at ingest. C36's rank
    * needs the full source, so the production shape is
    * batch-calibrated per-source boundary thresholds served as a
    * STATELESS stream-static broadcast join — G16's geometry with a
    * threshold table instead of a count-map pair. No state store, no
    * watermark requirement; verdicts emit with the micro-batch, and
    * the keep set on the calibration corpus is bit-identical to the
    * batch gate (tie docs included — the boundary stores the full
    * (quality, doc_id) sort key, spec-pinned).
    *
    * Emits (ts, doc_id, source, q, n_kept, n_docs) per micro-batch.
    */
  def gateQuality(db: graft.catalog.GraftDatabase, name: String,
      docs: DataFrame): DataFrame =
    Curation.qualityGateFromModel(db, name, docs, passthrough = Seq("ts"))

  /** G22 (r14): the MAINTAINED form of [[gateQuality]] — a gate that
    * tracks calibration drift without a stream restart. [[gateQuality]]
    * builds its stream-static join ONCE at `start()`, so the
    * thresholds it broadcasts are frozen for the stream's lifetime; a
    * quality distribution that drifts (or a deliberate
    * [[Curation.recalibrateQualityGate]]) would serve stale
    * boundaries forever. This form is the G12 foreachBatch pattern
    * instead: each micro-batch constructs the gate plan FRESH, so the
    * threshold table is re-listed and re-broadcast per batch, and a
    * recalibration published between batches (rename-swap — never a
    * half-model) takes effect on the very next batch. Verdicts
    * publish exactly-once to `{name}_gated` keyed by batch id
    * (staging-rename, replays converge — same contract as G2/G10),
    * tagged with the batch that gated them.
    */
  def gateQualityMaintained(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        IngestPublish.publishFiles(db, s"${name}_gated",
          Curation.qualityGateFromModel(db, name, batch,
            passthrough = Seq("ts"))
            .withColumn("batch_id", lit(batchId)),
          batchId)
        ()
    }

  /** C38 streaming twin: maintain a persisted per-shard length
    * histogram from a (source, text) document stream (extra columns
    * ride along untouched) —
    * each micro-batch publishes its histogram partials exactly-once
    * under its batch id ([[graft.operators.Distribution
    * .appendLengthHistogram]]); SUM-merge exactness means the served
    * quantile panel after any number of micro-batches EQUALS the
    * one-pass batch panel over everything ingested (spec-pinned as
    * equality — the artifact is order-insensitive by design).
    */
  def maintainLengthHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        graft.operators.Distribution.appendLengthHistogram(db, name,
          batch.withColumn("n_chars", length(col("text")).cast("bigint")),
          batchId)
        ()
    }

  /** C38 quality-panel streaming twin: same maintenance geometry as
    * [[maintainLengthHistogram]] over a (doc_id, source, text)
    * stream — the score quantizes to the grid inside the micro-batch
    * (one GateStats byte pass), partials publish exactly-once.
    */
  def maintainQualityHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame)
      : org.apache.spark.sql.streaming.DataStreamWriter[
        org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch {
      (batch: DataFrame, batchId: Long) =>
        graft.operators.Distribution.appendQualityHistogram(db, name,
          batch, batchId)
        ()
    }

  /** G14: streaming DSIR scoring — a (ts, doc_id, text) stream
    * weighted against a persisted C33 model (`buildDsirModel`
    * artifacts) at ingest: the domain-relevance gate running where
    * the crawl arrives. The m-row bucket table is a STREAM-STATIC
    * broadcast probe (stateless); the only state is the per-document
    * integer fold, bounded by the `ts` watermark — G11's geometry
    * with a hashed-feature model instead of a bigram LM. Emits
    * (ts, doc_id, n_feats, weight_mb, avg_mb_per_feat, keep_doc) in
    * append mode, identical arithmetic to the batch `dsirFromModel`
    * (spec-pinned).
    */
  def scoreDsir(db: graft.catalog.GraftDatabase, name: String,
      docs: DataFrame, watermark: String = "1 hour"): DataFrame = {
    val lm = graft.operators.LanguageModel
    val m = db.read(s"${name}_meta").collect()(0).getInt(0)
    lm.dsirScoreRows(
      lm.dsirFeats(docs.withWatermark("ts", watermark), m, Seq("ts")),
      db.read(s"${name}_buckets"), Seq("ts", "doc_id"))
  }
}
