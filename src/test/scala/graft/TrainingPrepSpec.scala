package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the r7 training-prep additions: deterministic
  * overlapping chunking (E14) and the distilled linear quality
  * classifier (C22). The oracle rows pin engine parity; these pin
  * the properties the oracle can't state.
  */
class TrainingPrepSpec extends AnyFunSuite with SparkTestBase {

  test("chunks: full coverage, exact boundaries, lossless reassembly") {
    val out = graft.operators.TextQueries.chunks(spark, sf)
      .join(Tables(spark, sf, "documents").select(col("doc_id"),
        col("text"), length(col("text")).as("len")), Seq("doc_id"))
    // Last chunk ends exactly at the document's last char; first
    // starts at 1; count matches the closed-form stride formula.
    val bad = out.groupBy(col("doc_id"), col("len"))
      .agg(max(col("chunk_start") + col("chunk_len") - 1).as("last_end"),
        min(col("chunk_start")).as("first_start"),
        count(lit(1)).as("n_chunks"))
      .filter(col("last_end") =!= greatest(col("len"), lit(1)) ||
        col("first_start") =!= 1 ||
        col("n_chunks") =!=
          expr("(greatest(len, 1) - 1) div 300 + 1"))
      .count()
    assert(bad == 0)
    // Reassembly: the first `stride` chars of each chunk, in order,
    // concatenate back to the document (the trailing overlap is
    // context duplication, not data loss).
    val rebuilt = out
      .withColumn("piece", expr("substring(chunk_text, 1, 300)"))
      .groupBy(col("doc_id"), col("text"))
      .agg(concat_ws("", array_sort(
        collect_list(struct(col("chunk_id"), col("piece"))))
        .getField("piece")).as("rebuilt"))
      .filter(col("rebuilt") =!= col("text")).count()
    assert(rebuilt == 0)
  }

  test("E22 sentences: boundary splitting, stable idx under blank filter, edge docs") {
    // the driver corpus is single-sentence docs, so the real
    // splitting behavior must be pinned on synthetic text
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val dir = scratch("sentences")
    Seq(
      (1L, "Hello world. How are you?? Fine!\nDone."),
      (2L, "No terminal punctuation at all"),
      (3L, "Trailing blanks. ! .  "), // boundary runs collapse; blanks drop
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text").repartition(1)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.TextQueries.sentences(spark, dir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
      .toSet
    assert(out == Set(
      // multi-char terminators ("??") are one boundary; the final
      // sentence keeps its punctuation (no trailing whitespace after)
      (1L, 1L, "Hello world", 11L),
      (1L, 2L, "How are you", 11L),
      (1L, 3L, "Fine", 4L),
      (1L, 4L, "Done.", 5L),
      (2L, 1L, "No terminal punctuation at all", 30L),
      // doc 3: "Trailing blanks" + the blank tail pieces (filtered);
      // sent_idx stays the UNFILTERED array position
      (3L, 1L, "Trailing blanks", 15L)))
    // null text yields no rows rather than a null-sentence row
    assert(!out.exists(_._1 == 4L))
  }

  test("E23 sketches: union of per-source sketches equals the one-pass corpus sketch") {
    // the property that makes the sketch an ARTIFACT rather than a
    // one-shot answer: merging per-shard sketches reproduces the
    // whole-corpus estimate exactly (same lgK), so a new shard
    // updates the dataset card without re-reading old shards
    import org.apache.spark.sql.functions._
    val docs = Tables(spark, sf, "documents")
      .select(col("source"),
        explode(graft.functions.TextFunctions.wsTokens(lower(col("text"))))
          .as("tok"))
    val viaUnion = docs.groupBy(col("source"))
      .agg(hll_sketch_agg(col("tok")).as("sk"))
      .agg(hll_union_agg(col("sk")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    val onePass = docs.agg(hll_sketch_agg(col("tok")).as("sk"))
      .select(hll_sketch_estimate(col("sk"))).head().getLong(0)
    assert(viaUnion == onePass)
    // and the check row's accuracy contract holds everywhere
    val bad = graft.operators.TextQueries
      .tokenCardinalityCheck(spark, sf)
      .filter(!col("within_5pct")).count()
    assert(bad == 0)
  }

  test("E23b: persisted sketch artifact — append updates the card without old shards; replay converges") {
    import org.apache.spark.sql.functions._
    val tq = graft.operators.TextQueries
    val db = graft.catalog.GraftDatabase(spark, scratch("tok_sketch") + "/db")
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val (shardA, shardB) =
      (docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    tq.buildTokenSketches(db, "tc", shardA)
    tq.appendTokenSketches(db, "tc", shardB, batchId = 0L)
    def card(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val served = card(tq.tokenCardinalityFromSketches(db, "tc"))
    // EXACT equality with the one-pass whole-corpus query (fixed
    // lgK makes sketch union lossless) — incl. the __ALL__ row
    assert(served == card(tq.tokenCardinality(spark, sf)))
    // the serve is a sketch-table job: shards × sources rows, no text
    assert(db.read("tc_sketch").count() ==
      2 * docs.select("source").distinct().count())
    // at-least-once append replays converge (same batch id, same shard)
    tq.appendTokenSketches(db, "tc", shardB, batchId = 0L)
    assert(card(tq.tokenCardinalityFromSketches(db, "tc")) == served)
  }

  test("C38: persisted length histogram — exact incremental quantiles; replay converges; overflow capped") {
    import org.apache.spark.sql.functions._
    val dist = graft.operators.Distribution
    val db = graft.catalog.GraftDatabase(spark, scratch("len_hist") + "/db")
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"))
    val ids = docs.select("doc_id").collect().map(_.getLong(0)).sorted
    val cut = ids(ids.length / 2)
    val (shardA, shardB) =
      (docs.filter(col("doc_id") < cut), docs.filter(col("doc_id") >= cut))
    dist.buildLengthHistogram(db, "lh", shardA)
    dist.appendLengthHistogram(db, "lh", shardB, batchId = 0L)
    def panel(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val served = panel(dist.quantilesFromHistogram(db, "lh"))
    // SUM-merge is exact: served EQUALS the one-pass corpus panel,
    // __ALL__ row included — equality, not approximation
    assert(served == panel(dist.docLengthQuantiles(spark, sf)))
    assert(served.contains("__ALL__") && served.size >= 2)
    // at-least-once replay of the same batch converges
    dist.appendLengthHistogram(db, "lh", shardB, batchId = 0L)
    assert(panel(dist.quantilesFromHistogram(db, "lh")) == served)
    // overflow bucket: a tiny cap folds the tail into v = maxV, so
    // every quantile at or beyond the capped mass reads exactly maxV
    dist.buildLengthHistogram(db, "cap", docs, maxV = 10)
    val capped = panel(dist.quantilesFromHistogram(db, "cap"))
    assert(capped("__ALL__")._4 == 10L,
      s"p99 must land in the overflow bucket: $capped")
    assert(capped("__ALL__")._1 == served("__ALL__")._1,
      "cap changes values, never counts")
    // the QUALITY panel rides the same artifact machinery: grid
    // quantization happens BEFORE the histogram, so split-build +
    // append serves the inline panel exactly too
    val tdocs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    dist.buildQualityHistogram(db, "qh",
      tdocs.filter(col("doc_id") < cut))
    dist.appendQualityHistogram(db, "qh",
      tdocs.filter(col("doc_id") >= cut), batchId = 0L)
    assert(panel(dist.quantilesFromHistogram(db, "qh")) ==
      panel(dist.qualityQuantiles(spark, sf)))
  }

  test("quality classifier: bounded probs, threshold consistency, signal direction") {
    import spark.implicits._
    val out = graft.operators.Curation.qualityClassifier(spark, sf)
    val n = out.count()
    assert(out.filter(col("quality_prob") <= 0.0 ||
      col("quality_prob") >= 1.0).count() == 0)
    // keep_doc must be exactly prob >= 0.5 (s >= 0 ⇔ squash ≥ .5)
    assert(out.filter(col("keep_doc") =!=
      (col("quality_prob") >= 0.5)).count() == 0)
    assert(n > 0)

    // Direction: fluent English prose must outscore punctuation soup
    // and digit dumps through the same plan.
    val probe = Seq(
      (1L, "the cat sat on the mat and it is a fine day in the sun " * 8),
      (2L, "!!! ??? ;;; ::: ,,, ... !!! ??? ;;; ::: ,,, ... " * 8),
      (3L, "123 456 789 012 345 678 901 234 567 890 " * 8)
    ).toDF("doc_id", "text")
    val tmp = scratch("qc_probe")
    probe.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val scored = graft.operators.Curation.qualityClassifier(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scored(1L) > scored(2L))
    assert(scored(1L) > scored(3L))
  }
}
