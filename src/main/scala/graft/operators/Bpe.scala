package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** E17: BPE merge learning — the tokenizer-training step (Sennrich et
  * al. 2016; the GPT-2/LLaMA vocabulary build): repeatedly find the
  * most frequent adjacent symbol pair in the corpus and fuse it into
  * a new symbol, recording the merge table in rank order.
  *
  * Scale discipline: the CORPUS is touched exactly once — the initial
  * word-frequency aggregation (map-side combined, vocabulary-sized
  * output). Every iteration after that runs over the persisted WORD
  * VOCABULARY weighted by frequency (the industrial-trainer shape:
  * HF tokenizers trains from word counts, not raw text), so each of
  * the K merge rounds is a vocabulary-scale job — 10⁸ rows at web
  * scale, never 10¹² tokens. Per round: adjacent pairs explode from
  * the symbol arrays (zip_with over two slices — no outer-expression
  * re-evaluation), weighted count, one TakeOrdered(1) argmax under
  * the total order (count DESC, left ASC, right ASC) — deterministic
  * on any cluster — then a map-only left-to-right non-overlapping
  * merge pass rewrites the symbol arrays in place.
  *
  * The driver coordinates K actions (one argmax per round): that is
  * the algorithm's sequential dependency, not a scale bug — each
  * round's winner defines the next round's pair space.
  */
object Bpe {

  /** Character symbols of a word (initial BPE state). */
  private def chars(c: Column): Column =
    transform(sequence(lit(1), length(c)), i => c.substr(i, lit(1)))

  /** One left-to-right, non-overlapping merge pass: every adjacent
    * (l, r) in the symbol array fuses to l+r; a just-fused symbol
    * does not re-participate in this pass ("aaa" + (a,a) → ["aa","a"]).
    * A fold with (emitted, pending) state — the pending symbol either
    * fuses with the next one or flushes.
    */
  private[graft] def mergeOnce(syms: Column, l: String,
      r: String): Column = {
    val zero = struct(
      array().cast("array<string>").as("out"),
      lit(null).cast("string").as("pend"))
    aggregate(
      syms,
      zero,
      (acc, x) => {
        val out = acc.getField("out")
        val pend = acc.getField("pend")
        when(pend.isNull, struct(out.as("out"), x.as("pend")))
          .when(pend === lit(l) && x === lit(r),
            struct(concat(out, array(lit(l + r))).as("out"),
              lit(null).cast("string").as("pend")))
          .otherwise(struct(concat(out, array(pend)).as("out"),
            x.as("pend")))
      },
      acc => when(acc.getField("pend").isNull, acc.getField("out"))
        .otherwise(concat(acc.getField("out"), array(acc.getField("pend")))))
  }

  /** Adjacent symbol pairs of each vocabulary row, weighted by the
    * word's corpus frequency.
    */
  private def pairCounts(words: DataFrame): DataFrame =
    words.filter(size(col("syms")) >= 2)
      .select(explode(zip_with(
        slice(col("syms"), lit(1), size(col("syms")) - 1),
        slice(col("syms"), lit(2), size(col("syms")) - 1),
        (a, b) => struct(a.as("l"), b.as("r")))).as("p"), col("n"))
      .groupBy(col("p.l").as("left"), col("p.r").as("right"))
      .agg(sum(col("n")).as("n_occurrences"))

  /** Learn `nMerges` merges over the documents table; stops early when
    * no pair reaches `minPair`. Returns (rank, left, right,
    * n_occurrences) — the merge table a tokenizer ships.
    */
  def learnMerges(spark: SparkSession, dir: String, nMerges: Int = 10,
      minPair: Long = 2L): DataFrame =
    learnMergesOf(spark,
      Tables(spark, dir, "documents").select(col("text")), nMerges, minPair)

  def learnMergesOf(spark: SparkSession, texts: DataFrame, nMerges: Int,
      minPair: Long): DataFrame = {
    val words = texts
      .select(explode(
        TextQueries.lowerTokens(col("text")))
        .as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))
      .select(chars(col("word")).as("syms"), col("n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    // Each round persists its rewritten vocabulary and releases the
    // grandparent AFTER the round's argmax has materialized the child
    // — so round k is always ONE fold pass over cached rows, never a
    // replay of the k−1 earlier rewrites (an unpersisted chain made
    // the loop O(K²) in fold passes and stacked K nested aggregate()
    // expressions toward Catalyst's codegen depth limits).
    var cur = words
    var retired: DataFrame = null
    try {
      var done = false
      var k = 1
      while (k <= nMerges && !done) {
        // materializes cur's cache as a side effect of the argmax
        val top = pairCounts(cur)
          .orderBy(col("n_occurrences").desc, col("left").asc,
            col("right").asc)
          .limit(1).collect()
        if (retired != null) { retired.unpersist(blocking = false); retired = null }
        if (top.isEmpty || top(0).getLong(2) < minPair) done = true
        else {
          val (l, r, c) =
            (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((k, l, r, c))
          val next = cur.withColumn("syms", mergeOnce(col("syms"), l, r))
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          retired = cur // still cached — next is built from it lazily
          cur = next
          k += 1
        }
      }
    } finally {
      words.unpersist(blocking = false)
      if (retired != null) retired.unpersist(blocking = false)
      if (cur ne words) cur.unpersist(blocking = false)
    }
    import spark.implicits._
    merges.toSeq.toDF("rank", "left", "right", "n_occurrences")
      .select(col("rank").cast("long"), col("left"), col("right"),
        col("n_occurrences"))
  }

  /** Driver-visible correctness row (the AnnChecks pattern — an
    * iterative trainer has no single-query SQL twin, so the oracle
    * pins what IS expressible): the rank-1 merge must equal the SQL
    * argmax over adjacent character pairs of the weighted vocabulary
    * (computed independently by DuckDB from the tables), the table
    * must hold exactly nMerges contiguous ranks, and every count must
    * clear the floor.
    */
  def mergesCheck(spark: SparkSession, dir: String): DataFrame = {
    val m = learnMerges(spark, dir)
    val first = m.filter(col("rank") === 1)
      .select(col("left").as("first_left"), col("right").as("first_right"),
        col("n_occurrences").as("first_count"))
    val shape = m.agg(
      count(lit(1)).as("n_merges"),
      (min(col("rank")) === 1 && max(col("rank")) === count(lit(1)) &&
        countDistinct(col("rank")) === count(lit(1)) &&
        min(col("n_occurrences")) >= 2).as("ranks_ok"))
    first.crossJoin(shape)
  }

  /** E18: segment the corpus with a learned merge table — the
    * tokenizer's encode path at symbol granularity (id assignment is
    * E16's vocabulary join, composable downstream). Merges apply in
    * rank order per word, exactly as learned.
    *
    * Scale shape: merges apply over the DISTINCT-WORD vocabulary
    * (the K chained fold passes run once per distinct word, not once
    * per corpus token), then one AQE-sized join maps tokens to their
    * symbol arrays and a per-doc aggregation reassembles in token
    * order — the E16 encode shape with a vocabulary-side transform.
    */
  def segmentCorpus(spark: SparkSession, dir: String,
      nMerges: Int = 10): DataFrame =
    segmentCorpusOf(spark, Tables(spark, dir, "documents"), nMerges)

  /** Distinct-word vocabulary with the learned merges applied in rank
    * order — the ONE segmentation definition [[segmentCorpusOf]] ships
    * and [[segmentCheck]] audits (a private copy in the check would
    * let it pass against a stale twin of the operator it exists to
    * verify).
    */
  private def segmentVocab(spark: SparkSession, docs: DataFrame,
      nMerges: Int): DataFrame = {
    val merges = learnMergesOf(spark, docs.select(col("text")), nMerges, 2L)
      .orderBy("rank").collect()
      .map(r => (r.getString(1), r.getString(2)))
    docs.select(explode(TextQueries.lowerTokens(col("text"))).as("word"))
      .distinct()
      .withColumn("syms", merges.foldLeft(chars(col("word"))) {
        case (acc, (l, r)) => mergeOnce(acc, l, r)
      })
  }

  def segmentCorpusOf(spark: SparkSession, docs: DataFrame,
      nMerges: Int): DataFrame = {
    val vocab = segmentVocab(spark, docs, nMerges)
    val pos = docs.select(col("doc_id"),
      posexplode(
        TextQueries.lowerTokens(col("text")))
        .as(Seq("p", "word")))
    pos.join(vocab, Seq("word"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(size(col("syms"))).as("n_symbols"),
        concat_ws(" ", flatten(
          transform(array_sort(collect_list(struct(col("p"), col("syms")))),
            s => s.getField("syms")))).as("bpe_text"))
  }

  /** Driver-visible segmentation invariant: BPE is a partition of the
    * word — symbols concatenate back to it losslessly, every word
    * gets ≥1 symbol. DuckDB pins the vocabulary size and the expected
    * booleans.
    */
  def segmentCheck(spark: SparkSession, dir: String): DataFrame = {
    val vocab = segmentVocab(spark, Tables(spark, dir, "documents"), 10)
    vocab.agg(
      count(lit(1)).as("n_words"),
      (count(lit(1)) ===
        sum(when(concat_ws("", col("syms")) === col("word"), 1L)
          .otherwise(0L))).as("all_lossless"),
      (min(size(col("syms"))) >= 1).as("all_nonempty"))
  }

  val oracles: Map[String, String] = Map(
    "text_bpe_segment_check" ->
      """SELECT COUNT(DISTINCT w) AS n_words,
        |  true AS all_lossless, true AS all_nonempty
        |FROM (SELECT unnest(regexp_extract_all(lower(text), '\S+')) w
        |      FROM documents)""".stripMargin,
    "text_bpe_merges_check" ->
      """WITH w AS (SELECT w, COUNT(*) n FROM
        |    (SELECT unnest(regexp_extract_all(lower(text), '\S+')) w
        |     FROM documents) GROUP BY w),
        |p AS (SELECT substr(w, CAST(i AS INT), 1) l,
        |        substr(w, CAST(i + 1 AS INT), 1) r, n
        |      FROM (SELECT w, n, unnest(generate_series(1, length(w) - 1)) i
        |            FROM w WHERE length(w) >= 2)),
        |a AS (SELECT l, r, CAST(SUM(n) AS BIGINT) cnt FROM p GROUP BY l, r),
        |f AS (SELECT l, r, cnt FROM a ORDER BY cnt DESC, l, r LIMIT 1)
        |SELECT l AS first_left, r AS first_right, cnt AS first_count,
        |  CAST(10 AS BIGINT) AS n_merges, true AS ranks_ok
        |FROM f""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_bpe_merges" -> ((s, d) => learnMerges(s, d)),
    "text_bpe_merges_check" -> (mergesCheck _),
    "text_bpe_segment" -> ((s, d) => segmentCorpus(s, d)),
    "text_bpe_segment_check" -> (segmentCheck _)
  )
}
