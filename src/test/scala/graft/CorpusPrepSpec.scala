package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantics pins for the round-7 corpus-prep additions: line-granular
  * dedup (C23), the distributed global rank (Ranks), vocabulary build +
  * id encoding (E15/E16), the cross-source overlap matrix (C24), and
  * the deterministic shuffled export (H16). The oracle rows pin engine
  * parity; these pin the properties the oracle can't state.
  */
class CorpusPrepSpec extends AnyFunSuite with SparkTestBase {

  test("line dedup: keep-first across docs, within-doc repeats, reassembly") {
    import spark.implicits._
    val docs = Seq(
      // two 8-token lines, all first occurrences
      (1L, "a b c d e f g h i j k l m n o p"),
      // line 0 duplicates doc 1's line 0 → dropped; line 1 unique
      (2L, "a b c d e f g h q r s t u v w x"),
      // within-doc repeat: both lines identical → second dropped
      (3L, "x1 y1 z1 w1 v1 u1 t1 s1 x1 y1 z1 w1 v1 u1 t1 s1"),
      // short doc (< 8 tokens) → one short line, unique
      (4L, "lone short line"),
      // empty doc → zero lines, but still a result row (totality —
      // the oracle must agree, so a parity break here fails loudly)
      (5L, "")
    ).toDF("doc_id", "text")
    val out = graft.operators.Dedup.dedupLinesOf(docs, 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 2L, "a b c d e f g h i j k l m n o p")))
    assert(out(2L) == ((2L, 1L, "q r s t u v w x")))
    assert(out(3L) == ((2L, 1L, "x1 y1 z1 w1 v1 u1 t1 s1")))
    assert(out(4L) == ((1L, 1L, "lone short line")))
    assert(out(5L) == ((0L, 0L, "")))
  }

  test("line dedup: no duplicates ⇒ lossless identity") {
    // make every TOKEN globally unique ((doc, position)-tagged), so no
    // line can duplicate any other, across or within docs — dedup must
    // then return every document verbatim
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"),
        concat_ws(" ", transform(split(col("text"), "\\s+"),
          (t, i) => concat(col("doc_id"), lit("_"), i, lit("_"), t)))
          .as("text"))
    val out = graft.operators.Dedup.dedupLinesOf(docs, 8)
    assert(out.filter(col("n_kept") =!= col("n_lines")).count() == 0)
    val mismatch = out.join(docs, Seq("doc_id"))
      .filter(col("clean_text") =!= col("text")).count()
    assert(mismatch == 0)
  }

  test("global rank: equals the window form, scalable plan, deterministic") {
    import spark.implicits._
    // skewed keys, non-trivial tie structure on v
    val df = (0 until 20000).map(i => ((i * 7919) % 997, i.toLong))
      .toDF("v", "id").repartition(13)
    val ranked = graft.operators.Ranks.globalRowNumber(
      df, Seq(col("v").asc, col("id").asc), "pos")
    // the scalable shape: parallel range partitions, never a
    // single-partition funnel (the range exchange itself is pinned in
    // CsvIngestSpec's exportSorted plan test; here the cached-plan
    // string hides it, so pin the partition count instead)
    assert(ranked.rdd.getNumPartitions > 1)
    val expected = df.withColumn("pos",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(ranked.select("v", "id", "pos")
      .except(expected.select("v", "id", "pos")).count() == 0)
    assert(ranked.count() == 20000)
    // bit-reproducible across invocations
    val again = graft.operators.Ranks.globalRowNumber(
      df, Seq(col("v").asc, col("id").asc), "pos")
    assert(ranked.select("id", "pos")
      .except(again.select("id", "pos")).count() == 0)
  }

  test("hash rank: analytic buckets equal the sampled range rank") {
    import spark.implicits._
    val df = (0 until 20000).map(_.toLong).toDF("id")
      .select(col("id"), md5(col("id").cast("string")).as("h"))
      .repartition(13)
    val order = Seq(col("h").asc, col("id").asc)
    val analytic = graft.operators.Ranks.hashOrderedRowNumber(
      df, col("h"), order, "pos")
    // identical ranks to the sampled-boundary two-phase rank
    val sampled = graft.operators.Ranks.globalRowNumber(df, order, "pos")
    assert(analytic.select("id", "pos")
      .except(sampled.select("id", "pos")).count() == 0)
    assert(analytic.count() == 20000)
    // still a parallel plan, never a single funnel
    assert(analytic.rdd.getNumPartitions > 1)
  }

  test("vocabulary: cap, total order, and encode consistency") {
    val cap = 5
    val v = graft.operators.TextQueries.vocabulary(spark, sf, cap).collect()
    assert(v.length == cap)
    assert(v.map(_.getLong(0)).sorted.toSeq == (1L to cap).toSeq)
    // ids follow (count desc, term asc) — adjacent ranks may not
    // invert the order
    val byId = v.sortBy(_.getLong(0))
    byId.sliding(2).foreach {
      case Array(a, b) =>
        val (ca, cb) = (a.getLong(2), b.getLong(2))
        assert(ca > cb || (ca == cb && a.getString(1) < b.getString(1)))
      case _ =>
    }
    val vocabTerms = v.map(_.getString(1)).toSet
    val enc = graft.operators.TextQueries.encodeIds(spark, sf, cap)
    // every doc's id sequence has exactly n_tokens entries, n_oov of
    // them zero, and every nonzero id within the cap
    val bad = enc.filter(
      size(split(col("encoded"), " ")) =!= col("n_tokens") ||
      size(filter(split(col("encoded"), " "), s => s === "0"))
        =!= col("n_oov") ||
      size(filter(split(col("encoded"), " "),
        s => s.cast("long") > cap)) > 0).count()
    assert(bad == 0)
    // OOV count matches membership in the capped vocabulary
    val tokens = Tables(spark, sf, "documents").select(col("doc_id"),
      explode(regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0)))
        .as("t"))
    val expectedOov = tokens
      .filter(!col("t").isin(vocabTerms.toSeq: _*))
      .groupBy("doc_id").count()
    assert(enc.join(expectedOov, Seq("doc_id"))
      .filter(col("n_oov") =!= col("count")).count() == 0)
  }

  test("token budget: greedy-by-quality prefix, straddler dropped") {
    import spark.implicits._
    // srcA: high-quality doc 1 (55 tokens), lower-quality doc 2
    // (40 tokens) — budget 60 keeps only the better one (doc 2
    // straddles and is dropped, not truncated); srcB fits whole
    val fluent = Seq.fill(5)("the cat and the dog is in it a of to").mkString(" ")
    val choppy = Seq.fill(8)("xxxxx yyyyy zzzzz !!!!! ?????").mkString(" ")
    val out = graft.operators.Curation.tokenBudgetOf(
      Seq((1L, "srcA", fluent), (2L, "srcA", choppy),
        (3L, "srcB", "the cat is a dog")).toDF("doc_id", "source", "text"),
      budget = 60L)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out == Map(1L -> 55L, 3L -> 5L))
  }

  test("keyedPrefixSum: 90%-skew source spreads over >1 task, sums ≡ window") {
    import spark.implicits._
    val dir = scratch("psum_skew")
    // the reference shape that breaks a per-source window: one source
    // holds 90% of the corpus, so PARTITION BY source would fold its
    // whole stream on ONE task
    val docs = (0 until 900).map(i => (i.toLong, "big",
        Seq.fill(i % 7 + 1)("alpha beta gamma delta").mkString(" "))) ++
      (900 until 1000).map(i => (i.toLong, "small", s"tail $i text"))
    docs.toDF("doc_id", "source", "text").repartition(8)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = graft.operators.Pipeline.packSequences(spark, dir, budget = 64)
    // >1 task per source: no exchange follows the prefix sum, so the
    // output partitioning IS the summing stage's task layout
    val srcIdx = out.schema.fieldIndex("source")
    val bigParts = out.rdd.mapPartitionsWithIndex { (pid, it) =>
      var hit = false
      it.foreach(r => if (r.getString(srcIdx) == "big") hit = true)
      if (hit) Iterator.single(pid) else Iterator.empty
    }.collect().toSet
    assert(bigParts.size > 1,
      s"big source serialized onto ${bigParts.size} task(s)")
    // cumulative sums bit-identical to the single-task window form
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val exp = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), col("doc_id"),
        graft.functions.TextFunctions.wsTokenCount(col("text")).as("nt"))
      .withColumn("cum_exp", sum(col("nt")).over(w))
    assert(out.join(exp.select("doc_id", "cum_exp"), "doc_id")
      .filter(col("cum_tokens") =!= col("cum_exp")).count() == 0)
    assert(out.count() == 1000)
    // C28's q-DESC ordering through the same machinery: equality vs
    // the window form on the skewed frame (quality varies with text,
    // so the analytic (1−q)·S shard splits the big source too)
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val got = graft.operators.Curation.tokenBudgetOf(d, budget = Long.MaxValue / 2)
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expQ = d
      .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
      .select(col("doc_id"), col("source"),
        col("__g.n_ws").as("nt"),
        graft.functions.TextFunctions.qualityFromGate(col("__g")).as("q"))
      .withColumn("cum_exp", sum(col("nt")).over(wq))
    assert(got.join(expQ.select("doc_id", "cum_exp"), "doc_id")
      .filter(col("cum_tokens") =!= col("cum_exp")).count() == 0)
    assert(got.count() == 1000)
  }

  test("keyedPrefixSum ≡ window on seeded random frames, any shard") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    (1 to 4).foreach { trial =>
      val n = 200 + rnd.nextInt(300)
      val rows = (0 until n).map { i =>
        (i.toLong,                                  // unique tiebreak
          s"k${rnd.nextInt(1 + rnd.nextInt(4))}",   // skewed key pool
          rnd.nextInt(20).toLong,                   // order key, many ties
          (rnd.nextInt(100) - 10).toLong)           // values incl. negatives
      }
      val df = rows.toDF("id", "k", "ord", "v")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("k")).orderBy(col("ord").asc, col("id").asc)
        .rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      val want = df.withColumn("cum", sum(col("v")).over(w))
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // (a) a proper monotone shard — floor(ord/3) is non-decreasing
      // in the order key; (b) the degenerate all-zero shard (single
      // group per key — the window's serialization, which must still
      // be CORRECT). ord % 7 is NOT monotone and violates the
      // operator's precondition — pinned as the negative case below.
      for (shard <- Seq(floor(col("ord") / 3).cast("long"), lit(0L))) {
        val got = graft.operators.Ranks.keyedPrefixSum(df, Seq("k"),
            Seq(col("ord").asc, col("id").asc), "v", shard, "cum")
          .select("id", "cum").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(got == want, s"trial $trial shard $shard")
      }
    }
  }

  test("keyedPrefixSum negative case: a NON-monotone shard diverges") {
    // The operator's contract (Ranks.scala scaladoc) requires the
    // shard to be monotone non-decreasing along `order` within each
    // key. A non-monotone shard (ord % 7) makes the operator compute
    // the prefix sum of the (shard, order) total order instead — a
    // DIFFERENT, legitimate-looking answer. This spec pins that
    // failure mode so the r11 test bug (asserting window equality
    // under ord % 7) cannot recur: on a frame built to expose it,
    // the misuse MUST diverge from the window.
    import spark.implicits._
    val df = (0 until 300).map(i =>
      (i.toLong, "k", i.toLong % 20, 1L)).toDF("id", "k", "ord", "v")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("ord").asc, col("id").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val want = df.withColumn("cum", sum(col("v")).over(w))
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val misuse = graft.operators.Ranks.keyedPrefixSum(df, Seq("k"),
        Seq(col("ord").asc, col("id").asc), "v", col("ord") % 7, "cum")
      .select("id", "cum").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(misuse != want,
      "a non-monotone shard must NOT reproduce the window prefix sum")
  }

  test("token budget: null-text corpus ≡ window form (ADVICE r11 parity)") {
    // ADVICE r11 flagged NULL-shard placement diverging from the
    // window on null-text docs. In fact q is never NULL here —
    // qualityFromGate's `least(lit(1.0), …)` SKIPS the null ratio
    // legs (Spark least semantics), so a null-text doc scores a
    // computed q and a non-null shard. The property that must hold
    // regardless: keyedPrefixSum output ≡ the per-source window it
    // replaces, including null-text rows and the budget filter.
    import spark.implicits._
    val d = Seq(
      (1L, "srcA", "the cat and the dog is in it a of to"),
      (2L, "srcA", null.asInstanceOf[String]),
      (3L, "srcA", "the cat is a dog the cat is a dog"),
      (4L, "srcB", null.asInstanceOf[String])
    ).toDF("doc_id", "source", "text")
    val wq = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"))
      .orderBy(col("q").desc, col("doc_id").asc)
      .rowsBetween(
        org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    def windowForm(budget: Long): Map[Long, Long] = d
      .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
      .select(col("doc_id"),
        col("__g.n_ws").as("nt"),
        graft.functions.TextFunctions.qualityFromGate(col("__g")).as("q"),
        col("source"))
      // coalesce: keyedPrefixSum documents "NULL sums as 0", so its
      // window twin is sum(coalesce(nt, 0)) — the plain sum() window
      // leaves cum NULL until the first non-null value, which would
      // silently drop a leading null-text doc at the filter
      .withColumn("cum", sum(coalesce(col("nt"), lit(0L))).over(wq))
      .filter(col("cum") <= budget)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    for (budget <- Seq(5L, 15L, Long.MaxValue / 2)) {
      val got = graft.operators.Curation.tokenBudgetOf(d, budget)
        .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
      assert(got == windowForm(budget), s"budget $budget")
    }
  }

  test("idRangeShard: monotone on full-span 64-bit ids (overflow regime)") {
    // hi - lo overflows Long when ids cover both signed extremes; the
    // fallback arithmetic-shift shard must stay monotone (ADVICE r11:
    // the old raw subtraction went ANTI-monotone silently).
    import spark.implicits._
    val ids = Seq(Long.MinValue, Long.MinValue + 17L, -999999L, -5L, 0L,
      7L, 123456789L, Long.MaxValue - 3L, Long.MaxValue)
    val df = ids.zipWithIndex.map { case (id, i) => (id, i.toLong) }
      .toDF("doc_id", "v")
    val sh = graft.operators.Ranks.idRangeShard(df, "doc_id", 32)
    val got = df.withColumn("sh", sh).orderBy(col("doc_id").asc)
      .select("sh").collect().map(_.getLong(0))
    assert(got.zip(got.tail).forall { case (a, b) => a <= b },
      s"shard not monotone in doc_id: ${got.mkString(",")}")
    assert(got.distinct.length > 1, "full-span ids should spread shards")
  }

  test("footer longColumnRange: exact vs agg, None on non-INT64/missing") {
    // r12: the packing shard's [lo, hi] comes from parquet footer
    // statistics (no job) — a Some must be EXACTLY the scan-agg
    // min/max, and every unusable case must be None (callers fall
    // back to the scan; keyedPrefixSum is bit-exact under any
    // monotone shard either way, so this is a job-count contract).
    val got = graft.sources.ParquetStats.longColumnRange(
      spark, s"$sf/documents.parquet", "doc_id")
    val r = Tables(spark, sf, "documents")
      .agg(min(col("doc_id")), max(col("doc_id"))).head()
    assert(got.contains((r.getLong(0), r.getLong(1))), s"footer=$got agg=$r")
    assert(graft.sources.ParquetStats.longColumnRange(
      spark, s"$sf/documents.parquet", "text").isEmpty, "non-INT64")
    assert(graft.sources.ParquetStats.longColumnRange(
      spark, s"$sf/no_such.parquet", "doc_id").isEmpty, "missing dir")
    // and the shard built from those bounds is monotone + spread
    val sh = graft.operators.Ranks.idRangeShardFromBounds(
      "doc_id", r.getLong(0), r.getLong(1), 64)
    val seq = Tables(spark, sf, "documents").withColumn("sh", sh)
      .orderBy(col("doc_id").asc).select("sh").collect().map(_.getLong(0))
    assert(seq.zip(seq.tail).forall { case (a, b) => a <= b })
    assert(seq.distinct.length > 1)
  }

  test("globalRowNumberWithTotal: total equals count, ranks unchanged") {
    import spark.implicits._
    val df = (0 until 5000).map(i => ((i * 131) % 97, i.toLong))
      .toDF("v", "id").repartition(11)
    val (ranked, total) = graft.operators.Ranks.globalRowNumberWithTotal(
      df, Seq(col("v").asc, col("id").asc), "pos")
    assert(total == 5000L)
    val expected = df.withColumn("pos",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("v").asc, col("id").asc)).cast("long"))
    assert(ranked.select("v", "id", "pos")
      .except(expected.select("v", "id", "pos")).count() == 0)
  }

  test("cleanCorpus: small single-plan tail ≡ large persisted tail") {
    // r11 adaptive dispatch: the small regime drops the persist, the
    // rarity sketch, the width pins, and the candidate distinct —
    // every omission is a plan-shape change that must NOT change the
    // output. sf data takes the small path by default; smallMaxBytes=0
    // forces the large path on the same corpus.
    val small = graft.operators.Pipeline.cleanCorpus(spark, sf)
      .collect().map(_.getLong(0)).toSet
    val large = graft.operators.Pipeline
      .cleanCorpus(spark, sf, smallMaxBytes = 0L)
      .collect().map(_.getLong(0)).toSet
    assert(small == large)
    assert(small.nonEmpty)
  }

  test("clean small-tail stage-2 gate: footer text bytes, =0 forces large") {
    // ADVICE r11: the compressed-stats gate alone is compression-
    // ratio blind. Stage 2 reads ACTUAL text bytes from the parquet
    // footers (driver-side, no job); tripping it must route to the
    // persisted path with identical output.
    val bytes = graft.sources.ParquetStats.uncompressedColumnBytes(
      spark, s"$sf/documents.parquet", "text")
    assert(bytes.exists(_ > 0), s"footer stats unreadable: $bytes")
    assert(graft.sources.ParquetStats.uncompressedColumnBytes(
      spark, s"$sf/no_such.parquet", "text").isEmpty)
    val viaGate = graft.operators.Pipeline
      .cleanCorpus(spark, sf, smallMaxTextBytes = 0L)
      .collect().map(_.getLong(0)).toSet
    val small = graft.operators.Pipeline.cleanCorpus(spark, sf)
      .collect().map(_.getLong(0)).toSet
    assert(viaGate == small)
  }

  test("source overlap: exact planted counts, ordered pairs") {
    import spark.implicits._
    val dir = scratch("overlap_probe")
    Seq(
      (1L, "p q r s t", "en", "srcA", 9L),
      (2L, "p q r s u", "en", "srcB", 9L),
      (3L, "zz zz zz", "en", "srcC", 8L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = graft.operators.Curation.sourceOverlap(spark, dir)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2))
      .toMap
    // A∩B share "p q r" and "q r s" (not "r s t"/"r s u"); C shares
    // nothing — and absent pairs are absent, not zero rows
    assert(rows == Map(("srcA", "srcB") -> 2L))
  }

  test("perplexity: fluent text scores below gibberish, exact OOV counts") {
    import spark.implicits._
    // train split (ids 1..9, none ≡0 mod 5) repeats one fluent
    // pattern; held-out ids 10 and 15: one fluent doc, one of tokens
    // the model never saw
    val train = (1 to 9).filter(_ % 5 != 0)
      .map(i => (i.toLong, "the cat sat on the mat"))
    val held = Seq((10L, "the cat sat on the mat"),
      (15L, "zx qv jk wp zx qv"))
    val out = graft.operators.LanguageModel
      .perplexityOf((train ++ held).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(10L, 15L))
    val (nb10, oov10, bits10) = out(10L)
    val (nb15, oov15, bits15) = out(15L)
    assert(nb10 == 5 && oov10 == 0)
    // every gibberish bigram is unseen
    assert(nb15 == 5 && oov15 == 5)
    // the model must prefer the text it was trained on
    assert(bits10 < bits15)
    // unseen context floor: p = 1/V exactly, V = 5 distinct train
    // tokens → 1000·log2(5) millibits, averaged
    assert(math.abs(bits15 - math.round(math.log(5) / math.log(2) * 1000)
      / 1000.0) < 1e-9)
  }

  test("trigram fast path equals the join path bit-for-bit") {
    val lm = graft.operators.LanguageModel
    val docs = Tables(spark, sf, "documents")
    // explicit big cap FORCES the broadcast path (the default trigram
    // cap is deliberately small — see the negative result in the
    // operator — so the default would fall through to joins here)
    val fast = lm.perplexityTrigramOf(docs, maxBroadcastModel = 10000000)
    val joins = lm.perplexityTrigramOf(docs, maxBroadcastModel = 0)
    assert(fast.count() == joins.count())
    assert(fast.except(joins).count() == 0)
    assert(joins.except(fast).count() == 0)
  }

  test("trigram perplexity: fluent < gibberish, interpolation floors hold") {
    import spark.implicits._
    val train = (1 to 9).filter(_ % 5 != 0)
      .map(i => (i.toLong, "the cat sat on the mat"))
    val held = Seq((10L, "the cat sat on the mat"),
      (15L, "zx qv jk wp zx qv"),
      (20L, "the cat on sat the mat")) // same unigrams, broken order
    val out = graft.operators.LanguageModel
      .perplexityTrigramOf((train ++ held).toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.keySet == Set(10L, 15L, 20L))
    val (nt10, oov10, bits10) = out(10L)
    assert(nt10 == 4 && oov10 == 0)
    // gibberish: all trigrams unseen, only the smoothed unigram leg
    // carries mass — strictly worse than both fluent variants
    val (nt15, oov15, bits15) = out(15L)
    assert(nt15 == 4 && oov15 == 4)
    // scrambled doc: every unigram known, trigrams unseen — the
    // trigram model must rank it between fluent and gibberish
    val (nt20, oov20, bits20) = out(20L)
    assert(nt20 == 4 && oov20 >= 3)
    assert(bits10 < bits20 && bits20 < bits15,
      s"$bits10 < $bits20 < $bits15 expected")
  }

  test("lm fast path: broadcast byte-pass scores equal the join path " +
      "bit-for-bit") {
    val lm = graft.operators.LanguageModel
    val docs = Tables(spark, sf, "documents")
    val fast = lm.perplexityOf(docs) // model fits → broadcast path
    val joins = lm.perplexityOf(docs, maxBroadcastModel = 0)
    assert(fast.count() == joins.count())
    assert(fast.except(joins).count() == 0)
    assert(joins.except(fast).count() == 0)
  }

  test("moore-lewis: complete coverage, exact score identity") {
    val out = graft.operators.LanguageModel.mooreLewis(spark, sf)
    val n = Tables(spark, sf, "documents")
      .filter(size(split(trim(col("text")), "\\s+")) >= 2).count()
    assert(out.count() == n) // every ≥2-token doc scored under BOTH models
    assert(out.filter(col("ml_score") =!=
      col("bits_target") - col("bits_background")).count() == 0)
    assert(out.filter(col("keep_doc") =!= (col("ml_score") < 0.0))
      .count() == 0)
    // both populations exist on this corpus: some docs read more like
    // the target sources, some less — a degenerate all-true/all-false
    // verdict would mean a broken model side
    assert(out.filter(col("keep_doc")).count() > 0)
    assert(out.filter(!col("keep_doc")).count() > 0)
  }

  test("moore-lewis: fused single-pass equals the two-model join path") {
    val lm = graft.operators.LanguageModel
    val fused = lm.mooreLewis(spark, sf) // default cap → one-collect path
    val joined = lm.mooreLewis(spark, sf, maxBroadcastModel = 0)
    assert(fused.except(joined).count() == 0)
    assert(joined.except(fused).count() == 0)
  }

  test("dsir: hashed-feature weights favor target-like text") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    // full-corpus coverage: every ≥1-token doc gets a weight
    val out = lm.dsir(spark, sf)
    val n = Tables(spark, sf, "documents")
      .filter(size(split(trim(col("text")), "\\s+")) >= 1).count()
    assert(out.count() == n)
    // keep rule is exactly weight_mb > 0; the division is the only
    // double and derives from the integer columns
    assert(out.filter(col("keep_doc") =!= (col("weight_mb") > 0))
      .count() == 0)
    assert(out.filter(abs(col("avg_mb_per_feat") * 1000.0
      * col("n_feats") - col("weight_mb")) > 1e-6).count() == 0)
    // direction: docs FROM the target sources score higher on average
    // than the rest (their n-grams define the target model)
    val bySrc = out.join(Tables(spark, sf, "documents")
        .select(col("doc_id"), col("source")), Seq("doc_id"))
      .withColumn("tgt",
        col("source").isin((0 to 3).map("src" + _): _*))
      .groupBy(col("tgt"))
      .agg(avg(col("avg_mb_per_feat")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(bySrc(true) > bySrc(false),
      s"target-mean ${bySrc(true)} vs rest ${bySrc(false)}")
    // deterministic: same weights on a second run
    assert(lm.dsir(spark, sf).except(out).count() == 0)
    // r10 fast path (DsirModelAgg + DsirDocScore byte passes) is
    // bit-identical to the distributed explode/join formulation —
    // same buckets (Md5Bucket), same millibit legs (the driver fold
    // replicates round(-log2(p)·1000) operation for operation), and
    // Σ_slots l_mb ≡ Σ_buckets c·l_mb
    val joinPath = lm.dsirOf(spark, sf, 4096, fastPath = false)
    assert(out.except(joinPath).count() == 0)
    assert(joinPath.except(out).count() == 0)
  }

  test("dsir featurizer equals the exploded built-ins formulation") {
    // the native one-pass byte featurizer must land every gram in
    // EXACTLY the bucket of the portable plan-side rule
    // conv(substring(md5(g),1,8),16,10) % m — per-doc bucket counts
    // compared against the two-branch explode formulation it replaced
    val m = 4096
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("text"))
    val t = regexp_extract_all(lower(col("text")), lit("\\S+"), lit(0))
    val uni = docs.select(col("doc_id"), explode(t).as("g"))
    val bi = docs.select(col("doc_id"),
      explode(zip_with(slice(t, lit(1), size(t) - 1),
        slice(t, lit(2), size(t) - 1),
        (a, b) => concat_ws(" ", a, b))).as("g"))
    val want = uni.unionByName(bi)
      .select(col("doc_id"),
        (conv(substring(md5(col("g")), 1, 8), 16, 10).cast("long") % m)
          .as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    val got = docs.select(col("doc_id"), explode(
        graft.functions.GraftFunctions.dsirBucketCounts(
          lower(col("text")), m)).as("p"))
      .select(col("doc_id"), col("p.b").as("b"), col("p.c").as("c"))
    assert(got.count() == want.count())
    assert(got.except(want).count() == 0)
    assert(want.except(got).count() == 0)
  }

  test("dsir lifecycle: served weights equal inline, rebuild idempotent") {
    val db = graft.catalog.GraftDatabase(spark, scratch("dsir_model") + "/db")
    val lm = graft.operators.LanguageModel
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    lm.buildDsirModel(db, docs, "dsir")
    val served = lm.dsirFromModel(db, "dsir", docs)
    val inline = lm.dsir(spark, sf)
    assert(served.except(inline).count() == 0)
    assert(inline.except(served).count() == 0)
    // the stored model is m rows + the modulus, never the corpus
    assert(db.read("dsir_buckets").count() == 4096L)
    lm.buildDsirModel(db, docs, "dsir")
    assert(lm.dsirFromModel(db, "dsir", docs).except(inline).count() == 0)
  }

  test("lm lifecycle: served scores equal inline, rebuild idempotent") {
    val db = graft.catalog.GraftDatabase(spark, scratch("lm_model") + "/db")
    val docs = Tables(spark, sf, "documents")
    val lm = graft.operators.LanguageModel
    val train = docs.filter(col("doc_id") % 5 =!= 0)
    val held = docs.filter(col("doc_id") % 5 === 0)
    lm.buildLmModel(db, train, "lm")
    val served = lm.perplexityFromModel(db, "lm", held)
    val inline = lm.perplexityOf(docs)
    assert(served.except(inline).count() == 0)
    assert(inline.except(served).count() == 0)
    // rebuild over the same corpus is a no-op for consumers
    lm.buildLmModel(db, train, "lm")
    assert(lm.perplexityFromModel(db, "lm", held)
      .except(inline).count() == 0)
    // memo hit: a repeat serve under the unchanged artifact (no
    // take/collect/broadcast jobs) is still bit-identical
    assert(lm.perplexityFromModel(db, "lm", held)
      .except(inline).count() == 0)
    // a tight explicit cap must NOT be served an earlier looser
    // call's broadcast — the join path runs and stays bit-identical
    assert(lm.perplexityFromModel(db, "lm", held, maxBroadcastModel = 1)
      .except(inline).count() == 0)
    // a rebuild that CHANGES the model must not serve the memoized
    // broadcast: retrain on the held split itself — now every held
    // bigram is observed and scores genuinely move
    lm.buildLmModel(db, held, "lm")
    val reserved = lm.perplexityFromModel(db, "lm", held)
    assert(reserved.except(served).count() > 0)
    assert(reserved.count() > 0)
  }

  test("moore-lewis lifecycle: served equals inline, memo + cap + retarget") {
    val lm = graft.operators.LanguageModel
    val inline = lm.mooreLewisInline(spark, sf)
    // the public entry serves from the per-corpus scratch artifact
    val served = lm.mooreLewis(spark, sf)
    assert(served.except(inline).count() == 0)
    assert(inline.except(served).count() == 0)
    // second serve hits the broadcast memo — still bit-identical
    assert(lm.mooreLewis(spark, sf).except(inline).count() == 0)
    // explicit-db lifecycle: build + serve on a caller-owned catalog
    val db = graft.catalog.GraftDatabase(spark, scratch("ml_model") + "/db")
    val docs = Tables(spark, sf, "documents")
      .select(col("doc_id"), col("source"), col("text"))
    val ids = docs.select(col("doc_id"), col("text"))
    lm.buildMlModel(db, docs, "ml")
    assert(lm.mooreLewisFromModel(db, "ml", ids)
      .except(inline).count() == 0)
    // a tight explicit cap must NOT be served an earlier looser
    // call's broadcast — the join path runs and stays bit-identical
    assert(lm.mooreLewisFromModel(db, "ml", ids, maxBroadcastModel = 1)
      .except(inline).count() == 0)
    // a rebuild under a DIFFERENT target set must not serve the
    // memoized pair: scores genuinely move (src0-only target)
    lm.buildMlModel(db, docs, "ml", targetSrcs = Seq("src0"))
    val retargeted = lm.mooreLewisFromModel(db, "ml", ids)
    assert(retargeted.except(served).count() > 0)
    assert(retargeted.count() == served.count())
  }

  test("served-model staleness: same-count corpus swap rebuilds the model") {
    import spark.implicits._
    val lm = graft.operators.LanguageModel
    val dir = scratch("ml_swap")
    def write(texts: Seq[String]): Unit = {
      texts.zipWithIndex.map { case (t, i) =>
        (i.toLong, if (i % 2 == 0) "src0" else "src9", t) }
        .toDF("doc_id", "source", "text")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      ()
    }
    write(Seq("alpha beta gamma delta", "beta gamma delta epsilon",
      "gamma delta epsilon zeta", "delta epsilon zeta eta"))
    def scores(df: org.apache.spark.sql.DataFrame): Map[Long, Double] =
      df.select("doc_id", "ml_score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val first = scores(lm.mooreLewis(spark, dir))
    assert(first.size == 4)
    // swap the corpus CONTENT but keep the row count — the old
    // doc-count sidecar could not see this; the file-listing
    // signature must rebuild (and refresh Spark's stale listing
    // cache) and serve the new model
    write(Seq("one one one one", "one two one two",
      "two two two two", "one two three two one"))
    val second = scores(lm.mooreLewis(spark, dir))
    // the serve path's refreshByPath also unsticks this inline read
    val inline = scores(lm.mooreLewisInline(spark, dir))
    assert(second == inline)
    assert(second != first, "stale model served")
  }

  test("C37 temperature mix: sublinear quotas, md5-order fill, exact keep counts") {
    import spark.implicits._
    val cur = graft.operators.Curation
    // skewed sources: 100/25/4 docs — T=2 must compress the spread
    // (10:5:2 in sqrt space, not 25:6.25:1)
    val d = ((0 until 100).map(i => (i.toLong, "big")) ++
      (100 until 125).map(i => (i.toLong, "mid")) ++
      (125 until 129).map(i => (i.toLong, "small")))
      .toDF("doc_id", "source")
    val out = cur.temperatureMixOf(d, budget = 50).persist()
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val denom = math.sqrt(100.0) + math.sqrt(25.0) + math.sqrt(4.0) // 17
    def quota(n: Int) = math.floor(50 * math.sqrt(n.toDouble) / denom).toLong
    assert(kept("big") == quota(100))   // 29
    assert(kept("mid") == quota(25))    // 14
    assert(kept("small") == math.min(4L, quota(4))) // quota 5 > n=4
    // sublinear: big/small count ratio 25x, kept ratio must be ~7x
    assert(kept("big").toDouble / kept("small") < 10.0)
    // md5-order fill: the kept set per source is exactly the quota
    // smallest (md5(id), id) pairs — recompute on the driver
    val wantBig = (0 until 100).map(_.toLong)
      .sortBy(id => (java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString, id))
      .take(quota(100).toInt).toSet
    val gotBig = out.filter(col("source") === "big")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(gotBig == wantBig)
    out.unpersist()
    ()
  }

  test("quality-gate staleness: same-count corpus swap recalibrates the thresholds") {
    import spark.implicits._
    val cur = graft.operators.Curation
    val dir = scratch("qgate_swap")
    def write(texts: Seq[String]): Unit = {
      texts.zipWithIndex.map { case (t, i) => (i.toLong, "srcA", t) }
        .toDF("doc_id", "source", "text")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
      ()
    }
    // 10 docs of stepwise quality (longer = higher q here): top-20%
    // keeps 2; which 2 depends entirely on the corpus content
    def corpus(tag: String) = (1 to 10).map(i =>
      (s"$tag " * (5 * i)).trim + " and the of to is in it.")
    write(corpus("alpha"))
    val first = cur.qualityGateServed(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(first.size == 2)
    // same row count, shuffled quality order: doc_id 0 (shortest ->
    // worst) becomes the longest -> best; a stale gate would keep
    // the OLD boundary and misjudge it
    write(corpus("alpha").reverse)
    val second = cur.qualityGateServed(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val inline = cur.qualityPercentileGateOf(
      spark.read.parquet(s"$dir/documents.parquet"), 20)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(second == inline, "served keep set diverged from batch rank")
    assert(second != first, "stale thresholds served after corpus swap")
    // a different keepPct must RECALIBRATE (the parameter folds into
    // the artifact signature), never serve the 20% thresholds
    val half = cur.qualityGateServed(spark, dir, keepPct = 50)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(half.size == 5, s"keepPct=50 over 10 docs must keep 5: $half")
    assert(second.subsetOf(half))
  }

  test("curriculum: served-from-model output equals the inline retrain") {
    val lm = graft.operators.LanguageModel
    val served = lm.curriculum(spark, sf, 4)
    val inline = lm.curriculumInline(spark, sf, 4)
    assert(served.except(inline).count() == 0)
    assert(inline.except(served).count() == 0)
    // second serve hits the memo (same artifact) — still identical
    assert(lm.curriculum(spark, sf, 4).except(inline).count() == 0)
  }

  test("curriculum: easy-to-hard stage bands, exact band sizes") {
    val out = graft.operators.LanguageModel.curriculum(spark, sf, 4)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2),
        r.getLong(3)))
    val total = out.length
    val width = (total + 3) / 4
    // stage = exact rank band
    out.foreach { case (_, _, pos, stage) =>
      assert(stage == (pos - 1) / width)
    }
    // bands are ordered by score: every stage-s doc scores <= every
    // stage-(s+1) doc (ties broken by doc_id inside a band boundary)
    val byStage = out.groupBy(_._4)
    for (s <- byStage.keys.toSeq.sorted.init) {
      assert(byStage(s).map(_._2).max <= byStage(s + 1).map(_._2).min)
    }
    assert(byStage.keys.toSeq.sorted == Seq(0L, 1L, 2L, 3L))
  }

  test("shard manifest: contiguous ranges, exact totals") {
    val m = graft.operators.Pipeline.shardManifest(spark, sf, 64)
      .collect().sortBy(_.getLong(0))
    val total = Tables(spark, sf, "documents").count()
    assert(m.map(_.getLong(1)).sum == total)
    m.foreach { r =>
      val (sid, n, first, last) =
        (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4))
      assert(first == sid * 64 + 1)
      assert(last - first + 1 == n)
      assert(n == 64 || last == total) // only the tail shard is short
    }
  }

  test("corpus diff: exact planted add/remove/change/unchanged counts") {
    import spark.implicits._
    val old = Seq((1L, "srcA", "x"), (2L, "srcA", "y"), (3L, "srcB", "z"))
      .toDF("doc_id", "source", "text")
    val neu = Seq((2L, "srcA", "y2"), (3L, "srcB", "z"), (4L, "srcB", "w"))
      .toDF("doc_id", "source", "text")
    val out = graft.operators.Curation.corpusDiff(old, neu)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out("srcA") == ((0L, 1L, 1L, 0L)))
    assert(out("srcB") == ((1L, 0L, 0L, 1L)))
  }

  test("pack concat: bins bounded by budget, token-exact, order-preserving") {
    val out = graft.operators.Pipeline.packConcat(spark, sf, budget = 512)
    // C12's bound: a bin minus its FIRST member (which may straddle
    // the boundary from the previous bin) fits strictly inside the
    // budget — total = last_cum − prev_bin_last_cum, so
    // total − first_member < budget always
    val binned = graft.operators.Pipeline.packSequences(spark, sf, 512)
    assert(binned.groupBy(col("source"), col("bin"))
      .agg(sum(col("n_tokens")).as("tot"),
        min_by(col("n_tokens"), col("doc_id")).as("first_tok"))
      .filter(col("tot") - col("first_tok") >= 512).count() == 0)
    // the packed text carries exactly the bin's token count (separator
    // adds no tokens)
    assert(out.filter(
      size(split(col("packed_text"), "\\s+")) =!= col("bin_tokens"))
      .count() == 0)
    // every document lands in exactly one bin
    assert(binned.select("doc_id").distinct().count() == binned.count())
    assert(out.agg(sum(col("n_docs"))).head().getLong(0) == binned.count())
  }

  test("quality percentile gate ≡ window form; per-source calibration") {
    import graft.functions.TextFunctions.qualityFromGate
    val base = Tables(spark, sf, "documents")
      .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
      .select(col("doc_id"), col("source"),
        qualityFromGate(col("__g")).as("q"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("source"))
    val expected = base
      .withColumn("rn", row_number().over(
        w.orderBy(col("q").desc, col("doc_id").asc)).cast("long"))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("rn") * 100 <= lit(20L) * col("n"))
      .select("doc_id", "rn", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gate = graft.operators.Curation.qualityPercentileGate(spark, sf)
      .persist()
    val got = gate.select("doc_id", "rn", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
    // the calibration property the gate exists for: EVERY source with
    // ≥5 docs keeps at least one (a global threshold can zero one
    // out). Derived from the DOCUMENTS table, not the gate's output —
    // grouping the output can never see a source the gate dropped
    // entirely, which is exactly the failure this must catch.
    val bigSources = Tables(spark, sf, "documents")
      .groupBy(col("source")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 5).select("source")
    val uncovered = bigSources.join(gate.select("source").distinct(),
      Seq("source"), "left_anti").count()
    assert(uncovered == 0, s"$uncovered ≥5-doc sources kept nothing")
    gate.unpersist()
  }

  test("pack split: sequences tile exactly, docs tile exactly, split docs") {
    val L = 64L // small seqLen so real docs split across sequences
    val spans = graft.operators.Pipeline.packTokenSpans(spark, sf, 64)
      .persist()
    // every sequence holds exactly L tokens, except each source's LAST
    val bySeq = spans.groupBy(col("source"), col("seq_id"))
      .agg(sum(col("n_toks")).as("tot"))
    val lastSeq = bySeq.groupBy(col("source"))
      .agg(max(col("seq_id")).as("seq_id")).withColumn("is_last", lit(true))
    assert(bySeq.join(lastSeq, Seq("source", "seq_id"), "left")
      .filter(col("is_last").isNull && col("tot") =!= L).count() == 0)
    assert(bySeq.filter(col("tot") > L || col("tot") <= 0).count() == 0)
    // every document's spans tile its token count exactly, contiguously
    val toks = Tables(spark, sf, "documents").select(col("doc_id"),
      graft.functions.TextFunctions.wsTokenCount(col("text")).as("n_tokens"))
      .filter(col("n_tokens") > 0)
    val byDoc = spans.groupBy(col("doc_id"))
      .agg(sum(col("n_toks")).as("tot"), count(lit(1)).as("n_spans"),
        min(col("doc_off")).as("min_off"),
        max(col("doc_off") + col("n_toks")).as("max_end"))
    // tiling: spans sum to the doc's token count, start at offset 0,
    // and end at n_tokens (doc_off is the offset INTO the document)
    assert(byDoc.join(toks, Seq("doc_id"), "full")
      .filter(col("tot").isNull || col("n_tokens").isNull ||
        col("tot") =!= col("n_tokens") || col("min_off") =!= 0L ||
        col("max_end") =!= col("n_tokens")).count() == 0)
    // span lengths bounded by the sequence length
    assert(spans.filter(col("doc_off") < 0 ||
      col("n_toks") <= 0 || col("n_toks") > L).count() == 0)
    // at L=64 some document MUST split (sf docs run longer than 64)
    assert(byDoc.filter(col("n_spans") > 1).count() > 0)
    spans.unpersist()
  }

  test("bpe merges: hand-computed sequence on the classic corpus") {
    import spark.implicits._
    // Sennrich-style fixture: "low"×5 "lower"×2 "newest"×6 "widest"×3.
    // Hand-derived merge order under (count DESC, left ASC, right ASC):
    //   1. (e,s)  9   (newest 6 + widest 3; ties (s,t) 9, 'e' < 's')
    //   2. (es,t) 9
    //   3. (l,o)  7   (low 5 + lower 2; ties (o,w) 7, 'l' < 'o')
    //   4. (lo,w) 7
    //   5. (e,w)  6   (ties (n,e)/(w,est) 6, 'e' < 'n' < 'w')
    val texts = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest"))
      .mkString(" ")
    val m = graft.operators.Bpe.learnMergesOf(spark,
        Seq(texts).toDF("text"), nMerges = 5, minPair = 2L)
      .orderBy("rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq == Seq(
      (1L, "e", "s", 9L), (2L, "es", "t", 9L), (3L, "l", "o", 7L),
      (4L, "lo", "w", 7L), (5L, "e", "w", 6L)))
  }

  test("bpe regimes: in-core trainer ≡ distributed rounds (r15 OPT)") {
    import spark.implicits._
    // mixes ties (the UTF-8-order tie-break), multi-char merges, a
    // word with a repeated pair ("aaa" non-overlap), and a non-ASCII
    // token so the driver's code-point split is exercised
    val texts = (Seq.fill(5)("low") ++ Seq.fill(2)("lower") ++
      Seq.fill(6)("newest") ++ Seq.fill(3)("widest") ++
      Seq.fill(4)("aaa") ++ Seq.fill(2)("żółw")).mkString(" ")
    val df = Seq(texts).toDF("text")
    val incore = graft.operators.Bpe
      .learnMergesOf(spark, df, 8, 2L).orderBy("rank").collect().toSeq
    val dist = graft.operators.Bpe
      .learnMergesOf(spark, df, 8, 2L, maxDriverVocab = 0)
      .orderBy("rank").collect().toSeq
    assert(incore == dist && incore.nonEmpty)
    val docs = Seq((1L, texts)).toDF("doc_id", "text")
    val va = graft.operators.Bpe
      .segmentVocabForSpec(spark, docs, 8, Int.MaxValue)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    val vb = graft.operators.Bpe
      .segmentVocabForSpec(spark, docs, 8, 0)
      .orderBy("word").collect()
      .map(r => (r.getString(0), r.getSeq[String](1))).toSeq
    assert(va == vb && va.nonEmpty)
  }

  test("bpe merge pass: left-to-right non-overlap, determinism") {
    import spark.implicits._
    // "aaa" under (a,a) fuses the FIRST pair only
    val out = Seq(Tuple1(Seq("a", "a", "a"))).toDF("syms")
      .select(graft.operators.Bpe.mergeOnce(col("syms"), "a", "a").as("m"))
      .head().getSeq[String](0)
    assert(out == Seq("aa", "a"))
    // same corpus twice → identical merge table
    val a = graft.operators.Bpe.learnMerges(spark, sf).collect().toSeq
    val b = graft.operators.Bpe.learnMerges(spark, sf).collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("bpe segment: exact symbols under the learned merges") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low lower newest widest"),
      (2L, (Seq.fill(4)("low") ++ Seq.fill(2)("lower") ++
        Seq.fill(6)("newest") ++ Seq.fill(3)("widest")).mkString(" "))
    ).toDF("doc_id", "text")
    // corpus counts: low 5, lower 3, newest 7, widest 4 → same merge
    // order as the classic fixture ((e,s),(es,t),(l,o),(lo,w),(e,w)
    // lead; later merges only fuse further, so the 5-merge prefix
    // drives the interesting splits); with all 10 merges "low" is one
    // symbol and reassembly stays lossless — pinned exactly on doc 1
    val out = graft.operators.Bpe.segmentCorpusOf(spark, docs, 5)
      .filter(col("doc_id") === 1).head()
    assert(out.getLong(1) == 4) // n_tokens
    assert(out.getString(3) == "low low e r n ew est w i d est")
    assert(out.getLong(2) == 11) // n_symbols
  }

  test("shuffled export: disjoint ordered hash ranges, reproducible") {
    val dir = scratch("export_shuffled")
    val db = catalog.GraftDatabase(spark, s"$dir/db")
    import spark.implicits._
    (0 until 20000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .write.mode(org.apache.spark.sql.SaveMode.Overwrite)
      .parquet(s"$dir/db/t")
    val shrunk = Seq(
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16KB",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "4KB")
    val prev = shrunk.map { case (k, _) => k -> spark.conf.getOption(k) }
    shrunk.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      db.exportShuffled("t", s"$dir/out1", Seq("id"))
      db.exportShuffled("t", s"$dir/out2", Seq("id"))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
    def spans(path: String): Seq[(String, String, Long)] = {
      val parts = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName).toSeq
      assert(parts.length > 1, "expected a parallel multi-file write")
      parts.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .select(md5(col("id").cast("string")).as("h"))
          .agg(min(col("h")), max(col("h")), count(lit(1))).head()
        (r.getString(0), r.getString(1), r.getLong(2))
      }
    }
    val s1 = spans(s"$dir/out1")
    // per-file hash ranges disjoint and ordered by file name — the
    // lexicographic part order IS the permutation
    s1.sliding(2).foreach {
      case Seq((_, hi1, _), (lo2, _, _)) => assert(hi1 <= lo2)
      case _ =>
    }
    // same PERMUTATION on a re-run: file boundaries may move (range
    // sampling), but the concatenated order is a pure function of the
    // data, not of RNG or cluster state
    def sequence(path: String): Seq[Long] = {
      val parts = new java.io.File(path).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.getName).toSeq
      parts.flatMap { f =>
        spark.read.parquet(f.getAbsolutePath)
          .select(col("id"), md5(col("id").cast("string")).as("h"))
          .orderBy(col("h"), col("id"))
          .collect().map(_.getLong(0))
      }
    }
    assert(sequence(s"$dir/out1") == sequence(s"$dir/out2"))
    // complete round trip
    assert(spark.read.parquet(s"$dir/out1").select("id").distinct()
      .count() == 20000)
  }
}
