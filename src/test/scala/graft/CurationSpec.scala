package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.GraftFunctions.bloomMightContain
import graft.operators.Curation

/** Corpus-curation operators (SURVEY.md §2.C13–C15, E8–E9). */
class CurationSpec extends AnyFunSuite with SparkTestBase {

  test("contamination flags a doc sharing a 13-gram with the benchmark slice") {
    import spark.implicits._
    val clean = (1 to 30).map(i =>
      (i.toLong, s"w${i}a w${i}b w${i}c w${i}d w${i}e w${i}f w${i}g " +
        s"w${i}h w${i}i w${i}j w${i}k w${i}l w${i}m w${i}n"))
    val benchText = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11 b12 b13 b14"
    // doc 0 is benchmark (0 mod 97); doc 50 copies it verbatim
    val docs = (Seq((0L, benchText), (50L, benchText)) ++ clean)
      .toDF("doc_id", "text")
    val got = Curation.contaminationOf(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(!got.contains(0L), "benchmark docs must not be scored")
    // 14 tokens → two distinct 13-grams, both shared
    assert(got(50L) == ((2L, 1)))
    assert(got(1L) == ((0L, 0)))
    assert(got.size == 31)
    // the hashed-probe production path computes the same result
    val hashed = Curation.contaminationOf(docs, hashGrams = true)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    assert(hashed == got)
  }

  test("bloom expression: no false negatives, few false positives") {
    import spark.implicits._
    val members = (0 until 1000).map(i => s"member-$i")
    val bf = members.toDF("s").stat.bloomFilter("s", 1000, 0.01)
    val bos = new java.io.ByteArrayOutputStream()
    bf.writeTo(bos)
    val bytes = bos.toByteArray
    val probes = (members ++ (0 until 1000).map(i => s"other-$i")).toDF("s")
      .select(col("s"), bloomMightContain(col("s"), bytes).as("hit"))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(members.forall(probes(_)), "bloom false negative")
    val fp = (0 until 1000).count(i => probes(s"other-$i"))
    assert(fp <= 50, s"fp=$fp way above the 1% design point")
  }

  test("incremental-new equals the exact anti-join regardless of bloom fp") {
    import spark.implicits._
    val old = (0 until 500).map(i => (i.toLong, "old", s"doc text $i"))
      .toDF("doc_id", "source", "text")
    // 100 genuinely new + 50 retreads of old content
    val fresh = ((1000 until 1100).map(i => (i.toLong, "new", s"fresh text $i"))
      ++ (2000 until 2050).map(i => (i.toLong, "new", s"doc text ${i - 2000}")))
      .toDF("doc_id", "source", "text")
    // fpp deliberately terrible so false positives definitely occur
    // and the verify join must clean them up
    val got = Curation.incrementalNewOf(old, fresh, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == (1000L until 1100L).toSeq)

    // NULL text must be kept as new (the oracle's NOT EXISTS is never
    // true for NULL), not dropped by three-valued bloom logic
    val withNull = fresh.unionByName(
      Seq((3000L, "new", null.asInstanceOf[String]))
        .toDF("doc_id", "source", "text"))
    val got2 = Curation.incrementalNewOf(old, withNull, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted
    assert(got2.toSeq == ((1000L until 1100L) :+ 3000L).toSeq)
  }

  test("bucketed bloom index: exact past the single-plan filter ceiling") {
    import spark.implicits._
    // An old corpus big enough that a SINGLE plan-embedded filter is
    // the wrong shape (the per-bucket index shards it): 50k rows
    // across 8 buckets. Exactness must match the plain C15 and the
    // brute-force anti-join, including under a terrible fpp.
    val old = (0 until 50000).map(i => (i.toLong, "old", s"doc text $i"))
      .toDF("doc_id", "source", "text")
    val fresh = ((1000000 until 1000100)
        .map(i => (i.toLong, "new", s"fresh text $i"))
      ++ (2000000 until 2000050)
        .map(i => (i.toLong, "new", s"doc text ${i - 2000000}"))
      :+ ((3000000L, "new", null.asInstanceOf[String])))
      .toDF("doc_id", "source", "text")
    val want = Curation.incrementalNewOf(old, fresh)
      .select("doc_id").as[Long].collect().sorted.toSeq
    val got = Curation.incrementalNewBucketedOf(old, fresh, nBuckets = 8)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(got == want)
    val gotBadFpp = Curation
      .incrementalNewBucketedOf(old, fresh, nBuckets = 8, fpp = 0.5)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(gotBadFpp == want, "false positives must be verified away")
    // the index itself: one filter per non-empty bucket, and every
    // old content hash probes positive in its own bucket's filter
    val idx = Curation.bucketedBloomIndex(old, 8, 50000 / 8)
      .collect().map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    assert(idx.size == 8)
    val filters = idx.map { case (b, bytes) =>
      b -> org.apache.spark.util.sketch.BloomFilter.readFrom(
        new java.io.ByteArrayInputStream(bytes))
    }
    val hashes = old.select(
        pmod(xxhash64(col("text")), lit(8)).as("b"),
        xxhash64(col("text")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(hashes.forall { case (b, h) => filters(b).mightContainLong(h) },
      "bucketed bloom false negative")
    // the probe side is co-partitioned by bucket BEFORE the index
    // join (the nBuckets-row index broadcasts, so without this every
    // task would decode every bucket's filter through the per-task
    // cache — the single-plan ceiling again, per executor)
    val plan = Curation.incrementalNewBucketedOf(old, fresh, nBuckets = 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("hashpartitioning(__b"), plan.take(3000))
  }

  test("duplicated-ngram fraction: copies score 1, unique prose 0") {
    import spark.implicits._
    val boiler = "one two three four five six seven eight"
    val docs = Seq(
      (1L, boiler),                                  // duplicated verbatim
      (2L, boiler),
      (3L, "purple monkeys debate quantum finance on tuesday evenings"),
      (4L, s"$boiler unique tail here now honestly"),// half boilerplate
      (5L, "too short")                              // < 5 tokens: no row
    ).toDF("doc_id", "text")
    val got = Curation.dupNgramsOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(!got.contains(5L))
    assert(got(1L) == ((4L, 4L, 1.0)))
    assert(got(2L) == ((4L, 4L, 1.0)))
    assert(got(3L) == ((4L, 0L, 0.0)))
    // doc 4: 13 tokens -> 9 slots; the 4 slots fully inside the
    // boilerplate prefix are shared with docs 1/2
    assert(got(4L)._1 == 9L)
    assert(got(4L)._2 == 4L)
  }

  test("pii redaction: all four classes redacted, counts exact, idempotent") {
    import spark.implicits._
    val s = "call 555-123-4567 or mail a.b@x.io from 10.1.2.3 ssn 123-45-6789"
    val df = Seq(s).toDF("t")
    val counts = Curation.PiiPatterns.map { case (name, pat, _) =>
      size(regexp_extract_all(col("t"), lit(pat), lit(0))).as(name)
    }
    val c = df.select(counts: _*).head()
    assert((0 until 4).forall(c.getInt(_) == 1), c.toString)
    val red = df.select(Curation.piiRedact(col("t")).as("r"))
      .head().getString(0)
    assert(red == "call [PHONE] or mail [EMAIL] from [IP] ssn [SSN]")
    val twice = Seq(red).toDF("t")
      .select(Curation.piiRedact(col("t"))).head().getString(0)
    assert(twice == red, "redaction must be idempotent")
  }

  test("repetition metrics on a degenerate and a diverse doc") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spam spam spam spam"),
      (2L, "all words here differ totally")).toDF("doc_id", "text")
    val m = Curation.repetitionOf(docs)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(m(1L) == ((1.0, 2.0 / 3.0, 1.0)))
    assert(m(2L) == ((1.0 / 5.0, 0.0, 1.0 / 4.0)))
  }

  test("domain mix keeps every rate-100 doc and respects the md5 bucket rule") {
    val got = Curation.domainMix(spark, sf)
    val full = Tables(spark, sf, "documents")
    val keptBySrc = got.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val totalBySrc = full.groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for (s <- Seq("src0", "src1", "src2", "src3"))
      assert(keptBySrc.getOrElse(s, 0L) == totalBySrc(s), s"rate-100 $s")
    // downsampled sources keep strictly fewer (25 docs/source at this
    // sf makes a 0-kept rate-10 source possible, but never a full one)
    for ((s, n) <- keptBySrc if !Seq("src0", "src1", "src2", "src3").contains(s))
      assert(n < totalBySrc(s), s"downsampled $s kept all $n")
  }

  test("cluster mix: deterministic report, caps and totals exact") {
    val k = 8
    val a = Curation.clusterMix(spark, sf, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    val b = Curation.clusterMix(spark, sf, k).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq == b.toSeq) // fixed seeds, fixed tie-breaks
    val total = Tables(spark, sf, "embeddings").count()
    assert(a.map(_._2).sum == total) // every vector in exactly one cell
    val cap = (total + k - 1) / k
    a.foreach { case (_, n, kept) =>
      assert(kept == math.min(n, cap))
    }
  }

  test("gopher rules: each gate flips at its published boundary") {
    import spark.implicits._
    def words(n: Int, w: String = "word"): String =
      Seq.fill(n)(w).mkString(" ")
    // base passes every gate: 60 4-char words incl. two stopwords
    val base = "the and plant " + words(57)
    val docs = Seq(
      (1L, base),                                  // all gates pass
      (2L, "the and " + words(40)),                // 42 words < 50
      (3L, "of to " + words(58, "xx")),            // mean word len 2 < 3
      (4L, "the and " + words(58, "anticonstitutionnellement")), // len > 10
      (5L, base + " " + Seq.fill(7)("#").mkString(" ")), // 67 words, 7 '#' > 6.7
      (6L, "the of " + words(58, "123456")),       // alpha words 2/60 < 80%
      (7L, words(60, "blue")),                     // zero stopwords
      (8L, base + "\nended...\nalso...\nplain one\nplain two"), // 2/5 ell > 30%
      (9L, base + "\n- b1\n- b2\n- b3\n- b4\n- b5\n- b6\n- b7\n- b8\n- b9\n- b10") // 10/11 bullets > 90%
    ).toDF("doc_id", "text")
    val got = Curation.gopherRulesOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def ok(id: Long, colName: String): Boolean =
      got(id).getAs[Boolean](colName)
    assert(ok(1L, "keep"), "base doc must pass the whole battery")
    assert(!ok(2L, "word_count_ok") && ok(2L, "mean_word_len_ok"))
    assert(!ok(3L, "mean_word_len_ok") && ok(3L, "word_count_ok"))
    assert(!ok(4L, "mean_word_len_ok"))
    assert(!ok(5L, "symbol_ratio_ok") && ok(5L, "word_count_ok"))
    assert(!ok(6L, "alpha_ratio_ok"))
    assert(!ok(7L, "stopwords_ok") && ok(7L, "alpha_ratio_ok"))
    assert(!ok(8L, "ellipsis_ok") && ok(8L, "bullet_ok"))
    assert(!ok(9L, "bullet_ok") && ok(9L, "ellipsis_ok"))
    for (id <- 2L to 9L) assert(!ok(id, "keep"), s"doc $id must fail keep")
  }

  test("gopher rules: integer cross-multiplication sits exactly on the boundary") {
    import spark.implicits._
    // 50 words of exactly 3 chars → mean = 3.0: inclusive bound keeps it;
    // 5 symbols in 50 words → ratio exactly 0.1: inclusive bound keeps it
    val txt = "the and " + Seq.fill(43)("abc").mkString(" ") +
      " # # # # #"
    val d = Seq((1L, txt)).toDF("doc_id", "text")
    val r = Curation.gopherRulesOf(d).collect()(0)
    assert(r.getAs[Long]("n_words") == 50L)
    assert(r.getAs[Boolean]("word_count_ok"))
    assert(r.getAs[Boolean]("symbol_ratio_ok"), "0.1 is ≤, not <")
    // one more symbol tips it
    val r2 = Curation.gopherRulesOf(
      Seq((1L, txt + " #")).toDF("doc_id", "text")).collect()(0)
    assert(!r2.getAs[Boolean]("symbol_ratio_ok"))
    // the Unicode ellipsis counts as a symbol too (review r7: the
    // published rule covers both forms; the line rule always did)
    val r3 = Curation.gopherRulesOf(
      Seq((1L, "the and " + Seq.fill(50)("word").mkString(" ") +
        " " + Seq.fill(7)("\u2026").mkString(" ")))
        .toDF("doc_id", "text")).collect()(0)
    assert(!r3.getAs[Boolean]("symbol_ratio_ok"),
      "7 ellipses in 59 words must fail the 0.1 symbol ratio")
  }
  test("boilerplate removal: per-source frequency, all copies deleted") {
    import spark.implicits._
    val docs = Seq(
      // the same 8-token line in TWO src0 docs -> boilerplate there,
      // every copy deleted (including the first - the C23 contrast)
      (1L, "src0", "nav nav nav nav nav nav nav nav a b c d e f g h"),
      (2L, "src0", "nav nav nav nav nav nav nav nav i j k l m n o p"),
      // the SAME line occurs in only ONE src1 doc -> content there, kept
      (3L, "src1", "nav nav nav nav nav nav nav nav q r s t u v w x"),
      // within-doc repeat, single doc -> ddf=1, BOTH copies kept
      // (C23 keep-first would delete the second)
      (4L, "src1", "z1 z2 z3 z4 z5 z6 z7 z8 z1 z2 z3 z4 z5 z6 z7 z8"),
      // empty doc -> zero lines, still a result row (totality)
      (5L, "src2", "")
    ).toDF("doc_id", "source", "text")
    val out = Curation.boilerplateLinesOf(docs, 8, 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out(1L) == ((2L, 1L, "a b c d e f g h")))
    assert(out(2L) == ((2L, 1L, "i j k l m n o p")))
    assert(out(3L) ==
      ((2L, 2L, "nav nav nav nav nav nav nav nav q r s t u v w x")))
    assert(out(4L) ==
      ((2L, 2L, "z1 z2 z3 z4 z5 z6 z7 z8 z1 z2 z3 z4 z5 z6 z7 z8")))
    assert(out(5L) == ((0L, 0L, "")))
  }
}
