package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** E11/E12: persisted inverted text index + keyword search
  * (SURVEY.md §2.E) — the corpus-exploration surface a training-data
  * build uses to audit what went into the mix ("which documents say
  * X", "where does this phrase come from").
  *
  * The index is a positional postings table
  * `(term, doc_id, positions sorted array<int>, tf)` written
  * hash-BUCKETED by term into a [[graft.catalog.GraftDatabase]] —
  * the D9 lifecycle: build once at ingest, serve every query from
  * the artifact, re-attach across processes without a rewrite.
  * Serving never scans the corpus: a query's terms prune to their
  * buckets (SelectedBucketsCount in the plan — pinned in spec), and
  * only those terms' postings flow into the join/aggregation.
  *
  * Scale shape: the build is one tokenize→posexplode→group pass
  * (map-side combined, shuffled once on the term — the same key the
  * layout buckets by, so the write adds no second exchange); postings
  * rows are bounded by document length. Conjunctive search shuffles
  * only the queried terms' postings (≪ corpus); phrase search
  * resolves adjacency entirely from the positional payload — shift
  * term k's positions by −k and intersect sorted int arrays — no
  * re-scan of any document text.
  */
object TextIndex {

  /** Build (or rebuild) the postings artifact for `docs`, plus the
    * ranking companions BM25 serving needs without ever re-reading
    * the corpus: `<table>_len` (doc_id, dl) bucketed by doc_id — the
    * join side of per-doc length normalization — the batch-keyed
    * `<table>_corpus` (n_docs, total_len), and the batch-keyed
    * per-term `<table>_df` document frequencies bucketed by term.
    * Postings/lens/corpus come out of ONE tokenize pass; df is an
    * exchange-free agg over the written postings layout.
    */
  def buildIndex(db: graft.catalog.GraftDatabase, table: String,
      docs: DataFrame, nBuckets: Int): Unit = {
    // The artifacts are separate ACTIONS over one tokenize subtree —
    // unpersisted, Spark re-runs the corpus-scale tokenize per action
    // (r13 VERDICT #1: this tripled the build's scan cost). Persist
    // the tokenized frame for exactly the span of the dependent
    // writes: MEMORY_AND_DISK so a 100 TB corpus spills instead of
    // evicting (an eviction would silently re-tokenize), released
    // synchronously below — the writes all run inside this call, so
    // no listener machinery is needed.
    val tok = tokenized(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val (postings, lens0, _) = batchArtifacts(tok, batchId = -1L)
    // r16 OPT (guide §1.4/§2.4): the 1-row `_corpus` stats are an
    // OBSERVATION on the `_len` write pass — the separate
    // lens.agg(count, sum) action over the persisted tokenize (one
    // more job + driver gap on a 12-job build) is folded into the
    // write that streams the same rows anyway. Same values by
    // construction: n_docs counts the lens rows, total_len sums dl.
    val obs = new org.apache.spark.sql.Observation(s"${table}_corpus_stats")
    val lens = lens0.observe(obs, count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
    // postings first: its tokenize materializes the shared cache.
    db.writeBucketed(postings, table, "term", nBuckets)
    // r16 OPT (guide §2.6 overlap independent jobs): `_len` (reads
    // the persisted tokenize) and `_df` (an exchange-free agg over
    // the JUST-WRITTEN postings layout — column-pruned to `term`,
    // term bucketing satisfies the groupBy's clustering, so never a
    // second tokenize pass; batch-keyed like `_corpus`: base build =
    // batch −1, G10 appends publish partials, serving SUMS —
    // replay-safe, no read-modify-write) are independent of each
    // other. Submitting both from a 2-thread pool back-fills the
    // cluster through each write's commit/DDL tail instead of paying
    // the two tails sequentially. Failures propagate: Await rethrows.
    val dfs = db.readBucketed(table).groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
      .select(lit(-1L).as("batch_id"), col("term"), col("df"))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val fLen = scala.concurrent.Future(
        db.writeBucketed(lens, s"${table}_len", "doc_id", nBuckets))
      val fDf = scala.concurrent.Future(
        db.writeBucketed(dfs, s"${table}_df", "term", nBuckets))
      scala.concurrent.Await.result(fLen,
        scala.concurrent.duration.Duration.Inf)
      scala.concurrent.Await.result(fDf,
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    // batch-keyed stats row (base build = batch −1), from the
    // observation riding the `_len` write: same LocalTableScan write
    // the old 1-row stats frame planned, minus its corpus-scale agg.
    val st = obs.get
    val spark = docs.sparkSession
    import spark.implicits._
    val stats = Seq((-1L, st("n_docs").asInstanceOf[Long],
        Option(st("total_len")).map(_.asInstanceOf[Long])))
      .toDF("batch_id", "n_docs", "total_len")
    db.write(stats, s"${table}_corpus", org.apache.spark.sql.SaveMode.Overwrite)
    } finally tok.unpersist(blocking = false)
  }

  /** One tokenize projection of a (doc_id, text) frame — THE shared
    * subtree of every index artifact. Callers that action more than
    * one derived artifact must persist this frame across those
    * actions (see [[buildIndex]]) or each action re-tokenizes.
    */
  private[graft] def tokenized(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("__t"))

  /** The three per-batch index artifacts over a [[tokenized]] frame:
    * positional postings, doc lengths, and the 1-row batch stats.
    * `tok` should already be persisted by the caller when all three
    * will be actioned.
    */
  private[graft] def batchArtifacts(
      tok: DataFrame, batchId: Long): (DataFrame, DataFrame, DataFrame) = {
    val postings = tok
      .select(col("doc_id"), posexplode(col("__t")).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
    val lens = tok.select(col("doc_id"),
      size(col("__t")).cast("bigint").as("dl"))
    val stats = lens.agg(count(lit(1)).as("n_docs"),
      sum(col("dl")).as("total_len"))
      .select(lit(batchId).as("batch_id"), col("n_docs"), col("total_len"))
    (postings, lens, stats)
  }

  /** Conjunctive (AND) keyword search against the served index:
    * documents containing EVERY query term, with the total number of
    * occurrences of the query terms. The isin filter prunes the
    * bucketed scan to the terms' buckets.
    */
  def searchAll(db: graft.catalog.GraftDatabase, table: String,
      terms: Seq[String]): DataFrame = {
    val t = terms.distinct
    db.readBucketed(table)
      .filter(col("term").isin(t: _*))
      .groupBy(col("doc_id"))
      // count(1), NOT count(distinct term): postings hold exactly one
      // row per (term, doc_id) by construction (buildIndex groups on
      // that key), so the row count IS the distinct-term count — and
      // the distinct form planned Spark's two extra aggregate phases
      // for nothing (r10: the serve row is fixed-overhead-bound, so
      // dropping a phase is the lever).
      .agg(count(lit(1)).as("__nt"), sum(col("tf")).as("n_occ"))
      .filter(col("__nt") === t.length)
      .select(col("doc_id"), col("n_occ"))
  }

  /** Phrase search: documents containing the terms ADJACENT in
    * order, with the number of distinct start positions. Term k's
    * postings join on doc_id with positions shifted by −k; the match
    * count is the size of the k-way sorted-array intersection.
    */
  def searchPhrase(db: graft.catalog.GraftDatabase, table: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "empty phrase")
    val idx = db.readBucketed(table)
    val parts = phrase.zipWithIndex.map { case (term, k) =>
      idx.filter(col("term") === term)
        .select(col("doc_id"),
          transform(col("positions"), p => p - k).as(s"__p$k"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("doc_id")))
    val inter = (1 until phrase.length).foldLeft(col("__p0")) {
      (acc, k) => array_intersect(acc, col(s"__p$k"))
    }
    joined.select(col("doc_id"), size(inter).cast("bigint").as("n_matches"))
      .filter(col("n_matches") > 0)
  }

  /** E13: BM25-ranked retrieval from the served index — top-k docs
    * for a bag-of-terms query, k1=1.2, b=0.75, with a LOG-FREE
    * rational idf `(N − df + 0.5)/(df + 0.5)` (the standard
    * Robertson idf minus its ln wrapper: ln is engine-specific at
    * the ulp level, while +,−,×,÷ are IEEE-deterministic, so the
    * score doubles are bit-identical across engines — the same
    * portability discipline as E10's integer-sums-one-division; ln
    * is monotone, so per-term contributions keep BM25's ordering
    * behavior).
    *
    * Serving cost ∝ the query terms' postings: each term is a
    * bucket-pruned scan (doc_id, tf); candidates assemble with a
    * full-outer join chain (absent term → tf 0, contribution 0);
    * the dl normalization joins `<table>_len` on doc_id — the join
    * input is already hash-partitioned by doc_id from the candidate
    * join, and the len table's doc_id bucketing spares ITS exchange.
    *
    * N/total_len/df ride IN the plan as one broadcast 1-row frame
    * (r9 VERDICT #3): the previous shape collect()ed them first —
    * two sequential driver jobs before the real query even planned,
    * which dominated serve latency (and D13 pays it per hybrid
    * query). df comes from the build-time `_df` artifact (a
    * bucket-pruned O(|terms|)-row scan), so the whole serve is ONE
    * job. The values are identical exact longs cast to double and
    * the score parenthesization is unchanged, so bit equality with
    * the oracle is unaffected. No corpus scan anywhere.
    */
  def searchRanked(db: graft.catalog.GraftDatabase, table: String,
      terms: Seq[String], k: Int): DataFrame = {
    require(terms.nonEmpty, "empty query")
    val t = terms.distinct
    val idx = db.readBucketed(table)
    // fixed schema: skips the parquet footer-inference job spark.read
    // would launch at plan time (the last driver pre-action here)
    val corpus = db.read(s"${table}_corpus",
        "batch_id BIGINT, n_docs BIGINT, total_len BIGINT")
      .agg(sum(col("n_docs")).cast("double").as("__n"),
        sum(col("total_len")).cast("double").as("__l"))
    // One batch-df row per (batch, term), so a global conditional sum
    // over the pruned scan pivots the ≤|terms| totals into one row; a
    // term absent from the corpus sums to NULL → df 0.0, as before.
    // Indexes written before the `_df` artifact existed (r10) serve
    // via the pre-r10 on-the-fly aggregation over the pruned postings
    // scan — one row per (term, doc_id), so COUNT is df — instead of
    // failing on the missing path; the existence probe is one driver
    // FS metadata call, no job.
    val dfRow =
      if (db.tableExists(s"${table}_df")) {
        val dfAggs = t.zipWithIndex.map { case (term, i) =>
          sum(when(col("term") === term, col("df")))
            .cast("double").as(s"__df$i")
        }
        db.readBucketed(s"${table}_df")
          .filter(col("term").isin(t: _*))
          .agg(dfAggs.head, dfAggs.tail: _*)
      } else {
        val dfAggs = t.zipWithIndex.map { case (term, i) =>
          sum(when(col("term") === term, lit(1L)))
            .cast("double").as(s"__df$i")
        }
        idx.filter(col("term").isin(t: _*)).agg(dfAggs.head, dfAggs.tail: _*)
      }
    val scalars = broadcast(corpus.crossJoin(dfRow))
    val parts = t.zipWithIndex.map { case (term, i) =>
      idx.filter(col("term") === term)
        .select(col("doc_id"), col("tf").cast("double").as(s"__tf$i"))
    }
    val joined = parts.reduce((a, b) => a.join(b, Seq("doc_id"), "full_outer"))
    val withLen = joined.join(
      db.readBucketed(s"${table}_len")
        .select(col("doc_id"), col("dl").cast("double").as("__dl")),
      Seq("doc_id"))
      .crossJoin(scalars)
    // Pinned operation order — the oracle SQL parenthesizes
    // identically; any reassociation breaks bit equality.
    val bNorm = lit(1.2) * (lit(0.25) + ((lit(0.75) * col("__dl")) * col("__n")) / col("__l"))
    val score = t.zipWithIndex.map { case (term, i) =>
      val df = coalesce(col(s"__df$i"), lit(0.0))
      val idf = ((col("__n") - df) + lit(0.5)) / (df + lit(0.5))
      val tf = coalesce(col(s"__tf$i"), lit(0.0))
      (idf * (tf * lit(2.2))) / (tf + bNorm)
    }.reduce(_ + _)
    withLen.select(col("doc_id"), score.as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }

  // ---- driver-contract fixtures: index built ONCE per corpus dir
  // per JVM into a scratch warehouse (the bucketedWarehouse memo
  // pattern — a persisted index is a storage decision, not per-query
  // work; a layout from a previous process re-attaches by sidecar)
  private val indexReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Bucket count for a corpus of `bytes` on-disk parquet: ~32 MB of
    * corpus per bucket, floored at 4 (so term-probe pruning stays
    * meaningful on tiny corpora) and capped at 4096 (file-count
    * hygiene). r15 OPT, guide §2 "derive partitioning from input
    * size": the previous `defaultParallelism` choice tuned the layout
    * to CLUSTER width — 3×32 near-empty files and 3×32 write-task
    * dispatches per build over a 30 MB corpus locally, while a
    * 100 TB corpus wants far MORE buckets than cores. The build and
    * every serving process derive the same count from the same
    * listing (the table name embeds it), so cross-process re-attach
    * is unchanged; tools/scale10.py's served-twin SQL computes the
    * same formula.
    */
  private[graft] def bucketsFor(bytes: Long): Int =
    math.min(4096L, math.max(4L, bytes / (32L << 20) + 1)).toInt

  private def indexHandles(spark: SparkSession,
      dir: String): (graft.catalog.GraftDatabase, String, String, Int) = {
    val p = new org.apache.hadoop.fs.Path(s"$dir/documents.parquet")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bytes =
      try fs.getContentSummary(p).getLength
      catch { case _: Exception => 0L }
    val n = bucketsFor(bytes)
    val key = s"${new org.apache.hadoop.fs.Path(dir).getName}_$n"
    val db = graft.catalog.GraftDatabase(spark,
      s"${CsvQueries.scratchRoot}/textindex_$key/db")
    (db, s"postings_b$n", key, n)
  }

  private[operators] def servedIndex(spark: SparkSession,
      dir: String): (graft.catalog.GraftDatabase, String) = {
    val (db, table, key, n) = indexHandles(spark, dir)
    if (!indexReady.contains(key)) {
      val docs = Tables(spark, dir, "documents")
      // Staleness probe via the `_corpus` SIDECAR the build already
      // writes (VERDICT r7 #5): Σ n_docs over its batch rows vs the
      // corpus's parquet metadata count — both O(rows-of-metadata).
      // The old probe distinct-counted doc_id over the WHOLE postings
      // index plus a corpus count on first serve per JVM, folding an
      // index-scale scan into the first timed query (2.34 s where the
      // pruned-bucket probe itself is ~0.1 s).
      val fresh = db.registerBucketed(table, "term", n) &&
        db.registerBucketed(s"${table}_len", "doc_id", n) &&
        db.registerBucketed(s"${table}_df", "term", n) &&
        (try db.read(s"${table}_corpus")
          .agg(sum(col("n_docs"))).collect()(0).getLong(0) == docs.count()
        catch { case _: Exception => false })
      if (!fresh) buildIndex(db, table, docs, n)
      indexReady.add(key)
      ()
    }
    (db, table)
  }

  /** The build surface as its own query row (VERDICT r7 #5: report
    * build and serve separately — the old shape folded the one-time
    * build into whichever search query ran first). Rebuilds the
    * served artifact unconditionally (that is the point: this row's
    * timing IS the build cost) and returns the corpus stats the
    * sidecar check serves from — which gives the build an exact
    * oracle (doc count + token total) instead of a rows-only smoke.
    */
  def buildForDir(spark: SparkSession, dir: String): DataFrame = {
    val (db, table, key, n) = indexHandles(spark, dir)
    buildIndex(db, table, Tables(spark, dir, "documents"), n)
    indexReady.add(key)
    db.read(s"${table}_corpus")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("total_len")).as("total_len"))
  }

  val oracles: Map[String, String] = Map(
    "text_index_build" ->
      """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(regexp_extract_all(text, '\S+'))) AS BIGINT)
        |    AS total_len
        |FROM documents""".stripMargin,
    "text_search_and" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') t
        |             FROM documents)
        |SELECT doc_id,
        |  CAST(len(list_filter(t, x -> x = 'batch'))
        |     + len(list_filter(t, x -> x = 'merge')) AS BIGINT) AS n_occ
        |FROM tok
        |WHERE list_contains(t, 'batch') AND list_contains(t, 'merge')""".stripMargin,
    "text_search_phrase" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') t
        |             FROM documents),
        |pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) i
        |        FROM tok)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_matches
        |FROM pos
        |WHERE t[CAST(i AS INT)] = 'batch' AND t[CAST(i + 1 AS INT)] = 'merge'
        |GROUP BY doc_id""".stripMargin,
    // Identical parenthesization to searchRanked — bit-equal doubles.
    "text_search_ranked" ->
      """WITH tok AS (SELECT doc_id, regexp_extract_all(text, '\S+') t
        |             FROM documents),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) n,
        |              CAST(SUM(len(t)) AS DOUBLE) l FROM tok),
        |dl AS (SELECT doc_id, CAST(len(t) AS DOUBLE) dl FROM tok),
        |t1 AS (SELECT doc_id,
        |         CAST(len(list_filter(t, x -> x = 'batch')) AS DOUBLE) tf
        |       FROM tok WHERE list_contains(t, 'batch')),
        |t2 AS (SELECT doc_id,
        |         CAST(len(list_filter(t, x -> x = 'merge')) AS DOUBLE) tf
        |       FROM tok WHERE list_contains(t, 'merge')),
        |d1 AS (SELECT CAST(COUNT(*) AS DOUBLE) df FROM t1),
        |d2 AS (SELECT CAST(COUNT(*) AS DOUBLE) df FROM t2),
        |j AS (SELECT COALESCE(t1.doc_id, t2.doc_id) doc_id,
        |        COALESCE(t1.tf, 0.0) tf1, COALESCE(t2.tf, 0.0) tf2
        |      FROM t1 FULL OUTER JOIN t2 ON t1.doc_id = t2.doc_id)
        |SELECT j.doc_id,
        |  ((((st.n - d1.df) + 0.5) / (d1.df + 0.5)) * (tf1 * 2.2))
        |    / (tf1 + 1.2 * (0.25 + ((0.75 * dl.dl) * st.n) / st.l))
        |  + ((((st.n - d2.df) + 0.5) / (d2.df + 0.5)) * (tf2 * 2.2))
        |    / (tf2 + 1.2 * (0.25 + ((0.75 * dl.dl) * st.n) / st.l)) AS score
        |FROM j JOIN dl ON j.doc_id = dl.doc_id, st, d1, d2
        |ORDER BY score DESC, j.doc_id LIMIT 20""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_index_build" -> (buildForDir _),
    "text_search_and" -> ((s, d) => {
      val (db, t) = servedIndex(s, d)
      searchAll(db, t, Seq("batch", "merge"))
    }),
    "text_search_phrase" -> ((s, d) => {
      val (db, t) = servedIndex(s, d)
      searchPhrase(db, t, Seq("batch", "merge"))
    }),
    "text_search_ranked" -> ((s, d) => {
      val (db, t) = servedIndex(s, d)
      searchRanked(db, t, Seq("batch", "merge"), 20)
    })
  )
}
