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

  /** Build (or rebuild) the postings artifact for `docs`. */
  def buildIndex(db: graft.catalog.GraftDatabase, table: String,
      docs: DataFrame, nBuckets: Int): Unit = {
    val postings = docs
      .select(col("doc_id"),
        posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "term")))
      .groupBy(col("term"), col("doc_id"))
      .agg(sort_array(collect_list(col("pos"))).as("positions"),
        count(lit(1)).as("tf"))
    db.writeBucketed(postings, table, "term", nBuckets)
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
      .agg(countDistinct(col("term")).as("__nt"), sum(col("tf")).as("n_occ"))
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

  // ---- driver-contract fixtures: index built ONCE per corpus dir
  // per JVM into a scratch warehouse (the bucketedWarehouse memo
  // pattern — a persisted index is a storage decision, not per-query
  // work; a layout from a previous process re-attaches by row count)
  private val indexReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def servedIndex(spark: SparkSession,
      dir: String): (graft.catalog.GraftDatabase, String) = {
    val n = spark.sparkContext.defaultParallelism
    val key = s"${new org.apache.hadoop.fs.Path(dir).getName}_$n"
    val db = graft.catalog.GraftDatabase(spark,
      s"${CsvQueries.scratchRoot}/textindex_$key/db")
    val table = s"postings_b$n"
    if (!indexReady.contains(key)) {
      val docs = Tables(spark, dir, "documents")
      val fresh = db.registerBucketed(table, "term", n) &&
        (try db.readBucketed(table).select(col("doc_id")).distinct().count() ==
          docs.count()
        catch { case _: Exception => false })
      if (!fresh) buildIndex(db, table, docs, n)
      indexReady.add(key)
      ()
    }
    (db, table)
  }

  val oracles: Map[String, String] = Map(
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
        |GROUP BY doc_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "text_search_and" -> ((s, d) => {
      val (db, t) = servedIndex(s, d)
      searchAll(db, t, Seq("batch", "merge"))
    }),
    "text_search_phrase" -> ((s, d) => {
      val (db, t) = servedIndex(s, d)
      searchPhrase(db, t, Seq("batch", "merge"))
    })
  )
}
