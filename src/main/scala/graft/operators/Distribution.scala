package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** C38 (r15): per-source value-distribution artifact — the NUMERIC
  * corpus-card twin of E23b's cardinality sketches. A data release
  * ships each source's document-length distribution (p50/p90/p99)
  * next to the corpus; maintaining it incrementally must not re-read
  * old shards.
  *
  * Design note — why an EXACT histogram and not a KLL/GK quantile
  * sketch: the mergeable-quantile-sketch family (DataSketches KLL)
  * compacts with random coin flips from one shared `static Random`,
  * so two runs — or one run with a different task interleaving —
  * publish DIFFERENT artifacts and serve different quantiles. That
  * breaks both of this repo's contracts at once: artifacts must be
  * bit-reproducible (the C17/C25 "months later, any cluster" rule)
  * and query rows must hash-match a DuckDB oracle. A value histogram
  * is the order-insensitive alternative: per-shard (source, v, cnt)
  * rows merge by SUM — commutative, associative, exact — so
  * split-shard builds, appends, replays, and any Spark merge order
  * produce the SAME artifact, and quantiles extracted from it are
  * EXACT type-1 order statistics the oracle reproduces hash-green
  * (strictly stronger than a sketch's ±ε rank guarantee). The trade
  * is state ∝ distinct values rather than O(k·log n): right for
  * bounded/quantized domains (doc lengths, capped at [[DefaultMaxV]]
  * with an overflow bucket; a continuous column quantizes to a fixed
  * grid first — the cap and grid are part of the artifact's
  * contract, mirrored in the oracle). KLL remains the choice only
  * when the domain can't be quantized AND ±ε is acceptable — at
  * which point reproducibility is forfeit, which is why it is
  * rejected here.
  *
  * Scale shape: the corpus-scale pass is one map-side-combined
  * groupBy((source, v)) — shuffle rows = the histogram, never the
  * corpus. Quantile extraction runs a cumulative window PER SOURCE
  * over histogram rows only (distinct capped values — bounded by
  * contract, so the per-source task is bounded); the keep test is
  * all-integer (cum·100 ≥ p·n cross-multiplication), cross-engine
  * exact.
  */
object Distribution {

  /** Values above the cap land in one overflow bucket — bounds the
    * histogram state no matter what the column holds. 2^20 chars is
    * lossless for any realistic document-length column. */
  val DefaultMaxV = 1 << 20

  private def capped(v: Column, maxV: Int): Column =
    least(v, lit(maxV.toLong))

  /** One-pass per-(source, v) histogram of `documents.n_chars`.
    * Null grid values are EXCLUDED from the distribution (an
    * unscored/unmeasured doc has no place on a value axis) — and
    * must be, for cross-engine exactness: Spark's `ORDER BY v`
    * sorts nulls first while DuckDB's sorts them last, so a null
    * row would shift every cumulative count on one engine only.
    */
  private def lengthHistogramOf(docs: DataFrame, maxV: Int): DataFrame =
    docs.select(col("source"), capped(col("n_chars"), maxV).as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("cnt"))

  /** Exact type-1 quantiles (smallest v whose cumulative count
    * reaches ⌈p·n⌉) per source + the `__ALL__` corpus row, from any
    * (source, v, cnt) histogram. `probsX100` keeps the threshold
    * arithmetic integer: ⌈(k·n)/100⌉ via cross-multiplication.
    */
  private def quantilesOf(hist: DataFrame,
      probsX100: Seq[Int]): DataFrame = {
    def extract(h: DataFrame): DataFrame = {
      val cum = h
        .withColumn("cum", sum(col("cnt")).over(
          Window.partitionBy(col("source")).orderBy(col("v"))))
        .withColumn("n", sum(col("cnt")).over(
          Window.partitionBy(col("source"))))
      cum.groupBy(col("source"))
        .agg(
          max(col("n")).as("n_docs"),
          probsX100.map(p =>
            min(when(col("cum") * 100 >= col("n") * p, col("v")))
              .as(s"p$p")): _*)
    }
    extract(hist)
      .unionByName(extract(
        hist.groupBy(col("v")).agg(sum(col("cnt")).as("cnt"))
          .select(lit("__ALL__").as("source"), col("v"), col("cnt"))))
  }

  /** `q_doclen_quantiles`: per-source + corpus document-length
    * p50/p90/p99 — the length panel of a data card, exact. */
  def docLengthQuantiles(spark: SparkSession, dir: String,
      maxV: Int = DefaultMaxV): DataFrame =
    docLengthQuantilesOf(Tables(spark, dir, "documents"), maxV)

  /** [[docLengthQuantiles]] over any (source, n_chars) frame. */
  private[graft] def docLengthQuantilesOf(docs: DataFrame,
      maxV: Int = DefaultMaxV): DataFrame =
    quantilesOf(lengthHistogramOf(docs, maxV), Seq(50, 90, 99))

  // ---------------------------------------------------------------
  // Persisted per-shard artifact + incremental append (E23b
  // discipline: base build at batch −1, appends publish partials
  // exactly-once, serving reads the histogram table alone)
  // ---------------------------------------------------------------

  /** One shard's (batch_id, source, v, cnt) partials from any
    * pre-quantized (source, v) frame — shared by both panels. */
  private def shardHistogramOf(sv: DataFrame, batchId: Long): DataFrame =
    sv.filter(col("v").isNotNull) // the no-nulls-on-the-axis rule
      .groupBy(col("source"), col("v"))
      .agg(count(lit(1)).as("cnt"))
      .select(lit(batchId).as("batch_id"), col("source"), col("v"),
        col("cnt"))

  private def buildHistogram(db: graft.catalog.GraftDatabase,
      name: String, sv: DataFrame, maxV: Int): Unit = {
    val ow = org.apache.spark.sql.SaveMode.Overwrite
    db.write(shardHistogramOf(sv, batchId = -1L), s"${name}_hist", ow)
    import db.spark.implicits._
    db.write(Seq(maxV).toDF("max_v"), s"${name}_meta", ow)
  }

  private def appendHistogram(db: graft.catalog.GraftDatabase,
      name: String, sv: DataFrame, batchId: Long): Unit = {
    require(batchId >= 0,
      s"negative batchId $batchId is reserved for the base build")
    graft.streaming.IngestPublish.publishFiles(db, s"${name}_hist",
      shardHistogramOf(sv, batchId), batchId)
    ()
  }

  /** The length panel's (source, v) projection of a (source, n_chars)
    * frame, under the artifact's stored cap. */
  private def lengthSv(db: graft.catalog.GraftDatabase, name: String,
      docs: DataFrame): DataFrame = {
    val maxV = db.read(s"${name}_meta").collect()(0).getInt(0)
    docs.select(col("source"), capped(col("n_chars"), maxV).as("v"))
  }

  /** The quality panel's (source, v) projection of a (doc_id, source,
    * text) frame — the C36 score on the 10⁻⁴ grid. */
  /** Grid cells for the quality axis: q ∈ [0, 1] by the score's
    * construction, so ⌊q·10⁴⌋ ∈ [0, 10000] and the cap below is a
    * provable no-op on BOTH engines (which is why the oracle carries
    * no LEAST) — it exists so the stored `max_v` meta states a bound
    * the artifact actually enforces rather than a dead field (r15
    * review). */
  private val QualityGridCells = 10001

  private def qualitySv(docs: DataFrame): DataFrame =
    Curation.scoredDocs(docs)
      .select(col("source"),
        capped(floor(col("q") * 10000).cast("bigint"),
          QualityGridCells).as("v"))
      .filter(col("v").isNotNull) // null text ⇒ no score ⇒ off the axis

  def buildLengthHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame, maxV: Int = DefaultMaxV): Unit =
    buildHistogram(db, name,
      docs.select(col("source"), capped(col("n_chars"), maxV).as("v")),
      maxV)

  /** Publish one new shard's histogram partials under `batchId` —
    * idempotent (staging-rename keyed by batch id, the D10/G10
    * discipline; a replayed batch converges instead of
    * double-counting). Also the streaming micro-batch body
    * ([[graft.streaming.StreamingCuration.maintainLengthHistogram]]).
    */
  def appendLengthHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame, batchId: Long): Unit =
    appendHistogram(db, name, lengthSv(db, name, docs), batchId)

  /** The quality panel as the same persisted artifact — the one a
    * curator actually maintains incrementally (the C36 keep-percentile
    * and C22 threshold decisions read this distribution). Build takes
    * (doc_id, source, text); the score quantizes to the 10⁻⁴ grid
    * BEFORE the histogram, so the artifact carries integer grid units
    * only (the no-raw-doubles rule) and grid quantization is part of
    * the artifact's contract.
    */
  def buildQualityHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame): Unit =
    buildHistogram(db, name, qualitySv(docs), maxV = QualityGridCells)

  def appendQualityHistogram(db: graft.catalog.GraftDatabase,
      name: String, docs: DataFrame, batchId: Long): Unit =
    appendHistogram(db, name, qualitySv(docs), batchId)

  /** Serve either panel from its persisted histogram alone — cost ∝
    * histogram rows (shards × sources × distinct grid values), never
    * corpus text. SUM-merge across shards is exact, so this EQUALS
    * the one-pass inline panel over the union corpus — spec-pinned as
    * equality, not approximation.
    */
  def quantilesFromHistogram(db: graft.catalog.GraftDatabase,
      name: String): DataFrame =
    quantilesOf(
      db.read(s"${name}_hist")
        .groupBy(col("source"), col("v"))
        .agg(sum(col("cnt")).as("cnt")),
      Seq(50, 90, 99))


  /** `q_quality_quantiles`: the CONTINUOUS-domain form of the panel —
    * per-source quality-score p50/p90/p99 on a fixed 10⁻⁴ grid, the
    * distribution a curator reads before picking a C36 keep
    * percentile or a C22 threshold. This is the quantize-first
    * contract the histogram design requires for continuous columns:
    * v = ⌊q·10⁴⌋ (one multiply+floor of the C36 quality double, whose
    * fixed IEEE parenthesization both engines share — the grid value
    * is emitted as the INTEGER grid unit, so the compared row never
    * carries a raw double), value error ≤ 10⁻⁴ of the score range by
    * construction, rank exact within the grid. Same histogram/
    * cumulative/extraction machinery as the length panel.
    */
  def qualityQuantiles(spark: SparkSession, dir: String): DataFrame =
    quantilesOf(
      qualitySv(Tables(spark, dir, "documents"))
        .groupBy(col("source"), col("v"))
        .agg(count(lit(1)).as("cnt")),
      Seq(50, 90, 99))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_doclen_quantiles" -> ((s, d) => docLengthQuantiles(s, d)),
    "q_quality_quantiles" -> (qualityQuantiles _)
  )

  val oracles: Map[String, String] = Map(
    // identical histogram → cumulative → integer cross-multiplied
    // type-1 extraction; the __ALL__ row folds the same histogram
    "q_doclen_quantiles" ->
      """WITH h AS (SELECT source, LEAST(n_chars, 1048576) AS v,
        |    COUNT(*) AS cnt
        |  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1, 2),
        |ab AS (
        |  SELECT source, v, cnt FROM h
        |  UNION ALL
        |  SELECT '__ALL__' AS source, v, SUM(cnt) AS cnt
        |  FROM h GROUP BY 2),
        |c AS (SELECT source, v, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM ab)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  MIN(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50,
        |  MIN(CASE WHEN cum * 100 >= n * 90 THEN v END) AS p90,
        |  MIN(CASE WHEN cum * 100 >= n * 99 THEN v END) AS p99
        |FROM c GROUP BY source""".stripMargin,
    // same extraction over the quality score quantized to the 10^-4
    // grid; q's formula is the C36 oracle's verbatim (fixed IEEE
    // parenthesization), and only the integer grid unit is compared
    "q_quality_quantiles" ->
      """WITH s AS (SELECT doc_id, source,
        |  LEAST(1.0, CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE) / 50.0) * 0.4
        |  + LEAST(1.0, (CAST(len(regexp_extract_all(text, '\b(the|and|of|to|is|in|it|a)\b')) AS DOUBLE)
        |      / CAST(len(regexp_extract_all(text, '\S+')) AS DOUBLE)) * 8.0) * 0.4
        |  + (1.0 - LEAST(1.0, (CAST(len(regexp_extract_all(text, '[.,!?;:]')) AS DOUBLE)
        |      / CAST(length(text) AS DOUBLE)) * 10.0)) * 0.2 AS q
        |  FROM documents),
        |h AS (SELECT source, CAST(FLOOR(q * 10000) AS BIGINT) AS v,
        |    COUNT(*) AS cnt
        |  FROM s WHERE q IS NOT NULL GROUP BY 1, 2),
        |ab AS (
        |  SELECT source, v, cnt FROM h
        |  UNION ALL
        |  SELECT '__ALL__' AS source, v, SUM(cnt) AS cnt
        |  FROM h GROUP BY 2),
        |c AS (SELECT source, v, cnt,
        |    SUM(cnt) OVER (PARTITION BY source ORDER BY v) AS cum,
        |    SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM ab)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |  MIN(CASE WHEN cum * 100 >= n * 50 THEN v END) AS p50,
        |  MIN(CASE WHEN cum * 100 >= n * 90 THEN v END) AS p90,
        |  MIN(CASE WHEN cum * 100 >= n * 99 THEN v END) AS p99
        |FROM c GROUP BY source""".stripMargin
  )
}
