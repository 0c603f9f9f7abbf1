package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Product quantization for embeddings (SURVEY.md §2.D4) — the
  * memory-compression path for billion-vector similarity search:
  * 64 float32 dims (256 B) become `m` codebook indices (8 B at
  * m=8, k≤256), and queries score compressed vectors through a
  * per-query lookup table (ADC — asymmetric distance computation)
  * without ever decompressing the corpus.
  *
  * Training runs deterministic in-core Lloyd per subspace over a
  * bounded sample ([[KMeans]] — the FAISS discipline: codebook
  * quality needs a distribution sample, not the corpus). The passes
  * that scale with data — encode and ADC scan — are distributed and
  * stay inside whole-stage codegen via the native `PqEncodeCodes` /
  * `AdcScore` expressions.
  */
object Pq {

  /** codebooks(s)(c) = centroid c of subspace s (length subDim). */
  case class Codebook(m: Int, k: Int, subDim: Int,
      cents: Array[Array[Array[Double]]])

  /** Deterministic per-subspace k-means over `e` = (vec_id,
    * embedding): one TakeOrdered sample pass, then in-core Lloyd per
    * subspace — O(sampleN·dim·k·iters) driver compute, zero
    * per-iteration Spark jobs.
    */
  def train(e: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 2, sampleN: Int = 65536): Codebook = {
    val sample = KMeans.sampleVectors(e, sampleN)
    val dim = sample(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val cents = Array.tabulate(m) { s =>
      val subs = sample.map(v => v.slice(s * subDim, (s + 1) * subDim))
      KMeans.lloyd(subs, k, iters)
    }
    Codebook(m, k, subDim, cents)
  }

  /** Codes of vector column `v` as an array<int>[m] — native codegen
    * expression; usable inline so callers can carry extra columns
    * (IVF-PQ keeps the cell id).
    */
  def codesExpr(cb: Codebook, v: Column): Column =
    GraftFunctions.pqEncode(v, cb.cents)

  /** Encode every vector to its m codebook indices — one map pass,
    * output rows are (vec_id, codes array<int>[m]).
    */
  def encode(e: DataFrame, cb: Codebook): DataFrame =
    e.select(col("vec_id"), codesExpr(cb, col("embedding")).as("codes"))

  /** ADC score of a codes column against a per-row lookup-table
    * column (array<array<double>>, lut(s)(c) = query subvector ·
    * centroid c of subspace s). Native codegen expression.
    */
  def adcScoreExpr(codes: Column, lut: Column): Column =
    GraftFunctions.adcScore(codes, lut)

  /** Per-query LUT built IN-PLAN from the codebook literal — the
    * [[lutFor]] arithmetic as a native expression, so a query BATCH
    * becomes a (query_id, lut) frame without any driver collect
    * (bit-identical to the collected form, spec-pinned).
    */
  def lutExpr(cb: Codebook, q: Column): Column =
    GraftFunctions.pqLut(q, cb.cents)

  /** LUT for query vector `q` against `cb` (driver-side, O(m·k·subDim)). */
  def lutFor(q: Array[Double], cb: Codebook): Seq[Seq[Double]] =
    Array.tabulate(cb.m)(s => Array.tabulate(cb.k) { c =>
      var dot = 0.0
      var d = 0
      while (d < cb.subDim) {
        dot += q(s * cb.subDim + d) * cb.cents(s)(c)(d); d += 1
      }
      dot
    }.toSeq).toSeq

  /** ADC top-k: per query, the dot product against a compressed
    * vector is the sum of m table lookups — LUT(s)(c) = query
    * subvector · centroid c of subspace s. The corpus scan reads
    * only the m-byte codes; queries ride as a broadcast (query_id,
    * lut) table.
    */
  def adcTopK(spark: SparkSession, e: DataFrame, cb: Codebook,
      nQueries: Int = 5, topK: Int = 10): DataFrame = {
    // queries stay IN-PLAN: the LUT is a native expression over the
    // query rows (no collect, no driver loop) and the query side
    // broadcasts as a frame — the same zero-driver shape G13 serves
    // streams with
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"),
        lutExpr(cb, col("embedding")).as("lut"))
    val codes = encode(e, cb)
    val scored = codes.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("score", adcScoreExpr(col("codes"), col("lut")))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(topK)(col("score"), col("vec_id"))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("approx_dot"))
  }

  /** Persisted PQ index lifecycle (VERDICT r5 #6 — the D9 shape for
    * the compressed index): codebook + encoded corpus stored as
    * plain parquet, so serving scores queries against the artifact
    * instead of retraining per invocation. `<name>_codebook` is
    * m·k rows (s, c, centroid) — the bounded piece a server loads to
    * build LUTs; `<name>_codes` is the m-byte-per-vector corpus.
    * Training is deterministic (TakeOrdered sample + in-core Lloyd),
    * so rebuild is idempotent — spec-pinned.
    */
  def buildPqIndex(db: graft.catalog.GraftDatabase, e: DataFrame,
      name: String, m: Int = 8, k: Int = 16, iters: Int = 2): Unit = {
    val spark = db.spark
    import spark.implicits._
    val cb = train(e, m, k, iters)
    db.write(
      cb.cents.zipWithIndex.flatMap { case (sub, s) =>
        sub.zipWithIndex.map { case (cent, c) => (s, c, cent.toSeq) }
      }.toSeq.toDF("s", "c", "centroid"),
      s"${name}_codebook", org.apache.spark.sql.SaveMode.Overwrite)
    db.write(encode(e, cb), s"${name}_codes",
      org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** Load a stored codebook (m·k rows — the quantizer, never the
    * corpus).
    */
  def loadCodebook(db: graft.catalog.GraftDatabase, name: String): Codebook = {
    val rows = db.read(s"${name}_codebook")
      .orderBy(col("s"), col("c")).collect()
    val m = rows.iterator.map(_.getInt(0)).max + 1
    val k = rows.iterator.map(_.getInt(1)).max + 1
    val cents = Array.ofDim[Array[Double]](m, k)
    rows.foreach { r =>
      cents(r.getInt(0))(r.getInt(1)) = r.getSeq[Double](2).toArray
    }
    Codebook(m, k, cents(0)(0).length, cents)
  }

  /** Serve ADC top-k from a stored index — no training, no encode
    * pass; the corpus scan reads only the stored m-byte codes.
    * `queries` = (vec_id, embedding) raw query vectors. Loads the
    * codebook per call; a serving loop (G13) loads it ONCE and calls
    * [[adcTopKWith]] per batch.
    */
  def adcTopKFromIndex(db: graft.catalog.GraftDatabase, name: String,
      queries: DataFrame, topK: Int = 10): DataFrame =
    adcTopKWith(db, loadCodebook(db, name), name, queries, topK)

  /** [[adcTopKFromIndex]] under an already-loaded codebook — the
    * query batch never leaves the plan (LUTs via [[lutExpr]], the
    * query side broadcast as a frame): zero driver work per batch,
    * which is what lets the G13 stream serve without a per-batch
    * planning step.
    */
  def adcTopKWith(db: graft.catalog.GraftDatabase, cb: Codebook,
      name: String, queries: DataFrame, topK: Int = 10): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      lutExpr(cb, col("embedding")).as("lut"))
    val scored = db.read(s"${name}_codes")
      .join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("score", adcScoreExpr(col("codes"), col("lut")))
    scored.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(topK)(col("score"), col("vec_id"))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("approx_dot"))
  }

  /** The `ann_pq` query: train → encode → ADC top-k on the test
    * embeddings. Approximate by nature → rows-only driver check;
    * quality pinned by AnnSpec (reconstruction + recall floors).
    */
  def annPq(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb = train(e)
    adcTopK(spark, e, cb)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq" -> (annPq _)
  )
}
