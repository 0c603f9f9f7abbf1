package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Product quantization for embeddings (SURVEY.md §2.D4) — the
  * memory-compression path for billion-vector similarity search:
  * 64 float32 dims (256 B) become `m` codebook indices (8 B at
  * m=8, k≤256), and queries score compressed vectors through a
  * per-query lookup table (ADC — asymmetric distance computation)
  * without ever decompressing the corpus.
  *
  * Training is the same deterministic Lloyd scheme as IVF (fixed
  * init from the lowest vec_ids, fixed iteration count), run per
  * subspace in ONE distributed pass per iteration: vectors explode
  * ×m subvector rows (m=8 — bounded, unlike a ×dim explode) and a
  * wide aggregate per (subspace, cell) carries subDim sums. The
  * codebook is O(m·k·subDim) — driver/broadcast-sized by
  * construction.
  */
object Pq {

  /** codebooks(s)(c) = centroid c of subspace s (length subDim). */
  case class Codebook(m: Int, k: Int, subDim: Int,
      cents: Array[Array[Array[Double]]])

  private def subvector(v: Column, s: Int, subDim: Int): Column =
    slice(v, s * subDim + 1, subDim)

  /** Squared L2 distance between a (float) subvector column and a
    * literal centroid — index-ordered double math, stays in codegen.
    */
  private def distTo(sub: Column, cent: Seq[Double]): Column =
    aggregate(zip_with(sub, typedlit(cent), (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, v) => acc + v)

  private def argminCell(sub: Column, cents: Array[Array[Double]]): Column = {
    val dists = array(cents.map(c => distTo(sub, c.toSeq)): _*)
    (array_position(dists, array_min(dists)) - 1).cast("int")
  }

  /** Deterministic per-subspace k-means over `e` = (vec_id, embedding).
    * iters=2 suffices for the codebook quality bar (each Lloyd step
    * only improves MSE) and every iteration is a full corpus job.
    */
  def train(e: DataFrame, m: Int = 8, k: Int = 16,
      iters: Int = 2): Codebook = {
    // Fixed init: subvectors of the k lowest vec_ids (also yields dim).
    val seed = e.orderBy(col("vec_id")).limit(k).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = seed(0).length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    var cents: Array[Array[Array[Double]]] = Array.tabulate(m)(s =>
      seed.map(v => v.slice(s * subDim, (s + 1) * subDim)))

    for (_ <- 1 to iters) {
      // One pass: explode ×m subvector rows, assign each to its
      // subspace's nearest centroid, wide-agg subDim sums per
      // (subspace, cell). Shuffle carries m·k rows of subDim+1 values.
      val subs = e.select(col("vec_id"), posexplode(
        array((0 until m).map(s =>
          subvector(col("embedding"), s, subDim)): _*)).as(Seq("s", "sub")))
      val assigned = subs.withColumn("cell",
        // per-subspace centroids differ: dispatch on s
        (0 until m).foldLeft(lit(-1).cast("int")) { (acc, s) =>
          when(col("s") === s, argminCell(col("sub"), cents(s))).otherwise(acc)
        })
      val aggs = count(lit(1)).as("n") +: (0 until subDim).map(d =>
        sum(element_at(col("sub"), d + 1).cast("double")).as(s"d$d"))
      val sums = assigned.groupBy(col("s"), col("cell"))
        .agg(aggs.head, aggs.tail: _*).collect()
      val byKey = sums.map(r => (r.getInt(0), r.getInt(1)) -> r).toMap
      cents = Array.tabulate(m)(s => Array.tabulate(k)(c =>
        byKey.get((s, c)) match {
          case Some(r) =>
            val n = r.getLong(2)
            Array.tabulate(subDim)(d => r.getDouble(3 + d) / n)
          case None => cents(s)(c)
        }))
    }
    Codebook(m, k, subDim, cents)
  }

  /** Codes of vector column `v` as an array<int>[m] — usable inline
    * so callers can carry extra columns (IVF-PQ keeps the cell id).
    */
  def codesExpr(cb: Codebook, v: Column): Column =
    array((0 until cb.m).map(s =>
      argminCell(subvector(v, s, cb.subDim), cb.cents(s))): _*)

  /** Encode every vector to its m codebook indices — one map pass,
    * output rows are (vec_id, codes array<int>[m]).
    */
  def encode(e: DataFrame, cb: Codebook): DataFrame =
    e.select(col("vec_id"), codesExpr(cb, col("embedding")).as("codes"))

  /** ADC score of a codes column against a per-row lookup-table
    * column (array<array<double>>, lut(s)(c) = query subvector ·
    * centroid c of subspace s).
    */
  def adcScoreExpr(m: Int, codes: Column, lut: Column): Column =
    aggregate(
      zip_with(codes, sequence(lit(0), lit(m - 1)),
        (c, s) => element_at(element_at(lut, (s + 1).cast("int")), c + 1)),
      lit(0.0), (acc, v) => acc + v)

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
    import spark.implicits._
    val queries = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id"), col("embedding")).collect()
      .map { r =>
        val q = r.getSeq[Float](1).map(_.toDouble).toArray
        (r.getLong(0), lutFor(q, cb))
      }.toSeq.toDF("query_id", "lut")
    val codes = encode(e, cb)
    val scored = codes.join(broadcast(queries),
        col("vec_id") =!= col("query_id"))
      .withColumn("score",
        adcScoreExpr(cb.m, col("codes"), col("lut")))
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
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cb = train(e)
    adcTopK(spark, e, cb)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq" -> (annPq _)
  )
}
