package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** D12: PCA dimensionality reduction for embedding columns — the
  * classical preprocessing step of billion-scale vector search
  * (FAISS's PCAMatrix / OPQ's rotation; truncated eigenbasis of the
  * covariance): project d-dim embeddings onto the top-r principal
  * components, search in the reduced space, refine survivors with
  * exact full-dimension scores.
  *
  * Scale shape — the quantizer-training discipline of D2/D4 applies
  * verbatim: the BASIS is a property of the data distribution, so it
  * trains in-core on the deterministic bounded [[KMeans.sampleVectors]]
  * sample (one TakeOrdered pass; covariance + Jacobi eigensolver are
  * O(sample·d² + d³) driver work on a 64-dim space — microseconds),
  * while the corpus-scale work is ONE codegen'd projection map with
  * the basis embedded as plan literals. Candidate generation runs in
  * the r-dim space (r/d of the scan bytes and multiplies); the exact
  * refine touches only overfetch·k survivors per query (the D8
  * pattern). Nothing about the corpus is ever collected.
  *
  * Determinism: the sample is a total order, Jacobi sweeps are
  * index-ordered with a fixed tolerance, eigenpairs sort by
  * (eigenvalue desc, index asc), and each component's sign is
  * canonicalized (largest-|coordinate| entry positive, ties to the
  * lowest index) — the basis is unique, so rebuilds are idempotent.
  */
object Pca {

  /** Trained basis: mean (d), components (r×d, orthonormal rows,
    * variance-descending), per-component variance.
    */
  case class PcaModel(mean: Array[Double],
      components: Array[Array[Double]], variances: Array[Double])

  /** In-core PCA of a sample: covariance about the sample mean,
    * cyclic Jacobi eigendecomposition, top-r eigenpairs.
    */
  /** `center = false` trains the UNCENTERED basis (eigenvectors of
    * the second-moment matrix, mean left at 0) — the right space when
    * the target metric is a dot product/cosine, since only an
    * origin-anchored projection preserves dots. `center = true` is
    * classical PCA (covariance about the mean), the right space for
    * L2 structure.
    */
  def train(sample: Array[Array[Double]], r: Int,
      center: Boolean = true): PcaModel = {
    require(sample.nonEmpty, "PCA needs a non-empty sample")
    val d = sample(0).length
    require(r >= 1 && r <= d, s"r=$r outside [1, $d]")
    val n = sample.length
    val mean = new Array[Double](d)
    if (center) {
      sample.foreach { v =>
        var i = 0; while (i < d) { mean(i) += v(i); i += 1 }
      }
      locally { var i = 0; while (i < d) { mean(i) /= n; i += 1 } }
    }
    // covariance (population form — the eigenbasis is scale-invariant
    // so the 1/n vs 1/(n-1) choice is cosmetic)
    val a = Array.ofDim[Double](d, d)
    sample.foreach { v =>
      var i = 0
      while (i < d) {
        val vi = v(i) - mean(i)
        var j = 0
        while (j <= i) { a(i)(j) += vi * (v(j) - mean(j)); j += 1 }
        i += 1
      }
    }
    locally {
      var i = 0
      while (i < d) {
        var j = 0
        while (j <= i) { a(i)(j) /= n; a(j)(i) = a(i)(j); j += 1 }
        i += 1
      }
    }
    val vecs = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    // cyclic Jacobi: index-ordered sweeps — the rotation sequence is a
    // pure function of the matrix. The tolerance is RELATIVE to the
    // matrix magnitude (Frobenius²): an absolute 1e-12 silently
    // declared convergence on large-magnitude (unnormalized) input
    // while the off-diagonal mass was still huge, voiding the
    // orthonormality claim with no signal (ADVICE r7). The max(1, ·)
    // floor keeps the threshold bit-identical to the historical
    // absolute 1e-12 on the unit-scale embedding inputs every pinned
    // artifact was trained on.
    var frobSq = 0.0
    locally {
      var i = 0
      while (i < d) {
        var j = 0
        while (j < d) { frobSq += a(i)(j) * a(i)(j); j += 1 }
        i += 1
      }
    }
    val tol = 1e-12 * math.max(1.0, frobSq)
    var sweep = 0
    var off = offDiag(a)
    while (off > tol && sweep < 64) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t = math.signum(theta) /
              (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
                case 0.0 => 1.0 / (theta + math.sqrt(theta * theta + 1.0))
                case x => x
              }
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            var i = 0
            while (i < d) {
              val aip = a(i)(p); val aiq = a(i)(q)
              a(i)(p) = c * aip - s * aiq
              a(i)(q) = s * aip + c * aiq
              i += 1
            }
            i = 0
            while (i < d) {
              val api = a(p)(i); val aqi = a(q)(i)
              a(p)(i) = c * api - s * aqi
              a(q)(i) = s * api + c * aqi
              val vip = vecs(i)(p); val viq = vecs(i)(q)
              vecs(i)(p) = c * vip - s * viq
              vecs(i)(q) = s * vip + c * viq
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    // Jacobi converges quadratically, so 64 cyclic sweeps is far past
    // any symmetric matrix's need — if the cap is hit anyway, the
    // basis is NOT orthonormal-to-tolerance and returning it silently
    // would break every downstream determinism claim. Fail loudly.
    if (off > tol) throw new IllegalStateException(
      s"Jacobi eigendecomposition did not converge in $sweep sweeps " +
        s"(off-diagonal mass $off > tol $tol, d=$d); input covariance " +
        "is pathological — check the sample for NaN/Inf or rescale")
    val order = (0 until d).sortBy(i => (-a(i)(i), i)).take(r)
    val comps = order.map { k =>
      val v = Array.tabulate(d)(i => vecs(i)(k))
      // canonical sign: the largest-|coordinate| entry (lowest index
      // on ties) is positive — Jacobi's rotation path can't flip it
      var best = 0
      var i = 1
      while (i < d) {
        if (math.abs(v(i)) > math.abs(v(best))) best = i
        i += 1
      }
      if (v(best) < 0) { i = 0; while (i < d) { v(i) = -v(i); i += 1 } }
      v
    }.toArray
    PcaModel(mean, comps, order.map(i => a(i)(i)).toArray)
  }

  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.max(math.sqrt(s), 1e-30)
    Array.tabulate(v.length)(i => v(i) / n)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    val d = a.length
    var s = 0.0
    var i = 0
    while (i < d) {
      var j = i + 1
      while (j < d) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** r-dim projection of `v` under `model` — components and mean ride
    * as plan literals; per component one zip_with/aggregate fold over
    * the embedding attribute (never a lambda indexing an outer array).
    */
  def projectExpr(model: PcaModel, v: Column): Column = {
    // dot(v − μ, c) = dot(v, c) − dot(μ, c): the μ·c half is a plain
    // Scala constant; ONE native expression evaluates all r dots
    // (r15 OPT — the per-component aggregate(zip_with(..)) form built
    // an r·d-literal tree that cost ~0.5 s of analysis/codegen per
    // query and ran through interpreted lambdas)
    val bias = model.components.map(comp =>
      comp.zip(model.mean).map { case (c, m) => c * m }.sum)
    pcaProject(v, model.components, bias)
  }

  /** Dot product of two r-dim projected arrays. */
  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v)

  /** D12 query: candidate top-(overfetch·k) per query by DOT in the
    * r-dim uncentered-PCA space of the UNIT-NORMALIZED embeddings —
    * dot of normalized vectors IS cosine, and an origin-anchored
    * projection approximates dots with error bounded by the energy
    * outside the top-r subspace — then exact full-dimension cosine
    * refine and re-rank to top-k (D8's over-fetch/refine contract
    * with a PCA candidate space instead of ADC).
    */
  /** (vec_id, embedding, z): the unit-normalized r-dim projection of
    * an embedding frame under `model`. dot(v̂, c) = dot(v, c)/‖v‖ —
    * the norm is computed once per row and referenced as an attribute
    * inside the per-component rescale (an outer EXPRESSION in the
    * lambda would re-evaluate per element).
    */
  private def projectedOf(e: DataFrame, model: PcaModel): DataFrame = {
    val nrm = sqrt(aggregate(col("embedding"), lit(0.0),
      (acc, x) => acc + x.cast("double") * x.cast("double")))
    e.withColumn("nrm", greatest(nrm, lit(1e-30)))
      .select(col("vec_id"), col("embedding"),
        transform(projectExpr(model, col("embedding")),
          p => p / col("nrm")).as("z"))
  }

  def annPcaRefined(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5, r: Int = 32, overfetch: Int = 8,
      sampleN: Int = 65536): DataFrame = {
    val e = Tables.spreadIfNarrow(Tables(spark, dir, "embeddings")
        .select(col("vec_id"), col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = train(
      KMeans.sampleVectors(e, sampleN).map(normalize), r, center = false)
    graft.CacheHygiene.unpersistAfterUse(e)
    val proj = projectedOf(e, model)
    val q = proj.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("z").as("qz"))
    topkFromProjected(proj, q, k, overfetch)
  }

  /** Shared serve core: candidates by reduced-space dot, exact
    * full-dimension cosine refine of the overfetch·k survivors.
    * `proj` = (vec_id, embedding, z); `q` = (query_id, qe, qz).
    */
  private def topkFromProjected(proj: DataFrame, q: DataFrame, k: Int,
      overfetch: Int): DataFrame = {
    val cands = proj.select(col("vec_id"), col("z"))
      .join(broadcast(q.select(col("query_id"), col("qz"))),
        col("vec_id") =!= col("query_id"))
      .withColumn("nd", dotCol(col("z"), col("qz")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k * overfetch)(col("nd"), col("vec_id"))
        .as("tk"))
      .select(col("query_id"), explode(col("tk")).as("s"))
      .select(col("query_id"), col("s.id").as("vec_id"))
    // exact refine: only q·overfetch·k candidate rows re-score
    cands
      .join(proj.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(q.select(col("query_id"), col("qe"))), Seq("query_id"))
      .withColumn("sim", cosineSimilarity(col("qe"), col("embedding")))
      .groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k)(col("sim"), col("vec_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("sim"))
  }

  /** D9 lifecycle for the PCA index: build ONCE — basis (r rows) +
    * the projected corpus (vec_id, embedding, z) — serve many with no
    * re-train and no corpus re-projection. The basis is unique
    * (canonical signs, deterministic sample), so rebuilds are
    * idempotent; `{name}_basis` is the bounded piece a server loads,
    * `{name}_proj` the corpus-scale artifact the candidate scan reads.
    */
  def buildPcaIndex(db: graft.catalog.GraftDatabase, e: DataFrame,
      name: String, r: Int = 32, sampleN: Int = 65536): Unit = {
    val spark = db.spark
    val ep = graft.Tables.spreadIfNarrow(
        e.select(col("vec_id"), col("embedding")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val model = train(
      KMeans.sampleVectors(ep, sampleN).map(normalize), r, center = false)
    graft.CacheHygiene.unpersistAfterUse(ep)
    import spark.implicits._
    val ow = org.apache.spark.sql.SaveMode.Overwrite
    db.write(model.components.zip(model.variances).zipWithIndex
      .map { case ((c, v), i) => (i, c.toSeq, v) }.toSeq
      .toDF("comp_idx", "component", "variance"), s"${name}_basis", ow)
    db.write(projectedOf(ep, model), s"${name}_proj", ow)
  }

  /** The stored basis (r rows — never the corpus). */
  private def loadModel(db: graft.catalog.GraftDatabase,
      name: String): PcaModel = {
    val rows = db.read(s"${name}_basis").orderBy(col("comp_idx")).collect()
    val comps = rows.map(_.getSeq[Double](1).toArray)
    PcaModel(new Array[Double](comps(0).length), comps,
      rows.map(_.getDouble(2)))
  }

  /** Serve top-k queries against a stored PCA index: queries project
    * under the loaded basis (r literal folds on the tiny query side),
    * candidates come from the STORED projection, refine reads the
    * stored raw vectors — no training, no corpus projection.
    */
  def annPcaFromIndex(db: graft.catalog.GraftDatabase, name: String,
      queries: DataFrame, k: Int = 10, overfetch: Int = 8): DataFrame = {
    val model = loadModel(db, name)
    val proj = db.read(s"${name}_proj")
    val q = projectedOf(queries.select(col("vec_id"), col("embedding")),
        model)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("z").as("qz"))
    topkFromProjected(proj, q, k, overfetch)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pca" -> ((s, d) => annPcaRefined(s, d))
  )
}
