package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions._

/** Approximate-nearest-neighbor search over an embedding column
  * (SURVEY.md §2.D).
  *
  * Scale shape: the query set is always the broadcast side; the
  * corpus is scanned once. The exact path ranks per query id; at real
  * scale the per-partition partial top-k (so only q·k rows shuffle)
  * is the planned H3 upgrade — the query-facing schema is identical.
  */
object Ann {

  /** D1: exact top-k by cosine for a fixed query set (vec_id < 5),
    * deterministic tie-break on neighbor id.
    *
    * Per-partition partial top-k (H3 aggregator) instead of a window
    * rank: only q·k scored ids cross the shuffle, not the whole
    * scored corpus — the shape that survives a billion-vector scan.
    */
  def topkExact(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val sims = e.select(col("vec_id").as("neighbor_id"), col("embedding"))
      .join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .withColumn("sim", cosineSimilarity(col("qe"), col("embedding")))
    sims.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k)(col("sim"), col("neighbor_id"))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("sim"))
  }

  /** D2: IVF — deterministic Lloyd iterations (fixed init: lowest
    * vec_ids; fixed iteration count), then probe the nProbe nearest
    * cells per query. Distributed shape: centroid assignment is one
    * map pass per iteration; the per-iteration shuffle carries only
    * ncells·dim partial sums (posexplode + map-side combine);
    * centroids broadcast back as literals inside the plan.
    */
  /** Squared-L2 argmin cell of `v` against literal centroids —
    * aggregate() over zipped arrays, stays in codegen. Shared by IVF
    * and IVF-PQ.
    */
  private[operators] def cellExpr(cents: Array[Array[Double]],
      v: Column): Column = {
    val lit2d = typedlit(cents.map(_.toSeq).toSeq)
    val dists = transform(lit2d, c =>
      aggregate(zip_with(v, c, (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, v) => acc + v))
    array_position(dists, array_min(dists)) - 1
  }

  /** Deterministic Lloyd over `e` = (vec_id, embedding): fixed init
    * from the nCells lowest ids, fixed iteration count. Per-iteration
    * update is ONE wide aggregate — count + `dim` sum columns per
    * cell — instead of posexploding every vector into dim rows (×64
    * row blowup through the shuffle); this form shuffles nCells rows
    * of dim+1 values.
    */
  private[operators] def trainCentroids(e: DataFrame, nCells: Int,
      iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = e
      .orderBy(col("vec_id")).limit(nCells).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val dim = centroids(0).length
    for (_ <- 1 to iters) {
      val assigned = e.withColumn("cell", cellExpr(centroids, col("embedding")))
      val aggs = count(lit(1)).as("n") +: (0 until dim).map(d =>
        sum(element_at(col("embedding"), d + 1).cast("double")).as(s"s$d"))
      val sums = assigned.groupBy(col("cell"))
        .agg(aggs.head, aggs.tail: _*)
        .collect()
      val byCell = sums.map(r => r.getLong(0) -> r).toMap
      val next = centroids.zipWithIndex.map { case (old, ci) =>
        byCell.get(ci.toLong) match {
          case Some(r) =>
            val n = r.getLong(1)
            Array.tabulate(dim)(d => r.getDouble(2 + d) / n)
          case None => old
        }
      }
      centroids = next
    }
    centroids
  }

  def ivfTopk(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5, nCells: Int = 16, iters: Int = 3,
      nProbe: Int = 2): DataFrame = {
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val centroids = trainCentroids(e, nCells, iters)
    val assigned = e.withColumn("cell", cellExpr(centroids, col("embedding")))
    // Explode each query into (query, probed cell) rows so the probe
    // is an EQUI-join on `cell` — a hash join whose cost is
    // O(candidates), not the O(corpus × queries) nested loop an
    // array_contains predicate plans as. The query side stays tiny
    // (q × nProbe rows) and broadcasts.
    val probes = assigned.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
      .select(col("query_id"), col("qe"),
        explode(slice(sortedCellsExpr(centroids, col("qe")), 1, nProbe))
          .as("cell"))

    val cands = assigned
      .join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosineSimilarity(col("qe"), col("embedding")))
    // Partial top-k per partition (H3 aggregator, as in D1): only
    // q·k scored rows cross the shuffle, not every candidate.
    cands.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k)(col("sim"), col("vec_id")).as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("sim"))
  }

  /** Cells ordered by distance to `qe` (closest first). Cell ids are
    * long to match `cellExpr`'s array_position output (equi-join key).
    */
  private[operators] def sortedCellsExpr(cents: Array[Array[Double]],
      qe: Column): Column = {
    val lit2d = typedlit(cents.map(_.toSeq).toSeq)
    val withIdx = zip_with(lit2d,
      sequence(lit(0L), lit((cents.length - 1).toLong)),
      (c, i) => struct(
        aggregate(zip_with(qe, c, (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, v) => acc + v).as("d"),
        i.as("cell")))
    transform(array_sort(withIdx), s => s.getField("cell"))
  }

  val oracles: Map[String, String] = Map(
    "ann_topk_exact" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS qe
        |  FROM embeddings WHERE vec_id < 5),
        |s AS (SELECT query_id, e.vec_id AS neighbor_id,
        |  list_reduce([CAST(qe[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |    for i in range(1, len(qe) + 1)], (x, y) -> x + y)
        |  / (sqrt(list_reduce([CAST(qe[i] AS DOUBLE) * CAST(qe[i] AS DOUBLE)
        |      for i in range(1, len(qe) + 1)], (x, y) -> x + y))
        |    * sqrt(list_reduce([CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)
        |      for i in range(1, len(e.embedding) + 1)], (x, y) -> x + y))) AS sim
        |  FROM q, embeddings e WHERE e.vec_id != q.query_id),
        |r AS (SELECT query_id, neighbor_id, sim,
        |  ROW_NUMBER() OVER (PARTITION BY query_id
        |    ORDER BY sim DESC, neighbor_id ASC) AS rank
        |  FROM s)
        |SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 10""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_topk_exact" -> ((s, d) => topkExact(s, d)),
    "ann_ivf" -> ((s, d) => ivfTopk(s, d))
  )
}
