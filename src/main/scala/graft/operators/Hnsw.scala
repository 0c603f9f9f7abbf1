package graft.operators

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** D7: HNSW-style graph ANN (SURVEY.md §2.D, §7 r4 stretch).
  *
  * HNSW (Malkov & Yashunin, 2016) is a sequential in-memory insert
  * algorithm; the Spark-native shape is the one production systems
  * shard it into: build an independent graph PER PARTITION inside
  * `mapPartitions`, fan each (broadcast) query out to every
  * partition's graph, and merge the per-partition candidates with the
  * same partial top-k aggregator D1/D2 use — only q·k rows per
  * partition cross the merge shuffle.
  *
  * Scale accounting at 100 TB: graph build is embarrassingly parallel
  * (no shuffle at all — each executor indexes only the partition it
  * already holds, O(n·ef·M) per partition), and per-query search cost
  * is O(P·ef·M) — independent of corpus size within a partition,
  * which is the whole point of the graph vs the O(n) brute scan.
  * Memory: one partition's vectors + adjacency must fit an executor
  * core, the same bound `spark.sql.files.maxPartitionBytes` already
  * enforces for any columnar scan (adjacency adds ~M ints/node).
  * [[hnswTopk]] builds ephemeral graphs inline;
  * [[buildHnswIndex]]/[[hnswTopkFromIndex]] persist them as blob
  * rows and serve without rebuilding (the D9 lifecycle).
  *
  * Determinism (spec-pinned): insertion order is the partition
  * iterator's order, node levels derive from a splitmix64 hash of
  * vec_id (not a RNG), and every comparison tie-breaks on id — same
  * inputs, same graph, same results.
  */
object Hnsw {

  /** Unit-normalize in doubles so cosine(a, b) = dot(â, b̂). */
  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0.0) v
    else {
      val out = new Array[Double](v.length)
      i = 0
      while (i < v.length) { out(i) = v(i) / n; i += 1 }
      out
    }
  }

  private def dot(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** Deterministic level for a node: splitmix64(vec_id) → uniform in
    * (0,1) → geometric-ish ⌊−ln(u)·mL⌋, the HNSW level law with the
    * RNG replaced by a hash so rebuilds are reproducible.
    */
  private def levelOf(id: Long, mL: Double): Int = {
    var z = id + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z = z ^ (z >>> 31)
    val u = ((z >>> 11).toDouble + 1.0) / (1L << 53).toDouble // (0,1]
    math.min((-math.log(u) * mL).toInt, 31)
  }

  /** One partition's hierarchical graph over `vecs` (unit vectors).
    * `adj(l)(n)` lists n's neighbors on layer l (layer 0 = all nodes).
    */
  private final class Graph(vecs: Array[Array[Double]], ids: Array[Long],
      m: Int, efConstruction: Int) {
    private val mL = 1.0 / math.log(m.toDouble)
    private val maxM0 = 2 * m
    private val levels: Array[Int] = ids.map(levelOf(_, mL))
    private val adj: Array[Array[mutable.ArrayBuffer[Int]]] =
      Array.tabulate(vecs.length) { n =>
        Array.fill(levels(n) + 1)(new mutable.ArrayBuffer[Int](m))
      }
    private var entry: Int = -1

    // sim desc, id asc — the one ordering used everywhere
    private def better(s1: Double, n1: Int, s2: Double, n2: Int): Boolean =
      s1 > s2 || (s1 == s2 && ids(n1) < ids(n2))

    /** Beam search on layer `l` from `from`, beam width `ef`;
      * returns candidates sorted best-first.
      */
    private def searchLayer(q: Array[Double], from: Int, l: Int,
        ef: Int): mutable.ArrayBuffer[(Double, Int)] = {
      val visited = mutable.HashSet[Int](from)
      // PriorityQueue dequeues the ordering's MAX: frontier ranks the
      // best candidate greatest, results the worst (so overflow
      // eviction drops the worst and head reads the current worst).
      val bestFirst: Ordering[(Double, Int)] =
        Ordering.fromLessThan((a, b) => better(b._1, b._2, a._1, a._2))
      val frontier =
        mutable.PriorityQueue((dot(q, vecs(from)), from))(bestFirst)
      val results =
        mutable.PriorityQueue((dot(q, vecs(from)), from))(bestFirst.reverse)
      while (frontier.nonEmpty) {
        val (cs, c) = frontier.dequeue()
        val (ws, w) = results.head
        if (results.size >= ef && better(ws, w, cs, c)) frontier.clear()
        else adj(c)(l).foreach { n =>
          if (visited.add(n)) {
            val s = dot(q, vecs(n))
            val (ws2, w2) = results.head
            if (results.size < ef || better(s, n, ws2, w2)) {
              frontier.enqueue((s, n))
              results.enqueue((s, n))
              if (results.size > ef) results.dequeue()
            }
          }
        }
      }
      val out = mutable.ArrayBuffer.from(results)
      out.sortInPlace()(Ordering.fromLessThan[(Double, Int)](
        (a, b) => better(a._1, a._2, b._1, b._2)))
      out
    }

    /** Greedy single-step descent on layers above `toLayer`. */
    private def descend(q: Array[Double], from: Int, fromLayer: Int,
        toLayer: Int): Int = {
      var cur = from
      var l = fromLayer
      while (l > toLayer) {
        var improved = true
        while (improved) {
          improved = false
          var curSim = dot(q, vecs(cur))
          adj(cur)(l).foreach { n =>
            val s = dot(q, vecs(n))
            if (better(s, n, curSim, cur)) { cur = n; curSim = s; improved = true }
          }
        }
        l -= 1
      }
      cur
    }

    def insert(n: Int): Unit = {
      if (entry < 0) { entry = n; return }
      val q = vecs(n)
      val lNew = levels(n)
      val lEntry = levels(entry)
      // greedy-descend every layer ABOVE the top beam layer
      // (descend processes layers fromLayer..toLayer+1, same call
      // shape as search()'s descend-to-0-then-beam-at-0)
      var ep = descend(q, entry, lEntry, math.min(lEntry, lNew))
      var l = math.min(lEntry, lNew)
      while (l >= 0) {
        val cands = searchLayer(q, ep, l, efConstruction)
        val cap = if (l == 0) maxM0 else m
        val selected = cands.iterator.filter(_._2 != n).take(m).toArray
        selected.foreach { case (_, nb) =>
          adj(n)(l) += nb
          adj(nb)(l) += n
          if (adj(nb)(l).size > cap) {
            // prune the worst link (relative to nb) to keep degree bounded
            val v = vecs(nb)
            val worst = adj(nb)(l).minBy(x => (dot(v, vecs(x)), -ids(x)))
            adj(nb)(l) -= worst
          }
        }
        ep = if (cands.nonEmpty) cands.head._2 else ep
        l -= 1
      }
      if (lNew > lEntry) entry = n
    }

    def search(q: Array[Double], k: Int, ef: Int): Seq[(Long, Double)] = {
      if (entry < 0) return Nil
      val ep = descend(q, entry, levels(entry), 0)
      searchLayer(q, ep, 0, math.max(ef, k)).iterator
        .take(k).map { case (s, n) => (ids(n), s) }.toSeq
    }

    // persisted-lifecycle hooks: adjacency out for serialization,
    // adjacency in for a graph restored WITHOUT re-running inserts
    // (levels recompute from the id hash — deterministic by design)
    def exportAdj: Array[Array[Array[Int]]] = adj.map(_.map(_.toArray))
    def exportEntry: Int = entry
    def importAdj(adjIn: Array[Array[Array[Int]]], entryIn: Int): Unit = {
      var n = 0
      while (n < adjIn.length) {
        var l = 0
        while (l < adjIn(n).length) {
          adj(n)(l).clear()
          adj(n)(l) ++= adjIn(n)(l)
          l += 1
        }
        n += 1
      }
      entry = entryIn
    }
  }

  /** Compact binary snapshot of one partition's graph: header (node
    * count, dim, m, entry) then per node (id, vector, per-layer
    * neighbor lists). Vectors ride IN the blob — the graph is only
    * searchable with them, and a serve task must not re-join the
    * corpus to use its index.
    */
  private def serializeGraph(g: Graph, ids: Array[Long],
      vecs: Array[Array[Double]], m: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(
      new java.util.zip.GZIPOutputStream(bos))
    val adj = g.exportAdj
    out.writeInt(ids.length)
    out.writeInt(if (vecs.isEmpty) 0 else vecs(0).length)
    out.writeInt(m)
    out.writeInt(g.exportEntry)
    var n = 0
    while (n < ids.length) {
      out.writeLong(ids(n))
      vecs(n).foreach(out.writeDouble)
      out.writeInt(adj(n).length)
      adj(n).foreach { layer =>
        out.writeInt(layer.length)
        layer.foreach(out.writeInt)
      }
      n += 1
    }
    out.close()
    bos.toByteArray
  }

  private def deserializeGraph(bytes: Array[Byte]): Graph = {
    val in = new java.io.DataInputStream(new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = in.readInt()
    val dim = in.readInt()
    val m = in.readInt()
    val entry = in.readInt()
    val ids = new Array[Long](n)
    val vecs = new Array[Array[Double]](n)
    val adj = new Array[Array[Array[Int]]](n)
    var i = 0
    while (i < n) {
      ids(i) = in.readLong()
      val v = new Array[Double](dim)
      var d = 0
      while (d < dim) { v(d) = in.readDouble(); d += 1 }
      vecs(i) = v
      val layers = in.readInt()
      adj(i) = Array.tabulate(layers) { _ =>
        val cnt = in.readInt()
        Array.fill(cnt)(in.readInt())
      }
      i += 1
    }
    in.close()
    val g = new Graph(vecs, ids, m, 0)
    g.importAdj(adj, entry)
    g
  }

  /** Build one graph over a partition's rows and answer every query
    * against it. Emits up to q·k (query_id, neighbor_id, sim) rows.
    */
  private def partitionSearch(
      rows: Iterator[(Long, Seq[Float])],
      queries: Array[(Long, Array[Double])],
      k: Int, m: Int, efConstruction: Int,
      efSearch: Int): Iterator[(Long, Long, Double)] = {
    val ids = mutable.ArrayBuffer[Long]()
    val vecs = mutable.ArrayBuffer[Array[Double]]()
    rows.foreach { case (id, v) =>
      ids += id
      vecs += normalize(v.toArray.map(_.toDouble))
    }
    if (ids.isEmpty) return Iterator.empty
    val g = new Graph(vecs.toArray, ids.toArray, m, efConstruction)
    var i = 0
    while (i < ids.length) { g.insert(i); i += 1 }
    queries.iterator.flatMap { case (qid, qv) =>
      // over-fetch by one so self can be dropped without losing a slot
      g.search(qv, k + 1, efSearch).iterator
        .filter(_._1 != qid).take(k)
        .map { case (nid, s) => (qid, nid, s) }
    }
  }

  /** `ann_hnsw`: top-k by cosine for the D1 query set, via sharded
    * HNSW graphs. Approximate — spec-pinned against D1's exact ranks
    * (no SQL oracle, like D2/D4/D5).
    */
  def hnswTopk(spark: SparkSession, dir: String, k: Int = 10,
      nQueries: Int = 5, m: Int = 8, efConstruction: Int = 64,
      efSearch: Int = 48): DataFrame = {
    import spark.implicits._
    val e = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    // query side: q rows, collected once and shipped in the closure
    val queries = e.filter(col("vec_id") < nQueries)
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, normalize(v.toArray.map(_.toDouble))) }
      .sortBy(_._1)
    val cands = e.as[(Long, Seq[Float])]
      .mapPartitions(it =>
        partitionSearch(it, queries, k, m, efConstruction, efSearch))
      .toDF("query_id", "neighbor_id", "sim")
    cands.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k)(col("sim"), col("neighbor_id"))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("sim"))
  }

  /** Persisted HNSW lifecycle (VERDICT r5 #6): build each
    * partition's graph ONCE and store it as a binary blob row in
    * `<name>_graphs`; serving deserializes the blobs and searches —
    * no O(n·ef·M) rebuild per query batch. Build stays shuffle-free
    * (each executor serializes the partition it already holds);
    * determinism (insertion order, hash levels, id tie-breaks) makes
    * rebuild idempotent — spec-pinned.
    */
  def buildHnswIndex(db: graft.catalog.GraftDatabase, e: DataFrame,
      name: String, m: Int = 8, efConstruction: Int = 64): Unit = {
    val spark = db.spark
    import spark.implicits._
    val mm = m
    val efc = efConstruction
    val blobs = e.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])]
      .mapPartitions { it =>
        val ids = mutable.ArrayBuffer[Long]()
        val vecs = mutable.ArrayBuffer[Array[Double]]()
        it.foreach { case (id, v) =>
          ids += id
          vecs += normalize(v.toArray.map(_.toDouble))
        }
        if (ids.isEmpty) Iterator.empty
        else {
          val g = new Graph(vecs.toArray, ids.toArray, mm, efc)
          var i = 0
          while (i < ids.length) { g.insert(i); i += 1 }
          Iterator.single(serializeGraph(g, ids.toArray, vecs.toArray, mm))
        }
      }
      .toDF("graph")
    db.write(blobs, s"${name}_graphs", org.apache.spark.sql.SaveMode.Overwrite)
  }

  /** Serve top-k from stored graphs: queries broadcast in the
    * closure, one deserialization per blob, same candidate merge as
    * [[hnswTopk]].
    */
  def hnswTopkFromIndex(db: graft.catalog.GraftDatabase, name: String,
      queries: DataFrame, k: Int = 10, efSearch: Int = 48): DataFrame = {
    val spark = db.spark
    import spark.implicits._
    val qs = queries.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
      .map { case (id, v) => (id, normalize(v.toArray.map(_.toDouble))) }
      .sortBy(_._1)
    val cands = db.read(s"${name}_graphs").select(col("graph"))
      .as[Array[Byte]]
      .mapPartitions(_.flatMap { blob =>
        val g = deserializeGraph(blob)
        qs.iterator.flatMap { case (qid, qv) =>
          g.search(qv, k + 1, efSearch).iterator
            .filter(_._1 != qid).take(k)
            .map { case (nid, s) => (qid, nid, s) }
        }
      })
      .toDF("query_id", "neighbor_id", "sim")
    cands.groupBy(col("query_id"))
      .agg(graft.functions.TopK.topk(k)(col("sim"), col("neighbor_id"))
        .as("tk"))
      .select(col("query_id"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("query_id"), col("s.id").as("neighbor_id"),
        (col("idx") + 1).as("rank"), col("s.score").as("sim"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_hnsw" -> ((s, d) => hnswTopk(s, d))
  )
}
