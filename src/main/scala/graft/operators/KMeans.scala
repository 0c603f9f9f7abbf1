package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Deterministic in-core Lloyd over a bounded training sample
  * (SURVEY.md §2.D2/D4/D5).
  *
  * Scale rationale: quantizer quality is a property of the data
  * DISTRIBUTION, not the corpus size — production ANN systems train
  * coarse quantizers and PQ codebooks on a fixed-size sample (FAISS
  * recommends ~10⁵–10⁶ vectors regardless of index size) and reserve
  * the distributed passes for what actually scales with data:
  * assignment and encoding. Trading the old one-Spark-job-per-Lloyd-
  * iteration trainer for a one-pass sample collect therefore keeps
  * the 100 TB story intact (the sample is O(sampleN·dim) driver
  * memory, gathered with a single TakeOrdered scan) while removing
  * per-iteration job latency entirely — iterations are now free, so
  * codebooks can afford to converge properly.
  *
  * Determinism: sample = the sampleN lowest vec_ids (total order),
  * init = first k sample vectors, fixed iteration count, index-ordered
  * double accumulation, ties to the lowest cell. Empty cells keep
  * their previous centroid.
  */
object KMeans {

  /** One TakeOrdered pass: the sampleN lowest vec_ids as dense
    * double vectors (deterministic under any partitioning).
    */
  def sampleVectors(e: DataFrame, sampleN: Int): Array[Array[Double]] =
    e.orderBy(col("vec_id")).limit(sampleN).collect()
      .map(_.getSeq[Float](1).map(_.toDouble).toArray)

  /** Deterministic Lloyd: init from the first k sample rows. */
  def lloyd(sample: Array[Array[Double]], k: Int,
      iters: Int): Array[Array[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val dim = sample(0).length
    var cents = Array.tabulate(k)(i => sample(i).clone())
    for (_ <- 1 to iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      var v = 0
      while (v < sample.length) {
        val x = sample(v)
        var best = 0; var bestD = Double.MaxValue
        var c = 0
        while (c < k) {
          val ct = cents(c)
          var d = 0.0
          var i = 0
          while (i < dim) { val f = x(i) - ct(i); d += f * f; i += 1 }
          if (d < bestD) { bestD = d; best = c }
          c += 1
        }
        val s = sums(best)
        var i = 0
        while (i < dim) { s(i) += x(i); i += 1 }
        counts(best) += 1
        v += 1
      }
      cents = Array.tabulate(k)(c =>
        if (counts(c) == 0) cents(c)
        else { val s = sums(c); Array.tabulate(dim)(i => s(i) / counts(c)) })
    }
    cents
  }
}
