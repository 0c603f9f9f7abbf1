package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Distributed global row numbering — a total-order rank with NO
  * single-reducer pass over the data.
  *
  * `row_number() OVER (ORDER BY …)` without a PARTITION BY plans a
  * single-partition window: the whole input funnels through one task,
  * which is exactly the bottleneck a 100 TB engine cannot have. The
  * scalable shape is the classic two-phase rank: range-exchange on
  * the order keys (sampled boundaries — the same machinery as
  * `orderBy`/`exportSorted`), local sort, then per-partition offsets
  * added to each row's local index.
  *
  * The offset phase is `RDD.zipWithIndex` over the sorted plan's ONE
  * materialized RDD lineage — its count job and the main job share
  * the same ShuffledRDD and partitioner instance, so the sampled
  * range boundaries are fixed once and every consumer sees the same
  * partition contents by construction. The earlier DataFrame-only
  * formulations were subtly unsound: offsets collected in a separate
  * query re-planned a NEW range exchange whose sample could differ
  * (wrong ranks the moment any SQL execution slipped between offset
  * job and consumer — observed via a `.rdd` call), and an in-plan
  * offsets-side/data-side pair agrees only while ReuseExchange
  * dedupes the two subtrees (a supported config away from silent
  * corruption). Dropping to the RDD for exactly this utility is the
  * licensed `mapPartitions`-class exception: per-partition positional
  * indexing is genuinely imperative.
  *
  * Ranks are deterministic outputs regardless of boundaries: under a
  * TOTAL order a row's position is unique, which is why `order` must
  * include a unique tiebreak column.
  */
object Ranks {

  /** `df` + a 1-based `out` column numbering rows under `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      out: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    val sorted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
    zipRanked(sorted, out)
  }

  /** [[globalRowNumber]] specialized to a LEADING key that is a
    * uniform hex-encoded hash (md5/sha — the deterministic-shuffle
    * keys of C22/C12): the range boundaries of a uniform key are
    * known analytically, so the sampling job `repartitionByRange`
    * runs to discover them — a full extra execution of the upstream
    * plan — is dropped entirely. Bucket = the key's first 15 hex
    * digits (60 bits) divided into `n` equal-width contiguous
    * ranges; bucket order IS lexicographic key order (fixed-width
    * hex), and ties beyond the prefix stay inside one bucket, where
    * the per-partition external sort (Spark's spillable
    * `sortWithinPartitions`, not an in-memory array sort) orders
    * them under the full `order`. Uniformity also makes the buckets
    * balanced by construction — the very guarantee sampling only
    * approximates.
    *
    * `hashKey` must be a fixed-width lowercase-hex NON-NULL column
    * and must be the first element of `order`; rank output is
    * identical to [[globalRowNumber]] on the same `order` (spec-
    * pinned), only the job count differs.
    */
  def hashOrderedRowNumber(df: DataFrame, hashKey: Column,
      order: Seq[Column], out: String): DataFrame =
    zipRanked(hashRangePartitioned(df, hashKey, order), out)

  /** The analytic-boundary core, also usable on its own (H16's
    * shuffled export): rows land in equal-width 60-bit-hash-prefix
    * buckets — bucket index = partition index, so partition order IS
    * lexicographic key order — and each partition runs Spark's
    * spillable sort under the full `order`. Globally sorted output
    * with no sampling job.
    */
  private[graft] def hashRangePartitioned(df: DataFrame, hashKey: Column,
      order: Seq[Column]): DataFrame = {
    import org.apache.spark.sql.functions.{conv, substring}
    val spark = df.sparkSession
    val n = spark.sparkContext.defaultParallelism
    // ceil-width so v/width < n for every v in [0, 2^60)
    val width = (1L << 60) / n + 1
    val b = "__graft_bucket"
    val withB = df.withColumn(b,
      (conv(substring(hashKey, 1, 15), 16, 10).cast(LongType) /
        width).cast("int"))
    val bIdx = withB.schema.fieldIndex(b)
    val parted = withB.rdd
      .map(r => (r.getInt(bIdx), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = n
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)
    spark.createDataFrame(parted, withB.schema)
      .sortWithinPartitions(order: _*)
      .drop(b)
  }

  private def zipRanked(sorted: DataFrame, out: String): DataFrame = {
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    sorted.sparkSession.createDataFrame(ranked,
      sorted.schema.add(out, LongType, nullable = false))
  }
}
