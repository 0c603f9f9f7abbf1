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
    val ranked = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, sorted.schema.add(out, LongType,
      nullable = false))
  }
}
