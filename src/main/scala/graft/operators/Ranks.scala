package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global row numbering — a total-order rank with NO
  * single-reducer pass over the data.
  *
  * `row_number() OVER (ORDER BY …)` without a PARTITION BY plans a
  * single-partition window: the whole input funnels through one task,
  * which is exactly the bottleneck a 100 TB engine cannot have. The
  * scalable shape is the classic two-phase rank:
  *
  *  1. range-exchange on the order keys (sampled boundaries — the
  *     same machinery as `orderBy`/`exportSorted`), local sort;
  *  2. per-partition row offsets — a numPartitions-row aggregate
  *     (bounded by cluster width, never by data volume) cumulated in
  *     a tiny window and broadcast-joined back.
  *
  * The local index comes from `monotonically_increasing_id()` over
  * the sorted partitions — `partitionId·2³³ + position`, so partition
  * and 0-based position fall out of bit arithmetic with no window
  * and no extra shuffle. Everything is ONE lazy plan: the counts side
  * and the data side share the same range-exchange subtree (reused,
  * not re-executed), so the sampled boundaries and the
  * nondeterministic ids are consistent by construction — there is no
  * eager job, no persist, and no cross-execution agreement to break
  * (an earlier collect-the-offsets formulation returned wrong ranks
  * if ANY SQL execution — even a `.rdd` materialization — slipped
  * between its offset job and the consuming action). Ranks are
  * nevertheless deterministic outputs: under a TOTAL order a row's
  * position is unique whatever the partition boundaries, which is why
  * `order` must include a unique tiebreak column.
  */
object Ranks {

  /** `df` + a 1-based `out` column numbering rows under `order`. */
  def globalRowNumber(df: DataFrame, order: Seq[Column],
      out: String): DataFrame = {
    val n = df.sparkSession.sparkContext.defaultParallelism
    val parted = df.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .withColumn("__mid", monotonically_increasing_id())
    val pid = shiftright(col("__mid"), 33)
    // numPartitions rows: the single-partition window is bounded by
    // cluster width, not data size.
    val offsets = parted.groupBy(pid.as("__pid"))
      .agg(count(lit(1)).as("__c"))
      .withColumn("__off",
        coalesce(sum(col("__c")).over(Window.orderBy(col("__pid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__off"))
    parted
      .join(broadcast(offsets), pid === col("__pid"))
      .withColumn(out,
        col("__off") + col("__mid").bitwiseAND(lit((1L << 33) - 1)) + lit(1L))
      .drop("__mid", "__pid", "__off")
  }
}
