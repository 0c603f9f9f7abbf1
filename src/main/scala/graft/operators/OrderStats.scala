package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Shared exact order-statistics machinery (B16 median, B22
  * percentiles, C18 quantile bands).
  *
  * The scale insight all three share: don't rank raw rows. Build a
  * per-group VALUE HISTOGRAM — the corpus-scale pass is then a
  * map-side-combined count whose shuffle carries only distinct
  * (group, value) pairs, and the rank windows sort the histogram,
  * not the corpus (row_number over raw rows shuffled and sorted the
  * whole table; measured 1.14 s vs 0.52 s at sf0.1 on B16, a gap
  * that widens with scale). Rank math is integer-only —
  * (n·p + 99) div 100 — so picked values are bit-identical
  * cross-engine.
  */
object OrderStats {

  /** Histogram of `valueCol` per `groupCols` group: each (group,
    * value) row carries its multiplicity `cnt`, the rank interval
    * [`lo_rank`, `hi_rank`] its copies occupy in the group's sorted
    * order, and the group total `n`.
    */
  def histogram(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val byGroup = Window.partitionBy(groupCols.map(col): _*)
    df.groupBy((groupCols :+ valueCol).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .withColumn("hi_rank",
        sum(col("cnt")).over(byGroup.orderBy(col(valueCol).asc)))
      .withColumn("lo_rank", col("hi_rank") - col("cnt") + 1)
      .withColumn("n", sum(col("cnt")).over(byGroup))
  }

  /** Aggregate over a [[histogram]]: the group's discrete p-th
    * percentile — the value whose rank span covers ⌈p·n/100⌉
    * (quantile_disc semantics, no interpolation).
    */
  def pick(p: Int, valueCol: String): Column =
    max(when(expr(s"(n * $p + 99) div 100")
      .between(col("lo_rank"), col("hi_rank")), col(valueCol)))
}
