package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** B26: range join — points against intervals (SURVEY.md §2.B).
  *
  * `points JOIN intervals ON p >= lo AND p < hi` is a theta join:
  * Spark can only plan it as BroadcastNestedLoopJoin (or a cartesian
  * product), O(points × intervals) — a scale killer the moment the
  * interval side outgrows a broadcast. The scale shape is BINNING:
  * pick a bin width ≥ the longest interval, explode each interval
  * into the bins it touches (≤ 2 copies when width ≥ interval
  * length), bin each point once (`floor(p / w)` — a codegen'd map,
  * no explode), and hash-equi-join on the bin before re-checking the
  * exact range predicate. Each point matches an interval's copy only
  * in the point's own bin, so no post-join dedup is needed.
  *
  * Cost at 100 TB: one shuffle of each side keyed by bin (or none
  * for the interval side if it broadcasts), candidates =
  * Σ_bin |points(bin)| × |intervals(bin)| — the data's real temporal
  * locality instead of the full cross product. A hot bin is an
  * ordinary skewed hash-join key: AQE skew split or [[Skew]] salting
  * applies unchanged.
  */
object RangeJoin {

  /** Generic binned range join. `p`, `lo`, `hi` name LongType columns
    * (epoch seconds/ms/days — any consistent unit); every interval
    * must satisfy lo < hi and hi - lo <= binWidth (checked: wider
    * intervals would silently lose matches past the second bin).
    * Output = all point columns + all interval columns.
    */
  def rangeJoin(points: DataFrame, p: String, intervals: DataFrame,
      lo: String, hi: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val w = lit(binWidth)
    // Exact integer floor-division: (v - pmod(v, w)) is divisible by
    // w, so the `div` truncation IS the floor, for negatives too.
    // Spark's `/` on longs is DOUBLE division — above 2^53 it rounds
    // and a boundary point lands in the wrong bin, silently dropping
    // matches (e.g. epoch-nanosecond inputs, a unit the contract
    // allows).
    def binOf(c: Column): Column =
      call_function("div", c - pmod(c, w), w)
    // loud failure beats silent row loss: raise_error inside the bin
    // sequence if an interval overruns the width contract
    val checkedHi = when(col(hi) > col(lo) + w,
      raise_error(concat(lit(s"rangeJoin: interval wider than binWidth=$binWidth: ["),
        col(lo), lit(","), col(hi), lit(")")))).otherwise(col(hi))
    val ivb = intervals
      .filter(col(hi) > col(lo))
      .withColumn("__graft_bin",
        explode(sequence(binOf(col(lo)), binOf(checkedHi - 1))))
    val ptb = points.withColumn("__graft_bin", binOf(col(p)))
    ptb.join(ivb, Seq("__graft_bin"))
      .filter(col(p) >= col(lo) && col(p) < col(hi))
      .drop("__graft_bin")
  }

  /** `q_range_join`: revenue attribution of lineitem shipments into
    * 7-day promo windows derived from every 1000th order — the
    * point-in-interval shape (event → campaign window, log line →
    * deploy window) that SQL writes as a theta join. Interval count
    * scales with the corpus (0.1% of orders), so the interval side is
    * NOT assumed broadcast-able; the bin join works at any size.
    */
  def promoWindowRevenue(spark: SparkSession, dir: String): DataFrame = {
    val day = 86400L
    val iv = Tables(spark, dir, "orders")
      .filter(col("o_orderkey") % 1000 === 0)
      .select(col("o_orderkey").as("promo_id"),
        col("o_orderdate").cast("timestamp_ltz").cast("long").as("lo"))
      .withColumn("hi", col("lo") + lit(7 * day))
    val pts = Tables(spark, dir, "lineitem")
      .select(col("l_shipdate").cast("timestamp_ltz").cast("long").as("p"),
        col("l_extendedprice"))
    rangeJoin(pts, "p", iv, "lo", "hi", binWidth = 7 * day)
      .groupBy(col("promo_id"))
      .agg(count(lit(1)).as("n_items"),
        Analytics.decSum(col("l_extendedprice")).as("revenue"))
  }

  val oracles: Map[String, String] = Map(
    "q_range_join" ->
      """WITH iv AS (
        |  SELECT o_orderkey AS promo_id, o_orderdate AS lo,
        |         o_orderdate + INTERVAL 7 DAY AS hi
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT iv.promo_id, count(*) AS n_items,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS revenue
        |FROM iv JOIN lineitem l
        |  ON l.l_shipdate >= iv.lo AND l.l_shipdate < iv.hi
        |GROUP BY iv.promo_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_range_join" -> ((s, d) => promoWindowRevenue(s, d))
  )
}
