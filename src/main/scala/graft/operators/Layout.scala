package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.catalog.GraftDatabase
import graft.functions.GraftFunctions.zorder

/** Data-layout operators (SURVEY.md §2.H12). At 100 TB the scan is
  * the query: multi-dimensional clustering decides how many files a
  * predicate can skip, before a single operator runs.
  */
object Layout {

  /** H12 exercise: write `orders` Z-ordered on (o_custkey,
    * o_orderkey), read the clustered layout back, and recompute the
    * curve value from the round-tripped columns. The oracle twin
    * recomputes the same interleave in SQL over the ORIGINAL parquet
    * — a hash match proves the layout write preserved the data
    * exactly and the curve arithmetic is engine-portable.
    * Clustering QUALITY (per-file range shrinkage) is pinned by
    * ZOrderSpec, not the oracle.
    */
  def zorderRoundTrip(spark: SparkSession, sfDir: String): DataFrame = {
    val db = CsvQueries.freshDb(spark, "layout_zorder", sfDir)
    // r16 OPT (guide §6): curve bounds + the empty-input check come
    // from parquet FOOTER statistics (exact INT64 min/max, record
    // counts — driver metadata only), replacing the bounds agg that
    // read both key columns corpus-wide. Any unreadable footer →
    // None → writeZOrdered's own scan-agg fallback; footer min/max
    // are exact, so the curve normalization (and every later
    // append's sidecar) is bit-identical either way.
    val src = s"$sfDir/orders.parquet"
    val bounds = Seq("o_custkey", "o_orderkey").flatMap(c =>
      graft.sources.ParquetStats.longColumnRange(spark, src, c)
        .map(c -> _)).toMap
    db.writeZOrdered(
      Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice")),
      "orders_z", Seq("o_custkey", "o_orderkey"), nFiles = 8,
      bounds, graft.sources.ParquetStats.rowCount(spark, src))
    db.read("orders_z").select(
      col("o_orderkey"), col("o_custkey"),
      zorder(col("o_custkey"), col("o_orderkey")).as("z"))
  }

  val oracles: Map[String, String] = Map(
    "layout_zorder" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(list_sum([((o_custkey >> i) & 1) << (2*i)
        |         for i in range(0, 31)])
        |     + list_sum([((o_orderkey >> i) & 1) << (2*i + 1)
        |         for i in range(0, 31)]) AS BIGINT) AS z
        |FROM orders""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "layout_zorder" -> (zorderRoundTrip _)
  )
}
