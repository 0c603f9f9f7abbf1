package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** One-JVM probe: current q3/q5 shapes vs aggregation-pushdown
  * rewrites (pre-aggregate filtered lineitem by orderkey BELOW the
  * fact-fact join — exact because every order-level predicate is
  * independent of the lineitem rows, and the residual group keys are
  * functionally dependent on the order key). 4 reps each, min shown.
  */
object DriveQ3Probe {
  private def decSum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(38,6)")).cast("double")

  def q3Pushdown(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-06-01").cast("timestamp")
    val c = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    val lAgg = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
    lAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  def q5Pushdown(spark: SparkSession, dir: String): DataFrame = {
    val r = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables(spark, dir, "nation")
    val s = Tables(spark, dir, "supplier")
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    // pre-reduce lineitem to (orderkey, supplier nation) partial sums:
    // the supplier dim broadcasts, so this costs no extra exchange and
    // shrinks the fact-fact shuffle to the distinct (order, nation)
    // pairs
    val lAgg = Tables(spark, dir, "lineitem")
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("l_orderkey"), col("s_nationkey"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("rev"))
    lAgg.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c,
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(sum(col("rev")).as("revenue"))
  }

  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "q3_current" -> (() => graft.operators.Analytics.q3ShippingPriority(spark, dir)),
      "q3_pushdown" -> (() => q3Pushdown(spark, dir)),
      "q5_current" -> (() => graft.operators.Analytics.q5RegionRevenue(spark, dir)))

    variants.foreach { case (name, f) =>
      spark.catalog.clearCache()
      f().count() // warm
      val ts = (1 to 4).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f().count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"PROBE $name%-14s min=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    // row-for-row equality of the rewrites vs current
    val c3 = graft.operators.Analytics.q3ShippingPriority(spark, dir).collect().toSeq
    val p3 = q3Pushdown(spark, dir).collect().toSeq
    println(s"PROBE q3 rows equal: ${c3 == p3}")
    if (c3 != p3) {
      c3.zip(p3).filter(t => t._1 != t._2).take(3)
        .foreach { case (a, b) => println(s"PROBE diff: $a vs $b") }
    }
    spark.stop()
  }
}
