package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** r14: interleaved A/B of B3/B4 join shapes at the big-join scales
  * (scale10 and the 100x scale_joins dir) — SMJ-with-pre-agg (the
  * shipped q3), join-first shuffle-hash, and all-SHJ q5. The host VM
  * phases 2-4x minute-to-minute, so variants alternate per rep and
  * per-variant minima decide (the DriveCleanAb discipline). Not
  * library surface.
  */
object DriveQ100Probe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale100joins")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val cutoff = lit("1997-06-01").cast("timestamp")

    def lfilt = Tables(spark, sf, "lineitem")
      .filter(col("l_shipdate") > cutoff)

    def q3Of(shj: Boolean, preAgg: Boolean): DataFrame = {
      val c = Tables(spark, sf, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
      val o0 = Tables(spark, sf, "orders")
        .filter(col("o_orderdate") < cutoff)
      val o = if (shj) o0.hint("shuffle_hash") else o0
      if (preAgg) {
        val l = lfilt.groupBy(col("l_orderkey"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,6)")).as("revenue"))
        l.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
      } else {
        lfilt.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,6)")).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
      }
    }

    def q5Of(shj: Boolean, oOnly: Boolean = false): DataFrame = {
      val r = Tables(spark, sf, "region").filter(col("r_name") === "ASIA")
      val n = Tables(spark, sf, "nation")
      val s0 = Tables(spark, sf, "supplier")
      val c0 = Tables(spark, sf, "customer")
      val o0 = Tables(spark, sf, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      val (o, s, c) =
        if (oOnly) (o0.hint("shuffle_hash"), s0, c0)
        else if (shj) (o0.hint("shuffle_hash"), s0.hint("shuffle_hash"),
          c0.hint("shuffle_hash"))
        else (o0, s0, c0)
      Tables(spark, sf, "lineitem")
        .join(o, col("l_orderkey") === col("o_orderkey"))
        .join(s, col("l_suppkey") === col("s_suppkey"))
        .join(c,
          col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .cast("decimal(38,6)")).as("revenue"))
    }

    val variants: Seq[(String, () => DataFrame)] = Seq(
      ("q3_shipped_preaggSMJ", () => q3Of(shj = false, preAgg = true)),
      ("q3_preagg_SHJ", () => q3Of(shj = true, preAgg = true)),
      ("q3_joinfirst_SHJ", () => q3Of(shj = true, preAgg = false)),
      ("q5_shipped_SMJ", () => q5Of(shj = false)),
      ("q5_all_SHJ", () => q5Of(shj = true)),
      ("q5_o_SHJ", () => q5Of(shj = false, oOnly = true)),
      ("q3_bucketed_shipped", () =>
        graft.operators.Analytics.q3Bucketed(spark, sf)),
      ("q3_bucketed_joinfirst", () => {
        val (db, n) = graft.operators.Analytics.bucketedWarehouseProbe(spark, sf)
        val c = Tables(spark, sf, "customer")
          .filter(col("c_mktsegment") === "BUILDING")
        val o = db.readBucketed(s"orders_b$n")
          .filter(col("o_orderdate") < cutoff)
        db.readBucketed(s"lineitem_b$n")
          .filter(col("l_shipdate") > cutoff)
          .join(o.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .join(c, col("o_custkey") === col("c_custkey"))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .cast("decimal(38,6)")).as("revenue"))
          .select(col("l_orderkey"), col("revenue"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
          .orderBy(col("revenue").desc, col("l_orderkey").asc).limit(10)
      }))

    val best = scala.collection.mutable.Map[String, Double]()
    variants.foreach { case (_, f) => f().count() } // warm
    for (rep <- 1 to reps; (nm, f) <- variants) {
      spark.catalog.clearCache(); System.gc(); Thread.sleep(100)
      val t0 = System.nanoTime()
      f().count()
      val s = (System.nanoTime() - t0) / 1e9
      best(nm) = math.min(best.getOrElse(nm, Double.MaxValue), s)
      println(f"rep$rep $nm%-22s $s%.3f")
    }
    println(s"== min-of-$reps @ $sf")
    variants.foreach { case (nm, _) => println(f"$nm%-22s ${best(nm)}%.3f") }
  }
}
