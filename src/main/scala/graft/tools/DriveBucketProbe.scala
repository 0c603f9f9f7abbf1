package graft.tools

import org.apache.spark.sql.functions._

/** Decomposes the bucketed q3 plan's cost at the 10x layout: which
  * part of a ZERO-exchange plan still takes ~1.5 s when DuckDB runs
  * the whole query in ~0.1 s. Sub-plans share the session; 4 reps,
  * min reported.
  */
object DriveBucketProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale10")
    val spark = graft.GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def t(name: String)(mk: => org.apache.spark.sql.DataFrame): Unit = {
      val times = (1 to 4).map { _ =>
        val t0 = System.nanoTime()
        mk.count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-34s min=${times.min}%.3f all=${times.map(x => f"$x%.2f").mkString(",")}")
    }

    // warm the bucketed warehouse (build happens here, off the probe)
    graft.operators.Analytics.queries("q3_bucketed")(spark, dir).count()

    val n = spark.sparkContext.defaultParallelism
    val db = graft.catalog.GraftDatabase(spark,
      s"/root/repo/target/graft_scratch/bucketed_${new org.apache.hadoop.fs.Path(dir).getName}_$n/db")
    val cutoff = lit("1997-06-01").cast("timestamp")

    t("bucketed lineitem scan")(db.readBucketed(s"lineitem_b$n")
      .select(col("l_orderkey")))
    t("bucketed lineitem scan+filter")(db.readBucketed(s"lineitem_b$n")
      .filter(col("l_shipdate") > cutoff).select(col("l_orderkey")))
    t("  + groupBy agg")(db.readBucketed(s"lineitem_b$n")
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,6)")).cast("double").as("revenue")))
    t("bucketed orders scan+filter")(db.readBucketed(s"orders_b$n")
      .filter(col("o_orderdate") < cutoff).select(col("o_orderkey")))
    t("l-agg join o (bucketed)")(db.readBucketed(s"lineitem_b$n")
      .filter(col("l_shipdate") > cutoff)
      .groupBy(col("l_orderkey"))
      .agg(sum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .cast("decimal(38,6)")).cast("double").as("revenue"))
      .join(db.readBucketed(s"orders_b$n")
        .filter(col("o_orderdate") < cutoff),
        col("l_orderkey") === col("o_orderkey")))
    t("full q3_bucketed")(
      graft.operators.Analytics.queries("q3_bucketed")(spark, dir))
    t("full q3 unbucketed")(
      graft.operators.Analytics.queries("q3_shipping_priority")(spark, dir))
    t("plain lineitem scan+filter")(
      graft.Tables(spark, dir, "lineitem")
        .filter(col("l_shipdate") > cutoff).select(col("l_orderkey")))

    // r8 floor probe (VERDICT r7 #8): does the residual constant move
    // with the parquet reader knobs? Each variant re-times the full
    // bucketed query under a changed session conf.
    def knob(name: String, key: String, value: String): Unit = {
      val prev = spark.conf.getOption(key)
      spark.conf.set(key, value)
      try t(s"q3_bucketed [$name]")(
        graft.operators.Analytics.queries("q3_bucketed")(spark, dir))
      finally prev match {
        case Some(v) => spark.conf.set(key, v)
        case None => spark.conf.unset(key)
      }
    }
    knob("vectorized OFF", "spark.sql.parquet.enableVectorizedReader", "false")
    knob("batch 16k", "spark.sql.parquet.columnarReaderBatchSize", "16384")
    knob("no codegen", "spark.sql.codegen.wholeStage", "false")
    knob("prefer SHJ", "spark.sql.join.preferSortMergeJoin", "false")

    println("=== q3_bucketed plan ===")
    graft.operators.Analytics.queries("q3_bucketed")(spark, dir)
      .explain("formatted")
    spark.stop()
  }
}
