package graft.tools

import org.apache.spark.sql.SparkSession

import graft.GraftSession

/** r16 OPT measurement probe (guide §1): attribute the driver gaps
  * DriveJobProfile shows inside a query — split its wall into
  * construct (incl. eager driver work), analyze/optimize, and the
  * action. Usage: SPARK_GRAFT_ONLY=<names> runMain ...DriveGapProbe.
  * Not library surface.
  */
object DriveGapProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  [gap] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "ann_pca")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    for (n <- names) {
      // warmup pass (codegen/class caches), then a timed pass
      graft.SparkEntry.queries(n)(spark, sfDir).write
        .format("noop").mode("overwrite").save()
      spark.sharedState.cacheManager.clearCache()
      println(s"=== $n phases ===")
      val df = t("construct (eager work)") {
        graft.SparkEntry.queries(n)(spark, sfDir)
      }
      t("analyze+optimize") { df.queryExecution.executedPlan }
      t("action (noop write)") {
        df.write.format("noop").mode("overwrite").save()
      }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
