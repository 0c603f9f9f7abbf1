package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

import graft.{GraftSession, Tables}
import graft.operators.KMeans

/** r16 OPT: finer split of ann_pca's construct phase. Not library
  * surface. */
object DrivePcaPhases {
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
      println(f"  [pca] $label%-24s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }
    // warmup
    graft.SparkEntry.queries("ann_pca")(spark, sfDir).write
      .format("noop").mode("overwrite").save()
    spark.sharedState.cacheManager.clearCache()
    for (rep <- 1 to 2) {
      println(s"=== rep $rep ===")
      val base = t("base select") {
        Tables(spark, sfDir, "embeddings")
          .select(col("vec_id"), col("embedding"))
      }
      val spreadd = t("spreadIfNarrow") { Tables.spreadIfNarrow(base) }
      val e = t("persist handle") {
        spreadd.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      }
      val sample = t("sampleVectors") { KMeans.sampleVectors(e, 65536) }
      t("train") { graft.operators.Pca.train(
        sample.map { v =>
          val n = math.sqrt(v.map(x => x * x).sum)
          if (n == 0) v else v.map(_ / n)
        }, 32, center = false) }
      t("unpersist") { e.unpersist() }
      spark.sharedState.cacheManager.clearCache()
    }
    spark.stop()
  }
}
