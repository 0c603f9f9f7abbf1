package graft.tools

import org.apache.spark.sql.SparkSession
import graft.{GraftSession, SparkEntry}

/** Probe for the r9 VERDICT what's-wrong #1: `text_search_and` costs
  * ≈ the full index build (3.19 s vs build 3.08 s at sf0.1) even
  * though the serve path should be a pruned-bucket probe. Reproduces
  * the bench context exactly (build row immediately before the serve
  * rows, clearCache + GC fence per query) and prints the serve plan
  * so SelectedBucketsCount is visible.
  */
object DriveTextProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val names = Seq("text_index_build", "text_search_and",
      "text_search_phrase", "text_search_ranked")
    def runOne(name: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(250)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      (System.nanoTime() - t0) / 1e9
    }
    println("== warmup ==")
    names.foreach(n => println(f"$n%-22s ${runOne(n)}%.3f"))
    println("== measured ==")
    names.foreach(n => println(f"$n%-22s ${runOne(n)}%.3f"))
    println("== plan: text_search_and ==")
    SparkEntry.queries("text_search_and")(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
