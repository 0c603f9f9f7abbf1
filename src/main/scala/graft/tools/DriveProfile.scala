package graft.tools

object DriveProfile {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(32)
    val dir = "/root/testdata/sf0.1"
    val names = args.toSeq
    for (n <- names; r <- 1 to 4) {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(n)(spark, dir).count()
      println(f"[drive] $n r$r: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
