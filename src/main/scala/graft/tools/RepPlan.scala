package graft.tools

/** min-of-3 probe: fluency with vs without the persisted count
  * arrays at the 10x board (r6 constant-factor hunt).
  */
object RepPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale10")
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      var best = Long.MaxValue
      for (_ <- 1 to 3) {
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[probe] $label%-40s ${best / 1e9}%7.2f s")
    }
    time("fluency persist=true") {
      graft.operators.TextQueries.fluency(spark, dir).count()
    }
    time("fluency persist=false") {
      graft.operators.TextQueries.fluency(spark, dir, persist = false).count()
    }
    spark.stop()
  }
}
