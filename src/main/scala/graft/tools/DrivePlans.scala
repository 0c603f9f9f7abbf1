package graft.tools

object DrivePlans {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      println(s"===== $n =====")
      val plan = graft.SparkEntry.queries(n)(spark, dir)
        .queryExecution.executedPlan.toString
      // surface scans + joins + exchanges only
      plan.linesIterator.filter(l =>
        l.contains("FileScan") || l.contains("Join") || l.contains("Exchange")
          || l.contains("PushedFilters") || l.contains("TopK"))
        .foreach(l => println(l.take(300)))
    }
    spark.stop()
  }
}
