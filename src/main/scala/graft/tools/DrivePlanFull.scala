package graft.tools

/** Dump the full optimized logical + executed plan of named queries
  * (plan-shape debugging; DrivePlans shows the filtered summary). */
object DrivePlanFull {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.001"
    for (n <- args) {
      println(s"===== $n (optimized) =====")
      val qe = graft.SparkEntry.queries(n)(spark, dir).queryExecution
      println(qe.optimizedPlan.toString.take(4000))
      println(s"===== $n (executed) =====")
      println(qe.executedPlan.toString.take(4000))
    }
    spark.stop()
  }
}
