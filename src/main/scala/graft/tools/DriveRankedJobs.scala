package graft.tools

import graft.{GraftSession, SparkEntry}

/** Which Spark job fires while searchRanked merely PLANS? */
object DriveRankedJobs {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val sf = "/root/testdata/sf0.001"
    SparkEntry.queries("text_index_build")(spark, sf).count()
    val jobs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobs.add(s"job ${js.jobId}: " +
            js.properties.getProperty("spark.job.description", "?") + " | " +
            js.stageInfos.map(_.name).mkString(" ; "))
          ()
        }
      })
    val df = SparkEntry.queries("text_search_ranked")(spark, sf)
    Thread.sleep(500)
    println("=== jobs during plan construction ===")
    jobs.forEach(j => println(j))
    println("=== now the action ===")
    df.count()
    spark.stop()
  }
}
