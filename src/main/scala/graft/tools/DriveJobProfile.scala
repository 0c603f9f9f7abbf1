package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** r15 OPT measurement probe (guide §1): per-JOB timeline of one or
  * more declared queries — where a multi-job operator spends its
  * wall clock (fixture writes, inference scans, typed writes,
  * read-backs), which the single bench number hides. One warmup
  * execution, then a timed execution with a job listener recording
  * (jobId, duration, first stage name). Not library surface.
  *
  * SPARK_GRAFT_ONLY=csv_sql_interface SPARK_GRAFT_SF_DIR=... \
  *   sbt "runMain graft.tools.DriveJobProfile"
  */
object DriveJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder().master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = sys.env.getOrElse("SPARK_GRAFT_ONLY", "csv_sql_interface")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq

    case class J(id: Int, start: Long, var end: Long = -1L,
        var desc: String = "", var stages: String = "", var nTasks: Int = 0)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    val order = new java.util.concurrent.ConcurrentLinkedQueue[Int]()
    var recording = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        if (recording) {
          val j = J(js.jobId, js.time)
          j.desc = Option(js.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .getOrElse("")
          j.stages = js.stageInfos.map(_.name.takeWhile(_ != '\n'))
            .mkString(" ; ").take(120)
          j.nTasks = js.stageInfos.map(_.numTasks).sum
          jobs.put(js.jobId, j)
          order.add(js.jobId)
          ()
        }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val j = jobs.get(je.jobId)
        if (j != null) j.end = je.time
      }
    })

    names.foreach { name =>
      // warmup (JIT + codegen), matching Bench's protocol shape
      SparkEntry.queries(name)(spark, sfDir).count()
      SparkEntry.queries(name)(spark, sfDir).count()
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(250)
      jobs.clear(); order.clear()
      recording = true
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      recording = false
      Thread.sleep(200) // let listener drain
      println(f"=== $name%s wall=${wall}%.3f s ===")
      var sum = 0.0
      var prevEnd = -1L
      order.forEach { id =>
        val j = jobs.get(id)
        val dur = (j.end - j.start) / 1e3
        val gap = if (prevEnd > 0) (j.start - prevEnd) / 1e3 else 0.0
        prevEnd = j.end
        sum += dur
        println(f"  job ${j.id}%3d ${dur}%7.3f s  gap=${gap}%6.3f  " +
          f"tasks=${j.nTasks}%3d  ${j.stages}%s")
      }
      println(f"  jobs_total=${sum}%.3f s  (wall − jobs = driver/planning)")
    }
    spark.stop()
  }
}
