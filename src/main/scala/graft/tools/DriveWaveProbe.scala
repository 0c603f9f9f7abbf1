package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Job/stage wave profile for one or more bench queries (VERDICT r10
  * #6): each Spark ACTION is a job, each job a chain of stage waves,
  * and the sub-second fixed-cost release-artifact rows are suspected
  * to be wave-count-bound rather than throughput-bound. This probe
  * runs a query after a warmup, records every job's wall span and
  * stage count via a listener, and prints the wave ledger — the
  * decomposition that says whether a wave can be cut or the floor is
  * real. Not library surface.
  */
object DriveWaveProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, var t0: Long = 0L, var t1: Long = 0L,
      var stages: Int = 0, var skipped: Int = 0, var site: String = "")
    val jobs = scala.collection.mutable.LinkedHashMap[Int, Job]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        jobs.synchronized {
          val j = jobs.getOrElseUpdate(e.jobId, Job(e.jobId))
          j.t0 = e.time
          j.stages = e.stageInfos.size
          j.site = Option(e.properties)
            .map(p => Option(p.getProperty("callSite.short")).getOrElse(""))
            .getOrElse("")
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(_.t1 = e.time)
        }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        jobs.synchronized {
          if (e.stageInfo.submissionTime.isEmpty)
            jobs.values.lastOption.foreach(_.skipped += 1)
        }
    }

    for (name <- args) {
      val q = graft.SparkEntry.queries(name)
      q(spark, sf).count() // warmup (JIT + codegen + artifacts)
      spark.catalog.clearCache()
      System.gc(); Thread.sleep(300)
      jobs.clear()
      spark.sparkContext.addSparkListener(listener)
      val t0 = System.nanoTime()
      q(spark, sf).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener bus drain
      spark.sparkContext.removeSparkListener(listener)
      println(f"===== $name wall=$wall%.3f s, ${jobs.size} jobs =====")
      jobs.values.foreach { j =>
        println(f"  job ${j.id}%3d  ${(j.t1 - j.t0) / 1000.0}%6.3f s  " +
          f"stages=${j.stages}  ${j.site}")
      }
      val sumJobs = jobs.values.map(j => (j.t1 - j.t0) / 1000.0).sum
      println(f"  sum(job spans)=$sumJobs%.3f s  " +
        f"gap(driver/planning)=${wall - sumJobs}%.3f s")

      if (sys.env.contains("SPARK_GRAFT_WAVE_WARM")) {
        // Warm re-execution ledger: ONE counted Dataset re-executed
        // (Bench's warm-row protocol) — shows which jobs recur when
        // analysis/AQE/broadcasts are all reusable.
        val counted = q(spark, sf).groupBy().count()
        counted.head() // build + first execution, untimed
        (1 to 3).foreach { i =>
          jobs.clear()
          spark.sparkContext.addSparkListener(listener)
          val w0 = System.nanoTime()
          counted.head()
          val wWall = (System.nanoTime() - w0) / 1e9
          Thread.sleep(300)
          spark.sparkContext.removeSparkListener(listener)
          val sj = jobs.values.map(j => (j.t1 - j.t0) / 1000.0).sum
          println(f"  warm#$i wall=$wWall%.3f s jobs=${jobs.size} " +
            f"sum=$sj%.3f gap=${wWall - sj}%.3f " +
            jobs.values.map(j => f"${(j.t1 - j.t0) / 1000.0}%.3f/" +
              f"${j.stages}").mkString("[", " ", "]"))
        }
      }
    }
    spark.stop()
  }
}
