package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** Board-protocol self-profile (r14, VERDICT r13 #6 / SURVEY carry
  * item e): the last unexplained measurement confounder is in-suite
  * inflation — board rows read 1.5–2.5× their isolated times even
  * with Bench's per-query cache clear + GC fence. The untested
  * suspect is shuffle-FILE accumulation: every exchange leaves files
  * under blockmgr-* until ContextCleaner GCs the owning objects, so a
  * long board might drown the OS page cache / dentry tables in dead
  * files. This probe replays the Bench protocol (clearCache + gc +
  * settle, timed count) over the headline set and records the
  * blockmgr file census after every query. If inflation tracks the
  * census, the board needs an explicit cleaner nudge; if the census
  * plateaus or the slow rows sit at LOW census points, the suspect is
  * dead and the residual is plain cross-query GC/JIT debt. Not
  * library surface.
  */
object DriveBoardProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the headline board, Bench's order
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(!_.endsWith("_check"))
      .filter(n => only.forall(_.contains(n)))

    def census(): (Long, Long) = {
      val tmp = new java.io.File(
        sys.props.getOrElse("java.io.tmpdir", "/tmp"))
      var files = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit = {
        val ls = f.listFiles()
        if (ls != null) ls.foreach { c =>
          if (c.isDirectory) walk(c)
          else { files += 1; bytes += c.length() }
        }
      }
      val ls = tmp.listFiles()
      if (ls != null)
        ls.filter(_.getName.startsWith("blockmgr-")).foreach(walk)
      (files, bytes)
    }

    def runOne(name: String): Double = {
      spark.catalog.clearCache()
      System.gc()
      Thread.sleep(250)
      val t0 = System.nanoTime()
      try SparkEntry.queries(name)(spark, sfDir).count()
      catch { case e: Throwable =>
        System.err.println(s"$name FAILED: ${e.getMessage}"); return -1.0 }
      (System.nanoTime() - t0) / 1e9
    }

    println("phase,query,sec,blockmgr_files,blockmgr_mb")
    names.foreach(runOne) // warmup (Bench pass 1)
    names.foreach { n =>
      val t = runOne(n)
      val (f, b) = census()
      println(f"measured,$n,$t%.3f,$f,${b / 1024 / 1024}")
    }
    val (f, b) = census()
    println(f"end,-,0.0,$f,${b / 1024 / 1024}")
  }
}
