package graft.tools

import org.apache.spark.sql.SparkSession

import graft.{GraftSession, SparkEntry}

/** r15 jitter-settlement probe (VERDICT r14 #5): the two driver-board
  * deltas r14 could not close — `q_events_sessionize` (+17.5% r13→r14
  * on untouched code) and `pipeline_clean_corpus` (re-crossed the 2×
  * letter at 10× while Spark itself improved 20%) — re-measured
  * min-of-N against the `dedup_ngram_jaccard` phase anchor, the
  * DriveCleanAb discipline (alternating reps so no query owns the
  * warm tail; minima cancel host phase). Run once at sf0.1 and once
  * at target/scale10; the DuckDB twin of clean_corpus runs back to
  * back via tools/clean_ab_duck.py in the same phase. Not library
  * surface.
  */
object DriveR15Ab {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val names = Seq("dedup_ngram_jaccard", "q_events_sessionize",
      "pipeline_clean_corpus")
    val best = scala.collection.mutable.Map[String, Double]()
    def timed(rep: Int, n: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      println(f"rep$rep $n%-24s $s%.3f")
    }
    // one untimed warm pass (classloading, parquet footers)
    names.foreach(n => SparkEntry.queries(n)(spark, sf).count())
    for (rep <- 1 to reps)
      names.foreach { n =>
        spark.catalog.clearCache()
        timed(rep, n)(SparkEntry.queries(n)(spark, sf).count())
      }
    println("== min-of-" + reps + " @ " + sf)
    names.foreach(n => println(f"$n%-24s ${best(n)}%.3f"))
  }
}
