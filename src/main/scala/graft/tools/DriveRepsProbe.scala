package graft.tools

import org.apache.spark.sql.SparkSession

/** JIT-convergence probe: run each named query N times under the
  * Bench per-rep hygiene (cache clear + GC fence + settle) and print
  * EVERY rep's wall time. Separates "the plan costs X" from "the
  * JVM hadn't finished compiling the plan's codegen yet" — the r11
  * clean-corpus question (min-of-7 read 1.05 s where the board's
  * 2-warmup+min-of-2 read 1.72 s) is exactly a convergence-curve
  * question, and one number per protocol can't answer it. Not
  * library surface.
  */
object DriveRepsProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "8").toInt
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- args) {
      val q = graft.SparkEntry.queries(name)
      val ts = (1 to reps).map { _ =>
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime()
        q(spark, sf).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"===== $name reps=" +
        ts.map(t => f"$t%.3f").mkString(" ") +
        f" min=${ts.min}%.3f last3min=${ts.takeRight(3).min}%.3f")
    }
    spark.stop()
  }
}
