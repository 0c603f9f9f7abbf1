package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.GraftFunctions

/** Stage-by-stage probe of the E9 repetition pipeline (the r6
  * anti-scaling investigation) — same role as DriveFluencyProbe.
  */
object RepPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale10")
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      var best = Long.MaxValue
      var n = 0L
      for (_ <- 1 to 2) {
        val t0 = System.nanoTime()
        n = f
        best = math.min(best, System.nanoTime() - t0)
      }
      println(f"[probe] $label%-40s ${best / 1e9}%7.2f s  (rows=$n)")
    }
    val d = Tables(spark, dir, "documents")
    val g = d.select(col("doc_id"),
      explode(GraftFunctions.wsNgrams(lower(col("text")), 1, 2)).as("g"))
    time("explode grams only") { g.count() }
    time("+ (doc,g) count") {
      g.groupBy(col("doc_id"), col("g")).agg(count(lit(1))).count()
    }
    time("full repetition") {
      graft.operators.Curation.repetitionOf(
        d.select(col("doc_id"), col("text"))).count()
    }
    spark.stop()
  }
}
