package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextFunctions._

/** Stage-by-stage wall-clock probe of the E10 fluency pipeline at a
  * given corpus dir (default: the 100× scale-probe) — used to find
  * which stage stops scaling. Throwaway-style but kept: scale
  * regressions recur and this is the harness that localizes them.
  */
object DriveFluencyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale_probe")
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }
    val d = Tables(spark, dir, "documents")
    time("tokenize+count only") {
      d.select(wsTokens(lower(col("text"))).as("w")).count()
    }
    val t = d.select(col("doc_id"), wsTokens(lower(col("text"))).as("w"))
    time("explode unigrams + agg") {
      t.select(explode(col("w")).as("w1"))
        .groupBy(col("w1")).agg(count(lit(1))).count()
    }
    time("explode bigrams + agg") {
      t.select(explode(bigramArray(col("w"))).as("bigram"))
        .groupBy(col("bigram")).agg(count(lit(1))).count()
    }
    time("docBi explode only") {
      t.select(col("doc_id"), explode(bigramArray(col("w"))).as("bigram"))
        .count()
    }
    time("full fluency WITHOUT persist") {
      graft.operators.TextQueries.fluency(spark, dir, persist = false)
        .count()
    }
    time("full fluency as shipped (persisted)") {
      spark.catalog.clearCache()
      graft.operators.TextQueries.fluency(spark, dir).count()
    }
    spark.stop()
  }
}
