package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Stage-by-stage wall-clock probe of the C20a/C20b exact-substring
  * pipelines at a given corpus dir (default: the 10× board data) —
  * localizes which stage owns the 10× gap vs DuckDB before any
  * rewrite is attempted (the E4/E9 lesson: measure, then fuse).
  */
object DriveSubstrProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/target/scale10")
    val w = 12
    val spark = graft.GraftSession.local(32)
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $label%-44s ${(System.nanoTime() - t0) / 1e9}%7.2f s  (rows=$n)")
    }
    val docs = Tables(spark, dir, "documents")
    val wh = graft.operators.Dedup.windowHashesProbe(docs, w)
    time("windowHashes map pass only") { wh.count() }
    val counts = wh.groupBy(col("h")).agg(count(lit(1)).as("occ"))
    time("+ groupBy h count (shuffle 1)") { counts.count() }
    val okH = counts.filter(col("occ") <= 1000 && col("occ") >= 2)
      .select(col("h"))
    time("+ join + collect_set doc sets") {
      wh.join(okH, Seq("h"))
        .groupBy(col("h"))
        .agg(sort_array(collect_set(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) >= 2).count()
    }
    time("full substringPairs (2 reps, min)") {
      val a = graft.operators.Dedup.substringPairsOf(docs, w, 1000).count()
      graft.operators.Dedup.substringPairsOf(docs, w, 1000).count()
      a
    }
    time("full substringSpans") {
      graft.operators.Dedup.substringSpans(spark, dir, w).count()
    }
    spark.stop()
  }
}
