package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** r15 probe: the clean-corpus small path leaves every tail join to
  * AQE's runtime broadcast conversion — each conversion is a stage
  * boundary plus a driver replan (the r12 wave ledger showed 1.35 s
  * of between-stage replan gap on 1.07 s of job time). But the small
  * path only runs AFTER the file-stats gate has PROVEN the corpus
  * small, so explicit broadcast() hints on the post-gate frames are
  * stats-gated (H13 discipline), letting the static planner emit the
  * broadcast joins directly. Interleaved min-of-N, shipped vs
  * hinted. Not library surface.
  */
object DriveCleanBcastAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(): Long =
      graft.operators.Pipeline.cleanCorpus(spark, sf).count()

    // small path with explicit broadcast hints on every tail join
    def hinted(): Long = {
      val t = 0.8
      val canonicalPlan = Tables(spark, sf, "documents")
        .withColumn("__g",
          graft.functions.GraftFunctions.gateStats(col("text")))
        .withColumn("quality", qualityFromGate(col("__g")))
        .withColumn("pred_lang", langIdFromGate(col("__g")))
        .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
        .drop("__g")
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min_by(
          struct(col("doc_id"), col("text"), col("pred_lang"),
            col("quality")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
          col("r.pred_lang").as("pred_lang"),
          col("r.quality").as("quality"))
        .withColumn("sh", Dedup.shingleHashColumnProbe(col("text")))
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          wsTokenCount(col("text")).as("n_tokens"), col("sh"))
      val prefix = canonicalPlan.filter(size(col("sh")) > 0)
        .select(col("doc_id"), explode(slice(col("sh"), lit(1),
          greatest(lit(1),
            (size(col("sh")) - ceil(size(col("sh")) * t) + 1).cast("int"))))
          .as("shingle"))
      val cands = prefix.select(col("doc_id").as("doc_id_a"), col("shingle"))
        .join(broadcast(
          prefix.select(col("doc_id").as("doc_id_b"), col("shingle"))),
          Seq("shingle"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select(col("doc_id_a"), col("doc_id_b"))
      val sa = canonicalPlan.select(col("doc_id").as("doc_id_a"),
        col("sh").as("sh_a"))
      val sb = canonicalPlan.select(col("doc_id").as("doc_id_b"),
        col("sh").as("sh_b"))
      val dupIds = cands.join(broadcast(sa), Seq("doc_id_a"))
        .join(broadcast(sb), Seq("doc_id_b"))
        .withColumn("inter", graft.functions.GraftFunctions
          .sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
        .withColumn("jaccard", col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= t)
        .select(col("doc_id_b").as("doc_id"))
      canonicalPlan.join(broadcast(dupIds), Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          col("n_tokens"))
        .count()
    }

    val best = scala.collection.mutable.Map[String, Double]()
    def timed(rep: Int, n: String)(body: => Long): Unit = {
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      val r = body
      val s = (System.nanoTime() - t0) / 1e9
      best(n) = math.min(best.getOrElse(n, Double.MaxValue), s)
      println(f"rep$rep $n%-10s $s%.3f n=$r")
    }
    shipped(); hinted() // warm
    for (rep <- 1 to reps) {
      timed(rep, "shipped")(shipped())
      timed(rep, "hinted")(hinted())
    }
    println(f"== min-of-$reps @ $sf shipped=${best("shipped")}%.3f hinted=${best("hinted")}%.3f")
  }
}
