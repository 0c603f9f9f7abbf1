package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Phase timer for the shipped cleanCorpus at 10×: plan-build time
  * (the eager rarity-sketch action + persist population) vs the
  * final count. Not library surface.
  */
object DriveCleanPhases {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)

    // cache-build attribution: same canonical subtree, three actions
    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      val c0 = Tables(spark, sf, "documents")
        .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
        .withColumn("quality", qualityFromGate(col("__g")))
        .withColumn("pred_lang", langIdFromGate(col("__g")))
        .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
        .drop("__g")
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min_by(
          struct(col("doc_id"), col("text"), col("pred_lang"), col("quality")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"))
        .withColumn("sh", Dedup.shingleHashColumnProbe(col("text")))
        .select(col("doc_id"), col("sh"))
      val ta = System.nanoTime()
      c0.count()
      val tb = System.nanoTime()
      val cp = c0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      cp.count()
      val tc = System.nanoTime()
      cp.count()
      val td = System.nanoTime()
      cp.unpersist(false)
      println(f"[cache $rep] plain=${(tb - ta) / 1e9}%.3f build=${(tc - tb) / 1e9}%.3f hit=${(td - tc) / 1e9}%.3f")
    }

    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      val t0 = System.nanoTime()
      val docs = Tables(spark, sf, "documents")
        .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
        .withColumn("quality", qualityFromGate(col("__g")))
        .withColumn("pred_lang", langIdFromGate(col("__g")))
        .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
        .drop("__g")
      val canonical = docs
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min_by(
          struct(col("doc_id"), col("text"), col("pred_lang"), col("quality")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
          col("r.pred_lang").as("pred_lang"), col("r.quality").as("quality"))
        .withColumn("sh", Dedup.shingleHashColumnProbe(col("text")))
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          wsTokenCount(col("text")).as("n_tokens"), col("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val t1 = System.nanoTime()
      val dupIds = Dedup.ngramJaccardOfHashedProbe(
          canonical.select(col("doc_id"), col("sh")), 0.8)
        .select(col("doc_id_b").as("doc_id"))
      val t2 = System.nanoTime()
      val n = canonical.join(dupIds, Seq("doc_id"), "left_anti").count()
      val t3 = System.nanoTime()
      canonical.unpersist(false)
      println(f"[rep $rep] plan=${(t1 - t0) / 1e9}%.3f sketch+planbuild=${(t2 - t1) / 1e9}%.3f count=${(t3 - t2) / 1e9}%.3f n=$n")
    }
    spark.stop()
  }
}
