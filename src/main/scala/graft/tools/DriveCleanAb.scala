package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Interleaved A/B for the clean-corpus composite: shipped shape
  * (shingles on post-dedup survivors) vs fused (shingles in the gate
  * scan, carried through the min_by exchange). DriveCleanProbe times
  * the variants in a fixed order, which hands the later one a
  * JIT/GC advantage — this probe alternates reps and takes per-
  * variant minima, the Bench discipline. Not library surface.
  */
object DriveCleanAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(): Long = graft.operators.Pipeline.cleanCorpus(spark, sf).count()

    def fused(): Long = {
      val docs = Tables(spark, sf, "documents")
        .withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
        .withColumn("quality", qualityFromGate(col("__g")))
        .withColumn("pred_lang", langIdFromGate(col("__g")))
        .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
        .drop("__g")
        .withColumn("sh", Dedup.shingleHashColumnProbe(col("text")))
      val canonical = docs
        .groupBy(fingerprint(col("text")).as("fp"))
        .agg(min_by(
          struct(col("doc_id"), col("pred_lang"), col("quality"),
            wsTokenCount(col("text")).as("n_tokens"), col("sh")),
          col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.pred_lang").as("pred_lang"),
          col("r.quality").as("quality"), col("r.n_tokens").as("n_tokens"),
          col("r.sh").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dupIds = Dedup.ngramJaccardOfHashedProbe(
          canonical.select(col("doc_id"), col("sh")), 0.8)
        .select(col("doc_id_b").as("doc_id")).distinct()
      val n = canonical.join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          col("n_tokens")).count()
      canonical.unpersist(false)
      n
    }

    // one warmup each
    shipped(); fused()
    val variants = Seq("shipped" -> (() => shipped()), "fused" -> (() => fused()))
    val times = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to 4).foreach { _ =>
      variants.foreach { case (name, f) =>
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < times(name)) times(name) = dt
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"[$n] $t%.3f s") }
    spark.stop()
  }
}
