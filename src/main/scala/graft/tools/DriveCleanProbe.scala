package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions._
import graft.operators.Dedup

/** Stage-timing probe for the pipeline_clean_corpus composite (r5
  * perf work) — times each sub-plan in the forked-bench environment.
  * Not part of the library surface.
  */
object DriveCleanProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def best(label: String, n: Int = 3)(mk: => Long): Unit = {
      var b = Double.MaxValue
      (1 to n).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        mk
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < b) b = dt
      }
      println(f"[$label] $b%.3f s")
    }

    def gated: DataFrame = Tables(spark, sf, "documents")
      .withColumn("quality", qualityScore(col("text")))
      .withColumn("pred_lang", langId(col("text")))
      .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
    def canon: DataFrame = gated
      .groupBy(fingerprint(col("text")).as("fp"))
      .agg(min_by(struct(col("doc_id"), col("text"), col("pred_lang"),
        col("quality")), col("doc_id")).as("r"))
      .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
        col("r.pred_lang").as("pred_lang"), col("r.quality").as("quality"))

    // warmup
    graft.operators.Pipeline.cleanCorpus(spark, sf).count()
    best("full cleanCorpus")(graft.operators.Pipeline.cleanCorpus(spark, sf).count())
    best("gates")(gated.count())
    best("gates+dedup")(canon.count())
    best("canon persist")({ val c = canon.persist(); val n = c.count(); c.unpersist(false); n })
    best("jaccard on canon") {
      val c = canon.persist()
      val n = Dedup.ngramJaccardOf(c.select(col("doc_id"), col("text"))).count()
      c.unpersist(false)
      n
    }
    best("jaccard full corpus")(Dedup.ngramJaccard(spark, sf).count())

    // no-persist variant: recompute the shingle map per consumer
    import graft.functions.GraftFunctions._
    def shNoP(src: DataFrame): DataFrame = {
      val t = regexp_extract_all(col("text"), lit("\\S+"), lit(0))
      val len = size(t) - 2
      val parts = (0 until 3).map(j => slice(t, lit(j + 1), len))
      val z = parts.reduce((a, p) => zip_with(a, p, (x, y) => concat_ws(" ", x, y)))
      src.select(col("doc_id"), sort_array(transform(
        when(size(t) >= 3, array_distinct(z))
          .otherwise(array().cast("array<string>")), s => xxhash64(s))).as("sh"))
    }
    def jacNoPersist(src: DataFrame): Long = {
      val docs = shNoP(src)
      val cms = docs.select(explode(col("sh")).as("h"))
        .stat.countMinSketch("h", 1e-4, 0.99, 42).toByteArray
      val prefix = docs.select(col("doc_id"),
        explode(prefixByRarity(col("sh"), cms, 0.8)).as("shingle"))
      val cands = prefix.select(col("doc_id").as("doc_id_a"), col("shingle"))
        .join(prefix.select(col("doc_id").as("doc_id_b"), col("shingle")),
          Seq("shingle"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select(col("doc_id_a"), col("doc_id_b")).distinct()
      val sa = docs.select(col("doc_id").as("doc_id_a"), col("sh").as("sh_a"))
      val sb = docs.select(col("doc_id").as("doc_id_b"), col("sh").as("sh_b"))
      cands.join(sa, Seq("doc_id_a")).join(sb, Seq("doc_id_b"))
        .withColumn("inter",
          sortedIntersectSize(col("sh_a"), col("sh_b")).cast("double"))
        .withColumn("jaccard", col("inter") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter")))
        .filter(col("jaccard") >= 0.8).count()
    }
    best("jaccard full NO persist")(jacNoPersist(Tables(spark, sf, "documents")))
    best("jaccard canon NO docs-persist") {
      val c = canon.persist()
      val n = jacNoPersist(c.select(col("doc_id"), col("text")))
      c.unpersist(false)
      n
    }

    // r8 probe (VERDICT r7 #7): shingles computed in the GATE SCAN and
    // carried through the min_by exchange, vs the shipped shape
    // (shingles computed on the post-dedup survivors only)
    def cleanFusedShingles(): Long = {
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
          struct(col("doc_id"), col("text"), col("pred_lang"),
            col("quality"), col("sh")), col("doc_id")).as("r"))
        .select(col("r.doc_id").as("doc_id"), col("r.text").as("text"),
          col("r.pred_lang").as("pred_lang"), col("r.quality").as("quality"),
          col("r.sh").as("sh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dupIds = Dedup.ngramJaccardOfHashedProbe(
          canonical.select(col("doc_id"), col("sh")), 0.8)
        .select(col("doc_id_b").as("doc_id")).distinct()
      val n = canonical.join(dupIds, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("pred_lang"), col("quality"),
          wsTokenCount(col("text")).as("n_tokens")).count()
      canonical.unpersist(false)
      n
    }
    best("clean FUSED shingles-in-scan")(cleanFusedShingles())
    spark.stop()
  }
}
