package graft.tools

import org.apache.spark.sql.functions._

import graft.operators._

/** Measures the approximate ops' recall against their exact twins at
  * each scale factor — the numbers behind the floors pinned in
  * [[graft.operators.AnnChecks]]. Run when testdata regenerates to
  * confirm the floors still have margin.
  */
object DriveRecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      spark.catalog.clearCache()
      def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("query_id"), col("neighbor_id")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exact = pairs(Ann.topkExact(spark, dir))
      def r(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
        val p = pairs(df)
        val rec = exact.count(p.contains).toDouble / exact.size
        println(f"[$sf] $name%-14s recall=$rec%.3f")
      }
      r("ivf", Ann.ivfTopk(spark, dir))
      r("pq", Pq.annPq(spark, dir))
      r("ivfpq", IvfPq.annIvfPq(spark, dir))
      r("ivfpq_refine", IvfPq.annIvfPqRefined(spark, dir))
      r("hnsw", Hnsw.hnswTopk(spark, dir))
      // r15 routed sweep: nProbe of 16 cells — the floor evidence
      // for ann_hnsw_routed_check
      for (np <- Seq(4, 6, 8, 12))
        r(s"hnsw_routed$np", Hnsw.hnswTopkRouted(spark, dir, nProbe = np))
      // pinned D12 config (r=32, of=8); the r5-era sweep that chose it
      // measured r16/of4 .32–.70, r32/of8 .76–1.0 across SFs
      r("pca", Pca.annPcaRefined(spark, dir))

      def vpairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
        df.select(col("vec_id_a"), col("vec_id_b")).collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val exactP = vpairs(Dedup.embeddingPairs(spark, dir))
      val lsh = vpairs(Dedup.embeddingLsh(spark, dir))
      val sem = vpairs(Dedup.semanticPairs(spark, dir))
      println(f"[$sf] lsh            recall=${exactP.count(lsh.contains).toDouble / exactP.size}%.3f false=${lsh.diff(exactP).size}")
      println(f"[$sf] semantic       recall=${exactP.count(sem.contains).toDouble / exactP.size}%.3f false=${sem.diff(exactP).size} n_exact=${exactP.size}")
    }
    spark.stop()
  }
}
