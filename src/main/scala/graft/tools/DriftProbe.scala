package graft.tools

import org.apache.spark.sql.functions._

import graft.Tables

/** Measures the quantizer train/holdout gap that shaped D11's
  * baseline choice (`Ann.ivfDrift`): build an IVF index on the even
  * half of `embeddings`, append the odd half (same distribution),
  * and print per-cell mean centroid-distances. Measured 2026-08:
  * the in-distribution holdout sits ~+20% farther on EVERY cell
  * (16 cells × ~15 members) — quantizer-training members are
  * systematically closer to the centroids they defined, which is
  * why drift is judged appends-vs-prior-appends, never vs base.
  */
object DriftProbe {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.local(8)
    spark.sparkContext.setLogLevel("ERROR")
    val db = graft.catalog.GraftDatabase(spark, "/tmp/drift_probe/db")
    val e = Tables(spark, args.headOption.getOrElse("/root/testdata/sf0.001"),
      "embeddings").select(col("vec_id"), col("embedding"))
    val ann = graft.operators.Ann
    ann.buildIvfIndex(db, e.filter(col("vec_id") % 2 === 0), "emb")
    ann.appendToIvfIndex(db, "emb",
      e.filter(col("vec_id") % 2 === 1), 0L)
    // raw base-vs-holdout comparison (ivfDrift itself never compares
    // against base — this probe is the reason why)
    val cents = db.read("emb_centroids")
      .select(col("cell"), col("centroid").cast("array<float>").as("ce"))
    val meanOf = (flag: org.apache.spark.sql.Column) =>
      avg(when(flag, col("dist_milli")))
    db.read("emb_cells")
      .join(broadcast(cents), Seq("cell"))
      .select(col("cell"), (col("batch_id") >= 0).as("app"),
        ((lit(1.0) - graft.functions.GraftFunctions
          .cosineSimilarity(col("embedding"), col("ce")))
          * 1000).cast("long").as("dist_milli"))
      .groupBy(col("cell"))
      .agg(meanOf(!col("app")).as("base_mean_milli"),
        meanOf(col("app")).as("holdout_mean_milli"))
      .orderBy(col("cell")).show(32, false)
    spark.stop()
  }
}
