package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Test-table loader: one parquet file per TPC-H-ish table under a
  * scale-factor directory (see TESTDATA.md).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  // Note on input layout: the driver's test tables are ONE parquet
  // file with ONE row group — an unsplittable single-task scan. A
  // repartition-after-scan guard was measured (r5) and REJECTED: at
  // these data sizes the extra fixed-width exchange costs more than
  // the lost scan parallelism on every operator tried (tfidf 0.6 s →
  // 1.6 s), and at real scale a corpus arrives in thousands of
  // splittable files, where the guard is a no-op anyway. Operators
  // therefore read the layout as-is and rely on AQE to size
  // post-shuffle stages.
}
