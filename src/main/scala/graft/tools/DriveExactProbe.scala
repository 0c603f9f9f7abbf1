package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** One-JVM A/B: C1 exact dedup grouped on raw text vs the 64-bit
  * content hash (4 reps each, min is the number to trust).
  */
object DriveExactProbe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.configure(
      SparkSession.builder()
        .master(s"local[$cpus]")
        .config("spark.sql.shuffle.partitions", cpus))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def byText(): DataFrame =
      Tables(spark, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))
    def byHash(): DataFrame =
      Tables(spark, dir, "documents")
        .groupBy(xxhash64(col("text")).as("__h"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("n_copies"))
        .select(col("doc_id"), col("n_copies"))

    Seq("by_text" -> (() => byText()), "by_hash" -> (() => byHash()),
        "by_text2" -> (() => byText()), "by_hash2" -> (() => byHash()))
      .foreach { case (name, f) =>
        f().count()
        val ts = (1 to 4).map { _ =>
          val t0 = System.nanoTime()
          f().count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"PROBE $name%-9s min=${ts.min}%.3f reps=${ts.map(t => f"$t%.2f").mkString(",")}")
      }
    val a = byText().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = byHash().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    println(s"PROBE rows equal: ${a == b}")
    spark.stop()
  }
}
