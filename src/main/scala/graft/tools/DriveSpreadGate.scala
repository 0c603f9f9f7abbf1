package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

import graft.{GraftSession, Tables}

/** r16 OPT: cost A/B of the spreadIfNarrow gate — plan-to-RDD
  * partition count vs logical-plan file statistics. Not library
  * surface. */
object DriveSpreadGate {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", 32)).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def stats(df: org.apache.spark.sql.DataFrame): Option[(Long, Long)] = {
      val leaves = df.queryExecution.analyzed.collectLeaves()
      val fs = leaves.collect {
        case LogicalRelation(r: HadoopFsRelation, _, _, _, _) =>
          (r.location.sizeInBytes, r.location.inputFiles.length.toLong)
      }
      if (fs.length == leaves.length && fs.nonEmpty)
        Some((fs.map(_._1).sum, fs.map(_._2).sum))
      else None
    }

    def bench(label: String)(f: => Any): Unit = {
      // warm
      f
      val t0 = System.nanoTime()
      var i = 0
      while (i < 10) { f; i += 1 }
      println(f"  [gate] $label%-22s ${(System.nanoTime() - t0) / 1e7 / 10}%.2f ms/call")
    }

    val mk = () => Tables(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    println("=== embeddings select frame ===")
    bench("rdd.getNumPartitions") { mk().rdd.getNumPartitions }
    bench("analyzed+file stats") { stats(mk()) }
    println("  stats says: " + stats(mk()))
    val mk2 = () => Tables(spark, sfDir, "documents")
    println("=== documents scan frame ===")
    bench("rdd.getNumPartitions") { mk2().rdd.getNumPartitions }
    bench("analyzed+file stats") { stats(mk2()) }
    println("  stats says: " + stats(mk2()))
    spark.stop()
  }
}
