package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** Attribution probe for the C8 gate scan: how much of the ~0.55 s
  * 10× gates stage is parquet text decode vs GateStats byte work vs
  * the gate arithmetic/filter on top. Not library surface.
  */
object DriveGateProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    import graft.functions.TextFunctions._

    def best(label: String, n: Int = 3)(f: => Unit): Unit = {
      var b = Double.MaxValue
      (1 to n).foreach { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f
        b = math.min(b, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[$label%-24s] $b%.3f s")
    }

    val docs = Tables(spark, sf, "documents")
    best("decode: sum(length)")(docs.agg(sum(length(col("text")))).head())
    best("tokenize: windowhash")(docs.select(
      graft.functions.GraftFunctions.tokenWindowHashes(col("text"), 3)
        .as("h")).agg(sum(size(col("h")))).head())
    best("gatestats agg")(docs.select(
      graft.functions.GraftFunctions.gateStats(col("text")).as("g"))
      .agg(sum(col("g.n_ws")), sum(col("g.c_en"))).head())
    best("gates filter count") {
      docs.withColumn("__g", graft.functions.GraftFunctions.gateStats(col("text")))
        .withColumn("quality", qualityFromGate(col("__g")))
        .withColumn("pred_lang", langIdFromGate(col("__g")))
        .filter(col("quality") >= 0.7 && col("pred_lang") === "en")
        .count()
    }
    spark.stop()
  }
}
