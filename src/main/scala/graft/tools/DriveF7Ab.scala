package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** r15 F7 residual probe: the count-gated self-join reads 1.29 s
  * in-board at 10× vs DuckDB's 0.30 — sub-1.3 s absolute, but worth
  * one interleaved sweep before calling it a floor. Variants:
  * shipped (occ window + (band,v) shuffle_hash self-join + distinct)
  * vs a fused single-long band key (halves the shuffle key) vs an
  * agg-dedup tail (groupBy pair instead of distinct — same exchange
  * count, hash-agg instead of agg-for-distinct). Interleaved
  * min-of-N, phase cancels. Not library surface.
  */
object DriveF7Ab {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/repo/target/scale10")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "7").toInt
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(): Long =
      graft.operators.Multimodal.phashNearDup(spark, sf).count()

    // fused band key: one long column bk = band<<48 | v instead of
    // two join/window keys
    def fusedKey(): Long = {
      val d = Tables(spark, sf, "documents")
        .filter(col("text").isNotNull && length(col("text")) >= 1)
      val h2 = graft.functions.GraftFunctions.dhash64(col("text"))
      val hashed = d.select(col("doc_id"), h2.as("hh"))
        .select(col("doc_id"),
          col("hh").getItem(0).as("h_lo"), col("hh").getItem(1).as("h_hi"))
      val bands = array(
        (lit(0L * 65536 * 65536) + (col("h_lo") % 65536)).as("b0"),
        (lit(1L * 65536 * 65536) + shiftright(col("h_lo"), 16)).as("b1"),
        (lit(2L * 65536 * 65536) + (col("h_hi") % 65536)).as("b2"),
        (lit(3L * 65536 * 65536) + shiftright(col("h_hi"), 16)).as("b3"))
      val bv = hashed
        .select(col("doc_id"), col("h_lo"), col("h_hi"),
          explode(bands).as("bk"))
        .withColumn("occ", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("bk"))))
        .filter(col("occ") >= 2 && col("occ") <= 1000)
        .select(col("bk"), col("doc_id"), col("h_lo"), col("h_hi"))
      bv.select(col("bk"), col("doc_id").as("doc_id_a"),
          col("h_lo").as("alo"), col("h_hi").as("ahi"))
        .join(bv.select(col("bk"), col("doc_id").as("doc_id_b"),
            col("h_lo").as("blo"), col("h_hi").as("bhi"))
          .hint("shuffle_hash"), Seq("bk"))
        .filter(col("doc_id_a") < col("doc_id_b"))
        .select(col("doc_id_a"), col("doc_id_b"),
          (bit_count(col("alo").bitwiseXOR(col("blo"))) +
            bit_count(col("ahi").bitwiseXOR(col("bhi"))))
            .cast("int").as("hamming"))
        .filter(col("hamming") <= 3)
        .distinct()
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
    shipped(); fusedKey() // warm
    for (rep <- 1 to reps) {
      timed(rep, "shipped")(shipped())
      timed(rep, "fusedKey")(fusedKey())
    }
    println(f"== min-of-$reps @ $sf shipped=${best("shipped")}%.3f fusedKey=${best("fusedKey")}%.3f")
  }
}
