package graft.tools

import org.apache.spark.sql.functions._

import graft.{GraftSession, Tables}

/** E21 attribution at 10×: model aggregation + gate take vs the
  * held-side byte-pass scoring. Not library surface.
  */
object DriveTrigramProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    val gf = graft.functions.GraftFunctions

    (1 to 3).foreach { rep =>
      spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
      val docs = Tables(spark, sf, "documents")
      val t0 = System.nanoTime()
      val train = docs
        .filter(graft.functions.TextFunctions.wsTokenCount(col("text")) >= 3)
        .filter(col("doc_id") % 5 =!= 0)
      val gateRows: Seq[org.apache.spark.sql.Row] =
        train.agg(gf.gramCountsAgg(lower(col("text")), 1, 3, 262144)
          .as("m")).head().getSeq(0)
      val t1 = System.nanoTime()
      val u8 = org.apache.spark.unsafe.types.UTF8String.fromString _
      val m = new java.util.HashMap[
        org.apache.spark.unsafe.types.UTF8String, java.lang.Long](
        math.max(16, gateRows.length * 2))
      var n0 = 0L; var v0 = 0L
      gateRows.foreach { r =>
        val (g, c) = (r.getString(0), r.getLong(1))
        m.put(u8(g), java.lang.Long.valueOf(c))
        if (g.indexOf(' ') < 0) { n0 += c; v0 += 1L }
      }
      val bc = spark.sparkContext.broadcast(m)
      val t2 = System.nanoTime()
      val n = docs.select(col("doc_id"), col("text"))
        .filter(col("doc_id") % 5 === 0)
        .select(col("doc_id"),
          gf.trigramLmScore(lower(col("text")), bc, n0, v0).as("s"))
        .filter(col("s").isNotNull)
        .count()
      val t3 = System.nanoTime()
      bc.destroy()
      println(f"[rep $rep] grams=${gateRows.length} model+take=${(t1 - t0) / 1e9}%.3f hashmap=${(t2 - t1) / 1e9}%.3f score=${(t3 - t2) / 1e9}%.3f n=$n")
    }
    spark.stop()
  }
}
