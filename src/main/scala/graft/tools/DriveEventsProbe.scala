package graft.tools

import org.apache.spark.sql.functions._

import graft.GraftSession

/** Events-family attribution at 10×: raw scan floor vs the
  * sessionize/retention composites. Not library surface.
  */
object DriveEventsProbe {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)

    def best(label: String, n: Int = 3)(f: => Unit): Unit = {
      var b = Double.MaxValue
      (1 to n).foreach { _ =>
        spark.catalog.clearCache(); System.gc(); Thread.sleep(200)
        val t0 = System.nanoTime(); f
        b = math.min(b, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[$label%-28s] $b%.3f s")
    }

    val ev = graft.Tables.eventsWithMs(spark, sf)
    best("events scan count")(ev.count())
    best("events scan sum(ms)")(ev.agg(sum(col("ms"))).head())
    best("group by user")(ev.groupBy(col("user_id"))
      .agg(count(lit(1))).agg(sum(lit(1))).head())
    best("sessionize full")(
      graft.operators.Analytics.queries("q_events_sessionize")(spark, sf)
        .collect())
    best("retention full")(
      graft.operators.Analytics.queries("q_events_retention")(spark, sf)
        .collect())
    spark.stop()
  }
}
