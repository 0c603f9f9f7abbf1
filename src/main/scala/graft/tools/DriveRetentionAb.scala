package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Interleaved A/B for B27 retention: shipped (triangle + self-join
  * on the offset-0 rows for cohort size) vs a window form (cohort
  * size = sum(offset=0 count) over a cohort_week window on the SAME
  * triangle — one fewer join-side materialization + broadcast
  * build; the window runs on the weeks²-sized triangle, bounded at
  * any corpus size). Not library surface.
  */
object DriveRetentionAb {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.configure(
      SparkSession.builder().master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")).getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def shipped(): Long =
      graft.operators.Analytics.eventsRetention(spark, sf).count()

    def windowed(): Long = {
      val pairs = graft.Tables.eventsWithMs(spark, sf)
        .select(col("user_id"),
          expr("(ms - pmod(ms, 604800000)) div 604800000").as("wk"))
        .groupBy(col("user_id"))
        .agg(sort_array(collect_set(col("wk"))).as("wks"))
        .select(col("wks").getItem(0).as("cohort_week"),
          explode(col("wks")).as("wk"))
        .groupBy(col("cohort_week"),
          (col("wk") - col("cohort_week")).as("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      pairs
        .withColumn("cohort_size",
          sum(when(col("week_offset") === 0, col("n_active")))
            .over(Window.partitionBy(col("cohort_week"))))
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("cohort_size"),
          (col("n_active").cast("double") / col("cohort_size"))
            .as("retention")).count()
    }

    shipped(); windowed()
    println(s"[counts] shipped=${shipped()} windowed=${windowed()}")
    val times = scala.collection.mutable.Map[String, Double]()
      .withDefaultValue(Double.MaxValue)
    (1 to 7).foreach { _ =>
      Seq("shipped" -> (() => shipped()),
          "windowed" -> (() => windowed())).foreach { case (name, f) =>
        spark.catalog.clearCache()
        System.gc(); Thread.sleep(250)
        val t0 = System.nanoTime()
        f()
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < times(name)) times(name) = dt
      }
    }
    times.toSeq.sortBy(_._1).foreach { case (n, t) => println(f"[$n] $t%.3f s") }
    spark.stop()
  }
}
