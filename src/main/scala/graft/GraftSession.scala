package graft

import org.apache.spark.sql.SparkSession

/** Session factory for the graft engine.
  *
  * Local-mode defaults tuned for the test harness (local[32], 32
  * shuffle partitions); on a real cluster the same settings are
  * supplied by spark-submit and AQE re-plans shuffles at runtime.
  */
object GraftSession {

  /** Apply graft defaults to an existing builder. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // Size post-shuffle partitions by BYTES (advisory 64 MB), not by
    // cluster width: parallelismFirst=true re-expands every tiny
    // shuffle to defaultParallelism tasks, so a 32-core local session
    // pays 32 task dispatches per sub-MB stage (measured ~25% of
    // sub-second query wall time at sf0.1). Spark's own docs
    // recommend parallelismFirst=false on busy clusters; at real
    // scale partitions land at the advisory size either way.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.parquet.compression.codec", "snappy")
    // TIMESTAMP(NANOS) parquet (the events table) reads as raw
    // nanosecond bigints instead of erroring — session-level so no
    // operator has to mutate conf as a side effect.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")

  def local(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession = {
    val spark = configure(
      SparkSession
        .builder()
        .master(s"local[$cores]")
        .appName("graft")
        .config("spark.sql.shuffle.partitions", cores.toString)
    ).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
