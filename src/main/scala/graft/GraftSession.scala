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
    // Size post-shuffle partitions by BYTES, not by cluster width:
    // parallelismFirst=true re-expands every tiny shuffle to
    // defaultParallelism tasks, so a 32-core local session pays 32
    // task dispatches per sub-MB stage (measured ~25% of sub-second
    // query wall time at sf0.1). The advisory size is the tension
    // knob: bytes misprice CPU-heavy stages (a small-bytes shuffle
    // into an expensive verify join wants width), so the default
    // stays modest and both knobs are env-overridable for operators
    // whose workloads skew one way.
    .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
      sys.env.getOrElse("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "false"))
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes",
      sys.env.getOrElse("SPARK_GRAFT_AQE_ADVISORY", "1MB"))
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.autoBroadcastJoinThreshold",
      sys.env.getOrElse("SPARK_GRAFT_BROADCAST_THRESHOLD", "10MB"))
    // Join-strategy preference knob (r14): preferSortMergeJoin=false
    // lets the planner pick shuffled-hash wherever one side hashes
    // locally (broadcast still wins below the threshold). Surgical
    // hints carried the measured q3 win; this stays env-only until a
    // full-board sweep at 1x AND 10x shows a clean aggregate win
    // (r15 candidate d).
    .config("spark.sql.join.preferSortMergeJoin",
      sys.env.getOrElse("SPARK_GRAFT_PREFER_SMJ", "true"))
    // Every bucketed read in this engine is DELIBERATE — the layout
    // exists for bucket PRUNING (text-index term probes) or exchange
    // elision (q3/q5 twins, _len joins). Spark's
    // DisableUnnecessaryBucketedScan only scores the distribution
    // benefit: a pruned probe whose downstream agg doesn't need the
    // bucket hash (searchAll's doc_id regroup) gets its bucketed scan
    // — and with it SelectedBucketsCount — silently discarded,
    // turning an O(terms' buckets) serve into a full postings scan.
    // Keep the planner's hands off; tables that don't benefit from
    // their bucketing are simply not written bucketed here.
    .config("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
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
