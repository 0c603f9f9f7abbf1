package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** SQL query surface over loaded tables (SURVEY.md §2.B).
  *
  * The reference hands uploaded tables to Datasette's SQL engine
  * (datasette_upload_csvs/__init__.py exposes the table URL at the
  * end of the upload); graft's query engine is Spark SQL. These
  * queries pin the engine's scan/filter/agg/join/window/json surface
  * against a DuckDB oracle.
  *
  * Numeric discipline for oracle parity: money aggregates go through
  * DECIMAL(38,6) (exact, order-independent sums); averages are
  * decimal-sum cast to double divided by count (deterministic IEEE);
  * event-time math is done in epoch milliseconds (bigint).
  */
object Analytics {

  /** Exact, order-independent money type: cast before summing.
    * Scale 6 ≥ the true decimal count of every aggregated product here
    * (price 2dp × discount 2dp × tax 2dp), so the double→decimal cast
    * never lands on a rounding half-way point — Spark (HALF_UP over the
    * shortest double repr) and DuckDB (scale-multiply + round) would
    * disagree on those.
    */
  private[operators] def dec4(c: Column): Column = c.cast(DecimalType(38, 6))

  /** Deterministic cross-engine average: exact decimal sum → double. */
  private def avgOf(c: Column): Column =
    sum(dec4(c)).cast("double") / count(lit(1))

  /** Driver-friendly money sum: exact decimal arithmetic internally,
    * ONE final cast to double. The driver's hasher normalizes DuckDB
    * DECIMAL through pandas float64 while Spark parquet keeps
    * decimal128 — emitting DECIMAL in a compared result therefore
    * hash-mismatches even when values are equal (round-1 VERDICT §
    * "What's wrong" #1). The cast is deterministic: both engines round
    * the same exact decimal to the same IEEE double.
    */
  private[operators] def decSum(c: Column): Column = sum(dec4(c)).cast("double")

  /** B1: scan → filter → group-agg, decimal-exact (TPC-H Q1 shape). */
  def q1PricingSummary(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        decSum(col("l_quantity")).as("sum_qty"),
        decSum(col("l_extendedprice")).as("sum_base_price"),
        decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        decSum((col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        avgOf(col("l_quantity")).as("avg_qty"),
        avgOf(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))

  /** B2: selective filter + global agg (TPC-H Q6 shape); the filter
    * must reach the parquet scan (asserted in PlanSpec).
    */
  def q6ForecastRevenue(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .filter(
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= lit(0.03) && col("l_discount") <= lit(0.05) &&
        col("l_quantity") < lit(24.0))
      .agg(decSum(col("l_extendedprice") * col("l_discount")).as("revenue"))

  /** B3: customer ⋈ orders ⋈ lineitem + agg + deterministic top-10,
    * in the r14 JOIN-FIRST shuffle-hash shape: lineitem joins the
    * filtered orders side under an explicit shuffle_hash hint (the
    * build side is one filtered-orders PARTITION, which shrinks as
    * shuffle.partitions scales with the cluster — never a forced
    * broadcast of a corpus-linear side), and only the customer join
    * is left to AQE's runtime size estimate (broadcast-hash while
    * the filtered segment is small, shuffle-hash once it isn't;
    * PlanSpec pins the small-scale choice). orders⋈lineitem shuffles
    * on the order key (AQE handles skew); the inline comment below
    * carries the measured three-scale history of the rewrite.
    */
  def q3ShippingPriority(spark: SparkSession, dir: String): DataFrame = {
    val cutoff = lit("1997-06-01").cast("timestamp")
    val c = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = Tables(spark, dir, "orders").filter(col("o_orderdate") < cutoff)
    // JOIN-FIRST shape with a shuffle-hash fact join (r14,
    // DriveQ100Probe interleaved min-of-5/7 at three scales). The
    // r10 pre-agg-below-the-join shape aggregated EVERY filtered
    // lineitem (a corpus-wide 15M-group decimal hash agg at 100×)
    // before the selective dims could prune; joining first means the
    // orders-date and customer-segment filters drop ~80% of lineitem
    // rows before any aggregation touches them, and hashing the
    // filtered orders side (hint) replaces the SMJ's two corpus-scale
    // sorts. Build-side memory is bounded: the SHJ build is the
    // FILTERED orders partition (rows/shuffle.partitions), and
    // shuffle.partitions scales with the cluster. Measured
    // (shipped-pre-agg-SMJ → this): sf0.1 0.96→0.44 s, scale10
    // 0.87→0.77 s, 100× 5.39→3.14 s. Grouping on (l_orderkey,
    // o_orderdate) is row-identical to the pre-agg form —
    // o_orderdate is functionally dependent on the order key — and
    // the decimal sum keeps revenue exact in any partition order.
    Tables(spark, dir, "lineitem").filter(col("l_shipdate") > cutoff)
      .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** H8-as-layout evidence: lineitem/orders bucketed on the orderkey
    * join key, built ONCE per corpus dir and reused across
    * invocations (the D9 build-once/serve-many shape — a bucketed
    * layout is a storage decision, not per-query work; rebuild
    * triggers only when the source row count changes or the session
    * catalog is fresh; a layout from a previous process re-attaches
    * without a rewrite). Cluster-width buckets both sides → the
    * fact-fact join reads co-located buckets and elides its
    * exchanges entirely. The bucket count MUST track the machine:
    * a bucketed scan→join→agg runs as exactly nBuckets tasks (no
    * AQE re-split), so 16 buckets on a 32-core box idled half the
    * machine and measured SLOWER than the unbucketed plan at the
    * 10× board (q3 1.62 s vs 1.51 s) — the layout's exchange win
    * was erased by the parallelism cap. The count is baked into
    * the table name so a layout written at one width can never
    * silently re-attach under another (registerBucketed trusts the
    * caller's count).
    */
  // once-per-JVM freshness memo: the row-count comparison is itself
  // two table scans, which would otherwise tax EVERY invocation of a
  // bucketed query with the check (a serving path must not re-audit
  // its index per query — same policy as D9's persisted IVF)
  private val bucketedReady =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  // probe access (DriveQ100Probe A/Bs alternate bucketed shapes)
  private[graft] def bucketedWarehouseProbe(spark: SparkSession,
      dir: String): (graft.catalog.GraftDatabase, Int) =
    bucketedWarehouse(spark, dir)

  private def bucketedWarehouse(spark: SparkSession,
      dir: String): (graft.catalog.GraftDatabase, Int) = {
    val n = spark.sparkContext.defaultParallelism
    val key = s"${new org.apache.hadoop.fs.Path(dir).getName}_$n"
    val db = graft.catalog.GraftDatabase(spark,
      s"${CsvQueries.scratchRoot}/bucketed_$key/db")
    if (!bucketedReady.contains(key)) {
      Seq((s"lineitem_b$n", "lineitem", "l_orderkey"),
        (s"orders_b$n", "orders", "o_orderkey")).foreach {
        case (bt, src, bkey) =>
          val srcDf = Tables(spark, dir, src)
          // re-attach an on-disk layout from a previous process if
          // present; rebuild only when absent or stale by row count
          val fresh = db.registerBucketed(bt, bkey, n) &&
            (try db.readBucketed(bt).count() == srcDf.count()
            catch { case _: Exception => false })
          if (!fresh) db.writeBucketed(srcDf, bt, bkey, n)
      }
      bucketedReady.add(key)
      ()
    }
    (db, n)
  }

  /** B3 over the bucketed layout: same rows as [[q3ShippingPriority]]
    * with the l⋈o exchange GONE — the bucketed scans are co-located
    * on orderkey, the group-by's clustering is satisfied by the same
    * partitioning (hash(l_orderkey) ⊆ the grouping keys), and the
    * top-10 is a TakeOrdered. Customer joins however AQE sizes it
    * (broadcast here; it grows with SF, so no hint). Zero shuffle
    * exchanges in the plan — pinned by PlanSpec; this is the measured
    * proof that B3's constant factor vs the single-process baseline
    * is exchange materialization, i.e. layout, not plan shape.
    */
  def q3Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (db, n) = bucketedWarehouse(spark, dir)
    val cutoff = lit("1997-06-01").cast("timestamp")
    val c = Tables(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING")
    val o = db.readBucketed(s"orders_b$n").filter(col("o_orderdate") < cutoff)
    // Same join-first shape as the r14 unbucketed twin, still at
    // ZERO exchanges: the co-bucketed scans satisfy the shuffle-hash
    // join's distribution (the q5Bucketed property), and the post-
    // join aggregate's clustering is satisfied because the bucket
    // key is a subset of the grouping keys. Join-first additionally
    // aggregates only the rows the selective dims let through
    // (10× interleaved: 1.30 → 0.76 s vs the pre-agg form).
    db.readBucketed(s"lineitem_b$n").filter(col("l_shipdate") > cutoff)
      .join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** B4 over the bucketed layout: same rows as [[q5RegionRevenue]];
    * the fact-fact l⋈o join is exchange-free, every dim rides a
    * broadcast, and the only shuffle left in the whole plan is the
    * 25-row post-aggregation exchange on n_name. Pinned by PlanSpec.
    */
  def q5Bucketed(spark: SparkSession, dir: String): DataFrame = {
    val (db, nb) = bucketedWarehouse(spark, dir)
    val r = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables(spark, dir, "nation")
    val s = Tables(spark, dir, "supplier")
    val c = Tables(spark, dir, "customer")
    val o = db.readBucketed(s"orders_b$nb")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = db.readBucketed(s"lineitem_b$nb")
    // shuffle_hash over co-bucketed scans is STILL exchange-free
    // (the bucketed HashPartitioning satisfies SHJ's distribution);
    // unlike q3 the lineitem side is unfiltered here, and hashing
    // the filtered orders side beats merging the full 6M-row sorted
    // stream (10×: 1.12 s SMJ → measured below with SHJ)
    l.join(o.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c,
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** B4: six-table star join. Only the FIXED-cardinality dims carry a
    * broadcast() hint (region = 5 rows, nation = 25 at every scale
    * factor); supplier and customer grow with SF, so their join
    * strategy is left to AQE while the corpus is small — broadcast-
    * hash under the threshold, never a forced OOM.
    *
    * Scale-adaptive SHJ gate (r14): past [[BigJoinRows]] lineitem
    * rows the SMJ sorts dominate and the filtered sides hash locally
    * — measured at the 100× join scale (DriveQ100Probe, interleaved):
    * unhinted 7.17 s vs all-SHJ 4.09 s — while BELOW it the same
    * hints BLOCK AQE's dim broadcasts and LOSE up to 2.3× (10×:
    * 0.75 → 1.73 s). The regime signal is the exact parquet-footer
    * row count ([[graft.sources.ParquetStats.rowCount]] — driver
    * milliseconds, memoized per listing signature, NO Spark job:
    * the E19/E21 gate lesson is that a gate must not cost a jobs'
    * worth of work, and this one doesn't). Unknown stats take the
    * small-regime default — the adaptive plan, never a forced hash
    * build. Rows identical either way (spec-pinned).
    */
  private[graft] val BigJoinRows = 20000000L

  def q5RegionRevenue(spark: SparkSession, dir: String): DataFrame =
    q5RegionRevenueOf(spark, dir,
      big = graft.sources.ParquetStats
        .rowCount(spark, s"$dir/lineitem.parquet")
        .exists(_ > BigJoinRows))

  private[graft] def q5RegionRevenueOf(spark: SparkSession, dir: String,
      big: Boolean): DataFrame = {
    val r = Tables(spark, dir, "region").filter(col("r_name") === "ASIA")
    val n = Tables(spark, dir, "nation")
    def shj(d: DataFrame): DataFrame = if (big) d.hint("shuffle_hash") else d
    val s = shj(Tables(spark, dir, "supplier"))
    val c = shj(Tables(spark, dir, "customer"))
    val o = shj(Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp")))
    val l = Tables(spark, dir, "lineitem")
    // Customer and supplier in the same nation (TPC-H Q5 semantics).
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(s, col("l_suppkey") === col("s_suppkey"))
      .join(c,
        col("o_custkey") === col("c_custkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(decSum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"))
  }

  /** B5: window rank — top-3 orders per customer by total price. The
    * customer join is unhinted: customer scales with the corpus, and
    * the ranked side is already partitioned by o_custkey, so at scale
    * AQE turns this into a shuffle join that reuses the window's
    * exchange on one side instead of materializing 10^10 customers on
    * every executor.
    */
  def topOrdersPerCustomer(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val top = Tables(spark, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
    top.join(Tables(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_totalprice"), col("rn"))
  }

  /** B5b: same top-3-per-customer shape through the custom
    * TopKPerGroup plan node (§2.H5) — partial per-partition heaps,
    * shuffle carries only survivors. Output proves the custom exec
    * against the same windowed oracle.
    */
  def topOrdersPlanNode(spark: SparkSession, dir: String): DataFrame =
    graft.plans.TopKPerGroup(
      Tables(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice")),
      k = 3,
      groupCols = Seq("o_custkey"),
      orderBy = Seq("o_totalprice" -> true, "o_orderkey" -> false))

  /** B6: ROLLUP over order status × priority. */
  def ordersRollup(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .rollup(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        decSum(col("o_totalprice")).as("total_price"))

  /** B7: anti join — customers with no order in the trailing window. */
  def customersNoOrders(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
  }

  /** Events loader — dtype-adaptive epoch-ms derivation lives in
    * [[graft.Tables.eventsWithMs]] (the generator's ts encoding has
    * changed across rounds; see the note there).
    */
  private def events(spark: SparkSession, dir: String): DataFrame =
    Tables.eventsWithMs(spark, dir)

  /** B14: semi join with date arithmetic (TPC-H Q4 shape) — orders
    * with a late-shipping lineitem, counted per priority.
    */
  def q4OrderPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    o.join(
        Tables(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_shipdate")),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
  }

  /** B15: correlated-subquery shape (TPC-H Q2 min-cost flavor) —
    * parts priced at their brand's minimum. Expressed as the plan
    * Catalyst rewrites such subqueries into: broadcast the tiny
    * per-brand aggregate back onto the scan.
    */
  def qMinPricePerBrand(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables(spark, dir, "part")
    val mins = p.groupBy(col("p_brand").as("b"))
      .agg(min(col("p_retailprice")).as("min_price"))
    p.join(broadcast(mins),
        col("p_brand") === col("b") &&
          col("p_retailprice") === col("min_price"))
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"))
  }

  /** B8: tumbling 1-hour windows over events (batch twin of the
    * streaming windowed agg in §2.G1). Bucket = epoch ms (bigint) so
    * ns-vs-µs parquet precision can't skew the compare.
    */
  def eventsWindowed(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        (col("ms") - col("ms") % lit(3600000L)).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value")).as("total_value"))

  /** B31 (r12): HOPPING 1-hour windows on a 15-min hop — the
    * sliding-aggregation form dashboards/alerting actually consume
    * (B8 covers tumbling; a hop is NOT expressible as one tumbling
    * bucket per event). Each event lands in exactly W/H = 4 windows,
    * enumerated analytically in bigint epoch-ms (`explode` of the 4
    * hop offsets — `pmod` snaps to the hop grid, negatives included),
    * then ONE map-side-combined aggregation whose output is bounded
    * by windows × types, never events. No timestamp types anywhere,
    * so ns-vs-µs parquet precision can't skew the compare (the B8
    * rule), and the streaming twin (G1's `window(..., "1 hour",
    * "15 minutes")`) shares the semantics.
    */
  def eventsHopping(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"), col("ms"), col("value"),
        explode(sequence(lit(0L), lit(3L))).as("i"))
      .select(
        ((col("ms") - pmod(col("ms"), lit(900000L))) -
          col("i") * lit(900000L)).as("win_start_ms"),
        col("event_type"), col("value"))
      .groupBy(col("win_start_ms"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        decSum(col("value")).as("total_value"))

  /** B9: gap-based sessionization (30 min) via window functions. All
    * time math in epoch ms. Partition key = user_id (high cardinality
    * at scale → even shuffle; no global sort anywhere).
    */
  def eventsSessionize(spark: SparkSession, dir: String): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_id"), col("ms"), col("value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ms").asc, col("event_id").asc)
    val flagged = e.withColumn("new_sess",
      when(col("ms") - lag(col("ms"), 1).over(w) > lit(1800000L), lit(1))
        .otherwise(lit(0)))
    val sessions = flagged.withColumn("sess_id", sum(col("new_sess")).over(
      w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sessions.groupBy(col("user_id"), col("sess_id"))
      .agg(min(col("ms")).as("session_start_ms"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("total_value"))
      .drop("sess_id")
  }

  /** B9b: same 30-min gap sessionization through Spark's native
    * session_window function — a cross-check of the window-function
    * formulation (B9) against the engine's built-in session operator,
    * pinned by the SAME DuckDB oracle. Gap alignment: session_window
    * splits at diff ≥ gap (window end is exclusive) while the manual
    * form splits at diff > 30 min — so the native gap is 30 min + 1 ms,
    * making "split iff diff > 1 800 000 ms" exact on both paths, ties
    * included.
    */
  def eventsSessionizeNative(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("user_id"), timestamp_millis(col("ms")).as("ts_ms"),
        col("ms"), col("value"))
      .groupBy(col("user_id"),
        session_window(col("ts_ms"), "1800001 milliseconds"))
      .agg(min(col("ms")).as("session_start_ms"),
        count(lit(1)).as("n_events"),
        decSum(col("value")).as("total_value"))
      .select(col("user_id"), col("session_start_ms"), col("n_events"),
        col("total_value"))

  /** B21: trending — top-3 event types per hour by count, through
    * the bounded partial top-k aggregator (H3's string-keyed twin):
    * only hours × 3 rows cross the final shuffle, not every
    * (hour, type) count. Batch twin of the streaming trending form
    * (EventStreams.trending).
    */
  def eventsTrending(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .groupBy(
        (col("ms") - col("ms") % lit(3600000L)).as("hour_ms"),
        col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("hour_ms"))
      .agg(graft.functions.TopK.topkBy(3)(col("n").cast("double"),
        col("event_type")).as("tk"))
      .select(col("hour_ms"), posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("hour_ms"), (col("idx") + 1).as("rank"),
        col("s.key").as("event_type"),
        col("s.score").cast("bigint").as("n_events"))

  /** B10: JSON extraction from a string column + agg. */
  def eventsJson(spark: SparkSession, dir: String): DataFrame =
    events(spark, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("bigint").as("k"))
      .groupBy(col("event_type"))
      .agg(sum(col("k")).as("sum_k"),
        countDistinct(col("k")).as("distinct_k"),
        max(col("k")).as("max_k"))

  /** Shared by B16/B22: [[OrderStats.histogram]] over lineitem
    * quantities — see OrderStats for the rank-span semantics and the
    * measured histogram-vs-row_number rationale.
    */
  private def quantityHistogram(spark: SparkSession, dir: String): DataFrame =
    OrderStats.histogram(
      Tables(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity")),
      Seq("l_returnflag"), "l_quantity")

  /** B16: exact median per group, deterministic cross-engine. Built
    * from order statistics — the value whose cumulative-rank span
    * covers the middle rank(s), averaged as (lo + hi) / 2 — instead
    * of an engine's percentile function, whose interpolation op
    * order is not portable. Odd groups pick one value twice:
    * (v + v) / 2 is IEEE-exact, so both engines emit identical bits.
    * Scale shape: see [[quantityHistogram]] — the only corpus-scale
    * pass is a map-side-combined count.
    */
  def qMedianQuantity(spark: SparkSession, dir: String): DataFrame =
    quantityHistogram(spark, dir)
      .filter(
        expr("(n + 1) div 2").between(col("lo_rank"), col("hi_rank")) ||
        expr("(n + 2) div 2").between(col("lo_rank"), col("hi_rank")))
      .groupBy(col("l_returnflag"))
      .agg(((min(col("l_quantity")) + max(col("l_quantity"))) / 2)
        .as("median_qty"))
      .select(col("l_returnflag"), col("median_qty"))

  /** B22: exact p50/p90/p99 per group via discrete order statistics —
    * the tail-latency-style summary B16 generalizes to. The value at
    * rank ⌈p·n⌉ is picked directly (quantile_disc semantics): no
    * interpolation arithmetic at all, so cross-engine parity needs
    * only integer rank math — (n·p + 99) div 100 — and the rank
    * spans. Same scale shape as B16 ([[quantityHistogram]]): one
    * map-side-combined count over the corpus, ONE histogram-sized
    * window serves every requested percentile (the conditional-agg
    * pivot adds no extra pass); the approx twin for when even a
    * histogram is too expensive is approx_percentile, specced
    * against this in PlanSpec's median test.
    */
  def qPercentiles(spark: SparkSession, dir: String,
      ps: Seq[Int] = Seq(50, 90, 99)): DataFrame = {
    val picks = ps.map(p => OrderStats.pick(p, "l_quantity").as(s"p$p"))
    quantityHistogram(spark, dir)
      .groupBy(col("l_returnflag")).agg(picks.head, picks.tail: _*)
  }

  /** B29: single-pass approximate quantiles per group — the sketch
    * path for the B22 statistic. B22's exact order statistics shuffle
    * the (group, value) HISTOGRAM, which is the right plan while
    * values are small-domain integers; over a continuous column at
    * corpus scale the histogram IS the data, and the scalable plan is
    * a mergeable quantile sketch (Spark's `approx_percentile`,
    * KLL/GK-family): O(accuracy) state per group, built map-side and
    * merged at reduce — ONE scan, no histogram exchange, the only
    * shape that survives a 100 TB continuous column. Approximate ⇒
    * rows-only here; the `_check` twin is the oracle gate.
    */
  def qPercentilesSketch(spark: SparkSession, dir: String,
      accuracy: Int = 100): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(percentile_approx(col("l_quantity"),
        array(lit(0.5), lit(0.9), lit(0.99)), lit(accuracy)).as("qs"))
      .select(col("l_returnflag"),
        col("qs").getItem(0).as("p50"),
        col("qs").getItem(1).as("p90"),
        col("qs").getItem(2).as("p99"))

  /** B29 `_check`: the sketch's rank-error GUARANTEE, verified
    * exactly (the AnnChecks discipline — a DuckDB oracle can't
    * reproduce an engine-specific sketch, so the oracle pins the
    * invariant). `approx_percentile(p, acc)` promises a value whose
    * true rank lies within n/acc of p·n; the check recounts each
    * returned value's true rank with one more scan (cnt_lt/cnt_le
    * bracket the value's rank interval — ties make the rank an
    * interval, not a point) and compares in ×100-scaled integer
    * arithmetic with one rank of slop for the p·n floor. The
    * data-dependent outputs (group sizes) come from DuckDB; the
    * booleans are the pinned guarantee.
    */
  def qPercentilesSketchCheck(spark: SparkSession, dir: String,
      accuracy: Int = 100): DataFrame =
    qPercentilesSketchCheckOf(Tables(spark, dir, "lineitem")
      .select(col("l_returnflag").as("grp"), col("l_quantity").as("v")),
      accuracy)

  /** The B29 check over any (grp, v) frame — spec entry point for
    * adversarial distributions (skew, constant groups).
    */
  def qPercentilesSketchCheckOf(li: DataFrame,
      accuracy: Int): DataFrame = {
    val probes = Seq(50, 90, 99)
    val sk = li.groupBy(col("grp"))
      .agg(percentile_approx(col("v"),
        array(probes.map(p => lit(p / 100.0)): _*), lit(accuracy)).as("qs"))
    val qv = sk.select(col("grp"),
        posexplode(col("qs")).as(Seq("i", "qv")))
      .withColumn("p100", element_at(
        array(probes.map(p => lit(p.toLong)): _*), col("i") + 1))
      .drop("i")
    val ranks = li.join(broadcast(qv), Seq("grp"))
      .groupBy(col("grp"), col("p100"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("v") <= col("qv"), 1L).otherwise(0L)).as("cnt_le"),
        sum(when(col("v") < col("qv"), 1L).otherwise(0L)).as("cnt_lt"))
    // ×100-scaled integer rank algebra: target = p·n, slack =
    // n·100/acc (the guarantee) + 100 (one rank of floor slop)
    val target = col("p100") * col("n")
    val slack = col("n") * lit(100L) / lit(accuracy.toLong) + lit(100L)
    val ok = (col("cnt_le") * 100 >= target - slack) &&
      (col("cnt_lt") * 100 <= target + slack)
    ranks.groupBy(col("grp"))
      .agg(max(col("n")).as("n"),
        count(lit(1)).as("n_probes"),
        min(when(ok, 1L).otherwise(0L)).as("okmin"))
      .select(col("grp"), col("n"), col("n_probes"),
        (col("okmin") === 1L).as("sketch_ok"))
  }

  /** B23: funnel analysis — users converting view → click → purchase
    * with each step inside `stepMs` of the previous one. Each step is
    * a groupBy(user).min(ms) on the step's events semi-joined to the
    * previous step's converters — three filtered aggregations, all
    * shuffling on user_id (high-cardinality, even), all time math in
    * exact epoch-ms bigints. The final result is three counts.
    */
  def eventsFunnel(spark: SparkSession, dir: String,
      stepMs: Long = 86400000L): DataFrame = {
    val e = events(spark, dir)
      .select(col("user_id"), col("event_type"), col("ms"))
    def nextStep(prev: DataFrame, evType: String): DataFrame =
      e.filter(col("event_type") === evType)
        .join(prev, Seq("user_id"))
        .filter(col("ms") >= col("t") && col("ms") - col("t") <= stepMs)
        .groupBy(col("user_id")).agg(min(col("ms")).as("t2"))
        .select(col("user_id"), col("t2").as("t"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ms")).as("t"))
    val c = nextStep(v, "click")
    val p = nextStep(c, "purchase")
    def counted(df: DataFrame, step: Int, name: String): DataFrame =
      df.agg(count(lit(1)).as("n_users"))
        .select(lit(step).as("step"), lit(name).as("event_type"),
          col("n_users"))
    counted(v, 1, "view")
      .unionByName(counted(c, 2, "click"))
      .unionByName(counted(p, 3, "purchase"))
  }

  /** B24: table profiling — the dataset-card stats a pipeline records
    * before training: rows, nulls, exact distinct counts, min/max per
    * column. One column-pruned scan per profiled column (a single
    * multi-distinct aggregation would plan an Expand of the whole
    * table — strictly more shuffle at scale than n parallel pruned
    * scans); min/max surfaced as strings only for types whose cast is
    * engine-portable (integers, strings — never doubles).
    */
  def tableProfile(spark: SparkSession, dir: String): DataFrame = {
    val t = Tables(spark, dir, "orders")
    Seq("o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority")
      .map { c =>
        t.agg(count(lit(1)).as("n_rows"),
          sum(when(col(c).isNull, 1).otherwise(0)).cast("bigint")
            .as("n_nulls"),
          countDistinct(col(c)).as("n_distinct"),
          min(col(c)).cast("string").as("min_value"),
          max(col(c)).cast("string").as("max_value"))
          .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
            col("n_distinct"), col("min_value"), col("max_value"))
      }.reduce(_.unionByName(_))
  }

  /** B25: full outer join — per-nation customer vs supplier counts,
    * keeping nations that have only one side (and the dim row for
    * ones with neither via the final right join to `nation`).
    * Aggregate-then-join: both sides shrink to ≤|nations| rows before
    * any join, so the joins are broadcastable no matter how large the
    * fact tables are.
    */
  def qNationCoverage(spark: SparkSession, dir: String): DataFrame = {
    val custs = Tables(spark, dir, "customer")
      .groupBy(col("c_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    val supps = Tables(spark, dir, "supplier")
      .groupBy(col("s_nationkey").as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    custs.join(supps, Seq("nationkey"), "full_outer")
      .join(Tables(spark, dir, "nation")
        .select(col("n_nationkey").as("nationkey"), col("n_name")),
        Seq("nationkey"), "right_outer")
      .select(col("n_name"),
        coalesce(col("n_customers"), lit(0L)).as("n_customers"),
        coalesce(col("n_suppliers"), lit(0L)).as("n_suppliers"))
  }

  /** B17: running total per customer — cumulative window sum.
    * Determinism: the prefix sum accumulates in DECIMAL(38,6) (exact,
    * so association order is irrelevant) with ONE cast to double per
    * output row; frame order is made total by the (date, orderkey)
    * tiebreak. Shape at scale: one hash-partitioned sort per
    * customer — same shuffle class as the rank windows, no global
    * sort.
    */
  def qRunningRevenue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        sum(dec4(col("o_totalprice"))).over(w).cast("double")
          .as("running_total"))
  }

  /** B18: pivot (conditional aggregation): order counts by priority ×
    * status. Spark's pivot leaves absent cells NULL where the
    * oracle's COUNT FILTER yields 0 — na.fill closes the gap.
    */
  def qOrdersPivot(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .na.fill(0L, Seq("F", "O", "P"))

  /** B19: set operations — customers that placed orders in 1996 but
    * not 1997 (INTERSECT/EXCEPT surface).
    */
  def qCustomerChurn(spark: SparkSession, dir: String): DataFrame = {
    def custsIn(year: Int) = Tables(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(s"$year-01-01").cast("timestamp") &&
        col("o_orderdate") < lit(s"${year + 1}-01-01").cast("timestamp"))
      .select(col("o_custkey"))
    custsIn(1996).except(custsIn(1997))
      .select(col("o_custkey").as("churned_custkey"))
  }

  /** B20: string-function surface (the everyday Datasette-SQL diet):
    * LIKE, substring, case mapping, trim, regexp extraction,
    * concatenation — all exercised in one pass over customer.
    */
  def qStringOps(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "customer")
      .filter(col("c_name").like("Customer%1%"))
      .select(
        col("c_custkey"),
        upper(substring(col("c_name"), 1, 8)).as("name_prefix"),
        length(trim(col("c_name"))).as("name_len"),
        regexp_extract(col("c_name"), "([0-9]+)$", 1).as("name_num"),
        concat_ws("-", col("c_mktsegment"), col("c_name")).as("tagged"))
  def distinctParts(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"))

  /** B27: weekly cohort retention — the classic product-analytics
    * triangle: users grouped by their first-activity week, then for
    * each (cohort, week-offset) the count and fraction of the cohort
    * still active. All time math is exact integer epoch arithmetic
    * with FLOOR-division semantics (pmod-based — never `/`, which is
    * double division and misbins above 2^53, and never bare `div`,
    * whose truncation-toward-zero diverges from the oracle's floor
    * `//` on pre-epoch negative-ms timestamps — ADVICE r7; the
    * nested floor-divs compose: ⌊⌊ms/86400000⌋/7⌋ = ⌊ms/604800000⌋
    * for positive divisors).
    *
    * Shape at scale (r9): ONE events-scale exchange, total. The per-
    * user distinct week set builds inside a `collect_set` aggregation
    * keyed on user_id — partial aggregation dedups map-side, so the
    * only corpus-scale shuffle carries per-user week SETS (bounded by
    * the corpus timespan in weeks — ~10² entries for years of data —
    * never by that user's event count). The cohort week is element 0
    * of the sorted set (first activity is minimal under any monotone
    * bucketing — no second events pass), offsets unfold locally from
    * each set, and the (cohort, offset) triangle re-aggregates rows
    * bounded by weeks². Cohort sizes need NO separate user-scale
    * aggregation: every user is active in their own first week, so
    * the offset-0 row of the SAME triangle IS the cohort size — the
    * size branch shares the triangle's aggregation subtree and
    * ReuseExchange collapses the two reads to one computation. (The
    * r7 distinct→firsts→join shape paid three user-or-events-scale
    * exchanges for the same answer; isolated 10× best-of-2 runs read
    * ~0.9 s old vs ~0.7 s new under heavy VM jitter — the shape
    * argument, one corpus exchange instead of three, is the real
    * margin at cluster scale where exchanges dominate.)
    */
  def eventsRetention(spark: SparkSession, dir: String): DataFrame = {
    val pairs = events(spark, dir)
      .select(col("user_id"),
        expr("(ms - pmod(ms, 604800000)) div 604800000").as("wk"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("wk"))).as("wks"))
      .select(col("wks").getItem(0).as("cohort_week"),
        explode(col("wks")).as("wk"))
      .groupBy(col("cohort_week"),
        (col("wk") - col("cohort_week")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    // Cohort size = the offset-0 row of the SAME triangle, read via a
    // window over cohort_week instead of a self-join (r12, DriveWaveProbe
    // ledger: the join's extra side materialization + broadcast build
    // were 2 of the row's 7 jobs; interleaved A/B at 10×,
    // DriveRetentionAb: 0.642 s windowed vs 0.734 s joined, same rows).
    // The window runs on the weeks²-sized triangle — bounded by the
    // corpus TIMESPAN, never its row count, so the partition-by-week
    // window is safe at any corpus size (unlike a window over events).
    pairs
      .withColumn("cohort_size",
        sum(when(col("week_offset") === 0, col("n_active")))
          .over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("cohort_week"))))
      .select(col("cohort_week"), col("week_offset"), col("n_active"),
        col("cohort_size"),
        (col("n_active").cast("double") / col("cohort_size"))
          .as("retention"))
  }

  /** B28: hourly anomaly flags per event type — the ops-monitoring
    * query over an event stream: which (type, hour) buckets deviate
    * from their type's own hourly distribution by more than 3σ?
    *
    * Exactness discipline: variance math stays ENTIRELY in integers
    * by cross-multiplication — (x−μ)² > 9σ² over observed hours is
    * (n·x − S)² > 9·(n·Q − S²) with S = Σcounts, Q = Σcounts² — so
    * the flags are bit-identical cross-engine (a stddev_pop double
    * would be partition-order-dependent). Magnitudes: the hourly
    * counts ride BIGINT (events-scale stage), but S/Q and every
    * squared term compute in DECIMAL(38,0) UNCONDITIONALLY (ADVICE
    * r7): the 64-bit formulation silently wrapped once a type's
    * total S passed ~3·10⁹ (S² > 2⁶³) and flipped flags wrong,
    * exactly the regime a 100 TB event stream lives in. Decimal is
    * exact to 10³⁸ — safe past 10¹⁸ events/type — and only touches
    * the hours-sized aggregate, never the events-scale scan. The
    * oracle mirrors with HUGEINT (int128: exact to 1.7·10³⁸). The
    * hour bucket uses pmod (floor semantics) so pre-epoch negative
    * ms bins identically to the oracle's date_trunc.
    *
    * Shape at scale: ONE events-scale aggregation (type, hour) —
    * map-side combined; the per-type moments re-aggregate the
    * hours-sized table; the flag join is hours-vs-types, AQE-sized.
    */
  def eventsAnomaly(spark: SparkSession, dir: String): DataFrame =
    anomalyFromHourly(events(spark, dir)
      .groupBy(col("event_type"),
        (col("ms") - pmod(col("ms"), lit(3600000L))).as("hour_ms"))
      .agg(count(lit(1)).as("n_events")))

  /** The B28 flagging logic over an (event_type, hour_ms, n_events)
    * hourly table — shared by the inline form and the B32 served
    * form (which derives the hourly table from the rollup artifact
    * instead of an events scan).
    */
  private def anomalyFromHourly(hourly: DataFrame): DataFrame =
    anomalyFlagsAgainst(hourly, anomalyStatsFrom(hourly))

  /** The B28 calibration aggregate: per-type (n_hours, Σn, Σn²) in
    * DECIMAL(38,0) — the input is the hours-sized hourly table, so
    * the exactness costs nothing at the events scale. Shared by the
    * inline/served forms (self-stats) and the G19 gate (frozen
    * stats persisted as an artifact).
    */
  private[graft] def anomalyStatsFrom(hourly: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    hourly.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("n_events").cast(dec)).as("s"),
        sum(col("n_events").cast(dec) * col("n_events")).as("q"))
  }

  /** The B28 integer-exact 3σ test of an hourly table against a
    * (possibly frozen) stats table — cross-multiplied so no division
    * or sqrt ever enters the compare.
    *
    * `flagUnseen = true` (the G19 alerting gate): an event type with
    * NO calibration row cannot be scored, and silently dropping it is
    * the anti-conservative direction for an alert — a brand-new
    * traffic class is exactly what must page. The gate left-joins and
    * flags such hours anomalous. The batch forms keep the inner join
    * (self-calibrated stats always cover every type, so the joins
    * are equal there by construction).
    */
  private[graft] def anomalyFlagsAgainst(hourly: DataFrame,
      stats: DataFrame, flagUnseen: Boolean = false): DataFrame = {
    val dec = "decimal(38,0)"
    val nh = col("n_hours").cast(dec)
    val dev = nh * col("n_events") - col("s")
    val test =
      dev * dev > lit(9L).cast(dec) * (nh * col("q") - col("s") * col("s"))
    if (flagUnseen)
      hourly.join(stats, Seq("event_type"), "left_outer")
        .select(col("event_type"), col("hour_ms"), col("n_events"),
          coalesce(test, lit(true)).as("anomalous"))
    else
      hourly.join(stats, Seq("event_type"))
        .select(col("event_type"), col("hour_ms"), col("n_events"),
          test.as("anomalous"))
  }

  /** B30: dense hourly series per event type — gap-fill. An event
    * stream has no rows for quiet hours, but downstream consumers
    * (anomaly baselines, rate charts, feature windows) need a DENSE
    * series: every hour between a type's first and last activity,
    * zero-filled. The time-dimension densification every monitoring
    * and feature pipeline runs after B8's bucketed agg.
    *
    * Scale shape: ONE events-scale aggregation (the B28 hourly
    * table); spans re-aggregate the hours-sized table to one row per
    * type; the dense axis is `sequence(lo, hi, 1h)` EXPLODED from
    * the spans — rows bounded by types × corpus-timespan-hours,
    * never by event count — and the zero-fill is an hours-sized left
    * join. Hour buckets via pmod floor-division (negative-ms parity
    * with the oracle's date_trunc — the B27/B28 discipline).
    */
  def eventsGapfill(spark: SparkSession, dir: String): DataFrame =
    eventsGapfillOf(events(spark, dir))

  def eventsGapfillOf(ev: DataFrame): DataFrame =
    gapfillFromHourly(ev
      .groupBy(col("event_type"),
        (col("ms") - pmod(col("ms"), lit(3600000L))).as("hour_ms"))
      .agg(count(lit(1)).as("n_events")))

  /** The B30 densification over an (event_type, hour_ms, n_events)
    * hourly table — shared by the inline form and the B32 served
    * form. */
  private def gapfillFromHourly(hourly: DataFrame): DataFrame = {
    val dense = hourly.groupBy(col("event_type"))
      .agg(min(col("hour_ms")).as("lo"), max(col("hour_ms")).as("hi"))
      .select(col("event_type"),
        explode(sequence(col("lo"), col("hi"), lit(3600000L)))
          .as("hour_ms"))
    dense.join(hourly, Seq("event_type", "hour_ms"), "left")
      .select(col("event_type"), col("hour_ms"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  // ---------------------------------------------------------------
  // B32 (r13): shared quarter-hour events rollup artifact
  // ---------------------------------------------------------------

  /** B32: ONE persisted quarter-hour rollup serving the whole
    * dashboard family. B28 (anomaly), B30 (gap-fill) and B31
    * (hopping) each re-aggregated the full events table to the same
    * time-bucketed shape inside their own query; at 100 TB that is
    * three corpus scans for three dashboard panels. The rollup is the
    * finest grain all three divide into — 15 minutes (B31's hop; an
    * hour is exactly 4 buckets) — keyed (event_type, q15_ms) with
    * `n_events` and the DECIMAL(38,6) `sum_value` kept EXACT (cast to
    * double only at serve time), so every served answer is
    * bit-identical to its inline form: counts and decimal sums are
    * associative, and the bucket grids nest (q15 → hour by the same
    * pmod floor; all grids share the epoch origin). Maintained
    * streaming-side by G1's tumbling 15-min windowed agg
    * (spec-pinned ≡ this build); size = types × corpus-timespan
    * quarters, never event count.
    */
  def buildEventsRollup(db: graft.catalog.GraftDatabase,
      ev: DataFrame): Unit =
    db.write(ev
      .groupBy(col("event_type"),
        (col("ms") - pmod(col("ms"), lit(900000L))).as("q15_ms"))
      .agg(count(lit(1)).as("n_events"),
        sum(dec4(col("value"))).as("sum_value")),
      "events_q15", org.apache.spark.sql.SaveMode.Overwrite)

  /** The served rollup for a corpus dir: build once, re-attach via
    * the events file-listing signature (the shared
    * [[graft.catalog.ServedArtifact]] protocol). */
  def eventsRollup(spark: SparkSession, dir: String): DataFrame =
    graft.catalog.ServedArtifact.db(spark, "evroll", dir,
      s"$dir/events.parquet") { d =>
      buildEventsRollup(d, events(spark, dir))
    }.read("events_q15",
      "event_type string, q15_ms bigint, n_events bigint, " +
        "sum_value decimal(38,6)")

  /** B31 served from the rollup: each window is the sum of its 4
    * quarter buckets — same analytic hop enumeration, input 5–6
    * orders of magnitude smaller than events. */
  def eventsHoppingServed(spark: SparkSession, dir: String): DataFrame =
    eventsRollup(spark, dir)
      .select(col("event_type"), col("n_events"), col("sum_value"),
        col("q15_ms"), explode(sequence(lit(0L), lit(3L))).as("i"))
      .groupBy((col("q15_ms") - col("i") * 900000L).as("win_start_ms"),
        col("event_type"))
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("sum_value")).cast("double").as("total_value"))

  /** The hourly table derived from the rollup (grids nest: q15 is on
    * the hour grid's refinement, same epoch origin). */
  private def hourlyFromRollup(spark: SparkSession, dir: String): DataFrame =
    eventsRollup(spark, dir)
      .groupBy(col("event_type"),
        (col("q15_ms") - pmod(col("q15_ms"), lit(3600000L))).as("hour_ms"))
      .agg(sum(col("n_events")).as("n_events"))

  /** B28 served from the rollup. */
  def eventsAnomalyServed(spark: SparkSession, dir: String): DataFrame =
    anomalyFromHourly(hourlyFromRollup(spark, dir))

  /** FROZEN per-type calibration stats off the B32 rollup artifact —
    * the static side of the G19 streaming anomaly gate. Tiny frame
    * (one row per event type), broadcast by the consumer. */
  def anomalyStatsServed(spark: SparkSession, dir: String): DataFrame =
    anomalyStatsFrom(hourlyFromRollup(spark, dir))

  /** B30 served from the rollup. */
  def eventsGapfillServed(spark: SparkSession, dir: String): DataFrame =
    gapfillFromHourly(hourlyFromRollup(spark, dir))

  /** DuckDB oracle twins — aliases must match the Spark side exactly
    * (the driver's compare sorts columns by name before hashing).
    */
  private val baseOracles: Map[String, String] = Map(
    "q_events_gapfill" ->
      """WITH h AS (SELECT event_type,
        |    epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, MIN(hour_ms) lo, MAX(hour_ms) hi
        |  FROM h GROUP BY 1),
        |g AS (SELECT event_type,
        |    unnest(generate_series(lo, hi, 3600000)) AS hour_ms FROM s)
        |SELECT g.event_type, g.hour_ms,
        |  CAST(COALESCE(h.n_events, 0) AS BIGINT) AS n_events
        |FROM g LEFT JOIN h USING (event_type, hour_ms)""".stripMargin,
    "q_events_anomaly" ->
      """WITH h AS (SELECT event_type,
        |    epoch_ms(date_trunc('hour', ts)) AS hour_ms,
        |    COUNT(*) AS n_events
        |  FROM events GROUP BY 1, 2),
        |st AS (SELECT event_type, COUNT(*) AS n_hours,
        |    CAST(SUM(n_events) AS HUGEINT) AS s,
        |    CAST(SUM(CAST(n_events AS HUGEINT) * n_events) AS HUGEINT) AS q
        |  FROM h GROUP BY 1)
        |SELECT h.event_type, h.hour_ms,
        |  CAST(h.n_events AS BIGINT) AS n_events,
        |  (CAST(st.n_hours AS HUGEINT) * h.n_events - st.s)
        |    * (CAST(st.n_hours AS HUGEINT) * h.n_events - st.s)
        |    > 9 * (CAST(st.n_hours AS HUGEINT) * st.q - st.s * st.s) AS anomalous
        |FROM h JOIN st USING (event_type)""".stripMargin,
    "q_events_retention" ->
      // Week index as a true floor grid (the q_events_hopping fix,
      // same class): DuckDB `//` truncates toward zero, so pre-epoch
      // ms would land in week 0 while Spark's
      // `(ms - pmod(ms, wk)) div wk` floors. Snapping to the week
      // grid with the portable floor-mod FIRST makes the numerator an
      // exact (possibly negative) multiple, where truncation = floor.
      """WITH w AS (SELECT DISTINCT user_id,
        |    (epoch_ms(ts) - ((epoch_ms(ts) % 604800000 + 604800000)
        |      % 604800000)) // 604800000 AS wk FROM events),
        |f AS (SELECT user_id, MIN(wk) AS cohort_week FROM w GROUP BY 1),
        |s AS (SELECT cohort_week, COUNT(*) AS cohort_size FROM f
        |  GROUP BY 1),
        |a AS (SELECT f.cohort_week, w.wk - f.cohort_week AS week_offset,
        |    COUNT(*) AS n_active
        |  FROM w JOIN f USING (user_id) GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset,
        |  CAST(a.n_active AS BIGINT) AS n_active,
        |  CAST(s.cohort_size AS BIGINT) AS cohort_size,
        |  CAST(a.n_active AS DOUBLE) / s.cohort_size AS retention
        |FROM a JOIN s USING (cohort_week)""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS sum_disc_price,
        |  CAST(SUM(CAST((l_extendedprice * (1.0 - l_discount)) * (1.0 + l_tax) AS DECIMAL(38,6))) AS DOUBLE) AS sum_charge,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q6_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount >= 0.03 AND l_discount <= 0.05
        |  AND l_quantity < 24.0""".stripMargin,
    "q3_bucketed" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue,
        |  strftime(o_orderdate, '%Y-%m-%d') AS orderdate
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1997-06-01'
        |  AND l_shipdate > TIMESTAMP '1997-06-01'
        |GROUP BY l_orderkey, o_orderdate
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "q5_bucketed" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q5_region_revenue" ->
      """SELECT n_name,
        |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin,
    "q_top_orders_per_customer" ->
      """SELECT c_custkey, c_name, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |JOIN customer ON o_custkey = c_custkey
        |WHERE rn <= 3""".stripMargin,
    "q_top_orders_plan" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    ROW_NUMBER() OVER (PARTITION BY o_custkey
        |      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders) t
        |WHERE rn <= 3""".stripMargin,
    "q_orders_rollup" ->
      """SELECT o_orderstatus, o_orderpriority,
        |  COUNT(*) AS n_orders,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_customers_no_orders" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |  AND o_orderdate >= TIMESTAMP '2001-01-01')""".stripMargin,
    "q4_order_priority" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orders
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q_min_price_per_brand" ->
      """SELECT p_brand, p_partkey, p_retailprice FROM part p
        |WHERE p_retailprice = (SELECT MIN(p2.p_retailprice)
        |  FROM part p2 WHERE p2.p_brand = p.p_brand)""".stripMargin,
    "q_events_windowed" ->
      """SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |  COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_events_hopping" ->
      // True floor grid (ADVICE r12): DuckDB's `//` and `%` both
      // follow the dividend's sign (-7 // 2 = -3), so neither matches
      // Spark's pmod snap for pre-epoch ms; the double-mod below is
      // the portable floor-mod and agrees with pmod for ALL ms
      // (verified: ms=-100 -> -900000 on both engines).
      """WITH e AS (SELECT event_type, epoch_ms(ts) AS ms, value
        |  FROM events),
        |x AS (SELECT event_type, value,
        |  ms - ((ms % 900000 + 900000) % 900000) - 900000 * u.i
        |    AS win_start_ms
        |  FROM e, LATERAL unnest(generate_series(0, 3)) AS u(i))
        |SELECT win_start_ms, event_type, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        |FROM x GROUP BY 1, 2""".stripMargin,
    "q_events_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ms - LAG(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ms ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, MIN(ms) AS session_start_ms, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sess_id""".stripMargin,
    "q_events_sessionize_native" ->
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ms, value FROM events),
        |flagged AS (
        |  SELECT *, CASE WHEN ms - LAG(ms) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ms ASC, event_id ASC)),
        |sess AS (
        |  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id
        |    ORDER BY ms ASC, event_id ASC ROWS UNBOUNDED PRECEDING) AS sess_id
        |  FROM flagged)
        |SELECT user_id, MIN(ms) AS session_start_ms, COUNT(*) AS n_events,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
        |FROM sess GROUP BY user_id, sess_id""".stripMargin,
    "q_events_json" ->
      """SELECT event_type,
        |  CAST(SUM(k) AS BIGINT) AS sum_k, COUNT(DISTINCT k) AS distinct_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        |      FROM events) t
        |GROUP BY event_type""".stripMargin,
    "q_distinct_parts" ->
      """SELECT l_returnflag,
        |  COUNT(DISTINCT l_partkey) AS n_parts,
        |  COUNT(DISTINCT l_suppkey) AS n_supps
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_running_revenue" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
        |    PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC
        |    ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_total
        |FROM orders""".stripMargin,
    "q_orders_pivot" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS "F",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS "O",
        |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS "P"
        |FROM orders GROUP BY o_orderpriority""".stripMargin,
    "q_events_trending" ->
      """WITH c AS (
        |  SELECT epoch_ms(date_trunc('hour', ts)) AS hour_ms, event_type,
        |    COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |r AS (SELECT hour_ms, event_type, n,
        |    ROW_NUMBER() OVER (PARTITION BY hour_ms
        |      ORDER BY n DESC, event_type ASC) AS rank
        |  FROM c)
        |SELECT hour_ms, rank, event_type, n AS n_events
        |FROM r WHERE rank <= 3""".stripMargin,
    "q_customer_churn" ->
      """SELECT o_custkey AS churned_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'""".stripMargin,
    "q_string_ops" ->
      """SELECT c_custkey,
        |  upper(substr(c_name, 1, 8)) AS name_prefix,
        |  length(trim(c_name)) AS name_len,
        |  regexp_extract(c_name, '([0-9]+)$', 1) AS name_num,
        |  c_mktsegment || '-' || c_name AS tagged
        |FROM customer
        |WHERE c_name LIKE 'Customer%1%'""".stripMargin,
    "q_nation_coverage" ->
      """WITH c AS (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        |  FROM customer GROUP BY 1),
        |s AS (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        |  FROM supplier GROUP BY 1),
        |f AS (SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
        |    n_customers, n_suppliers
        |  FROM c FULL OUTER JOIN s ON c.nationkey = s.nationkey)
        |SELECT n.n_name,
        |  CAST(COALESCE(f.n_customers, 0) AS BIGINT) AS n_customers,
        |  CAST(COALESCE(f.n_suppliers, 0) AS BIGINT) AS n_suppliers
        |FROM f RIGHT JOIN nation n ON f.nationkey = n.n_nationkey""".stripMargin,
    "q_events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        |v AS (SELECT user_id, MIN(ms) t FROM e WHERE event_type = 'view'
        |      GROUP BY 1),
        |c AS (SELECT e.user_id, MIN(e.ms) t FROM e JOIN v USING (user_id)
        |      WHERE e.event_type = 'click' AND e.ms >= v.t
        |        AND e.ms - v.t <= 86400000 GROUP BY 1),
        |p AS (SELECT e.user_id, MIN(e.ms) t FROM e JOIN c USING (user_id)
        |      WHERE e.event_type = 'purchase' AND e.ms >= c.t
        |        AND e.ms - c.t <= 86400000 GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type,
        |  (SELECT COUNT(*) FROM v) AS n_users
        |UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM c)
        |UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM p)""".stripMargin,
    "q_table_profile" ->
      """SELECT 'o_orderkey' AS col_name, COUNT(*) AS n_rows,
        |  CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_nulls,
        |  COUNT(DISTINCT o_orderkey) AS n_distinct,
        |  CAST(MIN(o_orderkey) AS VARCHAR) AS min_value,
        |  CAST(MAX(o_orderkey) AS VARCHAR) AS max_value FROM orders
        |UNION ALL
        |SELECT 'o_custkey', COUNT(*),
        |  CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        |  COUNT(DISTINCT o_custkey),
        |  CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
        |FROM orders
        |UNION ALL
        |SELECT 'o_orderstatus', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  COUNT(DISTINCT o_orderstatus), MIN(o_orderstatus),
        |  MAX(o_orderstatus) FROM orders
        |UNION ALL
        |SELECT 'o_orderpriority', COUNT(*),
        |  CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END)
        |    AS BIGINT),
        |  COUNT(DISTINCT o_orderpriority), MIN(o_orderpriority),
        |  MAX(o_orderpriority) FROM orders""".stripMargin,
    "q_percentiles" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  MAX(CASE WHEN rn = (cnt * 50 + 99) // 100 THEN l_quantity END) AS p50,
        |  MAX(CASE WHEN rn = (cnt * 90 + 99) // 100 THEN l_quantity END) AS p90,
        |  MAX(CASE WHEN rn = (cnt * 99 + 99) // 100 THEN l_quantity END) AS p99
        |FROM ranked GROUP BY l_returnflag""".stripMargin,
    "q_median_quantity" ->
      """WITH ranked AS (
        |  SELECT l_returnflag, l_quantity,
        |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity) AS rn,
        |    COUNT(*) OVER (PARTITION BY l_returnflag) AS cnt
        |  FROM lineitem),
        |mids AS (SELECT * FROM ranked
        |  WHERE rn = (cnt + 1) // 2 OR rn = (cnt + 2) // 2)
        |SELECT l_returnflag,
        |  (MIN(l_quantity) + MAX(l_quantity)) / 2 AS median_qty
        |FROM mids GROUP BY l_returnflag""".stripMargin,
    // B29 _check: group sizes from the table, the guarantee pinned
    "q_percentiles_sketch_check" ->
      """SELECT l_returnflag AS grp, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(3 AS BIGINT) AS n_probes, TRUE AS sketch_ok
        |FROM lineitem GROUP BY 1""".stripMargin
  )

  // B32 served rows: counts and decimal sums are associative and the
  // bucket grids nest, so each served answer is EXACTLY its inline
  // twin's — the oracles are shared verbatim (the oracle recomputes
  // from raw events; the Spark side serves the persisted rollup).
  val oracles: Map[String, String] = baseOracles ++
    Seq("q_events_hopping", "q_events_anomaly", "q_events_gapfill")
      .map(k => s"${k}_served" -> baseOracles(k)).toMap

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing_summary" -> (q1PricingSummary _),
    "q6_forecast_revenue" -> (q6ForecastRevenue _),
    "q3_shipping_priority" -> (q3ShippingPriority _),
    "q5_region_revenue" -> (q5RegionRevenue _),
    "q3_bucketed" -> (q3Bucketed _),
    "q5_bucketed" -> (q5Bucketed _),
    "q_top_orders_per_customer" -> (topOrdersPerCustomer _),
    "q_top_orders_plan" -> (topOrdersPlanNode _),
    "q_orders_rollup" -> (ordersRollup _),
    "q_customers_no_orders" -> (customersNoOrders _),
    "q4_order_priority" -> (q4OrderPriority _),
    "q_min_price_per_brand" -> (qMinPricePerBrand _),
    "q_events_windowed" -> (eventsWindowed _),
    "q_events_hopping" -> (eventsHopping _),
    "q_events_hopping_served" -> (eventsHoppingServed _),
    "q_events_retention" -> (eventsRetention _),
    "q_events_anomaly" -> (eventsAnomaly _),
    "q_events_anomaly_served" -> (eventsAnomalyServed _),
    "q_events_gapfill" -> (eventsGapfill _),
    "q_events_gapfill_served" -> (eventsGapfillServed _),
    "q_events_sessionize" -> (eventsSessionize _),
    "q_events_sessionize_native" -> (eventsSessionizeNative _),
    "q_events_json" -> (eventsJson _),
    "q_distinct_parts" -> (distinctParts _),
    "q_median_quantity" -> (qMedianQuantity _),
    "q_percentiles" -> ((s, d) => qPercentiles(s, d)),
    "q_percentiles_sketch" -> ((s, d) => qPercentilesSketch(s, d)),
    "q_percentiles_sketch_check" ->
      ((s, d) => qPercentilesSketchCheck(s, d)),
    "q_events_funnel" -> ((s, d) => eventsFunnel(s, d)),
    "q_nation_coverage" -> (qNationCoverage _),
    "q_table_profile" -> (tableProfile _),
    "q_running_revenue" -> (qRunningRevenue _),
    "q_orders_pivot" -> (qOrdersPivot _),
    "q_customer_churn" -> (qCustomerChurn _),
    "q_string_ops" -> (qStringOps _),
    "q_events_trending" -> (eventsTrending _)
  )
}
