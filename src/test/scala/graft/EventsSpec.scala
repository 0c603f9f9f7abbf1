package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Regression net for the events family (SURVEY §2.B8/B9/B10/B12/B21/B23).
  *
  * In round 6 the test-data generator changed `events.ts` from
  * TIMESTAMP(NANOS) to naive timestamp[us] and every events query
  * silently failed for a full round — Bench records a -1 sentinel and
  * Verify swallows errors, and nothing in `sbt test` exercised the
  * real events table. These cases run each events query against the
  * actual sf0.001 parquet and pin the ms-derivation semantics, so an
  * encoding change breaks the build loudly instead.
  */
class EventsSpec extends AnyFunSuite with SparkTestBase {

  test("every q_events_* query runs against the driver's parquet and returns rows") {
    val names = SparkEntry.queries.keys.filter(_.startsWith("q_events_"))
    assert(names.nonEmpty)
    names.foreach { n =>
      val rows = SparkEntry.queries(n)(spark, sf).count()
      assert(rows > 0, s"$n returned no rows")
    }
  }

  test("hopping windows: 4 windows per event, hop-grid starts, tumbling cross-check") {
    val hop = graft.operators.Analytics.eventsHopping(spark, sf).persist()
    val nEvents = Tables.eventsWithMs(spark, sf).count()
    // every event lands in exactly W/H = 4 windows
    assert(hop.agg(sum(col("n_events"))).head().getLong(0) == 4 * nEvents)
    // window starts sit on the 15-min hop grid
    assert(hop.filter(pmod(col("win_start_ms"), lit(900000L)) =!= 0L)
      .count() == 0)
    // the window starting exactly on an hour boundary must contain at
    // least every event of B8's matching tumbling hour (it spans the
    // same [s, s+1h) range)
    val tumbling = graft.operators.Analytics.eventsWindowed(spark, sf)
      .select(col("hour_ms"), col("event_type"),
        col("n_events").as("n_tumble"))
    val joined = hop.join(tumbling,
      col("win_start_ms") === col("hour_ms") &&
        hop("event_type") === tumbling("event_type"))
    assert(joined.filter(col("n_events") =!= col("n_tumble")).count() == 0)
    assert(joined.count() > 0)
    hop.unpersist()
  }

  test("hopping grid: oracle's double-mod equals pmod snap for NEGATIVE ms too") {
    import spark.implicits._
    // ADVICE r12: the first oracle fix swapped one truncating form
    // (sign-of-dividend %) for another (//), so pre-epoch ms still
    // diverged. The oracle now uses the portable floor-mod
    // `ms - ((ms % H + H) % H)`; Spark's `%` is dividend-sign exactly
    // like DuckDB's, so evaluating the oracle arithmetic HERE proves
    // the cross-engine contract on the rows the 2024-only fixture
    // never exercises.
    val ms = Seq(-100L, -1L, -900000L, -900001L, -1755300000123L,
      0L, 1L, 899999L, 900000L, 1755300000123L).toDF("ms")
    val both = ms.select(col("ms"),
      (col("ms") - pmod(col("ms"), lit(900000L))).as("spark_grid"),
      (col("ms") - ((col("ms") % 900000L + 900000L) % 900000L))
        .as("oracle_grid"))
    assert(both.filter(col("spark_grid") =!= col("oracle_grid"))
      .count() == 0)
    // pin the concrete divergence case from the ADVICE: ms=-100 must
    // land in the window starting at -900000, never 0
    assert(both.filter(col("ms") === -100L)
      .head().getLong(1) == -900000L)
    // same class, week grid (q_events_retention): the retention
    // operator's `(ms - pmod(ms, wk)) div wk` and the oracle's
    // snap-then-divide must agree for negative ms (ms=-100 -> week -1)
    val wk = 604800000L
    val weeks = ms.select(col("ms"),
      expr(s"(ms - pmod(ms, $wk)) div $wk").as("spark_wk"),
      ((col("ms") - ((col("ms") % wk + wk) % wk)) / wk).cast("long")
        .as("oracle_wk"))
    assert(weeks.filter(col("spark_wk") =!= col("oracle_wk")).count() == 0)
    assert(weeks.filter(col("ms") === -100L).head().getLong(1) == -1L)
  }

  test("B32: rollup-served anomaly/gapfill/hopping equal their inline forms row-for-row") {
    // counts and decimal sums are associative and the grids nest, so
    // served must be EXACT — any drift means the rollup grain or the
    // serve-side re-aggregation broke the arithmetic contract
    for (base <- Seq("q_events_anomaly", "q_events_gapfill",
        "q_events_hopping")) {
      val inline = SparkEntry.queries(base)(spark, sf)
      val served = SparkEntry.queries(s"${base}_served")(spark, sf)
      assert(served.count() == inline.count(), s"$base count")
      assert(served.exceptAll(inline).count() == 0, s"$base extra rows")
      assert(inline.exceptAll(served).count() == 0, s"$base missing rows")
    }
  }

  test("B32 rollup staleness: same-count events swap rebuilds the artifact") {
    import spark.implicits._
    val an = graft.operators.Analytics
    val dir = scratch("rollup_swap")
    def write(hours: Seq[Int]): Unit = {
      hours.zipWithIndex.map { case (h, i) =>
        (i.toLong, new java.sql.Timestamp(h * 3600000L), i.toLong,
          "click", 1.0, "{}") }
        .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
        .repartition(1)
        .write.mode("overwrite").parquet(s"$dir/events.parquet")
      ()
    }
    write(Seq(0, 0, 1, 2))
    def hoursOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("hour_ms", "n_events").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = hoursOf(an.eventsGapfillServed(spark, dir))
    assert(first == Set((0L, 2L), (3600000L, 1L), (7200000L, 1L)))
    // same row count, different hour histogram — a stale rollup
    // would keep serving the old buckets
    write(Seq(5, 6, 6, 6))
    val second = hoursOf(an.eventsGapfillServed(spark, dir))
    assert(second == Set((18000000L, 1L), (21600000L, 3L)))
    assert(second != first)
  }

  test("eventsWithMs: ms equals the wall-clock reading of ts as UTC epoch millis") {
    val df = Tables.eventsWithMs(spark, sf)
    // Independent derivation through date_format (pure wall-clock
    // string, no epoch arithmetic) — catches both a wrong divisor and
    // a session-timezone leak in the ms path.
    val mismatches = df
      .withColumn("wall", date_format(col("ts"), "yyyy-MM-dd HH:mm:ss.SSS"))
      .withColumn("from_ms",
        date_format(timestamp_millis(col("ms")), "yyyy-MM-dd HH:mm:ss.SSS"))
      .filter(col("wall") =!= col("from_ms"))
      .count()
    assert(mismatches == 0)
  }

  test("sessionize: manual window form and native session_window agree row-for-row") {
    val a = SparkEntry.queries("q_events_sessionize")(spark, sf)
    val b = SparkEntry.queries("q_events_sessionize_native")(spark, sf)
    assert(a.count() == b.count())
    assert(a.exceptAll(b).count() == 0)
    assert(b.exceptAll(a).count() == 0)
  }

  test("anomaly flags: a planted spike trips its type, steady types stay quiet") {
    import spark.implicits._
    val dir = scratch("events_anomaly")
    // steady: 100 events/hour for 24h; spiky: 10/hour except hour 12
    // at 500 — integer cross-multiplied 3-sigma must flag exactly it
    val rows = (for {
      h <- 0 until 24
      i <- 0 until 100
    } yield (h * 24L + i, new java.sql.Timestamp(h * 3600000L + i), 1L,
      "steady", 1.0, "{}")) ++
      (for {
        h <- 0 until 24
        i <- 0 until (if (h == 12) 500 else 10)
      } yield (10000L + h * 1000L + i,
        new java.sql.Timestamp(h * 3600000L + i), 2L, "spiky", 1.0, "{}"))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Analytics.eventsAnomaly(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getBoolean(3)))).toMap
    val flagged = out.filter(_._2._2).keys.toSet
    assert(flagged == Set(("spiky", 12 * 3600000L)), s"flagged=$flagged")
    assert(out(("spiky", 12 * 3600000L))._1 == 500L)
    assert(out.count(_._1._1 == "steady") == 24)
  }
  test("gapfill: planted quiet hours zero-filled, negative ms floors") {
    import spark.implicits._
    val h = 3600000L
    val ev = Seq(
      // hour 0 twice, hour 2 once - hour 1 is the planted gap
      ("a", 0L), ("a", 1L), ("a", 2 * h),
      // single-hour span: no gap rows
      ("b", 5 * h + 42L),
      // pre-epoch ms must FLOOR to hour -1h (truncation toward zero
      // would bucket it at 0 and silently erase the span)
      ("c", -1L), ("c", h)
    ).toDF("event_type", "ms")
    val out = graft.operators.Analytics.eventsGapfillOf(ev)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(out == Set(
      ("a", 0L, 2L), ("a", h, 0L), ("a", 2 * h, 1L),
      ("b", 5 * h, 1L),
      ("c", -h, 1L), ("c", 0L, 0L), ("c", h, 1L)))
  }
}
