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
}
