package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming transforms over the events shape (SURVEY.md §2.G1/G3).
  * Batch twins of these (q_events_windowed / q_events_sessionize) are
  * oracle-checked; these streaming forms are pinned by StreamingSpec
  * with MemoryStream.
  */
object EventStreams {

  /** G1: tumbling 1-hour windowed counts/sums with a watermark —
    * state is bounded by (watermark horizon × event types).
    */
  def windowedAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** G1b (r12): HOPPING 1-hour windows on a 15-min hop — the
    * streaming twin of B31's analytic batch form (same semantics:
    * every event lands in exactly 4 windows on the 15-min grid).
    * Spark's native sliding `window(ts, "1 hour", "15 minutes")`
    * does the enumeration in-plan; state stays bounded by
    * (watermark horizon / hop × event types).
    */
  def hoppingAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** B32 maintenance (r13): the 15-min tumbling agg whose output rows
    * ARE the quarter-hour rollup artifact's — (event_type, q15_ms,
    * n_events, exact DECIMAL sum_value). G1's geometry at the rollup
    * grain: state bounded by (watermark horizon / 15 min × types);
    * each closed window appends one artifact row, which is how the
    * B28/B30/B31 served dashboard rows stay fresh without any events
    * re-scan (streamed ≡ the batch `buildEventsRollup` rows,
    * spec-pinned).
    */
  def rollupAgg(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(
          org.apache.spark.sql.types.DecimalType(38, 6))).as("sum_value"))
      .select(col("event_type"),
        unix_millis(col("window.start")).as("q15_ms"),
        col("n_events"), col("sum_value"))

  /** G19 (r13): streaming anomaly gate — arriving events bucket into
    * G1's tumbling hour; each CLOSED hour is flagged against FROZEN
    * per-type calibration stats (`Analytics.anomalyStatsServed`, one
    * row per type off the B32 rollup artifact) with B28's
    * integer-exact cross-multiplied 3σ test. This is the production
    * split of B28: the batch form self-calibrates (stats from the
    * same window it flags — right for retrospective audits), the
    * stream flags NEW hours against a pinned baseline — right for
    * alerting, and the reason the stats ride an artifact instead of
    * a second stateful aggregation. State = the one windowed agg
    * (watermark-bounded); the stats join is stream-static broadcast,
    * stateless. Streamed verdicts ≡ the batch test on the same
    * hourly rows (spec-pinned, planted-anomaly case included).
    * An event type ABSENT from the calibration stats flags anomalous
    * outright (left join + flagUnseen): a brand-new traffic class is
    * precisely what an alerting gate must not swallow — the opposite
    * default from C36b's conservative-DROP, because a quality gate
    * failing closed loses one doc while an alert failing silent
    * loses the incident.
    *
    * Emits (event_type, hour_ms, n_events, anomalous) per closed
    * window in append mode.
    */
  def anomalyGate(calibStats: DataFrame, events: DataFrame): DataFrame =
    graft.operators.Analytics.anomalyFlagsAgainst(
      events
        .withWatermark("ts", "2 hours")
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("event_type"),
          unix_millis(col("window.start")).as("hour_ms"),
          col("n_events")),
      broadcast(calibStats), flagUnseen = true)

  /** G21 (r13): STREAM-STREAM interval join — view→click attribution
    * within an event-time window, the funnel's (B23) streaming
    * sibling and the one join geometry the G-surface lacked (G7/G8/
    * G11/G14/G16/G18/G19 are all stream-STATIC): both sides arrive
    * live, so matches need buffered state on BOTH sides. The
    * time-range predicate (click in [view, view + window]) plus a
    * watermark on EACH input is what lets Spark bound that state —
    * a view older than (watermark − window) can never match a future
    * click and is evicted; without the range condition the join
    * would buffer both streams forever (Spark rejects it in append
    * mode for exactly that reason).
    *
    * All event-time math on the timestamp columns (the join executes
    * on Spark's internal microsecond event time); the emitted lag is
    * derived in exact epoch-ms. Streamed matches ≡ the batch inner
    * join on the same rows (spec-pinned).
    */
  def attributionJoin(views: DataFrame, clicks: DataFrame,
      windowSec: Long = 1800): DataFrame = {
    val v = views.select(col("user_id"), col("ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val c = clicks.select(col("user_id").as("click_user"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    v.join(c,
        col("user_id") === col("click_user") &&
          col("click_ts") >= col("view_ts") &&
          col("click_ts") <= col("view_ts") +
            expr(s"INTERVAL $windowSec seconds"))
      .select(col("user_id"), col("view_ts"), col("click_ts"),
        (unix_millis(col("click_ts")) - unix_millis(col("view_ts")))
          .as("lag_ms"))
  }

  /** G5: streaming trending — top-k event types per hour window,
    * as TWO chained stateful aggregations (Spark 4's
    * multiple-stateful-operator support, append mode): windowed
    * counts emit when the watermark closes the window, then the
    * bounded top-k aggregator (H3's string-keyed twin) reduces each
    * closed window to k rows. State stays watermark-bounded in both
    * stages; the batch twin (Analytics.eventsTrending) is
    * oracle-checked.
    */
  def trending(events: DataFrame, k: Int = 3): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("window"))
      .agg(graft.functions.TopK.topkBy(k)(col("n").cast("double"),
        col("event_type")).as("tk"))
      .select(col("window.start").as("window_start"),
        posexplode(col("tk")).as(Seq("idx", "s")))
      .select(col("window_start"), (col("idx") + 1).as("rank"),
        col("s.key").as("event_type"),
        col("s.score").cast("long").as("n_events"))

  case class Event(user_id: Long, ts: Timestamp, value: Double)
  case class SessionState(start: Long, last: Long, n: Long, total: Double)
  case class Session(user_id: Long, session_start_ms: Long, n_events: Long,
      total_value: Double)

  /** G3: stateful gap-based sessionization via flatMapGroupsWithState:
    * per-user O(1) state (open session aggregate), sessions emitted
    * when the 30-min gap is observed or the state times out at the
    * watermark — the streaming dual of the batch window-function
    * implementation in Analytics.eventsSessionize.
    */
  def sessionize(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, rows: Iterator[Event],
         state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(Session(userId, s.start, s.n, s.total))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.last > gapMs =>
                  closed += Session(userId, s.start, s.n, s.total)
                  cur = Some(SessionState(ms, ms, 1, e.value))
                case Some(s) =>
                  cur = Some(SessionState(s.start, math.max(s.last, ms),
                    s.n + 1, s.total + e.value))
                case None =>
                  cur = Some(SessionState(ms, ms, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
