package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

import graft.functions.TextFunctions
import EventStreams.{Event, Session, SessionState}

/** `transformWithState` forms of the stateful streams (SURVEY.md
  * §2.G3/G4 stretch): Spark 4's arbitrary-state API — the successor
  * of `flatMapGroupsWithState` — with explicit typed state handles
  * and first-class event-time timers instead of the single implicit
  * GroupState + timeout slot.
  *
  * Same semantics as [[EventStreams.sessionize]] /
  * [[StreamingDedup.dedupStream]]; pinned against them in
  * StreamingSpec. Requires the RocksDB state store provider
  * (`spark.sql.streaming.stateStore.providerClass` =
  * `...state.RocksDBStateStoreProvider`) — transformWithState does
  * not run on the default HDFS-backed store.
  */
object TwsStreams {

  val RocksDbProvider =
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"

  /** G3 via transformWithState: per-user open-session aggregate in a
    * ValueState; a timer at last_event + gap closes the session when
    * the watermark passes it.
    */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, Event, Session] {

    @transient private var session: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      session = getHandle.getValueState[SessionState]("session",
        Encoders.product[SessionState], TTLConfig.NONE)

    override def handleInputRows(userId: Long, rows: Iterator[Event],
        timerValues: TimerValues): Iterator[Session] = {
      val sorted = rows.toSeq.sortBy(_.ts.getTime)
      var cur = if (session.exists()) Some(session.get()) else None
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
        session.update(s)
        // one live timer per key: re-arm at the new session horizon
        getHandle.listTimers()
          .foreach(t => getHandle.deleteTimer(t.asInstanceOf[Long]))
        getHandle.registerTimer(s.last + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Session] =
      if (session.exists()) {
        val s = session.get()
        session.clear()
        Iterator.single(Session(userId, s.start, s.n, s.total))
      } else Iterator.empty
  }

  def sessionize(events: Dataset[Event],
      gapMs: Long = 30 * 60 * 1000L): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", "2 hours")
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime, OutputMode.Append)
  }

  case class Doc(ts: Timestamp, text: String, fingerprint: String)
  // public: the generated state-encoder class must reach the ctor
  case class Seen(firstMs: Long)

  /** G4 via transformWithState: first occurrence per fingerprint,
    * state dropped by a timer once the watermark passes first-seen +
    * horizon — the explicit-state spelling of
    * `dropDuplicatesWithinWatermark`.
    */
  class DedupProcessor(horizonMs: Long)
      extends StatefulProcessor[String, Doc, Doc] {

    @transient private var seen: ValueState[Seen] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Seen]("seen",
        Encoders.product[Seen], TTLConfig.NONE)

    override def handleInputRows(fp: String, rows: Iterator[Doc],
        timerValues: TimerValues): Iterator[Doc] =
      if (seen.exists()) Iterator.empty
      else {
        val first = rows.minBy(d => (d.ts.getTime, d.text))
        seen.update(Seen(first.ts.getTime))
        getHandle.registerTimer(first.ts.getTime + horizonMs)
        Iterator.single(first)
      }

    override def handleExpiredTimer(fp: String, timerValues: TimerValues,
        expired: ExpiredTimerInfo): Iterator[Doc] = {
      seen.clear()
      Iterator.empty
    }
  }

  /** `docs` = (ts timestamp, text string) stream. */
  def dedupStream(docs: DataFrame, watermark: String = "1 hour",
      horizonMs: Long = 60 * 60 * 1000L): Dataset[Doc] = {
    import docs.sparkSession.implicits._
    docs
      .withColumn("fingerprint", TextFunctions.fingerprint(col("text")))
      .withWatermark("ts", watermark)
      .as[Doc]
      .groupByKey(_.fingerprint)
      .transformWithState(new DedupProcessor(horizonMs),
        TimeMode.EventTime, OutputMode.Append)
  }
}
