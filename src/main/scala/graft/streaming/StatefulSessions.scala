package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState, GroupStateTimeout, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Custom streaming state via `flatMapGroupsWithState` — the escape
  * hatch for session semantics that `session_window` cannot express
  * (here: per-session event counts/sums with an explicit open-session
  * state machine, emitted exactly once per closed session).
  *
  * Two entry points over the same fold:
  *  - `sessionizeBatch`: batch mode (each key's full history arrives in
  *    one iterator call; every session, including the final open one,
  *    is emitted). Used by q39 — hash-matches the q29 gaps-and-islands
  *    DuckDB oracle, proving the state machine against SQL semantics.
  *  - `sessionizeStream`: streaming mode with `EventTimeTimeout` —
  *    closed sessions emit as soon as a same-key event closes them; the
  *    open session is held in state and flushed when the watermark
  *    passes `lastTs + gap` (the timeout), giving exactly-once session
  *    emission under late-data bounds. Input must carry a watermark on
  *    `ts`.
  *
  * Session rule (identical to q29's oracle and to `session_window`'s
  * half-open `[start, last+gap)`): an event at `ts >= lastTs + gap`
  * starts a new session.
  *
  * Scale: one shuffle on the key; per-key state is a single
  * fixed-size `OpenSession` (not the event list), so state size is
  * O(distinct active keys) regardless of event volume. The in-function
  * sort is per-key-per-batch, bounded by `maxOffsetsPerTrigger`.
  */
object StatefulSessions {

  /** Event after projection; ties broken by `seq` (the event id). */
  case class SEvent(key: Long, seq: Long, ts: Timestamp, value: Double)

  /** The entire per-key state: the one open session (times in µs). */
  case class OpenSession(startUs: Long, lastUs: Long, n: Long, total: Double)

  case class SessionRow(key: Long, startUs: Long, n_events: Long, total: Double)

  /** java.sql.Timestamp → integer microseconds (getTime truncates to
    * ms; the nanos field carries the full fractional second). */
  private def usec(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Fold time-sorted events into the open state, emitting sessions
    * that close along the way. */
  private def fold(
      open: Option[OpenSession],
      events: Iterator[SEvent],
      gapUs: Long): (Seq[OpenSession], Option[OpenSession]) = {
    val sorted = events.toSeq.sortBy(e => (usec(e.ts), e.seq))
    var closed = Vector.empty[OpenSession]
    var cur = open
    sorted.foreach { e =>
      val ts = usec(e.ts)
      cur match {
        case Some(s) if ts - s.lastUs < gapUs =>
          cur = Some(OpenSession(s.startUs, math.max(s.lastUs, ts),
            s.n + 1, s.total + e.value))
        case Some(s) =>
          closed :+= s
          cur = Some(OpenSession(ts, ts, 1, e.value))
        case None =>
          cur = Some(OpenSession(ts, ts, 1, e.value))
      }
    }
    (closed, cur)
  }

  private def toRows(key: Long, ss: Seq[OpenSession]): Iterator[SessionRow] =
    ss.iterator.map(s => SessionRow(key, s.startUs, s.n, s.total))

  /** Project (key, id, ts, value) columns into the typed event shape. */
  def project(df: DataFrame, keyCol: String, idCol: String,
      tsCol: String, valCol: String): Dataset[SEvent] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(
      col(keyCol).cast("long").as("key"),
      col(idCol).cast("long").as("seq"),
      col(tsCol).cast("timestamp").as("ts"),
      col(valCol).cast("double").as("value")).as[SEvent]
  }

  /** Batch mode: one call per key with its full history; emit every
    * session including the final open one, keep no state. */
  def sessionizeBatch(ds: Dataset[SEvent], gapUs: Long): Dataset[SessionRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
      (key: Long, events: Iterator[SEvent], state: GroupState[OpenSession]) =>
        val (closed, open) = fold(None, events, gapUs)
        toRows(key, closed ++ open.toSeq)
    }
  }

  /** The SAME session contract on the MODERN arbitrary-state API
    * (`transformWithState`, Spark 4): typed `ValueState` through the
    * `StatefulProcessorHandle` instead of a single `GroupState` blob,
    * and explicit event-time TIMERS instead of the one implicit
    * timeout slot — the API that composes (a processor can hold many
    * named states/timers where flatMapGroupsWithState holds one of
    * each). Requires the RocksDB state store provider; semantics are
    * identical to [[sessionizeStream]] and StreamingWindowSpec pins
    * the three-way parity (tws == flatMapGroupsWithState == batch
    * oracle).
    */
  class SessionProcessor(gapUs: Long)
      extends StatefulProcessor[Long, SEvent, SessionRow] {
    @transient private var open: ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession](
        "open", Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[SEvent], tv: TimerValues): Iterator[SessionRow] = {
      val prior = if (open.exists()) Some(open.get()) else None
      val (closed, cur) = fold(prior, rows, gapUs)
      // Re-arm the key's single horizon timer: delete any stale one,
      // register at the new session horizon (same ms round-UP as
      // sessionizeStream — truncating could fire ~1ms early).
      // Materialized first: listTimers is backed by a LIVE state-store
      // iterator, and deleting while iterating is provider-dependent
      // behavior (can skip or break on non-RocksDB providers).
      getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
      cur match {
        case Some(s) =>
          open.update(s)
          getHandle.registerTimer(math.floorDiv(s.lastUs + gapUs + 999L, 1000L))
        case None => open.clear()
      }
      toRows(key, closed)
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[SessionRow] = {
      val out = if (open.exists()) Seq(open.get()) else Seq.empty
      open.clear()
      toRows(key, out)
    }
  }

  /** [[sessionizeStream]]'s contract through [[SessionProcessor]]. */
  def sessionizeStreamTws(ds: Dataset[SEvent], gapUs: Long): Dataset[SessionRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).transformWithState(
      new SessionProcessor(gapUs), TimeMode.EventTime(), OutputMode.Append())
  }

  /** Streaming mode: closed sessions emit immediately; the open session
    * lives in state and is flushed by event-time timeout once the
    * watermark passes `lastTs + gap`. */
  def sessionizeStream(ds: Dataset[SEvent], gapUs: Long): Dataset[SessionRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).flatMapGroupsWithState(
      OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
      (key: Long, events: Iterator[SEvent], state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val open = state.getOption
          state.remove()
          toRows(key, open.toSeq)
        } else {
          val (closed, open) = fold(state.getOption, events, gapUs)
          open match {
            case Some(s) =>
              state.update(s)
              // Flush when the watermark passes the session's horizon.
              // Round the µs horizon UP to ms: truncating could fire
              // the timeout ~1ms early and close a session an
              // in-watermark sub-millisecond event still belongs to.
              state.setTimeoutTimestamp(math.floorDiv(s.lastUs + gapUs + 999L, 1000L))
            case None => state.remove()
          }
          toRows(key, closed)
        }
    }
  }
}
