package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, GroupState,
  GroupStateTimeout, OutputMode, StatefulProcessor, TimeMode, TimerValues,
  TTLConfig}

/** OP-53: custom stateful sessionization via flatMapGroupsWithState —
  * the escape hatch for session semantics session_window can't express
  * (e.g. emitting per-session features, capping session length).
  *
  * State per user is one open session (start, last ts, count, sum): when
  * an event arrives more than `gapMs` after the last one, the open session
  * is emitted and a new one begins. Designed for event-time-ordered input
  * per key (tests feed ordered MemoryStream batches); a production
  * deployment pairs this with a watermark + EventTimeTimeout to flush
  * sessions that never see another event.
  *
  * Scale: state is O(active users), keyed and partitioned by user —
  * exactly the layout StreamingSymmetricHashJoin/state stores shard
  * across executors; RocksDB state store recommended at 100 TB.
  */
object Sessionize {
  case class Event(user_id: Long, ts_ms: Long, value: Double)
  case class TimedEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start_ms: Long, last_ms: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Shared per-batch fold: absorb this batch's (sorted) events into the
    * open session, emitting sessions closed by a gap. An event that
    * arrives out of order across micro-batches (older than the open
    * session's last event, but not late enough for the watermark filter)
    * MERGES via min/max when it lies within gap of the session span —
    * the span only grows and never inverts. An event more than gap
    * OLDER than the session start cannot belong to it and is emitted as
    * its own (possibly fragmentary) session: exact retroactive merging
    * would need a list of open sessions per key, which this single-state
    * operator deliberately does not keep (bounded-disorder inputs — the
    * watermark caps how far back an event can land). */
  private[graft] def foldBatch(user: Long, sorted: Seq[(Long, Double)],
      gapMs: Long, open: Option[SessionState])
      : (Seq[Session], Option[SessionState]) = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
    var cur = open
    for ((t, v) <- sorted) {
      cur match {
        case Some(s) if t < s.start_ms - gapMs =>
          // stale straggler: precedes the open session by more than the
          // gap — a distinct session; the open one stays untouched
          closed += Session(user, t, t, 1, v)
        case Some(s) if t - s.last_ms > gapMs =>
          closed += Session(user, s.start_ms, s.last_ms, s.n, s.sum)
          cur = Some(SessionState(t, t, 1, v))
        case Some(s) =>
          cur = Some(SessionState(math.min(s.start_ms, t),
            math.max(s.last_ms, t), s.n + 1, s.sum + v))
        case None =>
          cur = Some(SessionState(t, t, 1, v))
      }
    }
    (closed.toSeq, cur)
  }

  def sessions(events: Dataset[Event], gapMs: Long,
      outputMode: OutputMode = OutputMode.Append()): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        outputMode, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val (closed, cur) = foldBatch(user,
            batch.toSeq.sortBy(_.ts_ms).map(e => (e.ts_ms, e.value)),
            gapMs, state.getOption)
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** The same event-time sessionization on Spark 4's transformWithState —
    * the successor API to flatMapGroupsWithState: typed state handles
    * (ValueState) instead of one opaque state object, and EXPLICIT timers
    * instead of a single per-key timeout. Semantics mirror
    * [[sessionsEventTime]]: absorb each batch through [[foldBatch]],
    * re-register a timer at the session's close point on every update
    * (deleting the superseded registration — ONE live timer per key, so
    * timer state is O(active keys)), and flush+clear when a timer fires
    * past last+gap; a timer that races a same-batch extension fires
    * early and re-registers for the true close point instead of
    * flushing. Requires the RocksDB state store provider, which is
    * also the 100 TB recommendation (state spills off-heap, snapshot +
    * changelog checkpointing). */
  class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, TimedEvent, Session] {
    @transient private var open: ValueStateT = _
    @transient private var timerAt:
      org.apache.spark.sql.streaming.ValueState[Long] = _
    private type ValueStateT =
      org.apache.spark.sql.streaming.ValueState[SessionState]

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      open = getHandle.getValueState[SessionState]("open",
        Encoders.product[SessionState], TTLConfig.NONE)
      timerAt = getHandle.getValueState[Long]("timerAt",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(user: Long, rows: Iterator[TimedEvent],
        timerValues: TimerValues): Iterator[Session] = {
      val (closed, cur) = foldBatch(user,
        rows.toSeq.map(e => (e.ts.getTime, e.value)).sortBy(_._1),
        gapMs, if (open.exists()) Some(open.get()) else None)
      cur.foreach { s =>
        open.update(s)
        // timer strictly beyond the current watermark, at the close
        // point; the superseded registration is DELETED so timer state
        // stays O(active keys), not O(events in the watermark horizon)
        val at =
          math.max(s.last_ms + gapMs, timerValues.getCurrentWatermarkInMs() + 1)
        // one state read per key per batch (RocksDB lookup at scale)
        val prev = if (timerAt.exists()) Some(timerAt.get()) else None
        if (!prev.contains(at)) {
          prev.foreach(getHandle.deleteTimer)
          getHandle.registerTimer(at)
          timerAt.update(at)
        }
      }
      closed.iterator
    }

    override def handleExpiredTimer(user: Long, timerValues: TimerValues,
        expiredTimerInfo: ExpiredTimerInfo): Iterator[Session] = {
      timerAt.clear()
      if (!open.exists()) Iterator.empty
      else {
        val s = open.get()
        // a timer raced a same-batch extension: not yet past last+gap —
        // re-register for the true close point instead of flushing early
        if (timerValues.getCurrentWatermarkInMs() >= s.last_ms + gapMs) {
          open.clear()
          Iterator.single(Session(user, s.start_ms, s.last_ms, s.n, s.sum))
        } else {
          val at = math.max(s.last_ms + gapMs,
            timerValues.getCurrentWatermarkInMs() + 1)
          getHandle.registerTimer(at)
          timerAt.update(at)
          Iterator.empty
        }
      }
    }
  }

  def sessionsTws(events: Dataset[TimedEvent], gapMs: Long,
      delay: String = "10 seconds"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** Production mode: watermark + EventTimeTimeout. A session whose user
    * never sends another event is flushed once the watermark passes
    * last_event + gap, and its state is REMOVED — so state is bounded by
    * sessions active within the watermark horizon, not by all users ever
    * seen (the NoTimeout mode above retains open sessions forever, which
    * matches the reference's semantics but cannot run indefinitely).
    */
  def sessionsEventTime(events: Dataset[TimedEvent], gapMs: Long,
      delay: String = "10 seconds"): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.withWatermark("ts", delay)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout) {
        (user: Long, batch: Iterator[TimedEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap with no new events: flush + drop
            val closed = state.getOption.map(s =>
              Session(user, s.start_ms, s.last_ms, s.n, s.sum))
            state.remove()
            closed.iterator
          } else {
            val (closed, cur) = foldBatch(user,
              batch.toSeq.map(e => (e.ts.getTime, e.value)).sortBy(_._1),
              gapMs, state.getOption)
            cur.foreach { s =>
              state.update(s)
              // fire when the watermark passes the session's close point;
              // the timeout must sit strictly beyond the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last_ms + gapMs, state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
