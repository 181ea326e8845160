package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

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
  case class SessionState(start_ms: Long, last_ms: Long, n: Long, sum: Double)
  case class Session(user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  def sessions(events: Dataset[Event], gapMs: Long,
      outputMode: OutputMode = OutputMode.Append()): Dataset[Session] = {
    implicit val sessionEnc = Encoders.product[Session]
    implicit val stateEnc = Encoders.product[SessionState]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState[SessionState, Session](
        outputMode, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          val sorted = batch.toSeq.sortBy(_.ts_ms)
          val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
          var cur = state.getOption
          for (e <- sorted) {
            cur match {
              case Some(s) if e.ts_ms - s.last_ms > gapMs =>
                closed += Session(user, s.start_ms, s.last_ms, s.n, s.sum)
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
              case Some(s) =>
                cur = Some(SessionState(s.start_ms, e.ts_ms, s.n + 1,
                  s.sum + e.value))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }
}
