package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming Markov-transition emission (op249): op166's first-order
  * transition mining kept ONLINE. Per-user state is ONE event — the
  * latest seen (ts_ns, event_id, type) — and every arriving event
  * emits exactly one (prev_type, cur_type) pair against it (the
  * user's first event emits nothing). Unlike the session family
  * (op203) there is NO closed-rows caveat: a transition exists the
  * moment its later event arrives, so the streamed pair multiset
  * equals the batch lag() chain EXACTLY and the serving rollup sits
  * under op166's UNCHANGED oracle.
  *
  * Ordering contract: the [[SessionPathStream]] one — in-batch
  * disorder repaired by the per-key sort, event-time-ordered arrival
  * across batches (bounded disorder under a watermark in production).
  *
  * 100 TB shape: state is one (long, long, string) per user —
  * O(users), keyed and shard-partitioned (RocksDB); each arrival
  * costs one state read/write. The transition MATRIX never lives in
  * the operator: pairs stream out and the types² rollup happens at
  * serve — the op169 mergeable-counts argument.
  */
object TransitionStream {
  case class TEv(user_id: Long, event_id: Long, ts_ns: Long,
      event_type: String)
  case class Transition(user_id: Long, prev_type: String,
      cur_type: String)
  case class LastEv(ts_ns: Long, event_id: Long, event_type: String)

  /** Fold one key's event-time-sorted slice against the carried last
    * event, emitting one transition per arrival after the first. */
  private[graft] def foldBatch(user: Long,
      sorted: Seq[(Long, Long, String)], st0: Option[LastEv])
      : (Seq[Transition], Option[LastEv]) = {
    val out = scala.collection.mutable.ArrayBuffer.empty[Transition]
    var st = st0
    for ((t, id, typ) <- sorted) {
      st.foreach(p => out += Transition(user, p.event_type, typ))
      st = Some(LastEv(t, id, typ))
    }
    (out.toSeq, st)
  }

  class TransitionProcessor
      extends StatefulProcessor[Long, TEv, Transition] {
    @transient private var last:
      org.apache.spark.sql.streaming.ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastEv]("last",
        Encoders.product[LastEv], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[TEv],
        timerValues: TimerValues): Iterator[Transition] = {
      val (out, st) = foldBatch(user,
        rows.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          .map(e => (e.ts_ns, e.event_id, e.event_type)),
        if (last.exists()) Some(last.get()) else None)
      st.foreach(last.update)
      out.iterator
    }
  }

  /** Append-mode transition stream. */
  def transitions(events: Dataset[TEv]): Dataset[Transition] = {
    implicit val outEnc = Encoders.product[Transition]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TransitionProcessor(),
        TimeMode.None(), OutputMode.Append())
  }
}
