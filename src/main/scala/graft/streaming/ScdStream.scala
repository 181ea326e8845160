package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig}

/** Streaming SCD2 — the history twin of the changelog family: where
  * [[Changelog]] keeps only each key's LATEST state, this emits the full
  * version history as validity intervals, closing an interval the moment
  * a key's tracked value changes. Batch twin: [[graft.ops.Scd.history]]
  * — the drained closed-interval set equals the batch SCD2 rows with
  * `is_current = 0` (shared oracle), and the open versions live on as
  * operator state.
  *
  * Output mode is Append: a closed interval is an immutable fact (its
  * version can never reopen), so the stream is an append-only dimension
  * feed a warehouse can ingest directly — no upsert sink required,
  * unlike the Update-mode changelog.
  *
  * State per key is ONE row (the open version), O(active keys), under
  * the RocksDB provider at scale. Arrival contract: per-key event-time
  * order ACROSS batches (the standard CDC log-shipping guarantee);
  * WITHIN a batch arrival order is free — rows are folded in
  * (t_us, event_id) order.
  */
object ScdStream {
  case class Ev(user_id: Long, event_type: String, t_us: Long,
      event_id: Long, val_bp: Long)
  case class Key(user_id: Long, event_type: String)
  case class Open(ver: Long, val_bp: Long, valid_from: Long)
  case class Closed(user_id: Long, event_type: String, ver: Long,
      val_bp: Long, valid_from: Long, valid_to: Long)

  /** Fold one batch of a key's events (sorted here) into the open
    * version: a value change closes the open interval at the event's
    * time and opens the next version; a no-change event is absorbed. */
  private[graft] def fold(key: Key, st: Option[Open], batch: Seq[Ev])
      : (Open, Seq[Closed]) = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[Closed]
    var open = st
    batch.sortBy(e => (e.t_us, e.event_id)).foreach { ev =>
      open match {
        case None =>
          open = Some(Open(1L, ev.val_bp, ev.t_us))
        case Some(o) if o.val_bp != ev.val_bp =>
          closed += Closed(key.user_id, key.event_type, o.ver, o.val_bp,
            o.valid_from, ev.t_us)
          open = Some(Open(o.ver + 1, ev.val_bp, ev.t_us))
        case _ => ()
      }
    }
    (open.get, closed.toSeq)
  }

  /** transformWithState processor: one typed ValueState row (the open
    * version) per key; closed intervals are the emitted output. */
  class Scd2Processor extends StatefulProcessor[Key, Ev, Closed] {
    @transient private var open:
      org.apache.spark.sql.streaming.ValueState[Open] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[Open]("open",
        Encoders.product[Open], TTLConfig.NONE)

    override def handleInputRows(key: Key, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Closed] = {
      val (o, closed) = fold(key,
        if (open.exists()) Some(open.get()) else None, rows.toSeq)
      open.update(o)
      closed.iterator
    }
  }

  /** Closed SCD2 intervals of an event stream, Append mode. */
  def closedIntervals(events: Dataset[Ev]): Dataset[Closed] = {
    implicit val outEnc = Encoders.product[Closed]
    events.groupByKey(e => Key(e.user_id, e.event_type))(
        Encoders.product[Key])
      .transformWithState(new Scd2Processor,
        TimeMode.None(), OutputMode.Append())
  }
}
