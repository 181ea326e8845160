package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming sessionized funnel (op199): op161's ordered
  * view → click → purchase chain maintained ONLINE — the last
  * batch-only analytics family (event hygiene) gets its streaming leg,
  * the way op132/op134/op142/op153 closed theirs.
  *
  * Per-user state is the funnel's three step timestamps (unset = −∞
  * sentinel); each step CLOSES exactly once, the moment its triggering
  * event is folded, and emits one append-mode StepHit carrying the
  * step latency. The fold replays op161's chain exactly when events
  * are processed in event-time order per key: t1 = first view, t2 =
  * first click strictly after t1, t3 = first purchase strictly after
  * t2 (strict >, so a click tied with t1 never counts — same in both
  * spellings regardless of tie order).
  *
  * Ordering contract: in-batch disorder is repaired by sorting each
  * micro-batch's rows per key; ACROSS batches the operator expects
  * per-key event-time-ordered arrival (time-sliced feeds — the
  * bounded-disorder shape a watermark enforces in production). A click
  * arriving in a LATER batch than a view it precedes in event time is
  * dropped, exactly like [[Sessionize]]'s stale-straggler rule — exact
  * retroactive repair would need unbounded per-key event retention,
  * which an online funnel deliberately does not keep.
  *
  * 100 TB shape: state is THREE longs per user ever seen in a funnel —
  * O(users), keyed and shard-partitioned by the state store (RocksDB
  * provider required by the transformWithState API and recommended at
  * scale); a completed funnel's state is inert (every step closed, no
  * growth). Emission is append-only: ≤ 3 rows per user, ever.
  */
object FunnelStream {
  case class FEv(user_id: Long, event_type: String, ts_ns: Long)
  case class StepHit(user_id: Long, step: String, lat_s: Long)
  /** Unset steps hold [[Unset]] (event ts_ns is epoch-scale positive). */
  case class FunnelState(t1: Long, t2: Long, t3: Long)
  val Unset: Long = Long.MinValue

  /** Fold one key's event-time-sorted slice into the funnel state,
    * emitting the steps this slice closes. Shared by any spelling.
    * `clickWithinNs`/`purchaseWithinNs` are op205's conversion
    * deadlines; the defaults (MaxValue, spelled as `t − prev ≤ w` so
    * no sum can overflow) reduce to op161's unbounded chain. A step
    * arriving past its deadline is skipped FOREVER — later candidates
    * are later still, exactly the batch windowed-min semantics. */
  private[graft] def foldBatch(user: Long,
      sorted: Seq[(String, Long)], st0: FunnelState,
      clickWithinNs: Long = Long.MaxValue,
      purchaseWithinNs: Long = Long.MaxValue)
      : (Seq[StepHit], FunnelState) = {
    val hits = scala.collection.mutable.ArrayBuffer.empty[StepHit]
    var st = st0
    for ((typ, t) <- sorted) typ match {
      case "view" if st.t1 == Unset =>
        st = st.copy(t1 = t)
        hits += StepHit(user, "1_view", 0L)
      case "click" if st.t1 != Unset && st.t2 == Unset && t > st.t1 &&
          t - st.t1 <= clickWithinNs =>
        st = st.copy(t2 = t)
        hits += StepHit(user, "2_click", (t - st.t1) / 1000000000L)
      case "purchase" if st.t2 != Unset && st.t3 == Unset && t > st.t2 &&
          t - st.t2 <= purchaseWithinNs =>
        st = st.copy(t3 = t)
        hits += StepHit(user, "3_purchase", (t - st.t2) / 1000000000L)
      case _ => ()
    }
    (hits.toSeq, st)
  }

  /** transformWithState processor: one typed ValueState row per user,
    * no timers (a funnel step closes on its triggering event, never by
    * time — nothing to flush at a horizon). Deadlines (op207) need no
    * timers either: an expired step simply never fires, and the
    * deadline bounds how long a PARTIAL funnel's state stays useful —
    * a deployment pairs this with a state TTL of W₁+W₂. */
  class FunnelProcessor(clickWithinNs: Long = Long.MaxValue,
      purchaseWithinNs: Long = Long.MaxValue)
      extends StatefulProcessor[Long, FEv, StepHit] {
    @transient private var state:
      org.apache.spark.sql.streaming.ValueState[FunnelState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[FunnelState]("funnel",
        Encoders.product[FunnelState], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[FEv],
        timerValues: TimerValues): Iterator[StepHit] = {
      val (hits, st) = foldBatch(user,
        rows.toSeq.sortBy(_.ts_ns).map(e => (e.event_type, e.ts_ns)),
        if (state.exists()) state.get()
        else FunnelState(Unset, Unset, Unset),
        clickWithinNs, purchaseWithinNs)
      state.update(st)
      hits.iterator
    }
  }

  /** Append-mode step-hit stream: one row per (user, closed step);
    * optional conversion deadlines (op207 — defaults unbounded/op199). */
  def stepHits(events: Dataset[FEv],
      clickWithinNs: Long = Long.MaxValue,
      purchaseWithinNs: Long = Long.MaxValue): Dataset[StepHit] = {
    implicit val outEnc = Encoders.product[StepHit]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(
        new FunnelProcessor(clickWithinNs, purchaseWithinNs),
        TimeMode.None(), OutputMode.Append())
  }
}
