package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TimeMode, TimerValues, TTLConfig}

/** Streaming session-path emission (op203): op200's trajectory mining
  * kept ONLINE — per-user state is the OPEN session (last event time +
  * the first [[graft.queries.AnalyticsQueries]] cap of its event
  * types); when an arriving event opens a gap the closed session's
  * path is emitted append-mode and a new session starts.
  *
  * CLOSED-SESSION contract (the op131 SCD2 convention): each user's
  * final session never sees a closing event — it is operator STATE,
  * not output, so the batch oracle is op200's chain RESTRICTED to
  * non-final sessions. The timer-flush alternative (EventTimeTimeout
  * at last+gap) emits those too but makes the emitted set a function
  * of the final watermark; the gap-close spelling keeps it a
  * closed-form function of the input alone, which is what a DuckDB
  * oracle needs.
  *
  * Ordering contract: same as [[FunnelStream]] — in-batch disorder
  * repaired by the per-key sort, event-time-ordered arrival across
  * batches (bounded disorder under a watermark in production).
  *
  * 100 TB shape: state is ≤ cap type strings + one long per ACTIVE
  * user — O(active users), keyed and shard-partitioned (RocksDB);
  * emission is one row per closed session. A session spanning many
  * micro-batches costs one state read/write per batch, never a
  * re-scan of its history (the path is carried, not recomputed).
  */
object SessionPathStream {
  case class PEv(user_id: Long, event_id: Long, ts_ns: Long,
      event_type: String)
  case class ClosedPath(user_id: Long, path: String)
  case class OpenSession(last_ns: Long, types: Seq[String])

  /** Fold one key's event-time-sorted slice into the open session,
    * emitting paths closed by a gap. */
  private[graft] def foldBatch(user: Long, cap: Int, gapNs: Long,
      sorted: Seq[(Long, String)], st0: Option[OpenSession])
      : (Seq[ClosedPath], Option[OpenSession]) = {
    val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedPath]
    var st = st0
    for ((t, typ) <- sorted) st match {
      case Some(s) if t - s.last_ns > gapNs =>
        closed += ClosedPath(user, s.types.mkString(">"))
        st = Some(OpenSession(t, Vector(typ)))
      case Some(s) =>
        st = Some(OpenSession(t,
          if (s.types.length < cap) s.types :+ typ else s.types))
      case None =>
        st = Some(OpenSession(t, Vector(typ)))
    }
    (closed.toSeq, st)
  }

  class PathProcessor(cap: Int, gapNs: Long)
      extends StatefulProcessor[Long, PEv, ClosedPath] {
    @transient private var open:
      org.apache.spark.sql.streaming.ValueState[OpenSession] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenSession]("open",
        Encoders.product[OpenSession], TTLConfig.NONE)

    override def handleInputRows(user: Long, rows: Iterator[PEv],
        timerValues: TimerValues): Iterator[ClosedPath] = {
      val (closed, st) = foldBatch(user, cap, gapNs,
        rows.toSeq.sortBy(e => (e.ts_ns, e.event_id))
          .map(e => (e.ts_ns, e.event_type)),
        if (open.exists()) Some(open.get()) else None)
      st.foreach(open.update)
      closed.iterator
    }
  }

  /** Append-mode closed-session path stream. */
  def closedPaths(events: Dataset[PEv], cap: Int,
      gapNs: Long): Dataset[ClosedPath] = {
    implicit val outEnc = Encoders.product[ClosedPath]
    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new PathProcessor(cap, gapNs),
        TimeMode.None(), OutputMode.Append())
  }
}
