package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** One change-stream record: the (ts_us, event_id) pair is the unique
  * total order; the rest is the payload the compacted state carries. */
case class ChangeRec(ts_us: Long, event_id: Long, event_type: String,
    value_cents: Long)

/** Running latest-state buffer: change count + the current best record.
  * `ts_us = Long.MinValue` marks the empty buffer (no record absorbed
  * yet) — every real record replaces it. */
case class LatestBuf(n: Long, ts_us: Long, event_id: Long,
    event_type: String, value_cents: Long)

/** Latest-record-per-key aggregate (changelog compaction, op106).
  *
  * Why not the built-in `max_by(struct(payload), struct(ts, id))`:
  * a DeclarativeAggregate with a STRUCT buffer cannot use the
  * fixed-width UnsafeRow hash buffer, so Spark plans it as a
  * SortAggregate — the partial side SORTS every input partition by the
  * grouping key before aggregating. This TypedImperativeAggregate
  * (same mechanism as [[TopKAgg]]) runs under ObjectHashAggregate:
  * hash-based, no input sort, map-side partials still ship ONE buffer
  * row per key per partition. On a 100 TB changelog that is the
  * difference between hashing the scan and sorting it. Caveat: past
  * `spark.sql.objectHashAggregate.sortBased.fallbackThreshold` distinct
  * keys per task (default 128) the operator falls back to sort-based
  * aggregation mid-task — a high-cardinality deployment raises the
  * threshold in the session conf; the fold result is pinned identical
  * through the fallback in PropertySpec (threshold forced to 2).
  *
  * Determinism: the (ts_us, event_id) order is unique and total, so the
  * fold result is independent of arrival and merge order; the change
  * count is commutative. Equivalence with the max_by spelling is
  * spec'd.
  */
class LatestAgg extends Aggregator[ChangeRec, LatestBuf, LatestBuf] {
  override def zero: LatestBuf = LatestBuf(0L, Long.MinValue, 0L, null, 0L)

  private def laterThan(ts: Long, id: Long, b: LatestBuf): Boolean =
    ts > b.ts_us || (ts == b.ts_us && id > b.event_id)

  override def reduce(b: LatestBuf, x: ChangeRec): LatestBuf =
    if (laterThan(x.ts_us, x.event_id, b))
      LatestBuf(b.n + 1, x.ts_us, x.event_id, x.event_type, x.value_cents)
    else b.copy(n = b.n + 1)

  override def merge(a: LatestBuf, b: LatestBuf): LatestBuf = {
    val best = if (laterThan(b.ts_us, b.event_id, a)) b else a
    best.copy(n = a.n + b.n)
  }

  override def finish(buf: LatestBuf): LatestBuf = buf

  override def bufferEncoder: Encoder[LatestBuf] = Encoders.product[LatestBuf]
  override def outputEncoder: Encoder[LatestBuf] = Encoders.product[LatestBuf]
}

object LatestAgg {
  /** Column form: input (ts_us, event_id, event_type, value_cents),
    * output struct<n, ts_us, event_id, event_type, value_cents> of the
    * latest record plus the change count. */
  def latest(tsUs: Column, eventId: Column, eventType: Column,
      valueCents: Column): Column = {
    val agg = udaf(new LatestAgg, Encoders.product[ChangeRec])
    agg(tsUs, eventId, eventType, valueCents)
  }
}
