package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Mode result: the winning value, its vote count, and the group's
  * total vote count. */
case class ModeOut(value: Long, votes: Long, total: Long)

/** Deterministic mode (majority vote) over BIGINT values: the most
  * frequent value per group, ties to the SMALLEST value — the
  * classification aggregate a serving layer needs when a group's label
  * is decided by voting members (op302's basket → community vote).
  *
  * Scale rationale: the window spelling (count per (group, value),
  * then a second ranking pass) needs TWO aggregations — one more than
  * a streaming plan may carry; this aggregate folds the vote map
  * map-side in one pass, so the shuffle moves one (value → count)
  * map per (group, partition). State is bounded by the group's
  * DISTINCT-value count — the right tool for low-cardinality votes
  * (a basket's ≤ cap communities), the wrong one for groups with
  * millions of distinct values. */
class ModeAgg extends Aggregator[Long, Map[Long, Long], Option[ModeOut]] {
  override def zero: Map[Long, Long] = Map.empty

  override def reduce(m: Map[Long, Long], x: Long): Map[Long, Long] =
    m.updated(x, m.getOrElse(x, 0L) + 1L)

  override def merge(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[Long, Long]): Option[ModeOut] =
    // the zero buffer CAN reach finish (a global aggregation over an
    // empty frame, or an engine path that finalizes an untouched
    // buffer) — emit SQL NULL (None under the nullable-struct
    // encoder) rather than crash the job; groupBy paths (≥1 row per
    // group) never see it
    if (m.isEmpty) None
    else {
      val (value, votes) = m.minBy { case (k, v) => (-v, k) }
      Some(ModeOut(value, votes, m.values.sum))
    }

  override def bufferEncoder: Encoder[Map[Long, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[Long, Long]]()
  override def outputEncoder: Encoder[Option[ModeOut]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Option[ModeOut]]()
}

object ModeAgg {
  /** Column form for DataFrame groupBy: input a BIGINT column, output
    * struct<value, votes, total>. */
  def mode(value: Column): Column =
    udaf(new ModeAgg, Encoders.scalaLong)(value)
}
