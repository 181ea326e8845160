package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Scored candidate: (score desc, id asc) ordering. */
case class Scored(score: Long, id: Long)

/** Bounded top-k aggregate: keeps the k best (score desc, id asc) pairs
  * in the aggregation buffer.
  *
  * Scale rationale: the window-function spelling
  * (`row_number() OVER (PARTITION BY q ORDER BY score DESC)` then
  * `rank <= k`) shuffles EVERY scored row to the window sort; this
  * aggregate trims to k inside the map-side partial, so the shuffle moves
  * at most k rows per (query, input-partition) — the difference between
  * shuffling N·Q rows and k·partitions rows on a 100 TB corpus scan.
  * The same pattern (TypedImperativeAggregate at the expression level)
  * is how native engines implement ORDER BY … LIMIT k per group.
  */
class TopKAgg(k: Int, distinctIds: Boolean = false)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  private def better(a: Scored, b: Scored): Boolean =
    a.score > b.score || (a.score == b.score && a.id < b.id)

  override def zero: Seq[Scored] = Vector.empty

  override def reduce(buf: Seq[Scored], x: Scored): Seq[Scored] =
    if (distinctIds && buf.exists(_.id == x.id)) {
      // one slot per id: keep the better occurrence (for deterministic
      // scoring — LSH candidates arriving once per colliding table —
      // the scores are identical and this is a pure dedup)
      val i = buf.indexWhere(_.id == x.id)
      if (better(x, buf(i))) insert(buf.patch(i, Nil, 1), x) else buf
    } else if (buf.size < k) insert(buf, x)
    else if (better(x, buf.last)) insert(buf.dropRight(1), x)
    else buf

  private def insert(buf: Seq[Scored], x: Scored): Seq[Scored] = {
    val i = buf.indexWhere(e => better(x, e))
    if (i < 0) buf :+ x else (buf.take(i) :+ x) ++ buf.drop(i)
  }

  override def merge(a: Seq[Scored], b: Seq[Scored]): Seq[Scored] =
    b.foldLeft(a)(reduce)

  override def finish(buf: Seq[Scored]): Seq[Scored] = buf

  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
}

object TopKAgg {
  /** Column form usable in DataFrame groupBy: input (score, id) columns,
    * output array<struct<score,id>> of the top k. */
  def topK(k: Int)(score: Column, id: Column): Column = {
    val agg = udaf(new TopKAgg(k), Encoders.product[Scored])
    agg(score, id)
  }

  /** [[topK]] with one slot per id — for inputs that may carry the same
    * candidate several times (multi-table LSH collisions): equivalent to
    * dropDuplicates-then-topK when duplicates score identically, without
    * the extra stateful operator a streaming plan cannot carry.
    *
    * Contract: the dropDuplicates equivalence REQUIRES that every
    * occurrence of an id carries the same score (true for LSH collisions
    * — the score is a pure function of the pair). With differing scores
    * the semantics are best-occurrence-per-id, which is NOT what a
    * dedup-then-rank pipeline computes. Cost note: the buffer dedup is a
    * linear scan per input row — O(k) per row, fine at serving-size k
    * (≤ ~100), wrong tool for large k. */
  def topKDistinct(k: Int)(score: Column, id: Column): Column = {
    val agg = udaf(new TopKAgg(k, distinctIds = true), Encoders.product[Scored])
    agg(score, id)
  }
}
