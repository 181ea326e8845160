package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData

/** Primitive bounded-insertion top-k for the streaming shard
  * expressions: maintains the k best (score desc, id asc) candidates in
  * two long arrays, rejecting a worse-than-kth candidate with one
  * compare. Replaces the collect-all-then-`Array.range(0, m).sortWith`
  * tail SqShardTopK/PqShardTopK shipped with — that spelling allocated
  * three candidate-count-sized arrays per QUERY ROW per micro-batch and
  * boxed every Int through the sort comparator, the same allocation tax
  * the GraphBeamTopK primitive rewrite removed (r12 verdict item 7).
  * Candidate volume per row is |corpus|·nProbe/nCells (thousands at the
  * bench shape) where k is 5 — selection is O(m) with an O(1) reject on
  * the common path, and the kept order is EXACTLY the order the full
  * sort produced, so emitted rows are bit-identical. */
private[expressions] final class BoundedTopK(k: Int) {
  private val scores = new Array[Long](k)
  private val ids = new Array[Long](k)
  private var n = 0

  @inline private def better(s1: Long, i1: Long, s2: Long, i2: Long)
      : Boolean = s1 > s2 || (s1 == s2 && i1 < i2)

  def offer(score: Long, id: Long): Unit = {
    if (k <= 0) return // k=0 is "no results wanted", not a crash
    if (n == k && !better(score, id, scores(k - 1), ids(k - 1))) return
    var pos = if (n < k) n else k - 1
    while (pos > 0 && better(score, id, scores(pos - 1), ids(pos - 1))) {
      scores(pos) = scores(pos - 1); ids(pos) = ids(pos - 1); pos -= 1
    }
    scores(pos) = score; ids(pos) = id
    if (n < k) n += 1
  }

  /** The kept entries as array<struct<score, id>> in (score desc,
    * id asc) order — the shard expressions' output layout. */
  def toArrayData: GenericArrayData = {
    val out = new Array[Any](n)
    var i = 0
    while (i < n) { out(i) = InternalRow(scores(i), ids(i)); i += 1 }
    new GenericArrayData(out)
  }
}
