package graft.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** A kNN-graph shard in the flat layout a graph-ANN server walks:
  * position i holds node i's quantized vector, squared norm, and
  * out-neighbor ids (node ids MUST be dense 0..N-1 — asserted at
  * load). Built once at stream construction from the persisted
  * NN-Descent index, shipped to executors as ONE broadcast value.
  *
  * The optional HNSW upper layer rides in the same shard: `upperOrig`
  * maps dense upper rank l_id → original node id (the persisted
  * `level1_map`) and `upperAdj(l_id)` holds the upper graph's
  * out-neighbors as dense l_ids. Empty arrays = no upper layer (the
  * flat-NSW serving shape). */
case class GraphShard(
    vecs: Array[Array[Long]],
    n2s: Array[Long],
    adj: Array[Array[Long]],
    upperOrig: Array[Long] = Array.empty,
    upperAdj: Array[Array[Long]] = Array.empty)

/** Whole-walk beam search for the streaming graph-ANN serving leg
  * (the NSW query path): ONE evaluation seeds the beam from the LCG
  * entry permutation, walks `hops` expansion rounds through the
  * broadcast graph, and returns the final beam's top `kOut` as
  * array<struct<cos_bp bigint, n_id bigint>> ordered
  * (cos_bp desc, n_id asc).
  *
  * Bit-identical to [[graft.functions.Similarity.graphSearch]], hop
  * for hop: entries are (qId·48271 + j·1299721) mod N for j in
  * 1..beam; every candidate is rescored with the exact integer cosine
  * (floor(10⁴·dot/(√q_n2·√n2)), zero-norm → 0 — cosBpFrom's operand
  * order); each round's candidate set is current-beam ∪ its
  * out-neighbors, deduplicated, self dropped, kept to `beam` by
  * (cos_bp desc, id asc). A scored id is memoized within the walk —
  * scores are pure, so the memo changes nothing but work.
  *
  * Why an expression: a streaming micro-batch pays per-stage planning
  * EVERY trigger, and the batch spelling is `hops`+2 join-and-rank
  * stages; here the whole walk is one map-side projection feeding the
  * single stateful TopKAgg — the same collapse that bought SqShardTopK
  * its 2× (see that scaladoc for the broadcast-shard honesty argument:
  * a graph-ANN serving node holds ITS SHARD of graph + vectors in RAM;
  * the per-query touch set is beam·(k+1) nodes per hop regardless of
  * corpus size, which is the entire point of graph ANN). */
case class GraphBeamTopK(qId: Expression, qVec: Expression,
    qN2: Expression, shard: Broadcast[GraphShard], beam: Int, hops: Int,
    kOut: Int, upperBeam: Int = 0, upperHops: Int = 0)
    extends TernaryExpression with CodegenFallback {

  override def first: Expression = qId
  override def second: Expression = qVec
  override def third: Expression = qN2

  private val entryType = StructType(Seq(
    StructField("cos_bp", LongType, nullable = false),
    StructField("n_id", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(entryType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (qId.dataType, qVec.dataType, qN2.dataType) match {
      case (LongType, ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires (bigint, array<bigint>, bigint), got " +
            s"(${qId.dataType.simpleString}, ${qVec.dataType.simpleString}, " +
            s"${qN2.dataType.simpleString})")
    }

  override def nullSafeEval(qIdV: Any, qVecV: Any, qN2V: Any): Any = {
    val s = shard.value
    val qid = qIdV.asInstanceOf[Long]
    val qv = qVecV.asInstanceOf[ArrayData]
    val qn2 = qN2V.asInstanceOf[Long]
    val n = s.vecs.length
    val dim = qv.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = qv.getLong(i); i += 1 }
    val qSqrt = math.sqrt(qn2.toDouble)
    val memo = new java.util.HashMap[Long, Long]()
    def score(id: Long): Long = {
      if (memo.containsKey(id)) return memo.get(id)
      val v = s.vecs(id.toInt)
      if (v.length != dim)
        throw new IllegalArgumentException(
          s"graft_graph_beam: dimension mismatch ($dim vs ${v.length})")
      val n2 = s.n2s(id.toInt)
      val bp =
        if (qn2 == 0L || n2 == 0L) 0L
        else {
          var dot = 0L
          var d = 0
          while (d < dim) { dot += q(d) * v(d); d += 1 }
          math.floor(
            dot.toDouble / (qSqrt * math.sqrt(n2.toDouble)) * 10000d).toLong
        }
      memo.put(id, bp)
      bp
    }
    // (cos_bp desc, id asc) keep-beam over a deduplicated candidate set
    def topBeam(cands: Array[Long]): Array[Long] = {
      val seen = new java.util.HashSet[Long]()
      val kept = cands.filter(c => c != qid && seen.add(c))
      kept.sortBy(c => (-score(c), c)).take(beam)
    }
    // entry set: the LCG permutation (flat NSW), or — when the shard
    // carries an HNSW upper layer — a short beam walk over it, seeded
    // by the LCG permutation over the DENSE upper ranks; both are
    // bit-identical to the batch spelling (Similarity.graphSearch /
    // hnswSearch). The upper walk's state is dense l_ids; scoring and
    // self-drop go through upperOrig, and the (cos_bp desc, id asc)
    // tiebreak is the same in either space because the dense re-rank
    // is monotone in original id.
    val entries: Array[Long] =
      if (upperHops <= 0 || s.upperOrig.isEmpty)
        Array.tabulate(beam)(j =>
          Math.floorMod(qid * 48271L + (j + 1) * 1299721L, n.toLong))
      else {
        val nU = s.upperOrig.length
        def topBeamUpper(cands: Array[Long]): Array[Long] = {
          val seen = new java.util.HashSet[Long]()
          val kept = cands.filter(c =>
            s.upperOrig(c.toInt) != qid && seen.add(c))
          kept.sortBy(c => (-score(s.upperOrig(c.toInt)),
            s.upperOrig(c.toInt))).take(upperBeam)
        }
        var ub = topBeamUpper(Array.tabulate(upperBeam)(j =>
          Math.floorMod(qid * 48271L + (j + 1) * 1299721L, nU.toLong)))
        var uh = 0
        while (uh < upperHops) {
          ub = topBeamUpper(ub ++ ub.flatMap(c => s.upperAdj(c.toInt)))
          uh += 1
        }
        ub.map(c => s.upperOrig(c.toInt))
      }
    var b = topBeam(entries)
    var h = 0
    while (h < hops) {
      b = topBeam(b ++ b.flatMap(c => s.adj(c.toInt)))
      h += 1
    }
    val kept = math.min(kOut, b.length)
    val out = new Array[Any](kept)
    i = 0
    while (i < kept) {
      out(i) = InternalRow(score(b(i)), b(i))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(a: Expression,
      b: Expression, c: Expression): GraphBeamTopK =
    copy(qId = a, qVec = b, qN2 = c)
}
