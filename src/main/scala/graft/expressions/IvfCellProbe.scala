package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row IVF probe-cell choice with the centroid table embedded as
  * PLAIN EXPRESSION DATA (not literal children): returns the nProbe
  * cent_ids whose centroids score best against the query vector,
  * ordered (cos_bp desc, cent_id asc) — the batch probe's exact
  * tiebreak.
  *
  * Why not the literal-array spelling (16 struct literals × 64-long
  * vectors + a cosine tree each): a streaming micro-batch re-analyzes
  * and re-optimizes its plan EVERY trigger, and that ~500-node tree
  * measured ~0.1-0.2 s of pure per-batch planning overhead at serving
  * cadence (r11 anatomy: `cells_count` 0.45 s vs the 0.34 s stateful
  * floor). This expression is ~3 plan nodes; the centroids ride in the
  * JVM object, sized nCells·dim longs — index METADATA, the same bytes
  * the literal spelling shipped per batch.
  *
  * Scoring is bit-identical to
  * [[graft.functions.Similarity.cosBpFrom]]∘intDot (same operand
  * order, same Math.sqrt/floor, same zero-norm guard). Centroids use
  * IndexedSeq (not Array) so case-class equality stays structural. */
case class IvfCellProbe(qVec: Expression, qN2: Expression,
    cents: IndexedSeq[(Long, IndexedSeq[Long], Long)], nProbe: Int)
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = qVec
  override def right: Expression = qN2

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (qVec.dataType, qN2.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires (array<bigint>, bigint), got " +
            s"(${qVec.dataType.simpleString}, ${qN2.dataType.simpleString})")
    }

  // flattened once per executor/JVM instance, not per row
  @transient private lazy val centIds: Array[Long] =
    cents.map(_._1).toArray
  @transient private lazy val centVecs: Array[Array[Long]] =
    cents.map(_._2.toArray).toArray
  @transient private lazy val centN2s: Array[Long] =
    cents.map(_._3).toArray

  override def nullSafeEval(qVecV: Any, qN2V: Any): Any = {
    val qv = qVecV.asInstanceOf[ArrayData]
    val qn2 = qN2V.asInstanceOf[Long]
    val dim = qv.numElements()
    val q = new Array[Long](dim)
    var i = 0
    while (i < dim) { q(i) = qv.getLong(i); i += 1 }
    val qSqrt = math.sqrt(qn2.toDouble)
    val n = centIds.length
    val bps = new Array[Long](n)
    var c = 0
    while (c < n) {
      val cv = centVecs(c)
      if (cv.length != dim)
        throw new IllegalArgumentException(
          s"graft_cell_probe: dimension mismatch ($dim vs ${cv.length})")
      var dot = 0L
      var d = 0
      while (d < dim) { dot += q(d) * cv(d); d += 1 }
      bps(c) =
        if (qn2 == 0L || centN2s(c) == 0L) 0L
        else math.floor(
          dot.toDouble / (qSqrt * math.sqrt(centN2s(c).toDouble)) * 10000d)
          .toLong
      c += 1
    }
    val idx = Array.range(0, n).sortWith { (a, b) =>
      bps(a) > bps(b) || (bps(a) == bps(b) && centIds(a) < centIds(b))
    }
    val kept = math.min(nProbe, n)
    val out = new Array[Long](kept)
    i = 0
    while (i < kept) { out(i) = centIds(idx(i)); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): IvfCellProbe =
    copy(qVec = newLeft, qN2 = newRight)
}
