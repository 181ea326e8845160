package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, LongType}

/** All-tables sign-LSH bucket computation in one pass: for each of
  * `nTables` hash tables, project the float vector onto `nBits`
  * hyperplanes and pack the sign bits into a bucket id. Returns
  * ARRAY<BIGINT> of length nTables.
  *
  * The builtin spelling (per-bit aggregate over sequence + element_at of
  * literal nested arrays) interprets ~tables×bits×dim lambda steps per
  * row; this expression is three tight primitive loops (plain Scala,
  * CodegenFallback — the loop body dominates, not the per-row dispatch).
  *
  * planes(t)(b)(i) = weight of dimension i for bit b of table t, generated
  * deterministically (md5-seeded) by Similarity.hyperplanes.
  *
  * Arithmetic is EXACT INTEGER: both the vector components and the plane
  * weights quantize to floor(x·10⁶) longs, and the sign comes from the
  * long dot product. Integer sums are associative and engine-independent,
  * so the bucket of a vector is reproducible anywhere — including the
  * DuckDB oracle, which replays the same quantized planes as literals
  * (a float dot could flip a near-zero sign between engines). Magnitudes:
  * |w|,|x| ≤ ~10⁷ ⇒ |dot| ≤ 64·10¹⁴ ≪ 2⁶³.
  *
  * planes is a Seq (value equality), not Array (reference equality): case
  * class equals/hashCode drive expression canonicalization, and two
  * semantically identical SignLshBuckets must compare equal for
  * common-subexpression elimination to deduplicate them.
  */
case class SignLshBuckets(child: Expression, planes: Seq[Seq[Seq[Double]]])
    extends UnaryExpression with CodegenFallback {

  @transient private lazy val planeArr: Array[Array[Array[Long]]] =
    planes.map(_.map(_.map(w =>
      math.floor(w * 1000000d).toLong).toArray).toArray).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<float>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val vec = input.asInstanceOf[ArrayData]
    val dim = vec.numElements()
    val xs = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      xs(i) = math.floor(vec.getFloat(i).toDouble * 1000000d).toLong
      i += 1
    }
    val out = new Array[Long](planeArr.length)
    var t = 0
    while (t < planeArr.length) {
      val table = planeArr(t)
      var bucket = 0L
      var b = 0
      while (b < table.length) {
        val w = table(b)
        val n = math.min(dim, w.length)
        var dot = 0L
        var j = 0
        while (j < n) { dot += w(j) * xs(j); j += 1 }
        if (dot >= 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): SignLshBuckets =
    copy(child = newChild)
}
