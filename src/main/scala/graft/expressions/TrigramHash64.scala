package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused trigram hashing: xxhash64 (seed 42, Spark's default) of every
  * token 3-gram `"w1 w2 w3"`, emitted directly as ARRAY<BIGINT>.
  *
  * Equals `transform(trigrams, s -> xxhash64(s))` bit-for-bit (same
  * bytes hashed: tokens joined by 0x20), but the builtin spelling pays
  * the higher-order-function tax — Spark's array lambdas are
  * interpreted per ELEMENT, and each element first materializes the
  * concatenated trigram string just to hash and discard it. This
  * expression is one per-row dispatch around a tight loop that reuses
  * a single byte scratch (allocated per call — expression instances
  * may be shared across local-mode tasks, so no instance-level
  * mutable state).
  *
  * Docs under 3 tokens yield an empty array (the same guard
  * TextOps.trigramsOfTokens documents).
  */
case class TrigramHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires array<string>, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    // token bytes gathered once; null tokens hash as empty (matching
    // concat_ws, which renders null elements as empty in a 3-slot join)
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    val out = new Array[Long](n - 2)
    var maxLen = 0
    i = 0
    while (i < n - 2) {
      val need = toks(i).length + toks(i + 1).length + toks(i + 2).length + 2
      if (need > maxLen) maxLen = need
      i += 1
    }
    val scratch = new Array[Byte](maxLen)
    i = 0
    while (i < n - 2) {
      var p = 0
      var j = i
      while (j <= i + 2) {
        val b = toks(j)
        System.arraycopy(b, 0, scratch, p, b.length)
        p += b.length
        if (j < i + 2) { scratch(p) = ' '; p += 1 }
        j += 1
      }
      out(i) = XXH64.hashUnsafeBytes(scratch,
        org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, p, 42L)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramHash64 =
    copy(child = newChild)
}
