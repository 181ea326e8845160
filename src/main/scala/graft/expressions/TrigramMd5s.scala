package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused trigram md5-60 hashing: for each token 3-gram `"w1 w2 w3"` of
  * the input token array, the first 15 hex chars of the md5 digest
  * parsed base-16 — exactly `conv(substring(md5(s),1,15),16,10)` —
  * emitted directly as ARRAY<BIGINT>, positionally matching the
  * trigram order.
  *
  * [[TrigramHash64]]'s md5 sibling and [[TrigramKmSigs]]'s
  * keep-every-hash variant: consumers that EXPLODE trigrams and join
  * on the shared md5-60 key (the decontamination family) pay the
  * builtin spelling twice per shingle — the trigram string is built by
  * an interpreted per-element lambda, then md5'd through a hex string,
  * a substring and a base-16 conv. This is one per-row dispatch around
  * a tight loop over raw bytes; DedupSpec pins bit-equality with the
  * builtin spelling. Docs under 3 tokens yield an empty array. */
case class TrigramMd5s(child: Expression)
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
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      toks(i) = if (t == null) Array.emptyByteArray else t.getBytes
      i += 1
    }
    var maxLen = 0
    i = 0
    while (i < n - 2) {
      val need = toks(i).length + toks(i + 1).length + toks(i + 2).length + 2
      if (need > maxLen) maxLen = need
      i += 1
    }
    val scratch = new Array[Byte](maxLen)
    val out = new Array[Long](n - 2)
    val md = TrigramKmSigs.md5Digest()
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
      md.reset()
      md.update(scratch, 0, p)
      val d = md.digest()
      out(i) = ((d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
        (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
        (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)) >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramMd5s =
    copy(child = newChild)
}
