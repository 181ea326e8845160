package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused Kirsch-Mitzenmacher minhash signatures over token trigrams:
  * for each 3-gram `"w1 w2 w3"` of the input token array, h =
  * md5-60(trigram) (the first 15 hex chars of the md5 digest parsed
  * base-16 — exactly `conv(substring(md5(s),1,15),16,10)`), split into
  * 30-bit halves (h1, h2); output sig_i = min over trigrams of
  * (h1·(2i+1) + h2) mod 2³¹ for i in [0, k) as ARRAY<BIGINT>.
  *
  * Equals the builtin spelling
  * `transform(hs, h -> ((h % 2^30)·(2i+1) + (h >> 30) % 2^30) % 2^31)`
  * over `hs = transform(trigrams, s -> md5Hash60(s))` bit-for-bit
  * (DedupSpec pins it), but that spelling pays the higher-order-
  * function tax per ELEMENT — each shingle materializes a trigram
  * string, an md5 hex STRING, a substring and a base-16 conv, all
  * interpreted. This is one per-row dispatch around a tight loop that
  * md5s the raw trigram bytes and folds the k mins in place — the
  * per-arrival signature cost of the streaming near-dup path (op132),
  * where no explode+groupBy spelling is available (a stream cannot
  * aggregate statelessly).
  *
  * Docs under 3 tokens yield an EMPTY array (no shingles — the same
  * guard TextOps.trigramsOfTokens documents); callers filter those out
  * exactly as the batch path drops docs with no shingle-index rows.
  * A single byte scratch per call, no instance-level mutable state
  * (expression instances may be shared across local-mode tasks).
  */
case class TrigramKmSigs(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  require(k >= 1 && k <= 64, s"k=$k out of range")

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
    val sigs = new Array[Long](k)
    java.util.Arrays.fill(sigs, Long.MaxValue)
    val md = TrigramKmSigs.md5.get()
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
      // first 15 hex chars == big-endian first 8 bytes >>> 4 (60 bits)
      val h = ((d(0) & 0xffL) << 56 | (d(1) & 0xffL) << 48 |
        (d(2) & 0xffL) << 40 | (d(3) & 0xffL) << 32 |
        (d(4) & 0xffL) << 24 | (d(5) & 0xffL) << 16 |
        (d(6) & 0xffL) << 8 | (d(7) & 0xffL)) >>> 4
      val h1 = h & 0x3fffffffL          // h % 2^30
      val h2 = (h >>> 30) & 0x3fffffffL // (h >> 30) % 2^30 (h is 60-bit)
      var s = 0
      while (s < k) {
        val v = (h1 * (2 * s + 1) + h2) & 0x7fffffffL // mod 2^31 (non-neg)
        if (v < sigs(s)) sigs(s) = v
        s += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(newChild: Expression): TrigramKmSigs =
    copy(child = newChild)
}

object TrigramKmSigs {
  private val md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
  /** Shared thread-local digest (also used by [[TrigramMd5s]]). */
  private[expressions] def md5Digest(): java.security.MessageDigest = md5.get()
}
