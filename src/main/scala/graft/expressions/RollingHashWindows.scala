package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Rabin–Karp rolling hashes of every length-`win` character window of a
  * string: element i fingerprints chars [i, i+win) as TWO independent
  * polynomial hashes (bases/moduli in [[RollingHashWindows]]) packed into
  * one long (`h1 * Mod2 + h2`). A single ~30-bit modulus birthday-collides
  * already at ~10⁵ windows (observed: one false dup pair at sf0.01); the
  * packed pair puts a collision at ~2⁻⁶⁰ per pair — the same accepted
  * trade as the repo's xxhash64 keys. Strings shorter than `win` yield an
  * empty array.
  *
  * This is THE scalable spelling of stride-1 substring fingerprinting:
  * one O(n) pass per document emitting an 8-byte key per position,
  * versus O(n·win) work and win-byte keys for the
  * `transform(sequence(...), i -> substring(...))` built-in spelling —
  * at corpus scale the shuffle moves fixed-width longs, never window
  * text. Windows are defined over UTF-16 chars, matching SQL
  * `substring` positions for BMP text (the fixtures are ASCII; the
  * string-keyed oracle cross-checks hash injectivity at test scale).
  */
case class RollingHashWindows(child: Expression, win: Int)
    extends UnaryExpression with CodegenFallback {

  require(win >= 2, "window must be at least 2 chars")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = s.length
    if (n < win) return new GenericArrayData(Array.emptyLongArray)
    import RollingHashWindows.{Base1, Mod1, Base2, Mod2}
    // B^(win-1) mod P, for rolling the leading char out
    var pow1 = 1L; var pow2 = 1L
    var k = 1
    while (k < win) { pow1 = pow1 * Base1 % Mod1; pow2 = pow2 * Base2 % Mod2; k += 1 }
    val out = new Array[Long](n - win + 1)
    var h1 = 0L; var h2 = 0L
    var i = 0
    while (i < win) {
      val c = s.charAt(i)
      h1 = (h1 * Base1 + c) % Mod1; h2 = (h2 * Base2 + c) % Mod2
      i += 1
    }
    out(0) = h1 * Mod2 + h2
    i = 1
    while (i <= n - win) {
      // drop char i-1 (weight B^(win-1)), shift, add char i+win-1; all
      // products stay under 2^63: (Mod-1)*Base < 4e10, char*pow < 7e13,
      // and the packed h1*Mod2 + h2 < 1e9 * 1e9 + 1e9 < 2^63
      val cOut = s.charAt(i - 1)
      val cIn = s.charAt(i + win - 1)
      h1 = (h1 - cOut * pow1 % Mod1 + Mod1) % Mod1
      h1 = (h1 * Base1 + cIn) % Mod1
      h2 = (h2 - cOut * pow2 % Mod2 + Mod2) % Mod2
      h2 = (h2 * Base2 + cIn) % Mod2
      out(i) = h1 * Mod2 + h2
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): RollingHashWindows =
    copy(child = newChild)
}

object RollingHashWindows {
  /** First leg: the TextOps.rollingHash family (base 31, prime 1e9+7). */
  val Base1 = 31L
  val Mod1 = 1000000007L
  /** Second, independent leg (packing needs h1 * Mod2 + h2 < 2^63). */
  val Base2 = 131L
  val Mod2 = 998244353L
}
