package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 3986 §2.3 normalization step: decode percent-escapes of the
  * UNRESERVED characters (ALPHA / DIGIT / "-" / "." / "_" / "~") and
  * nothing else — `%41` → `A`, `%7e`/`%7E` → `~`, while `%2F` (`/`),
  * `%3F` (`?`) and every other reserved or non-ASCII escape stay
  * byte-for-byte. Decoding unreserved escapes never changes a URL's
  * meaning, so producers that differ only in spelling them collapse to
  * one canonical form; decoding a RESERVED escape would change meaning
  * (an encoded `/` is not a path separator), so those are untouched —
  * which also makes the transform safe to run on the WHOLE url before
  * parsing (no decode can create a delimiter).
  *
  * One pass over the bytes, whole-stage-codegen'd via a static call —
  * the URL column feeds streaming admission plans (op315/op316) that
  * re-analyze per micro-batch, so this must be ONE plan node, not the
  * ~98-node replace fold its DuckDB oracle twin uses
  * ([[graft.functions.Urls.pctDecodeSql]] — generated from the same
  * character table; PropertySpec pins the two spellings equal).
  * Invalid escapes (`%`, `%4`, `%4g`, `%%41`) copy through verbatim;
  * on VALIDLY-ENCODED input (every `%` starts a hex triple — the RFC
  * grammar) the result is also what any sequential replace order
  * produces, and the transform is idempotent (property-tested). */
case class PctDecodeUnreserved(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_pct_decode_unreserved"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires string, got ${other.simpleString}")
    }

  override def nullSafeEval(input: Any): Any =
    PctDecodeUnreserved.decode(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.expressions.PctDecodeUnreserved.decode($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : PctDecodeUnreserved = copy(child = newChild)
}

object PctDecodeUnreserved {

  /** The unreserved set, RFC 3986 §2.3. */
  def isUnreserved(b: Int): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z') ||
      (b >= '0' && b <= '9') ||
      b == '-' || b == '.' || b == '_' || b == '~'

  private def hexVal(b: Byte): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else -1

  /** Single pass: `%XY` with hex X,Y decoding to an unreserved byte is
    * replaced; anything else (including reserved and invalid escapes)
    * copies verbatim with the scan advancing ONE byte — equivalent on
    * valid encodings to the sequential replace chain (two valid
    * triples cannot overlap: an escape's 2nd/3rd bytes are hex digits,
    * never `%`), and deterministic on invalid ones. */
  def decode(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    val n = bytes.length
    var i = 0
    var changed = false
    // first scan: exact output size (avoids a copy when nothing decodes)
    var outLen = 0
    while (i < n) {
      if (bytes(i) == '%' && i + 2 < n) {
        val h = hexVal(bytes(i + 1)); val l = hexVal(bytes(i + 2))
        if (h >= 0 && l >= 0 && isUnreserved((h << 4) | l)) {
          changed = true; outLen += 1; i += 3
        } else { outLen += 1; i += 1 }
      } else { outLen += 1; i += 1 }
    }
    if (!changed) return s
    val out = new Array[Byte](outLen)
    var o = 0
    i = 0
    while (i < n) {
      if (bytes(i) == '%' && i + 2 < n) {
        val h = hexVal(bytes(i + 1)); val l = hexVal(bytes(i + 2))
        if (h >= 0 && l >= 0 && isUnreserved((h << 4) | l)) {
          out(o) = ((h << 4) | l).toByte; o += 1; i += 3
        } else { out(o) = bytes(i); o += 1; i += 1 }
      } else { out(o) = bytes(i); o += 1; i += 1 }
    }
    UTF8String.fromBytes(out)
  }
}
