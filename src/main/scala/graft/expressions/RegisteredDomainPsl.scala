package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression,
  UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{DataType, StringType}

/** PSL registered-domain (eTLD+1) extraction as ONE plan node: the
  * longest suffix in `suffixes` that the host ends with (the PSL
  * longest-match rule) plus one preceding label; hosts matching no
  * rule fall back to the last two labels (the PSL's implicit "*" rule
  * for unknown TLDs).
  *
  * Why an expression and not the [[graft.functions.Urls
  * .registeredDomainPsl]] when-chain: the streaming admission keyers
  * (op309/op315/op316) re-analyze their plan EVERY micro-batch, and a
  * per-rule when-chain is per-rule PLAN SIZE — at the full ~9k-rule
  * PSL that is thousands of nodes in a plan that must stay ~tens (the
  * r11 lesson that motivated IvfCellProbe). Here the rule table rides
  * in the JVM object as a hash set (kilobytes — the compiled matcher
  * every crawl stack holds in RAM), the match is O(labels) set probes
  * per row, and the batch spellings (when-chain for literal-sized
  * slices, the op317 broadcast-dim join for the full list) remain the
  * relational twins — WebSpec pins all three equal.
  *
  * Equality with the when-chain is exact including the regex edge
  * cases: a matched suffix whose preceding label is EMPTY ("x..com")
  * yields '' (the chain's `([^.]+\.suffix)$` fails its [^.]+), and the
  * fallback yields '' unless the last two labels are both non-empty
  * (`([^.]+\.[^.]+)$`). */
case class RegisteredDomainPsl(host: Expression, suffixes: Seq[String])
    extends UnaryExpression with CodegenFallback {

  override def child: Expression = host
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_registered_domain"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    host.dataType match {
      case _: StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires string, got ${other.simpleString}")
    }

  // the three PSL rule forms as three hash sets (r15: wildcard `*.t`
  // and exception `!b` join the plain rules — the real PSL grammar, so
  // a production swap to the full list carries no silent semantic gap)
  @transient private lazy val plainSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    suffixes.filterNot(r => r.startsWith("!") || r.startsWith("*."))
      .foreach(s.add)
    s
  }
  @transient private lazy val wildTailSet: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String]()
    suffixes.filter(_.startsWith("*.")).map(_.substring(2)).foreach(s.add)
    s
  }
  // exception bodies as an ORDERED array, not a set: there are a
  // handful at most (the full PSL has 8), so the scan is a few
  // zero-allocation endsWith probes per host instead of building every
  // tail string (r15 review — this expression keys the streaming
  // admission gates' hot path); the order is the when-chain's
  // precedence (most labels first), so multiple matching exceptions
  // pick the same winner in both spellings
  @transient private lazy val excBodies: Array[String] =
    suffixes.filter(_.startsWith("!")).map(_.substring(1))
      .sortBy(b => (-b.count(_ == '.'), -b.length, b)).toArray

  override def nullSafeEval(hostV: Any): Any = {
    val h = hostV.toString
    // -1 = keep trailing empty labels ("a." splits to ["a", ""]) so
    // malformed hosts take the same '' path the regex spellings take
    val labels = h.split("\\.", -1)
    val n = labels.length
    // exception rules beat everything (PSL): a host equal to or ending
    // in ".body" has registered domain = the body itself (the dot
    // prefix keeps the match label-aligned; equality covers the host
    // BEING the body)
    var e = 0
    while (e < excBodies.length) {
      val body = excBodies(e)
      if (h == body || (h.length > body.length &&
          h.charAt(h.length - body.length - 1) == '.' && h.endsWith(body)))
        return org.apache.spark.unsafe.types.UTF8String.fromString(body)
      e += 1
    }
    // longest matching public suffix = the SMALLEST i (1..n-1) whose
    // tail is a plain rule OR whose tail's first label is covered by a
    // wildcard rule on the remaining labels (the `*` label must be
    // non-empty — PSL labels are); suffixes of one host at different
    // lengths are distinct, so the first hit is the unique longest match
    var i = 1
    while (i < n) {
      val tail = labels.slice(i, n).mkString(".")
      val wildHit = i + 1 < n && labels(i).nonEmpty &&
        wildTailSet.contains(labels.slice(i + 1, n).mkString("."))
      if (plainSet.contains(tail) || wildHit) {
        val prev = labels(i - 1)
        val out = if (prev.isEmpty) "" else s"$prev.$tail"
        return org.apache.spark.unsafe.types.UTF8String.fromString(out)
      }
      i += 1
    }
    // fallback: last two labels, both non-empty, else ''
    val out =
      if (n >= 2 && labels(n - 1).nonEmpty && labels(n - 2).nonEmpty)
        s"${labels(n - 2)}.${labels(n - 1)}"
      else ""
    org.apache.spark.unsafe.types.UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression)
      : RegisteredDomainPsl = copy(host = newChild)
}
