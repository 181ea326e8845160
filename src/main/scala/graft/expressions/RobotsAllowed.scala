package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression,
  Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}

/** Google-style robots verdict as a scalar over (domain, path): the
  * longest matching path-prefix rule wins, allow beats disallow on
  * equal length, and a domain with no rules — or no matching rule —
  * defaults to ALLOWED. Bit-for-bit the op311 batch decision
  * (`max(struct(prefix_length, is_allow))` + the coalesce default),
  * re-expressed for the STREAMING ingest edge: the batch spelling is a
  * rules join + aggregate, and an aggregate upstream of the admission
  * controller's transformWithState is exactly what an append-mode
  * stream can't run — while robots rules are per-domain METADATA
  * (kilobytes per domain, the compiled matcher every crawler holds in
  * RAM), so they ride in the expression like the ANN shards do, and
  * the verdict is one map-side scan of the domain's few prefixes.
  *
  * Rules: domain → (prefix, isAllow) pairs, order irrelevant (the scan
  * tracks the lexicographic max of (length, isAllow)). */
case class RobotsAllowed(domain: Expression, path: Expression,
    rules: Map[String, Seq[(String, Boolean)]])
    extends BinaryExpression with CodegenFallback {

  override def left: Expression = domain
  override def right: Expression = path

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_robots_allowed"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (domain.dataType, path.dataType) match {
      case (_: StringType, _: StringType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"requires (string, string), got " +
            s"(${domain.dataType.simpleString}, ${path.dataType.simpleString})")
    }

  override def nullSafeEval(domainV: Any, pathV: Any): Any = {
    val rs = rules.getOrElse(domainV.toString, null)
    if (rs == null) true
    else {
      val p = pathV.toString
      var bestLen = -1
      var bestAllow = true // no matching rule ⇒ allowed
      val it = rs.iterator
      while (it.hasNext) {
        val (prefix, allow) = it.next()
        if (p.startsWith(prefix)) {
          val l = prefix.length
          if (l > bestLen || (l == bestLen && allow)) {
            bestLen = l; bestAllow = allow
          }
        }
      }
      bestAllow
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): RobotsAllowed =
    copy(domain = newLeft, path = newRight)
}
