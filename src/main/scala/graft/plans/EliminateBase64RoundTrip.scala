package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Base64, Cast, Expression, UnBase64}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}

/** Optimizer rule: eliminate base64 encode/decode round-trips.
  *
  * Decode pipelines that re-serialize intermediate payloads (the STEDI
  * chain base64-encodes customer JSON into an envelope that a downstream
  * stage immediately decodes) produce `unbase64(base64(x))` pairs once the
  * stages are composed into one plan. The pair is the identity on binary:
  * RFC 4648 encode ∘ decode round-trips every byte sequence, so the
  * rewrite is always sound (the reverse direction,
  * `base64(unbase64(x))`, is NOT: unbase64 of a non-base64 string is
  * lossy, and canonical re-encoding can differ — deliberately not
  * rewritten).
  *
  * Handled shapes (what Decode.decodeBase64 ∘ Decode.encodeBase64 builds):
  *   unbase64(base64(b))                                  → b
  *   cast(unbase64(base64(cast(s as binary))) as string)  → s
  *
  * Register session-wide via `GraftExtensions`
  * (spark.sql.extensions=graft.plans.GraftExtensions) or per-session via
  * `spark.experimental.extraOptimizations`.
  */
object EliminateBase64RoundTrip extends Rule[LogicalPlan] {

  /** The encode side appears as `Base64` pre-analysis but is rewritten to
    * `StaticInvoke(Base64.encode, [child, chunkFlag])` by ReplaceExpressions
    * before late optimizer rules run — recognize both spellings. */
  private def base64EncodeChild(e: Expression): Option[Expression] = e match {
    case Base64(child, _) => Some(child)
    case si: org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
        if si.functionName == "encode" &&
          si.staticObject.getName.endsWith("Base64") =>
      si.arguments.headOption
    case _ => None
  }

  private def strip(e: Expression): Expression = e match {
    // cast(unbase64(base64(cast(s: string as binary))) as string) → s
    case c @ Cast(UnBase64(enc, _), StringType, _, _) =>
      base64EncodeChild(enc) match {
        case Some(Cast(s, BinaryType, _, _)) if s.dataType == StringType => s
        case _ => c.mapChildren(strip)
      }
    // unbase64(base64(b: binary)) → b
    case ub @ UnBase64(enc, _) =>
      base64EncodeChild(enc) match {
        case Some(b) if b.dataType == BinaryType => b
        case _ => ub.mapChildren(strip)
      }
    case other => other.mapChildren(strip)
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case e =>
        val s = strip(e)
        if (s fastEquals e) e else s
    }
}

/** SparkSessionExtensions entry point:
  * `--conf spark.sql.extensions=graft.plans.GraftExtensions`.
  *
  * Injected rules join the operator-optimization FIXED-POINT batch, so
  * they iterate together with Spark's SimplifyExtractValueOps /
  * CollapseProject: the JSON collapse exposes a literal-struct extract,
  * its simplification exposes a base64 pair, stripping that exposes the
  * next JSON pair — the full decode chain folds in one batch. */
class GraftExtensions extends (org.apache.spark.sql.SparkSessionExtensions => Unit) {
  override def apply(e: org.apache.spark.sql.SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => EliminateBase64RoundTrip)
    e.injectOptimizerRule(_ => CollapseJsonRoundTrip)
  }
}
