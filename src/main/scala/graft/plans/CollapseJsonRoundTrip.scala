package graft.plans

import org.apache.spark.sql.catalyst.expressions.{CreateNamedStruct, Expression, GetStructField, If, IsNull, JsonToStructs, Literal}
import org.apache.spark.sql.catalyst.expressions.json.StructsToJsonEvaluator
import org.apache.spark.sql.catalyst.expressions.objects.Invoke
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._

/** Optimizer rule: collapse `from_json(to_json(struct))` to the struct.
  *
  * Composed pipelines that serialize an intermediate payload a downstream
  * stage immediately parses (the STEDI chain wraps customer records in a
  * JSON envelope; the fixture-synthesis twin builds the same wire format
  * from parquet columns) produce `JsonToStructs(StructsToJson(x))` pairs
  * once the stages fuse into one plan. Spark's own `OptimizeJsonExprs`
  * targets exactly this pair — but since `StructsToJson` became
  * `RuntimeReplaceable` (delegating to
  * `Invoke(StructsToJsonEvaluator, "evaluate", …)`), the runtime-replaced
  * spelling that actually reaches the operator-optimization batch no
  * longer matches it. This rule restores the collapse for that spelling.
  *
  * Soundness: fires only when (a) both sides carry no options, (b) the
  * timezones agree, (c) the parse schema equals the struct's type
  * (names, order, types; nullability relaxed), and (d) every leaf type
  * round-trips JSON text value-exactly — strings, booleans, and exact
  * integers. Float/double/decimal/temporal/binary leaves are excluded:
  * their formatting is engine- and option-sensitive, so eliminating the
  * round-trip could change bytes. Under those conditions
  * to_json∘from_json is the identity including nulls (null struct →
  * null json → null struct; null field → omitted key → null field).
  *
  * Together with `SimplifyExtractValueOps` (extract-of-literal-struct)
  * and [[EliminateBase64RoundTrip]] — all in the same fixed-point batch —
  * this folds the flagship's entire synthesize→encode→decode dim side
  * into plain column expressions.
  */
object CollapseJsonRoundTrip extends Rule[LogicalPlan] {

  /** Leaf types whose JSON text representation round-trips exactly. */
  private def roundTripSafe(dt: DataType): Boolean = dt match {
    case StringType | BooleanType | ByteType | ShortType | IntegerType |
        LongType => true
    case StructType(fields) => fields.forall(f => roundTripSafe(f.dataType))
    case ArrayType(et, _) => roundTripSafe(et)
    case _ => false
  }

  /** Same names/order/types, nullability relaxed (DataType.sameType is
    * private[sql]; leaves here are atomic so == suffices). */
  private def sameShape(a: DataType, b: DataType): Boolean = (a, b) match {
    case (StructType(fa), StructType(fb)) =>
      fa.length == fb.length && fa.zip(fb).forall { case (x, y) =>
        x.name == y.name && sameShape(x.dataType, y.dataType)
      }
    case (ArrayType(ea, _), ArrayType(eb, _)) => sameShape(ea, eb)
    case (x, y) => x == y
  }

  /** The serialize side in its runtime-replaced spelling:
    * Invoke(Literal(StructsToJsonEvaluator), "evaluate", [struct]). */
  private def structsToJsonChild(e: Expression,
      wantTz: Option[String]): Option[Expression] = e match {
    case inv: Invoke if inv.functionName == "evaluate" =>
      inv.targetObject match {
        case Literal(ev: StructsToJsonEvaluator, _)
            if ev.options.isEmpty && ev.timeZoneId == wantTz =>
          inv.arguments.headOption
        case _ => None
      }
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case j @ JsonToStructs(schema: StructType, options, json, tz)
          if options.isEmpty && roundTripSafe(schema) =>
        structsToJsonChild(json, tz) match {
          case Some(child) => collapse(j, schema, child)
          case None => j
        }
    }

  /** Exact-shape parse → the struct itself. Pruned parse (Spark's JSON
    * schema pruning narrows the from_json schema to the fields actually
    * consumed) → a named-struct projection of the matching fields, in
    * schema order; JSON parse looks fields up by name, so extraction is
    * equivalent. A nullable source struct needs the null passed through
    * explicitly (from_json of null is null, but a CreateNamedStruct of
    * nulls is not). */
  private def collapse(orig: JsonToStructs, schema: StructType,
      child: Expression): Expression = child.dataType match {
    case ct: StructType if sameShape(ct, schema) => child
    case ct: StructType =>
      val idx = ct.fieldNames.zipWithIndex.toMap
      val allMatch = schema.fields.forall(f =>
        idx.get(f.name).exists(i => sameShape(ct.fields(i).dataType, f.dataType)))
      if (!allMatch) orig
      else {
        val pruned = CreateNamedStruct(schema.fields.toSeq.flatMap(f =>
          Seq(Literal(f.name), GetStructField(child, idx(f.name), Some(f.name)))))
        if (child.nullable)
          If(IsNull(child), Literal(null, pruned.dataType), pruned)
        else pruned
      }
    case _ => orig
  }
}
