package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the most recent right
  * row with rightTime ≤ leftTime within the same key — the lookup pattern
  * behind feature stores and slowly-changing-dimension reads.
  *
  * Spark has no native as-of join; the naive spelling (non-equi range
  * join + max) is a quadratic nested-loop. This implementation uses the
  * union trick: tag both sides, sort within key by (time, side) with the
  * right side first on ties (inclusive ≤ semantics), and carry the last
  * non-null right payload forward with last_value IGNORE NULLS. Cost is
  * ONE shuffle on the key + a per-partition sort — the same plan shape as
  * any window aggregate, scan-linear at 100 TB.
  */
object AsOf {

  /** @param left      rows to enrich; must contain `key` and `time`
    * @param right     lookup side; must contain `key`, `time`, and `payload`
    * @param key       equi-join key column name (both sides)
    * @param time      event-time column name (both sides, same type)
    * @param payload   right-side columns to carry (emitted as asof_<name>)
    */
  def join(left: DataFrame, right: DataFrame, key: String, time: String,
      payload: Seq[String]): DataFrame = {
    val leftCols = left.columns.toIndexedSeq
    // payloads travel inside ONE struct that is null exactly for left-side
    // rows: last(ignoreNulls) then skips left rows but still honors a
    // right row whose payload FIELDS are null (a bare-column carry would
    // walk past it to an older non-null value — wrong asof semantics)
    val l = left
      .withColumn("__side", lit(1))
      .withColumn("__r", lit(null).cast(
        org.apache.spark.sql.types.StructType(payload.map(p =>
          org.apache.spark.sql.types.StructField(p, right.schema(p).dataType)))))
      .select(leftCols.map(col) :+ col("__side") :+ col("__r"): _*)
    val r = right
      .withColumn("__side", lit(0))
      .withColumn("__r", struct(payload.map(col): _*))
      .select((leftCols.map(c =>
          if (c == key || c == time) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__side")) :+ col("__r"): _*)
    // right rows sort before left rows on equal timestamps → inclusive ≤.
    // __r as the final key totally orders right rows that tie on
    // (key, time), so the carried payload is deterministic across runs
    // (struct ordering requires orderable payload fields — true for the
    // atomic/array types a lookup side carries; not maps)
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"), col("__r"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__asof.$p").as(s"asof_$p")): _*)
  }
}
