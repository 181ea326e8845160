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
    val leftCols = left.columns
    val l = left
      .withColumn("__side", lit(1))
      .select((leftCols.map(col) :+ col("__side")) ++
        payload.map(p => lit(null).cast(right.schema(p).dataType)
          .as(s"__p_$p")): _*)
    val r = right
      .withColumn("__side", lit(0))
      .select((leftCols.map(c =>
          if (c == key || c == time) col(c)
          else lit(null).cast(left.schema(c).dataType).as(c))
        :+ col("__side")) ++
        payload.map(p => col(p).as(s"__p_$p")): _*)
    // right rows sort before left rows on equal timestamps → inclusive ≤
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .select(col("*") +: payload.map(p =>
        last(col(s"__p_$p"), ignoreNulls = true).over(w).as(s"asof_$p")): _*)
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++ payload.map(p => col(s"asof_$p")): _*)
  }
}
