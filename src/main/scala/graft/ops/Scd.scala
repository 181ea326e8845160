package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history compaction: turn an append
  * event log into per-key validity intervals, opening a new version only
  * when the tracked attribute actually changes. The lakehouse twin of the
  * changelog compaction family (op106/108/122 keep only the LATEST state;
  * this keeps the full change history with [from, to) bounds).
  *
  * Scale: one hash shuffle on the dimension key. Change detection (lag),
  * versioning (row_number) and interval close-out (lead) are three window
  * functions over the SAME partitioning and ordering, so Catalyst plans
  * them over a single Exchange + Sort — no second shuffle, no join. State
  * per key is the key's event history slice, the same bound any windowed
  * dimension build has.
  */
object Scd {

  /** SCD2 intervals for `valueCol` tracked per `keyCols`, ordered by
    * (`timeCol`, `tieCol`) — `tieCol` must make the order total. Emits
    * (keyCols*, ver, value, valid_from, valid_to, is_current) where
    * `valid_to` is the next version's `valid_from` and -1 (open) on the
    * current version. Consecutive duplicate values collapse into the
    * earlier version (no-change updates do not open versions). */
  def history(events: DataFrame, keyCols: Seq[String], timeCol: String,
      tieCol: String, valueCol: Column): DataFrame = {
    val keys = keyCols.map(col)
    val w = Window.partitionBy(keys: _*).orderBy(col(timeCol), col(tieCol))
    val changed = events
      .select(keys :+ col(timeCol) :+ col(tieCol) :+ valueCol.as("value"): _*)
      .withColumn("__prev", lag(col("value"), 1).over(w))
      .withColumn("__rn", row_number().over(w))
      // the first row per key always opens; after that NULL values
      // compare null-safely, so NULL->NULL does not reopen a version
      .filter(col("__rn") === 1 || !(col("__prev") <=> col("value")))
    changed
      .withColumn("ver", row_number().over(w).cast("bigint"))
      .withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", coalesce(lead(col(timeCol), 1).over(w), lit(-1L)))
      .withColumn("is_current", (col("valid_to") === -1L).cast("bigint"))
      .select(keys :+ col("ver") :+ col("value") :+ col("valid_from") :+
        col("valid_to") :+ col("is_current"): _*)
  }
}
