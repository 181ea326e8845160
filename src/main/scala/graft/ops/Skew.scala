package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot grouping/join keys at scale.
  *
  * A single hot key (one power user, one ubiquitous shingle) turns a
  * 1000-executor aggregation into a 1-task straggler. Salting splits each
  * key into `salts` sub-keys for a partial aggregate, then merges partials
  * in a second (tiny) aggregate. AQE's skew-join splitting handles the
  * join case at runtime; salting is the static escape hatch for
  * aggregations and for joins AQE can't split (e.g. under stateful ops).
  */
object Skew {

  /** Deterministic salt in [0, salts): hash of the row's unique id —
    * deterministic so re-runs (and AQE re-plans) aggregate identically. */
  def salt(idCol: Column, salts: Int): Column =
    pmod(xxhash64(idCol), lit(salts)).cast("int")

  /** Two-phase salted sum/count aggregation: groupBy (keys, salt) with
    * map-side partials bounded per salt, then merge partials per key.
    * Result is identical to a direct groupBy (sum/count are associative);
    * the win is that the first shuffle spreads a hot key over `salts`
    * reducers. */
  def saltedSumCount(df: DataFrame, idCol: String, salts: Int,
      keys: Seq[String], sumCol: String): DataFrame = {
    val partial = df
      .withColumn("__salt", salt(col(idCol), salts))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(sum(col(sumCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial.groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$sumCol"),
           sum(col("__pcnt")).cast("bigint").as("n"))
  }
}
