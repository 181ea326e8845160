package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.classic.ClassicConversions.castToImpl

import graft.expressions.LongArrayDot

/** SQL-dialect registration for the custom Catalyst expressions, so the
  * reference's `spark.sql(...)`-over-views style reaches them too:
  *
  *   graft_dot(array<bigint>, array<bigint>) → bigint
  *
  * Registered per-session here (temp function) and cluster-wide via
  * `GraftExtensions` (spark.sql.extensions) for spark-submit deployments.
  */
object Registry {
  def register(spark: SparkSession): Unit = {
    castToImpl(spark).sessionState.functionRegistry
      .createOrReplaceTempFunction(
        "graft_dot", exprs => LongArrayDot(exprs(0), exprs(1)), "built-in")
  }
}
