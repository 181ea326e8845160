package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distinct-value-grid walk, shared by the analytics packs (KS
  * drift, skew report, range boundaries, quantile normalization, …).
  *
  * THE GRID CONTRACT (the packs' single documented invariant): the
  * input frame is bounded by a VALUE DOMAIN — distinct lengths,
  * counts-of-counts, bucket ids — never by the corpus. Everything
  * corpus-sized is reduced onto the grid FIRST via a map-combinable
  * aggregate; only then does the ordered cumulative walk run. The
  * single-partition `Window.orderBy` this helper plans is therefore a
  * declared O(|domain|) cost (hundreds to thousands of rows), which is
  * also why the oracles can replay the walk verbatim. Unbounded
  * domains must bucket/quantize before entering (the op179 note);
  * handing a corpus-sized frame to this helper is a scale bug by
  * definition.
  */
object Grid {

  /** Append running sums (`cums`) and grand totals (`totals`) of grid
    * measures, ordered by `order`; each entry maps a measure column to
    * its output alias. The default frame (unbounded preceding → current
    * row) makes each running sum INCLUSIVE of its row; subtract the
    * measure for the exclusive prefix (the op195 `pcum` spelling). */
  def cumWalk(grid: DataFrame, order: Column,
      cums: Seq[(String, String)],
      totals: Seq[(String, String)] = Nil): DataFrame = {
    val w = Window.orderBy(order)
    val withCums = cums.foldLeft(grid) { case (df, (m, alias)) =>
      df.withColumn(alias, sum(col(m)).over(w))
    }
    totals.foldLeft(withCums) { case (df, (m, alias)) =>
      df.withColumn(alias, sum(col(m)).over(Window.partitionBy()))
    }
  }
}
