package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bin-expanded interval join: points ⋈ intervals on containment
  * (`lo <= p < hi`) WITHOUT a nested-loop plan.
  *
  * WHY (100 TB): Spark plans a bare non-equi join as
  * BroadcastNestedLoopJoin (needs one side broadcastable) or a
  * cartesian product — both non-starters when points AND intervals are
  * large. The standard fix (Flink's interval join, every production
  * point-in-range pipeline) is to manufacture an equi key: cover each
  * interval by the fixed-width BINS it overlaps (explode — bounded by
  * span/binWidth copies per interval), map each point to its single
  * bin, equi-join on the bin, and re-check the exact containment as a
  * residual filter. The join becomes a shuffled hash/sort-merge join
  * on the bin key — partitionable, skew-handleable by AQE, no
  * broadcast requirement. Each matching (point, interval) pair
  * materializes EXACTLY once: the pair meets only in the point's own
  * bin (the interval has one copy there iff it covers the point's
  * bin, which containment implies).
  *
  * Bin width is the knob: copies-per-interval = O(span/binWidth + 1)
  * vs per-bin fanout; set it near the median interval span so the
  * expansion stays O(1) per interval.
  */
object IntervalJoin {

  /** Join `points` (integral column `pointCol`) to `intervals`
    * (half-open [`loCol`, `hiCol`), integral, non-negative) on
    * containment. Column names must be disjoint between the two
    * inputs. */
  def binJoin(points: DataFrame, intervals: DataFrame, pointCol: String,
      loCol: String, hiCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    // empty intervals ([lo, lo)) must not expand: without the guard
    // sequence(lo div w, (lo-1) div w) would run DESCENDING and emit
    // spurious bin copies (harmless to correctness — the residual
    // filter kills them — but pure expansion waste)
    val binned = intervals.filter(col(loCol) < col(hiCol)).withColumn("_bin",
      explode(sequence(
        expr(s"$loCol div $binWidth"),
        expr(s"($hiCol - 1) div $binWidth"))))
    points.withColumn("_bin", expr(s"$pointCol div $binWidth"))
      .join(binned, Seq("_bin"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bin")
  }
}
