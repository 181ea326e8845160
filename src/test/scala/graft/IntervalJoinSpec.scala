package graft

import org.apache.spark.sql.functions._

import graft.ops.IntervalJoin

/** Bin-expanded interval join: losslessness vs the naive theta join,
  * exactly-once pair semantics, and the no-nested-loop plan shape. */
class IntervalJoinSpec extends SparkSpec {
  import spark.implicits._

  // points 0..199; intervals of varied spans incl. bin-straddlers,
  // empty, adjacent, and overlapping ones
  private lazy val pts = (0L until 200L).map(i => (i, i % 7)).toDF("p", "tag")
  private lazy val ivs = Seq(
    (1L, 0L, 10L),    // inside first bin + straddle
    (2L, 9L, 9L),     // EMPTY (lo == hi): must match nothing
    (3L, 10L, 24L),   // exactly two bins
    (4L, 15L, 16L),   // single point
    (5L, 0L, 200L),   // covers everything
    (6L, 195L, 600L), // runs past the point domain
    (7L, 15L, 16L)    // duplicate interval: pairs count twice
  ).toDF("iv", "lo", "hi")

  test("binJoin equals the naive non-equi join, pair-exact, across bin widths") {
    val naive = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .select("p", "iv").collect().map(r => (r.getLong(0), r.getLong(1)))
      .sorted.toSeq
    for (w <- Seq(1L, 7L, 8L, 64L, 1000L)) {
      val got = IntervalJoin.binJoin(pts, ivs, "p", "lo", "hi", w)
        .select("p", "iv").collect().map(r => (r.getLong(0), r.getLong(1)))
        .sorted.toSeq
      assert(got == naive, s"binWidth=$w diverged")
    }
    // duplicates by design: iv 4 and 7 are the same interval, so point
    // 15 pairs with both — multiset semantics preserved
    assert(naive.count(_._1 == 15L) >= 2)
  }

  test("empty interval [lo, lo) matches nothing and explodes no bins") {
    val got = IntervalJoin.binJoin(pts, ivs.filter(col("iv") === 2L),
      "p", "lo", "hi", 7L)
    assert(got.isEmpty)
  }

  test("plan is an equi join on the bin key — no nested loop, no cartesian") {
    val plan = IntervalJoin.binJoin(pts, ivs, "p", "lo", "hi", 7L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"interval join must not plan a nested loop:\n$plan")
    // while the naive spelling does exactly that
    val naivePlan = pts.join(ivs, col("p") >= col("lo") && col("p") < col("hi"))
      .queryExecution.executedPlan.toString
    assert(naivePlan.contains("BroadcastNestedLoopJoin") ||
      naivePlan.contains("CartesianProduct"))
  }
}
