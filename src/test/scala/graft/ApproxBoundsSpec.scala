package graft

import org.apache.spark.sql.functions._

/** The two approximate queries (op42 HLL, op46 approx percentiles) are
  * bounds-GATED since r11: each registered query emits measured
  * in-bounds integer flags that the DuckDB oracle asserts true from
  * exact SQL, so the driver hash-gates them like every exact op. This
  * spec keeps the QUANTITATIVE layer: (a) the registered flags are all
  * 1 on the fixture, and (b) the raw sketch estimates — re-computed
  * here directly, independent of the flag plumbing — land within the
  * documented bounds (HLL rsd 0.02 → 5% is a 2.5σ gate;
  * approx_percentile accuracy 10000 → rank error ≤ ⌈n/10000⌉). */
class ApproxBoundsSpec extends SparkSpec {

  test("op42: registered flags all 1; raw HLL within 5% of exact, per group") {
    val got = SparkEntry.queries("op42_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(3))).toMap
    val li = graft.sources.Tables.lineitem(spark, sfDir)
    val raw = li.groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"),
        approx_count_distinct(col("l_partkey"), 0.02).as("est"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == raw.keySet)
    raw.foreach { case (flag, (d, est)) =>
      assert(math.abs(est - d).toDouble / d <= 0.05,
        s"group $flag: HLL estimate $est vs exact $d exceeds 5%")
      assert(got(flag)._1 == d, s"group $flag: exact_parts mismatch")
      assert(got(flag)._2 == 1L, s"group $flag: hll_within_5pct flag is 0")
    }
  }

  test("op46: registered flags all 1; raw approx percentile rank-bounded") {
    val got = SparkEntry.queries("op46_percentile_approx")(spark, sfDir)
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val status = r.getString(0)
      (2 to 4).foreach { i =>
        assert(r.getLong(i) == 1L,
          s"group $status: in-window flag #${i - 1} is 0")
      }
    }
    // independent rank check of the raw sketch answers
    val o = graft.sources.Tables.orders(spark, sfDir)
      .select(col("o_orderstatus"), col("o_totalprice"))
    val ap = o.groupBy("o_orderstatus")
      .agg(expr("approx_percentile(o_totalprice, 0.9, 10000)").as("a90"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    ap.foreach { case (status, a90, n) =>
      val vals = o.where(col("o_orderstatus") === status)
        .select("o_totalprice").collect().map(_.getDouble(0)).sorted
      val le = vals.count(_ <= a90).toLong
      val lt = vals.count(_ < a90).toLong
      val target = (9 * n + 9) / 10
      val err = (n + 9999) / 10000
      assert(le >= target - err - 1 && lt <= target + err + 1,
        s"group $status: p90 sketch answer $a90 outside rank window " +
          s"(le=$le lt=$lt target=$target err=$err n=$n)")
    }
  }
}
