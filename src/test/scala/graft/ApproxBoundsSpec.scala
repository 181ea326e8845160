package graft

import org.apache.spark.sql.functions._

/** The two rows-only queries (op42 HLL, op46 approx percentiles) are
  * approximate BY DEFINITION — the driver can't hash-gate them, so
  * this spec is their quantitative gate: the REGISTERED queries (the
  * exact frames the driver runs, not re-spelled aggregates) are
  * bounded per group against their exact-gated twins every round.
  * HLL at rsd 0.02 is ±2% rsd (σ); 5% is a 2.5σ gate. approx_percentile
  * at accuracy 10000 bounds RANK error to ~n/10000 — on the fixture's
  * value spread a 5% value gate is generous but would catch any
  * engine/config regression an oracle can't see. */
class ApproxBoundsSpec extends SparkSpec {

  test("op42's per-group HLL estimates land within 5% of exact distincts") {
    val got = SparkEntry.queries("op42_approx_distinct")(spark, sfDir)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = graft.sources.Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(countDistinct(col("l_partkey")).as("d"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    exact.foreach { case (flag, d) =>
      val est = got(flag)
      assert(math.abs(est - d).toDouble / d <= 0.05,
        s"group $flag: HLL estimate $est vs exact $d exceeds 5%")
    }
  }

  test("op46's approx percentiles land within 5% of the exact twin, per group") {
    def rows(name: String): Map[String, Seq[Long]] =
      SparkEntry.queries(name)(spark, sfDir).collect()
        .map(r => r.getString(0) ->
          Seq(r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val approx = rows("op46_percentile_approx")
    val exact = rows("op46_percentile")
    assert(approx.keySet == exact.keySet)
    for ((status, ex) <- exact; (a, e) <- approx(status).zip(ex)) {
      assert(math.abs(a - e).toDouble / math.max(e, 1L) <= 0.05,
        s"group $status: approx $a vs exact $e exceeds 5%")
    }
  }
}
