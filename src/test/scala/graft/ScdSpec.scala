package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd

/** SCD2 history semantics: version opening, no-change collapse, interval
  * chaining, null tracking, and the single-shuffle plan shape. */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long, Long, java.lang.Double)]) =
    Scd.history(
        rows.toDF("user_id", "event_type", "t", "event_id", "v"),
        Seq("user_id", "event_type"), "t", "event_id", col("v"))
      .orderBy("user_id", "event_type", "ver")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSeq

  test("scd2: versions open only on change, intervals chain, last is open") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, 5.0),
      (1L, "a", 20L, 2L, 5.0),  // no-change update: collapses into v1
      (1L, "a", 30L, 3L, 7.0),  // change: v2 opens, v1 closes at t=30
      (1L, "a", 40L, 4L, 5.0),  // back to an old value is still a change
      (2L, "a", 15L, 5L, 9.0)))
    assert(out == Seq(
      (1L, "a", 1L, Some(5.0), 10L, 30L, 0L),
      (1L, "a", 2L, Some(7.0), 30L, 40L, 0L),
      (1L, "a", 3L, Some(5.0), 40L, -1L, 1L),
      (2L, "a", 1L, Some(9.0), 15L, -1L, 1L)))
  }

  test("scd2: null values track null-safely (NULL->NULL does not reopen)") {
    val out = run(Seq(
      (1L, "a", 10L, 1L, null),
      (1L, "a", 20L, 2L, null),  // NULL -> NULL: no new version
      (1L, "a", 30L, 3L, 4.0),   // NULL -> value: new version
      (1L, "a", 40L, 4L, null))) // value -> NULL: new version
    assert(out == Seq(
      (1L, "a", 1L, None, 10L, 30L, 0L),
      (1L, "a", 2L, Some(4.0), 30L, 40L, 0L),
      (1L, "a", 3L, None, 40L, -1L, 1L)))
  }

  test("scd2: same-timestamp events order by the tie column") {
    val out = run(Seq(
      (1L, "a", 10L, 2L, 6.0),   // same t, higher event_id: applied second
      (1L, "a", 10L, 1L, 5.0)))
    assert(out == Seq(
      (1L, "a", 1L, Some(5.0), 10L, 10L, 0L),
      (1L, "a", 2L, Some(6.0), 10L, -1L, 1L)))
  }

  test("scd2: lag/row_number/lead share one Exchange (single shuffle)") {
    val df = Scd.history(
      graft.sources.Tables.events(spark, sfDir)
        .withColumn("t_us", expr("ts_ns div 1000")),
      Seq("user_id", "event_type"), "t_us", "event_id", col("value"))
    val plan = df.queryExecution.executedPlan.toString
    val hashEx = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(hashEx == 1, s"expected exactly 1 hash exchange, saw $hashEx:\n$plan")
  }
}
