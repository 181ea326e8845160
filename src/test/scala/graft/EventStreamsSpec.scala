package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.EventStreams

/** Semantics of the streaming event-hygiene legs (op163/op164) against
  * batch replays of the same operators. */
class EventStreamsSpec extends SparkSpec {

  test("op163: streamed watermark dedup equals batch distinct-key counts") {
    val streamed = EventStreams.dedupWithinWatermark(spark, sfDir)
      .collect().map(r =>
        r.getAs[String]("event_type") -> r.getAs[Long]("n_kept")).toMap
    val batch = Tables.events(spark, sfDir)
      .select(col("user_id"), col("event_type"),
        date_trunc("day", col("ts")).as("day"))
      .distinct()
      .groupBy("event_type").count()
      .collect().map(r =>
        r.getAs[String]("event_type") -> r.getAs[Long]("count")).toMap
    assert(streamed == batch)
    // dedup is genuinely exercised: kept < raw for at least one type
    val raw = Tables.events(spark, sfDir)
      .groupBy("event_type").count().collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Long]("count"))
      .toMap
    assert(streamed.exists { case (t, n) => n < raw(t) },
      "fixture produced no duplicate (user, type, day) keys")
  }

  test("op164: matched lags in (0, 600]; inner subset equals batch join") {
    val r = EventStreams.leftOuterBoundedJoin(spark, sfDir).collect()
    val matched = r.filter(!_.isNullAt(2))
    matched.foreach { row =>
      val lag = row.getAs[Long]("lag_s")
      assert(lag >= 0 && lag <= 600)
    }
    val e = Tables.events(spark, sfDir)
    val v = e.where(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id"),
        col("ts_ns").as("vns"))
    val c = e.where(col("event_type") === "click")
      .select(col("event_id").as("click_id"),
        col("user_id").as("cu"), col("ts_ns").as("cns"))
    val batchInner = v.join(c,
        col("user_id") === col("cu") && col("cns") > col("vns") &&
          col("cns") <= col("vns") + lit(600L * 1000000000L))
      .select("view_id", "click_id").collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    assert(matched.map(x =>
      (x.getAs[Long]("view_id"), x.getAs[Long]("click_id"))).toSet
      == batchInner)
  }

  test("op164: null rows are exactly the unmatched views below horizon") {
    val r = EventStreams.leftOuterBoundedJoin(spark, sfDir).collect()
    val nullViews = r.filter(_.isNullAt(2)).map(_.getAs[Long]("view_id")).toSet
    val matchedViews = r.filter(!_.isNullAt(2))
      .map(_.getAs[Long]("view_id")).toSet
    assert((nullViews & matchedViews).isEmpty,
      "a view emitted both a match and a null row")
    // final watermark = min(max view ts, max click ts); horizon strict <
    val e = Tables.events(spark, sfDir)
    val maxV = e.where(col("event_type") === "view")
      .agg(max("ts_ns")).collect()(0).getLong(0)
    val maxC = e.where(col("event_type") === "click")
      .agg(max("ts_ns")).collect()(0).getLong(0)
    val wm = math.min(maxV, maxC)
    val expected = e.where(col("event_type") === "view")
      .select(col("event_id"), col("ts_ns")).collect()
      .filter(x => x.getLong(1) + 600L * 1000000000L < wm)
      .map(_.getLong(0)).toSet -- matchedViews
    assert(nullViews == expected)
  }

  test("op275: full outer emits all three row classes; left leg == op164") {
    val full = EventStreams.fullOuterBoundedJoin(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val matched = full.filter { case (vk, ck) => vk >= 0 && ck >= 0 }
    val viewOnly = full.filter { case (vk, ck) => vk >= 0 && ck < 0 }
    val clickOnly = full.filter { case (vk, ck) => vk < 0 && ck >= 0 }
    assert(matched.nonEmpty && viewOnly.nonEmpty && clickOnly.nonEmpty,
      "fixture must exercise matched, view-only and click-only legs")
    assert(matched.length + viewOnly.length + clickOnly.length
      == full.length)
    // the (matched + view-only) legs are exactly op164's left outer
    val left = EventStreams.leftOuterBoundedJoin(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("view_id"),
        if (r.isNullAt(2)) -1L else r.getAs[Long]("click_id"))).toSet
    assert((matched ++ viewOnly).toSet == left)
  }
}
