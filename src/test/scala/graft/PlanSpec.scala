package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.ops.Decode
import graft.sources.Tables

/** Optimizer-rule and custom-aggregate semantics. */
class PlanSpec extends SparkSpec {
  import spark.implicits._

  test("EliminateBase64RoundTrip removes the codec pair without changing results") {
    // parquet-backed column: a literal LocalRelation would be constant-
    // folded away before the rule could ever see the codec pair
    val df = Tables.documents(spark, sfDir).limit(10).select(col("text").as("s"))
    val roundTrip = df.select(col("s"),
      Decode.decodeBase64(Decode.encodeBase64(col("s"))).as("r"))

    val before = roundTrip.queryExecution.optimizedPlan.toString
    assert(before.contains("unbase64"), s"expected codec pair in plan:\n$before")

    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    castToImpl(spark).experimental.extraOptimizations =
      Seq(graft.plans.EliminateBase64RoundTrip)
    try {
      val optimized = df.select(col("s"),
        Decode.decodeBase64(Decode.encodeBase64(col("s"))).as("r"))
      val after = optimized.queryExecution.optimizedPlan.toString
      assert(!after.contains("unbase64"), s"codec pair should be gone:\n$after")
      // results identical to the unoptimized run
      assert(optimized.collect().map(r => (r.getString(0), r.getString(1))).toSeq ==
        roundTrip.collect().map(r => (r.getString(0), r.getString(1))).toSeq)
    } finally {
      castToImpl(spark).experimental.extraOptimizations = Nil
    }
  }

  test("CollapseJsonRoundTrip folds from_json(to_json(struct)) and the full STEDI decode") {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    import org.apache.spark.sql.types.StructType
    val fixtures = "/root/testdata/sf0.001"
    // baseline results with the stock optimizer
    val plainResult = graft.pipeline.Stedi.decodeCustomers(
        graft.pipeline.StediFixtures.redisFrames(spark, fixtures))
      .orderBy("email").collect().map(_.toSeq).toSeq
    // the GraftExtensions rule set (plus Spark's extract simplifier, which
    // in an extension-registered session shares the fixed-point batch)
    castToImpl(spark).experimental.extraOptimizations = Seq(
      graft.plans.CollapseJsonRoundTrip,
      org.apache.spark.sql.catalyst.optimizer.SimplifyExtractValueOps,
      graft.plans.EliminateBase64RoundTrip)
    try {
      // direct pair: parse-of-serialize folds to the struct itself
      val df = Tables.documents(spark, sfDir).limit(10)
      val schema = StructType.fromDDL("a STRING, b STRING")
      val pair = df.select(from_json(
        to_json(struct(col("text").as("a"), col("lang").as("b"))), schema).as("s"))
      val pairPlan = pair.queryExecution.optimizedPlan.toString
      assert(!pairPlan.contains("from_json"), s"pair should fold:\n$pairPlan")

      // full cascade: envelope JSON (pruned schema) → array/struct extract
      // → base64 round-trip → customer JSON, all the way to plain columns
      val decoded = graft.pipeline.Stedi.decodeCustomers(
        graft.pipeline.StediFixtures.redisFrames(spark, fixtures))
      val plan = decoded.queryExecution.optimizedPlan.toString
      assert(!plan.contains("from_json") && !plan.contains("unbase64"),
        s"decode chain should fold completely:\n$plan")
      // identical results to the unoptimized spelling
      assert(decoded.orderBy("email").collect().map(_.toSeq).toSeq == plainResult)
    } finally castToImpl(spark).experimental.extraOptimizations = Nil
  }

  test("TopKAgg brute-force equals the window-function spelling") {
    val emb = Tables.embeddings(spark, sfDir)
    val viaWindow = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, 5)
      .select("q_id", "n_id", "cos_bp", "rank")
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val viaAgg = Similarity.bruteForceTopKAgg(emb.filter(col("vec_id") < 8), emb, 5)
      .select("q_id", "n_id", "cos_bp", "rank")
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(viaAgg == viaWindow)
  }

  test("TopKAgg handles ties, short groups, and k > group size") {
    val df = Seq(
      (1L, 100L, 7L), (1L, 100L, 3L), (1L, 90L, 1L), // tie on score → id asc
      (2L, 5L, 9L))                                   // group smaller than k
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topK(3)(col("score"), col("id")).as("top"))
      .select(col("g"), col("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(out(1L) == Seq((100L, 3L), (100L, 7L), (90L, 1L)))
    assert(out(2L) == Seq((5L, 9L)))
  }

  test("LatestAgg equals the max_by spelling, ties on ts break by event_id") {
    // the hash-aggregable changelog compactor must fold to exactly what
    // max_by(struct(payload), struct(ts, id)) computes — including a
    // same-timestamp tie (event_id decides) and stragglers that only
    // bump the counter
    val ev = Seq(
      (1L, 10L, 100L, "a", 5L), (1L, 11L, 100L, "b", 6L), // ts tie → id 11
      (1L, 9L, 50L, "c", 7L),                              // straggler
      (2L, 20L, 400L, "d", 8L))
      .toDF("user_id", "event_id", "ts_us", "event_type", "value_cents")
    val viaLatest = ev.groupBy(col("user_id"))
      .agg(graft.functions.LatestAgg.latest(col("ts_us"), col("event_id"),
        col("event_type"), col("value_cents")).as("l"))
      .select(col("user_id"), col("l.n"), col("l.ts_us"), col("l.event_id"),
        col("l.event_type"), col("l.value_cents"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    val viaMaxBy = ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        max_by(struct(col("ts_us"), col("event_id"), col("event_type"),
          col("value_cents")), struct(col("ts_us"), col("event_id"))).as("m"))
      .select(col("user_id"), col("n"), col("m.ts_us"), col("m.event_id"),
        col("m.event_type"), col("m.value_cents"))
      .orderBy("user_id").collect().map(_.toSeq).toSeq
    assert(viaLatest == viaMaxBy)
    assert(viaLatest.head(3) == 11L && viaLatest.head(1) == 3L)
  }

  test("topKDistinct keeps one slot per id and equals dedup-then-topK") {
    // the streaming LSH probe's contract: an id arriving once per
    // colliding table (same score each time) occupies ONE slot, so
    // lower-scored distinct candidates aren't crowded out of the top-k;
    // a better re-occurrence upgrades its slot in place
    val df = Seq(
      (1L, 100L, 7L), (1L, 100L, 7L), (1L, 100L, 7L), // 3-table collision
      (1L, 90L, 3L), (1L, 80L, 5L), (1L, 70L, 9L),
      (2L, 10L, 1L), (2L, 20L, 1L))                   // upgrade in place
      .toDF("g", "score", "id")
    val out = df.groupBy(col("g"))
      .agg(graft.functions.TopKAgg.topKDistinct(3)(col("score"), col("id"))
        .as("top"))
      .collect().map(r => r.getLong(0) ->
        r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getLong(0), x.getLong(1))))
      .toMap
    assert(out(1L) == Seq((100L, 7L), (90L, 3L), (80L, 5L)))
    assert(out(2L) == Seq((20L, 1L)))
  }
}
