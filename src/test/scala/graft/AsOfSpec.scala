package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.ops.AsOf

/** As-of join semantics (ties, no-match, interleaving) and streaming
  * exact dedup via dropDuplicates + watermark. */
class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("asof: picks latest right ≤ left, inclusive on ties, null when none") {
    val left = Seq(
      (1L, 10L, 100L), // exact tie with right at t=10 → inclusive
      (2L, 5L, 100L),  // before any right row → null
      (3L, 25L, 100L), // between rights at 10 and 30 → 10
      (4L, 35L, 200L)  // different key
    ).toDF("event_id", "t", "k")
    val right = Seq(
      (10L, 100L, "r10"), (30L, 100L, "r30"), (33L, 200L, "r33"))
      .toDF("t", "k", "tag")
    val out = AsOf.join(left, right, key = "k", time = "t", payload = Seq("tag"))
      .orderBy("event_id")
      .collect().map(r => (r.getLong(0), Option(r.getString(3)))).toSeq
    assert(out == Seq(
      (1L, Some("r10")), (2L, None), (3L, Some("r10")), (4L, Some("r33"))))
  }

  test("asof: carries multiple payload columns") {
    val left = Seq((1L, 20L, 1L)).toDF("event_id", "t", "k")
    val right = Seq((10L, 1L, "a", 1.5), (15L, 1L, "b", 2.5))
      .toDF("t", "k", "tag", "v")
    val r = AsOf.join(left, right, "k", "t", Seq("tag", "v")).collect()(0)
    assert(r.getString(3) == "b" && r.getDouble(4) == 2.5)
  }

  test("asof: a most-recent right row with NULL payload yields NULL (not an older value)") {
    val left = Seq((1L, 12L, 1L)).toDF("event_id", "t", "k")
    val right = Seq(
      (5L, 1L, Some("old")), (10L, 1L, None: Option[String]))
      .toDF("t", "k", "tag")
    val out = AsOf.join(left, right, "k", "t", Seq("tag")).collect()(0)
    assert(out.isNullAt(3),
      "asof must match the t=10 row and surface ITS null payload")
  }

  test("zero-norm vectors score cosine 0 instead of NaN/ANSI failure") {
    import graft.functions.Similarity
    val df = Seq(
      (1L, Array(0f, 0f, 0f, 0f)), (2L, Array(1f, 2f, 3f, 4f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.nearDupPairs(df, 0L).collect()
    assert(out.length == 1 && out(0).getLong(2) == 0L)
  }

  test("LongArrayDot raises on dimension mismatch instead of truncating") {
    import graft.functions.Similarity
    val df = Seq((Array(1L, 2L), Array(1L, 2L, 3L))).toDF("a", "b")
    val ex = intercept[Exception] {
      df.select(Similarity.intDot(col("a"), col("b"))).collect()
    }
    assert(ex.getMessage.contains("dimension mismatch") ||
      Option(ex.getCause).exists(_.getMessage.contains("dimension mismatch")))
  }

  test("streaming exact dedup: dropDuplicates drops replayed keys across batches") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val deduped = in.toDF().toDF("id", "payload").dropDuplicates("id")
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName("dedup_out").start()
    in.addData((1L, "a"), (2L, "b"), (1L, "a-dup-same-batch"))
    q.processAllAvailable()
    in.addData((1L, "a-dup-later-batch"), (3L, "c"))
    q.processAllAvailable()
    q.stop()
    val out = spark.table("dedup_out").as[(Long, String)].collect().toMap
    assert(out.keySet == Set(1L, 2L, 3L))
    assert(out(1L) == "a", "first occurrence wins across batches (keyed state)")
  }
}
