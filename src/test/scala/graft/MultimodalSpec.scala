package graft

import org.apache.spark.sql.functions._

import graft.functions.Multimodal
import graft.ops.Skew
import graft.sources.Tables

/** Multimodal plumbing shapes + skew utility semantics. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("synthesize: schema carries binary payload + typed metadata") {
    val media = Multimodal.synthesize(spark, sfDir)
    val schema = media.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("width").dataType.typeName == "integer")
    val r = media.filter(col("doc_id") === 5L).collect()(0)
    assert(r.format == "wav" && r.width == 5 * 16 + 64)
  }

  test("decodeFeatures: fixed feature dim, normalized histogram sums to ~1") {
    val feats = Multimodal.decodeFeatures(Multimodal.synthesize(spark, sfDir),
      batchSize = 7) // odd batch size: last chunk short — must still decode all
    val rows = feats.collect()
    assert(rows.length == 500)
    rows.take(20).foreach { f =>
      assert(f.features.length == Multimodal.FeatureDim)
      val s = f.features.sum
      assert(math.abs(s - 1f) < 1e-3, s"histogram should normalize: $s")
    }
  }

  test("decodeFeatures preserves partitioning (no shuffle)") {
    val media = Multimodal.synthesize(spark, sfDir).repartition(5)
    val feats = Multimodal.decodeFeatures(media)
    assert(feats.rdd.getNumPartitions == 5)
  }

  test("resize halves the feature dim; frame sampling partitions the payload") {
    val media = Multimodal.synthesize(spark, sfDir)
    val resized = Multimodal.resizeFeatures(Multimodal.decodeFeatures(media))
    assert(resized.head().features.length == Multimodal.FeatureDim / 2)
    val frames = Multimodal.sampleFrames(media, 4)
    val byDoc = frames.filter(col("doc_id") === 3L).collect().sortBy(_.frame_idx)
    assert(byDoc.length == 4)
    val original = media.filter(col("doc_id") === 3L).collect()(0).payload
    assert(byDoc.flatMap(_.frame).toSeq == original.toSeq,
      "frames must reassemble the original payload")
  }

  test("salted aggregation equals direct aggregation") {
    val li = Tables.lineitem(spark, sfDir)
    val direct = li.groupBy(col("l_returnflag"))
      .agg(sum(col("l_quantity")).as("s"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    val salted = Skew.saltedSumCount(li, "l_orderkey", 8,
        Seq("l_returnflag"), "l_quantity")
      .orderBy("l_returnflag")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSeq
    assert(salted.map(t => (t._1, math.round(t._2 * 1e4), t._3)) ==
      direct.map(t => (t._1, math.round(t._2 * 1e4), t._3)))
  }
}
