package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video modeled as opaque
  * `binary` payloads plus a typed metadata struct, with per-partition
  * batched decode / feature-extraction / resize / frame-sampling.
  *
  * The actual codec step is a STUB — media libraries are not in this
  * container — implemented as a deterministic fake (byte histogram) so the
  * Spark-side plumbing is real and testable: the schema, the partition
  * batching (mapPartitions with bounded `batchSize` chunks, the Scala
  * analog of mapInPandas' Arrow batches), and the feature shape all match
  * what a real decoder drop-in (JNI/ONNX/ffmpeg) would use.
  *
  * Scale: decode is a narrow per-partition pass — no shuffle; batch size
  * bounds peak memory per task (payload bytes × batchSize); feature
  * vectors are fixed-width Array[Float] columns ready for the Similarity
  * operators (bucketed ANN) downstream.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, format: String, width: Int,
      height: Int, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      features: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  val FeatureDim = 32

  /** Synthesize a deterministic media corpus from the documents fixture:
    * payload = UTF-8 bytes of the text (a stand-in for encoded media),
    * metadata derived from doc_id. */
  def synthesize(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        ((col("doc_id") % 64) * 16 + 64).cast("int").as("width"),
        ((col("doc_id") % 48) * 16 + 64).cast("int").as("height"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** STUB decoder: a real implementation would decode `payload` with an
    * image/audio codec; the deterministic fake emits a 32-bin codepoint
    * histogram of the UTF-8-decoded payload, normalized to [0,1].
    * Codepoints (not raw bytes) so the SQL oracle — which sees characters
    * — computes the identical histogram for non-ASCII content too.
    * Batched per partition. */
  def decodeFeatures(media: Dataset[MediaRecord],
      batchSize: Int = 64): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        // batch-shaped processing: a real decoder amortizes codec/model
        // setup across the batch exactly here
        batch.iterator.map { r =>
          val hist = new Array[Float](FeatureDim)
          val cps = new String(r.payload, "UTF-8").codePoints().toArray
          cps.foreach(cp => hist(cp % FeatureDim) += 1f)
          val n = math.max(cps.length, 1).toFloat
          MediaFeatures(r.doc_id, r.format, r.payload.length.toLong,
            hist.map(_ / n))
        }
      }
    }
  }

  /** STUB resize: deterministic 2x downsample of the feature vector
    * (stands in for image resize-then-re-embed). */
  def resizeFeatures(feats: Dataset[MediaFeatures]): Dataset[MediaFeatures] = {
    implicit val enc = Encoders.product[MediaFeatures]
    feats.map { f =>
      val half = f.features.grouped(2).map(p => p.sum / p.length).toArray
      f.copy(features = half)
    }
  }

  /** STUB frame sampler: split the payload into `n` equal chunks
    * (stands in for video frame extraction); one output row per frame. */
  def sampleFrames(media: Dataset[MediaRecord], n: Int): Dataset[Frame] = {
    implicit val enc = Encoders.product[Frame]
    media.flatMap { r =>
      val len = r.payload.length
      if (len == 0) Iterator.empty
      else (0 until n).iterator.map { i =>
        val from = i * len / n
        val until = (i + 1) * len / n
        Frame(r.doc_id, i, java.util.Arrays.copyOfRange(r.payload, from, until))
      }
    }
  }

  /** Feature table as a DataFrame for the query surface: doc_id, format,
    * n_bytes, and an exact integer witness of the features (sum of
    * 1e6-quantized bins — deterministic, oracle-friendly). */
  def featureTable(spark: SparkSession, dir: String): DataFrame = {
    val feats = decodeFeatures(synthesize(spark, dir))
    feats.toDF().select(col("doc_id"), col("format"), col("n_bytes"),
      Similarity.intDot(Similarity.quantize(col("features")),
        array((0 until FeatureDim).map(_ => lit(1L)): _*)).as("feat_sum_q"))
  }
}
