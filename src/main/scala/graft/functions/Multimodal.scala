package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: images/audio/video modeled as opaque
  * `binary` payloads plus a typed metadata struct, with per-partition
  * batched decode / feature-extraction / resize / frame-sampling.
  *
  * Two codec legs. The GENERIC one ([[decodeFeatures]]) is a declared
  * deterministic fake (byte histogram) standing in for codecs that
  * genuinely aren't in this container (audio/video/JPEG-decode models);
  * its value is the Spark-side plumbing: the schema, the partition
  * batching (mapPartitions with bounded `batchSize` chunks, the Scala
  * analog of mapInPandas' Arrow batches), and the feature shape all match
  * what a real decoder drop-in (JNI/ONNX/ffmpeg) would use. The IMAGE
  * leg ([[synthesizeImages]]/[[decodeImageStats]]) is REAL: the JDK
  * ships javax.imageio, so PNG/BMP payloads are genuinely encoded and
  * decoded through an actual codec, oracle-checked via the generative
  * pixel formula (op80_image_codec).
  *
  * Scale: decode is a narrow per-partition pass — no shuffle; batch size
  * bounds peak memory per task (payload bytes × batchSize); feature
  * vectors are fixed-width Array[Float] columns ready for the Similarity
  * operators (bucketed ANN) downstream.
  */
object Multimodal {

  // imageio's default stream cache spools every encode/decode through a
  // temp FILE (FileCacheImage{In,Out}putStream); with the codec passes
  // now running 32-wide (codecDocIds), concurrent temp-file creation
  // serializes the whole stage. These payloads are small in-memory
  // byte arrays — the MemoryCache streams are strictly better here.
  // JVM-global, set once at first touch of any codec path.
  javax.imageio.ImageIO.setUseCache(false)

  /** The platform WAV codec, resolved ONCE through the public SPI
    * instead of per call: AudioSystem.getAudioInputStream / .write walk
    * a synchronized provider registry on EVERY invocation — measured
    * ~80µs per decode single-threaded but ~2.0ms effective once the
    * codec stages run 32-wide (the registry lock serializes them, 25×).
    * Same provider classes, same bytes — only the lookup is hoisted
    * (guide §4.5: construct heavyweight state once, amortize over
    * rows). Selection is by CAPABILITY (probing a real 1-sample WAV /
    * asking isFileTypeSupported), never by class name; if the SPI scan
    * cannot serve WAVE on some exotic JVM the per-call registry walk
    * remains as the fallback, so correctness never depends on the fast
    * path. Reader/writer instances are stateless and shared exactly the
    * way the global registry shares them. */
  private lazy val wavReader: Option[javax.sound.sampled.spi.AudioFileReader] = {
    import scala.jdk.CollectionConverters._
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(
      new javax.sound.sampled.AudioInputStream(
        new java.io.ByteArrayInputStream(new Array[Byte](2)), fmt, 1L),
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val probe = bos.toByteArray
    try
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileReader])
        .asScala.find { r =>
          try {
            r.getAudioInputStream(
              new java.io.ByteArrayInputStream(probe)): Unit
            true
          } catch { case _: Exception => false }
        }
    catch { case _: Throwable => None }
  }

  private lazy val wavWriter: Option[javax.sound.sampled.spi.AudioFileWriter] = {
    import scala.jdk.CollectionConverters._
    try
      java.util.ServiceLoader
        .load(classOf[javax.sound.sampled.spi.AudioFileWriter])
        .asScala.find(_.isFileTypeSupported(
          javax.sound.sampled.AudioFileFormat.Type.WAVE))
    catch { case _: Throwable => None }
  }

  /** WAV decode through [[wavReader]] (same real codec, hoisted
    * provider lookup). */
  private def readWav(
      payload: Array[Byte]): javax.sound.sampled.AudioInputStream = {
    val in = new java.io.ByteArrayInputStream(payload)
    wavReader match {
      case Some(r) => r.getAudioInputStream(in)
      case None => javax.sound.sampled.AudioSystem.getAudioInputStream(in)
    }
  }

  /** WAV encode through [[wavWriter]] (same real codec, hoisted
    * provider lookup). */
  private def writeWav(ais: javax.sound.sampled.AudioInputStream,
      bos: java.io.OutputStream): Unit =
    wavWriter match {
      case Some(w) =>
        w.write(ais, javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
      case None =>
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos): Unit
    }

  case class MediaRecord(doc_id: Long, format: String, width: Int,
      height: Int, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, format: String, n_bytes: Long,
      features: Array[Float])
  case class Frame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  val FeatureDim = 32

  /** doc_id feed for the real-codec synthesizers, spread over the
    * session's full parallelism. The documents fixture is one small
    * parquet file, so the raw scan plans 1-2 input splits — and every
    * downstream codec pass (imageio/WAV/GIF encode, then decode) ran
    * nearly serially on a 32-core session (measured: op284 5 tasks,
    * wall ≈ summed task time). Payload synthesis inflates 8 bytes of
    * id into KBs of media, so this is guide §8's rule in miniature:
    * repartition the LIGHT rows (ids) before the heavy per-row work,
    * never after. Round-robin repartition is deterministic
    * (sortBeforeRepartition) and the per-doc payloads are pure
    * functions of doc_id, so results are partitioning-invariant. */
  private def codecDocIds(spark: SparkSession,
      dir: String): Dataset[Long] = {
    import spark.implicits._
    graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id")).as[Long]
      .repartition(spark.sparkContext.defaultParallelism)
  }

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

  // ---- real codec leg (op80's twin): javax.imageio, no external deps ----

  case class ImageRecord(doc_id: Long, format: String, payload: Array[Byte])
  case class ImageStats(doc_id: Long, format: String, width: Int,
      height: Int, sum_r: Long, sum_g: Long, sum_b: Long)

  /** Closed-form image geometry/pixels per doc — the generative formula
    * BOTH the synthesizer and the oracle compute, so a genuine
    * encode→decode round-trip sits between two independent evaluations
    * of it. Small dims keep the corpus cheap (≤16×14 px). */
  def imageWidth(d: Long): Int = 8 + (d % 9).toInt
  def imageHeight(d: Long): Int = 8 + (d % 7).toInt
  def pixelR(d: Long, x: Int, y: Int): Int = ((d * 31 + x * 7 + y * 13) % 256).toInt
  def pixelG(d: Long, x: Int, y: Int): Int = ((d * 17 + x * 3 + y * 5) % 256).toInt
  def pixelB(d: Long, x: Int, y: Int): Int = ((d * 7 + x * 11 + y * 3) % 256).toInt

  /** Synthesize REAL image payloads: each doc_id renders its formula
    * pixels into a BufferedImage and encodes through the JDK's actual
    * PNG (even ids) or BMP (odd ids) writer — both lossless, so decode
    * recovers the exact pixels. This replaces "media libs aren't in the
    * container" for images: javax.imageio ships with the JDK. */
  def synthesizeImages(spark: SparkSession, dir: String): Dataset[ImageRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        it.map { d =>
          val w = imageWidth(d); val h = imageHeight(d)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              img.setRGB(x, y,
                (pixelR(d, x, y) << 16) | (pixelG(d, x, y) << 8) | pixelB(d, x, y))
              x += 1
            }
            y += 1
          }
          val fmt = if (d % 2 == 0) "png" else "bmp"
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, fmt, bos)
          ImageRecord(d, fmt, bos.toByteArray)
        }
      }
  }

  // ---- real AUDIO codec leg (op133): javax.sound.sampled, JDK-only ----

  case class AudioRecord(doc_id: Long, payload: Array[Byte])
  case class AudioStats(doc_id: Long, format: String, sample_rate: Long,
      n_samples: Long, sum_samples: Long, sum_abs: Long)

  /** Closed-form 16-bit PCM per doc — the generative formula BOTH the
    * synthesizer and the oracle evaluate, so a genuine WAV
    * encode→decode round-trip sits between two independent evaluations
    * (the op80_image_codec argument, applied to audio). */
  def audioLen(d: Long): Int = (256 + d % 129).toInt
  def audioSample(d: Long, i: Int): Int =
    (((d * 31 + i.toLong * 17) % 65536) - 32768).toInt

  /** Synthesize REAL audio payloads: each doc renders its formula PCM
    * (mono, 16-bit signed little-endian, 8 kHz) through the JDK's
    * actual WAV writer — a lossless container, so decode recovers the
    * exact samples. javax.sound.sampled ships with the JDK: the same
    * zero-dependency argument that made the image leg real (the
    * generic [[decodeFeatures]] stub stands in only for codecs that
    * genuinely aren't in the container — video remains there). */
  def synthesizeAudio(spark: SparkSession, dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        it.map { d =>
          val n = audioLen(d)
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = audioSample(d, i)
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            /*signed=*/ true, /*bigEndian=*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writeWav(ais, bos)
          AudioRecord(d, bos.toByteArray)
        }
      }
  }

  /** REAL decode: javax.sound.sampled parses the RIFF/WAVE container
    * (header, fmt chunk, data chunk) and streams the PCM back; stats
    * are exact integer witnesses (count, sum, abs-sum of samples).
    * Batched per partition like [[decodeImageStats]] — narrow, no
    * shuffle, payloads stream through the codec one bounded batch at a
    * time. */
  def decodeAudioStats(audio: Dataset[AudioRecord],
      batchSize: Int = 64): Dataset[AudioStats] = {
    implicit val enc = Encoders.product[AudioStats]
    audio.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val ais = readWav(r.payload)
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1
            && !f.isBigEndian,
            s"unexpected decoded format for doc ${r.doc_id}: $f")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          var sum = 0L; var sabs = 0L
          var i = 0
          while (i < n) {
            val s = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
            sum += s; sabs += math.abs(s)
            i += 1
          }
          AudioStats(r.doc_id, "wav", f.getSampleRate.toLong, n.toLong,
            sum, sabs)
        }
      }
    }
  }

  /** op248's generative formula: speech-with-pauses — every 3rd
    * 64-sample frame (phase-shifted by doc) is QUIET (small residual
    * noise), the rest carry the loud sawtooth. Frame-aligned silences
    * give the VAD genuinely fragmented activity (many islands per
    * clip), unlike op133's continuous tone. Evaluated independently by
    * the oracle in SQL. */
  def vadSample(d: Long, i: Int): Int =
    if (((i / 64) + d) % 3 == 0) (((d * 7 + i * 3) % 201) - 100).toInt
    else (((d * 31 + i * 17) % 65536) - 32768).toInt

  /** op248's encode leg: the VAD formula through the same real WAV
    * writer as [[synthesizeAudio]]. */
  def synthesizeVadAudio(spark: SparkSession,
      dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        it.map { d =>
          val n = audioLen(d)
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = vadSample(d, i)
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            /*signed=*/ true, /*bigEndian=*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writeWav(ais, bos)
          AudioRecord(d, bos.toByteArray)
        }
      }
  }

  case class AudioFrame(doc_id: Long, frame_idx: Long, n_in_frame: Long,
      energy: Long)

  /** op248's decode leg: REAL WAV decode (same javax.sound path as
    * [[decodeAudioStats]]) reduced to per-FRAME integer energies
    * (Σ v² over `frameSize`-sample frames; the last frame may be
    * partial and reports its true size). Energy is the VAD feature —
    * emitting it per frame instead of per clip is what lets the
    * segmentation run as plain grid algebra downstream. */
  def decodeAudioFrameEnergy(audio: Dataset[AudioRecord],
      frameSize: Int = 64, batchSize: Int = 64): Dataset[AudioFrame] = {
    implicit val enc = Encoders.product[AudioFrame]
    audio.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val ais = readWav(r.payload)
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1
            && !f.isBigEndian,
            s"unexpected decoded format for doc ${r.doc_id}: $f")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          (0 until (n + frameSize - 1) / frameSize).iterator.map { fi =>
            val lo = fi * frameSize
            val hi = math.min(lo + frameSize, n)
            var e = 0L
            var i = lo
            while (i < hi) {
              val s = (bytes(2 * i + 1) << 8) | (bytes(2 * i) & 0xff)
              e += s.toLong * s
              i += 1
            }
            AudioFrame(r.doc_id, fi.toLong, (hi - lo).toLong, e)
          }
        }
      }
    }
  }

  /** op283's generative formula: GAIN-VARIED COPIES of pseudo-random
    * recordings. Groups of 3 consecutive doc ids share one base signal
    * (doc-keyed double-mod quadratic — (u_g+1)(i+17)(i+29) mod 1000003
    * mod 4096, the nonlinearity that decorrelates docs: any formula
    * AFFINE in i modulo a power of two is a shifted walk and collapses
    * every doc onto near-identical energy profiles); group member
    * m = d mod 3 plays the SAME recording at gain 1+m. Uniform gain
    * scales every frame energy by (1+m)² and leaves the delta SIGNS
    * untouched, so group members are fingerprint-IDENTICAL — the
    * textbook audio near-dup (same recording, different volume) that
    * the fingerprint is designed to catch, planted at every SF.
    * op133's continuous ramp is DEGENERATE for this op (its energy
    * profile is doc-independent: the first cut matched all C(500,2)
    * pairs — the fixture-degeneracy lesson, checked before shipping);
    * measured at sf0.01: 167 distinct fingerprints over 500 docs,
    * 499 planted identical pairs + ~45 random tail pairs ≤ 5 bits. */
  def fpSample(d: Long, i: Int): Int = {
    val g = d / 3
    val u = (g * 2654435761L) % 1000003L
    val v0 = ((u + 1L) * (i + 17L) * (i + 29L)) % 1000003L
    (((v0 % 4096L) - 2048L) * (1L + d % 3L)).toInt
  }

  /** op283's encode leg: the amplitude-modulated formula through the
    * same real WAV writer as [[synthesizeAudio]]. */
  def synthesizeFpAudio(spark: SparkSession,
      dir: String): Dataset[AudioRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        it.map { d =>
          val n = audioLen(d)
          val bytes = new Array[Byte](n * 2)
          var i = 0
          while (i < n) {
            val s = fpSample(d, i)
            bytes(2 * i) = (s & 0xff).toByte
            bytes(2 * i + 1) = ((s >> 8) & 0xff).toByte
            i += 1
          }
          val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1,
            /*signed=*/ true, /*bigEndian=*/ false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(bytes), fmt, n.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          writeWav(ais, bos)
          AudioRecord(d, bos.toByteArray)
        }
      }
  }

  case class AudioFpRecord(doc_id: Long, fp: Long)

  /** 30-bit spectral-band energy fingerprint from the REAL decoded
    * samples — the audio modality's aHash. The clip is cut into
    * 16-sample frames; inside each frame a one-level Haar filter bank
    * splits adjacent sample pairs into a LOW band (pair sums) and a
    * HIGH band (pair differences), and each band's frame energy is the
    * exact integer Σ(component²). Bit t (t = 0..14) is 1 iff the low
    * band's energy strictly rises frame t → t+1; bits 15..29 are the
    * same deltas for the high band — the Haitsma-Kalker
    * energy-delta-sign construction on a genuine 2-band spectral
    * split, all-integer so the oracle replays it bit-for-bit from the
    * generative PCM formula. The shortest fixture clip (256 samples =
    * 16 frames) fills all 15 deltas, so every fingerprint is fully
    * populated. Decode runs in the batched mapPartitions path (the
    * op133 shape); a fingerprint match proves WAV round-trip + filter
    * bank + thresholding end-to-end. */
  def audioFingerprint(audio: Dataset[AudioRecord],
      batchSize: Int = 64): Dataset[AudioFpRecord] = {
    implicit val enc = Encoders.product[AudioFpRecord]
    val frameSize = 16
    val nDeltas = 15
    audio.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val ais = readWav(r.payload)
          val f = ais.getFormat
          require(f.getSampleSizeInBits == 16 && f.getChannels == 1
            && !f.isBigEndian,
            s"unexpected decoded format for doc ${r.doc_id}: $f")
          val bytes = ais.readAllBytes()
          val n = bytes.length / 2
          val nFrames = math.min(n / frameSize, nDeltas + 1)
          val lowE = new Array[Long](nFrames)
          val highE = new Array[Long](nFrames)
          var t = 0
          while (t < nFrames) {
            var j = 0
            var lo = 0L
            var hi = 0L
            while (j < frameSize / 2) {
              val i0 = t * frameSize + 2 * j
              val a = ((bytes(2 * i0 + 1) << 8) |
                (bytes(2 * i0) & 0xff)).toLong
              val b = ((bytes(2 * i0 + 3) << 8) |
                (bytes(2 * i0 + 2) & 0xff)).toLong
              lo += (a + b) * (a + b)
              hi += (a - b) * (a - b)
              j += 1
            }
            lowE(t) = lo
            highE(t) = hi
            t += 1
          }
          var fp = 0L
          t = 0
          while (t < nFrames - 1) {
            if (lowE(t + 1) > lowE(t)) fp |= 1L << t
            if (highE(t + 1) > highE(t)) fp |= 1L << (nDeltas + t)
            t += 1
          }
          AudioFpRecord(r.doc_id, fp)
        }
      }
    }
  }

  // ---- real VIDEO codec leg (op135): animated GIF via javax.imageio ----

  case class VideoRecord(doc_id: Long, payload: Array[Byte])
  case class VideoFrameStats(doc_id: Long, format: String, frame_idx: Long,
      n_frames: Long, width: Long, height: Long, sum_gray: Long)

  /** Closed-form multi-frame grayscale video per doc — the generative
    * formula BOTH the synthesizer and the oracle evaluate, so a genuine
    * multi-frame encode→decode round-trip sits between two independent
    * evaluations (the op80_image_codec argument, applied to video).
    * Grayscale because GIF is an indexed-color format: a 256-gray
    * palette makes the codec exactly lossless. */
  def videoFrames(d: Long): Int = (4 + d % 5).toInt
  def videoWidth(d: Long): Int = 8 + (d % 9).toInt
  def videoHeight(d: Long): Int = 8 + (d % 7).toInt
  def videoPixel(d: Long, f: Int, x: Int, y: Int): Int =
    ((d * 31 + f * 19 + x * 7 + y * 13) % 256).toInt

  /** 256-entry gray palette: index i = gray level i. An explicit
    * IndexColorModel (rather than TYPE_BYTE_GRAY) pins the palette the
    * writer embeds, making the round-trip exact by construction. */
  private def grayPalette: java.awt.image.IndexColorModel = {
    val ramp = Array.tabulate(256)(_.toByte)
    new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
  }

  /** Synthesize REAL video payloads: each doc renders its formula frames
    * and encodes them as one animated GIF through the JDK's actual GIF
    * sequence writer (`prepareWriteSequence`/`writeToSequence`) — each
    * frame independently LZW-compressed in the container. javax.imageio
    * ships with the JDK: the same zero-dependency argument that made the
    * image and audio legs real. Video no longer lives in the declared
    * [[decodeFeatures]] stub. */
  def synthesizeVideos(spark: SparkSession, dir: String): Dataset[VideoRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        val cm = grayPalette
        it.map { d =>
          val w = videoWidth(d); val h = videoHeight(d)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < videoFrames(d)) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, videoPixel(d, f, x, y))
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          VideoRecord(d, bos.toByteArray)
        }
      }
  }

  /** REAL frame sampling + decode: javax.imageio parses the GIF
    * container and decodes ONLY every `stride`-th frame — GIF frames
    * are independently LZW-coded, so the reader skips non-sampled
    * frames via sub-block lengths without decompressing them (the shape
    * real video sampling needs: seek, don't transcode). Stats are exact
    * integer pixel sums read through the color model (palette-order
    * independent). Batched per partition like [[decodeImageStats]]. */
  def sampleVideoStats(videos: Dataset[VideoRecord], stride: Int = 2,
      batchSize: Int = 64): Dataset[VideoFrameStats] = {
    implicit val enc = Encoders.product[VideoFrameStats]
    videos.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.flatMap { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          val n = reader.getNumImages(/*allowSearch=*/ true)
          val out = (0 until n by stride).map { f =>
            val img = reader.read(f)
            var sum = 0L
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) {
                sum += img.getRGB(x, y) & 0xff
                x += 1
              }
              y += 1
            }
            VideoFrameStats(r.doc_id, "gif", f.toLong, n.toLong,
              img.getWidth.toLong, img.getHeight.toLong, sum)
          }
          reader.dispose()
          iis.close()
          out
        }
      }
    }
  }

  /** REAL decode: javax.imageio parses the PNG/BMP container and
    * decompresses the pixels; stats are exact integer channel sums.
    * Batched per partition like [[decodeFeatures]] — a narrow pass, no
    * shuffle; at 100 TB the payload column streams through the codec
    * one bounded batch at a time. */
  def decodeImageStats(images: Dataset[ImageRecord],
      batchSize: Int = 64): Dataset[ImageStats] = {
    implicit val enc = Encoders.product[ImageStats]
    images.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable payload for doc ${r.doc_id}")
          var sr = 0L; var sg = 0L; var sb = 0L
          var y = 0
          while (y < img.getHeight) {
            var x = 0
            while (x < img.getWidth) {
              val rgb = img.getRGB(x, y)
              sr += (rgb >> 16) & 0xff; sg += (rgb >> 8) & 0xff; sb += rgb & 0xff
              x += 1
            }
            y += 1
          }
          ImageStats(r.doc_id, r.format, img.getWidth, img.getHeight, sr, sg, sb)
        }
      }
    }
  }

  // ---- video near-dup leg (op284): brightness-shifted GIF copies ----

  /** op284's generative formula: BRIGHTNESS-SHIFTED COPIES of
    * pseudo-random clips — the video analogue of op283's gain-varied
    * audio. Groups of 3 consecutive doc ids share one base clip
    * (geometry keyed by the GROUP: w = 8+g%9, h = 8+g%7, 4+g%5 frames;
    * pixels from the double-mod quadratic in the flattened
    * (frame, y, x) index — the same nonlinearity op283 needed, since
    * affine-mod pixel formulas collapse every doc onto near-identical
    * statistics); member m = d mod 3 shows the SAME clip at brightness
    * +32·m. Base pixels stay ≤ 191 so the shift never wraps the 8-bit
    * palette, and the fingerprint's integer-mean comparisons are
    * exactly shift-invariant ((Σ+n·off)/n = Σ/n + off), so group
    * members are fingerprint-IDENTICAL — the planted positives.
    * Measured at sf0.01: 166 distinct fingerprints over 500 docs,
    * 508 identical pairs (499 planted + random tail) and 540 pairs at
    * 1-2 bits. */
  def ndVideoGeom(g: Long): (Int, Int, Int) =
    ((8 + g % 9).toInt, (8 + g % 7).toInt, (4 + g % 5).toInt)
  def ndVideoPixel(d: Long, f: Int, x: Int, y: Int): Int = {
    val g = d / 3
    val (w, h, _) = ndVideoGeom(g)
    val k = f.toLong * (w * h) + y.toLong * w + x
    val u = (g * 2654435761L) % 1000003L
    val base = (((u + 1L) * (k + 17L) * (k + 29L)) % 1000003L) % 192L
    (base + (d % 3L) * 32L).toInt
  }

  /** op284's encode leg: the brightness-shift formula through the same
    * real animated-GIF sequence writer as [[synthesizeVideos]]. */
  def synthesizeNdVideos(spark: SparkSession,
      dir: String): Dataset[VideoRecord] = {
    import spark.implicits._
    codecDocIds(spark, dir)
      .mapPartitions { it =>
        val cm = grayPalette
        it.map { d =>
          val (w, h, nf) = ndVideoGeom(d / 3)
          val bos = new java.io.ByteArrayOutputStream()
          val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
          val writer =
            javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
          writer.setOutput(ios)
          writer.prepareWriteSequence(null)
          var f = 0
          while (f < nf) {
            val img = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_BYTE_INDEXED, cm)
            val raster = img.getRaster
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                raster.setSample(x, y, 0, ndVideoPixel(d, f, x, y))
                x += 1
              }
              y += 1
            }
            writer.writeToSequence(
              new javax.imageio.IIOImage(img, null, null), null)
            f += 1
          }
          writer.endWriteSequence()
          writer.dispose()
          ios.close()
          VideoRecord(d, bos.toByteArray)
        }
      }
  }

  case class VideoFpRecord(doc_id: Long, fp: Long)

  /** 16-bit perceptual video fingerprint from the REAL decoded frames:
    * the first 4 frames (every fixture clip has ≥ 4) each contribute a
    * 2×2 spatial aHash — quadrant cell of pixel x is (x·2) div w, bit
    * = integer cell mean > integer frame mean — packed frame-major.
    * Integer-mean comparisons make the fingerprint exactly invariant
    * to uniform brightness shifts (the planted near-dup class). Decode
    * runs in the batched mapPartitions path (the op135 shape); a
    * fingerprint match proves GIF round-trip + pooling + thresholding
    * end-to-end. */
  def videoFingerprint(videos: Dataset[VideoRecord],
      batchSize: Int = 64): Dataset[VideoFpRecord] = {
    implicit val enc = Encoders.product[VideoFpRecord]
    videos.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(r.payload))
          val reader =
            javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
          reader.setInput(iis)
          // the 16-bit fingerprint packs exactly 4 frames; a shorter
          // clip would silently change the contract, so fail loudly
          // with the offending doc (matches the audio decode guards)
          val nFrames = reader.getNumImages(true)
          require(nFrames >= 4,
            s"videoFingerprint: doc ${r.doc_id} has $nFrames GIF " +
              "frames; the 4-frame fingerprint contract needs >= 4")
          var fp = 0L
          var bit = 0
          var f = 0
          while (f < 4) {
            val img = reader.read(f)
            val w = img.getWidth; val h = img.getHeight
            val sums = Array.ofDim[Long](2, 2)
            val ns = Array.ofDim[Long](2, 2)
            var fsum = 0L
            var y = 0
            while (y < h) {
              val cj = y * 2 / h
              var x = 0
              while (x < w) {
                val ci = x * 2 / w
                val gray = img.getRGB(x, y) & 0xff
                sums(ci)(cj) += gray
                ns(ci)(cj) += 1
                fsum += gray
                x += 1
              }
              y += 1
            }
            val fmean = fsum / (w.toLong * h)
            var ci = 0
            while (ci < 2) {
              var cj = 0
              while (cj < 2) {
                if (sums(ci)(cj) / ns(ci)(cj) > fmean) fp |= 1L << bit
                bit += 1
                cj += 1
              }
              ci += 1
            }
            f += 1
          }
          reader.dispose()
          iis.close()
          VideoFpRecord(r.doc_id, fp)
        }
      }
    }
  }

  case class AHashRecord(doc_id: Long, h_lo: Long, h_hi: Long)

  /** 64-bit average-hash (aHash) from the REAL decoded pixels: gray =
    * (r+g+b) div 3, pooled onto an 8×8 cell grid (cell of pixel x =
    * (x·8) div w — the same integer rule the oracle replays), cell
    * average by integer division, bit = cell above the 64-cell mean;
    * the hash is carried as TWO 32-bit halves in BIGINTs so bit 63
    * never touches the sign bit (a single 64-bit sum would overflow
    * into HUGEINT on the oracle side). The perceptual-dedup primitive
    * for image corpora: near-identical images land within a few bits.
    *
    * Decode runs in the batched mapPartitions path (the op80 shape);
    * the oracle evaluates the generative pixel formula instead, so a
    * hash match proves codec round-trip + pooling + thresholding
    * end-to-end. */
  def imageAHash(images: Dataset[ImageRecord],
      batchSize: Int = 64): Dataset[AHashRecord] = {
    implicit val enc = Encoders.product[AHashRecord]
    images.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        batch.iterator.map { r =>
          val img = javax.imageio.ImageIO.read(
            new java.io.ByteArrayInputStream(r.payload))
          require(img != null, s"undecodable payload for doc ${r.doc_id}")
          val w = img.getWidth; val h = img.getHeight
          val sums = Array.ofDim[Long](8, 8)
          val ns = Array.ofDim[Long](8, 8)
          var y = 0
          while (y < h) {
            val cj = y * 8 / h
            var x = 0
            while (x < w) {
              val ci = x * 8 / w
              val rgb = img.getRGB(x, y)
              val gray = (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                (rgb & 0xff)) / 3
              sums(ci)(cj) += gray
              ns(ci)(cj) += 1
              x += 1
            }
            y += 1
          }
          val avgs = Array.tabulate(8, 8)((i, j) => sums(i)(j) / ns(i)(j))
          val mean = avgs.map(_.sum).sum / 64
          var lo = 0L; var hi = 0L
          var i = 0
          while (i < 8) {
            var j = 0
            while (j < 8) {
              if (avgs(i)(j) > mean) {
                val pos = i * 8 + j
                if (pos < 32) lo |= 1L << pos
                else hi |= 1L << (pos - 32)
              }
              j += 1
            }
            i += 1
          }
          AHashRecord(r.doc_id, lo, hi)
        }
      }
    }
  }
}
