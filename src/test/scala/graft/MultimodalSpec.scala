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

  test("image codec leg: payloads are genuine PNG/BMP and decode recovers the formula") {
    // the payload must be a real container (magic bytes), and
    // javax.imageio's decode must recover the exact generative pixels —
    // checked against a direct Scala evaluation of the formula, fully
    // independent of the encode path
    val images = Multimodal.synthesizeImages(spark, sfDir)
      .filter(col("doc_id") < 40L).collect()
    assert(images.length == 40)
    images.foreach { r =>
      val head = r.payload.take(2).map(_ & 0xff)
      if (r.doc_id % 2 == 0)
        assert(head.sameElements(Array(0x89, 0x50)), // \x89PNG
          s"doc ${r.doc_id}: payload is not a PNG container")
      else
        assert(head.sameElements(Array(0x42, 0x4d)), // BM
          s"doc ${r.doc_id}: payload is not a BMP container")
    }
    val stats = Multimodal.decodeImageStats(
        Multimodal.synthesizeImages(spark, sfDir).filter(col("doc_id") < 40L),
        batchSize = 7) // short last chunk must still decode
      .collect().sortBy(_.doc_id)
    stats.foreach { s =>
      val d = s.doc_id
      val (w, h) = (Multimodal.imageWidth(d), Multimodal.imageHeight(d))
      assert(s.width == w && s.height == h,
        s"doc $d: decoded geometry ${s.width}x${s.height}, expected ${w}x$h")
      var er = 0L; var eg = 0L; var eb = 0L
      for (y <- 0 until h; x <- 0 until w) {
        er += Multimodal.pixelR(d, x, y)
        eg += Multimodal.pixelG(d, x, y)
        eb += Multimodal.pixelB(d, x, y)
      }
      assert((s.sum_r, s.sum_g, s.sum_b) == ((er, eg, eb)),
        s"doc $d: decoded channel sums diverge from the formula")
    }
  }

  test("audio codec leg: payloads are genuine RIFF/WAVE and decode recovers the formula") {
    // the payload must be a real WAV container (RIFF....WAVE magic),
    // and javax.sound.sampled's decode must recover the exact PCM —
    // checked against a direct Scala evaluation of the sample formula,
    // fully independent of the encode path
    val audio = Multimodal.synthesizeAudio(spark, sfDir)
      .filter(col("doc_id") < 40L).collect()
    assert(audio.length == 40)
    audio.foreach { r =>
      assert(new String(r.payload.take(4), "US-ASCII") == "RIFF"
        && new String(r.payload.slice(8, 12), "US-ASCII") == "WAVE",
        s"doc ${r.doc_id}: payload is not a RIFF/WAVE container")
    }
    val stats = Multimodal.decodeAudioStats(
        Multimodal.synthesizeAudio(spark, sfDir).filter(col("doc_id") < 40L),
        batchSize = 7) // short last chunk must still decode
      .collect().sortBy(_.doc_id)
    stats.foreach { s =>
      val d = s.doc_id
      val n = Multimodal.audioLen(d)
      val samples = (0 until n).map(Multimodal.audioSample(d, _))
      assert(s.sample_rate == 8000L && s.n_samples == n.toLong,
        s"doc $d: decoded ${s.n_samples} samples at ${s.sample_rate} Hz")
      assert((s.sum_samples, s.sum_abs) ==
        ((samples.map(_.toLong).sum, samples.map(v => math.abs(v).toLong).sum)),
        s"doc $d: decoded sample sums diverge from the formula")
    }
  }

  test("video codec leg: payloads are genuine animated GIFs and sampled decode recovers the formula") {
    // the payload must be a real GIF container (GIF87a/GIF89a magic)
    // holding ALL frames, and the frame-sampled decode (stride 2) must
    // recover the exact generative pixels of the sampled indices only —
    // checked against a direct Scala evaluation of the frame formula,
    // fully independent of the encode path
    val videos = Multimodal.synthesizeVideos(spark, sfDir)
      .filter(col("doc_id") < 40L).collect()
    assert(videos.length == 40)
    videos.foreach { r =>
      val magic = new String(r.payload.take(6), "US-ASCII")
      assert(magic == "GIF89a" || magic == "GIF87a",
        s"doc ${r.doc_id}: payload is not a GIF container ($magic)")
    }
    val stats = Multimodal.sampleVideoStats(
        Multimodal.synthesizeVideos(spark, sfDir).filter(col("doc_id") < 40L),
        stride = 2, batchSize = 7) // short last chunk must still decode
      .collect().groupBy(_.doc_id)
    assert(stats.size == 40)
    stats.foreach { case (d, rows) =>
      val nf = Multimodal.videoFrames(d)
      val (w, h) = (Multimodal.videoWidth(d), Multimodal.videoHeight(d))
      val wantIdx = (0 until nf by 2).map(_.toLong)
      assert(rows.map(_.frame_idx).sorted.toSeq == wantIdx,
        s"doc $d: sampled frames ${rows.map(_.frame_idx).sorted.toSeq}, expected $wantIdx")
      rows.foreach { s =>
        assert(s.n_frames == nf.toLong && s.width == w.toLong && s.height == h.toLong,
          s"doc $d frame ${s.frame_idx}: container geometry diverges")
        var want = 0L
        for (y <- 0 until h; x <- 0 until w)
          want += Multimodal.videoPixel(d, s.frame_idx.toInt, x, y)
        assert(s.sum_gray == want,
          s"doc $d frame ${s.frame_idx}: decoded pixel sum diverges from the formula")
      }
    }
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

  test("op228 aHash: decoded-pixel hashes equal a driver-side formula replay") {
    import graft.functions.Multimodal
    val got = graft.queries.MultimodalQueries
      .op228ImageAhash(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("h_lo"), r.getAs[Long]("h_hi"))).toMap
    val ids = got.keys.toSeq.sorted
    ids.foreach { d =>
      val w = Multimodal.imageWidth(d); val h = Multimodal.imageHeight(d)
      val sums = Array.ofDim[Long](8, 8); val ns = Array.ofDim[Long](8, 8)
      for (y <- 0 until h; x <- 0 until w) {
        val gray = (Multimodal.pixelR(d, x, y) + Multimodal.pixelG(d, x, y) +
          Multimodal.pixelB(d, x, y)) / 3
        sums(x * 8 / w)(y * 8 / h) += gray
        ns(x * 8 / w)(y * 8 / h) += 1
      }
      val avgs = Array.tabulate(8, 8)((i, j) => sums(i)(j) / ns(i)(j))
      val mean = avgs.map(_.sum).sum / 64
      var lo = 0L; var hi = 0L
      for (i <- 0 until 8; j <- 0 until 8) if (avgs(i)(j) > mean) {
        val pos = i * 8 + j
        if (pos < 32) lo |= 1L << pos else hi |= 1L << (pos - 32)
      }
      assert(got(d) == (lo, hi), s"doc $d")
      // halves genuinely 32-bit (sign-safe on both engines)
      assert(got(d)._1 >= 0 && got(d)._1 < (1L << 32))
      assert(got(d)._2 >= 0 && got(d)._2 < (1L << 32))
    }
  }

  test("op229: banding at threshold 7 < 8 bands is PROVABLY lossless") {
    val hashes = graft.queries.MultimodalQueries
      .op228ImageAhash(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("h_lo"),
        r.getAs[Long]("h_hi")))
    val got = graft.queries.MultimodalQueries
      .op229ImageNeardup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    // ALL-PAIRS ground truth at <= 7 — the banded join must equal it
    // exactly (pigeonhole: <= 7 differing bits leave a clean 8-bit band)
    val want = (for {
      i <- hashes.indices; j <- (i + 1) until hashes.length
      (da, la, ha) = hashes(i); (db, lb, hb) = hashes(j)
      ham = java.lang.Long.bitCount(la ^ lb) +
        java.lang.Long.bitCount(ha ^ hb)
      if ham <= 7
    } yield {
      val (x, y) = if (da < db) (da, db) else (db, da)
      (x, y) -> ham.toLong
    }).toMap
    assert(got == want)
    assert(got.nonEmpty, "no near-dup images on the fixture — inert")
    assert(got.values.exists(_ > 0), "only exact hash matches exercised")
  }

  test("op283: audio banding at threshold 5 < 6 bands is PROVABLY lossless") {
    import spark.implicits._
    val fps = graft.functions.Multimodal.audioFingerprint(
        graft.functions.Multimodal.synthesizeFpAudio(spark, sfDir))
      .collect().map(r => (r.doc_id, r.fp))
    val got = graft.queries.MultimodalQueries
      .op283AudioNeardup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    // ALL-PAIRS ground truth at <= 5 — the banded join must equal it
    // exactly (pigeonhole: <= 5 differing bits leave a clean 5-bit band)
    val want = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      (da, fa) = fps(i); (db, fb) = fps(j)
      ham = java.lang.Long.bitCount(fa ^ fb)
      if ham <= 5
    } yield {
      val (x, y) = if (da < db) (da, db) else (db, da)
      (x, y) -> ham.toLong
    }).toMap
    assert(got == want)
    assert(got.nonEmpty, "no near-dup audio on the fixture — inert")
    // the planted gain-varied copies fingerprint-match exactly...
    assert(got.values.exists(_ == 0L), "gain-invariance arm inert")
    // ...and the random tail exercises genuine NEAR (not exact) matches
    assert(got.values.exists(_ > 0), "only exact fingerprint matches exercised")
    // gain invariance is structural, not incidental: every within-group
    // pair (same base recording, gains 1x/2x/3x) is Hamming 0
    val byGroup = fps.groupBy(_._1 / 3).values.filter(_.length > 1)
    byGroup.foreach { g =>
      assert(g.map(_._2).distinct.length == 1,
        s"gain-varied copies of group ${g.head._1 / 3} diverged")
    }
  }

  test("op284: video banding at threshold 2 < 4 bands is PROVABLY lossless") {
    val fps = graft.functions.Multimodal.videoFingerprint(
        graft.functions.Multimodal.synthesizeNdVideos(spark, sfDir))
      .collect().map(r => (r.doc_id, r.fp))
    val got = graft.queries.MultimodalQueries
      .op284VideoNeardup(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        r.getAs[Long]("hamming")).toMap
    val want = (for {
      i <- fps.indices; j <- (i + 1) until fps.length
      (da, fa) = fps(i); (db, fb) = fps(j)
      ham = java.lang.Long.bitCount(fa ^ fb)
      if ham <= 2
    } yield {
      val (x, y) = if (da < db) (da, db) else (db, da)
      (x, y) -> ham.toLong
    }).toMap
    assert(got == want)
    assert(got.nonEmpty, "no near-dup videos on the fixture — inert")
    assert(got.values.exists(_ == 0L), "brightness-invariance arm inert")
    assert(got.values.exists(_ > 0), "only exact fingerprint matches exercised")
    // brightness invariance is structural: every within-group pair
    // (same clip at brightness +0/+32/+64) is fingerprint-identical
    fps.groupBy(_._1 / 3).values.filter(_.length > 1).foreach { g =>
      assert(g.map(_._2).distinct.length == 1,
        s"brightness-shifted copies of group ${g.head._1 / 3} diverged")
    }
  }

  test("op230: image verdicts compose op61's pairs with op228's hashes exactly") {
    val pairs = graft.functions.Dedup.jaccardPairs(
        graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
        7000L, Some(100L))
      .collect().map(r => (r.getAs[Long]("doc_a"),
        r.getAs[Long]("doc_b"), r.getAs[Long]("jaccard_bp")))
    val hashes = graft.queries.MultimodalQueries
      .op228ImageAhash(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("h_lo"), r.getAs[Long]("h_hi"))).toMap
    val want = pairs.map { case (a, b, j) =>
      val (la, ha) = hashes(a); val (lb, hb) = hashes(b)
      val ham = java.lang.Long.bitCount(la ^ lb) +
        java.lang.Long.bitCount(ha ^ hb)
      (a, b, j, ham.toLong, if (ham <= 7) 1L else 0L)
    }.sortBy(x => (x._1, x._2)).toSeq
    val got = graft.queries.MultimodalQueries
      .op230ModalConsistency(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"),
        r.getAs[Long]("jaccard_bp"), r.getAs[Long]("hamming"),
        r.getAs[Long]("img_match"))).toSeq
    assert(got == want)
    // non-inert, and the flag is exactly the ham<=7 predicate
    assert(got.nonEmpty, "no text near-dups — audit inert")
    assert(got.forall(r => r._5 == (if (r._4 <= 7) 1L else 0L)))
    // the MISMATCH arm (the audit's reason to exist) fires
    assert(got.exists(_._5 == 0L), "mismatch arm inert")
  }

  test("op231: streamed image near-dup flags equal op229 exactly") {
    val batch = graft.queries.MultimodalQueries
      .op229ImageNeardup(spark, sfDir).collect().map(_.toSeq).toSeq
    val stream = graft.queries.MultimodalQueries
      .op231StreamImageNeardup(spark, sfDir).collect()
      .map(_.toSeq).toSeq
    assert(stream == batch)
    // both the same-batch and cross-batch legs are genuinely exercised
    val spans = batch.map(r => (r(0).asInstanceOf[Long] % 4,
      r(1).asInstanceOf[Long] % 4))
    assert(spans.exists(p => p._1 == p._2), "same-batch leg inert")
    assert(spans.exists(p => p._1 != p._2), "cross-batch leg inert")
  }

  test("op294/op295: streamed audio/video near-dup flags equal their batch ops") {
    for ((batchOp, streamOp) <- Seq(
        "op283_audio_neardup" -> "op294_stream_audio_neardup",
        "op284_video_neardup" -> "op295_stream_video_neardup")) {
      val batch = graft.queries.MultimodalQueries.defs(batchOp)(
        spark, sfDir).collect().map(_.toSeq).toSeq
      val stream = graft.queries.MultimodalQueries.defs(streamOp)(
        spark, sfDir).collect().map(_.toSeq).toSeq
      assert(stream == batch, s"$streamOp diverged from $batchOp")
      // both the same-batch and cross-batch legs genuinely exercised
      val spans = batch.map(r => (r(0).asInstanceOf[Long] % 4,
        r(1).asInstanceOf[Long] % 4))
      assert(spans.exists(p => p._1 == p._2), s"$streamOp same-batch inert")
      assert(spans.exists(p => p._1 != p._2), s"$streamOp cross-batch inert")
    }
  }

  test("op248: VAD segments replay the formula; islands genuinely split") {
    val got = graft.queries.MultimodalQueries.op248AudioVad(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    // independent replay from the generative formula (never the codec)
    val ids = Tables.documents(spark, sfDir).select("doc_id")
      .collect().map(_.getLong(0))
    val want = ids.sorted.flatMap { d =>
      val n = (256 + d % 129).toInt
      val frames = (0 until n).groupBy(_ / 64).toSeq.sortBy(_._1).map {
        case (f, is) =>
          val e = is.map { i =>
            val v = Multimodal.vadSample(d, i).toLong; v * v }.sum
          (f.toLong, is.size.toLong, e)
      }
      val totE = frames.map(_._3).sum
      val nTot = frames.map(_._2).sum
      val active = frames.filter(fr => fr._3 * nTot > totE * fr._2)
        .map(_._1)
      // islands: consecutive active frame indices
      active.foldLeft(Vector.empty[(Long, Long, Long)]) { (acc, f) =>
        acc.lastOption match {
          case Some((s, e, c)) if e == f - 1 =>
            acc.init :+ ((s, f, c + 1))
          case _ => acc :+ ((f, f, 1L))
        }
      }.map { case (s, e, c) => (d, s, e, c) }
    }
    assert(got.toSeq == want.toSeq)
    // the islands algebra must be exercised: multi-segment clips and
    // segments that start mid-clip both exist
    val perDoc = got.groupBy(_._1).view.mapValues(_.length)
    assert(perDoc.values.exists(_ > 1), "no clip fragments")
    assert(got.exists(_._2 > 0), "every segment starts at frame 0")
  }
}
