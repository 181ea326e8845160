package graft

import org.apache.spark.sql.functions._

import graft.functions.Similarity
import graft.sources.Tables

/** Similarity-search semantics: float-vs-quantized scorer agreement,
  * brute-force correctness, ANN recall, approx-distinct error bounds. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("quantized cosine agrees with float cosine within 2bp") {
    val emb = Tables.embeddings(spark, sfDir).limit(50)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("a"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("b"))
    val both = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(
        Similarity.cosBp(Similarity.quantize(col("a")),
          Similarity.quantize(col("b"))).as("q_bp"),
        (Similarity.cosine(col("a"), col("b")) * 10000d).as("f_bp"))
    val maxErr = both.select(max(abs(col("q_bp") - col("f_bp")))).as[Double].first()
    assert(maxErr <= 2.0, s"quantization error too large: $maxErr bp")
  }

  test("brute-force top-k matches a driver-side reference computation") {
    val emb = Tables.embeddings(spark, sfDir)
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cos(x: Array[Float], y: Array[Float]): Double = {
      val xi = x.map(v => math.floor(v.toDouble * 1e6).toLong)
      val yi = y.map(v => math.floor(v.toDouble * 1e6).toLong)
      val dot = xi.zip(yi).map { case (p, q) => p * q }.sum.toDouble
      dot / (math.sqrt(xi.map(v => v * v).sum.toDouble) *
        math.sqrt(yi.map(v => v * v).sum.toDouble))
    }
    val got = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 3), emb, 5)
      .orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val want = (0L until 3L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (q, n, math.floor(cos(vecs(q), vecs(n)) * 10000).toLong))
        .sortBy { case (_, n, bp) => (-bp, n) }
        .take(5)
    }
    assert(got.toSeq == want)
  }

  test("ANN (multi-table sign-LSH) reaches ≥50% recall@5 vs brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    val truth = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annTopK(queries, emb, 5, nBits = 4, nTables = 8)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & ann).size.toDouble / truth.size
    // random embeddings are LSH's worst case (neighbors at cos≈0.5):
    // p/table=(1-θ/π)^4≈0.2, 8 tables → expected recall ≈ 0.8
    assert(recall >= 0.5, s"ANN recall@5 too low: $recall")
  }

  test("IVF ANN reaches ≥40% recall@5 with 4/16 cells probed") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    val truth = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(queries, emb, 5, nCells = 16, nProbe = 4)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & ivf).size.toDouble / truth.size
    // random vectors spread cells nearly uniformly — 4/16 probes bounds
    // the expected recall near 25% plus locality gains; gate at 40% to
    // require genuine locality, not the probe fraction alone
    assert(recall >= 0.4, s"IVF recall@5 too low: $recall")
  }

  test("Lloyd-refined IVF centroids hold recall and stay deterministic") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    val truth = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(iters: Int): Double = {
      val got = Similarity.ivfTopK(queries, emb, 5, nCells = 16, nProbe = 4,
        lloydIters = iters)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val seed = recallOf(0)
    val lloyd = recallOf(2)
    info(f"IVF recall@5: seeded=$seed%.3f lloyd2=$lloyd%.3f")
    // on random embeddings Lloyd tightens cells but can't invent
    // structure — require it not to REGRESS materially and to stay
    // above the absolute gate the seeded index must already clear
    assert(lloyd >= 0.4, s"Lloyd IVF recall@5 too low: $lloyd")
    assert(lloyd >= seed - 0.05,
      s"Lloyd refinement regressed recall: seed=$seed lloyd=$lloyd")
    // integer-domain means are associative → centroids are run-stable
    val c1 = Similarity.lloydCentroids(emb, 16, 2)
      .orderBy("cent_id").collect().map(_.toString).toSeq
    val c2 = Similarity.lloydCentroids(emb, 16, 2)
      .orderBy("cent_id").collect().map(_.toString).toSeq
    assert(c1 == c2, "Lloyd centroids differ between identical runs")
  }

  test("PQ ANN (8x16 codes, ADC) reaches usable recall@5 and is run-stable") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    val truth = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    def run(): Set[(Long, Long)] =
      Similarity.pqTopK(queries, emb, 5)
        .select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val pq = run()
    val recall = (truth & pq).size.toDouble / truth.size
    info(f"PQ recall@5: $recall%.3f")
    // 4-byte codes on RANDOM embeddings (PQ's worst case) reach ~0.24
    // raw; the exact rerank over the 50-wide shortlist lifts measured
    // recall to ~0.72 — gate at 0.5 so a real distortion regression
    // fails but sampling noise doesn't
    assert(recall >= 0.5, s"PQ recall@5 too low: $recall")
    assert(run() == pq, "PQ results differ between identical runs")
  }

  test("hyperplane generation matches golden values (shared root of every LSH bucket)") {
    // the md5-seeded planes are the one shared root of op66/op68
    // correctness AND of any LSH-bucketed storage layout already written
    // to disk — a refactor that silently shifts them would re-bucket the
    // world. Golden values derived INDEPENDENTLY (python hashlib md5,
    // first 7 bytes as a 56-bit int, /2^55 − 1) pin the contract:
    // exact doubles, and the floor(w·10⁶) longs the DuckDB oracle inlines.
    val t0 = Similarity.hyperplanes(4, 64, 0)
    val t1 = Similarity.hyperplanes(4, 64, 1)
    val t7 = Similarity.hyperplanes(4, 64, 7)
    assert(t0.length == 4 && t0.forall(_.length == 64))
    assert(t0(0)(0) == 0.15183136609002257)
    assert(t0(0)(1) == 0.8803614282343124)
    assert(t0(0)(2) == -0.6083317291318546)
    assert(t0(1)(0) == 0.5766064140887326)
    assert(t0(3)(63) == -0.6224825249867076)
    assert(t1(0)(0) == -0.9789437615554732)
    assert(t7(3)(63) == -0.35235795829967376)
    // the quantized-long view the oracle SQL embeds as literals
    assert(math.floor(t0(0)(0) * 1000000d).toLong == 151831L)
    assert(math.floor(t0(0)(2) * 1000000d).toLong == -608332L)
    assert(math.floor(t7(3)(63) * 1000000d).toLong == -352358L)
    // range contract: every weight in [-1, 1)
    assert((t0 ++ t1 ++ t7).flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("prebuilt persisted IVF/PQ indexes probe to the exact end-to-end results") {
    // the build-once/probe-many contract: ivfProbe/pqProbe over an index
    // written to parquet must reproduce ivfTopK/pqTopK bit-for-bit (all
    // stored values are bigint, so the storage round-trip is exact)
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    val dir = java.nio.file.Files.createTempDirectory("graft_index_eq_")
    try {
      def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
        df.orderBy("q_id", "rank").collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      Similarity.ivfIndexWrite(emb, s"$dir/ivf", nCells = 16, lloydIters = 2)
      assert(rows(Similarity.ivfProbe(queries, s"$dir/ivf", 5, nProbe = 4)) ==
        rows(Similarity.ivfTopK(queries, emb, 5, nCells = 16, nProbe = 4,
          lloydIters = 2)),
        "IVF probe over the persisted index diverged from the end-to-end build")
      Similarity.pqIndexWrite(emb, s"$dir/pq")
      assert(rows(Similarity.pqProbe(queries, s"$dir/pq", 5)) ==
        rows(Similarity.pqTopK(queries, emb, 5)),
        "PQ probe over the persisted index diverged from the end-to-end build")
      Similarity.lshIndexWrite(emb, s"$dir/lsh", nBits = 4, nTables = 8)
      assert(rows(Similarity.lshProbe(queries, s"$dir/lsh", 5)) ==
        rows(Similarity.annTopK(queries, emb, 5)),
        "LSH probe over the persisted index diverged from the end-to-end build")
      Similarity.sq8IndexWrite(emb, s"$dir/sq8", nCells = 16, lloydIters = 2)
      assert(rows(Similarity.sq8Probe(queries, s"$dir/sq8", 5, nProbe = 4)) ==
        rows(Similarity.ivfSq8TopK(queries, emb, 5, nCells = 16, nProbe = 4,
          lloydIters = 2)),
        "SQ8 probe over the persisted index diverged from the end-to-end build")
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively(): Unit
    }
  }

  test("index appends ingest increments without retraining (IVF/PQ exhaustive-probe = brute force; LSH append = union build)") {
    // the incremental-ingest contract: build each index on half the
    // corpus, append the other half against the EXISTING trained state
    // (centroids / codebook / planes — no retraining), and verify the
    // appended index is complete:
    //  - IVF probed with nProbe = nCells scans every cell ⇒ must equal
    //    brute force over the FULL corpus
    //  - PQ probed with shortlist = |corpus| reranks every candidate
    //    exactly ⇒ must equal brute force over the FULL corpus
    //  - LSH has nothing trained, so append ≡ union build ⇒ the probe
    //    must equal the end-to-end annTopK over the FULL corpus
    // each fails if any appended vector goes missing or any stored
    // value drifts through the storage round-trip
    val emb = Tables.embeddings(spark, sfDir)
    val half = emb.filter(col("vec_id") % 2 === 0)
    val rest = emb.filter(col("vec_id") % 2 =!= 0)
    val queries = emb.filter(col("vec_id") < 16)
    val n = emb.count().toInt
    val dir = java.nio.file.Files.createTempDirectory("graft_index_append_")
    def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Long)] =
      df.orderBy("q_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    try {
      val brute = rows(Similarity.bruteForceTopK(queries, emb, 5))

      Similarity.ivfIndexWrite(half, s"$dir/ivf", nCells = 16)
      Similarity.ivfIndexAppend(rest, s"$dir/ivf")
      val total = spark.read.parquet(s"$dir/ivf/cells").count()
      assert(total == n.toLong, s"appended IVF cells hold $total rows")
      assert(rows(Similarity.ivfProbe(queries, s"$dir/ivf", 5, nProbe = 16))
        == brute, "full-probe of the appended IVF index diverged from brute force")

      Similarity.pqIndexWrite(half, s"$dir/pq")
      Similarity.pqIndexAppend(rest, s"$dir/pq")
      assert(rows(Similarity.pqProbe(queries, s"$dir/pq", 5, shortlist = n))
        == brute, "exhaustive-shortlist probe of the appended PQ index diverged from brute force")
      assert(spark.read.parquet(s"$dir/pq/codes_packed").count() == n.toLong,
        "serving layout missing appended vectors")
      // LEGACY dir (codes without codes_packed): append must publish a
      // FULL pack, not just the increment — the streaming ADC probe
      // trusts codes_packed/_SUCCESS as the complete serving layout
      Similarity.pqIndexWrite(half, s"$dir/pq_legacy")
      import scala.reflect.io.Directory
      new Directory(new java.io.File(s"$dir/pq_legacy/codes_packed"))
        .deleteRecursively()
      Similarity.pqIndexAppend(rest, s"$dir/pq_legacy")
      assert(
        spark.read.parquet(s"$dir/pq_legacy/codes_packed").count() == n.toLong,
        "legacy-dir append published a partial codes_packed table")

      Similarity.lshIndexWrite(half, s"$dir/lsh")
      Similarity.lshIndexAppend(rest, s"$dir/lsh")
      assert(rows(Similarity.lshProbe(queries, s"$dir/lsh", 5)) ==
        rows(Similarity.annTopK(queries, emb, 5)),
        "probe of the appended LSH index diverged from the union build")
      // the stored geometry wins over caller defaults: an index built
      // with non-default planes, probed AND appended with default args,
      // must still equal the matching end-to-end build — without the
      // meta table the default-plane probe would silently scan wrong
      // buckets
      Similarity.lshIndexWrite(half, s"$dir/lsh_g", nBits = 3, nTables = 4)
      Similarity.lshIndexAppend(rest, s"$dir/lsh_g") // defaults ignored
      assert(rows(Similarity.lshProbe(queries, s"$dir/lsh_g", 5)) ==
        rows(Similarity.annTopK(queries, emb, 5, nBits = 3, nTables = 4)),
        "stored LSH geometry did not override caller defaults")

      // IVF-PQ: every cell probed AND every candidate reranked exactly
      // ⇒ brute force; both code layouts must carry the full corpus
      Similarity.ivfPqIndexWrite(half, s"$dir/ivfpq", nCells = 16)
      Similarity.ivfPqIndexAppend(rest, s"$dir/ivfpq")
      assert(rows(Similarity.ivfPqProbe(queries, s"$dir/ivfpq", 5,
          nProbe = 16, shortlist = n))
        == brute,
        "exhaustive probe of the appended IVF-PQ index diverged from brute force")
      assert(spark.read.parquet(s"$dir/ivfpq/codes_packed").count() == n.toLong,
        "IVF-PQ serving layout missing appended vectors")

      // SQ8: same exhaustive-probe completeness bar
      Similarity.sq8IndexWrite(half, s"$dir/sq8", nCells = 16)
      Similarity.sq8IndexAppend(rest, s"$dir/sq8")
      assert(rows(Similarity.sq8Probe(queries, s"$dir/sq8", 5,
          nProbe = 16, shortlist = n))
        == brute,
        "exhaustive probe of the appended SQ8 index diverged from brute force")
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively(): Unit
    }
  }

  test("IVF-PQ: wide shortlist equals IVF-flat; exhaustive probe with zero vectors equals brute force") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    // a shortlist covering every probed candidate makes the exact rerank
    // see everything IVF-flat sees in the same cells → identical output:
    // the ADC stage only ever DROPS candidates, never reorders survivors
    val pq = Similarity.ivfPqTopK(queries, emb, 5, shortlist = 1000000)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val flat = Similarity.ivfTopK(queries, emb, 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(pq == flat)
    // the composed guards (cosBpFrom /0, normalizeQv zero-norm, sq8/PQ
    // encode of all-zero slices) survive a zero vector end-to-end:
    // every cell probed + exhaustive shortlist ⇒ must equal brute force
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val synth = ((0L until 19L).map(i =>
        (i, Seq.fill(64)(rnd.nextFloat() * 2 - 1))) :+
        (19L, Seq.fill(64)(0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.ivfPqTopK(synth, synth, 3, nCells = 4,
        nProbe = 4, shortlist = 1000)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val want = Similarity.bruteForceTopK(synth, synth, 3)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(got == want,
      "exhaustive IVF-PQ with a zero vector diverged from brute force")
  }

  test("IVF-SQ8: wide shortlist equals IVF-flat exactly; codes quantize as specified") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 32)
    // a shortlist covering every probed candidate makes the exact rerank
    // see everything IVF-flat sees → identical output, proving the SQ8
    // stage only ever DROPS candidates, never reorders survivors
    val sq8 = Similarity.ivfSq8TopK(queries, emb, 5, shortlist = 1000000)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    val flat = Similarity.ivfTopK(queries, emb, 5)
      .orderBy("q_id", "rank").collect().map(_.toSeq).toSeq
    assert(sq8 == flat)
    // the serving configuration still reaches IVF-level recall
    val truth = Similarity.bruteForceTopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val serving = Similarity.ivfSq8TopK(queries, emb, 5)
      .select("q_id", "n_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (truth & serving).size.toDouble / truth.size
    assert(recall >= 0.4, s"IVF-SQ8 recall@5 too low: $recall")
    // code arithmetic: floor(v·127/max|v|), zero vectors pass through
    import spark.implicits._
    val z = Seq((0L, Seq(0f, 0f, 0f, 0f)), (1L, Seq(1f, -2f, 0.5f, 0f)))
      .toDF("vec_id", "embedding")
    val codes = z.orderBy("vec_id")
      .select(Similarity.sq8Codes(Similarity.quantize(col("embedding"))))
      .collect().map(_.getSeq[Long](0).toSeq)
    assert(codes(0) == Seq(0L, 0L, 0L, 0L))
    assert(codes(1) == Seq(63L, -127L, 31L, 0L))
  }

  test("hard-negative band holds its bounds; full probe equals the brute-force band") {
    val emb = Tables.embeddings(spark, sfDir)
    val queries = emb.filter(col("vec_id") < 8)
    val (lo, hi) = (2500L, 9500L)
    // the op109 configuration (4/16 probe): every mined negative sits
    // inside [lo, hi)
    val mined = Similarity.hardNegativesIvf(queries, emb, 5, lo, hi,
      lloydIters = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(mined.nonEmpty)
    assert(mined.forall { case (_, _, bp) => bp >= lo && bp < hi })
    // probing every cell makes the band exact — equal to a driver-side
    // brute-force band over all pairs
    val full = Similarity.hardNegativesIvf(queries, emb, 5, lo, hi,
      nCells = 16, nProbe = 16).orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val vecs = emb.select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).toArray).toMap
    def cosBp(x: Array[Float], y: Array[Float]): Long = {
      val xi = x.map(v => math.floor(v.toDouble * 1e6).toLong)
      val yi = y.map(v => math.floor(v.toDouble * 1e6).toLong)
      val dot = xi.zip(yi).map { case (p, q) => p * q }.sum.toDouble
      math.floor(dot / (math.sqrt(xi.map(v => v * v).sum.toDouble) *
        math.sqrt(yi.map(v => v * v).sum.toDouble)) * 10000).toLong
    }
    val want = (0L until 8L).flatMap { q =>
      vecs.keys.filter(_ != q).toSeq
        .map(n => (q, n, cosBp(vecs(q), vecs(n))))
        .filter { case (_, _, bp) => bp >= lo && bp < hi }
        .sortBy { case (_, n, bp) => (-bp, n) }
        .take(5)
    }
    assert(full.toSeq == want)
    // op109's amortized spelling: a band probe over the persisted index
    // equals the end-to-end mining run with matching parameters
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hardneg_idx").toString
    Similarity.ivfIndexWrite(emb, dir, nCells = 16, lloydIters = 2)
    val probed = Similarity.hardNegativesProbe(queries, dir, 5, lo, hi,
      nProbe = 4).orderBy("q_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(probed.toSeq == mined.sortBy(m => (m._1, -m._3, m._2)).toSeq)
  }

  test("recall matrix (op121) covers all three pruned legs and agrees with op110 on IVF") {
    val df = graft.queries.AnnQueries.op121RecallMatrix(spark, sfDir)
    val rows = df.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // full matrix: every (leg, query) pair exactly once, recall derived
    assert(rows.map(r => (r._1, r._2)).toSeq ==
      (for (l <- Seq("ivf", "ivfpq", "sq8"); q <- 0L until 8L) yield (l, q)))
    assert(rows.forall { case (_, _, h, bp) => bp == h * 2000 && h <= 5 })
    // the IVF row block is op110 by construction (same index parameters,
    // probe(prebuilt) ≡ end-to-end)
    val ivfLeg = rows.filter(_._1 == "ivf").map(r => (r._2, r._3)).toSeq
    val op110 = graft.queries.AnnQueries.op110AnnRecall(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(ivfLeg == op110, "op121's IVF leg diverged from op110")
  }

  test("ANN recall eval (op110) equals a driver-side fold of brute vs IVF top-5") {
    val df = graft.queries.AnnQueries.op110AnnRecall(spark, sfDir)
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until 8L))
    assert(rows.forall { case (_, h, bp) => h >= 0 && h <= 5 && bp == h * 2000 })
    // independent fold from the two underlying operators
    val emb = Tables.embeddings(spark, sfDir)
    val q = emb.filter(col("vec_id") < 8)
    val truth = Similarity.bruteForceTopK(q, emb, 5)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(q, emb, 5, lloydIters = 2)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val wantHits = (0L until 8L)
      .map(i => i -> (truth & ivf).count(_._1 == i).toLong).toMap
    assert(rows.forall { case (i, h, _) => wantHits(i) == h })
  }

  test("matryoshka recall (op237) equals a pure driver replay of both legs") {
    val rows = graft.queries.AnnQueries
      .op237MatryoshkaRecall(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.map(_._1).toSeq == (0L until 8L))
    assert(rows.forall { case (_, h, bp) => h >= 0 && h <= 5 && bp == h * 2000 })
    // replay: quantize -> integer dot -> deterministic bp cosine ->
    // top-5 at full dim and at the 16-dim prefix -> hit fold
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)
        .map(f => math.floor(f.toDouble * 1000000d).toLong).toArray)
      .toMap
    def top5(dim: Int): Map[Long, Set[Long]] = {
      def cos(a: Array[Long], b: Array[Long]): Long = {
        val (av, bv) = (a.take(dim), b.take(dim))
        val dot = av.zip(bv).map { case (x, y) => x * y }.sum
        val n2a = av.map(x => x * x).sum.toDouble
        val n2b = bv.map(x => x * x).sum.toDouble
        if (n2a == 0 || n2b == 0) 0L
        else math.floor(dot.toDouble /
          (math.sqrt(n2a) * math.sqrt(n2b)) * 10000d).toLong
      }
      (0L until 8L).map { q =>
        q -> vecs.keys.filter(_ != q).toSeq
          .map(n => (n, cos(vecs(q), vecs(n))))
          .sortBy { case (n, c) => (-c, n) }.take(5).map(_._1).toSet
      }.toMap
    }
    val full = top5(64); val prefix = top5(16)
    rows.foreach { case (q, h, _) =>
      assert((full(q) & prefix(q)).size.toLong == h, s"query $q")
    }
  }

  test("LSH near-dup pairs equal brute force on planted near-dups") {
    val base = Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    // plant exact dups: copies of vecs 0-4 under ids 1000-1004 (cos=1.0,
    // identical bucket signature in every table → LSH must find them)
    val planted = base.unionByName(base.filter(col("vec_id") < 5)
      .select((col("vec_id") + 1000L).as("vec_id"), col("embedding")))
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id", "cos_bp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val brute = pairs(Similarity.nearDupPairs(planted, 9500L))
    val lsh = pairs(Similarity.nearDupPairsLsh(planted, 9500L))
    assert(brute.size >= 5, s"planted dups missing from brute force: $brute")
    assert(lsh == brute, s"lsh=$lsh brute=$brute")
    // and on the raw fixture: op66's driver oracle is the EXACT all-pairs
    // SQL, so LSH must agree with brute force on whatever pairs the
    // fixture holds — if a regenerated fixture ever plants a near-but-not
    // -identical pair that LSH's 0.93 recall could miss, this fails here
    // first instead of silently in the driver gate
    val fixtureLsh = pairs(Similarity.nearDupPairsLsh(base, 9500L))
    val fixtureBrute = pairs(Similarity.nearDupPairs(base, 9500L))
    assert(fixtureLsh == fixtureBrute,
      s"fixture divergence lsh=$fixtureLsh brute=$fixtureBrute")
  }

  test("semDedup: exact duplicates drop, full-range threshold keeps one per cell") {
    val base = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 40)
      .select("vec_id", "embedding")
    // an exact duplicate with a HIGHER id: identical vector → identical
    // cell scores → same cell, cosine 10000 → must be dominated away
    val corpus = base.unionByName(
      base.filter(col("vec_id") === 0)
        .select(lit(999L).as("vec_id"), col("embedding")))
    val surv = Similarity.semDedup(corpus, 9500L, nCells = 4, lloydIters = 1)
      .collect().map(_.getLong(0)).toSet
    assert(!surv.contains(999L), "exact duplicate survived semantic dedup")
    assert(surv.contains(0L), "the lower-id original must survive")
    // minBp at the cosine floor: every within-cell pair dominates, so
    // survivors are exactly one vector (the min id) per non-empty cell
    val all = Similarity.semDedup(corpus, -10000L, nCells = 4, lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(all.length == all.map(_._2).distinct.length,
      s"floor threshold must keep exactly one vector per cell: ${all.toSeq}")
    assert(all.nonEmpty && all.length <= 4)
    // the salted skew path must be bit-identical: every (a, b) pair
    // still meets exactly once (b carries one salt, a covers all)
    val salted = Similarity.semDedup(corpus, 9500L, nCells = 4,
        lloydIters = 1, saltB = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val unsalted = Similarity.semDedup(corpus, 9500L, nCells = 4,
        lloydIters = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(salted == unsalted, "salted semDedup diverged from unsalted")
  }

  test("approx_percentile (op46 sketch path) matches exact within rank tolerance") {
    val o = Tables.orders(spark, sfDir)
    val rows = o.groupBy(col("o_orderstatus"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("ap50"),
        expr("percentile(o_totalprice, 0.5)").as("p50"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("ap99"),
        expr("percentile(o_totalprice, 0.99)").as("p99"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (ap50, p50) = (r.getDouble(1), r.getDouble(2))
      val (ap99, p99) = (r.getDouble(3), r.getDouble(4))
      // accuracy 10000 bounds rank error to ~n/10000 — generous value gate
      assert(math.abs(ap50 - p50) / math.max(p50, 1.0) <= 0.05,
        s"p50 approx=$ap50 exact=$p50")
      assert(math.abs(ap99 - p99) / math.max(p99, 1.0) <= 0.05,
        s"p99 approx=$ap99 exact=$p99")
    }
  }

  test("approx_count_distinct (op42) lands within 5% of exact") {
    val li = Tables.lineitem(spark, sfDir)
    val exact = li.select(countDistinct(col("l_partkey"))).as[Long].first()
    val approx = li.select(approx_count_distinct(col("l_partkey"), 0.02))
      .as[Long].first()
    assert(math.abs(approx - exact).toDouble / exact <= 0.05,
      s"approx=$approx exact=$exact")
  }

  test("NN-Descent graph: exactly k ranked neighbors per node, no self edges") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val g = Similarity.nnDescent(emb, k = 16, rounds = 3, capR = 16)
    assert(g.count() == n * 16, "graph must hold exactly N*k edges")
    assert(g.filter(col("u_id") === col("n_id")).isEmpty, "self edge")
    val badRanks = g.groupBy("u_id")
      .agg(collect_set(col("rank")).as("rs"))
      .filter(size(col("rs")) =!= 16 ||
        !(array_contains(col("rs"), 1L) && array_contains(col("rs"), 16L)))
    assert(badRanks.isEmpty, "every node must carry ranks 1..k")
  }

  test("NN-Descent recall@16 beats the init graph and clears the floor") {
    val emb = Tables.embeddings(spark, sfDir)
    val truth = Similarity.bruteForceTopK(emb, emb, 16)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rounds: Int): Double = {
      val g = Similarity.nnDescent(emb, k = 16, rounds = rounds, capR = 16)
        .select("u_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & g).size.toDouble / truth.size
    }
    val init = recallOf(0)
    val converged = recallOf(3)
    assert(converged > init,
      s"NND did not improve on the init graph: $init -> $converged")
    // uniform-random embeddings are NND's worst case (no cluster
    // structure for the transitivity heuristic); measured 0.979 at
    // N=500 — the floor leaves noise margin only, any real regression
    // (init diversity, cap, tiebreaks) lands far below it
    assert(converged >= 0.9, s"NND recall@16 too low: $converged")
  }

  test("graph ANN beam search: kOut ranked hits per query, hops add recall") {
    val emb = Tables.embeddings(spark, sfDir)
    val g = Similarity.nnDescent(emb, k = 16, rounds = 3, capR = 16)
      .localCheckpoint()
    val truth = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, 8)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(hops: Int): Double = {
      val served = Similarity.graphSearch(emb, g, nQueries = 8,
        beam = 12, hops = hops, kOut = 8)
      assert(served.count() == 8 * 8, "must serve exactly kOut per query")
      assert(served.filter(col("q_id") === col("n_id")).isEmpty, "self hit")
      val got = served.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    val entryOnly = recallOf(0)
    val walked = recallOf(3)
    assert(walked > entryOnly,
      s"beam search did not improve on the entry set: $entryOnly -> $walked")
    // uniform-random fixture, the hardest case for graph search (no
    // cluster structure to ride); floor set well under the measured
    // value so only a real search regression trips it
    assert(walked >= 0.6, s"graph-ANN recall@8 too low: $walked")
  }

  test("streaming graph-ANN walk is bit-identical to the batch search") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_nnd_spec_").toString
    Similarity.nndIndexWrite(emb, dir, k = 16, rounds = 3, capR = 16)
    val batch = Similarity.graphSearch(emb,
        spark.read.parquet(s"$dir/graph"), nQueries = 8,
        beam = 12, hops = 3, kOut = 8)
      .orderBy("q_id", "rank").collect().toSeq
    // same walk through the broadcast-shard expression, batch-driven
    // (the expression doesn't care; op292 drives it from a stream)
    val probe = graft.streaming.StreamingAnn.graphProbeStream(
      emb.filter(col("vec_id") < 8), dir, 8, beam = 12, hops = 3)
    // the collapse claim, pinned: the serving plan carries NO join —
    // the whole walk is the one GraphBeamTopK projection
    val joins = probe.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "graph serving plan must be join-free")
    assert(probe.queryExecution.analyzed.toString
        .toLowerCase.contains("graphbeamtopk"),
      "expected the GraphBeamTopK expression in the serving plan")
    val served = graft.streaming.StreamingAnn.explodeTopK(probe)
      .select("q_id", "rank", "n_id", "cos_bp")
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == batch)
  }

  test("HNSW upper layer: dense 1-in-8 overlay, better entries at the same hop budget") {
    val emb = Tables.embeddings(spark, sfDir)
    val n = emb.count()
    val g = Similarity.nnDescent(emb, k = 16, rounds = 3, capR = 16)
      .localCheckpoint()
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hnsw_spec_").toString
    Similarity.hnswUpperWrite(emb, dir, mod = 8, k = 8, rounds = 2, capR = 8)
    val um = spark.read.parquet(s"$dir/level1_map")
    val ug = spark.read.parquet(s"$dir/upper_graph")
    // structural: the overlay holds every 1-in-8 member exactly once,
    // densely re-ranked, with k upper edges per member
    assert(um.count() == n / 8, "upper layer must hold N/8 members")
    assert(um.select(max(col("l_id"))).first().getLong(0) == n / 8 - 1 &&
      um.select(countDistinct(col("l_id"))).first().getLong(0) == n / 8,
      "l_ids must be dense 0..M-1")
    assert(ug.count() == (n / 8) * 8, "upper graph must hold M*k edges")
    val truth = Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, 8)
      .select("q_id", "n_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(served: org.apache.spark.sql.DataFrame): Double = {
      assert(served.count() == 8 * 8, "must serve exactly kOut per query")
      assert(served.filter(col("q_id") === col("n_id")).isEmpty, "self hit")
      val got = served.select("q_id", "n_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (truth & got).size.toDouble / truth.size
    }
    // the hierarchy's claim, in two halves (all arithmetic is exact
    // integers, so these figures are deterministic — measured grid on
    // this fixture: flat 0.4219/0.75/0.8125 at 1/2/3 hops; hnsw(ub=8,
    // uh=2) 0.5625/0.8125/0.875):
    //  (a) at the SAME level-0 budget (2 hops), upper-walk entries
    //      serve recall at least as high as the LCG entry set;
    //  (b) HNSW at 2 level-0 hops matches flat NSW at 3 — the layer
    //      stack trades one wide level-0 hop for a cheap sparse walk
    val flat2 = recallOf(Similarity.graphSearch(emb, g, nQueries = 8,
      beam = 12, hops = 2, kOut = 8))
    val flat3 = recallOf(Similarity.graphSearch(emb, g, nQueries = 8,
      beam = 12, hops = 3, kOut = 8))
    val hnsw2 = recallOf(Similarity.hnswSearch(emb, g, um, ug, nQueries = 8,
      upperBeam = 8, upperHops = 2, beam = 12, hops = 2, kOut = 8))
    info(s"recall@8: flat 2 hops $flat2, flat 3 hops $flat3, HNSW 2 hops $hnsw2")
    assert(hnsw2 >= flat2,
      s"HNSW entries must not lose to LCG entries: $flat2 -> $hnsw2")
    assert(hnsw2 >= flat3,
      s"HNSW at 2 hops must match flat NSW at 3: $flat3 -> $hnsw2")
    assert(hnsw2 >= 0.6, s"HNSW recall@8 too low: $hnsw2")
  }

  test("op303: integer power iteration matches a driver replay, Rayleigh climbs") {
    val got = graft.queries.AnnQueries.op303PcaPower(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select("embedding").collect()
      .map(_.getSeq[Float](0).toArray
        .map(v => math.floor(v.toDouble * 1000d).toLong))
    val d = 64
    val gram = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => v(i) * v(j)).sum)
    def step(x: Array[Long]): Array[Long] = {
      val y = Array.tabulate(d)(i =>
        (0 until d).map(j => gram(i)(j) * x(j)).sum)
      val s = math.max(y.map(math.abs).max / 1000000L, 1L)
      y.map(v => if (v < 0) -((-v) / s) else v / s)
    }
    var x = Array.fill(d)(1000000L)
    val x0 = x.clone()
    (1 to 3).foreach(_ => x = step(x))
    val want = (0 until d).map(i => i.toLong -> ((x(i), gram(i)(i)))).toMap
    assert(got == want)
    // each power step climbs the Rayleigh quotient of a PSD matrix —
    // BigInt spec-side arithmetic (the quotient itself would overflow)
    def rayleigh(v: Array[Long]): BigDecimal = {
      val bv = v.map(BigInt(_))
      val num = (0 until d).map(i => (0 until d)
        .map(j => bv(i) * BigInt(gram(i)(j)) * bv(j)).sum).sum
      val den = bv.map(b => b * b).sum
      BigDecimal(num) / BigDecimal(den)
    }
    val (r0, r3) = (rayleigh(x0), rayleigh(x))
    info(s"Rayleigh quotient: init $r0 -> 3 steps $r3")
    assert(r3 > r0, s"power iteration did not climb: $r0 -> $r3")
  }

  test("op304: streamed gram is symmetric, diagonal equals op303's second moment") {
    val g = graft.queries.AnnQueries.op304StreamGram(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(g.size == 64 * 64, s"expected 4096 cells, got ${g.size}")
    assert(g.forall { case ((i, j), c) => g((j, i)) == c },
      "gram must be symmetric")
    val diag = graft.queries.AnnQueries.op303PcaPower(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(diag.forall { case (i, m) => g((i, i)) == m },
      "streamed diagonal must equal the batch second moment")
  }

  test("op314: kNN vote classifies a cleanly clustered space perfectly") {
    import spark.implicits._
    // two well-separated label clusters: every leave-one-out top-5
    // neighborhood is same-label, so the majority vote must score
    // accuracy 1.0 — the eval's sanity floor
    def v(axis: Int, wiggle: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == axis) 1.0f
        else if (i == (axis + 1 + wiggle) % 64) 0.01f * (wiggle + 1) else 0.0f)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_op314_spec_").toString
    (0L until 20L).map(id =>
        (id, v(if (id % 2 == 0) 0 else 32, (id % 5).toInt),
          (id % 2).toInt))
      .toDF("vec_id", "embedding", "label")
      .coalesce(1).write.parquet(s"$dir/stage")
    val part = new java.io.File(s"$dir/stage").listFiles()
      .find(_.getName.endsWith(".parquet")).get
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
    val rows = graft.queries.AnnQueries.op314KnnClassify(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(4)))
    assert(rows.length == 20)
    assert(rows.forall { case (q, t, p, c) => p == t && c == 1L },
      s"clustered space must classify perfectly: ${rows.filter(_._4 == 0L).toSeq}")
  }

  test("op305: spectral drift gate fires on a rotated slice, stays quiet on none") {
    import spark.implicits._
    // synthetic corpus with a CONTROLLED dominant direction per parity:
    // the gate must alert when the arriving (odd) slice's pc1 has
    // rotated away from the pinned (even) reference, and must stay
    // quiet when both halves share the direction exactly (cos = 10⁴)
    def vec(main: Int, leak: Int): Seq[Float] =
      Seq.tabulate(64)(i => if (i == main) 1.0f
        else if (i == leak) 0.1f else 0.0f)
    def writeFixture(odd: Seq[Float]): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("graft_op305_spec_").toString
      // the real fixtures are single parquet FILES (the streaming file
      // source in drainStream lists a symlink to them) — reduce the
      // Spark output dir to one and move it into place
      (0L until 16L).map(id =>
          (id, if (id % 2 == 0) vec(0, 1) else odd))
        .toDF("vec_id", "embedding")
        .coalesce(1).write.parquet(s"$dir/stage")
      val part = new java.io.File(s"$dir/stage").listFiles()
        .find(_.getName.endsWith(".parquet")).get
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
      dir
    }
    val rotated = graft.queries.AnnQueries
      .op305StreamSpectralDrift(spark, writeFixture(vec(1, 0))).collect()
    assert(rotated.length == 1)
    assert(rotated(0).getLong(1) == 1L,
      s"orthogonal-ish pc1 must flag drifted: ${rotated(0)}")
    assert(rotated(0).getLong(0) < 9000L,
      s"rotated cos_bp must sit under the threshold: ${rotated(0)}")
    val same = graft.queries.AnnQueries
      .op305StreamSpectralDrift(spark, writeFixture(vec(0, 1))).collect()
    assert(same(0).getLong(0) == 10000L && same(0).getLong(1) == 0L,
      s"identical halves must score cos_bp 10000, undrifted: ${same(0)}")
  }

  test("streaming HNSW walk is bit-identical to the batch two-layer search") {
    val emb = Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_hnsw_stream_spec_").toString
    Similarity.nndIndexWrite(emb, dir, k = 16, rounds = 3, capR = 16)
    Similarity.hnswUpperWrite(emb, s"$dir/up", mod = 8, k = 8, rounds = 2,
      capR = 8)
    val batch = Similarity.hnswSearch(emb,
        spark.read.parquet(s"$dir/graph"),
        spark.read.parquet(s"$dir/up/level1_map"),
        spark.read.parquet(s"$dir/up/upper_graph"),
        nQueries = 8, upperBeam = 8, upperHops = 2,
        beam = 12, hops = 2, kOut = 8)
      .orderBy("q_id", "rank").collect().toSeq
    val probe = graft.streaming.StreamingAnn.hnswProbeStream(
      emb.filter(col("vec_id") < 8), dir, s"$dir/up", 8,
      upperBeam = 8, upperHops = 2, beam = 12, hops = 2)
    // both walks ride the ONE GraphBeamTopK projection — still join-free
    val joins = probe.queryExecution.analyzed.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(joins.isEmpty, "HNSW serving plan must be join-free")
    val served = graft.streaming.StreamingAnn.explodeTopK(probe)
      .select("q_id", "rank", "n_id", "cos_bp")
      .orderBy("q_id", "rank").collect().toSeq
    assert(served == batch)
  }
}
