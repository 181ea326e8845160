package graft

import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextOps}

/** Dedup semantics on planted duplicates (the fixture corpus has near-dups
  * but no exact dups, so exact-dedup behavior needs planted data). */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val base =
    "the quick brown fox jumps over the lazy dog while spark shuffles data across partitions"
  private val nearDup = base.replace("lazy", "sleepy") // 1-token edit
  private val unrelated =
    "completely different content about database engines and columnar storage formats here"

  private def corpus = Seq(
    (0L, base), (1L, base), // exact dup pair
    (2L, nearDup),          // near dup of 0/1
    (3L, unrelated),
    (4L, base)              // another exact copy
  ).toDF("doc_id", "text")

  test("exactKeepMin keeps the smallest id per identical text") {
    val out = Dedup.exactKeepMin(corpus, "text", "doc_id")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq ==
      Seq((0L, 3L), (2L, 1L), (3L, 1L)))
  }

  test("jaccardPairs finds exact and near dups, not unrelated docs") {
    val pairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 5000L)
      .select("doc_a", "doc_b", "jaccard_bp").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs((0L, 1L)) == 10000L) // identical
    assert(pairs((0L, 4L)) == 10000L)
    assert(pairs.contains((0L, 2L)) && pairs((0L, 2L)) >= 5000L) // near dup
    assert(!pairs.keys.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("minhash+LSH candidates cover all high-jaccard pairs (fixture corpus)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val truth = Dedup.jaccardPairs(docs, "doc_id", "text", 8000L)
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val cand = Dedup.minhashCandidates(docs, "doc_id", "text", 16, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(truth.nonEmpty, "fixture corpus should contain planted near-dups")
    val missed = truth -- cand
    assert(missed.isEmpty,
      s"LSH (k=16,r=4) missed ${missed.size}/${truth.size} true pairs: $missed")
  }

  test("prefix-filtered jaccard equals the all-pairs baseline (fixture corpus)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    val base = asSet(Dedup.jaccardPairs(docs, "doc_id", "text", 7000L))
    val pref = asSet(Dedup.jaccardPairsPrefix(docs, "doc_id", "text", 7000L))
    assert(base.nonEmpty && pref == base)
    // and at a low threshold where the prefix keeps most shingles
    val base2 = asSet(Dedup.jaccardPairs(corpus, "doc_id", "text", 3000L))
    val pref2 = asSet(Dedup.jaccardPairsPrefix(corpus, "doc_id", "text", 3000L))
    assert(pref2 == base2)
  }

  test("doc-frequency cap collapses a planted hot-shingle candidate blowup") {
    // 40 docs share one boilerplate prefix (two hot trigrams, df=40);
    // each is otherwise unique. One true dup pair with no hot shingles.
    val hot = (0L until 40L).map(i =>
      (i, s"standard legal boilerplate header unique$i token$i content$i"))
    val dupText = "actual duplicated body text repeated verbatim across mirror sites"
    val docs = (hot ++ Seq((100L, dupText), (101L, dupText)))
      .toDF("doc_id", "text")
    val index = Dedup.shingleIndex(docs, "doc_id", "text")
    // uncapped: every boilerplate co-occurrence becomes a candidate pair
    val uncapped = Dedup.overlapPairs(index).count()
    assert(uncapped >= 40L * 39L / 2,
      s"expected quadratic blowup without the cap, got $uncapped")
    // capped: the hot shingles are dropped before pairing — only the
    // true dup pair (whose shingles have df=2) survives as a candidate
    val capped = Dedup.overlapPairs(index, Some(10L))
      .select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((100L, 101L)), s"capped candidates: $capped")
    // and the end-to-end capped jaccard still scores the dup pair exactly
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 7000L, Some(10L))
      .select("doc_a", "doc_b", "jaccard_bp").collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(pairs == Map((100L, 101L) -> 10000L), s"pairs: $pairs")
  }

  test("TrigramHash64 equals the builtin xxhash64-of-trigram spelling") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"), col("text"))
      // edge shapes: short docs, empty text
      .unionByName(Seq((9001L, "one two"), (9002L, ""), (9003L, "a b c"))
        .toDF("doc_id", "text"))
    val fused = ColumnBridge.column(graft.expressions.TrigramHash64(
      ColumnBridge.expression(TextOps.tokens(col("text")))))
    val builtin = transform(TextOps.trigramsOfTokens(TextOps.tokens(col("text"))),
      s => xxhash64(s))
    val diff = docs.select(fused.as("f"), builtin.as("b"))
      .filter(col("f") =!= col("b")).count()
    assert(diff == 0, s"$diff rows diverge between fused and builtin hashing")
  }

  test("TrigramKmSigs equals the builtin md5-60 KM spelling bit-for-bit") {
    // the fused per-row loop (op132's streaming signature path) must
    // reproduce the interpreted higher-order spelling exactly — same
    // md5-60 (first 15 hex chars base-16), same 30-bit halves, same
    // affine mins — or the DuckDB oracle's replay breaks
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val k = 16
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, "a b c"), (9002L, "x y z w")).toDF("doc_id", "text"))
      .filter(size(TextOps.tokens(col("text"))) >= 3)
    val hs = transform(TextOps.trigramsOfTokens(TextOps.tokens(col("text"))),
      s => TextOps.md5Hash60(s))
    val builtin = array((0 until k).map { i =>
      array_min(transform(hs, h =>
        ((h % 1073741824L) * (2 * i + 1) + shiftright(h, 30) % 1073741824L)
          % 2147483648L))
    }: _*)
    val fused = ColumnBridge.column(graft.expressions.TrigramKmSigs(
      ColumnBridge.expression(TextOps.tokens(col("text"))), k))
    val diff = docs.select(fused.as("f"), builtin.as("b"))
      .filter(col("f") =!= col("b")).count()
    assert(diff == 0, s"$diff rows diverge between fused and builtin KM sigs")
    // under 3 tokens: empty signature array (no shingles)
    val empty = Seq((1L, "one two")).toDF("doc_id", "text")
      .select(ColumnBridge.column(graft.expressions.TrigramKmSigs(
        ColumnBridge.expression(TextOps.tokens(col("text"))), 4)).as("f"))
      .as[Seq[Long]].collect()(0)
    assert(empty.isEmpty)
  }

  test("TrigramMd5s equals the builtin md5Hash60-of-trigram spelling") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val docs = graft.sources.Tables.documents(spark, sfDir).limit(50)
      .select(col("doc_id"), col("text"))
      .unionByName(Seq((9001L, "one two"), (9002L, ""), (9003L, "a b c"))
        .toDF("doc_id", "text"))
    val fused = ColumnBridge.column(graft.expressions.TrigramMd5s(
      ColumnBridge.expression(TextOps.tokens(col("text")))))
    val builtin = transform(
      TextOps.trigramsOfTokens(TextOps.tokens(col("text"))),
      s => TextOps.md5Hash60(s))
    val diff = docs.select(fused.as("f"), builtin.as("b"))
      .filter(col("f") =!= col("b")).count()
    assert(diff == 0, s"$diff rows diverge between fused and builtin md5-60")
  }

  test("RollingHashWindows equals the direct per-window recompute") {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import graft.expressions.RollingHashWindows._
    val texts = Seq("abcdefgh", "aaaaaaaa", "ab", "", "xyzxyzxyzxyz")
    val win = 4
    val got = texts.toDF("text")
      .select(ColumnBridge.column(graft.expressions.RollingHashWindows(
        ColumnBridge.expression(col("text")), win)).as("hs"))
      .as[Seq[Long]].collect().toSeq
    def direct(s: String): Seq[Long] =
      if (s.length < win) Seq.empty
      else (0 to s.length - win).map { i =>
        val w = s.substring(i, i + win)
        val h1 = w.foldLeft(0L)((a, c) => (a * Base1 + c) % Mod1)
        val h2 = w.foldLeft(0L)((a, c) => (a * Base2 + c) % Mod2)
        h1 * Mod2 + h2
      }
    assert(got == texts.map(direct),
      "rolling recurrence diverged from direct per-window hashing")
  }

  test("charDupProfile: stride-1 windows recover the exact repeat length") {
    // doc 1 and 2 share exactly one 50-char substring (the 'S' block);
    // doc 3 is unrelated; doc 4 is shorter than the window and drops out
    val S = (1 to 10).map(i => f"tok$i%02d").mkString(" ")   // 59 chars
    val shared = S.substring(0, 50)
    // boundary chars differ on BOTH sides (# vs @), so the maximal
    // common substring is the 50-char block exactly, not 51/52 via a
    // shared space at the seam
    val d1 = s"prefix one#$shared#suffix one"
    val d2 = s"completely different head@$shared@another tail"
    val d3 = "no repeats here just unique content of reasonable length padding"
    val d4 = "tiny"
    val out = Dedup.charDupProfile(
        Seq((1L, d1), (2L, d2), (3L, d3), (4L, d4)).toDF("doc_id", "text"),
        "doc_id", "text", 40)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    // a shared substring of length M = 50 yields M-win+1 = 11 consecutive
    // dup windows and longest_dup = maxrun + win - 1 = 50 exactly
    assert(out.map(_._1) == Seq(1L, 2L, 3L), s"row set: $out")
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(byDoc(1L)._3 == 11 && byDoc(1L)._4 == 50, s"doc1: ${byDoc(1L)}")
    assert(byDoc(2L)._3 == 11 && byDoc(2L)._4 == 50, s"doc2: ${byDoc(2L)}")
    assert(byDoc(3L)._3 == 0 && byDoc(3L)._4 == 0, s"doc3: ${byDoc(3L)}")
    // n_windows = len - win + 1 per surviving doc
    assert(byDoc(1L)._2 == d1.length - 39, s"doc1 windows: ${byDoc(1L)}")
  }

  test("cost-based jaccard auto picks the cheap spelling per corpus") {
    // fixture corpus: shared-shingle volume is small → inverted-index join
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val idxFixture = Dedup.shingleIndexHashed(docs, "doc_id", "text")
    assert(!Dedup.preferPrefix(idxFixture, 4.0),
      "fixture corpus should favor the plain inverted-index join")
    // pathological corpus: 100 docs sharing nearly every shingle → the
    // pairing join would emit ~shared·C(100,2) rows; prefix must win
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val shared = (0L until 100L).map(i => (i, s"$base tail$i"))
      .toDF("doc_id", "text")
    val idxShared = Dedup.shingleIndexHashed(shared, "doc_id", "text")
    assert(Dedup.preferPrefix(idxShared, 4.0),
      "high-overlap corpus should favor prefix filtering")
    // and the chosen spelling returns exactly the baseline's pairs
    def asSet(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_a", "doc_b", "jaccard_bp").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val auto = asSet(Dedup.jaccardPairsAuto(shared, "doc_id", "text", 7000L))
    val manual = asSet(Dedup.jaccardPairs(shared, "doc_id", "text", 7000L))
    assert(auto.nonEmpty && auto == manual)
  }

  test("survivors drops the greater id of each ≥80% pair") {
    val out = Dedup.survivors(corpus, "doc_id", "text", 8000L)
      .select("doc_id").as[Long].collect().toSet
    assert(out == Set(0L, 2L, 3L)) // 1 and 4 are dups of 0; 2 survives at 80%
  }

  test("dedupClusters merges transitive chains the pairwise view misses") {
    // A~B and B~C at ≥50% but A and C differ more: a chain that pairwise
    // dropping handles inconsistently, clustering must merge fully
    val a = (1 to 12).map(i => s"w$i").mkString(" ")
    val b = (3 to 14).map(i => s"w$i").mkString(" ") // shares 1..12-ish with a
    val c = (5 to 16).map(i => s"w$i").mkString(" ") // chains through b
    val lone = "completely different words entirely here now okay then"
    val docs = Seq((10L, a), (11L, b), (12L, c), (13L, lone))
      .toDF("doc_id", "text")
    val out = Dedup.dedupClusters(docs, "doc_id", "text", 4000L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(10L) == 10L && out(11L) == 10L && out(12L) == 10L,
      s"chain should collapse to min id 10: $out")
    assert(out(13L) == 13L, s"singleton keeps itself: $out")
  }

  test("splitByCluster: co-clustered rows share a split; pct knobs move the boundary") {
    val df = Seq((1L, 10L), (2L, 10L), (3L, 42L), (4L, 99L), (5L, 7L),
      (6L, 7L), (7L, 123L), (8L, 360L), (9L, 77L), (10L, 1000L))
      .toDF("doc_id", "cluster")
    val out = Dedup.splitByCluster(df).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.length == 10)
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._4).distinct.length == 1, s"cluster $c straddles")
      assert(rows.map(_._3).distinct.length == 1, s"cluster $c bucket differs")
    }
    out.foreach { case (_, _, b, s) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(s == want)
    }
    // widening train to 98% can only grow (or keep) the train set, and
    // the bucket assignment itself must not move
    val wide = Dedup.splitByCluster(df, trainPct = 98, valPct = 1).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getString(3)))
    assert(wide.map(t => t._1 -> t._2).toMap == out.map(t => t._1 -> t._3).toMap)
    val trainDefault = out.count(_._4 == "train")
    assert(wide.count(_._3 == "train") >= trainDefault)
  }

  test("minhash survivors equal the exhaustive survivors where band recall is total") {
    // on the fixture corpus the ≥80% pairs all collide in some band
    // (the candidates-cover spec above), so the candidate-verified
    // composition must agree EXACTLY with verifying every pair — the
    // divergence budget is band recall, nothing else
    import graft.sources.Tables
    val docs = Tables.documents(spark, sfDir)
    val viaMinhash = Dedup.survivorsMinhash(docs, "doc_id", "text", 8000L)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val exhaustive = Dedup.survivors(docs, "doc_id", "text", 8000L, None)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(viaMinhash == exhaustive)
    assert(viaMinhash.size < docs.count(), "fixture planted no dups?")
  }

  test("splitByCluster: string-labeled clusterings split correctly (no silent bigint-cast collapse)") {
    // regression guard for the advisor finding: an intermediate bigint
    // cast turned string labels into nulls, hashed every cluster to the
    // same null bucket, and silently dumped the whole corpus in 'test'
    val df = Seq((1L, "web/a"), (2L, "web/a"), (3L, "books"), (4L, "code"),
      (5L, "books"), (6L, "wiki"), (7L, "forum"), (8L, "news"))
      .toDF("doc_id", "cluster")
    val out = Dedup.splitByCluster(df).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.length == 8)
    // co-labeled rows stay together, buckets are real hashes (not one
    // collapsed value), and every split name is derived from the bucket
    out.groupBy(_._2).foreach { case (c, rows) =>
      assert(rows.map(_._4).distinct.length == 1, s"cluster $c straddles")
    }
    assert(out.map(_._3).distinct.length > 1, "all buckets collapsed")
    out.foreach { case (_, _, b, sp) =>
      val want = if (b < 80) "train" else if (b < 90) "val" else "test"
      assert(sp == want)
    }
    // and the string form of a numeric label hashes identically to the
    // numeric label itself (cast-to-string is the canonical form)
    val num = Dedup.splitByCluster(Seq((1L, 42L)).toDF("doc_id", "cluster"))
      .select("bucket").head().getLong(0)
    val str = Dedup.splitByCluster(Seq((1L, "42")).toDF("doc_id", "cluster"))
      .select("bucket").head().getLong(0)
    assert(num == str)
  }

  test("paraphrase mining: per-pair jaccard and kind match a driver-side recompute") {
    // the cross-modal composition (op101): every emitted pair passed the
    // embedding cosine gate, and its text-side classification must equal
    // an independent driver-side trigram-jaccard computation on the two
    // documents — the half of the contract the bucket-replay oracle
    // shares machinery with (this recompute shares none)
    import graft.sources.Tables
    val out = graft.queries.DedupQueries.op101ParaphraseMine(spark, sfDir)
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getString(4))))
    assert(out.nonEmpty)
    val texts = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def shingles(t: String): Set[String] =
      t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
    out.foreach { case ((a, b), (cos, j, kind)) =>
      assert(a < b && cos >= 2500L)
      val (sa, sb) = (shingles(texts(a)), shingles(texts(b)))
      val inter = (sa & sb).size.toLong
      val uni = sa.size + sb.size - inter
      val expect = if (uni == 0) 0L else inter * 10000L / uni
      assert(j == expect, s"pair ($a,$b) jaccard $j != recomputed $expect")
      assert(kind == (if (j >= 7000L) "lexical" else "semantic"))
    }
    // the fixture corpus is random word soup: semantic-only pairs must
    // dominate (a lexical dup at cos>=0.25 would mean planted mirrors)
    assert(out.count(_._2._3 == "semantic") > 0)
  }

  test("source overlap matrix equals the per-source fold of the op61 pairs") {
    val pairs = graft.queries.DedupQueries.op61DedupNgram(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(5)))
    val srcOf = graft.sources.Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("source")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val want = pairs
      .map { case (a, b, bp) =>
        val (sa, sb) = (srcOf(a), srcOf(b))
        // the per-side docs swap WITH the sources: doc_lo belongs to
        // source_lo even when it has the higher doc_id
        if (sa <= sb) ((sa, sb), (a, b, bp)) else ((sb, sa), (b, a, bp))
      }
      .groupBy(_._1).map { case (k, rows) =>
        val vs = rows.map(_._2)
        k -> (vs.length.toLong, vs.map(_._1).distinct.length.toLong,
          vs.map(_._2).distinct.length.toLong,
          vs.map(_._3).sum / vs.length)
      }
    val got = graft.queries.TrainQueries.op95SourceOverlap(spark, sfDir)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
      .toMap
    assert(got.nonEmpty && got == want)
  }

  test("simhash: near-dups land within small hamming distance; unrelated far") {
    val fp = Dedup.simhash60(corpus, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L)) // identical text, identical fingerprint
    val near = Dedup.hammingDist(fp(0L), fp(2L))
    val far = Dedup.hammingDist(fp(0L), fp(3L))
    assert(near < far, s"near=$near should be < far=$far")
    assert(near <= 12, s"near-dup hamming too large: $near")
  }

  test("trigram shingles: under-3-token docs yield empty, not errors") {
    val tiny = Seq((0L, "one two"), (1L, "a"), (2L, "")).toDF("doc_id", "text")
    val out = tiny.select(size(TextOps.trigrams(col("text"))).as("n"))
      .as[Int].collect()
    assert(out.forall(_ == 0))
    // bigrams share the descending-sequence guard: 1 pair for 2 tokens,
    // empty (not an ANSI index error) below that
    val bi = tiny.select(
        size(TextOps.bigramsOfTokens(TextOps.tokens(col("text")))).as("n"))
      .as[Int].collect().toSeq
    assert(bi == Seq(1, 0, 0), s"bigram counts: $bi")
  }

  test("cluster histogram (op114) equals the fold of op77's clusters and covers the corpus") {
    val clusters = graft.queries.DedupQueries.op77DedupClusters(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val want = clusters.groupBy(_._2).map(_._2.size.toLong)
      .groupBy(identity).map { case (sz, cs) =>
        (sz, cs.size.toLong, sz * cs.size) }
      .toSeq.sortBy(_._1)
    val got = graft.queries.DedupQueries.op114ClusterHistogram(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == want)
    // the histogram's doc mass accounts for every document exactly once
    assert(got.map(_._3).sum == clusters.length.toLong)
  }

  test("op227 containment: a quoted doc scores ~10^4 while its jaccard stays low") {
    // plant the asymmetric case: doc 11 is VERBATIM inside doc 10's
    // much longer text — containment(11 ⊆ 10) ≈ 10^4, jaccard far
    // below the 7000 dedup gate (the case op61 structurally misses)
    val quote = "spark shuffles data across many executor partitions tonight"
    val long = ("filler alpha beta gamma delta epsilon zeta eta theta " +
      "iota kappa lambda mu " + quote + " nu xi omicron pi rho sigma " +
      "tau upsilon phi chi psi omega one two three four five six seven")
    val docs = Seq((10L, long), (11L, quote), (12L, unrelated))
      .toDF("doc_id", "text")
    val got = Dedup.containmentPairs(docs, "doc_id", "text", 8000L, None)
      .collect()
      .map(r => (r.getAs[Long]("inner_doc"), r.getAs[Long]("outer_doc"),
        r.getAs[Long]("containment_bp"), r.getAs[Long]("jaccard_bp")))
    // exactly the quote-inside-long direction fires
    assert(got.map(x => (x._1, x._2)).toSet == Set((11L, 10L)))
    val hit = got.head
    assert(hit._3 == 10000L, s"full containment expected: $hit")
    assert(hit._4 < 7000L,
      s"jaccard must sit below the dedup gate (asymmetry): $hit")
    // containment >= jaccard always (n_inner <= union)
    val fx = Dedup.containmentPairs(
      graft.sources.Tables.documents(spark, sfDir), "doc_id", "text",
      8000L, Some(100L)).collect()
      .map(r => (r.getAs[Long]("containment_bp"),
        r.getAs[Long]("jaccard_bp")))
    assert(fx.forall { case (c, j) => c >= j && c <= 10000L })
  }

  test("op276: fidelity legs are mutually consistent and span the range") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val fid = Dedup.minhashFidelity(docs, "doc_id", "text").collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        (r.getAs[Long]("n_agree"), r.getAs[Long]("est_bp"),
          r.getAs[Long]("exact_bp"), r.getAs[Long]("err_bp"))))
    // est is the agreement fraction exactly; err is the signed gap
    fid.foreach { case (pair, (agree, est, exact, err)) =>
      assert(agree >= 0 && agree <= 16, s"$pair")
      assert(est == agree * 10000 / 16, s"$pair")
      assert(err == est - exact, s"$pair")
      assert(exact >= 0 && exact <= 10000, s"$pair")
    }
    // the exact leg must agree with op61's exact Jaccard on shared pairs
    val exact61 = Dedup.jaccardPairs(docs, "doc_id", "text", 0L, None)
      .collect()
      .map(r => ((r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")),
        r.getAs[Long]("jaccard_bp"))).toMap
    val shared = fid.filter { case (pair, (_, _, ex, _)) => ex > 0 }
    assert(shared.nonEmpty)
    shared.foreach { case (pair, (_, _, ex, _)) =>
      assert(exact61.get(pair).contains(ex),
        s"exact leg disagrees with op61 for $pair")
    }
    // the fixture exercises both a true near-dup and estimator noise
    // (err != 0 somewhere — a sketch that never errs is not being
    // tested); zero-overlap false collisions appear only at larger SF,
    // where the oracle gate covers them (left-join + coalesce path)
    assert(fid.exists(_._2._3 >= 8000L), "no true near-dup present")
    assert(fid.exists(_._2._4 != 0L), "estimator never erred — vacuous")
  }
}
