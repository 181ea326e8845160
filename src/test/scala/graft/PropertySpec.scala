package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.functions.{Dedup, Similarity, TextOps}
import graft.ops.Decode

/** ScalaCheck property tests (SURVEY.md §5.2 item 4), run through the
  * raw scalacheck runner (no scalatest bridge in the dependency set).
  * Spark round-trips are checked in batched form: one DataFrame per
  * property evaluation would be 100 Spark jobs, so each property gathers
  * its samples and asserts on a single collect. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def check(name: String, prop: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(60), prop)
    assert(res.passed, s"$name: $res")
  }

  private val asciiGen: Gen[String] =
    Gen.chooseNum(0, 60).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
  private val unicodeGen: Gen[String] =
    Gen.chooseNum(0, 30).flatMap(n => Gen.stringOfN(n, Gen.asciiPrintableChar))
      .map(_ + "π✓")

  test("property: driver-side base64 semantics match Spark's (sampled batch)") {
    // gather deterministic samples from the generators, evaluate in one job
    val seed = org.scalacheck.rng.Seed(42L)
    val samples = Iterator.iterate(seed)(_.next).take(100)
      .flatMap(s => asciiGen.apply(Gen.Parameters.default, s))
      .toSeq.distinct
    val got = samples.toDF("s").select(col("s"),
      Decode.decodeBase64(Decode.encodeBase64(col("s"))).as("r"),
      Decode.encodeBase64(col("s")).as("enc")).collect()
    got.foreach { r =>
      assert(r.getString(0) == r.getString(1))
      // Spark's base64 chunks at 76 chars (MIME style, \n separators);
      // strip chunking before comparing with the JDK's RFC 4648 encoder.
      // This is also why oracle SQL must never compare full base64 output
      // against DuckDB's unchunked to_base64 (op15 compares a prefix).
      val jdk = java.util.Base64.getEncoder
        .encodeToString(r.getString(0).getBytes("UTF-8"))
      assert(r.getString(2).replaceAll("[\\r\\n]", "") == jdk,
        s"Spark base64 != JDK for ${r.getString(0)}")
    }
  }

  test("property: rolling hash stays in [0, mod) and composes incrementally") {
    check("rollingHash", Prop.forAll(asciiGen, asciiGen) { (a, b) =>
      val mod = 1000000007L
      def h(init: Long, t: String) =
        t.foldLeft(init)((acc, c) => (acc * 31 + c.toInt) % mod)
      val full = h(0L, a + b)
      // rolling property: hash of the concatenation = resume from h(a)
      full == h(h(0L, a), b) && full >= 0 && full < mod
    })
  }

  test("property: jaccard_bp bounds and symmetry on generated token docs") {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta")
    val docGen = Gen.chooseNum(3, 12).flatMap(n => Gen.listOfN(n, word))
      .map(_.mkString(" "))
    val seed = org.scalacheck.rng.Seed(7L)
    val docs = Iterator.iterate(seed)(_.next).take(40)
      .flatMap(s => docGen.apply(Gen.Parameters.default, s)).toSeq
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }
    val pairs = Dedup.jaccardPairs(docs.toDF("doc_id", "text"), "doc_id", "text", 0L)
      .collect()
    pairs.foreach { r =>
      val (a, b, overlap, na, nb, bp) = (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(a < b)
      assert(bp >= 0 && bp <= 10000)
      assert(overlap <= math.min(na, nb))
      assert(bp == overlap * 10000 / (na + nb - overlap))
    }
  }

  test("property: quantized cosine is symmetric and bounded") {
    val emb = graft.sources.Tables.embeddings(spark, sfDir).limit(30)
    val a = emb.select(col("vec_id").as("a_id"), col("embedding").as("ea"))
    val b = emb.select(col("vec_id").as("b_id"), col("embedding").as("eb"))
    val both = a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .select(
        Similarity.cosBp(Similarity.quantize(col("ea")),
          Similarity.quantize(col("eb"))).as("ab"),
        Similarity.cosBp(Similarity.quantize(col("eb")),
          Similarity.quantize(col("ea"))).as("ba"))
      .collect()
    both.foreach { r =>
      assert(r.getLong(0) == r.getLong(1), "cosine must be symmetric")
      assert(r.getLong(0) >= -10001 && r.getLong(0) <= 10000)
    }
  }

  test("property: bp4 matches a BigDecimal HALF_UP reference (sampled batch)") {
    val valGen = Gen.chooseNum(-1000000000L, 1000000000L)
      .flatMap(i => Gen.chooseNum(0, 999999).map(f => i.toDouble + f / 1e6))
    val seed = org.scalacheck.rng.Seed(13L)
    val samples = (Iterator.iterate(seed)(_.next).take(200)
      .flatMap(s => valGen.apply(Gen.Parameters.default, s)).toSeq
      ++ Seq(0.0, 0.00005, -0.00005, 1.00005, 12345.678949999)).distinct
    val got = samples.toDF("x")
      .select(col("x"), graft.queries.Det.bp4(col("x")).as("bp"))
      .collect().map(r => r.getDouble(0) -> r.getLong(1)).toMap
    samples.foreach { x =>
      // Spark casts double→decimal through the double's shortest decimal
      // representation, then rounds HALF_UP at scale 4 — mirror exactly
      val want = new java.math.BigDecimal(java.lang.Double.toString(x))
        .setScale(4, java.math.RoundingMode.HALF_UP)
        .movePointRight(4).longValueExact()
      assert(got(x) == want, s"bp4($x) = ${got(x)}, want $want")
    }
  }

  test("property: session fold conserves events and never inverts spans") {
    import graft.streaming.Sessionize
    val gap = 5000L
    val evGen = for {
      t <- Gen.chooseNum(0L, 100000L)
      v <- Gen.chooseNum(1, 99).map(_ / 10.0)
    } yield (t, v)
    val batchesGen = Gen.chooseNum(1, 5).flatMap(nb =>
      Gen.listOfN(nb, Gen.chooseNum(0, 8).flatMap(n => Gen.listOfN(n, evGen))))
    check("sessionFold", Prop.forAll(batchesGen) { batches =>
      // batches arrive in arbitrary order relative to each other; within
      // a batch the operator sorts (as flatMapGroupsWithState does)
      var open: Option[Sessionize.SessionState] = None
      val closed = scala.collection.mutable.ArrayBuffer.empty[Sessionize.Session]
      for (b <- batches) {
        val (c, o) = Sessionize.foldBatch(1L, b.sortBy(_._1), gap, open)
        closed ++= c
        open = o
      }
      val fed = batches.map(_.size).sum
      val emitted = closed.map(_.n_events).sum + open.map(_.n).getOrElse(0L)
      val sumFed = batches.flatMap(_.map(_._2)).sum
      val sumEmitted = closed.map(_.sum_value).sum + open.map(_.sum).getOrElse(0.0)
      val spansOk = closed.forall(s => s.start_ms <= s.end_ms && s.n_events >= 1) &&
        open.forall(s => s.start_ms <= s.last_ms && s.n >= 1)
      val gapOk = closed.forall(s =>
        s.n_events > 1 || s.end_ms == s.start_ms) // single-event spans are points
      emitted == fed && math.abs(sumEmitted - sumFed) < 1e-6 && spansOk && gapOk
    })
  }

  test("property: sequence packing matches a driver-side reference on generated corpora") {
    // generated (not fixture) inputs: random per-stream doc token counts,
    // odd capacity 7 so documents straddle pack boundaries constantly;
    // the Spark pipeline must equal an independently-written driver fold
    // (running offset per stream, integer div for pack spans) exactly
    val seed = org.scalacheck.rng.Seed(1234L)
    val nGen = Gen.chooseNum(1, 20)
    val docs = Iterator.iterate(seed)(_.next).take(120)
      .flatMap(s => nGen.apply(Gen.Parameters.default, s))
      .toSeq.zipWithIndex.map { case (n, i) =>
        (i.toLong, s"src${i % 5}", Seq.fill(n)("w").mkString(" "))
      }
    val cap = 7L
    val got = TextOps.packSequences(
        docs.toDF("doc_id", "source", "text"), "doc_id", "source", "text", cap)
      .collect()
      .map(r => (r.getLong(0), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toSet
    val want = docs.groupBy(_._2).values.flatMap { stream =>
      var off = 0L
      stream.sortBy(_._1).flatMap { case (id, _, text) =>
        val n = text.split(" ").length.toLong
        val spans = (off / cap to (off + n - 1) / cap).map { p =>
          (id, p, math.max(p * cap - off, 0L), math.min((p + 1) * cap - off, n))
        }
        off += n
        spans
      }
    }.toSet
    assert(got == want, "Spark packing diverged from the driver reference")
  }

  test("property: simhash of identical text is identical; tokens permuted ≠ guaranteed") {
    val docs = Seq((0L, "a b c d e f"), (1L, "a b c d e f"), (2L, "f e d c b a"))
      .toDF("doc_id", "text")
    val fp = Dedup.simhash60(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(1L))
    // bag-of-words model: permutation-invariant by design
    assert(fp(0L) == fp(2L))
  }

  test("property: LatestAgg fold is arrival- and merge-order invariant") {
    // the changelog compactor's correctness rests on the claim that ANY
    // partitioning of the change sequence into batches, in any order,
    // folds to the same state — exercised directly on the Aggregator
    // (no Spark jobs), with duplicate timestamps so the event_id
    // tiebreak matters
    import graft.functions.{ChangeRec, LatestAgg, LatestBuf}
    val agg = new LatestAgg
    val recGen = for {
      ts <- Gen.chooseNum(0L, 5L)   // tight range → many ts collisions
      id <- Gen.chooseNum(0L, 1000L)
      vc <- Gen.chooseNum(-500L, 500L)
    } yield ChangeRec(ts, id, s"t$id", vc)
    val seqGen = Gen.nonEmptyListOf(recGen)
      // event_id must be unique (it is a key in the real changelog)
      .map(_.groupBy(_.event_id).values.map(_.head).toList)
    def foldVia(batches: Seq[Seq[ChangeRec]]): LatestBuf =
      batches.filter(_.nonEmpty)
        .map(b => b.foldLeft(agg.zero)(agg.reduce))
        .foldLeft(agg.zero)(agg.merge)
    val prop = Prop.forAll(seqGen, Gen.chooseNum(1, 5), Gen.long) {
      (recs, nBatches, shuffleSeed) =>
        val rnd = new scala.util.Random(shuffleSeed)
        val shuffled = rnd.shuffle(recs)
        val batches = shuffled.grouped(
          math.max(1, shuffled.size / nBatches)).toSeq
        val direct = recs.foldLeft(agg.zero)(agg.reduce)
        val batched = foldVia(batches)
        // reference: global max by (ts_us, event_id), count = |recs|
        val best = recs.maxBy(r => (r.ts_us, r.event_id))
        direct == batched &&
          batched == LatestBuf(recs.size.toLong, best.ts_us, best.event_id,
            best.event_type, best.value_cents)
    }
    check("latestAggOrderInvariance", prop)
  }

  test("property: LatestAgg folds identically when ObjectHashAggregate falls back to sorting") {
    // the op106 plan claim is hash aggregation, but past
    // spark.sql.objectHashAggregate.sortBased.fallbackThreshold keys the
    // operator switches to sort-based aggregation MID-TASK, with partial
    // buffers already absorbed — force the threshold to 2 so every task
    // crosses it, and pin that the fold result is unchanged (a 100 TB
    // high-cardinality changelog runs far past any real threshold)
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      for (seed <- 1 to 5) {
        val rnd = new scala.util.Random(seed)
        val recs = (0 until 2000).map { i =>
          (rnd.nextInt(50).toLong, i.toLong, rnd.nextInt(20).toLong,
            s"t${i % 7}", rnd.nextInt(1000).toLong)
        }
        val df = recs
          .toDF("user_id", "event_id", "ts_us", "event_type", "value_cents")
          .repartition(8) // several tasks, each crossing the threshold
        val got = df.groupBy(col("user_id"))
          .agg(graft.functions.LatestAgg.latest(col("ts_us"),
            col("event_id"), col("event_type"), col("value_cents")).as("l"))
          .select(col("user_id"), col("l.n"), col("l.ts_us"),
            col("l.event_id"))
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
            r.getLong(3)))).toMap
        val want = recs.groupBy(_._1).map { case (u, rs) =>
          val best = rs.maxBy(r => (r._3, r._2))
          u -> ((rs.size.toLong, best._3, best._2))
        }
        assert(got == want, s"seed $seed diverged under fallback threshold 2")
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("property: TopKAgg ranks identically when ObjectHashAggregate falls back to sorting") {
    // every ANN probe's final aggregation is TopKAgg — the same
    // TypedImperativeAggregate mechanism as LatestAgg, with the same
    // sort-based fallback past the in-memory map threshold; pin that
    // the bounded top-k buffer merges identically through it
    val key = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "2")
    try {
      for (seed <- 1 to 3) {
        val rnd = new scala.util.Random(100 + seed)
        // unique (g, id) with random scores; ties on score break by id
        val rows = (0 until 3000).map { i =>
          (rnd.nextInt(40).toLong, rnd.nextInt(50).toLong, i.toLong)
        }
        val df = rows.toDF("g", "score", "id").repartition(8)
        val got = df.groupBy(col("g"))
          .agg(graft.functions.TopKAgg.topK(5)(col("score"), col("id"))
            .as("top"))
          .collect().map(r => r.getLong(0) ->
            r.getSeq[org.apache.spark.sql.Row](1)
              .map(x => (x.getLong(0), x.getLong(1))).toSeq).toMap
        val want = rows.groupBy(_._1).map { case (g, rs) =>
          g -> rs.map(r => (r._2, r._3)).sortBy { case (s, id) => (-s, id) }
            .take(5)
        }
        assert(got == want, s"seed $seed diverged under fallback threshold 2")
      }
    } finally prev.fold(spark.conf.unset(key))(spark.conf.set(key, _))
  }

  test("property: funnel fold equals the batch min-chain on sorted event streams") {
    // op199's exactness claim as a property: for ANY event multiset
    // folded in ts order, the state equals op161's closed-form chain
    // (t1 = min view; t2 = min click > t1; t3 = min purchase > t2), and
    // batch-slicing the sorted stream anywhere changes nothing
    import org.scalacheck.Prop.propBoolean
    import graft.streaming.FunnelStream
    import graft.streaming.FunnelStream.{FunnelState, Unset}
    val evGen = Gen.listOf(for {
      t <- Gen.chooseNum(1L, 40L)
      ty <- Gen.oneOf("view", "click", "purchase", "error")
    } yield (ty, t * 1000000000L))
    val cutGen = Gen.chooseNum(0, 30)
    check("funnel fold", Prop.forAll(evGen, cutGen) { (evs, cut) =>
      val sorted = evs.sortBy(_._2)
      val init = FunnelState(Unset, Unset, Unset)
      // closed-form chain
      val t1 = sorted.collectFirst { case ("view", t) => t }
      val t2 = t1.flatMap(a => sorted.collect {
        case ("click", t) if t > a => t }.minOption)
      val t3 = t2.flatMap(b => sorted.collect {
        case ("purchase", t) if t > b => t }.minOption)
      val want = FunnelState(t1.getOrElse(Unset), t2.getOrElse(Unset),
        t3.getOrElse(Unset))
      val (_, oneShot) = FunnelStream.foldBatch(1L, sorted, init)
      // arbitrary batch boundary in the sorted stream
      val (a, b) = sorted.splitAt(math.min(cut, sorted.length))
      val (h1, mid) = FunnelStream.foldBatch(1L, a, init)
      val (h2, sliced) = FunnelStream.foldBatch(1L, b, mid)
      (oneShot == want) :| s"one-shot $oneShot != chain $want" &&
        (sliced == want) :| s"sliced $sliced != chain $want" &&
        ((h1 ++ h2).map(_.step).sorted ==
          Seq(t1.map(_ => "1_view"), t2.map(_ => "2_click"),
            t3.map(_ => "3_purchase")).flatten.sorted) :| "hit steps"
    })
  }

  test("property: largest-remainder apportionment is exact and within one slot") {
    // op201's allocation law on arbitrary strata: sum == K whenever
    // K <= N, every stratum within one slot of its exact quota, and
    // allocation is monotone in the counts' order for equal counts
    import org.scalacheck.Prop.propBoolean
    val strataGen = Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(1L, 500L)))
    check("apportionment", Prop.forAll(strataGen, Gen.chooseNum(1L, 100L)) {
      (counts0, k0) =>
        val counts = counts0.zipWithIndex.map { case (c, i) => (s"s$i", c) }
        val n = counts.map(_._2).sum
        val k = math.min(k0, n)
        val base = counts.map { case (s, c) => (s, k * c / n) }.toMap
        val deficit = (k - base.values.sum).toInt
        val extras = counts.sortBy { case (s, c) => (-(k * c % n), s) }
          .take(deficit).map(_._1).toSet
        val alloc = counts.map { case (s, _) =>
          s -> (base(s) + (if (extras(s)) 1L else 0L)) }.toMap
        (alloc.values.sum == k) :| s"sum ${alloc.values.sum} != $k" &&
          Prop.all(counts.map { case (s, c) =>
            val quota = k.toDouble * c / n
            (math.abs(alloc(s) - quota) < 1.0) :|
              s"$s alloc ${alloc(s)} vs quota $quota"
          }: _*)
    })
  }

  test("property: delta-join decomposition equals the full join on any split") {
    // op222's refresh identity on arbitrary fact/dim tables and
    // arbitrary split predicates: agg(A0⋈B0) + agg(ΔA⋈B0) +
    // agg(A0⋈ΔB) + agg(ΔA⋈ΔB) merged per key == agg(A⋈B)
    import org.scalacheck.Prop.propBoolean
    val dimGen = Gen.chooseNum(1, 20).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(0L, 6L)))      // custkey i -> nation
    val factGen = Gen.chooseNum(0, 60).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0, 25), Gen.chooseNum(1L, 99L))))
    check("deltaJoin", Prop.forAll(dimGen, factGen,
        Gen.chooseNum(2, 5), Gen.chooseNum(2, 7)) { (nations, facts, mc, mo) =>
      val dim = nations.zipWithIndex.map { case (nat, ck) => (ck.toLong, nat) }
      def agg(c: Seq[(Long, Long)], f: Seq[(Int, Long)]) = {
        val nat = c.toMap
        f.zipWithIndex.flatMap { case ((ck, v), _) =>
          nat.get(ck.toLong).map(n => n -> v) }
          .groupBy(_._1).view
          .mapValues(vs => (vs.size.toLong, vs.map(_._2).sum)).toMap
      }
      def merge(ms: Seq[Map[Long, (Long, Long)]]) =
        ms.flatten.groupBy(_._1).view.mapValues(vs =>
          (vs.map(_._2._1).sum, vs.map(_._2._2).sum)).toMap
      val (c0, dc) = dim.partition(_._1 % mc != 0)
      val (f0, df) = facts.partition(_._1 % mo != 0)
      val inc = merge(Seq(agg(c0, f0), agg(dc, f0), agg(c0, df),
        agg(dc, df)))
      val full = agg(dim, facts)
      (inc == full) :| s"inc $inc != full $full"
    })
  }

  test("property: hash-min label propagation converges to union-find components") {
    // op208's algorithm-equivalence law on arbitrary graphs: iterated
    // min-of-neighbors labels reach exactly the union-find partition,
    // within |V| rounds
    import org.scalacheck.Prop.propBoolean
    val edgeGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.zip(Gen.chooseNum(0L, 15L), Gen.chooseNum(0L, 15L))))
    check("hashMinCC", Prop.forAll(edgeGen) { es0 =>
      val und = es0.filter(e => e._1 != e._2)
        .flatMap(e => Seq(e, e.swap)).toSet
      val verts = und.map(_._1)
      // hash-min propagation
      var labels = verts.map(v => v -> v).toMap
      var changed = true
      var rounds = 0
      while (changed && rounds <= verts.size + 1) {
        val nbrMin = und.toSeq.groupBy(_._2).view.mapValues(
          _.map(e => labels(e._1)).min).toMap
        val next = labels.map { case (v, l) =>
          v -> math.min(l, nbrMin.getOrElse(v, l)) }
        changed = next != labels
        labels = next
        rounds += 1
      }
      // union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElse(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      und.foreach { case (x, y) =>
        val (rx, ry) = (find(x), find(y))
        if (rx != ry) parent(math.max(rx, ry)) = math.min(rx, ry)
      }
      val uf = verts.map(v => v -> find(v)).toMap
      (labels == uf) :| s"propagation $labels != union-find $uf" &&
        (rounds <= verts.size + 1) :| "failed to converge"
    })
  }

  test("property: RRF fusion is monotone in either leg's rank") {
    // op210's fusion law: improving a doc's rank in one leg (holding
    // the other fixed) never lowers its fused score; absent legs
    // contribute exactly 0
    import org.scalacheck.Prop.propBoolean
    def ppm(r: Long) = if (r > 0) 1000000L / (60 + r) else 0L
    check("rrfMonotone", Prop.forAll(
        Gen.chooseNum(1L, 50L), Gen.chooseNum(1L, 50L),
        Gen.oneOf(-1L, 1L, 5L, 20L)) { (r1, r2, other) =>
      val (lo, hi) = (math.min(r1, r2), math.max(r1, r2))
      val better = ppm(lo) + ppm(other)
      val worse = ppm(hi) + ppm(other)
      (better >= worse) :| s"rank $lo scored below rank $hi" &&
        (ppm(-1L) == 0L) :| "absent leg must contribute 0"
    })
  }

  test("property: URL canonicalization is idempotent (sampled batch)") {
    // canonicalize(canonicalize(u)) == canonicalize(u): every rule
    // (port strip, www strip, lowercase, tracking-param drop, param
    // sort) must leave an already-canonical URL untouched — the
    // invariant that makes a canonical-URL store safe to re-ingest
    import graft.functions.Urls
    val seed = org.scalacheck.rng.Seed(1313L)
    val hostGen = for {
      www <- Gen.oneOf("", "www.", "WWW.")
      name <- Gen.oneOf("site", "Site", "a-b", "x9")
      n <- Gen.chooseNum(0, 99)
      tld <- Gen.oneOf("com", "org")
      port <- Gen.oneOf("", ":443", ":80", ":8443")
    } yield s"$www$name$n.example.$tld$port"
    val urlGen = for {
      host <- hostGen
      // percent-escapes stay within the RFC grammar (every % starts a
      // valid hex triple): unreserved escapes (%7E %41 %2d — decoded,
      // upper and lower hex) and reserved ones (%2F %3F — kept) both
      // appear, so idempotence covers the r14 decode rule
      path <- Gen.oneOf("", "/", "/p/1", "/a/b-c", "/p/%7Ev", "/p/~v",
        "/%41b%2Fc", "/x%2dy%3F")
      q <- Gen.oneOf("", "?id=3", "?utm_source=x&id=2&b=1",
        "?ref=rss&fbclid=z", "?b=2&a=1&utm_campaign=c", "?z=1#frag",
        "?id=%34&b=%7e", "?a=%2F2")
    } yield s"https://$host$path$q"
    val samples = Iterator.iterate(seed)(_.next).take(150)
      .flatMap(s => urlGen.apply(Gen.Parameters.default, s))
      .toSeq.distinct
    val got = samples.toDF("u")
      .select(col("u"), Urls.canonicalize(col("u")).as("c1"))
      .select(col("u"), col("c1"), Urls.canonicalize(col("c1")).as("c2"))
      .collect()
    got.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"not idempotent: ${r.getString(0)} -> ${r.getString(1)} -> " +
          s"${r.getString(2)}")
    }
  }
}
