package graft

import org.apache.spark.sql.functions._

import graft.functions.Bm25
import graft.sources.Tables

/** BM25 semantics on a hand-checkable corpus + the broadcast/bounded
  * plan shape the 100 TB argument rests on. */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "cat dog cat"),          // tf(cat)=2, dl=3
    (2L, "cat fish"),             // tf(cat)=1, dl=2
    (3L, "dog dog dog dog"),      // dl=4
    (4L, "bird"),                 // dl=1
    (5L, "cat cat cat cat cat")   // tf(cat)=5, dl=5
  ).toDF("doc_id", "text")

  test("postings carry exact tf and dl; term stats carry exact df and cf") {
    val post = Bm25.postings(corpus, "doc_id", "text")
    val got = post.collect()
      .map(r => (r.getLong(0), r.getString(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    assert(got((1L, "cat")) == (2L, 3L))
    assert(got((1L, "dog")) == (1L, 3L))
    assert(got((3L, "dog")) == (4L, 4L))
    assert(got((5L, "cat")) == (5L, 5L))
    assert(got.size == 7)
    val stats = Bm25.termStats(post).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(stats("cat") == (3L, 8L)) // in docs 1,2,5; 2+1+5 occurrences
    assert(stats("dog") == (2L, 5L))
    assert(stats("bird") == (1L, 1L))
  }

  test("corpus scalars: avgdl is the exact integer sum over the exact count") {
    val row = Bm25.corpusScalars(corpus, "text").head()
    assert(row.getLong(0) == 5L)
    assert(row.getDouble(1) == 15.0 / 5.0) // (3+2+4+1+5)/5
  }

  test("topK ranks by quantized BM25 with deterministic ties, trims to k") {
    val post = Bm25.postings(corpus, "doc_id", "text")
    val qt = Seq((1L, "cat"), (2L, "dog"), (2L, "bird")).toDF("q_id", "token")
    val got = Bm25.topK(post, Bm25.termStats(post),
        Bm25.corpusScalars(corpus, "text"), qt, k = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // q1 "cat": doc 5 (tf 5, but long) vs doc 1 (tf 2, dl 3): the tf
    // saturation + length normalization still favor doc 5's tf=5 over
    // doc 1's tf=2 (reference bm25: 5·2.2/(5+1.2(0.25+0.75·5/3)) >
    // 2·2.2/(2+1.2(0.25+0.75·1)))
    assert(got((1L, 1L)) == 5L)
    assert(got((1L, 2L)) == 1L)
    // q2 "dog bird": doc 3 (tf 4 of dog) vs doc 4 (the only bird doc —
    // rarer term, higher idf, shortest dl)
    assert(Set(got((2L, 1L)), got((2L, 2L))) == Set(3L, 4L))
    // k=2 trims: doc 2 matched "cat" for q1 but ranks 3rd
    assert(got.size == 4)
  }

  test("score quantization is integral and matches a driver-side replay") {
    val post = Bm25.postings(corpus, "doc_id", "text")
    val qt = Seq((1L, "cat")).toDF("q_id", "token")
    val got = Bm25.topK(post, Bm25.termStats(post),
        Bm25.corpusScalars(corpus, "text"), qt, k = 5)
      .collect().map(r => r.getLong(2) -> r.getLong(3)).toMap
    def contrib(tf: Long, dl: Long, df: Long, n: Long, avgdl: Double): Long = {
      val idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
      val tfb = (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * (dl / avgdl)))
      math.floor(idf * tfb * 1000000.0).toLong
    }
    val avgdl = 15.0 / 5.0
    assert(got(5L) == contrib(5, 5, 3, 5, avgdl))
    assert(got(1L) == contrib(2, 3, 3, 5, avgdl))
    assert(got(2L) == contrib(1, 2, 3, 5, avgdl))
  }

  test("plan shape: query terms and stats join broadcast; no window over candidates") {
    val post = Bm25.postings(corpus, "doc_id", "text")
    val qt = Seq((1L, "cat")).toDF("q_id", "token")
    val plan = Bm25.topK(post, Bm25.termStats(post),
        Bm25.corpusScalars(corpus, "text"), qt, k = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"),
      s"query-term/stats joins must broadcast:\n$plan")
    assert(!plan.contains("Window"),
      s"top-k must be the bounded TopKAgg, not a window sort:\n$plan")
  }

  test("op210: fused ranking equals a driver-side RRF of the two legs") {
    val got = graft.queries.LakehouseQueries.op210RrfFusion(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("rank"),
        r.getAs[Long]("doc_id"), r.getAs[Long]("rrf_ppm"),
        r.getAs[Long]("rank_lex"), r.getAs[Long]("rank_vec")))
    // rebuild both legs through the library functions, fuse driver-side
    val docs = Tables.documents(spark, sfDir)
    val post = Bm25.postings(docs, "doc_id", "text")
    val qs = Seq(1L -> "spark", 1L -> "join", 1L -> "window",
      2L -> "customer", 2L -> "order", 2L -> "line",
      3L -> "vector", 3L -> "hash", 3L -> "scan")
    val lex = Bm25.topK(post, Bm25.termStats(post),
        Bm25.corpusScalars(docs, "text"), qs.toDF("q_id", "token"), 20)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("doc_id")) ->
        r.getAs[Long]("rank")).toMap
    val emb = Tables.embeddings(spark, sfDir)
    val vec = graft.functions.Similarity.bruteForceTopK(
        emb.filter(col("vec_id").isin(1L, 2L, 3L)), emb, 20)
      .collect()
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("n_id")) ->
        r.getAs[Long]("rank")).toMap
    val want = (lex.keySet ++ vec.keySet).toSeq.map { k =>
      val rl = lex.getOrElse(k, -1L)
      val rv = vec.getOrElse(k, -1L)
      val ppm = (if (rl > 0) 1000000L / (60 + rl) else 0L) +
        (if (rv > 0) 1000000L / (60 + rv) else 0L)
      (k._1, k._2, ppm, rl, rv)
    }.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(10).zipWithIndex.map {
        case ((_, d, ppm, rl, rv), i) => (q, i + 1L, d, ppm, rl, rv)
      }
    }.sortBy(x => (x._1, x._2))
    assert(got.toSeq.sortBy(x => (x._1, x._2)) == want)
    // both legs genuinely reach the fused top-10, including
    // single-leg survivors (the −1 contract is exercised)
    assert(got.exists(_._5 > 0))
    assert(got.exists(_._6 > 0))
    assert(got.exists(r => r._5 == -1L || r._6 == -1L))
  }

  test("op211: matches equal a driver-side sliding-window phrase scan") {
    val got = graft.queries.LakehouseQueries.op211PhraseSearch(spark, sfDir)
      .collect()
      .map(r => (r.getAs[Long]("phrase_id"), r.getAs[Long]("doc_id"),
        r.getAs[Long]("n_matches"), r.getAs[Long]("first_pos")))
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val phrases = Seq(1L -> "table hash", 2L -> "customer join",
      3L -> "vector small", 4L -> "part filter scan")
    val want = (for {
      (pid, ph) <- phrases
      (did, text) <- docs.toSeq
    } yield {
      val toks = text.split(" ")
      val pt = ph.split(" ")
      val anchors = (0 to toks.length - pt.length)
        .filter(i => pt.indices.forall(j => toks(i + j) == pt(j)))
      (pid, did, anchors)
    }).filter(_._3.nonEmpty)
      .map { case (p, d, a) => (p, d, a.length.toLong, a.min + 1L) }
      .sortBy(x => (x._1, x._2))
    assert(got.toSeq == want)
    // the trigram phrase matches somewhere (length-3 path exercised)
    assert(want.exists(_._1 == 4L), "trigram phrase inert on fixture")
  }
}
