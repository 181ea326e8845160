package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, TextOps, Vocab}
import graft.sources.Tables
import Det.{big, bp4, ordered}

/** Text-analysis pack (split out of TrainQueries in r11 — same keys,
  * same oracles, zero behavior change): language ID, quality scoring,
  * TF-IDF/keywords, PII scrub, chunking, repetition filters, bigram-LM
  * scoring + held-out perplexity, n-gram novelty, document
  * fingerprinting, and the BPE tokenizer family (train/encode/merges/
  * fertility). All scores integer-exact (bp/micro-unit conventions).
  */
object TextQueries {
  type Q = (SparkSession, String) => DataFrame

  /** op126: full BPE training — `bpeRounds` merge rounds, each one
    * bounded pair-count aggregate over the persisted vocabulary table
    * plus a 1-row argmax collect. op124 is one such round; this is the
    * trainer a tokenizer user actually runs. */
  val bpeRounds = 12

  private[queries] val enStop = TextOps.defaultProfiles.head._2

  /** Language-ID heuristic: marker-count argmax + the score vector. */
  val op70LangId: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val scored = doc.select(col("doc_id"),
      TextOps.langId(col("text"), TextOps.defaultProfiles).as("lang_pred"),
      TextOps.markerCount(col("text"), TextOps.defaultProfiles(0)._2).as("s_en"),
      TextOps.markerCount(col("text"), TextOps.defaultProfiles(1)._2).as("s_es"),
      TextOps.markerCount(col("text"), TextOps.defaultProfiles(2)._2).as("s_de"))
    ordered(scored, "doc_id")
  }

  /** Quality scoring: token counts (ws + BPE-ish), char/punct counts,
    * stopword ratio, mean token length, composite score — all integer. */
  val op71Quality: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    ordered(
      doc.select(col("doc_id"),
        TextOps.tokenCountWs(col("text")).as("n_tok_ws"),
        TextOps.tokenCountBpe(col("text")).as("n_tok_bpe"),
        TextOps.charCount(col("text")).as("n_chars_nosp"),
        TextOps.punctCount(col("text")).as("n_punct"),
        TextOps.stopwordRatioBp(col("text"), enStop).as("stop_bp"),
        TextOps.meanTokenLenBp(col("text")).as("tok_len_bp"),
        TextOps.qualityScoreBp(col("text"), enStop).as("quality_bp")),
      "doc_id")
  }

  /** TF-IDF (SURVEY §2.7 doc-frequency): per (doc, token) term frequency ×
    * log(N/df), in deterministic integer basis points — tf and df are
    * exact counts, ln on integer ratios is IEEE-deterministic, floor is
    * exact. Two aggregations (tf per doc-token, df per token) + one
    * broadcast-sized join on token. */
  val op72Tfidf: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    // corpus size N as a lazy 1-row aggregate (column-pruned scan),
    // broadcast-cross-joined in — no eager driver-side count/extra action
    val nDocs = broadcast(doc.agg(count(lit(1)).cast("double").as("__n")))
    val tokens = doc.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val df = tokens.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).cast("bigint").as("df"))
    ordered(
      tf.join(broadcast(df), "token")
        .crossJoin(nDocs)
        .select(col("doc_id"), col("token"), col("tf"), col("df"),
          floor(col("tf") * log(col("__n") / col("df")) * 10000d)
            .cast("bigint").as("tfidf_bp")),
      "doc_id", "token")
  }

  /** op219 keyword depth. */
  private val kwK = 3

  /** op219: per-document keyword extraction — op72's exact tf·idf
    * integers (floor(tf·ln(N/df)·10⁴), the shared-arithmetic recipe)
    * trimmed to the top-[[kwK]] terms per document (ties by token) —
    * the doc-tagging/routing primitive (what a curation pipeline
    * indexes or clusters on when embeddings are too expensive).
    *
    * 100 TB shape: identical to op72 until the trim — two
    * map-combinable shuffles, df broadcast, N a plan-time scalar; the
    * top-k window partitions BY DOCUMENT (state = one doc's distinct
    * terms, bounded by doc length), so no global sort exists anywhere.
    * At extreme per-doc vocabularies the op158 TopKAgg trim applies;
    * the window spelling keeps the string token in-band. */
  val op219Keywords: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val nDocs = broadcast(doc.agg(count(lit(1)).cast("double").as("__n")))
    val tokens = doc.select(col("doc_id"),
      explode(TextOps.tokens(col("text"))).as("token"))
    val tf = tokens.groupBy(col("doc_id"), col("token"))
      .agg(count(lit(1)).cast("bigint").as("tf"))
    val df = tokens.select(col("doc_id"), col("token")).distinct()
      .groupBy(col("token")).agg(count(lit(1)).cast("bigint").as("df"))
    val scored = tf.join(broadcast(df), "token")
      .crossJoin(nDocs)
      .select(col("doc_id"), col("token"),
        floor(col("tf") * log(col("__n") / col("df")) * 10000d)
          .cast("bigint").as("tfidf_bp"))
    ordered(
      scored.withColumn("rank", big(row_number().over(
          org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
            .orderBy(col("tfidf_bp").desc, col("token")))))
        .where(col("rank") <= kwK)
        .select("doc_id", "rank", "token", "tfidf_bp"),
      "doc_id", "rank")
  }

  /** PII scrubbing: redact emails/phones + match counts (per-row regexp
    * chain, narrow). The fixture corpus carries no PII, so the oracle
    * proves the pipeline is a well-formed identity there; redaction
    * behavior itself is spec'd on planted PII. */
  val op74Scrub: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    ordered(
      doc.select(col("doc_id"),
        TextOps.scrubPii(col("text")).as("scrubbed"),
        TextOps.matchCount(col("text"), TextOps.emailPattern).as("n_emails"),
        TextOps.matchCount(col("text"), TextOps.phonePattern).as("n_phones")),
      "doc_id")
  }

  /** Sliding-window token chunking: 32-token windows, stride 16 —
    * context-window packing for training samples. */
  val op75Chunks: Q = (s, d) =>
    ordered(
      TextOps.tokenChunks(Tables.documents(s, d), "doc_id", "text", 32, 16),
      "doc_id", "chunk_idx")

  /** Repetition signals (the classic dataset-curation filters): fraction
    * of duplicated trigrams and fraction of the single most frequent
    * token, both in basis points. Trigram part is per-row array math
    * (narrow); the top-token part is explode → two partial-aggregating
    * groupBys → join back on doc_id — one shuffle keyed by doc at any
    * scale. */
  val op76Repetition: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val tri = doc.select(col("doc_id"),
        TextOps.trigramsOfTokens(TextOps.tokens(col("text"))).as("tris"))
      .select(col("doc_id"),
        size(col("tris")).cast("bigint").as("n_tri"),
        size(array_distinct(col("tris"))).cast("bigint").as("n_tri_distinct"))
      .withColumn("dup_tri_bp",
        when(col("n_tri") === 0, lit(0L))
          .otherwise(expr("(n_tri - n_tri_distinct) * 10000 div n_tri"))
          .cast("bigint"))
    val tok = doc.select(col("doc_id"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("doc_id"), col("token")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(max(col("c")).as("max_c"), sum(col("c")).as("n_tok"))
      .select(col("doc_id"),
        expr("max_c * 10000 div n_tok").cast("bigint").as("top_tok_bp"))
    ordered(tri.join(tok, "doc_id"), "doc_id")
  }

  /** The n values of the Gopher repetition-rule family (Rae et al.
    * 2021, Table A1): top-n-gram character fraction for n ∈ {2,3,4},
    * duplicated-n-gram character fraction for n ∈ {5..10}. */
  private val gopherTopNs = Seq(2, 3, 4)
  private val gopherDupNs = Seq(5, 6, 7, 8, 9, 10)

  /** Published Gopher thresholds, in basis points: a document passes
    * when every metric is at or under its bound (0.20/0.18/0.16 for
    * the top fractions, 0.15 down to 0.10 for the duplicate ones). */
  private val gopherMaxBp: Map[Int, Long] = Map(
    2 -> 2000L, 3 -> 1800L, 4 -> 1600L,
    5 -> 1500L, 6 -> 1400L, 7 -> 1300L, 8 -> 1200L, 9 -> 1100L,
    10 -> 1000L)

  /** op291: Gopher-style repetition quality rules — for each document,
    * the fraction of characters covered by the single most frequent
    * n-gram (n ∈ {2,3,4}, tie-break most-frequent-then-lexicographic)
    * and by all duplicated n-grams (n ∈ {5..10}, each occurrence's
    * characters counted, the standard overlapping-span approximation),
    * both in basis points of the document's character length and capped
    * at 10000, plus `gopher_ok` = 1 iff every metric passes the
    * published threshold. Complements op76 (distinct-trigram and
    * top-token COUNT ratios) with the character-mass spelling the
    * public corpus-curation recipes actually gate on.
    *
    * Shape: all nine n values explode from ONE projection of the token
    * array (per-row higher-order functions, no UDFs), and each n-gram
    * crosses the ONE shuffle as (md5Hash60, char_len) — a fixed-width
    * ~24-byte row instead of the up-to-10-token gram string (at 100 TB
    * the string spelling ships ≈Σn ≈ 50× the corpus bytes through the
    * exchange; the hash spelling ships ~2×). Everything downstream is
    * doc-keyed aggregation — embarrassingly parallel at any corpus
    * size, never cross-doc joined. The top-gram tie-break is therefore
    * (count desc, HASH asc) in both engines; a 60-bit collision inside
    * one (doc, n) group (a few hundred keys) is ~impossible and would
    * merge identically on both sides anyway. */
  val op291GopherRep: Q = (s, d) => {
    val ns = gopherTopNs ++ gopherDupNs
    val doc = Tables.documents(s, d).select(col("doc_id"),
      length(col("text")).cast("bigint").as("n_chars"),
      TextOps.tokens(col("text")).as("toks"))
    val grams = doc.select(col("doc_id"), explode(array(ns.map(n =>
        struct(lit(n).as("n"),
          TextOps.ngramsOfTokens(col("toks"), n).as("gs"))): _*)).as("x"))
      .select(col("doc_id"), col("x.n").as("n"),
        explode(col("x.gs")).as("gram"))
      .select(col("doc_id"), col("n"),
        TextOps.md5Hash60(col("gram")).as("gh"),
        length(col("gram")).cast("bigint").as("glen"))
    val cnts = grams.groupBy("doc_id", "n", "gh")
      .agg(count(lit(1)).as("cnt"), max(col("glen")).as("glen"))
    // argmax(cnt desc, hash asc) via struct-min: (-cnt, gh) ascending
    val perN = cnts.groupBy("doc_id", "n")
      .agg(min(struct((-col("cnt")).as("nc"), col("gh").as("gh"),
          col("glen").as("gl"))).as("top"),
        // per-doc char-mass: Σ cnt·glen ≤ n_grams·max_gram_len ≤
        // n_chars·(10·max_token+9) — fits BIGINT with ~10⁶× margin
        // for any document that fits in memory at all
        sum(when(col("cnt") > 1, col("cnt") * col("glen"))
          .otherwise(lit(0L))).as("dup_chars"))
      .select(col("doc_id"), col("n"),
        (-col("top.nc") * col("top.gl")).cast("bigint").as("top_chars"),
        col("dup_chars").cast("bigint").as("dup_chars"))
    def bpOf(chars: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      least(when(col("n_chars") === 0, lit(0L))
        .otherwise(chars * 10000L / col("n_chars")), lit(10000L))
        .cast("bigint")
    val metricCols =
      gopherTopNs.map(n => max(when(col("n") === n, col("top_bp")))
        .as(s"top${n}_bp")) ++
      gopherDupNs.map(n => max(when(col("n") === n, col("dup_bp")))
        .as(s"dup${n}_bp"))
    val wide = perN.join(doc.select(col("doc_id"), col("n_chars")), "doc_id")
      .select(col("doc_id"), col("n"),
        bpOf(col("top_chars")).as("top_bp"),
        bpOf(col("dup_chars")).as("dup_bp"))
      .groupBy("doc_id")
      .agg(metricCols.head, metricCols.tail: _*)
    val named = (gopherTopNs.map(n => s"top${n}_bp") ++
      gopherDupNs.map(n => s"dup${n}_bp"))
    val filled = named.foldLeft(
        doc.select(col("doc_id")).join(wide, Seq("doc_id"), "left")) {
      (df, c) => df.withColumn(c, coalesce(col(c), lit(0L)))
    }
    val okCond = (gopherTopNs.map(n => col(s"top${n}_bp") <= gopherMaxBp(n))
      ++ gopherDupNs.map(n => col(s"dup${n}_bp") <= gopherMaxBp(n)))
      .reduce(_ && _)
    ordered(filled.withColumn("gopher_ok",
      when(okCond, lit(1L)).otherwise(lit(0L))), "doc_id")
  }

  /** Bigram language-model scoring (perplexity-style quality filter):
    * score each document by its average add-one-smoothed bigram
    * log-probability under a model trained on the corpus itself —
    * avg over bigrams of ln((c(w1,w2)+1)/(c(w1)+V)).
    *
    * Determinism: each bigram's log-prob is floor-quantized to integer
    * basis points BEFORE aggregation (ln of identical integer ratios is
    * IEEE-identical on both engines; summing doubles would be
    * partition-order dependent, summing quantized integers is
    * associative). Scale: both count tables are vocabulary-bounded
    * aggregates with map-side partials; the per-occurrence join shuffles
    * on (w1, w2) and AQE broadcasts the count side when it fits. */
  val op78LmScore: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val toks = doc.select(col("doc_id"), TextOps.tokens(col("text")).as("t"))
    // three consumers (occurrences, bigram counts, unigram counts) —
    // materialize once instead of re-tokenizing the corpus per subtree
    val bigrams = toks.select(col("doc_id"),
        explode(TextOps.bigramsOfTokens(col("t"))).as("b"))
      .select(col("doc_id"), col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val bigramCounts = bigrams.groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("c2"))
    val unigramCounts = bigrams.groupBy(col("w1"))
      .agg(count(lit(1)).as("c1"))
    // vocabulary from the same token projection (no second tokenize scan)
    val vocab = broadcast(
      toks.select(explode(col("t")).as("tok"))
        .agg(countDistinct(col("tok")).as("__v")))
    ordered(
      bigrams
        .join(bigramCounts, Seq("w1", "w2"))
        .join(unigramCounts, Seq("w1"))
        .crossJoin(vocab)
        .select(col("doc_id"),
          floor(log((col("c2") + 1).cast("double") /
            (col("c1") + col("__v")).cast("double")) * 10000d)
            .cast("bigint").as("lp_bp"))
        .groupBy(col("doc_id"))
        .agg(big(count(lit(1))).as("n_bigrams"),
             big(sum(col("lp_bp"))).as("sum_lp_bp"))
        // sum_lp_bp is negative: integer division of negatives differs
        // between engines, so divide the NEGATED (positive) sum and
        // negate back — identical truncation everywhere
        .withColumn("avg_lp_bp",
          (-expr("(-sum_lp_bp) div n_bigrams")).cast("bigint")),
      "doc_id")
  }

  /** op282: held-out bigram perplexity per source — op78's add-one
    * bigram LM with the leakage line drawn: counts (c2, c1) and the
    * vocabulary come from folds 1–4 (fold = doc_id % 5), scoring runs
    * on fold 0 ONLY, so no eval bigram ever contributes to its own
    * probability. Average negative log-likelihood in micro-nats per
    * source — THE corpus-quality leaderboard metric (op78 answers
    * "which DOC is unusual in-sample"; op282 answers "which SOURCE
    * does a model trained on the rest predict worst" — high nll =
    * novel or noisy, suspiciously low = templated or leaked).
    * Unseen eval bigrams take the smoothed (0+1)/(c1+V) mass through
    * the SAME formula via left joins — absent-mass handling is the
    * point of held-out eval, not an edge case.
    *
    * 100 TB shape: identical to op78 (one bigram explode, two
    * map-combinable count tables, vocab as a 1-row broadcast) plus a
    * fold filter that pushes to the scan; eval traffic is 1/|folds|
    * of the corpus. */
  val op282HeldoutPpl: Q = (s, d) => {
    val toks = Tables.documents(s, d)
      .select(col("doc_id"), col("source"), expr("doc_id % 5").as("fold"),
        TextOps.tokens(col("text")).as("t"))
    val bigrams = toks.select(col("source"), col("fold"),
        explode(TextOps.bigramsOfTokens(col("t"))).as("b"))
      .select(col("source"), col("fold"),
        col("b.w1").as("w1"), col("b.w2").as("w2"))
      .localCheckpoint()
    val train = bigrams.where(col("fold") =!= 0)
    val c2 = train.groupBy("w1", "w2").agg(count(lit(1)).as("c2"))
    val c1 = train.groupBy("w1").agg(count(lit(1)).as("c1"))
    val vocab = broadcast(
      toks.where(col("fold") =!= 0)
        .select(explode(col("t")).as("tok"))
        .agg(countDistinct(col("tok")).as("__v")))
    ordered(
      bigrams.where(col("fold") === 0)
        .join(c2, Seq("w1", "w2"), "left")
        .join(c1, Seq("w1"), "left")
        .crossJoin(vocab)
        .select(col("source"),
          floor(log((coalesce(col("c2"), lit(0L)) + 1).cast("double") /
            (coalesce(col("c1"), lit(0L)) + col("__v")).cast("double"))
            * 1000000d).cast("bigint").as("lp_micro"))
        .groupBy("source")
        .agg(big(count(lit(1))).as("n_bigrams"),
          big(sum(col("lp_micro"))).as("sum_lp_micro"))
        // sums are negative: divide the negated sum (op78's convention)
        .withColumn("nll_micro",
          expr("(-sum_lp_micro) div n_bigrams")),
      "source")
  }

  /** N-gram novelty (op117): per document, the fraction of its distinct
    * trigram shingles that occur NOWHERE else in the corpus — the
    * information-density signal dedup-adjacent curation ranks on (a doc
    * whose shingles all appear elsewhere adds nothing even if no single
    * near-duplicate catches it; boilerplate-heavy docs score low).
    * Scale: op61's inverted-index shape WITHOUT the pairing join — one
    * shingle-keyed doc-frequency aggregate joined back, then one
    * doc-keyed aggregate; no pair fan-out at all. Docs under 3 tokens
    * have no shingles and no row (declared semantics). */
  val op117NgramNovelty: Q = (s, d) => {
    // hashed shingles (op61's convention): distinct/df/join run on
    // xxhash64 longs, not trigram strings — the outputs carry only doc
    // ids and counts, so the oracle's raw-string replay still matches
    // (collisions ~2⁻⁶⁴ per pair); the index feeds two consumers, so
    // materialize it once (the jaccardPairs pattern)
    val sh = Dedup.shingleIndexHashed(Tables.documents(s, d), "doc_id",
      "text").localCheckpoint()
    val dfq = sh.groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    ordered(
      sh.join(dfq, "shingle")
        .groupBy(col("doc_id"))
        .agg(big(count(lit(1))).as("n_sh"),
          big(sum(when(col("df") === 1L, 1L).otherwise(0L))).as("n_unique"))
        .withColumn("novelty_bp",
          expr("n_unique * 10000 div n_sh").cast("bigint")),
      "doc_id")
  }

  /** Document fingerprints: polynomial rolling hash + md5. */
  val op73Fingerprint: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    ordered(
      doc.select(col("doc_id"),
        TextOps.rollingHash(col("text")).as("roll_hash"),
        md5(col("text").cast("binary")).as("md5_hash")),
      "doc_id")
  }

  /** op124: BPE vocabulary induction — one merge round (adjacent-pair
    * counting over the word-frequency table + top-K selection), the
    * producer side of the tokenizer stages op75/op87 consume. Exact
    * integer counts, fully deterministic tie-break. */
  val op124VocabMerges: Q = (s, d) =>
    ordered(
      graft.functions.Vocab.pairMerges(Tables.documents(s, d), "text", 50),
      "rank")

  val op126BpeTrain: Q = (s, d) =>
    ordered(
      graft.functions.Vocab.trainMergesDf(Tables.documents(s, d), "text", bpeRounds),
      "round")

  /** op127: tokenize the corpus with the op126 merges — token counts per
    * document under the trained vocabulary. Encode cost is O(vocab)
    * (merge chain over DISTINCT words, broadcast-joined back), not
    * O(corpus).
    *
    * The merge table comes from the content-keyed index cache (the
    * op77/op84 convention): the first invocation per dataset pays the
    * training build ONCE, every later invocation reads the persisted
    * merges — an encoder never retrains its tokenizer per query. The
    * merge list itself is `bpeRounds` rows of plan-time metadata (the
    * same bounded-collect class as the ANN centroid IN-lists), so the
    * encode plan carries the merges as literals with no training stage. */
  val op127BpeEncode: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dir = IndexStore.indexRoot(d, s"bpe_merges_r$bpeRounds", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "merges") { tmp =>
      graft.functions.Vocab.trainMergesDf(docs, "text", bpeRounds)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges")
    }
    val merges = s.read.parquet(s"$dir/merges")
      .orderBy(col("round")).collect() // bpeRounds rows: plan-time metadata
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq
    ordered(
      graft.functions.Vocab.encodeTokens(docs, "doc_id", "text", merges),
      "doc_id")
  }

  /** op259: tokenizer fertility eval — tokens-per-word (bp) of the
    * trained BPE vocabulary per SOURCE: the eval that decides whether
    * a tokenizer fits a corpus slice (fertility near 10⁴ ≈ one token
    * per word = well-covered text; high fertility = the vocab
    * fragments that source, inflating sequence length and training
    * cost — the standard multilingual-tokenizer diagnostic). Rides
    * op127's persisted merges and encode chain verbatim (training
    * never recurs), adding one source rollup.
    *
    * 100 TB shape: op127's argument — the merge chain runs over
    * DISTINCT words, the corpus pays one broadcast join; the source
    * rollup is map-combinable on top. */
  val op259TokenizerFertility: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val dir = IndexStore.indexRoot(d, s"bpe_merges_r$bpeRounds", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "merges") { tmp =>
      graft.functions.Vocab.trainMergesDf(docs, "text", bpeRounds)
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/merges")
    }
    val merges = s.read.parquet(s"$dir/merges")
      .orderBy(col("round")).collect()
      .map(r => (r.getAs[String]("left_sym"), r.getAs[String]("right_sym")))
      .toSeq
    ordered(
      graft.functions.Vocab.encodeTokens(docs, "doc_id", "text", merges)
        .join(docs.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(big(sum("n_words")).as("n_words"),
          big(sum("n_tokens")).as("n_tokens"))
        .withColumn("fertility_bp",
          expr("(n_tokens * 10000) div n_words")),
      "source")
  }


  val defs: Map[String, Q] = Map(
    "op70_langid" -> op70LangId,
    "op71_quality" -> op71Quality,
    "op72_tfidf" -> op72Tfidf,
    "op219_keywords" -> op219Keywords,
    "op73_fingerprint" -> op73Fingerprint,
    "op74_scrub" -> op74Scrub,
    "op75_chunks" -> op75Chunks,
    "op76_repetition" -> op76Repetition,
    "op291_gopher_rep" -> op291GopherRep,
    "op78_lm_score" -> op78LmScore,
    "op282_heldout_ppl" -> op282HeldoutPpl,
    "op117_ngram_novelty" -> op117NgramNovelty,
    "op124_vocab_merges" -> op124VocabMerges,
    "op126_bpe_train" -> op126BpeTrain,
    "op127_bpe_encode" -> op127BpeEncode,
    "op259_tokenizer_fertility" -> op259TokenizerFertility)

  private val baseOracle: Map[String, String] = Map(
    "op70_langid" -> {
      def cntSql(markers: Seq[String]) =
        s"len(list_filter(string_split(text,' '), x -> list_contains([${markers.map("'" + _ + "'").mkString(",")}], x)))"
      val en = cntSql(TextOps.defaultProfiles(0)._2)
      val es = cntSql(TextOps.defaultProfiles(1)._2)
      val de = cntSql(TextOps.defaultProfiles(2)._2)
      s"""WITH s AS (SELECT doc_id, $en AS s_en, $es AS s_es, $de AS s_de FROM documents)
        |SELECT doc_id,
        |  CASE WHEN s_en >= s_es AND s_en >= s_de AND s_en > 0 THEN 'en'
        |       WHEN s_es >= s_de AND s_es > 0 THEN 'es'
        |       WHEN s_de > 0 THEN 'de' ELSE 'und' END AS lang_pred,
        |  CAST(s_en AS BIGINT) AS s_en, CAST(s_es AS BIGINT) AS s_es,
        |  CAST(s_de AS BIGINT) AS s_de
        |FROM s ORDER BY doc_id""".stripMargin
    },
    "op71_quality" -> {
      val stop = enStop.map("'" + _ + "'").mkString(",")
      s"""WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok_ws,
        |    CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS BIGINT) AS n_tok_bpe,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nosp,
        |    CAST(length(text) - length(regexp_replace(text, '[^A-Za-z0-9 ]', '', 'g')) AS BIGINT) AS n_punct,
        |    CAST(len(list_filter(string_split(text, ' '), x -> list_contains([$stop], x))) AS BIGINT) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tok_ws, n_tok_bpe, n_chars_nosp, n_punct,
        |    CASE WHEN n_tok_ws = 0 THEN 0 ELSE n_stop * 10000 // n_tok_ws END AS stop_bp,
        |    CASE WHEN n_tok_ws = 0 THEN 0 ELSE n_chars_nosp * 10000 // n_tok_ws END AS tok_len_bp
        |  FROM b)
        |SELECT doc_id, n_tok_ws, n_tok_bpe, n_chars_nosp, n_punct, stop_bp, tok_len_bp,
        |  CAST(2500 + least(n_tok_ws * 100, 2500) + least(stop_bp, 2500)
        |       + least(greatest(tok_len_bp - 20000, 0) // 4, 2500) AS BIGINT) AS quality_bp
        |FROM r ORDER BY doc_id""".stripMargin
    },
    "op72_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents)
        |SELECT tf.doc_id, tf.token, tf.tf, df.df,
        |       CAST(floor(tf.tf * ln(n.n / df.df) * 10000) AS BIGINT) AS tfidf_bp
        |FROM tf JOIN df USING (token) CROSS JOIN n
        |ORDER BY doc_id, token""".stripMargin,
    // op219: op72's chain + the per-doc top-k window
    "op219_keywords" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents),
        |tf AS (SELECT doc_id, token, CAST(count(*) AS BIGINT) AS tf
        |       FROM tok GROUP BY 1, 2),
        |df AS (SELECT token, CAST(count(*) AS BIGINT) AS df
        |       FROM (SELECT DISTINCT doc_id, token FROM tok) GROUP BY token),
        |n AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.token,
        |    CAST(floor(tf.tf * ln(n.n / df.df) * 10000) AS BIGINT)
        |      AS tfidf_bp
        |  FROM tf JOIN df USING (token) CROSS JOIN n),
        |rk AS (
        |  SELECT *, row_number() OVER (PARTITION BY doc_id
        |    ORDER BY tfidf_bp DESC, token) AS rank FROM scored)
        |SELECT doc_id, CAST(rank AS BIGINT) AS rank, token, tfidf_bp
        |FROM rk WHERE rank <= 3 ORDER BY doc_id, rank""".stripMargin,
    "op74_scrub" -> {
      // patterns contain no quotes; DuckDB standard strings keep
      // backslashes literal, so they embed verbatim
      val em = TextOps.emailPattern
      val ph = TextOps.phonePattern
      s"""SELECT doc_id,
        |  regexp_replace(regexp_replace(text, '$em', '<EMAIL>', 'g'),
        |                 '$ph', '<PHONE>', 'g') AS scrubbed,
        |  CAST(len(regexp_extract_all(text, '$em')) AS BIGINT) AS n_emails,
        |  CAST(len(regexp_extract_all(text, '$ph')) AS BIGINT) AS n_phones
        |FROM documents ORDER BY doc_id""".stripMargin
    },
    "op75_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |c AS (
        |  SELECT doc_id, toks, n,
        |         unnest(range(CASE WHEN n <= 32 THEN 1
        |                           ELSE (n - 32 + 15) // 16 + 1 END)) AS i
        |  FROM t)
        |SELECT doc_id, CAST(i AS BIGINT) AS chunk_idx,
        |       array_to_string(toks[i*16+1 : i*16+32], ' ') AS chunk,
        |       CAST(least(32, n - i*16) AS BIGINT) AS n_tokens
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    "op282_heldout_ppl" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 5 AS fold, source,
        |         string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |bg AS (
        |  SELECT fold, source, toks[i+1] AS w1, toks[i+2] AS w2
        |  FROM (SELECT fold, source, toks, unnest(range(n - 1)) AS i
        |        FROM t)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg
        |       WHERE fold <> 0 GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg
        |       WHERE fold <> 0 GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v
        |      FROM (SELECT unnest(toks) AS token FROM t WHERE fold <> 0)),
        |lp AS (
        |  SELECT bg.source,
        |         CAST(floor(ln(CAST(coalesce(c2.c2, 0) + 1 AS DOUBLE)
        |              / CAST(coalesce(c1.c1, 0) + v.v AS DOUBLE))
        |              * 1000000) AS BIGINT) AS lp_micro
        |  FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1)
        |  CROSS JOIN v WHERE bg.fold = 0)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(lp_micro) AS BIGINT) AS sum_lp_micro,
        |       CAST((-sum(lp_micro)) // count(*) AS BIGINT) AS nll_micro
        |FROM lp GROUP BY source ORDER BY source""".stripMargin,
    "op78_lm_score" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, toks[i+1] AS w1, toks[i+2] AS w2
        |  FROM (SELECT doc_id, toks, unnest(range(n - 1)) AS i FROM t)),
        |c2 AS (SELECT w1, w2, count(*) AS c2 FROM bg GROUP BY 1, 2),
        |c1 AS (SELECT w1, count(*) AS c1 FROM bg GROUP BY 1),
        |v AS (SELECT count(DISTINCT token) AS v
        |      FROM (SELECT unnest(string_split(text, ' ')) AS token
        |            FROM documents)),
        |lp AS (
        |  SELECT bg.doc_id,
        |         CAST(floor(ln(CAST(c2.c2 + 1 AS DOUBLE)
        |              / CAST(c1.c1 + v.v AS DOUBLE)) * 10000) AS BIGINT) AS lp_bp
        |  FROM bg JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN v)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |       CAST(sum(lp_bp) AS BIGINT) AS sum_lp_bp,
        |       CAST(-((-sum(lp_bp)) // count(*)) AS BIGINT) AS avg_lp_bp
        |FROM lp GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // op124: DuckDB replays the merge round exactly — same alphabet
    // filter, end-of-word marker, and (cnt desc, pair asc) tie-break
    "op124_vocab_merges" ->
      """WITH words AS (
        |  SELECT w, count(*) AS freq FROM (
        |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
        |    FROM documents)
        |  WHERE regexp_matches(w, '^[a-z]+$')
        |  GROUP BY w),
        |marked AS (SELECT w || '_' AS mw, freq FROM words),
        |pairs AS (
        |  SELECT substring(mw, i, 2) AS pair, freq
        |  FROM marked,
        |       LATERAL (SELECT unnest(generate_series(1, length(mw) - 1)) AS i) t),
        |agg AS (SELECT pair, CAST(sum(freq) AS BIGINT) AS cnt
        |        FROM pairs GROUP BY pair)
        |SELECT CAST(row_number() OVER (ORDER BY cnt DESC, pair) AS BIGINT) AS rank,
        |       pair, cnt
        |FROM agg ORDER BY cnt DESC, pair LIMIT 50""".stripMargin,
    // op126/op127: generated unrolled k-stage replay of the whole BPE
    // training loop (and its encode tail) — see Vocab.trainOracleSql
    "op126_bpe_train" -> graft.functions.Vocab.trainOracleSql(bpeRounds),
    "op127_bpe_encode" -> graft.functions.Vocab.encodeOracleSql(bpeRounds),
    "op259_tokenizer_fertility" ->
      graft.functions.Vocab.fertilityOracleSql(bpeRounds),
    "op117_ngram_novelty" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (${DedupQueries.trigramSql})),
        |df AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
        |d AS (SELECT sh.doc_id, count(*) AS n_sh,
        |        sum(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS n_unique
        |      FROM sh JOIN df USING (shingle) GROUP BY sh.doc_id)
        |SELECT doc_id, CAST(n_sh AS BIGINT) AS n_sh,
        |  CAST(n_unique AS BIGINT) AS n_unique,
        |  CAST(n_unique * 10000 // n_sh AS BIGINT) AS novelty_bp
        |FROM d ORDER BY doc_id""".stripMargin,
    // op291's replay: same nine explodes (list_transform over the
    // token list), same (gh, glen) hash bridge and (cnt DESC, gh ASC)
    // argmax, same integer bp caps; thresholds come from the SAME
    // gopherMaxBp map as the Spark side so the flag can't drift
    "op291_gopher_rep" -> {
      val ns = gopherTopNs ++ gopherDupNs
      val nVals = ns.map(n => s"($n)").mkString(",")
      val metricSel = (gopherTopNs.map(n =>
          s"CAST(max(CASE WHEN n = $n THEN top_bp END) AS BIGINT) AS top${n}_bp") ++
        gopherDupNs.map(n =>
          s"CAST(max(CASE WHEN n = $n THEN dup_bp END) AS BIGINT) AS dup${n}_bp"))
        .mkString(",\n  ")
      val okCond = (gopherTopNs.map(n =>
          s"max(CASE WHEN n = $n THEN top_bp END) <= ${gopherMaxBp(n)}") ++
        gopherDupNs.map(n =>
          s"max(CASE WHEN n = $n THEN dup_bp END) <= ${gopherMaxBp(n)}"))
        .mkString(" AND ")
      s"""WITH d AS (SELECT doc_id, length(text) AS n_chars,
        |            string_split(text, ' ') AS l FROM documents),
        |g AS (SELECT doc_id, n,
        |        ('0x' || substring(md5(gram), 1, 15))::BIGINT AS gh,
        |        length(gram) AS glen
        |      FROM (SELECT doc_id, n,
        |        unnest(list_transform(range(1, greatest(len(l) - n + 2, 1)),
        |          i -> array_to_string(l[i:i+n-1], ' '))) AS gram
        |      FROM d CROSS JOIN (VALUES $nVals) t(n))),
        |c AS (SELECT doc_id, n, gh, count(*) AS cnt, max(glen) AS glen
        |      FROM g GROUP BY 1, 2, 3),
        |p AS (SELECT doc_id, n, cnt * glen AS top_chars
        |      FROM (SELECT doc_id, n, cnt, glen, row_number() OVER
        |              (PARTITION BY doc_id, n ORDER BY cnt DESC, gh) AS rk
        |            FROM c) WHERE rk = 1),
        |q AS (SELECT doc_id, n,
        |        -- per-doc char-mass sum fits BIGINT (bounds: see the
        |        -- Spark-side dup_chars margin note)
        |        sum(CASE WHEN cnt > 1 THEN cnt * glen ELSE 0 END) AS dup_chars
        |      FROM c GROUP BY 1, 2),
        |m AS (SELECT d.doc_id, t.n,
        |        least(CASE WHEN d.n_chars = 0 THEN 0
        |          ELSE coalesce(p.top_chars, 0) * 10000 // d.n_chars END, 10000) AS top_bp,
        |        least(CASE WHEN d.n_chars = 0 THEN 0
        |          ELSE coalesce(q.dup_chars, 0) * 10000 // d.n_chars END, 10000) AS dup_bp
        |      FROM d CROSS JOIN (VALUES $nVals) t(n)
        |      LEFT JOIN p ON p.doc_id = d.doc_id AND p.n = t.n
        |      LEFT JOIN q ON q.doc_id = d.doc_id AND q.n = t.n)
        |SELECT doc_id,
        |  $metricSel,
        |  CAST(CASE WHEN $okCond THEN 1 ELSE 0 END AS BIGINT) AS gopher_ok
        |FROM m GROUP BY doc_id ORDER BY doc_id""".stripMargin
    },
    "op76_repetition" ->
      s"""WITH tri AS (
        |  SELECT doc_id, count(*) AS n_tri, count(DISTINCT shingle) AS n_d
        |  FROM (${DedupQueries.trigramSql}) GROUP BY doc_id),
        |tc AS (
        |  SELECT doc_id, token, count(*) AS c
        |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY 1, 2),
        |tt AS (SELECT doc_id, max(c) AS max_c, sum(c) AS n_tok
        |       FROM tc GROUP BY doc_id)
        |SELECT d.doc_id,
        |  CAST(coalesce(tri.n_tri, 0) AS BIGINT) AS n_tri,
        |  CAST(coalesce(tri.n_d, 0) AS BIGINT) AS n_tri_distinct,
        |  CAST(CASE WHEN coalesce(tri.n_tri, 0) = 0 THEN 0
        |            ELSE (tri.n_tri - tri.n_d) * 10000 // tri.n_tri END AS BIGINT)
        |    AS dup_tri_bp,
        |  CAST(tt.max_c * 10000 // tt.n_tok AS BIGINT) AS top_tok_bp
        |FROM documents d
        |LEFT JOIN tri USING (doc_id)
        |JOIN tt USING (doc_id)
        |ORDER BY doc_id""".stripMargin,
    "op73_fingerprint" ->
      """SELECT doc_id,
        |  CAST(list_reduce(
        |    list_prepend(0::BIGINT,
        |      list_transform(string_split(text, ''), x -> ascii(x)::BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS roll_hash,
        |  md5(text) AS md5_hash
        |FROM documents ORDER BY doc_id""".stripMargin)

  val oracle: Map[String, String] = baseOracle ++ Map(
)
}
