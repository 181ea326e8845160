package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text analysis for large-scale training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting.
  *
  * Everything here is a pure per-row Catalyst expression chain (builtin
  * higher-order functions — codegen'd, no UDFs, no shuffles), so each
  * operator scales embarrassingly with input partitions. Outputs that feed
  * the oracle use exact integer arithmetic (basis points) rather than
  * doubles, making results bit-stable across engines.
  */
object TextOps {

  /** Whitespace tokens of a space-separated document. */
  def tokens(text: Column): Column = split(text, " ")

  /** Token 3-gram shingles (the dedup unit: with a tiny vocabulary,
    * unigrams collide constantly; trigrams discriminate). */
  def trigrams(text: Column): Column = trigramsOfTokens(tokens(text))

  /** Trigrams from a pre-split token array column. Callers on hot paths
    * should project the token array FIRST and pass the attribute here —
    * a lambda over `split(text)` re-runs the split on every element
    * access (3 splits × ~n trigrams per doc), which dominated the dedup
    * benchmark before this was hoisted. */
  def trigramsOfTokens(t: Column): Column =
    // sequence(0, n) descends when n<0 — guard docs under 3 tokens
    when(size(t) < 3, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - 3),
        i => concat_ws(" ", element_at(t, i + 1), element_at(t, i + 2),
          element_at(t, i + 3))))

  /** Adjacent token pairs from a pre-split token array column, as
    * (w1, w2) structs. Same descending-sequence guard as
    * [[trigramsOfTokens]]: docs under 2 tokens yield an empty array
    * instead of an ANSI out-of-range error. */
  def bigramsOfTokens(t: Column): Column =
    when(size(t) < 2,
        array().cast("array<struct<w1:string,w2:string>>"))
      .otherwise(transform(sequence(lit(0), size(t) - 2),
        i => struct(element_at(t, i + 1).as("w1"),
          element_at(t, i + 2).as("w2"))))

  /** Space-joined token n-grams from a pre-split token array column,
    * for any fixed n. Same descending-sequence guard as
    * [[trigramsOfTokens]]: docs under n tokens yield an empty array. */
  def ngramsOfTokens(t: Column, n: Int): Column =
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), size(t) - (n - 1)),
        i => array_join(slice(t, i, lit(n)), " ")))

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(tokens(text)).cast("bigint")

  /** BPE-ish token count: alphabetic runs and single non-space symbols
    * counted separately (a cheap proxy for subword tokenizer load). */
  def tokenCountBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))
      .cast("bigint")

  /** Multiset count of tokens belonging to a marker set. */
  def markerCount(text: Column, markers: Seq[String]): Column = {
    val set = array(markers.map(lit): _*)
    size(filter(tokens(text), t => array_contains(set, t))).cast("bigint")
  }

  /** Language-ID heuristic: argmax of per-language marker-token counts with
    * a deterministic tiebreak (first language in `profiles` wins ties).
    * Real-world profiles would be char n-gram frequencies; the mechanism —
    * a per-row score vector + argmax — is identical and shuffle-free.
    */
  def langId(text: Column, profiles: Seq[(String, Seq[String])]): Column = {
    val scores = profiles.map { case (lang, markers) =>
      (lang, markerCount(text, markers))
    }
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und"): Column) { case ((lang, sc), els) =>
      when(sc === best && sc > 0, lit(lang)).otherwise(els)
    }
  }

  /** Default marker profiles (stopwords) for the heuristic. */
  val defaultProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a", "in", "is", "that"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "es"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "ein", "zu"))

  /** Character count excluding spaces (exact, integer). */
  def charCount(text: Column): Column =
    length(regexp_replace(text, " ", "")).cast("bigint")

  /** Non-alphanumeric, non-space character count (punctuation proxy;
    * explicit char class so Java and RE2 regex dialects agree). */
  def punctCount(text: Column): Column =
    (length(text) - length(regexp_replace(text, "[^A-Za-z0-9 ]", "")))
      .cast("bigint")

  /** Stopword ratio in basis points: 10000 * stopword_tokens / tokens. */
  def stopwordRatioBp(text: Column, stopwords: Seq[String]): Column = {
    val n = tokenCountWs(text)
    when(n === 0, lit(0L))
      .otherwise(markerCount(text, stopwords) * 10000L / n).cast("bigint")
  }

  /** Mean token length in basis points (10000 * chars / tokens). */
  def meanTokenLenBp(text: Column): Column = {
    val n = tokenCountWs(text)
    when(n === 0, lit(0L)).otherwise(charCount(text) * 10000L / n).cast("bigint")
  }

  /** Quality score in basis points — a monotone combination of
    * length, stopword ratio and mean token length, clamped to [0,10000].
    * Integer arithmetic end-to-end: deterministic across engines.
    */
  def qualityScoreBp(text: Column, stopwords: Seq[String]): Column = {
    val lenScore = least(tokenCountWs(text) * 100L, lit(2500L))
    val stopScore = least(stopwordRatioBp(text, stopwords), lit(2500L))
    val tokLen = meanTokenLenBp(text)
    val tokScore = least(greatest(tokLen - 20000L, lit(0L)) / 4L, lit(2500L))
    val base = lit(2500L)
    (base + lenScore + stopScore + tokScore).cast("bigint")
  }

  /** 60-bit deterministic hash of a string: the first 15 hex digits of its
    * md5, as a BIGINT. Identical in DuckDB as
    * ('0x' || substring(md5(s),1,15))::BIGINT — the cross-engine base hash
    * for minhash/simhash. */
  def md5Hash60(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 15), 16, 10).cast("bigint")

  /** Polynomial rolling hash over the characters of a string:
    * h = fold(chars, h0=0, h -> (h*31 + ascii(ch)) mod 1e9+7).
    * Builtin `aggregate` higher-order fn — single codegen'd pass. */
  def rollingHash(text: Column, mod: Long = 1000000007L): Column =
    aggregate(split(text, ""), lit(0L),
      (acc, ch) => (acc * 31L + ascii(ch)) % mod)

  /** PII patterns shared by the scrubber and its oracle — restricted to
    * syntax RE2 (DuckDB) and java.util.regex interpret identically
    * (char classes, bounded quantifiers, \b anchors; no lookaround). */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phonePattern = "\\b[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}\\b"

  /** PII scrubbing: redact emails then phone numbers. Per-row codegen'd
    * regexp_replace chain (Spark replaces ALL matches; the DuckDB twin
    * needs the explicit 'g' flag). */
  def scrubPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** Count of pattern matches in a string (BIGINT). */
  def matchCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("bigint")

  /** Sliding-window token chunking (context-window packing for training
    * samples): windows of `width` tokens every `stride` tokens; the last
    * window is the remainder (never empty for non-empty docs). Pure
    * built-ins — sequence/transform/slice/posexplode — one narrow
    * codegen'd generator stage, no shuffle: at 100 TB this is a map-only
    * pass whose output is ~n/stride rows per doc. Returns one row per
    * chunk: (chunk_idx, chunk, n_tokens). */
  def tokenChunks(df: org.apache.spark.sql.DataFrame, idCol: String,
      textCol: String, width: Int, stride: Int): org.apache.spark.sql.DataFrame = {
    require(stride > 0 && width >= stride, "need width >= stride > 0")
    df.select(col(idCol), tokens(col(textCol)).as("toks"))
      .withColumn("n", size(col("toks")))
      .withColumn("n_chunks",
        expr(s"IF(n <= $width, 1, CAST((n - $width + $stride - 1) DIV $stride AS INT) + 1)"))
      .select(col(idCol),
        posexplode(expr(
          s"""transform(sequence(0, n_chunks - 1),
             |  i -> struct(array_join(slice(toks, i * $stride + 1, $width), ' ')
             |                AS chunk,
             |              least($width, n - i * $stride) AS n_tokens))"""
            .stripMargin)).as(Seq("chunk_idx", "c")))
      .select(col(idCol), col("chunk_idx").cast("bigint").as("chunk_idx"),
        col("c.chunk").as("chunk"),
        col("c.n_tokens").cast("bigint").as("n_tokens"))
  }

  /** Concatenate-and-cut sequence packing (op87's engine): per
    * `streamCol` stream, documents concatenate in `idCol` order and the
    * token stream is cut every `capacity` tokens; a document spans packs
    * (tok_off div capacity)..((tok_off+n_tok−1) div capacity) and
    * contributes the token range [start_in_doc, end_in_doc) to each.
    * Entirely integer arithmetic (window cumsum + div). One shuffle
    * keyed by the pack stream; no global order needed — at 100 TB key by
    * (source, shard) with shards sized so a stream fits a task. Returns
    * (doc_id, source, n_tok, tok_off, pack_id, start_in_doc, end_in_doc).
    * Invariants (spec'd, fixture + generated inputs): every pack except
    * each stream's last holds exactly `capacity` tokens; a doc's ranges
    * are contiguous, consecutive-pack, and cover [0, n_tok). */
  def packSequences(df: org.apache.spark.sql.DataFrame, idCol: String,
      streamCol: String, textCol: String,
      capacity: Long): org.apache.spark.sql.DataFrame = {
    require(capacity > 0, "need capacity > 0")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(streamCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    df.select(col(idCol).as("doc_id"), col(streamCol).as("source"),
        tokenCountWs(col(textCol)).as("n_tok"))
      .withColumn("tok_off",
        coalesce(sum(col("n_tok")).over(w), lit(0L)).cast("bigint"))
      .filter(col("n_tok") > 0)
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_off"),
        explode(sequence(expr(s"tok_off div $capacity"),
          expr(s"(tok_off + n_tok - 1) div $capacity"))).as("pack_id"))
      .select(col("doc_id"), col("source"), col("n_tok"), col("tok_off"),
        col("pack_id").cast("bigint").as("pack_id"),
        greatest(col("pack_id") * capacity - col("tok_off"), lit(0L))
          .cast("bigint").as("start_in_doc"),
        least((col("pack_id") + 1) * capacity - col("tok_off"), col("n_tok"))
          .cast("bigint").as("end_in_doc"))
  }
}
