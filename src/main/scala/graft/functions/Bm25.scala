package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** BM25 full-text retrieval over the corpus, on the whitespace-token
  * convention the text-analysis family already uses (split on ' ', the
  * reference's own tokenization granularity — see TextOps).
  *
  * Shape (100 TB): the postings build is ONE shuffle keyed on
  * (doc_id, token) and the term-stats reduction one more keyed on
  * token — both classic map-combinable aggregates. Query scoring joins
  * the postings against a BROADCAST term list (queries are tiny) and a
  * BROADCAST stats/scalars side (vocabulary-sized / one row), so the
  * per-document score is computed where the postings live, with no
  * shuffle wider than the final (q_id, doc_id) reduction; the top-k is
  * the bounded [[TopKAgg]] — at most k rows per (query, partition)
  * cross the wire, never the full candidate set.
  *
  * Determinism (the reason scores are INTEGER micro-units): the BM25
  * arithmetic is emitted as the SAME SQL expression text on both
  * engines ([[contribUbpSql]] is interpolated into the Spark plan via
  * `expr` AND into the DuckDB oracle), so every +,-,*,/ — all IEEE
  * correctly-rounded — evaluates bit-identically; the one
  * non-correctly-rounded function (`ln`) is quantized to
  * floor(·×10⁶) BEFORE the per-document sum, which then runs in exact
  * integer arithmetic and is order-independent across engines and
  * partitions. A float score summed in shuffle order would not be
  * hashable; an integer one is.
  */
object Bm25 {

  /** Inverted-index postings: one row per (doc, token) with term
    * frequency and the document's token length. */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        split(col(textCol), " ").as("toks"))
      .select(col("doc_id"), explode(col("toks")).as("token"),
        size(col("toks")).cast("bigint").as("dl"))
      .groupBy("doc_id", "token")
      .agg(count(lit(1)).as("tf"), max("dl").as("dl"))

  /** Per-term corpus stats over the postings: document frequency and
    * collection frequency. */
  def termStats(post: DataFrame): DataFrame =
    post.groupBy("token")
      .agg(count(lit(1)).as("df"), sum("tf").as("cf"))

  /** One-row corpus scalars: document count and average token length
    * (exact integer sum / exact count, correctly-rounded division —
    * bit-identical on any IEEE engine). */
  def corpusScalars(docs: DataFrame, textCol: String): DataFrame =
    docs.agg(count(lit(1)).as("n"),
        sum(size(split(col(textCol), " ")).cast("bigint")).as("sdl"))
      .withColumn("avgdl",
        expr("CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)"))
      .select("n", "avgdl")

  /** Robertson idf in integer micro-units:
    * floor(ln((N − df + 0.5)/(df + 0.5) + 1) × 10⁶). Shared SQL text —
    * expects columns `n` (bigint) and `df` (bigint) in scope. */
  val idfUbpSql: String =
    "CAST(FLOOR(LN((CAST(n - df AS DOUBLE) + 0.5) / " +
      "(CAST(df AS DOUBLE) + 0.5) + 1.0) * 1000000.0) AS BIGINT)"

  /** One term's BM25 contribution (k1 = 1.2, b = 0.75) in integer
    * micro-units: floor(idf × tf·(k1+1)/(tf + k1·(1−b+b·dl/avgdl)) ×
    * 10⁶). Shared SQL text — expects columns `n`, `df`, `tf`, `dl`
    * (bigint) and `avgdl` (double) in scope. */
  val contribUbpSql: String =
    "CAST(FLOOR(LN((CAST(n - df AS DOUBLE) + 0.5) / " +
      "(CAST(df AS DOUBLE) + 0.5) + 1.0) * " +
      "((CAST(tf AS DOUBLE) * 2.2) / (CAST(tf AS DOUBLE) + " +
      "1.2 * (0.25 + 0.75 * (CAST(dl AS DOUBLE) / avgdl)))) * " +
      "1000000.0) AS BIGINT)"

  /** Top-k BM25 retrieval for a (q_id, token) query-term table:
    * postings ⋈ broadcast terms ⋈ broadcast stats, integer contribs
    * summed per (query, doc), bounded TopKAgg per query. Output:
    * (q_id, rank, doc_id, score_ubp). */
  def topK(post: DataFrame, stats: DataFrame, scalars: DataFrame,
      queryTerms: DataFrame, k: Int): DataFrame = {
    val cand = post
      .join(broadcast(queryTerms), Seq("token"))
      .join(broadcast(stats.select("token", "df")), Seq("token"))
      .crossJoin(broadcast(scalars))
      .withColumn("contrib", expr(contribUbpSql))
    cand.groupBy("q_id", "doc_id")
      .agg(sum("contrib").as("score_ubp"))
      .groupBy("q_id")
      .agg(TopKAgg.topK(k)(col("score_ubp"), col("doc_id")).as("top"))
      .select(col("q_id"), posexplode(col("top")))
      .select(col("q_id"), (col("pos") + 1).cast("bigint").as("rank"),
        col("col.id").as("doc_id"), col("col.score").as("score_ubp"))
  }
}
