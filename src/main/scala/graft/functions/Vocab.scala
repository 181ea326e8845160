package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Tokenizer-vocabulary induction: one round of BPE merge selection
  * (Sennrich et al. 2016) over a document corpus — the one LLM-pipeline
  * stage the library lacked a producer for (op75/op87 consume token
  * counts; this produces the vocab that tokenizers are trained from).
  *
  * One round = count adjacent symbol pairs across the corpus (symbols
  * start as characters, words carry the standard end-of-word marker
  * `_`), then pick the top-K pairs as the merge table. Subsequent BPE
  * rounds would re-run the same aggregate over re-segmented words; the
  * round's data flow is the expensive, scale-relevant part.
  *
  * Scale: two bounded shuffles. Shuffle 1 groups words (state = the
  * corpus vocabulary, not the corpus); shuffle 2 groups character
  * pairs (state ≤ alphabet², a few KB). The per-word pair explosion is
  * a narrow transform on the DISTINCT-word table, so corpus size only
  * affects the first map side — exactly how a production tokenizer
  * trainer shards. Top-K goes through TakeOrdered (no global sort);
  * the final rank window runs on K rows.
  */
object Vocab {

  /** Top-K adjacent-pair merge candidates: (rank, pair, cnt), ranked by
    * count desc then pair asc (fully deterministic under ties). Words
    * are lowercased whitespace tokens restricted to pure-ASCII letters
    * (the classic pre-tokenization alphabet filter), marked with `_`. */
  def pairMerges(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    val words = docs
      .select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))
    val pairs = words
      .select(col("freq"),
        explode(expr(
          "transform(sequence(1, length(w)), i -> substring(concat(w, '_'), i, 2))"))
          .as("pair"))
      .groupBy("pair").agg(sum(col("freq")).as("cnt"))
    val top = pairs.orderBy(col("cnt").desc, col("pair").asc).limit(k)
    // rank window over the K survivors only — never over the full pair
    // table
    top.withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("cnt").desc, col("pair").asc)).cast("bigint"))
      .select(col("rank"), col("pair"), col("cnt"))
  }

  // ---------------------------------------------------------------------
  // Multi-round training + encode. Token streams are carried as strings
  // with a double-space separator and single-space edges (" l  o  w  _ "):
  // a merge (L, R) is then the literal replacement " L  R " -> " LR ",
  // and because string replace is non-overlapping left-to-right in both
  // Spark (UTF8String.replace) and DuckDB, one replace pass equals the
  // textbook repeat-until-none merge application (a merge output "LR"
  // can never re-form its own left or right side). The single-space
  // edges keep adjacent matches from sharing a separator, so chains like
  // [b b b b] -> [bb bb] merge greedily, exactly like a tokenizer.
  // ---------------------------------------------------------------------

  /** Initial symbolization of a word: characters + end-of-word marker. */
  private def initRepr(w: Column): Column =
    concat(lit(" "), array_join(split(w, ""), "  "), lit("  _ "))

  private def applyMerge(repr: Column, l: String, r: String): Column =
    replace(repr, lit(s" $l  $r "), lit(s" $l$r "))

  /** Corpus word-frequency table (the lower/[a-z]+ pre-tokenization all
    * vocab ops share). This is the ONLY pass over the corpus; every
    * training round below runs on its (bounded) output. */
  private def wordFreq(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("freq"))

  /** BPE training: `rounds` merge rounds over the word-frequency table.
    * Returns (round, left, right, cnt) in merge order.
    *
    * Scale: the corpus is touched once (the word-frequency shuffle);
    * each round then aggregates adjacent pairs over the persisted
    * vocabulary table (state ≤ symbols², KB-scale) and collects exactly
    * ONE row (the argmax merge — plan-time metadata, same bound as the
    * ANN centroid collects), so driver traffic is `rounds` rows total.
    * Merge application is a literal-replace projection, no shuffle.
    *
    * O(rounds), not O(rounds²): each round adds one replace projection
    * to the vocabulary plan, and without truncation round r would replay
    * all r-1 earlier replaces over the persisted base — linear plan
    * growth, quadratic total work, the wrong shape for a real 32k-merge
    * vocab. Every `checkpointInterval` rounds the re-segmented table is
    * materialized (localCheckpoint — the vocabulary is KB-to-MB scale,
    * never the corpus), so the replace chain evaluated per round is
    * bounded by the interval and total work is linear in rounds
    * (VocabSpec pins the bounded plan depth and interval-invariance). */
  def trainMerges(docs: DataFrame, textCol: String, rounds: Int,
      checkpointInterval: Int = 16): Seq[(Int, String, String, Long)] =
    trainMergesWithRepr(docs, textCol, rounds, checkpointInterval)._1

  /** [[trainMerges]] also returning the final re-segmented vocabulary
    * frame (spec hook: its plan witnesses the bounded replace chain). */
  private[graft] def trainMergesWithRepr(docs: DataFrame, textCol: String,
      rounds: Int, checkpointInterval: Int = 16)
      : (Seq[(Int, String, String, Long)], DataFrame) = {
    require(checkpointInterval >= 1, "checkpointInterval must be >= 1")
    val base = wordFreq(docs, textCol)
      .select(initRepr(col("w")).as("repr"), col("freq"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
      val sc = docs.sparkSession.sparkContext
      // ids of the CURRENT checkpoint's RDDs: superseded checkpoints are
      // unpersisted as soon as the next one has materialized (eager), so
      // a 32k-round run holds at most one live vocab snapshot, not
      // rounds/interval of them
      var liveCkpt: scala.collection.Set[Int] = Set.empty
      var cur: DataFrame = base
      var r = 1
      var exhausted = false
      while (r <= rounds && !exhausted) {
        val top = cur
          .select(col("freq"), split(trim(col("repr")), "  ").as("tk"))
          // a fully-collapsed word (one token) has no pairs; without this
          // guard sequence(1, 0) counts DOWN in Spark and element_at
          // walks off the array (DuckDB's generate_series(1, 0) is empty)
          .filter(size(col("tk")) >= 2)
          .select(col("freq"), explode(expr(
            "transform(sequence(1, size(tk) - 1), i -> " +
              "struct(element_at(tk, i) AS lft, element_at(tk, i + 1) AS rgt))"))
            .as("p"))
          .groupBy(col("p.lft").as("lft"), col("p.rgt").as("rgt"))
          .agg(sum(col("freq")).as("cnt"))
          .orderBy(col("cnt").desc, col("lft").asc, col("rgt").asc)
          .limit(1)
          .collect() // 1 row: the round's argmax merge
        if (top.isEmpty) exhausted = true
        else {
          val (l, rt, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
          merges += ((r, l, rt, c))
          cur = cur.withColumn("repr", applyMerge(col("repr"), l, rt))
          // truncate the replace chain: materialize the (small) vocab
          // table so no later round replays more than `interval` merges
          if (r % checkpointInterval == 0) {
            val before = sc.getPersistentRDDs.keySet
            cur = cur.localCheckpoint() // eager: data lives before we drop the old
            val mine = sc.getPersistentRDDs.keySet -- before
            liveCkpt.foreach(id =>
              sc.getPersistentRDDs.get(id).foreach(_.unpersist(false)))
            liveCkpt = mine
          }
          r += 1
        }
      }
      (merges.toSeq, cur)
    } finally { base.unpersist(); () }
  }

  /** Training as a query: (round, left_sym, right_sym, merged, cnt). */
  def trainMergesDf(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    trainMerges(docs, textCol, rounds)
      .map { case (r, l, rt, c) => (r.toLong, l, rt, l + rt, c) }
      .toDF("round", "left_sym", "right_sym", "merged", "cnt")
  }

  /** Tokenize the corpus with a trained merge list: per-document word and
    * token counts under the vocabulary the merges induce.
    *
    * Scale: the merge chain is applied once per DISTINCT word (the
    * vocabulary table), never per corpus occurrence; the per-word token
    * counts then broadcast-join back to the exploded corpus. At 100 TB
    * the expensive side (corpus words) sees one narrow join + one
    * aggregate — the encode itself costs O(vocab), not O(corpus). */
  def encodeTokens(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val docw = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
    val repr = merges.foldLeft(initRepr(col("w"))) {
      case (acc, (l, r)) => applyMerge(acc, l, r)
    }
    val wordTok = docw.select("w").distinct()
      .select(col("w"), size(split(trim(repr), "  ")).cast("bigint").as("n_tok"))
    docw.join(broadcast(wordTok), "w")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_words"), sum(col("n_tok")).as("n_tokens"))
  }

  // --- DuckDB oracle twins (unrolled k-stage CTE chain; MATERIALIZED
  // keeps the linear w0..wK chain from inlining exponentially) ---------

  private val oracleWords =
    """words AS MATERIALIZED (
      |  SELECT w, count(*) AS freq FROM (
      |    SELECT unnest(regexp_split_to_array(lower(text), '\s+')) AS w
      |    FROM documents)
      |  WHERE regexp_matches(w, '^[a-z]+$') GROUP BY w)""".stripMargin

  private val oracleInitRepr =
    "' ' || array_to_string(list_transform(range(1, length(w) + 1), " +
      "i -> substring(w, CAST(i AS INTEGER), 1)), '  ') || '  _ '"

  private def oracleStages(k: Int): String = {
    val head = Seq(oracleWords,
      s"w0 AS MATERIALIZED (SELECT $oracleInitRepr AS repr, freq FROM words)")
    val stages = (1 to k).map { r =>
      s"""p$r AS (
         |  SELECT tk[CAST(i AS INTEGER)] AS lft, tk[CAST(i AS INTEGER) + 1] AS rgt,
         |         sum(freq) AS cnt
         |  FROM (SELECT string_split(trim(repr), '  ') AS tk, freq FROM w${r - 1}) t,
         |       LATERAL (SELECT unnest(generate_series(1, len(tk) - 1)) AS i) g
         |  GROUP BY 1, 2),
         |m$r AS MATERIALIZED (SELECT lft, rgt, cnt FROM p$r ORDER BY cnt DESC, lft, rgt LIMIT 1),
         |w$r AS MATERIALIZED (SELECT replace(repr, ' ' || m.lft || '  ' || m.rgt || ' ',
         |  ' ' || m.lft || m.rgt || ' ') AS repr, freq FROM w${r - 1}, m$r m)""".stripMargin
    }
    (head ++ stages).mkString("WITH ", ",\n", "")
  }

  /** Oracle for [[trainMergesDf]]: replays every round exactly. */
  def trainOracleSql(k: Int): String = {
    val union = (1 to k).map { r =>
      s"SELECT CAST($r AS BIGINT) AS round, lft AS left_sym, rgt AS right_sym, " +
        s"lft || rgt AS merged, CAST(cnt AS BIGINT) AS cnt FROM m$r"
    }.mkString("\nUNION ALL ")
    s"${oracleStages(k)}\nSELECT * FROM (\n$union) ORDER BY round"
  }

  /** Oracle for [[encodeTokens]] run on the merges [[trainMerges]] picks:
    * the training stages feed the same replace chain over the distinct
    * word table, then re-aggregate per document. */
  def encodeOracleSql(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"e$r AS MATERIALIZED (SELECT w, replace(repr, ' ' || m.lft || '  ' || m.rgt || ' ', " +
        s"' ' || m.lft || m.rgt || ' ') AS repr FROM e${r - 1}, m$r m)"
    }.mkString(",\n")
    s"""${oracleStages(k)},
       |docw AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$')),
       |e0 AS (SELECT w, $oracleInitRepr AS repr FROM (SELECT DISTINCT w FROM docw)),
       |$enc,
       |enc AS (SELECT w, len(string_split(trim(repr), '  ')) AS n_tok FROM e$k)
       |SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |       CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |FROM docw d JOIN enc USING (w) GROUP BY d.doc_id ORDER BY d.doc_id""".stripMargin
  }

  /** op259's oracle: op127's encode chain rolled up per SOURCE with the
    * fertility ratio (tokens per word, bp). */
  def fertilityOracleSql(k: Int): String = {
    val enc = (1 to k).map { r =>
      s"e$r AS MATERIALIZED (SELECT w, replace(repr, ' ' || m.lft || '  ' || m.rgt || ' ', " +
        s"' ' || m.lft || m.rgt || ' ') AS repr FROM e${r - 1}, m$r m)"
    }.mkString(",\n")
    s"""${oracleStages(k)},
       |docw AS MATERIALIZED (
       |  SELECT doc_id, w FROM (
       |    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
       |    FROM documents)
       |  WHERE regexp_matches(w, '^[a-z]+$$')),
       |e0 AS (SELECT w, $oracleInitRepr AS repr FROM (SELECT DISTINCT w FROM docw)),
       |$enc,
       |enc AS (SELECT w, len(string_split(trim(repr), '  ')) AS n_tok FROM e$k),
       |perdoc AS (
       |  SELECT d.doc_id, CAST(count(*) AS BIGINT) AS n_words,
       |         CAST(sum(n_tok) AS BIGINT) AS n_tokens
       |  FROM docw d JOIN enc USING (w) GROUP BY d.doc_id)
       |SELECT s.source, CAST(sum(p.n_words) AS BIGINT) AS n_words,
       |  CAST(sum(p.n_tokens) AS BIGINT) AS n_tokens,
       |  CAST((sum(p.n_tokens) * 10000) // sum(p.n_words) AS BIGINT)
       |    AS fertility_bp
       |FROM perdoc p JOIN documents s USING (doc_id)
       |GROUP BY s.source ORDER BY source""".stripMargin
  }
}
