package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
}
