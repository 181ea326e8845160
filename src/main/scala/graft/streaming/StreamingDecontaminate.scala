package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Online benchmark-decontamination gate — the streaming leg of the
  * op82/op102 family. The batch ops score each document's n-gram
  * overlap against a held-out benchmark suite AFTER the corpus lands;
  * a production ingest additionally wants the pre-admission flag:
  * does this ARRIVING document share any benchmark n-gram at all?
  * Arrivals that flag route to the exact batch gate (op82's ≥k-shingle
  * scoring) or quarantine; the clean majority admits immediately.
  *
  * The ANY-overlap flag is what a stream can decide exactly and
  * statelessly per arrival (an overlap COUNT threshold is a per-doc
  * aggregate — a stateful shape the batch ops own): explode the
  * arrival's trigrams (narrow), hash to the shared md5-60 key
  * (codegen'd on the exploded column — no per-element lambda), LEFT
  * SEMI stream-static join against the persisted benchmark shingle
  * store, dropDuplicates on the doc id. In-run state is one key per
  * FLAGGED doc, nothing per shingle.
  *
  * Scale: the store is one BIGINT column (8 bytes per distinct
  * benchmark shingle), bucketed by h at 100 TB so the semi-join
  * co-locates without moving the store (the op104 store contract); the
  * bloom fast path ([[flagAgainstStoreBloom]]) keeps the mostly-clean
  * traffic of a real ingest from paying the join at all —
  * might-contain = false PROVES no overlap, so those shingles drop
  * per-row with zero shuffle and only suspects (true hits + the fpp
  * fraction) confirm exactly. Output row-identical to the plain
  * spelling (spec'd). md5-60 keys keep the whole chain replayable in
  * SQL — op134's oracle joins the same hashes.
  */
object StreamingDecontaminate {

  private def shingleHashes(df: DataFrame, idCol: String,
      textCol: String): DataFrame = {
    // fused trigram→md5-60 loop (TrigramMd5s): the builtin spelling
    // builds each trigram string in an interpreted lambda and md5s it
    // through hex/substring/conv — the op132 lesson; the rows explode
    // as bare BIGINTs (bit-equality with the builtin spelling spec'd)
    import org.apache.spark.sql.graftbridge.ColumnBridge
    df.select(col(idCol),
      explode(ColumnBridge.column(graft.expressions.TrigramMd5s(
        ColumnBridge.expression(TextOps.tokens(col(textCol)))))).as("h"))
  }

  /** Build (or rebuild) the benchmark shingle store at `dir`: the
    * DISTINCT md5-60 trigram hashes of the held-out suite. */
  def storeWrite(bench: DataFrame, idCol: String, textCol: String,
      dir: String): Unit =
    shingleHashes(bench, idCol, textCol).select(col("h")).distinct()
      .write.mode("overwrite").parquet(s"$dir/shingles")

  /** The store as a frame, bootstrapping an absent dir to empty — no
    * benchmark registered yet means nothing can flag, not a crash at
    * stream build (the family's shared first-run contract). Hadoop-fs
    * existence check + explicit schema, as in
    * [[IncrementalDedup]]/[[StreamingNearDedup]]. */
  private def storeFrame(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(s"$storeDir/shingles")
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema("h BIGINT").parquet(s"$storeDir/shingles")
    else spark.range(0).select(col("id").as("h"))
  }

  /** Flag every arriving doc sharing ANY shingle with the store:
    * (doc_id) per flagged arrival, exactly once. Works identically on
    * a batch frame (the spec's cross-check). */
  def flagAgainstStore(stream: DataFrame, storeDir: String,
      idCol: String, textCol: String): DataFrame = {
    val store = storeFrame(stream.sparkSession, storeDir)
    shingleHashes(stream, idCol, textCol)
      .join(store, Seq("h"), "left_semi")
      .select(col(idCol))
      .dropDuplicates(idCol)
  }

  /** [[flagAgainstStore]] with the bloom fast path: shingles the filter
    * proves absent drop per-row (no join); suspects confirm against the
    * store so false positives never flag a clean doc. Row-identical to
    * the plain spelling. */
  def flagAgainstStoreBloom(stream: DataFrame, storeDir: String,
      idCol: String, textCol: String, expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val store = storeFrame(stream.sparkSession, storeDir)
    val bf = graft.functions.Bloom.buildBytes(store, col("h"),
      expectedItems, numBits)
    val hashed = shingleHashes(stream, idCol, textCol)
    val suspects =
      if (bf == null) hashed.limit(0) // empty store: nothing can flag
      else hashed.filter(graft.functions.Bloom.mightContain(bf, col("h")))
    suspects
      .join(store, Seq("h"), "left_semi")
      .select(col(idCol))
      .dropDuplicates(idCol)
  }
}
