package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Incremental exact dedup against a PERSISTED fingerprint store — the
  * cross-run half of the dedup story (the batch ops dedup within one
  * corpus snapshot; a production curation pipeline must also drop
  * documents already accepted by EVERY PREVIOUS run).
  *
  * Same ingest contract as the ANN index appends
  * ([[graft.functions.Similarity.ivfIndexAppend]] family): the store is
  * parquet of content fingerprints, each completed run appends the
  * fingerprints it emitted, and a restarted stream sees them as static
  * state — so the dedup guarantee spans process lifetimes without any
  * streaming-state checkpoint carrying it.
  *
  * Scale shape: the store is one BIGINT column (8 bytes per accepted
  * document — ~1 TB of fingerprints per 10¹¹ docs), the stream side
  * joins it with a left_anti on the fingerprint (hash join, store side
  * never wider than 8 bytes/row), and in-stream first-occurrence dedup
  * is the standard dropDuplicates state. At 100 TB the store is bucketed
  * by fp so the anti-join co-locates without a shuffle of the store.
  */
object IncrementalDedup {

  /** Content fingerprint: 60-bit md5-derived BIGINT of the salted text
    * (same cross-engine base hash as the minhash/mixture family). */
  def fingerprint(text: Column): Column =
    TextOps.md5Hash60(concat(lit("fp:"), text))

  /** Batch helper: the (fp) frame of a corpus — builds or extends the
    * store: `fingerprints(df, "text").write.mode("append").parquet(dir)`. */
  def fingerprints(df: DataFrame, textCol: String): DataFrame =
    df.select(fingerprint(col(textCol)).as("fp")).distinct()

  /** Streaming dedup of `stream` against the persisted store at
    * `storeDir` plus in-stream first-occurrence dedup. Anti-join FIRST:
    * documents already in the store never enter the dropDuplicates
    * state, so in-run state is bounded by NEW content only. Plain
    * append mode; for unbounded runs swap the exact dropDuplicates for
    * dropDuplicatesWithinWatermark (bounded state, the documented
    * trade). Emits the input rows plus their `fp`.
    *
    * Bootstrap: an absent (or still-empty) `storeDir` means "nothing
    * accepted yet" — the very first run dedups against an empty store
    * instead of failing at stream build. Visibility contract: the
    * static side's file listing is fixed when the stream is BUILT, so
    * fingerprints appended by a concurrent process mid-run are not seen
    * until the stream restarts — the store reflects completed runs, by
    * design (each run appends its own output once, at the end). */
  /** The store as a frame, bootstrapping an absent dir to empty.
    * Existence goes through the Hadoop filesystem of the PATH (not
    * java.io.File, which would silently report any hdfs://-or-s3a://
    * store as absent and re-admit every accepted doc); the explicit
    * schema also covers a dir that exists but holds no parquet yet
    * (inference would throw). */
  private def storeFrame(spark: org.apache.spark.sql.SparkSession,
      storeDir: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(storeDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path))
      spark.read.schema("fp BIGINT").parquet(storeDir).select(col("fp"))
    else spark.range(0).select(col("id").as("fp"))
  }

  def dedupAgainstStore(stream: DataFrame, storeDir: String,
      textCol: String): DataFrame = {
    val spark = stream.sparkSession
    val store = storeFrame(spark, storeDir)
    stream.withColumn("fp", fingerprint(col(textCol)))
      .join(store, Seq("fp"), "left_anti")
      .dropDuplicates("fp")
  }

  /** [[dedupAgainstStore]] with a Bloom fast path — the steady-state
    * scale shape: in a mature pipeline MOST arrivals are genuinely new,
    * yet every one of them pays the store anti-join. A Bloom filter
    * over the store (built once at stream build — same
    * listing-at-build visibility contract as the store read) splits
    * each micro-batch per-row, zero-shuffle: might-contain = false is
    * PROOF of absence, so those rows bypass the anti-join entirely and
    * only suspects (true hits + the fpp fraction) join the store.
    * Output is row-identical to the plain spelling (spec'd): a stored
    * fingerprint always tests positive → reaches the anti-join → drops;
    * a false positive reaches the anti-join → survives. At 10¹¹
    * accepted docs the filter is ~125 GB at 10 bits/key — size
    * `numBits` to the store, or shard the store (+ one filter per
    * shard) past single-filter reach. */
  def dedupAgainstStoreBloom(stream: DataFrame, storeDir: String,
      textCol: String, expectedItems: Long = 1000000L,
      numBits: Long = 8L * 1024 * 1024): DataFrame = {
    val spark = stream.sparkSession
    val store = storeFrame(spark, storeDir)
    val bf = graft.functions.Bloom.buildBytes(store, col("fp"),
      expectedItems, numBits)
    val fp = stream.withColumn("fp", fingerprint(col(textCol)))
    val candidates =
      if (bf == null) fp // empty store: everything is new
      else {
        val hit = graft.functions.Bloom.mightContain(bf, col("fp"))
        fp.filter(!hit).unionByName(
          fp.filter(hit).join(store, Seq("fp"), "left_anti"))
      }
    candidates.dropDuplicates("fp")
  }
}
