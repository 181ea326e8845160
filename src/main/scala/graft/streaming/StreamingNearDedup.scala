package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextOps

/** Online NEAR-duplicate detection against a persisted reference corpus
  * — the streaming half of the MinHash+LSH dedup family. The batch ops
  * ([[graft.functions.Dedup.survivorsMinhash]], op98) dedup within one
  * corpus snapshot, and [[IncrementalDedup]] (op104) carries EXACT
  * fingerprints across runs; this leg closes the remaining cell of the
  * matrix: each ARRIVING document is checked for ≥ threshold Jaccard
  * similarity against everything previously accepted, online.
  *
  * Same ingest contract as the ANN serving stores (op96/op97) and the
  * fingerprint store (op104): the reference corpus persists as parquet
  * — a `bands` table (doc, band_idx, band_hash: the LSH bucket index)
  * and a `docs` table (doc, hashed distinct-shingle array, count) — and
  * a restarted stream sees it as static state.
  *
  * Per-arrival flow, all NARROW until the candidate join:
  *   1. trigram shingles → one md5 per shingle → k Kirsch-Mitzenmacher
  *      minhashes via `array_min` over higher-order transforms — a pure
  *      per-row projection (the batch spelling's explode+groupBy would
  *      be a stateful aggregate in a stream; this computes the identical
  *      signature with NO state, which is what makes the op pipeline-able
  *      at any arrival rate);
  *   2. bands explode (k/r rows per doc) → stream-STATIC equi-join with
  *      the band store on (band_idx, band_hash) → candidate pairs only
  *      where an LSH bucket collides (sub-quadratic by construction,
  *      the op63 argument);
  *   3. exact confirm restricted to candidates: join the store's
  *      shingle-array table, overlap = `array_intersect`, Jaccard in
  *      exact integer basis points — false band collisions cost one
  *      array intersection, never an output row.
  *
  * Scale: the band store is the shuffle-free side — at 100 TB it is
  * bucketed by (band_idx, band_hash) so the candidate join co-locates
  * with zero store movement, and the docs table is bucketed by doc id
  * for the confirm join (the op86/op97 bucket-store shape). Arrival
  * micro-batches are narrow projections + two hash joins; in-run state
  * is ONLY the candidate-pair dropDuplicates (bounded by emitted pairs;
  * swap for dropDuplicatesWithinWatermark on unbounded runs — the same
  * documented trade as [[IncrementalDedup]]). Signature cost per
  * arrival is one md5 per shingle (constant in k, the KM construction).
  * All hashes are md5-derived ⇒ the full chain replays exactly in SQL
  * (op132's oracle = op98's replay restricted to the streamed slice).
  */
object StreamingNearDedup {

  /** Shared per-row shape for BOTH the store build and the stream side
    * (so the two sides' bands agree by construction, not by parallel
    * maintenance): input rows gain
    *   - `__sh`: distinct xxhash64'd shingles (the confirm-join key set
    *     — 8-byte longs through every join, the shingleIndexHashed
    *     trade, string-oracle-certified at test scale),
    *   - `__bands`: array of (band_idx, band_hash) structs, band_hash =
    *     md5Hash60 of the comma-joined r-signature slice (the exact
    *     [[graft.functions.Dedup.lshBands]] arithmetic).
    * Docs with no shingles (< 3 tokens) are dropped — they have no
    * signature in the batch path either.
    *
    * Both per-row loops are FUSED codegen-family expressions
    * ([[graft.expressions.TrigramHash64]] for the shingle set,
    * [[graft.expressions.TrigramKmSigs]] for the k KM signatures —
    * sig_i = min over shingles of (h1·(2i+1) + h2) mod 2³¹ on the
    * 30-bit halves of md5-60, the exact
    * [[graft.functions.Dedup.minhashSignatureFast]] arithmetic; min is
    * duplicate-insensitive, so the batch path's distinct is
    * unnecessary). The builtin higher-order spelling evaluates its
    * lambda interpreted per ELEMENT — per shingle that was a trigram
    * string, an md5 HEX string, a substring and a base-16 conv, which
    * benchmarked ~10× the whole pipeline's cost at sf0.1; the fused
    * loops hash raw bytes once per shingle (DedupSpec pins
    * bit-equality with the builtin spelling). */
  private[graft] def shinglesAndBands(df: DataFrame, idCol: String,
      textCol: String, k: Int, r: Int): DataFrame = {
    require(k % r == 0, s"k=$k must be divisible by band width r=$r")
    import org.apache.spark.sql.graftbridge.ColumnBridge
    val withTri = df
      .withColumn("__toks", TextOps.tokens(col(textCol)))
      .filter(size(col("__toks")) >= 3) // < 3 tokens = no shingles
      .withColumn("__sh", array_distinct(ColumnBridge.column(
        graft.expressions.TrigramHash64(ColumnBridge.expression(col("__toks"))))))
      .withColumn("__sigs", ColumnBridge.column(graft.expressions.TrigramKmSigs(
        ColumnBridge.expression(col("__toks")), k)))
    val sigd = withTri.select(
      (df.columns.map(col) :+ col("__sh")) ++ (0 until k).map(i =>
        element_at(col("__sigs"), i + 1).as(f"sig_$i%02d")): _*)
    val bands = (0 until k / r).map { b =>
      val cols = (b * r until (b + 1) * r)
        .map(i => col(f"sig_$i%02d").cast("string"))
      struct(lit(b).as("band_idx"),
        TextOps.md5Hash60(concat_ws(",", cols: _*)).as("band_hash"))
    }
    sigd.withColumn("__bands", array(bands: _*))
      .drop((0 until k).map(i => f"sig_$i%02d"): _*)
  }

  /** Build (or rebuild) the reference store at `dir`: `bands` —
    * (dup_of, band_idx, band_hash) — and `docs` — (dup_of, sh, n_sh).
    * Each completed curation run appends its accepted docs here (the
    * op104 store contract); at 100 TB both tables are written bucketed
    * (bands by band_hash, docs by dup_of). */
  def storeWrite(accepted: DataFrame, idCol: String, textCol: String,
      dir: String, k: Int = 16, r: Int = 4): Unit = {
    val base = shinglesAndBands(
        accepted.select(col(idCol), col(textCol)), idCol, textCol, k, r)
      .localCheckpoint() // consumed by both table writes
    base.select(col(idCol).as("dup_of"), explode(col("__bands")).as("b"))
      .select(col("dup_of"), col("b.band_idx").as("band_idx"),
        col("b.band_hash").as("band_hash"))
      .write.mode("overwrite").parquet(s"$dir/bands")
    base.select(col(idCol).as("dup_of"), col("__sh").as("sh"),
        size(col("__sh")).cast("bigint").as("n_sh"))
      .write.mode("overwrite").parquet(s"$dir/docs")
  }

  /** A store table as a frame, bootstrapping an ABSENT dir to empty —
    * the first-run contract the whole store family shares
    * ([[IncrementalDedup]]'s finding): before anything was ever
    * accepted there is nothing to be a near-dup OF, so the stream must
    * build and emit nothing, not crash. Existence via the Hadoop
    * filesystem of the path (a java.io check would misread any
    * hdfs://-or-s3a:// store as absent); explicit schema covers an
    * existing-but-empty dir. */
  private def storeTable(spark: org.apache.spark.sql.SparkSession,
      dir: String, schema: String): DataFrame = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(path)) spark.read.schema(schema).parquet(dir)
    else spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType.fromDDL(schema))
  }

  /** Streaming near-dup matches of `stream` against the store: one row
    * per (arriving doc, store doc) pair confirmed at ≥ `minBp` trigram
    * Jaccard — (doc_id, dup_of, jaccard_bp). A consumer drops arrivals
    * that have any match (dedup) or routes them to review. Works
    * identically on a batch frame (stream-static joins degrade to plain
    * joins), which is how the spec cross-checks it against
    * [[graft.functions.Dedup]]'s batch pair computation. An absent (or
    * still-empty) store means "nothing accepted yet" — no matches. */
  def matchesAgainstStore(stream: DataFrame, storeDir: String,
      idCol: String, textCol: String, minBp: Long = 8000L,
      k: Int = 16, r: Int = 4): DataFrame = {
    val spark = stream.sparkSession
    val bands = storeTable(spark, s"$storeDir/bands",
      "dup_of BIGINT, band_idx INT, band_hash BIGINT")
    val docs = storeTable(spark, s"$storeDir/docs",
      "dup_of BIGINT, sh ARRAY<BIGINT>, n_sh BIGINT")
    val arr = shinglesAndBands(
        stream.select(col(idCol), col(textCol)), idCol, textCol, k, r)
      .select(col(idCol).as("doc_id"), col("__sh"),
        explode(col("__bands")).as("b"))
      .select(col("doc_id"), col("__sh"),
        col("b.band_idx").as("band_idx"), col("b.band_hash").as("band_hash"))
    val cand = arr.join(bands, Seq("band_idx", "band_hash"))
      .filter(col("doc_id") =!= col("dup_of"))
      // a pair colliding in several bands is ONE candidate: dedup BEFORE
      // the confirm join so each pair pays one array intersection
      .dropDuplicates("doc_id", "dup_of")
    cand.join(docs, "dup_of")
      .withColumn("overlap",
        size(array_intersect(col("__sh"), col("sh"))).cast("bigint"))
      .withColumn("n_a", size(col("__sh")).cast("bigint"))
      .withColumn("jaccard_bp",
        expr("overlap * 10000 div (n_a + n_sh - overlap)"))
      .filter(col("jaccard_bp") >= minBp)
      .select(col("doc_id"), col("dup_of"), col("jaccard_bp"))
  }
}
