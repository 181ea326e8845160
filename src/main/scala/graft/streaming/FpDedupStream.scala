package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Online near-dup maintenance for any SINGLE-LONG banded fingerprint —
  * the [[ImageDedupStream]] protocol generalized over the banding
  * spec, so the audio (op283: 6×5-bit bands, Hamming ≤ 5) and video
  * (op284: 4×4-bit bands, Hamming ≤ 2) batch gates get streaming twins
  * (op294/op295) from ONE engine instead of two more copies. Each
  * arriving payload is decoded by the caller-supplied fingerprint
  * function INSIDE the micro-batch, band-joined against the persisted
  * accepted-fingerprint store AND its own batch, flagged at
  * ≤ maxHamming, then appended to the store. Every qualifying
  * unordered pair flags exactly once — when its later member arrives
  * (cross-batch) or within the shared batch — so the flag union over
  * any batch split equals the batch op's pair set and the streaming op
  * runs under the batch op's UNCHANGED oracle.
  *
  * 100 TB shape: per-arrival cost is one decode + one nBands-way
  * equi-join against a store bucketed by (band, value) (the op132
  * band-store shape in Hamming space); thresholds below the band count
  * keep banding pigeonhole-lossless, so the online gate inherits the
  * batch gate's exactness argument. The in-run store append is one
  * tiny parquet file per batch, compactable at any cadence.
  */
object FpDedupStream {

  private def withBands(fps: DataFrame, nBands: Int,
      bandBits: Int): DataFrame =
    fps.select(col("doc_id"), col("fp"),
        explode(sequence(lit(0), lit(nBands - 1))).as("b"))
      .withColumn("bv", expr(
        s"shiftright(fp, CAST($bandBits*b AS INT)) & ${(1 << bandBits) - 1}"))

  /** Banded candidates of `probe` against `ref` (doc ids must differ),
    * verified at Hamming ≤ maxHamming; emits normalized
    * (doc_a < doc_b, hamming). */
  private def flaggedPairs(probe: DataFrame, ref: DataFrame, nBands: Int,
      bandBits: Int, maxHamming: Int): DataFrame = {
    val a = withBands(probe, nBands, bandBits)
      .select(col("doc_id").as("pa"), col("fp").as("fa"),
        col("b"), col("bv"))
    val r = withBands(ref, nBands, bandBits)
      .select(col("doc_id").as("pb"), col("fp").as("fb"),
        col("b"), col("bv"))
    a.join(r, Seq("b", "bv")).where(col("pa") =!= col("pb"))
      .select(least(col("pa"), col("pb")).as("doc_a"),
        greatest(col("pa"), col("pb")).as("doc_b"),
        when(col("pa") < col("pb"), col("fa")).otherwise(col("fb"))
          .as("f1"),
        when(col("pa") < col("pb"), col("fb")).otherwise(col("fa"))
          .as("f2"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(f1 ^ f2) AS BIGINT)"))
      .where(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Drain `records` through a 4-batch MemoryStream (split by doc id
    * mod 4); per batch: fingerprint arrivals (the caller's decode maps
    * a (doc_id, payload) frame to (doc_id, fp)), flag against the
    * persisted store and within the batch, append fingerprints to the
    * store. Returns the union of flags. */
  def maintainedFlags(spark: SparkSession,
      records: Seq[(Long, Array[Byte])],
      fingerprint: DataFrame => DataFrame,
      nBands: Int, bandBits: Int, maxHamming: Int,
      stateDir: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Array[Byte])]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    // flags are query OUTPUT (this function's return value), not
    // maintained state — only the fingerprint store must persist across
    // batches. Emitting flags through a per-batch parquet write + end
    // read paid two extra commit rounds per micro-batch for rows that
    // never outlive the call; the memory-sink-shaped buffer below is
    // the streaming-correct replacement (r16, guide §1.2 per-task work
    // after the shape is right). Store writes/reads are UNCHANGED.
    val flagBatches = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = in.toDF().toDF("doc_id", "payload")
        .writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          // a MemoryStream batch arrives as ONE partition, which ran
          // the caller's codec decode serially; spread the payloads
          // before the heavy per-row work (r16 — the codecDocIds rule
          // at the streaming edge; per-row decode is
          // partitioning-invariant)
          val fps = fingerprint(batch
              .repartition(spark.sparkContext.defaultParallelism))
            .localCheckpoint()
          val storePath = s"$stateDir/fps"
          val prior =
            if (new java.io.File(storePath).exists())
              spark.read.parquet(storePath)
            else spark.emptyDataFrame
              .select(lit(0L).as("doc_id"), lit(0L).as("fp")).limit(0)
          val sameBatch =
            flaggedPairs(fps, fps, nBands, bandBits, maxHamming)
          val crossBatch =
            flaggedPairs(fps, prior, nBands, bandBits, maxHamming)
          flagBatches += sameBatch.unionByName(crossBatch).localCheckpoint()
          fps.coalesce(1).write.mode("append").parquet(storePath)
          (): Unit
        }
        .start()
      (0 until 4).foreach { k =>
        in.addData(records.filter(_._1 % 4 == k))
        q.processAllAvailable()
      }
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    val flags = flagBatches.reduce(_ unionByName _).localCheckpoint()
    new scala.reflect.io.Directory(new java.io.File(stateDir))
      .deleteRecursively()
    flags
  }
}
