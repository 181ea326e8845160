package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TopKAgg}

/** Online ANN serving — the streaming half of the similarity story: a
  * stream of query vectors probes a PREBUILT, persisted IVF index
  * ([[graft.functions.Similarity.ivfIndexWrite]]) via a stream-static
  * equi-join on the cell id.
  *
  * Streaming constraints shape the plan (no window functions, at most
  * one aggregation):
  *   - per-query probe-cell selection can't be a window, so the tiny
  *     static centroid table (nCells rows) is collected ONCE at stream
  *     construction and inlined as literals — the nProbe best cells
  *     become a pure per-row projection (sort an nCells-element array of
  *     (−cos, cent_id) structs, slice nProbe), exactly the "broadcast
  *     the index metadata" shape an online ANN server uses;
  *   - candidate generation is a stream-static INNER join on cent_id
  *     against the cells parquet (partition-pruned storage, ScaleSpec);
  *   - the final per-query top-k is the bounded [[TopKAgg]] aggregate
  *     (map-side k-trim — the one streaming aggregation), not a window.
  *
  * Scoring is the same quantized-integer cosine as the batch probe, so
  * for queries arriving within one trigger the emitted top-k rows equal
  * [[graft.functions.Similarity.ivfProbe]] exactly (spec'd); across
  * triggers the aggregation keeps folding new candidates in update mode.
  */
object StreamingAnn {

  /** Probe the persisted IVF index at `dir` with a STREAMING frame of
    * (vec_id, embedding) query vectors; emits (q_id, top) where `top` is
    * the array<struct<score,id>> of the current k best — explode to rows
    * with [[explodeTopK]]. Run in update or complete output mode. */
  def ivfProbeStream(queryStream: DataFrame, dir: String, k: Int,
      nProbe: Int = 4): DataFrame = {
    val spark = queryStream.sparkSession
    // static index metadata, read once per stream build: nCells rows
    val cents = spark.read.parquet(s"$dir/centroids")
      .select(col("cent_id"), col("cent_vec"), col("cent_n2"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getLong(2)))

    val qVec = Similarity.quantize(col("embedding"))
    val q0 = queryStream.select(col("vec_id").as("q_id"), qVec.as("q_vec"))
      .withColumn("q_n2", Similarity.intDot(col("q_vec"), col("q_vec")))
    // per-row nProbe cell choice: struct(−cos, cent_id) sorts ascending
    // to (cos desc, cent_id asc) — the batch probe's exact tiebreak
    val cellRank = array(cents.toIndexedSeq.map { case (id, vec, n2) =>
      struct(
        (-Similarity.cosBpFrom(
          Similarity.intDot(col("q_vec"), typedlit(vec.toSeq)),
          col("q_n2"), lit(n2))).as("neg_cos"),
        lit(id).as("cent_id"))
    }: _*)
    val probes = transform(slice(array_sort(cellRank), 1, nProbe),
      s => s.getField("cent_id"))
    val q = q0.withColumn("cent_id", explode(probes))

    // cent_id is a partition directory on disk; restore its bigint type
    val cells = spark.read.parquet(s"$dir/cells")
      .withColumn("cent_id", col("cent_id").cast("bigint"))
    q.join(cells, "cent_id")
      .filter(col("q_id") =!= col("n_id"))
      .select(col("q_id"), col("n_id"),
        Similarity.cosBpFrom(
          Similarity.intDot(col("q_vec"), col("n_id_vec")),
          col("q_n2"), col("n_id_n2")).as("cos_bp"))
      .groupBy(col("q_id"))
      .agg(TopKAgg.topK(k)(col("cos_bp"), col("n_id")).as("top"))
  }

  /** Explode a (q_id, top) frame from [[ivfProbeStream]] into the batch
    * probe's row shape: (q_id, n_id, cos_bp, rank). */
  def explodeTopK(df: DataFrame): DataFrame =
    df.select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("n_id"),
        col("t.score").as("cos_bp"),
        (col("pos") + 1).cast("bigint").as("rank"))
}
