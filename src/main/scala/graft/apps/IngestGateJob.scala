package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The production INGEST GATE: every arriving document routed through
  * the library's three online admission legs in ONE multi-sink
  * streaming job — the deployable composition of op104 + op132 + op134:
  *
  *   - `fresh/`          exact-content dedup vs the persisted
  *                       fingerprint store (bloom fast path): documents
  *                       whose content was never accepted before;
  *   - `near_dup_pairs/` ≥ `minBp` MinHash+LSH matches vs the
  *                       accepted-corpus band store: (doc_id, dup_of,
  *                       jaccard_bp) candidates for drop or review;
  *   - `contaminated/`   arrivals sharing ANY held-out-benchmark
  *                       shingle: route to the exact batch gate
  *                       (op82/op102's ≥k scoring) or quarantine.
  *
  * Downstream batch curation joins the three outputs to apply the
  * final accept — the flag legs are ROUTING streams, because "has no
  * match" is a negation no append-mode stream can decide online.
  * After the drain, the run's fresh fingerprints APPEND to the store
  * (the op104 lifecycle: each run appends what it emitted, so the
  * dedup guarantee spans process lifetimes through the store, not a
  * checkpoint). All three stores bootstrap-to-empty — the FIRST run
  * admits everything fresh and flags nothing, no pre-seeding step.
  *
  *   IngestGateJob <arrivalsDir> <storeRoot> <outDir>
  *
  * `arrivalsDir`: parquet of (doc_id BIGINT, text STRING, ...);
  * `storeRoot` holds `fps` (op104's fingerprint column), `neardup`
  * (op132's bands+docs tables) and `bench` (op134's shingle store).
  * Each sink is independently checkpointed under `outDir/_checkpoints`
  * — a restarted job resumes every leg from committed offsets.
  */
object IngestGateJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3,
      "usage: IngestGateJob <arrivalsDir> <storeRoot> <outDir> [minBp]")
    val Array(in, stores, out) = args.take(3)
    val minBp = if (args.length > 3) args(3).toLong else 8000L
    val spark = StediApps.session("graft-ingest-gate")
    import graft.streaming.{IncrementalDedup, StreamingDecontaminate,
      StreamingNearDedup}
    val schema = spark.read.parquet(in).schema
    // one file-source stream per leg (each sink owns its offsets, so a
    // leg can be re-run or added without disturbing the others); all
    // three START before any awaits — genuinely concurrent sinks, and
    // every one is awaited (the reference's dead-code await bug, OP-05,
    // is exactly the trap this avoids)
    def arrivals = spark.readStream.schema(schema).parquet(in)
    def sink(df: DataFrame, leg: String) =
      df.writeStream.outputMode("append")
        .option("checkpointLocation", s"$out/_checkpoints/$leg")
        .format("parquet").option("path", s"$out/$leg")
        .trigger(Trigger.AvailableNow()).start()
    val fresh =
      IncrementalDedup.dedupAgainstStoreBloom(arrivals, s"$stores/fps", "text")
    val freshSchema = fresh.schema
    Seq(
      sink(fresh, "fresh"),
      sink(StreamingNearDedup.matchesAgainstStore(
        arrivals, s"$stores/neardup", "doc_id", "text", minBp),
        "near_dup_pairs"),
      sink(StreamingDecontaminate.flagAgainstStoreBloom(
        arrivals, s"$stores/bench", "doc_id", "text"), "contaminated")
    ).foreach(_.awaitTermination())
    // op104 lifecycle: this run's accepted fingerprints join the store
    // (explicit schema: a zero-row drain leaves no parquet to infer from)
    val freshOut = spark.read.schema(freshSchema).parquet(s"$out/fresh")
    freshOut.select(col("fp")).distinct()
      .write.mode("append").parquet(s"$stores/fps")
    val (nFresh, nNear, nCont) = (freshOut.count(),
      spark.read.schema("doc_id BIGINT, dup_of BIGINT, jaccard_bp BIGINT")
        .parquet(s"$out/near_dup_pairs").count(),
      spark.read.schema("doc_id BIGINT")
        .parquet(s"$out/contaminated").count())
    println(s"[ingest-gate] $nFresh fresh, $nNear near-dup pairs, " +
      s"$nCont contaminated at $out (fingerprints appended to $stores/fps)")
    spark.stop()
  }
}
