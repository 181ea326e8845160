package graft.apps

import org.apache.spark.sql.functions.col

/** Runnable near-dedup pipeline — op98's production composition
  * (MinHash signatures → banded LSH candidates → candidate-restricted
  * exact Jaccard verification → greater-id drop) as a spark-submit
  * entry point, so the web-scale dedup run the library implements is
  * launchable standalone:
  *
  *   DedupJob <inputDir> <outputDir> [jaccardBp]
  *
  * `inputDir` must contain `documents.parquet` (doc_id, text, ...);
  * survivors (every column of the input, duplicates dropped toward the
  * lowest doc_id at ≥ jaccardBp/10000 similarity, default 8000) land at
  * `outputDir/survivors`. Candidate volume follows band collisions —
  * nothing ever joins on raw shingles (the op98 scale shape).
  */
object DedupJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: DedupJob <inputDir> <outputDir> [jaccardBp]")
    val Array(in, out) = args.take(2)
    val minBp = if (args.length > 2) args(2).toLong else 8000L
    val spark = StediApps.session("graft-dedup")
    val docs = spark.read.parquet(s"$in/documents.parquet")
    val survivors = graft.functions.Dedup.survivorsMinhash(
      docs, "doc_id", "text", minBp)
    survivors.write.mode("overwrite").parquet(s"$out/survivors")
    // both counts are parquet metadata-only scans (no column reads)
    val kept = spark.read.parquet(s"$out/survivors").count()
    val total = docs.count()
    println(s"[dedup] kept $kept of $total docs " +
      s"(>=${minBp}bp near-dups dropped) at $out/survivors")
    spark.stop()
  }
}
