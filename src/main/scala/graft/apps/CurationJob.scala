package graft.apps

/** Runnable curation pipeline — the op113 composition
  * (quality gate → exact dedup → deterministic shuffle → shard
  * assignment → sequence packing) as a spark-submit entry point writing
  * a training manifest, so the library runs standalone over any
  * documents table, not only under the test harness.
  *
  *   CurationJob <inputDir> <outputDir>
  *
  * `inputDir` must contain `documents.parquet` (doc_id, text, ...);
  * the manifest lands at `outputDir/manifest` partitioned by shard —
  * each row is one (doc, pack) slice: (doc_id, pos, shard, n_tok,
  * tok_off, pack_id, start_in_doc, end_in_doc), the exact shape the
  * op113 oracle checks. Writing partitioned by shard means a trainer
  * reading shard k scans one directory — the manifest layout IS the
  * data-loading layout.
  */
object CurationJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: CurationJob <inputDir> <outputDir>")
    val Array(in, out) = args.take(2)
    val spark = StediApps.session("graft-curation")
    val manifest = graft.queries.TrainQueries.op113CurationPipeline(spark, in)
    manifest.write.mode("overwrite").partitionBy("shard")
      .parquet(s"$out/manifest")
    val n = spark.read.parquet(s"$out/manifest").count()
    println(s"[curation] wrote $n pack slices to $out/manifest")
    spark.stop()
  }
}
