package graft.apps

/** The production GRAPH-FEATURES pass: one batch job that runs the
  * library's co-purchase-graph legs over a dataset drop and writes a
  * partitioned feature store — the offline feature-extraction step a
  * recommender / fraud / GNN pipeline schedules after ingest:
  *
  *   - `components/`  connected components (op208) — the partition
  *                    every per-component rollup keys on;
  *   - `features/`    per-vertex structural features joined into ONE
  *                    table: degree + exact-2-hop reach (op224) and
  *                    triangle count + local clustering coefficient
  *                    (op225) — the GraphSAGE-style node feature row;
  *   - `curve/`       the degree-assortativity knn(k) curve (op215) —
  *                    the graph-level mixing diagnostic;
  *   - `modularity/`  per-brand Newman modularity terms (op221) —
  *                    does co-purchase structure align with catalog
  *                    structure?
  *
  * Every emitted number is an exact integer (the library's Det
  * contract): two runs over the same drop produce byte-identical
  * feature stores — auditable by diff. All legs share the op194
  * support-pruned graph construction, priced once per leg (the legs
  * are independent jobs by design — a failed leg reruns alone).
  *
  *   GraphJob <dropDir> <outDir>
  *
  * `dropDir` is a TESTDATA-shaped directory (lineitem/orders/part
  * parquet). Artifacts land under `outDir/<leg>/`.
  */
object GraphJob {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: GraphJob <dropDir> <outDir>")
    val in = args(0); val out = args(1)
    val spark = StediApps.session("graft-graph")
    import org.apache.spark.sql.functions.col

    graft.queries.SeqGraphQueries.op208ConnectedComponents(spark, in)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/components")

    val twoHop = graft.queries.SeqGraphQueries
      .op224TwoHopFeatures(spark, in)
    val lcc = graft.queries.SeqGraphQueries
      .op225ClusteringCoeff(spark, in)
      .select(col("p_partkey"), col("tri"), col("lcc_bp"))
    twoHop.join(lcc, "p_partkey")
      .orderBy("p_partkey")
      .coalesce(1).write.mode("overwrite").parquet(s"$out/features")

    graft.queries.SeqGraphQueries.op215Assortativity(spark, in)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/curve")

    graft.queries.SeqGraphQueries.op221Modularity(spark, in)
      .coalesce(1).write.mode("overwrite").parquet(s"$out/modularity")

    spark.stop()
  }
}
