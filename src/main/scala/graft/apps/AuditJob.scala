package graft.apps

import org.apache.spark.sql.functions._

/** The production DATA AUDIT: one batch job that runs the library's
  * monitoring legs over a dataset drop and writes a partitioned audit
  * report — the pre-acceptance pass a platform schedules between ingest
  * (IngestGateJob) and curation (CurationJob):
  *
  *   - `profile/`  per-column row/null/distinct counts over every table
  *                 in the drop (op150's column-pruned branch-per-column
  *                 shape — each branch reads exactly one column);
  *   - `skew/`     rows-per-key distribution + max/median bp ratio for
  *                 the declared join keys (op185's count-of-counts
  *                 grid) — the decide-before-the-join straggler check;
  *   - `drift/`    exact KS D (bp) of the documents' length
  *                 distribution against a REFERENCE drop (op187) —
  *                 skipped with a marker row when no reference exists
  *                 (the first drop IS the reference);
  *   - `trend/`    per-event-type OLS slope of value over day (op184's
  *                 integer quotient-split) when an events table exists.
  *
  * Every emitted number is an exact integer (the library's Det
  * contract), so two runs over the same drop produce byte-identical
  * reports — auditable by diff, not by tolerance.
  *
  *   AuditJob <dropDir> <outDir> [referenceDropDir]
  *
  * `dropDir` is a TESTDATA-shaped directory (parquet per table; only
  * tables present are audited). Reports land under `outDir/<leg>/`.
  */
object AuditJob {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: AuditJob <dropDir> <outDir> [referenceDropDir]")
    val in = args(0); val out = args(1)
    val ref = if (args.length > 2) Some(args(2)) else None
    val spark = StediApps.session("graft-audit")
    def has(t: String) =
      new java.io.File(s"$in/$t.parquet").exists()

    // profile: every table present in the drop, op150's shape
    val tables = Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .filter(has)
    val profiles = tables.map { t =>
      val df = spark.read.parquet(s"$in/$t.parquet")
      df.columns.toSeq.map { c =>
        df.select(col(c)).agg(
            count(lit(1)).as("n_rows"),
            (count(lit(1)) - count(col(c))).cast("bigint").as("n_nulls"),
            countDistinct(col(c)).cast("bigint").as("n_distinct"))
          .select(lit(t).as("table"), lit(c).as("column"),
            col("n_rows"), col("n_nulls"), col("n_distinct"))
      }.reduce(_ union _)
    }
    if (profiles.nonEmpty)
      profiles.reduce(_ union _).coalesce(1)
        .write.mode("overwrite").parquet(s"$out/profile")

    // skew: op185 over the drop's lineitem join keys
    if (has("lineitem"))
      graft.queries.MonitorQueries.op185SkewReport(spark, in)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/skew")

    // drift: op187's KS grid, current drop vs the reference drop
    if (has("documents")) {
      val drift = ref.filter(r =>
          new java.io.File(s"$r/documents.parquet").exists())
        .map { r =>
          val cur = spark.read.parquet(s"$in/documents.parquet")
            .select(col("n_chars").as("v")).withColumn("grp", lit(1L))
          val old = spark.read.parquet(s"$r/documents.parquet")
            .select(col("n_chars").as("v")).withColumn("grp", lit(2L))
          val grid = cur.union(old).groupBy("v")
            .agg(sum(when(col("grp") === 1L, 1L).otherwise(0L)).as("c1"),
              sum(when(col("grp") === 2L, 1L).otherwise(0L)).as("c2"))
          // the oracle-gated op187 walk itself, not a re-derivation —
          // the audit's D is BY CONSTRUCTION the library operator's D
          graft.queries.MonitorQueries.ksFromGrid(grid)
            .select(col("d_bp"), col("n1").as("n_current"),
              col("n2").as("n_reference"))
        }
        .getOrElse(spark.range(1).select(lit(-1L).as("d_bp"),
          lit(-1L).as("n_current"), lit(-1L).as("n_reference")))
      drift.coalesce(1).write.mode("overwrite").parquet(s"$out/drift")
    }

    // trend: op184 over the drop's events
    if (has("events"))
      graft.queries.MonitorQueries.op184TrendOls(spark, in)
        .coalesce(1).write.mode("overwrite").parquet(s"$out/trend")

    println(s"[audit] report written to $out " +
      s"(tables=${tables.size}, reference=${ref.isDefined})")
    spark.stop()
  }
}
