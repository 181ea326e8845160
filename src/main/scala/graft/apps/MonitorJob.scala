package graft.apps

/** The production DRIFT WATCH: one batch job that runs the library's
  * statistical monitoring gates over a dataset drop and writes a
  * partitioned report — the scheduled pass a platform runs per drop to
  * answer "did anything move?" before models and dashboards read it.
  * Complements AuditJob (shape/skew/profile) with the STATISTICS legs:
  *
  *   - `rank_drift/`   Mann–Whitney U + AUC of src0 vs rest over doc
  *                     length (op233) — location-shift drift;
  *   - `trend_robust/` Theil–Sen median slope per event type (op232);
  *   - `changepoint/`  CUSUM peak + day per event type (op235);
  *   - `conformal/`    split-conformal interval coverage on the eval
  *                     window (op251) — interval-validity drift;
  *   - `srm/`          hash-assignment sample-ratio-mismatch gate
  *                     (op244);
  *   - `changers/`     top-10 users by activity delta (op250);
  *   - `centroid/`     per-label embedding centroid cosine between the
  *                     drop's halves (op247) — vector-space drift.
  *
  * Every leg is the ORACLE-GATED library operator verbatim (never a
  * re-derivation), and every number an exact integer (Det contract):
  * two runs over the same drop diff byte-identical.
  *
  *   MonitorJob <dropDir> <outDir>
  *
  * Tables absent from the drop skip their legs.
  */
object MonitorJob {
  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: MonitorJob <dropDir> <outDir>")
    val in = args(0); val out = args(1)
    val spark = StediApps.session("graft-monitor")
    def has(t: String) =
      new java.io.File(s"$in/$t.parquet").exists()
    val Q = graft.queries.MonitorQueries

    var legs = 0
    def write(leg: String,
        df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.mode("overwrite").parquet(s"$out/$leg")
      legs += 1
    }

    if (has("documents"))
      write("rank_drift", Q.op233MannWhitney(spark, in))
    if (has("events")) {
      write("trend_robust", Q.op232TheilSen(spark, in))
      write("changepoint", Q.op235Cusum(spark, in))
      write("conformal", Q.op251ConformalCoverage(spark, in))
      write("srm", Q.op244SrmGate(spark, in))
      write("changers", Q.op250HeavyChangers(spark, in))
    }
    if (has("embeddings"))
      write("centroid", Q.op247CentroidDrift(spark, in))

    println(s"[monitor] report written to $out (legs=$legs)")
    spark.stop()
  }
}
