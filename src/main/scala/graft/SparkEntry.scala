package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * STEDI surface recomposed over fixtures: envelope-JSON decode →
    * base64 customer extraction → risk-event parse → inner join →
    * per-customer risk aggregate (SURVEY.md §7.5). */
  def entry(spark: SparkSession): DataFrame =
    graft.pipeline.StediFixtures.flagship(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.StediQueries.defs ++
    graft.queries.RelationalQueries.defs ++
    graft.queries.TrainQueries.defs ++
    graft.queries.LakehouseQueries.defs ++
    graft.queries.TextQueries.defs ++
    graft.queries.DedupQueries.defs ++
    graft.queries.AnnQueries.defs ++
    graft.queries.StreamQueries.defs ++
    graft.queries.MultimodalQueries.defs ++
    graft.queries.AnalyticsQueries.defs ++
    graft.queries.SketchQueries.defs ++
    graft.queries.SeqGraphQueries.defs ++
    graft.queries.WarehouseQueries.defs ++
    graft.queries.MonitorQueries.defs ++
    graft.queries.EngineQueries.defs ++
    graft.queries.WebQueries.defs
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    graft.queries.StediQueries.oracle ++
    graft.queries.RelationalQueries.oracle ++
    graft.queries.TrainQueries.oracle ++
    graft.queries.LakehouseQueries.oracle ++
    graft.queries.TextQueries.oracle ++
    graft.queries.DedupQueries.oracle ++
    graft.queries.AnnQueries.oracle ++
    graft.queries.StreamQueries.oracle ++
    graft.queries.MultimodalQueries.oracle ++
    graft.queries.AnalyticsQueries.oracle ++
    graft.queries.SketchQueries.oracle ++
    graft.queries.SeqGraphQueries.oracle ++
    graft.queries.WarehouseQueries.oracle ++
    graft.queries.MonitorQueries.oracle ++
    graft.queries.EngineQueries.oracle ++
    graft.queries.WebQueries.oracle
}
