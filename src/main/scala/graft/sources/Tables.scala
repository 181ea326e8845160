package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch scans over the driver-generated parquet fixtures (OP-02).
  *
  * All tables load as-is except `events`, whose `ts` column is written as
  * parquet TIMESTAMP(NANOS) — a type Spark's vectorized reader rejects
  * ([PARQUET_TYPE_ILLEGAL]). We read it with
  * `spark.sql.legacy.parquet.nanosAsLong=true` (giving a bigint of epoch
  * nanoseconds) and derive a microsecond-truncated TIMESTAMP_NTZ, which is
  * exactly what DuckDB produces when casting its TIMESTAMP_NS to TIMESTAMP.
  * The raw nanos stay available as `ts_ns`.
  *
  * At 100 TB these reads are partition-parallel parquet scans; filters and
  * column pruning push down through this loader untouched because it adds
  * only deterministic per-row projections (no shuffles, no actions).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    name match {
      case "events" => events(spark, dir)
      case n        => spark.read.parquet(s"$dir/$n.parquet")
    }

  /** events with `ts` as TIMESTAMP_NTZ (µs, floor-truncated from ns).
    *
    * Sessions must set `spark.sql.legacy.parquet.nanosAsLong=true` at
    * CONSTRUCTION (all in-repo entry points do) so nanos parquet types
    * uniformly across the session. Fail fast instead of mutating the
    * session conf here: a mid-session set would silently change how any
    * LATER nanos-parquet read in the same foreign session is typed. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    require(
      spark.conf.getOption("spark.sql.legacy.parquet.nanosAsLong")
        .contains("true"),
      "events.parquet uses TIMESTAMP(NANOS): set " +
        "spark.sql.legacy.parquet.nanosAsLong=true when building the " +
        "SparkSession (before any parquet read)")
    eventsColumns(spark.read.parquet(s"$dir/events.parquet"))
  }

  /** The nanos→timestamp conversion as a transform, so a STREAMING read
    * of events.parquet (whose raw `ts` is a nanos long under the legacy
    * flag) gets the same typed columns as [[events]]. */
  def eventsColumns(raw: DataFrame): DataFrame =
    raw
      .withColumnRenamed("ts", "ts_ns")
      .withColumn(
        "ts", timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz"))
      .select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
