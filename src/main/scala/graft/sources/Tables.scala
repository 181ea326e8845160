package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch scans over the driver-generated parquet fixtures (OP-02).
  *
  * All tables load as-is except `events`, whose physical `ts` type has
  * varied across fixture generations — TIMESTAMP(NANOS) in earlier drops,
  * TIMESTAMP(MICROS) now — so the loader adapts to the OBSERVED schema
  * instead of hard-wiring either:
  *   - nanos fixtures surface `ts` as a bigint of epoch nanoseconds under
  *     `spark.sql.legacy.parquet.nanosAsLong=true` (without the flag the
  *     read fails [PARQUET_TYPE_ILLEGAL]); we floor-truncate to micros;
  *   - micros fixtures surface `ts` as TIMESTAMP/TIMESTAMP_NTZ directly.
  * Either way the loaded frame carries `ts` as TIMESTAMP_NTZ (µs) plus
  * `ts_ns` as epoch-nanos bigint, so every downstream query is
  * physical-type-agnostic.
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

  /** events with `ts` as TIMESTAMP_NTZ (µs) — adaptive, see class doc. */
  def events(spark: SparkSession, dir: String): DataFrame =
    eventsColumns(eventsRaw(spark, dir))

  /** The raw (unconverted) events scan, with a helpful error when the
    * fixture is TIMESTAMP(NANOS) and the session lacks the legacy flag.
    * We deliberately do NOT set the flag here: a mid-session conf set
    * would silently change how any LATER nanos-parquet read in the same
    * foreign session is typed — the flag belongs at session construction
    * (all in-repo entry points set it, where it is a no-op for a micros
    * fixture). */
  def eventsRaw(spark: SparkSession, dir: String): DataFrame =
    try spark.read.parquet(s"$dir/events.parquet")
    catch {
      case e: Throwable if isParquetTypeIllegal(e) =>
        throw new IllegalArgumentException(
          "events.parquet uses TIMESTAMP(NANOS): set " +
            "spark.sql.legacy.parquet.nanosAsLong=true when building the " +
            "SparkSession (before any parquet read)", e)
    }

  /** Detect the nanos-parquet failure by its ERROR CONDITION
    * (`PARQUET_TYPE_ILLEGAL`), not a message substring — the condition
    * name is the stable cross-version contract (SparkThrowable), while
    * message text is not. Walked through the cause chain because schema
    * inference may surface it wrapped (AnalysisException directly, or
    * inside a SparkException from a task). */
  private def isParquetTypeIllegal(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists {
      case st: org.apache.spark.SparkThrowable =>
        Option(st.getCondition).exists(_.contains("PARQUET_TYPE_ILLEGAL"))
      case _ => false
    }

  /** Adaptive epoch-microseconds expression for a frame's raw `ts`
    * column: nanos-long fixtures floor-truncate (`div 1000`), timestamp
    * fixtures convert exactly (`unix_micros`; NTZ casts through the
    * session zone, which every in-repo entry point pins to UTC). Shared
    * by [[eventsColumns]] and the streaming reads that consume the raw
    * schema directly. */
  def tsUsExpr(df: DataFrame): org.apache.spark.sql.Column =
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // the NTZ→timestamp cast reads the wall-clock through the SESSION
        // zone: under anything but UTC the epoch micros shift silently by
        // the zone offset. Every in-repo entry point pins UTC; a foreign
        // session must fail fast here, not produce shifted timestamps
        // (same fail-fast contract as the old nanosAsLong guard).
        val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
        require(tz == "UTC",
          s"events ts is TIMESTAMP_NTZ and spark.sql.session.timeZone=$tz: " +
            "set the session zone to UTC (epoch conversion would shift by " +
            "the zone offset)")
        expr("unix_micros(cast(ts as timestamp))")
      case _ => expr("unix_micros(cast(ts as timestamp))")
    }

  /** The raw→typed conversion as a transform, so a STREAMING read of
    * events.parquet gets the same typed columns as [[events]] whatever
    * the physical `ts` type: output `ts` is TIMESTAMP_NTZ (µs), `ts_ns`
    * is epoch-nanos bigint (exact for micros fixtures — no sub-µs data
    * exists there by construction). */
  def eventsColumns(raw: DataFrame): DataFrame = {
    val typed = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumnRenamed("ts", "ts_ns")
          .withColumn(
            "ts", timestamp_micros(expr("ts_ns div 1000")).cast("timestamp_ntz"))
      case _ =>
        raw.withColumn("ts_ns", tsUsExpr(raw) * lit(1000L))
          .withColumn("ts", col("ts").cast("timestamp_ntz"))
    }
    typed.select("event_id", "ts", "ts_ns", "user_id", "event_type", "value", "props")
  }

  /** Generic loader for callers iterating the schema (op258's FK
    * audit); NOT for events, which needs the adaptive ts path. */
  def table(s: SparkSession, d: String, name: String): DataFrame =
    load(s, d, name)

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
