package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Synthesizes the reference's wire formats from the driver's parquet
  * fixtures, so the full decode surface (envelope JSON → base64 payload →
  * customer record) can run as a batch query and be oracle-checked.
  *
  * Wire shapes follow FIXTURES.md §A / the reference payloads
  * (/root/reference/sparkpykafkajoin.py:67-79 and Guide.ipynb cell 2).
  * All derivations are deterministic column expressions — the synthesis
  * itself is a narrow projection that fuses into the scan stage.
  */
object StediFixtures {

  /** Deterministic email for a customer key; the STEDI join key. */
  def emailFor(custkey: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    concat(lit("customer"), custkey.cast("string"), lit("@test.com"))

  /** Redis change-event frames: one Kafka-envelope `value` (JSON string)
    * per customer row, with the customer record base64-embedded at
    * zSetEntries[0].element. */
  def redisFrames(spark: SparkSession, dir: String): DataFrame =
    redisFramesFrom(Tables.customer(spark, dir))

  /** Customer-record JSON column over the customer table's rows — the
    * payload both the change-stream envelope (base64-embedded) and the
    * RDB snapshot bootstrap (zset member, op125) carry. */
  def customerRecordJson: org.apache.spark.sql.Column = to_json(struct(
    col("c_name").as("customerName"),
    emailFor(col("c_custkey")).as("email"),
    concat(lit("555"), lpad(col("c_custkey").cast("string"), 7, "0")).as("phone"),
    concat((lit(1930) + col("c_custkey") % 70).cast("string"),
      lit("-"),
      lpad(((col("c_custkey") % 12) + 1).cast("string"), 2, "0"),
      lit("-"),
      lpad(((col("c_custkey") % 28) + 1).cast("string"), 2, "0")).as("birthDay")
  ))

  /** [[redisFrames]] as a DataFrame→DataFrame transform, so the same
    * synthesis runs over a batch read OR a streaming source (op123
    * streams the customer table through it). */
  def redisFramesFrom(c: DataFrame): DataFrame = {
    val customerJson = customerRecordJson
    c.select(to_json(struct(
      lit("Q3VzdG9tZXI=").as("key"), // base64("Customer")
      lit("NONE").as("existType"),
      lit(false).as("Ch"),
      lit(false).as("Incr"),
      array(struct(
        base64(customerJson.cast("binary")).as("element"),
        lit("0.0").as("score"))).as("zSetEntries")
    )).as("value"))
  }

  /** Risk-event frames: one Kafka-envelope `value` (JSON string) per
    * events row, keyed by the synthetic customer email. */
  def riskFrames(spark: SparkSession, dir: String): DataFrame =
    riskFramesFrom(Tables.events(spark, dir))

  /** [[riskFrames]] as a transform over an already-loaded events frame
    * (must carry the converted `ts` — see [[Tables.eventsColumns]]). */
  def riskFramesFrom(e: DataFrame): DataFrame = {
    e.select(to_json(struct(
      emailFor(col("user_id")).as("customer"),
      col("value").cast("string").as("score"),
      date_format(col("ts"), "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'").as("riskDate")
    )).as("value"))
  }

  /** Flagship: full STEDI surface as one batch query on the fixtures —
    * decode customers from redis frames, parse risk events, inner-join on
    * customer=email, then aggregate mean risk per customer.
    * Exercises OP-10..19 + OP-30 (+ OP-40) end-to-end.
    */
  def flagship(spark: SparkSession, dir: String): DataFrame = {
    // customers is the dim side (one row per customer vs a risk-event
    // stream): broadcast it so the fact side never shuffles for the join
    // — the only remaining shuffle is the final (email, birthYear) agg
    val customers = broadcast(Stedi.decodeCustomers(redisFrames(spark, dir)))
    val risks = Stedi.parseRiskEventsFull(riskFrames(spark, dir))
    // avg must be cross-engine exact: naive avg(double) accumulates in
    // partition order and can cross a 4th-decimal rounding boundary at
    // scale. Scores carry exactly 2 decimals → sum exact integer cents,
    // then ONE double division of identical integers (IEEE-deterministic)
    // before the decimal cast.
    Stedi.joinRisk(risks, customers)
      .groupBy(col("email"), col("birthYear"))
      .agg(
        count(lit(1)).cast("bigint").as("n_events"),
        graft.queries.Det.centsSum(col("score").cast("double")).as("__cents"))
      .select(col("email"), col("birthYear"), col("n_events"),
        // basis-point output (no DECIMAL in the hash-checked contract)
        graft.queries.Det.meanBpFromCents(col("__cents"), col("n_events"))
          .as("avg_score"))
      .orderBy(col("email"), col("birthYear"), col("n_events"), col("avg_score"))
  }
}
