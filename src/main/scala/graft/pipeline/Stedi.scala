package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.Decode

/** The three reference pipelines recomposed from graft.ops operators,
  * source-agnostic: each stage is DataFrame→DataFrame and runs unchanged
  * over a batch DataFrame, a Kafka stream, or a MemoryStream (tests).
  *
  * Semantics follow the reference jobs:
  *  - risk-event parse:   /root/reference/sparkpyeventskafkastreamtoconsole.py:11-66
  *  - customer decode:    /root/reference/sparkpyrediskafkastreamtoconsole.py:46-154
  *  - join + serialize:   /root/reference/sparkpykafkajoin.py:184-213
  *
  * Scale: the parse/decode stages are stateless narrow projections (single
  * codegen stage, no shuffle). The join hash-partitions both inputs on the
  * key — in streaming it becomes StreamingSymmetricHashJoinExec with
  * per-partition state stores; in batch, a shuffled hash/sort-merge join
  * (or broadcast if one side is small).
  */
object Stedi {

  /** Job C core: Kafka envelope → (customer, score).
    * `value` may be binary or string; both cast identically. */
  def parseRiskEvents(kafka: DataFrame): DataFrame =
    Decode.parseAndExpand(kafka, Schemas.riskEvent)
      .select(col("customer"), col("score"))

  /** Job C, full rows (customer, score, riskDate) — used by the join. */
  def parseRiskEventsFull(kafka: DataFrame): DataFrame =
    Decode.parseAndExpand(kafka, Schemas.riskEvent)

  /** Job B core: Kafka envelope of Redis change events →
    * (email, birthYear) plus the full customer record columns.
    *
    * envelope → from_json(redisMessage) → zSetEntries[0].element
    * → unbase64 → from_json(customerRecord) → filter non-null
    * → birthYear = split(birthDay,'-')[0]
    */
  def decodeCustomers(kafka: DataFrame): DataFrame =
    Decode.parseAndExpand(kafka, Schemas.redisMessage)
      .select(Decode.firstArrayField(col("zSetEntries"), "element")
        .as("encodedCustomer"))
      .select(from_json(Decode.decodeBase64(col("encodedCustomer")),
        Schemas.customerRecord).as("c"))
      .select(col("c.*"))
      .transform(Decode.requireNonNull(_, "email", "birthDay"))
      .withColumn("birthYear", Decode.yearOf(col("birthDay")))

  /** Job B in the reference's exact hybrid style: temp views + spark.sql
    * statements mirroring sparkpyrediskafkastreamtoconsole.py:90-133
    * (view → SQL projection of zSetEntries[0].element → unbase64 →
    * view → SQL null-filter → birthYear split). Semantically identical
    * to [[decodeCustomers]]; kept to preserve the reference's API style
    * on streaming DataFrames (views over streams are legal Spark).
    */
  def decodeCustomersSqlStyle(kafka: DataFrame): DataFrame = {
    val spark = kafka.sparkSession
    Decode.parseAndExpand(kafka, Schemas.redisMessage)
      .createOrReplaceTempView("RedisSortedSet")
    val encoded = spark.sql(
      "SELECT get(zSetEntries, 0).element AS encodedCustomer FROM RedisSortedSet")
    encoded
      .withColumn("customer", from_json(
        Decode.decodeBase64(col("encodedCustomer")), Schemas.customerRecord))
      .select(col("customer.*"))
      .createOrReplaceTempView("CustomerRecords")
    spark.sql(
      """SELECT customerName, email, phone, birthDay,
             split(birthDay, '-')[0] AS birthYear
         FROM CustomerRecords
         WHERE email IS NOT NULL AND birthDay IS NOT NULL""")
  }

  /** Job B console projection: (email, birthYear). */
  def emailAndBirthYear(kafka: DataFrame): DataFrame =
    decodeCustomers(kafka).select("email", "birthYear")

  /** Job A core: inner equi-join risk events with decoded customers on
    * customer = email. Written as an expression join exactly like the
    * reference (`expr("customer = email")`); Catalyst recognizes the
    * equality and plans an equi-join (streaming: symmetric hash join).
    * Output columns match /root/reference/sparkpykafkajoin.py:190-199:
    * (customer, score, email, birthYear).
    */
  def joinRisk(riskEvents: DataFrame, customers: DataFrame): DataFrame =
    riskEvents.select("customer", "score")
      .join(customers.select("email", "birthYear"), expr("customer = email"))

  /** Job A, production mode (SURVEY §7.4 hard part 1): the same inner
    * join with BOUNDED state — watermarks on both sides plus a time-bound
    * on the join condition, so each side's state expires once the
    * watermark passes riskTime − maxAge. The faithful mode ([[joinRisk]])
    * matches the reference exactly (state retained forever); this mode is
    * what a 100 TB deployment runs. Inputs must carry event-time columns:
    * risk events use riskDate (ISO-8601 string → timestamp), customers a
    * `seenAt` ingestion time column.
    */
  def joinRiskBounded(riskEvents: DataFrame, customers: DataFrame,
      delay: String = "10 minutes", maxAge: String = "1 hour"): DataFrame =
    joinRiskBoundedFull(riskEvents, customers, delay, maxAge)
      .select(col("customer"), col("score"), col("email"), col("birthYear"))

  /** [[joinRiskBounded]] keeping the event-time column (riskTime) in the
    * output — the shape a downstream stateful operator needs (the
    * chained flagship below windows on it). */
  def joinRiskBoundedFull(riskEvents: DataFrame, customers: DataFrame,
      delay: String = "10 minutes", maxAge: String = "1 hour"): DataFrame = {
    val r = riskEvents
      .withColumn("riskTime", to_timestamp(col("riskDate")))
      .withWatermark("riskTime", delay)
    val c = customers
      .withWatermark("seenAt", delay)
    r.select(col("customer"), col("score"), col("riskTime"))
      .join(c.select(col("email"), col("birthYear"), col("seenAt")),
        expr(s"""customer = email AND
                 riskTime >= seenAt AND
                 riskTime <= seenAt + interval $maxAge"""))
      .select(col("customer"), col("score"), col("email"), col("birthYear"),
        col("riskTime"))
  }

  /** Job A, production flagship: the BOUNDED join chained into the
    * per-customer daily risk aggregate in ONE streaming query — two
    * stateful operators back to back (symmetric-hash join → windowed
    * aggregation), the multi-stateful-operator pipeline Spark supports
    * in append mode with propagated watermarks. The aggregate emits a
    * (day, email, birthYear) row exactly once, when the watermark that
    * PROPAGATES THROUGH THE JOIN (input watermark minus the join's
    * state horizon) passes the day's end — so both operators' state
    * stays bounded: join rows expire at riskTime − maxAge, closed
    * windows are evicted on emission. Integer cents keep the sum
    * cross-engine exact (the flagship rule). */
  def boundedFlagshipDaily(riskEvents: DataFrame, customers: DataFrame,
      delay: String = "0 seconds", maxAge: String = "24 hours"): DataFrame =
    joinRiskBoundedFull(riskEvents, customers, delay, maxAge)
      .groupBy(window(col("riskTime"), "1 day").as("w"),
        col("email"), col("birthYear"))
      .agg(count(lit(1)).cast("bigint").as("n_events"),
        sum(expr("CAST(round(CAST(score AS DOUBLE) * 100) AS BIGINT)"))
          .as("sum_score_c"))
      .select(date_format(col("w.start"), "yyyy-MM-dd").as("day"),
        col("email"), col("birthYear"), col("n_events"), col("sum_score_c"))

  /** Job A sink projection: Kafka (key, value) with value =
    * to_json(struct(*)) per the output contract
    * {"customer":…,"score":"28.5","email":…,"birthYear":"1963"}. */
  def riskScoreKafkaPayload(joined: DataFrame): DataFrame =
    joined.select(
      col("email").cast("string").as("key"),
      to_json(struct(joined.columns.map(col).toIndexedSeq: _*)).as("value"))
}
