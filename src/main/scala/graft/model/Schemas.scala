package graft.model

import org.apache.spark.sql.types._

/** Wire-format schemas of the reference pipeline, declared explicitly
  * because streaming JSON sources cannot infer schema.
  *
  * Shapes follow the reference's declarations:
  *  - Redis change event: /root/reference/sparkpykafkajoin.py:8-21
  *  - embedded customer record: /root/reference/sparkpykafkajoin.py:25-30
  *  - risk event: /root/reference/sparkpykafkajoin.py:164-168
  *
  * Everything is schema-on-read: the Kafka value is bytes; typing happens in
  * the query via CAST + from_json (PERMISSIVE — malformed JSON / missing
  * fields yield nulls, never errors).
  */
object Schemas {

  /** Redis sorted-set change event as emitted by a Kafka-Connect Redis
    * source. `zSetEntries[*].element` carries a base64-encoded customer
    * JSON document; the wire-level numeric `score` is deliberately read as
    * String (permissive numeric→string coercion, reference semantics).
    */
  val redisMessage: StructType = StructType(Seq(
    StructField("key", StringType),
    StructField("existType", StringType),
    StructField("Ch", BooleanType),
    StructField("Incr", BooleanType),
    StructField("zSetEntries", ArrayType(StructType(Seq(
      StructField("element", StringType),
      StructField("score", StringType)
    ))))
  ))

  /** Customer record embedded (base64) in a Redis change event. */
  val customerRecord: StructType = StructType(Seq(
    StructField("customerName", StringType),
    StructField("email", StringType),
    StructField("phone", StringType),
    StructField("birthDay", StringType)
  ))

  /** Risk-score event from the application's event topic. All fields are
    * String — including `score` (a JSON number on the wire) and `riskDate`
    * (an ISO-8601 instant) — matching the reference's string-typed contract:
    * the join output serializes score as a JSON string, e.g. "28.5".
    */
  val riskEvent: StructType = StructType(Seq(
    StructField("customer", StringType),
    StructField("score", StringType),
    StructField("riskDate", StringType)
  ))

  // Typed views for Dataset[T] usage in tests and pipelines.
  final case class Customer(
    customerName: String, email: String, phone: String, birthDay: String)
  final case class RiskEvent(customer: String, score: String, riskDate: String)
  /** Join output contract: {"customer":…,"score":"28.5","email":…,"birthYear":"1963"} */
  final case class RiskScore(
    customer: String, score: String, email: String, birthYear: String)
}
