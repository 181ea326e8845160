package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

import graft.model.Schemas.{Customer, RiskEvent, RiskScore}

/** Typed Dataset views of the STEDI pipelines (SURVEY §1.3: case-class
  * views for compile-time field checks where they help; DataFrame
  * everywhere schema is dynamic). Same plans as the untyped stages — the
  * encoders only re-interpret the rows.
  */
object StediTyped {

  /** Decoded customers as Dataset[Customer] (plus birthYear dropped —
    * the case class is the wire contract, birthYear is derived). */
  def customers(kafka: DataFrame): Dataset[Customer] =
    Stedi.decodeCustomers(kafka)
      .select("customerName", "email", "phone", "birthDay")
      .as(Encoders.product[Customer])

  /** Parsed risk events as Dataset[RiskEvent]. */
  def riskEvents(kafka: DataFrame): Dataset[RiskEvent] =
    Stedi.parseRiskEventsFull(kafka).as(Encoders.product[RiskEvent])

  /** Joined output as Dataset[RiskScore] — the exact output contract
    * {"customer":…,"score":…,"email":…,"birthYear":…}. */
  def riskScores(riskKafka: DataFrame, redisKafka: DataFrame): Dataset[RiskScore] =
    Stedi.joinRisk(
      Stedi.parseRiskEventsFull(riskKafka),
      Stedi.decodeCustomers(redisKafka))
      .as(Encoders.product[RiskScore])
}
