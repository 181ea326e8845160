package graft

import org.apache.spark.sql.functions._

import graft.model.Schemas
import graft.ops.Decode
import graft.pipeline.Stedi

/** Unit coverage of the decode operators (OP-10..19) and the recomposed
  * STEDI pipelines, batch mode, with reference-shaped payloads
  * (FIXTURES.md §A). */
class DecodeSpec extends SparkSpec {
  import spark.implicits._

  private def b64(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))

  private def redisFrame(customerJson: String): String =
    s"""{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,
        "zSetEntries":[{"element":"${b64(customerJson)}","score":0.0}]}"""
      .replaceAll("\n\\s*", "")

  test("decodeCustomers: reference-shaped payload decodes to email/birthYear") {
    val customer =
      """{"customerName":"Sam Test","email":"sam.test@test.com","phone":"8015551212","birthDay":"2001-01-03"}"""
    val df = Seq(redisFrame(customer)).toDF("value")
    val out = Stedi.decodeCustomers(df)
      .select("customerName", "email", "birthDay", "birthYear").collect()
    assert(out.length == 1)
    assert(out(0).getString(0) == "Sam Test")
    assert(out(0).getString(1) == "sam.test@test.com")
    assert(out(0).getString(2) == "2001-01-03")
    assert(out(0).getString(3) == "2001")
  }

  test("decodeCustomers: missing email/birthDay rows are filtered (OP-16)") {
    val noEmail = """{"customerName":"A","phone":"1","birthDay":"1990-05-01"}"""
    val noBirth = """{"customerName":"B","email":"b@test.com","phone":"2"}"""
    val ok = """{"customerName":"C","email":"c@test.com","phone":"3","birthDay":"1980-01-02"}"""
    val df = Seq(noEmail, noBirth, ok).map(redisFrame).toDF("value")
    val out = Stedi.decodeCustomers(df).select("email").as[String].collect()
    assert(out.toSeq == Seq("c@test.com"))
  }

  test("permissive parse: malformed JSON and empty zSetEntries yield null, not errors") {
    val malformed = "{not json at all"
    val emptyEntries =
      """{"key":"Q3VzdG9tZXI=","existType":"NONE","Ch":false,"Incr":false,"zSetEntries":[]}"""
    val df = Seq(malformed, emptyEntries).toDF("value")
    // no exception; zero surviving rows after the non-null filter
    assert(Stedi.decodeCustomers(df).count() == 0)
  }

  test("parseRiskEvents: stedi-events payload → (customer, score) (OP-11/13/18)") {
    val df = Seq(
      """{"customer":"Jason.Mitra@test.com","score":7.0,"riskDate":"2020-09-14T07:54:06.417Z"}""")
      .toDF("value")
    val out = Stedi.parseRiskEvents(df).collect()
    assert(out(0).getString(0) == "Jason.Mitra@test.com")
    assert(out(0).getString(1) == "7.0") // numeric coerced to declared String
  }

  test("joinRisk output contract: (customer, score, email, birthYear) + payload JSON (OP-30/19)") {
    val customers = Seq(
      ("Santosh.Fibonnaci@test.com", "1963")).toDF("email", "birthYear")
    val risks = Seq(
      ("Santosh.Fibonnaci@test.com", "28.5", "2020-09-15T00:00:00.000Z"),
      ("Nobody@test.com", "1.0", "2020-09-15T00:00:00.000Z"))
      .toDF("customer", "score", "riskDate")
    val joined = Stedi.joinRisk(risks, customers)
    assert(joined.columns.toSeq == Seq("customer", "score", "email", "birthYear"))
    val rows = joined.collect()
    assert(rows.length == 1) // inner join drops the unmatched risk event
    val payload = Stedi.riskScoreKafkaPayload(joined).collect()(0)
    assert(payload.getString(0) == "Santosh.Fibonnaci@test.com")
    assert(payload.getString(1) ==
      """{"customer":"Santosh.Fibonnaci@test.com","score":"28.5","email":"Santosh.Fibonnaci@test.com","birthYear":"1963"}""")
  }

  test("base64 round-trip property: unbase64 \u2218 base64 = id (OP-15)") {
    val rnd = new scala.util.Random(42)
    val samples = (1 to 50).map(_ =>
      rnd.alphanumeric.take(1 + rnd.nextInt(80)).mkString) ++
      Seq("\u03c0 unicode \u2713", "embedded \"quotes\" and \\slashes\\", "a",
        "trailing space ", " leading", "multi\nline")
    val df = samples.toDF("v")
    val out = df.select(col("v"),
      Decode.decodeBase64(Decode.encodeBase64(col("v"))).as("r"))
      .collect()
    out.foreach(r => assert(r.getString(0) == r.getString(1)))
  }

  test("to_json \u2218 from_json = id on customer records (OP-11/19)") {
    val rnd = new scala.util.Random(7)
    val recs = (1 to 30).map { _ =>
      def s() = rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString
      (s(), s() + "@test.com", s(), "1990-01-01")
    }
    val df = recs.toDF("customerName", "email", "phone", "birthDay")
    val json = df.select(to_json(struct(df.columns.map(col): _*)).as("value"))
    val back = Decode.parseAndExpand(json, Schemas.customerRecord)
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(back == recs.toSet)
  }

  test("typed Dataset views: decode to case classes with identical semantics") {
    val customerJson =
      """{"customerName":"Sam Test","email":"sam.test@test.com","phone":"8015551212","birthDay":"2001-01-03"}"""
    val frames = Seq(redisFrame(customerJson)).toDF("value")
    val typedCustomers = graft.pipeline.StediTyped.customers(frames).collect()
    assert(typedCustomers.toSeq == Seq(graft.model.Schemas.Customer(
      "Sam Test", "sam.test@test.com", "8015551212", "2001-01-03")))

    val risks = Seq(
      """{"customer":"sam.test@test.com","score":"3.5","riskDate":"2020-09-14T00:00:00Z"}""")
      .toDF("value")
    val scores = graft.pipeline.StediTyped.riskScores(risks, frames).collect()
    assert(scores.toSeq == Seq(graft.model.Schemas.RiskScore(
      "sam.test@test.com", "3.5", "sam.test@test.com", "2001")))
  }

  test("entry(): flagship runs on sf0.001 with rows > 0 (driver smoke twin)") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }
}
