package graft

import graft.sources.KafkaIO

/** Pins KafkaIO's reader/writer option plumbing to the reference's exact
  * Kafka wiring (/root/reference/sparkpykafkajoin.py:48-54,136-142,
  * 202-208). No broker (or even connector jar) exists in this sandbox, so
  * `.load()`/`.start()` cannot run — but every option the reference sets
  * is applied BEFORE source resolution, and this spec reads it back off
  * the un-started builder. That confines the untested residue of the
  * Kafka surface to the connector's own internals, which are Spark's,
  * not ours.
  */
class KafkaContractSpec extends SparkSpec {

  /** Reflectively read a private no-arg member of the classic
    * DataStreamReader/Writer (source, extraOptions, outputMode). */
  private def member[A](obj: AnyRef, name: String): A = {
    val m = obj.getClass.getDeclaredMethods
      .find(m => m.getName == name && m.getParameterCount == 0)
      .getOrElse(fail(s"${obj.getClass.getName} has no 0-arg member $name"))
    m.setAccessible(true)
    m.invoke(obj).asInstanceOf[A]
  }

  /** Options as stored (CaseInsensitiveMap lowercases keys — compare
    * against lowercased expectations). */
  private def options(obj: AnyRef): Map[String, String] =
    member[scala.collection.Map[String, String]](obj, "extraOptions").toMap

  private def lc(m: Map[String, String]): Map[String, String] =
    m.map { case (k, v) => k.toLowerCase(java.util.Locale.ROOT) -> v }

  /** A streaming frame with (key, value) columns, built on the in-box
    * rate source — writeStream demands a streaming Dataset, but nothing
    * here ever starts. */
  private def streamingPayload = {
    import org.apache.spark.sql.functions._
    spark.readStream.format("rate").load()
      .select(col("value").cast("string").as("key"),
        col("value").cast("string").as("value"))
  }

  test("OP-01 reader carries the reference's exact source options (both topics)") {
    for (topic <- Seq("redis-server", "stedi-events")) {
      val r = KafkaIO.readStreamBuilder(spark, "localhost:9092", topic)
      assert(member[String](r, "source") == "kafka")
      assert(options(r) == lc(Map(
        "kafka.bootstrap.servers" -> "localhost:9092",
        "subscribe" -> topic,
        "startingOffsets" -> "earliest")))
    }
  }

  test("OP-01 scale knobs (maxOffsetsPerTrigger / minPartitions) reach the reader verbatim") {
    val r = KafkaIO.readStreamBuilder(spark, "broker:9092", "t",
      startingOffsets = "latest",
      maxOffsetsPerTrigger = Some(50000L), minPartitions = Some(64))
    assert(options(r) == lc(Map(
      "kafka.bootstrap.servers" -> "broker:9092",
      "subscribe" -> "t",
      "startingOffsets" -> "latest",
      "maxOffsetsPerTrigger" -> "50000",
      "minPartitions" -> "64")))
  }

  test("OP-04 Kafka sink carries the reference's topic + checkpoint options") {
    val w = KafkaIO.toKafka(streamingPayload, "localhost:9092",
      "risk-score-topic", "/tmp/kafkacheckpoint")
    assert(member[String](w, "source") == "kafka")
    assert(options(w) == lc(Map(
      "kafka.bootstrap.servers" -> "localhost:9092",
      "topic" -> "risk-score-topic",
      "checkpointLocation" -> "/tmp/kafkacheckpoint")))
  }

  test("OP-03 console sink builder is append-mode console") {
    val w = KafkaIO.toConsole(streamingPayload)
    assert(member[String](w, "source") == "console")
    assert(member[AnyRef](w, "outputMode").toString.toLowerCase
      .contains("append"))
  }
}
