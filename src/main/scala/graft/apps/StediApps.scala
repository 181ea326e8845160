package graft.apps

import org.apache.spark.sql.SparkSession

import graft.pipeline.Stedi
import graft.sources.KafkaIO

/** Runnable twins of the reference's three spark-submit entry points —
  * a user of the reference switches by replacing each Python script with
  * the matching main below (plus the Kafka connector package on the
  * classpath). Topics/bootstrap/checkpoint are CLI-overridable.
  *
  *   job C  sparkpyeventskafkastreamtoconsole.py → EventsToConsole
  *   job B  sparkpyrediskafkastreamtoconsole.py  → RedisDecodeToConsole
  *   job A  sparkpykafkajoin.py                  → RiskJoinToKafka
  */
object StediApps {
  private[apps] def session(name: String): SparkSession = {
    val b = SparkSession.builder().appName(name)
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    // spark-submit owns the master; SPARK_GRAFT_MASTER lets the jobs
    // run under plain `sbt runMain` for local smoke tests
    sys.env.get("SPARK_GRAFT_MASTER").foreach(b.master)
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[apps] def arg(args: Array[String], i: Int, default: String): String =
    if (args.length > i) args(i) else default
}

/** Job C: parse stedi-events risk scores → console. */
object EventsToConsole {
  def main(args: Array[String]): Unit = {
    val bootstrap = StediApps.arg(args, 0, "localhost:9092")
    val topic = StediApps.arg(args, 1, "stedi-events")
    val spark = StediApps.session("graft-events-console")
    val events = Stedi.parseRiskEvents(
      KafkaIO.readStream(spark, bootstrap, topic))
    KafkaIO.toConsole(events).start().awaitTermination()
  }
}

/** Job B: decode Redis change events → (email, birthYear) → console. */
object RedisDecodeToConsole {
  def main(args: Array[String]): Unit = {
    val bootstrap = StediApps.arg(args, 0, "localhost:9092")
    val topic = StediApps.arg(args, 1, "redis-server")
    val spark = StediApps.session("graft-redis-console")
    val customers = Stedi.emailAndBirthYear(
      KafkaIO.readStream(spark, bootstrap, topic))
    KafkaIO.toConsole(customers).start().awaitTermination()
  }
}

/** Job A (flagship): decode + parse + stream-stream join → Kafka sink AND
  * console, both running concurrently (the reference's second sink was
  * unreachable dead code after awaitTermination — see KafkaIO OP-05). */
object RiskJoinToKafka {
  def main(args: Array[String]): Unit = {
    val bootstrap = StediApps.arg(args, 0, "localhost:9092")
    val redisTopic = StediApps.arg(args, 1, "redis-server")
    val eventsTopic = StediApps.arg(args, 2, "stedi-events")
    val outTopic = StediApps.arg(args, 3, "risk-score-topic")
    val checkpoint = StediApps.arg(args, 4, "/tmp/kafkacheckpoint")
    val spark = StediApps.session("graft-risk-join")

    val customers = Stedi.decodeCustomers(
      KafkaIO.readStream(spark, bootstrap, redisTopic))
    val risks = Stedi.parseRiskEventsFull(
      KafkaIO.readStream(spark, bootstrap, eventsTopic))
    val joined = Stedi.joinRisk(risks, customers)

    KafkaIO.startAllAndAwait(spark, Seq(
      KafkaIO.toKafka(Stedi.riskScoreKafkaPayload(joined), bootstrap, outTopic,
        checkpoint),
      KafkaIO.toConsole(joined)))
  }
}
