package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.pipeline.Stedi

/** Exactly-once semantics: checkpointed streaming queries resume from
  * committed offsets without reprocessing (OP-04 checkpoint contract),
  * and the bounded-state production join matches only in-window pairs. */
class RecoverySpec extends SparkSpec {
  import spark.implicits._

  test("checkpointed file-stream query resumes without duplicating processed data") {
    val srcDir = Files.createTempDirectory("graft_src_").toFile
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    val outName = "recovery_out"

    def writeBatch(id: Int, rows: Seq[Long]): Unit =
      rows.toDF("v").coalesce(1).write.mode("append")
        .parquet(srcDir.getAbsolutePath)

    def runOnce(query: String): Unit = {
      val stream = spark.readStream
        .schema("v LONG").parquet(srcDir.getAbsolutePath)
        .groupBy().agg(sum(col("v")).as("total"), count(lit(1)).as("n"))
      val q = stream.writeStream.outputMode("complete")
        .option("checkpointLocation", ckpt)
        .format("memory").queryName(query)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    writeBatch(0, Seq(1L, 2L, 3L))
    runOnce(outName)
    val first = spark.table(outName).as[(Long, Long)].first()
    assert(first == ((6L, 3L)))

    // new data lands; a RESTARTED query (same checkpoint) must pick up
    // only from committed offsets — totals include old+new exactly once
    writeBatch(1, Seq(10L))
    runOnce(outName)
    val second = spark.table(outName).as[(Long, Long)].first()
    assert(second == ((16L, 4L)),
      s"restart must not double-count committed batches: $second")
  }

  test("bounded-state join (production mode) matches only within maxAge") {
    implicit val sqlCtx = spark.sqlContext
    val customers = MemoryStream[(String, String, String)]
    val risks = MemoryStream[(String, String, String)]
    val custDf = customers.toDF().toDF("email", "birthYear", "seen_str")
      .select(col("email"), col("birthYear"),
        col("seen_str").cast("timestamp").as("seenAt"))
    val riskDf = risks.toDF().toDF("customer", "score", "riskDate")
    val joined = Stedi.joinRiskBounded(riskDf, custDf, maxAge = "1 hour")
    val q = joined.writeStream.outputMode("append").format("memory")
      .queryName("bounded_join_out").start()
    customers.addData(("a@test.com", "1950", "2024-01-01 10:00:00"))
    q.processAllAvailable()
    risks.addData(
      ("a@test.com", "5.0", "2024-01-01T10:30:00.000Z"),  // within 1h → match
      ("a@test.com", "9.0", "2024-01-01T13:00:00.000Z"))  // 3h later → dropped
    q.processAllAvailable()
    q.stop()
    val out = spark.table("bounded_join_out")
      .select("customer", "score").as[(String, String)].collect().toSeq
    assert(out == Seq(("a@test.com", "5.0")))
  }
}
