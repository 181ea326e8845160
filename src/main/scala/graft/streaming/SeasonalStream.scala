package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming seasonal-baseline maintenance (op220): the (event type,
  * day) count grid kept online. Each micro-batch reduces its arrivals
  * to per-(type, day) partial counts (one tiny parquet append —
  * O(grid) rows per batch regardless of volume); the serving merge is
  * an element-wise sum. Counts are the textbook mergeable summary
  * (the op169/op193 argument), so the maintained grid equals the
  * batch group-by BIT-FOR-BIT and op216's anomaly tail runs under its
  * UNCHANGED oracle.
  *
  * 100 TB shape: per-batch state bounded by the (type, day) grid, not
  * arrival volume; partials compact at any cadence by replacing them
  * with their sum. The batch split is BY EVENT ID residue, so one
  * day's traffic genuinely spans micro-batches and the merge path is
  * exercised.
  */
object SeasonalStream {

  /** Drain events through a 4-batch MemoryStream (split by event_id
    * mod 4), one per-(type, day) partial per micro-batch into
    * `stateDir`, then return the merged (event_type, day_idx, n)
    * grid. */
  def maintainedDailyCounts(spark: SparkSession, dir: String,
      stateDir: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evDf = graft.sources.Tables.events(spark, dir)
    val rows = evDf
      .select(col("event_id"), col("event_type"),
        datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day_idx"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val in = MemoryStream[(Long, String, Long)]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = in.toDF().toDF("event_id", "event_type", "day_idx")
        .writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.groupBy("event_type", "day_idx")
            .agg(count(lit(1)).as("n"))
            .coalesce(1).write.mode("append")
            .parquet(s"$stateDir/partials")
          (): Unit
        }
        .start()
      (0 until 4).foreach { k =>
        in.addData(rows.filter(_._1 % 4 == k))
        q.processAllAvailable()
      }
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    val merged = spark.read.parquet(s"$stateDir/partials")
      .groupBy("event_type", "day_idx")
      .agg(sum("n").as("n"))
      .localCheckpoint()
    new scala.reflect.io.Directory(new java.io.File(stateDir))
      .deleteRecursively()
    merged
  }

  /** op240's state: the (event_type, day, y-cents) daily-TOTAL grid
    * kept online — identical drain/merge protocol to
    * [[maintainedDailyCounts]], but the mergeable summary is the
    * integer cents SUM (sums merge exactly for the same reason counts
    * do). Returns the merged (event_type, day, y) grid. */
  def maintainedDailySums(spark: SparkSession, dir: String,
      stateDir: String): DataFrame = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val evDf = graft.sources.Tables.events(spark, dir)
    val rows = evDf
      .select(col("event_id"), col("event_type"),
        datediff(to_date(col("ts")),
          lit("2024-01-01").cast("date")).cast("long").as("day"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    val in = MemoryStream[(Long, String, Long, Long)]
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val q = in.toDF().toDF("event_id", "event_type", "day", "cents")
        .writeStream.outputMode("update")
        .foreachBatch { (batch: DataFrame, batchId: Long) =>
          batch.groupBy("event_type", "day")
            .agg(sum("cents").as("y"))
            .coalesce(1).write.mode("append")
            .parquet(s"$stateDir/partials")
          (): Unit
        }
        .start()
      (0 until 4).foreach { k =>
        in.addData(rows.filter(_._1 % 4 == k))
        q.processAllAvailable()
      }
      q.stop()
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    val merged = spark.read.parquet(s"$stateDir/partials")
      .groupBy("event_type", "day")
      .agg(sum("y").as("y"))
      .localCheckpoint()
    new scala.reflect.io.Directory(new java.io.File(stateDir))
      .deleteRecursively()
    merged
  }
}
