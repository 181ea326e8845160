package graft

import org.apache.spark.sql.SparkSession

/** One-off toolchain smoke: read every fixture table at sf0.001, print
  * schema + count. Exercises the timestamp[ns] (events) and timestamp[ms]
  * (orders/lineitem) parquet paths on Spark 4.x.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.001"
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings")) {
      val df = spark.read.parquet(s"$dir/$t.parquet")
      println(s"== $t rows=${df.count()} schema=${df.schema.simpleString}")
    }
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val ev = spark.read.parquet(s"$dir/events.parquet")
    println(s"== events(nanosAsLong) schema=${ev.schema.simpleString}")
    import org.apache.spark.sql.functions._
    ev.withColumn("ts2", timestamp_micros(floor(col("ts") / 1000L)).cast("timestamp_ntz"))
      .select("event_id", "ts", "ts2", "event_type", "value", "props")
      .show(3, truncate = false)
    spark.stop()
  }
}
