package graft

import org.apache.spark.sql.SparkSession

/** Local iteration scratch: graph/HNSW serving probes only. NOT part of
  * the bench contract — deleted before round close. */
object ScratchGraphBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try {
      val reps = sys.env.getOrElse("SCRATCH_REPS", "2").toInt
      for (r <- 1 to reps) {
        val p = BenchStreaming.pqProbeRowsPerSec(spark, sfDir, pruned = true)
        println(f"[scratch] rep $r pq_probe_rows_per_sec=$p%.1f")
      }
    } finally spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
    spark.stop()
  }
}
