package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Throwaway: per-micro-batch cost anatomy of the ANN serving leg. */
object Scratch2 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "1")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    import graft.functions.{Similarity, TopKAgg}
    import graft.streaming.StreamingAnn
    val emb = graft.sources.Tables.embeddings(spark, sfDir)
    val dir = java.nio.file.Files.createTempDirectory("graft_scratch2_")
    try {
      Similarity.sq8IndexWrite(emb, s"$dir/sq8", nCells = 16, lloydIters = 2)
      val queryVecs = emb.orderBy("vec_id").limit(2000)
        .select("vec_id", "embedding").collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq

      def bench(label: String)(mk: DataFrame => DataFrame): Unit = {
        val in = MemoryStream[(Long, Seq[Float])]
        in.addData(queryVecs.take(200))
        val q = mk(in.toDF().toDF("vec_id", "embedding"))
          .writeStream.outputMode("update").format("memory")
          .queryName(s"scratch2_$label").start()
        q.processAllAvailable()
        val ts = (1 to 4).map { _ =>
          in.addData(queryVecs.take(500))
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
        q.stop()
        println(f"[scratch2] $label: ${ts.map(t => f"$t%.3f").mkString(" ")} s")
      }

      // 1: passthrough projection, no state
      bench("passthrough")(df => df.select(col("vec_id")))
      // 2: + quantize/norm projection
      bench("project_q") { df =>
        val qv = Similarity.quantize(col("embedding"))
        df.select(col("vec_id").as("q_id"), qv.as("q_vec"))
          .withColumn("q_n2", Similarity.intDot(col("q_vec"), col("q_vec")))
          .select("q_id", "q_n2")
      }
      // 3: + stateless groupless agg? (skip) — stateful count agg
      bench("state_agg") { df =>
        df.select(col("vec_id"))
          .groupBy(col("vec_id") % 64).agg(count(lit(1)))
      }
      // 3b: stateful agg at probe-like key cardinality
      bench("state_agg_wide") { df =>
        df.select(col("vec_id"))
          .groupBy(col("vec_id")).agg(count(lit(1)))
      }
      // 3c: the probe WITHOUT its final aggregation (stateless)
      bench("probe_no_agg") { df =>
        val q = StreamingAnn.probeCellsInlined(df, s"$dir/sq8", 4)
        val codes = spark.read.parquet(s"$dir/sq8/codes")
          .withColumn("cent_id", col("cent_id").cast("bigint"))
          .localCheckpoint()
        q.join(broadcast(codes), "cent_id")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosBpFrom(
              Similarity.intDot(col("q_vec"), col("codes")),
              col("q_n2"), col("c_n2")).as("sq_bp"))
      }
      // 3d: cell choice only + count agg
      bench("cells_count") { df =>
        StreamingAnn.probeCellsInlined(df, s"$dir/sq8", 4)
          .groupBy(col("q_id")).agg(count(lit(1)).as("n"))
      }
      // 3e: cell choice + block join (no scoring) + count agg
      bench("join_count") { df =>
        val q = StreamingAnn.probeCellsInlined(df, s"$dir/sq8", 4)
        val blocks = spark.read.parquet(s"$dir/sq8/codes")
          .withColumn("cent_id", col("cent_id").cast("bigint"))
          .groupBy(col("cent_id"))
          .agg(collect_list(struct(col("n_id"), col("codes"), col("c_n2")))
            .as("block"))
          .localCheckpoint()
        q.join(broadcast(blocks), "cent_id")
          .select(col("q_id"), size(col("block")).as("bs"))
          .groupBy(col("q_id")).agg(sum(col("bs")).as("n"))
      }
      // 4: full probe
      bench("full_probe")(df =>
        StreamingAnn.sq8ProbeStream(df, s"$dir/sq8", 5, nProbe = 4))
      // 4b: quarter the candidate volume — if time barely moves, the
      // cost is fixed per-batch overhead, not compute
      bench("full_probe_np1")(df =>
        StreamingAnn.sq8ProbeStream(df, s"$dir/sq8", 5, nProbe = 1))
      // 4c: TopKAgg replaced by a count agg over the same scored rows —
      // isolates the typed-aggregate state cost
      bench("probe_count_agg") { df =>
        val q = StreamingAnn.probeCellsInlined(df, s"$dir/sq8", 4)
        val codes = spark.read.parquet(s"$dir/sq8/codes")
          .withColumn("cent_id", col("cent_id").cast("bigint"))
          .localCheckpoint()
        q.join(broadcast(codes), "cent_id")
          .filter(col("q_id") =!= col("n_id"))
          .select(col("q_id"), col("n_id"),
            Similarity.cosBpFrom(
              Similarity.intDot(col("q_vec"), col("codes")),
              col("q_n2"), col("c_n2")).as("sq_bp"))
          .groupBy(col("q_id")).agg(count(lit(1)).as("n"),
            max(col("sq_bp")).as("m"))
      }
      spark.stop()
    } finally {
      import scala.reflect.io.Directory
      new Directory(dir.toFile).deleteRecursively(): Unit
    }
  }
}
