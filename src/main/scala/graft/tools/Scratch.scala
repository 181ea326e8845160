package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway profiling harness for the op176 adjudication — deleted
  * before round close. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val s = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[scratch] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val items = graft.sources.Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey").distinct()
    val small = items.groupBy("l_orderkey")
      .agg(count(lit(1)).as("sz")).where(col("sz") <= 7)
      .select("l_orderkey")
    val it2 = items.join(small, "l_orderkey")
    val a = it2.select(col("l_orderkey"), col("l_partkey").as("p1"))
    val b = it2.select(col("l_orderkey"), col("l_partkey").as("p2"))
    val pairs = a.join(b, "l_orderkey")
      .where(col("p1") < col("p2")).select("p1", "p2").distinct()
    val edges = pairs.union(
        pairs.select(col("p2").as("p1"), col("p1").as("p2")))
      .select(col("p1").as("src"), col("p2").as("dst"))
    t("edges count")(println(edges.count()))
    t("edges count again")(println(edges.count()))
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val esd = t("esd checkpoint")(
      edges.join(broadcast(deg), "src").localCheckpoint())
    t("esd count")(println(esd.count()))
    val verts = deg.select(col("src").as("pk")).localCheckpoint()
    val nVerts = verts.agg(count(lit(1)).as("nv"))
    var ranks = verts.crossJoin(nVerts)
      .select(col("pk"), expr("1000000000 div nv").as("r"))
      .localCheckpoint()
    for (i <- 1 to 5) {
      ranks = t(s"iter $i") {
        val contrib = esd.join(broadcast(ranks), esd("src") === ranks("pk"))
          .select(col("dst"), expr("r div deg").as("c"))
          .groupBy("dst").agg(sum("c").as("sc"))
        verts.crossJoin(nVerts)
          .join(broadcast(contrib), col("pk") === col("dst"), "left")
          .select(col("pk"), col("nv"),
            coalesce(col("sc"), lit(0L)).as("sc"))
          .select(col("pk"),
            expr("150000000 div nv + (850000000 * sc) div 1000000000")
              .as("r"))
          .localCheckpoint()
      }
    }
    t("final")(println(ranks.count()))
    s.stop()
  }
}
