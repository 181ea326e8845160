package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.apps.{AnnServeJob, CurationJob, DedupJob}

/** Smoke coverage for the three standalone spark-submit entry points —
  * the public mains a real user launches. Their cores are oracle-gated
  * (op113 / op98 / op115-116); what's only exercised HERE is each
  * main's arg parsing, session bring-up, and on-disk output layout.
  *
  * NOT a SparkSpec: each job's main stops the session it used, so this
  * suite manages its own handles — a session is created before the
  * main (getOrCreate inside the job reuses it, exactly as under
  * spark-submit) and a fresh one is brought up for the assertions.
  * Suites run sequentially in the forked test JVM, and later suites'
  * getOrCreate transparently builds a new session after our stop, so
  * the stop stays contained. */
class JobSmokeSpec extends AnyFunSuite {

  private val sfDir = "/root/testdata/sf0.001"

  private def freshSession(): SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName(getClass.getSimpleName)
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", "/tmp/graft_warehouse")
    .getOrCreate()

  private def tmp(tag: String): Path =
    Files.createTempDirectory(s"graft_job_$tag")

  test("CurationJob.main writes the op113 manifest partitioned by shard") {
    freshSession()
    val out = tmp("curation")
    CurationJob.main(Array(sfDir, out.toString))
    val s = freshSession()
    // layout: partitioned by shard — a trainer reading shard k scans
    // one directory
    val shardDirs = out.resolve("manifest").toFile.listFiles()
      .filter(_.getName.startsWith("shard="))
    assert(shardDirs.nonEmpty, "manifest is not partitioned by shard")
    // content: exactly the gated op113 query's rows (shard moves to the
    // end as the partition column; compare as keyed sets)
    val written = s.read.parquet(s"$out/manifest")
    val expected = graft.queries.TrainQueries.op113CurationPipeline(s, sfDir)
    assert(written.columns.sorted.sameElements(expected.columns.sorted),
      s"manifest columns diverge: ${written.columns.mkString(",")}")
    val cols = expected.columns.sorted.toIndexedSeq.map(col)
    val w = written.select(cols: _*).collect().map(_.toSeq).toSet
    val e = expected.select(cols: _*).collect().map(_.toSeq).toSet
    assert(w == e, "manifest rows diverge from the gated op113 output")
  }

  test("DedupJob.main writes op98's survivors and honors the threshold arg") {
    freshSession()
    val out = tmp("dedup")
    DedupJob.main(Array(sfDir, out.toString, "8000"))
    val s = freshSession()
    val written = s.read.parquet(s"$out/survivors")
    val docs = s.read.parquet(s"$sfDir/documents.parquet")
    val expected = graft.functions.Dedup.survivorsMinhash(
      docs, "doc_id", "text", 8000L)
    val wIds = written.select("doc_id").collect().map(_.getLong(0)).toSet
    val eIds = expected.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(wIds == eIds, "survivor set diverges from the gated composition")
    // survivors keep every input column (drop-rows, not project)
    assert(written.columns.sorted.sameElements(docs.columns.sorted))
  }

  test("AnnServeJob.main builds the index once and serves the query stream") {
    freshSession()
    val corpus = sfDir
    val index = tmp("ann_index").resolve("sq8")
    val queries = tmp("ann_queries")
    // stage two query vectors as the "arriving" parquet file
    val s0 = freshSession()
    s0.read.parquet(s"$corpus/embeddings.parquet")
      .filter(col("vec_id") < 2).coalesce(1)
      .write.mode("overwrite").parquet(queries.toString)
    sys.props("spark.graft.oneshot") = "1"
    try {
      AnnServeJob.main(Array(corpus, index.toString, queries.toString, "5", "4"))
      // build-once: _SUCCESS written; a second run must reuse, not retrain
      val marker = index.resolve("vectors/_SUCCESS")
      assert(Files.exists(marker), "index build left no _SUCCESS marker")
      val builtAt = Files.getLastModifiedTime(marker)
      freshSession()
      AnnServeJob.main(Array(corpus, index.toString, queries.toString, "5", "4"))
      assert(Files.getLastModifiedTime(marker) == builtAt,
        "second run rebuilt the index instead of probing the existing store")
    } finally sys.props.remove("spark.graft.oneshot"): Unit
    // the job-built store serves the gated probe shape: k rows per query
    val s = freshSession()
    val qv = s.read.parquet(queries.toString)
    val top = graft.functions.Similarity.sq8Probe(qv, index.toString, 5, 4)
    assert(top.count() == 2 * 5, "job-built index does not serve k per query")
  }
}
