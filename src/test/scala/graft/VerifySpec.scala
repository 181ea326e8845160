package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The verify harness must be LOUD about broken queries: r7 lost a full
  * round to 18 queries silently vanishing from CORRECTNESS because the
  * dump loop only printed failures to stderr. These pin the `_errors
  * .json` contract: always written, empty on green, and a throwing
  * query appears in it (while healthy siblings still dump). */
class VerifySpec extends SparkSpec {

  private def run(qs: Seq[(String, (SparkSession, String) => DataFrame)])
      : (String, Map[String, String]) = {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    val errs = Verify.dumpQueries(spark, sfDir, out, qs)
    (out, errs)
  }

  private val good: (SparkSession, String) => DataFrame =
    (s, d) => s.read.parquet(s"$d/region.parquet")

  test("green run writes an EMPTY _errors.json (artifact always exists)") {
    val (out, errs) = run(Seq("ok_query" -> good))
    assert(errs.isEmpty)
    val f = Paths.get(s"$out/_errors.json")
    assert(Files.exists(f), "_errors.json missing on a green run")
    assert(Files.readString(f) == "{}")
    assert(new java.io.File(s"$out/ok_query").isDirectory)
  }

  test("a throwing query lands in _errors.json; healthy siblings still dump") {
    val boom: (SparkSession, String) => DataFrame =
      (s, d) => s.read.parquet(s"$d/region.parquet")
        .select(expr("assert_true(r_regionkey < 0)"))
    val (out, errs) = run(Seq("ok_query" -> good, "broken_query" -> boom))
    assert(errs.keySet == Set("broken_query"))
    val txt = Files.readString(Paths.get(s"$out/_errors.json"))
    assert(txt.contains("\"broken_query\""))
    assert(new java.io.File(s"$out/ok_query").isDirectory)
    assert(!new java.io.File(s"$out/broken_query").exists())
  }

  test("_summary.json carries per-query dump facts; errors carry err") {
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("kaput")
    val (out, errs) = run(Seq("ok_query" -> good, "broken_query" -> boom))
    val json = Verify.writeSummary(spark, out,
      Seq("ok_query", "broken_query"), errs)
    assert(Files.readString(Paths.get(s"$out/_summary.json")) == json)
    assert(json.contains("\"n_queries\": 2"))
    assert(json.contains("\"n_dumped\": 1"))
    assert(json.contains("\"n_failed\": 1"))
    // dumped query: row count, sorted column list, a value fingerprint
    val facts = Verify.dumpFacts(spark, s"$out/ok_query")
    assert(facts.rows == spark.read.parquet(s"$sfDir/region.parquet").count())
    assert(facts.cols == facts.cols.sorted)
    assert(json.contains(s"""\"rows\": ${facts.rows}"""))
    assert(json.contains(s"""\"hash\": \"${facts.hash}\""""))
    // the fingerprint is deterministic across readbacks
    assert(Verify.dumpFacts(spark, s"$out/ok_query").hash == facts.hash)
    // failed query: err recorded, no facts
    assert(json.contains("\"broken_query\": {\"err\": "))
    assert(json.contains("kaput"))
  }

  test("a query that breaks on rerun REPLACES its stale passing dump") {
    val out = Files.createTempDirectory("graft_verify_spec").toString
    assert(Verify.dumpQueries(spark, sfDir, out, Seq("q" -> good)).isEmpty)
    assert(new java.io.File(s"$out/q").isDirectory)
    val boom: (SparkSession, String) => DataFrame =
      (_, _) => throw new IllegalStateException("now broken")
    val errs = Verify.dumpQueries(spark, sfDir, out, Seq("q" -> boom))
    assert(errs.keySet == Set("q"))
    assert(!new java.io.File(s"$out/q").exists(),
      "stale passing dump survived a broken rerun")
    assert(Files.readString(Paths.get(s"$out/_errors.json"))
      .contains("now broken"))
  }
}
