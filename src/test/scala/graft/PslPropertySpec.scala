package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.Urls
import graft.queries.WebQueries

/** r16 (verdict item 7): the PRODUCTION-SWAP property for the PSL
  * registered-domain machinery — the three Spark spellings (when-chain,
  * one-node expression, broadcast-dim join) and the generated oracle
  * CASE must agree on RANDOM rule tables carrying all three PSL rule
  * forms (plain, `*.` wildcard, `!` exception) over random hosts, not
  * just the fixture slice. A swap to the full ~9k-rule real PSL changes
  * only the table; this suite documents that the semantics carry.
  *
  * ≥1k generated (psl, host) cases, batched one DataFrame per PSL draw
  * (the PropertySpec pattern — per-case Spark jobs would be thousands).
  * The oracle CASE leg runs through Spark SQL with DuckDB's
  * `regexp_matches` mapped to Spark's `regexp_like` (both are
  * partial-match) and `escapedStringLiterals=true` so the generated
  * `\.` regexes parse verbatim as they do in DuckDB's single-quoted
  * strings; the actual-DuckDB leg stays op317's oracle gate. Host
  * grammar: non-empty labels (the declared equivalence domain —
  * WebSpec pins the malformed-host edges for chain vs expression
  * separately). */
class PslPropertySpec extends SparkSpec {
  import spark.implicits._

  private val labelGen: Gen[String] =
    Gen.oneOf("a", "b", "co", "uk", "io", "x", "net", "k")

  private def joinLabels(n: Gen[Int]): Gen[String] =
    n.flatMap(k => Gen.listOfN(k, labelGen).map(_.mkString(".")))

  private val ruleGen: Gen[String] = Gen.frequency(
    5 -> joinLabels(Gen.chooseNum(1, 3)),
    3 -> joinLabels(Gen.chooseNum(1, 2)).map("*." + _),
    2 -> joinLabels(Gen.chooseNum(2, 3)).map("!" + _))

  private val pslGen: Gen[Seq[String]] =
    Gen.chooseNum(3, 8).flatMap(n => Gen.listOfN(n, ruleGen))
      .map(_.distinct)

  /** Hosts biased toward MATCHING the drawn rules: a rule body (its
    * `*` re-drawn as a concrete label) with 0–2 labels prepended, or a
    * fully random host. */
  private def hostGen(psl: Seq[String]): Gen[String] = {
    val fromRule = for {
      r <- Gen.oneOf(psl)
      wild <- labelGen
      pre <- joinLabels(Gen.chooseNum(0, 2))
    } yield {
      val body = r.stripPrefix("!").replace("*", wild)
      if (pre.isEmpty) body else s"$pre.$body"
    }
    Gen.frequency(3 -> fromRule, 1 -> joinLabels(Gen.chooseNum(1, 4)))
  }

  private def samples[T](g: Gen[T], seed: Seed, n: Int): Seq[T] =
    Iterator.iterate(seed)(_.next).take(n * 3)
      .flatMap(s => g.apply(Gen.Parameters.default, s))
      .take(n).toSeq

  test("property: when-chain == expression == broadcast-join == oracle " +
      "CASE on random PSLs (>=1k cases)") {
    val prevEsc = spark.conf.getOption("spark.sql.parser.escapedStringLiterals")
    spark.conf.set("spark.sql.parser.escapedStringLiterals", "true")
    try {
      var cases = 0
      val dumped = scala.collection.mutable.ArrayBuffer
        .empty[(Seq[String], Seq[(String, String)])]
      val psls = samples(pslGen, Seed(20260816L), 30)
      psls.zipWithIndex.foreach { case (psl, i) =>
        val hosts =
          samples(hostGen(psl), Seed(1000L + i), 60).distinct
        cases += hosts.size
        val docs = hosts.zipWithIndex
          .map { case (h, j) => (j.toLong, h) }.toDF("doc_id", "host")
        // three columnar spellings in ONE projection/collect
        import org.apache.spark.sql.graftbridge.ColumnBridge
        val exprNode = ColumnBridge.column(
          graft.expressions.RegisteredDomainPsl(
            ColumnBridge.expression(col("host")), psl))
        val sqlCase = Urls.registeredDomainPslSql("host", psl)
          .replace("regexp_matches(", "regexp_like(")
        val rows = docs.select(col("doc_id"), col("host"),
          Urls.registeredDomainPsl(col("host"), psl).as("chain"),
          exprNode.as("en"),
          expr(sqlCase).as("oracle_case")).collect()
        rows.foreach { r =>
          val (h, c, e, o) =
            (r.getString(1), r.getString(2), r.getString(3), r.getString(4))
          assert(c == e && c == o,
            s"PSL=${psl.mkString(",")} host=$h: chain=$c expr=$e oracle=$o")
        }
        dumped += psl ->
          rows.map(r => (r.getString(1), r.getString(2))).toSeq
        // the broadcast-join spelling over the same table
        val viaJoin = WebQueries
          .registeredDomainJoinSpelling(spark, docs, psl)
          .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
        rows.foreach { r =>
          val want = r.getString(2)
          val got = viaJoin(r.getLong(0))
          assert(got == want,
            s"PSL=${psl.mkString(",")} host=${r.getString(1)}: " +
              s"join=$got chain=$want")
        }
      }
      assert(cases >= 1000, s"only $cases generated cases — raise the draw")
      info(s"$cases (psl, host) cases across ${psls.size} random PSLs")
      // side artifact for the ACTUAL-DuckDB leg: every (psl, host,
      // expected) plus the generated CASE SQL, consumed by
      // tools/check_psl_duckdb.py (the in-suite oracle-CASE leg runs
      // through Spark SQL with regexp_like substituted; the dump lets
      // real DuckDB replay the identical draws)
      try {
        val sb = new StringBuilder
        def jq(s: String) =
          "\"" + s.flatMap {
            case '"' => "\\\""; case '\\' => "\\\\"
            case c if c < ' ' => f"\\u${c.toInt}%04x"
            case c => c.toString
          } + "\""
        dumped.foreach { case (psl, pairs) =>
          val hostsJson = pairs.map(p => jq(p._1)).mkString("[", ",", "]")
          val wantJson = pairs.map(p => jq(p._2)).mkString("[", ",", "]")
          sb.append(s"""{"sql": ${jq(
            Urls.registeredDomainPslSql("host", psl))}, """ +
            s""""hosts": $hostsJson, "want": $wantJson}""").append('\n')
        }
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get("/tmp/psl_property_cases.jsonl"),
          sb.toString)
      } catch { case e: Throwable =>
        info(s"duckdb-leg dump skipped: ${e.getMessage}")
      }
    } finally {
      prevEsc match {
        case Some(v) =>
          spark.conf.set("spark.sql.parser.escapedStringLiterals", v)
        case None =>
          spark.conf.unset("spark.sql.parser.escapedStringLiterals")
      }
    }
  }
}
