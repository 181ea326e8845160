package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench regression radar's math — the r5 artifact shipped 17
  * false regressions because the measurement loop couldn't defend
  * against a contention window; the radar's normalization and gating
  * are now pure functions this spec holds in place. No Spark session.
  */
class BenchRadarSpec extends AnyFunSuite {

  test("suite-median ratio normalizes uniform machine-speed drift") {
    // every query uniformly 1.5x slower: median ratio 1.5, and nothing
    // clears the 2x-relative gate — a raw 2x gate would flag q3/q4
    val prev = Map("q1" -> 1.0, "q2" -> 2.0, "q3" -> 0.4, "q4" -> 0.3)
    val now = prev.toSeq.map { case (k, v) => k -> v * 1.5 }
    val med = Bench.suiteMedianRatio(now, prev)
    assert(math.abs(med - 1.5) < 1e-9)
    assert(Bench.flagged(now, prev, med).isEmpty)
  }

  test("a true outlier is flagged; small absolute growth is not") {
    val prev = Map("q1" -> 1.0, "q2" -> 1.0, "q3" -> 1.0, "q4" -> 0.1,
      "q5" -> 0.5, "q6" -> 2.0)
    // q3 is 4x slower (real regression); q4 is ~4x slower but grew only
    // 0.29s (absolute floor holds it back); the rest anchor the median
    val now = Seq("q1" -> 1.0, "q2" -> 1.1, "q3" -> 4.0, "q4" -> 0.39,
      "q5" -> 0.5, "q6" -> 1.9)
    val med = Bench.suiteMedianRatio(now, prev)
    val hits = Bench.flagged(now, prev, med)
    assert(hits.map(_._1) == Seq("q3"), s"got $hits")
    val (_, p, t) = hits.head
    assert(p == 1.0 && t == 4.0)
  }

  test("queries without a previous measurement never flag") {
    val prev = Map("q1" -> 1.0)
    val now = Seq("q1" -> 1.0, "qNew" -> 99.0)
    assert(Bench.flagged(now, prev, Bench.suiteMedianRatio(now, prev)).isEmpty)
  }

  test("every query key matches the radar's artifact-parser pattern") {
    // Bench recovers the previous round's per-query map with the regex
    // op[a-z0-9_]+ — a key outside that shape (uppercase, no op prefix)
    // would silently vanish from regression tracking
    val pat = "^op[0-9]+[a-z0-9_]*$".r
    val bad = SparkEntry.queries.keys.filterNot(k =>
      pat.findFirstIn(k).isDefined)
    assert(bad.isEmpty, s"keys invisible to the radar parser: $bad")
    // and every oracle key names a real query (the Counts tool's
    // invariant, held in-suite)
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
  }

  test("expected-growth carry: active until the prev artifact includes " +
      "the growth, then retired") {
    // r16, verdict item 6: r15's op321 structural growth was correctly
    // pre-adjudicated but only in prose — the radar needed a
    // machine-readable carry so the flag lands under expected_growth
    // exactly once and never becomes a standing mute.
    val txt =
      """[{"query":"op9_a","round":16,"note":"resolver added"},
        | {"query":"op9_b", "round": 15, "note": "older growth"}]"""
        .stripMargin
    val parsed = Bench.parseExpectedGrowth(txt)
    assert(parsed == Map("op9_a" -> (16, "resolver added"),
      "op9_b" -> (15, "older growth")))
    // prev artifact = r15: the r16 entry is active, the r15 one retired
    // (BENCH_r15 already measured that growth)
    assert(Bench.activeExpectedGrowth(parsed, 15) ==
      Map("op9_a" -> "resolver added"))
    // prev artifact = r16: both retired — the carry is consumed once
    assert(Bench.activeExpectedGrowth(parsed, 16).isEmpty)
    // no file / empty text: no entries, radar unchanged
    assert(Bench.parseExpectedGrowth("").isEmpty)
  }

  test("median is the upper-middle order statistic (matches the loop's pick)") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(4.0, 1.0, 2.0, 3.0)) == 3.0)
    assert(Bench.median(Seq(7.0)) == 7.0)
  }

  test("noise spread is max/min, degenerate inputs read as 1.0") {
    assert(math.abs(Bench.spread(Seq(0.2, 0.3, 0.25)) - 1.5) < 1e-9)
    assert(Bench.spread(Seq(5.0)) == 1.0)          // one sample: no spread
    assert(Bench.spread(Seq.empty) == 1.0)
    assert(Bench.spread(Seq(0.0, 2.0)) == 1.0)     // failed canary timing
  }

  test("noise assessment: any spread past its band reads contended") {
    // bands: short fixed-overhead canary 2x (round-7 quiet-box
    // measurements), mid-weight scan+shuffle canary 1.6x (the r10
    // contention sensor — the cheap canary sat still while contention
    // doubled shuffle-heavy queries), whole-pass totals 1.3x
    assert(Bench.noiseAssessment(1.9, 1.5, 1.25) == "quiet")
    assert(Bench.noiseAssessment(2.5, 1.0, 1.0) == "contended") // canary hit
    assert(Bench.noiseAssessment(1.0, 1.7, 1.0) == "contended") // mid hit
    assert(Bench.noiseAssessment(1.0, 1.0, 1.5) == "contended") // pass hit
    assert(Bench.noiseAssessment(2.0, 1.6, 1.3) == "quiet")     // at the edge
  }

  test("end-of-suite retry: a transient failure recovers, a deterministic " +
      "one stays errored (r15, verdict item 3)") {
    val errors = scala.collection.mutable.LinkedHashMap(
      "op_transient" -> "SparkException: shuffle fetch failed",
      "op_broken" -> "IllegalStateException: invariant broken")
    val recorded = scala.collection.mutable.Map.empty[String, Double]
    val ok = Bench.applyRetry(errors,
      retry = n => if (n == "op_transient") Some(1.25) else None,
      record = (n, t) => { recorded(n) = t; () })
    // the transient query rejoined the healthy set with its clean
    // single measurement; the deterministic one kept its message
    assert(ok == Seq("op_transient"))
    assert(recorded == Map("op_transient" -> 1.25))
    assert(errors.keySet == Set("op_broken"))
    assert(errors("op_broken").contains("invariant broken"))
    // nothing errored: no retries attempted, nothing recorded
    val none = scala.collection.mutable.LinkedHashMap.empty[String, String]
    assert(Bench.applyRetry(none, _ => Some(9.9),
      (_, _) => fail("record on empty errors")).isEmpty)
  }

  test("compact error entries carry the truncated first message, capped, " +
      "JSON-escaped") {
    val errs = Seq(
      "op_a" -> ("boom \"quoted\"\nline2\t" + "x" * 300),
      "op_b" -> "plain",
      "op_c" -> "third",
      "op_d" -> "fourth",
      "op_e" -> "fifth (past the cap)")
    val json = Bench.errorsJson(errs, cap = 4, msgLen = 120)
    // parses as JSON: balanced quoting/escaping even with ", \n, \t
    assert(json.startsWith("""[{"q":"op_a","msg":"boom \"quoted\"\nline2\t"""))
    assert(!json.contains("op_e"), "cap not applied")
    assert(json.contains("op_d"))
    // truncation: the 300-char tail is cut at msgLen characters
    val msg = json.split("\"msg\":\"")(1).split("\"}")(0)
    assert(msg.length <= 120 + 10, s"message not truncated: ${msg.length}")
    // control chars below 0x20 escape as \u00XX
    assert(Bench.jsonStr("ab") == "\"a\\u0001b\"")
    assert(Bench.errorsJson(Seq.empty, 4, 120) == "[]")
    // the budget is in ESCAPED characters (r15 review: truncating
    // before escaping let a control-char-heavy message expand 6x past
    // the tail window): 50 control chars escape to 300 - bounded to
    // <=120 on WHOLE escape sequences + the 1-char truncation marker
    // (r16 advice: a capped message must be visibly distinct from a
    // complete one when self-diagnosing from the artifact), still
    // valid JSON
    val heavy = Bench.jsonStrBounded("\u0001" * 50, 120)
    assert(heavy.length - 3 <= 120 && (heavy.length - 3) % 6 == 0,
      s"escaped budget violated or mid-escape cut: ${heavy.length}")
    assert(heavy.drop(1).dropRight(1).matches("(\\\\u0001)+…"))
    // a message WITHIN the budget carries no marker
    assert(Bench.jsonStrBounded("short", 120) == "\"short\"")
  }
}
