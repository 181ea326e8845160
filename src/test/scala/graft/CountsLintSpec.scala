package graft

import org.scalatest.funsuite.AnyFunSuite

/** COUNTS.json is generated from the live SparkEntry maps
  * (`sbt runMain graft.tools.Counts`) but committed as a file — which
  * drifted in r10 (said 273 while SparkEntry had 275). This lint makes
  * the drift unreintroducible: adding/removing a query without
  * regenerating the artifact fails the suite. Pure file/map check, no
  * Spark session. */
class CountsLintSpec extends AnyFunSuite {

  private def field(json: String, key: String): String = {
    val m = ("\"" + key + "\":(\\d+|\\[[^\\]]*\\])").r
      .findFirstMatchIn(json)
    assert(m.isDefined, s"COUNTS.json missing field $key")
    m.get.group(1)
  }

  test("COUNTS.json matches the live SparkEntry inventory") {
    val json = java.nio.file.Files.readString(
      java.nio.file.Paths.get("COUNTS.json"))
    val qs = SparkEntry.queries
    val os = SparkEntry.oracleSql
    assert(field(json, "queries") == qs.size.toString,
      s"COUNTS.json queries=${field(json, "queries")} but SparkEntry has " +
        s"${qs.size} — rerun `sbt \"runMain graft.tools.Counts\"`")
    assert(field(json, "oracles") == os.size.toString,
      s"COUNTS.json oracles stale — rerun graft.tools.Counts")
    assert(field(json, "rows_only") == (qs.keySet -- os.keySet).size.toString,
      s"COUNTS.json rows_only stale — rerun graft.tools.Counts")
    assert((os.keySet -- qs.keySet).isEmpty,
      s"oracleSql keys without queries: ${os.keySet -- qs.keySet}")
  }
}
