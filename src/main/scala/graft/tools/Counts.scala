package graft.tools

/** Emits COUNTS.json — the query/oracle inventory the docs cite, read
  * off the LIVE `SparkEntry` maps instead of hand-maintained numbers
  * (SURVEY/README counts drifted twice in round 5). No Spark session:
  * the maps are plain data. Run via `sbt "runMain graft.tools.Counts"`
  * after adding/removing a query; SURVEY §8 and README point here. */
object Counts {
  def main(args: Array[String]): Unit = {
    val qs = graft.SparkEntry.queries
    val os = graft.SparkEntry.oracleSql
    val rowsOnly = qs.keySet -- os.keySet
    val orphans = os.keySet -- qs.keySet
    require(orphans.isEmpty, s"oracleSql keys without queries: $orphans")
    val json =
      s"""{"queries":${qs.size},"oracles":${os.size},""" +
        s""""rows_only":${rowsOnly.size},""" +
        s""""rows_only_keys":${rowsOnly.toSeq.sorted
          .map("\"" + _ + "\"").mkString("[", ",", "]")},""" +
        s""""generated_by":"sbt runMain graft.tools.Counts"}"""
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("COUNTS.json"), json + "\n")
    println(json)
  }
}
