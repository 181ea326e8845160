package graft.apps

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Layout

/** Runnable lakehouse-table lifecycle over the documents corpus — the
  * op136–op145 family as one spark-submit entry point, so the
  * Z-ordered store the library implements is operable standalone:
  *
  *   LakehouseJob <inputDir> <storeDir> [build|append|compact|snapshot|stats]
  *
  * `inputDir` must contain `documents.parquet` (doc_id, lang, n_chars,
  * ...). Actions:
  *  - `build`   (default): cluster the corpus by the (lang, length)
  *    Morton key into `storeDir` — key-sorted files, per-file manifest
  *    (zkey bounds, n_rows, dimension column stats, doc_id Bloom) —
  *    then commit snapshot 1.
  *  - `append`:  land the input as new key-sorted files + manifest
  *    rows (no rewrite) and commit a snapshot.
  *  - `compact`: expire all but the newest snapshot, rewrite the store
  *    into fresh range files (applying any tombstones), snapshot.
  *  - `snapshot`: commit a snapshot of the current metadata state.
  *  - `stats`:   print the manifest summary (files, rows, snapshots) —
  *    a metadata-only read.
  *
  * The dimension-id map is derived from the input's distinct langs
  * (ranked, broadcast back — never a corpus-wide window); a production
  * deployment pins the map across appends exactly as op142 does.
  */
object LakehouseJob {
  private val StatsCols = Seq("lang_id", "len_bucket")

  private def keyed(docs: DataFrame): DataFrame =
    Layout.denseDimIds(docs, "lang", "lang_id")
      .withColumn("len_bucket",
        least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
      .select(col("doc_id"), col("lang_id"), col("len_bucket"),
        col("n_chars"))

  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: LakehouseJob <inputDir> <storeDir> [build|append|compact|snapshot|stats]")
    val Array(in, store) = args.take(2)
    val action = if (args.length > 2) args(2) else "build"
    val spark = StediApps.session("graft-lakehouse")
    val zk = Layout.mortonKey(col("lang_id"), col("len_bucket"))
    def docs = spark.read.parquet(s"$in/documents.parquet")
    action match {
      case "build" =>
        Layout.writeClustered(keyed(docs), zk, numFiles = 8, path = store,
          bloomKey = Some("doc_id"), bloomExpectedPerFile = 1L << 16,
          statsCols = StatsCols)
        val c = Layout.commitSnapshot(spark, store)
        println(s"[lakehouse] built $store (snapshot $c)")
      case "append" =>
        Layout.appendClustered(keyed(docs), zk, numFiles = 4, path = store,
          bloomKey = Some("doc_id"), bloomExpectedPerFile = 1L << 16,
          statsCols = StatsCols)
        val c = Layout.commitSnapshot(spark, store)
        println(s"[lakehouse] appended into $store (snapshot $c)")
      case "compact" =>
        // compaction rewrites data files, stranding EVERY older
        // snapshot's file list — expire them all first (ids are never
        // reused: the high-water mark persists across expiry)
        Layout.expireSnapshots(spark, store, keepLast = 0)
        Layout.compactClustered(spark, store, numFiles = 8,
          bloomKey = Some("doc_id"), bloomExpectedPerFile = 1L << 16,
          statsCols = StatsCols)
        val c = Layout.commitSnapshot(spark, store)
        println(s"[lakehouse] compacted $store (snapshot $c)")
      case "snapshot" =>
        val c = Layout.commitSnapshot(spark, store)
        println(s"[lakehouse] snapshot $c at $store")
      case "stats" =>
        val m = spark.read.parquet(s"$store/_manifest")
        val row = m.agg(count(lit(1)), sum("n_rows")).head()
        println(s"[lakehouse] $store: ${row.getLong(0)} files, " +
          s"${row.getLong(1)} rows, snapshots " +
          s"${Layout.listSnapshots(spark, store).mkString("[", ", ", "]")}")
      case other =>
        throw new IllegalArgumentException(s"unknown action: $other")
    }
    spark.stop()
  }
}
