package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-layout operators: multi-dimensional clustering (Z-order) and the
  * clustered-write that turns it into file/row-group skipping.
  *
  * WHY (100 TB): a filter on `(lang, length-band)` over an unclustered
  * 100 TB corpus scans every file — min/max footer stats prune nothing
  * because every file spans every value. Interleaving the dimension bits
  * into one Morton key and range-partition-sorting the write makes each
  * output file cover a small hyper-rectangle of the dimension space, so
  * the SAME footer stats (or a lakehouse manifest's file-level min/max)
  * skip all but the files intersecting the predicate's rectangle. This
  * is the standard lakehouse `OPTIMIZE ... ZORDER BY` shape, expressed
  * as pure Column arithmetic (codegen'd; no UDF) + one range shuffle.
  *
  * The bit-interleave uses the classic mask-spread: 5 shift/and steps
  * per dimension, entirely in `bigint` space, so the identical
  * arithmetic runs on any SQL engine (the DuckDB oracle evaluates the
  * same five steps).
  */
object Layout {

  /** Spread the low 16 bits of a non-negative integral column across 32
    * bits (abcd → 0a0b0c0d): the standard mask-spread, 5 codegen'd
    * shift/and steps. Values are masked to 16 bits first — callers
    * bucket/cap their dimensions into [0, 65535]. */
  def spread16(c: Column): Column = {
    val x0 = c.cast("bigint").bitwiseAND(lit(0xFFFFL))
    val x1 = x0.bitwiseOR(shiftleft(x0, 8)).bitwiseAND(lit(0x00FF00FFL))
    val x2 = x1.bitwiseOR(shiftleft(x1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val x3 = x2.bitwiseOR(shiftleft(x2, 2)).bitwiseAND(lit(0x33333333L))
    x3.bitwiseOR(shiftleft(x3, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 2-D Morton (Z-order) key: interleave the low 16 bits of `a` (even
    * bit positions) and `b` (odd positions) into one 32-bit key whose
    * total order visits the (a, b) grid along the Z curve — nearby
    * cells get nearby keys, so range-partitioning the key co-locates
    * dimension rectangles. */
  def mortonKey(a: Column, b: Column): Column =
    spread16(a).bitwiseOR(shiftleft(spread16(b), 1))

  /** Driver-side reference of [[mortonKey]] for specs: same 5-step
    * spread on scala Longs. */
  def mortonKeyRef(a: Long, b: Long): Long = {
    def spread(v: Long): Long = {
      val x0 = v & 0xFFFFL
      val x1 = (x0 | (x0 << 8)) & 0x00FF00FFL
      val x2 = (x1 | (x1 << 4)) & 0x0F0F0F0FL
      val x3 = (x2 | (x2 << 2)) & 0x33333333L
      (x3 | (x3 << 1)) & 0x55555555L
    }
    spread(a) | (spread(b) << 1)
  }

  /** Clustered write: one range shuffle on the cluster key (sampled
    * range bounds → `numFiles` contiguous key ranges), key-sorted
    * within each file so row groups inside a file are tight too. The
    * key column is kept in the output, and a `_manifest` parquet
    * (file → min/max zkey) is written beside the data — the explicit
    * file-level min/max index a lakehouse table format (Delta/Iceberg)
    * maintains in its metadata layer. Building it is one column-pruned
    * scan of `zkey` grouped by file: cheap at any scale, and the
    * manifest itself is one row per FILE (100 TB / 128 MB ≈ 800k rows
    * — driver-trivial). */
  def writeClustered(df: DataFrame, zkey: Column, numFiles: Int,
      path: String, bloomKey: Option[String] = None,
      bloomExpectedPerFile: Long = 1L << 20,
      statsCols: Seq[String] = Nil): Unit = {
    df.withColumn("zkey", zkey)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("overwrite").parquet(s"$path/data")
    manifestFor(df.sparkSession, path, bloomKey, bloomExpectedPerFile,
      statsCols = statsCols)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** One manifest row per data file: RELATIVE file name (a manifest
    * with absolute paths breaks the moment the store is renamed or
    * relocated — tmp-publish builds, bucket moves; the reader
    * re-anchors), min/max zkey, and optionally a per-file Bloom filter
    * over `bloomKey` (a BIGINT column) — the lakehouse bloom-index
    * feature: point lookups on a column the Z-key does NOT cluster can
    * still skip files. Built as ONE grouped aggregate (min/max/bloom
    * partials merge map-side); restricting to `onlyFiles` scans just
    * those files (the append path). */
  private def manifestFor(spark: org.apache.spark.sql.SparkSession,
      path: String, bloomKey: Option[String], bloomExpected: Long,
      onlyFiles: Option[Seq[String]] = None,
      statsCols: Seq[String] = Nil): DataFrame = {
    val data = onlyFiles match {
      case Some(names) => spark.read.parquet(names.map(n => s"$path/data/$n"): _*)
      case None => spark.read.parquet(s"$path/data")
    }
    // per-file row count + per-column bounds (the Iceberg-style column
    // stats): what lets an aggregate over a contained file be answered
    // from METADATA — no scan (see countRectangleMeta)
    val boundsCols = Seq(min("zkey").as("min_zkey"), max("zkey").as("max_zkey"),
      count(lit(1)).as("n_rows")) ++
      statsCols.flatMap(c => Seq(min(c).as(s"min_$c"), max(c).as(s"max_$c")))
    val aggCols = boundsCols ++ bloomKey.map { k =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
      import org.apache.spark.sql.graftbridge.ColumnBridge
      val agg = new BloomFilterAggregate(
        ColumnBridge.expression(col(k).cast("bigint")),
        Literal(bloomExpected), Literal(bloomExpected * 10))
      ColumnBridge.column(agg.toAggregateExpression()).as("key_bloom")
    }
    data.groupBy(substring_index(input_file_name(), "/", -1).as("file"))
      .agg(aggCols.head, aggCols.tail: _*)
  }

  /** Candidate files for a point lookup `bloomKey == key`, planned
    * driver-side from the manifest's per-file Bloom filters — one
    * deserialize+probe per FILE (bounded metadata, the same cost class
    * as the Z-interval prune). No false negatives: every file that
    * holds the key is returned; false positives only cost an extra
    * file scan. The caller applies the exact predicate. */
  def readPointCandidates(spark: org.apache.spark.sql.SparkSession,
      path: String, key: Long): DataFrame = {
    val manifest = spark.read.parquet(s"$path/_manifest")
    require(manifest.schema.fieldNames.contains("key_bloom"),
      s"store at $path has no point index: it was written without " +
        "bloomKey (writeClustered/appendClustered must both pass it)")
    val files = manifest
      .select("file", "key_bloom").collect()
      .filter { r =>
        Option(r.getAs[Array[Byte]]("key_bloom")).exists { bytes =>
          org.apache.spark.util.sketch.BloomFilter
            .readFrom(new java.io.ByteArrayInputStream(bytes))
            .mightContainLong(key)
        }
      }
      .map(r => s"$path/data/${r.getString(0)}")
    if (files.isEmpty) readClustered(spark, path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Incremental append into a clustered store: the arrival batch is
    * range-partition-sorted on its own key distribution and lands as
    * NEW key-sorted files beside the existing ones, with their
    * [min,max] rows APPENDED to the manifest — no rewrite of existing
    * data or metadata, which is what makes continuous ingest into a
    * 100 TB Z-ordered table affordable (periodic re-clustering is a
    * separate compaction concern). New files are identified by a
    * driver-side listing diff (pure file-name metadata via the Hadoop
    * FS API — one row per file, the same cost class as the manifest
    * itself); only the new files are scanned for their key bounds. */
  def appendClustered(df: DataFrame, zkey: Column, numFiles: Int,
      path: String, bloomKey: Option[String] = None,
      bloomExpectedPerFile: Long = 1L << 20,
      statsCols: Seq[String] = Nil): Unit = {
    val spark = df.sparkSession
    def dataFiles(): Set[String] = {
      val p = new org.apache.hadoop.fs.Path(s"$path/data")
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.listStatus(p).map(_.getPath.getName)
        .filter(n => n.endsWith(".parquet") && !n.startsWith("_")).toSet
    }
    val before = dataFiles()
    df.withColumn("zkey", zkey)
      .repartitionByRange(numFiles, col("zkey"))
      .sortWithinPartitions("zkey")
      .write.mode("append").parquet(s"$path/data")
    val fresh = (dataFiles() -- before).toIndexedSeq.sorted
    if (fresh.nonEmpty)
      manifestFor(spark, path, bloomKey, bloomExpectedPerFile,
        onlyFiles = Some(fresh), statsCols = statsCols)
        .coalesce(1)
        .write.mode("append").parquet(s"$path/_manifest")
  }

  // ---- merge-on-read deletes (tombstones) ----

  private def tombstoneDir(path: String) = s"$path/_tombstones"

  private def hasTombstones(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombstoneDir(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Merge-on-read DELETE: the keys land as an appended tombstone
    * parquet (self-describing — its single column names the key), and
    * every `*Current` read anti-joins them out. Nothing in the data or
    * manifest is rewritten — deleting N keys from a 100 TB store costs
    * O(N), not a table rewrite; [[compactClustered]] later applies the
    * tombstones physically and clears them (merge-on-read → copy-on-
    * write at the maintenance cadence, the Delta/Iceberg deletion-
    * vector trade). */
  def deleteByKeys(keys: DataFrame, path: String): Unit = {
    require(keys.schema.fields.length == 1,
      "tombstones carry exactly one key column (its name binds the join)")
    keys.distinct().write.mode("append").parquet(tombstoneDir(path))
  }

  /** Anti-join the store's tombstones (if any) out of `df`. The join
    * key is read from the tombstone file's own column name. */
  private def minusTombstones(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, path: String): DataFrame =
    if (!hasTombstones(spark, path)) df
    else {
      val t = spark.read.parquet(tombstoneDir(path))
      df.join(t, Seq(t.schema.fields.head.name), "left_anti")
    }

  /** The store's CURRENT contents: data minus tombstoned keys. */
  def readCurrent(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    minusTombstones(spark, readClustered(spark, path), path)

  /** Manifest-pruned rectangle read of the CURRENT contents. */
  def readPrunedCurrent(spark: org.apache.spark.sql.SparkSession,
      path: String, aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame =
    minusTombstones(spark, readPruned(spark, path, aLo, aHi, bLo, bHi), path)

  // ---- merge-on-read upserts (row-level changelog) ----

  private def changesDir(path: String) = s"$path/_changes"

  private def hasChanges(spark: org.apache.spark.sql.SparkSession,
      path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(changesDir(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Merge-on-read UPSERT/DELETE: a change batch lands as an appended
    * parquet under `_changes` carrying the store's FULL data schema
    * plus `_op` ('U' upsert / 'D' delete; delete rows may leave the
    * non-key columns null) and a monotone `_seq` batch number assigned
    * here. Nothing in the data files or manifest is rewritten —
    * changing N rows of a 100 TB store costs O(N), the Hudi/Paimon
    * merge-on-read trade — and [[readMerged]] resolves latest-wins at
    * read time until [[compactClustered]] applies the changelog
    * physically. Within one batch the keys must be unique (enforced:
    * latest-wins needs a total order, and `_seq` only orders ACROSS
    * batches); across batches the later `_seq` wins, so a delete in
    * batch 3 overrides an upsert of the same key in batch 2 and vice
    * versa. Returns the batch's `_seq`. */
  def applyChanges(changes: DataFrame, keyCol: String, path: String): Long = {
    val spark = changes.sparkSession
    val dataCols = readClustered(spark, path).columns.toSet
    val got = changes.columns.toSet
    require(got == dataCols + "_op",
      s"change batch must carry the store's data schema + _op; " +
        s"missing ${(dataCols + "_op") -- got}, extra ${got -- dataCols -- Set("_op")}")
    require(changes.filter(!col("_op").isin("U", "D")).isEmpty,
      "_op must be 'U' or 'D'")
    // within-batch key uniqueness: one grouped count over the BATCH
    // (bounded by the change volume, not the store)
    require(changes.groupBy(col(keyCol)).count()
        .filter(col("count") > 1).isEmpty,
      s"change batch has duplicate $keyCol values: latest-wins is " +
        "undefined within one batch")
    val next =
      if (!hasChanges(spark, path)) 1L
      else spark.read.parquet(changesDir(path))
        .agg(max(col("_seq"))).head().getLong(0) + 1L
    changes.withColumn("_seq", lit(next))
      .write.mode("append").parquet(changesDir(path))
    next
  }

  /** The store's contents with the changelog applied: base data minus
    * tombstones, minus every changed key, plus the latest upsert image
    * per key (deletes win by absence). Latest-wins is ONE grouped
    * `max_by(struct(...), _seq)` over the changelog — shuffle bounded
    * by the change volume — plus one anti-join against the distinct
    * changed keys; the read amplification this adds is the standard
    * merge-on-read cost, paid until the next compaction applies the
    * changelog physically. */
  def readMerged(spark: org.apache.spark.sql.SparkSession, path: String,
      keyCol: String): DataFrame = {
    val cur = readCurrent(spark, path)
    if (!hasChanges(spark, path)) cur
    else {
      val ch = spark.read.parquet(changesDir(path))
      val others = ch.columns.filterNot(_ == keyCol).toIndexedSeq
      val latest = ch.groupBy(col(keyCol))
        .agg(max_by(struct(others.map(col): _*), col("_seq")).as("_w"))
        .select(col(keyCol) +: others.map(c => col("_w").getField(c).as(c)): _*)
      cur.join(ch.select(col(keyCol)).distinct(), Seq(keyCol), "left_anti")
        .unionByName(latest.filter(col("_op") === "U").drop("_op", "_seq"))
    }
  }

  // ---- snapshots / time travel ----

  private def commitsDir(path: String) = s"$path/_commits"

  private def fs(spark: org.apache.spark.sql.SparkSession, dir: String) = {
    val p = new org.apache.hadoop.fs.Path(dir)
    (p.getFileSystem(spark.sparkContext.hadoopConfiguration), p)
  }

  /** Commit the store's CURRENT metadata state as an immutable
    * snapshot and return its id (1, 2, …). A snapshot is a copy of the
    * manifest (one row per live file) plus the tombstone set if any —
    * pure metadata, the Delta-log/Iceberg-snapshot trade: versions
    * cost one manifest copy each, data files are shared across
    * versions. Valid for the append/delete lifecycle, where data
    * files are never removed; compaction rewrites data files and
    * therefore invalidates older snapshots (a lakehouse engine keeps
    * pre-compaction files until snapshot expiry — here, expire before
    * compacting). */
  def commitSnapshot(spark: org.apache.spark.sql.SparkSession,
      path: String): Long = {
    // ids come from a persisted high-water mark, NOT the surviving
    // snapshot list: after expiry an id must never be reused, or a
    // consumer pinned to the old id would silently read different data
    val hwmPath = new org.apache.hadoop.fs.Path(s"${commitsDir(path)}/HWM")
    val f = hwmPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val prev =
      if (!f.exists(hwmPath)) 0L
      else {
        val in = f.open(hwmPath)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        finally in.close()
      }
    val next = math.max(prev,
      listSnapshots(spark, path).lastOption.getOrElse(0L)) + 1
    val dir = s"${commitsDir(path)}/c=$next"
    spark.read.parquet(s"$path/_manifest")
      .coalesce(1).write.parquet(s"$dir/manifest")
    if (hasTombstones(spark, path))
      spark.read.parquet(tombstoneDir(path))
        .coalesce(1).write.parquet(s"$dir/tombstones")
    val out = f.create(hwmPath, /*overwrite=*/ true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    next
  }

  /** Snapshot ids present, ascending. */
  def listSnapshots(spark: org.apache.spark.sql.SparkSession,
      path: String): Seq[Long] = {
    val (f, p) = fs(spark, commitsDir(path))
    if (!f.exists(p)) Seq.empty
    else f.listStatus(p).map(_.getPath.getName)
      .collect { case n if n.startsWith("c=") => n.drop(2).toLong }
      .sorted.toIndexedSeq
  }

  /** Read the store AS OF a snapshot: exactly the files the snapshot's
    * manifest lists, minus the keys its tombstone set held at commit
    * time. Later appends and deletes are invisible — the reproducible-
    * pipeline contract (a training run pinned to snapshot N reads the
    * same corpus forever, while ingest continues on HEAD). */
  def readAsOf(spark: org.apache.spark.sql.SparkSession, path: String,
      commit: Long): DataFrame = {
    val dir = s"${commitsDir(path)}/c=$commit"
    val (f, p) = fs(spark, dir)
    require(f.exists(p),
      s"no snapshot c=$commit at $path (have: ${listSnapshots(spark, path).mkString(", ")})")
    val files = spark.read.parquet(s"$dir/manifest")
      .select("file").collect().map(r => s"$path/data/${r.getString(0)}")
    val data =
      if (files.isEmpty) readClustered(spark, path).limit(0)
      else spark.read.parquet(files.toIndexedSeq: _*)
    if (!f.exists(new org.apache.hadoop.fs.Path(s"$dir/tombstones"))) data
    else {
      val t = spark.read.parquet(s"$dir/tombstones")
      data.join(t, Seq(t.schema.fields.head.name), "left_anti")
    }
  }

  /** CDC diff between two snapshots, planned from METADATA — the
    * change-data-feed shape: inserted rows are read from exactly the
    * files ADDED between the snapshots (manifest set-diff, one row per
    * file), deleted rows from the FROM snapshot restricted to the
    * TOMBSTONE DELTA (broadcast — bounded by churn). The data read is
    * proportional to WHAT CHANGED, never to the store: diffing two
    * snapshots of a 100 TB table whose week added 1 TB reads ~1 TB
    * plus the deleted-key lookups. Valid for the append/delete
    * lifecycle; a compaction between the snapshots rewrites files and
    * is refused (its file lists no longer relate). Returns
    * (insertedRows, deletedRows) as full-schema DataFrames. */
  def snapshotDiff(spark: org.apache.spark.sql.SparkSession, path: String,
      from: Long, to: Long): (DataFrame, DataFrame) = {
    def manifestFiles(c: Long): Set[String] = {
      val dir = s"${commitsDir(path)}/c=$c/manifest"
      val (f, p) = fs(spark, dir)
      require(f.exists(p), s"no snapshot c=$c at $path")
      spark.read.parquet(dir).select("file").collect()
        .map(_.getString(0)).toSet
    }
    val fFrom = manifestFiles(from)
    val fTo = manifestFiles(to)
    require(fFrom.subsetOf(fTo),
      s"snapshots c=$from..c=$to at $path span a compaction (data files " +
        "were removed); CDC diff requires the append/delete lifecycle")
    def tombs(c: Long): Option[DataFrame] = {
      val dir = s"${commitsDir(path)}/c=$c/tombstones"
      val (f, p) = fs(spark, dir)
      if (f.exists(p)) Some(spark.read.parquet(dir)) else None
    }
    val newFiles = (fTo -- fFrom).toIndexedSeq.sorted
    val appended =
      if (newFiles.isEmpty) readClustered(spark, path).limit(0)
      else spark.read.parquet(newFiles.map(n => s"$path/data/$n"): _*)
    val tTo = tombs(to)
    // appended rows whose key was tombstoned by `to` never became
    // visible — not inserts
    val inserted = tTo.fold(appended) { t =>
      appended.join(t, Seq(t.schema.fields.head.name), "left_anti")
    }
    val deltaTombs = (tTo, tombs(from)) match {
      case (None, _) => None
      case (Some(t), None) => Some(t)
      case (Some(t), Some(t0)) =>
        Some(t.join(t0, Seq(t0.schema.fields.head.name), "left_anti"))
    }
    val deleted = deltaTombs match {
      case None => readAsOf(spark, path, from).limit(0)
      case Some(keys) =>
        // delta keys broadcast (churn-bounded); only rows LIVE at
        // `from` count as deletions
        readAsOf(spark, path, from).join(broadcast(keys.distinct()),
          Seq(keys.schema.fields.head.name), "left_semi")
    }
    (inserted, deleted)
  }

  /** Drop all but the newest `keepLast` snapshots (expiry). Data files
    * are untouched — in the append/delete lifecycle every file is
    * still referenced by the live manifest. */
  def expireSnapshots(spark: org.apache.spark.sql.SparkSession,
      path: String, keepLast: Int): Unit = {
    val ids = listSnapshots(spark, path)
    ids.dropRight(keepLast).foreach { c =>
      val (f, p) = fs(spark, s"${commitsDir(path)}/c=$c")
      f.delete(p, true): Unit
    }
  }

  /** Compaction: rewrite the store's accumulated files (base build +
    * appends) into `numFiles` freshly range-partitioned, key-sorted
    * files with a rebuilt manifest — the periodic maintenance step
    * that restores tight per-file key rectangles after incremental
    * ingest has fragmented them. One range shuffle of the CURRENT
    * store (not the original corpus); published by directory swap so
    * a crash mid-compact leaves the old store intact (readers in this
    * single-writer maintenance window are the caller's concern, as
    * with any lakehouse OPTIMIZE). Tombstoned rows are applied
    * PHYSICALLY here — the rewrite reads the current view — and the
    * tombstone set dies with the old directory in the swap. If the
    * store carries a changelog ([[applyChanges]]), pass `mergeKey`:
    * the rewrite reads [[readMerged]] instead, applying upserts and
    * deletes physically, and the changelog dies in the swap too. */
  def compactClustered(spark: org.apache.spark.sql.SparkSession,
      path: String, numFiles: Int, bloomKey: Option[String] = None,
      bloomExpectedPerFile: Long = 1L << 20,
      statsCols: Seq[String] = Nil,
      mergeKey: Option[String] = None): Unit = {
    require(mergeKey.isDefined || !hasChanges(spark, path),
      s"store at $path has a changelog: compaction without mergeKey " +
        "would silently drop its upserts/deletes")
    val tmp = s"$path.compacting-${ProcessHandle.current().pid()}"
    val current = mergeKey match {
      case Some(k) if hasChanges(spark, path) => readMerged(spark, path, k)
      case _ => readCurrent(spark, path)
    }
    // the stored zkey IS the cluster key (withColumn self-assign is a
    // no-op projection), so compaction never recomputes dimensions
    writeClustered(current, col("zkey"),
      numFiles, tmp, bloomKey, bloomExpectedPerFile, statsCols)
    // old snapshot dirs die with the swap (their file lists dangle —
    // callers expire before compacting), but the id high-water mark
    // must survive so post-compact snapshots never reuse an id
    val (cfs, hwm) = fs(spark, s"${commitsDir(path)}/HWM")
    if (cfs.exists(hwm))
      org.apache.hadoop.fs.FileUtil.copy(cfs, hwm, cfs,
        new org.apache.hadoop.fs.Path(s"${commitsDir(tmp)}/HWM"),
        /*deleteSource=*/ false, spark.sparkContext.hadoopConfiguration)
    def rmRf(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rmRf)); f.delete(): Unit
    }
    rmRf(new java.io.File(path))
    require(new java.io.File(tmp).renameTo(new java.io.File(path)),
      s"compaction publish failed for $path")
  }

  /** Planning result of a metadata-first rectangle count: how much was
    * answered scan-free. */
  case class RectCount(count: Long, metaOnlyFiles: Long, scannedFiles: Long)

  /** Metadata-first COUNT over a dimension rectangle — the Iceberg
    * "scan-free aggregation" shape: a file whose per-column bounds
    * (written by `statsCols`) lie ENTIRELY inside the rectangle
    * contributes its manifest `n_rows` without being opened; only
    * boundary files (bounds intersect but aren't contained) are
    * scanned with the exact predicate. At 100 TB a selective rectangle
    * over a well-clustered table answers almost entirely from the
    * one-row-per-file manifest — the scan cost is proportional to the
    * rectangle's BOUNDARY, not its volume. Requires a tombstone-free
    * store (metadata counts can't see row-level deletes; compact
    * first — the same rule lakehouse engines apply to stats-based
    * answers). */
  def countRectangleMeta(spark: org.apache.spark.sql.SparkSession,
      path: String, bounds: Seq[(String, Long, Long)]): RectCount = {
    require(bounds.nonEmpty, "give at least one (column, lo, hi) bound")
    require(!hasTombstones(spark, path),
      s"store at $path has tombstones: metadata counts would overcount " +
        "deleted rows — compact first")
    val intersects = bounds.map { case (c, lo, hi) =>
      col(s"min_$c") <= hi && col(s"max_$c") >= lo }.reduce(_ && _)
    val contained = bounds.map { case (c, lo, hi) =>
      col(s"min_$c") >= lo && col(s"max_$c") <= hi }.reduce(_ && _)
    val rows = spark.read.parquet(s"$path/_manifest")
      .filter(intersects)
      .select(col("file"), col("n_rows"), contained.as("contained"))
      .collect()
    val (full, boundary) = rows.partition(_.getBoolean(2))
    val scanned = if (boundary.isEmpty) 0L
    else spark.read.parquet(
        boundary.map(r => s"$path/data/${r.getString(0)}").toIndexedSeq: _*)
      .filter(bounds.map { case (c, lo, hi) =>
        col(c) >= lo && col(c) <= hi }.reduce(_ && _))
      .count()
    RectCount(full.map(_.getLong(1)).sum + scanned,
      full.length.toLong, boundary.length.toLong)
  }

  /** Full (unpruned) read of a clustered store. */
  def readClustered(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame = spark.read.parquet(s"$path/data")

  /** Schema-evolved read: resolves the UNION of every data file's
    * schema (parquet mergeSchema) and null-fills columns absent from
    * older files — the lakehouse ADD COLUMN contract: widening a
    * 100 TB table's schema rewrites nothing; old files simply lack the
    * column and read as null. (A lakehouse engine stores the merged
    * schema in table metadata; parquet footers carry the same
    * information here, at the cost of one footer read per file at
    * planning — bounded, file-count-sized metadata work. Plain
    * [[readClustered]] keeps single-footer planning for stores whose
    * schema never evolved.) */
  def readClusteredEvolved(spark: org.apache.spark.sql.SparkSession,
      path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(s"$path/data")

  /** Manifest-pruned rectangle read: keep only the files whose
    * [min_zkey, max_zkey] intersects the rectangle's Z interval, then
    * apply the exact rectangle predicate to what's left.
    *
    * Correctness: `mortonKey` is monotone in BOTH dimensions — the two
    * spreads occupy disjoint bit positions and each spread preserves
    * order — so every point of the rectangle `[aLo,aHi]×[bLo,bHi]`
    * has `zkey ∈ [morton(aLo,bLo), morton(aHi,bHi)]`. Pruning by that
    * interval is therefore conservative (never drops a matching row);
    * for Z-aligned rectangles it is also tight. The manifest filter is
    * driver-side metadata work on one-row-per-file data — exactly how
    * a lakehouse reader plans a scan from its manifest, made explicit.
    */
  def readPruned(spark: org.apache.spark.sql.SparkSession, path: String,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): DataFrame = {
    val zLo = mortonKeyRef(aLo, bLo)
    val zHi = mortonKeyRef(aHi, bHi)
    val files = spark.read.parquet(s"$path/_manifest")
      .filter(col("max_zkey") >= zLo && col("min_zkey") <= zHi)
      .select("file").collect().map(r => s"$path/data/${r.getString(0)}")
    if (files.isEmpty) readClustered(spark, path).limit(0)
    else spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Dense ids for a LOW-CARDINALITY dimension column, scale-shaped:
    * rank the DISTINCT values (a tiny relation — the window's global
    * order is over the dimension's cardinality, not the corpus), then
    * broadcast the id map back onto the corpus. Never a corpus-wide
    * window. */
  def denseDimIds(df: DataFrame, dim: String, idCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col(dim))
    val ids = df.select(col(dim)).distinct()
      .withColumn(idCol, (dense_rank().over(w) - 1).cast("bigint"))
    df.join(broadcast(ids), dim)
  }
}
