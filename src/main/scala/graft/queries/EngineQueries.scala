package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Det.{big, ordered}

/** Engine-infrastructure pack: the SHUFFLE-ELIMINATION access paths a
  * 100 TB deployment stands on — bucketed co-located fact⋈fact joins
  * (no exchange on either side at plan time) and dynamic partition
  * pruning (the fact scan planned from the dim filter at run time).
  *
  * Both operators follow the lakehouse-store pattern of op137–op147:
  * the FIRST call per dataset materializes the physical layout under
  * the content-keyed cache (`IndexStore.indexRoot` /
  * `buildIndexIfAbsent` — atomic publish, racer-safe), every later
  * call exercises only the read path the layout exists for. The DuckDB
  * oracle computes the same aggregate from the raw unbucketed /
  * unpartitioned table, proving each layout lossless.
  */
object EngineQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Bucket count for the co-located join store. 8 buckets at test SF;
    * at 100 TB the same layout holds with O(thousands) of buckets —
    * the invariants (hash(key) pmod n on both sides, one sorted file
    * per bucket per write) are bucket-count-independent. */
  private val nBuckets = 8

  // ---------------------------------------------------------------- op264

  /** A collision-safe catalog suffix for a store dir: session catalogs
    * are per-JVM, store dirs are per-(dataset content), so the table
    * NAME must encode the dir it points at. */
  private def catalogSuffix(dir: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(dir.getBytes("UTF-8")).take(4).map(b => f"$b%02x").mkString

  /** Build-once bucketed twin tables: orders and lineitem, both hashed
    * into [[nBuckets]] buckets on the ORDER KEY with exactly ONE
    * key-sorted file per bucket.
    *
    * One file per bucket is what lets the reader recognize the data as
    * both partitioned AND sorted, eliminating the join's Sort as well
    * as its Exchange. It is guaranteed here, not hoped for:
    * `repartition(n, key)` uses the same murmur3-pmod-n function as
    * the bucket-id assignment, so each write task holds exactly one
    * bucket's rows and emits exactly one file. At production bucket
    * counts the identical alignment holds — the write is one shuffle,
    * ever, amortized over every subsequent co-located join.
    *
    * `saveAsTable` (required for bucket-encoded file names) registers
    * a throwaway catalog entry pointing at the build's private tmp dir;
    * it is dropped before publish, and each SESSION re-registers the
    * published dir via `CREATE TABLE ... CLUSTERED BY` DDL — the
    * catalog entry is metadata only, the store is the files. */
  private def bucketStoreDir(s: SparkSession, d: String): String = {
    // BOTH materialized tables are fingerprinted in the cache key:
    // regenerating either fixture in place invalidates the store
    // (single-table keying would silently serve stale orders data).
    val dir = IndexStore.indexRootMulti(d, "bucketed_ok_v1",
      tables = Seq("orders", "lineitem"))
    IndexStore.buildIndexIfAbsent(dir, "lineitem_b") { tmp =>
      val nonce = s"graft_buckbuild_${System.nanoTime()}"
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority"))
        .repartition(nBuckets, col("o_orderkey"))
        .write.bucketBy(nBuckets, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/orders_b").saveAsTable(s"${nonce}_o")
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_extendedprice"))
        .repartition(nBuckets, col("l_orderkey"))
        .write.bucketBy(nBuckets, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem_b").saveAsTable(s"${nonce}_l")
      s.sql(s"DROP TABLE IF EXISTS ${nonce}_o")
      s.sql(s"DROP TABLE IF EXISTS ${nonce}_l")
      ()
    }
    dir
  }

  /** Session-idempotent registration of the published bucketed store;
    * returns the (orders, lineitem) table names. */
  private[graft] def bucketedTables(s: SparkSession, d: String)
      : (String, String) = {
    val dir = bucketStoreDir(s, d)
    val sfx = catalogSuffix(dir)
    val (ot, lt) = (s"graft_buck_orders_$sfx", s"graft_buck_lineitem_$sfx")
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $ot (
         |  o_orderkey BIGINT, o_orderpriority STRING)
         |USING PARQUET
         |CLUSTERED BY (o_orderkey) SORTED BY (o_orderkey)
         |INTO $nBuckets BUCKETS
         |LOCATION '$dir/orders_b'""".stripMargin)
    s.sql(
      s"""CREATE TABLE IF NOT EXISTS $lt (
         |  l_orderkey BIGINT, l_extendedprice DOUBLE)
         |USING PARQUET
         |CLUSTERED BY (l_orderkey) SORTED BY (l_orderkey)
         |INTO $nBuckets BUCKETS
         |LOCATION '$dir/lineitem_b'""".stripMargin)
    (ot, lt)
  }

  /** op264: bucketed co-located fact⋈fact join — lineitem ⋈ orders on
    * the order key where BOTH sides are big (the case `broadcast()`
    * cannot save), joined through the prebuilt bucketed store so the
    * join plans with ZERO Exchange and ZERO Sort on either side
    * (EngineSpec pins the plan). This is the one join shape where
    * Spark's answer to "the shuffle becomes the bottleneck at 100 TB"
    * is to not shuffle at all: hash(key) pmod n was paid once at write
    * time and every subsequent join of the two stores reuses it.
    *
    * At test SF Catalyst may legitimately pick a broadcast join
    * instead (15k orders fit the threshold) — the RESULT is identical
    * either way and the oracle checks the result; the no-exchange SMJ
    * contract is pinned where it is load-bearing, in the spec, with
    * broadcast disabled the way a 100 TB side disables itself.
    * Exchange elimination is unconditional; eliminating the residual
    * per-bucket Sort additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` (off by
    * default since 3.0 because verifying one-file-per-bucket is
    * expensive on huge listings — this store guarantees it by
    * construction, so a deployment of these stores turns it on). */
  val op264BucketedJoin: Q = (s, d) => {
    val (ot, lt) = bucketedTables(s, d)
    val o = s.table(ot)
    val l = s.table(lt)
    ordered(
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(big(count(lit(1))).as("n_lines"),
          Det.centsSum(col("l_extendedprice")).as("price_cents")),
      "o_orderpriority")
  }

  // ---------------------------------------------------------------- op265

  /** op265 dim filter: one quarter of the fact's ship months. */
  private val dppQuarter = "1995-Q2"

  /** Build-once month-partitioned fact store + its derived month
    * dimension: lineitem written `partitionBy(ship_month)` (83
    * directory partitions at any SF — the partition COUNT scales with
    * the time domain, not the data), and a months dim (month →
    * quarter) materialized beside it as one tiny parquet. */
  private def dppStoreDir(s: SparkSession, d: String): String = {
    val dir = IndexStore.indexRoot(d, "dpp_month_v1", table = "lineitem")
    IndexStore.buildIndexIfAbsent(dir, "months") { tmp =>
      val fact = Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_extendedprice"),
          date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      fact.write.partitionBy("ship_month").mode("overwrite")
        .parquet(s"$tmp/fact")
      fact.select(col("ship_month").as("month")).distinct()
        .withColumn("q", expr(
          "concat(substring(month, 1, 4), '-Q', " +
            "(cast(substring(month, 6, 2) AS BIGINT) + 2) div 3)"))
        .coalesce(1).write.mode("overwrite").parquet(s"$tmp/months")
      ()
    }
    dir
  }

  /** op265: dynamic partition pruning — the month-partitioned fact
    * joined to its month dimension filtered to ONE quarter. The fact
    * scan's partition filter is not knowable at plan time (the
    * qualifying months live in the dim), so Catalyst plants a
    * `dynamicpruning` subquery on the fact scan and reuses the dim's
    * broadcast to evaluate it at run time: 3 of 83 partition
    * directories are read, the other 80 never open (EngineSpec pins
    * the `dynamicpruning` partition filter and the 3-partition scan).
    *
    * 100 TB shape: this is THE mechanism that makes star-schema
    * queries scan-bounded by the dim predicate instead of the fact
    * size — same plan, 1000 executors, still 3/83 of the bytes. */
  val op265DppScan: Q = (s, d) => {
    val dir = dppStoreDir(s, d)
    val fact = s.read.parquet(s"$dir/fact")
    val dim = s.read.parquet(s"$dir/months").where(col("q") === dppQuarter)
    ordered(
      fact.join(dim, fact("ship_month") === dim("month"))
        .groupBy("month")
        .agg(big(count(lit(1))).as("n_lines"),
          Det.centsSum(col("l_extendedprice")).as("price_cents")),
      "month")
  }

  /** Compact a (possibly multi-file-per-bucket) bucketed table back to
    * exactly ONE key-sorted file per bucket, publishing the rewrite at
    * `destPath`/`destTable`.
    *
    * The production story behind op264's one-file guarantee: the
    * guarantee holds by construction at WRITE time, but appends are
    * bucket-ALIGNED, not file-merged — each appended batch adds one
    * more file per bucket. Multi-file buckets keep the Exchange
    * elimination (hash(key) pmod n still holds per file, so the scan's
    * output PARTITIONING survives any number of appends) but break the
    * sorted-scan precondition (`outputOrdering` needs one file per
    * bucket: two sorted files are not one sorted run), so the join's
    * per-bucket Sort reappears. This rewrite is the bucketed-store
    * analogue of op141's clustered-store compaction and follows
    * op146's merge-on-read conventions: stores are immutable dirs, the
    * compacted copy is written BESIDE the old one, and the catalog
    * swap is the atomic step — in-flight readers of the old dir are
    * untouched. One shuffle, amortized over every post-compaction
    * join/aggregate, exactly like the original write. */
  private[graft] def compactBucketed(s: SparkSession, srcTable: String,
      nBuckets: Int, key: String, destPath: String,
      destTable: String): Unit = {
    // read the source as PLAIN files for the rewrite: with bucketed
    // reading on, the scan already reports hash(key) pmod n and the
    // repartition is elided as redundant — leaving per-FILE partitions,
    // so a 2-file bucket would be rewritten as 2 files and the
    // compaction would compact nothing. The raw scan forces the one
    // real shuffle this rewrite is supposed to pay.
    val prev = s.conf.get("spark.sql.sources.bucketing.enabled")
    s.conf.set("spark.sql.sources.bucketing.enabled", "false")
    try s.table(srcTable).repartition(nBuckets, col(key))
      .write.bucketBy(nBuckets, key).sortBy(key)
      .option("path", destPath).saveAsTable(destTable)
    finally s.conf.set("spark.sql.sources.bucketing.enabled", prev)
  }

  // ---------------------------------------------------------------- op266

  /** Run `body` under the given session confs, restoring the previous
    * values afterwards. Anything the body returns must be MATERIALIZED
    * inside the window (localCheckpoint) — a lazy plan would re-optimize
    * after the restore and silently lose the pinned behavior. */
  private def withConfs[A](s: SparkSession, pairs: (String, String)*)(
      body: => A): A = {
    val prev = pairs.map { case (k, _) =>
      k -> (try Some(s.conf.get(k)) catch { case _: Exception => None })
    }
    pairs.foreach { case (k, v) => s.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None)    => s.conf.unset(k)
    }
  }

  /** op266's selective dim predicate: ~2% of parts qualify. */
  private val bloomDimPred = "p_size <= 1"

  /** The unmaterialized join op266 runs: lineitem ⋈ (part WHERE
    * [[bloomDimPred]]) — exposed so EngineSpec can pin the
    * `might_contain` runtime filter in the plan. */
  private[graft] def bloomJoin(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.part(s, d).where(expr(bloomDimPred))
      .select(col("p_partkey"), col("p_brand"))
    val fact = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_extendedprice"))
    fact.join(dim, fact("l_partkey") === dim("p_partkey"))
      .groupBy("p_brand")
      .agg(big(count(lit(1))).as("n_lines"),
        Det.centsSum(col("l_extendedprice")).as("price_cents"))
  }

  /** op266: runtime Bloom-filter join pruning — the UNPARTITIONED-fact
    * complement of op265's DPP: when the fact carries no partition
    * column to prune by, Catalyst's `InjectRuntimeFilter` builds a
    * Bloom filter from the dim's selective side (one `bloom_filter_agg`
    * subquery over ~2% of parts) and plants `might_contain(...)` on
    * the FACT side of the join, so ~98% of fact rows die at the scan's
    * filter instead of crossing the shuffle. The confs pin the
    * 100 TB geometry at test SF: broadcast off (a 100 TB fact⋈big-dim
    * join is SMJ — exactly when the runtime filter pays), application
    * threshold 0 (the "is the fact big enough to bother" guard, met
    * trivially at 100 TB). The result is materialized inside the conf
    * window; EngineSpec pins `might_contain` in the physical plan.
    *
    * 100 TB shape: the filter costs one aggregate over the FILTERED
    * dim (broadcast-sized by the same selectivity that makes it worth
    * building) and removes the dominant cost — shuffling never-joining
    * fact rows. With op264 (pre-bucketed) and op265 (partition-pruned)
    * this completes the three shuffle-avoidance regimes a star join
    * can land in. */
  val op266RuntimeBloom: Q = (s, d) =>
    withConfs(s,
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      ordered(bloomJoin(s, d).localCheckpoint(), "p_brand")
    }

  // ---------------------------------------------------------------- op274

  /** op274's deliberately skewed derived join key: half of lineitem
    * lands on key 0, the rest spreads over 1..63 — the canonical
    * hot-key shape (one user, one SKU, one null-ish sentinel). */
  private val skewKeyExpr =
    "CASE WHEN l_orderkey % 2 = 0 THEN 0 ELSE l_orderkey % 64 END"

  /** The unmaterialized skewed join op274 runs — exposed so EngineSpec
    * can pin the AQE skew split in the final adaptive plan. */
  private[graft] def skewJoin(s: SparkSession, d: String): DataFrame = {
    // AQE splits a skewed reduce partition at MAPPER-block granularity;
    // the fixture is one parquet file = one mapper, so there would be
    // nothing to split. The round-robin repartition recreates the
    // many-mapper geometry a real deployment's scan has for free.
    val li = Tables.lineitem(s, d)
      .select(expr(skewKeyExpr).as("k"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .repartition(16)
    val dim = s.range(0, 64).select(col("id").as("k"))
      .withColumn("grp", expr("k % 8"))
    li.join(dim, "k")
      .groupBy("grp")
      .agg(big(count(lit(1))).as("n_lines"),
        sum("cents").as("price_cents"))
  }

  /** op274: AQE skew-join split — the RUNTIME answer to the hot key
    * that op181's static salting solves at plan time: with adaptive
    * execution on, `OptimizeSkewedJoin` sees the post-shuffle map
    * sizes, recognizes the one partition holding ~50% of the fact
    * (key 0), and splits it into advisory-sized slices, each joined
    * against a replicated copy of the matching dim partition — same
    * result, straggler gone, NO query rewrite. op181 remains the
    * escape hatch where AQE can't act (stateful streaming joins,
    * bucketed SMJs that must not re-shuffle); op274 is what a 100 TB
    * deployment reaches for first, because it prices the split off
    * MEASURED sizes instead of a guessed salt factor. The conf window
    * scales AQE's byte thresholds to fixture size (at 100 TB the
    * defaults fire unchanged) and disables broadcast the way a big
    * dim disables itself; EngineSpec pins `skew=true` in the final
    * adaptive plan.
    *
    * 100 TB shape: skew handling moves from the author (salt factor
    * guessed per query) to the engine (split priced per run) —
    * the operational difference between a pipeline that pages and one
    * that self-heals when the hot key shows up unannounced. */
  val op274AqeSkewJoin: Q = (s, d) =>
    withConfs(s,
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "2048",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "1024",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      ordered(skewJoin(s, d).localCheckpoint(), "grp")
    }

  // ---------------------------------------------------------------- op281

  /** The unmaterialized per-order aggregate op281 runs over the
    * bucketed store — exposed so EngineSpec can pin its zero-Exchange
    * plan. */
  private[graft] def bucketedAgg(s: SparkSession, d: String): DataFrame = {
    val (_, lt) = bucketedTables(s, d)
    s.table(lt).groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        Det.centsSum(col("l_extendedprice")).as("order_cents"))
  }

  /** op281: zero-exchange aggregate over the bucketed store — the
    * GROUP BY face of op264's join story: the scan of `lineitem_b`
    * reports hash(l_orderkey) pmod n as its output partitioning, so a
    * per-order aggregate plans as ONE complete HashAggregate with NO
    * Exchange (pinned in EngineSpec) — the write-time shuffle is
    * amortized over aggregates as well as joins. The tail histogram
    * (orders per line-count) re-aggregates the |orders|-sized result,
    * a shuffle of group cardinality, not corpus.
    *
    * 100 TB shape: per-entity rollups (per-user, per-order, per-doc)
    * are THE recurring aggregate; bucketing by entity id makes every
    * one of them exchange-free forever. That is the difference
    * between "the nightly rollup re-shuffles 100 TB" and "it streams
    * each bucket file once". */
  val op281BucketedAgg: Q = (s, d) =>
    ordered(
      bucketedAgg(s, d)
        .groupBy(big(col("n_lines")).as("n_lines"))
        .agg(big(count(lit(1))).as("n_orders"),
          sum("order_cents").as("cents_sum")),
      "n_lines")

  // ------------------------------------------------------------ registry

  // ---------------------------------------------------------------- op286

  /** op286's lookup keys — constants present at every fixture SF. */
  private val lookupKeys = Seq(1L, 2L, 3L)

  /** The unmaterialized point lookup op286 runs — exposed so
    * EngineSpec can pin the SelectedBucketsCount pruning. */
  private[graft] def bucketedLookup(s: SparkSession, d: String): DataFrame = {
    val (_, lt) = bucketedTables(s, d)
    s.table(lt)
      .where(col("l_orderkey").isin(lookupKeys: _*))
      .groupBy("l_orderkey")
      .agg(count(lit(1)).as("n_lines"),
        Det.centsSum(col("l_extendedprice")).as("line_cents"))
  }

  /** op286: bucket-PRUNED point lookup — the third access path the
    * bucketed store buys (op264: exchange-free join, op281:
    * exchange-free aggregate, here: O(|keys|/n·files) random access).
    * An IN-list on the bucket key lets the scan open ONLY the buckets
    * the keys hash into (`SelectedBucketsCount` in the plan, pinned in
    * EngineSpec) — the lakehouse answer to "point lookups need an
    * index": the bucket function IS the index, paid once at write.
    *
    * 100 TB shape: a k-key lookup reads ≤ k of O(thousands) of
    * buckets — bytes scale with keys, not corpus. The residual
    * aggregate is exchange-free like op281 (scan partitioning carries
    * hash(l_orderkey)). */
  val op286BucketLookup: Q = (s, d) =>
    ordered(
      bucketedLookup(s, d)
        .select(big(col("l_orderkey")).as("l_orderkey"), big(col("n_lines"))
          .as("n_lines"), col("line_cents")),
      "l_orderkey")

  val defs: Map[String, Q] = Map(
    "op264_bucketed_join" -> op264BucketedJoin,
    "op265_dpp_scan" -> op265DppScan,
    "op266_runtime_bloom" -> op266RuntimeBloom,
    "op274_aqe_skew" -> op274AqeSkewJoin,
    "op281_bucketed_agg" -> op281BucketedAgg,
    "op286_bucket_lookup" -> op286BucketLookup)

  val oracle: Map[String, String] = Map(
    "op286_bucket_lookup" ->
      """SELECT CAST(l_orderkey AS BIGINT) AS l_orderkey,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |       AS BIGINT) AS line_cents
        |FROM lineitem WHERE l_orderkey IN (1, 2, 3)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "op264_bucketed_join" ->
      """SELECT o.o_orderpriority,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
        |       AS BIGINT) AS price_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "op265_dpp_scan" ->
      """WITH f AS (SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
        |                  l_extendedprice
        |           FROM lineitem),
        |dim AS (SELECT month,
        |          substring(month, 1, 4) || '-Q' ||
        |            CAST((CAST(substring(month, 6, 2) AS BIGINT) + 2) // 3
        |                 AS VARCHAR) AS q
        |        FROM (SELECT DISTINCT ship_month AS month FROM f))
        |SELECT d.month,
        |  CAST(count(*) AS BIGINT) AS n_lines,
        |  CAST(sum(CAST(round(f.l_extendedprice * 100, 0) AS BIGINT))
        |       AS BIGINT) AS price_cents
        |FROM f JOIN dim d ON f.ship_month = d.month
        |WHERE d.q = '1995-Q2'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "op266_runtime_bloom" ->
      s"""SELECT p.p_brand,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(CAST(round(l.l_extendedprice * 100, 0) AS BIGINT))
         |       AS BIGINT) AS price_cents
         |FROM lineitem l
         |JOIN (SELECT p_partkey, p_brand FROM part WHERE $bloomDimPred) p
         |  ON l.l_partkey = p.p_partkey
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "op274_aqe_skew" ->
      s"""WITH li AS (
         |  SELECT $skewKeyExpr AS k,
         |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
         |  FROM lineitem),
         |dim AS (SELECT unnest(range(64)) AS k)
         |SELECT CAST(d.k % 8 AS BIGINT) AS grp,
         |  CAST(count(*) AS BIGINT) AS n_lines,
         |  CAST(sum(cents) AS BIGINT) AS price_cents
         |FROM li JOIN dim d ON li.k = d.k
         |GROUP BY 1 ORDER BY 1""".stripMargin,
    "op281_bucketed_agg" ->
      """WITH po AS (
        |  SELECT l_orderkey, CAST(count(*) AS BIGINT) AS n_lines,
        |    CAST(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))
        |         AS BIGINT) AS order_cents
        |  FROM lineitem GROUP BY 1)
        |SELECT n_lines, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(order_cents) AS BIGINT) AS cents_sum
        |FROM po GROUP BY 1 ORDER BY 1""".stripMargin)
}
