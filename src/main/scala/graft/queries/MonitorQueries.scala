package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{TextOps, TopKAgg}
import graft.sources.Tables
import Det.{big, ordered}

/** Monitoring & curation-statistics pack: the jobs a platform runs to
  * WATCH a pipeline — per-group trend fitting, shuffle-skew diagnosis,
  * weighted corpus sampling, and distribution-drift detection. House
  * rules (Det.scala): every emitted value is an exact integer; division
  * results use the quotient-split trick (q·S + (rem·S) div d) so the
  * scaled quotient never overflows BIGINT.
  */
object MonitorQueries {
  type Q = (SparkSession, String) => DataFrame

  /** op185: key columns whose fan-out distribution gets profiled. */
  private val skewCols = Seq("l_partkey", "l_suppkey")
  /** op186: sample size per source. */
  private val wsK = 24
  /** op186: 2^60 as a double literal (md5-60 hash space). */
  private val h60Space = "1152921504606846976.0"

  // ---------------------------------------------------------------- op184

  /** op184: grouped OLS trend — per event type, the least-squares slope
    * of value (cents) over day index, entirely in exact integers:
    * num = n·Σxy − Σx·Σy, den = n·Σx² − (Σx)² (> 0), and the
    * milli-scaled slope via the overflow-safe quotient split
    * sign·(q·10³ + (rem·10³) div den) — multiplying num by 10³ first
    * would leave BIGINT at production row counts. The
    * trend-per-cohort monitor (is engagement drifting?) with a
    * bit-reproducible answer.
    *
    * 100 TB shape: five map-combinable sums per group — one shuffle of
    * five longs per (group, partition), no sort, no second pass. The
    * sums' magnitudes bound the method: n·Σxy stays in BIGINT through
    * ~10⁶ rows/group at these domains (day ≤ 2⁵, cents ≤ 2¹⁶);
    * wider domains shift to per-group DECIMAL sums (margins stay
    * exact) before the quotient split. */
  val op184TrendOls: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("event_type"),
      big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
        .as("x"),
      round(col("value") * 100, 0).cast("long").as("y"))
    ordered(
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("den", expr("n * sxx - sx * sx"))
        .withColumn("slope_milli", expr(
          "(CASE WHEN num < 0 THEN -1 ELSE 1 END) * " +
            "((abs(num) div den) * 1000 + " +
            "((abs(num) % den) * 1000) div den)"))
        .withColumn("mean_y_milli", expr("(sy * 1000) div n"))
        .select("event_type", "n", "slope_milli", "mean_y_milli"),
      "event_type")
  }

  /** op192's r² spelling — SHARED SQL TEXT on both engines (the op157
    * ln recipe, but here every operation is IEEE-exact: double ×, /,
    * FLOOR are correctly-rounded and bit-identical cross-engine, so
    * the quantized ratio replays without any libm dependence).
    * Expects num, denx, deny in scope; denx·deny > 0. */
  private val r2BpSql: String =
    "CAST(FLOOR((CAST(num AS DOUBLE) * CAST(num AS DOUBLE)) / " +
      "(CAST(denx AS DOUBLE) * CAST(deny AS DOUBLE)) * 10000.0) " +
      "AS BIGINT)"

  // ---------------------------------------------------------------- op192

  /** op192: goodness-of-fit for the op184 trend — per event type, the
    * coefficient of determination r² = (n·Σxy − Σx·Σy)² /
    * ((n·Σx² − (Σx)²)(n·Σy² − (Σy)²)) in basis points, plus the
    * correlation sign. The companion statistic that says whether
    * op184's slope MEANS anything (a slope with r² ≈ 0 is noise).
    * num² overflows BIGINT, so the ratio is computed in doubles under
    * the shared-text contract — unlike ln, double ×,/ and FLOOR are
    * IEEE-exact, so both engines produce the identical quantized bp.
    *
    * 100 TB shape: six map-combinable sums per group (op184's five
    * plus Σy²) — nothing else touches the data. */
  val op192TrendR2: Q = (s, d) => {
    val ev = Tables.events(s, d).select(
      col("event_type"),
      big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
        .as("x"),
      round(col("value") * 100, 0).cast("long").as("y"))
    ordered(
      ev.groupBy("event_type")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"),
          sum(expr("y * y")).as("syy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("denx", expr("n * sxx - sx * sx"))
        .withColumn("deny", expr("n * syy - sy * sy"))
        .withColumn("r2_bp", expr(r2BpSql))
        .withColumn("corr_sign", expr(
          "CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1 " +
            "ELSE 0 END AS BIGINT)"))
        .select("event_type", "n", "r2_bp", "corr_sign"),
      "event_type")
  }

  // ---------------------------------------------------------------- op185

  /** op185: shuffle-skew diagnosis report — for each candidate join/agg
    * key column, the rows-per-key distribution (min / p50 / p99 / max,
    * nearest-rank over the COUNT-OF-COUNTS grid) and the max/median
    * ratio in basis points: the report that decides between a plain
    * join, AQE skew split, or the op181 salt. Two-level reduction:
    * per-key counts (map-combinable), then the grid of how many keys
    * share each count — the ordered walk runs over that tiny grid.
    *
    * 100 TB shape: profiling a key costs one aggregate at the key's
    * own cardinality plus a grid walk at |distinct count values| ≪
    * keys; nothing global is sorted. This is how engines' ANALYZE
    * builds frequency histograms. */
  val op185SkewReport: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    def report(keyCol: String): DataFrame = {
      val grid = li.groupBy(col(keyCol).as("k"))
        .agg(count(lit(1)).as("c"))
        .groupBy("c").agg(count(lit(1)).as("m"))
      val cum = graft.ops.Grid.cumWalk(grid, col("c"),
        Seq("m" -> "cum"), Seq("m" -> "nk"))
      // the grid is tiny (distinct fan-out values); scalar walks join in
      cum.agg(min(col("nk")).as("n_keys"), min("c").as("min_c"),
          max("c").as("max_c"))
        .withColumn("key_col", lit(keyCol))
        .crossJoin(cum.where(col("cum") >= expr("(50 * nk + 99) div 100"))
          .agg(min("c").as("p50_c")))
        .crossJoin(cum.where(col("cum") >= expr("(99 * nk + 99) div 100"))
          .agg(min("c").as("p99_c")))
        .select(col("key_col"), col("n_keys"), col("min_c"),
          col("p50_c"), col("p99_c"), col("max_c"),
          expr("(max_c * 10000) div p50_c").as("skew_bp"))
    }
    ordered(skewCols.map(report).reduce(_ union _), "key_col")
  }

  // ---------------------------------------------------------------- op186

  /** op186: deterministic weighted sampling (Efraimidis–Spirakis shape)
    * — per source, sample k documents with probability proportional to
    * length: each doc draws a hash-uniform u ∈ (0,1], its exponential
    * variate −ln(u) is floor-quantized to integer micro-units (the
    * op157/Bm25 shared-SQL-text recipe), priority = (e_micro·10⁴) div
    * weight, and the k SMALLEST priorities win. Reproducible at any
    * parallelism and across reruns — the property grid-search corpus
    * sampling needs; op158 is the uniform-cap special case.
    *
    * 100 TB shape: selection via the bounded [[TopKAgg]] (≤ k rows per
    * (source, partition) cross the shuffle), never a corpus-wide
    * window sort — the oracle SPELLS the window. The 10⁴ priority
    * scale quantizes the E-S ordering: adjacent priorities tie only
    * when e_micro/w collide at 4 decimals, broken deterministically by
    * doc_id. */
  /** op186/op189 shared scoring: (source, doc_id, n_chars, prio) with
    * prio = the quantized E–S priority. Works on any frame with
    * (source, doc_id, n_chars) — batch table or micro-batch slice. */
  def wsScored(docs: DataFrame): DataFrame = docs
    .select(col("source"), col("doc_id"), col("n_chars"),
      TextOps.md5Hash60(
        concat_ws("|", lit("ws"), col("source"), col("doc_id")))
        .as("h"))
    .withColumn("e_micro", expr(
      "CAST(FLOOR(-LN((CAST(h AS DOUBLE) + 1.0) / " +
        s"$h60Space) * 1000000.0) AS BIGINT)"))
    .withColumn("prio", expr("(e_micro * 10000) div n_chars"))

  /** op186/op189 shared selection: k smallest priorities per source via
    * the bounded TopKAgg, ranks re-derived from the merged buffer. */
  def wsSelect(scored: DataFrame): DataFrame = scored
    .groupBy("source")
    .agg(TopKAgg.topK(wsK)(-col("prio"), col("doc_id")).as("top"))
    .select(col("source"), posexplode(col("top")))
    .select(col("source"), big(col("pos") + 1).as("rank"),
      col("col.id").as("doc_id"), (-col("col.score")).as("prio"))

  val op186WeightedSample: Q = (s, d) => {
    ordered(
      wsSelect(wsScored(Tables.documents(s, d)))
        .join(Tables.documents(s, d).select("doc_id", "n_chars"),
          "doc_id")
        .select("source", "rank", "doc_id", "n_chars", "prio"),
      "source", "rank")
  }

  // ---------------------------------------------------------------- op189

  /** op189: STREAM-MAINTAINED weighted sample — op186's selection kept
    * online: each arriving micro-batch reduces to one partial top-k
    * list per source (≤ k rows of state per batch), the serving merge
    * re-aggregates partials through the SAME bounded TopKAgg. Top-k of
    * a union ≡ top-k of per-slice top-ks (selection is an idempotent
    * semilattice — the op169 mergeability argument for order statistics
    * instead of counters), so the maintained sample is bit-identical to
    * the batch build and runs under op186's UNCHANGED oracle. */
  val op189StreamTopK: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op189_").toString
    ordered(
      graft.streaming.TopKStream.maintainedSample(s, d, state)
        .join(Tables.documents(s, d).select("doc_id", "n_chars"),
          "doc_id")
        .select("source", "rank", "doc_id", "n_chars", "prio"),
      "source", "rank")
  }

  // ---------------------------------------------------------------- op187

  /** op187: Kolmogorov–Smirnov drift detector — the exact two-sample D
    * statistic (in basis points) between the src0 slice and the rest of
    * the corpus over document length: per-value counts for both groups
    * on ONE merged grid, two cumulative walks, D = max |cdf₁ − cdf₂|
    * with the first value attaining it. The train-vs-serve /
    * yesterday-vs-today distribution-drift gate, bit-reproducible.
    *
    * 100 TB shape: one map-combinable (value → per-group counts)
    * aggregate; the cumulative walk runs over the distinct-value grid
    * (a length domain — hundreds of values, the op179 argument).
    * Unbounded domains bucket first (equi-width or op179's
    * boundaries); D computed on the bucketed grid bounds the true D
    * within one bucket's mass. */
  /** op187/op193 shared KS tail: from a merged (v, c1, c2) grid, the
    * exact D statistic (bp) with the first value attaining it. */
  def ksFromGrid(grid: DataFrame): DataFrame = {
    val cum = graft.ops.Grid.cumWalk(grid, col("v"),
        Seq("c1" -> "cum1", "c2" -> "cum2"),
        Seq("c1" -> "n1", "c2" -> "n2"))
      .withColumn("dd", expr(
        "abs((cum1 * 10000) div n1 - (cum2 * 10000) div n2)"))
    ordered(
      cum.groupBy("n1", "n2").agg(max("dd").as("d_bp"))
        .crossJoin(cum.select(col("v"), col("dd").as("dd2")))
        .where(col("dd2") === col("d_bp"))
        .groupBy("n1", "n2", "d_bp").agg(min("v").as("v_at_max"))
        .select("n1", "n2", "d_bp", "v_at_max"),
      "n1")
  }

  val op187KsDrift: Q = (s, d) =>
    ksFromGrid(Tables.documents(s, d)
      .groupBy(col("n_chars").as("v"))
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("c2")))

  // ---------------------------------------------------------------- op193

  /** op193: STREAMING drift gate — op187 with the CURRENT side arriving
    * online: src0 documents stream in micro-batches, each batch
    * reduced to per-length counts appended to a tiny state table
    * (counts are the mergeable summary — exact element-wise addition,
    * the op169 argument), the gate merges them and compares against
    * the STATIC reference slice. Merged streamed counts ≡ the batch
    * group-by, so op193 sits under op187's UNCHANGED oracle — the
    * daily-drift-check deployment shape (arrivals vs a pinned
    * reference snapshot). */
  val op193StreamDrift: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op193_").toString
    val streamed = graft.streaming.DriftStream
      .maintainedLengthCounts(s, d, state)        // (v, c1) merged
    val reference = Tables.documents(s, d)
      .where(col("source") =!= "src0")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c2"))
    ksFromGrid(
      streamed.join(reference, Seq("v"), "full")
        .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2")))
  }

  // ---------------------------------------------------------------- op190

  /** op190: rolling 7-day distinct users (the DAU/WAU metric) — for
    * every day of the event span, how many distinct users were active
    * in the trailing 7-day window, exactly. Windows can't COUNT
    * DISTINCT over a frame; the scalable spelling inverts the problem:
    * each (user, active-day) COVERS the 7 days it contributes to —
    * a bounded explode (×7) over the DEDUPLICATED (user, day) grid,
    * then distinct + count per covered day. Same-day distincts ride
    * along for the DAU column.
    *
    * 100 TB shape: the fan-out is windowSize × |user-day grid| — the
    * grid (≤ users × retention days) is orders of magnitude smaller
    * than the event log, and everything after the first DISTINCT is
    * map-combinable on it. The naive per-day correlated COUNT
    * DISTINCT re-scans the log |days| times; the window-frame
    * spelling doesn't exist. Window width is the declared constant
    * multiplier (28-day WAU → ×28). */
  val op190RollingDistinct: Q = (s, d) => {
    val act = Tables.events(s, d).select(col("user_id"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day"))
      .distinct()
    val cov = act
      .select(col("user_id"), explode(expr("sequence(day, day + 6)"))
        .as("d"))
      .distinct()
      .groupBy("d").agg(count(lit(1)).as("n_users_7d"))
    val d1 = act.groupBy("day").agg(count(lit(1)).as("n_users_1d"))
    val lim = act.agg(min("day").as("lo"), max("day").as("hi"))
    ordered(
      cov.crossJoin(broadcast(lim))
        .where(col("d") >= col("lo") && col("d") <= col("hi"))
        .join(d1, col("d") === col("day"), "left")
        .select(col("d").as("day"),
          coalesce(col("n_users_1d"), lit(0L)).as("n_users_1d"),
          col("n_users_7d")),
      "day")
  }

  // ------------------------------------------------------------- wiring

  // ---------------------------------------------------------------- op232

  /** op232: Theil–Sen robust trend — per event type, the LOWER MEDIAN
    * of all pairwise slopes over the DAILY-TOTAL grid (slope in
    * milli-cents/day, sign-split division so Spark's truncate and
    * DuckDB's floor agree on negatives — the op184 rule). The robust
    * twin of op184's OLS: one adversarial day shifts an OLS slope
    * arbitrarily but moves the slope median by one rank (the op177
    * med-vs-mean argument applied to trends).
    *
    * 100 TB shape: the corpus collapses to the (type, day) grid FIRST
    * (map-combinable), so the pair fan-out is C(\|grid\|, 2) per type —
    * bounded by the time span, never by event volume (the grid-algebra
    * contract every analytics-pack op declares); the median window
    * partitions per type over those bounded pairs. */
  val op232TheilSen: Q = (s, d) => {
    val grid = Tables.events(s, d)
      .groupBy(col("event_type"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
    val a = grid.select(col("event_type"), col("day").as("d1"),
      col("y").as("y1"))
    val b = grid.select(col("event_type"), col("day").as("d2"),
      col("y").as("y2"))
    val slopes = a.join(b, "event_type")
      .where(col("d1") < col("d2"))
      .select(col("event_type"), col("d1"), col("d2"),
        expr("(CASE WHEN y2 - y1 < 0 THEN -1 ELSE 1 END) * " +
          "((abs(y2 - y1) * 1000) div (d2 - d1))").as("slope_milli"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("event_type")
    ordered(
      slopes
        .withColumn("rn", row_number().over(
          w.orderBy(col("slope_milli"), col("d1"), col("d2"))))
        .withColumn("np", count(lit(1)).over(w))
        .where(col("rn") === expr("(np + 1) div 2"))
        .select(col("event_type"), big(col("np")).as("n_pairs"),
          col("slope_milli")),
      "event_type")
  }

  val defs: Map[String, Q] = Map(
    "op232_theil_sen" -> op232TheilSen,
    "op184_trend_ols" -> op184TrendOls,
    "op185_skew_report" -> op185SkewReport,
    "op186_weighted_sample" -> op186WeightedSample,
    "op187_ks_drift" -> op187KsDrift,
    "op189_stream_topk" -> op189StreamTopK,
    "op190_rolling_distinct" -> op190RollingDistinct,
    "op192_trend_r2" -> op192TrendR2,
    "op193_stream_drift" -> op193StreamDrift)

  /** op185's oracle: one CTE chain per profiled key column, UNION ALL. */
  private def skewSql: String = {
    val blocks = skewCols.map { k =>
      s"""SELECT '$k' AS key_col, nk AS n_keys,
         |  (SELECT min(c) FROM cum_$k) AS min_c,
         |  (SELECT min(c) FROM cum_$k WHERE cum >= (50 * nk + 99) // 100)
         |    AS p50_c,
         |  (SELECT min(c) FROM cum_$k WHERE cum >= (99 * nk + 99) // 100)
         |    AS p99_c,
         |  (SELECT max(c) FROM cum_$k) AS max_c,
         |  ((SELECT max(c) FROM cum_$k) * 10000) //
         |  (SELECT min(c) FROM cum_$k WHERE cum >= (50 * nk + 99) // 100)
         |    AS skew_bp
         |FROM (SELECT DISTINCT nk FROM cum_$k) t""".stripMargin
    }.mkString("\nUNION ALL\n")
    val ctes = skewCols.map { k =>
      s"""grid_$k AS (
         |  SELECT c, CAST(count(*) AS BIGINT) AS m FROM (
         |    SELECT $k, CAST(count(*) AS BIGINT) AS c FROM lineitem
         |    GROUP BY 1)
         |  GROUP BY 1),
         |cum_$k AS (
         |  SELECT c, m, CAST(sum(m) OVER (ORDER BY c) AS BIGINT) AS cum,
         |    CAST(sum(m) OVER () AS BIGINT) AS nk
         |  FROM grid_$k)""".stripMargin
    }.mkString(",\n")
    s"WITH $ctes\n$blocks\nORDER BY key_col"
  }

  /** op189 is the stream-maintained sample — merge-exactness means it
    * shares op186's oracle verbatim. */
  lazy val oracle: Map[String, String] = baseOracle +
    ("op189_stream_topk" -> baseOracle("op186_weighted_sample")) +
    // op193 merges streamed counts exactly -> op187's oracle verbatim
    ("op193_stream_drift" -> baseOracle("op187_ks_drift"))

  private lazy val baseOracle: Map[String, String] = Map(
    "op232_theil_sen" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |slopes AS (
        |  SELECT a.event_type, a.day AS d1, b.day AS d2,
        |    (CASE WHEN b.y - a.y < 0 THEN -1 ELSE 1 END) *
        |      ((abs(b.y - a.y) * 1000) // (b.day - a.day)) AS slope_milli
        |  FROM grid a JOIN grid b ON a.event_type = b.event_type
        |    AND a.day < b.day),
        |rk AS (
        |  SELECT event_type, slope_milli,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY slope_milli, d1, d2) AS rn,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS np
        |  FROM slopes)
        |SELECT event_type, np AS n_pairs,
        |  CAST(slope_milli AS BIGINT) AS slope_milli
        |FROM rk WHERE rn = (np + 1) // 2
        |ORDER BY event_type""".stripMargin,
    "op184_trend_ols" ->
      """WITH ev AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS x,
        |    CAST(round(value * 100) AS BIGINT) AS y
        |  FROM events),
        |a AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM ev GROUP BY 1),
        |b AS (
        |  SELECT event_type, n,
        |    n * sxy - sx * sy AS num, n * sxx - sx * sx AS den, sy
        |  FROM a)
        |SELECT event_type, n,
        |  (CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |    ((abs(num) // den) * 1000 + ((abs(num) % den) * 1000) // den)
        |    AS slope_milli,
        |  (sy * 1000) // n AS mean_y_milli
        |FROM b
        |ORDER BY event_type""".stripMargin,
    "op185_skew_report" -> skewSql,
    "op186_weighted_sample" ->
      s"""WITH docs AS (
         |  SELECT source, doc_id, n_chars,
         |    ('0x' || substring(md5(
         |       'ws' || '|' || source || '|' || CAST(doc_id AS VARCHAR)),
         |       1, 15))::BIGINT AS h
         |  FROM documents),
         |scored AS (
         |  SELECT source, doc_id, n_chars,
         |    (CAST(FLOOR(-LN((CAST(h AS DOUBLE) + 1.0) / $h60Space)
         |       * 1000000.0) AS BIGINT) * 10000) // n_chars AS prio
         |  FROM docs),
         |ranked AS (
         |  SELECT *, row_number() OVER (PARTITION BY source
         |    ORDER BY prio, doc_id) AS rank
         |  FROM scored)
         |SELECT source, CAST(rank AS BIGINT) AS rank, doc_id, n_chars,
         |  prio
         |FROM ranked WHERE rank <= $wsK
         |ORDER BY source, rank""".stripMargin,
    "op192_trend_r2" ->
      s"""WITH ev AS (
         |  SELECT event_type,
         |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
         |         AS BIGINT) AS x,
         |    CAST(round(value * 100) AS BIGINT) AS y
         |  FROM events),
         |a AS (
         |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         |    CAST(sum(x * x) AS BIGINT) AS sxx,
         |    CAST(sum(x * y) AS BIGINT) AS sxy,
         |    CAST(sum(y * y) AS BIGINT) AS syy
         |  FROM ev GROUP BY 1),
         |b AS (
         |  SELECT event_type, n, n * sxy - sx * sy AS num,
         |    n * sxx - sx * sx AS denx, n * syy - sy * sy AS deny
         |  FROM a)
         |SELECT event_type, n, $r2BpSql AS r2_bp,
         |  CAST(CASE WHEN num < 0 THEN -1 WHEN num > 0 THEN 1
         |       ELSE 0 END AS BIGINT) AS corr_sign
         |FROM b
         |ORDER BY event_type""".stripMargin,
    "op190_rolling_distinct" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day
        |  FROM events),
        |cov AS (
        |  SELECT d, CAST(count(*) AS BIGINT) AS n_users_7d FROM (
        |    SELECT DISTINCT user_id, day + k AS d
        |    FROM act, UNNEST(range(0, 7)) t(k))
        |  GROUP BY 1),
        |d1 AS (SELECT day, CAST(count(*) AS BIGINT) AS n_users_1d
        |       FROM act GROUP BY 1),
        |lim AS (SELECT min(day) AS lo, max(day) AS hi FROM act)
        |SELECT c.d AS day, coalesce(o.n_users_1d, 0) AS n_users_1d,
        |  c.n_users_7d
        |FROM cov c CROSS JOIN lim
        |LEFT JOIN d1 o ON c.d = o.day
        |WHERE c.d BETWEEN lim.lo AND lim.hi
        |ORDER BY day""".stripMargin,
    "op187_ks_drift" ->
      """WITH grid AS (
        |  SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c2
        |  FROM documents GROUP BY 1),
        |cum AS (
        |  SELECT v,
        |    CAST(sum(c1) OVER (ORDER BY v) AS BIGINT) AS cum1,
        |    CAST(sum(c2) OVER (ORDER BY v) AS BIGINT) AS cum2,
        |    CAST(sum(c1) OVER () AS BIGINT) AS n1,
        |    CAST(sum(c2) OVER () AS BIGINT) AS n2
        |  FROM grid),
        |dd AS (
        |  SELECT v, n1, n2,
        |    abs((cum1 * 10000) // n1 - (cum2 * 10000) // n2) AS dd
        |  FROM cum)
        |SELECT n1, n2, max(dd) AS d_bp,
        |  min(v) FILTER (WHERE dd = (SELECT max(dd) FROM dd))
        |    AS v_at_max
        |FROM dd GROUP BY n1, n2
        |ORDER BY n1""".stripMargin)
}
