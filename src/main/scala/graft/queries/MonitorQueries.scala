package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Similarity, TextOps, TopKAgg}
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

  /** Shared by op232/op234/op235: the (event_type, day, y-cents)
    * DAILY-TOTAL grid — the corpus collapses here FIRST (one
    * map-combinable sum shuffle), so everything downstream is
    * calendar-bounded, never event-volume-bounded. */
  private def dailyGrid(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))

  // ---------------------------------------------------------------- op233

  /** op233/op236 shared Mann–Whitney tail: from a merged (v, c1, c2)
    * value-count grid, the exact two-sample rank-sum statistics —
    * midranks DOUBLED so ties stay in integers (midrank of a tied run
    * is prefix + (t+1)/2, a half-integer; ×2 clears the fraction
    * without any floating point). Emits U₁ and U₂ doubled for the same
    * reason, the tie correction term Σ(t³−t) the normal approximation
    * needs, and the AUC effect size in bp — U₁/(n₁n₂) IS
    * P(X>Y) + ½P(X=Y), the ROC-AUC equivalence, so the drift gate
    * doubles as a separability score. */
  def mwuFromGrid(grid: DataFrame): DataFrame = {
    val walk = graft.ops.Grid.cumWalk(
        grid.withColumn("t", expr("c1 + c2")),
        col("v"), Seq("t" -> "cumt"),
        Seq("c1" -> "n1", "c2" -> "n2"))
      .withColumn("pfx", expr("cumt - t"))
    ordered(
      walk.groupBy("n1", "n2")
        .agg(sum(expr("c1 * (2 * pfx + t + 1)")).as("r1_x2"),
          sum(expr("t * t * t - t")).as("tie_term"))
        .withColumn("u1_x2", expr("r1_x2 - n1 * (n1 + 1)"))
        .select(col("n1"), col("n2"), col("u1_x2"),
          expr("2 * n1 * n2 - u1_x2").as("u2_x2"), col("tie_term"),
          expr("(u1_x2 * 10000) div (2 * n1 * n2)").as("auc_bp")),
      "n1")
  }

  /** op233: Mann–Whitney U drift test — the exact two-sample rank-sum
    * test between the src0 slice and the rest of the corpus over
    * document length: location-shift sensitivity where op187's KS
    * reacts to the max CDF gap and op183's χ² to binned shape. Same
    * (v, c1, c2) grid as op187; the three gates share one aggregate at
    * deployment.
    *
    * 100 TB shape: the op187 argument verbatim — one map-combinable
    * (value → per-group counts) shuffle, then the cumulative walk on
    * the distinct-value grid (the Grid contract). Rank sums never
    * materialize per-row ranks: midranks fall out of the grid's
    * prefix counts. */
  val op233MannWhitney: Q = (s, d) =>
    mwuFromGrid(Tables.documents(s, d)
      .groupBy(col("n_chars").as("v"))
      .agg(sum(when(col("source") === "src0", 1L).otherwise(0L)).as("c1"),
        sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("c2")))

  // ---------------------------------------------------------------- op234

  /** op234: Kendall tau concordance between every PAIR of event types'
    * daily series — do clicks and purchases move together? Rank
    * correlation from concordant/discordant day-pair counts (integer
    * sign algebra, no ranks materialized), tie classes reported
    * separately the way tau-b's denominator needs them; tau-a in bp
    * with the op232 sign-split division. The robust co-movement
    * monitor: one outlier day flips O(n) of C(n,2) pairs, where a
    * Pearson r moves arbitrarily.
    *
    * 100 TB shape: series join and pair fan-out both run on the daily
    * grid — C(\|types\|,2) × C(\|span\|,2) rows, a calendar bound. The
    * corpus is touched once, by dailyGrid's sum shuffle. */
  val op234KendallTau: Q = (s, d) => {
    val grid = dailyGrid(s, d)
    val a = grid.select(col("event_type").as("ta"), col("day"),
      col("y").as("ya"))
    val b = grid.select(col("event_type").as("tb"), col("day"),
      col("y").as("yb"))
    val series = a.join(b, "day").where(col("ta") < col("tb"))
    val p = series.select(col("ta"), col("tb"), col("day").as("d1"),
      col("ya").as("xa1"), col("yb").as("xb1"))
    val q = series.select(col("ta"), col("tb"), col("day").as("d2"),
      col("ya").as("xa2"), col("yb").as("xb2"))
    ordered(
      p.join(q, Seq("ta", "tb")).where(col("d1") < col("d2"))
        .withColumn("sx", expr(
          "CASE WHEN xa2 > xa1 THEN 1 WHEN xa2 < xa1 THEN -1 ELSE 0 END"))
        .withColumn("sy", expr(
          "CASE WHEN xb2 > xb1 THEN 1 WHEN xb2 < xb1 THEN -1 ELSE 0 END"))
        .groupBy("ta", "tb")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when(expr("sx * sy = 1"), 1L).otherwise(0L)).as("nc"),
          sum(when(expr("sx * sy = -1"), 1L).otherwise(0L)).as("nd"),
          sum(when(expr("sx = 0 AND sy <> 0"), 1L).otherwise(0L))
            .as("tie_x"),
          sum(when(expr("sy = 0 AND sx <> 0"), 1L).otherwise(0L))
            .as("tie_y"),
          sum(when(expr("sx = 0 AND sy = 0"), 1L).otherwise(0L))
            .as("tie_both"))
        .withColumn("tau_a_bp", expr(
          "(CASE WHEN nc - nd < 0 THEN -1 ELSE 1 END) * " +
            "((abs(nc - nd) * 10000) div n_pairs)")),
      "ta", "tb")
  }

  // ---------------------------------------------------------------- op235

  /** op235: CUSUM changepoint detection — per event type, the day at
    * which the cumulative deviation from the series mean peaks, with
    * the peak magnitude. Deviations are kept exact by scaling through
    * the mean's denominator: S_i = n·cum_i − i·T (= n·Σ_{d≤i}(y_d − ȳ))
    * — no division anywhere, so the changepoint location is
    * bit-reproducible. The level-shift detector op167's spike gate and
    * op216's seasonal gate don't cover: a PERSISTENT regime change
    * maximizes |S| at the shift point even when no single day spikes.
    *
    * 100 TB shape: one dailyGrid shuffle, then a per-type cumulative
    * window over the calendar-bounded grid; argmax via window-max +
    * equality filter (no second pass over events). */
  /** op235/op240 shared CUSUM tail over an (event_type, day, y) grid. */
  def cusumFromGrid(grid: DataFrame): DataFrame = {
    val wt = Window.partitionBy("event_type")
    val w = wt.orderBy("day")
    val cum = grid
      .withColumn("cum", sum("y").over(w))
      .withColumn("rn", big(row_number().over(w)))
      .withColumn("tot", sum("y").over(wt))
      .withColumn("n", count(lit(1)).over(wt))
      .withColumn("s_abs", abs(expr("n * cum - rn * tot")))
    ordered(
      cum.withColumn("smax", max("s_abs").over(wt))
        .where(col("s_abs") === col("smax"))
        .groupBy("event_type", "n", "smax")
        .agg(min("day").as("cp_day"))
        .select(col("event_type"), big(col("n")).as("n_days"),
          col("smax").as("smax_scaled"), col("cp_day")),
      "event_type")
  }

  val op235Cusum: Q = (s, d) => cusumFromGrid(dailyGrid(s, d))

  // ---------------------------------------------------------------- op240

  /** op240: STREAMING CUSUM gate — op235 with the daily-total grid
    * maintained ONLINE (SeasonalStream.maintainedDailySums: per-batch
    * partial cents sums appended, serving merge element-wise — sums
    * are as mergeable as counts) and the SAME cusum tail, so the
    * online changepoint check sits under op235's UNCHANGED oracle.
    * CUSUM is the canonical ONLINE changepoint detector — this is its
    * deployment spelling: arrivals fold into the grid as they land,
    * the regime-shift question is re-asked per serve at grid cost. */
  val op240StreamCusum: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op240_").toString
    cusumFromGrid(graft.streaming.SeasonalStream
      .maintainedDailySums(s, d, state))
  }

  // ---------------------------------------------------------------- op236

  /** op236: STREAMING Mann–Whitney gate — op233 with the src0 side
    * arriving online through op193's maintained length histogram
    * (DriftStream — counts are the mergeable summary, so the streamed
    * grid equals the batch group-by bit-for-bit) and the SAME mwu tail.
    * Sits under op233's UNCHANGED oracle; with op193 this makes the
    * drift check a two-statistic gate (max-gap + location shift) off
    * ONE maintained state table. */
  val op236StreamMwu: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op236_").toString
    val streamed = graft.streaming.DriftStream
      .maintainedLengthCounts(s, d, state)        // (v, c1) merged
    val reference = Tables.documents(s, d)
      .where(col("source") =!= "src0")
      .groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("c2"))
    mwuFromGrid(
      streamed.join(reference, Seq("v"), "full")
        .select(col("v"), coalesce(col("c1"), lit(0L)).as("c1"),
          coalesce(col("c2"), lit(0L)).as("c2")))
  }

  /** op243: Poisson(1) inverse-CDF thresholds in the md5-60 hash space
    * (floor(cdf·2⁶⁰), exact plan literals shared with the oracle): a
    * uniform 60-bit hash maps to a deterministic Poisson(1) bootstrap
    * weight 0..6 — P(w > 6) ≈ 6e-5 truncated to 6 by declaration. */
  private val poisCdf60 = Seq(
    424136118829305329L, 848272237658610659L, 1060340297073263324L,
    1131029650211480879L, 1148701988496035267L, 1152236456152946145L)

  // ---------------------------------------------------------------- op243

  /** op243: Poisson-bootstrap confidence interval for each event type's
    * mean daily total — THE scalable bootstrap: instead of resampling
    * rows with replacement (needs global coordination), every (day,
    * replicate) draws an independent Poisson(1) weight from a
    * deterministic hash, so all B=32 resamples materialize in ONE pass
    * as a ×B grid fan-out. Replicate means in exact milli-cents
    * (sign-split division); the interval is the exact order-statistic
    * envelope of the 32 replicate means (ranks ⌈0.025·32⌉=1 and
    * ⌈0.975·32⌉=32, i.e. min/max — declared). Weights are
    * hash-deterministic: reruns, retries, and both engines draw the
    * SAME bootstrap.
    *
    * 100 TB shape: the corpus collapses to the daily grid first; the
    * bootstrap fan-out is \|grid\|×B — calendar-bounded, never
    * corpus-bounded. Row-level bootstraps at scale use the same
    * spelling with the weight drawn per (row, b) BEFORE the grid
    * aggregate — still one pass, map-combinable. */
  val op243BootstrapCi: Q = (s, d) => {
    val wCase = "CASE " + poisCdf60.zipWithIndex.map { case (t, k) =>
      s"WHEN h < ${t}L THEN ${k}L " }.mkString + "ELSE 6L END"
    val grid = dailyGrid(s, d)
    val means = grid
      .crossJoin(s.range(32).select(col("id").as("b")))
      .withColumn("h", TextOps.md5Hash60(concat_ws("|", lit("bs"),
        col("event_type"), col("day"), col("b"))))
      .withColumn("w", expr(wCase))
      .groupBy("event_type", "b")
      .agg(sum("w").as("sw"), sum(expr("w * y")).as("swy"))
      .withColumn("m_milli", expr(
        "(CASE WHEN swy < 0 THEN -1 ELSE 1 END) * " +
          "((abs(swy) * 1000) div greatest(sw, 1))"))
    val point = grid.groupBy("event_type")
      .agg(big(count(lit(1))).as("n_days"), sum("y").as("tot"))
      .withColumn("mean_milli", expr(
        "(CASE WHEN tot < 0 THEN -1 ELSE 1 END) * " +
          "((abs(tot) * 1000) div n_days)"))
    ordered(
      means.groupBy("event_type")
        .agg(big(count(lit(1))).as("n_b"), min("m_milli").as("lo_milli"),
          max("m_milli").as("hi_milli"))
        .join(point.select("event_type", "n_days", "mean_milli"),
          "event_type"),
      "event_type")
  }

  // ---------------------------------------------------------------- op244

  /** op244: sample-ratio-mismatch (SRM) gate — the first check every
    * experimentation platform runs before reading a single metric:
    * users are deterministically hash-assigned to two arms (md5-60
    * parity — the op196 routing idiom, so assignment is reproducible
    * across engines, reruns, and services), and the observed arm
    * counts are tested against the declared 50/50 with the exact
    * one-df chi-square χ² = (o₀−o₁)²/n in milli fixed-point. A
    * triggered gate means the ASSIGNMENT pipeline is broken (bots,
    * logging loss, redirect asymmetry) and all metrics downstream are
    * untrustworthy. Flag at χ² > 3.841 (p < 0.05).
    *
    * 100 TB shape: one distinct-user reduce (map-combinable), then
    * arithmetic on TWO numbers. Assignment-by-hash needs no
    * coordination service — the hash IS the assignment, the op107/
    * op186 determinism argument. */
  /** op244/op262 shared tail over a distinct-user frame. */
  def srmFromUsers(users: DataFrame): DataFrame = {
    val arms = users
      .withColumn("arm", TextOps.md5Hash60(
        concat_ws("|", lit("srm"), col("user_id"))) % 2)
    ordered(
      arms.groupBy(lit("ab1").as("experiment"))
        .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("o0"),
          sum(when(col("arm") === 1, 1L).otherwise(0L)).as("o1"))
        .withColumn("n", expr("o0 + o1"))
        .withColumn("chi2_milli", expr(
          "((o0 - o1) * (o0 - o1) * 1000) div n"))
        .withColumn("srm", expr(
          "CAST(CASE WHEN ((o0 - o1) * (o0 - o1) * 1000) div n > 3841 " +
            "THEN 1 ELSE 0 END AS BIGINT)")),
      "experiment")
  }

  val op244SrmGate: Q = (s, d) =>
    srmFromUsers(Tables.events(s, d).select("user_id").distinct())

  // ---------------------------------------------------------------- op262

  /** op262: STREAMING SRM gate — op244 with the distinct-user set
    * maintained ONLINE: each micro-batch appends its batch-distinct
    * user ids (sets merge by union — the idempotent-semilattice
    * argument, op189's for order statistics applied to membership),
    * the serve re-distincts the partials and runs the SAME tail under
    * op244's UNCHANGED oracle. The deployment shape: assignment
    * health checked continuously as exposure logs land, not once at
    * experiment end. */
  val op262StreamSrm: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op262_").toString
    srmFromUsers(graft.streaming.ChangerStream
      .maintainedDistinctUsers(s, d, state))
  }

  // ---------------------------------------------------------------- op247

  /** op247: embedding centroid drift — per label, the cosine between
    * the centroid of the "old" half and the "new" half of its vectors
    * (split by vec_id parity here; by snapshot date in production):
    * the VECTOR-SPACE drift gate op187/op233 can't provide — an
    * encoder upgrade or upstream feature change moves class centroids
    * long before scalar metrics react. Centroids are element-wise
    * truncated integer means of op67's ×10⁶-quantized components
    * (sign-split division), compared with the deterministic bp cosine
    * — hash-exact end-to-end, and bounded enough that the dot never
    * leaves BIGINT.
    *
    * 100 TB shape: one map-combinable (label, half, dim) sum over the
    * exploded components — 64·\|labels\|·2 cells of state regardless
    * of corpus size; everything downstream is grid algebra. The same
    * spelling monitors any per-cohort mean-vector shift (user towers,
    * item towers, IVF cells via op114's assignment). */
  val op247CentroidDrift: Q = (s, d) => {
    val comps = Tables.embeddings(s, d)
      .select(col("label"), (col("vec_id") % 2).as("half"),
        posexplode(Similarity.quantize(col("embedding")))
          .as(Seq("dim", "q")))
    val cent = comps.groupBy("label", "half", "dim")
      .agg(sum("q").as("sq"), count(lit(1)).as("n"))
      .withColumn("m", expr(
        "(CASE WHEN sq < 0 THEN -1 ELSE 1 END) * (abs(sq) div n)"))
    val o = cent.where(col("half") === 0)
      .select(col("label"), col("dim"), col("m").as("mo"),
        col("n").as("no"))
    val w = cent.where(col("half") === 1)
      .select(col("label"), col("dim"), col("m").as("mn"),
        col("n").as("nn"))
    ordered(
      o.join(w, Seq("label", "dim"))
        .groupBy("label")
        .agg(max("no").as("n_old"), max("nn").as("n_new"),
          sum(expr("mo * mn")).as("dot"),
          sum(expr("mo * mo")).as("n2o"),
          sum(expr("mn * mn")).as("n2n"))
        .select(big(col("label")).as("label"), big(col("n_old")).as("n_old"),
          big(col("n_new")).as("n_new"),
          Similarity.cosBpFrom(col("dot"), col("n2o"), col("n2n"))
            .as("cos_bp")),
      "label")
  }

  // ---------------------------------------------------------------- op250

  /** op250: heavy CHANGERS — the top-10 users by absolute activity
    * delta between the first 15 days and the rest: the "what moved"
    * complement of op159's heavy hitters ("what's big") — churn spikes,
    * bot ramp-ups, and silent-user cliffs all surface here first. Both
    * half-counts come from ONE map-combinable pass; selection runs
    * through the bounded TopKAgg (k rows per partition cross the
    * shuffle, never the user table — the op158/op186 argument), and
    * the full count columns re-attach by broadcasting the 10 winners.
    *
    * 100 TB shape: one aggregate at user cardinality + a k-bounded
    * selection — no global sort, no second pass. The window-sort
    * spelling the oracle uses would single-partition a billion users;
    * the declared equivalence (score desc, id asc — TopKAgg's exact
    * order) is what lets the cheap plan sit under the expensive SQL. */
  /** op250/op260 shared tail over a (user_id, c1, c2) count table. */
  def changersFromCounts(counts0: DataFrame): DataFrame = {
    val counts = counts0.withColumn("delta", expr("c2 - c1"))
    val top = counts
      .agg(TopKAgg.topK(10)(abs(col("delta")), col("user_id")).as("top"))
      .select(posexplode(col("top")))
      .select(big(col("pos") + 1).as("rank"), col("col.id").as("user_id"))
    ordered(
      counts.join(broadcast(top), "user_id")
        .select("rank", "user_id", "c1", "c2", "delta"),
      "rank")
  }

  val op250HeavyChangers: Q = (s, d) => {
    val dayExpr = datediff(to_date(col("ts")),
      lit("2024-01-01").cast("date"))
    changersFromCounts(Tables.events(s, d)
      .groupBy("user_id")
      .agg(sum(when(dayExpr < 15, 1L).otherwise(0L)).as("c1"),
        sum(when(dayExpr >= 15, 1L).otherwise(0L)).as("c2")))
  }

  // ---------------------------------------------------------------- op260

  /** op260: STREAMING heavy changers — op250 with the per-user half
    * counts maintained ONLINE (ChangerStream partials, element-wise
    * merge) and the SAME k-bounded selection tail under op250's
    * UNCHANGED oracle: the change report re-asks per serve at
    * user-table cost, never re-scanning arrivals. */
  val op260StreamChangers: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op260_").toString
    changersFromCounts(graft.streaming.ChangerStream
      .maintainedHalfCounts(s, d, state))
  }

  // ---------------------------------------------------------------- op251

  /** op251: split-conformal coverage eval — per event type, the
    * interval [k-th smallest, k-th largest] of the CALIBRATION window
    * (days < 15, k = max(n_cal div 20, 1) ≈ the 5%/95% order
    * statistics) is scored on the EVAL window (days ≥ 15): inside
    * count and coverage in bp. Split conformal's guarantee — coverage
    * ≥ 1 − 2k/(n_cal+1) regardless of the distribution — only holds
    * if nothing drifted; the MEASURED coverage dropping below it IS
    * the drift alarm, in the same units the model's intervals are
    * quoted in. The eval complement of op235's changepoint: op235
    * finds where the level moved, op251 says what that did to
    * interval validity.
    *
    * 100 TB shape: both windows collapse to the daily grid first;
    * rank selection runs per type over the calendar-bounded grid
    * (row_number, the grid contract) and the eval side is one
    * broadcast join + map-combinable count. */
  /** op251/op257 shared tail over an (event_type, day, y) grid. */
  def conformalFromGrid(grid: DataFrame): DataFrame = {
    val cal = grid.where(col("day") < 15)
    val wAsc = Window.partitionBy("event_type")
      .orderBy(col("y").asc, col("day").asc)
    val wDesc = Window.partitionBy("event_type")
      .orderBy(col("y").desc, col("day").desc)
    val ranked = cal
      .withColumn("ra", row_number().over(wAsc))
      .withColumn("rd", row_number().over(wDesc))
      .withColumn("n_cal", count(lit(1)).over(
        Window.partitionBy("event_type")))
      .withColumn("k", expr("greatest(n_cal div 20, 1)"))
    val bounds = ranked.groupBy("event_type")
      .agg(big(max("n_cal")).as("n_cal"),
        max(when(col("ra") === col("k"), col("y"))).as("lo"),
        max(when(col("rd") === col("k"), col("y"))).as("hi"))
    ordered(
      grid.where(col("day") >= 15)
        .join(broadcast(bounds), "event_type")
        .groupBy("event_type", "n_cal", "lo", "hi")
        .agg(big(count(lit(1))).as("n_eval"),
          sum(when(col("y").between(col("lo"), col("hi")), 1L)
            .otherwise(0L)).as("inside"))
        .withColumn("cover_bp", expr("(inside * 10000) div n_eval"))
        .select("event_type", "n_cal", "n_eval", "lo", "hi", "inside",
          "cover_bp"),
      "event_type")
  }

  val op251ConformalCoverage: Q = (s, d) =>
    conformalFromGrid(dailyGrid(s, d))

  // ---------------------------------------------------------------- op257

  /** op257: STREAMING conformal gate — op251 with the daily grid
    * maintained ONLINE (op240's SeasonalStream cents sums) and the
    * SAME conformal tail, under op251's UNCHANGED oracle. With op236
    * (MWU) and op240 (CUSUM) this completes the statistics family's
    * online legs off ONE maintained grid: location shift, level
    * shift, and interval validity, all per serve at grid cost. */
  val op257StreamConformal: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op257_").toString
    conformalFromGrid(graft.streaming.SeasonalStream
      .maintainedDailySums(s, d, state))
  }

  // ---------------------------------------------------------------- op256

  /** op256: OLS forecast backtest — op184's regression FIT on the
    * calibration window (days < 15), SCORED on the eval window: mean
    * absolute error and signed bias of the line's prediction, in
    * exact milli-cents. The prediction stays rational the whole way —
    * ŷ(d)·10³ = (Σy·den + num·(n·d − Σx))·10³ / (n·den) with num/den
    * op184's integer slope pieces — so no intercept ever rounds
    * before the residual is taken (one sign-split division per eval
    * day, then integer sums). The eval every forecasting deployment
    * runs before trusting a trend: op184 says what the line IS,
    * op256 says whether yesterday's line PREDICTS today.
    *
    * 100 TB shape: the fit is five map-combinable sums on the cal
    * grid; scoring is a broadcast join of those five numbers to the
    * eval grid + a map-combinable error sum. Nothing re-scans events
    * beyond the one dailyGrid pass. */
  val op256ForecastBacktest: Q = (s, d) => {
    val grid = dailyGrid(s, d)
    // op184's bound argument applies verbatim: day < 15 (the fit
    // window) and y in cents keep every product ≤ ~2²⁰·2¹⁶ and the
    // grid has ≤ 15 rows/group — nowhere near BIGINT at any volume
    val fit = grid.where(col("day") < 15)
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("day").as("sx"),
        sum("y").as("sy"), sum(expr("day * day")).as("sxx"),
        sum(expr("day * y")).as("sxy"))
      .withColumn("num", expr("n * sxy - sx * sy"))
      .withColumn("den", expr("n * sxx - sx * sx"))
    ordered(
      grid.where(col("day") >= 15)
        .join(broadcast(fit), "event_type")
        .withColumn("pnum", expr(
          "(sy * den + num * (n * day - sx)) * 1000"))
        .withColumn("p_milli", expr(
          "(CASE WHEN pnum < 0 THEN -1 ELSE 1 END) * " +
            "(abs(pnum) div (n * den))"))
        .withColumn("err", expr("y * 1000 - p_milli"))
        .groupBy("event_type")
        .agg(big(count(lit(1))).as("n_eval"),
          sum(abs(col("err"))).as("abs_err_sum"),
          sum(col("err")).as("err_sum"))
        .select(col("event_type"), col("n_eval"),
          expr("(abs_err_sum) div n_eval").as("mae_milli"),
          expr("(CASE WHEN err_sum < 0 THEN -1 ELSE 1 END) * " +
            "(abs(err_sum) div n_eval)").as("bias_milli")),
      "event_type")
  }

  // ---------------------------------------------------------------- op270

  /** op270/op273 shared ACF tail: from an (event_type, day, y) grid,
    * the exact-moment autocorrelation r(k) in bp at calendar lags
    * 1..7. Full-series mean centering is kept rational by scaling
    * through the mean's denominator (n·y − S is n·(y − ȳ) — op235's
    * trick), so num and den carry the same n² factor and the ratio
    * needs no division until the final double; the cross products run
    * in DECIMAL(19,0)×DECIMAL(19,0)→DECIMAL(38,0) (exact where BIGINT
    * products overflow — the op254 convention, HUGEINT-matching on the
    * oracle side). */
  def acfFromGrid(s: SparkSession, grid: DataFrame): DataFrame = {
    val base = grid.groupBy("event_type")
      .agg(count(lit(1)).as("n"), sum("y").as("sy"))
    val g = grid.join(broadcast(base), "event_type")
      .select(col("event_type"), col("day"), col("y"),
        col("n"), col("sy"))
    val den = g.groupBy("event_type")
      .agg(sum(expr("CAST(n * y - sy AS DECIMAL(19,0)) * " +
        "CAST(n * y - sy AS DECIMAL(19,0))")).as("den"))
    val lags = s.range(1, 8).select(col("id").as("lag"))
    val pairs = g.crossJoin(broadcast(lags))
      .withColumn("day2", expr("day + lag"))
      .join(g.select(col("event_type"), col("day").as("day2"),
          col("y").as("y2")),
        Seq("event_type", "day2"))
      .groupBy("event_type", "lag")
      .agg(big(count(lit(1))).as("n_pairs"),
        sum(expr("CAST(n * y - sy AS DECIMAL(19,0)) * " +
          "CAST(n * y2 - sy AS DECIMAL(19,0))")).as("num"))
    ordered(
      pairs.join(broadcast(den), "event_type")
        .select(col("event_type"), big(col("lag")).as("lag"),
          col("n_pairs"),
          // den = 0 (constant series) → r undefined: NULL in BOTH
          // engines, instead of Spark's NaN→0 non-ANSI cast diverging
          // from DuckDB's cast error on the same input
          expr("CASE WHEN den = 0 THEN CAST(NULL AS BIGINT) " +
            "ELSE CAST(floor(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) " +
            "* 10000) AS BIGINT) END").as("r_bp")),
      "event_type", "lag")
  }

  /** op270: autocorrelation function — per event type, r(k) of the
    * daily cents totals at calendar lags 1..7, exact-moment, bp. THE
    * seasonality diagnostic the rest of the time-series family builds
    * on: a weekly cycle shows as r(7) ≫ r(1), trend as slowly-decaying
    * positive r across all lags, white noise as everything ≈ 0 — it
    * tells you WHETHER op216's seasonal baseline or op184's trend is
    * the right model before either is fit. Calendar lags (not row
    * lags) mean gaps simply drop pairs, never misalign them.
    *
    * 100 TB shape: one dailyGrid shuffle; the ×7 lag fan-out and
    * self-join run on the calendar-bounded grid (O(types · days)
    * rows), den/num both map-combinable on it. */
  val op270Acf: Q = (s, d) => acfFromGrid(s, dailyGrid(s, d))

  /** op273: STREAMING ACF — op270 with the daily grid maintained
    * ONLINE (SeasonalStream's per-batch cents partials, element-wise
    * merge) and the SAME tail, under op270's UNCHANGED oracle. The
    * seasonality question re-asked per serve at grid cost — with
    * op240 (level), op236 (location), op257 (interval validity) the
    * online statistics panel now also covers SHAPE. */
  val op273StreamAcf: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op273_").toString
    acfFromGrid(s, graft.streaming.SeasonalStream
      .maintainedDailySums(s, d, state))
  }

  // ---------------------------------------------------------------- op277

  /** op277: Population Stability Index — per source vs the rest of the
    * corpus over length buckets (n_chars div 100): Σ (p−q)·ln(p/q),
    * nano-nats, with add-one smoothing over the observed bucket set so
    * empty cells stay finite and DETERMINISTIC (the standard epsilon
    * knob, pinned to a closed form both engines replay). PSI is the
    * number model-risk teams actually gate deploys on (rules of thumb:
    * < 0.1 stable, > 0.25 investigate) — the op187/op233/op269 drift
    * family's industry-dialect member, binned where KS is exact.
    * Every term is ≥ 0 ((p−q) and ln(p/q) share sign), floored to nano
    * BEFORE the sum (op246's quantize-then-sum rule).
    *
    * 100 TB shape: one (source, bucket) count; the smoothing grid is
    * |sources| × |buckets| (hundreds), map-combinable after. */
  val op277Psi: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .groupBy(col("source"), expr("n_chars div 100").as("bucket"))
      .agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("bucket").agg(sum("c").as("ct"))
    val ns = cnt.groupBy("source").agg(sum("c").as("n1"))
    val nt = tot.agg(sum("ct").as("nt"), count(lit(1)).as("nb"))
    ordered(
      ns.crossJoin(broadcast(nt)).crossJoin(tot)
        .join(cnt, Seq("source", "bucket"), "left")
        .withColumn("c1", coalesce(col("c"), lit(0L)))
        .withColumn("p", expr(
          "CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE)"))
        .withColumn("q", expr(
          "CAST(ct - c1 + 1 AS DOUBLE) / CAST(nt - n1 + nb AS DOUBLE)"))
        .withColumn("term_nano", expr(
          "CAST(floor((p - q) * ln(p / q) * 1000000000) AS BIGINT)"))
        .groupBy("source")
        .agg(max("n1").as("w1"), max(expr("nt - n1")).as("w2"),
          max("nb").as("wb"), sum("term_nano").as("psi_nano"))
        .select(col("source"), big(col("w1")).as("n1"),
          big(col("w2")).as("n2"), big(col("wb")).as("n_buckets"),
          col("psi_nano")),
      "source")
  }

  // ---------------------------------------------------------------- op268

  /** op268: Welch's t-test — per source, the unequal-variance
    * two-sample t statistic (and Welch–Satterthwaite df) comparing the
    * source's document lengths against the REST of the corpus: the
    * parametric mean-shift gate beside op233's rank test (MWU asks
    * "did the distribution's location move", Welch "did the MEAN move,
    * in units of its standard error" — the one A/B dashboards quote).
    * All moments (n, Σx, Σx²) are exact BIGINTs from ONE corpus pass
    * (each source's complement derives from the global totals — no
    * second scan); the t/df tail is a fixed IEEE-double expression
    * tree over those integers, spelled identically in both engines
    * (the op254/op192 shared-text contract: correctly-rounded /,*,
    * sqrt on identical operands are bit-deterministic), quantized to
    * milli before output.
    *
    * 100 TB shape: one map-combinable aggregate at |sources| rows; the
    * complement trick (rest = total − source) is what keeps per-group
    * vs-rest testing single-pass at any group count. */
  val op268WelchT: Q = (s, d) => {
    val m = Tables.documents(s, d)
      .groupBy("source")
      // squared term accumulates in DECIMAL(38,0) (the op254/op270
      // convention): a BIGINT sum of squares silently wraps at the
      // corpus scale the exactness claim covers
      .agg(count(lit(1)).as("n1"), sum("n_chars").as("s1"),
        sum(expr("CAST(n_chars AS DECIMAL(19,0)) * " +
          "CAST(n_chars AS DECIMAL(19,0))")).as("q1"))
    val tot = m.agg(sum("n1").as("ntv"), sum("s1").as("stv"),
      sum("q1").as("qtv"))
    ordered(
      m.crossJoin(broadcast(tot))
        .withColumn("m1", expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"))
        .withColumn("m2", expr(
          "CAST(stv - s1 AS DOUBLE) / CAST(ntv - n1 AS DOUBLE)"))
        .withColumn("v1", expr(
          "(CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * m1) / " +
            "CAST(n1 - 1 AS DOUBLE)"))
        .withColumn("v2", expr(
          "(CAST(qtv - q1 AS DOUBLE) - CAST(stv - s1 AS DOUBLE) * m2) / " +
            "CAST(ntv - n1 - 1 AS DOUBLE)"))
        .withColumn("se1", expr("v1 / CAST(n1 AS DOUBLE)"))
        .withColumn("se2", expr("v2 / CAST(ntv - n1 AS DOUBLE)"))
        .select(col("source"), big(col("n1")).as("n1"),
          big(expr("ntv - n1")).as("n2"),
          expr("CAST(floor((m1 - m2) / sqrt(se1 + se2) * 1000) " +
            "AS BIGINT)").as("t_milli"),
          expr("CAST(floor((se1 + se2) * (se1 + se2) / " +
            "(se1 * se1 / CAST(n1 - 1 AS DOUBLE) + " +
            "se2 * se2 / CAST(ntv - n1 - 1 AS DOUBLE)) * 1000) " +
            "AS BIGINT)").as("df_milli")),
      "source")
  }

  val defs: Map[String, Q] = Map(
    "op277_psi" -> op277Psi,
    "op270_acf" -> op270Acf,
    "op273_stream_acf" -> op273StreamAcf,
    "op268_welch_t" -> op268WelchT,
    "op251_conformal_coverage" -> op251ConformalCoverage,
    "op257_stream_conformal" -> op257StreamConformal,
    "op256_forecast_backtest" -> op256ForecastBacktest,
    "op250_heavy_changers" -> op250HeavyChangers,
    "op260_stream_changers" -> op260StreamChangers,
    "op247_centroid_drift" -> op247CentroidDrift,
    "op244_srm_gate" -> op244SrmGate,
    "op262_stream_srm" -> op262StreamSrm,
    "op243_bootstrap_ci" -> op243BootstrapCi,
    "op232_theil_sen" -> op232TheilSen,
    "op233_mann_whitney" -> op233MannWhitney,
    "op234_kendall_tau" -> op234KendallTau,
    "op235_cusum" -> op235Cusum,
    "op236_stream_mwu" -> op236StreamMwu,
    "op240_stream_cusum" -> op240StreamCusum,
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
    ("op193_stream_drift" -> baseOracle("op187_ks_drift")) +
    // op236 merges streamed counts exactly -> op233's oracle verbatim
    ("op236_stream_mwu" -> baseOracle("op233_mann_whitney")) +
    // op240 merges streamed cents sums exactly -> op235's oracle verbatim
    ("op240_stream_cusum" -> baseOracle("op235_cusum")) +
    // op257 merges streamed cents sums exactly -> op251's oracle verbatim
    ("op257_stream_conformal" -> baseOracle("op251_conformal_coverage")) +
    // op260 merges streamed half counts exactly -> op250's oracle verbatim
    ("op260_stream_changers" -> baseOracle("op250_heavy_changers")) +
    // op262 unions streamed distinct users exactly -> op244's oracle
    ("op262_stream_srm" -> baseOracle("op244_srm_gate")) +
    // op273 merges streamed cents sums exactly -> op270's oracle verbatim
    ("op273_stream_acf" -> baseOracle("op270_acf"))

  private lazy val baseOracle: Map[String, String] = Map(
    "op277_psi" ->
      """WITH cnt AS (
        |  SELECT source, CAST(n_chars // 100 AS BIGINT) AS bucket,
        |    CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |tot AS (SELECT bucket, CAST(sum(c) AS BIGINT) AS ct
        |        FROM cnt GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n1
        |       FROM cnt GROUP BY 1),
        |nt AS (SELECT CAST(sum(ct) AS BIGINT) AS nt,
        |         CAST(count(*) AS BIGINT) AS nb FROM tot),
        |grid AS (
        |  SELECT s.source, s.n1, v.nt, v.nb, t.bucket, t.ct,
        |    coalesce(c.c, 0) AS c1
        |  FROM ns s CROSS JOIN nt v CROSS JOIN tot t
        |  LEFT JOIN cnt c ON c.source = s.source AND c.bucket = t.bucket),
        |pq AS (
        |  SELECT source, n1, nt, nb,
        |    CAST(c1 + 1 AS DOUBLE) / CAST(n1 + nb AS DOUBLE) AS p,
        |    CAST(ct - c1 + 1 AS DOUBLE) / CAST(nt - n1 + nb AS DOUBLE) AS q
        |  FROM grid),
        |terms AS (
        |  SELECT source, n1, nt, nb,
        |    CAST(floor((p - q) * ln(p / q) * 1000000000) AS BIGINT)
        |      AS term_nano
        |  FROM pq)
        |SELECT source, CAST(max(n1) AS BIGINT) AS n1,
        |  CAST(max(nt - n1) AS BIGINT) AS n2,
        |  CAST(max(nb) AS BIGINT) AS n_buckets,
        |  CAST(sum(term_nano) AS BIGINT) AS psi_nano
        |FROM terms GROUP BY 1 ORDER BY source""".stripMargin,
    "op270_acf" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |base AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(y) AS BIGINT) AS sy
        |  FROM grid GROUP BY 1),
        |g AS (
        |  SELECT gr.event_type, gr.day, gr.y, b.n, b.sy
        |  FROM grid gr JOIN base b USING (event_type)),
        |den AS (
        |  SELECT event_type,
        |    sum(CAST(n * y - sy AS DECIMAL(19,0)) *
        |        CAST(n * y - sy AS DECIMAL(19,0))) AS den
        |  FROM g GROUP BY 1),
        |pairs AS (
        |  SELECT a.event_type, l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |    sum(CAST(a.n * a.y - a.sy AS DECIMAL(19,0)) *
        |        CAST(a.n * b.y - a.sy AS DECIMAL(19,0))) AS num
        |  FROM g a
        |  CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
        |  JOIN g b ON b.event_type = a.event_type
        |    AND b.day = a.day + l.lag
        |  GROUP BY 1, 2)
        |SELECT p.event_type, CAST(p.lag AS BIGINT) AS lag, p.n_pairs,
        |  CAST(CASE WHEN d.den = 0 THEN NULL
        |       ELSE floor(CAST(p.num AS DOUBLE) / CAST(d.den AS DOUBLE)
        |            * 10000) END AS BIGINT) AS r_bp
        |FROM pairs p JOIN den d USING (event_type)
        |ORDER BY event_type, lag""".stripMargin,
    "op268_welch_t" ->
      """WITH m AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n1,
        |    CAST(sum(n_chars) AS BIGINT) AS s1,
        |    sum(CAST(n_chars AS DECIMAL(19,0)) *
        |        CAST(n_chars AS DECIMAL(19,0))) AS q1
        |  FROM documents GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(n1) AS BIGINT) AS ntv,
        |    CAST(sum(s1) AS BIGINT) AS stv,
        |    sum(q1) AS qtv FROM m),
        |e1 AS (
        |  SELECT source, n1, ntv, stv, qtv, s1, q1,
        |    CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS m1,
        |    CAST(stv - s1 AS DOUBLE) / CAST(ntv - n1 AS DOUBLE) AS m2
        |  FROM m CROSS JOIN tot),
        |e2 AS (
        |  SELECT *,
        |    (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * m1) /
        |      CAST(n1 - 1 AS DOUBLE) AS v1,
        |    (CAST(qtv - q1 AS DOUBLE) - CAST(stv - s1 AS DOUBLE) * m2) /
        |      CAST(ntv - n1 - 1 AS DOUBLE) AS v2
        |  FROM e1),
        |e3 AS (
        |  SELECT *, v1 / CAST(n1 AS DOUBLE) AS se1,
        |    v2 / CAST(ntv - n1 AS DOUBLE) AS se2
        |  FROM e2)
        |SELECT source, n1, CAST(ntv - n1 AS BIGINT) AS n2,
        |  CAST(floor((m1 - m2) / sqrt(se1 + se2) * 1000) AS BIGINT)
        |    AS t_milli,
        |  CAST(floor((se1 + se2) * (se1 + se2) /
        |    (se1 * se1 / CAST(n1 - 1 AS DOUBLE) +
        |     se2 * se2 / CAST(ntv - n1 - 1 AS DOUBLE)) * 1000)
        |    AS BIGINT) AS df_milli
        |FROM e3 ORDER BY source""".stripMargin,
    "op256_forecast_backtest" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |fit AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(day) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(day * day) AS BIGINT) AS sxx,
        |    CAST(sum(day * y) AS BIGINT) AS sxy
        |  FROM grid WHERE day < 15 GROUP BY 1),
        |p AS (
        |  SELECT g.event_type, g.y,
        |    (f.sy * (f.n * f.sxx - f.sx * f.sx) +
        |     (f.n * f.sxy - f.sx * f.sy) * (f.n * g.day - f.sx)) * 1000
        |      AS pnum,
        |    f.n * (f.n * f.sxx - f.sx * f.sx) AS pden
        |  FROM grid g JOIN fit f ON g.event_type = f.event_type
        |  WHERE g.day >= 15),
        |e AS (
        |  SELECT event_type,
        |    y * 1000 - (CASE WHEN pnum < 0 THEN -1 ELSE 1 END) *
        |      (abs(pnum) // pden) AS err
        |  FROM p)
        |SELECT event_type, CAST(count(*) AS BIGINT) AS n_eval,
        |  CAST(sum(abs(err)) // count(*) AS BIGINT) AS mae_milli,
        |  CAST((CASE WHEN sum(err) < 0 THEN -1 ELSE 1 END) *
        |       (abs(CAST(sum(err) AS BIGINT)) // count(*)) AS BIGINT)
        |    AS bias_milli
        |FROM e GROUP BY 1 ORDER BY event_type""".stripMargin,
    "op251_conformal_coverage" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |cal AS (
        |  SELECT event_type, day, y,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY y ASC, day ASC) AS ra,
        |    row_number() OVER (PARTITION BY event_type
        |      ORDER BY y DESC, day DESC) AS rd,
        |    CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
        |      AS n_cal
        |  FROM grid WHERE day < 15),
        |b AS (
        |  SELECT event_type, CAST(max(n_cal) AS BIGINT) AS n_cal,
        |    CAST(max(CASE WHEN ra = greatest(n_cal // 20, 1)
        |         THEN y END) AS BIGINT) AS lo,
        |    CAST(max(CASE WHEN rd = greatest(n_cal // 20, 1)
        |         THEN y END) AS BIGINT) AS hi
        |  FROM cal GROUP BY 1)
        |SELECT g.event_type, b.n_cal,
        |  CAST(count(*) AS BIGINT) AS n_eval, b.lo, b.hi,
        |  CAST(sum(CASE WHEN g.y BETWEEN b.lo AND b.hi THEN 1 ELSE 0 END)
        |       AS BIGINT) AS inside,
        |  CAST((sum(CASE WHEN g.y BETWEEN b.lo AND b.hi THEN 1 ELSE 0
        |       END) * 10000) // count(*) AS BIGINT) AS cover_bp
        |FROM grid g JOIN b ON g.event_type = b.event_type
        |WHERE g.day >= 15
        |GROUP BY g.event_type, b.n_cal, b.lo, b.hi
        |ORDER BY g.event_type""".stripMargin,
    "op250_heavy_changers" ->
      """WITH c AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN date_diff('day', DATE '2024-01-01',
        |         CAST(ts AS DATE)) < 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(sum(CASE WHEN date_diff('day', DATE '2024-01-01',
        |         CAST(ts AS DATE)) >= 15 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c2
        |  FROM events GROUP BY 1),
        |r AS (
        |  SELECT user_id, c1, c2, c2 - c1 AS delta,
        |    CAST(row_number() OVER (ORDER BY abs(c2 - c1) DESC, user_id)
        |         AS BIGINT) AS rank
        |  FROM c)
        |SELECT rank, user_id, c1, c2, CAST(delta AS BIGINT) AS delta
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,
    "op247_centroid_drift" ->
      """WITH comp AS (
        |  SELECT label, vec_id % 2 AS half, i AS dim,
        |    CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000000)
        |         AS BIGINT) AS q
        |  FROM embeddings, LATERAL (SELECT unnest(range(64)) AS i) u),
        |cent AS (
        |  SELECT label, half, dim,
        |    CAST(sum(q) AS BIGINT) AS sq, CAST(count(*) AS BIGINT) AS n
        |  FROM comp GROUP BY 1, 2, 3),
        |m AS (
        |  SELECT label, half, dim, n,
        |    (CASE WHEN sq < 0 THEN -1 ELSE 1 END) * (abs(sq) // n) AS m
        |  FROM cent),
        |j AS (
        |  SELECT o.label, o.m AS mo, w.m AS mn, o.n AS no, w.n AS nn
        |  FROM m o JOIN m w ON o.label = w.label AND o.dim = w.dim
        |  WHERE o.half = 0 AND w.half = 1),
        |agg AS (
        |  SELECT label, CAST(max(no) AS BIGINT) AS n_old,
        |    CAST(max(nn) AS BIGINT) AS n_new,
        |    CAST(sum(mo * mn) AS BIGINT) AS dot,
        |    CAST(sum(mo * mo) AS BIGINT) AS n2o,
        |    CAST(sum(mn * mn) AS BIGINT) AS n2n
        |  FROM j GROUP BY 1)
        |SELECT CAST(label AS BIGINT) AS label, n_old, n_new,
        |  CASE WHEN n2o = 0 OR n2n = 0 THEN CAST(0 AS BIGINT)
        |    ELSE CAST(floor(CAST(dot AS DOUBLE) /
        |      (sqrt(CAST(n2o AS DOUBLE)) * sqrt(CAST(n2n AS DOUBLE)))
        |      * 10000) AS BIGINT) END AS cos_bp
        |FROM agg ORDER BY label""".stripMargin,
    "op244_srm_gate" ->
      """WITH arms AS (
        |  SELECT DISTINCT user_id,
        |    ('0x' || substring(md5('srm' || '|' ||
        |       CAST(user_id AS VARCHAR)), 1, 15))::BIGINT % 2 AS arm
        |  FROM events),
        |cnt AS (
        |  SELECT 'ab1' AS experiment,
        |    CAST(sum(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS o0,
        |    CAST(sum(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS o1
        |  FROM arms)
        |SELECT experiment, o0, o1, CAST(o0 + o1 AS BIGINT) AS n,
        |  CAST(((o0 - o1) * (o0 - o1) * 1000) // (o0 + o1) AS BIGINT)
        |    AS chi2_milli,
        |  CAST(CASE WHEN ((o0 - o1) * (o0 - o1) * 1000) // (o0 + o1)
        |       > 3841 THEN 1 ELSE 0 END AS BIGINT) AS srm
        |FROM cnt ORDER BY experiment""".stripMargin,
    "op243_bootstrap_ci" -> {
      val wCase = "CASE " + poisCdf60.zipWithIndex.map { case (t, k) =>
        s"WHEN h < $t THEN $k " }.mkString + "ELSE 6 END"
      s"""WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |bs AS (
        |  SELECT g.event_type, g.y, r.b,
        |    ('0x' || substring(md5(
        |       'bs' || '|' || g.event_type || '|' ||
        |       CAST(g.day AS VARCHAR) || '|' || CAST(r.b AS VARCHAR)),
        |       1, 15))::BIGINT AS h
        |  FROM grid g CROSS JOIN
        |    (SELECT unnest(range(32)) AS b) r),
        |means AS (
        |  SELECT event_type, b,
        |    CAST(sum($wCase) AS BIGINT) AS sw,
        |    CAST(sum(($wCase) * y) AS BIGINT) AS swy
        |  FROM bs GROUP BY 1, 2),
        |mm AS (
        |  SELECT event_type, b,
        |    (CASE WHEN swy < 0 THEN -1 ELSE 1 END) *
        |      ((abs(swy) * 1000) // greatest(sw, 1)) AS m_milli
        |  FROM means),
        |ci AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_b,
        |    CAST(min(m_milli) AS BIGINT) AS lo_milli,
        |    CAST(max(m_milli) AS BIGINT) AS hi_milli
        |  FROM mm GROUP BY 1),
        |pt AS (
        |  SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST((CASE WHEN sum(y) < 0 THEN -1 ELSE 1 END) *
        |      ((abs(CAST(sum(y) AS BIGINT)) * 1000) // count(*))
        |      AS BIGINT) AS mean_milli
        |  FROM grid GROUP BY 1)
        |SELECT ci.event_type, ci.n_b, ci.lo_milli, ci.hi_milli,
        |  pt.n_days, pt.mean_milli
        |FROM ci JOIN pt ON ci.event_type = pt.event_type
        |ORDER BY ci.event_type""".stripMargin
    },
    "op233_mann_whitney" ->
      """WITH grid AS (
        |  SELECT n_chars AS v,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c1,
        |    CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c2
        |  FROM documents GROUP BY 1),
        |walk AS (
        |  SELECT c1, c1 + c2 AS t,
        |    CAST(sum(c1 + c2) OVER (ORDER BY v) - (c1 + c2)
        |         AS BIGINT) AS pfx,
        |    CAST(sum(c1) OVER () AS BIGINT) AS n1,
        |    CAST(sum(c2) OVER () AS BIGINT) AS n2
        |  FROM grid),
        |agg AS (
        |  SELECT n1, n2,
        |    CAST(sum(c1 * (2 * pfx + t + 1)) - n1 * (n1 + 1)
        |         AS BIGINT) AS u1_x2,
        |    CAST(sum(t * t * t - t) AS BIGINT) AS tie_term
        |  FROM walk GROUP BY n1, n2)
        |SELECT n1, n2, u1_x2,
        |  CAST(2 * n1 * n2 - u1_x2 AS BIGINT) AS u2_x2, tie_term,
        |  CAST((u1_x2 * 10000) // (2 * n1 * n2) AS BIGINT) AS auc_bp
        |FROM agg ORDER BY n1""".stripMargin,
    "op234_kendall_tau" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |series AS (
        |  SELECT a.event_type AS ta, b.event_type AS tb, a.day,
        |    a.y AS ya, b.y AS yb
        |  FROM grid a JOIN grid b ON a.day = b.day
        |  WHERE a.event_type < b.event_type),
        |pairs AS (
        |  SELECT p.ta, p.tb,
        |    (CASE WHEN q.ya > p.ya THEN 1
        |          WHEN q.ya < p.ya THEN -1 ELSE 0 END) AS sx,
        |    (CASE WHEN q.yb > p.yb THEN 1
        |          WHEN q.yb < p.yb THEN -1 ELSE 0 END) AS sy
        |  FROM series p JOIN series q
        |    ON p.ta = q.ta AND p.tb = q.tb AND p.day < q.day),
        |agg AS (
        |  SELECT ta, tb, CAST(count(*) AS BIGINT) AS n_pairs,
        |    CAST(sum(CASE WHEN sx * sy = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS nc,
        |    CAST(sum(CASE WHEN sx * sy = -1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS nd,
        |    CAST(sum(CASE WHEN sx = 0 AND sy <> 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tie_x,
        |    CAST(sum(CASE WHEN sy = 0 AND sx <> 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tie_y,
        |    CAST(sum(CASE WHEN sx = 0 AND sy = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS tie_both
        |  FROM pairs GROUP BY 1, 2)
        |SELECT ta, tb, n_pairs, nc, nd, tie_x, tie_y, tie_both,
        |  CAST((CASE WHEN nc - nd < 0 THEN -1 ELSE 1 END) *
        |       ((abs(nc - nd) * 10000) // n_pairs) AS BIGINT) AS tau_a_bp
        |FROM agg ORDER BY ta, tb""".stripMargin,
    "op235_cusum" ->
      """WITH grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |walk AS (
        |  SELECT event_type, day,
        |    abs(CAST(count(*) OVER w0 AS BIGINT) *
        |        CAST(sum(y) OVER (PARTITION BY event_type ORDER BY day)
        |             AS BIGINT) -
        |        CAST(row_number() OVER
        |             (PARTITION BY event_type ORDER BY day) AS BIGINT) *
        |        CAST(sum(y) OVER w0 AS BIGINT)) AS s_abs,
        |    CAST(count(*) OVER w0 AS BIGINT) AS n_days
        |  FROM grid
        |  WINDOW w0 AS (PARTITION BY event_type)),
        |mx AS (
        |  SELECT event_type, n_days, s_abs,
        |    CAST(max(s_abs) OVER (PARTITION BY event_type)
        |         AS BIGINT) AS smax, day
        |  FROM walk)
        |SELECT event_type, n_days, CAST(smax AS BIGINT) AS smax_scaled,
        |  CAST(min(day) AS BIGINT) AS cp_day
        |FROM mx WHERE s_abs = smax
        |GROUP BY event_type, n_days, smax
        |ORDER BY event_type""".stripMargin,
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
