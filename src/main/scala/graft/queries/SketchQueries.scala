package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CountMin, TopKAgg}
import graft.sources.Tables
import Det.{big, ordered}

/** Sketch + sequence-analytics pack: KMV cardinality estimation, Markov
  * event transitions, trailing-window spike detection, and Pareto
  * skyline — all oracle-gated through the repo's exact-integer
  * conventions (md5-60 hashing, integer `div`, basis points).
  */
object SketchQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- op165

  private val kmvK = 64

  /** 40-bit order-preserving truncation of the md5-60 hash: KMV needs
    * min-order only, and 40 bits keeps (k−1)·2⁴⁰ inside BIGINT so the
    * estimator is EXACT integer arithmetic on both engines (the full
    * 60-bit space would overflow (k−1)·2⁶⁰ past 2⁶³). */
  private val kmvSpace = 1099511627776L // 2^40

  /** op172's grid: finer than op159's heavy-hitter grid (the inner
    * product sums collision noise over ALL buckets, so width buys
    * accuracy quadratically). */
  private val cmsDepth = 4
  private val cmsWidth = 512

  /** op165: K-minimum-values distinct-count sketch — per language, the
    * number of distinct word-trigram shingles, exactly and as the KMV
    * estimate (k−1)·2⁴⁰ div h_k from the k smallest distinct 40-bit
    * hashes. The deterministic, ORACLE-GATED counterpart of op42's HLL
    * (whose estimate is spec-bounded rows-only by contract): same
    * sketch role, but every emitted number replays bit-for-bit in SQL.
    *
    * 100 TB shape: KMV state is k hashes per group — mergeable by
    * sorted-merge-truncate (the [[TopKAgg]] buffer IS that merge), so
    * the shuffle moves ≤ k rows per (group, partition) regardless of
    * cardinality; the exact count here exists only as the oracle
    * witness. Estimate error ~1/√k, one-sided-free, and unlike HLL the
    * estimator is a closed-form integer expression. */
  val op165KmvDistinct: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("lang", "text")
    val n3 = "greatest(size(split(text,' ')) - 2, 0)" // <3 words → empty
    val sh = docs.select(col("lang"), explode(expr(
      s"zip_with(zip_with(slice(split(text,' '),1,$n3), " +
        s"slice(split(text,' '),2,$n3), " +
        "(a,b) -> concat(a,' ',b)), " +
        s"slice(split(text,' '),3,$n3), " +
        "(ab,c) -> concat(ab,' ',c))")).as("sh"))
    val hashes = sh.select(col("lang"),
      expr("CAST(CONV(SUBSTRING(MD5(CAST(sh AS BINARY)), 1, 15), 16, 10) " +
        s"AS BIGINT) div 1048576").as("h40")) // div 2^20: keep top 40 bits
      .distinct()
    val sketch = hashes.groupBy("lang")
      .agg(TopKAgg.topK(kmvK)(-col("h40"), col("h40")).as("mins"),
        count(lit(1)).as("n_exact"))
    ordered(
      sketch.select(col("lang"), col("n_exact"),
        expr(s"CAST(CASE WHEN size(mins) < $kmvK THEN size(mins) " +
          s"ELSE (${kmvK - 1} * ${kmvSpace}L) div " +
          s"greatest(element_at(mins, $kmvK).id, 1L) " +
          "END AS BIGINT)").as("kmv_est")),
      "lang")
  }

  // ---------------------------------------------------------------- op204

  /** op204: KMV set algebra — pairwise SOURCE overlap estimated from
    * per-source KMV sketches (the theta-sketch role): union size from
    * the merged sketch's k-th smallest hash, intersection and Jaccard
    * from sketch-membership matches. The corpus-overlap planning
    * estimate (which crawls mirror each other) at sketch cost — the
    * mergeable counterpart of op95's exact pair report, and op165's
    * estimator extended from one set to set ALGEBRA. Estimator
    * identities used: the k smallest of A∪B lie inside K(A)∪K(B)
    * (merge-truncate is closed), and for h ∈ K(A∪B), h ∈ A ⟺
    * h ∈ K(A) — so matches m = |K(A∪B) ∩ K(A) ∩ K(B)| and
    * ĴACCARD = m/k', Î∩ = m·Û/k', all exact integer arithmetic on
    * 40-bit md5 hashes (deterministic ⇒ ORACLE-GATED, unlike
    * datasketches' seeded theta).
    *
    * 100 TB shape: one shuffle builds every source's sketch (state =
    * k hashes per (source, partition) through the TopKAgg buffer —
    * the op165 merge argument); the pair grid is |sources|²-bounded
    * array arithmetic on broadcast sketches. The EXACT intersection
    * column is the oracle witness (the op165 posture): a deployment
    * reports the estimates and samples the exact pairs it acts on. */
  val op204KmvSetOps: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("source", "text")
    val n3 = "greatest(size(split(text,' ')) - 2, 0)"
    val sh = docs.select(col("source"), explode(expr(
      s"zip_with(zip_with(slice(split(text,' '),1,$n3), " +
        s"slice(split(text,' '),2,$n3), " +
        "(a,b) -> concat(a,' ',b)), " +
        s"slice(split(text,' '),3,$n3), " +
        "(ab,c) -> concat(ab,' ',c))")).as("sh"))
    val hashes = sh.select(col("source"),
      expr("CAST(CONV(SUBSTRING(MD5(CAST(sh AS BINARY)), 1, 15), 16, 10) " +
        s"AS BIGINT) div 1048576").as("h40"))
      .distinct()
    val sk = hashes.groupBy("source")
      .agg(TopKAgg.topK(kmvK)(-col("h40"), col("h40")).as("mins"),
        count(lit(1)).as("n_exact"))
      .select(col("source"), expr("transform(mins, x -> x.id)").as("ids"),
        col("n_exact"))
    // exact pairwise intersection (the oracle witness): one h40
    // self-equi-join, fan-out bounded by sources² per shared shingle
    val ix = hashes.select(col("source").as("s1"), col("h40"))
      .join(hashes.select(col("source").as("s2"), col("h40")), Seq("h40"))
      .where(col("s1") < col("s2"))
      .groupBy("s1", "s2").agg(count(lit(1)).as("inter_exact"))
    val grid = sk.select(col("source").as("s1"), col("ids").as("ids1"),
        col("n_exact").as("n1"))
      .join(sk.select(col("source").as("s2"), col("ids").as("ids2"),
        col("n_exact").as("n2")), col("s1") < col("s2"))
      .withColumn("uk",
        expr(s"slice(array_sort(array_union(ids1, ids2)), 1, $kmvK)"))
      .withColumn("cnt_u", expr("CAST(size(uk) AS BIGINT)"))
      .withColumn("m_matches", expr(
        "CAST(size(array_intersect(uk, array_intersect(ids1, ids2))) " +
          "AS BIGINT)"))
      .withColumn("est_union", expr(
        s"CAST(CASE WHEN cnt_u < $kmvK THEN cnt_u " +
          s"ELSE (${kmvK - 1} * ${kmvSpace}L) div " +
          s"greatest(element_at(uk, $kmvK), 1L) END AS BIGINT)"))
      .withColumn("jaccard_est_bp",
        expr("m_matches * 10000 div greatest(cnt_u, 1L)"))
      .withColumn("inter_est",
        expr("(m_matches * est_union) div greatest(cnt_u, 1L)"))
    ordered(
      grid.join(ix, Seq("s1", "s2"), "left")
        .select(col("s1"), col("s2"), col("n1"), col("n2"),
          coalesce(col("inter_exact"), lit(0L)).as("inter_exact"),
          (col("n1") + col("n2") -
            coalesce(col("inter_exact"), lit(0L))).as("union_exact"),
          col("cnt_u"), col("m_matches"), col("est_union"),
          col("inter_est"), col("jaccard_est_bp"))
        .withColumn("jaccard_exact_bp",
          expr("(inter_exact * 10000) div union_exact")),
      "s1", "s2")
  }

  // ---------------------------------------------------------------- op166

  /** op166: Markov transition matrix — per user, order events by time and
    * count (previous type → type) transitions; emit counts and the
    * per-source-row transition probability in basis points (integer
    * division). The path-analysis primitive.
    *
    * 100 TB shape: ONE shuffle to the per-user window (lag over
    * (user, time) — partitions bounded by a user's own history), then a
    * map-combinable count keyed by the 5×5 transition grid; the final
    * probability join is against a 5-row broadcast. */
  val op166MarkovTransitions: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_ns"),
        col("event_id"))
    val trans = ev
      .withColumn("prev", lag("event_type", 1).over(
        Window.partitionBy("user_id").orderBy("ts_ns", "event_id")))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("prev_type"),
        col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("prev_type").agg(sum("n").as("tot"))
    ordered(
      trans.join(broadcast(totals), "prev_type")
        .withColumn("prob_bp", expr("CAST(n * 10000 div tot AS BIGINT)"))
        .select("prev_type", "cur_type", "n", "prob_bp"),
      "prev_type", "cur_type")
  }

  // ---------------------------------------------------------------- op167

  /** op167: trailing-window spike detection — daily event counts per
    * type vs their own trailing 7-day window (RANGE frame on the
    * integer day index, so missing days genuinely shrink the window);
    * a day spikes when 70·cnt > 13·trailing-sum (count > 1.3× the
    * trailing daily average — exact integer inequality, no division).
    * Warm-up days (index < 7) are emitted unflagged.
    *
    * 100 TB shape: the daily rollup is map-combinable (type × day grid);
    * the window runs over that tiny grid, not over raw events — the
    * aggregate-then-window order is the whole trick. */
  val op167SpikeDetect: Q = (s, d) => {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day_idx"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("day_idx")
      .rangeBetween(-7, -1)
    ordered(
      daily.withColumn("trailing",
          coalesce(sum("n").over(w), lit(0L)))
        .withColumn("spike",
          expr("CAST(CASE WHEN day_idx >= 7 AND n * 70 > trailing * 13 " +
            "THEN 1 ELSE 0 END AS BIGINT)")),
      "event_type", "day_idx")
  }

  // ---------------------------------------------------------------- op216

  /** op216: seasonal-baseline anomaly — each (event type, day)'s count
    * judged against the SAME-WEEKDAY leave-one-out mean over the whole
    * span: anomalous iff n > 1.5 × mean(other same-weekday days),
    * spelled as the cross-multiplication
    * `n·(n_wd−1)·10 > (sum_wd−n)·15` — no division anywhere, so the
    * comparison is exact on both engines. The seasonality-aware
    * complement of op167's trailing window: a Sunday spike is judged
    * against Sundays, not against the busy weekdays before it (the
    * false-positive class trailing windows can't avoid).
    *
    * 100 TB shape: two map-combinable aggregates — the corpus collapses
    * onto the (type, day) grid first, the (type, weekday) baseline is a
    * second aggregate OVER THE GRID (≤ types×7 rows, broadcast back);
    * leave-one-out comes free from (sum − n), no per-day re-aggregation
    * of the corpus. */
  /** The shared weekday-baseline tail over a (event_type, day_idx, n)
    * grid — op216 feeds it the batch rollup, op220 the
    * stream-maintained merge; one tail, one oracle. */
  private def seasonalTail(daily0: DataFrame): DataFrame = {
    val daily = daily0.withColumn("wd", expr("day_idx % 7"))
    val base = daily.groupBy("event_type", "wd")
      .agg(big(count(lit(1))).as("n_wd"), sum("n").as("sum_wd"))
    ordered(
      daily.join(broadcast(base), Seq("event_type", "wd"))
        .withColumn("anomaly", expr(
          "CAST(CASE WHEN n_wd > 1 AND n * (n_wd - 1) * 10 > " +
            "(sum_wd - n) * 15 THEN 1 ELSE 0 END AS BIGINT)"))
        .select("event_type", "day_idx", "wd", "n", "n_wd", "sum_wd",
          "anomaly"),
      "event_type", "day_idx")
  }

  val op216SeasonalAnomaly: Q = (s, d) =>
    seasonalTail(Tables.events(s, d)
      .groupBy(col("event_type"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day_idx"))
      .agg(count(lit(1)).as("n")))

  /** op220: STREAMING seasonal anomaly — op216's online leg: events
    * stream in 4 micro-batches split by event id (one day's traffic
    * genuinely spans batches), per-batch (type, day) count partials
    * appended, serving merge an element-wise sum — the mergeable-count
    * argument (op169/op193), so the maintained grid is bit-equal to
    * the batch rollup and the anomaly tail runs under op216's
    * UNCHANGED oracle. See [[graft.streaming.SeasonalStream]]. */
  val op220StreamSeasonal: Q = (s, d) => {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_seasonal_state").toString
    seasonalTail(graft.streaming.SeasonalStream
      .maintainedDailyCounts(s, d, stateDir))
  }

  // ---------------------------------------------------------------- op168

  /** op168: 2-D Pareto skyline of lineitem on (price min, discount max) —
    * an item survives iff NO other item dominates it: (p_j < p_i ∧
    * d_j ≥ d_i) or (p_j ≤ p_i ∧ d_j > d_i). Exact cents / basis points.
    *
    * 100 TB shape: dominance collapses onto the DISTINCT-discount grid —
    * one map-combinable per-discount min-price aggregate (|grid| rows,
    * here 11), a running min over that tiny grid (minp over disc ≥ d /
    * disc > d), then a BROADCAST join back: every item is judged by two
    * scalars from the grid, so the corpus is never sorted globally and
    * never self-joined (the window-sort skyline would single-partition a
    * global ORDER BY; the n² NOT-EXISTS is worse). Works whenever one
    * dimension has bounded distinct values — the general case falls back
    * to range-partition + local-skyline + merge. */
  val op168Skyline: Q = (s, d) => {
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber").cast("bigint").as("l_linenumber"),
      round(col("l_extendedprice") * 100, 0).cast("bigint").as("price_cents"),
      round(col("l_discount") * 10000, 0).cast("bigint").as("disc_bp"))
    val grid = li.groupBy("disc_bp").agg(min("price_cents").as("mn"))
    val wGt = Window.orderBy(col("disc_bp").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wGe = Window.orderBy(col("disc_bp").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val dom = grid
      .withColumn("minp_gt", min("mn").over(wGt))  // min price, disc >  d
      .withColumn("minp_ge", min("mn").over(wGe))  // min price, disc >= d
      .select("disc_bp", "minp_gt", "minp_ge")
    ordered(
      li.join(broadcast(dom), "disc_bp")
        .where(col("price_cents") === col("minp_ge") &&
          (col("minp_gt").isNull || col("minp_gt") > col("price_cents")))
        .select("l_orderkey", "l_linenumber", "price_cents", "disc_bp"),
      "l_orderkey", "l_linenumber")
  }

  // ---------------------------------------------------------------- op170

  private val copurchaseMinSupport = 3L

  /** op170: market-basket co-purchase pairs — part pairs appearing
    * together in ≥ minSupport orders, with integer-bp lift
    * (pair_orders · total_orders · 10⁴ div (orders_a · orders_b)).
    *
    * 100 TB shape: the pair fan-out is the per-order self-join — bounded
    * by (items per order)², a per-basket constant (TPC-H ≤ 7, retail
    * ~tens), never corpus²; pair counts are map-combinable and the
    * support threshold prunes before the lift join (the A-priori
    * argument: no pair below support survives to downstream work). The
    * per-part order counts broadcast. */
  val op170Copurchase: Q = (s, d) => {
    // Optimization r16 (guide §2.3/§2.4): the old spelling scanned +
    // distinct'd lineitem once per consumer (partOrders, the total
    // count, BOTH self-join sides — four subtree evaluations, five
    // exchanges). One order-keyed collect_set aggregate now feeds all
    // three consumers from a single checkpointed basket table: the
    // distinct-order count is its row count, per-part order counts are
    // an explode + map-combinable aggregate, and the pair fan-out is
    // the same map-side suffix-pairing the SeqGraph family uses
    // (baskets are per-order bounded, so the array is too). Results
    // bit-identical (hash-gated).
    //
    // Declared data-shape assumption (r16 verdict item 2): collect_set
    // materializes the FULL per-order array in one aggregation buffer
    // and the suffix pairing explodes O(basket²) rows — bounded here by
    // the order line cap (TPC-H ≤ 7 items/order; retail ~tens). On a
    // corpus where one key can hold thousands of members, pre-prune
    // oversized keys with a count-based semi-join (or band the basket)
    // BEFORE collecting — the op181 salting rule applied to aggregation.
    val baskets = Tables.lineitem(s, d)
      .select("l_orderkey", "l_partkey")
      .groupBy("l_orderkey")
      .agg(array_sort(collect_set(col("l_partkey"))).as("ps"))
      .localCheckpoint()
    val total = baskets.count()
    val partOrders = baskets
      .select(explode(col("ps")).as("l_partkey"))
      .groupBy("l_partkey").agg(count(lit(1)).as("n_ord"))
    val pairs = baskets
      .select(explode(expr(
        "flatten(transform(ps, (x, i) -> " +
          "transform(slice(ps, i + 2, size(ps)), " +
          "y -> struct(x AS p1, y AS p2))))")).as("pr"))
      .select(col("pr.p1").as("p1"), col("pr.p2").as("p2"))
      .groupBy("p1", "p2").agg(count(lit(1)).as("n"))
      .where(col("n") >= copurchaseMinSupport)
    ordered(
      pairs
        .join(broadcast(partOrders.withColumnRenamed("l_partkey", "p1")
          .withColumnRenamed("n_ord", "n1")), "p1")
        .join(broadcast(partOrders.withColumnRenamed("l_partkey", "p2")
          .withColumnRenamed("n_ord", "n2")), "p2")
        .withColumn("lift_bp",
          expr(s"CAST(n * ${total}L * 10000 div (n1 * n2) AS BIGINT)"))
        .select("p1", "p2", "n", "lift_bp"),
      "p1", "p2")
  }

  // ---------------------------------------------------------------- op171

  /** op171: rank-based winsorization — per language, the exact
    * nearest-rank p5/p95 of n_chars (rank = ceil(q·n) over the sorted
    * multiset, deterministic tie order), every document clamped into
    * [p5, p95] with a touched-flag. The outlier-clipping normalization
    * step of a feature pipeline, with PERCENTILES AS EXACT INTEGERS —
    * no interpolation, so the oracle replays them bit-for-bit (op46's
    * approx-percentile stays rows-only; this is the gate-able spelling).
    *
    * 100 TB shape: the rank window sorts per language — for a bounded
    * value domain (lengths, scores) the production form is a per-group
    * value histogram (map-combinable) walked to the rank, no sort;
    * the window spelling is the fixture-scale equivalent with the same
    * output. */
  val op171Winsorize: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    val ranked = docs.withColumn("rn", row_number().over(
        Window.partitionBy("lang").orderBy("n_chars", "doc_id")))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("lang")))
    val bounds = ranked
      .where(col("rn") === expr("(5 * n + 99) div 100") ||
        col("rn") === expr("(95 * n + 99) div 100"))
      .groupBy("lang")
      .agg(min("n_chars").as("lo"), max("n_chars").as("hi"))
    ordered(
      docs.join(broadcast(bounds), "lang")
        .withColumn("clamped",
          least(greatest(col("n_chars"), col("lo")), col("hi")))
        .withColumn("clipped",
          expr("CAST(CASE WHEN clamped <> n_chars THEN 1 ELSE 0 END " +
            "AS BIGINT)"))
        .select("doc_id", "lang", "n_chars", "clamped", "clipped"),
      "doc_id")
  }

  // ---------------------------------------------------------------- op172

  /** op172: sketch-based join-size estimation — the CMS/AMS inner
    * product: |R ⋈_k S| is estimated as min over hash rows of
    * Σ_buckets cntR·cntS without touching the join itself (here R = S =
    * lineitem keyed l_partkey, so the truth is Σ_k n_k²). The
    * optimizer-statistics primitive: at 100 TB you budget a join's
    * shuffle from two d×w grids (one per side, built by each side's
    * scan) instead of running it; the estimate is one-sided
    * (est ≥ exact), the safe direction for admission control.
    * All-integer arithmetic under the hash gate. */
  val op172JoinSizeCms: Q = (s, d) => {
    val keys = Tables.lineitem(s, d)
      .select(col("l_partkey").cast("string").as("w"))
    val counters = keys
      .agg(CountMin.sketch(cmsDepth, cmsWidth)(col("w")).as("sk"))
      .select(posexplode(col("sk")))
      .select(expr(s"CAST(pos div $cmsWidth AS BIGINT)").as("r"),
        col("col").as("cnt"))
    val est = counters.groupBy("r")
      .agg(sum(col("cnt") * col("cnt")).as("ip"))
      .agg(min("ip").as("est_size"))
    val exact = Tables.lineitem(s, d).groupBy("l_partkey")
      .agg(count(lit(1)).as("n"))
      .agg(sum(col("n") * col("n")).as("exact_size"))
    ordered(
      exact.crossJoin(est)
        .withColumn("over_bp",
          expr("CAST(est_size * 10000 div exact_size AS BIGINT)"))
        .select("exact_size", "est_size", "over_bp"),
      "exact_size")
  }

  // ---------------------------------------------------------------- op241

  /** op241: integer EWMA smoother — per event type, the exponentially
    * weighted moving average of the daily cents total with α = 1/8,
    * kept EXACT by the integer recurrence s₁ = y₁,
    * sᵢ = (7·sᵢ₋₁ + yᵢ) div 8 (sign-split so truncation agrees across
    * engines): the classic online baseline/smoothing primitive that
    * trailing means (op167) approximate with a window. A recurrence
    * can't be a window function; the Spark spelling folds each type's
    * CALENDAR-BOUNDED day array with a higher-order `aggregate`
    * (declared grid cost — the op232 contract), the oracle replays it
    * as a recursive CTE.
    *
    * 100 TB shape: the corpus collapses to the daily grid first; the
    * sequential fold is per-type over ≤ span rows — the irreducible
    * data dependence of ANY exponential smoother, paid at grid size,
    * never corpus size. Streaming deployments carry sᵢ as one long of
    * state per type (the op240 grid maintenance makes the same answer
    * incremental). */
  val op241Ewma: Q = (s, d) => {
    val grid = Tables.events(s, d)
      .groupBy(col("event_type"),
        big(datediff(to_date(col("ts")), lit("2024-01-01").cast("date")))
          .as("day"))
      .agg(sum(round(col("value") * 100, 0).cast("long")).as("y"))
    val folded = grid
      .groupBy("event_type")
      .agg(sort_array(collect_list(struct(col("day"), col("y"))))
        .as("series"))
      .withColumn("ew", expr(
        """aggregate(
          |  series,
          |  cast(array() as array<struct<day:bigint,y:bigint,s:bigint>>),
          |  (acc, x) -> concat(acc, array(named_struct(
          |    'day', x.day, 'y', x.y,
          |    's', CASE WHEN size(acc) = 0 THEN x.y ELSE
          |      (CASE WHEN 7 * element_at(acc, -1).s + x.y < 0
          |            THEN -1L ELSE 1L END) *
          |      (abs(7 * element_at(acc, -1).s + x.y) div 8) END))))
          |""".stripMargin))
    ordered(
      folded.select(col("event_type"), explode(col("ew")).as("e"))
        .select(col("event_type"), col("e.day").as("day"),
          col("e.y").as("y"), col("e.s").as("ewma")),
      "event_type", "day")
  }

  // ---------------------------------------------------------------- op245

  /** op245: next-event prediction accuracy — the eval twin of op166's
    * transition matrix (what op110 is to the ANN family): the argmax
    * predictor (most frequent successor per state, ties by type name)
    * scored over the transitions themselves, per state — n_hits is the
    * winning cell's count, accuracy its share in bp. The baseline
    * number every sequence model must beat, and the drift signal when
    * behaviour shifts (accuracy of the PINNED matrix decays).
    *
    * 100 TB shape: everything after the op166 rollup runs on the
    * \|types\|² transition grid — the eval is free once the matrix
    * exists; no second pass over events. */
  val op245MarkovEval: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_type"), col("ts_ns"),
        col("event_id"))
    val trans = ev
      .withColumn("prev", lag("event_type", 1).over(
        Window.partitionBy("user_id").orderBy("ts_ns", "event_id")))
      .where(col("prev").isNotNull)
      .groupBy(col("prev").as("prev_type"),
        col("event_type").as("cur_type"))
      .agg(count(lit(1)).as("n"))
    val wp = Window.partitionBy("prev_type")
    ordered(
      trans
        .withColumn("rk", row_number().over(
          wp.orderBy(col("n").desc, col("cur_type"))))
        .withColumn("n_trans", sum("n").over(wp))
        .where(col("rk") === 1)
        .select(col("prev_type"), col("cur_type").as("predicted"),
          col("n").as("n_hits"), col("n_trans"),
          expr("(n * 10000) div n_trans").as("acc_bp")),
      "prev_type")
  }

  // ------------------------------------------------------------- wiring

  val defs: Map[String, Q] = Map(
    "op241_ewma" -> op241Ewma,
    "op245_markov_eval" -> op245MarkovEval,
    "op165_kmv_distinct" -> op165KmvDistinct,
    "op204_kmv_set_ops" -> op204KmvSetOps,
    "op166_markov_transitions" -> op166MarkovTransitions,
    "op167_spike_detect" -> op167SpikeDetect,
    "op216_seasonal_anomaly" -> op216SeasonalAnomaly,
    "op220_stream_seasonal" -> op220StreamSeasonal,
    "op168_skyline" -> op168Skyline,
    "op170_copurchase" -> op170Copurchase,
    "op171_winsorize" -> op171Winsorize,
    "op172_join_size_cms" -> op172JoinSizeCms)

  val oracle: Map[String, String] = Map(
    "op241_ewma" ->
      """WITH RECURSIVE grid AS (
        |  SELECT event_type,
        |    CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |         AS BIGINT) AS day,
        |    CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
        |  FROM events GROUP BY 1, 2),
        |idx AS (
        |  SELECT event_type, day, y,
        |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY day)
        |         AS BIGINT) AS rn
        |  FROM grid),
        |ew AS (
        |  SELECT event_type, day, y, rn, y AS s FROM idx WHERE rn = 1
        |  UNION ALL
        |  SELECT i.event_type, i.day, i.y, i.rn,
        |    CAST((CASE WHEN 7 * e.s + i.y < 0 THEN -1 ELSE 1 END) *
        |         (abs(7 * e.s + i.y) // 8) AS BIGINT)
        |  FROM idx i JOIN ew e
        |    ON i.event_type = e.event_type AND i.rn = e.rn + 1)
        |SELECT event_type, day, y, CAST(s AS BIGINT) AS ewma
        |FROM ew ORDER BY event_type, day""".stripMargin,
    "op165_kmv_distinct" ->
      s"""WITH sh AS (SELECT lang,
         |  wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] AS sh
         |  FROM (SELECT lang, string_split(text,' ') AS wl FROM documents) t,
         |       LATERAL (SELECT unnest(range(1, len(wl) - 1)) AS i) u),
         |h AS (SELECT DISTINCT lang,
         |  ('0x' || substring(md5(sh), 1, 15))::BIGINT // 1048576 AS h40
         |  FROM sh),
         |r AS (SELECT lang, h40,
         |  row_number() OVER (PARTITION BY lang ORDER BY h40) AS rk,
         |  count(*) OVER (PARTITION BY lang) AS n_exact
         |  FROM h)
         |SELECT lang, max(n_exact) AS n_exact,
         |  CAST(CASE WHEN max(n_exact) < $kmvK THEN max(n_exact)
         |       ELSE (${kmvK - 1} * $kmvSpace) //
         |            greatest(max(CASE WHEN rk = $kmvK THEN h40 END), 1)
         |       END AS BIGINT) AS kmv_est
         |FROM r GROUP BY lang ORDER BY lang""".stripMargin,
    "op204_kmv_set_ops" ->
      s"""WITH sh AS MATERIALIZED (SELECT source,
         |  wl[i] || ' ' || wl[i+1] || ' ' || wl[i+2] AS sh
         |  FROM (SELECT source, string_split(text,' ') AS wl
         |        FROM documents) t,
         |       LATERAL (SELECT unnest(range(1, len(wl) - 1)) AS i) u),
         |h AS MATERIALIZED (SELECT DISTINCT source,
         |  ('0x' || substring(md5(sh), 1, 15))::BIGINT // 1048576 AS h40
         |  FROM sh),
         |n AS MATERIALIZED (SELECT source, CAST(count(*) AS BIGINT)
         |  AS n_exact FROM h GROUP BY 1),
         |mk AS MATERIALIZED (SELECT source, h40 FROM (
         |  SELECT source, h40, row_number() OVER (PARTITION BY source
         |    ORDER BY h40) AS rk FROM h) WHERE rk <= $kmvK),
         |pr AS MATERIALIZED (SELECT a.source AS s1, b.source AS s2,
         |  a.n_exact AS n1, b.n_exact AS n2
         |  FROM n a JOIN n b ON a.source < b.source),
         |u AS MATERIALIZED (SELECT p.s1, p.s2, m.h40
         |  FROM pr p JOIN mk m ON m.source IN (p.s1, p.s2)
         |  GROUP BY 1, 2, 3),
         |uk AS MATERIALIZED (SELECT s1, s2, h40, rk FROM (
         |  SELECT s1, s2, h40, row_number() OVER (PARTITION BY s1, s2
         |    ORDER BY h40) AS rk FROM u) WHERE rk <= $kmvK),
         |us AS MATERIALIZED (SELECT s1, s2,
         |  CAST(count(*) AS BIGINT) AS cnt_u,
         |  max(CASE WHEN rk = $kmvK THEN h40 END) AS hk
         |  FROM uk GROUP BY 1, 2),
         |mm AS MATERIALIZED (SELECT k.s1, k.s2,
         |  CAST(count(*) AS BIGINT) AS m_matches
         |  FROM uk k
         |  JOIN mk x ON x.source = k.s1 AND x.h40 = k.h40
         |  JOIN mk y ON y.source = k.s2 AND y.h40 = k.h40
         |  GROUP BY 1, 2),
         |ix AS MATERIALIZED (SELECT a.source AS s1, b.source AS s2,
         |  CAST(count(*) AS BIGINT) AS inter_exact
         |  FROM h a JOIN h b ON a.h40 = b.h40 AND a.source < b.source
         |  GROUP BY 1, 2)
         |SELECT p.s1, p.s2, p.n1, p.n2,
         |  coalesce(ix.inter_exact, 0) AS inter_exact,
         |  p.n1 + p.n2 - coalesce(ix.inter_exact, 0) AS union_exact,
         |  us.cnt_u,
         |  coalesce(mm.m_matches, 0) AS m_matches,
         |  CAST(CASE WHEN us.cnt_u < $kmvK THEN us.cnt_u
         |       ELSE (${kmvK - 1} * $kmvSpace) // greatest(us.hk, 1)
         |       END AS BIGINT) AS est_union,
         |  (coalesce(mm.m_matches, 0) *
         |   CAST(CASE WHEN us.cnt_u < $kmvK THEN us.cnt_u
         |        ELSE (${kmvK - 1} * $kmvSpace) // greatest(us.hk, 1)
         |        END AS BIGINT)) // greatest(us.cnt_u, 1) AS inter_est,
         |  (coalesce(mm.m_matches, 0) * 10000) // greatest(us.cnt_u, 1)
         |    AS jaccard_est_bp,
         |  (coalesce(ix.inter_exact, 0) * 10000) //
         |    (p.n1 + p.n2 - coalesce(ix.inter_exact, 0))
         |    AS jaccard_exact_bp
         |FROM pr p
         |JOIN us USING (s1, s2)
         |LEFT JOIN mm USING (s1, s2)
         |LEFT JOIN ix USING (s1, s2)
         |ORDER BY s1, s2""".stripMargin,
    "op166_markov_transitions" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  epoch_us(ts) * 1000 AS ts_ns, event_id FROM events),
        |t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts_ns, event_id) AS prev_type,
        |        event_type AS cur_type
        |      FROM ev),
        |c AS (SELECT prev_type, cur_type, count(*) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |tot AS (SELECT prev_type, sum(n) AS tot FROM c GROUP BY 1)
        |SELECT c.prev_type, c.cur_type, c.n,
        |  CAST(c.n * 10000 // t.tot AS BIGINT) AS prob_bp
        |FROM c JOIN tot t USING (prev_type)
        |ORDER BY prev_type, cur_type""".stripMargin,
    "op245_markov_eval" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  epoch_us(ts) * 1000 AS ts_ns, event_id FROM events),
        |t AS (SELECT lag(event_type) OVER (PARTITION BY user_id
        |        ORDER BY ts_ns, event_id) AS prev_type,
        |        event_type AS cur_type
        |      FROM ev),
        |c AS (SELECT prev_type, cur_type,
        |        CAST(count(*) AS BIGINT) AS n FROM t
        |      WHERE prev_type IS NOT NULL GROUP BY 1, 2),
        |r AS (SELECT prev_type, cur_type, n,
        |        row_number() OVER (PARTITION BY prev_type
        |          ORDER BY n DESC, cur_type) AS rk,
        |        CAST(sum(n) OVER (PARTITION BY prev_type) AS BIGINT)
        |          AS n_trans
        |      FROM c)
        |SELECT prev_type, cur_type AS predicted, n AS n_hits, n_trans,
        |  CAST((n * 10000) // n_trans AS BIGINT) AS acc_bp
        |FROM r WHERE rk = 1 ORDER BY prev_type""".stripMargin,
    // op220 is op216 maintained online; shared oracle = stream ≡ batch
    "op220_stream_seasonal" -> seasonalSql,
    "op216_seasonal_anomaly" -> seasonalSql) ++ oracleRest

  private lazy val seasonalSql: String =
      """WITH daily AS (SELECT event_type,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |       AS BIGINT) AS day_idx,
        |  CAST(count(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2),
        |d2 AS (SELECT *, day_idx % 7 AS wd FROM daily),
        |w AS (SELECT event_type, wd,
        |  CAST(count(*) AS BIGINT) AS n_wd,
        |  CAST(sum(n) AS BIGINT) AS sum_wd
        |  FROM d2 GROUP BY 1, 2)
        |SELECT d.event_type, d.day_idx, d.wd, d.n, w.n_wd, w.sum_wd,
        |  CAST(CASE WHEN w.n_wd > 1
        |         AND d.n * (w.n_wd - 1) * 10 > (w.sum_wd - d.n) * 15
        |       THEN 1 ELSE 0 END AS BIGINT) AS anomaly
        |FROM d2 d JOIN w USING (event_type, wd)
        |ORDER BY event_type, day_idx""".stripMargin

  private lazy val oracleRest: Map[String, String] = Map(
    "op167_spike_detect" ->
      """WITH daily AS (SELECT event_type,
        |  CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE))
        |       AS BIGINT) AS day_idx,
        |  count(*) AS n
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, day_idx, n,
        |  CAST(coalesce(sum(n) OVER (
        |    PARTITION BY event_type ORDER BY day_idx
        |    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0)
        |    AS BIGINT) AS trailing,
        |  CAST(CASE WHEN day_idx >= 7 AND n * 70 >
        |    coalesce(sum(n) OVER (PARTITION BY event_type ORDER BY day_idx
        |      RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) * 13
        |    THEN 1 ELSE 0 END AS BIGINT) AS spike
        |FROM daily ORDER BY event_type, day_idx""".stripMargin,
    "op168_skyline" ->
      """WITH li AS (SELECT l_orderkey,
        |  CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS price_cents,
        |  CAST(round(l_discount * 10000, 0) AS BIGINT) AS disc_bp
        |  FROM lineitem),
        |grid AS (SELECT disc_bp, min(price_cents) AS mn FROM li
        |         GROUP BY 1),
        |dom AS (SELECT disc_bp,
        |  min(mn) OVER (ORDER BY disc_bp DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS minp_gt,
        |  min(mn) OVER (ORDER BY disc_bp DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS minp_ge
        |  FROM grid)
        |SELECT li.l_orderkey, li.l_linenumber, li.price_cents, li.disc_bp
        |FROM li JOIN dom USING (disc_bp)
        |WHERE li.price_cents = dom.minp_ge
        |  AND (dom.minp_gt IS NULL OR dom.minp_gt > li.price_cents)
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "op170_copurchase" ->
      s"""WITH li AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         |po AS (SELECT l_partkey, count(*) AS n_ord FROM li GROUP BY 1),
         |tot AS (SELECT count(DISTINCT l_orderkey) AS total FROM li),
         |pairs AS (SELECT a.l_partkey AS p1, b.l_partkey AS p2,
         |            count(*) AS n
         |          FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
         |            AND a.l_partkey < b.l_partkey
         |          GROUP BY 1, 2
         |          HAVING count(*) >= $copurchaseMinSupport)
         |SELECT p.p1, p.p2, p.n,
         |  CAST(p.n * t.total * 10000 // (x.n_ord * y.n_ord) AS BIGINT)
         |    AS lift_bp
         |FROM pairs p
         |JOIN po x ON p.p1 = x.l_partkey
         |JOIN po y ON p.p2 = y.l_partkey
         |CROSS JOIN tot t
         |ORDER BY p1, p2""".stripMargin,
    "op171_winsorize" ->
      """WITH ranked AS (SELECT doc_id, lang, n_chars,
        |  row_number() OVER (PARTITION BY lang ORDER BY n_chars, doc_id)
        |    AS rn,
        |  count(*) OVER (PARTITION BY lang) AS n
        |  FROM documents),
        |bounds AS (SELECT lang, min(n_chars) AS lo, max(n_chars) AS hi
        |  FROM ranked
        |  WHERE rn = (5 * n + 99) // 100 OR rn = (95 * n + 99) // 100
        |  GROUP BY 1)
        |SELECT d.doc_id, d.lang, d.n_chars,
        |  least(greatest(d.n_chars, b.lo), b.hi) AS clamped,
        |  CAST(CASE WHEN least(greatest(d.n_chars, b.lo), b.hi)
        |            <> d.n_chars THEN 1 ELSE 0 END AS BIGINT) AS clipped
        |FROM documents d JOIN bounds b USING (lang)
        |ORDER BY d.doc_id""".stripMargin,
    "op172_join_size_cms" ->
      s"""WITH keys_ AS (SELECT CAST(l_partkey AS VARCHAR) AS w
         |              FROM lineitem),
         |rows_ AS (SELECT unnest(range(0, $cmsDepth)) AS r),
         |cells AS (SELECT r,
         |  ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || w), 1, 15))
         |    ::BIGINT % $cmsWidth AS b
         |  FROM keys_, rows_),
         |counters AS (SELECT r, b, count(*) AS cnt FROM cells
         |             GROUP BY 1, 2),
         |est AS (SELECT min(ip) AS est_size FROM (
         |  SELECT r, sum(cnt * cnt) AS ip FROM counters GROUP BY 1)),
         |exact AS (SELECT sum(n * n) AS exact_size FROM (
         |  SELECT l_partkey, count(*) AS n FROM lineitem GROUP BY 1))
         |SELECT CAST(x.exact_size AS BIGINT) AS exact_size,
         |  CAST(e.est_size AS BIGINT) AS est_size,
         |  CAST(e.est_size * 10000 // x.exact_size AS BIGINT) AS over_bp
         |FROM exact x CROSS JOIN est e
         |ORDER BY exact_size""".stripMargin)
}
