package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{CountMin, TextOps, TopKAgg}
import graft.sources.Tables
import Det.{big, ordered}

/** Corpus-analytics pack: the quality-filtering, sketching, and
  * event-analytics operators a training-data pipeline runs between raw
  * ingest and the dedup/curation families — Gopher-style repetition
  * rules, n-gram LM quality scoring, domain mixture balancing, a
  * mergeable count-min sketch, time-series gap-fill, funnel and
  * retention analytics.
  *
  * Oracle strategy (the TrainQueries convention): every emitted score is
  * an exact integer — pure integer ratios in basis points, ln() quantized
  * to floor(·×10⁶) micro-units BEFORE any sum (the Bm25 trick), counts,
  * or cents — so DuckDB reproduces every value bit-for-bit.
  */
object AnalyticsQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- op156

  /** Interior word-bigram list of `text` (split on ' '), as
    * `zip_with(slice, slice)` so a one-word document yields an EMPTY
    * array (never a misordered `sequence(1,0)` range). */
  private def bigramExpr(joiner: String): String =
    "zip_with(slice(split(text,' '),1,size(split(text,' '))-1), " +
      "slice(split(text,' '),2,size(split(text,' '))-1), " +
      s"(a,b) -> $joiner)"

  /** op156 thresholds (basis points): chosen to sit inside the fixture's
    * observed quantile range (top-word p90 ~1570, dup-bigram p90 ~650 at
    * sf0.01) so the filter genuinely partitions the corpus. */
  private val topWordMaxBp = 1800L
  private val dupBigramMaxBp = 800L

  /** op156: Gopher-style repetition filter — per document, the fraction
    * of word characters inside the single most frequent word and the
    * fraction of duplicate word-bigrams, both as pure-integer basis
    * points; documents above either threshold are flagged drop.
    *
    * 100 TB shape: one shuffle keyed (doc_id, word) for the counts (map-
    * side combinable), a per-doc window for the arg-max word (partition =
    * doc — bounded by the longest document, never corpus-wide), one more
    * (doc_id, bigram) shuffle for the duplicate-bigram rate. All
    * arithmetic is integer division (floor on positives — identical
    * `div`/`//` on both engines); no floats anywhere. */
  val op156RepetitionFilter: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "text")
    val wc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("cnt"))
    val top = wc
      .withColumn("rk", row_number().over(
        Window.partitionBy("doc_id").orderBy(col("cnt").desc, col("w"))))
      .where(col("rk") === 1)
      .select(col("doc_id"), col("w").as("top_word"),
        big(length(col("w")) * col("cnt")).as("top_chars"))
    val chars = wc.groupBy("doc_id")
      .agg(sum(length(col("w")) * col("cnt")).as("word_chars"))
    val bga = docs
      .select(col("doc_id"),
        explode(expr(bigramExpr("concat(a, ' ', b)"))).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("cnt"))
      .groupBy("doc_id").agg(sum("cnt").as("nb"), count(lit(1)).as("db"))
    ordered(
      top.join(chars, "doc_id").join(bga, Seq("doc_id"), "left")
        .withColumn("top_word_frac_bp",
          expr("CAST(top_chars * 10000 div word_chars AS BIGINT)"))
        .withColumn("dup_bigram_frac_bp",
          expr("CAST(CASE WHEN nb IS NULL OR nb = 0 THEN 0 " +
            "ELSE (nb - db) * 10000 div nb END AS BIGINT)"))
        .withColumn("keep",
          expr(s"CAST(CASE WHEN top_word_frac_bp <= $topWordMaxBp AND " +
            s"dup_bigram_frac_bp <= $dupBigramMaxBp THEN 1 ELSE 0 END " +
            "AS BIGINT)"))
        .select("doc_id", "top_word", "top_word_frac_bp",
          "dup_bigram_frac_bp", "keep"),
      "doc_id")
  }

  // ---------------------------------------------------------------- op157

  /** One bigram's add-one-smoothed log-probability under the per-language
    * model, in floor-quantized integer micro-units — SHARED SQL text
    * (interpolated into the Spark plan AND the DuckDB oracle, the Bm25
    * determinism recipe): the ln is quantized BEFORE the per-document
    * sum, so the sum is exact integer arithmetic, order-independent
    * across engines and partitions. Expects `c12`, `c1`, `v` in scope. */
  val qlpUbpSql: String =
    "CAST(FLOOR(LN((CAST(c12 AS DOUBLE) + 1.0) / " +
      "(CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE))) * 1000000.0) AS BIGINT)"

  /** Per-doc average log-prob threshold (micro-units): keep iff
    * sum_qlp ≥ −3.43 × 10⁶ × n_bi (just below the fixture's p2 average) — compared in exact integers, never as
    * a division. */
  private val qlpKeepAvgUbp = -3430000L

  /** op157: n-gram LM quality scoring (the KenLM-perplexity-filter shape)
    * — train a word-bigram model with add-one smoothing PER LANGUAGE over
    * the corpus, score every document by the sum of its bigrams'
    * quantized log-probabilities, and flag low-likelihood documents.
    *
    * 100 TB shape: the model is two map-combinable aggregations (counts
    * keyed (lang,w1,w2) and (lang,w1)) plus a per-language distinct-token
    * count; scoring joins the document bigram occurrences to the model on
    * (lang,w1,w2) — co-partitioned counts, broadcastable when the
    * vocabulary is capped (a production model caps to top-M bigrams per
    * language with a backoff constant; the fixture vocabulary needs no
    * cap). Documents with no interior bigram score 0 and keep=1 via the
    * left join. */
  val op157LmQualityScore: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "text")
    val toks = docs.select(col("lang"),
      explode(split(col("text"), " ")).as("w"))
    val docBg = docs
      .select(col("doc_id"), col("lang"),
        explode(expr(bigramExpr("named_struct('w1', a, 'w2', b)"))).as("g"))
      .select(col("doc_id"), col("lang"), col("g.w1"), col("g.w2"))
      .groupBy("doc_id", "lang", "w1", "w2").agg(count(lit(1)).as("occ"))
    val c12 = docBg.groupBy("lang", "w1", "w2").agg(sum("occ").as("c12"))
    val c1 = c12.groupBy("lang", "w1").agg(sum("c12").as("c1"))
    val vocab = toks.groupBy("lang").agg(countDistinct("w").as("v"))
    val scored = docBg
      .join(c12, Seq("lang", "w1", "w2"))
      .join(c1, Seq("lang", "w1"))
      .join(vocab, Seq("lang"))
      .withColumn("qlp", expr(qlpUbpSql))
      .groupBy("doc_id")
      // bounded: occ ≤ doc bigrams (≤ 10⁴ at the fixture's doc-length
      // contract), |qlp| ≤ ln(10¹²)·10⁶ ≈ 2.8×10⁷ — the per-doc sum
      // stays ≤ ~3×10¹¹, far inside BIGINT at any corpus size (the
      // group key is the doc, so corpus growth adds GROUPS, not terms)
      .agg(sum(col("occ") * col("qlp")).as("sum_qlp"),
        sum("occ").as("n_bi"))
    ordered(
      docs.select("doc_id", "lang").join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"), col("lang"),
          coalesce(col("n_bi"), lit(0L)).as("n_bi"),
          coalesce(col("sum_qlp"), lit(0L)).as("sum_qlp"))
        .withColumn("keep",
          expr(s"CAST(CASE WHEN sum_qlp >= $qlpKeepAvgUbp * n_bi " +
            "THEN 1 ELSE 0 END AS BIGINT)")),
      "doc_id")
  }

  // ---------------------------------------------------------------- op158

  private val mixtureCap = 20

  /** op158: domain mixture balancing — deterministically select at most
    * `mixtureCap` documents per source (the uniform-cap mixing strategy:
    * over-represented domains are downsampled, small domains pass
    * through whole), chosen by md5-60 hash order so the sample is
    * reproducible at any parallelism and stable under reruns.
    *
    * 100 TB shape: the selection is the bounded [[TopKAgg]] per source —
    * at most `cap` rows per (source, input-partition) cross the shuffle,
    * never a corpus-wide window sort (the oracle's `row_number` spelling
    * is what this aggregate replaces at scale). */
  val op158MixtureSample: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        TextOps.md5Hash60(
          concat_ws("|", col("source"), col("doc_id"))).as("h"))
    ordered(
      docs.groupBy("source")
        .agg(TopKAgg.topK(mixtureCap)(-col("h"), col("doc_id")).as("top"))
        .select(col("source"), posexplode(col("top")))
        .select(col("source"), big(col("pos") + 1).as("rank"),
          col("col.id").as("doc_id")),
      "source", "rank")
  }

  // ---------------------------------------------------------------- op159

  private val cmsDepth = 4
  private val cmsWidth = 64

  /** op159: count-min-sketch heavy hitters — build the mergeable
    * [[CountMin]] sketch over all document words in ONE pass (fixed
    * depth×width counters per partition, element-wise-add merge), then
    * report every token whose sketch ESTIMATE clears 2% of total token
    * volume, alongside its exact count (est ≥ exact always — the
    * one-sided CMS guarantee, spec-pinned).
    *
    * 100 TB shape: the sketch shuffle is `depth·width` longs per
    * partition — independent of corpus size AND token cardinality (the
    * exact groupBy it replaces shuffles the open token set). The
    * candidate probe here joins the sketch row against the distinct
    * tokens to exhibit estimates; a production heavy-hitter pass probes
    * only a candidate stream. */
  /** Heavy-hitter probe against a (r, b, cnt) counter grid: estimate =
    * min over rows of the hashed counter, report tokens whose estimate
    * clears 2% of total volume. Shared by the one-shot (op159) and the
    * stream-maintained (op169) sketches — mergeability makes their
    * grids identical, so both run under the SAME oracle. */
  private[queries] def cmsProbe(toks: DataFrame,
      counters: DataFrame): DataFrame = {
    val exact = toks.groupBy("w").agg(count(lit(1)).as("exact_cnt"))
    val total = toks.agg(count(lit(1)).as("total"))
    val probes = exact.select(col("w"), col("exact_cnt"),
      explode(expr(
        s"transform(sequence(0, ${cmsDepth - 1}), r -> named_struct(" +
          "'r', CAST(r AS BIGINT), " +
          "'b', CAST(CONV(SUBSTRING(MD5(CAST(CONCAT(CAST(r AS STRING), " +
          s"':', w) AS BINARY)), 1, 15), 16, 10) AS BIGINT) % $cmsWidth))"))
        .as("rb"))
      .select(col("w"), col("exact_cnt"),
        col("rb.r").as("r"), col("rb.b").as("b"))
    ordered(
      probes.join(broadcast(counters), Seq("r", "b"))
        .groupBy("w", "exact_cnt").agg(min("cnt").as("est_cnt"))
        .crossJoin(broadcast(total))
        .where(col("est_cnt") * 50 >= col("total"))
        .select(col("w").as("token"), col("est_cnt"), col("exact_cnt")),
      "token")
  }

  private[queries] def docTokens(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(explode(split(col("text"), " ")).as("w"))

  val op159CmsHeavyHitters: Q = (s, d) => {
    val toks = docTokens(s, d)
    val counters = toks
      .agg(CountMin.sketch(cmsDepth, cmsWidth)(col("w")).as("sk"))
      .select(posexplode(col("sk")))
      .select(expr(s"CAST(pos div $cmsWidth AS BIGINT)").as("r"),
        expr(s"CAST(pos % $cmsWidth AS BIGINT)").as("b"),
        col("col").as("cnt"))
    cmsProbe(toks, counters)
  }

  /** op169: STREAM-MAINTAINED count-min heavy hitters — documents arrive
    * in four micro-batches, each reduced to one d×w partial grid
    * (foreachBatch parquet append — O(d·w) state per batch regardless of
    * batch size), the serving merge element-wise-sums the partials.
    * Because CMS merge is exact, the maintained grid ≡ the one-shot
    * build and op169 runs under op159's UNCHANGED oracle — the
    * mergeable-summary property as a hash gate, not just a spec claim. */
  val op169StreamCms: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op169_").toString
    val counters = graft.streaming.SketchStream
      .maintainedCounters(s, d, cmsDepth, cmsWidth, state)
    cmsProbe(docTokens(s, d), counters)
  }

  // ---------------------------------------------------------------- op160

  /** op160: time-series gap-fill with last-observation-carried-forward —
    * resample each user's event stream onto an hourly grid spanning
    * their own [first, last] activity, carry the latest observed value
    * (in exact cents) across unobserved hours, and report per-user grid
    * coverage plus the LOCF integral.
    *
    * 100 TB shape: the grid explode is bounded by span/granularity per
    * user (a retention-bounded constant, never corpus-sized); the LOCF
    * window partitions by user — one shuffle, each partition the user's
    * own grid. The per-(user,hour) latest-value pick is a window over
    * the user-hour group (bounded by events-per-hour). */
  val op160GapfillLocf: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100, 0).cast("bigint").as("cents"))
    val hv = ev
      .withColumn("h", date_trunc("hour", col("ts")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id", "h")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("rk") === 1)
      .select("user_id", "h", "cents")
    val grid = ev.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val filled = grid.join(hv, Seq("user_id", "h"), "left")
      .withColumn("locf", last("cents", ignoreNulls = true).over(
        Window.partitionBy("user_id").orderBy("h")))
    ordered(
      filled.groupBy("user_id").agg(
        count(lit(1)).as("hours_total"),
        count(col("cents")).as("hours_obs"),
        (count(lit(1)) - count(col("cents"))).as("hours_filled"),
        sum("locf").as("locf_sum_cents")),
      "user_id")
  }

  // ---------------------------------------------------------------- op252

  /** op252: linear-interpolation gap-fill — op160's hourly spine with
    * the other standard fill: a missing hour takes the line between
    * its nearest observed neighbors, exact in milli-cents via
    * (py·(nd−h) + ny·(h−pd))·1000 div (nd−pd) on the integer hour
    * axis (sign-split); leading/trailing gaps fall back to the one
    * available side (src=2). LOCF answers "what was the state";
    * interpolation answers "what was the level" — rate-like metrics
    * resampled for training want the latter.
    *
    * 100 TB shape: op160's argument — the spine explode is bounded by
    * each user's observed span, both neighbor scans are two window
    * passes over the spine (no self-join per gap), and the per-user
    * rollup is map-combinable. */
  val op252GapfillInterp: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        round(col("value") * 100, 0).cast("bigint").as("cents"))
    val hv = ev
      .withColumn("h", date_trunc("hour", col("ts")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("user_id", "h")
          .orderBy(col("ts").desc, col("event_id").desc)))
      .where(col("rk") === 1)
      .select("user_id", "h", "cents")
    val spine = ev.groupBy("user_id")
      .agg(date_trunc("hour", min("ts")).as("h0"),
        date_trunc("hour", max("ts")).as("h1"))
      .select(col("user_id"),
        explode(expr("sequence(h0, h1, interval 1 hour)")).as("h"))
    val idx = spine.join(hv, Seq("user_id", "h"), "left")
      .withColumn("hi", expr("unix_micros(h) div 3600000000"))
    val wAsc = Window.partitionBy("user_id").orderBy("hi")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy("user_id").orderBy(col("hi").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = idx
      .withColumn("py", last("cents", ignoreNulls = true).over(wAsc))
      .withColumn("pd", last(when(col("cents").isNotNull, col("hi")),
        ignoreNulls = true).over(wAsc))
      .withColumn("ny", last("cents", ignoreNulls = true).over(wDesc))
      .withColumn("nd", last(when(col("cents").isNotNull, col("hi")),
        ignoreNulls = true).over(wDesc))
      .withColumn("fill_milli", expr(
        """CASE WHEN cents IS NOT NULL THEN cents * 1000
          |     WHEN py IS NULL THEN ny * 1000
          |     WHEN ny IS NULL THEN py * 1000
          |     ELSE (CASE WHEN py * (nd - hi) + ny * (hi - pd) < 0
          |           THEN -1 ELSE 1 END) *
          |          ((abs(py * (nd - hi) + ny * (hi - pd)) * 1000)
          |           div (nd - pd))
          |END""".stripMargin))
    ordered(
      filled.groupBy("user_id").agg(
        count(lit(1)).as("hours_total"),
        count(col("cents")).as("hours_obs"),
        sum("fill_milli").as("interp_sum_milli")),
      "user_id")
  }

  // ---------------------------------------------------------------- op161

  /** op161: ordered funnel — view → click → purchase per user, each later
    * step's timestamp strictly after the user's previous step (min-after-
    * threshold semantics on the exact integer `ts_ns` axis). Emits one
    * row per step: users reaching it and the total conversion latency in
    * whole seconds (integer-exact on both engines).
    *
    * 100 TB shape: three map-combinable per-user min-aggregations chained
    * by co-partitioned user_id joins (each stage's threshold table is
    * user-dim-sized); no windows, no self-joins over raw events. */
  val op161Funnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts_ns")
    val s1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id").where(col("ts_ns") > col("t1"))
      .groupBy("user_id").agg(min("ts_ns").as("t2"), min("t1").as("t1"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts_ns") > col("t2"))
      .groupBy("user_id").agg(min("ts_ns").as("t3"), min("t2").as("t2"))
    val r1 = s1.agg(count(lit(1)).as("users")).select(
      lit("1_view").as("step"), col("users"), lit(0L).as("lat_sum_s"))
    val r2 = s2.agg(count(lit(1)).as("users"),
        sum(expr("(t2 - t1) div 1000000000")).as("lat_sum_s"))
      .select(lit("2_click").as("step"), col("users"),
        coalesce(col("lat_sum_s"), lit(0L)).as("lat_sum_s"))
    val r3 = s3.agg(count(lit(1)).as("users"),
        sum(expr("(t3 - t2) div 1000000000")).as("lat_sum_s"))
      .select(lit("3_purchase").as("step"), col("users"),
        coalesce(col("lat_sum_s"), lit(0L)).as("lat_sum_s"))
    ordered(r1.union(r2).union(r3), "step")
  }

  // ---------------------------------------------------------------- op162

  /** op162: retention cohorts — cohort = a user's first active day
    * (index vs 2024-01-01, integer), activity = distinct (user, day);
    * emit distinct active users per (cohort, day-offset).
    *
    * 100 TB shape: first-seen is a map-combinable min per user; the
    * cohort join is co-partitioned on user_id; the final aggregate keys
    * (cohort, offset) — a bounded grid (cohorts × retention horizon),
    * so the last shuffle is tiny regardless of event volume. */
  val op162RetentionCohorts: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), to_date(col("ts")).as("day"))
    val firstSeen = ev.groupBy("user_id").agg(min("day").as("cohort_day"))
    val active = ev.distinct()
    ordered(
      active.join(firstSeen, "user_id")
        .select(
          big(datediff(col("cohort_day"), lit("2024-01-01").cast("date")))
            .as("cohort_idx"),
          big(datediff(col("day"), col("cohort_day"))).as("offset_d"))
        .groupBy("cohort_idx", "offset_d")
        .agg(count(lit(1)).as("users")),
      "cohort_idx", "offset_d")
  }

  // ------------------------------------------------------------- wiring

  // ---------------------------------------------------------------- op198

  /** op198: vocabulary cap and support floor for collocation mining. */
  private val pmiVocab = 32
  private val pmiMinPairs = 20L

  /** op198's score — SHARED SQL TEXT (the qlpUbpSql recipe): pointwise
    * mutual information ln(n_ab·N / (n_a·n_b)) floor-quantized to
    * integer micro-units. Expects n_ab, n_a, n_b, nt in scope. */
  private val pmiUSql: String =
    "CAST(FLOOR(LN(CAST(n_ab AS DOUBLE) * CAST(nt AS DOUBLE) / " +
      "(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))) * 1000000.0) " +
      "AS BIGINT)"

  /** op198: PMI collocation mining — token pairs that co-occur in
    * documents far above chance, scored by pointwise mutual
    * information over document-level co-occurrence. Vocabulary is
    * CAPPED to the top-`pmiVocab` tokens by document frequency
    * (deterministic (df desc, token) order) and pairs below
    * `pmiMinPairs` co-occurrences are pruned BEFORE scoring — the two
    * caps that bound the pair explosion (per-doc pair fan-out ≤
    * C(vocab, 2), support prune before the expensive tail: the op170
    * A-priori convention on text).
    *
    * 100 TB shape: df computation and pair counting are both
    * map-combinable; the vocabulary is a broadcast literal-sized
    * list, so the per-doc intersection is a semi-join against a
    * broadcast. PMI itself runs on the ≤ C(vocab,2) pair grid. */
  val op198PmiCollocations: Q = (s, d) => {
    val docTok = Tables.documents(s, d)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .distinct()
    val df = docTok.groupBy("t").agg(count(lit(1)).as("df"))
    val vocab = df
      .withColumn("rn", row_number().over(
        Window.orderBy(col("df").desc, col("t"))))
      .where(col("rn") <= pmiVocab)
      .select(col("t"), col("df"))
    val dv = docTok.join(broadcast(vocab), "t")
    val a = dv.select(col("doc_id"), col("t").as("t1"))
    val b = dv.select(col("doc_id"), col("t").as("t2"))
    val pairs = a.join(b, "doc_id").where(col("t1") < col("t2"))
      .groupBy("t1", "t2").agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= pmiMinPairs)
    val nt = Tables.documents(s, d).agg(count(lit(1)).as("nt"))
    ordered(
      pairs
        .join(broadcast(vocab.select(col("t").as("t1"),
          col("df").as("n_a"))), "t1")
        .join(broadcast(vocab.select(col("t").as("t2"),
          col("df").as("n_b"))), "t2")
        .crossJoin(broadcast(nt))
        .withColumn("pmi_micro", expr(pmiUSql))
        .select("t1", "t2", "n_ab", "n_a", "n_b", "pmi_micro"),
      "t1", "t2")
  }

  // ---------------------------------------------------------------- op200

  /** op200 session-path gap (ns) / path length cap / emission support. */
  private[queries] val spGapNs = 1800L * 1000000000L
  private[queries] val spMaxLen = 8
  private[queries] val spSupport = 3

  /** op200: session-path mining — sessionize each user's events (30-min
    * gap, the op105 semantics on the exact ns axis), spell each session
    * as its ordered event-type path capped at the first [[spMaxLen]]
    * steps, and count how many sessions walk each path (support ≥
    * [[spSupport]]). The navigation-pattern / curriculum-analysis
    * primitive that op166's single-step Markov matrix can't give: whole
    * trajectories, exactly counted.
    *
    * 100 TB shape: ONE shuffle to the per-user window — lag (session
    * break), running sum (session id), row_number, and the running max
    * that converts the user-level row number into the WITHIN-SESSION
    * rank all share one (user)-partitioned, (ts, id)-ordered window, so
    * no second Exchange exists for the (user, session) aggregate either
    * (superset-key clustering, the op105/op173 argument — ScaleSpec
    * shape). The path cap bounds the collected struct list at
    * [[spMaxLen]] per session; the final path count is map-combinable
    * over a domain bounded by |event types|^cap observed, not events. */
  val op200SessionPaths: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select("user_id", "event_id", "ts_ns", "event_type")
    val wu = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    val ranked = ev
      .withColumn("prev", lag("ts_ns", 1).over(wu))
      .withColumn("brk", when(col("prev").isNull ||
        col("ts_ns") - col("prev") > spGapNs, 1L).otherwise(0L))
      .withColumn("sess", sum("brk").over(wu))
      .withColumn("rn_u", big(row_number().over(wu)))
      // rank within session WITHOUT a (user, sess) window: the running
      // max of brk·rn_u is the session head's user-level row number
      .withColumn("rn", col("rn_u") -
        max(col("brk") * col("rn_u")).over(wu) + 1)
    val paths = ranked.where(col("rn") <= spMaxLen)
      .groupBy("user_id", "sess")
      .agg(expr("array_join(transform(array_sort(" +
        "collect_list(struct(ts_ns, event_id, event_type))), " +
        "x -> x.event_type), '>')").as("path"))
    ordered(
      paths.groupBy("path").agg(big(count(lit(1))).as("n_sessions"))
        .where(col("n_sessions") >= spSupport),
      "path")
  }

  // ---------------------------------------------------------------- op201

  /** op201 total sample budget (≤ corpus size by contract). */
  private val strataBudget = 100

  /** op201: proportional stratified sampling with LARGEST-REMAINDER
    * allocation — split a total budget of [[strataBudget]] sample slots
    * across sources proportionally to their document counts using exact
    * integer apportionment (base = ⌊K·nᵢ/N⌋; the K−Σbase leftover slots
    * go to the largest remainders, source-name tiebreak — Σalloc = K by
    * construction, the property per-source rounding can't give), then
    * select each stratum's docs by md5-60 hash order (op158's
    * deterministic selection under a VARIABLE per-source cap).
    *
    * 100 TB shape: the allocation arithmetic runs on the |sources| grid
    * (Grid contract — its row_number window orders sources, never
    * docs); selection is the bounded TopKAgg (≤ K rows per (source,
    * partition) cross the shuffle) filtered to the broadcast
    * allocation. The corpus is never globally sorted. */
  val op201StrataAlloc: Q = (s, d) => {
    val docs = Tables.documents(s, d)
      .select(col("source"), col("doc_id"),
        TextOps.md5Hash60(
          concat_ws("|", col("source"), col("doc_id"))).as("h"))
    val counts = docs.groupBy("source").agg(big(count(lit(1))).as("n_docs"))
    val tot = counts.agg(sum("n_docs").cast("bigint").as("tot"))
    val a = counts.crossJoin(broadcast(tot))
      .withColumn("base", expr(s"($strataBudget * n_docs) div tot"))
      .withColumn("rem", expr(s"($strataBudget * n_docs) % tot"))
    val deficit = a
      .agg((lit(strataBudget.toLong) - sum("base")).cast("bigint")
        .as("deficit"))
    val alloc = a
      .withColumn("rr", big(row_number().over(
        Window.orderBy(col("rem").desc, col("source")))))
      .crossJoin(broadcast(deficit))
      .withColumn("alloc",
        expr("base + CASE WHEN rr <= deficit THEN 1 ELSE 0 END"))
      .select("source", "n_docs", "alloc")
    val sel = docs.groupBy("source")
      .agg(TopKAgg.topK(strataBudget)(-col("h"), col("doc_id")).as("top"))
      .select(col("source"), posexplode(col("top")))
      .select(col("source"), big(col("pos") + 1).as("rank"),
        col("col.id").as("doc_id"))
    ordered(
      sel.join(broadcast(alloc), "source")
        .where(col("rank") <= col("alloc"))
        .select(col("source"), col("n_docs"), col("alloc"),
          col("rank"), col("doc_id")),
      "source", "rank")
  }

  // ---------------------------------------------------------------- op205

  /** op205 conversion windows (ns): click within 3 days of the first
    * view; purchase within 7 days of that click. */
  private[queries] val fwClickNs = 3L * 86400L * 1000000000L
  private[queries] val fwPurchaseNs = 7L * 86400L * 1000000000L

  /** op205: WINDOWED funnel — op161's ordered chain with conversion
    * deadlines (the product-analytics semantics op161's unbounded chain
    * can't give: a click three months after the view is not a
    * conversion): t2 = first click in (t1, t1+W₁], t3 = first purchase
    * in (t2, t2+W₂]. Same output shape as op161, strictly smaller
    * counts by construction.
    *
    * 100 TB shape: identical to op161 — three map-combinable per-user
    * min aggregates linked by co-partitioned user joins; the deadline
    * is one more predicate on the already-joined row, no new shuffle,
    * no window. */
  val op205WindowedFunnel: Q = (s, d) => {
    val ev = Tables.events(s, d).select("user_id", "event_type", "ts_ns")
    val s1 = ev.where(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts_ns").as("t1"))
    val s2 = ev.where(col("event_type") === "click")
      .join(s1, "user_id")
      .where(col("ts_ns") > col("t1") &&
        col("ts_ns") <= col("t1") + fwClickNs)
      .groupBy("user_id").agg(min("ts_ns").as("t2"), min("t1").as("t1"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id")
      .where(col("ts_ns") > col("t2") &&
        col("ts_ns") <= col("t2") + fwPurchaseNs)
      .groupBy("user_id").agg(min("ts_ns").as("t3"), min("t2").as("t2"))
    val r1 = s1.agg(count(lit(1)).as("users")).select(
      lit("1_view").as("step"), col("users"), lit(0L).as("lat_sum_s"))
    val r2 = s2.agg(count(lit(1)).as("users"),
        sum(expr("(t2 - t1) div 1000000000")).as("lat_sum_s"))
      .select(lit("2_click").as("step"), col("users"),
        coalesce(col("lat_sum_s"), lit(0L)).as("lat_sum_s"))
    val r3 = s3.agg(count(lit(1)).as("users"),
        sum(expr("(t3 - t2) div 1000000000")).as("lat_sum_s"))
      .select(lit("3_purchase").as("step"), col("users"),
        coalesce(col("lat_sum_s"), lit(0L)).as("lat_sum_s"))
    ordered(r1.union(r2).union(r3), "step")
  }

  // ---------------------------------------------------------------- op206

  /** op206 attribution lookback (ns): 7 days. */
  private[queries] val attrLookbackNs = 7L * 86400L * 1000000000L

  /** op206: last-touch attribution — each purchase attributed to the
    * user's most recent NON-purchase event at-or-before it within the
    * lookback window (the marketing/channel-attribution primitive),
    * via the [[graft.ops.AsOf]] union-trick join (one shuffle + sort,
    * never a range self-join). Tie-determinism: the carried payload
    * struct leads with (ts_ns, event_id), so equal-timestamp touches
    * resolve to the max event_id on BOTH engines (the oracle ranks by
    * ts_ns DESC, event_id DESC). Purchases whose latest touch falls
    * outside the lookback — equivalently, ALL of whose touches do —
    * land in the 'none' bucket.
    *
    * 100 TB shape: the as-of carry is one (user)-keyed shuffle + sort
    * (the OP-36 plan); attribution grouping is map-combinable over the
    * |event types|+1 domain. */
  val op206LastTouchAttribution: Q = (s, d) => {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_ns"))
    val touches = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("ts_ns"), col("event_id"),
        col("event_type"))
    val joined = graft.ops.AsOf.join(purchases, touches,
      key = "user_id", time = "ts_ns",
      payload = Seq("ts_ns", "event_id", "event_type"))
    val attributed = joined.select(col("event_id"),
      when(col("asof_ts_ns").isNotNull &&
        col("ts_ns") - col("asof_ts_ns") <= attrLookbackNs,
        col("asof_event_type")).otherwise(lit("none"))
        .as("attributed_type"),
      when(col("asof_ts_ns").isNotNull &&
        col("ts_ns") - col("asof_ts_ns") <= attrLookbackNs,
        expr("(ts_ns - asof_ts_ns) div 1000000000")).otherwise(lit(0L))
        .as("lat_s"))
    ordered(
      attributed.groupBy("attributed_type")
        .agg(big(count(lit(1))).as("n_purchases"),
          sum("lat_s").cast("bigint").as("lat_sum_s")),
      "attributed_type")
  }

  // ---------------------------------------------------------------- op238

  /** op238: CEP negative-pattern match — purchases preceded by a view
    * with NO error strictly between them, per user: the
    * MATCH_RECOGNIZE / Flink-CEP "A then B with no intervening X"
    * shape the funnels (op161/op205) can't express, because a funnel
    * counts step progress and never excludes on ABSENT events. Spelled
    * as two running maxima over a RANGE frame ending 1µs before the
    * current row (strictly-before semantics — simultaneous events
    * never witness each other, so intra-timestamp ordering can't leak
    * into the answer): match ⇔ a view exists and the latest error, if
    * any, is older than that view.
    *
    * 100 TB shape: ONE shuffle by user, two window maxima over each
    * user's bounded history, no self-joins — the negation costs the
    * same as the detection. Emits the matched (purchase, witness-view)
    * pairs row-level, the downstream-join-ready form. */
  val op238CepNoError: Q = (s, d) => {
    val ev = Tables.events(s, d)
    val w = Window.partitionBy("user_id").orderBy("t_us")
      .rangeBetween(Window.unboundedPreceding, -1)
    ordered(
      ev.select(col("user_id"), big(col("event_id")).as("event_id"),
          col("event_type"), Tables.tsUsExpr(ev).as("t_us"))
        // both maxima in ONE projection so they fuse into a single
        // Window operator over the shared spec (ScaleSpec-pinned)
        .select(col("user_id"), col("event_id"), col("event_type"),
          col("t_us"),
          max(when(col("event_type") === "view", col("t_us"))).over(w)
            .as("lv"),
          max(when(col("event_type") === "error", col("t_us"))).over(w)
            .as("le"))
        .where(col("event_type") === "purchase" && col("lv").isNotNull &&
          (col("le").isNull || col("le") < col("lv")))
        .select(col("user_id"), col("event_id"),
          big(col("t_us")).as("p_us"), big(col("lv")).as("v_us")),
      "user_id", "p_us", "event_id")
  }

  // ---------------------------------------------------------------- op242

  /** op242: per-source token-distribution entropy — Shannon entropy of
    * each source's unigram distribution in ln-micro-units via the
    * identity H = ln N − (Σ c·ln c)/N, with ln quantized to
    * floor(·×10⁶) per DISTINCT count BEFORE the sum (the house ln
    * contract): Σ c·⌊ln c·10⁶⌋ is a pure integer sum, one division at
    * the end. The corpus-diversity diagnostic mixture balancing
    * (op88/op111) and quality gates read — a source whose entropy
    * collapses is templated/boilerplate even when its lengths and
    * scores look healthy.
    *
    * 100 TB shape: one (source, token) aggregate (map-combinable),
    * then a vocab-grid-sized reduction per source; the float work is
    * one ln per distinct (source, token) count — never per
    * occurrence. */
  val op242SourceEntropy: Q = (s, d) => {
    val tok = Tables.documents(s, d).select(col("source"),
      explode(split(col("text"), " ")).as("token"))
    val cnt = tok.groupBy("source", "token").agg(count(lit(1)).as("c"))
    ordered(
      cnt.groupBy("source")
        .agg(sum("c").as("n_tokens"),
          big(count(lit(1))).as("n_vocab"),
          // c·⌊ln c·10⁶⌋ accumulates in DECIMAL(38,0) (the op268
          // convention): a hot token at corpus scale (c ≈ 10¹¹) puts
          // one term at ~2.5×10¹⁸ — a BIGINT sum over the vocabulary
          // silently wraps; the quotient below returns to BIGINT
          sum(expr(
            "CAST(c AS DECIMAL(19,0)) * " +
            "CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000) AS DECIMAL(19,0))"))
            .as("clnc"))
        .select(col("source"), col("n_tokens"), col("n_vocab"),
          expr("CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000) " +
            "AS BIGINT) - (clnc div n_tokens)").as("h_micro")),
      "source")
  }

  // ---------------------------------------------------------------- op246

  /** op246: Zipf rank–frequency slope per source — OLS fit of
    * ⌊ln c·10³⌋ against ⌊ln rank·10³⌋ over each source's token
    * frequency grid (rank by count desc, token asc), slope in milli
    * via op184's exact integer quotient split. Healthy natural text
    * sits near −1000 (Zipf's law); a collapsed slope means templated /
    * machine-generated text, a flat one means vocabulary churn — the
    * distribution-SHAPE diagnostic op242's entropy (a scalar) can't
    * localize. Quantizing ln to milli BEFORE the sums keeps the five
    * OLS sums in BIGINT through vocab ~3·10⁵ per source (wider
    * domains shift the sums to DECIMAL — the op184 note).
    *
    * 100 TB shape: one (source, token) count aggregate, then ranks and
    * sums on the per-source vocab grid; the regression is five
    * map-combinable sums over that grid (the op184 shape one level
    * up). */
  val op246ZipfSlope: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val ranked = cnt.withColumn("rk", row_number().over(
      Window.partitionBy("source").orderBy(col("c").desc, col("token"))))
      .withColumn("x", expr(
        "CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT)"))
      .withColumn("y", expr(
        "CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT)"))
    ordered(
      ranked.groupBy("source")
        .agg(count(lit(1)).as("n"), sum("x").as("sx"), sum("y").as("sy"),
          sum(expr("x * x")).as("sxx"), sum(expr("x * y")).as("sxy"))
        .withColumn("num", expr("n * sxy - sx * sy"))
        .withColumn("den", expr("n * sxx - sx * sx"))
        .withColumn("slope_milli", expr(
          "(CASE WHEN num < 0 THEN -1 ELSE 1 END) * " +
            "((abs(num) div den) * 1000 + " +
            "((abs(num) % den) * 1000) div den)"))
        .select(col("source"), big(col("n")).as("n_vocab"),
          col("slope_milli")),
      "source")
  }

  // ---------------------------------------------------------------- op255

  /** op255: k-anonymity audit — every quasi-identifier combination
    * (lang, source, length bucket) with its population and a risky
    * flag at k < 5: a release whose QI group has fewer than k members
    * lets an attacker who knows those attributes re-identify rows, so
    * the compliance gate either suppresses or generalizes the flagged
    * groups before the corpus ships. Also emits each group's count of
    * DISTINCT length values inside the bucket — the l-diversity-style
    * sidecar (a k-anonymous group whose "sensitive" value is constant
    * still leaks it).
    *
    * 100 TB shape: one map-combinable aggregate at QI-grid
    * cardinality; generalization loops (widen the bucket, re-audit)
    * re-aggregate the GRID, not the corpus. */
  val op255KAnonymity: Q = (s, d) => {
    ordered(
      Tables.documents(s, d)
        .groupBy(col("lang"), col("source"),
          expr("n_chars div 100").as("len_bucket"))
        .agg(big(count(lit(1))).as("n"),
          big(countDistinct(col("n_chars"))).as("n_distinct_len"))
        .withColumn("risky", expr(
          "CAST(CASE WHEN n < 5 THEN 1 ELSE 0 END AS BIGINT)")),
      "lang", "source", "len_bucket")
  }

  // ---------------------------------------------------------------- op269

  /** op269: Jensen–Shannon divergence per source — JSD between the
    * source's token distribution and the REST of the corpus, in
    * nano-nats: the bounded (≤ ln 2), symmetric domain-similarity
    * measure mixture tuning actually uses (op88/op111 set mixture
    * weights; op269 measures how far each component sits from the
    * blend — near 0 = redundant with the rest, near ln 2 = disjoint
    * vocabulary). op242's entropy says how diverse a source is;
    * op269 says how DIFFERENT it is.
    *
    * Determinism: each token's contribution ½(p·ln(p/m) + q·ln(q/m))
    * (m = midpoint) is ONE fixed IEEE expression tree over exact
    * integer counts, floored to nano-nats BEFORE the sum (op246's
    * quantize-then-sum rule — double sums reassociate, integer sums
    * don't). Absent-side terms (p = 0 or q = 0) take the CASE arm, so
    * the disjoint-vocabulary mass is counted, not dropped.
    *
    * 100 TB shape: the grid is |sources| × |vocab| (the cross join is
    * against per-token totals, never documents) and everything after
    * the (source, token) count is map-combinable on it; doc-frequency
    * caps bound |vocab| exactly as in op61/op170. */
  val op269JsDivergence: Q = (s, d) => {
    val cnt = Tables.documents(s, d)
      .select(col("source"), explode(split(col("text"), " ")).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("c"))
    val tot = cnt.groupBy("token").agg(sum("c").as("ct"))
    val ns = cnt.groupBy("source").agg(sum("c").as("n1"))
    val ntv = tot.agg(sum("ct").as("nt"))
    ordered(
      ns.crossJoin(broadcast(ntv)).crossJoin(tot)
        .join(cnt, Seq("source", "token"), "left")
        .withColumn("c1", coalesce(col("c"), lit(0L)))
        .withColumn("p", expr("CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE)"))
        .withColumn("q", expr(
          "CAST(ct - c1 AS DOUBLE) / CAST(nt - n1 AS DOUBLE)"))
        .withColumn("mm", expr("(p + q) * 0.5"))
        .withColumn("term_nano", expr(
          "CAST(floor((CASE WHEN c1 > 0 THEN p * ln(p / mm) " +
            "ELSE CAST(0 AS DOUBLE) END + " +
            "CASE WHEN ct - c1 > 0 THEN q * ln(q / mm) " +
            "ELSE CAST(0 AS DOUBLE) END) * 0.5 * 1000000000) AS BIGINT)"))
        .groupBy("source")
        .agg(max(expr("n1")).as("w1"), max(expr("nt - n1")).as("w2"),
          sum("term_nano").as("jsd_nano"))
        .select(col("source"), big(col("w1")).as("n1"),
          big(col("w2")).as("n2"), col("jsd_nano")),
      "source")
  }

  val defs: Map[String, Q] = Map(
    "op269_js_divergence" -> op269JsDivergence,
    "op255_k_anonymity" -> op255KAnonymity,
    "op246_zipf_slope" -> op246ZipfSlope,
    "op242_source_entropy" -> op242SourceEntropy,
    "op238_cep_no_error" -> op238CepNoError,
    "op198_pmi_collocations" -> op198PmiCollocations,
    "op200_session_paths" -> op200SessionPaths,
    "op201_strata_alloc" -> op201StrataAlloc,
    "op205_windowed_funnel" -> op205WindowedFunnel,
    "op206_last_touch_attribution" -> op206LastTouchAttribution,
    "op156_repetition_filter" -> op156RepetitionFilter,
    "op157_lm_quality_score" -> op157LmQualityScore,
    "op158_mixture_sample" -> op158MixtureSample,
    "op159_cms_heavy_hitters" -> op159CmsHeavyHitters,
    "op160_gapfill_locf" -> op160GapfillLocf,
    "op252_gapfill_interp" -> op252GapfillInterp,
    "op161_funnel" -> op161Funnel,
    "op162_retention_cohorts" -> op162RetentionCohorts,
    "op169_stream_cms" -> op169StreamCms)

  /** DuckDB twins. Every score is exact integer arithmetic; the md5-60
    * hash and the quantized-ln micro-units replay bit-for-bit. */
  /** op169 is the stream-maintained sketch — merge-exactness means it
    * shares op159's oracle verbatim. */
  lazy val oracle: Map[String, String] = baseOracle +
    ("op169_stream_cms" -> baseOracle("op159_cms_heavy_hitters"))

  private lazy val baseOracle: Map[String, String] = Map(
    "op269_js_divergence" ->
      """WITH cnt AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents) GROUP BY 1, 2),
        |tot AS (SELECT token, CAST(sum(c) AS BIGINT) AS ct
        |        FROM cnt GROUP BY 1),
        |ns AS (SELECT source, CAST(sum(c) AS BIGINT) AS n1
        |       FROM cnt GROUP BY 1),
        |ntv AS (SELECT CAST(sum(ct) AS BIGINT) AS nt FROM tot),
        |grid AS (
        |  SELECT s.source, s.n1, v.nt, t.token, t.ct,
        |    coalesce(c.c, 0) AS c1
        |  FROM ns s CROSS JOIN ntv v CROSS JOIN tot t
        |  LEFT JOIN cnt c ON c.source = s.source AND c.token = t.token),
        |pq AS (
        |  SELECT source, n1, nt, ct, c1,
        |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p,
        |    CAST(ct - c1 AS DOUBLE) / CAST(nt - n1 AS DOUBLE) AS q
        |  FROM grid),
        |terms AS (
        |  SELECT source, n1, nt,
        |    CAST(floor((CASE WHEN c1 > 0 THEN p * ln(p / ((p + q) * 0.5))
        |        ELSE CAST(0 AS DOUBLE) END +
        |      CASE WHEN ct - c1 > 0 THEN q * ln(q / ((p + q) * 0.5))
        |        ELSE CAST(0 AS DOUBLE) END) * 0.5 * 1000000000)
        |      AS BIGINT) AS term_nano
        |  FROM pq)
        |SELECT source, CAST(max(n1) AS BIGINT) AS n1,
        |  CAST(max(nt - n1) AS BIGINT) AS n2,
        |  CAST(sum(term_nano) AS BIGINT) AS jsd_nano
        |FROM terms GROUP BY 1 ORDER BY source""".stripMargin,
    "op255_k_anonymity" ->
      """SELECT lang, source,
        |  CAST(n_chars // 100 AS BIGINT) AS len_bucket,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(DISTINCT n_chars) AS BIGINT) AS n_distinct_len,
        |  CAST(CASE WHEN count(*) < 5 THEN 1 ELSE 0 END AS BIGINT)
        |    AS risky
        |FROM documents GROUP BY 1, 2, 3
        |ORDER BY lang, source, len_bucket""".stripMargin,
    "op246_zipf_slope" ->
      """WITH cnt AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS c
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS token
        |        FROM documents) GROUP BY 1, 2),
        |rk AS (
        |  SELECT source, c,
        |    CAST(row_number() OVER (PARTITION BY source
        |      ORDER BY c DESC, token) AS BIGINT) AS rk
        |  FROM cnt),
        |xy AS (
        |  SELECT source,
        |    CAST(floor(ln(CAST(rk AS DOUBLE)) * 1000) AS BIGINT) AS x,
        |    CAST(floor(ln(CAST(c AS DOUBLE)) * 1000) AS BIGINT) AS y
        |  FROM rk),
        |agg AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx,
        |    CAST(sum(x * y) AS BIGINT) AS sxy
        |  FROM xy GROUP BY 1),
        |f AS (
        |  SELECT source, n, n * sxy - sx * sy AS num,
        |    n * sxx - sx * sx AS den
        |  FROM agg)
        |SELECT source, n AS n_vocab,
        |  CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END) *
        |    ((abs(num) // den) * 1000 + ((abs(num) % den) * 1000) // den)
        |    AS BIGINT) AS slope_milli
        |FROM f ORDER BY source""".stripMargin,
    "op242_source_entropy" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |cnt AS (
        |  SELECT source, token, CAST(count(*) AS BIGINT) AS c
        |  FROM tok GROUP BY 1, 2),
        |agg AS (
        |  SELECT source, CAST(sum(c) AS BIGINT) AS n_tokens,
        |    CAST(count(*) AS BIGINT) AS n_vocab,
        |    CAST(sum(c * CAST(floor(ln(CAST(c AS DOUBLE)) * 1000000)
        |         AS BIGINT)) AS BIGINT) AS clnc
        |  FROM cnt GROUP BY 1)
        |SELECT source, n_tokens, n_vocab,
        |  CAST(CAST(floor(ln(CAST(n_tokens AS DOUBLE)) * 1000000)
        |       AS BIGINT) - (clnc // n_tokens) AS BIGINT) AS h_micro
        |FROM agg ORDER BY source""".stripMargin,
    "op238_cep_no_error" ->
      """WITH ev AS (
        |  SELECT user_id, CAST(event_id AS BIGINT) AS event_id,
        |    event_type, epoch_us(ts) AS t_us
        |  FROM events),
        |w AS (
        |  SELECT user_id, event_id, event_type, t_us,
        |    max(CASE WHEN event_type = 'view' THEN t_us END) OVER win
        |      AS lv,
        |    max(CASE WHEN event_type = 'error' THEN t_us END) OVER win
        |      AS le
        |  FROM ev
        |  WINDOW win AS (PARTITION BY user_id ORDER BY t_us
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
        |SELECT user_id, event_id, CAST(t_us AS BIGINT) AS p_us,
        |  CAST(lv AS BIGINT) AS v_us
        |FROM w
        |WHERE event_type = 'purchase' AND lv IS NOT NULL
        |  AND (le IS NULL OR le < lv)
        |ORDER BY user_id, p_us, event_id""".stripMargin,
    "op198_pmi_collocations" ->
      s"""WITH doctok AS (
         |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS t
         |  FROM documents),
         |df AS (SELECT t, CAST(count(*) AS BIGINT) AS df
         |       FROM doctok GROUP BY 1),
         |vocab AS (
         |  SELECT t, df FROM (
         |    SELECT t, df, row_number() OVER (ORDER BY df DESC, t) AS rn
         |    FROM df) WHERE rn <= $pmiVocab),
         |dv AS (SELECT d.doc_id, d.t FROM doctok d
         |       JOIN vocab v USING (t)),
         |pairs AS (
         |  SELECT a.t AS t1, b.t AS t2, CAST(count(*) AS BIGINT) AS n_ab
         |  FROM dv a JOIN dv b USING (doc_id)
         |  WHERE a.t < b.t
         |  GROUP BY 1, 2 HAVING count(*) >= $pmiMinPairs),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM documents),
         |scored AS (
         |  SELECT p.t1, p.t2, p.n_ab, va.df AS n_a, vb.df AS n_b,
         |    tot.nt
         |  FROM pairs p
         |  JOIN vocab va ON p.t1 = va.t
         |  JOIN vocab vb ON p.t2 = vb.t
         |  CROSS JOIN tot)
         |SELECT t1, t2, n_ab, n_a, n_b, $pmiUSql AS pmi_micro
         |FROM scored
         |ORDER BY t1, t2""".stripMargin,
    "op156_repetition_filter" ->
      s"""WITH w AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |           FROM documents),
        |wc AS (SELECT doc_id, w, count(*) AS cnt FROM w GROUP BY 1, 2),
        |top AS (SELECT doc_id, w AS top_word,
        |               CAST(length(w) * cnt AS BIGINT) AS top_chars,
        |               row_number() OVER (PARTITION BY doc_id
        |                 ORDER BY cnt DESC, w) AS rk
        |        FROM wc),
        |chars AS (SELECT doc_id, sum(length(w) * cnt) AS word_chars
        |          FROM wc GROUP BY 1),
        |bg AS (SELECT doc_id, wl[i] || ' ' || wl[i+1] AS g
        |       FROM (SELECT doc_id, string_split(text,' ') AS wl
        |             FROM documents) t,
        |            LATERAL (SELECT unnest(range(1, len(wl))) AS i) u),
        |bgc AS (SELECT doc_id, g, count(*) AS cnt FROM bg GROUP BY 1, 2),
        |bga AS (SELECT doc_id, sum(cnt) AS nb, count(*) AS db
        |        FROM bgc GROUP BY 1)
        |SELECT t.doc_id, t.top_word,
        |  CAST(t.top_chars * 10000 // c.word_chars AS BIGINT)
        |    AS top_word_frac_bp,
        |  CAST(CASE WHEN a.nb IS NULL OR a.nb = 0 THEN 0
        |       ELSE (a.nb - a.db) * 10000 // a.nb END AS BIGINT)
        |    AS dup_bigram_frac_bp,
        |  CAST(CASE WHEN CAST(t.top_chars * 10000 // c.word_chars AS BIGINT)
        |              <= $topWordMaxBp
        |             AND CAST(CASE WHEN a.nb IS NULL OR a.nb = 0 THEN 0
        |                 ELSE (a.nb - a.db) * 10000 // a.nb END AS BIGINT)
        |              <= $dupBigramMaxBp
        |       THEN 1 ELSE 0 END AS BIGINT) AS keep
        |FROM top t
        |JOIN chars c USING (doc_id)
        |LEFT JOIN bga a USING (doc_id)
        |WHERE t.rk = 1
        |ORDER BY t.doc_id""".stripMargin,
    "op157_lm_quality_score" -> {
      s"""WITH bgdoc AS (
         |  SELECT doc_id, lang, wl[i] AS w1, wl[i+1] AS w2, count(*) AS occ
         |  FROM (SELECT doc_id, lang, string_split(text,' ') AS wl
         |        FROM documents) t,
         |       LATERAL (SELECT unnest(range(1, len(wl))) AS i) u
         |  GROUP BY 1, 2, 3, 4),
         |c12 AS (SELECT lang, w1, w2, sum(occ) AS c12 FROM bgdoc
         |        GROUP BY 1, 2, 3),
         |c1 AS (SELECT lang, w1, sum(c12) AS c1 FROM c12 GROUP BY 1, 2),
         |vocab AS (SELECT lang, count(DISTINCT w) AS v
         |          FROM (SELECT lang, unnest(string_split(text,' ')) AS w
         |                FROM documents) GROUP BY 1),
         |scored AS (
         |  SELECT b.doc_id,
         |         sum(b.occ * ($qlpUbpSql)) AS sum_qlp,
         |         sum(b.occ) AS n_bi
         |  FROM bgdoc b
         |  JOIN c12 USING (lang, w1, w2)
         |  JOIN c1 USING (lang, w1)
         |  JOIN vocab USING (lang)
         |  GROUP BY 1)
         |SELECT d.doc_id, d.lang,
         |  CAST(coalesce(s.n_bi, 0) AS BIGINT) AS n_bi,
         |  CAST(coalesce(s.sum_qlp, 0) AS BIGINT) AS sum_qlp,
         |  CAST(CASE WHEN coalesce(s.sum_qlp, 0) >=
         |    $qlpKeepAvgUbp * coalesce(s.n_bi, 0)
         |    THEN 1 ELSE 0 END AS BIGINT) AS keep
         |FROM documents d LEFT JOIN scored s USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin
    },
    "op158_mixture_sample" ->
      s"""WITH h AS (SELECT source, doc_id,
         |  ('0x' || substring(md5(source || '|' || CAST(doc_id AS VARCHAR)),
         |   1, 15))::BIGINT AS h
         |  FROM documents),
         |r AS (SELECT source, doc_id,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
         |       AS BIGINT) AS rank
         |  FROM h)
         |SELECT source, rank, doc_id FROM r WHERE rank <= $mixtureCap
         |ORDER BY source, rank""".stripMargin,
    "op159_cms_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(string_split(text,' ')) AS w
         |              FROM documents),
         |rows_ AS (SELECT unnest(range(0, $cmsDepth)) AS r),
         |cells AS (SELECT r,
         |  ('0x' || substring(md5(CAST(r AS VARCHAR) || ':' || w), 1, 15))
         |    ::BIGINT % $cmsWidth AS b
         |  FROM toks, rows_),
         |counters AS (SELECT r, b, count(*) AS cnt FROM cells
         |             GROUP BY 1, 2),
         |exact AS (SELECT w, count(*) AS exact_cnt FROM toks GROUP BY 1),
         |total AS (SELECT count(*) AS total FROM toks),
         |probes AS (SELECT e.w, e.exact_cnt, o.r,
         |  ('0x' || substring(md5(CAST(o.r AS VARCHAR) || ':' || e.w), 1, 15))
         |    ::BIGINT % $cmsWidth AS b
         |  FROM exact e, rows_ o),
         |est AS (SELECT p.w, p.exact_cnt, min(c.cnt) AS est_cnt
         |        FROM probes p JOIN counters c ON p.r = c.r AND p.b = c.b
         |        GROUP BY 1, 2)
         |SELECT w AS token, est_cnt, exact_cnt FROM est, total
         |WHERE est_cnt * 50 >= total
         |ORDER BY token""".stripMargin,
    "op252_gapfill_interp" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |hv AS (SELECT user_id, h, cents FROM (
        |  SELECT user_id, date_trunc('hour', ts) AS h, cents,
        |         row_number() OVER (
        |           PARTITION BY user_id, date_trunc('hour', ts)
        |           ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM ev) WHERE rk = 1),
        |grid AS (SELECT user_id,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |               date_trunc('hour', max(ts)) AS h1
        |        FROM ev GROUP BY 1)),
        |f AS (SELECT g.user_id, hv.cents,
        |  epoch_us(g.h) // 3600000000 AS hi,
        |  last_value(hv.cents IGNORE NULLS) OVER wa AS py,
        |  last_value(CASE WHEN hv.cents IS NOT NULL
        |    THEN epoch_us(g.h) // 3600000000 END IGNORE NULLS)
        |    OVER wa AS pd,
        |  last_value(hv.cents IGNORE NULLS) OVER wd AS ny,
        |  last_value(CASE WHEN hv.cents IS NOT NULL
        |    THEN epoch_us(g.h) // 3600000000 END IGNORE NULLS)
        |    OVER wd AS nd
        |  FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id
        |                          AND g.h = hv.h
        |  WINDOW wa AS (PARTITION BY g.user_id ORDER BY g.h
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        |  wd AS (PARTITION BY g.user_id ORDER BY g.h DESC
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
        |x AS (SELECT user_id, cents,
        |  CASE WHEN cents IS NOT NULL THEN cents * 1000
        |       WHEN py IS NULL THEN ny * 1000
        |       WHEN ny IS NULL THEN py * 1000
        |       ELSE (CASE WHEN py * (nd - hi) + ny * (hi - pd) < 0
        |             THEN -1 ELSE 1 END) *
        |            ((abs(py * (nd - hi) + ny * (hi - pd)) * 1000)
        |             // (nd - pd))
        |  END AS fill_milli
        |  FROM f)
        |SELECT user_id, count(*) AS hours_total,
        |  count(cents) AS hours_obs,
        |  CAST(sum(fill_milli) AS BIGINT) AS interp_sum_milli
        |FROM x GROUP BY 1 ORDER BY user_id""".stripMargin,
    "op160_gapfill_locf" ->
      """WITH ev AS (SELECT user_id, ts, event_id,
        |  CAST(round(value * 100, 0) AS BIGINT) AS cents FROM events),
        |hv AS (SELECT user_id, h, cents FROM (
        |  SELECT user_id, date_trunc('hour', ts) AS h, cents,
        |         row_number() OVER (
        |           PARTITION BY user_id, date_trunc('hour', ts)
        |           ORDER BY ts DESC, event_id DESC) AS rk
        |  FROM ev) WHERE rk = 1),
        |grid AS (SELECT user_id,
        |  unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS h
        |  FROM (SELECT user_id, date_trunc('hour', min(ts)) AS h0,
        |               date_trunc('hour', max(ts)) AS h1
        |        FROM ev GROUP BY 1)),
        |f AS (SELECT g.user_id, g.h, hv.cents,
        |  last_value(hv.cents IGNORE NULLS) OVER (
        |    PARTITION BY g.user_id ORDER BY g.h) AS locf
        |  FROM grid g LEFT JOIN hv ON g.user_id = hv.user_id
        |                          AND g.h = hv.h)
        |SELECT user_id, count(*) AS hours_total,
        |  count(cents) AS hours_obs,
        |  count(*) - count(cents) AS hours_filled,
        |  CAST(sum(locf) AS BIGINT) AS locf_sum_cents
        |FROM f GROUP BY 1 ORDER BY user_id""".stripMargin,
    "op161_funnel" ->
      """WITH ev AS (SELECT user_id, event_type,
        |  epoch_us(ts) * 1000 AS ts_ns FROM events),
        |s1 AS (SELECT user_id, min(ts_ns) AS t1 FROM ev
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(e.ts_ns) AS t2, min(s1.t1) AS t1
        |       FROM ev e JOIN s1 USING (user_id)
        |       WHERE e.event_type = 'click' AND e.ts_ns > s1.t1
        |       GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(e.ts_ns) AS t3, min(s2.t2) AS t2
        |       FROM ev e JOIN s2 USING (user_id)
        |       WHERE e.event_type = 'purchase' AND e.ts_ns > s2.t2
        |       GROUP BY 1)
        |SELECT * FROM (
        |  SELECT '1_view' AS step, count(*) AS users,
        |         CAST(0 AS BIGINT) AS lat_sum_s FROM s1
        |  UNION ALL
        |  SELECT '2_click', count(*),
        |         CAST(coalesce(sum((t2 - t1) // 1000000000), 0)
        |              AS BIGINT) FROM s2
        |  UNION ALL
        |  SELECT '3_purchase', count(*),
        |         CAST(coalesce(sum((t3 - t2) // 1000000000), 0)
        |              AS BIGINT) FROM s3)
        |ORDER BY step""".stripMargin,
    "op162_retention_cohorts" ->
      """WITH ev AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
        |            FROM events),
        |fs AS (SELECT user_id, min(day) AS cohort_day FROM ev GROUP BY 1)
        |SELECT
        |  CAST(date_diff('day', DATE '2024-01-01', fs.cohort_day)
        |       AS BIGINT) AS cohort_idx,
        |  CAST(date_diff('day', fs.cohort_day, ev.day) AS BIGINT)
        |    AS offset_d,
        |  count(*) AS users
        |FROM ev JOIN fs USING (user_id)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "op200_session_paths" ->
      s"""WITH ev AS (SELECT user_id, event_id,
         |  epoch_us(ts) * 1000 AS ts_ns, event_type FROM events),
         |o AS (SELECT *, lag(ts_ns) OVER (PARTITION BY user_id
         |        ORDER BY ts_ns, event_id) AS prev FROM ev),
         |b AS (SELECT *, CASE WHEN prev IS NULL
         |        OR ts_ns - prev > $spGapNs THEN 1 ELSE 0 END AS brk
         |      FROM o),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
         |        ORDER BY ts_ns, event_id) AS sess FROM b),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
         |        ORDER BY ts_ns, event_id) AS rn FROM s),
         |p AS (SELECT user_id, sess,
         |        string_agg(event_type, '>'
         |          ORDER BY ts_ns, event_id) AS path
         |      FROM r WHERE rn <= $spMaxLen GROUP BY 1, 2)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM p GROUP BY 1 HAVING count(*) >= $spSupport
         |ORDER BY path""".stripMargin,
    "op205_windowed_funnel" ->
      s"""WITH ev AS (SELECT user_id, event_type,
         |  epoch_us(ts) * 1000 AS ts_ns FROM events),
         |s1 AS (SELECT user_id, min(ts_ns) AS t1 FROM ev
         |       WHERE event_type = 'view' GROUP BY 1),
         |s2 AS (SELECT e.user_id, min(e.ts_ns) AS t2, min(s1.t1) AS t1
         |       FROM ev e JOIN s1 USING (user_id)
         |       WHERE e.event_type = 'click' AND e.ts_ns > s1.t1
         |         AND e.ts_ns <= s1.t1 + $fwClickNs
         |       GROUP BY 1),
         |s3 AS (SELECT e.user_id, min(e.ts_ns) AS t3, min(s2.t2) AS t2
         |       FROM ev e JOIN s2 USING (user_id)
         |       WHERE e.event_type = 'purchase' AND e.ts_ns > s2.t2
         |         AND e.ts_ns <= s2.t2 + $fwPurchaseNs
         |       GROUP BY 1)
         |SELECT * FROM (
         |  SELECT '1_view' AS step, count(*) AS users,
         |         CAST(0 AS BIGINT) AS lat_sum_s FROM s1
         |  UNION ALL
         |  SELECT '2_click', count(*),
         |         CAST(coalesce(sum((t2 - t1) // 1000000000), 0)
         |              AS BIGINT) FROM s2
         |  UNION ALL
         |  SELECT '3_purchase', count(*),
         |         CAST(coalesce(sum((t3 - t2) // 1000000000), 0)
         |              AS BIGINT) FROM s3)
         |ORDER BY step""".stripMargin,
    "op206_last_touch_attribution" ->
      s"""WITH p AS (SELECT event_id, user_id,
         |  epoch_us(ts) * 1000 AS ts_ns FROM events
         |  WHERE event_type = 'purchase'),
         |t AS (SELECT user_id, epoch_us(ts) * 1000 AS ts_ns,
         |  event_id, event_type FROM events
         |  WHERE event_type <> 'purchase'),
         |j AS (SELECT p.event_id, t.ts_ns AS tts,
         |        t.event_type AS ttype,
         |        row_number() OVER (PARTITION BY p.event_id
         |          ORDER BY t.ts_ns DESC, t.event_id DESC) AS rk
         |      FROM p JOIN t ON t.user_id = p.user_id
         |        AND t.ts_ns <= p.ts_ns),
         |best AS (SELECT event_id, tts, ttype FROM j WHERE rk = 1),
         |att AS (SELECT p.event_id,
         |    CASE WHEN b.tts IS NOT NULL
         |         AND p.ts_ns - b.tts <= $attrLookbackNs
         |         THEN b.ttype ELSE 'none' END AS attributed_type,
         |    CASE WHEN b.tts IS NOT NULL
         |         AND p.ts_ns - b.tts <= $attrLookbackNs
         |         THEN (p.ts_ns - b.tts) // 1000000000
         |         ELSE 0 END AS lat_s
         |  FROM p LEFT JOIN best b USING (event_id))
         |SELECT attributed_type, CAST(count(*) AS BIGINT) AS n_purchases,
         |  CAST(sum(lat_s) AS BIGINT) AS lat_sum_s
         |FROM att GROUP BY 1 ORDER BY attributed_type""".stripMargin,
    "op201_strata_alloc" ->
      s"""WITH n AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs
         |           FROM documents GROUP BY 1),
         |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS tot FROM n),
         |a AS (SELECT source, n_docs,
         |        ($strataBudget * n_docs) // tot AS base,
         |        ($strataBudget * n_docs) % tot AS rem
         |      FROM n, t),
         |dfc AS (SELECT CAST($strataBudget - sum(base) AS BIGINT)
         |          AS deficit FROM a),
         |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, source)
         |        AS rr FROM a),
         |alloc AS (SELECT source, n_docs,
         |    CAST(base + CASE WHEN rr <= deficit THEN 1 ELSE 0 END
         |         AS BIGINT) AS alloc
         |  FROM r, dfc),
         |h AS (SELECT source, doc_id,
         |  ('0x' || substring(md5(source || '|' || CAST(doc_id AS VARCHAR)),
         |   1, 15))::BIGINT AS h
         |  FROM documents),
         |rk AS (SELECT source, doc_id,
         |  CAST(row_number() OVER (PARTITION BY source ORDER BY h, doc_id)
         |       AS BIGINT) AS rank
         |  FROM h)
         |SELECT k.source, a2.n_docs, a2.alloc, k.rank, k.doc_id
         |FROM rk k JOIN alloc a2 USING (source)
         |WHERE k.rank <= a2.alloc
         |ORDER BY source, rank""".stripMargin)
}
