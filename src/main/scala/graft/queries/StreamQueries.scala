package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.streaming.WindowOps
import Det.{bp4, ordered}

/** Event-time windowing queries (OP-51/52/53 batch-checkable surface).
  * op51 executes through a genuine Structured Streaming query (file
  * source → watermark → memory sink); the rest are the batch twins of the
  * same operators. All oracles replicate window assignment arithmetic in
  * DuckDB on epoch microseconds (exact integers).
  */
object StreamQueries {
  type Q = (SparkSession, String) => DataFrame

  /** OP-51: watermarked tumbling agg via a real streaming execution. */
  val op51Streamed: Q = (s, d) =>
    ordered(WindowOps.streamedTumbling(s, d), "w_start", "event_type")

  /** OP-52: tumbling window (1 hour) — batch twin. */
  val op52Tumbling: Q = (s, d) =>
    ordered(WindowOps.tumblingCounts(Tables.events(s, d), "1 hour"),
      "w_start", "event_type")

  /** OP-52: sliding window (10 min width, 5 min slide) — each event lands
    * in exactly two windows. */
  val op52Sliding: Q = (s, d) =>
    ordered(WindowOps.slidingCounts(Tables.events(s, d), "10 minutes", "5 minutes"),
      "w_start", "event_type")

  /** OP-53: session windows (30 min gap) per user — batch twin of the
    * stateful sessionization. */
  val op53Session: Q = (s, d) =>
    ordered(WindowOps.sessionAgg(Tables.events(s, d), "30 minutes"),
      "user_id", "session_start")

  /** OP-36 as-of join: each purchase enriched with the user's most recent
    * signup at-or-before it (point-in-time lookup; see ops/AsOf). Oracle:
    * DuckDB's native ASOF JOIN. */
  val op36AsOf: Q = (s, d) => {
    val e = Tables.events(s, d)
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts"))
    val signups = e.filter(col("event_type") === "signup")
      .select(col("user_id"), col("ts"), col("value"))
    val joined = graft.ops.AsOf.join(purchases, signups,
      key = "user_id", time = "ts", payload = Seq("value"))
    ordered(
      joined.select(col("event_id"), col("user_id"),
        date_format(col("ts"), "yyyy-MM-dd HH:mm:ss").as("t"),
        bp4(col("asof_value")).as("signup_value")),
      "event_id")
  }

  /** op163: streaming dedup via dropDuplicatesWithinWatermark — at most
    * one event per (user, type, day); output is per-type kept-key counts
    * (survivor identity never reaches the result, so the streaming
    * first-seen nondeterminism is invisible — see
    * [[graft.streaming.EventStreams.dedupWithinWatermark]]). */
  val op163StreamDedupWm: Q = (s, d) =>
    ordered(graft.streaming.EventStreams.dedupWithinWatermark(s, d),
      "event_type")

  /** op164: stream-stream LEFT OUTER time-bounded join (views ⟕ clicks
    * within 10 min per user) — the outer completion of OP-30; unmatched
    * views flush as NULL rows in the trailing no-data batch once the
    * final watermark clears their horizon. */
  val op164StreamLeftOuter: Q = (s, d) =>
    ordered(graft.streaming.EventStreams.leftOuterBoundedJoin(s, d),
      "view_id", "click_id")

  /** op275: stream-stream FULL OUTER time-bounded join — both sides'
    * unmatched rows flush as the watermark clears their horizons (see
    * [[graft.streaming.EventStreams.fullOuterBoundedJoin]]); with
    * op30 (inner), op123 (bounded production twin) and op164 (left)
    * this completes the stream-stream join-type matrix. */
  val op275StreamFullOuter: Q = (s, d) =>
    ordered(graft.streaming.EventStreams.fullOuterBoundedJoin(s, d),
      "vk", "ck")

  /** op199: STREAMING sessionized funnel — op161's ordered
    * view → click → purchase chain maintained online per user
    * (transformWithState; see [[graft.streaming.FunnelStream]]). Each
    * closed step arrives as one append-mode hit carrying its latency;
    * the serving aggregation counts hits and sums latencies per step —
    * by the fold's exactness this IS the batch chain, so op199 sits
    * under op161's UNCHANGED oracle (the step frame left-join keeps the
    * three rows present even for empty stages, like op161's unions). */
  private def funnelServe(s: SparkSession,
      hits: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val agg = hits.groupBy("step")
      .agg(count(lit(1)).as("users"), sum("lat_s").as("lat_sum_s"))
    val steps = Seq("1_view", "2_click", "3_purchase").toDF("step")
    ordered(
      steps.join(agg, Seq("step"), "left")
        .select(col("step"),
          coalesce(col("users"), lit(0L)).as("users"),
          coalesce(col("lat_sum_s"), lit(0L)).as("lat_sum_s")),
      "step")
  }

  val op199StreamFunnel: Q = (s, d) =>
    funnelServe(s, graft.streaming.EventStreams.funnelStepHits(s, d))

  /** op207: STREAMING windowed funnel — op205's deadline chain
    * maintained online (the op199 processor with conversion windows;
    * an expired step never fires, so no timers are needed and state
    * stays three longs per user). Same fold-exactness argument as
    * op199, so op207 sits under op205's UNCHANGED oracle. */
  val op207StreamWindowedFunnel: Q = (s, d) =>
    funnelServe(s, graft.streaming.EventStreams.funnelStepHits(s, d,
      AnalyticsQueries.fwClickNs, AnalyticsQueries.fwPurchaseNs))

  /** op203: STREAMING session-path emission — op200's trajectory mining
    * online (transformWithState; see [[graft.streaming
    * .SessionPathStream]]): each session's capped event-type path is
    * emitted the moment a gap closes it; each user's FINAL session is
    * operator state, not output (the op131 closed-rows contract), so
    * the oracle is op200's chain restricted to non-final sessions. */
  val op203StreamSessionPaths: Q = (s, d) => {
    import Det.big
    val closed = graft.streaming.EventStreams.closedSessionPaths(
      s, d, AnalyticsQueries.spMaxLen, AnalyticsQueries.spGapNs)
    ordered(
      closed.groupBy("path").agg(big(count(lit(1))).as("n_sessions"))
        .where(col("n_sessions") >= AnalyticsQueries.spSupport),
      "path")
  }

  /** op249: STREAMING Markov transitions — op166's matrix maintained
    * online ([[graft.streaming.TransitionStream]]): per-user state is
    * ONE event, each arrival emits its (prev, cur) pair append-mode,
    * and the serving rollup (counts → row-normalized bp) is the op166
    * chain verbatim. No closed-rows caveat — a transition exists the
    * moment its later event lands — so the streamed multiset equals
    * the batch lag() chain EXACTLY and op249 sits under op166's
    * UNCHANGED oracle. With op245 this closes the behavioural-model
    * loop online: maintain the matrix, score its prediction accuracy,
    * alarm on decay. */
  val op249StreamTransitions: Q = (s, d) => {
    import Det.big
    val pairs = graft.streaming.EventStreams.transitionPairs(s, d)
    val trans = pairs.groupBy("prev_type", "cur_type")
      .agg(count(lit(1)).as("n"))
    val totals = trans.groupBy("prev_type").agg(sum("n").as("tot"))
    ordered(
      trans.join(broadcast(totals), "prev_type")
        .withColumn("prob_bp", expr("CAST(n * 10000 div tot AS BIGINT)"))
        .select("prev_type", "cur_type", "n", "prob_bp"),
      "prev_type", "cur_type")
  }

  val defs: Map[String, Q] = Map(
    "op249_stream_transitions" -> op249StreamTransitions,
    "op36_asof_join" -> op36AsOf,
    "op51_stream_watermark" -> op51Streamed,
    "op52_window_tumbling" -> op52Tumbling,
    "op52_window_sliding" -> op52Sliding,
    "op53_window_session" -> op53Session,
    "op163_stream_dedup_wm" -> op163StreamDedupWm,
    "op164_stream_left_outer" -> op164StreamLeftOuter,
    "op275_stream_full_outer" -> op275StreamFullOuter,
    "op199_stream_funnel" -> op199StreamFunnel,
    "op203_stream_session_paths" -> op203StreamSessionPaths,
    "op207_stream_windowed_funnel" -> op207StreamWindowedFunnel,
  )

  private val tumblingSql =
    """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS w_start,
      |       event_type, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(round(value * 100) AS BIGINT)) * 100 AS BIGINT) AS sum_value
      |FROM events GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin

  val oracle: Map[String, String] = Map(
    "op36_asof_join" ->
      """SELECT p.event_id, p.user_id,
        |       strftime(p.ts, '%Y-%m-%d %H:%M:%S') AS t,
        |       CAST(CAST(s.value AS DECIMAL(18,4)) * 10000 AS BIGINT) AS signup_value
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN
        |     (SELECT user_id, ts, value FROM events WHERE event_type = 'signup') s
        |  ON p.user_id = s.user_id AND p.ts >= s.ts
        |ORDER BY event_id""".stripMargin,
    "op51_stream_watermark" -> tumblingSql,
    "op52_window_tumbling" -> tumblingSql,
    "op52_window_sliding" ->
      """WITH shifted AS (
        |  SELECT event_type,
        |         epoch_us(ts) - (epoch_us(ts) % 300000000) - k * 300000000 AS w_us
        |  FROM events, unnest([0, 1]) AS t(k))
        |SELECT strftime(make_timestamp(w_us), '%Y-%m-%d %H:%M:%S') AS w_start,
        |       event_type, CAST(count(*) AS BIGINT) AS n
        |FROM shifted GROUP BY 1, 2 ORDER BY w_start, event_type""".stripMargin,
    "op53_window_session" ->
      """WITH e AS (
        |  SELECT user_id, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |  FROM events),
        |m AS (
        |  SELECT *, CASE WHEN prev IS NULL
        |                   OR epoch_us(ts) - epoch_us(prev) > 1800000000
        |                 THEN 1 ELSE 0 END AS brk
        |  FROM e),
        |s AS (
        |  SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess
        |  FROM m)
        |SELECT user_id,
        |       strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
        |       CAST(count(*) AS BIGINT) AS n_events,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) * 100 AS BIGINT) AS sum_value
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id, session_start""".stripMargin,
    "op163_stream_dedup_wm" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept
        |FROM (SELECT DISTINCT user_id, event_type,
        |             date_trunc('day', ts) AS day FROM events)
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "op164_stream_left_outer" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |      FROM events WHERE event_type = 'click'),
        |wm AS (SELECT least(
        |  (SELECT max(ts) FROM events WHERE event_type = 'view'),
        |  (SELECT max(ts) FROM events WHERE event_type = 'click')) AS w),
        |m AS (SELECT v.view_id, v.user_id, c.click_id,
        |        CAST((epoch_us(c.click_ts) - epoch_us(v.view_ts))
        |             // 1000000 AS BIGINT) AS lag_s
        |      FROM v JOIN c ON v.user_id = c.user_id
        |        AND c.click_ts > v.view_ts
        |        AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE),
        |unm AS (SELECT v.view_id, v.user_id,
        |          CAST(NULL AS BIGINT) AS click_id,
        |          CAST(NULL AS BIGINT) AS lag_s
        |        FROM v, wm
        |        WHERE NOT EXISTS (SELECT 1 FROM c
        |          WHERE c.user_id = v.user_id AND c.click_ts > v.view_ts
        |            AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE)
        |          AND v.view_ts + INTERVAL 10 MINUTE < wm.w)
        |SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM unm)
        |ORDER BY view_id, click_id""".stripMargin,
    "op275_stream_full_outer" ->
      """WITH v AS (SELECT event_id AS view_id, user_id, ts AS view_ts
        |           FROM events WHERE event_type = 'view'),
        |c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
        |      FROM events WHERE event_type = 'click'),
        |wm AS (SELECT least(
        |  (SELECT max(ts) FROM events WHERE event_type = 'view'),
        |  (SELECT max(ts) FROM events WHERE event_type = 'click')) AS w),
        |m AS (SELECT v.view_id AS vk, c.click_id AS ck, v.user_id,
        |        CAST((epoch_us(c.click_ts) - epoch_us(v.view_ts))
        |             // 1000000 AS BIGINT) AS lag_s
        |      FROM v JOIN c ON v.user_id = c.user_id
        |        AND c.click_ts > v.view_ts
        |        AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE),
        |vo AS (SELECT v.view_id AS vk, CAST(-1 AS BIGINT) AS ck,
        |         v.user_id, CAST(NULL AS BIGINT) AS lag_s
        |       FROM v, wm
        |       WHERE NOT EXISTS (SELECT 1 FROM c
        |         WHERE c.user_id = v.user_id AND c.click_ts > v.view_ts
        |           AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE)
        |         AND v.view_ts + INTERVAL 10 MINUTE < wm.w),
        |co AS (SELECT CAST(-1 AS BIGINT) AS vk, c.click_id AS ck,
        |         c.user_id, CAST(NULL AS BIGINT) AS lag_s
        |       FROM c, wm
        |       WHERE NOT EXISTS (SELECT 1 FROM v
        |         WHERE v.user_id = c.user_id AND c.click_ts > v.view_ts
        |           AND c.click_ts <= v.view_ts + INTERVAL 10 MINUTE)
        |         AND c.click_ts < wm.w)
        |SELECT * FROM (SELECT * FROM m UNION ALL SELECT * FROM vo
        |               UNION ALL SELECT * FROM co)
        |ORDER BY vk, ck""".stripMargin,
  ) +
    // op249 is op166 maintained online; stream ≡ batch, shared oracle
    ("op249_stream_transitions" ->
      SketchQueries.oracle("op166_markov_transitions")) +
    // op199 is op161 maintained online; the shared oracle is the proof
    ("op199_stream_funnel" -> AnalyticsQueries.oracle("op161_funnel")) +
    // op207 is op205's deadline chain maintained online — same proof
    ("op207_stream_windowed_funnel" ->
      AnalyticsQueries.oracle("op205_windowed_funnel")) +
    // op203 is op200 restricted to CLOSED sessions (each user's final
    // session is operator state, not output)
    ("op203_stream_session_paths" ->
      s"""WITH ev AS (SELECT user_id, event_id,
         |  epoch_us(ts) * 1000 AS ts_ns, event_type FROM events),
         |o AS (SELECT *, lag(ts_ns) OVER (PARTITION BY user_id
         |        ORDER BY ts_ns, event_id) AS prev FROM ev),
         |b AS (SELECT *, CASE WHEN prev IS NULL
         |        OR ts_ns - prev > ${AnalyticsQueries.spGapNs}
         |        THEN 1 ELSE 0 END AS brk
         |      FROM o),
         |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id
         |        ORDER BY ts_ns, event_id) AS sess FROM b),
         |mx AS (SELECT user_id, max(sess) AS mxs FROM s GROUP BY 1),
         |r AS (SELECT *, row_number() OVER (PARTITION BY user_id, sess
         |        ORDER BY ts_ns, event_id) AS rn FROM s),
         |p AS (SELECT user_id, sess,
         |        string_agg(event_type, '>'
         |          ORDER BY ts_ns, event_id) AS path
         |      FROM r WHERE rn <= ${AnalyticsQueries.spMaxLen}
         |      GROUP BY 1, 2),
         |closed AS (SELECT p.path FROM p JOIN mx USING (user_id)
         |           WHERE p.sess < mx.mxs)
         |SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
         |FROM closed GROUP BY 1
         |HAVING count(*) >= ${AnalyticsQueries.spSupport}
         |ORDER BY path""".stripMargin)
}
