package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Dedup, Similarity, TextOps}
import graft.sources.Tables
import Det.{big, ordered}

/** Training-data pipeline pack: deduplication, similarity search, and text
  * analysis over the `documents` / `embeddings` fixtures (north-star
  * extensions; first-class operators alongside SURVEY.md §2).
  *
  * Oracle strategy: all scores are exact integers (basis points) or
  * md5-derived hashes, so DuckDB reproduces them bit-for-bit; float-native
  * variants (cosine with double accumulation, simhash) are covered by
  * ScalaTest instead (rows-only driver check).
  */
object TrainQueries {
  type Q = (SparkSession, String) => DataFrame

  /** Telemetry → training text: batch sessionization of the events
    * stream (30-minute inactivity gap: lag + cumulative-sum window, the
    * classic batch spelling of op53's streaming session windows) and
    * assembly of each session's event-type sequence into a behavior
    * DOCUMENT — the step that turns interaction logs into text the
    * dedup/quality/packing operators consume downstream.
    *
    * Scale: ONE shuffle keyed by user — the window partitions by
    * user_id, and the (user_id, sess_id) aggregate reuses that
    * partitioning (user_id hash-partitioning satisfies the clustered
    * distribution on a superset key — spec-asserted single Exchange).
    * Per-user window state and per-session collect_list are bounded by
    * one user's events. Ties break on event_id, so ordering — and the
    * assembled text — is deterministic under any partitioning. Time is
    * truncated to MICROseconds on both engines (DuckDB coerces the
    * TIMESTAMP(NANOS) parquet to µs — the op51-53 precedent). */
  val op105SessionDocs: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val sess = ev
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          col("ts_us") - col("prev_ts") > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("sess_id", sum(col("new_sess")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint"))
    ordered(
      sess.groupBy(col("user_id"), col("sess_id"))
        .agg(big(count(lit(1))).as("n_events"),
          min(col("ts_us")).cast("bigint").as("sess_start_us"),
          (max(col("ts_us")) - min(col("ts_us"))).cast("bigint")
            .as("duration_us"),
          array_join(transform(array_sort(collect_list(
              struct(col("ts_us"), col("event_id"), col("event_type")))),
            x => x.getField("event_type")), " ").as("behavior_text")),
      "user_id", "sess_id")
  }

  /** Changelog compaction: the latest state per key from a change
    * stream — the reference pipeline's whole purpose (materialize
    * current customer state out of a Kafka change topic into Redis,
    * SURVEY §2.1) re-expressed as ONE partial-aggregating Spark
    * aggregate over the unique total order (ts, event_id). The
    * aggregate is [[graft.functions.LatestAgg]] (TypedImperative →
    * ObjectHashAggregate): the built-in `max_by(struct, struct)` would
    * plan a SortAggregate (struct buffers aren't hash-aggregable) and
    * SORT every input partition; LatestAgg hashes instead, and the
    * shuffle still carries one buffer row per key per partition —
    * never the window-sort spelling that orders the full 100 TB
    * changelog. Value leaves as exact integer cents ([[Det.centsSum]]
    * contract). Streaming twin:
    * [[graft.streaming.Changelog.latestState]], spec'd equal on the
    * same fixture; LatestAgg ≡ max_by is spec'd too. */
  val op106ChangelogCompact: Q = (s, d) => {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("event_id"),
        expr("ts_ns div 1000").as("ts_us"), col("event_type"),
        round(col("value") * 100, 0).cast("bigint").as("value_cents"))
    ordered(
      ev.groupBy(col("user_id"))
        .agg(graft.functions.LatestAgg.latest(col("ts_us"), col("event_id"),
          col("event_type"), col("value_cents")).as("last"))
        .select(col("user_id"), big(col("last.n")).as("n_changes"),
          big(col("last.event_id")).as("last_event_id"),
          col("last.event_type").as("last_event_type"),
          col("last.value_cents").as("last_value_cents"),
          big(col("last.ts_us")).as("last_ts_us")),
      "user_id")
  }

  /** Deterministic corpus shuffle: every training run shuffles its
    * corpus once before packing (op87) so gradient batches decorrelate —
    * and the order must be REPRODUCIBLE (resume mid-epoch, re-shard,
    * re-run bit-identically). Position = rank of md5(seed ‖ doc_id):
    * content-independent, seed-switchable, stable under any
    * partitioning. The global rank is computed WITHOUT a global sort:
    * rows bucket by the hash's first byte (256 ranges whose
    * lexicographic order equals the hash order), rank within buckets in
    * parallel, and add broadcast bucket offsets from a 256-row
    * cumulative sum — the scalable global-index shape; no single
    * partition ever sees more than ~1/256 of the corpus. `shard` is the
    * round-robin writer assignment downstream epoch readers consume. */
  val op107CorpusShuffle: Q = (s, d) =>
    ordered(
      hashShufflePositions(Tables.documents(s, d).select(col("doc_id")))
        .select(col("doc_id"), col("pos"),
          ((col("pos") - 1L) % 16L).as("shard")),
      "doc_id")

  /** op107's core, reusable: append the global shuffle position
    * (rank of md5("shuf:42:" ‖ doc_id), ties to doc_id) to ANY frame
    * carrying a unique `doc_id` — computed without a global sort (256
    * hash-prefix buckets rank in parallel; broadcast offsets from a
    * 256-row cumsum). All input columns pass through. NOTE: the input
    * subtree is evaluated twice (offsets aggregate + rank window) —
    * callers whose input is post-shuffle (not a bare scan) should
    * materialize it first (op113 localCheckpoints its survivors). */
  private[graft] def hashShufflePositions(df: DataFrame): DataFrame = {
    val h = df
      .withColumn("h",
        md5(concat(lit("shuf:42:"), col("doc_id").cast("string"))))
      .withColumn("bucket", substring(col("h"), 1, 2))
    val perBucket = row_number().over(
      Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id")))
    val offsets = h.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("off",
        (sum(col("cnt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          - col("cnt")).cast("bigint"))
      .select(col("bucket"), col("off"))
    h.withColumn("rn", perBucket.cast("bigint"))
      .join(broadcast(offsets), "bucket")
      .withColumn("pos", col("off") + col("rn"))
      .drop("h", "bucket", "rn", "off")
  }

  /** END-TO-END curation pipeline (op113): quality gate (op90's rules)
    * → exact dedup (min-id survivor per distinct text) → deterministic
    * corpus shuffle (op107's rank) → shard assignment → sequence
    * packing (op87's concatenate-and-cut at 64 tokens, streams keyed
    * by shard in shuffle order) — the one-call manifest a training run
    * consumes, proving the operators COMPOSE: every stage is the
    * already-oracle-checked operator, chained.
    *
    * Scale: gate is scan-stage (zero shuffles), dedup is one text-hash
    * shuffle, the shuffle rank is bucket-parallel (no global sort),
    * packing is one shard-keyed window — the same shapes as the
    * standalone ops; survivors materialize once (localCheckpoint) so
    * the offsets pass doesn't recompute the dedup. */
  val op113CurationPipeline: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val t = doc.select(col("doc_id"), col("text"),
        TextOps.tokens(col("text")).as("toks"),
        TextOps.tokenCountWs(col("text")).as("n_words"),
        TextOps.meanTokenLenBp(col("text")).as("mean_len_bp"),
        TextOps.markerCount(col("text"), TextQueries.enStop).as("stop_hits"))
      .withColumn("distinct_bp",
        expr("size(array_distinct(toks)) * 10000 div n_words").cast("bigint"))
    val gated = t.filter(col("n_words") >= 20L &&
        col("mean_len_bp").between(40000L, 47000L) &&
        col("distinct_bp") >= 5000L && col("stop_hits") >= 2L)
      .select(col("doc_id"), col("text"))
    val survivors = gated.groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"), TextOps.tokenCountWs(col("text")).as("n_tok"))
      .localCheckpoint()
    val sh = hashShufflePositions(survivors)
      .withColumn("shard", ((col("pos") - 1L) % 8L).cast("bigint"))
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, -1)
    ordered(
      sh.withColumn("tok_off",
          coalesce(sum(col("n_tok")).over(w), lit(0L)).cast("bigint"))
        .filter(col("n_tok") > 0)
        .select(col("doc_id"), col("pos"), col("shard"), col("n_tok"),
          col("tok_off"),
          explode(sequence(expr("tok_off div 64"),
            expr("(tok_off + n_tok - 1) div 64"))).as("pack_id"))
        .select(col("doc_id"), col("pos"), col("shard"), col("n_tok"),
          col("tok_off"), col("pack_id").cast("bigint").as("pack_id"),
          greatest(col("pack_id") * 64L - col("tok_off"), lit(0L))
            .cast("bigint").as("start_in_doc"),
          least((col("pack_id") + 1L) * 64L - col("tok_off"), col("n_tok"))
            .cast("bigint").as("end_in_doc")),
      "doc_id", "pack_id")
  }

  /** Shared drain for the streaming ANN probe queries: file-source
    * stream of the fixture query vectors (vec_id < 8) → `probe` →
    * memory sink, Trigger.AvailableNow — one replay carries every query
    * in a single trigger, so the emitted top-k equals the batch probe
    * exactly. The file streaming source lists a directory, so the
    * single fixture file is exposed through a temp dir of symlinks
    * (the op51 recipe). Bench note: each invocation constructs and
    * starts a FRESH stream, so the measured time is mostly query
    * start + plan codegen — a real serving deployment pays that once
    * per stream, and the per-batch marginal cost is the pruned
    * stream-static join. */
  /** Shared drain for the streaming queries: file-source stream of ONE
    * fixture table (the file source lists a directory, so the fixture
    * file is exposed through a temp dir of symlinks — the op51 recipe)
    * → `pipe` → memory sink, Trigger.AvailableNow. Stateful shuffle
    * width is scoped to the stream (same rationale as
    * WindowOps.streamedTumbling); symlink cleanup runs in finally so a
    * failed stream doesn't leak the temp dir; the sink's rows are
    * lifted out and the temp view dropped, so repeated invocations
    * (Bench reps) don't pin result sets in the session. */
  private[queries] def drainStream(s: SparkSession, d: String, tag: String,
      table: String, mode: String, parts: String)(
      pipe: DataFrame => DataFrame): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    // events goes through the adaptive loader for its SCHEMA so a nanos
    // fixture in a session lacking the legacy flag fails with the
    // helpful Tables.eventsRaw diagnostic instead of the raw
    // PARQUET_TYPE_ILLEGAL error (the streaming read below then types
    // ts identically to the batch path)
    val schema =
      if (table == "events") Tables.eventsRaw(s, d).schema
      else s.read.parquet(s"$d/$table.parquet").schema
    val streamDir = java.nio.file.Files.createTempDirectory(s"graft_${tag}_")
    val link = streamDir.resolve(s"$table.parquet")
    val name = s"graft_${tag}_${System.nanoTime()}"
    val prevShuffle = s.conf.get("spark.sql.shuffle.partitions")
    try {
      java.nio.file.Files.createSymbolicLink(link,
        java.nio.file.Paths.get(s"$d/$table.parquet"))
      val src = s.readStream.schema(schema).parquet(streamDir.toString)
      s.conf.set("spark.sql.shuffle.partitions", parts)
      val q = pipe(src).writeStream.outputMode(mode)
        .format("memory").queryName(name)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    } finally {
      s.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      java.nio.file.Files.deleteIfExists(link)
      java.nio.file.Files.deleteIfExists(streamDir): Unit
    }
    val out = s.table(name)
    val rows = out.collect()
    s.catalog.dropTempView(name)
    s.createDataFrame(java.util.Arrays.asList(rows: _*), out.schema)
  }

  /** op106's streaming twin under the hash gate: the events changelog
    * drained through [[graft.streaming.Changelog.latestState]] (real
    * Update-mode flatMapGroupsWithState execution, AvailableNow file
    * source → memory sink), then the update rows compacted to each
    * key's FINAL state — exactly what a KV/compacted-topic sink does
    * with an update stream, and bounded by touched keys, not events
    * (n_changes strictly grows per key, so max-n_changes is the last
    * write). Output ≡ batch op106, so it shares op106's oracle. */
  val op108StreamChangelog: Q = (s, d) => {
    import s.implicits._
    import graft.streaming.Changelog
    val updates = drainStream(s, d, "op108", "events", "update", "8") { st =>
      // raw stream schema: ts is whatever the fixture carries (nanos-long
      // or micros timestamp) — tsUsExpr adapts (see Tables.eventsColumns)
      Changelog.latestState(
        st.select(col("user_id"), col("event_id"),
          Tables.tsUsExpr(st).as("ts_us"), col("event_type"),
          round(col("value") * 100, 0).cast("bigint").as("value_cents"))
          .as[Changelog.Change]).toDF()
    }
    ordered(
      updates.groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_changes"), col("last_event_id"),
            col("last_event_type"), col("last_value_cents"),
            col("last_ts_us")),
          col("n_changes")).as("f"))
        .select(col("user_id"), col("f.n_changes").as("n_changes"),
          col("f.last_event_id").as("last_event_id"),
          col("f.last_event_type").as("last_event_type"),
          col("f.last_value_cents").as("last_value_cents"),
          col("f.last_ts_us").as("last_ts_us")),
      "user_id")
  }

  /** op108's twin on Spark 4's transformWithState (op122): the same
    * change stream compacted by [[graft.streaming.Changelog
    * .latestStateTws]] — typed ValueState, fold shared with the fMGWS
    * spelling — under the RocksDB provider the API requires (also the
    * 100 TB state recommendation). Same oracle as op106/op108: the
    * compacted stream IS the batch aggregate, so the successor API's
    * state machinery sits under the hash gate, not just a spec. */
  val op122StreamChangelogTws: Q = (s, d) => {
    import s.implicits._
    import graft.streaming.{Changelog, StateStores}
    val updates = StateStores.withRocksDb(s) {
      drainStream(s, d, "op122", "events", "update", "8") { st =>
        Changelog.latestStateTws(
          st.select(col("user_id"), col("event_id"),
            Tables.tsUsExpr(st).as("ts_us"), col("event_type"),
            round(col("value") * 100, 0).cast("bigint").as("value_cents"))
            .as[Changelog.Change]).toDF()
      }
    }
    ordered(
      updates.groupBy(col("user_id"))
        .agg(max_by(
          struct(col("n_changes"), col("last_event_id"),
            col("last_event_type"), col("last_value_cents"),
            col("last_ts_us")),
          col("n_changes")).as("f"))
        .select(col("user_id"), col("f.n_changes").as("n_changes"),
          col("f.last_event_id").as("last_event_id"),
          col("f.last_event_type").as("last_event_type"),
          col("f.last_value_cents").as("last_value_cents"),
          col("f.last_ts_us").as("last_ts_us")),
      "user_id")
  }

  /** op131: streaming SCD2 — op128's history semantics as a real
    * Append-mode transformWithState execution (RocksDB): the event
    * stream's closed validity intervals, each emitted the moment its
    * version is superseded. Oracle: the batch SCD2 replay restricted to
    * closed intervals (is_current = 0), since open versions are operator
    * STATE, not output. */
  val op131StreamScd2: Q = (s, d) => {
    import s.implicits._
    import graft.streaming.{ScdStream, StateStores}
    val closed = StateStores.withRocksDb(s) {
      drainStream(s, d, "op131", "events", "append", "8") { st =>
        ScdStream.closedIntervals(
          st.select(col("user_id"), col("event_type"),
            Tables.tsUsExpr(st).as("t_us"), col("event_id"),
            Det.bp4(col("value")).as("val_bp"))
            .as[ScdStream.Ev]).toDF()
      }
    }
    ordered(closed, "user_id", "event_type", "ver")
  }

  /** op239: DSIR-style importance scoring — every document scored by
    * the log-likelihood ratio of a TARGET unigram model (the src0
    * slice) against the SOURCE model (the rest), add-one smoothed:
    * the data-selection primitive behind importance resampling
    * (select web documents that look like the curated target). Per
    * the house ln contract, the ratio is ONE double division of
    * exact integers and ln is quantized to floor(·×10⁶) micro-units
    * per DISTINCT TOKEN — per-document scores are then pure integer
    * sums of those micro-weights, so the whole score replays
    * bit-for-bit. `sel` flags the above-target-likelihood half.
    *
    * 100 TB shape: the float work lives on the VOCAB grid (one ln per
    * distinct token), never per token occurrence; the document score
    * is one token-keyed join against the broadcast-sized weight table
    * + a map-combinable sum. Corpus-sized passes: exactly two
    * (count, score). */
  val op239DsirImportance: Q = (s, d) => {
    val tok = Tables.documents(s, d).select(col("doc_id"), col("source"),
      explode(split(col("text"), " ")).as("token"))
    val cnt = tok.groupBy("token").agg(
      sum(when(col("source") === "src0", 1L).otherwise(0L)).as("ct"),
      sum(when(col("source") =!= "src0", 1L).otherwise(0L)).as("cs"))
    val tot = cnt.agg(sum("ct").as("nt"), sum("cs").as("ns"),
      big(count(lit(1))).as("v"))
    val w = cnt.crossJoin(broadcast(tot))
      .withColumn("w_micro", expr(
        "CAST(floor(ln(CAST((ct + 1) * (ns + v) AS DOUBLE) / " +
          "CAST((cs + 1) * (nt + v) AS DOUBLE)) * 1000000) AS BIGINT)"))
      .select("token", "w_micro")
    ordered(
      tok.join(w, "token")
        .groupBy("doc_id")
        .agg(big(count(lit(1))).as("n_tokens"),
          sum("w_micro").as("dsir_micro"))
        .withColumn("sel", expr(
          "CAST(CASE WHEN dsir_micro >= 0 THEN 1 ELSE 0 END AS BIGINT)")),
      "doc_id")
  }

  /** Deterministic stratified sampling: keep a document iff the salted
    * md5 hash of its CONTENT falls under its stratum's rate — the
    * reproducible sampling method for production pipelines (no RNG
    * state: stable under re-partitioning, re-sharding, and re-runs, and
    * identical copies sample identically). Per-source rates 25/50/75/100%
    * derived from the stratum id. Pure per-row filter — narrow,
    * shuffle-free, pushes to the scan at any scale. */
  val op79SampleStratified: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val ratePct = ((expr("CAST(substring(source, 4) AS INT)") % 4 + 1) * 25)
      .cast("bigint")
    ordered(
      doc.select(col("doc_id"), col("source"),
          (TextOps.md5Hash60(concat(lit("sample:"), col("text"))) % 100)
            .cast("bigint").as("h_bucket"),
          ratePct.as("rate_pct"))
        .filter(col("h_bucket") < col("rate_pct")),
      "doc_id")
  }

  /** Deterministic sequence packing — concatenate-and-cut context-window
    * packing, the standard LLM training-batch prep: per source,
    * documents concatenate in doc_id order and the token stream is cut
    * every 64 tokens; a document spans packs
    * (tok_off div 64)..((tok_off+n_tok−1) div 64) and contributes the
    * token range [start_in_doc, end_in_doc) to each. Entirely integer
    * arithmetic (cumulative sums + div), so DuckDB replays it exactly.
    *
    * Scale: one shuffle keyed by the pack partition (source here; at
    * 100 TB a (source, shard) key sized so each shard's token stream
    * fits a task) + an in-partition sort — the cumsum never needs a
    * global order. Packs are balanced by construction: every pack except
    * each stream's last holds exactly 64 tokens (spec'd). */
  val op87PackSequences: Q = (s, d) =>
    ordered(
      TextOps.packSequences(Tables.documents(s, d), "doc_id", "source",
        "text", 64L),
      "doc_id", "pack_id")

  /** Dataset mixture construction — resample a multi-source corpus to
    * TARGET mixture weights (the "data mixing" step of training-set
    * assembly): per-source weight w = stratum%4+1; the largest feasible
    * no-upsampling scale is K = min over sources of (n div w), giving
    * each source an exact quota of w·K docs; the quota is filled by the
    * docs with the smallest content hash (rank by (h, doc_id) — a
    * deterministic reservoir, stable under resharding/reruns). Output
    * proportions match the weights exactly regardless of input skew
    * (spec'd).
    *
    * Scale: one bounded counts aggregate (map-side partials), a 1-row K
    * broadcast, and a per-source window. The exact-rank window is the
    * oracle-checkable spelling; at 100 TB replace it with a per-source
    * hash CUTOFF from approx quantiles of h — the filter becomes
    * scan-pushable and the quota approximate, the standard trade. */
  val op88Mixture: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val w = (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("bigint")
    val t = doc.select(col("doc_id"), col("source"),
      TextOps.md5Hash60(concat(lit("mix:"), col("text"))).as("h"), w.as("w"))
    // counts feeds BOTH the shared scale K and the per-source quotas —
    // materialize the (sources)-row frame so the corpus is counted once,
    // not once per consumer subtree
    val counts = t.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), first(col("w")).as("w"))
      .localCheckpoint()
    val k = broadcast(counts.agg(min(expr("n div w")).as("__k")))
    val quota = counts.crossJoin(k)
      .select(col("source"), (col("w") * col("__k")).as("quota"))
    val wnd = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    ordered(
      t.withColumn("mix_rank", row_number().over(wnd).cast("bigint"))
        .join(broadcast(quota), "source")
        .filter(col("mix_rank") <= col("quota"))
        .select(col("doc_id"), col("source"), col("h").as("mix_hash"),
          col("mix_rank"), col("quota").cast("bigint").as("quota")),
      "doc_id")
  }

  /** Dataset mixture via HASH CUTOFF — the scan-pushable scale spelling
    * [[op88Mixture]]'s doc promises: instead of ranking each source with
    * a window, each source keeps documents whose content hash lands
    * under a per-source cutoff `rate_ppm = quota·10⁶ div n`. Selection
    * is then a pure per-row predicate (`h mod 10⁶ < rate_ppm`) after a
    * broadcast join of the tiny per-source rate table — no window, no
    * per-source sort, and the surviving work is one bounded counts
    * aggregate plus a narrow filter that evaluates in the scan stage at
    * any corpus size. The quota becomes binomial-approximate (the
    * standard trade vs op88's exact reservoir; the spec bounds the
    * deviation), while determinism is untouched: the cutoff is integer
    * arithmetic over exact counts, so reruns, resharding and the DuckDB
    * twin agree bit-for-bit. */
  val op89MixtureCutoff: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val w = (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("bigint")
    val t = doc.select(col("doc_id"), col("source"),
      TextOps.md5Hash60(concat(lit("mix:"), col("text"))).as("h"), w.as("w"))
    // materialized once — feeds both K and the rate table (one corpus
    // count instead of one per consumer subtree)
    val counts = t.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), first(col("w")).as("w"))
      .localCheckpoint()
    val k = broadcast(counts.agg(min(expr("n div w")).as("__k")))
    // ppm resolution: quota·10⁶ stays far inside BIGINT for any per-source
    // count a single engine would ever hold (overflow at n ~ 9·10¹²)
    val rates = counts.crossJoin(k)
      .select(col("source"),
        expr("w * __k * 1000000 div n").cast("bigint").as("rate_ppm"))
    ordered(
      t.join(broadcast(rates), "source")
        // h is a non-negative 60-bit hash, so % matches DuckDB's %
        .filter(col("h") % 1000000L < col("rate_ppm"))
        .select(col("doc_id"), col("source"),
          (col("h") % 1000000L).cast("bigint").as("h_ppm"),
          col("rate_ppm")),
      "doc_id")
  }

  /** Temperature-scaled mixture (α-sampling at τ = 0.5) — the
    * multilingual/multi-source BALANCING recipe (mT5/XLM-R style):
    * sampling mass ∝ n^τ flattens source skew without forcing equal
    * quotas; low-resource sources keep proportionally more of their
    * docs. Deterministic cross-engine arithmetic: s = floor(10⁶·√n)
    * (sqrt is IEEE correctly-rounded — bit-identical on both engines),
    * the target total is half the corpus, per-source
    * quota = floor(double(T)·double(s)/double(Σs)) capped at n (no
    * upsampling) — ONE double multiply+divide of identical integers,
    * deterministic on both engines even past 2⁵³ (same IEEE ops, same
    * rounding) — and selection is op89's scan-pushable hash cutoff
    * (rate_ppm = quota·10⁶ div n; per-row predicate after a broadcast
    * rate join).
    *
    * Scale: identical to op89 — one bounded counts aggregate, a 1-row
    * totals broadcast, a sources-row rate table, a narrow scan-stage
    * filter. Quotas are binomial-approximate like op89's; determinism
    * is exact. */
  val op111MixtureTemperature: Q = (s, d) =>
    ordered(temperatureMixture(Tables.documents(s, d)), "doc_id")

  /** op111's core, reusable over any (doc_id, source, text) frame (the
    * spec feeds a skew-planted synthetic corpus to see the flattening
    * the uniform fixtures can't show). */
  private[graft] def temperatureMixture(doc: DataFrame): DataFrame = {
    val t = doc.select(col("doc_id"), col("source"),
      TextOps.md5Hash60(concat(lit("mix:"), col("text"))).as("h"))
    val counts = t.groupBy(col("source")).agg(count(lit(1)).as("n"))
      .withColumn("s",
        expr("CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1000000) AS BIGINT)"))
      .localCheckpoint()
    val tot = broadcast(
      counts.agg(sum(col("n")).as("__tot"), sum(col("s")).as("__ssum")))
    val rates = counts.crossJoin(tot)
      .select(col("source"), col("n"),
        least(
          expr("CAST(floor(CAST(__tot div 2 AS DOUBLE) * CAST(s AS DOUBLE)" +
            " / CAST(__ssum AS DOUBLE)) AS BIGINT)"),
          col("n")).as("quota"))
      .select(col("source"),
        expr("quota * 1000000 div n").cast("bigint").as("rate_ppm"))
    t.join(broadcast(rates), "source")
      .filter(col("h") % 1000000L < col("rate_ppm"))
      .select(col("doc_id"), col("source"),
        (col("h") % 1000000L).cast("bigint").as("h_ppm"),
        col("rate_ppm"))
  }

  /** Token-BUDGET data selection — the budget-driven cousin of the
    * mixture ops (op88/89 fill per-source DOC quotas; real training-set
    * assembly is usually specified in TOKENS): per source, documents are
    * taken in deterministic content-hash order until the source's token
    * budget fills — a document is kept iff the tokens BEFORE it sit
    * strictly under budget (greedy fill: the last document may overflow
    * the budget by a fraction, the standard convention). Budget =
    * (stratum weight) × 500 tokens — sized so selection bites at every
    * fixture scale. Entirely integer (window cumsum),
    * rerun/reshard-stable, DuckDB-replayed exactly.
    *
    * Scale: one shuffle keyed by source + in-partition sort — op87's
    * pack-stream shape; at 100 TB the same cutoff trade as op89 applies
    * (estimate tokens/doc from the counts aggregate → hash-rate filter,
    * scan-pushable, budget approximate). */
  val op99TokenBudget: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val w = (expr("CAST(substring(source, 4) AS INT)") % 4 + 1).cast("bigint")
    val t = doc.select(col("doc_id"), col("source"),
      TextOps.tokenCountWs(col("text")).as("n_tok"),
      TextOps.md5Hash60(concat(lit("budget:"), col("text"))).as("h"),
      (w * 500L).as("budget"))
    val wnd = Window.partitionBy(col("source")).orderBy(col("h"), col("doc_id"))
    ordered(
      t.withColumn("tok_before",
          coalesce(sum(col("n_tok")).over(
            wnd.rowsBetween(Window.unboundedPreceding, -1)), lit(0L))
            .cast("bigint"))
        .filter(col("tok_before") < col("budget"))
        .select(col("doc_id"), col("source"), col("n_tok"),
          col("tok_before"), col("budget")),
      "doc_id")
  }

  /** Shared per-row rule-flag frame feeding op90 (the gate) and op91
    * (per-source attribution): (doc_id, source, signals, f_* flags). */
  private def qualityFlagsFrame(s: SparkSession, d: String): DataFrame = {
    val doc = Tables.documents(s, d)
    val t = doc.select(col("doc_id"), col("source"),
      TextOps.tokens(col("text")).as("toks"),
      TextOps.tokenCountWs(col("text")).as("n_words"),
      TextOps.meanTokenLenBp(col("text")).as("mean_len_bp"),
      TextOps.markerCount(col("text"), TextQueries.enStop).as("stop_hits"))
    t.withColumn("distinct_bp",
        expr("size(array_distinct(toks)) * 10000 div n_words").cast("bigint"))
      .select(col("doc_id"), col("source"), col("n_words"),
        col("mean_len_bp"), col("distinct_bp"), col("stop_hits"),
        (col("n_words") >= 20L).cast("bigint").as("f_words"),
        (col("mean_len_bp").between(40000L, 47000L)).cast("bigint").as("f_len"),
        (col("distinct_bp") >= 5000L).cast("bigint").as("f_distinct"),
        (col("stop_hits") >= 2L).cast("bigint").as("f_stop"))
  }

  /** Gopher-style heuristic quality GATE (the MassiveText filter-rule
    * family, re-expressed as exact integer signals): word-count floor,
    * mean-word-length band, distinct-token-ratio floor (repetition
    * proxy) and a stopword minimum, each emitted as its own 0/1 flag
    * plus the conjunction `keep`. Unlike op71 (a monotone score) this is
    * the boolean gate a curation pipeline actually FILTERS on, with
    * per-rule attribution for drop-reason stats; unlike op76 every
    * signal is per-row — split / array_distinct / filter over the token
    * array, zero shuffles (spec'd: the unordered plan has no Exchange),
    * so the gate runs inside the scan stage at any corpus size. */
  val op90QualityGate: Q = (s, d) =>
    ordered(
      qualityFlagsFrame(s, d).drop("source").withColumn("keep",
        (col("f_words") * col("f_len") * col("f_distinct") * col("f_stop"))
          .cast("bigint")),
      "doc_id")

  /** Per-source gate attribution — the drop-reason report a curation run
    * publishes alongside its output (and the aggregation SCALE.md's op90
    * note promises): per source, document count, kept count, independent
    * per-rule failure counts, and the keep rate in bp. One bounded
    * groupBy over the per-row flags (map-side partials; state = one row
    * per source), so the report costs a scan regardless of corpus
    * size. */
  val op91GateStats: Q = (s, d) => {
    val f = qualityFlagsFrame(s, d)
    ordered(
      f.groupBy(col("source")).agg(
          count(lit(1)).as("n_docs"),
          sum(col("f_words") * col("f_len") * col("f_distinct") *
            col("f_stop")).as("n_keep"),
          sum(lit(1L) - col("f_words")).as("drop_words"),
          sum(lit(1L) - col("f_len")).as("drop_len"),
          sum(lit(1L) - col("f_distinct")).as("drop_distinct"),
          sum(lit(1L) - col("f_stop")).as("drop_stop"))
        .select(col("source"), col("n_docs").cast("bigint").as("n_docs"),
          col("n_keep").cast("bigint").as("n_keep"),
          col("drop_words").cast("bigint").as("drop_words"),
          col("drop_len").cast("bigint").as("drop_len"),
          col("drop_distinct").cast("bigint").as("drop_distinct"),
          col("drop_stop").cast("bigint").as("drop_stop"))
        .withColumn("keep_rate_bp",
          expr("n_keep * 10000 div n_docs").cast("bigint")),
      "source")
  }

  /** Leakage-safe train/val/test split: assignment by DEDUP CLUSTER, not
    * by document — near-duplicates (op77's connected components over the
    * ≥70% Jaccard graph) land in the SAME split, so train/test leakage
    * through paraphrase-level duplication is structurally impossible
    * (the failure mode a naive per-doc hash split has on any corpus with
    * near-dups). Split = content-independent hash of the cluster
    * representative: 80/10/10 by h(cluster) mod 100 — deterministic,
    * rerun- and reshard-stable, and adding documents never moves an
    * existing cluster between splits. Cost on top of op77: one per-row
    * hash + CASE. */
  val op92SplitLeakSafe: Q = (s, d) => {
    // the cluster table is a PREBUILT artifact, exactly like the op84-86
    // ANN indexes: op77's connected components persist once per dataset
    // (content-keyed, atomic publication) and the split operator itself
    // — the thing this query measures — is a per-row hash over that
    // table. Deterministic clustering + all-bigint storage ⇒ the cached
    // path is bit-identical to recomputing (same oracle as always).
    val dir = IndexStore.indexRoot(d, "clusters_j7000_cap100", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "clusters") { tmp =>
      Dedup.dedupClusters(Tables.documents(s, d), "doc_id", "text",
          7000L, Some(DedupQueries.shingleDocFreqCap))
        .write.mode("overwrite").parquet(s"$tmp/clusters")
    }
    ordered(Dedup.splitByCluster(s.read.parquet(s"$dir/clusters")), "doc_id")
  }

  /** Corpus data card — the per-(source, language) statistics block a
    * released dataset ships (and the mixture/gate ops consume): doc,
    * token and char counts, length extremes, vocabulary size, exact
    * integer mean tokens/doc. Two bounded aggregates (stats roll up
    * map-side; vocabulary is a (source, lang, token)-keyed count whose
    * state is vocab-bounded, not corpus-bounded) joined on the tiny
    * group key — at any corpus size this is two scans and a
    * groups-sized result. */
  val op94CorpusStats: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val base = doc.select(col("source"), col("lang"),
        TextOps.tokenCountWs(col("text")).as("n_tok"),
        length(col("text")).cast("bigint").as("len"))
      .groupBy(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
        sum(col("len")).as("n_chars"), min(col("len")).as("min_chars"),
        max(col("len")).as("max_chars"))
    val vocab = doc.select(col("source"), col("lang"),
        explode(TextOps.tokens(col("text"))).as("token"))
      .groupBy(col("source"), col("lang"))
      .agg(countDistinct(col("token")).as("vocab"))
    ordered(
      base.join(vocab, Seq("source", "lang"))
        .select(col("source"), col("lang"),
          col("n_docs").cast("bigint").as("n_docs"),
          col("n_tokens").cast("bigint").as("n_tokens"),
          col("n_chars").cast("bigint").as("n_chars"),
          col("min_chars"), col("max_chars"),
          col("vocab").cast("bigint").as("vocab"))
        .withColumn("mean_tok_bp",
          expr("n_tokens * 10000 div n_docs").cast("bigint")),
      "source", "lang")
  }

  /** Cross-source overlap matrix — which SOURCES duplicate each other:
    * the ≥70% near-dup pairs (op61's capped inverted-index join) rolled
    * up to unordered source pairs, with pair counts, mean similarity
    * (exact integer bp) and the count of distinct duplicated docs per
    * side. The dedup-PLANNING report: it tells a pipeline which source
    * pairs are worth a targeted dedup pass and which crawls are
    * mirrors. Cost on top of op61: two doc_id joins against the
    * (doc_id, source) projection and a sources²-bounded aggregate. */
  val op95SourceOverlap: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    // the overlap matrix is a downstream REPORT over the ≥70% pair set
    // — it reads a persisted pairs artifact (op77's clusters pattern:
    // content-keyed, built once per dataset, bit-exact) rather than
    // re-running the pair join per invocation; the end-to-end pair
    // computations stay measured by the op61/op63/op64/op98 family
    val dir = IndexStore.indexRoot(d, "pairs_j7000_cap100", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "pairs") { tmp =>
      Dedup.jaccardPairs(doc, "doc_id", "text", 7000L,
          Some(DedupQueries.shingleDocFreqCap))
        .write.mode("overwrite").parquet(s"$tmp/pairs")
    }
    val pairs = s.read.parquet(s"$dir/pairs")
    val src = doc.select(col("doc_id"), col("source"))
    val tagged = pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")),
        "doc_b")
      // fold the symmetric pair: matrix keys are unordered source pairs,
      // and the per-side docs swap WITH the sources — doc_lo must be the
      // pair's member from source_lo, not the lower doc_id (ids and
      // source order disagree on cross-source pairs)
      .select(least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"),
        when(col("src_a") <= col("src_b"), col("doc_a")).otherwise(col("doc_b"))
          .as("doc_lo"),
        when(col("src_a") <= col("src_b"), col("doc_b")).otherwise(col("doc_a"))
          .as("doc_hi"),
        col("jaccard_bp"))
    ordered(
      tagged.groupBy(col("source_lo"), col("source_hi"))
        .agg(count(lit(1)).as("n_pairs"),
          countDistinct(col("doc_lo")).as("n_docs_lo"),
          countDistinct(col("doc_hi")).as("n_docs_hi"),
          sum(col("jaccard_bp")).as("sum_bp"))
        .select(col("source_lo"), col("source_hi"),
          col("n_pairs").cast("bigint").as("n_pairs"),
          col("n_docs_lo").cast("bigint").as("n_docs_lo"),
          col("n_docs_hi").cast("bigint").as("n_docs_hi"),
          // integer mean of already-integer bp similarities: floor
          // division of exact sums, associative on both engines
          expr("sum_bp div n_pairs").cast("bigint").as("mean_jaccard_bp")),
      "source_lo", "source_hi")
  }

  /** op261: quality→duplication calibration — does op71's quality
    * score PREDICT near-duplication? Docs bucketed by score VALUE
    * (quality_bp div 500 — a value bucket, not an ntile, so no
    * corpus-wide sort), each bucket reporting its population, how
    * many of its docs appear in op61's near-dup pair set, and the
    * dup rate in bp. The cross-operator eval a curation pipeline
    * reads before using one signal to gate another: if low-quality
    * buckets aren't dup-enriched, "filter by quality first, dedup
    * the survivors" reorders safely; if they are, order matters.
    *
    * 100 TB shape: rides two passes that already run (op71's scoring
    * — pure map — and op61's banded dedup); the calibration itself is
    * a doc-keyed flag join + a bucket-grid aggregate. */
  val op261QualityDupCal: Q = (s, d) => {
    val docs = Tables.documents(s, d)
    val buckets = docs.select(col("doc_id"),
      (TextOps.qualityScoreBp(col("text"), TextQueries.enStop) / 500)
        .cast("bigint").as("bucket"))
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", 7000L,
      Some(DedupQueries.shingleDocFreqCap))
    val dupDocs = pairs.select(col("doc_a").as("doc_id"))
      .unionByName(pairs.select(col("doc_b").as("doc_id")))
      .distinct().withColumn("is_dup", lit(1L))
    ordered(
      buckets.join(dupDocs, Seq("doc_id"), "left")
        .groupBy("bucket")
        .agg(big(count(lit(1))).as("n_docs"),
          sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_docs"))
        .withColumn("dup_rate_bp",
          expr("(n_dup_docs * 10000) div n_docs")),
      "bucket")
  }

  /** op129: deterministic weighted sampling without replacement — the
    * integer-arithmetic priority variant of Efraimidis–Spirakis: each doc
    * draws a deterministic pseudo-random u (LCG of doc_id, exact in
    * BIGINT on both engines) and competes on priority = u div weight
    * (weight = n_chars), so heavier docs stochastically win. Top-k by
    * (priority, doc_id) through TakeOrdered — map-side k-trim, no global
    * sort, no shuffle beyond the k winners; rerunnable bit-identically
    * at any parallelism. */
  val op129WeightedSample: Q = (s, d) => {
    val k = 100
    val pr = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"),
        ((col("doc_id") * lit(1103515245L) + lit(12345L)) % lit(2147483647L))
          .as("u"))
      .withColumn("priority", expr("u div n_chars"))
    val top = pr.orderBy(col("priority"), col("doc_id")).limit(k)
    ordered(
      top.withColumn("rank",
          row_number().over(Window.orderBy(col("priority"), col("doc_id")))
            .cast("bigint"))
        .select(col("rank"), col("doc_id"),
          col("priority").cast("bigint").as("priority"), col("n_chars")),
      "rank")
  }

  /** op136: Z-order cluster key — dense lang ids (distinct-ranked +
    * broadcast back, never a corpus-wide window) and a capped length
    * band, bit-interleaved into one Morton key by pure codegen'd
    * Column arithmetic ([[graft.functions.Layout.mortonKey]]). The key
    * is what [[op137ClusteredScan]] range-partitions the clustered
    * write on; the oracle replays the identical 5-step mask-spread in
    * SQL. */
  val op136ZorderKey: Q = (s, d) => {
    val docs = graft.functions.Layout.denseDimIds(
      Tables.documents(s, d), "lang", "lang_id")
      .withColumn("len_bucket",
        least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
    ordered(
      docs.select(col("doc_id"), col("lang_id"), col("len_bucket"),
        graft.functions.Layout.mortonKey(col("lang_id"), col("len_bucket"))
          .as("zkey")),
      "doc_id")
  }

  /** op137: scan of the PREBUILT Z-order-clustered document store — the
    * lakehouse `OPTIMIZE ZORDER BY` shape. First call per dataset
    * clusters the corpus (one range shuffle on the Morton key,
    * key-sorted files) under the content-keyed cache; every later call
    * is scan-only, with the rectangle predicate (one language, one
    * length band) pushed to the parquet footers — which, thanks to the
    * clustering, exclude all but the files whose key range intersects
    * the rectangle (concentration asserted in ScaleSpec). The oracle
    * computes the same aggregate from the unclustered table, proving
    * the clustered store lossless. */
  private def zorderStoreDir(s: SparkSession, d: String): String = {
    // v3: manifest carries the per-file doc_id Bloom (point index) AND
    // per-dimension column bounds + n_rows (metadata-only aggregation)
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_v3", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = graft.functions.Layout.denseDimIds(
        Tables.documents(s, d), "lang", "lang_id")
        .withColumn("len_bucket",
          least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
      graft.functions.Layout.writeClustered(
        keyed.select(col("doc_id"), col("lang_id"), col("len_bucket"),
          col("n_chars")),
        graft.functions.Layout.mortonKey(col("lang_id"), col("len_bucket")),
        numFiles = 8, path = s"$tmp/docs",
        bloomKey = Some("doc_id"), bloomExpectedPerFile = 1L << 16,
        statsCols = Seq("lang_id", "len_bucket"))
    }
    dir
  }

  private def rectAgg(df: DataFrame): DataFrame =
    ordered(
      df.filter(col("lang_id") === 1L && col("len_bucket").between(4L, 20L))
        .groupBy(col("len_bucket"))
        .agg(big(count(lit(1))).as("n_docs"),
          big(sum(col("n_chars"))).as("sum_chars")),
      "len_bucket")

  val op137ClusteredScan: Q = (s, d) =>
    rectAgg(graft.functions.Layout.readClustered(s, s"${zorderStoreDir(s, d)}/docs"))

  /** op138: the SAME rectangle aggregate through the MANIFEST-pruned
    * access path — the store's `_manifest` (file → min/max zkey, the
    * explicit lakehouse file index) selects only the files whose key
    * range intersects the rectangle's Z interval (conservative by the
    * Morton monotonicity argument, see `Layout.readPruned`), and the
    * exact predicate runs over that subset. Identical result to op137
    * — same oracle — with the scan planned from one-row-per-file
    * metadata instead of listing every data file. */
  val op138PrunedScan: Q = (s, d) =>
    rectAgg(graft.functions.Layout.readPruned(
      s, s"${zorderStoreDir(s, d)}/docs", aLo = 1L, aHi = 1L, bLo = 4L, bHi = 20L))

  /** op139: pruned rectangle scan over a store built INCREMENTALLY —
    * 80% of the corpus clustered up front, the rest appended as new
    * key-sorted files with manifest rows appended beside them
    * (`Layout.appendClustered`: no rewrite of existing data or
    * metadata — the affordable continuous-ingest shape for a Z-ordered
    * table). The oracle is the full-corpus rectangle aggregate, so a
    * hash match proves the append lost nothing and the manifest prune
    * still finds every matching row across old AND new files. */
  /** op140: point lookup on a column the Z-key does NOT cluster —
    * doc_id is smeared across every file by the (lang, length) layout,
    * so zkey ranges cannot prune it; the manifest's per-file Bloom
    * filter (built as one grouped aggregate beside min/max) can. The
    * lookup plans driver-side from one-row-per-file metadata — no
    * false negatives, false positives only cost an extra file scan —
    * then applies the exact predicate. The lakehouse bloom-index
    * feature (Delta bloom filters / Iceberg puffin), made explicit. */
  val op140PointLookup: Q = (s, d) =>
    ordered(
      graft.functions.Layout.readPointCandidates(
          s, s"${zorderStoreDir(s, d)}/docs", key = 42L)
        .filter(col("doc_id") === 42L)
        .select(col("doc_id"), col("lang_id"), col("len_bucket"),
          col("n_chars")),
      "doc_id")

  /** The keyed corpus every layout store clusters: dense lang ids +
    * capped length band (see op136). */
  private def layoutKeyed(s: SparkSession, d: String): DataFrame =
    graft.functions.Layout.denseDimIds(
      Tables.documents(s, d), "lang", "lang_id")
      .withColumn("len_bucket",
        least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
      .select(col("doc_id"), col("lang_id"), col("len_bucket"),
        col("n_chars"))

  private def layoutZk: org.apache.spark.sql.Column =
    graft.functions.Layout.mortonKey(col("lang_id"), col("len_bucket"))

  val op139AppendScan: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_appended", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = layoutKeyed(s, d)
      graft.functions.Layout.writeClustered(
        keyed.filter(col("doc_id") % 5 =!= 0L), layoutZk, numFiles = 8,
        path = s"$tmp/docs")
      graft.functions.Layout.appendClustered(
        keyed.filter(col("doc_id") % 5 === 0L), layoutZk, numFiles = 4,
        path = s"$tmp/docs")
    }
    rectAgg(graft.functions.Layout.readPruned(
      s, s"$dir/docs", aLo = 1L, aHi = 1L, bLo = 4L, bHi = 20L))
  }

  /** op141: pruned rectangle scan AFTER COMPACTION — three append
    * rounds fragment the store (base + 3×4 small files), then
    * `Layout.compactClustered` rewrites it into 4 freshly
    * range-partitioned key-sorted files with a rebuilt manifest (one
    * range shuffle of the CURRENT store, dimensions never recomputed —
    * the stored zkey is the cluster key). The oracle is unchanged:
    * compaction must move bytes, not answers. Completes the layout
    * lifecycle: build → scan → prune → append → compact. */
  val op141CompactedScan: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_compacted", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = layoutKeyed(s, d)
      graft.functions.Layout.writeClustered(
        keyed.filter(col("doc_id") % 4 === 0L), layoutZk, numFiles = 4,
        path = s"$tmp/docs")
      (1L to 3L).foreach { r =>
        graft.functions.Layout.appendClustered(
          keyed.filter(col("doc_id") % 4 === r), layoutZk, numFiles = 4,
          path = s"$tmp/docs")
      }
      graft.functions.Layout.compactClustered(s, s"$tmp/docs", numFiles = 4)
    }
    rectAgg(graft.functions.Layout.readPruned(
      s, s"$dir/docs", aLo = 1L, aHi = 1L, bLo = 4L, bHi = 20L))
  }

  /** op145: TIME TRAVEL — the store commits a metadata snapshot after
    * each mutation (build → append → delete), and the query reads
    * AS OF the pre-delete snapshot: the full corpus, while HEAD has a
    * 10% slice tombstoned away. Snapshots are one manifest copy each
    * (data files shared across versions — the Delta-log/Iceberg
    * trade); this is the reproducible-pipeline contract, a training
    * run pinned to snapshot N reads the same corpus forever. The
    * oracle is the FULL-corpus rectangle aggregate — hash-matching it
    * through a store whose current view is smaller proves the
    * snapshot isolation real. */
  /** The op145/op154 shared versioned store: c=1 base (doc_id%5≠0),
    * c=2 full corpus (append), c=3 with doc_id%10==3 tombstoned. */
  private def versionedStoreDir(s: SparkSession, d: String): String = {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_versioned", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = layoutKeyed(s, d)
      graft.functions.Layout.writeClustered(
        keyed.filter(col("doc_id") % 5 =!= 0L), layoutZk, numFiles = 8,
        path = s"$tmp/docs")
      graft.functions.Layout.commitSnapshot(s, s"$tmp/docs") // c=1: base
      graft.functions.Layout.appendClustered(
        keyed.filter(col("doc_id") % 5 === 0L), layoutZk, numFiles = 4,
        path = s"$tmp/docs")
      graft.functions.Layout.commitSnapshot(s, s"$tmp/docs") // c=2: full
      graft.functions.Layout.deleteByKeys(
        Tables.documents(s, d).filter(col("doc_id") % 10 === 3L)
          .select(col("doc_id")),
        s"$tmp/docs")
      graft.functions.Layout.commitSnapshot(s, s"$tmp/docs") // c=3: deleted
    }
    dir
  }

  val op145TimeTravel: Q = (s, d) =>
    rectAgg(graft.functions.Layout.readAsOf(
      s, s"${versionedStoreDir(s, d)}/docs", commit = 2L))

  /** op154: snapshot CDC DIFF — what changed between commit 1 (the
    * base build) and commit 3 (after append + delete), planned from
    * METADATA: inserted rows read from exactly the files the manifest
    * set-diff says were added, deleted rows from the FROM snapshot
    * semi-joined to the broadcast tombstone delta
    * (`Layout.snapshotDiff` — data read proportional to the CHANGE,
    * never the store; a compaction between the snapshots is refused).
    * An appended-then-tombstoned key counts as neither. The oracle
    * re-derives both legs from the slice definitions. */
  val op154SnapshotDiff: Q = (s, d) => {
    val store = s"${versionedStoreDir(s, d)}/docs"
    val (ins, del) = graft.functions.Layout.snapshotDiff(s, store, 1L, 3L)
    def leg(df: DataFrame, kind: String): DataFrame =
      df.groupBy(col("lang_id"))
        .agg(big(count(lit(1))).as("n"))
        .select(lit(kind).as("change"), col("lang_id"), col("n"))
    ordered(leg(ins, "insert").unionByName(leg(del, "delete")),
      "change", "lang_id")
  }

  /** The BM25 query workload: three fixed queries over the corpus
    * vocabulary, shared verbatim by the Spark plan and the oracle. */
  private val bm25Queries: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "join", 1L -> "window",
    2L -> "customer", 2L -> "order", 2L -> "line",
    3L -> "vector", 3L -> "hash", 3L -> "scan")

  /** op148: BM25 term statistics — the inverted-index build's metadata
    * face: per-token document frequency, collection frequency, and
    * Robertson idf in integer micro-units (floor(ln(·)×10⁶) — see
    * [[graft.functions.Bm25]] for why quantized integers are the only
    * cross-engine-hashable spelling of a float score). Two
    * map-combinable shuffles ((doc,token) then token) — the postings
    * build a 100 TB full-text index would run. */
  val op148Bm25Stats: Q = (s, d) => {
    val post = graft.functions.Bm25.postings(
      Tables.documents(s, d), "doc_id", "text")
    val stats = graft.functions.Bm25.termStats(post)
      .crossJoin(broadcast(
        graft.functions.Bm25.corpusScalars(Tables.documents(s, d), "text")))
      .withColumn("idf_ubp", expr(graft.functions.Bm25.idfUbpSql))
    ordered(stats.select(col("token"), col("df"), col("cf"),
      col("idf_ubp")), "token")
  }

  /** op149: BM25 top-k retrieval — postings restricted to a BROADCAST
    * query-term list, idf/tf contributions computed from SHARED SQL
    * expression text (bit-identical IEEE arithmetic on both engines),
    * quantized to integer micro-units BEFORE the per-document sum (so
    * the sum is exact and order-independent), and trimmed by the
    * bounded [[graft.functions.TopKAgg]] — k rows per (query,
    * partition) cross the shuffle, never the candidate set. The oracle
    * replays the identical pipeline with a window rank. */
  val op149Bm25TopK: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val post = graft.functions.Bm25.postings(docs, "doc_id", "text")
    ordered(
      graft.functions.Bm25.topK(
        post,
        graft.functions.Bm25.termStats(post),
        graft.functions.Bm25.corpusScalars(docs, "text"),
        bm25Queries.toDF("q_id", "token"), k = 5),
      "q_id", "rank")
  }

  /** op210 fusion constants: the standard RRF damping (60), leg depth
    * (top-20 from each retriever), and emitted depth (top-10 fused). */
  private val rrfK0 = 60L
  private val rrfDepth = 20
  private val rrfOut = 10

  /** op210: reciprocal-rank-fusion hybrid retrieval — the RAG-serving
    * primitive: a LEXICAL leg (op149's BM25 top-[[rrfDepth]] for the
    * shared [[bm25Queries]]) and a VECTOR leg (op67's brute cosine
    * top-[[rrfDepth]], query q's vector = embedding vec_id q; doc_id ≡
    * vec_id by fixture contract) fused per (query, doc) by
    * floor(10⁶/(60+rank)) per leg summed — integer RRF, deterministic
    * on both engines; docs a leg misses contribute 0 and report rank
    * −1 (never silently NULL). Top-[[rrfOut]] fused rows emitted.
    *
    * 100 TB shape: each leg is already bounded (BM25 candidates by the
    * broadcast query-term list + TopKAgg trim; ANN by its index — in
    * production the vector leg is op119/op115's probe, same output
    * shape) so the fusion input is queries × 2k rows — broadcast-sized
    * REGARDLESS of corpus size; the full-outer merge and re-rank are
    * per-query grid algebra. Rank fusion (not score fusion) is what
    * makes the two legs' incomparable score scales composable — the
    * reason RRF is the production default. */
  val op210RrfFusion: Q = (s, d) => {
    import s.implicits._
    val docs = Tables.documents(s, d)
    val post = graft.functions.Bm25.postings(docs, "doc_id", "text")
    val lex = graft.functions.Bm25.topK(
        post,
        graft.functions.Bm25.termStats(post),
        graft.functions.Bm25.corpusScalars(docs, "text"),
        bm25Queries.toDF("q_id", "token"), k = rrfDepth)
      .select(col("q_id"), col("doc_id"), col("rank").as("r_lex"))
    val emb = Tables.embeddings(s, d)
    val qIds = bm25Queries.map(_._1).distinct
    val vec = Similarity.bruteForceTopK(
        emb.filter(col("vec_id").isin(qIds: _*)), emb, rrfDepth)
      .select(col("q_id"), col("n_id").as("doc_id"),
        col("rank").as("r_vec"))
    val fused = lex.join(vec, Seq("q_id", "doc_id"), "full_outer")
      .select(col("q_id"), col("doc_id"),
        coalesce(col("r_lex"), lit(-1L)).as("rank_lex"),
        coalesce(col("r_vec"), lit(-1L)).as("rank_vec"),
        (coalesce(expr(s"1000000 div ($rrfK0 + r_lex)"), lit(0L)) +
         coalesce(expr(s"1000000 div ($rrfK0 + r_vec)"), lit(0L)))
          .as("rrf_ppm"))
    ordered(
      fused.withColumn("rank", big(row_number().over(
          Window.partitionBy("q_id")
            .orderBy(col("rrf_ppm").desc, col("doc_id")))))
        .where(col("rank") <= rrfOut)
        .select("q_id", "rank", "doc_id", "rrf_ppm",
          "rank_lex", "rank_vec"),
      "q_id", "rank")
  }

  /** op211's fixed phrase workload (ids shared with the oracle VALUES
    * list): three bigrams + one trigram present in the fixture corpus. */
  private val phraseQueries: Seq[(Long, String)] = Seq(
    1L -> "table hash", 2L -> "customer join",
    3L -> "vector small", 4L -> "part filter scan")

  /** op211: positional phrase search — exact multi-word match over a
    * POSITIONAL inverted index: postings are (doc, position, token)
    * (posexplode — the op148 postings build plus the position column
    * Lucene keeps for exactly this query class); a phrase of n terms
    * matches at anchor a iff every (offset i, term tᵢ) posting exists
    * at position a+i, found by ONE equi-join of postings against the
    * broadcast (phrase, offset, term) list and counting per-anchor
    * hits to n — phrase length never changes the join count. Emits
    * per (phrase, doc): match count + first position.
    *
    * 100 TB shape: one (token)-keyed shuffle bounded by postings that
    * match ANY query term (the broadcast semi-join prunes the rest at
    * the scan); the anchor trick turns n-gram adjacency into a single
    * group-by — no n-way self-join, no per-document re-tokenization
    * per phrase. The production escalation is the op136 layout story:
    * postings bucketed by token make the probe a pruned scan. */
  val op211PhraseSearch: Q = (s, d) => {
    import s.implicits._
    val pos = Tables.documents(s, d)
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), (col("pos") + 1).cast("bigint").as("p"),
        col("col").as("token"))
    val terms = phraseQueries.flatMap { case (id, ph) =>
        ph.split(" ").zipWithIndex.map { case (t, i) => (id, i.toLong, t) }
      }.toDF("phrase_id", "off", "token")
    val nTerms = terms.groupBy("phrase_id")
      .agg(count(lit(1)).as("n_terms"))
    val anchors = pos.join(broadcast(terms), "token")
      .select(col("phrase_id"), col("doc_id"),
        (col("p") - col("off")).as("anchor"))
      // (doc, p) is unique per posting, so each (anchor, off) pair hits
      // at most once — count(*) counts DISTINCT satisfied offsets
      .groupBy("phrase_id", "doc_id", "anchor")
      .agg(count(lit(1)).as("n_hit"))
    val matches = anchors.join(broadcast(nTerms), "phrase_id")
      .where(col("n_hit") === col("n_terms"))
    ordered(
      matches.groupBy("phrase_id", "doc_id")
        .agg(big(count(lit(1))).as("n_matches"),
          min("anchor").as("first_pos")),
      "phrase_id", "doc_id")
  }

  /** op153: STREAMING CDC upsert — the changelog family's online leg
    * (the op142 symmetry for row-level mutation): arrivals stream in
    * via AvailableNow and every micro-batch lands through
    * `Layout.applyChanges` in `foreachBatch` — one O(batch) appended
    * change file per micro-batch, nothing rewritten; `readMerged`
    * resolves latest-wins afterwards. The arrival stream carries
    * INSERTs (the doc_id%5==0 slice the base build withheld) and
    * UPDATEs (+100000 chars on doc_id%7==3 of the base slice) as
    * disjoint key sets, so within-batch key uniqueness holds under ANY
    * micro-batch partitioning the engine picks — the property a real
    * CDC feed gets from its per-key log ordering. */
  val op153StreamUpsert: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_stream_upserted",
      table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      graft.functions.Layout.writeClustered(
        layoutKeyed(s, d).filter(col("doc_id") % 5 =!= 0L), layoutZk,
        numFiles = 8, path = s"$tmp/docs")
      val langIds = graft.functions.Layout.denseDimIds(
        Tables.documents(s, d), "lang", "lang_id")
        .select(col("lang"), col("lang_id")).distinct()
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val streamDir =
        java.nio.file.Files.createTempDirectory("graft_zupsert_")
      val link = streamDir.resolve("documents.parquet")
      try {
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$d/documents.parquet"))
        val isUpdate =
          col("doc_id") % 7 === 3L && col("doc_id") % 5 =!= 0L
        val q = s.readStream.schema(schema).parquet(streamDir.toString)
          .filter(col("doc_id") % 5 === 0L || isUpdate)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val keyed = batch.join(broadcast(langIds), "lang")
              .withColumn("len_bucket",
                least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
              .select(col("doc_id"), col("lang_id"), col("len_bucket"),
                col("n_chars"))
            graft.functions.Layout.applyChanges(
              keyed.withColumn("n_chars", col("n_chars") +
                  when(isUpdate, 100000L).otherwise(0L))
                .withColumn("zkey", layoutZk)
                .withColumn("_op", lit("U")),
              "doc_id", s"$tmp/docs"): Unit
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally {
        java.nio.file.Files.deleteIfExists(link)
        java.nio.file.Files.deleteIfExists(streamDir): Unit
      }
    }
    rectAgg(graft.functions.Layout.readMerged(s, s"$dir/docs", "doc_id"))
  }

  /** op152: incremental aggregate maintenance — the materialized-view
    * delta-refresh shape: each ingest batch (three deterministic
    * l_orderkey slices standing in for daily drops) reduces to its
    * PARTIAL aggregates (sum/count per group — the algebraic form every
    * re-aggregatable metric decomposes into) and appends them to a
    * persisted state table; the refresh merges partials only (sum of
    * sums / sum of counts) and NEVER rescans prior batches. At 100 TB
    * the state table is O(groups × batches) — compacted by re-merging,
    * never by re-reading the corpus — vs. a full-table group-by per
    * refresh. Quantities are integral-valued doubles cast to bigint
    * before summing, so partial merges are exact in any order. The
    * oracle is the full-table aggregate: delta-maintained and
    * recomputed answers must agree exactly. */
  val op152IncrAgg: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "incr_agg_flag_status", table = "lineitem")
    IndexStore.buildIndexIfAbsent(dir, "state") { tmp =>
      val li = Tables.lineitem(s, d)
      (0L to 2L).foreach { b =>
        li.filter(col("l_orderkey") % 3 === b)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(big(sum(col("l_quantity").cast("bigint"))).as("p_qty"),
            big(count(lit(1))).as("p_cnt"))
          .withColumn("batch", lit(b))
          .write.mode(if (b == 0L) "overwrite" else "append")
          .parquet(s"$tmp/state")
      }
    }
    ordered(
      s.read.parquet(s"$dir/state")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(big(sum("p_qty")).as("sum_qty"),
          big(sum("p_cnt")).as("n_rows")),
      "l_returnflag", "l_linestatus")
  }

  /** op253: incremental aggregate maintenance WITH RETRACTIONS — the
    * delete leg op152's insert-only refresh can't express: sum/count
    * partials form an abelian GROUP, not just a monoid, so an upstream
    * correction lands as one O(groups) partial with NEGATIVE
    * multiplicities — never a base-table rescan, never tombstone
    * bookkeeping at refresh time. Here the 'R'-flag slice is retracted
    * (a recall of returned lines) after op152's three insert batches;
    * the maintained view nets those groups to ZERO and the n_rows > 0
    * gate makes them VANISH — the group-disappearance subtlety every
    * IVM treatment has to get right, exercised for real (the oracle
    * recomputes from scratch without the retracted rows). MIN/MAX are
    * deliberately absent: they are not subtractable, and at scale they
    * re-derive from the op137 clustered store's per-file stats
    * instead. */
  val op253RetractAgg: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "retract_agg_flag_status", table = "lineitem")
    IndexStore.buildIndexIfAbsent(dir, "state") { tmp =>
      val li = Tables.lineitem(s, d)
      (0L to 2L).foreach { b =>
        li.filter(col("l_orderkey") % 3 === b)
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(big(sum(col("l_quantity").cast("bigint"))).as("p_qty"),
            big(count(lit(1))).as("p_cnt"))
          .withColumn("batch", lit(b))
          .write.mode(if (b == 0L) "overwrite" else "append")
          .parquet(s"$tmp/state")
      }
      li.filter(col("l_returnflag") === "R")
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg((-big(sum(col("l_quantity").cast("bigint")))).as("p_qty"),
          (-big(count(lit(1)))).as("p_cnt"))
        .withColumn("batch", lit(3L))
        .write.mode("append").parquet(s"$tmp/state")
    }
    ordered(
      s.read.parquet(s"$dir/state")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(big(sum("p_qty")).as("sum_qty"),
          big(sum("p_cnt")).as("n_rows"))
        .where(col("n_rows") > 0),
      "l_returnflag", "l_linestatus")
  }

  /** op146: merge-on-read UPSERT — the changelog leg that completes the
    * store's CRUD lifecycle (build → append → delete → UPSERT →
    * compact). Three change batches land as O(batch) appended parquet
    * under `_changes` (`Layout.applyChanges`: full row image + _op +
    * monotone _seq; no data or manifest rewrite — the Hudi/Paimon
    * merge-on-read shape for row-level mutation of a 100 TB store):
    * b1 INSERTs the 20% slice the base build withheld, b2 UPDATEs a
    * non-clustered column (+100000 chars on the doc_id%7==3 slice),
    * b3 DELETEs doc_id%10==6 — overriding b2's update where the slices
    * overlap, which is exactly the latest-wins contract `readMerged`
    * resolves (one max_by(_seq) per changed key + one anti-join). The
    * oracle re-derives the same final image from the unclustered
    * table; compaction applying the changelog physically (and the
    * merged view surviving it bit-identically) is LayoutSpec's. */
  val op146UpsertMerge: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_upserted", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = layoutKeyed(s, d)
      graft.functions.Layout.writeClustered(
        keyed.filter(col("doc_id") % 5 =!= 0L), layoutZk, numFiles = 8,
        path = s"$tmp/docs")
      val zkeyed = keyed.withColumn("zkey", layoutZk)
      graft.functions.Layout.applyChanges( // b1: INSERT the held-out 20%
        zkeyed.filter(col("doc_id") % 5 === 0L).withColumn("_op", lit("U")),
        "doc_id", s"$tmp/docs")
      graft.functions.Layout.applyChanges( // b2: UPDATE a non-clustered col
        zkeyed.filter(col("doc_id") % 7 === 3L)
          .withColumn("n_chars", col("n_chars") + 100000L)
          .withColumn("_op", lit("U")),
        "doc_id", s"$tmp/docs")
      graft.functions.Layout.applyChanges( // b3: DELETE (overrides b2)
        zkeyed.filter(col("doc_id") % 10 === 6L).withColumn("_op", lit("D")),
        "doc_id", s"$tmp/docs")
      ()
    }
    rectAgg(graft.functions.Layout.readMerged(s, s"$dir/docs", "doc_id"))
  }

  /** op147: SCHEMA EVOLUTION — the append batch carries a column the
    * base build never had (`quality`), landing as new files with the
    * wider schema while the old files stay untouched (the lakehouse
    * ADD COLUMN contract: widening a 100 TB table rewrites nothing).
    * `Layout.readClusteredEvolved` resolves the union schema
    * (mergeSchema) and null-fills the base files; the aggregate counts
    * scored vs unscored rows per language, so the hash gate proves the
    * null-fill exact — every base row unscored, every appended row
    * carrying its value. */
  val op147SchemaEvolution: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_evolved", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      val keyed = layoutKeyed(s, d)
      graft.functions.Layout.writeClustered(
        keyed.filter(col("doc_id") % 5 =!= 0L), layoutZk, numFiles = 8,
        path = s"$tmp/docs")
      graft.functions.Layout.appendClustered(
        keyed.filter(col("doc_id") % 5 === 0L)
          .withColumn("quality", col("n_chars") % 100L),
        layoutZk, numFiles = 4, path = s"$tmp/docs")
    }
    ordered(
      graft.functions.Layout.readClusteredEvolved(s, s"$dir/docs")
        .groupBy(col("lang_id"))
        .agg(big(count(lit(1))).as("n_docs"),
          big(count(col("quality"))).as("n_scored"),
          big(sum(col("quality"))).as("sum_quality")),
      "lang_id")
  }

  /** op144: metadata-only rectangle COUNT — the manifest's per-file
    * column bounds + n_rows answer the aggregate for every file whose
    * bounds lie inside the rectangle WITHOUT opening it; only boundary
    * files are scanned with the exact predicate (Iceberg's scan-free
    * aggregation, made explicit). The driver-side literal is the
    * metadata answer BY DESIGN — the point of the op is that the
    * corpus is (mostly) never read. The oracle counts the unclustered
    * table directly: stats-derived and scan-derived answers must
    * agree exactly. */
  val op144MetaCount: Q = (s, d) => {
    val rc = graft.functions.Layout.countRectangleMeta(
      s, s"${zorderStoreDir(s, d)}/docs",
      Seq(("lang_id", 1L, 1L), ("len_bucket", 4L, 20L)))
    s.range(1).select(lit(rc.count).cast("bigint").as("n_docs"))
  }

  /** op143: merge-on-read DELETE — a key slice is tombstoned (an O(N)
    * appended key file; no data or manifest rewrite, the GDPR-delete
    * shape for a 100 TB store) and the pruned rectangle scan of the
    * CURRENT view anti-joins it out. The oracle excludes the same
    * slice from the unclustered table, so a hash match proves the
    * tombstones removed exactly the deleted keys and nothing else.
    * Compaction applying tombstones physically is LayoutSpec's. */
  val op143DeleteScan: Q = (s, d) => {
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_deleted", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      graft.functions.Layout.writeClustered(
        layoutKeyed(s, d), layoutZk, numFiles = 8, path = s"$tmp/docs")
      graft.functions.Layout.deleteByKeys(
        Tables.documents(s, d).filter(col("doc_id") % 10 === 3L)
          .select(col("doc_id")),
        s"$tmp/docs")
    }
    rectAgg(graft.functions.Layout.readPrunedCurrent(
      s, s"$dir/docs", aLo = 1L, aHi = 1L, bLo = 4L, bHi = 20L))
  }

  /** op142: STREAMING ingest into the clustered store — the layout
    * family's online leg (the op104/op132/op134 symmetry). Arrivals
    * stream in via AvailableNow and every micro-batch lands through
    * `Layout.appendClustered` in `foreachBatch`: new key-sorted files
    * + manifest rows, nothing rewritten — continuous ingest into a
    * Z-ordered table as it would run in production (dimension ids
    * resolved per batch against the broadcast id map; a real deploy
    * pins the map or re-ranks offline). The oracle is the full-corpus
    * rectangle aggregate through the pruned path: the stream provably
    * lost nothing and the manifest stayed exact. */
  val op142StreamClusteredIngest: Q = (s, d) => {
    import org.apache.spark.sql.streaming.Trigger
    val dir = IndexStore.indexRoot(d, "zorder_lang_len_streamed", table = "documents")
    IndexStore.buildIndexIfAbsent(dir, "docs/_manifest") { tmp =>
      graft.functions.Layout.writeClustered(
        layoutKeyed(s, d).filter(col("doc_id") % 5 =!= 0L), layoutZk,
        numFiles = 8, path = s"$tmp/docs")
      // dimension-id map resolved ONCE from the static corpus: the
      // stream joins against it per batch (tiny broadcast)
      val langIds = graft.functions.Layout.denseDimIds(
        Tables.documents(s, d), "lang", "lang_id")
        .select(col("lang"), col("lang_id")).distinct()
      val schema = s.read.parquet(s"$d/documents.parquet").schema
      val streamDir =
        java.nio.file.Files.createTempDirectory("graft_zingest_")
      val link = streamDir.resolve("documents.parquet")
      try {
        java.nio.file.Files.createSymbolicLink(link,
          java.nio.file.Paths.get(s"$d/documents.parquet"))
        val q = s.readStream.schema(schema).parquet(streamDir.toString)
          .filter(col("doc_id") % 5 === 0L)
          .writeStream.outputMode("append")
          .foreachBatch { (batch: DataFrame, _: Long) =>
            val keyed = batch.join(broadcast(langIds), "lang")
              .withColumn("len_bucket",
                least(expr("n_chars div 16"), lit(65535L)).cast("bigint"))
              .select(col("doc_id"), col("lang_id"), col("len_bucket"),
                col("n_chars"))
            graft.functions.Layout.appendClustered(
              keyed, layoutZk, numFiles = 4, path = s"$tmp/docs")
          }
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      } finally {
        java.nio.file.Files.deleteIfExists(link)
        java.nio.file.Files.deleteIfExists(streamDir): Unit
      }
    }
    rectAgg(graft.functions.Layout.readPruned(
      s, s"$dir/docs", aLo = 1L, aHi = 1L, bLo = 4L, bHi = 20L))
  }

  val defs: Map[String, Q] = Map(
    "op87_pack_sequences" -> op87PackSequences,
    "op88_mixture" -> op88Mixture,
    "op89_mixture_cutoff" -> op89MixtureCutoff,
    "op111_mixture_temperature" -> op111MixtureTemperature,
    "op99_token_budget" -> op99TokenBudget,
    "op90_quality_gate" -> op90QualityGate,
    "op91_gate_stats" -> op91GateStats,
    "op92_split_leak_safe" -> op92SplitLeakSafe,
    "op94_corpus_stats" -> op94CorpusStats,
    "op95_source_overlap" -> op95SourceOverlap,
    "op79_sample_stratified" -> op79SampleStratified,
    "op105_session_docs" -> op105SessionDocs,
    "op106_changelog_compact" -> op106ChangelogCompact,
    "op107_corpus_shuffle" -> op107CorpusShuffle,
    "op108_stream_changelog" -> op108StreamChangelog,
    "op239_dsir_importance" -> op239DsirImportance,
    "op113_curation_pipeline" -> op113CurationPipeline,
    "op122_stream_changelog_tws" -> op122StreamChangelogTws,
    "op261_quality_dup_cal" -> op261QualityDupCal,
    "op129_weighted_sample" -> op129WeightedSample,
    "op131_stream_scd2" -> op131StreamScd2,
    "op136_zorder_key" -> op136ZorderKey,
    "op137_clustered_scan" -> op137ClusteredScan,
    "op138_pruned_scan" -> op138PrunedScan,
    "op139_append_scan" -> op139AppendScan,
    "op140_point_lookup" -> op140PointLookup,
    "op141_compacted_scan" -> op141CompactedScan,
    "op142_stream_clustered_ingest" -> op142StreamClusteredIngest,
    "op143_delete_scan" -> op143DeleteScan,
    "op144_meta_count" -> op144MetaCount,
    "op145_time_travel" -> op145TimeTravel,
    "op146_upsert_merge" -> op146UpsertMerge,
    "op147_schema_evolution" -> op147SchemaEvolution,
    "op148_bm25_stats" -> op148Bm25Stats,
    "op149_bm25_topk" -> op149Bm25TopK,
    "op210_rrf_fusion" -> op210RrfFusion,
    "op211_phrase_search" -> op211PhraseSearch,
    "op152_incr_agg" -> op152IncrAgg,
    "op253_retract_agg" -> op253RetractAgg,
    "op153_stream_upsert" -> op153StreamUpsert,
    "op154_snapshot_diff" -> op154SnapshotDiff,
  )

  private val baseOracle: Map[String, String] = Map(
    "op95_source_overlap" ->
      s"""WITH sh AS (SELECT DISTINCT doc_id, shingle FROM (${DedupQueries.trigramSql})),
        |keep AS (SELECT shingle FROM sh GROUP BY shingle HAVING count(*) <= 100),
        |shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS overlap
        |       FROM shc a JOIN shc b USING (shingle) WHERE a.doc_id < b.doc_id
        |       GROUP BY 1, 2),
        |p AS (SELECT doc_a, doc_b,
        |        overlap * 10000 // (ca.n_sh + cb.n_sh - overlap) AS jaccard_bp
        |      FROM ov JOIN cnt ca ON ov.doc_a = ca.doc_id
        |              JOIN cnt cb ON ov.doc_b = cb.doc_id
        |      WHERE overlap * 10000 // (ca.n_sh + cb.n_sh - overlap) >= 7000),
        |t AS (SELECT least(sa.source, sb.source) AS source_lo,
        |        greatest(sa.source, sb.source) AS source_hi,
        |        CASE WHEN sa.source <= sb.source THEN p.doc_a ELSE p.doc_b END AS doc_lo,
        |        CASE WHEN sa.source <= sb.source THEN p.doc_b ELSE p.doc_a END AS doc_hi,
        |        p.jaccard_bp
        |      FROM p JOIN documents sa ON p.doc_a = sa.doc_id
        |             JOIN documents sb ON p.doc_b = sb.doc_id)
        |SELECT source_lo, source_hi,
        |  CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(count(DISTINCT doc_lo) AS BIGINT) AS n_docs_lo,
        |  CAST(count(DISTINCT doc_hi) AS BIGINT) AS n_docs_hi,
        |  CAST(sum(jaccard_bp) // count(*) AS BIGINT) AS mean_jaccard_bp
        |FROM t GROUP BY source_lo, source_hi
        |ORDER BY source_lo, source_hi""".stripMargin,
    "op105_session_docs" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |            event_type FROM events),
        |g AS (SELECT *, CASE WHEN lag(ts_us) OVER w IS NULL
        |        OR ts_us - lag(ts_us) OVER w > 1800000000
        |        THEN 1 ELSE 0 END AS new_sess
        |      FROM e WINDOW w AS (PARTITION BY user_id
        |                          ORDER BY ts_us, event_id)),
        |s AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
        |        ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND CURRENT ROW) AS BIGINT) AS sess_id FROM g)
        |SELECT user_id, sess_id, CAST(count(*) AS BIGINT) AS n_events,
        |  CAST(min(ts_us) AS BIGINT) AS sess_start_us,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS duration_us,
        |  string_agg(event_type, ' ' ORDER BY ts_us, event_id)
        |    AS behavior_text
        |FROM s GROUP BY user_id, sess_id
        |ORDER BY user_id, sess_id""".stripMargin,
    "op113_curation_pipeline" -> {
      val stop = TextQueries.enStop.map("'" + _ + "'").mkString(",")
      s"""WITH b AS (
        |  SELECT doc_id, text,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS mean_len_bp,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS distinct_bp,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains([$stop], x))) AS BIGINT) AS stop_hits
        |  FROM documents),
        |g AS (SELECT doc_id, text FROM b
        |      WHERE n_words >= 20 AND mean_len_bp BETWEEN 40000 AND 47000
        |        AND distinct_bp >= 5000 AND stop_hits >= 2),
        |sv AS (SELECT text, min(doc_id) AS doc_id FROM g GROUP BY text),
        |hp AS (SELECT doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |         md5('shuf:42:' || doc_id) AS h
        |       FROM sv),
        |r AS (SELECT doc_id, n_tok,
        |        CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
        |      FROM hp),
        |sh AS (SELECT doc_id, n_tok, pos,
        |         CAST((pos - 1) % 8 AS BIGINT) AS shard FROM r),
        |o AS (SELECT *, CAST(coalesce(sum(n_tok) OVER (PARTITION BY shard
        |        ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING
        |        AND 1 PRECEDING), 0) AS BIGINT) AS tok_off FROM sh),
        |p AS (SELECT *,
        |        unnest(range(tok_off // 64, (tok_off + n_tok - 1) // 64 + 1)) AS pack_id
        |      FROM o WHERE n_tok > 0)
        |SELECT doc_id, pos, shard, n_tok, tok_off,
        |  CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(greatest(pack_id * 64 - tok_off, 0) AS BIGINT) AS start_in_doc,
        |  CAST(least((pack_id + 1) * 64 - tok_off, n_tok) AS BIGINT) AS end_in_doc
        |FROM p ORDER BY doc_id, pack_id""".stripMargin
    },
    "op106_changelog_compact" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |            event_type, CAST(round(value * 100, 0) AS BIGINT) AS value_cents,
        |            row_number() OVER (PARTITION BY user_id
        |              ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn,
        |            count(*) OVER (PARTITION BY user_id) AS n
        |          FROM events)
        |SELECT user_id, CAST(n AS BIGINT) AS n_changes,
        |  CAST(event_id AS BIGINT) AS last_event_id,
        |  event_type AS last_event_type,
        |  value_cents AS last_value_cents,
        |  CAST(ts_us AS BIGINT) AS last_ts_us
        |FROM e WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "op107_corpus_shuffle" ->
      """WITH h AS (SELECT doc_id, md5('shuf:42:' || doc_id) AS h
        |           FROM documents),
        |r AS (SELECT doc_id,
        |        CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
        |      FROM h)
        |SELECT doc_id, pos, CAST((pos - 1) % 16 AS BIGINT) AS shard
        |FROM r ORDER BY doc_id""".stripMargin,
    "op88_mixture" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5('mix:' || text), 1, 15))::BIGINT AS h,
        |    CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n, min(w) AS w FROM t GROUP BY source),
        |k AS (SELECT min(n // w) AS k FROM c),
        |q AS (SELECT source, w * (SELECT k FROM k) AS quota FROM c),
        |r AS (SELECT t.*, row_number() OVER (PARTITION BY source
        |        ORDER BY h, doc_id) AS mix_rank FROM t)
        |SELECT r.doc_id, r.source, r.h AS mix_hash,
        |  CAST(r.mix_rank AS BIGINT) AS mix_rank, CAST(q.quota AS BIGINT) AS quota
        |FROM r JOIN q USING (source) WHERE r.mix_rank <= q.quota
        |ORDER BY doc_id""".stripMargin,
    "op89_mixture_cutoff" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5('mix:' || text), 1, 15))::BIGINT AS h,
        |    CAST(CAST(substring(source, 4) AS INT) % 4 + 1 AS BIGINT) AS w
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n, min(w) AS w FROM t GROUP BY source),
        |k AS (SELECT min(n // w) AS k FROM c),
        |r AS (SELECT source,
        |        w * (SELECT k FROM k) * 1000000 // n AS rate_ppm FROM c)
        |SELECT t.doc_id, t.source, CAST(t.h % 1000000 AS BIGINT) AS h_ppm,
        |  CAST(r.rate_ppm AS BIGINT) AS rate_ppm
        |FROM t JOIN r USING (source) WHERE t.h % 1000000 < r.rate_ppm
        |ORDER BY doc_id""".stripMargin,
    "op111_mixture_temperature" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    ('0x' || substring(md5('mix:' || text), 1, 15))::BIGINT AS h
        |  FROM documents),
        |c AS (SELECT source, count(*) AS n,
        |        CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000000) AS BIGINT) AS s
        |      FROM t GROUP BY source),
        |tot AS (SELECT sum(n) AS tt, sum(s) AS ss FROM c),
        |r AS (SELECT source, n,
        |        least(CAST(floor(CAST(tt // 2 AS DOUBLE) * CAST(s AS DOUBLE)
        |          / CAST(ss AS DOUBLE)) AS BIGINT), n) AS quota
        |      FROM c, tot)
        |SELECT t.doc_id, t.source, CAST(t.h % 1000000 AS BIGINT) AS h_ppm,
        |  CAST(r.quota * 1000000 // r.n AS BIGINT) AS rate_ppm
        |FROM t JOIN r USING (source)
        |WHERE t.h % 1000000 < r.quota * 1000000 // r.n
        |ORDER BY doc_id""".stripMargin,
    "op99_token_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |    ('0x' || substring(md5('budget:' || text), 1, 15))::BIGINT AS h,
        |    CAST((CAST(substring(source, 4) AS INT) % 4 + 1) * 500 AS BIGINT) AS budget
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY h, doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS tok_before,
        |    budget
        |  FROM t)
        |SELECT doc_id, source, n_tok, tok_before, budget
        |FROM o WHERE tok_before < budget
        |ORDER BY doc_id""".stripMargin,
    "op90_quality_gate" -> {
      val stop = TextQueries.enStop.map("'" + _ + "'").mkString(",")
      s"""WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS mean_len_bp,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS distinct_bp,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains([$stop], x))) AS BIGINT) AS stop_hits
        |  FROM documents),
        |f AS (
        |  SELECT doc_id, n_words, mean_len_bp, distinct_bp, stop_hits,
        |    CAST(CASE WHEN n_words >= 20 THEN 1 ELSE 0 END AS BIGINT) AS f_words,
        |    CAST(CASE WHEN mean_len_bp BETWEEN 40000 AND 47000
        |         THEN 1 ELSE 0 END AS BIGINT) AS f_len,
        |    CAST(CASE WHEN distinct_bp >= 5000 THEN 1 ELSE 0 END AS BIGINT) AS f_distinct,
        |    CAST(CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS BIGINT) AS f_stop
        |  FROM b)
        |SELECT *, CAST(f_words * f_len * f_distinct * f_stop AS BIGINT) AS keep
        |FROM f ORDER BY doc_id""".stripMargin
    },
    "op91_gate_stats" -> {
      val stop = TextQueries.enStop.map("'" + _ + "'").mkString(",")
      s"""WITH b AS (
        |  SELECT source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
        |    CAST(length(replace(text, ' ', '')) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS mean_len_bp,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 10000
        |         // len(string_split(text, ' ')) AS BIGINT) AS distinct_bp,
        |    CAST(len(list_filter(string_split(text, ' '),
        |         x -> list_contains([$stop], x))) AS BIGINT) AS stop_hits
        |  FROM documents),
        |f AS (
        |  SELECT source,
        |    CASE WHEN n_words >= 20 THEN 1 ELSE 0 END AS f_words,
        |    CASE WHEN mean_len_bp BETWEEN 40000 AND 47000
        |         THEN 1 ELSE 0 END AS f_len,
        |    CASE WHEN distinct_bp >= 5000 THEN 1 ELSE 0 END AS f_distinct,
        |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS f_stop
        |  FROM b),
        |g AS (
        |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(f_words * f_len * f_distinct * f_stop) AS BIGINT) AS n_keep,
        |    CAST(sum(1 - f_words) AS BIGINT) AS drop_words,
        |    CAST(sum(1 - f_len) AS BIGINT) AS drop_len,
        |    CAST(sum(1 - f_distinct) AS BIGINT) AS drop_distinct,
        |    CAST(sum(1 - f_stop) AS BIGINT) AS drop_stop
        |  FROM f GROUP BY source)
        |SELECT *, CAST(n_keep * 10000 // n_docs AS BIGINT) AS keep_rate_bp
        |FROM g ORDER BY source""".stripMargin
    },
    "op94_corpus_stats" ->
      """WITH base AS (
        |  SELECT source, lang, count(*) AS n_docs,
        |    sum(len(string_split(text, ' '))) AS n_tokens,
        |    sum(length(text)) AS n_chars,
        |    min(length(text)) AS min_chars, max(length(text)) AS max_chars
        |  FROM documents GROUP BY source, lang),
        |v AS (
        |  SELECT source, lang, count(DISTINCT token) AS vocab
        |  FROM (SELECT source, lang, unnest(string_split(text, ' ')) AS token
        |        FROM documents)
        |  GROUP BY source, lang)
        |SELECT base.source, base.lang,
        |  CAST(n_docs AS BIGINT) AS n_docs,
        |  CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_chars AS BIGINT) AS n_chars,
        |  CAST(min_chars AS BIGINT) AS min_chars,
        |  CAST(max_chars AS BIGINT) AS max_chars,
        |  CAST(vocab AS BIGINT) AS vocab,
        |  CAST(n_tokens * 10000 // n_docs AS BIGINT) AS mean_tok_bp
        |FROM base JOIN v USING (source, lang)
        |ORDER BY source, lang""".stripMargin,
    "op79_sample_stratified" ->
      """SELECT doc_id, source,
        |  ('0x' || substring(md5('sample:' || text), 1, 15))::BIGINT % 100 AS h_bucket,
        |  CAST((CAST(substring(source, 4) AS INT) % 4 + 1) * 25 AS BIGINT) AS rate_pct
        |FROM documents
        |WHERE ('0x' || substring(md5('sample:' || text), 1, 15))::BIGINT % 100
        |      < (CAST(substring(source, 4) AS INT) % 4 + 1) * 25
        |ORDER BY doc_id""".stripMargin,
    "op92_split_leak_safe" ->
      s"""WITH RECURSIVE
        |${DedupQueries.clusterCtes},
        |b AS (SELECT doc_id, CAST(cluster AS BIGINT) AS cluster,
        |        CAST(('0x' || substring(md5('split:' ||
        |          CAST(cluster AS VARCHAR)), 1, 15))::BIGINT % 100 AS BIGINT)
        |          AS bucket
        |      FROM clu)
        |SELECT doc_id, cluster, bucket,
        |  CASE WHEN bucket < 80 THEN 'train'
        |       WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split
        |FROM b ORDER BY doc_id""".stripMargin,
    // op261: op71's quality CTEs + op61's pair chain, composed
    "op261_quality_dup_cal" -> {
      val stop = TextQueries.enStop.map("'" + _ + "'").mkString(",")
      s"""WITH b AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok_ws,
        |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS n_chars_nosp,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      x -> list_contains([$stop], x))) AS BIGINT) AS n_stop
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tok_ws,
        |    CASE WHEN n_tok_ws = 0 THEN 0
        |      ELSE n_stop * 10000 // n_tok_ws END AS stop_bp,
        |    CASE WHEN n_tok_ws = 0 THEN 0
        |      ELSE n_chars_nosp * 10000 // n_tok_ws END AS tok_len_bp
        |  FROM b),
        |qb AS (
        |  SELECT doc_id,
        |    CAST((2500 + least(n_tok_ws * 100, 2500) + least(stop_bp, 2500)
        |      + least(greatest(tok_len_bp - 20000, 0) // 4, 2500)) // 500
        |      AS BIGINT) AS bucket
        |  FROM r),
        |sh AS (SELECT DISTINCT doc_id, shingle FROM (${DedupQueries.trigramSql})),
        |keep AS (SELECT shingle FROM sh GROUP BY shingle
        |         HAVING count(*) <= ${DedupQueries.shingleDocFreqCap}),
        |shc AS (SELECT sh.* FROM sh JOIN keep USING (shingle)),
        |cnt AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
        |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        |         count(*) AS overlap
        |       FROM shc a JOIN shc b USING (shingle)
        |       WHERE a.doc_id < b.doc_id GROUP BY 1, 2),
        |pairs AS (
        |  SELECT doc_a, doc_b FROM ov
        |  JOIN cnt ca ON ov.doc_a = ca.doc_id
        |  JOIN cnt cb ON ov.doc_b = cb.doc_id
        |  WHERE overlap * 10000 // (ca.n_sh + cb.n_sh - overlap) >= 7000),
        |dup AS (SELECT DISTINCT doc_id FROM (
        |  SELECT doc_a AS doc_id FROM pairs
        |  UNION ALL SELECT doc_b FROM pairs))
        |SELECT qb.bucket, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_dup_docs,
        |  CAST((sum(CASE WHEN dup.doc_id IS NOT NULL THEN 1 ELSE 0 END)
        |       * 10000) // count(*) AS BIGINT) AS dup_rate_bp
        |FROM qb LEFT JOIN dup ON qb.doc_id = dup.doc_id
        |GROUP BY qb.bucket ORDER BY bucket""".stripMargin
    },
    // op131: the closed subset of op128's batch SCD2 replay — open
    // versions are streaming state, not output
    "op131_stream_scd2" ->
      """WITH base AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS t_us, event_id,
        |         CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT) AS val_bp
        |  FROM events),
        |flg AS (
        |  SELECT *, lag(val_bp) OVER (PARTITION BY user_id, event_type
        |                              ORDER BY t_us, event_id) AS prev,
        |         row_number() OVER (PARTITION BY user_id, event_type
        |                            ORDER BY t_us, event_id) AS rn
        |  FROM base),
        |chg AS (SELECT * FROM flg WHERE rn = 1 OR prev IS DISTINCT FROM val_bp),
        |v AS (
        |  SELECT user_id, event_type,
        |         CAST(row_number() OVER w AS BIGINT) AS ver,
        |         val_bp, t_us AS valid_from, lead(t_us) OVER w AS valid_to
        |  FROM chg WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t_us, event_id))
        |SELECT user_id, event_type, ver, val_bp, valid_from, valid_to
        |FROM v WHERE valid_to IS NOT NULL
        |ORDER BY user_id, event_type, ver""".stripMargin,
    // op129: the LCG and the integer division are exact BIGINT on both
    // engines; // is DuckDB's integer div
    "op129_weighted_sample" ->
      """WITH pr AS (
        |  SELECT doc_id, n_chars,
        |         (doc_id * 1103515245 + 12345) % 2147483647 AS u
        |  FROM documents),
        |p2 AS (SELECT doc_id, n_chars, u // n_chars AS priority FROM pr),
        |top AS (SELECT * FROM p2 ORDER BY priority, doc_id LIMIT 100)
        |SELECT CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS rank,
        |       doc_id, CAST(priority AS BIGINT) AS priority, n_chars
        |FROM top ORDER BY rank""".stripMargin,
    "op87_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        |  FROM documents),
        |o AS (
        |  SELECT doc_id, source, n_tok,
        |    CAST(coalesce(sum(n_tok) OVER (PARTITION BY source
        |      ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
        |      AND 1 PRECEDING), 0) AS BIGINT) AS tok_off
        |  FROM t),
        |p AS (
        |  SELECT doc_id, source, n_tok, tok_off,
        |    unnest(range(tok_off // 64, (tok_off + n_tok - 1) // 64 + 1)) AS pack_id
        |  FROM o WHERE n_tok > 0)
        |SELECT doc_id, source, n_tok, tok_off,
        |  CAST(pack_id AS BIGINT) AS pack_id,
        |  CAST(greatest(pack_id * 64 - tok_off, 0) AS BIGINT) AS start_in_doc,
        |  CAST(least((pack_id + 1) * 64 - tok_off, n_tok) AS BIGINT) AS end_in_doc
        |FROM p ORDER BY doc_id, pack_id""".stripMargin,
  )

  /** The probe queries run the SAME parameters against a prebuilt
    * persisted index — bit-exact storage (bigint everywhere) makes the
    * results, and therefore the oracles, identical to their end-to-end
    * build-per-run twins. */
  val oracle: Map[String, String] = baseOracle ++ Map(
    // the streamed changelog's compacted final state IS the batch
    // latest-state aggregate
    "op108_stream_changelog" -> baseOracle("op106_changelog_compact"),
    // the transformWithState twin compacts to the same final state
    "op122_stream_changelog_tws" -> baseOracle("op106_changelog_compact"),
    "op239_dsir_importance" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |  FROM documents),
        |tk AS (
        |  SELECT t.doc_id, t.token, s.source
        |  FROM tok t JOIN documents s USING (doc_id)),
        |cnt AS (
        |  SELECT token,
        |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS ct,
        |    CAST(sum(CASE WHEN source <> 'src0' THEN 1 ELSE 0 END)
        |         AS BIGINT) AS cs
        |  FROM tk GROUP BY 1),
        |tot AS (
        |  SELECT CAST(sum(ct) AS BIGINT) AS nt,
        |    CAST(sum(cs) AS BIGINT) AS ns,
        |    CAST(count(*) AS BIGINT) AS v
        |  FROM cnt),
        |w AS (
        |  SELECT token,
        |    CAST(floor(ln(CAST((ct + 1) * (ns + v) AS DOUBLE) /
        |         CAST((cs + 1) * (nt + v) AS DOUBLE)) * 1000000)
        |         AS BIGINT) AS w_micro
        |  FROM cnt CROSS JOIN tot)
        |SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
        |  CAST(sum(w.w_micro) AS BIGINT) AS dsir_micro,
        |  CAST(CASE WHEN sum(w.w_micro) >= 0 THEN 1 ELSE 0 END
        |       AS BIGINT) AS sel
        |FROM tok t JOIN w ON t.token = w.token
        |GROUP BY t.doc_id ORDER BY doc_id""".stripMargin,
    // op136: the oracle replays the identical 5-step mask-spread bit
    // arithmetic (bigint &, |, << on both engines); dense_rank over the
    // corpus is the oracle-side spelling of the distinct-rank+broadcast
    // the Spark side uses (equivalent ids, corpus-window-free at scale)
    "op136_zorder_key" ->
      """WITH lid AS (
        |  SELECT doc_id, dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents),
        |sp0 AS (SELECT doc_id, lang_id, len_bucket,
        |        lang_id & 65535 AS a, len_bucket & 65535 AS b FROM lid),
        |sp1 AS (SELECT doc_id, lang_id, len_bucket,
        |        (a | (a << 8)) & 16711935 AS a,
        |        (b | (b << 8)) & 16711935 AS b FROM sp0),
        |sp2 AS (SELECT doc_id, lang_id, len_bucket,
        |        (a | (a << 4)) & 252645135 AS a,
        |        (b | (b << 4)) & 252645135 AS b FROM sp1),
        |sp3 AS (SELECT doc_id, lang_id, len_bucket,
        |        (a | (a << 2)) & 858993459 AS a,
        |        (b | (b << 2)) & 858993459 AS b FROM sp2),
        |sp4 AS (SELECT doc_id, lang_id, len_bucket,
        |        (a | (a << 1)) & 1431655765 AS a,
        |        (b | (b << 1)) & 1431655765 AS b FROM sp3)
        |SELECT doc_id, CAST(lang_id AS BIGINT) AS lang_id,
        |       CAST(len_bucket AS BIGINT) AS len_bucket,
        |       CAST(a | (b << 1) AS BIGINT) AS zkey
        |FROM sp4 ORDER BY doc_id""".stripMargin,
    // op137/op138: the oracle aggregates the UNCLUSTERED table — a hash
    // match proves the Z-order-clustered store lossless and its scan
    // path exact. op138 shares it: the manifest-pruned access path
    // returns the identical aggregate (pruning is conservative by the
    // Morton monotonicity argument).
    "op137_clustered_scan" -> rectAggSql,
    "op138_pruned_scan" -> rectAggSql,
    // op139's store holds the same corpus (80% clustered + 20%
    // appended), so the rectangle aggregate — and the oracle — are
    // unchanged; the access path is what differs
    "op139_append_scan" -> rectAggSql,
    // op141/op142: compaction moves bytes, not answers; the streamed
    // ingest provably loses nothing — same full-corpus rectangle gate
    "op141_compacted_scan" -> rectAggSql,
    "op142_stream_clustered_ingest" -> rectAggSql,
    // op145 reads AS OF the pre-delete snapshot — the FULL corpus,
    // though the store's current view has a slice tombstoned: the
    // full-corpus oracle passing through a smaller HEAD proves the
    // snapshot isolation (op143's oracle pins what HEAD looks like)
    "op145_time_travel" -> rectAggSql,
    // op146: same rectangle aggregate over the post-changelog image —
    // full corpus, +100000 chars on the %7==3 slice, minus the %10==6
    // slice (len_bucket and lang_id derive from the ORIGINAL n_chars:
    // the update touches the non-clustered column only)
    "op146_upsert_merge" ->
      """WITH lid AS (
        |  SELECT doc_id, n_chars,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents),
        |cur AS (
        |  SELECT doc_id, lang_id, len_bucket,
        |         n_chars + CASE WHEN doc_id % 7 = 3 THEN 100000 ELSE 0 END
        |           AS adj_chars
        |  FROM lid WHERE doc_id % 10 <> 6)
        |SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(adj_chars) AS BIGINT) AS sum_chars
        |FROM cur WHERE lang_id = 1 AND len_bucket BETWEEN 4 AND 20
        |GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,
    // op147: the appended slice (doc_id%5==0) carries quality =
    // n_chars%100; base files null-fill under the evolved read
    "op147_schema_evolution" ->
      """WITH lid AS (
        |  SELECT doc_id, n_chars,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id
        |  FROM documents),
        |q AS (
        |  SELECT lang_id,
        |         CASE WHEN doc_id % 5 = 0 THEN n_chars % 100 ELSE NULL END
        |           AS quality
        |  FROM lid)
        |SELECT CAST(lang_id AS BIGINT) AS lang_id,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(quality) AS BIGINT) AS n_scored,
        |       CAST(sum(quality) AS BIGINT) AS sum_quality
        |FROM q GROUP BY lang_id ORDER BY lang_id""".stripMargin,
    // op148/op149: the BM25 arithmetic is the SAME expression text the
    // Spark plan evaluates (graft.functions.Bm25.{idf,contrib}UbpSql,
    // interpolated below) — every +,-,*,/ is IEEE correctly-rounded, so
    // identical text ⇒ identical doubles; ln is quantized to integer
    // micro-units before any sum, so aggregation order cannot matter
    "op148_bm25_stats" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         |         len(string_split(text, ' ')) AS dl
         |  FROM documents),
         |post AS (
         |  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
         |  FROM tok GROUP BY doc_id, token),
         |c AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) /
         |         CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM documents),
         |stats AS (
         |  SELECT token, count(*) AS df, sum(tf) AS cf
         |  FROM post GROUP BY token)
         |SELECT token, CAST(df AS BIGINT) AS df, CAST(cf AS BIGINT) AS cf,
         |       ${graft.functions.Bm25.idfUbpSql} AS idf_ubp
         |FROM stats CROSS JOIN c ORDER BY token""".stripMargin,
    "op149_bm25_topk" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         |         len(string_split(text, ' ')) AS dl
         |  FROM documents),
         |post AS (
         |  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
         |  FROM tok GROUP BY doc_id, token),
         |c AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) /
         |         CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM documents),
         |stats AS (SELECT token, count(*) AS df FROM post GROUP BY token),
         |qt(q_id, token) AS (VALUES ${bm25Queries
             .map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
         |cand AS (
         |  SELECT qt.q_id, p.doc_id,
         |         ${graft.functions.Bm25.contribUbpSql} AS contrib
         |  FROM post p
         |  JOIN qt USING (token) JOIN stats USING (token) CROSS JOIN c),
         |scored AS (
         |  SELECT q_id, doc_id, sum(contrib) AS score_ubp
         |  FROM cand GROUP BY q_id, doc_id),
         |rk AS (
         |  SELECT q_id, doc_id, score_ubp,
         |         row_number() OVER (PARTITION BY q_id
         |           ORDER BY score_ubp DESC, doc_id) AS rnk
         |  FROM scored)
         |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rnk AS BIGINT) AS rank,
         |       doc_id, CAST(score_ubp AS BIGINT) AS score_ubp
         |FROM rk WHERE rnk <= 5 ORDER BY q_id, rank""".stripMargin,
    // op210: both legs replayed verbatim (op149's BM25 chain at k=20,
    // op67's quantized-cosine chain restricted to the query ids), then
    // the integer RRF merge — rank fusion is engine-agnostic by design
    "op210_rrf_fusion" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         |         len(string_split(text, ' ')) AS dl
         |  FROM documents),
         |post AS (
         |  SELECT doc_id, token, count(*) AS tf, max(dl) AS dl
         |  FROM tok GROUP BY doc_id, token),
         |c AS (
         |  SELECT count(*) AS n,
         |         CAST(sum(len(string_split(text, ' '))) AS DOUBLE) /
         |         CAST(count(*) AS DOUBLE) AS avgdl
         |  FROM documents),
         |stats AS (SELECT token, count(*) AS df FROM post GROUP BY token),
         |qt(q_id, token) AS (VALUES ${bm25Queries
             .map { case (q, t) => s"($q, '$t')" }.mkString(", ")}),
         |bcand AS (
         |  SELECT qt.q_id, p.doc_id,
         |         ${graft.functions.Bm25.contribUbpSql} AS contrib
         |  FROM post p
         |  JOIN qt USING (token) JOIN stats USING (token) CROSS JOIN c),
         |bscored AS (
         |  SELECT q_id, doc_id, sum(contrib) AS score_ubp
         |  FROM bcand GROUP BY q_id, doc_id),
         |lexk AS (
         |  SELECT q_id, doc_id, rnk FROM (
         |    SELECT q_id, doc_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY score_ubp DESC, doc_id) AS rnk
         |    FROM bscored) WHERE rnk <= $rrfDepth),
         |qv AS (
         |  SELECT vec_id,
         |    [CAST(floor(CAST(embedding[i+1] AS DOUBLE) * 1000000) AS BIGINT)
         |     FOR i IN range(64)] AS v
         |  FROM embeddings),
         |nv AS (SELECT vec_id, v,
         |         CAST(list_sum([v[i+1] * v[i+1] FOR i IN range(64)]) AS DOUBLE) AS n2
         |       FROM qv),
         |vscored AS (
         |  SELECT qs.vec_id AS q_id, cs.vec_id AS n_id,
         |         CASE WHEN qs.n2 = 0 OR cs.n2 = 0 THEN CAST(0 AS BIGINT)
         |              ELSE CAST(floor(CAST(list_sum([qs.v[i+1] * cs.v[i+1] FOR i IN range(64)]) AS DOUBLE)
         |                   / (sqrt(qs.n2) * sqrt(cs.n2)) * 10000) AS BIGINT) END AS cos_bp
         |  FROM nv qs, nv cs
         |  WHERE qs.vec_id IN (${bm25Queries.map(_._1).distinct.mkString(", ")})
         |    AND qs.vec_id <> cs.vec_id),
         |veck AS (
         |  SELECT q_id, n_id, rank FROM (
         |    SELECT q_id, n_id,
         |           row_number() OVER (PARTITION BY q_id
         |             ORDER BY cos_bp DESC, n_id) AS rank
         |    FROM vscored) WHERE rank <= $rrfDepth),
         |fused AS (
         |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
         |         coalesce(l.doc_id, v.n_id) AS doc_id,
         |         coalesce(l.rnk, -1) AS rank_lex,
         |         coalesce(v.rank, -1) AS rank_vec,
         |         coalesce(1000000 // ($rrfK0 + l.rnk), 0) +
         |         coalesce(1000000 // ($rrfK0 + v.rank), 0) AS rrf_ppm
         |  FROM lexk l FULL OUTER JOIN veck v
         |    ON l.q_id = v.q_id AND l.doc_id = v.n_id),
         |rk2 AS (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |           ORDER BY rrf_ppm DESC, doc_id) AS rank
         |  FROM fused)
         |SELECT CAST(q_id AS BIGINT) AS q_id, CAST(rank AS BIGINT) AS rank,
         |  doc_id, CAST(rrf_ppm AS BIGINT) AS rrf_ppm,
         |  CAST(rank_lex AS BIGINT) AS rank_lex,
         |  CAST(rank_vec AS BIGINT) AS rank_vec
         |FROM rk2 WHERE rank <= $rrfOut ORDER BY q_id, rank""".stripMargin,
    // op211: positional postings (zipped unnest = posexplode), the
    // anchor trick replayed verbatim
    "op211_phrase_search" ->
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(text, ' ')) AS token,
         |         unnest(range(1, len(string_split(text, ' ')) + 1)) AS p
         |  FROM documents),
         |terms(phrase_id, off, token) AS (VALUES ${phraseQueries
             .flatMap { case (id, ph) =>
               ph.split(" ").zipWithIndex.map { case (t, i) =>
                 s"($id, $i, '$t')" } }.mkString(", ")}),
         |nt AS (SELECT phrase_id, count(*) AS n_terms FROM terms
         |       GROUP BY 1),
         |hit AS (
         |  SELECT t.phrase_id, k.doc_id, k.p - t.off AS anchor,
         |         count(*) AS n_hit
         |  FROM tok k JOIN terms t ON k.token = t.token
         |  GROUP BY 1, 2, 3),
         |m AS (
         |  SELECT h.phrase_id, h.doc_id, h.anchor
         |  FROM hit h JOIN nt USING (phrase_id)
         |  WHERE h.n_hit = nt.n_terms)
         |SELECT CAST(phrase_id AS BIGINT) AS phrase_id, doc_id,
         |  CAST(count(*) AS BIGINT) AS n_matches,
         |  CAST(min(anchor) AS BIGINT) AS first_pos
         |FROM m GROUP BY 1, 2 ORDER BY phrase_id, doc_id""".stripMargin,
    // op152: the delta-maintained state must answer exactly like the
    // full-table aggregate (quantities are integral doubles → bigint)
    // op253: the recompute the maintained view must equal — the base
    // WITHOUT the retracted slice; 'R' groups vanish entirely
    "op253_retract_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem WHERE l_returnflag <> 'R'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "op152_incr_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n_rows
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    // op153: full corpus with +100000 chars on the streamed update
    // slice (doc_id%7==3 of the base slice); len_bucket/lang_id from
    // the ORIGINAL n_chars (non-clustered-column update)
    "op153_stream_upsert" ->
      """WITH lid AS (
        |  SELECT doc_id, n_chars,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents),
        |cur AS (
        |  SELECT doc_id, lang_id, len_bucket,
        |         n_chars + CASE WHEN doc_id % 7 = 3 AND doc_id % 5 <> 0
        |                        THEN 100000 ELSE 0 END AS adj_chars
        |  FROM lid)
        |SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(adj_chars) AS BIGINT) AS sum_chars
        |FROM cur WHERE lang_id = 1 AND len_bucket BETWEEN 4 AND 20
        |GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,
    // op154: inserts = the appended slice (%5==0; none tombstoned —
    // %10==3 implies %5==3), deletes = the tombstoned slice within the
    // base (%5<>0 and %10==3)
    "op154_snapshot_diff" ->
      """WITH lid AS (
        |  SELECT doc_id,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id
        |  FROM documents),
        |ins AS (
        |  SELECT 'insert' AS change, lang_id, count(*) AS n
        |  FROM lid WHERE doc_id % 5 = 0 AND doc_id % 10 <> 3
        |  GROUP BY lang_id),
        |del AS (
        |  SELECT 'delete' AS change, lang_id, count(*) AS n
        |  FROM lid WHERE doc_id % 5 <> 0 AND doc_id % 10 = 3
        |  GROUP BY lang_id)
        |SELECT change, CAST(lang_id AS BIGINT) AS lang_id,
        |       CAST(n AS BIGINT) AS n
        |FROM (SELECT * FROM ins UNION ALL SELECT * FROM del)
        |ORDER BY change, lang_id""".stripMargin,
    // op143: the oracle excludes the tombstoned slice directly — the
    // merge-on-read view must remove exactly those keys
    "op143_delete_scan" ->
      """WITH lid AS (
        |  SELECT doc_id, n_chars,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents)
        |SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
        |FROM lid
        |WHERE lang_id = 1 AND len_bucket BETWEEN 4 AND 20
        |  AND doc_id % 10 <> 3
        |GROUP BY len_bucket ORDER BY len_bucket""".stripMargin,
    // op144: the metadata-derived count must equal the direct count
    "op144_meta_count" ->
      """WITH lid AS (
        |  SELECT doc_id,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs
        |FROM lid WHERE lang_id = 1 AND len_bucket BETWEEN 4 AND 20
        |ORDER BY n_docs""".stripMargin,
    // op140: the bloom-planned point lookup returns exactly the one
    // document row — the oracle recomputes its derived dims directly
    "op140_point_lookup" ->
      """WITH lid AS (
        |  SELECT doc_id, n_chars,
        |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
        |         LEAST(n_chars // 16, 65535) AS len_bucket
        |  FROM documents)
        |SELECT doc_id, CAST(lang_id AS BIGINT) AS lang_id,
        |       CAST(len_bucket AS BIGINT) AS len_bucket,
        |       CAST(n_chars AS BIGINT) AS n_chars
        |FROM lid WHERE doc_id = 42 ORDER BY doc_id""".stripMargin,
  )

  private lazy val rectAggSql: String =
    """WITH lid AS (
      |  SELECT doc_id, n_chars,
      |         dense_rank() OVER (ORDER BY lang) - 1 AS lang_id,
      |         LEAST(n_chars // 16, 65535) AS len_bucket
      |  FROM documents)
      |SELECT CAST(len_bucket AS BIGINT) AS len_bucket,
      |       CAST(count(*) AS BIGINT) AS n_docs,
      |       CAST(sum(n_chars) AS BIGINT) AS sum_chars
      |FROM lid WHERE lang_id = 1 AND len_bucket BETWEEN 4 AND 20
      |GROUP BY len_bucket ORDER BY len_bucket""".stripMargin

}
