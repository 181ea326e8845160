package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.Skew
import graft.sources.Tables
import Det.{big, meanBpFromCents, ordered}

/** Warehouse-infrastructure pack: the operators a platform team runs
  * UNDER the analytics — range-partition boundary computation,
  * hierarchical rollup without recursive CTEs, static salted skew
  * joins, last-touch attribution, and an exact-integer chi-square
  * independence grid. All house-rule deterministic (Det.scala).
  */
object WarehouseQueries {
  type Q = (SparkSession, String) => DataFrame

  /** op179: number of range buckets. */
  private val rbK = 16
  /** op180: pointer-jump rounds — covers trees up to 2^16 nodes (sf0.1
    * has 20k parts → depth 15); extra rounds join empty frontiers and
    * cost nothing. */
  private val treeRounds = 16
  /** op181: salt fan-out. */
  private val saltR = 8
  /** op182: attribution window (7 days, in micros). */
  private val attrWindowUs = 7L * 86400L * 1000000L
  /** op183: fixed-point scale (milli-units) — keeps (O·10³ − E)² inside
    * BIGINT through sf1 (O ≤ 1.5e6 → dev² ≤ 2.25e18 < 2⁶³). */
  private val chiScale = 1000L

  // ---------------------------------------------------------------- op179

  /** op179: exact range-partition boundaries — the k-quantile cut
    * points a range partitioner (or a length-bucketed sequence packer,
    * op87's upstream) needs, computed WITHOUT a global row sort: count
    * per distinct value (map-combinable), cumulative sum over the
    * value grid, boundary i = smallest value whose cumulative count
    * reaches ceil(i·n/k). Emits each boundary with its target rank and
    * achieved cumulative count (buckets balanced up to value-tie
    * granularity).
    *
    * 100 TB shape: the only ordered pass runs over the DISTINCT-VALUE
    * grid (a document-length domain: hundreds of values), never the
    * corpus — the op168/op171 grid-reduction argument as a
    * partitioning primitive. Near-unique domains first quantize to a
    * resolution grid (cents → dollars) or sample (what RangePartitioner
    * does); bounded domains get this exact form. */
  val op179RangeBoundaries: Q = (s, d) => {
    val grid = Tables.documents(s, d).groupBy(col("n_chars").as("v"))
      .agg(count(lit(1)).as("cnt"))
    val cum = graft.ops.Grid.cumWalk(grid, col("v"),
      Seq("cnt" -> "cum"), Seq("cnt" -> "n"))
    val targets = s.range(1, rbK + 1).toDF("i")
    ordered(
      targets.crossJoin(cum)
        .where(col("cum") >= expr(s"(i * n + ${rbK - 1}) div $rbK"))
        .groupBy("i")
        .agg(min("v").as("boundary"),
          expr(s"min_by(cum, v)").as("cum_at_boundary"),
          first(expr(s"(i * n + ${rbK - 1}) div $rbK")).as("target_rank"))
        .select(col("i"), col("target_rank"), col("boundary"),
          col("cum_at_boundary")),
      "i")
  }

  // ---------------------------------------------------------------- op180

  /** op180: hierarchical subtree rollup WITHOUT recursive CTEs — parts
    * form an implicit binary hierarchy (node = p_partkey+1, parent =
    * node div 2); every node's subtree retail-price sum and descendant
    * count, computed by iterating the parent-pointer map: each round
    * joins the frontier (node, ptr) against the broadcast parent
    * table, accumulating one ancestor level per round until every
    * chain hits the root. The ancestor closure is then ONE hash
    * aggregate (value summed by ancestor).
    *
    * This is the Spark-first answer to a missing engine feature:
    * Spark has no WITH RECURSIVE (the DuckDB oracle uses exactly
    * that), so hierarchy traversal becomes a bounded loop of joins
    * against the broadcast-sized hierarchy dim — the BOM-explosion /
    * org-rollup shape. depth(D) rounds × broadcast join; the fact
    * table is never re-shuffled (contributions key by ancestor once,
    * at the end).
    *
    * 100 TB shape: hierarchy dims are small (an org chart, a BOM, a
    * category tree — thousands to millions of rows) while the rolled-up
    * fact is huge; closure construction touches only the dim, and the
    * single fact-side aggregate is map-combinable. Pointer-JUMPING
    * (2^j-th ancestors, O(log D) rounds of closure self-joins) beats
    * the per-level loop only when D is large — for bushy shallow
    * hierarchies the per-level loop moves strictly less data. */
  val op180TreeRollup: Q = (s, d) => {
    val nodes = Tables.part(s, d).select(
      (col("p_partkey") + 1).as("node"),
      round(col("p_retailprice") * 100, 0).cast("long").as("cents"))
    val parents = nodes.where(col("node") >= 2)
      .select(col("node").as("c"), expr("node div 2").as("p"))
    // ancestor closure: (node, anc) incl. self
    var closure = nodes.select(col("node"), col("node").as("anc"))
    var frontier = closure
    for (_ <- 1 to treeRounds) {
      // fresh aliases each round: the loop re-joins the same parent
      // dim, so qualified names (not Dataset-apply refs) keep the
      // self-join lineage unambiguous
      frontier = frontier.as("f")
        .join(broadcast(parents.as("pa")), col("f.anc") === col("pa.c"))
        .select(col("f.node").as("node"), col("pa.p").as("anc"))
      closure = closure.union(frontier)
    }
    ordered(
      closure.join(nodes.select(col("node").as("n2"), col("cents")),
          col("node") === col("n2"))
        .groupBy("anc")
        .agg(sum("cents").as("subtree_cents"),
          (count(lit(1)) - 1).cast("bigint").as("n_desc"))
        .select((col("anc") - 1).as("p_partkey"), col("subtree_cents"),
          col("n_desc")),
      "p_partkey")
  }

  // ---------------------------------------------------------------- op181

  /** op181: static salted skew join — the join-side twin of op40's
    * salted aggregation: the big side gets a deterministic salt in
    * [0, R), the small side is replicated R ways (explode over the
    * salt range), and the join key becomes (key, salt) — a hot key's
    * rows land on R reducers instead of one. Result provably equals
    * the plain join (verified by the oracle, which spells the PLAIN
    * join); here it feeds a revenue-per-nation rollup.
    *
    * 100 TB shape: AQE's skew-join split handles most cases at
    * runtime; static salting is the escape hatch where AQE can't
    * split (stateful streaming joins, bucketed-table SMJs that must
    * not re-shuffle) — cost is R× the small side (still broadcast-
    * sized), benefit is the straggler cap. Salt is a hash of the
    * row's unique id, so re-runs and AQE re-plans partition
    * identically. */
  val op181SaltedJoin: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_suppkey"),
        round(col("l_extendedprice") * 100, 0).cast("long").as("cents"))
      .withColumn("salt",
        Skew.salt(concat_ws(":", col("l_orderkey"), col("l_linenumber")),
          saltR))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
      .crossJoin(s.range(0, saltR).toDF("salt2"))
    ordered(
      li.join(sup, col("l_suppkey") === col("s_suppkey") &&
          col("salt") === col("salt2"))
        .groupBy(big(col("s_nationkey")).as("nation"))
        .agg(sum("cents").as("revenue_cents"), count(lit(1)).as("n")),
      "nation")
  }

  // ---------------------------------------------------------------- op182

  /** op182: last-touch attribution — every purchase is credited to the
    * user's most recent NON-purchase event within 7 days (else
    * 'organic'); credit counts and purchase value roll up per touch
    * type. One union-free pass: two last(..., ignoreNulls) windows
    * over the user's (ts, id)-ordered history, frame ending at the
    * PREVIOUS row — both windows read the same last non-purchase row,
    * so (type, ts) stay consistent without a struct.
    *
    * 100 TB shape: one Exchange on user_id, one sort, state = the
    * last touch seen — the op173/op105 single-sort family; the
    * attribution-window predicate is a row-local comparison. Contrast
    * with the self-join spelling (purchases × events range join) the
    * oracle could have used: that shuffles the event log twice and
    * fans out per purchase. */
  val op182Attribution: Q = (s, d) => {
    val evDf = Tables.events(s, d)
    val ev = evDf.select(col("event_id"), col("user_id"),
      col("event_type"), Tables.tsUsExpr(evDf).as("us"))
    val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val touchTs = last(when(col("event_type") =!= "purchase", col("us")),
      ignoreNulls = true).over(w)
    val touchTy = last(when(col("event_type") =!= "purchase",
      col("event_type")), ignoreNulls = true).over(w)
    ordered(
      ev.withColumn("t_us", touchTs).withColumn("t_ty", touchTy)
        .where(col("event_type") === "purchase")
        .select(
          when(col("t_us").isNotNull &&
            col("us") - col("t_us") <= attrWindowUs, col("t_ty"))
            .otherwise(lit("organic")).as("touch"))
        .groupBy("touch")
        .agg(count(lit(1)).as("n_purchases")),
      "touch")
  }

  // ---------------------------------------------------------------- op183

  /** op183: chi-square independence grid — observed vs expected counts
    * for (market segment × order priority), entirely in exact
    * fixed-point: E_milli = R·C·10³ div T, cell statistic =
    * (O·10³ − E_milli)² div E_milli (milli-units). The classic
    * "are these two dimensions independent" audit an experimentation
    * or data-quality pipeline runs over categorical pairs.
    *
    * 100 TB shape: one map-combinable (seg × prio) count aggregate —
    * the whole computation after it runs on the |seg|·|prio| grid
    * (25 cells) with broadcast margins. The milli scale is chosen so
    * the squared deviation stays inside BIGINT through sf1
    * (O ≤ 1.5e6 → (O·10³)² ≤ 2.25e18 < 2⁶³); beyond that the margins
    * stay exact integers and only the cell statistic drops to the
    * double approximation. */
  val op183Chisq: Q = (s, d) => {
    val cells = Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment").as("seg"),
        col("o_orderpriority").as("prio"))
      .agg(count(lit(1)).as("o"))
    val wAll = Window.partitionBy()
    val g = cells
      .withColumn("r", sum("o").over(Window.partitionBy("seg")))
      .withColumn("c", sum("o").over(Window.partitionBy("prio")))
      .withColumn("t", sum("o").over(wAll))
      .withColumn("e_milli", expr(s"(r * c * $chiScale) div t"))
      .withColumn("chi_milli",
        expr(s"((o * $chiScale - e_milli) * (o * $chiScale - e_milli)) " +
          "div e_milli"))
    ordered(
      g.select(col("seg"), col("prio"), col("o"), col("e_milli"),
        col("chi_milli")),
      "seg", "prio")
  }

  // ---------------------------------------------------------------- op188

  /** op188: SCD2 point-in-time lookup — the Kimball dimension join:
    * every purchase event reads the version of its user's view-value
    * dimension (op128's [[graft.ops.Scd.history]] over 'view' events)
    * that was valid AT THE PURCHASE INSTANT: equi-join on user_id +
    * the interval predicate valid_from ≤ t < valid_to (open version:
    * valid_to = −1). Purchases before the user's first view emit a
    * matched=0 row with −1 fields — the as-of-missing contract.
    *
    * 100 TB shape: hash equi-join on the dimension key with a per-key
    * interval filter — each fact row scans only ITS key's version list
    * (versions per key = change count, small by SCD2 construction).
    * The sort-merge as-of spelling (op36) wins when version lists are
    * long; the hash+filter form wins when they're short — this is the
    * short-list case and the plan has no range-join blowup. */
  val op188PitLookup: Q = (s, d) => {
    val evDf = Tables.events(s, d)
    val ev = evDf.select(col("event_id"), col("user_id"),
      col("event_type"), Tables.tsUsExpr(evDf).as("t_us"),
      col("value"))
    val hist = graft.ops.Scd.history(
      ev.where(col("event_type") === "view"), Seq("user_id"), "t_us",
      "event_id", Det.bp4(col("value")))
      .select(col("user_id").as("h_uid"), col("ver"),
        col("value").as("view_bp"), col("valid_from"), col("valid_to"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select("event_id", "user_id", "t_us")
    ordered(
      purchases.join(hist,
          col("user_id") === col("h_uid") &&
          col("t_us") >= col("valid_from") &&
          (col("valid_to") === -1L || col("t_us") < col("valid_to")),
          "left")
        .select(col("event_id"), col("user_id"), col("t_us"),
          coalesce(col("ver"), lit(-1L)).as("ver"),
          coalesce(col("view_bp"), lit(-1L)).as("view_bp"),
          expr("CAST(CASE WHEN ver IS NULL THEN 0 ELSE 1 END AS BIGINT)")
            .as("matched")),
      "event_id")
  }

  // ---------------------------------------------------------------- op195

  /** op195: rank bin width for the grid lookup. */
  private val qnBin = 64L

  /** op195: quantile normalization — every document's length is
    * replaced by the POOLED corpus value at its within-language
    * relative rank (nearest-rank), so each language's distribution
    * maps onto the pooled one: the batch-effect-correction /
    * cross-source feature alignment primitive, entirely in exact
    * integers. Per-language rank rn of n, pooled target rank
    * r = ceil(rn·N/n), normalized value = min pooled v with cum ≥ r.
    *
    * 100 TB shape: the rank→value lookup is a range probe into the
    * pooled DISTINCT-VALUE grid — spelled as the op155 binned
    * interval join (grid intervals (prev_cum, cum] explode to ≤
    * len/B+1 covering bins, docs equi-join on bin r div B, exact
    * containment as residual filter), so the plan is a hash join even
    * though the predicate is a range; no nested loop, no global sort
    * of the corpus (per-language windows sort within partitions; the
    * grid walk is |domain|-sized). */
  val op195QuantileNorm: Q = (s, d) => {
    val docs = Tables.documents(s, d).select("doc_id", "lang", "n_chars")
    val wl = Window.partitionBy("lang")
    val ranked = docs
      .withColumn("rn", row_number().over(
        wl.orderBy("n_chars", "doc_id")))
      .withColumn("n", count(lit(1)).over(wl))
      .withColumn("nt", count(lit(1)).over(Window.partitionBy()))
      .withColumn("r", expr("(rn * nt + n - 1) div n"))
      .withColumn("bin", expr(s"r div $qnBin"))
    val grid = graft.ops.Grid.cumWalk(
        docs.groupBy(col("n_chars").as("v"))
          .agg(count(lit(1)).as("cnt")),
        col("v"), Seq("cnt" -> "cum"))
      .withColumn("pcum", col("cum") - col("cnt"))
    val binned = grid.select(col("v"), col("pcum"), col("cum"),
      explode(expr(s"sequence(pcum div $qnBin, cum div $qnBin)"))
        .as("bin"))
    ordered(
      ranked.join(binned, "bin")
        .where(col("r") > col("pcum") && col("r") <= col("cum"))
        .select(col("doc_id"), col("lang"), col("n_chars"),
          col("v").as("norm_chars")),
      "doc_id")
  }

  // ---------------------------------------------------------------- op197

  /** op197: bucket count for the anti-entropy checksums. */
  private val aeBuckets = 16L
  /** op197: per-row hash truncated mod 2⁴⁰ so a bucket's SUM stays in
    * BIGINT through ~10⁷ rows/bucket (order-independent, exact). */
  private val aeRowMod = 1099511627776L // 2^40

  /** op197: anti-entropy bucket checksums — both "replicas" of the
    * documents table (the second with one deterministically dropped
    * row) reduced to per-bucket (row count, order-independent content
    * checksum = Σ row-hash mod 2⁴⁰), compared side by side: exactly
    * one bucket flags. The replication-integrity primitive (Dynamo/
    * Cassandra anti-entropy, storage scrubbing): two 100 TB stores
    * compare by exchanging |buckets| rows, and only flagged buckets
    * pay a row-level diff.
    *
    * 100 TB shape: one map-combinable aggregate per replica (the sum
    * is commutative — no ordering requirement, unlike a rolling
    * digest); bucket count is the resolution/traffic dial, and
    * nesting it (a merkle tree) localizes a mismatch in log rounds.
    * The row hash covers ALL audited columns, so silent value
    * corruption — not just missing rows — flips the checksum. */
  val op197AntiEntropy: Q = (s, d) => {
    def sums(df: DataFrame, nCol: String, cCol: String): DataFrame = df
      .select(col("doc_id"),
        graft.functions.TextOps.md5Hash60(concat_ws("|",
          col("doc_id"), col("lang"), col("source"), col("n_chars")))
          .as("h"))
      .groupBy(expr(s"doc_id % $aeBuckets").as("bucket"))
      .agg(count(lit(1)).as(nCol),
        sum(expr(s"h % $aeRowMod")).as(cCol))
    val a = sums(Tables.documents(s, d), "n_a", "sum_a")
    val b = sums(Tables.documents(s, d).where(col("doc_id") =!= 42),
      "n_b", "sum_b")
      .withColumnRenamed("bucket", "bucket_b")
    ordered(
      a.join(b, col("bucket") === col("bucket_b"))
        .select(col("bucket"), col("n_a"), col("sum_a"), col("n_b"),
          col("sum_b"),
          expr("CAST(CASE WHEN n_a = n_b AND sum_a = sum_b THEN 1 " +
            "ELSE 0 END AS BIGINT)").as("in_sync")),
      "bucket")
  }

  // ---------------------------------------------------------------- op196

  /** op196: ring size / replica count / doc key-space for the
    * consistent-hash demo. */
  private val chNodes = 8
  private val chReplicas = 16

  /** op196: consistent-hash shard assignment + resize diff — documents
    * assigned to the first ring point clockwise of their key (md5-60
    * ring, `chReplicas` virtual points per node), under N and N+1
    * nodes side by side; emits per-shard counts and the moved
    * fraction, which consistent hashing bounds near 1/(N+1) (modulo
    * hashing would move ~N/(N+1) — the whole point). The shard-routing
    * primitive behind every resizable 100 TB store.
    *
    * 100 TB shape: the ring is a ≤ nodes·replicas-point broadcast
    * literal; assignment is a per-row scan of that constant table
    * (exactly how production routers do it) — a broadcast join whose
    * small side is O(128), independent of corpus size. */
  val op196ConsistentHash: Q = (s, d) => {
    def assign(docs: DataFrame, n: Int, outCol: String): DataFrame = {
      val ring = (0 until n).flatMap { node =>
        (0 until chReplicas).map(j => (node.toLong, s"node:$node:$j"))
      }
      val pts = docs.sparkSession.createDataFrame(ring)
        .toDF("shard", "label")
        .select(col("shard"),
          graft.functions.TextOps.md5Hash60(col("label")).as("pt"))
      // first point clockwise of the key, wrapping to the ring minimum;
      // the point→shard resolve is a second broadcast equi-join (min
      // shard on the vanishing chance of a 60-bit point collision —
      // deterministic on both engines either way)
      docs.crossJoin(broadcast(pts))
        .groupBy("doc_id", "key")
        .agg(min(when(col("pt") >= col("key"), col("pt"))).as("fwd"),
          min(col("pt")).as("wrap"))
        .withColumn("apt", coalesce(col("fwd"), col("wrap")))
        .join(broadcast(pts.select(col("pt").as("apt"), col("shard"))),
          "apt")
        .groupBy("doc_id", "key").agg(min("shard").as(outCol))
    }
    val docs = Tables.documents(s, d).select(col("doc_id"),
      graft.functions.TextOps.md5Hash60(
        concat(lit("doc:"), col("doc_id"))).as("key"))
    val a = assign(docs, chNodes, "shard_n")
    val b = assign(docs, chNodes + 1, "shard_n1")
      .select(col("doc_id").as("d2"), col("shard_n1"))
    val both = a.join(b, col("doc_id") === col("d2"))
    ordered(
      both.groupBy("shard_n")
        .agg(count(lit(1)).as("n_docs"),
          sum(expr("CAST(CASE WHEN shard_n <> shard_n1 THEN 1 ELSE 0 " +
            "END AS BIGINT)")).as("n_moved"))
        .withColumn("moved_bp", expr("(n_moved * 10000) div n_docs"))
        .select(big(col("shard_n")).as("shard"), col("n_docs"),
          col("n_moved"), col("moved_bp")),
      "shard")
  }

  // ------------------------------------------------------------- wiring

  // ---------------------------------------------------------------- op212

  /** op212 quantile count. */
  private val rfmQ = 5

  /** op212: RFM segmentation — every ordering customer scored into
    * recency/frequency/monetary quintiles (1 = best: most recent,
    * most orders, highest lifetime cents), emitted as the ≤ 5³ segment
    * grid with sizes, revenue mass, and min-custkey witness. The
    * marketing-warehouse classic (churn targeting, LTV tiers) and the
    * canonical multi-axis-quantile pattern.
    *
    * Scale shape: the heavy step is ONE map-combinable aggregate over
    * orders (last day, count, cents per customer); quintiling then
    * runs over the CUSTOMER DIMENSION, not the fact table — ntile's
    * single-partition sort is over per-customer rows, which is
    * exactly where a dimension-sized sort is the honest spelling.
    * When the entity side outgrows a dimension (per-user scoring at
    * billions), the production escalation is op179's grid-walk
    * boundary computation joined back by range — same integers for
    * distinct-heavy metrics; ntile here keeps the textbook
    * equal-count-remainder-first semantics bit-exact. Reference day
    * is data-derived (max order day) as a broadcast scalar — no
    * wall-clock in the result (the Det rule). */
  /** The shared quintile/segment tail over a per-customer
    * (o_custkey, last_day, frequency, cents) base — op212 feeds it the
    * batch aggregate, op214 the stream-maintained merge; one tail, one
    * oracle. Reference day is max(last_day) (≡ max order day, since
    * every customer's max contributes). */
  private def rfmTail(per: DataFrame): DataFrame = {
    val ref = per.agg(max("last_day").as("ref_day"))
    val rfm = per.crossJoin(broadcast(ref))
      .select(col("o_custkey"),
        (col("ref_day") - col("last_day")).as("recency"),
        col("frequency"), col("cents"))
    val scored = rfm
      .withColumn("r_q", big(ntile(rfmQ).over(
        Window.orderBy(col("recency"), col("o_custkey")))))
      .withColumn("f_q", big(ntile(rfmQ).over(
        Window.orderBy(col("frequency").desc, col("o_custkey")))))
      .withColumn("m_q", big(ntile(rfmQ).over(
        Window.orderBy(col("cents").desc, col("o_custkey")))))
    ordered(
      scored.groupBy("r_q", "f_q", "m_q")
        .agg(big(count(lit(1))).as("n_customers"),
          sum("cents").as("sum_cents"),
          min("o_custkey").as("min_custkey")),
      "r_q", "f_q", "m_q")
  }

  val op212RfmSegments: Q = (s, d) => {
    val ord = Tables.orders(s, d).select(col("o_custkey"),
      big(datediff(to_date(col("o_orderdate")),
        lit("1995-01-01").cast("date"))).as("day"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    rfmTail(ord.groupBy("o_custkey").agg(
      max("day").as("last_day"),
      big(count(lit(1))).as("frequency"),
      sum("cents").as("cents")))
  }

  /** op214: STREAMING RFM — op212's online leg: orders arrive through
    * a 4-batch stream split BY DAY (a customer's history genuinely
    * spans micro-batches), each batch appends per-customer
    * (max day, count, cents) partials, and the serving merge
    * re-aggregates with (max, sum, sum) — all three mergeable
    * summaries, so the maintained base equals the batch aggregate
    * bit-for-bit and the quintile tail runs under op212's UNCHANGED
    * oracle (the op169/op193 stream-≡-batch posture).
    *
    * 100 TB shape: see [[graft.streaming.RfmStream]] — per-batch state
    * bounded by active customers, partials compactable at any cadence;
    * the nightly-quintile deployment reads ONLY the merged base, never
    * the raw order stream. */
  val op214StreamRfm: Q = (s, d) => {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_rfm_state").toString
    rfmTail(graft.streaming.RfmStream.maintainedRfmBase(s, d, stateDir))
  }

  // ---------------------------------------------------------------- op222

  /** op222: incremental join-view maintenance (delta join) — the
    * per-nation customer×orders aggregate maintained as a BASE
    * aggregate plus the three delta legs of the join derivative:
    * Δ(A⋈B) = ΔA⋈B₀ ∪ A₀⋈ΔB ∪ ΔA⋈ΔB (deltas: the o_orderkey%7=3
    * order slice and the c_custkey%5=2 customer slice). Each leg is
    * aggregated and the per-key merge is a sum — the materialized-view
    * maintenance identity every warehouse refresh engine (Delta MVs,
    * Snowflake dynamic tables) rests on. The ORACLE computes the plain
    * full join-aggregate: the hash gate IS the proof the decomposition
    * loses and double-counts nothing.
    *
    * 100 TB shape: refresh cost is O(Δ⋈) — each delta leg joins a
    * small (broadcast) delta against one base side — never a full
    * rejoin; the merge touches only keys the deltas produced. Sums
    * and counts are self-mergeable; MIN/MAX under deletes need the
    * op143 tombstone machinery instead (declared boundary). */
  val op222DeltaJoin: Q = (s, d) => {
    val cust = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val ord = Tables.orders(s, d).select(col("o_custkey"),
      col("o_orderkey"),
      round(col("o_totalprice") * 100, 0).cast("long").as("cents"))
    val custBase = cust.where(col("c_custkey") % 5 =!= 2)
    val custDelta = cust.where(col("c_custkey") % 5 === 2)
    val ordBase = ord.where(col("o_orderkey") % 7 =!= 3)
    val ordDelta = ord.where(col("o_orderkey") % 7 === 3)
    def leg(c: DataFrame, o: DataFrame): DataFrame =
      c.join(o, col("c_custkey") === col("o_custkey"))
        .groupBy("c_nationkey")
        .agg(big(count(lit(1))).as("n_orders"),
          sum("cents").as("sum_cents"))
    // the delta side broadcasts in every leg — refresh traffic is
    // O(Δ), the base never re-shuffles
    val merged = leg(custBase, ordBase)
      .unionByName(leg(broadcast(custDelta), ordBase)
        .unionByName(leg(custBase, broadcast(ordDelta)))
        .unionByName(leg(broadcast(custDelta), ordDelta)))
      .groupBy("c_nationkey")
      .agg(sum("n_orders").as("n_orders"),
        sum("sum_cents").as("sum_cents"))
    ordered(merged, "c_nationkey")
  }

  /** op223: STREAMING join-view maintenance — op222's refresh identity
    * made continuous: order facts stream in, each micro-batch joins
    * against the broadcast customer dimension and appends a per-nation
    * partial; the merge sums. Join-then-aggregate distributes over the
    * batch partition, so the view is bit-equal to the full batch
    * join-aggregate — op222's UNCHANGED oracle.
    * See [[graft.streaming.DimJoinStream]]. */
  val op223StreamDimJoin: Q = (s, d) => {
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_dimjoin_state").toString
    ordered(graft.streaming.DimJoinStream
      .maintainedJoinView(s, d, stateDir), "c_nationkey")
  }

  /** op254's profiled numeric columns, as (name, exact-integer expr). */
  private val corrCols = Seq(
    "l_quantity" -> "CAST(l_quantity AS BIGINT)",
    "l_extendedprice" -> "CAST(round(l_extendedprice * 100) AS BIGINT)",
    "l_discount" -> "CAST(round(l_discount * 100) AS BIGINT)",
    "l_tax" -> "CAST(round(l_tax * 100) AS BIGINT)")

  // ---------------------------------------------------------------- op254

  /** op254: numeric correlation matrix — pairwise Pearson r (bp)
    * between lineitem's four numeric columns in ONE corpus pass: all
    * 14 moment sums (per-column Σx, Σx² and the 6 cross Σxy) land in
    * a single aggregate as DECIMAL(38,0) — cents-exact integers, so
    * the sums match DuckDB's int128 bit-for-bit at any row count where
    * BIGINT Σx² would overflow — and the 6 pairs assemble from that
    * one row via stack(). The ratio runs in doubles under the op192
    * SHARED-TEXT contract (conversion, ×, /, sqrt, floor are
    * IEEE-identical on identical integers). The profiling pass an
    * optimizer (or a feature-selection job) reads before trusting
    * column independence.
    *
    * 100 TB shape: one map-combinable aggregate over the corpus; the
    * matrix assembly is algebra on a single row. Adding a column adds
    * sums to the SAME pass, never another scan. */
  val op254CorrMatrix: Q = (s, d) => {
    val cs = corrCols
    val sums =
      cs.map { case (n, e) =>
        sum(expr(s"CAST($e AS DECIMAL(38,0))")).as(s"s_$n") } ++
      cs.map { case (n, e) =>
        sum(expr(s"CAST(($e) * ($e) AS DECIMAL(38,0))")).as(s"ss_$n") } ++
      cs.combinations(2).toSeq.map { case Seq((nx, ex), (ny, ey)) =>
        sum(expr(s"CAST(($ex) * ($ey) AS DECIMAL(38,0))"))
          .as(s"sp_${nx}_$ny") }
    val a = Tables.lineitem(s, d)
      .agg(count(lit(1)).as("n"), sums: _*)
    val pairs = cs.combinations(2).toSeq.map { case Seq((nx, _), (ny, _)) =>
      s"'$nx', '$ny', n * sp_${nx}_$ny - s_$nx * s_$ny, " +
        s"n * ss_$nx - s_$nx * s_$nx, n * ss_$ny - s_$ny * s_$ny"
    }.mkString(", ")
    ordered(
      a.selectExpr(s"n", s"stack(${cs.combinations(2).size}, $pairs) " +
          "AS (col_x, col_y, num, dx, dy)")
        .selectExpr("col_x", "col_y", "CAST(n AS BIGINT) AS n",
          """CAST(floor(CAST(num AS DOUBLE) /
            |  (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE)))
            |  * 10000) AS BIGINT) AS r_bp""".stripMargin),
      "col_x", "col_y")
  }

  /** op258's audited foreign-key edges: (child, fk col, parent, pk). */
  private val fkEdges = Seq(
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"))

  // ---------------------------------------------------------------- op258

  /** op258: referential-integrity audit — every declared FK edge of
    * the star schema checked in one report: child rows, orphans
    * (including NULL keys — a NULL FK never joins, so it IS a
    * referential gap for inner-join consumers), and coverage bp. The
    * pre-join data-quality gate: a join that silently drops 3% of
    * facts is a metrics bug dressed as a join; this measures it
    * BEFORE the dashboards disagree.
    *
    * 100 TB shape: each edge is one left anti-join ON THE DISTINCT
    * child keys (the orphan question is per-key, so the corpus
    * collapses to key cardinality first and the per-key orphan count
    * re-weights by key multiplicity) against a broadcast-sized parent
    * key set — dims broadcast, the fact table is never shuffled. */
  val op258FkAudit: Q = (s, d) => {
    val frames = fkEdges.map { case (child, fk, parent, pk) =>
      val keys = Tables.table(s, d, child)
        .groupBy(col(fk).as("k")).agg(count(lit(1)).as("m"))
      val orphans = keys.join(
          broadcast(Tables.table(s, d, parent)
            .select(col(pk).as("k")).distinct()),
          Seq("k"), "left_anti")
        .agg(coalesce(sum("m"), lit(0L)).as("n_orphans"))
      val totals = Tables.table(s, d, child)
        .agg(count(lit(1)).as("n_child"))
      totals.crossJoin(orphans).select(
        lit(child).as("child_table"), lit(fk).as("fk_col"),
        lit(parent).as("parent_table"),
        big(col("n_child")).as("n_child"),
        big(col("n_orphans")).as("n_orphans"),
        expr("((n_child - n_orphans) * 10000) div n_child")
          .as("coverage_bp"))
    }
    ordered(frames.reduce(_ unionByName _), "child_table", "fk_col")
  }

  // ---------------------------------------------------------------- op278

  /** op278: out-of-fold target encoding — each (category, fold) cell
    * gets the category's mean target computed EXCLUDING that fold
    * ((S_c − S_cf) / (n_c − n_cf), exact cents, one shared-contract
    * double division to bp): the leakage-safe categorical encoding
    * every tabular pipeline needs — a row never sees its own target
    * through its encoding, which is exactly the guarantee op92's
    * split-leak gate checks for documents, now produced by
    * construction for features. Fold = o_orderkey % 5: deterministic,
    * reproducible, and the same fold a retrain re-derives.
    *
    * 100 TB shape: ONE pass builds the (category, fold) moment grid
    * (map-combinable); every out-of-fold mean is grid algebra — the
    * complement trick from op268, per fold. The naive spelling
    * (re-aggregate the corpus once per fold) is |folds| scans; this is
    * one. */
  val op278TargetEncoding: Q = (s, d) => {
    val base = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("category"),
        expr("o_orderkey % 5").as("fold"))
      .agg(count(lit(1)).as("n_cf"),
        Det.centsSum(col("o_totalprice")).as("s_cf"))
    val tot = base.groupBy("category")
      .agg(sum("n_cf").as("n_c"), sum("s_cf").as("s_c"))
    ordered(
      base.join(broadcast(tot), "category")
        .select(col("category"), big(col("fold")).as("fold"),
          big(col("n_cf")).as("n_rows"),
          // a category whose rows all land in one fold has no
          // out-of-fold rows: the encoding is undefined → NULL in BOTH
          // engines (not Spark's NaN→0 cast vs DuckDB's cast error)
          when(col("n_c") === col("n_cf"), lit(null).cast("bigint"))
            .otherwise(meanBpFromCents(col("s_c") - col("s_cf"),
              col("n_c") - col("n_cf"))).as("enc_bp")),
      "category", "fold")
  }

  val defs: Map[String, Q] = Map(
    "op278_target_encoding" -> op278TargetEncoding,
    "op258_fk_audit" -> op258FkAudit,
    "op254_corr_matrix" -> op254CorrMatrix,
    "op212_rfm_segments" -> op212RfmSegments,
    "op214_stream_rfm" -> op214StreamRfm,
    "op222_delta_join" -> op222DeltaJoin,
    "op223_stream_dim_join" -> op223StreamDimJoin,
    "op179_range_boundaries" -> op179RangeBoundaries,
    "op180_tree_rollup" -> op180TreeRollup,
    "op181_salted_join" -> op181SaltedJoin,
    "op182_attribution" -> op182Attribution,
    "op183_chisq" -> op183Chisq,
    "op188_pit_lookup" -> op188PitLookup,
    "op195_quantile_norm" -> op195QuantileNorm,
    "op196_consistent_hash" -> op196ConsistentHash,
    "op197_anti_entropy" -> op197AntiEntropy)

  /** op212's oracle — shared verbatim by op214 (stream ≡ batch). */
  private val rfmSql: String =
      s"""WITH ord AS (
         |  SELECT o_custkey,
         |    date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
         |      AS day,
         |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
         |  FROM orders),
         |per AS (
         |  SELECT o_custkey, max(day) AS last_day,
         |    CAST(count(*) AS BIGINT) AS frequency,
         |    CAST(sum(cents) AS BIGINT) AS cents
         |  FROM ord GROUP BY 1),
         |ref AS (SELECT max(day) AS ref_day FROM ord),
         |rfm AS (
         |  SELECT o_custkey, ref_day - last_day AS recency,
         |    frequency, cents
         |  FROM per CROSS JOIN ref),
         |scored AS (
         |  SELECT o_custkey, cents,
         |    ntile($rfmQ) OVER (ORDER BY recency, o_custkey) AS r_q,
         |    ntile($rfmQ) OVER (ORDER BY frequency DESC, o_custkey) AS f_q,
         |    ntile($rfmQ) OVER (ORDER BY cents DESC, o_custkey) AS m_q
         |  FROM rfm)
         |SELECT CAST(r_q AS BIGINT) AS r_q, CAST(f_q AS BIGINT) AS f_q,
         |  CAST(m_q AS BIGINT) AS m_q,
         |  CAST(count(*) AS BIGINT) AS n_customers,
         |  CAST(sum(cents) AS BIGINT) AS sum_cents,
         |  min(o_custkey) AS min_custkey
         |FROM scored GROUP BY 1, 2, 3
         |ORDER BY r_q, f_q, m_q""".stripMargin

  /** op222's oracle — the PLAIN full join-aggregate (the hash gate
    * proves the delta decomposition exact); shared by op223, whose
    * streaming maintenance must emit the identical view. */
  private val deltaJoinSql: String =
      """SELECT c_nationkey,
        |  CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1 ORDER BY c_nationkey""".stripMargin

  /** op254's oracle: one aggregate CTE (DuckDB sums BIGINT products
    * into int128 — the same exact integers as Spark's DECIMAL(38,0)),
    * six UNION'd pair rows, the identical double ratio. */
  private lazy val corrMatrixSql: String = {
    val aggs = (corrCols.map { case (n, e) =>
      s"CAST(sum($e) AS HUGEINT) AS s_$n" } ++
      corrCols.map { case (n, e) =>
        s"CAST(sum(($e) * ($e)) AS HUGEINT) AS ss_$n" } ++
      corrCols.combinations(2).toSeq.map { case Seq((nx, ex), (ny, ey)) =>
        s"CAST(sum(($ex) * ($ey)) AS HUGEINT) AS sp_${nx}_$ny" })
      .mkString(",\n  ")
    val rows = corrCols.combinations(2).toSeq.map {
      case Seq((nx, _), (ny, _)) =>
        s"""SELECT '$nx' AS col_x, '$ny' AS col_y,
           |  CAST(n AS BIGINT) AS n,
           |  CAST(floor(CAST(n * sp_${nx}_$ny - s_$nx * s_$ny AS DOUBLE) /
           |    (sqrt(CAST(n * ss_$nx - s_$nx * s_$nx AS DOUBLE)) *
           |     sqrt(CAST(n * ss_$ny - s_$ny * s_$ny AS DOUBLE)))
           |    * 10000) AS BIGINT) AS r_bp
           |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"WITH a AS (\n  SELECT count(*) AS n,\n  $aggs\n  FROM lineitem)\n" +
      s"$rows\nORDER BY col_x, col_y"
  }

  /** op258's oracle: one NOT-IN-free block per FK edge (orphans via a
    * key-grid anti semantics — NULL keys count as orphans). */
  private lazy val fkAuditSql: String = {
    val blocks = fkEdges.map { case (child, fk, parent, pk) =>
      s"""SELECT '$child' AS child_table, '$fk' AS fk_col,
         |  '$parent' AS parent_table,
         |  CAST((SELECT count(*) FROM $child) AS BIGINT) AS n_child,
         |  CAST(coalesce((
         |    SELECT sum(m) FROM (
         |      SELECT $fk AS k, count(*) AS m FROM $child GROUP BY 1) c
         |    WHERE c.k IS NULL OR c.k NOT IN
         |      (SELECT $pk FROM $parent WHERE $pk IS NOT NULL)), 0)
         |    AS BIGINT) AS n_orphans""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""SELECT child_table, fk_col, parent_table, n_child, n_orphans,
       |  CAST(((n_child - n_orphans) * 10000) // n_child AS BIGINT)
       |    AS coverage_bp
       |FROM ($blocks)
       |ORDER BY child_table, fk_col""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "op278_target_encoding" ->
      """WITH base AS (
        |  SELECT o_orderpriority AS category,
        |    CAST(o_orderkey % 5 AS BIGINT) AS fold,
        |    CAST(count(*) AS BIGINT) AS n_cf,
        |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
        |      AS s_cf
        |  FROM orders GROUP BY 1, 2),
        |tot AS (
        |  SELECT category, CAST(sum(n_cf) AS BIGINT) AS n_c,
        |    CAST(sum(s_cf) AS BIGINT) AS s_c
        |  FROM base GROUP BY 1)
        |SELECT b.category, b.fold, b.n_cf AS n_rows,
        |  CASE WHEN t.n_c = b.n_cf THEN CAST(NULL AS BIGINT)
        |    ELSE CAST(CAST(CAST(t.s_c - b.s_cf AS DOUBLE) /
        |      CAST((t.n_c - b.n_cf) * 100 AS DOUBLE) AS DECIMAL(18,4))
        |      * 10000 AS BIGINT) END AS enc_bp
        |FROM base b JOIN tot t USING (category)
        |ORDER BY category, fold""".stripMargin,
    "op258_fk_audit" -> fkAuditSql,
    "op254_corr_matrix" -> corrMatrixSql,
    "op222_delta_join" -> deltaJoinSql,
    "op223_stream_dim_join" -> deltaJoinSql,
    "op212_rfm_segments" -> rfmSql,
    // op214 is op212 maintained online; the shared oracle is the proof
    // the stream's mergeable partials change no emitted integer
    "op214_stream_rfm" -> rfmSql,
    "op179_range_boundaries" ->
      s"""WITH grid AS (
         |  SELECT n_chars AS v, count(*) AS cnt FROM documents
         |  GROUP BY 1),
         |cum AS (
         |  SELECT v, cnt, sum(cnt) OVER (ORDER BY v) AS cum,
         |    sum(cnt) OVER () AS n
         |  FROM grid),
         |targets AS (SELECT unnest(range(1, ${rbK + 1})) AS i)
         |SELECT i,
         |  CAST((i * any_value(n) + ${rbK - 1}) // $rbK AS BIGINT)
         |    AS target_rank,
         |  min(v) AS boundary,
         |  CAST(min_by(cum, v) AS BIGINT) AS cum_at_boundary
         |FROM targets, cum
         |WHERE cum >= (i * n + ${rbK - 1}) // $rbK
         |GROUP BY i
         |ORDER BY i""".stripMargin,
    "op180_tree_rollup" ->
      """WITH RECURSIVE nodes AS (
        |  SELECT p_partkey + 1 AS node,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS cents
        |  FROM part),
        |anc AS (
        |  SELECT node, node AS anc FROM nodes
        |  UNION ALL
        |  SELECT node, anc // 2 FROM anc WHERE anc >= 2)
        |SELECT a.anc - 1 AS p_partkey,
        |  CAST(sum(n.cents) AS BIGINT) AS subtree_cents,
        |  CAST(count(*) - 1 AS BIGINT) AS n_desc
        |FROM anc a JOIN nodes n USING (node)
        |GROUP BY 1
        |ORDER BY p_partkey""".stripMargin,
    "op181_salted_join" ->
      """SELECT CAST(s_nationkey AS BIGINT) AS nation,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
        |       AS BIGINT) AS revenue_cents,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
        |GROUP BY 1
        |ORDER BY nation""".stripMargin,
    "op182_attribution" ->
      s"""WITH ev AS (
         |  SELECT event_id, user_id, event_type, epoch_us(ts) AS us
         |  FROM events),
         |h AS (
         |  SELECT *,
         |    last_value(CASE WHEN event_type <> 'purchase' THEN us END
         |      IGNORE NULLS) OVER (PARTITION BY user_id
         |        ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS t_us,
         |    last_value(CASE WHEN event_type <> 'purchase'
         |        THEN event_type END
         |      IGNORE NULLS) OVER (PARTITION BY user_id
         |        ORDER BY us, event_id
         |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS t_ty
         |  FROM ev)
         |SELECT CASE WHEN t_us IS NOT NULL AND us - t_us <= $attrWindowUs
         |    THEN t_ty ELSE 'organic' END AS touch,
         |  CAST(count(*) AS BIGINT) AS n_purchases
         |FROM h WHERE event_type = 'purchase'
         |GROUP BY 1
         |ORDER BY touch""".stripMargin,
    "op197_anti_entropy" ->
      s"""WITH rows_ AS (
         |  SELECT doc_id, doc_id % $aeBuckets AS bucket,
         |    ('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|' ||
         |      lang || '|' || source || '|' ||
         |      CAST(n_chars AS VARCHAR)), 1, 15))::BIGINT % $aeRowMod
         |      AS hm
         |  FROM documents),
         |a AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_a,
         |        CAST(sum(hm) AS BIGINT) AS sum_a
         |      FROM rows_ GROUP BY 1),
         |b AS (SELECT bucket, CAST(count(*) AS BIGINT) AS n_b,
         |        CAST(sum(hm) AS BIGINT) AS sum_b
         |      FROM rows_ WHERE doc_id <> 42 GROUP BY 1)
         |SELECT a.bucket, a.n_a, a.sum_a, b.n_b, b.sum_b,
         |  CAST(CASE WHEN a.n_a = b.n_b AND a.sum_a = b.sum_b THEN 1
         |       ELSE 0 END AS BIGINT) AS in_sync
         |FROM a JOIN b USING (bucket)
         |ORDER BY bucket""".stripMargin,
    "op195_quantile_norm" ->
      """WITH docs AS (SELECT doc_id, lang, n_chars FROM documents),
        |ranked AS (
        |  SELECT doc_id, lang, n_chars,
        |    row_number() OVER (PARTITION BY lang
        |      ORDER BY n_chars, doc_id) AS rn,
        |    count(*) OVER (PARTITION BY lang) AS n,
        |    count(*) OVER () AS nt
        |  FROM docs),
        |r2 AS (SELECT *, (rn * nt + n - 1) // n AS r FROM ranked),
        |grid AS (
        |  SELECT v, cnt, cum, cum - cnt AS pcum FROM (
        |    SELECT n_chars AS v, count(*) AS cnt,
        |      sum(count(*)) OVER (ORDER BY n_chars) AS cum
        |    FROM docs GROUP BY 1))
        |SELECT d.doc_id, d.lang, d.n_chars, g.v AS norm_chars
        |FROM r2 d JOIN grid g ON d.r > g.pcum AND d.r <= g.cum
        |ORDER BY doc_id""".stripMargin,
    "op196_consistent_hash" ->
      s"""WITH docs AS (
         |  SELECT doc_id,
         |    ('0x' || substring(md5('doc:' || CAST(doc_id AS VARCHAR)),
         |     1, 15))::BIGINT AS key
         |  FROM documents),
         |pa AS (
         |  SELECT CAST(node AS BIGINT) AS shard,
         |    ('0x' || substring(md5('node:' || CAST(node AS VARCHAR)
         |     || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT AS pt
         |  FROM (SELECT unnest(range(0, $chNodes)) AS node),
         |       (SELECT unnest(range(0, $chReplicas)) AS j)),
         |pb AS (
         |  SELECT CAST(node AS BIGINT) AS shard,
         |    ('0x' || substring(md5('node:' || CAST(node AS VARCHAR)
         |     || ':' || CAST(j AS VARCHAR)), 1, 15))::BIGINT AS pt
         |  FROM (SELECT unnest(range(0, ${chNodes + 1})) AS node),
         |       (SELECT unnest(range(0, $chReplicas)) AS j)),
         |aa AS (
         |  SELECT d.doc_id, d.key,
         |    coalesce(min(CASE WHEN p.pt >= d.key THEN p.pt END),
         |      min(p.pt)) AS apt
         |  FROM docs d, pa p GROUP BY 1, 2),
         |a2 AS (
         |  SELECT x.doc_id, min(p.shard) AS shard_n
         |  FROM aa x JOIN pa p ON x.apt = p.pt GROUP BY 1),
         |bb AS (
         |  SELECT d.doc_id, d.key,
         |    coalesce(min(CASE WHEN p.pt >= d.key THEN p.pt END),
         |      min(p.pt)) AS apt
         |  FROM docs d, pb p GROUP BY 1, 2),
         |b2 AS (
         |  SELECT x.doc_id, min(p.shard) AS shard_n1
         |  FROM bb x JOIN pb p ON x.apt = p.pt GROUP BY 1)
         |SELECT a.shard_n AS shard,
         |  CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(CASE WHEN a.shard_n <> b.shard_n1 THEN 1 ELSE 0 END)
         |       AS BIGINT) AS n_moved,
         |  CAST(sum(CASE WHEN a.shard_n <> b.shard_n1 THEN 1 ELSE 0 END)
         |       AS BIGINT) * 10000 // CAST(count(*) AS BIGINT)
         |    AS moved_bp
         |FROM a2 a JOIN b2 b USING (doc_id)
         |GROUP BY 1
         |ORDER BY shard""".stripMargin,
    "op188_pit_lookup" ->
      """WITH ev AS (
        |  SELECT event_id, user_id, event_type, epoch_us(ts) AS t_us,
        |    value
        |  FROM events),
        |base AS (
        |  SELECT user_id, t_us, event_id,
        |    CAST(CAST(value AS DECIMAL(38,4)) * 10000 AS BIGINT)
        |      AS view_bp
        |  FROM ev WHERE event_type = 'view'),
        |flg AS (
        |  SELECT *, lag(view_bp) OVER w AS prev,
        |    row_number() OVER w AS rn
        |  FROM base WINDOW w AS (PARTITION BY user_id
        |                         ORDER BY t_us, event_id)),
        |chg AS (SELECT * FROM flg
        |        WHERE rn = 1 OR prev IS DISTINCT FROM view_bp),
        |hist AS (
        |  SELECT user_id AS h_uid,
        |    CAST(row_number() OVER w AS BIGINT) AS ver, view_bp,
        |    t_us AS valid_from,
        |    coalesce(lead(t_us) OVER w, -1) AS valid_to
        |  FROM chg WINDOW w AS (PARTITION BY user_id
        |                        ORDER BY t_us, event_id))
        |SELECT p.event_id, p.user_id, p.t_us,
        |  coalesce(h.ver, -1) AS ver,
        |  coalesce(h.view_bp, -1) AS view_bp,
        |  CAST(CASE WHEN h.ver IS NULL THEN 0 ELSE 1 END AS BIGINT)
        |    AS matched
        |FROM (SELECT event_id, user_id, t_us FROM ev
        |      WHERE event_type = 'purchase') p
        |LEFT JOIN hist h ON p.user_id = h.h_uid
        |  AND p.t_us >= h.valid_from
        |  AND (h.valid_to = -1 OR p.t_us < h.valid_to)
        |ORDER BY event_id""".stripMargin,
    "op183_chisq" ->
      s"""WITH cells AS (
         |  SELECT c_mktsegment AS seg, o_orderpriority AS prio,
         |    CAST(count(*) AS BIGINT) AS o
         |  FROM orders JOIN customer ON o_custkey = c_custkey
         |  GROUP BY 1, 2),
         |g AS (
         |  SELECT seg, prio, o,
         |    CAST(sum(o) OVER (PARTITION BY seg) AS BIGINT) AS r,
         |    CAST(sum(o) OVER (PARTITION BY prio) AS BIGINT) AS c,
         |    CAST(sum(o) OVER () AS BIGINT) AS t
         |  FROM cells)
         |SELECT seg, prio, o,
         |  (r * c * $chiScale) // t AS e_milli,
         |  ((o * $chiScale - (r * c * $chiScale) // t) *
         |   (o * $chiScale - (r * c * $chiScale) // t))
         |    // ((r * c * $chiScale) // t) AS chi_milli
         |FROM g
         |ORDER BY seg, prio""".stripMargin)
}
