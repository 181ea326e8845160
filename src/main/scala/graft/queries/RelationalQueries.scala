package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables
import Det.{big, bp4, meanBpFromCents, ordered}

/** Relational operator pack (SURVEY.md §2.4 OP-31..35, §2.5 OP-40..50).
  *
  * Each query is a deliberately plan-shaped exercise of one operator family
  * over the TPC-H-ish fixtures, with a DuckDB oracle twin. Scale notes are
  * on each query: which side shuffles, what broadcasts, what pushes down.
  */
object RelationalQueries {
  type Q = (SparkSession, String) => DataFrame

  // ---------------------------------------------------------------- joins

  /** OP-31 inner equi-join chain with small-dim broadcasts: revenue per
    * region/nation. customer⨝nation⨝region are broadcastable dims; the
    * only shuffle is the final aggregate on (r_name, n_name) — at 100 TB
    * orders is the fact side and never re-partitions for the dim joins. */
  val op31JoinInner: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    ordered(
      o.join(c, o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(big(count(lit(1))).as("n_orders"),
             // exact decimal sum: ~1e10 totals exceed double's 4th-decimal
             // stability under partition-order-dependent accumulation
             bp4(sum(col("o_totalprice").cast("decimal(18,2)"))).as("revenue")),
      "r_name", "n_name")
  }

  /** OP-31 left outer join: order counts per customer including
    * zero-order customers (null-side preserved, coalesced). */
  val op31JoinLeft: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    ordered(
      c.join(o, c("c_custkey") === o("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(big(count(col("o_orderkey"))).as("n_orders"),
             bp4(coalesce(sum(col("o_totalprice").cast("decimal(18,2)")),
               lit(0))).as("total")),
      "c_custkey")
  }

  /** OP-32 left-semi: customers having at least one big order (EXISTS). */
  val op32SemiJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val big_orders = Tables.orders(s, d).filter(col("o_totalprice") > 50000)
    ordered(
      c.join(big_orders, c("c_custkey") === big_orders("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name")),
      "c_custkey")
  }

  /** OP-32 left-anti: customers with no orders at all (NOT EXISTS). */
  val op32AntiJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    ordered(
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name")),
      "c_custkey")
  }

  /** OP-33 explicit broadcast-hint join: nation (25 rows, broadcast) into
    * customer; no shuffle on the fact side at any scale. */
  val op33BroadcastJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    ordered(
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        // cents-trick mean: avg(double) accumulates in partition order and
        // can cross the bp quantization boundary at scale — sum exact
        // integer cents, then one deterministic double division
        .agg(big(count(lit(1))).as("n_customers"),
             Det.centsSum(col("c_acctbal")).as("__cents"))
        .select(col("n_name"), col("n_customers"),
          meanBpFromCents(col("__cents"), col("n_customers")).as("avg_bal")),
      "n_name")
  }

  /** OP-34 range (theta) join: bucket customers by acctbal into ranges
    * derived from region keys. Non-equi predicate ⇒ BroadcastNestedLoopJoin
    * with the 5-row bounds side broadcast — the right plan at any scale. */
  val op34RangeJoin: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val bounds = Tables.region(s, d).select(
      col("r_regionkey").cast("bigint").as("bucket"),
      (col("r_regionkey").cast("bigint") * 2000).cast("double").as("lo"),
      ((col("r_regionkey").cast("bigint") + 1) * 2000).cast("double").as("hi"))
    ordered(
      c.join(broadcast(bounds),
          c("c_acctbal") >= bounds("lo") && c("c_acctbal") < bounds("hi"))
        .groupBy(col("bucket"))
        .agg(big(count(lit(1))).as("n_customers")),
      "bucket")
  }

  /** OP-35 cross join: small×small cartesian (5×25). */
  val op35CrossJoin: Q = (s, d) => {
    val r = Tables.region(s, d).select(col("r_name"))
    val n = Tables.nation(s, d).select(col("n_name"))
    ordered(r.crossJoin(n), "r_name", "n_name")
  }

  // ----------------------------------------------------------- aggregates

  /** OP-40 hash aggregate, TPC-H Q1 shape: map-side partial aggregation on
    * (returnflag, linestatus) — 6 groups, so the shuffle moves ~6 rows per
    * input partition regardless of input size. Date filter pushes to the
    * parquet scan. */
  val op40Agg: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") <= lit("1997-01-01").cast("timestamp_ntz"))
    // money sums reach ~1e9-1e10 at sf0.1+: double accumulation error
    // (partition-order dependent) can exceed the 4th decimal there, so
    // all price sums run in EXACT decimal arithmetic (inputs carry
    // exactly 2 decimals); small-magnitude avgs stay double (error ≪ bp)
    val pd = col("l_extendedprice").cast("decimal(18,2)")
    val dd = col("l_discount").cast("decimal(18,2)")
    val td = col("l_tax").cast("decimal(18,2)")
    ordered(
      li.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          bp4(sum(col("l_quantity").cast("decimal(18,2)"))).as("sum_qty"),
          bp4(sum(pd)).as("sum_base_price"),
          bp4(sum((pd * (lit(1) - dd)).cast("decimal(18,4)")))
            .as("sum_disc_price"),
          // explicit round before the downscale cast: DuckDB TRUNCATES on
          // decimal->decimal downcasts (Spark rounds), so scale-6 sums
          // must be rounded to 4 decimals as a decimal op on both engines
          bp4(round(sum(((pd * (lit(1) - dd)).cast("decimal(18,4)")
            * (lit(1) + td)).cast("decimal(18,6)")), 4)).as("sum_charge"),
          bp4(avg(col("l_quantity"))).as("avg_qty"),
          bp4(avg(col("l_discount"))).as("avg_disc"),
          big(count(lit(1))).as("count_order")),
      "l_returnflag", "l_linestatus")
  }

  /** OP-41 distinct + count-distinct per group. */
  val op41Distinct: Q = (s, d) => {
    val c = Tables.customer(s, d)
    ordered(
      c.groupBy(col("c_nationkey"))
        .agg(big(countDistinct(col("c_mktsegment"))).as("n_segments"),
             big(count(lit(1))).as("n_customers")),
      "c_nationkey")
  }

  /** OP-42 approximate distinct (HLL sketch), BOUNDS-GATED: the sketch
    * value itself is engine-specific (no SQL oracle can reproduce it),
    * so the emitted row carries the exact distinct count plus an
    * integer `hll_within_5pct` flag — |HLL − exact| ≤ 5% of exact, a
    * 2.5σ gate at rsd 0.02 — and the oracle asserts the flag from
    * exact SQL (literal 1). A sketch regression flips the flag to 0
    * and the driver hash-fails; the raw-estimate bound is additionally
    * asserted in ApproxBoundsSpec. Pure integer comparison (×100 vs
    * ×5), no float thresholds. Mergeable sketch ⇒ map-side partials,
    * constant shuffle. */
  val op42ApproxDistinct: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    ordered(
      li.groupBy(col("l_returnflag"))
        .agg(big(countDistinct(col("l_partkey"))).as("exact_parts"),
             big(approx_count_distinct(col("l_partkey"), 0.02)).as("approx_raw"),
             big(count(lit(1))).as("n_rows"))
        .select(col("l_returnflag"), col("exact_parts"), col("n_rows"),
          when(abs(col("approx_raw") - col("exact_parts")) * 100
              <= col("exact_parts") * 5, lit(1L)).otherwise(lit(0L))
            .cast("bigint").as("hll_within_5pct")),
      "l_returnflag")
  }

  /** OP-40 statistical aggregates: stddev/variance/correlation/covariance.
    * Welford-style single-pass accumulators merge in partition order; the
    * 4-decimal fixed-point output absorbs the ~1e-11 relative float drift. */
  val op40Stats: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    ordered(
      li.groupBy(col("l_returnflag"))
        .agg(
          bp4(stddev_samp(col("l_quantity"))).as("sd_qty"),
          bp4(var_samp(col("l_quantity"))).as("var_qty"),
          bp4(corr(col("l_quantity"), col("l_extendedprice"))).as("corr_qp"),
          bp4(covar_samp(col("l_quantity"), col("l_discount"))).as("covar_qd"),
          big(count(lit(1))).as("n")),
      "l_returnflag")
  }

  /** OP-41 ordered string aggregation: deterministic listagg per group
    * (sorted before concatenation on both engines). */
  val op41StringAgg: Q = (s, d) => {
    val n = Tables.nation(s, d)
    ordered(
      n.groupBy(col("n_regionkey"))
        .agg(concat_ws(",", array_sort(collect_list(col("n_name"))))
          .as("nations")),
      "n_regionkey")
  }

  /** OP-43 rollup with grouping_id: subtotal lattice over
    * (o_orderstatus, o_orderpriority); null lattice cells disambiguated by
    * grouping_id and coalesced to 'ALL' so sort keys stay non-null. */
  val op43Rollup: Q = (s, d) => {
    val o = Tables.orders(s, d)
    ordered(
      o.rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(big(grouping_id()).as("gid"),
             big(count(lit(1))).as("n_orders"),
             bp4(sum(col("o_totalprice").cast("decimal(18,2)"))).as("total"))
        .select(
          col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"), col("total")),
      "gid", "status", "priority")
  }

  /** OP-43 cube: the full grouping lattice (4 cells) over the same keys. */
  val op43Cube: Q = (s, d) => {
    val o = Tables.orders(s, d)
    ordered(
      o.cube(col("o_orderstatus"), col("o_orderpriority"))
        // cents-trick mean (see op33): exact integer cents, one division
        .agg(big(grouping_id()).as("gid"),
             big(count(lit(1))).as("n_orders"),
             Det.centsSum(col("o_totalprice")).as("__cents"))
        .select(
          col("gid"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          col("n_orders"),
          meanBpFromCents(col("__cents"), col("n_orders")).as("avg_price")),
      "gid", "status", "priority")
  }

  /** OP-43 pivot: long→wide reshape with explicit pivot values (explicit
    * values keep the plan static — no driver-side distinct scan). */
  val op43Pivot: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val p = o.groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
    ordered(
      p.select(col("o_orderpriority"),
        big(coalesce(col("F"), lit(0L))).as("n_f"),
        big(coalesce(col("O"), lit(0L))).as("n_o"),
        big(coalesce(col("P"), lit(0L))).as("n_p")),
      "o_orderpriority")
  }

  /** OP-40 salted two-phase aggregation (skew path): identical result to
    * the direct groupBy — checked against the plain-SQL oracle. */
  val op40Salted: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    ordered(
      graft.ops.Skew.saltedSumCount(li, "l_orderkey", 8,
          Seq("l_returnflag"), "l_quantity")
        .select(col("l_returnflag"),
          bp4(col("sum_l_quantity")).as("sum_qty"), col("n")),
      "l_returnflag")
  }

  // -------------------------------------------------------------- windows

  /** OP-44 ranking window functions: top-5 customers by balance within
    * each market segment; unique tiebreak on c_custkey keeps ranks
    * deterministic. One shuffle on the partition key. */
  val op44WindowRank: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    ordered(
      c.select(col("c_mktsegment"), col("c_custkey"),
          bp4(col("c_acctbal")).as("acctbal"),
          big(row_number().over(w)).as("rn"),
          big(rank().over(w)).as("rk"),
          big(dense_rank().over(w)).as("drk"))
        .filter(col("rn") <= 5),
      "c_mktsegment", "rn")
  }

  /** OP-45 analytic window functions: per-customer order history with
    * lag/lead and a running total (ROWS UNBOUNDED PRECEDING..CURRENT). */
  val op45WindowAnalytic: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    ordered(
      o.select(col("o_custkey"), col("o_orderkey"),
          bp4(col("o_totalprice")).as("price"),
          bp4(lag(col("o_totalprice"), 1).over(w)).as("prev_price"),
          bp4(lead(col("o_totalprice"), 1).over(w)).as("next_price"),
          // running sum over exact integer cents: engines may accumulate
          // window frames in different association orders (incremental vs
          // segment tree) — integer sums are associative, doubles are not
          (Det.centsSum(col("o_totalprice"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            * 100).cast("bigint").as("running_total")),
      "o_custkey", "o_orderkey")
  }

  /** OP-44 distribution window functions: ntile/percent_rank/cume_dist. */
  val op44WindowDist: Q = (s, d) => {
    val c = Tables.customer(s, d)
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    ordered(
      c.select(col("c_mktsegment"), col("c_custkey"),
          big(ntile(4).over(w)).as("quartile"),
          bp4(percent_rank().over(w)).as("pct_rank"),
          bp4(cume_dist().over(w)).as("cume")),
      "c_mktsegment", "c_custkey")
  }

  /** OP-46 exact percentiles (linear interpolation on the sorted set) —
    * quantile_cont semantics, identical interpolation arithmetic on both
    * engines given identical sorted inputs. */
  val op46Percentile: Q = (s, d) => {
    val o = Tables.orders(s, d)
    ordered(
      o.groupBy(col("o_orderstatus"))
        .agg(
          bp4(expr("percentile(o_totalprice, 0.5)")).as("p50"),
          bp4(expr("percentile(o_totalprice, 0.9)")).as("p90"),
          bp4(expr("percentile(o_totalprice, 0.99)")).as("p99"),
          big(count(lit(1))).as("n")),
      "o_orderstatus")
  }

  /** op279: exact percentiles WITHOUT sorting the corpus — the
    * production form op46/op171's scaladocs point at, promoted to an
    * operator: for a bounded value domain (document lengths), the
    * per-group value HISTOGRAM is map-combinable; the nearest-rank
    * percentile is then a cumulative walk over the grid picking the
    * first value whose running count reaches ⌈q·n⌉. op46's
    * `percentile()` materializes per-group value arrays (corpus-sized
    * state); this spelling's state is the (lang, length) grid —
    * hundreds of rows — and every percentile is exact, not sketched.
    *
    * 100 TB shape: one map-combined histogram shuffle at grid
    * cardinality, one declared O(|domain|) window walk (the Grid
    * contract); adding a percentile adds a CASE arm, never a pass.
    * Unbounded domains quantize first (op179's boundaries). */
  /** op279/op280 shared tail: the cumulative walk + rank picks over a
    * (lang, v, c) histogram grid. */
  def histPercentileFromGrid(hist: DataFrame): DataFrame = {
    val cum = hist
      .withColumn("cum",
        sum("c").over(Window.partitionBy("lang").orderBy("v")))
      .withColumn("n", sum("c").over(Window.partitionBy("lang")))
    def pick(num: Int, den: Int, name: String) =
      big(min(when(
        expr(s"cum >= ($num * n + ${den - 1}) div $den"),
        col("v")))).as(name)
    ordered(
      cum.groupBy("lang")
        .agg(big(max("n")).as("n"), pick(1, 2, "p50"),
          pick(9, 10, "p90"), pick(99, 100, "p99")),
      "lang")
  }

  val op279HistPercentile: Q = (s, d) =>
    histPercentileFromGrid(
      Tables.documents(s, d)
        .groupBy(col("lang"), col("n_chars").as("v"))
        .agg(count(lit(1)).as("c")))

  /** op280: STREAMING percentile serving — op279's histogram grid
    * maintained online (DriftStream partials, element-wise merge) and
    * the SAME walk, under op279's UNCHANGED oracle: exact p50/p90/p99
    * re-asked per serve at grid cost as arrivals land — the SLO
    * dashboard's deployment shape, with the percentiles exact instead
    * of sketched. */
  val op280StreamPercentile: Q = (s, d) => {
    val state = java.nio.file.Files
      .createTempDirectory("graft_op280_").toString
    histPercentileFromGrid(graft.streaming.DriftStream
      .maintainedLangLengthCounts(s, d, state))
  }

  /** OP-46 approximate percentiles (GK mergeable sketch), BOUNDS-GATED:
    * the 100 TB path — exact percentile materializes per-group value
    * arrays, the sketch is constant-size and merges map-side. The
    * sketch's returned VALUE is engine-specific, but its CONTRACT is
    * exact and checkable: at accuracy 10000 the returned element's
    * rank must lie within ⌈n/10000⌉ of ⌈p·n⌉. The query emits, per
    * group, an integer in-window flag per percentile — rank window
    * verified by counting rows ≤ / < the sketch's answer (one extra
    * map-combinable pass over a 3-row broadcast join, no sort) — and
    * the oracle asserts the flags from exact SQL (literal 1), turning
    * the probabilistic op into a hash-gated one. ±1 rank slack covers
    * the ⌈⌉ boundary conventions; all arithmetic integer. */
  val op46PercentileApprox: Q = (s, d) => {
    val o = Tables.orders(s, d)
      .select(col("o_orderstatus"), col("o_totalprice"))
    val ap = o.groupBy(col("o_orderstatus"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 10000)").as("a50"),
        expr("approx_percentile(o_totalprice, 0.9, 10000)").as("a90"),
        expr("approx_percentile(o_totalprice, 0.99, 10000)").as("a99"))
    def inWindow(le: Column, lt: Column, target: Column, err: Column) =
      when(le >= target - err - lit(1L) && lt <= target + err + lit(1L),
        lit(1L)).otherwise(lit(0L)).cast("bigint")
    ordered(
      o.join(broadcast(ap), "o_orderstatus")
        .groupBy(col("o_orderstatus"))
        .agg(big(count(lit(1))).as("n"),
          sum(when(col("o_totalprice") <= col("a50"), 1L).otherwise(0L)).as("le50"),
          sum(when(col("o_totalprice") <   col("a50"), 1L).otherwise(0L)).as("lt50"),
          sum(when(col("o_totalprice") <= col("a90"), 1L).otherwise(0L)).as("le90"),
          sum(when(col("o_totalprice") <   col("a90"), 1L).otherwise(0L)).as("lt90"),
          sum(when(col("o_totalprice") <= col("a99"), 1L).otherwise(0L)).as("le99"),
          sum(when(col("o_totalprice") <   col("a99"), 1L).otherwise(0L)).as("lt99"))
        .withColumn("err", expr("(n + 9999) div 10000"))
        .select(col("o_orderstatus"), col("n"),
          inWindow(col("le50"), col("lt50"),
            expr("(n + 1) div 2"), col("err")).as("p50_in_window"),
          inWindow(col("le90"), col("lt90"),
            expr("(9 * n + 9) div 10"), col("err")).as("p90_in_window"),
          inWindow(col("le99"), col("lt99"),
            expr("(99 * n + 99) div 100"), col("err")).as("p99_in_window")),
      "o_orderstatus")
  }

  /** OP-46 global top-k: ORDER BY … LIMIT k plans TakeOrderedAndProject —
    * per-partition heaps + single-driver merge, no full sort at scale. */
  val op46TopK: Q = (s, d) => {
    val o = Tables.orders(s, d)
    o.select(col("o_orderkey"), bp4(col("o_totalprice")).as("price"))
      .orderBy(col("price").desc, col("o_orderkey"))
      .limit(25)
  }

  /** OP-47 set operations: nation-key sets of customers vs suppliers,
    * tagged per set relation. */
  val op47SetOps: Q = (s, d) => {
    val cn = Tables.customer(s, d).select(col("c_nationkey").as("nationkey")).distinct()
    val sn = Tables.supplier(s, d).select(col("s_nationkey").as("nationkey")).distinct()
    val both = cn.intersect(sn).withColumn("rel", lit("both"))
    val custOnly = cn.except(sn).withColumn("rel", lit("customer_only"))
    val supOnly = sn.except(cn).withColumn("rel", lit("supplier_only"))
    ordered(both.unionAll(custOnly).unionAll(supOnly)
      .select(col("rel"), col("nationkey")), "rel", "nationkey")
  }

  // ------------------------------------------------------- scalar packs

  /** OP-48 string functions: lower/upper/substring/concat/LIKE/regexp/length. */
  val op48String: Q = (s, d) => {
    val p = Tables.part(s, d)
    ordered(
      p.select(col("p_partkey"),
          lower(col("p_name")).as("lo_name"),
          upper(col("p_brand")).as("up_brand"),
          substring(col("p_type"), 1, 5).as("type5"),
          concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
          col("p_name").like("%a%").as("has_a"),
          regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
          big(length(col("p_name"))).as("name_len")),
      "p_partkey")
  }

  /** OP-48 date/time functions: year/month/day/date_trunc/datediff. */
  val op48Date: Q = (s, d) => {
    val o = Tables.orders(s, d)
    ordered(
      o.select(col("o_orderkey"),
          big(year(col("o_orderdate"))).as("yr"),
          big(month(col("o_orderdate"))).as("mo"),
          big(dayofmonth(col("o_orderdate"))).as("dom"),
          date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
            .as("month_start"),
          big(datediff(lit("1998-01-01").cast("date"),
            col("o_orderdate").cast("date"))).as("days_to_98")),
      "o_orderkey")
  }

  /** OP-48 math functions: round/abs/floor/ceil/sqrt over quantities. */
  val op48Math: Q = (s, d) => {
    val li = Tables.lineitem(s, d).filter(col("l_linenumber") === 1)
    ordered(
      li.select(col("l_orderkey"),
          // exact decimal arithmetic: price×discount of 2-decimal values
          // ties exactly at the 3rd decimal, where double rounding is
          // engine-dependent — decimals round identically everywhere
          bp4(round(col("l_extendedprice").cast("decimal(18,2)")
            * col("l_discount").cast("decimal(18,2)"), 2)).as("disc_amt"),
          bp4(abs(col("l_quantity") - 25)).as("qty_dev"),
          big(floor(col("l_extendedprice"))).as("price_floor"),
          big(ceil(col("l_discount") * 100)).as("disc_pct_ceil"),
          bp4(sqrt(col("l_quantity"))).as("qty_sqrt")),
      "l_orderkey")
  }

  /** OP-48 conditionals: CASE WHEN / coalesce / nullif. */
  val op48Cond: Q = (s, d) => {
    val c = Tables.customer(s, d)
    ordered(
      c.select(col("c_custkey"),
          when(col("c_acctbal") < 0, lit("negative"))
            .when(col("c_acctbal") < 5000, lit("mid"))
            .otherwise(lit("high")).as("bal_band"),
          coalesce(nullif(col("c_mktsegment"), lit("BUILDING")), lit("(b)"))
            .as("seg_masked")),
      "c_custkey")
  }

  /** OP-49 JSON functions: path extraction over events.props
    * (get_json_object + typed from_json). */
  val op49Json: Q = (s, d) => {
    val e = Tables.events(s, d)
    ordered(
      e.select(col("event_id"),
          get_json_object(col("props"), "$.k").as("k_str"),
          big(from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT")).getField("k")).as("k_int")),
      "event_id")
  }

  /** OP-50 array functions: split/size/element access/contains. */
  val op50Array: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    val toks = split(col("text"), " ")
    ordered(
      doc.select(col("doc_id"),
          big(size(toks)).as("n_tokens"),
          get(toks, lit(0)).as("first_token"),
          array_contains(toks, "spark").as("has_spark")),
      "doc_id")
  }

  /** OP-50 explode (generator): global token frequencies — explode then
    * hash-aggregate; partial aggregation bounds the shuffle by vocabulary
    * size, not corpus size. */
  val op50Explode: Q = (s, d) => {
    val doc = Tables.documents(s, d)
    ordered(
      doc.select(explode(split(col("text"), " ")).as("token"))
        .groupBy(col("token"))
        .agg(big(count(lit(1))).as("n")),
      "token")
  }

  /** op128: SCD2 history compaction over the event log — per
    * (user_id, event_type) validity intervals in exact microseconds,
    * opening a version only on a real value change. One shuffle; the
    * lag/row_number/lead windows share a single Exchange + Sort
    * (ScaleSpec pins it). */
  val op128Scd2: Q = (s, d) => {
    val e = Tables.events(s, d)
      .withColumn("t_us", expr("ts_ns div 1000"))
    ordered(
      graft.ops.Scd.history(e, Seq("user_id", "event_type"), "t_us",
          "event_id", bp4(col("value")))
        .withColumnRenamed("value", "val_bp"),
      "user_id", "event_type", "ver")
  }

  /** op150: column profiler — per-column row/null/distinct counts, the
    * data-quality pass every ingest pipeline runs before accepting a
    * drop. Each column profiles in its OWN column-pruned scan + agg
    * (at 100 TB each branch reads exactly one column off parquet; the
    * single-pass multi-countDistinct spelling would Expand the scan
    * N_cols× — strictly worse on a wide fact table). Exact ndv by
    * design here; the sketch path for when exact is too expensive is
    * op42's HLL. */
  val op150Profile: Q = (s, d) => {
    val o = Tables.orders(s, d)
    val branches = o.columns.toSeq.map { c =>
      o.select(col(c)).agg(
          big(count(lit(1))).as("n_rows"),
          big(count(lit(1)) - count(col(c))).as("n_nulls"),
          big(countDistinct(col(c))).as("n_distinct"))
        .select(lit(c).as("col_name"), col("n_rows"), col("n_nulls"),
          col("n_distinct"))
    }
    ordered(branches.reduce(_ unionByName _), "col_name")
  }

  /** op151: constraint validation — declared expectations (not-null,
    * primary-key uniqueness, referential integrity, ranges, enums, and
    * one advisory threshold) evaluated as violation COUNTS, the
    * dbt-test / Delta-expectations shape. Every rule is one
    * column-pruned aggregate or one anti-join; nothing materializes
    * violating rows (a production gate would TABLESAMPLE examples —
    * bounded — after the counts say which rules fired). The advisory
    * rule fires on purpose: an all-zero result would hash-gate
    * nothing. */
  val op151Constraints: Q = (s, d) => {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    def rule(name: String, viol: DataFrame): DataFrame =
      viol.agg(big(count(lit(1))).as("n_violations"))
        .select(lit(name).as("rule"), col("n_violations"))
    val rules = Seq(
      "enum_l_returnflag" ->
        li.filter(!col("l_returnflag").isin("A", "N", "R")),
      "fk_l_orderkey_orders" ->
        li.select("l_orderkey").join(o.select("o_orderkey"),
          col("l_orderkey") === col("o_orderkey"), "left_anti"),
      "not_null_l_orderkey" -> li.filter(col("l_orderkey").isNull),
      "pk_unique_o_orderkey" ->
        o.groupBy("o_orderkey").count().filter(col("count") > 1),
      "range_l_discount_0_10" ->
        li.filter(col("l_discount") < 0.0 || col("l_discount") > 0.10),
      "range_l_quantity_1_50" ->
        li.filter(col("l_quantity") < 1.0 || col("l_quantity") > 50.0),
      "warn_high_quantity" -> li.filter(col("l_quantity") >= 45.0))
    ordered(rules.map { case (n, v) => rule(n, v) }.reduce(_ unionByName _),
      "rule")
  }

  /** op155: binned interval join — point-in-interval containment
    * (lineitem ship days ⋈ 14-day order windows) WITHOUT a
    * nested-loop plan: intervals explode to their ≤3 covering 7-day
    * bins, points map to one bin, the engine equi-joins on the bin
    * and the exact containment runs as a residual filter
    * ([[graft.ops.IntervalJoin]] — the Flink-interval-join shape; at
    * 100 TB neither side needs to broadcast and AQE can skew-split
    * the bin shuffle). Each matching pair lands exactly once; the
    * oracle is the plain non-equi join, so the hash gate proves the
    * bin decomposition lossless. */
  val op155IntervalJoin: Q = (s, d) => {
    val pts = Tables.lineitem(s, d).select(
      col("l_quantity"),
      datediff(to_date(col("l_shipdate")), to_date(lit("1992-01-01")))
        .cast("bigint").as("ship_day"))
    val iv = Tables.orders(s, d).filter(col("o_orderkey") % 97 === 0)
      .select(col("o_orderkey").as("iv_key"),
        datediff(to_date(col("o_orderdate")), to_date(lit("1992-01-01")))
          .cast("bigint").as("lo"))
      .withColumn("hi", col("lo") + 14L)
    ordered(
      graft.ops.IntervalJoin.binJoin(pts, iv, "ship_day", "lo", "hi", 7L)
        .groupBy(col("iv_key"))
        .agg(big(count(lit(1))).as("n_ship"),
          big(sum(col("l_quantity").cast("bigint"))).as("sum_qty")),
      "iv_key")
  }

  // ---------------------------------------------------------------- op271

  /** op271: unpivot (wide→long reshape) — lineitem's four numeric
    * measures melted into (measure, value) rows, then profiled per
    * (returnflag, measure): the inverse of op43's pivot, and the
    * reshape every metrics store / feature-long-table ingest runs.
    * Uses the native `Dataset.unpivot` (Spark's Expand under the
    * hood): a map-side ×4 row fan-out with NO shuffle and NO scan
    * duplication — the oracle's UNION ALL spelling re-reads the table
    * four times; Expand reads it once, which at 100 TB is the whole
    * difference. The only shuffle is the (flag, measure)-keyed
    * aggregate, map-combined before it moves.
    *
    * 100 TB shape: fan-out factor = measure count (a declared
    * constant); output cardinality = |flags| × 4. Column pruning
    * still reaches the scan (only the 5 used columns are read). */
  val op271Unpivot: Q = (s, d) => {
    val long = Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_quantity"),
        col("l_extendedprice"), col("l_discount"), col("l_tax"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("l_quantity").as("quantity"),
          col("l_extendedprice").as("extendedprice"),
          col("l_discount").as("discount"), col("l_tax").as("tax")),
        "measure", "value")
    ordered(
      long.groupBy("l_returnflag", "measure")
        .agg(big(count(lit(1))).as("n"),
          Det.centsSum(col("value")).as("sum_cents"),
          min(round(col("value") * 100, 0).cast("long")).as("min_cents"),
          max(round(col("value") * 100, 0).cast("long")).as("max_cents")),
      "l_returnflag", "measure")
  }

  // ---------------------------------------------------------------- op272

  /** op272: GROUPING SETS — the explicit-subset form op43's
    * rollup/cube are sugar for: exactly the four aggregation grains
    * ((flag, status), (flag), (status), ()) in ONE pass, with
    * grouping() flags disambiguating real NULL-like sentinels from
    * grouped-out columns. The one-report-many-grains shape (dashboard
    * tiles + drill rows from a single scan) that would otherwise be
    * four scans UNION ALL'd.
    *
    * 100 TB shape: Spark plans this as one Expand (×4 per input row,
    * map-side) + one hash aggregate — partial aggregation applies per
    * grain before the shuffle, so the exchanged volume is the SUM of
    * the four grains' cardinalities, not 4× the corpus. */
  val op272GroupingSets: Q = (s, d) => {
    Tables.lineitem(s, d)
      .select("l_returnflag", "l_linestatus", "l_quantity")
      .createOrReplaceTempView("graft_op272_li")
    s.sql(
      """SELECT CAST(grouping(l_returnflag) * 2 +
        |            grouping(l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstat,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100, 0) AS BIGINT))
        |       AS BIGINT) AS qty_cents
        |FROM graft_op272_li
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rflag, lstat""".stripMargin)
  }

  val defs: Map[String, Q] = Map(
    "op279_hist_percentile" -> op279HistPercentile,
    "op280_stream_percentile" -> op280StreamPercentile,
    "op271_unpivot" -> op271Unpivot,
    "op272_grouping_sets" -> op272GroupingSets,
    "op150_profile" -> op150Profile,
    "op151_constraints" -> op151Constraints,
    "op155_interval_join" -> op155IntervalJoin,
    "op128_scd2_history" -> op128Scd2,
    "op31_join_inner" -> op31JoinInner,
    "op31_join_left" -> op31JoinLeft,
    "op32_join_semi" -> op32SemiJoin,
    "op32_join_anti" -> op32AntiJoin,
    "op33_join_broadcast" -> op33BroadcastJoin,
    "op34_join_range" -> op34RangeJoin,
    "op35_join_cross" -> op35CrossJoin,
    "op40_agg" -> op40Agg,
    "op40_stats" -> op40Stats,
    "op40_salted" -> op40Salted,
    "op41_stringagg" -> op41StringAgg,
    "op43_pivot" -> op43Pivot,
    "op44_window_dist" -> op44WindowDist,
    "op46_percentile" -> op46Percentile,
    "op46_percentile_approx" -> op46PercentileApprox,
    "op41_distinct" -> op41Distinct,
    "op42_approx_distinct" -> op42ApproxDistinct,
    "op43_rollup" -> op43Rollup,
    "op43_cube" -> op43Cube,
    "op44_window_rank" -> op44WindowRank,
    "op45_window_analytic" -> op45WindowAnalytic,
    "op46_topk" -> op46TopK,
    "op47_setops" -> op47SetOps,
    "op48_scalar_string" -> op48String,
    "op48_scalar_date" -> op48Date,
    "op48_scalar_math" -> op48Math,
    "op48_scalar_cond" -> op48Cond,
    "op49_json" -> op49Json,
    "op50_array" -> op50Array,
    "op50_explode" -> op50Explode,
  )

  // op280 merges streamed counts exactly -> op279's oracle verbatim
  lazy val oracle: Map[String, String] = baseOracle +
    ("op280_stream_percentile" -> baseOracle("op279_hist_percentile"))

  private lazy val baseOracle: Map[String, String] = Map(
    "op279_hist_percentile" ->
      """WITH hist AS (
        |  SELECT lang, n_chars AS v, CAST(count(*) AS BIGINT) AS c
        |  FROM documents GROUP BY 1, 2),
        |cum AS (
        |  SELECT lang, v, c,
        |    sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
        |    sum(c) OVER (PARTITION BY lang) AS n
        |  FROM hist)
        |SELECT lang, CAST(max(n) AS BIGINT) AS n,
        |  CAST(min(CASE WHEN cum >= (1 * n + 1) // 2 THEN v END)
        |       AS BIGINT) AS p50,
        |  CAST(min(CASE WHEN cum >= (9 * n + 9) // 10 THEN v END)
        |       AS BIGINT) AS p90,
        |  CAST(min(CASE WHEN cum >= (99 * n + 99) // 100 THEN v END)
        |       AS BIGINT) AS p99
        |FROM cum GROUP BY 1 ORDER BY lang""".stripMargin,
    "op271_unpivot" ->
      """WITH lv AS (
        |  SELECT l_returnflag, 'quantity' AS measure, l_quantity AS value
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'discount', l_discount
        |  FROM lineitem
        |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
        |SELECT l_returnflag, measure, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS sum_cents,
        |  CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS min_cents,
        |  CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS max_cents
        |FROM lv GROUP BY 1, 2 ORDER BY l_returnflag, measure""".stripMargin,
    "op272_grouping_sets" ->
      """SELECT CAST(grouping(l_returnflag) * 2 +
        |            grouping(l_linestatus) AS BIGINT) AS gid,
        |  coalesce(l_returnflag, 'ALL') AS rflag,
        |  coalesce(l_linestatus, 'ALL') AS lstat,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT)
        |    AS qty_cents
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
        |  (l_returnflag), (l_linestatus), ())
        |ORDER BY gid, rflag, lstat""".stripMargin,
    "op150_profile" -> Seq("o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority")
      .map(c =>
        s"""SELECT '$c' AS col_name, CAST(count(*) AS BIGINT) AS n_rows,
           |  CAST(count(*) - count($c) AS BIGINT) AS n_nulls,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct
           |FROM orders""".stripMargin)
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name"),
    "op151_constraints" ->
      """SELECT 'enum_l_returnflag' AS rule, CAST(count(*) AS BIGINT)
        |  AS n_violations
        |FROM lineitem WHERE l_returnflag NOT IN ('A', 'N', 'R')
        |UNION ALL
        |SELECT 'fk_l_orderkey_orders', CAST(count(*) AS BIGINT)
        |FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        |WHERE o.o_orderkey IS NULL
        |UNION ALL
        |SELECT 'not_null_l_orderkey', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_orderkey IS NULL
        |UNION ALL
        |SELECT 'pk_unique_o_orderkey', (
        |  SELECT CAST(count(*) AS BIGINT) FROM (
        |    SELECT o_orderkey FROM orders
        |    GROUP BY o_orderkey HAVING count(*) > 1))
        |UNION ALL
        |SELECT 'range_l_discount_0_10', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.10
        |UNION ALL
        |SELECT 'range_l_quantity_1_50', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_quantity < 1.0 OR l_quantity > 50.0
        |UNION ALL
        |SELECT 'warn_high_quantity', CAST(count(*) AS BIGINT)
        |FROM lineitem WHERE l_quantity >= 45.0
        |ORDER BY rule""".stripMargin,
    // op155: the oracle is the PLAIN non-equi containment join —
    // hash-matching it proves the bin decomposition lossless
    "op155_interval_join" ->
      """WITH pts AS (
        |  SELECT l_quantity,
        |         datediff('day', DATE '1992-01-01',
        |                  CAST(l_shipdate AS DATE)) AS ship_day
        |  FROM lineitem),
        |iv AS (
        |  SELECT o_orderkey AS iv_key,
        |         datediff('day', DATE '1992-01-01',
        |                  CAST(o_orderdate AS DATE)) AS lo
        |  FROM orders WHERE o_orderkey % 97 = 0)
        |SELECT CAST(iv_key AS BIGINT) AS iv_key,
        |       CAST(count(*) AS BIGINT) AS n_ship,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM pts p JOIN iv
        |  ON p.ship_day >= iv.lo AND p.ship_day < iv.lo + 14
        |GROUP BY iv_key ORDER BY iv_key""".stripMargin,
    // op128: DuckDB truncates TIMESTAMP(NANOS) parquet to micros (floor)
    // exactly like `ts_ns div 1000`, so epoch_us(ts) is the shared exact
    // validity boundary
    "op128_scd2_history" ->
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
        |chg AS (SELECT * FROM flg WHERE rn = 1 OR prev IS DISTINCT FROM val_bp)
        |SELECT user_id, event_type,
        |       CAST(row_number() OVER w AS BIGINT) AS ver,
        |       val_bp, t_us AS valid_from,
        |       coalesce(lead(t_us) OVER w, -1) AS valid_to,
        |       CAST(CASE WHEN lead(t_us) OVER w IS NULL THEN 1 ELSE 0 END AS BIGINT)
        |         AS is_current
        |FROM chg WINDOW w AS (PARTITION BY user_id, event_type ORDER BY t_us, event_id)
        |ORDER BY user_id, event_type, ver""".stripMargin,
    "op31_join_inner" ->
      """SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "op31_join_left" ->
      """SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS n_orders,
        |       CAST(CAST(coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2))), 0) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS total
        |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_custkey ORDER BY c_custkey""".stripMargin,
    "op32_join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 50000)
        |ORDER BY c_custkey""".stripMargin,
    "op32_join_anti" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
        |ORDER BY c_custkey""".stripMargin,
    "op33_join_broadcast" ->
      """SELECT n_name, CAST(count(*) AS BIGINT) AS n_customers,
        |       CAST(CAST(CAST(sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS DOUBLE)
        |            / CAST(count(*) * 100 AS DOUBLE) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS avg_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,
    "op34_join_range" ->
      """WITH bounds AS (
        |  SELECT CAST(r_regionkey AS BIGINT) AS bucket,
        |         CAST(r_regionkey AS BIGINT) * 2000.0 AS lo,
        |         (CAST(r_regionkey AS BIGINT) + 1) * 2000.0 AS hi
        |  FROM region)
        |SELECT bucket, CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer JOIN bounds ON c_acctbal >= lo AND c_acctbal < hi
        |GROUP BY bucket ORDER BY bucket""".stripMargin,
    "op35_join_cross" ->
      "SELECT r_name, n_name FROM region CROSS JOIN nation ORDER BY r_name, n_name",
    "op40_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty,
        |  CAST(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_base_price,
        |  CAST(CAST(sum(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_disc_price,
        |  CAST(CAST(round(sum(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2))) AS DECIMAL(18,4)) * (1 + CAST(l_tax AS DECIMAL(18,2))) AS DECIMAL(18,6))), 4) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_charge,
        |  CAST(CAST(avg(l_quantity) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS avg_qty,
        |  CAST(CAST(avg(l_discount) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS avg_disc,
        |  CAST(count(*) AS BIGINT) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "op40_stats" ->
      """SELECT l_returnflag,
        |  CAST(CAST(stddev_samp(l_quantity) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS sd_qty,
        |  CAST(CAST(var_samp(l_quantity) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS var_qty,
        |  CAST(CAST(corr(l_quantity, l_extendedprice) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS corr_qp,
        |  CAST(CAST(covar_samp(l_quantity, l_discount) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS covar_qd,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "op40_salted" ->
      """SELECT l_returnflag, CAST(CAST(sum(l_quantity) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS sum_qty,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "op41_stringagg" ->
      """SELECT n_regionkey, string_agg(n_name, ',' ORDER BY n_name) AS nations
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "op43_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(count(*) FILTER (o_orderstatus = 'F') AS BIGINT) AS n_f,
        |  CAST(count(*) FILTER (o_orderstatus = 'O') AS BIGINT) AS n_o,
        |  CAST(count(*) FILTER (o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "op44_window_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |  CAST(CAST(percent_rank() OVER w AS DECIMAL(18,4)) * 10000 AS BIGINT) AS pct_rank,
        |  CAST(CAST(cume_dist() OVER w AS DECIMAL(18,4)) * 10000 AS BIGINT) AS cume
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "op46_percentile" ->
      """SELECT o_orderstatus,
        |  CAST(CAST(quantile_cont(o_totalprice, 0.5) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p50,
        |  CAST(CAST(quantile_cont(o_totalprice, 0.9) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p90,
        |  CAST(CAST(quantile_cont(o_totalprice, 0.99) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS p99,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin,
    // The two approx ops are bounds-gated: Spark emits measured
    // in-bounds flags, the oracle asserts them true from exact SQL —
    // a sketch regression flips a flag and the hash gate catches it.
    "op42_approx_distinct" ->
      """SELECT l_returnflag,
        |  CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        |  CAST(count(*) AS BIGINT) AS n_rows,
        |  CAST(1 AS BIGINT) AS hll_within_5pct
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin,
    "op46_percentile_approx" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        |  CAST(1 AS BIGINT) AS p50_in_window,
        |  CAST(1 AS BIGINT) AS p90_in_window,
        |  CAST(1 AS BIGINT) AS p99_in_window
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "op41_distinct" ->
      """SELECT c_nationkey, CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS n_segments,
        |       CAST(count(*) AS BIGINT) AS n_customers
        |FROM customer GROUP BY c_nationkey ORDER BY c_nationkey""".stripMargin,
    "op43_rollup" ->
      """SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,4)) * 10000 AS BIGINT) AS total
        |FROM orders GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "op43_cube" ->
      """SELECT CAST(grouping(o_orderstatus) * 2 + grouping(o_orderpriority) AS BIGINT) AS gid,
        |       coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(count(*) AS BIGINT) AS n_orders,
        |       CAST(CAST(CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS DOUBLE)
        |            / CAST(count(*) * 100 AS DOUBLE) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS avg_price
        |FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
        |ORDER BY gid, status, priority""".stripMargin,
    "op44_window_rank" ->
      """SELECT * FROM (
        |  SELECT c_mktsegment, c_custkey, CAST(CAST(c_acctbal AS DECIMAL(18,4)) * 10000 AS BIGINT) AS acctbal,
        |    CAST(row_number() OVER w AS BIGINT) AS rn,
        |    CAST(rank() OVER w AS BIGINT) AS rk,
        |    CAST(dense_rank() OVER w AS BIGINT) AS drk
        |  FROM customer
        |  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey))
        |WHERE rn <= 5 ORDER BY c_mktsegment, rn""".stripMargin,
    "op45_window_analytic" ->
      """SELECT o_custkey, o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS price,
        |  CAST(CAST(lag(o_totalprice, 1) OVER w AS DECIMAL(18,4)) * 10000 AS BIGINT) AS prev_price,
        |  CAST(CAST(lead(o_totalprice, 1) OVER w AS DECIMAL(18,4)) * 10000 AS BIGINT) AS next_price,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) * 100 AS BIGINT) AS running_total
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "op46_topk" ->
      """SELECT o_orderkey, CAST(CAST(o_totalprice AS DECIMAL(18,4)) * 10000 AS BIGINT) AS price
        |FROM orders ORDER BY price DESC, o_orderkey LIMIT 25""".stripMargin,
    "op47_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
        |     sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
        |SELECT 'both' AS rel, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT 'customer_only' AS rel, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
        |UNION ALL
        |SELECT 'supplier_only' AS rel, nationkey FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
        |ORDER BY rel, nationkey""".stripMargin,
    "op48_scalar_string" ->
      """SELECT p_partkey, lower(p_name) AS lo_name, upper(p_brand) AS up_brand,
        |  substring(p_type, 1, 5) AS type5,
        |  p_brand || ':' || p_type AS brand_type,
        |  p_name LIKE '%a%' AS has_a,
        |  regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        |  CAST(length(p_name) AS BIGINT) AS name_len
        |FROM part ORDER BY p_partkey""".stripMargin,
    "op48_scalar_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS BIGINT) AS yr,
        |  CAST(month(o_orderdate) AS BIGINT) AS mo,
        |  CAST(dayofmonth(o_orderdate) AS BIGINT) AS dom,
        |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '1998-01-01') AS BIGINT) AS days_to_98
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "op48_scalar_math" ->
      """SELECT l_orderkey,
        |  CAST(CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,2)), 2) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS disc_amt,
        |  CAST(CAST(abs(l_quantity - 25) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS qty_dev,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_discount * 100) AS BIGINT) AS disc_pct_ceil,
        |  CAST(CAST(sqrt(l_quantity) AS DECIMAL(18,4)) * 10000 AS BIGINT) AS qty_sqrt
        |FROM lineitem WHERE l_linenumber = 1 ORDER BY l_orderkey""".stripMargin,
    "op48_scalar_cond" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'negative'
        |       WHEN c_acctbal < 5000 THEN 'mid' ELSE 'high' END AS bal_band,
        |  coalesce(nullif(c_mktsegment, 'BUILDING'), '(b)') AS seg_masked
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "op49_json" ->
      """SELECT event_id, json_extract_string(props, '$.k') AS k_str,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_int
        |FROM events ORDER BY event_id""".stripMargin,
    "op50_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
        |  string_split(text, ' ')[1] AS first_token,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark
        |FROM documents ORDER BY doc_id""".stripMargin,
    "op50_explode" ->
      """SELECT token, CAST(count(*) AS BIGINT) AS n
        |FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents)
        |GROUP BY token ORDER BY token""".stripMargin,
  )
}
