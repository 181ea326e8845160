package graft

/** Plan lint over the whole query surface: catches accidental
  * worst-case physical operators that a correctness gate cannot see
  * (results stay right while cost explodes at scale).
  *
  * CartesianProduct = a non-broadcast cross product — O(n·m) rows
  * through a real shuffle-less nested loop. The only query allowed to
  * plan one is the deliberate small×small cross join (OP-35).
  * BroadcastNestedLoopJoin is NOT linted: with a broadcast (small) side
  * it is the correct plan for non-equi joins (range join, brute-force
  * scoring) at any scale.
  */
class PlanLintSpec extends SparkSpec {

  private val cartesianAllowed = Set("op35_join_cross")

  test("no query plans a CartesianProduct (except the deliberate cross join)") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
        if (plan.contains("CartesianProduct") && !cartesianAllowed(name))
          Some(name)
        else None
    }
    assert(offenders.isEmpty,
      s"unexpected CartesianProduct in: ${offenders.mkString(", ")}")
  }

  test("crawl metadata stages are map-only up to their declared " +
      "shuffles (r16)") {
    // the scaladocs claim "the ORDER BY is the only shuffle" for the
    // pure extraction/parse chains and exactly two keyed shuffles for
    // the composed schedule — pin the physical plans so a refactor
    // that grows an exchange (the staging regression's cousin) fails
    // here instead of at the 100 TB design review
    def hashEx(name: String): Int =
      "Exchange hashpartitioning".r.findAllIn(
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.executedPlan.toString).length
    for (n <- Seq("op323_url_resolve", "op325_robots_crawl_delay",
        "op326_sitemap_extract", "op328_warc_parse")) {
      val e = hashEx(n)
      assert(e == 0, s"$n grew a hash shuffle: $e")
    }
    // op329: one per-canonical best-evidence aggregate + one
    // per-domain schedule window
    val e329 = hashEx("op329_refetch_schedule")
    assert(e329 == 2, s"op329 expected 2 hash exchanges, saw $e329")
  }

  test("op105 sessionizes on one shuffle and matches a driver-side fold") {
    // the window partitions by user_id and the (user_id, sess_id)
    // aggregate must REUSE that partitioning (superset-key clustered
    // distribution) — a second hashpartitioning Exchange means the
    // one-shuffle claim in the scaladoc is false
    val df = graft.queries.TrainQueries.op105SessionDocs(spark, sfDir)
    val hashEx = "Exchange hashpartitioning".r
      .findAllIn(df.queryExecution.executedPlan.toString).length
    assert(hashEx == 1, s"expected 1 hash Exchange, saw $hashEx")
    // full semantic fold: recompute sessions driver-side from the raw
    // events and compare every column
    val ev = graft.sources.Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts_ns", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        Math.floorDiv(r.getLong(2), 1000L), r.getString(3)))
    val expected = ev.groupBy(_._1).flatMap { case (uid, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).toSeq
      var sess = 0L; var prev = Long.MinValue
      sorted.map { case (_, eid, ts, typ) =>
        if (prev == Long.MinValue || ts - prev > 1800L * 1000000L)
          sess += 1
        prev = ts
        (uid, sess, ts, eid, typ)
      }.groupBy(_._2).map { case (sid, es) =>
        (uid, sid, es.size.toLong, es.map(_._3).min,
          es.map(_._3).max - es.map(_._3).min,
          es.sortBy(e => (e._3, e._4)).map(_._5).mkString(" "))
      }
    }.toSet
    val got = df.collect().map(r => (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5))).toSet
    assert(got == expected)
    assert(got.size > ev.map(_._1).distinct.length,
      "fixture produced only one session per user — gap threshold inert")
  }

  test("op107 positions are the md5 permutation and avoid a corpus-wide global sort") {
    val df = graft.queries.TrainQueries.op107CorpusShuffle(spark, sfDir)
    // plan shape BEFORE execution — after collect() AQE rewrites the
    // tiny-fixture shuffles (coalesced reads / single partitions) and the
    // string no longer reflects the at-scale plan
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("Exchange hashpartitioning(bucket"),
      "rank window lost its bucket partitioning")
    assert("Exchange SinglePartition".r.findAllIn(plan).length == 1,
      "more than the offsets frame got single-partitioned")
    val rows = df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = rows.length
    // positions are exactly the permutation 1..N with the shard rule
    assert(rows.map(_._2).sorted.toSeq == (1L to n.toLong))
    assert(rows.forall { case (_, pos, shard) => shard == (pos - 1) % 16 })
    // driver replay of the semantic: rank of md5("shuf:42:" || doc_id)
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val want = rows.map(_._1)
      .map(id => (id, md5hex(s"shuf:42:$id")))
      .sortBy { case (id, h) => (h, id) }
      .zipWithIndex.map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(rows.forall { case (id, pos, _) => want(id) == pos })
  }

  test("tiny-dimension joins broadcast instead of sort-merging") {
    // queries whose every join side except the corpus scan is bounded
    // (per-source rates, 1-row K, quota tables): a SortMergeJoin there
    // means the corpus got sorted for a table of 20 rows
    val broadcastOnly = Seq("op89_mixture_cutoff", "op79_sample_stratified",
      "op88_mixture", "op111_mixture_temperature")
    val offenders = broadcastOnly.flatMap { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      if (plan.contains("SortMergeJoin")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"bounded-side join fell back to SortMergeJoin in: ${offenders.mkString(", ")}")
  }

  test("op271/op272 reshape via one Expand over ONE scan, never N scans") {
    // the UNION ALL spelling their oracles use re-reads the table once
    // per measure / grain; the Expand plan is the 100 TB contract
    Seq("op271_unpivot", "op272_grouping_sets").foreach { name =>
      val plan = SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.executedPlan.toString
      assert(plan.contains("Expand"), s"$name lost its Expand:\n$plan")
      val scans = "Scan parquet".r.findAllIn(plan).length
      assert(scans <= 1, s"$name reads the table $scans times:\n$plan")
    }
  }
}
