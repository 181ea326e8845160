package graft

import org.apache.spark.sql.functions._

import graft.functions.{CountMin, CountMinAgg}
import graft.queries.AnalyticsQueries
import graft.sources.Tables

/** Semantics of the corpus-analytics pack (op156–op162) against
  * driver-side reference recomputation, plus the count-min sketch's
  * algebraic properties and the plan shapes the 100 TB arguments rely
  * on. */
class AnalyticsSpec extends SparkSpec {

  // ------------------------------------------------------------ CountMin

  test("count-min: merge of split halves equals one-shot build") {
    val toks = (1 to 500).map(i => s"tok${i % 37}")
    val agg = new CountMinAgg(4, 64)
    val (a, b) = toks.splitAt(211)
    val bufA = a.foldLeft(agg.zero)(agg.reduce)
    val bufB = b.foldLeft(agg.zero)(agg.reduce)
    val whole = toks.foldLeft(agg.zero)(agg.reduce)
    assert(agg.merge(bufA, bufB).toSeq == whole.toSeq)
  }

  test("count-min: estimate is never below the exact count (one-sided)") {
    val r = AnalyticsQueries.op159CmsHeavyHitters(spark, sfDir).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("est_cnt") >= row.getAs[Long]("exact_cnt"),
        s"CMS under-estimated ${row.getAs[String]("token")}")
    }
  }

  test("count-min: JVM bucket matches the SQL md5-60 convention") {
    val df = spark.range(1).select(
      expr("CAST(CONV(SUBSTRING(MD5(CAST('2:spark' AS BINARY)), 1, 15), " +
        "16, 10) AS BIGINT) % 64").as("b"))
    assert(df.collect()(0).getAs[Long]("b") ==
      CountMin.bucket(2, "spark", 64).toLong)
  }

  // --------------------------------------------------------------- op156

  test("op156: one row per doc; fractions in range; keep matches rule") {
    val docs = Tables.documents(spark, sfDir).count()
    val r = AnalyticsQueries.op156RepetitionFilter(spark, sfDir).collect()
    assert(r.length == docs)
    r.foreach { row =>
      val top = row.getAs[Long]("top_word_frac_bp")
      val dup = row.getAs[Long]("dup_bigram_frac_bp")
      assert(top >= 0 && top <= 10000)
      assert(dup >= 0 && dup <= 10000)
      assert(row.getAs[Long]("keep") ==
        (if (top <= 1800 && dup <= 800) 1L else 0L))
    }
  }

  test("op156: recomputes one document from its raw text") {
    val doc = Tables.documents(spark, sfDir)
      .select("doc_id", "text").where(col("doc_id") === 0).collect()(0)
    val words = doc.getAs[String]("text").split(" ").toSeq
    val counts = words.groupBy(identity).view.mapValues(_.size).toMap
    val (topW, topC) = counts.toSeq.sortBy { case (w, c) => (-c, w) }.head
    val wordChars = counts.map { case (w, c) => w.length.toLong * c }.sum
    val bigrams = words.sliding(2).map(_.mkString(" ")).toSeq
    val nb = bigrams.size.toLong
    val db = bigrams.distinct.size.toLong
    val row = AnalyticsQueries.op156RepetitionFilter(spark, sfDir)
      .where(col("doc_id") === 0).collect()(0)
    assert(row.getAs[String]("top_word") == topW)
    assert(row.getAs[Long]("top_word_frac_bp") ==
      topW.length.toLong * topC * 10000 / wordChars)
    assert(row.getAs[Long]("dup_bigram_frac_bp") == (nb - db) * 10000 / nb)
  }

  // --------------------------------------------------------------- op157

  test("op157: n_bi is words-1 per doc; scores non-positive; keep rule") {
    val expected = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        (size(split(col("text"), " ")) - 1).cast("long").as("want"))
      .collect().map(r => r.getLong(0) -> math.max(r.getLong(1), 0L)).toMap
    val r = AnalyticsQueries.op157LmQualityScore(spark, sfDir).collect()
    assert(r.length == expected.size)
    r.foreach { row =>
      val id = row.getAs[Long]("doc_id")
      val nBi = row.getAs[Long]("n_bi")
      val sum = row.getAs[Long]("sum_qlp")
      assert(nBi == expected(id))
      assert(sum <= 0, s"positive log-prob sum for doc $id")
      assert(row.getAs[Long]("keep") ==
        (if (sum >= -3430000L * nBi) 1L else 0L))
    }
  }

  // --------------------------------------------------------------- op158

  test("op158: at most cap rows per source, contiguous ranks, stable") {
    val r = AnalyticsQueries.op158MixtureSample(spark, sfDir).collect()
    val bySrc = r.groupBy(_.getAs[String]("source"))
    bySrc.foreach { case (src, rows) =>
      assert(rows.length <= 20, s"source $src over cap")
      assert(rows.map(_.getAs[Long]("rank")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"source $src ranks not contiguous")
    }
    val again = AnalyticsQueries.op158MixtureSample(spark, sfDir).collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq)
  }

  test("op158: bounded TopKAgg replaces the window sort in the plan") {
    val plan = AnalyticsQueries.op158MixtureSample(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), "mixture sample fell back to a window")
    assert(plan.contains("ObjectHashAggregate"),
      "TopKAgg should aggregate via ObjectHashAggregate")
  }

  // --------------------------------------------------------------- op160

  test("op160: grid accounting holds and LOCF matches a naive replay") {
    val r = AnalyticsQueries.op160GapfillLocf(spark, sfDir).collect()
    r.foreach { row =>
      assert(row.getAs[Long]("hours_total") ==
        row.getAs[Long]("hours_obs") + row.getAs[Long]("hours_filled"))
    }
    // naive driver-side replay for one user
    val uid = r.head.getAs[Long]("user_id")
    val ev = Tables.events(spark, sfDir)
      .where(col("user_id") === uid)
      .select(col("ts_ns"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSeq
    val hourNs = 3600L * 1000000000L
    val byHour = ev.groupBy(_._1 / hourNs).view
      .mapValues(_.maxBy(e => (e._1, e._2))._3).toMap
    val h0 = ev.map(_._1).min / hourNs
    val h1 = ev.map(_._1).max / hourNs
    var locf = 0L
    var sum = 0L
    (h0 to h1).foreach { h =>
      byHour.get(h).foreach(locf = _)
      sum += locf
    }
    val row = r.find(_.getAs[Long]("user_id") == uid).get
    assert(row.getAs[Long]("hours_total") == h1 - h0 + 1)
    assert(row.getAs[Long]("hours_obs") == byHour.size.toLong)
    assert(row.getAs[Long]("locf_sum_cents") == sum)
  }

  // --------------------------------------------------------------- op161

  test("op161: funnel is monotone and step1 counts view users") {
    val r = AnalyticsQueries.op161Funnel(spark, sfDir).collect()
      .map(x => x.getAs[String]("step") -> x.getAs[Long]("users")).toMap
    assert(r("1_view") >= r("2_click"))
    assert(r("2_click") >= r("3_purchase"))
    val viewUsers = Tables.events(spark, sfDir)
      .where(col("event_type") === "view")
      .select("user_id").distinct().count()
    assert(r("1_view") == viewUsers)
  }

  // --------------------------------------------------------------- op162

  test("op162: offset-0 users equal cohort sizes; totals add up") {
    val r = AnalyticsQueries.op162RetentionCohorts(spark, sfDir).collect()
    val offset0 = r.filter(_.getAs[Long]("offset_d") == 0)
      .map(x => x.getAs[Long]("cohort_idx") -> x.getAs[Long]("users")).toMap
    val cohorts = Tables.events(spark, sfDir)
      .groupBy("user_id").agg(min(to_date(col("ts"))).as("c"))
      .groupBy("c").count().collect()
      .map(x => (x.getDate(0).toLocalDate.toEpochDay - 19723L) ->
        x.getLong(1)).toMap
    assert(offset0 == cohorts)
    r.foreach(x => assert(x.getAs[Long]("offset_d") >= 0))
  }

  test("op198: PMI replays the driver-side co-occurrence counts") {
    val r = queries.AnalyticsQueries.op198PmiCollocations(spark, sfDir)
      .collect()
    assert(r.nonEmpty)
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "text").collect()
      .map(x => (x.getLong(0), x.getString(1).split(" ").toSet))
    val nt = docs.length.toLong
    val df = docs.flatMap(_._2).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    val vocab = df.toSeq.sortBy { case (t, c) => (-c, t) }.take(32).toMap
    r.foreach { row =>
      val (t1, t2) = (row.getAs[String]("t1"), row.getAs[String]("t2"))
      assert(t1 < t2)
      assert(vocab.contains(t1) && vocab.contains(t2))
      val nab = docs.count(d => d._2(t1) && d._2(t2)).toLong
      assert(row.getAs[Long]("n_ab") == nab, s"($t1,$t2)")
      assert(nab >= 20)
      assert(row.getAs[Long]("n_a") == vocab(t1))
      assert(row.getAs[Long]("n_b") == vocab(t2))
      val want = math.floor(math.log(
        nab.toDouble * nt / (vocab(t1).toDouble * vocab(t2))) * 1e6).toLong
      assert(row.getAs[Long]("pmi_micro") == want, s"($t1,$t2) pmi")
    }
  }

  test("op200: session paths equal a driver-side sessionize-and-walk replay") {
    val got = AnalyticsQueries.op200SessionPaths(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_id", "ts_ns", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 1800L * 1000000000L
    val pathCounts = scala.collection.mutable.Map.empty[String, Long]
    ev.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(r => (r._3, r._2)).toSeq
      var cur = List.empty[String]; var prev = Long.MinValue
      def close(): Unit = if (cur.nonEmpty) {
        val p = cur.reverse.take(8).mkString(">")
        pathCounts(p) = pathCounts.getOrElse(p, 0L) + 1
      }
      sorted.foreach { case (_, _, ts, typ) =>
        if (prev != Long.MinValue && ts - prev > gap) { close(); cur = Nil }
        cur ::= typ; prev = ts
      }
      close()
    }
    val want = pathCounts.filter(_._2 >= 3).toMap
    assert(got == want)
    assert(got.nonEmpty, "no path reached the support threshold")
    // plan shape: the session machinery runs on ONE (user) shuffle —
    // lag/cumsum/row_number/running-max share the window, the
    // (user, sess) collect reuses its partitioning (superset-key
    // clustering); only the final path count adds an Exchange
    val hashEx = "Exchange hashpartitioning".r.findAllIn(
      AnalyticsQueries.op200SessionPaths(spark, sfDir)
        .queryExecution.executedPlan.toString).length
    assert(hashEx == 2, s"expected 2 hash Exchanges, saw $hashEx")
  }

  test("op201: largest-remainder allocation is exact and selection honors it") {
    val rows = AnalyticsQueries.op201StrataAlloc(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val bySource = rows.groupBy(_._1)
    // driver-side apportionment replay
    val counts = Tables.documents(spark, sfDir).groupBy("source")
      .agg(count(lit(1)).as("n")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum
    val k = 100L
    val base = counts.view.mapValues(c => k * c / n).toMap
    val deficit = k - base.values.sum
    val extras = counts.keys.toSeq
      .sortBy(src => (-(k * counts(src) % n), src)).take(deficit.toInt).toSet
    val wantAlloc = counts.keys.map(src =>
      src -> (base(src) + (if (extras(src)) 1L else 0L))).toMap
    assert(wantAlloc.values.sum == k, "replay must apportion exactly K")
    bySource.foreach { case (src, rs) =>
      assert(rs.head._3 == wantAlloc(src), s"$src alloc")
      assert(rs.head._2 == counts(src), s"$src n_docs")
      // ranks contiguous 1..alloc — the selection honors the cap
      assert(rs.map(_._4).sorted.toSeq == (1L to wantAlloc(src)).toSeq,
        s"$src ranks")
    }
    assert(rows.length.toLong == k, "emitted selection must total K")
    // every stratum within one slot of exact proportionality
    wantAlloc.foreach { case (src, a) =>
      assert(a == base(src) || a == base(src) + 1, s"$src remainder rule")
    }
    // plan shape: selection is the bounded TopKAgg (ObjectHashAggregate),
    // and the only Window (the remainder rank) runs over the |sources|
    // grid — the corpus is never window-sorted
    val plan = AnalyticsQueries.op201StrataAlloc(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ObjectHashAggregate"), "TopKAgg selection lost")
    assert("Window".r.findAllIn(plan).length <= 1,
      "more than the sources-grid Window in the plan")
  }

  test("op205: deadline chain matches a driver replay and is a subset of op161") {
    val got = AnalyticsQueries.op205WindowedFunnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val free = AnalyticsQueries.op161Funnel(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // deadlines can only REMOVE conversions
    Seq("1_view", "2_click", "3_purchase").foreach { st =>
      assert(got(st)._1 <= free(st)._1, s"$st users grew under a deadline")
    }
    assert(got("1_view") == free("1_view"), "step 1 has no deadline")
    assert(got("2_click")._1 < free("2_click")._1,
      "fixture must exercise the click deadline")
    // driver replay of the windowed chain
    val ev = Tables.events(spark, sfDir)
      .select("user_id", "event_type", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val w1 = 3L * 86400L * 1000000000L
    val w2 = 7L * 86400L * 1000000000L
    var (c1, c2, c3, l2, l3) = (0L, 0L, 0L, 0L, 0L)
    byUser.values.foreach { rows =>
      val t1 = rows.collect { case (_, "view", t) => t }.minOption
      val t2 = t1.flatMap(a => rows.collect {
        case (_, "click", t) if t > a && t <= a + w1 => t }.minOption)
      val t3 = t2.flatMap(b => rows.collect {
        case (_, "purchase", t) if t > b && t <= b + w2 => t }.minOption)
      t1.foreach { _ => c1 += 1 }
      t2.foreach { b => c2 += 1; l2 += (b - t1.get) / 1000000000L }
      t3.foreach { c => c3 += 1; l3 += (c - t2.get) / 1000000000L }
    }
    assert(got == Map("1_view" -> ((c1, 0L)), "2_click" -> ((c2, l2)),
      "3_purchase" -> ((c3, l3))))
  }

  test("op206: last-touch attribution matches a driver replay; buckets partition purchases") {
    val got = AnalyticsQueries.op206LastTouchAttribution(spark, sfDir)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val ev = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts_ns").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val lookback = 7L * 86400L * 1000000000L
    val counts = scala.collection.mutable.Map.empty[String, (Long, Long)]
    val byUser = ev.groupBy(_._2)
    var nPurch = 0L
    byUser.values.foreach { rows =>
      val touches = rows.filter(_._3 != "purchase")
      rows.filter(_._3 == "purchase").foreach { case (_, _, _, pts) =>
        nPurch += 1
        // latest at-or-before, ties broken by max event_id (both engines)
        val best = touches.filter(_._4 <= pts)
          .sortBy(t => (-t._4, -t._1)).headOption
        val (ty, lat) = best match {
          case Some(t) if pts - t._4 <= lookback =>
            (t._3, (pts - t._4) / 1000000000L)
          case _ => ("none", 0L)
        }
        val (n0, l0) = counts.getOrElse(ty, (0L, 0L))
        counts(ty) = (n0 + 1, l0 + lat)
      }
    }
    assert(got == counts.toMap)
    assert(got.values.map(_._1).sum == nPurch,
      "attribution buckets must partition the purchases")
    assert(got.contains("none"), "lookback miss not exercised")
  }

  test("op238: negative-pattern matches equal a strictly-before replay") {
    val got = AnalyticsQueries.op238CepNoError(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    val evDf = Tables.events(spark, sfDir)
    val ev = evDf.select(col("user_id"), col("event_id"),
        col("event_type"), graft.sources.Tables.tsUsExpr(evDf).as("t_us"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    val want = ev.groupBy(_._1).toSeq.flatMap { case (u, rows) =>
      rows.filter(_._3 == "purchase").flatMap { case (_, eid, _, pus) =>
        val lv = rows.filter(r => r._3 == "view" && r._4 < pus)
          .map(_._4).maxOption
        val le = rows.filter(r => r._3 == "error" && r._4 < pus)
          .map(_._4).maxOption
        lv match {
          case Some(v) if le.forall(_ < v) => Some((u, eid, pus, v))
          case _ => None
        }
      }
    }.toSet
    assert(got == want)
    // the negation arm must actually fire: some purchase with a prior
    // view is EXCLUDED because an error intervened
    val excluded = ev.groupBy(_._1).exists { case (_, rows) =>
      rows.filter(_._3 == "purchase").exists { case (_, _, _, pus) =>
        val lv = rows.filter(r => r._3 == "view" && r._4 < pus)
          .map(_._4).maxOption
        val le = rows.filter(r => r._3 == "error" && r._4 < pus)
          .map(_._4).maxOption
        lv.isDefined && le.exists(_ >= lv.get)
      }
    }
    assert(excluded, "fixture never exercises the intervening-error arm")
  }

  test("op239: dsir scores replay the vocab-grid ln-ratio fold") {
    val rows = graft.queries.TrainQueries
      .op239DsirImportance(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tokens = docs.flatMap { case (id, src, text) =>
      text.split(" ").map(t => (id, src, t)) }
    val cnt = tokens.groupBy(_._3).view.mapValues { g =>
      (g.count(_._2 == "src0").toLong, g.count(_._2 != "src0").toLong)
    }.toMap
    val nt = cnt.values.map(_._1).sum; val ns = cnt.values.map(_._2).sum
    val v = cnt.size.toLong
    val w = cnt.map { case (t, (ct, cs)) =>
      t -> math.floor(math.log(((ct + 1) * (ns + v)).toDouble /
        ((cs + 1) * (nt + v)).toDouble) * 1000000d).toLong
    }
    val want = tokens.groupBy(_._1).view.mapValues { g =>
      val score = g.toSeq.map(r => w(r._3)).sum
      (g.length.toLong, score, if (score >= 0) 1L else 0L)
    }.toMap
    assert(rows == want)
    // both selection classes must exist, or the gate is vacuous
    assert(rows.values.exists(_._3 == 1L) && rows.values.exists(_._3 == 0L))
  }

  test("op261: calibration is the fold of op71 buckets x op61 dup set") {
    val got = graft.queries.TrainQueries.defs("op261_quality_dup_cal")
      .apply(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    // fold the two proven operators' outputs — composition must agree
    val buckets = graft.queries.TextQueries.defs("op71_quality")
      .apply(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("quality_bp") / 500).toMap
    val pairs = graft.queries.DedupQueries.defs("op61_dedup_ngram")
      .apply(spark, sfDir).collect()
      .flatMap(r => Seq(r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
      .toSet
    val want = buckets.toSeq.groupBy(_._2).map { case (b, g) =>
      val n = g.size.toLong
      val dup = g.count(p => pairs(p._1)).toLong
      b -> ((n, dup, dup * 10000 / n))
    }
    assert(got == want)
    // every doc lands in exactly one bucket
    assert(got.values.map(_._1).sum == buckets.size.toLong)
  }

  test("op255: k-anonymity groups replay; both risk classes present") {
    val got = AnalyticsQueries.op255KAnonymity(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("lang", "source", "n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val want = docs.groupBy(d => (d._1, d._2, d._3 / 100)).view
      .mapValues { g =>
        val n = g.length.toLong
        (n, g.map(_._3).distinct.length.toLong, if (n < 5) 1L else 0L)
      }.toMap
    assert(got == want)
    assert(got.values.exists(_._3 == 1L), "no risky group — gate vacuous")
    assert(got.values.exists(_._3 == 0L), "no safe group — gate vacuous")
  }

  test("op252: interpolation gap-fill replays the neighbor-line fold") {
    val got = AnalyticsQueries.op252GapfillInterp(spark, sfDir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
      .toMap
    val evDf = Tables.events(spark, sfDir)
    val tUs = graft.sources.Tables.tsUsExpr(evDf)
    val ev = evDf
      .select(col("user_id"), (tUs - (tUs % 3600000000L)).as("hUs"),
        tUs.as("tUs"), col("event_id"),
        round(col("value") * 100, 0).cast("long").as("cents"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1) / 3600000000L, r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val want = ev.groupBy(_._1).view.mapValues { rows =>
      val byHour = rows.groupBy(_._2).view.mapValues(
        _.maxBy(r => (r._3, r._4))._5).toMap
      val h0 = rows.map(_._2).min; val h1 = rows.map(_._2).max
      val spine = (h0 to h1).map { hi =>
        (hi, byHour.get(hi)) }
      val sum = spine.map { case (hi, obs) =>
        obs match {
          case Some(c) => c * 1000
          case None =>
            val prev = spine.filter(s => s._1 < hi && s._2.isDefined)
              .lastOption.map(s => (s._1, s._2.get))
            val next = spine.filter(s => s._1 > hi && s._2.isDefined)
              .headOption.map(s => (s._1, s._2.get))
            (prev, next) match {
              case (Some((pd, py)), Some((nd, ny))) =>
                val num = py * (nd - hi) + ny * (hi - pd)
                (if (num < 0) -1L else 1L) *
                  (math.abs(num) * 1000 / (nd - pd))
              case (Some((_, py)), None) => py * 1000
              case (None, Some((_, ny))) => ny * 1000
              case _ => 0L
            }
        }
      }.sum
      (spine.length.toLong, spine.count(_._2.isDefined).toLong, sum)
    }.toMap
    assert(got == want)
    // the interp arm must fire: some user has unobserved spine hours
    assert(got.values.exists(v => v._2 < v._1), "no gaps to fill")
  }

  test("op246: zipf slope replays the milli-ln OLS over the rank grid") {
    val got = AnalyticsQueries.op246ZipfSlope(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).view.mapValues { g =>
      val cnt = g.flatMap(_._2.split(" "))
        .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      val ranked = cnt.sortBy { case (t, c) => (-c, t) }.zipWithIndex
      val xy = ranked.map { case ((_, c), i) =>
        (math.floor(math.log((i + 1).toDouble) * 1000d).toLong,
          math.floor(math.log(c.toDouble) * 1000d).toLong) }
      val n = xy.length.toLong
      val sx = xy.map(_._1).sum; val sy = xy.map(_._2).sum
      val sxx = xy.map(p => p._1 * p._1).sum
      val sxy = xy.map(p => p._1 * p._2).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val slope = (if (num < 0) -1L else 1L) *
        ((math.abs(num) / den) * 1000 + (math.abs(num) % den) * 1000 / den)
      (n, slope)
    }.toMap
    assert(got == want)
    // Zipf: frequency decays with rank — every fitted slope negative
    assert(got.values.forall(_._2 < 0))
  }

  test("op242: source entropy replays the quantized c*ln(c) fold") {
    val got = AnalyticsQueries.op242SourceEntropy(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val want = docs.groupBy(_._1).view.mapValues { g =>
      val toks = g.flatMap(_._2.split(" "))
      val n = toks.length.toLong
      val cnt = toks.groupBy(identity).view.mapValues(_.length.toLong)
      val clnc = cnt.values.map(c =>
        c * math.floor(math.log(c.toDouble) * 1000000d).toLong).sum
      (n, cnt.size.toLong,
        math.floor(math.log(n.toDouble) * 1000000d).toLong - clnc / n)
    }.toMap
    assert(got == want)
    // entropy is bounded by ln(vocab); uniform would attain it
    got.foreach { case (src, (_, v, h)) =>
      assert(h >= 0 && h <= math.floor(math.log(v.toDouble) * 1e6).toLong + 1,
        s"entropy out of [0, ln V] for $src")
    }
  }

  test("op279: histogram-walk percentiles equal the sort-based ranks") {
    val got = graft.queries.RelationalQueries
      .op279HistPercentile(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val xs = Tables.documents(spark, sfDir)
      .select("lang", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val want = xs.groupBy(_._1).view.mapValues { g =>
      val sorted = g.map(_._2).sorted
      val n = sorted.length.toLong
      def nr(num: Long, den: Long) = // nearest-rank: ceil(q*n)-th value
        sorted(((num * n + den - 1) / den - 1).toInt)
      (n, nr(1, 2), nr(9, 10), nr(99, 100))
    }.toMap
    assert(got == want)
  }

  test("op280: streaming percentile serving equals the batch op279") {
    val batch = graft.queries.RelationalQueries
      .op279HistPercentile(spark, sfDir).collect().map(_.toSeq).toSeq
    val stream = graft.queries.RelationalQueries
      .op280StreamPercentile(spark, sfDir).collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op269: JSD replays the per-token quantized terms exactly") {
    val got = graft.queries.AnalyticsQueries.defs(
        "op269_js_divergence")(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cnt = docs.flatMap { case (s0, t) => t.split(" ").map((s0, _)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val tot = cnt.groupBy(_._1._2).view
      .mapValues(_.values.sum).toMap
    val ns = cnt.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val nt = tot.values.sum
    val want = ns.keys.map { src =>
      val n1 = ns(src)
      val jsd = tot.toSeq.map { case (token, ct) =>
        val c1 = cnt.getOrElse((src, token), 0L)
        val p = c1.toDouble / n1.toDouble
        val q = (ct - c1).toDouble / (nt - n1).toDouble
        val mm = (p + q) * 0.5
        val a = if (c1 > 0) p * math.log(p / mm) else 0d
        val b = if (ct - c1 > 0) q * math.log(q / mm) else 0d
        math.floor((a + b) * 0.5 * 1000000000d).toLong
      }.sum
      src -> ((n1, nt - n1, jsd))
    }.toMap
    assert(got == want)
    // JSD is bounded by ln 2 (disjoint vocabularies attain it); each
    // per-token term is >= 0 up to one floor ulp
    got.foreach { case (src, (_, _, jsd)) =>
      assert(jsd >= -tot.size.toLong && jsd <= 693147181L,
        s"JSD out of [0, ln 2] for $src")
    }
  }
}
