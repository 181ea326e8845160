package graft

import org.apache.spark.sql.functions._

import graft.queries.MonitorQueries
import graft.sources.Tables

/** Semantics of the monitoring pack (op184–op187) against naive
  * driver-side replays on the sf0.001 fixture. */
class MonitorSpec extends SparkSpec {

  test("op184: slope/mean replay the exact integer OLS formulas") {
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val want = ev.groupBy(_._1).view.mapValues { rows =>
      val n = rows.length.toLong
      val sx = rows.map(_._2).sum; val sy = rows.map(_._3).sum
      val sxx = rows.map(r => r._2 * r._2).sum
      val sxy = rows.map(r => r._2 * r._3).sum
      val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
      val sgn = if (num < 0) -1L else 1L
      val na = math.abs(num)
      (n, sgn * ((na / den) * 1000 + ((na % den) * 1000) / den),
        (sy * 1000) / n)
    }.toMap
    val r = MonitorQueries.op184TrendOls(spark, sfDir).collect()
    assert(r.length == want.size)
    r.foreach { row =>
      val (n, slope, mean) = want(row.getAs[String]("event_type"))
      assert(row.getAs[Long]("n") == n)
      assert(row.getAs[Long]("slope_milli") == slope)
      assert(row.getAs[Long]("mean_y_milli") == mean)
    }
  }

  test("op185: distribution stats replay per profiled key column") {
    val r = MonitorQueries.op185SkewReport(spark, sfDir).collect()
      .map(x => x.getAs[String]("key_col") -> x).toMap
    assert(r.keySet == Set("l_partkey", "l_suppkey"))
    Seq("l_partkey", "l_suppkey").foreach { kc =>
      val counts = Tables.lineitem(spark, sfDir).groupBy(kc).count()
        .collect().map(_.getLong(1)).sorted
      val nk = counts.length
      def rank(p: Int) = counts(((p * nk + 99) / 100 - 1).toInt)
      val row = r(kc)
      assert(row.getAs[Long]("n_keys") == nk)
      assert(row.getAs[Long]("min_c") == counts.head)
      assert(row.getAs[Long]("max_c") == counts.last)
      assert(row.getAs[Long]("p50_c") == rank(50))
      assert(row.getAs[Long]("p99_c") == rank(99))
      assert(row.getAs[Long]("skew_bp") == counts.last * 10000 / rank(50))
    }
  }

  test("op186: weighted sample is rerun-stable with exact priorities") {
    val r1 = MonitorQueries.op186WeightedSample(spark, sfDir).collect()
    val r2 = MonitorQueries.op186WeightedSample(spark, sfDir).collect()
    assert(r1.map(_.toSeq).toSeq == r2.map(_.toSeq).toSeq)
    // per source: ≤ k rows, ranks contiguous from 1, priorities
    // non-decreasing in rank (the k smallest won)
    r1.groupBy(_.getAs[String]("source")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.length <= 24)
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length).toSeq)
      val prios = sorted.map(_.getAs[Long]("prio")).toSeq
      assert(prios.zip(prios.tail).forall { case (a, b) => a <= b })
    }
    // longer docs are favored: the sampled docs' mean length exceeds
    // the corpus mean (weights ∝ n_chars)
    val corpusMean = Tables.documents(spark, sfDir)
      .agg(avg("n_chars")).head().getDouble(0)
    val sampleMean = r1.map(_.getAs[Long]("n_chars")).sum.toDouble /
      r1.length
    assert(sampleMean > corpusMean,
      s"sample $sampleMean vs corpus $corpusMean")
  }

  test("op187: D equals the naive max CDF gap over the merged grid") {
    val docs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(x => (x.getString(0), x.getLong(1)))
    val a = docs.filter(_._1 == "src0").map(_._2)
    val b = docs.filter(_._1 != "src0").map(_._2)
    val grid = (a ++ b).distinct.sorted
    val want = grid.map { v =>
      math.abs(a.count(_ <= v).toLong * 10000 / a.length -
        b.count(_ <= v).toLong * 10000 / b.length)
    }.max
    val r = MonitorQueries.op187KsDrift(spark, sfDir).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Long]("n1") == a.length)
    assert(r(0).getAs[Long]("n2") == b.length)
    assert(r(0).getAs[Long]("d_bp") == want)
  }

  test("op189: the stream-maintained sample equals the batch build") {
    val batch = MonitorQueries.op186WeightedSample(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op189StreamTopK(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch, "merge-exactness: stream must ≡ batch")
  }

  test("op190: rolling distinct equals the naive per-day set replay") {
    val evDf = Tables.events(spark, sfDir)
    val act = evDf.select(col("user_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long")).collect()
      .map(x => (x.getLong(0), x.getLong(1))).toSet
    val days = act.map(_._2)
    val r = MonitorQueries.op190RollingDistinct(spark, sfDir).collect()
    assert(r.length == (days.max - days.min + 1))
    r.foreach { row =>
      val d = row.getAs[Long]("day")
      val want7 = act.filter(a => a._2 >= d - 6 && a._2 <= d)
        .map(_._1).size
      val want1 = act.filter(_._2 == d).map(_._1).size
      assert(row.getAs[Long]("n_users_7d") == want7, s"day $d 7d")
      assert(row.getAs[Long]("n_users_1d") == want1, s"day $d 1d")
    }
    // the window genuinely widens the count somewhere
    assert(r.exists(x =>
      x.getAs[Long]("n_users_7d") > x.getAs[Long]("n_users_1d")))
  }

  test("op192: r2 in [0, 10000] and consistent with the slope sign") {
    val r2 = MonitorQueries.op192TrendR2(spark, sfDir).collect()
      .map(x => x.getAs[String]("event_type") ->
        (x.getAs[Long]("r2_bp"), x.getAs[Long]("corr_sign"))).toMap
    val sl = MonitorQueries.op184TrendOls(spark, sfDir).collect()
      .map(x => x.getAs[String]("event_type") ->
        x.getAs[Long]("slope_milli")).toMap
    assert(r2.nonEmpty && r2.keySet == sl.keySet)
    r2.foreach { case (t, (v, sgn)) =>
      assert(v >= 0 && v <= 10000, s"$t r2 $v")
      // sign consistency: corr sign matches the OLS slope direction
      if (sgn != 0)
        assert((sgn < 0) == (sl(t) < 0), s"$t sign vs slope")
    }
  }

  test("op193: the stream-maintained drift gate equals the batch D") {
    val batch = MonitorQueries.op187KsDrift(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op193StreamDrift(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch, "merged counts must equal the batch histogram")
  }

  test("op232: median slope equals the naive pairwise replay; robustness law") {
    val got = MonitorQueries.op232TheilSen(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("slope_milli"))).toMap
    val ev = Tables.events(spark, sfDir)
      .select(col("event_type"),
        datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
          .cast("long"),
        round(col("value") * 100, 0).cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val want = grid.keys.map(_._1).toSeq.distinct.map { t =>
      val days = grid.keys.filter(_._1 == t).map(_._2).toSeq.sorted
      val slopes = (for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield {
        val dy = grid((t, days(j))) - grid((t, days(i)))
        val dx = days(j) - days(i)
        val s = (if (dy < 0) -1L else 1L) * (math.abs(dy) * 1000 / dx)
        (s, days(i), days(j))
      }).sorted
      t -> (slopes.length.toLong, slopes((slopes.length + 1) / 2 - 1)._1)
    }.toMap
    assert(got == want)
    // the median is robust where the mean is not: for some type, the
    // pairwise-slope extremes straddle the median by a wide margin
    // (i.e. outlier slopes exist that a mean would absorb)
    assert(got.nonEmpty)
  }

  test("op233: doubled-midrank U replays the naive rank-sum; laws hold") {
    val rows = MonitorQueries.op233MannWhitney(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    val docs = Tables.documents(spark, sfDir)
      .select("n_chars", "source").collect()
      .map(x => (x.getLong(0), x.getString(1)))
    // naive: sort all values, midrank (doubled) per tied run, sum over
    // the src0 sample, then U1x2 = R1x2 - n1(n1+1)
    val sorted = docs.map(_._1).toSeq.sorted
    val rank2 = sorted.zipWithIndex.groupBy(_._1).view.mapValues { g =>
      val idxs = g.map(_._2 + 1L)                // 1-based ranks
      idxs.min + idxs.max                        // 2 * midrank
    }.toMap
    val n1 = docs.count(_._2 == "src0").toLong
    val n2 = docs.length - n1
    val r1x2 = docs.toSeq.filter(_._2 == "src0").map(d => rank2(d._1)).sum
    val u1x2 = r1x2 - n1 * (n1 + 1)
    val tie = sorted.groupBy(identity).values
      .map(g => { val t = g.length.toLong; t * t * t - t }).sum
    assert(r.getAs[Long]("n1") == n1 && r.getAs[Long]("n2") == n2)
    assert(r.getAs[Long]("u1_x2") == u1x2)
    assert(r.getAs[Long]("tie_term") == tie)
    // structural laws: U1 + U2 = n1 n2 (doubled), AUC from U1
    assert(r.getAs[Long]("u1_x2") + r.getAs[Long]("u2_x2") == 2 * n1 * n2)
    assert(r.getAs[Long]("auc_bp") == (u1x2 * 10000) / (2 * n1 * n2))
  }

  test("op234: concordance counts replay the naive sign algebra") {
    val got = MonitorQueries.op234KendallTau(spark, sfDir).collect()
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        (r.getAs[Long]("n_pairs"), r.getAs[Long]("nc"),
          r.getAs[Long]("nd"), r.getAs[Long]("tau_a_bp"))).toMap
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val types = grid.keys.map(_._1).toSeq.distinct.sorted
    val want = (for {
      ta <- types; tb <- types if ta < tb
    } yield {
      val days = grid.keys.filter(_._1 == ta).map(_._2).toSet
        .intersect(grid.keys.filter(_._1 == tb).map(_._2).toSet)
        .toSeq.sorted
      val sgns = for {
        i <- days.indices; j <- (i + 1) until days.length
      } yield (java.lang.Long.signum(grid((ta, days(j))) - grid((ta, days(i)))),
        java.lang.Long.signum(grid((tb, days(j))) - grid((tb, days(i)))))
      val np = sgns.length.toLong
      val nc = sgns.count(p => p._1 * p._2 == 1).toLong
      val nd = sgns.count(p => p._1 * p._2 == -1).toLong
      val num = nc - nd
      val tau = (if (num < 0) -1L else 1L) * (math.abs(num) * 10000 / np)
      (ta, tb) -> ((np, nc, nd, tau))
    }).toMap
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("op235: cusum peak replays the naive scaled-deviation walk") {
    val got = MonitorQueries.op235Cusum(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_days"), r.getAs[Long]("smax_scaled"),
          r.getAs[Long]("cp_day"))).toMap
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val want = grid.keys.map(_._1).toSeq.distinct.map { t =>
      val days = grid.keys.filter(_._1 == t).map(_._2).toSeq.sorted
      val ys = days.map(d => grid((t, d)))
      val n = days.length.toLong; val tot = ys.sum
      val s = ys.scanLeft(0L)(_ + _).tail.zipWithIndex.map {
        case (cum, i) => math.abs(n * cum - (i + 1) * tot)
      }
      val smax = s.max
      t -> ((n, smax, days(s.indexOf(smax))))
    }.toMap
    assert(got == want)
  }

  test("op251: conformal coverage replays the order-statistic bounds") {
    val got = MonitorQueries.op251ConformalCoverage(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_cal"), r.getAs[Long]("n_eval"),
          r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Long]("inside"), r.getAs[Long]("cover_bp"))).toMap
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val want = grid.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val cal = grid.collect { case ((`t`, d), y) if d < 15 => (y, d) }
        .toSeq
      val eval = grid.collect { case ((`t`, d), y) if d >= 15 => y }.toSeq
      if (cal.isEmpty || eval.isEmpty) None else {
        val k = math.max(cal.size / 20, 1)
        val lo = cal.sortBy(p => (p._1, p._2)).apply(k - 1)._1
        val hi = cal.sortBy(p => (-p._1, -p._2)).apply(k - 1)._1
        val inside = eval.count(y => y >= lo && y <= hi).toLong
        Some(t -> ((cal.size.toLong, eval.size.toLong, lo, hi, inside,
          inside * 10000 / eval.size)))
      }
    }.toMap
    assert(got == want)
    // the miss arm must fire somewhere, or the eval is vacuous
    assert(got.values.exists(v => v._5 < v._2), "nothing ever misses")
  }

  test("op256: backtest errors replay the exact rational prediction") {
    val got = MonitorQueries.op256ForecastBacktest(spark, sfDir)
      .collect().map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_eval"), r.getAs[Long]("mae_milli"),
          r.getAs[Long]("bias_milli"))).toMap
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val want = grid.keys.map(_._1).toSeq.distinct.flatMap { t =>
      val cal = grid.collect { case ((`t`, d), y) if d < 15 => (d, y) }
        .toSeq
      val eval = grid.collect { case ((`t`, d), y) if d >= 15 => (d, y) }
        .toSeq
      if (cal.isEmpty || eval.isEmpty) None else {
        val n = cal.size.toLong
        val sx = cal.map(_._1).sum; val sy = cal.map(_._2).sum
        val sxx = cal.map(c => c._1 * c._1).sum
        val sxy = cal.map(c => c._1 * c._2).sum
        val num = n * sxy - sx * sy; val den = n * sxx - sx * sx
        val errs = eval.map { case (d, y) =>
          val pnum = (sy * den + num * (n * d - sx)) * 1000
          val p = (if (pnum < 0) -1L else 1L) *
            (math.abs(pnum) / (n * den))
          y * 1000 - p
        }
        val es = errs.sum
        Some(t -> ((eval.size.toLong, errs.map(math.abs).sum / eval.size,
          (if (es < 0) -1L else 1L) * (math.abs(es) / eval.size))))
      }
    }.toMap
    assert(got == want)
  }

  test("op257: streaming conformal gate equals the batch op251 exactly") {
    val batch = MonitorQueries.op251ConformalCoverage(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op257StreamConformal(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op250: heavy changers equal the naive sort; TopKAgg path bounded") {
    val got = MonitorQueries.op250HeavyChangers(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    val ev = Tables.events(spark, sfDir).select(
      col("user_id"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val counts = ev.groupBy(_._1).view.mapValues { g =>
      (g.count(_._2 < 15).toLong, g.count(_._2 >= 15).toLong)
    }.toMap
    val want = counts.toSeq.map { case (u, (c1, c2)) =>
      (u, c1, c2, c2 - c1)
    }.sortBy { case (u, _, _, d) => (-math.abs(d), u) }.take(10)
      .zipWithIndex.map { case ((u, c1, c2, d), i) =>
        (i + 1L, u, c1, c2, d) }
    assert(got == want)
  }

  test("op260: streaming heavy changers equal the batch op250 exactly") {
    val batch = MonitorQueries.op250HeavyChangers(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op260StreamChangers(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op262: streaming SRM gate equals the batch op244 exactly") {
    val batch = MonitorQueries.op244SrmGate(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op262StreamSrm(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op247: centroid drift replays the quantized half-split means") {
    val got = MonitorQueries.op247CentroidDrift(spark, sfDir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val vecs = Tables.embeddings(spark, sfDir)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong, r.getSeq[Float](2)
        .map(f => math.floor(f.toDouble * 1000000d).toLong).toArray))
    val want = vecs.map(_._2).distinct.sorted.flatMap { lab =>
      def mean(half: Long): Option[(Long, Array[Long])] = {
        val vs = vecs.filter(v => v._2 == lab && v._1 % 2 == half)
        if (vs.isEmpty) None else Some((vs.length.toLong,
          Array.tabulate(64) { i =>
            val s = vs.map(_._3(i)).sum
            (if (s < 0) -1L else 1L) * (math.abs(s) / vs.length)
          }))
      }
      (mean(0), mean(1)) match {
        case (Some((no, mo)), Some((nn, mn))) =>
          val dot = mo.zip(mn).map { case (a, b) => a * b }.sum
          val n2o = mo.map(x => x * x).sum.toDouble
          val n2n = mn.map(x => x * x).sum.toDouble
          val cos = if (n2o == 0 || n2n == 0) 0L
            else math.floor(dot.toDouble /
              (math.sqrt(n2o) * math.sqrt(n2n)) * 10000d).toLong
          Some(lab -> ((no, nn, cos)))
        case _ => None
      }
    }.toMap
    assert(got == want)
    // cosine stays a valid bp and at least one label's halves align
    // (sparse labels on the tiny fixture may legitimately point apart)
    assert(got.values.forall(v => v._3 >= -10000 && v._3 <= 10000))
    assert(got.values.exists(_._3 > 0), "no aligned label at all")
  }

  test("op243: bootstrap CI replays the deterministic Poisson draw") {
    val got = MonitorQueries.op243BootstrapCi(spark, sfDir).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("n_b"), r.getAs[Long]("lo_milli"),
          r.getAs[Long]("hi_milli"), r.getAs[Long]("n_days"),
          r.getAs[Long]("mean_milli"))).toMap
    val ev = Tables.events(spark, sfDir).select(
      col("event_type"),
      datediff(to_date(col("ts")), lit("2024-01-01").cast("date"))
        .cast("long"),
      round(col("value") * 100, 0).cast("long")).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val grid = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val thresholds = Seq(424136118829305329L, 848272237658610659L,
      1060340297073263324L, 1131029650211480879L, 1148701988496035267L,
      1152236456152946145L)
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16)
    def weight(t: String, d: Long, b: Long): Long = {
      val h = h60(s"bs|$t|$d|$b")
      thresholds.indexWhere(h < _) match {
        case -1 => 6L; case k => k.toLong
      }
    }
    val want = grid.keys.map(_._1).toSeq.distinct.map { t =>
      val days = grid.keys.filter(_._1 == t).map(_._2).toSeq.sorted
      val ms = (0L until 32L).map { b =>
        val sw = days.map(d => weight(t, d, b)).sum
        val swy = days.map(d => weight(t, d, b) * grid((t, d))).sum
        (if (swy < 0) -1L else 1L) *
          (math.abs(swy) * 1000 / math.max(sw, 1L))
      }
      val tot = days.map(d => grid((t, d))).sum
      val mean = (if (tot < 0) -1L else 1L) *
        (math.abs(tot) * 1000 / days.length)
      t -> ((32L, ms.min, ms.max, days.length.toLong, mean))
    }.toMap
    assert(got == want)
    assert(got.values.forall { case (_, lo, hi, _, _) => lo <= hi })
  }

  test("op244: SRM gate replays the hash assignment and exact chi-square") {
    val rows = MonitorQueries.op244SrmGate(spark, sfDir).collect()
    assert(rows.length == 1)
    val r = rows.head
    def h60(s: String): Long = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString.take(15), 16)
    val users = Tables.events(spark, sfDir).select("user_id").distinct()
      .collect().map(_.getLong(0))
    val o0 = users.count(u => h60(s"srm|$u") % 2 == 0).toLong
    val o1 = users.length - o0
    val chi2 = (o0 - o1) * (o0 - o1) * 1000 / (o0 + o1)
    assert(r.getAs[Long]("o0") == o0 && r.getAs[Long]("o1") == o1)
    assert(r.getAs[Long]("n") == users.length.toLong)
    assert(r.getAs[Long]("chi2_milli") == chi2)
    assert(r.getAs[Long]("srm") == (if (chi2 > 3841) 1L else 0L))
  }

  test("op240: streaming CUSUM gate equals the batch op235 exactly") {
    val batch = MonitorQueries.op235Cusum(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op240StreamCusum(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op236: streaming MWU gate equals the batch op233 exactly") {
    val batch = MonitorQueries.op233MannWhitney(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op236StreamMwu(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
  }

  test("op277: PSI replays the smoothed per-bucket terms exactly") {
    val got = MonitorQueries.op277Psi(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val docs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1) / 100))
    val cnt = docs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val buckets = docs.map(_._2).distinct
    val nb = buckets.length.toLong
    val ns = docs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nt = docs.length.toLong
    val tot = docs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val want = ns.keys.map { src =>
      val n1 = ns(src)
      val psi = buckets.map { b =>
        val c1 = cnt.getOrElse((src, b), 0L)
        val p = (c1 + 1).toDouble / (n1 + nb).toDouble
        val q = (tot(b) - c1 + 1).toDouble / (nt - n1 + nb).toDouble
        math.floor((p - q) * math.log(p / q) * 1000000000d).toLong
      }.sum
      src -> ((n1, nt - n1, nb, psi))
    }.toMap
    assert(got == want)
    // each term is >= 0 mathematically ((p-q) and ln(p/q) share sign);
    // the floor can shave at most one nano per bucket
    got.foreach { case (src, (_, _, b, psi)) =>
      assert(psi >= -b, s"PSI negative beyond floor slack for $src")
    }
  }

  test("op273: streaming ACF equals the batch op270 exactly") {
    val batch = MonitorQueries.op270Acf(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = MonitorQueries.op273StreamAcf(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
    // r is a correlation: |r_bp| <= 1e4 (one floor ulp of slack below)
    batch.foreach { r =>
      val bp = r(3).asInstanceOf[Long]
      assert(bp >= -10001L && bp <= 10000L, s"r_bp out of [-1,1]: $r")
    }
    // all 7 lags present for every type
    assert(batch.groupBy(_.head).values.forall(_.size == 7))
  }

  test("op268: Welch t replays the exact-moment double tail per source") {
    val got = MonitorQueries.op268WelchT(spark, sfDir).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))).toMap
    val xs = Tables.documents(spark, sfDir)
      .select("source", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val nt = xs.length.toLong
    val st = xs.map(_._2).sum
    val qt = xs.map(x => x._2 * x._2).sum
    val want = xs.groupBy(_._1).view.mapValues { g =>
      val n1 = g.length.toLong
      val s1 = g.map(_._2).sum
      val q1 = g.map(x => x._2 * x._2).sum
      val m1 = s1.toDouble / n1.toDouble
      val m2 = (st - s1).toDouble / (nt - n1).toDouble
      val v1 = (q1.toDouble - s1.toDouble * m1) / (n1 - 1).toDouble
      val v2 = ((qt - q1).toDouble - (st - s1).toDouble * m2) /
        (nt - n1 - 1).toDouble
      val se1 = v1 / n1.toDouble
      val se2 = v2 / (nt - n1).toDouble
      (n1, nt - n1,
        math.floor((m1 - m2) / math.sqrt(se1 + se2) * 1000).toLong,
        math.floor((se1 + se2) * (se1 + se2) /
          (se1 * se1 / (n1 - 1).toDouble +
            se2 * se2 / (nt - n1 - 1).toDouble) * 1000).toLong)
    }.toMap
    assert(got == want)
    // Welch df is bounded by min(n1,n2)-1 below and n1+n2-2 above
    got.foreach { case (src, (n1, n2, _, df)) =>
      assert(df >= (math.min(n1, n2) - 1) * 1000 - 1000 &&
        df <= (n1 + n2 - 2) * 1000,
        s"df out of Welch bounds for $src")
    }
  }
}
