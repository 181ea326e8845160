package graft

import org.apache.spark.sql.functions._

import graft.queries.WarehouseQueries
import graft.sources.Tables

/** Semantics of the warehouse-infrastructure pack (op179–op183)
  * against naive driver-side replays on the sf0.001 fixture. */
class WarehouseSpec extends SparkSpec {

  test("op179: boundaries are the exact nearest-rank cut points") {
    val lens = Tables.documents(spark, sfDir).select("n_chars")
      .collect().map(_.getLong(0)).sorted
    val n = lens.length
    val r = WarehouseQueries.op179RangeBoundaries(spark, sfDir).collect()
    assert(r.length == 16)
    r.foreach { row =>
      val i = row.getAs[Long]("i")
      val target = ((i * n + 15) / 16)
      assert(row.getAs[Long]("target_rank") == target)
      // nearest-rank boundary: the target-th smallest value
      assert(row.getAs[Long]("boundary") == lens(target.toInt - 1))
    }
    // last boundary is the max; boundaries are monotone
    assert(r.map(_.getAs[Long]("boundary")).last == lens.last)
    val bs = r.sortBy(_.getAs[Long]("i")).map(_.getAs[Long]("boundary"))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
  }

  test("op180: subtree sums equal the arithmetic-ancestor replay") {
    val parts = Tables.part(spark, sfDir)
      .select(col("p_partkey"),
        round(col("p_retailprice") * 100, 0).cast("long")).collect()
      .map(x => (x.getLong(0) + 1, x.getLong(1)))
    val want = scala.collection.mutable.Map.empty[Long, (Long, Long)]
    parts.foreach { case (node, cents) =>
      var a = node
      while (a >= 1) {
        val (s0, c0) = want.getOrElse(a, (0L, -1L))
        want(a) = (s0 + cents, c0 + 1) // c counts descendants (excl self)
        a = a / 2
      }
    }
    val r = WarehouseQueries.op180TreeRollup(spark, sfDir).collect()
    assert(r.length == parts.length)
    r.foreach { row =>
      val node = row.getAs[Long]("p_partkey") + 1
      val (s, c) = want(node)
      assert(row.getAs[Long]("subtree_cents") == s, s"node $node sum")
      assert(row.getAs[Long]("n_desc") == c, s"node $node desc")
    }
    // root's subtree is the whole forest under node 1
    val rootSum = r.find(_.getAs[Long]("p_partkey") == 0L).get
      .getAs[Long]("subtree_cents")
    assert(rootSum == parts.map(_._2).sum)
  }

  test("op181: salted join result equals the plain join") {
    val got = WarehouseQueries.op181SaltedJoin(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val want = Tables.lineitem(spark, sfDir)
      .join(Tables.supplier(spark, sfDir),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_nationkey").cast("bigint").as("nation"))
      .agg(sum(round(col("l_extendedprice") * 100, 0).cast("long"))
        .as("rev"), count(lit(1)).as("n"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
      .sortBy(_._1)
    assert(got.toSeq == want.toSeq)
  }

  test("op182: purchases partition across touches; window honored") {
    val r = WarehouseQueries.op182Attribution(spark, sfDir).collect()
    val nPurch = Tables.events(spark, sfDir)
      .where(col("event_type") === "purchase").count()
    assert(r.map(_.getAs[Long]("n_purchases")).sum == nPurch)
    // purchases never attribute to themselves
    assert(!r.exists(_.getAs[String]("touch") == "purchase"))
  }

  test("op183: margins and cell stats replay exactly") {
    val r = WarehouseQueries.op183Chisq(spark, sfDir).collect()
    val t = r.map(_.getAs[Long]("o")).sum
    assert(t == Tables.orders(spark, sfDir).count())
    // expected counts reconstruct from emitted margins: per row,
    // e_milli = (R*C*1000) div T with R = Σ o over seg, C = Σ o over prio
    val bySeg = r.groupBy(_.getAs[String]("seg")).view
      .mapValues(_.map(_.getAs[Long]("o")).sum).toMap
    val byPrio = r.groupBy(_.getAs[String]("prio")).view
      .mapValues(_.map(_.getAs[Long]("o")).sum).toMap
    r.foreach { row =>
      val e = bySeg(row.getAs[String]("seg")) *
        byPrio(row.getAs[String]("prio")) * 1000L / t
      assert(row.getAs[Long]("e_milli") == e)
      val dev = row.getAs[Long]("o") * 1000L - e
      assert(row.getAs[Long]("chi_milli") == dev * dev / e)
    }
  }

  test("op188: each purchase reads the version valid at its instant") {
    val r = WarehouseQueries.op188PitLookup(spark, sfDir).collect()
    val evDf = Tables.events(spark, sfDir)
    val ev = evDf.select(col("event_id"), col("user_id"),
      col("event_type"), Tables.tsUsExpr(evDf).as("us"),
      (col("value").cast("decimal(27,4)") * 10000).cast("long"))
      .collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getString(2),
        x.getLong(3), x.getLong(4)))
    val views = ev.filter(_._3 == "view").groupBy(_._2)
    val purchases = ev.filter(_._3 == "purchase")
    assert(r.length == purchases.length)
    val byId = r.map(x => x.getAs[Long]("event_id") -> x).toMap
    purchases.foreach { case (eid, uid, _, us, _) =>
      val row = byId(eid)
      // naive replay: latest view at-or-before the purchase
      val prior = views.getOrElse(uid, Array.empty)
        .filter(v => v._4 <= us).sortBy(v => (v._4, v._1))
      if (prior.isEmpty) {
        assert(row.getAs[Long]("matched") == 0L)
        assert(row.getAs[Long]("view_bp") == -1L)
      } else {
        assert(row.getAs[Long]("matched") == 1L)
        assert(row.getAs[Long]("view_bp") == prior.last._5,
          s"purchase $eid")
      }
    }
    assert(r.exists(_.getAs[Long]("matched") == 0L) ||
      purchases.forall(p => views.contains(p._2)))
  }

  test("op195: normalized values replay the pooled nearest-rank map") {
    val docs = Tables.documents(spark, sfDir)
      .select("doc_id", "lang", "n_chars").collect()
      .map(x => (x.getLong(0), x.getString(1), x.getLong(2)))
    val pooled = docs.map(_._3).sorted
    val nt = pooled.length
    val want = docs.groupBy(_._2).toSeq.flatMap { case (_, rows) =>
      val sorted = rows.sortBy(x => (x._3, x._1))
      val n = sorted.length
      sorted.zipWithIndex.map { case (doc, i) =>
        val r = ((i + 1).toLong * nt + n - 1) / n
        doc._1 -> pooled(r.toInt - 1)
      }.toSeq
    }.toMap
    val r = WarehouseQueries.op195QuantileNorm(spark, sfDir).collect()
    assert(r.length == docs.length)
    r.foreach { row =>
      assert(row.getAs[Long]("norm_chars") ==
        want(row.getAs[Long]("doc_id")), s"doc ${row.getLong(0)}")
    }
    // normalization genuinely changes values somewhere
    assert(r.exists(x =>
      x.getAs[Long]("norm_chars") != x.getAs[Long]("n_chars")))
  }

  test("op196: moved fraction is near 1/(N+1), never modulo-scale") {
    val r = WarehouseQueries.op196ConsistentHash(spark, sfDir).collect()
    val nDocs = r.map(_.getAs[Long]("n_docs")).sum
    val nMoved = r.map(_.getAs[Long]("n_moved")).sum
    assert(nDocs == Tables.documents(spark, sfDir).count())
    assert(r.map(_.getAs[Long]("shard")).toSet.subsetOf(
      (0L until 8L).toSet))
    val movedBp = nMoved * 10000 / nDocs
    // expectation 1/(N+1) = 1111 bp; modulo hashing moves ~8889 bp.
    // generous band for the small fixture: (0, 3x expectation)
    assert(movedBp > 0 && movedBp < 3333,
      s"moved $movedBp bp of $nDocs docs")
    // determinism: a rerun is byte-identical
    val again = WarehouseQueries.op196ConsistentHash(spark, sfDir)
      .collect()
    assert(again.map(_.toSeq).toSeq == r.map(_.toSeq).toSeq)
  }

  test("op197: exactly the bucket holding the dropped row flags") {
    val r = WarehouseQueries.op197AntiEntropy(spark, sfDir).collect()
    assert(r.length == 16)
    val bad = r.filter(_.getAs[Long]("in_sync") == 0L)
    assert(bad.length == 1, "exactly one bucket must mismatch")
    assert(bad(0).getAs[Long]("bucket") == 42L % 16)
    assert(bad(0).getAs[Long]("n_a") == bad(0).getAs[Long]("n_b") + 1)
    // all other buckets byte-agree on count AND content checksum
    r.filter(_.getAs[Long]("in_sync") == 1L).foreach { row =>
      assert(row.getAs[Long]("n_a") == row.getAs[Long]("n_b"))
      assert(row.getAs[Long]("sum_a") == row.getAs[Long]("sum_b"))
    }
  }

  test("op212: segments equal a driver-side ntile replay; grid partitions customers") {
    val got = WarehouseQueries.op212RfmSegments(spark, sfDir).collect()
      .map(r => ((r.getAs[Long]("r_q"), r.getAs[Long]("f_q"),
        r.getAs[Long]("m_q")),
        (r.getAs[Long]("n_customers"), r.getAs[Long]("sum_cents"),
          r.getAs[Long]("min_custkey")))).toMap
    val rows = Tables.orders(spark, sfDir).select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")),
          lit("1995-01-01").cast("date")).cast("long"),
        round(col("o_totalprice") * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val per = rows.groupBy(_._1).map { case (c, rs) =>
      (c, rs.map(_._2).max, rs.length.toLong, rs.map(_._3).sum)
    }.toSeq
    val refDay = rows.map(_._2).max
    // SQL ntile: first (n mod q) buckets take ceil(n/q) rows
    def ntile(order: Seq[Long], q: Int): Map[Long, Long] = {
      val n = order.length
      val base = n / q
      val rem = n % q
      order.zipWithIndex.map { case (c, i) =>
        val b = if (i < rem * (base + 1)) i / (base + 1)
                else rem + (i - rem * (base + 1)) / base
        c -> (b + 1L)
      }.toMap
    }
    val rq = ntile(per.sortBy(p => (refDay - p._2, p._1)).map(_._1), 5)
    val fq = ntile(per.sortBy(p => (-p._3, p._1)).map(_._1), 5)
    val mq = ntile(per.sortBy(p => (-p._4, p._1)).map(_._1), 5)
    val want = per.groupBy(p => (rq(p._1), fq(p._1), mq(p._1)))
      .map { case (k, ps) =>
        k -> (ps.size.toLong, ps.map(_._4).sum, ps.map(_._1).min) }
    assert(got == want)
    // grid partitions the ordering customers exactly
    assert(got.values.map(_._1).sum == per.size.toLong)
    // every quintile axis is balanced within one customer
    Seq(rq, fq, mq).foreach { ax =>
      val sizes = ax.values.groupBy(identity).values.map(_.size)
      assert(sizes.max - sizes.min <= 1)
    }
  }

  test("op214: stream-maintained RFM emits exactly op212's segments") {
    val batch = WarehouseQueries.op212RfmSegments(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = WarehouseQueries.op214StreamRfm(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
    // the day-mod-4 split genuinely spans customers across batches:
    // some customer has orders on days in >1 residue class
    val days = Tables.orders(spark, sfDir).select(col("o_custkey"),
        datediff(to_date(col("o_orderdate")),
          lit("1995-01-01").cast("date")).cast("long") % 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(days.groupBy(_._1).values.exists(_.map(_._2).distinct.size > 1),
      "no customer spans micro-batches — merge path inert")
  }

  test("op222: delta decomposition equals the plain full join-aggregate") {
    val got = WarehouseQueries.op222DeltaJoin(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val want = Tables.customer(spark, sfDir)
      .join(Tables.orders(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy("c_nationkey")
      .agg(count(lit(1)).cast("bigint").as("n_orders"),
        sum(round(col("o_totalprice") * 100, 0).cast("long"))
          .as("sum_cents"))
      .orderBy("c_nationkey").collect().map(_.toSeq).toSeq
    assert(got == want)
    // every leg is genuinely non-empty on the fixture
    val nDeltaC = Tables.customer(spark, sfDir)
      .where(col("c_custkey") % 5 === 2).count()
    val nDeltaO = Tables.orders(spark, sfDir)
      .where(col("o_orderkey") % 7 === 3).count()
    assert(nDeltaC > 0 && nDeltaO > 0, "a delta slice is empty — inert")
  }

  test("op223: stream-maintained join view emits exactly op222's view") {
    val batch = WarehouseQueries.op222DeltaJoin(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val stream = WarehouseQueries.op223StreamDimJoin(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(stream == batch)
    // a nation's orders genuinely span micro-batches
    val spans = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_nationkey").cast("long"),
        (col("o_orderkey") % 4).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(spans.groupBy(_._1).values
      .exists(_.map(_._2).distinct.size > 1), "merge path inert")
  }

  test("op258: FK audit replays the orphan counts; planted orphan flags") {
    val got = graft.queries.WarehouseQueries.op258FkAudit(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // driver replay on one edge: lineitem -> orders
    val childKeys = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_orderkey").collect().map(r =>
        Option(r.get(0)).map(_.asInstanceOf[Long]))
    val parentKeys = graft.sources.Tables.orders(spark, sfDir)
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    val orphans = childKeys.count(k => !k.exists(parentKeys)).toLong
    val n = childKeys.length.toLong
    assert(got(("lineitem", "l_orderkey")) ==
      ((n, orphans, (n - orphans) * 10000 / n)))
    // coverage is a valid share everywhere; whole report present
    assert(got.size == 7)
    assert(got.values.forall(v => v._3 >= 0 && v._3 <= 10000))
    // the orphan arm itself: a planted dangling key is counted
    import spark.implicits._
    val child = Seq(1L, 2L, 999L).toDF("k")
    val parent = Seq(1L, 2L).toDF("p")
    val planted = child.groupBy(col("k")).agg(count(lit(1)).as("m"))
      .join(parent.select(col("p").as("k")).distinct(),
        Seq("k"), "left_anti")
      .agg(coalesce(sum("m"), lit(0L))).collect()(0).getLong(0)
    assert(planted == 1L)
  }

  test("op254: correlation matrix replays the exact BigInt moments") {
    val got = graft.queries.WarehouseQueries.op254CorrMatrix(spark, sfDir)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    val rows = graft.sources.Tables.lineitem(spark, sfDir)
      .selectExpr("CAST(l_quantity AS BIGINT)",
        "CAST(round(l_extendedprice * 100) AS BIGINT)",
        "CAST(round(l_discount * 100) AS BIGINT)",
        "CAST(round(l_tax * 100) AS BIGINT)").collect()
      .map(r => Array(r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    val names = Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    val n = BigInt(rows.length)
    def s(i: Int) = rows.map(r => BigInt(r(i))).sum
    def sp(i: Int, j: Int) = rows.map(r => BigInt(r(i)) * BigInt(r(j))).sum
    val want = (for {
      i <- names.indices; j <- (i + 1) until names.length
    } yield {
      val num = n * sp(i, j) - s(i) * s(j)
      val dx = n * sp(i, i) - s(i) * s(i)
      val dy = n * sp(j, j) - s(j) * s(j)
      val r = math.floor(num.toDouble /
        (math.sqrt(dx.toDouble) * math.sqrt(dy.toDouble)) * 10000d).toLong
      (names(i), names(j)) -> ((n.toLong, r))
    }).toMap
    assert(got == want)
    // correlations are valid bp (the synthetic fixture draws the
    // columns independently, so near-zero r is the expected picture)
    assert(got.values.forall(v => v._2 >= -10000 && v._2 <= 10000))
  }

  test("op253: retraction nets 'R' groups to zero and they vanish") {
    val got = graft.queries.LakehouseQueries.defs("op253_retract_agg")
      .apply(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    // maintained view == from-scratch recompute without the retracted
    // slice (the IVM exactness law), groups keyed 'R' GONE not zeroed
    val li = graft.sources.Tables.lineitem(spark, sfDir)
      .select("l_returnflag", "l_linestatus", "l_quantity").collect()
      .map(r => (r.getString(0), r.getString(1),
        r.getDouble(2).toLong))
    val want = li.filter(_._1 != "R").groupBy(r => (r._1, r._2)).view
      .mapValues(g => (g.map(_._3).sum, g.length.toLong)).toMap
    assert(got == want)
    assert(li.exists(_._1 == "R"), "no retracted slice in the fixture")
    assert(!got.keys.exists(_._1 == "R"), "retracted group survived")
  }

  test("op278: encoding is the out-of-fold mean — leakage-free by value") {
    val got = graft.queries.WarehouseQueries
      .op278TargetEncoding(spark, sfDir).collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3)))).toMap
    val rows = Tables.orders(spark, sfDir)
      .select(col("o_orderpriority"), expr("o_orderkey % 5"),
        round(col("o_totalprice") * 100, 0).cast("long")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val want = rows.groupBy(r => (r._1, r._2)).map { case ((c, f), g) =>
      val out = rows.filter(r => r._1 == c && r._2 != f)
      val enc = BigDecimal(out.map(_._3).sum.toDouble /
          (out.length * 100).toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP) * 10000
      (c, f) -> ((g.length.toLong, enc.toLong))
    }
    assert(got == want.toMap)
    // every (category, fold) cell exists and no two folds of a category
    // share an encoding unless their complements coincide
    assert(got.keys.map(_._1).toSet.size * 5 == got.size)
  }
}
