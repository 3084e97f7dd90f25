package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions.{col, substring}

/** Exact driver-side replays of the round-11 q356-q367 batch: the
  * embedding diagnostics (LID, cosine concentration, IVF probe curve),
  * the series shelf (Ljung-Box, PACF, Page-Hinkley, Grubbs), the
  * warehouse shelf (cohort LTV, ABC-XYZ, duplicate invoices), and the
  * governance/graph pair (l-diversity, rich club). Same discipline as
  * Round11Spec/Round11bSpec: BigInt moments, bit-mirrored double
  * chains, rounding-boundary margins on every gridded output.
  */
class Round11cSpec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  /** Zero-filled daily order-count series (Round11Spec's fixture). */
  private def dailySeries(): Array[Long] = {
    val days = spark.read.parquet(s"$sf1/orders.parquet")
      .select(substring($"o_orderdate".cast("string"), 1, 10)).collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)).toEpochDay)
    val hist = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (days.min to days.max).map(d => hist.getOrElse(d, 0L)).toArray
  }

  /** Exact lag-covariance moments: (n, den, num(1..maxLag)). */
  private def lagMoments(xs: Array[Long], maxLag: Int)
      : (Long, BigInt, Map[Int, BigInt]) = {
    val n = xs.length.toLong
    val sx = xs.map(BigInt(_)).sum
    val d = xs.map(x => BigInt(n) * x - sx)
    val den = d.map(v => v * v).sum
    val nums = (1 to maxLag).map { k =>
      k -> (0 until xs.length - k).map(i => d(i) * d(i + k)).sum
    }.toMap
    (n, den, nums)
  }

  test("q359 Ljung-Box: exact gridded-term replay, cumulative Q, margins") {
    val xs = dailySeries()
    val (n, den, nums) = lagMoments(xs, 7)
    var cum = 0L
    var minMargin = Double.MaxValue
    val expected = (1 to 7).map { k =>
      val r = nums(k).toDouble / den.toDouble
      val acf = r * 1e6
      val term = nums(k).toDouble / den.toDouble *
        (nums(k).toDouble / den.toDouble) / (n - k).toDouble * 1e12
      cum += halfUp(term)
      val q = n.toDouble * (n + 2).toDouble * cum.toDouble / 1e12 * 1e6
      minMargin = math.min(minMargin,
        math.min(boundaryMargin(acf), math.min(boundaryMargin(term),
          boundaryMargin(q))))
      (k.toLong, n, halfUp(acf), halfUp(q))
    }
    val got = graft.queries.Round11.queries("q359_ljung_box")(spark, sf1)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    assert(minMargin > 1e-6, s"q359 margins razor-thin: $minMargin")
    // binding: the daily series is genuinely autocorrelated at this
    // fixture (weekly cadence) — Q must grow strictly with h
    assert(expected.map(_._4).sliding(2).forall(p => p(1) >= p(0)))
  }

  test("q360 PACF: exact unrolled Durbin-Levinson replay, lag-1 equals " +
    "ACF, margins") {
    val xs = dailySeries()
    val (n, den, nums) = lagMoments(xs, 5)
    val r = (1 to 5).map(k => nums(k).toDouble / den.toDouble)
    val p11 = r(0)
    val p22 = (r(1) - p11 * r(0)) / (1.0 - p11 * r(0))
    val p21 = p11 - p22 * p11
    val p33 = (r(2) - (p21 * r(1) + p22 * r(0))) /
      (1.0 - (p21 * r(0) + p22 * r(1)))
    val p31 = p21 - p33 * p22
    val p32 = p22 - p33 * p21
    val p44 = (r(3) - (p31 * r(2) + p32 * r(1) + p33 * r(0))) /
      (1.0 - (p31 * r(0) + p32 * r(1) + p33 * r(2)))
    val p41 = p31 - p44 * p33
    val p42 = p32 - p44 * p32
    val p43 = p33 - p44 * p31
    val p55 = (r(4) - (p41 * r(3) + p42 * r(2) + p43 * r(1) + p44 * r(0))) /
      (1.0 - (p41 * r(0) + p42 * r(1) + p43 * r(2) + p44 * r(3)))
    val pacf = Seq(p11, p22, p33, p44, p55)
    val got = graft.queries.Round11.queries("q360_pacf")(spark, sf1)
      .collect().map(r0 => (r0.getLong(0), r0.getLong(1), r0.getLong(2)))
      .toSeq
    assert(got == (1 to 5).map(k =>
      (k.toLong, n, halfUp(pacf(k - 1) * 1e6))))
    val minMargin = pacf.map(p => boundaryMargin(p * 1e6)).min
    assert(minMargin > 1e-6, s"q360 margins razor-thin: $minMargin")
    // PACF(1) IS the lag-1 autocorrelation by definition
    assert(halfUp(p11 * 1e6) == halfUp(r(0) * 1e6))
  }

  test("q361 Page-Hinkley: exact n-scaled walk replay, margin") {
    val xs = dailySeries()
    val n = BigInt(xs.length)
    val sx = xs.map(BigInt(_)).sum
    var cx = BigInt(0)
    var rmin = BigInt(0); var first = -1L; var alarms = 0L
    var phMax = BigInt(0)
    xs.zipWithIndex.foreach { case (x, t) =>
      cx += x
      val nm = n * cx - BigInt(t + 1) * sx
      if (t == 0 || nm < rmin) rmin = if (t == 0) nm else rmin.min(nm)
      val ph = nm - rmin
      if (ph > phMax) phMax = ph
      if (ph > BigInt(50) * n) {
        alarms += 1
        if (first < 0) first = t.toLong
      }
    }
    val phE2 = phMax.toDouble / n.toDouble * 100
    val got = graft.queries.Round11.queries("q361_page_hinkley")(spark, sf1)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1),
      if (got.isNullAt(2)) -1L else got.getLong(2), got.getLong(3)) ==
      (n.toLong, halfUp(phE2), first, alarms))
    assert(boundaryMargin(phE2) > 1e-6)
  }

  test("q362 Grubbs: exact three-round remove-the-argmax replay, margins") {
    var rem = dailySeries().zipWithIndex
      .map { case (x, t) => (t.toLong, x) }.toVector
    val expected = (1 to 3).map { round =>
      val n = BigInt(rem.size)
      val sx = rem.map(p => BigInt(p._2)).sum
      val sxx = rem.map(p => BigInt(p._2) * p._2).sum
      val scored = rem.map { case (t, x) => (t, x, (n * x - sx).abs) }
      val top = scored.sortWith { case ((t1, _, d1), (t2, _, d2)) =>
        d1 > d2 || (d1 == d2 && t1 < t2)
      }.head
      val g = top._3.toDouble / n.toDouble /
        math.sqrt((n * sxx - sx * sx).toDouble /
          (n.toDouble * (n - 1).toDouble)) * 1e6
      rem = rem.filterNot(p => p._1 == top._1)
      (round.toLong, top._1, top._2, n.toLong, halfUp(g), boundaryMargin(g))
    }
    val got = graft.queries.Round11.queries("q362_grubbs_scan")(spark, sf1)
      .collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
    assert(got == expected.map(e => (e._1, e._2, e._3, e._4, e._5)))
    assert(expected.map(_._6).min > 1e-6)
    // the scan genuinely removes: remaining count drops by 1 per round
    assert(expected.map(_._4) == Seq(expected.head._4,
      expected.head._4 - 1, expected.head._4 - 2))
  }

  test("q363 cohort LTV: exact cents replay; cumulative share ends at 1") {
    val o = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_custkey", substring($"o_orderdate".cast("string"), 1, 7),
        $"o_totalprice".cast("decimal(18,2)")).collect()
      .map { r =>
        val ym = r.getString(1).split("-")
        (r.getLong(0), ym(0).toLong * 12 + ym(1).toLong - 1,
          r.getDecimal(2).movePointRight(2).longValueExact())
      }
    val cohort = o.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val cells = o.groupBy(x => (cohort(x._1), x._2 - cohort(x._1)))
      .map { case ((c, i), xs) =>
        (c, i, BigInt(xs.map(x => BigInt(x._3)).sum.toLong),
          xs.map(_._1).distinct.size.toLong)
      }.toSeq.sortBy(x => (x._1, x._2))
    val expected = cells.groupBy(_._1).toSeq.flatMap { case (c, xs) =>
      val sorted = xs.sortBy(_._2)
      val tot = sorted.map(_._3).sum
      var cum = BigInt(0)
      sorted.map { case (_, i, rev, nc) =>
        cum += rev
        val share = cum.toDouble / tot.toDouble * 1e6
        (c, i, nc, rev.toLong, cum.toLong, halfUp(share),
          boundaryMargin(share))
      }
    }.sortBy(x => (x._1, x._2))
    val got = graft.queries.Round11.queries("q363_cohort_ltv")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected.map(e => (e._1, e._2, e._3, e._4, e._5, e._6)))
    assert(expected.map(_._7).min > 1e-6)
    // each cohort's final cumulative share is exactly 1
    expected.groupBy(_._1).values.foreach { xs =>
      assert(xs.maxBy(_._2)._6 == 1000000L)
    }
  }

  test("q364 ABC-XYZ: exact class replay; census covers the catalog") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_partkey", substring($"l_shipdate".cast("string"), 1, 7),
        $"l_extendedprice".cast("decimal(18,2)"),
        $"l_quantity".cast("long")).collect()
      .map { r =>
        val ym = r.getString(1).split("-")
        (r.getLong(0), ym(0).toLong * 12 + ym(1).toLong - 1,
          r.getDecimal(2).movePointRight(2).longValueExact(), r.getLong(3))
      }
    val monthly = li.groupBy(x => (x._1, x._2)).view.mapValues(xs =>
      (xs.map(_._4).sum, xs.map(x => BigInt(x._3)).sum)).toMap
    val per = monthly.toSeq.groupBy(_._1._1).map { case (p, xs) =>
      val m = BigInt(xs.size)
      val x = xs.map(_._2._2).sum
      val sq = xs.map(v => BigInt(v._2._1)).sum
      val sqq = xs.map(v => BigInt(v._2._1) * v._2._1).sum
      (p, m, x, sq, sqq)
    }.toSeq
    val tot = per.map(_._3).sum
    val ranked = per.sortWith { case ((p1, _, x1, _, _), (p2, _, x2, _, _)) =>
      x1 > x2 || (x1 == x2 && p1 < p2)
    }
    var before = BigInt(0)
    val labeled = ranked.map { case (p, m, x, sq, sqq) =>
      val abc =
        if (before * 100 < tot * 80) "A"
        else if (before * 100 < tot * 95) "B" else "C"
      before += x
      val num = m * (m * sqq - sq * sq)
      val den = (m - 1) * sq * sq
      val xyz =
        if (m <= 1) "Z"
        else if (num * 3 <= den) "X"
        else if (num * 2 <= den) "Y" else "Z"
      (abc, xyz, x)
    }
    val expected = labeled.groupBy(l => (l._1, l._2)).map { case ((a, z), xs) =>
      val rev = xs.map(_._3).sum
      val share = rev.toDouble * 100 / tot.toDouble * 1e6
      (a, z, xs.size.toLong, rev.toLong, halfUp(share))
    }.toSeq.sortBy(x => (x._1, x._2))
    val got = graft.queries.Round11.queries("q364_abc_xyz")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    assert(labeled.size == per.size)
    // the matrix genuinely splits on BOTH axes at this fixture
    assert(labeled.map(_._1).distinct.size == 3)
    assert(labeled.map(_._2).distinct.size == 3)
  }

  test("q365 duplicate invoices: exact blocking-pair replay") {
    val o = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_custkey", $"o_totalprice".cast("decimal(18,2)"),
        substring($"o_orderdate".cast("string"), 1, 10), $"o_orderkey")
      .collect().map { r =>
        val p = r.getDecimal(1).movePointRight(2).longValueExact()
        (r.getLong(0), p, p / 1000000L,
          java.time.LocalDate.parse(r.getString(2)).toEpochDay, r.getLong(3))
      }.toSeq
    val pairs = o.groupBy(x => (x._1, x._3)).values.toSeq.flatMap { xs =>
      for {
        a <- xs; b <- xs
        if a._5 < b._5 && math.abs(a._4 - b._4) <= 30
      } yield (math.abs(a._4 - b._4) / 7, a._1, math.abs(a._2 - b._2))
    }
    val expected = pairs.groupBy(_._1).map { case (w, xs) =>
      (w, xs.size.toLong, xs.map(_._2).distinct.size.toLong,
        xs.map(_._3).sum)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.Round11.queries("q365_dup_invoices")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    assert(pairs.nonEmpty, "dup-invoice screen is vacuous at sf0.001")
  }

  // ---- embedding diagnostics (Round11bSpec's unit-vector discipline)

  private def unitVecs(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf1/embeddings.parquet")
      .select($"vec_id", $"embedding").collect().map { r =>
        val d = r.getSeq[Float](1).map(_.toDouble).toArray
        var acc = 0.0
        var i = 0
        while (i < d.length) { acc += d(i) * d(i); i += 1 }
        val nrm = math.sqrt(acc)
        r.getLong(0) -> d.map(_ / nrm)
      }.toMap

  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  test("q356 LID: exact per-term ln-grid replay, margins, plausible range") {
    val u = unitVecs()
    val ids = u.keys.toSeq.sorted
    val expected = ids.filter(_ < 50).map { q =>
      val knn = ids.filter(_ != q).map(d => d -> dotLR(u(q), u(d)))
        .sortWith { case ((d1, s1), (d2, s2)) =>
          s1 > s2 || (s1 == s2 && d1 < d2)
        }.take(10)
      val simk = knn.last._2
      val terms = knn.map(_._2).filter(s => s < 1.0 && simk < 1.0)
        .map(s => halfUp(math.log((1.0 - s) / (1.0 - simk)) * 1e9))
      val sum = terms.sum
      val lid = -terms.size.toDouble * 1e9 / sum.toDouble * 1e4
      assert(boundaryMargin(lid) > 1e-6, s"q356 margin at qid=$q: $lid")
      (q, terms.size.toLong, halfUp(lid))
    }
    val got = graft.ext.Similarity.queries("q356_lid_mle")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // LID of a 64-d synthetic cloud: positive and below ambient dim·1e4
    assert(expected.forall(e => e._3 > 0L && e._3 < 64L * 10000L))
  }

  test("q357 cosine concentration: exact gridded-moment replay") {
    val u = unitVecs()
    val ids = u.keys.toSeq.filter(_ < 64).sorted
    val s9 = for {
      a <- ids; b <- ids if a < b
    } yield halfUp(dotLR(u(a), u(b)) * 1e9)
    val n = BigInt(s9.size)
    val ss = s9.map(BigInt(_)).sum
    val sqq = s9.map(v => BigInt(v) * v).sum
    val mean = ss.toDouble / n.toDouble / 1e9 * 1e6
    val std = math.sqrt((n * sqq - ss * ss).toDouble /
      (n.toDouble * (n - BigInt(1)).toDouble)) / 1e9 * 1e6
    val fr = s9.count(_ > 300000000L).toDouble / n.toDouble * 1e6
    val got = graft.ext.Similarity.queries("q357_cosine_concentration")(
      spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) ==
      (n.toLong, halfUp(mean), halfUp(std), s9.min, s9.max, halfUp(fr)))
    assert(boundaryMargin(mean) > 1e-6 && boundaryMargin(std) > 1e-6)
  }

  test("q358 IVF probe curve: exact integer cell ranking + recall " +
    "replay; recall weakly rises with nprobe") {
    val rows = spark.read.parquet(s"$sf1/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding").collect().map { r =>
        val d = r.getSeq[Float](2).map(_.toDouble).toArray
        var acc = 0.0; var i = 0
        while (i < d.length) { acc += d(i) * d(i); i += 1 }
        val nrm = math.sqrt(acc)
        (r.getLong(0), r.getInt(1).toLong, d.map(_ / nrm))
      }
    val u = rows.map(r => r._1 -> r._3).toMap
    val lbl = rows.map(r => r._1 -> r._2).toMap
    val ids = rows.map(_._1).toSeq.sorted
    val s9 = rows.map(r => r._1 -> r._3.map(x => halfUp(x * 1e9))).toMap
    val cent: Map[(Long, Int), Long] = rows.groupBy(_._2).flatMap {
      case (l, xs) =>
        (0 until 64).map { i =>
          val sv = xs.map(x => BigInt(s9(x._1)(i))).sum
          (l, i) -> halfUp(sv.toDouble / xs.size.toDouble)
        }
    }
    val labels = rows.map(_._2).distinct.sorted
    def top10(scored: Seq[(Long, Double)]): Set[Long] =
      scored.sortWith { case ((d1, v1), (d2, v2)) =>
        v1 > v2 || (v1 == v2 && d1 < d2)
      }.take(10).map(_._1).toSet
    val probes = ids.filter(_ < 50)
    val exact = probes.map(q =>
      q -> top10(ids.map(d => d -> dotLR(u(q), u(d))))).toMap
    val cellRank = probes.map { q =>
      q -> labels.map(l =>
        l -> (0 until 64).map(i => BigInt(s9(q)(i)) * cent((l, i))).sum)
        .sortWith { case ((l1, v1), (l2, v2)) =>
          v1 > v2 || (v1 == v2 && l1 < l2)
        }.map(_._1)
    }.toMap
    val expected = Seq(1, 2, 3).map { np =>
      val hits = probes.map { q =>
        val cells = cellRank(q).take(np).toSet
        val cand = ids.filter(d => cells(lbl(d)))
        (exact(q) & top10(cand.map(d => d -> dotLR(u(q), u(d))))).size.toLong
      }
      val sum = hits.sum
      val recall = sum.toDouble / (probes.size * 10).toDouble * 1e4
      (np.toLong, probes.size.toLong, sum, halfUp(recall))
    }
    val got = graft.ext.Similarity.queries("q358_ivf_probe_curve")(
      spark, sf1).collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // more probes can only add candidates → recall weakly rises
    assert(expected.map(_._3).sliding(2).forall(p => p(1) >= p(0)))
  }

  test("q366 l-diversity: exact census replay; at-risk groups exist " +
    "or the histogram starts above l=2") {
    val c = spark.read.parquet(s"$sf1/customer.parquet")
      .select($"c_nationkey".cast("long"), $"c_mktsegment",
        $"c_acctbal".cast("decimal(18,2)")).collect()
      .map { r =>
        val cents = r.getDecimal(2).movePointRight(2).longValueExact()
        ((r.getLong(0), r.getString(1)),
          math.floor(cents.toDouble / 100000.0).toLong)
      }
    val groups = c.groupBy(_._1).view.mapValues { xs =>
      (xs.map(_._2).distinct.size.toLong, xs.size.toLong)
    }.toMap
    val expected = groups.values.groupBy(_._1).map { case (l, xs) =>
      (l, xs.size.toLong, xs.map(_._2).sum,
        if (l < 3) xs.map(_._2).sum else 0L)
    }.toSeq.sortBy(_._1)
    val got = graft.ext.Curation.queries("q366_ldiversity")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
  }

  test("q367 rich club: exact graph replay off the co-order edges") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq.distinct
    val edges = li.groupBy(_._1).values.toSeq.flatMap { xs =>
      val ps = xs.map(_._2).distinct
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.toSet
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    val expected = Seq(2L, 4L, 8L, 16L).map { k =>
      val nodes = deg.count(_._2 > k).toLong
      val ne = edges.count(e => deg(e._1) > k && deg(e._2) > k).toLong
      val phi =
        if (nodes > 1)
          Some(halfUp(2.0 * ne.toDouble /
            (nodes.toDouble * (nodes - 1).toDouble) * 1e6))
        else None
      (k, nodes, ne, phi)
    }
    val got = graft.ext.Graph.queries("q367_rich_club")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got == expected)
    // non-degenerate: the lowest threshold keeps a real subgraph
    assert(expected.head._2 > 1 && expected.head._3 > 0)
  }
}
