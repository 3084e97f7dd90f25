package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions.substring

/** Round-11 batch: exact driver-side replays of q348-q352 (structural
  * break, first-occurrence precedence, session threshold curve,
  * Cochran-Armitage, rank-biased overlap) plus rounding-boundary
  * margins for every mirrored double chain, in the q331+ pattern.
  */
class Round11Spec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  /** Zero-filled daily order-count series at sf0.001. */
  private def dailySeries(): Array[Long] = {
    val days = spark.read.parquet(s"$sf1/orders.parquet")
      .select(substring($"o_orderdate".cast("string"), 1, 10)).collect()
      .map(r => java.time.LocalDate.parse(r.getString(0)).toEpochDay)
    val hist = days.groupBy(identity).view.mapValues(_.size.toLong).toMap
    (days.min to days.max).map(d => hist.getOrElse(d, 0L)).toArray
  }

  test("q348 Chow break: exact prefix-moment replay, top-5 order, " +
    "margins") {
    val xs = dailySeries()
    val n = xs.length
    // prefix moments
    val cx = xs.scanLeft(BigInt(0))(_ + _).tail
    val cxx = xs.scanLeft(BigInt(0))((a, x) => a + BigInt(x) * x).tail
    val ctx = xs.zipWithIndex
      .scanLeft(BigInt(0)) { case (a, (x, t)) => a + BigInt(t) * x }.tail
    def st(m: BigInt) = (m - 1) * m / 2
    def stt(m: BigInt) = (m - 1) * m * (2 * m - 1) / 6
    def rss(m: BigInt, sx: BigInt, sxx: BigInt, sT: BigInt, sTT: BigInt,
        stx: BigInt): (Double, BigInt, BigInt) = {
      val dxx = m * sxx - sx * sx
      val dtt = m * sTT - sT * sT
      val dtx = m * stx - sT * sx
      ((dxx * dtt - dtx * dtx).toDouble / (m * dtt).toDouble, dtx, dtt)
    }
    val (rssf, _, _) = rss(BigInt(n), cx.last, cxx.last, st(BigInt(n)),
      stt(BigInt(n)), ctx.last)
    var minMargin = Double.MaxValue
    val scored = (8 to n - 8).map { i =>
      val m2 = BigInt(n - i)
      val (r1, dtx1, dtt1) = rss(BigInt(i), cx(i - 1), cxx(i - 1),
        st(BigInt(i)), stt(BigInt(i)), ctx(i - 1))
      val (r2, dtx2, dtt2) = rss(m2, cx.last - cx(i - 1),
        cxx.last - cxx(i - 1), st(BigInt(n)) - st(BigInt(i)),
        stt(BigInt(n)) - stt(BigInt(i)), ctx.last - ctx(i - 1))
      val f = (rssf - r1 - r2) / 2.0 / ((r1 + r2) / (n - 4).toDouble) * 1e6
      val sl = dtx1.toDouble / dtt1.toDouble * 1e6
      val sr = dtx2.toDouble / dtt2.toDouble * 1e6
      minMargin = math.min(minMargin, math.min(boundaryMargin(f),
        math.min(boundaryMargin(sl), boundaryMargin(sr))))
      (i.toLong, n.toLong, halfUp(f), halfUp(sl), halfUp(sr))
    }
    val expected = scored.sortBy(s => (-s._3, s._1)).take(5)
    val got = graft.queries.Round11.q348(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(minMargin > 1e-6, s"chow margins razor-thin: $minMargin")
    // binding: the best split genuinely beats the single-line fit
    assert(expected.head._3 > 1000000L,
      s"no structural signal at all: ${expected.head}")
  }

  test("q349 precedence: exact first-occurrence replay; pairs split " +
    "complementarily; discriminative") {
    val ev = Tables.events(spark, sf1)
      .select($"user_id".cast("long"), $"event_type", $"ts".cast("long"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 1000))
    val firsts = ev.groupBy(e => (e._1, e._2)).view
      .mapValues(_.map(_._3).min).toMap
    val users = ev.map(_._1).distinct
    val types = ev.map(_._2).distinct.sorted
    val nAll = users.length.toLong
    val perType = types.map(t =>
      t -> users.count(u => firsts.contains((u, t))).toLong).toMap
    var minMargin = Double.MaxValue
    val expected = (for {
      a <- types; b <- types if a != b
    } yield {
      val both = users.filter(u =>
        firsts.contains((u, a)) && firsts.contains((u, b)))
      val ord = both.count(u => firsts((u, a)) < firsts((u, b))).toLong
      val sup = ord.toDouble / nAll.toDouble * 1e6
      val conf = ord.toDouble / perType(a).toDouble * 1e6
      val lift = (BigInt(ord) * nAll).toDouble /
        (BigInt(perType(a)) * perType(b)).toDouble * 1e6
      minMargin = math.min(minMargin, math.min(boundaryMargin(sup),
        math.min(boundaryMargin(conf), boundaryMargin(lift))))
      (a, b, perType(a), perType(b), both.length.toLong, ord,
        halfUp(sup), halfUp(conf), halfUp(lift))
    }).toSet
    val got = graft.queries.Round11.q349(spark, sf1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"precedence margins razor-thin: $minMargin")
    // complementarity: (a,b) ordered + (b,a) ordered == both (no µs ties)
    val m = got.map(g => (g._1, g._2) -> g).toMap
    m.foreach { case ((a, b), g) =>
      assert(g._6 + m((b, a))._6 == g._5,
        s"precedence not complementary for ($a,$b)") }
    // discriminative: the first-vs-first form must NOT saturate
    assert(got.exists(g => g._6 > 0L && g._6 < g._5),
      "every pair saturated — the precedence test is vacuous")
  }

  test("q350 session curve: exact replay at all four thresholds; " +
    "monotone consolidation binds") {
    val ev = Tables.events(spark, sf1)
      .select($"user_id".cast("long"), $"event_id".cast("long"),
        $"ts".cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000))
    val byUser = ev.groupBy(_._1).view
      .mapValues(_.map(e => (e._3, e._2)).sorted).toMap
    var minMargin = Double.MaxValue
    val expected = Seq(1L, 6L, 24L, 72L).map { thr =>
      val lim = thr * 3600L * 1000000L
      val sessions = byUser.toSeq.flatMap { case (u, es) =>
        val breaks = es.indices.map(i =>
          if (i == 0 || es(i)._1 - es(i - 1)._1 > lim) 1L else 0L)
        val sids = breaks.scanLeft(0L)(_ + _).tail
        es.zip(sids).groupBy(_._2).map { case (sid, g) =>
          (u, sid, g.length.toLong, g.map(_._1._1).max - g.map(_._1._1).min)
        }
      }
      val ns = sessions.length.toLong
      val nu = byUser.size.toLong
      val nev = sessions.map(_._3).sum
      val singles = sessions.count(_._3 == 1L).toLong
      val ranked = sessions.sortBy(s => (s._4, s._1, s._2))
      val p50 = ranked((ns.toInt + 1) / 2 - 1)._4
      val spu = ns.toDouble / nu.toDouble * 1e6
      val eps = nev.toDouble / ns.toDouble * 1e6
      minMargin = math.min(minMargin,
        math.min(boundaryMargin(spu), boundaryMargin(eps)))
      (thr, ns, halfUp(spu), halfUp(eps), singles, p50)
    }
    val got = graft.queries.Round11.q350(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq.sortBy(_._1)
    assert(got == expected)
    assert(minMargin > 1e-6, s"session margins razor-thin: $minMargin")
    // binding: each threshold step must actually consolidate sessions
    val counts = got.map(_._2)
    assert(counts == counts.sorted.reverse && counts.distinct == counts,
      s"threshold curve flat — thresholds don't discriminate: $counts")
  }

  test("q351 Cochran-Armitage: exact dose-moment replay; all 50 doses " +
    "present; margin") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_quantity".cast("long"), $"l_returnflag").collect()
      .map(r => (r.getLong(0), if (r.getString(1) == "R") 1L else 0L))
    val g = li.groupBy(_._1).view.mapValues(xs =>
      (xs.length.toLong, xs.map(_._2).sum)).toMap
    val nn = BigInt(li.length)
    val rr = BigInt(li.map(_._2).sum)
    val sn = g.map { case (s, (n, _)) => BigInt(s) * n }.sum
    val s2n = g.map { case (s, (n, _)) => BigInt(s) * s * n }.sum
    val tr = g.map { case (s, (_, r)) => BigInt(s) * r }.sum
    val a = nn * tr - sn * rr
    val b = rr * (nn - rr) * (nn * s2n - sn * sn)
    val z = a.toDouble * math.sqrt(nn.toDouble) / math.sqrt(b.toDouble) * 1e6
    val got = graft.queries.Round11.q351(spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (nn.toLong, rr.toLong, g.size.toLong, halfUp(z)))
    assert(boundaryMargin(z) > 1e-6)
    assert(g.size == 50, s"dose grid incomplete: ${g.size}")
    // sanity, not significance: synthetic flags are independent of
    // quantity, so |Z| must stay modest (|z| < 4) — a huge Z here
    // would mean the moment algebra is wrong, not the data trending
    assert(math.abs(z / 1e6) < 4.0, s"implausible trend Z: $z")
  }

  test("q352 RBO: exact rank replay off cents, shared power literals, " +
    "term margins, rankings genuinely differ") {
    val brand = spark.read.parquet(s"$sf1/part.parquet")
      .select($"p_partkey".cast("long"), $"p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_partkey".cast("long"),
        substring($"l_shipdate".cast("string"), 1, 4),
        $"l_extendedprice".cast("decimal(18,2)")).collect()
      .map(r => (brand(r.getLong(0)), r.getString(1),
        r.getDecimal(2).movePointRight(2).longValueExact()))
      .filter(x => x._2 == "1996" || x._2 == "1997")
    val rev = li.groupBy(_._1).view.mapValues { xs =>
      (xs.filter(_._2 == "1996").map(x => BigInt(x._3)).sum,
        xs.filter(_._2 == "1997").map(x => BigInt(x._3)).sum)
    }.toMap
    def ranks(key: String => BigInt): Map[String, Int] =
      rev.keys.toSeq
        .sortWith((x, y) => key(x) > key(y) || (key(x) == key(y) && x < y))
        .zipWithIndex.map { case (b, i) => b -> (i + 1) }.toMap
    val ra = ranks(b => rev(b)._1)
    val rb = ranks(b => rev(b)._2)
    val mx = rev.keys.map(b => b -> math.max(ra(b), rb(b))).toMap
    var minMargin = Double.MaxValue
    val terms = (1 to 20).map { d =>
      val ov = mx.values.count(_ <= d).toLong
      val pw = new JBig(graft.queries.Round11.rboPow
        .find(_._1 == d).get._2).doubleValue()
      val term = 0.1 * pw * ov.toDouble / d.toDouble * 1e9
      // The exact term is the RATIONAL 9^(d-1)·ov·1e9 / (d·10^d); when
      // twice that is an integer the term sits ON a grid boundary by
      // construction (e.g. d=8, ov=6 → exactly …267.5) — deterministic
      // cross-engine because the double chain is mirrored, so only
      // genuinely-inexact terms owe a margin.
      val twiceExact = BigInt(9).pow(d - 1) * ov * BigInt(2) *
        BigInt(10).pow(9)
      val onGrid = twiceExact % (BigInt(d) * BigInt(10).pow(d)) == 0
      if (!onGrid)
        minMargin = math.min(minMargin, boundaryMargin(term))
      (d.toLong, ov, halfUp(term))
    }
    val rbo = terms.map(_._3).sum
    val got = graft.queries.Round11.q352(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq.sortBy(_._1)
    assert(got == terms.map(t => (t._1, t._2, t._3, rbo)))
    assert(minMargin > 1e-6, s"rbo term margins razor-thin: $minMargin")
    // binding: the two year-rankings genuinely differ AND genuinely
    // overlap — RBO strictly inside (0, 1)
    assert(rbo > 0L && rbo < 1000000000L, s"degenerate RBO: $rbo")
    assert(mx.values.exists(_ > 1), "identical rankings — RBO vacuous")
    // overlap is monotone nondecreasing and complete at depth >= 2*|B|
    assert(terms.map(_._2) == terms.map(_._2).sorted)
  }
}
