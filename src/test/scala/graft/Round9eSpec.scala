package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 fifth batch: Wilson funnel CI (q274), corpus-hapax mass
  * (q275), negative-sampling table (q276), revenue Pareto point
  * (q277). Driver-side exact replays on sf0.001 plus rounding-boundary
  * margins for every gridded double.
  */
class Round9eSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  // --------------------------------------------------------------- q274

  test("q274 Wilson CI: exact replay + e6 margins + interval sanity") {
    val pairs = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val buyers = pairs.filter(_._2 == "purchase").map(_._1).toSet
    var minMargin = Double.MaxValue
    val expected = pairs.groupBy(_._2).map { case (t, xs) =>
      val n = xs.length.toDouble
      val k = xs.count(p => buyers(p._1)).toDouble
      val z = 1.96
      val ph = k / n
      val den = 1.0 + z * z / n
      val center = (ph + z * z / (2.0 * n)) / den
      val hw = (z * math.sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n))) / den
      Seq(ph, center - hw, center + hw).foreach(v =>
        minMargin = math.min(minMargin, boundaryMargin(v * 1e6)))
      (t, xs.length.toLong, xs.count(p => buyers(p._1)).toLong,
        halfUp(ph * 1e6), halfUp((center - hw) * 1e6),
        halfUp((center + hw) * 1e6))
    }.toSet
    val got = graft.ext.Curation.q274(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 grid margin razor-thin: $minMargin")
    // Interval sanity: lo <= phat <= hi; the purchase row sits at
    // phat = 1 where the Wilson UPPER collapses to exactly 1 (algebra:
    // (1 + z²/n)/(1 + z²/n)) while the LOWER pulls strictly inside —
    // the small-n behavior that motivates Wilson over the normal CI.
    got.foreach { g =>
      assert(g._5 <= g._4 && g._4 <= g._6, s"ordering broken: $g")
    }
    val purchase = got.find(_._1 == "purchase").get
    assert(purchase._4 == 1000000L && purchase._5 < 1000000L)
    // Every interval must have real width (the CI is the signal).
    got.foreach(g => assert(g._6 > g._5, s"degenerate interval: $g"))
  }

  // --------------------------------------------------------------- q275

  test("q275 hourly profile: exact replay + diurnal shape binds") {
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), (r.getLong(1) / 1000 / 3600000000L) % 24))
    val expected = ev.groupBy(_._1).map { case (t, xs) =>
      val byHr = xs.groupBy(_._2).map { case (h, ys) => (h, ys.size.toLong) }
      val (ph, pn) = byHr.toSeq.minBy { case (h, n) => (-n, h) }
      val tot = byHr.values.sum
      val nh = byHr.size.toLong
      (t, ph, pn, tot, nh,
        halfUp(pn.toDouble / tot * 1e6),
        halfUp(pn.toDouble * nh / tot * 1e4))
    }.toSet
    val got = graft.ext.Patterns.q275(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // The profile must measure shape: some type's peak carries more
    // than the flat share (flatness > 1), and hours actually spread.
    assert(got.forall(_._5 > 1))
    assert(got.exists(_._7 > 10000L), "no diurnal peak measured")
  }

  // --------------------------------------------------------------- q276

  test("q276 negsample table: exact replay + damping binds") {
    val cnt = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect()
      .flatMap(_.getString(0).split(" ", -1))
      .groupBy(identity).map { case (w, xs) => (w, xs.length.toLong) }.toSeq
    val ranked = cnt.sortBy { case (w, c) => (-c, w) }.take(50)
    var minMargin = Double.MaxValue
    var cum = 0L
    val expected = ranked.zipWithIndex.map { case ((w, c), i) =>
      val we = math.pow(c.toDouble, 0.75) * 1e6
      minMargin = math.min(minMargin, boundaryMargin(we))
      val e6 = halfUp(we)
      cum += e6
      (i + 1L, w, c, e6, cum)
    }
    val got = graft.ext.Ranking.q276(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got == expected)
    assert(minMargin > 1e-3, s"e6 pow margin razor-thin: $minMargin")
    // The 3/4 damping must bind: the top word's share of the damped
    // table is strictly below its raw-frequency share.
    val totRaw = ranked.map(_._2).sum.toDouble
    val totDamped = expected.last._5.toDouble
    assert(expected.head._4 / totDamped < ranked.head._2 / totRaw)
  }

  // --------------------------------------------------------------- q278

  test("q278 quantized recall: exact replay + quantization loss binds") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val unit = vecs.map { case (id, v) =>
      val n = math.sqrt(v.map(x => x * x).sum)
      (id, v.map(_ / n))
    }
    val codes = unit.map { case (id, u) =>
      val scale = 127.0 / u.map(math.abs).max
      (id, u.map(x => math.floor(x * scale).toLong))
    }.toMap
    def ddot(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val qs = unit.filter(_._1 < 50)
    val exact = qs.map { case (qid, qu) =>
      qid -> unit.map { case (did, du) => (did, ddot(qu, du)) }
        .sortBy { case (did, s) => (-s, did) }.take(5).map(_._1).toSet
    }.toMap
    val approx = qs.map { case (qid, _) =>
      val qq = codes(qid)
      qid -> codes.toSeq.map { case (did, dq) =>
        (did, qq.zip(dq).map { case (x, y) => x * y }.sum)
      }.sortBy { case (did, s) => (-s, did) }.take(5).map(_._1).toSet
    }.toMap
    val expected = exact.map { case (qid, ex) =>
      val hits = ex.intersect(approx(qid)).size.toLong
      (qid, hits, halfUp(hits / 5.0 * 10000))
    }.toSet
    val got = graft.ext.Similarity.q278(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // The audit must bind: quantization loses SOME neighbor somewhere,
    // but the index still retrieves most of them.
    assert(got.exists(_._2 < 5), "int8 recall is perfect — audit vacuous")
    assert(got.toSeq.map(_._2).sum > got.size * 2L,
      "recall collapsed below 0.4")
  }

  // --------------------------------------------------------------- q277

  test("q277 revenue Pareto: exact cents replay + concentration binds") {
    val cents = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
      .groupBy(_._1).map { case (ck, xs) => (ck, xs.map(_._2).sum) }
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_nationkey", $"n_name").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toMap
    val custNation = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        nation(r.getAs[Number](1).longValue()))).toMap
    val expected = cents.toSeq.map { case (ck, c) => (custNation(ck), ck, c) }
      .groupBy(_._1).map { case (nm, xs) =>
        val s = xs.sortBy { case (_, ck, c) => (-c, ck) }
        val n = s.length.toLong
        val cut = (n + 9) / 10
        val tot = s.map(x => BigInt(x._3)).sum
        val top = s.take(cut.toInt).map(x => BigInt(x._3)).sum
        (nm, n, cut, tot.toLong, top.toLong,
          halfUp(top.toDouble / tot.toDouble * 1e6))
      }.toSet
    val got = graft.queries.Round9.q277(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // Concentration must bind: every nation's top decile holds more
    // than its proportional share, less than everything.
    got.foreach { g =>
      assert(g._5 < g._4, s"top decile holds ALL revenue: $g")
      assert(g._6 > 1000000L * g._3 / g._2, s"no concentration measured: $g")
    }
  }
}
