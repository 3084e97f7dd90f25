package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 fourteenth batch: embedding alignment & uniformity (q317),
  * Apriori triple itemsets (q318), near-dup graph transitivity (q319).
  * Driver-side exact replays on sf0.001; q317's exp/ln grid margins
  * pinned at BOTH gate SFs (the q134 discipline — its cos values are
  * identical-by-construction doubles, but exp/ln are libm calls).
  */
class Round9nSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double =
    math.abs(math.abs(x - math.floor(x)) - 0.5)

  // --------------------------------------------------------------- q317

  /** Replay; returns (n_unif, n_align, unif_e6, align_e6, minMargin). */
  private def alignUnifReplay(sfDir: String): (Long, Long, Long, Long, Double) = {
    val rows = Tables.table(spark, sfDir, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray.map(x => halfUp(x.toDouble * 1000))))
      .sortBy(_._1)
    val withN2 = rows.map { case (id, l, qv) =>
      (id, l, qv, qv.map(x => x * x).sum)
    }.filter(_._4 > 0L)
    val byId = withN2.map(x => x._1 -> x).toMap
    def cos(a: (Long, Long, Array[Long], Long),
            b: (Long, Long, Array[Long], Long)): Double =
      a._3.zip(b._3).map { case (x, y) => x * y }.sum.toDouble /
        math.sqrt((a._4 * b._4).toDouble)
    var minMargin = Double.MaxValue
    def grid(x: Double): Long = {
      minMargin = math.min(minMargin, boundaryMargin(x * 1e9))
      halfUp(x * 1e9)
    }
    val unifT = Seq(1L, 7919L).flatMap { o =>
      withN2.flatMap { a =>
        byId.get(a._1 + o).map(b => grid(math.exp(4.0 * cos(a, b) - 4.0)))
      }
    }
    val alignT = withN2.groupBy(_._2).values.toSeq.flatMap { xs =>
      val s = xs.sortBy(_._1)
      s.zip(s.tail).map { case (a, b) => grid(2.0 - 2.0 * cos(a, b)) }
    }
    val unif = halfUp(math.log(
      unifT.map(BigInt(_)).sum.toDouble / unifT.size.toDouble / 1e9) * 1e6)
    val align = halfUp(
      alignT.map(BigInt(_)).sum.toDouble / alignT.size.toDouble / 1e9 * 1e6)
    (unifT.size.toLong, alignT.size.toLong, unif, align, minMargin)
  }

  test("q317 alignment/uniformity: exact gridded replay; metrics in their bands") {
    val (nu, na, u, a, _) = alignUnifReplay(sf)
    val got = graft.ext.Similarity.q317(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3)) ==
      (nu, na, u, a))
    // Uniformity = ln mean exp(4cos-4) with cos in [-1,1] → value in
    // [-8, 0]; alignment = mean (2-2cos) in [0, 4].
    assert(u >= -8000000L && u <= 0L, s"uniformity out of band: $u")
    assert(a >= 0L && a <= 4000000L, s"alignment out of band: $a")
  }

  test("q317: e9 exp/ln grid margins hold at BOTH gate SFs") {
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val m = alignUnifReplay(d)._5
      assert(m > 1e-4, s"$d: exp-term margin collapsed: $m")
    }
  }

  // --------------------------------------------------------------- q318

  test("q318 triple itemsets: exact replay; anti-monotone vs pair supports") {
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val baskets = li.groupBy(_._1).map { case (o, xs) =>
      o -> xs.map(_._2).distinct.sorted.toSeq
    }
    val pairSupp = baskets.values.flatMap { ps =>
      for (a <- ps; b <- ps if a < b) yield (a, b)
    }.groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
    val fitems = pairSupp.filter(_._2 >= 2).keySet
      .flatMap(e => Seq(e._1, e._2))
    val nOrders = baskets.size.toLong
    val tripSupp = baskets.values.flatMap { ps0 =>
      val ps = ps0.filter(fitems)
      for (a <- ps; b <- ps if a < b; c <- ps if b < c) yield (a, b, c)
    }.groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
      .filter(_._2 >= 2)
    val expected = tripSupp.map { case ((a, b, c), n) =>
      (a, b, c, n, halfUp(n.toDouble / nOrders.toDouble * 1e6))
    }.toSet
    val got = graft.ext.Patterns.q318(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // Anti-monotonicity: every sub-pair of an output triple carries at
    // least the triple's support.
    expected.foreach { case (a, b, c, n, _) =>
      Seq((a, b), (a, c), (b, c)).foreach { p =>
        assert(pairSupp(p) >= n, s"sub-pair $p below triple ($a,$b,$c)=$n")
      }
    }
  }

  // --------------------------------------------------------------- q321

  test("q321 dedup-signal overlap: set algebra over certified pair sets; cos margins tracked") {
    val tp = graft.ext.Dedup.q65(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rows = Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1),
        r.getSeq[Float](2).toArray.map(_.toDouble)))
      .filter(_._1 < 1000)
    def unit(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    var minMargin = Double.MaxValue
    val ep = (for {
      a <- rows; b <- rows
      if a._2 == b._2 && a._1 < b._1
    } yield {
      val sim = unit(a._3).zip(unit(b._3)).map { case (x, y) => x * y }.sum
      minMargin = math.min(minMargin, boundaryMargin(sim * 100))
      ((a._1, b._1), halfUp(sim * 100) >= 30)
    }).filter(_._2).map(_._1).toSet
    val both = (tp & ep).size.toLong
    val union = (tp | ep).size.toLong
    val expected = (tp.size.toLong, ep.size.toLong, both,
      if (union > 0) Some(halfUp(both.toDouble / union.toDouble * 1e6))
      else None)
    val got = graft.ext.Dedup.q321(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      if (got.isNullAt(3)) None else Some(got.getLong(3))) == expected)
    // 64-term unit-dot drift is ~1e-13 relative (≈1e-11 on the e2
    // scale); the observed minimum margin is ~2e-5 — six orders above
    // the drift. 1e-6 is the alarm floor, not the observed value.
    assert(minMargin > 1e-6, s"cosine e2 threshold margin collapsed: $minMargin")
  }

  // --------------------------------------------------------------- q320

  test("q320 LF conflicts: exact vote replay; agree+conflict <= overlap") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"n_chars", $"text").collect()
      .map { r =>
        val (nc, t) = (r.getLong(0), r.getString(1))
        val ws = t.split(" ", -1)
        val nw = ws.length.toLong
        val nu = ws.distinct.length.toLong
        val st = ws.count(w => w == "a" || w == "the").toLong
        val dg = t.count(_.isDigit).toLong
        def vote(pos: Boolean, neg: Boolean): Long =
          if (pos) 1L else if (neg) -1L else 0L
        Array(
          vote(nc >= 300, nc < 100),
          vote(2 * nu >= nw, 4 * nu < nw),
          vote(20 * st >= nw, st == 0),
          vote(20 * dg < nc, 5 * dg > nc))
      }
    val names = Seq("len", "unique", "stop", "digit")
    val expected = (for (i <- 0 until 4; j <- i + 1 until 4) yield {
      val ov = docs.count(v => v(i) != 0 && v(j) != 0).toLong
      val ag = docs.count(v => v(i) != 0 && v(i) == v(j)).toLong
      val cf = docs.count(v => v(i) * v(j) == -1).toLong
      (names(i), names(j), ov, ag, cf,
        if (ov > 0) Some(halfUp(ag.toDouble / ov.toDouble * 1e6)) else None,
        if (ov > 0) Some(halfUp(cf.toDouble / ov.toDouble * 1e6)) else None)
    }).toSet
    val got = graft.ext.Curation.q320(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        if (r.isNullAt(6)) None else Some(r.getLong(6)))).toSet
    assert(got == expected)
    expected.foreach { case (_, _, ov, ag, cf, _, _) =>
      assert(ag + cf <= ov, "agreements + conflicts exceed overlap")
    }
    // The rule set is not degenerate on the fixture: some pair overlaps.
    assert(expected.exists(_._3 > 0))
  }

  // --------------------------------------------------------------- q319

  test("q319 transitivity: exact replay off the q65 pair set; bounds hold") {
    val pairs = graft.ext.Dedup.q65(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val deg = pairs.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
    val w2 = deg.values.map(d => d * (d - 1)).sum
    val nodes = deg.keys.toSeq.sorted
    val tri = (for {
      x <- nodes; y <- nodes if x < y && pairs((x, y))
      z <- nodes if y < z && pairs((y, z)) && pairs((x, z))
    } yield 1).size.toLong
    val expected = (pairs.size.toLong, w2 / 2, tri,
      if (w2 > 0) Some(halfUp(2.0 * (3 * tri).toDouble / w2.toDouble * 1e6))
      else None)
    val got = graft.ext.Dedup.q319(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      if (got.isNullAt(3)) None else Some(got.getLong(3))) == expected)
    // 0 <= transitivity <= 1; wedges bound triangles (W >= 3T).
    expected._4.foreach(t => assert(t >= 0L && t <= 1000000L))
    assert(w2 / 2 >= 3 * tri)
  }
}
