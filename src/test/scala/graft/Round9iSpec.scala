package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 ninth batch: the classical-statistics quartet — Theil–Sen
  * robust trend (q301), Kruskal–Wallis k-sample rank test (q302),
  * Brown–Forsythe variance-equality test (q303), and the Welch-t /
  * Cohen's-d segment battery (q304). Driver-side exact replays on
  * sf0.001.
  *
  * No rounding-boundary margin assertions here on purpose: every
  * gridded value in these four queries is the HALF_UP rounding of a
  * double that both engines construct with the IDENTICAL operation
  * sequence over exactly-representable integers (no libm op, no
  * cross-engine float summation) — the two engines cannot disagree on
  * the double, so they cannot disagree on its rounding either (and a
  * legitimate exact .5 hit rounds away-from-zero on both).
  */
class Round9iSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  /** Exact doubled median of a non-empty integer sample (2·mid for odd
    * n, lo+hi for even — what `(percentile(x,0.5)*2).cast("long")`
    * computes, with zero float). */
  private def med2(xs: Seq[Long]): Long = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) 2 * s(n / 2) else s(n / 2 - 1) + s(n / 2)
  }

  // --------------------------------------------------------------- q301

  test("q301 Theil–Sen: exact pair-slope median replay; monotone data gives the known slope") {
    val daily = Tables.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1) / 1000 / 86400000000L))
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.length.toLong) }
      .toSeq
    val expected = daily.groupBy(_._1).map { case (t, xs) =>
      val pairs = for {
        (_, d1, c1) <- xs; (_, d2, c2) <- xs if d1 < d2
      } yield halfUp((c2 - c1).toDouble / (d2 - d1).toDouble * 1e6)
      (t, pairs.size.toLong, med2(pairs.toSeq))
    }.toSet
    val got = graft.ext.Patterns.q301(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)

    // Synthetic sanity: counts 10,12,14,...  over days 0..9 → every
    // pair slope is exactly 2, so med2 = 2·2e6.
    val syn = (0 until 10).flatMap(d => Seq.fill(10 + 2 * d)(d))
    val pairs = for (i <- syn.distinct; j <- syn.distinct if i < j)
      yield halfUp((syn.count(_ == j) - syn.count(_ == i)).toDouble /
        (j - i).toDouble * 1e6)
    assert(med2(pairs) == 4000000L)
  }

  // --------------------------------------------------------------- q302

  test("q302 Kruskal–Wallis: exact doubled-rank replay; H nonnegative") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val grid = docs.groupBy(_._2).map { case (v, xs) => (v, xs.length.toLong) }
      .toSeq.sortBy(_._1)
    val cum = grid.scanLeft(0L)(_ + _._2)
    val r2v = grid.zipWithIndex.map { case ((v, nv), i) =>
      v -> (2 * cum(i) + nv + 1)
    }.toMap
    val nn = docs.length.toLong
    val t = grid.map { case (_, nv) => BigInt(nv) * nv * nv - nv }.sum
    val per = docs.groupBy(_._1).map { case (src, xs) =>
      (src, xs.length.toLong, xs.map(x => BigInt(r2v(x._2))).sum.toLong)
    }.toSeq
    val terms = per.map { case (src, n, rs) =>
      val dev = rs.toDouble / n.toDouble - (nn + 1).toDouble
      (src, n, rs, halfUp(n.toDouble * dev * dev * 100))
    }
    val st = terms.map(_._4).sum
    val h = halfUp(3.0 * (st.toDouble / 100.0) /
      (nn.toDouble * (nn + 1).toDouble) /
      (1.0 - t.toDouble / (BigInt(nn) * nn * nn - nn).toDouble) * 1e4)
    val expected = terms.map { case (src, n, rs, te) => (src, n, rs, te, h) }.toSet
    val got = graft.ext.Robust.q302(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(h >= 0L)
  }

  // --------------------------------------------------------------- q303

  test("q303 Brown–Forsythe: exact doubled-median deviation replay; F nonnegative") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val bySrc = docs.groupBy(_._1).map { case (s, xs) => s -> xs.map(_._2) }
    val m2 = bySrc.map { case (s, vs) => s -> med2(vs.toSeq) }
    val per = bySrc.map { case (s, vs) =>
      val z2 = vs.map(v => math.abs(2 * v - m2(s)))
      (s, vs.length.toLong, m2(s), z2.map(BigInt(_)).sum,
        z2.map(z => BigInt(z) * z).sum)
    }.toSeq
    val nn = per.map(_._2).sum
    val stot = per.map(_._4).sum
    val k = per.length.toLong
    val terms = per.map { case (src, n, md, sz, qz) =>
      val mi = sz.toDouble / n.toDouble
      val m = stot.toDouble / nn.toDouble
      (src, n, md, halfUp(mi * 1e4),
        halfUp(n.toDouble * (mi - m) * (mi - m) * 100),
        halfUp((qz.toDouble - mi * sz.toDouble) * 100))
    }
    val ssb = terms.map(_._5).sum
    val ssw = terms.map(_._6).sum
    val f = halfUp((nn - k).toDouble / (k - 1).toDouble *
      (ssb.toDouble / ssw.toDouble) * 1e6)
    val expected = terms.map { case (s, n, md, zm, _, _) => (s, n, md, zm, f) }.toSet
    val got = graft.ext.Robust.q303(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(f >= 0L)
  }

  // --------------------------------------------------------------- q304

  test("q304 Welch battery: exact cents-moment replay; t sign tracks the means") {
    val seg = Tables.table(spark, sf, "customer")
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cents = Tables.table(spark, sf, "orders")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (seg(r.getLong(0)),
        new JBig(r.getDouble(1)).setScale(2, RoundingMode.HALF_UP)
          .scaleByPowerOfTen(2).longValueExact()))
    val per = cents.groupBy(_._1).map { case (s, xs) =>
      (s, xs.length.toLong, xs.map(x => BigInt(x._2)).sum.toLong,
        xs.map(x => BigInt(x._2) * x._2).sum)
    }.toSeq.sortBy(_._1)
    def mv(n: Long, s: Long, q: BigInt): (Double, Double) = {
      val m = s.toDouble / n.toDouble
      (m, (q.toDouble - m * s.toDouble) / (n - 1).toDouble)
    }
    val expected = (for {
      (sa, na, ssa, qa) <- per; (sb, nb, ssb, qb) <- per if sa < sb
    } yield {
      val (ma, va) = mv(na, ssa, qa)
      val (mb, vb) = mv(nb, ssb, qb)
      val se2 = va / na.toDouble + vb / nb.toDouble
      val df = se2 * se2 / (
        (va / na.toDouble) * (va / na.toDouble) / (na - 1).toDouble +
          (vb / nb.toDouble) * (vb / nb.toDouble) / (nb - 1).toDouble)
      val sp2 = ((na - 1).toDouble * va + (nb - 1).toDouble * vb) /
        (na + nb - 2).toDouble
      (sa, sb, na, nb, halfUp((ma - mb) / math.sqrt(se2) * 1e4),
        halfUp(df * 100), halfUp((ma - mb) / math.sqrt(sp2) * 1e6))
    }).toSet
    val got = graft.ext.Robust.q304(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // t and d must share a sign (same numerator, positive denominators),
    // and df must sit within [min(n)−1, n_a+n_b−2] (Welch bounds).
    got.foreach { case (_, _, na, nb, t, df, d) =>
      assert(t.sign == d.sign || t == 0L || d == 0L)
      assert(df >= (math.min(na, nb) - 1) * 100 - 100 &&
        df <= (na + nb - 2) * 100 + 100)
    }
  }
}
