package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 thirteenth batch: McNemar gate-disagreement test (q313),
  * Markov 8-step conversion absorption (q314), community-vs-brand NMI
  * (q315). q313/q314 are all-integer (exact replays, no margins);
  * q315 passes counts through ln, so its per-term e12 rounding margins
  * are pinned at BOTH gate SFs (the q134 discipline).
  */
class Round9mSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double =
    math.abs(math.abs(x - math.floor(x)) - 0.5)

  // --------------------------------------------------------------- q313

  test("q313 McNemar: exact contingency replay; cells partition the corpus") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"n_chars", $"text").collect()
      .map { r =>
        val ws = r.getString(1).split(" ", -1)
        (if (r.getLong(0) >= 200) 1L else 0L,
          if (2L * ws.distinct.length >= ws.length) 1L else 0L)
      }
    val a = docs.count(x => x._1 == 1 && x._2 == 1).toLong
    val b = docs.count(x => x._1 == 1 && x._2 == 0).toLong
    val c = docs.count(x => x._1 == 0 && x._2 == 1).toLong
    val d = docs.count(x => x._1 == 0 && x._2 == 0).toLong
    val chi2 = if (b + c > 0)
      Some(halfUp((BigInt(b - c) * (b - c)).toDouble / (b + c).toDouble * 1e6))
    else None
    val got = graft.ext.Robust.q313(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      if (got.isNullAt(4)) None else Some(got.getLong(4))) ==
      (a, b, c, d, chi2))
    assert(a + b + c + d == docs.length.toLong)
  }

  // --------------------------------------------------------------- q314

  test("q314 Markov absorption: exact 8-round replay; monotone in k, floored by the direct rate") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { xs =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._4).toList
      (s :+ "END").sliding(2).collect {
        case List(i, j) if i != "purchase" => (i, j)
      }
    }.toSeq
    val c = trans.groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
    val states = c.keys.map(_._1).toSeq.distinct.sorted
    val r = states.map(i => i ->
      c.collect { case ((a, _), n) if a == i => n }.sum).toMap
    val cc = states.map(i => i -> c.getOrElse((i, "purchase"), 0L)).toMap
    def roundDiv(num: BigInt, den: BigInt): Long =
      ((2 * num + den) / (2 * den)).toLong
    var p = states.map(i => i -> 0L).toMap
    val history = (1 to 8).map { _ =>
      p = states.map { i =>
        val acc = states.map(j =>
          BigInt(c.getOrElse((i, j), 0L)) * p(j)).sum
        i -> roundDiv(BigInt(cc(i)) * 1000000000L + acc, BigInt(r(i)))
      }.toMap
      p
    }
    val expected = states.map(i => (i, r(i), cc(i), p(i))).toSet
    val got = graft.ext.Patterns.q314(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2), x.getLong(3)))
      .toSet
    assert(got == expected)
    // Monotone absorption (round & recursion are monotone maps) and the
    // one-step floor p8 >= round(cc/r).
    states.foreach { i =>
      val ps = history.map(_(i))
      assert(ps.zip(ps.tail).forall { case (x, y) => y >= x }, s"$i: $ps")
      assert(p(i) >= roundDiv(BigInt(cc(i)) * 1000000000L, BigInt(r(i))))
      assert(p(i) >= 0L && p(i) <= 1000000000L)
    }
  }

  // --------------------------------------------------------------- q315

  /** LPA labeling replay (the Round9lSpec core, shared here). */
  private def lpaLabels(sfDir: String): Map[Long, Long] = {
    val li = Tables.table(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val support = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).toSeq
      for (p <- ps; q <- ps if p < q) yield (p, q)
    }.groupBy(identity(_)).filter(_._2.size >= 2).keySet
    val sym = support.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val byDst = sym.groupBy(_._2)
    var lab: Map[Long, Long] = byDst.keySet.map(id => id -> id).toMap
    (1 to 4).foreach { _ =>
      val prev = lab
      lab = byDst.map { case (v, ins) =>
        val counts = ins.map(x => prev(x._1)).groupBy(identity(_))
          .map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.sortBy { case (l, n) => (-n, l) }.head._1
      }
    }
    lab
  }

  /** Replayed q315 terms; returns (n, cells, mi_e12, h_ni, h_nj,
    * nmi opt, min margin over every ln-bearing gridded term). */
  private def nmiReplay(sfDir: String):
      (Long, Long, Long, Long, Long, Option[Long], Double) = {
    val lab = lpaLabels(sfDir)
    val brand = Tables.table(spark, sfDir, "part")
      .select($"p_partkey", $"p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val cells = lab.toSeq.map { case (id, l) => (l, brand(id)) }
      .groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
    val ni = cells.groupBy(_._1._1).map { case (l, xs) => l -> xs.values.sum }
    val nj = cells.groupBy(_._1._2).map { case (b, xs) => b -> xs.values.sum }
    val n = cells.values.sum
    var minMargin = Double.MaxValue
    def grid(x: Double): Long = {
      minMargin = math.min(minMargin, boundaryMargin(x * 1e12))
      halfUp(x * 1e12)
    }
    val mi = cells.map { case ((l, b), nij) =>
      grid(nij.toDouble / n.toDouble *
        math.log(n.toDouble * nij.toDouble / (ni(l).toDouble * nj(b).toDouble)))
    }.sum
    val hx = ni.values.map(v =>
      grid(-(v.toDouble / n.toDouble) * math.log(v.toDouble / n.toDouble))).sum
    val hy = nj.values.map(v =>
      grid(-(v.toDouble / n.toDouble) * math.log(v.toDouble / n.toDouble))).sum
    val nmi = if (hx + hy > 0)
      Some(halfUp(2.0 * mi.toDouble / (hx + hy).toDouble * 1e6))
    else None
    (n, cells.size.toLong, mi, hx, hy, nmi, minMargin)
  }

  test("q315 NMI: exact gridded replay; NMI in [0,1]-ish band") {
    val (n, nc, mi, _, _, nmi, _) = nmiReplay(sf)
    val got = graft.ext.Graph.q315(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      if (got.isNullAt(3)) None else Some(got.getLong(3))) ==
      (n, nc, mi, nmi))
    // Plug-in MI is nonnegative; NMI bounded by ~1 (grid slack).
    assert(mi >= 0L)
    nmi.foreach(v => assert(v >= 0L && v <= 1000100L, s"NMI out of band: $v"))
  }

  // --------------------------------------------------------------- q316

  test("q316 silhouette: exact integer-moment replay; means within [-1, 1]") {
    val rows = Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray.map(x => halfUp(x.toDouble * 1000))))
    val byLabel = rows.groupBy(_._2)
    val cent = byLabel.map { case (l, xs) =>
      l -> ((xs.length.toLong,
        Array.tabulate(64)(i => xs.map(x => BigInt(x._3(i))).sum)))
    }
    def dist(x: Array[Long], l: Long): Double = {
      val (n, sv) = cent(l)
      val a2 = (0 until 64).map { i =>
        val t = BigInt(n) * x(i) - sv(i)
        t * t
      }.sum
      math.sqrt(a2.toDouble) / n.toDouble
    }
    val labels = cent.keys.toSeq
    val srows = rows.map { case (_, l, x) =>
      val a = dist(x, l)
      val b = labels.filter(_ != l).map(dist(x, _)).min
      (l, if (math.max(a, b) > 0.0) halfUp((b - a) / math.max(a, b) * 1e9)
          else 0L)
    }
    val expected = srows.groupBy(_._1).map { case (l, xs) =>
      val ss = xs.map(x => BigInt(x._2)).sum.toLong
      (l, xs.length.toLong, ss,
        halfUp(ss.toDouble / xs.length.toDouble / 1e9 * 1e6))
    }.toSet
    val got = graft.ext.Similarity.q316(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    expected.foreach { case (_, _, _, m) =>
      assert(m >= -1000000L && m <= 1000000L, s"mean silhouette out of band: $m")
    }
  }

  test("q315 NMI: e12 ln-term rounding margins hold at BOTH gate SFs") {
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val margin = nmiReplay(d)._7
      assert(margin > 1e-4, s"$d: ln-term margin collapsed: $margin")
    }
  }
}
