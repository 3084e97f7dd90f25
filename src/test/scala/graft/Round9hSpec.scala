package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 eighth batch: time-decayed trending shares (q296) and the
  * Kaplan–Meier time-to-purchase survival curve (q297). Driver-side
  * exact replays on sf0.001 plus rounding-boundary margins.
  */
class Round9hSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private lazy val evRows: Array[(Long, Long, String)] =
    Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000 / 86400000000L,
        r.getString(2)))

  // --------------------------------------------------------------- q296

  test("q296 trending: per-day gridded decay replay + recency binds") {
    val daily = evRows.groupBy(x => (x._3, x._2)).map { case ((t, d), xs) =>
      (t, d, xs.length.toLong)
    }.toSeq
    val maxDay = daily.map(_._2).max
    var minMargin = Double.MaxValue
    val byType = daily.groupBy(_._1).map { case (t, xs) =>
      val decayed = xs.map { case (_, d, x) =>
        val w = math.exp(-(maxDay - d).toDouble / 30.0) * 1e9
        minMargin = math.min(minMargin, boundaryMargin(w))
        BigInt(x) * halfUp(w)
      }.sum
      t -> ((xs.map(_._3).sum, decayed))
    }
    val tn = byType.values.map(_._1).sum
    val td = byType.values.map(_._2).sum
    val expected = byType.map { case (t, (n, dec)) =>
      (t, n, dec.toLong, halfUp(n.toDouble / tn * 1e6),
        halfUp(dec.toDouble / td.toDouble * 1e6))
    }.toSet
    val got = graft.ext.Patterns.q296(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e9 decay margin razor-thin: $minMargin")
    // Recency weighting must bind: decayed shares differ from raw
    // shares somewhere (the trend signal is alive).
    assert(got.exists(g => g._4 != g._5))
  }

  // --------------------------------------------------------------- q298

  test("q298 log-rank: per-step gridded O-E/V replay + null-calibrated") {
    val full = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2) / 1000,
        r.getString(3)))
    val perUser = full.groupBy(_._1).toSeq.map { case (uid, xs) =>
      val f = xs.map(_._3 / 86400000000L).min
      val p = xs.filter(_._4 == "purchase").map(_._3 / 86400000000L)
        .reduceOption(_ min _)
      (f, p, uid % 2)
    }
    val maxDay = full.map(_._3 / 86400000000L).max
    val obs = perUser.map { case (f, p, g1) =>
      (p.map(_ - f).getOrElse(maxDay - f), if (p.isDefined) 1L else 0L, g1)
    }
    val grid = obs.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.length.toLong,
        xs.map(x => x._3 * x._2).sum, xs.map(_._3).sum)
    }.sortBy(_._1)
    var minMargin = Double.MaxValue
    var oeSum = 0L; var vSum = 0L; var steps = 0L
    grid.zipWithIndex.foreach { case ((_, dT, _, d1T, _), i) =>
      if (dT > 0) {
        val nT = grid.drop(i).map(_._3).sum.toDouble
        val n1T = grid.drop(i).map(_._5).sum.toDouble
        val oe = (d1T.toDouble - n1T * dT.toDouble / nT) * 1e9
        minMargin = math.min(minMargin, boundaryMargin(oe))
        oeSum += halfUp(oe)
        if (nT > 1) {
          val v = n1T * (nT - n1T) * dT.toDouble * (nT - dT.toDouble) /
            (nT * nT * (nT - 1.0)) * 1e9
          minMargin = math.min(minMargin, boundaryMargin(v))
          vSum += halfUp(v)
        }
        steps += 1
      }
    }
    val nG1 = perUser.map(_._3).sum
    val chi = (oeSum.toDouble / 1e9) * (oeSum.toDouble / 1e9) /
      (vSum.toDouble / 1e9)
    val r = graft.ext.Robust.q298(spark, sf).head()
    assert(r.getLong(0) == perUser.size.toLong)
    assert(r.getLong(1) == nG1)
    assert(r.getLong(2) == steps)
    assert(r.getLong(3) == oeSum)
    assert(r.getLong(4) == vSum)
    assert(r.getLong(5) == halfUp(chi * 1e6))
    assert(minMargin > 1e-4, s"e9 margin razor-thin: $minMargin")
    // Null calibration: the hash split is independent of conversion
    // speed by construction, so the chi-square(1) statistic stays in a
    // sane range (< 15 ≈ p 1e-4) while the variance mass is real.
    assert(r.getLong(4) > 0 && r.getLong(5) < 15000000L)
    assert(nG1 > 0 && nG1 < perUser.size)
  }

  // --------------------------------------------------------------- q299

  test("q299 Poissonness: exact metameter replay + fit plausible") {
    val ks = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey").collect().map(_.getLong(0))
      .groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val fof = ks.groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
      .toSeq.sortBy(_._1)
    val n = fof.map(_._2).sum
    def fact(k: Long): Double = (1L to k).map(_.toDouble).product
    var minMargin = Double.MaxValue
    val pts = fof.map { case (k, nk) =>
      val phi = math.log(fact(k) * nk.toDouble / n.toDouble) * 1e6
      minMargin = math.min(minMargin, boundaryMargin(phi))
      (k, nk, halfUp(phi))
    }
    val m = BigInt(pts.size)
    val sk = pts.map(p => BigInt(p._1)).sum
    val skk = pts.map(p => BigInt(p._1) * p._1).sum
    val sp = pts.map(p => BigInt(p._3)).sum
    val skp = pts.map(p => BigInt(p._1) * p._3).sum
    val slope = (m * skp - sk * sp).toDouble /
      ((m * skk - sk * sk) * 1000000).toDouble
    val expected = pts.map { case (k, nk, phi) =>
      (k, nk, phi, halfUp(slope * 1e6), halfUp(math.exp(slope) * 1e4))
    }.toSet
    val got = graft.ext.Patterns.q299(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e6 phi margin razor-thin: $minMargin")
    // The fit must be plausible: lambda near the observed mean basket
    // size (Poisson-generated data), slope positive.
    val meanK = ks.sum.toDouble / ks.size
    val lambda = got.head._5.toDouble / 1e4
    assert(lambda > meanK * 0.5 && lambda < meanK * 2.0,
      s"lambda $lambda vs mean $meanK")
  }

  // --------------------------------------------------------------- q300

  test("q300 scorecard: composed signal replay + rank is total") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    // 10-gram census.
    val grams = docs.flatMap { case (src, text) =>
      val ws = text.split(" ", -1)
      if (ws.length < 10) Seq.empty
      else ws.sliding(10).map(g => (src, g.mkString(" "))).toSeq
    }
    val gc = grams.groupBy(_._2).map { case (g, xs) => g -> xs.length }
    val dup = grams.groupBy(_._1).map { case (src, xs) =>
      src -> ((xs.length.toLong, xs.count(x => gc(x._2) > 1).toLong))
    }
    // Quality + tokens (q140 grid discipline).
    val qual = docs.groupBy(_._1).map { case (src, xs) =>
      val rows = xs.map { case (_, text) =>
        val ws = text.split(" ", -1)
        val stop = ws.count(w => w == "a" || w == "the")
        val q = (1.0 - stop.toDouble / ws.length) *
          math.min(ws.length.toDouble / 50.0, 1.0)
        (ws.length.toLong,
          halfUp(BigDecimal(q).setScale(6, BigDecimal.RoundingMode.HALF_UP)
            .toDouble * 1e6))
      }
      src -> ((rows.length.toLong, rows.map(_._1).sum, rows.map(_._2).sum))
    }
    val corpusTokens = qual.values.map(_._2).sum
    val base = qual.map { case (src, (nd, tk, sq)) =>
      val (ng, dg) = dup(src)
      (src, nd, tk,
        halfUp(dg.toDouble / ng * 1e6),
        halfUp(sq.toDouble / nd / 100.0),
        halfUp(tk.toDouble / corpusTokens * 1e6))
    }.toSeq
    val ranked = base.sortBy { case (src, _, _, d, q, _) => (d, -q, src) }
      .zipWithIndex.map { case (b, i) =>
        (b._1, b._2, b._3, b._4, b._5, b._6, i + 1L)
      }.toSet
    val got = graft.ext.Curation.q300(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == ranked)
    // The scorecard must discriminate: ranks are a permutation and the
    // dup signal varies across sources.
    assert(got.map(_._7) == (1L to got.size).toSet)
    assert(got.map(_._4).size > 1)
  }

  // --------------------------------------------------------------- q297

  test("q297 Kaplan-Meier: exact product-limit replay + curve sane") {
    val perUser = evRows.groupBy(_._1).toSeq.map { case (_, xs) =>
      val f = xs.map(_._2).min
      val p = xs.filter(_._3 == "purchase").map(_._2)
        .reduceOption(_ min _)
      (f, p)
    }
    val maxDay = evRows.map(_._2).max
    val obs = perUser.map { case (f, p) =>
      (p.map(_ - f).getOrElse(maxDay - f), if (p.isDefined) 1L else 0L)
    }
    val grid = obs.groupBy(_._1).toSeq.map { case (t, xs) =>
      (t, xs.map(_._2).sum, xs.length.toLong)
    }.sortBy(_._1)
    var minMargin = Double.MaxValue
    var cum = 0L
    val expected = grid.zipWithIndex.flatMap { case ((t, dT, _), i) =>
      val nT = grid.drop(i).map(_._3).sum
      if (dT == 0) None
      else {
        val ln = if (dT == nT) -100000000000L
        else {
          val v = math.log(1.0 - dT.toDouble / nT.toDouble) * 1e9
          minMargin = math.min(minMargin, boundaryMargin(v))
          halfUp(v)
        }
        cum += ln
        Some((t, nT, dT, halfUp(math.exp(cum.toDouble / 1e9) * 1e6)))
      }
    }.toSet
    val got = graft.ext.Robust.q297(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e9 ln margin razor-thin: $minMargin")
    // The curve must be a survival curve: monotone non-increasing in
    // t, starting below 1e6 (a step at t=0 exists on this data) and
    // ending at exactly 0 via the d=n sentinel (every user converts,
    // so the last at-risk set purchases out).
    val sorted = got.toSeq.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Seq(a, b) => assert(a._4 >= b._4, s"curve rises: $a -> $b")
      case _ =>
    }
    assert(sorted.last._4 == 0L, "terminal sentinel never fired")
    assert(sorted.head._4 < 1000000L)
  }
}
