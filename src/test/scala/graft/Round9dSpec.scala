package graft

import java.math.{BigDecimal => JBig, RoundingMode}
import java.security.MessageDigest

/** Round-9 fourth batch: boilerplate segment mass (q269), single
  * changepoint over daily arrivals (q270), vocab coverage curve (q271),
  * lang-label Cohen's kappa (q272), lang-ID confidence calibration
  * (q273). Driver-side exact replays on sf0.001 plus the
  * rounding-boundary margins the float discipline requires.
  */
class Round9dSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private lazy val docRows: Array[(Long, String, String, String)] =
    spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"lang", $"source")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))

  // Spark split semantics: keep trailing empties.
  private def toks(text: String): Array[String] = text.split(" ", -1)

  // --------------------------------------------------------------- q269

  test("q269 boilerplate: exact per-source replay, >=3-doc verdict") {
    val segs = docRows.flatMap { case (id, text, _, src) =>
      toks(text).grouped(16).map(g => (src, id, md5hex(g.mkString(" "))))
    }
    val nDocs = segs.groupBy(_._3).map { case (h, xs) =>
      h -> xs.map(_._2).distinct.size
    }
    val expected = segs.groupBy(_._1).map { case (src, xs) =>
      val nSegs = xs.length.toLong
      val bp = xs.count(x => nDocs(x._3) >= 3).toLong
      val shapes = xs.filter(x => nDocs(x._3) >= 3).map(_._3).distinct.size.toLong
      (src, nSegs, bp, shapes, halfUp(bp.toDouble / nSegs * 1e6))
    }.toSet
    val got = graft.ext.Dedup.q269(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // The verdict must bind at this SF: some boilerplate exists and the
    // threshold separates (>=3) from q129's any-dup (>=2) census.
    assert(expected.exists(_._3 > 0), "no >=3-doc boilerplate measured")
    val anyDup = segs.groupBy(_._1).map { case (src, xs) =>
      src -> xs.count(x => nDocs(x._3) >= 2).toLong
    }
    assert(expected.exists(e => anyDup(e._1) > e._3),
      "threshold 3 never separates from threshold 2 — audit not binding")
  }

  // --------------------------------------------------------------- q270

  test("q270 changepoint: BigInt rational replay + e4 margin") {
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val daily = ev.map { case (t, ns) => (t, ns / 1000 / 86400000000L) }
      .groupBy(identity).map { case ((t, d), xs) => (t, d, xs.size.toLong) }
      .toSeq
    var minMargin = Double.MaxValue
    val expected = daily.groupBy(_._1).flatMap { case (t, xs) =>
      val s = xs.sortBy(_._2)
      val n = s.length
      if (n < 2) None
      else {
        val stot = BigInt(s.map(_._3).sum)
        var s1 = BigInt(0)
        val cands = (0 until n - 1).map { i =>
          s1 += s(i)._3
          val k = BigInt(i + 1); val n2 = BigInt(n - i - 1); val nn = BigInt(n)
          val s2 = stot - s1
          val num = s1 * s1 * n2 * nn + s2 * s2 * k * nn - stot * stot * k * n2
          val den = k * n2 * nn
          (s(i)._2, num.toDouble / den.toDouble)
        }
        val best = cands.minBy { case (day, g) => (-g, day) }
        minMargin = math.min(minMargin, boundaryMargin(best._2 * 1e4))
        Some((t, n.toLong, best._1, halfUp(best._2 * 1e4)))
      }
    }.toSet
    val got = graft.ext.Patterns.q270(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e4 grid margin razor-thin: $minMargin")
    assert(expected.nonEmpty)
  }

  // --------------------------------------------------------------- q271

  test("q271 vocab coverage: exact replay, curve monotone + binding") {
    val counts = docRows.flatMap(d => toks(d._2))
      .groupBy(identity).map { case (w, xs) => (w, xs.size.toLong) }.toSeq
    val ranked = counts.sortBy { case (w, c) => (-c, w) }
    val total = ranked.map(_._2).sum
    def cov(k: Int): Long =
      halfUp(ranked.take(k).map(_._2).sum.toDouble / total * 1e6)
    val expected =
      (ranked.size.toLong, total, cov(10), cov(100), cov(1000))
    val r = graft.ext.Ranking.q271(spark, sf).head()
    val got = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4))
    assert(got == expected)
    // The curve must be a curve: strictly more mass at each k, and the
    // top-10 head must not already cover everything.
    assert(got._3 < got._4 && got._4 <= got._5)
    assert(got._3 > 0 && got._3 < 1000000L)
  }

  // ----------------------------------------------------- lang-ID replay

  private def hits(ws: Array[String], sw: Seq[String]): Long =
    ws.count(sw.contains).toLong

  private def langScores(text: String): (Long, Long, Long, Long) = {
    val ws = toks(text)
    (hits(ws, Seq("the", "a", "of", "and")),
      hits(ws, Seq("der", "die", "und", "das")),
      hits(ws, Seq("el", "los", "y", "que")),
      hits(ws, Seq("le", "la", "et", "les")))
  }

  private def guess(s: (Long, Long, Long, Long)): String = {
    val (en, de, es, fr) = s
    if (en >= de && en >= es && en >= fr && en > 0) "en"
    else if (de >= es && de >= fr && de > 0) "de"
    else if (es >= fr && es > 0) "es"
    else if (fr > 0) "fr"
    else "unknown"
  }

  // --------------------------------------------------------------- q272

  test("q272 kappa: BigInt marginal replay + e9 margin + chance-corrects") {
    val pred = docRows.map(d => (d._3, guess(langScores(d._2))))
    val n = BigInt(pred.length)
    val agree = BigInt(pred.count(p => p._1 == p._2))
    val rowN = pred.groupBy(_._1).map { case (c, xs) => c -> BigInt(xs.length) }
    val colN = pred.groupBy(_._2).map { case (c, xs) => c -> BigInt(xs.length) }
    val rc = (rowN.keySet ++ colN.keySet).toSeq.map { c =>
      rowN.getOrElse(c, BigInt(0)) * colN.getOrElse(c, BigInt(0))
    }.sum
    val kappa = (n * agree - rc).toDouble / (n * n - rc).toDouble
    val r = graft.ext.Curation.q272(spark, sf).head()
    assert(r.getLong(0) == n.toLong)
    assert(r.getLong(1) == agree.toLong)
    assert(r.getLong(2) == rc.toLong)
    assert(r.getLong(3) == halfUp(kappa * 1e9))
    assert(boundaryMargin(kappa * 1e9) > 1e-6)
    // Kappa must actually chance-correct here: raw agreement share and
    // kappa differ, and the denominator binds (rc > 0).
    assert(rc > 0 && halfUp(kappa * 1e9) !=
      halfUp(agree.toDouble / n.toDouble * 1e9))
  }

  // --------------------------------------------------------------- q273

  test("q273 calibration: exact bucket replay + per-doc Brier margins") {
    var minMargin = Double.MaxValue
    val terms = docRows.flatMap { d =>
      val s = langScores(d._2)
      val total = s._1 + s._2 + s._3 + s._4
      if (total == 0) None
      else {
        val best = Seq(s._1, s._2, s._3, s._4).max
        val ok = if (guess(s) == d._3) 1L else 0L
        val conf = best.toDouble / (total + 1).toDouble
        val term = (conf - ok) * (conf - ok)
        minMargin = math.min(minMargin, boundaryMargin(term * 1e9))
        Some(((10 * best) / (total + 1), ok, halfUp(term * 1e9)))
      }
    }
    val expected = terms.groupBy(_._1).map { case (b, xs) =>
      val nn = xs.length.toLong
      val okN = xs.map(_._2).sum
      (b, nn, okN, halfUp(okN.toDouble / nn * 1e6), xs.map(_._3).sum)
    }.toSet
    val got = graft.ext.Curation.q273(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e9 Brier grid margin razor-thin: $minMargin")
    // The audit must measure a spread: more than one confidence bucket,
    // and at least one bucket below perfect accuracy.
    assert(expected.size > 1, "confidence never spreads across buckets")
    assert(expected.exists(e => e._3 < e._2), "no miscalibration measured")
  }
}
