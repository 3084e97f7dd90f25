package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Exact driver-side replays of q381-q383: split-conformal coverage,
  * quality-filter threshold curve, leave-one-source-out quality
  * deltas. Same discipline as the other Round11 spec files.
  */
class Round11gSpec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** The q52 quality score mirrored driver-side, e6-gridded. */
  private def scoreE6(text: String): Long = {
    val ws = text.split(" ", -1)
    val stop = ws.count(w => w == "a" || w == "the")
    val q = (1.0 - stop.toDouble / ws.length) *
      math.min(ws.length.toDouble / 50.0, 1.0)
    halfUp(q * 1e6)
  }

  private def docRows(): Seq[(Long, String, String, Long)] =
    spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text", $"source").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getString(1).split(" ", -1).length.toLong)).toSeq

  test("q381 conformal coverage: exact order-statistic replay; measured " +
    "coverage honors the 90% guarantee within finite-sample slack") {
    val docs = docRows()
    val scored = docs.map(d =>
      (scoreE6(d._2), md5hex(d._1.toString).substring(0, 2) < "cd"))
    val cal = scored.filter(_._2).map(_._1).sorted
    val k = (cal.size + 1) / 10
    // fixture contract: the calibration split must hold >= 9 docs so
    // k >= 1 (k = 0 would make the engine's cum >= 0 filter silently
    // pick the minimum score — fail loudly here instead, r11 ADVICE)
    assert(k >= 1, s"degenerate calibration split: n_cal=${cal.size} gives k=0")
    val t = cal(k - 1) // k-th smallest
    val eval = scored.filterNot(_._2).map(_._1)
    val covered = eval.count(_ >= t).toLong
    val cov = covered.toDouble / eval.size.toDouble * 1e6
    assert(boundaryMargin(cov) > 1e-6)
    val got = graft.ext.Sampling.queries("q381_conformal_coverage")(
      spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4), got.getLong(5)) ==
      (cal.size.toLong, k.toLong, t, eval.size.toLong, covered,
        halfUp(cov)))
    // the split-conformal guarantee: coverage ≥ 1 − α in expectation;
    // allow finite-sample slack of 3 standard errors below 0.9
    val se = math.sqrt(0.9 * 0.1 / eval.size)
    assert(cov / 1e6 >= 0.9 - 3 * se,
      s"conformal coverage broke the guarantee: ${cov / 1e6}")
  }

  test("q382 quality filter curve: exact gridded replay; kept shares " +
    "fall monotonically with the threshold") {
    val docs = docRows()
    val scored = docs.map(d => (scoreE6(d._2), d._4))
    val nTok = scored.map(_._2).sum
    val expected = Seq(200000L, 400000L, 600000L).map { tau =>
      val kept = scored.filter(_._1 >= tau)
      val ds = kept.size.toDouble / scored.size.toDouble * 1e6
      val ts = kept.map(_._2).sum.toDouble / nTok.toDouble * 1e6
      val mq =
        if (kept.nonEmpty)
          Some(halfUp(kept.map(k => BigInt(k._1)).sum.toDouble /
            kept.size.toDouble))
        else None
      assert(boundaryMargin(ds) > 1e-6 && boundaryMargin(ts) > 1e-6)
      (tau, kept.size.toLong, halfUp(ds), halfUp(ts), mq)
    }
    val got = graft.ext.TextAnalysis.queries("q382_quality_filter_curve")(
      spark, sf1).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)))).toSeq
    assert(got == expected)
    assert(expected.map(_._3).sliding(2).forall(p => p(1) <= p(0)))
    assert(expected.map(_._4).sliding(2).forall(p => p(1) <= p(0)))
  }

  test("q383 LOSO quality: exact broadcast-totals replay; deltas sum " +
    "to approximately zero when weighted by the left-out mass") {
    val docs = docRows()
    val per = docs.groupBy(_._3).view.mapValues { xs =>
      (xs.size.toLong, xs.map(d => BigInt(scoreE6(d._2))).sum)
    }.toMap
    val nn = per.values.map(_._1).sum
    val st = per.values.map(_._2).sum
    val expected = per.toSeq.sortBy(_._1).map { case (src, (n, ss)) =>
      val loso = (st - ss).toDouble / (nn - n).toDouble
      val delta = loso - st.toDouble / nn.toDouble
      assert(boundaryMargin(loso) > 1e-6 && boundaryMargin(delta) > 1e-6,
        s"q383 margin at $src")
      (src, n, halfUp(loso), halfUp(delta))
    }
    val got = graft.ext.TextAnalysis.queries("q383_loso_quality")(
      spark, sf1).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // identity: Σ_s (N−n_s)·delta_s = 0 exactly in the rationals —
    // check the gridded form stays within grid noise of zero
    val weighted = expected.map(e => (nn - e._2).toDouble * e._4).sum
    assert(math.abs(weighted) < nn.toDouble * expected.size,
      s"LOSO deltas violate the zero-sum identity: $weighted")
  }
}
