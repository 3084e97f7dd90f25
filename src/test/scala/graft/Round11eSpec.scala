package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Exact driver-side replays of the round-11 third batch q373-q377:
  * Markov next-event accuracy, chunk-granularity dedup curve, user-day
  * event-type PMI, Lorenz decile curve, word burstiness. Same
  * discipline as Round11cSpec/Round11dSpec.
  */
class Round11eSpec extends SparkTestBase {
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

  /** (user_id, epoch_ns, event_id, event_type), time-ordered. */
  private def eventRows(): Seq[(Long, Long, Long, String)] =
    graft.Tables.events(spark, sf1)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSeq

  test("q373 Markov accuracy: exact argmax + scoring replay; accuracy " +
    "beats the uniform-chance floor overall") {
    val ev = eventRows()
    val steps = ev.groupBy(_._1).values.toSeq.flatMap { xs =>
      val sorted = xs.sortBy(e => (e._2, e._3))
      sorted.zip(sorted.tail).map(p => (p._1._4, p._2._4))
    }
    val counts = steps.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val pred = steps.map(_._1).distinct.map { f =>
      f -> counts.filter(_._1._1 == f).toSeq
        .sortWith { case (((_, t1), n1), ((_, t2), n2)) =>
          n1 > n2 || (n1 == n2 && t1 < t2)
        }.head._1._2
    }.toMap
    val expected = steps.groupBy(_._1).toSeq.map { case (f, xs) =>
      val correct = xs.count(_._2 == pred(f)).toLong
      val acc = correct.toDouble / xs.size.toDouble * 1e6
      assert(boundaryMargin(acc) > 1e-6 || correct == 0L ||
        correct == xs.size.toLong)
      (f, pred(f), xs.size.toLong, correct, halfUp(acc))
    }.sortBy(_._1)
    val got = graft.ext.Patterns.queries("q373_markov_accuracy")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // better than uniform chance over the observed type set
    val types = ev.map(_._4).distinct.size
    val overall = expected.map(_._4).sum.toDouble /
      expected.map(_._3).sum.toDouble
    assert(overall >= 1.0 / types,
      s"argmax predictor under uniform chance: $overall vs ${1.0 / types}")
  }

  test("q374 chunk dedup curve: exact ladder replay; duplication falls " +
    "as chunks grow") {
    val texts = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"text").collect().map(_.getString(0)).toSeq
    val expected = Seq(16, 32, 64).map { c =>
      val hs = texts.flatMap { t =>
        val ws = t.split(" ", -1)
        if (ws.isEmpty) Nil
        else (1 to ws.length by c).map(st =>
          md5hex(ws.slice(st - 1, st - 1 + c).mkString(" ")))
      }
      val share = (1.0 - hs.distinct.size.toDouble / hs.size.toDouble) * 1e6
      assert(boundaryMargin(share) > 1e-6 || hs.distinct.size == hs.size)
      (c.toLong, hs.size.toLong, hs.distinct.size.toLong, halfUp(share))
    }
    val got = graft.ext.TextAnalysis.queries("q374_chunk_dedup_curve")(
      spark, sf1).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3))).toSeq
    assert(got == expected)
    // coarser chunks can only hide duplication (weakly fewer dup hits
    // per token) — the SHARE must not rise with chunk size here
    assert(expected.map(_._4).sliding(2).forall(p => p(1) <= p(0)))
  }

  test("q375 event PMI: exact basket replay; margins") {
    val ev = eventRows()
    val baskets = ev.map(e => ((e._1, e._2 / 86400000000000L), e._4))
      .distinct
    val nb = baskets.map(_._1).distinct.size.toLong
    val marg = baskets.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val expected = baskets.groupBy(_._1).values.toSeq.flatMap { xs =>
      val ts = xs.map(_._2).sorted
      for (a <- ts; b <- ts if a < b) yield (a, b)
    }.groupBy(identity).toSeq.map { case ((a, b), ps) =>
      val nab = ps.size.toLong
      val pmi = math.log(nab.toDouble * nb.toDouble /
        (marg(a).toDouble * marg(b).toDouble)) * 1e6
      assert(boundaryMargin(pmi) > 1e-6, s"q375 margin at ($a,$b)")
      (a, b, marg(a), marg(b), nab, nb, halfUp(pmi))
    }.sortBy(x => (x._1, x._2))
    val got = graft.ext.Patterns.queries("q375_event_pmi")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("q376 Lorenz curve: exact decile replay; curve is convex and " +
    "ends at 1") {
    val cust = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_custkey", $"o_totalprice".cast("decimal(18,2)")).collect()
      .map(r => (r.getLong(0), r.getDecimal(1).movePointRight(2)
        .longValueExact()))
      .groupBy(_._1).view.mapValues(_.map(x => BigInt(x._2)).sum).toSeq
    val n = cust.size.toLong
    val tot = cust.map(_._2).sum
    val ranked = cust.sortWith { case ((k1, r1), (k2, r2)) =>
      r1 < r2 || (r1 == r2 && k1 < k2)
    }.zipWithIndex.map { case ((_, rev), i) => ((i * 10) / n + 1, rev) }
    var cum = BigInt(0)
    val expected = ranked.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (d, xs) =>
        val rev = xs.map(_._2).sum
        cum += rev
        val share = rev.toDouble / tot.toDouble * 1e6
        val lorenz = cum.toDouble / tot.toDouble * 1e6
        assert(boundaryMargin(share) > 1e-6 && (boundaryMargin(lorenz) >
          1e-6 || cum == tot))
        (d, xs.size.toLong, rev.toLong, halfUp(share), halfUp(lorenz))
    }
    val got = graft.queries.Round11.queries("q376_lorenz_curve")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // Lorenz properties: shares ascend (sorted ascending by revenue),
    // cumulative ends at exactly 1e6
    assert(expected.map(_._4).sliding(2).forall(p => p(1) >= p(0)))
    assert(expected.last._5 == 1000000L)
  }

  test("q377 word burstiness: exact census replay over the df>=20 " +
    "vocabulary") {
    val tf = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text").collect().toSeq
      .flatMap(r => r.getString(1).split(" ", -1).toSeq
        .groupBy(identity).map { case (w, xs) =>
          (w, r.getLong(0), xs.size.toLong)
        })
    val census = tf.groupBy(_._1).toSeq
      .map { case (w, xs) =>
        (w, xs.size.toLong, xs.count(_._3 >= 2L).toLong, xs.map(_._3).sum)
      }
      .filter(_._2 >= 20L)
      .map { case (w, df1, df2, t) =>
        val adapt = df2.toDouble / df1.toDouble * 1e6
        // q352's onGrid rule: when 2·df2·1e6 ≡ 0 (mod df1) the exact
        // rational sits ON a half-grid boundary — deterministic
        // cross-engine because X.5 is dyadic-exact in a double and
        // both engines round half away from zero; only genuinely
        // inexact ratios owe a margin.
        val onGrid = (BigInt(2) * 1000000 * df2) % df1 == 0
        assert(onGrid || boundaryMargin(adapt) > 1e-6,
          s"q377 margin at $w: $adapt")
        (w, df1, df2, t, halfUp(adapt))
      }
    val expected = census.sortWith { case ((w1, _, _, _, a1), (w2, _, _, _, a2)) =>
      a1 > a2 || (a1 == a2 && w1 < w2)
    }.take(20)
    val got = graft.ext.TextAnalysis.queries("q377_word_burstiness")(
      spark, sf1).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // non-degenerate: the top word genuinely recurs within docs
    assert(expected.head._3 > 0L)
  }
}
