package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 fifteenth batch: Wald SPRT daily conversion trace (q322)
  * and per-label embedding ingest-drift (q323). q322's ln-constant
  * terms get grid-margin pins at both gate SFs; q323 is exact-integer
  * up to one mirrored sqrt division.
  */
class Round9oSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double =
    math.abs(math.abs(x - math.floor(x)) - 0.5)

  // --------------------------------------------------------------- q322

  /** Replay; returns (rows, min term margin). */
  private def sprtReplay(sfDir: String): (Seq[(Long, Long, Long, Long, String)], Double) = {
    val ev = Tables.events(spark, sfDir)
      .select($"user_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1) / 1000 / 86400000000L,
        r.getString(2)))
      .filter(_._1 % 2 == 1)
    val l1 = math.log(0.12 / 0.10)
    val l0 = math.log(0.88 / 0.90)
    val bound = halfUp(math.log(19.0) * 1e9)
    var minMargin = Double.MaxValue
    val daily = ev.groupBy(_._2).toSeq.sortBy(_._1).map { case (d, xs) =>
      val n = xs.length.toLong
      val x = xs.count(_._3 == "purchase").toLong
      val t = x.toDouble * l1 + (n - x).toDouble * l0
      minMargin = math.min(minMargin, boundaryMargin(t * 1e9))
      (d, n, x, halfUp(t * 1e9))
    }
    var cum = 0L
    val rows = daily.map { case (d, n, x, t) =>
      cum += t
      (d, n, x, cum,
        if (cum >= bound) "accept_h1"
        else if (cum <= -bound) "accept_h0" else "continue")
    }
    (rows, minMargin)
  }

  test("q322 SPRT: exact gridded replay; LLR drifts negative when the true rate is below H0 midpoint") {
    val (expected, _) = sprtReplay(sf)
    val got = graft.ext.Patterns.q322(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4))).toSeq
    assert(got == expected)
    // The trace is cumulative: each llr differs from the previous by
    // that day's term; the decision column matches the bound algebra.
    val bound = halfUp(math.log(19.0) * 1e9)
    got.foreach { case (_, _, _, llr, dec) =>
      val want = if (llr >= bound) "accept_h1"
        else if (llr <= -bound) "accept_h0" else "continue"
      assert(dec == want)
    }
  }

  test("q322: e9 ln-term margins hold at BOTH gate SFs") {
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val m = sprtReplay(d)._2
      assert(m > 1e-4, s"$d: SPRT term margin collapsed: $m")
    }
  }

  // --------------------------------------------------------------- q323

  test("q323 embedding drift: exact sum-vector replay; cosine in [-1, 1]") {
    val rows = Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"label", $"embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1).toLong,
        r.getSeq[Float](2).toArray.map(x => halfUp(x.toDouble * 1000))))
    val mid = (rows.map(_._1).min + rows.map(_._1).max) / 2
    val expected = rows.groupBy(_._2).flatMap { case (l, xs) =>
      val (first, second) = xs.partition(_._1 <= mid)
      if (first.isEmpty || second.isEmpty) None
      else {
        def sums(v: Seq[(Long, Long, Array[Long])]): Array[BigInt] =
          Array.tabulate(64)(i => v.map(x => BigInt(x._3(i))).sum)
        val (sa, sb) = (sums(first.toSeq), sums(second.toSeq))
        val dot = (0 until 64).map(i => sa(i) * sb(i)).sum
        val na = (0 until 64).map(i => sa(i) * sa(i)).sum
        val nb = (0 until 64).map(i => sb(i) * sb(i)).sum
        Some((l, first.length.toLong, second.length.toLong,
          halfUp(dot.toDouble / math.sqrt((na * nb).toDouble) * 1e6)))
      }
    }.toSet
    val got = graft.ext.Similarity.q323(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    expected.foreach { case (_, _, _, c) =>
      assert(c >= -1000000L && c <= 1000000L, s"cosine out of band: $c")
    }
  }
}
