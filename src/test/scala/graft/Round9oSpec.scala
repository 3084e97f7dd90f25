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

  // --------------------------------------------------------------- q324

  test("q324 Gamma repurchase fit: exact moment replay; k·θ recomposes the mean") {
    val gaps = Tables.events(spark, sf)
      .filter($"event_type" === "purchase")
      .select($"user_id", $"ts", $"event_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).values.toSeq.flatMap { xs =>
        val days = xs.sortBy(x => (x._2, x._3))
          .map(x => x._2 / 1000 / 86400000000L)
        days.zip(days.tail).map { case (a, b) => b - a }
      }
    val n = gaps.length.toLong
    val sg = gaps.sum
    val qg = gaps.map(g => BigInt(g) * g).sum
    val m = sg.toDouble / n.toDouble
    val v = (qg.toDouble - m * sg.toDouble) / (n - 1).toDouble
    val expected = (n, halfUp(m * 1e4),
      halfUp(m * m / v * 1e6), halfUp(v / m * 1e4))
    val got = graft.ext.Patterns.q324(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == expected)
    // Moment closure: k·θ = m (to grid slack) and both positive.
    val (k, th) = (expected._3 / 1e6, expected._4 / 1e4)
    assert(k > 0 && th > 0 && math.abs(k * th - m) < 1e-2,
      s"k*theta $k*$th != mean $m")
  }

  // --------------------------------------------------------------- q325

  test("q325 hapax profile: exact tf replay; tail counts bounded by types") {
    val tf = Tables.table(spark, sf, "documents")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
      .groupBy(identity(_)).map { case (k, v) => (k, v.size.toLong) }
    val expected = tf.groupBy(_._1._1).map { case (src, xs) =>
      val types = xs.size.toLong
      val hapax = xs.count(_._2 == 1L).toLong
      (src, types, xs.values.sum, hapax, xs.count(_._2 == 2L).toLong,
        halfUp(hapax.toDouble / types.toDouble * 1e6))
    }.toSet
    val got = graft.ext.TextAnalysis.q325(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    expected.foreach { case (_, ty, tk, h, d, _) =>
      assert(h + d <= ty && ty <= tk)
    }
  }

  // --------------------------------------------------------------- q326

  test("q326 Gumbel daily-max fit: exact moment replay; mu sits gamma*beta under the mean") {
    val daily = Tables.table(spark, sf, "orders")
      .select($"o_orderdate".cast("date"), $"o_totalprice").collect()
      .map { r =>
        val day = r.getDate(0).toLocalDate.toEpochDay
        val cents = new JBig(r.getDouble(1))
          .setScale(2, RoundingMode.HALF_UP)
          .scaleByPowerOfTen(2).longValueExact()
        (day, cents)
      }
      .groupBy(_._1).map { case (d, xs) => (d, xs.map(_._2).max) }
    val n = daily.size.toLong
    val sx = daily.values.sum
    val qx = daily.values.map(x => BigInt(x) * x).sum
    val m = sx.toDouble / n.toDouble
    val v = (qx.toDouble - m * sx.toDouble) / (n - 1).toDouble
    val beta = math.sqrt(v * 6.0) / 3.141592653589793
    val expected = (n, halfUp(m * 100), halfUp(beta * 100),
      halfUp((m - 0.5772156649015329 * beta) * 100))
    val got = graft.ext.Robust.q326(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3))
      == expected)
    assert(expected._3 > 0 && expected._4 < expected._2)
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
