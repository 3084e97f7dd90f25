package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Exact driver-side replays of q378-q380: HDR-histogram quantile
  * sketch, year-over-year price indices, mixture effective sample
  * size. Same discipline as the other Round11 spec files.
  */
class Round11fSpec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  test("q378 HDR quantiles: exact bucket replay; the measured relative " +
    "error honors the 2^-3 resolution bound") {
    val xs = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_totalprice".cast("decimal(18,2)")).collect()
      .map(_.getDecimal(0).movePointRight(2).longValueExact()).toSeq
    def bucket(x: Long): (Long, Long) = {
      if (x < 8L) (x, x)
      else {
        val e = 63 - java.lang.Long.numberOfLeadingZeros(x)
        val sub = (x >> (e - 3)) - 8
        val width = 1L << (e - 3)
        (e.toLong * 8 + sub, (sub + 8) * width + (width - 1) / 2)
      }
    }
    val regs = xs.map(bucket).groupBy(_._1).toSeq
      .map { case (bid, ys) => (bid, ys.size.toLong, ys.head._2) }
      .sortBy(_._1)
    val n = xs.size.toLong
    // exact type-7 percentile (the engines' shared definition)
    val sorted = xs.sorted
    def exactQ(q: Double): Double = {
      val h = (n - 1) * q
      val lo = math.floor(h).toInt
      val frac = h - lo
      if (lo + 1 < n) sorted(lo) * (1 - frac) + sorted(lo + 1) * frac
      else sorted(lo).toDouble
    }
    val expected = Seq(50L, 90L, 99L).map { q =>
      var cum = 0L
      val hit = regs.find { r => cum += r._2; cum * 100 >= q * n }.get
      val ex = exactQ(q.toDouble / 100.0)
      val rel = (hit._3.toDouble - ex) / ex * 1e6
      assert(boundaryMargin(rel) > 1e-6 || hit._3.toDouble == ex)
      (q, n, hit._3, halfUp(ex * 100), halfUp(rel))
    }
    val got = graft.queries.Round11.queries("q378_hdr_quantiles")(
      spark, sf1).collect().map(r => (r.getLong(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // the sketch's whole value proposition: midpoint error is bounded
    // by the sub-bucket resolution (half-width/lo ≤ 2^-4, report 2^-3
    // for slack)
    expected.foreach { e =>
      assert(math.abs(e._5) <= 125000L,
        s"HDR error beyond the resolution bound: $e")
    }
  }

  test("q379 price index: exact matched-part replay; Fisher between " +
    "Laspeyres and Paasche") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_partkey",
        org.apache.spark.sql.functions.substring(
          $"l_shipdate".cast("string"), 1, 4),
        $"l_extendedprice".cast("decimal(18,2)"),
        $"l_quantity".cast("long")).collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getDecimal(2).movePointRight(2).longValueExact(), r.getLong(3)))
      .filter(x => x._2 == "1996" || x._2 == "1997")
    val py = li.groupBy(x => (x._1, x._2)).view.mapValues { xs =>
      val c = xs.map(x => BigInt(x._3)).sum
      val q = xs.map(_._4).sum
      (q, halfUp(c.toDouble / q.toDouble * 1000))
    }.toMap
    val matched = py.keys.filter(_._2 == "1996").map(_._1)
      .filter(p => py.contains((p, "1997"))).toSeq
    val (lNum, lDen, pNum, pDen) = matched.foldLeft(
      (BigInt(0), BigInt(0), BigInt(0), BigInt(0))) { case (acc, p) =>
      val (q0, u0) = py((p, "1996"))
      val (q1, u1) = py((p, "1997"))
      (acc._1 + BigInt(u1) * q0, acc._2 + BigInt(u0) * q0,
        acc._3 + BigInt(u1) * q1, acc._4 + BigInt(u0) * q1)
    }
    val l = lNum.toDouble / lDen.toDouble
    val p = pNum.toDouble / pDen.toDouble
    val f = math.sqrt(l * p)
    val got = graft.queries.Round11.queries("q379_price_index")(spark, sf1)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3)) ==
      (matched.size.toLong, halfUp(l * 1e6), halfUp(p * 1e6),
        halfUp(f * 1e6)))
    assert(Seq(l * 1e6, p * 1e6, f * 1e6).map(boundaryMargin).min > 1e-6)
    // geometric mean sits between its factors
    val (lo, hi) = (math.min(l, p), math.max(l, p))
    assert(f >= lo && f <= hi)
  }

  test("q380 mixture ESS: exact gridded replay; ESS rises as tau falls") {
    val toks = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"source", $"text").collect()
      .map(r => (r.getString(0), r.getString(1).split(" ", -1).length.toLong))
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val expected = Seq(50L, 70L, 100L).map { tau =>
      val w = toks.values.toSeq.map(t =>
        halfUp(math.pow(t.toDouble, tau.toDouble / 100.0) * 1e6))
      val sw = w.map(BigInt(_)).sum
      val sww = w.map(v => BigInt(v) * v).sum
      val ess = (sw * sw).toDouble / sww.toDouble
      val share = (sw * sw).toDouble / sww.toDouble / toks.size.toDouble
      assert(boundaryMargin(ess * 100) > 1e-6 &&
        boundaryMargin(share * 1e6) > 1e-6)
      (tau, toks.size.toLong, halfUp(ess * 100), halfUp(share * 1e6))
    }
    val got = graft.ext.Sampling.queries("q380_mixture_ess")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // Kish ESS grows monotonically as tau flattens the weights
    assert(expected.map(_._3).sliding(2).forall(p => p(1) <= p(0)),
      s"ESS must fall as tau rises: ${expected.map(_._3)}")
  }
}
