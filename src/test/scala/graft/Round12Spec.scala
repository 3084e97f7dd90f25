package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

/** Exact driver-side replays of the round-12 batch: the TPC-H
  * Q8/Q13/Q14/Q17 shapes (q384-q387), the TwoPhase showcases
  * (q388 concentration, q389 Spearman, q390 median/MAD), and the
  * Benford audit (q391). Same discipline as the Round10/Round11 spec
  * files: recompute from raw parquet with independent arithmetic,
  * assert bit-equality on every integer output, and measure the
  * rounding-boundary margin wherever a double chain lands on a grid.
  */
class Round12Spec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private def d2(x: Double): JBig =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)

  test("q384 TPC-H Q8: exact decimal market-share replay; share is non-degenerate") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_extendedprice",
        $"l_discount")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getDouble(4)))
    val promo = spark.read.parquet(s"$sf1/part.parquet")
      .filter($"p_type" === "PROMO").select($"p_partkey")
      .collect().map(_.getLong(0)).toSet
    val suppNation = spark.read.parquet(s"$sf1/supplier.parquet")
      .select($"s_suppkey".cast("long"), $"s_nationkey".cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nationName = spark.read.parquet(s"$sf1/nation.parquet")
      .select($"n_nationkey".cast("long"), $"n_name",
        $"n_regionkey".cast("long"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2)))
      .toMap
    val americaKey = spark.read.parquet(s"$sf1/region.parquet")
      .filter($"r_name" === "AMERICA")
      .select($"r_regionkey".cast("long"))
      .collect().map(_.getLong(0)).head
    val custNation = spark.read.parquet(s"$sf1/customer.parquet")
      .select($"c_custkey".cast("long"), $"c_nationkey".cast("long"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val orderInfo = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_orderkey", $"o_custkey", year($"o_orderdate".cast("date")))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getInt(2))).toMap
    val rows = li.flatMap { case (ok, pk, sk, price, disc) =>
      if (!promo.contains(pk)) None
      else {
        val (ck, yr) = orderInfo(ok)
        if (nationName(custNation(ck))._2 != americaKey) None
        else {
          val vol = d2(price).multiply(JBig.ONE.subtract(d2(disc)))
          Some((yr.toLong, nationName(suppNation(sk))._1, vol))
        }
      }
    }
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (yr, g) =>
      val tot = g.map(_._3).reduce(_ add _)
      val nat = g.filter(_._2 == "NATION_3").map(_._3)
        .foldLeft(new JBig(0))(_ add _)
      val share = nat.doubleValue() / tot.doubleValue() * 1e6
      assert(boundaryMargin(share) > 1e-6, s"q384 share margin at year $yr")
      (yr,
        nat.setScale(2, RoundingMode.HALF_UP).doubleValue(),
        tot.setScale(2, RoundingMode.HALF_UP).doubleValue(),
        halfUp(share))
    }
    val got = graft.queries.Round12.q384(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // non-degenerate: the measured nation must hold SOME but not all share
    assert(expected.exists(e => e._4 > 0 && e._4 < 1000000))
  }

  test("q385 TPC-H Q13: integer distribution replay; zero-order customers present at sf0.1") {
    // sf0.1 is the one fixture holding a zero-order customer — the row
    // only a LEFT join can produce; replay both gate SFs plus it.
    for (dir <- Seq(sf1, "/root/testdata/sf0.1")) {
      val custs = spark.read.parquet(s"$dir/customer.parquet")
        .select($"c_custkey".cast("long")).collect().map(_.getLong(0))
      val perCust = spark.read.parquet(s"$dir/orders.parquet")
        .select($"o_custkey").collect().map(_.getLong(0))
        .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
      val counts = custs.map(c => perCust.getOrElse(c, 0L))
      val expected = counts.groupBy(identity).toSeq
        .map { case (k, v) => (k, v.length.toLong) }.sortBy(_._1)
      val got = graft.queries.Round12.q385(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSeq
      assert(got === expected, s"at $dir")
      if (dir.endsWith("sf0.1"))
        assert(got.head._1 == 0L && got.head._2 > 0L,
          "zero-order customer missing — the LEFT join degraded to inner")
    }
  }

  test("q386 TPC-H Q14: exact decimal promo-share replay at both gate SFs") {
    for (dir <- Seq(sf1, "/root/testdata/sf0.01")) {
      val promo = spark.read.parquet(s"$dir/part.parquet")
        .collect().map(r => r.getAs[Long]("p_partkey") ->
          (r.getAs[String]("p_type") == "PROMO")).toMap
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select($"l_partkey", year($"l_shipdate".cast("date")),
          $"l_extendedprice", $"l_discount")
        .collect().map(r => (r.getLong(0), r.getInt(1).toLong,
          r.getDouble(2), r.getDouble(3)))
      val expected = li.groupBy(_._2).toSeq.sortBy(_._1).map { case (yr, g) =>
        val vols = g.map { case (pk, _, pr, dc) =>
          (promo(pk), d2(pr).multiply(JBig.ONE.subtract(d2(dc))))
        }
        val tot = vols.map(_._2).reduce(_ add _)
        val pv = vols.filter(_._1).map(_._2).foldLeft(new JBig(0))(_ add _)
        val share = pv.doubleValue() * 100 / tot.doubleValue() * 1e6
        assert(boundaryMargin(share) > 1e-6, s"q386 share margin at $dir/$yr")
        (yr, pv.setScale(2, RoundingMode.HALF_UP).doubleValue(),
          tot.setScale(2, RoundingMode.HALF_UP).doubleValue(), halfUp(share))
      }
      val got = graft.queries.Round12.q386(spark, dir).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
        .toSeq
      assert(got === expected, s"at $dir")
    }
  }

  test("q387 TPC-H Q17: integer small-quantity replay; the gate binds both ways") {
    val brand = spark.read.parquet(s"$sf1/part.parquet")
      .filter($"p_brand" === "Brand#13").select($"p_partkey")
      .collect().map(_.getLong(0)).toSet
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_partkey", $"l_quantity", $"l_extendedprice")
      .collect().map(r => (r.getLong(0), r.getDouble(1).toLong,
        d2(r.getDouble(2)).movePointRight(2).longValueExact()))
      .filter(t => brand.contains(t._1))
    val per = li.groupBy(_._1).map { case (k, g) =>
      k -> (g.map(_._2).sum, g.length.toLong)
    }
    val kept = li.filter { case (pk, q, _) =>
      val (sq, nq) = per(pk); q * 5 * nq < sq
    }
    assert(kept.nonEmpty && kept.length < li.length,
      "q387 quantity gate must bind in both directions")
    val cents = kept.map(_._3).sum
    val got = graft.queries.Round12.q387(spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ===
      (kept.length.toLong, cents, halfUp(cents / 100.0 / 7.0 * 1e4)))
  }

  test("q388 event concentration: exact rank replay; bands nest; shares margin-safe") {
    val users = graft.Tables.events(spark, sf1)
      .groupBy($"user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val ranked = users.sortBy(t => (-t._2, t._1)).zipWithIndex
      .map { case ((u, c), i) => (u, c, i + 1L) }
    val n = ranked.length.toLong
    val tot = ranked.map(_._2).sum
    val expected = Seq(1L, 5L, 10L, 50L).flatMap { b =>
      val in = ranked.filter(_._3 * 100 <= b * n)
      if (in.isEmpty) None
      else {
        val ev = in.map(_._2).sum
        val share = ev.toDouble / tot * 1e6
        assert(boundaryMargin(share) > 1e-6, s"q388 share margin at band $b")
        Some((b, in.length.toLong, ev, halfUp(share)))
      }
    }
    val got = graft.queries.Round12.q388(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // concentration must be real: the widest band holds the most events
    assert(expected.last._3 >= expected.head._3)
  }

  test("q389 Spearman: exact rank replay at both gate SFs; e6 score margins hold") {
    for (dir <- Seq(sf1, "/root/testdata/sf0.01")) {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select($"source", $"doc_id", $"text")
        .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2)))
      val scored = docs.map { case (src, id, text) =>
        val ws = text.split(" ", -1)
        val stop = ws.count(w => w == "a" || w == "the")
        val q = (1.0 - stop.toDouble / ws.length) *
          math.min(ws.length.toDouble / 50.0, 1.0)
        assert(boundaryMargin(q * 1e6) > 1e-6, s"q389 score margin doc $id")
        (src, id, halfUp(q * 1e6), ws.length.toLong)
      }
      val expected = scored.groupBy(_._1).toSeq.sortBy(_._1).map {
        case (src, g) =>
          val rq = g.sortBy(t => (t._3, t._2)).zipWithIndex
            .map { case (t, i) => t._2 -> (i + 1L) }.toMap
          val rl = g.sortBy(t => (t._4, t._2)).zipWithIndex
            .map { case (t, i) => t._2 -> (i + 1L) }.toMap
          val nd = g.length.toLong
          val sd2 = g.map(t => { val d = rq(t._2) - rl(t._2); d * d }).sum
          val rho = 1.0 - 6.0 * sd2.toDouble /
            (nd.toDouble * (nd.toDouble * nd.toDouble - 1.0))
          (src, nd, if (nd > 1) Some(halfUp(rho * 1e6)) else None)
      }
      val got = graft.queries.Round12.q389(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1),
          if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
      assert(got === expected, s"at $dir")
      // the saturating length factor means rho must NOT be trivially 1
      assert(expected.exists(e => e._3.exists(_ < 1000000)), s"at $dir")
    }
  }

  test("q390 median/MAD: exact order-statistic replay; both outlier bands bind") {
    val xs = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_orderkey", $"o_totalprice")
      .collect()
      .map(r => (r.getLong(0),
        d2(r.getDouble(1)).movePointRight(2).longValueExact()))
    val n = xs.length.toLong
    val med = xs.map(_._2).sorted.apply(((n + 1) / 2 - 1).toInt)
    val devs = xs.map { case (_, x) => math.abs(x - med) }
    val mad = devs.sorted.apply(((n + 1) / 2 - 1).toInt)
    val gt2 = devs.count(_ > 2 * mad).toLong
    val gt3 = devs.count(_ > 3 * mad).toLong
    val got = graft.queries.Round12.q390(spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === (n, med, mad, gt2, gt3))
    assert(mad > 0 && gt2 > gt3, "q390 bands must bind (gt2 > gt3 > boundary)")
  }

  test("q391 Benford: digit census replay; chi2 margins hold; digits complete") {
    val xs = spark.read.parquet(s"$sf1/orders.parquet")
      .select($"o_totalprice").collect()
      .map(r => d2(r.getDouble(0)).movePointRight(2).longValueExact())
      .filter(_ > 0)
    val census = xs.map(_.toString.head.asDigit.toLong)
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val n = census.values.sum
    val expected = census.toSeq.sortBy(_._1).map { case (d, nd) =>
      val p = math.log(1.0 + 1.0 / d) / math.log(10.0)
      val obs = nd.toDouble / n * 1e9
      val term = (nd - n * p) * (nd - n * p) / (n * p) * 1e6
      assert(boundaryMargin(p * 1e9) > 1e-6, s"q391 p margin digit $d")
      assert(boundaryMargin(obs) > 1e-6, s"q391 obs margin digit $d")
      assert(boundaryMargin(term) > 1e-6, s"q391 term margin digit $d")
      (d, nd, halfUp(p * 1e9), halfUp(obs), halfUp(term))
    }
    val got = graft.queries.Round12.q391(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.map(_._1) === (1L to 9L), "all nine leading digits present")
  }
}
