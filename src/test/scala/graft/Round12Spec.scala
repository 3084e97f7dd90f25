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

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def h52(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 13), 16)

  test("q392 bottom-k estimate: exact sample replay; the estimator binds both ways") {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"source", $"doc_id", $"text")
      .collect().map(r => (r.getString(0), r.getLong(1),
        r.getString(2).split(" ", -1).length.toLong))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val ranked = g.map(d => (h52(d._2.toString), d._2, d._3))
        .sortBy(t => (t._1, t._2))
      val sample = ranked.take(8)
      val n = g.length.toLong
      val exact = g.map(_._3).sum
      val k = sample.length.toLong
      val st = sample.map(_._3).sum
      val estD = n.toDouble * st.toDouble / k.toDouble
      // k = 8 is a power of two, so n·st/k is EXACTLY representable —
      // a margin of exactly 0.0 means the value IS x.5 (not float
      // drift toward it), and both engines round positive halves up
      // (Spark HALF_UP, DuckDB half-away-from-zero). Only NEAR-.5
      // values (true rounding hazards) are rejected.
      val m392 = boundaryMargin(estD)
      assert(m392 > 1e-6 || m392 == 0.0, s"q392 est margin at $src")
      val est = halfUp(estD)
      val rel = (est.toDouble - exact.toDouble) / exact.toDouble * 1e6
      assert(boundaryMargin(rel) > 1e-6, s"q392 rel margin at $src")
      (src, n, k, exact, est, halfUp(rel))
    }
    val got = graft.ext.Sampling.queries("q392_bottomk_estimate")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // the sketch must actually estimate: some source over, some under
    assert(expected.exists(_._6 > 0) && expected.exists(_._6 < 0),
      "q392 estimator degenerate — every source exact")
  }

  test("q393 KMV distinct: exact k-th pick replay; every source binds; error sane") {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"source", $"text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val shingles = g.flatMap { case (_, text) =>
        val ws = text.split(" ", -1)
        if (ws.length < 3) Seq.empty
        else (0 to ws.length - 3).map(i => s"${ws(i)} ${ws(i + 1)} ${ws(i + 2)}")
      }.distinct
      val exact = shingles.length.toLong
      val ranked = shingles.map(w => (h52(w), w)).sortBy(identity)
      assert(ranked.length >= 64, s"q393 must bind at $src (vacuous sketch)")
      val hk = ranked(63)._1
      val estD = 63.0 * 4503599627370496.0 / hk.toDouble
      assert(boundaryMargin(estD) > 1e-6, s"q393 est margin at $src")
      val est = halfUp(estD)
      val rel = (est.toDouble - exact.toDouble) / exact.toDouble * 1e6
      assert(boundaryMargin(rel) > 1e-6, s"q393 rel margin at $src")
      (src, exact, est, halfUp(rel))
    }
    val got = graft.queries.Round12.q393(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
    // KMV at k=64 on ~1.1k sets: |rel err| should stay well under 50%
    assert(expected.forall(e => math.abs(e._4) < 500000),
      "q393 KMV error implausibly large — estimator bug")
  }

  test("q394 NLL outliers: exact LM + census replay; the 2-sigma gate binds") {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"source", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val tf = docs.flatMap { case (id, _, text) =>
      text.split(" ", -1).groupBy(identity).map { case (w, g) =>
        ((id, w), g.length.toLong)
      }
    }
    val vocab = tf.groupBy(_._1._2).map { case (w, g) => w -> g.map(_._2).sum }
    val n = vocab.values.sum
    val vsz = vocab.size.toLong
    val nll = docs.map { case (id, src, text) =>
      val terms = tf.filter(_._1._1 == id)
      val tot = terms.map(_._2).sum
      val s = terms.map { case ((_, w), f) =>
        f * -math.log((vocab(w) + 1.0) / (n + vsz))
      }.sum
      val x = halfUp(s / tot * 10000)
      (src, x)
    }
    val expected = nll.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val nd = g.length.toLong
      val sv = g.map(_._2).sum
      val qv = g.map(t => BigInt(t._2) * t._2).sum
      val out = g.count { t =>
        val dev = BigInt(nd) * t._2 - sv
        dev > 0 && dev * dev > (BigInt(nd) * qv - BigInt(sv) * sv) * 4
      }.toLong
      val mean = sv.toDouble / nd
      val sd = math.sqrt((BigInt(nd) * qv - BigInt(sv) * sv).toDouble) / nd
      assert(boundaryMargin(mean) > 1e-6, s"q394 mean margin at $src")
      assert(boundaryMargin(sd) > 1e-6, s"q394 sd margin at $src")
      (src, nd, halfUp(mean), halfUp(sd), out)
    }
    val got = graft.ext.TextAnalysis.q394(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(expected.map(_._5).sum > 0, "q394 2-sigma gate never binds")
    // heavy-tailed NLL legitimately puts >= 1 outlier in every source
    // here; the sanity bound is that the gate never flags a majority
    assert(expected.forall(e => e._5 * 2 < e._2),
      "q394 gate flags a majority of docs — too loose")
  }

  test("q395 retention triangle: exact replay; age 0 is 100%; churn binds") {
    val ev = graft.Tables.events(spark, sf1)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000000L)))
      .distinct
    val cohort = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val tri = ev.map { case (u, d) => (cohort(u), d - cohort(u)) }
      .groupBy(identity).map { case (k, g) => k -> g.length.toLong }
    val expected = tri.toSeq.sortBy(_._1).map { case ((c, age), na) =>
      val sz = tri((c, 0L))
      val share = na.toDouble / sz * 1e6
      assert(boundaryMargin(share) > 1e-6, s"q395 share margin at ($c,$age)")
      (c, age, na, sz, halfUp(share))
    }
    val got = graft.ext.Patterns.queries("q395_retention_triangle")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.filter(_._2 == 0L).forall(_._5 == 1000000L),
      "age-0 retention must be 100% by construction")
    assert(got.exists(_._5 < 1000000L),
      "q395 vacuous — no churn anywhere (the weekly-grain failure mode)")
  }

  test("q396 avg neighbor degree: exact replay; the k*n_k slot identity holds") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { g =>
      val ps = g.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.distinct
    val deg = (edges.map(_._1) ++ edges.map(_._2))
      .groupBy(identity).map { case (k, v) => k -> v.length.toLong }
    val slots = edges.flatMap { case (a, b) =>
      Seq((deg(a), deg(b)), (deg(b), deg(a)))
    }
    val nd = slots.groupBy(_._1).map { case (k, g) =>
      k -> (g.length.toLong, g.map(_._2).sum)
    }
    val nk = deg.values.groupBy(identity)
      .map { case (k, v) => k -> v.size.toLong }
    val expected = nk.toSeq.sortBy(_._1).map { case (k, nNodes) =>
      val (nSlots, snd) = nd(k)
      assert(nSlots == k * nNodes, s"q396 slot identity broke at k=$k")
      val knn = snd.toDouble / nSlots * 1e4
      assert(boundaryMargin(knn) > 1e-6, s"q396 knn margin at k=$k")
      (k, nNodes, nSlots, snd, halfUp(knn))
    }
    val got = graft.ext.Graph.queries("q396_avg_neighbor_degree")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q397 TPC-H Q15: exact decimal argmax replay; a unique max here") {
    val li = spark.read.parquet(s"$sf1/lineitem.parquet")
      .select($"l_suppkey", $"l_shipdate".cast("date").cast("string"),
        $"l_extendedprice", $"l_discount")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
        r.getDouble(3)))
      .filter(t => t._2 >= "1996-01-01" && t._2 < "1996-04-01")
    val rev = li.groupBy(_._1).map { case (k, g) =>
      k -> g.map(t => d2(t._3).multiply(JBig.ONE.subtract(d2(t._4))))
        .reduce(_ add _)
    }
    val mx = rev.values.max
    val names = spark.read.parquet(s"$sf1/supplier.parquet")
      .select($"s_suppkey".cast("long"), $"s_name")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = rev.filter(_._2 == mx).toSeq.sortBy(_._1)
      .map { case (k, v) =>
        (k, names(k), v.setScale(2, RoundingMode.HALF_UP).doubleValue())
      }
    val got = graft.queries.Round12.q397(spark, sf1).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSeq
    assert(got === expected)
    assert(got.length == 1, "fixture contract: a unique max supplier")
  }

  test("q398 burstiness: exact moment replay; types spread around 0") {
    val ev = graft.Tables.events(spark, sf1)
      .select($"user_id", $"event_id", $"event_type", $"ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        Math.floorDiv(r.getLong(3), 1000L)))
    val gaps = ev.groupBy(t => (t._1, t._3)).values.flatMap { g =>
      val sorted = g.sortBy(t => (t._4, t._2))
      sorted.zip(sorted.drop(1)).map { case (a, b) => (a._3, b._4 - a._4) }
    }
    val expected = gaps.groupBy(_._1).toSeq.sortBy(_._1).map { case (t, g) =>
      val n = g.size.toLong
      val sv = g.map(_._2).sum
      val qv = g.map(x => BigInt(x._2) * x._2).sum
      val mean = sv.toDouble / n
      assert(boundaryMargin(mean) > 1e-6, s"q398 mean margin at $t")
      val disc = math.sqrt((BigInt(n) * qv - BigInt(sv) * sv).toDouble)
      val b = (disc - sv.toDouble) / (disc + sv.toDouble) * 1e6
      assert(boundaryMargin(b) > 1e-6, s"q398 B margin at $t")
      (t, n, halfUp(mean), if (n > 1) Some(halfUp(b)) else None)
    }
    val got = graft.queries.Round12.q398(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)))).toSeq
    assert(got === expected)
    // gaps from pooled user streams must not be degenerate-periodic
    assert(expected.flatMap(_._4).exists(_ != 0L))
  }

  test("q399 isotropy: exact e3-grid replay; labels differ; range sane") {
    val vecs = spark.read.parquet(s"$sf1/embeddings.parquet")
      .select($"label".cast("long"), $"embedding")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray))
    val gridded = vecs.map { case (l, e) =>
      val g = e.map { x =>
        assert(boundaryMargin(x * 1000) > 1e-6, "q399 e3 grid margin")
        halfUp(x * 1000)
      }
      (l, g)
    }
    val expected = gridded.groupBy(_._1).toSeq.sortBy(_._1).map {
      case (l, g) =>
        val n = g.length.toLong
        val q2 = g.map(v => v._2.map(x => BigInt(x) * x).sum).sum
        val dims = g.head._2.indices
        val s2 = dims.map { i =>
          val sd = g.map(_._2(i)).sum
          BigInt(sd) * sd
        }.sum
        val iso = s2.toDouble / (n.toDouble * q2.toDouble) * 1e6
        assert(boundaryMargin(iso) > 1e-6, s"q399 iso margin at $l")
        (l, n, halfUp(iso))
    }
    val got = graft.ext.Similarity.queries("q399_isotropy")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(expected.map(_._3).distinct.length > 1,
      "q399 vacuous — identical isotropy everywhere")
    assert(expected.forall(e => e._3 >= 0 && e._3 <= 1000000))
  }

  test("q400 Neyman allocation: exact weight+Hamilton replay; quotas sum to 300; " +
    "allocation genuinely differs from proportional") {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"source", $"n_chars".cast("long"))
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val weights = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, g) =>
      val n = g.length.toLong
      val sv = g.map(_._2).sum
      val qv = g.map(x => BigInt(x._2) * x._2).sum
      val w = math.sqrt((BigInt(n) * qv - BigInt(sv) * sv).toDouble) * 1000
      assert(boundaryMargin(w) > 1e-6, s"q400 weight margin at $src")
      (src, n, halfUp(w))
    }
    val total = weights.map(_._3).sum
    val based = weights.map { case (src, n, w) =>
      (src, n, w, w * 300 / total, w * 300 % total)
    }
    val leftover = 300 - based.map(_._4).sum
    val ranked = based.sortBy(t => (-t._5, t._1)).zipWithIndex
      .map { case (t, i) => t._1 -> (i + 1 <= leftover) }.toMap
    val expected = based.map { case (src, n, w, base, _) =>
      (src, n, w, base + (if (ranked(src)) 1L else 0L))
    }
    val got = graft.ext.Sampling.queries("q400_neyman_allocation")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
    assert(got.map(_._4).sum == 300L, "quotas must sum to the budget exactly")
    // Neyman must differ from proportional-by-count somewhere, or the
    // variance weighting is vacuous on this fixture
    val prop = {
      val nTot = weights.map(_._2).sum
      weights.map(t => t._1 -> t._2 * 300 / nTot).toMap
    }
    assert(got.exists(g => math.abs(g._4 - prop(g._1)) > 1),
      "q400 indistinguishable from proportional allocation")
  }

  test("q401 decontam curve: exact hit-census replay; thresholds bind; " +
    "flagged mass falls monotonically") {
    val docs = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1).split(" ", -1)))
    def grams(ws: Array[String]): Set[String] =
      if (ws.length < 5) Set.empty
      else (0 to ws.length - 5).map(i => ws.slice(i, i + 5).mkString(" ")).toSet
    val evalGrams = docs.filter(_._1 % 7 == 0).flatMap(d => grams(d._2)).toSet
    val perDoc = docs.filter(_._1 % 7 != 0).map { case (_, ws) =>
      (ws.length.toLong, grams(ws).count(evalGrams.contains).toLong)
    }
    val ndAll = perDoc.length.toLong
    val tokAll = perDoc.map(_._1).sum
    val expected = Seq(1L, 2L, 4L, 8L).flatMap { thr =>
      val fl = perDoc.filter(_._2 >= thr)
      if (fl.isEmpty) None
      else {
        val nf = fl.length.toLong
        val tf = fl.map(_._1).sum
        val ds = nf.toDouble / ndAll * 1e6
        val ts = tf.toDouble / tokAll * 1e6
        assert(boundaryMargin(ds) > 1e-6 && boundaryMargin(ts) > 1e-6,
          s"q401 share margin at thr=$thr")
        Some((thr, nf, tf, halfUp(ds), halfUp(ts)))
      }
    }
    val got = graft.ext.Decontam.queries("q401_decontam_curve")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(expected.length == 4, "every threshold must flag something here")
    assert(expected.map(_._2) == expected.map(_._2).sorted.reverse,
      "flagged docs must fall (weakly) as the threshold rises")
    assert(expected.head._2 > expected.last._2,
      "the curve must actually move across thresholds")
  }

  test("q402 source leakage: candidates roll up to the exact cell census; " +
    "off-diagonal leakage exists") {
    // reuse the engine's own q107 candidates as the pair set (they are
    // oracle-certified), and verify ONLY the source roll-up here
    val cand = graft.ext.Dedup.queries("q107_minhash_portable")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val src = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"source")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = cand.map { case (a, b, sb) =>
      val (s1, s2) = (src(a), src(b))
      ((if (s1 <= s2) s1 else s2, if (s1 <= s2) s2 else s1), sb)
    }.groupBy(_._1).toSeq.sortBy(_._1).map { case ((sa, sb), g) =>
      val n = g.length.toLong
      val bands = g.map(_._2).sum
      val mean = bands.toDouble / n * 1e4
      assert(boundaryMargin(mean) > 1e-6 || boundaryMargin(mean) == 0.0,
        s"q402 mean margin at ($sa,$sb)")
      (sa, sb, n, bands, halfUp(mean))
    }
    val got = graft.ext.Dedup.queries("q402_source_leakage")(spark, sf1)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.exists(c => c._1 != c._2), "no off-diagonal leakage cell")
  }

  test("q403 DAU/WAU/MAU: exact coverage replay; windows nest; stickiness binds") {
    val ud = graft.Tables.events(spark, sf1)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000000L)))
      .distinct
    val dau = ud.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
    def roll(k: Int) = ud.flatMap { case (u, d) =>
      (0 until k).map(i => (u, d + i))
    }.distinct.groupBy(_._2).map { case (d, g) => d -> g.length.toLong }
    val (wau, mau) = (roll(7), roll(30))
    val expected = dau.toSeq.sortBy(_._1).map { case (d, a) =>
      val s = a.toDouble / mau(d) * 1e6
      assert(boundaryMargin(s) > 1e-6 || boundaryMargin(s) == 0.0,
        s"q403 stickiness margin at day $d")
      (d, a, wau(d), mau(d), halfUp(s))
    }
    val got = graft.ext.Patterns.queries("q403_dau_mau")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.forall(r => r._2 <= r._3 && r._3 <= r._4),
      "DAU <= WAU <= MAU must hold on every day")
    assert(got.exists(_._5 < 1000000L), "stickiness never binds below 1.0")
  }

  test("q404 top-decile persistence: exact split+rank replay; churn binds") {
    val ev = graft.Tables.events(spark, sf1)
      .select($"user_id", $"ts").collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), 86400000000000L)))
    val (d0, d1) = (ev.map(_._2).min, ev.map(_._2).max)
    val halves = ev.map { case (u, d) =>
      ((u, if (d * 2 <= d0 + d1) 0L else 1L), 1L)
    }.groupBy(_._1).map { case (k, g) => k -> g.map(_._2).sum }
    def topSet(h: Long): Set[Long] = {
      val hs = halves.filter(_._1._2 == h).toSeq
        .map { case ((u, _), c) => (u, c) }
      val n = hs.size.toLong
      hs.sortBy(t => (-t._2, t._1)).zipWithIndex
        .filter { case (_, i) => (i + 1) * 10 <= n }
        .map(_._1._1).toSet
    }
    val (t0, t1) = (topSet(0L), topSet(1L))
    val both = (t0 & t1).size.toLong
    val fo = (t0 -- t1).size.toLong
    val so = (t1 -- t0).size.toLong
    val j = both.toDouble / (both + fo + so) * 1e6
    val p = both.toDouble / (both + fo) * 1e6
    assert(boundaryMargin(j) > 1e-6 && boundaryMargin(p) > 1e-6)
    val got = graft.queries.Round12.q404(spark, sf1).collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2), got.getLong(3),
      got.getLong(4)) === (both, fo, so, halfUp(j), halfUp(p)))
    // sf0.001's ~30 users hold a stable 3-user decile (no churn there);
    // the binding proof runs at sf0.01 where whales genuinely churn
    val g01 = graft.queries.Round12.q404(spark, "/root/testdata/sf0.01")
      .collect()(0)
    assert(g01.getLong(1) > 0 && g01.getLong(2) > 0,
      "q404 vacuous at sf0.01 — the top decile never churns")
  }

  test("q405 hourly profile: exact grid replay; 120 cells; one peak per type") {
    val cells = graft.Tables.events(spark, sf1)
      .select($"event_type", $"ts").collect()
      .map(r => (r.getString(0),
        Math.floorDiv(r.getLong(1), 3600000000000L) % 24))
      .groupBy(identity).map { case (k, g) => k -> g.size.toLong }
    val expected = cells.groupBy(_._1._1).toSeq.sortBy(_._1).flatMap {
      case (t, g) =>
        val tot = g.values.sum
        val mx = g.values.max
        val peak = g.filter(_._2 == mx).keys.map(_._2).min
        g.toSeq.sortBy(_._1._2).map { case ((_, h), n) =>
          val s = n.toDouble / tot * 1e6
          assert(boundaryMargin(s) > 1e-6, s"q405 share margin at ($t,$h)")
          (t, h, n, halfUp(s), if (h == peak) 1L else 0L)
        }
    }
    val got = graft.queries.Round12.q405(spark, sf1).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.length == 120 && got.count(_._5 == 1L) == 5,
      "24 hours x 5 types, exactly one peak each")
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
