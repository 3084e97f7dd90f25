package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.queries.Round8

/** Round-8 family: full driver-side replays on the sf0.001 fixtures
  * plus the rounding-boundary margin pins the float discipline
  * requires (CLAUDE.md: never hash-compare doubles near a threshold
  * without measuring the margin).
  */
class Round8Spec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Spark's decimal(18,2) cast semantics on a double: HALF_UP at 2. */
  private def cents(x: Double): Long =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("q204 benford: every digit's expected-share e6 margin is >= 0.005") {
    // The only library-drift source is log10; pin each digit's distance
    // from the e6 rounding boundary so a libm difference can never flip
    // exp_e6. Digit 9 is the minimum: log10(10/9)·1e6 = 45757.4906,
    // margin 0.0094 in e6 units = 9.4e-9 absolute — vs one-ulp drift
    // ~1e-16 at this magnitude, seven orders of headroom.
    val margins = (1 to 9).map { d =>
      val frac = math.log10(1.0 + 1.0 / d) * 1e6 % 1.0
      d -> math.abs(frac - 0.5)
    }.toMap
    assert(margins.values.min > 0.005, s"margins: $margins")
    assert(margins.minBy(_._2)._1 === 9)
  }

  test("q204 benford: full replay from raw lineitem (exact cents digits)") {
    val prices = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_extendedprice").as[Double].collect().filter(_ > 0)
    val counts = prices.map(p => cents(p).toString.head.asDigit)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val total = counts.values.sum
    val expected = counts.toSeq.sorted.map { case (d, n) =>
      val obs = math.round(n.toDouble / total * 1e6)
      val exp = math.round(math.log(1.0 + 1.0 / d) / math.log(10.0) * 1e6)
      (d, n, obs, exp, obs - exp)
    }
    val got = Round8.q204(spark, sf).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === prices.length.toLong)
  }

  test("q205 chi2: full replay; portable dow; contributions nonnegative") {
    val ev = Tables.events(spark, sf)
      .select($"event_type", $"ts").as[(String, Long)].collect()
    val cells = ev.map { case (t, ns) =>
      val day = Math.floorDiv(ns / 1000L, 86400000000L)
      (t, (day + 4) % 7)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowTot = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val colTot = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val n = cells.values.sum
    val expected = cells.toSeq.sortBy(_._1).map { case ((t, dow), o) =>
      val e = (rowTot(t) * colTot(dow)).toDouble / n.toDouble
      (t, dow, o, math.round(e * 10000),
        math.round((o.toDouble - e) * (o.toDouble - e) / e * 10000))
    }
    val got = Round8.q205(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
    assert(got.forall(_._5 >= 0))
    assert(got.map(_._3).sum === ev.length.toLong)
  }

  test("q206 autocorr: full replay with exact BigInt moments") {
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderdate".cast("date").cast("string"), $"o_totalprice")
      .as[(String, Double)].collect()
      .groupBy(_._1).view
      .mapValues(xs => BigInt(xs.map(x => cents(x._2)).sum) / 100) // whole $
      .toSeq.sortBy(_._1).map(_._2)
    val pairs = daily.zip(daily.tail)
    val np = pairs.length.toLong
    val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
    val sxy = pairs.map(p => p._1 * p._2).sum
    val sxx = pairs.map(p => p._1 * p._1).sum
    val syy = pairs.map(p => p._2 * p._2).sum
    val r = (np.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble) /
      math.sqrt((np.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble) *
        (np.toDouble * syy.toDouble - sy.toDouble * sy.toDouble))
    val row = Round8.q206(spark, sf).collect().head
    assert(row.getLong(0) === np)
    assert(row.getLong(1) === math.round(r * 1e6))
    assert(math.abs(row.getLong(1)) <= 1000000L)
  }

  test("q203/q207: grouped fixed-point totals equal a direct ungrouped sum") {
    // Different plan shape (no grouping, no join order reuse) must land
    // on the identical exact-decimal total — decimal summation is
    // order-independent, unlike doubles. Runs at sf0.01: the sf0.001
    // supplier sample has no NATION_1/2 trade lines at all (checked),
    // which would make the Q7 half vacuous.
    val sf01 = "/root/testdata/sf0.01"
    val q7 = Round8.q203(spark, sf01)
    assert(q7.count() > 0)
    val q7total =
      q7.agg(coalesce(sum($"rev_e4"), lit(0L))).as[Long].collect().head
    val li = spark.read.parquet(s"$sf01/lineitem.parquet")
    val direct = li
      .filter($"l_shipdate" >= lit("1996-01-01").cast("date") &&
        $"l_shipdate" < lit("1998-01-01").cast("date"))
      .join(spark.read.parquet(s"$sf01/orders.parquet"),
        $"l_orderkey" === $"o_orderkey")
      .join(spark.read.parquet(s"$sf01/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .join(spark.read.parquet(s"$sf01/supplier.parquet"),
        $"l_suppkey" === $"s_suppkey")
      .join(spark.read.parquet(s"$sf01/nation.parquet")
        .select($"n_nationkey".as("snk"), $"n_name".as("sn")),
        $"s_nationkey" === $"snk")
      .join(spark.read.parquet(s"$sf01/nation.parquet")
        .select($"n_nationkey".as("cnk"), $"n_name".as("cn")),
        $"c_nationkey" === $"cnk")
      .filter($"sn".isin("NATION_1", "NATION_2") &&
        $"cn".isin("NATION_1", "NATION_2") && $"sn" =!= $"cn")
      .agg(coalesce((sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1) - $"l_discount".cast("decimal(18,2)"))) * 10000).cast("long"),
        lit(0L)))
      .as[Long].collect().head
    assert(q7total === direct)

    val q9 = Round8.q207(spark, sf01)
    val q9total = q9.agg(sum($"profit_e4")).as[Long].collect().head
    val directProfit = li
      .join(spark.read.parquet(s"$sf01/part.parquet"),
        $"l_partkey" === $"p_partkey")
      .agg((sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1) - $"l_discount".cast("decimal(18,2)")) -
        $"p_retailprice".cast("decimal(18,2)") *
          $"l_quantity".cast("decimal(18,0)")) * 10000).cast("long"))
      .as[Long].collect().head
    assert(q9total === directProfit)
    // every lineitem lands in exactly one (nation, year) group
    assert(q9.agg(sum($"n_lines")).as[Long].collect().head === li.count())
  }

  test("q208/q210 shares: subset <= total; e6 share recomputes from the longs") {
    for ((df, totalCol, partCol, shareCol) <- Seq(
      (queries.Round8.q208(spark, "/root/testdata/sf0.01"),
        "rev_total_e4", "rev_nation_e4", "share_e6"),
      (queries.Round8.q210(spark, "/root/testdata/sf0.01"),
        "rev_total_e4", "rev_promo_e4", "promo_share_e6"))) {
      val rows = df.select(col(totalCol), col(partCol), col(shareCol))
        .as[(Long, Long, Long)].collect()
      assert(rows.nonEmpty)
      rows.foreach { case (tot, part, share) =>
        assert(part >= 0 && part <= tot)
        assert(share === math.round(part.toDouble / tot.toDouble * 1e6))
      }
    }
  }

  test("q209 top-100: ordering is (lost_e4 desc, custkey); spot total exact") {
    val sf01 = "/root/testdata/sf0.01"
    val rows = queries.Round8.q209(spark, sf01)
      .select($"c_custkey", $"lost_e4").as[(Long, Long)].collect()
    assert(rows.length === 100)
    rows.sliding(2).foreach { case Array((k1, v1), (k2, v2)) =>
      assert(v1 > v2 || (v1 == v2 && k1 < k2))
    }
    // spot-check the winner against a direct single-customer recompute
    val (topKey, topVal) = rows.head
    val direct = spark.read.parquet(s"$sf01/lineitem.parquet")
      .filter($"l_returnflag" === "R")
      .join(spark.read.parquet(s"$sf01/orders.parquet")
        .filter($"o_custkey" === topKey), $"l_orderkey" === $"o_orderkey")
      .agg((sum($"l_extendedprice".cast("decimal(18,2)") *
        (lit(1) - $"l_discount".cast("decimal(18,2)"))) * 10000).cast("long"))
      .as[Long].collect().head
    assert(direct === topVal)
  }

  test("q211 brand shift: per-year shares sum to ~1e6; shift = last - first") {
    val sf01 = "/root/testdata/sf0.01"
    val out = queries.Round8.q211(spark, sf01).collect()
    out.foreach { r =>
      assert(r.getLong(4) === r.getLong(3) - r.getLong(2)) // shift = last-first
      assert(r.getLong(1) >= 1)
    }
    // rebuild the per-year share frame the query derives from: shares in
    // a year must sum to 1e6 within per-brand rounding slack (n/2)
    val by = spark.read.parquet(s"$sf01/lineitem.parquet")
      .select($"l_partkey",
        year($"l_shipdate".cast("date")).cast("long").as("yr"),
        ($"l_extendedprice".cast("decimal(18,2)") *
          (lit(1) - $"l_discount".cast("decimal(18,2)"))).as("rev"))
      .join(spark.read.parquet(s"$sf01/part.parquet")
        .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand", $"yr")
      .agg((sum($"rev") * 10000).cast("long").as("rev_e4"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    by.groupBy(_._2).foreach { case (_, rows) =>
      val tot = rows.map(_._3).sum
      val shareSum = rows.map(r => math.round(r._3.toDouble / tot * 1e6)).sum
      assert(math.abs(shareSum - 1000000L) <= rows.length / 2 + 1)
    }
  }

  test("q213 banded outer-product equals the unbanded result (B in {3, 4})") {
    // Band-equivalence: the moments are integer sums over the same cell
    // set regardless of blocking, so every banding must reproduce the
    // unbanded frame EXACTLY — including B=3, whose ceil-width 22 does
    // not divide 64 (tail slices fall short; last band starts at 44).
    val base = Round8.q213Banded(spark, sf, bands = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(base.nonEmpty)
    Seq(3, 4).foreach { b =>
      val banded = Round8.q213Banded(spark, sf, bands = b)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
      assert(banded === base, s"bands=$b diverged from unbanded")
    }
  }

  test("q213 embedding dimension is pinned to 64 (oracle range(64) contract)") {
    // The q213 oracle hard-codes range(64) while the Spark side follows
    // the actual array length. The driver has regenerated testdata
    // between rounds before (events.ts, r8); if an embeddings regen
    // changes the dimension, fail HERE with a clear message instead of
    // as a confusing oracle NULL-cell hash mismatch in the gate.
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val dims = spark.read.parquet(s"$d/embeddings.parquet")
        .select(size($"embedding").as("d")).distinct().as[Int].collect().toSeq
      assert(dims === Seq(64),
        s"embedding dim changed in $d (got $dims): update the q213 oracle's " +
          "range(64) and this pin together")
    }
  }
}
