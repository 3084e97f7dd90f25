package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 seventh batch: brand sourcing HHI (q284), Cramér's V over
  * the (brand × type) contingency (q285), discount→volume Pearson per
  * brand (q286). Driver-side exact replays on sf0.001 plus
  * rounding-boundary margins.
  */
class Round9gSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private lazy val partBrand: Map[Long, String] =
    spark.read.parquet(s"$sf/part.parquet")
      .select($"p_partkey", $"p_brand").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toMap

  // --------------------------------------------------------------- q284

  test("q284 brand HHI: BigInt replay + concentration binds") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_suppkey", $"l_quantity").collect()
      .map(r => (partBrand(r.getAs[Number](0).longValue()),
        r.getAs[Number](1).longValue(),
        r.getDouble(2).toLong))
    var minMargin = Double.MaxValue
    val expected = li.groupBy(x => (x._1, x._2)).toSeq
      .map { case ((b, sup), xs) => (b, sup, xs.map(_._3).sum) }
      .groupBy(_._1).map { case (b, xs) =>
        val q = xs.map(x => BigInt(x._3))
        val tot = q.sum
        val hhi = q.map(x => x * x).sum.toDouble / (tot * tot).toDouble
        minMargin = math.min(minMargin, boundaryMargin(hhi * 1e6))
        (b, xs.size.toLong, tot.toLong, halfUp(hhi * 1e6))
      }.toSet
    val got = graft.queries.Round9.q284(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 HHI margin razor-thin: $minMargin")
    // Concentration must bind: every brand above the 1/n floor (real
    // unevenness), none sole-sourced at this SF.
    got.foreach { g =>
      assert(g._4 > halfUp(1e6 / g._2) - 1, s"HHI below 1/n floor: $g")
      assert(g._4 < 1000000L, s"sole-sourced brand at this SF: $g")
    }
  }

  // --------------------------------------------------------------- q285

  test("q285 Cramer's V: per-cell gridded chi2 replay + V in range") {
    val parts = spark.read.parquet(s"$sf/part.parquet")
      .select($"p_brand", $"p_type").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val cells = parts.groupBy(identity).map { case (k, xs) =>
      (k, xs.length.toLong)
    }
    val rM = cells.groupBy(_._1._1).map { case (b, xs) => b -> xs.values.sum }
    val cM = cells.groupBy(_._1._2).map { case (t, xs) => t -> xs.values.sum }
    val n = parts.length.toLong
    var minMargin = Double.MaxValue
    val terms = cells.toSeq.map { case ((b, t), o) =>
      val e = rM(b).toDouble * cM(t).toDouble / n.toDouble
      val term = (o.toDouble - e) * (o.toDouble - e) / e * 1e9
      minMargin = math.min(minMargin, boundaryMargin(term))
      halfUp(term)
    }
    val chi2 = terms.sum
    val k = math.min(rM.size, cM.size) - 1
    val v = math.sqrt((chi2.toDouble / 1e9) / (n.toDouble * k.toDouble))
    val r = graft.queries.Round9.q285(spark, sf).head()
    assert(r.getLong(0) == n)
    assert(r.getLong(1) == cells.size.toLong)
    assert(r.getLong(2) == chi2)
    assert(r.getLong(3) == halfUp(v * 1e6))
    assert(minMargin > 1e-4, s"e9 term margin razor-thin: $minMargin")
    // V must be a real effect size: strictly inside (0, 1), and small
    // on this independently-generated catalog (null calibration).
    assert(r.getLong(3) > 0 && r.getLong(3) < 500000L)
  }

  // --------------------------------------------------------------- q286

  test("q286 discount corr: BigInt moment replay + null calibration") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_discount", $"l_quantity").collect()
      .map(r => (partBrand(r.getAs[Number](0).longValue()),
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact,
        r.getDouble(2).toLong))
    var minMargin = Double.MaxValue
    val expected = li.groupBy(_._1).map { case (b, xs) =>
      val n = BigInt(xs.length)
      val sx = BigInt(xs.map(_._2).sum); val sy = BigInt(xs.map(_._3).sum)
      val sxx = xs.map(x => BigInt(x._2) * x._2).sum
      val syy = xs.map(x => BigInt(x._3) * x._3).sum
      val sxy = xs.map(x => BigInt(x._2) * x._3).sum
      val num = n * sxy - sx * sy
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val rr = num.toDouble / math.sqrt(vx.toDouble * vy.toDouble)
      minMargin = math.min(minMargin, boundaryMargin(rr * 1e6))
      (b, xs.length.toLong, halfUp(rr * 1e6))
    }.toSet
    val got = graft.queries.Round9.q286(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 margin razor-thin: $minMargin")
    // Null calibration: independently-drawn discount and quantity
    // correlate near zero (|r| < 0.35 even at this SF's ~100-line
    // brands, where se ≈ 1/√n ≈ 0.1), but never exactly zero.
    got.foreach { g =>
      assert(math.abs(g._3) < 350000L, s"implausible correlation: $g")
    }
    assert(got.exists(_._3 != 0L))
  }
}
