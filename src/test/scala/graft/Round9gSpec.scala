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

  // --------------------------------------------------------------- q287

  test("q287 ABC classes: all-integer boundary replay + Pareto binds") {
    val pc = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_partkey", $"l_extendedprice").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact))
      .groupBy(_._1).toSeq.map { case (pk, xs) => (pk, xs.map(_._2).sum) }
    val tot = pc.map(x => BigInt(x._2)).sum
    val ranked = pc.sortBy { case (pk, x) => (-x, pk) }
    var cum = BigInt(0)
    val classed = ranked.map { case (_, x) =>
      val before = cum * 100
      cum += x
      val cls = if (before < tot * 80) "A"
      else if (before < tot * 95) "B" else "C"
      (cls, x)
    }
    val expected = classed.groupBy(_._1).map { case (c, xs) =>
      val cents = xs.map(x => BigInt(x._2)).sum
      (c, xs.size.toLong, cents.toLong,
        halfUp(cents.toDouble * 100 / tot.toDouble * 1e6))
    }.toSet
    val got = graft.queries.Round9.q287(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // The stratification must bind: all three classes populated, and
    // class A holds ~80% of mass with a MINORITY of parts.
    assert(got.map(_._1) == Set("A", "B", "C"))
    val a = got.find(_._1 == "A").get
    val nAll = got.toSeq.map(_._2).sum
    assert(a._2 < nAll && a._4 >= 800000L)
  }

  // --------------------------------------------------------------- q288

  test("q288 ship lag: integer-day replay + priority frame complete") {
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority", $"o_orderdate").collect()
      .map(r => (r.getLong(0),
        (r.getString(1), r.getAs[java.time.LocalDateTime](2)))).toMap
    val us = (t: java.time.LocalDateTime) =>
      t.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L +
        t.getNano / 1000L
    val lags = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey", $"l_shipdate").collect()
      .map { r =>
        val (pri, od) = orders(r.getLong(0))
        val ship = r.getAs[java.time.LocalDateTime](1)
        (pri, Math.floorDiv(us(ship) - us(od), 86400000000L))
      }
    def pctl(xs: Seq[Long], p: Double): Double = {
      val s = xs.sorted
      val pos = p * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo).toDouble
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val expected = lags.groupBy(_._1).map { case (pri, xs) =>
      val v = xs.map(_._2).toSeq
      (pri, v.size.toLong, v.min, v.max,
        halfUp(pctl(v, 0.5) * 100), halfUp(pctl(v, 0.9) * 100),
        halfUp(v.sum.toDouble / v.size * 1e4))
    }.toSet
    val got = graft.queries.Round9.q288(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
    // The distribution must bind: every priority present, p90 ≥ p50,
    // and a real spread. (The synthetic generator draws ship and
    // order dates independently, so NEGATIVE lags exist — the floor
    // division handles the sign identically on both engines, which is
    // exactly what this replay certifies.)
    assert(got.size == 5)
    assert(got.forall(g => g._6 >= g._5 && g._4 > g._3))
    assert(got.exists(_._3 < 0), "no negative lag — sign path untested")
  }

  // --------------------------------------------------------------- q289

  test("q289 CDC chunks: exact boundary/first-wins replay + dedup binds") {
    val md = java.security.MessageDigest.getInstance("MD5")
    def md5hex(s: String): String =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", $"text").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    // Per doc: boundary at p (1-based) when the 8-char window ending
    // at p hashes into the '0' nibble; chunk_idx = cumsum(boundary).
    val chunks = docs.flatMap { case (src, id, text) =>
      var idx = 0L
      val sb = new scala.collection.mutable.ArrayBuffer[(String, Long, Long, String)]()
      var cur = new StringBuilder
      var curIdx = 0L
      for (p <- 1 to text.length) {
        val bnd = p >= 8 && md5hex(text.substring(p - 8, p)).charAt(0) == '0'
        if (bnd) idx += 1
        if (idx != curIdx) {
          if (cur.nonEmpty) sb += ((src, id, curIdx, cur.toString))
          cur = new StringBuilder; curIdx = idx
        }
        cur.append(text.charAt(p - 1))
      }
      if (cur.nonEmpty) sb += ((src, id, curIdx, cur.toString))
      sb
    }
    // First-wins rank per chunk hash under (doc_id, chunk_idx).
    val ranked = chunks.groupBy(c => md5hex(c._4)).toSeq.flatMap {
      case (_, xs) =>
        xs.sortBy(c => (c._2, c._3)).zipWithIndex.map { case (c, i) =>
          (c._1, c._4.length.toLong, i + 1)
        }
    }
    val expected = ranked.groupBy(_._1).map { case (src, xs) =>
      val bytes = xs.map(_._2).sum
      val saved = xs.filter(_._3 > 1).map(_._2).sum
      (src, xs.size.toLong, bytes, xs.count(_._3 > 1).toLong, saved,
        halfUp(saved.toDouble / bytes * 1e6))
    }.toSet
    val got = graft.ext.Multimodal.q289(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // CDC must bind: boundaries fire (mean chunk well under doc size),
    // and the 31-word vocabulary makes real cross-doc chunk dedup.
    val totChunks = got.toSeq.map(_._2).sum
    val totBytes = got.toSeq.map(_._3).sum
    assert(totBytes / totChunks < 40, "chunks too large — boundary dead")
    assert(totBytes / totChunks > 4, "chunks degenerate — boundary fires everywhere")
    assert(got.exists(_._4 > 0), "no duplicate chunks — census vacuous")
  }

  // --------------------------------------------------------------- q292

  test("q292 pct-of-parent: exact cents tree replay + shares close") {
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_nationkey", $"n_name", $"n_regionkey").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        (r.getString(1), r.getAs[Number](2).longValue()))).toMap
    val region = spark.read.parquet(s"$sf/region.parquet")
      .select($"r_regionkey", $"r_name").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toMap
    val cust = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_nationkey").collect()
      .map(r => (r.getAs[Number](0).longValue(),
        r.getAs[Number](1).longValue())).toMap
    val natCents = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_totalprice").collect()
      .map { r =>
        val (nName, rKey) = nation(cust(r.getAs[Number](0).longValue()))
        ((region(rKey), nName),
          BigDecimal(r.getDouble(1))
            .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact)
      }
      .groupBy(_._1).map { case (k, xs) => (k, xs.map(x => BigInt(x._2)).sum) }
    val regCents = natCents.groupBy(_._1._1).map { case (rn, xs) =>
      rn -> xs.values.sum
    }
    val gc = regCents.values.sum
    val expected = natCents.map { case ((rn, nn), nc) =>
      val rc = regCents(rn)
      (rn, nn, nc.toLong, rc.toLong,
        halfUp(nc.toDouble / rc.toDouble * 1e6),
        halfUp(rc.toDouble / gc.toDouble * 1e6))
    }.toSet
    val got = graft.queries.Round9.q292(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    // The tree must close: each region's nation shares sum to ~1e6
    // (apportionment rounding only), region shares likewise.
    got.groupBy(_._1).foreach { case (_, xs) =>
      val s0 = xs.toSeq.map(_._5).sum
      assert(math.abs(s0 - 1000000L) <= xs.size, s"region tree open: $s0")
    }
    val rs = got.groupBy(_._1).map { case (_, xs) => xs.head._6 }.sum
    assert(math.abs(rs - 1000000L) <= got.groupBy(_._1).size)
  }

  // --------------------------------------------------------------- q293

  test("q293 entry conversion: exact session replay + funnel binds") {
    val gapNs = 12L * 3600 * 1000 * 1000 * 1000
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"event_id", $"ts", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val sessions = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s0 = xs.sortBy(x => (x._3, x._2))
      var sess = 0L
      var prev = Long.MinValue
      s0.map { x =>
        if (prev == Long.MinValue || x._3 - prev > gapNs) sess += 1
        prev = x._3
        (sess, x._4)
      }.groupBy(_._1).toSeq.map { case (_, ys) =>
        (ys.head._2, if (ys.exists(_._2 == "purchase")) 1L else 0L,
          ys.size.toLong)
      }
    }
    val expected = sessions.groupBy(_._1).map { case (t, xs) =>
      (t, xs.size.toLong, xs.map(_._2).sum, xs.map(_._3).sum,
        halfUp(xs.map(_._2).sum.toDouble / xs.size * 1e6))
    }.toSet
    val got = graft.ext.Patterns.q293(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // The signal must bind: several entry types, conversion strictly
    // between 0 and 1 somewhere, purchase-entry sessions convert at 1.
    assert(got.size > 1)
    assert(got.find(_._1 == "purchase").get._5 == 1000000L)
    assert(got.exists(g => g._5 > 0 && g._5 < 1000000L))
  }

  // --------------------------------------------------------------- q294

  test("q294 lognormal fit: per-row gridded moment replay + tail binds") {
    val custSeg = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_mktsegment").collect()
      .map(r => (r.getAs[Number](0).longValue(), r.getString(1))).toMap
    var minMargin = Double.MaxValue
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_totalprice").collect()
      .map { r =>
        val cents = BigDecimal(r.getDouble(1))
          .setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
        val lx = math.log(cents.toDouble)
        Seq(lx * 1e9, lx * lx * 1e9).foreach(v =>
          minMargin = math.min(minMargin, boundaryMargin(v)))
        (custSeg(r.getAs[Number](0).longValue()),
          halfUp(lx * 1e9), halfUp(lx * lx * 1e9))
      }
    val expected = rows.groupBy(_._1).map { case (seg, xs) =>
      val n = xs.length.toDouble
      val m = xs.map(_._2).sum.toDouble / 1e9 / n
      val m2 = xs.map(_._3).sum.toDouble / 1e9 / n
      (seg, xs.length.toLong, halfUp(m * 1e6),
        halfUp(math.sqrt(m2 - m * m) * 1e6))
    }.toSet
    val got = graft.queries.Round9.q294(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e9 term margin razor-thin: $minMargin")
    // The fit must bind: a real spread (sigma > 0) and mu in the
    // plausible ln(cents) range for 4-6 digit dollar orders.
    assert(got.forall(g => g._4 > 0 && g._3 > halfUp(math.log(1e4) * 1e6)))
  }

  // --------------------------------------------------------------- q295

  test("q295 source diversity: exact inverse-Simpson replay + binds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"lang", $"source").collect()
      .map(r => (r.getString(0), r.getString(1)))
    var minMargin = Double.MaxValue
    val expected = docs.groupBy(_._1).map { case (lang, xs) =>
      val ns = xs.groupBy(_._2).map { case (_, ys) => BigInt(ys.length) }
      val n = ns.sum
      val eff = (n * n).toDouble / ns.map(x => x * x).sum.toDouble
      minMargin = math.min(minMargin, boundaryMargin(eff * 1e4))
      (lang, n.toLong, ns.size.toLong, halfUp(eff * 1e4))
    }.toSet
    val got = graft.ext.Curation.q295(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e4 margin razor-thin: $minMargin")
    // Diversity must bind: effective count strictly between 1 and the
    // nominal source count (real imbalance, no monoculture).
    got.foreach { g =>
      assert(g._4 > 10000L && g._4 < g._3 * 10000L, s"degenerate: $g")
    }
  }

  // --------------------------------------------------------------- q290

  test("q290 Good-Turing: exact freq-of-freq replay + smoothing binds") {
    val tris = spark.read.parquet(s"$sf/documents.parquet")
      .select($"text").collect()
      .flatMap { r =>
        val ws = r.getString(0).split(" ", -1)
        if (ws.length < 3) Seq.empty
        else ws.sliding(3).map(_.mkString(" ")).toSeq
      }
    val counts = tris.groupBy(identity).map { case (_, xs) => xs.length.toLong }
    val fof = counts.groupBy(identity).map { case (r, xs) =>
      (r, xs.size.toLong)
    }
    val nTotal = fof.toSeq.map { case (r, nr) => BigInt(r) * nr }.sum.toLong
    val n1 = fof.getOrElse(1L, 0L)
    var minMargin = Double.MaxValue
    val expected = fof.toSeq.filter(_._1 <= 5).map { case (r, nr) =>
      val nn = fof.getOrElse(r + 1, 0L)
      val rstar = (r + 1).toDouble * nn.toDouble / nr.toDouble
      minMargin = math.min(minMargin, boundaryMargin(rstar * 1e6))
      (r, nr, nn, halfUp(rstar * 1e6), nTotal,
        halfUp(n1.toDouble / nTotal * 1e9))
    }.toSet
    val got = graft.ext.TextAnalysis.q290(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e6 r* margin razor-thin: $minMargin")
    // GT must bind: a real singleton mass (P0 > 0), and the adjusted
    // counts DISCOUNT low frequencies (r* < r for r = 1).
    assert(n1 > 0)
    val r1 = got.find(_._1 == 1L).get
    assert(r1._4 < 1000000L, "r*=1 not discounted — smoothing vacuous")
    assert(got.size == 5)
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
