package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 sixth batch: audience-overlap Jaccard matrix (q279), Hill
  * tail-index over document lengths (q280), source-pair lexical cosine
  * (q281). Driver-side exact replays on sf0.001 plus rounding-boundary
  * margins for every gridded double.
  */
class Round9fSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  // --------------------------------------------------------------- q279

  test("q279 audience overlap: exact set replay + overlap binds") {
    val ut = Tables.events(spark, sf)
      .select($"user_id", $"event_type").distinct().collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val byType = ut.groupBy(_._2).map { case (t, xs) =>
      t -> xs.map(_._1).toSet
    }
    val types = byType.keys.toSeq.sorted
    var minMargin = Double.MaxValue
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield {
      val (a, b) = (types(i), types(j))
      val (sa, sb) = (byType(a), byType(b))
      val both = sa.intersect(sb).size.toLong
      val jac = both.toDouble / (sa.size + sb.size - both).toDouble
      minMargin = math.min(minMargin, boundaryMargin(jac * 1e6))
      (a, b, sa.size.toLong, sb.size.toLong, both, halfUp(jac * 1e6))
    }).toSet
    val got = graft.ext.Patterns.q279(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 margin razor-thin: $minMargin")
    // All C(types,2) pairs present with real overlap (at this tiny SF
    // the user population is dense enough that sets may coincide —
    // jaccard = 1e6 is legitimate there; sf0.01's oracle run shows the
    // spread).
    assert(got.size == types.length * (types.length - 1) / 2)
    assert(got.forall(_._5 > 0))
  }

  // --------------------------------------------------------------- q280

  test("q280 Hill tail: exact order-statistic replay + e9 margins") {
    val lens = spark.read.parquet(s"$sf/documents.parquet")
      .select($"n_chars", $"doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val top = lens.sortBy { case (c, id) => (-c, id) }.take(51)
    val xk1 = top.last._1
    var minMargin = Double.MaxValue
    val terms = top.take(50).map { case (c, _) =>
      val t = math.log(c.toDouble / xk1.toDouble) * 1e9
      minMargin = math.min(minMargin, boundaryMargin(t))
      halfUp(t)
    }
    val sumE9 = terms.sum
    val mean = sumE9.toDouble / 1e9 / 50.0
    val r = graft.ext.Robust.q280(spark, sf).head()
    assert(r.getLong(0) == 50L)
    assert(r.getLong(1) == xk1)
    assert(r.getLong(2) == sumE9)
    assert(r.getLong(3) == halfUp(mean * 1e6))
    assert(minMargin > 1e-3, s"e9 term margin razor-thin: $minMargin")
    // The tail must bind: the largest doc strictly exceeds the
    // threshold, so the mean log excess is positive.
    assert(r.getLong(2) > 0L)
  }

  // --------------------------------------------------------------- q282

  test("q282 journey end: exact last-event replay + funnel binds") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val perUser = ev.groupBy(_._1).toSeq.map { case (_, xs) =>
      val last = xs.maxBy(x => (x._2, x._3))._4
      (last, xs.length.toLong)
    }
    val nTotal = perUser.size.toLong
    val expected = perUser.groupBy(_._1).map { case (t, xs) =>
      val nu = xs.length.toLong
      val ne = xs.map(_._2).sum
      (t, nu, ne, halfUp(nu.toDouble / nTotal * 1e6),
        halfUp(ne.toDouble / nu * 1e4))
    }.toSet
    val got = graft.ext.Patterns.q282(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    // The distribution must spread over more than one ending type and
    // cover every user exactly once.
    assert(got.size > 1)
    assert(got.toSeq.map(_._2).sum == nTotal)
  }

  // --------------------------------------------------------------- q283

  test("q283 entropy rate: per-cell gridded replay + structure binds") {
    val ev = Tables.events(spark, sf)
      .select($"user_id", $"ts", $"event_id", $"event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).toSeq.flatMap { case (_, xs) =>
      val s = xs.sortBy(x => (x._2, x._3)).map(_._4)
      s.zip(s.drop(1))
    }
    val cells = trans.groupBy(identity).map { case ((a, b), xs) =>
      ((a, b), xs.size.toLong)
    }
    val n0 = cells.groupBy(_._1._1).map { case (a, xs) =>
      a -> xs.values.sum
    }
    val nn = cells.values.sum
    var minMargin = Double.MaxValue
    val expected = cells.groupBy(_._1._1).map { case (a, xs) =>
      val terms = xs.toSeq.map { case ((_, _), n) =>
        val p = n.toDouble / n0(a).toDouble
        val h = -p * math.log(p) * 1e9
        val rt = -(n.toDouble / nn.toDouble) * math.log(p) * 1e9
        minMargin = math.min(minMargin,
          math.min(boundaryMargin(h), boundaryMargin(rt)))
        (halfUp(h), halfUp(rt))
      }
      (a, n0(a), xs.size.toLong, terms.map(_._1).sum, terms.map(_._2).sum)
    }.toSet
    val got = graft.ext.Patterns.q283(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(minMargin > 1e-4, s"e9 term margin razor-thin: $minMargin")
    // Entropy must bind: every state has multiple next types (h > 0),
    // and the rate parts sum below ln(types) (uniform upper bound).
    assert(got.forall(_._4 > 0))
    val rate = got.toSeq.map(_._5).sum
    assert(rate > 0 && rate < halfUp(math.log(got.size.toDouble) * 1e9))
  }

  // --------------------------------------------------------------- q291

  test("q291 ingest drift: BigInt ECDF replay + null-calibrated KS") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    var minMargin = Double.MaxValue
    val expected = docs.groupBy(_._1).map { case (src, xs) =>
      val ordered = xs.sortBy(_._2)
      val ns = ordered.length
      val cut = (ns + 1) / 2
      val early = ordered.take(cut).map(_._3)
      val late = ordered.drop(cut).map(_._3)
      val (ne, nl) = (BigInt(early.length), BigInt(late.length))
      val grid = (early ++ late).distinct.sorted
      var best = BigInt(-1); var xAt = Long.MaxValue
      grid.foreach { x =>
        val ce = BigInt(early.count(_ <= x))
        val cl = BigInt(late.count(_ <= x))
        val num = (ce * nl - cl * ne).abs
        if (num > best) { best = num; xAt = x }
        else if (num == best && x < xAt) () // first hit already minimal
      }
      val ks = best.toDouble / (ne.toDouble * nl.toDouble)
      minMargin = math.min(minMargin, boundaryMargin(ks * 1e6))
      (src, ne.toLong, nl.toLong, xAt, halfUp(ks * 1e6))
    }.toSet
    val got = graft.ext.Ranking.q291(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 KS margin razor-thin: $minMargin")
    // Null calibration: halves are drawn from one distribution, so D
    // stays well under the strong-drift regime — but never zero.
    assert(got.forall(g => g._5 > 0 && g._5 < 800000L))
  }

  // --------------------------------------------------------------- q281

  test("q281 source cosine: BigInt dot/norm replay + e6 margins") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val tf = toks.groupBy(identity).map { case ((s0, w), xs) =>
      ((s0, w), BigInt(xs.length))
    }
    val bySource = tf.groupBy(_._1._1).map { case (s0, xs) =>
      s0 -> xs.map { case ((_, w), c) => (w, c) }.toMap
    }
    val norms = bySource.map { case (s0, m) =>
      s0 -> m.values.map(c => c * c).sum
    }
    val sources = bySource.keys.toSeq.sorted
    var minMargin = Double.MaxValue
    val expected = (for {
      i <- sources.indices; j <- (i + 1) until sources.length
    } yield {
      val (a, b) = (sources(i), sources(j))
      val num = bySource(a).map { case (w, c) =>
        c * bySource(b).getOrElse(w, BigInt(0))
      }.sum
      val cos = num.toDouble /
        math.sqrt(norms(a).toDouble * norms(b).toDouble)
      minMargin = math.min(minMargin, boundaryMargin(cos * 1e6))
      (a, b, halfUp(cos * 1e6))
    }).toSet
    val got = graft.ext.TextAnalysis.q281(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(minMargin > 1e-6, s"e6 cosine margin razor-thin: $minMargin")
    // Similarity must spread: not all pairs identical, none orthogonal
    // (the shared 31-word vocabulary guarantees positive mass).
    assert(got.toSeq.map(_._3).distinct.size > 1)
    assert(got.forall(g => g._3 > 0 && g._3 < 1000000L))
  }
}
