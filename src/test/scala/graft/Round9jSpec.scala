package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

/** Round-9 tenth batch: brand-partition modularity/conductance on the
  * part co-order graph (q305), tokenizer fertility (q307), TextRank
  * keywords (q308). Driver-side exact replays on sf0.001, plus the
  * float-summation margin pins q308 needs at BOTH gate SFs.
  */
class Round9jSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  // --------------------------------------------------------------- q305

  test("q305 brand modularity: exact integer replay; contributions sum to a valid Q") {
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val brand = Tables.table(spark, sf, "part")
      .select($"p_partkey", $"p_brand").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val edges = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).toSeq
      for (p <- ps; q <- ps if p < q) yield (p, q)
    }.toSet
    val m = edges.size.toLong
    val deg = edges.toSeq.flatMap(e => Seq(e._1, e._2))
      .groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val byBrand = deg.keys.groupBy(brand)
    val expected = byBrand.map { case (br, nodes) =>
      val ns = nodes.toSet
      val vol = nodes.toSeq.map(deg).sum
      val win = edges.count(e => ns(e._1) && ns(e._2)).toLong
      val cut = edges.count(e => ns(e._1) ^ ns(e._2)).toLong
      val volD = vol.toDouble / (2 * m).toDouble
      val mn = math.min(vol, 2 * m - vol)
      (br, nodes.size.toLong, win, cut,
        halfUp((win.toDouble / m.toDouble - volD * volD) * 1e6),
        if (mn > 0) Some(halfUp(cut.toDouble / mn.toDouble * 1e6)) else None)
    }.toSet
    val got = graft.ext.Graph.q305(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), if (r.isNullAt(5)) None else Some(r.getLong(5)))).toSet
    assert(got == expected)
    // Global modularity from the contributions must land in the
    // theoretical [-0.5, 1] band, and volumes must account for every
    // edge endpoint (2m).
    val q = expected.toSeq.map(_._5).sum / 1e6
    assert(q >= -0.5 && q <= 1.0, s"modularity out of band: $q")
    assert(expected.toSeq.map(x => 2 * x._3 + x._4).sum == 2 * m)
  }

  // --------------------------------------------------------------- q307

  test("q307 fertility: exact piece-count replay; punct pieces bind") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"lang", $"source", $"text", $"n_chars").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3)))
    val re = "[a-z0-9]+".r
    val expected = docs.groupBy(d => (d._1, d._2)).map { case ((l, s), xs) =>
      val nw = xs.map(_._3.split(" ", -1).length.toLong).sum
      val np = xs.map(d => re.findAllIn(d._3).size.toLong +
        d._3.count(c => !(c == ' ' || (c >= 'a' && c <= 'z') ||
          (c >= '0' && c <= '9'))).toLong).sum
      val nc = xs.map(_._4).sum
      (l, s, xs.length.toLong, nw, np,
        halfUp(np.toDouble / nw.toDouble * 1e4),
        halfUp(nc.toDouble / np.toDouble * 1e4))
    }.toSet
    val got = graft.ext.TextAnalysis.q307(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSet
    assert(got == expected)
  }

  // --------------------------------------------------------------- q308

  /** Driver TextRank replay: returns every word's final score. */
  private def textrankScores(sfDir: String): Map[String, Double] = {
    val texts = Tables.table(spark, sfDir, "documents")
      .select($"text").collect().map(_.getString(0))
    val pairCounts = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val ws = t.split(" ", -1)
      var i = 0
      while (i < ws.length - 1) {
        val (a, b) =
          if (ws(i) <= ws(i + 1)) (ws(i), ws(i + 1)) else (ws(i + 1), ws(i))
        if (a != b) pairCounts((a, b)) = pairCounts.getOrElse((a, b), 0L) + 1
        i += 1
      }
    }
    val e = pairCounts.filter(_._2 >= 2).toSeq
    val sym = e.flatMap { case ((a, b), w) => Seq((a, b, w), (b, a, w)) }
    val wdeg = sym.groupBy(_._1).map { case (u, xs) => u -> xs.map(_._3).sum }
    var sc: Map[String, Double] = wdeg.map { case (u, _) => u -> 1.0 }
    (1 to 3).foreach { _ =>
      sc = sym.groupBy(_._2).map { case (v, ins) =>
        v -> (0.15 + 0.85 * ins.map { case (u, _, w) =>
          w.toDouble / wdeg(u).toDouble * sc(u)
        }.sum)
      }
    }
    sc
  }

  test("q308 textrank: replay matches; frequency rank differs somewhere") {
    val scores = textrankScores(sf)
    val expected = scores.toSeq
      .map { case (w, s) => (w, halfUp(s * 1e6)) }
      .sortBy { case (w, s) => (-s, w) }.take(30)
    val got = graft.ext.TextAnalysis.q308(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == expected)
    // Centrality must not degenerate into raw frequency: the top-30
    // ORDERING by TextRank and by unigram count differ somewhere (the
    // tiny-vocab fixture makes the memberships coincide, but the
    // rankings must not).
    val freq = Tables.table(spark, sf, "documents")
      .select(explode(split($"text", " ")).as("w"))
      .groupBy($"w").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"w").limit(30)
      .collect().map(_.getString(0)).toSeq
    assert(expected.map(_._1) != freq)
  }

  test("q308 textrank: e6 rounding-boundary margin dwarfs summation drift at both gate SFs") {
    Seq(sf, "/root/testdata/sf0.01").foreach { d =>
      val scores = textrankScores(d).values
      val margins = scores.map(s => math.abs((s * 1e6) % 1 - 0.5))
      assert(margins.min > 1e-4,
        s"$d: boundary margin collapsed: ${margins.min}")
    }
  }
}
