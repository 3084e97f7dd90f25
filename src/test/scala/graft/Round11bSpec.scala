package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Exact driver-side replays for q353 (Matryoshka truncation recall),
  * q354 (kNN hubness census) and q355 (opt-out similarity closure) —
  * the certification leg the r10 advisor flagged as missing for the
  * three queries that landed without spec coverage. Same discipline as
  * Round11Spec: bit-mirrored double chains (left-to-right accumulation
  * matching ops.DotProduct), BigInt moments, rounding-boundary margins.
  */
class Round11bSpec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  /** Unit vectors exactly as Similarity.withUnitVec builds them:
    * float→double widening first, then u_i = d_i / sqrt(Σ d_i²) with
    * the norm accumulated left-to-right (ops.DotProduct's loop).
    */
  private def unitVecs(): Map[Long, Array[Double]] =
    spark.read.parquet(s"$sf1/embeddings.parquet")
      .select($"vec_id", $"embedding").collect().map { r =>
        val d = r.getSeq[Float](1).map(_.toDouble).toArray
        var acc = 0.0
        var i = 0
        while (i < d.length) { acc += d(i) * d(i); i += 1 }
        val nrm = math.sqrt(acc)
        r.getLong(0) -> d.map(_ / nrm)
      }.toMap

  private def dotLR(a: Array[Double], b: Array[Double]): Double = {
    val n = math.min(a.length, b.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a(i) * b(i); i += 1 }
    acc
  }

  /** Top-10 dids for one query over scored candidates, (sim DESC, did)
    * tie-break — both engines' ROW_NUMBER contract.
    */
  private def top10(scored: Seq[(Long, Double)]): Set[Long] =
    scored.sortWith { case ((d1, s1), (d2, s2)) =>
      s1 > s2 || (s1 == s2 && d1 < d2)
    }.take(10).map(_._1).toSet

  test("q353 Matryoshka recall: exact replay at 8/16/32 dims; " +
    "self-inclusion floor; recall grid is exact") {
    val u = unitVecs()
    val ids = u.keys.toSeq.sorted
    val probes = ids.filter(_ < 50)
    // full-64-dim ground truth, self-matches INCLUDED (the documented
    // q353 convention)
    val exact = probes.map { q =>
      q -> top10(ids.map(d => d -> dotLR(u(q), u(d))))
    }.toMap
    // truncated rankings: slice the UNIT vector, re-normalize
    val expected = for {
      m <- Seq(8, 16, 32)
      q <- probes
    } yield {
      val sl = ids.map { d =>
        val s = u(d).take(m)
        d -> (s, math.sqrt(dotLR(s, s)))
      }.toMap
      val approx = top10(ids.map { d =>
        val (qs, qn) = sl(q)
        val (ds, dn) = sl(d)
        d -> dotLR(qs, ds) / (qn * dn)
      })
      val hits = (exact(q) & approx).size.toLong
      (m.toLong, q, hits, hits * 1000L) // hits/10*1e4 is exact
    }
    val got = graft.ext.Similarity.queries("q353_matryoshka_recall")(
      spark, sf1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(got == expected.toSeq)
    // the self-inclusion floor: every (m, qid) retains its own query
    assert(expected.forall(_._3 >= 1L))
    // the curve genuinely moves: mean recall at 32 dims beats 8 dims
    val mean = expected.groupBy(_._1).view
      .mapValues(xs => xs.map(_._3).sum.toDouble / xs.size).toMap
    assert(mean(32L) > mean(8L),
      s"truncation curve is flat: $mean")
  }

  test("q354 hubness: exact in-degree + moment replay under the fixed " +
    "200-probe budget; margin") {
    val u = unitVecs()
    val ids = u.keys.toSeq.sorted
    val probes = ids.filter(_ < 200)
    assert(probes.size == 200, s"probe budget must be 200: ${probes.size}")
    val indeg = scala.collection.mutable.Map(ids.map(_ -> 0L): _*)
    probes.foreach { q =>
      top10(ids.filter(_ != q).map(d => d -> dotLR(u(q), u(d))))
        .foreach(d => indeg(d) += 1L)
    }
    val n = BigInt(ids.size)
    val sd = indeg.values.map(BigInt(_)).sum
    val devs = ids.map(d => n * indeg(d) - sd)
    val m2 = devs.map(v => v * v).sum
    val m3 = devs.map(v => v * v * v).sum
    val skew = m3.toDouble * math.sqrt(n.toDouble) /
      (m2.toDouble * math.sqrt(m2.toDouble)) * 1e6
    val got = graft.ext.Similarity.queries("q354_hubness")(spark, sf1)
      .collect()(0)
    assert((got.getLong(0), got.getLong(1), got.getLong(2),
      got.getLong(3), got.getLong(4)) ==
      (ids.size.toLong, 200L, indeg.values.max,
        indeg.values.count(_ == 0L).toLong, halfUp(skew)))
    assert(boundaryMargin(skew) > 1e-6, s"skew margin: $skew")
    // the census is non-degenerate: hubs exist (max > k·probes/n floor
    // would be zero only if retrieval were uniform AND sparse)
    assert(indeg.values.max > 0L)
  }

  test("q355 opt-out closure: exact census replay off the certified " +
    "q102 component labels; drag is non-vacuous") {
    val labels = graft.ext.Components.queries("q102_neardup_components")(
      spark, sf1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val src = spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"source").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
      .filter { case (id, _) => id < 1000 } // the probe-set contract
    assert(labels.keySet == src.keySet,
      "q102 labels must cover exactly the doc_id < 1000 probe set")
    val banned = Set("src5", "src13")
    val compFlag = labels.groupBy(_._2).view.mapValues(_.keys.exists(
      id => banned(src(id)))).toMap
    val expected = src.groupBy(_._2).view.mapValues { docs =>
      val nDocs = docs.size.toLong
      val direct = docs.keys.count(id => banned(src(id))).toLong
      val dragged = docs.keys.count(id =>
        !banned(src(id)) && compFlag(labels(id))).toLong
      val share = (direct + dragged).toDouble / nDocs.toDouble * 1e6
      (nDocs, direct, dragged, halfUp(share), boundaryMargin(share))
    }.toMap
    val got = graft.ext.Components.queries("q355_optout_closure")(
      spark, sf1).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got == expected.view.mapValues(e =>
      (e._1, e._2, e._3, e._4)).toMap)
    expected.values.foreach { e =>
      assert(e._5 > 1e-6 || e._4 % 1000000L == 0L,
        s"drop-share margin razor-thin: $e")
    }
    // non-vacuous: the banned sources opt out entirely, and the
    // closure DRAGS at least one doc from an unbanned source
    assert(expected.filterKeys(banned).values.forall(e => e._2 == e._1))
    assert(expected.filterNot { case (k, _) => banned(k) }
      .values.map(_._3).sum > 0L, "no dragged docs — closure vacuous")
  }
}
