package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-9 twelfth batch: label-propagation communities (q310),
  * k-center coreset (q311), embedding participation ratio (q312).
  * Driver-side exact replays on sf0.001 — q310/q311 are all-integer
  * (no float at all); q312's only double is the final mirrored PR
  * division.
  */
class Round9lSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  // --------------------------------------------------------------- q310

  test("q310 LPA: exact 4-round replay; output is a partition of the support-2 graph") {
    val li = Tables.table(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_partkey").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // NB: keySet, not .collect{... => e} — collect on a Map whose
    // function returns tuples rebuilds a MAP keyed by the tuple's
    // first element and silently collapses pairs sharing a part id.
    val support = li.groupBy(_._1).values.flatMap { xs =>
      val ps = xs.map(_._2).toSeq
      for (p <- ps; q <- ps if p < q) yield (p, q)
    }.groupBy(identity(_)).filter(_._2.size >= 2).keySet
    val sym = support.toSeq.flatMap(e => Seq((e._1, e._2), (e._2, e._1)))
    val byDst = sym.groupBy(_._2)
    val nodes = byDst.keySet
    var lab: Map[Long, Long] = nodes.map(id => id -> id).toMap
    (1 to 4).foreach { _ =>
      val prev = lab
      lab = byDst.map { case (v, ins) =>
        val counts = ins.map(x => prev(x._1)).groupBy(identity(_))
          .map { case (l, xs) => (l, xs.size) }
        v -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val expected = lab.values.groupBy(identity(_))
      .map { case (c, xs) => (c, xs.size.toLong) }.toSet
    val got = graft.ext.Graph.q310(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected)
    // The labeling is a partition of every support-2 node with real
    // adoption (some label spans multiple nodes). At this tiny SF the
    // 200-node support graph is one dense blob and 4 rounds legally
    // collapse it to a single community (both engines agree; the
    // sf0.01 gate shows the 349-community structure) — so community
    // COUNT is not asserted here.
    assert(expected.toSeq.map(_._2).sum == nodes.size.toLong)
    assert(expected.exists(_._2 > 1))
  }

  // --------------------------------------------------------------- q311

  test("q311 k-center: exact farthest-point replay; radius non-increasing, centers distinct") {
    val vecs = Tables.table(spark, sf, "embeddings")
      .select($"vec_id", $"embedding").collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).toArray.map(x => halfUp(x.toDouble * 1000))))
      .sortBy(_._1)
    def d2(a: Array[Long], b: Array[Long]): Long =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    var md = vecs.map(v => (v._1, Long.MaxValue)).toMap
    var center = vecs.head
    val expected = (0 until 8).map { r =>
      md = vecs.map(v => (v._1,
        math.min(md(v._1), d2(v._2, center._2)))).toMap
      val radius = md.values.max
      val row = (r.toLong, center._1, radius)
      val next = vecs.map(v => (v._1, md(v._1)))
        .sortBy { case (id, d) => (-d, id) }.head._1
      center = vecs.find(_._1 == next).get
      row
    }
    val got = graft.ext.Similarity.q311(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expected)
    // Gonzalez invariants: radius non-increasing; 8 distinct centers.
    val radii = expected.map(_._3)
    assert(radii.zip(radii.tail).forall { case (a, b) => b <= a })
    assert(expected.map(_._2).distinct.size == 8)
  }

  // --------------------------------------------------------------- q312

  test("q312 participation ratio: exact moment replay; 1 <= PR <= d") {
    val vecs = Tables.table(spark, sf, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => halfUp(x.toDouble * 1000)))
    val d = vecs.head.length
    val n = vecs.length.toLong
    val si = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val cells = Array.tabulate(d, d)((i, j) => BigInt(halfUp(
      (n.toDouble * vecs.map(v => BigInt(v(i)) * v(j)).sum.toDouble -
        si(i).toDouble * si(j).toDouble) / (n.toDouble * n.toDouble) * 1e6)))
    val tr = (0 until d).map(i => cells(i)(i)).sum
    val frob2 = (for (i <- 0 until d; j <- 0 until d)
      yield cells(i)(j) * cells(i)(j)).sum
    val pr = halfUp((tr * tr).toDouble / frob2.toDouble * 1e4)
    val got = graft.ext.Similarity.q312(spark, sf).collect().head
    assert((got.getLong(0), got.getLong(1), got.getLong(2)) ==
      (d.toLong, tr.toLong, pr))
    assert(pr >= 10000L && pr <= d * 10000L, s"PR out of band: $pr")
  }
}
