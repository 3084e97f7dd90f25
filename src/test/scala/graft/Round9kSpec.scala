package graft

import java.math.{BigDecimal => JBig, RoundingMode}
import java.security.MessageDigest

/** Round-9 eleventh batch: perceptual-hash near-dup census (q306) and
  * power-iteration PCA (q309). Driver-side exact replays on sf0.001 —
  * both queries are integer-exact end to end (q306 has NO float at
  * all; q309's only double is the final mirrored Rayleigh division),
  * so the replays assert strict equality with no margin machinery.
  */
class Round9kSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  // --------------------------------------------------------------- q306

  test("q306 ahash: exact digest-chain replay; pigeonhole completeness holds") {
    val docs = Tables.table(spark, sf, "documents")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val bits = docs.map { case (id, text) =>
      val hx = md5hex(text) + md5hex(md5hex(text))
      val nibs = hx.map(c => Integer.parseInt(c.toString, 16).toLong)
      val tot = nibs.sum
      id -> nibs.map(v => if (v * 64 > tot) 1 else 0).toVector
    }.toMap
    val byBand = docs.flatMap { case (id, _) =>
      (0 until 4).map(j => ((j, bits(id).slice(j * 16, j * 16 + 16)), id))
    }.groupBy(_._1)
    val cand = byBand.values.flatMap { xs =>
      val ids = xs.map(_._2).toSeq.sorted
      for (a <- ids; b <- ids if a < b) yield (a, b)
    }.toSet
    val expected = cand.toSeq
      .map { case (a, b) =>
        bits(a).zip(bits(b)).count { case (x, y) => x != y }.toLong
      }
      .groupBy(identity(_))
      .map { case (h, xs) => (h, xs.size.toLong, h <= 3) }.toSet
    val got = graft.ext.Multimodal.q306(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSet
    assert(got == expected)
    // Pigeonhole: any pair within Hamming 3 of each other MUST be a
    // candidate (4 bands, ≤3 flipped bits → some band untouched).
    val ids = docs.map(_._1)
    for (a <- ids; b <- ids if a < b) {
      val h = bits(a).zip(bits(b)).count { case (x, y) => x != y }
      if (h <= 3) assert(cand((a, b)), s"missed near-dup pair ($a,$b) at $h")
    }
  }

  // --------------------------------------------------------------- q309

  test("q309 pca power: exact BigInt replay; dominant loading saturates the e6 grid") {
    val vecs = Tables.table(spark, sf, "embeddings")
      .select($"embedding").collect()
      .map(_.getSeq[Float](0).toArray.map(x => halfUp(x.toDouble * 1000)))
    val d = vecs.head.length
    val n = vecs.length.toLong
    // Exact integer covariance cells on the e6 grid (full d×d).
    val si = Array.tabulate(d)(i => vecs.map(v => BigInt(v(i))).sum)
    val sij = Array.tabulate(d, d)((i, j) =>
      vecs.map(v => BigInt(v(i)) * v(j)).sum)
    val cells = Array.tabulate(d, d)((i, j) =>
      BigInt(halfUp((n.toDouble * sij(i)(j).toDouble -
        si(i).toDouble * si(j).toDouble) / (n.toDouble * n.toDouble) * 1e6)))
    var v = Array.fill(d)(BigInt(1000000))
    (1 to 4).foreach { _ =>
      val w = Array.tabulate(d)(i =>
        (0 until d).map(j => cells(i)(j) * v(j)).sum)
      val m = w.map(_.abs).max
      v = w.map(x =>
        if (x >= 0) (2 * x * 1000000 + m) / (2 * m)
        else -((2 * -x * 1000000 + m) / (2 * m)))
    }
    val num = (for (i <- 0 until d; j <- 0 until d)
      yield v(i) * cells(i)(j) * v(j)).sum
    val den = v.map(x => x * x).sum
    val lambda = halfUp(num.toDouble / den.toDouble * 1000)
    val expected = (0 until d)
      .map(i => (i.toLong, v(i).toLong, lambda)).toSet
    val got = graft.ext.Similarity.q309(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expected)
    // The max-norm renormalization must leave exactly one saturated
    // component (|loading| = 1e6), and the Rayleigh estimate must be
    // positive and no larger than the exact trace (Σ λ_k = tr C).
    assert(v.map(_.abs).max == BigInt(1000000))
    val trace = (0 until d).map(i => cells(i)(i)).sum
    assert(lambda > 0 && BigInt(lambda) <= trace.max(BigInt(0)) * 1000 + 1,
      s"lambda $lambda vs trace $trace")
  }
}
