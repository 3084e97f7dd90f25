package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

import graft.ext.{Dedup, Sampling, Similarity}

/** q237 retrieval metrics, q240 winnowing fingerprints, q241 k-fold
  * audit: driver-side replays for the all-integer paths and
  * rounding-boundary margin pins for q237's log2 terms (the only libm
  * op in the batch — CLAUDE.md float discipline).
  */
class RetrievalSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  private def margin(raw: Iterable[Double], scale: Double): Double =
    raw.map { x =>
      val frac = math.abs(x * scale) % 1.0
      math.abs(frac - 0.5)
    }.min

  // ---- q237 ---------------------------------------------------------------

  test("q237 DCG term and IDCG e9 margins are wide") {
    val log2 = (x: Double) => math.log(x) / math.log(2.0)
    val terms = for { gain <- 1 to 3; arn <- 1 to 3 }
      yield gain / log2(arn + 1.0)
    assert(margin(terms.map(_ * 1e9), 1.0) > 1e-3,
      s"per-term e9 margin too tight: ${margin(terms.map(_ * 1e9), 1.0)}")
    val idcg = 3.0 / log2(2.0) + 2.0 / log2(3.0) + 1.0 / log2(4.0)
    assert(margin(Seq(idcg * 1e9), 1.0) > 1e-3)
    // every reachable dcg_e9 is an exact integer sum of gridded terms,
    // and ndcg_e6 feeds exact integers to one IEEE division — enumerate
    // all ≤3-term gain/rank assignments and pin the e6 boundary margin.
    val idcgE9 = math.round(idcg * 1e9)
    val termE9 = Map.empty[(Int, Int), Long] ++ (
      for { g <- 0 to 3; a <- 1 to 3 } yield
        (g, a) -> (if (g > 0) math.round(g / log2(a + 1.0) * 1e9) else 0L))
    val ndcgs = for {
      g1 <- 0 to 3; g2 <- 0 to 3; g3 <- 0 to 3
      if Seq(g1, g2, g3).filter(_ > 0).distinct.size ==
        Seq(g1, g2, g3).count(_ > 0) // grades are distinct when present
    } yield (termE9((g1, 1)) + termE9((g2, 2)) + termE9((g3, 3))).toDouble *
      1e6 / idcgE9
    assert(margin(ndcgs, 1.0) > 1e-4,
      s"ndcg e6 margin too tight: ${margin(ndcgs, 1.0)}")
  }

  test("q237 agrees with q136 on hits and respects metric bounds") {
    val m = Similarity.q237(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val recall = Similarity.q136(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(m.nonEmpty)
    m.foreach { case (qid, hits, rr, ndcg) =>
      assert(hits == recall(qid), s"q237/q136 hits disagree for qid=$qid")
      assert(Seq(0L, 333333L, 500000L, 1000000L).contains(rr))
      assert(ndcg >= 0L && ndcg <= 1000000L)
      assert((hits == 0) == (rr == 0L))
      assert((hits == 0) == (ndcg == 0L))
      // the self-vector is always in its own bucket at sim 1.0
      assert(hits >= 1L && rr == 1000000L)
    }
  }

  // ---- q240 ---------------------------------------------------------------

  test("q248 RRF fusion: exact replay; both lists contribute; " +
    "semantic rank margins wide") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct.toSet))
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select("vec_id", "embedding").collect().toSeq
      .map { r =>
        val e = r.getSeq[Float](1).map(_.toDouble).toArray
        val n = math.sqrt(e.map(x => x * x).sum)
        (r.getLong(0), e.map(_ / n))
      }
    val probes = (0L until 5L).toSeq
    val docMap = docs.toMap
    val lex = probes.flatMap { q =>
      val qs = docMap(q)
      docs.filter(_._1 != q)
        .map { case (d, ds) =>
          val i = (qs & ds).size
          (d, i, qs.size + ds.size - i)
        }
        .filter(_._2 > 0)
        .map { case (d, i, u) =>
          (d, math.round(i.toDouble * 1000000.0 / u.toDouble))
        }
        .sortBy { case (d, j) => (-j, d) }.take(20).zipWithIndex
        .map { case ((d, _), r) => (q, d) -> (r + 1L) }
    }.toMap
    val vecMap = vecs.toMap
    val semSims = probes.map { q =>
      val qu = vecMap(q)
      q -> vecs.filter(_._1 != q).map { case (d, du) =>
        var s = 0.0; var i = 0
        while (i < du.length) { s += du(i) * qu(i); i += 1 }
        (d, s)
      }.sortBy { case (d, s) => (-s, d) }
    }.toMap
    // Adjacent raw-sim gaps through rank 21 must dwarf cross-engine
    // IEEE drift (~1e-15): a gap flip would renumber r_sem.
    val minGap = semSims.values.flatMap { ss =>
      ss.take(21).sliding(2).collect { case Seq(a, b) => a._2 - b._2 }
    }.min
    assert(minGap > 1e-9, s"semantic rank gap $minGap")
    val sem = semSims.flatMap { case (q, ss) =>
      ss.take(20).zipWithIndex.map { case ((d, _), r) => (q, d) -> (r + 1L) }
    }
    val expected = (sem.keySet ++ lex.keySet).toSeq.map { k =>
      val rrf = sem.get(k).map(r => math.round(1e9 / (60 + r))).getOrElse(0L) +
        lex.get(k).map(r => math.round(1e9 / (60 + r))).getOrElse(0L)
      (k._1, k._2, rrf, sem.get(k), lex.get(k))
    }.groupBy(_._1).toSeq.flatMap { case (q, rows) =>
      rows.sortBy(t => (-t._3, t._2)).take(10).zipWithIndex
        .map { case ((_, d, rrf, rs, rl), i) => (q, i + 1L, d, rrf, rs, rl) }
    }.sortBy(t => (t._1, t._2))
    val got = graft.ext.Ranking.q248(spark, sf).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5))))
    assert(got === expected)
    // Fusion must be non-trivial: rows from each list alone AND rows
    // where both lists agree.
    assert(got.exists(r => r._5.isDefined && r._6.isEmpty))
    assert(got.exists(r => r._5.isEmpty && r._6.isDefined))
    assert(got.exists(r => r._5.isDefined && r._6.isDefined))
  }

  test("q240 winnowing replays exactly") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").collect().toSeq
      .map(r => (r.getLong(0), r.getString(1)))
    val expect = rows.flatMap { case (id, text) =>
      val ws = text.split(" ", -1)
      if (ws.length < 3) None
      else {
        val hs = (0 until ws.length - 2).map { p =>
          java.lang.Long.parseLong(
            md5hex(s"${ws(p)} ${ws(p + 1)} ${ws(p + 2)}").take(10), 16)
        }
        val packed = hs.zipWithIndex.map { case (h, p) => h * (1L << 23) + p }
        val sel = packed.indices.filter { i =>
          val lo = (i - 3).max(0)
          val hi = (i + 3).min(packed.length - 1)
          packed(i) == (lo to hi).map(packed).min
        }
        Some((id, hs.length.toLong, sel.length.toLong,
          sel.map(hs).distinct.length.toLong))
      }
    }.sortBy(_._1)
    val got = Dedup.q240(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === expect)
    // density sanity: a centered-window (radius 3) local minimum
    // selects ~1/7 of positions on hash-random input
    val (nsh, nfp) = (expect.map(_._2).sum, expect.map(_._3).sum)
    assert(nfp * 10 > nsh && nfp * 4 < nsh,
      s"selection density implausible: $nfp of $nsh")
  }

  // ---- q241 ---------------------------------------------------------------

  test("q241 k-fold audit replays exactly") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1)))
    val byFold = rows.groupBy { case (id, _) =>
      java.lang.Long.parseLong(md5hex(id.toString).take(8), 16) % 5
    }
    val tn = rows.size.toLong
    val ts = rows.map(_._2).sum
    val expect = byFold.toSeq.sortBy(_._1).map { case (fold, fr) =>
      val n = fr.size.toLong
      val sc = fr.map(_._2).sum
      val mean = sc / n
      val oof = (ts - sc) / (tn - n)
      (fold, n, sc, mean, oof, mean - oof)
    }
    val got = Sampling.q241(spark, sf).collect().toSeq
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got === expect)
    assert(got.size == 5, "all 5 folds must be populated")
  }
}
