package graft

import java.math.{BigDecimal => JBig, RoundingMode}
import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-9 third batch: Bloom pruning audit (q263), Spearman (q264),
  * Mann-Whitney U (q265), Kendall tau (q266). Driver-side replays on
  * sf0.001 + the margin/binding pins the float discipline requires.
  */
class Round9cSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** Word 5-gram shingles of a doc, distinct, Spark split semantics. */
  private def grams5(text: String): Set[String] = {
    val ws = text.split(" ", -1)
    if (ws.length < 5) Set.empty
    else ws.sliding(5).map(_.mkString(" ")).toSet
  }

  // --------------------------------------------------------------- q263

  test("q263 Bloom audit: exact replay + no false negatives + binding FPR") {
    val m = 131072L
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val ev = docs.filter { case (id, _) => id % 7 == 0 && id < 500 }
      .flatMap(d => grams5(d._2)).toSet
    val corpus = docs.filter(_._1 % 7 != 0).flatMap(d => grams5(d._2)).toSet
    def positions(g: String): Seq[Long] =
      (0 until 3).map { i =>
        java.lang.Long.parseLong(md5hex(s"$i:$g").take(10), 16) % m
      }
    val bits = ev.flatMap(positions)
    val bloomPos = corpus.count(g => positions(g).forall(bits.contains))
    val truePos = corpus.count(ev.contains)
    val row = graft.ext.Decontam.q263(spark, sf).head()
    assert(row.getLong(0) == ev.size.toLong, "eval grams")
    assert(row.getLong(1) == bits.size.toLong, "bits set")
    assert(row.getLong(2) == corpus.size.toLong, "probed")
    assert(row.getLong(3) == bloomPos.toLong, "bloom positives")
    assert(row.getLong(4) == truePos.toLong, "true positives")
    assert(row.getLong(5) == (bloomPos - truePos).toLong)
    assert(row.getLong(6) ==
      halfUp((bloomPos - truePos).toDouble / (corpus.size - truePos) * 1e6))
    // Bloom's contract: no false negatives — every true member passes.
    assert(corpus.filter(ev.contains)
      .forall(g => positions(g).forall(bits.contains)))
    // The audit must MEASURE something: real false positives exist at
    // this load factor (expected ~0.9%), and the filter isn't saturated.
    assert(bloomPos > truePos, "FPR must bind (no false positives measured)")
    assert(bits.size < m, "filter saturated — m too small for the eval set")
    info(s"q263: ${ev.size} eval grams, ${bits.size}/$m bits, " +
      s"${bloomPos - truePos} false positives of ${corpus.size - truePos}")
  }

  // --------------------------------------------------------------- q264

  test("q264 Spearman: BigInt doubled-rank replay + e6 margins") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"n_chars",
        size(array_distinct(split($"text", " "))).cast("long").as("y"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    var minMargin = Double.MaxValue
    val expect = d.groupBy(_._1).map { case (src, g) =>
      def r2(vals: Seq[Long]): Map[Long, Long] = {
        val sorted = vals.sorted
        vals.distinct.map { v =>
          val smaller = sorted.count(_ < v)
          val eq = sorted.count(_ == v)
          v -> (2L * (smaller + 1) + eq - 1)
        }.toMap
      }
      val xs = g.map(_._2).toSeq
      val ys = g.map(_._3).toSeq
      val rx = r2(xs)
      val ry = r2(ys)
      val n = BigInt(g.length)
      val pairs = g.map(t => (BigInt(rx(t._2)), BigInt(ry(t._3))))
      val sx = pairs.map(_._1).sum
      val sy = pairs.map(_._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val sxy = pairs.map(p => p._1 * p._2).sum
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val cov = n * sxy - sx * sy
      val rho = cov.doubleValue /
        math.sqrt(vx.doubleValue * vy.doubleValue) * 1e6
      minMargin = math.min(minMargin, boundaryMargin(rho))
      src -> (g.length.toLong,
        if (vx > 0 && vy > 0) Some(halfUp(rho)) else None)
    }
    val got = graft.ext.Robust.q264(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (src, v) =>
      assert(got(src) == v, s"source $src")
      v._2.foreach(rho => assert(math.abs(rho) <= 1000000L))
    }
    assert(minMargin > 1e-6, s"e6 margin too thin: $minMargin")
    info(f"q264 min e6 boundary margin: $minMargin%.3e over ${expect.size} sources")
  }

  // --------------------------------------------------------------- q265

  test("q265 Mann-Whitney: exact integer replay + tie correction binds") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"source".isin("src0", "src1"))
      .select($"source", $"n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1)))
    val all = d.map(_._2).sorted
    def r2(v: Long): Long =
      2L * (all.count(_ < v) + 1) + all.count(_ == v) - 1
    val s1 = d.filter(_._1 == "src0")
    val n1 = BigInt(s1.length)
    val n2 = BigInt(d.length - s1.length)
    val nn = n1 + n2
    val u2 = BigInt(s1.map(t => r2(t._2)).sum) - n1 * (n1 + 1)
    val dev2 = u2 - n1 * n2
    val t = all.distinct.map { v =>
      val tc = BigInt(all.count(_ == v)); tc * tc * tc - tc
    }.sum
    val z = math.signum(dev2.doubleValue) * math.sqrt(
      (3 * dev2 * dev2 * nn * (nn - 1)).doubleValue /
        (n1 * n2 * (nn * nn * nn - nn - t)).doubleValue)
    val row = graft.ext.Robust.q265(spark, sf).head()
    assert(row.getLong(0) == n1.toLong && row.getLong(1) == n2.toLong)
    assert(row.getLong(2) == u2.toLong, "U2")
    assert(row.getLong(3) == dev2.toLong, "dev2")
    assert(row.getLong(4) == t.toLong, "tie term")
    assert(row.getLong(5) == halfUp(z * 1e4), "z_e4")
    val margin = boundaryMargin(z * 1e4)
    assert(margin > 1e-6, s"z e4 margin too thin: $margin")
    // Ties exist in the integer length domain, so the correction term
    // must actually engage — an always-zero T would be untested code.
    assert(t > 0, "tie correction never binds on this data")
    info(f"q265: U2=$u2 dev2=$dev2 T=$t z=${z}%.4f margin=$margin%.3e")
  }

  // --------------------------------------------------------------- q267

  test("q267 shard manifest: exact replay + additivity of the content sum") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val hexIdx = "0123456789abcdef"
    val byShard = docs.map { case (id, text, nc) =>
      val key = md5hex(s"ep1:$id")
      (hexIdx.indexOf(key.head).toLong, key, id, text, nc)
    }.groupBy(_._1)
    val expect = byShard.map { case (shard, g) =>
      val ordered = g.sortBy { case (_, key, id, _, _) => (key, id) }
      val chain = md5hex(ordered.map(t => md5hex(t._4)).mkString)
      shard -> (g.length.toLong,
        g.map(_._4.split(" ", -1).length.toLong).sum,
        g.map(_._5).sum,
        g.map(t => java.lang.Long.parseLong(md5hex(t._4).take(10), 16)).sum,
        chain)
    }
    val got = graft.ext.Sampling.q267(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (sh, v) => assert(got(sh) == v, s"shard $sh") }
    // Additivity: the content sums across shards reconstruct the
    // whole-corpus sum — the property that lets manifests diff/merge.
    assert(got.values.map(_._4).sum ==
      docs.map(d => java.lang.Long.parseLong(md5hex(d._2).take(10), 16)).sum)
    // Chain fingerprints are genuinely order-sensitive state: distinct
    // across shards (distinct doc sets and orders).
    assert(got.values.map(_._5).toSet.size == got.size)
  }

  // --------------------------------------------------------------- q268

  test("q268 sensitivity audit: exact replay + whale share binds") {
    val cents = (x: Double) =>
      new JBig(x).setScale(2, RoundingMode.HALF_UP)
        .movePointRight(2).longValueExact()
    val orders = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_custkey", $"o_totalprice").collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
    val nation = spark.read.parquet(s"$sf/nation.parquet")
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getAs[Number](0).longValue -> r.getString(1)).toMap
    val custNat = spark.read.parquet(s"$sf/customer.parquet")
      .select($"c_custkey", $"c_nationkey").collect()
      .map(r => r.getAs[Number](0).longValue ->
        nation(r.getAs[Number](1).longValue)).toMap
    val perCust = orders.groupBy(_._1)
      .map { case (ck, g) => (ck, g.map(_._2).sum) }
    val expect = perCust.toSeq.groupBy { case (ck, _) => custNat(ck) }
      .map { case (nat, g) =>
        val total = g.map(_._2).sum
        val best = g.minBy { case (ck, c) => (-c, ck) }
        nat -> (g.size.toLong, total, best._2, best._1,
          halfUp(best._2.toDouble / total * 1e6))
      }
    val got = graft.ext.Curation.q268(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (nat, v) => assert(got(nat) == v, s"nation $nat") }
    // The audit must detect real concentration: in every nation the
    // max contributor exceeds the uniform share (strictly, unless all
    // customers are identical), and never exceeds the total.
    got.foreach { case (nat, (n, total, sens, _, _)) =>
      assert(sens <= total && sens * n >= total, s"nation $nat")
    }
  }

  // --------------------------------------------------------------- q266

  test("q266 Kendall tau: independent replay + rank-20/21 margins") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"doc_id", $"text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ", -1).distinct.toSet))
      .toMap
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"embedding").collect()
      .map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble).toArray
        val norm = math.sqrt(v.map(x => x * x).sum)
        r.getLong(0) -> v.map(_ / norm)
      }.toMap
    def lexTop(q: Long): Seq[(Long, Long)] = {
      val qs = docs(q)
      docs.toSeq.filter(_._1 != q)
        .flatMap { case (id, ts) =>
          val i = (qs & ts).size
          // The engine's inverted-index join only surfaces pairs with
          // at least one shared token — mirror that candidate set.
          if (i == 0) None
          else Some((id, halfUp(i.toDouble * 1e6 / (qs.size + ts.size - i))))
        }
        .sortBy { case (id, j) => (-j, id) }.take(20)
        .zipWithIndex.map { case ((id, _), r) => (id, r + 1L) }
    }
    def semTop(q: Long): Seq[(Long, Long)] = {
      val qv = emb(q)
      emb.toSeq.filter(_._1 != q)
        .map { case (id, v) =>
          (id, qv.zip(v).map { case (a, b) => a * b }.sum)
        }
        .sortBy { case (id, s) => (-s, id) }.take(20)
        .zipWithIndex.map { case ((id, _), r) => (id, r + 1L) }
    }
    val expect = (0L until 5L).flatMap { q =>
      val lex = lexTop(q).toMap
      val sem = semTop(q).toMap
      val common = lex.keySet & sem.keySet
      val pairs = common.toSeq.combinations(2).toSeq
      if (pairs.isEmpty) None
      else {
        val conc = pairs.count { case Seq(a, b) =>
          (lex(a) - lex(b)) * (sem(a) - sem(b)) > 0
        }
        val np = pairs.size.toLong
        Some(q -> (common.size.toLong, np, conc.toLong, np - conc,
          halfUp((2L * conc - np).toDouble / np * 1e6)))
      }
    }.toMap
    val got = graft.ext.Ranking.q266(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toMap
    assert(got.keySet == expect.keySet && got.nonEmpty)
    expect.foreach { case (q, v) => assert(got(q) == v, s"probe $q") }
    // Semantic rank-20/21 gap: the float boundary that decides list
    // membership (the lexical boundary is integer + id tie-break).
    val gaps = (0L until 5L).map { q =>
      val qv = emb(q)
      val sims = emb.toSeq.filter(_._1 != q)
        .map { case (id, v) => (qv.zip(v).map(p => p._1 * p._2).sum, id) }
        .sortBy { case (s, id) => (-s, id) }
      sims(19)._1 - sims(20)._1
    }
    assert(gaps.min > 1e-9, s"sem rank-20/21 gap too thin: ${gaps.min}")
    info(f"q266 min sem rank-20/21 gap: ${gaps.min}%.3e; " +
      s"tau values: ${expect.toSeq.sortBy(_._1).map(_._2._5)}")
  }
}
