package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Exact driver-side replays of the round-11 second batch q368-q372:
  * packing-budget curve, temperature mixture curve, t-closeness EMD,
  * dedup token-savings ledger, hash-shard balance. Same discipline as
  * Round11cSpec.
  */
class Round11dSpec extends SparkTestBase {
  import spark.implicits._

  private val sf1 = "/root/testdata/sf0.001"

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def docRows(): Seq[(Long, String, String, Long)] =
    spark.read.parquet(s"$sf1/documents.parquet")
      .select($"doc_id", $"text", $"source", $"n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq

  test("q368 packing curve: exact floor-division replay, fill margins, " +
    "packs shrink as budget grows") {
    val docs = docRows()
    val expected = Seq(2048L, 4096L, 8192L).map { b =>
      val packs = docs.groupBy(_._3).toSeq.flatMap { case (_, xs) =>
        var cum = 0L
        xs.sortBy(_._1).map { d =>
          val start = cum
          cum += d._4
          (math.floor(start.toDouble / b.toDouble).toLong, d._3, d._4)
        }
      }.groupBy(p => (p._2, p._1)).values.toSeq
      val nPacks = packs.size.toLong
      val chars = docs.map(_._4).sum
      val single = packs.count(_.size == 1).toLong
      val oversize = docs.count(_._4 > b).toLong
      val fill = chars.toDouble / (nPacks * b).toDouble * 1e6
      assert(boundaryMargin(fill) > 1e-6)
      (b, nPacks, chars, single, oversize, halfUp(fill))
    }
    val got = graft.ext.Sampling.queries("q368_packing_curve")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    assert(expected.map(_._2).sliding(2).forall(p => p(1) < p(0)),
      "pack count must strictly shrink as the budget doubles here")
  }

  test("q369 temperature curve: exact gridded-pow replay; tau=1 factor " +
    "is 1 for every source; low tau up-samples the tail") {
    val docs = docRows()
    val toks = docs.groupBy(_._3).view
      .mapValues(_.map(_._2.split(" ", -1).length.toLong).sum).toMap
    val expected = Seq(50L, 70L, 100L).flatMap { tau =>
      val w = toks.view.mapValues(t =>
        halfUp(math.pow(t.toDouble, tau.toDouble / 100.0) * 1e6)).toMap
      val z = w.values.sum
      val n = toks.values.sum
      toks.keys.toSeq.sorted.map { src =>
        val share = w(src).toDouble / z.toDouble * 1e6
        val factor = w(src).toDouble / z.toDouble *
          n.toDouble / toks(src).toDouble * 1e6
        assert(boundaryMargin(share) > 1e-6 && boundaryMargin(factor) > 1e-6,
          s"q369 margins at tau=$tau src=$src")
        (tau, src, toks(src), halfUp(share), halfUp(factor))
      }
    }
    val got = graft.ext.Sampling.queries("q369_temperature_curve")(
      spark, sf1).collect().map(r => (r.getLong(0), r.getString(1),
        r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got == expected)
    // τ=1.0 is proportional sampling: factor ≡ 1e6 up to the e6 grid
    expected.filter(_._1 == 100L).foreach(e =>
      assert(math.abs(e._5 - 1000000L) <= 1L, s"tau=1 factor drifted: $e"))
    // τ=0.5 up-samples the smallest source hardest
    val t05 = expected.filter(_._1 == 50L)
    assert(t05.minBy(_._3)._5 == t05.map(_._5).max)
  }

  test("q370 t-closeness: exact ECDF-gap replay against q366's buckets") {
    val cust = spark.read.parquet(s"$sf1/customer.parquet")
      .select($"c_nationkey".cast("long"), $"c_mktsegment",
        $"c_acctbal".cast("decimal(18,2)")).collect()
      .map { r =>
        ((r.getLong(0), r.getString(1)),
          math.floor(r.getDecimal(2).movePointRight(2).longValueExact()
            .toDouble / 100000.0).toLong)
      }.toSeq
    val buckets = cust.map(_._2).distinct.sorted
    val nb = cust.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = cust.size.toLong
    val expected = cust.groupBy(_._1).toSeq.map { case ((nat, seg), xs) =>
      val ng = xs.size.toLong
      val gcnt = xs.groupBy(_._2).view.mapValues(_.size.toLong).toMap
      var cumg = BigInt(0); var cum = BigInt(0); var gap = BigInt(0)
      buckets.foreach { b =>
        cumg += BigInt(gcnt.getOrElse(b, 0L))
        cum += BigInt(nb(b))
        gap += (BigInt(n) * cumg - BigInt(ng) * cum).abs
      }
      val emd = gap.toDouble /
        (ng.toDouble * n.toDouble * (buckets.size - 1).toDouble) * 1e6
      assert(boundaryMargin(emd) > 1e-6, s"q370 margin at ($nat,$seg)")
      (nat, seg, ng, halfUp(emd))
    }.sortBy(x => (x._1, x._2))
    val got = graft.ext.Curation.queries("q370_t_closeness")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got == expected)
    // EMD is a [0,1] distance; degenerate-zero everywhere would mean
    // the grid collapsed
    assert(expected.forall(e => e._4 >= 0L && e._4 <= 1000000L))
    assert(expected.exists(_._4 > 0L))
  }

  test("q371 dedup savings: exact keep-first token ledger; savings " +
    "consistent with the known fixture duplication") {
    val docs = docRows()
    val keeper = docs.groupBy(d => md5hex(d._2)).view
      .mapValues(_.map(_._1).min).toMap
    val expected = docs.groupBy(_._3).toSeq.map { case (src, xs) =>
      val tokens = xs.map(_._2.split(" ", -1).length.toLong).sum
      val dropped = xs.filter(d => keeper(md5hex(d._2)) != d._1)
      val dTok = dropped.map(_._2.split(" ", -1).length.toLong).sum
      val share = dTok.toDouble / tokens.toDouble * 1e6
      (src, xs.size.toLong, tokens, dropped.size.toLong, dTok,
        halfUp(share))
    }.sortBy(_._1)
    val got = graft.ext.TextAnalysis.queries("q371_dedup_savings")(
      spark, sf1).collect().map(r => (r.getString(0), r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // the gate fixtures carry no exact duplicates (the replay above
    // still certifies the zero ledger exactly); the non-vacuous check
    // runs at sf0.1, the one fixture with real duplicate copies
    val dropped1 = graft.ext.TextAnalysis.queries("q371_dedup_savings")(
      spark, "/root/testdata/sf0.1")
      .agg(org.apache.spark.sql.functions.sum($"dropped_docs"))
      .collect()(0).getLong(0)
    assert(dropped1 > 0L, "dedup-savings ledger vacuous at sf0.1")
  }

  test("q372 shard balance: exact md5-mod census; all shards used at " +
    "every width on this corpus") {
    val docs = docRows()
    val h2 = docs.map(d =>
      java.lang.Long.parseLong(md5hex(s"shard:${d._1}").substring(0, 2), 16))
    val expected = Seq(16L, 64L, 256L).map { ss =>
      val byShard = h2.groupBy(_ % ss).view.mapValues(_.size.toLong).toMap
      val mx = byShard.values.max
      val skew = mx.toDouble * ss.toDouble / docs.size.toDouble * 1e6
      assert(boundaryMargin(skew) > 1e-6)
      (ss, docs.size.toLong, byShard.size.toLong, mx, byShard.values.min,
        halfUp(skew))
    }
    val got = graft.ext.Sampling.queries("q372_shard_balance")(spark, sf1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got == expected)
    // a healthy hash at 500 docs: every 16-way shard occupied
    assert(expected.head._3 == 16L)
  }
}
