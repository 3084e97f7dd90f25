package graft

import org.apache.spark.sql.functions._

import graft.ext.Sampling

/** Invariants of the reproducible-sampling family (ext/Sampling.scala)
  * beyond the q76-q78 oracle rows.
  */
class SamplingSpec extends SparkTestBase {

  private val dir = "/root/testdata/sf0.001"
  private def docs = spark.read.parquet(s"$dir/documents.parquet")

  test("hashSplit is total, stable across runs, and roughly 80/10/10") {
    val a = Sampling.hashSplit(docs, col("doc_id"))
    assert(a.filter(col("split").isNull).count() === 0)
    // determinism: a second independent evaluation assigns identically
    val b = Sampling.hashSplit(docs, col("doc_id"))
    assert(a.select("doc_id", "split").exceptAll(b.select("doc_id", "split")).isEmpty)
    val byS = a.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = docs.count().toDouble
    assert(byS("train") / n > 0.6 && byS("train") / n < 0.95, byS)
  }

  test("packBudget: packs are contiguous from 0 per shard and start-offset bounded") {
    // contiguity holds only when every doc fits the budget (an oversize
    // doc's span skips ids) — assert the precondition so a fixture or
    // budget change fails loudly here, not as a confusing invariant miss
    val maxDoc = docs.agg(max("n_chars")).head.getLong(0)
    assert(maxDoc <= 4096L, s"precondition: doc of $maxDoc chars exceeds the budget")
    val packed = Sampling.packBudget(
      docs, col("source"), col("doc_id"), col("n_chars"), 4096L)
    // every pack's summed size spans at least its start boundary: pack k
    // exists only if the shard's cumulative size reached k*budget
    val perShard = packed.groupBy("source")
      .agg(max("pack_id").as("maxp"), sum("n_chars").as("total"))
    val bad = perShard.filter(col("maxp") * 4096L >= col("total")).count()
    assert(bad === 0, "a pack id exists beyond the shard's total size")
    // contiguity: distinct pack count = max + 1 in each shard
    val gaps = packed.groupBy("source")
      .agg(countDistinct("pack_id").as("np"), max("pack_id").as("maxp"))
      .filter(col("np") =!= col("maxp") + 1).count()
    assert(gaps === 0, "pack ids must be contiguous from 0")
  }

  test("mixKeep keeps a deterministic subset and keep-all threshold keeps all") {
    val kept = Sampling.mixKeep(docs, col("doc_id"), lit("40"))
    assert(kept.count() > 0 && kept.count() < docs.count())
    assert(kept.exceptAll(docs).isEmpty) // strictly a subset, rows unchanged
    assert(Sampling.mixKeep(docs, col("doc_id"), lit("zz")).count() === docs.count())
  }

  test("hashSplit rejects malformed and inverted thresholds loudly") {
    // uppercase compares above every md5 hex char — would silently
    // assign everything to 'test'
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), trainHi = "CD")
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), trainHi = "c")
    }
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), valHi = "0g")
    }
    // inverted: trainHi > valHi makes 'val' unreachable
    intercept[IllegalArgumentException] {
      Sampling.hashSplit(docs, col("doc_id"), trainHi = "e6", valHi = "cd")
    }
  }

  test("epochShard is a reproducible per-epoch permutation with contiguous shard positions") {
    val a = Sampling.epochShard(docs, col("doc_id"), lit("ep1"))
    // total: every doc appears exactly once per epoch
    assert(a.count() === docs.count())
    assert(a.select("doc_id").distinct().count() === docs.count())
    // positions are 1..n contiguous within each shard
    val bad = a.groupBy("shard")
      .agg(count(lit(1)).as("n"), max("pos").as("mx"), min("pos").as("mn"))
      .filter(col("mx") =!= col("n") || col("mn") =!= 1L).count()
    assert(bad === 0, "pos must be 1..n within each shard")
    // reproducible: an independent evaluation is identical
    val b = Sampling.epochShard(docs, col("doc_id"), lit("ep1"))
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // a different epoch is a DIFFERENT permutation (some doc moves)
    val c = Sampling.epochShard(docs, col("doc_id"), lit("ep2"))
      .select(col("doc_id"), col("shard").as("shard2"), col("pos").as("pos2"))
    val moved = a.join(c, "doc_id")
      .filter(col("shard") =!= col("shard2") || col("pos") =!= col("pos2"))
    assert(moved.count() > 0, "epochs must not share the permutation")
  }

  test("mixKeep fails the job on a malformed per-row rate") {
    val e = intercept[Exception] {
      Sampling.mixKeep(docs, col("doc_id"), lit("1")).count()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("rateHex")), e.getMessage)
  }

  test("q139 split-leakage census partitions the full q65 pair set") {
    val sf = "/root/testdata/sf0.001"
    val census = graft.ext.Sampling.q139(spark, sf).collect()
    val totalPairs = census.map(_.getLong(2)).sum
    val q65Pairs = graft.ext.Dedup.q65(spark, sf).count()
    assert(totalPairs === q65Pairs, "every candidate pair lands in exactly one cell")
    // is_leak marks exactly the off-diagonal cells
    census.foreach { r =>
      assert((r.getString(0) != r.getString(1)) === (r.getLong(3) == 1L), r.toString)
    }
  }

  test("stratumSample: k per stratum, short strata whole, equals one-window form") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val d = ((1L to 40L).map(i => (i, "big")) ++ Seq((100L, "tiny"), (101L, "tiny")))
      .toDF("doc_id", "lang")
    val got = Sampling.stratumSample(d, $"lang", $"doc_id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.count(_._1 == "big") === 3)
    // a stratum smaller than k survives whole, ranked 1..n
    assert(got.filter(_._1 == "tiny").map(_._3).sorted.toSeq === Seq(1L, 2L))
    // two-phase result ≡ the naive single-window top-k
    val naive = d
      .withColumn("rk", row_number().over(
        Window.partitionBy($"lang")
          .orderBy(md5($"doc_id".cast("string")), $"doc_id")).cast("long"))
      .filter($"rk" <= 3)
      .select($"lang".as("stratum"), $"doc_id", $"rk")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(got.toSet === naive)
    // deterministic across evaluations
    val again = Sampling.stratumSample(d, $"lang", $"doc_id", k = 3)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === again.toSeq)
  }

  test("weightedSample: ES key matches the hand formula; non-positive weights drop") {
    import spark.implicits._
    val d = Seq((7L, 100L), (8L, 50L), (9L, 0L), (10L, -3L)).toDF("id", "w")
    val got = Sampling.weightedSample(d, $"id", $"w", k = 10)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet === Set(7L, 8L)) // w <= 0 can never be drawn
    def key(id: Long, w: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 13)
      val u = java.lang.Long.parseLong(hex, 16).toDouble / 4503599627370496.0
      math.round(math.log(u) / w * 1e9)
    }
    assert(got(7L) === ((100L, key(7L, 100L))))
    assert(got(8L) === ((50L, key(8L, 50L))))
  }

  test("q154 weighted sample: deterministic, length-biased, margin pinned") {
    val rows = Sampling.q154(spark, dir).collect()
    assert(rows.length === 200)
    val again = Sampling.q154(spark, dir).collect()
    assert(rows.toSeq === again.toSeq)
    // length-weighting draws longer docs: the sample's mean n_chars
    // must exceed the corpus mean (deterministic fact on this fixture)
    val sampleMean = rows.map(_.getLong(1)).sum.toDouble / rows.length
    val corpusMean = docs.agg(avg(col("n_chars"))).head().getDouble(0)
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean not above corpus mean $corpusMean")
    // e9 rounding-boundary margin of the hashed keys: only ln() drifts
    // (~1 ulp); the margin must dwarf it
    val m = conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
      .cast("long").cast("double") / lit(4503599627370496.0)
    val margins = docs.filter(col("n_chars") > 0)
      .select((log(m) / col("n_chars") * 1e9).as("raw"))
      .collect().map(r => math.abs(r.getDouble(0) % 1 - 0.5))
    assert(margins.min > 1e-4, s"boundary margin collapsed: ${margins.min}")
  }

  test("q174 split balance: grid partitions the corpus; replay is EXACT") {
    val rows = Sampling.q174(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val total = docs.count()
    assert(rows.map(_._3).sum === total, "cells do not partition the corpus")
    val bySplit = rows.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val bySource = rows.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    rows.foreach { case (sp, src, n, expE4, chiE4) =>
      val e = (bySplit(sp) * bySource(src)).toDouble / total
      def half(v: Double) =
        BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      assert(expE4 === half(e * 10000), s"expected mismatch at ($sp,$src)")
      assert(chiE4 === half((n - e) * (n - e) / e * 10000),
        s"chi2 mismatch at ($sp,$src)")
    }
  }
}
