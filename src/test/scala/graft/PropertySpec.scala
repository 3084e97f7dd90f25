package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops._

/** Property-based invariants (SURVEY §5.2.2) over ScalaCheck generators,
  * sampled with a fixed seed (no scalatest-plus bridge in the offline
  * cache, so sampling is driven directly — still generative, still
  * deterministic). Pure-function properties take many cases; Spark-backed
  * properties take fewer to keep the suite fast.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private def forAllSampled[A](gen: Gen[A], n: Int)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var done = 0
    var tries = 0
    while (done < n && tries < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach { a => f(a); done += 1 }
      seed = seed.next
      tries += 1
    }
    assert(done === n, s"generator produced only $done/$n samples")
  }

  private def title(s: String): String =
    TitleCaseUtil.titleCase(UTF8String.fromString(s)).toString

  // Names-ish strings: letters (incl. accents/odd case mappings), digits,
  // separators.
  private val nameGen: Gen[String] =
    Gen.listOf(Gen.oneOf(('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9') ++
      Seq(' ', '\'', '-', '.', ',', 'é', 'ß', 'Ж', 'ǅ'))).map(_.mkString)

  test("titleCase is idempotent") {
    forAllSampled(nameGen, 200) { s => assert(title(title(s)) === title(s)) }
  }

  test("titleCase preserves code-point length and non-letters verbatim") {
    forAllSampled(nameGen, 200) { s =>
      val t = title(s)
      assert(t.codePointCount(0, t.length) === s.codePointCount(0, s.length))
      assert(
        s.filterNot(_.isLetter) === t.filterNot(_.isLetter),
        "non-letters must pass through unchanged")
    }
  }

  test("normalizeColumnName is idempotent and space-free") {
    forAllSampled(nameGen, 200) { s =>
      val n = normalizeColumnName(s)
      assert(normalizeColumnName(n) === n)
      assert(!n.contains(" "))
    }
  }

  private val kvGen: Gen[List[(Int, Int)]] =
    Gen.listOf(Gen.zip(Gen.choose(0, 20), Gen.choose(0, 100)))

  test("semi and anti join partition the input") {
    forAllSampled(Gen.zip(kvGen, kvGen), 6) { case (left, right) =>
      val l = left.toDF("k", "v")
      val r = right.toDF("k", "v")
      val semi = l.join(r.select("k").distinct(), Seq("k"), "left_semi")
      val anti = antiExisting(l, r, Seq("k"))
      assert(semi.count() + anti.count() === l.count())
      assert(semi.join(anti, Seq("k"), "left_semi").count() === 0L)
    }
  }

  test("surrogateKey is injective on distinct keys") {
    forAllSampled(kvGen, 6) { kvs =>
      val distinctKeys = kvs.toDF("k1", "k2").distinct()
      val keyed = distinctKeys
        .select(surrogateKey(Seq($"k1".cast("string"), $"k2".cast("string"))).as("sk"))
      assert(keyed.distinct().count() === distinctKeys.count())
    }
  }

  test("dedupFirstWins emits exactly one row per key") {
    forAllSampled(kvGen, 6) { kvs =>
      val df = kvs.toDF("k", "ord")
      val out = dedupFirstWins(df, Seq("k"), Seq($"ord", $"k"))
      assert(out.count() === df.select("k").distinct().count())
      assert(out.count() <= df.count())
    }
  }

  // Arbitrary positive doc sizes INCLUDING oversize (> budget) docs —
  // the general contract the fixture-backed SamplingSpec cannot reach.
  private val sizesGen: Gen[List[Long]] =
    Gen.nonEmptyListOf(Gen.chooseNum(1L, 300L))

  test("packBudget: pack_id == floor(startOffset / budget), nondecreasing, for any sizes") {
    val budget = 100L
    forAllSampled(sizesGen, 6) { sizes =>
      val df = sizes.zipWithIndex
        .map { case (sz, i) => (i.toLong, sz) }.toDF("ord", "sz")
      val out = graft.ext.Sampling
        .packBudget(df, org.apache.spark.sql.functions.lit("s"), $"ord", $"sz", budget)
        .select("ord", "sz", "pack_id")
        .collect().sortBy(_.getLong(0))
      var start = 0L
      var prevPack = -1L
      out.foreach { r =>
        val expected = start / budget
        assert(r.getLong(2) === expected,
          s"ord=${r.getLong(0)} sz=${r.getLong(1)} start=$start")
        assert(r.getLong(2) >= prevPack, "pack_id must be nondecreasing")
        prevPack = r.getLong(2)
        start += r.getLong(1)
      }
    }
  }

  test("z-order bit interleave is a bijection on the quantized grid") {
    // injectivity on pairs within the bit budget: z(a,b) == z(c,d) iff
    // (a,b) == (c,d) — verified pure-Scala against the Column expression
    // on a sampled grid
    val pairGen = for {
      a <- Gen.choose(0L, 255L); b <- Gen.choose(0L, 255L)
      c <- Gen.choose(0L, 255L); d <- Gen.choose(0L, 255L)
    } yield (a, b, c, d)
    def zScala(x: Long, y: Long): Long =
      (0 until 8).map(j => (((x >> j) & 1) << (2 * j)) | (((y >> j) & 1) << (2 * j + 1))).reduce(_ | _)
    forAllSampled(pairGen, 200) { case (a, b, c, d) =>
      assert((zScala(a, b) == zScala(c, d)) === ((a, b) == (c, d)))
    }
    // the Column expression agrees with the reference bit math
    val samples = forAllCollect(pairGen, 30)
    val df = samples.map { case (a, b, _, _) => (a, b) }.toDF("x", "y")
      .select(org.apache.spark.sql.functions.col("x"),
        org.apache.spark.sql.functions.col("y"),
        ops.Layout.interleaveBits(
          Seq(org.apache.spark.sql.functions.col("x"),
            org.apache.spark.sql.functions.col("y")), 8).as("z"))
    df.collect().foreach(r => assert(r.getLong(2) === zScala(r.getLong(0), r.getLong(1))))
  }

  test("interval overlap join equals the naive join for random interval sets") {
    val ivGen = Gen.listOfN(12, for {
      s <- Gen.choose(-50L, 50L); len <- Gen.choose(0L, 20L)
    } yield (s, s + len))
    forAllSampled(Gen.zip(ivGen, ivGen, Gen.oneOf(1L, 3L, 8L, 64L)), 5) {
      case (as, bs, width) =>
        val a = as.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("aid", "as", "ae")
        val b = bs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) }
          .toDF("bid", "bs", "be")
        val naive = a.join(b, $"as" <= $"be" && $"bs" <= $"ae")
          .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq
        val bucketed = ops.RangeJoin.intervalOverlapJoin(a, b, "as", "ae", "bs", "be", width)
          .select("aid", "bid").collect().map(r => (r.getLong(0), r.getLong(1)))
          .sorted.toSeq
        assert(bucketed === naive, s"width=$width")
    }
  }

  private def forAllCollect[A](gen: Gen[A], n: Int): Seq[A] = {
    var seed = Seed(7L)
    val buf = scala.collection.mutable.Buffer.empty[A]
    var tries = 0
    while (buf.size < n && tries < n * 10) {
      gen.apply(Gen.Parameters.default, seed).foreach(buf += _)
      seed = seed.next
      tries += 1
    }
    buf.toSeq
  }
}
