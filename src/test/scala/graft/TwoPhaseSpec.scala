package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TwoPhase

/** TwoPhase (HDR-bucket two-phase rank/cumsum) vs the single-task
  * window it replaces — exact equality on signed, zero-heavy, tied,
  * and extreme-long fixtures, plus the monotonicity and spread
  * properties of the sign-mirrored bucket function itself.
  */
class TwoPhaseSpec extends SparkTestBase {
  import spark.implicits._

  /** Signed fixture: log-spread magnitudes both signs, zeros, dup
    * values (tie-break exercised), and the 4 extreme longs. */
  private lazy val signed = {
    val vals =
      (0L until 60L).map(i => (i, ((i % 2) * 2 - 1) * (1L << (i % 40)))) ++
        (60L until 80L).map(i => (i, (i % 5) - 2L)) ++ // −2..2 with dups
        Seq((80L, Long.MinValue), (81L, Long.MinValue + 1),
          (82L, Long.MaxValue), (83L, 0L))
    vals.toDF("id", "v").repartition(5)
  }

  private def oracleRn(asc: Boolean) = {
    val ord = if (asc) $"v".asc else $"v".desc
    signed
      .withColumn("rn", row_number().over(
        Window.orderBy(ord, $"id".asc)).cast("long"))
      .select($"id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  private def gotRn(asc: Boolean) =
    TwoPhase.rankCum(signed, Seq.empty, "v", "id", asc, rn = Some("rn"))
      .select($"id", $"rn")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("rankCum rank equals the single-task window on a signed domain incl. extreme longs") {
    // rank-only: the extreme fixture's TOTAL would overflow long, and
    // rankCum must not even compute a sum when none was requested.
    assert(gotRn(asc = true) === oracleRn(asc = true))
    assert(gotRn(asc = false) === oracleRn(asc = false))
  }

  test("rankCum cum/tot equal the single-task window on a signed (non-extreme) domain") {
    val df = (1L to 120L).map(i => (i, ((i % 2) * 2 - 1) * (1L << (i % 35)) + i))
      .toDF("id", "v").repartition(6)
    val w = Window.orderBy($"v".asc, $"id".asc)
    val exp = df
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum($"v").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tot", sum($"v").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .select($"id", $"rn", $"cum", $"tot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val act = TwoPhase.rankCum(df, Seq.empty, "v", "id", asc = true,
      rn = Some("rn"), cum = Some("cum"), tot = Some("tot"))
      .select($"id", $"rn", $"cum", $"tot")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(act === exp)
  }

  test("rankMulti equals per-metric single-task windows on signed metrics") {
    val df = (1L to 100L)
      .map(i => (i, (i % 13) - 6L, ((i * 31) % 17) - 8L))
      .toDF("id", "a", "b").repartition(7)
    val wA = Window.orderBy($"a".asc, $"id".asc)
    val wB = Window.orderBy($"b".desc, $"id".asc)
    val exp = df
      .withColumn("ra", row_number().over(wA).cast("long"))
      .withColumn("rb", row_number().over(wB).cast("long"))
      .select($"id", $"ra", $"rb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val act = TwoPhase.rankMulti(df, Seq.empty,
      Seq(("a", "id", true, "ra"), ("b", "id", false, "rb")))
      .select($"id", $"ra", $"rb")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(act === exp)
  }

  test("kth equals rankCum-filter for every position on the signed fixture") {
    // r18: TwoPhase.kth locates position k from the bucket census and
    // ranks only the hit bucket — must equal filtering the full
    // rankCum at rn = k for EVERY k (1..n), including the lower-median
    // k = (n+1) div 2 that q390 consumes.
    val n = signed.count().toInt
    val full = TwoPhase.rankCum(signed, Nil, "v", "id",
      asc = true, rn = Some("rn"))
      .select($"rn", $"v").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // positions spanning bucket boundaries, ends, and the median
    // (each kth call is several jobs — sample, don't sweep all n)
    Seq(1, 2, 3, n / 3, (n + 1) / 2, 2 * n / 3, n - 1, n).distinct.foreach { k =>
      val got = TwoPhase.kth(signed, "v", "id", _ => lit(k.toLong), "v")
        .collect()
      assert(got.length == 1 && got.head.getLong(0) == full(k.toLong),
        s"kth($k) = ${got.toSeq} != rankCum rn=$k -> ${full(k.toLong)}")
    }
  }

  test("hdrBucket is monotone nondecreasing over a sign-spanning grid") {
    // Every adjacent pair of a sorted value grid must have
    // nondecreasing buckets — the property the prefix math relies on.
    val grid = (Seq(Long.MinValue, Long.MinValue + 1, Long.MaxValue,
      Long.MaxValue - 1, 0L, -1L, 1L) ++
      (0 until 62).flatMap(e => Seq((1L << e) - 1, 1L << e, (1L << e) + 1))
        .flatMap(v => Seq(v, -v))).distinct.sorted
    val rows = grid.toDF("v")
      .select($"v", TwoPhase.hdrBucket($"v").as("b"))
      .orderBy($"v").collect().map(r => (r.getLong(0), r.getLong(1)))
    rows.sliding(2).foreach { case Array((v1, b1), (v2, b2)) =>
      assert(b1 <= b2, s"bucket order broke between $v1 (b=$b1) and $v2 (b=$b2)")
    }
    // Long.MinValue strictly below every mirrored bucket.
    val minB = rows.head._2
    assert(rows.head._1 == Long.MinValue && rows.tail.forall(_._2 > minB))
  }

  test("negative domain spreads across many buckets (not one degenerate bucket)") {
    // BINDINGNESS: before the sign mirror every v<0 shared bucket −1;
    // the census of a log-spread negative fixture must now be wide.
    val neg = (0 until 50).map(i => -(1L << (i % 40)) - i).toDF("v")
    val nBuckets = neg.select(TwoPhase.hdrBucket($"v").as("b"))
      .distinct().count()
    assert(nBuckets >= 20, s"expected a spread census, got $nBuckets buckets")
  }
}
