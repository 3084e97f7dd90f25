package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.ext.Robust

/** Robust-statistics family: full driver-side replays on the sf0.001
  * fixtures. q238/q239 are all-integer (strict equality); q242/q243
  * round ONE correctly-rounded IEEE division onto a grid, so the
  * replay reproduces the identical double expression and still
  * compares strictly.
  */
class RobustSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def cents(x: Double): Long =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("q238 winsorized/trimmed means replay exactly") {
    val rows = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_returnflag", $"l_extendedprice")
      .collect().toSeq
      .map(r => (r.getString(0), cents(r.getDouble(1))))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).map { case (flag, fr) =>
      val v = fr.map(_._2).sorted
      val n = v.length.toLong
      val loRank = (n + 9) / 10
      val hiRank = (9 * n + 9) / 10
      val lo = v((loRank - 1).toInt)
      val hi = v((hiRank - 1).toInt)
      val g = (n / 10).toInt
      val trimmed = v.slice(g, v.length - g)
      (flag, n, lo, hi,
        v.map(BigInt(_)).sum / n,
        v.map(x => BigInt(x.max(lo).min(hi))).sum / n,
        trimmed.map(BigInt(_)).sum / trimmed.length)
    }
    val got = Robust.q238(spark, sf).collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        BigInt(r.getLong(4)), BigInt(r.getLong(5)), BigInt(r.getLong(6))))
    assert(got === expect)
  }

  test("q239 merged partial states equal a one-pass recompute") {
    val one = spark.read.parquet(s"$sf/orders.parquet")
      .select(date_trunc("month", $"o_orderdate").cast("date").as("month"),
        ($"o_totalprice".cast("decimal(18,2)") * 100).cast("long").as("c"),
        ($"o_orderdate" < lit("1997-06-15").cast("timestamp")).as("isBase"))
      .groupBy($"month")
      .agg(count(lit(1)).as("n"), sum($"c").as("sum_cents"),
        min($"c").as("min_c"), max($"c").as("max_c"),
        size(collect_set($"isBase")).cast("long").as("n_parts"))
      .orderBy("month")
      .collect().toSeq.map(r => (r.get(0).toString, r.getLong(1),
        r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val merged = Robust.q239(spark, sf).collect().toSeq.map(r =>
      (r.get(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(merged === one)
    // the mid-month era cut must actually exercise a 2-part merge
    assert(merged.exists(_._6 == 2L),
      "no month straddled the 1997-06-15 era cut — the merge is vacuous")
  }

  test("q242 histogram quantile interpolation replays exactly") {
    val rows = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"n_chars").collect().toSeq
      .map(r => (r.getString(0), r.getLong(1)))
    val expect = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap {
      case (src, fr) =>
        val bins = fr.map(x => (x._2 / 100).min(99)).groupBy(identity)
          .map { case (b, xs) => (b, xs.size.toLong) }.toSeq.sortBy(_._1)
        val n = fr.size.toLong
        Seq(50L, 90L, 99L).map { p =>
          val t = (p * n + 99) / 100
          val cums = bins.scanLeft(0L)(_ + _._2).tail
          val i = cums.indexWhere(_ >= t)
          val (bin, cnt) = bins(i)
          val prev = cums(i) - cnt
          val est = (bin * 100 + (t - prev) * 100.0 / cnt) * 100
          (src, p, n, Math.round(est))
        }
    }
    val got = Robust.q242(spark, sf).collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got === expect)
  }

  test("q243 EWMA replays exactly against BigInt coefficients") {
    val coefs = (0 to 13).map(k => BigInt(9).pow(k) * BigInt(10).pow(13 - k))
    val daily: Map[(String, Long), Long] = Tables.events(spark, sf)
      .select($"event_type",
        expr("(CAST(ts AS DECIMAL(20,0)) / 1000) DIV 86400000000").as("day"))
      .collect().toSeq.map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case (k, xs) => (k, xs.size.toLong) }
    val byType = daily.keys.map(_._1).toSeq.distinct.sorted
    val expect = byType.flatMap { et =>
      val days = daily.keys.filter(_._1 == et).map(_._2)
      val d0 = days.min
      val d1 = days.max
      (d0 to d1).map { d =>
        val x = daily.getOrElse((et, d), 0L)
        val terms: Seq[(BigInt, BigInt)] = (0 to 13).flatMap { k =>
          val src = d - k
          if (src >= d0)
            Some((coefs(k) * BigInt(daily.getOrElse((et, src), 0L)), coefs(k)))
          else None
        }
        val ss = terms.map(_._1).sum
        val nn = terms.map(_._2).sum
        val ewma = Math.round(ss.toDouble / nn.toDouble * 10000)
        val spike = if (BigInt(x) * nn > ss * 2) 1 else 0
        (et, d, x, ewma, spike)
      }
    }
    val got = Robust.q243(spark, sf).collect().toSeq.map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    assert(got === expect)
  }
}
