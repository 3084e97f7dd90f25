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

  test("q250 IQR outliers: replay at both gate SFs; fences bind") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select($"source", $"n_chars").collect().toSeq
        .map(r => (r.getString(0), r.getLong(1)))
      val expected = rows.groupBy(_._1).toSeq.sortBy(_._1)
        .map { case (src, ds) =>
          val v = ds.map(_._2).sorted
          val n = v.length.toLong
          val q1 = v(((n + 3) / 4 - 1).toInt)
          val q3 = v(((3 * n + 3) / 4 - 1).toInt)
          val iqr = q3 - q1
          (src, n, q1, q3,
            v.count(c => 2 * c < 2 * q1 - 3 * iqr).toLong,
            v.count(c => 2 * c > 2 * q3 + 3 * iqr).toLong)
        }
      val got = Robust.q250(spark, dir).collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got === expected, s"at $dir")
      // The fence binds at the driver-gate fixture (sf0.001's 500-doc
      // sample happens to be fence-clean — measured, not assumed) and
      // never swallows a whole source.
      if (dir.endsWith("sf0.01"))
        assert(got.exists(g => g._5 + g._6 > 0L), s"no outliers at $dir")
      assert(got.forall(g => g._5 + g._6 < g._2), s"all outliers at $dir")
    }
  }

  test("q251 CUSUM: closed form equals the sequential recurrence at " +
    "both gate SFs; alarms bind") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val byTypeDay = Tables.events(spark, dir)
        .selectExpr("event_type", "ts").collect().toSeq
        .map(r => (r.getString(0), Math.floorDiv(r.getLong(1), 1000L)))
        .map { case (t, us) => (t, us / 86400000000L) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val expected = byTypeDay.keys.map(_._1).toSeq.distinct.sorted.map { t =>
        val days = byTypeDay.keys.filter(_._1 == t).map(_._2)
        val d0 = days.min
        val d1 = days.max
        val xs = (d0 to d1).map(d => byTypeDay.getOrElse((t, d), 0L))
        val nd = xs.length.toLong
        val sx = xs.sum
        // THE SEQUENTIAL DEFINITION, not the engine's closed form:
        // S_d = max(0, S_{d-1} + (x_d*nd - sx)) — equality with the
        // running-minimum identity is what this test proves.
        var s = 0L
        var maxS = 0L
        var peakOff = 0
        var alarms = 0L
        xs.zipWithIndex.foreach { case (x, i) =>
          s = math.max(0L, s + x * nd - sx)
          if (s > maxS) { maxS = s; peakOff = i }
          if (BigInt(s) * s > BigInt(sx) * nd * 16) alarms += 1
        }
        // peak_day ties to the EARLIEST day at max (the engine's
        // struct-max rule); the strict `>` above does exactly that.
        (t, nd, sx, maxS, d0 + peakOff, alarms)
      }
      val got = Robust.q251(spark, dir).collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getLong(5)))
      assert(got === expected, s"at $dir")
      assert(got.exists(_._6 > 0L), s"no alarms anywhere at $dir")
      assert(got.forall(g => g._6 < g._2), s"always-alarming type at $dir")
    }
  }

  test("q246 seasonal error: replay at both gate SFs; seasonal lag binds") {
    def epochDay(v: Any): Long = v match {
      case t: java.sql.Timestamp      => Math.floorDiv(t.getTime, 86400000L)
      case d: java.time.LocalDateTime => d.toLocalDate.toEpochDay
      case i: java.time.Instant       => Math.floorDiv(i.toEpochMilli, 86400000L)
      case other => fail(s"unexpected timestamp class: ${other.getClass}")
    }
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val byDay = spark.read.parquet(s"$dir/orders.parquet")
        .select($"o_orderdate", $"o_totalprice").collect().toSeq
        .map(r => (epochDay(r.get(0)), cents(r.getDouble(1))))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val d0 = byDay.keys.min
      val d1 = byDay.keys.max
      val r = (d0 to d1).map(d => d -> byDay.getOrElse(d, 0L)).toMap
      val expect = (d0 + 7 to d1).map { d =>
        val month = java.time.LocalDate.ofEpochDay(d)
          .format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM"))
        (month, math.abs(r(d) - r(d - 1)), math.abs(r(d) - r(d - 7)))
      }.groupBy(_._1).toSeq.sortBy(_._1).map { case (m, es) =>
        val n = es.size.toLong
        val s1 = es.map(e => BigInt(e._2)).sum
        val s7 = es.map(e => BigInt(e._3)).sum
        val mase = if (s1 > 0)
          Some(Math.round(s7.toDouble * 10000.0 / s1.toDouble))
        else None
        (m, n, (s1 / n).toLong, (s7 / n).toLong, mase)
      }
      val got = Robust.q246(spark, dir).collect().toSeq.map(r =>
        (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
          if (r.isNullAt(4)) None else Some(r.getLong(4))))
      assert(got === expect, s"at $dir")
      // The monitor must DETECT something: at least one month where
      // the weekly lag beats persistence or vice versa (ratio ≠ 1e4).
      assert(got.flatMap(_._5).exists(_ != 10000L), s"flat ratio at $dir")
    }
  }
}
