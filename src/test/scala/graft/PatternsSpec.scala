package graft

import org.apache.spark.sql.functions._

import graft.ext.Patterns

/** Full driver-side replays of the pattern-mining family on the
  * sf0.001 fixtures — every count, rank, and scaled ratio recomputed
  * independently in plain Scala.
  */
class PatternsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q161 association rules: full top-50 replay from raw lineitem") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = li.map(_._1).distinct.length.toLong
    val sup = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val pairSup = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val expected = pairSup.toSeq
      .sortBy { case ((a, b), s) => (-s, a, b) }
      .take(50)
      .map { case ((a, b), sAb) =>
        (a, b, sAb, sup(a), sup(b),
          math.round(sAb.toDouble / sup(a) * 10000),
          math.round(sAb * n / (sup(a).toDouble * sup(b)) * 10000))
      }
    val got = Patterns.q161(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
  }

  test("q162 transitions: full replay; per-source rows partition the steps") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"ts".cast("long"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.tail)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val fromTot = trans.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val expected = trans.toSeq.sortBy(_._1).map { case ((f, t), c) =>
      (f, t, c, fromTot(f), math.round(c.toDouble / fromTot(f) * 10000))
    }
    val got = Patterns.q162(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
  }

  test("q163 weighted median: full replay; half-mass property holds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val total = sorted.sum
      var cum = 0L
      val wm = sorted.find { l => cum += l; cum * 2 >= total }.get
      (src, total, wm)
    }
    val got = Patterns.q163(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // half-mass property: tokens in docs of length <= wm are >= half
    got.foreach { case (src, total, wm) =>
      val below = docs.filter(d => d._1 == src && d._3 <= wm).map(_._3).sum
      assert(below * 2 >= total, s"$src: $below of $total below $wm")
    }
  }

  test("dedupCensus: first-wins attribution by source; fixture corpus has no exact dups") {
    val d = Seq(
      (1L, "sA", "x y z"), (2L, "sB", "x y z"), (3L, "sB", "x y z"),
      (4L, "sB", "unique")).toDF("doc_id", "source", "text")
    val got = graft.ext.Dedup.dedupCensus(d).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(
      ("sA", 1L, 1L, 0L, 0L),        // owns the content
      ("sB", 3L, 2L, 2L, 6667L)))    // two copies lose first-wins
    // the synthetic corpus genuinely has zero exact-content duplicates
    // (q146's funnel shows 428->428) -- q164's all-zero drop column IS
    // the true answer; segment-level copying is covered by q165
    val fixture = graft.ext.Dedup.q164(spark, sf).collect()
    assert(fixture.map(_.getLong(3)).sum === 0L)
    assert(fixture.map(_.getLong(1)).sum ===
      spark.read.parquet(s"$sf/documents.parquet").count())
  }

  test("segmentCopyFlow: origin attribution on hand-built copies") {
    val seg = (0 until 16).map(i => s"w$i").mkString(" ") // one full segment
    val other = (0 until 16).map(i => s"v$i").mkString(" ")
    val d = Seq(
      (1L, "sA", seg),                       // origin of seg
      (2L, "sB", s"$other $seg"),            // copies seg at pos 1
      (3L, "sB", seg),                       // copies seg at pos 0
      (4L, "sC", other)                      // copies other (origin is doc 2 pos 0)
    ).toDF("doc_id", "source", "text")
    val got = graft.ext.Dedup.segmentCopyFlow(d).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got === Set(("sA", "sB", 2L), ("sB", "sC", 1L)))
  }

  test("apportion: Hamilton quotas hand-checked; budget lands exactly") {
    // counts 3/3/4 of 10, budget 7: bases 2/2/2 (floor 2.1, 2.1, 2.8),
    // leftover 1 goes to the largest remainder (c: rem 8)
    val d = Seq(("a", 3L), ("b", 3L), ("c", 4L)).toDF("source", "tokens")
    val got = Patterns.apportion(d, budget = 7L).collect()
      .map(r => (r.getString(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === Seq(("a", 2L, 0L, 2L), ("b", 2L, 0L, 2L), ("c", 2L, 1L, 3L)))
    // remainder tie: equal counts, extra goes to the earlier source name
    val tie = Patterns.apportion(
      Seq(("x", 1L), ("y", 1L)).toDF("source", "tokens"), budget = 3L)
      .collect().map(r => (r.getString(0), r.getLong(4)))
    assert(tie.toSeq === Seq(("x", 2L), ("y", 1L)))
    // fixture: quotas sum exactly to the budget, all non-negative
    val fix = Patterns.q166(spark, sf).collect()
    assert(fix.map(_.getLong(4)).sum === 1000000L)
    assert(fix.forall(r => r.getLong(4) >= 0L && r.getLong(3) <= 1L))
  }

  test("q167 cross-perplexity: full replay; self-model is never beaten by transfer") {
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map(w => (r.getString(0), w)))
    val counts = toks.groupBy(identity).map { case ((s, w), xs) => (s, w) -> xs.length.toLong }
    val bySource = counts.groupBy(_._1._1)
    val expected = (for {
      (t, tm) <- bySource
      model = tm.map { case ((_, w), c) => w -> c }
      n = model.values.sum.toDouble
      vsz = model.size.toDouble
      (e, em) <- bySource
    } yield {
      val nTok = em.values.sum
      val nll = em.map { case ((_, w), tf) =>
        tf * -math.log((model.getOrElse(w, 0L) + 1.0) / (n + vsz))
      }.sum / nTok
      (t, e, nTok, math.round(nll * 10000))
    }).toSeq.sortBy(x => (x._1, x._2))
    val got = graft.ext.TextAnalysis.q167(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got.map(x => (x._1, x._2, x._3)) === expected.map(x => (x._1, x._2, x._3)))
    got.zip(expected).foreach { case (g, x) =>
      assert(math.abs(g._4 - x._4) <= 1L, s"nll drift beyond 1 unit: $g vs $x")
    }
    // the asymmetric-distance sanity: every eval source is predicted
    // best by ITS OWN model (true on this fixture; the matrix's point)
    val byEval = got.groupBy(_._2)
    byEval.foreach { case (e, rows) =>
      val self = rows.find(_._1 == e).get._4
      assert(rows.forall(r => r._1 == e || r._4 >= self),
        s"$e predicted better by a foreign model")
    }
  }

  test("q170 event anomaly: full driver replay is EXACT; window discipline") {
    // Exact-integer window sums through the identical z expression —
    // bit-identical doubles, so the replay carries no tolerance.
    val days = graft.Tables.events(spark, sf)
      .select(to_date(graft.Tables.eventTs($"ts")).as("day"))
      .groupBy($"day").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)))
      .sortBy(_._1)
    val expected = days.indices.drop(7).map { i =>
      val w = days.slice(i - 7, i).map(_._2)
      val (s1, s2) = (w.sum, w.map(x => x * x).sum)
      val n = days(i)._2
      val z =
        if (7 * s2 > s1 * s1)
          Some((n.toDouble - s1.toDouble / 7.0) /
            math.sqrt((7 * s2 - s1 * s1).toDouble / 49.0))
        else None
      (days(i)._1, n, z.map(v =>
        BigDecimal(v * 10000).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong))
    }
    val got = graft.ext.Patterns.q170(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toSeq
    assert(got === expected)
    assert(got.size === days.size - 7, "first 7 observed days have no full window")
  }

  test("q179 event gaps: full driver replay is EXACT (integer order statistics)") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3) / 1000L)) // exact ns→µs truncation (positive values)
    val gaps = ev.groupBy(e => (e._1, e._2)).toSeq.flatMap { case ((_, t), es) =>
      val o = es.sortBy(e => (e._4, e._3))
      o.zip(o.tail).map { case (a, b) => (t, b._3, b._4 - a._4) }
    }
    val expected = gaps.groupBy(_._1).map { case (t, gs) =>
      val sorted = gs.sortBy(g => (g._3, g._2)).map(_._3)
      val n = sorted.size
      def q(num: Int, den: Int) = // smallest gap with rank*den >= n*num
        sorted(((n * num + den - 1) / den) - 1)
      (t, n.toLong, q(1, 2), q(9, 10))
    }.toSeq.sortBy(_._1)
    val got = graft.ext.Patterns.q179(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("q190 attribution: full driver replay is EXACT (carry-forward lookback)") {
    val dayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3) / 1000L))
    val purchases = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._3))
      var lastClick = Option.empty[Long]
      o.flatMap { e =>
        if (e._2 == "click") { lastClick = Some(e._4); None }
        else if (e._2 == "purchase")
          Some((e._4 / dayUs,
            lastClick.exists(c => e._4 - c <= 7 * dayUs)))
        else None
      }
    }
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = purchases.groupBy(_._1).toSeq.map { case (d, ps) =>
      val n = ps.length.toLong
      val a = ps.count(_._2).toLong
      (java.time.LocalDate.ofEpochDay(d).toString, n, a,
        half(a.toDouble / n * 10000))
    }.sortBy(_._1)
    val got = graft.ext.Patterns.q190(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("q193 error monitor: replay within 1 unit; LB < rate; boundary margins hold") {
    val dayUs = 86400000000L
    val ev = graft.Tables.events(spark, sf)
      .select($"event_type", $"ts").collect()
      .map(r => ((r.getLong(1) / 1000L) / dayUs, r.getString(0) == "error"))
    val byDay = ev.groupBy(_._1).map { case (d, es) =>
      (d, es.length.toLong, es.count(_._2).toLong)
    }
    val got = graft.ext.Patterns.q193(spark, sf).collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSeq.sortBy(_._1)
    assert(got.size === byDay.size)
    val z = 1.96
    got.foreach { r =>
      val d = java.time.LocalDate.parse(r._1).toEpochDay
      val (_, n, errors) = byDay.find(_._1 == d).get
      assert(r._2 === n && r._3 === errors)
      val p = errors.toDouble / n
      val lb = (p + z * z / (2.0 * n) -
        z * math.sqrt(p * (1 - p) / n + z * z / (4.0 * n * n))) /
        (1 + z * z / n)
      assert(math.abs(r._4 - p * 10000) <= 1.0, s"rate at ${r._1}")
      assert(math.abs(r._5 - lb * 10000) <= 1.0, s"wilson at ${r._1}")
      assert(r._5 <= r._4, "LB must not exceed the point estimate")
      // margin pin only for the sqrt-bearing LB: the rate is one exact
      // integer division — bit-exact cross-engine even ON the .5 line
      assert(math.abs(math.abs(lb * 10000) % 1 - 0.5) > 1e-6,
        s"boundary margin at ${r._1}")
    }
  }

  test("q194 concentration: full driver replay is EXACT; shares are monotone") {
    val counts = graft.Tables.events(spark, sf)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, u), es) => (t, u, es.length.toLong) }
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = counts.groupBy(_._1).map { case (t, us) =>
      val xs = us.toSeq.sortBy(u => (-u._3, u._2)).map(_._3)
      val n = xs.size.toLong
      val tot = xs.sum
      def share(num: Long, den: Long) = // top ⌈n·num/den⌉ users' event share
        half(xs.take(((n * num + den - 1) / den).toInt).sum.toDouble / tot * 10000)
      (t, n, tot, share(1, 100), share(1, 20), share(1, 10))
    }.toSeq.sortBy(_._1)
    val got = graft.ext.Patterns.q194(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    got.foreach(r => assert(r._4 <= r._5 && r._5 <= r._6,
      s"shares must be monotone in the cutoff: $r"))
  }

  test("q195 conversion lag: full driver replay is EXACT") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2) / 1000L))
    val byUser = ev.groupBy(_._1)
    val viewers = byUser.flatMap { case (u, es) =>
      val vs = es.filter(_._2 == "view")
      if (vs.isEmpty) None else Some((u, vs.map(_._3).min))
    }
    val lags = viewers.toSeq.flatMap { case (u, fv) =>
      val ps = byUser(u).filter(e => e._2 == "purchase" && e._3 >= fv)
      if (ps.isEmpty) None else Some((u, ps.map(_._3).min - fv))
    }
    val sorted = lags.sortBy(l => (l._2, l._1)).map(_._2)
    val n = sorted.size
    def q(num: Int, den: Int) = sorted(((n * num + den - 1) / den) - 1)
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val row = graft.ext.Patterns.q195(spark, sf).collect().head
    assert(row.getLong(0) === viewers.size.toLong)
    assert(row.getLong(1) === n.toLong)
    assert(row.getLong(2) === half(n.toDouble / viewers.size * 10000))
    assert(row.getLong(3) === q(1, 2))
    assert(row.getLong(4) === q(9, 10))
  }

  test("q197 trigram paths: replay EXACT; conditionals sum to 1 per context") {
    val ev = graft.Tables.events(spark, sf)
      .select($"user_id", $"event_type", $"event_id", $"ts").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3) / 1000L))
    val tris = ev.groupBy(_._1).toSeq.flatMap { case (_, es) =>
      val o = es.sortBy(e => (e._4, e._3)).map(_._2)
      o.sliding(3).filter(_.size == 3).map(t => (t(0), t(1), t(2)))
    }
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val n3 = tris.groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    val n2 = tris.groupBy(t => (t._1, t._2)).map { case (c, xs) => (c, xs.length.toLong) }
    val expected = n3.toSeq.map { case ((a, b, c), m) =>
      val ctx = n2((a, b))
      (a, b, c, m, ctx, half(m.toDouble / ctx * 10000))
    }.sortBy(t => (t._1, t._2, t._3))
    val got = graft.ext.Patterns.q197(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    got.groupBy(t => (t._1, t._2)).foreach { case (ctx, rows) =>
      assert(rows.map(_._4).sum === rows.head._5, s"context mass at $ctx")
    }
  }

  test("q182 activity gini: full driver replay is EXACT; G in [0, 1)") {
    val counts = graft.Tables.events(spark, sf)
      .select($"event_type", $"user_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(identity).map { case ((t, u), es) => (t, u, es.length.toLong) }
    val expected = counts.groupBy(_._1).map { case (t, us) =>
      val xs = us.toSeq.sortBy(u => (u._3, u._2)).map(_._3)
      val n = xs.size.toLong
      val sx = xs.sum
      val rx = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val g = (2 * rx - (n + 1) * sx).toDouble / (n * sx).toDouble
      (t, n, sx, BigDecimal(g * 10000)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.ext.Patterns.q182(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
    got.foreach(r => assert(r._4 >= 0 && r._4 < 10000, s"gini out of range: $r"))
  }

  test("q231 quota resample: full integer replay; budget, shortfall, and " +
      "doc-selection determinism") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val tgtSet = graft.ext.Selection.targetSources.toSet
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select($"doc_id", $"source", $"n_chars")
        .as[(Long, String, Long)].collect().toSeq
      val budget = 300L
      val tgtHist = docs.filter(d => tgtSet(d._2))
        .groupBy(_._3 / 100).view.mapValues(_.size.toLong).toMap
      val total = tgtHist.values.sum
      val base = tgtHist.view.mapValues(c => c * budget / total).toMap
      val leftover = budget - base.values.sum
      val extras = tgtHist.toSeq
        .map { case (b, c) => (b, c * budget % total) }
        .sortBy { case (b, r) => (-r, b) }.take(leftover.toInt)
        .map(_._1).toSet
      val quota = base.map { case (b, q) =>
        b -> (q + (if (extras(b)) 1L else 0L))
      }
      assert(quota.values.sum === budget, s"quotas must land exactly at $dir")
      val rawByB = docs.filterNot(d => tgtSet(d._2)).groupBy(_._3 / 100)
      val buckets = (quota.keySet ++ rawByB.keySet).toSeq.sorted
      val expected = buckets.map { b =>
        val nRaw = rawByB.get(b).map(_.size.toLong).getOrElse(0L)
        val q = quota.getOrElse(b, 0L)
        (b, tgtHist.getOrElse(b, 0L), nRaw, q, math.min(q, nRaw))
      }
      val got = Patterns.q231(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4))).toSeq
      assert(got === expected, s"at $dir")
      // quota-bound buckets (kept == quota < raw) exist at every SF;
      // the supply-bound regime (kept == raw < quota, the shortfall
      // path) binds on the sf0.01 gate fixture — assert it there.
      assert(got.exists(r => r._5 == r._4 && r._4 < r._3), s"quota-bound at $dir")
      if (dir.endsWith("sf0.01"))
        assert(got.exists(r => r._5 == r._3 && r._3 < r._4),
          s"supply-bound at $dir")
    }
  }
}
