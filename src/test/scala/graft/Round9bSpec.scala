package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.ext.{Similarity, TextAnalysis}

/** Round-9 second batch: Kneser-Ney LM scoring (q256) and the
  * diagonal-Mahalanobis outlier census (q260). Each gets a full
  * driver-side replay on the sf0.001 fixtures plus the rounding-margin
  * pins the repo's float discipline requires (CLAUDE.md: never
  * hash-compare doubles near a threshold without measuring the
  * boundary margin).
  */
class Round9bSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Spark `round(x, 0)` on a double: BigDecimal HALF_UP. */
  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  /** Distance of x to its nearest .5 rounding boundary. */
  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  // --------------------------------------------------------------- q256

  test("q256 Kneser-Ney: exact rational replay + e4 rounding margins") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 1000)
      .select($"doc_id", $"text")
      .collect().map(r => (r.getLong(0), r.getString(1)))

    // Spark's split(text, " ") keeps interior/trailing empties (limit -1).
    val bigrams = docs.map { case (id, text) =>
      val ws = text.split(" ", -1)
      (id, ws.dropRight(1).zip(ws.drop(1)).toSeq)
    }
    val tf = bigrams.flatMap { case (id, bs) => bs.map((id, _)) }
      .groupBy(identity).map { case ((id, b), g) => (id, b, g.length.toLong) }
    val cb = tf.groupBy(_._2).map { case (b, g) => b -> g.map(_._3).sum }
    val cu = cb.groupBy(_._1._1).map { case (w1, g) => w1 -> g.values.sum }
    val n1f = cb.groupBy(_._1._1).map { case (w1, g) => w1 -> g.size.toLong }
    val n1b = cb.groupBy(_._1._2).map { case (w2, g) => w2 -> g.size.toLong }
    val b = cb.size.toLong

    var minMargin = Double.MaxValue
    val expect = tf.groupBy(_._1).map { case (id, g) =>
      val nBi = g.map(_._3).sum
      val nll = g.map { case (_, bg, t) =>
        val num = (4L * cb(bg) - 3L) * b + 3L * n1f(bg._1) * n1b(bg._2)
        val den = 4L * cu(bg._1) * b
        assert(den < (1L << 52) && num < (1L << 52),
          "products must stay exactly representable as doubles")
        t * (math.log(den.toDouble) - math.log(num.toDouble))
      }.sum / nBi
      minMargin = math.min(minMargin, boundaryMargin(nll * 10000))
      id -> (nBi, halfUp(nll * 10000))
    }

    val got = TextAnalysis.q256(spark, sf)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, v) => assert(got(id) == v, s"doc $id") }
    // Measured 3.4e-5 at sf0.001 — ten orders above libm/summation drift.
    assert(minMargin > 1e-7, s"e4 rounding margin too thin: $minMargin")
    info(f"q256 min e4 boundary margin: $minMargin%.3e over ${expect.size} docs")
  }

  test("q256 discounted term stays positive for every observed bigram") {
    // (4c−3)·B + 3·n1f·n1b ≥ B + 3 > 0 whenever c ≥ 1: the KN discount
    // never zeroes an observed bigram, so ln(num) is total. Certify on
    // the real corpus: every scored doc reports a finite positive NLL
    // (degenerate docs with < 2 tokens drop out in both engines).
    val out = TextAnalysis.q256(spark, sf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getLong(1) >= 1, "scored docs carry at least one bigram")
      assert(r.getLong(2) > 0, s"doc ${r.getLong(0)}: KN NLL must be > 0")
    }
  }

  // --------------------------------------------------------------- q260

  test("q260 Mahalanobis: exact integer replay + e9 term margins") {
    val rows = spark.read.parquet(s"$sf/embeddings.parquet")
      .select($"vec_id", $"label", $"embedding")
      .collect().map { r =>
        (r.getLong(0), r.getInt(1),
          r.getSeq[Float](2).map(f =>
            halfUp(f.toDouble * 1000000d)).toArray)
      }
    val d = rows.head._3.length
    assert(rows.forall(_._3.length == d), "ragged embedding dims")

    val n = BigInt(rows.length)
    val s = Array.tabulate(d)(i => rows.map(r => BigInt(r._3(i))).sum)
    val q = Array.tabulate(d)(i =>
      rows.map(r => BigInt(r._3(i)) * BigInt(r._3(i))).sum)

    var minMargin = Double.MaxValue
    val expect = rows.map { case (id, label, xs) =>
      val terms = (0 until d).map { i =>
        val dev = n * BigInt(xs(i)) - s(i)
        val varNum = n * q(i) - s(i) * s(i)
        assert(varNum > 0, s"dim $i must have positive variance")
        val t = (dev * dev).doubleValue / varNum.doubleValue * 1e9
        minMargin = math.min(minMargin, boundaryMargin(t))
        halfUp(t)
      }
      val m = terms.sum
      (id, (label.toLong, m, if (m > 2L * d * 1000000000L) 1L else 0L))
    }.toMap

    val got = Similarity.q260(spark, sf)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet == expect.keySet)
    expect.foreach { case (id, v) => assert(got(id) == v, s"vec $id") }
    assert(minMargin > 1e-7, s"e9 term margin too thin: $minMargin")
    info(f"q260 min e9 term margin: $minMargin%.3e over ${rows.length * d} terms")
  }

  // --------------------------------------------------------------- q257

  test("q257 Fellegi-Sunter: record-pair conservation + JW grid margins") {
    import graft.ext.Similarity
    val prof = spark.read.parquet(s"$sf/part.parquet")
      .groupBy($"p_name", $"p_brand", $"p_type", $"p_size")
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", split($"p_name", " ").getItem(1))
      .collect().map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getInt(3), r.getLong(4), r.getString(5)))

    // Conservation: Σ n_record_pairs across decisions must equal the
    // number of cross-profile record pairs inside each block,
    // (T² − Σ cnt²)/2 summed over blocks — profiles collapse loses
    // no pair and invents none.
    val expectPairs = prof.groupBy(_._6).map { case (_, g) =>
      val t = g.map(_._5).sum
      (t * t - g.map(c => c._5 * c._5).sum) / 2
    }.sum
    val out = graft.ext.Dedup.q257(spark, sf).collect()
    assert(out.map(_.getLong(3)).sum == expectPairs,
      "record pairs must be conserved across decisions")
    // Decisions respect the thresholds they claim.
    out.foreach { r =>
      val (dec, lo, hi) = (r.getString(1), r.getLong(4), r.getLong(5))
      dec match {
        case "match"    => assert(lo >= 5000000L)
        case "possible" => assert(lo >= 0L && hi < 5000000L)
        case "nonmatch" => assert(hi < 0L)
      }
    }
    // JW e6 grid margins for every blocked name pair (the q252
    // pattern, on q257's noun-token blocks).
    val names = prof.map(p => (p._6, p._1)).distinct
    val jwMargins = for {
      (w1, n1) <- names; (w2, n2) <- names
      if w1 == w2 && n1 < n2
    } yield {
      val jw = spark.range(1).select(
        graft.ops.JaroWinkler(lit(n1), lit(n2)).as("j"))
        .head().getDouble(0)
      math.min(boundaryMargin(jw * 1000000),
        math.abs(jw * 1000000 - 880000) match { case d => if (d == 0) 0.5 else d })
    }
    val m = jwMargins.min
    assert(m > 1e-4, s"JW e6 grid margin too thin: $m")
    info(f"q257 min JW margin (grid/threshold): $m%.4f over ${jwMargins.size} pairs")
  }

  test("q257 pair orientation: hash order ≡ key order, JW symmetric") {
    // r18: the fan-out's pair orientation moved from the concat-key
    // string compare (`ka < kb`) to an xxhash64-first strict total
    // order. Any strict total order gives the same unordered census
    // ONLY IF every per-pair term is orientation-free — the three
    // field comparisons are trivially symmetric; JW symmetry is an
    // implementation property, pinned here bit-for-bit over every
    // blocked name pair (the oracle evaluates DuckDB's JW in ITS
    // k-orientation, so an asymmetric graft JW would diverge exactly
    // on the pairs the hash order flips).
    val names = spark.read.parquet(s"$sf/part.parquet")
      .select(split($"p_name", " ").getItem(1).as("w"), $"p_name".as("n"))
      .distinct()
    val asym = names.as("x").join(names.as("y"), "w")
      .filter($"x.n" < $"y.n")
      .select(graft.ops.JaroWinkler($"x.n", $"y.n").as("fwd"),
        graft.ops.JaroWinkler($"y.n", $"x.n").as("rev"))
      .filter($"fwd" =!= $"rev")
      .count()
    assert(asym == 0L, s"JaroWinkler asymmetric on $asym blocked name pairs")

    // Census equality: the shipped q257 (hash orientation) must equal
    // the pre-r18 key orientation row for row.
    val prof = spark.read.parquet(s"$sf/part.parquet")
      .groupBy($"p_name".as("name"), $"p_brand".as("brand"),
        $"p_type".as("ptype"), $"p_size".as("size"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", split($"name", " ").getItem(1))
      .withColumn("k", concat_ws("|", $"name", $"brand", $"ptype", $"size"))
    val a = prof.select($"w", $"k".as("ka"), $"name".as("na"),
      $"brand".as("ba"), $"ptype".as("ta"), $"size".as("sa"), $"cnt".as("ca"))
    val b = prof.select($"w", $"k".as("kb"), $"name".as("nb"),
      $"brand".as("bb"), $"ptype".as("tb"), $"size".as("sb"), $"cnt".as("cb"))
    val nm = prof.select($"w", $"name").distinct()
    val jwAgree = nm.select($"w", $"name".as("na"))
      .join(nm.select($"w", $"name".as("nb")), "w")
      .select($"na", $"nb",
        (graft.ext.Similarity.intScaled(
          graft.ops.JaroWinkler($"na", $"nb"), 1000000L) >= 880000L)
          .as("jw_agree"))
    val weight =
      when($"jw_agree", 2890372L).otherwise(-2251292L) +
        when($"ba" === $"bb", 3167583L).otherwise(-2954910L) +
        when($"ta" === $"tb", 1386294L).otherwise(-1386294L) +
        when(abs($"sa" - $"sb") <= 2, 2140066L).otherwise(-1791759L)
    val legacy = a.join(b, "w")
      .filter($"ka" < $"kb")
      .join(broadcast(jwAgree), Seq("na", "nb"))
      .select($"w", weight.as("wt"), ($"ca" * $"cb").as("rec_pairs"))
      .withColumn("decision",
        when($"wt" >= 5000000L, "match")
          .when($"wt" >= 0L, "possible")
          .otherwise("nonmatch"))
      .groupBy($"w", $"decision")
      .agg(count(lit(1)).as("n_profile_pairs"),
        sum($"rec_pairs").as("n_record_pairs"),
        min($"wt").as("min_wt"), max($"wt").as("max_wt"))
      .orderBy("w", "decision")
      .collect().toSeq
    val shipped = graft.ext.Dedup.q257(spark, sf).collect().toSeq
    assert(shipped == legacy, "hash-order census must equal key-order census")
  }

  // --------------------------------------------------------------- q258

  /** BigInt replay of [[graft.ext.Curation.bhFdr]]: Cantelli rationals,
    * the IEEE-quotient + key order, the exact step-up predicate.
    * Returns per-cell (rank, p_e9, rejected) plus kmax.
    */
  private def bhReplay(o: Map[(String, Long), BigInt])
      : (Map[(String, Long), (Long, Long, Long)], Int) = {
    val rTot = o.groupBy(_._1._1).map { case (k, g) => k -> g.values.sum }
    val cTot = o.groupBy(_._1._2).map { case (k, g) => k -> g.values.sum }
    val n = o.values.sum
    val m = BigInt(o.size)
    val ordered = o.keys.toSeq.map { case k @ (t, d) =>
      val rc = rTot(t) * cTot(d)
      val no = n * o(k)
      val (num, den) =
        if (no > rc) (rc * n, rc * n + (no - rc) * (no - rc))
        else (BigInt(1), BigInt(1))
      (k, num, den, num.doubleValue / den.doubleValue)
    }.sortBy { case ((t, d), _, _, p) => (p, t, d) }.zipWithIndex
    val kmax = ordered.collect {
      case ((_, num, den, _), i) if num * 4 * m <= den * BigInt(i + 1) => i + 1
    }.lastOption.getOrElse(0)
    (ordered.map { case ((k, _, _, p), i) =>
      k -> (i + 1L, halfUp(p * 1e9), if (i + 1 <= kmax) 1L else 0L)
    }.toMap, kmax)
  }

  test("q258 BH-FDR: exact rational replay of rank, kmax and rejections") {
    val cells = graft.ext.Curation.q258(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // Recompute p exactly from the cell counts the query itself
    // reports (o per (type, dow) is ground truth by q205/q247's
    // certified grid) and re-run BH with BigInt rationals.
    val o = cells.map { case (t, d, ob, _, _, _) => ((t, d), BigInt(ob)) }.toMap
    val (expect, kmax) = bhReplay(o)
    cells.foreach { case (t, d, _, rank, pE9, rej) =>
      assert(expect((t, d)) == (rank, pE9, rej), s"cell ($t, $d)")
    }
    // BH's defining shape: the rejected set is exactly ranks 1..kmax
    // (empty on this fixture — its events are dow-independent, so a
    // conservative bound rejecting ANYTHING would be the bug; the
    // binding case is proven on the injected-signal frame below).
    val rejRanks = cells.filter(_._6 == 1L).map(_._4).sorted.toSeq
    assert(rejRanks == (1L to kmax.toLong))
    info(s"q258: m=${o.size} cells, kmax=$kmax rejected")
  }

  test("q258 bhFdr core: rejection binds on an injected dow signal") {
    // 10 types × 7 dows, flat 1000 everywhere except one heavily
    // enriched cell — BH must reject it and nothing else, and the
    // engine must agree with the BigInt replay cell-for-cell.
    val rows = for {
      t <- 0 until 10; d <- 0L until 7L
    } yield (s"type_$t", d, if (t == 3 && d == 2) 9000L else 1000L)
    val cells = rows.toDF("event_type", "dow", "o")
    val got = graft.ext.Curation.bhFdr(cells).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    val (expect, kmax) = bhReplay(
      rows.map { case (t, d, o) => ((t, d), BigInt(o)) }.toMap)
    assert(kmax >= 1, "the injected signal must be rejected")
    assert(got.keySet == expect.keySet)
    expect.foreach { case (k, v) => assert(got(k) == v, s"cell $k") }
    assert(got(("type_3", 2L))._3 == 1L, "the enriched cell is rejected")
    assert(got.values.count(_._3 == 1L) == kmax)
    info(s"q258 synthetic: kmax=$kmax of ${rows.size} cells rejected")
  }

  // --------------------------------------------------------------- q259

  test("q259 mutual-kNN: window-form replay + mutuality + rank-5/6 margins") {
    import graft.ext.Similarity
    import org.apache.spark.sql.expressions.Window
    val planes = Similarity.hyperplanes(8, 64)
    val unit = Similarity.withUnitVec(
      spark.read.parquet(s"$sf/embeddings.parquet"), "embedding", "u")
      .select($"vec_id", $"u", Similarity.signature($"u", planes).as("sig"))
    val a = unit.select($"sig", $"vec_id".as("aid"), $"u".as("au"))
    val b = unit.select($"sig", $"vec_id".as("bid"), $"u".as("bu"))
    val sims = a.join(b, "sig").filter($"aid" =!= $"bid")
      .select($"aid", $"bid", Similarity.dot($"au", $"bu").as("sim"))
    // Independent top-5 formulation: window row_number, not the heap.
    val w = Window.partitionBy("aid").orderBy($"sim".desc, $"bid")
    val tops = sims.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 5).select($"aid", $"bid", $"sim")
    val expect = tops.as("x").join(tops.as("y"),
        $"x.aid" === $"y.bid" && $"x.bid" === $"y.aid")
      .filter($"x.aid" < $"x.bid")
      .select($"x.aid", $"x.bid",
        round($"x.sim" * 100, 0).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val got = Similarity.q259(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == expect, "heap and window formulations must agree")
    assert(got.nonEmpty, "the synthetic corpus plants near-dups — pairs exist")
    // Rank-5/6 sim gap per vector: the margin that keeps top-5
    // membership stable under cross-engine float drift.
    val gaps = sims.withColumn("rn", row_number().over(w))
      .filter($"rn" === 5 || $"rn" === 6)
      .groupBy($"aid").agg((max($"sim") - min($"sim")).as("gap"),
        count(lit(1)).as("k"))
      .filter($"k" === 2).select("gap")
      .collect().map(_.getDouble(0))
    val minGap = if (gaps.isEmpty) 1.0 else gaps.min
    assert(minGap > 1e-9, s"rank-5/6 gap too thin: $minGap")
    info(f"q259 min rank-5/6 sim gap: $minGap%.3e over ${gaps.length} vectors")
  }

  // --------------------------------------------------------------- q261

  test("q261 blocking audit: brute-force ground-truth replay") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
      .filter($"doc_id" < 300)
      .select($"doc_id", $"text", $"n_chars")
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ", -1).toSet, r.getLong(2) / 100))
    val n = d.length.toLong
    val pairs = for {
      i <- d.indices; j <- (i + 1) until d.length
    } yield (d(i), d(j))
    val truth = pairs.filter { case ((_, ta, _), (_, tb, _)) =>
      val inter = (ta & tb).size
      2L * inter >= ta.size + tb.size - inter
    }
    val caught = truth.count { case ((_, _, ba), (_, _, bb)) => ba == bb }
    val cand = d.groupBy(_._3).map { case (_, g) =>
      g.length.toLong * (g.length - 1) / 2 }.sum
    val total = n * (n - 1) / 2
    val row = graft.ext.Dedup.q261(spark, sf).head()
    assert(row.getLong(0) == n && row.getLong(1) == total)
    assert(row.getLong(2) == truth.size.toLong, "truth pairs")
    assert(row.getLong(3) == cand, "candidate pairs")
    assert(row.getLong(4) == caught.toLong, "caught pairs")
    assert(row.getLong(5) ==
      halfUp(caught.toDouble / truth.size * 10000))
    assert(row.getLong(6) ==
      halfUp((1.0 - cand.toDouble / total) * 10000))
    // The audit must measure something: truth exists, blocking prunes.
    assert(truth.nonEmpty && cand < total)
    info(s"q261: ${truth.size} truth pairs, $caught caught, $cand candidates")
  }

  // --------------------------------------------------------------- q262

  test("q262 seasonal decomposition: exact sevenths replay + e2 margins") {
    val daily = spark.read.parquet(s"$sf/orders.parquet")
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
        .cast("long").as("day"), $"o_totalprice")
      .collect().map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    val d0 = daily.keys.min
    val d1 = daily.keys.max
    val grid = (d0 to d1).map(d => d -> daily.getOrElse(d, 0L)).toArray
    val rows = (3 until grid.length - 3).map { i =>
      val (day, r) = grid(i)
      val s7 = (i - 3 to i + 3).map(grid(_)._2).sum
      ((day + 4) % 7, 7L * r - s7)
    }
    var minMargin = Double.MaxValue
    val expect = rows.groupBy(_._1).map { case (dow, g) =>
      val s = g.map(_._2).sum
      val mean = s.toDouble / (7.0 * g.length) * 100
      minMargin = math.min(minMargin, boundaryMargin(mean))
      dow -> (g.length.toLong, s, g.count(_._2 > 0).toLong,
        g.map(_._2).min, g.map(_._2).max, halfUp(mean))
    }
    val got = graft.ext.Robust.q262(spark, sf).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toMap
    assert(got.keySet == expect.keySet && got.keySet == (0L to 6L).toSet)
    expect.foreach { case (dow, v) => assert(got(dow) == v, s"dow $dow") }
    assert(minMargin > 1e-6, s"e2 margin too thin: $minMargin")
    // Seasonal means must roughly cancel (Σ detr over full weeks ≈ 0
    // is NOT exact — edges differ — but signs must vary for a real
    // weekly shape unless the series is flat).
    info(f"q262 min e2 boundary margin: $minMargin%.3e")
  }

  /** q246/q262 shared decimal(18,2)→cents semantics. */
  private def cents(x: Double): Long =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  test("q260 outlier flag binds: both classes present and census sane") {
    val out = Similarity.q260(spark, sf).collect()
    val flags = out.map(_.getLong(3)).toSeq
    // The threshold 2d must actually separate: E[maha²] = d for
    // multivariate data, so most rows sit below 2d and genuine tails
    // sit above. A constant column would mean the flag never binds.
    assert(flags.contains(0L), "no inliers — threshold not binding")
    assert(out.length == 500)
    // maha² sums are positive and dominated by d·(n/(n−1))-scale mass.
    assert(out.forall(_.getLong(2) > 0))
  }
}
