package graft

import java.math.{BigDecimal => JBig, RoundingMode}

/** Round-10 batch: the portable md5 sketches that replaced the
  * rows-only byte-sketch certifications (r9 verdict item 2) — exact
  * driver-side replays of the q25/q97 portable HLL and the q114
  * portable CMS, estimator-accuracy bounds vs exact counts, and the
  * q134-pattern rounding-boundary margins for the one libm chain
  * (ln in the linear-counting branch).
  */
class Round10Spec extends SparkTestBase {
  import spark.implicits._

  private def halfUp(x: Double): Long =
    new JBig(x).setScale(0, RoundingMode.HALF_UP).longValueExact()

  private def boundaryMargin(x: Double): Double = {
    val f = math.abs(x - math.floor(x))
    math.abs(f - 0.5)
  }

  private val md = java.security.MessageDigest.getInstance("MD5")
  private def md5hex(s: String): String =
    md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Driver replay of the portable HLL over a value multiset:
    * registers, exact harmonic integer, mirrored estimator. Returns
    * (nUsed, vZero, est) with est still a raw double (pre-grid).
    */
  private def hllReplay(values: Seq[String]): (Long, Long, Double) = {
    val regs = scala.collection.mutable.Map[Long, Long]()
    values.foreach { v =>
      val hx = md5hex(v)
      val reg = java.lang.Long.parseLong(hx.substring(0, 2), 16)
      val w = java.lang.Long.parseLong(hx.substring(2, 17), 16)
      val rho = if (w == 0L) 61L
        else 61L - (64 - java.lang.Long.numberOfLeadingZeros(w))
      regs(reg) = math.max(regs.getOrElse(reg, 0L), rho)
    }
    val nUsed = regs.size.toLong
    val vZero = 256L - nUsed
    val tp = regs.values.map(r => BigInt(1) << (61 - r).toInt).sum
    val t = BigInt(vZero) * (BigInt(1) << 61) + tp
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
      2305843009213693952.0 / t.toDouble
    val est = if (raw <= 640.0 && vZero > 0)
      256.0 * math.log(256.0 / vZero.toDouble)
    else raw
    (nUsed, vZero, est)
  }

  test("q25 portable HLL: exact register replay, accuracy, e2 margin") {
    for (sf <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val keys = spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_custkey".cast("string")).collect().map(_.getString(0))
      val (nUsed, vZero, est) = hllReplay(keys.toSeq)
      val got = graft.queries.Declared.q25(spark, sf).collect()
      assert(got.length == 1)
      assert(got(0).getLong(0) == nUsed)
      assert(got(0).getLong(1) == vZero)
      assert(got(0).getLong(2) == halfUp(est * 100), s"est mismatch at $sf")
      // the only libm step is ln in the linear-counting branch and the
      // final e2 grid — measure the rounding boundary (q134 pattern)
      assert(boundaryMargin(est * 100) > 1e-6,
        s"e2 grid margin razor-thin at $sf: ${est * 100}")
      // estimator sanity: m=256 HLL has ~6.5% standard error; linear
      // counting is tighter. Bind at 15%.
      val exact = keys.distinct.length.toDouble
      assert(math.abs(est - exact) / exact < 0.15,
        s"HLL estimate off by >15% at $sf: est=$est exact=$exact")
    }
  }

  test("q25/q97 exercise BOTH estimator branches across SFs") {
    // sf0.001 orders has few enough custkeys that raw <= 640 with
    // zero registers remaining → linear counting; sf0.01 clears the
    // 2.5m threshold → raw branch. Both engines take the same branch
    // on the identical double, but the spec must prove both paths run.
    def branch(sf: String): Boolean = {
      val keys = spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_custkey".cast("string")).collect().map(_.getString(0))
      val (_, vZero, _) = hllReplay(keys.toSeq)
      val regs = keys.toSeq
      val raw = {
        val (nU, vZ, _) = hllReplay(regs)
        // recompute raw directly to observe the branch condition
        val rr = scala.collection.mutable.Map[Long, Long]()
        regs.foreach { v =>
          val hx = md5hex(v)
          val reg = java.lang.Long.parseLong(hx.substring(0, 2), 16)
          val w = java.lang.Long.parseLong(hx.substring(2, 17), 16)
          val rho = if (w == 0L) 61L
            else 61L - (64 - java.lang.Long.numberOfLeadingZeros(w))
          rr(reg) = math.max(rr.getOrElse(reg, 0L), rho)
        }
        val tp = rr.values.map(r => BigInt(1) << (61 - r).toInt).sum
        val t = BigInt(256L - rr.size) * (BigInt(1) << 61) + tp
        0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
          2305843009213693952.0 / t.toDouble
      }
      raw <= 640.0 && vZero > 0
    }
    assert(branch("/root/testdata/sf0.001"),
      "sf0.001 no longer hits linear counting — branch coverage lost")
    assert(!branch("/root/testdata/sf0.01"),
      "sf0.01 no longer hits the raw branch — branch coverage lost")
  }

  test("q97 portable HLL rollup: per-priority replay + shard-merge " +
    "associativity") {
    val sf = "/root/testdata/sf0.001"
    val rows = spark.read.parquet(s"$sf/orders.parquet")
      .select($"o_orderpriority", $"o_orderstatus",
        $"o_custkey".cast("string")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
    val expected = rows.groupBy(_._1).map { case (pri, xs) =>
      val (nU, vZ, est) = hllReplay(xs.map(_._3).toSeq)
      (pri, nU, vZ, halfUp(est * 100))
    }.toSet
    val got = graft.queries.Round4.q97(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(got == expected)
    // Merge associativity: registers built per (status, priority) then
    // MAX-merged across status must equal registers built directly per
    // priority — the property that lets shards sketch independently.
    val direct = rows.groupBy(_._1).map { case (pri, xs) =>
      pri -> hllReplay(xs.map(_._3).toSeq)
    }
    val sharded = rows.groupBy(x => (x._1, x._2)).toSeq
      .flatMap { case ((pri, _), xs) => xs.map(x => (pri, x._3)) }
      .groupBy(_._1).map { case (pri, xs) =>
        pri -> hllReplay(xs.map(_._2).toSeq)
      }
    assert(direct == sharded)
    // accuracy per group
    rows.groupBy(_._1).foreach { case (pri, xs) =>
      val exact = xs.map(_._3).distinct.length.toDouble
      val est = direct(pri)._3
      assert(math.abs(est - exact) / exact < 0.15,
        s"per-priority estimate off >15% for $pri: $est vs $exact")
    }
  }

  test("covariance cells: map-side moment core == relational core " +
    "cell-for-cell at d=64 (fixture)") {
    // r9 verdict item 6: the production covCells core is now the
    // mapPartitions moment accumulator (partitions×d² shuffle rows,
    // not vectors×d²); the relational posexplode² form is the
    // SQL-expressible cross-check. Exact integers until the one
    // mirrored division ⇒ the frames must be IDENTICAL, which also
    // certifies the q309/q312 oracle transitively.
    val sf = "/root/testdata/sf0.001"
    def cells(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val fast = cells(graft.ext.Similarity.covCellsFresh(spark, sf))
    val rel = cells(graft.ext.Similarity.covCellsRelationalFresh(spark, sf))
    assert(fast.size == 64 * 64 && fast == rel)
  }

  test("covariance cells: map-side core handles synthetic d=1024 and " +
    "equals the relational core") {
    // The r9-flagged scale axis: d² = 1M cells. Deterministic synthetic
    // vectors (no RNG — affine mod grid with sign wobble), 96 vectors
    // over 4 partitions so the cross-partition decimal combine is
    // exercised, both cores cell-for-cell equal.
    val d = 1024
    val nVec = 96
    val qvRows = (0 until nVec).map { v =>
      (0 until d).map(i =>
        (((v * 31L + i * 17L + (v * i) % 7L) % 2001L) - 1000L)).toArray
    }
    val qv = spark.createDataFrame(
      spark.sparkContext.parallelize(qvRows.map(org.apache.spark.sql.Row(_)), 4),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("qv",
          org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType)))))
    val fast = graft.ext.Similarity.covCellsOf(spark, qv)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fast.size == d * d)
    // spot-equality on the relational core over a 64-dim slice of the
    // same vectors (the full d=1024 relational fan-out is exactly the
    // cost this change retires — running it once here at 96 vectors is
    // still 100M rows, so the cross-check samples instead: the shared
    // covCellify + exact moments make slice equality a full proof for
    // the arithmetic; the map-side indexing is exercised at full d by
    // the symmetric/diagonal invariants below).
    val sliceRows = qvRows.map(_.take(64))
    val qvS = spark.createDataFrame(
      spark.sparkContext.parallelize(sliceRows.map(org.apache.spark.sql.Row(_)), 4),
      qv.schema)
    val fastS = graft.ext.Similarity.covCellsOf(spark, qvS)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val relS = graft.ext.Similarity.covCellsRelationalOf(qvS)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(fastS == relS)
    // the 64-dim slice of the d=1024 run must agree with the
    // standalone 64-dim run (same vectors, same moments)
    sliceRows.head.indices.foreach { i =>
      (0 until 64).foreach { j =>
        assert(fast((i.toLong, j.toLong)) == fastS((i.toLong, j.toLong)),
          s"cell ($i,$j) differs between d=1024 and its 64-dim slice")
      }
    }
    // full-grid invariants at d=1024: symmetry and positive diagonal
    (0 until d by 97).foreach { i =>
      (0 until d by 89).foreach { j =>
        assert(fast((i.toLong, j.toLong)) == fast((j.toLong, i.toLong)))
      }
      assert(fast((i.toLong, i.toLong)) > 0L, s"zero variance at $i")
    }
  }

  test("q114 portable CMS: exact cell replay; never undercounts; " +
    "min-over-rows binds") {
    val sf = "/root/testdata/sf0.001"
    val toks = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"text").collect()
      .flatMap(r => r.getString(1).split(" ", -1).map((r.getString(0), _)))
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val cells = scala.collection.mutable.Map[(String, Long, Long), Long]()
    counts.foreach { case ((src, term), c) =>
      (0L until 4L).foreach { i =>
        val cell = java.lang.Long.parseLong(
          md5hex(s"$i:$term").substring(0, 8), 16) % 1024L
        cells((src, i, cell)) = cells.getOrElse((src, i, cell), 0L) + c
      }
    }
    val expected = counts.map { case ((src, term), _) =>
      val est = (0L until 4L).map { i =>
        val cell = java.lang.Long.parseLong(
          md5hex(s"$i:$term").substring(0, 8), 16) % 1024L
        cells((src, i, cell))
      }.min
      (src, term, est)
    }.toSet
    val got = graft.queries.Round4.q114(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    // CMS contract: est >= exact always; and the fixture vocabulary is
    // small enough that at least one term must collide in SOME row yet
    // the min-over-rows keeps every estimate within eps*N.
    got.foreach { case (src, term, est) =>
      assert(est >= counts((src, term)),
        s"CMS undercounts $src/$term")
    }
    val perSourceN = toks.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    got.foreach { case (src, term, est) =>
      val over = est - counts((src, term))
      assert(over <= math.ceil(0.004 * perSourceN(src)).toLong,
        s"overcount beyond 4/w*N for $src/$term: $over")
    }
  }
}
