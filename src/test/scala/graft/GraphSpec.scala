package graft

import org.apache.spark.sql.functions._

import graft.ext.Graph

/** HITS / triangle / assortativity semantics on hand-built graphs plus
  * the sf0.001 testdata fixtures.
  */
class GraphSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def hitsMap(
      edges: Seq[(Long, Long)], iters: Int): Map[(Long, String), Double] =
    Graph.hits(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => (r.getLong(0), r.getString(1)) -> r.getDouble(2))
      .toMap

  test("hits: two-round bipartite fixture matches hand computation") {
    // 1→2, 1→4, 3→4. h0 = (.5, .5).
    // round 1: a_raw = (2:.5, 4:1) → a = (1/3, 2/3); h_raw = (1:1, 3:2/3)
    //          → h = (3/5, 2/5)
    // round 2: a_raw = (2:.6, 4:1) → a = (.375, .625);
    //          h_raw = (1:1, 3:.625) → h = (8/13, 5/13)
    val got = hitsMap(Seq((1L, 2L), (1L, 4L), (3L, 4L)), iters = 2)
    assert(math.abs(got((1L, "hub")) - 8.0 / 13) < 1e-12)
    assert(math.abs(got((3L, "hub")) - 5.0 / 13) < 1e-12)
    assert(math.abs(got((2L, "auth")) - 0.375) < 1e-12)
    assert(math.abs(got((4L, "auth")) - 0.625) < 1e-12)
  }

  test("hits: L1 mass conserves per role; complete bipartite is uniform") {
    val got = hitsMap(Seq((1L, 10L), (1L, 11L), (2L, 10L), (2L, 11L)), iters = 3)
    got.foreach { case (_, s) => assert(math.abs(s - 0.5) < 1e-12) }
    val path = hitsMap(Seq((1L, 2L), (1L, 4L), (3L, 4L), (3L, 6L)), iters = 4)
    Seq("hub", "auth").foreach { role =>
      val mass = path.collect { case ((_, r), s) if r == role => s }.sum
      assert(math.abs(mass - 1.0) < 1e-9, s"$role mass drifted: $mass")
    }
  }

  test("hits: duplicate and self-loop edges are ignored; empty fails loudly") {
    val clean = hitsMap(Seq((1L, 2L), (1L, 4L), (3L, 4L)), iters = 2)
    val dirty = hitsMap(
      Seq((1L, 2L), (1L, 2L), (1L, 4L), (3L, 4L), (3L, 3L)), iters = 2)
    assert(clean === dirty)
    val ex = intercept[IllegalArgumentException] {
      Graph.hits(Seq((5L, 5L)).toDF("src", "dst"), iterations = 1).collect()
    }
    assert(ex.getMessage.contains("empty edge set"))
  }

  private def triMap(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Graph.triangleCounts(edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("triangles: K4 puts every node in 3; pendant node sees none") {
    val k4 = for (a <- 1L to 4L; b <- (a + 1) to 4L) yield (a, b)
    val got = triMap(k4 :+ (1L, 5L))
    assert(got === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("triangles: orientation, duplicates, and self-loops don't matter") {
    val base = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 1L), (1L, 1L))
    assert(triMap(base) === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
    assert(triMap(messy) === triMap(base))
  }

  test("triangles: degree-oriented equals canonical enumeration on real data") {
    // The q150 graph at sf0.001 — the equivalence the oracle leans on.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.select(col("o"), col("p").as("src"))
      .join(li.select(col("o"), col("p").as("dst")), "o")
      .filter(col("src") < col("dst"))
      .select("src", "dst")
    val fast = Graph.triangleCounts(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val canon = Graph.triangleCountsCanonical(edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fast.nonEmpty, "sf0.001 part co-order graph has no triangles")
    assert(fast === canon)
  }

  test("assortativity: star is exactly -1; moments are the exact integers") {
    val row = Graph.degreeAssortativity(
      Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("src", "dst")).collect().head
    // symmetrized ends: (3,1)×3 and (1,3)×3
    assert(row.getLong(0) === 6L)   // n_ends
    assert(row.getLong(1) === 12L)  // s_x
    assert(row.getLong(2) === 30L)  // s_xx
    assert(row.getLong(3) === 18L)  // s_xy
    assert(row.getLong(4) === -1000000L)
  }

  private def lp(edges: Seq[(Long, Long)], topN: Int = 10, cap: Int = 1000) =
    Graph.linkPrediction(edges.toDF("src", "dst"), topN, cap)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))

  test("linkPrediction: path and square fixtures match hand computation") {
    // path 1-2-3: only candidate (1,3), cn=1 through z=2 (deg 2)
    val path = lp(Seq((1L, 2L), (2L, 3L)))
    assert(path === Array((1L, 3L, 1L, math.round(1e6 / math.log(2)))))
    // 4-cycle: diagonals (1,3),(2,4) each with cn=2, aa=2/ln 2
    val square = lp(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    val aa2 = math.round(2e6 / math.log(2))
    assert(square === Array((1L, 3L, 2L, aa2), (2L, 4L, 2L, aa2)))
  }

  test("linkPrediction: packed pair agg equals the two-column fallback") {
    // r17: ids that fit the (maxId+1)² < 2⁶³ bound ride a single-long
    // packed pair key through the wedge agg; ids beyond it keep the
    // two-column groupBy. Shifting every id by an offset that pushes
    // maxId past the pack bound must flip the code path WITHOUT
    // changing any cn (integer) — and the aa doubles are sums of the
    // same 1/ln(deg) terms, so they agree exactly here (one term per
    // common neighbor on these fixtures' scale, far from any e6 edge).
    val base = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 5L), (5L, 3L))
    val off = 4000000000L // maxId+1 > 3037000499 → fallback path
    val packed = lp(base)
    val shifted = Graph.linkPrediction(
      base.map { case (a, b) => (a + off, b + off) }.toDF("src", "dst"),
      topN = 10, degCap = 1000)
      .collect()
      .map(r => (r.getLong(0) - off, r.getLong(1) - off,
        r.getLong(2), r.getLong(3)))
    assert(packed.nonEmpty && (packed.toSeq === shifted.toSeq))
  }

  test("linkPrediction: non-integral id types take the two-column path") {
    // r17 ADVICE: string ids give LEXICOGRAPHIC min/max before the
    // cast (null here, since strings don't cast), and float ids
    // truncate — the packable gate must reject both rather than pack
    // with an understated stride. Path x-y-z: one candidate (x, z).
    val viaStr = Graph.linkPrediction(
      Seq(("x", "y"), ("y", "z")).toDF("src", "dst"), topN = 10, degCap = 1000)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    assert(viaStr.toSeq === Seq(("x", "z", 1L)))
    val viaDouble = Graph.linkPrediction(
      Seq((1.5, 2.5), (2.5, 3.5)).toDF("src", "dst"), topN = 10, degCap = 1000)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getLong(2)))
    assert(viaDouble.toSeq === Seq((1.5, 3.5, 1L)))
  }

  test("linkPredictionFrom: canonical entry equals the canonicalizing one") {
    // r18: q153 feeds the co-order pair projection (canonical by
    // construction — a < b groupBy keys) through linkPredictionFrom,
    // which skips the distinct Exchange. Equality on the real fixture
    // graph, bounded exactly like q153.
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val canon = li.select(col("o"), col("p").as("a"))
      .join(li.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b")).select("a", "b").distinct()
      .filter(col("a") < 10000 && col("b") < 10000)
    val viaFrom = Graph.linkPredictionFrom(canon, topN = 500, degCap = 1000)
      .collect().toSeq
    val viaCanon = Graph.linkPrediction(
      canon.select(col("a").as("src"), col("b").as("dst")),
      topN = 500, degCap = 1000).collect().toSeq
    assert(viaFrom.nonEmpty && viaFrom === viaCanon)
  }

  test("linkPrediction: adjacent pairs are excluded; degCap drops hub wedges") {
    // K3: every pair is an edge — nothing to predict
    assert(lp(Seq((1L, 2L), (2L, 3L), (3L, 1L))).isEmpty)
    // star 0-{1..5}: all wedges go through the deg-5 hub; cap 4 kills them
    val star = (1L to 5L).map(i => (0L, i))
    assert(lp(star).length === 10) // C(5,2) leaf pairs via the hub
    assert(lp(star, cap = 4).isEmpty)
  }

  test("q153 adamic-adar: e6 rounding-boundary margin dwarfs summation drift") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val edges = li.select(col("o"), col("p").as("src"))
      .join(li.select(col("o"), col("p").as("dst")), "o")
      .filter(col("src") < col("dst")).select("src", "dst")
    // Recompute the top-500's raw aa doubles (same plan minus scaling)
    val raw = Graph.linkPrediction(edges, topN = 500, degCap = 1000)
      .collect().map(_.getLong(3).toDouble)
    assert(raw.length === 500)
    // The scaled values were produced from doubles upstream; measure
    // the margin on a fresh unscaled run for the same ranking
    val margins = {
      import org.apache.spark.sql.functions.{log => ln}
      val e = edges.filter(col("src") =!= col("dst"))
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b")).distinct()
      val sym = e.select(col("a").as("z"), col("b").as("n"))
        .unionAll(e.select(col("b").as("z"), col("a").as("n")))
      val zw = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") >= 2 && col("deg") <= 1000)
        .select(col("z"), (lit(1.0) / ln(col("deg"))).as("w"))
      val wz = sym.join(zw, "z")
      // Only the top-500 rows are hashed — measure the margin there
      // (the full candidate population's min margin shrinks as 1/N and
      // is irrelevant to the output contract).
      wz.select(col("z"), col("n").as("x"), col("w"))
        .join(wz.select(col("z"), col("n").as("y")), "z")
        .filter(col("x") < col("y"))
        .groupBy(col("x"), col("y"))
        .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
        .join(e, col("x") === col("a") && col("y") === col("b"), "left_anti")
        .orderBy(col("cn").desc, col("x"), col("y"))
        .limit(500)
        .collect().map(r => math.abs((r.getDouble(3) * 1e6) % 1 - 0.5))
    }
    assert(margins.min > 1e-4, s"boundary margin collapsed: ${margins.min}")
  }

  private def sd(edges: Seq[(Long, Long)], seeds: Set[Long], depth: Int = 6) =
    Graph.seedDistance(edges.toDF("src", "dst"),
      id => id.isin(seeds.toSeq: _*), maxDepth = depth)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("seedDistance: path distances, depth bound, and multi-seed min") {
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    assert(sd(path, Set(1L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // depth 2: nodes beyond 2 hops are ABSENT, not sentinel-valued
    assert(sd(path, Set(1L), depth = 2) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    // two seeds: every node takes the nearer one
    assert(sd(path, Set(1L, 5L)) ===
      Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 0L))
  }

  test("seedDistance: orientation/dup immunity and loud no-seed failure") {
    val messy = Seq((2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
    assert(sd(messy, Set(1L)) === Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
    val ex = intercept[IllegalArgumentException] {
      sd(Seq((1L, 2L)), Set(9L))
    }
    assert(ex.getMessage.contains("no seed node"))
  }

  test("q149 hits: e6 rounding-boundary margin dwarfs summation drift") {
    // Same discipline as the q134 margin pin: scores are quotients of
    // order-dependent double sums (~1e-15 relative drift), so every
    // scaled score must sit well away from the .5 rounding boundary.
    val scores = Graph.hits(
      spark.read.parquet(s"$sf/orders.parquet")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(spark.read.parquet(s"$sf/lineitem.parquet")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("l_orderkey") === col("o_orderkey"))
        .select((col("o_custkey") * 2).as("src"),
          (col("l_suppkey") * 2 + 1).as("dst")),
      iterations = 4)
      .collect().map(_.getDouble(2))
    val margins = scores.map(s => math.abs((s * 1e6) % 1 - 0.5))
    assert(margins.min > 1e-4, s"boundary margin collapsed: ${margins.min}")
  }

  test("q171 clustering coefficient: consistent with its own tri/deg columns") {
    // The coefficient column must be the exact-integer division of the
    // n_tri/deg columns it rides with (validates the scale+round path),
    // with NULL exactly on wedge-free nodes.
    val rows = Graph.q171(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (deg, tri) = (r.getLong(1), r.getLong(2))
      if (deg < 2) assert(r.isNullAt(3), s"deg<2 must be NULL: $r")
      else {
        val cc = r.getLong(3)
        assert(cc >= 0 && cc <= 10000, s"coefficient out of range: $r")
        assert(cc === BigDecimal(2.0 * tri / (deg * (deg - 1)) * 10000)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"mismatch: $r")
        // a triangle needs two wedge legs at each corner
        assert(tri <= deg * (deg - 1) / 2, s"tri exceeds wedge bound: $r")
      }
    }
  }

  test("q198 kcore: full driver peel replay is EXACT and the peel binds") {
    val edges = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/lineitem.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("s"), (col("l_suppkey") * 2 + 1).as("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .map { case (s, d) => (math.min(s, d), math.max(s, d)) }.distinct
    var cur = edges
    var rounds = 0
    var done = false
    while (!done) {
      val deg = (cur.map(_._1) ++ cur.map(_._2))
        .groupBy(identity).map { case (n, xs) => (n, xs.length) }
      val low = deg.filter(_._2 < 5).keySet
      if (low.isEmpty) done = true
      else { cur = cur.filter(e => !low(e._1) && !low(e._2)); rounds += 1 }
    }
    assert(rounds >= 1, "5-core peel must bind on this data")
    assert(rounds <= 4, s"oracle unroll headroom exceeded: $rounds rounds")
    val expected = (cur.map(_._1) ++ cur.map(_._2))
      .groupBy(identity).map { case (n, xs) => (n, xs.length.toLong) }
      .toSeq.sorted
    val got = SparkEntry.queries("q198_kcore")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    got.foreach(r => assert(r._2 >= 5, s"fixpoint violated: $r"))
  }

  test("kCore: path graph peels to empty at k=2; clique survives intact; cascade") {
    // path 1-2-3-4-5: endpoints peel first, cascade empties the graph
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("src", "dst")
    assert(Graph.kCore(path, k = 2, maxIter = 10).count() === 0L)
    // K4 plus a pendant: pendant peels, the clique survives with deg 3
    val k4 = (for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
    val g = (k4 :+ (4L, 9L)).toDF("src", "dst")
    val core = Graph.kCore(g, k = 3, maxIter = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted
    assert(core.toSeq === Seq((1L, 3L), (2L, 3L), (3L, 3L), (4L, 3L)))
    // non-convergence throws loudly
    val long = (1L to 40L).sliding(2).map(p => (p(0), p(1))).toSeq
      .toDF("src", "dst")
    intercept[IllegalArgumentException] {
      Graph.kCore(long, k = 2, maxIter = 3).count()
    }
  }
}
