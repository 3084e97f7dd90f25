package graft

import org.apache.spark.sql.functions._

import graft.ext.Components

/** Connected-components semantics on hand-built graphs (the dedup-group
  * stage that turns near-dup pairs into transitive keep/drop groups).
  */
class ComponentsSpec extends SparkTestBase {
  import spark.implicits._

  private def run(
      verts: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] =
    Components.connectedComponents(
      verts.toDF("id"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("components merge transitively; singletons label themselves") {
    // 1-2, 2-3 chain (3 must reach 1 transitively), 5-6 pair, 4 and 7 isolated
    val got = run(1L to 7L, Seq((1L, 2L), (2L, 3L), (5L, 6L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("long chain converges (multi-round propagation)") {
    // path 1-2-3-...-10: min label needs ~9 rounds to reach the far end
    val edges = (1L until 10L).map(i => (i, i + 1))
    val got = run(1L to 10L, edges)
    assert(got.values.toSet === Set(1L))
  }

  test("edge orientation, duplicates, and self-loops don't matter") {
    val got = run(
      Seq(1L, 2L, 3L),
      Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (3L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("edge endpoints absent from the vertices frame still merge correctly") {
    // vertex 1 appears only in the edge list: it must join 2's
    // component with min label 1, not converge early with {2->2}
    val got = run(Seq(2L, 3L), Seq((1L, 2L)))
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("non-convergence inside maxIter fails loudly, not partially") {
    val edges = (1L until 10L).map(i => (i, i + 1))
    val e = intercept[IllegalArgumentException] {
      Components.connectedComponents(
        (1L to 10L).toDF("id"), edges.toDF("src", "dst"), maxIter = 2)
    }
    assert(e.getMessage.contains("did not converge"))
  }

  private def runStar(
      verts: Seq[Long], edges: Seq[(Long, Long)],
      maxIter: Int = 50): Map[Long, Long] =
    Components.connectedComponentsStar(
      verts.toDF("id"), edges.toDF("src", "dst"), maxIter)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("star-contraction matches min-label on mixed graphs") {
    val verts = 1L to 7L
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L))
    assert(runStar(verts, edges) === run(verts, edges))
    assert(runStar(Seq(2L, 3L), Seq((1L, 2L))) === run(Seq(2L, 3L), Seq((1L, 2L))))
    assert(runStar(
      Seq(1L, 2L, 3L), Seq((2L, 1L), (1L, 2L), (3L, 3L), (2L, 3L), (3L, 2L)))
      === Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("star-contraction: deep path graph converges in O(log²N) rounds") {
    // path of depth 100 ≫ min-label's default 30-round bound: the
    // long-chain regime the SoCC'14 contraction exists for. maxIter 12
    // ≈ log²(100) — diameter-independent convergence, checked tightly.
    val edges = (1L until 100L).map(i => (i, i + 1))
    val got = runStar(1L to 100L, edges, maxIter = 12)
    assert(got.keySet === (1L to 100L).toSet)
    assert(got.values.toSet === Set(1L))
  }

  test("star-contraction: empty edge set labels every vertex itself") {
    assert(runStar(Seq(3L, 9L), Seq.empty) === Map(3L -> 3L, 9L -> 9L))
  }

  test("q102 labels are a valid clustering of the q65 pair set") {
    val dir = "/root/testdata/sf0.001"
    val labels = Components.q102(spark, dir)
    val pairs = graft.ext.Dedup.q65(spark, dir)
      .select($"id_a", $"id_b")
    // every candidate pair must share a component
    val split = pairs
      .join(labels.select($"doc_id".as("id_a"), $"component".as("ca")), "id_a")
      .join(labels.select($"doc_id".as("id_b"), $"component".as("cb")), "id_b")
      .filter($"ca" =!= $"cb")
    assert(split.count() === 0L)
    // component label = min doc_id within the component
    val badLabel = labels.groupBy($"component")
      .agg(min($"doc_id").as("mn"))
      .filter($"component" =!= $"mn")
    assert(badLabel.count() === 0L)
  }

  test("q249 golden record replays from the certified q102 labels") {
    val dir = "/root/testdata/sf0.001"
    val labels = Components.q102(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select($"doc_id", $"n_chars", $"source")
      .filter($"doc_id" < 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq
    val expected = docs.groupBy(d => labels(d._1)).toSeq.sortBy(_._1)
      .map { case (comp, ds) =>
        val canon = ds.minBy(d => (-d._2, d._1))
        (comp, canon._1, canon._2, ds.size.toLong,
          ds.map(_._2).sum, ds.map(_._3).distinct.size.toLong)
      }
    val got = Components.q249(spark, dir).collect().toSeq.map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(got === expected)
    // survivorship must be non-trivial: multi-member components exist,
    // and at least one canonical is NOT the min-id member (the label),
    // proving the longest-text rule actually decides.
    assert(got.exists(_._4 > 1L))
    assert(got.exists(g => g._4 > 1L && g._2 != g._1))
  }

  // ---- pageRank ---------------------------------------------------------

  private def pr(edges: Seq[(Long, Long)], iters: Int): Map[Long, Double] =
    Components.pageRank(edges.toDF("src", "dst"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pageRank: star center concentrates mass, leaves split the rest") {
    // star 1-{2,3}: after one round pr(1) = 0.15/3 + 0.85*(1/3 + 1/3)
    val one = pr(Seq((1L, 2L), (1L, 3L)), iters = 1)
    assert(math.abs(one(1L) - (0.15 / 3 + 0.85 * (2.0 / 3))) < 1e-12)
    assert(math.abs(one(2L) - (0.15 / 3 + 0.85 * (1.0 / 3) / 2)) < 1e-12)
    assert(one(2L) === one(3L))
  }

  test("pageRank: mass conserves and the symmetric pair is a fixed point") {
    // 2-node symmetric graph: pr stays 1/2 forever
    val p = pr(Seq((7L, 9L)), iters = 5)
    assert(math.abs(p(7L) - 0.5) < 1e-12 && math.abs(p(9L) - 0.5) < 1e-12)
    // 4-node path: total mass sums to 1 after any round count
    val path = pr(Seq((1L, 2L), (2L, 3L), (3L, 4L)), iters = 5)
    assert(math.abs(path.values.sum - 1.0) < 1e-9)
    // ends have lower centrality than the middle
    assert(path(1L) < path(2L) && path(4L) < path(3L))
  }

  test("q146 cleaning funnel: stages monotonically non-increasing, all present") {
    val rows = Components.q146(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(rows.map(_._2).toSeq ===
      Seq("raw", "exact_dedup", "near_dedup", "decontaminated"))
    val counts = rows.map(_._3)
    assert(counts.zip(counts.tail).forall { case (a, b) => a >= b },
      s"funnel must only shrink: ${counts.toSeq}")
    assert(counts.head > 0L)
  }

  test("pageRank: self-loops and duplicate/reversed edges don't skew degrees") {
    val base = pr(Seq((1L, 2L), (2L, 3L)), iters = 3)
    val noisy = pr(
      Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (1L, 1L), (2L, 3L)), iters = 3)
    base.foreach { case (k, v) => assert(math.abs(noisy(k) - v) < 1e-12) }
  }

  private def prw(edges: Seq[(Long, Long, Double)], iters: Int): Map[Long, Double] =
    Components.pageRankWeighted(edges.toDF("src", "dst", "w"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  test("pageRankWeighted: unit weights reproduce the unweighted walk exactly") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L))
    val a = pr(edges, iters = 4)
    val b = prw(edges.map { case (s, d) => (s, d, 1.0) }, iters = 4)
    a.foreach { case (k, v) => assert(b(k) === v, s"node $k") }
  }

  test("pageRankPersonalized: mass concentrates near seeds, conserves, fails loudly on no seeds") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val p = Components.pageRankPersonalized(edges, id => id === 1L, iterations = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // seed holds the max, the farthest node the min (strict hop-by-hop
    // monotonicity does NOT hold at finite iteration counts — path
    // graphs oscillate with walk parity — so only the endpoints are a
    // sound invariant)
    assert(p(1L) === p.values.max, p.toString)
    assert(p(4L) === p.values.min, p.toString)
    assert(math.abs(p.values.sum - 1.0) < 1e-9)
    // uniform seeds == the plain walk
    val uni = Components.pageRankPersonalized(edges, _ => lit(true), iterations = 4)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val plain = pr(Seq((1L, 2L), (2L, 3L), (3L, 4L)), iters = 4)
    plain.foreach { case (k, v) => assert(math.abs(uni(k) - v) < 1e-12) }
    val e = intercept[IllegalArgumentException] {
      Components.pageRankPersonalized(edges, id => id === 99L, iterations = 2)
    }
    assert(e.getMessage.contains("seed"))
  }

  test("pageRankWeighted: heavier edges pull rank; mass still conserves") {
    // path 1-2-3; at unit weights 2's neighbors tie. Weighting 1-2
    // 9× means node 2 sends 90% of its mass to 1: pr(1) > pr(3).
    val p = prw(Seq((1L, 2L, 9.0), (2L, 3L, 1.0)), iters = 5)
    assert(p(1L) > p(3L))
    assert(math.abs(p.values.sum - 1.0) < 1e-9)
    // duplicate + reversed edges COMBINE into the same total weight
    val split = prw(
      Seq((1L, 2L, 4.0), (2L, 1L, 5.0), (2L, 3L, 1.0)), iters = 5)
    p.foreach { case (k, v) => assert(math.abs(split(k) - v) < 1e-12) }
    // non-positive and null-free contract: w <= 0 rows are dropped
    val dropped = prw(Seq((1L, 2L, 9.0), (2L, 3L, 1.0), (7L, 8L, 0.0)), iters = 5)
    assert(!dropped.contains(7L) && !dropped.contains(8L))
  }
}
