package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Connected components over a pair graph — the dedup-GROUP operator a
  * production corpus pipeline runs after LSH candidate generation
  * (q65/q94 emit near-dup PAIRS; deciding which docs to keep requires
  * the transitive closure: A~B and B~C must land in ONE group even when
  * A~C was never a candidate pair).
  *
  * Algorithm: iterative min-label propagation. Every vertex starts
  * labeled with its own id; each round every vertex takes the min of
  * its own label and its neighbors' labels; converged when no label
  * changes. Each round is one equi-join shuffle + one aggregation —
  * fully distributed, never a driver-side adjacency structure.
  *
  * Scale design (100 TB): rounds needed = the graph diameter. Near-dup
  * graphs are unions of small dense clusters (diameter 2-4 in
  * practice), so the loop is a handful of shuffles regardless of corpus
  * size. Each round `localCheckpoint`s the label frame: lineage would
  * otherwise grow by two shuffles per round and replan from scratch
  * every iteration. For adversarial long-chain graphs use
  * [[connectedComponentsStar]] (large-star/small-star contraction,
  * Kiveris et al., "Connected Components in MapReduce and Beyond",
  * SoCC'14), which converges in O(log²N) rounds regardless of
  * diameter — `maxIter` guards the min-label regime and fails loudly
  * rather than silently returning partial components.
  */
object Components {

  /** @param vertices single-column frame `id` (one row per vertex)
    * @param edges two-column frame `src`,`dst` (undirected; either
    *              orientation; self-loops and duplicates tolerated)
    * @return (`id`, `comp`) where `comp` = min vertex id reachable
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 30): DataFrame = {
    // Materialize the (possibly expensive) edge derivation ONCE before
    // symmetrizing — the union references `edges` twice, which would
    // otherwise evaluate the upstream pipeline (e.g. a simhash band
    // join) twice inside one materialization.
    val e1 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val sym = e1
      .union(e1.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))

    // Label EVERY node the edges mention, not just declared vertices:
    // an edge endpoint absent from `vertices` would otherwise enter the
    // label frame with a NULL old-comp on its first appearance, the
    // null-safe change count would miss it, and the loop could converge
    // EARLY with wrong groups — silently, despite the loud-failure goal.
    var labels = vertices.select(col("id"))
      .union(e1.select(col("src").as("id")))
      .union(e1.select(col("dst").as("id")))
      .distinct()
      .select(col("id"), col("id").as("comp"))
      .localCheckpoint(true)
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      // Neighbor labels flow along each (directed) edge: dst receives
      // src's current label. The label rows carry their OWN comp as
      // `oc` through the union, so one min-agg both produces the new
      // labels AND detects change (labels only ever decrease:
      // min(comp) < max(oc) ⇔ this vertex changed) — no per-round
      // labels⋈next join. Per round: one join shuffle (on src), one
      // agg shuffle (on id), then a local scan of the checkpoint for
      // the convergence count.
      val viaNbr = sym
        .join(labels.select(col("id").as("src"), col("comp")), "src")
        .select(col("dst").as("id"), col("comp"),
          lit(null).cast("long").as("oc"))
      val next = labels.select(col("id"), col("comp"), col("comp").as("oc"))
        .union(viaNbr)
        .groupBy("id").agg(min("comp").as("comp"), max("oc").as("oc"))
        .localCheckpoint(true)
      val changed = next.filter(col("comp") < col("oc")).count()
      labels = next.select(col("id"), col("comp"))
      converged = changed == 0
      iter += 1
    }
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds — " +
        "graph diameter exceeds the bound; raise maxIter or use " +
        "connectedComponentsStar for long-chain graphs")
    labels
  }

  /** Star-contraction connected components (Kiveris et al., SoCC'14):
    * alternating large-star / small-star rounds. Large-star attaches
    * every neighbor LARGER than a vertex to the minimum of its
    * neighborhood; small-star attaches the smaller neighbors (and the
    * vertex itself) to that minimum. The pair provably converges to a
    * forest of single-level stars rooted at each component's minimum
    * id in O(log²N) rounds on ANY graph — including the path/chain
    * graphs where min-label propagation needs diameter rounds.
    *
    * Use this when the candidate graph may contain long chains
    * (e.g. transitive near-dup edges over sliding shingles);
    * [[connectedComponents]] stays the fast path for the shallow
    * dense clusters LSH actually emits (fewer shuffles per round).
    *
    * Scale shape per round: two symmetric/directed edge projections,
    * two grouped min-aggs, two equi-joins — all distributed, nothing
    * driver-side; the edge frame is `localCheckpoint`ed per round so
    * lineage stays flat. Edge counts never grow: each round's output
    * is ≤ the input edge count (contraction), so the shuffles shrink
    * as the forest flattens.
    *
    * @return (`id`, `comp`) — identical contract to
    *         [[connectedComponents]]
    */
  def connectedComponentsStar(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 50): DataFrame = {
    var e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    val allIds = vertices.select(col("id"))
      .union(e.select(col("src").as("id")))
      .union(e.select(col("dst").as("id")))
      .distinct()
      .localCheckpoint(true)

    // For each u: attach every neighbor v > u to m = min(N(u) ∪ {u}).
    def largeStar(cur: DataFrame): DataFrame = {
      val nbrs = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      val mins = nbrs.groupBy("src")
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      nbrs.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
        .distinct()
    }

    // Orient each edge large→small; for each u attach its smaller
    // neighbors (and u itself) to m = min of those neighbors.
    def smallStar(cur: DataFrame): DataFrame = {
      val dir = cur.select(
        greatest(col("src"), col("dst")).as("src"),
        least(col("src"), col("dst")).as("dst"))
      val mins = dir.groupBy("src").agg(min(col("dst")).as("m"))
      dir.join(mins, "src")
        .filter(col("dst") =!= col("m"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .union(mins.select(col("src"), col("m").as("dst")))
        .distinct()
    }

    var iter = 0
    var converged = e.isEmpty
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(true)
      // Exact fixed-point test (both sides are distinct edge sets):
      // same cardinality + empty one-sided difference ⇔ set equality.
      converged = next.count() == e.count() && next.except(e).isEmpty
      e = next
      iter += 1
    }
    require(converged,
      s"connectedComponentsStar did not converge in $maxIter rounds — " +
        "this bounds O(log²N) rounds; raise maxIter")
    // At the fixed point the edges form disjoint single-level stars:
    // every non-root vertex carries exactly one edge to its component
    // minimum; roots (and singletons) label themselves.
    allIds
      .join(e.select(col("src").as("id"), col("dst").as("comp")), Seq("id"), "left")
      .select(col("id"), coalesce(col("comp"), col("id")).as("comp"))
  }

  // ---- declared queries ---------------------------------------------------

  /** q102 — dedup groups: connected components of the simhash-band
    * near-dup candidate graph (q65's pigeonhole-complete pair set,
    * Hamming ≤ 2), labeling EVERY doc in the bounded probe set with the
    * min doc_id of its near-dup group (singletons label themselves).
    * This is the stage that turns near-dup PAIRS into keep/drop GROUPS.
    */
  private def neardupLabels(
      s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    val subset = Tables.table(s, dir, "documents").filter(col("doc_id") < 1000)
    val pairs = Dedup.simhashBandPairs(
      Dedup.simhashN(subset, col("doc_id"), col("text"), bits = 60),
      bits = 60, bands = 4, maxHamming = 2)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = connectedComponents(
      subset.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("comp").as("component"))
    (subset, labels)
  }

  def q102(s: SparkSession, dir: String): DataFrame =
    neardupLabels(s, dir)._2.orderBy("doc_id")

  /** q119 — quality-aware keep list: per near-dup component, keep the
    * BEST-quality member (ties to the lowest doc_id), not the lowest
    * id — the keep policy production dedup actually uses (a near-dup
    * group should surrender everything but its best exemplar). Composes
    * the certified q102 components with the certified q52 quality
    * score; quality is rounded BEFORE ranking (the q106 trick) so a
    * 1-ulp drift cannot flip a winner.
    */
  def q119(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val (subset, labels) = neardupLabels(s, dir)
    val quality = subset.select(col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
    val w = Window.partitionBy("component")
    labels.join(quality, "doc_id")
      .withColumn("rn",
        row_number().over(w.orderBy(col("q").desc, col("doc_id"))))
      .withColumn("members", count(lit(1)).over(w))
      .filter(col("rn") === 1)
      .select(
        col("component"), col("doc_id").as("keep_id"),
        col("q").as("keep_quality"),
        col("members").cast("long").as("members"))
      .orderBy("component")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q102_neardup_components" -> (q102 _),
    "q119_component_best"     -> (q119 _),
  )

  /** Oracle CTE chain: transitive closure by recursive CTE over the
    * SAME edge set the Spark side derives (Dedup's engine-portable
    * simhash bands). `UNION` (set semantics) dedups the frontier so the
    * walk terminates; min reachable id per start vertex = the component
    * label. Shared by the q102 and q119 oracles.
    */
  private[ext] val componentsCte: String =
    s"""${Dedup.simhashCandCte(recursive = true)},
       |pairs AS (
       |  SELECT id_a, id_b FROM cand WHERE bit_count(xor(ha, hb)) <= 2),
       |edges AS (
       |  SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION
       |  SELECT id_b AS src, id_a AS dst FROM pairs),
       |verts AS (SELECT doc_id AS id FROM documents WHERE doc_id < 1000),
       |walk AS (
       |  SELECT id AS start, id AS node FROM verts
       |  UNION
       |  SELECT wk.start, e.dst AS node
       |  FROM walk wk JOIN edges e ON e.src = wk.node),
       |comp AS (
       |  SELECT start AS doc_id, MIN(node) AS component
       |  FROM walk GROUP BY start)""".stripMargin

  private val componentsOracle: String =
    s"""$componentsCte
       |SELECT doc_id, component FROM comp ORDER BY doc_id""".stripMargin

  private val componentBestOracle: String =
    s"""$componentsCte,
       |ql AS (
       |  SELECT doc_id,
       |    ROUND((1.0 - CAST(len(list_filter(string_split(text,' '),
       |                        w -> w IN ('a','the'))) AS DOUBLE)
       |            / len(string_split(text,' ')))
       |          * LEAST(CAST(len(string_split(text,' ')) AS DOUBLE) / 50.0, 1.0),
       |          6) AS q
       |  FROM documents WHERE doc_id < 1000),
       |j AS (SELECT c.component, c.doc_id, ql.q FROM comp c JOIN ql USING (doc_id)),
       |r AS (
       |  SELECT *,
       |    ROW_NUMBER() OVER (PARTITION BY component ORDER BY q DESC, doc_id) AS rn,
       |    COUNT(*) OVER (PARTITION BY component) AS members
       |  FROM j)
       |SELECT component, doc_id AS keep_id, q AS keep_quality,
       |       CAST(members AS BIGINT) AS members
       |FROM r WHERE rn = 1 ORDER BY component""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q102_neardup_components" -> componentsOracle,
    "q119_component_best"     -> componentBestOracle,
  )
}
