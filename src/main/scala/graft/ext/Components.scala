package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Warm-start connected components: seed the min-label loop with a
    * PERSISTED prior labeling instead of self-labels — the incremental
    * form (yesterday's labeling + today's new edges converge in a few
    * rounds instead of from scratch). Correctness is an invariant, not
    * an approximation: prior labels are min ids WITHIN old components,
    * old components only ever MERGE under added edges, so min-label
    * propagation from the seeded state reaches the same unique
    * fixpoint (the merged component's min id) as a cold run — q415
    * certifies warm ≡ cold ≡ the recursive-CTE oracle. Nodes absent
    * from `initial` (new arrivals) default to self-labels.
    *
    * @param initial (`id`, `comp`) — a prior labeling over any
    *                SUBGRAPH of the current graph
    */
  def connectedComponentsWarm(
      vertices: DataFrame,
      edges: DataFrame,
      initial: DataFrame,
      maxIter: Int = 30,
      loopShufflePartitions: Option[Int] = None): DataFrame =
    connectedComponents(vertices, edges, maxIter, loopShufflePartitions,
      initial = Some(initial))

  /** @param vertices single-column frame `id` (one row per vertex)
    * @param edges two-column frame `src`,`dst` (undirected; either
    *              orientation; self-loops and duplicates tolerated)
    * @param loopShufflePartitions when set, `spark.sql.shuffle.partitions`
    *              is scoped DOWN to this value for the duration of the
    *              label loop (restored after). The label frame is tiny
    *              relative to the corpus (one row per candidate vertex,
    *              not per document), so the default session partitioning
    *              — sized for full-corpus shuffles — makes each round pay
    *              a fixed scheduling cost per empty partition. At 100 TB
    *              leave this None (or size it to the candidate-graph
    *              vertex count / target partition size), never to the
    *              corpus size.
    * @return (`id`, `comp`) where `comp` = min vertex id reachable
    */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 30,
      loopShufflePartitions: Option[Int] = None,
      initial: Option[DataFrame] = None): DataFrame = {
    // Materialize the (possibly expensive) edge derivation ONCE before
    // symmetrizing — the union references `edges` twice, which would
    // otherwise evaluate the upstream pipeline (e.g. a simhash band
    // join) twice inside one materialization.
    val e1 = edges.select(col("src"), col("dst")).localCheckpoint(true)
    val spark = vertices.sparkSession
    val sessionShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    loopShufflePartitions.foreach(n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString))
    // The symmetrized edge frame is scanned EVERY round. Unioning the
    // checkpoint with its flip doubles its partition count (2 × the
    // band-join's shuffle width), so each round would schedule ~2×W map
    // tasks for a frame of a few thousand rows. In scoped mode, shrink
    // it to the loop width once and checkpoint — per-round jobs then
    // touch a handful of cached partitions.
    val sym0 = e1
      .union(e1.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
    // Pre-partition by the per-round join key: the checkpoint's
    // LogicalRDD keeps its HashPartitioning(src), so every round's
    // sym⋈labels join exchanges ONLY the (small) label side — the edge
    // frame is never re-shuffled inside the loop.
    val sym = loopShufflePartitions
      .map(n => sym0.repartition(n, col("src")).localCheckpoint(true))
      .getOrElse(sym0)

    // Label EVERY node the edges mention, not just declared vertices:
    // an edge endpoint absent from `vertices` would otherwise enter the
    // label frame with a NULL old-comp on its first appearance, the
    // null-safe change count would miss it, and the loop could converge
    // EARLY with wrong groups — silently, despite the loud-failure goal.
    val allIds = vertices.select(col("id"))
      .union(e1.select(col("src").as("id")))
      .union(e1.select(col("dst").as("id")))
      .distinct()
    var labels = initial match {
      // Warm start: seed from the prior labeling where it covers a
      // node, self-label new arrivals. Labels still only decrease
      // (prior labels are ids within their component), so the change
      // detection and fixpoint argument below are untouched.
      case Some(init) =>
        allIds
          .join(init.select(col("id"), col("comp").as("__ic")), Seq("id"), "left")
          .select(col("id"), coalesce(col("__ic"), col("id")).as("comp"))
          .localCheckpoint(true)
      case None =>
        allIds.select(col("id"), col("id").as("comp")).localCheckpoint(true)
    }
    // Adaptive re-planning adds per-shuffle-stage scheduling latency
    // that dominates when the loop frames are tiny; with the loop width
    // pinned there is nothing for AQE to decide. Scoped mode turns it
    // off for the loop and restores it after.
    val sessionAqe = spark.conf.get("spark.sql.adaptive.enabled")
    loopShufflePartitions.foreach(_ =>
      spark.conf.set("spark.sql.adaptive.enabled", "false"))
    var iter = 0
    var converged = false
    try {
      while (!converged && iter < maxIter) {
        // Neighbor labels flow along each (directed) edge: dst receives
        // src's current label. The label rows carry their OWN comp as
        // `oc` through the union, so one min-agg both produces the new
        // labels AND detects change (labels only ever decrease:
        // min(comp) < max(oc) ⇔ this vertex changed) — no per-round
        // labels⋈next join. The checkpoint is LAZY: the convergence
        // count is the action that materializes (and caches) it, so
        // each round schedules exactly ONE job instead of an eager
        // checkpoint job followed by a count job.
        val viaNbr = sym
          .join(labels.select(col("id").as("src"), col("comp")), "src")
          .select(col("dst").as("id"), col("comp"),
            lit(null).cast("long").as("oc"))
        // Lazy-persisted: the shortcut below scans `cand` twice with
        // DIFFERENT projections, which defeats exchange reuse — without
        // the persist each round would run the join+agg twice.
        val cand = labels.select(col("id"), col("comp"), col("comp").as("oc"))
          .union(viaNbr)
          .groupBy("id").agg(min("comp").as("comp"), max("oc").as("oc"))
          .persist()
        // Shortcut (pointer-doubling): compose the round's OWN label map
        // with itself — `comp` is always a vertex id, so cand(comp)
        // exists in cand. If one neighbor round extends a vertex's reach
        // to the min within r hops, the composition reaches 2r+1: a
        // diameter-d chain converges in O(log d) rounds instead of d,
        // and every avoided round is an avoided full-frame shuffle (the
        // lever that matters at corpus scale, where one round = one
        // corpus-wide shuffle). The double scan of `cand` reuses the
        // aggregate's exchange (spark.sql.exchange.reuse). `least`
        // ignores NULLs, so the left join is total. Labels still only
        // decrease, so the min-label fixed-point argument is unchanged:
        // no decrease anywhere ⇔ neighbor-stable ⇔ labels constant per
        // component = component min.
        // A SECOND composition per round (compose∘compose, reach 4r+3)
        // was measured on the sf0.1 near-dup graph: rounds stayed at 6
        // while per-round cost rose ~50% — label-pointer chains here
        // don't shorten under repeated composition the way clean path
        // graphs do (a synthetic 50-chain drops 6→4 rounds). One
        // composition is the measured optimum; revisit only with
        // evidence from a real long-chain corpus.
        val next = cand
          .join(cand.select(col("id").as("comp"), col("comp").as("c2")),
            Seq("comp"), "left")
          .select(col("id"), least(col("comp"), col("c2")).as("comp"), col("oc"))
          .localCheckpoint(eager = false)
        val changed = next.filter(col("comp") < col("oc")).count()
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc] round=$iter changed=$changed")
        cand.unpersist(blocking = false) // `next` is cached now
        labels = next.select(col("id"), col("comp"))
        converged = changed == 0
        iter += 1
      }
    } finally loopShufflePartitions.foreach { _ =>
      spark.conf.set("spark.sql.shuffle.partitions", sessionShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", sessionAqe)
    }
    if (sys.env.contains("GRAFT_CC_DEBUG"))
      System.err.println(s"[cc] min-label rounds=$iter converged=$converged")
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
    * lineage stays flat. The round's DISTINCT edge set never grows
    * (contraction): the per-round checkpoint is deduped by small-star's
    * terminal distinct, so the shuffles shrink as the forest flattens
    * (large-star's intermediate stream may carry transient duplicates —
    * bounded by the join fan-out it already pays — see its comment).
    *
    * @return (`id`, `comp`) — identical contract to
    *         [[connectedComponents]]
    */
  def connectedComponentsStar(
      vertices: DataFrame,
      edges: DataFrame,
      maxIter: Int = 50,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    // Scope the loop width (and AQE, whose per-stage re-planning
    // latency dominates tiny rounds) BEFORE the initial distinct so
    // every loop-carried frame is born at the scoped width. Restored in
    // the finally below. Same caveat as [[connectedComponents]]: size
    // to the candidate graph, never the corpus.
    val spark = vertices.sparkSession
    val sessionShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val sessionAqe = spark.conf.get("spark.sql.adaptive.enabled")
    loopShufflePartitions.foreach { n =>
      spark.conf.set("spark.sql.shuffle.partitions", n.toString)
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    }
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
    // NOT distinct-ed: small-star's min-agg is duplicate-insensitive and
    // its terminal distinct collapses the join fan-out, so large-star's
    // own dedup shuffle (one per round, half the round's aggregations)
    // bought nothing. Duplicate multiplicity entering small-star is
    // bounded by deg(v) — the same bound the join fan-out already has.
    def largeStar(cur: DataFrame): DataFrame = {
      val nbrs = cur.union(cur.select(col("dst").as("src"), col("src").as("dst")))
      val mins = nbrs.groupBy("src")
        .agg(min(col("dst")).as("mn"))
        .select(col("src"), least(col("src"), col("mn")).as("m"))
      nbrs.join(mins, "src")
        .filter(col("dst") > col("src"))
        .select(col("dst").as("src"), col("m").as("dst"))
        .filter(col("src") =!= col("dst"))
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
    try {
      while (!converged && iter < maxIter) {
        val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
        // Exact fixed-point test in ONE action (both sides are distinct
        // edge sets): signed-count the symmetric difference — a pair in
        // both sets sums to 0, a pair in exactly one survives the
        // filter. Zero survivors ⇔ set equality. The lazy checkpoint of
        // `next` materializes inside this same job (vs the previous
        // three actions: eager checkpoint, two counts, an except scan).
        val diff = next.select(col("src"), col("dst"), lit(1L).as("w"))
          .union(e.select(col("src"), col("dst"), lit(-1L).as("w")))
          .groupBy("src", "dst").agg(sum("w").as("w"))
          .filter(col("w") =!= 0).count()
        if (sys.env.contains("GRAFT_CC_DEBUG"))
          System.err.println(s"[cc-star] round=$iter diff=$diff")
        converged = diff == 0
        e = next
        iter += 1
      }
    } finally loopShufflePartitions.foreach { _ =>
      spark.conf.set("spark.sql.shuffle.partitions", sessionShuffle)
      spark.conf.set("spark.sql.adaptive.enabled", sessionAqe)
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

  /** Fixed-iteration PageRank over an undirected graph — the
    * link-centrality signal a pretraining pipeline uses to weight web
    * documents by graph authority (the harmonic/PageRank quality
    * features of public web corpora). Power iteration, expressed as
    * per-round join + dst-contraction:
    *
    *   pr'(v) = (1-d)/N + d * Σ_{u~v} pr(u) / deg(u)
    *
    * Scale design (100 TB): the degree is joined into the edge frame
    * ONCE and the result checkpointed pre-partitioned by `src`, so each
    * round shuffles only the node-sized pr frame into the join plus the
    * unavoidable contribution contraction on `dst` — never the edge
    * frame itself. Rounds are a fixed count (power iteration converges
    * geometrically at rate d; 5 rounds ≈ rank ordering stability for
    * quality-weighting use), each round `localCheckpoint`ed so lineage
    * stays one round deep. Symmetrizing guarantees every node has
    * out-degree ≥ 1, which removes the dangling-mass correction term —
    * the variant that needs a per-round global scalar reduction.
    *
    * Float discipline: both engines sum per-node contributions in
    * arbitrary order, so results carry ~1-ulp drift per round; callers
    * certify through [[Similarity.intScaled]] (q127 uses e6 on values
    * ~1e-3 — nine orders of margin).
    *
    * @param edges two-column frame `src`,`dst` (undirected; either
    *              orientation; self-loops dropped; duplicates collapsed)
    * @return (`id`, `pr`) for every node incident to an edge
    */
  def pageRank(
      edges: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1, s"pageRank: iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    // Canonical-orientation dedup: ONE distinct (on src<dst form)
    // instead of distinct-ing the doubled union — the flip of a
    // strictly-ordered pair can never collide with another canonical
    // pair, so the union below is dup-free by construction.
    //
    // Edge derivation + dedup run at the SESSION shuffle width: this is
    // the corpus-sized piece of the work (e.g. a fact-table join), so
    // narrowing it to the loop width would serialize the heavy scan.
    // Only the node-sized power-iteration loop below gets the narrow
    // scope.
    runPageRank(canonUnit(edges), iterations, damping, loopShufflePartitions)
  }

  /** Canonicalized unit-weight edge frame: the unweighted walk IS the
    * weighted walk over w = 1.0 — deg(sum of 1.0s) equals the count
    * exactly, and (pr·1.0)/d is bit-identical to pr/d in IEEE 754, so
    * the shared core changes nothing for unweighted callers.
    */
  private def canonUnit(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"))
      .distinct()
      .withColumn("w", lit(1.0))

  /** Personalized PageRank: teleport mass restarts at a SEED set
    * instead of uniformly — the seed-and-expand curation walk (rank
    * the whole graph by proximity to known-good nodes, e.g. trusted
    * domains seeding a crawl-quality score). pr0 and the per-round
    * restart both concentrate on seeds:
    *
    *   pr'(v) = [v ∈ S]·(1-d)/|S| + d · Σ_{u~v} pr(u)·w(u,v)/W(u)
    *
    * Same lazy fixed-iteration core as [[pageRank]]; the seed
    * predicate is evaluated in-plan on node ids (no collected seed
    * list — at scale S can be a joined flag column instead).
    */
  def pageRankPersonalized(
      edges: DataFrame,
      isSeed: Column => Column,
      iterations: Int = 5,
      damping: Double = 0.85,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1,
      s"pageRankPersonalized: iterations must be >= 1, got $iterations")
    runPageRank(canonUnit(edges), iterations, damping, loopShufflePartitions,
      personalization = Some(isSeed))
  }

  /** Weighted PageRank — the production web-graph form (edge weight =
    * link multiplicity / trust):
    *
    *   pr'(v) = (1-d)/N + d · Σ_{u~v} pr(u) · w(u,v) / W(u)
    *
    * where W(u) is u's total incident weight (strength). Duplicate and
    * reversed input edges COMBINE (weights sum over the canonical
    * orientation), unlike [[pageRank]] which collapses them; rows with
    * non-positive or null weight are dropped. Same scale shape and
    * float discipline as the unweighted form.
    *
    * @param edges three-column frame `src`,`dst`,`w` (undirected)
    */
  def pageRankWeighted(
      edges: DataFrame,
      iterations: Int = 5,
      damping: Double = 0.85,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1,
      s"pageRankWeighted: iterations must be >= 1, got $iterations")
    val canon = edges
      .select(col("src"), col("dst"), col("w").cast("double").as("w"))
      .filter(col("src") =!= col("dst") && col("w") > 0)
      .select(least(col("src"), col("dst")).as("src"),
        greatest(col("src"), col("dst")).as("dst"), col("w"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    runPageRank(canon, iterations, damping, loopShufflePartitions)
  }

  /** Warm-start PageRank: continue the walk from a PERSISTED rank
    * frame instead of the uniform pr0 — the incremental-maintenance
    * form (a nightly job persists ranks; the next run pays only the
    * marginal rounds). The contract q414 certifies: k persisted rounds
    * + j warm rounds ≡ k+j cold rounds (parquet round-trips doubles
    * exactly, and each round's arithmetic is identical, so the only
    * divergence is the usual sum-order ulp the e6 grid absorbs).
    * Teleport stays uniform (no personalization in warm mode).
    *
    * @param init (`id`, `pr`) — a prior [[pageRank]] output for the
    *             SAME edge frame (every node present)
    */
  def pageRankWarm(
      edges: DataFrame,
      init: DataFrame,
      iterations: Int = 1,
      damping: Double = 0.85,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1,
      s"pageRankWarm: iterations must be >= 1, got $iterations")
    runPageRank(canonUnit(edges), iterations, damping, loopShufflePartitions,
      initial = Some(init))
  }

  /** Persist the PREPARED power-iteration edge frame — symmetrized and
    * degree-joined, (`src`, `dst`, `w`, `d`), exactly the frame
    * [[runPageRank]] rebuilds per session — as a bucketed+sorted table
    * next to the rank store (r14 verdict item 2: the warm round kept
    * re-paying the ~17 s/100× edge build its rank store was supposed to
    * amortize away). `bucketBy(src)+sortBy(src)` with exactly ONE file
    * per bucket (the repartition below guarantees it) makes the
    * read-back scan itself report the hash distribution and ascending
    * order the loop's SMJ requires — the warm edge side is then a bare
    * bucketed parquet scan: no Exchange, no Sort, no per-session
    * rebuild, no checkpoint (and hence no AQE-capture trap — nothing is
    * captured). This is [[ops.Layout]]'s bucketed-join machinery
    * (BucketingSpec) applied to iterative-loop state.
    */
  def persistPreparedEdges(
      edges: DataFrame,
      table: String,
      path: String,
      buckets: Int): Unit = {
    // Same construction as the cold path, spelled identically (warm ≡
    // cold is a hash contract): canonical-orientation dedup, doubled
    // union, summed incident weight.
    val canon = canonUnit(edges)
    val sym = canon
      .union(canon.select(col("dst").as("src"), col("src").as("dst"), col("w")))
    val deg = sym.groupBy("src").agg(sum(col("w")).as("d"))
    persistPreparedSymDeg(sym.join(deg, "src"), table, path, buckets)
  }

  /** [[persistPreparedEdges]] for an ALREADY-prepared symDeg frame
    * (r17 ADVICE: q414's store build had hand-inlined this write) —
    * the ONE spelling of the bucketed warm-store contract
    * (bucketBy/sortBy on `src`, table + explicit path), so warm ≡ cold
    * stays a single-site property.
    */
  def persistPreparedSymDeg(
      symDeg: DataFrame,
      table: String,
      path: String,
      buckets: Int): Unit = {
    val spark = symDeg.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    symDeg
      .repartition(buckets, col("src"))
      .write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, "src").sortBy("src")
      .saveAsTable(table)
  }

  /** Warm-start PageRank over a [[persistPreparedEdges]] read-back: the
    * incremental run's steady state — BOTH stores read from disk, the
    * only per-run work being the marginal rounds themselves (one
    * node-sized rank exchange + one contraction per round). Arithmetic
    * is identical to [[pageRankWarm]] (same join/agg expressions, same
    * teleport spelling, N from the node-complete init), so the warm ≡
    * cold contract carries over; q414 certifies it through the real
    * store round-trip.
    */
  def pageRankWarmPrepared(
      prepared: DataFrame,
      init: DataFrame,
      iterations: Int = 1,
      damping: Double = 0.85,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1,
      s"pageRankWarmPrepared: iterations must be >= 1, got $iterations")
    val spark = prepared.sparkSession
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      // init covers every node (the pageRankWarm contract), so N — the
      // teleport denominator — is one count of the node-sized store.
      val n = init.count()
      require(n > 0, "pageRankWarmPrepared: empty init rank frame")
      // The coverage precondition is CHECKED, not assumed (r15 ADVICE):
      // if the prepared edge store grew after the ranks were persisted
      // (a node in `prepared` missing from `init`), the inner join
      // below would silently drop its mass and N would be stale —
      // wrong with no error. One anti-join probe over the bucketed
      // store (broadcasting the node-sized init) catches it loudly;
      // at true scale this is the nightly landing's validation pass,
      // priced into the graph_rank_warm audit row.
      val uncovered = prepared.select(col("src"))
        .join(broadcast(init.select(col("id").as("src"))), Seq("src"),
          "left_anti")
        .head(1)
      require(uncovered.isEmpty,
        s"pageRankWarmPrepared: prepared edge store mentions node " +
          s"${uncovered.head.get(0)} absent from init — the stores were " +
          "persisted at different graph versions; rebuild the rank store")
      val teleport = lit((1.0 - damping) / n)
      var pr = init.select(col("id"), col("pr"))
      (1 to iterations).foreach { _ =>
        pr = prepared
          .join(pr.select(col("id").as("src"), col("pr")), "src")
          .groupBy(col("dst"))
          .agg((teleport +
            lit(damping) * sum(col("pr") * col("w") / col("d"))).as("pr"))
          .select(col("dst").as("id"), col("pr"))
      }
      // Same dev-only probe as the cold loop: the SMJ edge side must be
      // a bare bucketed scan (no Exchange/Sort).
      if (sys.env.contains("GRAFT_EXPLAIN_LOOP")) pr.explain("formatted")
      pr.localCheckpoint(eager = true)
    }
  }

  /** The prepared power-iteration state over one canonical edge frame:
    * the loop-partitioned symmetric degree-joined edge frame, the
    * node-sized strength frame, and the node count — everything a
    * walk round touches that does not depend on iteration count,
    * damping, personalization or warm-start. Extracted in r17 so the
    * THREE unit-weight walks over the customer–supplier graph (q127,
    * q148, q414's cold store build) and the BFS (q156) share ONE
    * preparation instead of each re-paying the dedup + symmetrize +
    * degree + repartition/sort/checkpoint chain per run — the same
    * production shape as [[persistPreparedEdges]], held in-session.
    */
  private[ext] final case class PreparedWalk(
      symDeg: DataFrame, deg: DataFrame, n: Long)

  /** Build a [[PreparedWalk]] from a canonicalized weighted edge frame
    * (`src` < `dst`, one row per pair, `w` > 0). Same construction the
    * pre-r17 runPageRank inlined — see the comments inside.
    */
  private def prepareWalk(
      canon: DataFrame,
      loopShufflePartitions: Option[Int]): PreparedWalk = {
    val spark = canon.sparkSession
    // Checkpoint the symmetrized frame BEFORE fanning out: deg and
    // the deg-join below would otherwise each re-run the (possibly
    // expensive) upstream edge derivation.
    val sym = canon
      .union(canon.select(col("dst").as("src"), col("src").as("dst"), col("w")))
      .localCheckpoint(true)
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      // One row per node: (src, strength = Σ incident weight; for unit
      // weights this is exactly the degree). Checkpointed — it seeds
      // pr0, sizes N, and joins into the edge frame.
      val deg = sym.groupBy("src")
        .agg(sum(col("w")).as("d"))
        .localCheckpoint(true)
      val n = deg.count()
      require(n > 0, "pageRank: empty edge set after self-loop removal")
      val symDeg0 = sym.join(deg, "src")
      // Pre-partitioned by the loop join key and pre-sorted, under
      // AQE-off — the full rationale lives in the comment block this
      // was extracted from (r13/r14: checkpoint captures
      // outputPartitioning/Ordering only without the AQE wrapper; the
      // loop's SMJ edge side is then a bare checkpointed scan).
      val symDeg = withAqeOff(spark) {
        val parted = loopShufflePartitions
          .map(w => symDeg0.repartition(w, col("src")))
          .getOrElse(symDeg0.repartition(col("src")))
        parted.sortWithinPartitions("src").localCheckpoint(true)
      }
      PreparedWalk(symDeg, deg, n)
    }
  }

  /** Memoized per-(session, dir, width) prepared UNIT-weight walk
    * state for the customer–supplier graph — the [[Graph.coOrderGraph]]
    * pattern applied to the walk prep: q127 (PageRank), q148
    * (personalized), q414's cold store build, and q156 (BFS — consumes
    * `symDeg` projected to its two edge columns) all walk this exact
    * frame. Keyed on the session OBJECT so a fresh JVM recomputes.
    * q147 (weighted) keeps its own prep: its canonical frame sums
    * multiplicities and is that query's alone.
    */
  private val walkCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String, Int), PreparedWalk]

  private[ext] def custSuppWalkShared(
      s: SparkSession, dir: String,
      loopShufflePartitions: Option[Int]): PreparedWalk =
    walkCache.computeIfAbsent(
      (s, dir, loopShufflePartitions.getOrElse(-1)),
      _ => prepareWalk(
        canonUnit(Graph.custSuppEdgesShared(s, dir)), loopShufflePartitions))

  /** Shared power-iteration core over a canonicalized weighted edge
    * frame (`src` < `dst`, one row per pair, `w` > 0).
    */
  private def runPageRank(
      canon: DataFrame,
      iterations: Int,
      damping: Double,
      loopShufflePartitions: Option[Int],
      personalization: Option[Column => Column] = None,
      initial: Option[DataFrame] = None): DataFrame =
    runPageRankPrepared(prepareWalk(canon, loopShufflePartitions),
      iterations, damping, loopShufflePartitions, personalization, initial)

  /** Power-iteration loop over a [[PreparedWalk]] — arithmetic
    * identical to the pre-r17 inline form (same join/agg expressions,
    * same teleport spelling), so every walk's hash contract is
    * untouched; only WHERE the prep frames come from changed.
    */
  private[ext] def runPageRankPrepared(
      g: PreparedWalk,
      iterations: Int,
      damping: Double,
      loopShufflePartitions: Option[Int],
      personalization: Option[Column => Column] = None,
      initial: Option[DataFrame] = None): DataFrame = {
    val spark = g.symDeg.sparkSession
    // Loop scoping delegates to withSmallScope — the single
    // save/narrow/restore implementation shared with q102/q119 —
    // Option-aware: None runs the loop at session width untouched.
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      val symDeg = g.symDeg
      // Uniform walk: constant teleport (1-d)/N, uniform pr0.
      // Personalized: restart mass concentrates on the seed set — the
      // teleport is an expression over the contraction's group key and
      // pr0 over the node frame, so neither collects anything.
      val (teleportExpr, pr0Expr) = personalization match {
        case None =>
          (lit((1.0 - damping) / g.n), lit(1.0 / g.n))
        case Some(isSeed) =>
          val ns = g.deg.filter(isSeed(col("src"))).count()
          require(ns > 0, "pageRankPersonalized: no seed node touches an edge")
          (when(isSeed(col("dst")), lit((1.0 - damping) / ns)).otherwise(lit(0.0)),
            when(isSeed(col("src")), lit(1.0 / ns)).otherwise(lit(0.0)))
      }
      var pr = initial
        .map(_.select(col("id"), col("pr")))
        .getOrElse(g.deg.select(col("src").as("id"), pr0Expr.as("pr")))
      // The round chain stays LAZY: unlike the CC loop (data-dependent
      // round count, needs per-round actions), the iteration count here
      // is fixed, so the whole power iteration compiles into ONE job of
      // 2×iterations shuffle stages over the checkpointed edge frame —
      // measured ~25% faster at sf0.1 than an eager checkpoint per
      // round (each eager round was its own job + scheduling constant;
      // the remaining wall time is the intrinsic 5× contraction shuffle
      // of the ~1.2M-row symmetric edge frame). Lineage depth is
      // bounded by `iterations`, so no checkpoint is needed for plan
      // health.
      (1 to iterations).foreach { _ =>
        // Symmetric graph ⇒ every node has in-edges ⇒ the contraction
        // covers every node; no outer-join backfill needed.
        pr = symDeg
          .join(pr.select(col("id").as("src"), col("pr")), "src")
          .groupBy(col("dst"))
          .agg((teleportExpr +
            lit(damping) * sum(col("pr") * col("w") / col("d"))).as("pr"))
          .select(col("dst").as("id"), col("pr"))
      }
      // Dev-only plan probe: dump the loop's physical plan before it
      // executes so the co-partitioning/pre-sort claim is inspectable
      // (the edge side of each round's SMJ must show neither Exchange
      // nor Sort above the checkpointed scan).
      if (sys.env.contains("GRAFT_EXPLAIN_LOOP")) pr.explain("formatted")
      // Materialized INSIDE the scope (single job): the one place the
      // whole chain executes, so the scoped shuffle width/AQE setting
      // actually binds — a lazy return would run under the restored
      // session conf (the q119 discipline).
      pr.localCheckpoint(eager = true)
    }
  }

  // ---- declared queries ---------------------------------------------------

  /** q102 — dedup groups: connected components of the simhash-band
    * near-dup candidate graph (q65's pigeonhole-complete pair set,
    * Hamming ≤ 2), labeling EVERY doc in the bounded probe set with the
    * min doc_id of its near-dup group (singletons label themselves).
    * This is the stage that turns near-dup PAIRS into keep/drop GROUPS.
    */
  /** Run `f` (typically an eager repartition+sort+localCheckpoint of a
    * loop frame) with AQE disabled, restoring the conf after: the
    * checkpoint's LogicalRDD copies the captured physical plan's
    * outputPartitioning/outputOrdering, and the AQE wrapper plan
    * reports UnknownPartitioning — so a checkpoint taken under AQE
    * loses exactly the distribution the loop wants to reuse.
    */
  private[ext] def withAqeOff[A](s: SparkSession)(f: => A): A = {
    val aqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally s.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  /** Scope shuffle width + AQE down for a bounded-probe-set derivation
    * whose EAGER actions (edge checkpoint, CC loop) run inside `f`, then
    * restore. The probe set is 1000 docs by construction, so the
    * session's corpus-sized shuffle width only buys per-stage scheduling
    * and adaptive-planning latency. Lazy plan tails returned from `f`
    * execute later under the restored session conf.
    */
  private[ext] def withSmallScope[A](s: SparkSession, parts: Int)(f: => A): A = {
    val sp = s.conf.get("spark.sql.shuffle.partitions")
    val aqe = s.conf.get("spark.sql.adaptive.enabled")
    s.conf.set("spark.sql.shuffle.partitions", parts.toString)
    s.conf.set("spark.sql.adaptive.enabled", "false")
    try f finally {
      s.conf.set("spark.sql.shuffle.partitions", sp)
      s.conf.set("spark.sql.adaptive.enabled", aqe)
    }
  }

  private val probePairsCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]

  /** Memoized per-(session, dir) simhash-band candidate pairs over the
    * 1000-doc probe subset — `(id_a, id_b, hamming)`, the q65-certified
    * derivation (60 bits, 4 bands, Hamming ≤ 2) — r17: SEVEN query
    * paths re-ran this identical fingerprint + band self-join per run
    * (q65's declared set, q94's rescore, q102's labeling family, q120's
    * star contraction, q139's split-leak census, q319's transitivity,
    * q321's signal-agreement census). The candidate stage now lands
    * once per session — the production shape: one LSH pass, many
    * consumers. Labeling implementations (min-label vs star) stay fully
    * independent, and every consumer's oracle still recomputes the
    * pairs from raw text.
    */
  private[ext] def probeBandPairs(s: SparkSession, dir: String): DataFrame =
    probePairsCache.computeIfAbsent((s, dir), { _ =>
      withSmallScope(s, 4) {
        Dedup.simhashBandPairs(
          Dedup.simhashN(
            Tables.table(s, dir, "documents").filter(col("doc_id") < 1000),
            col("doc_id"), col("text"), bits = 60),
          bits = 60, bands = 4, maxHamming = 2)
          .localCheckpoint(true)
      }
    })

  private def neardupLabelsWith(
      s: SparkSession, dir: String,
      cc: (DataFrame, DataFrame) => DataFrame)
      : (DataFrame, DataFrame) = withSmallScope(s, 4) {
    val subset = Tables.table(s, dir, "documents").filter(col("doc_id") < 1000)
    val pairs = probeBandPairs(s, dir)
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val labels = cc(subset.select(col("doc_id").as("id")), pairs)
      .select(col("id").as("doc_id"), col("comp").as("component"))
    (subset, labels)
  }

  private val neardupCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), (DataFrame, DataFrame)]

  /** Memoized per-(session, dir) near-dup labeling on the DEFAULT CC
    * path (the coOrderGraph pattern, Graph.scala): SIX consumers
    * (q102/q119/q138/q146/q235/q249) fan out from ONE simhash-band +
    * connected-components run — exactly what a production dedup
    * pipeline does with its labeling stage. Keyed on the session
    * OBJECT so a fresh JVM recomputes; the label frame is
    * `localCheckpoint`'d (probe-set-bounded rows). q120's
    * star-contraction variant stays UNCACHED and separate — its whole
    * point is an independent second implementation of the labeling.
    */
  private def neardupLabels(s: SparkSession, dir: String)
      : (DataFrame, DataFrame) =
    neardupCache.computeIfAbsent((s, dir), { _ =>
      val (subset, labels) = neardupLabelsWith(s, dir,
        connectedComponents(_, _, loopShufflePartitions = Some(4)))
      (subset, labels.localCheckpoint(true))
    })

  def q102(s: SparkSession, dir: String): DataFrame =
    neardupLabels(s, dir)._2.orderBy("doc_id")

  /** Persist yesterday's dedup state for the OLD half of the probe
    * corpus — the EVEN doc ids, q122's existing-corpus/incoming-batch
    * framing, so the split binds at every SF (the planted near-dup
    * pairs mix parities generously; a prefix split degenerates at
    * sf0.001 where the probe bound covers the whole corpus). TWO legs
    * land under one root (r15 verdict item 1 — the labels alone made
    * the warm loop warm but left q415 re-fingerprinting the corpus):
    *
    *   - `labels/` — the old half's component labeling (warm-CC seed);
    *   - `sigs/`   — the old half's 60-bit simhash fingerprints
    *     (8 bytes/doc), so an incremental run band-joins NEW docs
    *     against the store instead of re-fingerprinting old ones.
    *
    * Fingerprints are per-doc (simhashN groups by __id), so the stored
    * values are bit-identical to what a full-corpus pass would compute
    * for the same docs — the q424 set-identity certification rests on
    * exactly that.
    */
  private[graft] def ensureCcStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "ccstore", dir) { path =>
      withSmallScope(s, 4) {
        val old = Tables.table(s, dir, "documents")
          .filter(col("doc_id") < 1000 && col("doc_id") % 2 === 0)
        // One fingerprint pass feeds BOTH the sig store and the old
        // half's own labeling (checkpointed: the band self-join scans
        // its input twice).
        val fp = Dedup.simhashN(old, col("doc_id"), col("text"), bits = 60)
          .localCheckpoint(true)
        fp.write.mode("overwrite").parquet(s"$path/sigs")
        val pairs = Dedup.simhashBandPairs(fp,
          bits = 60, bands = 4, maxHamming = 2)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        connectedComponents(old.select(col("doc_id").as("id")), pairs,
          loopShufflePartitions = Some(4))
          .write.mode("overwrite").parquet(s"$path/labels")
      }
      path
    }

  /** q415 — INCREMENTAL near-dup components off the persisted dedup
    * state: the even-id half of the probe corpus is fingerprinted and
    * labeled once ([[ensureCcStore]] — yesterday's state); today's run
    * fingerprints ONLY the odd half, derives candidate pairs as
    * (new-vs-new band pairs) ∪ (new-vs-STORE band join — the stored
    * fingerprints, never the old texts), adds one star edge per stored
    * label row (comp ≠ id) so old components stay connected without
    * replaying their pair derivation, seeds the min-label loop from
    * the stored labels, and must converge to EXACTLY the full-graph
    * labeling — q102's recursive-CTE oracle, unchanged.
    *
    * Exactness is structural, not approximate: (1) the dropped old-old
    * candidate pairs connect only nodes the star edges already connect
    * (the stored labeling is the fixpoint of exactly those pairs), and
    * the added star edges connect only nodes the old-old pairs
    * transitively connected — so the graph's components are identical;
    * (2) q424 hash-certifies that the incremental pair set equals the
    * full band-pair set restricted to pairs touching the new half
    * (band completeness); (3) prior labels are ids within their
    * components and components only merge, so the seeded fixpoint is
    * the merged component's min id, exactly the cold answer.
    *
    * The incremental-maintenance trilogy's third leg (registers
    * q411-q413, ranks q414, labels here), now end-to-end: at 100 TB
    * the nightly dedup job fingerprints the NEW batch, band-joins it
    * against stored signatures (bytes per doc), and re-labels only
    * what new edges can touch — the corpus is never re-read. The
    * `cc_warm_full` DevScaleAudit row prices exactly that split at
    * full corpus scale.
    */
  private val incFpCache = new java.util.concurrent.ConcurrentHashMap[
    (SparkSession, String), DataFrame]

  /** Memoized per-(session, dir) NEW-half (odd doc ids) fingerprint
    * frame (r17): the incremental batch's fingerprint pass lands once
    * per session — q415 (warm labeling) and q424 (pair certification)
    * both consume it, exactly as a production nightly job fingerprints
    * today's batch once and feeds every downstream leg. Bit-identical
    * to a per-query pass (simhashN is per-doc).
    */
  private def incNewFp(s: SparkSession, dir: String): DataFrame =
    incFpCache.computeIfAbsent((s, dir), _ => withSmallScope(s, 4) {
      Dedup.simhashN(
        Tables.table(s, dir, "documents")
          .filter(col("doc_id") < 1000 && col("doc_id") % 2 === 1),
        col("doc_id"), col("text"), bits = 60)
        .localCheckpoint(true) // feeds self-join + store join, twice over
    })

  /** Drop every session-scoped derived-frame memo in this object — see
    * [[SessionMemo]] (bench honesty: each timed round re-pays each
    * shared derivation exactly once).
    */
  private[ext] def clearSessionMemos(): Unit = {
    walkCache.clear()
    probePairsCache.clear()
    neardupCache.clear()
    incFpCache.clear()
  }

  def q415(s: SparkSession, dir: String): DataFrame = {
    val store = ensureCcStore(s, dir)
    withSmallScope(s, 4) {
      val subset = Tables.table(s, dir, "documents").filter(col("doc_id") < 1000)
      val newFp = incNewFp(s, dir)
      val storeFp = s.read.parquet(s"$store/sigs")
      val labels = s.read.parquet(s"$store/labels")
      val newNew = Dedup.simhashBandPairs(newFp,
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val newOld = Dedup.simhashBandJoin(newFp, storeFp,
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      // Star edges: label-store-sized, one per non-root old node —
      // they carry the old half's transitive connectivity so a new
      // label arriving at ONE member of a stored component reaches
      // the rest without the old-old pair derivation.
      val star = labels.filter(col("comp") =!= col("id"))
        .select(col("comp").as("src"), col("id").as("dst"))
      connectedComponentsWarm(subset.select(col("doc_id").as("id")),
        newNew.union(newOld).union(star),
        initial = labels,
        loopShufflePartitions = Some(4))
        .select(col("id").as("doc_id"), col("comp").as("component"))
        .orderBy("doc_id")
    }
  }

  /** q424 — the incremental candidate-pair derivation itself,
    * oracle-certified: fingerprint ONLY the new (odd) half, band it
    * against itself and against the PERSISTED old-half fingerprint
    * store, and emit every candidate pair within Hamming ≤ 2 that
    * touches a new doc. The oracle recomputes the FULL corpus band-pair
    * set in DuckDB (q65's certified chain) and restricts it to pairs
    * with an odd endpoint — a hash match proves the incremental
    * derivation finds exactly the pairs a from-scratch run would find
    * (band completeness through the store round-trip: stored
    * fingerprints are bit-identical to recomputed ones, and the
    * bipartite join's pigeonhole covers every cross pair).
    *
    * This is the certification q415's scale story rests on: the
    * nightly job's pair stage reads 8 bytes/doc of stored fingerprints
    * instead of re-reading and re-hashing yesterday's corpus.
    *
    * Scale: the only text scan is the new half; the store side is a
    * bytes-per-doc columnar read; both band joins are bucket-local on
    * (band, slice). At 100 TB with a small daily batch, AQE broadcasts
    * the new side and the store side never shuffles.
    */
  def q424(s: SparkSession, dir: String): DataFrame = {
    val store = ensureCcStore(s, dir)
    withSmallScope(s, 4) {
      val newFp = incNewFp(s, dir) // shared with q415 — see incNewFp
      val storeFp = s.read.parquet(s"$store/sigs")
      Dedup.simhashBandPairs(newFp, bits = 60, bands = 4, maxHamming = 2)
        .union(Dedup.simhashBandJoin(newFp, storeFp,
          bits = 60, bands = 4, maxHamming = 2))
        .orderBy("id_a", "id_b")
    }
  }

  /** q120 — the SAME near-dup component labeling as q102, computed by
    * the star-contraction path ([[connectedComponentsStar]]) and
    * certified against the SAME recursive-CTE oracle. Keeps the two CC
    * implementations from silently diverging: a refactor that breaks
    * either path now breaks a hash-checked driver row.
    */
  def q120(s: SparkSession, dir: String): DataFrame =
    neardupLabelsWith(s, dir,
      cc = connectedComponentsStar(_, _, loopShufflePartitions = Some(4)))
      ._2.orderBy("doc_id")

  /** q119 — quality-aware keep list: per near-dup component, keep the
    * BEST-quality member (ties to the lowest doc_id), not the lowest
    * id — the keep policy production dedup actually uses (a near-dup
    * group should surrender everything but its best exemplar). Composes
    * the certified q102 components with the certified q52 quality
    * score; quality is rounded BEFORE ranking (the q106 trick) so a
    * 1-ulp drift cannot flip a winner.
    */
  def q119(s: SparkSession, dir: String): DataFrame = withSmallScope(s, 4) {
    import org.apache.spark.sql.expressions.Window
    val (subset, labels) = neardupLabels(s, dir)
    val quality = subset.select(col("doc_id"),
      round(TextAnalysis.qualityScore(col("text")), 6).as("q"))
    val w = Window.partitionBy("component")
    // Checkpointed INSIDE the scope: the rank/window tail runs over the
    // few-hundred-row component frame, so executing it lazily at the
    // session's corpus-sized width would buy only scheduling latency.
    // The checkpoint preserves the declared ordering for the oracle.
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
      .localCheckpoint(true)
  }

  /** q235 — cluster-disjoint train/val/test split: the production fix
    * q139's leakage audit points at — assign splits by hashing the
    * near-dup COMPONENT label (q102's certified labeling), not the raw
    * doc id, so a near-dup group can never straddle a split boundary
    * and leak train signal into eval. Census per split: docs and
    * whole components assigned. Composes two certified paths
    * (Components labeling × Sampling.hashSplit's md5 bucketing) —
    * leak-freedom holds by construction (every member of a component
    * shares the hash key), and `ComponentsSpec` asserts it anyway.
    *
    * Scale: the split column is pure map-side compute over the labels
    * frame; the census agg is splits-sized. The labeling itself is the
    * q102 probe-bounded CC (banded candidates, per-round join+agg).
    */
  def q235(s: SparkSession, dir: String): DataFrame =
    Sampling.hashSplit(neardupLabels(s, dir)._2, col("component"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("component")).as("n_components"))
      .orderBy("split")

  /** q249 — golden-record survivorship: collapse each near-dup
    * component (q102's certified labeling) to ONE canonical row plus
    * provenance stats — canonical = longest text, ties to the lowest
    * doc_id (a deterministic total order, the survivorship rule
    * entity-resolution pipelines call "most complete wins"). Output
    * per component: the canonical doc, member count, total chars
    * absorbed, distinct sources merged. The stage after q102's
    * grouping and q119's scoring: what the dedup'd corpus actually
    * SHIPS.
    *
    * Scale: one join of labels (bounded probe set here; (id, comp)
    * pairs generally) with the doc projection, then ONE partial-agg
    * groupBy on component — the canonical pick is a max of a
    * (n_chars, −doc_id) struct, so it combines map-side; no window,
    * no per-component sort. All-integer.
    */
  def q249(s: SparkSession, dir: String): DataFrame = {
    val (subset, labels) = neardupLabels(s, dir)
    labels.join(subset.select(col("doc_id"), col("n_chars"), col("source")),
        "doc_id")
      .groupBy(col("component"))
      .agg(
        max(struct(col("n_chars").as("nc"), (-col("doc_id")).as("nid")))
          .as("best"),
        count(lit(1)).as("n_members"),
        sum(col("n_chars")).as("total_chars"),
        countDistinct(col("source")).as("n_sources"))
      .select(col("component"), (-col("best.nid")).as("canonical_id"),
        col("best.nc").as("canonical_chars"), col("n_members"),
        col("total_chars"), col("n_sources"))
      .orderBy("component")
  }

  /** q127 — PageRank centrality on the customer–supplier co-occurrence
    * graph (an order links its customer to each line's supplier).
    * Customers map to even node ids, suppliers to odd, so the two
    * keyspaces cannot collide. 5 damped iterations, e6-scaled.
    */
  def q127(s: SparkSession, dir: String): DataFrame = {
    // Shared memoized PREPARED walk state (custSuppWalkShared, r17):
    // q127/q148/q414's cold build/q156 all walk the same unit-weight
    // prepared frame, so the dedup + symmetrize + degree +
    // repartition/sort/checkpoint chain runs once per session instead
    // of once per query run (the custSuppEdgesShared rationale carried
    // one level further; arithmetic in the loop is unchanged).
    runPageRankPrepared(custSuppWalkShared(s, dir, Some(8)),
      iterations = 5, damping = 0.85, loopShufflePartitions = Some(8))
      .select(col("id"), Similarity.intScaled(col("pr"), 1000000L).as("pr_e6"))
      .orderBy("id")
  }

  /** q138 — dedup-report histogram: distribution of near-dup component
    * sizes (how many singletons, pairs, triples … — the summary a
    * dedup pass publishes alongside its drop list). Composition of the
    * certified q102 labeling with two count aggs; component-count
    * sized frames throughout.
    */
  def q138(s: SparkSession, dir: String): DataFrame =
    neardupLabels(s, dir)._2
      .groupBy(col("component")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_components"))
      .orderBy("sz")

  /** q146 — the corpus-cleaning FUNNEL: survivor counts after each
    * stage of the canonical pretraining clean (raw train docs → exact
    * content-hash dedup → near-dup group dedup → benchmark
    * decontamination) — the one-table report every cleaning run
    * publishes. Each stage composes already-certified machinery (q55's
    * hash dedup, q102's component labeling restricted to prior
    * survivors, q104's 5-gram decontamination), so the funnel is a
    * cross-stage integration check as much as a report. Probe-bounded
    * like its inputs (doc_id < 1000; eval set = every 7th doc).
    */
  def q146(s: SparkSession, dir: String): DataFrame = {
    val all = Tables.table(s, dir, "documents").filter(col("doc_id") < 1000)
    val train = all.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), col("text"))
    val labels = neardupLabels(s, dir)._2
    // stage 2: keep the min doc_id of every exact-content group
    val s2 = train.groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // stage 3: among stage-2 survivors, keep the min SURVIVING id per
    // near-dup component (the component min itself may have been an
    // exact-dup loser or an eval doc — restrict to survivors first)
    val s3 = s2.join(labels, "doc_id")
      .groupBy(col("component"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    // stage 4: drop survivors sharing any 5-gram with the eval set
    val withWs = (d: org.apache.spark.sql.DataFrame) =>
      d.join(all.select(col("doc_id"), split(col("text"), " ").as("ws")), "doc_id")
    val contaminated = Decontam.contaminationReport(
      withWs(s3),
      all.filter(col("doc_id") % 7 === 0).select(split(col("text"), " ").as("ws")),
      k = 5).select("doc_id")
    val s4 = s3.join(contaminated, Seq("doc_id"), "left_anti")
    def stage(id: Int, name: String, d: org.apache.spark.sql.DataFrame) =
      d.agg(count(lit(1)).as("docs"))
        .select(lit(id.toLong).as("stage_id"), lit(name).as("stage"), col("docs"))
    stage(1, "raw", train)
      .unionAll(stage(2, "exact_dedup", s2))
      .unionAll(stage(3, "near_dedup", s3))
      .unionAll(stage(4, "decontaminated", s4))
      .orderBy("stage_id")
  }

  /** q147 — WEIGHTED PageRank on the same customer–supplier graph as
    * q127, edge weight = lineitem multiplicity (how often the pair
    * traded): the authority signal production link graphs actually
    * carry. Certifies [[pageRankWeighted]]'s strength-normalized walk
    * against an independently weighted oracle.
    */
  def q147(s: SparkSession, dir: String): DataFrame = {
    // 1.0 per lineitem row ⇒ canonical sum = multiplicity; the shared
    // frame preserves multiplicity exactly for this reason.
    pageRankWeighted(
      Graph.custSuppEdgesShared(s, dir).withColumn("w", lit(1.0)),
      iterations = 5, loopShufflePartitions = Some(8))
      .select(col("id"), Similarity.intScaled(col("pr"), 1000000L).as("pr_e6"))
      .orderBy("id")
  }

  /** Persist the 3-round cold ranks for q414's warm start (memoized
    * once per session; node-sized parquet — raw doubles round-trip
    * exactly, so the warm run continues from bit-identical state) AND
    * the prepared edge frame beside them ([[persistPreparedEdges]]):
    * the nightly job lands both; the warm run reads both and rebuilds
    * neither. Returns (rank parquet path, prepared-edge table name).
    */
  private def ensureRankStore(s: SparkSession, dir: String): (String, String) =
    graft.StoreLifecycle.ensure(s, "rankstore", dir) { path =>
      // r17: both legs ride the session-shared prepared walk — the
      // 3-round cold run walks it, and the bucketed table IS it
      // (sym.join(deg) row-for-row; persistPreparedEdges rebuilt the
      // same frame from scratch pre-r17).
      val g = custSuppWalkShared(s, dir, Some(8))
      runPageRankPrepared(g, iterations = 3, damping = 0.85,
        loopShufflePartitions = Some(8))
        .write.mode("overwrite").parquet(path)
      // Session-tagged like the path (r16 ADVICE): catalog tables are
      // shared across same-JVM sessions (shared SharedState), so an
      // untagged name would let a second session's DROP+rebuild yank
      // the table out from under the first.
      val table = "graft_prep_edges_" + graft.StorePaths.sessionTag(s) + "_" +
        dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
      // One spelling of the warm-store write (r17 ADVICE): the shared
      // prepared frame is symDeg row-for-row, and the bucket contract
      // lives in persistPreparedSymDeg for both call sites.
      persistPreparedSymDeg(g.symDeg, table,
        graft.StorePaths.sessionRoot(s, "prepedges", dir), buckets = 8)
      (path, table)
    }

  /** q414 — WARM-START PageRank off the persisted rank store: 3 cold
    * rounds persisted once (node-sized parquet) NEXT TO the prepared
    * edge frame (bucketed+sorted table), then ONE warm round continues
    * from the two stores — and must equal a 4-round cold run (the
    * oracle runs the 4 unrolled rounds directly). This is the
    * register-store lifecycle (q411-q413) applied to iterative graph
    * state: a nightly rank job persists its fixpoint progress and the
    * next run pays only the marginal rounds — never the restart, and
    * since r15 never the edge rebuild either ([[pageRankWarmPrepared]]).
    * Certifies the warm ≡ cold contract end to end through both real
    * store write/reads.
    */
  def q414(s: SparkSession, dir: String): DataFrame = {
    val (rankPath, edgeTable) = ensureRankStore(s, dir)
    pageRankWarmPrepared(s.table(edgeTable), s.read.parquet(rankPath),
      iterations = 1, loopShufflePartitions = Some(8))
      .select(col("id"), Similarity.intScaled(col("pr"), 1000000L).as("pr_e6"))
      .orderBy("id")
  }

  /** q148 — personalized PageRank seeded at the supplier side (odd
    * node ids): proximity-to-trusted-nodes over the same graph as
    * q127 — the seed-and-expand signal crawl curation propagates from
    * a trusted domain list.
    */
  def q148(s: SparkSession, dir: String): DataFrame = {
    // Same shared prepared walk as q127 (r17); only the teleport
    // expression differs, and that lives in the loop, not the prep.
    runPageRankPrepared(custSuppWalkShared(s, dir, Some(8)),
      iterations = 5, damping = 0.85, loopShufflePartitions = Some(8),
      personalization = Some(id => id % 2 === 1))
      .select(col("id"), Similarity.intScaled(col("pr"), 1000000L).as("pr_e6"))
      .orderBy("id")
  }

  /** q355 — opt-out CLOSURE through the near-dup graph: when sources
    * src5/src13 opt out (license revocation, RTBF, robots change),
    * the documents that must ALSO go are every near-duplicate
    * cluster-mate of an opted-out doc — keeping a 95%-identical copy
    * ingested from elsewhere defeats the point of the removal. Per
    * source: total docs, direct opt-outs, and DRAGGED docs (not from
    * a banned source, but in a component containing one), with the
    * total drop share. q330 audits deletion impact through the FK
    * closure; this is the same audit through the SIMILARITY closure —
    * the number a takedown review actually signs off on. Composes the
    * memoized q102 component labels (one simhash-band + CC run shared
    * with its six existing consumers).
    *
    * Exactness: all censuses are exact integers off the certified
    * component labels; the share is one mirrored division.
    *
    * Scale: component flags are a (component → max flag) agg joined
    * back — two key-scoped shuffles over the probe set; no new pair
    * or closure computation beyond the shared labeling.
    */
  def q355(s: SparkSession, dir: String): DataFrame = {
    val (subset, labels) = neardupLabels(s, dir)
    val flagged = subset.select(col("doc_id"), col("source"))
      .join(labels, "doc_id")
      .withColumn("opt",
        when(col("source").isin("src5", "src13"), 1L).otherwise(0L))
    val comps = flagged.groupBy(col("component"))
      .agg(max(col("opt")).as("comp_flagged"))
    flagged.join(comps, "component")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("opt")).as("n_direct"),
        sum(when(col("opt") === 0L && col("comp_flagged") === 1L, 1L)
          .otherwise(0L)).as("n_dragged"))
      .select(col("source"), col("n_docs"), col("n_direct"),
        col("n_dragged"),
        graft.ext.Similarity.intScaled(
          (col("n_direct") + col("n_dragged")).cast("double") /
            col("n_docs").cast("double"), 1000000L).as("drop_share_e6"))
      .orderBy("source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q355_optout_closure" -> (q355 _),
    "q102_neardup_components" -> (q102 _),
    "q415_components_warm"    -> (q415 _),
    "q424_inc_band_pairs"     -> (q424 _),
    "q119_component_best"     -> (q119 _),
    "q120_components_star"    -> (q120 _),
    "q127_pagerank"           -> (q127 _),
    "q414_pagerank_warm"      -> (q414 _),
    "q138_dup_size_hist"      -> (q138 _),
    "q146_cleaning_funnel"    -> (q146 _),
    "q147_pagerank_weighted"  -> (q147 _),
    "q148_pagerank_personal"  -> (q148 _),
    "q235_cluster_split"      -> (q235 _),
    "q249_golden_record"      -> (q249 _),
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

  /** Chained-CTE power iteration mirroring [[pageRank]] exactly:
    * `(1.0 - 0.85)` is spelled as the same subtraction (not a 0.15
    * literal) so both engines fold the identical double. Parameterized
    * on the round count: q127 certifies 5 cold rounds; q414 certifies
    * 3 persisted + 1 warm against the 4-round unroll.
    */
  private def pageRankOracleIters(iters: Int): String = {
    val head =
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM pairs WHERE src <> dst
        |    UNION ALL
        |    SELECT dst AS src, src AS dst FROM pairs WHERE src <> dst)),
        |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        |pr0 AS (SELECT src AS id, 1.0 / n AS pr FROM deg CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS id,
         |         (1.0 - 0.85) / nn.n + 0.85 * SUM(p.pr / deg.d) AS pr
         |  FROM edges e
         |  JOIN pr${i - 1} p ON p.id = e.src
         |  JOIN deg ON deg.src = e.src
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT id, CAST(ROUND(pr * 1000000) AS BIGINT) AS pr_e6 FROM pr$iters ORDER BY id"
  }

  private val pageRankOracle: String = pageRankOracleIters(5)

  /** Weighted power-iteration oracle: identical chain to
    * [[pageRankOracle]] with strength normalization — every count CAST
    * to DOUBLE, contribution `pr · w / d`.
    */
  private val pageRankWeightedOracle: String = {
    val iters = 5
    val head =
      """WITH p0 AS (
        |  SELECT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |pairs AS (
        |  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w
        |  FROM p0 WHERE src <> dst GROUP BY src, dst),
        |edges AS (
        |  SELECT src, dst, w FROM pairs
        |  UNION ALL
        |  SELECT dst AS src, src AS dst, w FROM pairs),
        |deg AS (SELECT src, SUM(w) AS d FROM edges GROUP BY src),
        |nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg),
        |pr0 AS (SELECT src AS id, 1.0 / n AS pr FROM deg CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS id,
         |         (1.0 - 0.85) / nn.n + 0.85 * SUM(p.pr * e.w / deg.d) AS pr
         |  FROM edges e
         |  JOIN pr${i - 1} p ON p.id = e.src
         |  JOIN deg ON deg.src = e.src
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.n)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT id, CAST(ROUND(pr * 1000000) AS BIGINT) AS pr_e6 FROM pr$iters ORDER BY id"
  }

  /** Personalized oracle: the q127 chain with seed-concentrated pr0
    * and per-round restart (seeds = odd ids).
    */
  private val pageRankPersonalOracle: String = {
    val iters = 5
    val head =
      """WITH pairs AS (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS (
        |  SELECT DISTINCT src, dst FROM (
        |    SELECT src, dst FROM pairs WHERE src <> dst
        |    UNION ALL
        |    SELECT dst AS src, src AS dst FROM pairs WHERE src <> dst)),
        |deg AS (SELECT src, CAST(COUNT(*) AS DOUBLE) AS d FROM edges GROUP BY src),
        |nn AS (SELECT
        |         CAST(SUM(CASE WHEN src % 2 = 1 THEN 1 ELSE 0 END) AS DOUBLE) AS ns
        |       FROM deg),
        |pr0 AS (SELECT src AS id,
        |          CASE WHEN src % 2 = 1 THEN 1.0 / ns ELSE 0.0 END AS pr
        |        FROM deg CROSS JOIN nn)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""pr$i AS (
         |  SELECT e.dst AS id,
         |         CASE WHEN e.dst % 2 = 1 THEN (1.0 - 0.85) / nn.ns ELSE 0.0 END
         |           + 0.85 * SUM(p.pr / deg.d) AS pr
         |  FROM edges e
         |  JOIN pr${i - 1} p ON p.id = e.src
         |  JOIN deg ON deg.src = e.src
         |  CROSS JOIN nn
         |  GROUP BY e.dst, nn.ns)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT id, CAST(ROUND(pr * 1000000) AS BIGINT) AS pr_e6 FROM pr$iters ORDER BY id"
  }

  /** q355 oracle: the SAME recursive-CTE closure as q102's, then the
    * identical flag/closure/censuses — exact integers, one mirrored
    * share division.
    */
  private val optoutClosureOracle: String =
    s"""$componentsCte,
       |fl AS (
       |  SELECT d.source, c.component,
       |         CASE WHEN d.source IN ('src5', 'src13') THEN 1 ELSE 0 END
       |           AS opt
       |  FROM comp c JOIN documents d ON d.doc_id = c.doc_id),
       |cf AS (SELECT component, MAX(opt) AS comp_flagged
       |       FROM fl GROUP BY component)
       |SELECT fl.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |       CAST(SUM(fl.opt) AS BIGINT) AS n_direct,
       |       CAST(SUM(CASE WHEN fl.opt = 0 AND cf.comp_flagged = 1
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_dragged,
       |       CAST(ROUND(CAST(SUM(fl.opt) +
       |           SUM(CASE WHEN fl.opt = 0 AND cf.comp_flagged = 1
       |               THEN 1 ELSE 0 END) AS DOUBLE)
       |         / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
       |         AS drop_share_e6
       |FROM fl JOIN cf ON cf.component = fl.component
       |GROUP BY fl.source ORDER BY fl.source""".stripMargin

  val oracleSql: Map[String, String] = Map(
    "q355_optout_closure" -> optoutClosureOracle,
    "q102_neardup_components" -> componentsOracle,
    "q119_component_best"     -> componentBestOracle,
    // Same oracle as q102 by design: both CC implementations must
    // produce the identical labeling.
    "q120_components_star"    -> componentsOracle,
    // Same oracle AGAIN by design: the warm-started incremental run
    // must reach the identical labeling as the cold run and the
    // recursive-CTE ground truth.
    "q415_components_warm"    -> componentsOracle,
    // The FULL band-pair set (q65's certified chain) restricted to
    // pairs touching the new (odd) half — the Spark side derives it
    // incrementally (new-half fingerprints + the persisted old-half
    // fingerprint store), so a hash match certifies the incremental
    // derivation ≡ from-scratch on exactly the pairs it claims.
    "q424_inc_band_pairs" ->
      s"""${Dedup.simhashCandCte()}
         |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
         |FROM cand
         |WHERE bit_count(xor(ha, hb)) <= 2
         |  AND (id_a % 2 = 1 OR id_b % 2 = 1)
         |ORDER BY id_a, id_b""".stripMargin,
    "q127_pagerank"           -> pageRankOracle,
    // The 4-round cold unroll: Spark answers with 3 PERSISTED rounds +
    // 1 warm round off the rank store — equality certifies the
    // warm ≡ cold incremental contract.
    "q414_pagerank_warm"      -> pageRankOracleIters(4),
    "q147_pagerank_weighted"  -> pageRankWeightedOracle,
    "q148_pagerank_personal"  -> pageRankPersonalOracle,
    "q138_dup_size_hist" ->
      s"""$componentsCte
         |SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_components
         |FROM (SELECT component, CAST(COUNT(*) AS BIGINT) AS sz
         |      FROM comp GROUP BY component)
         |GROUP BY sz ORDER BY sz""".stripMargin,
    // Same md5-prefix bucketing as Sampling.hashSplit ('cd'/'e6'
    // thresholds), keyed on the component label.
    "q235_cluster_split" ->
      s"""$componentsCte,
         |sp AS (
         |  SELECT doc_id, component,
         |         CASE WHEN substr(md5(CAST(component AS VARCHAR)), 1, 2) < 'cd'
         |                THEN 'train'
         |              WHEN substr(md5(CAST(component AS VARCHAR)), 1, 2) < 'e6'
         |                THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM comp)
         |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
         |       CAST(COUNT(DISTINCT component) AS BIGINT) AS n_components
         |FROM sp GROUP BY split
         |ORDER BY split""".stripMargin,
    // Same labeling CTE; the canonical pick is an independent window
    // formulation (n_chars DESC, doc_id) of the engine's struct-max.
    "q249_golden_record" ->
      s"""$componentsCte,
         |g AS (
         |  SELECT c.component, d.doc_id, d.n_chars, d.source
         |  FROM comp c JOIN documents d USING (doc_id)),
         |ranked AS (
         |  SELECT component, doc_id, n_chars,
         |         ROW_NUMBER() OVER (PARTITION BY component
         |                            ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM g),
         |stats AS (
         |  SELECT component, CAST(COUNT(*) AS BIGINT) AS n_members,
         |         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         |         CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
         |  FROM g GROUP BY component)
         |SELECT stats.component, r.doc_id AS canonical_id,
         |       CAST(r.n_chars AS BIGINT) AS canonical_chars,
         |       n_members, total_chars, n_sources
         |FROM stats JOIN ranked r
         |  ON r.component = stats.component AND r.rn = 1
         |ORDER BY stats.component""".stripMargin,
    // Funnel stages mirrored: exact-dedup keeps min id per md5; the
    // near-dup stage keeps the min SURVIVING id per component; the
    // decontam stage drops survivors sharing any 5-gram with the eval
    // docs (same gram construction as the q104 oracle).
    "q146_cleaning_funnel" ->
      s"""$componentsCte,
         |ftr AS (SELECT doc_id, text FROM documents
         |        WHERE doc_id < 1000 AND doc_id % 7 <> 0),
         |fs2 AS (SELECT MIN(doc_id) AS doc_id FROM ftr GROUP BY md5(text)),
         |fs3 AS (SELECT MIN(c.doc_id) AS doc_id
         |        FROM comp c JOIN fs2 USING (doc_id)
         |        GROUP BY c.component),
         |ft AS (SELECT doc_id, string_split(text, ' ') AS ws
         |       FROM documents WHERE doc_id < 1000),
         |fg AS (SELECT doc_id,
         |         CASE WHEN len(ws) >= 5 THEN
         |           list_distinct(list_transform(range(1, len(ws) - 3),
         |             i -> array_to_string(ws[i:i+4], ' ')))
         |         ELSE CAST([] AS VARCHAR[]) END AS grams
         |       FROM ft),
         |fe AS (SELECT DISTINCT unnest(grams) AS gram FROM fg WHERE doc_id % 7 = 0),
         |fhit AS (
         |  SELECT DISTINCT x.doc_id
         |  FROM (SELECT doc_id, unnest(grams) AS gram FROM fg) x
         |  JOIN fe USING (gram)
         |  JOIN fs3 ON fs3.doc_id = x.doc_id),
         |fs4 AS (SELECT doc_id FROM fs3
         |        WHERE doc_id NOT IN (SELECT doc_id FROM fhit))
         |SELECT * FROM (
         |  SELECT CAST(1 AS BIGINT) AS stage_id, 'raw' AS stage,
         |         CAST((SELECT COUNT(*) FROM ftr) AS BIGINT) AS docs
         |  UNION ALL SELECT CAST(2 AS BIGINT), 'exact_dedup',
         |         CAST((SELECT COUNT(*) FROM fs2) AS BIGINT)
         |  UNION ALL SELECT CAST(3 AS BIGINT), 'near_dedup',
         |         CAST((SELECT COUNT(*) FROM fs3) AS BIGINT)
         |  UNION ALL SELECT CAST(4 AS BIGINT), 'decontaminated',
         |         CAST((SELECT COUNT(*) FROM fs4) AS BIGINT))
         |ORDER BY stage_id""".stripMargin,
  )
}
