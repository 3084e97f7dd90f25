package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Graph analytics beyond the walk family in [[Components]]: HITS
  * (hubs/authorities), triangle counting, and degree assortativity —
  * the structural link-graph measures a crawl-curation pipeline
  * publishes next to PageRank (authority for source ranking, triangle
  * density / assortativity for spam-farm and scraper-ring detection:
  * organic link neighborhoods are triangle-rich and weakly
  * disassortative; generated farms are star-shaped).
  *
  * Scale design (100 TB): everything here is join + agg over edge
  * frames — no adjacency structure ever reaches the driver. HITS is
  * the same node-sized power iteration as [[Components.pageRank]];
  * triangle counting uses degree orientation (Suri & Vassilvitskii,
  * "Counting Triangles and the Curse of the Last Reducer", WWW'11),
  * which caps every wedge fan-out at O(sqrt(m)) regardless of hub
  * degree — the canonical MapReduce fix for the power-law hot key.
  */
object Graph {

  // ---- HITS ---------------------------------------------------------------

  /** Hubs & authorities by power iteration (Kleinberg's HITS) over a
    * DIRECTED edge frame: auth'(v) = Σ_{u→v} hub(u), hub'(u) =
    * Σ_{u→v} auth(v), each half-round L1-normalized (scores sum to 1,
    * so they read as mass like PageRank and stay in intScaled range).
    *
    * Loop discipline: the edge frame is checkpointed once; each
    * half-round eagerly checkpoints its RAW contraction (it is branched
    * twice — by the normalizing total and by the next half-round — and
    * a lazy branch would re-run the contraction per use, doubling work
    * per round). The normalizing total is a one-row agg crossJoin —
    * the accepted broadcast global-stats shape. Frames are node-sized
    * throughout; the corpus-sized piece (the edge derivation) runs
    * once at session shuffle width before the loop.
    *
    * @param edges two-column directed frame `src`,`dst` (duplicates
    *              collapsed, self-loops dropped)
    * @return (`id`, `role` ∈ hub|auth, `score`); a node that is both a
    *         hub and an authority gets two rows
    */
  def hits(
      edges: DataFrame,
      iterations: Int = 4,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(iterations >= 1, s"hits: iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    val e = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .localCheckpoint(true)
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => Components.withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      // TWO pre-partitioned copies of the edge frame (r13 verdict item
      // 1): the auth half-round joins on `src`, the hub half-round on
      // `dst` — one distribution cannot serve both. `localCheckpoint`
      // preserves the repartition's outputPartitioning, so each
      // half-round exchanges only the node-sized score frame instead of
      // re-exchanging the edge frame 2×iterations times. Storage is 2×
      // the edge frame — the same class of footprint the join needs in
      // flight anyway.
      // Pre-sorted on the join key too, materialized under AQE-off so
      // the checkpoint actually captures the distribution (the
      // runPageRank discipline — see Components.withAqeOff): SMJ's
      // edge side is then stream-merge only, no per-half-round
      // Exchange or Sort of the edge frame.
      val eSrc = Components.withAqeOff(spark) {
        loopShufflePartitions
          .map(w => e.repartition(w, col("src"))).getOrElse(e.repartition(col("src")))
          .sortWithinPartitions("src").localCheckpoint(true)
      }
      val eDst = Components.withAqeOff(spark) {
        loopShufflePartitions
          .map(w => e.repartition(w, col("dst"))).getOrElse(e.repartition(col("dst")))
          .sortWithinPartitions("dst").localCheckpoint(true)
      }
      val hubs = eSrc.select(col("src").as("id")).distinct().localCheckpoint(true)
      val nh = hubs.count()
      require(nh > 0, "hits: empty edge set after self-loop removal")
      var hub = hubs.select(col("id"), lit(1.0 / nh).as("h")).localCheckpoint(true)
      var auth: DataFrame = hub // replaced on the first half-round below
      (1 to iterations).foreach { _ =>
        val aRaw = eSrc.join(hub.select(col("id").as("src"), col("h")), "src")
          .groupBy(col("dst")).agg(sum(col("h")).as("a"))
          .select(col("dst").as("id"), col("a"))
          .localCheckpoint(true)
        auth = aRaw
          .withGlobalStats(aRaw.agg(sum(col("a")).as("tot")))
          .select(col("id"), (col("a") / col("tot")).as("a"))
        val hRaw = eDst.join(auth.select(col("id").as("dst"), col("a")), "dst")
          .groupBy(col("src")).agg(sum(col("a")).as("h"))
          .select(col("src").as("id"), col("h"))
          .localCheckpoint(true)
        hub = hRaw
          .withGlobalStats(hRaw.agg(sum(col("h")).as("tot")))
          .select(col("id"), (col("h") / col("tot")).as("h"))
      }
      hub.select(col("id"), lit("hub").as("role"), col("h").as("score"))
        .unionAll(
          auth.select(col("id"), lit("auth").as("role"), col("a").as("score")))
        .localCheckpoint(true) // materialize inside the scoped conf (q119 discipline)
    }
  }

  // ---- triangle counting --------------------------------------------------

  /** Canonicalized undirected edge frame: one (`a` < `b`) row per pair,
    * self-loops dropped, duplicates and reversed inputs collapsed.
    */
  private def canonEdges(edges: DataFrame): DataFrame =
    edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()

  /** Per-node triangle participation counts by degree-oriented wedge
    * join. Each undirected edge is oriented low→high by (degree, id);
    * wedges are enumerated only at a triangle's minimum vertex under
    * that total order, so every triangle is counted exactly once with
    * no post-dedup. All arithmetic is integer — the result hashes
    * exactly, no float discipline needed.
    *
    * Scale: the orientation bounds every node's wedge fan-out by its
    * ORIENTED out-degree ≤ O(sqrt(m)) — a power-law hub with 10⁶
    * neighbors contributes C(out,2) wedges over only its
    * higher-degree neighbors, not C(10⁶,2). The wedge→closing-edge
    * probe is an equi-join on the canonical pair, so AQE handles any
    * residual skew; nothing is ever collected.
    *
    * @param edges two-column frame `src`,`dst` (undirected; either
    *              orientation; self-loops and duplicates tolerated)
    * @return (`id`, `n_tri`) for every node in ≥ 1 triangle
    */
  def triangleCounts(edges: DataFrame): DataFrame = {
    val e = canonEdges(edges).localCheckpoint(true)
    triangleCountsCanon(e, degreesOf(e))
  }

  /** Per-node degree over a canonical (`a` < `b`) edge frame. */
  private def degreesOf(e: DataFrame): DataFrame =
    e.select(col("a").as("id"))
      .unionAll(e.select(col("b").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))

  /** [[triangleCounts]] body over an ALREADY-canonical, already-
    * materialized edge frame and its degree frame — the entry point the
    * memoized co-order cache uses so the wedge join never re-derives
    * what a sibling report already built.
    */
  private def triangleCountsCanon(e: DataFrame, deg: DataFrame): DataFrame = {
    val ed = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
    // orient low→high under the (deg, id) total order
    val aFirst = col("da") < col("db") || (col("da") === col("db") && col("a") < col("b"))
    val o = ed.select(
      when(aFirst, col("a")).otherwise(col("b")).as("src"),
      when(aFirst, col("b")).otherwise(col("a")).as("dst"))
      .localCheckpoint(true)
    val wedges = o.select(col("src").as("u"), col("dst").as("x"))
      .join(o.select(col("src").as("u"), col("dst").as("y")), "u")
      .filter(col("x") < col("y")) // one row per unordered wedge leg pair
    // x < y is enforced above and e is canonical (a < b), so the
    // closing-edge probe is a plain two-key equi-join.
    val tri = wedges.join(
      e, col("x") === col("a") && col("y") === col("b"))
      .select(col("u"), col("x"), col("y"))
    tri.select(explode(array(col("u"), col("x"), col("y"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  /** Canonical-orientation triangle enumeration (a<b<c three-way
    * self-join) — the textbook form the DuckDB oracle runs. Kept as a
    * library member so the spec can assert it equals the degree-
    * oriented path on real data; NOT the scale path (a low-id hub's
    * canonical out-degree is its full degree — the last-reducer curse).
    */
  private[graft] def triangleCountsCanonical(edges: DataFrame): DataFrame = {
    val e = canonEdges(edges).localCheckpoint(true)
    val tri = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), "y")
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    tri.select(explode(array(col("x"), col("y"), col("z"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("n_tri"))
  }

  // ---- link prediction ----------------------------------------------------

  /** Link-prediction candidates: the top-N NON-adjacent pairs ranked by
    * common-neighbor count, with the Adamic-Adar score Σ 1/ln(deg(z))
    * riding along (the related-content / co-purchase suggestion signal;
    * in corpus curation, the "these two sources cover the same topic"
    * prior). Ranking is by the all-integer total order (cn DESC, x, y)
    * — never by the float score — so the result set is deterministic
    * across engines; aa is scored output, not a sort key.
    *
    * Scale: wedge fan-out is Σ deg(z)² — the classic hot-spot. `degCap`
    * excludes mega-hub intermediates from wedge generation BEFORE the
    * join (the q109 df-cap discipline): a node co-ordered with
    * everything asserts nothing about any specific pair, and production
    * link predictors drop such hubs outright. The cap bounds per-key
    * fan-out at degCap²; the top-N is TakeOrderedAndProject (no global
    * sort). deg(z) ≥ 2 for any common neighbor, so 1/ln(deg) is finite.
    *
    * @param edges  two-column undirected frame `src`,`dst`
    * @param topN   result size (rank by cn DESC, then pair ids)
    * @param degCap wedge intermediates with degree > cap are excluded
    */
  def linkPrediction(edges: DataFrame, topN: Int, degCap: Int): DataFrame =
    linkPredictionFrom(canonEdges(edges), topN, degCap)

  /** [[linkPrediction]] over an ALREADY-canonical edge frame (one
    * `a` < `b` row per pair, no self-loops, no duplicates — e.g. the
    * co-order graph's pair projection, canonical by construction from
    * its `a < b` groupBy keys). Skips the redundant canonicalization
    * (a full distinct Exchange of the edge frame — r18, guide §2.4:
    * remove shuffles on data that is already unique).
    */
  private[graft] def linkPredictionFrom(
      canon: DataFrame, topN: Int, degCap: Int): DataFrame = {
    require(topN >= 1 && degCap >= 2,
      s"linkPrediction: need topN >= 1, degCap >= 2; got $topN, $degCap")
    val e = canon.select(col("a"), col("b")).localCheckpoint(true)
    val sym = e.select(col("a").as("z"), col("b").as("n"))
      .unionAll(e.select(col("b").as("z"), col("a").as("n")))
    // (z, neighbor, 1/ln deg(z)) for capped intermediates only. deg ≥ 2
    // keeps ln(deg) > 0 — a deg-1 node can't form a wedge anyway, this
    // just keeps the 1/0 non-value out of both engines' frames.
    val zw = sym.groupBy(col("z")).agg(count(lit(1)).as("deg"))
      .filter(col("deg") >= 2 && col("deg") <= degCap)
      .select(col("z"), (lit(1.0) / log(col("deg"))).as("w"))
    // Checkpoint the capped adjacency ONCE: the wedge self-join below
    // consumes it on BOTH sides, and without the cut each side re-runs
    // the sym union, the degree agg, and the cap join (two full
    // exchange chains for one frame — r13 q153 re-pin: 4.9 → ~3.4 s at
    // sf0.1). Edge-sized, same footprint the join needs in flight.
    val wz = sym.join(zw, "z").localCheckpoint(true)
    val wedges = wz.select(col("z"), col("n").as("x"), col("w"))
      .join(wz.select(col("z"), col("n").as("y")), "z")
      .filter(col("x") < col("y"))
    // r17 optimization (guide §2.3 — shuffle fewer bytes): the wedge
    // stream is Σ C(deg(z), 2) rows with a near-unique (x, y) key
    // (18.5M wedges → 15.1M distinct pairs at sf0.1), so the pair agg
    // IS the dominant stage and its per-row key cost doubles it. When
    // the id domain provably packs — non-negative ids with
    // (maxId+1)² < 2⁶³ — the two-column key collapses to ONE long,
    // measured 6.5 → 3.5 s on the sf0.1 wedge stage (narrower shuffle
    // rows, single-word hash/compare in both agg passes). Ids outside
    // that domain keep the two-column agg — same result either way
    // (the pack is bijective on [0, maxId]²; counts and the w-sum are
    // over exactly the same wedge rows, and double-sum order was
    // never deterministic across partitionings to begin with — the
    // e6 grid absorbs it, measured like every aa margin).
    val idType = e.schema("a").dataType
    // Integral ids only (r17 ADVICE): for string ids the min/max are
    // LEXICOGRAPHIC before the cast, and double/decimal ids truncate —
    // either could understate maxId and let distinct pairs collide in
    // the packed key. Non-integral domains take the two-column path.
    val integral = idType match {
      case org.apache.spark.sql.types.ByteType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.LongType => true
      case _ => false
    }
    // The bounds probe itself must be gated on `integral`: ANSI cast
    // THROWS on non-numeric strings, so non-integral domains must not
    // even run the agg (they take the two-column path unconditionally).
    val bounds =
      if (integral)
        Some(e.agg(
          min(col("a")).cast("long").as("lo"),
          max(col("b")).cast("long").as("hi")).head())
      else None
    val packable = bounds.exists(b =>
      !b.isNullAt(0) && b.getLong(0) >= 0L &&
        b.getLong(1) < 3037000499L) // (maxId+1)^2 < 2^63
    val top =
      if (packable) {
        val stride = bounds.get.getLong(1) + 1L
        // r18 (guide §2.3): the anti-join and the top-N ride the packed
        // key too — e's ids define `bounds`, so e packs under the same
        // stride, and k = x·stride + y is MONOTONE in the (x, y) lex
        // order (stride > maxId ≥ y), making (cn DESC, k ASC) exactly
        // the declared (cn DESC, x, y) total order. The ~15M-row
        // candidate frame now anti-joins and ranks on one long instead
        // of two columns; only the topN survivors pay the decode.
        val eK = e.select(
          (col("a").cast("long") * stride + col("b").cast("long")).as("k"))
        wedges
          .select((col("x").cast("long") * stride + col("y").cast("long"))
            .as("k"), col("w"))
          .groupBy(col("k"))
          .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
          .join(eK, Seq("k"), "left_anti")
          .orderBy(col("cn").desc, col("k"))
          .limit(topN)
          .select(expr(s"k DIV $stride").cast(idType).as("x"),
            (col("k") % stride).cast(idType).as("y"),
            col("cn"), col("aa"))
      } else {
        wedges.groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("cn"), sum(col("w")).as("aa"))
          .join(e, col("x") === col("a") && col("y") === col("b"), "left_anti")
          .orderBy(col("cn").desc, col("x"), col("y"))
          .limit(topN)
      }
    top.select(col("x"), col("y"), col("cn"),
      Similarity.intScaled(col("aa"), 1000000L).as("aa_e6"))
  }

  // ---- seed distance (multi-source BFS) -----------------------------------

  /** Hop distance from a SEED set, bounded at `maxDepth`: multi-source
    * BFS by iterated min-relaxation — the "crawl depth from trusted
    * domains" signal (and the integer cousin of personalized PageRank's
    * proximity score). Round r computes dist_r(v) = min(dist_{r-1}(v),
    * 1 + min over neighbors); after `maxDepth` rounds every node within
    * that many hops carries its exact distance. All-integer — hashes
    * exactly, no float discipline.
    *
    * Scale: each round is one node-sized equi-join + min-agg against
    * the checkpointed symmetric edge frame (the CC loop's shape with a
    * FIXED round count — depth bounds are how production BFS runs: a
    * crawl frontier beyond ~6 hops of every seed is noise). The dist
    * frame is eagerly checkpointed per round: it is branched twice
    * (carry-over + propagation), and a lazy chain would double the
    * plan per round. Nodes unreached within `maxDepth` are absent from
    * the output (their distance is not yet known — emitting a sentinel
    * would hash a claim the computation hasn't established).
    *
    * @param edges  two-column undirected frame `src`,`dst`
    * @param isSeed predicate over node ids, evaluated in-plan
    */
  def seedDistance(
      edges: DataFrame,
      isSeed: Column => Column,
      maxDepth: Int = 6,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    val spark = edges.sparkSession
    val e = canonEdges(edges).localCheckpoint(true)
    val sym = e.select(col("a").as("src"), col("b").as("dst"))
      .unionAll(e.select(col("b").as("src"), col("a").as("dst")))
    // Pre-partitioned by the per-round join key in BOTH branches
    // (r13 verdict item 1 — the runPageRank comment has the full
    // rationale): rounds exchange only the node-sized dist frame.
    val symC = Components.withAqeOff(spark) {
      loopShufflePartitions
        .map(w => sym.repartition(w, col("src")))
        .getOrElse(sym.repartition(col("src")))
        .sortWithinPartitions("src").localCheckpoint(true)
    }
    seedDistanceFrom(symC, isSeed, maxDepth, loopShufflePartitions)
  }

  /** [[seedDistance]] over an ALREADY-prepared symmetric edge frame —
    * src-partitioned, src-sorted, checkpointed (exactly the shape
    * [[Components.PreparedWalk]] holds). r17: q156 consumes the
    * session-shared walk prep instead of rebuilding the same frame.
    */
  private[ext] def seedDistanceFrom(
      symC: DataFrame,
      isSeed: Column => Column,
      maxDepth: Int = 6,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(maxDepth >= 1, s"seedDistance: maxDepth must be >= 1, got $maxDepth")
    val spark = symC.sparkSession
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => Components.withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      var dist = symC.select(col("src").as("id")).distinct()
        .filter(isSeed(col("id")))
        .select(col("id"), lit(0L).as("dist"))
        .localCheckpoint(true)
      require(dist.head(1).nonEmpty, "seedDistance: no seed node touches an edge")
      (1 to maxDepth).foreach { _ =>
        dist = dist
          .unionAll(symC
            .join(dist.select(col("id").as("src"), col("dist")), "src")
            .select(col("dst").as("id"), (col("dist") + 1L).as("dist")))
          .groupBy(col("id")).agg(min(col("dist")).as("dist"))
          .localCheckpoint(true)
      }
      dist
    }
  }

  // ---- k-core -------------------------------------------------------------

  /** k-core of an undirected graph by iterative peeling: repeatedly
    * delete nodes of degree < k (with their edges) until none remain —
    * the standard "dense backbone" extraction (Seidman 1983); in a
    * crawl graph the k-core is where organic community structure
    * lives, and the peeled fringe is the long tail of weakly-attached
    * pages.
    *
    * Loop discipline (the [[Components.connectedComponents]] family):
    * per round one degree agg + two anti-joins + an eager
    * `localCheckpoint` (bounded lineage); convergence is detected by
    * the emptiness of the low-degree frame — `head(1)`, one action
    * per round. Peeling can cascade (removing a leaf re-exposes its
    * neighbor), so the round count is data-dependent; a path graph is
    * the O(n)-rounds worst case — `maxIter` bounds it and
    * NON-CONVERGENCE THROWS rather than returning a not-yet-fixed
    * frame.
    *
    * @return one row per surviving node: `id`, `core_deg` (its degree
    *         WITHIN the core — ≥ k for every row by the fixpoint)
    */
  def kCore(
      edges: DataFrame,
      k: Int,
      maxIter: Int = 30,
      loopShufflePartitions: Option[Int] = None): DataFrame = {
    require(k >= 1, s"kCore: k must be >= 1, got $k")
    val spark = edges.sparkSession
    val e0 = canonEdges(edges)
    // ONE materialization for the whole derivation chain: the
    // canonicalizing distinct runs at the SESSION shuffle width (the
    // corpus-sized stage never serializes onto the loop's 8 partitions
    // — the LPA lesson, r15), the explicit repartition then narrows to
    // the loop width, and the checkpoint is taken under AQE-off so it
    // captures the distribution. Pre-partitioned by `a` in both
    // branches: the low-degree frame usually broadcasts (anti joins
    // preserve the build side's distribution round over round), and
    // when it ever exceeds the broadcast threshold the SMJ fallback
    // finds `cur` already distributed on its first key.
    val cur0 = Components.withAqeOff(spark) {
      loopShufflePartitions
        .map(w => e0.repartition(w, col("a")))
        .getOrElse(e0.repartition(col("a")))
        .localCheckpoint(true)
    }
    def scoped[A](f: => A): A = loopShufflePartitions
      .map(p => Components.withSmallScope(spark, p)(f)).getOrElse(f)
    scoped {
      var cur = cur0
      var converged = false
      var round = 0
      while (round < maxIter && !converged) {
        val low = cur.select(col("a").as("id"))
          .unionAll(cur.select(col("b").as("id")))
          .groupBy(col("id")).agg(count(lit(1)).as("deg"))
          .filter(col("deg") < k).select(col("id"))
          .localCheckpoint(true)
        if (low.head(1).isEmpty) converged = true
        else {
          cur = cur
            .join(low.select(col("id").as("a")), Seq("a"), "left_anti")
            .join(low.select(col("id").as("b")), Seq("b"), "left_anti")
            .localCheckpoint(true)
          round += 1
        }
      }
      require(converged, s"kCore: no fixpoint after $maxIter peel rounds")
      cur.select(col("a").as("id")).unionAll(cur.select(col("b").as("id")))
        .groupBy(col("id")).agg(count(lit(1)).as("core_deg"))
    }
  }

  // ---- degree assortativity -----------------------------------------------

  /** Degree assortativity: Pearson correlation of endpoint degrees over
    * the symmetrized edge list (each undirected edge contributes both
    * orientations, the standard Newman convention). Float discipline:
    * the five moments are EXACT BIGINT sums — cross-engine identical by
    * construction — and r is one fixed expression tree over their
    * doubles, so both engines round the same IEEE values; the moments
    * ride along in the output as the primary (exactly-hashable) facts.
    *
    * @return one row: `n_ends`, `s_x`, `s_xx`, `s_xy` (BIGINT moments;
    *         symmetric, so Σy ≡ Σx and Σy² ≡ Σx²) and `r_e6`
    */
  def degreeAssortativity(edges: DataFrame): DataFrame = {
    val e = canonEdges(edges).localCheckpoint(true)
    degreeAssortativityCanon(e, degreesOf(e))
  }

  /** [[degreeAssortativity]] body over an already-canonical edge frame
    * and its degree frame (shared-cache entry point, like
    * [[triangleCountsCanon]]).
    */
  private def degreeAssortativityCanon(e: DataFrame, deg: DataFrame): DataFrame = {
    val ends = e
      .join(deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(col("da").as("dx"), col("db").as("dy"))
    val sym = ends.unionAll(ends.select(col("dy").as("dx"), col("dx").as("dy")))
    sym.agg(
      count(lit(1)).as("n_ends"),
      sum(col("dx")).as("s_x"),
      sum(col("dx") * col("dx")).as("s_xx"),
      sum(col("dx") * col("dy")).as("s_xy"))
      .select(col("n_ends"), col("s_x"), col("s_xx"), col("s_xy"),
        // Zero-variance guard: a regular graph (all degrees equal) has
        // n·s_xx − s_x² = 0; Pearson r is undefined there. Unguarded,
        // Spark's 0/0 yields NaN → intScaled → null while DuckDB
        // errors on CAST(NaN AS BIGINT) — a cross-engine divergence.
        // The integer denominator makes the == 0 test exact.
        when(col("n_ends") * col("s_xx") - col("s_x") * col("s_x") > 0,
          Similarity.intScaled(
            (col("n_ends") * col("s_xy") - col("s_x") * col("s_x")).cast("double") /
              (col("n_ends") * col("s_xx") - col("s_x") * col("s_x")).cast("double"),
            1000000L)).as("r_e6"))
  }

  // ---- declared queries ---------------------------------------------------

  /** Directed customer→supplier edge frame shared by q149 (same graph
    * as q127's undirected walk; even/odd keyspace split).
    */
  private def custSuppEdges(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.table(s, dir, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
  }

  private val custSuppCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  /** Memoized per-(session, dir) customer→supplier edge frame — the
    * [[coOrderGraph]] pattern applied to the OTHER shared fixture
    * graph: q127/q147/q148 (the three PageRank variants), q149 (HITS)
    * and q156 (BFS) all walk this graph, and each was re-paying the
    * orders⋈lineitem fact join to derive it. One `localCheckpoint`'d
    * frame (multiplicity preserved — q147's weighted walk sums it;
    * the unweighted walks dedup downstream in their canonical-
    * orientation pass) now feeds all five. Keyed on the session
    * OBJECT so a fresh session always recomputes; per-sfDir so tests
    * mixing fixtures never cross-read. O(|E|) executor storage —
    * the same frame any one consumer already materializes in-loop.
    */
  private[ext] def custSuppEdgesShared(s: SparkSession, dir: String): DataFrame =
    custSuppCache.computeIfAbsent((s, dir),
      _ => custSuppEdges(s, dir).localCheckpoint(true))

  /** The materialized part co-order graph: the distinct (order, part)
    * item frame, per-pair co-order SUPPORT counts, canonical edges,
    * per-node degrees, per-node triangle counts. Two parts are
    * adjacent when some order contains both; density FALLS with scale
    * (parts and orders both grow linearly, so pair probability ~1/N) —
    * the projection gets sparser, not denser, at 100 TB.
    *
    * r17: the frame carries pair SUPPORTS, not just the pair set —
    * q161 (association rules) and q318 (triple itemsets) each re-ran
    * the identical lineitem self-join + pair-count agg that the edge
    * derivation already pays (three computations of one frame per
    * sweep); the graph consumers project the counts away, and
    * `distinct pairs ≡ groupBy(a, b) keys` makes the edge set
    * unchanged. `items` is shared for the same reason (q161's
    * per-item supports, q318's Apriori prune and both n-orders
    * censuses read it).
    *
    * `deg`/`tri` are LAZY: an edges-only consumer (q153 — link
    * prediction over a bounded endpoint subset) must never pay the
    * triangle wedge join. The r13 100× audit caught exactly this: the
    * eager `tri` materialization spilled the disk to death on a
    * 100×-sf0.1 co-order graph that q153's own bounded plan never
    * touches. First ACTUAL consumer still pays once; the memo then
    * shares the checkpointed blocks.
    */
  private final class CoOrderGraph(s: SparkSession, dir: String) {
    val items: DataFrame = Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      .localCheckpoint(true)
    val pairSupports: DataFrame = items.select(col("o"), col("p").as("a"))
      .join(items.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("supp"))
      .localCheckpoint(true)
    val edges: DataFrame = pairSupports.select(col("a"), col("b"))
    lazy val deg: DataFrame = degreesOf(edges).localCheckpoint(true)
    lazy val tri: DataFrame = triangleCountsCanon(edges, deg).localCheckpoint(true)
  }

  private val coOrderCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), CoOrderGraph]

  /** Memoized per-(session, dir) co-order graph frames. q150 (triangle
    * counts), q151 (assortativity) and q171 (clustering coefficient)
    * are three reports over ONE graph; a production deployment
    * materializes that graph once and fans the reports out from it, so
    * the engine does the same — the first caller pays the lineitem
    * self-join and the degree-oriented wedge join, the siblings reuse
    * the `localCheckpoint`'d blocks (r8 bench: q150+q171 were 22.8 s
    * combined, ~half of it the duplicated wedge join). Keyed on the
    * session OBJECT so a fresh session (new JVM / restarted app) always
    * recomputes instead of touching dead block-manager state; entries
    * are per-sfDir so tests mixing fixtures never cross-read.
    *
    * Scale note: each cached frame is per-node or per-edge — O(|V|+|E|)
    * executor-storage blocks, the same footprint any one of the three
    * queries already needs in flight; nothing is driver-collected.
    */
  private def coOrderGraph(s: SparkSession, dir: String): CoOrderGraph =
    coOrderCache.computeIfAbsent((s, dir), _ => new CoOrderGraph(s, dir))

  /** Drop every session-scoped derived-frame memo in this object — see
    * [[SessionMemo]] (bench honesty: each timed round re-pays each
    * shared derivation exactly once).
    */
  private[ext] def clearSessionMemos(): Unit = {
    custSuppCache.clear()
    coOrderCache.clear()
    lpaCache.clear()
  }

  /** Shared distinct (order, part) item frame — see [[CoOrderGraph]]. */
  private[ext] def coOrderItems(s: SparkSession, dir: String): DataFrame =
    coOrderGraph(s, dir).items

  /** Shared per-pair co-order support counts — see [[CoOrderGraph]]. */
  private[ext] def coOrderPairSupports(s: SparkSession, dir: String): DataFrame =
    coOrderGraph(s, dir).pairSupports

  /** q149 — HITS on the directed customer→supplier graph: customers
    * are hubs (they only point), suppliers authorities (they are only
    * pointed at). 4 L1-normalized iterations; e6-scaled like q127.
    */
  def q149(s: SparkSession, dir: String): DataFrame =
    hits(custSuppEdgesShared(s, dir), iterations = 4, loopShufflePartitions = Some(8))
      .select(col("id"), col("role"),
        Similarity.intScaled(col("score"), 1000000L).as("score_e6"))
      .orderBy("id", "role")

  /** q150 — per-node triangle counts on the part co-order graph (the
    * clustering signal: organic neighborhoods close triangles, farms
    * don't). Degree-oriented on the Spark side; the oracle runs the
    * canonical a<b<c three-way join — same set by construction, and
    * GraphSpec asserts the two paths agree on this data. Consumes the
    * shared [[coOrderGraph]] materialization (one wedge join feeds
    * q150/q171, one edge frame feeds q151 too).
    */
  def q150(s: SparkSession, dir: String): DataFrame =
    coOrderGraph(s, dir).tri.orderBy("id")

  /** q151 — degree assortativity of the part co-order graph: exact
    * BIGINT moments + the e6-scaled Pearson r they determine. Shares
    * the [[coOrderGraph]] canonical-edge/degree frames.
    */
  def q151(s: SparkSession, dir: String): DataFrame = {
    val g = coOrderGraph(s, dir)
    degreeAssortativityCanon(g.edges, g.deg)
  }

  /** q153 — link-prediction top-500 on the part co-order graph,
    * BOUNDED to parts < 10000 (the q60/q65/q107 bounded-probe
    * discipline: candidate volume stays stable across scale factors —
    * at the sf0.01 gate every partkey is < 2000, so the bound is a
    * no-op there and the certified hash is unchanged; at sf0.1 it keeps
    * the Σ deg² wedge stage from dominating the whole bench sweep).
    * Non-adjacent pairs by common-neighbor count (integer rank), with
    * Adamic-Adar attached. degCap=1000 is deliberately non-binding on
    * the fixtures (GraphSpec proves it binds on a synthetic hub) — the
    * declared result certifies the uncapped semantics while the scale
    * lever stays in the plan.
    */
  def q153(s: SparkSession, dir: String): DataFrame =
    // The bound filters ENDPOINTS, so filtering the shared canonical
    // frame is identical to canonicalizing the filtered raw frame —
    // q153 reuses the cached lineitem self-join instead of paying it
    // again; and because the co-order pair projection is ALREADY
    // canonical (a < b groupBy keys, distinct by construction), the
    // canonical entry point skips the redundant distinct Exchange
    // (r18 — GraphSpec pins linkPredictionFrom ≡ linkPrediction on
    // this frame).
    linkPredictionFrom(
      coOrderGraph(s, dir).edges
        .filter(col("a") < 10000 && col("b") < 10000),
      topN = 500, degCap = 1000)

  /** q156 — BFS hop distance from the id%97=0 seed set on the
    * customer–supplier graph, depth 6: exact integer distances for
    * every node within 6 hops of a seed.
    */
  def q156(s: SparkSession, dir: String): DataFrame =
    // r17: rides the session-shared prepared walk (same symmetric pair
    // set the BFS built itself pre-r17 — canonical dedup then both
    // orientations — already src-partitioned/sorted/checkpointed; the
    // projection keeps the captured distribution).
    seedDistanceFrom(
      Components.custSuppWalkShared(s, dir, Some(8))
        .symDeg.select(col("src"), col("dst")),
      isSeed = _ % 97 === 0,
      maxDepth = 6, loopShufflePartitions = Some(8))
      .orderBy("id")

  /** q171 — per-node local clustering coefficient on the part
    * co-order graph: cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) — how
    * close each node's neighborhood is to a clique (the organic-vs-
    * farm signal q150's raw triangle counts feed; normalizing by the
    * wedge count makes hubs and leaves comparable). deg < 2 has no
    * wedge and yields NULL.
    *
    * Scale: composes the degree-oriented [[triangleCounts]] (the
    * scale path — no canonical-orientation hub blowup) with the
    * degree agg; the division is exact-integer in, deterministic
    * double out (the q161 pattern — no margin measurement needed).
    * Every node incident to an edge appears, triangle-free nodes
    * included (left join, count coalesced to 0).
    */
  def q171(s: SparkSession, dir: String): DataFrame = {
    val g = coOrderGraph(s, dir)
    g.deg.join(g.tri, Seq("id"), "left")
      .select(col("id"), col("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"),
        when(col("deg") >= 2,
          Similarity.intScaled(
            (coalesce(col("n_tri"), lit(0L)) * lit(2)).cast("double") /
              (col("deg") * (col("deg") - lit(1))),
            10000L)).as("cc_e4"))
      .orderBy("id")
  }

  /** Single source of truth for the q198 peel bound: the engine's
    * `maxIter` and the oracle's unrolled stage count MUST agree —
    * data needing more rounds than the oracle models has to surface
    * as the engine's loud non-convergence `require`, never as a
    * confusing hash mismatch at the gate (the data converges in 2;
    * spec-asserted headroom).
    */
  private[graft] val KcoreStages = 6

  /** q198 — 5-core of the customer↔supplier graph (k high enough to
    * actually peel this data: the 2-core is the whole graph, the
    * 5-core drops a cascade — binding, spec-asserted).
    */
  def q198(s: SparkSession, dir: String): DataFrame =
    kCore(custSuppEdgesShared(s, dir), k = 5, maxIter = KcoreStages,
      loopShufflePartitions = Some(8))
      .orderBy("id")

  /** q305 — partition-quality scorecard of the BRAND partition on the
    * part co-order graph: per-brand modularity contribution
    * q_c = m_c/m − (vol_c/2m)² and conductance φ_c = cut_c/min(vol_c,
    * 2m−vol_c). The "are these natural communities?" report — a brand
    * whose parts are co-ordered mostly with each other scores q_c > 0
    * and low φ; a brand scattered across the graph scores q_c ≈
    * −(vol/2m)² and φ → 1. In corpus curation this is the cluster-
    * validation step after ANY grouping (near-dup components q102,
    * k-means q44, topic buckets): a partition you'd act on must beat
    * the configuration-model null this statistic encodes.
    *
    * All-integer core: m, per-brand within/cut edge counts and degree
    * volumes are exact BIGINTs off the shared canonical edge frame;
    * q_e6/phi_e6 are the only doubles — one mirrored expression each,
    * e6-gridded, with conductance NULL-guarded by the exact integer
    * min(vol, 2m−vol) > 0 test (q151 discipline).
    *
    * Scale: reuses the memoized [[coOrderGraph]] edges/degrees (no new
    * corpus-sized work); the two brand joins ride the part dim; every
    * aggregate after them is brand-bounded. The one-row m broadcasts
    * (accepted global-stats shape).
    */
  def q305(s: SparkSession, dir: String): DataFrame = {
    val g = coOrderGraph(s, dir)
    val bl = Tables.table(s, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    val eb = g.edges
      .join(bl.select(col("p_partkey").as("a"), col("p_brand").as("ba")), "a")
      .join(bl.select(col("p_partkey").as("b"), col("p_brand").as("bb")), "b")
    val m = eb.agg(count(lit(1)).as("m"))
    val vol = g.deg
      .join(bl.select(col("p_partkey").as("id"), col("p_brand").as("brand")), "id")
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("vol"))
    val win = eb.filter(col("ba") === col("bb"))
      .groupBy(col("ba").as("brand")).agg(count(lit(1)).as("win"))
    val cut = eb.filter(col("ba") =!= col("bb"))
      .select(explode(array(col("ba"), col("bb"))).as("brand"))
      .groupBy(col("brand")).agg(count(lit(1)).as("cut"))
    val mn = least(col("vol"), lit(2L) * col("m") - col("vol"))
    val volD = col("vol").cast("double") / (lit(2L) * col("m")).cast("double")
    vol.join(win, Seq("brand"), "left").join(cut, Seq("brand"), "left")
      .withGlobalStats(m)
      .select(col("brand"), col("n_nodes"),
        coalesce(col("win"), lit(0L)).as("m_within"),
        coalesce(col("cut"), lit(0L)).as("cut_edges"),
        Similarity.intScaled(
          coalesce(col("win"), lit(0L)).cast("double") /
            col("m").cast("double") - volD * volD, 1000000L).as("q_e6"),
        when(mn > 0L,
          Similarity.intScaled(
            coalesce(col("cut"), lit(0L)).cast("double") / mn.cast("double"),
            1000000L)).as("phi_e6"))
      .orderBy("brand")
  }

  /** q310 — label-propagation communities (synchronous LPA, 4 fixed
    * rounds) on the part co-order graph: every node starts as its own
    * label and adopts, each round, the most frequent label among its
    * neighbors with the DETERMINISTIC (count DESC, label ASC)
    * tie-break. Output is the community-size table. Where q102/q120
    * find connectivity (everything co-ordered is one blob), LPA finds
    * DENSITY structure inside the blob — the product-affinity clusters
    * a recommender or a curation "topic bucket" pass actually wants;
    * q305 then validates any such partition against the null model.
    *
    * Determinism & exactness: labels are node ids, counts are
    * integers, the adoption rule is a total order — all-integer end to
    * end, no float anywhere (strongest certificate class). Fixed
    * rounds, not convergence-tested: synchronous LPA can 2-cycle on
    * bipartite-ish regions, and a fixed-round contract is what both
    * engines can replay exactly.
    *
    * Scale: each round is one edge-sized equi-join + two node-sized
    * aggs (the q127 fixed-round posture), eagerly checkpointed per
    * round inside a small-shuffle scope; the community table is
    * node-bounded.
    */
  /** Memoized final LPA labeling (id, lbl) — shared by q310 (community
    * sizes) and q315 (NMI vs the brand partition); the 4-round loop
    * runs once per session.
    */
  private val lpaCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def lpaLabels(s: SparkSession, dir: String): DataFrame =
    lpaCache.computeIfAbsent((s, dir), { _ => lpaLabelsFresh(s, dir) })

  /** Uncached LPA body — DevScaleAudit times this directly so the
    * session memo cannot hide the 10x cost. */
  private[graft] def lpaLabelsFresh(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // Min-support-2 affinity edges: parts co-ordered in >= 2
    // DISTINCT orders. The support floor prunes the incidental-
    // co-purchase noise that makes raw co-order graphs
    // near-complete (where LPA degenerates to one or two giant
    // labels) — the same reason q161's association rules and
    // q308's TextRank carry count floors. One extra lineitem
    // self-join beyond the shared coOrderGraph cache; the
    // aggregated (pair, support) frame is edge-sized.
    //
    // Built at the SESSION shuffle width with AQE on (the pageRank
    // discipline: the corpus-sized edge derivation never runs inside
    // the loop's narrow scope — at 100x a width-8 lineitem self-join
    // was the row's dominant cost) and checkpointed edge-sized, so the
    // narrow-scoped symmetrize/sort below starts from materialized
    // pairs instead of re-deriving the self-join.
    val li = Tables.table(s, dir, "lineitem")
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
    val e2 = li.select(col("o"), col("p").as("a"))
      .join(li.select(col("o"), col("p").as("b")), "o")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("supp"))
      .filter(col("supp") >= 2L)
      .localCheckpoint(true)
    Components.withSmallScope(s, 8) {
      // Loop-frame invariant (r14, Components.pageRank): the edge
      // frame every round joins on `u` must be checkpointed
      // partitioned AND sorted by `u`, with AQE off while the
      // checkpoint is taken — under AQE the LogicalRDD captures the
      // adaptive wrapper plan (UnknownPartitioning) and all 4 rounds
      // silently re-pay the edge-frame Exchange+Sort (this was the
      // family's worst 100x ratio before the fix). withSmallScope
      // already holds AQE off here.
      val sym = e2.select(col("a").as("u"), col("b").as("v"))
        .unionAll(e2.select(col("b").as("u"), col("a").as("v")))
        .repartition(8, col("u")).sortWithinPartitions("u")
        .localCheckpoint(true)
      var lab = sym.select(col("u").as("id")).distinct()
        .select(col("id"), col("id").as("lbl")).localCheckpoint(true)
      (1 to 4).foreach { round =>
        val cnt = sym.join(lab.select(col("id").as("u"), col("lbl")), "u")
          .groupBy(col("v"), col("lbl")).agg(count(lit(1)).as("c"))
        val w = Window.partitionBy("v").orderBy(col("c").desc, col("lbl"))
        val next = cnt.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("v").as("id"), col("lbl"))
        // Same dev-only probe as the pageRank loop: the SMJ edge side
        // must be a bare Scan ExistingRDD (no Exchange, no Sort).
        if (round == 1 && sys.env.contains("GRAFT_EXPLAIN_LOOP"))
          next.explain("formatted")
        lab = next.localCheckpoint(true)
      }
      lab
    }
  }

  def q310(s: SparkSession, dir: String): DataFrame =
    lpaLabels(s, dir)
      .groupBy(col("lbl").as("community")).agg(count(lit(1)).as("n_nodes"))
      .orderBy("community")

  /** q315 — normalized mutual information between the LPA communities
    * (q310) and the BRAND partition of the same parts: does the
    * behavioural clustering recover the catalog structure? The
    * partition-comparison yardstick (NMI = 2·I(X;Y)/(H(X)+H(Y)))
    * every clustering evaluation reports — q272's kappa compares
    * per-item judge labels, this compares whole PARTITIONS with
    * different label vocabularies, which kappa cannot do.
    *
    * Float discipline: every per-cell MI term (n_ij/n)·ln(n·n_ij/
    * (n_i·n_j)) and per-marginal entropy term is ONE mirrored double
    * over exact integers, e12-gridded BEFORE its exact sum (q232
    * discipline — n_ij ≥ 1 cells only, so no ln(0) exists); NMI is
    * one mirrored expression over the three gridded sums. NULL-guarded
    * on degenerate single-cluster partitions (H = 0).
    *
    * Scale: the contingency frame is node-bounded (≤ min(#communities
    * × #brands, #nodes) cells); everything rides the memoized LPA
    * labeling plus one broadcast part-dim join.
    */
  def q315(s: SparkSession, dir: String): DataFrame = {
    val lab = lpaLabels(s, dir)
      .join(Tables.table(s, dir, "part")
        .select(col("p_partkey").as("id"), col("p_brand").as("brand")), "id")
      .localCheckpoint(true)
    val cells = lab.groupBy(col("lbl"), col("brand"))
      .agg(count(lit(1)).as("nij"))
    val mx = cells.groupBy(col("lbl")).agg(sum(col("nij")).as("ni"))
    val my = cells.groupBy(col("brand")).agg(sum(col("nij")).as("nj"))
    val tot = cells.agg(sum(col("nij")).as("n"), count(lit(1)).as("n_cells"))
    val mi = cells.join(mx, "lbl").join(my, "brand")
      .withGlobalStats(tot)
      .select(Similarity.intScaled(
        col("nij").cast("double") / col("n").cast("double") *
          log(col("n").cast("double") * col("nij").cast("double") /
            (col("ni").cast("double") * col("nj").cast("double"))),
        1000000000000L).as("t"))
      .agg(sum(col("t")).as("mi_e12"))
    def ent(m: DataFrame, cnt: String): DataFrame =
      m.withGlobalStats(tot)
        .select(Similarity.intScaled(
          -(col(cnt).cast("double") / col("n").cast("double")) *
            log(col(cnt).cast("double") / col("n").cast("double")),
          1000000000000L).as("t"))
        .agg(sum(col("t")).as("h_" + cnt))
    tot.withGlobalStats(mi)
      .withGlobalStats(ent(mx, "ni")).withGlobalStats(ent(my, "nj"))
      .select(
        col("n").as("n_nodes"), col("n_cells"), col("mi_e12"),
        when(col("h_ni") + col("h_nj") > 0L,
          Similarity.intScaled(
            lit(2.0) * col("mi_e12").cast("double") /
              (col("h_ni") + col("h_nj")).cast("double"),
            1000000L)).as("nmi_e6"))
  }

  /** q367 — rich-club coefficient φ(k) of the part co-order graph at
    * k ∈ {2,4,8,16}: among nodes with degree > k, the realized edge
    * density 2E_k/(n_k(n_k−1)) — whether the hubs preferentially wire
    * to EACH OTHER (φ rising with k = a rich-club core; the
    * organic-vs-farmed structure question q151's assortativity asks
    * globally, answered level by level). Rides the memoized
    * [[coOrderGraph]] edges/degrees — no new graph computation.
    *
    * Exactness: node and edge censuses are exact integers off the
    * canonical edge frame; φ is ONE mirrored chain per k, e6-gridded;
    * degenerate levels (n_k ≤ 1) guard to NULL on both engines.
    *
    * Scale: two degree-keyed joins onto the edge frame, then BOTH
    * censuses value-collapse before the 4× threshold explode — nodes
    * to the degree histogram, edges to the min-endpoint-degree
    * histogram (da > k AND db > k ⟺ least(da,db) > k), so the explode
    * rides tens of histogram rows instead of 4× the edge frame (the
    * r11 audit's 2.1× edge); output 4 rows.
    */
  def q367(s: SparkSession, dir: String): DataFrame = {
    val g = coOrderGraph(s, dir)
    val ks = array(lit(2L), lit(4L), lit(8L), lit(16L))
    val degHist = g.deg.groupBy(col("deg")).agg(count(lit(1)).as("nd"))
    val nodes = degHist.withColumn("k", explode(ks))
      .filter(col("deg") > col("k"))
      .groupBy(col("k")).agg(sum(col("nd")).as("n_nodes"))
    val mdHist = g.edges
      .join(g.deg.select(col("id").as("a"), col("deg").as("da")), "a")
      .join(g.deg.select(col("id").as("b"), col("deg").as("db")), "b")
      .select(least(col("da"), col("db")).as("md"))
      .groupBy(col("md")).agg(count(lit(1)).as("nme"))
    val rich = mdHist.withColumn("k", explode(ks))
      .filter(col("md") > col("k"))
      .groupBy(col("k")).agg(sum(col("nme")).as("ne"))
    nodes.join(rich, Seq("k"), "left")
      .select(col("k"), col("n_nodes"),
        coalesce(col("ne"), lit(0L)).as("n_edges"),
        when(col("n_nodes") > 1L,
          Similarity.intScaled(
            lit(2.0) * coalesce(col("ne"), lit(0L)).cast("double") /
              (col("n_nodes").cast("double") *
                (col("n_nodes") - 1).cast("double")),
            1000000L)).as("phi_e6"))
      .orderBy("k")
  }

  /** q396 — average-neighbor-degree curve knn(k) of the part co-order
    * graph: for each degree k, the mean degree of the neighbors of
    * degree-k nodes — THE local assortativity read (q151's single
    * Pearson r says "hubs wire to hubs, yes/no"; knn(k) shows WHERE
    * along the degree axis the mixing turns — rising = assortative
    * core, falling = disassortative hub-and-spoke), on the EDGE-SLOT
    * convention: knn(k) = Σ_{slots of degree-k nodes} deg(neighbor) /
    * (k·n_k) — the convention that keeps the estimate a single exact
    * ratio (the node-mean-of-means alternative is a mean of per-node
    * rationals, a float per node before the aggregate).
    *
    * Exactness: degrees and slot censuses are exact integers off the
    * canonical edge frame; knn is ONE mirrored division per degree
    * row, e4-gridded. n_slots = k·n_k by construction (every degree-k
    * node contributes exactly k slots) — the spec pins the identity.
    *
    * Scale: two degree-keyed joins onto the symmetrized edge frame
    * (the q367 shape); output is degree-histogram-sized. Rides the
    * memoized [[coOrderGraph]] edges/degrees — no new graph build.
    */
  def q396(s: SparkSession, dir: String): DataFrame = {
    val g = coOrderGraph(s, dir)
    val ends = g.edges.select(col("a").as("node"), col("b").as("nb"))
      .unionAll(g.edges.select(col("b").as("node"), col("a").as("nb")))
    val nd = ends
      .join(g.deg.select(col("id").as("nb"), col("deg").as("nbdeg")), "nb")
      .join(g.deg.select(col("id").as("node"), col("deg").as("k")), "node")
      .groupBy(col("k"))
      .agg(count(lit(1)).as("n_slots"), sum(col("nbdeg")).as("sum_nb_deg"))
    val nk = g.deg.groupBy(col("deg").as("k")).agg(count(lit(1)).as("n_nodes"))
    nk.join(nd, Seq("k"))
      .select(col("k"), col("n_nodes"), col("n_slots"), col("sum_nb_deg"),
        Similarity.intScaled(
          col("sum_nb_deg").cast("double") / col("n_slots").cast("double"),
          10000L).as("knn_e4"))
      .orderBy("k")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q367_rich_club" -> (q367 _),
    "q396_avg_neighbor_degree" -> (q396 _),
    "q310_lpa_communities" -> (q310 _),
    "q315_community_nmi"  -> (q315 _),
    "q305_brand_modularity" -> (q305 _),
    "q149_hits"          -> (q149 _),
    "q150_triangles"     -> (q150 _),
    "q151_assortativity" -> (q151 _),
    "q153_link_predict"  -> (q153 _),
    "q156_seed_distance" -> (q156 _),
    "q171_clustering_coeff" -> (q171 _),
    "q198_kcore"         -> (q198 _),
  )

  /** Chained-CTE HITS oracle: same bipartite edge set, same 4
    * L1-normalized half-round pairs, totals taken over the raw
    * contraction (different summation grouping than Spark's — the
    * e6 grid absorbs the ulp drift; GraphSpec pins the boundary
    * margin, the q134 pattern).
    *
    * Every multiply-referenced CTE is `AS MATERIALIZED`: DuckDB
    * otherwise INLINES each reference, and this chain branches twice
    * per half-round (raw → total + normalize), so inlining re-expands
    * the whole upstream chain 4^iterations times — measured 15+ min
    * vs 0.6 s at sf0.01. The PageRank oracles don't need the hint
    * because their per-round CTEs are referenced exactly once.
    */
  private val hitsOracle: String = {
    val iters = 4
    val head =
      """WITH e AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |hubs AS (SELECT DISTINCT src AS id FROM e),
        |nh AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM hubs),
        |h0 AS (SELECT id, 1.0 / n AS h FROM hubs CROSS JOIN nh)""".stripMargin
    val rounds = (1 to iters).map { i =>
      s"""ar$i AS MATERIALIZED (
         |  SELECT dst AS id, SUM(h) AS a FROM e
         |  JOIN h${i - 1} ON h${i - 1}.id = e.src GROUP BY dst),
         |a$i AS MATERIALIZED (
         |  SELECT id, a / (SELECT SUM(a) FROM ar$i) AS a FROM ar$i),
         |hr$i AS MATERIALIZED (
         |  SELECT src AS id, SUM(a) AS h FROM e
         |  JOIN a$i ON a$i.id = e.dst GROUP BY src),
         |h$i AS MATERIALIZED (
         |  SELECT id, h / (SELECT SUM(h) FROM hr$i) AS h FROM hr$i)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"""
         |SELECT id, 'hub' AS role,
         |       CAST(ROUND(h * 1000000) AS BIGINT) AS score_e6 FROM h$iters
         |UNION ALL
         |SELECT id, 'auth' AS role,
         |       CAST(ROUND(a * 1000000) AS BIGINT) AS score_e6 FROM a$iters
         |ORDER BY id, role""".stripMargin
  }

  /** Part co-order canonical edge CTE shared by the q150/q151 oracles. */
  private val partEdgeCte: String =
    """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e AS (
      |  SELECT DISTINCT a.p AS a, b.p AS b
      |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p)""".stripMargin

  /** q198 oracle: the peel unrolled to a FIXED `KcoreStages` stages
    * (same constant as the engine's maxIter) — the data converges in
    * 2 (spec-asserted headroom); converged stages are no-ops, and if
    * real data ever needed more, the query itself throws (maxIter)
    * rather than silently disagreeing.
    */
  private val kcoreOracle: String = {
    val stages = KcoreStages
    val head =
      """WITH e0 AS MATERIALIZED (
        |  SELECT DISTINCT LEAST(o_custkey * 2, l_suppkey * 2 + 1) AS a,
        |         GREATEST(o_custkey * 2, l_suppkey * 2 + 1) AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey)""".stripMargin
    val rounds = (1 to stages).map { i =>
      s"""low$i AS MATERIALIZED (
         |  SELECT id FROM (
         |    SELECT id, COUNT(*) AS d FROM (
         |      SELECT a AS id FROM e${i - 1} UNION ALL SELECT b FROM e${i - 1})
         |    GROUP BY id)
         |  WHERE d < 5),
         |e$i AS MATERIALIZED (
         |  SELECT * FROM e${i - 1}
         |  WHERE a NOT IN (SELECT id FROM low$i)
         |    AND b NOT IN (SELECT id FROM low$i))""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"""
         |SELECT id, CAST(COUNT(*) AS BIGINT) AS core_deg FROM (
         |  SELECT a AS id FROM e$stages UNION ALL SELECT b FROM e$stages)
         |GROUP BY id ORDER BY id""".stripMargin
  }

  /** Shared CTE block computing the final LPA labeling as `l4(id,
    * lbl)` — prefix of both the q310 and q315 oracles.
    */
  private val lpaCteBlock: String = {
    val head =
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |e2 AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |sym AS (SELECT a AS u, b AS v FROM e2
        |        UNION ALL SELECT b, a FROM e2),
        |l0 AS (SELECT DISTINCT u AS id, u AS lbl FROM sym)""".stripMargin
    val rounds = (1 to 4).map { k =>
      s"""c$k AS (
         |  SELECT sym.v, l.lbl, COUNT(*) AS c
         |  FROM sym JOIN l${k - 1} l ON l.id = sym.u
         |  GROUP BY sym.v, l.lbl),
         |l$k AS (
         |  SELECT v AS id, lbl FROM (
         |    SELECT v, lbl,
         |           ROW_NUMBER() OVER (PARTITION BY v
         |                              ORDER BY c DESC, lbl) AS rn
         |    FROM c$k)
         |  WHERE rn = 1)""".stripMargin
    }
    (head +: rounds).mkString(",\n")
  }

  private val lpaOracle: String =
    lpaCteBlock +
      """
        |SELECT lbl AS community, CAST(COUNT(*) AS BIGINT) AS n_nodes
        |FROM l4 GROUP BY lbl
        |ORDER BY community""".stripMargin

  private val nmiOracle: String =
    lpaCteBlock +
      """,
        |lb AS (
        |  SELECT l4.lbl, p_brand AS brand
        |  FROM l4 JOIN part ON p_partkey = l4.id),
        |cells AS (SELECT lbl, brand, CAST(COUNT(*) AS BIGINT) AS nij
        |          FROM lb GROUP BY lbl, brand),
        |mx AS (SELECT lbl, CAST(SUM(nij) AS BIGINT) AS ni
        |       FROM cells GROUP BY lbl),
        |my AS (SELECT brand, CAST(SUM(nij) AS BIGINT) AS nj
        |       FROM cells GROUP BY brand),
        |tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS n,
        |               CAST(COUNT(*) AS BIGINT) AS n_cells
        |        FROM cells),
        |mi AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS mi_e12 FROM (
        |    SELECT CAST(ROUND(
        |      CAST(nij AS DOUBLE) / CAST(n AS DOUBLE) *
        |      ln(CAST(n AS DOUBLE) * CAST(nij AS DOUBLE) /
        |         (CAST(ni AS DOUBLE) * CAST(nj AS DOUBLE)))
        |      * 1000000000000) AS BIGINT) AS t
        |    FROM cells JOIN mx USING (lbl) JOIN my USING (brand)
        |    CROSS JOIN tot)),
        |hx AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS h_ni FROM (
        |    SELECT CAST(ROUND(
        |      -(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln(CAST(ni AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000000000) AS BIGINT) AS t
        |    FROM mx CROSS JOIN tot)),
        |hy AS (
        |  SELECT CAST(SUM(t) AS BIGINT) AS h_nj FROM (
        |    SELECT CAST(ROUND(
        |      -(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE)) *
        |      ln(CAST(nj AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 1000000000000) AS BIGINT) AS t
        |    FROM my CROSS JOIN tot))
        |SELECT n AS n_nodes, n_cells, mi_e12,
        |       CASE WHEN h_ni + h_nj > 0 THEN
        |         CAST(ROUND(2.0 * CAST(mi_e12 AS DOUBLE)
        |           / CAST(h_ni + h_nj AS DOUBLE) * 1000000) AS BIGINT)
        |       END AS nmi_e6
        |FROM tot CROSS JOIN mi CROSS JOIN hx CROSS JOIN hy""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Same canonical edge/degree frames, symmetrized slot join, one
    // mirrored knn division per degree row.
    "q396_avg_neighbor_degree" ->
      s"""$partEdgeCte,
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id),
         |ends AS (
         |  SELECT a AS node, b AS nb FROM e
         |  UNION ALL SELECT b AS node, a AS nb FROM e),
         |nd AS (
         |  SELECT dn.deg AS k, CAST(COUNT(*) AS BIGINT) AS n_slots,
         |         CAST(SUM(db.deg) AS BIGINT) AS sum_nb_deg
         |  FROM ends
         |  JOIN deg dn ON dn.id = ends.node
         |  JOIN deg db ON db.id = ends.nb
         |  GROUP BY dn.deg),
         |nk AS (SELECT deg AS k, COUNT(*) AS n_nodes FROM deg GROUP BY deg)
         |SELECT nk.k, nk.n_nodes, nd.n_slots, nd.sum_nb_deg,
         |  CAST(ROUND(CAST(nd.sum_nb_deg AS DOUBLE)
         |             / CAST(nd.n_slots AS DOUBLE) * 10000) AS BIGINT)
         |    AS knn_e4
         |FROM nk JOIN nd USING (k) ORDER BY k""".stripMargin,
    // Same canonical edge/degree frames as q150/q151, exact censuses
    // per threshold, one mirrored φ chain per k.
    "q367_rich_club" ->
      s"""$partEdgeCte,
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id),
         |ks AS (SELECT CAST(UNNEST([2, 4, 8, 16]) AS BIGINT) AS k),
         |nodes AS (
         |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_nodes
         |  FROM deg JOIN ks ON deg > k GROUP BY k),
         |ends AS (
         |  SELECT da.deg AS da, db.deg AS db
         |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
         |rich AS (
         |  SELECT k, CAST(COUNT(*) AS BIGINT) AS ne
         |  FROM ends JOIN ks ON da > k AND db > k GROUP BY k)
         |SELECT n.k, n.n_nodes,
         |  CAST(COALESCE(r.ne, 0) AS BIGINT) AS n_edges,
         |  CASE WHEN n.n_nodes > 1 THEN
         |    CAST(ROUND(2.0 * CAST(COALESCE(r.ne, 0) AS DOUBLE)
         |      / (CAST(n.n_nodes AS DOUBLE)
         |         * CAST(n.n_nodes - 1 AS DOUBLE)) * 1000000) AS BIGINT)
         |  END AS phi_e6
         |FROM nodes n LEFT JOIN rich r ON r.k = n.k ORDER BY n.k""".stripMargin,
    // Same symmetric edge frame, 4 unrolled all-integer adoption
    // rounds with the identical (count DESC, label) tie-break.
    "q310_lpa_communities" -> lpaOracle,
    // Shared LPA CTE block + brand contingency; per-cell/marginal
    // ln terms e12-gridded before exact sums, one mirrored NMI.
    "q315_community_nmi" -> nmiOracle,
    // Same canonical edge frame, exact BIGINT within/cut/volume
    // counts, mirrored modularity and conductance doubles e6-gridded,
    // conductance NULL-guarded by the exact integer min test.
    "q305_brand_modularity" ->
      s"""$partEdgeCte,
         |bl AS (SELECT p_partkey AS k, p_brand AS br FROM part),
         |eb AS (
         |  SELECT e.a, e.b, x.br AS ba, y.br AS bb
         |  FROM e JOIN bl x ON x.k = e.a JOIN bl y ON y.k = e.b),
         |m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM eb),
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id),
         |vol AS (
         |  SELECT br AS brand, CAST(COUNT(*) AS BIGINT) AS n_nodes,
         |         CAST(SUM(deg) AS BIGINT) AS vol
         |  FROM deg JOIN bl ON bl.k = deg.id GROUP BY br),
         |win AS (SELECT ba AS brand, CAST(COUNT(*) AS BIGINT) AS win
         |        FROM eb WHERE ba = bb GROUP BY ba),
         |cut AS (
         |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS cut FROM (
         |    SELECT ba AS brand FROM eb WHERE ba <> bb
         |    UNION ALL SELECT bb FROM eb WHERE ba <> bb)
         |  GROUP BY brand)
         |SELECT v.brand, n_nodes,
         |       COALESCE(win, 0) AS m_within,
         |       COALESCE(cut, 0) AS cut_edges,
         |       CAST(ROUND((CAST(COALESCE(win, 0) AS DOUBLE)
         |           / CAST(m AS DOUBLE)
         |         - (CAST(vol AS DOUBLE) / CAST(2 * m AS DOUBLE))
         |           * (CAST(vol AS DOUBLE) / CAST(2 * m AS DOUBLE)))
         |         * 1000000) AS BIGINT) AS q_e6,
         |       CASE WHEN LEAST(vol, 2 * m - vol) > 0 THEN
         |         CAST(ROUND(CAST(COALESCE(cut, 0) AS DOUBLE)
         |           / CAST(LEAST(vol, 2 * m - vol) AS DOUBLE)
         |           * 1000000) AS BIGINT) END AS phi_e6
         |FROM vol v LEFT JOIN win USING (brand) LEFT JOIN cut USING (brand)
         |CROSS JOIN m
         |ORDER BY v.brand""".stripMargin,
    "q149_hits" -> hitsOracle,
    "q198_kcore" -> kcoreOracle,
    "q150_triangles" ->
      s"""$partEdgeCte,
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e e1
         |  JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |nodes AS (
         |  SELECT x AS id FROM tri
         |  UNION ALL SELECT y FROM tri
         |  UNION ALL SELECT z FROM tri)
         |SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri
         |FROM nodes GROUP BY id ORDER BY id""".stripMargin,
    // q150's canonical triangle CTE + the degree CTE; the coefficient
    // is the identical exact-integer division both sides.
    "q171_clustering_coeff" ->
      s"""$partEdgeCte,
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e e1
         |  JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |nodes AS (
         |  SELECT x AS id FROM tri
         |  UNION ALL SELECT y FROM tri
         |  UNION ALL SELECT z FROM tri),
         |tc AS (SELECT id, CAST(COUNT(*) AS BIGINT) AS n_tri
         |       FROM nodes GROUP BY id),
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id)
         |SELECT d.id, d.deg, COALESCE(tc.n_tri, 0) AS n_tri,
         |  CASE WHEN d.deg >= 2 THEN
         |    CAST(ROUND(CAST(COALESCE(tc.n_tri, 0) * 2 AS DOUBLE)
         |               / (d.deg * (d.deg - 1)) * 10000) AS BIGINT)
         |  END AS cc_e4
         |FROM deg d LEFT JOIN tc USING (id)
         |ORDER BY id""".stripMargin,
    "q151_assortativity" ->
      s"""$partEdgeCte,
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id),
         |ends AS (
         |  SELECT da.deg AS dx, db.deg AS dy
         |  FROM e JOIN deg da ON da.id = e.a JOIN deg db ON db.id = e.b),
         |sym AS (SELECT dx, dy FROM ends UNION ALL SELECT dy, dx FROM ends),
         |m AS (
         |  SELECT CAST(COUNT(*) AS BIGINT) AS n_ends,
         |         CAST(SUM(dx) AS BIGINT) AS s_x,
         |         CAST(SUM(dx * dx) AS BIGINT) AS s_xx,
         |         CAST(SUM(dx * dy) AS BIGINT) AS s_xy
         |  FROM sym)
         |SELECT n_ends, s_x, s_xx, s_xy,
         |       CASE WHEN n_ends * s_xx - s_x * s_x > 0 THEN
         |         CAST(ROUND(
         |           (CAST(n_ends * s_xy - s_x * s_x AS DOUBLE) /
         |            CAST(n_ends * s_xx - s_x * s_x AS DOUBLE)) * 1000000)
         |           AS BIGINT)
         |       END AS r_e6
         |FROM m""".stripMargin,
    // aa is summed in a different order than Spark's partial aggs —
    // the e6 grid absorbs the ulp drift (GraphSpec pins the margin);
    // the RANKING is all-integer, so the row set itself is exact.
    "q153_link_predict" ->
      s"""$partEdgeCte,
         |ef AS (SELECT a, b FROM e WHERE a < 10000 AND b < 10000),
         |sym AS (SELECT a AS z, b AS n FROM ef UNION ALL SELECT b, a FROM ef),
         |zw AS (
         |  SELECT z, 1.0 / ln(COUNT(*)) AS w FROM sym GROUP BY z
         |  HAVING COUNT(*) BETWEEN 2 AND 1000),
         |wz AS (SELECT sym.z, sym.n, zw.w FROM sym JOIN zw ON zw.z = sym.z),
         |cand AS (
         |  SELECT w1.n AS x, w2.n AS y,
         |         CAST(COUNT(*) AS BIGINT) AS cn, SUM(w1.w) AS aa
         |  FROM wz w1 JOIN wz w2 ON w2.z = w1.z AND w1.n < w2.n
         |  GROUP BY w1.n, w2.n),
         |nonadj AS (
         |  SELECT c.* FROM cand c
         |  LEFT JOIN ef ON ef.a = c.x AND ef.b = c.y WHERE ef.a IS NULL)
         |SELECT x, y, cn, CAST(ROUND(aa * 1000000) AS BIGINT) AS aa_e6
         |FROM nonadj ORDER BY cn DESC, x, y LIMIT 500""".stripMargin,
    "q156_seed_distance" -> seedDistanceOracle,
  )

  /** Chained min-relaxation rounds — every d$i is referenced twice
    * (carry-over + propagation), so each is AS MATERIALIZED (the q149
    * inlining lesson). All-integer: the hash is exact.
    */
  private def seedDistanceOracle: String = {
    val depth = 6
    val head =
      """WITH p AS MATERIALIZED (
        |  SELECT DISTINCT o_custkey * 2 AS a, l_suppkey * 2 + 1 AS b
        |  FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        |edges AS MATERIALIZED (
        |  SELECT a AS src, b AS dst FROM p UNION ALL SELECT b, a FROM p),
        |d0 AS MATERIALIZED (
        |  SELECT DISTINCT src AS id, CAST(0 AS BIGINT) AS dist
        |  FROM edges WHERE src % 97 = 0)""".stripMargin
    val rounds = (1 to depth).map { i =>
      s"""d$i AS MATERIALIZED (
         |  SELECT id, MIN(dist) AS dist FROM (
         |    SELECT id, dist FROM d${i - 1}
         |    UNION ALL
         |    SELECT e.dst AS id, d${i - 1}.dist + 1 AS dist
         |    FROM d${i - 1} JOIN edges e ON e.src = d${i - 1}.id)
         |  GROUP BY id)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      s"\nSELECT id, dist FROM d$depth ORDER BY id"
  }
}
