package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled
import graft.ops.{GlobalStats, Sketches}

/** Round-13 batch. Two threads:
  *
  *   1. Sketch-path rollups that replace the registry's biggest
  *      event-family shuffles at the 100 TB design point, reported
  *      BESIDE their exact counterparts with measured error: rolling
  *      DAU/WAU/MAU off per-day HLL register files (q406 — the swap
  *      the r12 verdict named for q403), daily audience overlap via
  *      inclusion–exclusion off the SAME store (q407), and per-type
  *      gap tail quantiles off the grouped HDR census (q409).
  *   2. Census-sized chain/rank analytics: the event-type Markov
  *      stationary distribution on the e9 integer grid (q408) and the
  *      YoY revenue delta waterfall — the first SIGNED-domain
  *      TwoPhase caller (q410).
  *
  * Float discipline unchanged (q331+): exact integers up to ONE
  * mirrored double chain per output cell; DuckDB oracles spell
  * identical arithmetic; Round13Spec replays driver-side.
  */
object Round13 {

  /** q406 — DAU/WAU/MAU via portable-HLL register merge, beside exact:
    * per-day md5-HLL register files (≤ 256 rows/day REGARDLESS of
    * DAU), MAX-merged over trailing 7/30-day windows — HLL union, the
    * q97-certified merge — then estimated per day; the exact q403
    * censuses ride beside with the relative error e6 per metric.
    *
    * THE 100 TB swap this certifies: q403's rolling-distinct coverage
    * fan explodes every distinct (user, day) row 7× and 30× — linear
    * in user-days (the registry's biggest event-family shuffle, 2.6×
    * worst 10× ratio). Here the fan rides the REGISTER files: ≤ 256
    * rows per day times the window length, i.e. calendar-bounded
    * (≤ 256·30·days rows at ANY corpus size). A production run drops
    * the exact side (it exists here to MEASURE the error and to pin
    * the estimate against an oracle) and the event scan collapses
    * map-side to (day, reg, rho) — nothing downstream sees users.
    *
    * Exactness: registers are exact integers end to end (md5 hex →
    * reg/rank, MAX-merge associative — the fanned per-day merge is
    * bit-identical to registers built from the unioned day span,
    * spec-proved); the estimate is the q25/q97 mirrored chain (ONE
    * double division off an exact scaled-integer harmonic sum; the
    * linear-counting branch decided on that identical double — it
    * FIRES at sf0.001/0.01 where DAU ≤ 150, while sf0.1's MAU ≈ 1350
    * exercises the raw harmonic branch: both estimator paths are
    * oracle-certified). Each error cell is one mirrored double chain
    * (est_e2/100/exact − 1, e6) off two identical BIGINTs.
    *
    * Scale: ud collapses events map-side; the register file is the
    * only data-sized agg; every rolling merge, estimate, and join
    * below rides calendar-bounded frames (≤ days·256 rows). Trailing
    * windows are truncated at the span start exactly as q403's (both
    * engines alike; output restricted to observed-DAU days by the
    * inner joins).
    */
  def q406(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct()
      .localCheckpoint(true) // branched: exact censuses + register file
    // Per-day portable register file — ≤ 256 rows/day at any DAU.
    val regs = Sketches.hllPortableRegisters(ud, Seq("d"), col("user_id"))
      .localCheckpoint(true) // tiny; branched into three rolling merges
    def estRoll(k: Int, out: String) = {
      val merged =
        if (k == 1) regs.select(col("d").as("day"), col("reg"), col("rho"))
        else regs
          .select(explode(sequence(col("d"), col("d") + (k - 1))).as("day"),
            col("reg"), col("rho"))
          .groupBy(col("day"), col("reg")).agg(max(col("rho")).as("rho"))
      Sketches.hllPortableEstimate(merged, Seq("day"))
        .select(col("day"), col("est_e2").as(out))
    }
    // The exact q403 shape, kept to measure the sketch against.
    def exactRoll(k: Int, out: String) = ud
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + (k - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(out))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    def err(est: String, exact: String, out: String) =
      intScaled(col(est).cast("double") / lit(100.0) /
        col(exact).cast("double") - lit(1.0), 1000000L).as(out)
    dau
      .join(exactRoll(7, "wau"), "day")
      .join(exactRoll(30, "mau"), "day")
      .join(estRoll(1, "dau_est_e2"), "day")
      .join(estRoll(7, "wau_est_e2"), "day")
      .join(estRoll(30, "mau_est_e2"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        col("dau_est_e2"), col("wau_est_e2"), col("mau_est_e2"),
        err("dau_est_e2", "dau", "dau_err_e6"),
        err("wau_est_e2", "wau", "wau_err_e6"),
        err("mau_est_e2", "mau", "mau_err_e6"))
      .orderBy("day")
  }

  /** The production (sketch-only) form of [[q406]] — register fan +
    * estimates, NO exact coverage fan. Not a registered query (the
    * registered form carries the exact side precisely to MEASURE the
    * sketch); this exists so DevScaleAudit can price the swap itself:
    * the scaling row a 100 TB deployment actually pays.
    */
  private[graft] def q406SketchOnly(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct()
    val regs = Sketches.hllPortableRegisters(ud, Seq("d"), col("user_id"))
      .localCheckpoint(true)
    def estRoll(k: Int, out: String) = {
      val merged =
        if (k == 1) regs.select(col("d").as("day"), col("reg"), col("rho"))
        else regs
          .select(explode(sequence(col("d"), col("d") + (k - 1))).as("day"),
            col("reg"), col("rho"))
          .groupBy(col("day"), col("reg")).agg(max(col("rho")).as("rho"))
      Sketches.hllPortableEstimate(merged, Seq("day"))
        .select(col("day"), col("est_e2").as(out))
    }
    estRoll(1, "dau_est_e2")
      .join(estRoll(7, "wau_est_e2"), "day")
      .join(estRoll(30, "mau_est_e2"), "day")
      .orderBy("day")
  }

  /** q407 — daily cross-type audience overlap via HLL inclusion–
    * exclusion, beside exact: per (day, type-pair), the exact audience
    * sizes and intersection, and the sketch path — per-(type, day)
    * portable register files (the SAME store q406 would persist),
    * MAX-merged per pair for the union estimate, with
    * |A∩B| ≈ est(A) + est(B) − est(A∪B) in PURE INTEGER e2 arithmetic.
    * This certifies sketch COMPOSITIONALITY: one register store
    * answers DAU (q406) and audience overlap (here) without touching
    * users again. q279 reads the lifetime type-pair Jaccard (exact);
    * the day grain is what BINDS on this stream (fixture-probed:
    * lifetime audiences are all = the full population; daily pairwise
    * Jaccard spans 0.11–0.31).
    *
    * Exactness: registers exact integers; per-frame estimates are the
    * q25/q97 mirrored chain; the union file is the MAX-merge of the
    * two type files (commutes with building from the unioned user
    * set — the q406 spec-proved property; the oracle builds it from
    * raw pair user-days, the opposite order); the intersection
    * estimate is integer subtraction of three e2 BIGINTs; the error
    * cell is one mirrored double chain, emitted only when the exact
    * intersection is nonzero.
    *
    * Scale: ONE distinct collapse to (type, day, user); register files
    * are ≤ types·days·256 rows; pair grids, union merges, and
    * estimates all ride that census (types² · days · 256). The exact
    * side (kept to MEASURE the error) is the (day, user)-keyed pair
    * self-join — the piece a production run drops.
    */
  def q407(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val udt = Tables.events(s, dir)
      .select(col("event_type").as("t"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"),
        col("user_id"))
      .distinct()
      .localCheckpoint(true) // branched: registers + exact censuses + pairs
    val regs = Sketches.hllPortableRegisters(udt, Seq("t", "d"), col("user_id"))
      .localCheckpoint(true) // branched: per-type estimates + pair merges
    // (day, ta, tb) grid of types active that day — an equi-join on d
    // between two per-day type lists (≤ types rows/day each side).
    val active = regs.select(col("t"), col("d")).distinct()
      .localCheckpoint(true)
    val grid = active.select(col("d"), col("t").as("ta"))
      .join(active.select(col("d"), col("t").as("tb")), "d")
      .filter(col("ta") < col("tb"))
    // Union register file per (d, ta, tb): each member type's file
    // enters via its own equi-join (never an OR-join), MAX-merged.
    val uni = grid.join(regs.withColumnRenamed("t", "ta"), Seq("d", "ta"))
      .select(col("d"), col("ta"), col("tb"), col("reg"), col("rho"))
      .unionAll(grid.join(regs.withColumnRenamed("t", "tb"), Seq("d", "tb"))
        .select(col("d"), col("ta"), col("tb"), col("reg"), col("rho")))
      .groupBy(col("d"), col("ta"), col("tb"), col("reg"))
      .agg(max(col("rho")).as("rho"))
    val estT = Sketches.hllPortableEstimate(regs, Seq("t", "d"))
      .select(col("t"), col("d"), col("est_e2"))
      .localCheckpoint(true) // tiny; joined twice (ta and tb sides)
    val estU = Sketches.hllPortableEstimate(uni, Seq("d", "ta", "tb"))
      .select(col("d"), col("ta"), col("tb"), col("est_e2").as("union_est_e2"))
    val nT = udt.groupBy(col("t"), col("d")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // tiny; joined twice
    val inter = udt.select(col("d"), col("user_id"), col("t").as("ta"))
      .join(udt.select(col("d"), col("user_id"), col("t").as("tb")),
        Seq("d", "user_id"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("d"), col("ta"), col("tb"))
      .agg(count(lit(1)).as("n_inter"))
    grid
      .join(nT.select(col("t").as("ta"), col("d"), col("n").as("n_a")),
        Seq("d", "ta"))
      .join(nT.select(col("t").as("tb"), col("d"), col("n").as("n_b")),
        Seq("d", "tb"))
      .join(inter, Seq("d", "ta", "tb"), "left")
      .join(estT.select(col("t").as("ta"), col("d"), col("est_e2").as("a_est_e2")),
        Seq("d", "ta"))
      .join(estT.select(col("t").as("tb"), col("d"), col("est_e2").as("b_est_e2")),
        Seq("d", "tb"))
      .join(estU, Seq("d", "ta", "tb"))
      .select(col("d").as("day"), col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"),
        coalesce(col("n_inter"), lit(0L)).as("n_inter"),
        col("a_est_e2"), col("b_est_e2"), col("union_est_e2"),
        (col("a_est_e2") + col("b_est_e2") - col("union_est_e2"))
          .as("inter_est_e2"),
        when(coalesce(col("n_inter"), lit(0L)) > 0L, intScaled(
          (col("a_est_e2") + col("b_est_e2") - col("union_est_e2"))
            .cast("double") / lit(100.0) /
            col("n_inter").cast("double") - lit(1.0), 1000000L))
          .as("inter_err_e6"))
      .orderBy("day", "type_a", "type_b")
  }

  /** q408 — stationary distribution of the event-type Markov chain by
    * power iteration on the e9 integer grid: where does a user's
    * long-run attention settle? q162 reads one-step probabilities,
    * q314 the 8-step absorption into purchase, q283 the chain's
    * entropy rate — this is the chain's fixed point (PageRank's
    * textbook cousin on the type-transition graph), the steady-state
    * traffic mix the one-step matrix implies.
    *
    * Exactness (the q309/q314 renormalization discipline — no float
    * exists anywhere): transition counts are exact integers; the
    * row-stochastic matrix is FIXED on the e9 grid first
    * (q_ij = (2·c_ij·1e9 + r_i) DIV (2·r_i), one half-up rounding,
    * mirrored); p₀ is the uniform e9 integer; each of the 6 rounds is
    * p'_j = (2·Σ_i p_i·q_ij + 1e9) DIV (2·1e9) — exact decimal(38)
    * sums (terms ≤ 1e18 · |types|), one integer rounding per cell per
    * round, spelled identically in the oracle's unrolled CTE chain.
    * Per-round rounding is part of the declared statistic.
    *
    * Fixture note: the stream's types are near-uniform, so the
    * stationary point sits near 1/|types| — but the e9 grid separates
    * the types by ~3.4e6 units (fixture-probed), so the statistic
    * BINDS: cells differ per type and encode the real transition
    * structure, and the spec pins the spread.
    *
    * Scale: one user-keyed lead window collapses events to the
    * ≤ |types|² matrix; the 6 iterations ride that census frame via
    * broadcast joins as one lazy plan (r17 — single-consumer rounds,
    * one job). Nothing after the first agg is event-sized.
    */
  def q408(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("i"), col("next_type").as("j"))
    val c = steps.groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val r = c.groupBy(col("i")).agg(sum(col("c")).as("r"))
    val q = c.join(r, "i")
      .select(col("i"), col("j"),
        expr("CAST((2 * CAST(c AS DECIMAL(38,0)) * 1000000000 + r)" +
          " DIV (2 * r) AS BIGINT)").as("q"))
      .localCheckpoint(true)
    val types = r.select(col("i"))
    val nTypes = types.agg(count(lit(1)).as("nt"))
    var p = types.withGlobalStats(nTypes)
      .select(col("i"),
        expr("CAST((2 * CAST(1000000000 AS DECIMAL(38,0)) + nt)" +
          " DIV (2 * nt) AS BIGINT)").as("p"))
      .localCheckpoint(true)
    // r17: lazy round chain — each round's ≤|types|-row frame is
    // consumed exactly once by the next, so the 6 rounds compile into
    // ONE job instead of 6 checkpoint jobs of scheduling constants
    // (the q314 note has the full rationale).
    (1 to 6).foreach { _ =>
      p = q.join(broadcast(p), "i")
        .groupBy(col("j"))
        .agg(sum(col("p").cast(d38) * col("q")).as("acc"))
        .select(col("j").as("i"),
          expr("CAST((2 * acc + 1000000000) DIV (CAST(2 AS DECIMAL(38,0))" +
            " * 1000000000) AS BIGINT)").as("p"))
    }
    p.join(r, "i")
      .select(col("i").as("event_type"), col("r").as("n_out"),
        col("p").as("p_stat_e9"))
      .orderBy("event_type")
  }

  /** q409 — per-type inter-event gap tail quantiles (p50/p90/p99 µs)
    * via the HDR register census, exact percentiles beside with
    * relative error — the tail-latency dashboard read ("what's the
    * p99 silence before an error?"). q398 reads the gap DISPERSION in
    * one burstiness number; this reads the TAIL POINTS. q378 certifies
    * the HDR quantile sketch globally; this is the GROUPED census —
    * registers per (type, bucket), the form a per-endpoint latency
    * pipeline actually ships (counts merge by addition per group).
    *
    * Exactness: gaps are exact floored epoch-µs off the (user, type)
    * lag (q398's spelling); bucket ids/midpoints are pure integer
    * arithmetic off `length(bin(x))`; quantile selection is the
    * cross-multiplied integer compare (cum·100 ≥ q·n); the exact
    * percentile rides the engines' shared type-7 interpolation on
    * integer frames; x100 grid + ONE mirrored error chain per row.
    * Error-bound note: the 2⁻³ HDR resolution guarantee holds against
    * the ceil-rank ORDER STATISTIC the pick targets (spec-asserted);
    * the REPORTED error vs the interpolated percentile can exceed it
    * in a small-n tail where the two straddling statistics land in
    * different buckets (sf0.001 p99 at n=186 measures 17.2%).
    *
    * Scale: the lag window is (user, type)-keyed; the gap frame is
    * checkpointed once (branched: register census + exact
    * percentiles); registers collapse map-side to ≤ types·~280 rows
    * and every window below rides that census (type-partitioned).
    * At 100 TB the exact-percentile branch is the piece a production
    * run drops — the census IS the artifact.
    */
  def q409(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
          .as("us"))
      .withColumn("x", col("us") - lag(col("us"), 1).over(w))
      .filter(col("x").isNotNull)
      .select(col("event_type").as("t"), col("x"))
      .withColumn("e", (length(bin(col("x"))) - 1).cast("long"))
      .withColumn("sub",
        when(col("x") < 8L, lit(0L))
          .otherwise(expr("shiftright(x, CAST(e - 3 AS INT))") - 8L))
      .withColumn("bid",
        when(col("x") < 8L, col("x")).otherwise(col("e") * 8 + col("sub")))
      .withColumn("width",
        when(col("x") < 8L, lit(1L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), CAST(e - 3 AS INT))")))
      .withColumn("mid",
        when(col("x") < 8L, col("x"))
          .otherwise((col("sub") + 8L) * col("width") +
            expr("(width - 1) div 2")))
      .localCheckpoint(true) // branched: register census + exact pcts
    val regs = gaps.groupBy(col("t"), col("bid"))
      .agg(count(lit(1)).as("n"), min(col("mid")).as("mid"))
    val tot = gaps.groupBy(col("t")).agg(count(lit(1)).as("nn"),
      expr("percentile(x, 0.5)").as("ex50"),
      expr("percentile(x, 0.9)").as("ex90"),
      expr("percentile(x, 0.99)").as("ex99"))
    val wCum = Window.partitionBy("t").orderBy("bid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val picked = regs.withColumn("cum", sum(col("n")).over(wCum))
      .join(tot, "t")
      .withColumn("q", explode(array(lit(50L), lit(90L), lit(99L))))
      .filter(col("cum") * 100 >= col("q") * col("nn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("t", "q").orderBy("bid")))
      .filter(col("rn") === 1)
    val exact = when(col("q") === 50L, col("ex50"))
      .when(col("q") === 90L, col("ex90")).otherwise(col("ex99"))
    picked
      .select(col("t").as("event_type"), col("q"),
        col("nn").as("n_gaps"), col("mid").as("est_us"),
        intScaled(exact, 100L).as("exact_x100"),
        // Zero guard (q407's inter_err_e6 pattern): a type whose gap
        // percentile is 0 µs (duplicate same-µs events) must yield
        // NULL, not a NaN that fails Spark's ANSI double→BIGINT cast.
        when(exact > 0,
          intScaled((col("mid").cast("double") - exact) / exact, 1000000L))
          .as("rel_err_e6"))
      .orderBy("event_type", "q")
  }

  /** q410 — year-over-year customer revenue delta waterfall: matched
    * 1996/1997 customers ranked by their SIGNED revenue change via
    * [[graft.ops.TwoPhase.rankCum]], collapsed to deciles with per-
    * decile delta mass and the running (waterfall) total — "which
    * tenth of the base drove the swing" (q376's Lorenz reads one
    * year's LEVEL; this reads the CHANGE, the number a growth review
    * quotes). FIRST signed-domain TwoPhase caller: deltas are ~half
    * negative at every SF (fixture-probed), so the r13 sign-mirrored
    * HDR bucket is exercised end-to-end against the oracle — before
    * the mirror every negative delta collapsed into one bucket.
    *
    * Exactness: ALL-INTEGER (exact cents, ranks, running sums, decile
    * = (rn−1)·10 div n on nonnegative ints = truncation both engines;
    * max_by on the unique rn). No float exists anywhere.
    *
    * Scale: two map-side (custkey, yr) collapses + one custkey-keyed
    * match join; the global signed rank and running sum ride TwoPhase
    * (distributed buckets + a broadcast census — no single-task sort);
    * output 10 rows.
    */
  def q410(s: SparkSession, dir: String): DataFrame = {
    val y = Tables.table(s, dir, "orders")
      .select(col("o_custkey"),
        year(col("o_orderdate").cast("date")).as("yr"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long").as("c"))
      .filter(col("yr").isin(1996, 1997))
      .groupBy(col("o_custkey"), col("yr")).agg(sum(col("c")).as("r"))
      .localCheckpoint(true) // branched: the two year sides
    val d = y.filter(col("yr") === 1996)
      .select(col("o_custkey"), col("r").as("r0"))
      .join(y.filter(col("yr") === 1997)
        .select(col("o_custkey"), col("r").as("r1")), "o_custkey")
      .select(col("o_custkey"), (col("r1") - col("r0")).as("delta"))
    val ranked = graft.ops.TwoPhase.rankCum(d, Nil, "delta", "o_custkey",
      asc = true, rn = Some("rn"), cum = Some("cum"), n = Some("n"))
    ranked.withColumn("decile", expr("(rn - 1) * 10 div n") + 1)
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("delta")).as("delta_cents"),
        min(col("delta")).as("min_delta"),
        max(col("delta")).as("max_delta"),
        max_by(col("cum"), col("rn")).as("waterfall_cents"))
      .orderBy("decile")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q406_dau_mau_hll" -> (q406 _),
    "q410_yoy_delta_waterfall" -> (q410 _),
    "q407_audience_overlap_hll" -> (q407 _),
    "q408_markov_stationary" -> (q408 _),
    "q409_gap_tail_quantiles" -> (q409 _),
  )

  private def hllDayEst(fromSql: String, estAlias: String): String = {
    val frag = Sketches.hllPortableOracleSql(fromSql, Seq("day"))
    s"(SELECT day, est_e2 AS $estAlias FROM ($frag))"
  }

  private def hllEstOver(fromSql: String, groupCols: Seq[String],
      estAlias: String): String = {
    val frag = Sketches.hllPortableOracleSql(fromSql, groupCols)
    s"(SELECT ${groupCols.mkString(", ")}, est_e2 AS $estAlias FROM ($frag))"
  }

  val oracleSql: Map[String, String] = Map(
    // Same floored days, same md5 register files (the rolling merges
    // fan the RAW user-days here — register construction commutes with
    // union, so the files are bit-identical to Spark's fanned-register
    // MAX-merge), same q97 estimator chain, same exact censuses, one
    // mirrored error chain per metric.
    "q406_dau_mau_hll" -> {
      val ud = """SELECT DISTINCT user_id,
                 |         epoch_ns(ts) // 86400000000000 AS d
                 |  FROM events""".stripMargin
      def fan(k: Int) =
        if (k == 1)
          "SELECT d AS day, md5(CAST(user_id AS VARCHAR)) AS hx FROM ud"
        else
          s"SELECT d + i AS day, md5(CAST(user_id AS VARCHAR)) AS hx " +
            s"FROM ud CROSS JOIN range(0, $k) r(i)"
      def exactRoll(k: Int, out: String) =
        s"""SELECT day, CAST(COUNT(*) AS BIGINT) AS $out FROM (
           |  SELECT DISTINCT user_id, d + i AS day
           |  FROM ud CROSS JOIN range(0, $k) r(i)) GROUP BY day""".stripMargin
      def err(est: String, exact: String, out: String) =
        s"CAST(ROUND((CAST($est AS DOUBLE) / 100.0 / CAST($exact AS DOUBLE)" +
          s" - 1.0) * 1000000) AS BIGINT) AS $out"
      s"""WITH ud AS ($ud),
         |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
         |        FROM ud GROUP BY d),
         |wau AS (${exactRoll(7, "wau")}),
         |mau AS (${exactRoll(30, "mau")})
         |SELECT day, dau, wau, mau,
         |       dau_est_e2, wau_est_e2, mau_est_e2,
         |       ${err("dau_est_e2", "dau", "dau_err_e6")},
         |       ${err("wau_est_e2", "wau", "wau_err_e6")},
         |       ${err("mau_est_e2", "mau", "mau_err_e6")}
         |FROM dau JOIN wau USING (day) JOIN mau USING (day)
         |JOIN ${hllDayEst(fan(1), "dau_est_e2")} de USING (day)
         |JOIN ${hllDayEst(fan(7), "wau_est_e2")} we USING (day)
         |JOIN ${hllDayEst(fan(30), "mau_est_e2")} me USING (day)
         |ORDER BY day""".stripMargin
    },
    // Same floored days, same per-(type, day) register files; the pair
    // UNION file is built from raw pair user-days here (register
    // construction commutes with union — Spark MAX-merges the two type
    // files); same estimator chain; intersection = integer
    // inclusion-exclusion; one mirrored error chain.
    "q407_audience_overlap_hll" -> {
      val udt = """SELECT DISTINCT event_type AS t,
                  |         epoch_ns(ts) // 86400000000000 AS d,
                  |         user_id
                  |  FROM events""".stripMargin
      val perType =
        "SELECT t, d, md5(CAST(user_id AS VARCHAR)) AS hx FROM udt"
      val pairUnion =
        """SELECT g.d, g.ta, g.tb, md5(CAST(u.user_id AS VARCHAR)) AS hx
          |   FROM grid g JOIN udt u ON u.d = g.d
          |     AND (u.t = g.ta OR u.t = g.tb)""".stripMargin
      s"""WITH udt AS ($udt),
         |active AS (SELECT DISTINCT t, d FROM udt),
         |grid AS (
         |  SELECT a.d, a.t AS ta, b.t AS tb
         |  FROM active a JOIN active b ON a.d = b.d AND a.t < b.t),
         |nt AS (SELECT t, d, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM udt GROUP BY t, d),
         |inter AS (
         |  SELECT x.d, x.t AS ta, y.t AS tb, CAST(COUNT(*) AS BIGINT) AS n_inter
         |  FROM udt x JOIN udt y
         |    ON x.d = y.d AND x.user_id = y.user_id AND x.t < y.t
         |  GROUP BY 1, 2, 3)
         |SELECT g.d AS day, g.ta AS type_a, g.tb AS type_b,
         |  na.n AS n_a, nb.n AS n_b, COALESCE(i.n_inter, 0) AS n_inter,
         |  ea.a_est_e2, eb.b_est_e2, eu.union_est_e2,
         |  ea.a_est_e2 + eb.b_est_e2 - eu.union_est_e2 AS inter_est_e2,
         |  CASE WHEN COALESCE(i.n_inter, 0) > 0 THEN
         |    CAST(ROUND((CAST(ea.a_est_e2 + eb.b_est_e2 - eu.union_est_e2
         |                     AS DOUBLE) / 100.0
         |                / CAST(i.n_inter AS DOUBLE) - 1.0) * 1000000)
         |         AS BIGINT)
         |  END AS inter_err_e6
         |FROM grid g
         |JOIN nt na ON na.t = g.ta AND na.d = g.d
         |JOIN nt nb ON nb.t = g.tb AND nb.d = g.d
         |LEFT JOIN inter i ON i.d = g.d AND i.ta = g.ta AND i.tb = g.tb
         |JOIN ${hllEstOver(perType, Seq("t", "d"), "a_est_e2")} ea
         |  ON ea.t = g.ta AND ea.d = g.d
         |JOIN ${hllEstOver(perType, Seq("t", "d"), "b_est_e2")} eb
         |  ON eb.t = g.tb AND eb.d = g.d
         |JOIN ${hllEstOver(pairUnion, Seq("d", "ta", "tb"), "union_est_e2")} eu
         |  ON eu.d = g.d AND eu.ta = g.ta AND eu.tb = g.tb
         |ORDER BY day, type_a, type_b""".stripMargin
    },
    // Same lead-window transitions, same e9 row-stochastic fix
    // ((2c·1e9 + r) // (2r)), same uniform p0, same 6 unrolled
    // per-cell-rounded rounds.
    "q408_markov_stationary" -> {
      val head =
        """WITH seq AS (
          |  SELECT user_id, event_type,
          |         LEAD(event_type) OVER (PARTITION BY user_id
          |                                ORDER BY ts, event_id) AS nt
          |  FROM events),
          |st AS (SELECT event_type AS i, nt AS j FROM seq
          |       WHERE nt IS NOT NULL),
          |c AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS c
          |      FROM st GROUP BY i, j),
          |r AS (SELECT i, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY i),
          |q AS (
          |  SELECT c.i, c.j,
          |         (2 * CAST(c.c AS HUGEINT) * 1000000000 + r.r)
          |           // (2 * CAST(r.r AS HUGEINT)) AS q
          |  FROM c JOIN r ON r.i = c.i),
          |ntyp AS (SELECT CAST(COUNT(*) AS HUGEINT) AS nt FROM r),
          |p0 AS (
          |  SELECT i, (2 * CAST(1000000000 AS HUGEINT) + nt) // (2 * nt) AS p
          |  FROM r CROSS JOIN ntyp)""".stripMargin
      val rounds = (1 to 6).map { k =>
        s"""p$k AS (
           |  SELECT q.j AS i,
           |         (2 * SUM(CAST(p.p AS HUGEINT) * q.q) + 1000000000)
           |           // (2 * CAST(1000000000 AS HUGEINT)) AS p
           |  FROM q JOIN p${k - 1} p ON p.i = q.i GROUP BY q.j)""".stripMargin
      }
      (head +: rounds).mkString(",\n") +
        """
          |SELECT p6.i AS event_type, r.r AS n_out,
          |       CAST(p6.p AS BIGINT) AS p_stat_e9
          |FROM p6 JOIN r ON r.i = p6.i
          |ORDER BY event_type""".stripMargin
    },
    // Same floored-µs (user, type) lag gaps, same HDR bucket/midpoint
    // integer arithmetic, same cross-multiplied pick, shared type-7
    // exact percentiles, one mirrored error chain per row.
    "q409_gap_tail_quantiles" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |gp AS (
        |  SELECT event_type AS t,
        |         us - LAG(us) OVER (PARTITION BY user_id, event_type
        |                            ORDER BY us, event_id) AS x
        |  FROM e),
        |base AS (
        |  SELECT t, x, length(bin(x)) - 1 AS e,
        |         CASE WHEN x < 8 THEN 0
        |              ELSE (x >> CAST(length(bin(x)) - 1 - 3 AS INT)) - 8
        |         END AS sub,
        |         CASE WHEN x < 8 THEN CAST(1 AS BIGINT)
        |              ELSE (CAST(1 AS BIGINT)
        |                    << CAST(length(bin(x)) - 1 - 3 AS INT))
        |         END AS width
        |  FROM gp WHERE x IS NOT NULL),
        |bm AS (
        |  SELECT t,
        |         CASE WHEN x < 8 THEN x ELSE e * 8 + sub END AS bid,
        |         CASE WHEN x < 8 THEN x
        |              ELSE (sub + 8) * width + (width - 1) // 2 END AS mid
        |  FROM base),
        |regs AS (
        |  SELECT t, bid, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(MIN(mid) AS BIGINT) AS mid
        |  FROM bm GROUP BY t, bid),
        |tot AS (
        |  SELECT t, CAST(COUNT(*) AS BIGINT) AS nn,
        |         quantile_cont(x, 0.5) AS ex50,
        |         quantile_cont(x, 0.9) AS ex90,
        |         quantile_cont(x, 0.99) AS ex99
        |  FROM base GROUP BY t),
        |cums AS (
        |  SELECT t, bid, mid,
        |         SUM(n) OVER (PARTITION BY t ORDER BY bid
        |                      ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM regs),
        |picked AS (
        |  SELECT c.t, q, bid, mid, nn, ex50, ex90, ex99,
        |         ROW_NUMBER() OVER (PARTITION BY c.t, q ORDER BY bid) AS rn
        |  FROM cums c JOIN tot ON tot.t = c.t
        |  CROSS JOIN (SELECT CAST(UNNEST([50, 90, 99]) AS BIGINT) AS q)
        |  WHERE cum * 100 >= q * nn)
        |SELECT t AS event_type, q, nn AS n_gaps, mid AS est_us,
        |  CAST(ROUND((CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |              ELSE ex99 END) * 100) AS BIGINT) AS exact_x100,
        |  CASE WHEN (CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |             ELSE ex99 END) > 0 THEN
        |    CAST(ROUND((CAST(mid AS DOUBLE)
        |        - (CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |           ELSE ex99 END))
        |      / (CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |         ELSE ex99 END) * 1000000) AS BIGINT)
        |  END AS rel_err_e6
        |FROM picked WHERE rn = 1 ORDER BY event_type, q""".stripMargin,
    // Same exact cents, same (delta, custkey) total order, same
    // truncating decile, same unique-rn waterfall pick — all integers.
    "q410_yoy_delta_waterfall" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) AS yr,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS c
        |  FROM orders
        |  WHERE EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) IN (1996, 1997)),
        |y AS (SELECT o_custkey, yr, CAST(SUM(c) AS BIGINT) AS r
        |      FROM o GROUP BY 1, 2),
        |d AS (
        |  SELECT a.o_custkey, b.r - a.r AS delta
        |  FROM y a JOIN y b ON a.o_custkey = b.o_custkey
        |  WHERE a.yr = 1996 AND b.yr = 1997),
        |rk AS (
        |  SELECT o_custkey, delta,
        |         ROW_NUMBER() OVER (ORDER BY delta, o_custkey) AS rn,
        |         COUNT(*) OVER () AS n,
        |         CAST(SUM(delta) OVER (ORDER BY delta, o_custkey
        |                               ROWS UNBOUNDED PRECEDING)
        |              AS BIGINT) AS cum
        |  FROM d)
        |SELECT (rn - 1) * 10 // n + 1 AS decile,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(delta) AS BIGINT) AS delta_cents,
        |  MIN(delta) AS min_delta, MAX(delta) AS max_delta,
        |  MAX_BY(cum, rn) AS waterfall_cents
        |FROM rk GROUP BY 1 ORDER BY 1""".stripMargin,
  )
}
