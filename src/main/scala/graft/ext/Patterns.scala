package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Pattern mining: frequent itemset pairs (market-basket association
  * rules), sequential event transitions (first-order Markov counts),
  * and weighted order statistics — the behavioral-analytics layer next
  * to the graph family ([[Graph]]) and the text family
  * ([[TextAnalysis]]).
  *
  * Scale design: everything is count aggregation over keyed frames —
  * baskets never materialize as arrays, user event sequences are
  * window-local (partitioned by user), and every ranking is an
  * all-integer total order through TakeOrderedAndProject.
  */
object Patterns {

  // ---- association rules --------------------------------------------------

  /** Frequent part pairs with association-rule stats: for the top-N
    * co-ordered pairs (a < b, ranked by the all-integer (support DESC,
    * pair) order), support counts plus confidence P(b|a) and lift
    * P(a,b)/(P(a)P(b)) — the market-basket report, run basket-free
    * (supports are counts over DISTINCT (order, part); no order's item
    * list is ever collected into an array).
    *
    * Float discipline: conf and lift are single divisions of exact
    * integers — both engines compute identical doubles, so the e4
    * rounding agrees bit-for-bit (the q159 pattern).
    *
    * Scale: pair generation is the co-order self-join — per-order
    * fan-out C(items,2) with basket sizes bounded by order size (~7 in
    * TPC-H; production caps giant baskets the way q153 caps hub
    * degrees). Supports are map-side-combined counts; the top-N is
    * TakeOrderedAndProject.
    */
  def q161(s: SparkSession, dir: String): DataFrame = {
    // r17: the distinct item frame and the pair-support agg are the
    // session-shared co-order frames (Graph.coOrderGraph) — this query,
    // q318 and the co-order graph family each re-ran the identical
    // lineitem self-join before; counts are the same integers.
    val li = Graph.coOrderItems(s, dir)
    val n = li.select(col("o")).distinct().count()
    val sup = li.groupBy(col("p")).agg(count(lit(1)).as("s"))
    val pairs = Graph.coOrderPairSupports(s, dir)
      .select(col("a"), col("b"), col("supp").as("sup_ab"))
    pairs
      .join(sup.select(col("p").as("a"), col("s").as("sup_a")), "a")
      .join(sup.select(col("p").as("b"), col("s").as("sup_b")), "b")
      .orderBy(col("sup_ab").desc, col("a"), col("b"))
      .limit(50)
      .select(col("a"), col("b"), col("sup_ab"), col("sup_a"), col("sup_b"),
        Similarity.intScaled(
          col("sup_ab").cast("double") / col("sup_a"), 10000L).as("conf_e4"),
        Similarity.intScaled(
          (col("sup_ab") * lit(n)).cast("double") / (col("sup_a") * col("sup_b")),
          10000L).as("lift_e4"))
  }

  // ---- sequential transitions ---------------------------------------------

  /** First-order event-transition matrix: per user, events ordered by
    * (ts, event_id) — a TOTAL order, so ties cannot reorder across
    * engines — each consecutive (type → next type) transition counted
    * corpus-wide, with P(to|from) as an exact-integer division. The
    * behavioral Markov chain session analytics starts from.
    *
    * Scale: one window (partitioned by user — state is one user's
    * events), one count agg; nothing crosses users, no sequence is
    * collected.
    */
  def q162(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
    val t = steps.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("from_type")).agg(sum(col("n")).as("n_from"))
    t.join(tot, "from_type")
      .select(col("from_type"), col("to_type"), col("n"), col("n_from"),
        Similarity.intScaled(
          col("n").cast("double") / col("n_from"), 10000L).as("p_e4"))
      .orderBy("from_type", "to_type")
  }

  // ---- weighted order statistics ------------------------------------------

  /** Token-weighted median document length per source: the smallest
    * length L such that docs of length ≤ L hold at least half the
    * source's tokens (the "half the corpus mass sits in docs this
    * short" statistic that sizes sequence packing). Selection is the
    * first row of a cumulative-sum window crossing the half-total —
    * integer compares only (2·cum ≥ total avoids division entirely).
    *
    * Scale: one per-source window ordered by (length, doc_id) — a
    * total order, deterministic cumsum — plus a one-row-per-source agg.
    * At extreme scale the window partitions by source; a source's doc
    * list is the window state, the same bound q77's packing accepts.
    */
  def q163(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("len"))
    val w = Window.partitionBy(col("source")).orderBy(col("len"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = d.groupBy(col("source")).agg(sum(col("len")).as("total_tokens"))
    d.withColumn("cum", sum(col("len")).over(w))
      .join(tot, "source")
      .filter(col("cum") * 2 >= col("total_tokens"))
      .groupBy(col("source"))
      .agg(max(col("total_tokens")).as("total_tokens"),
        min(col("len")).as("wmedian_len"))
      .orderBy("source")
  }

  /** Largest-remainder (Hamilton) apportionment of an integer token
    * budget across sources, proportional to token counts: quota_s =
    * ⌊c_s·B/T⌋ plus one extra token for the sources with the largest
    * remainders until the budget is exact. The data-mixing quota step
    * (turn q134-style proportions into per-source integer budgets that
    * SUM EXACTLY to B) — and entirely integer arithmetic: `DIV`/`%` on
    * longs, remainder ranked by the (rem DESC, source) total order. No
    * float exists anywhere, so the result is bit-exact cross-engine by
    * construction.
    *
    * Scale: one corpus agg to (source, count); everything after is
    * source-cardinality-sized (the window ranks tens of rows).
    */
  def apportion(counts: DataFrame, budget: Long,
      key: String = "source"): DataFrame = {
    require(budget >= 0, s"apportion: budget must be >= 0, got $budget")
    val tot = counts.agg(sum(col("tokens")).as("total"))
    val based = counts.withGlobalStats(tot)
      .select(col(key), col("tokens"),
        expr(s"tokens * ${budget}L DIV total").as("base"),
        expr(s"tokens * ${budget}L % total").as("rem"))
      .localCheckpoint(true) // branched by leftover + ranking below
    val leftover = based.agg((lit(budget) - sum(col("base"))).as("leftover"))
    val w = Window.orderBy(col("rem").desc, col(key))
    based.withGlobalStats(leftover)
      .withColumn("extra",
        when(row_number().over(w) <= col("leftover"), 1L).otherwise(0L))
      .select(col(key), col("tokens"), col("base"), col("extra"),
        (col("base") + col("extra")).as("quota"))
      .orderBy(key)
  }

  /** q231 — quota-matched shape resampling: reshape the RAW pool's
    * doc-length histogram to the TARGET domain's shape (q229's KS
    * drift detector finds the mismatch; this op is the fix). A
    * 300-doc keep budget is Hamilton-apportioned across length
    * buckets (n_chars DIV 100) proportional to the TARGET histogram —
    * the certified [[apportion]] core with a cross-distribution
    * proportionality source — then each bucket keeps its
    * lowest-doc_id raw docs up to quota (a total order: selection is
    * reproducible run-to-run and engine-to-engine). Buckets the
    * target wants but the raw pool can't fill surface as
    * n_kept < quota (shortfall), never as silent re-allocation.
    * Entirely integer arithmetic — no float exists in the query.
    *
    * Scale: two corpus scans collapse to bucket-sized frames; the
    * only per-doc state is the rank window within (bucket) — keyed,
    * bounded by bucket populations (the q131 stratum-sample bound).
    */
  def q231(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
    val bucket = expr("n_chars DIV 100")
    val tgtSrcs = Selection.targetSources
    val tgt = d.filter(col("source").isin(tgtSrcs: _*))
      .groupBy(bucket.as("bucket")).agg(count(lit(1)).as("tokens"))
    val raw = d.filter(!col("source").isin(tgtSrcs: _*))
      .select(col("doc_id"), bucket.as("bucket"))
    val quotas = apportion(tgt, budget = 300L, key = "bucket")
      .select(col("bucket"), col("tokens").as("n_target"), col("quota"))
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
    val kept = raw.join(quotas.select(col("bucket"), col("quota")), Seq("bucket"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= col("quota"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_kept"))
    raw.groupBy(col("bucket")).agg(count(lit(1)).as("n_raw"))
      .join(quotas, Seq("bucket"), "full")
      .join(kept, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("n_target"), lit(0L)).as("n_target"),
        coalesce(col("n_raw"), lit(0L)).as("n_raw"),
        coalesce(col("quota"), lit(0L)).as("quota"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy("bucket")
  }

  /** q166 — 1M-token budget apportioned across sources by token count. */
  def q166(s: SparkSession, dir: String): DataFrame =
    apportion(
      Tables.table(s, dir, "documents")
        .groupBy(col("source"))
        .agg(sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("tokens")),
      budget = 1000000L)

  /** q170 — daily event-volume anomaly: each observed day's total
    * event count z-scored against its TRAILING 7 observed days (rows,
    * not calendar days — calendar gaps contribute no phantom zeros;
    * both engines window the same ordered day frame). The volume
    * alarm every ingestion pipeline runs: |z| spikes flag a broken
    * producer or a drop before the data reaches training.
    *
    * Float discipline: the window sums s1 = Σn and s2 = Σn² are EXACT
    * BIGINTs, and z = (n − s1/7) / √((7·s2 − s1²)/49) is the identical
    * expression shape in both engines — deterministic doubles from
    * exact integers (the q161 pattern), no margin measurement needed.
    * A zero-variance window (7 identical counts) yields NULL, not a
    * division blow-up.
    *
    * Scale: the heavy stage is the map-side-combined date agg; the
    * window runs over the calendar-sized daily frame (one row per
    * day — at 100 TB this is thousands of rows, driver-safe by
    * construction, same bound as q113's spine).
    */
  def q170(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .groupBy(to_date(Tables.eventTs(col("ts"))).as("day"))
      .agg(count(lit(1)).as("n"))
    val w = Window.orderBy(col("day")).rowsBetween(-7, -1)
    val s1 = col("s1").cast("double")
    val varTerm = (lit(7) * col("s2") - col("s1") * col("s1")).cast("double") / lit(49.0)
    daily
      .withColumn("k", count(lit(1)).over(w))
      .withColumn("s1", sum(col("n")).over(w))
      .withColumn("s2", sum(col("n") * col("n")).over(w))
      .filter(col("k") === 7)
      .select(col("day"), col("n"),
        when(lit(7) * col("s2") > col("s1") * col("s1"),
          Similarity.intScaled(
            (col("n").cast("double") - s1 / lit(7.0)) / sqrt(varTerm),
            10000L)).as("z_e4"))
      .orderBy("day")
  }

  /** q179 — inter-event gap order statistics: per event type, the
    * median and p90 of the microsecond gap between a user's
    * consecutive events of that type — the cadence profile that sizes
    * session-gap thresholds (q37/q45) and streaming watermarks from
    * the data instead of folklore.
    *
    * Quantiles are EXACT ORDER STATISTICS via the q163 cumulative-
    * count trick (smallest gap with rank·k ≥ quota), NOT interpolated
    * `percentile`: gaps are ~1e10 µs, where a 1-ulp interpolation
    * difference between engines lands within the rounding grid —
    * integer compares cannot drift. Timestamps go through the exact
    * decimal ns→µs conversion ([[graft.Tables.eventTs]] discipline).
    *
    * Scale: the gap window is (user, type)-partitioned — one user's
    * events of one type per state; the rank window partitions by type
    * over the gap frame (the q163 accepted bound).
    */
  def q179(s: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("gap_us", col("us") - lag(col("us"), 1).over(wLag))
      .filter(col("gap_us").isNotNull)
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_us"), col("event_id"))
    gaps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("ng", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("ng")).as("n_gaps"),
        min(when(col("rn") * 2 >= col("ng"), col("gap_us"))).as("p50_us"),
        min(when(col("rn") * 10 >= col("ng") * 9, col("gap_us"))).as("p90_us"))
      .orderBy("event_type")
  }

  /** q182 — per-type activity concentration (Gini coefficient of
    * events per user): the "is one power user generating this
    * traffic" audit — G ≈ 0 means uniform activity, G → 1 means a
    * handful of users dominate; run before trusting per-user caps or
    * engagement mixes sized on averages.
    *
    * Rank formula G = (2·Σ rn·x − (n+1)·Σx) / (n·Σx) over counts
    * ranked ascending. Everything up to the final division is exact
    * BIGINT (Σ rn·x is invariant under tie permutations — tied x
    * contribute a constant regardless of rank order — and the
    * (x, user_id) order pins it outright); the division is ONE IEEE
    * op on two exact integers, so the rounded e4 value is bit-exact
    * cross-engine by construction — no drift margin exists.
    *
    * Scale: one (type, user) count agg (map-side combined), then a
    * per-type rank window over the USER frame (users-per-type sized,
    * not event-sized).
    */
  def q182(s: SparkSession, dir: String): DataFrame = {
    val cnt = Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x"), col("user_id"))
    cnt
      .withColumn("rn", row_number().over(w))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_users"), sum(col("x")).as("n_events"),
        sum(col("rn") * col("x")).as("rx"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        Similarity.intScaled(
          (lit(2) * col("rx") - (col("n_users") + 1) * col("n_events"))
            .cast("double") /
            (col("n_users") * col("n_events")).cast("double"),
          10000L).as("gini_e4"))
      .orderBy("event_type")
  }

  /** q190 — last-touch purchase attribution: per purchase day, how
    * many purchases had a `click` by the same user within the 7 days
    * before (the conversion-attribution report; the complement count
    * is "organic" purchases). The lookback is a CARRY-FORWARD window
    * — max(click time so far) over the user's (time, event_id) order
    * — one linear-state window, NOT a per-purchase range self-join.
    *
    * Times ride the exact ns→µs integer grid (q179 discipline); the
    * day bucket is integer division of µs (no timezone arithmetic);
    * attribution is an integer compare; the share is one division of
    * exact integers.
    *
    * Scale: the window is user-partitioned (one user's events per
    * state); the day agg is map-side combined over purchase rows only.
    */
  def q190(s: SparkSession, dir: String): DataFrame = {
    val dayUs = 86400000000L
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", col("us"))).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        date_add(lit("1970-01-01").cast("date"),
          expr(s"CAST(us DIV $dayUs AS INT)")).as("day"),
        when(col("last_click_us").isNotNull &&
          col("us") - col("last_click_us") <= lit(7L) * dayUs, 1L)
          .otherwise(0L).as("attr"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_purchases"), sum(col("attr")).as("n_attributed"))
      .select(col("day"), col("n_purchases"), col("n_attributed"),
        Similarity.intScaled(
          col("n_attributed").cast("double") / col("n_purchases").cast("double"),
          10000L).as("attr_share_e4"))
      .orderBy("day")
  }

  /** q193 — daily error-rate monitor with a Wilson lower bound
    * (z = 1.96): the alerting statistic that stays honest on
    * low-volume days — a raw 2/10 error share alarms at 20% while
    * its Wilson LB (~5.7%) correctly says "not enough evidence"; an
    * SLO burn alert pages on the LB, not the point estimate.
    *
    * Float discipline: n and errors are exact integers, so p̂ is the
    * identical double in both engines; the Wilson expression is
    * spelled in the SAME operation order both sides (one sqrt), so
    * the result is bit-exact cross-engine (the spec still pins
    * rounding-boundary margins, q134 pattern).
    *
    * Scale: one map-side (day)-keyed count agg; days-sized output.
    */
  def q193(s: SparkSession, dir: String): DataFrame = {
    val z = lit(1.96)
    Tables.events(s, dir)
      .select(
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"),
        when(col("event_type") === "error", 1L).otherwise(0L).as("err"))
      .select(
        date_add(lit("1970-01-01").cast("date"),
          expr("CAST(us DIV 86400000000 AS INT)")).as("day"),
        col("err"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n"), sum(col("err")).as("errors"))
      .select({
        val p = col("errors").cast("double") / col("n").cast("double")
        val nn = col("n").cast("double")
        Seq(col("day"), col("n"), col("errors"),
          Similarity.intScaled(p, 10000L).as("rate_e4"),
          Similarity.intScaled(
            (p + z * z / (lit(2) * nn) -
              z * sqrt(p * (lit(1) - p) / nn + z * z / (lit(4) * nn * nn))) /
              (lit(1) + z * z / nn),
            10000L).as("wilson_lb_e4"))
      }: _*)
      .orderBy("day")
  }

  /** q194 — activity concentration at fixed cutoffs (Lorenz-curve
    * points): per event type, the share of all events generated by
    * the top 1% / 5% / 10% of users — the operational companion to
    * q182's Gini (one number says "skewed"; these three say "how few
    * users to rate-limit").
    *
    * Cutoff k = ⌈n·frac⌉ in pure integer arithmetic ((n + 99) div
    * 100 etc.); ranks ride the (cnt DESC, user_id) total order;
    * shares are single divisions of exact integers.
    *
    * Scale: the q182 shape — events collapse map-side to the user
    * frame; the rank window is users-per-type sized.
    */
  def q194(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("x").desc, col("user_id"))
    Tables.events(s, dir)
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("x"))
      .withColumn("rn", row_number().over(w))
      .withColumn("nu", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("nu")).as("n_users"), sum(col("x")).as("n_events"),
        sum(when(col("rn") <= expr("(nu + 99) div 100"), col("x"))
          .otherwise(0L)).as("top1"),
        sum(when(col("rn") <= expr("(nu + 19) div 20"), col("x"))
          .otherwise(0L)).as("top5"),
        sum(when(col("rn") <= expr("(nu + 9) div 10"), col("x"))
          .otherwise(0L)).as("top10"))
      .select(col("event_type"), col("n_users"), col("n_events"),
        Similarity.intScaled(
          col("top1").cast("double") / col("n_events").cast("double"),
          10000L).as("top1_share_e4"),
        Similarity.intScaled(
          col("top5").cast("double") / col("n_events").cast("double"),
          10000L).as("top5_share_e4"),
        Similarity.intScaled(
          col("top10").cast("double") / col("n_events").cast("double"),
          10000L).as("top10_share_e4"))
      .orderBy("event_type")
  }

  /** q195 — view→purchase conversion lag: of the users who ever
    * `view`, how many later `purchase`, and the p50/p90 of the lag
    * from FIRST view to FIRST subsequent purchase — the funnel-
    * latency statistic that sizes attribution windows (q190's 7-day
    * lookback) from data.
    *
    * Lags are exact µs integers; the quantiles are rank-quota order
    * statistics (q179 discipline) over the CONVERTED-user frame; the
    * conversion share is one exact division.
    *
    * Scale: two user-keyed aggs + one user-keyed join; the rank
    * window runs over converted users (users-sized, the q163 bound);
    * the totals row is a broadcast one-row crossJoin.
    */
  def q195(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
    val viewers = ev
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("us"))).as("fv"))
      .filter(col("fv").isNotNull)
    val conv = ev.filter(col("event_type") === "purchase")
      .join(viewers, "user_id")
      .filter(col("us") >= col("fv"))
      .groupBy(col("user_id"))
      .agg((min(col("us")) - min(col("fv"))).as("lag_us"))
    // round 12: the converted-user rank rides TwoPhase (was a
    // partition-less window over the funnel-survivor dimension); the
    // count comes off the same bucket census.
    val stats = graft.ops.TwoPhase.rankCum(conv, Nil, "lag_us", "user_id",
        asc = true, rn = Some("rn"), n = Some("n_conv"))
      .filter(col("rn") * 2 >= col("n_conv"))
      .agg(max(col("n_conv")).as("n_converted"),
        min(col("lag_us")).as("lag_p50_us"),
        min(when(col("rn") * 10 >= col("n_conv") * 9, col("lag_us")))
          .as("lag_p90_us"))
    stats.withGlobalStats(viewers.agg(count(lit(1)).as("n_viewers")))
      .select(col("n_viewers"), col("n_converted"),
        Similarity.intScaled(
          col("n_converted").cast("double") / col("n_viewers").cast("double"),
          10000L).as("conv_e4"),
        col("lag_p50_us"), col("lag_p90_us"))
  }

  /** q197 — second-order event transitions: counts and conditional
    * probability P(next | prev2, prev1) for every consecutive
    * event-type trigram — q162's first-order Markov view extended one
    * step (does knowing TWO steps of history change the prediction?).
    * Denominator = trigram-mass of the (prev2, prev1) context, so the
    * conditionals sum to 1 per context by construction.
    *
    * One user-partitioned lead window; exact-integer counts and one
    * exact division per row; (types+1)³-bounded output.
    */
  def q197(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val tri = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type").as("t0"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("t1", lead(col("t0"), 1).over(w))
      .withColumn("t2", lead(col("t0"), 2).over(w))
      .filter(col("t1").isNotNull && col("t2").isNotNull)
      .groupBy(col("t0"), col("t1"), col("t2"))
      .agg(count(lit(1)).as("n3"))
      .localCheckpoint(true) // ≤ types³ rows; branched into the context mass
    val ctx = tri.groupBy(col("t0"), col("t1")).agg(sum(col("n3")).as("n2"))
    tri.join(ctx, Seq("t0", "t1"))
      .select(col("t0"), col("t1"), col("t2"), col("n3"), col("n2"),
        Similarity.intScaled(
          col("n3").cast("double") / col("n2").cast("double"),
          10000L).as("cond_e4"))
      .orderBy("t0", "t1", "t2")
  }

  /** q270 — single-changepoint detection over daily arrival counts per
    * event type (binary segmentation at depth 1): among all splits of
    * the day-ordered count series x₁..xₙ after position k, pick the one
    * maximizing the between-segment variance reduction
    *   gain(k) = S₁²/n₁ + S₂²/n₂ − S²/n
    * (the exact SSE drop of a two-mean fit vs one mean — the CUSUM-mean
    * companion to q251's sequential monitor, answering "WHERE did the
    * level shift" rather than "has it shifted yet").
    *
    * Exactness: day buckets and prefix sums are exact integers; the
    * gain is formed as ONE rational num/den in decimal(38)
    * (num = S₁²n₂n + S₂²n₁n − S²n₁n₂, den = n₁n₂n — BIGINT would
    * overflow at ~10⁹ daily events, the q233 discipline), ranked by the
    * identical IEEE double quotient with a (gain DESC, day) tie-break
    * on both engines (the q258 rank-by-same-double pattern), and
    * e4-gridded once at the end.
    *
    * Scale: events collapse map-side to the (type × day) frame
    * (calendar-bounded); the candidate scan, rank, and argmax are all
    * per-type windows over ≤ n_days rows. Nothing after the first agg
    * is event-sized. Types with a single active day have no candidate
    * split and drop out (same on both engines).
    */
  def q270(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type").orderBy("day")
    val cand = daily
      .withColumn("k", row_number().over(w).cast("long"))
      .withColumn("s1", sum(col("x")).over(w).cast(d38))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("event_type")))
      .withColumn("stot",
        sum(col("x")).over(Window.partitionBy("event_type")).cast(d38))
      .filter(col("k") < col("n"))
      .withColumn("s2", col("stot") - col("s1"))
      .withColumn("n1", col("k").cast(d38))
      .withColumn("n2", (col("n") - col("k")).cast(d38))
      .withColumn("num",
        col("s1") * col("s1") * col("n2") * col("n").cast(d38) +
          col("s2") * col("s2") * col("n1") * col("n").cast(d38) -
          col("stot") * col("stot") * col("n1") * col("n2"))
      .withColumn("den", col("n1") * col("n2") * col("n").cast(d38))
      .withColumn("gain_dbl",
        col("num").cast("double") / col("den").cast("double"))
    val rw = Window.partitionBy("event_type")
      .orderBy(col("gain_dbl").desc, col("day"))
    cand
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("n").as("n_days"),
        col("day").as("split_day"),
        Similarity.intScaled(col("gain_dbl"), 10000L).as("gain_e4"))
      .orderBy("event_type")
  }

  /** q275 — hour-of-day load profile per event type: the peak UTC
    * hour (argmax under the all-integer (count DESC, hour) order),
    * its share of the type's traffic, and the peak-to-mean flatness
    * ratio — the diurnal-shape audit that separates human-driven
    * feeds (strong daily cycle) from scripted/batch ones (flat or
    * single-spike), complementing q214's day-of-week seasonality and
    * q233's day-level burstiness at the hour grain.
    *
    * Exactness: hour buckets are integer epoch-µs arithmetic (q190
    * discipline); peak choice is an integer decision; share and
    * flatness are single mirrored double expressions of exact
    * integers, e6/e4-gridded once.
    *
    * Scale: events collapse map-side to the (type × hour-of-day)
    * frame (≤ 24 rows per type); every window after rides that frame.
    */
  def q275(s: SparkSession, dir: String): DataFrame = {
    val hourly = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("(us DIV 3600000000) % 24").as("hr"))
      .agg(count(lit(1)).as("x"))
    val w = Window.partitionBy("event_type")
    val rw = Window.partitionBy("event_type").orderBy(col("x").desc, col("hr"))
    hourly
      .withColumn("tot", sum(col("x")).over(w))
      .withColumn("nh", count(lit(1)).over(w))
      .withColumn("rn", row_number().over(rw))
      .filter(col("rn") === 1)
      .select(col("event_type"), col("hr").as("peak_hour"),
        col("x").as("peak_n"), col("tot").as("n_events"),
        col("nh").as("n_hours"),
        Similarity.intScaled(
          col("x").cast("double") / col("tot").cast("double"),
          1000000L).as("peak_share_e6"),
        Similarity.intScaled(
          col("x").cast("double") * col("nh").cast("double") /
            col("tot").cast("double"),
          10000L).as("flatness_e4"))
      .orderBy("event_type")
  }

  /** q279 — audience overlap matrix: Jaccard of DISTINCT-user sets for
    * every event-type pair — "do the people who error also purchase",
    * the segmentation read that says whether two funnel stages share an
    * audience or live on disjoint user populations. The user-set
    * companion to q161's co-order lift (which counts co-occurrence
    * inside one order) and q162's sequential transitions (which need
    * temporal adjacency; this ignores time entirely).
    *
    * Exactness: set sizes and intersections are exact integers off the
    * distinct (user, type) frame; Jaccard = |A∩B| / (|A|+|B|−|A∩B|) is
    * one mirrored double division, e6-gridded.
    *
    * Scale: ONE distinct collapse to the (user, type) frame
    * (user-keyed shuffle); the pair fan-out is per-user C(types,2) —
    * type cardinality is domain-bounded, so the self-join emits ≤
    * types²/2 rows per user, and the result frame is types² rows.
    */
  def q279(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
      .localCheckpoint(true) // three consumers: sizes + both join sides
    val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("n"))
    val a = ut.select(col("event_type").as("type_a"), col("user_id"))
    val b = ut.select(col("event_type").as("type_b"), col("user_id"))
    a.join(b, "user_id").filter(col("type_a") < col("type_b"))
      .groupBy("type_a", "type_b").agg(count(lit(1)).as("n_both"))
      .join(broadcast(sizes.select(col("event_type").as("type_a"),
        col("n").as("n_a"))), "type_a")
      .join(broadcast(sizes.select(col("event_type").as("type_b"),
        col("n").as("n_b"))), "type_b")
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"),
        Similarity.intScaled(
          col("n_both").cast("double") /
            (col("n_a") + col("n_b") - col("n_both")).cast("double"),
          1000000L).as("jaccard_e6"))
      .orderBy("type_a", "type_b")
  }

  /** q282 — journey-end distribution: for every user, the LAST event
    * under the (ts DESC, event_id DESC) total order — where user
    * journeys terminate, with each ending type's user share and the
    * mean journey length of users who end there. q190 attributes
    * conversions backward from a purchase; THIS reads the other end of
    * the funnel ("how many journeys die on an error"), no conversion
    * required.
    *
    * Exactness: the last event is a lexicographic max over the UNIQUE
    * (ts, event_id) key — an integer decision (max-struct on the
    * Spark side ≡ the oracle's rank-1 window pick BECAUSE the key is
    * unique per user); shares and means are single mirrored divisions
    * of exact integers, e6/e4-gridded.
    *
    * Scale: ONE user-keyed combinable agg (max-struct + count — no
    * window over the event stream), then a type-bounded rollup.
    */
  def q282(s: SparkSession, dir: String): DataFrame = {
    val perUser = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_ev"),
        max(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("end_type"))
    val tot = perUser.agg(count(lit(1)).as("n_users_total"))
    perUser.groupBy("end_type")
      .agg(count(lit(1)).as("n_users"), sum(col("n_ev")).as("n_events"))
      .withGlobalStats(tot)
      .select(col("end_type"), col("n_users"), col("n_events"),
        Similarity.intScaled(
          col("n_users").cast("double") / col("n_users_total").cast("double"),
          1000000L).as("share_e6"),
        Similarity.intScaled(
          col("n_events").cast("double") / col("n_users").cast("double"),
          10000L).as("mean_len_e4"))
      .orderBy("end_type")
  }

  /** q283 — Markov entropy rate of the event stream: per state (event
    * type), the conditional next-event entropy Hᵢ = −Σⱼ p(j|i)·ln p(j|i)
    * over q162's first-order transition counts, plus each cell's
    * contribution to the chain's overall entropy rate −Σᵢⱼ (nᵢⱼ/N)·ln
    * p(j|i) — the sequence-predictability read: a low-entropy state's
    * next event is scripted, a high-entropy state's is anyone's guess
    * (q247's MI measures type×time dependence; this measures
    * type×NEXT-type structure).
    *
    * Exactness: transition counts are exact integers; every ln term is
    * gridded to e9 PER CELL before any sum (q232 discipline), so both
    * h_e9 and rate_part_e9 are exact BIGINT sums of identically-rounded
    * terms — no float accumulation, summation order free.
    *
    * Scale: the lead window is user-keyed over each user's own events;
    * transitions collapse to the types² cell frame; the one-row total
    * broadcasts.
    */
  def q283(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val t = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy(col("event_type").as("t0"), col("next_type").as("t1"))
      .agg(count(lit(1)).as("n"))
    val tot = t.groupBy(col("t0")).agg(sum(col("n")).as("n0"))
    val all = t.agg(sum(col("n")).as("nn"))
    val p = col("n").cast("double") / col("n0").cast("double")
    t.join(tot, "t0").withGlobalStats(all)
      .select(col("t0"), col("n0"),
        Similarity.intScaled(-p * log(p), 1000000000L).as("h_term_e9"),
        Similarity.intScaled(
          -(col("n").cast("double") / col("nn").cast("double")) * log(p),
          1000000000L).as("rate_term_e9"))
      .groupBy("t0")
      .agg(max(col("n0")).as("n_trans"), count(lit(1)).as("n_next_types"),
        sum(col("h_term_e9")).as("h_e9"),
        sum(col("rate_term_e9")).as("rate_part_e9"))
      .orderBy("t0")
  }

  /** q293 — session conversion by ENTRY event type: sessionize with
    * q37's 12-hour gap rule (new session when the gap EXCEEDS 12 h of
    * epoch-nanos — the same integer convention, so the session frames
    * are bit-identical), take each session's FIRST event under the
    * unique (ts, event_id) order as its entry point, and report how
    * often sessions that START each way go on to contain a purchase.
    * Completes the session triptych: q190 attributes a conversion
    * BACKWARD (last touch), q282 reads where journeys END, this reads
    * whether the way a session OPENS predicts conversion.
    *
    * Exactness: session ids, entry picks (min-struct on a unique
    * key ≡ the oracle's rank-1 window), and conversion flags are all
    * integer decisions; the rate is one mirrored division e6.
    *
    * Scale: the session window is user-keyed (q37's audited shape);
    * sessions collapse to one row each via a combinable min-struct +
    * max agg; the final rollup is type-bounded.
    */
  def q293(s: SparkSession, dir: String): DataFrame = {
    val gapNs = 12L * 3600 * 1000 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val sessions = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("nf",
        when(prev.isNull || (col("ts") - prev) > gapNs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("nf")).over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(
        min(struct(col("ts"), col("event_id"), col("event_type")))
          .getField("event_type").as("entry_type"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"),
        count(lit(1)).as("n_ev"))
    sessions.groupBy("entry_type")
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("converted")).as("n_converted"),
        sum(col("n_ev")).as("n_events"))
      .select(col("entry_type"), col("n_sessions"), col("n_converted"),
        col("n_events"),
        Similarity.intScaled(
          col("n_converted").cast("double") / col("n_sessions").cast("double"),
          1000000L).as("conv_e6"))
      .orderBy("entry_type")
  }

  /** q296 — time-decayed popularity (trending score) per event type:
    * each day's count weighted by exp(−age/30) against the corpus's
    * last active day — the recency-weighted ranking a "trending now"
    * surface serves, where a type's decayed share diverging from its
    * raw share IS the trend signal (rising types over-index, fading
    * ones under-index).
    *
    * Float discipline: the decay factor is gridded to e9 PER DAY
    * (age is an exact integer; exp(−age/30.0) is one mirrored double)
    * and multiplied by the exact day count — so the decayed mass is
    * an exact BIGINT sum of per-day products (q232 discipline), and
    * the shares are single mirrored divisions.
    *
    * Scale: events collapse map-side to the (type × day) frame
    * (calendar-bounded); the decay arithmetic rides that grid; the
    * one-row max-day broadcasts.
    */
  def q296(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val mx = daily.agg(max(col("day")).as("maxday"))
    val byType = daily.withGlobalStats(mx)
      .select(col("event_type"), col("x"),
        Similarity.intScaled(
          exp(-(col("maxday") - col("day")).cast("double") / lit(30.0)),
          1000000000L).as("w_e9"))
      .groupBy("event_type")
      .agg(sum(col("x")).as("n_events"),
        sum(col("x").cast(d38) * col("w_e9")).as("decayed"))
    val tot = byType.agg(
      sum(col("n_events")).as("tn"), sum(col("decayed")).as("td"))
    byType.withGlobalStats(tot)
      .select(col("event_type"), col("n_events"),
        col("decayed").cast("long").as("decayed_e9"),
        Similarity.intScaled(
          col("n_events").cast("double") / col("tn").cast("double"),
          1000000L).as("raw_share_e6"),
        Similarity.intScaled(
          col("decayed").cast("double") / col("td").cast("double"),
          1000000L).as("decayed_share_e6"))
      .orderBy("event_type")
  }

  /** q299 — Poissonness plot (Hoaglin 1980) of order basket sizes:
    * for each basket size k, the count metameter
    * φ(k) = ln(k!·N_k/N) — under a Poisson(λ) the points (k, φ)
    * fall on the LINE −λ + k·ln λ, so the fitted slope/intercept and
    * the per-k residual shape diagnose whether order composition is
    * Poisson (independent item picks) or clumped, and λ̂ = exp(slope)
    * estimates the basket rate. The distribution-FITTING companion to
    * q233's dispersion ratio (which only scores the variance).
    *
    * Exactness: N_k and k! are exact integers (k ≤ 20 fits BIGINT;
    * both engines' `factorial`); each φ(k) is ONE mirrored double
    * ln(k!·N_k/N), e6-gridded PER K (q232 discipline); the OLS
    * slope over the ≤ k_max gridded points is exact-integer moment
    * arithmetic into one mirrored division, and λ̂ one mirrored exp.
    *
    * Scale: lineitem collapses map-side to per-order counts, then to
    * the k-bounded frequency-of-frequencies frame; all regression
    * arithmetic rides ≤ k_max rows.
    */
  def q299(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val fof = Tables.table(s, dir, "lineitem")
      .groupBy("l_orderkey").agg(count(lit(1)).as("k"))
      .groupBy("k").agg(count(lit(1)).as("n_k"))
    val tot = fof.agg(sum(col("n_k")).as("n"))
    val pts = fof.withGlobalStats(tot)
      .select(col("k"), col("n_k"), col("n"),
        Similarity.intScaled(
          log(factorial(col("k").cast("int")).cast("double") *
            col("n_k").cast("double") / col("n").cast("double")),
          1000000L).as("phi_e6"))
    val reg = pts.agg(
      count(lit(1)).as("m"),
      sum(col("k")).as("sk"),
      sum(col("k").cast(d38) * col("k")).as("skk"),
      sum(col("phi_e6")).as("sp"),
      sum(col("k").cast(d38) * col("phi_e6")).as("skp"))
    val num = col("m").cast(d38) * col("skp") - col("sk").cast(d38) * col("sp")
    val den = (col("m").cast(d38) * col("skk") -
      col("sk").cast(d38) * col("sk")) * 1000000
    pts.withGlobalStats(reg)
      .select(col("k"), col("n_k"), col("phi_e6"),
        Similarity.intScaled(
          num.cast("double") / den.cast("double"), 1000000L).as("slope_e6"),
        Similarity.intScaled(
          exp(num.cast("double") / den.cast("double")), 10000L)
          .as("lambda_e4"))
      .orderBy("k")
  }

  /** q301 — Theil–Sen robust trend of daily event volume per type: the
    * median over all day-pairs of the pairwise slope (Δcount/Δday).
    * The outlier-proof "is this feed growing or dying" estimator — one
    * spiky ingest day that would wreck an OLS fit (q201's shape) moves
    * at most half the pair population, so the median slope barely
    * moves. Complements q270 (changepoint: WHEN did it move) and q251
    * (CUSUM: has it drifted NOW) with HOW FAST it is moving.
    *
    * Exactness: daily counts are integers on the calendar grid; each
    * pair slope is ONE mirrored double division e6-gridded per pair
    * (a .5-grid hit requires the division to produce the exact double
    * k+0.5 on both engines, which both then round identically
    * half-away — the q134 boundary argument); the median over those
    * INTEGERS is Spark exact `percentile` vs DuckDB `quantile_cont` —
    * the same lower+(upper−lower)·frac interpolation, exact on ints
    * < 2⁵³ — and the ×2 output kills the even-count .5 before the
    * long cast.
    *
    * Scale: events collapse map-side to the (type × day) frame, so the
    * pair join is calendar-bounded (days²/2 rows per type per year —
    * INDEPENDENT of event volume, the q270/q275 posture); nothing
    * after the first agg is event-sized.
    */
  def q301(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("c"))
    val a = daily.select(col("event_type"), col("day").as("d1"), col("c").as("c1"))
    val b = daily.select(col("event_type"), col("day").as("d2"), col("c").as("c2"))
    a.join(b, Seq("event_type"))
      .filter(col("d1") < col("d2"))
      .select(col("event_type"),
        Similarity.intScaled(
          (col("c2") - col("c1")).cast("double") /
            (col("d2") - col("d1")).cast("double"), 1000000L).as("slope_e6"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        (percentile(col("slope_e6"), lit(0.5)) * 2).cast("long")
          .as("med2_slope_e6"))
      .orderBy("event_type")
  }

  /** q314 — Markov k-step conversion absorption: for each non-purchase
    * event type, the probability that a user's NEXT 8 steps reach
    * 'purchase', under the empirical first-order chain (q162's
    * transition frame with an explicit END state for stream ends,
    * purchase absorbing). Where q190 attributes a conversion backwards
    * (last touch) and q162 reports one-step probabilities, this is the
    * FORWARD multi-step view — "how convert-y is a user standing at
    * state X" — the standard Markov-attribution building block.
    *
    * Exactness: transition counts are exact integers; p rides the e9
    * grid and each iteration is p'_i = roundHalfUp((c_conv·1e9 +
    * Σ_j c_ij·p_j) / r_i) spelled as the ALL-INTEGER
    * (2·num + r) DIV (2·r) — no float exists anywhere (the q309
    * renormalization discipline). Per-iteration rounding is part of
    * the declared statistic and mirrored exactly.
    *
    * Scale: one user-keyed lead window collapses events to the
    * type-bounded transition matrix (≤ |types|² + END rows); the 8
    * iterations ride that tiny frame (broadcast joins), checkpointed
    * per round. (r17 note: a lazy single-job chain was tried and
    * MEASURED SLOWER here — 1.83 → 2.73 s in a full sweep — unlike
    * q408/q308 whose lazy chains are flat; this loop's per-round
    * left-join + explicit broadcast nesting plans worse un-checkpointed,
    * so the eager rounds stay.) Nothing after the first agg is
    * event-sized.
    */
  def q314(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("event_type") =!= "purchase")
      .select(col("event_type").as("i"),
        coalesce(col("next_type"), lit("END")).as("j"))
    val c = steps.groupBy(col("i"), col("j")).agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val r = c.groupBy(col("i")).agg(sum(col("c")).as("r"))
    val conv = c.filter(col("j") === "purchase")
      .select(col("i"), col("c").as("cc"))
    val base = r.join(conv, Seq("i"), "left")
      .select(col("i"), col("r"), coalesce(col("cc"), lit(0L)).as("cc"))
      .localCheckpoint(true)
    val trans = c.filter(col("j") =!= "purchase" && col("j") =!= "END")
    var p = base.select(col("i"), lit(0L).as("p"))
    (1 to 8).foreach { _ =>
      val acc = trans.join(broadcast(p.select(col("i").as("j"), col("p"))), "j")
        .groupBy(col("i")).agg(sum(col("c").cast(d38) * col("p")).as("acc"))
      p = base.join(acc, Seq("i"), "left")
        .select(col("i"),
          expr("CAST((2 * (CAST(cc AS DECIMAL(38,0)) * 1000000000" +
            " + coalesce(acc, CAST(0 AS DECIMAL(38,0)))) + r) DIV (2 * r)" +
            " AS BIGINT)").as("p"))
        .localCheckpoint(true)
    }
    p.join(base, "i")
      .select(col("i").as("entry_type"), col("r").as("n_out"),
        col("cc").as("n_direct"), col("p").as("p8_e9"))
      .orderBy("entry_type")
  }

  /** q318 — frequent TRIPLE itemsets (Apriori level 3) over order
    * baskets: part triples co-ordered in ≥ 2 distinct orders, with the
    * anti-monotone pruning that makes Apriori scale — baskets are
    * first restricted to items that appear in some frequent PAIR
    * (support(triple) ≥ s ⇒ every sub-pair ≥ s, so pruned items
    * cannot belong to any answer). q161 stops at pair rules; this is
    * the level-3 basket signal (bundle detection, and in corpus work
    * the 3-gram co-occurrence analog).
    *
    * All-integer (counts + total orders only — support ratios stay
    * rational e6 via one mirrored division). Output ordered by the
    * item triple — membership is count-decided, never float-ranked.
    *
    * Scale: the triple fan-out is C(basket, 3) per order AFTER the
    * frequent-item semi-join (the Apriori prune) — basket sizes are
    * bounded by order shape, not corpus size; the support agg is a
    * map-side-combinable count on (a, b, c).
    */
  def q318(s: SparkSession, dir: String): DataFrame = {
    // r17: shared co-order item/pair-support frames — see q161's note.
    val li = Graph.coOrderItems(s, dir)
    val f2 = Graph.coOrderPairSupports(s, dir)
      .filter(col("supp") >= 2L)
    val fitems = f2.select(explode(array(col("a"), col("b"))).as("p")).distinct()
    val lif = li.join(fitems, Seq("p"), "left_semi").localCheckpoint(true)
    val nOrders = li.select(col("o")).distinct().agg(count(lit(1)).as("n_orders"))
    lif.select(col("o"), col("p").as("pa"))
      .join(lif.select(col("o"), col("p").as("pb")), "o")
      .filter(col("pa") < col("pb"))
      .join(lif.select(col("o"), col("p").as("pc")), "o")
      .filter(col("pb") < col("pc"))
      .groupBy(col("pa"), col("pb"), col("pc"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2L)
      .withGlobalStats(nOrders)
      .select(col("pa"), col("pb"), col("pc"), col("support"),
        Similarity.intScaled(
          col("support").cast("double") / col("n_orders").cast("double"),
          1000000L).as("supp_e6"))
      .orderBy("pa", "pb", "pc")
  }

  /** q324 — Gamma method-of-moments fit of repeat-purchase intervals:
    * day gaps between a user's consecutive purchases, fitted as
    * Gamma(k, θ) via k = m²/v, θ = v/m. The renewal-process view of
    * buying behaviour — k ≈ 1 is memoryless (exponential repurchase,
    * the q299 Poisson world), k > 1 means paced/regular ordering,
    * k < 1 bursty binges — which is what CRM re-engagement timing
    * keys off. Completes the arc: q299 fits counts, q297 fits
    * time-to-FIRST purchase, this fits the steady-state gap.
    *
    * All-integer day gaps off the user-keyed lead window; exact
    * decimal(38) moments; m/v/k/θ are the q304 mirrored double chain
    * with the exact integer zero-variance guard.
    */
  def q324(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .select(col("user_id"), col("ts"), col("event_id"),
        expr("us DIV 86400000000").as("day"))
      .withColumn("nxt", lead(col("day"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select((col("nxt") - col("day")).as("g"))
    val mom = gaps.agg(count(lit(1)).as("n"), sum(col("g")).as("sg"),
      sum(col("g").cast(d38) * col("g")).as("qg"))
    val m = col("sg").cast("double") / col("n").cast("double")
    val v = (col("qg").cast("double") - m * col("sg").cast("double")) /
      (col("n") - 1L).cast("double")
    val varZero = col("n").cast(d38) * col("qg") ===
      col("sg").cast(d38) * col("sg")
    mom.select(col("n").as("n_gaps"),
      Similarity.intScaled(m, 10000L).as("mean_days_e4"),
      when(!varZero && col("n") > 1L,
        Similarity.intScaled(m * m / v, 1000000L)).as("k_e6"),
      when(!varZero && col("n") > 1L,
        Similarity.intScaled(v / m, 10000L)).as("theta_e4"))
  }

  /** q329 — strictly-ORDERED session funnel view→click→purchase: a
    * session completes step k only if step k's event occurs AFTER the
    * time at which steps 1..k−1 were first satisfied. q115 counts
    * user-level unordered conversion and q293 looks only at the entry
    * event; the ordered in-session path is what a UX funnel actually
    * means — "saw, then clicked what they saw, then bought after
    * clicking". Sessions are q37's exact 12h-gap sessions.
    *
    * All-integer: session keys ride the audited q37 window; the three
    * step times are nested min-when aggs (tV, then first click > tV,
    * then first purchase > tC) — two session-keyed self-joins, no
    * per-event state; rates are mirrored divisions e6.
    *
    * Scale: one user-keyed session window, then three aggs + two
    * joins ALL keyed on (user, sess) — the q37 audited posture;
    * one-row output.
    */
  def q329(s: SparkSession, dir: String): DataFrame = {
    val gapNs = 12L * 3600 * 1000 * 1000 * 1000
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    val sess = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("nf",
        when(prev.isNull || (col("ts") - prev) > gapNs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("nf")).over(run))
      .select(col("user_id"), col("sess"), col("ts"), col("event_type"))
      .localCheckpoint(true) // branched: base agg + two step joins
    val k = Seq("user_id", "sess")
    val tv = sess.groupBy(k.map(col): _*)
      .agg(min(when(col("event_type") === "view", col("ts"))).as("tv"))
    val tc = sess.join(tv, k)
      .groupBy(k.map(col): _*)
      .agg(min(when(col("event_type") === "click" && col("ts") > col("tv"),
        col("ts"))).as("tc"), first(col("tv")).as("tv2"))
    val tp = sess.join(tc, k)
      .groupBy(k.map(col): _*)
      .agg(min(when(col("event_type") === "purchase" && col("ts") > col("tc"),
        col("ts"))).as("tp"), first(col("tv2")).as("tv3"),
        first(col("tc")).as("tc2"))
    def rate(n: Column, d: Column): Column =
      Similarity.intScaled(n.cast("double") / d.cast("double"), 1000000L)
    tp.agg(count(lit(1)).as("sessions"),
        count(col("tv3")).as("with_view"),
        count(col("tc2")).as("view_click"),
        count(col("tp")).as("full_path"))
      .select(col("sessions"), col("with_view"), col("view_click"),
        col("full_path"),
        when(col("with_view") > 0L, rate(col("view_click"), col("with_view")))
          .as("click_given_view_e6"),
        when(col("with_view") > 0L, rate(col("full_path"), col("with_view")))
          .as("purchase_given_view_e6"))
  }

  /** q327 — attribution-window sensitivity curve: share of first-time
    * clickers converting within {1, 24, 72, 168} hours of their FIRST
    * click. q115 reports the unbounded conversion rate; this is the
    * curve marketing actually argues about — how much "conversion"
    * depends on the window you grant it, and where the curve knees.
    * All-integer: first-click and first-subsequent-purchase are exact
    * min aggs on the nanos ts, window tests are exact integer
    * comparisons, and the four rates are mirrored divisions e6.
    *
    * Scale: two user-keyed aggs collapse events to one row per
    * clicker; the window battery is a static 4-way fan-out of ONE
    * one-row agg (no per-window rescans).
    */
  def q327(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    val purch = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("tb"))
    val lag = firstClick.join(purch, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("tc"))
      .agg(min(when(col("tb") >= col("tc"), col("tb"))).as("tconv"))
      .select((col("tconv") - col("tc")).as("lag_ns"))
    val wins = Seq(1L, 24L, 72L, 168L)
    lag.agg(count(lit(1)).as("clickers"),
        wins.map(h => sum((col("lag_ns").isNotNull &&
          col("lag_ns") <= lit(h * 3600L * 1000000000L)).cast("long"))
          .as(s"c$h")): _*)
      .select(col("clickers"),
        explode(array(wins.map(h =>
          struct(lit(h).as("window_h"), col(s"c$h").as("converted"))): _*))
          .as("x"))
      .select(col("x.window_h"), col("clickers"), col("x.converted"),
        when(col("clickers") > 0L, Similarity.intScaled(
          col("x.converted").cast("double") / col("clickers").cast("double"),
          1000000L)).as("rate_e6"))
      .orderBy("window_h")
  }

  /** q328 — price elasticity of demand per brand: the log-log OLS
    * slope of quantity on unit price over lineitem transactions.
    * q286 reports the raw discount↔volume correlation; elasticity is
    * the ECONOMIC version — % quantity change per % price change —
    * and the number a pricing engine consumes. Slope < −1 = elastic
    * (revenue falls when price rises), −1 < slope ≤ 0 inelastic.
    *
    * Float discipline: ln(unit price) and ln(qty) are e9-gridded PER
    * ROW (q294's per-row gridding — the only libm op), then ALL OLS
    * moments are exact decimal(38) integer sums and the slope is one
    * mirrored (nΣxy − ΣxΣy)/(nΣx² − Σx²) division e6 with the exact
    * integer zero-variance guard (q264 discipline).
    *
    * Scale: one lineitem scan collapses map-side to brand moments
    * after a broadcast part join; brand-bounded thereafter.
    */
  def q328(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val li = Tables.table(s, dir, "lineitem")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"),
        col("l_quantity").cast("long").as("qty"))
    val rows = li
      .join(Tables.table(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .select(col("p_brand").as("brand"),
        Similarity.intScaled(
          log(col("cents").cast("double") / col("qty").cast("double")),
          1000000000L).as("x"),
        Similarity.intScaled(log(col("qty").cast("double")), 1000000000L)
          .as("y"))
    val mom = rows.groupBy(col("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x").cast(d38) * col("y")).as("sxy"),
        sum(col("x").cast(d38) * col("x")).as("sxx"))
    val num = col("n").cast(d38) * col("sxy") -
      col("sx").cast(d38) * col("sy")
    val den = col("n").cast(d38) * col("sxx") -
      col("sx").cast(d38) * col("sx")
    mom.select(col("brand"), col("n").as("n_lines"),
        when(den =!= lit(0).cast(d38),
          Similarity.intScaled(
            num.cast("double") / den.cast("double"), 1000000L))
          .as("elasticity_e6"))
      .orderBy("brand")
  }

  /** q322 — Wald SPRT trace over daily conversion (sequential A/B
    * monitoring): for the user_id%2=1 cohort, the cumulative
    * log-likelihood ratio of "purchase share of events = 12%" (H1)
    * against "= 10%" (H0), day by day, with the classic α=β=0.05
    * decision bounds ±ln 19. THE always-valid sequential monitor —
    * q274's Wilson CI answers "what is the rate" post hoc; SPRT
    * answers "may I stop the experiment TODAY", which fixed-horizon
    * tests cannot do without alpha-spending.
    *
    * Float discipline: the per-day term x·ln(p1/p0) + (n−x)·ln(q1/q0)
    * multiplies EXACT integer daily counts by two ln CONSTANTS each
    * engine computes from the same literals; terms are e9-gridded per
    * day BEFORE the exact cumulative sum (q232), and the decision
    * compares gridded integers to the gridded ±ln 19 bound — no raw
    * double ever crosses a boundary (margins pinned in Round9oSpec).
    *
    * Scale: events collapse map-side to the (day) calendar grid; the
    * cumsum window rides that value-bounded grid (q238 posture).
    */
  def q322(s: SparkSession, dir: String): DataFrame = {
    val l1 = log(lit(0.12) / lit(0.10))
    val l0 = log(lit(0.88) / lit(0.90))
    val bound = Similarity.intScaled(log(lit(19.0)), 1000000000L)
    val daily = Tables.events(s, dir)
      .filter(col("user_id") % 2L === 1L)
      .select((col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"),
        (col("event_type") === "purchase").cast("long").as("p"))
      .groupBy(expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("x"))
    val term = Similarity.intScaled(
      col("x").cast("double") * l1 + (col("n") - col("x")).cast("double") * l0,
      1000000000L)
    val w = Window.orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select(col("day"), col("n"), col("x"), term.as("t"))
      .withColumn("llr_e9", sum(col("t")).over(w))
      .select(col("day"), col("n"), col("x"), col("llr_e9"),
        when(col("llr_e9") >= bound, lit("accept_h1"))
          .when(col("llr_e9") <= -bound, lit("accept_h0"))
          .otherwise(lit("continue")).as("decision"))
      .orderBy("day")
  }

  /** q373 — Markov next-event predictor accuracy: fit q162's global
    * transition table, predict each from-type's argmax next type
    * ((n DESC, to_type) tie-break), and score top-1 accuracy per
    * from-type — the baseline number any sequence model must beat
    * before it earns its complexity (and the per-type breakdown says
    * WHERE order carries signal: a from-type at chance is
    * memoryless). In-sample by design — the diagnostic reads the
    * table's own concentration, documented as such.
    *
    * Exactness: the argmax is integer-decided; accuracy is one
    * mirrored division per from-type, e6-gridded.
    *
    * Scale: q162's user-keyed lag window (the audited event shape) +
    * a type-bounded argmax; output ≤ |types| rows.
    */
  def q373(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val steps = Tables.events(s, dir)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .select(col("event_type").as("from_type"), col("next_type"))
      .localCheckpoint(true) // the table AND the eval stream
    val t = steps.groupBy(col("from_type"), col("next_type").as("to_type"))
      .agg(count(lit(1)).as("n"))
    val wArg = Window.partitionBy(col("from_type"))
      .orderBy(col("n").desc, col("to_type"))
    val pred = t.withColumn("rn", row_number().over(wArg))
      .filter(col("rn") === 1)
      .select(col("from_type"), col("to_type").as("predicted_to"))
    steps.join(pred, "from_type")
      .groupBy(col("from_type"))
      .agg(max(col("predicted_to")).as("predicted_to"),
        count(lit(1)).as("n_transitions"),
        sum(when(col("next_type") === col("predicted_to"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("from_type"), col("predicted_to"), col("n_transitions"),
        col("n_correct"),
        Similarity.intScaled(
          col("n_correct").cast("double") / col("n_transitions").cast("double"),
          1000000L).as("acc_e6"))
      .orderBy("from_type")
  }

  /** q375 — event-type PMI over user-day baskets: for each unordered
    * type pair, the pointwise mutual information of co-occurring in
    * the same (user, day) — the ORDERLESS association signal between
    * q162's ordered transitions and q161's support/confidence rules
    * (PMI is symmetric and base-rate-corrected: a pair can have high
    * lift yet low confidence), the q168 word-PMI pattern applied to
    * behavior.
    *
    * Exactness: baskets are exact integer user-day keys — TRUE floor
    * division spelled explicitly (Spark's `div` truncates toward zero
    * while DuckDB's `//` floors; they diverge for pre-1970 negative
    * epoch-ns, so the Spark side subtracts 1 when the remainder is
    * negative, making the two engines identical by construction for
    * ALL inputs, r11 ADVICE); all counts are exact; PMI's
    * ln(n_ab·N/(n_a·n_b))
    * is ONE mirrored libm chain per pair, e6-gridded (margins
    * spec-measured).
    *
    * Scale: the basket collapse is a map-side distinct; the pair join
    * is basket-keyed with ≤|types|²-per-basket fan-out over a closed
    * type set (q349's bound); output ≤ C(|types|,2) rows.
    */
  def q375(s: SparkSession, dir: String): DataFrame = {
    val b = Tables.events(s, dir)
      .select(col("user_id"),
        expr("ts div 86400000000000" +
          " - (CASE WHEN ts % 86400000000000 < 0 THEN 1 ELSE 0 END)")
          .as("day"),
        col("event_type"))
      .distinct()
      .localCheckpoint(true) // marginals + both pair sides
    val n = b.select(col("user_id"), col("day")).distinct()
      .agg(count(lit(1)).as("nb"))
    val marg = b.groupBy(col("event_type")).agg(count(lit(1)).as("nt"))
    val pairs = b.select(col("user_id"), col("day"), col("event_type").as("ta"))
      .join(b.select(col("user_id"), col("day"), col("event_type").as("tb")),
        Seq("user_id", "day"))
      .filter(col("ta") < col("tb"))
      .groupBy(col("ta"), col("tb")).agg(count(lit(1)).as("n_ab"))
    pairs
      .join(marg.select(col("event_type").as("ta"), col("nt").as("n_a")), "ta")
      .join(marg.select(col("event_type").as("tb"), col("nt").as("n_b")), "tb")
      .withGlobalStats(n)
      .select(col("ta").as("type_a"), col("tb").as("type_b"),
        col("n_a"), col("n_b"), col("n_ab"), col("nb").as("n_baskets"),
        Similarity.intScaled(
          log(col("n_ab").cast("double") * col("nb").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))),
          1000000L).as("pmi_e6"))
      .orderBy("type_a", "type_b")
  }

  /** q395 — daily cohort retention triangle: users grouped by their
    * FIRST active day (the cohort), then for each cohort×age cell the
    * count and share of cohort members active on that day — the
    * classic retention matrix every growth dashboard renders (q363's
    * cohort LTV reads REVENUE by cohort age; this reads PRESENCE —
    * the churn curve itself). Daily grain is the one that BINDS on
    * this stream (fixture-probed: day-level presence spans 0.81-1.0;
    * at weekly grain every user is active every week and the matrix
    * reads a vacuous 100%).
    *
    * Exactness: days are exact epoch-ns floor divisions (the q375
    * spelling — truncation corrected for negative remainders so both
    * engines floor identically for ALL inputs); cohort assignment is
    * an exact MIN; censuses are exact integers; the retention share is
    * ONE mirrored division e6. Age 0 is 100% by construction (every
    * user is active on their first day) — the spec pins it.
    *
    * Scale: events collapse map-side to distinct (user, day) rows;
    * the cohort min is a user-keyed agg; the triangle is
    * calendar-bounded (≤ days² cells at ANY data size — the q170
    * grid discipline), so the age-0 join back is a broadcast of a
    * tiny frame.
    */
  def q395(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct()
      .localCheckpoint(true) // branched: cohort min AND the activity join
    val first = ev.groupBy(col("user_id")).agg(min(col("d")).as("cohort"))
    val tri = ev.join(first, "user_id")
      .groupBy(col("cohort"), (col("d") - col("cohort")).as("age_days"))
      .agg(count(lit(1)).as("n_active"))
      .localCheckpoint(true) // tiny (days² cells); branched below
    val base = tri.filter(col("age_days") === 0)
      .select(col("cohort"), col("n_active").as("cohort_size"))
    tri.join(broadcast(base), "cohort")
      .select(col("cohort"), col("age_days"), col("n_active"),
        col("cohort_size"),
        Similarity.intScaled(
          col("n_active").cast("double") / col("cohort_size").cast("double"),
          1000000L).as("retention_e6"))
      .orderBy("cohort", "age_days")
  }

  /** q403 — DAU/WAU/MAU + stickiness per day: distinct daily actives,
    * 7-day and 30-day rolling distinct actives, and DAU/MAU — THE
    * growth-dashboard headline (stickiness ≈ how many of the monthly
    * actives show up on a given day; q395's retention reads cohorts,
    * this reads the whole population's engagement level day by day).
    *
    * Rolling DISTINCT counts cannot ride a window aggregate (distinct
    * isn't subtractable); the scale-correct shape is the COVERAGE
    * fan-out: each distinct (user, day) activity row covers the 7/30
    * subsequent calendar days, so rolling actives = a distinct census
    * per covering day — map-side explode of a user-DAY frame (already
    * collapsed from events), never of events. Early days carry
    * truncated windows (both engines alike — the standard dashboard
    * convention).
    *
    * Exactness: days are exact epoch-ns floor divisions (q375's
    * spelling); every census is an exact distinct count; stickiness is
    * ONE mirrored division e6.
    *
    * Scale: events collapse map-side to distinct (user, day); the
    * 7×/30× coverage fan-outs ride THAT frame (user-days ≪ events);
    * censuses are map-side-combined day-grid aggs; output is the
    * calendar grid.
    */
  def q403(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct()
      .localCheckpoint(true) // branched: DAU census + two coverage fans
    def rolling(k: Int, out: String) = ud
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + (k - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(out))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    dau
      .join(rolling(7, "wau"), "day")
      .join(rolling(30, "mau"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        Similarity.intScaled(
          col("dau").cast("double") / col("mau").cast("double"),
          1000000L).as("stickiness_e6"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q373_markov_accuracy" -> (q373 _),
    "q375_event_pmi" -> (q375 _),
    "q395_retention_triangle" -> (q395 _),
    "q403_dau_mau" -> (q403 _),
    "q314_markov_absorption" -> (q314 _),
    "q318_triple_itemsets"   -> (q318 _),
    "q322_sprt_trace"        -> (q322 _),
    "q324_gamma_repurchase"  -> (q324 _),
    "q327_conversion_windows" -> (q327 _),
    "q328_price_elasticity"  -> (q328 _),
    "q329_session_funnel"    -> (q329 _),
    "q301_theil_sen"       -> (q301 _),
    "q161_assoc_rules"     -> (q161 _),
    "q296_trending"        -> (q296 _),
    "q299_poissonness"     -> (q299 _),
    "q270_changepoint"     -> (q270 _),
    "q275_hourly_profile"  -> (q275 _),
    "q279_audience_overlap" -> (q279 _),
    "q282_journey_end"     -> (q282 _),
    "q283_entropy_rate"    -> (q283 _),
    "q293_entry_conversion" -> (q293 _),
    "q162_event_transitions" -> (q162 _),
    "q163_weighted_median" -> (q163 _),
    "q166_token_apportion" -> (q166 _),
    "q231_quota_resample"  -> (q231 _),
    "q170_event_anomaly"   -> (q170 _),
    "q179_event_gaps"      -> (q179 _),
    "q182_activity_gini"   -> (q182 _),
    "q190_attribution"     -> (q190 _),
    "q193_error_monitor"   -> (q193 _),
    "q194_concentration"   -> (q194 _),
    "q195_conversion_lag"  -> (q195 _),
    "q197_trigram_paths"   -> (q197 _),
  )

  private val markovAbsorptionOracle: String = {
    val head =
      """WITH seq AS (
        |  SELECT user_id, event_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |st AS (
        |  SELECT event_type AS i, COALESCE(next_type, 'END') AS j
        |  FROM seq WHERE event_type <> 'purchase'),
        |c AS (SELECT i, j, CAST(COUNT(*) AS BIGINT) AS c
        |      FROM st GROUP BY i, j),
        |r AS (SELECT i, CAST(SUM(c) AS BIGINT) AS r FROM c GROUP BY i),
        |base AS (
        |  SELECT r.i, r.r, COALESCE(cv.c, 0) AS cc
        |  FROM r LEFT JOIN (SELECT i, c FROM c WHERE j = 'purchase') cv
        |    ON cv.i = r.i),
        |tr AS (SELECT i, j, c FROM c WHERE j <> 'purchase' AND j <> 'END'),
        |p0 AS (SELECT i, CAST(0 AS HUGEINT) AS p FROM base)""".stripMargin
    val rounds = (1 to 8).map { k =>
      s"""a$k AS (
         |  SELECT tr.i, SUM(CAST(tr.c AS HUGEINT) * p.p) AS acc
         |  FROM tr JOIN p${k - 1} p ON p.i = tr.j GROUP BY tr.i),
         |p$k AS (
         |  SELECT b.i,
         |         (2 * (CAST(b.cc AS HUGEINT) * 1000000000
         |               + COALESCE(a$k.acc, 0)) + b.r) // (2 * b.r) AS p
         |  FROM base b LEFT JOIN a$k ON a$k.i = b.i)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      """
        |SELECT p8.i AS entry_type, b.r AS n_out, b.cc AS n_direct,
        |       CAST(p8.p AS BIGINT) AS p8_e9
        |FROM p8 JOIN base b ON b.i = p8.i
        |ORDER BY entry_type""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // Same floor days, same coverage fan-outs (sequence(d, d+k-1) ≡
    // d + range(0, k)), exact distinct censuses, one mirrored
    // stickiness division.
    "q403_dau_mau" ->
      """WITH ud AS (
        |  SELECT DISTINCT user_id,
        |         epoch_ns(ts) // 86400000000000 AS d
        |  FROM events),
        |dau AS (SELECT d AS day, COUNT(*) AS dau FROM ud GROUP BY d),
        |w AS (SELECT DISTINCT user_id, d + i AS day
        |      FROM ud CROSS JOIN range(0, 7) r(i)),
        |wau AS (SELECT day, COUNT(*) AS wau FROM w GROUP BY day),
        |m AS (SELECT DISTINCT user_id, d + i AS day
        |      FROM ud CROSS JOIN range(0, 30) r(i)),
        |mau AS (SELECT day, COUNT(*) AS mau FROM m GROUP BY day)
        |SELECT dau.day, dau.dau, wau.wau, mau.mau,
        |  CAST(ROUND(CAST(dau.dau AS DOUBLE) / mau.mau * 1000000)
        |       AS BIGINT) AS stickiness_e6
        |FROM dau JOIN wau USING (day) JOIN mau USING (day)
        |ORDER BY day""".stripMargin,
    // Same epoch-ns floor weeks, same MIN cohort, same integer
    // censuses, one mirrored share division.
    "q395_retention_triangle" ->
      """WITH e AS (
        |  SELECT DISTINCT user_id,
        |         epoch_ns(ts) // 86400000000000 AS d
        |  FROM events),
        |f AS (SELECT user_id, MIN(d) AS cohort FROM e GROUP BY user_id),
        |t AS (
        |  SELECT cohort, d - cohort AS age_days, COUNT(*) AS n_active
        |  FROM e JOIN f USING (user_id) GROUP BY 1, 2),
        |b AS (SELECT cohort, n_active AS cohort_size FROM t
        |      WHERE age_days = 0)
        |SELECT t.cohort, t.age_days, t.n_active, b.cohort_size,
        |  CAST(ROUND(CAST(t.n_active AS DOUBLE) / b.cohort_size * 1000000)
        |       AS BIGINT) AS retention_e6
        |FROM t JOIN b USING (cohort)
        |ORDER BY cohort, age_days""".stripMargin,
    // q162's lag window, integer argmax with (n DESC, to_type) ties,
    // one mirrored accuracy division per from-type.
    "q373_markov_accuracy" ->
      """WITH s AS (
        |  SELECT event_type AS from_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |st AS (SELECT from_type, next_type FROM s
        |       WHERE next_type IS NOT NULL),
        |t AS (SELECT from_type, next_type AS to_type,
        |             CAST(COUNT(*) AS BIGINT) AS n
        |      FROM st GROUP BY 1, 2),
        |pred AS (
        |  SELECT from_type, to_type AS predicted_to FROM (
        |    SELECT from_type, to_type,
        |           ROW_NUMBER() OVER (PARTITION BY from_type
        |                              ORDER BY n DESC, to_type) AS rn
        |    FROM t) WHERE rn = 1)
        |SELECT st.from_type, MAX(predicted_to) AS predicted_to,
        |       CAST(COUNT(*) AS BIGINT) AS n_transitions,
        |       CAST(SUM(CASE WHEN next_type = predicted_to THEN 1 ELSE 0
        |                END) AS BIGINT) AS n_correct,
        |       CAST(ROUND(CAST(SUM(CASE WHEN next_type = predicted_to
        |                 THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT) AS acc_e6
        |FROM st JOIN pred ON pred.from_type = st.from_type
        |GROUP BY st.from_type ORDER BY st.from_type""".stripMargin,
    // Same epoch-ns day baskets, exact marginals, one mirrored ln
    // chain per pair.
    "q375_event_pmi" ->
      """WITH b AS (
        |  SELECT DISTINCT user_id,
        |         epoch_ns(ts) // 86400000000000 AS day, event_type
        |  FROM events),
        |n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nb
        |      FROM (SELECT DISTINCT user_id, day FROM b)),
        |marg AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nt
        |         FROM b GROUP BY event_type),
        |pairs AS (
        |  SELECT a.event_type AS ta, c.event_type AS tb,
        |         CAST(COUNT(*) AS BIGINT) AS n_ab
        |  FROM b a JOIN b c ON c.user_id = a.user_id AND c.day = a.day
        |  WHERE a.event_type < c.event_type
        |  GROUP BY 1, 2)
        |SELECT ta AS type_a, tb AS type_b,
        |       ma.nt AS n_a, mb.nt AS n_b, n_ab, nb AS n_baskets,
        |       CAST(ROUND(ln(CAST(n_ab AS DOUBLE) * CAST(nb AS DOUBLE)
        |         / (CAST(ma.nt AS DOUBLE) * CAST(mb.nt AS DOUBLE)))
        |         * 1000000) AS BIGINT) AS pmi_e6
        |FROM pairs JOIN marg ma ON ma.event_type = ta
        |           JOIN marg mb ON mb.event_type = tb
        |           CROSS JOIN n
        |ORDER BY type_a, type_b""".stripMargin,
    // Same lead-window transition matrix with END state, 8 unrolled
    // all-integer absorption rounds with the identical
    // (2·num + r) // (2r) half-up division.
    "q314_markov_absorption" -> markovAbsorptionOracle,
    // q37's exact session CTE + the nested step mins (tv, click > tv,
    // purchase > tc) on epoch_ns, mirrored rates with zero guards.
    "q329_session_funnel" ->
      """WITH flag AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
        |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 43200000000000
        |         THEN 1 ELSE 0 END AS nf
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_type, epoch_ns(ts) AS tns,
        |    SUM(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM flag),
        |tv AS (
        |  SELECT user_id, sess,
        |         MIN(CASE WHEN event_type = 'view' THEN tns END) AS tv
        |  FROM sess GROUP BY user_id, sess),
        |tc AS (
        |  SELECT s.user_id, s.sess, ANY_VALUE(tv.tv) AS tv2,
        |         MIN(CASE WHEN s.event_type = 'click' AND s.tns > tv.tv
        |                  THEN s.tns END) AS tc
        |  FROM sess s JOIN tv ON tv.user_id = s.user_id AND tv.sess = s.sess
        |  GROUP BY s.user_id, s.sess),
        |tp AS (
        |  SELECT s.user_id, s.sess, ANY_VALUE(tc.tv2) AS tv3,
        |         ANY_VALUE(tc.tc) AS tc2,
        |         MIN(CASE WHEN s.event_type = 'purchase' AND s.tns > tc.tc
        |                  THEN s.tns END) AS tp
        |  FROM sess s JOIN tc ON tc.user_id = s.user_id AND tc.sess = s.sess
        |  GROUP BY s.user_id, s.sess)
        |SELECT CAST(COUNT(*) AS BIGINT) AS sessions,
        |       CAST(COUNT(tv3) AS BIGINT) AS with_view,
        |       CAST(COUNT(tc2) AS BIGINT) AS view_click,
        |       CAST(COUNT(tp) AS BIGINT) AS full_path,
        |       CASE WHEN COUNT(tv3) > 0 THEN
        |         CAST(ROUND(CAST(COUNT(tc2) AS DOUBLE)
        |           / CAST(COUNT(tv3) AS DOUBLE) * 1000000) AS BIGINT) END
        |         AS click_given_view_e6,
        |       CASE WHEN COUNT(tv3) > 0 THEN
        |         CAST(ROUND(CAST(COUNT(tp) AS DOUBLE)
        |           / CAST(COUNT(tv3) AS DOUBLE) * 1000000) AS BIGINT) END
        |         AS purchase_given_view_e6
        |FROM tp""".stripMargin,
    // Same first-click/first-purchase min aggs (µs lags ≡ the engine's
    // ns lags ×1000 exactly), integer window tests, mirrored rates.
    "q327_conversion_windows" ->
      """WITH fc AS (
        |  SELECT user_id, MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS tc
        |  FROM events WHERE event_type = 'click' GROUP BY user_id),
        |pc AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS tb
        |       FROM events WHERE event_type = 'purchase'),
        |lg AS (
        |  SELECT fc.user_id, fc.tc,
        |         MIN(CASE WHEN tb >= tc THEN tb END) AS tconv
        |  FROM fc LEFT JOIN pc ON pc.user_id = fc.user_id
        |  GROUP BY fc.user_id, fc.tc),
        |l AS (SELECT tconv - tc AS lag_us FROM lg),
        |a AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS clickers,
        |    CAST(SUM(CASE WHEN lag_us IS NOT NULL
        |          AND lag_us <= 1 * 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c1,
        |    CAST(SUM(CASE WHEN lag_us IS NOT NULL
        |          AND lag_us <= 24 * 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c24,
        |    CAST(SUM(CASE WHEN lag_us IS NOT NULL
        |          AND lag_us <= 72 * 3600000000 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS c72,
        |    CAST(SUM(CASE WHEN lag_us IS NOT NULL
        |          AND lag_us <= 168 * 3600000000 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS c168
        |  FROM l)
        |SELECT window_h, clickers, converted,
        |       CASE WHEN clickers > 0 THEN
        |         CAST(ROUND(CAST(converted AS DOUBLE)
        |           / CAST(clickers AS DOUBLE) * 1000000) AS BIGINT) END
        |         AS rate_e6
        |FROM (
        |  SELECT CAST(1 AS BIGINT) AS window_h, clickers, c1 AS converted
        |  FROM a
        |  UNION ALL SELECT 24, clickers, c24 FROM a
        |  UNION ALL SELECT 72, clickers, c72 FROM a
        |  UNION ALL SELECT 168, clickers, c168 FROM a)
        |ORDER BY window_h""".stripMargin,
    // Same per-row e9-gridded ln(unit price)/ln(qty), exact HUGEINT
    // OLS moments, one mirrored slope division with the exact
    // zero-variance guard.
    "q328_price_elasticity" ->
      """WITH r AS (
        |  SELECT p_brand AS brand,
        |    CAST(ROUND(ln(
        |      CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT) AS DOUBLE)
        |      / CAST(CAST(l_quantity AS BIGINT) AS DOUBLE))
        |      * 1000000000) AS BIGINT) AS x,
        |    CAST(ROUND(ln(CAST(CAST(l_quantity AS BIGINT) AS DOUBLE))
        |      * 1000000000) AS BIGINT) AS y
        |  FROM lineitem JOIN part ON p_partkey = l_partkey),
        |m AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         SUM(CAST(x AS HUGEINT) * y) AS sxy,
        |         SUM(CAST(x AS HUGEINT) * x) AS sxx
        |  FROM r GROUP BY brand)
        |SELECT brand, n AS n_lines,
        |  CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx <> 0
        |  THEN CAST(ROUND(
        |    CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy
        |         AS DOUBLE)
        |    / CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
        |           AS DOUBLE)
        |    * 1000000) AS BIGINT) END AS elasticity_e6
        |FROM m ORDER BY brand""".stripMargin,
    // Same user-keyed purchase lead window, integer day gaps, exact
    // HUGEINT moments, mirrored m/v/k/θ chain with the exact integer
    // zero-variance guard.
    "q324_gamma_repurchase" ->
      """WITH p AS (
        |  SELECT user_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         LEAD(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000)
        |           OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
        |  FROM events WHERE event_type = 'purchase'),
        |g AS (SELECT nxt - day AS g FROM p WHERE nxt IS NOT NULL),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(g) AS BIGINT) AS sg,
        |         SUM(CAST(g AS HUGEINT) * g) AS qg
        |  FROM g)
        |SELECT n AS n_gaps,
        |  CAST(ROUND(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
        |       AS BIGINT) AS mean_days_e4,
        |  CASE WHEN NOT (CAST(n AS HUGEINT) * qg
        |                 = CAST(sg AS HUGEINT) * sg) AND n > 1 THEN
        |    CAST(ROUND(
        |      CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)
        |      * (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      / ((CAST(qg AS DOUBLE)
        |          - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)
        |            * CAST(sg AS DOUBLE))
        |         / CAST(n - 1 AS DOUBLE))
        |      * 1000000) AS BIGINT) END AS k_e6,
        |  CASE WHEN NOT (CAST(n AS HUGEINT) * qg
        |                 = CAST(sg AS HUGEINT) * sg) AND n > 1 THEN
        |    CAST(ROUND(
        |      ((CAST(qg AS DOUBLE)
        |        - CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)
        |          * CAST(sg AS DOUBLE))
        |       / CAST(n - 1 AS DOUBLE))
        |      / (CAST(sg AS DOUBLE) / CAST(n AS DOUBLE))
        |      * 10000) AS BIGINT) END AS theta_e4
        |FROM m""".stripMargin,
    // Same cohort/day grid, mirrored ln-constant terms e9-gridded per
    // day before the exact cumsum, gridded-integer decision bounds.
    "q322_sprt_trace" ->
      """WITH daily AS (
        |  SELECT epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(CASE WHEN event_type = 'purchase'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS x
        |  FROM events WHERE user_id % 2 = 1
        |  GROUP BY 1),
        |t AS (
        |  SELECT day, n, x,
        |         CAST(ROUND((CAST(x AS DOUBLE) * ln(0.12 / 0.10)
        |           + CAST(n - x AS DOUBLE) * ln(0.88 / 0.90))
        |           * 1000000000) AS BIGINT) AS t
        |  FROM daily),
        |c AS (
        |  SELECT day, n, x,
        |         CAST(SUM(t) OVER (ORDER BY day
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |           AS BIGINT) AS llr_e9
        |  FROM t)
        |SELECT day, n, x, llr_e9,
        |       CASE WHEN llr_e9 >= CAST(ROUND(ln(19.0) * 1000000000)
        |                                AS BIGINT) THEN 'accept_h1'
        |            WHEN llr_e9 <= -CAST(ROUND(ln(19.0) * 1000000000)
        |                                 AS BIGINT) THEN 'accept_h0'
        |            ELSE 'continue' END AS decision
        |FROM c
        |ORDER BY day""".stripMargin,
    // Same distinct baskets, frequent-pair item prune, exact triple
    // counts, one mirrored support division.
    "q318_triple_itemsets" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p
        |            FROM lineitem),
        |f2 AS (
        |  SELECT a.p AS a, b.p AS b
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
        |fitems AS (SELECT DISTINCT a AS p FROM f2
        |           UNION SELECT DISTINCT b FROM f2),
        |lif AS (SELECT li.o, li.p FROM li
        |        WHERE li.p IN (SELECT p FROM fitems)),
        |no AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n_orders FROM li),
        |t AS (
        |  SELECT a.p AS pa, b.p AS pb, c.p AS pc,
        |         CAST(COUNT(*) AS BIGINT) AS support
        |  FROM lif a
        |  JOIN lif b ON b.o = a.o AND a.p < b.p
        |  JOIN lif c ON c.o = a.o AND b.p < c.p
        |  GROUP BY 1, 2, 3 HAVING COUNT(*) >= 2)
        |SELECT pa, pb, pc, support,
        |       CAST(ROUND(CAST(support AS DOUBLE) / CAST(n_orders AS DOUBLE)
        |         * 1000000) AS BIGINT) AS supp_e6
        |FROM t CROSS JOIN no
        |ORDER BY pa, pb, pc""".stripMargin,
    // Same (type × day) calendar grid, per-pair mirrored double
    // division e6-gridded, exact-interpolation median doubled before
    // the BIGINT cast.
    "q301_theil_sen" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS c
        |  FROM events GROUP BY 1, 2),
        |p AS (
        |  SELECT a.event_type,
        |         CAST(ROUND(CAST(b.c - a.c AS DOUBLE)
        |                    / CAST(b.day - a.day AS DOUBLE)
        |                    * 1000000) AS BIGINT) AS slope_e6
        |  FROM daily a JOIN daily b
        |    ON a.event_type = b.event_type AND a.day < b.day)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(quantile_cont(slope_e6, 0.5) * 2 AS BIGINT)
        |         AS med2_slope_e6
        |FROM p GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // Same k-bounded fof frame, mirrored ln(k!·Nk/N) e6 per k,
    // HUGEINT regression moments, mirrored slope division and exp.
    "q299_poissonness" ->
      """WITH b AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS k
        |  FROM lineitem GROUP BY 1),
        |fof AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n_k FROM b GROUP BY k),
        |t AS (SELECT CAST(SUM(n_k) AS BIGINT) AS n FROM fof),
        |pts AS (
        |  SELECT k, n_k,
        |         CAST(ROUND(ln(CAST(factorial(CAST(k AS INT)) AS DOUBLE)
        |                       * CAST(n_k AS DOUBLE) / CAST(n AS DOUBLE))
        |                    * 1000000) AS BIGINT) AS phi_e6
        |  FROM fof CROSS JOIN t),
        |reg AS (
        |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
        |         CAST(SUM(k) AS HUGEINT) AS sk,
        |         SUM(CAST(k AS HUGEINT) * k) AS skk,
        |         CAST(SUM(phi_e6) AS HUGEINT) AS sp,
        |         SUM(CAST(k AS HUGEINT) * phi_e6) AS skp
        |  FROM pts)
        |SELECT k, n_k, phi_e6,
        |       CAST(ROUND(CAST(m * skp - sk * sp AS DOUBLE)
        |                  / CAST((m * skk - sk * sk) * 1000000 AS DOUBLE)
        |                  * 1000000) AS BIGINT) AS slope_e6,
        |       CAST(ROUND(exp(CAST(m * skp - sk * sp AS DOUBLE)
        |                      / CAST((m * skk - sk * sk) * 1000000 AS DOUBLE))
        |                  * 10000) AS BIGINT) AS lambda_e4
        |FROM pts CROSS JOIN reg
        |ORDER BY k""".stripMargin,
    // Same (type × day) frame, per-day e9-gridded decay factors
    // multiplied by exact counts, HUGEINT sums, mirrored shares.
    "q296_trending" ->
      """WITH c AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |m AS (SELECT MAX(day) AS maxday FROM c),
        |t AS (
        |  SELECT event_type, CAST(SUM(x) AS BIGINT) AS n_events,
        |         CAST(SUM(CAST(x AS HUGEINT)
        |                   * CAST(ROUND(exp(-CAST(maxday - day AS DOUBLE)
        |                                    / 30.0) * 1000000000) AS BIGINT))
        |              AS HUGEINT) AS decayed
        |  FROM c CROSS JOIN m GROUP BY event_type),
        |g AS (SELECT CAST(SUM(n_events) AS BIGINT) AS tn,
        |             CAST(SUM(decayed) AS HUGEINT) AS td FROM t)
        |SELECT event_type, n_events, CAST(decayed AS BIGINT) AS decayed_e9,
        |       CAST(ROUND(CAST(n_events AS DOUBLE) / CAST(tn AS DOUBLE)
        |                  * 1000000) AS BIGINT) AS raw_share_e6,
        |       CAST(ROUND(CAST(decayed AS DOUBLE) / CAST(td AS DOUBLE)
        |                  * 1000000) AS BIGINT) AS decayed_share_e6
        |FROM t CROSS JOIN g
        |ORDER BY event_type""".stripMargin,
    // Same 12h-gap session ids over epoch-µs·1000 (the nanos contract
    // reconstructed), rank-1 entry pick ≡ the Spark min-struct,
    // mirrored rate division.
    "q293_entry_conversion" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) * 1000 AS tsn
        |  FROM events),
        |nf AS (
        |  SELECT user_id, event_id, event_type, tsn,
        |         CASE WHEN LAG(tsn) OVER w IS NULL
        |                   OR tsn - LAG(tsn) OVER w > 43200000000000
        |              THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tsn, event_id)),
        |sx AS (
        |  SELECT user_id, event_id, event_type, tsn,
        |         SUM(nf) OVER (PARTITION BY user_id ORDER BY tsn, event_id
        |                       ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM nf),
        |r AS (
        |  SELECT user_id, sess, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id, sess
        |                            ORDER BY tsn, event_id) AS rn,
        |         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
        |           OVER (PARTITION BY user_id, sess) AS converted,
        |         COUNT(*) OVER (PARTITION BY user_id, sess) AS n_ev
        |  FROM sx),
        |ses AS (
        |  SELECT event_type AS entry_type, converted, n_ev
        |  FROM r WHERE rn = 1)
        |SELECT entry_type, CAST(COUNT(*) AS BIGINT) AS n_sessions,
        |       CAST(SUM(converted) AS BIGINT) AS n_converted,
        |       CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |       CAST(ROUND(CAST(SUM(converted) AS DOUBLE)
        |                  / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS conv_e6
        |FROM ses GROUP BY entry_type
        |ORDER BY entry_type""".stripMargin,
    // Rank-1 window pick ≡ the Spark max-struct (unique (ts, event_id)
    // key); integer counts, mirrored share/mean divisions.
    "q282_journey_end" ->
      """WITH r AS (
        |  SELECT user_id, event_type,
        |         ROW_NUMBER() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn,
        |         COUNT(*) OVER (PARTITION BY user_id) AS n_ev
        |  FROM events),
        |pu AS (SELECT user_id, event_type AS end_type, n_ev
        |       FROM r WHERE rn = 1),
        |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_users_total FROM pu)
        |SELECT end_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |       CAST(SUM(n_ev) AS BIGINT) AS n_events,
        |       CAST(ROUND(CAST(COUNT(*) AS DOUBLE)
        |                  / CAST(n_users_total AS DOUBLE) * 1000000)
        |            AS BIGINT) AS share_e6,
        |       CAST(ROUND(CAST(SUM(n_ev) AS DOUBLE)
        |                  / CAST(COUNT(*) AS DOUBLE) * 10000) AS BIGINT)
        |         AS mean_len_e4
        |FROM pu CROSS JOIN tot
        |GROUP BY end_type, n_users_total
        |ORDER BY end_type""".stripMargin,
    // Same user-keyed lead transitions, per-cell e9 ln terms BEFORE
    // the exact integer sums.
    "q283_entropy_rate" ->
      """WITH s AS (
        |  SELECT event_type AS t0,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS t1
        |  FROM events),
        |t AS (
        |  SELECT t0, t1, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE t1 IS NOT NULL GROUP BY t0, t1),
        |tot AS (SELECT t0, CAST(SUM(n) AS BIGINT) AS n0 FROM t GROUP BY t0),
        |a AS (SELECT CAST(SUM(n) AS BIGINT) AS nn FROM t),
        |c AS (
        |  SELECT t.t0, tot.n0,
        |         CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(n0 AS DOUBLE))
        |                    * ln(CAST(n AS DOUBLE) / CAST(n0 AS DOUBLE))
        |                    * 1000000000) AS BIGINT) AS h_term_e9,
        |         CAST(ROUND(-(CAST(n AS DOUBLE) / CAST(nn AS DOUBLE))
        |                    * ln(CAST(n AS DOUBLE) / CAST(n0 AS DOUBLE))
        |                    * 1000000000) AS BIGINT) AS rate_term_e9
        |  FROM t JOIN tot ON t.t0 = tot.t0 CROSS JOIN a)
        |SELECT t0, CAST(MAX(n0) AS BIGINT) AS n_trans,
        |       CAST(COUNT(*) AS BIGINT) AS n_next_types,
        |       CAST(SUM(h_term_e9) AS BIGINT) AS h_e9,
        |       CAST(SUM(rate_term_e9) AS BIGINT) AS rate_part_e9
        |FROM c GROUP BY t0
        |ORDER BY t0""".stripMargin,
    // Same distinct (user, type) frame, exact set arithmetic, one
    // mirrored Jaccard division e6-gridded.
    "q279_audience_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |sz AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM ut GROUP BY event_type),
        |ab AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_both
        |  FROM ut a JOIN ut b
        |    ON a.user_id = b.user_id AND a.event_type < b.event_type
        |  GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
        |       CAST(ROUND(CAST(n_both AS DOUBLE)
        |                  / CAST(sa.n + sb.n - n_both AS DOUBLE) * 1000000)
        |            AS BIGINT) AS jaccard_e6
        |FROM ab
        |JOIN sz sa ON sa.event_type = type_a
        |JOIN sz sb ON sb.event_type = type_b
        |ORDER BY type_a, type_b""".stripMargin,
    // Same (type × hour) frame, integer argmax, mirrored share and
    // peak-to-mean doubles gridded once.
    "q275_hourly_profile" ->
      """WITH d AS (
        |  SELECT event_type,
        |         (epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000) % 24 AS hr
        |  FROM events),
        |c AS (
        |  SELECT event_type, hr, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM d GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type, hr, x,
        |         CAST(SUM(x) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS nh,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY x DESC, hr) AS rn
        |  FROM c)
        |SELECT event_type, hr AS peak_hour, x AS peak_n, tot AS n_events,
        |       nh AS n_hours,
        |       CAST(ROUND(CAST(x AS DOUBLE) / CAST(tot AS DOUBLE) * 1000000)
        |            AS BIGINT) AS peak_share_e6,
        |       CAST(ROUND(CAST(x AS DOUBLE) * CAST(nh AS DOUBLE)
        |                  / CAST(tot AS DOUBLE) * 10000) AS BIGINT)
        |         AS flatness_e4
        |FROM p WHERE rn = 1
        |ORDER BY event_type""".stripMargin,
    // Same (type × day) frame and prefix sums; gain formed as the same
    // HUGEINT rational, ranked by the identical double quotient with the
    // (gain DESC, day) tie-break, e4-gridded once.
    "q270_changepoint" ->
      """WITH d AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |c AS (
        |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM d GROUP BY 1, 2),
        |p AS (
        |  SELECT event_type, day,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY event_type
        |                                 ORDER BY day) AS HUGEINT) AS k,
        |         CAST(SUM(x) OVER (PARTITION BY event_type
        |                           ORDER BY day) AS HUGEINT) AS s1,
        |         CAST(COUNT(*) OVER (PARTITION BY event_type) AS HUGEINT) AS n,
        |         CAST(SUM(x) OVER (PARTITION BY event_type) AS HUGEINT) AS stot
        |  FROM c),
        |g AS (
        |  SELECT event_type, day, n,
        |         CAST(s1 * s1 * (n - k) * n
        |                + (stot - s1) * (stot - s1) * k * n
        |                - stot * stot * k * (n - k) AS DOUBLE)
        |           / CAST(k * (n - k) * n AS DOUBLE) AS gain_dbl
        |  FROM p WHERE k < n),
        |r AS (
        |  SELECT event_type, n, day, gain_dbl,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY gain_dbl DESC, day) AS rn
        |  FROM g)
        |SELECT event_type, CAST(n AS BIGINT) AS n_days, day AS split_day,
        |       CAST(ROUND(gain_dbl * 10000) AS BIGINT) AS gain_e4
        |FROM r WHERE rn = 1
        |ORDER BY event_type""".stripMargin,
    "q161_assoc_rules" ->
      """WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
        |n AS (SELECT CAST(COUNT(DISTINCT o) AS BIGINT) AS n FROM li),
        |sup AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS s FROM li GROUP BY p),
        |pairs AS (
        |  SELECT a.p AS a, b.p AS b, CAST(COUNT(*) AS BIGINT) AS sup_ab
        |  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
        |  GROUP BY a.p, b.p)
        |SELECT a, b, sup_ab, sa.s AS sup_a, sb.s AS sup_b,
        |  CAST(ROUND(CAST(sup_ab AS DOUBLE) / sa.s * 10000) AS BIGINT) AS conf_e4,
        |  CAST(ROUND(CAST(sup_ab * n.n AS DOUBLE) / (sa.s * sb.s) * 10000) AS BIGINT)
        |    AS lift_e4
        |FROM pairs JOIN sup sa ON sa.p = pairs.a JOIN sup sb ON sb.p = pairs.b
        |CROSS JOIN n
        |ORDER BY sup_ab DESC, a, b LIMIT 50""".stripMargin,
    "q162_event_transitions" ->
      """WITH s AS (
        |  SELECT event_type,
        |         LEAD(event_type) OVER (PARTITION BY user_id
        |                                ORDER BY ts, event_id) AS next_type
        |  FROM events),
        |t AS (
        |  SELECT event_type AS from_type, next_type AS to_type,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM s WHERE next_type IS NOT NULL
        |  GROUP BY event_type, next_type),
        |tot AS (SELECT from_type, SUM(n) AS n_from FROM t GROUP BY from_type)
        |SELECT t.from_type, t.to_type, t.n, CAST(tot.n_from AS BIGINT) AS n_from,
        |  CAST(ROUND(CAST(t.n AS DOUBLE) / tot.n_from * 10000) AS BIGINT) AS p_e4
        |FROM t JOIN tot ON tot.from_type = t.from_type
        |ORDER BY t.from_type, to_type""".stripMargin,
    "q163_weighted_median" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |         CAST(len(string_split(text, ' ')) AS BIGINT) AS len
        |  FROM documents),
        |c AS (
        |  SELECT source, len,
        |         SUM(len) OVER (PARTITION BY source ORDER BY len, doc_id
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(len) OVER (PARTITION BY source) AS total_tokens
        |  FROM d)
        |SELECT source, CAST(MAX(total_tokens) AS BIGINT) AS total_tokens,
        |       CAST(MIN(len) AS BIGINT) AS wmedian_len
        |FROM c WHERE cum * 2 >= total_tokens
        |GROUP BY source ORDER BY source""".stripMargin,
    // Same first-view / first-subsequent-purchase derivation and the
    // identical rank-quota quantiles over exact µs lags.
    "q195_conversion_lag" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |v AS (
        |  SELECT user_id,
        |         MIN(CASE WHEN event_type = 'view' THEN us END) AS fv
        |  FROM e GROUP BY user_id HAVING fv IS NOT NULL),
        |c AS (
        |  SELECT e.user_id, MIN(e.us) - MIN(v.fv) AS lag_us
        |  FROM e JOIN v ON v.user_id = e.user_id
        |  WHERE e.event_type = 'purchase' AND e.us >= v.fv
        |  GROUP BY e.user_id),
        |r AS (
        |  SELECT user_id, lag_us,
        |         ROW_NUMBER() OVER (ORDER BY lag_us, user_id) AS rn,
        |         COUNT(*) OVER () AS n_conv
        |  FROM c),
        |s AS (
        |  SELECT CAST(MAX(n_conv) AS BIGINT) AS n_converted,
        |         CAST(MIN(lag_us) AS BIGINT) AS lag_p50_us,
        |         CAST(MIN(CASE WHEN rn * 10 >= n_conv * 9 THEN lag_us END)
        |              AS BIGINT) AS lag_p90_us
        |  FROM r WHERE rn * 2 >= n_conv)
        |SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_viewers,
        |  s.n_converted,
        |  CAST(ROUND(CAST(s.n_converted AS DOUBLE)
        |             / (SELECT COUNT(*) FROM v) * 10000) AS BIGINT) AS conv_e4,
        |  s.lag_p50_us, s.lag_p90_us
        |FROM s""".stripMargin,
    // Same lead-window trigrams under the identical (us, event_id)
    // order; conditionals are exact divisions of trigram masses.
    "q197_trigram_paths" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type AS t0,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |l AS (
        |  SELECT t0,
        |         LEAD(t0, 1) OVER (PARTITION BY user_id
        |                           ORDER BY us, event_id) AS t1,
        |         LEAD(t0, 2) OVER (PARTITION BY user_id
        |                           ORDER BY us, event_id) AS t2
        |  FROM e),
        |tri AS (
        |  SELECT t0, t1, t2, CAST(COUNT(*) AS BIGINT) AS n3
        |  FROM l WHERE t1 IS NOT NULL AND t2 IS NOT NULL
        |  GROUP BY 1, 2, 3),
        |ctx AS (SELECT t0, t1, CAST(SUM(n3) AS BIGINT) AS n2
        |        FROM tri GROUP BY 1, 2)
        |SELECT tri.t0, tri.t1, tri.t2, tri.n3, ctx.n2,
        |  CAST(ROUND(CAST(tri.n3 AS DOUBLE) / CAST(ctx.n2 AS DOUBLE) * 10000)
        |       AS BIGINT) AS cond_e4
        |FROM tri JOIN ctx ON ctx.t0 = tri.t0 AND ctx.t1 = tri.t1
        |ORDER BY tri.t0, tri.t1, tri.t2""".stripMargin,
    // Identical Wilson expression (same operation order, one sqrt)
    // over exact-integer day counts; same integer day bucket.
    "q193_error_monitor" ->
      """WITH d AS (
        |  SELECT DATE '1970-01-01'
        |           + CAST(epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS INT)
        |           AS day,
        |         CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS err
        |  FROM events),
        |a AS (
        |  SELECT day, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(err) AS BIGINT) AS errors
        |  FROM d GROUP BY day)
        |SELECT day, n, errors,
        |  CAST(ROUND(CAST(errors AS DOUBLE) / CAST(n AS DOUBLE) * 10000)
        |       AS BIGINT) AS rate_e4,
        |  CAST(ROUND(
        |    (CAST(errors AS DOUBLE) / CAST(n AS DOUBLE)
        |       + 1.96 * 1.96 / (2 * CAST(n AS DOUBLE))
        |       - 1.96 * SQRT(CAST(errors AS DOUBLE) / CAST(n AS DOUBLE)
        |                       * (1 - CAST(errors AS DOUBLE) / CAST(n AS DOUBLE))
        |                       / CAST(n AS DOUBLE)
        |                     + 1.96 * 1.96
        |                       / (4 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
        |    / (1 + 1.96 * 1.96 / CAST(n AS DOUBLE)) * 10000) AS BIGINT)
        |    AS wilson_lb_e4
        |FROM a ORDER BY day""".stripMargin,
    // Same (cnt DESC, user_id) rank order and integer ⌈n·frac⌉
    // cutoffs; shares are exact-integer divisions.
    "q194_concentration" ->
      """WITH c AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, user_id, x,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY x DESC, user_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS nu
        |  FROM c)
        |SELECT event_type, CAST(MAX(nu) AS BIGINT) AS n_users,
        |  CAST(SUM(x) AS BIGINT) AS n_events,
        |  CAST(ROUND(CAST(SUM(CASE WHEN rn <= (nu + 99) // 100 THEN x ELSE 0 END)
        |                  AS DOUBLE) / CAST(SUM(x) AS DOUBLE) * 10000) AS BIGINT)
        |    AS top1_share_e4,
        |  CAST(ROUND(CAST(SUM(CASE WHEN rn <= (nu + 19) // 20 THEN x ELSE 0 END)
        |                  AS DOUBLE) / CAST(SUM(x) AS DOUBLE) * 10000) AS BIGINT)
        |    AS top5_share_e4,
        |  CAST(ROUND(CAST(SUM(CASE WHEN rn <= (nu + 9) // 10 THEN x ELSE 0 END)
        |                  AS DOUBLE) / CAST(SUM(x) AS DOUBLE) * 10000) AS BIGINT)
        |    AS top10_share_e4
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Same carry-forward MAX window under the identical (us, event_id)
    // order; day = integer µs division; share an exact division.
    "q190_attribution" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |m AS (
        |  SELECT event_type, us,
        |         MAX(CASE WHEN event_type = 'click' THEN us END)
        |           OVER (PARTITION BY user_id ORDER BY us, event_id
        |                 ROWS UNBOUNDED PRECEDING) AS last_click_us
        |  FROM e),
        |p AS (
        |  SELECT DATE '1970-01-01'
        |           + CAST(us // 86400000000 AS INT) AS day,
        |         CASE WHEN last_click_us IS NOT NULL
        |                   AND us - last_click_us <= 7 * 86400000000
        |              THEN 1 ELSE 0 END AS attr
        |  FROM m WHERE event_type = 'purchase')
        |SELECT day, CAST(COUNT(*) AS BIGINT) AS n_purchases,
        |  CAST(SUM(attr) AS BIGINT) AS n_attributed,
        |  CAST(ROUND(CAST(SUM(attr) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |             * 10000) AS BIGINT) AS attr_share_e4
        |FROM p GROUP BY day ORDER BY day""".stripMargin,
    // Same rank formula over exact BIGINTs; the single division of
    // two exact integers is bit-exact cross-engine.
    "q182_activity_gini" ->
      """WITH c AS (
        |  SELECT event_type, user_id, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |r AS (
        |  SELECT event_type, x,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY x, user_id) AS rn
        |  FROM c)
        |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |  CAST(SUM(x) AS BIGINT) AS n_events,
        |  CAST(ROUND(CAST(2 * SUM(rn * x) - (COUNT(*) + 1) * SUM(x) AS DOUBLE)
        |             / CAST(COUNT(*) * SUM(x) AS DOUBLE) * 10000) AS BIGINT)
        |    AS gini_e4
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // µs via the same TIMESTAMP truncation as the q45 oracle; exact
    // order statistics via the identical rank/quota integer compares.
    "q179_event_gaps" ->
      """WITH e AS (
        |  SELECT user_id, event_type, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |g AS (
        |  SELECT event_type, event_id,
        |         us - LAG(us) OVER (PARTITION BY user_id, event_type
        |                            ORDER BY us, event_id) AS gap_us
        |  FROM e),
        |r AS (
        |  SELECT event_type, gap_us,
        |         ROW_NUMBER() OVER (PARTITION BY event_type
        |                            ORDER BY gap_us, event_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY event_type) AS ng
        |  FROM g WHERE gap_us IS NOT NULL)
        |SELECT event_type, CAST(MAX(ng) AS BIGINT) AS n_gaps,
        |  CAST(MIN(CASE WHEN rn * 2 >= ng THEN gap_us END) AS BIGINT) AS p50_us,
        |  CAST(MIN(CASE WHEN rn * 10 >= ng * 9 THEN gap_us END) AS BIGINT) AS p90_us
        |FROM r GROUP BY event_type ORDER BY event_type""".stripMargin,
    // Identical z expression over exact BIGINT window sums; trailing
    // 7 ROWS (observed days), full-history rows only.
    "q170_event_anomaly" ->
      """WITH daily AS (
        |  SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1),
        |win AS (
        |  SELECT day, n,
        |    COUNT(*)      OVER w AS k,
        |    SUM(n)        OVER w AS s1,
        |    SUM(n * n)    OVER w AS s2
        |  FROM daily
        |  WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
        |SELECT day, n,
        |  CASE WHEN 7 * s2 > s1 * s1 THEN
        |    CAST(ROUND((CAST(n AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0)
        |               / SQRT(CAST(7 * s2 - s1 * s1 AS DOUBLE) / 49.0)
        |               * 10000) AS BIGINT)
        |  END AS z_e4
        |FROM win WHERE k = 7 ORDER BY day""".stripMargin,
    "q166_token_apportion" ->
      """WITH c AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY source),
        |t AS (SELECT SUM(tokens) AS total FROM c),
        |b AS (
        |  SELECT source, tokens,
        |         tokens * 1000000 // total AS base,
        |         tokens * 1000000 % total AS rem
        |  FROM c CROSS JOIN t),
        |l AS (SELECT 1000000 - SUM(base) AS leftover FROM b),
        |r AS (
        |  SELECT source, tokens, base,
        |         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM b)
        |SELECT source, tokens, CAST(base AS BIGINT) AS base,
        |  CAST(CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS extra,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS quota
        |FROM r CROSS JOIN l
        |ORDER BY source""".stripMargin,
    // Same Hamilton core keyed by length bucket, target histogram as
    // the proportionality source, rank-within-bucket doc selection.
    "q231_quota_resample" -> {
      val tl = Selection.targetSources.map(s => s"'$s'").mkString(", ")
      s"""WITH tgt AS (
         |  SELECT n_chars // 100 AS bucket, CAST(COUNT(*) AS BIGINT) AS tokens
         |  FROM documents WHERE source IN ($tl) GROUP BY 1),
         |t AS (SELECT SUM(tokens) AS total FROM tgt),
         |b AS (
         |  SELECT bucket, tokens,
         |         tokens * 300 // total AS base,
         |         tokens * 300 % total AS rem
         |  FROM tgt CROSS JOIN t),
         |l AS (SELECT 300 - SUM(base) AS leftover FROM b),
         |q AS (
         |  SELECT bucket, tokens AS n_target,
         |         CAST(base + CASE WHEN ROW_NUMBER()
         |                 OVER (ORDER BY rem DESC, bucket) <= leftover
         |               THEN 1 ELSE 0 END AS BIGINT) AS quota
         |  FROM b CROSS JOIN l),
         |raw AS (
         |  SELECT doc_id, n_chars // 100 AS bucket
         |  FROM documents WHERE source NOT IN ($tl)),
         |rb AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_raw
         |       FROM raw GROUP BY 1),
         |kept AS (
         |  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_kept
         |  FROM (SELECT r.bucket,
         |               ROW_NUMBER() OVER (PARTITION BY r.bucket
         |                                  ORDER BY r.doc_id) AS rk,
         |               q.quota
         |        FROM raw r JOIN q USING (bucket)) s
         |  WHERE rk <= quota GROUP BY bucket)
         |SELECT bucket,
         |       COALESCE(n_target, 0) AS n_target,
         |       COALESCE(n_raw, 0) AS n_raw,
         |       COALESCE(quota, 0) AS quota,
         |       COALESCE(n_kept, 0) AS n_kept
         |FROM rb FULL JOIN q USING (bucket) LEFT JOIN kept USING (bucket)
         |ORDER BY bucket""".stripMargin
    },
  )
}
