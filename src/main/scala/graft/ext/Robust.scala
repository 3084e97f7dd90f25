package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Robust statistics & mergeable-state operators — the "trust your
  * summary numbers" family (SURVEY §2.4 extension family):
  *
  *  - [[q238]] winsorized / trimmed means: outlier-robust central
  *    tendency of billing-grade amounts, computed from VALUE-COLLAPSED
  *    frequency tables (no per-row global sort — the rank arithmetic
  *    rides cumulative counts, so it distributes).
  *  - [[q239]] incremental state merge: the partial-aggregate contract
  *    (sum/count/min/max states from two partition eras merged into the
  *    exact full-recompute answer) that incremental rollup pipelines
  *    rely on — demonstrated, and oracle-proven equal to a one-shot agg.
  *  - [[q242]] histogram quantile sketch: equi-width bins as a
  *    MERGEABLE quantile summary (each bin count is a partial agg),
  *    with interpolated p50/p90/p99 — the scale path that replaces
  *    q238's exact ranks when values are unbounded-cardinality.
  *  - [[q243]] EWMA spike monitor over daily event arrivals with an
  *    EXACT RATIONAL decay (a = 9/10 spelled as integer coefficients
  *    9^k·10^(13−k)), so the whole smoother is integer/decimal
  *    arithmetic — no pow(), no libm drift anywhere.
  *
  * Reference capability anchor: the before/after quality statistics of
  * `/root/reference/migration.py:60-113` (mean-level profiling),
  * generalized to outlier-robust and incremental/mergeable forms.
  *
  * Float discipline (CLAUDE.md): q238/q239 are all-integer (floor
  * means via DIV); q242's interpolation and q243's ewma_e4 are single
  * divisions of exactly-computed integers — IEEE division is correctly
  * rounded, so both engines produce bit-identical doubles (no libm op
  * is involved; the q134 margin machinery is not needed).
  */
object Robust {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact cents from a dollars double — the q204 discipline: the
    * double is data-exact at 2 decimals, so decimal(18,2) re-quantizes
    * it losslessly before the ×100.
    */
  private def cents(dollars: Column): Column =
    (dollars.cast("decimal(18,2)") * 100).cast("long")

  /** q238 — winsorized and trimmed means of l_extendedprice per
    * l_returnflag, against the raw mean. Winsorizing clamps to the
    * nearest-rank [p10, p90] values; trimming drops `n DIV 10` rows
    * from each end. Robust location estimates are how a billing
    * pipeline reports "typical amount" without a single corrupt
    * 1e9-cent row moving the dashboard.
    *
    * The percentile machinery is rank arithmetic over the
    * VALUE-COLLAPSED (flag, cents, count) frequency table:
    * cumulative counts give each value row its exact global rank span
    * [prev+1, cum], the nearest-rank percentile is the row whose span
    * covers ceil(q·n), and the trimmed sum is Σ value·|span ∩ (g, n−g]|
    * — integer overlap arithmetic, no per-row tie-break needed (equal
    * values are interchangeable, so the span IS the resolution).
    *
    * Exactness: every output is integer (floor means via DIV); no
    * doubles at all.
    *
    * Scale: the shuffle carries (flag, cents) pairs pre-collapsed by a
    * combiner groupBy — cardinality is DISTINCT VALUES, not rows. The
    * window runs per flag over that collapsed frame (price-grid-
    * bounded, ~1.1M possible cent values for TPC-H prices — constant
    * in SF, same posture as the day-frame windows in SCALE.md). The
    * 3-row limits frame broadcast-joins back. For genuinely unbounded
    * value domains, q242's histogram sketch is the scale path.
    */
  def q238(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        cents(col("l_extendedprice")).as("c"))
      .groupBy(col("flag"), col("c"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("flag").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // Checkpointed (r17): three consumers (the per-flag totals, the
    // limit pick, and the winsorize/trim agg) each re-ran the scan +
    // value-collapse + cumulative window — 3 scans / 3 windows in the
    // before plan, 1 after (2.2 → ~1.2 s at sf0.1). The frame is the
    // VALUE-COLLAPSED census — price-grid-bounded (~1.1M possible cent
    // values), constant in SF — so materializing it is the same
    // footprint posture the window itself already needs.
    val spans = vals
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
      .localCheckpoint(true)
    val grp = spans.groupBy(col("flag"))
      .agg(sum(col("cnt")).as("n"), sum(col("c") * col("cnt")).as("s"))
    val sp = spans.join(broadcast(grp), "flag")
      .withColumn("lo_rank", expr("(n + 9) DIV 10"))
      .withColumn("hi_rank", expr("(9 * n + 9) DIV 10"))
      .withColumn("g", expr("n DIV 10"))
    val limits = sp
      .filter((col("cum") >= col("lo_rank") && col("prev") < col("lo_rank")) ||
        (col("cum") >= col("hi_rank") && col("prev") < col("hi_rank")))
      .groupBy(col("flag"))
      .agg(
        min(when(col("cum") >= col("lo_rank") && col("prev") < col("lo_rank"),
          col("c"))).as("lo_c"),
        min(when(col("cum") >= col("hi_rank") && col("prev") < col("hi_rank"),
          col("c"))).as("hi_c"))
    sp.join(broadcast(limits), "flag")
      .groupBy(col("flag"))
      .agg(
        max(col("n")).as("n"),
        max(col("s")).as("s"),
        max(col("lo_c")).as("lo_c"),
        max(col("hi_c")).as("hi_c"),
        sum(greatest(least(col("c"), col("hi_c")), col("lo_c")) * col("cnt"))
          .as("wsum"),
        // trimmed-span overlap |[prev+1, cum] ∩ (g, n−g]|, clamped ≥ 0
        sum(col("c") *
          greatest(least(col("cum"), col("n") - col("g")) -
            greatest(col("prev"), col("g")), lit(0L))).as("tsum"),
        max(col("n") - col("g") * 2).as("tn"))
      .select(col("flag"), col("n"), col("lo_c"), col("hi_c"),
        expr("s DIV n").as("mean_fc"),
        expr("wsum DIV n").as("wins_mean_fc"),
        expr("tsum DIV tn").as("trim_mean_fc"))
      .orderBy("flag")
  }

  /** q239 — incremental partial-state merge: per-month order revenue
    * states (n, sum_cents, min_c, max_c) aggregated SEPARATELY for the
    * era before 1997-06-15 and the era after, then merged by the
    * algebraic state-merge rules (Σn, Σsum, min-of-mins,
    * max-of-maxes). This is the contract every incremental rollup
    * pipeline depends on: append a new partition's partial state,
    * never re-scan history. The era cut is deliberately MID-month so
    * June 1997 holds a partial state from BOTH eras — the merge is
    * exercised, not vacuous. The oracle computes the same months in
    * ONE pass — merge must equal full recompute, and `n_parts`
    * certifies how many eras contributed per month.
    *
    * Exactness: all integer. Scale: each era's agg is a combiner
    * groupBy to a calendar-bounded (month) frame; the merge is an agg
    * over ≤ 2·months rows.
    */
  def q239(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(date_trunc("month", col("o_orderdate")).cast("date").as("month"),
        cents(col("o_totalprice")).as("c"),
        (col("o_orderdate") < lit("1997-06-15").cast("timestamp")).as("isBase"))
    def era(base: Boolean): DataFrame = o.filter(col("isBase") === lit(base))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("pn"), sum(col("c")).as("ps"),
        min(col("c")).as("pmn"), max(col("c")).as("pmx"))
    era(true).unionAll(era(false))
      .groupBy(col("month"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("sum_cents"),
        min(col("pmn")).as("min_c"), max(col("pmx")).as("max_c"),
        count(lit(1)).as("n_parts"))
      .orderBy("month")
  }

  /** q242 — mergeable histogram quantile sketch: equi-width 100-char
    * bins of document length per source (capped at bin 99), with
    * p50/p90/p99 estimated by linear interpolation inside the covering
    * bin. The bins are plain partial-aggregable counts — two corpus
    * shards' histograms MERGE by addition, which is exactly why
    * production profilers ship histograms, not sorted samples. q238
    * gives exact ranks when the value domain is bounded; this is the
    * unbounded-domain scale path.
    *
    * The estimate for percentile p with target rank t = ceil(p·n/100):
    * find the first bin with cum ≥ t, then
    * `est = 100·bin + 100·(t − cum_prev)/cnt` — lower bin edge plus
    * the within-bin linear fraction. Integer inputs, ONE correctly-
    * rounded IEEE division, identical on both engines; e2 grid.
    *
    * Scale: one corpus scan collapses to (source × ≤100 bins); the
    * quantile extraction runs on that bounded grid.
    */
  def q242(s: SparkSession, dir: String): DataFrame = {
    val h = t(s, dir, "documents")
      .select(col("source"), expr("least(n_chars DIV 100, 99)").as("bin"))
      .groupBy(col("source"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy("bin")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = h
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val grp = spans.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val sp = spans.join(broadcast(grp), "source")
    val ps = Seq(50, 90, 99).map { p =>
      val target = expr(s"($p * n + 99) DIV 100")
      sp.withColumn("t", target)
        .filter(col("cum") >= col("t") && col("prev") < col("t"))
        .select(col("source"), lit(p.toLong).as("p"), col("n"),
          round((col("bin") * 100 +
            (col("t") - col("prev")) * lit(100.0) / col("cnt")) * 100, 0)
            .cast("long").as("est_e2"))
    }
    ps.reduce(_ unionAll _).orderBy("source", "p")
  }

  /** Exact decay coefficients 9^k · 10^(13−k) for k = 0..13 — the
    * rational EWMA weights a^k with a = 9/10, cleared of denominators
    * by the common factor 10^13. Max is 10^13; all fit a long.
    */
  private val ewmaCoefs: Seq[Long] =
    (0 to 13).map(k => BigInt(9).pow(k) * BigInt(10).pow(13 - k)).map(_.toLong)

  /** q243 — EWMA spike monitor over daily event arrivals per type:
    * 14-day exponentially-weighted moving average with decay a = 9/10,
    * computed over a DENSE per-type day grid (missing days count 0),
    * truncated-and-renormalized at the series head. A day spikes when
    * its count exceeds 2× its own EWMA — the arrival-burst alarm that
    * pairs with q233's overdispersion score (VMR says "this feed is
    * bursty", this says "TODAY is the burst").
    *
    * Exactness: a^k is spelled as INTEGER coefficients 9^k·10^(13−k)
    * (denominators cleared), so S = Σ x·coef and N = Σ coef are exact
    * decimal(38,0) sums — no pow(), no libm. `ewma_e4` is one
    * correctly-rounded IEEE division of those exact integers (the
    * decimal→double cast is round-to-nearest in both engines), and the
    * spike predicate `x·N > 2·S` never leaves decimal.
    *
    * Scale: events collapse to the (type × day) grid in one combiner
    * agg; the dense grid, the 14-wide lag fan-out, and the final agg
    * are all calendar-bounded (types × days × 14), independent of SF —
    * the q232/q205 dense-grid posture.
    */
  def q243(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        expr("(CAST(ts AS DECIMAL(20,0)) / 1000) DIV 86400000000")
          .cast("long").as("day"))
      .groupBy(col("event_type"), col("day"))
      .agg(count(lit(1)).as("x"))
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
    val coefArr = array(ewmaCoefs.map(lit): _*)
    val lagged = grid
      .select(col("event_type"), col("day"), col("x"),
        explode(sequence(lit(0), lit(13))).as("k"))
      .select(col("event_type"), col("day"), col("x"), col("k"),
        (col("day") - col("k")).as("src_day"),
        element_at(coefArr, col("k") + 1).cast("decimal(38,0)").as("coef"))
    val src = grid.select(col("event_type"),
      col("day").as("src_day"), col("x").as("xs"))
    // inner join = head truncation: days before the series start
    // contribute neither mass nor normalization.
    lagged.join(src, Seq("event_type", "src_day"))
      .groupBy(col("event_type"), col("day"))
      .agg(max(col("x")).as("n"),
        sum(col("xs").cast("decimal(38,0)") * col("coef")).as("ss"),
        sum(col("coef")).as("nn"))
      .select(col("event_type"), col("day"), col("n"),
        round(col("ss").cast("double") / col("nn").cast("double") * 10000, 0)
          .cast("long").as("ewma_e4"),
        (col("n").cast("decimal(38,0)") * col("nn") > col("ss") * 2)
          .cast("int").as("spike"))
      .orderBy("event_type", "day")
  }

  /** q246 — seasonal-naive forecast-error monitor (MASE-style) on
    * daily order revenue: per month, the mean absolute error of the
    * one-day-naive forecast (r[d−1]) vs the WEEKLY seasonal naive
    * (r[d−7]), and their e4 ratio. The standard "is there weekly
    * seasonality worth modeling" screen: ratio ≪ 1e4 says the
    * seasonal lag explains the series better than persistence.
    *
    * Exactness: day buckets and the dense calendar grid are integer;
    * revenue is exact cents; both error sums are exact BIGINT (bound:
    * Σ|Δdaily-cents| per month < 31 × max daily revenue — the q238
    * cents-sum bound; past ~2⁶³ swap the decimal(38) accumulator,
    * q219 pattern); MAEs are floor DIV; the ratio is ONE mirrored
    * double expression (s7·10⁴/s1) of exact integers on the e4 grid,
    * NULL when a month has zero naive error (both engines).
    *
    * Scale: orders collapse map-side to the calendar-bounded daily
    * frame; the lag window and the dense grid ride day rows (the
    * q243 posture — SCALE.md day-frame note), never orders.
    */
  def q246(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
        .cast("long").as("day"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("r"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("r"), lit(0L)).as("r"))
    val w = Window.orderBy("day")
    grid
      .withColumn("l1", lag(col("r"), 1).over(w))
      .withColumn("l7", lag(col("r"), 7).over(w))
      .filter(col("l7").isNotNull)
      .select(
        date_format(date_add(to_date(lit("1970-01-01")),
          col("day").cast("int")), "yyyy-MM").as("month"),
        abs(col("r") - col("l1")).as("e1"),
        abs(col("r") - col("l7")).as("e7"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("e1")).as("s1"), sum(col("e7")).as("s7"))
      .select(col("month"), col("n_days"),
        expr("s1 DIV n_days").as("mae1_c"),
        expr("s7 DIV n_days").as("mae7_c"),
        when(col("s1") > 0,
          round(col("s7").cast("double") * 10000.0 /
            col("s1").cast("double"), 0).cast("long")).as("mase_e4"))
      .orderBy("month")
  }

  /** q262 — classical additive seasonal decomposition (the moving-
    * average core of STL / X-11): daily revenue = trend + seasonal +
    * residual, with trend the CENTERED 7-day moving average and the
    * weekday seasonal profile the mean of the detrended series per
    * dow. q214 indexes RAW dow revenue — a trending series biases
    * that (later weekdays inherit the growth); detrending first is
    * what isolates the true weekly shape. Reported per dow: the
    * detrended census (n, sum, positive days, extremes) and the
    * seasonal mean.
    *
    * Float discipline: the /7 of the centered MA is CLEARED — the
    * whole decomposition runs in SEVENTHS of a cent (detr7 = 7·r −
    * Σ±3 window), so sums/extremes/sign tests are exact BIGINTs and
    * the only double is the final seasonal mean, ONE mirrored
    * division e2-gridded. Sign-sensitive integer division is never
    * used on the (negative-capable) detrended values — that's the
    * q190 DIV discipline's negative-value corollary.
    *
    * Scale: the q246 posture — orders collapse map-side to the
    * calendar-bounded daily grid; the ±3 window and dow rollup ride
    * day rows. The 7-day sum needs the full window (count = 7), so
    * the 3 edge days on each side drop — in both engines alike.
    */
  def q262(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(expr("datediff(CAST(o_orderdate AS DATE), DATE '1970-01-01')")
        .cast("long").as("day"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(sum(col("c")).as("r"))
    val grid = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("r"), lit(0L)).as("r"))
    val w = Window.orderBy("day").rowsBetween(-3, 3)
    grid
      .withColumn("s7", sum(col("r")).over(w))
      .withColumn("nw", count(lit(1)).over(w))
      .filter(col("nw") === 7)
      .select(((col("day") + 4) % 7).as("dow"),
        (lit(7L) * col("r") - col("s7")).as("detr7"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"),
        sum(col("detr7")).as("sum_detr7"),
        sum(when(col("detr7") > 0, 1L).otherwise(0L)).as("pos_days"),
        min(col("detr7")).as("min_detr7"),
        max(col("detr7")).as("max_detr7"))
      .select(col("dow"), col("n_days"), col("sum_detr7"), col("pos_days"),
        col("min_detr7"), col("max_detr7"),
        round(col("sum_detr7").cast("double") /
          (lit(7d) * col("n_days").cast("double")) * 100d, 0)
          .cast("long").as("seasonal_e2"))
      .orderBy("dow")
  }

  /** q264 — per-source Spearman rank correlation between document
    * length and distinct-token count (lexical density): the robust
    * monotone-association monitor — Pearson on raw values chases
    * outliers (q201's OLS territory), Spearman on ranks survives
    * them. The signal a curation stack watches per feed: a source
    * whose length–vocabulary association collapses is emitting
    * repetitive filler.
    *
    * Tie discipline: average ranks are computed as DOUBLED integers
    * R2 = 2·rank + |ties| − 1 (rank() counts strict predecessors + 1,
    * the tie-count window completes the midpoint — both engines
    * agree exactly), and Pearson is scale/shift-invariant, so rho on
    * R2 equals rho on the true average ranks with ZERO float until
    * the final expression. Moments ride decimal(38) (Σ R2·R2 ~ 4n³
    * wraps BIGINT near 10⁶ rows/source); rho is ONE mirrored
    * sqrt+division over exact integers, e6-gridded, NULL-guarded by
    * the exact integer zero-variance test (q151 discipline).
    *
    * Scale: both rank windows are source-keyed (the q175 posture);
    * the moment agg collapses per source. At 100 TB the exact ranks
    * swap for the q242 binned midpoints, same report shape.
    */
  def q264(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = t(s, dir, "documents")
      .select(col("source"), col("n_chars").as("x"),
        size(array_distinct(split(col("text"), " "))).cast("long").as("y"))
    def r2(v: String): Column =
      (lit(2L) * rank().over(Window.partitionBy("source").orderBy(v)) +
        count(lit(1)).over(Window.partitionBy("source", v)) - 1L)
    val ranked = d.select(col("source"),
      r2("x").as("rx"), r2("y").as("ry"))
    val mom = ranked.groupBy(col("source")).agg(
      count(lit(1)).as("n"),
      sum(col("rx")).as("sx"), sum(col("ry")).as("sy"),
      sum(col("rx").cast(d38) * col("rx")).as("sxx"),
      sum(col("ry").cast(d38) * col("ry")).as("syy"),
      sum(col("rx").cast(d38) * col("ry")).as("sxy"))
    val vx = col("n").cast(d38) * col("sxx") -
      col("sx").cast(d38) * col("sx")
    val vy = col("n").cast(d38) * col("syy") -
      col("sy").cast(d38) * col("sy")
    val cov = col("n").cast(d38) * col("sxy") -
      col("sx").cast(d38) * col("sy")
    mom.select(col("source"), col("n").as("n_docs"),
      when(vx > 0 && vy > 0,
        Similarity.intScaled(
          cov.cast("double") /
            sqrt(vx.cast("double") * vy.cast("double")),
          1000000L)).as("rho_e6"))
      .orderBy("source")
  }

  /** q265 — Mann-Whitney U (Wilcoxon rank-sum) test: are src0 and
    * src1 document lengths drawn from the same distribution? The
    * nonparametric two-sample gate a pipeline runs before pooling
    * feeds — no normality assumption, exactly what q229's KS statistic
    * answers with a different lens (KS sees shape, U sees stochastic
    * dominance).
    *
    * All-integer core: doubled combined ranks (the q264 R2 trick)
    * make the rank sum exact, U2 = 2U = ΣR2₁ − n1(n1+1), the mean
    * shift dev2 = U2 − n1·n2, and the tie-corrected z² is the exact
    * rational 3·dev2²·N(N−1) / (n1·n2·(N³−N−T)) with T = Σ(t³−t)
    * over tie groups — decimal(38) products, ONE mirrored sqrt at
    * the end (z_e4, sign from dev2).
    *
    * Scale: ranks ride the value-collapsed length domain (the q238
    * posture via the tie windows); every aggregate is a one-row
    * frame.
    */
  def q265(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = t(s, dir, "documents")
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"), col("n_chars").as("x"))
    val r2 = lit(2L) * rank().over(Window.orderBy("x")) +
      count(lit(1)).over(Window.partitionBy("x")) - 1L
    val ranked = d.select(col("source"), col("x"), r2.as("rx"))
    val ties = ranked.groupBy(col("x")).agg(count(lit(1)).as("tc"))
      .agg(coalesce(sum(col("tc").cast(d38) * col("tc") * col("tc") -
        col("tc")), lit(0).cast(d38)).as("t"))
    val base = ranked.groupBy(col("source"))
      .agg(count(lit(1)).as("n"), sum(col("rx")).as("sr"))
    val wide = base.filter(col("source") === "src0")
      .select(col("n").as("n1"), col("sr").as("sr1"))
      .withGlobalStats(base.filter(col("source") === "src1")
        .select(col("n").as("n2")))
      .withGlobalStats(ties)
    wide
      .select(col("n1"), col("n2"), col("t").cast("long").as("t_ties"),
        (col("sr1") - col("n1") * (col("n1") + 1)).as("u2"))
      .select(col("n1"), col("n2"), col("t_ties"), col("u2"),
        (col("u2") - col("n1") * col("n2")).as("dev2"))
      .withColumn("nn", col("n1") + col("n2"))
      .select(col("n1"), col("n2"), col("u2"), col("dev2"), col("t_ties"),
        Similarity.intScaled(
          signum(col("dev2").cast("double")) * sqrt(
            (lit(3).cast(d38) * col("dev2") * col("dev2") *
              col("nn") * (col("nn") - 1)).cast("double") /
            (col("n1").cast(d38) * col("n2") *
              (col("nn").cast(d38) * col("nn") * col("nn") - col("nn") -
                col("t_ties"))).cast("double")),
          10000L).as("z_e4"))
  }

  /** q250 — Tukey IQR-fence outlier census of document lengths per
    * source: nearest-rank Q1/Q3 from the value-collapsed
    * (source, n_chars, count) frequency table (the q238 rank-span
    * machinery), fences at 1.5·IQR spelled in HALF-UNITS so the whole
    * test is integer (low: 2c < 2·Q1 − 3·IQR; high: 2c > 2·Q3 +
    * 3·IQR). The box-plot outlier rule every profiling dashboard
    * draws — here as exact counts a filter stage can act on.
    *
    * Scale: identical posture to q238 — the shuffle carries distinct
    * (source, length) values, the rank window rides the value-bounded
    * collapsed frame, the 2-row limits broadcast back. No doubles
    * anywhere.
    */
  def q250(s: SparkSession, dir: String): DataFrame = {
    val vals = t(s, dir, "documents")
      .select(col("source"), col("n_chars").as("c"))
      .groupBy(col("source"), col("c")).agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("source").orderBy("c")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = vals.withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val grp = spans.groupBy(col("source")).agg(sum(col("cnt")).as("n"))
    val sp = spans.join(broadcast(grp), "source")
      .withColumn("q1r", expr("(n + 3) DIV 4"))
      .withColumn("q3r", expr("(3 * n + 3) DIV 4"))
    val limits = sp
      .filter((col("cum") >= col("q1r") && col("prev") < col("q1r")) ||
        (col("cum") >= col("q3r") && col("prev") < col("q3r")))
      .groupBy(col("source"))
      .agg(
        min(when(col("cum") >= col("q1r") && col("prev") < col("q1r"),
          col("c"))).as("q1c"),
        min(when(col("cum") >= col("q3r") && col("prev") < col("q3r"),
          col("c"))).as("q3c"))
    sp.join(broadcast(limits), "source")
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_docs"),
        max(col("q1c")).as("q1_chars"), max(col("q3c")).as("q3_chars"),
        sum(when(col("c") * 2 < col("q1c") * 2 - (col("q3c") - col("q1c")) * 3,
          col("cnt")).otherwise(0L)).as("n_lo"),
        sum(when(col("c") * 2 > col("q3c") * 2 + (col("q3c") - col("q1c")) * 3,
          col("cnt")).otherwise(0L)).as("n_hi"))
      .orderBy("source")
  }

  /** q251 — CUSUM level-shift monitor on daily event arrivals per
    * type: the classic upper CUSUM S_d = max(0, S_{d−1} + (x_d − k))
    * against the per-type reference level k = mean daily count, in
    * CLOSED FORM so it distributes — S_d = P_d − min_{0≤j≤d} P_j with
    * P the prefix sum of increments and P_0 = 0 (the running-minimum
    * identity; the empty prefix is load-bearing — without it the
    * leading rows could never accumulate). No sequential recurrence,
    * just two keyed windows. The
    * change-point cousin of q243's EWMA: EWMA tracks the level, CUSUM
    * accumulates evidence of a SUSTAINED shift and is the standard
    * "did the feed change regime" alarm.
    *
    * Exactness: the rational mean is cleared — increments are
    * x_d·n − Σx (exact BIGINT in 1/n-day units), so P, the running
    * min, and S are ALL integers. The alarm is the 4σ Poisson rule
    * (S/n > 4·√(Σx/n)) cross-multiplied into the exact integer
    * predicate S² > 16·Σx·n — no sqrt, no doubles; the S² and Σx·n
    * products ride decimal(38) (q206 discipline — S reaches n·Σx, so
    * S² wraps BIGINT long before 100 TB). Peak pick is a struct-max
    * (ties → earliest day).
    *
    * Scale: events collapse map-side to the dense calendar-bounded
    * (type × day) grid (q243 posture); both windows are keyed by type
    * and ride day rows. Increment magnitude is daily-count × n-days —
    * ~10¹² at 10⁹ events/day over decades, 2⁶³ has headroom ×10⁶.
    */
  def q251(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
    val grid = daily.groupBy(col("event_type"))
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("event_type"),
        explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("x"), lit(0L)).as("x"))
    val tot = grid.groupBy(col("event_type"))
      .agg(sum(col("x")).as("sx"), count(lit(1)).as("nd"))
    val w = Window.partitionBy("event_type").orderBy("day")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(broadcast(tot), "event_type")
      .withColumn("p", sum(col("x") * col("nd") - col("sx")).over(w))
      // min over prefixes INCLUDING the empty one (P_0 = 0): without
      // the least(0, ·) the first rows could never accumulate.
      .withColumn("s", col("p") - least(lit(0L), min(col("p")).over(w)))
      .groupBy(col("event_type"))
      .agg(max(col("nd")).as("n_days"), max(col("sx")).as("n_events"),
        max(struct(col("s").as("s"), (-col("day")).as("nd_"))).as("peak"),
        sum(when(
          col("s").cast("decimal(38,0)") * col("s") >
            col("sx").cast("decimal(38,0)") * col("nd") * 16,
          1L).otherwise(0L)).as("n_alarm_days"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        col("peak.s").as("max_s"), (-col("peak.nd_")).as("peak_day"),
        col("n_alarm_days"))
      .orderBy("event_type")
  }

  /** q280 — Hill tail-index estimator over document lengths: the mean
    * log-excess (1/k)·Σᵢ₌₁..ₖ ln(x₍ᵢ₎/x₍ₖ₊₁₎) of the k=50 largest
    * `n_chars` over the (k+1)-th order statistic — the standard
    * heavy-tail diagnostic (its reciprocal estimates the Pareto α). A
    * pipeline that shards by document size needs to know whether the
    * length tail is power-law (max-doc skew grows with corpus) or
    * light (it doesn't) — q242's histogram shows the body; Hill
    * measures the TAIL.
    *
    * Float discipline: the order statistics are exact integers chosen
    * by the all-integer (n_chars DESC, doc_id) top-(k+1); each log
    * excess is ONE mirrored ln of an integer ratio, e9-gridded
    * per-term BEFORE the exact sum (q232 discipline); the mean is one
    * mirrored double division of the gridded sum.
    *
    * Scale: the ONLY corpus-wide step is the top-(k+1), which lowers
    * to TakeOrderedAndProject (per-partition heaps, no global sort,
    * no corpus-sized window); everything after rides 51 rows.
    */
  def q280(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val k = 50
    val top = t(s, dir, "documents")
      .select(col("n_chars"), col("doc_id"))
      .orderBy(col("n_chars").desc, col("doc_id"))
      .limit(k + 1)
    val w = Window.orderBy(col("n_chars").desc, col("doc_id"))
    val ranked = top.withColumn("rk", row_number().over(w))
    val xk1 = ranked.filter(col("rk") === k + 1)
      .select(col("n_chars").as("xk1"))
    ranked.filter(col("rk") <= k)
      .withGlobalStats(xk1)
      .select(col("xk1"),
        Similarity.intScaled(
          log(col("n_chars").cast("double") / col("xk1").cast("double")),
          1000000000L).as("term_e9"))
      .groupBy("xk1")
      .agg(count(lit(1)).as("k"), sum(col("term_e9")).as("hill_sum_e9"))
      .select(col("k"), col("xk1"), col("hill_sum_e9"),
        Similarity.intScaled(
          col("hill_sum_e9").cast("double") / lit(1000000000.0) /
            col("k").cast("double"),
          1000000L).as("mean_log_excess_e6"))
  }

  /** q297 — Kaplan–Meier survival curve for time-to-first-purchase:
    * per user, the duration in days from FIRST event to FIRST
    * purchase (right-censored at the corpus's last day for users who
    * never purchase), then the product-limit estimator
    * Ŝ(t) = Π_{tᵢ≤t} (1 − dᵢ/nᵢ) over the event-time grid — the
    * survival-analysis primitive (churn/conversion curves) none of
    * the funnel family (q115/q195/q293) computes: KM handles the
    * censored users a plain quantile of conversion lags silently
    * drops.
    *
    * Float discipline: durations, risk sets, and event counts are
    * exact integers; each step's ln(1−d/n) is ONE mirrored double
    * e9-gridded per step BEFORE the exact cumulative sum (the q232
    * discipline makes the running product order-free), and Ŝ is one
    * mirrored exp of the gridded sum. The d = n terminal step (ln 0)
    * is an explicit −10¹¹ sentinel on BOTH engines — exp drives it
    * to exactly 0 without either engine touching ln(0).
    *
    * Scale: events collapse to one row per user (min/min-when agg);
    * observations value-collapse to the duration grid (calendar-
    * bounded ≤ days), so the risk-set and product windows ride grid
    * rows, never users.
    */
  def q297(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .select(col("user_id"), col("event_type"),
        expr("us DIV 86400000000").as("day"))
    val perUser = ev.groupBy("user_id")
      .agg(min(col("day")).as("f"),
        min(when(col("event_type") === "purchase", col("day"))).as("p"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val grid = perUser.withGlobalStats(mx)
      .select(
        when(col("p").isNotNull, col("p") - col("f"))
          .otherwise(col("mxd") - col("f")).as("t"),
        when(col("p").isNotNull, 1L).otherwise(0L).as("d"))
      .groupBy("t")
      .agg(sum(col("d")).as("d_t"), count(lit(1)).as("c_t"))
    val wrev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wcum = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .withColumn("n_t", sum(col("c_t")).over(wrev))
      .filter(col("d_t") > 0)
      .withColumn("ln_e9",
        when(col("d_t") === col("n_t"), lit(-100000000000L))
          .otherwise(Similarity.intScaled(
            log(lit(1.0) -
              col("d_t").cast("double") / col("n_t").cast("double")),
            1000000000L)))
      .withColumn("cum_e9", sum(col("ln_e9")).over(wcum))
      .select(col("t").as("t_days"), col("n_t").as("n_risk"),
        col("d_t").as("d_events"),
        Similarity.intScaled(
          exp(col("cum_e9").cast("double") / lit(1000000000.0)),
          1000000L).as("surv_e6"))
      .orderBy("t_days")
  }

  /** q298 — log-rank test between two time-to-purchase cohorts (the
    * deterministic user_id % 2 A/B split — balanced at every SF, and
    * NULL-TRUE by construction, so the test's calibration itself is
    * what gets certified), on the same censored durations as [[q297]].
    * Per pooled event time: observed-minus-expected group-1 purchases
    * d₁ − n₁·d/n and the hypergeometric variance n₁n₂d(n−d)/(n²(n−1));
    * the statistic (ΣO−E)²/ΣV is the standard "are these two survival
    * curves the same" test — the inference step q297's descriptive
    * curve feeds, and exactly what an experimentation platform runs
    * over a real treatment flag instead of the hash split.
    *
    * Float discipline: risk sets and event counts are exact integers;
    * each step's O−E and V are ONE mirrored double expression each,
    * e9-gridded PER STEP before the exact sums (q232), and the
    * statistic is one mirrored arithmetic over the two gridded sums,
    * e6. Steps with n = 1 contribute zero variance via the same
    * integer guard on both engines.
    *
    * Scale: identical posture to q297 — per-user collapse, duration-
    * grid windows; the cohort flag adds one combinable min-struct.
    */
  def q298(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("day", expr("us DIV 86400000000"))
    val perUser = ev.groupBy("user_id")
      .agg(min(col("day")).as("f"),
        min(when(col("event_type") === "purchase", col("day"))).as("p"))
      .withColumn("g1", expr("user_id % 2"))
    val mx = ev.agg(max(col("day")).as("mxd"))
    val grid = perUser.withGlobalStats(mx)
      .select(
        when(col("p").isNotNull, col("p") - col("f"))
          .otherwise(col("mxd") - col("f")).as("t"),
        when(col("p").isNotNull, 1L).otherwise(0L).as("d"),
        col("g1"))
      .groupBy("t")
      .agg(sum(col("d")).as("d_t"), count(lit(1)).as("c_t"),
        sum(col("g1") * col("d")).as("d1_t"), sum(col("g1")).as("c1_t"))
    val wrev = Window.orderBy(col("t").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val n = col("n_t").cast("double")
    val n1 = col("n1_t").cast("double")
    val d = col("d_t").cast("double")
    val steps = grid
      .withColumn("n_t", sum(col("c_t")).over(wrev))
      .withColumn("n1_t", sum(col("c1_t")).over(wrev))
      .filter(col("d_t") > 0)
      .select(
        Similarity.intScaled(
          col("d1_t").cast("double") - n1 * d / n, 1000000000L).as("oe_e9"),
        when(col("n_t") > 1,
          Similarity.intScaled(
            n1 * (n - n1) * d * (n - d) / (n * n * (n - lit(1.0))),
            1000000000L)).otherwise(0L).as("v_e9"))
    val users = perUser
      .agg(sum(col("g1")).as("n_g1"), count(lit(1)).as("n_users"))
    steps
      .agg(count(lit(1)).as("n_steps"), sum(col("oe_e9")).as("oe_sum_e9"),
        sum(col("v_e9")).as("v_sum_e9"))
      .withGlobalStats(users)
      .select(col("n_users"), col("n_g1"), col("n_steps"),
        col("oe_sum_e9"), col("v_sum_e9"),
        Similarity.intScaled(
          when(col("v_sum_e9") > 0,
            (col("oe_sum_e9").cast("double") / lit(1000000000.0)) *
              (col("oe_sum_e9").cast("double") / lit(1000000000.0)) /
              (col("v_sum_e9").cast("double") / lit(1000000000.0))),
          1000000L).as("logrank_e6"))
  }

  /** q302 — Kruskal–Wallis H across sources on document length: the
    * k-sample generalization of q265's two-sample Mann–Whitney U. One
    * rank frame answers "do ANY of these feeds draw lengths from a
    * different distribution" before pairwise drill-down; the output
    * keeps the per-source rank diagnostics (who sits high/low) beside
    * the global tie-corrected H.
    *
    * All-integer core: doubled tie-averaged ranks ride the VALUE GRID
    * — r2(v) = 2·cum_below(v) + n(v) + 1 from a cumulative window over
    * distinct lengths (value-bounded, the q238 collapsed-frequency
    * posture), so no per-row global sort exists. Rank sums are exact
    * BIGINTs; each source's deviation term is ONE mirrored double
    * expression e2-gridded BEFORE the cross-source sum (q232
    * discipline), and H is one mirrored expression over those exact
    * integers plus the exact BIGINT tie term.
    *
    * Scale: docs collapse to (value) and (source × value) grids
    * map-side; the only window runs over distinct length values.
    * Source and grid frames broadcast; nothing after the first agg is
    * corpus-sized.
    */
  def q302(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = t(s, dir, "documents").select(col("source"), col("n_chars").as("v"))
    val grid = d.groupBy(col("v")).agg(count(lit(1)).as("nv"))
    val wcum = Window.orderBy("v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val r2 = grid.select(col("v"), col("nv"),
      (lit(2L) * coalesce(sum(col("nv")).over(wcum), lit(0L)) +
        col("nv") + 1L).as("r2v"))
    val sv = d.groupBy(col("source"), col("v")).agg(count(lit(1)).as("nsv"))
    val per = sv.join(r2, "v")
      .groupBy(col("source"))
      .agg(sum(col("nsv")).as("n_docs"),
        sum(col("nsv").cast(d38) * col("r2v")).cast("long").as("r2_sum"))
    val ties = grid.agg(
      sum(col("nv").cast(d38) * col("nv") * col("nv") - col("nv")).as("t"),
      sum(col("nv")).as("nn"))
    val dev = col("r2_sum").cast("double") / col("n_docs").cast("double") -
      (col("nn") + 1L).cast("double")
    val terms = per.withGlobalStats(ties)
      .select(col("source"), col("n_docs"), col("r2_sum"),
        col("nn"), col("t"),
        Similarity.intScaled(
          col("n_docs").cast("double") * dev * dev, 100L).as("term_e2"))
    val st = terms.agg(sum(col("term_e2")).as("st"))
    terms.withGlobalStats(st)
      .select(col("source"), col("n_docs"), col("r2_sum"), col("term_e2"),
        Similarity.intScaled(
          lit(3.0) * (col("st").cast("double") / lit(100.0)) /
            (col("nn").cast("double") * (col("nn") + 1L).cast("double")) /
            (lit(1.0) - col("t").cast("double") /
              (col("nn").cast(d38) * col("nn") * col("nn") - col("nn"))
                .cast("double")),
          10000L).as("h_e4"))
      .orderBy("source")
  }

  /** q303 — Brown–Forsythe variance-equality test across sources on
    * document length: one-way ANOVA F over |x − median(source)| — the
    * robust Levene variant every review board asks for before trusting
    * a pooled variance. q302 asks "same location?", this asks "same
    * SPREAD?" — two feeds can share a median while one is twice as
    * bursty, which changes packing and batching downstream.
    *
    * Exactness: per-source medians come from exact `percentile` ↔
    * `quantile_cont` interpolation, DOUBLED to an integer (med2), so
    * the deviation z = |2x − med2| is an exact BIGINT per row. Group
    * moments (Σz, Σz²) ride decimal(38); the between/within terms are
    * mirrored double expressions e2-gridded per source BEFORE their
    * exact sums; F is one mirrored expression over those integers.
    * F is invariant to the ×2 (numerator and denominator both scale
    * by 4), so doubling changes nothing but exactness.
    *
    * Scale: two corpus scans (median grid, then moments), both
    * collapsing map-side; medians ride the per-source VALUE GRID via
    * the source-keyed percentile agg; everything after is
    * source-bounded. The one-row totals broadcast (accepted global-
    * stats shape).
    */
  def q303(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val d = t(s, dir, "documents").select(col("source"), col("n_chars").as("v"))
    val med = d.groupBy(col("source"))
      .agg((percentile(col("v"), lit(0.5)) * 2).cast("long").as("med2"))
    val z = d.join(broadcast(med), "source")
      .select(col("source"), col("med2"),
        abs(lit(2L) * col("v") - col("med2")).as("z2"))
    val per = z.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), first(col("med2")).as("med2"),
        sum(col("z2")).as("sz"),
        sum(col("z2").cast(d38) * col("z2")).as("qz"))
    val tot = per.agg(sum(col("n_docs")).as("nn"), sum(col("sz")).as("s"),
      count(lit(1)).as("k"))
    val mi = col("sz").cast("double") / col("n_docs").cast("double")
    val m = col("s").cast("double") / col("nn").cast("double")
    val terms = per.withGlobalStats(tot)
      .select(col("source"), col("n_docs"), col("med2"),
        col("nn"), col("k"),
        Similarity.intScaled(mi, 10000L).as("z2_mean_e4"),
        Similarity.intScaled(
          col("n_docs").cast("double") * (mi - m) * (mi - m), 100L)
          .as("ssb_e2"),
        Similarity.intScaled(
          col("qz").cast("double") - mi * col("sz").cast("double"), 100L)
          .as("ssw_e2"))
    val sums = terms.agg(sum(col("ssb_e2")).as("ssb"),
      sum(col("ssw_e2")).as("ssw"))
    terms.withGlobalStats(sums)
      .select(col("source"), col("n_docs"), col("med2"), col("z2_mean_e4"),
        Similarity.intScaled(
          (col("nn") - col("k")).cast("double") /
            (col("k") - 1L).cast("double") *
            (col("ssb").cast("double") / col("ssw").cast("double")),
          1000000L).as("f_e6"))
      .orderBy("source")
  }

  /** q304 — Welch two-sample battery over market segments on order
    * value: for every segment pair, the unequal-variance t statistic,
    * its Welch–Satterthwaite degrees of freedom, and Cohen's d — the
    * effect-size table behind "segment A really does spend more".
    * Welch (not Student) because order-value variance differs by
    * segment, and d because at these n even trivial differences reach
    * significance — the battery reports BOTH.
    *
    * Exactness: order totals become exact cents (q204 discipline);
    * per-segment n/Σ/Σ² ride decimal(38); means are S/n doubles of
    * < 2⁵³ integers; Σ² crosses 2⁵³ so it enters as the correctly-
    * rounded decimal→double cast, IDENTICAL on both engines (the q264
    * moment pattern), and every downstream op is one mirrored
    * expression chain gridded at the end (t_e4, df_e2, d_e6).
    *
    * Scale: one orders⋈customer shuffle collapses to 5 segment rows;
    * the pair frame is k² segment-bounded and broadcast. Nothing after
    * the first agg is order-sized.
    */
  def q304(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val o = t(s, dir, "orders")
      .select(col("o_custkey"), cents(col("o_totalprice")).as("x"))
    val c = t(s, dir, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_mktsegment").as("seg"))
    val per = o.join(c, "o_custkey")
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast(d38) * col("x")).as("qx"))
    def m(p: String): Column = col(p + "s").cast("double") / col(p + "n").cast("double")
    def v(p: String): Column =
      (col(p + "q").cast("double") - m(p) * col(p + "s").cast("double")) /
        (col(p + "n") - 1L).cast("double")
    val a = per.select(col("seg").as("seg_a"), col("n").as("an"),
      col("sx").as("as"), col("qx").as("aq"))
    val b = per.select(col("seg").as("seg_b"), col("n").as("bn"),
      col("sx").as("bs"), col("qx").as("bq"))
    val se2 = v("a") / col("an").cast("double") + v("b") / col("bn").cast("double")
    val df = se2 * se2 / (
      (v("a") / col("an").cast("double")) * (v("a") / col("an").cast("double")) /
        (col("an") - 1L).cast("double") +
      (v("b") / col("bn").cast("double")) * (v("b") / col("bn").cast("double")) /
        (col("bn") - 1L).cast("double"))
    val sp2 = ((col("an") - 1L).cast("double") * v("a") +
      (col("bn") - 1L).cast("double") * v("b")) /
      (col("an") + col("bn") - 2L).cast("double")
    a.withGlobalStats(b)
      .filter(col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        col("an").as("n_a"), col("bn").as("n_b"),
        Similarity.intScaled((m("a") - m("b")) / sqrt(se2), 10000L).as("t_e4"),
        Similarity.intScaled(df, 100L).as("df_e2"),
        Similarity.intScaled((m("a") - m("b")) / sqrt(sp2), 1000000L).as("d_e6"))
      .orderBy("seg_a", "seg_b")
  }

  /** q313 — McNemar's paired test between two document quality gates:
    * gate A (length ≥ 200 chars) vs gate B (unique-word ratio ≥ ½,
    * spelled 2·n_unique ≥ n_words so no division exists). The paired
    * DIRECTIONAL complement to q272's kappa: kappa says how much two
    * judges agree, McNemar says whether their DISAGREEMENTS lean one
    * way (χ² = (b−c)²/(b+c) on the discordant cells) — the gate-
    * replacement decision ("B passes docs A fails more than vice
    * versa") that agreement scores cannot make.
    *
    * All-integer contingency; χ² is ONE mirrored division of exact
    * integers e6-gridded, NULL-guarded on b+c=0 (no discordance → no
    * test). One scan, map-side flags, one 4-cell agg.
    */
  def q313(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val flags = t(s, dir, "documents")
      .select(
        (col("n_chars") >= 200L).cast("long").as("a"),
        (lit(2L) * size(array_distinct(split(col("text"), " "))).cast("long")
          >= size(split(col("text"), " ")).cast("long")).cast("long").as("b"))
    flags.agg(
        sum(col("a") * col("b")).as("n_both"),
        sum(col("a") * (lit(1L) - col("b"))).as("n_only_a"),
        sum((lit(1L) - col("a")) * col("b")).as("n_only_b"),
        sum((lit(1L) - col("a")) * (lit(1L) - col("b"))).as("n_neither"))
      .select(col("n_both"), col("n_only_a"), col("n_only_b"), col("n_neither"),
        when(col("n_only_a") + col("n_only_b") > 0L,
          Similarity.intScaled(
            ((col("n_only_a") - col("n_only_b")).cast(d38) *
              (col("n_only_a") - col("n_only_b"))).cast("double") /
              (col("n_only_a") + col("n_only_b")).cast("double"),
            1000000L)).as("chi2_e6"))
  }

  /** q326 — Gumbel (extreme-value) method-of-moments fit of DAILY
    * MAXIMUM order value: location μ = m − γ·β, scale β = s·√6/π over
    * the per-day max-cents series. The risk lens the mean-based
    * dashboards miss — "how big is a 1-in-N-days order" is an
    * extreme-value question (Fisher–Tippett puts daily maxima in the
    * Gumbel domain), and the fitted (μ, β) answers it via the quantile
    * μ − β·ln(−ln p). Completes the tail shelf: q280's Hill index
    * measures the raw tail's heaviness, q294 fits the body, this
    * models the MAXIMA process.
    *
    * Exactness: daily maxima are exact integer cents (max of exact
    * values); moments ride decimal(38); β and μ are one mirrored
    * double chain — π and the Euler–Mascheroni γ enter as the
    * IDENTICAL decimal literals on both engines (spelled out, not
    * pi(): a literal is the same IEEE double everywhere by
    * construction, the q66-threshold constant discipline).
    *
    * Scale: orders collapse map-side to the day grid; the moment agg
    * rides calendar-bounded rows.
    */
  def q326(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val daily = t(s, dir, "orders")
      .select(
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("day"),
        cents(col("o_totalprice")).as("c"))
      .groupBy(col("day")).agg(max(col("c")).as("mx"))
    val mom = daily.agg(count(lit(1)).as("n"), sum(col("mx")).as("sx"),
      sum(col("mx").cast(d38) * col("mx")).as("qx"))
    val m = col("sx").cast("double") / col("n").cast("double")
    val v = (col("qx").cast("double") - m * col("sx").cast("double")) /
      (col("n") - 1L).cast("double")
    val beta = sqrt(v * lit(6.0)) / lit(3.141592653589793)
    mom.select(col("n").as("n_days"),
      Similarity.intScaled(m, 100L).as("mean_max_e2"),
      when(col("n") > 1L, Similarity.intScaled(beta, 100L)).as("beta_e2"),
      when(col("n") > 1L,
        Similarity.intScaled(m - lit(0.5772156649015329) * beta, 100L))
        .as("mu_e2"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q326_gumbel_daily_max" -> (q326 _),
    "q313_mcnemar" -> (q313 _),
    "q302_kruskal_wallis" -> (q302 _),
    "q303_brown_forsythe" -> (q303 _),
    "q304_welch_battery"  -> (q304 _),
    "q246_seasonal_error" -> (q246 _),
    "q280_hill_tail"      -> (q280 _),
    "q297_kaplan_meier"   -> (q297 _),
    "q298_logrank"        -> (q298 _),
    "q250_iqr_outliers"   -> (q250 _),
    "q251_cusum_shift"    -> (q251 _),
    "q238_winsorized"   -> (q238 _),
    "q239_state_merge"  -> (q239 _),
    "q242_hist_quantiles" -> (q242 _),
    "q243_ewma_spike"   -> (q243 _),
    "q262_stl_seasonal" -> (q262 _),
    "q264_spearman"     -> (q264 _),
    "q265_mann_whitney" -> (q265 _))

  private val ewmaCoefSqlValues: String =
    ewmaCoefs.zipWithIndex.map { case (c, k) => s"($k, $c)" }.mkString(", ")

  val oracleSql: Map[String, String] = Map(
    // Same exact daily max cents, HUGEINT moments, mirrored β/μ chain
    // with π and γ as identical decimal literals on both engines.
    "q326_gumbel_daily_max" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS mx
        |  FROM orders GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(mx) AS BIGINT) AS sx,
        |         SUM(CAST(mx AS HUGEINT) * mx) AS qx
        |  FROM daily)
        |SELECT n AS n_days,
        |  CAST(ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * 100)
        |       AS BIGINT) AS mean_max_e2,
        |  CASE WHEN n > 1 THEN
        |    CAST(ROUND(SQRT(((CAST(qx AS DOUBLE)
        |      - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
        |      / CAST(n - 1 AS DOUBLE)) * 6.0) / 3.141592653589793
        |    * 100) AS BIGINT) END AS beta_e2,
        |  CASE WHEN n > 1 THEN
        |    CAST(ROUND((CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |    - 0.5772156649015329 *
        |      (SQRT(((CAST(qx AS DOUBLE)
        |         - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)
        |           * CAST(sx AS DOUBLE))
        |         / CAST(n - 1 AS DOUBLE)) * 6.0) / 3.141592653589793))
        |    * 100) AS BIGINT) END AS mu_e2
        |FROM m""".stripMargin,
    // Same all-integer gate flags and 4-cell contingency, one
    // mirrored (b−c)²/(b+c) division e6, NULL on zero discordance.
    "q313_mcnemar" ->
      """WITH f AS (
        |  SELECT CASE WHEN n_chars >= 200 THEN 1 ELSE 0 END AS a,
        |         CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
        |                   >= len(string_split(text, ' '))
        |              THEN 1 ELSE 0 END AS b
        |  FROM documents),
        |g AS (
        |  SELECT CAST(SUM(a * b) AS BIGINT) AS n_both,
        |         CAST(SUM(a * (1 - b)) AS BIGINT) AS n_only_a,
        |         CAST(SUM((1 - a) * b) AS BIGINT) AS n_only_b,
        |         CAST(SUM((1 - a) * (1 - b)) AS BIGINT) AS n_neither
        |  FROM f)
        |SELECT n_both, n_only_a, n_only_b, n_neither,
        |       CASE WHEN n_only_a + n_only_b > 0 THEN
        |         CAST(ROUND(
        |           CAST(CAST(n_only_a - n_only_b AS HUGEINT)
        |                * (n_only_a - n_only_b) AS DOUBLE)
        |           / CAST(n_only_a + n_only_b AS DOUBLE)
        |           * 1000000) AS BIGINT) END AS chi2_e6
        |FROM g""".stripMargin,
    // Same value-grid doubled ranks (2·cum_below + n(v) + 1), exact
    // BIGINT rank sums, per-source mirrored deviation term e6-gridded
    // before the exact sum, one mirrored H expression at the end.
    "q302_kruskal_wallis" ->
      """WITH d AS (SELECT source, n_chars AS v FROM documents),
        |grid AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS nv FROM d GROUP BY v),
        |r2 AS (
        |  SELECT v, nv,
        |         2 * COALESCE(SUM(nv) OVER (ORDER BY v
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |           + nv + 1 AS r2v
        |  FROM grid),
        |sv AS (SELECT source, v, CAST(COUNT(*) AS BIGINT) AS nsv
        |       FROM d GROUP BY 1, 2),
        |per AS (
        |  SELECT source, CAST(SUM(nsv) AS BIGINT) AS n_docs,
        |         CAST(SUM(CAST(nsv AS HUGEINT) * r2v) AS BIGINT) AS r2_sum
        |  FROM sv JOIN r2 USING (v) GROUP BY source),
        |ties AS (
        |  SELECT SUM(CAST(nv AS HUGEINT) * nv * nv - nv) AS t,
        |         CAST(SUM(nv) AS BIGINT) AS nn
        |  FROM grid),
        |terms AS (
        |  SELECT source, n_docs, r2_sum, nn, t,
        |         CAST(ROUND(CAST(n_docs AS DOUBLE) *
        |           (CAST(r2_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             - CAST(nn + 1 AS DOUBLE)) *
        |           (CAST(r2_sum AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             - CAST(nn + 1 AS DOUBLE))
        |           * 100) AS BIGINT) AS term_e2
        |  FROM per CROSS JOIN ties),
        |st AS (SELECT CAST(SUM(term_e2) AS BIGINT) AS st FROM terms)
        |SELECT source, n_docs, r2_sum, term_e2,
        |       CAST(ROUND(3.0 * (CAST(st AS DOUBLE) / 100.0)
        |         / (CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE))
        |         / (1.0 - CAST(t AS DOUBLE)
        |            / CAST(CAST(nn AS HUGEINT) * nn * nn - nn AS DOUBLE))
        |         * 10000) AS BIGINT) AS h_e4
        |FROM terms CROSS JOIN st
        |ORDER BY source""".stripMargin,
    // Same doubled exact medians, exact BIGINT |2x − med2| deviations,
    // decimal moments, per-source mirrored SSB/SSW terms e2-gridded
    // before their exact sums, one mirrored F expression.
    "q303_brown_forsythe" ->
      """WITH d AS (SELECT source, n_chars AS v FROM documents),
        |med AS (
        |  SELECT source, CAST(quantile_cont(v, 0.5) * 2 AS BIGINT) AS med2
        |  FROM d GROUP BY source),
        |z AS (
        |  SELECT d.source, med2, ABS(2 * v - med2) AS z2
        |  FROM d JOIN med ON d.source = med.source),
        |per AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         ANY_VALUE(med2) AS med2,
        |         CAST(SUM(z2) AS BIGINT) AS sz,
        |         SUM(CAST(z2 AS HUGEINT) * z2) AS qz
        |  FROM z GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_docs) AS BIGINT) AS nn,
        |               CAST(SUM(sz) AS BIGINT) AS s,
        |               CAST(COUNT(*) AS BIGINT) AS k
        |        FROM per),
        |terms AS (
        |  SELECT source, n_docs, med2, nn, k,
        |         CAST(ROUND(CAST(sz AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |           * 10000) AS BIGINT) AS z2_mean_e4,
        |         CAST(ROUND(CAST(n_docs AS DOUBLE) *
        |           (CAST(sz AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             - CAST(s AS DOUBLE) / CAST(nn AS DOUBLE)) *
        |           (CAST(sz AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             - CAST(s AS DOUBLE) / CAST(nn AS DOUBLE))
        |           * 100) AS BIGINT) AS ssb_e2,
        |         CAST(ROUND((CAST(qz AS DOUBLE)
        |           - CAST(sz AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |             * CAST(sz AS DOUBLE))
        |           * 100) AS BIGINT) AS ssw_e2
        |  FROM per CROSS JOIN tot),
        |sums AS (SELECT CAST(SUM(ssb_e2) AS BIGINT) AS ssb,
        |                CAST(SUM(ssw_e2) AS BIGINT) AS ssw
        |         FROM terms)
        |SELECT source, n_docs, med2, z2_mean_e4,
        |       CAST(ROUND(CAST(nn - k AS DOUBLE) / CAST(k - 1 AS DOUBLE)
        |         * (CAST(ssb AS DOUBLE) / CAST(ssw AS DOUBLE))
        |         * 1000000) AS BIGINT) AS f_e6
        |FROM terms CROSS JOIN sums
        |ORDER BY source""".stripMargin,
    // Same exact-cents moments per segment, mirrored m/v doubles (the
    // decimal→double Σ² cast is correctly rounded on both engines),
    // mirrored t / Welch df / Cohen's d expressions gridded once.
    "q304_welch_battery" ->
      """WITH o AS (
        |  SELECT o_custkey,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS x
        |  FROM orders),
        |j AS (SELECT c_mktsegment AS seg, x
        |      FROM o JOIN customer ON c_custkey = o_custkey),
        |per AS (
        |  SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS s,
        |         SUM(CAST(x AS HUGEINT) * x) AS q
        |  FROM j GROUP BY seg),
        |stats AS (
        |  SELECT seg, n,
        |         CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS m,
        |         (CAST(q AS DOUBLE)
        |           - CAST(s AS DOUBLE) / CAST(n AS DOUBLE) * CAST(s AS DOUBLE))
        |           / CAST(n - 1 AS DOUBLE) AS v
        |  FROM per)
        |SELECT a.seg AS seg_a, b.seg AS seg_b,
        |       a.n AS n_a, b.n AS n_b,
        |       CAST(ROUND((a.m - b.m)
        |         / SQRT(a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE))
        |         * 10000) AS BIGINT) AS t_e4,
        |       CAST(ROUND(
        |         (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE)) *
        |         (a.v / CAST(a.n AS DOUBLE) + b.v / CAST(b.n AS DOUBLE))
        |         / ((a.v / CAST(a.n AS DOUBLE)) * (a.v / CAST(a.n AS DOUBLE))
        |              / CAST(a.n - 1 AS DOUBLE)
        |            + (b.v / CAST(b.n AS DOUBLE)) * (b.v / CAST(b.n AS DOUBLE))
        |              / CAST(b.n - 1 AS DOUBLE))
        |         * 100) AS BIGINT) AS df_e2,
        |       CAST(ROUND((a.m - b.m)
        |         / SQRT((CAST(a.n - 1 AS DOUBLE) * a.v
        |                 + CAST(b.n - 1 AS DOUBLE) * b.v)
        |                / CAST(a.n + b.n - 2 AS DOUBLE))
        |         * 1000000) AS BIGINT) AS d_e6
        |FROM stats a JOIN stats b ON a.seg < b.seg
        |ORDER BY seg_a, seg_b""".stripMargin,
    // Same deterministic user_id % 2 cohorts, duration grid, per-step
    // mirrored O−E and V doubles e9-gridded before exact sums,
    // mirrored statistic, NULL on zero variance.
    "q298_logrank" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |u AS (
        |  SELECT user_id, MIN(day) AS f,
        |         MIN(CASE WHEN event_type = 'purchase' THEN day END) AS p,
        |         user_id % 2 AS g1
        |  FROM e GROUP BY user_id),
        |m AS (SELECT MAX(day) AS mxd FROM e),
        |obs AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE mxd - f END AS t,
        |         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS d,
        |         g1
        |  FROM u CROSS JOIN m),
        |g AS (
        |  SELECT t, CAST(SUM(d) AS BIGINT) AS d_t,
        |         CAST(COUNT(*) AS BIGINT) AS c_t,
        |         CAST(SUM(g1 * d) AS BIGINT) AS d1_t,
        |         CAST(SUM(g1) AS BIGINT) AS c1_t
        |  FROM obs GROUP BY t),
        |r AS (
        |  SELECT t, d_t, d1_t,
        |         CAST(SUM(c_t) OVER (ORDER BY t DESC
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS n_t,
        |         CAST(SUM(c1_t) OVER (ORDER BY t DESC
        |                              ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS n1_t
        |  FROM g),
        |s AS (
        |  SELECT CAST(ROUND((CAST(d1_t AS DOUBLE)
        |                     - CAST(n1_t AS DOUBLE) * CAST(d_t AS DOUBLE)
        |                       / CAST(n_t AS DOUBLE)) * 1000000000)
        |              AS BIGINT) AS oe_e9,
        |         CASE WHEN n_t > 1 THEN
        |           CAST(ROUND(CAST(n1_t AS DOUBLE)
        |                      * (CAST(n_t AS DOUBLE) - CAST(n1_t AS DOUBLE))
        |                      * CAST(d_t AS DOUBLE)
        |                      * (CAST(n_t AS DOUBLE) - CAST(d_t AS DOUBLE))
        |                      / (CAST(n_t AS DOUBLE) * CAST(n_t AS DOUBLE)
        |                         * (CAST(n_t AS DOUBLE) - 1.0))
        |                      * 1000000000) AS BIGINT)
        |           ELSE 0 END AS v_e9
        |  FROM r WHERE d_t > 0),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_steps,
        |         CAST(SUM(oe_e9) AS BIGINT) AS oe_sum_e9,
        |         CAST(SUM(v_e9) AS BIGINT) AS v_sum_e9
        |  FROM s),
        |users AS (
        |  SELECT CAST(SUM(g1) AS BIGINT) AS n_g1,
        |         CAST(COUNT(*) AS BIGINT) AS n_users
        |  FROM u)
        |SELECT n_users, n_g1, n_steps, oe_sum_e9, v_sum_e9,
        |       CASE WHEN v_sum_e9 <= 0 THEN NULL
        |            ELSE CAST(ROUND((CAST(oe_sum_e9 AS DOUBLE) / 1000000000.0)
        |                  * (CAST(oe_sum_e9 AS DOUBLE) / 1000000000.0)
        |                  / (CAST(v_sum_e9 AS DOUBLE) / 1000000000.0)
        |                  * 1000000) AS BIGINT) END AS logrank_e6
        |FROM agg CROSS JOIN users""".stripMargin,
    // Same per-user min/min-when collapse, duration grid, reverse-
    // cumulative risk sets, per-step mirrored ln e9 (d=n → the same
    // −10¹¹ sentinel), exact cumsum, mirrored exp.
    "q297_kaplan_meier" ->
      """WITH e AS (
        |  SELECT user_id, event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |u AS (
        |  SELECT user_id, MIN(day) AS f,
        |         MIN(CASE WHEN event_type = 'purchase' THEN day END) AS p
        |  FROM e GROUP BY user_id),
        |m AS (SELECT MAX(day) AS mxd FROM e),
        |obs AS (
        |  SELECT CASE WHEN p IS NOT NULL THEN p - f ELSE mxd - f END AS t,
        |         CASE WHEN p IS NOT NULL THEN 1 ELSE 0 END AS d
        |  FROM u CROSS JOIN m),
        |g AS (
        |  SELECT t, CAST(SUM(d) AS BIGINT) AS d_t,
        |         CAST(COUNT(*) AS BIGINT) AS c_t
        |  FROM obs GROUP BY t),
        |r AS (
        |  SELECT t, d_t, c_t,
        |         CAST(SUM(c_t) OVER (ORDER BY t DESC
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS n_t
        |  FROM g),
        |s AS (
        |  SELECT t, n_t, d_t,
        |         CASE WHEN d_t = n_t THEN -100000000000
        |              ELSE CAST(ROUND(ln(1.0 - CAST(d_t AS DOUBLE)
        |                                        / CAST(n_t AS DOUBLE))
        |                              * 1000000000) AS BIGINT) END AS ln_e9
        |  FROM r WHERE d_t > 0),
        |c AS (
        |  SELECT t, n_t, d_t,
        |         CAST(SUM(ln_e9) OVER (ORDER BY t
        |                               ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |           AS cum_e9
        |  FROM s)
        |SELECT t AS t_days, n_t AS n_risk, d_t AS d_events,
        |       CAST(ROUND(exp(CAST(cum_e9 AS DOUBLE) / 1000000000.0)
        |                  * 1000000) AS BIGINT) AS surv_e6
        |FROM c ORDER BY t_days""".stripMargin,
    // Same all-integer top-51 order statistics, per-term mirrored ln
    // e9-gridded before the exact sum, one mirrored mean division.
    "q280_hill_tail" ->
      """WITH top AS (
        |  SELECT n_chars, doc_id FROM documents
        |  ORDER BY n_chars DESC, doc_id LIMIT 51),
        |r AS (
        |  SELECT n_chars,
        |         ROW_NUMBER() OVER (ORDER BY n_chars DESC, doc_id) AS rk
        |  FROM top),
        |x AS (SELECT n_chars AS xk1 FROM r WHERE rk = 51),
        |t AS (
        |  SELECT xk1,
        |         CAST(ROUND(ln(CAST(n_chars AS DOUBLE) / CAST(xk1 AS DOUBLE))
        |                    * 1000000000) AS BIGINT) AS term_e9
        |  FROM r CROSS JOIN x WHERE rk <= 50)
        |SELECT CAST(COUNT(*) AS BIGINT) AS k, xk1,
        |       CAST(SUM(term_e9) AS BIGINT) AS hill_sum_e9,
        |       CAST(ROUND(CAST(SUM(term_e9) AS DOUBLE) / 1000000000.0
        |                  / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS mean_log_excess_e6
        |FROM t GROUP BY xk1""".stripMargin,
    // Same dense grid, same cleared-denominator increments, same
    // running-minimum closed form; all integer.
    "q251_cusum_shift" ->
      """WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        |  FROM daily GROUP BY 1),
        |griddays AS (
        |  SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM span),
        |grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM griddays g
        |  LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day),
        |tot AS (
        |  SELECT event_type, CAST(SUM(x) AS BIGINT) AS sx,
        |         CAST(COUNT(*) AS BIGINT) AS nd
        |  FROM grid GROUP BY 1),
        |pr AS (
        |  SELECT g.event_type, g.day, t.sx, t.nd,
        |         SUM(g.x * t.nd - t.sx)
        |           OVER (PARTITION BY g.event_type ORDER BY g.day
        |                 ROWS UNBOUNDED PRECEDING) AS p
        |  FROM grid g JOIN tot t USING (event_type)),
        |s AS (
        |  SELECT event_type, day, sx, nd,
        |         p - LEAST(0, MIN(p) OVER (PARTITION BY event_type
        |                                   ORDER BY day
        |                                   ROWS UNBOUNDED PRECEDING)) AS s
        |  FROM pr),
        |s2 AS (
        |  SELECT *, MAX(s) OVER (PARTITION BY event_type) AS ms FROM s)
        |SELECT event_type, CAST(MAX(nd) AS BIGINT) AS n_days,
        |       CAST(MAX(sx) AS BIGINT) AS n_events,
        |       CAST(MAX(ms) AS BIGINT) AS max_s,
        |       CAST(MIN(CASE WHEN s = ms THEN day END) AS BIGINT) AS peak_day,
        |       CAST(SUM(CASE WHEN CAST(s AS HUGEINT) * s >
        |                          CAST(sx AS HUGEINT) * nd * 16
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_alarm_days
        |FROM s2 GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    // Same rank-span arithmetic and half-unit integer fences.
    "q250_iqr_outliers" ->
      """WITH vals AS (
        |  SELECT source, n_chars AS c, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |spans AS (
        |  SELECT source, c, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY c
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM vals),
        |sp AS (
        |  SELECT source, c, cnt, cum, cum - cnt AS prev,
        |         SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM spans),
        |sp2 AS (
        |  SELECT *, (n + 3) // 4 AS q1r, (3 * n + 3) // 4 AS q3r FROM sp),
        |limits AS (
        |  SELECT source,
        |         MIN(CASE WHEN cum >= q1r AND prev < q1r THEN c END) AS q1c,
        |         MIN(CASE WHEN cum >= q3r AND prev < q3r THEN c END) AS q3c
        |  FROM sp2 GROUP BY source)
        |SELECT sp2.source, CAST(MAX(n) AS BIGINT) AS n_docs,
        |       CAST(MAX(q1c) AS BIGINT) AS q1_chars,
        |       CAST(MAX(q3c) AS BIGINT) AS q3_chars,
        |       CAST(SUM(CASE WHEN c * 2 < q1c * 2 - (q3c - q1c) * 3
        |                     THEN cnt ELSE 0 END) AS BIGINT) AS n_lo,
        |       CAST(SUM(CASE WHEN c * 2 > q3c * 2 + (q3c - q1c) * 3
        |                     THEN cnt ELSE 0 END) AS BIGINT) AS n_hi
        |FROM sp2 JOIN limits ON sp2.source = limits.source
        |GROUP BY sp2.source ORDER BY sp2.source""".stripMargin,
    // Same dense day grid, same lag frame, same mirrored s7*1e4/s1
    // double expression; NULL mase where a month's naive error is 0.
    // Spearman mirrored: identical doubled-rank integers (rank() +
    // tie-count windows), HUGEINT moments, ONE sqrt+division e6.
    "q264_spearman" ->
      """WITH d AS (
        |  SELECT source, n_chars AS x,
        |         CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
        |           AS y
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |    2 * RANK() OVER (PARTITION BY source ORDER BY x)
        |      + COUNT(*) OVER (PARTITION BY source, x) - 1 AS rx,
        |    2 * RANK() OVER (PARTITION BY source ORDER BY y)
        |      + COUNT(*) OVER (PARTITION BY source, y) - 1 AS ry
        |  FROM d),
        |m AS (
        |  SELECT source, CAST(COUNT(*) AS HUGEINT) AS n,
        |         CAST(SUM(rx) AS HUGEINT) AS sx,
        |         CAST(SUM(ry) AS HUGEINT) AS sy,
        |         CAST(SUM(CAST(rx AS HUGEINT) * rx) AS HUGEINT) AS sxx,
        |         CAST(SUM(CAST(ry AS HUGEINT) * ry) AS HUGEINT) AS syy,
        |         CAST(SUM(CAST(rx AS HUGEINT) * ry) AS HUGEINT) AS sxy
        |  FROM r GROUP BY source)
        |SELECT source, CAST(n AS BIGINT) AS n_docs,
        |  CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |    CAST(ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
        |               / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
        |                      * CAST(n * syy - sy * sy AS DOUBLE))
        |               * 1000000) AS BIGINT) END AS rho_e6
        |FROM m ORDER BY source""".stripMargin,
    // Mann-Whitney mirrored: doubled combined ranks, exact U2/dev2,
    // the tie-corrected z as one sqrt of a HUGEINT rational.
    "q265_mann_whitney" ->
      """WITH d AS (
        |  SELECT source, n_chars AS x FROM documents
        |  WHERE source IN ('src0', 'src1')),
        |r AS (
        |  SELECT source, x,
        |    2 * RANK() OVER (ORDER BY x)
        |      + COUNT(*) OVER (PARTITION BY x) - 1 AS rx
        |  FROM d),
        |ties AS (
        |  SELECT CAST(COALESCE(SUM(CAST(tc AS HUGEINT) * tc * tc - tc), 0)
        |              AS HUGEINT) AS t
        |  FROM (SELECT COUNT(*) AS tc FROM r GROUP BY x)),
        |base AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(rx) AS BIGINT) AS sr
        |  FROM r GROUP BY source),
        |wide AS (
        |  SELECT a.n AS n1, a.sr AS sr1, b.n AS n2, t.t
        |  FROM base a, base b, ties t
        |  WHERE a.source = 'src0' AND b.source = 'src1'),
        |f AS (
        |  SELECT n1, n2, CAST(t AS BIGINT) AS t_ties,
        |         sr1 - n1 * (n1 + 1) AS u2,
        |         sr1 - n1 * (n1 + 1) - n1 * n2 AS dev2,
        |         n1 + n2 AS nn
        |  FROM wide)
        |SELECT n1, n2, u2, dev2, t_ties,
        |  CAST(ROUND(SIGN(CAST(dev2 AS DOUBLE)) * sqrt(
        |    CAST(3 * CAST(dev2 AS HUGEINT) * dev2 * nn * (nn - 1) AS DOUBLE)
        |    / CAST(CAST(n1 AS HUGEINT) * n2
        |           * (CAST(nn AS HUGEINT) * nn * nn - nn - t_ties)
        |           AS DOUBLE)) * 10000) AS BIGINT) AS z_e4
        |FROM f""".stripMargin,
    // Same dense grid; the ±3 centered window with the /7 cleared to
    // sevenths-of-a-cent; one mirrored double division at the end.
    "q262_stl_seasonal" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS r
        |  FROM orders GROUP BY 1),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT gs.day, COALESCE(daily.r, 0) AS r
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day FROM b) gs
        |  LEFT JOIN daily USING (day)),
        |ma AS (
        |  SELECT day, r,
        |         SUM(r) OVER (ORDER BY day
        |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
        |         COUNT(*) OVER (ORDER BY day
        |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw
        |  FROM grid),
        |d AS (
        |  SELECT (day + 4) % 7 AS dow, 7 * r - s7 AS detr7
        |  FROM ma WHERE nw = 7)
        |SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(detr7) AS BIGINT) AS sum_detr7,
        |       CAST(SUM(CASE WHEN detr7 > 0 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS pos_days,
        |       CAST(MIN(detr7) AS BIGINT) AS min_detr7,
        |       CAST(MAX(detr7) AS BIGINT) AS max_detr7,
        |       CAST(ROUND(CAST(SUM(detr7) AS DOUBLE)
        |                  / (7.0 * COUNT(*)) * 100) AS BIGINT) AS seasonal_e2
        |FROM d GROUP BY dow
        |ORDER BY dow""".stripMargin,
    "q246_seasonal_error" ->
      """WITH daily AS (
        |  SELECT CAST(date_diff('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS r
        |  FROM orders GROUP BY 1),
        |b AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT gs.day, COALESCE(daily.r, 0) AS r
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day FROM b) gs
        |  LEFT JOIN daily USING (day)),
        |lagged AS (
        |  SELECT day, r,
        |         LAG(r, 1) OVER (ORDER BY day) AS l1,
        |         LAG(r, 7) OVER (ORDER BY day) AS l7
        |  FROM grid),
        |m AS (
        |  SELECT strftime(DATE '1970-01-01' + CAST(day AS INTEGER), '%Y-%m')
        |           AS month,
        |         ABS(r - l1) AS e1, ABS(r - l7) AS e7
        |  FROM lagged WHERE l7 IS NOT NULL)
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_days,
        |       CAST(SUM(e1) // COUNT(*) AS BIGINT) AS mae1_c,
        |       CAST(SUM(e7) // COUNT(*) AS BIGINT) AS mae7_c,
        |       CASE WHEN SUM(e1) > 0
        |            THEN CAST(ROUND(CAST(SUM(e7) AS DOUBLE) * 10000.0 /
        |                            CAST(SUM(e1) AS DOUBLE)) AS BIGINT)
        |       END AS mase_e4
        |FROM m GROUP BY month
        |ORDER BY month""".stripMargin,
    // Same value-collapsed rank-span arithmetic; all-integer output.
    "q238_winsorized" ->
      """WITH vals AS (
        |  SELECT l_returnflag AS flag,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c,
        |         COUNT(*) AS cnt
        |  FROM lineitem GROUP BY 1, 2),
        |spans AS (
        |  SELECT flag, c, cnt,
        |         SUM(cnt) OVER (PARTITION BY flag ORDER BY c
        |                        ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM vals),
        |sp AS (
        |  SELECT flag, c, cnt, cum, cum - cnt AS prev,
        |         SUM(cnt) OVER (PARTITION BY flag) AS n,
        |         SUM(c * cnt) OVER (PARTITION BY flag) AS s
        |  FROM spans),
        |sp2 AS (
        |  SELECT *, (n + 9) // 10 AS lo_rank, (9 * n + 9) // 10 AS hi_rank,
        |         n // 10 AS g
        |  FROM sp),
        |limits AS (
        |  SELECT flag,
        |         MIN(CASE WHEN cum >= lo_rank AND prev < lo_rank THEN c END) AS lo_c,
        |         MIN(CASE WHEN cum >= hi_rank AND prev < hi_rank THEN c END) AS hi_c
        |  FROM sp2 GROUP BY flag)
        |SELECT sp2.flag, CAST(MAX(n) AS BIGINT) AS n,
        |       CAST(MAX(lo_c) AS BIGINT) AS lo_c, CAST(MAX(hi_c) AS BIGINT) AS hi_c,
        |       CAST(MAX(s) // MAX(n) AS BIGINT) AS mean_fc,
        |       CAST(SUM(GREATEST(LEAST(c, hi_c), lo_c) * cnt) // MAX(n) AS BIGINT)
        |         AS wins_mean_fc,
        |       CAST(SUM(c * GREATEST(LEAST(cum, n - g) - GREATEST(prev, g), 0))
        |              // MAX(n - 2 * g) AS BIGINT) AS trim_mean_fc
        |FROM sp2 JOIN limits ON sp2.flag = limits.flag
        |GROUP BY sp2.flag ORDER BY sp2.flag""".stripMargin,
    // Two-era partial states merged must equal this one-pass recompute;
    // n_parts recomputed as the count of eras present per month.
    "q239_state_merge" ->
      """SELECT CAST(date_trunc('month', CAST(o_orderdate AS TIMESTAMP)) AS DATE)
        |         AS month,
        |       CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            AS BIGINT) AS sum_cents,
        |       CAST(MIN(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            AS BIGINT) AS min_c,
        |       CAST(MAX(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT))
        |            AS BIGINT) AS max_c,
        |       CAST(COUNT(DISTINCT CASE WHEN o_orderdate <
        |                                     TIMESTAMP '1997-06-15 00:00:00'
        |                                THEN 0 ELSE 1 END) AS BIGINT) AS n_parts
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    // Same bin/cum/target arithmetic; one IEEE division per estimate.
    "q242_hist_quantiles" ->
      """WITH h AS (
        |  SELECT source, LEAST(n_chars // 100, 99) AS bin, COUNT(*) AS cnt
        |  FROM documents GROUP BY 1, 2),
        |spans AS (
        |  SELECT source, bin, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY bin
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(cnt) OVER (PARTITION BY source) AS n
        |  FROM h),
        |sp AS (SELECT *, cum - cnt AS prev FROM spans),
        |est AS (
        |  SELECT source, p, n,
        |         CAST(ROUND((bin * 100 +
        |             ((p * n + 99) // 100 - prev) * 100.0 / cnt) * 100)
        |           AS BIGINT) AS est_e2
        |  FROM sp CROSS JOIN (VALUES (50), (90), (99)) AS pp(p)
        |  WHERE cum >= (p * n + 99) // 100 AND prev < (p * n + 99) // 100)
        |SELECT source, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n, est_e2
        |FROM est ORDER BY source, p""".stripMargin,
    // Same integer coefficients, HUGEINT sums, one IEEE division.
    "q243_ewma_spike" ->
      s"""WITH daily AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day,
        |         COUNT(*) AS x
        |  FROM events GROUP BY 1, 2),
        |span AS (
        |  SELECT event_type, MIN(day) AS d0, MAX(day) AS d1
        |  FROM daily GROUP BY 1),
        |griddays AS (
        |  SELECT event_type, UNNEST(generate_series(d0, d1)) AS day FROM span),
        |grid AS (
        |  SELECT g.event_type, g.day, COALESCE(d.x, 0) AS x
        |  FROM griddays g
        |  LEFT JOIN daily d ON d.event_type = g.event_type AND d.day = g.day),
        |coefs AS (SELECT * FROM (VALUES $ewmaCoefSqlValues) AS c(k, coef)),
        |lagged AS (
        |  SELECT g.event_type, g.day, g.x,
        |         CAST(src.x AS HUGEINT) * c.coef AS term,
        |         CAST(c.coef AS HUGEINT) AS coef
        |  FROM grid g CROSS JOIN coefs c
        |  JOIN grid src ON src.event_type = g.event_type
        |               AND src.day = g.day - c.k)
        |SELECT event_type, CAST(day AS BIGINT) AS day, CAST(MAX(x) AS BIGINT) AS n,
        |       CAST(ROUND(CAST(SUM(term) AS DOUBLE) /
        |                  CAST(SUM(coef) AS DOUBLE) * 10000) AS BIGINT) AS ewma_e4,
        |       CAST(CASE WHEN CAST(MAX(x) AS HUGEINT) * SUM(coef) > 2 * SUM(term)
        |                 THEN 1 ELSE 0 END AS INT) AS spike
        |FROM lagged GROUP BY event_type, day
        |ORDER BY event_type, day""".stripMargin)
}
