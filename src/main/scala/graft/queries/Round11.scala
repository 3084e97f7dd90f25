package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled
import graft.ops.GlobalStats

/** Round-11 analytics batch: regime/structure diagnostics the
  * q331-q347 shelf implies but never states — WHERE a trend breaks
  * (Chow-style structural split), WHETHER event order carries signal
  * (sequential-pattern support), HOW sensitive sessionization is to
  * its one free parameter (threshold curve), whether an ordered dose
  * drives a response (Cochran-Armitage), and how much a ranking
  * actually moved period-over-period (rank-biased overlap). Same
  * float discipline as q331+: exact integer/decimal(38) moments up to
  * ONE mirrored double chain per output cell, DuckDB oracle spelling
  * the identical arithmetic, Round11Spec replaying each driver-side.
  */
object Round11 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(dollars: Column): Column =
    (dollars.cast("decimal(18,2)") * 100).cast("long")

  private val d38 = "decimal(38,0)"

  /** Zero-filled daily order-count grid (t = 0..n-1, x = orders that
    * day) — the q334/q341/q343/q347 series, shared.
    */
  private def dailyGrid(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"), explode(sequence(lit(0L), col("d1") - col("d0")))
        .as("t"))
      .join(daily.withColumnRenamed("day", "dd"),
        col("dd") === col("d0") + col("t"), "left")
      .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
  }

  /** q348 — structural-break (Chow-style) scan of the daily
    * order-count trend: for every candidate split of the zero-filled
    * day grid (≥ 8 days each side), the F statistic comparing one OLS
    * line over the whole series against separate lines per side, and
    * the top-5 splits by F. THE "when did the regime change" answer —
    * q270's CUSUM finds a LEVEL shift, q251 flags drift; this locates
    * a TREND break and hands back the before/after slopes a capacity
    * planner actually plugs in.
    *
    * Float discipline: per segment, RSS = (Dxx·Dtt − Dtx²)/(m·Dtt)
    * where Dxx = m·Σx²−(Σx)², Dtt = m·Σt²−(Σt)², Dtx = m·Σtx−Σt·Σx
    * are EXACT decimal(38) integers (Σt/Σt² by closed form, Σx/Σx²/Σtx
    * by prefix sums); the Cauchy-Schwarz numerator is exactly ≥ 0, so
    * each RSS is one mirrored division, F one mirrored chain gridded
    * e6, and the top-5 ranking runs on (f_e6 DESC, split_t) — gridded
    * integers, never raw doubles.
    *
    * Scale: the scan is GRID-sized (days), not data-sized — the one
    * global window rides the ~2.4k-row calendar frame after the
    * map-side daily collapse; candidates come from the same prefix
    * pass, and the top-5 is TakeOrderedAndProject.
    */
  def q348(s: SparkSession, dir: String): DataFrame = {
    val grid = dailyGrid(s, dir)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = grid
      .withColumn("cx", sum(col("x")).over(wCum))
      .withColumn("cxx", sum(col("x").cast(d38) * col("x")).over(wCum))
      .withColumn("ctx", sum(col("t").cast(d38) * col("x")).over(wCum))
    val tot = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("sxn"),
      sum(col("x").cast(d38) * col("x")).as("sxxn"),
      sum(col("t").cast(d38) * col("x")).as("stxn"))
    // Σt and Σt² over 0..m-1 by closed form — exact integer division.
    def stOf(m: Column): Column =
      ((m - 1).cast(d38) * m).divide(lit(2)).cast(d38)
    def sttOf(m: Column): Column =
      ((m - 1).cast(d38) * m * (lit(2).cast(d38) * m - 1))
        .divide(lit(6)).cast(d38)
    def dxx(m: Column, sx: Column, sxx: Column): Column =
      m.cast(d38) * sxx - sx.cast(d38) * sx
    def dtx(m: Column, st: Column, sx: Column, stx: Column): Column =
      m.cast(d38) * stx - st * sx.cast(d38)
    def dtt(m: Column, st: Column, stt: Column): Column =
      m.cast(d38) * stt - st * st
    val cand = cums.withGlobalStats(tot)
      .withColumn("i", col("t") + 1) // left segment = rows 0..t
      .filter(col("i") >= 8 && col("n") - col("i") >= 8)
      .select(col("i").as("split_t"), col("n"),
        col("cx"), col("cxx"), col("ctx"),
        col("sxn"), col("sxxn"), col("stxn"))
    val scored = cand
      .withColumn("m2", col("n") - col("split_t"))
      .withColumn("st1", stOf(col("split_t")))
      .withColumn("stt1", sttOf(col("split_t")))
      .withColumn("stn", stOf(col("n")))
      .withColumn("sttn", sttOf(col("n")))
      .withColumn("dxx1", dxx(col("split_t"), col("cx"), col("cxx")))
      .withColumn("dtt1", dtt(col("split_t"), col("st1"), col("stt1")))
      .withColumn("dtx1",
        dtx(col("split_t"), col("st1"), col("cx"), col("ctx")))
      .withColumn("dxx2",
        col("m2").cast(d38) * (col("sxxn") - col("cxx")) -
          (col("sxn") - col("cx")).cast(d38) * (col("sxn") - col("cx")))
      .withColumn("dtt2", col("m2").cast(d38) * (col("sttn") - col("stt1")) -
        (col("stn") - col("st1")) * (col("stn") - col("st1")))
      .withColumn("dtx2", col("m2").cast(d38) * (col("stxn") - col("ctx")) -
        (col("stn") - col("st1")) * (col("sxn") - col("cx")).cast(d38))
      .withColumn("dxxn", dxx(col("n"), col("sxn"), col("sxxn")))
      .withColumn("dttn", dtt(col("n"), col("stn"), col("sttn")))
      .withColumn("dtxn",
        dtx(col("n"), col("stn"), col("sxn"), col("stxn")))
      .withColumn("rss1",
        (col("dxx1") * col("dtt1") - col("dtx1") * col("dtx1"))
          .cast("double") /
          (col("split_t").cast(d38) * col("dtt1")).cast("double"))
      .withColumn("rss2",
        (col("dxx2") * col("dtt2") - col("dtx2") * col("dtx2"))
          .cast("double") /
          (col("m2").cast(d38) * col("dtt2")).cast("double"))
      .withColumn("rssf",
        (col("dxxn") * col("dttn") - col("dtxn") * col("dtxn"))
          .cast("double") /
          (col("n").cast(d38) * col("dttn")).cast("double"))
      .select(col("split_t"), col("n").as("n_days"),
        when(col("rss1") + col("rss2") > 0.0,
          intScaled(
            (col("rssf") - col("rss1") - col("rss2")) / lit(2.0) /
              ((col("rss1") + col("rss2")) /
                (col("n") - 4).cast("double")),
            1000000L)).as("f_e6"),
        intScaled(col("dtx1").cast("double") / col("dtt1").cast("double"),
          1000000L).as("slope_l_e6"),
        intScaled(col("dtx2").cast("double") / col("dtt2").cast("double"),
          1000000L).as("slope_r_e6"))
      .filter(col("f_e6").isNotNull)
    scored.orderBy(col("f_e6").desc, col("split_t")).limit(5)
  }

  /** q349 — first-occurrence precedence (A-first-before-B) over the
    * event stream: for every ordered pair of distinct event types,
    * how many users FIRST touch A strictly before they first touch B,
    * with support, confidence and lift. q162's Markov transitions see
    * only CONSECUTIVE steps and q161's association rules ignore order
    * entirely — this is the PrefixSpan-style "which action typically
    * initiates the other" table that funnel definitions (q115) are
    * then justified from. (The weaker "some A before some B" test —
    * min(A) < max(B) — saturates to 1.0 for every pair on streams
    * where users touch every type repeatedly, certifying nothing;
    * first-vs-first splits each pair and its reverse ~complementarily
    * and is the discriminative form.)
    *
    * Exactness: "first A before first B" ⟺ min_ts(A) < min_ts(B) —
    * exact epoch-µs minima per (user, type); every census is an
    * exact integer; support/confidence/lift are one mirrored division
    * each (lift's numerator and denominator are exact decimal(38)
    * products).
    *
    * Scale: the stream collapses to ≤ |types| rows per user map-side
    * BEFORE the self-join, so the pair fan-out is |types|² per user
    * (types is a small closed set), never events². One shuffle on
    * user_id, one on the pair.
    */
  def q349(s: SparkSession, dir: String): DataFrame = {
    val ut = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("us")).as("mn"))
      .localCheckpoint(true) // both sides of the pair join + type counts
    val perType = ut.groupBy(col("event_type"))
      .agg(count(lit(1)).as("nu"))
    val nUsers = ut.select(col("user_id")).distinct()
      .agg(count(lit(1)).as("n"))
    val a = ut.select(col("user_id"), col("event_type").as("type_a"),
      col("mn").as("amn"))
    val b = ut.select(col("user_id"), col("event_type").as("type_b"),
      col("mn").as("bmn"))
    a.join(b, "user_id").filter(col("type_a") =!= col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("n_both"),
        sum(when(col("amn") < col("bmn"), 1L).otherwise(0L))
          .as("n_ordered"))
      .join(broadcast(perType.select(col("event_type").as("type_a"),
        col("nu").as("n_a"))), "type_a")
      .join(broadcast(perType.select(col("event_type").as("type_b"),
        col("nu").as("n_b"))), "type_b")
      .withGlobalStats(nUsers)
      .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
        col("n_both"), col("n_ordered"),
        intScaled(col("n_ordered").cast("double") / col("n").cast("double"),
          1000000L).as("support_e6"),
        intScaled(col("n_ordered").cast("double") /
          col("n_a").cast("double"), 1000000L).as("confidence_e6"),
        intScaled(
          (col("n_ordered").cast(d38) * col("n")).cast("double") /
            (col("n_a").cast(d38) * col("n_b")).cast("double"),
          1000000L).as("lift_e6"))
      .orderBy("type_a", "type_b")
  }

  /** q350 — sessionization threshold-sensitivity curve: the session
    * census (count, sessions/user, events/session, singleton share,
    * exact median duration) at inactivity thresholds of 1/6/24/72
    * HOURS — bracketing this stream's inter-event gap spread (p10
    * ≈ 1.2 h, median ≈ 7 h, p90 ≈ 25 h), so each step visibly
    * consolidates sessions instead of reading a flat all-singleton
    * census. The threshold is sessionization's ONE free parameter
    * and every downstream metric (q37/q45/q282/q329) inherits it —
    * this curve is how the parameter is actually chosen: the knee
    * where session count stops collapsing is the natural timeout
    * (q327's attribution-window-curve discipline applied to
    * sessions).
    *
    * Exactness: gaps and durations are exact epoch-µs integers; the
    * per-threshold median is the exact lower median via the
    * (rank, count) inversion with a (dur, user, sid) total order;
    * the two rates are one mirrored division each.
    *
    * Scale: ONE user-keyed window pass computes all four thresholds'
    * session counters as parallel cumulative sums (the break flag for
    * threshold t is monotone in t, so the four counters share the one
    * (us, event_id) sort of 1× events); the 4× fan-out explodes only
    * AFTER the window, feeding a map-side-combinable hash agg — the
    * r11 audit's 2.1× edge was the old explode-then-window shape
    * sorting 4× events under a (threshold, user) re-shuffle. The rank
    * window rides the session frame (sessions ≪ events), and the
    * output is 4 rows.
    */
  def q350(s: SparkSession, dir: String): DataFrame = {
    val thrs = Seq(1L, 6L, 24L, 72L)
    val wLag = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val wCum = wLag.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wLag))
    val withSids = thrs.foldLeft(base) { (df, h) =>
      df.withColumn(s"sid_$h",
        sum(when(col("gap").isNull ||
          col("gap") > h * 3600L * 1000000L, 1L).otherwise(0L)).over(wCum))
    }
    val sess = withSids
      .select(col("user_id"), col("us"),
        explode(array(thrs.map(h =>
          struct(lit(h).as("thr_hr"), col(s"sid_$h").as("sid"))): _*))
          .as("t"))
      .select(col("user_id"), col("us"),
        col("t.thr_hr").as("thr_hr"), col("t.sid").as("sid"))
      .groupBy(col("thr_hr"), col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
    // r18 (guide §2.2): the rank rode a thr_hr-partitioned window —
    // FOUR partitions, i.e. a full sort of the session frame on 4
    // tasks (plus a second single-pass count window), the same
    // single-reducer class TwoPhase exists for. rankCum buckets the
    // durations (distributed within-bucket sort, ~520-bucket census)
    // and hands back rank + per-threshold count in one shape. Tie
    // note: (dur_us, user_id) is not unique per threshold, so rn is
    // tie-arbitrary WITHIN equal (dur, user) rows — exactly as
    // row_number over the old window was across equal (dur, user,
    // sid) reshuffles — and the ONE consumer, min(dur | 2·rn ≥ ns),
    // is tie-invariant: permuting ranks inside an equal-dur run never
    // changes which dur VALUE first crosses ns/2.
    graft.ops.TwoPhase.rankCum(sess, Seq("thr_hr"), "dur_us", "user_id",
        asc = true, rn = Some("rn"), n = Some("ns"))
      .groupBy(col("thr_hr"))
      .agg(max(col("ns")).as("n_sessions"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("n_ev")).as("n_events"),
        sum(when(col("n_ev") === 1L, 1L).otherwise(0L)).as("n_singleton"),
        min(when(col("rn") * 2 >= col("ns"), col("dur_us"))).as("p50_dur_us"))
      .select(col("thr_hr"), col("n_sessions"),
        intScaled(col("n_sessions").cast("double") /
          col("n_users").cast("double"), 1000000L).as("sess_per_user_e6"),
        intScaled(col("n_events").cast("double") /
          col("n_sessions").cast("double"), 1000000L)
          .as("events_per_sess_e6"),
        col("n_singleton"), col("p50_dur_us"))
      .orderBy("thr_hr")
  }

  /** q351 — Cochran-Armitage trend test: is return probability
    * MONOTONICALLY driven by order quantity? Treats l_quantity as the
    * ordered dose, returnflag='R' as the response, and tests the
    * linear trend in proportions — the categorical chi-square
    * (q205/q285) asks "is there ANY association"; this asks the
    * sharper dose-response question drug-trial and quality teams
    * actually pose, with full power concentrated on the ordered
    * alternative.
    *
    * Exactness: Z² = A²·N / B with A = N·Σsᵢrᵢ − Σsᵢnᵢ·R and
    * B = R(N−R)(N·Σsᵢ²nᵢ − (Σsᵢnᵢ)²) — every moment an exact
    * decimal(38) integer off the (quantity → n, r) collapse; the
    * signed Z is ONE mirrored chain (A·√N/√B) gridded e6.
    *
    * Scale: the dose collapse is a ≤50-row map-side agg; everything
    * after is a one-row frame.
    *
    * Degenerate guard: Z is NULL when all responses agree (rr=0 or
    * rr=nn) OR when there is a single dose group (n_groups=1 → trend
    * denominator N·Σs²n−(Σsn)² = 0, where Spark would emit ±Inf/NaN
    * but DuckDB's CAST(ROUND(...)) errors) — guarded identically on
    * both engines.
    */
  def q351(s: SparkSession, dir: String): DataFrame = {
    val g = t(s, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("sc"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("resp"))
      .groupBy(col("sc"))
      .agg(count(lit(1)).as("ni"), sum(col("resp")).as("ri"))
    g.agg(count(lit(1)).as("n_groups"), sum(col("ni")).as("nn"),
        sum(col("ri")).as("rr"),
        sum(col("sc").cast(d38) * col("ni")).as("sn"),
        sum(col("sc").cast(d38) * col("sc") * col("ni")).as("s2n"),
        sum(col("sc").cast(d38) * col("ri")).as("tr"))
      .select(col("nn").as("n_rows"), col("rr").as("n_returned"),
        col("n_groups"),
        when(col("rr") > 0L && col("rr") < col("nn") &&
            col("n_groups") > 1L,
          intScaled(
            (col("nn").cast(d38) * col("tr") - col("sn") * col("rr"))
              .cast("double") * sqrt(col("nn").cast("double")) /
              sqrt((col("rr").cast(d38) * (col("nn") - col("rr")) *
                (col("nn").cast(d38) * col("s2n") - col("sn") * col("sn")))
                .cast("double")),
            1000000L)).as("z_e6"))
  }

  /** The first 20 powers of 0.9 as EXACT decimal literals (9ᵏ/10ᵏ
    * spelled digit-for-digit), shared between the Spark expression
    * and the DuckDB SQL — q331's shared-literal discipline, so the
    * geometric RBO weights are the same IEEE doubles on both engines
    * with no pow() libm exposure at all.
    */
  private[graft] val rboPow: Seq[(Int, String)] =
    (1 to 20).map { d =>
      val k = d - 1
      val digits = BigInt(9).pow(k).toString
      val lit0 =
        if (k == 0) "1.0"
        else "0." + ("0" * (k - digits.length)) + digits
      d -> lit0
    }

  private[queries] val rboPowCase: String =
    "CASE " + rboPow.map { case (d, p) => s"WHEN d = $d THEN $p" }
      .mkString(" ") + " END"

  /** q352 — rank-biased overlap (RBO, Webber et al.) between the
    * brand revenue ranking of 1996 and of 1997: per-depth overlap of
    * the two top-20 prefixes and the truncated RBO with p = 0.9.
    * Kendall's tau (q340) weights every pair equally — RBO is the
    * top-weighted "did the leaderboard actually change" number
    * (1 = identical prefixes, → 0 = disjoint), the standard rank-shift
    * metric in retrieval evaluation and exactly what a merchandising
    * review asks of a year-over-year brand table.
    *
    * Exactness: both rankings are (revenue-cents DESC, brand) —
    * exact integers with a total tie-break; per-depth overlap counts
    * brands with max(rank₉₆, rank₉₇) ≤ d, an exact census; each term
    * (1−p)·p^(d−1)·ov_d/d is ONE mirrored chain off the shared power
    * literals, gridded e9; RBO is the exact integer sum of the
    * gridded terms.
    *
    * Scale: revenue collapses map-side to brand×year; every frame
    * after is brand-bounded (≤25 rows) — the rank windows ride a
    * constant-size frame, and the depth grid is 20 rows.
    */
  def q352(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .select(col("l_partkey"), year(col("l_shipdate").cast("date")).as("yr"),
        cents(col("l_extendedprice")).as("rc"))
      .filter(col("yr").isin(1996, 1997))
      .join(t(s, dir, "part").select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"))
      .agg(sum(when(col("yr") === 1996, col("rc")).otherwise(0L)).as("r96"),
        sum(when(col("yr") === 1997, col("rc")).otherwise(0L)).as("r97"))
    val ranked = rev
      .withColumn("ra", row_number().over(
        Window.orderBy(col("r96").desc, col("p_brand"))))
      .withColumn("rb", row_number().over(
        Window.orderBy(col("r97").desc, col("p_brand"))))
      .select(col("p_brand"), greatest(col("ra"), col("rb")).as("mx"))
      .localCheckpoint(true) // depth-grid probe over a ≤25-row frame
    val depths = ranked.agg(count(lit(1)).as("nb"))
      .select(explode(sequence(lit(1L), lit(20L))).as("d"))
    val ov = depths.join(ranked, col("mx") <= col("d"), "left")
      .groupBy(col("d"))
      .agg(sum(when(col("p_brand").isNotNull, 1L).otherwise(0L))
        .as("n_overlap"))
    val terms = ov
      .withColumn("pw", expr(rboPowCase).cast("double"))
      .select(col("d"), col("n_overlap"),
        intScaled(
          lit(0.1) * col("pw") * col("n_overlap").cast("double") /
            col("d").cast("double"),
          1000000000L).as("term_e9"))
    val tot = terms.agg(sum(col("term_e9")).as("rbo_e9"))
    terms.withGlobalStats(tot).orderBy("d")
  }

  /** Exact lag-autocovariance moments of the daily grid in ONE row —
    * n, den = Σd², num₁..num_K with d_t = n·x_t − Σx (the q334
    * deviation frame, pivoted wide) — shared by q359/q360 so the
    * Ljung-Box and Durbin-Levinson chains read the SAME exact
    * integers q334's per-lag ACF certifies.
    */
  private def lagMoments(
      s: SparkSession, dir: String, maxLag: Int): DataFrame = {
    val grid = dailyGrid(s, dir).localCheckpoint(true)
    val mom = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = grid.withGlobalStats(mom)
      .select(col("t"), (col("n") * col("x") - col("sx")).as("d"), col("n"))
      .localCheckpoint(true) // both sides of the lag join + the denom
    val den = dev.agg(max(col("n")).as("n"),
      sum(col("d").cast(d38) * col("d")).as("den"))
    dev
      .select(col("t"), col("d"),
        explode(sequence(lit(1L), lit(maxLag.toLong))).as("lag"))
      .select((col("t") + col("lag")).as("t"), col("lag"), col("d").as("d0"))
      .join(dev.select(col("t"), col("d").as("d1")), "t")
      .groupBy(col("lag"))
      .agg(sum(col("d0").cast(d38) * col("d1")).as("num"))
      .agg(
        max(when(col("lag") === 1L, col("num"))).as("num1"),
        (2 to maxLag).map(k =>
          max(when(col("lag") === k.toLong, col("num"))).as(s"num$k")): _*)
      .withGlobalStats(den)
  }

  /** q359 — Ljung-Box portmanteau test at lags 1..7 on the zero-filled
    * daily order-count series: Q_h = n(n+2)·Σ_{k≤h} r_k²/(n−k), the
    * "is there ANY autocorrelation up to lag h" summary that reads
    * q334's per-lag ACF as one cumulative statistic (the whiteness
    * gate a forecasting residual check runs before trusting q219's
    * model; q343's runs test is the distribution-free cousin).
    *
    * Float discipline: each r_k = num_k/den is ONE mirrored division
    * off q334's exact decimal(38) moments; each summand r_k²/(n−k) is
    * gridded e12 PER LAG and the cumulative sum runs on exact
    * integers (the q352 gridded-terms-summed-exactly pattern — a raw
    * double Σ would be partition-order-dependent); Q's final chain
    * n·(n+2)·cum/1e12 is one mirrored multiply-divide (cum < 2⁵³, so
    * the double conversion is exact).
    *
    * Scale: everything after the map-side daily collapse rides the
    * calendar grid; the lag fan-out is 7×days; output 7 rows.
    */
  def q359(s: SparkSession, dir: String): DataFrame = {
    val m = lagMoments(s, dir, 7)
    val terms = m.select(col("n"), col("den"),
      explode(array((1 to 7).map(k => struct(lit(k.toLong).as("lag"),
        col(s"num$k").as("num"))): _*)).as("p"))
      .select(col("n"), col("den"), col("p.lag").as("lag"),
        col("p.num").as("num"))
      .withColumn("acf_e6", when(col("den") > 0L,
        intScaled(col("num").cast("double") / col("den").cast("double"),
          1000000L)))
      .withColumn("term_e12", when(col("den") > 0L,
        intScaled(
          col("num").cast("double") / col("den").cast("double") *
            (col("num").cast("double") / col("den").cast("double")) /
            (col("n") - col("lag")).cast("double"),
          1000000000000L)))
    val wCum = Window.orderBy("lag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    terms
      .withColumn("cum", sum(col("term_e12")).over(wCum))
      .select(col("lag"), col("n").as("n_days"), col("acf_e6"),
        intScaled(
          col("n").cast("double") * (col("n") + 2).cast("double") *
            col("cum").cast("double") / lit(1000000000000.0),
          1000000L).as("q_e6"))
      .orderBy("lag")
  }

  /** q360 — partial autocorrelation (PACF) at lags 1..5 by the
    * Durbin-Levinson recursion on q334's exact autocovariances: the
    * direct lag-k effect with lags 1..k−1 partialled out — what an AR
    * order-selection actually reads (the ACF alone confounds a long
    * AR(1) tail with genuine higher-order structure).
    *
    * Float discipline: the five r_k enter as mirrored num_k/den
    * divisions off exact decimal(38) moments; the recursion
    * φ_kk = (r_k − Σφ_{k−1,j}r_{k−j}) / (1 − Σφ_{k−1,j}r_j),
    * φ_kj = φ_{k−1,j} − φ_kk·φ_{k−1,k−j} is UNROLLED with every
    * product and sum spelled in the identical order on both engines
    * (the q309 unrolled-power-rounds discipline) — a one-row scalar
    * chain, gridded e6 only at output.
    *
    * Scale: the data-sized stage is q334's daily collapse; the
    * recursion is a one-row frame; output 5 rows.
    */
  def q360(s: SparkSession, dir: String): DataFrame = {
    val m = lagMoments(s, dir, 5)
    val r = m.select(Seq(col("n"), col("den")) ++ (1 to 5).map(k =>
      when(col("den") > 0L,
        col(s"num$k").cast("double") / col("den").cast("double"))
        .as(s"r$k")): _*)
    val p = r
      .withColumn("p11", col("r1"))
      .withColumn("p22", (col("r2") - col("p11") * col("r1")) /
        (lit(1.0) - col("p11") * col("r1")))
      .withColumn("p21", col("p11") - col("p22") * col("p11"))
      .withColumn("p33",
        (col("r3") - (col("p21") * col("r2") + col("p22") * col("r1"))) /
          (lit(1.0) - (col("p21") * col("r1") + col("p22") * col("r2"))))
      .withColumn("p31", col("p21") - col("p33") * col("p22"))
      .withColumn("p32", col("p22") - col("p33") * col("p21"))
      .withColumn("p44",
        (col("r4") - (col("p31") * col("r3") + col("p32") * col("r2") +
          col("p33") * col("r1"))) /
          (lit(1.0) - (col("p31") * col("r1") + col("p32") * col("r2") +
            col("p33") * col("r3"))))
      .withColumn("p41", col("p31") - col("p44") * col("p33"))
      .withColumn("p42", col("p32") - col("p44") * col("p32"))
      .withColumn("p43", col("p33") - col("p44") * col("p31"))
      .withColumn("p55",
        (col("r5") - (col("p41") * col("r4") + col("p42") * col("r3") +
          col("p43") * col("r2") + col("p44") * col("r1"))) /
          (lit(1.0) - (col("p41") * col("r1") + col("p42") * col("r2") +
            col("p43") * col("r3") + col("p44") * col("r4"))))
    p.select(col("n").as("n_days"),
        explode(array(
          struct(lit(1L).as("lag"), col("p11").as("pf")),
          struct(lit(2L).as("lag"), col("p22").as("pf")),
          struct(lit(3L).as("lag"), col("p33").as("pf")),
          struct(lit(4L).as("lag"), col("p44").as("pf")),
          struct(lit(5L).as("lag"), col("p55").as("pf")))).as("e"))
      .select(col("e.lag").as("lag"), col("n_days"),
        intScaled(col("e.pf"), 1000000L).as("pacf_e6"))
      .orderBy("lag")
  }

  /** q361 — Page-Hinkley upward-drift detector on the zero-filled
    * daily series: PH_t = m_t − min_{s≤t} m_s with m_t the cumulative
    * deviation from the global mean (δ = 0), alarm when PH_t > λ = 50
    * events — the sequential cousin of q251's CUSUM (CUSUM locates
    * ONE retrospective shift; Page-Hinkley is the ONLINE monitor with
    * an explicit alarm threshold and reset-free memory).
    *
    * Exactness: n-scaled m_t (n·Σ_{i≤t}x_i − (t+1)·Σx) is an exact
    * decimal(38) integer off two prefix sums; the running min, PH,
    * and the λ·n alarm compare all stay integer; the only double is
    * the final PH_max/n report, ONE mirrored division gridded e2.
    *
    * Scale: the two windows ride the calendar grid (the accepted
    * frame class) after the map-side daily collapse; one-row output.
    */
  def q361(s: SparkSession, dir: String): DataFrame = {
    val grid = dailyGrid(s, dir)
    val wCum = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val ph = grid.withGlobalStats(tot)
      .withColumn("cx", sum(col("x")).over(wCum))
      .withColumn("nm",
        col("n").cast(d38) * col("cx") - (col("t") + 1).cast(d38) * col("sx"))
      .withColumn("rmin", min(col("nm")).over(wCum))
      .withColumn("ph", col("nm") - col("rmin"))
      .withColumn("alarm", col("ph") > lit(50).cast(d38) * col("n"))
    ph.agg(
      max(col("n")).as("n_days"),
      intScaled(max(col("ph")).cast("double") / max(col("n")).cast("double"),
        100L).as("ph_max_e2"),
      min(when(col("alarm"), col("t"))).as("first_alarm_t"),
      sum(when(col("alarm"), 1L).otherwise(0L)).as("n_alarm_days"))
  }

  /** q362 — iterated Grubbs outlier scan (3 rounds) of the daily
    * series: each round reports the most extreme day's G statistic
    * |x−x̄|/s and REMOVES it before the next — the classical
    * generalized-ESD shape (q250's IQR fence is the robust screen;
    * Grubbs is the parametric test a data-quality runbook quotes
    * with a critical value). Masking is the point of the iteration:
    * a second outlier hides the first from a single-pass test.
    *
    * Exactness: per round, the deviation |n·x − Σx| and moments are
    * exact decimal(38); the argmax runs on (dev DESC, t) integers; G
    * is ONE mirrored chain dev/n/√(var) per round, gridded e6.
    *
    * Scale: three grid-sized passes over the calendar frame (the
    * accepted window class) after the map-side daily collapse;
    * 3-row output.
    */
  def q362(s: SparkSession, dir: String): DataFrame = {
    val wArg = Window.orderBy(col("dev").desc, col("t"))
    def round(f: DataFrame): (DataFrame, DataFrame) = {
      val mom = f.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("x").cast(d38) * col("x")).as("sxx"))
      val ranked = f.withGlobalStats(mom)
        .withColumn("dev", abs(col("n").cast(d38) * col("x") - col("sx")))
        .withColumn("rn", row_number().over(wArg))
      val out = ranked.filter(col("rn") === 1)
        .select(col("t"), col("x"), col("n"), col("sx"), col("sxx"),
          col("dev"))
      val rest = ranked.filter(col("rn") =!= 1).select(col("t"), col("x"))
      (out, rest)
    }
    val g0 = dailyGrid(s, dir).localCheckpoint(true)
    val (o1, f1c) = round(g0)
    val f1 = f1c.localCheckpoint(true)
    val (o2, f2c) = round(f1)
    val f2 = f2c.localCheckpoint(true)
    val (o3, _) = round(f2)
    Seq((o1, 1L), (o2, 2L), (o3, 3L)).map { case (o, r) =>
      o.select(lit(r).as("round"), col("t").as("t_out"),
        col("x").as("x_out"), col("n").as("n_remaining"),
        intScaled(
          col("dev").cast("double") / col("n").cast("double") /
            sqrt((col("n").cast(d38) * col("sxx") -
              col("sx").cast(d38) * col("sx")).cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double"))),
          1000000L).as("g_e6"))
    }.reduce(_ unionAll _).orderBy("round")
  }

  /** q363 — cohort lifetime-value matrix: customers cohorted by their
    * FIRST order month, revenue accumulated by months-since-first —
    * the (cohort × age) triangle every subscription/commerce finance
    * team reads for payback curves (q116's retention counts USERS
    * returning; this follows the MONEY — the two share the cohort
    * spine). Cumulative share shows each cohort's revenue maturation
    * against its own total.
    *
    * Exactness: cohort/idx are exact integer month arithmetic
    * (y·12+m−1); revenue is exact cents; the only double is the
    * cumulative-share division, mirrored and e6-gridded.
    *
    * Scale: one custkey-keyed min-agg (map-side combined), one
    * (cohort, idx)-keyed cents agg; the cumulative window rides the
    * cohort×age triangle (calendar² frame, ≤ ~85² rows — the q333
    * grid class), never orders. Output is that triangle.
    */
  def q363(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("c"),
        (year(col("o_orderdate").cast("date")) * 12 +
          month(col("o_orderdate").cast("date")) - 1).cast("long").as("ym"),
        cents(col("o_totalprice")).as("cents"))
      .localCheckpoint(true) // cohort min + the revenue cells
    val coh = o.groupBy(col("c")).agg(min(col("ym")).as("cohort"))
    val cell = o.join(coh, "c")
      .groupBy(col("cohort"), (col("ym") - col("cohort")).as("idx"))
      .agg(sum(col("cents")).as("rev_cents"),
        countDistinct(col("c")).as("n_customers"))
    val wCum = Window.partitionBy("cohort").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cell
      .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .withColumn("tot", sum(col("rev_cents"))
        .over(Window.partitionBy("cohort")))
      .select(col("cohort").as("cohort_ym"), col("idx"),
        col("n_customers"), col("rev_cents"), col("cum_cents"),
        intScaled(col("cum_cents").cast("double") / col("tot").cast("double"),
          1000000L).as("cum_share_e6"))
      .orderBy("cohort_ym", "idx")
  }

  /** q364 — ABC-XYZ inventory matrix: parts classed by revenue
    * concentration (A/B/C — q287's exact cumulative-share convention,
    * reused verbatim so the two queries can never disagree) CROSSED
    * with demand variability (X/Y/Z by the coefficient of variation
    * of monthly quantity over the part's ACTIVE months — this
    * catalog's demand is sparse, so zero-month inclusion would class
    * everything Z; active-month CV is the standard sparse-SKU
    * adaptation) — the 9-cell planning grid that decides
    * forecast-vs-buffer strategy per class.
    *
    * Exactness: the ABC boundaries are q287's exact integer
    * cross-multiplications; CV² thresholds (⅓ and ½ — fixture-probed
    * to genuinely split the catalog) compare the EXACT rational
    * m(m·Σq²−(Σq)²)/((m−1)(Σq)²) by cross-multiplied decimal(38)
    * integers — no sqrt, no division, no float anywhere until the
    * census share; single-month parts guard to Z.
    *
    * Scale: monthly demand collapses map-side to (part, month); the
    * cumulative mass rides [[graft.ops.TwoPhase.rankCum]] (HDR
    * range-buckets + broadcast prefix offsets — q287's shared core,
    * closed round 12), so no task holds the part dimension and the
    * frame total comes off the same bucket census. Output ≤ 9 rows.
    */
  def q364(s: SparkSession, dir: String): DataFrame = {
    // r18: no checkpoint on the fact projection — it has exactly ONE
    // consumer (the monthly collapse; rankCum's internal checkpoint
    // covers the branched part-sized frame), so the eager
    // materialization was a pure extra write+read of the fact at any
    // scale (guide §5: cache only what is reused).
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        (year(col("l_shipdate").cast("date")) * 12 +
          month(col("l_shipdate").cast("date")) - 1).cast("long").as("ym"),
        cents(col("l_extendedprice")).as("cents"),
        col("l_quantity").cast("long").as("q"))
    val monthly = li.groupBy(col("l_partkey"), col("ym"))
      .agg(sum(col("q")).as("mq"), sum(col("cents")).as("mcents"))
    val per = monthly.groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("m"), sum(col("mcents")).as("x"),
        sum(col("mq")).as("sq"),
        sum(col("mq").cast(d38) * col("mq")).as("sqq"))
    val ranked = graft.ops.TwoPhase.rankCum(per, Nil, "x", "l_partkey",
      asc = false, cum = Some("__cum"), tot = Some("__tot"))
    val before = (col("__cum") - col("x")).cast(d38) * 100
    val cv2num = col("m").cast(d38) *
      (col("m").cast(d38) * col("sqq") - col("sq").cast(d38) * col("sq"))
    val cv2den = (col("m") - 1).cast(d38) *
      (col("sq").cast(d38) * col("sq"))
    val cls = ranked
      .withColumn("tot", col("__tot").cast(d38))
      .withColumn("abc",
        when(before < col("tot") * 80, "A")
          .when(before < col("tot") * 95, "B")
          .otherwise("C"))
      .withColumn("xyz",
        when(col("m") <= 1L, "Z")
          .when(cv2num * 3 <= cv2den, "X")
          .when(cv2num * 2 <= cv2den, "Y")
          .otherwise("Z"))
    cls.groupBy(col("abc"), col("xyz"))
      .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("rev_cents"),
        max(col("tot")).as("t"))
      .select(col("abc"), col("xyz"), col("n_parts"), col("rev_cents"),
        intScaled(
          col("rev_cents").cast("double") * 100 / col("t").cast("double"),
          1000000L).as("share_e6"))
      .orderBy("abc", "xyz")
  }

  /** q365 — duplicate-invoice screen: order pairs from the SAME
    * customer whose totals land in the SAME $10,000 band, placed
    * within 30 days — the classic payables/forensic double-billing
    * heuristic, and the STRUCTURED-data sibling of the text near-dup
    * shelf (blocking key = (customer, amount band), candidate window
    * = date proximity — exactly a record-linkage blocking pass,
    * q128/q257's shape on transactions; band+window chosen by probing
    * this ledger's price dispersion so the screen is non-vacuous).
    * Censused by week-of-gap so reviewers triage the closest pairs
    * first.
    *
    * Exactness: all keys, bands (integer floor-div on cents), date
    * diffs, and censuses are exact integers; no float anywhere.
    *
    * Scale: the self-join is an EQUI-join on the (custkey, band)
    * blocking key — group sizes are per-customer-per-band (tiny, and
    * a production pass would cap them like q66's probe bound); the
    * ±30-day filter runs inside the block. Never a date-range join,
    * never all-pairs. Output ≤ 5 rows (week-gap census).
    */
  def q365(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
      .select(col("o_custkey").as("c"),
        cents(col("o_totalprice")).as("p"),
        (cents(col("o_totalprice")) / 1000000L).cast("long").as("pb"),
        datediff(col("o_orderdate").cast("date"),
          lit("1970-01-01").cast("date")).cast("long").as("d"),
        col("o_orderkey").as("k"))
      .localCheckpoint(true) // both sides of the blocking self-join
    val a = o.select(col("c"), col("pb"), col("p").as("p1"),
      col("d").as("d1"), col("k").as("k1"))
    val b = o.select(col("c"), col("pb"), col("p").as("p2"),
      col("d").as("d2"), col("k").as("k2"))
    a.join(b, Seq("c", "pb"))
      .filter(col("k1") < col("k2") && abs(col("d1") - col("d2")) <= 30L)
      .groupBy((abs(col("d1") - col("d2")) / 7L).cast("long").as("gap_weeks"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("c")).as("n_customers"),
        sum(abs(col("p1") - col("p2"))).as("abs_diff_cents"))
      .orderBy("gap_weeks")
  }

  /** q376 — Lorenz decile curve of customer revenue: customers ranked
    * ascending by lifetime revenue, split into exact integer deciles,
    * each decile's revenue share and the cumulative (Lorenz) share —
    * the curve POINTS behind q332's single Gini number (the published
    * form: "the bottom 50% of customers hold x% of revenue"), with
    * the decile→share table a pricing/CRM review reads directly.
    *
    * Exactness: decile assignment is the exact integer
    * ((rank−1)·10)/n (positive floor = truncation on both engines);
    * all censuses are exact cents; shares are mirrored divisions
    * e6-gridded.
    *
    * Scale: one custkey-keyed cents agg (map-side combined); the rank
    * rides [[graft.ops.TwoPhase.rankCum]] (HDR range-buckets +
    * broadcast prefix offsets — q287's shared core, closed round 12):
    * no task holds the customer dimension, and n/total come off the
    * same bucket census instead of two `Window.partitionBy()`
    * single-task passes; output 10 rows.
    */
  def q376(s: SparkSession, dir: String): DataFrame = {
    val cust = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
    val ranked = graft.ops.TwoPhase.rankCum(cust, Nil, "rev", "o_custkey",
      asc = true, rn = Some("rn"), n = Some("n"), tot = Some("tot"))
      .withColumn("decile", expr("(rn - 1) * 10 div n") + 1)
    val wCum = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("rev")).as("rev_cents"),
        max(col("tot")).as("t"))
      .withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .select(col("decile"), col("n_customers"), col("rev_cents"),
        intScaled(col("rev_cents").cast("double") / col("t").cast("double"),
          1000000L).as("share_e6"),
        intScaled(col("cum_cents").cast("double") / col("t").cast("double"),
          1000000L).as("lorenz_e6"))
      .orderBy("decile")
  }

  /** q378 — HDR-histogram quantile sketch: order totals (cents) land
    * in log₂ buckets with 8 sub-buckets (bucket id = 8e + sub off the
    * bit length — the HdrHistogram/DDSketch shape every latency
    * pipeline ships), then p50/p90/p99 are estimated as bucket
    * midpoints and compared against the engines' exact interpolated
    * percentile — the FOURTH portable sketch beside HLL (q25/q97),
    * CMS (q114) and Bloom (q346): counts merge by plain addition
    * (shard-mergeable like the HLL register file), and the measured
    * relative error IS the sketch's resolution guarantee (≤ 2^-3)
    * made visible.
    *
    * Exactness: bucket ids, bounds, and midpoints are pure integer
    * arithmetic off `length(bin(x))` (the q97 register discipline)
    * and integer shifts; quantile selection is the cross-multiplied
    * integer compare (2·cum ≥ n etc. — the q163 no-division rule);
    * the exact percentile rides the engines' shared type-7
    * interpolation on integer frames (q152 contract); the relative
    * error is ONE mirrored chain per row.
    *
    * Scale: one map-side bucket assignment + a ≤ ~220-row register
    * census; the cumulative window rides that register file.
    */
  def q378(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "orders")
      .select(cents(col("o_totalprice")).as("x"))
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
      .localCheckpoint(true) // register census + the exact percentiles
    val regs = base.groupBy(col("bid"))
      .agg(count(lit(1)).as("n"), min(col("mid")).as("mid"))
    val tot = base.agg(count(lit(1)).as("nn"),
      expr("percentile(x, 0.5)").as("ex50"),
      expr("percentile(x, 0.9)").as("ex90"),
      expr("percentile(x, 0.99)").as("ex99"))
    val wCum = Window.orderBy("bid")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cums = regs.withColumn("cum", sum(col("n")).over(wCum))
      .withGlobalStats(tot)
    val picked = cums
      .withColumn("q", explode(array(lit(50L), lit(90L), lit(99L))))
      .filter(col("cum") * 100 >= col("q") * col("nn"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("q").orderBy("bid")))
      .filter(col("rn") === 1)
    picked.select(col("q"), col("nn").as("n_rows"),
        col("mid").as("est_cents"),
        when(col("q") === 50L, col("ex50"))
          .when(col("q") === 90L, col("ex90"))
          .otherwise(col("ex99")).as("exact"))
      .select(col("q"), col("n_rows"), col("est_cents"),
        intScaled(col("exact"), 100L).as("exact_x100"),
        intScaled(
          (col("est_cents").cast("double") - col("exact")) / col("exact"),
          1000000L).as("rel_err_e6"))
      .orderBy("q")
  }

  /** q379 — year-over-year price indices (Laspeyres, Paasche, Fisher)
    * between 1996 and 1997 over matched parts: THE canonical economic
    * aggregation (what did prices do, base-weighted vs
    * current-weighted, and the geometric compromise) — q352's RBO
    * asks whether the LEADERBOARD moved; this asks what the PRICE
    * LEVEL did, the number a procurement review quotes.
    *
    * Exactness: per-part unit values (cents/quantity) grid e3 ONCE
    * per (part, year) as ONE mirrored division each; the four index
    * sums Σu₁q₀ / Σu₀q₀ / Σu₁q₁ / Σu₀q₁ are then EXACT decimal(38)
    * integers; L and P are one mirrored division each, Fisher one
    * mirrored √(L·P) chain.
    *
    * Scale: the (part, year) collapse is map-side; matched parts ride
    * a part-keyed self-join of the two year frames (dimension-
    * bounded); one-row output.
    */
  def q379(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        year(col("l_shipdate").cast("date")).as("yr"),
        cents(col("l_extendedprice")).as("c"),
        col("l_quantity").cast("long").as("q"))
      .filter(col("yr").isin(1996, 1997))
    val py = li.groupBy(col("l_partkey"), col("yr"))
      .agg(sum(col("c")).as("cc"), sum(col("q")).as("qq"))
      .select(col("l_partkey"), col("yr"), col("qq"),
        intScaled(col("cc").cast("double") / col("qq").cast("double"),
          1000L).as("u_e3"))
    val matched = py.filter(col("yr") === 1996)
      .select(col("l_partkey"), col("qq").as("q0"), col("u_e3").as("u0"))
      .join(py.filter(col("yr") === 1997)
        .select(col("l_partkey"), col("qq").as("q1"), col("u_e3").as("u1")),
        "l_partkey")
    matched.agg(count(lit(1)).as("n_matched_parts"),
        sum(col("u1").cast(d38) * col("q0")).as("l_num"),
        sum(col("u0").cast(d38) * col("q0")).as("l_den"),
        sum(col("u1").cast(d38) * col("q1")).as("p_num"),
        sum(col("u0").cast(d38) * col("q1")).as("p_den"))
      .select(col("n_matched_parts"),
        intScaled(col("l_num").cast("double") / col("l_den").cast("double"),
          1000000L).as("laspeyres_e6"),
        intScaled(col("p_num").cast("double") / col("p_den").cast("double"),
          1000000L).as("paasche_e6"),
        intScaled(sqrt(
          col("l_num").cast("double") / col("l_den").cast("double") *
            (col("p_num").cast("double") / col("p_den").cast("double"))),
          1000000L).as("fisher_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q378_hdr_quantiles" -> (q378 _),
    "q379_price_index" -> (q379 _),
    "q376_lorenz_curve" -> (q376 _),
    "q362_grubbs_scan" -> (q362 _),
    "q363_cohort_ltv" -> (q363 _),
    "q364_abc_xyz" -> (q364 _),
    "q365_dup_invoices" -> (q365 _),
    "q359_ljung_box" -> (q359 _),
    "q360_pacf" -> (q360 _),
    "q361_page_hinkley" -> (q361 _),
    "q348_chow_break" -> (q348 _),
    "q349_subseq_support" -> (q349 _),
    "q350_session_curve" -> (q350 _),
    "q351_cochran_armitage" -> (q351 _),
    "q352_rbo_rankshift" -> (q352 _))

  /** The zero-filled daily grid as DuckDB CTEs (q348's text, shared by
    * the r11 series oracles so the grid cannot drift between them).
    */
  private val gridCte: String =
    """daily AS (
      |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
      |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
      |         CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1),
      |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |grid AS (
      |  SELECT g.day - s.d0 AS t, COALESCE(d.x, 0) AS x
      |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day
      |        FROM span) g
      |  CROSS JOIN span s
      |  LEFT JOIN daily d ON d.day = g.day)""".stripMargin

  /** q334's exact deviation/lag-covariance moments as CTEs: dev, den,
    * and nums(lag, num) for lags 1..maxLag — the SQL twin of
    * [[lagMoments]].
    */
  private def lagCte(maxLag: Int): String =
    s"""mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |               CAST(SUM(x) AS BIGINT) AS sx FROM grid),
       |dev AS (SELECT t, CAST(n AS HUGEINT) * x - sx AS d, n
       |        FROM grid CROSS JOIN mom),
       |den AS (SELECT MAX(n) AS n, SUM(d * d) AS den FROM dev),
       |nums AS (
       |  SELECT l.lag, SUM(a.d * b.d) AS num
       |  FROM (SELECT CAST(UNNEST(range(1, ${maxLag + 1})) AS BIGINT)
       |          AS lag) l
       |  JOIN dev a ON TRUE
       |  JOIN dev b ON b.t = a.t + l.lag
       |  GROUP BY l.lag)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // Same bit-length buckets (length(bin()) — the q97 register
    // discipline), integer shifts and midpoints, cross-multiplied
    // quantile selection, shared type-7 exact percentile, one
    // mirrored relative-error chain per row.
    "q378_hdr_quantiles" ->
      """WITH base AS (
        |  SELECT x, length(bin(x)) - 1 AS e,
        |         CASE WHEN x < 8 THEN 0
        |              ELSE (x >> CAST(length(bin(x)) - 1 - 3 AS INT)) - 8
        |         END AS sub,
        |         CASE WHEN x < 8 THEN CAST(1 AS BIGINT)
        |              ELSE (CAST(1 AS BIGINT)
        |                    << CAST(length(bin(x)) - 1 - 3 AS INT))
        |         END AS width
        |  FROM (SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |               AS BIGINT) AS x FROM orders)),
        |bm AS (
        |  SELECT CASE WHEN x < 8 THEN x ELSE e * 8 + sub END AS bid,
        |         CASE WHEN x < 8 THEN x
        |              ELSE (sub + 8) * width + (width - 1) // 2 END AS mid
        |  FROM base),
        |regs AS (
        |  SELECT bid, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(MIN(mid) AS BIGINT) AS mid
        |  FROM bm GROUP BY bid),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
        |         quantile_cont(x, 0.5) AS ex50,
        |         quantile_cont(x, 0.9) AS ex90,
        |         quantile_cont(x, 0.99) AS ex99
        |  FROM base),
        |cums AS (
        |  SELECT bid, mid,
        |         SUM(n) OVER (ORDER BY bid ROWS UNBOUNDED PRECEDING)
        |           AS cum
        |  FROM regs),
        |picked AS (
        |  SELECT q, bid, mid, nn, ex50, ex90, ex99,
        |         ROW_NUMBER() OVER (PARTITION BY q ORDER BY bid) AS rn
        |  FROM cums CROSS JOIN tot
        |  CROSS JOIN (SELECT CAST(UNNEST([50, 90, 99]) AS BIGINT) AS q)
        |  WHERE cum * 100 >= q * nn)
        |SELECT q, nn AS n_rows, mid AS est_cents,
        |  CAST(ROUND((CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |              ELSE ex99 END) * 100) AS BIGINT) AS exact_x100,
        |  CAST(ROUND((CAST(mid AS DOUBLE)
        |      - (CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |         ELSE ex99 END))
        |    / (CASE WHEN q = 50 THEN ex50 WHEN q = 90 THEN ex90
        |       ELSE ex99 END) * 1000000) AS BIGINT) AS rel_err_e6
        |FROM picked WHERE rn = 1 ORDER BY q""".stripMargin,
    // Same e3 unit-value grid per (part, year), exact HUGEINT index
    // sums, mirrored L/P divisions and one √(L·P) Fisher chain.
    "q379_price_index" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) AS yr,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT) AS c,
        |         CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem
        |  WHERE EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) IN (1996, 1997)),
        |py AS (
        |  SELECT l_partkey, yr, CAST(SUM(q) AS BIGINT) AS qq,
        |         CAST(ROUND(CAST(SUM(c) AS DOUBLE) / CAST(SUM(q) AS DOUBLE)
        |           * 1000) AS BIGINT) AS u_e3
        |  FROM li GROUP BY l_partkey, yr),
        |m AS (
        |  SELECT a.qq AS q0, a.u_e3 AS u0, b.qq AS q1, b.u_e3 AS u1
        |  FROM py a JOIN py b ON b.l_partkey = a.l_partkey
        |  WHERE a.yr = 1996 AND b.yr = 1997),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_matched_parts,
        |         SUM(CAST(u1 AS HUGEINT) * q0) AS l_num,
        |         SUM(CAST(u0 AS HUGEINT) * q0) AS l_den,
        |         SUM(CAST(u1 AS HUGEINT) * q1) AS p_num,
        |         SUM(CAST(u0 AS HUGEINT) * q1) AS p_den
        |  FROM m)
        |SELECT n_matched_parts,
        |  CAST(ROUND(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)
        |    * 1000000) AS BIGINT) AS laspeyres_e6,
        |  CAST(ROUND(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)
        |    * 1000000) AS BIGINT) AS paasche_e6,
        |  CAST(ROUND(SQRT(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE)
        |      * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE)))
        |    * 1000000) AS BIGINT) AS fisher_e6
        |FROM agg""".stripMargin,
    // Same exact integer decile ladder, exact cents censuses, two
    // mirrored share divisions per decile row.
    "q376_lorenz_curve" ->
      """WITH cust AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY o_custkey),
        |ranked AS (
        |  SELECT rev,
        |         (ROW_NUMBER() OVER (ORDER BY rev ASC, o_custkey) - 1)
        |           * 10 // (SELECT COUNT(*) FROM cust) + 1 AS decile,
        |         (SELECT CAST(SUM(rev) AS BIGINT) FROM cust) AS tot
        |  FROM cust),
        |dec AS (
        |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(rev) AS BIGINT) AS rev_cents,
        |         CAST(MAX(tot) AS BIGINT) AS t
        |  FROM ranked GROUP BY decile)
        |SELECT CAST(decile AS BIGINT) AS decile, n_customers, rev_cents,
        |  CAST(ROUND(CAST(rev_cents AS DOUBLE) / CAST(t AS DOUBLE)
        |    * 1000000) AS BIGINT) AS share_e6,
        |  CAST(ROUND(CAST(SUM(rev_cents) OVER (ORDER BY decile
        |      ROWS UNBOUNDED PRECEDING) AS DOUBLE) / CAST(t AS DOUBLE)
        |    * 1000000) AS BIGINT) AS lorenz_e6
        |FROM dec ORDER BY decile""".stripMargin,
    // Same grid, same exact deviation moments as q334, per-lag e12
    // gridded summands summed exactly, one mirrored Q chain.
    "q359_ljung_box" ->
      s"""WITH $gridCte,
         |${lagCte(7)},
         |terms AS (
         |  SELECT lag, n.n, d.den,
         |    CASE WHEN d.den > 0 THEN
         |      CAST(ROUND(CAST(num AS DOUBLE) / CAST(d.den AS DOUBLE)
         |        * 1000000) AS BIGINT) END AS acf_e6,
         |    CASE WHEN d.den > 0 THEN
         |      CAST(ROUND(CAST(num AS DOUBLE) / CAST(d.den AS DOUBLE)
         |        * (CAST(num AS DOUBLE) / CAST(d.den AS DOUBLE))
         |        / CAST(n.n - lag AS DOUBLE)
         |        * 1000000000000) AS BIGINT) END AS term_e12
         |  FROM nums CROSS JOIN den d CROSS JOIN mom n),
         |cums AS (
         |  SELECT lag, n, acf_e6,
         |         SUM(term_e12) OVER (ORDER BY lag
         |                             ROWS UNBOUNDED PRECEDING) AS cum
         |  FROM terms)
         |SELECT lag, n AS n_days, acf_e6,
         |  CAST(ROUND(CAST(n AS DOUBLE) * CAST(n + 2 AS DOUBLE)
         |    * CAST(cum AS DOUBLE) / 1000000000000.0 * 1000000) AS BIGINT)
         |    AS q_e6
         |FROM cums ORDER BY lag""".stripMargin,
    // Same exact moments, same mirrored r_k divisions, the identical
    // unrolled Durbin-Levinson chain (every product/sum in the same
    // order), e6 grid at output only.
    "q360_pacf" ->
      s"""WITH $gridCte,
         |${lagCte(5)},
         |one AS (
         |  SELECT d.n, d.den,
         |         MAX(CASE WHEN lag = 1 THEN num END) AS num1,
         |         MAX(CASE WHEN lag = 2 THEN num END) AS num2,
         |         MAX(CASE WHEN lag = 3 THEN num END) AS num3,
         |         MAX(CASE WHEN lag = 4 THEN num END) AS num4,
         |         MAX(CASE WHEN lag = 5 THEN num END) AS num5
         |  FROM nums CROSS JOIN den d GROUP BY d.n, d.den),
         |r AS (
         |  SELECT n,
         |    CASE WHEN den > 0 THEN CAST(num1 AS DOUBLE) / CAST(den AS DOUBLE) END AS r1,
         |    CASE WHEN den > 0 THEN CAST(num2 AS DOUBLE) / CAST(den AS DOUBLE) END AS r2,
         |    CASE WHEN den > 0 THEN CAST(num3 AS DOUBLE) / CAST(den AS DOUBLE) END AS r3,
         |    CASE WHEN den > 0 THEN CAST(num4 AS DOUBLE) / CAST(den AS DOUBLE) END AS r4,
         |    CASE WHEN den > 0 THEN CAST(num5 AS DOUBLE) / CAST(den AS DOUBLE) END AS r5
         |  FROM one),
         |l1 AS (SELECT *, r1 AS p11 FROM r),
         |l2 AS (SELECT *,
         |         (r2 - p11 * r1) / (1.0 - p11 * r1) AS p22 FROM l1),
         |l2b AS (SELECT *, p11 - p22 * p11 AS p21 FROM l2),
         |l3 AS (SELECT *,
         |         (r3 - (p21 * r2 + p22 * r1))
         |           / (1.0 - (p21 * r1 + p22 * r2)) AS p33 FROM l2b),
         |l3b AS (SELECT *, p21 - p33 * p22 AS p31,
         |                  p22 - p33 * p21 AS p32 FROM l3),
         |l4 AS (SELECT *,
         |         (r4 - (p31 * r3 + p32 * r2 + p33 * r1))
         |           / (1.0 - (p31 * r1 + p32 * r2 + p33 * r3)) AS p44
         |       FROM l3b),
         |l4b AS (SELECT *, p31 - p44 * p33 AS p41,
         |                  p32 - p44 * p32 AS p42,
         |                  p33 - p44 * p31 AS p43 FROM l4),
         |l5 AS (SELECT *,
         |         (r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))
         |           / (1.0 - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4))
         |           AS p55
         |       FROM l4b)
         |SELECT lag, n AS n_days,
         |  CAST(ROUND(pf * 1000000) AS BIGINT) AS pacf_e6
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS lag, n, p11 AS pf FROM l5
         |  UNION ALL SELECT 2, n, p22 FROM l5
         |  UNION ALL SELECT 3, n, p33 FROM l5
         |  UNION ALL SELECT 4, n, p44 FROM l5
         |  UNION ALL SELECT 5, n, p55 FROM l5)
         |ORDER BY lag""".stripMargin,
    // Same grid, exact n-scaled cumulative deviations, integer running
    // min and alarm compare, one mirrored PH_max/n division.
    "q361_page_hinkley" ->
      s"""WITH $gridCte,
         |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |                CAST(SUM(x) AS BIGINT) AS sx FROM grid),
         |cum AS (
         |  SELECT t, SUM(x) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
         |           AS cx
         |  FROM grid),
         |nm AS (
         |  SELECT t, n,
         |         CAST(n AS HUGEINT) * cx - (t + 1) * CAST(sx AS HUGEINT)
         |           AS nm
         |  FROM cum CROSS JOIN mom),
         |ph AS (
         |  SELECT t, n,
         |         nm - MIN(nm) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING)
         |           AS ph
         |  FROM nm)
         |SELECT CAST(MAX(n) AS BIGINT) AS n_days,
         |  CAST(ROUND(CAST(MAX(ph) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
         |    * 100) AS BIGINT) AS ph_max_e2,
         |  CAST(MIN(CASE WHEN ph > 50 * CAST(n AS HUGEINT) THEN t END)
         |    AS BIGINT) AS first_alarm_t,
         |  CAST(SUM(CASE WHEN ph > 50 * CAST(n AS HUGEINT) THEN 1 ELSE 0
         |           END) AS BIGINT) AS n_alarm_days
         |FROM ph""".stripMargin,
    // Same grid, three unrolled remove-the-argmax rounds, exact
    // deviation argmax with (dev DESC, t) tie-break, one mirrored G
    // chain per round.
    "q362_grubbs_scan" ->
      s"""WITH $gridCte,
         |m1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |              CAST(SUM(x) AS BIGINT) AS sx,
         |              SUM(CAST(x AS HUGEINT) * x) AS sxx FROM grid),
         |r1 AS (SELECT t, x, n, sx, sxx,
         |              ABS(CAST(n AS HUGEINT) * x - sx) AS dev,
         |              ROW_NUMBER() OVER (
         |                ORDER BY ABS(CAST(n AS HUGEINT) * x - sx) DESC, t)
         |                AS rn
         |       FROM grid CROSS JOIN m1),
         |f1 AS (SELECT t, x FROM r1 WHERE rn <> 1),
         |m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |              CAST(SUM(x) AS BIGINT) AS sx,
         |              SUM(CAST(x AS HUGEINT) * x) AS sxx FROM f1),
         |r2 AS (SELECT t, x, n, sx, sxx,
         |              ABS(CAST(n AS HUGEINT) * x - sx) AS dev,
         |              ROW_NUMBER() OVER (
         |                ORDER BY ABS(CAST(n AS HUGEINT) * x - sx) DESC, t)
         |                AS rn
         |       FROM f1 CROSS JOIN m2),
         |f2 AS (SELECT t, x FROM r2 WHERE rn <> 1),
         |m3 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
         |              CAST(SUM(x) AS BIGINT) AS sx,
         |              SUM(CAST(x AS HUGEINT) * x) AS sxx FROM f2),
         |r3 AS (SELECT t, x, n, sx, sxx,
         |              ABS(CAST(n AS HUGEINT) * x - sx) AS dev,
         |              ROW_NUMBER() OVER (
         |                ORDER BY ABS(CAST(n AS HUGEINT) * x - sx) DESC, t)
         |                AS rn
         |       FROM f2 CROSS JOIN m3)
         |SELECT round, t_out, x_out, n_remaining,
         |  CAST(ROUND(CAST(dev AS DOUBLE) / CAST(n AS DOUBLE)
         |    / SQRT(CAST(CAST(n AS HUGEINT) * sxx
         |             - CAST(sx AS HUGEINT) * sx AS DOUBLE)
         |           / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
         |    * 1000000) AS BIGINT) AS g_e6
         |FROM (
         |  SELECT CAST(1 AS BIGINT) AS round, t AS t_out, x AS x_out,
         |         n AS n_remaining, n, sx, sxx, dev FROM r1 WHERE rn = 1
         |  UNION ALL
         |  SELECT 2, t, x, n, n, sx, sxx, dev FROM r2 WHERE rn = 1
         |  UNION ALL
         |  SELECT 3, t, x, n, n, sx, sxx, dev FROM r3 WHERE rn = 1)
         |ORDER BY round""".stripMargin,
    // Same exact month arithmetic, cents, cohort triangle windows,
    // one mirrored share division.
    "q363_cohort_ltv" ->
      """WITH o AS (
        |  SELECT o_custkey AS c,
        |         CAST(EXTRACT(YEAR FROM CAST(o_orderdate AS DATE)) * 12
        |           + EXTRACT(MONTH FROM CAST(o_orderdate AS DATE)) - 1
        |           AS BIGINT) AS ym,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders),
        |coh AS (SELECT c, MIN(ym) AS cohort FROM o GROUP BY c),
        |cell AS (
        |  SELECT cohort, ym - cohort AS idx,
        |         CAST(SUM(cents) AS BIGINT) AS rev_cents,
        |         CAST(COUNT(DISTINCT o.c) AS BIGINT) AS n_customers
        |  FROM o JOIN coh ON coh.c = o.c
        |  GROUP BY cohort, ym - cohort),
        |wins AS (
        |  SELECT cohort, idx, n_customers, rev_cents,
        |         SUM(rev_cents) OVER (PARTITION BY cohort ORDER BY idx
        |                              ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(rev_cents) OVER (PARTITION BY cohort) AS tot
        |  FROM cell)
        |SELECT cohort AS cohort_ym, idx, n_customers, rev_cents,
        |       CAST(cum AS BIGINT) AS cum_cents,
        |       CAST(ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE)
        |         * 1000000) AS BIGINT) AS cum_share_e6
        |FROM wins ORDER BY cohort_ym, idx""".stripMargin,
    // q287's exact ABC cross-multiplication verbatim + the exact
    // cross-multiplied CV² class; zero-month-free moments; one
    // mirrored share chain.
    "q364_abc_xyz" ->
      """WITH li AS (
        |  SELECT l_partkey,
        |         CAST(EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) * 12
        |           + EXTRACT(MONTH FROM CAST(l_shipdate AS DATE)) - 1
        |           AS BIGINT) AS ym,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |           AS BIGINT) AS cents,
        |         CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem),
        |monthly AS (
        |  SELECT l_partkey, ym, CAST(SUM(q) AS BIGINT) AS mq,
        |         CAST(SUM(cents) AS BIGINT) AS mcents
        |  FROM li GROUP BY 1, 2),
        |per AS (
        |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS m,
        |         CAST(SUM(mcents) AS BIGINT) AS x,
        |         CAST(SUM(mq) AS BIGINT) AS sq,
        |         SUM(CAST(mq AS HUGEINT) * mq) AS sqq
        |  FROM monthly GROUP BY 1),
        |cls AS (
        |  SELECT x, m, SUM(x) OVER () AS tot,
        |         (SUM(x) OVER (ORDER BY x DESC, l_partkey
        |                       ROWS UNBOUNDED PRECEDING) - x)
        |           * CAST(100 AS HUGEINT) AS bef,
        |         CAST(m AS HUGEINT)
        |           * (CAST(m AS HUGEINT) * sqq - CAST(sq AS HUGEINT) * sq)
        |           AS cv2num,
        |         CAST(m - 1 AS HUGEINT) * (CAST(sq AS HUGEINT) * sq)
        |           AS cv2den
        |  FROM per),
        |lab AS (
        |  SELECT x, tot,
        |         CASE WHEN bef < CAST(tot AS HUGEINT) * 80 THEN 'A'
        |              WHEN bef < CAST(tot AS HUGEINT) * 95 THEN 'B'
        |              ELSE 'C' END AS abc,
        |         CASE WHEN m <= 1 THEN 'Z'
        |              WHEN cv2num * 3 <= cv2den THEN 'X'
        |              WHEN cv2num * 2 <= cv2den THEN 'Y'
        |              ELSE 'Z' END AS xyz
        |  FROM cls)
        |SELECT abc, xyz, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |       CAST(SUM(x) AS BIGINT) AS rev_cents,
        |       CAST(ROUND(CAST(SUM(x) AS DOUBLE) * 100
        |         / CAST(MAX(tot) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS share_e6
        |FROM lab GROUP BY abc, xyz ORDER BY abc, xyz""".stripMargin,
    // Same (custkey, $10k band) blocking key, same in-block ±30-day
    // filter, exact integer censuses by week of gap.
    "q365_dup_invoices" ->
      """WITH o AS (
        |  SELECT o_custkey AS c,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS p,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           // 1000000 AS pb,
        |         CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS d,
        |         o_orderkey AS k
        |  FROM orders)
        |SELECT ABS(a.d - b.d) // 7 AS gap_weeks,
        |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |       CAST(COUNT(DISTINCT a.c) AS BIGINT) AS n_customers,
        |       CAST(SUM(ABS(a.p - b.p)) AS BIGINT) AS abs_diff_cents
        |FROM o a JOIN o b ON b.c = a.c AND b.pb = a.pb
        |WHERE a.k < b.k AND ABS(a.d - b.d) <= 30
        |GROUP BY 1 ORDER BY gap_weeks""".stripMargin,
    // Same zero-filled grid, closed-form Σt/Σt², HUGEINT prefix
    // moments, Cauchy-Schwarz RSS numerators, mirrored F chain,
    // (f_e6 DESC, split_t) top-5.
    "q348_chow_break" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT g.day - s.d0 AS t, COALESCE(d.x, 0) AS x
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day
        |        FROM span) g
        |  CROSS JOIN span s
        |  LEFT JOIN daily d ON d.day = g.day),
        |cums AS (
        |  SELECT t, x,
        |         SUM(x) OVER w AS cx,
        |         SUM(CAST(x AS HUGEINT) * x) OVER w AS cxx,
        |         SUM(CAST(t AS HUGEINT) * x) OVER w AS ctx
        |  FROM grid
        |  WINDOW w AS (ORDER BY t ROWS UNBOUNDED PRECEDING)),
        |tot AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sxn,
        |         SUM(CAST(x AS HUGEINT) * x) AS sxxn,
        |         SUM(CAST(t AS HUGEINT) * x) AS stxn
        |  FROM grid),
        |cand AS (
        |  SELECT t + 1 AS split_t, n, cx, cxx, ctx, sxn, sxxn, stxn,
        |         n - (t + 1) AS m2,
        |         CAST(t AS HUGEINT) * (t + 1) // 2 AS st1,
        |         CAST(t AS HUGEINT) * (t + 1) * (2 * t + 1) // 6 AS stt1,
        |         CAST(n - 1 AS HUGEINT) * n // 2 AS stn,
        |         CAST(n - 1 AS HUGEINT) * n * (2 * n - 1) // 6 AS sttn
        |  FROM cums CROSS JOIN tot
        |  WHERE t + 1 >= 8 AND n - (t + 1) >= 8),
        |d AS (
        |  SELECT split_t, n, m2,
        |    CAST(split_t AS HUGEINT) * cxx
        |      - CAST(cx AS HUGEINT) * cx AS dxx1,
        |    CAST(split_t AS HUGEINT) * stt1 - st1 * st1 AS dtt1,
        |    CAST(split_t AS HUGEINT) * ctx - st1 * cx AS dtx1,
        |    CAST(m2 AS HUGEINT) * (sxxn - cxx)
        |      - CAST(sxn - cx AS HUGEINT) * (sxn - cx) AS dxx2,
        |    CAST(m2 AS HUGEINT) * (sttn - stt1)
        |      - (stn - st1) * (stn - st1) AS dtt2,
        |    CAST(m2 AS HUGEINT) * (stxn - ctx)
        |      - (stn - st1) * CAST(sxn - cx AS HUGEINT) AS dtx2,
        |    CAST(n AS HUGEINT) * sxxn
        |      - CAST(sxn AS HUGEINT) * sxn AS dxxn,
        |    CAST(n AS HUGEINT) * sttn - stn * stn AS dttn,
        |    CAST(n AS HUGEINT) * stxn
        |      - stn * CAST(sxn AS HUGEINT) AS dtxn
        |  FROM cand),
        |r AS (
        |  SELECT split_t, n, m2, dtx1, dtt1, dtx2, dtt2,
        |    CAST(dxx1 * dtt1 - dtx1 * dtx1 AS DOUBLE)
        |      / CAST(CAST(split_t AS HUGEINT) * dtt1 AS DOUBLE) AS rss1,
        |    CAST(dxx2 * dtt2 - dtx2 * dtx2 AS DOUBLE)
        |      / CAST(CAST(m2 AS HUGEINT) * dtt2 AS DOUBLE) AS rss2,
        |    CAST(dxxn * dttn - dtxn * dtxn AS DOUBLE)
        |      / CAST(CAST(n AS HUGEINT) * dttn AS DOUBLE) AS rssf
        |  FROM d),
        |f AS (
        |  SELECT CAST(split_t AS BIGINT) AS split_t,
        |         CAST(n AS BIGINT) AS n_days,
        |         CASE WHEN rss1 + rss2 > 0.0 THEN
        |           CAST(ROUND((rssf - rss1 - rss2) / 2.0 /
        |             ((rss1 + rss2) / CAST(n - 4 AS DOUBLE)) * 1000000)
        |             AS BIGINT)
        |         END AS f_e6,
        |         CAST(ROUND(CAST(dtx1 AS DOUBLE) / CAST(dtt1 AS DOUBLE)
        |           * 1000000) AS BIGINT) AS slope_l_e6,
        |         CAST(ROUND(CAST(dtx2 AS DOUBLE) / CAST(dtt2 AS DOUBLE)
        |           * 1000000) AS BIGINT) AS slope_r_e6
        |  FROM r)
        |SELECT split_t, n_days, f_e6, slope_l_e6, slope_r_e6
        |FROM f WHERE f_e6 IS NOT NULL
        |ORDER BY f_e6 DESC, split_t LIMIT 5""".stripMargin,
    // Same (user,type) first-occurrence collapse, strict
    // min(A) < min(B) precedence test, exact censuses, three
    // mirrored divisions.
    "q349_subseq_support" ->
      """WITH ut AS (
        |  SELECT user_id, event_type,
        |         MIN(epoch_us(CAST(ts AS TIMESTAMP))) AS mn
        |  FROM events GROUP BY user_id, event_type),
        |pt AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS nu
        |  FROM ut GROUP BY event_type),
        |nn AS (
        |  SELECT CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n FROM ut),
        |pairs AS (
        |  SELECT a.event_type AS type_a, b.event_type AS type_b,
        |         CAST(COUNT(*) AS BIGINT) AS n_both,
        |         CAST(SUM(CASE WHEN a.mn < b.mn THEN 1 ELSE 0 END)
        |              AS BIGINT) AS n_ordered
        |  FROM ut a JOIN ut b ON a.user_id = b.user_id
        |                     AND a.event_type <> b.event_type
        |  GROUP BY a.event_type, b.event_type)
        |SELECT type_a, type_b,
        |       pa.nu AS n_a, pb.nu AS n_b, n_both, n_ordered,
        |       CAST(ROUND(CAST(n_ordered AS DOUBLE) / CAST(n AS DOUBLE)
        |         * 1000000) AS BIGINT) AS support_e6,
        |       CAST(ROUND(CAST(n_ordered AS DOUBLE) / CAST(pa.nu AS DOUBLE)
        |         * 1000000) AS BIGINT) AS confidence_e6,
        |       CAST(ROUND(CAST(CAST(n_ordered AS HUGEINT) * n AS DOUBLE)
        |         / CAST(CAST(pa.nu AS HUGEINT) * pb.nu AS DOUBLE)
        |         * 1000000) AS BIGINT) AS lift_e6
        |FROM pairs
        |JOIN pt pa ON pa.event_type = type_a
        |JOIN pt pb ON pb.event_type = type_b
        |CROSS JOIN nn
        |ORDER BY type_a, type_b""".stripMargin,
    // Same user-keyed gaps, 4× threshold fan-out, (thr,user,sid)
    // session frames, exact lower median, two mirrored rates.
    "q350_session_curve" ->
      """WITH ev AS (
        |  SELECT user_id, event_id,
        |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
        |  FROM events),
        |g AS (
        |  SELECT user_id, event_id, us,
        |         us - LAG(us) OVER (PARTITION BY user_id
        |                            ORDER BY us, event_id) AS gap
        |  FROM ev),
        |x AS (
        |  SELECT t.thr_hr, g.user_id, g.event_id, g.us,
        |         CASE WHEN g.gap IS NULL
        |                   OR g.gap > t.thr_hr * 3600 * 1000000
        |              THEN 1 ELSE 0 END AS brk
        |  FROM g CROSS JOIN
        |    (SELECT CAST(UNNEST([1, 6, 24, 72]) AS BIGINT) AS thr_hr) t),
        |sid AS (
        |  SELECT thr_hr, user_id, us,
        |         SUM(brk) OVER (PARTITION BY thr_hr, user_id
        |                        ORDER BY us, event_id
        |                        ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM x),
        |sess AS (
        |  SELECT thr_hr, user_id, sid,
        |         CAST(COUNT(*) AS BIGINT) AS n_ev,
        |         CAST(MAX(us) - MIN(us) AS BIGINT) AS dur_us
        |  FROM sid GROUP BY thr_hr, user_id, sid),
        |rk AS (
        |  SELECT thr_hr, user_id, n_ev, dur_us,
        |         ROW_NUMBER() OVER (PARTITION BY thr_hr
        |                            ORDER BY dur_us, user_id, sid) AS rn,
        |         COUNT(*) OVER (PARTITION BY thr_hr) AS ns
        |  FROM sess)
        |SELECT thr_hr,
        |       CAST(MAX(ns) AS BIGINT) AS n_sessions,
        |       CAST(ROUND(CAST(MAX(ns) AS DOUBLE)
        |         / CAST(COUNT(DISTINCT user_id) AS DOUBLE) * 1000000)
        |         AS BIGINT) AS sess_per_user_e6,
        |       CAST(ROUND(CAST(SUM(n_ev) AS DOUBLE)
        |         / CAST(MAX(ns) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS events_per_sess_e6,
        |       CAST(SUM(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_singleton,
        |       CAST(MIN(CASE WHEN rn * 2 >= ns THEN dur_us END) AS BIGINT)
        |         AS p50_dur_us
        |FROM rk GROUP BY thr_hr ORDER BY thr_hr""".stripMargin,
    // Same ≤50-row dose collapse, exact HUGEINT moments, one mirrored
    // signed-Z chain.
    "q351_cochran_armitage" ->
      """WITH g AS (
        |  SELECT CAST(l_quantity AS BIGINT) AS sc,
        |         CAST(COUNT(*) AS BIGINT) AS ni,
        |         CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
        |              AS BIGINT) AS ri
        |  FROM lineitem GROUP BY 1),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
        |         CAST(SUM(ni) AS BIGINT) AS nn,
        |         CAST(SUM(ri) AS BIGINT) AS rr,
        |         SUM(CAST(sc AS HUGEINT) * ni) AS sn,
        |         SUM(CAST(sc AS HUGEINT) * sc * ni) AS s2n,
        |         SUM(CAST(sc AS HUGEINT) * ri) AS tr
        |  FROM g)
        |SELECT nn AS n_rows, rr AS n_returned, n_groups,
        |  CASE WHEN rr > 0 AND rr < nn AND n_groups > 1 THEN
        |    CAST(ROUND(CAST(CAST(nn AS HUGEINT) * tr - sn * rr AS DOUBLE)
        |        * SQRT(CAST(nn AS DOUBLE))
        |        / SQRT(CAST(CAST(rr AS HUGEINT) * (nn - rr) *
        |            (CAST(nn AS HUGEINT) * s2n - sn * sn) AS DOUBLE))
        |        * 1000000) AS BIGINT)
        |  END AS z_e6
        |FROM m""".stripMargin,
    // Same exact cents rankings with brand tie-break, max-rank census
    // per depth, shared 0.9-power literals, gridded terms summed
    // exactly.
    "q352_rbo_rankshift" -> {
      s"""WITH rev AS (
         |  SELECT p.p_brand,
         |    CAST(SUM(CASE WHEN EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))
         |                       = 1996
         |             THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS r96,
         |    CAST(SUM(CASE WHEN EXTRACT(YEAR FROM CAST(l_shipdate AS DATE))
         |                       = 1997
         |             THEN CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
         |                       AS BIGINT) ELSE 0 END) AS BIGINT) AS r97
         |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
         |  WHERE EXTRACT(YEAR FROM CAST(l_shipdate AS DATE)) IN (1996, 1997)
         |  GROUP BY p.p_brand),
         |ranked AS (
         |  SELECT p_brand,
         |         GREATEST(
         |           ROW_NUMBER() OVER (ORDER BY r96 DESC, p_brand),
         |           ROW_NUMBER() OVER (ORDER BY r97 DESC, p_brand)) AS mx
         |  FROM rev),
         |ov AS (
         |  SELECT d.d,
         |         CAST(SUM(CASE WHEN r.p_brand IS NOT NULL THEN 1 ELSE 0 END)
         |              AS BIGINT) AS n_overlap
         |  FROM (SELECT CAST(UNNEST(range(1, 21)) AS BIGINT) AS d) d
         |  LEFT JOIN ranked r ON r.mx <= d.d
         |  GROUP BY d.d),
         |terms AS (
         |  SELECT d, n_overlap,
         |         CAST(ROUND(0.1 * CAST(($rboPowCase) AS DOUBLE)
         |           * CAST(n_overlap AS DOUBLE) / CAST(d AS DOUBLE)
         |           * 1000000000) AS BIGINT) AS term_e9
         |  FROM ov),
         |tot AS (SELECT CAST(SUM(term_e9) AS BIGINT) AS rbo_e9 FROM terms)
         |SELECT d, n_overlap, term_e9, rbo_e9
         |FROM terms CROSS JOIN tot ORDER BY d""".stripMargin
    })
}
