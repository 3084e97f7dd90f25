package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled

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
    val cand = cums.crossJoin(broadcast(tot))
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
      .crossJoin(broadcast(nUsers))
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
    * Scale: the lag window is user-keyed; the 4× threshold fan-out is
    * a constant factor; per-threshold session frames group on
    * (threshold, user, session) — all user-local. The rank window
    * rides the session frame (sessions ≪ events), and the output is
    * 4 rows.
    */
  def q350(s: SparkSession, dir: String): DataFrame = {
    val wLag = Window.partitionBy(col("user_id"))
      .orderBy(col("us"), col("event_id"))
    val base = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(wLag))
    val wSess = Window.partitionBy(col("thr_hr"), col("user_id"))
      .orderBy(col("us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val sess = base
      .withColumn("thr_hr",
        explode(array(lit(1L), lit(6L), lit(24L), lit(72L))))
      .withColumn("brk",
        when(col("gap").isNull ||
          col("gap") > col("thr_hr") * 3600L * 1000000L, 1L).otherwise(0L))
      .withColumn("sid", sum(col("brk")).over(wSess))
      .groupBy(col("thr_hr"), col("user_id"), col("sid"))
      .agg(count(lit(1)).as("n_ev"),
        (max(col("us")) - min(col("us"))).as("dur_us"))
    val wRank = Window.partitionBy(col("thr_hr"))
      .orderBy(col("dur_us"), col("user_id"), col("sid"))
    sess
      .withColumn("rn", row_number().over(wRank))
      .withColumn("ns",
        count(lit(1)).over(Window.partitionBy(col("thr_hr"))))
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
    terms.crossJoin(broadcast(tot)).orderBy("d")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q348_chow_break" -> (q348 _),
    "q349_subseq_support" -> (q349 _),
    "q350_session_curve" -> (q350 _),
    "q351_cochran_armitage" -> (q351 _),
    "q352_rbo_rankshift" -> (q352 _))

  val oracleSql: Map[String, String] = Map(
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
