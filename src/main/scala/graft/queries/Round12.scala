package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled
import graft.ops.GlobalStats

/** Round-12 analytics batch. Three threads:
  *
  *   1. The remaining schema-feasible TPC-H join shapes (Q8 market
  *      share, Q13 order-count distribution, Q14 promo share, Q17
  *      small-quantity decorrelation) — the join-breadth certificates
  *      beside q90/q177/q180/q203/q209/q215-q225.
  *   2. Global-order statistics that were previously impossible at
  *      scale, now riding [[graft.ops.TwoPhase.rankCum]] (this round's
  *      shared core): user-event concentration, per-source Spearman,
  *      exact global median/MAD robust outlier bands.
  *   3. Curation/sketch additions: bottom-k hash sampling with a
  *      Horvitz-Thompson-style total estimate, Benford first-digit
  *      audit, per-doc NLL outliers, retention triangle.
  *
  * Same float discipline as q331+: exact integer/decimal(38) moments up
  * to ONE mirrored double chain per output cell; DuckDB oracles spell
  * identical arithmetic; Round12Spec replays each driver-side.
  */
object Round12 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(dollars: Column): Column =
    (dollars.cast("decimal(18,2)") * 100).cast("long")

  private val d38 = "decimal(38,0)"

  /** q384 — TPC-H Q8 shape (national market share): within customers
    * of one REGION, the share of line revenue supplied by one NATION,
    * per order year — the two-nation-role join (customer nation bounds
    * the region filter, supplier nation is the measured dimension)
    * that exercises the deepest join tree in the schema: lineitem ⋈
    * part ⋈ supplier ⋈ orders ⋈ customer ⋈ nation×2 ⋈ region.
    *
    * Exactness: volume = extendedprice·(1−discount) in decimal(18,2)
    * arithmetic (discounts are exact 2-dp values; the q177 Q5
    * discipline) summed exactly; the share is ONE mirrored division
    * e6-gridded; revenue reported via round(·,2) like q177.
    *
    * Scale: the part filter (p_type = 'PROMO') prunes the probe side
    * FIRST (pushed to the scan); dims broadcast (nation/region/
    * supplier); lineitem⋈orders⋈customer ride keyed equi-joins (the
    * audited fact shape); output ≤ 7 year rows.
    */
  def q384(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
      .select("p_partkey")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val n1 = t(s, dir, "nation").select("n_nationkey", "n_regionkey")
    val r = t(s, dir, "region").filter(col("r_name") === "AMERICA")
      .select("r_regionkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey", "l_extendedprice",
        "l_discount")
    val volume = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("sn_key"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("o_year"))
      .agg(
        round(sum(when(col("supp_nation") === "NATION_3", volume)
          .otherwise(lit(0).cast("decimal(18,2)"))), 2)
          .cast("double").as("nation_volume"),
        round(sum(volume), 2).cast("double").as("total_volume"),
        intScaled(
          sum(when(col("supp_nation") === "NATION_3", volume)
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") /
            sum(volume).cast("double"),
          1000000L).as("mkt_share_e6"))
      .orderBy("o_year")
  }

  /** q385 — TPC-H Q13 shape (customer order-count distribution): LEFT
    * join customers to orders so zero-order customers survive, count
    * orders per customer, then census customers per order count — the
    * double-aggregation-over-outer-join certificate (the only TPC-H
    * query whose semantics REQUIRE the outer join; an inner join
    * silently drops the c_count = 0 row, which is the row analysts
    * read first).
    *
    * Exactness: entirely integer — counts of counts; no float exists.
    *
    * Scale: the join is custkey-keyed (AQE picks the strategy); the
    * first agg collapses to the customer dimension map-side; the
    * second rides the ≤ ~50-row count domain. Output is that domain.
    */
  def q385(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer").select("c_custkey")
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    c.join(o, col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("c_count"))
  }

  /** q386 — TPC-H Q14 shape (promo revenue share) per order year: the
    * percentage of line revenue from PROMO-type parts — the classic
    * conditional-aggregate-over-join certificate, reported as a yearly
    * series instead of Q14's single month so every year row exercises
    * the same arithmetic.
    *
    * Exactness: the q177/q384 decimal(18,2) volume discipline; exact
    * decimal sums; the share is ONE mirrored division scaled ×100,
    * e6-gridded.
    *
    * Scale: part side is key+type projection (broadcast-able dim);
    * lineitem joins part-keyed; one map-side-combined year agg; ≤ 7
    * rows out.
    */
  def q386(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").select(col("p_partkey"),
      (col("p_type") === "PROMO").as("is_promo"))
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        year(col("l_shipdate").cast("date")).cast("long").as("yr"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("volume"))
    l.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy(col("yr"))
      .agg(
        round(sum(when(col("is_promo"), col("volume"))
          .otherwise(lit(0).cast("decimal(18,2)"))), 2)
          .cast("double").as("promo_volume"),
        round(sum(col("volume")), 2).cast("double").as("total_volume"),
        intScaled(
          sum(when(col("is_promo"), col("volume"))
            .otherwise(lit(0).cast("decimal(18,2)"))).cast("double") * 100 /
            sum(col("volume")).cast("double"),
          1000000L).as("promo_share_e6"))
      .orderBy("yr")
  }

  /** q387 — TPC-H Q17 shape (small-quantity revenue): for one brand,
    * the revenue carried by lineitems whose quantity is below 20% of
    * that part's average quantity — the correlated-scalar-subquery
    * shape decorrelated into a per-part aggregate join (the q73
    * certificate at TPC-H's canonical site).
    *
    * Exactness: the quantity gate is the EXACT cross-multiplied
    * integer compare 5·q·n < Σq (l_quantity is whole-valued, cast
    * long; no division, no float ever near the boundary — a
    * 0.2·avg(qty) double could flip a line whose quantity sits exactly
    * on the threshold); revenue is exact cents; the per-year figure is
    * ONE mirrored division e4.
    *
    * Scale: the brand filter prunes part FIRST (pushed); the per-part
    * (Σq, n) agg collapses lineitem map-side BEFORE the join back (the
    * q180 semi-reduction discipline); output one row.
    */
  def q387(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir, "part").filter(col("p_brand") === "Brand#13")
      .select("p_partkey")
    val l = t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_quantity").cast("long").as("q"),
        cents(col("l_extendedprice")).as("c"))
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .localCheckpoint(true) // branched: per-part agg AND the line probe
    val per = l.groupBy(col("l_partkey"))
      .agg(sum(col("q")).as("sq"), count(lit(1)).as("nq"))
    l.join(per, "l_partkey")
      .filter(col("q") * 5 * col("nq") < col("sq"))
      .agg(count(lit(1)).as("n_lines"), sum(col("c")).as("cents"))
      .select(col("n_lines"), col("cents"),
        intScaled(col("cents").cast("double") / 100.0 / 7.0, 10000L)
          .as("avg_yearly_e4"))
  }

  /** q388 — user event concentration: the share of all events produced
    * by the top 1% / 5% / 10% / 50% most-active users — the power-user
    * concentration read (the event-log sibling of q277's Pareto and
    * q332's Gini: those read revenue; operations teams read TRAFFIC
    * concentration to size rate limits and abuse thresholds). First
    * production use of [[graft.ops.TwoPhase.rankCum]] on a NEW query:
    * the user dimension is ranked with no single-task sort.
    *
    * Exactness: band membership is the exact cross-multiplied compare
    * rn·100 ≤ band·n (never a percentile double); censuses are exact;
    * the share is ONE mirrored division e6.
    *
    * Scale: events collapse map-side to the user dimension; the rank
    * rides TwoPhase (HDR buckets + broadcast prefix offsets); the 4×
    * band explode rides the ranked dimension into a map-side-combined
    * 4-row agg. Output 4 rows.
    */
  def q388(s: SparkSession, dir: String): DataFrame = {
    val u = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val ranked = graft.ops.TwoPhase.rankCum(u, Nil, "cnt", "user_id",
      asc = false, rn = Some("rn"), n = Some("n"), tot = Some("tot"))
    ranked
      .withColumn("band_pct",
        explode(array(lit(1L), lit(5L), lit(10L), lit(50L))))
      .filter(col("rn") * 100 <= col("band_pct") * col("n"))
      .groupBy(col("band_pct"))
      .agg(count(lit(1)).as("n_users"), sum(col("cnt")).as("n_events"),
        max(col("tot")).as("t"))
      .select(col("band_pct"), col("n_users"), col("n_events"),
        intScaled(
          col("n_events").cast("double") / col("t").cast("double"),
          1000000L).as("event_share_e6"))
      .orderBy("band_pct")
  }

  /** q389 — Spearman rank correlation between document quality and
    * length, per source: does the q52 quality heuristic just re-read
    * length (its length factor saturates at 50 tokens — past that the
    * correlation is genuine signal, not construction)? The standard
    * sanity check before a quality score gates a corpus: a source
    * where ρ ≈ 1 means the "quality" filter is a length filter there.
    * Both rank passes ride [[graft.ops.TwoPhase.rankCum]] partitioned
    * by source — a per-source dimension rank with no single-task sort.
    *
    * Exactness: ranks are row_number over the (value, doc_id) total
    * order (the documented ties-broken-by-key Spearman convention —
    * not average-rank; both engines spell the identical order);
    * quality lands on the e6 grid BEFORE ranking (rounding margins
    * spec-measured, q134 pattern); Σd² is exact decimal(38); ρ = 1 −
    * 6Σd²/(n(n²−1)) is ONE mirrored chain e6; n ≤ 1 guards to NULL.
    *
    * Scale: one map-side projection to (source, doc, score, len);
    * two TwoPhase passes over the doc dimension; source-frame output.
    */
  def q389(s: SparkSession, dir: String): DataFrame = {
    import graft.ext.TextAnalysis.{qualityScore, tokenCount}
    val d = t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        intScaled(qualityScore(col("text")), 1000000L).as("score_e6"),
        tokenCount(col("text")).cast("long").as("n_tokens"))
    val r2 = graft.ops.TwoPhase.rankMulti(d, Seq("source"),
      Seq(("score_e6", "doc_id", true, "rq"),
        ("n_tokens", "doc_id", true, "rl")))
    r2.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(((col("rq") - col("rl")) * (col("rq") - col("rl"))).cast(d38))
          .as("sd2"))
      .select(col("source"), col("n_docs"),
        when(col("n_docs") > 1L, intScaled(
          lit(1.0) - lit(6.0) * col("sd2").cast("double") /
            (col("n_docs").cast("double") *
              (col("n_docs").cast("double") * col("n_docs").cast("double")
                - 1.0)),
          1000000L)).as("spearman_e6"))
      .orderBy("source")
  }

  /** q390 — exact global median + MAD robust outlier bands over order
    * totals: the median/MAD pair is THE robust location/scale read
    * (q238 winsorizes on approximate quantiles; q193's z-scores assume
    * Gaussian moments — MAD survives both heavy tails and 50%
    * contamination), and the |x−med| > 2·MAD / 3·MAD censuses are the
    * robust outlier counts an anomaly review quotes. BOTH medians are
    * EXACT order statistics over the full order dimension, each via
    * [[graft.ops.TwoPhase.rankCum]] — the query that was structurally
    * impossible under a single-task sort at the 100-TB design point.
    *
    * Exactness: the LOWER median convention rn = (n+1) div 2 (an exact
    * selection, no interpolation — both engines spell the identical
    * rank pick); deviations, MAD, and band censuses are exact integers
    * end to end. NO float exists in this query.
    *
    * Scale: two TwoPhase passes over the order dimension (each
    * checkpointed once); the median/MAD frames are limit(1) by
    * construction (the BNL net's structural bound); censuses are
    * map-side-combined one-row aggs.
    */
  def q390(s: SparkSession, dir: String): DataFrame = {
    // r18 (guide §2.4): the two rankCum passes ranked EVERY order
    // twice (full-frame broadcast-join + bucket window each) only to
    // FILTER to the one median/MAD row, and each ranked frame was
    // checkpointed order-sized. TwoPhase.kth locates the k-th element
    // from the bucket census and ranks only the ONE hit bucket
    // (~1/#buckets of the frame); the dev/census passes re-read the
    // cheap parquet projection instead of an order-sized checkpoint.
    // The pick semantics are rankCum's exactly — same (v asc, tie asc)
    // order, same lower-median k = (n+1) div 2 (TwoPhaseSpec pins
    // kth ≡ rankCum-filter) — so the declared result is unchanged.
    val o = t(s, dir, "orders")
      .select(col("o_orderkey").as("k"), cents(col("o_totalprice")).as("x"))
    val lowerMedian = (c: Column) => shiftright(c + lit(1L), 1)
    val med = graft.ops.TwoPhase.kth(o, "x", "k", lowerMedian, "med")
    val dev = o.withGlobalStats(med)
      .select(col("k"), col("med"), abs(col("x") - col("med")).as("d"))
    val mad = graft.ops.TwoPhase.kth(dev, "d", "k", lowerMedian, "mad")
    dev.withGlobalStats(mad)
      .agg(count(lit(1)).as("n_orders"),
        max(col("med")).as("median_cents"),
        max(col("mad")).as("mad_cents"),
        sum(when(col("d") > col("mad") * 2, 1L).otherwise(0L)).as("n_gt2mad"),
        sum(when(col("d") > col("mad") * 3, 1L).otherwise(0L)).as("n_gt3mad"))
  }

  /** q391 — Benford first-digit audit of order totals: the observed
    * leading-digit distribution of o_totalprice (in cents) against
    * Benford's law p(d) = log₁₀(1+1/d), with the per-digit chi-square
    * contribution — the standard forensic-accounting screen (fabricated
    * amounts over-sample middle digits; q365 screens pairwise
    * double-billing, this screens the AGGREGATE digit shape).
    *
    * Exactness: the leading digit is an exact string head of the
    * positive integer cents (no log, no division anywhere near the
    * digit); censuses exact; expected share and the chi-square term
    * (o − n·p)²/(n·p) are ONE mirrored libm chain per digit row
    * (9 rows), e9/e6-gridded.
    *
    * Scale: one map-side digit projection + a 9-row census; everything
    * after rides the 9-row frame with the one-row total broadcast.
    */
  def q391(s: SparkSession, dir: String): DataFrame = {
    val census = t(s, dir, "orders")
      .select(cents(col("o_totalprice")).as("x"))
      .filter(col("x") > 0)
      .select(substring(col("x").cast("string"), 1, 1).cast("long").as("d"))
      .groupBy(col("d")).agg(count(lit(1)).as("n_d"))
    val tot = census.agg(sum(col("n_d")).as("n"))
    val p = log(lit(1.0) + lit(1.0) / col("d").cast("double")) / log(lit(10.0))
    census.withGlobalStats(tot)
      .select(col("d"), col("n_d"),
        intScaled(p, 1000000000L).as("benford_e9"),
        intScaled(col("n_d").cast("double") / col("n").cast("double"),
          1000000000L).as("observed_e9"),
        intScaled(
          (col("n_d").cast("double") - col("n").cast("double") * p) *
            (col("n_d").cast("double") - col("n").cast("double") * p) /
            (col("n").cast("double") * p),
          1000000L).as("chi2_term_e6"))
      .orderBy("d")
  }

  /** q393 — KMV (k-minimum-values) distinct-count sketch: per source,
    * estimate the distinct TRIGRAM-SHINGLE count (the near-dup shelf's
    * unit — ~1.1k distinct shingles per source here, vs the closed
    * ~31-word vocabulary where any sketch would be vacuous) from the
    * k-th smallest shingle hash — est = (k−1)·2⁵²/h₍ₖ₎ — read against
    * the exact distinct count. The FIFTH portable sketch beside HLL
    * (q25/q97), CMS (q114), Bloom (q346) and HDR (q378), and a
    * different estimator family from HLL: KMV keeps k exact hash
    * VALUES (mergeable by keeping the k smallest of any union — the
    * distributed shape), and supports set operations HLL registers
    * cannot (intersection via the combined sketch). k = 64.
    *
    * Exactness: hashes are the q154 52-bit md5 prefix (exact longs,
    * deterministic); the k-th pick is the (h, shingle) total order;
    * the estimate is ONE mirrored chain 63·2⁵²/h₆₄ rounded to an
    * integer, and the relative error is a second chain off that
    * INTEGER (the q392 two-stage grid); sources with fewer than k
    * distinct shingles guard to NULL (the sketch would be exact
    * there anyway).
    *
    * Scale: one (source, shingle) distinct collapse map-side (the
    * audited q107 shingle shape); the rank window rides the
    * per-source distinct-shingle frame; the production form keeps a
    * 64-value bounded heap per partition and merges — no corpus-sized
    * state anywhere.
    */
  def q393(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tok = t(s, dir, "documents")
      .select(col("source"), split(col("text"), " ").as("ws"))
      .select(col("source"),
        explode(graft.ext.Dedup.shinglesKAll(col("ws"), 3)).as("w"))
      .distinct()
      .select(col("source"), col("w"),
        conv(substring(md5(col("w")), 1, 13), 16, 10).cast("long").as("h"))
      .localCheckpoint(true) // branched: exact census AND the k-th pick
    val wRank = Window.partitionBy("source").orderBy(col("h"), col("w"))
    val kth = tok.withColumn("rn", row_number().over(wRank))
      .filter(col("rn") === 64).select(col("source"), col("h").as("hk"))
    val exact = tok.groupBy(col("source"))
      .agg(count(lit(1)).as("exact_distinct"))
    val est = intScaled(
      lit(63.0) * lit(4503599627370496.0) / col("hk").cast("double"), 1L)
    exact.join(kth, Seq("source"), "left")
      .select(col("source"), col("exact_distinct"),
        when(col("hk").isNotNull, est).as("kmv_est"),
        when(col("hk").isNotNull, intScaled(
          (est.cast("double") - col("exact_distinct").cast("double")) /
            col("exact_distinct").cast("double"),
          1000000L)).as("rel_err_e6"))
      .orderBy("source")
  }

  /** q397 — TPC-H Q15 shape (top supplier): per-supplier line revenue
    * over one quarter, then the supplier(s) holding the MAXIMUM — the
    * aggregate-then-argmax-against-a-global-scalar certificate (Q15's
    * VIEW + MAX subquery, decorrelated to a broadcast one-row max and
    * an exact decimal equality).
    *
    * Exactness: the q177 decimal(18,2) volume discipline; the argmax
    * compare is DECIMAL EQUALITY on exact sums (never a double — two
    * suppliers tied at the max both surface, as Q15 specifies);
    * revenue reported via round(·,2).
    *
    * Scale: the date filter pushes to the scan; one map-side-combined
    * supplier agg (checkpointed — branched into the max and the
    * filter); the max is a broadcast one-row frame; the supplier dim
    * broadcasts. Output = the argmax set (1 row here).
    */
  def q397(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "lineitem")
      .filter(col("l_shipdate").cast("date") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate").cast("date") < lit("1996-04-01").cast("date"))
      .select(col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("volume"))
      .groupBy(col("l_suppkey")).agg(sum(col("volume")).as("total"))
      .localCheckpoint(true) // branched: the max AND the argmax filter
    val mx = rev.agg(max(col("total")).as("mx"))
    rev.withGlobalStats(mx).filter(col("total") === col("mx"))
      .join(broadcast(t(s, dir, "supplier")
        .select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey").cast("long").as("s_suppkey"), col("s_name"),
        round(col("total"), 2).cast("double").as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** q398 — inter-event burstiness per event type: B = (σ−μ)/(σ+μ)
    * over each user's within-type inter-arrival gaps, pooled per type
    * — the Goh-Barabási burstiness coefficient (B → −1 periodic,
    * 0 Poisson, → +1 bursty) that q377 reads for TOKEN recurrence,
    * here read for BEHAVIOR: a type whose gaps are bursty is
    * session-driven, a periodic one is a scheduler.
    *
    * Exactness: gaps are exact epoch-µs integers off the user×type
    * lag (the µs floor carries the explicit negative-remainder
    * correction so Spark's truncating `div` equals DuckDB's flooring
    * `//` for ALL inputs, not just the post-1970 fixtures — the
    * q375/q395/q403 day-bucket discipline applied to µs);
    * moments are exact long/decimal(38); B reduces to
    * (√(nQ−S²) − S)/(√(nQ−S²) + S) — ONE shared √ of an exact integer
    * and one mirrored division, e6-gridded; the mean gap is one
    * mirrored division (decimal(38) headroom: gaps ≤ 2.6e12 µs,
    * squares 7e24 — Q overflows only past ~10¹³ gaps).
    *
    * Scale: the lag window is (user, type)-keyed — never a
    * type-partitioned window (5 types would serialize the stream
    * through 5 tasks); the census is a map-side-combined 5-row agg.
    */
  def q398(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us"), col("event_id"))
    val gaps = Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("event_type"),
        expr("ts div 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END)")
          .as("us"))
      .withColumn("gap", col("us") - lag(col("us"), 1).over(w))
      .filter(col("gap").isNotNull)
    val disc = sqrt((col("n_gaps").cast(d38) * col("qv") -
      col("sv").cast(d38) * col("sv")).cast("double"))
    gaps.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sv"),
        sum(col("gap").cast(d38) * col("gap")).as("qv"))
      .select(col("event_type"), col("n_gaps"),
        intScaled(
          col("sv").cast("double") / col("n_gaps").cast("double"), 1L)
          .as("mean_gap_us"),
        when(col("n_gaps") > 1L, intScaled(
          (disc - col("sv").cast("double")) /
            (disc + col("sv").cast("double")),
          1000000L)).as("burstiness_e6"))
      .orderBy("event_type")
  }

  /** q404 — top-decile persistence: are the heaviest users the SAME
    * users over time? Split the event span at its integer midpoint
    * day, rank users by activity within each half via
    * [[graft.ops.TwoPhase.rankMulti]], flag each half's top decile
    * (rn·10 ≤ n — exact cross-multiplication), and census the
    * overlap — q388 says traffic IS concentrated; this says whether
    * the concentration is a stable cohort (retention problem solved)
    * or churning whales (q352's rank-biased overlap asks this of
    * brand LEADERBOARDS; here it's the user base, with a set census
    * instead of a rank-weighted score).
    *
    * Exactness: the midpoint is an exact integer day off broadcast
    * min/max; per-half counts and decile flags are exact; Jaccard and
    * persistence are one mirrored division each, e6.
    *
    * Scale: events collapse map-side to (user, half) counts; both
    * decile ranks ride TwoPhase partitioned by half (no single-task
    * sort); the overlap census is a user-keyed self-agg; one-row
    * output.
    */
  def q404(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ev = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
    val span = ev.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val halves = ev.withGlobalStats(span)
      .select(col("user_id"),
        when(col("d") * 2 <= col("d0") + col("d1"), lit(0L)).otherwise(lit(1L))
          .as("half"))
      .groupBy(col("user_id"), col("half"))
      .agg(count(lit(1)).as("cnt"))
    val ranked = graft.ops.TwoPhase.rankCum(halves, Seq("half"), "cnt",
      "user_id", asc = false, rn = Some("rn"), n = Some("n"))
    val flags = ranked
      .select(col("user_id"), col("half"),
        (col("rn") * 10 <= col("n")).cast("long").as("top"))
      .groupBy(col("user_id"))
      .agg(max(when(col("half") === 0L, col("top")).otherwise(0L)).as("t0"),
        max(when(col("half") === 1L, col("top")).otherwise(0L)).as("t1"))
    flags.agg(
      sum(when(col("t0") === 1L && col("t1") === 1L, 1L).otherwise(0L))
        .as("n_both"),
      sum(when(col("t0") === 1L && col("t1") === 0L, 1L).otherwise(0L))
        .as("n_first_only"),
      sum(when(col("t0") === 0L && col("t1") === 1L, 1L).otherwise(0L))
        .as("n_second_only"))
      .select(col("n_both"), col("n_first_only"), col("n_second_only"),
        intScaled(col("n_both").cast("double") /
          (col("n_both") + col("n_first_only") + col("n_second_only"))
            .cast("double"), 1000000L).as("jaccard_e6"),
        intScaled(col("n_both").cast("double") /
          (col("n_both") + col("n_first_only")).cast("double"), 1000000L)
          .as("persistence_e6"))
  }

  /** q405 — hour-of-day activity profile per event type: the 24-cell
    * UTC-hour census with within-type shares and the exact-argmax peak
    * hour — the diurnal fingerprint (organic traffic has one; a
    * scheduler or bot swarm is flat or single-spiked; q398's
    * burstiness reads gap DISPERSION, this reads WHERE in the day the
    * mass sits).
    *
    * Exactness: the hour is an exact epoch floor — the hour index
    * carries the negative-remainder correction (Spark `div` truncates,
    * DuckDB `//` floors) and the `% 24` is sign-normalized
    * `((h % 24) + 24) % 24` in BOTH engines (each engine's `%` follows
    * the dividend sign), so the cell is identical by construction for
    * ALL inputs incl. pre-1970 timestamps; censuses exact; the share is
    * one mirrored division e6; the peak flag is the exact integer
    * argmax with the (n DESC ⇒ max-compare, hour ASC ⇒ min-hour-
    * among-maxima) tie convention spelled identically in both
    * engines.
    *
    * Scale: one map-side (type, hour) collapse to ≤ types×24 cells;
    * every window below rides that constant grid.
    */
  def q405(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        expr("((((ts div 3600000000000" +
          " - (CASE WHEN ts % 3600000000000 < 0 THEN 1 ELSE 0 END))" +
          " % 24) + 24) % 24)").as("hour"))
      .groupBy(col("event_type"), col("hour"))
      .agg(count(lit(1)).as("n"))
    val wType = Window.partitionBy("event_type")
    cells
      .withColumn("tot", sum(col("n")).over(wType))
      .withColumn("mx", max(col("n")).over(wType))
      .withColumn("peak_hour",
        min(when(col("n") === col("mx"), col("hour"))).over(wType))
      .select(col("event_type"), col("hour"), col("n"),
        intScaled(col("n").cast("double") / col("tot").cast("double"),
          1000000L).as("share_e6"),
        (col("hour") === col("peak_hour")).cast("long").as("is_peak"))
      .orderBy("event_type", "hour")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q384_tpch_q8" -> (q384 _),
    "q385_tpch_q13" -> (q385 _),
    "q386_tpch_q14" -> (q386 _),
    "q387_tpch_q17" -> (q387 _),
    "q388_event_concentration" -> (q388 _),
    "q389_quality_len_spearman" -> (q389 _),
    "q390_median_mad" -> (q390 _),
    "q391_benford" -> (q391 _),
    "q393_kmv_distinct" -> (q393 _),
    "q397_tpch_q15" -> (q397 _),
    "q398_event_burstiness" -> (q398 _),
    "q404_top_decile_persistence" -> (q404 _),
    "q405_hourly_profile" -> (q405 _),
  )

  val oracleSql: Map[String, String] = Map(
    // Same decimal(18,2) volume arithmetic, same conditional sum, same
    // e6 share grid.
    "q384_tpch_q8" ->
      """WITH v AS (
        |  SELECT CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
        |         CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        |         n2.n_name AS supp_nation
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        |  JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |  JOIN nation n2 ON s.s_nationkey = n2.n_nationkey
        |  JOIN orders o ON l.l_orderkey = o.o_orderkey
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n1 ON c.c_nationkey = n1.n_nationkey
        |  JOIN region r ON n1.n_regionkey = r.r_regionkey
        |  WHERE r.r_name = 'AMERICA')
        |SELECT o_year,
        |       CAST(ROUND(SUM(CASE WHEN supp_nation = 'NATION_3'
        |                           THEN volume ELSE CAST(0 AS DECIMAL(18,2))
        |                      END), 2) AS DOUBLE) AS nation_volume,
        |       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume,
        |       CAST(ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3'
        |                                THEN volume
        |                                ELSE CAST(0 AS DECIMAL(18,2)) END)
        |                       AS DOUBLE) /
        |                  CAST(SUM(volume) AS DOUBLE) * 1000000)
        |            AS BIGINT) AS mkt_share_e6
        |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin,
    "q385_tpch_q13" ->
      """WITH cc AS (
        |  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        |  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |  GROUP BY c.c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM cc GROUP BY c_count ORDER BY c_count""".stripMargin,
    "q386_tpch_q14" ->
      """WITH v AS (
        |  SELECT CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS BIGINT)
        |           AS yr,
        |         CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |           (1 - CAST(l.l_discount AS DECIMAL(18,2))) AS volume,
        |         p.p_type = 'PROMO' AS is_promo
        |  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey)
        |SELECT yr,
        |       CAST(ROUND(SUM(CASE WHEN is_promo THEN volume
        |                           ELSE CAST(0 AS DECIMAL(18,2)) END), 2)
        |            AS DOUBLE) AS promo_volume,
        |       CAST(ROUND(SUM(volume), 2) AS DOUBLE) AS total_volume,
        |       CAST(ROUND(CAST(SUM(CASE WHEN is_promo THEN volume
        |                                ELSE CAST(0 AS DECIMAL(18,2)) END)
        |                       AS DOUBLE) * 100 /
        |                  CAST(SUM(volume) AS DOUBLE) * 1000000)
        |            AS BIGINT) AS promo_share_e6
        |FROM v GROUP BY yr ORDER BY yr""".stripMargin,
    "q387_tpch_q17" ->
      """WITH l AS (
        |  SELECT l.l_partkey, CAST(l.l_quantity AS BIGINT) AS q,
        |         CAST(CAST(l.l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS c
        |  FROM lineitem l
        |  JOIN part p ON l.l_partkey = p.p_partkey
        |                 AND p.p_brand = 'Brand#13'),
        |per AS (
        |  SELECT l_partkey, SUM(q) AS sq, COUNT(*) AS nq
        |  FROM l GROUP BY l_partkey)
        |SELECT COUNT(*) AS n_lines, CAST(SUM(c) AS BIGINT) AS cents,
        |       CAST(ROUND(CAST(SUM(c) AS DOUBLE) / 100.0 / 7.0 * 10000)
        |            AS BIGINT) AS avg_yearly_e4
        |FROM l JOIN per USING (l_partkey)
        |WHERE q * 5 * nq < sq""".stripMargin,
    // Same (cnt DESC, user_id) total order, same cross-multiplied band
    // membership, same e6 share grid.
    "q388_event_concentration" ->
      """WITH u AS (
        |  SELECT user_id, COUNT(*) AS cnt FROM events GROUP BY user_id),
        |r AS (
        |  SELECT user_id, cnt,
        |         ROW_NUMBER() OVER (ORDER BY cnt DESC, user_id) AS rn,
        |         COUNT(*) OVER () AS n,
        |         CAST(SUM(cnt) OVER () AS BIGINT) AS t
        |  FROM u),
        |b AS (SELECT * FROM r
        |      CROSS JOIN (VALUES (1), (5), (10), (50)) v(band_pct)
        |      WHERE rn * 100 <= band_pct * n)
        |SELECT CAST(band_pct AS BIGINT) AS band_pct,
        |       COUNT(*) AS n_users,
        |       CAST(SUM(cnt) AS BIGINT) AS n_events,
        |       CAST(ROUND(CAST(SUM(cnt) AS DOUBLE) / MAX(t) * 1000000)
        |            AS BIGINT) AS event_share_e6
        |FROM b GROUP BY band_pct ORDER BY band_pct""".stripMargin,
    // q52's exact quality spelling gridded e6 BEFORE ranking; the same
    // (value, doc_id) row_number ranks; Σd² exact; one mirrored chain.
    "q389_quality_len_spearman" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(ROUND((1.0 -
        |           CAST(len(list_filter(string_split(text,' '),
        |                    w -> w IN ('a','the'))) AS DOUBLE)
        |           / len(string_split(text,' ')))
        |         * LEAST(CAST(len(string_split(text,' ')) AS DOUBLE) / 50.0,
        |                 1.0) * 1000000) AS BIGINT) AS score_e6,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |r AS (
        |  SELECT source,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY score_e6, doc_id) AS rq,
        |    ROW_NUMBER() OVER (PARTITION BY source
        |                       ORDER BY n_tokens, doc_id) AS rl
        |  FROM d)
        |SELECT source, COUNT(*) AS n_docs,
        |       CASE WHEN COUNT(*) > 1 THEN
        |         CAST(ROUND((1.0 - 6.0 *
        |                CAST(SUM((rq - rl) * (rq - rl)) AS DOUBLE) /
        |                (CAST(COUNT(*) AS DOUBLE) *
        |                 (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
        |                  - 1.0))) * 1000000) AS BIGINT)
        |       END AS spearman_e6
        |FROM r GROUP BY source ORDER BY source""".stripMargin,
    // Same lower-median rank picks ((n+1) // 2), exact integers only.
    "q390_median_mad" ->
      """WITH o AS (
        |  SELECT o_orderkey AS k,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS x
        |  FROM orders),
        |r1 AS (
        |  SELECT k, x, ROW_NUMBER() OVER (ORDER BY x, k) AS rn,
        |         COUNT(*) OVER () AS n
        |  FROM o),
        |med AS (SELECT x AS med FROM r1 WHERE rn = (n + 1) // 2),
        |dev AS (SELECT k, med, ABS(x - med) AS d FROM r1, med),
        |r2 AS (
        |  SELECT k, med, d, ROW_NUMBER() OVER (ORDER BY d, k) AS rn2,
        |         COUNT(*) OVER () AS n2
        |  FROM dev),
        |mad AS (SELECT d AS mad FROM r2 WHERE rn2 = (n2 + 1) // 2)
        |SELECT COUNT(*) AS n_orders, MAX(med) AS median_cents,
        |       MAX(mad) AS mad_cents,
        |       CAST(SUM(CASE WHEN d > 2 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_gt2mad,
        |       CAST(SUM(CASE WHEN d > 3 * mad THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_gt3mad
        |FROM r2, mad""".stripMargin,
    // Same string-head digit, same ln(1+1/d)/ln(10) chain, same grids.
    "q391_benford" ->
      """WITH c AS (
        |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                               * 100 AS BIGINT) AS VARCHAR), 1, 1)
        |              AS BIGINT) AS d
        |  FROM orders
        |  WHERE CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) > 0),
        |g AS (SELECT d, COUNT(*) AS n_d FROM c GROUP BY d),
        |t AS (SELECT CAST(SUM(n_d) AS BIGINT) AS n FROM g)
        |SELECT d, n_d,
        |       CAST(ROUND(ln(1.0 + 1.0 / d) / ln(10.0) * 1000000000)
        |            AS BIGINT) AS benford_e9,
        |       CAST(ROUND(CAST(n_d AS DOUBLE) / n * 1000000000) AS BIGINT)
        |         AS observed_e9,
        |       CAST(ROUND((n_d - n * (ln(1.0 + 1.0 / d) / ln(10.0))) *
        |                  (n_d - n * (ln(1.0 + 1.0 / d) / ln(10.0))) /
        |                  (n * (ln(1.0 + 1.0 / d) / ln(10.0))) * 1000000)
        |            AS BIGINT) AS chi2_term_e6
        |FROM g, t ORDER BY d""".stripMargin,
    // Same trigram shingles (the q107 CTE shape), same 52-bit hash,
    // same (h, shingle) rank pick, same two-stage grid.
    "q393_kmv_distinct" ->
      """WITH t AS (
        |  SELECT source, string_split(text, ' ') AS ws FROM documents),
        |tok AS (
        |  SELECT DISTINCT source,
        |    unnest(list_transform(range(1, len(ws) - 1),
        |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS w
        |  FROM t WHERE len(ws) >= 3),
        |h AS (
        |  SELECT source, w,
        |    CAST(('0x' || substr(md5(w), 1, 13)) AS BIGINT) AS h
        |  FROM tok),
        |r AS (
        |  SELECT source, h,
        |         ROW_NUMBER() OVER (PARTITION BY source ORDER BY h, w) AS rn
        |  FROM h),
        |kth AS (SELECT source, h AS hk FROM r WHERE rn = 64),
        |ex AS (SELECT source, COUNT(*) AS exact_distinct
        |       FROM h GROUP BY source)
        |SELECT ex.source, ex.exact_distinct,
        |  CASE WHEN kth.hk IS NOT NULL THEN
        |    CAST(ROUND(CAST(63 AS DOUBLE) * CAST(4503599627370496 AS DOUBLE)
        |               / CAST(kth.hk AS DOUBLE))
        |         AS BIGINT) END AS kmv_est,
        |  CASE WHEN kth.hk IS NOT NULL THEN
        |    CAST(ROUND((CAST(CAST(ROUND(CAST(63 AS DOUBLE) *
        |                      CAST(4503599627370496 AS DOUBLE) /
        |                      CAST(kth.hk AS DOUBLE)) AS BIGINT) AS DOUBLE) -
        |                CAST(ex.exact_distinct AS DOUBLE)) /
        |               CAST(ex.exact_distinct AS DOUBLE) * 1000000)
        |         AS BIGINT) END AS rel_err_e6
        |FROM ex LEFT JOIN kth USING (source)
        |ORDER BY ex.source""".stripMargin,
    // Same decimal volume, exact decimal max-equality argmax.
    "q397_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |             (1 - CAST(l_discount AS DECIMAL(18,2)))) AS total
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) < DATE '1996-04-01'
        |  GROUP BY l_suppkey),
        |mx AS (SELECT MAX(total) AS mx FROM rev)
        |SELECT CAST(s.s_suppkey AS BIGINT) AS s_suppkey, s.s_name,
        |       CAST(ROUND(rev.total, 2) AS DOUBLE) AS total_revenue
        |FROM rev CROSS JOIN mx
        |JOIN supplier s ON rev.l_suppkey = s.s_suppkey
        |WHERE rev.total = mx.mx
        |ORDER BY s_suppkey""".stripMargin,
    // Same (user, type) lag gaps, exact moments, the identical
    // (√(nQ−S²) − S)/(√(nQ−S²) + S) chain.
    "q398_event_burstiness" ->
      """WITH e AS (
        |  SELECT user_id, event_id, event_type,
        |         epoch_ns(ts) // 1000 AS us
        |  FROM events),
        |g AS (
        |  SELECT event_type,
        |         us - LAG(us) OVER (PARTITION BY user_id, event_type
        |                            ORDER BY us, event_id) AS gap
        |  FROM e),
        |m AS (
        |  SELECT event_type, COUNT(*) AS n_gaps,
        |         CAST(SUM(gap) AS BIGINT) AS sv,
        |         SUM(CAST(gap AS HUGEINT) * gap) AS qv
        |  FROM g WHERE gap IS NOT NULL GROUP BY event_type)
        |SELECT event_type, n_gaps,
        |  CAST(ROUND(CAST(sv AS DOUBLE) / CAST(n_gaps AS DOUBLE)) AS BIGINT)
        |    AS mean_gap_us,
        |  CASE WHEN n_gaps > 1 THEN
        |    CAST(ROUND((sqrt(CAST(n_gaps * qv - CAST(sv AS HUGEINT) * sv
        |                          AS DOUBLE)) - CAST(sv AS DOUBLE)) /
        |               (sqrt(CAST(n_gaps * qv - CAST(sv AS HUGEINT) * sv
        |                          AS DOUBLE)) + CAST(sv AS DOUBLE))
        |               * 1000000) AS BIGINT)
        |  END AS burstiness_e6
        |FROM m ORDER BY event_type""".stripMargin,
    // Same integer midpoint split, same (cnt DESC, user_id) decile
    // ranks, same cross-multiplied flags and mirrored set ratios.
    "q404_top_decile_persistence" ->
      """WITH e AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d
        |  FROM events),
        |sp AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM e),
        |h AS (
        |  SELECT user_id,
        |         CASE WHEN d * 2 <= d0 + d1 THEN 0 ELSE 1 END AS half,
        |         COUNT(*) AS cnt
        |  FROM e CROSS JOIN sp GROUP BY 1, 2),
        |r AS (
        |  SELECT user_id, half, cnt,
        |         ROW_NUMBER() OVER (PARTITION BY half
        |                            ORDER BY cnt DESC, user_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY half) AS n
        |  FROM h),
        |f AS (
        |  SELECT user_id,
        |    MAX(CASE WHEN half = 0 AND rn * 10 <= n THEN 1 ELSE 0 END) AS t0,
        |    MAX(CASE WHEN half = 1 AND rn * 10 <= n THEN 1 ELSE 0 END) AS t1
        |  FROM r GROUP BY user_id),
        |c AS (
        |  SELECT
        |    CAST(SUM(CASE WHEN t0 = 1 AND t1 = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_both,
        |    CAST(SUM(CASE WHEN t0 = 1 AND t1 = 0 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_first_only,
        |    CAST(SUM(CASE WHEN t0 = 0 AND t1 = 1 THEN 1 ELSE 0 END)
        |         AS BIGINT) AS n_second_only
        |  FROM f)
        |SELECT n_both, n_first_only, n_second_only,
        |  CAST(ROUND(CAST(n_both AS DOUBLE) /
        |             (n_both + n_first_only + n_second_only) * 1000000)
        |       AS BIGINT) AS jaccard_e6,
        |  CAST(ROUND(CAST(n_both AS DOUBLE) / (n_both + n_first_only)
        |             * 1000000) AS BIGINT) AS persistence_e6
        |FROM c""".stripMargin,
    // Same epoch hour, same grid windows, same min-hour-among-maxima
    // peak convention.
    "q405_hourly_profile" ->
      """WITH c AS (
        |  SELECT event_type,
        |         ((epoch_ns(ts) // 3600000000000) % 24 + 24) % 24 AS hour,
        |         COUNT(*) AS n
        |  FROM events GROUP BY 1, 2),
        |g AS (
        |  SELECT event_type, hour, n,
        |         CAST(SUM(n) OVER (PARTITION BY event_type) AS BIGINT) AS tot,
        |         MAX(n) OVER (PARTITION BY event_type) AS mx
        |  FROM c),
        |p AS (
        |  SELECT event_type, MIN(hour) AS peak_hour
        |  FROM g WHERE n = mx GROUP BY event_type)
        |SELECT g.event_type, g.hour, g.n,
        |  CAST(ROUND(CAST(g.n AS DOUBLE) / g.tot * 1000000) AS BIGINT)
        |    AS share_e6,
        |  CAST(CASE WHEN g.hour = p.peak_hour THEN 1 ELSE 0 END AS BIGINT)
        |    AS is_peak
        |FROM g JOIN p USING (event_type)
        |ORDER BY g.event_type, g.hour""".stripMargin,
  )
}
