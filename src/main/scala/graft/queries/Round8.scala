package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity
import graft.ops.GlobalStats

/** Round-8 certification queries: the remaining classic warehouse
  * shapes (TPC-H Q7 volume shipping, a Q9-style profit rollup) plus
  * three statistical data-quality audits a 100 TB ingest pipeline
  * runs continuously — Benford first-digit drift, a chi-square
  * independence screen, and lag-1 autocorrelation of the daily
  * revenue series with exact-decimal moment accumulation.
  */
object Round8 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Exact epoch-microseconds from the nanos-long events `ts`
    * (decimal division — the Tables.eventTs discipline, minus the
    * timestamp re-wrap we don't need for integer day math).
    */
  private def eventUs: Column =
    (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long")

  /** q203 — TPC-H Q7 shape (volume shipping): revenue moved between
    * two trading nations in either direction, by supplier nation ×
    * customer nation × ship year.
    *
    * Scale: the two broadcast nation dims cut supplier/customer to
    * the two trading nations BEFORE either touches the fact join, so
    * the big shuffles (lineitem⋈orders, ⋈customer, ⋈supplier) carry
    * only the ~2/25 nation slice. No forced broadcast on any
    * fact-side table — AQE sizes the filtered survivors at runtime.
    * Revenue is decimal(18,2)·decimal(18,2) (scale 4, exact) summed
    * exactly and emitted as e4 fixed-point — no float anywhere.
    */
  def q203(s: SparkSession, dir: String): DataFrame = {
    val n1 = t(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = t(s, dir, "nation")
      .filter(col("n_name").isin("NATION_1", "NATION_2"))
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
    val o = t(s, dir, "orders").select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
        col("l_shipdate") < lit("1998-01-01").cast("date"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate").cast("date")).cast("long").as("l_year"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
    l.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("rev")) * 10000).cast("long").as("rev_e4"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** q204 — Benford first-digit audit of `l_extendedprice`: the
    * classic fraud/corruption screen over a multiplicative price
    * population. The first SIGNIFICANT digit is read from the exact
    * cents integer's decimal string (shifting ×100 never changes the
    * leading digit), so digit extraction involves zero float math —
    * no `log10` bucketing near power-of-ten boundaries.
    *
    * Float discipline: observed shares are exact-integer ratios
    * (identical doubles both engines); the expected Benford share
    * `log10(1+1/d)` is the only library-function drift source, and
    * every digit's e6 rounding margin is ≥ 0.0094 (digit 9, spec-
    * pinned) — 5e-9 absolute vs ~1e-16 one-ulp libm drift, 7 orders
    * of headroom.
    *
    * Scale: one map-side substring + 9-group agg — fully partial-
    * aggregated; the output frame is 9 rows regardless of SF.
    */
  def q204(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("l_extendedprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val d = t(s, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
      .groupBy(col("digit"))
      .agg(count(lit(1)).as("n"))
    d.withGlobalStats(d.agg(sum(col("n")).as("total")))
      .select(col("digit"), col("n"),
        Similarity.intScaled(
          col("n").cast("double") / col("total").cast("double"),
          1000000L).as("obs_e6"),
        Similarity.intScaled(
          log(lit(1.0) + lit(1.0) / col("digit").cast("double")) /
            log(lit(10.0)),
          1000000L).as("exp_e6"))
      .withColumn("dev_e6", col("obs_e6") - col("exp_e6"))
      .orderBy("digit")
  }

  /** q205 — chi-square independence screen: is event type independent
    * of day-of-week? The contingency table (5 types × 7 days), each
    * cell with its expected count under independence and its χ²
    * contribution. Day-of-week is PORTABLE integer arithmetic —
    * `(epoch_day + 4) mod 7` (1970-01-01 was a Thursday; 0=Sunday) —
    * never an engine `dayofweek()` whose origin convention differs.
    *
    * Float discipline: O, row/col totals, N are exact integers; each
    * window sum casts to double BEFORE the row·col multiply (a Long×
    * Long product would silently wrap past 2⁶³ with ANSI off, while
    * DuckDB's HUGEINT sums multiply exactly — the engines would
    * diverge at extreme counts), and the oracle mirrors the same
    * cast-then-multiply shape so both engines compute identical
    * doubles. (O−E)²/E is the same arithmetic shape on those doubles —
    * deterministic with no library calls at all.
    *
    * Scale: one map-side (type, dow) agg collapses events to ≤35
    * cells; the windows ride that constant-size frame.
    */
  def q205(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      // Day bucket is integer floor division BY CONSTRUCTION (q190
      // discipline: `DIV`, not double-divide-then-truncate).
      .select(col("event_type"), eventUs.as("us"))
      .select(col("event_type"),
        ((expr("us DIV 86400000000") + 4) % 7).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val byType = Window.partitionBy(col("event_type"))
    val byDow = Window.partitionBy(col("dow"))
    val all = Window.partitionBy()
    val e = sum(col("o")).over(byType).cast("double") *
      sum(col("o")).over(byDow).cast("double") /
      sum(col("o")).over(all).cast("double")
    cells
      .select(col("event_type"), col("dow"), col("o"),
        Similarity.intScaled(e, 10000L).as("exp_e4"),
        Similarity.intScaled(
          (col("o").cast("double") - e) * (col("o").cast("double") - e) / e,
          10000L).as("chi2_e4"))
      .orderBy("event_type", "dow")
  }

  /** q206 — lag-1 autocorrelation of the daily order-revenue series:
    * the "is today predicted by yesterday" seasonality screen. All
    * five Pearson moments (Σx, Σy, Σxy, Σx², Σy²) accumulate as
    * EXACT decimals over exact whole-dollar daily revenue, so the
    * only doubles are the final six casts — identical in both
    * engines — and the closed-form r is the same expression shape on
    * identical inputs. `sqrt` is IEEE-exact (not libm), so the e6
    * value needs no drift margin at all.
    *
    * Scale: orders collapse map-side to the calendar-day frame
    * (~2.4k rows for 7 years); ONE single-partition window pairs
    * each day with the next (the q186/q170 calendar bound: windows
    * ride days, never orders). Decimal(38) moments survive any SF —
    * dollar sums-of-squares overflow BIGINT at sf≥1 but fit decimal
    * with 20 digits to spare.
    */
  def q206(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(col("o_orderdate").cast("date").as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("day"))
      // Whole dollars, truncated from exact cents: integer-exact and
      // 100× more headroom in the squared sums than cents.
      .agg(expr("CAST((CAST(SUM(p) * 100 AS BIGINT) DIV 100) AS DECIMAL(18,0))")
        .as("x"))
    val w = Window.orderBy(col("day"))
    val pairs = daily
      .select(col("x"), lead(col("x"), 1).over(w).as("y"))
      .filter(col("y").isNotNull)
    pairs
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x")).cast("decimal(38,0)").as("sx"),
        sum(col("y")).cast("decimal(38,0)").as("sy"),
        sum(col("x") * col("y")).cast("decimal(38,0)").as("sxy"),
        sum(col("x") * col("x")).cast("decimal(38,0)").as("sxx"),
        sum(col("y") * col("y")).cast("decimal(38,0)").as("syy"))
      .select(col("n_pairs"),
        Similarity.intScaled(
          (col("n_pairs").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            sqrt((col("n_pairs").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
              (col("n_pairs").cast("double") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))),
          1000000L).as("r1_e6"))
  }

  /** q207 — TPC-H Q9-style profit rollup: per supplier-nation × ship
    * year, gross margin = Σ(extprice·(1−disc) − retailprice·qty)
    * (retail price standing in for supply cost — the testdata has no
    * partsupp). Everything rides exact decimal (scales 4 and 2,
    * aligned at 4) and lands as e4 fixed-point.
    *
    * Scale: part⋈lineitem and supplier⋈lineitem are fact-sized
    * shuffle joins (no forced broadcast — part grows with SF); only
    * the 25-row nation dim broadcasts. Group-by collapses to
    * nations × years ≤ a few hundred rows.
    */
  def q207(s: SparkSession, dir: String): DataFrame = {
    val l = t(s, dir, "lineitem").select(
      col("l_partkey"), col("l_suppkey"),
      year(col("l_shipdate").cast("date")).cast("long").as("l_year"),
      (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("gross"),
      col("l_quantity").cast("decimal(18,0)").as("qty"))
    val p = t(s, dir, "part")
      .select(col("p_partkey"), col("p_retailprice").cast("decimal(18,2)").as("cost"))
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name")
    l.join(p, col("l_partkey") === col("p_partkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("l_year"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("gross") - col("cost") * col("qty")) * 10000)
          .cast("long").as("profit_e4"))
      .orderBy("n_name", "l_year")
  }

  /** q208 — TPC-H Q8 shape (national market share): per order year,
    * NATION_2 suppliers' share of all supplier revenue flowing to
    * ASIA-region customers.
    *
    * Float discipline: both revenue sums are exact decimal → exact e4
    * longs; the share is ONE division of the two identical exact
    * doubles — deterministic, no margin needed.
    *
    * Scale: the region filter rides a two-step broadcast (region →
    * nation → customer) so the customer slice shrinks before the fact
    * joins; the conditional nation sum avoids a second pass.
    */
  def q208(s: SparkSession, dir: String): DataFrame = {
    val asiaNations = t(s, dir, "nation")
      .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")
        .select("r_regionkey")), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("c_nk"))
    val cust = t(s, dir, "customer").select("c_custkey", "c_nationkey")
      .join(broadcast(asiaNations), col("c_nationkey") === col("c_nk"))
      .select("c_custkey")
    val suppNation = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
      .join(broadcast(t(s, dir, "nation")
        .select(col("n_nationkey").as("s_nk"), col("n_name"))),
        col("s_nationkey") === col("s_nk"))
      .select(col("s_suppkey"), col("n_name"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"),
      year(col("o_orderdate").cast("date")).cast("long").as("o_year"))
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("o_year"))
      .agg(
        (sum(col("rev")) * 10000).cast("long").as("rev_total_e4"),
        (sum(when(col("n_name") === "NATION_2", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))) * 10000)
          .cast("long").as("rev_nation_e4"))
      .select(col("o_year"), col("rev_total_e4"), col("rev_nation_e4"),
        Similarity.intScaled(
          col("rev_nation_e4").cast("double") / col("rev_total_e4").cast("double"),
          1000000L).as("share_e6"))
      .orderBy("o_year")
  }

  /** q209 — TPC-H Q10 shape (returned-item reporting): the 100
    * customers losing the most revenue to returns (l_returnflag='R').
    * Revenue is an exact e4 long, so the top-100 ORDER is integer-
    * deterministic (custkey tie-break) — no float-rank hazard.
    *
    * Scale: the returnflag filter (≈1/3 selectivity) is pushed to the
    * scan; the per-customer agg collapses lineitem BEFORE the
    * customer join; the final top-100 is TakeOrderedAndProject
    * (never a global sort of the data).
    */
  def q209(s: SparkSession, dir: String): DataFrame = {
    val lost = t(s, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(t(s, dir, "orders").select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_lines"),
        (sum(col("rev")) * 10000).cast("long").as("lost_e4"))
    lost
      .join(t(s, dir, "customer").select("c_custkey", "c_mktsegment"),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("n_lines"),
        col("lost_e4"))
      .orderBy(col("lost_e4").desc, col("c_custkey"))
      .limit(100)
  }

  /** q210 — TPC-H Q14 shape (promotion effect): per ship month, promo
    * parts' share of revenue. Same exact-e4 + one-division discipline
    * as q208; the lineitem⋈part join is fact-sized on both sides
    * (shuffle join, no forced broadcast — part grows with SF).
    */
  def q210(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"),
        trunc(col("l_shipdate").cast("date"), "month").as("month"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(t(s, dir, "part").select("p_partkey", "p_type"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("month"))
      .agg(
        (sum(col("rev")) * 10000).cast("long").as("rev_total_e4"),
        (sum(when(col("p_type") === "PROMO", col("rev"))
          .otherwise(lit(0).cast("decimal(18,2)"))) * 10000)
          .cast("long").as("rev_promo_e4"))
      .select(col("month"), col("rev_total_e4"), col("rev_promo_e4"),
        Similarity.intScaled(
          col("rev_promo_e4").cast("double") / col("rev_total_e4").cast("double"),
          1000000L).as("promo_share_e6"))
      .orderBy("month")

  /** q211 — brand mix-shift audit: each brand's within-year revenue
    * share in its first vs last observed year, and the shift between
    * them — the category-drift screen a retail warehouse runs on
    * every dimension. Shares are identical-double divisions of exact
    * e4 revenue (q208 discipline); the shift is an integer e6
    * subtraction.
    *
    * Scale: lineitem⋈part collapses to the brand × year frame
    * map-side-combined; the year-total window and the first/last
    * windows ride that ≤(brands·years) frame, never the data.
    */
  def q211(s: SparkSession, dir: String): DataFrame = {
    val by = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        year(col("l_shipdate").cast("date")).cast("long").as("yr"),
        (col("l_extendedprice").cast("decimal(18,2)") *
          (lit(1) - col("l_discount").cast("decimal(18,2)"))).as("rev"))
      .join(t(s, dir, "part").select("p_partkey", "p_brand"),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("yr"))
      .agg((sum(col("rev")) * 10000).cast("long").as("rev_e4"))
    val share = by
      .withColumn("share_e6", Similarity.intScaled(
        col("rev_e4").cast("double") /
          sum(col("rev_e4")).over(Window.partitionBy(col("yr"))).cast("double"),
        1000000L))
    val wAsc = Window.partitionBy(col("p_brand")).orderBy(col("yr"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    share
      .select(col("p_brand"), col("yr"), col("share_e6"),
        first(col("share_e6")).over(wAsc).as("share_first_e6"),
        last(col("share_e6")).over(wAsc).as("share_last_e6"))
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_years"),
        max(col("share_first_e6")).as("share_first_e6"),
        max(col("share_last_e6")).as("share_last_e6"))
      .select(col("p_brand"), col("n_years"), col("share_first_e6"),
        col("share_last_e6"),
        (col("share_last_e6") - col("share_first_e6")).as("shift_e6"))
      .orderBy("p_brand")
  }

  /** q212 — reserved-token incidence audit: per (source, token), how
    * many documents contain each watched literal and how many total
    * occurrences — the "did special/control tokens leak into training
    * text" screen every corpus ingest runs. The probe list mixes a
    * token present in this corpus ("spark") with control-token
    * sentinels expected absent, so zeros are demonstrated, not
    * assumed.
    *
    * Occurrence counting is PORTABLE integer arithmetic —
    * (len(text) − len(replace(text, tok))) / len(tok) — no regex
    * engine semantics on either side.
    *
    * Scale: one map-side pass per token over documents (the token
    * list is a literal crossJoin'd constant frame, broadcast by
    * construction); output is sources × tokens.
    */
  def q212(s: SparkSession, dir: String): DataFrame = {
    val toks = Seq("spark", "merge", "<|endoftext|>", "[PAD]")
    val tokDf = s.createDataFrame(toks.map(Tuple1(_))).toDF("token")
    Tables.table(s, dir, "documents")
      .select(col("source"), col("text"))
      .withGlobalStats(tokDf)
      .select(col("source"), col("token"),
        when(col("text").contains(col("token")), 1L).otherwise(0L).as("has"),
        // Integer floor division by construction (`DIV`, matching the
        // oracle's `//`) — the numerator is always an exact multiple
        // of len(token), but the discipline is integer arithmetic,
        // not a double-division margin argument (q190 pattern).
        expr("(length(text) - length(replace(text, token, ''))) DIV length(token)")
          .cast("long").as("occ"))
      .groupBy(col("source"), col("token"))
      .agg(sum(col("has")).as("docs_with"), sum(col("occ")).as("occurrences"))
      .orderBy("source", "token")
  }

  /** q213 — EXACT covariance matrix of the embedding space, the
    * PCA/whitening-prep step of an embedding pipeline, made
    * hash-certifiable by quantizing each coordinate to an e3 integer
    * FIRST: all three moments (Σqᵢ, Σqⱼ, Σqᵢqⱼ) are then exact
    * integer sums — order-independent, unlike a float covariance —
    * and cov = (n·Sᵢⱼ − Sᵢ·Sⱼ)/n² is one fixed expression over the
    * identical exact doubles (q206 discipline).
    *
    * Scale: the per-row outer-product explode emits d²/2 terms per
    * vector but partial aggregation collapses every partition to the
    * d²/2-cell frame before the single shuffle. For large d the
    * (i,j) grid is BANDED ([[q213Banded]]): with `bands` = B, each of
    * the B(B+1)/2 block passes double-explodes only a d/B-wide slice
    * pair, so the peak per-row fan-out and per-explode row width drop
    * from d to d/B while the emitted cell total (and the quantized
    * moments — the certified numbers) are identical by construction.
    * At d=64 one pass is optimal (bands=1 — this declared query); at
    * d=1024 point B so d/B ≈ 64. Round8Spec proves band-equivalence
    * at B ∈ {1, 3, 4}, including non-dividing widths.
    */
  def q213(s: SparkSession, dir: String): DataFrame =
    q213Banded(s, dir, bands = 1)

  /** [[q213]] with the (i,j) grid blocked into `bands`² slice-pair
    * passes (upper triangle only). Band width w = ⌈d/B⌉ is derived
    * from the data per-row (`size(qv)`), tail slices fall short
    * naturally, and a short/empty slice explodes to nothing — so
    * non-dividing B and even ragged vectors stay correct.
    */
  private[graft] def q213Banded(s: SparkSession, dir: String, bands: Int): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    // The Spark side follows the actual array length via posexplode;
    // the oracle hard-codes range(64). Round8Spec pins dim=64 so a
    // driver-side embeddings regeneration fails loudly there, not as
    // a confusing oracle NULL-cell mismatch.
    val q = Tables.table(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(col("embedding"),
          x => Similarity.intScaled(x.cast("double"), 1000L)).as("qv"))
      .select(col("qv"),
        expr(s"CAST((size(qv) + ${bands - 1}) DIV $bands AS INT)").as("w"))
    val blocks = for { bi <- 0 until bands; bj <- bi until bands } yield
      q.select(
          expr(s"slice(qv, $bi * w + 1, w)").as("si"),
          expr(s"slice(qv, $bj * w + 1, w)").as("sj"),
          (col("w") * bi).as("offi"), (col("w") * bj).as("offj"))
        .select(posexplode(col("si")).as(Seq("pi", "qi")),
          col("sj"), col("offi"), col("offj"))
        .select((col("pi") + col("offi")).as("i"), col("qi"),
          posexplode(col("sj")).as(Seq("pj", "qj")), col("offj"))
        .select(col("i"), col("qi"),
          (col("pj") + col("offj")).as("j"), col("qj"))
        // binds only on diagonal blocks (bi == bj); off-diagonal blocks
        // satisfy i < j by construction and Catalyst folds the filter
        .filter(col("i") <= col("j"))
    blocks.reduce(_ unionAll _)
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"),
        sum(col("qi")).as("si"), sum(col("qj")).as("sj"),
        sum(col("qi") * col("qj")).as("sij"))
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        Similarity.intScaled(
          (col("n").cast("double") * col("sij").cast("double") -
            col("si").cast("double") * col("sj").cast("double")) /
            (col("n").cast("double") * col("n").cast("double")),
          1000000L).as("cov_q_e6"))
      .orderBy("i", "j")
  }

  /** q214 — day-of-week revenue seasonality index: mean daily revenue
    * per dow as a ratio to the overall daily mean (e6) — the
    * revenue-weighted complement of q205's count-based screen. Daily
    * cents are exact; each index is one division of identical exact
    * doubles; dow is the same portable (epoch_day+4) mod 7.
    *
    * Scale: orders collapse map-side to calendar days, then to the
    * 7-row dow frame; the global mean rides a broadcast one-row
    * crossJoin (the accepted global-stats shape).
    */
  def q214(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("day"))
      .agg((sum(col("p")) * 100).cast("long").as("cents"))
    val byDow = daily
      .select(((col("day") + 4) % 7).as("dow"), col("cents"))
      .groupBy(col("dow"))
      .agg(count(lit(1)).as("n_days"), sum(col("cents")).as("cents"))
    byDow
      .withGlobalStats(byDow.agg(
        sum(col("n_days")).as("tot_days"), sum(col("cents")).as("tot_cents")))
      .select(col("dow"), col("n_days"), col("cents"),
        Similarity.intScaled(
          (col("cents").cast("double") / col("n_days").cast("double")) /
            (col("tot_cents").cast("double") / col("tot_days").cast("double")),
          1000000L).as("index_e6"))
      .orderBy("dow")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q203_tpch_q7" -> (q203 _),
    "q204_benford" -> (q204 _),
    "q205_chi2_dow" -> (q205 _),
    "q206_autocorr_daily" -> (q206 _),
    "q207_profit_rollup" -> (q207 _),
    "q208_tpch_q8" -> (q208 _),
    "q209_tpch_q10" -> (q209 _),
    "q210_promo_share" -> (q210 _),
    "q211_brand_shift" -> (q211 _),
    "q212_special_tokens" -> (q212 _),
    "q213_embed_covariance" -> (q213 _),
    "q214_dow_revenue_index" -> (q214 _),
  )

  val oracleSql: Map[String, String] = Map(
    // Same dual-nation slice; decimal revenue summed exactly, e4 out.
    "q203_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |            AS BIGINT) AS rev_e4
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation n1 ON s_nationkey = n1.n_nationkey
        |JOIN nation n2 ON c_nationkey = n2.n_nationkey
        |WHERE n1.n_name IN ('NATION_1','NATION_2')
        |  AND n2.n_name IN ('NATION_1','NATION_2')
        |  AND n1.n_name <> n2.n_name
        |  AND l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate <  DATE '1998-01-01'
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    // First digit from the exact cents string; LN(1+1/d)/LN(10) is
    // the identical expression shape to Spark's log/log.
    "q204_benford" ->
      """WITH d AS (
        |  SELECT CAST(SUBSTR(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |                               * 100 AS BIGINT) AS VARCHAR), 1, 1)
        |              AS INT) AS digit,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM lineitem WHERE l_extendedprice > 0 GROUP BY 1)
        |SELECT digit, n,
        |  CAST(ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
        |             * 1000000) AS BIGINT) AS obs_e6,
        |  CAST(ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0)
        |             * 1000000) AS BIGINT) AS exp_e6,
        |  CAST(ROUND(CAST(n AS DOUBLE) / CAST(SUM(n) OVER () AS DOUBLE)
        |             * 1000000) AS BIGINT)
        |    - CAST(ROUND(LN(1.0 + 1.0 / CAST(digit AS DOUBLE)) / LN(10.0)
        |                 * 1000000) AS BIGINT) AS dev_e6
        |FROM d ORDER BY digit""".stripMargin,
    // Portable (epoch_day+4) mod 7 on both sides; E and χ² from the
    // same integer-fed double arithmetic.
    "q205_chi2_dow" ->
      """WITH cells AS (
        |  SELECT event_type,
        |         (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7
        |           AS dow,
        |         CAST(COUNT(*) AS BIGINT) AS o
        |  FROM events GROUP BY 1, 2),
        |x AS (
        |  SELECT event_type, dow, o,
        |         CAST(SUM(o) OVER (PARTITION BY event_type) AS DOUBLE) *
        |         CAST(SUM(o) OVER (PARTITION BY dow) AS DOUBLE) /
        |           CAST(SUM(o) OVER () AS DOUBLE) AS e
        |  FROM cells)
        |SELECT event_type, dow, o,
        |       CAST(ROUND(e * 10000) AS BIGINT) AS exp_e4,
        |       CAST(ROUND((CAST(o AS DOUBLE) - e) * (CAST(o AS DOUBLE) - e)
        |                  / e * 10000) AS BIGINT) AS chi2_e4
        |FROM x ORDER BY event_type, dow""".stripMargin,
    // Exact-decimal moments over whole-dollar daily revenue; the six
    // casts to DOUBLE are the only float steps (sqrt is IEEE-exact).
    "q206_autocorr_daily" ->
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS day,
        |         CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |                   AS BIGINT) // 100 AS DECIMAL(18,0)) AS x
        |  FROM orders GROUP BY 1),
        |pairs AS (
        |  SELECT x, LEAD(x) OVER (ORDER BY day) AS y FROM daily),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |         CAST(SUM(x) AS DECIMAL(38,0)) AS sx,
        |         CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
        |         CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy,
        |         CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
        |         CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy
        |  FROM pairs WHERE y IS NOT NULL)
        |SELECT n_pairs,
        |  CAST(ROUND(
        |    (CAST(n_pairs AS DOUBLE) * CAST(sxy AS DOUBLE) -
        |     CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
        |    SQRT((CAST(n_pairs AS DOUBLE) * CAST(sxx AS DOUBLE) -
        |          CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
        |         (CAST(n_pairs AS DOUBLE) * CAST(syy AS DOUBLE) -
        |          CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
        |    * 1000000) AS BIGINT) AS r1_e6
        |FROM m""".stripMargin,
    // Exact e4 revenue both sums; the share is one division of the
    // identical exact doubles.
    "q208_tpch_q8" ->
      """WITH base AS (
        |  SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |              AS BIGINT) AS rev_total_e4,
        |         CAST(SUM(CASE WHEN ns.n_name = 'NATION_2'
        |                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                            (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000
        |              AS BIGINT) AS rev_nation_e4
        |  FROM lineitem
        |  JOIN orders    ON l_orderkey = o_orderkey
        |  JOIN customer  ON o_custkey = c_custkey
        |  JOIN nation nc ON c_nationkey = nc.n_nationkey
        |  JOIN region    ON nc.n_regionkey = r_regionkey
        |  JOIN supplier  ON l_suppkey = s_suppkey
        |  JOIN nation ns ON s_nationkey = ns.n_nationkey
        |  WHERE r_name = 'ASIA'
        |  GROUP BY 1)
        |SELECT o_year, rev_total_e4, rev_nation_e4,
        |  CAST(ROUND(CAST(rev_nation_e4 AS DOUBLE) /
        |             CAST(rev_total_e4 AS DOUBLE) * 1000000) AS BIGINT)
        |    AS share_e6
        |FROM base ORDER BY o_year""".stripMargin,
    // Exact e4 ordering + custkey tie-break: integer-deterministic top-100.
    "q209_tpch_q10" ->
      """WITH lost AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |              AS BIGINT) AS lost_e4
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  WHERE l_returnflag = 'R'
        |  GROUP BY 1)
        |SELECT c_custkey, c_mktsegment, n_lines, lost_e4
        |FROM lost JOIN customer ON o_custkey = c_custkey
        |ORDER BY lost_e4 DESC, c_custkey LIMIT 100""".stripMargin,
    // Same conditional-decimal sums per ship month.
    "q210_promo_share" ->
      """WITH m AS (
        |  SELECT CAST(DATE_TRUNC('month', CAST(l_shipdate AS DATE)) AS DATE)
        |           AS month,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |              AS BIGINT) AS rev_total_e4,
        |         CAST(SUM(CASE WHEN p_type = 'PROMO'
        |                       THEN CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                            (1 - CAST(l_discount AS DECIMAL(18,2)))
        |                       ELSE CAST(0 AS DECIMAL(18,2)) END) * 10000
        |              AS BIGINT) AS rev_promo_e4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1)
        |SELECT month, rev_total_e4, rev_promo_e4,
        |  CAST(ROUND(CAST(rev_promo_e4 AS DOUBLE) /
        |             CAST(rev_total_e4 AS DOUBLE) * 1000000) AS BIGINT)
        |    AS promo_share_e6
        |FROM m ORDER BY month""".stripMargin,
    // Shares on the brand×year frame; first/last over the full frame.
    "q211_brand_shift" ->
      """WITH by_y AS (
        |  SELECT p_brand, CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS yr,
        |         CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                  (1 - CAST(l_discount AS DECIMAL(18,2)))) * 10000
        |              AS BIGINT) AS rev_e4
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2),
        |sh AS (
        |  SELECT p_brand, yr,
        |         CAST(ROUND(CAST(rev_e4 AS DOUBLE) /
        |                    CAST(SUM(rev_e4) OVER (PARTITION BY yr) AS DOUBLE)
        |                    * 1000000) AS BIGINT) AS share_e6
        |  FROM by_y),
        |fl AS (
        |  SELECT p_brand, yr, share_e6,
        |         FIRST_VALUE(share_e6) OVER
        |           (PARTITION BY p_brand ORDER BY yr
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |           AS share_first_e6,
        |         LAST_VALUE(share_e6) OVER
        |           (PARTITION BY p_brand ORDER BY yr
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |           AS share_last_e6
        |  FROM sh)
        |SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_years,
        |       MAX(share_first_e6) AS share_first_e6,
        |       MAX(share_last_e6) AS share_last_e6,
        |       MAX(share_last_e6) - MAX(share_first_e6) AS shift_e6
        |FROM fl GROUP BY 1 ORDER BY p_brand""".stripMargin,
    // Identical substring-count arithmetic; contains() is a literal
    // match on both sides (no regex).
    "q212_special_tokens" ->
      """WITH toks AS (
        |  SELECT * FROM (VALUES ('spark'), ('merge'),
        |                        ('<|endoftext|>'), ('[PAD]')) t(token))
        |SELECT source, token,
        |  CAST(SUM(CASE WHEN contains(text, token) THEN 1 ELSE 0 END)
        |       AS BIGINT) AS docs_with,
        |  CAST(SUM((len(text) - len(replace(text, token, ''))) // len(token))
        |       AS BIGINT) AS occurrences
        |FROM documents CROSS JOIN toks
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Same e3 quantization (float→double→round half-away both sides),
    // exact integer moments, one fixed double expression.
    "q213_embed_covariance" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |e AS (
        |  SELECT i.i AS i, j.j AS j, qv[i.i + 1] AS qi, qv[j.j + 1] AS qj
        |  FROM q CROSS JOIN range(64) i(i) CROSS JOIN range(64) j(j)
        |  WHERE i.i <= j.j)
        |SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |  CAST(ROUND(
        |    (CAST(COUNT(*) AS DOUBLE) * CAST(SUM(qi * qj) AS DOUBLE) -
        |     CAST(SUM(qi) AS DOUBLE) * CAST(SUM(qj) AS DOUBLE)) /
        |    (CAST(COUNT(*) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE))
        |    * 1000000) AS BIGINT) AS cov_q_e6
        |FROM e GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    // Exact daily cents; the index is one division chain on identical
    // exact doubles; same portable dow as q205.
    "q214_dow_revenue_index" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100
        |              AS BIGINT) AS cents
        |  FROM orders GROUP BY 1),
        |bd AS (
        |  SELECT (day + 4) % 7 AS dow, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(cents) AS BIGINT) AS cents
        |  FROM daily GROUP BY 1),
        |t AS (
        |  SELECT CAST(SUM(n_days) AS BIGINT) AS tot_days,
        |         CAST(SUM(cents) AS BIGINT) AS tot_cents
        |  FROM bd)
        |SELECT dow, n_days, cents,
        |  CAST(ROUND((CAST(cents AS DOUBLE) / CAST(n_days AS DOUBLE)) /
        |             (CAST(tot_cents AS DOUBLE) / CAST(tot_days AS DOUBLE))
        |             * 1000000) AS BIGINT) AS index_e6
        |FROM bd, t ORDER BY dow""".stripMargin,
    // Decimal-exact margin; retail price as the cost stand-in.
    "q207_profit_rollup" ->
      """SELECT n_name,
        |       CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
        |       CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) *
        |                (1 - CAST(l_discount AS DECIMAL(18,2)))
        |              - CAST(p_retailprice AS DECIMAL(18,2)) *
        |                CAST(l_quantity AS DECIMAL(18,0))) * 10000
        |            AS BIGINT) AS profit_e4
        |FROM lineitem
        |JOIN part     ON l_partkey = p_partkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation   ON s_nationkey = n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
  )
}
