package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled
import graft.ops.GlobalStats

/** Round-10 analytics batch: audit/inequality/uncertainty statistics
  * (Benford, Gini, jackknife, capture-recapture), time-series memory
  * (autocorrelation), and corpus stylometry/keyness (degeneration
  * runs, Burrows' Delta, Dunning G²) — the remaining classical tools a
  * data-quality team reaches for that the q238-q330 shelves don't yet
  * cover. Every query keeps the house float discipline: exact
  * integers up to ONE mirrored double chain (or per-row grids summed
  * exactly), DuckDB oracle computing the identical arithmetic,
  * Round10Spec measuring rounding-boundary margins.
  */
object Round10 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  private def cents(dollars: Column): Column =
    (dollars.cast("decimal(18,2)") * 100).cast("long")

  private val d38 = "decimal(38,0)"

  /** The nine Benford first-digit probabilities log10(1+1/d) as
    * decimal literals SPELLED IDENTICALLY in the Spark expression and
    * the DuckDB SQL — a shared literal is the same IEEE double on both
    * engines by construction (q326's π/γ discipline), which sidesteps
    * any cross-engine log() ulp question entirely.
    */
  private val benfordP: Seq[(Int, String)] = Seq(
    1 -> "0.3010299956639812", 2 -> "0.17609125905568124",
    3 -> "0.12493873660829992", 4 -> "0.09691001300805642",
    5 -> "0.07918124604762482", 6 -> "0.06694678963061322",
    7 -> "0.05799194697768673", 8 -> "0.05115252244738129",
    9 -> "0.04575749056067514")

  private val benfordCase: String =
    "CASE " + benfordP.map { case (d, p) => s"WHEN digit = $d THEN $p" }
      .mkString(" ") + " END"

  /** q331 — Benford first-digit audit of order values: the observed
    * leading-digit histogram of o_totalprice cents vs Benford's law,
    * with the per-digit chi-square contribution. THE forensic-audit
    * screen for fabricated or systematically generated amounts — a
    * digit whose contribution dominates is where the anomaly lives
    * (price floors, rounding policies, synthetic data). On TPC-H-ish
    * uniform-ish prices the fit is terrible BY CONSTRUCTION — the
    * point of the query is the measurement, and the spec pins that
    * the deviation binds (chi² ≫ 0) rather than pretending the
    * fixture is Benford.
    *
    * Exactness: digits and counts are exact integers; expected counts
    * and chi² contributions are mirrored double chains off the shared
    * probability literals; e2/e6 grids with Round10Spec margins.
    *
    * Scale: map-side digit projection, 9-row output — nothing after
    * the first agg is data-sized.
    */
  def q331(s: SparkSession, dir: String): DataFrame = {
    val digits = t(s, dir, "orders")
      .select(substring(cents(col("o_totalprice")).cast("string"), 1, 1)
        .cast("long").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(sum(col("n_obs")).as("n"))
    digits.withGlobalStats(tot)
      .withColumn("p", expr(benfordCase).cast("double"))
      .select(col("digit"), col("n_obs"),
        intScaled(col("n_obs").cast("double") / col("n").cast("double"),
          1000000L).as("p_obs_e6"),
        intScaled(col("p"), 1000000L).as("p_benford_e6"),
        intScaled(
          (col("n_obs").cast("double") - col("n").cast("double") * col("p")) *
            (col("n_obs").cast("double") - col("n").cast("double") * col("p")) /
            (col("n").cast("double") * col("p")),
          1000000L).as("chi2_e6"))
      .orderBy("digit")
  }

  /** q332 — Gini coefficient of revenue concentration per market
    * segment: how unequally customer lifetime revenue is distributed,
    * the Lorenz-curve summary that complements q277's Pareto 80/20 cut
    * and q284's HHI (HHI weights the top; Gini reads the whole curve).
    * Formula: G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over revenues sorted
    * ascending.
    *
    * Exactness: per-customer revenue is exact cents; the rank is the
    * (revenue, custkey) total order (rank permutations within ties
    * cannot change Σ i·xᵢ — equal x absorbs any rank shuffle); both
    * Σ-terms ride decimal(38); ONE mirrored division e6.
    *
    * Scale: orders collapse to the customer dimension map-side first;
    * the per-segment rank rides [[graft.ops.TwoPhase.rankCum]]
    * partitioned by segment (HDR range-buckets + broadcast prefix
    * offsets — q287's shared core, closed round 12), so a segment's
    * customer count never rides one task; 5-row output.
    */
  def q332(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("rev"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
    graft.ops.TwoPhase.rankCum(rev, Seq("c_mktsegment"), "rev", "o_custkey",
        asc = true, rn = Some("i"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("rev")).as("total_cents"),
        sum(col("i").cast(d38) * col("rev")).as("ti"))
      .select(col("c_mktsegment"), col("n_customers"), col("total_cents"),
        when(col("total_cents") > 0L, intScaled(
          (lit(2L).cast(d38) * col("ti") -
            (col("n_customers") + 1L).cast(d38) * col("total_cents"))
            .cast("double") /
            (col("n_customers").cast(d38) * col("total_cents")).cast("double"),
          1000000L)).as("gini_e6"))
      .orderBy("c_mktsegment")
  }

  /** q333 — jackknife standard error of the revenue-per-unit RATIO per
    * order priority: θ = Σprice/Σqty is the classic non-linear
    * estimator whose naive variance is wrong; the delete-one jackknife
    * is the standard fix, and it reduces to ONE pass here because each
    * leave-one-out ratio θ₋ᵢ = (Sp−pᵢ)/(Sq−qᵢ) needs only the
    * broadcast group totals. The uncertainty companion every ratio
    * metric on a dashboard should carry.
    *
    * Float discipline: each θ₋ᵢ is one mirrored division of exact
    * integers gridded e9 PER ROW (q294 pattern); the jackknife moments
    * are then exact decimal(38) sums of those grid integers, and
    * SE = √((n−1)·(n·m₂−m₁²))/n is one mirrored sqrt chain, reported
    * e6 (grid coarsening absorbs the e9 quantization; margin measured
    * in Round10Spec).
    *
    * Scale: the orders join is the audited fact shape; totals
    * broadcast back; everything else is map-side. 5-row output.
    *
    * r18 probe, tried and REVERTED: collapsing to a (priority, p, q)
    * value census first (one fact pass + a bounded ~27M-row-max
    * checkpoint, weighted moments — the q238 discipline) measured
    * SLOWER than the two lazy fact passes at both tiers (DevTime min
    * 2.28→2.43 s at sf0.1, 2.54→2.61 s at 10×; medians worse): cents
    * values are near-unique per row at bench scale, so the census
    * barely collapses and its checkpoint + extra exchange eat the
    * saved pass. The two-pass shape stays.
    */
  def q333(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        cents(col("l_extendedprice")).as("p"),
        col("l_quantity").cast("long").as("q"))
      .join(t(s, dir, "orders")
        .select(col("o_orderkey").as("l_orderkey"), col("o_orderpriority")),
        "l_orderkey")
    val totals = li.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), sum(col("p")).as("sp"), sum(col("q")).as("sq"))
    li.join(broadcast(totals), "o_orderpriority")
      .select(col("o_orderpriority"), col("n"), col("sp"), col("sq"),
        // grid the DEVIATION θ₋ᵢ − θ̂ (both on the e9 grid): variance
        // is shift-invariant, so the SE is bit-identical to gridding
        // θ₋ᵢ raw — but the moments shrink by ~n², keeping m1² inside
        // decimal(38)/HUGEINT at any realistic row count (raw-grid m1²
        // wrapped BOTH engines' 128-bit range at sf0.1 — r10 fix)
        when(col("sq") - col("q") > 0L,
          intScaled(
            (col("sp") - col("p")).cast("double") /
              (col("sq") - col("q")).cast("double"),
            1000000000L) -
            intScaled(
              col("sp").cast("double") / col("sq").cast("double"),
              1000000000L)).as("th"))
      .groupBy(col("o_orderpriority"))
      .agg(max(col("n")).as("n_items"),
        max(col("sp")).as("sp"), max(col("sq")).as("sq"),
        sum(col("th").cast(d38)).as("m1"),
        sum(col("th").cast(d38) * col("th")).as("m2"))
      .select(col("o_orderpriority"), col("n_items"),
        intScaled(col("sp").cast("double") / col("sq").cast("double"),
          1000000L).as("ratio_e6"),
        when(col("n_items") > 1L, intScaled(
          sqrt((col("n_items") - 1L).cast("double") *
            (col("n_items").cast(d38) * col("m2") -
              col("m1") * col("m1")).cast("double")) /
            col("n_items").cast("double") / lit(1000.0),
          1L)).as("se_jk_e6"))
      .orderBy("o_orderpriority")
  }

  /** q334 — autocorrelation function (lags 1-7) of the daily order
    * count series: the time-series MEMORY diagnostic the trend/shift
    * shelf (q251 CUSUM, q262 STL, q270 changepoint) reads shape from
    * but never quantifies — a weekly cycle shows as an acf peak at
    * lag 7, over-dispersion persistence as slow decay. Standard
    * definition: shared mean and full-series variance in the
    * denominator, lag-k products over the overlapping span.
    *
    * Exactness: the day grid is zero-filled (absent days ARE zero
    * counts — q251's grid discipline); deviations are n-scaled exact
    * integers n·xₜ−S; numerator and denominator ride decimal(38); ONE
    * mirrored division e6 per lag.
    *
    * Scale: orders collapse to the calendar grid map-side; the lag
    * join is grid×7 rows. 7-row output, corpus-size-independent after
    * the first agg.
    */
  def q334(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // branched: moments + both sides of the lag join
    val mom = grid.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val dev = grid.withGlobalStats(mom)
      .select(col("day"), (col("n") * col("x") - col("sx")).as("d"),
        col("n"))
    val denom = dev.agg(max(col("n")).as("n"),
      sum(col("d").cast(d38) * col("d")).as("den"))
    dev.select(col("day"), col("d"),
        explode(sequence(lit(1L), lit(7L))).as("lag"))
      .select((col("day") + col("lag")).as("day"), col("lag"),
        col("d").as("d0"))
      .join(dev.select(col("day"), col("d").as("d1")), "day")
      .groupBy(col("lag"))
      .agg(sum(col("d0").cast(d38) * col("d1")).as("num"))
      .withGlobalStats(denom)
      .select(col("lag"), col("n").as("n_days"),
        when(col("den") > 0L, intScaled(
          col("num").cast("double") / col("den").cast("double"),
          1000000L)).as("acf_e6"))
      .orderBy("lag")
  }

  /** q335 — Chapman capture-recapture estimate of the customer
    * universe: treat the odd- and even-keyed halves of the order log
    * as two independent "captures" of the active-customer population;
    * the overlap estimates the whole. Chapman's (n₁+1)(n₂+1)/(m+1) − 1
    * is the bias-corrected Lincoln-Petersen — the estimator web-crawl
    * and dedup planning uses to size a population from overlapping
    * samples (how many distinct users/documents exist, given two
    * crawls and their intersection), next to the sketch view (q25
    * estimates distinct from hashes; this estimates UNSEEN mass from
    * overlap). The key-parity split is the deterministic stand-in for
    * "two independent crawls" (the fixture's dates are one-sided, so a
    * calendar split would leave an empty first capture).
    *
    * Exactness: n₁/n₂/m/true-total are exact distinct counts; the
    * estimate is ONE mirrored double chain e2; the truth column makes
    * the estimator's error visible (closure of the fixture means the
    * estimate should land near the true count — spec-bound).
    *
    * Scale: two distinct-aggs over a projected column + one anti-ish
    * overlap count via the (custkey → min/max period) collapse — one
    * shuffle on custkey, one-row output.
    */
  def q335(s: SparkSession, dir: String): DataFrame = {
    val flags = t(s, dir, "orders")
      .select(col("o_custkey"),
        (col("o_orderkey") % 2L === 1L).cast("long").as("ina"))
      .groupBy(col("o_custkey"))
      .agg(max(col("ina")).as("a"), max(lit(1L) - col("ina")).as("b"))
    val agg = flags.agg(
      sum(col("a")).as("n1"), sum(col("b")).as("n2"),
      sum(col("a") * col("b")).as("n_both"),
      count(lit(1)).as("n_true"))
    agg.select(col("n1"), col("n2"), col("n_both"), col("n_true"),
      when(col("n_both") >= 0L, intScaled(
        (col("n1") + 1L).cast("double") * (col("n2") + 1L).cast("double") /
          (col("n_both") + 1L).cast("double") - lit(1.0),
        100L)).as("chapman_e2"))
  }

  /** q336 — text-degeneration census: the longest run of identical
    * consecutive tokens per document, rolled up per source. Looping
    * output ("the the the …") is THE signature failure of greedy LM
    * decoding and of broken scrapers; a source whose max-run or
    * run≥3 share spikes needs filtering before training. Complements
    * q108 (duplicated-gram MASS — position-blind) with the
    * positional-adjacency view.
    *
    * All-integer end to end (strongest certificate class): runs are
    * exact lag-compare + cumulative-sum arithmetic, censuses are
    * counts.
    *
    * Scale: token rows are doc-keyed (one window, the q240 posture);
    * the census is two combiner groupBys. Source-bounded output.
    */
  def q336(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
    val byDoc = Window.partitionBy("doc_id").orderBy("pos")
    val runs = toks
      .withColumn("brk",
        when(lag(col("w"), 1).over(byDoc).isNull ||
          lag(col("w"), 1).over(byDoc) =!= col("w"), 1L).otherwise(0L))
      .withColumn("run_id", sum(col("brk")).over(
        Window.partitionBy("doc_id").orderBy("pos")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("source"), col("doc_id"), col("run_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("source"), col("doc_id"))
      .agg(max(col("len")).as("max_run"))
    runs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("max_run")).as("max_run"),
        sum(when(col("max_run") >= 3L, 1L).otherwise(0L)).as("n_docs_run3"))
      .orderBy("source")
  }

  /** q337 — Burrows' Delta stylometry distance between sources: mean
    * |z-difference| over the corpus top-50 words' relative
    * frequencies, the standard authorship/register distance. Where
    * q281 scores shared mass (cosine) and q143 probability shape
    * (JS), Delta z-normalizes each word ACROSS sources first, so a
    * universally common word contributes only through its deviation —
    * the house style fingerprint. The pair matrix says which feeds
    * interchangeable prose and which are stylistic islands.
    *
    * Float discipline: per-(source,word) relative frequency is ONE
    * mirrored division gridded e9; the z-score is one mirrored
    * (ns·f−S)/√(ns·Q−S²) chain over EXACT moments of those grid
    * integers, gridded e6; Delta is then an EXACT integer mean of
    * |z₁−z₂| e6 values (integer sum, one rounding division) — no
    * float summation anywhere (margins in Round10Spec).
    *
    * Scale: tf collapses map-side; the top-50 vocabulary is a
    * broadcast total order (freq DESC, word — q142 discipline); the
    * grid is sources×50, pairs sources²×50 — all domain-bounded.
    */
  def q337(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true) // consumers: vocab, totals, grid
    val srcTot = tf.groupBy(col("source")).agg(sum(col("tf")).as("st"))
    val top = tf.groupBy(col("w")).agg(sum(col("tf")).as("cf"))
      .withColumn("rk", row_number().over(
        Window.orderBy(col("cf").desc, col("w"))))
      .filter(col("rk") <= 50).select(col("w"))
    val gridF = srcTot.withGlobalStats(top)
      .join(tf, Seq("source", "w"), "left")
      .select(col("source"), col("w"),
        intScaled(coalesce(col("tf"), lit(0L)).cast("double") /
          col("st").cast("double"), 1000000000L).as("f"))
      .localCheckpoint(true) // consumers: word moments + both pair sides
    val wm = gridF.groupBy(col("w"))
      .agg(count(lit(1)).as("ns"), sum(col("f")).as("sf"),
        sum(col("f").cast(d38) * col("f")).as("qf"))
    val z = gridF.join(broadcast(wm), "w")
      .select(col("source"), col("w"),
        when(col("ns").cast(d38) * col("qf") -
          col("sf").cast(d38) * col("sf") > 0L,
          intScaled(
            (col("ns").cast(d38) * col("f") - col("sf")).cast("double") /
              sqrt((col("ns").cast(d38) * col("qf") -
                col("sf").cast(d38) * col("sf")).cast("double")),
            1000000L)).as("z"))
      .filter(col("z").isNotNull)
      .localCheckpoint(true) // both sides of the pair join
    val a = z.select(col("source").as("src_a"), col("w"), col("z").as("za"))
    val b = z.select(col("source").as("src_b"), col("w"), col("z").as("zb"))
    a.join(b, "w").filter(col("src_a") < col("src_b"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_words"),
        sum(abs(col("za") - col("zb"))).as("sabs"))
      .select(col("src_a"), col("src_b"), col("n_words"),
        intScaled(col("sabs").cast("double") / col("n_words").cast("double"),
          1L).as("delta_e6"))
      .orderBy("src_a", "src_b")
  }

  /** q338 — Dunning log-likelihood (G²) keyness: the top-20 words
    * most significantly OVER-represented in each source vs the rest
    * of the corpus. Where TF-IDF (q106) weights rarity and PMI
    * (q135) association strength, G² is the SIGNIFICANCE test —
    * robust at low counts where PMI explodes — and is the standard
    * corpus-linguistics keyword extractor. The per-source keyword
    * table IS the "what is this feed about" summary a mixture
    * designer reads.
    *
    * Float discipline: each G² is computed PER ROW (no float sums):
    * the two x·ln(ratio) terms take ln of one mirrored division of
    * exact decimal(38) products, weight by exact integer counts, and
    * grid e6 as a single chain; zero-count terms vanish by the
    * x·ln(x)→0 convention, encoded identically as CASE/when. Ranking
    * is (g2_e6 DESC, w) — the gridded integer.
    *
    * Scale: tf collapses map-side; word/source totals are broadcast
    * frames; rank windows ride per-source vocabularies (q130/q142
    * two-phase caveat). Output 20×sources rows.
    */
  def q338(s: SparkSession, dir: String): DataFrame = {
    val tf = t(s, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w")).agg(count(lit(1)).as("o11"))
      .localCheckpoint(true)
    val srcTot = tf.groupBy(col("source")).agg(sum(col("o11")).as("r1"))
    val wordTot = tf.groupBy(col("w")).agg(sum(col("o11")).as("cw"))
    val nTot = tf.agg(sum(col("o11")).as("nn"))
    val term = (x: Column, num: Column, den: Column) =>
      when(x > 0L,
        x.cast("double") * log(num.cast("double") / den.cast("double")))
        .otherwise(lit(0.0))
    tf.join(broadcast(srcTot), "source")
      .join(wordTot, "w")
      .withGlobalStats(nTot)
      .select(col("source"), col("w"), col("o11"),
        (col("cw") - col("o11")).as("o12"), col("r1"),
        (col("nn") - col("r1")).as("r2"), col("cw"), col("nn"))
      .select(col("source"), col("w"), col("o11"), col("o12"),
        intScaled(
          lit(2.0) * (
            term(col("o11"), col("o11").cast(d38) * col("nn"),
              col("r1").cast(d38) * col("cw")) +
            term(col("o12"), col("o12").cast(d38) * col("nn"),
              col("r2").cast(d38) * col("cw"))),
          1000000L).as("g2_e6"))
      // keyness = over-representation: keep words whose source share
      // exceeds the corpus share (the G² is two-sided otherwise)
      .filter(col("o11").cast(d38) * col("nn") >
        col("r1").cast(d38) * (col("o11") + col("o12")))
      .withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy(col("g2_e6").desc, col("w"))))
      .filter(col("rk") <= 20)
      .select(col("source"), col("w"), col("o11"), col("o12"), col("g2_e6"))
      .orderBy("source", "w")
  }

  /** q339 — Theil-T inequality decomposition of customer revenue BY
    * market segment: the within-segment Theil index per segment plus
    * each segment's between-group contribution — the property Gini
    * (q332) lacks: Theil is ADDITIVELY decomposable, so
    * T_total = Σ_g w_g·T_g + Σ_g between_g tells you whether revenue
    * inequality lives inside segments or between them, which is the
    * actionable split (segment-level pricing vs within-segment
    * account concentration).
    *
    * Float discipline: each customer's ln(xᵢ·n/S) is per-row gridded
    * e9 (exact-integer ratio into one mirrored ln — q294 pattern);
    * T_g = Σ xᵢ·gᵢ / S_g is then an exact decimal(38) weighted sum
    * with ONE mirrored division; the between term is one mirrored
    * chain per segment off exact integers. Margins in Round10Spec.
    *
    * Scale: customer collapse map-side (the q332 shape); per-row ln
    * on the customer dimension; segment-bounded output.
    */
  def q339(s: SparkSession, dir: String): DataFrame = {
    val rev = t(s, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(cents(col("o_totalprice"))).as("x"))
      .join(t(s, dir, "customer")
        .select(col("c_custkey").as("o_custkey"), col("c_mktsegment")),
        "o_custkey")
      .localCheckpoint(true) // consumers: global totals + per-segment
    val glob = rev.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    val seg = rev.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("ng"), sum(col("x")).as("sg"))
    val g = rev.join(broadcast(seg), "c_mktsegment")
      .select(col("c_mktsegment"), col("x"), col("ng"), col("sg"),
        intScaled(log((col("x").cast(d38) * col("ng")).cast("double") /
          col("sg").cast("double")), 1000000000L).as("lg"))
      .groupBy(col("c_mktsegment"))
      .agg(max(col("ng")).as("ng"), max(col("sg")).as("sg"),
        sum(col("x").cast(d38) * col("lg")).as("wl"))
    g.withGlobalStats(glob)
      .select(col("c_mktsegment"), col("ng").as("n_customers"),
        col("sg").as("total_cents"),
        when(col("sg") > 0L, intScaled(
          col("wl").cast("double") / col("sg").cast("double"),
          1L)).as("theil_within_e9"),
        when(col("sg") > 0L, intScaled(
          col("sg").cast("double") / col("sx").cast("double") *
            log((col("sg").cast(d38) * col("n")).cast("double") /
              (col("sx").cast(d38) * col("ng")).cast("double")),
          1000000000L)).as("between_e9"))
      .orderBy("c_mktsegment")
  }

  /** q340 — Kendall tau-b agreement between two brand rankings:
    * brands ranked by total revenue vs by total quantity sold. The
    * RANK-agreement companion to q264's Spearman — tau counts
    * concordant/discordant PAIRS (robust to outlier gaps between
    * adjacent ranks) with the tau-b tie correction, and is the
    * standard answer to "do these two league tables actually agree".
    *
    * All-integer core: brand aggregates are exact cents/quantities,
    * concordance comparisons are exact sign tests over the brand×brand
    * pair frame, tie counts are exact; tau-b is ONE mirrored
    * (C−D)/√((P−Tx)·(P−Ty)) chain e6.
    *
    * Scale: lineitem collapses map-side to the ~25-brand dimension
    * after a broadcast part join; the pair frame is brands² —
    * domain-bounded. One-row output.
    */
  def q340(s: SparkSession, dir: String): DataFrame = {
    val byBrand = t(s, dir, "lineitem")
      .join(t(s, dir, "part")
        .select(col("p_partkey").as("l_partkey"), col("p_brand")),
        "l_partkey")
      .groupBy(col("p_brand"))
      .agg(sum(cents(col("l_extendedprice"))).as("xr"),
        sum(col("l_quantity").cast("long")).as("xq"))
      .localCheckpoint(true) // both sides of the pair frame
    val a = byBrand.select(col("p_brand").as("ba"), col("xr").as("ra"),
      col("xq").as("qa"))
    val b = byBrand.select(col("p_brand").as("bb"), col("xr").as("rb"),
      col("xq").as("qb"))
    val pairs = a.join(broadcast(b), col("ba") < col("bb"))
      .select(
        (signum((col("ra") - col("rb")).cast("double")) *
          signum((col("qa") - col("qb")).cast("double"))).cast("long")
          .as("cd"),
        (col("ra") === col("rb")).cast("long").as("tx"),
        (col("qa") === col("qb")).cast("long").as("ty"))
    pairs.agg(count(lit(1)).as("n_pairs"),
        sum(when(col("cd") === 1L, 1L).otherwise(0L)).as("concordant"),
        sum(when(col("cd") === -1L, 1L).otherwise(0L)).as("discordant"),
        sum(col("tx")).as("ties_x"), sum(col("ty")).as("ties_y"))
      .select(col("n_pairs"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"),
        when((col("n_pairs") - col("ties_x")) *
          (col("n_pairs") - col("ties_y")) > 0L,
          intScaled(
            (col("concordant") - col("discordant")).cast("double") /
              sqrt(((col("n_pairs") - col("ties_x")).cast(d38) *
                (col("n_pairs") - col("ties_y"))).cast("double")),
            1000000L)).as("tau_b_e6"))
  }

  /** q341 — Mann-Kendall trend test on the zero-filled daily order
    * count series: S = Σ_{i<j} sgn(xⱼ−xᵢ), the tie-corrected variance,
    * and the continuity-corrected z. The SIGNIFICANCE test behind
    * q301's Theil-Sen slope (same sign structure — MK is literally
    * the test for which Theil-Sen is the estimator): "is there a
    * monotone trend at all" before "how steep".
    *
    * All-integer core: S and the tie spectrum are exact integer
    * counts (pair signs over the day grid); Var(S) =
    * [n(n−1)(2n+5) − Σ t(t−1)(2t+5)]/18 rides decimal(38); z is ONE
    * mirrored chain with the exact-integer continuity branch
    * (S>0/S<0/S=0 decided on the exact integer).
    *
    * Scale: orders collapse to the calendar grid map-side; the pair
    * frame is days² — CALENDAR-bounded (grows with years², not with
    * data; ~7M pairs for a decade), and never touches row-scale data.
    */
  def q341(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // pair sides + tie spectrum
    val a = grid.select(col("day").as("di"), col("x").as("xi"))
    val b = grid.select(col("day").as("dj"), col("x").as("xj"))
    val sAgg = a.join(broadcast(b), col("di") < col("dj"))
      .agg(sum(signum((col("xj") - col("xi")).cast("double")).cast("long"))
        .as("s"), count(lit(1)).as("n_pairs"))
    val ties = grid.groupBy(col("x")).agg(count(lit(1)).as("tcnt"))
      .agg(coalesce(sum(col("tcnt").cast(d38) * (col("tcnt") - 1L) *
        (lit(2L) * col("tcnt") + 5L)), lit(0L).cast(d38)).as("tsum"))
    val n = grid.agg(count(lit(1)).as("n"))
    sAgg.withGlobalStats(ties).withGlobalStats(n)
      .select(col("n").as("n_days"), col("s"),
        ((col("n").cast(d38) * (col("n") - 1L) * (lit(2L) * col("n") + 5L) -
          col("tsum"))).as("var18"))
      .select(col("n_days"), col("s"),
        when(col("var18") > 0L, intScaled(
          when(col("s") > 0L, (col("s") - 1L).cast("double"))
            .when(col("s") < 0L, (col("s") + 1L).cast("double"))
            .otherwise(lit(0.0)) /
            sqrt(col("var18").cast("double") / lit(18.0)),
          1000000L)).as("z_e6"))
  }

  /** q342 — unnormalized Haar wavelet detail energy of the daily
    * order-count series at dyadic scales 2¹..2⁶: at which time scale
    * does the variation live? A weekly cycle concentrates energy at
    * the 4-8 day scales, campaign bursts at their duration's scale —
    * the SCALE-resolved companion to q334's lag-resolved ACF, and the
    * multi-resolution screen a capacity planner reads.
    *
    * All-integer core (strongest certificate class): block sums and
    * Haar differences d = S_left − S_right are exact integers on the
    * zero-filled grid (series truncated to the largest complete
    * 2⁶ multiple so every level is complete); level energies Σd² ride
    * decimal(38); only the energy SHARE is one mirrored division e6.
    *
    * Scale: the grid collapse is map-side; each level is a combiner
    * groupBy on (day DIV 2ᵏ) — calendar-bounded; 6-row output.
    */
  def q342(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = daily
      .agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(col("d0"),
        expr("(d1 - d0 + 1) DIV 64 * 64").as("len"))
    val grid = span.filter(col("len") >= 64L)
      .select(col("d0"), explode(sequence(lit(0L), col("len") - 1L)).as("t"))
      .join(daily.withColumnRenamed("day", "dd"),
        col("dd") === col("d0") + col("t"), "left")
      .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // six level aggs
    val levels = (1 to 6).map { k =>
      val half = 1L << (k - 1)
      grid
        .select(expr(s"t DIV ${1L << k}").as("blk"),
          when(expr(s"t DIV $half") % 2L === 0L, col("x"))
            .otherwise(-col("x")).as("sx"))
        .groupBy(col("blk")).agg(sum(col("sx")).as("d"))
        .agg(sum(col("d").cast(d38) * col("d")).as("energy"),
          count(lit(1)).as("n_blocks"))
        .select(lit(k.toLong).as("scale_days_log2"), col("n_blocks"),
          col("energy").cast("long").as("energy"))
    }
    val all = levels.reduce(_ unionAll _).localCheckpoint(true)
    val tot = all.agg(sum(col("energy")).as("te"))
    all.withGlobalStats(tot)
      .select(col("scale_days_log2"), col("n_blocks"), col("energy"),
        when(col("te") > 0L, intScaled(
          col("energy").cast("double") / col("te").cast("double"),
          1000000L)).as("share_e6"))
      .orderBy("scale_days_log2")
  }

  /** q343 — Wald-Wolfowitz runs test on the daily order-count series:
    * is the above/below-median sign sequence RANDOM, or does it
    * cluster (momentum) / alternate (overcorrection)? The
    * distribution-free randomness screen that complements q334 (ACF
    * measures linear memory; runs catch any sign-pattern structure)
    * and q251 (CUSUM localizes a shift; runs tests the whole series).
    * Days equal to the median are excluded (the standard dichotomy).
    *
    * All-integer core: the median is the exact lower-median of the
    * value-collapsed frequency table (q250's integer quantile
    * discipline); signs, run count R, and n± are exact integers;
    * E[R] and Var[R] ride exact integer products in decimal(38) and
    * z = (R−E)/√Var is ONE mirrored chain e6.
    *
    * Scale: calendar-grid collapse map-side; one day-ordered window
    * pass for run breaks (calendar-bounded); one-row output.
    */
  def q343(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span
      .select(explode(sequence(col("d0"), col("d1"))).as("day"))
      .join(daily, Seq("day"), "left")
      .select(col("day"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // median + sign pass
    // exact lower median off the value-collapsed frequency table
    val med = grid.groupBy(col("x")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(
        Window.orderBy(col("x"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withGlobalStats(grid.agg(count(lit(1)).as("n")))
      .filter(col("cum") * 2L >= col("n"))
      .agg(min(col("x")).as("med"))
    val signs = grid.withGlobalStats(med)
      .filter(col("x") =!= col("med"))
      .select(col("day"), (col("x") > col("med")).cast("long").as("sgn"))
    val w = Window.orderBy("day")
    val runs = signs
      .withColumn("brk", when(lag(col("sgn"), 1).over(w).isNull ||
        lag(col("sgn"), 1).over(w) =!= col("sgn"), 1L).otherwise(0L))
      .agg(sum(col("brk")).as("r"), sum(col("sgn")).as("n_plus"),
        sum(lit(1L) - col("sgn")).as("n_minus"))
    runs.select(col("r"), col("n_plus"), col("n_minus"),
      when(col("n_plus") > 0L && col("n_minus") > 0L &&
        col("n_plus") + col("n_minus") > 1L, intScaled(
        (col("r").cast("double") -
          (lit(2.0) * col("n_plus").cast("double") *
            col("n_minus").cast("double") /
            (col("n_plus") + col("n_minus")).cast("double") + lit(1.0))) /
          sqrt((lit(2L).cast(d38) * col("n_plus") * col("n_minus") *
            (lit(2L).cast(d38) * col("n_plus") * col("n_minus") -
              col("n_plus") - col("n_minus"))).cast("double") /
            ((col("n_plus") + col("n_minus")).cast(d38) *
              (col("n_plus") + col("n_minus")) *
              (col("n_plus") + col("n_minus") - 1L)).cast("double")),
        1000000L)).as("z_e6"))
  }

  /** q344 — CDC chunk-size distribution per source: count, exact mean
    * (e2), and the exact 95th-percentile chunk size from the q289
    * byte-scan chunker. The capacity-planning view of content-defined
    * chunking — expected chunk size ≈ 16 bytes under the 1/16 boundary
    * rate, and a source whose p95 balloons (boundary-poor payloads,
    * e.g. low-entropy runs) will hot-spot any fixed-size chunk store.
    * ALSO a second, independent oracle certificate for the byte-scan
    * path: the DuckDB side recomputes the chunks RELATIONALLY (the
    * q289 SQL shape), so matching here re-proves byte-scan ≡
    * relational on a different statistic.
    *
    * Exactness: sizes/counts exact integers; mean is one mirrored
    * division e2; p95 is the exact integer inverted-CDF rank
    * (smallest size with 20·cum ≥ 19·n — the q250 discipline).
    *
    * Scale: rides the q289 production path (map-side byte scan,
    * ~bytes/16 chunk rows); the freq frame is size-value-collapsed
    * before any window.
    */
  def q344(s: SparkSession, dir: String): DataFrame = {
    val freq = graft.ext.Multimodal.cdcChunksByteScan(s, dir)
      .groupBy(col("source"), col("n_bytes"))
      .agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy("source").orderBy("n_bytes")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy("source")
    freq
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .withColumn("tot", sum(col("n_bytes") * col("cnt")).over(wAll))
      .groupBy(col("source"))
      .agg(max(col("n")).as("n_chunks"),
        max(col("tot")).as("total_bytes"),
        min(when(col("cum") * 20L >= col("n") * 19L, col("n_bytes")))
          .as("p95_bytes"))
      .select(col("source"), col("n_chunks"), col("total_bytes"),
        intScaled(col("total_bytes").cast("double") /
          col("n_chunks").cast("double"), 100L).as("mean_bytes_e2"),
        col("p95_bytes"))
      .orderBy("source")
  }

  /** q345 — RLE-friendliness census of the lineitem flag columns: how
    * many value RUNS does l_returnflag form within each order's line
    * sequence, versus the minimum possible (distinct flags per
    * order)? THE physical-layout signal `ops.Layout` acts on —
    * run-length encoding and page compression pay off exactly when
    * runs are long, and sortedness_e6 says how far a
    * sort-within-order rewrite could take the column. All-integer end
    * to end (strongest certificate class).
    *
    * Scale: the run window is ORDER-KEYED (bounded ≤ 7 lines — never
    * a global row-scale window); censuses are combiner aggs. One-row
    * output.
    */
  def q345(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
    // the fixture carries duplicate (orderkey, linenumber) rows by
    // design (the dup-detection battery) — the flag tiebreak makes the
    // run sequence a TOTAL order on both engines
    val byOrder = Window.partitionBy("l_orderkey")
      .orderBy("l_linenumber", "l_returnflag")
    val runs = li
      .withColumn("brk", when(lag(col("l_returnflag"), 1).over(byOrder).isNull ||
        lag(col("l_returnflag"), 1).over(byOrder) =!= col("l_returnflag"), 1L)
        .otherwise(0L))
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("rows"), sum(col("brk")).as("runs"),
        countDistinct(col("l_returnflag")).as("best"))
    runs.agg(sum(col("rows")).as("n_rows"),
        count(lit(1)).as("n_orders"),
        sum(col("runs")).as("n_runs"),
        sum(col("best")).as("n_runs_if_sorted"))
      .select(col("n_rows"), col("n_orders"), col("n_runs"),
        col("n_runs_if_sorted"),
        intScaled(col("n_runs").cast("double") / col("n_rows").cast("double"),
          1000000L).as("run_ratio_e6"),
        intScaled(col("n_runs_if_sorted").cast("double") /
          col("n_runs").cast("double"), 1000000L).as("sortedness_e6"))
  }

  /** q346 — portable Bloom-filter false-positive-rate measurement: a
    * k=3, m=4096 Bloom filter over the distinct customer keys (md5
    * row hashes — the q114 portable-CMS discipline), probed with
    * 10,000 deterministic out-of-domain keys. The MEMBERSHIP sketch
    * missing from the q25/q97 (HLL) + q114 (CMS) shelf — and the
    * measured FPR sits next to its own prediction (1 − e^(−kn/m))^k ≈
    * (bits_set/m)^k, so the row is a self-validating calibration
    * table for join pre-filtering (the runtime-filter pattern a
    * 100 TB join uses to skip shuffle rows).
    *
    * All-integer core: bit positions, set bits, probe hits are exact;
    * measured FPR is one mirrored division e6; predicted FPR is one
    * mirrored (b/m)³ chain e6.
    *
    * Scale: the bit array is structurally ≤ m = 4096 rows → broadcast
    * to the probe join; members collapse to the key dimension first;
    * probes are a generated frame (no data scan).
    */
  def q346(s: SparkSession, dir: String): DataFrame = {
    val k = 3
    val m = 4096L
    def pos(key: Column, i: Column): Column =
      (conv(substring(md5(concat(i.cast("string"), lit(":"), key)), 1, 8),
        16, 10).cast("long") % m).as("pos")
    val members = t(s, dir, "orders")
      .select(col("o_custkey").cast("string").as("key")).distinct()
      .localCheckpoint(true) // count + bit fan-out
    val bits = members
      .select(col("key"), explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(pos(col("key"), col("i")))
      .distinct()
    val probes = s.range(1L, 10001L)
      .select(concat(lit("probe:"), col("id").cast("string")).as("key"))
    val probeHits = probes
      .select(col("key"), explode(sequence(lit(0), lit(k - 1))).as("i"))
      .select(col("key"), pos(col("key"), col("i")))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy(col("key"))
      .agg(min(coalesce(col("hit"), lit(0L))).as("all_set"))
    val nb = bits.agg(count(lit(1)).as("n_bits_set"))
    val nm = members.agg(count(lit(1)).as("n_members"))
    probeHits.agg(count(lit(1)).as("n_probes"),
        sum(col("all_set")).as("n_false_pos"))
      .withGlobalStats(nb).withGlobalStats(nm)
      .select(col("n_members"), col("n_bits_set"), col("n_probes"),
        col("n_false_pos"),
        intScaled(col("n_false_pos").cast("double") /
          col("n_probes").cast("double"), 1000000L).as("fpr_e6"),
        intScaled(
          col("n_bits_set").cast("double") / lit(4096.0) *
            (col("n_bits_set").cast("double") / lit(4096.0)) *
            (col("n_bits_set").cast("double") / lit(4096.0)),
          1000000L).as("fpr_pred_e6"))
  }

  /** The four ln(w) constants for q347 as shared decimal literals
    * (q331's discipline — no cross-engine libm-on-literal exposure).
    */
  private val lnW: Map[Int, String] = Map(
    8 -> "2.0794415416798357", 16 -> "2.772588722239781",
    32 -> "3.4657359027997265", 64 -> "4.1588830833596715")

  /** Shared SPELLING of the ln(w)·1e9 grid points — the same CASE text
    * runs through Spark's parser and DuckDB (decimal-exact on both).
    */
  private val lnWCase: String =
    "CASE " + lnW.toSeq.sortBy(_._1).map { case (wv, l) =>
      s"WHEN w = $wv THEN " +
        s"CAST(ROUND(CAST($l AS DECIMAL(28,16)) * 1000000000) AS BIGINT)"
    }.mkString(" ") + " END"

  /** q347 — Hurst exponent by rescaled-range (R/S) analysis of the
    * daily order-count series: mean R/S over complete blocks at
    * dyadic sizes w ∈ {8,16,32,64}, and the Hurst estimate as the
    * log-log OLS slope. THE long-memory summary the rest of the
    * time-series shelf implies but never states — H ≈ 0.5 is
    * memoryless, H > 0.5 persistent (q334's slow ACF decay,
    * quantified), H < 0.5 mean-reverting — and the number capacity
    * planning plugs into self-similar traffic models.
    *
    * Float discipline: per block, R/S = (maxW − minW)/√(w·Q − S²)
    * where W_j = w·cumsum − (j+1)·S — EXACT integer numerator and
    * sqrt-arg, ONE mirrored chain per block gridded e6; mean R/S per
    * size is an exact integer sum with one mirrored division; its ln
    * is e9-gridded; the final slope is exact decimal(38) OLS over the
    * four (ln w literal, gridded ln mean) points with one mirrored
    * division e6 (q328 discipline).
    *
    * Scale: per-size windows are BLOCK-keyed (≤ 64 rows); block
    * frames are calendar-bounded; the OLS runs on 4 rows.
    */
  def q347(s: SparkSession, dir: String): DataFrame = {
    val daily = t(s, dir, "orders")
      .select(datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long").as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("x"))
    val span = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
    val grid = span
      .select(col("d0"), explode(sequence(lit(0L), col("d1") - col("d0")))
        .as("t"))
      .join(daily.withColumnRenamed("day", "dd"),
        col("dd") === col("d0") + col("t"), "left")
      .select(col("t"), coalesce(col("x"), lit(0L)).as("x"))
      .localCheckpoint(true) // four per-size passes
    val n = grid.agg(count(lit(1)).as("n"))
    val sizes = Seq(8, 16, 32, 64)
    val perSize = sizes.map { w =>
      val wl = w.toLong
      val blkW = Window.partitionBy("blk").orderBy("t")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      grid.withGlobalStats(n)
        .filter(col("t") < expr(s"n DIV $wl") * wl)
        .select(expr(s"t DIV $wl").as("blk"), col("t"), col("x"))
        .withColumn("cum", sum(col("x")).over(blkW))
        .withColumn("j", row_number().over(
          Window.partitionBy("blk").orderBy("t")))
        .withColumn("sb_all",
          sum(col("x")).over(Window.partitionBy("blk")))
        .withColumn("wj",
          lit(wl) * col("cum") - col("j") * col("sb_all"))
        .groupBy(col("blk"))
        .agg(max(col("sb_all")).as("sb"),
          sum(col("x").cast(d38) * col("x")).as("qb"),
          max(col("wj")).as("maxw"), min(col("wj")).as("minw"))
        .select(
          when(lit(wl).cast(d38) * col("qb") -
            col("sb").cast(d38) * col("sb") > 0L,
            intScaled(
              (col("maxw") - col("minw")).cast("double") /
                sqrt((lit(wl).cast(d38) * col("qb") -
                  col("sb").cast(d38) * col("sb")).cast("double")),
              1000000L)).as("rs"))
        .filter(col("rs").isNotNull)
        .agg(count(lit(1)).as("n_blocks"), sum(col("rs")).as("srs"))
        .select(lit(wl).as("w"), col("n_blocks"), col("srs"))
    }
    val rows = perSize.reduce(_ unionAll _)
      .select(col("w"), col("n_blocks"),
        when(col("n_blocks") > 0L, intScaled(
          col("srs").cast("double") / col("n_blocks").cast("double"),
          1L)).as("mean_rs_e6"))
      .localCheckpoint(true) // output + the OLS side
    val pts = rows.filter(col("mean_rs_e6").isNotNull)
      .select(col("w"), col("mean_rs_e6"),
        expr(lnWCase).as("lx"),
        intScaled(log(col("mean_rs_e6").cast("double") / lit(1000000.0)),
          1000000000L).as("ly"))
    val ols = pts.agg(count(lit(1)).as("np"),
        sum(col("lx")).as("sx"), sum(col("ly")).as("sy"),
        sum(col("lx").cast(d38) * col("ly")).as("sxy"),
        sum(col("lx").cast(d38) * col("lx")).as("sxx"))
      .select(
        when(col("np").cast(d38) * col("sxx") -
          col("sx").cast(d38) * col("sx") > 0L,
          intScaled(
            (col("np").cast(d38) * col("sxy") -
              col("sx").cast(d38) * col("sy")).cast("double") /
              (col("np").cast(d38) * col("sxx") -
                col("sx").cast(d38) * col("sx")).cast("double"),
            1000000L)).as("hurst_e6"))
    rows.withGlobalStats(ols).orderBy("w")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q344_cdc_sizes" -> (q344 _),
    "q345_rle_runs" -> (q345 _),
    "q346_bloom_fpr" -> (q346 _),
    "q347_hurst_rs" -> (q347 _),
    "q339_theil_decomposition" -> (q339 _),
    "q340_kendall_tau" -> (q340 _),
    "q341_mann_kendall" -> (q341 _),
    "q342_haar_energy" -> (q342 _),
    "q343_runs_test" -> (q343 _),
    "q331_benford_audit" -> (q331 _),
    "q332_gini_concentration" -> (q332 _),
    "q333_jackknife_ratio" -> (q333 _),
    "q334_daily_acf" -> (q334 _),
    "q335_capture_recapture" -> (q335 _),
    "q336_degeneration_runs" -> (q336 _),
    "q337_burrows_delta" -> (q337 _),
    "q338_g2_keyness" -> (q338 _))

  val oracleSql: Map[String, String] = Map(
    // Relational CDC chunks (the q289 oracle shape) → size-collapsed
    // freq table, exact inverted-CDF p95, one mirrored mean division.
    // Matching the Spark byte-scan side re-proves byte ≡ relational
    // on a second statistic.
    "q344_cdc_sizes" ->
      """WITH pos AS (
        |  SELECT source, doc_id, text,
        |         CAST(UNNEST(range(1, len(text) + 1)) AS BIGINT) AS p
        |  FROM documents),
        |b AS (
        |  SELECT source, doc_id, p,
        |         CASE WHEN p >= 8 AND
        |                   substr(md5(substr(text, CAST(p AS INT) - 7, 8)),
        |                          1, 1) = '0'
        |              THEN 1 ELSE 0 END AS bnd
        |  FROM pos),
        |cix AS (
        |  SELECT source, doc_id, p,
        |         SUM(bnd) OVER (PARTITION BY doc_id ORDER BY p) AS chunk_idx
        |  FROM b),
        |chunks AS (
        |  SELECT source, doc_id, chunk_idx,
        |         CAST(COUNT(*) AS BIGINT) AS n_bytes
        |  FROM cix GROUP BY source, doc_id, chunk_idx),
        |freq AS (
        |  SELECT source, n_bytes, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM chunks GROUP BY source, n_bytes),
        |c2 AS (
        |  SELECT source, n_bytes, cnt,
        |         SUM(cnt) OVER (PARTITION BY source ORDER BY n_bytes
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(cnt) OVER (PARTITION BY source) AS n,
        |         SUM(n_bytes * cnt) OVER (PARTITION BY source) AS tot
        |  FROM freq)
        |SELECT source, CAST(MAX(n) AS BIGINT) AS n_chunks,
        |       CAST(MAX(tot) AS BIGINT) AS total_bytes,
        |       CAST(ROUND(CAST(MAX(tot) AS DOUBLE) / CAST(MAX(n) AS DOUBLE)
        |         * 100) AS BIGINT) AS mean_bytes_e2,
        |       CAST(MIN(CASE WHEN cum * 20 >= n * 19 THEN n_bytes END)
        |            AS BIGINT) AS p95_bytes
        |FROM c2 GROUP BY source ORDER BY source""".stripMargin,
    // Same order-keyed lag runs, all-integer censuses, two mirrored
    // ratio divisions.
    "q345_rle_runs" ->
      """WITH runs AS (
        |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nrows,
        |         CAST(SUM(CASE WHEN prev IS NULL OR prev <> l_returnflag
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS runs,
        |         CAST(COUNT(DISTINCT l_returnflag) AS BIGINT) AS best
        |  FROM (SELECT l_orderkey, l_returnflag,
        |               LAG(l_returnflag) OVER (PARTITION BY l_orderkey
        |                 ORDER BY l_linenumber, l_returnflag) AS prev
        |        FROM lineitem)
        |  GROUP BY l_orderkey)
        |SELECT CAST(SUM(nrows) AS BIGINT) AS n_rows,
        |       CAST(COUNT(*) AS BIGINT) AS n_orders,
        |       CAST(SUM(runs) AS BIGINT) AS n_runs,
        |       CAST(SUM(best) AS BIGINT) AS n_runs_if_sorted,
        |       CAST(ROUND(CAST(SUM(runs) AS DOUBLE)
        |         / CAST(SUM(nrows) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS run_ratio_e6,
        |       CAST(ROUND(CAST(SUM(best) AS DOUBLE)
        |         / CAST(SUM(runs) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS sortedness_e6
        |FROM runs""".stripMargin,
    // Same md5 positions, distinct bit set, all-hit probe fold, two
    // mirrored FPR chains.
    "q346_bloom_fpr" ->
      """WITH members AS (
        |  SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS key FROM orders),
        |bits AS (
        |  SELECT DISTINCT
        |    CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' || key),
        |                         1, 8)) AS BIGINT) % 4096 AS pos
        |  FROM members CROSS JOIN range(3) i(i)),
        |probes AS (
        |  SELECT 'probe:' || CAST(pn AS VARCHAR) AS key
        |  FROM (SELECT UNNEST(range(1, 10001)) AS pn)),
        |pp AS (
        |  SELECT key,
        |    CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':' || key),
        |                         1, 8)) AS BIGINT) % 4096 AS pos
        |  FROM probes CROSS JOIN range(3) i(i)),
        |ph AS (
        |  SELECT pp.key,
        |         MIN(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END)
        |           AS all_set
        |  FROM pp LEFT JOIN bits b ON b.pos = pp.pos
        |  GROUP BY pp.key),
        |nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM bits),
        |nm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_members FROM members)
        |SELECT n_members, n_bits_set,
        |       CAST(COUNT(*) AS BIGINT) AS n_probes,
        |       CAST(SUM(all_set) AS BIGINT) AS n_false_pos,
        |       CAST(ROUND(CAST(SUM(all_set) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT) AS fpr_e6,
        |       CAST(ROUND(CAST(n_bits_set AS DOUBLE) / 4096.0
        |         * (CAST(n_bits_set AS DOUBLE) / 4096.0)
        |         * (CAST(n_bits_set AS DOUBLE) / 4096.0) * 1000000)
        |         AS BIGINT) AS fpr_pred_e6
        |FROM ph CROSS JOIN nb CROSS JOIN nm
        |GROUP BY n_members, n_bits_set""".stripMargin,
    // Same block-keyed exact W_j walk, integer sqrt-args, shared
    // ln(w) literals, exact HUGEINT OLS, mirrored chains throughout.
    "q347_hurst_rs" -> {
      val head =
        """WITH daily AS (
          |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
          |                        CAST(o_orderdate AS DATE)) AS BIGINT)
          |           AS day,
          |         CAST(COUNT(*) AS BIGINT) AS x
          |  FROM orders GROUP BY 1),
          |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
          |grid AS (
          |  SELECT g.day - s.d0 AS t, COALESCE(d.x, 0) AS x
          |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day
          |        FROM span) g
          |  CROSS JOIN span s
          |  LEFT JOIN daily d ON d.day = g.day),
          |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grid)""".stripMargin
      val sizes = Seq(8, 16, 32, 64)
      val perSize = sizes.map { w =>
        s"""c$w AS (
           |  SELECT t // $w AS blk, x,
           |         SUM(x) OVER (PARTITION BY t // $w ORDER BY t
           |                      ROWS UNBOUNDED PRECEDING) AS cum,
           |         ROW_NUMBER() OVER (PARTITION BY t // $w ORDER BY t)
           |           AS j,
           |         SUM(x) OVER (PARTITION BY t // $w) AS sb_all
           |  FROM grid CROSS JOIN nn WHERE t < (n // $w) * $w),
           |a$w AS (
           |  SELECT blk, CAST(MAX(sb_all) AS BIGINT) AS sb,
           |         SUM(CAST(x AS HUGEINT) * x) AS qb,
           |         CAST(MAX($w * cum - j * sb_all) AS BIGINT) AS maxw,
           |         CAST(MIN($w * cum - j * sb_all) AS BIGINT) AS minw
           |  FROM c$w GROUP BY blk),
           |r$w AS (
           |  SELECT CAST(ROUND(CAST(maxw - minw AS DOUBLE) /
           |           SQRT(CAST(CAST($w AS HUGEINT) * qb
           |                - CAST(sb AS HUGEINT) * sb AS DOUBLE))
           |           * 1000000) AS BIGINT) AS rs
           |  FROM a$w
           |  WHERE CAST($w AS HUGEINT) * qb - CAST(sb AS HUGEINT) * sb > 0),
           |m$w AS (
           |  SELECT CAST($w AS BIGINT) AS w,
           |         CAST(COUNT(*) AS BIGINT) AS n_blocks,
           |         CAST(SUM(rs) AS BIGINT) AS srs
           |  FROM r$w)""".stripMargin
      }
      val tail =
        s"""rws AS (
           |  SELECT w, n_blocks,
           |         CASE WHEN n_blocks > 0 THEN
           |           CAST(ROUND(CAST(srs AS DOUBLE)
           |             / CAST(n_blocks AS DOUBLE)) AS BIGINT)
           |         END AS mean_rs_e6
           |  FROM (SELECT * FROM m8 UNION ALL SELECT * FROM m16
           |        UNION ALL SELECT * FROM m32 UNION ALL
           |        SELECT * FROM m64)),
           |pts AS (
           |  SELECT w, mean_rs_e6, $lnWCase AS lx,
           |         CAST(ROUND(ln(CAST(mean_rs_e6 AS DOUBLE) / 1000000.0)
           |           * 1000000000) AS BIGINT) AS ly
           |  FROM rws WHERE mean_rs_e6 IS NOT NULL),
           |ols AS (
           |  SELECT CAST(COUNT(*) AS BIGINT) AS np,
           |         CAST(SUM(lx) AS BIGINT) AS sx,
           |         CAST(SUM(ly) AS BIGINT) AS sy,
           |         SUM(CAST(lx AS HUGEINT) * ly) AS sxy,
           |         SUM(CAST(lx AS HUGEINT) * lx) AS sxx
           |  FROM pts),
           |h AS (
           |  SELECT CASE WHEN CAST(np AS HUGEINT) * sxx
           |                   - CAST(sx AS HUGEINT) * sx > 0 THEN
           |    CAST(ROUND(CAST(CAST(np AS HUGEINT) * sxy
           |          - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
           |        CAST(CAST(np AS HUGEINT) * sxx
           |          - CAST(sx AS HUGEINT) * sx AS DOUBLE) * 1000000)
           |      AS BIGINT) END AS hurst_e6
           |  FROM ols)
           |SELECT w, n_blocks, mean_rs_e6, hurst_e6
           |FROM rws CROSS JOIN h ORDER BY w""".stripMargin
      (head +: perSize :+ tail).mkString(",\n")
    },
    // Same customer collapse, per-row e9 ln grid off exact HUGEINT
    // ratios, exact weighted sums, mirrored within/between chains.
    "q339_theil_decomposition" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS x
        |  FROM orders GROUP BY o_custkey),
        |j AS (
        |  SELECT c.c_mktsegment, rev.x
        |  FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey),
        |gtot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |                CAST(SUM(x) AS BIGINT) AS sx FROM j),
        |seg AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS ng,
        |         CAST(SUM(x) AS BIGINT) AS sg
        |  FROM j GROUP BY c_mktsegment),
        |g AS (
        |  SELECT j.c_mktsegment, seg.ng, seg.sg,
        |         SUM(CAST(j.x AS HUGEINT) *
        |           CAST(ROUND(ln(CAST(CAST(j.x AS HUGEINT) * seg.ng
        |               AS DOUBLE) / CAST(seg.sg AS DOUBLE)) * 1000000000)
        |             AS BIGINT)) AS wl
        |  FROM j JOIN seg ON seg.c_mktsegment = j.c_mktsegment
        |  GROUP BY j.c_mktsegment, seg.ng, seg.sg)
        |SELECT c_mktsegment, ng AS n_customers, sg AS total_cents,
        |  CASE WHEN sg > 0 THEN
        |    CAST(ROUND(CAST(wl AS DOUBLE) / CAST(sg AS DOUBLE)) AS BIGINT)
        |  END AS theil_within_e9,
        |  CASE WHEN sg > 0 THEN
        |    CAST(ROUND(CAST(sg AS DOUBLE) / CAST(sx AS DOUBLE) *
        |      ln(CAST(CAST(sg AS HUGEINT) * n AS DOUBLE) /
        |         CAST(CAST(sx AS HUGEINT) * ng AS DOUBLE)) * 1000000000)
        |      AS BIGINT)
        |  END AS between_e9
        |FROM g CROSS JOIN gtot
        |ORDER BY c_mktsegment""".stripMargin,
    // Same brand collapse, exact sign pairs, tau-b tie correction,
    // one mirrored sqrt division.
    "q340_kendall_tau" ->
      """WITH bb AS (
        |  SELECT p.p_brand,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS xr,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS xq
        |  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |  GROUP BY p.p_brand),
        |pr AS (
        |  SELECT CAST(SIGN(CAST(a.xr - b.xr AS DOUBLE)) *
        |              SIGN(CAST(a.xq - b.xq AS DOUBLE)) AS BIGINT) AS cd,
        |         CASE WHEN a.xr = b.xr THEN 1 ELSE 0 END AS tx,
        |         CASE WHEN a.xq = b.xq THEN 1 ELSE 0 END AS ty
        |  FROM bb a JOIN bb b ON a.p_brand < b.p_brand),
        |agg AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
        |         CAST(SUM(CASE WHEN cd = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS concordant,
        |         CAST(SUM(CASE WHEN cd = -1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS discordant,
        |         CAST(SUM(tx) AS BIGINT) AS ties_x,
        |         CAST(SUM(ty) AS BIGINT) AS ties_y
        |  FROM pr)
        |SELECT n_pairs, concordant, discordant, ties_x, ties_y,
        |  CASE WHEN (n_pairs - ties_x) * (n_pairs - ties_y) > 0 THEN
        |    CAST(ROUND(CAST(concordant - discordant AS DOUBLE) /
        |      SQRT(CAST(CAST(n_pairs - ties_x AS HUGEINT)
        |                * (n_pairs - ties_y) AS DOUBLE)) * 1000000)
        |      AS BIGINT)
        |  END AS tau_b_e6
        |FROM agg""".stripMargin,
    // Same zero-filled grid, exact pair signs, tie-spectrum variance,
    // continuity-corrected mirrored z.
    "q341_mann_kendall" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day FROM span) g
        |  LEFT JOIN daily d ON d.day = g.day),
        |sa AS (
        |  SELECT CAST(SUM(CAST(SIGN(CAST(b.x - a.x AS DOUBLE)) AS BIGINT))
        |              AS BIGINT) AS s
        |  FROM grid a JOIN grid b ON a.day < b.day),
        |ties AS (
        |  SELECT COALESCE(SUM(CAST(tcnt AS HUGEINT) * (tcnt - 1)
        |           * (2 * tcnt + 5)), 0) AS tsum
        |  FROM (SELECT x, CAST(COUNT(*) AS BIGINT) AS tcnt
        |        FROM grid GROUP BY x)),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grid),
        |v AS (
        |  SELECT nn.n, sa.s,
        |         CAST(nn.n AS HUGEINT) * (nn.n - 1) * (2 * nn.n + 5)
        |           - ties.tsum AS var18
        |  FROM sa CROSS JOIN ties CROSS JOIN nn)
        |SELECT n AS n_days, s,
        |  CASE WHEN var18 > 0 THEN
        |    CAST(ROUND((CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
        |                     WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
        |                     ELSE 0.0 END) /
        |      SQRT(CAST(var18 AS DOUBLE) / 18.0) * 1000000) AS BIGINT)
        |  END AS z_e6
        |FROM v""".stripMargin,
    // Same complete-64 truncation, integer-DIV blocks, exact Haar
    // differences, HUGEINT energies, one mirrored share division.
    "q342_haar_energy" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |span AS (
        |  SELECT MIN(day) AS d0, (MAX(day) - MIN(day) + 1) // 64 * 64 AS len
        |  FROM daily),
        |grid AS (
        |  SELECT g.t, COALESCE(d.x, 0) AS x
        |  FROM (SELECT UNNEST(generate_series(0, len - 1)) AS t
        |        FROM span WHERE len >= 64) g
        |  LEFT JOIN daily d ON d.day = (SELECT d0 FROM span) + g.t),
        |lv AS (
        |  SELECT k.k AS scale_days_log2, g.t // (1 << k.k) AS blk,
        |         CASE WHEN (g.t // (1 << (k.k - 1))) % 2 = 0
        |              THEN g.x ELSE -g.x END AS sx
        |  FROM grid g CROSS JOIN (SELECT UNNEST(range(1, 7)) AS k) k),
        |d AS (
        |  SELECT scale_days_log2, blk, CAST(SUM(sx) AS BIGINT) AS d
        |  FROM lv GROUP BY 1, 2),
        |e AS (
        |  SELECT CAST(scale_days_log2 AS BIGINT) AS scale_days_log2,
        |         CAST(COUNT(*) AS BIGINT) AS n_blocks,
        |         CAST(SUM(CAST(d AS HUGEINT) * d) AS BIGINT) AS energy
        |  FROM d GROUP BY 1),
        |tot AS (SELECT CAST(SUM(energy) AS BIGINT) AS te FROM e)
        |SELECT scale_days_log2, n_blocks, energy,
        |  CASE WHEN te > 0 THEN
        |    CAST(ROUND(CAST(energy AS DOUBLE) / CAST(te AS DOUBLE)
        |      * 1000000) AS BIGINT)
        |  END AS share_e6
        |FROM e CROSS JOIN tot
        |ORDER BY scale_days_log2""".stripMargin,
    // Same exact lower median, sign sequence, run breaks, mirrored
    // Wald-Wolfowitz z.
    "q343_runs_test" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day FROM span) g
        |  LEFT JOIN daily d ON d.day = g.day),
        |freq AS (
        |  SELECT x, CAST(COUNT(*) AS BIGINT) AS cnt,
        |         SUM(COUNT(*)) OVER (ORDER BY x
        |           ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM grid GROUP BY x),
        |nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM grid),
        |med AS (
        |  SELECT CAST(MIN(x) AS BIGINT) AS med
        |  FROM freq CROSS JOIN nn WHERE cum * 2 >= n),
        |signs AS (
        |  SELECT day, CASE WHEN x > med THEN 1 ELSE 0 END AS sgn
        |  FROM grid CROSS JOIN med WHERE x <> med),
        |runs AS (
        |  SELECT CAST(SUM(CASE WHEN prev IS NULL OR prev <> sgn
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS r,
        |         CAST(SUM(sgn) AS BIGINT) AS n_plus,
        |         CAST(SUM(1 - sgn) AS BIGINT) AS n_minus
        |  FROM (SELECT sgn, LAG(sgn) OVER (ORDER BY day) AS prev
        |        FROM signs))
        |SELECT r, n_plus, n_minus,
        |  CASE WHEN n_plus > 0 AND n_minus > 0
        |            AND n_plus + n_minus > 1 THEN
        |    CAST(ROUND((CAST(r AS DOUBLE) -
        |        (2.0 * CAST(n_plus AS DOUBLE) * CAST(n_minus AS DOUBLE)
        |          / CAST(n_plus + n_minus AS DOUBLE) + 1.0)) /
        |      SQRT(CAST(CAST(2 AS HUGEINT) * n_plus * n_minus *
        |          (CAST(2 AS HUGEINT) * n_plus * n_minus
        |            - n_plus - n_minus) AS DOUBLE) /
        |        CAST(CAST(n_plus + n_minus AS HUGEINT)
        |          * (n_plus + n_minus)
        |          * (n_plus + n_minus - 1) AS DOUBLE)) * 1000000)
        |      AS BIGINT)
        |  END AS z_e6
        |FROM runs""".stripMargin,
    // Same digit projection, shared probability literals, mirrored
    // expected/chi2 chains.
    "q331_benford_audit" ->
      s"""WITH d AS (
         |  SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
         |           * 100 AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
         |  FROM orders),
         |h AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs
         |      FROM d GROUP BY digit),
         |tot AS (SELECT CAST(SUM(n_obs) AS BIGINT) AS n FROM h),
         |p AS (SELECT digit, n_obs, n, CAST(($benfordCase) AS DOUBLE) AS p
         |      FROM h CROSS JOIN tot)
         |SELECT digit, n_obs,
         |  CAST(ROUND(CAST(n_obs AS DOUBLE) / CAST(n AS DOUBLE) * 1000000)
         |       AS BIGINT) AS p_obs_e6,
         |  CAST(ROUND(p * 1000000) AS BIGINT) AS p_benford_e6,
         |  CAST(ROUND((CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) *
         |             (CAST(n_obs AS DOUBLE) - CAST(n AS DOUBLE) * p) /
         |             (CAST(n AS DOUBLE) * p) * 1000000) AS BIGINT)
         |    AS chi2_e6
         |FROM p ORDER BY digit""".stripMargin,
    // Same exact cents, (rev, custkey) rank order, HUGEINT Σi·x, one
    // mirrored division.
    "q332_gini_concentration" ->
      """WITH rev AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS rev
        |  FROM orders GROUP BY o_custkey),
        |rk AS (
        |  SELECT c.c_mktsegment, rev.rev,
        |         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
        |                            ORDER BY rev.rev, rev.o_custkey) AS i
        |  FROM rev JOIN customer c ON c.c_custkey = rev.o_custkey),
        |a AS (
        |  SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(rev) AS BIGINT) AS total_cents,
        |         SUM(CAST(i AS HUGEINT) * rev) AS ti
        |  FROM rk GROUP BY c_mktsegment)
        |SELECT c_mktsegment, n_customers, total_cents,
        |  CASE WHEN total_cents > 0 THEN
        |    CAST(ROUND(CAST(CAST(2 AS HUGEINT) * ti
        |          - CAST(n_customers + 1 AS HUGEINT) * total_cents AS DOUBLE)
        |        / CAST(CAST(n_customers AS HUGEINT) * total_cents AS DOUBLE)
        |        * 1000000) AS BIGINT) END AS gini_e6
        |FROM a ORDER BY c_mktsegment""".stripMargin,
    // Same fact join, broadcast totals, per-row e9 leave-one-out grid,
    // exact HUGEINT moments, mirrored sqrt chain.
    "q333_jackknife_ratio" ->
      """WITH li AS (
        |  SELECT o.o_orderpriority,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |              AS BIGINT) AS p,
        |         CAST(l_quantity AS BIGINT) AS q
        |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey),
        |tot AS (
        |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(p) AS BIGINT) AS sp, CAST(SUM(q) AS BIGINT) AS sq
        |  FROM li GROUP BY o_orderpriority),
        |th AS (
        |  SELECT li.o_orderpriority, t.n, t.sp, t.sq,
        |         CASE WHEN t.sq - li.q > 0 THEN
        |           CAST(ROUND(CAST(t.sp - li.p AS DOUBLE)
        |             / CAST(t.sq - li.q AS DOUBLE) * 1000000000) AS BIGINT)
        |           - CAST(ROUND(CAST(t.sp AS DOUBLE)
        |             / CAST(t.sq AS DOUBLE) * 1000000000) AS BIGINT)
        |         END AS th
        |  FROM li JOIN tot t ON t.o_orderpriority = li.o_orderpriority),
        |m AS (
        |  SELECT o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_items,
        |         CAST(MAX(sp) AS BIGINT) AS sp, CAST(MAX(sq) AS BIGINT) AS sq,
        |         SUM(CAST(th AS HUGEINT)) AS m1,
        |         SUM(CAST(th AS HUGEINT) * th) AS m2
        |  FROM th GROUP BY o_orderpriority)
        |SELECT o_orderpriority, n_items,
        |  CAST(ROUND(CAST(sp AS DOUBLE) / CAST(sq AS DOUBLE) * 1000000)
        |       AS BIGINT) AS ratio_e6,
        |  CASE WHEN n_items > 1 THEN
        |    CAST(ROUND(SQRT(CAST(n_items - 1 AS DOUBLE) *
        |        CAST(CAST(n_items AS HUGEINT) * m2
        |             - m1 * m1 AS DOUBLE))
        |      / CAST(n_items AS DOUBLE) / 1000.0) AS BIGINT) END AS se_jk_e6
        |FROM m ORDER BY o_orderpriority""".stripMargin,
    // Same zero-filled day grid, n-scaled exact deviations, HUGEINT
    // lag products, one mirrored division per lag.
    "q334_daily_acf" ->
      """WITH daily AS (
        |  SELECT CAST(DATE_DIFF('day', DATE '1970-01-01',
        |                        CAST(o_orderdate AS DATE)) AS BIGINT) AS day,
        |         CAST(COUNT(*) AS BIGINT) AS x
        |  FROM orders GROUP BY 1),
        |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
        |grid AS (
        |  SELECT g.day, COALESCE(d.x, 0) AS x
        |  FROM (SELECT UNNEST(generate_series(d0, d1)) AS day FROM span) g
        |  LEFT JOIN daily d ON d.day = g.day),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |               CAST(SUM(x) AS BIGINT) AS sx FROM grid),
        |dev AS (
        |  SELECT day, n * x - sx AS d, n FROM grid CROSS JOIN mom),
        |den AS (SELECT CAST(MAX(n) AS BIGINT) AS n,
        |               SUM(CAST(d AS HUGEINT) * d) AS den FROM dev),
        |lagged AS (
        |  SELECT d0.day + l.lag AS day, CAST(l.lag AS BIGINT) AS lag,
        |         d0.d AS da
        |  FROM dev d0 CROSS JOIN (SELECT UNNEST(range(1, 8)) AS lag) l),
        |num AS (
        |  SELECT lg.lag, SUM(CAST(lg.da AS HUGEINT) * d1.d) AS num
        |  FROM lagged lg JOIN dev d1 ON d1.day = lg.day
        |  GROUP BY lg.lag)
        |SELECT num.lag, den.n AS n_days,
        |  CASE WHEN den.den > 0 THEN
        |    CAST(ROUND(CAST(num.num AS DOUBLE) / CAST(den.den AS DOUBLE)
        |      * 1000000) AS BIGINT) END AS acf_e6
        |FROM num CROSS JOIN den ORDER BY num.lag""".stripMargin,
    // Same per-customer period flags, exact counts, one mirrored
    // Chapman chain.
    "q335_capture_recapture" ->
      """WITH f AS (
        |  SELECT o_custkey,
        |         MAX(CASE WHEN o_orderkey % 2 = 1 THEN 1 ELSE 0 END) AS a,
        |         MAX(CASE WHEN o_orderkey % 2 = 0 THEN 1 ELSE 0 END) AS b
        |  FROM orders GROUP BY o_custkey)
        |SELECT CAST(SUM(a) AS BIGINT) AS n1, CAST(SUM(b) AS BIGINT) AS n2,
        |       CAST(SUM(a * b) AS BIGINT) AS n_both,
        |       CAST(COUNT(*) AS BIGINT) AS n_true,
        |       CAST(ROUND((CAST(SUM(a) + 1 AS DOUBLE)
        |           * CAST(SUM(b) + 1 AS DOUBLE)
        |           / CAST(SUM(a * b) + 1 AS DOUBLE) - 1.0) * 100) AS BIGINT)
        |         AS chapman_e2
        |FROM f""".stripMargin,
    // Same lag-compare run segmentation, all-integer censuses.
    "q336_degeneration_runs" ->
      """WITH toks AS (
        |  SELECT source, doc_id, i - 1 AS pos, ws[i] AS w
        |  FROM (SELECT source, doc_id, string_split(text, ' ') AS ws
        |        FROM documents)
        |  CROSS JOIN UNNEST(range(1, len(ws) + 1)) AS t(i)),
        |brk AS (
        |  SELECT source, doc_id, pos, w,
        |         CASE WHEN LAG(w) OVER (PARTITION BY doc_id ORDER BY pos)
        |                   IS DISTINCT FROM w THEN 1 ELSE 0 END AS brk
        |  FROM toks),
        |runs AS (
        |  SELECT source, doc_id,
        |         SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
        |                        ROWS UNBOUNDED PRECEDING) AS run_id
        |  FROM brk),
        |rl AS (
        |  SELECT source, doc_id, run_id, CAST(COUNT(*) AS BIGINT) AS len
        |  FROM runs GROUP BY source, doc_id, run_id),
        |dmax AS (
        |  SELECT source, doc_id, CAST(MAX(len) AS BIGINT) AS max_run
        |  FROM rl GROUP BY source, doc_id)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(MAX(max_run) AS BIGINT) AS max_run,
        |       CAST(SUM(CASE WHEN max_run >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_docs_run3
        |FROM dmax GROUP BY source ORDER BY source""".stripMargin,
    // Same top-50 total order, e9 relative-frequency grid, exact
    // moments, mirrored z chain e6, exact integer Delta mean.
    "q337_burrows_delta" ->
      """WITH tf AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |st AS (SELECT source, CAST(SUM(tf) AS BIGINT) AS st
        |       FROM tf GROUP BY source),
        |top AS (
        |  SELECT w FROM (
        |    SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(tf) DESC, w) AS rk
        |    FROM tf GROUP BY w) WHERE rk <= 50),
        |gridf AS (
        |  SELECT st.source, top.w,
        |         CAST(ROUND(CAST(COALESCE(tf.tf, 0) AS DOUBLE)
        |           / CAST(st.st AS DOUBLE) * 1000000000) AS BIGINT) AS f
        |  FROM st CROSS JOIN top
        |  LEFT JOIN tf ON tf.source = st.source AND tf.w = top.w),
        |wm AS (
        |  SELECT w, CAST(COUNT(*) AS BIGINT) AS ns,
        |         CAST(SUM(f) AS BIGINT) AS sf,
        |         SUM(CAST(f AS HUGEINT) * f) AS qf
        |  FROM gridf GROUP BY w),
        |z AS (
        |  SELECT g.source, g.w,
        |         CAST(ROUND(CAST(CAST(wm.ns AS HUGEINT) * g.f - wm.sf
        |               AS DOUBLE)
        |           / SQRT(CAST(CAST(wm.ns AS HUGEINT) * wm.qf
        |               - CAST(wm.sf AS HUGEINT) * wm.sf AS DOUBLE))
        |           * 1000000) AS BIGINT) AS z
        |  FROM gridf g JOIN wm ON wm.w = g.w
        |  WHERE CAST(wm.ns AS HUGEINT) * wm.qf
        |        - CAST(wm.sf AS HUGEINT) * wm.sf > 0)
        |SELECT a.source AS src_a, b.source AS src_b,
        |       CAST(COUNT(*) AS BIGINT) AS n_words,
        |       CAST(ROUND(CAST(SUM(ABS(a.z - b.z)) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS delta_e6
        |FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
        |GROUP BY a.source, b.source
        |ORDER BY src_a, src_b""".stripMargin,
    // Same per-row two-term x·ln chain over exact HUGEINT ratios,
    // over-representation filter, (g2 DESC, w) top-20.
    "q338_g2_keyness" ->
      """WITH tf AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS o11
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |r AS (SELECT source, CAST(SUM(o11) AS BIGINT) AS r1
        |      FROM tf GROUP BY source),
        |c AS (SELECT w, CAST(SUM(o11) AS BIGINT) AS cw FROM tf GROUP BY w),
        |nn AS (SELECT CAST(SUM(o11) AS BIGINT) AS nn FROM tf),
        |g AS (
        |  SELECT tf.source, tf.w, tf.o11, c.cw - tf.o11 AS o12,
        |         r.r1, nn.nn - r.r1 AS r2, c.cw, nn.nn
        |  FROM tf JOIN r ON r.source = tf.source
        |          JOIN c ON c.w = tf.w CROSS JOIN nn),
        |s AS (
        |  SELECT source, w, o11, o12,
        |    CAST(ROUND(2.0 * (
        |      (CASE WHEN o11 > 0 THEN CAST(o11 AS DOUBLE)
        |         * ln(CAST(CAST(o11 AS HUGEINT) * nn AS DOUBLE)
        |              / CAST(CAST(r1 AS HUGEINT) * cw AS DOUBLE))
        |        ELSE 0.0 END) +
        |      (CASE WHEN o12 > 0 THEN CAST(o12 AS DOUBLE)
        |         * ln(CAST(CAST(o12 AS HUGEINT) * nn AS DOUBLE)
        |              / CAST(CAST(r2 AS HUGEINT) * cw AS DOUBLE))
        |        ELSE 0.0 END)) * 1000000) AS BIGINT) AS g2_e6
        |  FROM g
        |  WHERE CAST(o11 AS HUGEINT) * nn > CAST(r1 AS HUGEINT) * cw),
        |rk AS (
        |  SELECT source, w, o11, o12, g2_e6,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY g2_e6 DESC, w) AS rk
        |  FROM s)
        |SELECT source, w, o11, o12, g2_e6 FROM rk WHERE rk <= 20
        |ORDER BY source, w""".stripMargin)
}
