package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Corpus-curation monitoring & planning operators — the "keep the
  * ingest honest" family that runs beside the selection/dedup stages
  * of a pretraining pipeline (SURVEY §2.4 extension family):
  *
  *  - [[q232]] PSI length-drift: the binned, per-feed population-
  *    stability alarm (the industry-standard drift score; q229's KS is
  *    the exact-ECDF cousin for ordered variables).
  *  - [[q233]] arrival overdispersion: variance-to-mean ratio of daily
  *    event counts per type — the Poisson-burstiness monitor that
  *    separates steady feeds (VMR ≈ 1) from batchy/scripted ones.
  *  - [[q234]] mixture-epoch planner: turns q134's temperature weights
  *    into an executable per-source token plan under a global budget
  *    with an epoch cap, surfacing deficits instead of silently
  *    over-epoching small sources.
  *  - [[q236]] OOV-rate audit: per-source out-of-vocabulary token mass
  *    against the corpus top-K vocabulary (q142) — the tokenizer-fit
  *    signal that flags feeds whose text the vocab under-serves.
  *
  * Reference capability anchor: the per-column profile/quality gates of
  * `/root/reference/migration.py:60-113`, generalized from static
  * point thresholds to distribution-level monitors and an actionable
  * sampling plan.
  *
  * Float discipline (CLAUDE.md): every score that passes through
  * ln/pow is rounded ONCE onto an integer grid with the identical
  * operation order on both engines, per-cell BEFORE any sum (so
  * summation-order drift cannot exist), and `CurationSpec` pins the
  * rounding-boundary margins at both gate SFs.
  */
object Curation {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** q232 — PSI (population stability index) length-drift per source:
    * for each source, PSI between ITS doc-length histogram (buckets of
    * 100 chars: `n_chars DIV 100`) and the REST of the corpus, with
    * add-one smoothing over the corpus-wide bucket grid. The classic
    * score card: PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted.
    * q229's KS answers "did the distribution move at all" exactly;
    * PSI answers "by how much, in the binned units monitoring dashboards
    * alert on".
    *
    * Exactness: all counts are integers; each bucket's term
    * (p−q)·ln(p/q) is ONE identical double expression on both engines,
    * rounded per-bucket onto the e9 grid, and PSI is the exact BIGINT
    * sum of those per-bucket integers — no float accumulation anywhere
    * (the q228 Σ-of-gridded-terms discipline).
    *
    * Scale: one corpus scan collapses to the (source × bucket) grid —
    * sources are feed-bounded, buckets are value-bounded (lengths DIV
    * 100), the q229/q143 dense-grid posture. The bucket frame and the
    * one-row total broadcast; nothing after the first agg is
    * corpus-sized.
    */
  def q232(s: SparkSession, dir: String): DataFrame = {
    val lx = docs(s, dir)
      .groupBy(col("source"), expr("n_chars DIV 100").as("b"))
      .agg(count(lit(1)).as("nsx"))
    val xs = lx.groupBy(col("b")).agg(sum(col("nsx")).as("nx"))
    val cs = lx.groupBy(col("source")).agg(sum(col("nsx")).as("ns"))
    val tot = xs.agg(sum(col("nx")).as("n"), count(lit(1)).as("k"))
    val p = (col("nsx") + lit(1.0)) / (col("ns") + col("k")).cast("double")
    val q = (col("nrx") + lit(1.0)) /
      (col("n") - col("ns") + col("k")).cast("double")
    cs.withGlobalStats(xs).withGlobalStats(tot)
      .join(lx, Seq("source", "b"), "left")
      .select(col("source"), col("ns"), col("n"), col("k"),
        coalesce(col("nsx"), lit(0L)).as("nsx"),
        (col("nx") - coalesce(col("nsx"), lit(0L))).as("nrx"))
      .select(col("source"), col("ns"), col("k"),
        Similarity.intScaled((p - q) * log(p / q), 1000000000L).as("term_e9"))
      .groupBy(col("source"))
      .agg(max(col("ns")).as("n_docs"), max(col("k")).as("n_buckets"),
        sum(col("term_e9")).as("psi_e9"))
      .orderBy("source")
  }

  /** q233 — arrival overdispersion per event type: the variance-to-mean
    * ratio (index of dispersion) of DAILY event counts. A Poisson feed
    * sits at VMR ≈ 1; VMR ≫ 1 marks bursty/scripted arrivals (the
    * feed-health companion to q193's error monitor and q214's
    * seasonality audit).
    *
    * Exactness: day buckets are integer division of epoch-µs (q190
    * discipline); n, Σx, Σx² are exact integers with the Σx² and the
    * n·Σx² − (Σx)² products in decimal(38) (the q206/q229 overflow
    * discipline — BIGINT dies once daily counts reach ~10⁹ at 100 TB);
    * VMR = (n·Σx² − (Σx)²) / ((n−1)·Σx) is ONE double division of
    * identically-derived exact values, e4-gridded.
    *
    * Scale: events collapse map-side to the (type × day) frame
    * (calendar-bounded); everything after is per-type arithmetic.
    */
  def q233(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .groupBy(col("event_type"), expr("us DIV 86400000000").as("day"))
      .agg(count(lit(1)).as("x"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("n_events"),
        sum(col("x").cast(d38) * col("x")).as("s2"))
      .select(col("event_type"), col("n_days"), col("n_events"),
        Similarity.intScaled(
          (col("n_days").cast(d38) * col("s2") -
            col("n_events").cast(d38) * col("n_events")).cast("double") /
            ((col("n_days") - 1) * col("n_events")).cast("double"),
          10000L).as("vmr_e4"))
      .orderBy("event_type")
  }

  /** q247 — mutual information between event type and day-of-week:
    * the effect-SIZE companion to q205's chi-square (χ² says "is the
    * dependence statistically surprising"; MI says "how many nats of
    * event-type information the weekday actually carries"). Reported
    * per type as its contribution Σ_j (n_ij/N)·ln(n_ij·N/(r_i·c_j)) —
    * the decomposition monitoring uses to find WHICH feed is
    * dow-coupled. Zero cells contribute 0 (x·ln x → 0), so only
    * observed cells participate — identical cell sets in both engines.
    *
    * Float discipline: counts are exact integers cast to double
    * INDIVIDUALLY before any product (the q205-ADVICE overflow rule —
    * integer products of row×col totals can wrap BIGINT at 100 TB,
    * doubles cannot); each cell's term is ONE identical expression
    * rounded per-cell onto the e9 grid, and the per-type MI is the
    * exact BIGINT sum of gridded terms (q228 discipline; margins
    * pinned in CurationSpec).
    *
    * Scale: events collapse map-side to the ≤(types × 7) cell frame;
    * every window below rides that bounded frame, never events.
    */
  def q247(s: SparkSession, dir: String): DataFrame = {
    val cells = Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .select(col("event_type"),
        ((expr("us DIV 86400000000") + 4) % 7).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o"))
    val r = sum(col("o")).over(Window.partitionBy("event_type"))
    val c = sum(col("o")).over(Window.partitionBy("dow"))
    val n = sum(col("o")).over(Window.partitionBy())
    val term = (col("o").cast("double") / n.cast("double")) *
      log((col("o").cast("double") * n.cast("double")) /
        (r.cast("double") * c.cast("double")))
    cells
      .select(col("event_type"), r.as("n_type"),
        Similarity.intScaled(term, 1000000000L).as("term_e9"))
      .groupBy(col("event_type"))
      .agg(max(col("n_type")).as("n_events"),
        count(lit(1)).as("n_cells"),
        sum(col("term_e9")).as("mi_part_e9"))
      .orderBy("event_type")
  }

  /** Benjamini-Hochberg FDR step-up over a (event_type, dow, o) cell
    * frame — the core of [[q258]], frame-parameterized so the
    * binding-kmax spec can inject a cell frame with a real signal
    * (the fixture's events are dow-independent, so every conservative
    * bound correctly rejects nothing there).
    *
    * Per-cell p-values are the one-sided CANTELLI bound
    * p = E/(E + (O−E)²) for O > E, else 1 (P(X−E ≥ t) ≤
    * Var/(Var+t²) ≤ E/(E+t²) for count-sum variance ≤ mean —
    * distribution-free and an EXACT RATIONAL, unlike a χ²-tail which
    * needs an incomplete-gamma neither engine evaluates portably).
    * With E = rc/n it clears to rc·n / (rc·n + (n·O − rc)²).
    *
    * Float discipline: the ACCEPT/REJECT decision is pure integer —
    * 4·pnum·m ≤ k·pden cross-multiplied in decimal(38) (rc·n and the
    * squared deviation wrap BIGINT long before 100 TB; decimal(38)
    * holds to ~10¹² events/margin) — and the rank order is by the
    * IEEE quotient of the SAME exact integers (identical doubles both
    * engines; a double-grid collision across distinct rationals still
    * yields the same groups on both sides, and the (type, dow)
    * tie-break makes the order total). p_e9 is reporting only, never
    * compared.
    *
    * Scale: the rank window and the kmax one-row broadcast ride the
    * bounded cell frame — the q247 posture.
    */
  def bhFdr(cells: DataFrame): DataFrame = {
    val d38 = "decimal(38,0)"
    val r = sum(col("o")).over(Window.partitionBy("event_type"))
    val c = sum(col("o")).over(Window.partitionBy("dow"))
    val n = sum(col("o")).over(Window.partitionBy())
    val m = count(lit(1)).over(Window.partitionBy())
    val framed = cells.select(col("event_type"), col("dow"), col("o"),
      (r.cast(d38) * c).as("rc"), (n.cast(d38) * col("o")).as("no"),
      n.as("n"), m.as("m"))
      .withColumn("rcn", col("rc") * col("n"))
      .withColumn("dev", col("no") - col("rc"))
      .withColumn("pnum",
        when(col("no") > col("rc"), col("rcn")).otherwise(lit(1).cast(d38)))
      .withColumn("pden",
        when(col("no") > col("rc"), col("rcn") + col("dev") * col("dev"))
          .otherwise(lit(1).cast(d38)))
      .withColumn("p_dbl",
        col("pnum").cast("double") / col("pden").cast("double"))
      .withColumn("rank", row_number().over(
        Window.orderBy(col("p_dbl"), col("event_type"), col("dow"))))
    val kmax = framed
      .agg(coalesce(max(when(
        lit(4).cast(d38) * col("pnum") * col("m") <=
          col("pden") * col("rank"), col("rank"))), lit(0L)).as("kmax"))
    framed.withGlobalStats(kmax)
      .select(col("event_type"), col("dow"), col("o"),
        col("rank").cast("long").as("rank"),
        round(col("p_dbl") * 1000000000d, 0).cast("long").as("p_e9"),
        (col("rank") <= col("kmax")).cast("long").as("rejected"))
      .orderBy("rank")
  }

  /** q258 — BH-FDR control over the (type × weekday) enrichment grid:
    * the multiple-testing step a monitoring stack runs AFTER q205's
    * chi-square says "something is dependent" — at types×7
    * simultaneous cells, per-cell α would false-alarm weekly, so BH
    * (1995) bounds the expected fraction of false discoveries
    * instead: sort p-values ascending, find the largest k with
    * p_(k) ≤ k·α/m, reject ranks 1..k (α = 1/4). Events collapse
    * map-side to the ≤(types × 7) cell frame first.
    */
  def q258(s: SparkSession, dir: String): DataFrame =
    bhFdr(Tables.events(s, dir)
      .select(col("event_type"),
        (col("ts").cast("decimal(20,0)") / lit(1000)).cast("long").as("us"))
      .select(col("event_type"),
        ((expr("us DIV 86400000000") + 4) % 7).as("dow"))
      .groupBy(col("event_type"), col("dow"))
      .agg(count(lit(1)).as("o")))

  /** q268 — differential-privacy sensitivity audit of the per-nation
    * revenue aggregate: for each nation, the maximum single CUSTOMER
    * contribution to the revenue sum — the user-level L1 sensitivity
    * that calibrates DP noise (σ ∝ Δ/ε for the Laplace/Gaussian
    * mechanisms under add/remove-one-user). The privacy-engineering
    * companion to q255's k-anonymity and q141's census: before a
    * noised release, you must know Δ, and whales (max share near the
    * total) mean contribution CLIPPING, not more noise. All-integer
    * cents; the share is ONE mirrored division e6.
    *
    * Scale: orders collapse map-side to per-customer sums (the only
    * corpus-sized shuffle, partial-agg combined), the customer→nation
    * resolve is a dim join, and the nation rollup with an integer
    * max-struct pick is bounded by the nation domain.
    */
  def q268(s: SparkSession, dir: String): DataFrame = {
    val perCust = Tables.table(s, dir, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("c"))
      .groupBy(col("o_custkey")).agg(sum(col("c")).as("cust_cents"))
    val cust = Tables.table(s, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val nat = Tables.table(s, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    perCust
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cust_cents")).as("total_cents"),
        max(struct(col("cust_cents").as("cc"), (-col("o_custkey")).as("nk")))
          .as("best"))
      .select(col("n_name"), col("n_customers"), col("total_cents"),
        col("best.cc").as("sensitivity_cents"),
        (-col("best.nk")).as("worst_custkey"),
        round(col("best.cc").cast("double") /
          col("total_cents").cast("double") * 1000000d, 0).cast("long")
          .as("share_e6"))
      .orderBy("n_name")
  }

  /** q255 — k-anonymity audit (k = 5) of the customer quasi-identifier
    * (nation, market segment, $5000 balance bucket): per nation, how
    * many QI equivalence classes exist, how many are RISKY (fewer than
    * k members — those customers are re-identifiable by the QI alone),
    * how many rows sit in risky classes, and the worst class size.
    * The privacy gate a curation pipeline runs before shipping any
    * user-derived table; generalize/suppress until n_risky = 0.
    *
    * All-integer (exact cents DIV for the bucket, counts everywhere).
    * Scale: ONE groupBy to the QI-class frame (class-cardinality, not
    * rows), then a nation rollup of that already-collapsed frame —
    * the q232 two-level-census posture.
    */
  def q255(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nation"),
        col("c_mktsegment").as("seg"),
        expr("CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)" +
          " DIV 500000").as("bb"))
      .groupBy(col("nation"), col("seg"), col("bb"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("nation"))
      .agg(count(lit(1)).as("n_classes"),
        sum(when(col("n") < 5, 1L).otherwise(0L)).as("n_risky"),
        sum(when(col("n") < 5, col("n")).otherwise(0L)).as("n_exposed"),
        min(col("n")).as("min_class"))
      .orderBy("nation")

  /** Global token budget the q234 plan allocates (a spec constant, not
    * data-derived — the plan is a function of (corpus, budget)).
    */
  val MixBudget = 1000000L

  /** Epoch cap ×10⁴: no source may be repeated more than 4 epochs
    * (the standard small-source up-sampling limit — beyond ~4 epochs
    * repetition stops helping and starts overfitting).
    */
  val MaxEpochsE4 = 40000L

  /** q234 — mixture-epoch planner: q134's temperature weights
    * (p_s ∝ tokens^0.7) turned into an executable sampling plan under
    * [[MixBudget]] total tokens: per source the desired allocation
    * budget·w, the planned allocation min(desired, 4 epochs·tokens),
    * the resulting epoch count, and the DEFICIT the epoch cap leaves
    * unfilled (surfaced, never silently reallocated — the q231
    * shortfall discipline).
    *
    * Exactness: the ONLY float is the e6-gridded weight (pow(·,0.7)/Z,
    * the q134-certified expression); everything downstream is integer
    * arithmetic — desired = budget·w_e6 DIV 10⁶, planned = min(desired,
    * 4·tokens), epochs_e4 = planned·10⁴ DIV tokens.
    *
    * Scale: one corpus scan to per-source token counts; totals on a
    * one-row broadcast; output is sources-sized.
    */
  def q234(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("double").as("toks"))
    val tot = t.agg(sum(pow(col("toks"), lit(0.7))).as("z"))
    t.withGlobalStats(tot)
      .select(col("source"), col("toks").cast("long").as("tokens"),
        Similarity.intScaled(
          pow(col("toks"), lit(0.7)) / col("z"), 1000000L).as("weight_e6"))
      .select(col("source"), col("tokens"), col("weight_e6"),
        expr(s"$MixBudget * weight_e6 DIV 1000000").as("desired_tokens"))
      .select(col("source"), col("tokens"), col("weight_e6"),
        col("desired_tokens"),
        least(col("desired_tokens"), lit(4L) * col("tokens"))
          .as("planned_tokens"))
      .select(col("source"), col("tokens"), col("weight_e6"),
        col("desired_tokens"), col("planned_tokens"),
        expr("planned_tokens * 10000 DIV tokens").as("epochs_e4"),
        (col("desired_tokens") - col("planned_tokens")).as("deficit"))
      .orderBy("source")
  }

  /** Vocabulary size the q236 audit measures against (top-K corpus
    * words by (freq DESC, word) — q142's deterministic rank order).
    */
  val OovVocabK = 100

  /** q236 — out-of-vocabulary token mass per source against the
    * corpus top-[[OovVocabK]] vocabulary: token-level OOV rate and the
    * distinct OOV word-type count. The tokenizer-fit audit: a source
    * whose OOV mass is far above the corpus norm is the one whose text
    * a vocab of this size splinters into fallback bytes (q173's Heaps
    * slope predicts this corpus-wide; this query localizes it per
    * feed).
    *
    * Exactness: the vocabulary cutoff rides the (freq DESC, word)
    * total order (integer freqs — cross-engine identical membership);
    * counts are exact integers; the rate is one e4-gridded division.
    *
    * Scale: tokens collapse map-side to the (source × word) frame
    * before any join; the vocab is a top-K agg broadcast to it (the
    * q114 bounded-vocabulary posture). Nothing after the first agg is
    * token-sized.
    */
  def q236(s: SparkSession, dir: String): DataFrame = {
    val tf = docs(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("source"), col("w"))
      .agg(count(lit(1)).as("tf"))
    val vocab = Ranking.rankedVocab(docs(s, dir), col("text"), OovVocabK)
      .select(col("w"), lit(1).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(0L))
          .as("n_oov"),
        sum(when(col("in_vocab").isNull, 1L).otherwise(0L))
          .as("n_oov_types"))
      .select(col("source"), col("n_tokens"), col("n_oov"),
        col("n_oov_types"),
        Similarity.intScaled(
          col("n_oov").cast("double") / col("n_tokens").cast("double"),
          10000L).as("oov_e4"))
      .orderBy("source")
  }

  /** q272 — Cohen's kappa between the declared `lang` label and q51's
    * stopword-argmax prediction: the chance-corrected agreement scalar
    * that q178's confusion matrix is usually summarized into —
    *   κ = (pₒ − pₑ)/(1 − pₑ) = (n·agree − Σ row_c·col_c) /
    *       (n² − Σ row_c·col_c)
    * with the marginal product summed over the union of label classes.
    * The label-noise headline a pipeline publishes before trusting
    * upstream language tags (κ near 0 = the tags are no better than the
    * marginals; the raw-accuracy trap κ exists to correct).
    *
    * Exactness: confusion cells and marginals are exact integers; the
    * rational's products ride decimal(38) (BIGINT n² dies at ~3×10⁹
    * docs — the q233 discipline) and κ is ONE double division of
    * identically-derived integers, e9-gridded, NULL when the
    * denominator is zero (single-class degenerate case) on both
    * engines.
    *
    * Scale: one corpus scan collapses to the (lang × guess) confusion
    * frame (classes², tiny); marginals, products, and κ are all
    * class-bounded arithmetic. Output is ONE row.
    */
  def q272(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = docs(s, dir)
      .select(col("lang"), TextAnalysis.guessLang(col("text")).as("guess"))
      .groupBy("lang", "guess").agg(count(lit(1)).as("n"))
    val rows = cells.groupBy(col("lang").as("c")).agg(sum("n").as("row_n"))
    val cols = cells.groupBy(col("guess").as("c")).agg(sum("n").as("col_n"))
    val marg = rows.join(cols, Seq("c"), "full")
      .agg(sum(coalesce(col("row_n"), lit(0L)).cast(d38) *
        coalesce(col("col_n"), lit(0L)).cast(d38)).as("rc"))
    val num = col("n_docs").cast(d38) * col("n_agree").cast(d38) - col("rc")
    val den = col("n_docs").cast(d38) * col("n_docs").cast(d38) - col("rc")
    cells
      .agg(sum("n").as("n_docs"),
        sum(when(col("lang") === col("guess"), col("n")).otherwise(0L))
          .as("n_agree"))
      .withGlobalStats(marg)
      .select(col("n_docs"), col("n_agree"), col("rc").cast("long").as("sum_rc"),
        Similarity.intScaled(
          when(den =!= 0, num.cast("double") / den.cast("double")),
          1000000000L).as("kappa_e9"))
  }

  /** q273 — lang-ID confidence calibration (the reliability diagram of
    * q51's classifier): per document, confidence = best-language
    * stopword hits over LAPLACE-SHRUNK total hits, best/(total+1) —
    * the +1 prior makes confidence grow with evidence MASS (1 hit →
    * 0.5, 20 hits → ~0.95) instead of saturating at 1.0 for every
    * single-language doc — bucketed by the INTEGER rational
    * (10·best) DIV (total+1) (no double ever touches a bucket
    * boundary — the q134 lesson); per bucket, accuracy against the
    * declared label and the Brier-score mass. A calibrated classifier
    * shows accuracy tracking confidence bucket-for-bucket; q51's
    * 4-stopword heuristic visibly won't — which is exactly what this
    * audit is for before anyone filters a corpus on its confidence.
    *
    * Exactness: buckets and counts are exact integers; accuracy is one
    * integer division e6-gridded; each document's Brier term
    * (conf − correct)² is ONE identical double expression rounded onto
    * the e9 grid BEFORE the sum (the q232 Σ-of-gridded-terms
    * discipline — no float accumulation).
    *
    * Scale: map-side scoring projection, one groupBy on the ≤ 11
    * buckets with partial aggs. Zero-hit documents (no confidence
    * defined) are excluded identically on both engines.
    */
  def q273(s: SparkSession, dir: String): DataFrame = {
    val sw = TextAnalysis.langStopwords
    val scoreCols = Seq(
      col("lang"),
      TextAnalysis.guessLang(col("text")).as("guess")) ++
      sw.map { case (l, w) =>
        TextAnalysis.stopwordHits(col("text"), w).cast("long").as(s"s_$l")
      }
    val scored = docs(s, dir).select(scoreCols: _*)
    val best = greatest(col("s_en"), col("s_de"), col("s_es"), col("s_fr"))
    val total = col("s_en") + col("s_de") + col("s_es") + col("s_fr")
    scored
      .withColumn("best", best).withColumn("total", total)
      .filter(col("total") > 0)
      .select(
        expr("(10 * best) DIV (total + 1)").as("bucket"),
        when(col("guess") === col("lang"), 1L).otherwise(0L).as("ok"),
        Similarity.intScaled(
          (col("best").cast("double") / (col("total") + 1L).cast("double") -
            when(col("guess") === col("lang"), lit(1.0)).otherwise(lit(0.0)))
            * (col("best").cast("double") / (col("total") + 1L).cast("double") -
              when(col("guess") === col("lang"), lit(1.0)).otherwise(lit(0.0))),
          1000000000L).as("term_e9"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n"), sum(col("ok")).as("n_correct"),
        sum(col("term_e9")).as("brier_e9"))
      .select(col("bucket"), col("n"), col("n_correct"),
        Similarity.intScaled(
          col("n_correct").cast("double") / col("n").cast("double"),
          1000000L).as("acc_e6"),
        col("brier_e9"))
      .orderBy("bucket")
  }

  /** q274 — Wilson 95% confidence interval on per-funnel-stage user
    * conversion: for each event type, the share of its distinct users
    * who also purchased, with the Wilson score interval (the
    * small-n-safe CI the normal approximation gets wrong at extreme
    * p̂ — the one to publish on funnel dashboards where some stage has
    * 40 users, not 40 million). Rates without uncertainty invite
    * false reallocations; the CI width IS the decision signal.
    *
    * Float discipline: k and n are exact distinct-user integers; the
    * Wilson center/halfwidth is ONE textually-mirrored double
    * expression (z spelled 1.96 with the SQL side cast to DOUBLE
    * before any arithmetic so both engines multiply the same rounded
    * double), each bound e6-gridded once. `Round9eSpec` measures the
    * rounding-boundary margins.
    *
    * Scale: one distinct (user, type) collapse (user-keyed shuffle),
    * a user-keyed left join against the purchase flag, then a
    * type-bounded agg. No window, no collect; purchasers are a
    * user-keyed frame, never broadcast by assumption.
    */
  def q274(s: SparkSession, dir: String): DataFrame = {
    val pairs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val buyers = pairs.filter(col("event_type") === "purchase")
      .select(col("user_id"), lit(1L).as("conv"))
    val n = col("n_users").cast("double")
    val k = col("n_conv").cast("double")
    val z = lit(1.96)
    val z2 = z * z
    val ph = k / n
    val den = lit(1.0) + z2 / n
    val center = (ph + z2 / (lit(2.0) * n)) / den
    val hw = (z * sqrt(ph * (lit(1.0) - ph) / n + z2 / (lit(4.0) * n * n))) / den
    pairs.join(buyers, Seq("user_id"), "left")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_users"),
        sum(coalesce(col("conv"), lit(0L))).as("n_conv"))
      .select(col("event_type"), col("n_users"), col("n_conv"),
        Similarity.intScaled(ph, 1000000L).as("phat_e6"),
        Similarity.intScaled(center - hw, 1000000L).as("lo_e6"),
        Similarity.intScaled(center + hw, 1000000L).as("hi_e6"))
      .orderBy("event_type")
  }

  /** q295 — effective source count per language (inverse Simpson
    * diversity, 1/Σpₛ² = n²/Σnₛ²): how many sources a language's
    * corpus EFFECTIVELY draws from once imbalance is discounted — 20
    * nominal feeds that are 95% one crawler is an effective ~1.1, the
    * monoculture risk a mixture plan (q234) must see before trusting
    * per-language weights. The diversity-index dual of q284's HHI
    * (effective count = 1/HHI), applied to the corpus axis.
    *
    * Exactness: counts are exact integers; Σnₛ² rides decimal(38)
    * (wraps BIGINT at ~3×10⁹ docs per source-language); the index is
    * ONE mirrored double division, e4-gridded.
    *
    * Scale: one corpus scan collapses to the (lang × source) grid;
    * everything after is language-bounded arithmetic.
    */
  def q295(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("ns"))
      .groupBy("lang")
      .agg(count(lit(1)).as("n_sources"), sum(col("ns")).as("n_docs"),
        sum(col("ns").cast(d38) * col("ns")).as("ss"))
      .select(col("lang"), col("n_docs"), col("n_sources"),
        Similarity.intScaled(
          (col("n_docs").cast(d38) * col("n_docs")).cast("double") /
            col("ss").cast("double"),
          10000L).as("eff_sources_e4"))
      .orderBy("lang")
  }

  /** q300 — per-source corpus-health scorecard: the capstone that
    * COMPOSES three certified signal families into the one frame a
    * curation review actually reads — per source: corpus-duplication
    * mass (share of the source's 10-gram occurrences that are
    * duplicated corpus-wide, q108's signal aggregated to the feed),
    * mean quality (q52's score under q140's e6-grid-then-mean
    * discipline), token share of the corpus, and an ALL-INTEGER
    * health rank under (dup share ASC, mean quality DESC, source) —
    * the order a pipeline retires feeds in.
    *
    * Exactness: gram and token counts are exact integers; quality is
    * e6-gridded per doc BEFORE the sum; the three ratios are single
    * mirrored divisions; the rank compares the already-gridded
    * integers only (no double ever orders the list).
    *
    * Scale: one gram explode with ONE corpus-wide shuffle on the gram
    * (the q108 audited core — since r17 both ride the gram-partitioned
    * count window instead of a counts-agg + join-back, which ran the
    * explode and its exchange twice; see dupNgramFraction's note for
    * the measured 2× and the unchanged skew class), map-side
    * quality/token collapse, then source-bounded joins and a
    * source-frame rank window.
    */
  def q300(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(s, dir)
    val g = d
      .select(col("source"), TextAnalysis.tokens(col("text")).as("ws"))
      .select(col("source"),
        explode_outer(Dedup.shinglesKAll(col("ws"), 10)).as("gram"))
      .filter(col("gram").isNotNull)
    val wg = Window.partitionBy(col("gram"))
    val dup = g.withColumn("n", count(lit(1)).over(wg))
      .groupBy("source")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("n") > 1, 1L).otherwise(0L)).as("dup_grams"))
    val qual = d.select(col("source"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("tk"),
        Similarity.intScaled(
          round(TextAnalysis.qualityScore(col("text")), 6), 1000000L)
          .as("q_e6"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tokens"),
        sum(col("q_e6")).as("sq_e6"))
    val tot = qual.agg(sum(col("n_tokens")).as("corpus_tokens"))
    val joined = dup.join(qual, "source").withGlobalStats(tot)
      .select(col("source"), col("n_docs"), col("n_tokens"),
        Similarity.intScaled(
          col("dup_grams").cast("double") / col("n_grams").cast("double"),
          1000000L).as("dup_e6"),
        round(col("sq_e6").cast("double") / col("n_docs").cast("double") /
          lit(100.0), 0).cast("long").as("mean_q_e4"),
        Similarity.intScaled(
          col("n_tokens").cast("double") / col("corpus_tokens").cast("double"),
          1000000L).as("token_share_e6"))
    val w = Window.orderBy(col("dup_e6"), col("mean_q_e4").desc, col("source"))
    joined.withColumn("health_rank", row_number().over(w).cast("long"))
      .orderBy("source")
  }

  /** q320 — labeling-function conflict matrix (the Snorkel-style weak-
    * supervision diagnostic): four keep/drop/abstain rules over
    * documents — length, unique-token ratio, stopword presence, digit
    * mass — reported pairwise as overlap (both vote), agreement (same
    * non-zero vote) and conflict (opposite votes) rates. THE table a
    * weak-supervision pipeline reads before combining noisy quality
    * rules into one label: high-conflict pairs need arbitration, and a
    * rule that never overlaps anything adds no evidence. q313 tests
    * ONE pair's disagreement direction; this maps the whole rule set.
    *
    * All-integer votes (every threshold is an integer cross-
    * multiplication — no division anywhere in the rules); the two
    * rates are mirrored divisions of exact counts e6-gridded,
    * NULL-guarded on zero overlap. One scan, one 18-sum agg, 6-row
    * static fan-out — nothing is corpus-sized after the agg.
    */
  def q320(s: SparkSession, dir: String): DataFrame = {
    val nw = size(split(col("text"), " ")).cast("long")
    val nu = size(array_distinct(split(col("text"), " "))).cast("long")
    val st = size(filter(split(col("text"), " "),
      w => w.isin("a", "the"))).cast("long")
    val dg = length(regexp_replace(col("text"), "[^0-9]", "")).cast("long")
    def vote(pos: Column, neg: Column): Column =
      when(pos, lit(1L)).when(neg, lit(-1L)).otherwise(lit(0L))
    val votes = docs(s, dir).select(
      vote(col("n_chars") >= 300L, col("n_chars") < 100L).as("v0"),
      vote(lit(2L) * nu >= nw, lit(4L) * nu < nw).as("v1"),
      vote(lit(20L) * st >= nw, st === 0L).as("v2"),
      vote(lit(20L) * dg < col("n_chars"),
        lit(5L) * dg > col("n_chars")).as("v3"))
    val names = Seq("len", "unique", "stop", "digit")
    val pairs = for (i <- 0 until 4; j <- i + 1 until 4) yield (i, j)
    val aggd = votes.agg(count(lit(1)).as("n"),
      pairs.flatMap { case (i, j) =>
        Seq(
          sum((col(s"v$i") =!= 0L && col(s"v$j") =!= 0L).cast("long"))
            .as(s"ov_${i}_$j"),
          sum((col(s"v$i") =!= 0L && col(s"v$i") === col(s"v$j"))
            .cast("long")).as(s"ag_${i}_$j"),
          sum((col(s"v$i") * col(s"v$j") === -1L).cast("long"))
            .as(s"cf_${i}_$j"))
      }: _*)
    aggd.select(explode(array(pairs.map { case (i, j) =>
        struct(lit(names(i)).as("lf_a"), lit(names(j)).as("lf_b"),
          col(s"ov_${i}_$j").as("n_overlap"),
          col(s"ag_${i}_$j").as("n_agree"),
          col(s"cf_${i}_$j").as("n_conflict"))
      }: _*)).as("p"))
      .select(col("p.lf_a"), col("p.lf_b"), col("p.n_overlap"),
        col("p.n_agree"), col("p.n_conflict"),
        when(col("p.n_overlap") > 0L, Similarity.intScaled(
          col("p.n_agree").cast("double") / col("p.n_overlap").cast("double"),
          1000000L)).as("agree_e6"),
        when(col("p.n_overlap") > 0L, Similarity.intScaled(
          col("p.n_conflict").cast("double") /
            col("p.n_overlap").cast("double"),
          1000000L)).as("conflict_e6"))
      .orderBy("lf_a", "lf_b")
  }

  /** q330 — deletion-impact audit (the right-to-be-forgotten dry run):
    * for a deterministic deletion cohort (custkey ≡ 0 mod 97, and the
    * same rule on the event user domain), the row counts each table
    * would lose — customers, their orders, THOSE orders' lineitems
    * (the referential closure a naive per-table delete misses), and
    * the cohort's events — with each table's loss share. The
    * governance report a privacy pipeline produces before executing
    * erasure: it sizes the blast radius and proves the closure is
    * computed through the FK chain, not per-table key matching.
    *
    * All-integer counts via semi-join chains + one mirrored share
    * division per row; the 4-row output is a static union of
    * independent aggs, each broadcast-joined to its table total.
    *
    * Scale: the cohort filters push to scans; orders/lineitem travel
    * the audited FK-join shapes (orderkey equi-joins); nothing is
    * ever collected.
    */
  def q330(s: SparkSession, dir: String): DataFrame = {
    def t(name: String): DataFrame = Tables.table(s, dir, name)
    val custDel = t("customer").filter(col("c_custkey") % 97L === 0L)
      .select(col("c_custkey"))
    val ordDel = t("orders")
      .join(custDel.select(col("c_custkey").as("o_custkey")), "o_custkey")
      .select(col("o_orderkey"))
    val liDel = t("lineitem")
      .join(ordDel.select(col("o_orderkey").as("l_orderkey")), "l_orderkey")
    val evDel = Tables.events(s, dir).filter(col("user_id") % 97L === 0L)
    def row(name: String, del: DataFrame, total: DataFrame): DataFrame =
      del.agg(count(lit(1)).as("n_deleted"))
        .withGlobalStats(total.agg(count(lit(1)).as("n_total")))
        .select(lit(name).as("table_name"), col("n_deleted"), col("n_total"),
          Similarity.intScaled(
            col("n_deleted").cast("double") / col("n_total").cast("double"),
            1000000L).as("share_e6"))
    row("customer", custDel, t("customer"))
      .unionAll(row("orders", ordDel, t("orders")))
      .unionAll(row("lineitem", liDel, t("lineitem")))
      .unionAll(row("events", evDel, Tables.events(s, dir)))
      .orderBy("table_name")
  }

  /** q366 — l-diversity census over the customer table: with
    * quasi-identifier (nation, market segment) and sensitive
    * attribute = account-balance $1000 bucket, the distribution of
    * per-group DISTINCT sensitive values — the privacy audit k-anonymity
    * (q141/q255) cannot answer: a group can be large (k-safe) yet
    * expose its members because everyone in it shares one balance
    * band (l = 1 → homogeneity attack). Reported as a histogram of l
    * with the at-risk census (groups below l = 3), the release
    * gate a data-sharing review signs.
    *
    * Exactness: buckets are FLOOR(cents/1e5) — floor on the mirrored
    * double division (NOT integer division: Spark truncates toward
    * zero, DuckDB floors, and balances go negative); every census is
    * an exact integer.
    *
    * Scale: one groupBy on the bounded QI grid (nations × segments),
    * distinct-agg inside groups; output ≤ distinct-l rows.
    */
  def q366(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.table(s, dir, "customer")
      .select(col("c_nationkey"), col("c_mktsegment"),
        floor((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .cast("double") / lit(100000.0)).cast("long").as("sb"))
    val groups = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
      .agg(countDistinct(col("sb")).as("l"), count(lit(1)).as("nc"))
    groups.groupBy(col("l"))
      .agg(count(lit(1)).as("n_groups"), sum(col("nc")).as("n_customers"),
        sum(when(col("l") < 3L, col("nc")).otherwise(0L)).as("n_at_risk"))
      .orderBy("l")
  }

  /** q370 — t-closeness audit: for each quasi-identifier group
    * (q366's nation × segment grid), the earth-mover's distance
    * between ITS sensitive-value distribution and the GLOBAL one over
    * the ORDERED $1000 balance buckets — the release gate beyond
    * l-diversity: a group can be l-diverse yet still leak (all its
    * balances in the top bands ⇒ membership reveals wealth). For a
    * 1-D ordered attribute EMD is the mean absolute ECDF gap,
    * normalized by (B−1).
    *
    * Exactness: per-bucket cumulative counts ride the dense
    * group × bucket grid (zero-filled); each ECDF gap is the exact
    * cross-multiplied integer |n·cum_g − n_g·cum| (the q229 KS
    * discipline — KS takes the max, EMD the mean); ONE mirrored
    * division per group at the end.
    *
    * Scale: the grid is (nations × segments) × distinct buckets —
    * doubly bounded; cumulative windows ride it, never customers.
    */
  def q370(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val c = Tables.table(s, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nat"), col("c_mktsegment").as("seg"),
        floor((col("c_acctbal").cast("decimal(18,2)") * 100).cast("long")
          .cast("double") / lit(100000.0)).cast("long").as("sb"))
    val gb = c.groupBy(col("nat"), col("seg"), col("sb"))
      .agg(count(lit(1)).as("ngb"))
      .localCheckpoint(true) // grid base + global marginals
    val buckets = gb.groupBy(col("sb")).agg(sum(col("ngb")).as("nb"))
    val groups = gb.groupBy(col("nat"), col("seg")).agg(sum(col("ngb")).as("ng"))
    val tot = buckets.agg(sum(col("nb")).as("n"),
      count(lit(1)).as("n_buckets"))
    val wCum = Window.partitionBy(col("nat"), col("seg")).orderBy(col("sb"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    groups.withGlobalStats(buckets).withGlobalStats(tot)
      .join(gb, Seq("nat", "seg", "sb"), "left")
      .select(col("nat"), col("seg"), col("sb"), col("ng"), col("nb"),
        col("n"), col("n_buckets"), coalesce(col("ngb"), lit(0L)).as("ngb"))
      .select(col("nat"), col("seg"), col("ng"), col("n"), col("n_buckets"),
        sum(col("ngb")).over(wCum).as("cumg"),
        sum(col("nb")).over(Window.partitionBy(col("nat"), col("seg"))
          .orderBy(col("sb"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .as("cum"))
      .select(col("nat"), col("seg"), col("ng"), col("n"), col("n_buckets"),
        abs(col("n").cast(d38) * col("cumg") -
          col("ng").cast(d38) * col("cum")).as("gap"))
      .groupBy(col("nat"), col("seg"))
      .agg(max(col("ng")).as("n_customers"),
        Similarity.intScaled(
          sum(col("gap")).cast("double") /
            (max(col("ng")).cast("double") * max(col("n")).cast("double") *
              (max(col("n_buckets")) - 1).cast("double")),
          1000000L).as("emd_e6"))
      .orderBy("nat", "seg")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q370_t_closeness" -> (q370 _),
    "q366_ldiversity" -> (q366 _),
    "q330_deletion_impact" -> (q330 _),
    "q320_lf_conflicts" -> (q320 _),
    "q232_psi_drift"      -> (q232 _),
    "q272_lang_kappa"     -> (q272 _),
    "q295_source_diversity" -> (q295 _),
    "q300_health_scorecard" -> (q300 _),
    "q273_conf_calibration" -> (q273 _),
    "q274_wilson_ci"      -> (q274 _),
    "q233_overdispersion" -> (q233 _),
    "q247_mutual_info"    -> (q247 _),
    "q255_kanon_audit"    -> (q255 _),
    "q234_mixture_plan"   -> (q234 _),
    "q236_oov_rate"       -> (q236 _),
    "q258_bh_fdr"         -> (q258 _),
    "q268_sensitivity_audit" -> (q268 _),
  )

  private val lfConflictsOracle: String = {
    val names = Seq("len", "unique", "stop", "digit")
    val pairs = for (i <- 0 until 4; j <- i + 1 until 4) yield (i, j)
    val sums = pairs.flatMap { case (i, j) =>
      Seq(
        s"CAST(SUM(CASE WHEN v$i <> 0 AND v$j <> 0 THEN 1 ELSE 0 END) AS BIGINT) AS ov_${i}_$j",
        s"CAST(SUM(CASE WHEN v$i <> 0 AND v$i = v$j THEN 1 ELSE 0 END) AS BIGINT) AS ag_${i}_$j",
        s"CAST(SUM(CASE WHEN v$i * v$j = -1 THEN 1 ELSE 0 END) AS BIGINT) AS cf_${i}_$j")
    }.mkString(",\n         ")
    val rows = pairs.map { case (i, j) =>
      s"""SELECT '${names(i)}' AS lf_a, '${names(j)}' AS lf_b,
         |  ov_${i}_$j AS n_overlap, ag_${i}_$j AS n_agree,
         |  cf_${i}_$j AS n_conflict,
         |  CASE WHEN ov_${i}_$j > 0 THEN CAST(ROUND(CAST(ag_${i}_$j AS DOUBLE)
         |    / CAST(ov_${i}_$j AS DOUBLE) * 1000000) AS BIGINT) END AS agree_e6,
         |  CASE WHEN ov_${i}_$j > 0 THEN CAST(ROUND(CAST(cf_${i}_$j AS DOUBLE)
         |    / CAST(ov_${i}_$j AS DOUBLE) * 1000000) AS BIGINT) END AS conflict_e6
         |FROM a""".stripMargin
    }.mkString("\nUNION ALL\n")
    s"""WITH v AS (
       |  SELECT
       |    CASE WHEN n_chars >= 300 THEN 1
       |         WHEN n_chars < 100 THEN -1 ELSE 0 END AS v0,
       |    CASE WHEN 2 * len(list_distinct(string_split(text, ' ')))
       |              >= len(string_split(text, ' ')) THEN 1
       |         WHEN 4 * len(list_distinct(string_split(text, ' ')))
       |              < len(string_split(text, ' ')) THEN -1 ELSE 0 END AS v1,
       |    CASE WHEN 20 * len(list_filter(string_split(text, ' '),
       |                        w -> w IN ('a', 'the')))
       |              >= len(string_split(text, ' ')) THEN 1
       |         WHEN len(list_filter(string_split(text, ' '),
       |                   w -> w IN ('a', 'the'))) = 0 THEN -1 ELSE 0 END AS v2,
       |    CASE WHEN 20 * length(regexp_replace(text, '[^0-9]', '', 'g'))
       |              < n_chars THEN 1
       |         WHEN 5 * length(regexp_replace(text, '[^0-9]', '', 'g'))
       |              > n_chars THEN -1 ELSE 0 END AS v3
       |  FROM documents),
       |a AS (SELECT $sums
       |      FROM v)
       |SELECT * FROM (
       |$rows
       |) ORDER BY lf_a, lf_b""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    // Same dense group×bucket grid, exact cross-multiplied ECDF gaps,
    // one mirrored EMD division per group.
    "q370_t_closeness" ->
      """WITH c AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat, c_mktsegment AS seg,
        |         CAST(FLOOR(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |             AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS sb
        |  FROM customer),
        |gb AS (SELECT nat, seg, sb, CAST(COUNT(*) AS BIGINT) AS ngb
        |       FROM c GROUP BY 1, 2, 3),
        |buckets AS (SELECT sb, CAST(SUM(ngb) AS BIGINT) AS nb
        |            FROM gb GROUP BY sb),
        |groups_ AS (SELECT nat, seg, CAST(SUM(ngb) AS BIGINT) AS ng
        |            FROM gb GROUP BY nat, seg),
        |tot AS (SELECT CAST(SUM(nb) AS BIGINT) AS n,
        |               CAST(COUNT(*) AS BIGINT) AS n_buckets FROM buckets),
        |grid AS (
        |  SELECT g.nat, g.seg, b.sb, g.ng, b.nb, t.n, t.n_buckets,
        |         COALESCE(x.ngb, 0) AS ngb
        |  FROM groups_ g CROSS JOIN buckets b CROSS JOIN tot t
        |  LEFT JOIN gb x ON x.nat = g.nat AND x.seg = g.seg
        |                AND x.sb = b.sb),
        |cums AS (
        |  SELECT nat, seg, ng, n, n_buckets,
        |         SUM(ngb) OVER w AS cumg, SUM(nb) OVER w AS cum
        |  FROM grid
        |  WINDOW w AS (PARTITION BY nat, seg ORDER BY sb
        |               ROWS UNBOUNDED PRECEDING))
        |SELECT nat, seg, CAST(MAX(ng) AS BIGINT) AS n_customers,
        |  CAST(ROUND(CAST(SUM(ABS(CAST(n AS HUGEINT) * cumg
        |        - CAST(ng AS HUGEINT) * cum)) AS DOUBLE)
        |    / (CAST(MAX(ng) AS DOUBLE) * CAST(MAX(n) AS DOUBLE)
        |       * CAST(MAX(n_buckets) - 1 AS DOUBLE)) * 1000000) AS BIGINT)
        |    AS emd_e6
        |FROM cums GROUP BY nat, seg ORDER BY nat, seg""".stripMargin,
    // Same FLOOR(cents/1e5) buckets, same QI grid, exact censuses.
    "q366_ldiversity" ->
      """WITH c AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(FLOOR(CAST(CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100
        |             AS BIGINT) AS DOUBLE) / 100000.0) AS BIGINT) AS sb
        |  FROM customer),
        |g AS (
        |  SELECT c_nationkey, c_mktsegment,
        |         CAST(COUNT(DISTINCT sb) AS BIGINT) AS l,
        |         CAST(COUNT(*) AS BIGINT) AS nc
        |  FROM c GROUP BY 1, 2)
        |SELECT l, CAST(COUNT(*) AS BIGINT) AS n_groups,
        |       CAST(SUM(nc) AS BIGINT) AS n_customers,
        |       CAST(SUM(CASE WHEN l < 3 THEN nc ELSE 0 END) AS BIGINT)
        |         AS n_at_risk
        |FROM g GROUP BY l ORDER BY l""".stripMargin,
    // Same mod-97 cohorts and FK-closure semi-chains, exact counts,
    // one mirrored share division per table row.
    "q330_deletion_impact" ->
      """WITH cd AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        |od AS (SELECT o_orderkey FROM orders
        |       WHERE o_custkey IN (SELECT c_custkey FROM cd)),
        |rows_ AS (
        |  SELECT 'customer' AS table_name,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM cd) AS n_deleted,
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total
        |  UNION ALL
        |  SELECT 'orders',
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM od),
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM orders)
        |  UNION ALL
        |  SELECT 'lineitem',
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem
        |          WHERE l_orderkey IN (SELECT o_orderkey FROM od)),
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
        |  UNION ALL
        |  SELECT 'events',
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM events
        |          WHERE user_id % 97 = 0),
        |         (SELECT CAST(COUNT(*) AS BIGINT) FROM events))
        |SELECT table_name, n_deleted, n_total,
        |       CAST(ROUND(CAST(n_deleted AS DOUBLE)
        |         / CAST(n_total AS DOUBLE) * 1000000) AS BIGINT) AS share_e6
        |FROM rows_
        |ORDER BY table_name""".stripMargin,
    // Same integer cross-multiplied vote rules (keep/drop/abstain),
    // one 18-sum agg, 6 mirrored pair rows, e6 rate divisions.
    "q320_lf_conflicts" -> lfConflictsOracle,
    // Composes the q108 gram census (per source), the q140 gridded
    // quality mean, and token shares; the health rank compares only
    // the already-gridded integers.
    "q300_health_scorecard" ->
      """WITH t AS (SELECT source, text, string_split(text, ' ') AS ws
        |           FROM documents),
        |g AS (SELECT source, unnest(list_transform(range(1, len(ws) - 8),
        |        i -> array_to_string(ws[i:i+9], ' '))) AS gram
        |      FROM t WHERE len(ws) >= 10),
        |c AS (SELECT gram, COUNT(*) AS n FROM g GROUP BY gram),
        |dup AS (
        |  SELECT g.source, CAST(COUNT(*) AS BIGINT) AS n_grams,
        |         CAST(SUM(CASE WHEN c.n > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS dup_grams
        |  FROM g JOIN c USING (gram) GROUP BY g.source),
        |q AS (
        |  SELECT source,
        |    CAST(len(ws) AS BIGINT) AS tk,
        |    CAST(ROUND(ROUND((1.0 - CAST(len(list_filter(ws,
        |                        w -> w IN ('a','the'))) AS DOUBLE)
        |            / len(ws))
        |          * LEAST(CAST(len(ws) AS DOUBLE) / 50.0, 1.0),
        |          6) * 1000000) AS BIGINT) AS q_e6
        |  FROM t),
        |qs AS (
        |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(SUM(tk) AS BIGINT) AS n_tokens,
        |         CAST(SUM(q_e6) AS BIGINT) AS sq_e6
        |  FROM q GROUP BY source),
        |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS corpus_tokens
        |        FROM qs),
        |j AS (
        |  SELECT qs.source, n_docs, n_tokens,
        |         CAST(ROUND(CAST(dup_grams AS DOUBLE)
        |                    / CAST(n_grams AS DOUBLE) * 1000000) AS BIGINT)
        |           AS dup_e6,
        |         CAST(ROUND(CAST(sq_e6 AS DOUBLE) / CAST(n_docs AS DOUBLE)
        |                    / 100.0) AS BIGINT) AS mean_q_e4,
        |         CAST(ROUND(CAST(n_tokens AS DOUBLE)
        |                    / CAST(corpus_tokens AS DOUBLE) * 1000000)
        |              AS BIGINT) AS token_share_e6
        |  FROM dup JOIN qs ON qs.source = dup.source CROSS JOIN tot)
        |SELECT source, n_docs, n_tokens, dup_e6, mean_q_e4, token_share_e6,
        |       CAST(ROW_NUMBER() OVER (ORDER BY dup_e6, mean_q_e4 DESC,
        |                               source) AS BIGINT) AS health_rank
        |FROM j
        |ORDER BY source""".stripMargin,
    // Same (lang × source) grid, HUGEINT n² and Σns², one mirrored
    // division e4.
    "q295_source_diversity" ->
      """WITH g AS (
        |  SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS ns
        |  FROM documents GROUP BY 1, 2)
        |SELECT lang, CAST(SUM(ns) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS n_sources,
        |       CAST(ROUND(CAST(CAST(SUM(ns) AS HUGEINT) * SUM(ns) AS DOUBLE)
        |                  / CAST(SUM(CAST(ns AS HUGEINT) * ns) AS DOUBLE)
        |                  * 10000) AS BIGINT) AS eff_sources_e4
        |FROM g GROUP BY lang
        |ORDER BY lang""".stripMargin,
    // Same distinct (user, type) frame and purchase flag; the Wilson
    // expression textually mirrored with every 1.96 cast to DOUBLE
    // before arithmetic (a bare DuckDB decimal literal would multiply
    // exactly, diverging a ulp from double·double).
    "q274_wilson_ci" ->
      """WITH pairs AS (
        |  SELECT DISTINCT user_id, event_type FROM events),
        |buyers AS (
        |  SELECT user_id, 1 AS conv FROM pairs WHERE event_type = 'purchase'),
        |a AS (
        |  SELECT p.event_type, CAST(COUNT(*) AS BIGINT) AS n_users,
        |         CAST(SUM(COALESCE(b.conv, 0)) AS BIGINT) AS n_conv
        |  FROM pairs p LEFT JOIN buyers b ON p.user_id = b.user_id
        |  GROUP BY p.event_type),
        |d AS (
        |  SELECT event_type, n_users, n_conv,
        |         CAST(n_users AS DOUBLE) AS n, CAST(n_conv AS DOUBLE) AS k,
        |         CAST(1.96 AS DOUBLE) AS z
        |  FROM a),
        |e AS (
        |  SELECT event_type, n_users, n_conv, n, k, z,
        |         k / n AS ph, 1.0 + z * z / n AS den
        |  FROM d)
        |SELECT event_type, n_users, n_conv,
        |  CAST(ROUND(ph * 1000000) AS BIGINT) AS phat_e6,
        |  CAST(ROUND(((ph + z * z / (2.0 * n)) / den
        |    - (z * sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n))) / den)
        |    * 1000000) AS BIGINT) AS lo_e6,
        |  CAST(ROUND(((ph + z * z / (2.0 * n)) / den
        |    + (z * sqrt(ph * (1.0 - ph) / n + z * z / (4.0 * n * n))) / den)
        |    * 1000000) AS BIGINT) AS hi_e6
        |FROM e
        |ORDER BY event_type""".stripMargin,
    // Same confusion cells (q178's guessLang SQL mirror), HUGEINT
    // marginal products over the full-outer class union, one double
    // division e9-gridded, NULL on a zero denominator.
    "q272_lang_kappa" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS s_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','die','und','das'))) AS s_de,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','que'))) AS s_es,
        |    len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les'))) AS s_fr
        |  FROM documents),
        |pred AS (
        |  SELECT lang,
        |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |         WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |         WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |         WHEN s_fr > 0 THEN 'fr'
        |         ELSE 'unknown' END AS guess
        |  FROM scored),
        |cells AS (
        |  SELECT lang, guess, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM pred GROUP BY 1, 2),
        |r AS (SELECT lang AS c, CAST(SUM(n) AS HUGEINT) AS row_n
        |      FROM cells GROUP BY 1),
        |cl AS (SELECT guess AS c, CAST(SUM(n) AS HUGEINT) AS col_n
        |       FROM cells GROUP BY 1),
        |m AS (SELECT CAST(SUM(COALESCE(row_n, 0) * COALESCE(col_n, 0))
        |             AS HUGEINT) AS rc
        |      FROM r FULL JOIN cl USING (c)),
        |t AS (SELECT CAST(SUM(n) AS HUGEINT) AS n_docs,
        |             CAST(SUM(CASE WHEN lang = guess THEN n ELSE 0 END)
        |                  AS HUGEINT) AS n_agree
        |      FROM cells)
        |SELECT CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(n_agree AS BIGINT) AS n_agree,
        |       CAST(rc AS BIGINT) AS sum_rc,
        |       CASE WHEN n_docs * n_docs - rc = 0 THEN NULL
        |            ELSE CAST(ROUND(CAST(n_docs * n_agree - rc AS DOUBLE)
        |                            / CAST(n_docs * n_docs - rc AS DOUBLE)
        |                            * 1000000000) AS BIGINT) END AS kappa_e9
        |FROM t CROSS JOIN m""".stripMargin,
    // Same stopword scores, integer (10·best)//total buckets, identical
    // per-doc Brier double e9-gridded BEFORE the sum.
    "q273_conf_calibration" ->
      """WITH scored AS (
        |  SELECT lang,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS s_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','die','und','das'))) AS s_de,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','que'))) AS s_es,
        |    len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les'))) AS s_fr
        |  FROM documents),
        |g AS (
        |  SELECT lang,
        |    CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |         WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |         WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |         WHEN s_fr > 0 THEN 'fr'
        |         ELSE 'unknown' END AS guess,
        |    GREATEST(s_en, s_de, s_es, s_fr) AS best,
        |    s_en + s_de + s_es + s_fr AS total
        |  FROM scored),
        |d AS (
        |  SELECT (10 * best) // (total + 1) AS bucket,
        |         CASE WHEN guess = lang THEN 1 ELSE 0 END AS ok,
        |         CAST(ROUND(
        |           (CAST(best AS DOUBLE) / CAST(total + 1 AS DOUBLE)
        |              - CASE WHEN guess = lang THEN 1.0 ELSE 0.0 END)
        |           * (CAST(best AS DOUBLE) / CAST(total + 1 AS DOUBLE)
        |              - CASE WHEN guess = lang THEN 1.0 ELSE 0.0 END)
        |           * 1000000000) AS BIGINT) AS term_e9
        |  FROM g WHERE total > 0)
        |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
        |       CAST(SUM(ok) AS BIGINT) AS n_correct,
        |       CAST(ROUND(CAST(SUM(ok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
        |                  * 1000000) AS BIGINT) AS acc_e6,
        |       CAST(SUM(term_e9) AS BIGINT) AS brier_e9
        |FROM d GROUP BY bucket
        |ORDER BY bucket""".stripMargin,
    // Same dense (source × bucket) grid, identical smoothed p/q
    // doubles, per-bucket e9 rounding BEFORE the integer sum.
    "q232_psi_drift" ->
      """WITH lx AS (
        |  SELECT source, n_chars // 100 AS b, CAST(COUNT(*) AS BIGINT) AS nsx
        |  FROM documents GROUP BY 1, 2),
        |xs AS (SELECT b, CAST(SUM(nsx) AS BIGINT) AS nx FROM lx GROUP BY b),
        |cs AS (SELECT source, CAST(SUM(nsx) AS BIGINT) AS ns
        |       FROM lx GROUP BY source),
        |tot AS (SELECT CAST(SUM(nx) AS BIGINT) AS n,
        |               CAST(COUNT(*) AS BIGINT) AS k FROM xs),
        |grid AS (
        |  SELECT cs.source, cs.ns, tot.n, tot.k,
        |         COALESCE(lx.nsx, 0) AS nsx,
        |         xs.nx - COALESCE(lx.nsx, 0) AS nrx
        |  FROM cs CROSS JOIN xs CROSS JOIN tot
        |  LEFT JOIN lx ON lx.source = cs.source AND lx.b = xs.b),
        |terms AS (
        |  SELECT source, ns, k,
        |         CAST(ROUND(
        |           ((nsx + 1.0) / CAST(ns + k AS DOUBLE)
        |              - (nrx + 1.0) / CAST(n - ns + k AS DOUBLE))
        |           * ln(((nsx + 1.0) / CAST(ns + k AS DOUBLE))
        |                / ((nrx + 1.0) / CAST(n - ns + k AS DOUBLE)))
        |           * 1000000000) AS BIGINT) AS term_e9
        |  FROM grid)
        |SELECT source, CAST(MAX(ns) AS BIGINT) AS n_docs,
        |       CAST(MAX(k) AS BIGINT) AS n_buckets,
        |       CAST(SUM(term_e9) AS BIGINT) AS psi_e9
        |FROM terms GROUP BY source
        |ORDER BY source""".stripMargin,
    // Same integer day buckets; HUGEINT stands in for decimal(38);
    // one mirrored double division at the end.
    // Same QI bucketing, same two-level census.
    "q255_kanon_audit" ->
      """WITH q AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nation, c_mktsegment AS seg,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           // 500000 AS bb,
        |         COUNT(*) AS n
        |  FROM customer GROUP BY 1, 2, 3)
        |SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_classes,
        |       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_risky,
        |       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
        |         AS n_exposed,
        |       CAST(MIN(n) AS BIGINT) AS min_class
        |FROM q GROUP BY nation
        |ORDER BY nation""".stripMargin,
    // Same observed-cell frame, each count cast to double BEFORE the
    // products, identical per-cell e9 rounding, exact integer sum.
    // Sensitivity audit mirrored: exact cents, (cents, -custkey)
    // max-struct pick as ORDER BY ... LIMIT per group via window.
    "q268_sensitivity_audit" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS cust_cents
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT n_name, o_custkey, cust_cents
        |  FROM pc
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |best AS (
        |  SELECT n_name, o_custkey, cust_cents,
        |         ROW_NUMBER() OVER (PARTITION BY n_name
        |                            ORDER BY cust_cents DESC, o_custkey)
        |           AS rn
        |  FROM j),
        |tot AS (
        |  SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
        |         CAST(SUM(cust_cents) AS BIGINT) AS total_cents
        |  FROM j GROUP BY 1)
        |SELECT tot.n_name, n_customers, total_cents,
        |       b.cust_cents AS sensitivity_cents,
        |       b.o_custkey AS worst_custkey,
        |       CAST(ROUND(CAST(b.cust_cents AS DOUBLE)
        |                  / CAST(total_cents AS DOUBLE) * 1000000) AS BIGINT)
        |         AS share_e6
        |FROM tot JOIN best b ON tot.n_name = b.n_name AND b.rn = 1
        |ORDER BY tot.n_name""".stripMargin,
    // BH mirrored: HUGEINT Cantelli rationals rc·n/(rc·n+(nO−rc)²),
    // the SAME IEEE quotient as the rank key, the integer
    // cross-multiplied accept predicate.
    "q258_bh_fdr" ->
      """WITH d AS (
        |  SELECT event_type,
        |         (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7
        |           AS dow
        |  FROM events),
        |cells AS (
        |  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM d GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, dow, o,
        |         CAST(SUM(o) OVER (PARTITION BY event_type) AS HUGEINT) AS r,
        |         CAST(SUM(o) OVER (PARTITION BY dow) AS HUGEINT) AS c,
        |         CAST(SUM(o) OVER () AS HUGEINT) AS n,
        |         CAST(COUNT(*) OVER () AS HUGEINT) AS m
        |  FROM cells),
        |f AS (
        |  SELECT event_type, dow, o, m,
        |         CASE WHEN n * o > r * c THEN r * c * n
        |              ELSE CAST(1 AS HUGEINT) END AS pnum,
        |         CASE WHEN n * o > r * c
        |              THEN r * c * n + (n * o - r * c) * (n * o - r * c)
        |              ELSE CAST(1 AS HUGEINT) END AS pden
        |  FROM w),
        |ranked AS (
        |  SELECT *, CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE) AS p_dbl,
        |         ROW_NUMBER() OVER (
        |           ORDER BY CAST(pnum AS DOUBLE) / CAST(pden AS DOUBLE),
        |                    event_type, dow) AS rank
        |  FROM f),
        |km AS (
        |  SELECT COALESCE(MAX(CASE WHEN 4 * pnum * m <= pden * rank
        |                            THEN rank END), 0) AS kmax
        |  FROM ranked)
        |SELECT event_type, dow, o, CAST(rank AS BIGINT) AS rank,
        |       CAST(ROUND(p_dbl * 1000000000) AS BIGINT) AS p_e9,
        |       CAST(CASE WHEN rank <= kmax THEN 1 ELSE 0 END AS BIGINT)
        |         AS rejected
        |FROM ranked CROSS JOIN km
        |ORDER BY rank""".stripMargin,
    "q247_mutual_info" ->
      """WITH d AS (
        |  SELECT event_type,
        |         (epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 + 4) % 7
        |           AS dow
        |  FROM events),
        |cells AS (
        |  SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS o
        |  FROM d GROUP BY 1, 2),
        |w AS (
        |  SELECT event_type, dow, o,
        |         SUM(o) OVER (PARTITION BY event_type) AS r,
        |         SUM(o) OVER (PARTITION BY dow) AS c,
        |         SUM(o) OVER () AS n
        |  FROM cells),
        |terms AS (
        |  SELECT event_type, r,
        |         CAST(ROUND(
        |           (CAST(o AS DOUBLE) / CAST(n AS DOUBLE))
        |           * ln((CAST(o AS DOUBLE) * CAST(n AS DOUBLE))
        |                / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE)))
        |           * 1000000000) AS BIGINT) AS term_e9
        |  FROM w)
        |SELECT event_type, CAST(MAX(r) AS BIGINT) AS n_events,
        |       CAST(COUNT(*) AS BIGINT) AS n_cells,
        |       CAST(SUM(term_e9) AS BIGINT) AS mi_part_e9
        |FROM terms GROUP BY event_type
        |ORDER BY event_type""".stripMargin,
    "q233_overdispersion" ->
      """WITH d AS (
        |  SELECT event_type,
        |         epoch_us(CAST(ts AS TIMESTAMP)) // 86400000000 AS day
        |  FROM events),
        |c AS (
        |  SELECT event_type, day, CAST(COUNT(*) AS BIGINT) AS x
        |  FROM d GROUP BY 1, 2),
        |a AS (
        |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days,
        |         CAST(SUM(x) AS BIGINT) AS n_events,
        |         SUM(CAST(x AS HUGEINT) * x) AS s2
        |  FROM c GROUP BY event_type)
        |SELECT event_type, n_days, n_events,
        |  CAST(ROUND(
        |    CAST(CAST(n_days AS HUGEINT) * s2
        |           - CAST(n_events AS HUGEINT) * n_events AS DOUBLE)
        |      / CAST((n_days - 1) * n_events AS DOUBLE) * 10000) AS BIGINT)
        |    AS vmr_e4
        |FROM a ORDER BY event_type""".stripMargin,
    // The q134 weight expression verbatim; all-integer plan math after
    // the single e6 rounding.
    "q234_mixture_plan" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS toks
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(pow(toks, 0.7)) AS z FROM t),
        |w AS (
        |  SELECT source, CAST(toks AS BIGINT) AS tokens,
        |         CAST(ROUND(pow(toks, 0.7) / z * 1000000) AS BIGINT)
        |           AS weight_e6
        |  FROM t CROSS JOIN tot),
        |p AS (
        |  SELECT source, tokens, weight_e6,
        |         1000000 * weight_e6 // 1000000 AS desired_tokens
        |  FROM w),
        |pl AS (
        |  SELECT source, tokens, weight_e6, desired_tokens,
        |         LEAST(desired_tokens, 4 * tokens) AS planned_tokens
        |  FROM p)
        |SELECT source, tokens, weight_e6, desired_tokens, planned_tokens,
        |       planned_tokens * 10000 // tokens AS epochs_e4,
        |       desired_tokens - planned_tokens AS deficit
        |FROM pl ORDER BY source""".stripMargin,
    // Same (freq DESC, word) vocab cutoff; token mass collapsed to the
    // (source, word) frame before the vocab anti-membership test.
    "q236_oov_rate" ->
      """WITH tf AS (
        |  SELECT source, w, CAST(COUNT(*) AS BIGINT) AS tf
        |  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  GROUP BY source, w),
        |vocab AS (
        |  SELECT w FROM (
        |    SELECT w, ROW_NUMBER() OVER (ORDER BY cnt DESC, w) AS rank
        |    FROM (SELECT w, CAST(COUNT(*) AS BIGINT) AS cnt
        |          FROM (SELECT unnest(string_split(text, ' ')) AS w
        |                FROM documents)
        |          GROUP BY w))
        |  WHERE rank <= 100),
        |j AS (
        |  SELECT tf.source, tf.tf,
        |         CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END AS oov
        |  FROM tf LEFT JOIN vocab ON vocab.w = tf.w)
        |SELECT source, CAST(SUM(tf) AS BIGINT) AS n_tokens,
        |       CAST(SUM(CASE WHEN oov = 1 THEN tf ELSE 0 END) AS BIGINT)
        |         AS n_oov,
        |       CAST(SUM(oov) AS BIGINT) AS n_oov_types,
        |       CAST(ROUND(CAST(SUM(CASE WHEN oov = 1 THEN tf ELSE 0 END)
        |                       AS DOUBLE)
        |                  / CAST(SUM(tf) AS DOUBLE) * 10000) AS BIGINT)
        |         AS oov_e4
        |FROM j GROUP BY source
        |ORDER BY source""".stripMargin,
  )
}
