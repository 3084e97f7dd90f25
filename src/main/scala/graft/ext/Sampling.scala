package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Reproducible corpus sampling & batching operators for LLM training
  * pipelines (SURVEY §2.4 extension family):
  *
  *  - [[hashSplit]] — deterministic train/val/test assignment from a
  *    content-stable key. The industry failure mode this kills: `rand()`
  *    splits that reshuffle membership on every rerun/backfill and leak
  *    val docs into train. An md5 bucket is pure map-side compute —
  *    no shuffle, no state, identical on any engine, stable forever.
  *  - [[packBudget]] — size-budget sequence packing (pretraining batch
  *    assembly): a running sum per SHARD (not global — a global
  *    ORDER BY window would serialize the whole corpus through one
  *    task at 100 TB) bins documents into contiguous packs.
  *  - [[mixKeep]] — per-source weighted downsampling (domain mixing)
  *    as a map-side filter: rate lives in a CASE/broadcast table, the
  *    kept set is deterministic, and no shuffle happens at all.
  *
  * All three are oracle-certified (q76-q78) because they are pure
  * integer/string compute — no RNG anywhere.
  */
object Sampling {

  /** 256-way uniform bucket from the md5 hex prefix of a key. Hex
    * strings of equal length compare lexicographically = numerically,
    * so thresholds are just 2-hex-char literals ('cd' ≈ 205/256 ≈ 80%).
    */
  def bucket256(key: Column): Column =
    substring(md5(key.cast("string")), 1, 2)

  /** Adds `split` ∈ train/val/test. Defaults ≈ 80/10/10 (205/25/26 of
    * the 256 buckets).
    */
  /** A threshold compared against [[bucket256]] output must itself be a
    * lowercase 2-hex string ('zz' allowed as keep-all) — uppercase,
    * wrong-length, or non-hex values compare lexicographically against
    * the md5 prefix and silently misassign every row.
    */
  private val HexThreshold = "^([0-9a-f]{2}|zz)$".r
  private def requireHex(name: String, v: String): Unit = require(
    HexThreshold.matches(v),
    s"$name must be a lowercase 2-hex-char threshold (or 'zz'), got '$v'")

  def hashSplit(
      df: DataFrame, key: Column,
      trainHi: String = "cd", valHi: String = "e6"): DataFrame = {
    requireHex("trainHi", trainHi)
    requireHex("valHi", valHi)
    require(trainHi <= valHi,
      s"trainHi ('$trainHi') must be <= valHi ('$valHi') — otherwise the 'val' split is unreachable")
    val b = bucket256(key)
    df.withColumn("split",
      when(b < trainHi, "train").when(b < valHi, "val").otherwise("test"))
  }

  /** Adds `pack_id`: documents are packed in `order` within `shard`
    * into bins of `budget` size-units; a doc belongs to the pack its
    * START offset falls in. (A doc larger than the budget still lands
    * in the pack its start offset falls in — it may share that pack
    * with a predecessor, and the ids its span crosses are skipped; pack
    * ids are contiguous only when every doc size ≤ budget.) The window
    * runs per shard, so the running sum parallelizes
    * across shards — never a global single-task sort. Division happens
    * in double then truncates to long: exact while the per-shard
    * cumulative size < 2^53 (9 PB of chars per shard — not a real
    * constraint).
    */
  def packBudget(
      df: DataFrame, shard: Column, order: Column, size: Column,
      budget: Long): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(order)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val startOffset = sum(size).over(w) - size
    df.withColumn("pack_id", floor(startOffset / lit(budget.toDouble)).cast("long"))
  }

  /** Keep-filter for weighted source mixing: a row survives iff its
    * bucket clears the per-row rate threshold (a 2-hex-char string,
    * 'zz' = keep-all since every bucket < 'zz').
    */
  def mixKeep(df: DataFrame, key: Column, rateHex: Column): DataFrame = {
    // rateHex is per-row (a CASE or broadcast-joined rate table), so the
    // shape check runs in-plan: a malformed rate fails the job loudly
    // instead of silently skewing the mix.
    // coalesce inside the message: a NULL rateHex (e.g. an unmatched
    // left-joined rate table) must name itself, not null the whole
    // concat and raise a message-less error
    val guarded = when(rateHex.rlike("^([0-9a-f]{2}|zz)$"), bucket256(key) < rateHex)
      .otherwise(raise_error(concat(lit("mixKeep: rateHex must be 2 lowercase hex chars or 'zz', got '"),
        coalesce(rateHex, lit("<null>")), lit("'"))).cast("boolean"))
    df.filter(guarded)
  }

  // ---- certifying queries ------------------------------------------

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** q76: split × lang census of the deterministic 80/10/10 split. */
  def q76(s: SparkSession, dir: String): DataFrame =
    hashSplit(docs(s, dir), col("doc_id"))
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy("split", "lang")

  /** q77: pack census — 4096-char packs per source shard. */
  def q77(s: SparkSession, dir: String): DataFrame =
    packBudget(docs(s, dir), col("source"), col("doc_id"), col("n_chars"), 4096L)
      .groupBy(col("source"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
      .orderBy("source", "pack_id")

  /** q78: domain mixing — even-numbered sources kept whole, odd ones
    * downsampled to ~25%, reported per source.
    */
  def q78(s: SparkSession, dir: String): DataFrame = {
    // length-unbounded substr — must parse the identical suffix the
    // oracle's substr(source, 4) does, whatever the id width
    val rate = when(
      expr("substr(source, 4)").cast("int") % 2 === 0, lit("zz"))
      .otherwise(lit("40"))
    mixKeep(docs(s, dir), col("doc_id"), rate)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("kept"), sum(col("n_chars")).as("chars"))
      .orderBy("source")
  }

  /** Deterministic epoch shuffle + shard assignment: the write-
    * training-shards shape. Every (epoch, doc) gets an md5 sort key;
    * the first hex nibble is the shard, and the position within the
    * shard is a window ORDERED BY that key — a different, reproducible
    * permutation per epoch, with no RNG and no global ORDER BY.
    *
    * Scale shape: the shard nibble is map-side compute; the only
    * shuffle is the (epoch, shard)-partitioned window, and each window
    * partition holds corpus/16 docs — in production the nibble widens
    * (2 hex chars = 256 shards, 4 = 64k) so the per-shard sort stays
    * executor-sized no matter the corpus. Contrast with the naive
    * `ORDER BY rand()` epoch shuffle: non-reproducible AND a global
    * sort whose final range-partition step has no natural shard
    * boundary alignment.
    */
  def epochShard(d: DataFrame, id: Column, epoch: Column): DataFrame = {
    val key = md5(concat_ws(":", epoch, id.cast("string")))
    val shard = (instr(lit("0123456789abcdef"), substring(key, 1, 1)) - 1)
      .cast("long")
    d.select(epoch.as("epoch"), id.as("doc_id"), key.as("__k"), shard.as("shard"))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("epoch"), col("shard"))
          // md5 collisions are negligible but the id tie-break keeps
          // the ordering a total order by construction.
          .orderBy(col("__k"), col("doc_id"))).cast("long"))
      .drop("__k")
  }

  /** q124: two epochs of the deterministic shuffle, full listing —
    * certifies that the permutation is reproducible AND differs across
    * epochs (the hashes diverge by construction; the oracle recomputes
    * both independently).
    */
  def q124(s: SparkSession, dir: String): DataFrame = {
    val epochs = Seq("ep1", "ep2")
    epochs.map { ep =>
      epochShard(docs(s, dir), col("doc_id"), lit(ep))
    }.reduce(_ unionAll _).orderBy("epoch", "shard", "pos")
  }

  /** q267 — training-shard MANIFEST: the artifact a training job
    * checks before consuming an epoch's shards — per shard, the doc
    * census (count, tokens, chars), an ORDER-INSENSITIVE content sum
    * (Σ md5-prefix-40bit(text) — additive, so two manifests diff by
    * subtraction and shard unions sum), and the ORDER-SENSITIVE chain
    * fingerprint md5(concat of per-doc md5s in pos order) — the
    * reproducibility contract: same corpus + same epoch key ⇒
    * byte-identical training stream per shard. Built on q124's
    * certified epochShard permutation.
    *
    * Float-free. Scale: the shard assignment is map-side md5; the
    * chain fingerprint needs the per-shard pos order — the q124 window
    * (shard-keyed); the content sum is a plain partial agg (40-bit
    * prefixes × shard cardinality stay < 2⁵³ far past bench scale;
    * decimal(38) is the swap beyond). The manifest frame is
    * shard-cardinality, not corpus-cardinality.
    */
  def q267(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    epochShard(d, col("doc_id"), lit("ep1"))
      .join(d.select(col("doc_id"), col("text"), col("n_chars")), "doc_id")
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text"))).cast("long").as("n_tokens"),
        sum(col("n_chars")).as("n_chars"),
        sum(conv(substring(md5(col("text")), 1, 10), 16, 10).cast("long"))
          .as("content_sum"),
        md5(concat_ws("",
          transform(
            array_sort(collect_list(
              struct(col("pos"), md5(col("text")).as("h")))),
            x => x.getField("h")))).as("chain_fp"))
      .orderBy("shard")
  }

  /** Deterministic k-per-stratum sample: within each stratum, keep the
    * k rows with the smallest md5 sort key — a reproducible "uniform"
    * sample (the md5 order is uncorrelated with any data attribute)
    * that never touches an RNG, so reruns and backfills select the
    * SAME rows (the q76 motivation, applied to fixed-size samples).
    *
    * Scale shape: two-phase top-k. Phase 1 takes the per-(stratum,
    * hash-nibble) top-k inside each of 16 sub-partitions; phase 2 ranks
    * the ≤ 16k survivors per stratum. A single per-stratum window would
    * pull an entire (possibly multi-TB) stratum through one task; the
    * nibble split caps phase-1 partitions at stratum/16 (widen the
    * nibble at larger scale), and phase 2 is O(k) rows per stratum.
    * Result is identical to the one-window form — top-k of a union of
    * covering sub-top-ks.
    */
  def stratumSample(d: DataFrame, stratum: Column, id: Column, k: Int): DataFrame = {
    require(k >= 1, s"stratumSample: k must be >= 1, got $k")
    val key = md5(id.cast("string"))
    val nib = substring(key, 1, 1)
    val phase1 = d
      .select(stratum.as("stratum"), id.as("doc_id"), key.as("__k"), nib.as("__n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("stratum"), col("__n"))
          .orderBy(col("__k"), col("doc_id"))))
      .filter(col("rn") <= k)
    phase1
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("stratum"))
          .orderBy(col("__k"), col("doc_id"))).cast("long"))
      .filter(col("rk") <= k)
      .select(col("stratum"), col("doc_id"), col("rk"))
  }

  /** q131: 3 docs per language, reproducibly. */
  def q131(s: SparkSession, dir: String): DataFrame =
    stratumSample(docs(s, dir), col("lang"), col("doc_id"), k = 3)
      .orderBy("stratum", "rk")

  /** q134 — temperature-scaled source mixing weights: p_s ∝ c_s^α with
    * α = 0.7, the standard up-weighting of small sources for
    * multilingual/multi-domain pretraining mixes (α = 1 is
    * proportional sampling, α = 0 uniform). Pure aggregate math: one
    * per-source token-count agg, totals on a one-row broadcast —
    * nothing here grows with the corpus beyond the first scan.
    */
  def q134(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " "))).cast("double").as("toks"))
    val tot = t.agg(
      sum(col("toks")).as("n"),
      sum(pow(col("toks"), lit(0.7))).as("z"))
    t.withGlobalStats(tot)
      .select(
        col("source"),
        col("toks").cast("long").as("tokens"),
        graft.ext.Similarity.intScaled(col("toks") / col("n"), 1000000L)
          .as("share_e6"),
        graft.ext.Similarity.intScaled(pow(col("toks"), lit(0.7)) / col("z"), 1000000L)
          .as("alpha_weight_e6"))
      .orderBy("source")
  }

  /** q139 — split-leakage audit: near-dup pairs (simhash bands, the
    * q65 candidate set) whose members land in DIFFERENT train/val/test
    * splits. The content-hash split (q76) is deterministic but blind to
    * near-duplication — two near-identical docs hash independently, so
    * some pairs straddle the boundary and leak train signal into eval.
    * This census quantifies the leak; the production fix is splitting
    * by DEDUP GROUP (q102's component label) instead of raw doc id.
    * Composition of two certified paths; pair-set-sized frames after
    * the band join.
    */
  def q139(s: SparkSession, dir: String): DataFrame = {
    val subset = docs(s, dir).filter(col("doc_id") < 1000)
    val pairs = Components.probeBandPairs(s, dir) // r17 shared LSH pass
      .select(col("id_a"), col("id_b"))
    val split = hashSplit(subset, col("doc_id")).select(col("doc_id"), col("split"))
    pairs
      .join(split.select(col("doc_id").as("id_a"), col("split").as("split_a")), "id_a")
      .join(split.select(col("doc_id").as("id_b"), col("split").as("split_b")), "id_b")
      .groupBy(col("split_a"), col("split_b"))
      .agg(count(lit(1)).as("pairs"))
      .select(col("split_a"), col("split_b"), col("pairs"),
        when(col("split_a") =!= col("split_b"), 1L).otherwise(0L).as("is_leak"))
      .orderBy("split_a", "split_b")
  }

  /** Deterministic WEIGHTED sample without replacement
    * (Efraimidis–Spirakis, IPL 2006): item i gets key ln(u_i)/w_i with
    * u_i uniform; the top-k by key IS a weight-proportional sample.
    * u_i is derived from the md5 prefix — 13 hex chars = 52 bits, so
    * u = m/2⁵² is EXACT in a double and reruns/backfills draw the SAME
    * sample (the q76/q131 no-RNG discipline, now weight-aware).
    *
    * Cross-engine float discipline: ranking uses the e9-SCALED key
    * (+ id tie-break), never the raw double — ln() is the only drifting
    * op (~1 ulp between libms) and the e9 grid dwarfs it; the margin is
    * spec-pinned. Top-k is TakeOrderedAndProject — no global sort.
    *
    * @param weight strictly positive; rows with w ≤ 0 are dropped (a
    *               zero-weight doc can never be sampled)
    */
  def weightedSample(d: DataFrame, id: Column, weight: Column, k: Int): DataFrame = {
    require(k >= 1, s"weightedSample: k must be >= 1, got $k")
    val m = conv(substring(md5(id.cast("string")), 1, 13), 16, 10).cast("long")
    val u = m.cast("double") / lit(4503599627370496.0) // 2^52 = 16^13, exact
    // ln(u) is computed in the FIRST projection, while the caller's id
    // column is still resolvable (it may not be named doc_id).
    d.select(id.as("doc_id"), weight.cast("double").as("w"), log(u).as("__lnu"))
      .filter(col("w") > 0)
      .select(col("doc_id"), col("w").cast("long").as("w"),
        Similarity.intScaled(col("__lnu") / col("w"), 1000000000L).as("key_e9"))
      .orderBy(col("key_e9").desc, col("doc_id"))
      .limit(k)
  }

  /** q154 — length-weighted doc sample (w = n_chars): the token-budget
    * draw a mixing pipeline uses when "sample 1% of the corpus" means
    * 1% of the TOKENS, not 1% of the documents.
    */
  def q154(s: SparkSession, dir: String): DataFrame =
    weightedSample(docs(s, dir), col("doc_id"), col("n_chars"), k = 200)

  /** q174 — split-balance χ² audit: the (split × source) contingency
    * grid of the q76 hash split, each cell carrying its observed
    * count, independence-expected count, and χ² contribution
    * (O−E)²/E — the "did the hash split accidentally correlate with a
    * covariate" check run before trusting a train/val/test cut
    * (q139's leakage audit is the content-level cousin; this is the
    * distributional one).
    *
    * Per-cell values only, deliberately no χ² total: each cell is a
    * pure function of four exact integers through one identical
    * expression shape — bit-exact cross-engine (the q161 pattern) —
    * whereas a cross-cell sum would reintroduce summation-order
    * drift for nothing (the reader's threshold test sums a dozen
    * exact e4 integers instead).
    *
    * Scale: one corpus-sized count agg; marginals and the grid are
    * (splits × sources)-sized.
    */
  def q174(s: SparkSession, dir: String): DataFrame = {
    val cell = hashSplit(docs(s, dir), col("doc_id"))
      .groupBy(col("split"), col("source")).agg(count(lit(1)).as("n"))
      .localCheckpoint(true) // tiny grid; branched into 3 marginals
    val rowt = cell.groupBy(col("split")).agg(sum(col("n")).as("n_split"))
    val colt = cell.groupBy(col("source")).agg(sum(col("n")).as("n_source"))
    val tot = cell.agg(sum(col("n")).as("n_total"))
    val e = (col("n_split") * col("n_source")).cast("double") / col("n_total")
    cell.join(rowt, "split").join(colt, "source")
      .withGlobalStats(tot)
      .select(col("split"), col("source"), col("n"),
        Similarity.intScaled(e, 10000L).as("expected_e4"),
        Similarity.intScaled(
          (col("n") - e) * (col("n") - e) / e, 10000L).as("chi2_e4"))
      .orderBy("split", "source")
  }

  /** q241 — k-fold cross-validation audit: deterministic md5 fold
    * assignment (k=5, the q76/q227 bucket rule) with per-fold vs
    * out-of-fold mean document length. The sanity table an evaluation
    * harness prints before trusting CV numbers: if any fold's
    * in/out-of-fold delta is large, the folds are not exchangeable
    * and the CV variance estimate is junk. All-integer (floor means
    * via DIV; totals ride the one-row broadcast crossJoin shape).
    *
    * Scale: one corpus scan → 5-row fold frame; the totals join is a
    * broadcast of one row. Fold assignment is pure map-side hashing —
    * no RNG, reproducible on any engine (q76 discipline).
    */
  def q241(s: SparkSession, dir: String): DataFrame = {
    val fold = pmod(
      conv(substring(md5(col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long"), lit(5L))
    val folds = docs(s, dir)
      .select(fold.as("fold"), col("n_chars"))
      .groupBy(col("fold"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("sum_chars"))
    folds
      .withGlobalStats(folds.agg(sum(col("n_docs")).as("tn"),
        sum(col("sum_chars")).as("ts")))
      .select(col("fold"), col("n_docs"), col("sum_chars"),
        expr("sum_chars DIV n_docs").as("mean_fc"),
        expr("(ts - sum_chars) DIV (tn - n_docs)").as("oof_mean_fc"))
      .withColumn("delta_fc", col("mean_fc") - col("oof_mean_fc"))
      .orderBy("fold")
  }

  /** q368 — sequence-packing budget curve: q77's deterministic
    * cum-offset packing swept over context budgets {2048, 4096, 8192}
    * chars, reporting per budget the pack count, the fill rate
    * (chars / packs·budget), and the oversize-doc count (n_chars >
    * budget — the docs a packer must truncate or split) — how the
    * one free packing parameter is chosen, the exact q350
    * threshold-curve pattern applied to training-batch assembly.
    *
    * Exactness: pack ids are q77's floor-division assignment; all
    * censuses are exact integers; the fill rate is ONE mirrored
    * division per budget row, e6-gridded.
    *
    * Scale: the source-keyed cumulative window runs ONCE per budget
    * over the (source, doc) frame (3× constant fan-out); everything
    * aggregates map-side after it. Output 3 rows.
    */
  def q368(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir)
      .select(col("source"), col("doc_id"), col("n_chars"))
      .withColumn("b", explode(array(lit(2048L), lit(4096L), lit(8192L))))
    val w = Window.partitionBy(col("b"), col("source")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = base
      .withColumn("pack_id",
        floor((sum(col("n_chars")).over(w) - col("n_chars")) /
          col("b").cast("double")).cast("long"))
    val packs = packed.groupBy(col("b"), col("source"), col("pack_id"))
      .agg(count(lit(1)).as("nd"), sum(col("n_chars")).as("ch"))
    packs.groupBy(col("b"))
      .agg(count(lit(1)).as("n_packs"), sum(col("ch")).as("chars"),
        sum(when(col("nd") === 1L, 1L).otherwise(0L)).as("single_doc_packs"))
      .join(
        packed.groupBy(col("b"))
          .agg(sum(when(col("n_chars") > col("b"), 1L).otherwise(0L))
            .as("oversize_docs")),
        "b")
      .select(col("b").as("budget"), col("n_packs"), col("chars"),
        col("single_doc_packs"), col("oversize_docs"),
        graft.ext.Similarity.intScaled(
          col("chars").cast("double") /
            (col("n_packs") * col("b")).cast("double"),
          1000000L).as("fill_e6"))
      .orderBy("budget")
  }

  /** q369 — temperature-sampling mixture curve: per-source mixture
    * weights w_s ∝ tokens_s^τ for τ ∈ {0.5, 0.7, 1.0} and the implied
    * per-source sampling factor (weight share ÷ natural share) — the
    * full τ sweep behind q134's single-τ table, the knob every
    * multilingual/multi-domain training mix publishes (τ=1 is
    * proportional, τ→0 uniform; the factor says how hard each tail
    * source gets up-sampled).
    *
    * Float discipline: STRICTER than q134 — each pow(tokens, τ) is
    * gridded e6 PER SOURCE, the normalizer is then an exact integer
    * sum (q134 sums raw pow() doubles across rows; certified, but the
    * gridded form removes even that order exposure), and the share
    * and factor are mirrored chains off exact integers. τ literals
    * are shared digit-for-digit; pow margins are spec-measured (the
    * q134 pattern).
    *
    * Scale: one map-side token agg to the source frame; everything
    * after rides sources × 3. Output is that frame.
    */
  def q369(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
    val taus = t
      .withColumn("tau_e2", explode(array(lit(50L), lit(70L), lit(100L))))
      .withColumn("w_e6",
        graft.ext.Similarity.intScaled(
          pow(col("toks").cast("double"), col("tau_e2").cast("double") / 100.0),
          1000000L))
    val z = taus.groupBy(col("tau_e2"))
      .agg(sum(col("w_e6")).as("z_e6"), sum(col("toks")).as("n"))
    taus.join(z, "tau_e2")
      .select(col("tau_e2"), col("source"), col("toks").as("tokens"),
        graft.ext.Similarity.intScaled(
          col("w_e6").cast("double") / col("z_e6").cast("double"),
          1000000L).as("share_e6"),
        graft.ext.Similarity.intScaled(
          col("w_e6").cast("double") / col("z_e6").cast("double") *
            col("n").cast("double") / col("toks").cast("double"),
          1000000L).as("factor_e6"))
      .orderBy("tau_e2", "source")
  }

  /** q372 — hash-shard balance census at widths S ∈ {16, 64, 256}:
    * shard by md5("shard:"||doc_id) mod S and report the used-shard
    * count, extremes, and the max/expected skew factor — the
    * pre-flight audit before any "the nibble widens at scale" claim
    * (epochShard's scaladoc) is trusted: a skewed hash here means
    * hot shards at 100 TB, and the expected skew at THIS corpus size
    * is the baseline the factor is read against.
    *
    * Exactness: shard ids are exact integer arithmetic off the hex
    * prefix; censuses are exact; the skew factor is ONE mirrored
    * chain per width, e6-gridded.
    *
    * Scale: one map-side hash + a (S × shard)-keyed count (≤ 336
    * groups); output 3 rows.
    */
  def q372(s: SparkSession, dir: String): DataFrame = {
    val h2 = conv(substring(md5(concat(lit("shard:"),
      col("doc_id").cast("string"))), 1, 2), 16, 10).cast("long")
    val d = docs(s, dir).select(h2.as("h2"))
      .withColumn("ss", explode(array(lit(16L), lit(64L), lit(256L))))
      .select(col("ss"), (col("h2") % col("ss")).as("shard"))
    d.groupBy(col("ss"), col("shard")).agg(count(lit(1)).as("n"))
      .groupBy(col("ss"))
      .agg(sum(col("n")).as("n_docs"), count(lit(1)).as("shards_used"),
        max(col("n")).as("max_shard"), min(col("n")).as("min_shard"))
      .select(col("ss").as("n_shards"), col("n_docs"), col("shards_used"),
        col("max_shard"), col("min_shard"),
        graft.ext.Similarity.intScaled(
          col("max_shard").cast("double") * col("ss").cast("double") /
            col("n_docs").cast("double"),
          1000000L).as("skew_e6"))
      .orderBy("n_shards")
  }

  /** q380 — mixture effective-sample-size curve: for q369's τ-swept
    * source weights, Kish's ESS = (Σw)²/Σw² and its share of the
    * source count — the one number that says how UNIFORM each
    * temperature actually is (τ=1 collapses toward the token-mass
    * concentration; τ→0 pushes ESS → n_sources), closing the q369
    * loop: pick τ by the ESS you can afford, not by folklore.
    *
    * Exactness: weights are q369's e6-gridded integers, so (Σw)² and
    * Σw² are EXACT decimal(38) integers; ESS is one mirrored
    * division, its share one more.
    *
    * Scale: rides q369's source frame (map-side token agg + 3×τ);
    * output 3 rows.
    */
  def q380(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir).groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ")).cast("long")).as("toks"))
    val taus = t
      .withColumn("tau_e2", explode(array(lit(50L), lit(70L), lit(100L))))
      .withColumn("w_e6",
        graft.ext.Similarity.intScaled(
          pow(col("toks").cast("double"), col("tau_e2").cast("double") / 100.0),
          1000000L))
    taus.groupBy(col("tau_e2"))
      .agg(count(lit(1)).as("n_sources"),
        sum(col("w_e6")).as("sw"),
        sum(col("w_e6").cast("decimal(38,0)") * col("w_e6")).as("sww"))
      .select(col("tau_e2"), col("n_sources"),
        graft.ext.Similarity.intScaled(
          (col("sw").cast("decimal(38,0)") * col("sw")).cast("double") /
            col("sww").cast("double"),
          100L).as("ess_x100"),
        graft.ext.Similarity.intScaled(
          (col("sw").cast("decimal(38,0)") * col("sw")).cast("double") /
            col("sww").cast("double") / col("n_sources").cast("double"),
          1000000L).as("ess_share_e6"))
      .orderBy("tau_e2")
  }

  /** q381 — split-conformal coverage audit: calibrate a one-sided
    * quality threshold on the hash-split train bucket at miscoverage
    * α = 0.1 (t = the k-th smallest calibration score, k =
    * ⌊α·(n+1)⌋ — the distribution-free split-conformal quantile), then
    * MEASURE coverage P(score ≥ t) on the held-out docs — the "does
    * the 90% guarantee actually hold on this corpus" audit that turns
    * q52's quality score into a calibrated filter (q273's calibration
    * checks a probabilistic classifier; this needs no model at all).
    *
    * Exactness: scores grid e6 FIRST; k is exact integer floor
    * arithmetic; t is an exact order statistic selected on the
    * VALUE-COLLAPSED score census (the q238 winsorized pattern — the
    * cumulative window rides distinct score values, never docs);
    * the eval compare s ≥ t is integer; coverage is one mirrored
    * division.
    *
    * Scale: one map-side score pass, a value-collapsed census window,
    * integer selection; one-row output.
    */
  def q381(s: SparkSession, dir: String): DataFrame = {
    val sE6 = graft.ext.Similarity.intScaled(
      graft.ext.TextAnalysis.qualityScore(col("text")), 1000000L)
    val scored = docs(s, dir)
      .select(col("doc_id"), col("text"))
      .withColumn("s", sE6)
      .withColumn("cal", bucket256(col("doc_id")) < "cd")
      .localCheckpoint(true) // census + eval sides
    val nCal = scored.filter(col("cal"))
      .agg(count(lit(1)).as("n_cal"))
      .select(col("n_cal"), expr("(n_cal + 1) div 10").as("k"))
    val census = scored.filter(col("cal"))
      .groupBy(col("s")).agg(count(lit(1)).as("n"))
    val wCum = Window.orderBy("s")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = census.withColumn("cum", sum(col("n")).over(wCum))
      .withGlobalStats(nCal)
      .filter(col("cum") >= col("k"))
      .agg(min(col("s")).as("t_e6"), max(col("n_cal")).as("n_cal"),
        max(col("k")).as("k"))
    scored.filter(!col("cal"))
      .withGlobalStats(t)
      .agg(max(col("n_cal")).as("n_cal"), max(col("k")).as("k"),
        max(col("t_e6")).as("t_e6"),
        count(lit(1)).as("n_eval"),
        sum(when(col("s") >= col("t_e6"), 1L).otherwise(0L))
          .as("n_covered"))
      .select(col("n_cal"), col("k"), col("t_e6"), col("n_eval"),
        col("n_covered"),
        graft.ext.Similarity.intScaled(
          col("n_covered").cast("double") / col("n_eval").cast("double"),
          1000000L).as("coverage_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q381_conformal_coverage" -> (q381 _),
    "q380_mixture_ess" -> (q380 _),
    "q368_packing_curve" -> (q368 _),
    "q369_temperature_curve" -> (q369 _),
    "q372_shard_balance" -> (q372 _),
    "q76_hash_split"  -> (q76 _),
    "q241_kfold_audit" -> (q241 _),
    "q77_seq_packing" -> (q77 _),
    "q78_corpus_mix"  -> (q78 _),
    "q124_epoch_shard" -> (q124 _),
    "q131_stratum_sample" -> (q131 _),
    "q134_temperature_mix" -> (q134 _),
    "q139_split_leakage" -> (q139 _),
    "q154_weighted_sample" -> (q154 _),
    "q174_split_balance" -> (q174 _),
    "q267_shard_manifest" -> (q267 _),
    "q392_bottomk_estimate" -> (q392 _),
    "q400_neyman_allocation" -> (q400 _),
  )

  /** q400 — Neyman-optimal stratified sample allocation: a 300-doc
    * audit budget split across sources proportional to N_h·σ_h (the
    * allocation minimizing the variance of the stratified mean —
    * proportional allocation oversamples big HOMOGENEOUS strata;
    * Neyman sends the budget where the variance lives), integerized by
    * the certified Hamilton largest-remainder core ([[Patterns
    * .apportion]] — q166's op with a variance-weighted proportionality
    * source). The sampling-design companion to q131's stratum sample
    * (WHICH docs) and q392's bottom-k (estimate WITHOUT sampling
    * rights): this decides HOW MANY per stratum.
    *
    * Exactness: N_h·σ_h = √(N_h·Q_h − S_h²) over exact decimal(38)
    * n_chars moments — ONE mirrored √ per source, e3-gridded; the
    * apportionment is then ENTIRELY integer (q166's DIV/%/rank
    * discipline), so quotas sum to exactly 300 by construction.
    *
    * Scale: one map-side moment collapse to the source frame;
    * everything after rides source cardinality (the q166 bound).
    */
  def q400(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val w = docs(s, dir).groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sv"),
        sum(col("n_chars").cast(d38) * col("n_chars")).as("qv"))
      .select(col("source"), col("n_docs"),
        Similarity.intScaled(
          sqrt((col("n_docs").cast(d38) * col("qv") -
            col("sv").cast(d38) * col("sv")).cast("double")),
          1000L).as("tokens"))
      .localCheckpoint(true) // source-sized; branched: apportion + join
    Patterns.apportion(w.select(col("source"), col("tokens")), 300L)
      .join(w.select(col("source"), col("n_docs")), "source")
      .select(col("source"), col("n_docs"),
        col("tokens").as("neyman_w_e3"), col("quota"))
      .orderBy("source")
  }

  /** q392 — bottom-k hash sampling + sample-based total estimate: per
    * source, the k = 8 docs with the smallest md5(doc_id) hash are
    * THE distributed sample (a bottom-k sketch is mergeable — the
    * union's bottom-k is the bottom-k of shard bottom-k's, so 1000
    * executors each ship k rows and the coordinator keeps k), and
    * the estimated token total n·Σ_sample/k is read against the exact
    * total — the measured sampling error IS the op's honesty check
    * (the q378 sketch-vs-exact discipline applied to sampling). The
    * q154 weighted sample answers "WHICH docs to train on"; bottom-k
    * answers "estimate corpus statistics without scanning it".
    *
    * Exactness: the hash key is the q154 52-bit md5 prefix (exact in
    * a long, deterministic forever); selection is the (h, doc_id)
    * total order; the estimate is ONE mirrored chain n·Σ/k rounded to
    * an integer token count, and the relative error is a second chain
    * off that INTEGER (two-stage grid — both engines read the same
    * rounded estimate); sources with fewer than k docs degrade to
    * k = n (estimate = exact, error 0) by construction.
    *
    * Scale: one map-side projection; the rank window is keyed by
    * source over doc rows (the q131 stratum bound; the production
    * form is a per-partition bottom-k heap merged at the combiner —
    * TopKByScore's shape); the census agg is map-side-combined.
    */
  def q392(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
      .select(col("source"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("tok"),
        conv(substring(md5(col("doc_id").cast("string")), 1, 13), 16, 10)
          .cast("long").as("h"))
    val w = Window.partitionBy("source").orderBy(col("h"), col("doc_id"))
    val est = Similarity.intScaled(
      col("n_docs").cast("double") * col("sample_tokens").cast("double") /
        col("k").cast("double"), 1L)
    d.withColumn("rn", row_number().over(w))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("tok")).as("exact_tokens"),
        sum(when(col("rn") <= 8L, 1L).otherwise(0L)).as("k"),
        sum(when(col("rn") <= 8L, col("tok")).otherwise(0L))
          .as("sample_tokens"))
      .select(col("source"), col("n_docs"), col("k"), col("exact_tokens"),
        est.as("est_tokens"),
        Similarity.intScaled(
          (est.cast("double") - col("exact_tokens").cast("double")) /
            col("exact_tokens").cast("double"),
          1000000L).as("rel_err_e6"))
      .orderBy("source")
  }

  val oracleSql: Map[String, String] = Map(
    // Same e6 score grid (q52's quality twin), same hash split, exact
    // k and order-statistic selection on the value census, integer
    // eval compare, one mirrored coverage division.
    "q381_conformal_coverage" ->
      """WITH d AS (
        |  SELECT doc_id,
        |    CAST(ROUND((1.0 - CAST(len(list_filter(string_split(text,' '),
        |           w -> w IN ('a','the'))) AS DOUBLE)
        |           / len(string_split(text,' ')))
        |         * LEAST(CAST(len(string_split(text,' ')) AS DOUBLE)
        |                 / 50.0, 1.0) * 1000000) AS BIGINT) AS s,
        |    substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' AS cal
        |  FROM documents),
        |nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal,
        |              CAST((COUNT(*) + 1) // 10 AS BIGINT) AS k
        |       FROM d WHERE cal),
        |census AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n
        |           FROM d WHERE cal GROUP BY s),
        |t AS (
        |  SELECT MIN(s) AS t_e6, MAX(n_cal) AS n_cal, MAX(k) AS k FROM (
        |    SELECT s, SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING)
        |             AS cum, n_cal, k
        |    FROM census CROSS JOIN nc)
        |  WHERE cum >= k)
        |SELECT CAST(MAX(n_cal) AS BIGINT) AS n_cal,
        |       CAST(MAX(k) AS BIGINT) AS k,
        |       CAST(MAX(t_e6) AS BIGINT) AS t_e6,
        |       CAST(COUNT(*) AS BIGINT) AS n_eval,
        |       CAST(SUM(CASE WHEN s >= t_e6 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_covered,
        |       CAST(ROUND(CAST(SUM(CASE WHEN s >= t_e6 THEN 1 ELSE 0 END)
        |           AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 1000000)
        |         AS BIGINT) AS coverage_e6
        |FROM d CROSS JOIN t WHERE NOT cal""".stripMargin,
    // q369's gridded weights, exact HUGEINT (Σw)²/Σw², two mirrored
    // divisions per τ row.
    "q380_mixture_ess" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT tau_e2,
        |         CAST(ROUND(POW(CAST(toks AS DOUBLE),
        |           CAST(tau_e2 AS DOUBLE) / 100.0) * 1000000) AS BIGINT)
        |           AS w_e6
        |  FROM t CROSS JOIN
        |    (SELECT CAST(UNNEST([50, 70, 100]) AS BIGINT) AS tau_e2))
        |SELECT tau_e2, CAST(COUNT(*) AS BIGINT) AS n_sources,
        |  CAST(ROUND(CAST(CAST(SUM(w_e6) AS HUGEINT) * SUM(w_e6)
        |      AS DOUBLE)
        |    / CAST(SUM(CAST(w_e6 AS HUGEINT) * w_e6) AS DOUBLE) * 100)
        |    AS BIGINT) AS ess_x100,
        |  CAST(ROUND(CAST(CAST(SUM(w_e6) AS HUGEINT) * SUM(w_e6)
        |      AS DOUBLE)
        |    / CAST(SUM(CAST(w_e6 AS HUGEINT) * w_e6) AS DOUBLE)
        |    / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
        |    AS ess_share_e6
        |FROM w GROUP BY tau_e2 ORDER BY tau_e2""".stripMargin,
    // q77's floor-division packing swept over the same three budgets,
    // exact censuses, one mirrored fill division per row.
    "q368_packing_curve" ->
      """WITH b AS (SELECT CAST(UNNEST([2048, 4096, 8192]) AS BIGINT) AS b),
        |c AS (
        |  SELECT b.b, source, doc_id, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY b.b, source ORDER BY doc_id
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents CROSS JOIN b),
        |packed AS (
        |  SELECT b, source, n_chars,
        |         CAST(FLOOR((cum - n_chars) / CAST(b AS DOUBLE)) AS BIGINT)
        |           AS pack_id
        |  FROM c),
        |packs AS (
        |  SELECT b, source, pack_id, CAST(COUNT(*) AS BIGINT) AS nd,
        |         CAST(SUM(n_chars) AS BIGINT) AS ch
        |  FROM packed GROUP BY b, source, pack_id),
        |agg1 AS (
        |  SELECT b, CAST(COUNT(*) AS BIGINT) AS n_packs,
        |         CAST(SUM(ch) AS BIGINT) AS chars,
        |         CAST(SUM(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS single_doc_packs
        |  FROM packs GROUP BY b),
        |agg2 AS (
        |  SELECT b, CAST(SUM(CASE WHEN n_chars > b THEN 1 ELSE 0 END)
        |           AS BIGINT) AS oversize_docs
        |  FROM packed GROUP BY b)
        |SELECT a.b AS budget, n_packs, chars, single_doc_packs,
        |       oversize_docs,
        |       CAST(ROUND(CAST(chars AS DOUBLE)
        |         / CAST(n_packs * a.b AS DOUBLE) * 1000000) AS BIGINT)
        |         AS fill_e6
        |FROM agg1 a JOIN agg2 o ON o.b = a.b ORDER BY budget""".stripMargin,
    // Same per-source e6 pow grid, exact integer normalizer, mirrored
    // share/factor chains, shared τ literals.
    "q369_temperature_curve" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |w AS (
        |  SELECT tau_e2, source, toks,
        |         CAST(ROUND(POW(CAST(toks AS DOUBLE),
        |           CAST(tau_e2 AS DOUBLE) / 100.0) * 1000000) AS BIGINT)
        |           AS w_e6
        |  FROM t CROSS JOIN
        |    (SELECT CAST(UNNEST([50, 70, 100]) AS BIGINT) AS tau_e2)),
        |z AS (SELECT tau_e2, CAST(SUM(w_e6) AS BIGINT) AS z_e6,
        |             CAST(SUM(toks) AS BIGINT) AS n
        |      FROM w GROUP BY tau_e2)
        |SELECT w.tau_e2, w.source, w.toks AS tokens,
        |  CAST(ROUND(CAST(w_e6 AS DOUBLE) / CAST(z_e6 AS DOUBLE)
        |    * 1000000) AS BIGINT) AS share_e6,
        |  CAST(ROUND(CAST(w_e6 AS DOUBLE) / CAST(z_e6 AS DOUBLE)
        |    * CAST(n AS DOUBLE) / CAST(w.toks AS DOUBLE) * 1000000)
        |    AS BIGINT) AS factor_e6
        |FROM w JOIN z ON z.tau_e2 = w.tau_e2
        |ORDER BY w.tau_e2, w.source""".stripMargin,
    // Same md5 prefix mod S shards, exact censuses, one mirrored skew
    // chain per width.
    "q372_shard_balance" ->
      """WITH d AS (
        |  SELECT CAST(('0x' || substr(md5('shard:' ||
        |           CAST(doc_id AS VARCHAR)), 1, 2)) AS BIGINT) AS h2
        |  FROM documents),
        |sh AS (
        |  SELECT ss, h2 % ss AS shard
        |  FROM d CROSS JOIN
        |    (SELECT CAST(UNNEST([16, 64, 256]) AS BIGINT) AS ss)),
        |cnt AS (SELECT ss, shard, CAST(COUNT(*) AS BIGINT) AS n
        |        FROM sh GROUP BY ss, shard)
        |SELECT ss AS n_shards, CAST(SUM(n) AS BIGINT) AS n_docs,
        |       CAST(COUNT(*) AS BIGINT) AS shards_used,
        |       CAST(MAX(n) AS BIGINT) AS max_shard,
        |       CAST(MIN(n) AS BIGINT) AS min_shard,
        |       CAST(ROUND(CAST(MAX(n) AS DOUBLE) * CAST(ss AS DOUBLE)
        |         / CAST(SUM(n) AS DOUBLE) * 1000000) AS BIGINT) AS skew_e6
        |FROM cnt GROUP BY ss ORDER BY n_shards""".stripMargin,
    // Same md5 fold rule (hex-prefix → BIGINT, mod 5); all-integer
    // floor means.
    "q241_kfold_audit" ->
      """WITH f AS (
        |  SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
        |              AS BIGINT) % 5 AS fold,
        |         n_chars
        |  FROM documents),
        |g AS (SELECT fold, COUNT(*) AS n_docs, SUM(n_chars) AS sum_chars
        |      FROM f GROUP BY 1),
        |t AS (SELECT SUM(n_docs) AS tn, SUM(sum_chars) AS ts FROM g)
        |SELECT fold, CAST(n_docs AS BIGINT) AS n_docs,
        |       CAST(sum_chars AS BIGINT) AS sum_chars,
        |       CAST(sum_chars // n_docs AS BIGINT) AS mean_fc,
        |       CAST((ts - sum_chars) // (tn - n_docs) AS BIGINT) AS oof_mean_fc,
        |       CAST(sum_chars // n_docs - (ts - sum_chars) // (tn - n_docs)
        |            AS BIGINT) AS delta_fc
        |FROM g CROSS JOIN t ORDER BY fold""".stripMargin,
    // Same md5 split rule as q76; expected and the χ² contribution are
    // the identical expression shape over exact integer counts.
    "q174_split_balance" ->
      """WITH cell AS (
        |  SELECT split, source, CAST(COUNT(*) AS BIGINT) AS n FROM (
        |    SELECT source,
        |      CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |           WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |           ELSE 'test' END AS split
        |    FROM documents) t
        |  GROUP BY split, source),
        |rowt AS (SELECT split, SUM(n) AS n_split FROM cell GROUP BY split),
        |colt AS (SELECT source, SUM(n) AS n_source FROM cell GROUP BY source),
        |tot AS (SELECT SUM(n) AS n_total FROM cell)
        |SELECT c.split, c.source, c.n,
        |  CAST(ROUND(CAST(r.n_split * s.n_source AS DOUBLE) / t.n_total
        |             * 10000) AS BIGINT) AS expected_e4,
        |  CAST(ROUND(
        |    (c.n - CAST(r.n_split * s.n_source AS DOUBLE) / t.n_total)
        |    * (c.n - CAST(r.n_split * s.n_source AS DOUBLE) / t.n_total)
        |    / (CAST(r.n_split * s.n_source AS DOUBLE) / t.n_total)
        |    * 10000) AS BIGINT) AS chi2_e4
        |FROM cell c
        |JOIN rowt r ON r.split = c.split
        |JOIN colt s ON s.source = c.source
        |CROSS JOIN tot t
        |ORDER BY c.split, c.source""".stripMargin,
    "q76_hash_split" ->
      """SELECT split, lang, COUNT(*) AS n FROM (
        |  SELECT lang,
        |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
        |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
        |         ELSE 'test' END AS split
        |  FROM documents) t
        |GROUP BY split, lang ORDER BY split, lang""".stripMargin,
    "q77_seq_packing" ->
      """WITH c AS (
        |  SELECT source, n_chars,
        |    SUM(n_chars) OVER (PARTITION BY source ORDER BY doc_id
        |                       ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM documents)
        |SELECT source, CAST(FLOOR((cum - n_chars) / 4096.0) AS BIGINT) AS pack_id,
        |       COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM c GROUP BY source, pack_id ORDER BY source, pack_id""".stripMargin,
    "q78_corpus_mix" ->
      """SELECT source, COUNT(*) AS kept, CAST(SUM(n_chars) AS BIGINT) AS chars
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2)
        |      < CASE WHEN CAST(substr(source, 4) AS INT) % 2 = 0
        |             THEN 'zz' ELSE '40' END
        |GROUP BY source ORDER BY source""".stripMargin,
    "q124_epoch_shard" ->
      """WITH k AS (
        |  SELECT e.epoch, d.doc_id,
        |         md5(e.epoch || ':' || CAST(d.doc_id AS VARCHAR)) AS key
        |  FROM documents d
        |  CROSS JOIN (SELECT 'ep1' AS epoch UNION ALL SELECT 'ep2') e)
        |SELECT epoch, doc_id,
        |  CAST(instr('0123456789abcdef', substr(key, 1, 1)) - 1 AS BIGINT) AS shard,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY epoch, substr(key, 1, 1)
        |    ORDER BY key, doc_id) AS BIGINT) AS pos
        |FROM k ORDER BY epoch, shard, pos""".stripMargin,
    // Manifest mirrored on the q124 shard CTE: additive 40-bit content
    // sum, position-ordered md5 chain via string_agg ORDER BY.
    "q267_shard_manifest" ->
      """WITH k AS (
        |  SELECT doc_id, md5('ep1:' || CAST(doc_id AS VARCHAR)) AS key
        |  FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(instr('0123456789abcdef', substr(key, 1, 1)) - 1 AS BIGINT)
        |      AS shard,
        |    CAST(ROW_NUMBER() OVER (
        |      PARTITION BY substr(key, 1, 1)
        |      ORDER BY key, doc_id) AS BIGINT) AS pos
        |  FROM k)
        |SELECT shard, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
        |  CAST(SUM(d.n_chars) AS BIGINT) AS n_chars,
        |  CAST(SUM(CAST(('0x' || substr(md5(d.text), 1, 10)) AS BIGINT))
        |       AS BIGINT) AS content_sum,
        |  md5(string_agg(md5(d.text), '' ORDER BY pos)) AS chain_fp
        |FROM sh JOIN documents d USING (doc_id)
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,
    "q131_stratum_sample" ->
      """SELECT lang AS stratum, doc_id,
        |  CAST(ROW_NUMBER() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk
        |FROM documents
        |QUALIFY rk <= 3
        |ORDER BY stratum, rk""".stripMargin,
    "q134_temperature_mix" ->
      """WITH t AS (
        |  SELECT source,
        |         CAST(SUM(len(string_split(text, ' '))) AS DOUBLE) AS toks
        |  FROM documents GROUP BY source),
        |tot AS (SELECT SUM(toks) AS n, SUM(POW(toks, 0.7)) AS z FROM t)
        |SELECT source, CAST(toks AS BIGINT) AS tokens,
        |  CAST(ROUND(toks / n * 1000000) AS BIGINT) AS share_e6,
        |  CAST(ROUND(POW(toks, 0.7) / z * 1000000) AS BIGINT) AS alpha_weight_e6
        |FROM t CROSS JOIN tot ORDER BY source""".stripMargin,
    "q139_split_leakage" ->
      s"""${Dedup.simhashCandCte()},
         |p AS (SELECT id_a, id_b FROM cand WHERE bit_count(xor(ha, hb)) <= 2),
         |sp AS (
         |  SELECT doc_id,
         |    CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'cd' THEN 'train'
         |         WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6' THEN 'val'
         |         ELSE 'test' END AS split
         |  FROM documents WHERE doc_id < 1000)
         |SELECT a.split AS split_a, b.split AS split_b,
         |  CAST(COUNT(*) AS BIGINT) AS pairs,
         |  CAST(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END AS BIGINT) AS is_leak
         |FROM p JOIN sp a ON p.id_a = a.doc_id JOIN sp b ON p.id_b = b.doc_id
         |GROUP BY a.split, b.split
         |ORDER BY split_a, split_b""".stripMargin,
    // Same 52-bit md5 uniform (exact in a double) and the same spelled
    // key expression; only ln() drifts between engines and the e9 grid
    // absorbs it.
    "q154_weighted_sample" ->
      """WITH b AS (
        |  SELECT doc_id, n_chars AS w,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13)) AS BIGINT) AS m
        |  FROM documents WHERE n_chars > 0)
        |SELECT doc_id, CAST(w AS BIGINT) AS w,
        |  CAST(ROUND(ln(m / 4503599627370496.0) / w * 1000000000) AS BIGINT) AS key_e9
        |FROM b ORDER BY key_e9 DESC, doc_id LIMIT 200""".stripMargin,
    // Same 52-bit md5 key, same (h, doc_id) rank, same two-stage grid
    // (integer estimate first, relative error off that integer).
    "q392_bottomk_estimate" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text,' ')) AS BIGINT) AS tok,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 13))
        |         AS BIGINT) AS h
        |  FROM documents),
        |r AS (
        |  SELECT *, ROW_NUMBER() OVER (PARTITION BY source
        |                               ORDER BY h, doc_id) AS rn
        |  FROM d),
        |g AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(tok) AS BIGINT) AS exact_tokens,
        |         CAST(SUM(CASE WHEN rn <= 8 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS k,
        |         CAST(SUM(CASE WHEN rn <= 8 THEN tok ELSE 0 END) AS BIGINT)
        |           AS sample_tokens
        |  FROM r GROUP BY source)
        |SELECT source, n_docs, k, exact_tokens,
        |  CAST(ROUND(CAST(n_docs AS DOUBLE) * CAST(sample_tokens AS DOUBLE)
        |             / CAST(k AS DOUBLE)) AS BIGINT) AS est_tokens,
        |  CAST(ROUND((CAST(CAST(ROUND(CAST(n_docs AS DOUBLE) *
        |                    CAST(sample_tokens AS DOUBLE) /
        |                    CAST(k AS DOUBLE)) AS BIGINT) AS DOUBLE) -
        |              CAST(exact_tokens AS DOUBLE)) /
        |             CAST(exact_tokens AS DOUBLE) * 1000000) AS BIGINT)
        |    AS rel_err_e6
        |FROM g ORDER BY source""".stripMargin,
    // Same √(N·Q−S²) e3 weights, q166's exact Hamilton integerization.
    "q400_neyman_allocation" ->
      """WITH m AS (
        |  SELECT source, COUNT(*) AS n_docs,
        |         CAST(SUM(n_chars) AS BIGINT) AS sv,
        |         SUM(CAST(n_chars AS HUGEINT) * n_chars) AS qv
        |  FROM documents GROUP BY source),
        |c AS (
        |  SELECT source, n_docs,
        |    CAST(ROUND(sqrt(CAST(n_docs * qv - CAST(sv AS HUGEINT) * sv
        |                         AS DOUBLE)) * 1000) AS BIGINT) AS tokens
        |  FROM m),
        |t AS (SELECT SUM(tokens) AS total FROM c),
        |b AS (
        |  SELECT source, n_docs, tokens,
        |         tokens * 300 // total AS base,
        |         tokens * 300 % total AS rem
        |  FROM c CROSS JOIN t),
        |l AS (SELECT 300 - SUM(base) AS leftover FROM b),
        |r AS (
        |  SELECT source, n_docs, tokens, base,
        |         ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rk
        |  FROM b)
        |SELECT source, n_docs, tokens AS neyman_w_e3,
        |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
        |    AS quota
        |FROM r CROSS JOIN l
        |ORDER BY source""".stripMargin,
  )
}
