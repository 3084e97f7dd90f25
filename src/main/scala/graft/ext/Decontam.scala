package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Benchmark decontamination: flag training documents that share long
  * word n-grams with an evaluation set (the GPT-3/PaLM-style 13-gram
  * overlap check, run before any eval number is trusted). A training
  * corpus that contains eval text inflates benchmarks silently — this
  * is a first-class stage of every serious pretraining pipeline.
  *
  * Scale design (100 TB): the eval side is SMALL (benchmarks are
  * thousands of docs, not billions) — its distinct gram set is
  * broadcast, so the train side never shuffles its exploded grams: the
  * plan is scan → map-side explode → broadcast-hash join (drops all
  * non-matching grams immediately) → partial-agg on doc_id. The only
  * full shuffle carries per-doc HIT counts, which is bounded by the
  * contamination volume, not the corpus size.
  */
object Decontam {

  /** Per-train-doc contamination report against `evalDocs`.
    *
    * @param trainDocs (`doc_id`, token-array `ws`)
    * @param evalDocs  (token-array `ws`) — the benchmark side
    * @param k         gram length (13 in the GPT-3 protocol; tests use
    *                  smaller k so the tiny fixtures overlap at all)
    * @return contaminated train docs only: (`doc_id`, `n_grams`,
    *         `hit_grams`, `hit_ratio`)
    */
  def contaminationReport(
      trainDocs: DataFrame, evalDocs: DataFrame, k: Int): DataFrame = {
    // explode_OUTER on purpose: a plain explode triggers
    // InferFiltersFromGenerate, whose `size(grams) > 0` predicate gets
    // pushed through the gram projection and INLINED — re-evaluating
    // the whole k-gram transform (with split re-run per element_at, in
    // interpreted mode) once more per row just to test emptiness.
    // Measured 5× on q104 at sf0.1. The outer generator is exempt from
    // that rule; the isnotnull filter on the GENERATED attribute cannot
    // be pushed below the Generate.
    contaminationReportGrams(trainDocs, evalGramSet(evalDocs, k), k)
  }

  /** The benchmark side's distinct k-gram set — the state
    * [[ensureGramStore]] persists and q425 screens against. */
  private def evalGramSet(evalDocs: DataFrame, k: Int): DataFrame =
    evalDocs
      .select(explode_outer(Dedup.shinglesK(col("ws"), k)).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()

  /** [[contaminationReport]] against a PRE-BUILT distinct gram set
    * (single column `gram`) — the store-read form: a persisted
    * benchmark gram table screens an incoming batch without
    * re-deriving the eval side.
    */
  def contaminationReportGrams(
      trainDocs: DataFrame, evalGrams: DataFrame, k: Int): DataFrame = {
    val trainGrams = trainDocs
      .select(col("doc_id"), Dedup.shinglesK(col("ws"), k).as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
    trainGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(
        // n_grams is constant per doc; max() keeps the agg partial-able
        max(col("n_grams")).cast("long").as("n_grams"),
        countDistinct(col("gram")).as("hit_grams"))
      .select(
        col("doc_id"), col("n_grams"), col("hit_grams"),
        round(col("hit_grams").cast("double") / col("n_grams"), 4)
          .as("hit_ratio"))
  }

  /** q263 — Bloom-filter pruning audit: build a deterministic Bloom
    * filter (m = 2¹⁷ bits, k = 3 md5-derived hash functions) over the
    * BOUNDED eval set's 5-grams, probe every corpus 5-gram, and
    * compare the filter's verdicts against exact membership — the
    * measured false-positive rate a pipeline checks before trusting
    * bloom pruning in its decontamination/join stages (the same
    * structure PlanAuditSpec audits inside Spark's runtime bloom
    * joins, here as a first-class data operator).
    *
    * The filter is represented RELATIONALLY as the set of set-bit
    * positions (≤ m rows, broadcast) — "test k bits" becomes "count
    * matched positions = k" over an equi-join, which is both
    * engine-portable and exactly how a distributed probe pushes a
    * bloom test into a shuffle-free semi-join. Hash h_i(g) =
    * md5-prefix-40bit(i:g) mod m — the q240/q254 hex-portable
    * discipline, no RNG. A gram whose k probes collide still counts
    * k row-hits iff all its positions are set, so the = k test is
    * exact Bloom semantics. No false negative is possible by
    * construction (spec-asserted: true members are all
    * bloom-positive).
    *
    * Float discipline: all counts integer; fpr_e6 is ONE mirrored
    * division. Scale: eval side is the bounded probe set (doc_id <
    * 500 ∧ %7 — SF-stable, so the filter's load factor and the
    * audit's meaning don't drift with corpus size); the corpus side
    * collapses to distinct grams map-side; the bit table broadcasts.
    */
  def q263(s: SparkSession, dir: String): DataFrame = {
    val m = 131072L
    val d = Tables.table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    def grams(f: DataFrame): DataFrame = f
      .select(explode_outer(Dedup.shinglesK(col("ws"), 5)).as("gram"))
      .filter(col("gram").isNotNull).distinct()
    val ev = grams(d.filter(col("doc_id") % 7 === 0 && col("doc_id") < 500))
    val corpus = grams(d.filter(col("doc_id") % 7 =!= 0))
    def positions: Column = array((0 until 3).map(i =>
      pmod(conv(substring(md5(
        concat(lit(s"$i:"), col("gram"))), 1, 10), 16, 10).cast("long"),
        lit(m))): _*)
    val bits = ev.select(explode(positions).as("b")).distinct()
    val probeHits = corpus.select(col("gram"), explode(positions).as("b"))
      .join(broadcast(bits), "b")
      .groupBy(col("gram")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 3)
      .agg(count(lit(1)).as("n_bloom_pos"))
    val truePos = corpus.join(ev, Seq("gram"), "left_semi")
      .agg(count(lit(1)).as("n_true_pos"))
    val evStats = ev.agg(count(lit(1)).as("n_eval_grams"))
    val bitStats = bits.agg(count(lit(1)).as("n_bits_set"))
    val probed = corpus.agg(count(lit(1)).as("n_probed"))
    evStats.withGlobalStats(bitStats).withGlobalStats(probed)
      .withGlobalStats(probeHits).withGlobalStats(truePos)
      .select(col("n_eval_grams"), col("n_bits_set"), col("n_probed"),
        col("n_bloom_pos"), col("n_true_pos"),
        (col("n_bloom_pos") - col("n_true_pos")).as("n_false_pos"),
        when(col("n_probed") > col("n_true_pos"),
          round((col("n_bloom_pos") - col("n_true_pos")).cast("double") /
            (col("n_probed") - col("n_true_pos")).cast("double") * 1000000d,
            0).cast("long")).as("fpr_e6"))
  }

  // ---- declared queries ---------------------------------------------------

  /** q104 — decontamination over the fixture corpus: every 7th doc
    * plays the eval set (chosen so the corpus' organic 5-gram sharing
    * crosses the train/eval boundary — a dozen genuinely contaminated
    * train docs at sf0.01, so the certification exercises real hits,
    * not an empty result).
    */
  def q104(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val eval = d.filter(col("doc_id") % 7 === 0)
    val train = d.filter(col("doc_id") % 7 =!= 0)
    contaminationReport(train, eval, k = 5).orderBy("doc_id")
  }

  /** Persist the eval set's distinct 5-grams once per session — the
    * benchmark side of decontamination is FIXED state (benchmarks
    * change on release cadence, corpora on crawl cadence), so a
    * production pipeline lands the gram set once and screens every
    * incoming batch against the store instead of re-tokenizing the
    * benchmarks per run. Census-sized: distinct grams of the bounded
    * eval set, a broadcastable table at any corpus size.
    */
  private[graft] def ensureGramStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "gramstore", dir) { root =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      evalGramSet(d.filter(col("doc_id") % 7 === 0), k = 5)
        .write.mode("overwrite").parquet(root)
      root
    }

  /** The q263 position family parameterized on the bit-table size:
    * h_i(g) = md5-prefix-40bit("i:" ‖ g) mod m, k = 3 — hex-portable,
    * no RNG, identical spelling in the oracles.
    */
  private[graft] def bloomPositions(m: Long): Column = array((0 until 3).map(i =>
    pmod(conv(substring(md5(
      concat(lit(s"$i:"), col("gram"))), 1, 10), 16, 10).cast("long"),
      lit(m))): _*)

  /** Land the corpus-membership Bloom bit table in TWO generations —
    * the OR-merge member of the sketch-store matrix (HLL registers
    * MAX-merge, histogram/CMS/DF registers SUM-merge; a Bloom filter
    * merges by bit-OR, which relationally is DISTINCT-union of set-bit
    * positions): generation 0 is the even-id corpus half's bit set,
    * generation 1 the odd half's, landed `mode("append")`. m = 2^18 is
    * fixture-probed (DuckDB, r16): at every SF the merged filter has
    * real false positives (35/34/24513) AND really prunes
    * (bloom_pos < probed) — neither vacuous nor saturated.
    */
  private[graft] def ensureBloomStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "bloomstore", dir) { root =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      def gen(parity: Int): DataFrame = d
        .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 2 === parity)
        .select(explode_outer(Dedup.shinglesK(col("ws"), 5)).as("gram"))
        .filter(col("gram").isNotNull).distinct()
        .select(explode(bloomPositions(262144L)).as("b")).distinct()
        .withColumn("gen", lit(parity.toLong))
      gen(0).write.mode("overwrite").parquet(root)
      gen(1).write.mode("append").parquet(root)
      root
    }

  /** q428 — Bloom membership screen answered from the TWO-GENERATION
    * bit store: the merged filter is the DISTINCT-union (bit-OR) of
    * the generations' set-bit positions, and the probe side is q425's
    * persisted eval-gram store — two stores composed, the corpus and
    * the benchmarks both never re-read. One census row: per-generation
    * and OR-merged bit counts (merged < gen0 + gen1 proves the OR
    * collapsed genuinely shared bits) plus the probe verdicts. The
    * oracle rebuilds both generations' bit sets and the probe set from
    * raw documents — a hash match certifies the bit landing lost or
    * duplicated no position, OR-merge ∘ land ≡ direct, and the
    * 3-of-3-hits probe semantics end to end. Completes the sketch
    * store matrix's merge algebras: MAX, SUM, OR.
    *
    * All-integer. Scale: the bit table is ≤ m rows at ANY corpus size
    * (broadcastable by construction); the probe side is the
    * census-sized gram store; a nightly batch appends its own distinct
    * bit file and the filter is current — the production "have we seen
    * this?" screen (seen-URL / seen-gram pruning) with no rebuild.
    */
  def q428(s: SparkSession, dir: String): DataFrame = {
    val store = s.read.parquet(ensureBloomStore(s, dir))
    val merged = store.select(col("b")).distinct().localCheckpoint(true)
    val g0 = store.filter(col("gen") === 0L)
      .agg(count(lit(1)).as("n_bits_gen0"))
    val g1 = store.filter(col("gen") === 1L)
      .agg(count(lit(1)).as("n_bits_gen1"))
    val nm = merged.agg(count(lit(1)).as("n_bits_merged"))
    val probes = s.read.parquet(ensureGramStore(s, dir))
    val np = probes.agg(count(lit(1)).as("n_probed"))
    val pos = probes
      .select(col("gram"), explode(bloomPositions(262144L)).as("b"))
      .join(broadcast(merged), "b")
      .groupBy(col("gram")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 3)
      .agg(count(lit(1)).as("n_bloom_pos"))
    g0.withGlobalStats(g1).withGlobalStats(nm)
      .withGlobalStats(np).withGlobalStats(pos)
      .select(col("n_bits_gen0"), col("n_bits_gen1"), col("n_bits_merged"),
        col("n_probed"), col("n_bloom_pos"))
  }

  /** Four Bloom bit-set generations (gen = doc_id % 4 over the corpus
    * half, every generation non-empty at all 3 SFs and each HEAD
    * generation holding 12k-35k bits no sibling sets — fixture-probed,
    * so a directory lost by compaction breaks the hash), generations
    * 0-2 collapsed under the OR algebra (relationally DISTINCT over
    * set-bit positions) by [[graft.ops.RegisterStore.compact]].
    */
  private[graft] def ensureBloomStore4(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "bloomstore4", dir) { root =>
      val d = Tables.table(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      def gen(g: Int): DataFrame = d
        .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 4 === g)
        .select(col("doc_id"),
          explode_outer(Dedup.shinglesK(col("ws"), 5)).as("gram"))
        .filter(col("gram").isNotNull).select("gram").distinct()
        .select(explode(bloomPositions(262144L)).as("b")).distinct()
        .withColumn("gen", lit(g.toLong))
      (0 to 3).foreach { g =>
        gen(g).write.mode(if (g == 0) "overwrite" else "append")
          .partitionBy("gen").parquet(root)
      }
      graft.ops.RegisterStore.compact(s, root, "gen", upTo = 2L,
        m => m.select(col("b")).distinct())
      root
    }

  /** q433 — the Bloom membership screen answered THROUGH a compaction
    * boundary: the THIRD merge algebra (OR) through
    * [[graft.ops.RegisterStore.compact]]'s stage-and-swap (q430
    * certified SUM, q432 MAX — with this the compactor is certified
    * under every algebra the sketch-store matrix carries). Four
    * generation bit sets landed gen-partitioned, generations 0-2
    * collapsed to one DISTINCT-merged head partition, and the read
    * OR-merges head + live gen-3 tail into the screening filter probed
    * by q425's persisted eval-gram store. One census row: head / tail /
    * merged bit counts AND position sums (count alone would miss a
    * compaction that dropped bit X while inventing bit Y — the sum over
    * distinct positions makes the head/tail/merged SETS hash-sensitive)
    * plus the 3-of-3 probe verdicts. The oracle rebuilds every
    * generation's bit set, both sides of the boundary, and the probe
    * from raw documents — a hash match certifies (4-way split →
    * per-gen DISTINCT → compact 0-2 → OR with tail) ≡ direct.
    *
    * OR is idempotent (like q432's MAX), so the `_COMPACTED` marker is
    * belt-and-braces here; the crash matrix is driven once for the
    * shared code path under its worst algebra (q430's SUM).
    *
    * All-integer (b < 2^18 and ≤ 2^18 rows, so the position sums stay
    * far inside BIGINT). Scale: each generation is ≤ m rows at ANY
    * corpus size; compaction reads and rewrites only bit files — the
    * year-of-nightly-appends store stays one head + a bounded tail.
    */
  def q433(s: SparkSession, dir: String): DataFrame = {
    val store = s.read.parquet(ensureBloomStore4(s, dir))
      .select(col("b"), col("gen").cast("long").as("gen"))
    val merged = store.select(col("b")).distinct().localCheckpoint(true)
    val hd = store.filter(col("gen") === 2L).agg(
      count(lit(1)).as("n_bits_head"), sum(col("b")).as("bits_head_sum"))
    val tl = store.filter(col("gen") === 3L).agg(
      count(lit(1)).as("n_bits_tail"), sum(col("b")).as("bits_tail_sum"))
    val mg = merged.agg(
      count(lit(1)).as("n_bits_merged"), sum(col("b")).as("bits_merged_sum"))
    val probes = s.read.parquet(ensureGramStore(s, dir))
    val np = probes.agg(count(lit(1)).as("n_probed"))
    val pos = probes
      .select(col("gram"), explode(bloomPositions(262144L)).as("b"))
      .join(broadcast(merged), "b")
      .groupBy(col("gram")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 3)
      .agg(count(lit(1)).as("n_bloom_pos"))
    hd.withGlobalStats(tl).withGlobalStats(mg)
      .withGlobalStats(np).withGlobalStats(pos)
      .select(col("n_bits_head"), col("bits_head_sum"),
        col("n_bits_tail"), col("bits_tail_sum"),
        col("n_bits_merged"), col("bits_merged_sum"),
        col("n_probed"), col("n_bloom_pos"))
  }

  /** q425 — INCREMENTAL decontamination off the persisted eval-gram
    * store: q104's contamination report computed for the NEW (odd-id)
    * batch only, with the eval side READ from [[ensureGramStore]] —
    * never re-derived. The q424 posture applied to the
    * decontamination family: the nightly screen tokenizes the incoming
    * batch, broadcasts the stored gram set, and touches nothing else.
    * The oracle rebuilds the gram set from raw documents (q104's
    * certified CTE) and screens the same batch — a hash match proves
    * the store round-trip lost/duplicated no gram AND that
    * screen-from-store ≡ screen-from-scratch.
    *
    * Scale: the batch side is one map + explode over the new docs;
    * the store side is a census-sized broadcast read. At 100 TB the
    * screen's cost is the batch scan — the corpus and the benchmarks
    * are never re-read.
    */
  def q425(s: SparkSession, dir: String): DataFrame = {
    val store = s.read.parquet(ensureGramStore(s, dir))
    val batch = Tables.table(s, dir, "documents")
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 2 === 1)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    contaminationReportGrams(batch, store, k = 5).orderBy("doc_id")
  }

  /** q401 — decontamination threshold-sensitivity curve: the doc and
    * TOKEN mass a 5-gram overlap screen removes at hit thresholds of
    * 1/2/4/8 shared grams — q104 reports per-doc hits at no threshold;
    * this curve is how the cutoff is actually chosen (the q350/q382
    * threshold-curve discipline applied to decontamination: "flag on
    * ANY shared gram" can halve a corpus; the curve shows where the
    * flagged mass stops collapsing). Token shares matter more than doc
    * shares — a screen that flags 2% of docs but 15% of tokens is
    * eating the long documents.
    *
    * Exactness: hit counts are exact distinct-gram censuses (q104's
    * machinery); zero-hit docs are KEPT via the left join (a q104-style
    * inner join would silently drop them from the denominators); the
    * threshold gate is an integer compare; shares are one mirrored
    * division each, e6.
    *
    * Scale: q104's broadcast-eval-grams plan (train grams never
    * shuffle); the per-doc hit frame value-collapses to the hit-count
    * HISTOGRAM before the 4× threshold explode (the q367 discipline);
    * output ≤ 4 rows.
    */
  def q401(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val evalGrams = d.filter(col("doc_id") % 7 === 0)
      .select(explode_outer(Dedup.shinglesK(col("ws"), 5)).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    val train = d.filter(col("doc_id") % 7 =!= 0)
      .select(col("doc_id"), size(col("ws")).cast("long").as("n_tokens"),
        Dedup.shinglesK(col("ws"), 5).as("grams"))
      .localCheckpoint(true) // branched: the hit join AND the doc frame
    val hits = train
      .select(col("doc_id"), explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(countDistinct(col("gram")).as("hits"))
    val perDoc = train.select(col("doc_id"), col("n_tokens"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("n_tokens"), coalesce(col("hits"), lit(0L)).as("hits"))
      .localCheckpoint(true) // branched: histogram AND totals
    val hist = perDoc.groupBy(col("hits"))
      .agg(count(lit(1)).as("nd"), sum(col("n_tokens")).as("tok"))
    val tot = perDoc.agg(count(lit(1)).as("nd_all"),
      sum(col("n_tokens")).as("tok_all"))
    hist
      .withColumn("thr", explode(array(lit(1L), lit(2L), lit(4L), lit(8L))))
      .filter(col("hits") >= col("thr"))
      .groupBy(col("thr"))
      .agg(sum(col("nd")).as("n_flagged"), sum(col("tok")).as("tokens_flagged"))
      .withGlobalStats(tot)
      .select(col("thr"), col("n_flagged"), col("tokens_flagged"),
        graft.ext.Similarity.intScaled(
          col("n_flagged").cast("double") / col("nd_all").cast("double"),
          1000000L).as("doc_share_e6"),
        graft.ext.Similarity.intScaled(
          col("tokens_flagged").cast("double") / col("tok_all").cast("double"),
          1000000L).as("token_share_e6"))
      .orderBy("thr")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_decontaminate" -> (q104 _),
    "q263_bloom_audit"   -> (q263 _),
    "q401_decontam_curve" -> (q401 _),
    "q425_decontam_store" -> (q425 _),
    "q428_bloom_store" -> (q428 _),
    "q433_bloom_store_compact" -> (q433 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q104_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |       FROM g WHERE doc_id % 7 <> 0)
        |SELECT tr.doc_id,
        |  CAST(MAX(tr.n_grams) AS BIGINT) AS n_grams,
        |  CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS hit_grams,
        |  ROUND(CAST(COUNT(DISTINCT tr.gram) AS DOUBLE) / MAX(tr.n_grams), 4)
        |    AS hit_ratio
        |FROM tr JOIN e USING (gram)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // q104's oracle restricted to the odd-id batch: the eval gram set
    // is rebuilt from raw documents here where Spark reads it from the
    // persisted store — hash equality IS the store-fidelity proof.
    "q425_decontam_store" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |       FROM g WHERE doc_id % 7 <> 0 AND doc_id % 2 = 1)
        |SELECT tr.doc_id,
        |  CAST(MAX(tr.n_grams) AS BIGINT) AS n_grams,
        |  CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS hit_grams,
        |  ROUND(CAST(COUNT(DISTINCT tr.gram) AS DOUBLE) / MAX(tr.n_grams), 4)
        |    AS hit_ratio
        |FROM tr JOIN e USING (gram)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
    // Both generations' bit sets, the OR-merge (distinct union), and
    // the 3-of-3 probe rebuilt from raw documents with the identical
    // md5-prefix-40bit(i:gram) mod 2^18 positions.
    "q428_bloom_store" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |c0 AS (SELECT DISTINCT unnest(grams) AS gram FROM g
        |       WHERE doc_id % 7 <> 0 AND doc_id % 2 = 0),
        |c1 AS (SELECT DISTINCT unnest(grams) AS gram FROM g
        |       WHERE doc_id % 7 <> 0 AND doc_id % 2 = 1),
        |b0 AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |         || ':' || gram), 1, 10)) AS BIGINT) % 262144 AS b
        |       FROM c0 CROSS JOIN range(3) i(i)),
        |b1 AS (SELECT DISTINCT CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |         || ':' || gram), 1, 10)) AS BIGINT) % 262144 AS b
        |       FROM c1 CROSS JOIN range(3) i(i)),
        |mrg AS (SELECT b FROM b0 UNION SELECT b FROM b1),
        |ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |pr AS (SELECT gram, CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |         || ':' || gram), 1, 10)) AS BIGINT) % 262144 AS b
        |       FROM ev CROSS JOIN range(3) i(i)),
        |hits AS (SELECT gram FROM pr JOIN mrg USING (b)
        |         GROUP BY gram HAVING COUNT(*) = 3)
        |SELECT CAST((SELECT COUNT(*) FROM b0) AS BIGINT) AS n_bits_gen0,
        |       CAST((SELECT COUNT(*) FROM b1) AS BIGINT) AS n_bits_gen1,
        |       CAST((SELECT COUNT(*) FROM mrg) AS BIGINT) AS n_bits_merged,
        |       CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS n_probed,
        |       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_bloom_pos""".stripMargin,
    // Every generation's bit set, both sides of the compaction
    // boundary, and the probe rebuilt from raw documents with the
    // identical md5-prefix-40bit(i:gram) mod 2^18 positions; position
    // SUMS make the head/tail/merged sets (not just counts) binding.
    "q433_bloom_store_compact" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |gb AS (SELECT DISTINCT doc_id % 4 AS gen,
        |         CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |           || ':' || gram), 1, 10)) AS BIGINT) % 262144 AS b
        |       FROM (SELECT doc_id, unnest(grams) AS gram FROM g
        |             WHERE doc_id % 7 <> 0)
        |       CROSS JOIN range(3) i(i)),
        |head AS (SELECT DISTINCT b FROM gb WHERE gen <= 2),
        |tail AS (SELECT b FROM gb WHERE gen = 3),
        |mrg AS (SELECT b FROM head UNION SELECT b FROM tail),
        |ev AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |pr AS (SELECT gram, CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR)
        |         || ':' || gram), 1, 10)) AS BIGINT) % 262144 AS b
        |       FROM ev CROSS JOIN range(3) i(i)),
        |hits AS (SELECT gram FROM pr JOIN mrg USING (b)
        |         GROUP BY gram HAVING COUNT(*) = 3)
        |SELECT CAST((SELECT COUNT(*) FROM head) AS BIGINT) AS n_bits_head,
        |       CAST((SELECT SUM(b) FROM head) AS BIGINT) AS bits_head_sum,
        |       CAST((SELECT COUNT(*) FROM tail) AS BIGINT) AS n_bits_tail,
        |       CAST((SELECT SUM(b) FROM tail) AS BIGINT) AS bits_tail_sum,
        |       CAST((SELECT COUNT(*) FROM mrg) AS BIGINT) AS n_bits_merged,
        |       CAST((SELECT SUM(b) FROM mrg) AS BIGINT) AS bits_merged_sum,
        |       CAST((SELECT COUNT(*) FROM ev) AS BIGINT) AS n_probed,
        |       CAST((SELECT COUNT(*) FROM hits) AS BIGINT) AS n_bloom_pos""".stripMargin,
    // q104's gram CTE, zero-hit docs kept via the left join, hit
    // histogram × threshold gate, mirrored share divisions.
    "q401_decontam_curve" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id, len(ws) AS n_tokens,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, unnest(grams) AS gram
        |       FROM g WHERE doc_id % 7 <> 0),
        |h AS (SELECT tr.doc_id, COUNT(DISTINCT tr.gram) AS hits
        |      FROM tr JOIN e USING (gram) GROUP BY tr.doc_id),
        |pd AS (SELECT CAST(g.n_tokens AS BIGINT) AS n_tokens,
        |              COALESCE(h.hits, 0) AS hits
        |       FROM g LEFT JOIN h USING (doc_id) WHERE g.doc_id % 7 <> 0),
        |tot AS (SELECT COUNT(*) AS nd_all,
        |               CAST(SUM(n_tokens) AS BIGINT) AS tok_all FROM pd),
        |thr AS (SELECT CAST(UNNEST([1, 2, 4, 8]) AS BIGINT) AS thr)
        |SELECT thr.thr, CAST(COUNT(*) AS BIGINT) AS n_flagged,
        |  CAST(SUM(pd.n_tokens) AS BIGINT) AS tokens_flagged,
        |  CAST(ROUND(CAST(COUNT(*) AS DOUBLE) / MAX(tot.nd_all) * 1000000)
        |       AS BIGINT) AS doc_share_e6,
        |  CAST(ROUND(CAST(SUM(pd.n_tokens) AS DOUBLE) / MAX(tot.tok_all)
        |             * 1000000) AS BIGINT) AS token_share_e6
        |FROM pd JOIN thr ON pd.hits >= thr.thr CROSS JOIN tot
        |GROUP BY thr.thr ORDER BY thr.thr""".stripMargin,
    // Bloom audit mirrored: the same md5-prefix-40bit(i:gram) mod m
    // positions, the set-bit table as a relation, count-of-matches = 3
    // as the bit test; one mirrored division for fpr.
    "q263_bloom_audit" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g
        |      WHERE doc_id % 7 = 0 AND doc_id < 500),
        |c AS (SELECT DISTINCT unnest(grams) AS gram FROM g
        |      WHERE doc_id % 7 <> 0),
        |eb AS (SELECT DISTINCT
        |         CAST(('0x' || substr(md5(i.i || ':' || gram), 1, 10))
        |              AS BIGINT) % 131072 AS b
        |       FROM e CROSS JOIN range(3) i(i)),
        |pr AS (SELECT gram,
        |         CAST(('0x' || substr(md5(i.i || ':' || gram), 1, 10))
        |              AS BIGINT) % 131072 AS b
        |       FROM c CROSS JOIN range(3) i(i)),
        |bp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bloom_pos FROM (
        |         SELECT gram FROM pr JOIN eb USING (b)
        |         GROUP BY gram HAVING COUNT(*) = 3)),
        |tp AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_true_pos
        |       FROM c SEMI JOIN e USING (gram)),
        |es AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_eval_grams FROM e),
        |bs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_bits_set FROM eb),
        |ps AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_probed FROM c)
        |SELECT n_eval_grams, n_bits_set, n_probed, n_bloom_pos, n_true_pos,
        |       n_bloom_pos - n_true_pos AS n_false_pos,
        |       CASE WHEN n_probed > n_true_pos THEN
        |         CAST(ROUND(CAST(n_bloom_pos - n_true_pos AS DOUBLE)
        |                    / CAST(n_probed - n_true_pos AS DOUBLE)
        |                    * 1000000) AS BIGINT) END AS fpr_e6
        |FROM es CROSS JOIN bs CROSS JOIN ps CROSS JOIN bp
        |CROSS JOIN tp""".stripMargin,
  )
}
