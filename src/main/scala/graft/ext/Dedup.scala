package graft.ext

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Dedup family for LLM-data pipelines over `documents` (SURVEY §2.4):
  * exact content-hash dedup, first-wins keep lists, n-gram Jaccard
  * similarity, SimHash fingerprints, and MinHashLSH near-dup candidate
  * pairs.
  *
  * Scale design: exact dedup and SimHash are one hash-shuffle each;
  * Jaccard here is evaluated on an O(N) deterministic candidate set
  * (consecutive ids), NOT all pairs; MinHashLSH banding buckets
  * candidates so the join is bucket-local — the all-pairs O(N²) plan
  * never exists.
  */
object Dedup {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Exact-dedup content key (D1 generalized): hash of the raw text. */
  def contentHash(text: Column): Column = md5(text)

  /** Token-set (unigram) Jaccard between two token-array columns.
    * NULL when both sets are empty (ANSI mode would otherwise throw
    * DIVIDE_BY_ZERO; oracle mirrors with NULLIF).
    */
  def jaccardSets(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      nullif(size(array_distinct(concat(a, b))).cast("double"), lit(0.0))

  /** Word trigram shingles (distinct) from an ALREADY-MATERIALIZED token
    * array column; empty under 3 tokens (element_at is ANSI-strict —
    * never index out of bounds).
    *
    * Callers must project the token array first (`split` in its own
    * Project node): higher-order lambdas are interpreted, so an inline
    * `split` would be re-evaluated on every element_at call — measured
    * ~10× slowdown on the sf0.1 corpus.
    */
  def shingles3FromTokens(ws: Column): Column =
    when(size(ws) >= 3, array_distinct(glueAdjacent(ws, 3)))
      .otherwise(array().cast("array<string>"))

  /** All adjacent k-gram strings of `ws` as an array, built by k−1
    * `zip_with(slice, slice, concat)` passes instead of a
    * `transform(sequence, i => concat_ws(element_at…))` lambda — the
    * two are element-for-element identical, but the element_at/
    * concat_ws lambda runs ~20× slower per gram (r10 DevProbe: 3.4 s →
    * 0.3 s for the sf0.1 trigram explode; HOF lambdas are interpreted
    * and that lambda pays per-element dispatch on every element_at).
    * No size guard — callers wrap in `when(size(ws) >= k, …)`.
    */
  private def glueAdjacent(ws: Column, k: Int): Column = {
    val len = size(ws) - (k - 1)
    (1 until k).foldLeft(slice(ws, lit(1), len)) { (acc, j) =>
      zip_with(acc, slice(ws, lit(1 + j), len),
        (a, b) => concat(a, lit(" "), b))
    }
  }

  def shingles3(text: Column): Column = shingles3FromTokens(split(text, " "))

  /** Word k-gram shingles (distinct) from a materialized token array —
    * the general form of [[shingles3FromTokens]] (same projection-first
    * contract; empty under k tokens). Decontamination uses longer
    * grams (k=5..13) than near-dup shingling.
    */
  def shinglesK(ws: Column, k: Int): Column =
    array_distinct(shinglesKAll(ws, k))

  /** All k-gram OCCURRENCES in order (no distinct) — duplication-rate
    * metrics (q108) count occurrences, not the distinct gram set.
    */
  def shinglesKAll(ws: Column, k: Int): Column = {
    require(k >= 1, "k-gram size must be positive")
    if (k == 1)
      when(size(ws) >= 1, ws).otherwise(array().cast("array<string>"))
    else
      when(size(ws) >= k, glueAdjacent(ws, k))
        .otherwise(array().cast("array<string>"))
  }

  /** Stride-sampled trigram shingles: every `stride`-th trigram only.
    * Sampling shingles BEFORE MinHash is the standard candidate-gen
    * trade (recall barely moves, cost drops by the stride) — use for
    * LSH bucketing, not for exact Jaccard scoring.
    */
  def shingles3Strided(ws: Column, stride: Int): Column =
    when(size(ws) >= 3,
      array_distinct(filter(glueAdjacent(ws, 3),
        (_, i) => i % lit(stride) === 0)))
      .otherwise(array().cast("array<string>"))

  /** 16-bit SimHash over distinct tokens: bit j is the sign of the sum
    * of ±1 votes, where token j-votes come from the j-th hex digit of
    * md5(token). md5 (not Spark's murmur `hash`) keeps the fingerprint
    * engine-portable and stable across versions.
    */
  val simhashBits = 16

  /** Parametric SimHash: bit j votes from the j-th hex digit of the
    * word's md5 (≤ 32 bits). The digest is projected ONCE per word —
    * the per-bit aggregates read substrings of the materialized hex,
    * not `bits` separate md5 evaluations.
    */
  def simhashN(df: DataFrame, id: Column, text: Column, bits: Int): DataFrame = {
    require(bits >= 1 && bits <= 63, "long fingerprint (sign bit excluded)")
    // md5 hex gives 32 digit-votes; wider fingerprints use sha256 (64)
    val digest: Column => Column =
      if (bits <= 32) md5 else (c: Column) => sha2(c, 256)
    val words = df
      .select(id.as("__id"), explode(array_distinct(split(text, " "))).as("word"))
      .select(col("__id"), digest(col("word")).as("__hex"))
    def vote(j: Int): Column =
      sum(when(substring(col("__hex"), j + 1, 1) >= "8", 1).otherwise(-1)).as(s"s$j")
    val votes = words.groupBy(col("__id"))
      .agg(vote(0), (1 until bits).map(vote): _*)
    val assembled = (0 until bits)
      .map(j => when(col(s"s$j") > 0, 1L << j).otherwise(0L))
      .reduce(_ + _)
    votes.select(col("__id"), assembled.cast("long").as(s"simhash$bits"))
  }

  def simhash(df: DataFrame, id: Column, text: Column): DataFrame =
    simhashN(df, id, text, simhashBits)

  /** SimHash banding — LSH for Hamming space: split the fingerprint
    * into `bands` equal bit-slices; any two fingerprints within
    * `maxHamming` of each other MUST agree on at least one band when
    * `maxHamming < bands` (pigeonhole), so the band equi-join finds all
    * such pairs without the all-pairs compare.
    */
  def simhashBandPairs(
      hashed: DataFrame, // (__id, simhash<bits>)
      bits: Int,
      bands: Int,
      maxHamming: Int): DataFrame = {
    val hc = hashed.columns.last
    val width = bits / bands
    val banded = hashed.select(
      col("__id"), col(hc).as("__sh"),
      explode(sequence(lit(0), lit(bands - 1))).as("__band"))
      .withColumn("__bval",
        expr(s"shiftright(__sh, __band * $width) & ${(1L << width) - 1}"))
    val a = banded.select(col("__id").as("id_a"), col("__sh").as("ha"),
      col("__band"), col("__bval"))
    val b = banded.select(col("__id").as("id_b"), col("__sh").as("hb"),
      col("__band"), col("__bval"))
    a.join(b, Seq("__band", "__bval"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b", "ha", "hb").distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .select(
        col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
  }

  /** Bipartite SimHash band join — near-dup candidates of an INCOMING
    * fingerprint frame against a PERSISTED reference fingerprint store
    * (the [[minhashBandJoin]] shape for Hamming space). Both sides are
    * banded identically, so pigeonhole completeness carries over: any
    * incoming/reference pair within `maxHamming` (for
    * `maxHamming < bands`) shares at least one band slice and is found
    * by the (band, slice) equi-join — never an all-pairs compare, and
    * the incoming side's fingerprints are the only ones computed this
    * run (the reference side is a bytes-per-doc store read). Output is
    * canonically oriented (`id_a` < `id_b`), matching
    * [[simhashBandPairs]], so the union of (incoming self-pairs) ∪
    * (this join) is EXACTLY the full-corpus pair set restricted to
    * pairs touching the incoming half — q424 oracle-certifies that set
    * identity, and q415's warm CC consumes it.
    *
    * @param incoming  (__id, simhash<bits>) — this run's fingerprints
    * @param reference (__id, simhash<bits>) — the persisted store;
    *                  ids must be disjoint from `incoming`'s
    */
  def simhashBandJoin(
      incoming: DataFrame, reference: DataFrame,
      bits: Int, bands: Int, maxHamming: Int): DataFrame = {
    val width = bits / bands
    def banded(df: DataFrame, idName: String, shName: String) = {
      // Fingerprint column selected BY NAME, never positionally (r16
      // ADVICE): the reference side is an externally persisted store,
      // and a future layout gaining a column (or reordering) would
      // silently band the wrong values — an INCOMPLETE candidate set
      // with no error, quietly breaking the band-completeness argument
      // q415's exactness proof rests on. The name is derivable from
      // `bits` ([[simhashN]]'s contract); its absence fails loudly.
      val hc = s"simhash$bits"
      require(df.columns.contains("__id") && df.columns.contains(hc),
        s"simhashBandJoin: expected columns (__id, $hc), got " +
          df.columns.mkString("(", ", ", ")"))
      df.select(col("__id").as(idName), col(hc).as(shName),
        explode(sequence(lit(0), lit(bands - 1))).as("__band"))
        .withColumn("__bval",
          expr(s"shiftright($shName, __band * $width) & ${(1L << width) - 1}"))
    }
    banded(incoming, "__inc", "hi")
      .join(banded(reference, "__ref", "hr"), Seq("__band", "__bval"))
      .select(
        least(col("__inc"), col("__ref")).as("id_a"),
        greatest(col("__inc"), col("__ref")).as("id_b"),
        when(col("__inc") < col("__ref"), col("hi")).otherwise(col("hr")).as("ha"),
        when(col("__inc") < col("__ref"), col("hr")).otherwise(col("hi")).as("hb"))
      .distinct()
      .filter(bit_count(col("ha").bitwiseXOR(col("hb"))) <= maxHamming)
      .select(
        col("id_a"), col("id_b"),
        bit_count(col("ha").bitwiseXOR(col("hb"))).cast("long").as("hamming"))
  }

  /** Engine-portable MinHash signature: component k = MIN over the
    * doc's shingle set of md5("k:" ++ shingle). Unlike spark.ml's
    * `MinHashLSH` (q57 — engine-local hash family, rows-only check),
    * md5-min signatures are reproducible in ANY engine, so the whole
    * MinHash→banding→candidate-pairs path becomes oracle-certifiable.
    *
    * One explode + ONE combiner-friendly groupBy computes all
    * `numHashes` components (each min is a partial agg — the shuffle
    * carries `numHashes` 32-char minima per doc, not the shingles).
    */
  def minhashSignature(
      df: DataFrame, id: Column, shingleSet: Column, numHashes: Int): DataFrame = {
    require(numHashes >= 1, "need at least one hash component")
    // explode_outer + isnotnull (not plain explode): avoids the
    // InferFiltersFromGenerate size()>0 predicate, which would push
    // through the shingle projection and re-evaluate the whole
    // transform per row (see Decontam.contaminationReport). Docs with
    // empty shingle sets drop out either way.
    val g = df.select(id.as("__id"), explode_outer(shingleSet).as("__s"))
      .filter(col("__s").isNotNull)
    val aggs = (0 until numHashes).map(k =>
      min(md5(concat(lit(s"$k:"), col("__s")))).as(s"mh$k"))
    g.groupBy(col("__id")).agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding over a [[minhashSignature]] frame: split the signature
    * into `bands` contiguous row-groups, key each by the md5 of its
    * concatenated components, and equi-join on (band, key). Two docs
    * with shingle-Jaccard j collide on a given band w.p. j^(rows), so
    * near-dups (j→1) are found w.h.p. while distant pairs almost never
    * join — the all-pairs plan never exists.
    */
  def minhashBandPairs(
      sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    val banded = bandedKeys(sig, numHashes, bands)
    val a = banded.select(col("__id").as("id_a"), col("band"), col("bkey"))
    val b = banded.select(col("__id").as("id_b"), col("band"), col("bkey"))
    a.join(b, Seq("band", "bkey"))
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).cast("long").as("shared_bands"))
  }

  /** (id, band, bkey) banding rows for a [[minhashSignature]] frame —
    * the shared candidate-keying stage of the self-join
    * ([[minhashBandPairs]]) and bipartite ([[minhashBandJoin]]) paths.
    */
  private def bandedKeys(
      sig: DataFrame, numHashes: Int, bands: Int): DataFrame = {
    require(bands >= 1 && numHashes % bands == 0,
      "numHashes must divide evenly into bands")
    val rows = numHashes / bands
    val bandKeys = (0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        md5(concat_ws("|",
          (0 until rows).map(r => col(s"mh${b * rows + r}")): _*)).as("bkey"))
    }
    sig
      .select(col("__id"), explode(array(bandKeys: _*)).as("bk"))
      .select(col("__id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
  }

  /** Bipartite MinHash band join — near-dup candidates of an INCOMING
    * batch against an EXISTING reference corpus (no self-pairs, no
    * incoming×incoming or reference×reference pairs). This is the
    * production dedup shape at 100 TB: the reference corpus's
    * signatures are computed once and stored (12 md5 minima/doc — a
    * few hundred bytes, not the document); each new crawl batch
    * signatures only ITSELF and band-joins against the stored
    * signature table. The join is bucket-local on (band, bkey); when
    * the incoming batch is small AQE broadcasts it, so the 100 TB
    * reference side never shuffles.
    */
  def minhashBandJoin(
      incoming: DataFrame, reference: DataFrame,
      numHashes: Int, bands: Int): DataFrame = {
    val inc = bandedKeys(incoming, numHashes, bands)
      .select(col("__id").as("inc_id"), col("band"), col("bkey"))
    val ref = bandedKeys(reference, numHashes, bands)
      .select(col("__id").as("ref_id"), col("band"), col("bkey"))
    inc.join(ref, Seq("band", "bkey"))
      .groupBy(col("inc_id"), col("ref_id"))
      .agg(count(lit(1)).cast("long").as("shared_bands"))
  }

  // ---- declared queries ---------------------------------------------------

  def q55(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(contentHash(col("text"))).as("distinct_docs"))
      .orderBy("source")

  def q56(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(contentHash(col("text")))
      .agg(min(col("doc_id")).as("keep_id"))
      .select("keep_id")
      .orderBy("keep_id")

  /** Near-dup candidates by MinHashLSH over trigram-shingle sets
    * (rows-only check: spark.ml's hash family is not expressible in the
    * DuckDB oracle). Deterministic via fixed seed. `approxSimilarityJoin`
    * expands only LSH-bucket-colliding pairs — the scale path.
    *
    * Params swept (round 3): stride 3 + 2 hash tables cut the sf0.1
    * wall time 7.3→5.5 s with recall UNCHANGED (the same 25 planted
    * pairs found at sf0.01) — the near-dups sit at similarity ≥ 0.92,
    * where even one minhash table collides w.p. ≥ 0.92 per pair, so
    * OR-amplification beyond 2 tables buys nothing here.
    */
  def q57(s: SparkSession, dir: String): DataFrame =
    minhashLshPairs(docs(s, dir)).orderBy("id_a", "id_b")

  /** Frame-parameterized core of q57 (unordered), reusable over any
    * (doc_id, text) frame — the 10× scale audit times it directly.
    */
  def minhashLshPairs(d: DataFrame, threshold: Double = 0.6): DataFrame = {
    val base = d
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles3Strided(col("ws"), 3).as("sh"))
      .filter(size(col("sh")) > 0)
    val tf = new HashingTF()
      .setInputCol("sh").setOutputCol("features")
      .setNumFeatures(1 << 18).setBinary(true)
    // Keep ONLY (doc_id, features): approxSimilarityJoin carries every
    // column through its explode→join→distinct, so surplus payload
    // (the shingle arrays) multiplies the shuffle and the row-dedup cost.
    // Persist: the self-join evaluates its input in BOTH legs; without
    // this the shingle+hash pipeline runs twice (spill-safe storage
    // level, the same persist a production LSH join would use). Not
    // unpersisted (the result is lazy); bounded, because the
    // CacheManager dedups identical canonical plans, so repeated
    // invocations share one cache entry.
    val featured = tf.transform(base).select("doc_id", "features")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val lsh = new MinHashLSH()
      .setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(2).setSeed(42L)
    val model = lsh.fit(featured)
    model.approxSimilarityJoin(featured, featured, threshold, "jaccard_dist")
      .select(
        col("datasetA.doc_id").as("id_a"),
        col("datasetB.doc_id").as("id_b"),
        round(col("jaccard_dist"), 4).as("jaccard_dist"))
      .filter(col("id_a") < col("id_b"))
  }

  /** Unigram-set and trigram-shingle Jaccard for every consecutive-id
    * pair — the deterministic O(N) candidate set (the synthetic corpus
    * plants near-dups at adjacent ids; a real pipeline would get its
    * candidates from q57's LSH buckets).
    */
  def q58(s: SparkSession, dir: String): DataFrame = {
    // r18 probe: persisting this frame (q57's pattern — the
    // consecutive-id join evaluates the subtree in both legs) measured
    // a WASH and was reverted: DevTime min 2.23→2.01 s but median
    // 2.45→2.81 at sf0.1, min 2.04→1.74 / median 2.36→2.70 at 10× —
    // the tokenize+distinct subtree here is cheap enough that the
    // array-payload cache write cancels the saved recompute (q57's
    // subtree hashes through HashingTF, a different cost class).
    val t = docs(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(
        col("doc_id"),
        array_distinct(col("ws")).as("w1"),
        shingles3FromTokens(col("ws")).as("w3"))
    val a = t.select(col("doc_id").as("id_a"), col("w1").as("a1"), col("w3").as("a3"))
    val b = t.select(col("doc_id").as("id_b"), col("w1").as("b1"), col("w3").as("b3"))
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(
        col("id_a"), col("id_b"),
        round(jaccardSets(col("a1"), col("b1")), 4).as("jaccard1"),
        round(jaccardSets(col("a3"), col("b3")), 4).as("jaccard3"))
      .orderBy("id_a")
  }

  def q59(s: SparkSession, dir: String): DataFrame =
    simhash(docs(s, dir), col("doc_id"), col("text"))
      .withColumnRenamed("__id", "doc_id")
      .orderBy("doc_id")

  /** SimHash near-dup candidate pairs: 60-bit fingerprint (sha256
    * votes — this corpus's docs are distributionally so similar that
    * 32-bit fingerprints collapse into hot buckets), 4×15-bit bands,
    * Hamming ≤ 2 (pigeonhole-complete). Bounded to the first 1000 docs
    * like q60's probe set so the candidate volume is stable across
    * scale factors; at sf0.01 the bound covers the whole corpus.
    * The hamming-space counterpart of q57's set-space MinHashLSH.
    */
  def q65(s: SparkSession, dir: String): DataFrame =
    // r17: the session-shared probe pair set (Components.probeBandPairs
    // — same derivation, one LSH pass for its seven consumers).
    Components.probeBandPairs(s, dir)
      .orderBy("id_a", "id_b")

  /** q94 — the library's INTENDED near-dup composition, end-to-end:
    * LSH candidate generation (q65's pigeonhole-complete simhash bands)
    * → exact unigram-Jaccard rescoring (q58's scorer) → threshold. The
    * expensive exact compare runs only on the bucket-local candidate
    * pairs, never all pairs — this is the query a 100 TB dedup pipeline
    * actually executes, with each certified stage composed.
    */
  def q94(s: SparkSession, dir: String): DataFrame = {
    val subset = docs(s, dir).filter(col("doc_id") < 1000)
    val pairs = Components.probeBandPairs(s, dir) // r17 shared LSH pass
    val toks = subset.select(
      col("doc_id"), array_distinct(split(col("text"), " ")).as("w1"))
    pairs
      .join(toks.select(col("doc_id").as("id_a"), col("w1").as("a1")), "id_a")
      .join(toks.select(col("doc_id").as("id_b"), col("w1").as("b1")), "id_b")
      .select(
        col("id_a"), col("id_b"), col("hamming"),
        round(jaccardSets(col("a1"), col("b1")), 4).as("jaccard1"))
      .filter(col("jaccard1") >= 0.5)
      .orderBy("id_a", "id_b")
  }

  /** q107 — the PORTABLE MinHash near-dup candidate path, end-to-end
    * oracle-certified (the certified counterpart of q57's rows-only
    * spark.ml variant): trigram shingles → 12-component md5-min
    * signature → 4 bands × 3 rows → band-bucket equi-join. Bounded to
    * doc_id < 1000 like q60/q65 so candidate volume is stable across
    * scale factors.
    */
  def q107(s: SparkSession, dir: String): DataFrame = {
    // No size()>0 pre-filter here: it would be pushed below the shingle
    // projection and inlined (the interpreted-lambda recompute trap);
    // minhashSignature's outer-explode drops empty sets anyway.
    val base = docs(s, dir).filter(col("doc_id") < 1000)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles3FromTokens(col("ws")).as("sh"))
    val sig = minhashSignature(base, col("doc_id"), col("sh"), numHashes = 12)
    minhashBandPairs(sig, numHashes = 12, bands = 4)
      .orderBy("id_a", "id_b")
  }

  /** q122 — cross-corpus near-dup: the odd-doc_id half of the corpus
    * plays the INCOMING crawl batch, the even half the EXISTING
    * reference corpus (the synthetic corpus plants near-dups at
    * adjacent ids, so every planted pair spans the even/odd split —
    * the probe set exercises exactly the cross-corpus path). One
    * signature pass over the union; the band join is strictly
    * bipartite via [[minhashBandJoin]].
    */
  def q122(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).filter(col("doc_id") < 1000)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles3FromTokens(col("ws")).as("sh"))
    val sig = minhashSignature(base, col("doc_id"), col("sh"), numHashes = 12)
      // Signature pass runs ONCE for both halves: materialized before
      // the even/odd split, or each side would re-run the
      // explode+groupBy over its half of the corpus.
      .localCheckpoint(true)
    minhashBandJoin(
      incoming = sig.filter(col("__id") % 2 === 1),
      reference = sig.filter(col("__id") % 2 === 0),
      numHashes = 12, bands = 4)
      .orderBy("inc_id", "ref_id")
  }

  /** Length-banded fuzzy (edit-distance) candidate pairs over a string
    * column. The blocking invariant: `levenshtein(a,b) <= maxDist`
    * implies `|len(a)-len(b)| <= maxDist`, which with bucket width
    * `maxDist+1` implies the buckets differ by at most 1 — so probing
    * each string into its own bucket ± 1 is a LOSSLESS candidate
    * filter. The probe explode is ×3; the join is an equi-join on the
    * bucket (never a nested loop), and the quadratic levenshtein DP
    * runs only inside same-band candidates. At 100 TB you'd compose
    * this with a content prefilter (band on a cheap signature first) —
    * the blocking shape is the point, and it survives scale because
    * candidate volume is Σ per-bucket |A|×|B|, not N².
    */
  def fuzzyPairs(d: DataFrame, s: Column, maxDist: Int): DataFrame = {
    require(maxDist >= 1, s"fuzzyPairs: maxDist must be >= 1, got $maxDist")
    val width = maxDist + 1
    val names = d.select(s.as("name")).distinct()
      .withColumn("b", floor(length(col("name")) / width))
    val probes = names
      .withColumn("pb", explode(array(col("b") - 1, col("b"), col("b") + 1)))
      .select(col("name").as("name_a"), col("pb"))
    // A pair matches in exactly one probe bucket (name_b's bucket is a
    // single value and the three probe buckets are distinct) — no
    // post-join dedup needed.
    probes
      .join(names.select(col("name").as("name_b"), col("b").as("pb")), "pb")
      .filter(col("name_a") < col("name_b"))
      .withColumn("dist", levenshtein(col("name_a"), col("name_b")))
      .filter(col("dist").between(1, maxDist))
      .select(col("name_a"), col("name_b"), col("dist").cast("long").as("dist"))
  }

  /** q128 — fuzzy near-dup part names: every distinct `p_name` pair
    * within edit distance 3, found via length-banded blocking.
    */
  def q128(s: SparkSession, dir: String): DataFrame =
    fuzzyPairs(Tables.table(s, dir, "part"), col("p_name"), maxDist = 3)
      .orderBy("name_a", "name_b")

  /** q252 — Jaro–Winkler fuzzy matches among distinct part names,
    * blocked on the leading token (the record-linkage "blocking key"):
    * pairs scoring ≥ 0.88 on the native [[graft.ops.JaroWinkler]]
    * expression (DuckDB-verified semantics). The prefix-weighted
    * complement to q128's edit distance: Levenshtein counts operations
    * anywhere, JW rewards the shared stem — the metric name/title
    * matchers actually rank by.
    *
    * Float discipline: jw is e6-gridded ([[Similarity.intScaled]]) and
    * the keep decision reads the GRID (jw_e6 ≥ 880000) — both engines
    * decide identically; spec measures every candidate pair's margin
    * to its half-boundary at both gate SFs (the q134 pattern — JW is
    * a division chain, so 1-ulp cross-engine drift is assumed).
    *
    * Scale: names collapse to the distinct set first (value-bounded);
    * the equi-join on the blocking key bounds candidates to in-block
    * pairs (O(Σ block²) — the standard linkage trade: recall is
    * forfeited across blocks BY DESIGN, unlike q128's lossless band).
    */
  def q252(s: SparkSession, dir: String): DataFrame = {
    val names = Tables.table(s, dir, "part")
      .select(col("p_name").as("name")).distinct()
      .withColumn("w", split(col("name"), " ").getItem(0))
    names.select(col("w"), col("name").as("name_a"))
      .join(names.select(col("w"), col("name").as("name_b")), "w")
      .filter(col("name_a") < col("name_b"))
      .select(col("w"), col("name_a"), col("name_b"),
        Similarity.intScaled(
          graft.ops.JaroWinkler(col("name_a"), col("name_b")), 1000000L)
          .as("jw_e6"))
      .filter(col("jw_e6") >= 880000L)
      .orderBy("w", "name_a", "name_b")
  }

  /** q261 — blocking-quality audit: pair completeness (recall of the
    * blocking scheme against exact ground truth) and reduction ratio
    * (fraction of the quadratic pair space the blocks prune) — the
    * two numbers (Christen 2012) every record-linkage/dedup pipeline
    * publishes before trusting a blocking key. Audited here: the
    * 100-char length-band equi-join blocking (the lossy same-band
    * variant) against exact unigram-Jaccard ≥ 1/2 truth on the
    * bounded probe subset (doc_id < 300 — the q136/q159 audit-harness
    * posture).
    *
    * All-integer: the truth decision is 2·|A∩B| ≥ |A∪B| (exact set
    * cardinalities — no Jaccard double ever materializes), candidate
    * and total pair counts are c·(c−1)/2 sums, and PC/RR are each ONE
    * mirrored division e4-gridded.
    *
    * Scale: ground truth rides an INVERTED-INDEX join (distinct
    * tokens equi-join on the word — only overlapping pairs surface;
    * J ≥ 1/2 needs overlap ≥ 1, so zero-overlap pairs are provably
    * absent from truth), never a cartesian; candidate counts come
    * from per-band cardinalities, never materialized pairs. Hot-token
    * fan-out at corpus scale gets the q109 df-cap; the probe bound
    * keeps the audit itself SF-stable.
    */
  def q261(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir).filter(col("doc_id") < 300)
      .select(col("doc_id"),
        array_distinct(split(col("text"), " ")).as("toks"),
        expr("n_chars DIV 100").as("band"))
    val sizes = d.select(col("doc_id"), size(col("toks")).cast("long").as("sz"),
      col("band"))
    val inv = d.select(col("doc_id"), explode(col("toks")).as("w"))
    val inter = inv.select(col("w"), col("doc_id").as("id_a"))
      .join(inv.select(col("w"), col("doc_id").as("id_b")), "w")
      .filter(col("id_a") < col("id_b"))
      .groupBy(col("id_a"), col("id_b"))
      .agg(count(lit(1)).as("inter"))
    val truth = inter
      .join(sizes.select(col("doc_id").as("id_a"), col("sz").as("sa"),
        col("band").as("ba")), "id_a")
      .join(sizes.select(col("doc_id").as("id_b"), col("sz").as("sb"),
        col("band").as("bb")), "id_b")
      .filter(lit(2L) * col("inter") >= col("sa") + col("sb") - col("inter"))
      .agg(count(lit(1)).as("truth_pairs"),
        coalesce(sum((col("ba") === col("bb")).cast("long")), lit(0L))
          .as("caught_pairs"))
    val totals = d.agg(count(lit(1)).as("n_docs"))
      .select(col("n_docs"),
        expr("n_docs * (n_docs - 1) DIV 2").as("total_pairs"))
    val cand = d.groupBy(col("band")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1) DIV 2")), lit(0L))
        .as("cand_pairs"))
    totals.withGlobalStats(truth).withGlobalStats(cand)
      .select(col("n_docs"), col("total_pairs"), col("truth_pairs"),
        col("cand_pairs"), col("caught_pairs"),
        when(col("truth_pairs") > 0,
          round(col("caught_pairs").cast("double") /
            col("truth_pairs").cast("double") * 10000d, 0).cast("long"))
          .as("pc_e4"),
        round((lit(1d) - col("cand_pairs").cast("double") /
          col("total_pairs").cast("double")) * 10000d, 0).cast("long")
          .as("rr_e4"))
  }

  /** q257 — Fellegi-Sunter record-linkage scoring (the 1969 model
    * every probabilistic matcher — Splink, dedupe.io — still runs):
    * candidate record pairs get a log-likelihood weight
    * Σ_field ln(m/u) (agree) / ln((1−m)/(1−u)) (disagree) and a
    * three-way match/possible/nonmatch decision between two
    * thresholds. Four comparison fields over `part`: name JW ≥ 0.88
    * (the q252 gridded decision), brand equality, type equality,
    * |size diff| ≤ 2. The m/u parameters are fixed literals (EM
    * fitting is the offline step); their ln-ratios are embedded as
    * IDENTICAL e6 integers in both engines, so the weight is pure
    * integer arithmetic — the only float is the q252-certified JW
    * expression, gridded before the agree/disagree decision.
    *
    * Scale: records collapse to DISTINCT attribute profiles first
    * (name × brand × type × size — a value-bounded domain that
    * saturates with SF, the q238/q245 value-collapse posture) with
    * multiplicities; pairing blocks on the name's noun token and
    * compares profile PAIRS once, weighting the census by n_a·n_b
    * record pairs. Same-profile pairs are exact duplicates — q04/q55
    * territory, excluded here by the strict key order.
    */
  def q257(s: SparkSession, dir: String): DataFrame = {
    val prof = Tables.table(s, dir, "part")
      .groupBy(col("p_name").as("name"), col("p_brand").as("brand"),
        col("p_type").as("ptype"), col("p_size").as("size"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("w", split(col("name"), " ").getItem(1))
      // r18 (guide §2.3 — cheaper per-row work on the fan-out): the
      // pair orientation used to be a concatenated-profile STRING
      // compare (`ka < kb`) evaluated on every ordered in-block combo
      // (~48M string compares at sf0.1). ANY strict total order over
      // profiles yields the same unordered-pair census — all four
      // field weights are symmetric, JW is symmetric (pinned in
      // Round9bSpec), and the JW grid holds both orders — so the
      // orientation now rides one precomputed xxhash64 long (field
      // tie-break for the astronomically-unlikely hash collision;
      // equal profiles fail every branch, exactly like `ka < kb`).
      .withColumn("h", xxhash64(col("name"), col("brand"),
        col("ptype"), col("size")))
    // Explicit 64-way spread of the probe side: the profile frame is
    // tiny (19.6k rows at sf0.1) so AQE coalesces it to ~1 partition —
    // but the block join FANS OUT 24M pairs from it, and that fan-out
    // inherits the probe side's parallelism. An explicit repartition
    // is an AQE-respected barrier; 64 ways keeps every core busy at
    // bench scale and is noise at the gate SFs.
    val a = prof.select(col("w"), col("h").as("ha"), col("name").as("na"),
      col("brand").as("ba"), col("ptype").as("ta"), col("size").as("sa"),
      col("cnt").as("ca"))
      .repartition(64, col("ha"))
    val b = prof.select(col("w"), col("h").as("hb"), col("name").as("nb"),
      col("brand").as("bb"), col("ptype").as("tb"), col("size").as("sb"),
      col("cnt").as("cb"))
    // JW is the only expensive comparator and depends ONLY on the name
    // pair — evaluate it once per distinct in-block (na, nb) combo
    // (vocabulary², ≤ names² rows, broadcast) instead of once per
    // profile pair (24M at sf0.1 — the r9 bench measured 18.5 s with
    // the inline form, 0.9 s hoisted). Same gridded decision, same
    // hash. na = nb pairs (profiles differing only in brand/type/size)
    // are included: JW(x,x) = 1 ⇒ agree.
    val names = prof.select(col("w"), col("name")).distinct()
    val jwAgree = names.select(col("w"), col("name").as("na"))
      .join(names.select(col("w"), col("name").as("nb")), "w")
      .select(col("na"), col("nb"),
        (Similarity.intScaled(
          graft.ops.JaroWinkler(col("na"), col("nb")), 1000000L) >= 880000L)
          .as("jw_agree"))
    val weight =
      when(col("jw_agree"), 2890372L).otherwise(-2251292L) +
        when(col("ba") === col("bb"), 3167583L).otherwise(-2954910L) +
        when(col("ta") === col("tb"), 1386294L).otherwise(-1386294L) +
        when(abs(col("sa") - col("sb")) <= 2, 2140066L).otherwise(-1791759L)
    a.join(b, "w")
      .filter(col("ha") < col("hb") ||
        (col("ha") === col("hb") && (col("na") < col("nb") ||
          (col("na") === col("nb") && (col("ba") < col("bb") ||
            (col("ba") === col("bb") && (col("ta") < col("tb") ||
              (col("ta") === col("tb") && col("sa") < col("sb")))))))))
      .join(broadcast(jwAgree), Seq("na", "nb"))
      .select(col("w"), weight.as("wt"),
        (col("ca") * col("cb")).as("rec_pairs"))
      .withColumn("decision",
        when(col("wt") >= 5000000L, "match")
          .when(col("wt") >= 0L, "possible")
          .otherwise("nonmatch"))
      .groupBy(col("w"), col("decision"))
      .agg(count(lit(1)).as("n_profile_pairs"),
        sum(col("rec_pairs")).as("n_record_pairs"),
        min(col("wt")).as("min_wt"),
        max(col("wt")).as("max_wt"))
      .orderBy("w", "decision")
  }

  /** Cross-document duplicated-segment removal (the paragraph-dedup
    * pass of public web-corpus pipelines, run here on fixed 16-token
    * segments since the synthetic docs have no newlines): a segment is
    * dropped when its exact hash appears in MORE THAN ONE distinct
    * document; what remains is reassembled in order and fingerprinted.
    *
    * Shape at 100 TB: segment explode (map-side) → one groupBy on the
    * segment hash (counts distinct docs — the only corpus-wide
    * shuffle) → hash-join the verdict back → regroup per doc. The
    * verdict frame is (hash, n_docs) — no text payload.
    */
  def segmentDedup(d: DataFrame, id: Column, text: Column, width: Int = 16): DataFrame = {
    require(width >= 1, s"segmentDedup: width must be >= 1, got $width")
    val segsCol = {
      val ws = split(text, " ")
      transform(
        sequence(lit(0), floor((size(ws) - 1) / width).cast("int")),
        i => concat_ws(" ", slice(ws, i * width + 1, lit(width))))
    }
    val segs = d
      .select(id.as("doc_id"), posexplode(segsCol).as(Seq("pos", "seg")))
      .withColumn("h", md5(col("seg")))
    val verdict = segs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    segs.join(verdict, "h")
      .groupBy("doc_id")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_dup_segs"),
        md5(concat_ws(" ",
          transform(
            array_sort(collect_list(
              when(col("n_docs") <= 1, struct(col("pos"), col("seg"))))),
            x => x.getField("seg")))).as("clean_fp"))
  }

  /** q129 — per-doc census of the cross-doc segment dedup: segment
    * count, duplicated-segment count, and the md5 of the cleaned
    * (duplicate-segments-removed) text.
    */
  def q129(s: SparkSession, dir: String): DataFrame =
    segmentDedup(docs(s, dir), col("doc_id"), col("text"))
      .orderBy("doc_id")

  /** q269 — per-SOURCE boilerplate segment mass: a 16-token segment is
    * BOILERPLATE when its exact hash appears in ≥ 3 distinct documents
    * (the CCNet-style "repeated across the crawl" test — stricter than
    * q129's any-duplication census, and body-positional unlike q187's
    * prefix-only detector). Per source: segment instances, boilerplate
    * instances, distinct boilerplate shapes, and the boilerplate
    * fraction — the feed-level dashboard that tells an ingest which
    * sources ship templated chrome rather than content.
    *
    * Float discipline: the fraction is one division of exact integer
    * counts — identical doubles on both engines — e6-gridded once.
    *
    * Scale: same shape as [[segmentDedup]] — map-side segment explode,
    * ONE corpus-wide shuffle on the segment hash (verdict is (hash,
    * n_docs), no text payload), hash-join back, then a source-bounded
    * agg. Nothing after the verdict join carries segment text.
    */
  def q269(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val segsCol = transform(
      sequence(lit(0), floor((size(ws) - 1) / 16).cast("int")),
      i => concat_ws(" ", slice(ws, i * 16 + 1, lit(16))))
    val segs = docs(s, dir)
      .select(col("source"), col("doc_id"), explode(segsCol).as("seg"))
      .select(col("source"), col("doc_id"), md5(col("seg")).as("h"))
    val verdict = segs.groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"))
    segs.join(verdict, "h")
      .groupBy("source")
      .agg(
        count(lit(1)).as("n_segs"),
        sum(when(col("n_docs") >= 3, 1L).otherwise(0L)).as("n_bp_segs"),
        countDistinct(when(col("n_docs") >= 3, col("h"))).as("n_bp_shapes"))
      .select(col("source"), col("n_segs"), col("n_bp_segs"),
        col("n_bp_shapes"),
        Similarity.intScaled(
          col("n_bp_segs").cast("double") / col("n_segs").cast("double"),
          1000000L).as("bp_e6"))
      .orderBy("source")
  }

  /** Directional set containment |a∩b| / |a| — the asymmetric near-dup
    * signal Jaccard misses: a short doc fully quoted inside a long one
    * has low Jaccard but containment ≈ 1 in the short→long direction.
    */
  def containmentSets(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      nullif(size(a).cast("double"), lit(0.0))

  /** q132 — containment scoring over the deterministic adjacent-id
    * candidate set (q58's contract): both directions, integer-scaled,
    * plus a `contained` verdict at ≥ 0.9 compared in INTEGER space
    * (the q66 threshold discipline — a raw-double 0.9 compare could
    * flip across engines at the boundary).
    */
  def q132(s: SparkSession, dir: String): DataFrame = {
    val t = docs(s, dir)
      .select(col("doc_id"), array_distinct(split(col("text"), " ")).as("w1"))
    val a = t.select(col("doc_id").as("id_a"), col("w1").as("a1"))
    val b = t.select(col("doc_id").as("id_b"), col("w1").as("b1"))
    val cab = Similarity.intScaled(containmentSets(col("a1"), col("b1")), 10000L)
    val cba = Similarity.intScaled(containmentSets(col("b1"), col("a1")), 10000L)
    a.join(b, col("id_b") === col("id_a") + 1)
      .select(
        col("id_a"), col("id_b"),
        cab.as("cont_ab_e4"), cba.as("cont_ba_e4"),
        when(greatest(cab, cba) >= 9000L, 1L).otherwise(0L).as("contained"))
      .orderBy("id_a")
  }

  /** q240 — winnowing-style robust fingerprints (Schleimer et al.
    * 2003, the MOSS local-minimum selection): per document, hash each
    * ordered 3-token shingle portably (md5 prefix → 40-bit int) and
    * select the positions whose hash is the minimum of the ±3-shingle
    * centered window, tie-broken by position via a single packed
    * `h40·2²³ + pos` comparison. The selected set is the document's
    * FINGERPRINT: any shared substring of ≥ window+k tokens is
    * guaranteed to share a fingerprint, so fingerprint collisions are
    * the candidate generator for plagiarism/near-dup at a fraction of
    * full-shingle cost. Output: per-doc shingle/fingerprint census
    * (centered-window density ≈ 1/(2w+1) = 1/7 on hash-random input).
    *
    * Portable by construction (md5, not engine murmur — the q107
    * discipline); all-integer. The in-plan guard raises on pos ≥ 2²³
    * (the packing domain), the q189 loud-failure pattern.
    *
    * Scale: shingling is row-local fan-out; the window is keyed by
    * doc ordered by position — per-doc work, embarrassingly parallel.
    * The census agg is a combiner groupBy on doc_id.
    */
  def q240(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = split(col("text"), " ")
    val g = docs(s, dir)
      .select(col("doc_id"), posexplode(shinglesKAll(ws, 3)).as(Seq("pos", "sh")))
    val h40 = conv(substring(md5(col("sh")), 1, 10), 16, 10).cast("long")
    val packed = coalesce(
      when(col("pos") >= lit(1 << 23),
        raise_error(concat(lit("q240 packing domain violated: pos="),
          col("pos").cast("string"))).cast("long")),
      col("h40") * lit(1L << 23) + col("pos"))
    val w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(-3, 3)
    g.select(col("doc_id"), col("pos"), h40.as("h40"))
      .select(col("doc_id"), col("pos"), col("h40"), packed.as("packed"))
      .withColumn("wmin", min(col("packed")).over(w))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("packed") === col("wmin"), 1L).otherwise(0L)).as("n_fp"),
        countDistinct(when(col("packed") === col("wmin"), col("h40")))
          .as("n_fp_distinct"))
      .orderBy("doc_id")
  }

  /** q319 — transitivity (global clustering coefficient) of the q65
    * near-dup candidate graph: 3·triangles/wedges over the simhash
    * band pairs. THE threshold-calibration diagnostic for dedup:
    * genuine near-duplication is (approximately) an equivalence
    * relation, so a WELL-chosen threshold yields a near-transitive
    * pair graph (clusters close their triangles); low transitivity
    * means the bands are stitching unrelated docs through hub-like
    * false positives — q102's components would then over-merge, and
    * this number says so BEFORE the merge happens.
    *
    * All-integer: edge/degree/triangle counts exactly as q150 counts
    * them (the degree-oriented wedge join), Σdeg(deg−1) for doubled
    * wedges, one mirrored 2·(3T)/w2 division e6, NULL-guarded on a
    * wedge-free graph.
    *
    * Scale: candidate pairs are band-local (q65's posture); the wedge
    * join rides the degree-oriented cap. One-row output.
    */
  def q319(s: SparkSession, dir: String): DataFrame = {
    val pairs = Components.probeBandPairs(s, dir) // r17 shared LSH pass
      .select(col("id_a").as("src"), col("id_b").as("dst"))
    val deg = pairs.select(col("src").as("id"))
      .unionAll(pairs.select(col("dst").as("id")))
      .groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val w2 = deg.agg(
      coalesce(sum(col("deg") * (col("deg") - 1L)), lit(0L)).as("w2"))
    val tri3 = Graph.triangleCounts(pairs)
      .agg(coalesce(sum(col("n_tri")), lit(0L)).as("tri3"))
    pairs.agg(count(lit(1)).as("n_edges"))
      .withGlobalStats(w2).withGlobalStats(tri3)
      .select(col("n_edges"),
        expr("w2 DIV 2").as("wedges"),
        expr("tri3 DIV 3").as("triangles"),
        when(col("w2") > 0L,
          Similarity.intScaled(
            lit(2.0) * col("tri3").cast("double") / col("w2").cast("double"),
            1000000L)).as("trans_e6"))
  }

  /** q321 — dedup-signal agreement: how much do the TEXTUAL near-dup
    * candidates (q65's simhash bands over doc text) and the SEMANTIC
    * ones (q66's label-blocked embedding pairs at cos ≥ 0.3) agree on
    * the same id space? The multi-signal arbitration row a production
    * dedup pass reads before choosing its drop policy: high overlap =
    * either signal suffices; text-only mass = boilerplate/templates
    * (same words, different meaning-space); embed-only mass =
    * paraphrase duplication that lexical hashing cannot see (the case
    * SemDeDup/q123 exists for).
    *
    * Pair membership on both sides is decided by canonical integers
    * (exact Hamming ≤ 2; e2-gridded cosine ≥ 30 — the q66 threshold
    * discipline, margin-pinned there); counts and Jaccard are exact
    * integers + one mirrored division. Both pair sets are bounded
    * (band-local / label-blocked with the q65/q66 probe bounds), so
    * the full-outer alignment join is candidate-sized.
    */
  def q321(s: SparkSession, dir: String): DataFrame = {
    val tp = Components.probeBandPairs(s, dir) // r17 shared LSH pass
      .select(col("id_a").as("a"), col("id_b").as("b"), lit(1L).as("t"))
    val unit = Similarity.withUnitVec(
        graft.Tables.table(s, dir, "embeddings"), "embedding", "u")
      .filter(col("vec_id") < 1000)
      .select(col("label"), col("vec_id"), col("u"))
    val ep = unit.select(col("label"), col("vec_id").as("a"), col("u").as("ua"))
      .join(unit.select(col("label"), col("vec_id").as("b"), col("u").as("ub")),
        "label")
      .filter(col("a") < col("b"))
      .filter(Similarity.intScaled(
        Similarity.dot(col("ua"), col("ub")), 100L) >= 30L)
      .select(col("a"), col("b"), lit(1L).as("e"))
    tp.join(ep, Seq("a", "b"), "full_outer")
      .select(coalesce(col("t"), lit(0L)).as("t"),
        coalesce(col("e"), lit(0L)).as("e"))
      .agg(
        coalesce(sum(col("t")), lit(0L)).as("n_text_pairs"),
        coalesce(sum(col("e")), lit(0L)).as("n_embed_pairs"),
        coalesce(sum(col("t") * col("e")), lit(0L)).as("n_both"),
        coalesce(count(lit(1)), lit(0L)).as("n_union"))
      .select(col("n_text_pairs"), col("n_embed_pairs"), col("n_both"),
        when(col("n_union") > 0L,
          Similarity.intScaled(
            col("n_both").cast("double") / col("n_union").cast("double"),
            1000000L)).as("jaccard_e6"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q321_dedup_signal_overlap" -> (q321 _),
    "q319_neardup_transitivity" -> (q319 _),
    "q55_exact_dedup"      -> (q55 _),
    "q240_winnowing"       -> (q240 _),
    "q56_dedup_keep_first" -> (q56 _),
    // q57_minhash_neardup retired from the registry (r14 verdict item
    // 7): its spark.ml hash family has no cross-engine oracle; the
    // capability is certified by the oracle-checked q107 portable
    // banding plus Round14Spec's q57 ⊇ planted-pairs pin. Def remains.
    "q58_ngram_jaccard"    -> (q58 _),
    "q59_simhash"          -> (q59 _),
    "q65_simhash_neardup"  -> (q65 _),
    "q94_band_rescore"     -> (q94 _),
    "q107_minhash_portable" -> (q107 _),
    "q402_source_leakage" -> (q402 _),
    "q122_cross_corpus_neardup" -> (q122 _),
    "q128_fuzzy_pairs"     -> (q128 _),
    "q252_jw_match"        -> (q252 _),
    "q257_fellegi_sunter"  -> (q257 _),
    "q261_blocking_quality" -> (q261 _),
    "q129_segment_dedup"   -> (q129 _),
    "q269_boilerplate"     -> (q269 _),
    "q132_containment"     -> (q132 _),
    "q159_minhash_calib"   -> (q159 _),
    "q164_dedup_census"    -> (q164 _),
    "q165_copy_flow"       -> (q165 _),
  )

  /** q164 — per-source dedup census: docs, distinct contents, exact-dup
    * rate, and how many of a source's docs lose first-wins (their
    * content's min doc_id lives elsewhere) — the per-source dedup
    * dashboard row. Two content-hash aggs; the rate is one division of
    * exact integers.
    */
  def dedupCensus(in: DataFrame): DataFrame = {
    val d = in.select(col("doc_id"), col("source"), md5(col("text")).as("h"))
    val keep = d.groupBy(col("h")).agg(min(col("doc_id")).as("keep_id"))
    d.join(keep, "h")
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("docs"),
        countDistinct(col("h")).as("distinct_contents"),
        sum(when(col("doc_id") =!= col("keep_id"), 1L).otherwise(0L))
          .as("dropped"))
      .select(col("source"), col("docs"), col("distinct_contents"),
        col("dropped"),
        Similarity.intScaled(
          col("dropped").cast("double") / col("docs"), 10000L).as("drop_e4"))
      .orderBy("source")
  }

  def q164(s: SparkSession, dir: String): DataFrame =
    dedupCensus(docs(s, dir))

  /** q165 — cross-source SEGMENT copy flow: q129's 16-token segments,
    * but attributed — for every duplicated segment VALUE, the earliest
    * occurrence (min doc_id, then min position) is the ORIGIN; every
    * other occurrence records an (origin source → copy source) edge.
    * The syndication/provenance matrix curation uses to decide which
    * sources mirror which (exact whole-doc copies don't exist in this
    * corpus — q164 shows the zero rate — but segment-level copying
    * does, and at the 16-token grain the matrix is non-trivial).
    *
    * Scale: segment hashes shuffle as (hash, doc, pos) triples — never
    * text — and the origin is one min-struct agg per hash; the flow
    * matrix is at most source² rows.
    */
  def segmentCopyFlow(in: DataFrame): DataFrame = {
    val segsCol = {
      val ws = split(col("text"), " ")
      transform(
        sequence(lit(0), floor((size(ws) - 1) / 16).cast("int")),
        i => concat_ws(" ", slice(ws, i * 16 + 1, lit(16))))
    }
    val segs = in
      .select(col("doc_id"), col("source"), posexplode(segsCol).as(Seq("pos", "seg")))
      .select(col("doc_id"), col("source"), col("pos").cast("long").as("pos"),
        md5(col("seg")).as("h"))
      .localCheckpoint(true)
    val origin = segs.groupBy(col("h"))
      .agg(min(struct(col("doc_id"), col("pos"))).as("o"),
        count(lit(1)).as("occ"))
      .filter(col("occ") > 1)
      .select(col("h"), col("o.doc_id").as("origin_id"), col("o.pos").as("origin_pos"))
    segs.join(origin, "h")
      .filter(!(col("doc_id") === col("origin_id") && col("pos") === col("origin_pos")))
      .join(segs.select(col("doc_id").as("origin_id"), col("pos").as("origin_pos"),
        col("source").as("origin_source")), Seq("origin_id", "origin_pos"))
      .groupBy(col("origin_source"), col("source").as("copy_source"))
      .agg(count(lit(1)).as("copies"))
      .orderBy("origin_source", "copy_source")
  }

  def q165(s: SparkSession, dir: String): DataFrame =
    segmentCopyFlow(docs(s, dir))

  /** q159 — MinHash CALIBRATION: for every q107 banded candidate pair,
    * the signature-match count (the estimator: matches/12 ≈ Jaccard)
    * next to the EXACT trigram-shingle Jaccard — the estimator-vs-truth
    * report a pipeline runs before trusting LSH-threshold decisions at
    * scale (the q136/q145 discipline, applied to the MinHash family).
    *
    * Everything is integer except j_e4, which is one division of two
    * exact integers — both engines compute the identical double, so
    * rounding agrees bit-for-bit. Exact Jaccard is computed ONLY on
    * the banded candidates (pair-set-sized, never all-pairs).
    */
  /** q402 — cross-source near-dup LEAKAGE matrix: q107's banded
    * MinHash candidates rolled up to unordered (source, source) cells
    * — which sources share content with which (the corpus-level
    * question behind per-pair dedup: a hot off-diagonal cell means one
    * source republishes another — drop the copier, not random halves
    * of each pair; the diagonal is within-source duplication). The
    * matrix view of q122's bipartite probe, over ALL source pairs at
    * once.
    *
    * Exactness: candidate membership is q107's exact band equality;
    * cell keys are least/greatest source strings; censuses exact; the
    * mean shared-band strength is one mirrored division per cell.
    *
    * Scale: q107's banded candidate generation (bucket-local, never
    * all-pairs) + two doc→source dimension joins + a ≤|sources|²-cell
    * agg.
    */
  def q402(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).filter(col("doc_id") < 1000)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles3FromTokens(col("ws")).as("sh"))
    val sig = minhashSignature(base, col("doc_id"), col("sh"), numHashes = 12)
    val cand = minhashBandPairs(sig, numHashes = 12, bands = 4)
    val srcs = docs(s, dir).select(col("doc_id"), col("source"))
      .localCheckpoint(true) // both sides of the pair resolution
    cand
      .join(srcs.select(col("doc_id").as("id_a"), col("source").as("sa")),
        "id_a")
      .join(srcs.select(col("doc_id").as("id_b"), col("source").as("sb")),
        "id_b")
      .groupBy(least(col("sa"), col("sb")).as("source_a"),
        greatest(col("sa"), col("sb")).as("source_b"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("shared_bands")).as("shared_bands"),
        Similarity.intScaled(
          sum(col("shared_bands")).cast("double") /
            count(lit(1)).cast("double"),
          10000L).as("mean_bands_e4"))
      .orderBy("source_a", "source_b")
  }

  def q159(s: SparkSession, dir: String): DataFrame = {
    val base = docs(s, dir).filter(col("doc_id") < 1000)
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
      .select(col("doc_id"), shingles3FromTokens(col("ws")).as("sh"))
      .localCheckpoint(true)
    val sig = minhashSignature(base, col("doc_id"), col("sh"), numHashes = 12)
      .localCheckpoint(true)
    val cand = minhashBandPairs(sig, numHashes = 12, bands = 4)
      .localCheckpoint(true)
    val matchSum = (0 until 12)
      .map(k => when(col(s"a_mh$k") === col(s"b_mh$k"), 1L).otherwise(0L))
      .reduce(_ + _)
    def sigAs(p: String) = sig.select(
      col("__id").as(s"id_$p") +: (0 until 12).map(k => col(s"mh$k").as(s"${p}_mh$k")): _*)
    val withMatches = cand
      .join(sigAs("a"), "id_a").join(sigAs("b"), "id_b")
      .select(col("id_a"), col("id_b"), col("shared_bands"),
        matchSum.as("matches"))
    val g = base
      .select(col("doc_id"), explode_outer(col("sh")).as("s"))
      .filter(col("s").isNotNull)
      .localCheckpoint(true)
    val sz = g.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = cand
      .join(g.select(col("doc_id").as("id_a"), col("s")), "id_a")
      .join(g.select(col("doc_id").as("id_b"), col("s")), Seq("id_b", "s"))
      .groupBy(col("id_a"), col("id_b")).agg(count(lit(1)).as("i"))
    withMatches
      .join(sz.select(col("doc_id").as("id_a"), col("n").as("na")), "id_a")
      .join(sz.select(col("doc_id").as("id_b"), col("n").as("nb")), "id_b")
      .join(inter, Seq("id_a", "id_b"), "left")
      .select(col("id_a"), col("id_b"), col("shared_bands"), col("matches"),
        Similarity.intScaled(
          coalesce(col("i"), lit(0L)).cast("double") /
            (col("na") + col("nb") - coalesce(col("i"), lit(0L))),
          10000L).as("j_e4"))
      .orderBy("id_a", "id_b")
  }

  /** Shared CTE prefix for the 60-bit/4-band simhash candidate pairs
    * (used by the q65/q94 oracles here and the q102 component oracle).
    * `recursive = true` emits `WITH RECURSIVE` so callers can append a
    * recursive member to the same CTE list (SQL scopes RECURSIVE over
    * the whole WITH clause).
    */
  private[ext] def simhashCandCte(recursive: Boolean = false): String = {
    val bits = 60
    val sums = (0 until bits).map(j =>
      s"SUM(CASE WHEN substring(__hex, ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val asm = (0 until bits).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    val withKw = if (recursive) "WITH RECURSIVE" else "WITH"
    s"""$withKw w AS (SELECT doc_id, sha256(unnest(list_distinct(string_split(text,' ')))) AS __hex
       |           FROM documents WHERE doc_id < 1000),
       |b AS (SELECT doc_id, $sums FROM w GROUP BY doc_id),
       |h AS (SELECT doc_id, CAST($asm AS BIGINT) AS sh FROM b),
       |bands AS (
       |  SELECT doc_id, sh, unnest(range(0, 4)) AS band,
       |         (sh >> (CAST(unnest(range(0, 4)) AS INTEGER) * 15)) & 32767 AS bval
       |  FROM h),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, a.sh AS ha, b.sh AS hb
       |  FROM bands a JOIN bands b ON a.band = b.band AND a.bval = b.bval AND a.doc_id < b.doc_id)""".stripMargin
  }

  private val simhashNearDupOracle: String =
    s"""${simhashCandCte()}
       |SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |FROM cand WHERE bit_count(xor(ha, hb)) <= 2
       |ORDER BY id_a, id_b""".stripMargin

  private val bandRescoreOracle: String =
    s"""${simhashCandCte()},
       |pairs AS (
       |  SELECT id_a, id_b, CAST(bit_count(xor(ha, hb)) AS BIGINT) AS hamming
       |  FROM cand WHERE bit_count(xor(ha, hb)) <= 2),
       |t AS (SELECT doc_id, list_distinct(string_split(text,' ')) AS w1
       |      FROM documents WHERE doc_id < 1000)
       |SELECT p.id_a, p.id_b, p.hamming,
       |  ROUND(CAST(len(list_intersect(ta.w1, tb.w1)) AS DOUBLE)
       |        / NULLIF(CAST(len(list_distinct(ta.w1 || tb.w1)) AS DOUBLE), 0), 4) AS jaccard1
       |FROM pairs p
       |JOIN t ta ON ta.doc_id = p.id_a
       |JOIN t tb ON tb.doc_id = p.id_b
       |WHERE ROUND(CAST(len(list_intersect(ta.w1, tb.w1)) AS DOUBLE)
       |        / NULLIF(CAST(len(list_distinct(ta.w1 || tb.w1)) AS DOUBLE), 0), 4) >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  private val simhashOracle: String = {
    val sums = (0 until simhashBits).map(j =>
      s"SUM(CASE WHEN substring(md5(word), ${j + 1}, 1) >= '8' THEN 1 ELSE -1 END) AS s$j")
      .mkString(", ")
    val bits = (0 until simhashBits).map(j =>
      s"(CASE WHEN s$j > 0 THEN ${1L << j} ELSE 0 END)").mkString(" + ")
    s"""WITH w AS (SELECT doc_id, unnest(list_distinct(string_split(text,' '))) AS word FROM documents),
       |b AS (SELECT doc_id, $sums FROM w GROUP BY doc_id)
       |SELECT doc_id, CAST($bits AS BIGINT) AS simhash$simhashBits FROM b ORDER BY doc_id""".stripMargin
  }

  /** Shared CTE prefix for the portable-MinHash oracles: trigram
    * shingles → 12 md5-min components → 4 band keys, as `b(doc_id,
    * band, bkey)` (12 min-aggs, 4 UNION ALL band rows).
    */
  private def minhashBandCte: String = {
    val mins = (0 until 12).map(k =>
      s"MIN(md5('$k:' || s)) AS mh$k").mkString(", ")
    val bandRows = (0 until 4).map { b =>
      val key = (0 until 3).map(r => s"mh${b * 3 + r}").mkString(" || '|' || ")
      s"SELECT doc_id, $b AS band, md5($key) AS bkey FROM m"
    }.mkString("\n  UNION ALL ")
    // NOTE: this CTE is interpolated into oracles that call stripMargin
    // on the COMPOSED string, so no content line may begin (after
    // whitespace) with '|' — a second strip would eat it. Hence the
    // trailing-|| line break below.
    s"""WITH t AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(string_split(text,' ')) - 1),
       |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] ||
       |         ' ' || string_split(text,' ')[i+2])) AS sh
       |  FROM documents
       |  WHERE doc_id < 1000 AND len(string_split(text,' ')) >= 3),
       |g AS (SELECT doc_id, unnest(sh) AS s FROM t),
       |m AS (SELECT doc_id, $mins FROM g GROUP BY doc_id),
       |b AS (
       |  $bandRows)""".stripMargin
  }

  /** q107 oracle: the same md5-min signature + banding, spelled in
    * DuckDB, self-joined on (band, bkey).
    */
  private val minhashPortableOracle: String =
    s"""$minhashBandCte
       |SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
       |  CAST(COUNT(*) AS BIGINT) AS shared_bands
       |FROM b a JOIN b b2
       |  ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
       |GROUP BY a.doc_id, b2.doc_id
       |ORDER BY id_a, id_b""".stripMargin

  /** q159 oracle: q107's candidate CTE (MATERIALIZED — referenced four
    * times downstream), then signature-match counting and exact-Jaccard
    * sizing mirrored clause-for-clause.
    */
  private val minhashCalibOracle: String = {
    val matchExpr = (0 until 12)
      .map(k => s"(CASE WHEN ma.mh$k = mb.mh$k THEN 1 ELSE 0 END)")
      .mkString(" + ")
    s"""$minhashBandCte,
       |cand AS MATERIALIZED (
       |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
       |    CAST(COUNT(*) AS BIGINT) AS shared_bands
       |  FROM b a JOIN b b2
       |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
       |  GROUP BY a.doc_id, b2.doc_id),
       |mm AS (
       |  SELECT c.id_a, c.id_b, CAST($matchExpr AS BIGINT) AS matches
       |  FROM cand c
       |  JOIN m ma ON ma.doc_id = c.id_a
       |  JOIN m mb ON mb.doc_id = c.id_b),
       |sz AS (SELECT doc_id, COUNT(*) AS n FROM g GROUP BY doc_id),
       |inter AS (
       |  SELECT c.id_a, c.id_b, COUNT(*) AS i
       |  FROM cand c
       |  JOIN g ga ON ga.doc_id = c.id_a
       |  JOIN g gb ON gb.doc_id = c.id_b AND gb.s = ga.s
       |  GROUP BY c.id_a, c.id_b)
       |SELECT c.id_a, c.id_b, c.shared_bands, mm.matches,
       |  CAST(ROUND(CAST(COALESCE(i.i, 0) AS DOUBLE)
       |       / (sa.n + sb.n - COALESCE(i.i, 0)) * 10000) AS BIGINT) AS j_e4
       |FROM cand c
       |JOIN mm ON mm.id_a = c.id_a AND mm.id_b = c.id_b
       |JOIN sz sa ON sa.doc_id = c.id_a
       |JOIN sz sb ON sb.doc_id = c.id_b
       |LEFT JOIN inter i ON i.id_a = c.id_a AND i.id_b = c.id_b
       |ORDER BY c.id_a, c.id_b""".stripMargin
  }

  /** q122 oracle: same banding CTE, joined strictly bipartite
    * (odd incoming × even reference).
    */
  private val crossCorpusOracle: String =
    s"""$minhashBandCte
       |SELECT inc.doc_id AS inc_id, ref.doc_id AS ref_id,
       |  CAST(COUNT(*) AS BIGINT) AS shared_bands
       |FROM b inc JOIN b ref
       |  ON inc.band = ref.band AND inc.bkey = ref.bkey
       |WHERE inc.doc_id % 2 = 1 AND ref.doc_id % 2 = 0
       |GROUP BY inc.doc_id, ref.doc_id
       |ORDER BY inc_id, ref_id""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // q65's candidate CTE + q66's cosine threshold (both membership
    // tests canonical-integer-decided), exact counts, one mirrored
    // Jaccard division.
    "q321_dedup_signal_overlap" ->
      s"""${simhashCandCte()},
         |tp AS (SELECT id_a AS a, id_b AS b FROM cand
         |       WHERE bit_count(xor(ha, hb)) <= 2),
         |ep AS (
         |  SELECT x.vec_id AS a, y.vec_id AS b
         |  FROM embeddings x JOIN embeddings y
         |    ON x.label = y.label AND x.vec_id < y.vec_id
         |  WHERE x.vec_id < 1000 AND y.vec_id < 1000
         |    AND CAST(ROUND(list_cosine_similarity(
         |          CAST(x.embedding AS DOUBLE[]),
         |          CAST(y.embedding AS DOUBLE[])) * 100) AS BIGINT) >= 30),
         |f AS (
         |  SELECT CASE WHEN t.a IS NOT NULL THEN 1 ELSE 0 END AS t,
         |         CASE WHEN e.a IS NOT NULL THEN 1 ELSE 0 END AS e
         |  FROM tp t FULL OUTER JOIN ep e ON t.a = e.a AND t.b = e.b)
         |SELECT CAST(COALESCE(SUM(t), 0) AS BIGINT) AS n_text_pairs,
         |       CAST(COALESCE(SUM(e), 0) AS BIGINT) AS n_embed_pairs,
         |       CAST(COALESCE(SUM(t * e), 0) AS BIGINT) AS n_both,
         |       CASE WHEN COUNT(*) > 0 THEN
         |         CAST(ROUND(CAST(SUM(t * e) AS DOUBLE)
         |           / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT)
         |       END AS jaccard_e6
         |FROM f""".stripMargin,
    // q65's candidate CTE + the canonical triangle join; exact
    // edge/doubled-wedge/3T integers, one mirrored division e6.
    "q319_neardup_transitivity" ->
      s"""${simhashCandCte()},
         |e AS (SELECT id_a AS a, id_b AS b FROM cand
         |      WHERE bit_count(xor(ha, hb)) <= 2),
         |deg AS (
         |  SELECT id, CAST(COUNT(*) AS BIGINT) AS deg FROM (
         |    SELECT a AS id FROM e UNION ALL SELECT b FROM e)
         |  GROUP BY id),
         |w2 AS (SELECT CAST(COALESCE(SUM(deg * (deg - 1)), 0) AS BIGINT)
         |         AS w2 FROM deg),
         |tri AS (
         |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
         |  FROM e e1
         |  JOIN e e2 ON e2.a = e1.b
         |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b),
         |t3 AS (SELECT CAST(COUNT(*) * 3 AS BIGINT) AS tri3 FROM tri),
         |ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM e)
         |SELECT n_edges, w2 // 2 AS wedges, tri3 // 3 AS triangles,
         |       CASE WHEN w2 > 0 THEN
         |         CAST(ROUND(2.0 * CAST(tri3 AS DOUBLE) / CAST(w2 AS DOUBLE)
         |           * 1000000) AS BIGINT) END AS trans_e6
         |FROM ne CROSS JOIN w2 CROSS JOIN t3""".stripMargin,
    "q55_exact_dedup" ->
      """SELECT source, COUNT(*) AS docs, COUNT(DISTINCT md5(text)) AS distinct_docs
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,
    // Same md5-prefix 40-bit hashes, same packed (hash, pos) window
    // minimum; zipped UNNESTs align shingle and 0-based position.
    "q240_winnowing" ->
      """WITH toks AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |sh AS (
        |  SELECT doc_id,
        |    UNNEST(list_transform(range(1, len(ws) - 1), i ->
        |      concat_ws(' ', ws[i], ws[i+1], ws[i+2]))) AS sh,
        |    UNNEST(range(0, len(ws) - 2)) AS pos
        |  FROM toks WHERE len(ws) >= 3),
        |p AS (
        |  SELECT doc_id, pos,
        |    CAST(('0x' || substr(md5(sh), 1, 10)) AS BIGINT) AS h40,
        |    CAST(('0x' || substr(md5(sh), 1, 10)) AS BIGINT) * 8388608 + pos
        |      AS packed
        |  FROM sh),
        |wm AS (
        |  SELECT doc_id, pos, h40, packed,
        |    MIN(packed) OVER (PARTITION BY doc_id ORDER BY pos
        |                      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wmin
        |  FROM p)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles,
        |  CAST(SUM(CASE WHEN packed = wmin THEN 1 ELSE 0 END) AS BIGINT) AS n_fp,
        |  CAST(COUNT(DISTINCT CASE WHEN packed = wmin THEN h40 END) AS BIGINT)
        |    AS n_fp_distinct
        |FROM wm GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q56_dedup_keep_first" ->
      """SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)
        |ORDER BY keep_id""".stripMargin,
    // q57_minhash_neardup: rows-only (spark.ml hash family).
    "q58_ngram_jaccard" ->
      """WITH s AS (
        |  SELECT doc_id,
        |    list_distinct(string_split(text,' ')) AS w1,
        |    list_distinct(list_transform(range(1, len(string_split(text,' ')) - 1),
        |      i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] || ' ' || string_split(text,' ')[i+2])) AS w3
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  ROUND(CAST(len(list_intersect(a.w1, b.w1)) AS DOUBLE)
        |        / NULLIF(CAST(len(list_distinct(a.w1 || b.w1)) AS DOUBLE), 0), 4) AS jaccard1,
        |  ROUND(CAST(len(list_intersect(a.w3, b.w3)) AS DOUBLE)
        |        / NULLIF(CAST(len(list_distinct(a.w3 || b.w3)) AS DOUBLE), 0), 4) AS jaccard3
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,
    "q59_simhash" -> simhashOracle,
    "q65_simhash_neardup" -> simhashNearDupOracle,
    "q94_band_rescore" -> bandRescoreOracle,
    "q107_minhash_portable" -> minhashPortableOracle,
    // q107's band CTE, source dimension joins, unordered cell keys,
    // one mirrored mean-strength division per cell.
    "q402_source_leakage" ->
      s"""$minhashBandCte,
         |cand AS (
         |  SELECT a.doc_id AS id_a, b2.doc_id AS id_b,
         |    CAST(COUNT(*) AS BIGINT) AS shared_bands
         |  FROM b a JOIN b b2
         |    ON a.band = b2.band AND a.bkey = b2.bkey AND a.doc_id < b2.doc_id
         |  GROUP BY a.doc_id, b2.doc_id)
         |SELECT LEAST(da.source, db.source) AS source_a,
         |       GREATEST(da.source, db.source) AS source_b,
         |       CAST(COUNT(*) AS BIGINT) AS n_pairs,
         |       CAST(SUM(c.shared_bands) AS BIGINT) AS shared_bands,
         |       CAST(ROUND(CAST(SUM(c.shared_bands) AS DOUBLE) / COUNT(*)
         |                  * 10000) AS BIGINT) AS mean_bands_e4
         |FROM cand c
         |JOIN documents da ON da.doc_id = c.id_a
         |JOIN documents db ON db.doc_id = c.id_b
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q122_cross_corpus_neardup" -> crossCorpusOracle,
    "q159_minhash_calib" -> minhashCalibOracle,
    "q164_dedup_census" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS h FROM documents),
        |k AS (SELECT h, MIN(doc_id) AS keep_id FROM d GROUP BY h)
        |SELECT source, CAST(COUNT(*) AS BIGINT) AS docs,
        |  CAST(COUNT(DISTINCT d.h) AS BIGINT) AS distinct_contents,
        |  CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END) AS BIGINT)
        |    AS dropped,
        |  CAST(ROUND(CAST(SUM(CASE WHEN doc_id <> keep_id THEN 1 ELSE 0 END)
        |                   AS DOUBLE) / COUNT(*) * 10000) AS BIGINT) AS drop_e4
        |FROM d JOIN k USING (h)
        |GROUP BY source ORDER BY source""".stripMargin,
    // q129's segmentation, attributed: origin = (min doc_id, then min
    // pos) per duplicated segment hash, mirrored as a two-step min.
    "q165_copy_flow" ->
      """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
        |s AS (SELECT doc_id, source, unnest(range(1, len(ws) + 1, 16)) AS st, ws FROM t),
        |seg AS (SELECT doc_id, source, CAST((st - 1) / 16 AS BIGINT) AS pos,
        |               md5(array_to_string(ws[st:st+15], ' ')) AS h
        |        FROM s),
        |o1 AS (SELECT h, MIN(doc_id) AS origin_id FROM seg
        |       GROUP BY h HAVING COUNT(*) > 1),
        |o2 AS (SELECT o1.h, o1.origin_id, MIN(seg.pos) AS origin_pos
        |       FROM seg JOIN o1 ON seg.h = o1.h AND seg.doc_id = o1.origin_id
        |       GROUP BY o1.h, o1.origin_id),
        |os AS (SELECT o2.h, o2.origin_id, o2.origin_pos,
        |              seg.source AS origin_source
        |       FROM o2 JOIN seg ON seg.h = o2.h AND seg.doc_id = o2.origin_id
        |                        AND seg.pos = o2.origin_pos)
        |SELECT os.origin_source, seg.source AS copy_source,
        |  CAST(COUNT(*) AS BIGINT) AS copies
        |FROM seg JOIN os ON seg.h = os.h
        |WHERE NOT (seg.doc_id = os.origin_id AND seg.pos = os.origin_pos)
        |GROUP BY os.origin_source, seg.source
        |ORDER BY origin_source, copy_source""".stripMargin,
    "q128_fuzzy_pairs" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part)
        |SELECT a.name AS name_a, b.name AS name_b,
        |  CAST(levenshtein(a.name, b.name) AS BIGINT) AS dist
        |FROM names a JOIN names b ON a.name < b.name
        |WHERE levenshtein(a.name, b.name) BETWEEN 1 AND 3
        |ORDER BY name_a, name_b""".stripMargin,
    // DuckDB's jaro_winkler_similarity verified against the expression
    // on the classic vectors; both sides grid to e6 BEFORE the keep
    // decision.
    // Blocking audit mirrored: inverted-index truth join, the exact
    // integer 2·inter ≥ union decision, per-band pair arithmetic.
    "q261_blocking_quality" ->
      """WITH d AS (
        |  SELECT doc_id, list_distinct(string_split(text, ' ')) AS toks,
        |         n_chars // 100 AS band
        |  FROM documents WHERE doc_id < 300),
        |sizes AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS sz, band FROM d),
        |inv AS (SELECT doc_id, unnest(toks) AS w FROM d),
        |inter AS (
        |  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |         CAST(COUNT(*) AS BIGINT) AS inter
        |  FROM inv a JOIN inv b ON a.w = b.w AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2),
        |truth AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS truth_pairs,
        |         CAST(COALESCE(SUM(CASE WHEN sa.band = sb.band
        |                                THEN 1 ELSE 0 END), 0) AS BIGINT)
        |           AS caught_pairs
        |  FROM inter
        |  JOIN sizes sa ON inter.id_a = sa.doc_id
        |  JOIN sizes sb ON inter.id_b = sb.doc_id
        |  WHERE 2 * inter >= sa.sz + sb.sz - inter),
        |totals AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         CAST(COUNT(*) * (COUNT(*) - 1) // 2 AS BIGINT) AS total_pairs
        |  FROM d),
        |cand AS (
        |  SELECT CAST(COALESCE(SUM(c * (c - 1) // 2), 0) AS BIGINT)
        |           AS cand_pairs
        |  FROM (SELECT COUNT(*) AS c FROM d GROUP BY band))
        |SELECT n_docs, total_pairs, truth_pairs, cand_pairs, caught_pairs,
        |       CASE WHEN truth_pairs > 0
        |            THEN CAST(ROUND(CAST(caught_pairs AS DOUBLE)
        |                            / CAST(truth_pairs AS DOUBLE) * 10000)
        |                      AS BIGINT) END AS pc_e4,
        |       CAST(ROUND((1.0 - CAST(cand_pairs AS DOUBLE)
        |                   / CAST(total_pairs AS DOUBLE)) * 10000) AS BIGINT)
        |         AS rr_e4
        |FROM totals CROSS JOIN truth CROSS JOIN cand""".stripMargin,
    // Fellegi-Sunter mirrored with the SAME e6 ln-ratio literals; the
    // only float is DuckDB's own jaro_winkler_similarity, gridded
    // before the agree decision exactly like the Spark side.
    "q257_fellegi_sunter" ->
      """WITH prof AS (
        |  SELECT p_name AS name, p_brand AS brand, p_type AS ptype,
        |         p_size AS size, CAST(COUNT(*) AS BIGINT) AS cnt,
        |         string_split(p_name, ' ')[2] AS w,
        |         p_name || '|' || p_brand || '|' || p_type || '|' ||
        |           CAST(p_size AS VARCHAR) AS k
        |  FROM part GROUP BY 1, 2, 3, 4),
        |pairs AS (
        |  SELECT a.w,
        |    (CASE WHEN CAST(ROUND(jaro_winkler_similarity(a.name, b.name)
        |                          * 1000000) AS BIGINT) >= 880000
        |          THEN 2890372 ELSE -2251292 END
        |     + CASE WHEN a.brand = b.brand THEN 3167583 ELSE -2954910 END
        |     + CASE WHEN a.ptype = b.ptype THEN 1386294 ELSE -1386294 END
        |     + CASE WHEN ABS(a.size - b.size) <= 2 THEN 2140066
        |            ELSE -1791759 END) AS wt,
        |    a.cnt * b.cnt AS rec_pairs
        |  FROM prof a JOIN prof b ON a.w = b.w AND a.k < b.k)
        |SELECT w,
        |       CASE WHEN wt >= 5000000 THEN 'match'
        |            WHEN wt >= 0 THEN 'possible'
        |            ELSE 'nonmatch' END AS decision,
        |       CAST(COUNT(*) AS BIGINT) AS n_profile_pairs,
        |       CAST(SUM(rec_pairs) AS BIGINT) AS n_record_pairs,
        |       CAST(MIN(wt) AS BIGINT) AS min_wt,
        |       CAST(MAX(wt) AS BIGINT) AS max_wt
        |FROM pairs GROUP BY 1, 2
        |ORDER BY w, decision""".stripMargin,
    "q252_jw_match" ->
      """WITH names AS (SELECT DISTINCT p_name AS name FROM part),
        |t AS (SELECT name, string_split(name, ' ')[1] AS w FROM names)
        |SELECT a.w, a.name AS name_a, b.name AS name_b,
        |       CAST(ROUND(jaro_winkler_similarity(a.name, b.name) * 1000000)
        |            AS BIGINT) AS jw_e6
        |FROM t a JOIN t b ON a.w = b.w AND a.name < b.name
        |WHERE CAST(ROUND(jaro_winkler_similarity(a.name, b.name) * 1000000)
        |           AS BIGINT) >= 880000
        |ORDER BY a.w, name_a, name_b""".stripMargin,
    // Same segment frame as q129's oracle; verdict at >= 3 distinct
    // docs; one integer division e6-gridded.
    "q269_boilerplate" ->
      """WITH t AS (SELECT source, doc_id, string_split(text, ' ') AS ws
        |           FROM documents),
        |s AS (SELECT source, doc_id, ws,
        |             unnest(range(1, len(ws) + 1, 16)) AS st FROM t),
        |seg AS (
        |  SELECT source, doc_id,
        |    md5(array_to_string(
        |      list_slice(ws, st, LEAST(st + 15, len(ws))), ' ')) AS h
        |  FROM s),
        |d AS (SELECT h, COUNT(DISTINCT doc_id) AS n_docs
        |      FROM seg GROUP BY h)
        |SELECT seg.source, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(CASE WHEN d.n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_bp_segs,
        |  CAST(COUNT(DISTINCT CASE WHEN d.n_docs >= 3 THEN seg.h END)
        |       AS BIGINT) AS n_bp_shapes,
        |  CAST(ROUND(CAST(SUM(CASE WHEN d.n_docs >= 3 THEN 1 ELSE 0 END)
        |                  AS DOUBLE)
        |             / CAST(COUNT(*) AS DOUBLE) * 1000000) AS BIGINT) AS bp_e6
        |FROM seg JOIN d ON seg.h = d.h
        |GROUP BY seg.source
        |ORDER BY seg.source""".stripMargin,
    "q129_segment_dedup" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |s AS (SELECT doc_id, ws, unnest(range(1, len(ws) + 1, 16)) AS st FROM t),
        |seg AS (
        |  SELECT doc_id, st,
        |    array_to_string(list_slice(ws, st, LEAST(st + 15, len(ws))), ' ') AS seg
        |  FROM s),
        |d AS (SELECT md5(seg) AS h, COUNT(DISTINCT doc_id) AS n_docs
        |      FROM seg GROUP BY md5(seg))
        |SELECT seg.doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs,
        |  CAST(SUM(CASE WHEN d.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_segs,
        |  md5(COALESCE(string_agg(CASE WHEN d.n_docs <= 1 THEN seg.seg END, ' '
        |                          ORDER BY seg.st), '')) AS clean_fp
        |FROM seg JOIN d ON md5(seg.seg) = d.h
        |GROUP BY seg.doc_id
        |ORDER BY seg.doc_id""".stripMargin,
    "q132_containment" ->
      """WITH s AS (
        |  SELECT doc_id, list_distinct(string_split(text,' ')) AS w1
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |  CAST(ROUND(CAST(len(list_intersect(a.w1, b.w1)) AS DOUBLE)
        |        / NULLIF(CAST(len(a.w1) AS DOUBLE), 0.0) * 10000) AS BIGINT) AS cont_ab_e4,
        |  CAST(ROUND(CAST(len(list_intersect(b.w1, a.w1)) AS DOUBLE)
        |        / NULLIF(CAST(len(b.w1) AS DOUBLE), 0.0) * 10000) AS BIGINT) AS cont_ba_e4,
        |  CAST(CASE WHEN GREATEST(
        |      CAST(ROUND(CAST(len(list_intersect(a.w1, b.w1)) AS DOUBLE)
        |            / NULLIF(CAST(len(a.w1) AS DOUBLE), 0.0) * 10000) AS BIGINT),
        |      CAST(ROUND(CAST(len(list_intersect(b.w1, a.w1)) AS DOUBLE)
        |            / NULLIF(CAST(len(b.w1) AS DOUBLE), 0.0) * 10000) AS BIGINT)) >= 9000
        |    THEN 1 ELSE 0 END AS BIGINT) AS contained
        |FROM s a JOIN s b ON b.doc_id = a.doc_id + 1
        |ORDER BY id_a""".stripMargin,
  )
}
