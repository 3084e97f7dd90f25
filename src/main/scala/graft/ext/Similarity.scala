package graft.ext

import java.security.MessageDigest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Similarity search over the `embeddings` table (SURVEY §2.4):
  * brute-force cosine top-k as the exactness baseline, and a
  * deterministic random-hyperplane LSH variant as the scale path
  * (bucket-local join, never all-pairs).
  *
  * All arithmetic is done in DOUBLE after widening the float32 vectors:
  * both engines then agree to the last ulp modulo summation order.
  * Every declared output is INTEGER-SCALED (the q117 integer-cents
  * pattern: `CAST(ROUND(sim * 100) AS BIGINT)`) rather than a ROUND'd
  * DOUBLE — Spark (BigDecimal HALF_UP) and DuckDB (multiply/round/
  * divide) can land 1 ulp apart on the same rounded double, which is
  * equal at 1e-9 but unequal under the driver's strict hash (r4's
  * q61/q112 reds). Integers have one representation; margins to the
  * nearest half-boundary are verified ≫ cross-engine drift.
  */
object Similarity {

  private def emb(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "embeddings")

  /** float32 vector → double vector (widen BEFORE any arithmetic). */
  def asDouble(v: Column): Column = transform(v, _.cast("double"))

  /** Native fused-loop dot product ([[graft.ops.DotProduct]]): the
    * higher-order `aggregate(zip_with(...))` formulation interprets two
    * lambdas per element — at N×K pairs × 64 dims that was the hot loop
    * of every similarity query.
    */
  def dot(a: Column, b: Column): Column = graft.ops.DotProduct(a, b)

  def l2Norm(v: Column): Column = sqrt(dot(v, v))

  /** Add a normalized-embedding column once; cosine then reduces to a
    * plain dot of unit vectors (norms are not recomputed per pair —
    * at N×K pair counts that would be the dominant waste).
    *
    * Two projection steps on purpose: the norm is materialized as its
    * own column first, so the division lambda reads a bound reference
    * instead of re-deriving the norm per element.
    */
  def withUnitVec(df: DataFrame, vecCol: String, out: String): DataFrame =
    df.withColumn("__dv", asDouble(col(vecCol)))
      .withColumn("__norm", l2Norm(col("__dv")))
      .withColumn(out, transform(col("__dv"), x => x / col("__norm")))
      .drop("__dv", "__norm")

  /** Deterministic ±1 hyperplanes: sign p,d from the md5 of "p:d".
    * Engine- and run-independent (no RNG), so LSH buckets are
    * reproducible anywhere.
    */
  def hyperplanes(planes: Int, dims: Int): Array[Array[Double]] = {
    val md = MessageDigest.getInstance("MD5")
    Array.tabulate(planes, dims) { (p, d) =>
      val h = md.digest(s"$p:$d".getBytes("UTF-8"))
      if ((h(0) & 0x80) != 0) 1.0 else -1.0
    }
  }

  /** 8-bit LSH signature of a double vector under [[hyperplanes]]. */
  def signature(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (h, p) =>
      when(dot(v, typedlit(h.toSeq)) > 0, 1L << p).otherwise(0L)
    }.reduce(_ + _)

  /** Integer-scale a double for oracle-checked output:
    * `CAST(ROUND(x * scale) AS BIGINT)`. Half-up in both engines
    * (away-from-zero on negatives in Spark's BigDecimal HALF_UP and
    * DuckDB's ROUND alike); one representation, hash-stable.
    */
  def intScaled(x: Column, scale: Long): Column =
    round(x * scale, 0).cast("long")

  // ---- declared queries ---------------------------------------------------

  /** Brute-force cosine top-5 for query vectors vec_id < 50. Output is
    * (qid, did, sim) sorted by ids — NOT by rank — so adjacent-rank
    * near-ties cannot reorder rows across engines; only top-5 MEMBERSHIP
    * matters, and the rank-5/6 margin is ≫ float drift (measured
    * 8.6e-5 vs 1e-15).
    */
  def q60(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
    // The query side is 50 rows by construction — broadcast is a
    // structural guarantee here, not a size guess.
    val q = broadcast(unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu")))
    val d = unit.select(col("vec_id").as("did"), col("u").as("du"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    q.join(d)
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("qid"), col("did"), intScaled(col("sim"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** LSH-bucketed ANN top-3: vectors meet only inside their 8-bit
    * signature bucket, so the pair count is sum of squared bucket sizes
    * — at 100 TB, with more planes and multiprobe, this is the only
    * shape that survives; the all-pairs plan of q60 does not.
    *
    * Oracle-checked since round 4: the ±1 hyperplanes are
    * deterministic md5 constants, so the oracle embeds them as literal
    * arrays and independently recomputes unit vectors, signatures,
    * bucket joins, and ranks (previously rows-only).
    */
  /** Top-3 selection runs through [[graft.ops.TopKByScore]] (bounded
    * heap, map-side partial) rather than a window `row_number`: the
    * candidate stream never sorts through the shuffle — each map task
    * ships ≤ 3 entries per query. Same total order (sim DESC, did ASC),
    * hash-certified by the unchanged window-form oracle.
    */
  def q61(s: SparkSession, dir: String): DataFrame = {
    val planes = hyperplanes(8, 64)
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), signature(col("u"), planes).as("sig"))
    val q = unit.select(col("vec_id").as("qid"), col("u").as("qu"), col("sig"))
      .filter(col("qid") < 50)
    val d = unit.select(col("vec_id").as("did"), col("u").as("du"), col("sig"))
    q.join(d, "sig") // bucket-local equi-join, shuffles on sig only
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .groupBy(col("qid"))
      .agg(graft.ops.TopKByScore.topK(col("sim"), col("did"), 3).as("top"))
      .select(col("qid"), explode(col("top")).as("t"))
      .select(col("qid"), col("t.id").as("did"),
        intScaled(col("t.score"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** IVF-style ANN: candidates restricted to the query's coarse cell —
    * here the provided `label` column stands in for the quantizer
    * assignment (a real IVF trains centroids; the search shape is
    * identical: equi-join on cell id, rank within cell). Exactly
    * oracle-expressible, unlike trained-centroid IVF.
    */
  def q64(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), col("label"))
    val q = unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("label"))
    val d = unit.select(col("vec_id").as("did"), col("u").as("du"), col("label"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    q.join(d, "label") // cell-local equi-join — the IVF probe shape
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("did"), intScaled(col("sim"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** Persist the IVF INVERTED LISTS: the unit vectors re-landed
    * parquet-PARTITIONED BY the coarse cell (`label`) — the on-disk
    * form of an IVF index, where "probe a cell" is literally "list
    * only that cell's directory". One reorganizing write per index
    * lifetime; q422 then reads back only the probed cells.
    */
  private[graft] def ensureIvfStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "ivf", dir) { root =>
      withUnitVec(emb(s, dir), "embedding", "u")
        .select(col("vec_id"), col("u"), col("label"))
        .write.mode("overwrite").partitionBy("label").parquet(root)
      root
    }

  /** q422 — ANN probe against the PERSISTED IVF index: q64's
    * cell-local top-3 search, but the database side reads the
    * [[ensureIvfStore]] inverted lists and the broadcast query side's
    * cells prune the scan DYNAMICALLY — the physical plan carries a
    * `dynamicpruning` PartitionFilter on `label`, so only the probed
    * cells' files are ever listed (Round15Spec pins the plan and that
    * the probe set touches a strict subset of the cells — 4-5 of 10 at
    * the gate SFs, so the pruning BINDS). This is the missing
    * lifecycle leg of the ANN family: q64 certifies the search shape,
    * q358 the nprobe recall trade, q421 the centroid training state —
    * this certifies the INDEX AS A STORE, where index-once/query-many
    * is the entire economics of ANN at 100 TB (a query over a 100 TB
    * vector corpus scans nprobe/ncells of it, at the file listing, not
    * after a full scan).
    *
    * Exactness: the store holds Spark's unit doubles (parquet
    * round-trips them bit-exactly); the oracle recomputes cosine from
    * raw embeddings — the q64-certified equivalence — and the e2 sim
    * grid carries q64's measured margins.
    */
  def q422(s: SparkSession, dir: String): DataFrame =
    ivfStoreProbe(s, dir, ensureIvfStore(s, dir))

  /** The q422 probe shape against any IVF-layout store root. */
  private def ivfStoreProbe(
      s: SparkSession, dir: String, root: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = withUnitVec(emb(s, dir), "embedding", "u")
      .filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("label"))
    val d = s.read.parquet(root)
      .select(col("vec_id").as("did"), col("u").as("du"), col("label"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    q.join(d, "label")
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("did"), intScaled(col("sim"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** The TWO-GENERATION IVF landing behind q426: the even-id vectors
    * land as the index build; the odd-id vectors land with
    * `mode("append")` into the SAME label partitions — the daily
    * embedding batch folded into the inverted lists without a rebuild
    * (each cell directory simply gains the new generation's files;
    * partition discovery and DPP see both).
    */
  private[graft] def ensureIvfAppendStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "ivf2", dir) { root =>
      val unit = withUnitVec(emb(s, dir), "embedding", "u")
        .select(col("vec_id"), col("u"), col("label"))
      unit.filter(col("vec_id") % 2 === 0)
        .write.mode("overwrite").partitionBy("label").parquet(root)
      unit.filter(col("vec_id") % 2 === 1)
        .write.mode("append").partitionBy("label").parquet(root)
      root
    }

  /** q426 — ANN probe against the INCREMENTALLY-MAINTAINED IVF index:
    * q422's cell-local top-3 search, but the store was built in two
    * generations ([[ensureIvfAppendStore]] — initial build + an
    * appended batch), so a hash match against the from-raw oracle
    * certifies APPEND ≡ REBUILD: no vector lost, duplicated, or
    * mis-celled across the append, and the probe's top-3 genuinely
    * draws from both generations (Round16Spec pins that bindingness:
    * 3-5 of the 5 probes mix parities in their top-3 at every SF).
    * Completes the index's incremental-maintenance story beside q421
    * (centroid state) and q422 (index-as-store): at 100 TB the nightly
    * embedding batch assigns cells map-side and appends bytes-per-
    * vector files — the index is never rebuilt and never rescanned.
    */
  def q426(s: SparkSession, dir: String): DataFrame =
    ivfStoreProbe(s, dir, ensureIvfAppendStore(s, dir))

  /** RE-QUANTIZE an IVF index at ncells ≈ √N (r16 verdict item 1 —
    * the one measured non-flat store row): the fixture stores (q422/
    * q426) inherit the dataset's 10 labels as cells, so probed-cell
    * row count grows LINEARLY with the corpus (`ivf_store_probe` 1.5×
    * at 100×). The production maintenance job re-fits the coarse
    * quantizer as the corpus grows and re-lands the inverted lists:
    * with ncells ~ √N, a probe touches nprobe·√N rows — flat in
    * practice at any tier (the `ivf_requant_probe` audit row measures
    * exactly that). q422/q426 and their stores are untouched; this is
    * the periodic re-size path beside them.
    *
    * Mechanics, all k-means machinery this library already certifies:
    *  - ncells = ⌊√N⌋; the quantizer trains on a DETERMINISTIC sample
    *    (vec_id % m == 0, m sized for ~`sampleCap` vectors — no RNG,
    *    rerun-stable) with `lloydRounds` of [[kmeansCentroidRound]]
    *    from the sample's lowest-id seeds.
    *  - Final assignment is ONE broadcast pass: (vec_id, cid, sim)
    *    scored against the ≤√N-row centroid broadcast and reduced by a
    *    map-side `max_by` partial agg (ties impossible — the ordering
    *    struct carries -cid), never a window over the N×k pair stream.
    *  - TWO-LEVEL layout: one directory PER CELL would put O(√N)
    *    directories under the root, and a fresh probe's partition
    *    discovery pays a listing per directory — measured ~1 s warm at
    *    707 dirs, dwarfing the 3.5k rows it prunes down to (the
    *    small-files problem reborn inside the fix). Cells are instead
    *    packed `cellsPerDir` to a directory (`grp = hash(cell) mod
    *    ndirs`, ndirs = ⌈ncells/cellsPerDir⌉): listing is O(√N/g)
    *    directories and a probe reads O(g·√N) rows — every component
    *    of probe cost is Θ(√N), with no cached-file-index assumption.
    *    One file per directory (`repartition(grp)`).
    *
    * Layout under `root`: `cells/` ((vec_id, u, cell), partitioned by
    * `grp`), `centroids/` (cid, cu — the quantizer state a prober and
    * the next incremental append both read; the q421 store contract),
    * and `meta/` (the one-row ndirs a prober needs to re-derive grp).
    *
    * @return the trained cell count (≤ ncells — Lloyd may retire
    *         empty cells)
    */
  def requantizeIvf(
      unit: DataFrame,
      root: String,
      sampleCap: Int = 20000,
      lloydRounds: Int = 2,
      cellsPerDir: Int = 32): Int = {
    val s = unit.sparkSession
    val n = unit.count()
    require(n > 0, "requantizeIvf: empty vector corpus")
    val ncells = math.max(1, math.sqrt(n.toDouble).toInt)
    val m = math.max(1L, n / sampleCap)
    // Cache ONLY the training sample (≤ sampleCap rows): the Lloyd
    // loop re-reads it 2× per round, and each uncached re-read would
    // re-scan and re-normalize the whole corpus through the filter.
    // Caching the full CORPUS instead was measured slower — the
    // columnar cache encode/decode on 64-double arrays outweighs the
    // scans it saves (and pins the job's largest frame in executor
    // storage). The corpus streams uncached through its remaining
    // passes (count above, the final assignment, the landing join);
    // the sample cache is released before returning.
    val sample = unit.filter(col("vec_id") % m === 0)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      var seeds = sample.orderBy("vec_id").limit(ncells)
        .select(col("vec_id").as("cid"), col("u").as("cu"))
        .localCheckpoint(true)
      (1 to lloydRounds).foreach { _ =>
        seeds = kmeansCentroidRound(sample, seeds).localCheckpoint(true)
      }
      seeds.write.mode("overwrite").parquet(s"$root/centroids")
    } finally sample.unpersist(false)
    val cents = s.read.parquet(s"$root/centroids")
    val ndirs = math.max(1, (ncells + cellsPerDir - 1) / cellsPerDir)
    import s.implicits._
    Seq(ndirs).toDF("ndirs").write.mode("overwrite").parquet(s"$root/meta")
    val assigned = assignCells(unit, cents)
    unit.join(assigned, "vec_id")
      .select(col("vec_id"), col("u"), col("cell"),
        pmod(hash(col("cell")), lit(ndirs)).as("grp"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("cell"))
      .write.mode("overwrite").partitionBy("grp").parquet(s"$root/cells")
    cents.count().toInt
  }

  /** q431 — the re-quantized IVF store IN THE GATE: [[requantizeIvf]]
    * run once per session on the embeddings corpus (ncells = ⌊√N⌋,
    * deterministic sample, two Lloyd rounds of the q421-certified
    * centroid arithmetic, two-level grouped layout), then the
    * [[ivfRequantProbe]] cell-local top-3 for the five probe vectors.
    * The oracle replays the WHOLE chain from raw embeddings — sample,
    * seeds, both Lloyd rounds, final assignment, and the within-cell
    * rank — so a hash match certifies training ∘ re-landing ∘ grouped
    * probe ≡ the from-scratch derivation, cross-engine. The q422/q426
    * fixture stores certify the index-as-store lifecycle at fixed
    * cells; this certifies the MAINTENANCE path that re-sizes the
    * quantizer as the corpus grows (SCALE.md r17: probe flat at 100×
    * only after the re-size).
    *
    * Float discipline: assignments rank on ROUND(sim, 6) (the q112/
    * q421 rule) and the output sims ride the e2 grid; Round17Spec pins
    * the measured assignment-boundary and rank-3/4 margins ≫ drift.
    */
  def q431(s: SparkSession, dir: String): DataFrame = {
    val root = graft.StoreLifecycle.ensure(s, "ivfrq", dir) { r =>
      requantizeIvf(
        withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u"), r)
      r
    }
    ivfRequantProbe(
      withUnitVec(emb(s, dir), "embedding", "u")
        .filter(col("vec_id") < 5).select("vec_id", "u"),
      root)
  }

  /** Nearest-centroid cell per vector — the SLIM assignment pass:
    * score rows carry (vec_id, cid, sim) only (never the 64-double
    * vector through the N×k fan-out) and reduce with a map-side
    * `max_by` partial agg instead of a per-vector rank window (which
    * would sort the whole pair stream through a shuffle). Ties broken
    * to the lowest cid on the e6-rounded sim (the [[assignToSeeds]]
    * rule) via the (-cid) component — deterministic by construction.
    */
  private def assignCells(
      unit: DataFrame,
      cents: DataFrame,
      broadcastVectors: Boolean = false): DataFrame = {
    // The landing broadcasts the ≤√N centroids under the N-row vector
    // stream; a PROBE inverts that — its vector side is a literal-
    // bounded handful, so IT is the broadcast build side and the
    // centroid store streams (PlanAuditSpec's BNL net reads the bound
    // off the probe filter; a broadcast centroid READ would carry no
    // structural bound). The crossJoin is symmetric and max_by is
    // order-insensitive (ties impossible via -cid), so both pairings
    // compute the identical assignment.
    val paired =
      if (broadcastVectors) cents.withGlobalStats(unit.select(col("vec_id"), col("u")))
      else unit.select(col("vec_id"), col("u")).withGlobalStats(cents)
    paired
      .select(col("vec_id"), col("cid"),
        round(dot(col("u"), col("cu")), 6).as("sim"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"),
        struct(col("sim"), (-col("cid")).as("nc"))).as("cell"))
  }

  /** Fold a new vector batch into a [[requantizeIvf]] store WITHOUT
    * re-training: the batch assigns against the stored FROZEN quantizer
    * (centroids/ read back — the q421 state contract), derives `grp`
    * with the stored layout constant, and `mode("append")`s into the
    * same cells/ partitions. The q426 maintenance posture applied to
    * the re-sized index: between periodic re-quantizations, the
    * nightly batch appends bytes-per-vector files and the index is
    * never rebuilt or rescanned.
    */
  def appendToRequantStore(batch: DataFrame, root: String): Unit = {
    val s = batch.sparkSession
    val cents = s.read.parquet(s"$root/centroids")
    val ndirs = s.read.parquet(s"$root/meta").head().getInt(0)
    batch.join(assignCells(batch, cents), "vec_id")
      .select(col("vec_id"), col("u"), col("cell"),
        pmod(hash(col("cell")), lit(ndirs)).as("grp"))
      .repartition(col("grp"))
      .sortWithinPartitions(col("cell"))
      .write.mode("append").partitionBy("grp").parquet(s"$root/cells")
  }

  /** The two-generation RE-QUANTIZED store behind q434: the quantizer
    * trains on the even-id half only (the state of the index when the
    * last re-size ran), then the odd-id batch folds in through
    * [[appendToRequantStore]] against that frozen quantizer.
    */
  private[graft] def ensureIvfRequantAppendStore(
      s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "ivfrq2", dir) { root =>
      val unit = withUnitVec(emb(s, dir), "embedding", "u")
        .select("vec_id", "u")
      requantizeIvf(unit.filter(col("vec_id") % 2 === 0), root)
      appendToRequantStore(unit.filter(col("vec_id") % 2 === 1), root)
      root
    }

  /** q434 — the re-quantized index maintained by APPEND: q431 certifies
    * the re-size itself; this certifies that the nightly batch still
    * folds in AFTERWARDS without touching the quantizer — train on the
    * even half (⌊√N_even⌋ cells), freeze, assign + append the odd
    * batch into the same grp partitions, probe through the grouped DPP
    * prune. The oracle replays the WHOLE chain from raw embeddings with
    * the training restricted to the even half and the FINAL assignment
    * over every vector — a hash match certifies train ∘ freeze ∘
    * append ∘ grouped probe ≡ the from-scratch derivation, i.e. append
    * ≡ rebuild-under-the-frozen-quantizer (the honest contract between
    * re-sizes; a full re-train is q431's job, on its cadence).
    * Round17Spec pins mixed-generation top-3 bindingness (the probe
    * genuinely draws from both generations), store-vs-direct assignment
    * equality, and the full q431-style float-margin ladder against the
    * even-trained centroids.
    */
  def q434(s: SparkSession, dir: String): DataFrame =
    ivfRequantProbe(
      withUnitVec(emb(s, dir), "embedding", "u")
        .filter(col("vec_id") < 5).select("vec_id", "u"),
      ensureIvfRequantAppendStore(s, dir))

  /** q422's probe shape against a [[requantizeIvf]] store: the query
    * vectors assign to their trained cell (the bounded probe set is
    * broadcast under the streamed centroid read), then the cell-local
    * top-3 join reads ONLY the
    * probed cells' directories (the q422 DPP posture — the cell filter
    * arrives as a dynamic PartitionFilter on the `cells/` scan).
    */
  def ivfRequantProbe(queries: DataFrame, root: String): DataFrame = {
    val s = queries.sparkSession
    val cents = s.read.parquet(s"$root/centroids")
    // One-row layout constant (the q411 literal-extraction precedent —
    // the grp derivation must match the landing's exactly).
    val ndirs = s.read.parquet(s"$root/meta").head().getInt(0)
    val q = queries.select(col("vec_id"), col("u"))
      .join(assignCells(queries, cents, broadcastVectors = true), "vec_id")
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("cell"),
        pmod(hash(col("cell")), lit(ndirs)).as("grp"))
    val d = s.read.parquet(s"$root/cells")
      .select(col("vec_id").as("did"), col("u").as("du"), col("cell"),
        col("grp"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    // The grp equi-key prunes directories dynamically (the q422 DPP
    // posture at the group level); the cell equi-key keeps the search
    // cell-local within the ≤ cellsPerDir cells a directory packs.
    q.join(d, Seq("grp", "cell"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("did"), intScaled(col("sim"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** Embedding-cosine near-dup machinery, cell-bounded: within each
    * coarse cell, count pairs above a similarity threshold and report
    * the cell's max similarity — the profile a dedup pass would use to
    * pick its threshold. (This corpus has no embedding near-dups — max
    * same-cell cosine ≈ 0.48 — so a thresholded pair LIST would be
    * empty; the profile certifies the same pair machinery with
    * non-trivial output. Threshold margin verified ≫ float drift.)
    */
  def q66(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), col("label"))
    // Probe side bounded (same contract as q65): without it the per-cell
    // pair count is O(cell²) — quadratic in one hot cell at 100 TB. The
    // bound caps pairs at `bound × cell_size` (linear in cell size); a
    // production near-dup pass would instead pre-split hot cells
    // (salting) or sample, but the declared query keeps the bound
    // oracle-expressible. No-op at sf0.01 (500 vectors), so the hash
    // row is unchanged.
    val a = unit.filter(col("vec_id") < 1000)
      .select(col("label"), col("vec_id").as("id_a"), col("u").as("ua"))
    val b = unit.select(col("label"), col("vec_id").as("id_b"), col("u").as("ub"))
    a.join(b, "label").filter(col("id_a") < col("id_b"))
      .select(col("label"), dot(col("ua"), col("ub")).as("sim"))
      .groupBy(col("label"))
      .agg(
        // Threshold on the integer-scaled sim, NOT the raw double: a
        // 1-ulp cross-engine drift at the 0.3 boundary would flip a
        // pair in one engine only and break the hash row. Both engines
        // compare the SAME canonical integer (round(sim*100) >= 30).
        sum(when(intScaled(col("sim"), 100) >= 30, 1L).otherwise(0L))
          .as("close_pairs"),
        intScaled(max(col("sim")), 100).as("max_sim_c"),
        count(lit(1)).as("pairs"))
      .orderBy("label")
  }

  /** Per-vector max-abs int8 quantization: scale = 127/max|x|, code =
    * floor(x*scale). The 4× storage/bandwidth compression every
    * large-scale ANN index applies before sharding; floor (not round)
    * because round's half-case tie-breaking differs across engines
    * while floor is universal. Dequant error ≤ 1/scale by construction.
    *
    * A DataFrame operator (not a Column pair) ON PURPOSE: the scale
    * must materialize in its own projection before the code lambda
    * references it — higher-order lambdas are interpreted, and an
    * inlined scale re-evaluates its array_max per ELEMENT (O(d²)/vec,
    * measured 3.5× at sf0.1). Appends `__qscale` and `q8`.
    */
  def quantizeInt8(df: DataFrame, vec: Column): DataFrame =
    df.withColumn("__e", asDouble(vec))
      // Zero-norm guard: 127/0 would be +Inf and the codes NaN-derived
      // garbage, silently. An all-zero vector instead gets a NULL scale
      // and all-zero codes (coalesce below) — dequantization is exact,
      // and downstream consumers can detect the degenerate scale.
      .withColumn("__qscale",
        lit(127.0) / nullif(array_max(transform(col("__e"), abs(_))), lit(0.0)))
      .withColumn("q8",
        transform(col("__e"), x => coalesce(floor(x * col("__qscale")), lit(0L))))
      .drop("__e")

  /** q100 — int8 quantization with its measured reconstruction error:
    * the quantized codes hash-match the oracle exactly (integer output
    * of identical double math), and the max dequantization error is
    * certified under the 1/scale bound.
    *
    * STAGED projections, one derived value per step: higher-order
    * lambdas are interpreted, so an inlined `scale` (itself an
    * array_max over a transform) would re-evaluate per ELEMENT —
    * O(d²) per vector, measured 2.5× slower at sf0.1. Same trap as
    * `Dedup.shingles3FromTokens` documents for split.
    */
  def q100(s: SparkSession, dir: String): DataFrame =
    quantizeInt8(
      emb(s, dir).select(col("vec_id"), col("embedding")), col("embedding"))
      .withColumn("__e", asDouble(col("embedding")))
      .select(
        col("vec_id"),
        // '|'-joined string, NOT an array column: the driver's pandas
        // sorter cannot hash numpy arrays (r4's q100 harness error).
        // Same sorted-join contract as q48/q109.
        concat_ws("|", col("q8").cast("array<string>")).as("q8"),
        intScaled(array_max(zip_with(col("__e"), col("q8"),
          (x, c) => abs(x - c / col("__qscale")))), 10000).as("max_err_e4"))
      .orderBy("vec_id")

  /** One Lloyd iteration of k-means: assign every vector to its nearest
    * seed centroid (max cosine on unit vectors, ties to the lowest
    * centroid id on ROUND(sim, 6) — the q106 trick, so a 1-ulp dot
    * drift can't flip an assignment across engines), then recompute
    * per-centroid means per dimension. This is the IVF coarse-quantizer
    * TRAINING kernel whose search shape q64 certifies.
    *
    * Scale shape: seeds broadcast (k rows — structurally bounded);
    * assignment is map-side; the only shuffles are the per-vector rank
    * (bounded by k candidates per vector) and the (centroid, dim)
    * mean agg — vectors are never collected. Iterating = calling this
    * in a driver loop over re-derived seeds (Components-style).
    */
  /** Nearest-seed assignment: (vec_id, u, cid). Seeds broadcast. */
  private def assignToSeeds(unit: DataFrame, seeds: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("vec_id").orderBy(col("sim").desc, col("cid"))
    unit.withGlobalStats(seeds)
      .select(col("vec_id"), col("u"), col("cid"),
        round(dot(col("u"), col("cu")), 6).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("u"), col("cid"))
  }

  def kmeansStep(unit: DataFrame, seeds: DataFrame): DataFrame =
    assignToSeeds(unit, seeds)
      .select(col("cid"), posexplode(col("u")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos").cast("long").as("pos"))
      .agg(count(lit(1)).as("n_members"),
        intScaled(avg(col("x")), 10000).as("c_e4"))
      .orderBy("cid", "pos")

  /** Full spherical k-means fit: iterate assign → mean → re-normalize
    * until assignments stabilize (or maxIter). Seeds = the k lowest
    * vec_ids' unit vectors — deterministic, no RNG, rerun-stable.
    *
    * Scale shape per round: one broadcast-assign (map-side, k
    * candidates per vector), one (cid, pos) mean agg, one k-row
    * centroid rebuild — vectors are never collected; only the k×dims
    * centroid table moves to the driver-side broadcast. Assignment
    * frames are `localCheckpoint`ed per round (flat lineage, same
    * discipline as Components.connectedComponents). Convergence =
    * zero vectors changed cluster, checked via a co-keyed join of
    * consecutive assignments.
    *
    * Empty clusters follow classic Lloyd behavior: a centroid that
    * loses all members produces no mean row and silently drops from
    * the next round's seed set (k shrinks) — deterministic, and the
    * right default for dedup/IVF uses where a dead cell is a dead cell.
    *
    * @return final assignments (vec_id, cid)
    */
  def kmeansFit(unit: DataFrame, k: Int, maxIter: Int = 20): DataFrame = {
    require(k >= 1 && maxIter >= 1)
    var seeds = unit.orderBy("vec_id").limit(k)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
    var prev: DataFrame = null
    var assigned: DataFrame = null
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      assigned = assignToSeeds(unit, seeds).localCheckpoint(true)
      if (prev != null) {
        val changed = assigned.select(col("vec_id"), col("cid").as("nc"))
          .join(prev.select(col("vec_id"), col("cid")), "vec_id")
          .filter(col("nc") =!= col("cid")).count()
        converged = changed == 0
      }
      if (!converged) {
        // new centroids: per-dimension mean, re-normalized (spherical
        // k-means — cosine geometry needs unit centroids)
        val means = assigned
          .select(col("cid"), posexplode(col("u")).as(Seq("pos", "x")))
          .groupBy(col("cid"), col("pos"))
          .agg(avg(col("x")).as("c"))
          .groupBy(col("cid"))
          .agg(transform(
            array_sort(collect_list(struct(col("pos"), col("c")))),
            s => s.getField("c")).as("cv"))
        seeds = means
          .withColumn("__n", sqrt(dot(col("cv"), col("cv"))))
          .select(col("cid"),
            transform(col("cv"), x => x / col("__n")).as("cu"))
          .localCheckpoint(true)
      }
      prev = assigned
      iter += 1
    }
    assigned.select(col("vec_id"), col("cid"))
  }

  /** One full Lloyd round returning the REBUILT spherical centroids
    * (`cid`, `cu`) as RAW doubles — [[kmeansFit]]'s per-round centroid
    * rebuild factored out as the persistable warm-start state (q421):
    * parquet round-trips doubles exactly, so a warm run continues from
    * bit-identical centroids, the q414 rank-store contract applied to
    * the embedding family.
    */
  def kmeansCentroidRound(unit: DataFrame, seeds: DataFrame): DataFrame =
    assignToSeeds(unit, seeds)
      .select(col("cid"), posexplode(col("u")).as(Seq("pos", "x")))
      .groupBy(col("cid"), col("pos"))
      .agg(avg(col("x")).as("c"))
      .groupBy(col("cid"))
      .agg(transform(
        array_sort(collect_list(struct(col("pos"), col("c")))),
        s => s.getField("c")).as("cv"))
      .withColumn("__n", sqrt(dot(col("cv"), col("cv"))))
      .select(col("cid"),
        transform(col("cv"), x => x / col("__n")).as("cu"))

  /** Persist round-1's rebuilt centroids once per session (k×dims raw
    * doubles — bytes). The nightly-clustering posture: the fit job
    * lands its centroid state; the next run (or an online assigner)
    * reads it back and pays only the marginal round.
    */
  private def ensureCentroidStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "centroids", dir) { root =>
      val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
      val seeds = unit.filter(col("vec_id") < 8)
        .select(col("vec_id").as("cid"), col("u").as("cu"))
      kmeansCentroidRound(unit, seeds).write.mode("overwrite").parquet(root)
      root
    }

  /** q421 — WARM-START k-means off the persisted centroid store: round
    * 1's rebuilt spherical centroids persisted once (raw doubles), then
    * the SECOND Lloyd round runs from the read-back — and must equal
    * two unrolled cold rounds (the oracle replays both rounds from raw
    * embeddings). q414's incremental-maintenance contract extended to
    * the embedding family: ranks (q414), labels (q415), registers
    * (q411-q413), histograms (q419), now centroids.
    *
    * Float discipline: assignments rank on round(dot, 6) and the output
    * means ride the q112-certified e4 grid; the new cross-engine
    * surface is round-1's centroid arithmetic (per-dim avg + one
    * normalize division) feeding round-2's sims — SimilaritySpec
    * measures the distance of every unrounded sim to its e6 boundary
    * and every output mean to its e4 boundary (the q134 pattern) and
    * pins them orders above the ~1e-10 summation drift.
    *
    * Scale: identical to q112's shape — one broadcast-assign per round,
    * one (cid, pos) mean agg; the store read is k×dims. Vectors are
    * never collected.
    */
  def q421(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
    // cid < 8 is a no-op by the store's construction (cids ARE the 8
    // seed vec_ids) spelled as a literal filter so the broadcast build
    // side carries a PROVABLE constant bound — the PlanAuditSpec BNL
    // net's requirement, same as q112's seed filter.
    val seeds = s.read.parquet(ensureCentroidStore(s, dir))
      .filter(col("cid") < 8)
    kmeansStep(unit, seeds)
  }

  /** q112 — the k-means step on the embeddings table with deterministic
    * seeds (the 8 lowest vec_ids), certifying assignment + mean
    * recomputation against an oracle that replays both independently.
    */
  def q112(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
    val seeds = unit.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
    kmeansStep(unit, seeds)
  }

  /** q121 — metadata-filtered top-3 (the RAG retrieval shape: "nearest
    * neighbors among documents WHERE lang = 'en'"). The predicate is
    * applied to the CANDIDATE side BEFORE pair generation
    * (pre-filtering), not to the ranked result (post-filtering):
    * post-filtering a top-k can return FEWER than k survivors when the
    * filter is selective — the classic filtered-ANN recall bug — while
    * pre-filtering ranks inside the eligible set by construction. The
    * filter lives on the `documents` metadata table and reaches the
    * embeddings via an equi-join on vec_id = doc_id (at 100 TB the
    * metadata join is a broadcast or a bucketed co-partitioned join;
    * the predicate itself pushes to the metadata scan — only eligible
    * ids ever reach the vector side). Brute-force scoring here is the
    * certifiable core; the scale path composes the same pre-filter
    * with q61's LSH buckets or q64's IVF cells.
    */
  def q121(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
    val eligible = Tables.table(s, dir, "documents")
      .filter(col("lang") === "en")
      .select(col("doc_id"))
    val q = broadcast(unit.filter(col("vec_id") < 20)
      .select(col("vec_id").as("qid"), col("u").as("qu")))
    val d = unit.join(eligible, unit("vec_id") === eligible("doc_id"))
      .select(col("vec_id").as("did"), col("u").as("du"))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    q.join(d)
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid"), col("did"), intScaled(col("sim"), 100).as("sim_c"))
      .orderBy("qid", "did")
  }

  /** q123 — SemDeDup (Abbas et al. 2023): semantic dedup scoped to
    * k-means clusters. Cluster with [[assignToSeeds]] (the q112
    * kernel, deterministic seeds = 8 lowest vec_ids), generate pairs
    * ONLY within a cluster, and greedily drop the higher id of every
    * pair whose cosine clears the threshold. Output = the drop list
    * (doc, its cluster, how many near-dups triggered it, max sim).
    *
    * The cluster scope is the entire scale story: all-pairs over 100 TB
    * of embeddings is O(N²); pairs within k balanced clusters are
    * O(N²/k) — and in production k grows with N (N/k ≈ constant cell
    * size), making the pair stage linear overall. The pair join is a
    * cid equi-join (co-partitioned shuffle, never a cross join);
    * "drop the higher id" is set-based (no iterative greedy sweep), so
    * one pass certifies membership. Threshold compares the integer-
    * scaled sim in BOTH engines (q66 discipline); measured margin to
    * the .5 rounding boundary 8.4e-5 on the ×100 scale ≫ float drift.
    */
  def q123(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u").select("vec_id", "u")
    val seeds = unit.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
    val assigned = assignToSeeds(unit, seeds)
    val a = assigned.select(col("cid"), col("vec_id").as("id_a"), col("u").as("ua"))
    val b = assigned.select(col("cid"), col("vec_id").as("id_b"), col("u").as("ub"))
    a.join(b, "cid").filter(col("id_a") < col("id_b"))
      .select(col("cid"), col("id_b"), dot(col("ua"), col("ub")).as("sim"))
      .filter(intScaled(col("sim"), 100) >= 35)
      .groupBy(col("id_b").as("vec_id"))
      // cid is constant per id_b (a doc lives in exactly one cluster);
      // max() is just the associative way to carry it through the agg.
      .agg(max(col("cid")).as("cid"),
        count(lit(1)).as("n_dups"),
        intScaled(max(col("sim")), 100).as("max_sim_c"))
      .orderBy("vec_id")
  }

  /** q136 — ANN self-evaluation: recall@3 of the LSH-bucketed search
    * (q61's shape) against the brute-force ground truth (q60's shape),
    * per query vector. The evaluation harness a pipeline runs before
    * trusting an approximate index — production tunes planes/probes
    * until this distribution is acceptable. Queries where a true
    * neighbor's bucket diverged score < 1; the join is on (qid, did)
    * pairs, so zero-hit queries still report (left join, not semi).
    */
  def q136(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(8, 64)
    // Materialized ONCE: both the brute-force and the LSH branch scan
    // this frame — without the checkpoint each branch re-runs the
    // parquet scan + normalization + 64-plane signature pipeline.
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), signature(col("u"), planes).as("sig"))
      .localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val q = unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("sig"))
    val d = unit
      .select(col("vec_id").as("did"), col("u").as("du"), col("sig"))
    val exact = broadcast(q.drop("sig")).join(d.drop("sig"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("did"))
    val ann = q.join(d, "sig")
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("did"), lit(1L).as("m"))
    exact.join(ann, Seq("qid", "did"), "left")
      .groupBy(col("qid"))
      .agg(count(col("m")).as("hits"))
      .select(col("qid"), col("hits"),
        intScaled(col("hits") / lit(3.0), 10000L).as("recall_e4"))
      .orderBy("qid")
  }

  /** q278 — recall@5 of int8-QUANTIZED search against the
    * full-precision ground truth: the acceptance gate for shipping
    * [[quantizeInt8]]'s codes as the serving index (4× memory cut,
    * q100 certifies the codes; THIS certifies what the compression
    * does to retrieval). The quantized ranking is by the INTEGER dot
    * of the codes — exact arithmetic (|dot| ≤ 64·127², far below
    * 2⁵³), so the approximate side's order is engine-proof by
    * construction; only the ground-truth ranking rides the mirrored
    * double dot (q60/q136 discipline). At sf0.01 the measured mean
    * recall is ~0.76 — the audit BINDS; it is not a tautology.
    *
    * Scale: the 50-query probe side broadcasts against the corpus
    * twice (evaluation harness, not the serving path — q136's
    * posture); the codes frame is materialized once for both passes.
    */
  def q278(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quant = quantizeInt8(
      withUnitVec(emb(s, dir), "embedding", "u")
        .select(col("vec_id"), col("u")), col("u"))
      .select(col("vec_id"), col("u"), col("q8"))
      .localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val wq = Window.partitionBy("qid").orderBy(col("qsim").desc, col("did"))
    val q = quant.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("q8").as("qq"))
    val d = quant
      .select(col("vec_id").as("did"), col("u").as("du"), col("q8").as("dq"))
    val exact = broadcast(q.select("qid", "qu")).join(d.select("did", "du"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 5)
      .select(col("qid"), col("did"))
    val approx = broadcast(q.select("qid", "qq")).join(d.select("did", "dq"))
      .select(col("qid"), col("did"),
        dot(asDouble(col("qq")), asDouble(col("dq"))).cast("long").as("qsim"))
      .withColumn("rn", row_number().over(wq)).filter(col("rn") <= 5)
      .select(col("qid"), col("did"), lit(1L).as("m"))
    exact.join(approx, Seq("qid", "did"), "left")
      .groupBy(col("qid"))
      .agg(count(col("m")).as("hits"))
      .select(col("qid"), col("hits"),
        intScaled(col("hits") / lit(5.0), 10000L).as("recall_e4"))
      .orderBy("qid")
  }

  /** q145 — LSH tuning curve: recall@3 vs plane count (4/6/8) against
    * one shared brute-force ground truth — the parameter sweep a
    * pipeline runs to SIZE its index before committing to it (more
    * planes = smaller buckets = cheaper search but lower recall; the
    * engineer picks the knee). Unit vectors and the exact top-3 are
    * materialized once; each config re-signatures only.
    */
  def q145(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"))
      .localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val q0 = broadcast(unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu")))
    val exact = q0.join(unit.select(col("vec_id").as("did"), col("u").as("du")))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("did"))
      .localCheckpoint(true)
    Seq(4, 6, 8).map { p =>
      val sig = unit.select(col("vec_id"), col("u"),
        signature(col("u"), hyperplanes(p, 64)).as("sig"))
      val ann = sig.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("u").as("qu"), col("sig"))
        .join(sig.select(col("vec_id").as("did"), col("u").as("du"), col("sig")), "sig")
        .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
        .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
        .select(col("qid"), col("did"), lit(1L).as("m"))
      exact.join(ann, Seq("qid", "did"), "left")
        .agg(count(col("m")).as("hits"), count(lit(1)).as("n"))
        .select(lit(p.toLong).as("planes"), col("hits"),
          intScaled(col("hits") / col("n"), 10000L).as("recall_e4"))
    }.reduce(_ unionAll _).orderBy("planes")
  }

  /** q155 — one logistic-regression gradient step for a doc-quality
    * classifier (the fastText-style labeler pipelines train to score
    * crawl text; q112 is the unsupervised ML step, this is the
    * supervised one). Features: bias, token-count/100, stopword ratio;
    * label: lang = 'en'. From fixed w₀ = (0.1, −0.2, 0.3):
    *
    *   g_j = Σ_i (σ(w₀·x_i) − y_i)·x_ij,   w'_j = w₀_j − 0.1·(g_j / n)
    *
    * One corpus scan, one map-side-partial agg, one-row output —
    * nothing grows with the corpus. σ's exp() is the only
    * libm-drifting op (the q125/q135 ln pattern); sums are
    * order-dependent; both absorbed by the e6 grid (margin
    * spec-pinned). The division g/n is parenthesized identically in
    * both engines — `0.1·(g/n)`, not `(0.1·g)/n`.
    */
  def q155(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
    val nt = TextAnalysis.tokenCount(col("text")).cast("double")
    val x1 = nt / lit(100.0)
    val x2 = TextAnalysis.stopwordHits(col("text"), Seq("a", "the"))
      .cast("double") / nt
    val y = when(col("lang") === "en", lit(1.0)).otherwise(lit(0.0))
    val z = lit(0.1) + lit(-0.2) * x1 + lit(0.3) * x2
    val res = lit(1.0) / (lit(1.0) + exp(-z)) - y
    def wNew(w0: Double, g: Column) =
      intScaled(lit(w0) - lit(0.1) * (g / col("n_docs")), 1000000L)
    d.agg(
      count(lit(1)).as("n_docs"),
      sum(res).as("g0"), sum(res * x1).as("g1"), sum(res * x2).as("g2"))
      .select(col("n_docs"),
        intScaled(col("g0"), 1000000L).as("g0_e6"),
        intScaled(col("g1"), 1000000L).as("g1_e6"),
        intScaled(col("g2"), 1000000L).as("g2_e6"),
        wNew(0.1, col("g0")).as("w0_new_e6"),
        wNew(-0.2, col("g1")).as("w1_new_e6"),
        wNew(0.3, col("g2")).as("w2_new_e6"))
  }

  /** q160 — calibration (reliability) bins for the q155 classifier:
    * docs bucketed by predicted probability (bin = ⌊10·σ(w₀·x)⌋, top
    * bin closed), each bin reporting size, positive count, empirical
    * rate, and mean prediction — the reliability diagram a pipeline
    * checks before trusting classifier scores as sampling weights.
    *
    * Bin edges are float-compare safe here: boundary hits are either
    * EXACT (z = 0 ⟹ σ = 0.5 bit-identical in both engines — 2 docs at
    * sf0.01) or ≥ 3e-4 away (measured; exp drift is ~1e-16). The
    * empirical rate is one division of exact integers; only mean_p_e6
    * carries summation drift (per-bin margins spec-pinned).
    */
  def q160(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
    val nt = TextAnalysis.tokenCount(col("text")).cast("double")
    val x1 = nt / lit(100.0)
    val x2 = TextAnalysis.stopwordHits(col("text"), Seq("a", "the"))
      .cast("double") / nt
    val p = lit(1.0) /
      (lit(1.0) + exp(-(lit(0.1) + lit(-0.2) * x1 + lit(0.3) * x2)))
    val y = when(col("lang") === "en", 1L).otherwise(0L)
    d.select(least(floor(p * 10), lit(9.0)).cast("long").as("bin"),
        y.as("y"), p.as("p"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"),
        intScaled(sum(col("p")) / count(lit(1)), 1000000L).as("mean_p_e6"))
      .select(col("bin"), col("n"), col("pos"),
        intScaled(col("pos").cast("double") / col("n"), 10000L).as("rate_e4"),
        col("mean_p_e6"))
      .orderBy("bin")
  }

  /** q169 — label-centroid cosine matrix: per-label mean embedding
    * (the q44 centroids, unrounded), pairwise cosine between every
    * label pair — the embedding-space source-distance matrix (q167's
    * lexical cross-perplexity is the asymmetric cousin; this is the
    * symmetric geometric view a curation pipeline reads to see which
    * classes/domains collapse together before mixing).
    *
    * Scale shape: the corpus-sized stage is ONE (label, pos) hash agg
    * (never collects vectors); everything after is classifier-sized —
    * labels × dims centroids, labels² × dims pair terms. The pair join
    * keys on `pos` alone, which is fine precisely because the frame is
    * label-cardinality, not corpus-cardinality.
    *
    * Float discipline: centroid coords carry summation-order drift
    * (~1e-13), absorbed by the e4 grid; the spec measures every
    * value's distance to its rounding half-boundary (q134 pattern).
    */
  def q169(s: SparkSession, dir: String): DataFrame = {
    val cent = emb(s, dir)
      .select(col("label").cast("long").as("lbl"),
        posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("lbl"), col("pos").cast("long").as("pos"))
      .agg(avg(col("v")).as("c"))
      .localCheckpoint(true) // tiny (labels × dims); branched twice below
    val a = cent.select(col("lbl").as("la"), col("pos"), col("c").as("ca"))
    val b = cent.select(col("lbl").as("lb"), col("pos"), col("c").as("cb"))
    a.join(b, "pos").filter(col("la") < col("lb"))
      .groupBy(col("la"), col("lb"))
      .agg(intScaled(
        sum(col("ca") * col("cb")) /
          (sqrt(sum(col("ca") * col("ca"))) * sqrt(sum(col("cb") * col("cb")))),
        10000L).as("cos_e4"))
      .orderBy("la", "lb")
  }

  /** q176 — per-dimension embedding health report: mean, population
    * std, min, max for every vector position — the "dead dimension /
    * scale drift" check run before trusting embeddings for ANN or
    * clustering (a dimension with σ ≈ 0 carries no signal; one with a
    * wild range dominates unnormalized distances).
    *
    * Float discipline: min/max touch no summation (exact float →
    * double, bit-exact); mean and σ = √(E[v²] − E[v]²) are spelled as
    * the same explicit-moment expression in both engines (never the
    * engine's own stddev implementation — Welford vs naive would
    * diverge beyond summation order), drift absorbed by the e4 grid.
    *
    * Scale: one (pos)-keyed agg over the exploded corpus — map-side
    * combined, dims × 5 output rows.
    */
  def q176(s: SparkSession, dir: String): DataFrame =
    emb(s, dir)
      .select(posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("pos").cast("long").as("pos"), col("vf").cast("double").as("v"))
      .groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        intScaled(avg(col("v")), 10000L).as("mean_e4"),
        intScaled(sqrt(avg(col("v") * col("v")) - avg(col("v")) * avg(col("v"))),
          10000L).as("std_e4"),
        intScaled(min(col("v")), 10000L).as("min_e4"),
        intScaled(max(col("v")), 10000L).as("max_e4"))
      .orderBy("pos")

  /** q181 — per-dimension median + MAD (median absolute deviation):
    * the ROBUST counterpart of q176's moment report — outlier vectors
    * move a mean/σ arbitrarily far but barely touch the median/MAD,
    * so this is the pair a pipeline trusts when embeddings may carry
    * corrupt rows.
    *
    * Both statistics are EXACT ORDER STATISTICS (q163/q179 rank-quota
    * discipline — smallest value with 2·rank ≥ n), never interpolated.
    * That makes them bit-exact cross-engine: the median is an actual
    * data value (float→double, exact), each |v − med| is ONE IEEE
    * subtraction of two exact doubles, and the MAD is again a value
    * picked from that set — no summation anywhere, so nothing drifts.
    *
    * Scale: the two rank windows partition by pos (corpus-sized
    * partitions — the accepted exact-order-stat bound, q152/q163; the
    * production path at 100 TB swaps in approx_percentile and keeps
    * the same report shape).
    */
  def q181(s: SparkSession, dir: String): DataFrame = {
    val x = emb(s, dir)
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("vec_id"), col("pos").cast("long").as("pos"),
        col("vf").cast("double").as("v"))
    val wV = Window.partitionBy(col("pos")).orderBy(col("v"), col("vec_id"))
    val nW = Window.partitionBy(col("pos"))
    val med = x
      .withColumn("rn", row_number().over(wV))
      .withColumn("n", count(lit(1)).over(nW))
      .filter(col("rn") * 2 >= col("n"))
      .groupBy(col("pos"))
      .agg(min(col("v")).as("med"), max(col("n")).as("n"))
    val wD = Window.partitionBy(col("pos")).orderBy(col("d"), col("vec_id"))
    x.join(med, "pos")
      .withColumn("d", abs(col("v") - col("med")))
      .withColumn("rn", row_number().over(wD))
      .filter(col("rn") * 2 >= col("n"))
      .groupBy(col("pos"))
      .agg(max(col("n")).as("n"),
        intScaled(min(col("med")), 10000L).as("med_e4"),
        intScaled(min(col("d")), 10000L).as("mad_e4"))
      .orderBy("pos")
  }

  /** q192 — label separability audit: per label, the MEAN PAIRWISE
    * cosine within the label vs the mean cosine to every other
    * label's vectors, and the margin between them — the "are these
    * labels actually separated in embedding space" check run before
    * trusting labels for stratified training or classifier targets.
    *
    * THE SCALE TRICK: no pair is ever materialized. On unit vectors,
    * mean intra dot = (|S_l|² − n_l) / (n_l·(n_l−1)) and mean inter
    * dot = (S_l·G − |S_l|²) / (n_l·(N − n_l)), where S_l is the
    * label's SUM VECTOR and G = Σ S_l — the O(n²) pair sums collapse
    * to sum-vector algebra, so the corpus is touched ONCE for the
    * (label, pos) sums and everything after is labels × dims.
    *
    * Float discipline: the same algebraic expression is spelled in
    * both engines (q169 pattern) — the only cross-engine delta is
    * summation order inside the (label, pos) sums, absorbed by the e4
    * grid; the spec pins rounding-boundary margins.
    */
  def q192(s: SparkSession, dir: String): DataFrame = {
    val sums = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("label").cast("long").as("lbl"),
        posexplode(col("u")).as(Seq("pos", "v")))
      .groupBy(col("lbl"), col("pos"))
      .agg(sum(col("v")).as("sv"))
      .localCheckpoint(true) // labels × dims; branched into G below
    val g = sums.groupBy(col("pos")).agg(sum(col("sv")).as("gv"))
    val perLabel = sums.join(g, "pos")
      .groupBy(col("lbl"))
      .agg(sum(col("sv") * col("sv")).as("s2"),
        sum(col("sv") * col("gv")).as("sg"))
    val counts = emb(s, dir).groupBy(col("label").cast("long").as("lbl"))
      .agg(count(lit(1)).as("n"))
    val totals = counts.agg(sum(col("n")).as("ntot"))
    perLabel.join(counts, "lbl").withGlobalStats(totals)
      .select(col("lbl"), col("n"),
        intScaled((col("s2") - col("n")) /
          (col("n") * (col("n") - 1)).cast("double"), 10000L).as("intra_e4"),
        intScaled((col("sg") - col("s2")) /
          (col("n") * (col("ntot") - col("n"))).cast("double"), 10000L)
          .as("inter_e4"),
        intScaled((col("s2") - col("n")) /
          (col("n") * (col("n") - 1)).cast("double") -
          (col("sg") - col("s2")) /
          (col("n") * (col("ntot") - col("n"))).cast("double"), 10000L)
          .as("margin_e4"))
      .orderBy("lbl")
  }

  /** q196 — embedding coverage audit: per source, how many documents
    * actually HAVE an embedding row (doc_id = vec_id), plus the
    * dimension range among the matched — the join-coverage pre-flight
    * before any ANN/clustering stage (q60/q64/q123 silently shrink
    * their universe when coverage < 100%; this makes the shrinkage a
    * published number). The embedding-side sibling of q184's FK audit.
    *
    * Scale: key-projected left join (doc_id, source) ⋈ (vec_id, dims)
    * — payloads never move; per-source output. Exact integers + one
    * exact division; dims range is min/max (no summation).
    */
  def q196(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents").select(col("doc_id"), col("source"))
    val e = emb(s, dir).select(col("vec_id"), size(col("embedding")).as("dims"))
    d.join(e, col("doc_id") === col("vec_id"), "left")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("vec_id").isNotNull, 1L).otherwise(0L)).as("n_embedded"),
        min(col("dims")).as("min_dims"), max(col("dims")).as("max_dims"))
      .select(col("source"), col("n_docs"), col("n_embedded"),
        intScaled(
          col("n_embedded").cast("double") / col("n_docs").cast("double"),
          10000L).as("coverage_e4"),
        col("min_dims").cast("long").as("min_dims"),
        col("max_dims").cast("long").as("max_dims"))
      .orderBy("source")
  }

  /** q230 — SEMANTIC decontamination: the embedding-space complement
    * of q104's n-gram screen (a paraphrased eval item shares no
    * 5-gram but sits next to its source in embedding space). Eval set
    * = vec_id % 7 == 0 (the q146 funnel's split) CAPPED at a constant
    * 200-probe budget (vec_id < 1400 — the q354 discipline: the
    * broadcast side must be constant-bounded, never corpus-
    * proportional; an eval set is fixed-size in practice), corpus =
    * the full non-eval split;
    * per corpus vector: the max eval cosine on the e2 grid, how many
    * eval items sit at/above the 0.40 threshold, and the contamination
    * flag — all integer decisions on ALREADY-GRIDDED values (the q66
    * counting discipline; boundary margins spec-pinned at both gate
    * SFs).
    *
    * Scale: the probe side is the bounded eval set (broadcast by
    * construction — the q60 discipline); the corpus streams through
    * one fused dot-product loop per pair, collapsing immediately to
    * the per-vector (max, count) agg — no pair frame materializes.
    * At real scale the LSH/IVF paths (q61/q64) pre-bucket the same
    * scoring; the brute pass stays the recall oracle (q136 pattern).
    */
  def q230(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
    val ev = broadcast(unit
      .filter(col("vec_id") % 7 === 0 && col("vec_id") < 1400)
      .select(col("vec_id").as("eid"), col("u").as("eu")))
    val d = unit.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id").as("did"), col("u").as("du"))
    d.join(ev)
      .select(col("did"), intScaled(dot(col("du"), col("eu")), 100).as("sim_c"))
      .groupBy(col("did"))
      .agg(max(col("sim_c")).as("max_sim_c"),
        sum(when(col("sim_c") >= 40, 1L).otherwise(0L)).as("n_close"))
      .select(col("did"), col("max_sim_c"), col("n_close"),
        when(col("max_sim_c") >= 40, 1L).otherwise(0L).as("contaminated"))
      .orderBy("did")
  }

  /** q237 — graded retrieval quality of the LSH index: MRR and NDCG@3
    * per query against the brute-force ground truth. q136's recall@3
    * says "did the true neighbors appear"; this says "in the right
    * ORDER" — gain 4−rank from the brute top-3, DCG discounted by
    * log2(position+1), normalized by the (constant-grade) ideal DCG.
    * The metric pair every retrieval stack reports before shipping an
    * approximate index.
    *
    * Float discipline: log2 is the only libm op. Each DCG term
    * gain/log2(arn+1) is rounded PER-TERM onto the e9 grid (9 possible
    * term values — margins spec-pinned), the IDCG is the same constant
    * expression e9-gridded on both engines, so dcg_e9/idcg_e9 are
    * exact integers and ndcg_e6 is ONE correctly-rounded IEEE division
    * of exact values (the q228 Σ-of-gridded-terms discipline). MRR is
    * an exact rational 1e6/arn.
    *
    * Scale: identical posture to q136 — brute pass is the 50-query
    * broadcast probe (the evaluation harness, not the serving path),
    * the ANN pass is bucket-local.
    */
  def q237(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val planes = hyperplanes(8, 64)
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), signature(col("u"), planes).as("sig"))
      .localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val q = unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu"), col("sig"))
    val d = unit
      .select(col("vec_id").as("did"), col("u").as("du"), col("sig"))
    val exact = broadcast(q.drop("sig")).join(d.drop("sig"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 3)
      .select(col("qid"), col("did"), (lit(4) - col("rn")).cast("long").as("rel"))
    val ann = q.join(d, "sig")
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("arn", row_number().over(w)).filter(col("arn") <= 3)
      .select(col("qid"), col("did"), col("arn"))
    val idcgE9 = round((lit(3.0) / log2(lit(2.0)) + lit(2.0) / log2(lit(3.0)) +
      lit(1.0) / log2(lit(4.0))) * 1e9, 0).cast("long")
    ann.join(exact, Seq("qid", "did"), "left")
      .select(col("qid"), col("arn"), coalesce(col("rel"), lit(0L)).as("gain"))
      .withColumn("term_e9",
        when(col("gain") > 0,
          round(col("gain") / log2(col("arn") + 1) * 1e9, 0).cast("long"))
          .otherwise(lit(0L)))
      .groupBy(col("qid"))
      .agg(sum(when(col("gain") > 0, 1L).otherwise(0L)).as("hits"),
        min(when(col("gain") > 0, col("arn"))).as("minarn"),
        sum(col("term_e9")).as("dcg_e9"))
      .select(col("qid"), col("hits"),
        coalesce(round(lit(1000000.0) / col("minarn"), 0).cast("long"), lit(0L))
          .as("rr_e6"),
        round(col("dcg_e9") * lit(1000000.0) / idcgE9, 0).cast("long")
          .as("ndcg_e6"))
      .orderBy("qid")
  }

  /** q244 — hard-negative mining for contrastive retrieval training:
    * for each eval probe (the q230 split with its constant 200-probe
    * cap, vec_id % 7 == 0 AND vec_id < 1400), the top-5
    * SEMI-HARD negatives from the corpus — a different `label` than the
    * probe (a true negative), gridded cosine in [15, 40) (close enough
    * to be informative, below q230's 0.40 contamination gate so never a
    * disguised positive). The standard mining step between "random
    * negatives" (too easy, no gradient) and "hardest negatives" (often
    * false negatives) when building training pairs for a retriever.
    *
    * Integer decisions only: the band filter and the ranking both read
    * the e2-gridded sim (q230's margin spec covers every pair at both
    * gate SFs — identical pair universe), ties broken by did, so
    * membership AND order are exact cross-engine.
    *
    * Scale: the probe side is the bounded eval set (broadcast by
    * construction — q230's shape); the corpus streams through the fused
    * dot, the band filter drops most pairs BEFORE any state builds, and
    * top-5 rides [[graft.ops.TopKByScore]]'s k-bounded map-side heap —
    * the shuffle carries ≤ 5 entries per (probe, map task), never the
    * banded pair stream.
    */
  def q244(s: SparkSession, dir: String): DataFrame = {
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), col("label"))
    val ev = broadcast(unit
      .filter(col("vec_id") % 7 === 0 && col("vec_id") < 1400)
      .select(col("vec_id").as("qid"), col("u").as("qu"),
        col("label").as("qlab")))
    val d = unit.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id").as("did"), col("u").as("du"),
        col("label").as("dlab"))
    d.join(ev)
      .filter(col("qlab") =!= col("dlab"))
      .select(col("qid"), col("did"),
        intScaled(dot(col("qu"), col("du")), 100).as("sim_c"))
      .filter(col("sim_c") >= 15 && col("sim_c") < 40)
      .groupBy(col("qid"))
      .agg(graft.ops.TopKByScore.topK(col("sim_c").cast("double"), col("did"), 5)
        .as("top"))
      .select(col("qid"), posexplode(col("top")))
      .select(col("qid"), (col("pos") + 1).cast("long").as("rnk"),
        col("col.id").as("did"), col("col.score").cast("long").as("sim_c"))
      .orderBy("qid", "rnk")
  }

  /** q253 — k-NN classifier evaluation: predict each eval vector's
    * label (the q230/q244 split with its constant 200-probe cap:
    * vec_id % 7 == 0 AND vec_id < 1400) by majority vote of
    * its 5 nearest corpus neighbors (cosine), against the true label.
    * The standard "are these embeddings linearly useful" probe — the
    * evaluation harness run before anyone trains a head on top. The
    * companion to q192's separability statistic: q192 measures
    * geometry, this measures realized top-k label agreement.
    *
    * Determinism: neighbor rank orders by the raw IEEE dot of
    * identically-derived unit vectors with did tiebreak (q237
    * posture; rank-5/6 gap spec-measured), and the vote picks
    * (votes DESC, label ASC) — a total order.
    *
    * Scale: eval probes broadcast (bounded split); candidate scoring
    * is the q60 probe stream — at real scale the LSH/IVF bucket paths
    * (q61/q64) feed the same vote; top-5 and the ≤5-row vote frame
    * per probe are constant-size.
    */
  def q253(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), col("label"))
    val ev = broadcast(unit
      .filter(col("vec_id") % 7 === 0 && col("vec_id") < 1400)
      .select(col("vec_id").as("qid"), col("u").as("qu"),
        col("label").as("tl")))
    val d = unit.filter(col("vec_id") % 7 =!= 0)
      .select(col("vec_id").as("did"), col("u").as("du"),
        col("label").as("dl"))
    val wSim = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val wVote = Window.partitionBy("qid")
      .orderBy(col("votes").desc, col("dl"))
    d.join(ev)
      .select(col("qid"), col("tl"), col("did"), col("dl"),
        dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(wSim)).filter(col("rn") <= 5)
      .groupBy(col("qid"), col("tl"), col("dl"))
      .agg(count(lit(1)).as("votes"))
      .withColumn("vr", row_number().over(wVote)).filter(col("vr") === 1)
      .select(col("qid"), col("tl").cast("long").as("true_label"),
        col("dl").cast("long").as("pred_label"),
        col("votes"),
        (col("dl") === col("tl")).cast("long").as("correct"))
      .orderBy("qid")
  }

  /** q259 — mutual-kNN pair mining: the paraphrase/translation-pair
    * harvester (LASER/CCMatrix-style margin mining's first stage) —
    * keep (a, b) only when b is in a's top-5 AND a is in b's top-5.
    * The mutuality constraint is what kills hub vectors: a hub lands
    * in everyone's top-k, but its OWN top-k has room for only 5, so
    * its spurious pairs drop out.
    *
    * Candidates come from the q61 LSH buckets (never all-pairs); each
    * side's top-5 rides the bounded-heap [[graft.ops.TopKByScore]]
    * (score DESC, ties to the LOWEST id — a total order, so ranks are
    * deterministic), and the mutual filter is a self-equi-join of the
    * two ≤5-per-vector top frames on the REVERSED pair. The reported
    * sim is symmetric by construction — the fused dot loops the same
    * index order both directions, so dot(a,b) ≡ dot(b,a) bit-exact.
    *
    * Scale: the bucket self-join shuffles on sig only; the partial
    * TopK heaps cap shuffle payload at 5 entries per (vector, map
    * task); the mutual join carries ≤ 5·N rows. Rank-5/6 boundary
    * margins are spec-pinned ≫ float drift (Round9bSpec).
    */
  def q259(s: SparkSession, dir: String): DataFrame = {
    val planes = hyperplanes(8, 64)
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u"), signature(col("u"), planes).as("sig"))
    val a = unit.select(col("sig"), col("vec_id").as("aid"), col("u").as("au"))
    val b = unit.select(col("sig"), col("vec_id").as("bid"), col("u").as("bu"))
    val tops = a.join(b, "sig")
      .filter(col("aid") =!= col("bid"))
      .select(col("aid"), col("bid"), dot(col("au"), col("bu")).as("sim"))
      .groupBy(col("aid"))
      .agg(graft.ops.TopKByScore.topK(col("sim"), col("bid"), 5).as("top"))
      .select(col("aid"), explode(col("top")).as("t"))
      .select(col("aid"), col("t.id").as("bid"),
        intScaled(col("t.score"), 100).as("sim_c"))
    tops.as("x")
      .join(tops.as("y"),
        col("x.aid") === col("y.bid") && col("x.bid") === col("y.aid"))
      .filter(col("x.aid") < col("x.bid"))
      .select(col("x.aid").as("vec_a"), col("x.bid").as("vec_b"),
        col("x.sim_c").as("sim_c"))
      .orderBy("vec_a", "vec_b")
  }

  /** q260 — diagonal-covariance Mahalanobis outlier census: the
    * multivariate complement of q176's per-dim report. Each vector's
    * squared Mahalanobis distance under the corpus's per-dimension
    * mean/variance, Σ_d (x_d − μ_d)²/σ_d², flags embeddings that are
    * jointly extreme even when no single coordinate is (the classic
    * batch-effect / corrupt-encoder detector; full-covariance needs a
    * d×d solve — the diagonal form is what pipelines run at scale).
    *
    * Float discipline: components are e6-gridded INTEGERS first
    * (xi = round(x·10⁶) — exact per value, no summation-order hazard),
    * so S_d = Σ xi and Q_d = Σ xi² are exact BIGINTs and the z² term
    * is the exact rational (n·xi − S_d)² / (n·Q_d − S_d²); each term
    * is ONE IEEE division e9-gridded (margins spec-pinned), the
    * per-vector sum of 64 gridded terms is an exact BIGINT (the q228
    * Σ-of-gridded-terms discipline), and the outlier flag is the
    * integer predicate maha2_e9 > 2·d·10⁹. Zero-variance dims would
    * divide by zero identically in both engines (none exist — the
    * data is continuous; a real pipeline drops constant dims first).
    *
    * Scale: ONE posexplode pass → per-dim (n, S, Q) aggs (64 rows —
    * broadcast back), then a second map-side pass computes per-vector
    * sums; nothing all-pairs, nothing collected. Overflow: n·Q_d with
    * xi ~ 10⁶·|x| and n rows is ≤ n²·10¹²·max x² — decimal(38)
    * products (q206 discipline) keep it exact far past 2⁶³.
    */
  def q260(s: SparkSession, dir: String): DataFrame = {
    val comp = emb(s, dir)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "vf")))
      .select(col("vec_id"), col("label"), col("pos"),
        round(col("vf").cast("double") * 1000000d, 0).cast("long").as("xi"))
    val stats = comp.groupBy(col("pos"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi")).as("s"),
        sum(col("xi").cast("decimal(38,0)") * col("xi")).as("q"))
    val dev = col("n").cast("decimal(38,0)") * col("xi") - col("s")
    val varNum = col("n").cast("decimal(38,0)") * col("q") -
      col("s").cast("decimal(38,0)") * col("s")
    val termE9 = round(
      (dev * dev).cast("double") / varNum.cast("double") * 1000000000d,
      0).cast("long")
    comp.join(broadcast(stats), Seq("pos"))
      .select(col("vec_id"), col("label"), termE9.as("t"))
      .groupBy(col("vec_id"), col("label"))
      .agg(sum(col("t")).as("maha2_e9"), count(lit(1)).as("d"))
      .select(col("vec_id"), col("label").cast("long").as("label"),
        col("maha2_e9"),
        (col("maha2_e9") > lit(2L) * col("d") * 1000000000L)
          .cast("long").as("is_outlier"))
      .orderBy("vec_id")
  }

  /** q309 — top principal component by POWER ITERATION over the exact
    * integer covariance of the e3-quantized embeddings (the q213
    * moment discipline): 4 rounds of w = C·v with v re-normalized to
    * the e6 grid by max-|component| after each round, then the
    * Rayleigh-quotient eigenvalue estimate. PCA without MLlib — the
    * "what single direction carries the embedding mass" diagnostic
    * behind whitening decisions, anisotropy alarms (a collapsed
    * encoder puts most variance on one axis), and IVF/LSH axis
    * choices.
    *
    * EXACT cross-engine by construction: each covariance cell's
    * numerator n·Σqiqj − Σqi·Σqj and denominator n² are combined in
    * exact decimal(38)/HUGEINT arithmetic, so the ONLY float step per
    * cell is one mirrored division of the two exact integers (each
    * cast to its nearest double identically on both engines) before
    * the e6 grid (no double moment chain — r9 ADVICE);
    * every matrix-vector
    * product is an exact decimal(38) integer sum (order-independent);
    * re-normalization is integer round-half division
    * sign·((2·|w|·1e6 + m) DIV (2m)) — no float exists until the ONE
    * mirrored Rayleigh division at the end. The d² cells frame is
    * 4096 rows at d=64; matrix-vector rounds are joins on that frame
    * against a 64-row vector (broadcast), eagerly checkpointed (q127
    * posture). Sign is fixed by the deterministic all-ones start.
    *
    * Scale: one corpus-sized pass builds the moments via the map-side
    * accumulator (r10 — partitions×d² shuffle rows, no per-vector
    * fan-out; d=1024 spec-pinned); everything after is d²-sized. At
    * 100 TB the iteration cost is INDEPENDENT of corpus size.
    */
  /** Memoized FULL-grid exact integer covariance cells (i, j, c) of
    * the e3-quantized embeddings, e6-gridded (the q213 moment shape
    * without the upper-triangle cut) — shared by q309 (power
    * iteration) and q312 (participation ratio), one corpus pass per
    * session.
    */
  private val covCellsCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private def covCellsFull(s: SparkSession, dir: String): DataFrame =
    covCellsCache.computeIfAbsent((s, dir), { _ => covCellsFresh(s, dir) })

  /** Drop every session-scoped derived-frame memo in this object — see
    * [[SessionMemo]] (bench honesty: each timed round re-pays each
    * shared derivation exactly once).
    */
  private[ext] def clearSessionMemos(): Unit = covCellsCache.clear()

  /** Uncached covariance-cell body — DevScaleAudit times this directly
    * so the session memo cannot hide the 10x cost. r10: the production
    * core is the MAP-SIDE moment accumulator (no per-vector d² fan-out
    * at all); the relational posexplode² form survives as
    * [[covCellsRelationalFresh]] solely as the SQL-expressible shape
    * the spec cross-checks (Round10Spec proves cell-for-cell equality
    * at d=64 on the fixture and at a synthetic d=1024).
    */
  private[graft] def covCellsFresh(s: SparkSession, dir: String): DataFrame =
    covCellify(covMomentsMapSide(s, quantizedVectors(s, dir)))

  /** r9-era relational core: one row per (vector, i, j) — d² rows PER
    * VECTOR on the shuffle, the fan-out the r9 verdict flagged as
    * quadratic pain at d=1024. Exact-integer moments, so it equals the
    * map-side core bit-for-bit; kept only as the oracle/spec
    * cross-check. */
  private[graft] def covCellsRelationalFresh(s: SparkSession, dir: String): DataFrame =
    covCellify(covMomentsRelational(quantizedVectors(s, dir)))

  private[graft] def covMomentsRelational(qv: DataFrame): DataFrame =
    qv
      .select(posexplode(col("qv")).as(Seq("i", "qi")), col("qv"))
      .select(col("i"), col("qi"), posexplode(col("qv")).as(Seq("j", "qj")))
      .groupBy(col("i"), col("j"))
      .agg(count(lit(1)).as("n"), sum(col("qi")).as("si"),
        sum(col("qj")).as("sj"),
        sum(col("qi").cast("decimal(38,0)") * col("qj")).as("sij"))

  private[graft] def covCellsOf(s: SparkSession, qv: DataFrame): DataFrame =
    covCellify(covMomentsMapSide(s, qv))

  private[graft] def covCellsRelationalOf(qv: DataFrame): DataFrame =
    covCellify(covMomentsRelational(qv))

  private def quantizedVectors(s: SparkSession, dir: String): DataFrame =
    emb(s, dir).select(transform(col("embedding"),
      x => intScaled(x.cast("double"), 1000L)).as("qv"))

  /** Map-side exact moment accumulation: each task folds its vectors
    * into ONE d×d upper-triangle long array (d=1024 → 4 MB of task
    * state), then emits d² partial-moment rows PER PARTITION — the
    * shuffle carries partitions×d² rows instead of vectors×d², which
    * is what survives 100 TB of embeddings. Partial products stay
    * exact in Long (|q| ≤ ~2·10³ ⇒ |qi·qj| ≤ ~4·10⁶; 2⁶³/4·10⁶ ≈ 2·10¹²
    * rows per task before overflow — far beyond any task size); the
    * cross-partition combine rides decimal(38), so the final moments
    * equal the relational form's bit-for-bit.
    */
  private[graft] def covMomentsMapSide(s: SparkSession, qv: DataFrame): DataFrame = {
    import s.implicits._
    qv.select(col("qv")).as[Array[Long]]
      .mapPartitions { it =>
        var d = -1
        var n = 0L
        var si: Array[Long] = null
        var sij: Array[Long] = null // upper triangle, row-major
        while (it.hasNext) {
          val v = it.next()
          if (d < 0) {
            d = v.length
            si = new Array[Long](d)
            sij = new Array[Long](d * (d + 1) / 2)
          }
          n += 1
          var i = 0
          var base = 0
          while (i < d) {
            val qi = v(i)
            si(i) += qi
            var j = i
            while (j < d) {
              sij(base + j - i) += qi * v(j)
              j += 1
            }
            base += d - i
            i += 1
          }
        }
        if (d < 0) Iterator.empty
        else {
          // full-grid emission (the cell frame is full d²; sij symmetric)
          val rows = for {
            i <- Iterator.range(0, d)
            j <- Iterator.range(0, d)
          } yield {
            val (lo, hi) = if (i <= j) (i, j) else (j, i)
            val idx = lo * d - lo * (lo - 1) / 2 + (hi - lo)
            (i, j, n, si(i), si(j), sij(idx))
          }
          rows
        }
      }
      .toDF("i", "j", "n", "si", "sj", "sijL")
      .groupBy(col("i"), col("j"))
      .agg(sum(col("n")).as("n"), sum(col("si")).as("si"),
        sum(col("sj")).as("sj"),
        sum(col("sijL").cast("decimal(38,0)")).as("sij"))
  }

  /** Shared cell arithmetic: the exact decimal(38) numerator and ONE
    * mirrored double division (r9 ADVICE discipline) — both cores feed
    * through here so they cannot drift. */
  private def covCellify(mom: DataFrame): DataFrame =
    mom
      .select(col("i").cast("long").as("i"), col("j").cast("long").as("j"),
        intScaled(
          (col("n").cast("decimal(38,0)") * col("sij") -
            col("si").cast("decimal(38,0)") * col("sj")).cast("double") /
            (col("n").cast("decimal(38,0)") * col("n")).cast("double"),
          1000000L).as("c"))
      .localCheckpoint(true)

  def q309(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = covCellsFull(s, dir)
    var v = cells.filter(col("j") === 0L)
      .select(col("i"), lit(1000000L).cast(d38).as("v"))
      .localCheckpoint(true)
    (1 to 4).foreach { _ =>
      val w = cells
        .join(v.select(col("i").as("j"), col("v")), "j")
        .groupBy(col("i"))
        .agg(sum(col("c").cast(d38) * col("v")).as("w"))
      val m = w.agg(max(abs(col("w"))).as("m"))
      v = w.withGlobalStats(m)
        .select(col("i"),
          when(col("w") >= 0,
            expr("(2 * w * 1000000 + m) DIV (2 * m)"))
            .otherwise(-expr("(2 * (-w) * 1000000 + m) DIV (2 * m)"))
            .cast(d38).as("v"))
        .localCheckpoint(true)
    }
    val vj = v.select(col("i").as("j"), col("v").as("vj"))
    val num = cells.join(v, "i").join(vj, "j")
      .agg(sum(col("v") * col("c").cast(d38) * col("vj")).as("num"))
    val den = v.agg(sum(col("v") * col("v")).as("den"))
    v.withGlobalStats(num).withGlobalStats(den)
      .select(col("i"), col("v").cast("long").as("loading_e6"),
        intScaled(col("num").cast("double") / col("den").cast("double"),
          1000L).as("lambda_e3"))
      .orderBy("i")
  }

  private val kcenterOracle: String = {
    val head =
      """WITH q AS (
        |  SELECT vec_id, list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |c0 AS (SELECT vec_id AS cid, qv AS cv FROM q ORDER BY vec_id LIMIT 1),
        |m0 AS (SELECT vec_id, qv, 9223372036854775807 AS md FROM q)""".stripMargin
    val rounds = (0 until 8).map { r =>
      s"""m${r + 1} AS (
         |  SELECT m.vec_id, m.qv,
         |         LEAST(m.md, list_sum(list_transform(range(1, len(m.qv) + 1),
         |           k -> (m.qv[k] - c.cv[k]) * (m.qv[k] - c.cv[k])))) AS md
         |  FROM m$r m CROSS JOIN c$r c),
         |r$r AS (
         |  SELECT CAST($r AS BIGINT) AS round, cid AS center_id,
         |         (SELECT CAST(MAX(md) AS BIGINT) FROM m${r + 1}) AS radius2
         |  FROM c$r),
         |c${r + 1} AS (SELECT vec_id AS cid, qv AS cv FROM m${r + 1}
         |              ORDER BY md DESC, vec_id LIMIT 1)""".stripMargin
    }
    (head +: rounds).mkString(",\n") + "\n" +
      (0 until 8).map(r => s"SELECT * FROM r$r").mkString("", " UNION ALL ", "") +
      "\nORDER BY round"
  }

  private val pcaPowerOracle: String = {
    val head =
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |g AS (
        |  SELECT i.i AS i, j.j AS j, qv[i.i + 1] AS qi, qv[j.j + 1] AS qj
        |  FROM q CROSS JOIN range(64) i(i) CROSS JOIN range(64) j(j)),
        |cells AS (
        |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |    CAST(ROUND(
        |      CAST(CAST(COUNT(*) AS HUGEINT)
        |             * SUM(CAST(qi AS HUGEINT) * qj)
        |           - CAST(SUM(qi) AS HUGEINT) * SUM(qj) AS DOUBLE) /
        |      CAST(CAST(COUNT(*) AS HUGEINT) * COUNT(*) AS DOUBLE)
        |      * 1000000) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2),
        |v0 AS (SELECT DISTINCT i, CAST(1000000 AS HUGEINT) AS v
        |       FROM cells)""".stripMargin
    val rounds = (1 to 4).map { k =>
      s"""w$k AS (
         |  SELECT c.i, SUM(CAST(c.c AS HUGEINT) * p.v) AS w
         |  FROM cells c JOIN v${k - 1} p ON p.i = c.j GROUP BY c.i),
         |m$k AS (SELECT MAX(ABS(w)) AS m FROM w$k),
         |v$k AS (
         |  SELECT i, CASE WHEN w >= 0
         |                 THEN (2 * w * 1000000 + m) // (2 * m)
         |                 ELSE -((2 * (-w) * 1000000 + m) // (2 * m)) END AS v
         |  FROM w$k CROSS JOIN m$k)""".stripMargin
    }
    (head +: rounds).mkString(",\n") +
      """,
        |num AS (
        |  SELECT SUM(va.v * CAST(c.c AS HUGEINT) * vb.v) AS num
        |  FROM cells c JOIN v4 va ON va.i = c.i JOIN v4 vb ON vb.i = c.j),
        |den AS (SELECT SUM(v * v) AS den FROM v4)
        |SELECT i, CAST(v AS BIGINT) AS loading_e6,
        |       CAST(ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE) * 1000)
        |            AS BIGINT) AS lambda_e3
        |FROM v4 CROSS JOIN num CROSS JOIN den
        |ORDER BY i""".stripMargin
  }

  /** q311 — k-center coreset by farthest-point traversal (Gonzalez's
    * 2-approximation): 8 rounds of "add the point farthest from every
    * selected center", reporting each chosen center and the covering
    * radius after it joins. The diversity-sampling primitive behind
    * "pick k maximally-different exemplars" — seed selection for
    * k-means (q44), eval-set diversification, and the coverage view
    * that q123's SemDeDup (drop near-together points) looks at from
    * the other side. The radius column IS the k-center objective: how
    * far the worst-covered embedding sits from its nearest exemplar.
    *
    * All-integer: distances are exact squared L2 over the e3-quantized
    * vectors (BIGINT, zip_with + aggregate — no sqrt needed for
    * argmax), the min-distance state is exact LEAST, and every argmax
    * is the (md DESC, vec_id) total order. No float anywhere.
    *
    * Scale: each round is one corpus-sized map (broadcast 1-row
    * center) + a max-agg + a TakeOrdered(1) — k·O(corpus) with NO
    * pairwise stage, exactly how production k-center runs; the state
    * checkpoints per round (branched: radius agg + argmax + next
    * round).
    */
  def q311(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir)
      .select(col("vec_id"), transform(col("embedding"),
        x => intScaled(x.cast("double"), 1000L)).as("qv"))
      .localCheckpoint(true)
    def d2(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
        lit(0L), (acc, x) => acc + x)
    var sel = q.orderBy(col("vec_id")).limit(1)
    var state = q.select(col("vec_id"), col("qv"),
      lit(Long.MaxValue).as("md"))
    val rounds = (0 until 8).map { r =>
      val c = broadcast(
        sel.select(col("vec_id").as("cid"), col("qv").as("cv")))
      state = state.crossJoin(c)
        .select(col("vec_id"), col("qv"),
          least(col("md"), d2(col("qv"), col("cv"))).as("md"))
        .localCheckpoint(true)
      val rad = state.agg(max(col("md")).as("radius2"))
      sel = state.orderBy(col("md").desc, col("vec_id")).limit(1)
        .select(col("vec_id"), col("qv"))
      c.select(col("cid")).withGlobalStats(rad)
        .select(lit(r.toLong).as("round"), col("cid").as("center_id"),
          col("radius2"))
    }
    rounds.reduce(_ unionAll _).orderBy("round")
  }

  /** q312 — embedding effective dimensionality (participation ratio):
    * PR = (tr C)² / ‖C‖²_F = (Σλ)²/Σλ² off the exact integer
    * covariance cells — the anisotropy alarm in one number. PR ≈ d
    * means variance spreads evenly (healthy encoder); PR ≪ d means a
    * few directions carry everything (representation collapse — the
    * cousin q176/q196 see per-dimension, and exactly what q309's
    * dominant eigenvalue probes from the top). No eigensolve needed:
    * for symmetric C, Σλ² is the Frobenius norm, so both moments are
    * EXACT integer sums over the cell grid.
    *
    * Exactness: trace and ΣΣc² ride decimal(38) off the gridded
    * integer cells; the single double division is mirrored and
    * e4-gridded. Scale: one corpus pass (shared memoized cells), then
    * d²-sized arithmetic.
    */
  def q312(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val cells = covCellsFull(s, dir)
    cells.agg(
        count(when(col("i") === col("j"), lit(1))).as("d"),
        sum(when(col("i") === col("j"), col("c"))).as("tr"),
        sum(col("c").cast(d38) * col("c")).as("frob2"))
      .select(col("d"), col("tr"),
        intScaled(
          (col("tr").cast(d38) * col("tr")).cast("double") /
            col("frob2").cast("double"),
          10000L).as("pr_e4"))
  }

  /** q316 — centroid silhouette per embedding label: s = (b−a)/max(a,b)
    * with a = distance to the OWN label centroid and b = the nearest
    * OTHER centroid (the simplified silhouette — O(N·L) instead of the
    * textbook O(N²) pairwise form, which is the only silhouette anyone
    * runs at corpus scale). The cluster-quality verdict on the label
    * partition itself: mean s near 1 = tight well-separated labels,
    * near 0 = overlapping, negative = misassigned — the evaluation
    * counterpart to q192's separability ratio and the quality gate
    * before q123-style cluster-scoped dedup trusts those labels.
    *
    * Exactness: the squared distance to a centroid S/n is the EXACT
    * integer Σ(n·x_i − S_i)² scaled by 1/n² — so every distance is
    * ONE mirrored sqrt+division over an exact decimal(38) integer (no
    * float summation: the per-dim fold is integer). b is a min over
    * identical doubles; each row's s is e9-gridded BEFORE the exact
    * per-label sum (q232 discipline); the mean is one mirrored
    * division chain.
    *
    * Scale: centroid moments are one map-side agg (64 sums × L
    * labels); the row×centroid fan-out is N·L with the L-row centroid
    * frame broadcast — no pairwise stage, no corpus-sized shuffle
    * after the first agg.
    */
  def q316(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val q = emb(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"),
          x => intScaled(x.cast("double"), 1000L)).as("qv"))
      .localCheckpoint(true)
    val cent = q.groupBy(col("label"))
      .agg(count(lit(1)).as("cn"),
        (0 until 64).map(i => sum(col("qv").getItem(i)).as(s"s$i")): _*)
      .select(col("label").as("cl"), col("cn"),
        array((0 until 64).map(i => col(s"s$i")): _*).as("sv"))
    val a2 = aggregate(
      zip_with(col("qv"), col("sv"),
        (x, sx) => {
          val t = (col("cn") * x - sx).cast(d38)
          t * t
        }),
      lit(0).cast(d38), (acc, t) => acc + t)
    val dl = q.withGlobalStats(cent)
      .select(col("vec_id"), col("label"), col("cl"),
        (sqrt(a2.cast("double")) / col("cn").cast("double")).as("dist"))
    // r18 (guide §2.4): ONE agg computes a and b together — the old
    // own-filter + other-min + join-back consumed the N·L fan-out (and
    // its 64-dim integer fold) TWICE and paid a vec_id exchange to
    // rejoin. Exactly one row per vec has cl = label (own centroid), so
    // the conditional max IS that row's dist; the isNotNull filter
    // reproduces the inner join's L=1 degenerate case (no other
    // centroid → row dropped) bit for bit.
    val srow = dl.groupBy(col("vec_id"), col("label"))
      .agg(max(when(col("cl") === col("label"), col("dist"))).as("a"),
        min(when(col("cl") =!= col("label"), col("dist"))).as("b"))
      .filter(col("b").isNotNull)
      .select(col("label"),
        when(greatest(col("a"), col("b")) > 0.0,
          intScaled((col("b") - col("a")) / greatest(col("a"), col("b")),
            1000000000L)).otherwise(lit(0L)).as("s_e9"))
    srow.groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("s_e9")).as("s_sum_e9"))
      .select(col("label"), col("n_vecs"), col("s_sum_e9"),
        intScaled(
          col("s_sum_e9").cast("double") / col("n_vecs").cast("double") /
            lit(1000000000.0),
          1000000L).as("mean_s_e6"))
      .orderBy("label")
  }

  /** q317 — alignment & uniformity of the embedding space (Wang &
    * Isola, ICML'20): alignment = mean ‖x−y‖² over same-label
    * neighbour pairs (how close semantically-positive pairs sit),
    * uniformity = ln mean exp(−2‖x−y‖²) over fixed-offset pairs of the
    * whole set (how evenly mass spreads on the unit sphere — near 0 =
    * collapsed, strongly negative = uniform). THE modern
    * representation-quality pair: a collapsed encoder aces alignment
    * and flunks uniformity; q312's participation ratio sees the same
    * failure through the eigenspectrum, this sees it through pair
    * geometry.
    *
    * Determinism: pairs are FIXED id-offset joins (+1, +7919 for the
    * uniformity mix; same-label lead-by-vec_id for alignment) — no
    * RNG. On unit vectors ‖x−y‖² = 2−2·cos, and cos = dot/√(n²x·n²y)
    * rides the EXACT integer dot and norm moments of the e3-quantized
    * vectors — each pair's exp/cos value is ONE mirrored expression,
    * e9-gridded BEFORE the exact sums (q232 discipline); the final ln
    * is mirrored once and Round9nSpec pins the exp/ln grid margins at
    * both gate SFs.
    *
    * Scale: two id-offset equi-joins + one label-keyed lead window —
    * all N-sized, no pairwise stage; one-row output.
    */
  def q317(s: SparkSession, dir: String): DataFrame = {
    val q = emb(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"),
          x => intScaled(x.cast("double"), 1000L)).as("qv"))
      .select(col("vec_id"), col("label"), col("qv"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x * x).as("n2"))
      .filter(col("n2") > 0L)
      .localCheckpoint(true)
    def dot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, t) => acc + t)
    def cos: Column =
      dot(col("qv"), col("yqv")).cast("double") /
        sqrt((col("n2") * col("yn2")).cast("double"))
    val y = q.select(col("vec_id").as("yid"), col("qv").as("yqv"),
      col("n2").as("yn2"))
    val unif = Seq(1L, 7919L).map { o =>
      q.join(y, col("yid") === col("vec_id") + lit(o))
        .select(intScaled(exp(lit(4.0) * cos - lit(4.0)), 1000000000L)
          .as("t"))
    }.reduce(_ unionAll _)
      .agg(count(lit(1)).as("n_unif"), sum(col("t")).as("st"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("label").orderBy("vec_id")
    val align = q
      .withColumn("yqv", lead(col("qv"), 1).over(w))
      .withColumn("yn2", lead(col("n2"), 1).over(w))
      .filter(col("yqv").isNotNull)
      .select(intScaled(lit(2.0) - lit(2.0) * cos, 1000000000L).as("t"))
      .agg(count(lit(1)).as("n_align"), sum(col("t")).as("sa"))
    unif.withGlobalStats(align)
      .select(col("n_unif"), col("n_align"),
        intScaled(
          log(col("st").cast("double") / col("n_unif").cast("double") /
            lit(1000000000.0)), 1000000L).as("uniformity_e6"),
        intScaled(
          col("sa").cast("double") / col("n_align").cast("double") /
            lit(1000000000.0), 1000000L).as("align_e6"))
  }

  /** q323 — per-label embedding ingest-drift: cosine between each
    * label's FIRST-half and SECOND-half centroid under vec_id order
    * (the id-range midpoint split — the ingest-order proxy, the q291
    * temporal-drift lens pointed at the embedding space). An encoder
    * or upstream-content change mid-ingest drops this cosine below
    * ~1 for every label at once; a single label drifting alone is a
    * content shift in that slice. Complements q291 (text length
    * drift) and q316/q312 (static geometry) with the TEMPORAL
    * embedding monitor.
    *
    * Exactness: centroid cosine is scale-invariant, so it is computed
    * on the UNNORMALIZED integer sum vectors — dot and norms are
    * exact decimal(38) moments of the e3-quantized embeddings, and
    * the only double is ONE mirrored sqrt division per label.
    *
    * Scale: one corpus pass collapses map-side to (label × half × 64)
    * sums; everything after is label-bounded.
    */
  def q323(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val q = emb(s, dir)
      .select(col("vec_id"), col("label").cast("long").as("label"),
        transform(col("embedding"),
          x => intScaled(x.cast("double"), 1000L)).as("qv"))
    val bounds = q.agg(min(col("vec_id")).as("mn"), max(col("vec_id")).as("mx"))
    val halves = q.withGlobalStats(bounds)
      .select(col("label"), col("qv"),
        when(col("vec_id") <= expr("(mn + mx) DIV 2"), lit(0))
          .otherwise(lit(1)).as("h"))
    val sums = halves.groupBy(col("label"), col("h"))
      .agg(count(lit(1)).as("n"),
        (0 until 64).map(i => sum(col("qv").getItem(i)).as(s"s$i")): _*)
      .select(col("label"), col("h"), col("n"),
        array((0 until 64).map(i => col(s"s$i")): _*).as("sv"))
    val a = sums.filter(col("h") === 0)
      .select(col("label"), col("n").as("n_first"), col("sv").as("sa"))
    val b = sums.filter(col("h") === 1)
      .select(col("label"), col("n").as("n_second"), col("sv").as("sb"))
    val dotc = aggregate(
      zip_with(col("sa"), col("sb"), (x, y) => x.cast(d38) * y),
      lit(0).cast(d38), (acc, t) => acc + t)
    def n2(c: String): Column = aggregate(col(c), lit(0).cast(d38),
      (acc, x) => acc + x.cast(d38) * x)
    a.join(b, "label")
      .select(col("label"), col("n_first"), col("n_second"),
        intScaled(
          dotc.cast("double") / sqrt((n2("sa") * n2("sb")).cast("double")),
          1000000L).as("drift_cos_e6"))
      .orderBy("label")
  }

  /** q353 — Matryoshka truncation-recall curve: recall@10 of search
    * over the FIRST 8/16/32 dimensions (re-normalized prefixes)
    * against the full-64-dim ground truth, per query. The acceptance
    * gate for shipping truncated MRL-style embeddings as a cheaper
    * serving index — q278 answers the same question for int8 codes
    * along the PRECISION axis; this is the DIMENSION axis, and
    * together they bound the quality/cost frontier. At sf0.01 the
    * measured mean recall rises ~0.20→0.26→0.39 across 8/16/32 dims —
    * the audit binds hard at every width (these synthetic embeddings
    * concentrate little mass in low dims, and the curve says exactly
    * that).
    *
    * Determinism: prefix similarity is the ONE mirrored chain
    * dot(slice)/(‖q‖·‖d‖); both rankings break ties (sim DESC, did);
    * hits and recall are exact integers off set membership.
    *
    * Convention: self-matches are INCLUDED on both sides (no
    * did != qid filter, unlike q354) — each query is its own
    * guaranteed top-1 in the full-dim truth AND in every truncated
    * ranking, so recall has a deterministic floor of 0.1; the curve
    * is read for its SHAPE across widths, and the floor cancels in
    * width-over-width comparisons. Consistent across both engines.
    *
    * Scale: q136's evaluation-harness posture — the 50-query probe
    * side broadcasts; the 3× slice fan-out is a constant factor; the
    * corpus frame is materialized once for both passes.
    */
  def q353(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u")).localCheckpoint(true)
    val wFull = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val exact = broadcast(unit.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("u").as("qu")))
      .join(unit.select(col("vec_id").as("did"), col("u").as("du")))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(wFull)).filter(col("rn") <= 10)
      .select(col("qid"), col("did"))
    val sliced = unit
      .withColumn("m", explode(array(lit(8L), lit(16L), lit(32L))))
      .withColumn("sl", slice(col("u"), lit(1), col("m")))
      .withColumn("nrm", l2Norm(col("sl")))
      .localCheckpoint(true) // probe + corpus sides of the slice join
    val wm = Window.partitionBy("m", "qid").orderBy(col("sim").desc, col("did"))
    val tq = sliced.filter(col("vec_id") < 50)
      .select(col("m"), col("vec_id").as("qid"), col("sl").as("qs"),
        col("nrm").as("qn"))
    val td = sliced.select(col("m").as("md"), col("vec_id").as("did"),
      col("sl").as("ds"), col("nrm").as("dn"))
    val approx = broadcast(tq).join(td, col("m") === col("md"))
      .select(col("m"), col("qid"), col("did"),
        (dot(col("qs"), col("ds")) / (col("qn") * col("dn"))).as("sim"))
      .withColumn("rn", row_number().over(wm)).filter(col("rn") <= 10)
      .select(col("m"), col("qid"), col("did"), lit(1L).as("hit"))
    exact
      .withColumn("m", explode(array(lit(8L), lit(16L), lit(32L))))
      .join(approx, Seq("m", "qid", "did"), "left")
      .groupBy(col("m"), col("qid"))
      .agg(count(col("hit")).as("hits"))
      .select(col("m"), col("qid"), col("hits"),
        intScaled(col("hits") / lit(10.0), 10000L).as("recall_e4"))
      .orderBy("m", "qid")
  }

  /** q354 — hubness census of the kNN graph: the in-degree
    * (k-occurrence N₁₀) distribution over the corpus when a FIXED
    * deterministic probe set (vec_id < 200 — q353's probe-budget
    * pattern) retrieves its top-10 neighbors — max in-degree, antihub
    * (never-retrieved) count, and the moment skewness of N₁₀.
    * High-dimensional spaces concentrate retrieval onto hub points
    * (skew ≫ 0) and starve antihubs — THE structural diagnostic for
    * whether q60/q61/q64's kNN lists are trustworthy, complementing
    * q259's mutual-kNN symmetry check.
    *
    * Determinism & exactness: probe set is vec_id < 200 (no RNG);
    * in-degrees are exact integers including zeros (left join against
    * the full corpus); skewness g₁ = √n·Σdev³/(Σdev²)^{3/2} with
    * dev = n·d − Σd EXACT decimal(38) integers and ONE mirrored
    * chain (the ^{3/2} spelled m₂·√m₂ — no pow()).
    *
    * Scale: the probe side is a CONSTANT 200-row broadcast — the
    * brute pass is 200×N dot products (one corpus scan), not N²/2;
    * hubness is a sampled diagnostic, not a serving path. At scale
    * the kNN lists come from the bucketed q61/q64 paths and this
    * census runs unchanged downstream. PlanAuditSpec pins the probe
    * frame's constant bound.
    */
  def q354(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u")).localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val knn = broadcast(unit.filter(col("vec_id") < 200)
        .select(col("vec_id").as("qid"), col("u").as("qu")))
      .join(unit.select(col("vec_id").as("did"), col("u").as("du")))
      .filter(col("did") =!= col("qid"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("qid"), col("did"))
    val indeg = unit.select(col("vec_id").as("did"))
      .join(knn.groupBy(col("did")).agg(count(lit(1)).as("dd")),
        Seq("did"), "left")
      .select(col("did"), coalesce(col("dd"), lit(0L)).as("d"))
    val mom = indeg.agg(count(lit(1)).as("n"), sum(col("d")).as("sd"))
    val nq = unit.agg(sum(when(col("vec_id") < 200, 1L).otherwise(0L))
      .as("n_queries"))
    indeg.withGlobalStats(mom)
      .withColumn("dev",
        col("n").cast("decimal(38,0)") * col("d") - col("sd"))
      .agg(max(col("n")).as("n_corpus"), max(col("d")).as("max_indeg"),
        sum(when(col("d") === 0L, 1L).otherwise(0L)).as("n_zero"),
        sum(col("dev") * col("dev")).as("m2"),
        sum(col("dev") * col("dev") * col("dev")).as("m3"))
      .withGlobalStats(nq)
      .select(col("n_corpus"), col("n_queries"), col("max_indeg"),
        col("n_zero"),
        when(col("m2") > 0L,
          intScaled(
            col("m3").cast("double") * sqrt(col("n_corpus").cast("double")) /
              (col("m2").cast("double") * sqrt(col("m2").cast("double"))),
            1000000L)).as("skew_e6"))
  }

  /** q356 — local intrinsic dimensionality (Levina-Bickel / Amsaleg
    * MLE) per probe: LID = −k / Σᵢ ln(dᵢ/d_k) over the probe's k=10
    * nearest cosine distances — the per-point "how many effective
    * dimensions does the space have HERE" that predicts where LSH/IVF
    * recall degrades and where hubness (q354) concentrates; q312's
    * participation ratio is the GLOBAL spectrum view, this is the
    * pointwise complement over the same fixed 50-probe budget as
    * q353.
    *
    * Float discipline: neighbor selection runs on the usual
    * (sim DESC, did) integer-decided ranks; each ln((1−s)/(1−s_k))
    * term is a mirrored libm chain gridded e9 PER TERM (sums of raw
    * doubles would be partition-order-dependent), and the final
    * −k·1e9/Σ is one mirrored chain gridded e4. Degenerate probes
    * (all k distances equal, or any exact-duplicate neighbor s ≥ 1)
    * guard to NULL/are excluded identically on both engines.
    *
    * Scale: q354's fixed-budget posture — a constant 50-row probe
    * broadcast, 50×N dot products, one corpus scan.
    */
  def q356(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u")).localCheckpoint(true)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val knn = broadcast(unit.filter(col("vec_id") < 50)
        .select(col("vec_id").as("qid"), col("u").as("qu")))
      .join(unit.select(col("vec_id").as("did"), col("u").as("du")))
      .filter(col("did") =!= col("qid"))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .localCheckpoint(true) // the k-th row feeds back as d_k
    val dk = knn.filter(col("rn") === 10)
      .select(col("qid"), col("sim").as("simk"))
    knn.join(dk, "qid")
      .filter(col("sim") < lit(1.0) && col("simk") < lit(1.0))
      .withColumn("term_e9",
        intScaled(log((lit(1.0) - col("sim")) / (lit(1.0) - col("simk"))),
          1000000000L))
      .groupBy(col("qid"))
      .agg(count(lit(1)).as("k_used"), sum(col("term_e9")).as("sum_e9"))
      .select(col("qid"), col("k_used"),
        when(col("sum_e9") < 0L,
          intScaled(
            -col("k_used").cast("double") * lit(1000000000.0) /
              col("sum_e9").cast("double"),
            10000L)).as("lid_e4"))
      .orderBy("qid")
  }

  /** q357 — cosine-concentration (anisotropy) census: over all C(64,2)
    * pairs of a fixed 64-probe set, the mean/spread/extremes of
    * pairwise cosine — Ethayarajh's "how anisotropic is this
    * embedding space" number: isotropic spaces average ≈ 0, collapsed
    * spaces cluster near 1, and the mean is the baseline every cosine
    * threshold (q66's near-dup cut, q123's SemDeDup cut) must be read
    * against.
    *
    * Float discipline: each pair cosine is gridded e9 FIRST
    * (deterministic per pair); every moment (mean, variance, min,
    * max, tail count) is then exact integer arithmetic; the two
    * output divisions and one sqrt are mirrored chains.
    *
    * Scale: a constant 64×64 probe frame — no corpus-sized stage at
    * all beyond the probe scan; one-row output.
    */
  def q357(s: SparkSession, dir: String): DataFrame = {
    // the vec_id < 64 probe bound is applied AFTER the checkpoint so
    // the literal bound stays visible in the physical plan — the BNL
    // audit (PlanAuditSpec) verifies broadcast sides structurally
    val pr = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("u")).localCheckpoint(true)
    val a = broadcast(pr.filter(col("vec_id") < 64)
      .select(col("vec_id").as("ia"), col("u").as("ua")))
    val b = pr.filter(col("vec_id") < 64)
      .select(col("vec_id").as("ib"), col("u").as("ub"))
    a.join(b).filter(col("ia") < col("ib"))
      .select(intScaled(dot(col("ua"), col("ub")), 1000000000L).as("s9"))
      .agg(count(lit(1)).as("n"), sum(col("s9")).as("ss"),
        sum(col("s9").cast("decimal(38,0)") * col("s9")).as("sqq"),
        min(col("s9")).as("min_e9"), max(col("s9")).as("max_e9"),
        sum(when(col("s9") > 300000000L, 1L).otherwise(0L)).as("n_gt03"))
      .select(col("n").as("n_pairs"),
        intScaled(col("ss").cast("double") / col("n").cast("double") /
          lit(1000000000.0), 1000000L).as("mean_e6"),
        intScaled(
          sqrt((col("n").cast("decimal(38,0)") * col("sqq") -
            col("ss").cast("decimal(38,0)") * col("ss")).cast("double") /
            (col("n").cast("double") * (col("n") - 1).cast("double"))) /
            lit(1000000000.0),
          1000000L).as("std_e6"),
        col("min_e9"), col("max_e9"),
        intScaled(col("n_gt03").cast("double") / col("n").cast("double"),
          1000000L).as("frac_gt03_e6"))
  }

  /** q358 — IVF probe-count recall curve: recall@10 vs the brute
    * ground truth when each of the fixed 50 queries probes its
    * nprobe ∈ {1,2,3} nearest coarse cells (label cells, q64's
    * contract) ranked by exact-integer query·centroid products — the
    * THIRD axis of the ANN quality/cost frontier (q278 = precision,
    * q353 = dimensions, this = probes), and the number that decides
    * the nprobe knob every IVF deployment ships with. Self-matches
    * included on both sides (q353's documented convention).
    *
    * Float discipline: unit-vector components grid to e9 integers
    * once; centroids are per-(label, dim) half-up integer means of
    * those (ONE mirrored division each); query→cell affinity is then
    * an EXACT decimal(38) integer dot product, so cell ranking is
    * integer-decided — no float can flip which cells are probed.
    * Member ranking inside probed cells uses the usual mirrored
    * double dot with (sim DESC, did) ties; hits/recall are exact.
    *
    * Scale: centroids are a (labels × 64)-row frame off one corpus
    * pass (map-side partial sums); the probe stage touches only the
    * probed cells' members — the entire POINT of IVF; the 3× nprobe
    * fan-out rides the fixed 50-query frame.
    */
  def q358(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val unit = withUnitVec(emb(s, dir), "embedding", "u")
      .select(col("vec_id"), col("label"), col("u"),
        transform(col("u"),
          x => round(x * lit(1000000000.0), 0).cast("long")).as("s9"))
      .localCheckpoint(true)
    val comp = unit.select(col("vec_id"), col("label"),
      posexplode(col("s9")).as(Seq("i", "v")))
    val cent = comp.groupBy(col("label"), col("i"))
      .agg(sum(col("v")).as("sv"), count(lit(1)).as("nl"))
      .select(col("label"), col("i"),
        intScaled(col("sv").cast("double") / col("nl").cast("double"), 1L)
          .as("cv"))
    val ip = comp.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("i"), col("v").as("qv"))
      .join(cent, "i")
      .groupBy(col("qid"), col("label"))
      .agg(sum(col("qv").cast("decimal(38,0)") * col("cv")).as("ip"))
    val wc = Window.partitionBy("qid").orderBy(col("ip").desc, col("label"))
    val sel = ip.withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 3)
      .withColumn("np", explode(array(lit(1L), lit(2L), lit(3L))))
      .filter(col("crn") <= col("np"))
      .select(col("np"), col("qid"), col("label"))
    val probeQ = unit.filter(col("vec_id") < 50)
      .select(col("vec_id").as("qid"), col("u").as("qu"))
    val wnp = Window.partitionBy("np", "qid")
      .orderBy(col("sim").desc, col("did"))
    val approx = broadcast(sel.join(probeQ, "qid"))
      .join(unit.select(col("label"), col("vec_id").as("did"),
        col("u").as("du")), Seq("label"))
      .select(col("np"), col("qid"), col("did"),
        dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(wnp)).filter(col("rn") <= 10)
      .select(col("np"), col("qid"), col("did"), lit(1L).as("hit"))
    val wb = Window.partitionBy("qid").orderBy(col("sim").desc, col("did"))
    val exact = broadcast(probeQ)
      .join(unit.select(col("vec_id").as("did"), col("u").as("du")))
      .select(col("qid"), col("did"), dot(col("qu"), col("du")).as("sim"))
      .withColumn("rn", row_number().over(wb)).filter(col("rn") <= 10)
      .select(col("qid"), col("did"))
    exact
      .withColumn("np", explode(array(lit(1L), lit(2L), lit(3L))))
      .join(approx, Seq("np", "qid", "did"), "left")
      .groupBy(col("np"), col("qid"))
      .agg(count(col("hit")).as("h"))
      .groupBy(col("np"))
      .agg(count(lit(1)).as("n_queries"), sum(col("h")).as("sum_hits"))
      .select(col("np").as("nprobe"), col("n_queries"), col("sum_hits"),
        intScaled(col("sum_hits").cast("double") /
          (col("n_queries") * 10).cast("double"), 10000L)
          .as("mean_recall_e4"))
      .orderBy("nprobe")
  }

  /** q399 — embedding isotropy per label via the mean-vector ratio:
    * iso = ‖Σx‖² / (n·Σ‖x‖²) ∈ [1/n, 1] — equals 1 when every vector
    * points the same way (collapsed representations), ≈ 1/n when
    * directions cancel (isotropic). The ONE-PASS collapse read beside
    * q317's pairwise alignment/uniformity (those need vector pairs;
    * this needs only per-dimension sums — the cheapest anisotropy
    * alarm a training pipeline can afford at every checkpoint, and
    * algebraically the mean pairwise cosine numerator: ‖Σx‖² =
    * Σᵢⱼ⟨xᵢ,xⱼ⟩).
    *
    * Exactness: elements land on q317's e3 grid FIRST (the
    * established per-element embedding grid; margins spec-pinned),
    * so per-dimension sums, ‖Σx‖², and Σ‖x‖² are all EXACT
    * decimal(38) integers; iso is ONE mirrored division e6.
    *
    * Scale: the per-dim collapse is a map-side-combined
    * (label × 64)-row agg; per-vector norms collapse map-side; no
    * pair frame ever exists (contrast q317's bounded pair probe).
    */
  def q399(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val v = emb(s, dir)
      .select(col("label").cast("long").as("label"),
        transform(col("embedding"),
          x => intScaled(x.cast("double"), 1000L)).as("qv"))
      .localCheckpoint(true) // branched: per-vector norms AND dim sums
    val per = v
      .select(col("label"),
        aggregate(col("qv"), lit(0L), (a, x) => a + x * x).as("n2"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"), sum(col("n2").cast(d38)).as("q2"))
    val dims = v.select(col("label"), posexplode(col("qv")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("col")).as("sd"))
      .groupBy(col("label"))
      .agg(sum(col("sd").cast(d38) * col("sd")).as("s2"))
    per.join(dims, "label")
      .select(col("label"), col("n_vecs"),
        intScaled(
          col("s2").cast("double") /
            (col("n_vecs").cast("double") * col("q2").cast("double")),
          1000000L).as("isotropy_e6"))
      .orderBy("label")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q356_lid_mle" -> (q356 _),
    "q357_cosine_concentration" -> (q357 _),
    "q358_ivf_probe_curve" -> (q358 _),
    "q353_matryoshka_recall" -> (q353 _),
    "q354_hubness" -> (q354 _),
    "q323_embed_drift" -> (q323 _),
    "q317_align_uniformity" -> (q317 _),
    "q316_silhouette" -> (q316 _),
    "q399_isotropy" -> (q399 _),
    "q311_kcenter_coreset" -> (q311 _),
    "q312_embed_effdim" -> (q312 _),
    "q309_pca_power" -> (q309 _),
    "q112_kmeans_step" -> (q112 _),
    "q421_kmeans_warm" -> (q421 _),
    "q237_retrieval_metrics" -> (q237 _),
    "q244_hard_negatives" -> (q244 _),
    "q253_knn_classify" -> (q253 _),
    "q123_semdedup" -> (q123 _),
    "q230_semantic_decontam" -> (q230 _),
    "q60_knn_brute" -> (q60 _),
    "q61_knn_lsh"   -> (q61 _),
    "q64_knn_ivf"   -> (q64 _),
    "q422_ivf_store_probe" -> (q422 _),
    "q426_ivf_append_probe" -> (q426 _),
    "q431_ivf_requant_probe" -> (q431 _),
    "q434_ivf_requant_append" -> (q434 _),
    "q66_embedding_neardup" -> (q66 _),
    "q100_embed_quant" -> (q100 _),
    "q121_filtered_knn" -> (q121 _),
    "q136_ann_recall" -> (q136 _),
    "q278_quant_recall" -> (q278 _),
    "q145_lsh_tuning" -> (q145 _),
    "q155_logreg_step" -> (q155 _),
    "q160_calibration" -> (q160 _),
    "q169_centroid_matrix" -> (q169 _),
    "q176_embed_dim_stats" -> (q176 _),
    "q181_embed_dim_mad" -> (q181 _),
    "q192_label_separability" -> (q192 _),
    "q196_embed_coverage" -> (q196 _),
    "q259_mutual_knn" -> (q259 _),
    "q260_mahalanobis" -> (q260 _),
  )

  /** q61 oracle: the md5-derived ±1 planes are query CONSTANTS (like
    * q66's 0.3 threshold), embedded as literals; everything downstream —
    * unit vectors, signature bits, the bucket equi-join, rank-3 — is
    * recomputed independently by the oracle engine. Signature bits are
    * taken on the unit vector exactly as the Spark side does, so the
    * two engines evaluate the same sums.
    */
  /** Shared CTE prefix (`e`, `u`, `s`) for the signature-bucket
    * oracles: unit vectors + the md5-derived ±1 plane signature
    * embedded as literals.
    */
  private def lshCtePrefix: String = {
    val planeLits = hyperplanes(8, 64).map(_.mkString("[", ", ", "]"))
    val sigExpr = planeLits.zipWithIndex.map { case (p, i) =>
      s"(CASE WHEN list_inner_product(uv, $p) > 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString(" + ")
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
       |u AS (SELECT vec_id,
       |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
       |      FROM e),
       |s AS (SELECT vec_id, uv, $sigExpr AS sig FROM u)""".stripMargin
  }

  private val knnLshOracle: String =
    s"""$lshCtePrefix,
       |sims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM s q JOIN s d ON q.sig = d.sig
       |  WHERE q.vec_id < 50),
       |ranked AS (
       |  SELECT qid, did, sim,
       |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |  FROM sims)
       |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
       |FROM ranked WHERE rn <= 3
       |ORDER BY qid, did""".stripMargin

  /** q136 oracle: brute-force top-3 and LSH-bucket top-3 recomputed
    * independently, recall@3 = overlap/3 per query.
    */
  private val annRecallOracle: String =
    s"""$lshCtePrefix,
       |bsims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM u q CROSS JOIN u d
       |  WHERE q.vec_id < 50),
       |be AS (
       |  SELECT qid, did FROM (
       |    SELECT qid, did,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |    FROM bsims) WHERE rn <= 3),
       |lsims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM s q JOIN s d ON q.sig = d.sig
       |  WHERE q.vec_id < 50),
       |ls AS (
       |  SELECT qid, did FROM (
       |    SELECT qid, did,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |    FROM lsims) WHERE rn <= 3)
       |SELECT be.qid, CAST(COUNT(ls.did) AS BIGINT) AS hits,
       |       CAST(ROUND(COUNT(ls.did) / 3.0 * 10000) AS BIGINT) AS recall_e4
       |FROM be LEFT JOIN ls ON be.qid = ls.qid AND be.did = ls.did
       |GROUP BY be.qid
       |ORDER BY be.qid""".stripMargin

  /** q145 oracle: one shared unit-vector + brute-force ground-truth
    * prefix; per-config signature/rank/join blocks generated with the
    * SAME md5-derived plane constants the Spark side uses.
    */
  private val lshTuningOracle: String = {
    def sigExpr(p: Int): String =
      hyperplanes(p, 64).map(_.mkString("[", ", ", "]")).zipWithIndex.map {
        case (pl, i) =>
          s"(CASE WHEN list_inner_product(uv, $pl) > 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString(" + ")
    val blocks = Seq(4, 6, 8).map { p =>
      s"""s$p AS (SELECT vec_id, uv, ${sigExpr(p)} AS sig FROM u),
         |l$p AS (
         |  SELECT q.vec_id AS qid, d.vec_id AS did,
         |         list_inner_product(q.uv, d.uv) AS sim
         |  FROM s$p q JOIN s$p d ON q.sig = d.sig
         |  WHERE q.vec_id < 50),
         |r$p AS (
         |  SELECT qid, did FROM (
         |    SELECT qid, did,
         |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
         |    FROM l$p) WHERE rn <= 3),
         |j$p AS (
         |  SELECT CAST($p AS BIGINT) AS planes,
         |         CAST(COUNT(r$p.did) AS BIGINT) AS hits,
         |         CAST(ROUND(CAST(COUNT(r$p.did) AS DOUBLE) / COUNT(*) * 10000)
         |              AS BIGINT) AS recall_e4
         |  FROM be LEFT JOIN r$p ON be.qid = r$p.qid AND be.did = r$p.did)""".stripMargin
    }
    s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
       |u AS (SELECT vec_id,
       |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
       |      FROM e),
       |bsims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM u q CROSS JOIN u d
       |  WHERE q.vec_id < 50),
       |be AS (
       |  SELECT qid, did FROM (
       |    SELECT qid, did,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |    FROM bsims) WHERE rn <= 3),
       |${blocks.mkString(",\n")}
       |SELECT * FROM j4 UNION ALL SELECT * FROM j6 UNION ALL SELECT * FROM j8
       |ORDER BY planes""".stripMargin
  }

  /** q237 oracle: same brute-grade / ANN-rank frames as the q136
    * oracle, per-term e9 grid, integer-fed final divisions.
    */
  private val retrievalMetricsOracle: String =
    s"""$lshCtePrefix,
       |bsims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM u q CROSS JOIN u d
       |  WHERE q.vec_id < 50),
       |be AS (
       |  SELECT qid, did, CAST(4 - rn AS BIGINT) AS rel FROM (
       |    SELECT qid, did,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |    FROM bsims) WHERE rn <= 3),
       |lsims AS (
       |  SELECT q.vec_id AS qid, d.vec_id AS did,
       |         list_inner_product(q.uv, d.uv) AS sim
       |  FROM s q JOIN s d ON q.sig = d.sig
       |  WHERE q.vec_id < 50),
       |la AS (
       |  SELECT qid, did, rn AS arn FROM (
       |    SELECT qid, did,
       |           ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
       |    FROM lsims) WHERE rn <= 3),
       |j AS (
       |  SELECT la.qid, la.arn, COALESCE(be.rel, 0) AS gain
       |  FROM la LEFT JOIN be ON be.qid = la.qid AND be.did = la.did),
       |t AS (
       |  SELECT qid, arn, gain,
       |         CASE WHEN gain > 0
       |              THEN CAST(ROUND(gain / log2(arn + 1) * 1e9) AS BIGINT)
       |              ELSE 0 END AS term_e9
       |  FROM j),
       |g AS (
       |  SELECT qid,
       |         CAST(SUM(CASE WHEN gain > 0 THEN 1 ELSE 0 END) AS BIGINT) AS hits,
       |         MIN(CASE WHEN gain > 0 THEN arn END) AS minarn,
       |         CAST(SUM(term_e9) AS BIGINT) AS dcg_e9
       |  FROM t GROUP BY qid)
       |SELECT qid, hits,
       |       COALESCE(CAST(ROUND(1000000.0 / minarn) AS BIGINT), 0) AS rr_e6,
       |       CAST(ROUND(CAST(dcg_e9 AS DOUBLE) * 1000000.0 /
       |            CAST(ROUND((3.0 / log2(2.0) + 2.0 / log2(3.0) +
       |                        1.0 / log2(4.0)) * 1e9) AS BIGINT)) AS BIGINT)
       |         AS ndcg_e6
       |FROM g ORDER BY qid""".stripMargin

  /** q64's oracle on the 5-query probe set, shared by q422 (rebuilt
    * store) and q426 (append-maintained store): both stores hold the
    * same vectors reorganized, so both must answer the from-raw
    * cosine top-3 identically.
    */
  private val ivfProbeOracle: String =
    """WITH sims AS (
      |  SELECT q.vec_id AS qid, d.vec_id AS did,
      |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
      |                                CAST(d.embedding AS DOUBLE[])) AS sim
      |  FROM embeddings q JOIN embeddings d ON q.label = d.label
      |  WHERE q.vec_id < 5
      |), ranked AS (
      |  SELECT qid, did, sim,
      |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
      |  FROM sims)
      |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
      |FROM ranked WHERE rn <= 3
      |ORDER BY qid, did""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // q317's e3 element grid, exact HUGEINT dim-sum/norm moments, one
    // mirrored isotropy division.
    "q399_isotropy" ->
      """WITH v AS (
        |  SELECT CAST(label AS BIGINT) AS label,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT))
        |           AS qv
        |  FROM embeddings),
        |per AS (
        |  SELECT label, COUNT(*) AS n_vecs,
        |         SUM(CAST(list_sum(list_transform(qv, x -> x * x))
        |                  AS HUGEINT)) AS q2
        |  FROM v GROUP BY label),
        |ds AS (
        |  SELECT label, i, CAST(SUM(qv[i]) AS HUGEINT) AS sd
        |  FROM v CROSS JOIN range(1, 65) r(i)
        |  GROUP BY label, i),
        |s2 AS (SELECT label, SUM(sd * sd) AS s2 FROM ds GROUP BY label)
        |SELECT per.label, per.n_vecs,
        |  CAST(ROUND(CAST(s2.s2 AS DOUBLE) /
        |             (CAST(per.n_vecs AS DOUBLE) * CAST(per.q2 AS DOUBLE))
        |             * 1000000) AS BIGINT) AS isotropy_e6
        |FROM per JOIN s2 USING (label)
        |ORDER BY per.label""".stripMargin,
    // Same (sim DESC, did) kNN, same per-term e9 ln grid, same
    // mirrored −k·1e9/Σ chain, identical degenerate guards.
    "q356_lid_mle" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |bs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q CROSS JOIN u d
        |  WHERE q.vec_id < 50 AND d.vec_id <> q.vec_id),
        |kn AS (
        |  SELECT qid, did, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY sim DESC, did) AS rn
        |  FROM bs),
        |dk AS (SELECT qid, sim AS simk FROM kn WHERE rn = 10),
        |terms AS (
        |  SELECT k.qid,
        |         CAST(ROUND(ln((1.0 - k.sim) / (1.0 - d.simk))
        |           * 1000000000) AS BIGINT) AS term_e9
        |  FROM kn k JOIN dk d ON d.qid = k.qid
        |  WHERE k.rn <= 10 AND k.sim < 1.0 AND d.simk < 1.0)
        |SELECT qid, CAST(COUNT(*) AS BIGINT) AS k_used,
        |  CASE WHEN SUM(term_e9) < 0 THEN
        |    CAST(ROUND(-CAST(COUNT(*) AS DOUBLE) * 1000000000.0
        |      / CAST(SUM(term_e9) AS DOUBLE) * 10000) AS BIGINT)
        |  END AS lid_e4
        |FROM terms GROUP BY qid ORDER BY qid""".stripMargin,
    // Same per-pair e9 grid FIRST, exact HUGEINT moments, mirrored
    // mean/std chains, exact extremes and tail count.
    "q357_cosine_concentration" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings WHERE vec_id < 64),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |p AS (
        |  SELECT CAST(ROUND(list_inner_product(a.uv, b.uv) * 1000000000)
        |           AS BIGINT) AS s9
        |  FROM u a JOIN u b ON a.vec_id < b.vec_id),
        |m AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(s9) AS BIGINT) AS ss,
        |         SUM(CAST(s9 AS HUGEINT) * s9) AS sqq,
        |         CAST(MIN(s9) AS BIGINT) AS min_e9,
        |         CAST(MAX(s9) AS BIGINT) AS max_e9,
        |         CAST(SUM(CASE WHEN s9 > 300000000 THEN 1 ELSE 0 END)
        |           AS BIGINT) AS n_gt03
        |  FROM p)
        |SELECT n AS n_pairs,
        |  CAST(ROUND(CAST(ss AS DOUBLE) / CAST(n AS DOUBLE)
        |    / 1000000000.0 * 1000000) AS BIGINT) AS mean_e6,
        |  CAST(ROUND(SQRT(CAST(CAST(n AS HUGEINT) * sqq
        |      - CAST(ss AS HUGEINT) * ss AS DOUBLE)
        |      / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
        |    / 1000000000.0 * 1000000) AS BIGINT) AS std_e6,
        |  min_e9, max_e9,
        |  CAST(ROUND(CAST(n_gt03 AS DOUBLE) / CAST(n AS DOUBLE)
        |    * 1000000) AS BIGINT) AS frac_gt03_e6
        |FROM m""".stripMargin,
    // Same e9 component grid, half-up integer centroids, EXACT
    // integer cell ranking, identical in-cell (sim DESC, did) probe
    // ranking, exact hit counts.
    "q358_ivf_probe_curve" ->
      """WITH e AS (SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings),
        |u AS (SELECT vec_id, label,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |comp AS (
        |  SELECT vec_id, label, CAST(ord AS BIGINT) - 1 AS i,
        |         CAST(ROUND(v * 1000000000) AS BIGINT) AS s9
        |  FROM (SELECT vec_id, label, UNNEST(uv) AS v,
        |               UNNEST(range(1, len(uv) + 1)) AS ord
        |        FROM u)),
        |cent AS (
        |  SELECT label, i,
        |         CAST(ROUND(CAST(SUM(s9) AS DOUBLE)
        |           / CAST(COUNT(*) AS DOUBLE)) AS BIGINT) AS cv
        |  FROM comp GROUP BY label, i),
        |ip AS (
        |  SELECT c.vec_id AS qid, t.label,
        |         SUM(CAST(c.s9 AS HUGEINT) * t.cv) AS ip
        |  FROM comp c JOIN cent t ON t.i = c.i
        |  WHERE c.vec_id < 50 GROUP BY c.vec_id, t.label),
        |cr AS (
        |  SELECT qid, label,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY ip DESC, label) AS crn
        |  FROM ip),
        |nps AS (SELECT CAST(UNNEST(range(1, 4)) AS BIGINT) AS np),
        |sel AS (SELECT np, qid, label FROM cr JOIN nps ON crn <= np),
        |cs AS (
        |  SELECT s.np, s.qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM sel s JOIN u q ON q.vec_id = s.qid
        |             JOIN u d ON d.label = s.label),
        |ct AS (
        |  SELECT np, qid, did FROM (
        |    SELECT np, qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY np, qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM cs) WHERE rn <= 10),
        |bs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q CROSS JOIN u d WHERE q.vec_id < 50),
        |be AS (
        |  SELECT qid, did FROM (
        |    SELECT qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM bs) WHERE rn <= 10),
        |hits AS (
        |  SELECT mb.np, mb.qid,
        |         CAST(COUNT(ct.did) AS BIGINT) AS h
        |  FROM (SELECT np, qid, did FROM be CROSS JOIN nps) mb
        |  LEFT JOIN ct ON ct.np = mb.np AND ct.qid = mb.qid
        |              AND ct.did = mb.did
        |  GROUP BY mb.np, mb.qid)
        |SELECT np AS nprobe, CAST(COUNT(*) AS BIGINT) AS n_queries,
        |  CAST(SUM(h) AS BIGINT) AS sum_hits,
        |  CAST(ROUND(CAST(SUM(h) AS DOUBLE)
        |    / CAST(COUNT(*) * 10 AS DOUBLE) * 10000) AS BIGINT)
        |    AS mean_recall_e4
        |FROM hits GROUP BY np ORDER BY nprobe""".stripMargin,
    // Same unit vectors, same full-dim ground truth (rn<=10), same
    // re-normalized prefix similarity chain dot/(nq·nd) with
    // (sim DESC, did) ties, exact membership counts.
    "q353_matryoshka_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |bs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q CROSS JOIN u d WHERE q.vec_id < 50),
        |be AS (
        |  SELECT qid, did FROM (
        |    SELECT qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM bs) WHERE rn <= 10),
        |ms AS (SELECT CAST(UNNEST([8, 16, 32]) AS BIGINT) AS m),
        |sn AS (
        |  SELECT m, vec_id, sl, sqrt(list_inner_product(sl, sl)) AS nrm
        |  FROM (SELECT m, vec_id, list_slice(uv, 1, CAST(m AS INT)) AS sl
        |        FROM u CROSS JOIN ms)),
        |ts AS (
        |  SELECT q.m, q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.sl, d.sl) / (q.nrm * d.nrm) AS sim
        |  FROM sn q JOIN sn d ON d.m = q.m WHERE q.vec_id < 50),
        |tt AS (
        |  SELECT m, qid, did FROM (
        |    SELECT m, qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY m, qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM ts) WHERE rn <= 10),
        |mb AS (SELECT m, qid, did FROM be CROSS JOIN ms)
        |SELECT mb.m, mb.qid, CAST(COUNT(tt.did) AS BIGINT) AS hits,
        |       CAST(ROUND(COUNT(tt.did) / 10.0 * 10000) AS BIGINT)
        |         AS recall_e4
        |FROM mb LEFT JOIN tt ON tt.m = mb.m AND tt.qid = mb.qid
        |                    AND tt.did = mb.did
        |GROUP BY mb.m, mb.qid ORDER BY mb.m, mb.qid""".stripMargin,
    // Same fixed 200-probe kNN, zero-inclusive in-degrees,
    // exact n-scaled deviations, HUGEINT moments, one mirrored
    // m₂·√m₂ skewness chain.
    "q354_hubness" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |bs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q CROSS JOIN u d
        |  WHERE q.vec_id < 200 AND d.vec_id <> q.vec_id),
        |kn AS (
        |  SELECT qid, did FROM (
        |    SELECT qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM bs) WHERE rn <= 10),
        |cnt AS (
        |  SELECT u.vec_id AS did, CAST(COUNT(kn.did) AS BIGINT) AS d
        |  FROM u LEFT JOIN kn ON kn.did = u.vec_id GROUP BY u.vec_id),
        |mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
        |               CAST(SUM(d) AS BIGINT) AS sd FROM cnt),
        |nq AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_queries
        |       FROM u WHERE vec_id < 200),
        |dv AS (SELECT d, CAST(n AS HUGEINT) * d - sd AS dev, n
        |       FROM cnt CROSS JOIN mom),
        |ag AS (
        |  SELECT CAST(MAX(n) AS BIGINT) AS n_corpus,
        |         CAST(MAX(d) AS BIGINT) AS max_indeg,
        |         CAST(SUM(CASE WHEN d = 0 THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_zero,
        |         SUM(dev * dev) AS m2, SUM(dev * dev * dev) AS m3
        |  FROM dv)
        |SELECT n_corpus, n_queries, max_indeg, n_zero,
        |  CASE WHEN m2 > 0 THEN
        |    CAST(ROUND(CAST(m3 AS DOUBLE) * SQRT(CAST(n_corpus AS DOUBLE))
        |      / (CAST(m2 AS DOUBLE) * SQRT(CAST(m2 AS DOUBLE)))
        |      * 1000000) AS BIGINT)
        |  END AS skew_e6
        |FROM ag CROSS JOIN nq""".stripMargin,
    // Same e6-gridded integer covariance cells (q213 moment shape on
    // the FULL grid), 4 unrolled exact-integer power rounds with the
    // identical (2|w|·1e6 + m) // 2m half-up renormalization, one
    // mirrored Rayleigh division at the end.
    "q309_pca_power" -> pcaPowerOracle,
    // Same e3 quantization, 8 unrolled farthest-point rounds — exact
    // integer squared distances, LEAST state, (md DESC, vec_id)
    // argmax; no float anywhere.
    "q311_kcenter_coreset" -> kcenterOracle,
    // Same id-midpoint halves, exact HUGEINT sum-vector moments, one
    // mirrored sqrt division per label.
    "q323_embed_drift" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |bounds AS (SELECT MIN(vec_id) AS mn, MAX(vec_id) AS mx FROM q),
        |hv AS (
        |  SELECT label, qv,
        |         CASE WHEN vec_id <= (mn + mx) // 2 THEN 0 ELSE 1 END AS h
        |  FROM q CROSS JOIN bounds),
        |cn AS (SELECT label, h, CAST(COUNT(*) AS BIGINT) AS n
        |       FROM hv GROUP BY 1, 2),
        |di AS (
        |  SELECT label, h, i.i AS i, CAST(SUM(qv[i.i + 1]) AS BIGINT) AS sx
        |  FROM hv CROSS JOIN range(64) i(i) GROUP BY 1, 2, 3),
        |sv AS (SELECT label, h, list(sx ORDER BY i) AS sv
        |       FROM di GROUP BY 1, 2),
        |a AS (SELECT sv.label, cn.n AS n_first, sv.sv AS sa
        |      FROM sv JOIN cn USING (label, h) WHERE h = 0),
        |b AS (SELECT sv.label, cn.n AS n_second, sv.sv AS sb
        |      FROM sv JOIN cn USING (label, h) WHERE h = 1)
        |SELECT a.label, n_first, n_second,
        |       CAST(ROUND(
        |         CAST(list_sum(list_transform(range(1, 65),
        |                k -> CAST(sa[k] AS HUGEINT) * sb[k])) AS DOUBLE)
        |         / SQRT(CAST(
        |             list_sum(list_transform(range(1, 65),
        |               k -> CAST(sa[k] AS HUGEINT) * sa[k]))
        |             * list_sum(list_transform(range(1, 65),
        |               k -> CAST(sb[k] AS HUGEINT) * sb[k])) AS DOUBLE))
        |         * 1000000) AS BIGINT) AS drift_cos_e6
        |FROM a JOIN b ON b.label = a.label
        |ORDER BY a.label""".stripMargin,
    // Same fixed-offset/lead pair sets, exact integer dot/norm
    // moments, per-pair mirrored exp/cos e9-gridded before exact
    // sums, mirrored final ln/mean (margins pinned in Round9nSpec).
    "q317_align_uniformity" ->
      """WITH q0 AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |q AS (
        |  SELECT vec_id, label, qv,
        |         list_sum(list_transform(qv, x -> x * x)) AS n2
        |  FROM q0
        |  WHERE list_sum(list_transform(qv, x -> x * x)) > 0),
        |up AS (
        |  SELECT a.qv AS qv, a.n2 AS n2, b.qv AS yqv, b.n2 AS yn2
        |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
        |  UNION ALL
        |  SELECT a.qv, a.n2, b.qv, b.n2
        |  FROM q a JOIN q b ON b.vec_id = a.vec_id + 7919),
        |ut AS (
        |  SELECT CAST(ROUND(exp(
        |    4.0 * (CAST(list_sum(list_transform(range(1, len(qv) + 1),
        |                   k -> qv[k] * yqv[k])) AS DOUBLE)
        |           / SQRT(CAST(n2 * yn2 AS DOUBLE))) - 4.0)
        |    * 1000000000) AS BIGINT) AS t
        |  FROM up),
        |un AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_unif,
        |              CAST(SUM(t) AS BIGINT) AS st FROM ut),
        |ap AS (
        |  SELECT qv, n2,
        |         LEAD(qv) OVER (PARTITION BY label ORDER BY vec_id) AS yqv,
        |         LEAD(n2) OVER (PARTITION BY label ORDER BY vec_id) AS yn2
        |  FROM q),
        |at AS (
        |  SELECT CAST(ROUND((2.0 - 2.0 *
        |    (CAST(list_sum(list_transform(range(1, len(qv) + 1),
        |             k -> qv[k] * yqv[k])) AS DOUBLE)
        |     / SQRT(CAST(n2 * yn2 AS DOUBLE))))
        |    * 1000000000) AS BIGINT) AS t
        |  FROM ap WHERE yqv IS NOT NULL),
        |an AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_align,
        |              CAST(SUM(t) AS BIGINT) AS sa FROM at)
        |SELECT n_unif, n_align,
        |       CAST(ROUND(ln(CAST(st AS DOUBLE) / CAST(n_unif AS DOUBLE)
        |                     / 1000000000.0) * 1000000) AS BIGINT)
        |         AS uniformity_e6,
        |       CAST(ROUND(CAST(sa AS DOUBLE) / CAST(n_align AS DOUBLE)
        |                  / 1000000000.0 * 1000000) AS BIGINT) AS align_e6
        |FROM un CROSS JOIN an""".stripMargin,
    // Same exact Σ(n·x−S)² integer distance moments, ONE mirrored
    // sqrt/n per (row, centroid), per-row silhouette e9-gridded
    // before the exact per-label sum, mirrored mean chain.
    "q316_silhouette" ->
      """WITH q AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label,
        |         list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |di AS (
        |  SELECT label, i.i AS i, CAST(SUM(qv[i.i + 1]) AS BIGINT) AS sx
        |  FROM q CROSS JOIN range(64) i(i) GROUP BY label, i.i),
        |cent AS (
        |  SELECT d.label AS cl, cn.cn, list(d.sx ORDER BY d.i) AS sv
        |  FROM di d JOIN (SELECT label, CAST(COUNT(*) AS BIGINT) AS cn
        |                  FROM q GROUP BY label) cn ON cn.label = d.label
        |  GROUP BY d.label, cn.cn),
        |dl AS (
        |  SELECT q.vec_id, q.label, c.cl,
        |         SQRT(CAST(list_sum(list_transform(range(1, len(q.qv) + 1),
        |           k -> CAST(c.cn * q.qv[k] - c.sv[k] AS HUGEINT)
        |                * (c.cn * q.qv[k] - c.sv[k]))) AS DOUBLE))
        |           / CAST(c.cn AS DOUBLE) AS dist
        |  FROM q CROSS JOIN cent c),
        |own AS (SELECT vec_id, label, dist AS a FROM dl WHERE label = cl),
        |oth AS (SELECT vec_id, MIN(dist) AS b FROM dl WHERE label <> cl
        |        GROUP BY vec_id),
        |srow AS (
        |  SELECT o.label,
        |         CASE WHEN GREATEST(a, b) > 0.0 THEN
        |           CAST(ROUND((b - a) / GREATEST(a, b) * 1000000000)
        |                AS BIGINT)
        |         ELSE 0 END AS s_e9
        |  FROM own o JOIN oth USING (vec_id))
        |SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
        |       CAST(SUM(s_e9) AS BIGINT) AS s_sum_e9,
        |       CAST(ROUND(CAST(SUM(s_e9) AS DOUBLE)
        |         / CAST(COUNT(*) AS DOUBLE) / 1000000000.0
        |         * 1000000) AS BIGINT) AS mean_s_e6
        |FROM srow GROUP BY label
        |ORDER BY label""".stripMargin,
    // Same full-grid cells; trace and Frobenius moments are exact
    // HUGEINT sums, one mirrored PR division e4.
    "q312_embed_effdim" ->
      """WITH q AS (
        |  SELECT list_transform(embedding,
        |           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        |  FROM embeddings),
        |g AS (
        |  SELECT i.i AS i, j.j AS j, qv[i.i + 1] AS qi, qv[j.j + 1] AS qj
        |  FROM q CROSS JOIN range(64) i(i) CROSS JOIN range(64) j(j)),
        |cells AS (
        |  SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j,
        |    CAST(ROUND(
        |      CAST(CAST(COUNT(*) AS HUGEINT)
        |             * SUM(CAST(qi AS HUGEINT) * qj)
        |           - CAST(SUM(qi) AS HUGEINT) * SUM(qj) AS DOUBLE) /
        |      CAST(CAST(COUNT(*) AS HUGEINT) * COUNT(*) AS DOUBLE)
        |      * 1000000) AS BIGINT) AS c
        |  FROM g GROUP BY 1, 2)
        |SELECT CAST(COUNT(CASE WHEN i = j THEN 1 END) AS BIGINT) AS d,
        |       CAST(SUM(CASE WHEN i = j THEN c END) AS BIGINT) AS tr,
        |       CAST(ROUND(
        |         CAST(CAST(SUM(CASE WHEN i = j THEN c END) AS HUGEINT)
        |              * SUM(CASE WHEN i = j THEN c END) AS DOUBLE)
        |         / CAST(SUM(CAST(c AS HUGEINT) * c) AS DOUBLE)
        |         * 10000) AS BIGINT) AS pr_e4
        |FROM cells""".stripMargin,
    "q237_retrieval_metrics" -> retrievalMetricsOracle,
    // Same unit vectors and x·(127/max|x|) floor codes; quantized rank
    // by the EXACT integer code dot, ground truth by the mirrored
    // double dot, recall joined on (qid, did).
    "q278_quant_recall" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |           FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |c AS (SELECT vec_id, uv,
        |        list_transform(uv, x -> CAST(floor(x *
        |          (127.0 / list_max(list_transform(uv, y -> abs(y)))))
        |          AS BIGINT)) AS q8
        |      FROM u),
        |bs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q CROSS JOIN u d
        |  WHERE q.vec_id < 50),
        |be AS (
        |  SELECT qid, did FROM (
        |    SELECT qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY sim DESC, did) AS rn
        |    FROM bs) WHERE rn <= 5),
        |qs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         CAST(list_inner_product(CAST(q.q8 AS DOUBLE[]),
        |                                 CAST(d.q8 AS DOUBLE[])) AS BIGINT)
        |           AS qsim
        |  FROM c q CROSS JOIN c d
        |  WHERE q.vec_id < 50),
        |qe AS (
        |  SELECT qid, did FROM (
        |    SELECT qid, did,
        |           ROW_NUMBER() OVER (PARTITION BY qid
        |                              ORDER BY qsim DESC, did) AS rn
        |    FROM qs) WHERE rn <= 5)
        |SELECT be.qid, CAST(COUNT(qe.did) AS BIGINT) AS hits,
        |       CAST(ROUND(COUNT(qe.did) / 5.0 * 10000) AS BIGINT)
        |         AS recall_e4
        |FROM be LEFT JOIN qe ON be.qid = qe.qid AND be.did = qe.did
        |GROUP BY be.qid
        |ORDER BY be.qid""".stripMargin,
    // Independent recompute: same raw-dot neighbor order, same
    // (votes DESC, label) vote pick.
    "q253_knn_classify" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label
        |           FROM embeddings),
        |u AS (SELECT vec_id, label,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |sims AS (
        |  SELECT q.vec_id AS qid, q.label AS tl, d.vec_id AS did,
        |         d.label AS dl, list_inner_product(q.uv, d.uv) AS sim
        |  FROM u q JOIN u d ON d.vec_id % 7 <> 0
        |  WHERE q.vec_id % 7 = 0 AND q.vec_id < 1400),
        |nn AS (
        |  SELECT qid, tl, dl,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY sim DESC, did) AS rn
        |  FROM sims QUALIFY rn <= 5),
        |votes AS (
        |  SELECT qid, tl, dl, COUNT(*) AS votes
        |  FROM nn GROUP BY 1, 2, 3),
        |pick AS (
        |  SELECT qid, tl, dl, votes,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY votes DESC, dl) AS vr
        |  FROM votes QUALIFY vr = 1)
        |SELECT qid, CAST(tl AS BIGINT) AS true_label,
        |       CAST(dl AS BIGINT) AS pred_label,
        |       CAST(votes AS BIGINT) AS votes,
        |       CAST(CASE WHEN dl = tl THEN 1 ELSE 0 END AS BIGINT) AS correct
        |FROM pick
        |ORDER BY qid""".stripMargin,
    // Independent recompute: unit vectors, cross-label probe pairs,
    // identical e2 grid for BOTH the band filter and the rank order
    // (window row_number ≡ the Spark side's bounded-heap total order:
    // sim_c DESC, did ASC).
    "q244_hard_negatives" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev, label
        |           FROM embeddings),
        |u AS (SELECT vec_id, label,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |pairs AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         CAST(ROUND(list_inner_product(q.uv, d.uv) * 100) AS BIGINT)
        |           AS sim_c
        |  FROM u q JOIN u d ON q.label <> d.label
        |  WHERE q.vec_id % 7 = 0 AND q.vec_id < 1400
        |    AND d.vec_id % 7 <> 0),
        |ranked AS (
        |  SELECT qid, did, sim_c,
        |         ROW_NUMBER() OVER (PARTITION BY qid
        |                            ORDER BY sim_c DESC, did) AS rnk
        |  FROM pairs WHERE sim_c >= 15 AND sim_c < 40)
        |SELECT qid, CAST(rnk AS BIGINT) AS rnk, did, sim_c
        |FROM ranked WHERE rnk <= 5
        |ORDER BY qid, rnk""".stripMargin,
    // Same key-projected left join; NULL dims range when a source has
    // no embeddings (both engines).
    "q196_embed_coverage" ->
      """SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |  CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_embedded,
        |  CAST(ROUND(CAST(SUM(CASE WHEN e.vec_id IS NOT NULL THEN 1 ELSE 0 END)
        |                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) * 10000)
        |       AS BIGINT) AS coverage_e4,
        |  CAST(MIN(len(e.embedding)) AS BIGINT) AS min_dims,
        |  CAST(MAX(len(e.embedding)) AS BIGINT) AS max_dims
        |FROM documents d
        |LEFT JOIN embeddings e ON e.vec_id = d.doc_id
        |GROUP BY d.source ORDER BY d.source""".stripMargin,
    // Same sum-vector algebra over the same unit vectors (q123's
    // list_transform normalization); only summation order differs,
    // absorbed by the e4 grid.
    "q192_label_separability" ->
      """WITH e AS (
        |  SELECT CAST(label AS BIGINT) AS lbl,
        |         CAST(embedding AS DOUBLE[]) AS ev
        |  FROM embeddings),
        |u AS (SELECT lbl,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev)))
        |          AS uv
        |      FROM e),
        |x AS (
        |  SELECT lbl, CAST(ord AS BIGINT) - 1 AS pos, v
        |  FROM (SELECT lbl, UNNEST(uv) AS v,
        |               UNNEST(range(1, len(uv) + 1)) AS ord
        |        FROM u)),
        |sv AS (SELECT lbl, pos, SUM(v) AS sv FROM x GROUP BY 1, 2),
        |g AS (SELECT pos, SUM(sv) AS gv FROM sv GROUP BY 1),
        |pl AS (
        |  SELECT s.lbl, SUM(s.sv * s.sv) AS s2, SUM(s.sv * g.gv) AS sg
        |  FROM sv s JOIN g ON g.pos = s.pos GROUP BY 1),
        |c AS (SELECT CAST(label AS BIGINT) AS lbl, CAST(COUNT(*) AS BIGINT) AS n
        |      FROM embeddings GROUP BY 1),
        |t AS (SELECT SUM(n) AS ntot FROM c)
        |SELECT pl.lbl, c.n,
        |  CAST(ROUND((s2 - c.n) / CAST(c.n * (c.n - 1) AS DOUBLE) * 10000)
        |       AS BIGINT) AS intra_e4,
        |  CAST(ROUND((sg - s2) / CAST(c.n * (t.ntot - c.n) AS DOUBLE) * 10000)
        |       AS BIGINT) AS inter_e4,
        |  CAST(ROUND(((s2 - c.n) / CAST(c.n * (c.n - 1) AS DOUBLE)
        |              - (sg - s2) / CAST(c.n * (t.ntot - c.n) AS DOUBLE))
        |             * 10000) AS BIGINT) AS margin_e4
        |FROM pl JOIN c ON c.lbl = pl.lbl, t
        |ORDER BY pl.lbl""".stripMargin,
    // Identical rank-quota order statistics (2·rn ≥ n picks the same
    // data value both engines); |v − med| is one exact subtraction.
    "q181_embed_dim_mad" ->
      """WITH x AS (
        |  SELECT vec_id, CAST(ord AS BIGINT) - 1 AS pos, CAST(vf AS DOUBLE) AS v
        |  FROM (SELECT vec_id, UNNEST(embedding) AS vf,
        |               UNNEST(range(1, len(embedding) + 1)) AS ord
        |        FROM embeddings)),
        |rv AS (
        |  SELECT pos, v,
        |         ROW_NUMBER() OVER (PARTITION BY pos ORDER BY v, vec_id) AS rn,
        |         COUNT(*) OVER (PARTITION BY pos) AS n
        |  FROM x),
        |med AS (
        |  SELECT pos, MIN(v) AS med, MAX(n) AS n
        |  FROM rv WHERE rn * 2 >= n GROUP BY pos),
        |d AS (
        |  SELECT x.pos, ABS(x.v - m.med) AS d, m.med, m.n,
        |         ROW_NUMBER() OVER (PARTITION BY x.pos
        |                            ORDER BY ABS(x.v - m.med), x.vec_id) AS rn
        |  FROM x JOIN med m ON m.pos = x.pos)
        |SELECT pos, CAST(MAX(n) AS BIGINT) AS n,
        |  CAST(ROUND(MIN(med) * 10000) AS BIGINT) AS med_e4,
        |  CAST(ROUND(MIN(d) * 10000) AS BIGINT) AS mad_e4
        |FROM d WHERE rn * 2 >= n GROUP BY pos ORDER BY pos""".stripMargin,
    // Same unnest-with-ordinal as the q44 oracle; the float is cast to
    // DOUBLE BEFORE any arithmetic (FLOAT*FLOAT would square in
    // 32-bit), and σ uses the same explicit-moment expression.
    "q176_embed_dim_stats" ->
      """WITH x AS (
        |  SELECT CAST(ord AS BIGINT) - 1 AS pos, CAST(vf AS DOUBLE) AS v
        |  FROM (SELECT UNNEST(embedding) AS vf,
        |               UNNEST(range(1, len(embedding) + 1)) AS ord
        |        FROM embeddings))
        |SELECT pos, CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(ROUND(AVG(v) * 10000) AS BIGINT) AS mean_e4,
        |  CAST(ROUND(SQRT(AVG(v * v) - AVG(v) * AVG(v)) * 10000) AS BIGINT)
        |    AS std_e4,
        |  CAST(ROUND(MIN(v) * 10000) AS BIGINT) AS min_e4,
        |  CAST(ROUND(MAX(v) * 10000) AS BIGINT) AS max_e4
        |FROM x GROUP BY pos ORDER BY pos""".stripMargin,
    // Same per-dim centroid derivation as the q44 oracle (unrounded);
    // the cosine is spelled in the identical arithmetic shape as the
    // Spark agg so the only cross-engine delta is summation order,
    // absorbed by the e4 grid (margin spec-pinned).
    "q169_centroid_matrix" ->
      """WITH cent AS (
        |  SELECT CAST(label AS BIGINT) AS lbl, CAST(ord AS BIGINT) - 1 AS pos,
        |         AVG(v) AS c
        |  FROM (SELECT label, UNNEST(embedding) AS v,
        |               UNNEST(range(1, len(embedding) + 1)) AS ord
        |        FROM embeddings)
        |  GROUP BY label, ord)
        |SELECT a.lbl AS la, b.lbl AS lb,
        |  CAST(ROUND(SUM(a.c * b.c) /
        |             (SQRT(SUM(a.c * a.c)) * SQRT(SUM(b.c * b.c))) * 10000)
        |       AS BIGINT) AS cos_e4
        |FROM cent a JOIN cent b ON a.pos = b.pos AND a.lbl < b.lbl
        |GROUP BY a.lbl, b.lbl ORDER BY la, lb""".stripMargin,
    "q112_kmeans_step" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |seeds AS (SELECT vec_id AS cid, uv AS cu FROM u WHERE vec_id < 8),
        |sims AS (
        |  SELECT u.vec_id, s.cid, u.uv,
        |         ROUND(list_inner_product(u.uv, s.cu), 6) AS sim
        |  FROM u CROSS JOIN seeds s),
        |asg AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims),
        |x AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |      FROM asg WHERE rn = 1)
        |SELECT cid, CAST(ord AS BIGINT) - 1 AS pos,
        |       CAST(COUNT(*) AS BIGINT) AS n_members,
        |       CAST(ROUND(AVG(x) * 10000) AS BIGINT) AS c_e4
        |FROM x GROUP BY cid, ord ORDER BY cid, pos""".stripMargin,
    // q421: q112's round unrolled TWICE — round 1 rebuilds spherical
    // centroids (per-dim mean, L2 renormalize — kmeansCentroidRound's
    // spelling), round 2 re-assigns and re-means. The Spark side reads
    // round-1 state from the persisted store; the oracle replays it.
    "q421_kmeans_warm" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |seeds AS (SELECT vec_id AS cid, uv AS cu FROM u WHERE vec_id < 8),
        |sims1 AS (
        |  SELECT u.vec_id, s.cid, u.uv,
        |         ROUND(list_inner_product(u.uv, s.cu), 6) AS sim
        |  FROM u CROSS JOIN seeds s),
        |asg1 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims1),
        |x1 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg1 WHERE rn = 1),
        |m1 AS (SELECT cid, ord, AVG(x) AS c FROM x1 GROUP BY cid, ord),
        |cl AS (SELECT cid, list(c ORDER BY ord) AS cv FROM m1 GROUP BY cid),
        |c1 AS (SELECT cid,
        |         list_transform(cv, x -> x / sqrt(list_inner_product(cv, cv))) AS cu
        |       FROM cl),
        |sims2 AS (
        |  SELECT u.vec_id, c.cid, u.uv,
        |         ROUND(list_inner_product(u.uv, c.cu), 6) AS sim
        |  FROM u CROSS JOIN c1 c),
        |asg2 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims2),
        |x2 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg2 WHERE rn = 1)
        |SELECT cid, CAST(ord AS BIGINT) - 1 AS pos,
        |       CAST(COUNT(*) AS BIGINT) AS n_members,
        |       CAST(ROUND(AVG(x) * 10000) AS BIGINT) AS c_e4
        |FROM x2 GROUP BY cid, ord ORDER BY cid, pos""".stripMargin,
    // q431: the whole re-quantization chain replayed from raw —
    // deterministic sample (total at gate SFs, spelled faithfully),
    // ⌊√N⌋ lowest-id seeds, TWO Lloyd rounds (q421's CTE spelling),
    // final assignment of every vector to the trained centroids, and
    // the cell-local top-3 probe. Assignment ranks on ROUND(sim, 6)
    // with lowest-cid ties, matching the Spark max_by ordering.
    "q431_ivf_requant_probe" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |params AS (SELECT GREATEST(1, COUNT(*) // 20000) AS m,
        |                  CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS ncells
        |           FROM u),
        |samp AS (SELECT u.* FROM u, params WHERE vec_id % m = 0),
        |seeds AS (
        |  SELECT vec_id AS cid, uv AS cu FROM (
        |    SELECT vec_id, uv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk
        |    FROM samp), params
        |  WHERE rnk <= ncells),
        |sims1 AS (
        |  SELECT sm.vec_id, s.cid, sm.uv,
        |         ROUND(list_inner_product(sm.uv, s.cu), 6) AS sim
        |  FROM samp sm CROSS JOIN seeds s),
        |asg1 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims1),
        |x1 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg1 WHERE rn = 1),
        |m1 AS (SELECT cid, ord, AVG(x) AS c FROM x1 GROUP BY cid, ord),
        |cl1 AS (SELECT cid, list(c ORDER BY ord) AS cv FROM m1 GROUP BY cid),
        |c1 AS (SELECT cid,
        |         list_transform(cv, x -> x / sqrt(list_inner_product(cv, cv))) AS cu
        |       FROM cl1),
        |sims2 AS (
        |  SELECT sm.vec_id, c.cid, sm.uv,
        |         ROUND(list_inner_product(sm.uv, c.cu), 6) AS sim
        |  FROM samp sm CROSS JOIN c1 c),
        |asg2 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims2),
        |x2 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg2 WHERE rn = 1),
        |m2 AS (SELECT cid, ord, AVG(x) AS c FROM x2 GROUP BY cid, ord),
        |cl2 AS (SELECT cid, list(c ORDER BY ord) AS cv FROM m2 GROUP BY cid),
        |c2 AS (SELECT cid,
        |         list_transform(cv, x -> x / sqrt(list_inner_product(cv, cv))) AS cu
        |       FROM cl2),
        |simsF AS (
        |  SELECT u.vec_id, c.cid,
        |         ROUND(list_inner_product(u.uv, c.cu), 6) AS sim
        |  FROM u CROSS JOIN c2 c),
        |asgF AS (
        |  SELECT vec_id, cid AS cell,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM simsF),
        |cells AS (SELECT a.vec_id, a.cell, u.uv
        |          FROM asgF a JOIN u USING (vec_id) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, uv AS qu, cell FROM cells WHERE vec_id < 5),
        |top AS (
        |  SELECT q.qid, d.vec_id AS did,
        |         list_inner_product(q.qu, d.uv) AS sim,
        |         ROW_NUMBER() OVER (PARTITION BY q.qid
        |           ORDER BY list_inner_product(q.qu, d.uv) DESC, d.vec_id) AS rn
        |  FROM q JOIN cells d ON d.cell = q.cell)
        |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
        |FROM top WHERE rn <= 3 ORDER BY qid, did""".stripMargin,
    // q434: q431's replay with the TRAINING restricted to the even-id
    // half (the frozen quantizer of the last re-size) and the final
    // assignment over EVERY vector — append ≡ rebuild-under-the-
    // frozen-quantizer, cross-engine.
    "q434_ivf_requant_append" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |params AS (SELECT GREATEST(1, COUNT(*) // 20000) AS m,
        |                  CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS ncells
        |           FROM u WHERE vec_id % 2 = 0),
        |samp AS (SELECT u.* FROM u, params
        |         WHERE vec_id % 2 = 0 AND vec_id % m = 0),
        |seeds AS (
        |  SELECT vec_id AS cid, uv AS cu FROM (
        |    SELECT vec_id, uv, ROW_NUMBER() OVER (ORDER BY vec_id) AS rnk
        |    FROM samp), params
        |  WHERE rnk <= ncells),
        |sims1 AS (
        |  SELECT sm.vec_id, s.cid, sm.uv,
        |         ROUND(list_inner_product(sm.uv, s.cu), 6) AS sim
        |  FROM samp sm CROSS JOIN seeds s),
        |asg1 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims1),
        |x1 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg1 WHERE rn = 1),
        |m1 AS (SELECT cid, ord, AVG(x) AS c FROM x1 GROUP BY cid, ord),
        |cl1 AS (SELECT cid, list(c ORDER BY ord) AS cv FROM m1 GROUP BY cid),
        |c1 AS (SELECT cid,
        |         list_transform(cv, x -> x / sqrt(list_inner_product(cv, cv))) AS cu
        |       FROM cl1),
        |sims2 AS (
        |  SELECT sm.vec_id, c.cid, sm.uv,
        |         ROUND(list_inner_product(sm.uv, c.cu), 6) AS sim
        |  FROM samp sm CROSS JOIN c1 c),
        |asg2 AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims2),
        |x2 AS (SELECT cid, UNNEST(uv) AS x, UNNEST(range(1, len(uv) + 1)) AS ord
        |       FROM asg2 WHERE rn = 1),
        |m2 AS (SELECT cid, ord, AVG(x) AS c FROM x2 GROUP BY cid, ord),
        |cl2 AS (SELECT cid, list(c ORDER BY ord) AS cv FROM m2 GROUP BY cid),
        |c2 AS (SELECT cid,
        |         list_transform(cv, x -> x / sqrt(list_inner_product(cv, cv))) AS cu
        |       FROM cl2),
        |simsF AS (
        |  SELECT u.vec_id, c.cid,
        |         ROUND(list_inner_product(u.uv, c.cu), 6) AS sim
        |  FROM u CROSS JOIN c2 c),
        |asgF AS (
        |  SELECT vec_id, cid AS cell,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM simsF),
        |cells AS (SELECT a.vec_id, a.cell, u.uv
        |          FROM asgF a JOIN u USING (vec_id) WHERE rn = 1),
        |q AS (SELECT vec_id AS qid, uv AS qu, cell FROM cells WHERE vec_id < 5),
        |top AS (
        |  SELECT q.qid, d.vec_id AS did,
        |         list_inner_product(q.qu, d.uv) AS sim,
        |         ROW_NUMBER() OVER (PARTITION BY q.qid
        |           ORDER BY list_inner_product(q.qu, d.uv) DESC, d.vec_id) AS rn
        |  FROM q JOIN cells d ON d.cell = q.cell)
        |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
        |FROM top WHERE rn <= 3 ORDER BY qid, did""".stripMargin,
    "q61_knn_lsh" -> knnLshOracle,
    // Mutual-kNN mirrored on the same LSH CTEs: per-side top-5 with
    // the identical (sim DESC, id) total order, reversed-pair join.
    "q259_mutual_knn" ->
      s"""$lshCtePrefix,
         |sims AS (
         |  SELECT a.vec_id AS aid, b.vec_id AS bid,
         |         list_inner_product(a.uv, b.uv) AS sim
         |  FROM s a JOIN s b ON a.sig = b.sig
         |  WHERE a.vec_id <> b.vec_id),
         |tops AS (
         |  SELECT aid, bid, sim FROM (
         |    SELECT aid, bid, sim,
         |           ROW_NUMBER() OVER (PARTITION BY aid
         |                              ORDER BY sim DESC, bid) AS rn
         |    FROM sims) WHERE rn <= 5)
         |SELECT x.aid AS vec_a, x.bid AS vec_b,
         |       CAST(ROUND(x.sim * 100) AS BIGINT) AS sim_c
         |FROM tops x JOIN tops y ON x.aid = y.bid AND x.bid = y.aid
         |WHERE x.aid < x.bid
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Mahalanobis mirrored on the e6 component grid: HUGEINT per-dim
    // (n, S, Q), exact rational z² terms e9-gridded per (vector, dim),
    // BIGINT sum — the same single IEEE division per term.
    "q260_mahalanobis" ->
      """WITH comp AS (
        |  SELECT vec_id, label, i.i AS pos,
        |         CAST(ROUND(CAST(embedding[i.i + 1] AS DOUBLE) * 1000000)
        |              AS BIGINT) AS xi
        |  FROM embeddings CROSS JOIN range(64) i(i)),
        |st AS (
        |  SELECT pos, CAST(COUNT(*) AS HUGEINT) AS n,
        |         CAST(SUM(xi) AS HUGEINT) AS s,
        |         CAST(SUM(CAST(xi AS HUGEINT) * xi) AS HUGEINT) AS q
        |  FROM comp GROUP BY pos),
        |terms AS (
        |  SELECT vec_id, label,
        |         CAST(ROUND(CAST((n * xi - s) * (n * xi - s) AS DOUBLE)
        |                    / CAST(n * q - s * s AS DOUBLE)
        |                    * 1000000000) AS BIGINT) AS t
        |  FROM comp JOIN st USING (pos))
        |SELECT vec_id, CAST(label AS BIGINT) AS label,
        |       CAST(SUM(t) AS BIGINT) AS maha2_e9,
        |       CAST(CASE WHEN SUM(t) > 2 * COUNT(*) * 1000000000
        |                 THEN 1 ELSE 0 END AS BIGINT) AS is_outlier
        |FROM terms GROUP BY vec_id, label
        |ORDER BY vec_id""".stripMargin,
    "q230_semantic_decontam" ->
      """WITH sims AS (
        |  SELECT d.vec_id AS did,
        |         CAST(ROUND(list_cosine_similarity(
        |                CAST(e.embedding AS DOUBLE[]),
        |                CAST(d.embedding AS DOUBLE[])) * 100) AS BIGINT)
        |           AS sim_c
        |  FROM embeddings e, embeddings d
        |  WHERE e.vec_id % 7 = 0 AND e.vec_id < 1400 AND d.vec_id % 7 <> 0)
        |SELECT did, MAX(sim_c) AS max_sim_c,
        |       CAST(SUM(CASE WHEN sim_c >= 40 THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_close,
        |       CAST(CASE WHEN MAX(sim_c) >= 40 THEN 1 ELSE 0 END AS BIGINT)
        |         AS contaminated
        |FROM sims GROUP BY did
        |ORDER BY did""".stripMargin,
    "q60_knn_brute" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(d.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings q, embeddings d WHERE q.vec_id < 50
        |), ranked AS (
        |  SELECT qid, did, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
        |  FROM sims)
        |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
        |FROM ranked WHERE rn <= 5
        |ORDER BY qid, did""".stripMargin,
    "q64_knn_ivf" ->
      """WITH sims AS (
        |  SELECT q.vec_id AS qid, d.vec_id AS did,
        |         list_cosine_similarity(CAST(q.embedding AS DOUBLE[]),
        |                                CAST(d.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings q JOIN embeddings d ON q.label = d.label
        |  WHERE q.vec_id < 50
        |), ranked AS (
        |  SELECT qid, did, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
        |  FROM sims)
        |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
        |FROM ranked WHERE rn <= 3
        |ORDER BY qid, did""".stripMargin,
    // q422: q64's oracle on the 5-query probe set — the store holds the
    // same vectors reorganized by cell, so the answer is identical.
    "q422_ivf_store_probe" -> ivfProbeOracle,
    // Same from-raw oracle by design: the appended two-generation
    // store must answer identically to the rebuilt one — hash equality
    // IS the append ≡ rebuild certification.
    "q426_ivf_append_probe" -> ivfProbeOracle,
    "q66_embedding_neardup" ->
      """WITH sims AS (
        |  SELECT a.label, list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
        |                                         CAST(b.embedding AS DOUBLE[])) AS sim
        |  FROM embeddings a JOIN embeddings b
        |    ON a.label = b.label AND a.vec_id < b.vec_id
        |  WHERE a.vec_id < 1000)
        |SELECT label,
        |       CAST(SUM(CASE WHEN CAST(ROUND(sim * 100) AS BIGINT) >= 30
        |                      THEN 1 ELSE 0 END) AS BIGINT) AS close_pairs,
        |       CAST(ROUND(MAX(sim) * 100) AS BIGINT) AS max_sim_c,
        |       COUNT(*) AS pairs
        |FROM sims GROUP BY label ORDER BY label""".stripMargin,
    "q100_embed_quant" ->
      """WITH t AS (
        |  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e,
        |         127.0 / NULLIF(list_max(list_transform(CAST(embedding AS DOUBLE[]), x -> abs(x))), 0.0) AS s
        |  FROM embeddings)
        |SELECT vec_id,
        |  array_to_string(list_transform(e, x -> CAST(COALESCE(FLOOR(x * s), 0) AS BIGINT)), '|') AS q8,
        |  CAST(ROUND(list_max(list_transform(e, x -> abs(x - FLOOR(x * s) / s))) * 10000) AS BIGINT) AS max_err_e4
        |FROM t ORDER BY vec_id""".stripMargin,
    // Pre-filtered candidate set (documents.lang = 'en' via the
    // vec_id = doc_id join) ranked brute-force; measured margins:
    // rank-3/4 gap 4.7e-4, distance to the *100 rounding boundary
    // 6.4e-3 — both ≫ cross-engine float drift.
    // Same assignment CTE as q112 (ROUND(sim,6) tie-to-lowest-cid),
    // then intra-cluster pairs thresholded on the integer-scaled sim.
    "q123_semdedup" ->
      """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev FROM embeddings),
        |u AS (SELECT vec_id,
        |        list_transform(ev, x -> x / sqrt(list_inner_product(ev, ev))) AS uv
        |      FROM e),
        |seeds AS (SELECT vec_id AS cid, uv AS cu FROM u WHERE vec_id < 8),
        |sims AS (
        |  SELECT u.vec_id, s.cid, u.uv,
        |         ROUND(list_inner_product(u.uv, s.cu), 6) AS sim
        |  FROM u CROSS JOIN seeds s),
        |asg AS (
        |  SELECT vec_id, cid, uv,
        |         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY sim DESC, cid) AS rn
        |  FROM sims),
        |a AS (SELECT vec_id, cid, uv FROM asg WHERE rn = 1),
        |p AS (
        |  SELECT x.cid, y.vec_id AS id_b,
        |         list_inner_product(x.uv, y.uv) AS sim
        |  FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id)
        |SELECT id_b AS vec_id, MAX(cid) AS cid,
        |       CAST(COUNT(*) AS BIGINT) AS n_dups,
        |       CAST(ROUND(MAX(sim) * 100) AS BIGINT) AS max_sim_c
        |FROM p WHERE CAST(ROUND(sim * 100) AS BIGINT) >= 35
        |GROUP BY id_b ORDER BY vec_id""".stripMargin,
    "q121_filtered_knn" ->
      """WITH f AS (
        |  SELECT e.vec_id, CAST(e.embedding AS DOUBLE[]) AS ev
        |  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
        |  WHERE d.lang = 'en'),
        |q AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ev
        |      FROM embeddings WHERE vec_id < 20),
        |sims AS (
        |  SELECT q.vec_id AS qid, f.vec_id AS did,
        |         list_cosine_similarity(q.ev, f.ev) AS sim
        |  FROM q, f),
        |ranked AS (
        |  SELECT qid, did, sim,
        |         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, did) AS rn
        |  FROM sims)
        |SELECT qid, did, CAST(ROUND(sim * 100) AS BIGINT) AS sim_c
        |FROM ranked WHERE rn <= 3
        |ORDER BY qid, did""".stripMargin,
    "q136_ann_recall" -> annRecallOracle,
    "q145_lsh_tuning" -> lshTuningOracle,
    // Sigmoid, residuals, and the update rule spelled term-for-term as
    // the Spark side, including the 0.1 * (g / n) parenthesization.
    "q155_logreg_step" ->
      """WITH b AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> w IN ('a', 'the'))) AS DOUBLE) AS sw,
        |         CASE WHEN lang = 'en' THEN 1.0 ELSE 0.0 END AS y
        |  FROM documents),
        |f AS (SELECT nt / 100.0 AS x1, sw / nt AS x2, y FROM b),
        |r AS (
        |  SELECT 1.0 / (1.0 + exp(-(0.1 + -0.2 * x1 + 0.3 * x2))) - y AS res,
        |         x1, x2
        |  FROM f),
        |g AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
        |         SUM(res) AS g0, SUM(res * x1) AS g1, SUM(res * x2) AS g2
        |  FROM r)
        |SELECT n_docs,
        |  CAST(ROUND(g0 * 1000000) AS BIGINT) AS g0_e6,
        |  CAST(ROUND(g1 * 1000000) AS BIGINT) AS g1_e6,
        |  CAST(ROUND(g2 * 1000000) AS BIGINT) AS g2_e6,
        |  CAST(ROUND((0.1 - 0.1 * (g0 / n_docs)) * 1000000) AS BIGINT) AS w0_new_e6,
        |  CAST(ROUND((-0.2 - 0.1 * (g1 / n_docs)) * 1000000) AS BIGINT) AS w1_new_e6,
        |  CAST(ROUND((0.3 - 0.1 * (g2 / n_docs)) * 1000000) AS BIGINT) AS w2_new_e6
        |FROM g""".stripMargin,
    "q160_calibration" ->
      """WITH b AS (
        |  SELECT CAST(len(string_split(text, ' ')) AS DOUBLE) AS nt,
        |         CAST(len(list_filter(string_split(text, ' '),
        |                              w -> w IN ('a', 'the'))) AS DOUBLE) AS sw,
        |         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
        |  FROM documents),
        |f AS (SELECT nt / 100.0 AS x1, sw / nt AS x2, y FROM b),
        |p AS (
        |  SELECT 1.0 / (1.0 + exp(-(0.1 + -0.2 * x1 + 0.3 * x2))) AS p, y
        |  FROM f),
        |g AS (
        |  SELECT LEAST(FLOOR(p * 10), 9.0) AS binf, y, p FROM p)
        |SELECT CAST(binf AS BIGINT) AS bin,
        |  CAST(COUNT(*) AS BIGINT) AS n,
        |  CAST(SUM(y) AS BIGINT) AS pos,
        |  CAST(ROUND(CAST(SUM(y) AS DOUBLE) / COUNT(*) * 10000) AS BIGINT) AS rate_e4,
        |  CAST(ROUND(SUM(p) / COUNT(*) * 1000000) AS BIGINT) AS mean_p_e6
        |FROM g GROUP BY binf ORDER BY bin""".stripMargin,
  )
}
