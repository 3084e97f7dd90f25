package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable-sketch surface (Apache DataSketches HLL, built into Spark
  * 4 as `hll_sketch_agg`/`hll_union_agg`): the 100 TB answer to
  * distinct-counting is not one giant exact shuffle but a sketch per
  * shard (day, partition, source) persisted as BYTES and UNIONED later
  * — distributive, re-aggregable along any rollup dimension, and
  * mergeable across independent jobs (e.g. daily sketches → monthly
  * uniques without re-reading the month).
  *
  * `approxDistinct` (q25) is the one-shot estimate; this is the
  * persistable/composable form. Sketch bytes are engine-specific, so
  * certification is by unit-tested invariants (merge-consistency,
  * error bound vs exact) rather than a DuckDB oracle.
  */
object Sketches {

  /** Per-group HLL sketch of `c` as binary (store it in the sink next
    * to the group keys; lgConfigK 12 ≈ 1.6% relative error).
    */
  def hllSketch(c: Column, lgConfigK: Int = 12): Column =
    hll_sketch_agg(c, lit(lgConfigK))

  /** Union of stored sketches — re-aggregation without raw data. */
  def hllMerge(sketch: Column): Column = hll_union_agg(sketch)

  def hllEstimate(sketch: Column): Column = hll_sketch_estimate(sketch)

  /** Rollup pattern: per-shard sketches → merged estimate per rollup
    * key. `df` is raw data; a production pipeline would read the
    * PERSISTED shard sketches instead of re-sketching (same plan from
    * the union onward).
    */
  def distinctByRollup(
      df: DataFrame, shard: Seq[String], rollup: Seq[String], c: Column): DataFrame = {
    val perShard = df
      .groupBy((shard ++ rollup).distinct.map(col): _*)
      .agg(hllSketch(c).as("sk"))
    perShard
      .groupBy(rollup.map(col): _*)
      .agg(hllEstimate(hllMerge(col("sk"))).as("approx_uniques"))
  }

  // ---- Count-min sketch: the FREQUENCY counterpart of HLL's distinct
  // counting. Same deployment pattern — per-shard sketch bytes, merged
  // later — answering "how often does item X occur" within
  // ε·N overcount (never undercount) without a per-item groupBy.

  /** Per-group count-min sketch of `c` as binary (Spark's built-in
    * aggregate; `eps` = overcount bound as a fraction of total adds,
    * fixed seed for reproducibility).
    */
  def cmsSketch(c: Column, eps: Double = 0.001, conf: Double = 0.99,
      seed: Int = 42): Column =
    count_min_sketch(c, lit(eps), lit(conf), lit(seed))

  /** Point estimate for one item from stored sketch bytes. Deserializes
    * per call — probe sets are small by design (heavy-hitter candidates,
    * not the full key space); bulk probing should deserialize once per
    * partition via mapPartitions.
    */
  private val estimateUdf =
    org.apache.spark.sql.functions.udf { (bytes: Array[Byte], item: String) =>
      org.apache.spark.util.sketch.CountMinSketch
        .readFrom(new java.io.ByteArrayInputStream(bytes))
        .estimateCount(item)
    }

  def cmsEstimate(sketch: Column, item: Column): Column =
    estimateUdf(sketch, item)

  // ---- Portable HLL (r10): the SAME HyperLogLog algorithm expressed
  // in engine-neutral arithmetic — md5 as the hash family, m = 256
  // registers addressed by the first 2 hex chars, ranks off the next
  // 60 bits, Flajolet et al.'s estimator with the linear-counting
  // small-range branch. Unlike the DataSketches bytes above (whose
  // register encoding is engine-private → rows-only certification),
  // every intermediate here is an exact integer or a mirrored double,
  // so a DuckDB oracle can compute the identical estimate and the
  // driver hash-compares it (the q107-vs-q57 portable-MinHash
  // precedent applied to distinct counting). Production guidance
  // unchanged: persist DataSketches bytes for interop; use this form
  // when the sketch itself must be reproducible across engines.

  /** Per-(group, register) max rank — the portable HLL register file.
    * Exact integers end to end: reg ∈ [0,256) off hex chars 1-2, the
    * 60-bit window w off hex chars 3-17, rank ρ = 61 − bitlength(w)
    * (61 when w = 0), both engines via `length(bin(w))`. The groupBy
    * is the merge: registers from any shard split combine by MAX,
    * which is exactly HLL union.
    */
  def hllPortableRegisters(
      df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val hx = md5(value.cast("string"))
    df.select(groupCols.map(col) :+ hx.as("hx"): _*)
      .select(groupCols.map(col) :+
        conv(substring(col("hx"), 1, 2), 16, 10).cast("long").as("reg") :+
        conv(substring(col("hx"), 3, 15), 16, 10).cast("long").as("w"): _*)
      .select(groupCols.map(col) :+ col("reg") :+
        when(col("w") === 0L, lit(61L))
          .otherwise(lit(61L) - length(bin(col("w"))).cast("long"))
          .as("rho"): _*)
      .groupBy((groupCols :+ "reg").map(col): _*)
      .agg(max(col("rho")).as("rho"))
  }

  /** Estimate from a portable register file. The harmonic sum rides an
    * exact scaled integer T = Σ_j 2^(61−ρ_j) (zero registers contribute
    * 2^61 each; ≤ 256·2^61 → decimal(38)), so the raw estimate
    * α_m·m²·2^61 / T is ONE mirrored double division off an exact
    * integer; the linear-counting branch (raw ≤ 2.5m and zero
    * registers exist) is decided on that identical double and its
    * m·ln(m/V) is a mirrored libm chain absorbed by the e2 grid
    * (margins measured in Round10Spec). Output per group:
    * (n_registers_used, n_zero_registers, est_e2).
    */
  def hllPortableEstimate(regs: DataFrame, groupCols: Seq[String]): DataFrame = {
    val grouped =
      if (groupCols.isEmpty) regs.groupBy()
      else regs.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      count(lit(1)).as("n_registers_used"),
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(61 - rho AS INT)) " +
        "AS DECIMAL(38,0))")).as("tp"))
    val vZero = lit(256L) - col("n_registers_used")
    val t = vZero.cast("decimal(38,0)") * lit(2305843009213693952L) + col("tp")
    val raw = lit(0.7213) / (lit(1.0) + lit(1.079) / lit(256.0)) *
      lit(65536.0) * lit(2305843009213693952.0) / t.cast("double")
    val est = when(raw <= lit(640.0) && vZero > 0L,
      lit(256.0) * log(lit(256.0) / vZero.cast("double"))).otherwise(raw)
    agg.select(groupCols.map(col) :+
      col("n_registers_used") :+
      vZero.as("n_zero_registers") :+
      graft.ext.Similarity.intScaled(est, 100L).as("est_e2"): _*)
  }

  /** The DuckDB side of the portable HLL, as a SQL fragment builder:
    * given a relation alias exposing one hashed-value column `hx`
    * (md5 hex of the value's string form) and the group columns,
    * emits the register/estimate CTE chain with IDENTICAL arithmetic.
    * Centralized so q25/q97 (and future portable-HLL queries) cannot
    * drift from the Scala side.
    */
  def hllPortableOracleSql(fromSql: String, groupCols: Seq[String]): String = {
    val g = groupCols.mkString(", ")
    val gSel = if (groupCols.isEmpty) "" else s"$g, "
    val gBy = if (groupCols.isEmpty) "" else s" GROUP BY $g"
    val regBy = if (groupCols.isEmpty) "reg" else s"$g, reg"
    s"""WITH hsrc AS ($fromSql),
       |hreg AS (
       |  SELECT $gSel
       |         CAST(('0x' || substr(hx, 1, 2)) AS BIGINT) AS reg,
       |         CAST(('0x' || substr(hx, 3, 15)) AS BIGINT) AS w
       |  FROM hsrc),
       |hmax AS (
       |  SELECT $gSel reg,
       |         MAX(CASE WHEN w = 0 THEN 61
       |                  ELSE 61 - length(bin(w)) END) AS rho
       |  FROM hreg GROUP BY $regBy),
       |hagg AS (
       |  SELECT $gSel CAST(COUNT(*) AS BIGINT) AS n_registers_used,
       |         SUM(CAST((CAST(1 AS BIGINT) << CAST(61 - rho AS INT))
       |             AS HUGEINT)) AS tp
       |  FROM hmax$gBy),
       |hest AS (
       |  SELECT $gSel n_registers_used,
       |         256 - n_registers_used AS n_zero_registers,
       |         0.7213 / (1.0 + 1.079 / 256.0) * 65536.0
       |           * 2305843009213693952.0
       |           / CAST(CAST(256 - n_registers_used AS HUGEINT)
       |                  * 2305843009213693952 + tp AS DOUBLE) AS raw
       |  FROM hagg)
       |SELECT $gSel n_registers_used,
       |       CAST(n_zero_registers AS BIGINT) AS n_zero_registers,
       |       CAST(ROUND((CASE WHEN raw <= 640.0 AND n_zero_registers > 0
       |                   THEN 256.0 * ln(256.0
       |                     / CAST(n_zero_registers AS DOUBLE))
       |                   ELSE raw END) * 100) AS BIGINT) AS est_e2
       |FROM hest""".stripMargin
  }
}
