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
}
