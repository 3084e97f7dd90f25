package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Two-phase global rank / cumulative sum — the scale-safe replacement
  * for `Window.orderBy(...)` with no `partitionBy` (a single-reducer
  * sort: the whole frame rides ONE task) and for `Window.partitionBy()`
  * (the all-rows total, same single task). This was the registry's one
  * weak 100-TB posture (r11 verdict): q287/q332/q364/q376 ranked a
  * part/customer DIMENSION through one task. At the design point the
  * dimension is billions of rows; here the sort is distributed and the
  * only single-task state is a ≤ ~513-row bucket census.
  *
  * Mechanics (the classic range-bucket rank, using q378's HDR-histogram
  * bucketing as the deterministic range partitioner):
  *
  *   1. Every row gets a bucket that is a PURE FUNCTION of its sort
  *      value `v`: HDR log₂ bucket `8e + sub` off the bit length
  *      (monotone in v, so bucket order == value order; ≤ 8·64+8 ≈ 520
  *      buckets for any long). No sampling, no nondeterminism — the
  *      same row always lands in the same bucket, so results are
  *      bit-stable run-to-run and engine-comparable.
  *   2. rank / running sum WITHIN each bucket: a keyed window over
  *      `(part…, bucket)` — distributed, no global sort.
  *   3. Per-bucket (count, sum) collapse → a tiny census frame; prefix
  *      offsets over it via a window that rides ~520 rows (the accepted
  *      value-collapsed window shape); broadcast-joined back.
  *   4. global rank = bucket prefix count + within-bucket rank;
  *      global cumsum = bucket prefix sum + within-bucket running sum.
  *      The same census yields the frame-wide count/total for free —
  *      callers that used `Window.partitionBy()` for the total get it
  *      without another single-task window OR a second scan.
  *
  * Exactness: ranks and sums are identical to the single-task window's
  * by construction — the (v, tie) total order is unchanged, buckets
  * only split the prefix computation (both engines' hashes are pinned
  * unchanged in TwoPhaseSpec and the q287/q332/q364/q376 oracles).
  *
  * Skew note: bucket population is data-dependent (log-uniform money
  * values spread across ~50+ buckets; adversarially constant columns
  * collapse to one bucket — exactly the tie case where ANY engine must
  * fall back to the tie-break sort). Negative values get the SAME log₂
  * spread via the sign mirror `v < 0 → −hdrBucket(−v) − 1` (still
  * monotone: mirrored buckets land in about [−504, −2] — x = −1 maps
  * to −posBucket(1) − 1 = −2 and the max positive bucket is ~503 —
  * all below every nonnegative bucket, and reverse order exactly as
  * the values do; `Long.MinValue`, whose negation overflows, is pinned
  * to −520 — strictly below every mirrored bucket, as the value is
  * below every other long). Ranks/sums are bucket-split-invariant, so this changes
  * no caller's RESULT — it changes the signed-domain census from one
  * degenerate all-rows bucket to ≤ ~1030 spread buckets.
  */
object TwoPhase {

  private val B = "__tp_bucket"

  /** HDR log₂ bucket id, monotone nondecreasing in `v` (long). For
    * v ≥ 8: `8·e + (v >> (e−3)) − 8` with e = bit length − 1 (q378's
    * sketch bucketing, reused verbatim); v in [0, 8): identity;
    * v < 0: sign-mirrored `−bucket(−v) − 1` (see class doc), with
    * `Long.MinValue` pinned below every mirrored bucket.
    */
  def hdrBucket(v: Column): Column = {
    val x = v.cast("long")
    when(x >= 0L, posBucket(x))
      .when(x === Long.MinValue, lit(-520L))
      .otherwise(-posBucket(-x) - 1L)
  }

  /** The nonnegative-domain bucket body (callers guarantee x ≥ 0). */
  private def posBucket(x: Column): Column = {
    val e = (length(bin(x)) - 1).cast("long")
    when(x < 8L, x).otherwise(e * 8 + shiftRightDyn(x, e - 3) - 8L)
  }

  /** `shiftright` with a COLUMN shift amount (the Scala functions API
    * only takes a literal Int; SQL's shiftright accepts columns).
    */
  private def shiftRightDyn(x: Column, bits: Column): Column =
    call_function("shiftright", x, bits.cast("int"))

  /** Adds any of: a global row_number `rn`, an inclusive running sum
    * `cum` of `v`, the frame-wide row count `n`, and the frame-wide sum
    * `tot` — all over the total order (`v` asc|desc, `tie` asc) within
    * the optional `part` grouping — WITHOUT a partition-less WindowExec.
    *
    *   - `v` must be an integral (long-valued) column; `(v, tie)` must
    *     be unique within each `part` group (every caller ties on its
    *     dimension key), or rank/cum are nondeterministic exactly as
    *     they would be under the single-task window.
    *   - `rn` lands as LongType (the single-task `row_number()` was
    *     IntegerType — callers consume it in arithmetic, never in the
    *     output schema).
    *   - The bucketed input is `localCheckpoint(true)`-ed: it branches
    *     into the per-row frame and the census, and re-computing the
    *     upstream collapse twice would be the q158 double-explode bug.
    */
  /** Multi-metric variant of [[rankCum]] (ranks only): N global
    * row_numbers over the SAME frame — e.g. q191's three RFM quintile
    * ranks, q389's two Spearman ranks — with ONE bucket projection and
    * ONE checkpoint instead of N chained [[rankCum]] calls (each of
    * which would re-materialize the growing frame; q191 measured
    * 1.5 s → ~1 s at sf0.1 from exactly this). Each metric still gets
    * its own keyed within-bucket window (different sort keys cannot
    * share a sort), but the censuses and prefix offsets all read the
    * single cached frame.
    *
    * `specs` = (valueCol, tieCol, ascending, rnOutputCol) per metric;
    * `n` optionally adds the frame-wide row count (off the first
    * metric's census — identical for all).
    */
  def rankMulti(
      df: DataFrame,
      part: Seq[String],
      specs: Seq[(String, String, Boolean, String)],
      n: Option[String] = None): DataFrame = {
    require(specs.nonEmpty, "rankMulti: at least one spec")
    val pc = part.map(col)
    val withBuckets = specs.zipWithIndex.foldLeft(df) {
      case (acc, ((v, _, _, _), i)) =>
        acc.withColumn(s"__tp_b$i", hdrBucket(col(v)))
    }
    val bucketed = withBuckets.localCheckpoint(true)
    val out = specs.zipWithIndex.foldLeft(bucketed) {
      case (acc, ((v, tie, asc, rnOut), i)) =>
        val b = col(s"__tp_b$i")
        val census = bucketed.groupBy((pc :+ b): _*)
          .agg(count(lit(1)).as("__tp_n"))
        val bOrd = if (asc) b.asc else b.desc
        val wOff = Window.partitionBy(pc: _*).orderBy(bOrd)
          .rowsBetween(Window.unboundedPreceding, -1)
        val wAll = Window.partitionBy(pc: _*)
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        var off = census
          .withColumn("__tp_off_n",
            coalesce(sum(col("__tp_n")).over(wOff), lit(0L)))
        if (i == 0 && n.isDefined)
          off = off.withColumn("__tp_all_n", sum(col("__tp_n")).over(wAll))
        off = off.drop("__tp_n")
        val vOrd = if (asc) col(v).asc else col(v).desc
        val wIn = Window.partitionBy((pc :+ b): _*).orderBy(vOrd, col(tie).asc)
        var j = acc.join(broadcast(off), part :+ s"__tp_b$i")
          .withColumn(rnOut, col("__tp_off_n") + row_number().over(wIn))
          .drop("__tp_off_n")
        if (i == 0 && n.isDefined)
          j = j.withColumn(n.get, col("__tp_all_n")).drop("__tp_all_n")
        j
    }
    specs.indices.foldLeft(out)((acc, i) => acc.drop(s"__tp_b$i"))
  }

  /** Exact k-th element (1-based, over the (`v` ASC, `tie` ASC) total
    * order) WITHOUT ranking every row — the median/quantile-pick
    * special case of [[rankCum]] (r18, guide §2.4): a caller that only
    * FILTERS on `rn = k` pays rankCum's full-frame broadcast-join +
    * window for one row. Here the bucket census locates the ONE bucket
    * containing position k, and only that bucket's rows (~1/#buckets
    * of the frame) are joined and ranked; `k` is derived in-plan from
    * the frame-wide count (e.g. the lower median `(n+1) div 2`), so
    * nothing is collected.
    *
    * Returns a ONE-ROW frame `out` = the k-th value. Identical to
    * `rankCum(...).filter(rn = kOfN(n))` by construction: the census
    * prefix offsets are the same, and the within-bucket (v, tie)
    * window is rankCum's (pinned in TwoPhaseSpec).
    */
  def kth(
      df: DataFrame,
      v: String,
      tie: String,
      kOfN: Column => Column,
      out: String): DataFrame = {
    val bucketed = df.withColumn(B, hdrBucket(col(v))).localCheckpoint(true)
    val census = bucketed.groupBy(col(B)).agg(count(lit(1)).as("__tp_n"))
    val wOff = Window.orderBy(col(B).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy()
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    // census-sized windows (≤ ~520 rows) — the exempt value-collapsed
    // shape, exactly as in rankCum
    val hit = census
      .withColumn("__tp_off_n", coalesce(sum(col("__tp_n")).over(wOff), lit(0L)))
      .withColumn("__tp_k", kOfN(sum(col("__tp_n")).over(wAll)))
      .filter(col("__tp_k") > col("__tp_off_n") &&
        col("__tp_k") <= col("__tp_off_n") + col("__tp_n"))
      .select(col(B), col("__tp_off_n"), col("__tp_k"))
    val wIn = Window.partitionBy(col(B)).orderBy(col(v).asc, col(tie).asc)
    bucketed.join(broadcast(hit), Seq(B))
      .withColumn("__tp_rn", col("__tp_off_n") + row_number().over(wIn))
      .filter(col("__tp_rn") === col("__tp_k"))
      .select(col(v).as(out))
      // exactly one row matches by construction; the explicit limit is
      // the PLAN-LEVEL bound consumers' broadcast crossJoins need (the
      // BNL-net contract: a broadcast build side must be provably
      // bounded in the plan itself)
      .limit(1)
  }

  def rankCum(
      df: DataFrame,
      part: Seq[String],
      v: String,
      tie: String,
      asc: Boolean,
      rn: Option[String] = None,
      cum: Option[String] = None,
      n: Option[String] = None,
      tot: Option[String] = None): DataFrame = {
    val pc = part.map(col)
    val needSum = cum.isDefined || tot.isDefined
    val bucketed = df.withColumn(B, hdrBucket(col(v))).localCheckpoint(true)
    // Sum columns only when a caller asked for cum/tot: rank-only
    // callers skip the census sum entirely (and a rank over a domain
    // whose TOTAL would overflow long — e.g. extreme signed values —
    // stays well-defined under ANSI arithmetic).
    val census = bucketed.groupBy((pc :+ col(B)): _*)
      .agg(count(lit(1)).as("__tp_n"),
        (if (needSum) Seq(sum(col(v)).as("__tp_s")) else Nil): _*)
    val bOrd = if (asc) col(B).asc else col(B).desc
    // both windows ride the ≤ ~520-row census — the value-collapsed
    // window shape (PlanAuditSpec's exempt category by construction)
    val wOff = Window.partitionBy(pc: _*).orderBy(bOrd)
      .rowsBetween(Window.unboundedPreceding, -1)
    val wAll = Window.partitionBy(pc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    var off = census
      .withColumn("__tp_off_n", coalesce(sum(col("__tp_n")).over(wOff), lit(0L)))
      .withColumn("__tp_all_n", sum(col("__tp_n")).over(wAll))
    if (needSum) off = off
      .withColumn("__tp_off_s", coalesce(sum(col("__tp_s")).over(wOff), lit(0L)))
      .withColumn("__tp_all_s", sum(col("__tp_s")).over(wAll))
      .drop("__tp_s")
    off = off.drop("__tp_n")
    val vOrd = if (asc) col(v).asc else col(v).desc
    val wIn = Window.partitionBy((pc :+ col(B)): _*).orderBy(vOrd, col(tie).asc)
    val wInCum = wIn.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var out = bucketed.join(broadcast(off), part :+ B)
    rn.foreach { c =>
      out = out.withColumn(c, col("__tp_off_n") + row_number().over(wIn))
    }
    cum.foreach { c =>
      out = out.withColumn(c, col("__tp_off_s") + sum(col(v)).over(wInCum))
    }
    n.foreach(c => out = out.withColumn(c, col("__tp_all_n")))
    tot.foreach(c => out = out.withColumn(c, col("__tp_all_s")))
    out.drop(B, "__tp_off_n", "__tp_off_s", "__tp_all_n", "__tp_all_s")
  }
}
