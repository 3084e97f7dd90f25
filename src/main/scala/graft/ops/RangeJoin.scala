package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Range join — match left points to right intervals
  * (`start <= point <= end`). Spark plans a raw non-equi join as
  * BroadcastNestedLoopJoin: O(N×M) compares and a broadcast of a whole
  * side — unusable at scale.
  *
  * Strategy: quantize the domain into fixed-width buckets. Each
  * interval is exploded once per bucket it overlaps; each point belongs
  * to exactly ONE bucket, so the bucket equi-join finds every
  * containing interval exactly once (no post-dedup) and the residual
  * `start <= point <= end` filter removes same-bucket non-overlaps.
  * Cost: one hash shuffle on (bucket) of size N + M×(avg span/width).
  * Pick `bucketWidth` ≈ the typical interval length: ~1-2 buckets per
  * interval and bounded bucket fan-out.
  */
object RangeJoin {

  def rangeJoin(
      points: DataFrame,
      intervals: DataFrame,
      pointCol: String,
      startCol: String,
      endCol: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val p = points.withColumn(
      "__bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val iv = intervals.withColumn(
      "__bucket",
      explode(sequence(
        floor(col(startCol) / bucketWidth).cast("long"),
        floor(col(endCol) / bucketWidth).cast("long"))))
    p.join(iv, Seq("__bucket"))
      .filter(col(startCol) <= col(pointCol) && col(pointCol) <= col(endCol))
      .drop("__bucket")
  }

  /** Interval×interval overlap join (`lStart <= rEnd AND rStart <=
    * lEnd`) — the two-sided generalization of [[rangeJoin]]. Both sides
    * explode to their bucket ranges; a pair sharing k buckets would
    * surface k times, so the join keeps each pair ONLY in the first
    * bucket both occupy (`max(startBucket_l, startBucket_r)`) — a pure
    * per-row filter, no post-distinct shuffle. Column names must be
    * disjoint across the two sides. Cost: one hash shuffle of
    * N×(avg span/width) per side.
    */
  def intervalOverlapJoin(
      left: DataFrame,
      right: DataFrame,
      lStart: String, lEnd: String,
      rStart: String, rEnd: String,
      bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    def buckets(s: String, e: String) = explode(sequence(
      floor(col(s) / bucketWidth).cast("long"),
      floor(col(e) / bucketWidth).cast("long")))
    val l = left.withColumn("__bucket", buckets(lStart, lEnd))
    val r = right.withColumn("__bucket", buckets(rStart, rEnd))
    l.join(r, Seq("__bucket"))
      .filter(col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd))
      .filter(col("__bucket") === greatest(
        floor(col(lStart) / bucketWidth), floor(col(rStart) / bucketWidth)).cast("long"))
      .drop("__bucket")
  }
}
