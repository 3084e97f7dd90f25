package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev-only: prove the warm ≡ cold contract for the FLOAT-walk store
  * families at audit scale (the DevCcEquiv pattern applied to its
  * siblings — r16 verdict item 5). The oracle gate certifies both on
  * the bounded fixtures; this checks the actual numbers on the 10×
  * tier, where partitioning, shuffle widths, and the parquet
  * round-trip all take their production shape.
  *
  *  - PageRank (q414's mechanism): 3 cold rounds persisted + 1 warm
  *    round off the rank/prepared-edge stores vs the 4-round cold
  *    unroll. Expected bit-identical: parquet round-trips doubles
  *    exactly and each round's arithmetic is the same expression tree;
  *    the only possible divergence is partial-agg merge order inside a
  *    round, which the comparison surfaces as a max |Δ| if present.
  *  - k-means (q421's mechanism): round-1 centroids persisted, round 2
  *    run from the read-back vs two unrolled cold rounds. Checked at
  *    three layers: the round-trip itself (stored cu vs in-memory cu —
  *    must be exactly 0), the e4-gridded round-2 output (the certified
  *    contract), and member counts.
  *
  *   sbt 'runMain graft.DevWarmEquiv dev/sf10x'
  */
object DevWarmEquiv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("dev/sf10x")
    val spark = Engine.session(cores = "32", appName = "graft-warm-equiv")
    var failed = false

    // ---- PageRank: 3 persisted + 1 warm ≡ 4 cold --------------------------
    {
      val li = Tables.table(spark, dir, "lineitem")
        .select("l_orderkey", "l_linenumber", "l_quantity")
      val edges = li.select(
        (col("l_orderkey") * 2).as("src"),
        ((col("l_quantity").cast("long") * 10 + col("l_linenumber")) * 2 + 1)
          .as("dst"))
      val cold = ext.Components.pageRank(edges, iterations = 4)
      val tmp = java.nio.file.Files.createTempDirectory("graft-warmeq-pr")
      ext.Components.pageRank(edges, iterations = 3)
        .write.mode("overwrite").parquet(s"$tmp/ranks")
      val tbl = "graft_warmeq_prep"
      ext.Components.persistPreparedEdges(edges, tbl, s"$tmp/edges", buckets = 32)
      val warm = ext.Components.pageRankWarmPrepared(
        spark.table(tbl), spark.read.parquet(s"$tmp/ranks"), iterations = 1)
      val j = cold.select(col("id"), col("pr").as("pr_cold"))
        .join(warm.select(col("id"), col("pr").as("pr_warm")), Seq("id"), "full")
      val d = j.agg(
        count(lit(1)).as("n"),
        sum(when(col("pr_cold").isNull || col("pr_warm").isNull, 1L)
          .otherwise(0L)).as("unmatched"),
        sum(when(col("pr_cold") =!= col("pr_warm"), 1L).otherwise(0L))
          .as("raw_diffs"),
        max(abs(col("pr_cold") - col("pr_warm"))).as("max_abs_delta"),
        sum(when(round(col("pr_cold") * 1000000, 0) =!=
          round(col("pr_warm") * 1000000, 0), 1L).otherwise(0L))
          .as("e6_diffs")).head()
      println(s"[warm-equiv] pagerank dir=$dir nodes=${d.getLong(0)} " +
        s"unmatched=${d.getLong(1)} raw_diffs=${d.getLong(2)} " +
        s"max_abs_delta=${d.get(3)} e6_diffs=${d.getLong(4)} " +
        (if (d.getLong(1) == 0 && d.getLong(2) == 0) "EQUAL"
         else if (d.getLong(1) == 0 && d.getLong(4) == 0) "GRID-EQUAL"
         else "MISMATCH"))
      if (d.getLong(1) != 0 || d.getLong(4) != 0) failed = true
      StorePaths.deleteTree(tmp)
    }

    // ---- k-means: persisted round-1 centroids + round 2 ≡ 2 cold rounds ---
    {
      val unit = ext.Similarity.withUnitVec(
        spark.read.parquet(s"$dir/embeddings.parquet"), "embedding", "u")
        .select("vec_id", "u").localCheckpoint(true)
      val seeds0 = unit.orderBy("vec_id").limit(8)
        .select(col("vec_id").as("cid"), col("u").as("cu"))
      val c1 = ext.Similarity.kmeansCentroidRound(unit, seeds0)
        .localCheckpoint(true)
      val tmp = java.nio.file.Files.createTempDirectory("graft-warmeq-km")
      c1.write.mode("overwrite").parquet(s"$tmp/centroids")
      val c1Back = spark.read.parquet(s"$tmp/centroids")
      // Layer 1: the parquet round-trip itself — must be EXACTLY zero.
      val rt = c1.select(col("cid"), posexplode(col("cu")).as(Seq("p", "x")))
        .join(c1Back.select(col("cid"), posexplode(col("cu")).as(Seq("p", "y"))),
          Seq("cid", "p"))
        .agg(count(lit(1)).as("n"),
          max(abs(col("x") - col("y"))).as("max_rt_delta"),
          sum(when(col("x") =!= col("y"), 1L).otherwise(0L)).as("rt_diffs"))
        .head()
      // Layer 2: the e4-gridded round-2 output (the q421 contract).
      val cold2 = ext.Similarity.kmeansStep(unit, c1)
      val warm2 = ext.Similarity.kmeansStep(unit, c1Back)
      def cnt(a: DataFrame) = a.count()
      val onlyCold = cnt(cold2.exceptAll(warm2))
      val onlyWarm = cnt(warm2.exceptAll(cold2))
      println(s"[warm-equiv] kmeans dir=$dir centroid_vals=${rt.getLong(0)} " +
        s"rt_diffs=${rt.getLong(2)} max_rt_delta=${rt.get(1)} " +
        s"round2_only_cold=$onlyCold round2_only_warm=$onlyWarm " +
        (if (rt.getLong(2) == 0 && onlyCold == 0 && onlyWarm == 0) "EQUAL"
         else "MISMATCH"))
      if (rt.getLong(2) != 0 || onlyCold != 0 || onlyWarm != 0) failed = true
      StorePaths.deleteTree(tmp)
    }

    spark.stop()
    if (failed) sys.exit(1)
  }
}
