package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Dev-only measurement for the q430 file-count claim (not part of the
  * driver contract): a register store that appends one generation per
  * batch pays per-read listing + parquet-footer cost ∝ batch COUNT
  * while the payload stays vocab-sized — compaction converts G small
  * directories into 1 + the live tail. This prints, for a G-generation
  * DF-register store at the given SF dir:
  *
  *  - file/dir counts before and after compaction;
  *  - min-of-N timings of the q430-shaped read (head/tail DF sums over
  *    every generation) against the G-generation store and against the
  *    compacted {head, tail} store — SAME register payload, different
  *    file layout, so the delta is purely the small-files tax;
  *  - the compaction step's own wall time (register-sized work: it
  *    reads and rewrites only register files, never documents).
  *
  * Usage: `sbt 'runMain graft.DevRegCompactCost [sfDir] [G] [runs]'`
  * (defaults /root/testdata/sf0.1, 24 generations, 3 runs). Results
  * land in SCALE.md's round-17 section.
  */
object DevRegCompactCost {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val gens = if (args.length > 1) args(1).toInt else 24
    val runs = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.session(cores = "32", appName = "graft-regcompact-cost")

    val terms = Tables.table(spark, dir, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    def land(root: String): Unit = (0 until gens).foreach { g =>
      terms.filter(col("doc_id") % gens === g)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g.toLong))
        .write.mode(if (g == 0) "overwrite" else "append")
        .partitionBy("gen").parquet(root)
    }
    def census(root: String): (Int, Int) = {
      val d = new java.io.File(root)
      val dirs = d.listFiles().filter(f => f.isDirectory && f.getName.startsWith("gen="))
      val files = dirs.flatMap(_.listFiles())
        .count(f => f.getName.endsWith(".parquet"))
      (dirs.length, files)
    }
    def readCost(root: String): Double = (1 to runs).map { i =>
      spark.catalog.clearCache()
      val t0 = System.nanoTime()
      spark.read.parquet(root)
        .select(col("term"), col("df"), col("gen").cast("long").as("gen"))
        .groupBy(col("term"))
        .agg(sum(when(col("gen") < (gens - 1).toLong, col("df"))).as("df_head"),
          sum(when(col("gen") === (gens - 1).toLong, col("df"))).as("df_tail"))
        .write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[regcost] read run$i $dt%.2f s")
      dt
    }.min

    val root = Files.createTempDirectory("graft-regcost").toString
    println(s"[regcost] landing $gens generations from $dir")
    land(root)
    val (d0, f0) = census(root)
    val tPre = readCost(root)
    val t0 = System.nanoTime()
    ops.RegisterStore.compact(spark, root, "gen", upTo = (gens - 2).toLong,
      m => m.groupBy(col("term")).agg(sum(col("df")).as("df")))
    val tCompact = (System.nanoTime() - t0) / 1e9
    val (d1, f1) = census(root)
    val tPost = readCost(root)
    println(f"[regcost] RESULT sf=$dir gens=$gens " +
      f"pre: $d0 dirs/$f0 files ${tPre}%.2f s | compact ${tCompact}%.2f s | " +
      f"post: $d1 dirs/$f1 files ${tPost}%.2f s | read speedup ${tPre / tPost}%.2fx")
    StorePaths.deleteTree(java.nio.file.Paths.get(root))
    spark.stop()
  }
}
