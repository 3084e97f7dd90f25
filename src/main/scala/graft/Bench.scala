package graft

import java.nio.file.{Files, Paths}
import scala.util.Try

/** Benchmark main (driver contract): run every registered query on
  * `SPARK_GRAFT_SF_DIR` and report wall seconds per query plus the
  * total. The LAST stdout line is a compact summary JSON that the
  * driver parses (build.sbt passes forked stdout through unprefixed
  * and suppresses sbt's `[success]` banner so the line really is
  * last).
  *
  * Timing discipline (r6 verdict: single queries swung 6× with zero
  * code change because the JIT-cold first run was included in the
  * median): the WHOLE SUITE runs `SPARK_GRAFT_BENCH_RUNS` times
  * (default 4); the first suite round is discarded as warmup and each
  * query reports the median of its remaining rounds. Rounds are
  * suite-level, not per-query-consecutive, because the r7 double-sweep
  * measured a slow multi-minute host-level drift (burstable-CPU
  * throttling: sweep 2 ran −20% early, +90% mid-sweep, +10% late with
  * an identical binary). Consecutive per-query runs all land in the
  * same drift phase and inherit its full amplitude; spreading each
  * query's samples across the sweep lets the median average the
  * phases out.
  *
  * Results are forced with a `noop`-format write: the full physical
  * plan executes — including the declared global ORDER BYs, which a
  * `.count()` would let Catalyst's EliminateSorts drop — with zero
  * sink cost and no driver-side collect.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Engine.session(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName = "graft-bench")

    // >= 2 so at least one warm round survives the warmup discard.
    val runs = math.max(2, sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "4").toInt)
    val queries = SparkEntry.queries.toSeq.sortBy(_._1)
    // times(query) = one sample per suite round, in round order.
    val samples = queries.map { case (name, _) =>
      name -> scala.collection.mutable.ArrayBuffer.empty[Double]
    }.toMap
    (1 to runs).foreach { round =>
      queries.foreach { case (name, fn) =>
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          samples(name) += (System.nanoTime() - t0) / 1e9
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed (round $round): ${e.getMessage}")
          samples(name) += -1.0
        }
      }
    }
    val results = queries.map { case (name, _) =>
      // Drop the JIT-cold first round, then take the median over the
      // SUCCESSFUL warm samples (a -1 sentinel would skew the median
      // low). If every warm sample failed fall back to any successful
      // one at all; all-failed reports -1.
      val times = samples(name).toSeq
      val warm = times.drop(1).filter(_ >= 0).sorted
      val ok = if (warm.nonEmpty) warm else times.filter(_ >= 0).sorted
      name -> (if (ok.isEmpty) -1.0 else ok(ok.length / 2))
    }
    // Per-query MIN over the warm rounds, recorded beside the median
    // (r11 verdict item 3): the driver's sweep shares the host with
    // other load, and a transient stall in ONE round can move a median
    // 3-4x with zero code change (r11 adjudicated four such phantom
    // regressions by re-timing). The min is the load-robust "the code
    // can run this fast" floor a round-over-round diff should trust
    // when the medians disagree.
    val minResults = queries.map { case (name, _) =>
      val warm = samples(name).toSeq.drop(1).filter(_ >= 0)
      val ok = if (warm.nonEmpty) warm else samples(name).toSeq.filter(_ >= 0)
      name -> (if (ok.isEmpty) -1.0 else ok.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val minQs = minResults.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val minTotal = minResults.map(_._2).filter(_ >= 0).sum
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min_total":$minTotal,"mins":$minQs,"sf":"$sfDir"}"""
    // The driver captures only a ~4 KB stdout TAIL and parses the LAST
    // line. With 200+ queries even a short-id map is ~3 KB and its
    // head gets clipped by the window (r4–r8: "parsed": null every
    // round). So the FINAL line is map-free — total seconds, query
    // count, sf — and is guaranteed to fit any tail window. The
    // short-id map ("q35" for "q35_array_hof" — numeric prefixes are
    // unique by construction, ms precision) prints on an EARLIER line
    // for humans reading full logs; the full-name full-precision map
    // lives in bench/results-<sf>.json.
    val shortQs = results.map { case (k, v) =>
      "\"" + k.takeWhile(_ != '_') + "\":" + (math.rint(v * 1000) / 1000)
    }.mkString("{", ",", "}")
    val shortLine =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","queries":$shortQs,"sf":"$sfDir"}"""
    val summaryLine =
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n":${results.length},"sf":"$sfDir"}"""
    val sfName = Paths.get(sfDir).getFileName.toString
    val resultsFile = Paths.get(s"bench/results-$sfName.json")
    // Print BEFORE any file I/O: a read-only cwd must not eat the
    // sweep after all queries already ran.
    println(shortLine)
    println(summaryLine)
    Try(Files.createDirectories(resultsFile.getParent))
    Try(Files.writeString(resultsFile, fullLine + "\n"))
      .failed.foreach(e => System.err.println(s"[bench] results write failed: $e"))
    sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { out =>
      Try(Files.writeString(Paths.get(out), fullLine + "\n"))
        .failed.foreach(e => System.err.println(s"[bench] BENCH_OUT write failed: $e"))
    }
    spark.stop()
    // Repeated after spark.stop() so no Spark shutdown chatter can
    // land below it: this map-free line IS the driver's parse target.
    println(summaryLine)
  }
}
