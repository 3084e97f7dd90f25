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

  /** Host-drift probe set (r13 verdict item 2): ten cheap, plan-stable
    * queries whose code has been untouched for multiple rounds, spread
    * across table families (lineitem scan/agg, customer strings,
    * documents regex/tokens, events contingency, embeddings metadata).
    * Values are the r13 DRIVER sweep's per-query medians at sf0.1 —
    * the official file this normalization is designed to be compared
    * against. Each sweep reports `drift_factor` = median over probes of
    * (this-sweep median / pinned r13 median): a whole-suite host-speed
    * shift moves every probe together (the r12/r13 pattern was a
    * uniform ±25-35% band on untouched queries), so a REAL per-query
    * regression is one that survives division by the factor. Pinned to
    * sf0.1 — at any other SF the probes still print but the factor is
    * omitted (the constants would be meaningless).
    */
  private[graft] val ProbeRefSf01: Seq[(String, Double)] = Seq(
    // r18 RE-PIN, all 14 probes: the base-relation metadata memo
    // (Tables.table) legitimately sped up the probe class itself
    // (~0.79 median), so the pre-memo constants would have read that
    // CODE change as a host-speed shift and normalization would have
    // eaten it. Each pin is scaled by that probe's own memo ratio,
    // measured host-free via an interleaved A/B (3 alternating
    // pre-memo/post-memo graft.DevProbeCalib runs of 4 round-robin
    // rounds each, 2026-08-19; per-probe ratio = median over the three
    // same-phase pairs of B_med/A_med). Old pins and ratios: q01
    // 0.1432×0.665, q03 0.1738×0.624, q06 0.2148×0.781, q08
    // 0.2280×0.677, q19 0.1997×0.854, q34 0.2873×0.710, q49
    // 0.4220×1.047, q62 0.2252×0.771, q84 0.2211×0.903, q313
    // 0.3275×0.887, q21 0.3265×0.707, q176 0.3453×0.909, q280
    // 0.3421×0.808, q351 0.3943×0.940. The units stay "r13 host":
    // cross-round normalized comparisons remain valid, with the code
    // delta showing up in the per-query numbers, not the drift factor.
    // Future code changes that touch the probes' own path need the
    // same ratio-scaled re-pin; pure host drift does not.
    "q01_count" -> 0.0953, "q03_null_profile" -> 0.1085,
    "q06_titlecase_norm" -> 0.1678, "q08_surrogate_key" -> 0.1544,
    "q19_topk" -> 0.1706, "q34_word_count" -> 0.2039,
    "q49_regex_battery" -> 0.4418, "q62_multimodal_meta" -> 0.1736,
    "q84_string_agg" -> 0.1997, "q313_mcnemar" -> 0.2905,
    // r16 probe extension (r15 verdict item 4): four more probes so the
    // per-probe BLOCKS shrink from 42 to 30 queries (~25 s of sweep per
    // block — closer to the measured minutes-scale drift phase). Their
    // reference constants postdate r13.
    //
    // r17 RE-PIN (r16 verdict item 4 / ADVICE): the original pins —
    // (one r15 sweep median) / (that sweep's GLOBAL drift factor) —
    // inherited their landing block's phase bias. Re-pinned from TWO
    // dedicated graft.DevProbeCalib runs (2026-08-16, 8 interleaved
    // round-robin rounds each: every probe samples every host phase,
    // so block-phase error cannot separate probes): per run,
    // implied_ref = calib median / (median over the ten r13 probes of
    // calib median / r13 ref); pinned value = mean of the two runs'
    // implied refs, which agreed within 1-9% while the runs' host
    // factors differed 1.13 vs 0.95 — the normalization holds. Old →
    // new: q21 0.3235→0.3265, q176 0.3914→0.3453, q280 0.3358→0.3421,
    // q351 0.4199→0.3943. (r18: these four also carry the memo-ratio
    // scaling described above.)
    "q21_conditional_agg" -> 0.2308, "q176_embed_dim_stats" -> 0.3140,
    "q280_hill_tail" -> 0.2764, "q351_cochran_armitage" -> 0.3707)

  /** True median: averages the two middle elements for even sizes (the
    * upper-median shortcut biased drift_factor toward the larger-ratio
    * half of the 10-probe set — r14 ADVICE).
    */
  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

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
    // Per-block drift probes (r14 verdict item 3): the r13→r14 sweeps
    // showed a contiguous registry block (q200-q266) moving 1.4-2.1×
    // drift-NORMALIZED with untouched code — whole-sweep normalization
    // cannot see a drift PHASE that spans minutes, not the whole sweep.
    // So each suite round is split into one contiguous block per probe,
    // and the block's probe runs an EXTRA time immediately before the
    // block (same time-phase as the block's queries; the extra run is
    // NOT recorded into the probe's registry sample). A real regression
    // in one registry region now has a same-phase yardstick: it must
    // survive division by ITS block's factor, not the sweep-wide one.
    // Cost: 14 probe runs/round ≈ 3-4 s of a ~350 s sweep.
    val probeNames = ProbeRefSf01.map(_._1)
    val blockSize = math.max(1,
      (queries.length + probeNames.length - 1) / probeNames.length)
    val blocks = queries.grouped(blockSize).toSeq
    val blockProbeSamples = Array.fill(blocks.length)(
      scala.collection.mutable.ArrayBuffer.empty[Double])
    (1 to runs).foreach { round =>
      // Bench honesty (r17 verdict item 1): the session-scoped shared
      // derived frames (prepared walks, probe LSH pairs, co-order
      // graph, ...) are memoized per session, so without this the
      // derivations would run once — inside the DISCARDED warmup
      // round — and every warm-round consumer median would time a
      // localCheckpoint read while the real prep cost appeared in no
      // reported figure (q65's declared output IS the memoized pair
      // frame). Clearing at the start of EVERY round makes each round
      // pay each derivation exactly once (its first consumer in
      // registry order carries it), so the reported medians are what a
      // fresh session pays; within-round sharing keeps the production
      // one-pass-many-consumers shape. The unpersist bounds
      // block-manager growth across rounds.
      graft.ext.SessionMemo.clearAllAndUnpersist(spark)
      blocks.zipWithIndex.foreach { case (block, bi) =>
        SparkEntry.queries.get(probeNames(bi % probeNames.length)).foreach { pfn =>
          val t0 = System.nanoTime()
          try {
            pfn(spark, sfDir).write.format("noop").mode("overwrite").save()
            blockProbeSamples(bi) += (System.nanoTime() - t0) / 1e9
          } catch { case _: Throwable => blockProbeSamples(bi) += -1.0 }
        }
        block.foreach { case (name, fn) =>
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
    }
    val results = queries.map { case (name, _) =>
      // Drop the JIT-cold first round, then take the median over the
      // SUCCESSFUL warm samples (a -1 sentinel would skew the median
      // low). If every warm sample failed fall back to any successful
      // one at all; all-failed reports -1.
      val times = samples(name).toSeq
      val warm = times.drop(1).filter(_ >= 0).sorted
      val ok = if (warm.nonEmpty) warm else times.filter(_ >= 0).sorted
      name -> (if (ok.isEmpty) -1.0 else median(ok))
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
    // Drift adjudication (r13 verdict item 2): per-probe ratio vs the
    // pinned r13 reference, their median as drift_factor, and every
    // query's median re-expressed in r13-host seconds. Only at sf0.1
    // (where the reference was pinned); probes whose sample failed are
    // skipped, and < 3 surviving probes withholds the factor rather
    // than reporting one the noise floor owns.
    val resultMap = results.toMap
    val probeRatios = ProbeRefSf01.flatMap { case (name, ref) =>
      resultMap.get(name).filter(_ > 0).map(m => name -> m / ref)
    }
    val atSf01 = Paths.get(sfDir).getFileName.toString.equals("sf0.1")
    val driftOpt =
      if (!atSf01 || probeRatios.length < 3) None
      else Some(median(probeRatios.map(_._2)))
    // Per-block factors: median over WARM in-phase probe runs of
    // (run / pinned ref) for the block's probe. -1 marks a block whose
    // probe never succeeded warm; omitted entirely off sf0.1.
    val probeRefMap = ProbeRefSf01.toMap
    val blockDrift = blocks.zipWithIndex.map { case (block, bi) =>
      val pName = probeNames(bi % probeNames.length)
      val label = block.head._1.takeWhile(_ != '_') + "-" +
        block.last._1.takeWhile(_ != '_')
      val warm = blockProbeSamples(bi).toSeq.drop(1).filter(_ > 0)
      val f = if (warm.isEmpty) -1.0 else median(warm) / probeRefMap(pName)
      (label, pName, f)
    }
    val blockDriftJson =
      if (!atSf01) "null"
      else blockDrift.map { case (label, pName, f) =>
        "\"" + label + "\":{\"probe\":\"" + pName + "\",\"factor\":" +
          (math.rint(f * 1000) / 1000) + "}"
      }.mkString("{", ",", "}")
    val probesJson = probeRatios.map { case (k, v) =>
      "\"" + k + "\":" + (math.rint(v * 1000) / 1000)
    }.mkString("{", ",", "}")
    val driftJson = driftOpt
      .map(d => (math.rint(d * 1000) / 1000).toString).getOrElse("null")
    // Per-query normalization divides by the query's OWN block factor
    // (r15 verdict item 3): the global factor cannot see a drift PHASE
    // spanning minutes, so untouched queries in a slow-phase block kept
    // surfacing as phantom 1.3-2× movers in cross-round diffs. Fall
    // back to the global factor for a block whose probe never
    // succeeded warm.
    val queryBlockFactor: Map[String, Double] = blocks.zipWithIndex.flatMap {
      case (block, bi) =>
        val f = blockDrift.lift(bi).map(_._3).getOrElse(-1.0)
        block.map { case (name, _) => name -> f }
    }.toMap
    val normJson = driftOpt.map { d =>
      results.map { case (k, v) =>
        val bf = queryBlockFactor.getOrElse(k, -1.0)
        val f = if (bf > 0) bf else d
        "\"" + k + "\":" + (if (v < 0) v else math.rint(v / f * 1000) / 1000)
      }.mkString("{", ",", "}")
    }.getOrElse("null")
    // Self-evidencing CPUs contract (r17 verdict item 2): the driver's
    // scaling probe re-runs the bench at a lower SPARK_GRAFT_CPUS and
    // could not verify from the output that the env var actually bound
    // (`suspect_cpus_ignored`). Echo the applied core count and the two
    // runtime values it drives so every bench line proves its own
    // parallelism.
    val cpusEcho =
      s""""cpus":"${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}","default_parallelism":${spark.sparkContext.defaultParallelism},"shuffle_partitions":${spark.conf.get("spark.sql.shuffle.partitions")}"""
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"min_total":$minTotal,"mins":$minQs,"drift_factor":$driftJson,"probes":$probesJson,"block_drift":$blockDriftJson,"normalized":$normJson,$cpusEcho,"sf":"$sfDir"}"""
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
      s"""{"metric":"total","value":${math.rint(total * 1000) / 1000},"unit":"sec","n":${results.length},"drift_factor":$driftJson,$cpusEcho,"sf":"$sfDir"}"""
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
