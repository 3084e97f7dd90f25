package graft

/** Dev-only: re-pin the bench drift probes' reference constants from a
  * DEDICATED calibration run (r16 verdict item 4 / ADVICE — the four
  * r16-added probes were pinned as one driver sweep's median divided
  * by that sweep's GLOBAL drift factor, which bakes the landing
  * block's minute-scale phase bias permanently into the constant; the
  * three r16 sweeps' containing-block estimates scatter ±20-40%, so a
  * sweep-derived re-pin would just pick a different bias).
  *
  * Method: run all 14 probe queries ROUND-ROBIN interleaved for R
  * rounds (every probe samples every host phase — the phase error
  * that separates probes inside one suite-ordered sweep cannot
  * separate them here), discard the JIT-cold round 1, and take
  * per-probe medians. The host factor h = median over the TEN
  * r13-pinned probes of (median_now / ref_r13) expresses this run in
  * r13-host units; each new probe's reference is then
  * median_now / h — the same unit the r13 constants are pinned in,
  * from a run where old and new probes shared every phase.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt 'runMain graft.DevProbeCalib [rounds]'
  */
object DevProbeCalib {

  private def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val rounds = args.headOption.map(_.toInt).getOrElse(8)
    val spark = Engine.session(cores = "32", appName = "graft-probe-calib")
    val probes = Bench.ProbeRefSf01
    val r13Pinned = probes.take(10) // the ten r13-sweep constants
    val newer = probes.drop(10)
    val samples = probes.map { case (n, _) =>
      n -> scala.collection.mutable.ArrayBuffer.empty[Double]
    }.toMap
    (1 to rounds).foreach { r =>
      probes.foreach { case (name, _) =>
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
        samples(name) += (System.nanoTime() - t0) / 1e9
      }
      println(s"[calib] round $r done")
    }
    val med = probes.map { case (n, _) =>
      n -> median(samples(n).toSeq.drop(1))
    }.toMap
    val mn = probes.map { case (n, _) => n -> samples(n).toSeq.drop(1).min }.toMap
    val hMed = median(r13Pinned.map { case (n, ref) => med(n) / ref })
    val hMin = median(r13Pinned.map { case (n, ref) => mn(n) / ref })
    println(f"[calib] host factor vs r13: median-based $hMed%.4f, min-based $hMin%.4f")
    r13Pinned.foreach { case (n, ref) =>
      println(f"[calib] r13 probe $n%-22s med=${med(n)}%.4f min=${mn(n)}%.4f " +
        f"ratio=${med(n) / ref}%.3f")
    }
    newer.foreach { case (n, oldRef) =>
      println(f"[calib] NEW probe $n%-22s med=${med(n)}%.4f min=${mn(n)}%.4f " +
        f"implied_ref=${med(n) / hMed}%.4f (old pin $oldRef%.4f)")
    }
    spark.stop()
  }
}
