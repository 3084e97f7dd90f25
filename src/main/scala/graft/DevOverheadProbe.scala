package graft

import org.apache.spark.scheduler._

/** Dev-only: decompose one query's wall time into driver-side phases
  * (analysis/optimization/planning via QueryExecution) and scheduler
  * activity (jobs, stages, tasks, per-stage submit→complete spans) —
  * the r17 verdict item-7 question: where do the ~0.3-0.6 s/query of
  * fixed constants on ~390 sub-second queries actually go?
  *
  * Usage: runMain graft.DevOverheadProbe <sfDir> <runs> <query...>
  */
object DevOverheadProbe {

  private class Probe extends SparkListener {
    case class StageRow(id: Int, name: String, tasks: Int,
        submitMs: Long, completeMs: Long)
    val stages = scala.collection.mutable.ArrayBuffer.empty[StageRow]
    var jobs = 0
    var taskTimeMs = 0L
    var tasks = 0
    override def onJobStart(j: SparkListenerJobStart): Unit = jobs += 1
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val i = sc.stageInfo
      stages += StageRow(i.stageId, i.name.takeWhile(_ != '\n').take(60),
        i.numTasks,
        i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L))
    }
    override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
      tasks += 1
      if (t.taskMetrics != null)
        taskTimeMs += t.taskMetrics.executorRunTime
    }
    def reset(): Unit = { stages.clear(); jobs = 0; taskTimeMs = 0; tasks = 0 }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val runs = args(1).toInt
    val names = args.drop(2)
    val spark = Engine.session(cores = "32", appName = "graft-overhead")
    val probe = new Probe
    spark.sparkContext.addSparkListener(probe)
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to runs).foreach { r =>
        graft.ext.SessionMemo.clearAllAndUnpersist(spark)
        probe.reset()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tBuild = System.nanoTime()
        // Force analysis + optimization + physical planning separately
        val qe = df.queryExecution
        qe.assertAnalyzed()
        val tAnalyze = System.nanoTime()
        qe.optimizedPlan // lazily runs the optimizer
        val tOpt = System.nanoTime()
        qe.executedPlan
        val tPlan = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        val tExec = System.nanoTime()
        Thread.sleep(150) // let the listener bus drain (dev tool)
        val ms = (a: Long, b: Long) => (b - a) / 1e6
        // Sum of per-stage wall spans (overlap ignored) vs total exec:
        // the gap between exec wall and max(stage span sum, critical
        // path) is scheduling + AQE replanning + result handling.
        val stageSpan = probe.stages.map(s => s.completeMs - s.submitMs).sum
        println(f"[ovh] $n run$r build=${ms(t0, tBuild)}%.0f analyze=${ms(tBuild, tAnalyze)}%.0f opt=${ms(tAnalyze, tOpt)}%.0f plan=${ms(tOpt, tPlan)}%.0f exec=${ms(tPlan, tExec)}%.0f ms " +
          f"jobs=${probe.jobs} stages=${probe.stages.length} tasks=${probe.tasks} stageSpanSum=${stageSpan}ms taskTime=${probe.taskTimeMs}ms")
        if (r == runs && sys.env.contains("GRAFT_OVH_STAGES"))
          probe.stages.sortBy(_.submitMs).foreach { s =>
            println(f"[ovh-stage] ${s.id}%4d tasks=${s.tasks}%3d span=${s.completeMs - s.submitMs}%5d ms  ${s.name}")
          }
      }
    }
    spark.stop()
  }
}
