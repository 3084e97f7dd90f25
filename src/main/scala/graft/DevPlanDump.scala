package graft

import java.nio.file.{Files, Paths}

/** Dev-only: dump `.explain("formatted")` output for a list of queries
  * to `<outDir>/<name>_<suffix>.txt` — the optimization-round plan
  * evidence (plans/r17/..._before.txt / ..._after.txt).
  *
  * Usage: runMain graft.DevPlanDump <sfDir> <outDir> <suffix> <query...>
  * Queries run in ONE session in the given order, so session-memoized
  * shared frames (custSuppEdgesShared, coOrderGraph, neardupLabels)
  * resolve exactly as in a bench sweep.
  */
object DevPlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = Paths.get(args(1))
    val suffix = args(2)
    val names = args.drop(3)
    Files.createDirectories(outDir)
    val spark = Engine.session(cores = "32", appName = "graft-plandump")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      val qe = df.queryExecution
      val txt = qe.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), txt)
      println(s"[plandump] wrote ${n}_$suffix.txt (${txt.length} chars)")
    }
    spark.stop()
  }
}
