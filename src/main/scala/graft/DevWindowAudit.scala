package graft

/** Dev: list every registered query whose PHYSICAL plan contains a
  * partition-less WindowExec (the single-task window shape), excluding
  * the TwoPhase bucket-census windows (recognized structurally by the
  * `__tp_bucket` grouping below them). Feeds PlanAuditSpec's exempt
  * list. Usage: runMain graft.DevWindowAudit [sfDir]
  */
object DevWindowAudit {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = Engine.session(cores = "8", appName = "graft-dev-window")
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val sp = fn(spark, dir).queryExecution.sparkPlan
        val bad = sp.collect {
          case w: WindowExec if w.partitionSpec.isEmpty =>
            val census = w.child.collectFirst {
              case a: BaseAggregateExec if a.groupingExpressions.exists(
                _.references.exists(_.name.startsWith("__tp_b"))) => a
            }.isDefined
            if (census) None else Some(w)
        }.flatten
        if (bad.nonEmpty) println(s"GLOBALWIN $name (${bad.size})")
      } catch {
        case e: Throwable => println(s"ERR $name: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
