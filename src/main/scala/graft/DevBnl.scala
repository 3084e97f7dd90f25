package graft

import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Dev-only: print the build side of every BroadcastNestedLoopJoin in
  * the named queries' plans — the manual-adjudication companion to
  * PlanAuditSpec's BNL contract net.
  */
object DevBnl {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.001"
    val spark = Engine.session(cores = "8", appName = "graft-devbnl")
    args.foreach { name =>
      val sp = SparkEntry.queries(name)(spark, dir).queryExecution.sparkPlan
      sp.collect { case b: BroadcastNestedLoopJoinExec => b }.foreach { b =>
        val build = b.buildSide match {
          case BuildLeft => b.left
          case BuildRight => b.right
        }
        println(s"==== $name BNL build side ====")
        println(build.toString)
      }
    }
    spark.stop()
  }
}
