package graft

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** M1 — run metrics (reference `migration.py:28-48,240-251`): a
  * QueryExecutionListener recording one entry per completed action
  * (action name, output rows where the plan exposes them, wall
  * duration). The Spark-native analog of the reference's counters +
  * elapsed-seconds log lines.
  */
final case class ActionMetric(action: String, outputRows: Option[Long], durationMs: Long)

final class MetricsListener extends QueryExecutionListener {
  private val entries = new ConcurrentLinkedQueue[ActionMetric]()

  override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
    val rows = qe.executedPlan.metrics.get("numOutputRows").map(_.value)
    entries.add(ActionMetric(funcName, rows, durationNs / 1000000))
  }

  override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
    entries.add(ActionMetric(s"$funcName!failed", None, 0L))

  def snapshot: Seq[ActionMetric] = entries.asScala.toSeq
}

object Metrics {
  /** Run `body` with a listener attached; returns (result, recorded
    * actions). Listener callbacks are async — `spark.listenerManager`
    * is flushed before snapshotting.
    */
  def record[T](spark: SparkSession)(body: => T): (T, Seq[ActionMetric]) = {
    val l = new MetricsListener
    spark.listenerManager.register(l)
    try {
      val r = body
      org.apache.spark.sql.graftbridge.Bridge.flushListeners(spark)
      (r, l.snapshot)
    } finally spark.listenerManager.unregister(l)
  }
}
