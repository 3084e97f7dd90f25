package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

object Multimodal {
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map()
  def oracleSql: Map[String, String] = Map()
}
