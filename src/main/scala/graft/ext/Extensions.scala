package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Registry of the LLM-data-pipeline extension operators (SURVEY §2.4):
  * dedup family, similarity search, text analysis, multimodal plumbing.
  * Populated incrementally; keys join SparkEntry.queries.
  */
object Extensions {
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    TextAnalysis.queries ++ Dedup.queries ++ Similarity.queries ++
      Multimodal.queries ++ Sampling.queries ++ Components.queries ++
      Decontam.queries ++ Ranking.queries ++ Graph.queries ++
      Patterns.queries ++ Selection.queries ++ Curation.queries ++
      Robust.queries

  def oracleSql: Map[String, String] =
    TextAnalysis.oracleSql ++ Dedup.oracleSql ++ Similarity.oracleSql ++
      Multimodal.oracleSql ++ Sampling.oracleSql ++ Components.oracleSql ++
      Decontam.oracleSql ++ Ranking.oracleSql ++ Graph.oracleSql ++
      Patterns.oracleSql ++ Selection.oracleSql ++ Curation.oracleSql ++
      Robust.oracleSql
}
