package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-16 batch: the incremental-maintenance theme extended to the
  * text-ranking family's index state. (q424 lives with the CC family
  * in [[graft.ext.Components]], q425 with decontamination in
  * [[graft.ext.Decontam]], q426 with the ANN family in
  * [[graft.ext.Similarity]].)
  */
object Round16 {

  /** Land per-term DOCUMENT-FREQUENCY registers in TWO generations —
    * the inverted-index statistics a BM25/TF-IDF ranker keeps hot:
    * generation 0 is the even-id corpus half (the index build),
    * generation 1 the odd-id half landed `mode("append")` (the daily
    * batch folded in — the q426 posture for text statistics). DF
    * registers SUM-merge across generations (each doc contributes its
    * distinct terms exactly once to exactly one generation), which is
    * what makes them incrementally maintainable: a new batch lands its
    * own census-sized register file and no ranker input is ever
    * recomputed from the corpus.
    */
  private[graft] def ensureDfStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "dfstore", dir) { root =>
      val d = Tables.table(s, dir, "documents")
      val terms = d.select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      def gen(parity: Int): DataFrame = terms
        .filter(col("doc_id") % 2 === parity)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(parity.toLong))
      gen(0).write.mode("overwrite").parquet(s"$root/df")
      gen(1).write.mode("append").parquet(s"$root/df")
      // Corpus-stat registers beside the DF registers (r16 verdict —
      // the store needs everything a BM25/TF-IDF consumer reads, or
      // the consumer still rescans the corpus for N/avgdl): per
      // generation, the doc count and the EXACT integer token-length
      // sum. Both SUM-merge like the DF rows, and avgdl = Σdl/Σn is
      // one double division of exact integers — bit-identical to a
      // from-raw avg(dl) (q126's own exactness note).
      def corpusGen(parity: Int): DataFrame = d
        .filter(col("doc_id") % 2 === parity)
        .agg(count(lit(1)).as("n_docs"),
          sum(size(split(col("text"), " ")).cast("long")).as("dl_sum"))
        .withColumn("gen", lit(parity.toLong))
      corpusGen(0).write.mode("overwrite").parquet(s"$root/corpus")
      corpusGen(1).write.mode("append").parquet(s"$root/corpus")
      root
    }

  /** q427 — document-frequency registers FROM the two-generation
    * store: per term, the per-generation and merged document
    * frequencies for the top-25 terms by merged DF (ties broken by
    * term — a deterministic total order), answered entirely from the
    * store read-back. The oracle rebuilds both halves' DF from raw
    * documents — a hash match certifies (1) the register landing lost
    * or duplicated no (term, generation) row and (2) SUM-merge ∘ land
    * ≡ direct aggregation for the DF family, the property that lets a
    * 100 TB ranking pipeline maintain its index statistics by
    * appending batch registers instead of re-scanning the corpus
    * (IDF/BM25 themselves are certified from raw by q106/q126; this
    * certifies the STATE those queries would read at scale).
    *
    * All-integer end to end — no float anywhere (the q423 discipline:
    * keep the store certification exact; derived scores carry their
    * own certified spelling elsewhere).
    *
    * Scale: the store is vocab-sized (census of terms × 2 generations);
    * the merge is one key-scoped SUM; top-25 is a TakeOrdered, never a
    * global sort. One corpus scan per generation's landing, zero after.
    */
  def q427(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureDfStore(s, dir) + "/df")
      .groupBy(col("term"))
      .agg(
        sum(when(col("gen") === 0L, col("df"))).as("df_old"),
        sum(when(col("gen") === 1L, col("df"))).as("df_new"))
      .select(col("term"),
        coalesce(col("df_old"), lit(0L)).as("df_old"),
        coalesce(col("df_new"), lit(0L)).as("df_new"),
        (coalesce(col("df_old"), lit(0L)) +
          coalesce(col("df_new"), lit(0L))).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(25)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q427_df_register_store" -> (q427 _),
  )

  val oracleSql: Map[String, String] = Map(
    // Both generations' DF rebuilt from raw documents; same
    // (df DESC, term) total order and top-25 cut.
    "q427_df_register_store" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |g AS (
        |  SELECT term,
        |         SUM(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS df_old,
        |         SUM(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END) AS df_new
        |  FROM t GROUP BY term)
        |SELECT term, CAST(df_old AS BIGINT) AS df_old,
        |       CAST(df_new AS BIGINT) AS df_new,
        |       CAST(df_old + df_new AS BIGINT) AS df
        |FROM g ORDER BY df DESC, term LIMIT 25""".stripMargin,
  )
}
