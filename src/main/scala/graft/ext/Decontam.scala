package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Benchmark decontamination: flag training documents that share long
  * word n-grams with an evaluation set (the GPT-3/PaLM-style 13-gram
  * overlap check, run before any eval number is trusted). A training
  * corpus that contains eval text inflates benchmarks silently — this
  * is a first-class stage of every serious pretraining pipeline.
  *
  * Scale design (100 TB): the eval side is SMALL (benchmarks are
  * thousands of docs, not billions) — its distinct gram set is
  * broadcast, so the train side never shuffles its exploded grams: the
  * plan is scan → map-side explode → broadcast-hash join (drops all
  * non-matching grams immediately) → partial-agg on doc_id. The only
  * full shuffle carries per-doc HIT counts, which is bounded by the
  * contamination volume, not the corpus size.
  */
object Decontam {

  /** Per-train-doc contamination report against `evalDocs`.
    *
    * @param trainDocs (`doc_id`, token-array `ws`)
    * @param evalDocs  (token-array `ws`) — the benchmark side
    * @param k         gram length (13 in the GPT-3 protocol; tests use
    *                  smaller k so the tiny fixtures overlap at all)
    * @return contaminated train docs only: (`doc_id`, `n_grams`,
    *         `hit_grams`, `hit_ratio`)
    */
  def contaminationReport(
      trainDocs: DataFrame, evalDocs: DataFrame, k: Int): DataFrame = {
    // explode_OUTER on purpose: a plain explode triggers
    // InferFiltersFromGenerate, whose `size(grams) > 0` predicate gets
    // pushed through the gram projection and INLINED — re-evaluating
    // the whole k-gram transform (with split re-run per element_at, in
    // interpreted mode) once more per row just to test emptiness.
    // Measured 5× on q104 at sf0.1. The outer generator is exempt from
    // that rule; the isnotnull filter on the GENERATED attribute cannot
    // be pushed below the Generate.
    val evalGrams = evalDocs
      .select(explode_outer(Dedup.shinglesK(col("ws"), k)).as("gram"))
      .filter(col("gram").isNotNull)
      .distinct()
    val trainGrams = trainDocs
      .select(col("doc_id"), Dedup.shinglesK(col("ws"), k).as("grams"))
      .select(col("doc_id"), size(col("grams")).as("n_grams"),
        explode_outer(col("grams")).as("gram"))
      .filter(col("gram").isNotNull)
    trainGrams
      .join(broadcast(evalGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(
        // n_grams is constant per doc; max() keeps the agg partial-able
        max(col("n_grams")).cast("long").as("n_grams"),
        countDistinct(col("gram")).as("hit_grams"))
      .select(
        col("doc_id"), col("n_grams"), col("hit_grams"),
        round(col("hit_grams").cast("double") / col("n_grams"), 4)
          .as("hit_ratio"))
  }

  // ---- declared queries ---------------------------------------------------

  /** q104 — decontamination over the fixture corpus: every 7th doc
    * plays the eval set (chosen so the corpus' organic 5-gram sharing
    * crosses the train/eval boundary — a dozen genuinely contaminated
    * train docs at sf0.01, so the certification exercises real hits,
    * not an empty result).
    */
  def q104(s: SparkSession, dir: String): DataFrame = {
    val d = Tables.table(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val eval = d.filter(col("doc_id") % 7 === 0)
    val train = d.filter(col("doc_id") % 7 =!= 0)
    contaminationReport(train, eval, k = 5).orderBy("doc_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q104_decontaminate" -> (q104 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q104_decontaminate" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        |g AS (SELECT doc_id,
        |        CASE WHEN len(ws) >= 5 THEN
        |          list_distinct(list_transform(range(1, len(ws) - 3),
        |            i -> array_to_string(ws[i:i+4], ' ')))
        |        ELSE CAST([] AS VARCHAR[]) END AS grams
        |      FROM t),
        |e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 7 = 0),
        |tr AS (SELECT doc_id, len(grams) AS n_grams, unnest(grams) AS gram
        |       FROM g WHERE doc_id % 7 <> 0)
        |SELECT tr.doc_id,
        |  CAST(MAX(tr.n_grams) AS BIGINT) AS n_grams,
        |  CAST(COUNT(DISTINCT tr.gram) AS BIGINT) AS hit_grams,
        |  ROUND(CAST(COUNT(DISTINCT tr.gram) AS DOUBLE) / MAX(tr.n_grams), 4)
        |    AS hit_ratio
        |FROM tr JOIN e USING (gram)
        |GROUP BY tr.doc_id ORDER BY tr.doc_id""".stripMargin,
  )
}
