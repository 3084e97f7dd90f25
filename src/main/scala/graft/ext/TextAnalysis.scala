package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for LLM-data pipelines over the `documents`
  * table (SURVEY §2.4): token statistics, language-ID heuristic, quality
  * scoring, token counting, document fingerprinting. Everything is
  * built-in codegen'd expressions — per-doc work is a map-side
  * projection; the only shuffles are the declared aggregations. At
  * 100 TB each of these runs as a single scan with full column pruning.
  */
object TextAnalysis {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  /** Whitespace tokens (documents.text is single-space separated). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text))

  /** Count of tokens belonging to a stopword set. */
  def stopwordHits(text: Column, stopwords: Seq[String]): Column =
    size(filter(tokens(text), w => w.isin(stopwords: _*)))

  /** Language-ID by stopword-list hit-rate (n-gram heuristic degenerated
    * to unigrams — adequate for space-separated text; CJK would need
    * char n-grams). Deterministic tie-break: en > de > es > fr.
    */
  val langStopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and"),
    "de" -> Seq("der", "die", "und", "das"),
    "es" -> Seq("el", "los", "y", "que"),
    "fr" -> Seq("le", "la", "et", "les"))

  def guessLang(text: Column): Column = {
    val scores = langStopwords.map { case (l, sw) => l -> stopwordHits(text, sw) }
    // argmax with order-stable tie-break, NULL-free: a language wins only
    // with a positive score and no earlier language scoring higher.
    val s = scores.toMap
    when(s("en") >= s("de") && s("en") >= s("es") && s("en") >= s("fr") && s("en") > 0, "en")
      .when(s("de") >= s("es") && s("de") >= s("fr") && s("de") > 0, "de")
      .when(s("es") >= s("fr") && s("es") > 0, "es")
      .when(s("fr") > 0, "fr")
      .otherwise("unknown")
  }

  /** Quality score: non-stopword density × saturating length factor —
    * the length/stopword-ratio heuristic family used for pretraining
    * corpus filtering.
    */
  def stopRatio(text: Column): Column =
    stopwordHits(text, Seq("a", "the")).cast("double") / tokenCount(text)

  def qualityScore(text: Column): Column =
    (lit(1.0) - stopRatio(text)) *
      least(tokenCount(text).cast("double") / 50.0, lit(1.0))

  /** Canonicalization fingerprint: md5 over lower-cased,
    * whitespace-collapsed text. Map-side; the natural key for exact
    * near-normalized dedup.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, " +", " "))))

  /** Polynomial rolling hash over the token sequence (order-sensitive,
    * unlike the md5 canonical fingerprint): fold tokens into
    * h = h*31 + murmur(token), entirely inside the engine via the
    * `aggregate` higher-order function. Engine-local (Spark murmur), so
    * unit-tested rather than oracle-checked.
    */
  def rollingHash(tokensCol: Column): Column =
    aggregate(tokensCol, lit(0L), (h, w) => h * 31L + hash(w).cast("long"))

  // ---- declared queries ---------------------------------------------------

  def q50(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("docs"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        sum(tokenCount(col("text"))).as("total_tokens"))
      .orderBy("lang", "source")

  def q51(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"), col("lang"),
        guessLang(col("text")).as("guess"),
        stopwordHits(col("text"), langStopwords.head._2).cast("long").as("s_en"))
      .orderBy("doc_id")

  def q52(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        tokenCount(col("text")).cast("long").as("n_tokens"),
        round(stopRatio(col("text")), 4).as("stop_ratio"),
        round(qualityScore(col("text")), 4).as("quality"))
      .orderBy("doc_id")

  def q53(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(
        col("doc_id"),
        size(regexp_extract_all(col("text"), lit("[a-z0-9]+"), lit(0)))
          .cast("long").as("n_re_tokens"),
        size(array_distinct(tokens(col("text")))).cast("long").as("n_unique"))
      .orderBy("doc_id")

  def q54(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .select(col("doc_id"), fingerprint(col("text")).as("fp"))
      .orderBy("doc_id")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_text_stats"    -> (q50 _),
    "q51_lang_id"       -> (q51 _),
    "q52_quality_score" -> (q52 _),
    "q53_token_count"   -> (q53 _),
    "q54_fingerprint"   -> (q54 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q50_text_stats" ->
      """SELECT lang, source, COUNT(*) AS docs,
        |       ROUND(AVG(n_chars), 2) AS avg_chars,
        |       CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens
        |FROM documents GROUP BY lang, source ORDER BY lang, source""".stripMargin,
    "q51_lang_id" ->
      """WITH scored AS (
        |  SELECT doc_id, lang,
        |    len(list_filter(string_split(text,' '), w -> w IN ('the','a','of','and'))) AS s_en,
        |    len(list_filter(string_split(text,' '), w -> w IN ('der','die','und','das'))) AS s_de,
        |    len(list_filter(string_split(text,' '), w -> w IN ('el','los','y','que'))) AS s_es,
        |    len(list_filter(string_split(text,' '), w -> w IN ('le','la','et','les'))) AS s_fr
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN s_en >= s_de AND s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
        |       WHEN s_de >= s_es AND s_de >= s_fr AND s_de > 0 THEN 'de'
        |       WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
        |       WHEN s_fr > 0 THEN 'fr'
        |       ELSE 'unknown' END AS guess,
        |  CAST(s_en AS BIGINT) AS s_en
        |FROM scored ORDER BY doc_id""".stripMargin,
    "q52_quality_score" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text,' ')) AS BIGINT) AS n_tokens,
        |  ROUND(CAST(len(list_filter(string_split(text,' '), w -> w IN ('a','the'))) AS DOUBLE)
        |        / len(string_split(text,' ')), 4) AS stop_ratio,
        |  ROUND((1.0 - CAST(len(list_filter(string_split(text,' '), w -> w IN ('a','the'))) AS DOUBLE)
        |        / len(string_split(text,' ')))
        |        * LEAST(CAST(len(string_split(text,' ')) AS DOUBLE) / 50.0, 1.0), 4) AS quality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q53_token_count" ->
      """SELECT doc_id,
        |  CAST(len(regexp_extract_all(text, '[a-z0-9]+')) AS BIGINT) AS n_re_tokens,
        |  CAST(len(list_distinct(string_split(text,' '))) AS BIGINT) AS n_unique
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q54_fingerprint" ->
      """SELECT doc_id, md5(lower(trim(regexp_replace(text, ' +', ' ', 'g')))) AS fp
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
