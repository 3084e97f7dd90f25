package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Importance-resampling data selection (DSIR-style: score raw
  * documents by how target-like their hashed n-gram distribution is,
  * per Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling"). Reference capability anchor: the
  * reference's quality-gate filter chain (`/root/reference/
  * migration.py:88-113`) generalized from fixed thresholds to a
  * learned corpus-level importance weight per feature bucket.
  *
  * Mechanics, Spark-first and oracle-exact:
  *  - Words hash into `B` buckets via a PORTABLE digest (first 8 hex
  *    chars of md5 → integer, the q107 portability discipline — never
  *    Spark's engine-local murmur `hash`), so DuckDB reproduces
  *    bucketing bit-for-bit.
  *  - Per-bucket target/raw counts are exact integers; the per-bucket
  *    log-likelihood ratio is ONE identical integer-fed double
  *    expression on both engines, rounded ONCE onto the e4 grid
  *    (q205 discipline). `SelectionSpec` pins every bucket's rounding
  *    margin.
  *  - Per-doc scores are Σ tf·ratio_e4 over EXACT integers — no
  *    accumulation-order float drift is possible at the doc level,
  *    which is what makes top-k selection cross-engine stable.
  *
  * Scale (100 TB posture): the weight table is bounded by `B` rows —
  * corpus-statistics-sized, broadcast to the scorer. Token explodes
  * collapse map-side to per-(doc, bucket) tf (≤ B rows per doc)
  * before any join; the only fact-sized shuffles carry (doc, bucket,
  * count) triples, never text. Selection is TakeOrderedAndProject,
  * never a global sort.
  */
object Selection {

  /** Feature-hash bucket count. Small enough to broadcast and audit
    * margins per bucket; large enough that unigram collisions wash
    * out in the ratio estimate.
    */
  val B = 512

  /** The "target domain" slice of the corpus (DSIR's p_target sample);
    * everything else is the raw pool being scored.
    */
  val targetSources: Seq[String] = Seq("src0", "src1", "src2", "src3", "src4")

  private def tokens(text: Column): Column = split(text, " ")

  /** Portable word→bucket hash: first 8 md5 hex chars as an integer,
    * mod B. Reproducible in any engine with md5 (DuckDB:
    * `('0x'||substr(md5(w),1,8))::BIGINT % B`).
    */
  def bucket(w: Column): Column =
    pmod(conv(substring(md5(w), 1, 8), 16, 10).cast("long"), lit(B.toLong))

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.table(s, dir, "documents")

  private def isTarget(c: Column): Column = c.isin(targetSources: _*)

  /** Per-bucket importance-weight table: exact target/raw token counts
    * and the add-one-smoothed log-likelihood ratio on the e4 grid.
    * Output is ≤ B rows regardless of corpus size.
    */
  def bucketWeights(d: DataFrame): DataFrame = {
    val tok = d
      .select(isTarget(col("source")).as("tgt"),
        explode(tokens(col("text"))).as("w"))
      .select(col("tgt"), bucket(col("w")).as("b"))
    val counts = tok.groupBy(col("b")).agg(
      sum(when(col("tgt"), 1L).otherwise(0L)).as("ct"),
      sum(when(col("tgt"), 0L).otherwise(1L)).as("cr"))
    val tot = counts.agg(sum(col("ct")).as("nt"), sum(col("cr")).as("nr"))
    counts.withGlobalStats(tot)
      .select(col("b"), col("ct"), col("cr"),
        Similarity.intScaled(
          log((col("ct") + lit(1.0)) / (col("nt") + lit(B.toDouble))) -
            log((col("cr") + lit(1.0)) / (col("nr") + lit(B.toDouble))),
          10000L).as("ratio_e4"))
  }

  /** Per-raw-doc importance score: Σ_b tf(doc,b)·ratio_e4(b), exact
    * BIGINT once the ≤B-row weight table is fixed. Returns every raw
    * doc's (doc_id, source, n_tokens, score_e4).
    */
  def importanceScores(d: DataFrame): DataFrame = {
    val w = bucketWeights(d).select(col("b"), col("ratio_e4"))
    val tf = d.filter(!isTarget(col("source")))
      .select(col("doc_id"), col("source"),
        explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), col("source"), bucket(col("w")).as("b"))
      .groupBy(col("doc_id"), col("source"), col("b"))
      .agg(count(lit(1)).as("tf"))
    tf.join(broadcast(w), Seq("b"))
      .groupBy(col("doc_id"), col("source"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(col("tf") * col("ratio_e4")).as("score_e4"))
  }

  // ---- declared queries ---------------------------------------------------

  /** q227 — the DSIR bucket-weight table itself (sorted by bucket). */
  def q227(s: SparkSession, dir: String): DataFrame =
    bucketWeights(docs(s, dir)).orderBy(col("b"))

  /** q228 — top-50 raw docs by importance score (doc_id tiebreak:
    * integer scores tie across engines identically, so the order is
    * total and stable).
    */
  def q228(s: SparkSession, dir: String): DataFrame =
    importanceScores(docs(s, dir))
      .orderBy(col("score_e4").desc, col("doc_id"))
      .limit(50)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q227_dsir_weights" -> (q227 _),
    "q228_dsir_select"  -> (q228 _))

  private val targetList = targetSources.map(s => s"'$s'").mkString(", ")

  val oracleSql: Map[String, String] = Map(
    "q227_dsir_weights" ->
      s"""WITH tok AS (
         |  SELECT source IN ($targetList) AS tgt,
         |         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))
         |           ::BIGINT % $B AS b
         |  FROM documents),
         |counts AS (
         |  SELECT b,
         |         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |         CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
         |  FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
         |               CAST(SUM(cr) AS BIGINT) AS nr FROM counts)
         |SELECT b, ct, cr,
         |       CAST(ROUND((ln((ct + 1.0) / (nt + $B.0))
         |                   - ln((cr + 1.0) / (nr + $B.0))) * 10000)
         |            AS BIGINT) AS ratio_e4
         |FROM counts CROSS JOIN tot
         |ORDER BY b""".stripMargin,
    "q228_dsir_select" ->
      s"""WITH tok AS (
         |  SELECT source IN ($targetList) AS tgt,
         |         ('0x' || substr(md5(unnest(string_split(text, ' '))), 1, 8))
         |           ::BIGINT % $B AS b
         |  FROM documents),
         |counts AS (
         |  SELECT b,
         |         CAST(SUM(CASE WHEN tgt THEN 1 ELSE 0 END) AS BIGINT) AS ct,
         |         CAST(SUM(CASE WHEN tgt THEN 0 ELSE 1 END) AS BIGINT) AS cr
         |  FROM tok GROUP BY b),
         |tot AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
         |               CAST(SUM(cr) AS BIGINT) AS nr FROM counts),
         |w AS (
         |  SELECT b,
         |         CAST(ROUND((ln((ct + 1.0) / (nt + $B.0))
         |                     - ln((cr + 1.0) / (nr + $B.0))) * 10000)
         |              AS BIGINT) AS ratio_e4
         |  FROM counts CROSS JOIN tot),
         |tf AS (
         |  SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS tf
         |  FROM (SELECT doc_id, source,
         |               ('0x' || substr(md5(unnest(string_split(text, ' '))),
         |                               1, 8))::BIGINT % $B AS b
         |        FROM documents WHERE source NOT IN ($targetList))
         |  GROUP BY doc_id, source, b)
         |SELECT doc_id, source,
         |       CAST(SUM(tf) AS BIGINT) AS n_tokens,
         |       CAST(SUM(tf * ratio_e4) AS BIGINT) AS score_e4
         |FROM tf JOIN w USING (b)
         |GROUP BY doc_id, source
         |ORDER BY score_e4 DESC, doc_id
         |LIMIT 50""".stripMargin)
}
