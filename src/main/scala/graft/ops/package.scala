package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core operator vocabulary (SURVEY.md §2.1), each a small composable
  * `DataFrame => DataFrame` so Catalyst sees one declarative plan and can
  * push filters / prune columns / pick join strategies across op
  * boundaries. Nothing here materializes or collects.
  */
package object ops {

  /** S2 — column-name normalization: strip / lowercase / spaces→`_`
    * (reference `migration.py:133`). Pure metadata rename: zero-cost in
    * the physical plan.
    */
  def normalizeColumnName(c: String): String =
    c.trim.toLowerCase.replace(" ", "_")

  def normalizeColumnNames(df: DataFrame): DataFrame =
    df.toDF(df.columns.map(normalizeColumnName).toIndexedSeq: _*)

  /** F1 — trim + Python-`title()` name cleanup (reference
    * `migration.py:51-63`); null-propagating like the reference's
    * early-return on missing names.
    */
  def cleanName(c: Column): Column = TitleCase(trim(c))

  /** F2 — null-propagating ISO date parse (reference `migration.py:65-78`).
    * `to_date` returns NULL on NULL input and on unparseable text in
    * non-ANSI mode; dates in the reference dataset are ISO `yyyy-MM-dd`.
    */
  def parseDate(c: Column): Column = to_date(c, "yyyy-MM-dd")

  /** K1 — deterministic surrogate key over the natural-key columns
    * (replaces the reference's nondeterministic ObjectId,
    * `migration.py:185,229`). `` separator avoids `("a","bc")` vs
    * `("ab","c")` collisions that a printable separator appearing in data
    * could allow. md5/concat_ws are codegen'd built-ins; at 100 TB this
    * is a pure map-side projection — no shuffle.
    */
  def surrogateKey(cols: Seq[Column]): Column =
    md5(concat_ws("", cols.map(_.cast("string")): _*))

  def withSurrogateKey(df: DataFrame, name: String, keyCols: Seq[String]): DataFrame =
    df.withColumn(name, surrogateKey(keyCols.map(col)))

  /** D2/D3 — "first-wins" keyed dedup. The reference relies on CSV file
    * order (`migration.py:165-231`); distributed Spark has no implicit
    * order, so the caller supplies explicit ordering columns. Window +
    * `row_number` shuffles once on `key` and keeps exactly the first row
    * per key — deterministic even when non-key attributes conflict
    * (the reference silently drops later conflicting rows; we reproduce
    * that deterministically).
    */
  def dedupFirstWins(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(key.map(col): _*).orderBy(order: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** P3 — per-column null-count profile (reference `migration.py:138`).
    * Single pass, partial aggregation map-side; one row out.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      (count(lit(1)) - count(col(cols.head))).as(s"n_${cols.head}"),
      cols.tail.map(c => (count(lit(1)) - count(col(c))).as(s"n_$c")): _*)

  /** P4 — duplicate-row count (reference `migration.py:139`): total minus
    * full-row-distinct, both as one distributed plan (scalar cross join,
    * no driver collect).
    */
  def dupRowCount(df: DataFrame): DataFrame =
    df.agg(count(lit(1)).as("__total"))
      .crossJoin(df.distinct().agg(count(lit(1)).as("__distinct")))
      .select((col("__total") - col("__distinct")).as("dup_rows"))

  /** J1 — fact→dim key resolution (reference's per-row dict/`find_one`
    * probe, `migration.py:165-189`) as a broadcast hash equi-join. The
    * dim side is the deduplicated natural-key table: small relative to
    * the fact even at 100 TB, so broadcast avoids shuffling the fact.
    * Set `broadcastDim=false` to let AQE pick (sort-merge w/ skew
    * handling) when the dim outgrows the broadcast threshold.
    */
  def resolveFk(
      fact: DataFrame,
      dim: DataFrame,
      key: Seq[String],
      broadcastDim: Boolean = true): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    fact.join(d, key, "left")
  }

  /** J2 — idempotent-append predicate (reference `find_one`-before-insert,
    * `migration.py:179-212`): keep only rows whose key is absent from
    * `existing`. Left-anti join; broadcast when the existing key set is
    * small.
    */
  def antiExisting(newRows: DataFrame, existing: DataFrame, key: Seq[String]): DataFrame =
    newRows.join(existing.select(key.map(col): _*).distinct(), key, "left_anti")

  /** A1 — group-count duplicate check (reference `test_migration.py:29-33`):
    * keys occurring more than once. Partial-agg map-side then final; the
    * `count > 1` filter happens post-agg (tiny).
    */
  def dupCheck(df: DataFrame, key: Seq[String]): DataFrame =
    df.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") > 1)
}
