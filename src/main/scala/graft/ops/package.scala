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

  /** F2 — null-propagating ISO date parse (reference `migration.py:65-78`):
    * NULL in and unparseable text both yield NULL, matching the
    * reference's try/except-return-None. `try_to_date`, not `to_date` —
    * Spark 4 runs ANSI mode by default, where `to_date` THROWS on
    * malformed input.
    */
  def parseDate(c: Column): Column = try_to_date(c, "yyyy-MM-dd")

  /** K1 — deterministic surrogate key over the natural-key columns
    * (replaces the reference's nondeterministic ObjectId,
    * `migration.py:185,229`). The non-printable `\\u0001` separator avoids
    * `("a","bc")` vs `("ab","c")` collisions, and every column is
    * null-encoded explicitly — concat_ws silently DROPS null args, which
    * would make `("x", NULL)` collide with `(NULL, "x")` and with
    * `("x")`. md5/concat_ws/coalesce are codegen'd built-ins; at 100 TB
    * this is a pure map-side projection — no shuffle.
    *
    * VERSIONING CONTRACT: the key is a pure function of (separator,
    * null-sentinel, column order), so changing ANY of them re-keys the
    * universe — an append-mode sink written under the old derivation
    * stops matching in the idempotent anti-join and rows duplicate.
    * The encoding above is v2 (v1 used an empty separator and a space
    * sentinel, fixed for collision-safety). If it ever changes again,
    * existing sinks must be rewritten (full overwrite run) before the
    * next append. Sinks record the version they were written under
    * (`Healthcare.writeIdempotent` stamps a `_graft_key_version` marker)
    * and a mismatched append fails fast instead of silently duplicating.
    */
  val surrogateKeyVersion: Int = 2

  def surrogateKey(cols: Seq[Column]): Column =
    md5(concat_ws("\u0001",
      cols.map(c => coalesce(c.cast("string"), lit("\u0000"))): _*))

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

  /** D2/D3 as an AGGREGATION instead of a window: `min_by` of the whole
    * row over the order key. Identical result to [[dedupFirstWins]] when
    * the order is total — but the physical plan partially aggregates
    * map-side, so the shuffle carries ONE candidate row per key per
    * partition instead of every row. At 100 TB with high key
    * multiplicity this is the difference between shuffling the dataset
    * and shuffling the dim.
    */
  def dedupFirstWinsAgg(df: DataFrame, key: Seq[String], order: Seq[Column]): DataFrame = {
    val payload = df.columns.filterNot(key.contains).map(col).toIndexedSeq
    val winner = min_by(struct(payload: _*), struct(order: _*)).as("__w")
    df.groupBy(key.map(col).toIndexedSeq: _*)
      .agg(winner)
      .select(key.map(col) ++ df.columns.filterNot(key.contains)
        .map(c => col(s"__w.$c").as(c)): _*)
      .select(df.columns.map(col).toIndexedSeq: _*) // original column order
  }

  /** P3 — per-column null-count profile (reference `migration.py:138`).
    * Single pass, partial aggregation map-side; one row out.
    */
  def nullProfile(df: DataFrame, cols: Seq[String]): DataFrame =
    df.agg(
      (count(lit(1)) - count(col(cols.head))).as(s"n_${cols.head}"),
      cols.tail.map(c => (count(lit(1)) - count(col(c))).as(s"n_$c")): _*)

  /** P4 — duplicate-row count (reference `migration.py:139`) in a SINGLE
    * pass: group by every column, each extra copy contributes cnt-1.
    * Halves the scan cost vs count-minus-distinct at 100 TB; partial
    * aggregation still combines map-side.
    */
  def dupRowCount(df: DataFrame): DataFrame =
    df.groupBy(df.columns.map(col).toIndexedSeq: _*)
      .agg(count(lit(1)).as("__cnt"))
      .agg(coalesce(sum(col("__cnt") - 1), lit(0L)).as("dup_rows"))

  /** P2 — schema/dtype report (reference `migration.py:137`): one row per
    * column with its Spark SQL type. Driver-side metadata only — no job.
    */
  def schemaReport(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    import s.implicits._
    df.dtypes.toSeq.toDF("column_name", "spark_type")
  }

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
      broadcastDim: Boolean = true,
      nullSafeKeys: Boolean = false): DataFrame = {
    val d = if (broadcastDim) broadcast(dim) else dim
    if (!nullSafeKeys) fact.join(d, key.toIndexedSeq, "left")
    else {
      // `<=>` key equality: the reference's dict/tuple lookup matches
      // None keys (`migration.py:165-168`), so a NULL-keyed fact must
      // still find its NULL-keyed dim row — plain equi-join would
      // orphan it.
      val renamed = key.foldLeft(d)((df, k) => df.withColumnRenamed(k, s"__dim_$k"))
      val cond = key.map(k => fact(k) <=> renamed(s"__dim_$k")).reduce(_ && _)
      fact.join(renamed, cond, "left").drop(key.map(k => s"__dim_$k"): _*)
    }
  }

  /** J1-skew — salted fact→dim join (SURVEY §7.4.8): human-name natural
    * keys skew at 100 TB; one hot key lands on one reducer. Salting
    * spreads each fact key over `buckets` deterministic sub-keys and
    * replicates the dim row once per bucket, so the hot key's rows hash
    * to `buckets` different reducers. AQE's skew-join handling covers
    * sort-merge joins at runtime; explicit salting is the fallback for
    * shuffles AQE cannot split.
    *
    * The salt is a hash of ALL fact columns — deterministic (re-runs
    * produce identical plans/results) and uniform enough even when the
    * key column itself is constant.
    */
  def saltedResolveFk(
      fact: DataFrame,
      dim: DataFrame,
      key: Seq[String],
      buckets: Int): DataFrame = {
    val salted = fact.withColumn(
      "__salt", pmod(hash(fact.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val dimExp = dim.withColumn(
      "__salt", explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(dimExp, (key :+ "__salt").toIndexedSeq, "left").drop("__salt")
  }

  /** D2-skew — two-phase first-wins dedup for skewed keys: dedup within
    * (key, salt) first (spreads the hot key), then dedup the per-salt
    * winners globally. First-wins composes (the min over per-bucket
    * minima is the global minimum), so the result is identical to the
    * single-shuffle [[dedupFirstWins]] — only the shuffle profile
    * changes.
    */
  def dedupFirstWinsSalted(
      df: DataFrame,
      key: Seq[String],
      order: Seq[Column],
      buckets: Int): DataFrame = {
    val salted = df.withColumn(
      "__salt", pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(buckets)))
    val local = dedupFirstWins(salted, key :+ "__salt", order)
    dedupFirstWins(local, key, order).drop("__salt")
  }

  /** Approximate distinct count (HLL; §2.4 "approx distinct"): the
    * 100 TB substitute for exact COUNT(DISTINCT) when a few-% error is
    * acceptable — no exact-distinct shuffle of the full key set.
    */
  def approxDistinct(df: DataFrame, c: String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(c), rsd).as(s"approx_nd_$c"))

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

  /** Broadcast-global-stats idiom, NAMED (r11 verdict item 7 — ~100
    * call sites used to re-spell `crossJoin(broadcast(stats))` by
    * hand): attach a tiny aggregate frame — global totals, a threshold
    * row, a calibration table — to every row of `df`.
    *
    * This is the registry's ONE accepted crossJoin shape, and
    * PlanAuditSpec's BNL net enforces its contract structurally: the
    * broadcast (build) side must be provably bounded IN THE PLAN — a
    * grouping-free aggregate (exactly one row), a limit/TakeOrdered, a
    * literal local relation, or an attribute-vs-literal filter bound.
    * A data-proportional build side (the q354 / q230-pre-r12 bug
    * shape) fails the suite.
    *
    * Scale: the broadcast ships kilobytes to every task; no shuffle,
    * no skew surface, and Catalyst folds the appended columns into the
    * enclosing projection.
    */
  implicit class GlobalStats(private val df: DataFrame) extends AnyVal {
    def withGlobalStats(stats: DataFrame): DataFrame =
      df.crossJoin(broadcast(stats))
  }
}
