package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 apply: merge an incoming snapshot
  * into a versioned dimension (validity ranges + current flag) as ONE
  * set-based job — the warehouse counterpart of [[Cdc.applyChanges]].
  *
  * Row fates:
  *   - history rows (`is_current = 0`): pass through untouched
  *   - current row, attributes unchanged: stays current
  *   - current row, attributes changed: CLOSED (`valid_to` = batch
  *     date, `is_current` = 0) and a new current version is inserted
  *     with `valid_from` = batch date
  *   - incoming key with no current row: brand-new current version
  *   - current row absent from the snapshot: kept (delete handling
  *     belongs to CDC, not snapshot diffs — documented policy)
  *
  * Scale shape: one key-partitioned join of CURRENT rows against the
  * snapshot (history never joins), two map-side projections for the
  * closed/new versions, and a union — at 100 TB the join shuffles only
  * the current generation, and a production table would additionally
  * partition-prune on `is_current`.
  */
object Scd {

  /** @param dim versioned dimension: key ++ attrs ++
    *            (valid_from DATE, valid_to DATE?, is_current INT)
    * @param incoming snapshot: key ++ attrs
    * @param key natural-key columns
    * @param attrs compared attribute columns (a change in ANY closes
    *              the current version)
    * @param batchDate the snapshot's effective date
    */
  def scd2Apply(
      dim: DataFrame, incoming: DataFrame,
      key: Seq[String], attrs: Seq[String], batchDate: Column): DataFrame = {
    // Fail fast on duplicate snapshot keys: they would produce multiple
    // 'opened' current rows for one natural key and silently corrupt
    // the single-current invariant. One key-only agg over the snapshot
    // — cheap next to the merge itself; callers with intentional dups
    // must dedup with an explicit policy first.
    // agg alias `__dup_n`, not `.count()`: a natural-key column
    // literally named `count` would make the filter reference ambiguous
    val dupKey = incoming.groupBy(key.map(col): _*)
      .agg(count(lit(1)).as("__dup_n"))
      .filter(col("__dup_n") > 1).limit(1).count()
    require(dupKey == 0L,
      s"scd2Apply: incoming snapshot has duplicate natural keys (${key.mkString(",")}) — " +
        "dedup with an explicit policy before merging")
    val outCols = (key ++ attrs ++ Seq("valid_from", "valid_to", "is_current"))
      .map(col)
    val history = dim.filter(col("is_current") === 0)
    val current = dim.filter(col("is_current") === 1)

    // explicit presence markers: detecting side-presence via attribute
    // nullness would misclassify a row whose attributes are all NULL
    val inc = incoming.select((key ++ attrs).map(col): _*)
      .withColumn("__inc", lit(1))
    val cur = current.withColumn("__cur", lit(1))
    val joined = cur.as("c").join(inc.as("i"), key, "full_outer")
    val changed = attrs
      .map(a => not(col(s"c.$a") <=> col(s"i.$a")))
      .reduce(_ || _)
    val hasCurrent = col("c.__cur").isNotNull
    val hasIncoming = col("i.__inc").isNotNull

    // unchanged current rows + current rows missing from the snapshot
    val keepCurrent = joined
      .filter(hasCurrent && (!hasIncoming || !changed))
      .select(key.map(col) ++ attrs.map(a => col(s"c.$a").as(a)) ++
        Seq(col("c.valid_from").as("valid_from"),
          col("c.valid_to").as("valid_to"),
          col("c.is_current").as("is_current")): _*)
    // changed current rows -> closed
    val closed = joined.filter(hasCurrent && hasIncoming && changed)
      .select(key.map(col) ++ attrs.map(a => col(s"c.$a").as(a)) ++
        Seq(col("c.valid_from").as("valid_from"),
          batchDate.as("valid_to"),
          lit(0).as("is_current")): _*)
    // changed rows' new versions + brand-new keys -> new current
    val opened = joined.filter(hasIncoming && (!hasCurrent || changed))
      .select(key.map(col) ++ attrs.map(a => col(s"i.$a").as(a)) ++
        Seq(batchDate.as("valid_from"),
          lit(null).cast("date").as("valid_to"),
          lit(1).as("is_current")): _*)

    history.select(outCols: _*)
      .unionByName(keepCurrent)
      .unionByName(closed)
      .unionByName(opened)
  }
}
