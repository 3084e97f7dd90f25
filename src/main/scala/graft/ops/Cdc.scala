package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Set-based CDC apply — the MERGE/upsert the reference performs as
  * per-row find-one-then-insert probes (`/root/reference/migration.py:
  * 205-231`), generalized to a full changelog: q43 DIFFS two snapshots;
  * this APPLIES a changelog to a snapshot. One aggregation + one
  * anti-join + one union — at 100 TB the changelog (small) is hashed
  * and the base is anti-joined once; no per-row probes, no driver loop.
  */
object Cdc {

  /** Apply `changes` (base's columns + an op column ∈
    * {insert, update, delete}, case-insensitive) to `base`. The LATEST
    * change per key wins — `orderCol` must be a total order within each
    * key (e.g. a change-log sequence number); earlier changes for the
    * same key are superseded, and a final delete removes the row.
    * Payload travels as one struct through `max_by`, so a winner's
    * columns can never mix across change rows.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      key: Seq[String],
      opCol: String,
      orderCol: Column): DataFrame = {
    val others = changes.columns.filterNot(key.contains)
    val latest = changes
      .groupBy(key.map(col): _*)
      .agg(max_by(struct(others.map(col).toIndexedSeq: _*), orderCol).as("__w"))
      .select(key.map(col) ++ others.map(c => col(s"__w.$c").as(c)): _*)
    val upserts = latest
      .filter(lower(col(opCol)) =!= "delete")
      .select(base.columns.map(col).toIndexedSeq: _*)
    base
      .join(latest.select(key.map(col): _*), key, "left_anti")
      .unionByName(upserts)
  }
}
