package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Interchange formats beyond the parquet/CSV core (SURVEY §2.2 sources):
  * JSON-lines and ORC, as explicit-schema read/write pairs.
  *
  * Design rules for the 100 TB posture:
  *
  *  - **Reads always take an explicit schema.** Schema inference is an
  *    extra full scan of the data (JSON) or a footer sample (ORC) before
  *    the real job starts, and a type drift between files silently
  *    changes the plan. At scale the schema is a contract, not a guess.
  *  - **JSONL is the interchange shape, not the analytics shape**: it is
  *    line-splittable (parallel scan works) but row-oriented and
  *    schema-on-read — no column pruning, no predicate pushdown, every
  *    query pays full parse cost. Land JSONL once, convert to
  *    parquet/ORC for anything queried twice.
  *  - **ORC is a full columnar peer of parquet** (stripe-level min/max
  *    + bloom skipping, vectorized reader, predicate pushdown — audited
  *    in SourcesSpec); offered because warehouse estates are frequently
  *    ORC-standardized.
  *  - Writes go through the normal `DataFrameWriter` so `mode`
  *    (overwrite/append) matches the W1 semantics certified on parquet.
  */
object Sources {

  /** Write as JSON-lines (one JSON object per line, UTC timestamps). */
  def writeJsonl(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Read JSON-lines with a declared schema. Corrupt lines fail the job
    * (FAILFAST) rather than silently becoming nulls — at scale a bad
    * producer shows up as a loud failure, not a 0.1% null drift.
    */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).option("mode", "FAILFAST").json(path)

  /** Permissive JSONL read routing malformed lines to `_corrupt_record`
    * for quarantine pipelines (the scale-friendly alternative to
    * FAILFAST when the producer cannot be trusted).
    */
  def readJsonlPermissive(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record", "string"))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)

  /** Write ORC (zlib default; stripe stats written automatically). */
  def writeOrc(df: DataFrame, path: String, mode: String = "overwrite"): Unit =
    df.write.mode(mode).orc(path)

  /** Read ORC with a declared schema (pruning + pushdown reach the
    * stripe reader exactly as with parquet — asserted in SourcesSpec).
    */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)

  /** Read a parquet directory whose files were written under EVOLVING
    * schemas (columns added over time — the normal life of a 100 TB
    * table). `mergeSchema` unions the per-file footers; files written
    * before a column existed surface NULL for it. Schema merging reads
    * every footer, so production tables should pin the merged schema
    * once (pass `pinned`) instead of re-merging per query — pinning
    * also restores ordinary footer-skipping scan startup.
    */
  def readParquetEvolved(
      spark: SparkSession, path: String,
      pinned: Option[StructType] = None): DataFrame =
    pinned match {
      case Some(s) => spark.read.schema(s).parquet(path)
      case None    => spark.read.option("mergeSchema", "true").parquet(path)
    }
}
