package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry over the driver testdata layout (`TESTDATA.md`):
  * one parquet file per table under a scale-factor directory
  * (`/root/testdata/sf0.01/lineitem.parquet`, ...).
  *
  * Reads are plain parquet relations so Catalyst predicate pushdown,
  * column pruning, and row-group min/max skipping all reach the scan.
  */
object Tables {

  /** Read `<dir>/<name>.parquet`. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4.x refuses to
    * read unless `spark.sql.legacy.parquet.nanosAsLong=true`; with the
    * flag the column surfaces as `bigint` nanoseconds (SURVEY §2.5).
    * Ordering/equality on the long equals ordering on the timestamp, so
    * dedup/window semantics are unaffected; convert explicitly via
    * [[eventTs]] where real timestamp semantics are needed.
    */
  def events(spark: SparkSession, dir: String): DataFrame =
    table(spark, dir, "events") // nanosAsLong is set at session build (Engine)

  /** Nanosecond-long `ts` -> TimestampType (microsecond precision,
    * truncating sub-microsecond deliberately — SURVEY §7.4 item 7).
    * INTEGER division (`div`), not `/`: Column `/` is double division,
    * and at ~1.7e18 epoch nanos the double rounding can land one
    * microsecond high before the cast truncates.
    */
  def eventTs(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    // subtract the sub-microsecond remainder first: the division then
    // operates on an exact multiple of 1000 (< 2^53 after division), so
    // the double arithmetic is exact
    val micros = ((tsNanos - pmod(tsNanos, lit(1000L))) / 1000L).cast("long")
    timestamp_micros(micros)
  }

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
