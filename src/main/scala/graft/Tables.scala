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
    * EXACT integer division via decimal: Column `/` is double division,
    * and epoch nanos ~1.7e18 exceed 2^53 — converting to double first
    * loses up to 128 ns BEFORE any divide, so even a pre-rounded
    * multiple of 1000 lands a microsecond off for ~1.6% of values.
    * decimal(20,0) holds any long exactly; decimal division is exact;
    * the long cast truncates the fraction (values are positive).
    */
  def eventTs(tsNanos: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val micros = (tsNanos.cast("decimal(20,0)") / lit(1000)).cast("long")
    timestamp_micros(micros)
  }

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")
}
