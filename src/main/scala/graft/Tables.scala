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

  // Base-relation memo, keyed on the session OBJECT plus (dir, name).
  // `spark.read.parquet` re-resolves the relation on every call —
  // file listing + footer schema read + DataSource construction,
  // ~10-50 ms of driver time — and the r18 overhead probe measured
  // that per-call resolution as the single largest slice (~120 ms
  // build) of the ~0.3-0.6 s fixed cost dominating the ~390
  // sub-second queries. A production deployment resolves tables
  // through a catalog (metastore-cached metadata); this map is that
  // catalog shape for the path layout. METADATA only — no rows, no
  // results: every execution still scans the parquet, and pushdown /
  // pruning act per query plan exactly as before. SessionMemo clears
  // it with the derived-frame memos, so every timed bench round
  // re-pays one real resolution per table (first caller carries it).
  private val relCache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]

  private[graft] def clearSessionMemo(): Unit = relCache.clear()

  /** Read `<dir>/<name>.parquet` (relation memoized per session). */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    relCache.computeIfAbsent((spark, dir, name),
      k => k._1.read.parquet(s"${k._2}/${k._3}.parquet"))

  /** Nanoseconds per day, as the string every floored-day expression
    * interpolates. */
  val DayNs = "86400000000000"

  /** CANONICAL negative-safe floored epoch-day of a bigint-nanos `ts`
    * column — the cross-engine day spelling whose DuckDB mirror is
    * `epoch_ns(ts) // 86400000000000` (floor division). This exact
    * arithmetic is a hash contract (see the sign-contract note below);
    * new queries must use this helper rather than re-spelling it —
    * r15's code review found the expression hand-copied in three new
    * places. Pre-r15 copies inside certified queries are left verbatim
    * (same characters; migrating them buys nothing and risks plan
    * churn).
    */
  def flooredDay(ts: String = "ts"): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.expr(
      s"$ts div $DayNs - (CASE WHEN $ts % $DayNs < 0 THEN 1 ELSE 0 END)")

  /** The whole engine's `ts` contract is BIGINT EPOCH NANOSECONDS —
    * established when the driver testdata carried parquet
    * TIMESTAMP(NANOS) (readable in Spark 4.x only as a nanos long via
    * `spark.sql.legacy.parquet.nanosAsLong=true`). The round-8 testdata
    * regeneration changed the physical type to TIMESTAMP(MICROS), which
    * surfaces as a real timestamp instead; this reader dispatches on
    * the arriving type and restores the nanos-long contract, so every
    * downstream window/dedup/bucketing expression (and its paired
    * DuckDB oracle, which always goes through
    * `epoch_us(CAST(ts AS TIMESTAMP))`) is unchanged. `unix_micros` is
    * exact integer math; ×1000 cannot overflow until year ~2262.
    */
  /** Events with `ts` normalized to epoch-nanosecond Long.
    *
    * Sign contract: `ts` MAY be negative (pre-1970) in principle; any
    * query that floors `ts` into a coarser grain must spell the
    * negative-remainder correction (`x div u - (x % u < 0 ? 1 : 0)`)
    * so Spark's truncating `div` matches DuckDB's flooring `//` for
    * ALL inputs — the q375/q395/q398/q403/q404/q405 discipline.
    * Pre-round-12 spellings (e.g. q350's µs cast) predate this rule
    * and are safe only under the fixtures' post-1970 timestamps; new
    * queries must use the floored spelling.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(spark, dir, "events")
    raw.schema("ts").dataType match {
      case LongType => raw // legacy TIMESTAMP(NANOS) via nanosAsLong
      case TimestampType =>
        raw.withColumn("ts", unix_micros(col("ts")) * lit(1000L))
      case TimestampNTZType =>
        // Session timezone is pinned UTC (Engine), so NTZ→LTZ is identity.
        raw.withColumn("ts", unix_micros(col("ts").cast(TimestampType)) * lit(1000L))
      case other =>
        throw new IllegalStateException(s"unexpected events.ts type: $other")
    }
  }

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
