package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Sketches

/** Round-14 batch: the PERSISTED register-store lifecycle (r13 verdict
  * item 3). q406/q407 certified the portable-HLL register algebra but
  * rebuilt the per-(type, day) files inside each query; production
  * writes that store ONCE (partitioned by day) and answers every
  * distinct-actives question from it. This round registers the two
  * lifecycle legs against the oracle:
  *
  *   - q411 — read the persisted store with STATIC day-partition
  *     pruning (last 10 days) and answer per-type DAU + pairwise
  *     audience overlap (inclusion–exclusion) without touching events.
  *   - q412 — compact aged days (everything OLDER than the q411
  *     window) to weekly registers by MAX-merge — the q97-certified
  *     merge — land the weekly store (partitioned by week), and answer
  *     weekly actives from the read-back.
  *
  * Exactness: the store holds exact integers (reg, rho); estimates are
  * the q25/q97 mirrored chain; the oracle rebuilds the same registers
  * from raw events (md5 chain is deterministic), with the weekly files
  * built from RAW user rows where Spark MAX-merges persisted daily
  * files — register construction commutes with union (Round13Spec's
  * proved property), so the two orders agree cell for cell.
  *
  * Scale: the store is ≤ 256·|types| rows per day — census-sized at
  * ANY corpus size; q411's scan reads only the 10 pruned day
  * partitions (Round14Spec pins `PartitionFilters` and the literal
  * bound in the physical plan), q412's only the aged ones. Nothing in
  * either query is event-sized; the one event scan is the store WRITE,
  * paid once per store lifetime (memoized once per session here).
  */
object Round14 {

  /** Store root for a fixture dir — stable within a JVM (the memoized
    * writes land once), PID-disjoint across JVMs ([[graft.StorePaths]]).
    */
  private[graft] def storeRoot(s: SparkSession, dir: String): String =
    graft.StorePaths.sessionRoot(s, "regstore", dir)

  private val dayNs = "86400000000000"

  /** The (type, day, user) distinct census — q407's collapse, same
    * negative-safe floored day spelling.
    */
  private[graft] def udt(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type").as("t"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"),
        col("user_id"))
      .distinct()

  /** Ensure the per-(type, day) DAILY register store exists for `dir`
    * (one event scan, overwrite-once per session; parquet partitioned
    * by `d` so day filters prune at the file listing) and return the
    * store's max day. The 1-row `head()` action reads the
    * census-sized store — the kCore `head(1)` / pageRank `count()`
    * precedent — and is what makes the q411/q412 day bounds LITERALS,
    * i.e. statically prunable partition filters rather than a runtime
    * join.
    */
  private[graft] def ensureDailyStore(s: SparkSession, dir: String): Long =
    // kind "regstore.daily": the daily and weekly tiers share one
    // family root ([[storeRoot]]) but memoize independently.
    graft.StoreLifecycle.ensure(s, "regstore.daily", dir) { _ =>
      val regs = Sketches.hllPortableRegisters(udt(s, dir), Seq("t", "d"),
        col("user_id"))
      regs.write.mode("overwrite").partitionBy("d")
        .parquet(storeRoot(s, dir) + "/daily")
      dailyRead(s, dir).agg(max(col("d")).as("m")).head().getLong(0)
    }

  /** The persisted daily store, read back. Partition-column type
    * inference yields int for `d`; cast restores the written long.
    */
  private[graft] def dailyRead(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(storeRoot(s, dir) + "/daily")
      .select(col("t"), col("d").cast("long").as("d"), col("reg"), col("rho"))

  /** Compact the AGED daily files (days strictly older than the q411
    * window) to weekly registers by MAX-merge and land them partitioned
    * by week. Days are positive (epoch days), so `div 7` here and
    * DuckDB's `// 7` floor identically.
    */
  private[graft] def ensureWeeklyStore(s: SparkSession, dir: String, maxD: Long): Unit =
    graft.StoreLifecycle.ensure(s, "regstore.weekly", dir) { _ =>
      dailyRead(s, dir)
        .filter(col("d") < lit(maxD - 9L))
        .select(col("t"), expr("d div 7").as("wk"), col("reg"), col("rho"))
        .groupBy(col("t"), col("wk"), col("reg"))
        .agg(max(col("rho")).as("rho"))
        .write.mode("overwrite").partitionBy("wk")
        .parquet(storeRoot(s, dir) + "/weekly")
    }

  /** q411 — DAU + audience overlap FROM the persisted store, last 10
    * days: per (day, type pair), both types' DAU estimates, the
    * MAX-merged union estimate, and the inclusion–exclusion
    * intersection — q407's sketch path with the registers READ, not
    * rebuilt, and the day filter landing as a static partition prune
    * (the production lifecycle: one store, many questions, no event
    * scan). Sketch-only by design — the error side lives in q407,
    * which certified these identical registers against exact counts.
    */
  def q411(s: SparkSession, dir: String): DataFrame = {
    val maxD = ensureDailyStore(s, dir)
    val regs = dailyRead(s, dir).filter(col("d") >= lit(maxD - 9L))
    val active = regs.select(col("t"), col("d")).distinct()
      .localCheckpoint(true) // tiny; branched into both grid sides
    val grid = active.select(col("d"), col("t").as("ta"))
      .join(active.select(col("d"), col("t").as("tb")), "d")
      .filter(col("ta") < col("tb"))
    val uni = grid.join(regs.withColumnRenamed("t", "ta"), Seq("d", "ta"))
      .select(col("d"), col("ta"), col("tb"), col("reg"), col("rho"))
      .unionAll(grid.join(regs.withColumnRenamed("t", "tb"), Seq("d", "tb"))
        .select(col("d"), col("ta"), col("tb"), col("reg"), col("rho")))
      .groupBy(col("d"), col("ta"), col("tb"), col("reg"))
      .agg(max(col("rho")).as("rho"))
    val estT = Sketches.hllPortableEstimate(regs, Seq("t", "d"))
      .select(col("t"), col("d"), col("est_e2"))
      .localCheckpoint(true) // tiny; joined twice (ta and tb sides)
    val estU = Sketches.hllPortableEstimate(uni, Seq("d", "ta", "tb"))
      .select(col("d"), col("ta"), col("tb"), col("est_e2").as("union_est_e2"))
    grid
      .join(estT.select(col("t").as("ta"), col("d"), col("est_e2").as("a_est_e2")),
        Seq("d", "ta"))
      .join(estT.select(col("t").as("tb"), col("d"), col("est_e2").as("b_est_e2")),
        Seq("d", "tb"))
      .join(estU, Seq("d", "ta", "tb"))
      .select(col("d").as("day"), col("ta").as("type_a"), col("tb").as("type_b"),
        col("a_est_e2"), col("b_est_e2"), col("union_est_e2"),
        (col("a_est_e2") + col("b_est_e2") - col("union_est_e2"))
          .as("inter_est_e2"))
      .orderBy("day", "type_a", "type_b")
  }

  /** q412 — weekly actives from the COMPACTED store: aged daily files
    * MAX-merged to (type, week) registers, landed partitioned by week,
    * read back, estimated. The retention path: a year-old day costs
    * 1/7th its register rows after compaction and still answers
    * "weekly actives" exactly as if built from raw events (merge
    * commutes with union — the oracle builds these registers from raw
    * user rows and must agree cell for cell).
    */
  def q412(s: SparkSession, dir: String): DataFrame = {
    val maxD = ensureDailyStore(s, dir)
    ensureWeeklyStore(s, dir, maxD)
    val weekly = s.read.parquet(storeRoot(s, dir) + "/weekly")
      .select(col("t"), col("wk").cast("long").as("wk"), col("reg"), col("rho"))
    Sketches.hllPortableEstimate(weekly, Seq("t", "wk"))
      .orderBy("t", "wk")
  }

  /** q413 — whole-span actives per type from the TWO-TIER store:
    * compacted weekly registers for the aged days (q412's files) MERGED
    * with the recent daily files (q411's window) answer one span
    * question — lifetime distinct actives per type — without events
    * and without caring which granularity each register came from.
    * This is the compositionality contract that makes compaction SAFE:
    * MAX-merge is associative, so (daily→weekly)→span ≡ daily→span ≡
    * raw→span, and the oracle takes the third route (registers built
    * directly from all raw user rows) to certify the first.
    */
  def q413(s: SparkSession, dir: String): DataFrame = {
    val maxD = ensureDailyStore(s, dir)
    ensureWeeklyStore(s, dir, maxD)
    val recent = dailyRead(s, dir)
      .filter(col("d") >= lit(maxD - 9L))
      .select(col("t"), col("reg"), col("rho"))
    val aged = s.read.parquet(storeRoot(s, dir) + "/weekly")
      .select(col("t"), col("reg"), col("rho"))
    val merged = recent.unionAll(aged)
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho"))
    Sketches.hllPortableEstimate(merged, Seq("t"))
      .orderBy("t")
  }

  /** Land the documents table as JSONL once per session (the export
    * format every labeling/annotation toolchain speaks). */
  private def ensureJsonl(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "jsonl", dir) { path =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"), col("text"))
        .write.mode("overwrite").json(path)
      path
    }

  /** q416 — JSONL sink/source round-trip certification: the documents
    * table is written as JSON Lines (escapes, unicode, embedded
    * newlines all on the sink's shoulders), read back with an EXPLICIT
    * schema (never inference — at 100 TB schema inference is a full
    * extra pass and a drift hazard), and aggregated with a
    * CONTENT-SENSITIVE statistic — per (lang, source): doc count,
    * char mass, and the summed 32-bit md5 prefix of every text. The
    * oracle computes the same aggregate from the PARQUET table, so a
    * hash match proves the JSON round-trip preserved every text
    * byte-exactly (any mangled escape or lost codepoint moves an md5).
    * The md5-prefix sum is the collation-free choice: a min/max(text)
    * would hang cross-engine string ordering on ICU-vs-binary
    * collation; integer sums cannot.
    */
  def q416(s: SparkSession, dir: String): DataFrame = {
    val back = s.read
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .json(ensureJsonl(s, dir))
    back.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("md5_sum"))
      .orderBy("lang", "source")
  }

  /** The hazard-injected text column, spelled identically in the
    * oracle: a leading double-quote plus every space turned into a
    * NEWLINE. Fixture-probed necessity: the synthetic corpus contains
    * zero embedded newlines/quotes/commas, so a plain export would
    * certify the multiLine/escape machinery VACUOUSLY — this
    * transformation makes every single row a quoted multi-line field
    * with an escaped quote.
    */
  private def hazardText: org.apache.spark.sql.Column =
    concat(lit("\""), translate(col("text"), " ", "\n"))

  /** Land the documents table as quoted CSV once per session, text
    * hazard-injected — the writer must quote every field and double
    * the embedded quote; the read side becomes a true multiLine parse.
    */
  private[graft] def ensureCsv(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "csv", dir) { path =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"),
          hazardText.as("text"))
        .write.mode("overwrite")
        .option("header", "true").option("escape", "\"")
        .csv(path)
      path
    }

  /** q417 — CSV sink/source round-trip, the multiLine leg: q416's
    * certification applied to the format where the hazard is worst —
    * quoted fields with embedded record separators require
    * `multiLine=true` (a naive line-split reader shreds them), and
    * `escape="\""` pins RFC-4180 doubled-quote escaping on both write
    * and read (Spark's default backslash escape is the
    * interoperability trap). Every exported row carries an injected
    * leading quote and space→newline hazards ([[hazardText]], mirrored
    * in the oracle — the corpus itself is hazard-free, fixture-probed,
    * so the injection is what makes this certification BIND). Same
    * content-sensitive aggregate and parquet-side oracle shape as
    * q416: the hash match proves the CSV writer and the multiLine
    * parser are exact inverses on hazard-laden content.
    */
  def q417(s: SparkSession, dir: String): DataFrame = {
    val back = s.read
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .option("header", "true").option("multiLine", "true")
      .option("escape", "\"")
      .csv(ensureCsv(s, dir))
    back.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("md5_sum"))
      .orderBy("lang", "source")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q411_store_dau_overlap" -> (q411 _),
    "q412_store_weekly_compact" -> (q412 _),
    "q413_store_span_actives" -> (q413 _),
    "q416_jsonl_roundtrip" -> (q416 _),
    "q417_csv_roundtrip" -> (q417 _),
  )

  private def hllEstOver(fromSql: String, groupCols: Seq[String],
      estAlias: String): String = {
    val frag = Sketches.hllPortableOracleSql(fromSql, groupCols)
    s"(SELECT ${groupCols.mkString(", ")}, est_e2 AS $estAlias FROM ($frag))"
  }

  /** Shared oracle prefix: the distinct (type, day, user) census and
    * the store's max day (the same literal Spark pins via its 1-row
    * store read — here a scalar subquery over the identical census).
    */
  private val udtCte =
    """udt AS (SELECT DISTINCT event_type AS t,
      |                epoch_ns(ts) // 86400000000000 AS d,
      |                user_id
      |         FROM events),
      |mx AS (SELECT MAX(d) AS maxd FROM udt)""".stripMargin

  val oracleSql: Map[String, String] = Map(
    // The oracle reads the PARQUET table — a hash match against the
    // Spark side's JSONL read-back certifies the JSON round-trip
    // byte-exactly (same md5 chain as the HLL family).
    "q416_jsonl_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(CAST(('0x' || substr(md5(text), 1, 8)) AS BIGINT))
        |            AS BIGINT) AS md5_sum
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // Same parquet-side aggregate over the IDENTICALLY hazard-injected
    // text ('"' prefix + spaces→newlines): the Spark side reads its
    // landed CSV back through the multiLine parser; a hash match
    // proves writer and parser are exact inverses on that content.
    "q417_csv_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(CAST(('0x' || substr(md5(
        |              '"' || replace(text, ' ', chr(10))), 1, 8)) AS BIGINT))
        |            AS BIGINT) AS md5_sum
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // Same floored days, same last-10-days bound (scalar-subquery max
    // where Spark reads the store's max partition), same md5 register
    // files — built from raw user rows here where Spark READS the
    // persisted daily files (identical by construction) — same
    // MAX-merged pair union (from fanned raw rows here; merge commutes
    // with union), same estimator chain, integer inclusion–exclusion.
    "q411_store_dau_overlap" -> {
      val perType = "SELECT t, d, md5(CAST(user_id AS VARCHAR)) AS hx FROM udr"
      val pairUnion =
        """SELECT g.d, g.ta, g.tb, md5(CAST(u.user_id AS VARCHAR)) AS hx
          |   FROM grid g JOIN udr u ON u.d = g.d
          |     AND (u.t = g.ta OR u.t = g.tb)""".stripMargin
      s"""WITH $udtCte,
         |udr AS (SELECT t, d, user_id FROM udt
         |        WHERE d >= (SELECT maxd - 9 FROM mx)),
         |active AS (SELECT DISTINCT t, d FROM udr),
         |grid AS (
         |  SELECT a.d, a.t AS ta, b.t AS tb
         |  FROM active a JOIN active b ON a.d = b.d AND a.t < b.t)
         |SELECT g.d AS day, g.ta AS type_a, g.tb AS type_b,
         |  ea.a_est_e2, eb.b_est_e2, eu.union_est_e2,
         |  ea.a_est_e2 + eb.b_est_e2 - eu.union_est_e2 AS inter_est_e2
         |FROM grid g
         |JOIN ${hllEstOver(perType, Seq("t", "d"), "a_est_e2")} ea
         |  ON ea.t = g.ta AND ea.d = g.d
         |JOIN ${hllEstOver(perType, Seq("t", "d"), "b_est_e2")} eb
         |  ON eb.t = g.tb AND eb.d = g.d
         |JOIN ${hllEstOver(pairUnion, Seq("d", "ta", "tb"), "union_est_e2")} eu
         |  ON eu.d = g.d AND eu.ta = g.ta AND eu.tb = g.tb
         |ORDER BY day, type_a, type_b""".stripMargin
    },
    // Whole-span per-type registers built directly from raw user rows —
    // the third construction order; Spark MAX-merges weekly-compacted
    // aged files with recent daily files (merge associativity).
    "q413_store_span_actives" -> {
      val fromSql =
        "SELECT t, md5(CAST(user_id AS VARCHAR)) AS hx FROM udt"
      s"""WITH $udtCte
         |SELECT t, n_registers_used, n_zero_registers, est_e2
         |FROM (${Sketches.hllPortableOracleSql(fromSql, Seq("t"))})
         |ORDER BY t""".stripMargin
    },
    // Same aged-day bound, same positive-day floor week (Spark `div 7`
    // ≡ DuckDB `// 7` on positive days), registers built from raw
    // user rows where Spark MAX-merges the persisted daily files.
    "q412_store_weekly_compact" -> {
      val fromSql =
        "SELECT t, wk, md5(CAST(user_id AS VARCHAR)) AS hx FROM aged"
      s"""WITH $udtCte,
         |aged AS (SELECT t, CAST(d // 7 AS BIGINT) AS wk, user_id FROM udt
         |         WHERE d < (SELECT maxd - 9 FROM mx))
         |SELECT t, wk, n_registers_used, n_zero_registers, est_e2
         |FROM (${Sketches.hllPortableOracleSql(fromSql, Seq("t", "wk"))})
         |ORDER BY t, wk""".stripMargin
    },
  )
}
