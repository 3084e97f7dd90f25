package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.{Ranking, Similarity}
import graft.ops.GlobalStats

/** Round-17 batch: the text-ranking family's store CONSUMER (q429 —
  * BM25 answered from the q427 register store, closing the
  * producer-without-consumer gap) and register-store COMPACTION
  * (q430 — a multi-generation DF store collapsed under
  * [[graft.ops.RegisterStore.compact]]'s crash discipline and read
  * back through the boundary).
  */
object Round17 {

  private val Bm25Terms = Seq("spark", "join", "window")

  /** q429 — BM25 ranking with every INDEX STATISTIC read from the
    * persisted register store: q126's exact query ({spark, join,
    * window}, standard k1/b), but N, avgdl, and the per-term document
    * frequencies come from [[Round16.ensureDfStore]]'s two-generation
    * registers (DF rows SUM-merged across generations; N = Σ n_docs;
    * avgdl = Σ dl_sum / Σ n_docs — one double division of exact
    * integers, bit-identical to a from-raw avg). The ONLY corpus read
    * is the per-document tf/dl projection — one map-side scan, no
    * aggregation over documents anywhere in the plan (Round17Spec pins
    * a single documents scan and zero corpus-side aggs).
    *
    * This is the store-consumer leg the q427 producer was missing: the
    * q414/q421 pattern (persisted state + a warm consumer) completed
    * for text ranking. At 100 TB the ranker scores a candidate batch
    * by scanning ONLY that batch; the index statistics arrive as a
    * vocab-sized register read maintained by appending each ingest
    * batch's registers (q427's certified SUM-merge) — the corpus is
    * never rescanned for statistics.
    *
    * Exactness: the oracle is q126's from-raw SQL verbatim — the hash
    * match proves store-fed ≡ from-raw END TO END (register landing,
    * SUM-merge, and the avgdl reconstruction all collapse to the same
    * IEEE inputs; the score expression is literally shared code,
    * [[Ranking.bm25Score]]).
    */
  def q429(s: SparkSession, dir: String): DataFrame = {
    val root = Round16.ensureDfStore(s, dir)
    // Per-term merged DF as one vocab-sized agg → ONE row (n registers
    // summed per query term; absent terms correctly read 0).
    val dfAggs = Bm25Terms.zipWithIndex.map { case (t, i) =>
      sum(when(col("term") === t, col("df")).otherwise(0L))
        .cast("double").as(s"df_$i")
    }
    val dfRow = s.read.parquet(s"$root/df").agg(dfAggs.head, dfAggs.tail: _*)
    val corpusRow = s.read.parquet(s"$root/corpus").agg(
      sum(col("n_docs")).cast("double").as("n"),
      (sum(col("dl_sum")).cast("double") / sum(col("n_docs")).cast("double"))
        .as("avgdl"))
    val stats = corpusRow.withGlobalStats(dfRow)
    Ranking.bm25Score(
      Ranking.bm25Base(
        Tables.table(s, dir, "documents"), col("doc_id"), col("text"),
        Bm25Terms),
      stats, Bm25Terms, k1 = 1.2, b = 0.75)
      .select(col("doc_id"), col("dl"),
        Similarity.intScaled(col("score"), 10000L).as("bm25_e4"))
      .orderBy("doc_id")
  }

  /** Four DF-register generations (doc_id % 4 — each non-empty at
    * every SF, fixture-probed) landed gen-partitioned, then
    * generations 0-2 COMPACTED into the single partition `gen=2` by
    * [[graft.ops.RegisterStore.compact]] (SUM algebra, stage-and-swap
    * + rename-aside + marker idempotence under the FsLock). The layout
    * q430 reads is {gen=2 (one file), gen=3 (the live tail)} — the
    * retention posture that keeps a year of daily register appends
    * from becoming 365 directories per store.
    */
  private[graft] def ensureDfStore4(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "dfstore4", dir) { root =>
      val terms = Tables.table(s, dir, "documents")
        .select(col("doc_id"),
          explode(array_distinct(split(col("text"), " "))).as("term"))
      def gen(g: Int): DataFrame = terms
        .filter(col("doc_id") % 4 === g)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g.toLong))
      (0 to 3).foreach { g =>
        gen(g).write.mode(if (g == 0) "overwrite" else "append")
          .partitionBy("gen").parquet(root)
      }
      graft.ops.RegisterStore.compact(s, root, "gen", upTo = 2L,
        m => m.groupBy(col("term")).agg(sum(col("df")).as("df")))
      root
    }

  /** q430 — document-frequency registers read THROUGH a compaction
    * boundary: per term, the compacted-head DF (generations 0-2,
    * now one merged partition), the live-tail DF (generation 3), and
    * the total, for the top-25 terms by (total DF desc, term). The
    * oracle rebuilds both sides from raw documents — a hash match
    * certifies compact ∘ append ≡ direct for the SUM algebra: no
    * register lost, duplicated (the non-idempotent-merge trap the
    * marker closes), or mis-binned by the swap. Round17Spec drives the
    * crash matrix (kill before / between / after the renames) to the
    * same certified store.
    *
    * Scale: everything after the landing is vocab-sized; compaction
    * reads and rewrites only register files (bytes per term), never
    * documents. File-count growth before/after is priced in SCALE.md.
    */
  def q430(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(ensureDfStore4(s, dir))
      .select(col("term"), col("df"), col("gen").cast("long").as("gen"))
      .groupBy(col("term"))
      .agg(
        sum(when(col("gen") <= 2L, col("df"))).as("h"),
        sum(when(col("gen") === 3L, col("df"))).as("t"))
      .select(col("term"),
        coalesce(col("h"), lit(0L)).as("df_head"),
        coalesce(col("t"), lit(0L)).as("df_tail"),
        (coalesce(col("h"), lit(0L)) + coalesce(col("t"), lit(0L))).as("df"))
      .orderBy(col("df").desc, col("term"))
      .limit(25)

  /** Four HLL-register generations over distinct (event_type, user)
    * actives — gen = user_id % 4, every generation non-empty at every
    * SF and each head generation contributing registers no sibling
    * holds (fixture-probed: losing a directory breaks the hash) —
    * compacted 0-2 under the MAX algebra by
    * [[graft.ops.RegisterStore.compact]].
    */
  private[graft] def ensureHllStore4(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "hllstore4", dir) { root =>
      val tu = Tables.events(s, dir)
        .select(col("event_type").as("t"), col("user_id"))
      (0 to 3).foreach { g =>
        graft.ops.Sketches.hllPortableRegisters(
          tu.filter(col("user_id") % 4 === g), Seq("t"), col("user_id"))
          .withColumn("gen", lit(g.toLong))
          .write.mode(if (g == 0) "overwrite" else "append")
          .partitionBy("gen").parquet(root)
      }
      graft.ops.RegisterStore.compact(s, root, "gen", upTo = 2L,
        m => m.groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho")))
      root
    }

  /** q432 — per-type distinct actives FROM the MAX-compacted register
    * store: q430's compaction boundary exercised under the SECOND merge
    * algebra (MAX — HLL rhos; q430 certified SUM). The read MAX-merges
    * the compacted head partition with the live gen-3 tail and
    * estimates per type; the oracle rebuilds registers from ALL raw
    * user rows directly — a hash match certifies (4-way split → MAX
    * per generation → compact 0-2 → MAX with tail) ≡ direct, i.e.
    * compaction commutes with the HLL algebra end to end (the q413
    * associativity contract, now THROUGH `RegisterStore.compact`'s
    * stage-and-swap). MAX is idempotent, so the `_COMPACTED` marker is
    * belt-and-braces here — but the families share one code path, and
    * the crash discipline must hold for the worst algebra it carries.
    *
    * Scale: registers are ≤ types × 256 rows per generation at ANY
    * corpus size; compaction reads and rewrites only those. One events
    * scan per generation landing, zero after.
    */
  def q432(s: SparkSession, dir: String): DataFrame = {
    val regs = s.read.parquet(ensureHllStore4(s, dir))
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho"))
    graft.ops.Sketches.hllPortableEstimate(regs, Seq("t")).orderBy("t")
  }

  /** The STREAM-INGESTED register store behind q435: a 4-file copy of
    * the (event_type, user_id) projection is landed once as the stream
    * source, then Structured Streaming consumes it one file per
    * micro-batch through [[graft.streaming.EventStream.hllRegisterSink]]
    * (foreachBatch + `batch_id=<n>` idempotent overwrite — the
    * at-least-once replay discipline StreamingSpec crash-proves), and
    * the aged batches 0-2 compact under MAX. File→batch assignment is
    * ordering-dependent; every certified read MAX-merges ALL landed
    * registers, so the store's answers are split-independent by
    * construction.
    */
  private[graft] def ensureStreamHllStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "streamhll", dir) { root =>
      val src = s"$root/src"
      val proj = Tables.events(s, dir)
        .select(col("event_type").as("t"), col("user_id"))
      (0 to 3).foreach { g =>
        proj.filter(col("user_id") % 4 === g).coalesce(1)
          .write.mode(if (g == 0) "overwrite" else "append").parquet(src)
      }
      val regs = s"$root/regs"
      landStreamHllRegisters(s, src, regs, s"$root/ckpt")
      graft.ops.RegisterStore.compact(s, regs, "batch_id", upTo = 2L,
        m => m.groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho")))
      regs
    }

  /** One-file-per-micro-batch streaming run of the HLL register sink
    * over a parquet source directory (factored out so the spec can
    * drive the landing on its own roots).
    */
  private[graft] def landStreamHllRegisters(
      s: SparkSession, src: String, regs: String, ckpt: String): Unit = {
    val stream = s.readStream
      .schema(s.read.parquet(src).schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(src)
    val q = graft.streaming.EventStream
      .hllRegisterSink(stream, Seq("t"), col("user_id"), regs)
      .option("checkpointLocation", ckpt)
      .start()
    try q.processAllAvailable() finally q.stop()
  }

  /** q435 — per-type distinct actives from a STREAM-MAINTAINED register
    * store read through a compaction boundary: the streaming leg of the
    * register-store flow taken into the gate. q432 certifies the batch
    * landing → MAX-compaction chain; this certifies the same final
    * state arrived at through Structured Streaming — file-source
    * micro-batches, the foreachBatch idempotent `batch_id` sink (the
    * at-least-once replay contract), a checkpointed query, then
    * `RegisterStore.compact` over the aged batches. The oracle rebuilds
    * registers from ALL raw user rows — a hash match certifies
    * stream-ingest ∘ at-least-once landing ∘ compact ∘ MAX-merge ≡
    * direct, end to end and cross-engine.
    *
    * Scale: each micro-batch lands ≤ types × 256 register rows; the
    * estimate and the compactor never touch raw events again. At
    * 100 TB this is the production rolling-actives pipeline: the
    * stream appends register files forever, compaction caps the file
    * count, and the read is census-sized regardless of event volume.
    */
  def q435(s: SparkSession, dir: String): DataFrame = {
    val regs = s.read.parquet(ensureStreamHllStore(s, dir))
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho"))
    graft.ops.Sketches.hllPortableEstimate(regs, Seq("t")).orderBy("t")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q429_bm25_from_store" -> (q429 _),
    "q430_df_store_compact" -> (q430 _),
    "q432_hll_store_compact" -> (q432 _),
    "q435_stream_hll_store" -> (q435 _),
  )

  val oracleSql: Map[String, String] = Map(
    // q126's from-raw oracle VERBATIM — the store path must reproduce
    // the raw-corpus BM25 bit for bit.
    "q429_bm25_from_store" ->
      """WITH base AS (
        |  SELECT doc_id,
        |    CAST(len(string_split(text,' ')) AS DOUBLE) AS dl,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'spark')) AS DOUBLE) AS tf_0,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'join')) AS DOUBLE) AS tf_1,
        |    CAST(len(list_filter(string_split(text,' '), w -> w = 'window')) AS DOUBLE) AS tf_2
        |  FROM documents),
        |stats AS (
        |  SELECT CAST(COUNT(*) AS DOUBLE) AS n, AVG(dl) AS avgdl,
        |    SUM(CASE WHEN tf_0 > 0 THEN 1.0 ELSE 0.0 END) AS df_0,
        |    SUM(CASE WHEN tf_1 > 0 THEN 1.0 ELSE 0.0 END) AS df_1,
        |    SUM(CASE WHEN tf_2 > 0 THEN 1.0 ELSE 0.0 END) AS df_2
        |  FROM base)
        |SELECT doc_id, CAST(dl AS BIGINT) AS dl,
        |  CAST(ROUND((
        |      ln(1.0 + (n - df_0 + 0.5) / (df_0 + 0.5)) * tf_0 * 2.2 / (tf_0 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n - df_1 + 0.5) / (df_1 + 0.5)) * tf_1 * 2.2 / (tf_1 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |    + ln(1.0 + (n - df_2 + 0.5) / (df_2 + 0.5)) * tf_2 * 2.2 / (tf_2 + 1.2 * (0.25 + 0.75 * dl / avgdl))
        |  ) * 10000) AS BIGINT) AS bm25_e4
        |FROM base CROSS JOIN stats ORDER BY doc_id""".stripMargin,
    // Both sides of the compaction boundary rebuilt from raw
    // documents; same (df DESC, term) total order and top-25 cut.
    "q430_df_store_compact" ->
      """WITH t AS (
        |  SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS term
        |  FROM documents),
        |g AS (
        |  SELECT term,
        |         SUM(CASE WHEN doc_id % 4 <= 2 THEN 1 ELSE 0 END) AS df_head,
        |         SUM(CASE WHEN doc_id % 4 = 3 THEN 1 ELSE 0 END) AS df_tail
        |  FROM t GROUP BY term)
        |SELECT term, CAST(df_head AS BIGINT) AS df_head,
        |       CAST(df_tail AS BIGINT) AS df_tail,
        |       CAST(df_head + df_tail AS BIGINT) AS df
        |FROM g ORDER BY df DESC, term LIMIT 25""".stripMargin,
    // Registers rebuilt from ALL raw user rows directly (the q413
    // "third construction order"): the Spark side's split → compact →
    // merge chain must land the identical register set.
    "q432_hll_store_compact" -> {
      val fromSql = "SELECT t, md5(CAST(user_id AS VARCHAR)) AS hx " +
        "FROM (SELECT DISTINCT event_type AS t, user_id FROM events)"
      s"""SELECT t, n_registers_used, n_zero_registers, est_e2
         |FROM (${graft.ops.Sketches.hllPortableOracleSql(fromSql, Seq("t"))})
         |ORDER BY t""".stripMargin
    },
    // Same third-construction-order oracle as q432 — the streamed
    // landing must arrive at the identical register state as a direct
    // build over all raw user rows (MAX-merge is split-independent, so
    // micro-batch boundaries cannot show through).
    "q435_stream_hll_store" -> {
      val fromSql = "SELECT t, md5(CAST(user_id AS VARCHAR)) AS hx " +
        "FROM (SELECT DISTINCT event_type AS t, user_id FROM events)"
      s"""SELECT t, n_registers_used, n_zero_registers, est_e2
         |FROM (${graft.ops.Sketches.hllPortableOracleSql(fromSql, Seq("t"))})
         |ORDER BY t""".stripMargin
    },
  )
}
