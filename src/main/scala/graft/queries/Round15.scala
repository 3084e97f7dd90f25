package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.ext.Dedup
import graft.streaming.EventStream

/** Round-15 batch: the store lifecycles this round built or extended,
  * registered INSIDE the correctness gate (the q411-q415 discipline —
  * a store mechanism isn't done until an oracle-checked query reads
  * through it), plus the third interchange-format certification.
  *
  *   - q418 — the signature store's COMPACTION leg: six landed
  *     signature batches, the aged five merged by
  *     [[EventStream.compactSignatureStore]], the read-back digested
  *     per doc. The oracle re-derives every md5-min signature from raw
  *     documents in DuckDB (q107's certified chain), so a hash match
  *     proves compaction preserved every signature row bit-exactly —
  *     no loss, no duplication, no re-keying.
  *   - q419 — a PERSISTED HISTOGRAM register store (the third sketch
  *     family to get the store lifecycle: HLL registers q411-q413,
  *     rank state q414, labels q415): monthly per-priority equi-width
  *     histograms landed partitioned by month, quantiles answered FROM
  *     the store over a literal month span (partition-pruned read),
  *     against an oracle that rebuilds the same histogram from raw
  *     orders — certifying the histogram's SUM-merge and the landing's
  *     completeness in one hash.
  *   - q420 — ORC sink/source round-trip (JSONL q416, CSV q417, now
  *     ORC), hazard-injected multi-byte so the UTF-8 encoding leg
  *     binds on the ASCII fixture corpus.
  *
  * (q421, the warm k-means centroid store, lives with the embedding
  * family in [[graft.ext.Similarity]].)
  */
object Round15 {

  // ---- q418: signature-store compaction round-trip -------------------------

  /** Land the q107 probe set's signatures as SIX batches (doc_id % 6 —
    * non-empty at every SF) via the streaming sink's idempotent
    * batch_id layout, then compact the aged five (batch 5 stays, the
    * replay-visibility rule). Memoized once per session; q418 reads
    * the post-compaction store.
    */
  private[graft] def ensureSigStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "sigstore", dir) { root =>
      val base = Tables.table(s, dir, "documents")
        .filter(col("doc_id") < 1000)
        .select(col("doc_id"), Dedup.shingles3(col("text")).as("sh"))
        .localCheckpoint(true) // one text scan feeds all six batches
      (0 to 5).foreach { i =>
        val sig = Dedup.minhashSignature(
          base.filter(col("doc_id") % 6 === i), col("doc_id"), col("sh"),
          numHashes = 12)
        EventStream.writeBatchIdempotent(sig, i.toLong, root)
      }
      EventStream.compactSignatureStore(s, root, upTo = 4L)
      root
    }

  /** q418 — compacted-signature-store read certification: per kept doc,
    * the md5 digest of its full 12-component signature, read FROM the
    * store after compaction merged batches 0-4 into one partition. The
    * oracle recomputes the signatures directly from `documents` (the
    * q107-certified md5-min chain) and digests them identically — so
    * the hash compare is sensitive to any row compaction lost,
    * duplicated (the digest rides a per-doc_id row; a dup changes the
    * row count), or altered. Round15Spec pins the physical side: the
    * store really holds only {batch_id=4, batch_id=5} when this query
    * answers.
    *
    * Scale: signatures are 12 md5 strings per doc — bytes; the store
    * scan is census-sized and the digest is one projection. The
    * compaction this certifies is what keeps the streaming store's
    * directory count bounded at 100 TB (SCALE.md r15).
    */
  def q418(s: SparkSession, dir: String): DataFrame = {
    val sig = s.read.parquet(ensureSigStore(s, dir))
    val sigKey = md5(concat_ws("|", (0 until 12).map(k => col(s"mh$k")): _*))
    sig.select(col("__id").as("doc_id"), sigKey.as("sig_key"))
      .orderBy("doc_id")
  }

  // ---- q419: persisted histogram register store ----------------------------

  /** Exact cents (the repo-canonical decimal spelling). */
  private def cents(dollars: org.apache.spark.sql.Column) =
    (dollars.cast("decimal(18,2)") * 100).cast("long")

  /** Land the monthly per-priority order-value histogram registers
    * ONCE per session: (priority, bucket = cents DIV 10^6 — $10,000
    * equi-width bins, all-integer so no float-boundary hazard, cnt),
    * parquet-partitioned by month id `m = year*100 + month` so month
    * spans prune at the file listing. One orders scan per store
    * lifetime; every row is census-sized (≤ priorities × ~60 buckets
    * per month).
    */
  private[graft] def ensureHistStore(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "histstore", dir) { root =>
      Tables.table(s, dir, "orders")
        .select(
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).as("m"),
          col("o_orderpriority").as("priority"),
          cents(col("o_totalprice")).as("c"))
        .select(col("m"), col("priority"), expr("c DIV 1000000").as("bucket"))
        .groupBy(col("m"), col("priority"), col("bucket"))
        .agg(count(lit(1)).as("cnt"))
        .write.mode("overwrite").partitionBy("m").parquet(root)
      root
    }

  /** q419 — histogram-register store: p50/p90/p99 order value per
    * priority over the LITERAL month span [199501, 199612], answered
    * entirely FROM the persisted store — the months outside the span
    * are pruned at the file listing (Round15Spec pins
    * `PartitionFilters` with the literal bounds), the 24 monthly
    * histograms MERGE by plain count addition (the property that makes
    * histograms the production quantile sketch), and the q242
    * interpolation rule extracts the quantiles on the merged
    * ~priority×60-bucket grid. The oracle rebuilds the same histogram
    * from RAW orders rows — a hash match certifies the store landed
    * complete, non-overlapping monthly registers AND that merge ∘ land
    * ≡ direct aggregation.
    *
    * Exactness: buckets and counts are integers end-to-end; the one
    * double is q242's single interpolation division, mirrored
    * clause-for-clause in the oracle and e0-gridded in cents (bucket
    * width 10^6 cents keeps the rounding-boundary margin ≥ the q134
    * audit bar).
    *
    * Scale: the store read is census-sized (24 months × 5 priorities ×
    * ≤60 buckets); nothing here rescans orders. A nightly pipeline
    * appends one new month partition and every historical quantile
    * question stays a store-only read — the q411 posture for the
    * quantile family.
    */
  def q419(s: SparkSession, dir: String): DataFrame = {
    val h = s.read.parquet(ensureHistStore(s, dir))
      .filter(col("m") >= 199501 && col("m") <= 199612)
      .groupBy(col("priority"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))
    val w = Window.partitionBy("priority").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val spans = h
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("prev", col("cum") - col("cnt"))
    val grp = spans.groupBy(col("priority")).agg(sum(col("cnt")).as("n"))
    val sp = spans.join(broadcast(grp), "priority")
    val ps = Seq(50, 90, 99).map { p =>
      sp.withColumn("t", expr(s"($p * n + 99) DIV 100"))
        .filter(col("cum") >= col("t") && col("prev") < col("t"))
        .select(col("priority"), lit(p.toLong).as("p"), col("n"),
          round(col("bucket") * 1000000 +
            (col("t") - col("prev")) * lit(1000000.0) / col("cnt"), 0)
            .cast("long").as("est_cents"))
    }
    ps.reduce(_ unionAll _).orderBy("priority", "p")
  }

  // ---- q423: persisted count-min register store -------------------------------

  private def cmsRoot(s: SparkSession, dir: String): String =
    graft.StorePaths.sessionRoot(s, "cmsstore", dir)

  /** The portable CMS cell hash (q114's spelling): row `i` sends a key
    * to column hex(md5(i‖':'‖key)[1..8]) mod w — exact integers,
    * identical in the oracle. w = 16 here, a FIXTURE-SCALE choice
    * (fixture-probed: at q114's w = 1024 the sf0.001/sf0.01 user
    * populations produce zero collisions, so the sketch leg of the
    * certification would be vacuous — est ≡ exact everywhere; at 16,
    * every SF overcounts somewhere and undercounts nowhere, so the
    * min-over-rows genuinely binds). Production sizes w = ⌈e/ε⌉ from
    * the tolerated overcount fraction, exactly as q114 documents.
    */
  private def cmsCell(i: org.apache.spark.sql.Column,
      key: org.apache.spark.sql.Column) =
    (conv(substring(md5(concat(i.cast("string"), lit(":"),
      key.cast("string"))), 1, 8), 16, 10).cast("long") % 16L).as("cell")

  /** Land per-DAY portable count-min cell files over user activity
    * (d = 4 rows × w = 16 columns, q114's md5 hashing keyed on
    * user_id, cell value = Σ event count) partitioned by day, and
    * return the store's max day (the q411 literal-bound pattern). One
    * events scan per store lifetime; each day's file is ≤ 4096 rows —
    * census-sized at ANY corpus size.
    */
  private[graft] def ensureCmsStore(s: SparkSession, dir: String): Long =
    graft.StoreLifecycle.ensure(s, "cmsstore", dir) { _ =>
      val uc = Tables.events(s, dir)
        .select(col("user_id"), Tables.flooredDay().as("d"))
        .groupBy(col("d"), col("user_id")).agg(count(lit(1)).as("cnt"))
      uc.select(col("d"), col("cnt"),
          explode(sequence(lit(0), lit(3))).as("i"),
          col("user_id"))
        .select(col("d"), col("i"), cmsCell(col("i"), col("user_id")), col("cnt"))
        .groupBy(col("d"), col("i"), col("cell")).agg(sum(col("cnt")).as("cv"))
        .write.mode("overwrite").partitionBy("d").parquet(cmsRoot(s, dir))
      // The probe set lands BESIDE the store (bounded: literal id
      // filter, pushed to the scan) so the steady-state q423 read is
      // store-only — the query must never rescan events (the scale
      // claim its docstring prices).
      Tables.events(s, dir)
        .select(col("user_id")).filter(col("user_id") < 20).distinct()
        .repartition(1)
        .write.mode("overwrite").parquet(cmsRoot(s, dir) + "_probe")
      // The partition column round-trips as INT (inferred from the
      // directory names) — cast before the 1-row literal extraction.
      s.read.parquet(cmsRoot(s, dir))
        .agg(max(col("d")).cast("long").as("m")).head().getLong(0)
    }

  /** q423 — heavy-hitter frequency estimates FROM the persisted CMS
    * store: per probe user (user_id < 20), the estimated event count
    * over the last-10-days span, answered by (1) pruning the store to
    * the span's day partitions (literal bound — the q411
    * PartitionFilters posture), (2) SUM-merging the spanned cell files
    * (count-min registers merge by cell-wise addition, the property
    * that makes CMS the production frequency sketch), (3) est = min
    * over the 4 rows of the probe's merged cell — never an undercount.
    * The oracle rebuilds the merged cells from RAW span events (merge ∘
    * land ≡ direct, the q419 claim for the frequency family) and probes
    * identically — exact integers end to end, no float anywhere.
    *
    * This completes the mergeable-sketch STORE matrix: HLL registers
    * (q411-q413, MAX-merge), histograms (q419, SUM-merge), now
    * count-min (SUM-merge) — the three sketch algebras a production
    * metrics store runs on.
    *
    * Scale: the store read is ≤ 10 days × 4096 rows; the probe side is
    * a bounded literal set; nothing rescans events after the store
    * write. Absent probe users correctly estimate 0 (their cells carry
    * no mass — COALESCE(0) on both sides).
    */
  def q423(s: SparkSession, dir: String): DataFrame = {
    val maxD = ensureCmsStore(s, dir)
    val cells = s.read.parquet(cmsRoot(s, dir))
      .filter(col("d") >= lit(maxD - 9L))
      .groupBy(col("i"), col("cell")).agg(sum(col("cv")).as("cv"))
    val probes = s.read.parquet(cmsRoot(s, dir) + "_probe")
      .filter(col("user_id") < 20) // no-op by construction; provable bound
      .select(col("user_id"), explode(sequence(lit(0), lit(3))).as("i"))
      .select(col("user_id"), col("i"), cmsCell(col("i"), col("user_id")))
    probes.join(broadcast(cells), Seq("i", "cell"), "left")
      .groupBy(col("user_id"))
      .agg(min(coalesce(col("cv"), lit(0L))).as("est"))
      .orderBy("user_id")
  }

  // ---- q420: ORC sink/source round-trip --------------------------------------

  /** The multi-byte hazard, spelled identically in the oracle: the
    * corpus is pure ASCII (fixture-probed — q103's premise), so a
    * plain export would certify ORC's string path only on single-byte
    * data. Every 'e' becomes U+00E9 (2-byte UTF-8), making every row's
    * text multi-byte — char length ≠ byte length, the encoding-bug
    * surface (the q417 hazard-injection discipline, format-appropriate:
    * ORC has no quoting/escaping to stress, its hazard is encoding).
    */
  private def orcHazard: org.apache.spark.sql.Column =
    translate(col("text"), "e", "é")

  /** Land the documents table as ORC once per session — the THIRD
    * interchange format after q416's JSONL and q417's CSV: columnar
    * like parquet but a different container, codec framing, and string
    * encoding path, so a content-sensitive round-trip certifies the
    * whole ORC writer/reader pair rather than assuming
    * parquet-adjacent means correct.
    */
  private[graft] def ensureOrc(s: SparkSession, dir: String): String =
    graft.StoreLifecycle.ensure(s, "orc", dir) { path =>
      Tables.table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("source"),
          col("n_chars").cast("long").as("n_chars"),
          orcHazard.as("text"))
        .write.mode("overwrite").orc(path)
      path
    }

  /** q420 — ORC sink/source round-trip certification: q416's
    * content-sensitive aggregate (per (lang, source): doc count, char
    * mass, summed 32-bit md5 prefix of every text — collation-free, so
    * no cross-engine string-ordering hazard) computed from the ORC
    * read-back with an EXPLICIT schema, over hazard-injected multi-byte
    * text ([[orcHazard]], mirrored in the oracle). The oracle reads the
    * PARQUET table, so a hash match proves ORC preserved every UTF-8
    * byte exactly through its own dictionary/RLE/string machinery.
    *
    * Scale: one columnar write + one columnar scan; at 100 TB ORC is
    * the interchange leg for Hive-lineage consumers the way JSONL is
    * for labeling toolchains — format certifications are per-format,
    * which is exactly why this query exists beside q416/q417.
    */
  def q420(s: SparkSession, dir: String): DataFrame = {
    val back = s.read
      .schema("doc_id LONG, lang STRING, source STRING, n_chars LONG, text STRING")
      .orc(ensureOrc(s, dir))
    back.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("md5_sum"))
      .orderBy("lang", "source")
  }

  // ---- registry -------------------------------------------------------------

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q418_sigstore_compact" -> (q418 _),
    "q419_hist_store_quantiles" -> (q419 _),
    "q420_orc_roundtrip" -> (q420 _),
    "q423_cms_store_probe" -> (q423 _),
  )

  /** q418 oracle: the q107-certified md5-min signature chain (same t/g/m
    * CTE spelling as `Dedup.minhashBandCte`), digested per doc.
    */
  private val sigStoreOracle: String = {
    val mins = (0 until 12).map(k =>
      s"MIN(md5('$k:' || s)) AS mh$k").mkString(", ")
    val key = (0 until 12).map(k => s"mh$k").mkString(" || '|' || ")
    s"""WITH t AS (
       |  SELECT doc_id, list_distinct(list_transform(
       |    range(1, len(string_split(text,' ')) - 1),
       |    i -> string_split(text,' ')[i] || ' ' || string_split(text,' ')[i+1] ||
       |         ' ' || string_split(text,' ')[i+2])) AS sh
       |  FROM documents
       |  WHERE doc_id < 1000 AND len(string_split(text,' ')) >= 3),
       |g AS (SELECT doc_id, unnest(sh) AS s FROM t),
       |m AS (SELECT doc_id, $mins FROM g GROUP BY doc_id)
       |SELECT doc_id, md5($key) AS sig_key
       |FROM m ORDER BY doc_id""".stripMargin
  }

  val oracleSql: Map[String, String] = Map(
    "q418_sigstore_compact" -> sigStoreOracle,
    // Histogram rebuilt from RAW orders; quantile clauses mirror q242.
    "q419_hist_store_quantiles" ->
      """WITH h AS (
        |  SELECT o_orderpriority AS priority,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           // 1000000 AS bucket,
        |         COUNT(*) AS cnt
        |  FROM orders
        |  WHERE year(o_orderdate) * 100 + month(o_orderdate)
        |        BETWEEN 199501 AND 199612
        |  GROUP BY 1, 2),
        |spans AS (
        |  SELECT priority, bucket, cnt,
        |         SUM(cnt) OVER (PARTITION BY priority ORDER BY bucket
        |                        ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(cnt) OVER (PARTITION BY priority) AS n
        |  FROM h),
        |sp AS (SELECT *, cum - cnt AS prev FROM spans),
        |est AS (
        |  SELECT priority, p, n,
        |         CAST(ROUND(bucket * 1000000 +
        |             ((p * n + 99) // 100 - prev) * 1000000.0 / cnt)
        |           AS BIGINT) AS est_cents
        |  FROM sp CROSS JOIN (VALUES (50), (90), (99)) AS pp(p)
        |  WHERE cum >= (p * n + 99) // 100 AND prev < (p * n + 99) // 100)
        |SELECT priority, CAST(p AS BIGINT) AS p, CAST(n AS BIGINT) AS n,
        |       est_cents
        |FROM est ORDER BY priority, p""".stripMargin,
    // The oracle reads the PARQUET table (q416's pattern) with the
    // identical multi-byte injection — the hash match IS the byte-exact
    // ORC round-trip proof on UTF-8 data.
    "q420_orc_roundtrip" ->
      """SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS n_docs,
        |       CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
        |       CAST(SUM(CAST(('0x' ||
        |              substr(md5(replace(text, 'e', 'é')), 1, 8)) AS BIGINT))
        |            AS BIGINT) AS md5_sum
        |FROM documents GROUP BY lang, source
        |ORDER BY lang, source""".stripMargin,
    // q423: same floored days, same scalar-subquery max where Spark
    // pins the store's max partition as a literal, same md5 cell hash
    // (q114's spelling) — cells rebuilt from RAW span events here where
    // Spark SUM-merges persisted daily files (cell addition commutes
    // with the day split), identical probe, exact-integer min.
    "q423_cms_store_probe" ->
      """WITH uc AS (
        |  SELECT user_id, epoch_ns(ts) // 86400000000000 AS d FROM events),
        |mx AS (SELECT MAX(d) AS maxd FROM uc),
        |cnts AS (
        |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM uc, mx WHERE d >= maxd - 9 GROUP BY user_id),
        |cells AS (
        |  SELECT CAST(i.i AS BIGINT) AS i,
        |         CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
        |           || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS cell,
        |         CAST(SUM(cnt) AS BIGINT) AS cv
        |  FROM cnts CROSS JOIN range(4) i(i)
        |  GROUP BY 1, 2),
        |probe AS (SELECT DISTINCT user_id FROM uc WHERE user_id < 20),
        |pf AS (
        |  SELECT user_id, CAST(i.i AS BIGINT) AS i,
        |         CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
        |           || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT) % 16 AS cell
        |  FROM probe CROSS JOIN range(4) i(i))
        |SELECT p.user_id, CAST(MIN(COALESCE(c.cv, 0)) AS BIGINT) AS est
        |FROM pf p LEFT JOIN cells c ON c.i = p.i AND c.cell = p.cell
        |GROUP BY p.user_id ORDER BY p.user_id""".stripMargin,
  )
}
