package graft

import org.apache.spark.sql.functions._

/** Round-15 pins: the compacted signature store behind q418 (physical
  * layout + row preservation) and the histogram-register store behind
  * q419 (partition pruning with literal month bounds + bindingness of
  * the span filter and the monthly merge).
  */
class Round15Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---- q418: compacted signature store --------------------------------------

  test("q418 store physically holds ONLY {batch_id=4, batch_id=5} after " +
    "compaction, with one row per probe doc (no loss, no duplication)") {
    val root = queries.Round15.ensureSigStore(spark, sf)
    val dirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(dirs === Set("batch_id=4", "batch_id=5"),
      s"compaction did not merge the aged batches: $dirs")
    // Bindingness: the merge had something to merge — every residue
    // class doc_id % 6 is populated in the probe set at this SF, so
    // five non-empty directories really collapsed into one.
    val classes = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 1000)
      .select((col("doc_id") % 6).as("r")).distinct().count()
    assert(classes === 6L, s"only $classes of 6 batch classes populated")
    // One signature row per shingleable probe doc.
    val shingleable = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 1000 &&
        size(split(col("text"), " ")) >= 3).count()
    val stored = spark.read.parquet(root).count()
    assert(stored === shingleable,
      s"store rows $stored != shingleable probe docs $shingleable")
    val distinctIds = spark.read.parquet(root)
      .select("__id").distinct().count()
    assert(distinctIds === stored, "duplicate doc ids in the compacted store")
  }

  test("q418 equals the signatures derived directly from documents — the " +
    "store round-trip through landing + compaction is lossless") {
    val base = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 1000)
      .select(col("doc_id"), ext.Dedup.shingles3(col("text")).as("sh"))
    val direct = ext.Dedup.minhashSignature(base, col("doc_id"), col("sh"), 12)
      .select(col("__id").as("doc_id"),
        md5(concat_ws("|", (0 until 12).map(k => col(s"mh$k")): _*))
          .as("sig_key"))
    val viaStore = queries.Round15.q418(spark, sf)
    assert(viaStore.exceptAll(direct).isEmpty &&
      direct.exceptAll(viaStore).isEmpty,
      "compacted-store signatures diverged from the direct derivation")
  }

  // ---- q419: histogram-register store ----------------------------------------

  test("q419 store read is month-partition-pruned: PartitionFilters carries " +
    "the literal 199501/199612 bounds and scans only the span") {
    val root = queries.Round15.ensureHistStore(spark, sf)
    val pruned = spark.read.parquet(root)
      .filter(col("m") >= 199501 && col("m") <= 199612)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"no PartitionFilters in the store-read plan:\n$plan")
    assert(plan.contains("199501") && plan.contains("199612"),
      s"literal month bounds did not reach the scan:\n$plan")
    // Bindingness: the span EXCLUDES months (orders cover ~1992-1998,
    // so the filter prunes real partitions) and INCLUDES many (the
    // monthly merge has >1 register per (priority, bucket) to add).
    val allMonths = spark.read.parquet(root).select("m").distinct().count()
    val spanMonths = pruned.select("m").distinct().count()
    assert(spanMonths === 24L, s"expected 24 span months, got $spanMonths")
    assert(allMonths > spanMonths,
      s"span filter vacuous: $allMonths store months, $spanMonths in span")
    val multiMonth = pruned.groupBy("priority", "bucket")
      .agg(countDistinct(col("m")).as("k")).filter(col("k") > 1).count()
    assert(multiMonth > 0L,
      "no (priority, bucket) cell spans months — the SUM-merge is vacuous")
  }

  test("q419 bindingness: full 5x3 quantile grid, positive counts, and the " +
    "interpolation term actually fires (some estimate off the bucket edge)") {
    val r = queries.Round15.q419(spark, sf).collect()
    assert(r.length === 15, s"expected 5 priorities x 3 percentiles, got ${r.length}")
    assert(r.forall(_.getLong(2) > 0L), "a priority had zero span orders")
    val offEdge = r.count(_.getLong(3) % 1000000L != 0L)
    assert(offEdge > 0,
      "every estimate sits on a bucket edge — the within-bin interpolation " +
        "never bound")
  }

  // ---- q420: ORC round-trip ---------------------------------------------------

  test("q420 bindingness: the corpus is single-byte ASCII, so the e→é " +
    "injection is what makes the ORC UTF-8 leg bind (bytes > chars on disk)") {
    val pre = Tables.table(spark, sf, "documents")
      .filter(octet_length(col("text")) =!= length(col("text"))).count()
    assert(pre === 0L,
      "corpus already multi-byte — the injection probe premise is stale")
    val landed = spark.read.orc(queries.Round15.ensureOrc(spark, sf))
    val total = landed.count()
    val multi = landed
      .filter(octet_length(col("text")) > length(col("text"))).count()
    // Every fixture doc contains an 'e' (English-like synthetic text);
    // if that ever changes, the count still has to be non-trivial for
    // the certification to bind.
    assert(multi === total && total > 0L,
      s"only $multi of $total landed ORC rows are multi-byte — injection " +
        "not reaching disk")
  }

  // ---- q422: persisted IVF index ------------------------------------------------

  test("q422 probes the IVF store under DYNAMIC partition pruning: the index " +
    "scan carries a dynamicpruning filter on label, and the probe set " +
    "touches a strict subset of the cells (pruning binds)") {
    val root = ext.Similarity.ensureIvfStore(spark, sf)
    // Physical layout: one directory per coarse cell — the inverted lists.
    val cellDirs = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("label=")).length
    val allCells = Tables.table(spark, sf, "embeddings")
      .select("label").distinct().count()
    assert(cellDirs.toLong === allCells,
      s"store holds $cellDirs cell dirs for $allCells cells")
    // Bindingness: the 5 probe queries touch fewer cells than exist.
    val probedCells = Tables.table(spark, sf, "embeddings")
      .filter(col("vec_id") < 5).select("label").distinct().count()
    assert(probedCells < allCells,
      s"probe set covers all $allCells cells — pruning vacuous")
    // Plan pin: the store-side scan must be pruned DYNAMICALLY by the
    // broadcast query side's cells (DPP), not fully listed.
    val plan = ext.Similarity.q422(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruning PartitionFilter on the IVF store scan:\n$plan")
  }

  // ---- q423: count-min register store -----------------------------------------

  test("q423 CMS store: day span prunes (literal bound in PartitionFilters), " +
    "never undercounts, and overcounts SOMEWHERE (the sketch binds at w=16)") {
    val maxD = queries.Round15.ensureCmsStore(spark, sf)
    val root = graft.StorePaths.sessionRoot(spark, "cmsstore", sf)
    val pruned = spark.read.parquet(root).filter(col("d") >= lit(maxD - 9L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains((maxD - 9L).toString),
      s"literal day bound ${maxD - 9L} not in the store scan:\n$plan")
    val allDays = spark.read.parquet(root).select("d").distinct().count()
    val spanDays = pruned.select("d").distinct().count()
    assert(allDays === 30L && spanDays === 10L,
      s"expected 30 store days / 10 span days, got $allDays/$spanDays")
    // True span counts per probe user, computed directly from events.
    // q423 (and its oracle) report an estimate for EVERY probe user
    // with any event — a user quiet inside the span truly counts 0, so
    // the reference map must default to 0 rather than require span
    // activity (r15 ADVICE: the keySet equality used to double as an
    // accidental fixture-density assertion).
    val probeUsers = Tables.events(spark, sf)
      .select(col("user_id")).filter(col("user_id") < 20).distinct()
      .collect().map(_.getLong(0)).toSet
    val spanCnt = Tables.events(spark, sf)
      .select(col("user_id"), Tables.flooredDay().as("d"))
      .filter(col("d") >= lit(maxD - 9L) && col("user_id") < 20)
      .groupBy("user_id").agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val trueCnt = probeUsers.map(u => u -> spanCnt.getOrElse(u, 0L)).toMap
    val est = queries.Round15.q423(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet === trueCnt.keySet, "probe coverage diverged")
    val under = est.count { case (u, e) => e < trueCnt(u) }
    val over = est.count { case (u, e) => e > trueCnt(u) }
    assert(under === 0, s"$under probe users UNDERCOUNTED — CMS guarantee broken")
    assert(over > 0,
      "no probe user overcounts — the sketch leg is vacuous at this SF " +
        "(fixture drifted; re-probe the width)")
  }
}
