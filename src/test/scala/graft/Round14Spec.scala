package graft

import org.apache.spark.sql.functions._

/** Round-14 pins: the persisted register-store lifecycle (q411/q412)
  * and the q57↔q107 near-dup cross-check (r13 verdict items 3 and 5).
  */
class Round14Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"
  private val sf01 = "/root/testdata/sf0.01"

  // ---- store lifecycle ------------------------------------------------------

  test("q411 store read is day-partition-pruned: the physical plan carries a " +
    "PartitionFilters bound at the literal maxD-9 and scans only the window") {
    val maxD = queries.Round14.ensureDailyStore(spark, sf)
    val pruned = queries.Round14.dailyRead(spark, sf)
      .filter(col("d") >= lit(maxD - 9L))
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"no PartitionFilters in the store-read plan:\n$plan")
    assert(plan.contains((maxD - 9L).toString),
      s"the literal day bound ${maxD - 9L} did not reach the scan:\n$plan")
    // The filter must prune the listing itself: 30 day partitions on
    // disk, 10 inside the window.
    val allDays = queries.Round14.dailyRead(spark, sf)
      .select("d").distinct().count()
    val windowDays = pruned.select("d").distinct().count()
    assert(allDays === 30L && windowDays === 10L,
      s"expected 30 store days / 10 window days, got $allDays/$windowDays")
  }

  test("persisted daily store equals freshly-built registers cell for cell " +
    "(the parquet round-trip is lossless at query grain)") {
    queries.Round14.ensureDailyStore(spark, sf)
    val fresh = ops.Sketches.hllPortableRegisters(
      queries.Round14.udt(spark, sf), Seq("t", "d"), col("user_id"))
    val stored = queries.Round14.dailyRead(spark, sf)
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "persisted store diverged from freshly-built registers")
  }

  test("q412 compaction commutes: weekly MAX-merge of persisted daily files " +
    "equals weekly registers built from raw user rows") {
    val maxD = queries.Round14.ensureDailyStore(spark, sf)
    val fromRaw = ops.Sketches.hllPortableRegisters(
      queries.Round14.udt(spark, sf)
        .filter(col("d") < lit(maxD - 9L))
        .select(col("t"), expr("d div 7").as("wk"), col("user_id")),
      Seq("t", "wk"), col("user_id"))
    val q412 = queries.Round14.q412(spark, sf)
    val fromRawEst = ops.Sketches.hllPortableEstimate(fromRaw, Seq("t", "wk"))
    assert(q412.exceptAll(fromRawEst).isEmpty &&
      fromRawEst.exceptAll(q412).isEmpty,
      "compacted-store estimates diverged from raw-built weekly registers")
  }

  test("q411/q412 bindingness: full pair grid over the 10-day window; " +
    "4 aged weeks per type; estimates positive") {
    val q411 = queries.Round14.q411(spark, sf).localCheckpoint(true)
    // 5 types active every day on this stream → C(5,2)=10 pairs × 10 days.
    assert(q411.count() === 100L, "expected 10 days × 10 type pairs")
    assert(q411.filter(col("a_est_e2") <= 0 || col("b_est_e2") <= 0 ||
      col("union_est_e2") <= 0).isEmpty, "degenerate estimate in q411")
    // I–E sanity: every union at least as large as each member.
    assert(q411.filter(col("union_est_e2") < col("a_est_e2") ||
      col("union_est_e2") < col("b_est_e2")).isEmpty,
      "union estimate below a member estimate")
    val q412 = queries.Round14.q412(spark, sf).localCheckpoint(true)
    assert(q412.count() === 20L, "expected 4 aged weeks × 5 types")
    assert(q412.filter(col("est_e2") <= 0).isEmpty, "degenerate weekly estimate")
    // Two-tier span query: one row per type, and the span estimate
    // dominates any single week's (more days merged in → more
    // registers hit, the estimate is monotone in set inclusion).
    val q413 = queries.Round14.q413(spark, sf).localCheckpoint(true)
    assert(q413.count() === 5L, "expected one span row per type")
    val wkMax = q412.groupBy(col("t")).agg(max(col("est_e2")).as("wk_max"))
    assert(q413.join(wkMax, "t").filter(col("est_e2") < col("wk_max")).isEmpty,
      "span estimate fell below a single compacted week's estimate")
  }

  // ---- JSONL round-trip (q416) ----------------------------------------------

  test("q416 JSONL round-trip: the read-back aggregate equals the same " +
    "aggregate computed directly from parquet, across multiple groups") {
    val direct = Tables.table(spark, sf, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        sum(conv(substring(md5(col("text")), 1, 8), 16, 10).cast("long"))
          .as("md5_sum"))
    val viaJson = queries.Round14.q416(spark, sf).localCheckpoint(true)
    assert(viaJson.exceptAll(direct).isEmpty && direct.exceptAll(viaJson).isEmpty,
      "JSONL read-back aggregate diverged from the parquet-side aggregate")
    assert(viaJson.count() > 1L, "single group — the round-trip pin is vacuous")
  }

  // ---- CSV multiLine round-trip (q417) --------------------------------------

  test("q417 CSV round-trip: hazards actually landed (physical lines far " +
    "exceed rows) and the multiLine read-back equals the parquet side") {
    val direct = Tables.table(spark, sf, "documents")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars").cast("long")).as("sum_chars"),
        sum(conv(substring(md5(
          concat(lit("\""), translate(col("text"), " ", "\n"))), 1, 8), 16, 10)
          .cast("long")).as("md5_sum"))
    val viaCsv = queries.Round14.q417(spark, sf).localCheckpoint(true)
    assert(viaCsv.exceptAll(direct).isEmpty && direct.exceptAll(viaCsv).isEmpty,
      "CSV multiLine read-back diverged from the parquet-side aggregate")
    // Bindingness: the landed files must contain far more PHYSICAL
    // lines than data rows — the embedded newlines really reached disk
    // and the multiLine parser really had to stitch them.
    val nDocs = Tables.table(spark, sf, "documents").count()
    val physicalLines = spark.read.text(
      queries.Round14.ensureCsv(spark, sf)).count()
    assert(physicalLines > nDocs * 10,
      s"only $physicalLines physical lines for $nDocs rows — hazards not landing")
  }

  // ---- warm-start PageRank (q414) -------------------------------------------

  test("q414 warm-start equals cold: 3 persisted rounds + 1 warm round match " +
    "the 4-round cold run on the e6 grid") {
    // Same edge derivation as the registered graph family (the shared
    // memo is ext-private; the 3-line derivation is its definition).
    val o = Tables.table(spark, sf, "orders").select(col("o_orderkey"), col("o_custkey"))
    val l = Tables.table(spark, sf, "lineitem").select(col("l_orderkey"), col("l_suppkey"))
    val edges = o.join(l, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("src"), (col("l_suppkey") * 2 + 1).as("dst"))
    val cold = ext.Components.pageRank(edges, iterations = 4,
      loopShufflePartitions = Some(8))
      .select(col("id"), ext.Similarity.intScaled(col("pr"), 1000000L).as("pr_e6"))
    val warm = ext.Components.q414(spark, sf).select("id", "pr_e6")
    assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
      "warm-start ranks diverged from the 4-round cold run")
  }

  // ---- incremental connected components (q415) ------------------------------

  test("q415 warm-start CC is binding and exact: the even-half store covers " +
    "real components, cross-parity pairs force real merges, and the seeded " +
    "run equals the cold q102 labeling") {
    val warm = ext.Components.q415(spark, sf).localCheckpoint(true)
    val cold = ext.Components.q102(spark, sf)
    assert(warm.exceptAll(cold).isEmpty && cold.exceptAll(warm).isEmpty,
      "incremental labeling diverged from the cold full-graph labeling")
    // Bindingness: the fixture's candidate pairs must MIX parities —
    // otherwise the warm start never exercises a merge of a persisted
    // component with a new node.
    val subset = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 1000)
    val pairs = ext.Dedup.simhashBandPairs(
      ext.Dedup.simhashN(subset, col("doc_id"), col("text"), bits = 60),
      bits = 60, bands = 4, maxHamming = 2)
    val cross = pairs.filter(col("id_a") % 2 =!= col("id_b") % 2).count()
    val within = pairs.filter(col("id_a") % 2 === col("id_b") % 2).count()
    assert(cross > 0, "no cross-parity candidate pair — warm start vacuous")
    assert(within > 0, "no within-half pair — the persisted state is all singletons")
  }

  // ---- streaming ingest store pruning (r13 verdict item 6) ------------------

  test("streaming dedup replay read prunes batch_id partitions: the reference " +
    "read for a replayed batch carries a PartitionFilters bound and sees only " +
    "strictly-earlier batches") {
    val root = java.nio.file.Files.createTempDirectory("graft-r14-ingest").toString
    val sigDir = s"$root/sigs"
    val keepDir = s"$root/keep"
    val docs = Tables.table(spark, sf, "documents").select("doc_id", "text")
    (0 until 3).foreach { i =>
      streaming.EventStream.dedupIngestBatch(
        docs.filter(col("doc_id") % 3 === i), i.toLong, sigDir, keepDir)
    }
    // The exact reference read dedupIngestBatch builds for a replay of
    // batch 2: batch_id is a PARTITION column (batch_id=<n> dirs), so
    // the strictly-earlier bound must land as a partition filter — the
    // listing never touches the replayed batch's own (or any later)
    // directory.
    val replayRef = spark.read.parquet(sigDir).filter(col("batch_id") < 2)
    val plan = replayRef.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters"),
      s"no PartitionFilters in the replay reference read:\n$plan")
    assert(plan.contains("batch_id"),
      s"batch_id bound missing from the scan:\n$plan")
    assert(replayRef.select("batch_id").distinct().count() === 2L,
      "replay reference must see exactly the strictly-earlier batches")
  }

  // ---- q57 ↔ q107 cross-check (r13 verdict item 5) --------------------------

  test("q57 spark.ml LSH candidates cover the certified q107 planted set at " +
    "sf0.01: every portable-banding pair is found by the ml path too") {
    // q107 is the oracle-certified portable MinHash banding — its 25
    // pairs at sf0.01 ARE the planted near-dup set. q57 is the
    // rows-only spark.ml variant: this is its missing cross-check —
    // q57 ⊇ q107 makes q57 ∩ q107 the full planted set, and |q57| = 25
    // upgrades coverage to set EQUALITY (the two independent hash
    // families band the same 25 candidates and nothing else).
    val planted = ext.Dedup.q107(spark, sf01)
      .select("id_a", "id_b").localCheckpoint(true)
    assert(planted.count() === 25L, "expected the 25 planted pairs")
    val ml = ext.Dedup.q57(spark, sf01).select("id_a", "id_b")
      .localCheckpoint(true)
    assert(planted.except(ml).isEmpty,
      "a certified q107 pair is missing from q57's spark.ml candidates")
    assert(ml.count() === 25L,
      "q57's candidate set grew beyond the planted pairs at sf0.01")
  }
}
