package graft

import org.apache.spark.sql.functions._

/** Round-16 pins: the incremental dedup pair derivation behind
  * q415/q424 (r15 verdict item 1 — the warm CC loop was warm but the
  * query re-fingerprinted the whole corpus every run). Three claims,
  * each pinned at fixture scale:
  *
  *   1. SET IDENTITY — (new-vs-new band pairs) ∪ (new-vs-store band
  *      join) equals the full-corpus pair set restricted to pairs
  *      touching the new half (band completeness through the
  *      fingerprint-store round-trip).
  *   2. STORE FIDELITY — the persisted old-half fingerprints are
  *      bit-identical to a fresh recomputation (simhash is per-doc, so
  *      the store can never drift from the derivation).
  *   3. STAR BINDING — the fixture forces label flow THROUGH a star
  *      edge: some stored multi-member component ends up with an odd
  *      (new-half) label, which can only reach its second old member
  *      via the comp→id star edge (the old-old candidate pairs are
  *      never rederived). Without this probe, a broken star leg would
  *      pass warm ≡ cold vacuously on a fixture where old components
  *      never re-label. Probed at all 3 SFs via DuckDB (r16): 3/6/6
  *      star-binding components at sf0.001/0.01/0.1.
  */
class Round16Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("q424 incremental pair set == full band-pair set restricted to pairs " +
    "touching the new half (band completeness through the store)") {
    val subset = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 1000)
    val full = ext.Dedup.simhashBandPairs(
      ext.Dedup.simhashN(subset, col("doc_id"), col("text"), bits = 60),
      bits = 60, bands = 4, maxHamming = 2).localCheckpoint(true)
    val touchingNew = full
      .filter(col("id_a") % 2 === 1 || col("id_b") % 2 === 1)
    val inc = ext.Components.q424(spark, sf).localCheckpoint(true)
    assert(inc.exceptAll(touchingNew).isEmpty &&
      touchingNew.exceptAll(inc).isEmpty,
      "incremental pair derivation diverged from the from-scratch set")
    // Bindingness of the restriction itself: pairs exist on BOTH sides
    // of it (old-old pairs really are excluded; new-touching pairs
    // really are found), and both q424 legs are non-empty.
    assert(full.count() > touchingNew.count(),
      "no old-old pair at this SF — the restriction is vacuous")
    assert(inc.filter(col("id_a") % 2 === col("id_b") % 2).count() > 0,
      "no new-vs-new pair — the self-join leg is vacuous")
    assert(inc.filter(col("id_a") % 2 =!= col("id_b") % 2).count() > 0,
      "no new-vs-store pair — the bipartite leg is vacuous")
  }

  test("ccstore sigs leg: persisted old-half fingerprints are bit-identical " +
    "to a fresh recomputation") {
    val root = ext.Components.ensureCcStore(spark, sf)
    val stored = spark.read.parquet(s"$root/sigs")
    val fresh = ext.Dedup.simhashN(
      Tables.table(spark, sf, "documents")
        .filter(col("doc_id") < 1000 && col("doc_id") % 2 === 0),
      col("doc_id"), col("text"), bits = 60)
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "fingerprint store diverged from the derivation")
  }

  // ---- q425: persisted eval-gram store ---------------------------------------

  test("q425 gram store fidelity and bindingness: stored grams equal a fresh " +
    "derivation, and the odd batch really hits the store") {
    val root = ext.Decontam.ensureGramStore(spark, sf)
    val stored = spark.read.parquet(root)
    val d = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    val fresh = d.filter(col("doc_id") % 7 === 0)
      .select(explode(ext.Dedup.shinglesK(col("ws"), 5)).as("gram"))
      .distinct()
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "gram store diverged from the derivation")
    // Bindingness (DuckDB fixture probe r16: 41/44/78 hit docs at the
    // 3 SFs within the probe bound; unbounded is a superset).
    val hits = ext.Decontam.q425(spark, sf).count()
    assert(hits > 0, "no odd-batch doc hits the eval gram store — vacuous")
    // The batch restriction binds: q425 ⊂ q104 (strictly, at this SF).
    val full = ext.Decontam.q104(spark, sf)
    assert(hits < full.count(),
      "q425 equals the full q104 report — the batch restriction is vacuous")
  }

  // ---- q426: append-maintained IVF store -------------------------------------

  test("q426 append ≡ rebuild: the two-generation store answers exactly like " +
    "q422's rebuilt store, each probed cell holds files from BOTH landings, " +
    "and some probe's top-3 mixes generations") {
    val viaAppend = ext.Similarity.q426(spark, sf).localCheckpoint(true)
    val viaRebuild = ext.Similarity.q422(spark, sf)
    assert(viaAppend.exceptAll(viaRebuild).isEmpty &&
      viaRebuild.exceptAll(viaAppend).isEmpty,
      "append-maintained IVF store diverged from the rebuilt store")
    // Two file generations really landed per cell.
    val root = ext.Similarity.ensureIvfAppendStore(spark, sf)
    val cells = new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("label="))
    assert(cells.nonEmpty, "no cell directories in the append store")
    cells.foreach { c =>
      val files = c.listFiles().count(_.getName.endsWith(".parquet"))
      assert(files >= 2,
        s"${c.getName} holds $files parquet file(s) — the append " +
          "generation did not land beside the build generation")
    }
    // Bindingness: a broken append (odd generation lost) would still
    // pass a top-3 check built only from even vectors — require that
    // some probe's top-3 contains BOTH parities (DuckDB fixture probe
    // r16: 3/3/4 of 5 probes at the 3 SFs).
    val mixed = viaAppend.groupBy("qid")
      .agg(countDistinct(col("did") % 2).as("p"))
      .filter(col("p") === 2).count()
    assert(mixed > 0,
      "no probe draws top-3 neighbors from both generations — vacuous")
  }

  // ---- q427: two-generation DF register store --------------------------------

  test("q427 DF registers: store read-back equals a fresh per-generation " +
    "derivation, and the SUM-merge binds (top terms live in BOTH generations)") {
    val root = queries.Round16.ensureDfStore(spark, sf)
    val stored = spark.read.parquet(s"$root/df")
    val fresh = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy((col("doc_id") % 2).as("gen"), col("term"))
      .agg(count(lit(1)).as("df"))
      .select(col("term"), col("df"), col("gen"))
    assert(stored.exceptAll(fresh).isEmpty && fresh.exceptAll(stored).isEmpty,
      "DF register store diverged from the derivation")
    val top = queries.Round16.q427(spark, sf).collect()
    assert(top.length === 25, s"expected the top-25 cut, got ${top.length}")
    assert(top.forall(r => r.getLong(1) > 0 && r.getLong(2) > 0),
      "a top term is missing from one generation — the SUM-merge leg " +
        "would be vacuous for it")
  }

  // ---- q428: two-generation bloom bit store -----------------------------------

  test("q428 OR-merge and probe semantics bind: generations overlap (merged < " +
    "sum), no false negative, real false positives, and the filter prunes") {
    val Array(g0, g1, merged, probed, bloomPos) =
      ext.Decontam.q428(spark, sf).collect().head.toSeq
        .map(_.asInstanceOf[Long]).toArray
    assert(merged < g0 + g1,
      "no shared bit between generations — the OR-merge is vacuous " +
        "(plain concatenation would pass)")
    assert(merged > math.max(g0, g1),
      "one generation's bits contain the other's — the append leg is vacuous")
    // Exact membership, computed independently: corpus grams vs eval
    // grams (the q263 ground-truth construction).
    val d = Tables.table(spark, sf, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("ws"))
    def grams(f: org.apache.spark.sql.DataFrame) = f
      .select(explode(ext.Dedup.shinglesK(col("ws"), 5)).as("gram")).distinct()
    val corpus = grams(d.filter(col("doc_id") % 7 =!= 0))
    val ev = grams(d.filter(col("doc_id") % 7 === 0)).localCheckpoint(true)
    val truePos = ev.join(corpus, Seq("gram"), "left_semi").count()
    assert(bloomPos > truePos,
      s"no false positive at this SF (bloom $bloomPos vs exact $truePos) — " +
        "the sketch leg is vacuous; re-probe m")
    assert(bloomPos < probed,
      "every probe is bloom-positive — the filter is saturated and prunes " +
        "nothing; re-probe m")
    assert(probed === ev.count(), "probe census drifted from the gram store")
    // No false negatives — the Bloom guarantee itself: every true
    // member probe must be bloom-positive. Per-gram verdicts rebuilt
    // with the same portable positions against the store's merged bits.
    val bits = spark.read
      .parquet(ext.Decontam.ensureBloomStore(spark, sf))
      .select(col("b")).distinct()
    val positions = array((0 until 3).map(i =>
      pmod(conv(substring(md5(
        concat(lit(s"$i:"), col("gram"))), 1, 10), 16, 10).cast("long"),
        lit(262144L))): _*)
    val positives = ev
      .select(col("gram"), explode(positions).as("b"))
      .join(bits, "b")
      .groupBy(col("gram")).agg(count(lit(1)).as("hits"))
      .filter(col("hits") === 3).select("gram")
    val falseNeg = ev.join(corpus, Seq("gram"), "left_semi")
      .join(positives, Seq("gram"), "left_anti").count()
    assert(falseNeg === 0L,
      s"$falseNeg true member(s) bloom-NEGATIVE — the filter guarantee broke")
  }

  // ---- compaction lock (r15 ADVICE) ------------------------------------------

  test("compactSignatureStore exclusivity: a LIVE owner's lock fails the " +
    "second compactor fast; a DEAD owner's lock is stolen and compaction " +
    "proceeds") {
    val root = java.nio.file.Files.createTempDirectory("graft-r16-lock").toString
    val docs = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") < 300).select("doc_id", "text")
    (0 until 3).foreach { i =>
      val sig = ext.Dedup.minhashSignature(
        docs.filter(col("doc_id") % 3 === i)
          .select(col("doc_id"), ext.Dedup.shingles3(col("text")).as("sh")),
        col("doc_id"), col("sh"), numHashes = 12)
      streaming.EventStream.writeBatchIdempotent(sig, i.toLong, root)
    }
    val lock = java.nio.file.Paths.get(root, ".compact_lock")
    // Live owner (this JVM's own pid): must fail fast, store untouched.
    java.nio.file.Files.writeString(lock,
      ProcessHandle.current().pid().toString)
    val ex = intercept[IllegalArgumentException] {
      streaming.EventStream.compactSignatureStore(spark, root, upTo = 1L)
    }
    assert(ex.getMessage.contains("single-flight"))
    val dirs = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(dirs === Set("batch_id=0", "batch_id=1", "batch_id=2"),
      "failed lock acquisition must leave the store untouched")
    // Dead owner: a pid that cannot exist (beyond pid_max) — the lock
    // is stolen, compaction completes, and the lock is released.
    java.nio.file.Files.writeString(lock, "999999999")
    streaming.EventStream.compactSignatureStore(spark, root, upTo = 1L)
    val after = new java.io.File(root).listFiles()
      .filter(_.getName.startsWith("batch_id=")).map(_.getName).toSet
    assert(after === Set("batch_id=1", "batch_id=2"),
      "compaction under a stolen dead lock did not merge the aged batches")
    assert(!java.nio.file.Files.exists(lock), "lock not released after the run")
  }

  test("q426 store probe prunes cells dynamically (DPP filter on label, " +
    "same as the q422 pin but through the two-generation store)") {
    val plan = ext.Similarity.q426(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruning PartitionFilter on the append-store scan:\n$plan")
  }

  test("q415 star-edge leg binds: some stored multi-member component takes " +
    "an odd label in the warm run — that label crossed a star edge") {
    val root = ext.Components.ensureCcStore(spark, sf)
    val stored = spark.read.parquet(s"$root/labels")
      .select(col("id").as("doc_id"), col("comp"))
    val multi = stored.groupBy("comp")
      .agg(count(lit(1)).as("n")).filter(col("n") >= 2)
    val warm = ext.Components.q415(spark, sf)
    val starBound = stored.join(multi, "comp")
      .join(warm, "doc_id")
      .filter(col("component") % 2 === 1)
    assert(starBound.count() > 0,
      "no stored multi-member component re-labeled to a new-half id — " +
        "the star-edge propagation path never bound (fixture drifted?)")
  }
}
