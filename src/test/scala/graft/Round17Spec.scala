package graft

import org.apache.spark.sql.functions._

/** Round-17 pins: the BM25 store-consumer (q429 — index statistics
  * read from the q427 register store, never recomputed from the
  * corpus) and register-store compaction (q430 —
  * [[ops.RegisterStore.compact]]'s SUM-algebra crash matrix, including
  * the non-idempotent-merge trap the `_COMPACTED` marker closes).
  */
class Round17Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  // ---- q429: BM25 from the DF register store -----------------------------------

  test("q429 store-fed BM25 ≡ from-raw BM25 (q126) bit for bit — the store's " +
    "N/avgdl/df reconstruct the exact from-raw statistics") {
    val store = queries.Round17.q429(spark, sf).localCheckpoint(true)
    val raw = ext.Ranking.q126(spark, sf).localCheckpoint(true)
    assert(store.exceptAll(raw).isEmpty && raw.exceptAll(store).isEmpty,
      "store-fed BM25 diverged from the from-raw computation")
  }

  test("q429 plan: the corpus is scanned exactly ONCE (the map-side tf/dl " +
    "projection) — every index statistic arrives from the register store") {
    queries.Round16.ensureDfStore(spark, sf) // steady-state plan
    val plan = queries.Round17.q429(spark, sf)
      .queryExecution.executedPlan.toString
    val scans = "documents\\.parquet".r.findAllMatchIn(plan).length
    assert(scans === 1,
      s"expected exactly 1 documents scan in the q429 plan, got $scans:\n$plan")
  }

  test("q429 bindingness: every query term has df > 0 in BOTH store " +
    "generations (the SUM-merge genuinely combines generations), and the " +
    "corpus registers cover the whole corpus") {
    val root = queries.Round16.ensureDfStore(spark, sf)
    val gens = spark.read.parquet(s"$root/df")
      .filter(col("term").isin("spark", "join", "window") && col("df") > 0)
      .groupBy("term").agg(countDistinct(col("gen")).as("gens"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gens.keySet === Set("spark", "join", "window") &&
      gens.values.forall(_ == 2L),
      s"query terms not present in both generations: $gens")
    val corpus = spark.read.parquet(s"$root/corpus")
    val n = corpus.agg(sum("n_docs")).head().getLong(0)
    val direct = Tables.table(spark, sf, "documents").count()
    assert(n === direct, s"corpus registers cover $n docs, corpus has $direct")
    assert(corpus.filter(col("n_docs") > 0).count() === 2L,
      "a corpus-stat generation is empty — the avgdl merge would be vacuous")
  }

  // ---- q430: register-store compaction ------------------------------------------

  /** The q430 landing replayed onto an arbitrary root (no memo) so the
    * crash tests control the store lifecycle directly.
    */
  private def landGens(root: String): Unit = {
    val terms = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    (0 to 3).foreach { g =>
      terms.filter(col("doc_id") % 4 === g)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g.toLong))
        .write.mode(if (g == 0) "overwrite" else "append")
        .partitionBy("gen").parquet(root)
    }
  }

  private def sumMerge(df: org.apache.spark.sql.DataFrame) =
    df.groupBy(col("term")).agg(sum(col("df")).as("df"))

  /** Expected merged head registers, straight from the raw corpus. */
  private def directHead(): Set[Seq[Any]] =
    Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 4 <= 2)
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .collect().map(_.toSeq).toSet

  private def genDirs(root: String): Set[String] =
    new java.io.File(root).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("gen="))
      .map(_.getName).toSet

  private def headRows(root: String): Set[Seq[Any]] =
    spark.read.parquet(root)
      .filter(col("gen").cast("long") <= 2L).drop("gen")
      .collect().map(_.toSeq).toSet

  test("q430 layout: compaction leaves exactly {gen=2, gen=3}, the head in " +
    "ONE data file carrying the marker, and the head rows equal the direct " +
    "from-raw merge") {
    val root = queries.Round17.ensureDfStore4(spark, sf)
    assert(genDirs(root) === Set("gen=2", "gen=3"),
      s"unexpected store layout: ${genDirs(root)}")
    val head = new java.io.File(root, "gen=2")
    val parts = head.listFiles().filter(_.getName.startsWith("part-"))
    assert(parts.length === 1,
      s"compacted head should be one data file, found ${parts.length}")
    assert(new java.io.File(head, "_COMPACTED_2").exists(),
      "compacted head lost its _COMPACTED marker")
    assert(headRows(root) === directHead(),
      "compacted head registers diverged from the direct merge")
  }

  test("q430 crash matrix: a run killed BETWEEN the renames (head aside, " +
    "stage not in) re-runs to the certified store; a run killed AFTER the " +
    "swap (aged dirs still present) must NOT re-merge — the marker blocks " +
    "the SUM double-count") {
    // -- kill point A: between the two renames -----------------------------
    val rootA = java.nio.file.Files
      .createTempDirectory("graft-r17-crashA").toString
    landGens(rootA)
    val stage = new java.io.File(rootA, ".compact_stage_2")
    sumMerge(spark.read.parquet(rootA)
      .filter(col("gen").cast("long") <= 2L).drop("gen"))
      .repartition(1).write.mode("overwrite").parquet(stage.getPath)
    java.nio.file.Files.createFile(
      java.nio.file.Paths.get(stage.getPath, "_COMPACTED_2"))
    val target = new java.io.File(rootA, "gen=2")
    assert(target.renameTo(new java.io.File(rootA, ".compact_old_2")),
      "test setup: rename-aside failed")
    // At this instant gen 2's only copy is the aside. The re-run must
    // restore it, discard the stage, and complete the merge.
    ops.RegisterStore.compact(spark, rootA, "gen", 2L, sumMerge)
    assert(genDirs(rootA) === Set("gen=2", "gen=3"),
      s"recovery did not complete: ${genDirs(rootA)}")
    assert(headRows(rootA) === directHead(),
      "registers lost or doubled across the between-renames recovery")
    assert(!stage.exists() &&
      !new java.io.File(rootA, ".compact_old_2").exists(),
      "recovery left stage/aside debris")

    // -- kill point B: after the swap, before the aged deletes -------------
    val rootB = java.nio.file.Files
      .createTempDirectory("graft-r17-crashB").toString
    landGens(rootB)
    ops.RegisterStore.compact(spark, rootB, "gen", 2L, sumMerge)
    val mergedOnce = headRows(rootB)
    // Recreate the aged inputs the crashed run never deleted. A naive
    // re-run would merge them INTO the already-merged head and double
    // every register — the exact trap the marker exists to close.
    val terms = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    (0 to 1).foreach { g =>
      terms.filter(col("doc_id") % 4 === g)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g.toLong))
        .write.mode("append").partitionBy("gen").parquet(rootB)
    }
    assert(genDirs(rootB) === Set("gen=0", "gen=1", "gen=2", "gen=3"))
    ops.RegisterStore.compact(spark, rootB, "gen", 2L, sumMerge)
    assert(genDirs(rootB) === Set("gen=2", "gen=3"),
      s"post-swap re-run did not finish the cleanup: ${genDirs(rootB)}")
    assert(headRows(rootB) === mergedOnce,
      "post-swap re-run re-merged the aged generations — registers doubled")
    assert(headRows(rootB) === directHead())
  }

  test("q430 guard rails: upTo at/above the newest generation is refused " +
    "(the live tail stays uncompacted)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-guard").toString
    landGens(root)
    val ex = intercept[IllegalArgumentException] {
      ops.RegisterStore.compact(spark, root, "gen", 3L, sumMerge)
    }
    assert(ex.getMessage.contains("strictly below"))
    assert(genDirs(root) === Set("gen=0", "gen=1", "gen=2", "gen=3"),
      "a refused compaction must leave the store untouched")
  }

  // ---- IVF re-quantization (r16 verdict item 1) ---------------------------------

  test("requantizeIvf: every vector lands exactly once across ~√N cells " +
    "(one file per cell), and the probe's top-3 equals the brute-force " +
    "top-3 within the probed cells through a dynamic partition prune") {
    val unit = ext.Similarity.withUnitVec(
      Tables.table(spark, sf, "embeddings"), "embedding", "u")
      .select("vec_id", "u").localCheckpoint(true)
    val n = unit.count()
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-ivfrq").toString
    // cellsPerDir = 4 at fixture scale so the two-level layout is
    // non-degenerate (ncells = 22 → 6 group dirs; the default 32 would
    // pack everything into one dir and the DPP pin below would be
    // vacuous).
    val trained = ext.Similarity.requantizeIvf(unit, root, cellsPerDir = 4)
    val ncellsTarget = math.sqrt(n.toDouble).toInt
    assert(trained >= 2 && trained <= ncellsTarget,
      s"trained $trained cells, expected 2..$ncellsTarget")
    val store = spark.read.parquet(s"$root/cells")
    assert(store.count() === n && store.select("vec_id").distinct().count() === n,
      "re-landing lost or duplicated vectors")
    val ndirsTarget = (ncellsTarget + 3) / 4
    val grpDirs = new java.io.File(s"$root/cells").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("grp="))
    assert(grpDirs.length >= 2 && grpDirs.length <= ndirsTarget,
      s"${grpDirs.length} group dirs, expected 2..$ndirsTarget")
    assert(grpDirs.forall(_.listFiles().count(_.getName.startsWith("part-")) == 1),
      "re-landing left more than one file in some group dir — the " +
        "repartition by grp must bound files at one per directory")
    // Probe: DPP on the cells scan, 3 rows per probe, and the winners
    // equal a brute-force rank WITHIN the probed cells.
    val probes = unit.filter(col("vec_id") < 5)
    val got = ext.Similarity.ivfRequantProbe(probes, root)
    assert(got.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "no dynamic PartitionFilter on the re-quantized cells scan")
    val rows = got.collect()
    assert(rows.length === 15, s"expected 5 probes × top-3, got ${rows.length}")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("qid").orderBy(col("sim").desc, col("did"))
    // Recompute the expected top-3 WITHOUT the pruned probe path: each
    // probe's cell is ITS OWN row's cell in the store (the probe-time
    // assignment is the same computation the landing ran), so rank all
    // of that cell's members brute-force and cut at 3.
    val q = ext.Similarity.ivfRequantProbe(probes, root)
    val brute = {
      val qAssigned = got.select(col("qid")).distinct()
        .join(store.select(col("vec_id").as("qid"), col("cell")), "qid")
      val d = store.select(col("vec_id").as("did"), col("u").as("du"), col("cell"))
      qAssigned.join(probes.select(col("vec_id").as("qid"), col("u").as("qu")), "qid")
        .join(d, "cell")
        .select(col("qid"), col("did"),
          ext.Similarity.dot(col("qu"), col("du")).as("sim"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("qid"), col("did"),
          ext.Similarity.intScaled(col("sim"), 100).as("sim_c"))
    }
    assert(q.exceptAll(brute).isEmpty && brute.exceptAll(q).isEmpty,
      "pruned probe diverged from the brute-force within-cell rank")
  }

  test("FsLock: an OWNERLESS lock younger than the grace window fails with " +
    "retry advice; past the grace it is stolen and the run proceeds") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-lock").toString
    landGens(root)
    val lock = new java.io.File(root, ".compact_lock")
    java.nio.file.Files.createFile(lock.toPath) // empty: no owner pid
    val ex = intercept[IllegalArgumentException] {
      ops.RegisterStore.compact(spark, root, "gen", 2L, sumMerge)
    }
    assert(ex.getMessage.contains("retry shortly"),
      s"young ownerless lock should ask for a retry: ${ex.getMessage}")
    assert(genDirs(root).size === 4, "refused run must leave the store alone")
    // Age the lock past the grace window: now it is a crashed
    // creator's debris and must be stolen.
    assert(lock.setLastModified(System.currentTimeMillis() - 120000L))
    ops.RegisterStore.compact(spark, root, "gen", 2L, sumMerge)
    assert(genDirs(root) === Set("gen=2", "gen=3"),
      "compaction under a stolen over-grace lock did not run")
    assert(!lock.exists(), "lock not released after the run")
  }
}
