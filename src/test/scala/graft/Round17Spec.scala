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

  test("q430 crash matrix, the HIGHER-upTo leg: aged generations left by a " +
    "run killed after the swap must NOT be re-merged by a LATER compaction " +
    "at a higher upTo — the marked head already contains them, and the " +
    "entry sweep finishes the interrupted cleanup first") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-crashC").toString
    landGens(root)
    ops.RegisterStore.compact(spark, root, "gen", 2L, sumMerge)
    val terms = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    // Recreate gens 0-1 — the inputs a crash-after-swap never deleted.
    (0 to 1).foreach { g =>
      terms.filter(col("doc_id") % 4 === g)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g.toLong))
        .write.mode("append").partitionBy("gen").parquet(root)
    }
    // The producer lands two more batches; the next SCHEDULED run
    // arrives with a higher upTo — the same-upTo marker short-circuit
    // cannot fire for it.
    Seq(4L -> 1, 5L -> 5).foreach { case (g, m) =>
      terms.filter(col("doc_id") % 8 === m)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g))
        .write.mode("append").partitionBy("gen").parquet(root)
    }
    ops.RegisterStore.compact(spark, root, "gen", 4L, sumMerge)
    assert(genDirs(root) === Set("gen=4", "gen=5"),
      s"higher-upTo run left the wrong layout: ${genDirs(root)}")
    // Head must equal {every doc once} + {the %8==1 batch once more}:
    // the leftover gens 0-1, already inside the marked gen=2 head,
    // would add a THIRD copy of their docs' registers if re-merged.
    val expect = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .withColumn("w",
        when(col("doc_id") % 8 === 1, lit(2)).otherwise(lit(1)))
      .groupBy(col("term")).agg(sum(col("w")).as("df"))
      .collect().map(_.toSeq).toSet
    val head = spark.read.parquet(root)
      .filter(col("gen").cast("long") === 4L).drop("gen")
      .collect().map(_.toSeq).toSet
    assert(head === expect,
      "leftover aged generations were re-merged — registers double-counted " +
        "across the crash boundary")
  }

  test("q430 repeated compaction (the monthly cadence): a SECOND compact " +
    "over {previous head + newer generations} treats the old head as one " +
    "input generation — registers stay equal to the direct from-raw merge, " +
    "and only the newest marker survives") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-recompact").toString
    landGens(root)
    ops.RegisterStore.compact(spark, root, "gen", 2L, sumMerge)
    // Two more batches land after the first compaction (doc_id % 8 in
    // {1, 5} — a genuine re-split so the new generations are non-empty
    // and distinct from the originals).
    val terms = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
    Seq(4L -> 1, 5L -> 5).foreach { case (g, m) =>
      terms.filter(col("doc_id") % 8 === m)
        .groupBy(col("term")).agg(count(lit(1)).as("df"))
        .withColumn("gen", lit(g))
        .write.mode("append").partitionBy("gen").parquet(root)
    }
    ops.RegisterStore.compact(spark, root, "gen", 4L, sumMerge)
    assert(genDirs(root) === Set("gen=4", "gen=5"),
      s"second compaction left the wrong layout: ${genDirs(root)}")
    assert(new java.io.File(root, "gen=4/_COMPACTED_4").exists())
    assert(!new java.io.File(root, "gen=4/_COMPACTED_2").exists(),
      "the first compaction's marker leaked into the new head")
    // Head = everything except the live gen-5 tail: all four original
    // generations plus the %8==1 batch — straight from raw.
    val expect = Tables.table(spark, sf, "documents")
      .select(col("doc_id"),
        explode(array_distinct(split(col("text"), " "))).as("term"))
      .withColumn("w",
        when(col("doc_id") % 8 === 1, lit(2)).otherwise(lit(1)))
      .groupBy(col("term")).agg(sum(col("w")).as("df"))
      .collect().map(_.toSeq).toSet
    val head = spark.read.parquet(root)
      .filter(col("gen").cast("long") === 4L).drop("gen")
      .collect().map(_.toSeq).toSet
    assert(head === expect,
      "registers lost or doubled across the second compaction")
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

  test("q431 float margins: every assignment sim (seeds, round-2, final) " +
    "sits far from its e6 rounding boundary, probe rank-3/4 raw gaps are " +
    "wide, output sims clear the e2 grid, and every probe cell has > 3 " +
    "members (the top-3 cut binds)") {
    val unit = ext.Similarity.withUnitVec(
      Tables.table(spark, sf, "embeddings"), "embedding", "u")
      .select("vec_id", "u").localCheckpoint(true)
    val n = unit.count()
    val ncells = math.sqrt(n.toDouble).toInt
    val seeds0 = unit.orderBy("vec_id").limit(ncells)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
      .localCheckpoint(true)
    val c1 = ext.Similarity.kmeansCentroidRound(unit, seeds0).localCheckpoint(true)
    val c2 = ext.Similarity.kmeansCentroidRound(unit, c1).localCheckpoint(true)
    def frac05(v: Double, scale: Double): Double = {
      val f = ((v * scale) % 1 + 1) % 1
      math.abs(f - 0.5)
    }
    val vecs = unit.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def centsOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    Seq("seeds" -> seeds0, "round2" -> c1, "final" -> c2).foreach {
      case (stage, cents) =>
        val cs = centsOf(cents)
        val m = (for ((_, v) <- vecs; (_, c) <- cs)
          yield frac05(dotd(v, c), 1e6)).min
        assert(m > 1e-7, s"$stage assignment e6 margin collapsed: $m")
    }
    // Probe-side margins off the final assignment (the store's cells).
    val cs2 = centsOf(c2)
    val cellOf = vecs.map { case (id, v) =>
      id -> cs2.map { case (cid, c) =>
        (cid, math.rint(dotd(v, c) * 1e6) / 1e6)
      }.minBy { case (cid, s) => (-s, cid) }._1
    }.toMap
    val byCell = vecs.groupBy { case (id, _) => cellOf(id) }
    vecs.filter(_._1 < 5).foreach { case (qid, qv) =>
      val members = byCell(cellOf(qid))
      assert(members.length > 3,
        s"probe $qid cell has only ${members.length} members — top-3 vacuous")
      val sims = members.map { case (did, dv) => (dotd(qv, dv), did) }
        .sortBy { case (s, did) => (-s, did) }
      val gap = sims(2)._1 - sims(3)._1
      assert(gap > 1e-7 || sims(2)._1 == sims(3)._1,
        s"probe $qid rank-3/4 raw gap collapsed: $gap")
      val e2margins = sims.take(3).map(s => frac05(s._1, 100.0))
      assert(e2margins.min > 1e-7,
        s"probe $qid output e2 margin collapsed: ${e2margins.min}")
    }
    // And the registry query agrees with this driver-side replay's cells.
    val got = ext.Similarity.q431(spark, sf).collect()
    assert(got.length === 15)
    got.foreach(r => assert(cellOf(r.getLong(1)) === cellOf(r.getLong(0)),
      s"probe ${r.getLong(0)} returned ${r.getLong(1)} from a different cell"))
  }

  test("q434 append-to-requantized-store: the appended generation's cell " +
    "assignments equal a direct assignment against the frozen quantizer, " +
    "the probe's top-3 genuinely mixes generations, and the q431 float-" +
    "margin ladder holds against the even-trained centroids") {
    val unit = ext.Similarity.withUnitVec(
      Tables.table(spark, sf, "embeddings"), "embedding", "u")
      .select("vec_id", "u").localCheckpoint(true)
    val root = ext.Similarity.ensureIvfRequantAppendStore(spark, sf)
    // (1) Store content ≡ direct assignment of EVERY vector (both
    // generations) against the stored frozen quantizer.
    val cs = spark.read.parquet(s"$root/centroids").collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    def dotd(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => x * y }.sum
    val vecs = unit.collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    val cellOf = vecs.map { case (id, v) =>
      id -> cs.map { case (cid, c) =>
        (cid, math.rint(dotd(v, c) * 1e6) / 1e6)
      }.minBy { case (cid, s2) => (-s2, cid) }._1
    }.toMap
    val stored = spark.read.parquet(s"$root/cells")
      .select("vec_id", "cell").collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    assert(stored.length === vecs.length,
      s"store holds ${stored.length} vectors, corpus has ${vecs.length}")
    stored.foreach { case (id, c) =>
      assert(c === cellOf(id),
        s"vector $id landed in cell $c; the frozen quantizer assigns ${cellOf(id)}")
    }
    // (2) Mixed-generation top-3 (fixture-probed 5/4/3 of 5 at the 3
    // SFs): the probe must really read across the append boundary.
    val got = ext.Similarity.q434(spark, sf).collect()
    assert(got.length === 15)
    val mixed = got.groupBy(_.getLong(0)).count { case (_, rows) =>
      rows.map(_.getLong(1) % 2).distinct.length == 2
    }
    assert(mixed >= 3,
      s"only $mixed of 5 probes draw top-3 from both generations — the " +
        "append leg is near-vacuous (fixture drifted?)")
    // (3) The q431 margin ladder against the EVEN-trained quantizer:
    // every final-assignment sim far from its e6 boundary, rank-3/4
    // raw gaps wide, output sims clear the e2 grid.
    def frac05(v: Double, scale: Double): Double = {
      val f = ((v * scale) % 1 + 1) % 1
      math.abs(f - 0.5)
    }
    val asgMargin = (for ((_, v) <- vecs; (_, c) <- cs)
      yield frac05(dotd(v, c), 1e6)).min
    assert(asgMargin > 1e-7, s"final assignment e6 margin collapsed: $asgMargin")
    // Training-stage margins (seeds, round-2) replayed on the even-half
    // sample — the q431 ladder under THIS training input (a rank flip
    // at either stage would move the trained centroids themselves).
    val trainUnit = unit.filter(col("vec_id") % 2 === 0).localCheckpoint(true)
    val nEven = trainUnit.count()
    val mSamp = math.max(1L, nEven / 20000L)
    val sample = trainUnit.filter(col("vec_id") % mSamp === 0)
      .localCheckpoint(true)
    val ncellsEven = math.max(1, math.sqrt(nEven.toDouble).toInt)
    val seeds0 = sample.orderBy("vec_id").limit(ncellsEven)
      .select(col("vec_id").as("cid"), col("u").as("cu"))
      .localCheckpoint(true)
    val c1 = ext.Similarity.kmeansCentroidRound(sample, seeds0)
      .localCheckpoint(true)
    val sampVecs = sample.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
    Seq("seeds" -> seeds0, "round2" -> c1).foreach { case (stage, cents) =>
      val cArr = cents.collect()
        .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray)
      val mrg = (for ((_, v) <- sampVecs; (_, c) <- cArr)
        yield frac05(dotd(v, c), 1e6)).min
      assert(mrg > 1e-7, s"$stage training e6 margin collapsed: $mrg")
    }
    val byCell = vecs.groupBy { case (id, _) => cellOf(id) }
    vecs.filter(_._1 < 5).foreach { case (qid, qv) =>
      val members = byCell(cellOf(qid))
      assert(members.length > 3,
        s"probe $qid cell has only ${members.length} members — top-3 vacuous")
      val sims = members.map { case (did, dv) => (dotd(qv, dv), did) }
        .sortBy { case (s2, did) => (-s2, did) }
      val gap = sims(2)._1 - sims(3)._1
      assert(gap > 1e-7 || sims(2)._1 == sims(3)._1,
        s"probe $qid rank-3/4 raw gap collapsed: $gap")
      val e2margins = sims.take(3).map(s2 => frac05(s2._1, 100.0))
      assert(e2margins.min > 1e-7,
        s"probe $qid output e2 margin collapsed: ${e2margins.min}")
    }
  }

  test("q432 layout + MAX bindingness: the HLL store compacts to " +
    "{gen=2, gen=3} with the marker; every head generation contributes a " +
    "register no sibling holds (losing a directory breaks the hash); the " +
    "MAX genuinely arbitrates conflicting rhos at sf0.01") {
    val root = queries.Round17.ensureHllStore4(spark, sf)
    assert(genDirs(root) === Set("gen=2", "gen=3"),
      s"unexpected layout: ${genDirs(root)}")
    assert(new java.io.File(root, "gen=2/_COMPACTED_2").exists())
    // Per-head-gen register recompute from raw events.
    def genRegs(dir: String, g: Int) = graft.ops.Sketches.hllPortableRegisters(
      Tables.events(spark, dir)
        .select(col("event_type").as("t"), col("user_id"))
        .filter(col("user_id") % 4 === g),
      Seq("t"), col("user_id"))
    val heads = (0 to 2).map(g =>
      genRegs(sf, g).select(col("t"), col("reg")).localCheckpoint(true))
    (0 to 2).foreach { g =>
      val others = heads.indices.filter(_ != g).map(heads)
        .reduce(_ union _).distinct()
      val unique = heads(g).exceptAll(heads(g).intersect(others)).count()
      assert(unique > 0,
        s"head generation $g contributes no unique register — a lost " +
          "directory would pass the hash vacuously")
    }
    // The compacted head equals the direct head MAX-merge.
    val direct = (0 to 2).map(g => genRegs(sf, g)).reduce(_ union _)
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho"))
    val stored = spark.read.parquet(root)
      .filter(col("gen").cast("long") === 2L).select("t", "reg", "rho")
    assert(stored.exceptAll(direct).isEmpty && direct.exceptAll(stored).isEmpty,
      "compacted head registers diverged from the direct MAX-merge")
    // MAX arbitration binds at sf0.01: some head (t, reg) cell holds
    // DIFFERENT rhos across generations (fixture-probed: 45 cells).
    val sf01 = "/root/testdata/sf0.01"
    val conflicts = (0 to 2).map(g => genRegs(sf01, g)).reduce(_ union _)
      .groupBy(col("t"), col("reg"))
      .agg(countDistinct(col("rho")).as("nr"))
      .filter(col("nr") >= 2).count()
    assert(conflicts >= 1,
      "no conflicting-rho register cells at sf0.01 — the MAX algebra " +
        "never arbitrates (fixture drifted?)")
  }

  test("q433 layout + OR bindingness: the Bloom store compacts to " +
    "{gen=2, gen=3} with the marker; every head generation sets bits no " +
    "sibling head sets (losing a directory breaks the hash); the OR " +
    "genuinely collapses bits shared across generations") {
    val root = ext.Decontam.ensureBloomStore4(spark, sf)
    assert(genDirs(root) === Set("gen=2", "gen=3"),
      s"unexpected layout: ${genDirs(root)}")
    assert(new java.io.File(root, "gen=2/_COMPACTED_2").exists())
    // Per-generation bit sets rebuilt from raw documents.
    def genBits(g: Int) = Tables.table(spark, sf, "documents")
      .filter(col("doc_id") % 7 =!= 0 && col("doc_id") % 4 === g)
      .select(col("doc_id"),
        explode_outer(ext.Dedup.shinglesK(split(col("text"), " "), 5)).as("gram"))
      .filter(col("gram").isNotNull).select("gram").distinct()
      .select(explode(ext.Decontam.bloomPositions(262144L)).as("b")).distinct()
    val heads = (0 to 2).map(g => genBits(g).localCheckpoint(true))
    (0 to 2).foreach { g =>
      val others = heads.indices.filter(_ != g).map(heads)
        .reduce(_ union _).distinct()
      val unique = heads(g).exceptAll(heads(g).intersect(others)).count()
      assert(unique > 0,
        s"head generation $g sets no unique bit — a lost directory " +
          "would pass the hash vacuously")
    }
    // The compacted head equals the direct OR-merge (distinct union).
    val direct = heads.reduce(_ union _).distinct()
    val stored = spark.read.parquet(root)
      .filter(col("gen").cast("long") === 2L).select("b")
    assert(stored.exceptAll(direct).isEmpty && direct.exceptAll(stored).isEmpty,
      "compacted head bit set diverged from the direct OR-merge")
    // The OR genuinely arbitrates: head strictly below the per-gen sum
    // (generations share bits the DISTINCT collapses).
    val perGenSum = heads.map(_.count()).sum
    val headN = stored.count()
    assert(headN < perGenSum,
      s"head has $headN bits vs per-gen sum $perGenSum — no generation " +
        "overlap, the OR merge is vacuous (fixture drifted?)")
  }

  test("q435 stream-landed register store: one micro-batch per source file " +
    "(4 batch dirs, each holding registers), compaction leaves {batch_id=2 " +
    "+ marker, batch_id=3}, and the merged registers equal a direct build " +
    "from raw events row for row") {
    val root = java.nio.file.Files
      .createTempDirectory("graft-r17-streamhll").toString
    val proj = Tables.events(spark, sf)
      .select(col("event_type").as("t"), col("user_id"))
    (0 to 3).foreach { g =>
      proj.filter(col("user_id") % 4 === g).coalesce(1)
        .write.mode(if (g == 0) "overwrite" else "append")
        .parquet(s"$root/src")
    }
    queries.Round17.landStreamHllRegisters(
      spark, s"$root/src", s"$root/regs", s"$root/ckpt")
    def dirs = new java.io.File(s"$root/regs").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("batch_id="))
      .map(_.getName).toSet
    assert(dirs === (0 to 3).map(b => s"batch_id=$b").toSet,
      s"expected one landed batch per source file, got $dirs")
    (0 to 3).foreach { b =>
      assert(spark.read.parquet(s"$root/regs/batch_id=$b").count() > 0,
        s"micro-batch $b landed no registers")
    }
    ops.RegisterStore.compact(spark, s"$root/regs", "batch_id", 2L,
      m => m.groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho")))
    assert(dirs === Set("batch_id=2", "batch_id=3"),
      s"compaction left the wrong layout: $dirs")
    assert(new java.io.File(s"$root/regs/batch_id=2/_COMPACTED_2").exists())
    // Stream-landed ∘ compacted ≡ direct from raw, as REGISTERS (not
    // just the estimate): the q413 associativity through the streaming
    // sink and the compactor at once.
    val merged = spark.read.parquet(s"$root/regs")
      .groupBy(col("t"), col("reg")).agg(max(col("rho")).as("rho"))
    val direct = graft.ops.Sketches.hllPortableRegisters(
      proj, Seq("t"), col("user_id"))
    assert(merged.exceptAll(direct).isEmpty && direct.exceptAll(merged).isEmpty,
      "stream-landed registers diverged from the direct build")
    // And the two gate queries over this state agree (q432's batch
    // landing and q435's streamed landing certify the same answer).
    val a = queries.Round17.q435(spark, sf).collect().map(_.toSeq)
    val b = queries.Round17.q432(spark, sf).collect().map(_.toSeq)
    assert(a.toSeq === b.toSeq,
      "streamed-store estimate diverged from the batch-store estimate")
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
