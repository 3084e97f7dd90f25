package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only N× spill/robustness audit (not part of the driver
  * contract): synthesize N×-sf0.1 replica tables (default N=10 under
  * `dev/sf10x/`; the r13 100× tier under `dev/sf100x/` via the 4th
  * arg — `SPARK_DRIVER_MEM=64g … <base> dev/sf100x <subset> 100`),
  * then time the shuffle-heavy operator family at 1× and N× on the
  * SAME frame-parameterized operator cores the queries use.
  * Expectation: at-most-linear degradation (ratio ≤ N), no OOM.
  * Results land in SCALE.md ("100×-of-gate audit" table).
  *
  * Replica construction keeps the audit honest:
  *  - `documents`: replica i is a per-replica BIJECTIVE character
  *    substitution over 'etaoin' (translate with a distinct permutation
  *    per replica). Token equality — and therefore shingle sets, near-dup
  *    structure, gram counts — is preserved WITHIN a replica, while
  *    cross-replica token sets are disjoint wherever any of the six
  *    letters appears (virtually every token). The 10× corpus is thus
  *    ten structure-identical shards with ~zero cross-shard similarity:
  *    linear scaling is the correct expectation, and any superlinear
  *    blowup is the operator's fault, not the data's.
  *  - `lineitem`: replica i offsets l_orderkey by i×10⁸ — per-key group
  *    sizes identical to sf0.1, key cardinality ×10.
  */
object DevScaleAudit {

  private val perms10 = Seq(
    "etaoin", "taoine", "aoinet", "oineta", "inetao", "netaoi",
    "eatoni", "tenaio", "antoie", "otanei")

  /** n distinct bijective 'etaoin' substitutions — the hand list for
    * the historical 10× tier (keeps dev/sf10x bit-stable on disk);
    * lexicographic permutations beyond it (6! = 720 available, so the
    * 100× tier's replicas stay pairwise token-disjoint — two replicas
    * sharing a permutation would plant N cross-replica exact dups and
    * turn every near-dup audit quadratic).
    */
  private def perms(n: Int): Seq[String] =
    if (n <= 10) perms10.take(n)
    else (perms10 ++ "etaoin".permutations.filterNot(perms10.contains))
      .take(n).toSeq

  private def synth(s: SparkSession, base: String, out: String, n: Int): Unit = {
    val docsOut = Paths.get(out, "documents.parquet")
    val liOut = Paths.get(out, "lineitem.parquet")
    val evOut = Paths.get(out, "events.parquet")
    // Guard against silently reusing an out dir synthesized at a
    // DIFFERENT replica factor (results would print under the wrong
    // `${n}×` label): the factor used is pinned in a marker file.
    val marker = Paths.get(out, "FACTOR")
    if (Files.exists(marker)) {
      val recorded = new String(Files.readAllBytes(marker), "UTF-8").trim
      require(recorded == n.toString,
        s"$out was synthesized at factor $recorded, but factor $n was " +
          s"requested — delete $out (or point at a fresh dir) to regenerate")
    } else if (Files.exists(docsOut) || Files.exists(liOut) || Files.exists(evOut)) {
      // Pre-marker dirs: the historical tiers are dev/sf10x (10) and
      // dev/sf100x (100); anything else must be regenerated explicitly.
      val assumed = if (out.contains("100x")) 100 else 10
      require(assumed == n,
        s"$out predates the FACTOR marker and looks like factor $assumed; " +
          s"requested $n — delete the dir to regenerate")
      Files.createDirectories(Paths.get(out))
      Files.write(marker, n.toString.getBytes("UTF-8"))
    } else {
      Files.createDirectories(Paths.get(out))
      Files.write(marker, n.toString.getBytes("UTF-8"))
    }
    if (!(Files.exists(docsOut) && Files.exists(liOut))) {
      Files.createDirectories(Paths.get(out))
      val docs = Tables.table(s, base, "documents")
      val ps = perms(n)
      val docs10 = (0 until n).map { i =>
        docs.select(
          (col("doc_id") + lit(i.toLong * 1000000L)).as("doc_id"),
          translate(col("text"), "etaoin", ps(i)).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionAll _)
      docs10.repartition(32).write.mode("overwrite").parquet(docsOut.toString)
      // l_partkey rides along (offset per replica — the co-order /
      // affinity graphs become 10 structure-identical disjoint shards).
      val li = Tables.table(s, base, "lineitem")
        .select("l_orderkey", "l_partkey", "l_linenumber", "l_quantity",
          "l_extendedprice", "l_shipdate", "l_returnflag")
      val li10 = (0 until n).map { i =>
        li.withColumn("l_orderkey", col("l_orderkey") + lit(i.toLong * 100000000L))
          .withColumn("l_partkey", col("l_partkey") + lit(i.toLong * 10000000L))
      }.reduce(_ unionAll _)
      li10.repartition(32).write.mode("overwrite").parquet(liOut.toString)
    }
    if (!Files.exists(evOut)) {
      Files.createDirectories(Paths.get(out))
      // r9 addition — `events` replicas for the window/funnel/retention
      // family: replica i offsets user_id and event_id; ts and
      // event_type stay put. User cardinality ×10 with per-user
      // journeys identical over the SAME calendar span — at 100 TB an
      // event log grows in users, not in years, so day/cohort frames
      // stay constant while every user-keyed shuffle carries 10×.
      // Written via the raw file (not Tables.events) so the synthetic
      // file keeps the CURRENT driver schema for ts verbatim.
      val ev = s.read.parquet(s"$base/events.parquet")
      val ev10 = (0 until n).map { i =>
        ev.withColumn("user_id", col("user_id") + lit(i.toLong * 100000000L))
          .withColumn("event_id", col("event_id") + lit(i.toLong * 1000000000L))
      }.reduce(_ unionAll _)
      ev10.repartition(32).write.mode("overwrite").parquet(evOut.toString)
    }
    val partOut = Paths.get(out, "part.parquet")
    if (!Files.exists(partOut)) {
      Files.createDirectories(Paths.get(out))
      // part replicas with l_partkey-matching offsets; brands stay 1×,
      // so brand-keyed aggregates see rows ×10 into the SAME groups —
      // the hot-group growth direction.
      val pt = s.read.parquet(s"$base/part.parquet")
        .select("p_partkey", "p_brand")
      val pt10 = (0 until n).map { i =>
        pt.withColumn("p_partkey", col("p_partkey") + lit(i.toLong * 10000000L))
      }.reduce(_ unionAll _)
      pt10.repartition(8).write.mode("overwrite").parquet(partOut.toString)
    }
    val embOut = Paths.get(out, "embeddings.parquet")
    if (!Files.exists(embOut)) {
      Files.createDirectories(Paths.get(out))
      // r9 addition — `embeddings` replicas for the geometry family:
      // replica i offsets vec_id and flips a per-replica sign pattern
      // over the dimensions (norms and label structure preserved,
      // directions distinct across replicas — vector count ×10 with
      // the same per-label geometry).
      val emb = s.read.parquet(s"$base/embeddings.parquet")
      // k%4 reads 4 bits of i (distinct patterns for the 10× tier,
      // preserved bit-stable); n > 10 reads 7 bits so patterns stay
      // distinct through i < 128 — two replicas sharing a pattern
      // would plant cross-replica duplicate DIRECTIONS and corrupt
      // every nearest-neighbor audit.
      val signBits = if (n <= 10) 4 else 7
      val emb10 = (0 until n).map { i =>
        val signs = array((0 until 64).map { k =>
          lit(if (((i >> (k % signBits)) & 1) == 1) -1.0f else 1.0f)
        }: _*)
        emb.select(
          (col("vec_id") + lit(i.toLong * 100000000L)).as("vec_id"),
          zip_with(col("embedding"), signs, (x, sg) => x * sg).as("embedding"),
          col("label"))
      }.reduce(_ unionAll _)
      emb10.repartition(32).write.mode("overwrite").parquet(embOut.toString)
    }
    val ordOut = Paths.get(out, "orders.parquet")
    val custOut = Paths.get(out, "customer.parquet")
    if (!(Files.exists(ordOut) && Files.exists(custOut))) {
      Files.createDirectories(Paths.get(out))
      // r10 addition — orders/customer replicas for the inequality
      // family (q332/q339): customers ×10 with per-customer order
      // baskets preserved, so each segment's rank-window partition
      // carries 10× rows — the window-skew growth direction.
      val ord = s.read.parquet(s"$base/orders.parquet")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
          "o_orderpriority", "o_orderstatus")
      val ord10 = (0 until n).map { i =>
        ord.withColumn("o_orderkey", col("o_orderkey") + lit(i.toLong * 100000000L))
          .withColumn("o_custkey", col("o_custkey") + lit(i.toLong * 10000000L))
      }.reduce(_ unionAll _)
      ord10.repartition(16).write.mode("overwrite").parquet(ordOut.toString)
      val cust = s.read.parquet(s"$base/customer.parquet")
        .select("c_custkey", "c_mktsegment", "c_nationkey", "c_acctbal")
      val cust10 = (0 until n).map { i =>
        cust.withColumn("c_custkey", col("c_custkey") + lit(i.toLong * 10000000L))
      }.reduce(_ unionAll _)
      cust10.repartition(8).write.mode("overwrite").parquet(custOut.toString)
    }
    // r14 — healthcare CSV at 50k·factor rows (the commissioned-DAG
    // end-to-end audit, r13 verdict item 4): same generator as the
    // gate fixture, streamed to disk.
    val hcOut = Paths.get(out, "healthcare.csv")
    if (!Files.exists(hcOut))
      pipeline.HealthcareFixture.writeLarge(hcOut.toString, 50000 * n)
  }

  /** Recursive delete for per-run pipeline output dirs (the pipe_*
    * rows re-run the whole DAG per timed evaluation; leaving 100×
    * outputs behind would fill the disk across runs).
    */
  private def rmTree(p: java.nio.file.Path): Unit = StorePaths.deleteTree(p)

  private def time(name: String, runs: Int)(df: => DataFrame): Double = {
    val ts = (1 to runs).map { i =>
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[audit] $name run$i $dt%.2f s")
      dt
    }
    ts.min
  }

  def main(args: Array[String]): Unit = {
    val base = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = if (args.length > 1) args(1) else "dev/sf10x"
    val runs = sys.env.getOrElse("GRAFT_AUDIT_RUNS", "2").toInt
    // optional 4th arg: replica factor (default 10; the r12-verdict
    // 100× tier runs `… dev/sf100x <subset> 100` with
    // SPARK_DRIVER_MEM=64g — ~60M-row lineitem in the 128 GiB sandbox)
    val factor = if (args.length > 3) args(3).toInt else 10
    // r18: honor SPARK_GRAFT_CPUS so the VERDICT-r17 scaling tier
    // (8-vs-32 cores at 10×/100× data, where the ratios should
    // separate) runs through the same audit harness.
    val spark = Engine.session(
      cores = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"),
      appName = "graft-scale-audit")
    synth(spark, base, out, factor)
    // 1× healthcare CSV (the base dir is read-only): 50k rows, the
    // pipe_healthcare row's 1× input.
    val hc1x = Paths.get("dev/healthcare1x/healthcare.csv")
    if (!Files.exists(hc1x))
      pipeline.HealthcareFixture.writeLarge(hc1x.toString, 50000)

    def docsOf(dir: String) =
      Tables.table(spark, dir, "documents").select("doc_id", "text")
    def liOf(dir: String) = Tables.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    // The shared bipartite audit graph (order nodes even, the
    // quantity×10+linenumber value grid odd) — pagerank3/hits2's frame,
    // factored out for the r14 graph-family rows.
    def liGraph(dir: String) = liOf(dir).select(
      (col("l_orderkey") * 2).as("src"),
      ((col("l_quantity").cast("long") * 10 + col("l_linenumber")) * 2 + 1).as("dst"))
    // Per-dir cold-rank store for the graph_rank_warm row: run 1 pays
    // the 3-round cold build + write; later runs time the warm round.
    val rankStoreMemo = scala.collection.concurrent.TrieMap.empty[String, String]
    // Per-dir re-quantized IVF store for the ivf_requant_probe row.
    val requantMemo = scala.collection.concurrent.TrieMap.empty[String, String]
    // Per-dir 90%-corpus requant store for the ivf_append_batch row.
    val requantApMemo = scala.collection.concurrent.TrieMap.empty[String, String]
    def embUnit(dir: String) = ext.Similarity.withUnitVec(
      spark.read.parquet(s"$dir/embeddings.parquet"), "embedding", "u")
      .select("vec_id", "u")

    // Full-corpus CC (no doc_id<1000 subset): simhash bands over every
    // doc, min-label components at the session's production shuffle
    // width (the q102 4-partition scope is a small-subset tuning).
    def ccFull(dir: String): DataFrame = {
      val d = docsOf(dir)
      val pairs = ext.Dedup.simhashBandPairs(
        ext.Dedup.simhashN(d, col("doc_id"), col("text"), bits = 60),
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      ext.Components.connectedComponents(
        d.select(col("doc_id").as("id")), pairs)
    }
    // r16 — the INCREMENTAL form of ccFull at full corpus scale (the
    // q415 mechanism without its probe bound): the even half's
    // fingerprints + labeling persisted once per dir (run 1 — the
    // "yesterday" job); later runs fingerprint only the odd half,
    // band-join it against the stored fingerprints, add the label
    // store's star edges, and run the warm loop. min-of-runs therefore
    // records the steady-state nightly cost, to be read against
    // cc_simhash_full's cold restart on the same tier.
    // `mod` sets the old/new split: new = (doc_id % mod == mod-1), so
    // mod=2 is q415's adversarial 50/50 parity split and mod=10 the
    // production-like 10% daily batch against a 90% store.
    val ccStoreMemo = scala.collection.concurrent.TrieMap.empty[(String, Int), String]
    def ccWarmFull(dir: String, mod: Int): DataFrame = {
      val store = ccStoreMemo.getOrElseUpdate((dir, mod), {
        val p = Files.createTempDirectory("graft-ccstore-audit").toString
        val old = docsOf(dir).filter(col("doc_id") % mod =!= (mod - 1))
        val fp = ext.Dedup.simhashN(old, col("doc_id"), col("text"), bits = 60)
          .localCheckpoint(true)
        fp.write.mode("overwrite").parquet(s"$p/sigs")
        val pairs = ext.Dedup.simhashBandPairs(fp,
          bits = 60, bands = 4, maxHamming = 2)
          .select(col("id_a").as("src"), col("id_b").as("dst"))
        ext.Components.connectedComponents(
          old.select(col("doc_id").as("id")), pairs)
          .write.mode("overwrite").parquet(s"$p/labels")
        p
      })
      val newFp = ext.Dedup.simhashN(
        docsOf(dir).filter(col("doc_id") % mod === (mod - 1)),
        col("doc_id"), col("text"), bits = 60).localCheckpoint(true)
      val labels = spark.read.parquet(s"$store/labels")
      val newNew = ext.Dedup.simhashBandPairs(newFp,
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val newOld = ext.Dedup.simhashBandJoin(newFp,
        spark.read.parquet(s"$store/sigs"),
        bits = 60, bands = 4, maxHamming = 2)
        .select(col("id_a").as("src"), col("id_b").as("dst"))
      val star = labels.filter(col("comp") =!= col("id"))
        .select(col("comp").as("src"), col("id").as("dst"))
      ext.Components.connectedComponentsWarm(
        docsOf(dir).select(col("doc_id").as("id")),
        newNew.union(newOld).union(star), initial = labels)
    }

    val suite: Seq[(String, String => DataFrame)] = Seq(
      "cc_simhash_full" -> (dir => ccFull(dir)),
      "cc_warm_full" -> (dir => ccWarmFull(dir, 2)),
      // The production split: a 10% incoming batch against a 90%
      // store — the fingerprint + banding saving the incremental path
      // exists for (the 50/50 row above is the adversarial bound).
      "cc_warm_batch" -> (dir => ccWarmFull(dir, 10)),
      // r16 — the two r15 store families that had only by-construction
      // scale arguments (r15 verdict item 5). cms_store_read: the store
      // is ≤ 30 days × 4×16 cells at ANY corpus size and the probe set
      // is a replica-0 literal — expect the ev_store_read flat profile
      // (run 1 pays the events scan + landing). ivf_store_probe: the
      // probed CELLS' row count grows with the corpus (ncells is fixed
      // at the 10 labels), so the honest expectation is ~linear in
      // corpus/ncells — the store's saving is the pruned fraction
      // (probed/All cells at the file listing), not a census bound;
      // production re-sizes ncells with the corpus.
      "ivf_store_probe" -> (dir => SparkEntry.queries("q422_ivf_store_probe")(spark, dir)),
      // r17 — the √N RE-QUANTIZED probe beside the fixed-10-cell row
      // above (r16 verdict item 1): run 1 pays the quantizer re-fit +
      // re-landing (the periodic maintenance job this row exists to
      // justify); min-of-runs records the steady-state probe, which
      // touches nprobe·√N rows instead of nprobe·N/10 — the flat
      // profile the fixed-ncells store measurably lacks.
      "ivf_requant_probe" -> { dir =>
        val root = requantMemo.getOrElseUpdate(dir, {
          val p = Files.createTempDirectory("graft-ivfrq-audit").toString
          ext.Similarity.requantizeIvf(embUnit(dir), p)
          p
        })
        ext.Similarity.ivfRequantProbe(
          embUnit(dir).filter(col("vec_id") < 5), root)
      },
      // r17 — the APPEND leg of the re-quantized store (q434's
      // mechanism at audit scale): run 1 pays the full re-quantization
      // on the 90% "yesterday" corpus; later runs time the steady-state
      // nightly job — assign the 10% batch against the frozen ≤√N
      // centroid read and append its files into the grp partitions.
      // Repeated runs re-append the same batch (duplicate vec_ids are
      // harmless for timing); expectation: batch-sized, far below the
      // re-size cost the requant memo's run 1 records.
      "ivf_append_batch" -> { dir =>
        import spark.implicits._
        val root = requantApMemo.getOrElseUpdate(dir, {
          val p = Files.createTempDirectory("graft-ivfap-audit").toString
          ext.Similarity.requantizeIvf(
            embUnit(dir).filter(col("vec_id") % 10 =!= 9), p)
          p
        })
        ext.Similarity.appendToRequantStore(
          embUnit(dir).filter(col("vec_id") % 10 === 9), root)
        Seq(1L).toDF("done")
      },
      "cms_store_read" -> (dir => SparkEntry.queries("q423_cms_store_probe")(spark, dir)),
      "dup_ngram_frac" -> (dir => ext.TextAnalysis.dupNgramFraction(docsOf(dir))),
      "minhash_lsh" -> (dir => ext.Dedup.minhashLshPairs(docsOf(dir))),
      "salted_dedup" -> (dir => graft.ops.dedupFirstWinsSalted(
        liOf(dir), Seq("l_orderkey"),
        Seq(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")),
        buckets = 8)),
      // r7 additions: the two new shuffle-heavy cores. Segment dedup
      // shuffles every segment hash; pagerank contracts a lineitem-
      // derived bipartite graph (order nodes ×10 at 10×, the popular
      // side fixed — the skew-growth direction).
      "segment_dedup" -> (dir => ext.Dedup.segmentDedup(
        docsOf(dir), col("doc_id"), col("text"))),
      "pagerank3" -> (dir => ext.Components.pageRank(liGraph(dir), iterations = 3)),
      // r7 continuation: the graph-analytics cores. HITS shares the
      // bipartite frame above (node count ×10 on the order side, the
      // popular item side fixed); triangles run over the simhash
      // candidate pair graph — shard-disjoint replicas, so candidate
      // volume (and wedge volume) scales linearly by construction.
      "hits2" -> (dir => ext.Graph.hits(liGraph(dir), iterations = 2)),
      "tri_simhash" -> { dir =>
        val d = docsOf(dir)
        ext.Graph.triangleCounts(
          ext.Dedup.simhashBandPairs(
            ext.Dedup.simhashN(d, col("doc_id"), col("text"), bits = 60),
            bits = 60, bands = 4, maxHamming = 2)
            .select(col("id_a").as("src"), col("id_b").as("dst")))
      },
      // r9 additions: the event-window family, straight through the
      // declared registry entries (they take a dir). User-keyed
      // windows/sessionization shuffle 10× users; the day/cohort/step
      // frames the windows ride are calendar-sized and stay constant.
      "ev_rolling_wau" -> (dir => SparkEntry.queries("q113_rolling_wau")(spark, dir)),
      "ev_funnel" -> (dir => SparkEntry.queries("q115_funnel")(spark, dir)),
      "ev_retention" -> (dir => SparkEntry.queries("q116_retention")(spark, dir)),
      "ev_attribution" -> (dir => SparkEntry.queries("q190_attribution")(spark, dir)),
      // r9 continuation: the text-ranking/selection family through the
      // declared registry entries. The translated replicas grow the
      // vocabulary ~10× along with docs ×10 (the corpus-growth
      // direction): tf/df shuffles carry 10× (doc,term) pairs, while
      // the DSIR weight frame stays B-bounded by construction.
      "txt_tfidf" -> (dir => SparkEntry.queries("q106_tfidf")(spark, dir)),
      "txt_bm25" -> (dir => SparkEntry.queries("q126_bm25")(spark, dir)),
      "sel_dsir_weights" -> (dir => SparkEntry.queries("q227_dsir_weights")(spark, dir)),
      "sel_dsir_select" -> (dir => SparkEntry.queries("q228_dsir_select")(spark, dir)),
      // r9 late additions — the three NEW shuffle shapes of the
      // q269-q283 batch: the user-keyed set self-join (per-user types²
      // fan-out; users ×10), the word-keyed source-pair join (vocab
      // ×10 with the replicas' disjoint alphabets, sources fixed), and
      // the user-keyed max-struct journey rollup (users ×10, no
      // window). Everything else in the batch rides already-audited
      // cores (segment hash shuffle, type×day/hour grids, top-k).
      "ev_audience" -> (dir => SparkEntry.queries("q279_audience_overlap")(spark, dir)),
      "txt_source_cosine" -> (dir => SparkEntry.queries("q281_source_cosine")(spark, dir)),
      "ev_journey_end" -> (dir => SparkEntry.queries("q282_journey_end")(spark, dir)),
      // r9 final batch — the q301-q316 shuffle shapes. ahash bands the
      // digest bits (candidates bucket-local, docs ×10 disjoint
      // shards); textrank's vocab grows ~10× with the translated
      // replicas; LPA rides the support-2 affinity graph (shard-
      // disjoint, edges ×10; timed via the UNCACHED body so the
      // session memo can't hide the cost); kruskal collapses to the
      // length value grid (value cardinality ~fixed, counts ×10);
      // theil-sen rides the fixed calendar grid (pair join constant,
      // only the first agg scans ×10); kcenter/silhouette/covcells
      // are k·O(N), N·L, and d²-moment passes over vectors ×10.
      "txt_ahash" -> (dir => SparkEntry.queries("q306_ahash_neardup")(spark, dir)),
      // r18 (verdict item 8): the r17 winsorized rewrite (value-
      // collapsed cumulative census) gets its own 100×-tier row.
      "ord_winsorized" -> (dir => SparkEntry.queries("q238_winsorized")(spark, dir)),
      "txt_textrank" -> (dir => SparkEntry.queries("q308_textrank")(spark, dir)),
      "graph_lpa" -> (dir => ext.Graph.lpaLabelsFresh(spark, dir)
        .groupBy(col("lbl")).agg(count(lit(1)).as("n_nodes"))),
      "doc_kruskal" -> (dir => SparkEntry.queries("q302_kruskal_wallis")(spark, dir)),
      "ev_theil_sen" -> (dir => SparkEntry.queries("q301_theil_sen")(spark, dir)),
      "emb_kcenter" -> (dir => SparkEntry.queries("q311_kcenter_coreset")(spark, dir)),
      "emb_silhouette" -> (dir => SparkEntry.queries("q316_silhouette")(spark, dir)),
      "emb_covcells" -> (dir => ext.Similarity.covCellsFresh(spark, dir)
        .groupBy().agg(sum(col("c")).as("s"))),
      // r9 closing batch — the q324-q330 shapes that touch a shuffle:
      // the per-row ln-grid brand OLS (lineitem ×10 via key-offset
      // replicas; NOTE the replica part join keeps only 1× brands so
      // the moment frame stays brand-bounded) and the session-funnel
      // step chain (user-keyed session window + two (user, sess)
      // joins; users ×10). The rest of the batch is map-side or
      // rides already-audited cores.
      "ev_session_funnel" -> (dir => SparkEntry.queries("q329_session_funnel")(spark, dir)),
      "ev_conv_windows" -> (dir => SparkEntry.queries("q327_conversion_windows")(spark, dir)),
      "li_elasticity" -> (dir => SparkEntry.queries("q328_price_elasticity")(spark, dir)),
      // r10 addition — the q289 production byte-scan CDC chunker (the
      // r9 verdict's weak-posture fix): corpus-bytes of digest work
      // map-side, ~bytes/16 chunk rows on the census shuffle.
      "cdc_byte_scan" -> (dir => SparkEntry.queries("q289_cdc_chunks")(spark, dir)),
      // r10 statistics batch — the members that touch a non-trivial
      // shuffle: doc-keyed run windows (q336), the sources×50
      // stylometry grid off the corpus tf collapse (q337), the
      // customer-dimension rank window (q332).
      "txt_degen_runs" -> (dir => SparkEntry.queries("q336_degeneration_runs")(spark, dir)),
      "txt_burrows" -> (dir => SparkEntry.queries("q337_burrows_delta")(spark, dir)),
      "li_gini" -> (dir => SparkEntry.queries("q332_gini_concentration")(spark, dir)),
      // r11 — the q348-q355 shapes (the r10 verdict's audit gap):
      // the daily prefix-scan break (orders ×10 into the SAME
      // calendar grid — q348's one-pass F scan must stay grid-sized),
      // the user-keyed first-occurrence pair table (users ×10, the
      // |types|²-per-user bound), the 4-threshold session explode
      // (users ×10 — the verdict's explicitly-named 4× explode), the
      // year-pair brand rank shift (lineitem ×10 into 1× brands), and
      // the fixed-probe embedding diagnostics (corpus ×10 against
      // CONSTANT probe budgets: 50 for q353, 200 for q354 — the r10
      // scale-killer fix under measurement). q351 is a pure map-side
      // dose collapse (no audit row needed); q355 is probe-set-scoped
      // by contract (doc_id < 1000) so its 10× cost is label-memo
      // recomputation, included to pin exactly that.
      "ord_chow" -> (dir => SparkEntry.queries("q348_chow_break")(spark, dir)),
      "ev_precedence" -> (dir => SparkEntry.queries("q349_subseq_support")(spark, dir)),
      "ev_session_curve" -> (dir => SparkEntry.queries("q350_session_curve")(spark, dir)),
      "li_rbo" -> (dir => SparkEntry.queries("q352_rbo_rankshift")(spark, dir)),
      "emb_matryoshka" -> (dir => SparkEntry.queries("q353_matryoshka_recall")(spark, dir)),
      "emb_hubness" -> (dir => SparkEntry.queries("q354_hubness")(spark, dir)),
      "doc_optout" -> (dir => SparkEntry.queries("q355_optout_closure")(spark, dir)),
      // r11 second batch — the q356-q367 shapes that touch a shuffle
      // or scan the corpus: fixed-probe LID (50×N dots, corpus ×10),
      // the IVF centroid pass (corpus scan → labels×64 collapse; at
      // 10× labels stay 1× so centroid groups carry 10× rows), the
      // cohort LTV custkey/cohort aggs (customers ×10 into the SAME
      // calendar triangle), the ABC-XYZ part rank window (parts ×10),
      // the (cust, band) blocking self-join (customers ×10, per-block
      // sizes preserved), the three-pass Grubbs grid scan (orders
      // ×10 into the fixed calendar), and the rich-club degree joins
      // on the co-order graph (shard-disjoint edges ×10). q357 is a
      // constant 64² probe frame; q359-q361 share q362's grid shape.
      "emb_lid" -> (dir => SparkEntry.queries("q356_lid_mle")(spark, dir)),
      "emb_ivf_curve" -> (dir => SparkEntry.queries("q358_ivf_probe_curve")(spark, dir)),
      "ord_cohort_ltv" -> (dir => SparkEntry.queries("q363_cohort_ltv")(spark, dir)),
      "li_abc_xyz" -> (dir => SparkEntry.queries("q364_abc_xyz")(spark, dir)),
      "ord_dup_invoices" -> (dir => SparkEntry.queries("q365_dup_invoices")(spark, dir)),
      "ord_grubbs" -> (dir => SparkEntry.queries("q362_grubbs_scan")(spark, dir)),
      "graph_rich_club" -> (dir => SparkEntry.queries("q367_rich_club")(spark, dir)),
      // r11 third batch — the q368-q372 shapes with a data-sized
      // stage: the per-budget source-keyed packing window (docs ×10),
      // the md5 keep-first dedup ledger (docs ×10, vocab-disjoint
      // replicas so group sizes are preserved), and the QI-grid
      // t-closeness build (customers ×10 into the bounded grid).
      // q369/q372 are map-side collapses to source/shard frames.
      "doc_packing_curve" -> (dir => SparkEntry.queries("q368_packing_curve")(spark, dir)),
      "txt_dedup_savings" -> (dir => SparkEntry.queries("q371_dedup_savings")(spark, dir)),
      "cust_tcloseness" -> (dir => SparkEntry.queries("q370_t_closeness")(spark, dir)),
      // r11 fourth batch — q373-q377 shapes with a data-sized stage:
      // the user-day basket pair join (users ×10, types fixed), the
      // 3× chunk-hash distinct (docs ×10, replica-disjoint chunks),
      // and the customer-decile rank window (customers ×10 — the
      // q287-caveat window class beside li_abc_xyz). q373 rides the
      // audited ev lag-window family; q377 the audited tf collapse.
      "ev_event_pmi" -> (dir => SparkEntry.queries("q375_event_pmi")(spark, dir)),
      "doc_chunk_curve" -> (dir => SparkEntry.queries("q374_chunk_dedup_curve")(spark, dir)),
      "ord_lorenz" -> (dir => SparkEntry.queries("q376_lorenz_curve")(spark, dir)),
      // r11 fifth batch — the HDR register census (orders ×10 into a
      // ~220-row register file) and the part-year price-index collapse
      // (lineitem ×10 into part-keyed frames). q380 is map-side.
      "ord_hdr" -> (dir => SparkEntry.queries("q378_hdr_quantiles")(spark, dir)),
      "li_price_index" -> (dir => SparkEntry.queries("q379_price_index")(spark, dir)),
      // r11 sixth batch — q381's value-collapsed census window under
      // docs ×10 (q382/q383 are pure map-side collapses, no rows).
      "doc_conformal" -> (dir => SparkEntry.queries("q381_conformal_coverage")(spark, dir)),
      // r12 batch — the TwoPhase showcases under 10×: the user-
      // dimension concentration rank (users ×10), the per-source
      // double Spearman rank (docs ×10), and the two-pass exact
      // median/MAD (orders ×10 — TWO full TwoPhase passes, the
      // heaviest possible use of the shared core). The TPC-H shapes
      // (q384-q387) ride the already-audited fact-join family; q391
      // is a map-side digit census.
      "ev_concentration" -> (dir => SparkEntry.queries("q388_event_concentration")(spark, dir)),
      "doc_spearman" -> (dir => SparkEntry.queries("q389_quality_len_spearman")(spark, dir)),
      "ord_median_mad" -> (dir => SparkEntry.queries("q390_median_mad")(spark, dir)),
      // r12 second batch — the corpus-sized curation shapes: bottom-k
      // per-source sampling (docs ×10), the KMV shingle-distinct
      // sketch (shingle explode ×10, replica-disjoint), the
      // corpus-wide per-doc NLL outlier census (the LM join at full
      // corpus — q125 is capped at 1000 docs, this is not), and the
      // daily retention triangle (users ×10 into the fixed calendar).
      "doc_bottomk" -> (dir => SparkEntry.queries("q392_bottomk_estimate")(spark, dir)),
      "doc_kmv" -> (dir => SparkEntry.queries("q393_kmv_distinct")(spark, dir)),
      "doc_nll_outliers" -> (dir => SparkEntry.queries("q394_nll_outliers")(spark, dir)),
      "ev_retention_tri" -> (dir => SparkEntry.queries("q395_retention_triangle")(spark, dir)),
      // r12 third batch — the knn(k) degree-slot joins (edges ×10,
      // shard-disjoint), the (user, type)-keyed burstiness lag (users
      // ×10), and the per-dim isotropy collapse (vectors ×10 into 1×
      // labels × 64 dims). q397 rides the audited fact-join family.
      "graph_knn_curve" -> (dir => SparkEntry.queries("q396_avg_neighbor_degree")(spark, dir)),
      "ev_burstiness" -> (dir => SparkEntry.queries("q398_event_burstiness")(spark, dir)),
      "emb_isotropy" -> (dir => SparkEntry.queries("q399_isotropy")(spark, dir)),
      // r12: q191 moved from three single-task ntile sorts to
      // TwoPhase.rankMulti — the small-scale constant rose (~0.6 →
      // ~1.3 s at sf0.1, three distributed sorts + broadcast joins);
      // this row documents the flat scaling that buys.
      "ord_rfm" -> (dir => SparkEntry.queries("q191_rfm_segments")(spark, dir)),
      // r12 fourth batch — the decontam threshold curve (train grams
      // ×10 against the broadcast eval set), the band-candidate
      // source matrix (q107's bounded candidates + dimension joins),
      // and the DAU/WAU/MAU coverage fan (user-days ×10, 30× bounded
      // explode of the COLLAPSED frame, never of events).
      "doc_decontam_curve" -> (dir => SparkEntry.queries("q401_decontam_curve")(spark, dir)),
      "doc_leakage_matrix" -> (dir => SparkEntry.queries("q402_source_leakage")(spark, dir)),
      "ev_dau_mau" -> (dir => SparkEntry.queries("q403_dau_mau")(spark, dir)),
      // r12 closing pair — the half-split TwoPhase decile ranks under
      // users ×10 (q405 is a map-side 24×types grid, no row).
      "ev_persistence" -> (dir => SparkEntry.queries("q404_top_decile_persistence")(spark, dir)),
      // r13 — the HLL register-merge swap for ev_dau_mau: the rolling
      // fan rides ≤256-row/day register files, so only the map-side ud
      // collapse (and the kept-for-error exact side) should scale.
      "ev_dau_mau_hll" -> (dir => SparkEntry.queries("q406_dau_mau_hll")(spark, dir)),
      // r13 — the sketch-ONLY form (no kept-for-error exact fan): the
      // scaling a production deployment actually pays for rolling
      // distinct actives. Compare against ev_dau_mau (exact path).
      "ev_dau_mau_hll_pure" -> (dir => graft.queries.Round13.q406SketchOnly(spark, dir)),
      // r13 — the overlap I-E sibling: register merges are census-
      // sized; the kept-for-error exact side is the (day, user) pair
      // self-join, the data-sized stage this row watches.
      "ev_overlap_hll" -> (dir => SparkEntry.queries("q407_audience_overlap_hll")(spark, dir)),
      // r13 — grouped HDR gap census: the (user, type) lag + the
      // event-sized checkpointed gap frame are the data-sized stages;
      // the census and every window below are types×~280 rows.
      "ev_gap_tails" -> (dir => SparkEntry.queries("q409_gap_tail_quantiles")(spark, dir)),
      // r13 — rows the 100×-tier brief names that had no entry yet:
      // the remaining TwoPhase adopter (q287), the two gram shuffles
      // not already covered by dup_ngram_frac (q158 novelty, q300
      // scorecard), the events Apriori (user-day baskets ×N into
      // fixed |types|³), and link prediction (endpoint-bounded — the
      // probe discipline should hold its volume CONSTANT across
      // tiers; this row measures exactly that).
      "li_abc_class" -> (dir => SparkEntry.queries("q287_abc_class")(spark, dir)),
      "txt_gram_novelty" -> (dir => SparkEntry.queries("q158_gram_novelty")(spark, dir)),
      "doc_scorecard" -> (dir => SparkEntry.queries("q300_health_scorecard")(spark, dir)),
      "ev_triple_itemsets" -> (dir => SparkEntry.queries("q318_triple_itemsets")(spark, dir)),
      "graph_link_predict" -> (dir => SparkEntry.queries("q153_link_predict")(spark, dir)),
      // r14 — the REST of the iterative-graph family (r13 verdict item
      // 1: pagerank3 was the only power-iteration shape with a 100×
      // row). All run the library CORES directly on the same
      // lineitem-derived bipartite frame as pagerank3/hits2 (order
      // nodes ×N, the ~350-value popular side fixed — the skew-growth
      // direction), bypassing the per-(session,dir) edge memos the
      // registry queries use so repeated timing runs stay honest.
      "pagerank3_personal" -> (dir => ext.Components.pageRankPersonalized(
        liGraph(dir), isSeed = _ % 97 === 0, iterations = 3)),
      "pagerank3_weighted" -> (dir => ext.Components.pageRankWeighted(
        liOf(dir).select(
          (col("l_orderkey") * 2).as("src"),
          ((col("l_quantity").cast("long") * 10 + col("l_linenumber")) * 2 + 1).as("dst"),
          col("l_quantity").cast("double").as("w")),
        iterations = 3)),
      "graph_seed_bfs" -> (dir => ext.Graph.seedDistance(
        liGraph(dir), isSeed = _ % 97 === 0, maxDepth = 4)),
      "graph_kcore" -> (dir => ext.Graph.kCore(liGraph(dir), k = 5, maxIter = 40)),
      // r14 — the persisted-store lifecycle rows. The per-session
      // memo makes run 1 pay the store WRITE (the one data-sized
      // scan); min-of-3 therefore records the steady-state READ path:
      // q411 answers DAU+overlap from pruned register files (flat by
      // construction), q414 pays ONE warm PageRank round off the rank
      // store vs pagerank3's three cold rounds — the incremental
      // claim, priced directly.
      "ev_store_read" -> (dir => SparkEntry.queries("q411_store_dau_overlap")(spark, dir)),
      // r15 — the histogram-register store (q419): run 1 pays the one
      // orders scan + store write; min-of-N records the census-sized
      // store-read path, which must hold the ev_store_read flat
      // profile (nothing rescans orders).
      "hist_store_read" -> (dir =>
        SparkEntry.queries("q419_hist_store_quantiles")(spark, dir)),
      // Warm PageRank on the audit's own bipartite frame (the replica
      // lineitem has no l_suppkey, so the registered q414 graph can't
      // be derived here; the mechanism under measurement is identical).
      "graph_rank_warm" -> { dir =>
        // Run 1 pays BOTH store writes (ranks + prepared edges); later
        // runs time the steady-state warm path: two store reads + one
        // marginal round, no edge rebuild (r14 verdict item 2).
        val store = rankStoreMemo.getOrElseUpdate(dir, {
          val p = Files.createTempDirectory("graft-rankstore-audit").toString
          ext.Components.pageRank(liGraph(dir), iterations = 3)
            .write.mode("overwrite").parquet(s"$p/ranks")
          val tbl = "graft_audit_prep_" +
            dir.replaceAll("[^A-Za-z0-9]", "_").toLowerCase
          ext.Components.persistPreparedEdges(liGraph(dir), tbl,
            s"$p/edges", buckets = 32)
          s"$p/ranks|$tbl"
        })
        val Array(ranks, tbl) = store.split('|')
        ext.Components.pageRankWarmPrepared(spark.table(tbl),
          spark.read.parquet(ranks), iterations = 1)
      },
      // r14 — the two commissioned DAGs end-to-end (r13 verdict item
      // 4): each timed evaluation runs the WHOLE pipeline (reads,
      // counts, writes — real sinks, deleted after metrics are taken)
      // and returns a 1-row metrics frame for the noop force. The 1×
      // healthcare CSV lives outside the read-only base dir.
      "pipe_healthcare" -> { dir =>
        import spark.implicits._
        val csv =
          if (dir == base) "dev/healthcare1x/healthcare.csv"
          else s"$dir/healthcare.csv"
        val outDir = Files.createTempDirectory("graft-hc-audit")
        val m = pipeline.Healthcare.run(spark, pipeline.PipelineConfig(
          csv, outDir.toString, overwrite = true,
          logDir = s"$outDir/logs"))
        rmTree(outDir)
        Seq((m.inputRows, m.afterDedupRows, m.patientsTotal, m.admissionsTotal))
          .toDF("input", "after_dedup", "patients", "admissions")
      },
      "pipe_corpus" -> { dir =>
        import spark.implicits._
        val outDir = Files.createTempDirectory("graft-corpus-audit")
        val m = pipeline.Corpus.run(spark, pipeline.CorpusConfig(
          inDir = dir, outPath = s"$outDir/clean"))
        rmTree(outDir)
        Seq((m.input, m.written, m.nearDupDocsDropped, m.chunksWritten, m.packs))
          .toDF("input", "written", "neardup_dropped", "chunks", "packs")
      },
    )

    // optional 3rd arg: comma-separated name-prefix subset (fast iteration)
    val only = if (args.length > 2) Some(args(2).split(",").toSeq) else None
    val picked = suite.filter { case (name, _) =>
      only.forall(_.exists(name.startsWith))
    }
    val rows = picked.map { case (name, fn) =>
      val t1 = time(s"$name@1x", runs)(fn(base))
      val tN = time(s"$name@${factor}x", runs)(fn(out))
      (name, t1, tN, tN / t1)
    }
    println(s"| operator | 1× (s) | ${factor}× (s) | ratio |")
    println("|---|---|---|---|")
    rows.foreach { case (n, a, b, r) =>
      println(f"| $n | $a%.2f | $b%.2f | $r%.1f× |")
    }
    spark.stop()
  }
}
