package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Physical-plan audit: the properties that make these plans survive a
  * 100× scale-up, asserted so a regression (lost pushdown, a cartesian
  * product, a forced broadcast, a global sort where top-k suffices)
  * fails CI rather than a future benchmark.
  */
class PlanAuditSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  /** Every registered query's pre-AQE physical plan, built once and
    * shared by the registry-wide nets (BNL build-side bound, global
    * window) — constructing 380+ plans is the dominant cost of those
    * tests, not the assertions.
    */
  private lazy val allSparkPlans
      : Seq[(String, org.apache.spark.sql.execution.SparkPlan)] =
    SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      name -> fn(spark, sf).queryExecution.sparkPlan
    }

  private def plan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  /** Plan after AQE finalization (run the query, then inspect). */
  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan.toString
      case p => p.toString
    }
  }

  test("q16 agg battery: shipdate filter reaches the parquet scan") {
    val p = plan("q16_agg_battery")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q16 scans only the columns it needs") {
    val p = plan("q16_agg_battery")
    // ReadSchema must not include unused wide columns
    assert(!p.contains("l_comment") && !p.contains("l_partkey"), p)
  }

  test("q19 top-k compiles to TakeOrderedAndProject, not a global sort") {
    val p = plan("q19_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q11 join: AQE chooses the strategy (no forced broadcast), equi-join only") {
    val p = finalPlan("q11_join_fact_dim")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("Join"), p)
  }

  test("no declared query plans a cartesian product (except the brute-force knn)") {
    val exempt = Set("q60_knn_brute") // all-pairs is that query's contract
    SparkEntry.queries.keys.filterNot(exempt).foreach { name =>
      val p = plan(name)
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("q23 custom TitleCase expression runs inside whole-stage codegen") {
    // AQE plan strings hide codegen stages; inspect the generated Java
    // instead — the static call proves the expression is INSIDE a
    // generated stage, not a fallback eval.
    // AQE wraps stages in a way codegenString does not traverse; turn it
    // off for this one plan inspection.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q23_titlecase_expr")(spark, sf)
      val gen = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      assert(gen.contains("graft.ops.TitleCaseUtil.titleCase"), gen.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q60 native dot_product appears in the plan (no interpreted lambdas)") {
    val p = plan("q60_knn_brute")
    assert(p.contains("dot_product"), p)
    assert(!p.contains("aggregate(zip_with"), p)
  }

  test("q29 hint produces a SortMergeJoin (the beyond-broadcast plan)") {
    val p = finalPlan("q29_sort_merge_join")
    assert(p.contains("SortMergeJoin"), p)
  }

  test("q26 agg-based dedup partially aggregates (no window sort of the input)") {
    val p = plan("q26_first_wins_agg")
    assert(p.contains("HashAggregate") || p.contains("SortAggregate"), p)
    assert(!p.contains("RunningWindowFunction") && !p.contains("Window "), p)
  }

  test("q09 first-wins dedup shuffles once on the key") {
    val df = SparkEntry.queries("q09_first_wins_dedup")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // one exchange for the window partition, one for the final ORDER BY —
    // nothing else (no accidental extra repartitions)
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.length <= 2, exec.toString)
  }

  test("q70 pushes both dimension predicates down to the parquet scans") {
    val p = plan("q70_part_supplier_join")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate") && p.contains("p_size"), p)
  }

  test("q68 range join plans as an equi-join on the bucket, not a nested loop") {
    val p = finalPlan("q68_range_join")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q66 bounded probe: the vec_id cap reaches the parquet scan") {
    val p = plan("q66_embedding_neardup")
    assert(p.contains("LessThan(vec_id,1000)"), p)
  }

  test("q33 pivot with an explicit value list scans the source exactly once") {
    // an unlisted pivot would add a distinct value-discovery job first
    val p = plan("q33_pivot")
    assert("FileScan|BatchScan".r.findAllIn(p).length == 1, p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q34 word-count top-100 compiles to TakeOrderedAndProject") {
    val p = plan("q34_word_count")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q35 higher-order array functions stay in-row (no Generate fan-out)") {
    val p = plan("q35_array_hof")
    assert(!p.contains("Generate"), p)
  }

  test("q37 sessionize reuses one hash partitioning across both window passes") {
    val df = SparkEntry.queries("q37_sessionize")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // one hash exchange on user_id (lag + running sum + groupBy all use
    // it) + one range exchange for the final ORDER BY — nothing else
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.length <= 2, exec.toString)
  }

  test("q44 centroid aggregates partially map-side (two HashAggregates)") {
    val p = plan("q44_centroid")
    val first = p.indexOf("HashAggregate")
    assert(first >= 0 && p.indexOf("HashAggregate", first + 1) > first, p)
  }

  test("q46 outlier filter broadcasts the 5-row threshold table") {
    val p = finalPlan("q46_outlier_filter")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q01 count aggregates partially before the final exchange") {
    val p = plan("q01_count")
    val firstAgg = p.indexOf("HashAggregate")
    assert(firstAgg >= 0, p)
    assert(p.indexOf("HashAggregate", firstAgg + 1) > firstAgg, "partial+final expected: " + p)
  }

  test("q48/q49 scalar batteries shuffle only for output order (range exchange)") {
    Seq("q48_array_setops", "q49_regex_battery").foreach { name =>
      val p = plan(name)
      val n = "Exchange".r.findAllIn(p).length
      assert(n == 1, s"$name: expected only the ORDER BY exchange:\n$p")
      assert(p.contains("Exchange rangepartitioning"),
        s"$name: the single exchange should be range (sort), not a data shuffle:\n$p")
    }
  }

  test("q72 value-range frames reuse one hash partitioning for both windows") {
    val df = SparkEntry.queries("q72_range_frame")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // one hash exchange on user_id shared by the 24h-range and the
    // full-partition frame + one range exchange for the final ORDER BY
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.length <= 2, exec.toString)
  }

  test("q73 correlated scalar subquery decorrelates to joins (no per-row re-scan)") {
    val p = finalPlan("q73_scalar_subquery")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
    // the per-part AVG shows up as a real aggregate feeding a join
    assert(p.contains("HashAggregate") && p.contains("Join"), p)
  }

  test("q74 EXISTS becomes a left-semi join with the date filter pushed down") {
    val p = finalPlan("q74_exists_range")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
  }

  test("q75 NOT IN plans as a null-aware anti join, not a nested loop over nulls") {
    val df = SparkEntry.queries("q75_not_in_nulls")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("NAAJ") || p.contains("LeftAnti"), p)
  }

  test("q83 LATERAL top-k decorrelates to a ranked window, not per-group probes") {
    val p = finalPlan("q83_lateral_topk")
    assert(p.contains("Window"), p)
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
  }

  test("q81 bitwise aggregates combine map-side (partial+final)") {
    val p = plan("q81_bitwise_agg")
    val first = p.indexOf("HashAggregate")
    assert(first >= 0 && p.indexOf("HashAggregate", first + 1) > first, p)
  }

  test("q09 first-wins dedup gets partial WindowGroupLimit before the shuffle") {
    // rn()=1 filters push a per-key top-1 limit into each map task, so
    // only one row per key per partition is shuffled — the property that
    // makes window-based dedup survive 100 TB instead of shuffling the
    // full table into the window sort
    val p = plan("q09_first_wins_dedup")
    val first = p.indexOf("WindowGroupLimit")
    assert(first >= 0, s"WindowGroupLimit missing:\n$p")
    assert(p.indexOf("WindowGroupLimit", first + 1) > first,
      s"expected Partial AND Final WindowGroupLimit:\n$p")
  }

  test("q90 TPC-H Q3: both date filters push to their scans, top-10 is TakeOrdered") {
    val p = plan("q90_tpch_q3")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("o_orderdate") && p.contains("l_shipdate") &&
      p.contains("c_mktsegment"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q88 salted join spreads the key but plans only equi-joins") {
    val p = finalPlan("q88_salted_join")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q93 PII scrub is a pure map-side projection (no shuffle beyond output order)") {
    val p = plan("q93_pii_scrub")
    val n = "Exchange".r.findAllIn(p).length
    assert(n == 1 && p.contains("Exchange rangepartitioning"),
      s"expected only the ORDER BY range exchange:\n$p")
  }

  test("q91/q92 quality signals stay in-row (no Generate fan-out)") {
    Seq("q91_doc_repetition", "q92_gopher_rules").foreach { name =>
      val p = plan(name)
      assert(!p.contains("Generate"), s"$name explodes where a map suffices:\n$p")
    }
  }

  test("q100/q101 shuffle only for output order (single range exchange)") {
    // quantization is pure map-side; chunking fans rows out IN-ROW via
    // explode — neither moves data until the declared ORDER BY
    Seq("q100_embed_quant", "q101_doc_chunks").foreach { name =>
      val p = plan(name)
      val n = "Exchange".r.findAllIn(p).length
      assert(n == 1 && p.contains("Exchange rangepartitioning"),
        s"$name: expected only the ORDER BY range exchange:\n$p")
    }
  }

  test("q103 unicode normalization runs inside whole-stage codegen") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries("q103_unicode_norm")(spark, sf)
      val gen = org.apache.spark.sql.execution.debug.codegenString(
        df.queryExecution.executedPlan)
      assert(gen.contains("graft.ops.UnicodeNormUtil.nfc"), gen.take(2000))
      assert(gen.contains("graft.ops.UnicodeNormUtil.stripAccents"), gen.take(2000))
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("q104 decontamination broadcasts the eval gram set (train never shuffles grams)") {
    val p = finalPlan("q104_decontaminate")
    assert(p.contains("BroadcastHashJoin"),
      s"eval side should broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"),
      s"train grams must not shuffle for the join:\n$p")
  }

  test("q106 tf-idf rank-3 gets partial WindowGroupLimit before the shuffle") {
    val p = plan("q106_tfidf")
    assert(p.contains("WindowGroupLimit"), p)
  }

  test("q105 parse_url battery shuffles only for the host window + output order") {
    val p = plan("q105_url_domain_cap")
    assert(!p.contains("CartesianProduct") && !p.contains("Generate"), p)
  }

  test("runtime bloom filter prunes the fact side under a selective dim filter") {
    // The 100 TB story for selective fact⋈dim shuffle joins: Spark
    // injects a bloom filter built from the filtered dim onto the fact
    // scan, dropping non-joining fact rows BEFORE the shuffle. Local
    // thresholds are sized for real clusters, so pin the capability by
    // lowering them; production keeps defaults.
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.get(k))
    conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
    conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force shuffle join
    try {
      val fact = Tables.table(spark, sf, "lineitem")
        .select("l_orderkey", "l_quantity")
      val dim = Tables.table(spark, sf, "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
        .select("o_orderkey")
      val j = fact.join(dim,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val p = j.queryExecution.optimizedPlan.toString
      assert(p.contains("might_contain"),
        s"expected an injected bloom filter on the fact side:\n$p")
    } finally saved.foreach { case (k, v) => conf.set(k, v) }
  }

  test("gram explodes don't inline the shingle transform into scan filters") {
    // InferFiltersFromGenerate + pushdown would re-evaluate the k-gram
    // transform per row inside a Filter (split re-run per element_at,
    // interpreted) — measured 8× on q104. explode_outer keeps filters
    // on the GENERATED attribute; a Filter line containing the
    // transform is the regression signature.
    Seq("q104_decontaminate", "q107_minhash_portable", "q108_dup_ngram_frac")
      .foreach { name =>
        val p = plan(name)
        val badFilter = p.linesIterator.exists(l =>
          l.contains("Filter") && l.contains("transform(sequence"))
        assert(!badFilter, s"$name inlines the shingle transform into a filter:\n$p")
      }
  }

  test("q128 fuzzy blocking is an equi-join on the band, never a nested loop") {
    val p = finalPlan("q128_fuzzy_pairs")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"), p)
    assert(p.contains("Join"), p)
  }

  test("q126 bm25 scan prunes to the two columns it uses") {
    val p = plan("q126_bm25")
    assert(!p.contains("n_chars") && !p.contains("source"), p)
  }

  test("q137 custom top-k aggregate runs as ObjectHashAggregate, no Window sort") {
    val p = plan("q137_topk_agg")
    assert(p.contains("ObjectHashAggregate") && p.contains("top_k_by_score"), p)
    assert(!p.contains("Window "), p)
    // partial + final: the map-side combine is the whole point
    val first = p.indexOf("ObjectHashAggregate")
    assert(p.indexOf("ObjectHashAggregate", first + 1) > first,
      "expected partial+final ObjectHashAggregate pair:\n" + p)
  }

  test("q131 two-phase stratum sample: two narrow windows, no global sort of data") {
    val df = SparkEntry.queries("q131_stratum_sample")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    // (stratum, nibble) hash + (stratum) hash + final ORDER BY range —
    // an accidental extra repartition (or a collapsed single-window
    // rewrite) changes this count
    val exchanges = exec.collect { case e: Exchange => e }
    assert(exchanges.length <= 3, exec.toString)
  }

  test("q177 tpch q5: dim tables broadcast, date filter pushed to the scan") {
    val p = plan("q177_tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
  }

  test("q189 argmin: packed-long min stays in hash aggregation (no SortAggregate)") {
    val p = plan("q189_argmin_supplier")
    assert(!p.contains("SortAggregate"),
      "min(struct) regression: the packed-long argmin must hash-aggregate\n" + p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q180 tpch q18: HAVING reduction before the joins, 2-column lineitem scan") {
    val p = plan("q180_tpch_q18")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    // the post-agg threshold filter exists (the 99% kill happens pre-join)
    assert(p.contains("sum_qty"), p)
    // lineitem scan reads only the key + quantity, never the wide columns
    assert(!p.contains("l_extendedprice") && !p.contains("l_comment"), p)
  }

  test("q203 tpch q7: ship-year filter pushes to the scan, nations broadcast") {
    val p = plan("q203_tpch_q7")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q209 tpch q10: returnflag pushed, top-100 is TakeOrderedAndProject") {
    val p = plan("q209_tpch_q10")
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"), p)
  }

  test("q215 tpch q21: EXISTS/NOT EXISTS decorrelate to semi+anti joins") {
    val p = plan("q215_waiting_suppliers")
    // Catalyst must lower both correlated subqueries to joins on
    // l_orderkey — never a per-order probe loop or a cartesian.
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q216 tpch q22: anti join on date-pruned orders, one-row threshold") {
    val p = plan("q216_global_customers")
    assert(p.contains("LeftAnti"), p)
    // The date predicate must reach the orders scan feeding the anti
    // join — at 100 TB the anti-join build side is the pruned slice.
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q217 tpch q2: correlated MIN decorrelates; part filter pushed") {
    val p = plan("q217_min_cost_supplier")
    // The correlated scalar subquery must become a per-part aggregate
    // joined back on partkey — a plain join tree, no per-row probe.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("PushedFilters") && p.contains("p_size"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q218 tpch q4: EXISTS lowers to a semi join on date-pruned orders") {
    val p = plan("q218_priority_check")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("PushedFilters") && p.contains("o_orderdate"), p)
  }

  test("q219 tpch q6: all three predicates reach the lineitem scan") {
    val p = plan("q219_forecast_revenue")
    assert(p.contains("PushedFilters"), p)
    assert(p.contains("l_shipdate") && p.contains("l_quantity"), p)
    // Two-column read: the scan must not drag unused wide columns.
    assert(!p.contains("l_partkey") && !p.contains("l_orderkey"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q221 tpch q12: year filter pushed; equi-join on orderkey only") {
    val p = plan("q221_latency_priority")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q224 tpch q16: NOT IN is a null-aware anti join, size list pushed") {
    val p = plan("q224_offer_counts")
    assert(p.contains("LeftAnti"), p)
    assert(p.contains("PushedFilters") && p.contains("p_size"), p)
  }

  test("q228 dsir select: weight table broadcasts; top-50 is TakeOrdered") {
    val p = plan("q228_dsir_select")
    // The ≤512-row weight table must broadcast into the scorer (never
    // shuffle the per-doc tf side against it), and selection must be
    // TakeOrderedAndProject, not a global sort.
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q225 tpch q19: disjunction stays a residual on an equi-join") {
    val p = plan("q225_banded_revenue")
    // The OR-of-bands must NOT break the p_partkey equi-join into a
    // nested loop — Q19's classic optimizer trap.
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("q331/q334 one-row stat frames ride broadcast, scans stay pruned") {
    val p1 = plan("q331_benford_audit")
    assert(p1.contains("BroadcastNestedLoopJoin") ||
      p1.contains("BroadcastExchange"), p1)
    assert(!p1.contains("o_comment"), "Benford reads more than o_totalprice")
    val p2 = plan("q334_daily_acf")
    assert(p2.contains("BroadcastExchange") ||
      p2.contains("BroadcastNestedLoopJoin"), p2)
    assert(!p2.contains("CartesianProduct"), p2)
  }

  test("q340/q341 bounded pair frames are explicit broadcast NLJs, " +
    "never cartesian shuffles") {
    Seq("q340_kendall_tau", "q341_mann_kendall").foreach { name =>
      val p = plan(name)
      assert(p.contains("BroadcastNestedLoopJoin"),
        s"$name pair frame lost its broadcast:\n$p")
      assert(!p.contains("CartesianProduct"), s"$name plans a cartesian:\n$p")
    }
  }

  test("q338 keyness: source totals broadcast; the corpus-sized side " +
    "never shuffles twice") {
    val p = plan("q338_g2_keyness")
    assert(p.contains("BroadcastExchange") ||
      p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("AQE OptimizeSkewedJoin splits a genuinely skewed partition " +
    "and results match the unskewed computation") {
    // r9 verdict item 4: the repo has MANUAL salting (q88/q89), but a
    // 100 TB join on a hot key relies on AQE's runtime skew split —
    // prove the mechanism fires. Synthetic hot key: one key carries
    // 150k of 199k left rows, so its shuffle partition is far beyond
    // factor×median; thresholds are lowered (test-scoped) so the
    // sf-sized fixture crosses the byte bars; broadcast is disabled so
    // the join is the sort-merge shape OptimizeSkewedJoin rewrites.
    import org.apache.spark.sql.functions._
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled",
      "spark.sql.shuffle.partitions")
      .map(k => k -> conf.getOption(k)).toMap
    try {
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16k")
      conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      conf.set("spark.sql.shuffle.partitions", "8")
      val left = spark.range(0, 199000L)
        .select(when(col("id") < 150000L, 0L)
          .otherwise(col("id") % 49L + 1L).as("k"), col("id").as("lv"))
      val right = spark.range(0, 50L * 20L)
        .select((col("id") % 50L).as("k"), col("id").as("rv"))
      // The validating aggregate is GLOBAL (no grouping on the join
      // key): a groupBy(k) directly downstream would pin the join's
      // hash distribution and legitimately veto the skew split.
      val joined = left.join(right, "k")
        .agg(count(lit(1)).as("n"), sum(col("lv")).as("s"))
      val got = joined.collect()(0)
      // exact expectation without a join: every left row matches its
      // key's 20 right rows.
      assert(got.getLong(0) == 199000L * 20L)
      assert(got.getLong(1) == 20L * (198999L * 199000L / 2L))
      // QueryStageExec wraps materialized stages out of `collect`'s
      // reach; the final-plan STRING carries the `skew=true` marker
      // OptimizeSkewedJoin stamps on the join and the AQEShuffleRead.
      val fin = (joined.queryExecution.executedPlan match {
        case a: AdaptiveSparkPlanExec => a.executedPlan
        case p => p
      }).toString
      assert(fin.contains("SortMergeJoin") || fin.contains("ShuffledHashJoin"),
        s"join did not plan as a shuffled join — skew path untested:\n$fin")
      assert(fin.contains("skew=true"),
        s"OptimizeSkewedJoin did not mark the join as skew-split:\n$fin")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("every BroadcastNestedLoopJoin in the registry has a declared " +
    "fixed-size build side (the q354 net — r10 verdict item 6)") {
    // The global rule above bans CartesianProduct, but r10's q354
    // showed a corpus-sized BroadcastNestedLoopJoin slides through:
    // its probe side was N/2 of the corpus. This audit closes that
    // hole structurally: a BNL is acceptable ONLY when its broadcast
    // (build) side is provably bounded in the plan itself —
    //   (a) a global aggregate (empty grouping → exactly one row):
    //       the accepted one-row global-stats crossJoin shape, or
    //   (b) a limit (Local/Global/TakeOrdered), or
    //   (c) a Filter comparing an attribute against a LITERAL bound
    //       (the fixed-probe-evaluation shape: vec_id < 50/200) —
    //       note vec_id % 2 = 0 does NOT match: modulo keeps the side
    //       proportional to the corpus, which is the exact q354 bug, or
    //   (d) the query is on the named-contract exempt list.
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    import org.apache.spark.sql.execution.{FilterExec, GlobalLimitExec, LocalLimitExec, TakeOrderedAndProjectExec}
    import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual, Literal}
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    // Named BNL contracts: each entry declares WHAT bounds its build
    // side (adjudicated by reading the plan via graft.DevBnl). A new
    // query planning a BNL must either carry a structural bound (below)
    // or be added here WITH its bound — an unexplained corpus-sized
    // build side fails the suite.
    val exempt = Set(
      "q60_knn_brute", // all-pairs IS that query's contract
      "q229_ks_drift", // distinct-doc-length grid (value-bounded)
      "q232_psi_drift", // length-bucket (n_chars/100) grid (value-bounded)
      "q370_t_closeness", // $1000-balance-bucket grid (value-bounded)
      "q143_js_divergence", // per-word corpus distribution (vocab-sized)
      "q167_cross_perplexity", // per-source LM totals (feed-bounded)
      "q340_kendall_tau", // per-brand rank frame (≤25 TPC-H brands)
      "q341_mann_kendall", // calendar day-grid self-pair (day-bounded)
      "q316_silhouette", // per-cluster centroid sums (k-bounded)
      "q304_welch_battery" // per-mktsegment moments (5 segments)
    )
    def bounded(side: SparkPlan): Boolean = {
      // Only a bare ATTRIBUTE (or a cast of one) compared against a
      // literal counts as a selective bound: a derived expression like
      // pmod(vec_id, 2) = 0 keeps the side proportional to the corpus
      // (the exact q354 bug), and a data predicate like score >= 0.0
      // bounds nothing — both used to slip through the wildcard
      // patterns (r11 ADVICE).
      def isAttr(e: Expression): Boolean = e match {
        case _: AttributeReference => true
        case c: Cast => isAttr(c.child)
        case _ => false
      }
      def attrVsLit(l: Expression, r: Expression): Boolean =
        (isAttr(l) && r.isInstanceOf[Literal]) ||
          (l.isInstanceOf[Literal] && isAttr(r))
      def litCompare(p: SparkPlan): Boolean = p.collectFirst {
        case f: FilterExec if f.condition.exists {
          case LessThan(l, r) => attrVsLit(l, r)
          case LessThanOrEqual(l, r) => attrVsLit(l, r)
          case GreaterThan(l, r) => attrVsLit(l, r)
          case GreaterThanOrEqual(l, r) => attrVsLit(l, r)
          case EqualTo(l, r) => attrVsLit(l, r)
          case _ => false
        } => f
      }.isDefined
      val oneRow = side.collectFirst {
        case a: BaseAggregateExec if a.groupingExpressions.isEmpty => a
      }.isDefined
      val limited = side.collectFirst {
        case l: GlobalLimitExec => (l: SparkPlan)
        case l: LocalLimitExec => (l: SparkPlan)
        case l: TakeOrderedAndProjectExec => (l: SparkPlan)
        // a literal local relation is a fixed row set by construction
        case l: org.apache.spark.sql.execution.LocalTableScanExec =>
          (l: SparkPlan)
      }.isDefined
      oneRow || limited || litCompare(side)
    }
    val violations = allSparkPlans.filterNot(p => exempt(p._1)).flatMap {
      case (name, sp) =>
        sp.collect { case b: BroadcastNestedLoopJoinExec => b }.flatMap { b =>
          val build = b.buildSide match {
            case BuildLeft => b.left
            case BuildRight => b.right
          }
          if (bounded(build)) None
          else Some(s"$name:\n${build.toString}")
        }
    }
    assert(violations.isEmpty,
      s"${violations.size} BroadcastNestedLoopJoin(s) whose build side " +
        s"has no declared constant bound (one-row agg / limit / literal " +
        s"filter) — the q354 failure shape:\n${violations.mkString("\n")}")
  }

  test("every partition-less WindowExec in the registry rides a declared " +
    "bounded frame (the q287 two-phase net — r11 verdict item 1)") {
    // A Window with no partitionBy moves its ENTIRE input through one
    // task. That is fine over a value-collapsed census (calendar days,
    // vocab, p-value grid, HDR registers — thousands of rows at any
    // SF) and fatal over a DIMENSION (parts/customers — billions at
    // the 100-TB design point; r11's one weak posture, q287/q332/
    // q364/q376, now on ops.TwoPhase). This net makes the distinction
    // a reviewed contract:
    //   (a) structural carve-out: a window whose input is the TwoPhase
    //       bucket census (topmost aggregate below it groups on
    //       __tp_bucket, <= ~520 rows by construction), or
    //   (b) a named exemption HERE declaring what bounds the frame.
    // A new query planning an unexplained partition-less window fails
    // the suite.
    import org.apache.spark.sql.execution.window.WindowExec
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val exempt: Map[String, String] = Map(
      "q130_zipf_slope" -> "top-100 rank over the closed 31-word vocabulary",
      "q142_vocab_table" -> "vocabulary-sized frame (closed vocab)",
      "q166_token_apportion" -> "Hamilton remainder rank over source cardinality (tens of rows)",
      "q400_neyman_allocation" -> "Hamilton remainder rank over source cardinality (the q166 apportion core)",
      "q170_event_anomaly" -> "calendar day grid (~2.4k rows at any SF)",
      "q173_heaps_law" -> "log-spaced prefix grid over the closed vocabulary",
      "q184_fk_audit" -> "median rides the fan-count HISTOGRAM (distinct fan values)",
      "q185_key_skew" -> "median rides the key-count histogram (q184 discipline)",
      "q186_monthly_rev" -> "calendar month frame",
      // q191 and q195 were exempt here until round 12: their customer/
      // converted-user dimension windows now ride ops.TwoPhase.
      "q199_quality_survival" -> "cumulative window over <= 11 quality buckets",
      "q205_chi2_dow" -> "<= 35-cell (type x dow) grid",
      "q206_autocorr_daily" -> "calendar day grid",
      "q231_quota_resample" -> "Hamilton apportion over the length-bucket grid",
      "q236_oov_rate" -> "top-K vocab rank (bounded-vocabulary posture)",
      "q246_seasonal_error" -> "calendar day grid",
      "q247_mutual_info" -> "<= (types x 7) cell grid",
      "q258_bh_fdr" -> "BH rank over the hypothesis grid (bounded test count)",
      "q262_stl_seasonal" -> "calendar day grid",
      "q265_mann_whitney" -> "ranks ride the value-collapsed length domain (q238 posture)",
      "q271_vocab_coverage" -> "vocabulary-sized rank frame",
      "q276_negsample_table" -> "top-50 vocab rank frame",
      "q280_hill_tail" -> "51-row top-(k+1) frame (TakeOrdered upstream)",
      "q285_cramers_v" -> "(brand x type) value-bounded grid",
      "q297_kaplan_meier" -> "duration grid (calendar-bounded risk sets)",
      "q298_logrank" -> "duration grid (q297 posture)",
      "q300_health_scorecard" -> "source-frame rank window (source cardinality)",
      "q302_kruskal_wallis" -> "distinct-length value grid",
      "q322_sprt_trace" -> "calendar day grid cumsum",
      "q343_runs_test" -> "calendar day grid",
      "q348_chow_break" -> "calendar day grid (~2.4k rows)",
      "q359_ljung_box" -> "calendar day grid (7x lag fan-out)",
      "q361_page_hinkley" -> "calendar day grid",
      "q362_grubbs_scan" -> "calendar day grid (3 passes)",
      "q376_lorenz_curve" -> "10-row decile frame (rank itself is TwoPhase)",
      "q378_hdr_quantiles" -> "<= ~220-row HDR register census",
      "q381_conformal_coverage" -> "value-collapsed score census window"
    )
    def isCensusWindow(w: WindowExec): Boolean =
      w.child.collectFirst { case a: BaseAggregateExec => a }.exists(
        _.groupingExpressions.exists(
          _.references.exists(_.name.startsWith("__tp_b"))))
    val offenders = allSparkPlans.flatMap { case (name, sp) =>
      val bad = sp.collect {
        case w: WindowExec if w.partitionSpec.isEmpty && !isCensusWindow(w) => w
      }
      if (bad.nonEmpty && !exempt.contains(name)) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"${offenders.size} quer(ies) plan a partition-less WindowExec with " +
        s"no declared frame bound (single-task sort at scale — the q287 " +
        s"failure shape); add the bound here or re-shape via " +
        s"ops.TwoPhase.rankCum: ${offenders.mkString(", ")}")
    // the fixed four must stay fixed: their DIMENSION windows are gone
    Seq("q287_abc_class", "q332_gini_concentration", "q364_abc_xyz").foreach {
      name =>
        val sp = allSparkPlans.find(_._1 == name).get._2
        val dims = sp.collect {
          case w: WindowExec if w.partitionSpec.isEmpty && !isCensusWindow(w) => w
        }
        assert(dims.isEmpty,
          s"$name regressed to a dimension-global window:\n${dims.mkString}")
    }
    // exemptions must not go stale (renamed/removed queries)
    val live = allSparkPlans.map(_._1).toSet
    val stale = exempt.keys.filterNot(live)
    assert(stale.isEmpty, s"stale window exemptions: ${stale.mkString(", ")}")
  }

  test("q384 TPC-H Q8: the deepest join tree broadcasts its dims and pushes " +
    "the part-type filter to the scan") {
    val p = finalPlan("q384_tpch_q8")
    assert(p.contains("PushedFilters") && p.contains("p_type"),
      s"part-type filter not pushed:\n${p.take(3000)}")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 3,
      s"nation/region/supplier dims should broadcast:\n${p.take(3000)}")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p)
  }

  test("q390 median/MAD: both stat frames are limit(1)-bounded broadcasts, " +
    "no dimension-global window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val sp = SparkEntry.queries("q390_median_mad")(spark, sf)
      .queryExecution.sparkPlan
    val bad = sp.collect {
      case w: WindowExec if w.partitionSpec.isEmpty => w
    }.filterNot(w => w.child.collectFirst {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.exists(_.groupingExpressions.exists(
      _.references.exists(_.name.startsWith("__tp_b")))))
    assert(bad.isEmpty,
      s"q390 regressed to a dimension-global window:\n${bad.mkString}")
    assert(sp.toString.contains("GlobalLimit") ||
      sp.collectFirst {
        case l: org.apache.spark.sql.execution.GlobalLimitExec => l }.isDefined,
      s"median/MAD stat frames lost their limit(1) bound:\n${sp.toString.take(2000)}")
  }

  test("q354 hubness probe frame is constant-bounded (vec_id < 200 " +
    "reaches the broadcast side)") {
    import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
    import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
    val sp = SparkEntry.queries("q354_hubness")(spark, sf)
      .queryExecution.sparkPlan
    val bnls = sp.collect { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnls.nonEmpty, "q354 lost its broadcast probe join:\n" + sp)
    // the probe build side must carry the literal 200 bound, and the
    // corpus-proportional modulo shape must be gone for good
    val s = sp.toString
    assert(s.contains("< 200"), s"q354 probe bound missing:\n$s")
    assert(!s.contains("% 2"), s"q354 modulo probe shape is back:\n$s")
  }
}
