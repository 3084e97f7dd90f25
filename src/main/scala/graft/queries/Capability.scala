package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Round-3 capability widening (SURVEY §2.2/§2.5 extension set
  * Q33–Q46): reshaping (pivot), collection fan-out (explode) and
  * higher-order array functions, exact percentiles, sessionization
  * (both gaps-and-islands and Spark's native `session_window`),
  * grouping sets, date/string batteries, distribution windows,
  * statistical aggregates, CDC snapshot diff, and embedding centroids.
  *
  * Same contract as [[Declared]]: every query has a DuckDB oracle with
  * identically-aliased columns, explicit ORDER BY, ROUND on floating
  * aggregates, no nondeterministic functions. Scale notes are inline
  * per query — the recurring theme is one shuffle on the natural key,
  * broadcast for scalar/dim sides, and map-side-only work otherwise.
  */
object Capability {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** Per-user event-gap sessionization threshold: 12 h in nanoseconds
    * (events.ts is bigint nanos — SURVEY §2.5 note 1). The testdata's
    * median per-user gap is ~7 h, so this yields a real mix of multi-
    * event sessions and singletons.
    */
  private val SessionGapNs: Long = 12L * 3600 * 1000 * 1000 * 1000

  // ---- Q33 (reshape: pivot): long→wide with a fixed value list — the
  // EXPLICIT list keeps the plan a single hash aggregate; an unlisted
  // pivot would first run a distinct scan to discover columns. --------
  def q33(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(round(sum(col("value")), 2))
      .orderBy("user_id")

  // ---- Q34 (collection fan-out): explode + frequency count + top-k.
  // The explode is map-side (no shuffle); one hash agg on word; top-100
  // via TakeOrderedAndProject (no global sort materialization). -------
  def q34(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(col("text"), " ")).as("word"))
      .filter(length(col("word")) > 0)
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word"))
      .limit(100)

  // ---- Q35 (higher-order array functions): transform/filter/aggregate
  // run INSIDE codegen over the array — no explode, no shuffle, output
  // cardinality = input. This is the scale-safe shape for per-document
  // token features (vs q34's fan-out, which multiplies rows). ---------
  def q35(s: SparkSession, dir: String): DataFrame = {
    val words = split(trim(col("text")), " ")
    t(s, dir, "documents")
      .select(
        col("doc_id"),
        size(words).cast("long").as("n_words"),
        size(filter(words, w => length(w) > 4)).cast("long").as("n_long"),
        aggregate(words, lit(0L), (acc, w) => acc + length(w).cast("long")).as("sum_len"),
        array_join(transform(slice(words, 1, 3), w => upper(w)), " ").as("head3"))
      .orderBy("doc_id")
  }

  // ---- Q36 (exact percentiles): Spark's `percentile` (exact, linear
  // interpolation) vs DuckDB quantile_cont — same estimator. Exact
  // percentile needs all group values; at 100 TB switch to
  // percentile_approx (q25's sketch note) — declared here as the
  // correctness anchor the sketch is judged against. -------------------
  def q36(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        round(expr("percentile(value, 0.5D)"), 2).as("p50"),
        round(expr("percentile(value, 0.9D)"), 2).as("p90"),
        round(expr("percentile(value, 0.99D)"), 2).as("p99"))
      .orderBy("event_type")

  // ---- Q37 (sessionization, gaps-and-islands): lag → boundary flag →
  // running sum = session id. ONE shuffle (hash by user_id) serves both
  // window passes and the final agg — Spark reuses the partitioning.
  // Gap compare in exact int64 nanos; ties (duplicate rows) are benign
  // because tied rows are identical. ----------------------------------
  def q37(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prev = lag(col("ts"), 1).over(w)
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"))
      .withColumn(
        "nf",
        when(prev.isNull || (col("ts") - prev) > SessionGapNs, 1L).otherwise(0L))
      .withColumn("sess", sum(col("nf")).over(run))
      .groupBy(col("user_id"), col("sess"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .orderBy("user_id", "sess")
  }

  // ---- Q38 (grouping sets): the general grouping-set lattice (rollup
  // q27 / cube q32 are special cases). SQL-declared — the DataFrame API
  // has no grouping-sets verb; Catalyst expands to a single Expand +
  // hash agg, NOT one pass per set. ------------------------------------
  def q38(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("gs_lineitem")
    s.sql(
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS qty, COUNT(*) AS cnt
        |FROM gs_lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin)
  }

  // ---- Q39 (date battery): truncation, quarter, month arithmetic
  // (add_months clamps to month end — DuckDB interval months agree),
  // last_day, day offset. All codegen'd scalars, map-side only. --------
  def q39(s: SparkSession, dir: String): DataFrame = {
    val d = col("o_orderdate").cast("date")
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("mon"),
        quarter(col("o_orderdate")).cast("long").as("q"),
        add_months(d, 3).as("plus3m"),
        last_day(d).as("eom"),
        date_add(d, 45).as("plus45d"))
      .orderBy("o_orderkey")
  }

  // ---- Q40 (string battery II): edit distance + structural string
  // functions. levenshtein is the exact-dedup fallback verifier for
  // near-dup candidates (SURVEY ext ops) — certified here on its own. --
  def q40(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        levenshtein(col("c_name"), lit("Customer")).cast("long").as("lev"),
        reverse(col("c_name")).as("rev"),
        lpad(col("c_name"), 25, "*").as("pad"),
        repeat(col("c_mktsegment"), 2).as("rep2"),
        translate(col("c_name"), "aeiou", "AEIOU").as("tr"),
        expr("split_part(c_name, '#', 1)").as("first_tok"))
      .orderBy("c_custkey")

  // ---- Q41 (distribution windows): ntile/percent_rank/cume_dist.
  // percent_rank=(rank-1)/(n-1) and cume_dist=k/n are exact integer
  // ratios — identical doubles in both engines; rounded anyway. --------
  def q41(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal"), col("c_custkey"))
    t(s, dir, "customer")
      .select(
        col("c_mktsegment"), col("c_custkey"),
        ntile(4).over(w).cast("long").as("quartile"),
        round(percent_rank().over(w), 6).as("pr"),
        round(cume_dist().over(w), 6).as("cd"))
      .orderBy("c_mktsegment", "c_custkey")
  }

  // ---- Q42 (statistical aggregates): correlation, covariance,
  // dispersion — single-pass co-moment merges (partial-aggregable, one
  // shuffle). covar_pop subtracts ~1e10-magnitude co-moments (catastrophic
  // cancellation leaves ~1e-2 engine drift on 60k rows) → round 0;
  // corr/stddev/var are numerically stable → round 4. ------------------
  def q42(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("cnt"),
        round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("corr_qp"),
        round(covar_pop(col("l_quantity"), col("l_extendedprice")), 0).as("cov_qp"),
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(var_samp(col("l_quantity")), 4).as("var_qty"))
      .orderBy("l_returnflag")

  // ---- Q43 (CDC snapshot diff): classify rows across two snapshots as
  // insert/delete/update/same via ONE full-outer join on the key — the
  // set-based replacement for per-row upsert loops (the reference's
  // find-one-then-insert, migration.py:179-212, generalized to diffs).
  // Snapshots are deterministic modulo-carvings of orders. -------------
  def q43(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    val snapA = o.filter(col("o_orderkey") % 3 =!= 0)
      .select(col("o_orderkey").as("ka"), col("o_totalprice").as("pa"))
    val snapB = o.filter(col("o_orderkey") % 7 =!= 0)
      .select(
        col("o_orderkey").as("kb"),
        when(col("o_orderkey") % 5 === 0, round(col("o_totalprice") * 1.1, 2))
          .otherwise(col("o_totalprice")).as("pb"))
    snapA.join(snapB, col("ka") === col("kb"), "full_outer")
      .select(
        coalesce(col("ka"), col("kb")).as("k"),
        when(col("ka").isNull, "insert")
          .when(col("kb").isNull, "delete")
          .when(col("pa") =!= col("pb"), "update")
          .otherwise("same").as("change"))
      .orderBy("k")
  }

  // ---- Q44 (embedding centroids): per-label mean vector via
  // posexplode → (label, pos) hash agg — the aggregation step of k-means
  // and of IVF coarse-quantizer training (Similarity.scala's cells).
  // One shuffle keyed (label, pos); never collects vectors. ------------
  def q44(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "embeddings")
      .select(col("label").cast("long").as("lbl"), posexplode(col("embedding")).as(Seq("pos", "v")))
      .groupBy(col("lbl"), col("pos").cast("long").as("pos"))
      .agg(round(avg(col("v")), 4).as("c"))
      .orderBy("lbl", "pos")

  // ---- Q45 (native session windows): Spark's `session_window` — the
  // same sessions as q37 but via the built-in gap-merge operator that
  // also runs under Structured Streaming with watermark state eviction
  // (streaming/EventStream.scala). Timestamps go through eventTs (µs);
  // the oracle truncates to µs identically. Spark opens a NEW session
  // when gap >= threshold (window end is exclusive). -------------------
  def q45(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("user_id"), col("event_id"), Tables.eventTs(col("ts")).as("tt"))
      .groupBy(col("user_id"), session_window(col("tt"), "12 hours"))
      .agg(count(lit(1)).as("n_events"), min(col("event_id")).as("first_event"))
      .select(col("user_id"), col("n_events"), col("first_event"))
      .orderBy("user_id", "first_event")

  // ---- Q46 (percentile-threshold filter): two-phase outlier scan —
  // tiny per-group threshold table (5 rows) broadcast back onto the
  // fact. The threshold is ROUNDed in BOTH engines so the comparison is
  // against an identical double (interpolated values can differ in the
  // last ulp across engines). -----------------------------------------
  def q46(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).filter(col("value").isNotNull)
    val th = ev.groupBy(col("event_type"))
      .agg(round(expr("percentile(value, 0.99D)"), 4).as("p99"))
    ev.join(broadcast(th), "event_type")
      .filter(col("value") > col("p99"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_out"), round(max(col("value")), 2).as("mx"))
      .orderBy("event_type")
  }

  // ---- Q47 (map functions): build → probe → introspect a MapType
  // column (str_to_map / element_at / map_keys / map_contains_key).
  // All map ops are per-row codegen'd scalars — no shuffle; the oracle
  // states the expected values directly (DuckDB's MAP surface differs
  // syntactically but the semantics under test are Spark's). -----------
  def q47(s: SparkSession, dir: String): DataFrame = {
    val kv = concat(
      lit("seg:"), col("c_mktsegment"),
      lit(",key:"), col("c_custkey").cast("string"))
    val m = str_to_map(kv, lit(","), lit(":"))
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        element_at(m, "seg").as("seg"),
        element_at(m, "key").cast("long").as("key_back"),
        size(m).cast("long").as("m_size"),
        array_join(array_sort(map_keys(m)), ",").as("ks"),
        map_contains_key(m, "seg").cast("long").as("has_seg"))
      .orderBy("c_custkey")
  }

  // ---- Q48 (array set algebra): intersect/union/except/max/contains
  // over per-row arrays. Spark's set ops dedup and keep left order —
  // both engines sort-before-join so the contract is order-free. Sort
  // happens on the NUMERIC element, then cast to string (lexicographic
  // sort of "10" < "2" would diverge). Per-row codegen, no shuffle. ----
  def q48(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val a1 = array(k % 10, k % 7, k % 10, k % 4)
    val a2 = array(k % 10, k % 3, k % 5)
    def joined(a: Column): Column =
      array_join(transform(array_sort(a), _.cast("string")), ",")
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        joined(array_intersect(a1, a2)).as("inter"),
        joined(array_union(a1, a2)).as("uni"),
        joined(array_except(a1, a2)).as("exc"),
        array_max(a1).cast("long").as("mx"),
        array_contains(a1, k % 3).cast("long").as("has_m3"))
      .orderBy("c_custkey")
  }

  // ---- Q49 (regex battery): extract / global replace / match / count /
  // extract_all. DuckDB's regexp_replace is first-match-only without the
  // 'g' flag — the oracle passes it explicitly to match Spark's
  // replace-all. Booleans surfaced as BIGINT to keep dtype compare
  // engine-neutral. Map-side codegen only. -----------------------------
  def q49(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .select(
        col("c_custkey"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        regexp_replace(col("c_name"), "[0-9]", "#").as("masked"),
        col("c_name").rlike("^Customer#0*[0-9]+$").cast("long").as("ok"),
        expr("regexp_count(c_name, '0')").cast("long").as("zeros"),
        array_join(expr("regexp_extract_all(c_name, '[0-9]{3}', 0)"), ",").as("triples"))
      .orderBy("c_custkey")

  // ---- Q72 (value-range window frames): trailing-24h sliding aggregate
  // via RANGE BETWEEN on int64 nanos — the event-time analytics shape
  // (rate limiting, rolling exposure) that ROWS frames cannot express
  // when row density varies. Peers (tied ts) enter the frame together in
  // both engines, so ties are deterministic by construction. first/last
  // over the full-partition frame certifies explicit-frame navigation.
  // One shuffle on user_id serves every window. ------------------------
  def q72(s: SparkSession, dir: String): DataFrame = {
    val dayNs = 86400000000000L
    val w24 = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      .rangeBetween(-dayNs, 0L)
    val wfull = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"),
        count(lit(1)).over(w24).as("n24"),
        round(sum(col("value")).over(w24), 2).as("s24"),
        first(col("event_id")).over(wfull).as("first_ev"),
        last(col("event_id")).over(wfull).as("last_ev"))
      .orderBy("user_id", "event_id")
  }

  // ---- Q73 (correlated SCALAR subquery — TPC-H Q17 shape): per-part
  // average threshold applied back to the fact. Catalyst decorrelates
  // this to aggregate-then-join (one shuffle on l_partkey feeding both
  // sides) — the naive per-row re-scan plan never exists; PlanAuditSpec
  // pins it. The threshold is exact: quantities are integral doubles, so
  // AVG = exact-int-sum / n is bit-identical across engines and the
  // row-membership predicate cannot drift. Revenue summed in DECIMAL
  // (§7.4.5) then rounded once. SQL-declared (the DataFrame DSL has no
  // correlated-scalar verb). --------------------------------------------
  def q73(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("sq_lineitem")
    t(s, dir, "part").createOrReplaceTempView("sq_part")
    s.sql(
      """SELECT p.p_brand, COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2)
        |            AS DOUBLE) AS below_rev
        |FROM sq_lineitem l JOIN sq_part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                      FROM sq_lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin)
  }

  // ---- Q74 (correlated EXISTS under a range predicate — TPC-H Q4
  // shape): the date filter prunes orders BEFORE the semi-join probe
  // (pushdown audited); EXISTS decorrelates to a left-semi hash join on
  // l_orderkey, never a per-order probe loop. -------------------------
  def q74(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("ex_lineitem")
    t(s, dir, "orders").createOrReplaceTempView("ex_orders")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM ex_orders
        |WHERE o_orderdate >= DATE '1995-06-01'
        |  AND o_orderdate <  DATE '1995-09-01'
        |  AND EXISTS (SELECT 1 FROM ex_lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.05)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
  }

  // ---- Q75 (NOT IN three-valued-logic contract): a NULL in the NOT IN
  // list makes the predicate never-TRUE (poisoned count = 0) — the
  // classic silent-wrong-answer trap. Spark plans this as a null-aware
  // anti join; the clean variant (nulls filtered) is a plain anti join.
  // The nullable RHS is carved deterministically (orderkey % 100). -----
  def q75(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("nn_customer")
    t(s, dir, "orders").createOrReplaceTempView("nn_orders")
    s.sql(
      """SELECT
        |  (SELECT COUNT(*) FROM nn_customer WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |                  ELSE o_custkey END
        |      FROM nn_orders WHERE o_orderpriority = '1-URGENT')) AS poisoned,
        |  (SELECT COUNT(*) FROM nn_customer WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM nn_orders
        |      WHERE o_orderpriority = '1-URGENT'
        |        AND o_orderkey % 100 <> 0)) AS clean""".stripMargin)
  }

  // ---- Q79 (gap-fill / LOCF): last-observation-carried-forward over a
  // sparse sensor column via IGNORE NULLS frame navigation, plus the
  // inter-event gap. The time-series repair shape: one shuffle on the
  // entity key, running frame, no self-join (the naive formulation is
  // an inequality self-join — quadratic). Gap is in MICROSECONDS via
  // exact integer `div` (DuckDB truncates TIMESTAMP(NANOS) to µs on
  // read, so nanos are not oracle-comparable; ordering still uses the
  // full-precision nanos). ---------------------------------------------
  def q79(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tsUs = expr("ts div 1000")
    Tables.events(s, dir)
      .select(
        col("user_id"), col("event_id"), col("value"),
        last(col("value"), ignoreNulls = true).over(run).as("locf"),
        (tsUs - lag(tsUs, 1).over(w)).as("gap_us"))
      .orderBy("user_id", "event_id")
  }

  // ---- Q80 (unpivot/melt — the inverse of q33's pivot): wide→long
  // reshape. Spark's `unpivot` is a zero-shuffle row-local expansion
  // (k× output rows, no exchange until the final sort); the oracle is
  // the UNION ALL it desugars to. --------------------------------------
  def q80(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(
        col("o_orderkey"),
        col("o_totalprice").as("price"),
        (col("o_orderkey") % 100).cast("double").as("key100"))
      .unpivot(
        Array(col("o_orderkey")),
        Array(col("price"), col("key100")), "k", "v")
      .orderBy("o_orderkey", "k")

  // ---- Q81 (bitwise aggregates): bit_and/bit_or/bit_xor fold — flag
  // merging / bitmap-style rollups. Partial-aggregable (associative +
  // commutative), so one shuffle with map-side combine. ---------------
  def q81(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        expr("bit_and(user_id)").as("ba"),
        expr("bit_or(user_id)").as("bo"),
        expr("bit_xor(user_id)").as("bx"))
      .orderBy("event_type")

  // ---- Q82 (FILTER-clause aggregation): the SQL-standard form of q21's
  // conditional aggregation — each aggregate carries its own predicate
  // in ONE pass (no per-predicate scans, no self-joins). ---------------
  def q82(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("fc_orders")
    s.sql(
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 100000) AS hi,
        |  CAST(SUM(o_orderkey % 10) FILTER (WHERE o_orderstatus = 'F')
        |       AS BIGINT) AS sf
        |FROM fc_orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  // ---- Q83 (LATERAL join): top-3 orders per market segment via a
  // correlated LATERAL subquery — the "per-group top-k as a join" form.
  // Catalyst decorrelates it to a ranked window over ONE scan of the
  // join, not one probe query per segment (5 segments here; 5 million
  // correlation values at 100 TB would make per-probe execution
  // impossible). --------------------------------------------------------
  def q83(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("lt_orders")
    t(s, dir, "customer").createOrReplaceTempView("lt_customer")
    s.sql(
      """SELECT c.c_mktsegment, t.o_orderkey, t.pr
        |FROM (SELECT DISTINCT c_mktsegment FROM lt_customer) c,
        |LATERAL (SELECT o_orderkey, ROUND(o_totalprice, 2) AS pr
        |         FROM lt_orders o JOIN lt_customer c2
        |           ON o.o_custkey = c2.c_custkey
        |         WHERE c2.c_mktsegment = c.c_mktsegment
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        |ORDER BY c_mktsegment, pr DESC, o_orderkey""".stripMargin)
  }

  // ---- Q84 (ordered string aggregation): listagg WITHIN GROUP — the
  // deterministic form (collect_list alone has partition-dependent
  // order; the explicit ORDER BY is what makes this oracle-safe and
  // rerun-stable). ------------------------------------------------------
  def q84(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "nation").createOrReplaceTempView("sa_nation")
    s.sql(
      """SELECT n_regionkey,
        |  listagg(n_name, '|') WITHIN GROUP (ORDER BY n_name) AS names
        |FROM sa_nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin)
  }

  // ---- Q85 (recursive CTE — iterative graph traversal): transitive
  // closure over an implicit binary tree on customer keys (parent =
  // floor((k-1)/2)), reporting the per-depth census. Each recursion
  // step is ONE distributed hash join of the frontier against the base
  // relation — depth is O(log N) here, so the 100 TB cost is
  // ~40 bounded joins, not a driver-side loop over rows. Division goes
  // through floor(x/2.0) — portable exact integer semantics in both
  // engines (Spark `/` on bigint is double division; DuckDB needs `//`
  // for integer div). ---------------------------------------------------
  def q85(s: SparkSession, dir: String): DataFrame = {
    // project the ONE column the recursion touches before registering
    // the view: the base relation is re-scanned every iteration, so
    // column pruning here is multiplied by the recursion depth
    t(s, dir, "customer").select("c_custkey").createOrReplaceTempView("rc_customer")
    s.sql(
      """WITH RECURSIVE tree(k, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS k, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM rc_customer c JOIN tree t
        |    ON CAST(FLOOR((c.c_custkey - 1) / 2.0) AS BIGINT) = t.k
        |  WHERE c.c_custkey > 0)
        |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin)
  }

  // ---- Q86 (higher-order MAP functions): transform_values / map_filter
  // / map_zip_with over a per-row map — like q35's array HOFs these run
  // inside codegen with no fan-out and no shuffle. The map is built from
  // row data, probed back to scalars for the oracle (DuckDB's map-lambda
  // surface differs; the semantics under test are Spark's — q47's
  // pattern). -----------------------------------------------------------
  def q86(s: SparkSession, dir: String): DataFrame = {
    val k = col("c_custkey")
    val m = map(lit("a"), k % 7, lit("b"), k % 5, lit("c"), k % 3)
    val doubled = transform_values(m, (_, v) => v * 2)
    val odds = map_filter(m, (_, v) => v % 2 === 1)
    val zipped = map_zip_with(m, doubled, (_, v1, v2) => v1 + v2)
    t(s, dir, "customer")
      .select(
        k.as("c_custkey"),
        element_at(doubled, "a").as("da"),
        size(odds).cast("long").as("n_odd"),
        element_at(zipped, "b").as("zb"),
        array_join(transform(array_sort(map_values(m)), _.cast("string")), ",").as("vals"))
      .orderBy("c_custkey")
  }

  // ---- Q87 (VARIANT semi-structured type): parse the JSON payload
  // ONCE into Spark 4's binary variant encoding, then extract typed
  // fields — the scale answer to repeated get_json_object string
  // re-parsing (q31 does the per-call parse; at 100 TB parse-once +
  // binary extraction wins on every additional field). Oracle reads the
  // same fields with DuckDB's JSON extraction. -------------------------
  def q87(s: SparkSession, dir: String): DataFrame = {
    val v = parse_json(col("props"))
    Tables.events(s, dir)
      .filter(col("props").isNotNull)
      .select(
        col("event_id"),
        try_variant_get(v, "$.k", "bigint").as("k"),
        try_variant_get(v, "$.k", "string").as("ks"),
        try_variant_get(v, "$.missing", "bigint").as("miss"))
      .orderBy("event_id")
  }

  // ---- Q113 (rolling 7-day distinct users — DAU/WAU): exact sliding
  // count-distinct is the classic "hard at scale" analytics op because
  // distinct doesn't decompose over overlapping windows. The scalable
  // exact shape: ONE distinct shuffle to (day, user), then a MAP-SIDE
  // explode of each row into exactly the ≤7 anchor days it can serve
  // (a range join against the day spine would nested-loop every row
  // against EVERY anchor — |du|×|days| predicate evaluations for the
  // same ≤7 survivors), a broadcast semi join clipping anchors to
  // observed days (calendar gaps, the trailing 6 days), and a final
  // two-phase distinct-agg per anchor. (The approximate alternative at
  // extreme scale: daily HLL sketches unioned over the window —
  // Sketches.distinctByRollup.)
  def q113(s: SparkSession, dir: String): DataFrame = {
    val du = Tables.events(s, dir)
      .select(to_date(Tables.eventTs(col("ts"))).as("day"), col("user_id"))
      .distinct()
    val fanned = du.select(col("day"), col("user_id"),
      explode(sequence(col("day"), date_add(col("day"), 6))).as("anchor"))
    val spine = broadcast(du.select(col("day").as("anchor")).distinct())
    fanned.join(spine, Seq("anchor"), "left_semi")
      .groupBy(col("anchor"))
      .agg(
        countDistinct(when(col("day") === col("anchor"), col("user_id")))
          .as("dau"),
        countDistinct(col("user_id")).as("wau"))
      .select(col("anchor").as("day"), col("dau"), col("wau"))
      .orderBy("day")
  }

  // ---- Q115 (conversion funnel): per-user ordered step progression
  // click → purchase (first click, first purchase AFTER that click),
  // aggregated to step counts + conversion rate. The standard product
  // funnel, expressed as two min-aggs and a conditional join — no
  // per-user iteration, no window over raw events wider than one key.
  def q115(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val firstClick = ev.filter(col("event_type") === "click")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t_click"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts").as("t_buy"))
    val conv = firstClick.join(purchases, Seq("user_id"), "left")
      .groupBy(col("user_id"), col("t_click"))
      .agg(min(when(col("t_buy") >= col("t_click"), col("t_buy")))
        .as("t_conv"))
    conv.agg(
      count(lit(1)).as("clickers"),
      count(col("t_conv")).as("converted"),
      round(count(col("t_conv")).cast("double") / count(lit(1)), 4)
        .as("conv_rate"))
  }

  // ---- Q116 (retention cohorts): users bucketed by FIRST-seen day
  // (the cohort), counted by how many distinct later weeks they return.
  // Two aggs + one co-keyed join — the cohort table every analytics
  // engine must produce. Week offset in integer arithmetic (datediff /
  // 7) so the bucket boundary cannot drift between engines.
  def q116(s: SparkSession, dir: String): DataFrame = {
    val act = Tables.events(s, dir)
      .select(col("user_id"), to_date(Tables.eventTs(col("ts"))).as("day"))
      .distinct()
    val cohort = act.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    act.join(cohort, "user_id")
      .select(col("user_id"), col("cohort_day"),
        floor(datediff(col("day"), col("cohort_day")) / 7).as("week_off"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_off"))
      .agg(countDistinct(col("user_id")).as("users"))
      .orderBy("cohort_day", "week_off")
  }

  // ---- Q117 (incremental aggregate maintenance): the 100 TB rollup
  // pattern — a stored agg table is REFRESHED by merging the delta
  // batch's partial aggregates (sum of sums, sum of counts), never by
  // re-scanning history. count/sum are the mergeable state; avg is
  // DERIVED at read time from (sum, count) — storing avg itself would
  // make the rollup unmergeable. The oracle recomputes from the full
  // table directly, so the hash match IS the proof that the merge
  // algebra equals a full recompute. Totals in DECIMAL (§7.4.5).
  def q117(s: SparkSession, dir: String): DataFrame = {
    val o = t(s, dir, "orders")
    def part(df: DataFrame): DataFrame = df
      .groupBy(col("o_custkey"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("total"))
    // "stored" rollup = history; "delta" = the new batch (played here
    // by a deterministic 10% slice)
    val stored = part(o.filter(col("o_orderkey") % 10 =!= 0))
    val delta = part(o.filter(col("o_orderkey") % 10 === 0))
    // avg in exact INTEGER-CENTS arithmetic: decimal division rounds at
    // an engine-specific intermediate scale (observed a 1-cent
    // divergence at a .xx5 boundary) — (2·cents + n) div (2·n) is
    // round-half-up with no intermediate rounding at all
    stored.unionByName(delta)
      .groupBy(col("o_custkey"))
      .agg(sum(col("n")).as("n"), sum(col("total")).as("total"))
      .withColumn("__cents", (col("total") * 100).cast("long"))
      .select(
        col("o_custkey"), col("n"),
        round(col("total"), 2).cast("double").as("total"),
        (expr("(2 * __cents + n) div (2 * n)") / 100.0).as("avg_price"))
      .orderBy("o_custkey")
  }

  // ---- Q118 (ops.Scd SCD Type 2): versioned-dimension merge. The dim
  // starts as one current generation of customers; the incoming
  // snapshot mutates every 7th balance and adds brand-new keys — the
  // operator must close the changed versions, open their successors
  // and the new keys, and pass everything else through. The oracle
  // desugars the same fates in SQL over identically-synthesized inputs.
  def q118(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
    val dim = c.select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      .withColumn("valid_from", lit("2024-01-01").cast("date"))
      .withColumn("valid_to", lit(null).cast("date"))
      .withColumn("is_current", lit(1))
    val incoming = c.select(
      col("c_custkey"), col("c_name"),
      when(col("c_custkey") % 7 === 0, col("c_acctbal") + 10)
        .otherwise(col("c_acctbal")).as("c_acctbal"))
      .unionByName(c.filter(col("c_custkey") < 100).select(
        (col("c_custkey") + 100000).as("c_custkey"), col("c_name"),
        col("c_acctbal")))
    graft.ops.Scd.scd2Apply(
      dim, incoming,
      key = Seq("c_custkey"), attrs = Seq("c_name", "c_acctbal"),
      batchDate = lit("2024-06-01").cast("date"))
      .orderBy(col("c_custkey"), col("valid_from"), col("is_current"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q118_scd2"           -> (q118 _),
    "q117_incr_agg"       -> (q117 _),
    "q115_funnel"         -> (q115 _),
    "q116_retention"      -> (q116 _),
    "q113_rolling_wau"    -> (q113 _),
    "q33_pivot"           -> (q33 _),
    "q34_word_count"      -> (q34 _),
    "q35_array_hof"       -> (q35 _),
    "q36_percentiles"     -> (q36 _),
    "q37_sessionize"      -> (q37 _),
    "q38_grouping_sets"   -> (q38 _),
    "q39_date_battery"    -> (q39 _),
    "q40_string_battery"  -> (q40 _),
    "q41_ntile_dist"      -> (q41 _),
    "q42_stats_agg"       -> (q42 _),
    "q43_cdc_diff"        -> (q43 _),
    "q44_centroid"        -> (q44 _),
    "q45_session_window"  -> (q45 _),
    "q46_outlier_filter"  -> (q46 _),
    "q47_map_funcs"       -> (q47 _),
    "q48_array_setops"    -> (q48 _),
    "q49_regex_battery"   -> (q49 _),
    "q72_range_frame"     -> (q72 _),
    "q73_scalar_subquery" -> (q73 _),
    "q74_exists_range"    -> (q74 _),
    "q75_not_in_nulls"    -> (q75 _),
    "q79_locf"            -> (q79 _),
    "q80_unpivot"         -> (q80 _),
    "q81_bitwise_agg"     -> (q81 _),
    "q82_filter_clause"   -> (q82 _),
    "q83_lateral_topk"    -> (q83 _),
    "q84_string_agg"      -> (q84 _),
    "q85_recursive_cte"   -> (q85 _),
    "q86_map_hof"         -> (q86 _),
    "q87_variant_json"    -> (q87 _),
  )

  val oracleSql: Map[String, String] = Map(
    "q33_pivot" ->
      """SELECT user_id,
        |  ROUND(SUM(CASE WHEN event_type = 'click'    THEN value END), 2) AS click,
        |  ROUND(SUM(CASE WHEN event_type = 'error'    THEN value END), 2) AS error,
        |  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  ROUND(SUM(CASE WHEN event_type = 'signup'   THEN value END), 2) AS signup,
        |  ROUND(SUM(CASE WHEN event_type = 'view'     THEN value END), 2) AS view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q34_word_count" ->
      """SELECT word, COUNT(*) AS cnt FROM (
        |  SELECT UNNEST(string_split(text, ' ')) AS word FROM documents) t
        |WHERE LENGTH(word) > 0
        |GROUP BY word ORDER BY cnt DESC, word LIMIT 100""".stripMargin,
    "q35_array_hof" ->
      """SELECT doc_id,
        |  CAST(len(string_split(trim(text), ' ')) AS BIGINT) AS n_words,
        |  CAST(len(list_filter(string_split(trim(text), ' '), w -> length(w) > 4)) AS BIGINT) AS n_long,
        |  CAST(list_sum(list_transform(string_split(trim(text), ' '), w -> length(w))) AS BIGINT) AS sum_len,
        |  array_to_string(list_transform(string_split(trim(text), ' ')[1:3], w -> upper(w)), ' ') AS head3
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q36_percentiles" ->
      """SELECT event_type,
        |  ROUND(quantile_cont(value, 0.5), 2)  AS p50,
        |  ROUND(quantile_cont(value, 0.9), 2)  AS p90,
        |  ROUND(quantile_cont(value, 0.99), 2) AS p99
        |FROM events WHERE value IS NOT NULL
        |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q37_sessionize" ->
      """WITH flag AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN LAG(epoch_ns(ts)) OVER w IS NULL
        |           OR epoch_ns(ts) - LAG(epoch_ns(ts)) OVER w > 43200000000000
        |         THEN 1 ELSE 0 END AS nf
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    SUM(nf) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sess
        |  FROM flag)
        |SELECT user_id, CAST(sess AS BIGINT) AS sess, COUNT(*) AS n_events,
        |       MIN(event_id) AS first_event
        |FROM sess GROUP BY user_id, sess ORDER BY user_id, sess""".stripMargin,
    "q38_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
        |       ROUND(SUM(l_quantity), 2) AS qty, COUNT(*) AS cnt
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
        |                        (l_returnflag, l_linestatus))
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q39_date_battery" ->
      """SELECT o_orderkey,
        |  CAST(date_trunc('month', o_orderdate) AS DATE) AS mon,
        |  CAST(quarter(o_orderdate) AS BIGINT) AS q,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus3m,
        |  last_day(CAST(o_orderdate AS DATE)) AS eom,
        |  CAST(o_orderdate AS DATE) + 45 AS plus45d
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q40_string_battery" ->
      """SELECT c_custkey,
        |  CAST(levenshtein(c_name, 'Customer') AS BIGINT) AS lev,
        |  reverse(c_name) AS rev,
        |  lpad(c_name, 25, '*') AS pad,
        |  repeat(c_mktsegment, 2) AS rep2,
        |  translate(c_name, 'aeiou', 'AEIOU') AS tr,
        |  split_part(c_name, '#', 1) AS first_tok
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q41_ntile_dist" ->
      """SELECT c_mktsegment, c_custkey,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  ROUND(PERCENT_RANK() OVER w, 6) AS pr,
        |  ROUND(CUME_DIST() OVER w, 6) AS cd
        |FROM customer
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
        |ORDER BY c_mktsegment, c_custkey""".stripMargin,
    "q42_stats_agg" ->
      """SELECT l_returnflag, COUNT(*) AS cnt,
        |  ROUND(corr(l_quantity, l_extendedprice), 4) AS corr_qp,
        |  ROUND(covar_pop(l_quantity, l_extendedprice), 0) AS cov_qp,
        |  ROUND(stddev_samp(l_quantity), 4) AS sd_qty,
        |  ROUND(var_samp(l_quantity), 4) AS var_qty
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,
    "q43_cdc_diff" ->
      """WITH a AS (
        |  SELECT o_orderkey AS ka, o_totalprice AS pa
        |  FROM orders WHERE o_orderkey % 3 <> 0),
        |b AS (
        |  SELECT o_orderkey AS kb,
        |    CASE WHEN o_orderkey % 5 = 0 THEN ROUND(o_totalprice * 1.1, 2)
        |         ELSE o_totalprice END AS pb
        |  FROM orders WHERE o_orderkey % 7 <> 0)
        |SELECT COALESCE(ka, kb) AS k,
        |  CASE WHEN ka IS NULL THEN 'insert'
        |       WHEN kb IS NULL THEN 'delete'
        |       WHEN pa <> pb   THEN 'update'
        |       ELSE 'same' END AS change
        |FROM a FULL OUTER JOIN b ON ka = kb
        |ORDER BY k""".stripMargin,
    "q44_centroid" ->
      """SELECT CAST(label AS BIGINT) AS lbl, CAST(ord AS BIGINT) - 1 AS pos,
        |       ROUND(AVG(v), 4) AS c
        |FROM (SELECT label, UNNEST(embedding) AS v,
        |             UNNEST(range(1, len(embedding) + 1)) AS ord
        |      FROM embeddings)
        |GROUP BY label, ord ORDER BY lbl, pos""".stripMargin,
    "q45_session_window" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS TIMESTAMP) AS tt FROM events),
        |flag AS (
        |  SELECT user_id, event_id, tt,
        |    CASE WHEN LAG(tt) OVER w IS NULL
        |           OR tt - LAG(tt) OVER w >= INTERVAL 12 HOUR
        |         THEN 1 ELSE 0 END AS nf
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY tt, event_id)),
        |sess AS (
        |  SELECT user_id, event_id,
        |    SUM(nf) OVER (PARTITION BY user_id ORDER BY tt, event_id
        |                  ROWS UNBOUNDED PRECEDING) AS sid
        |  FROM flag)
        |SELECT user_id, COUNT(*) AS n_events, MIN(event_id) AS first_event
        |FROM sess GROUP BY user_id, sid ORDER BY user_id, first_event""".stripMargin,
    "q46_outlier_filter" ->
      """WITH th AS (
        |  SELECT event_type, ROUND(quantile_cont(value, 0.99), 4) AS p99
        |  FROM events WHERE value IS NOT NULL GROUP BY event_type)
        |SELECT e.event_type, COUNT(*) AS n_out, ROUND(MAX(e.value), 2) AS mx
        |FROM events e JOIN th ON e.event_type = th.event_type
        |WHERE e.value IS NOT NULL AND e.value > th.p99
        |GROUP BY e.event_type ORDER BY e.event_type""".stripMargin,
    "q47_map_funcs" ->
      """SELECT c_custkey,
        |  c_mktsegment AS seg,
        |  c_custkey AS key_back,
        |  CAST(2 AS BIGINT) AS m_size,
        |  'key,seg' AS ks,
        |  CAST(1 AS BIGINT) AS has_seg
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q48_array_setops" ->
      """SELECT c_custkey,
        |  COALESCE(array_to_string(list_transform(list_sort(list_distinct(
        |    list_filter(a1, x -> list_contains(a2, x)))), x -> CAST(x AS VARCHAR)), ','), '') AS inter,
        |  COALESCE(array_to_string(list_transform(list_sort(list_distinct(
        |    list_concat(a1, a2))), x -> CAST(x AS VARCHAR)), ','), '') AS uni,
        |  COALESCE(array_to_string(list_transform(list_sort(list_distinct(
        |    list_filter(a1, x -> NOT list_contains(a2, x)))), x -> CAST(x AS VARCHAR)), ','), '') AS exc,
        |  CAST(list_max(a1) AS BIGINT) AS mx,
        |  CAST(list_contains(a1, CAST(c_custkey % 3 AS BIGINT)) AS BIGINT) AS has_m3
        |FROM (SELECT c_custkey,
        |        [c_custkey % 10, c_custkey % 7, c_custkey % 10, c_custkey % 4] AS a1,
        |        [c_custkey % 10, c_custkey % 3, c_custkey % 5] AS a2
        |      FROM customer)
        |ORDER BY c_custkey""".stripMargin,
    "q49_regex_battery" ->
      """SELECT c_custkey,
        |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
        |  regexp_replace(c_name, '[0-9]', '#', 'g') AS masked,
        |  CAST(regexp_matches(c_name, '^Customer#0*[0-9]+$') AS BIGINT) AS ok,
        |  CAST(len(regexp_extract_all(c_name, '0')) AS BIGINT) AS zeros,
        |  array_to_string(regexp_extract_all(c_name, '[0-9]{3}', 0), ',') AS triples
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q72_range_frame" ->
      """SELECT user_id, event_id,
        |  CAST(COUNT(*) OVER w24 AS BIGINT) AS n24,
        |  ROUND(SUM(value) OVER w24, 2) AS s24,
        |  FIRST_VALUE(event_id) OVER wfull AS first_ev,
        |  LAST_VALUE(event_id) OVER wfull AS last_ev
        |FROM events
        |WINDOW
        |  w24 AS (PARTITION BY user_id ORDER BY epoch_ns(ts)
        |          RANGE BETWEEN 86400000000000 PRECEDING AND CURRENT ROW),
        |  wfull AS (PARTITION BY user_id ORDER BY ts, event_id
        |            ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY user_id, event_id""".stripMargin,
    "q73_scalar_subquery" ->
      """SELECT p.p_brand, COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2))), 2)
        |            AS DOUBLE) AS below_rev
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE l.l_quantity < (SELECT 0.5 * AVG(l2.l_quantity)
        |                      FROM lineitem l2
        |                      WHERE l2.l_partkey = l.l_partkey)
        |GROUP BY p.p_brand ORDER BY p.p_brand""".stripMargin,
    "q74_exists_range" ->
      """SELECT o_orderpriority, COUNT(*) AS n
        |FROM orders
        |WHERE o_orderdate >= DATE '1995-06-01'
        |  AND o_orderdate <  DATE '1995-09-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_discount >= 0.05)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q75_not_in_nulls" ->
      """SELECT
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
        |     (SELECT CASE WHEN o_orderkey % 100 = 0 THEN NULL
        |                  ELSE o_custkey END
        |      FROM orders WHERE o_orderpriority = '1-URGENT')) AS poisoned,
        |  (SELECT COUNT(*) FROM customer WHERE c_custkey NOT IN
        |     (SELECT o_custkey FROM orders
        |      WHERE o_orderpriority = '1-URGENT'
        |        AND o_orderkey % 100 <> 0)) AS clean""".stripMargin,
    "q79_locf" ->
      """SELECT user_id, event_id, value,
        |  LAST_VALUE(value IGNORE NULLS) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id
        |     ROWS UNBOUNDED PRECEDING) AS locf,
        |  epoch_us(ts) - LAG(epoch_us(ts)) OVER
        |    (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
        |FROM events ORDER BY user_id, event_id""".stripMargin,
    "q80_unpivot" ->
      """SELECT o_orderkey, k, v FROM (
        |  SELECT o_orderkey, 'price' AS k, o_totalprice AS v FROM orders
        |  UNION ALL
        |  SELECT o_orderkey, 'key100' AS k,
        |         CAST(o_orderkey % 100 AS DOUBLE) AS v FROM orders) t
        |ORDER BY o_orderkey, k""".stripMargin,
    "q81_bitwise_agg" ->
      """SELECT event_type,
        |  bit_and(user_id) AS ba, bit_or(user_id) AS bo, bit_xor(user_id) AS bx
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q82_filter_clause" ->
      """SELECT o_orderpriority,
        |  COUNT(*) FILTER (WHERE o_totalprice > 100000) AS hi,
        |  CAST(SUM(o_orderkey % 10) FILTER (WHERE o_orderstatus = 'F')
        |       AS BIGINT) AS sf
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q83_lateral_topk" ->
      """SELECT c.c_mktsegment, t.o_orderkey, t.pr
        |FROM (SELECT DISTINCT c_mktsegment FROM customer) c,
        |LATERAL (SELECT o_orderkey, ROUND(o_totalprice, 2) AS pr
        |         FROM orders o JOIN customer c2
        |           ON o.o_custkey = c2.c_custkey
        |         WHERE c2.c_mktsegment = c.c_mktsegment
        |         ORDER BY o_totalprice DESC, o_orderkey LIMIT 3) t
        |ORDER BY c_mktsegment, pr DESC, o_orderkey""".stripMargin,
    "q84_string_agg" ->
      """SELECT n_regionkey,
        |  string_agg(n_name, '|' ORDER BY n_name) AS names
        |FROM nation GROUP BY n_regionkey ORDER BY n_regionkey""".stripMargin,
    "q85_recursive_cte" ->
      """WITH RECURSIVE tree(k, depth) AS (
        |  SELECT CAST(0 AS BIGINT) AS k, 0 AS depth
        |  UNION ALL
        |  SELECT c.c_custkey, t.depth + 1
        |  FROM customer c JOIN tree t
        |    ON CAST(FLOOR((c.c_custkey - 1) / 2.0) AS BIGINT) = t.k
        |  WHERE c.c_custkey > 0)
        |SELECT CAST(depth AS BIGINT) AS depth, COUNT(*) AS n,
        |       MIN(k) AS min_k, MAX(k) AS max_k
        |FROM tree GROUP BY depth ORDER BY depth""".stripMargin,
    "q86_map_hof" ->
      """SELECT c_custkey,
        |  (c_custkey % 7) * 2 AS da,
        |  CAST((c_custkey % 7) % 2 + (c_custkey % 5) % 2 + (c_custkey % 3) % 2
        |       AS BIGINT) AS n_odd,
        |  (c_custkey % 5) * 3 AS zb,
        |  array_to_string(list_transform(list_sort(
        |    [c_custkey % 7, c_custkey % 5, c_custkey % 3]),
        |    x -> CAST(x AS VARCHAR)), ',') AS vals
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "q87_variant_json" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |  json_extract_string(props, '$.k') AS ks,
        |  CAST(json_extract(props, '$.missing') AS BIGINT) AS miss
        |FROM events WHERE props IS NOT NULL
        |ORDER BY event_id""".stripMargin,
    "q118_scd2" ->
      """WITH dim AS (
        |  SELECT c_custkey, c_name, c_acctbal,
        |         DATE '2024-01-01' AS valid_from,
        |         CAST(NULL AS DATE) AS valid_to, 1 AS is_current
        |  FROM customer),
        |inc AS (
        |  SELECT c_custkey, c_name,
        |         CASE WHEN c_custkey % 7 = 0 THEN c_acctbal + 10
        |              ELSE c_acctbal END AS c_acctbal
        |  FROM customer
        |  UNION ALL
        |  SELECT c_custkey + 100000, c_name, c_acctbal
        |  FROM customer WHERE c_custkey < 100),
        |j AS (
        |  SELECT COALESCE(d.c_custkey, i.c_custkey) AS c_custkey,
        |         d.c_name AS dn, d.c_acctbal AS db,
        |         d.valid_from AS dvf, d.valid_to AS dvt,
        |         i.c_name AS inm, i.c_acctbal AS ib,
        |         d.c_custkey IS NOT NULL AS has_cur,
        |         i.c_custkey IS NOT NULL AS has_inc
        |  FROM dim d FULL OUTER JOIN inc i ON d.c_custkey = i.c_custkey),
        |chg AS (
        |  SELECT *, (dn IS DISTINCT FROM inm) OR (db IS DISTINCT FROM ib)
        |           AS changed
        |  FROM j)
        |SELECT c_custkey, dn AS c_name, db AS c_acctbal,
        |       dvf AS valid_from, dvt AS valid_to, 1 AS is_current
        |FROM chg WHERE has_cur AND (NOT has_inc OR NOT changed)
        |UNION ALL
        |SELECT c_custkey, dn, db, dvf, DATE '2024-06-01', 0
        |FROM chg WHERE has_cur AND has_inc AND changed
        |UNION ALL
        |SELECT c_custkey, inm, ib, DATE '2024-06-01', CAST(NULL AS DATE), 1
        |FROM chg WHERE has_inc AND (NOT has_cur OR changed)
        |ORDER BY c_custkey, valid_from, is_current""".stripMargin,
    "q117_incr_agg" ->
      """WITH a AS (
        |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
        |    SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS total,
        |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |      AS cents
        |  FROM orders GROUP BY o_custkey)
        |SELECT o_custkey, n,
        |  CAST(ROUND(total, 2) AS DOUBLE) AS total,
        |  ((2 * cents + n) // (2 * n)) / 100.0 AS avg_price
        |FROM a ORDER BY o_custkey""".stripMargin,
    "q115_funnel" ->
      """WITH fc AS (
        |  SELECT user_id, MIN(ts) AS t_click FROM events
        |  WHERE event_type = 'click' GROUP BY user_id),
        |p AS (SELECT user_id, ts AS t_buy FROM events
        |      WHERE event_type = 'purchase'),
        |conv AS (
        |  SELECT fc.user_id, fc.t_click,
        |         MIN(CASE WHEN p.t_buy >= fc.t_click THEN p.t_buy END) AS t_conv
        |  FROM fc LEFT JOIN p ON p.user_id = fc.user_id
        |  GROUP BY fc.user_id, fc.t_click)
        |SELECT CAST(COUNT(*) AS BIGINT) AS clickers,
        |       CAST(COUNT(t_conv) AS BIGINT) AS converted,
        |       ROUND(CAST(COUNT(t_conv) AS DOUBLE) / COUNT(*), 4) AS conv_rate
        |FROM conv""".stripMargin,
    "q116_retention" ->
      """WITH act AS (
        |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
        |c AS (SELECT user_id, MIN(day) AS cohort_day FROM act GROUP BY user_id),
        |w AS (SELECT DISTINCT act.user_id, c.cohort_day,
        |        CAST(FLOOR(date_diff('day', c.cohort_day, act.day) / 7.0) AS BIGINT)
        |          AS week_off
        |      FROM act JOIN c ON act.user_id = c.user_id)
        |SELECT cohort_day, week_off,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
        |FROM w GROUP BY cohort_day, week_off
        |ORDER BY cohort_day, week_off""".stripMargin,
    "q113_rolling_wau" ->
      """WITH du AS (
        |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
        |spine AS (SELECT DISTINCT day AS anchor FROM du)
        |SELECT s.anchor AS day,
        |  CAST(COUNT(DISTINCT CASE WHEN du.day = s.anchor
        |                           THEN du.user_id END) AS BIGINT) AS dau,
        |  CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS wau
        |FROM spine s JOIN du
        |  ON du.day BETWEEN s.anchor - 6 AND s.anchor
        |GROUP BY s.anchor ORDER BY day""".stripMargin,
  )
}
