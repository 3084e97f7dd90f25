package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops._
import graft.ops.GlobalStats

/** Round-4 certification queries: the skew tools get oracle rows (they
  * were implemented and unit-tested but never driver-certified — the
  * same gap the round-2 verdict flagged for as-of/range/UDAF), plus a
  * TPC-H Q3-shape join that exercises join ORDERING (two filters on two
  * different tables, three-way join, decimal top-k).
  */
object Round4 {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  // ---- Q88 (saltedResolveFk certification): the salted fact→dim join
  // must produce EXACTLY the plain-join result — the salt changes the
  // shuffle profile (hot key spread over 8 reducers), never the rows.
  // Oracle = the unsalted LEFT JOIN. Revenue in DECIMAL (§7.4.5).
  def q88(s: SparkSession, dir: String): DataFrame = {
    val fact = t(s, dir, "orders").select(
      col("o_orderkey"), col("o_custkey").as("c_custkey"), col("o_totalprice"))
    val dim = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
    saltedResolveFk(fact, dim, Seq("c_custkey"), buckets = 8)
      .groupBy(col("c_mktsegment"))
      .agg(
        count(lit(1)).as("n"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("total"))
      .orderBy("c_mktsegment")
  }

  // ---- Q89 (dedupFirstWinsSalted certification): two-phase salted
  // first-wins dedup composes (min over per-salt minima = global min),
  // so the result must equal the single-shuffle window dedup. Oracle =
  // plain ROW_NUMBER()=1. (l_orderkey, l_linenumber) is NOT unique in
  // this synthetic data — the order spans the full payload (rows are
  // unique) so it is total and the winner deterministic.
  def q89(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    dedupFirstWinsSalted(li, Seq("l_orderkey"),
      Seq(col("l_linenumber"), col("l_quantity"), col("l_extendedprice")),
      buckets = 8)
      .orderBy("l_orderkey")
  }

  // ---- Q90 (TPC-H Q3 shape): segment filter on customer, date filters
  // on orders AND lineitem, 3-way join, decimal revenue, top-10. The
  // plan to want: both date filters pushed to their scans, customer
  // broadcast, TakeOrderedAndProject for the limit (never a global
  // sort). Revenue in DECIMAL so the descending order — and therefore
  // WHICH rows make the top 10 — is bit-identical across engines.
  def q90(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("date"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val l = t(s, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("date"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val revenue = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(round(sum(revenue), 2).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  // ---- Q95 (ops.Cdc.applyChanges certification): apply a synthesized
  // changelog (updates + deletes keyed into the customer snapshot;
  // latest sequence number wins) and return the merged snapshot. The
  // oracle desugars the same semantics: ROW_NUMBER DESC = 1 per key,
  // anti-join survivors, union non-delete winners.
  def q95(s: SparkSession, dir: String): DataFrame = {
    val base = t(s, dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    val changes = t(s, dir, "orders")
      .filter(col("o_orderkey") <= 1000)
      .select(
        col("o_custkey").as("c_custkey"),
        concat(lit("u"), col("o_orderkey").cast("string")).as("c_name"),
        col("o_totalprice").as("c_acctbal"),
        when(col("o_orderkey") % 10 === 0, "delete").otherwise("update").as("op"),
        col("o_orderkey").as("seq"))
    graft.ops.Cdc.applyChanges(base, changes, Seq("c_custkey"), "op", col("seq"))
      .select(col("c_custkey"), col("c_name"), round(col("c_acctbal"), 2).as("bal"))
      .orderBy("c_custkey")
  }

  // ---- Q96 (ops.Layout.zorderKey certification): the Morton curve key
  // itself, computed with FROZEN stats literals so the oracle needs no
  // stats pass. Certifying the key certifies the clustering: the write
  // path only range-partitions and sorts on this value.
  def q96(s: SparkSession, dir: String): DataFrame = {
    val z = graft.ops.Layout.zorderKey(
      Seq(col("l_partkey"), col("l_suppkey")),
      Seq((1.0, 2000.0), (1.0, 100.0)), bitsPerCol = 16)
    t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), z.as("zkey"))
      .orderBy("l_orderkey", "l_linenumber", "zkey")
  }

  private val zorderOracle: String = {
    val bits = 16
    val stats = Seq(("l_partkey", 1.0, 2000.0), ("l_suppkey", 1.0, 100.0))
    val norms = stats.map { case (c, mn, mx) =>
      s"LEAST(GREATEST(CAST(FLOOR(((CAST($c AS DOUBLE) - $mn) / ${mx - mn}) * 65535) AS BIGINT), 0), 65535)"
    }
    val n = norms.size
    val terms = for {
      j <- 0 until bits
      (norm, i) <- norms.zipWithIndex
    } yield s"((($norm >> $j) & 1) << ${j * n + i})"
    s"""SELECT l_orderkey, l_linenumber, CAST(${terms.mkString(" | ")} AS BIGINT) AS zkey
       |FROM lineitem ORDER BY l_orderkey, l_linenumber, zkey""".stripMargin
  }

  // ---- Q97: per-rollup approx uniques from a PORTABLE HLL register
  // file — the persist-then-merge distinct pattern with a full DuckDB
  // oracle (r9 verdict item 2; the DataSketches-bytes path stays as
  // Sketches.distinctByRollup, spec-certified in LayoutSpec).
  // Registers collapse in ONE groupBy(priority, register) MAX — since
  // register MAX is associative this is bit-identical to building
  // per-(status-shard, priority) files first and MAX-merging across
  // shards (HLL union); that two-level shard-merge equality is
  // spec-proved (ExtensionsSpec "portable HLL shard merge") instead of
  // paid as an extra shuffle stage on every run (r10 verdict item 5:
  // 1.04 → target ≤0.6 s).
  def q97(s: SparkSession, dir: String): DataFrame = {
    val merged = graft.ops.Sketches.hllPortableRegisters(
      t(s, dir, "orders"), Seq("o_orderpriority"), col("o_custkey"))
    graft.ops.Sketches.hllPortableEstimate(merged, Seq("o_orderpriority"))
      .orderBy("o_orderpriority")
  }

  // ---- DataSketches-bytes CMS top-terms (library surface since r10;
  // q114 itself now runs the PORTABLE cms below): per-source CMS
  // sketches over document tokens, probed for the observed
  // (source, term) pairs and CAPPED to the top-`vocabCap` estimates
  // per source. This is the PERSISTABLE variant — spark.util.sketch
  // bytes merge across independent jobs, which the portable relational
  // form does not give you. Sketch bytes/estimates are engine-specific
  // → no hash oracle; the ε-bound vs exact counts is spec-asserted
  // (ExtensionsSpec "bytes-path CMS").
  //
  // Vocabulary cap (r4 advice): the previous shape broadcast the FULL
  // distinct-term set into a cross join — unbounded at web-scale
  // vocabulary. Now the probe set is the distributed distinct
  // (source, term) pairs (probed map-side against the k broadcast
  // sketches — a hash lookup per row), ranked per source, top-N kept.
  // Output is structurally ≤ k × vocabCap rows regardless of corpus
  // size; nothing unbounded is ever broadcast.
  def cmsTopTerms(s: SparkSession, dir: String, vocabCap: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(vocabCap >= 1)
    val toks = t(s, dir, "documents")
      .select(col("source"), explode_outer(split(col("text"), " ")).as("term"))
      .filter(col("term").isNotNull)
    // Deserialize each group's sketch ONCE and broadcast the live
    // objects; probing then costs a hash lookup per row. Running
    // cmsEstimate per row instead would readFrom() the multi-KB bytes
    // once per (source, term) — exactly the bulk-probe anti-pattern
    // the Sketches scaladoc warns about. The collect is k rows (one
    // sketch per source), not data.
    val sketches = toks.groupBy(col("source"))
      .agg(graft.ops.Sketches.cmsSketch(col("term")).as("sk"))
      .collect()
      .map { r =>
        r.getString(0) -> org.apache.spark.util.sketch.CountMinSketch
          .readFrom(new java.io.ByteArrayInputStream(r.getAs[Array[Byte]]("sk")))
      }.toMap
    val bc = s.sparkContext.broadcast(sketches)
    val probe = udf((src: String, term: String) =>
      bc.value(src).estimateCount(term))
    val w = Window.partitionBy("source").orderBy(col("est").desc, col("term"))
    toks.distinct() // observed (source, term) pairs — distributed, never collected
      .select(col("source"), col("term"),
        probe(col("source"), col("term")).as("est"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= vocabCap)
      .select("source", "term", "est")
      .orderBy("source", "term")
  }

  // r10: q114 now runs the PORTABLE count-min (full DuckDB oracle);
  // the spark.util.sketch bytes path above stays as the
  // persistable-sketch library surface (ExtensionsSpec ε-bound).
  def q114(s: SparkSession, dir: String): DataFrame =
    cmsTopTermsPortable(s, dir, vocabCap = 1000)

  /** Portable count-min sketch census (r9 verdict item 2): d = 4 hash
    * rows × w = 1024 columns, row i hashing term t to column
    * hex(md5(i‖':'‖t)[1..8]) mod 1024 — every cell and every probe an
    * exact integer, so the DuckDB oracle computes the IDENTICAL
    * estimates. est(source, term) = min over the 4 rows of that row's
    * cell sum — the classic CMS guarantee (never undercounts; over by
    * colliding terms' mass only), probed for the observed (source,
    * term) pairs and capped to the top-`vocabCap` per source.
    *
    * Better 100 TB posture than the bytes path: term counts collapse
    * map-side FIRST (one (source,term) row per distinct pair), the
    * 4-way fan-out rides distinct terms not occurrences, the cells
    * frame is structurally ≤ sources×4×1024 rows → BROADCAST to the
    * probe join, and nothing is ever collected to the driver (the
    * bytes path's k-row sketch collect is gone here).
    */
  def cmsTopTermsPortable(s: SparkSession, dir: String, vocabCap: Int): DataFrame = {
    require(vocabCap >= 1)
    val termCounts = t(s, dir, "documents")
      .select(col("source"), explode_outer(split(col("text"), " ")).as("term"))
      .filter(col("term").isNotNull)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("cnt"))
    val fanout = termCounts
      .select(col("source"), col("term"), col("cnt"),
        explode(sequence(lit(0), lit(3))).as("i"))
      .select(col("source"), col("term"), col("cnt"), col("i"),
        (conv(substring(md5(concat(col("i").cast("string"), lit(":"),
          col("term"))), 1, 8), 16, 10).cast("long") % 1024L).as("cell"))
      .localCheckpoint(true) // branched: cell sums + the probe join
    val cells = fanout.groupBy(col("source"), col("i"), col("cell"))
      .agg(sum(col("cnt")).as("cv"))
    val probed = fanout
      .join(broadcast(cells), Seq("source", "i", "cell"))
      .groupBy(col("source"), col("term"))
      .agg(min(col("cv")).as("est"))
    val w = Window.partitionBy("source").orderBy(col("est").desc, col("term"))
    probed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= vocabCap)
      .select(col("source"), col("term"), col("est"))
      .orderBy("source", "term")
  }

  // ---- Q98 (forward as-of join): for each click, the EARLIEST
  // purchase at or after it per user — q67's mirror, certifying
  // ops.AsofJoin's Forward direction against DuckDB's ASOF with a
  // `<=` condition. Right side pre-aggregated to unique (user, ts) so
  // pick-at-equal-time is unique by construction.
  def q98(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select("user_id", "event_id", "ts")
    val purchases = ev.filter(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts"))
      .agg(round(max(col("value")), 2).as("r_value"))
    graft.ops.AsofJoin.asofJoinDir(
      clicks, purchases,
      key = Seq("user_id"), leftTime = "ts", rightTime = "ts",
      direction = graft.ops.AsofJoin.Forward)
      .select(col("user_id"), col("event_id"), col("asof_r_value"))
      .orderBy("event_id", "user_id")
  }

  // ---- Q99 (interval overlap join): order-derived intervals × customer-
  // derived intervals — certifies ops.RangeJoin.intervalOverlapJoin's
  // first-shared-bucket dedup (each overlapping pair appears EXACTLY
  // once) against the plain overlap-condition join.
  def q99(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "orders")
      .filter(col("o_orderkey") <= 200)
      .select(
        col("o_orderkey"),
        (col("o_custkey") - 5).as("ls"), (col("o_custkey") + 5).as("le"))
    val ri = t(s, dir, "customer")
      .filter(col("c_custkey") <= 300)
      .select(
        col("c_custkey"),
        (col("c_custkey") - 2).as("rs"), (col("c_custkey") + 2).as("re"))
    graft.ops.RangeJoin.intervalOverlapJoin(li, ri, "ls", "le", "rs", "re", bucketWidth = 16L)
      .select("o_orderkey", "c_custkey")
      .orderBy("o_orderkey", "c_custkey")
  }

  /** q177 — TPC-H Q5 shape (local supplier volume): the six-table
    * regional revenue rollup — region filter pruning nation pruning
    * customer/supplier, the c_nationkey = s_nationkey co-locality
    * predicate riding the lineitem join, decimal-exact revenue. The
    * classic join-ORDERING stress: Catalyst must start from the
    * selective region side and broadcast the two dim tables (the
    * plan the 100 TB cluster needs — region/nation are KB-sized
    * forever, so they are declared `broadcast`).
    *
    * Deviation from the TPC text: output ordered by n_name, not by
    * the float revenue — the q60 discipline (float-ranked row order
    * is a cross-engine hash hazard; the values themselves are
    * decimal-exact).
    */
  def q177(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
      .select("r_regionkey")
    val n = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    val c = t(s, dir, "customer").select("c_custkey", "c_nationkey")
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("date") &&
        col("o_orderdate") < lit("1997-01-01").cast("date"))
      .select("o_orderkey", "o_custkey")
    val l = t(s, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val sup = t(s, dir, "supplier").select("s_suppkey", "s_nationkey")
    val revenue = col("l_extendedprice").cast("decimal(18,2)") *
      (lit(1) - col("l_discount").cast("decimal(18,2)"))
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(l, col("l_orderkey") === col("o_orderkey"))
      .join(sup, col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_lines"),
        round(sum(revenue), 2).cast("double").as("revenue"))
      .orderBy("n_name")
  }

  /** q180 — TPC-H Q18 shape (large-volume customer): orders whose
    * line quantities sum past a threshold, resolved back to their
    * customers. The classic HAVING-driven semi-reduction: the
    * lineitem agg runs FIRST and kills ~99% of orders before any
    * join touches the wide tables — at 100 TB the join inputs are
    * the filtered 1%, not the raw fact table (AQE sizes the
    * post-filter side at runtime; no forced broadcast, since the
    * survivor set scales with the data).
    *
    * l_quantity is whole-number-valued; cast to BIGINT before the
    * sum so the HAVING compare and the output are exact integers
    * (no float sum near the threshold). Output ordered by the key,
    * never by a measure (q60 float-rank discipline).
    */
  def q180(s: SparkSession, dir: String): DataFrame = {
    val big = t(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity").cast("long").as("qty"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("qty")).as("sum_qty"), count(lit(1)).as("n_lines"))
      .filter(col("sum_qty") > 250)
    t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("c_mktsegment"), col("o_orderkey"),
        col("sum_qty"), col("n_lines"))
      .orderBy("o_orderkey")
  }

  /** One FK relationship's referential-integrity + fan-out audit row.
    * Orphans are counted from the child side (anti-join semantics via
    * left join + null test on a projected key frame); fan-out stats
    * come from the HISTOGRAM of per-parent child counts — the median
    * is the q163 cumsum rank-quota over the histogram frame (distinct
    * fan values, NOT parents), so no parent-sized sort exists at any
    * scale. Every number is an exact integer.
    */
  private def fkAuditRow(rel: String, child: DataFrame, ck: String,
      parent: DataFrame, pk: String): DataFrame = {
    val ckeys = child.select(col(ck).as("__ck"))
    val pkeys = parent.select(col(pk).as("__pk"))
    val orphans = ckeys.join(pkeys, col("__ck") === col("__pk"), "left")
      .agg(sum(when(col("__pk").isNull, 1L).otherwise(0L)).as("orphan_rows"))
    val fan = pkeys
      .join(ckeys.groupBy(col("__ck")).agg(count(lit(1)).as("f")),
        col("__pk") === col("__ck"), "left")
      .select(coalesce(col("f"), lit(0L)).as("f"))
    val hist = fan.groupBy(col("f")).agg(count(lit(1)).as("np"))
    val wCum = Window.orderBy(col("f"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val stats = hist
      .withColumn("cum", sum(col("np")).over(wCum))
      .withGlobalStats(
        hist.agg(sum(col("np")).as("n_parents"),
          sum(col("f") * col("np")).as("matched_rows"),
          max(col("f")).as("fan_max"),
          sum(when(col("f") === 0, col("np")).otherwise(0L)).as("childless")))
      .filter(col("cum") * 2 >= col("n_parents"))
      .agg(max(col("n_parents")).as("n_parents"),
        max(col("matched_rows")).as("matched_rows"),
        min(col("f")).as("fan_p50"),
        max(col("fan_max")).as("fan_max"),
        max(col("childless")).as("childless_parents"))
    stats.withGlobalStats(orphans)
      .select(lit(rel).as("rel"), col("n_parents"),
        (col("matched_rows") + col("orphan_rows")).as("n_children"),
        col("orphan_rows"), col("childless_parents"),
        col("fan_p50"), col("fan_max"))
  }

  /** q184 — referential-integrity / fan-out audit over the two core
    * FK relationships (orders→customer, lineitem→orders): orphan
    * child rows, childless parents, and the min/median/max fan-out a
    * join planner actually cares about ("is this FK clean, and how
    * skewed is the fan?"). The pipeline pre-flight before trusting an
    * FK join or sizing a salt factor.
    *
    * Scale: per relationship, one child-side count agg + two
    * key-projected joins; the median rides the fan HISTOGRAM (q163
    * rank-quota over distinct fan values — never a parent-sized
    * window). The histogram cumsum window is single-partition but
    * histogram-sized (distinct fan counts, dozens of rows at any
    * scale). All outputs exact integers — bit-exact cross-engine.
    */
  def q184(s: SparkSession, dir: String): DataFrame = {
    val orders = t(s, dir, "orders")
    fkAuditRow("orders->customer", orders, "o_custkey",
        t(s, dir, "customer"), "c_custkey")
      .unionByName(fkAuditRow("lineitem->orders",
        t(s, dir, "lineitem"), "l_orderkey", orders, "o_orderkey"))
      .orderBy("rel")
  }

  /** q185 — join-key skew report ("should I salt this join?"): the
    * top-10 heaviest values of a candidate join key with each key's
    * row share and its ratio to the MEDIAN key weight — the two
    * numbers that decide between a plain shuffle join, AQE skew
    * handling, and an explicit salt (`saltedResolveFk`, q88).
    *
    * Scale: one map-side-combined key count agg; the median again
    * rides the count HISTOGRAM (q184 discipline), and the top-10 is
    * a (cnt DESC, key) total order through TakeOrderedAndProject —
    * no full sort. Share and ratio are single divisions of exact
    * integers through the e4 grid.
    */
  def q185(s: SparkSession, dir: String): DataFrame = {
    val cnt = t(s, dir, "lineitem")
      .groupBy(col("l_suppkey")).agg(count(lit(1)).as("cnt"))
    val hist = cnt.groupBy(col("cnt").as("c")).agg(count(lit(1)).as("nk"))
    val wCum = Window.orderBy(col("c"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val med = hist
      .withColumn("cum", sum(col("nk")).over(wCum))
      .withGlobalStats(hist.agg(sum(col("nk")).as("n_keys"),
        sum(col("c") * col("nk")).as("n_rows")))
      .filter(col("cum") * 2 >= col("n_keys"))
      .agg(min(col("c")).as("med_cnt"), max(col("n_rows")).as("n_rows"))
    cnt.withGlobalStats(med)
      .orderBy(col("cnt").desc, col("l_suppkey"))
      .limit(10)
      .select(col("l_suppkey"), col("cnt"),
        graft.ext.Similarity.intScaled(
          col("cnt").cast("double") / col("n_rows").cast("double"),
          1000000L).as("share_e6"),
        graft.ext.Similarity.intScaled(
          col("cnt").cast("double") / col("med_cnt").cast("double"),
          10000L).as("x_median_e4"))
      .orderBy(col("cnt").desc, col("l_suppkey"))
  }

  /** q186 — monthly order revenue with month-over-month and
    * year-over-year deltas: the reporting rollup every warehouse
    * publishes, expressed drift-free — revenue is summed as
    * decimal(18,2) and OUTPUT AS EXACT CENTS (BIGINT), so the lag
    * deltas are integer subtractions with nothing to round anywhere.
    *
    * Scale: one map-side date-trunc agg collapses orders to the
    * calendar-month frame; both lags ride ONE single-partition window
    * over that frame (months, not orders — the q170 calendar bound).
    */
  def q186(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(trunc(col("o_orderdate").cast("date"), "month").as("month"),
        col("o_totalprice").cast("decimal(18,2)").as("p"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(col("p")) * 100).cast("long").as("rev_cents"))
    val w = Window.orderBy(col("month"))
    m.select(col("month"), col("n_orders"), col("rev_cents"),
        (col("rev_cents") - lag(col("rev_cents"), 1).over(w)).as("mom_cents"),
        (col("rev_cents") - lag(col("rev_cents"), 12).over(w)).as("yoy_cents"))
      .orderBy("month")
  }

  /** q189 — cheapest supplier per part (TPC-H Q2's argmin-per-group
    * core over the lineitem price observations): for every part, the
    * supplier offering the minimum observed price, tie-broken by
    * supplier key.
    *
    * The argmin is ONE PLAIN LONG `min`: (cents, suppkey) is
    * bit-packed as `cents << 24 | suppkey`, whose numeric order IS
    * the lexicographic order — a `min(struct(...))` spells the same
    * thing but falls out of hash aggregation into SortAggregate
    * (struct mins aren't hash-agg-able), re-sorting every partition;
    * the packed long stays in HashAggregate with full map-side
    * combine (PlanAuditSpec pins this). Bounds: suppkey < 2²⁴ (16M
    * suppliers) and cents < 2³⁹ ($5.5B/line) — spec-asserted, far
    * above TPC-H's domain at any SF. Prices ride as exact cents, so
    * the compare is integer-exact.
    */
  def q189(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"),
        countDistinct(col("l_suppkey")).as("n_suppliers"),
        // In-plan domain guard: the packing is only an argmin while
        // 0 <= cents < 2^39 and 0 <= suppkey < 2^24; out-of-range data
        // at another SF must fail LOUDLY, not corrupt the winner. The
        // guard feeds the agg input, so Catalyst cannot prune it.
        min(coalesce(
          when(col("cents") < 0 || col("cents") >= lit(1L << 39) ||
            col("l_suppkey") < 0 || col("l_suppkey") >= lit(1L << 24),
            raise_error(concat(
              lit("q189 packed-argmin domain violated: cents="),
              col("cents").cast("string"),
              lit(" suppkey="), col("l_suppkey").cast("string")))
              .cast("long")),
          shiftleft(col("cents"), 24) + col("l_suppkey"))).as("packed"))
      .select(col("l_partkey"), col("n_lines"), col("n_suppliers"),
        (col("packed") % lit(1L << 24)).as("best_suppkey"),
        shiftright(col("packed"), 24).as("best_price_cents"))
      .orderBy("l_partkey")

  /** q191 — RFM customer segmentation: recency (days since last
    * order, vs the corpus max date), frequency (order count), and
    * monetary (exact cents) per customer, each scored into quintiles,
    * then rolled up per 3-digit RFM segment — the classic CRM cut.
    *
    * Determinism: every quintile runs under a (metric, custkey) TOTAL
    * order (ties pinned), and NTILE's equal-buckets-remainder-first
    * semantics are the SQL standard on both engines; recency is an
    * integer day diff, monetary exact cents — nothing floats until
    * the per-segment average, which is one division of exact
    * integers.
    *
    * Scale: customer-sized frame, but the three quintile ranks ride
    * [[graft.ops.TwoPhase.rankCum]] (round 12 — was three
    * single-partition ntile windows over the customer DIMENSION, the
    * q175 accepted-with-caveat bound); NTILE is then the exact
    * integer formula off (rank, n): the first n%5 buckets hold
    * n/5+1 rows — the SQL-standard remainder-first convention both
    * engines implement, reproduced bit-for-bit so the oracle's
    * native ntile agrees. The corpus max date is a broadcast one-row
    * frame.
    */
  def q191(s: SparkSession, dir: String): DataFrame = {
    val byCust = t(s, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("d"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("o_custkey"))
      .agg(max(col("d")).as("last_d"), count(lit(1)).as("freq"),
        sum(col("cents")).as("cents"))
    val maxD = byCust.agg(max(col("last_d")).as("max_d"))
    val scored0 = byCust.withGlobalStats(maxD)
      .withColumn("rec_days",
        datediff(col("max_d"), col("last_d")).cast("long"))
    val r3 = graft.ops.TwoPhase.rankMulti(scored0, Nil,
      Seq(("rec_days", "o_custkey", true, "rn_r"),
        ("freq", "o_custkey", true, "rn_f"),
        ("cents", "o_custkey", true, "rn_m")),
      n = Some("n"))
    // Exact NTILE(5) off (rank, n): sizes n/5 (+1 for the first n%5
    // buckets) — the remainder-first convention ntile() implements.
    def ntile5(rn: String): String =
      s"CASE WHEN $rn <= (n % 5) * (n div 5 + 1)" +
        s" THEN ($rn - 1) div (n div 5 + 1) + 1" +
        s" ELSE (n % 5) + ($rn - (n % 5) * (n div 5 + 1) - 1) div (n div 5) + 1 END"
    // cast to int: native ntile() returned IntegerType, and the output
    // schema (segment = r*100+f*10+m) must stay identical
    val scored = r3
      .withColumn("r", expr(ntile5("rn_r")).cast("int"))
      .withColumn("f", expr(ntile5("rn_f")).cast("int"))
      .withColumn("m", expr(ntile5("rn_m")).cast("int"))
    scored
      .groupBy((col("r") * 100 + col("f") * 10 + col("m")).as("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("total_cents"))
      .orderBy("segment")
  }

  /** q200 — revenue reconciliation: per order month, the header total
    * (orders.o_totalprice) vs the sum of its line items, as EXACT
    * CENTS, with the count of orders whose two sides disagree by more
    * than a cent — the warehouse's books-balance audit (a delta that
    * GROWS month-over-month is a pipeline bug, not a rounding story).
    * On this synthetic data every order mismatches (headers are
    * generated independently of lines) — that IS the true answer,
    * spec-asserted, exactly the q164-zeros pattern in reverse.
    *
    * Scale: lineitem collapses to per-order cents map-side FIRST
    * (key+cents shuffle only), then a key-projected join and a
    * months-sized agg. Everything is integer cents — nothing rounds.
    */
  def q200(s: SparkSession, dir: String): DataFrame = {
    val li = t(s, dir, "lineitem")
      .select(col("l_orderkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .groupBy(col("l_orderkey")).agg(sum(col("cents")).as("li_cents"))
    t(s, dir, "orders")
      .select(col("o_orderkey"),
        trunc(col("o_orderdate").cast("date"), "month").as("month"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("hdr_cents"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_orders"),
        sum(col("hdr_cents")).as("header_cents"),
        sum(col("li_cents")).as("lineitem_cents"),
        sum(when(abs(col("hdr_cents") - col("li_cents")) > 1, 1L)
          .otherwise(0L)).as("n_mismatched"))
      .select(col("month"), col("n_orders"), col("header_cents"),
        col("lineitem_cents"),
        (col("lineitem_cents") - col("header_cents")).as("delta_cents"),
        col("n_mismatched"))
      .orderBy("month")
  }

  /** q201 — per-segment revenue trend: ordinary-least-squares slope of
    * monthly revenue (cents) against the month index, one row per
    * market segment — "is this segment growing and how fast", the
    * regression the dashboard fits by eye.
    *
    * The q151 float discipline: all four OLS moments (Σx, Σy, Σxy,
    * Σx², n over month indices x = 12·year + month) are EXACT BIGINTs
    * carried in the output, and the slope is ONE fixed expression
    * over their doubles — bit-exact cross-engine by construction.
    *
    * Scale: orders ⋈ customer key-projected (AQE picks the join);
    * the moment agg runs over the (segment × month) frame.
    */
  def q201(s: SparkSession, dir: String): DataFrame = {
    val m = t(s, dir, "orders")
      .select(col("o_custkey"),
        (year(col("o_orderdate").cast("date")) * 12 +
          month(col("o_orderdate").cast("date"))).cast("long").as("x"),
        (col("o_totalprice").cast("decimal(18,2)") * 100)
          .cast("long").as("cents"))
      .join(t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("x"))
      .agg(sum(col("cents")).as("y"))
    m.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_months"),
        sum(col("x")).as("s_x"), sum(col("y")).as("s_y"),
        sum(col("x") * col("x")).as("s_xx"),
        sum(col("x") * col("y")).as("s_xy"))
      .select(col("c_mktsegment"), col("n_months"), col("s_x"), col("s_y"),
        col("s_xx"), col("s_xy"),
        graft.ext.Similarity.intScaled(
          (col("n_months") * col("s_xy") - col("s_x") * col("s_y"))
            .cast("double") /
            (col("n_months") * col("s_xx") - col("s_x") * col("s_x"))
              .cast("double"),
          100L).as("slope_cents_c2"))
      .orderBy("c_mktsegment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_salted_join"  -> (q88 _),
    "q89_salted_dedup" -> (q89 _),
    "q90_tpch_q3"      -> (q90 _),
    "q95_cdc_apply"    -> (q95 _),
    "q96_zorder_key"   -> (q96 _),
    "q97_hll_rollup"   -> (q97 _),
    "q114_cms_counts"  -> (q114 _),
    "q98_asof_forward" -> (q98 _),
    "q99_interval_overlap" -> (q99 _),
    "q177_tpch_q5" -> (q177 _),
    "q180_tpch_q18" -> (q180 _),
    "q184_fk_audit" -> (q184 _),
    "q185_key_skew" -> (q185 _),
    "q186_monthly_rev" -> (q186 _),
    "q189_argmin_supplier" -> (q189 _),
    "q191_rfm_segments" -> (q191 _),
    "q200_revenue_reconcile" -> (q200 _),
    "q201_revenue_trend" -> (q201 _),
  )

  val oracleSql: Map[String, String] = Map(
    // Portable HLL register file per priority — one-level max on both
    // sides since r11 (the shard-merge associativity is spec-proved in
    // ExtensionsSpec), identical estimator chain
    // (ops.Sketches.hllPortableOracleSql).
    "q97_hll_rollup" ->
      (graft.ops.Sketches.hllPortableOracleSql(
        "SELECT o_orderpriority, md5(CAST(o_custkey AS VARCHAR)) AS hx " +
          "FROM orders",
        Seq("o_orderpriority")) + "\nORDER BY o_orderpriority"),
    // Portable CMS: same md5 row-hash cells, exact integer sums,
    // min-over-rows probe, (est DESC, term) top-1000 per source.
    "q114_cms_counts" ->
      """WITH toks AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |tc AS (
        |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM toks GROUP BY source, term),
        |fan AS (
        |  SELECT source, term, cnt, CAST(i.i AS BIGINT) AS i,
        |         CAST(('0x' || substr(md5(CAST(i.i AS VARCHAR) || ':'
        |           || term), 1, 8)) AS BIGINT) % 1024 AS cell
        |  FROM tc CROSS JOIN range(4) i(i)),
        |cells AS (
        |  SELECT source, i, cell, CAST(SUM(cnt) AS BIGINT) AS cv
        |  FROM fan GROUP BY source, i, cell),
        |probed AS (
        |  SELECT f.source, f.term, CAST(MIN(c.cv) AS BIGINT) AS est
        |  FROM fan f JOIN cells c
        |    ON c.source = f.source AND c.i = f.i AND c.cell = f.cell
        |  GROUP BY f.source, f.term),
        |rk AS (
        |  SELECT source, term, est,
        |         ROW_NUMBER() OVER (PARTITION BY source
        |                            ORDER BY est DESC, term) AS rn
        |  FROM probed)
        |SELECT source, term, est FROM rk WHERE rn <= 1000
        |ORDER BY source, term""".stripMargin,
    // Integer cents on both sides; same >1-cent mismatch compare.
    "q200_revenue_reconcile" ->
      """WITH li AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS li_cents
        |  FROM lineitem GROUP BY 1),
        |o AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS hdr_cents,
        |         li.li_cents
        |  FROM orders JOIN li ON li.l_orderkey = orders.o_orderkey)
        |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_orders,
        |  CAST(SUM(hdr_cents) AS BIGINT) AS header_cents,
        |  CAST(SUM(li_cents) AS BIGINT) AS lineitem_cents,
        |  CAST(SUM(li_cents) - SUM(hdr_cents) AS BIGINT) AS delta_cents,
        |  CAST(SUM(CASE WHEN ABS(hdr_cents - li_cents) > 1 THEN 1 ELSE 0 END)
        |       AS BIGINT) AS n_mismatched
        |FROM o GROUP BY month ORDER BY month""".stripMargin,
    // Same exact BIGINT moments; the slope is the identical single
    // expression over their doubles (q151 discipline).
    "q201_revenue_trend" ->
      """WITH m AS (
        |  SELECT c.c_mktsegment,
        |         CAST(12 * EXTRACT(YEAR FROM o.o_orderdate)
        |              + EXTRACT(MONTH FROM o.o_orderdate) AS BIGINT) AS x,
        |         CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS y
        |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
        |  GROUP BY 1, 2)
        |SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_months,
        |  CAST(SUM(x) AS BIGINT) AS s_x, CAST(SUM(y) AS BIGINT) AS s_y,
        |  CAST(SUM(x * x) AS BIGINT) AS s_xx, CAST(SUM(x * y) AS BIGINT) AS s_xy,
        |  CAST(ROUND(CAST(COUNT(*) * SUM(x * y) - SUM(x) * SUM(y) AS DOUBLE)
        |             / CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE)
        |             * 100) AS BIGINT) AS slope_cents_c2
        |FROM m GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    // Identical (metric, custkey) total orders under standard NTILE;
    // integer day diff, exact cents.
    "q191_rfm_segments" ->
      """WITH c AS (
        |  SELECT o_custkey, MAX(CAST(o_orderdate AS DATE)) AS last_d,
        |         CAST(COUNT(*) AS BIGINT) AS freq,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS cents
        |  FROM orders GROUP BY 1),
        |x AS (
        |  SELECT *, date_diff('day', last_d, (SELECT MAX(last_d) FROM c))
        |           AS rec_days
        |  FROM c),
        |sc AS (
        |  SELECT cents,
        |    NTILE(5) OVER (ORDER BY rec_days, o_custkey) AS r,
        |    NTILE(5) OVER (ORDER BY freq, o_custkey) AS f,
        |    NTILE(5) OVER (ORDER BY cents, o_custkey) AS m
        |  FROM x)
        |SELECT CAST(r * 100 + f * 10 + m AS INT) AS segment,
        |  CAST(COUNT(*) AS BIGINT) AS n_customers,
        |  CAST(SUM(cents) AS BIGINT) AS total_cents
        |FROM sc GROUP BY 1 ORDER BY segment""".stripMargin,
    // The argmin as a rank-1 window (equivalent to the min-struct agg
    // under the same (cents, suppkey) total order); exact cents.
    "q189_argmin_supplier" ->
      """WITH l AS (
        |  SELECT l_partkey, l_suppkey,
        |         CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM lineitem),
        |r AS (
        |  SELECT l_partkey, l_suppkey, cents,
        |         ROW_NUMBER() OVER (PARTITION BY l_partkey
        |                            ORDER BY cents, l_suppkey) AS rn,
        |         COUNT(*) OVER (PARTITION BY l_partkey) AS n_lines,
        |         COUNT(DISTINCT l_suppkey) OVER (PARTITION BY l_partkey)
        |           AS n_suppliers
        |  FROM l)
        |SELECT l_partkey, CAST(n_lines AS BIGINT) AS n_lines,
        |  CAST(n_suppliers AS BIGINT) AS n_suppliers,
        |  l_suppkey AS best_suppkey, cents AS best_price_cents
        |FROM r WHERE rn = 1 ORDER BY l_partkey""".stripMargin,
    // Same per-relationship shape: orphan count from a left join,
    // fan stats from the per-parent count histogram, median via the
    // identical 2·cum ≥ n rank-quota. All exact integers.
    "q184_fk_audit" ->
      """WITH rel AS (
        |  SELECT 'orders->customer' AS rel, o_custkey AS ck FROM orders
        |  UNION ALL
        |  SELECT 'lineitem->orders', l_orderkey FROM lineitem),
        |par AS (
        |  SELECT 'orders->customer' AS rel, c_custkey AS pk FROM customer
        |  UNION ALL
        |  SELECT 'lineitem->orders', o_orderkey FROM orders),
        |orph AS (
        |  SELECT r.rel,
        |         CAST(SUM(CASE WHEN p.pk IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |           AS orphan_rows
        |  FROM rel r LEFT JOIN par p ON p.rel = r.rel AND p.pk = r.ck
        |  GROUP BY r.rel),
        |fan AS (
        |  SELECT p.rel, p.pk, CAST(COUNT(r.ck) AS BIGINT) AS f
        |  FROM par p LEFT JOIN rel r ON r.rel = p.rel AND r.ck = p.pk
        |  GROUP BY p.rel, p.pk),
        |hist AS (
        |  SELECT rel, f, CAST(COUNT(*) AS BIGINT) AS np
        |  FROM fan GROUP BY rel, f),
        |cum AS (
        |  SELECT rel, f, np,
        |         SUM(np) OVER (PARTITION BY rel ORDER BY f
        |                       ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(np) OVER (PARTITION BY rel) AS n_parents,
        |         SUM(f * np) OVER (PARTITION BY rel) AS matched_rows,
        |         MAX(f) OVER (PARTITION BY rel) AS fan_max,
        |         SUM(CASE WHEN f = 0 THEN np ELSE 0 END)
        |           OVER (PARTITION BY rel) AS childless
        |  FROM hist),
        |stats AS (
        |  SELECT rel, CAST(MAX(n_parents) AS BIGINT) AS n_parents,
        |         CAST(MAX(matched_rows) AS BIGINT) AS matched_rows,
        |         CAST(MIN(f) AS BIGINT) AS fan_p50,
        |         CAST(MAX(fan_max) AS BIGINT) AS fan_max,
        |         CAST(MAX(childless) AS BIGINT) AS childless_parents
        |  FROM cum WHERE cum * 2 >= n_parents GROUP BY rel)
        |SELECT s.rel, s.n_parents,
        |  CAST(s.matched_rows + o.orphan_rows AS BIGINT) AS n_children,
        |  o.orphan_rows, s.childless_parents, s.fan_p50, s.fan_max
        |FROM stats s JOIN orph o ON o.rel = s.rel
        |ORDER BY s.rel""".stripMargin,
    // Same histogram-median + (cnt DESC, key) total order; share and
    // ratio are single exact-integer divisions.
    "q185_key_skew" ->
      """WITH cnt AS (
        |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS cnt
        |  FROM lineitem GROUP BY 1),
        |hist AS (SELECT cnt AS c, CAST(COUNT(*) AS BIGINT) AS nk
        |         FROM cnt GROUP BY 1),
        |cum AS (
        |  SELECT c, SUM(nk) OVER (ORDER BY c ROWS UNBOUNDED PRECEDING) AS cum,
        |         SUM(nk) OVER () AS n_keys, SUM(c * nk) OVER () AS n_rows
        |  FROM hist),
        |med AS (
        |  SELECT CAST(MIN(c) AS BIGINT) AS med_cnt,
        |         CAST(MAX(n_rows) AS BIGINT) AS n_rows
        |  FROM cum WHERE cum * 2 >= n_keys)
        |SELECT l_suppkey, cnt,
        |  CAST(ROUND(CAST(cnt AS DOUBLE) / CAST(n_rows AS DOUBLE) * 1000000)
        |       AS BIGINT) AS share_e6,
        |  CAST(ROUND(CAST(cnt AS DOUBLE) / CAST(med_cnt AS DOUBLE) * 10000)
        |       AS BIGINT) AS x_median_e4
        |FROM cnt, med
        |ORDER BY cnt DESC, l_suppkey LIMIT 10""".stripMargin,
    // Exact cents (decimal sum × 100 → BIGINT); lag deltas are
    // integer subtractions over the same month order.
    "q186_monthly_rev" ->
      """WITH m AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |         CAST(COUNT(*) AS BIGINT) AS n_orders,
        |         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT)
        |           AS rev_cents
        |  FROM orders GROUP BY 1)
        |SELECT month, n_orders, rev_cents,
        |  rev_cents - LAG(rev_cents, 1) OVER (ORDER BY month) AS mom_cents,
        |  rev_cents - LAG(rev_cents, 12) OVER (ORDER BY month) AS yoy_cents
        |FROM m ORDER BY month""".stripMargin,
    // Exact BIGINT quantity sums on both sides of the HAVING; ordered
    // by the order key.
    "q180_tpch_q18" ->
      """WITH big AS (
        |  SELECT l_orderkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |         CAST(COUNT(*) AS BIGINT) AS n_lines
        |  FROM lineitem GROUP BY 1
        |  HAVING SUM(CAST(l_quantity AS BIGINT)) > 250)
        |SELECT c.c_custkey, c.c_mktsegment, o.o_orderkey, b.sum_qty, b.n_lines
        |FROM big b
        |JOIN orders o ON o.o_orderkey = b.l_orderkey
        |JOIN customer c ON c.c_custkey = o.o_custkey
        |ORDER BY o.o_orderkey""".stripMargin,
    // Decimal-exact revenue like q90; ordered by n_name (the q60
    // discipline), values identical by exact decimal arithmetic.
    "q177_tpch_q5" ->
      """SELECT n.n_name, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |  CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                 (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
        |       AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |               AND c.c_nationkey = s.s_nationkey
        |JOIN nation n ON s.s_nationkey = n.n_nationkey
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |WHERE r.r_name = 'ASIA'
        |  AND o.o_orderdate >= DATE '1996-01-01'
        |  AND o.o_orderdate < DATE '1997-01-01'
        |GROUP BY n.n_name ORDER BY n_name""".stripMargin,
    "q88_salted_join" ->
      """SELECT c.c_mktsegment, COUNT(*) AS n,
        |       CAST(ROUND(SUM(CAST(o.o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total
        |FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
        |GROUP BY c.c_mktsegment ORDER BY c_mktsegment""".stripMargin,
    "q89_salted_dedup" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice FROM (
        |  SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice,
        |         ROW_NUMBER() OVER (PARTITION BY l_orderkey
        |                            ORDER BY l_linenumber, l_quantity, l_extendedprice) AS rn
        |  FROM lineitem) WHERE rn = 1 ORDER BY l_orderkey""".stripMargin,
    "q90_tpch_q3" ->
      """SELECT l.l_orderkey, CAST(o.o_orderdate AS DATE) AS o_orderdate,
        |       CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,2)) *
        |                      (1 - CAST(l.l_discount AS DECIMAL(18,2)))), 2)
        |            AS DOUBLE) AS revenue
        |FROM customer c
        |JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |  AND o.o_orderdate < DATE '1998-01-01'
        |  AND l.l_shipdate > DATE '1998-01-01'
        |GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE)
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q95_cdc_apply" ->
      """WITH ch AS (
        |  SELECT o_custkey AS c_custkey,
        |         'u' || CAST(o_orderkey AS VARCHAR) AS c_name,
        |         o_totalprice AS c_acctbal,
        |         CASE WHEN o_orderkey % 10 = 0 THEN 'delete' ELSE 'update' END AS op,
        |         o_orderkey AS seq
        |  FROM orders WHERE o_orderkey <= 1000),
        |latest AS (
        |  SELECT c_custkey, c_name, c_acctbal, op FROM (
        |    SELECT *, ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY seq DESC) AS rn
        |    FROM ch) WHERE rn = 1)
        |SELECT c_custkey, c_name, ROUND(c_acctbal, 2) AS bal FROM (
        |  SELECT c.c_custkey, c.c_name, c.c_acctbal FROM customer c
        |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.c_custkey = c.c_custkey)
        |  UNION ALL
        |  SELECT c_custkey, c_name, c_acctbal FROM latest WHERE lower(op) <> 'delete')
        |ORDER BY c_custkey""".stripMargin,
    "q96_zorder_key" -> zorderOracle,
    "q98_asof_forward" ->
      """WITH l AS (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click'),
        |     r AS (SELECT user_id, ts, ROUND(MAX(value), 2) AS asof_r_value
        |           FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT l.user_id, l.event_id, r.asof_r_value
        |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts <= r.ts
        |ORDER BY l.event_id, l.user_id""".stripMargin,
    "q99_interval_overlap" ->
      """SELECT l.o_orderkey, r.c_custkey
        |FROM (SELECT o_orderkey, o_custkey - 5 AS ls, o_custkey + 5 AS le
        |      FROM orders WHERE o_orderkey <= 200) l
        |JOIN (SELECT c_custkey, c_custkey - 2 AS rs, c_custkey + 2 AS re
        |      FROM customer WHERE c_custkey <= 300) r
        |ON l.ls <= r.re AND r.rs <= l.le
        |ORDER BY o_orderkey, c_custkey""".stripMargin,
  )
}
