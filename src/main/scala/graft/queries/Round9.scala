package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.GlobalStats

/** Round-9 report shapes: the last two classic TPC-H correlated-
  * subquery reports (Q21 waiting-suppliers, Q22 global-avg + NOT
  * EXISTS), adapted to the fixture schema (reference capability:
  * the J2 existence logic of `/root/reference/migration.py:179-212`
  * generalized to multi-predicate correlation, like q73-q75).
  *
  * Declared in SQL so Catalyst's decorrelation does the planning:
  * EXISTS lowers to a left-semi hash join, NOT EXISTS to a left-anti
  * join (null-safe not needed — keys are non-null by construction),
  * and the one-row scalar-subquery frames ride the accepted one-row
  * broadcast shape. PlanAuditSpec pins all of that (no cartesian, no
  * per-row probe loops).
  */
object Round9 {
  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.table(s, dir, name)

  /** q215 — TPC-H Q21 shape (waiting suppliers): for finished orders,
    * suppliers whose line was returned ('R' — the fixture's "failed
    * the order" flag; the schema carries no receipt/commit dates)
    * while the order had OTHER suppliers and NONE of them had a
    * returned line — the "sole supplier who kept the order waiting"
    * report, nation-scoped.
    *
    * Scale: both correlated subqueries decorrelate to joins on
    * l_orderkey against a two-column lineitem projection — no
    * per-order probe loop. The nation filter broadcasts into the
    * supplier dim BEFORE the fact join (1/25 of suppliers survive);
    * the final top-100 is TakeOrderedAndProject (numwait DESC with
    * the unique s_name tiebreak — deterministic), never a global
    * sort. COUNT is exact integer; no float anywhere.
    */
  def q215(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("w_lineitem")
    t(s, dir, "orders").createOrReplaceTempView("w_orders")
    t(s, dir, "supplier").createOrReplaceTempView("w_supplier")
    t(s, dir, "nation").createOrReplaceTempView("w_nation")
    s.sql(
      """SELECT s_name, COUNT(*) AS numwait
        |FROM w_supplier
        |JOIN w_lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN w_orders ON o_orderkey = l1.l_orderkey
        |JOIN w_nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM w_lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM w_lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin)
  }

  /** q216 — TPC-H Q22 shape (global customers): bucket customers by a
    * fixed-position substring code (the fixture's `c_name` is
    * fixed-width `Customer#dddddddddd`, so chars 17-18 are the last
    * two digits — the schema carries no phone column), keep the
    * watched codes, and report per code the count and balance of
    * customers who (a) placed no RECENT order (NOT EXISTS with a date
    * predicate → anti join on the date-pruned orders slice; the
    * fixture has zero fully order-less customers at every SF, so the
    * classic "never ordered" form would certify an empty frame) and
    * (b) sit above the positive-balance average of the watched
    * population.
    *
    * Float discipline: `bal > avg(bal)` is re-expressed as the exact
    * integer predicate `cents·n > sum_cents` (n > 0 always — the
    * watched buckets contain positive balances at every SF ≥ the
    * fixtures'; an empty population would return zero rows in both
    * engines anyway since the join frame is empty). No double ever
    * crosses an engine boundary.
    *
    * Scale: the threshold frame is ONE row (broadcast by
    * construction); the anti join shuffles a one-column orders
    * projection against the ~7% watched-customer slice; output is
    * bounded by the code list.
    */
  def q216(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("cc_customer")
    t(s, dir, "orders").createOrReplaceTempView("cc_orders")
    s.sql(
      """WITH pos AS (
        |  SELECT SUBSTR(c_name, 17, 2) AS code, c_custkey,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM cc_customer
        |  WHERE SUBSTR(c_name, 17, 2) IN
        |        ('13','31','23','29','30','18','17')),
        |thr AS (
        |  SELECT COUNT(*) AS n, CAST(SUM(cents) AS BIGINT) AS s
        |  FROM pos WHERE cents > 0)
        |SELECT code, COUNT(*) AS numcust,
        |       CAST(SUM(cents) AS BIGINT) AS tot_cents
        |FROM pos CROSS JOIN thr
        |WHERE cents * n > s
        |  AND NOT EXISTS (SELECT 1 FROM cc_orders
        |                  WHERE o_custkey = pos.c_custkey
        |                    AND o_orderdate >= DATE '2001-01-01')
        |GROUP BY code
        |ORDER BY code""".stripMargin)
  }

  /** q217 — TPC-H Q2 shape (min-cost supplier): the fixture has no
    * `partsupp`, so the part↔supplier cost relation is derived from
    * observed trade — per (part, supplier) the MIN line price in exact
    * cents. For size-15 ECONOMY parts, report the EUROPE suppliers
    * whose cost equals the part's EUROPE-wide minimum (correlated
    * scalar-subquery recorrelation through supplier→nation→region,
    * the shape Q2 exists to exercise; reference capability: the J1
    * dim-resolution joins of `/root/reference/migration.py:115-158`
    * composed with an argmin, like q189's packed-long variant but
    * expressed as Catalyst decorrelation rather than a manual agg).
    *
    * Scale: `cost` is one (part,supp) hash agg over lineitem; the
    * correlated MIN decorrelates to a per-part agg joined back —
    * two shuffles on partkey, no per-row probe. The size/type filter
    * prunes part BEFORE the join (7 parts at sf0.01); region/nation
    * are broadcast dims. Exact cents only — no double crosses the
    * engine boundary. Deterministic total order (part,supplier is
    * unique per row) so LIMIT is stable at any SF.
    */
  def q217(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("mc_lineitem")
    t(s, dir, "part").createOrReplaceTempView("mc_part")
    t(s, dir, "supplier").createOrReplaceTempView("mc_supplier")
    t(s, dir, "nation").createOrReplaceTempView("mc_nation")
    t(s, dir, "region").createOrReplaceTempView("mc_region")
    // r18 (guide §2.4): the correlated MIN subquery made the planner
    // inline the fact-sized `cost` aggregation TWICE (outer chain +
    // de-correlated subquery — two full lineitem scans/aggs in the
    // before-plan). Both the outer rows and the subquery's domain are
    // the SAME Europe-restricted (part, supplier) cost frame, so one
    // per-part window MIN over it is the identical predicate: a row
    // survives iff its cost equals the minimum European cost for its
    // part. Same rows, same total order, one fact agg.
    s.sql(
      """WITH cost AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS cost_cents
        |  FROM mc_lineitem GROUP BY 1, 2),
        |euro AS (
        |  SELECT cost.partkey, cost.cost_cents, s_name, s_acctbal, n_name
        |  FROM cost, mc_supplier, mc_nation, mc_region
        |  WHERE s_suppkey = cost.suppkey AND s_nationkey = n_nationkey
        |    AND n_regionkey = r_regionkey AND r_name = 'EUROPE'),
        |best AS (
        |  SELECT partkey, cost_cents, s_name, s_acctbal, n_name,
        |         MIN(cost_cents) OVER (PARTITION BY partkey) AS min_cost
        |  FROM euro)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         AS bal_cents,
        |       s_name, n_name, p_partkey, cost_cents
        |FROM mc_part JOIN best ON p_partkey = best.partkey
        |WHERE p_size = 15 AND p_type = 'ECONOMY'
        |  AND cost_cents = min_cost
        |ORDER BY bal_cents DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin)
  }

  /** q218 — TPC-H Q4 shape (order-priority checking): orders placed in
    * 1996-Q3 counted per priority, kept only if at least one of their
    * lines was returned ('R' — the fixture's late/failed flag; the
    * schema carries no commit/receipt dates). EXISTS lowers to a
    * left-semi join on a two-column lineitem projection; the quarter
    * filter is a pushed parquet predicate that prunes orders BEFORE
    * the semi join. Exact integer counts; 5-row output.
    */
  def q218(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("op_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("op_lineitem")
    s.sql(
      """SELECT o_orderpriority, COUNT(*) AS order_count
        |FROM op_orders
        |WHERE o_orderdate >= DATE '1996-07-01'
        |  AND o_orderdate <  DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM op_lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin)
  }

  /** q219 — TPC-H Q6 shape (forecast-revenue change): the pure
    * scan-filter-agg report. Revenue is Σ price·discount computed in
    * exact integer units — cents × basis points (the fixture's
    * discounts are exact hundredths, so DECIMAL(4,2)·100 is lossless)
    * — one BIGINT row, no double anywhere. All three predicates and
    * the two used columns reach the parquet scan (pushed filters +
    * pruned ReadSchema); the agg is a map-side partial. Overflow
    * discipline (q206): cents·bp ≤ ~7·10⁷ per line, so a BIGINT Σ
    * dies near 10¹¹ lines — plausible at 100 TB — hence the
    * decimal(38) accumulator; only the final cast is BIGINT.
    */
  def q219(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("fr_lineitem")
    s.sql(
      """SELECT CAST(SUM(CAST(cents * bp AS DECIMAL(38,0))) AS BIGINT)
        |         AS revenue_cent_bp
        |FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT) AS cents,
        |             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                  AS BIGINT) AS bp
        |      FROM fr_lineitem
        |      WHERE l_shipdate >= DATE '1997-01-01'
        |        AND l_shipdate <  DATE '1998-01-01'
        |        AND l_quantity < 24) t
        |WHERE bp BETWEEN 5 AND 7""".stripMargin)
  }

  /** q220 — TPC-H Q11 shape (important stock): no `partsupp`, so a
    * part's "held value" for NATION_7 suppliers is the exact-cents sum
    * of their lines for that part; report parts holding more than
    * 0.1% of the nation's total. The fraction predicate is the exact
    * integer cross-multiplication `cents·1000 > total` — no division,
    * no double. Scale: one (partkey) hash agg after a broadcast-dim
    * prune (supplier⋈nation filters 1/25 of suppliers before the fact
    * join); the total is a ONE-row frame riding the accepted one-row
    * broadcast crossJoin shape. Overflow headroom: lines-per-part is
    * SF-invariant (~30-60), so per-part cents stay ~10⁹ and
    * cents·1000 ~10¹²; the national total approaches BIGINT limits
    * only past ~300 TB — the decimal(38) swap point (q206).
    */
  def q220(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("iv_lineitem")
    t(s, dir, "supplier").createOrReplaceTempView("iv_supplier")
    t(s, dir, "nation").createOrReplaceTempView("iv_nation")
    s.sql(
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS cents
        |  FROM iv_lineitem
        |  JOIN iv_supplier ON l_suppkey = s_suppkey
        |  JOIN iv_nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY 1),
        |tot AS (SELECT SUM(cents) AS t FROM val)
        |SELECT partkey, cents FROM val CROSS JOIN tot
        |WHERE cents * 1000 > t
        |ORDER BY cents DESC, partkey""".stripMargin)
  }

  /** q221 — TPC-H Q12 shape (shipping-latency priority audit): the
    * fixture has no ship modes, so lines are classed by realized
    * latency — SLOW if shipped more than 60 days after the order date
    * (`datediff` on midnight-aligned timestamps is exact integer days
    * in both engines), FAST otherwise — and each class counts
    * high-priority vs other orders, Q12's two conditional sums.
    * Scale: the year filter prunes lineitem at the scan; the join
    * shuffles on orderkey; output is 2 rows.
    */
  def q221(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "orders").createOrReplaceTempView("sl_orders")
    t(s, dir, "lineitem").createOrReplaceTempView("sl_lineitem")
    s.sql(
      """SELECT CASE WHEN datediff(l_shipdate, o_orderdate) > 60
        |            THEN 'SLOW' ELSE 'FAST' END AS ship_class,
        |       SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS high_line_count,
        |       SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH')
        |                THEN 1 ELSE 0 END) AS low_line_count
        |FROM sl_orders JOIN sl_lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate <  DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin)
  }

  /** q222 — TPC-H Q13 shape (customer order-count distribution): LEFT
    * join customers to their non-'5-LOW' orders (the join-side filter
    * stands in for Q13's comment NOT LIKE), count per customer, then
    * histogram the counts — the classic double aggregation whose
    * outer key (c_count) is system-generated. Zero-order customers
    * survive via the left join exactly as in Q13. Scale: shuffle on
    * custkey then on c_count (a ≤ hundreds-cardinality key); both
    * aggs are partial-combine friendly. Deterministic order: c_count
    * is unique per output row.
    */
  def q222(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "customer").createOrReplaceTempView("cd_customer")
    t(s, dir, "orders").createOrReplaceTempView("cd_orders")
    s.sql(
      """WITH c_orders AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM cd_customer
        |  LEFT JOIN cd_orders ON c_custkey = o_custkey
        |                      AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT c_count, COUNT(*) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin)
  }

  /** q223 — TPC-H Q15 shape (top supplier): revenue per supplier over
    * 1997-Q1 in exact cent·pct units (cents × (100−bp), summed as
    * DECIMAL(38,0) — the q206 overflow discipline: BIGINT headroom
    * ends near 10¹⁴ lines, decimal does not), then keep the
    * supplier(s) equal to the MAX — Q15's view + scalar-subquery
    * equality, exact because the units are integers (double revenue
    * would make `= MAX` a coin flip). The rev frame is computed twice
    * (once for MAX — a one-row broadcast — once for the join); both
    * are one (suppkey) agg over the quarter-pruned scan.
    */
  def q223(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("ts_lineitem")
    t(s, dir, "supplier").createOrReplaceTempView("ts_supplier")
    s.sql(
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)
        |                  * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                             AS BIGINT))
        |                  AS DECIMAL(38,0))) AS rev
        |  FROM ts_lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate <  DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev AS BIGINT) AS total_rev_centpct
        |FROM ts_supplier JOIN rev ON s_suppkey = suppkey
        |WHERE rev = (SELECT MAX(rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin)
  }

  /** q224 — TPC-H Q16 shape (supplier-part offering counts): per
    * (brand, type, size) over Q16's canonical size list, the count of
    * distinct suppliers observed shipping that part, excluding one
    * brand and — Q16's NOT IN twist — suppliers on a denylist (the
    * fixture's negative-balance suppliers standing in for "customer
    * complaints"). The NOT IN compiles to Spark's null-aware anti
    * join against a ~6-row broadcast. Scale: distinct-count shuffles
    * (brand,type,size,suppkey) pairs — supplier-bounded, not
    * line-bounded; part prunes at the scan on the size list.
    */
  def q224(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("sc_lineitem")
    t(s, dir, "part").createOrReplaceTempView("sc_part")
    t(s, dir, "supplier").createOrReplaceTempView("sc_supplier")
    s.sql(
      """SELECT p_brand, p_type, p_size,
        |       COUNT(DISTINCT l_suppkey) AS supplier_cnt
        |FROM sc_lineitem JOIN sc_part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 9, 15, 22, 30, 44, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM sc_supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin)
  }

  /** q225 — TPC-H Q19 shape (discounted revenue, disjunctive
    * predicate): three brand×quantity×size bands OR'd together across
    * the part join — the query optimizers exist to get wrong (the
    * join key must stay an equi-join with the disjunction as a
    * residual filter, not explode into a union or a nested loop).
    * Revenue in exact cent·pct (decimal-summed, q206 discipline),
    * one BIGINT row. Catalyst extracts the common `p_brand IN (...)`
    * / quantity bounds into pushable conjuncts; PlanAuditSpec pins
    * the no-cartesian property globally.
    */
  def q225(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("dr_lineitem")
    t(s, dir, "part").createOrReplaceTempView("dr_part")
    s.sql(
      """SELECT CAST(SUM(CAST(cents * (100 - bp) AS DECIMAL(38,0)))
        |            AS BIGINT) AS revenue_centpct
        |FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT) AS cents,
        |             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                  AS BIGINT) AS bp,
        |             l_quantity, p_brand, p_size
        |      FROM dr_lineitem JOIN dr_part ON p_partkey = l_partkey) t
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin)
  }

  /** q226 — TPC-H Q20 shape (dominant suppliers of small parts): no
    * `partsupp.availqty`, so Q20's "excess stock" predicate becomes
    * its trade-side mirror — suppliers who shipped MORE THAN HALF of
    * a 'small%' part's total 1997 volume (`qty·2 > part_total`, exact
    * integers; quantities are integral by fixture construction),
    * surfaced through Q20's nested IN chain and nation-scoped. The
    * per-part share predicate is SF-stable (per-part supplier counts
    * don't grow with corpus size), unlike a global-fraction cut.
    * Scale: `shipped` is one (supp,part) agg over the name+year-
    * pruned join; `ptot` re-aggregates it per part (tiny); the IN
    * lowers to a semi join on suppkey.
    */
  def q226(s: SparkSession, dir: String): DataFrame = {
    t(s, dir, "lineitem").createOrReplaceTempView("ds_lineitem")
    t(s, dir, "part").createOrReplaceTempView("ds_part")
    t(s, dir, "supplier").createOrReplaceTempView("ds_supplier")
    t(s, dir, "nation").createOrReplaceTempView("ds_nation")
    s.sql(
      """WITH shipped AS (
        |  SELECT l_suppkey AS suppkey, l_partkey AS partkey,
        |         SUM(CAST(l_quantity AS BIGINT)) AS qty
        |  FROM ds_lineitem JOIN ds_part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate <  DATE '1998-01-01'
        |  GROUP BY 1, 2),
        |ptot AS (SELECT partkey, SUM(qty) AS t FROM shipped GROUP BY 1)
        |SELECT s_name, n_name
        |FROM ds_supplier JOIN ds_nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  AND s_suppkey IN (SELECT suppkey
        |                    FROM shipped JOIN ptot USING (partkey)
        |                    WHERE qty * 2 > t)
        |ORDER BY s_name""".stripMargin)
  }

  /** q245 — per-brand SKYLINE (Pareto frontier) of parts on
    * (price ↓, size ↑): the parts no same-brand part strictly
    * dominates (cheaper-or-equal AND bigger-or-equal with one strict).
    * The classic multi-criteria shortlist operator (Börzsönyi et al.,
    * ICDE 2001 "The Skyline Operator") — "show me the offers where
    * nothing is both cheaper and bigger".
    *
    * NOT the O(n²) NOT-EXISTS self-join: points collapse to the
    * distinct (brand, price, size) grid first, then ONE per-brand
    * window pass ordered (price ASC, size DESC) marks a point
    * dominated iff the running max size over STRICTLY-PRECEDING rows
    * reaches its size — sound because every preceding row is either
    * strictly cheaper (dominates iff its size ≥ this size) or
    * equal-priced with strictly larger size (dominates outright); the
    * oracle proves the equivalence by running the quadratic definition
    * independently. All-integer (exact cents, integer sizes).
    *
    * Scale: the window runs per brand over the VALUE-COLLAPSED grid —
    * bounded by distinct (price, size) combinations (price-grid ×
    * size-domain, constant in SF — the q238 posture), never row count;
    * the frontier emerges in one pass with no pairwise anything.
    */
  def q245(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val pts = t(s, dir, "part")
      .select(col("p_brand").as("brand"),
        (col("p_retailprice").cast("decimal(18,2)") * 100).cast("long")
          .as("price_c"),
        col("p_size").cast("long").as("sz"))
      .groupBy(col("brand"), col("price_c"), col("sz"))
      .agg(count(lit(1)).as("n_parts"))
    val w = Window.partitionBy("brand")
      .orderBy(col("price_c").asc, col("sz").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    pts.withColumn("prevmax", max(col("sz")).over(w))
      .filter(col("prevmax").isNull || col("prevmax") < col("sz"))
      .select(col("brand"), col("price_c"), col("sz"), col("n_parts"))
      .orderBy("brand", "price_c")
  }

  /** q277 — revenue Pareto point per nation: the share of order
    * revenue held by the TOP DECILE of ordering customers (ceil(n/10)
    * under the (cents DESC, custkey) total order) — the "is this an
    * 80/20 market" concentration read, the customer-revenue analogue
    * of the event-side Gini/HHI monitors (q182/q194). Customers
    * without orders don't rank (inner join by construction).
    *
    * Exactness: revenue is exact cents (decimal(18,2)·100 → BIGINT);
    * the decile cut is the INTEGER (n+9) DIV 10 — no double ever
    * touches the rank boundary; the share is one division e6-gridded.
    *
    * Scale: orders collapse map-side to per-customer cents BEFORE the
    * customer/nation joins (the q268 shape); the rank window is keyed
    * by nation over the per-customer frame. Sums ride decimal(38) —
    * BIGINT total cents wraps near 10¹⁷ cents, live at 100 TB.
    */
  def q277(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d38 = "decimal(38,0)"
    val pc = t(s, dir, "orders")
      .select(col("o_custkey"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy("o_custkey").agg(sum(col("cents")).as("cust_cents"))
    val j = pc
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .select(col("n_name"), col("o_custkey"), col("cust_cents"))
    val w = Window.partitionBy("n_name")
      .orderBy(col("cust_cents").desc, col("o_custkey"))
    val wn = Window.partitionBy("n_name")
    j.withColumn("rk", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(wn))
      .withColumn("cut", expr("(n + 9) DIV 10"))
      .groupBy("n_name")
      .agg(max(col("n")).as("n_customers"),
        max(col("cut")).as("top_decile_n"),
        sum(col("cust_cents").cast(d38)).as("tot"),
        sum(when(col("rk") <= col("cut"), col("cust_cents").cast(d38))
          .otherwise(lit(0).cast(d38))).as("top"))
      .select(col("n_name"), col("n_customers"), col("top_decile_n"),
        col("tot").cast("long").as("total_cents"),
        col("top").cast("long").as("top_cents"),
        graft.ext.Similarity.intScaled(
          col("top").cast("double") / col("tot").cast("double"),
          1000000L).as("pareto_e6"))
      .orderBy("n_name")
  }

  /** q284 — brand sourcing-concentration audit: per part brand, the
    * Herfindahl–Hirschman index of supplier quantity shares — the
    * continuous single-source-risk score that q226's ">½ dominant
    * supplier" census thresholds (HHI reads the whole concentration
    * spectrum: 1/n_suppliers = perfectly spread, 1.0 = sole-sourced).
    * Procurement dashboards alert on HHI > 0.25.
    *
    * Exactness: quantities are exact integers (cast long); HHI =
    * Σqᵢ²/Q² is ONE mirrored double division of decimal(38) integers
    * (Σq² wraps BIGINT once a brand passes ~3×10⁹ total quantity),
    * e6-gridded.
    *
    * Scale: lineitem collapses map-side to the (brand, suppkey) frame
    * after a broadcast part-dim join; everything after is
    * brand-bounded arithmetic. No windows.
    */
  def q284(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val bs = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"), col("l_suppkey"),
        col("l_quantity").cast("long").as("q"))
      .groupBy("brand", "l_suppkey")
      .agg(sum(col("q")).as("sq"))
    bs.groupBy("brand")
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("sq")).as("total_qty"),
        sum(col("sq").cast(d38) * col("sq")).as("ss"))
      .select(col("brand"), col("n_suppliers"), col("total_qty"),
        graft.ext.Similarity.intScaled(
          col("ss").cast("double") /
            (col("total_qty").cast(d38) * col("total_qty")).cast("double"),
          1000000L).as("hhi_e6"))
      .orderBy("brand")
  }

  /** q285 — Cramér's V over the (brand × type) contingency of the
    * part catalog: the EFFECT-SIZE summary the chi-square family
    * stops short of (q205 scores cell surprise, q258 gates discovery
    * rate; V = sqrt(χ²/(n·min(r−1,c−1))) says how STRONG the
    * association is on a 0–1 scale, comparable across tables of any
    * size). Near 0 on this catalog = brands carry no type signal —
    * the null-calibration read.
    *
    * Exactness: observed and marginal counts are exact integers; each
    * cell's χ² term (o−e)²/e is ONE mirrored double expression
    * e9-gridded BEFORE the sum (q232 discipline); V is one mirrored
    * sqrt of the gridded sum over n·min(r−1,c−1), NULL-guarded when a
    * dimension is single-valued (zero degrees of freedom — ANSI
    * division would otherwise raise).
    *
    * Scale: one part-dim scan collapses to the (brand × type) grid
    * (both value-bounded); marginals ride grid windows; output is ONE
    * row.
    */
  def q285(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = t(s, dir, "part")
      .select(col("p_brand").as("brand"), col("p_type").as("band"))
      .groupBy("brand", "band").agg(count(lit(1)).as("o"))
    val wr = Window.partitionBy("brand")
    val wc = Window.partitionBy("band")
    val wa = Window.partitionBy()
    val e = col("r").cast("double") * col("c").cast("double") /
      col("n").cast("double")
    val withM = cells
      .withColumn("r", sum(col("o")).over(wr))
      .withColumn("c", sum(col("o")).over(wc))
      .withColumn("n", sum(col("o")).over(wa))
      .withColumn("nr", size(collect_set(col("brand")).over(wa)))
      .withColumn("nc", size(collect_set(col("band")).over(wa)))
      .select(col("n"), col("nr"), col("nc"),
        graft.ext.Similarity.intScaled(
          (col("o").cast("double") - e) * (col("o").cast("double") - e) / e,
          1000000000L).as("term_e9"))
    withM.groupBy("n", "nr", "nc")
      .agg(count(lit(1)).as("n_cells"), sum(col("term_e9")).as("chi2_e9"))
      .select(col("n").as("n_parts"), col("n_cells"), col("chi2_e9"),
        graft.ext.Similarity.intScaled(
          when(least(col("nr") - 1, col("nc") - 1) > 0,
            sqrt((col("chi2_e9").cast("double") / lit(1000000000.0)) /
              (col("n").cast("double") *
                least(col("nr") - 1, col("nc") - 1).cast("double")))),
          1000000L).as("cramers_v_e6"))
  }

  /** q286 — discount→volume correlation per brand: Pearson r between
    * line discount and quantity over each brand's lineitems — the
    * first-order "does discounting move volume here" elasticity
    * screen (q201 fits a revenue TREND over time; this reads the
    * cross-sectional discount response). |r| near 0 on synthetic
    * uniform data is itself the null-calibration check.
    *
    * Exactness: discount is data-exact at 2 decimals → integer
    * basis points (decimal(4,2)·100), quantity integer; all five
    * moments are exact decimal(38) sums; r's numerator/denominator
    * are exact integers into ONE mirrored sqrt+division, e6-gridded,
    * NULL-guarded on zero variance (exact integer test).
    *
    * Scale: one lineitem scan with a broadcast part join, map-side
    * partial aggs to the brand frame; no windows, no pairs.
    */
  def q286(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val li = t(s, dir, "lineitem")
      .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        (col("l_discount").cast("decimal(4,2)") * 100).cast("long").as("x"),
        col("l_quantity").cast("long").as("y"))
    val agg = li.groupBy("brand").agg(
      count(lit(1)).as("n"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x").cast(d38) * col("x")).as("sxx"),
      sum(col("y").cast(d38) * col("y")).as("syy"),
      sum(col("x").cast(d38) * col("y")).as("sxy"))
    val num = col("n").cast(d38) * col("sxy") -
      col("sx").cast(d38) * col("sy")
    val vx = col("n").cast(d38) * col("sxx") -
      col("sx").cast(d38) * col("sx")
    val vy = col("n").cast(d38) * col("syy") -
      col("sy").cast(d38) * col("sy")
    agg.select(col("brand"), col("n").as("n_lines"),
      graft.ext.Similarity.intScaled(
        when(vx =!= 0 && vy =!= 0,
          num.cast("double") /
            sqrt(vx.cast("double") * vy.cast("double"))),
        1000000L).as("pearson_e6"))
      .orderBy("brand")
  }

  /** q287 — ABC inventory classification: parts ranked by revenue
    * (exact cents DESC, partkey), class A while the cumulative mass
    * BEFORE the item is under 80% of total, B under 95%, else C — the
    * classic warehouse stratification (q277 reads ONE Pareto point
    * per nation; ABC classifies every ITEM by cumulative mass). The
    * class census per letter is what a stocking policy consumes.
    *
    * Exactness: FULLY integer — class boundaries are the exact
    * cross-multiplied compares 100·(cum−x) < 80·T and < 95·T in
    * decimal(38) (no double ever touches a boundary; a dollar-share
    * double could flip the crossing item between engines); only the
    * reported share is a final e6-gridded division.
    *
    * Scale: lineitem collapses map-side to per-part cents; the
    * cumulative mass rides [[graft.ops.TwoPhase.rankCum]] — HDR
    * range-buckets + per-bucket running sums + broadcast prefix
    * offsets — so NO task ever holds the part dimension (r11's one
    * weak posture, closed round 12; the frame total comes off the
    * same bucket census instead of a `Window.partitionBy()`
    * single-task pass); output is ≤ 3 rows.
    */
  def q287(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val pc = t(s, dir, "lineitem")
      .select(col("l_partkey"),
        (col("l_extendedprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy("l_partkey").agg(sum(col("cents")).as("x"))
    val ranked = graft.ops.TwoPhase.rankCum(pc, Nil, "x", "l_partkey",
      asc = false, cum = Some("__cum"), tot = Some("__tot"))
    val before = (col("__cum") - col("x")).cast(d38) * 100
    val cls = ranked
      .withColumn("tot", col("__tot").cast(d38))
      .withColumn("abc",
        when(before < col("tot") * 80, "A")
          .when(before < col("tot") * 95, "B")
          .otherwise("C"))
    cls.groupBy("abc")
      .agg(count(lit(1)).as("n_parts"), sum(col("x")).as("cents"),
        max(col("tot")).as("t"))
      .select(col("abc"), col("n_parts"), col("cents"),
        graft.ext.Similarity.intScaled(
          col("cents").cast("double") * 100 / col("t").cast("double"),
          1000000L).as("share_e6"))
      .orderBy("abc")
  }

  /** q288 — order→ship fulfillment-lag quantiles per order priority:
    * exact integer lag days ((ship µs − order µs) DIV 86400000000,
    * the q190 floor-division discipline), interpolated p50/p90 via
    * the engines' exact percentile (the q152 contract), min/max/mean
    * — the SLA distribution a fulfillment dashboard publishes, split
    * by the priority knob that is supposed to move it.
    *
    * Exactness: lags are exact integers; percentile interpolation on
    * integer frames is identical across engines (q152 precedent);
    * the mean is one mirrored division of exact sums, e4-gridded.
    *
    * Scale: the lineitem→orders join is orderkey-keyed (the audited
    * fact-join shape); the agg collapses to the 5-row priority frame
    * with partial map-side aggregation. No windows.
    */
  def q288(s: SparkSession, dir: String): DataFrame = {
    // Dates arrive TIMESTAMP_NTZ; the session timezone is pinned UTC
    // (Engine), so the NTZ→LTZ cast is identity (Tables.events
    // precedent).
    val lag = expr(
      "(unix_micros(CAST(l_shipdate AS TIMESTAMP))" +
        " - unix_micros(CAST(o_orderdate AS TIMESTAMP))) DIV 86400000000")
    t(s, dir, "lineitem")
      .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("priority"), lag.as("lag"))
      .groupBy("priority")
      .agg(count(lit(1)).as("n_lines"),
        min(col("lag")).as("min_days"), max(col("lag")).as("max_days"),
        graft.ext.Similarity.intScaled(percentile(col("lag"), lit(0.5)), 100L)
          .as("p50_c"),
        graft.ext.Similarity.intScaled(percentile(col("lag"), lit(0.9)), 100L)
          .as("p90_c"),
        graft.ext.Similarity.intScaled(
          sum(col("lag")).cast("double") / count(lit(1)).cast("double"),
          10000L).as("mean_e4"))
      .orderBy("priority")
  }

  /** q292 — hierarchical percent-of-parent revenue rollup: every
    * nation's share of ITS REGION's order revenue plus the region's
    * share of the global total — the two-level BI tree (percent-of-
    * parent, not percent-of-grand-total) that q90's Q5 shape stops
    * short of. Reading both levels side by side is what catches "the
    * nation grew but only because its region did".
    *
    * Exactness: revenue is exact cents summed in decimal(38); both
    * shares are single mirrored double divisions of exact integers,
    * e6-gridded.
    *
    * Scale: orders collapse map-side per customer key through
    * broadcast dim joins (nation/region are domain-bounded); the
    * rollup frames are nation- and region-sized. No windows.
    */
  def q292(s: SparkSession, dir: String): DataFrame = {
    val d38 = "decimal(38,0)"
    val natC = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
      .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        (col("o_totalprice").cast("decimal(18,2)") * 100).cast("long")
          .as("cents"))
      .groupBy("r_name", "n_name")
      .agg(sum(col("cents").cast(d38)).as("nc"))
    val regC = natC.groupBy("r_name").agg(sum(col("nc")).as("rc"))
    val tot = regC.agg(sum(col("rc")).as("gc"))
    natC.join(broadcast(regC), "r_name").withGlobalStats(tot)
      .select(col("r_name"), col("n_name"),
        col("nc").cast("long").as("nation_cents"),
        col("rc").cast("long").as("region_cents"),
        graft.ext.Similarity.intScaled(
          col("nc").cast("double") / col("rc").cast("double"),
          1000000L).as("share_of_region_e6"),
        graft.ext.Similarity.intScaled(
          col("rc").cast("double") / col("gc").cast("double"),
          1000000L).as("region_share_e6"))
      .orderBy("r_name", "n_name")
  }

  /** q294 — log-normal method-of-moments fit of order values per
    * market segment: μ̂ and σ̂ of ln(cents) — the standard heavy-tail
    * revenue model (order values are classically log-normal; the
    * fitted σ says how fat THIS segment's tail is, feeding the same
    * dashboards q280's Hill index serves for lengths, but as a
    * parametric fit with just two moments).
    *
    * Float discipline: each row's ln(cents) and ln(cents)² are
    * mirrored double expressions e9-gridded PER ROW before the exact
    * BIGINT sums (q232 discipline — summation order free); μ̂ and σ̂
    * are mirrored arithmetic over those exact sums (σ̂ via the
    * population-variance identity with one mirrored sqrt), e6.
    *
    * Scale: one orders scan with a broadcast customer-dim join for
    * the segment, map-side partial aggs to the 5-row segment frame.
    */
  def q294(s: SparkSession, dir: String): DataFrame = {
    val cents = (col("o_totalprice").cast("decimal(18,2)") * 100)
      .cast("long")
    val lx = log(cents.cast("double"))
    val j = t(s, dir, "orders")
      .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
      .select(col("c_mktsegment").as("segment"),
        graft.ext.Similarity.intScaled(lx, 1000000000L).as("t1"),
        graft.ext.Similarity.intScaled(lx * lx, 1000000000L).as("t2"))
    val n = col("n").cast("double")
    val m = col("s1").cast("double") / lit(1000000000.0) / n
    val m2 = col("s2").cast("double") / lit(1000000000.0) / n
    j.groupBy("segment")
      .agg(count(lit(1)).as("n"), sum(col("t1")).as("s1"),
        sum(col("t2")).as("s2"))
      .select(col("segment"), col("n"),
        graft.ext.Similarity.intScaled(m, 1000000L).as("mu_e6"),
        graft.ext.Similarity.intScaled(sqrt(m2 - m * m), 1000000L)
          .as("sigma_e6"))
      .orderBy("segment")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_waiting_suppliers" -> (q215 _),
    "q287_abc_class"         -> (q287 _),
    "q292_pct_of_parent"     -> (q292 _),
    "q294_lognormal_fit"     -> (q294 _),
    "q288_ship_lag"          -> (q288 _),
    "q284_brand_hhi"         -> (q284 _),
    "q285_cramers_v"         -> (q285 _),
    "q286_discount_corr"     -> (q286 _),
    "q245_skyline"           -> (q245 _),
    "q216_global_customers"  -> (q216 _),
    "q217_min_cost_supplier" -> (q217 _),
    "q218_priority_check"    -> (q218 _),
    "q219_forecast_revenue"  -> (q219 _),
    "q220_important_parts"   -> (q220 _),
    "q221_latency_priority"  -> (q221 _),
    "q222_custdist"          -> (q222 _),
    "q223_top_supplier"      -> (q223 _),
    "q224_offer_counts"      -> (q224 _),
    "q225_banded_revenue"    -> (q225 _),
    "q226_dominant_supplier" -> (q226 _),
    "q277_revenue_pareto"    -> (q277 _))

  val oracleSql: Map[String, String] = Map(
    // Same per-row ln terms e9-gridded before the exact sums; mirrored
    // moment arithmetic and sqrt.
    "q294_lognormal_fit" ->
      """WITH j AS (
        |  SELECT c_mktsegment AS segment,
        |         CAST(ROUND(ln(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                                 * 100 AS BIGINT) AS DOUBLE))
        |                    * 1000000000) AS BIGINT) AS t1,
        |         CAST(ROUND(ln(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                                 * 100 AS BIGINT) AS DOUBLE))
        |                    * ln(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
        |                                   * 100 AS BIGINT) AS DOUBLE))
        |                    * 1000000000) AS BIGINT) AS t2
        |  FROM orders JOIN customer ON o_custkey = c_custkey),
        |a AS (
        |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(t1) AS BIGINT) AS s1,
        |         CAST(SUM(t2) AS BIGINT) AS s2
        |  FROM j GROUP BY segment)
        |SELECT segment, n,
        |       CAST(ROUND(CAST(s1 AS DOUBLE) / 1000000000.0
        |                  / CAST(n AS DOUBLE) * 1000000) AS BIGINT) AS mu_e6,
        |       CAST(ROUND(sqrt(CAST(s2 AS DOUBLE) / 1000000000.0
        |                         / CAST(n AS DOUBLE)
        |                       - (CAST(s1 AS DOUBLE) / 1000000000.0
        |                          / CAST(n AS DOUBLE))
        |                         * (CAST(s1 AS DOUBLE) / 1000000000.0
        |                            / CAST(n AS DOUBLE)))
        |                  * 1000000) AS BIGINT) AS sigma_e6
        |FROM a ORDER BY segment""".stripMargin,
    // Same exact-cents rollup tree, HUGEINT sums, two mirrored share
    // divisions e6.
    "q292_pct_of_parent" ->
      """WITH nc AS (
        |  SELECT r_name, n_name,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS HUGEINT) AS nc
        |  FROM orders
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  GROUP BY 1, 2),
        |rc AS (SELECT r_name, CAST(SUM(nc) AS HUGEINT) AS rc
        |       FROM nc GROUP BY 1),
        |g AS (SELECT CAST(SUM(rc) AS HUGEINT) AS gc FROM rc)
        |SELECT nc.r_name, n_name, CAST(nc AS BIGINT) AS nation_cents,
        |       CAST(rc AS BIGINT) AS region_cents,
        |       CAST(ROUND(CAST(nc AS DOUBLE) / CAST(rc AS DOUBLE) * 1000000)
        |            AS BIGINT) AS share_of_region_e6,
        |       CAST(ROUND(CAST(rc AS DOUBLE) / CAST(gc AS DOUBLE) * 1000000)
        |            AS BIGINT) AS region_share_e6
        |FROM nc JOIN rc ON rc.r_name = nc.r_name CROSS JOIN g
        |ORDER BY nc.r_name, n_name""".stripMargin,
    // Same all-integer cumulative-mass class boundaries (100·before
    // vs 80·T / 95·T in HUGEINT), one final e6 share division.
    "q287_abc_class" ->
      """WITH pc AS (
        |  SELECT l_partkey,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS x
        |  FROM lineitem GROUP BY 1),
        |r AS (
        |  SELECT x,
        |         CAST(SUM(x) OVER (ORDER BY x DESC, l_partkey) - x
        |              AS HUGEINT) * 100 AS before,
        |         CAST(SUM(x) OVER () AS HUGEINT) AS tot
        |  FROM pc),
        |c AS (
        |  SELECT x, tot,
        |         CASE WHEN before < tot * 80 THEN 'A'
        |              WHEN before < tot * 95 THEN 'B'
        |              ELSE 'C' END AS abc
        |  FROM r)
        |SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
        |       CAST(SUM(x) AS BIGINT) AS cents,
        |       CAST(ROUND(CAST(SUM(x) AS DOUBLE) * 100
        |                  / CAST(MAX(tot) AS DOUBLE) * 1000000) AS BIGINT)
        |         AS share_e6
        |FROM c GROUP BY abc
        |ORDER BY abc""".stripMargin,
    // Same floor-division integer lag days, quantile_cont ≡ Spark's
    // exact interpolated percentile (q152 contract), mirrored mean.
    "q288_ship_lag" ->
      """WITH l AS (
        |  SELECT o_orderpriority AS priority,
        |         (epoch_us(CAST(l_shipdate AS TIMESTAMP))
        |            - epoch_us(CAST(o_orderdate AS TIMESTAMP)))
        |           // 86400000000 AS lag
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey)
        |SELECT priority, CAST(COUNT(*) AS BIGINT) AS n_lines,
        |       CAST(MIN(lag) AS BIGINT) AS min_days,
        |       CAST(MAX(lag) AS BIGINT) AS max_days,
        |       CAST(ROUND(quantile_cont(lag, 0.5) * 100) AS BIGINT) AS p50_c,
        |       CAST(ROUND(quantile_cont(lag, 0.9) * 100) AS BIGINT) AS p90_c,
        |       CAST(ROUND(CAST(SUM(lag) AS DOUBLE)
        |                  / CAST(COUNT(*) AS DOUBLE) * 10000) AS BIGINT)
        |         AS mean_e4
        |FROM l GROUP BY priority
        |ORDER BY priority""".stripMargin,
    // Same (brand, suppkey) quantity collapse, HUGEINT Σq², one
    // mirrored division e6.
    "q284_brand_hhi" ->
      """WITH bs AS (
        |  SELECT p_brand AS brand, l_suppkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sq
        |  FROM lineitem JOIN part ON l_partkey = p_partkey
        |  GROUP BY 1, 2)
        |SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
        |       CAST(SUM(sq) AS BIGINT) AS total_qty,
        |       CAST(ROUND(CAST(SUM(CAST(sq AS HUGEINT) * sq) AS DOUBLE)
        |                  / CAST(CAST(SUM(sq) AS HUGEINT) * SUM(sq) AS DOUBLE)
        |                  * 1000000) AS BIGINT) AS hhi_e6
        |FROM bs GROUP BY brand
        |ORDER BY brand""".stripMargin,
    // Same grid, identical expected-count doubles, per-cell e9 terms
    // before the exact sum, one mirrored sqrt for V.
    "q285_cramers_v" ->
      """WITH cells AS (
        |  SELECT p_brand AS brand, p_type AS band,
        |         CAST(COUNT(*) AS BIGINT) AS o
        |  FROM part GROUP BY 1, 2),
        |r AS (SELECT brand, CAST(SUM(o) AS BIGINT) AS r FROM cells GROUP BY 1),
        |c AS (SELECT band, CAST(SUM(o) AS BIGINT) AS c FROM cells GROUP BY 1),
        |tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
        |               CAST(COUNT(DISTINCT brand) AS BIGINT) AS nr,
        |               CAST(COUNT(DISTINCT band) AS BIGINT) AS nc
        |        FROM cells),
        |terms AS (
        |  SELECT n, nr, nc,
        |         CAST(ROUND(
        |           (CAST(o AS DOUBLE) - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
        |              / CAST(n AS DOUBLE))
        |           * (CAST(o AS DOUBLE) - CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
        |              / CAST(n AS DOUBLE))
        |           / (CAST(r.r AS DOUBLE) * CAST(c.c AS DOUBLE)
        |              / CAST(n AS DOUBLE))
        |           * 1000000000) AS BIGINT) AS term_e9
        |  FROM cells
        |  JOIN r USING (brand) JOIN c USING (band) CROSS JOIN tot)
        |SELECT n AS n_parts, CAST(COUNT(*) AS BIGINT) AS n_cells,
        |       CAST(SUM(term_e9) AS BIGINT) AS chi2_e9,
        |       CASE WHEN LEAST(nr - 1, nc - 1) <= 0 THEN NULL
        |            ELSE CAST(ROUND(
        |              sqrt((CAST(SUM(term_e9) AS DOUBLE) / 1000000000.0)
        |                   / (CAST(n AS DOUBLE)
        |                      * CAST(LEAST(nr - 1, nc - 1) AS DOUBLE)))
        |              * 1000000) AS BIGINT) END AS cramers_v_e6
        |FROM terms GROUP BY n, nr, nc""".stripMargin,
    // Same basis-point/quantity moments in HUGEINT, one mirrored
    // sqrt+division e6, exact zero-variance guard.
    "q286_discount_corr" ->
      """WITH li AS (
        |  SELECT p_brand AS brand,
        |         CAST(CAST(l_discount AS DECIMAL(4,2)) * 100 AS BIGINT) AS x,
        |         CAST(l_quantity AS BIGINT) AS y
        |  FROM lineitem JOIN part ON l_partkey = p_partkey),
        |a AS (
        |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
        |         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
        |         SUM(CAST(x AS HUGEINT) * x) AS sxx,
        |         SUM(CAST(y AS HUGEINT) * y) AS syy,
        |         SUM(CAST(x AS HUGEINT) * y) AS sxy
        |  FROM li GROUP BY brand),
        |m AS (
        |  SELECT brand, n,
        |         CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS num,
        |         CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS vx,
        |         CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS vy
        |  FROM a)
        |SELECT brand, n AS n_lines,
        |       CASE WHEN vx = 0 OR vy = 0 THEN NULL
        |            ELSE CAST(ROUND(CAST(num AS DOUBLE)
        |                            / sqrt(CAST(vx AS DOUBLE)
        |                                   * CAST(vy AS DOUBLE))
        |                            * 1000000) AS BIGINT) END AS pearson_e6
        |FROM m ORDER BY brand""".stripMargin,
    // Same per-customer cents collapse, (cents DESC, custkey) rank,
    // integer (n+9)//10 decile cut, HUGEINT sums, one e6 division.
    "q277_revenue_pareto" ->
      """WITH pc AS (
        |  SELECT o_custkey,
        |         CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS cust_cents
        |  FROM orders GROUP BY 1),
        |j AS (
        |  SELECT n_name, o_custkey, cust_cents
        |  FROM pc
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation ON c_nationkey = n_nationkey),
        |r AS (
        |  SELECT n_name, cust_cents,
        |         ROW_NUMBER() OVER (PARTITION BY n_name
        |                            ORDER BY cust_cents DESC, o_custkey)
        |           AS rk,
        |         COUNT(*) OVER (PARTITION BY n_name) AS n
        |  FROM j)
        |SELECT n_name, CAST(MAX(n) AS BIGINT) AS n_customers,
        |  CAST(MAX((n + 9) // 10) AS BIGINT) AS top_decile_n,
        |  CAST(SUM(CAST(cust_cents AS HUGEINT)) AS BIGINT) AS total_cents,
        |  CAST(SUM(CASE WHEN rk <= (n + 9) // 10
        |                THEN CAST(cust_cents AS HUGEINT)
        |                ELSE CAST(0 AS HUGEINT) END) AS BIGINT) AS top_cents,
        |  CAST(ROUND(CAST(SUM(CASE WHEN rk <= (n + 9) // 10
        |                           THEN CAST(cust_cents AS HUGEINT)
        |                           ELSE CAST(0 AS HUGEINT) END) AS DOUBLE)
        |             / CAST(SUM(CAST(cust_cents AS HUGEINT)) AS DOUBLE)
        |             * 1000000) AS BIGINT) AS pareto_e6
        |FROM r GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    // Same SQL modulo view names; COUNT cast to BIGINT for the hash.
    "q215_waiting_suppliers" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier
        |JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        |JOIN orders ON o_orderkey = l1.l_orderkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE o_orderstatus = 'F'
        |  AND l1.l_returnflag = 'R'
        |  AND n_name = 'NATION_7'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_returnflag = 'R')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin,
    "q216_global_customers" ->
      """WITH pos AS (
        |  SELECT SUBSTR(c_name, 17, 2) AS code, c_custkey,
        |         CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS cents
        |  FROM customer
        |  WHERE SUBSTR(c_name, 17, 2) IN
        |        ('13','31','23','29','30','18','17')),
        |thr AS (
        |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
        |  FROM pos WHERE cents > 0)
        |SELECT code, CAST(COUNT(*) AS BIGINT) AS numcust,
        |       CAST(SUM(cents) AS BIGINT) AS tot_cents
        |FROM pos CROSS JOIN thr
        |WHERE cents * n > s
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = pos.c_custkey
        |                    AND o_orderdate >= DATE '2001-01-01')
        |GROUP BY code
        |ORDER BY code""".stripMargin,
    // Same SQL modulo view names; COUNT/SUM(BIGINT) cast to BIGINT for
    // the hash (DuckDB widens both to HUGEINT, which renders as float).
    "q217_min_cost_supplier" ->
      """WITH cost AS (
        |  SELECT l_partkey AS partkey, l_suppkey AS suppkey,
        |         MIN(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT)) AS cost_cents
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT CAST(CAST(s_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
        |         AS bal_cents,
        |       s_name, n_name, p_partkey, cost_cents
        |FROM part, cost, supplier, nation, region
        |WHERE p_partkey = cost.partkey AND s_suppkey = cost.suppkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND p_size = 15 AND p_type = 'ECONOMY' AND r_name = 'EUROPE'
        |  AND cost_cents =
        |      (SELECT MIN(c2.cost_cents)
        |       FROM cost c2, supplier s2, nation n2, region r2
        |       WHERE c2.partkey = p_partkey AND s2.s_suppkey = c2.suppkey
        |         AND s2.s_nationkey = n2.n_nationkey
        |         AND n2.n_regionkey = r2.r_regionkey
        |         AND r2.r_name = 'EUROPE')
        |ORDER BY bal_cents DESC, n_name, s_name, p_partkey
        |LIMIT 100""".stripMargin,
    "q218_priority_check" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= DATE '1996-07-01'
        |  AND o_orderdate <  DATE '1996-10-01'
        |  AND EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey
        |                AND l_returnflag = 'R')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q219_forecast_revenue" ->
      """SELECT CAST(SUM(CAST(cents * bp AS DECIMAL(38,0))) AS BIGINT)
        |         AS revenue_cent_bp
        |FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT) AS cents,
        |             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                  AS BIGINT) AS bp
        |      FROM lineitem
        |      WHERE l_shipdate >= DATE '1997-01-01'
        |        AND l_shipdate <  DATE '1998-01-01'
        |        AND l_quantity < 24) t
        |WHERE bp BETWEEN 5 AND 7""".stripMargin,
    "q220_important_parts" ->
      """WITH val AS (
        |  SELECT l_partkey AS partkey,
        |         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)) AS BIGINT) AS cents
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_7'
        |  GROUP BY 1),
        |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM val)
        |SELECT partkey, cents FROM val CROSS JOIN tot
        |WHERE cents * 1000 > t
        |ORDER BY cents DESC, partkey""".stripMargin,
    "q221_latency_priority" ->
      """SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) > 60
        |            THEN 'SLOW' ELSE 'FAST' END AS ship_class,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority NOT IN
        |                          ('1-URGENT','2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT)
        |         AS low_line_count
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |WHERE l_shipdate >= DATE '1997-01-01'
        |  AND l_shipdate <  DATE '1998-01-01'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q222_custdist" ->
      """WITH c_orders AS (
        |  SELECT c_custkey, COUNT(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                   AND o_orderpriority <> '5-LOW'
        |  GROUP BY c_custkey)
        |SELECT CAST(c_count AS BIGINT) AS c_count,
        |       CAST(COUNT(*) AS BIGINT) AS custdist
        |FROM c_orders GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q223_top_supplier" ->
      """WITH rev AS (
        |  SELECT l_suppkey AS suppkey,
        |         SUM(CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                       AS BIGINT)
        |                  * (100 - CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                             AS BIGINT))
        |                  AS DECIMAL(38,0))) AS rev
        |  FROM lineitem
        |  WHERE l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate <  DATE '1997-04-01'
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, CAST(rev AS BIGINT) AS total_rev_centpct
        |FROM supplier JOIN rev ON s_suppkey = suppkey
        |WHERE rev = (SELECT MAX(rev) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,
    "q224_offer_counts" ->
      """SELECT p_brand, p_type, p_size,
        |       CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand <> 'Brand#5'
        |  AND p_size IN (1, 9, 15, 22, 30, 44, 49)
        |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
        |                        WHERE s_acctbal < 0)
        |GROUP BY p_brand, p_type, p_size
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,
    "q225_banded_revenue" ->
      """SELECT CAST(SUM(CAST(cents * (100 - bp) AS DECIMAL(38,0)))
        |            AS BIGINT) AS revenue_centpct
        |FROM (SELECT CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100
        |                  AS BIGINT) AS cents,
        |             CAST(CAST(l_discount AS DECIMAL(4,2)) * 100
        |                  AS BIGINT) AS bp,
        |             l_quantity, p_brand, p_size
        |      FROM lineitem JOIN part ON p_partkey = l_partkey) t
        |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
        |       AND p_size BETWEEN 1 AND 5)
        |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
        |       AND p_size BETWEEN 1 AND 10)
        |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
        |       AND p_size BETWEEN 1 AND 15)""".stripMargin,
    "q226_dominant_supplier" ->
      """WITH shipped AS (
        |  SELECT l_suppkey AS suppkey, l_partkey AS partkey,
        |         CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty
        |  FROM lineitem JOIN part ON p_partkey = l_partkey
        |  WHERE p_name LIKE 'small%'
        |    AND l_shipdate >= DATE '1997-01-01'
        |    AND l_shipdate <  DATE '1998-01-01'
        |  GROUP BY 1, 2),
        |ptot AS (SELECT partkey, CAST(SUM(qty) AS BIGINT) AS t
        |         FROM shipped GROUP BY 1)
        |SELECT s_name, n_name
        |FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name IN ('NATION_3', 'NATION_7', 'NATION_11')
        |  AND s_suppkey IN (SELECT suppkey
        |                    FROM shipped JOIN ptot USING (partkey)
        |                    WHERE qty * 2 > t)
        |ORDER BY s_name""".stripMargin,
    // Deliberately the QUADRATIC textbook definition (NOT EXISTS
    // dominance) — an independent formulation proving the window
    // pass computes the same frontier.
    "q245_skyline" ->
      """WITH pts AS (
        |  SELECT p_brand AS brand,
        |         CAST(CAST(p_retailprice AS DECIMAL(18,2)) * 100 AS BIGINT)
        |           AS price_c,
        |         CAST(p_size AS BIGINT) AS sz,
        |         CAST(COUNT(*) AS BIGINT) AS n_parts
        |  FROM part GROUP BY 1, 2, 3)
        |SELECT brand, price_c, sz, n_parts
        |FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.brand = a.brand
        |    AND b.price_c <= a.price_c AND b.sz >= a.sz
        |    AND (b.price_c < a.price_c OR b.sz > a.sz))
        |ORDER BY brand, price_c""".stripMargin)
}
