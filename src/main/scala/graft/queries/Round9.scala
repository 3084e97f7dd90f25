package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.Tables

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q215_waiting_suppliers" -> (q215 _),
    "q216_global_customers"  -> (q216 _))

  val oracleSql: Map[String, String] = Map(
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
        |ORDER BY code""".stripMargin)
}
