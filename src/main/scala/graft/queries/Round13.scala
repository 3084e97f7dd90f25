package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ext.Similarity.intScaled
import graft.ops.Sketches

/** Round-13 batch: the sketch-path rollups that replace the registry's
  * biggest event-family shuffles at the 100 TB design point, reported
  * BESIDE their exact counterparts with measured error — the swap the
  * r12 verdict named as the documented 100 TB path for q403.
  *
  * Float discipline unchanged (q331+): exact integers up to ONE
  * mirrored double chain per output cell; DuckDB oracles spell
  * identical arithmetic; Round13Spec replays driver-side.
  */
object Round13 {

  /** q406 — DAU/WAU/MAU via portable-HLL register merge, beside exact:
    * per-day md5-HLL register files (≤ 256 rows/day REGARDLESS of
    * DAU), MAX-merged over trailing 7/30-day windows — HLL union, the
    * q97-certified merge — then estimated per day; the exact q403
    * censuses ride beside with the relative error e6 per metric.
    *
    * THE 100 TB swap this certifies: q403's rolling-distinct coverage
    * fan explodes every distinct (user, day) row 7× and 30× — linear
    * in user-days (the registry's biggest event-family shuffle, 2.6×
    * worst 10× ratio). Here the fan rides the REGISTER files: ≤ 256
    * rows per day times the window length, i.e. calendar-bounded
    * (≤ 256·30·days rows at ANY corpus size). A production run drops
    * the exact side (it exists here to MEASURE the error and to pin
    * the estimate against an oracle) and the event scan collapses
    * map-side to (day, reg, rho) — nothing downstream sees users.
    *
    * Exactness: registers are exact integers end to end (md5 hex →
    * reg/rank, MAX-merge associative — the fanned per-day merge is
    * bit-identical to registers built from the unioned day span,
    * spec-proved); the estimate is the q25/q97 mirrored chain (ONE
    * double division off an exact scaled-integer harmonic sum; the
    * linear-counting branch decided on that identical double — it
    * FIRES at sf0.001/0.01 where DAU ≤ 150, while sf0.1's MAU ≈ 1350
    * exercises the raw harmonic branch: both estimator paths are
    * oracle-certified). Each error cell is one mirrored double chain
    * (est_e2/100/exact − 1, e6) off two identical BIGINTs.
    *
    * Scale: ud collapses events map-side; the register file is the
    * only data-sized agg; every rolling merge, estimate, and join
    * below rides calendar-bounded frames (≤ days·256 rows). Trailing
    * windows are truncated at the span start exactly as q403's (both
    * engines alike; output restricted to observed-DAU days by the
    * inner joins).
    */
  def q406(s: SparkSession, dir: String): DataFrame = {
    val dayNs = "86400000000000"
    val ud = Tables.events(s, dir)
      .select(col("user_id"),
        expr(s"ts div $dayNs" +
          s" - (CASE WHEN ts % $dayNs < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct()
      .localCheckpoint(true) // branched: exact censuses + register file
    // Per-day portable register file — ≤ 256 rows/day at any DAU.
    val regs = Sketches.hllPortableRegisters(ud, Seq("d"), col("user_id"))
      .localCheckpoint(true) // tiny; branched into three rolling merges
    def estRoll(k: Int, out: String) = {
      val merged =
        if (k == 1) regs.select(col("d").as("day"), col("reg"), col("rho"))
        else regs
          .select(explode(sequence(col("d"), col("d") + (k - 1))).as("day"),
            col("reg"), col("rho"))
          .groupBy(col("day"), col("reg")).agg(max(col("rho")).as("rho"))
      Sketches.hllPortableEstimate(merged, Seq("day"))
        .select(col("day"), col("est_e2").as(out))
    }
    // The exact q403 shape, kept to measure the sketch against.
    def exactRoll(k: Int, out: String) = ud
      .select(col("user_id"),
        explode(sequence(col("d"), col("d") + (k - 1))).as("day"))
      .distinct()
      .groupBy(col("day")).agg(count(lit(1)).as(out))
    val dau = ud.groupBy(col("d").as("day")).agg(count(lit(1)).as("dau"))
    def err(est: String, exact: String, out: String) =
      intScaled(col(est).cast("double") / lit(100.0) /
        col(exact).cast("double") - lit(1.0), 1000000L).as(out)
    dau
      .join(exactRoll(7, "wau"), "day")
      .join(exactRoll(30, "mau"), "day")
      .join(estRoll(1, "dau_est_e2"), "day")
      .join(estRoll(7, "wau_est_e2"), "day")
      .join(estRoll(30, "mau_est_e2"), "day")
      .select(col("day"), col("dau"), col("wau"), col("mau"),
        col("dau_est_e2"), col("wau_est_e2"), col("mau_est_e2"),
        err("dau_est_e2", "dau", "dau_err_e6"),
        err("wau_est_e2", "wau", "wau_err_e6"),
        err("mau_est_e2", "mau", "mau_err_e6"))
      .orderBy("day")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q406_dau_mau_hll" -> (q406 _),
  )

  private def hllDayEst(fromSql: String, estAlias: String): String = {
    val frag = Sketches.hllPortableOracleSql(fromSql, Seq("day"))
    s"(SELECT day, est_e2 AS $estAlias FROM ($frag))"
  }

  val oracleSql: Map[String, String] = Map(
    // Same floored days, same md5 register files (the rolling merges
    // fan the RAW user-days here — register construction commutes with
    // union, so the files are bit-identical to Spark's fanned-register
    // MAX-merge), same q97 estimator chain, same exact censuses, one
    // mirrored error chain per metric.
    "q406_dau_mau_hll" -> {
      val ud = """SELECT DISTINCT user_id,
                 |         epoch_ns(ts) // 86400000000000 AS d
                 |  FROM events""".stripMargin
      def fan(k: Int) =
        if (k == 1)
          "SELECT d AS day, md5(CAST(user_id AS VARCHAR)) AS hx FROM ud"
        else
          s"SELECT d + i AS day, md5(CAST(user_id AS VARCHAR)) AS hx " +
            s"FROM ud CROSS JOIN range(0, $k) r(i)"
      def exactRoll(k: Int, out: String) =
        s"""SELECT day, CAST(COUNT(*) AS BIGINT) AS $out FROM (
           |  SELECT DISTINCT user_id, d + i AS day
           |  FROM ud CROSS JOIN range(0, $k) r(i)) GROUP BY day""".stripMargin
      def err(est: String, exact: String, out: String) =
        s"CAST(ROUND((CAST($est AS DOUBLE) / 100.0 / CAST($exact AS DOUBLE)" +
          s" - 1.0) * 1000000) AS BIGINT) AS $out"
      s"""WITH ud AS ($ud),
         |dau AS (SELECT d AS day, CAST(COUNT(*) AS BIGINT) AS dau
         |        FROM ud GROUP BY d),
         |wau AS (${exactRoll(7, "wau")}),
         |mau AS (${exactRoll(30, "mau")})
         |SELECT day, dau, wau, mau,
         |       dau_est_e2, wau_est_e2, mau_est_e2,
         |       ${err("dau_est_e2", "dau", "dau_err_e6")},
         |       ${err("wau_est_e2", "wau", "wau_err_e6")},
         |       ${err("mau_est_e2", "mau", "mau_err_e6")}
         |FROM dau JOIN wau USING (day) JOIN mau USING (day)
         |JOIN ${hllDayEst(fan(1), "dau_est_e2")} de USING (day)
         |JOIN ${hllDayEst(fan(7), "wau_est_e2")} we USING (day)
         |JOIN ${hllDayEst(fan(30), "mau_est_e2")} me USING (day)
         |ORDER BY day""".stripMargin
    },
  )
}
