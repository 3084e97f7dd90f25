package graft

import java.security.MessageDigest

import org.apache.spark.sql.functions._

/** Round-13 exactness replays: q406's portable-HLL DAU/WAU/MAU is
  * recomputed driver-side from first principles (raw md5 → register
  * files built from the UNIONED day span — the opposite construction
  * order from the query's fanned per-day MAX-merge, so equality proves
  * the merge commutes), plus estimator-branch and error-bound
  * bindingness pins.
  */
class Round13Spec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** (register, rho) of one value — the Sketches.hllPortableRegisters
    * arithmetic in plain Scala. */
  private def regRho(v: String): (Int, Int) = {
    val hx = md5hex(v)
    val reg = Integer.parseInt(hx.substring(0, 2), 16)
    val w = java.lang.Long.parseLong(hx.substring(2, 17), 16)
    val rho = if (w == 0L) 61 else 61 - (64 - java.lang.Long.numberOfLeadingZeros(w))
    (reg, rho)
  }

  /** (est_e2, rawEstimate, nZero) for a set of values — the
    * hllPortableEstimate chain in plain Scala/BigInt. */
  private def estimate(values: Set[String]): (Long, Double, Int) = {
    val regs = values.toSeq.map(regRho)
      .groupBy(_._1).map { case (r, xs) => r -> xs.map(_._2).max }
    val nZero = 256 - regs.size
    val t = regs.values.map(r => BigInt(1) << (61 - r)).sum +
      BigInt(nZero) * (BigInt(1) << 61)
    val raw = 0.7213 / (1.0 + 1.079 / 256.0) * 65536.0 *
      2305843009213693952.0 / t.toDouble
    val est =
      if (raw <= 640.0 && nZero > 0) 256.0 * math.log(256.0 / nZero)
      else raw
    val e2 = new java.math.BigDecimal(est * 100)
      .setScale(0, java.math.RoundingMode.HALF_UP).longValue
    (e2, raw, nZero)
  }

  private lazy val userDays: Seq[(Long, Long)] =
    Tables.events(spark, sf)
      .select(col("user_id"),
        expr("ts div 86400000000000" +
          " - (CASE WHEN ts % 86400000000000 < 0 THEN 1 ELSE 0 END)").as("d"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSeq

  private lazy val got: Map[Long, (Long, Long, Long, Long, Long, Long, Long, Long, Long)] =
    queries.Round13.q406(spark, sf).collect().map { r =>
      r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6), r.getLong(7), r.getLong(8), r.getLong(9))
    }.toMap

  /** Exact + estimate for the trailing k-day window ending at `day`,
    * built DIRECTLY from the unioned span (not by merging per-day
    * register files). */
  private def window(day: Long, k: Int): (Long, (Long, Double, Int)) = {
    val users = userDays.collect {
      case (u, d) if d <= day && d > day - k => u
    }.toSet
    (users.size.toLong, estimate(users.map(_.toString)))
  }

  test("q406 estimates equal the first-principles replay for all days and all three windows") {
    val days = userDays.map(_._2).distinct.sorted
    assert(got.keySet === days.toSet)
    days.foreach { day =>
      val (dau, wau, mau, de, we, me, _, _, _) = got(day)
      val (xd, (ed, _, _)) = window(day, 1)
      val (xw, (ew, _, _)) = window(day, 7)
      val (xm, (em, _, _)) = window(day, 30)
      assert((dau, wau, mau) === (xd, xw, xm), s"exact censuses, day $day")
      assert((de, we, me) === (ed, ew, em),
        s"register-merge estimates diverged from the span-built replay, day $day")
    }
  }

  test("q406 error cells equal the mirrored chain and are within the m=256 bound") {
    got.foreach { case (day, (dau, wau, mau, de, we, me, errD, errW, errM)) =>
      def chain(e: Long, x: Long): Long =
        new java.math.BigDecimal((e.toDouble / 100.0 / x.toDouble - 1.0) * 1000000)
          .setScale(0, java.math.RoundingMode.HALF_UP).longValue
      assert((errD, errW, errM) === (chain(de, dau), chain(we, wau), chain(me, mau)),
        s"error chain, day $day")
      // 3σ for m=256 is ~19.5%; the fixture sits well inside.
      Seq(errD, errW, errM).foreach(e =>
        assert(math.abs(e) <= 200000L, s"error ${e}e-6 beyond 20%, day $day"))
    }
  }

  test("q406 bindingness: the LC branch fires at sf0.001 and the sketch is not vacuously exact") {
    // Small-range fixture → every window sits on the linear-counting
    // branch (raw ≤ 640, zero registers exist); sf0.1's MAU ≈ 1350
    // exercises the raw harmonic branch in the 3-SF oracle runs.
    val days = userDays.map(_._2).distinct
    days.foreach { day =>
      val (_, (_, raw, nZero)) = window(day, 30)
      assert(raw <= 640.0 && nZero > 0, s"expected LC branch at sf0.001, day $day")
    }
    // Non-vacuous: the estimate differs from exact·100 somewhere.
    assert(got.exists { case (_, (dau, _, _, de, _, _, _, _, _)) => de != dau * 100 },
      "every DAU estimate equals exact — sketch path is vacuous")
  }
}
