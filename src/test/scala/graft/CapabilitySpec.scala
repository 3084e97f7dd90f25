package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantics tests for the round-3 capability queries (Capability.scala)
  * — the oracle gate certifies values; these pin down the *contracts*
  * that the oracle can't see (equivalence of the two sessionization
  * strategies, pivot null cells, CDC class arithmetic, centroid math).
  */
class CapabilitySpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, sf)

  test("q37 sessions partition the events: n_events sums to the table count") {
    val total = Tables.events(spark, sf).count()
    val summed = q("q37_sessionize").agg(sum("n_events")).head().getLong(0)
    assert(summed == total)
  }

  test("q45 native session_window agrees with q37 gaps-and-islands") {
    // Same gap (12 h), same data: the > (q37, exact nanos) vs >= (q45,
    // µs-truncated) boundary difference only bites on a gap of exactly
    // 12 h — absent in continuous-timestamp data, so the two strategies
    // must produce the same (user_id, n_events, first_event) multiset.
    val islands = q("q37_sessionize")
      .select("user_id", "n_events", "first_event")
    val native = q("q45_session_window")
      .select("user_id", "n_events", "first_event")
    assert(islands.exceptAll(native).isEmpty && native.exceptAll(islands).isEmpty)
  }

  test("q33 pivot: one row per user, spot cell equals the direct filtered sum") {
    val ev = Tables.events(spark, sf)
    assert(q("q33_pivot").count() == ev.select("user_id").distinct().count())
    val u = ev.select("user_id").head().getLong(0)
    val direct = ev.filter(col("user_id") === u && col("event_type") === "click")
      .agg(round(sum("value"), 2)).head().getDouble(0)
    val cell = q("q33_pivot").filter(col("user_id") === u).head().getAs[Double]("click")
    assert(cell == direct)
  }

  test("q43 CDC classes match the modulo carving computed independently") {
    val keys = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey").as("k")).distinct()
    val expected = keys.select(
      sum(when(col("k") % 3 === 0 && col("k") % 7 =!= 0, 1).otherwise(0)).as("ins"),
      sum(when(col("k") % 7 === 0 && col("k") % 3 =!= 0, 1).otherwise(0)).as("del"),
      sum(when(col("k") % 3 =!= 0 && col("k") % 7 =!= 0 && col("k") % 5 === 0, 1)
        .otherwise(0)).as("upd")).head()
    val got = q("q43_cdc_diff").groupBy("change").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got("insert") == expected.getLong(0))
    assert(got("delete") == expected.getLong(1))
    // price*1.1 never round-trips to the same 2-decimal value here, so
    // every %5==0 survivor is an update
    assert(got("update") == expected.getLong(2))
  }

  test("q44 centroid equals the directly-computed mean for a spot cell") {
    val Row(lbl: Long, pos: Long, c: Double) =
      q("q44_centroid").filter(col("lbl") === 0 && col("pos") === 0).head()
    val direct = Tables.table(spark, sf, "embeddings")
      .filter(col("label") === 0)
      .select(element_at(col("embedding"), 1).as("v"))
      .agg(avg("v")).head().getDouble(0)
    assert(lbl == 0 && pos == 0)
    assert(math.abs(c - BigDecimal(direct).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  test("q36 percentiles are ordered p50 <= p90 <= p99 within every group") {
    q("q36_percentiles").collect().foreach { r =>
      assert(r.getDouble(1) <= r.getDouble(2) && r.getDouble(2) <= r.getDouble(3), r)
    }
  }

  test("q46 outliers: every group keeps at most 1% + interpolation slack") {
    val perType = Tables.events(spark, sf).filter(col("value").isNotNull)
      .groupBy("event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    q("q46_outlier_filter").collect().foreach { r =>
      val frac = r.getLong(1).toDouble / perType(r.getString(0))
      assert(frac <= 0.015, s"${r.getString(0)}: $frac")
    }
  }

  test("q75 NOT IN: the null poisons everything, the clean variant does not") {
    val Row(poisoned: Long, clean: Long) = q("q75_not_in_nulls").head()
    assert(poisoned == 0L, "one NULL in the NOT IN list must empty the result")
    assert(clean > 0L, "the null-filtered variant must keep real non-members")
  }

  test("q79 LOCF: fills exactly the null cells, echoes non-null ones") {
    val out = q("q79_locf")
    assert(out.filter(col("value").isNotNull && col("locf") =!= col("value"))
      .count() == 0, "locf must echo present values")
    // fill behavior is only observable when the fixture has null cells
    // (sf0.001 has none; the sf0.01 oracle run exercises them) — when it
    // does, every null after a user's first observation must be filled
    val nulls = out.filter(col("value").isNull)
    if (nulls.count() > 0) {
      assert(nulls.filter(col("locf").isNotNull).count() > 0)
    }
  }

  test("q80 unpivot doubles the row count and loses no mass") {
    val orders = Tables.table(spark, sf, "orders")
    assert(q("q80_unpivot").count() == orders.count() * 2)
    val back = q("q80_unpivot").groupBy("o_orderkey").pivot("k", Seq("price")).agg(first("v"))
    val direct = orders.select(col("o_orderkey"), col("o_totalprice").as("price"))
    assert(back.exceptAll(direct).isEmpty, "melt must be losslessly re-pivotable")
  }

  test("q85 recursive traversal reaches every customer exactly once") {
    val customer = Tables.table(spark, sf, "customer")
    // custkey 0 is represented by the seed row (the recursion excludes
    // it via c_custkey > 0), every other key is reached through its
    // unique parent chain — so tree size == customer count exactly
    assert(customer.filter(col("c_custkey") === 0).count() == 1)
    val total = q("q85_recursive_cte").agg(sum("n")).head().getLong(0)
    assert(total == customer.count())
  }

  test("q184 fk audit: full driver replay is EXACT on both relationships") {
    def replay(rel: String, ck: Array[Long], pk: Array[Long]) = {
      val pset = pk.toSet
      val fanMap = ck.filter(pset).groupBy(identity).map { case (k, v) => (k, v.length.toLong) }
      val fans = pk.map(k => fanMap.getOrElse(k, 0L)).sorted
      val n = fans.length
      (rel, n.toLong, ck.length.toLong, ck.count(!pset(_)).toLong,
        fans.count(_ == 0L).toLong, fans(((n + 1) / 2) - 1), fans.last)
    }
    val cust = Tables.table(spark, sf, "customer").select("c_custkey")
      .collect().map(_.getLong(0))
    val okeys = Tables.table(spark, sf, "orders").select("o_orderkey", "o_custkey")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val lkeys = Tables.table(spark, sf, "lineitem").select("l_orderkey")
      .collect().map(_.getLong(0))
    val expected = Seq(
      replay("lineitem->orders", lkeys, okeys.map(_._1)),
      replay("orders->customer", okeys.map(_._2), cust)).sortBy(_._1)
    val got = q("q184_fk_audit").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
  }

  test("q185 key skew: replay EXACT; top-10 truly heaviest; median from histogram") {
    val counts = Tables.table(spark, sf, "lineitem").select("l_suppkey")
      .collect().map(_.getLong(0))
      .groupBy(identity).map { case (k, v) => (k, v.length.toLong) }.toSeq
    val nRows = counts.map(_._2).sum
    val sortedCnt = counts.map(_._2).sorted
    val med = sortedCnt(((sortedCnt.size + 1) / 2) - 1)
    def half(v: Double) =
      BigDecimal(v).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val expected = counts.sortBy(c => (-c._2, c._1)).take(10).map { case (k, c) =>
      (k, c, half(c.toDouble / nRows * 1000000), half(c.toDouble / med * 10000))
    }
    val got = q("q185_key_skew").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("q189 argmin supplier: full driver replay is EXACT; min-struct = sort-first") {
    val lines = Tables.table(spark, sf, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    // bit-pack bounds the query relies on (cents << 24 | suppkey)
    lines.foreach { l =>
      assert(l._2 >= 0 && l._2 < (1L << 24), s"suppkey out of pack range: $l")
      assert(l._3 >= 0 && l._3 < (1L << 39), s"cents out of pack range: $l")
    }
    val expected = lines.groupBy(_._1).toSeq.map { case (part, ls) =>
      val best = ls.map(l => (l._3, l._2)).min
      (part, ls.length.toLong, ls.map(_._2).distinct.length.toLong,
        best._2, best._1)
    }.sortBy(_._1)
    val got = q("q189_argmin_supplier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q191 rfm segments: full driver replay is EXACT (standard NTILE semantics)") {
    val orders = Tables.table(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderdate").cast("date"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toLocalDate,
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)
          .*(100).toLongExact))
    val byCust = orders.groupBy(_._1).toSeq.map { case (c, os) =>
      (c, os.map(_._2).max, os.length.toLong, os.map(_._3).sum)
    }
    val maxD = byCust.map(_._2).max
    // standard NTILE: base n/k per bucket, first n%k buckets get one extra
    def ntile5[A](sorted: Seq[A]): Map[A, Int] = {
      val n = sorted.size; val base = n / 5; val rem = n % 5
      val bounds = (1 to 5).scanLeft(0) { (acc, b) =>
        acc + base + (if (b <= rem) 1 else 0)
      }
      sorted.zipWithIndex.map { case (a, i) =>
        (a, bounds.indexWhere(_ > i))
      }.toMap
    }
    val rec = ntile5(byCust.sortBy { c =>
      (java.time.temporal.ChronoUnit.DAYS.between(c._2, maxD), c._1)
    }.map(_._1))
    val fr = ntile5(byCust.sortBy(c => (c._3, c._1)).map(_._1))
    val mo = ntile5(byCust.sortBy(c => (c._4, c._1)).map(_._1))
    val expected = byCust
      .map(c => (rec(c._1) * 100 + fr(c._1) * 10 + mo(c._1), c._4))
      .groupBy(_._1).toSeq
      .map { case (seg, cs) => (seg, cs.length.toLong, cs.map(_._2).sum) }
      .sortBy(_._1)
    val got = q("q191_rfm_segments").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q200 reconciliation: cents replay EXACT; all-mismatch is the true answer") {
    def cents(d: Double) =
      BigDecimal(d).setScale(2, BigDecimal.RoundingMode.HALF_UP).*(100).toLongExact
    val li = Tables.table(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), cents(r.getDouble(1))))
      .groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    val orders = Tables.table(spark, sf, "orders")
      .select(col("o_orderkey"), col("o_orderdate").cast("date"),
        col("o_totalprice")).collect()
      .map(r => (r.getLong(0), r.getDate(1).toString.substring(0, 7) + "-01",
        cents(r.getDouble(2))))
      .filter(o => li.contains(o._1)) // inner join: childless orders drop out
    val expected = orders.groupBy(_._2).toSeq.map { case (m, os) =>
      val hdr = os.map(_._3).sum
      val lis = os.map(o => li(o._1)).sum
      (m, os.length.toLong, hdr, lis, lis - hdr,
        os.count(o => math.abs(o._3 - li(o._1)) > 1).toLong)
    }.sortBy(_._1)
    val got = q("q200_revenue_reconcile").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === expected)
    // this synthetic data generates headers independently of lines —
    // every order mismatches; the audit must SEE that, not smooth it
    assert(got.map(_._6).sum === orders.length.toLong)
  }

  test("q201 revenue trend: moments replay EXACT; slope matches driver OLS") {
    val rows = q("q201_revenue_trend").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.length === 5)
    rows.foreach { r =>
      val (n, sx, sy, sxx, sxy) = (r._2, r._3, r._4, r._5, r._6)
      val slope = (n * sxy - sx * sy).toDouble / (n * sxx - sx * sx).toDouble
      assert(r._7 === BigDecimal(slope * 100)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong, s"slope at ${r._1}")
    }
  }

  test("q186 monthly revenue: cents replay EXACT; lag deltas reconcile") {
    val rows = q("q186_monthly_rev").collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val byMonth = Tables.table(spark, sf, "orders")
      .select(col("o_orderdate").cast("date"), col("o_totalprice")).collect()
      .map(r => (r.getDate(0).toString.substring(0, 7), r.getDouble(1)))
      .groupBy(_._1).map { case (m, os) =>
        (m + "-01", os.length.toLong,
          os.map(o => BigDecimal(o._2).setScale(2, BigDecimal.RoundingMode.HALF_UP))
            .sum.*(100).toLongExact)
      }.toSeq.sortBy(_._1)
    assert(rows.map(r => (r._1, r._2, r._3)).toSeq === byMonth)
    // lag deltas: reconcile against the month sequence itself
    rows.zipWithIndex.foreach { case (r, i) =>
      val mom = if (i >= 1) Some(r._3 - rows(i - 1)._3) else None
      val yoy = if (i >= 12) Some(r._3 - rows(i - 12)._3) else None
      assert(r._4 === mom, s"mom at ${r._1}")
      assert(r._5 === yoy, s"yoy at ${r._1}")
    }
  }
}
