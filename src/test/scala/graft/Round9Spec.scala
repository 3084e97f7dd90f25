package graft

import java.math.{BigDecimal => JBig, RoundingMode}

import org.apache.spark.sql.functions._

import graft.queries.Round9

/** Round-9 family (the classic TPC-H report completions): full
  * driver-side replays on the sf0.001 fixtures. Every quantity in
  * these queries is an exact integer (cents, basis points, cent·pct,
  * day counts), so each replay is a strict equality — no margins.
  */
class Round9Spec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  /** Spark/DuckDB decimal(18,2) cast semantics on a double: HALF_UP. */
  private def cents(x: Double): Long =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Discount basis points via the decimal(4,2) route the queries use. */
  private def bp(x: Double): Long =
    new JBig(x).setScale(2, RoundingMode.HALF_UP)
      .movePointRight(2).longValueExact()

  /** Midnight-aligned UTC timestamp → epoch-day number (both engines'
    * datediff reduces to a difference of these for this data). The
    * runtime class depends on the parquet logical type (NTZ arrives
    * as LocalDateTime under the java8 datetime API), so dispatch.
    */
  private def epochDay(v: Any): Long = v match {
    case t: java.sql.Timestamp      => Math.floorDiv(t.getTime, 86400000L)
    case d: java.time.LocalDateTime => d.toLocalDate.toEpochDay
    case i: java.time.Instant       => Math.floorDiv(i.toEpochMilli, 86400000L)
    case other => fail(s"unexpected timestamp class: ${other.getClass}")
  }

  private def lineitem = spark.read.parquet(s"$sf/lineitem.parquet")
  private def orders   = spark.read.parquet(s"$sf/orders.parquet")
  private def part     = spark.read.parquet(s"$sf/part.parquet")
  private def supplier = spark.read.parquet(s"$sf/supplier.parquet")
  private def nation   = spark.read.parquet(s"$sf/nation.parquet")
  private def region   = spark.read.parquet(s"$sf/region.parquet")
  private def customer = spark.read.parquet(s"$sf/customer.parquet")

  private def day(s: String): Long =
    java.time.LocalDate.parse(s).toEpochDay

  private case class Line(orderkey: Long, partkey: Long, suppkey: Long,
    qty: Double, price: Double, disc: Double, rflag: String, shipDay: Long)

  private def lines: Seq[Line] = lineitem
    .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_quantity",
      $"l_extendedprice", $"l_discount", $"l_returnflag", $"l_shipdate")
    .collect().toSeq.map(r => Line(r.getLong(0), r.getLong(1), r.getLong(2),
      r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getString(6),
      epochDay(r.get(7))))

  /** suppkey → nation name (via the supplier dim). */
  private def suppNation: Map[Long, String] = {
    val nat = nation.select($"n_nationkey", $"n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    supplier.select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getLong(0) -> nat(r.getInt(1))).toMap
  }

  /** nationkey → region name. */
  private def nationRegion: Map[Int, String] = {
    val reg = region.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    nation.select($"n_nationkey", $"n_regionkey").collect()
      .map(r => r.getInt(0) -> reg(r.getInt(1))).toMap
  }

  test("q215 waiting suppliers: full replay of the dual-EXISTS logic") {
    val finished = orders.filter($"o_orderstatus" === "F")
      .select($"o_orderkey").as[Long].collect().toSet
    val sn = suppNation
    val sName = supplier.select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val byOrder = lines.groupBy(_.orderkey)
    val counted = lines.filter(l => finished(l.orderkey) && l.rflag == "R"
        && sn(l.suppkey) == "NATION_7")
      .filter { l =>
        val others = byOrder(l.orderkey).filter(_.suppkey != l.suppkey)
        others.nonEmpty && !others.exists(_.rflag == "R")
      }
    val expected = counted.groupBy(l => sName(l.suppkey)).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (n, c) => (-c, n) }.take(100)
    val got = Round9.q215(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
  }

  test("q216 global customers: replay of the integer above-average test") {
    val watched = Set("13", "31", "23", "29", "30", "18", "17")
    val pos = customer.select($"c_custkey", $"c_name", $"c_acctbal")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
      .filter(c => c._2.length >= 18 && watched(c._2.substring(16, 18)))
      .map(c => (c._2.substring(16, 18), c._1, cents(c._3)))
    val n = pos.count(_._3 > 0).toLong
    val s = pos.filter(_._3 > 0).map(_._3).sum
    val recent = orders
      .filter($"o_orderdate" >= lit("2001-01-01").cast("date"))
      .select($"o_custkey").as[Long].collect().toSet
    val kept = pos.filter(c => c._3 * n > s && !recent(c._2))
    val expected = kept.groupBy(_._1).view
      .mapValues(g => (g.size.toLong, g.map(_._3).sum)).toSeq
      .map { case (code, (cnt, tot)) => (code, cnt, tot) }.sortBy(_._1)
    val got = Round9.q216(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("q217 tpch q2: replay of the EUROPE min-cost correlation") {
    val nr = nationRegion
    val sNat = supplier.select($"s_suppkey", $"s_nationkey").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val euSupp = sNat.filter { case (_, nk) => nr(nk) == "EUROPE" }.keySet
    val cost = lines.groupBy(l => (l.partkey, l.suppkey)).view
      .mapValues(_.map(l => cents(l.price)).min).toMap
    val targetParts = part
      .filter($"p_size" === 15 && $"p_type" === "ECONOMY")
      .select($"p_partkey").as[Long].collect().toSet
    val euMin = cost.toSeq.filter(c => euSupp(c._1._2))
      .groupBy(_._1._1).view.mapValues(_.map(_._2).min).toMap
    val sInfo = supplier.select($"s_suppkey", $"s_name", $"s_acctbal")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2)))
      .toMap
    val sn = suppNation
    val expected = cost.toSeq.collect {
      case ((pk, sk), c) if targetParts(pk) && euSupp(sk)
          && euMin.get(pk).contains(c) =>
        (cents(sInfo(sk)._2), sInfo(sk)._1, sn(sk), pk, c)
    }.sortBy { case (bal, name, nat, pk, _) => (-bal, nat, name, pk) }
      .take(100)
    val got = Round9.q217(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4))).toSeq
    assert(got === expected)
  }

  test("q218 tpch q4: replay; counts bounded by quarter order count") {
    val returned = lines.filter(_.rflag == "R").map(_.orderkey).toSet
    val q3 = orders.select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .collect().map(r => (r.getLong(0), epochDay(r.get(1)),
        r.getString(2)))
      .filter(o => o._2 >= day("1996-07-01") && o._2 < day("1996-10-01"))
    val expected = q3.filter(o => returned(o._1)).groupBy(_._3).view
      .mapValues(_.size.toLong).toSeq.sortBy(_._1)
    val got = Round9.q218(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum <= q3.length.toLong)
  }

  test("q219 tpch q6: exact cent·bp replay") {
    val expected = lines.filter(l => l.shipDay >= day("1997-01-01")
        && l.shipDay < day("1998-01-01") && l.qty < 24)
      .map(l => (cents(l.price), bp(l.disc)))
      .filter(l => l._2 >= 5 && l._2 <= 7)
      .map(l => l._1 * l._2).sum
    val got = Round9.q219(spark, sf).collect()
    assert(got.length === 1)
    assert(got(0).getLong(0) === expected)
  }

  test("q220 tpch q11: replay; every kept part clears the 0.1% cut") {
    val sn = suppNation
    val vals = lines.filter(l => sn(l.suppkey) == "NATION_7")
      .groupBy(_.partkey).view.mapValues(_.map(l => cents(l.price)).sum)
      .toMap
    val total = vals.values.sum
    val expected = vals.toSeq.filter(_._2 * 1000 > total)
      .sortBy { case (pk, c) => (-c, pk) }
    val got = Round9.q220(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    got.foreach { case (_, c) => assert(c * 1000 > total) }
  }

  test("q221 tpch q12: replay; classes partition the year's lines") {
    val ord = orders.select($"o_orderkey", $"o_orderdate", $"o_orderpriority")
      .collect().map(r => r.getLong(0) ->
        (epochDay(r.get(1)), r.getString(2))).toMap
    val yr = lines.filter(l => l.shipDay >= day("1997-01-01")
      && l.shipDay < day("1998-01-01"))
    val expected = yr.groupBy { l =>
      if (l.shipDay - ord(l.orderkey)._1 > 60) "SLOW" else "FAST"
    }.view.mapValues { g =>
      val hi = g.count(l =>
        Set("1-URGENT", "2-HIGH")(ord(l.orderkey)._2)).toLong
      (hi, g.size.toLong - hi)
    }.toSeq.map { case (c, (h, l)) => (c, h, l) }.sortBy(_._1)
    val got = Round9.q221(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    assert(got.map(r => r._2 + r._3).sum === yr.size.toLong)
  }

  test("q222 tpch q13: replay; histogram mass equals the customer count") {
    val custs = customer.select($"c_custkey").as[Long].collect().toSeq
    val perCust = orders.select($"o_custkey", $"o_orderpriority").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .filter(_._2 != "5-LOW").groupBy(_._1).view.mapValues(_.size.toLong)
      .toMap
    val counts = custs.map(c => perCust.getOrElse(c, 0L))
    val expected = counts.groupBy(identity).view
      .mapValues(_.size.toLong).toSeq
      .sortBy { case (k, v) => (-v, -k) }
    val got = Round9.q222(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === expected)
    assert(got.map(_._2).sum === custs.size.toLong)
  }

  test("q223 tpch q15: replay; all output rows carry the maximum") {
    val rev = lines.filter(l => l.shipDay >= day("1997-01-01")
        && l.shipDay < day("1997-04-01"))
      .groupBy(_.suppkey).view
      .mapValues(_.map(l => BigInt(cents(l.price)) * (100 - bp(l.disc))).sum)
      .toMap
    val mx = rev.values.max
    val sName = supplier.select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = rev.toSeq.filter(_._2 == mx)
      .map { case (sk, r) => (sk, sName(sk), r.toLong) }.sortBy(_._1)
    val got = Round9.q223(spark, sf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got === expected)
    got.foreach(r => assert(r._3 === mx.toLong))
  }

  test("q224 tpch q16: replay of the denylisted distinct-supplier counts") {
    val deny = supplier.filter($"s_acctbal" < 0)
      .select($"s_suppkey").as[Long].collect().toSet
    val sizes = Set(1, 9, 15, 22, 30, 44, 49)
    val pInfo = part.select($"p_partkey", $"p_brand", $"p_type", $"p_size")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getInt(3))).toMap
    val expected = lines
      .filter(l => !deny(l.suppkey))
      .map(l => (pInfo(l.partkey), l.suppkey))
      .filter { case ((b, _, sz), _) => b != "Brand#5" && sizes(sz) }
      .distinct.groupBy(_._1).view.mapValues(_.size.toLong).toSeq
      .map { case ((b, t, sz), c) => (b, t, sz, c) }
      .sortBy { case (b, t, sz, c) => (-c, b, t, sz) }
    val got = Round9.q224(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1), r.getInt(2), r.getLong(3)))
      .toSeq
    assert(got === expected)
  }

  test("q225 tpch q19: exact cent·pct replay of the three OR bands") {
    val pInfo = part.select($"p_partkey", $"p_brand", $"p_size").collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    val matched = lines.filter { l =>
      val (brand, size) = pInfo(l.partkey)
      (brand == "Brand#12" && l.qty >= 1 && l.qty <= 11 &&
        size >= 1 && size <= 5) ||
      (brand == "Brand#23" && l.qty >= 10 && l.qty <= 20 &&
        size >= 1 && size <= 10) ||
      (brand == "Brand#34" && l.qty >= 20 && l.qty <= 30 &&
        size >= 1 && size <= 15)
    }
    val got = Round9.q225(spark, sf).collect()
    assert(got.length === 1)
    if (matched.isEmpty) {
      // SUM over the empty band set is NULL in BOTH engines (the
      // sf0.001 case) — the cross-engine agreement the gate relies on.
      assert(got(0).isNullAt(0))
    } else {
      val expected =
        matched.map(l => BigInt(cents(l.price)) * (100 - bp(l.disc))).sum
      assert(got(0).getLong(0) === expected.toLong)
    }
  }

  test("q226 tpch q20: replay; every kept supplier dominates some part") {
    val smallParts = part.filter($"p_name".startsWith("small"))
      .select($"p_partkey").as[Long].collect().toSet
    val shipped = lines.filter(l => smallParts(l.partkey)
        && l.shipDay >= day("1997-01-01") && l.shipDay < day("1998-01-01"))
      .groupBy(l => (l.suppkey, l.partkey)).view
      .mapValues(_.map(_.qty.toLong).sum).toMap
    val ptot = shipped.toSeq.groupBy(_._1._2).view
      .mapValues(_.map(_._2).sum).toMap
    val dominant = shipped.collect {
      case ((sk, pk), q) if q * 2 > ptot(pk) => sk
    }.toSet
    val sn = suppNation
    val sName = supplier.select($"s_suppkey", $"s_name").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val nations = Set("NATION_3", "NATION_7", "NATION_11")
    val expected = dominant.toSeq.filter(sk => nations(sn(sk)))
      .map(sk => (sName(sk), sn(sk))).sortBy(_._1)
    val got = Round9.q226(spark, sf).collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(got === expected)
  }

  test("q245 skyline: window pass equals the quadratic dominance replay") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val pts = spark.read.parquet(s"$dir/part.parquet")
        .select($"p_brand", $"p_retailprice", $"p_size").collect().toSeq
        .map(r => (r.getString(0), cents(r.getDouble(1)), r.getInt(2).toLong))
        .groupBy(identity).view.mapValues(_.size.toLong).toSeq
        .map { case ((b, c, z), n) => (b, c, z, n) }
      val expected = pts.filter { case (b, c, z, _) =>
        !pts.exists { case (b2, c2, z2, _) =>
          b2 == b && c2 <= c && z2 >= z && (c2 < c || z2 > z)
        }
      }.sortBy(t => (t._1, t._2))
      // Dominated points must exist or the frontier is the whole set.
      assert(expected.size < pts.size, s"nothing dominated at $dir")
      val got = Round9.q245(spark, dir).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got === expected, s"at $dir")
    }
  }
}
