package graft

import org.apache.spark.sql.functions._

import graft.ext.Patterns

/** Full driver-side replays of the pattern-mining family on the
  * sf0.001 fixtures — every count, rank, and scaled ratio recomputed
  * independently in plain Scala.
  */
class PatternsSpec extends SparkTestBase {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("q161 association rules: full top-50 replay from raw lineitem") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".as("o"), $"l_partkey".as("p")).distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val n = li.map(_._1).distinct.length.toLong
    val sup = li.groupBy(_._2).map { case (p, xs) => p -> xs.length.toLong }
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).sorted)
    val pairSup = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- (i + 1) until ps.length) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val expected = pairSup.toSeq
      .sortBy { case ((a, b), s) => (-s, a, b) }
      .take(50)
      .map { case ((a, b), sAb) =>
        (a, b, sAb, sup(a), sup(b),
          math.round(sAb.toDouble / sup(a) * 10000),
          math.round(sAb * n / (sup(a).toDouble * sup(b)) * 10000))
      }
    val got = Patterns.q161(spark, sf).collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5), r.getLong(6))).toSeq
    assert(got === expected)
  }

  test("q162 transitions: full replay; per-source rows partition the steps") {
    val ev = spark.read.parquet(s"$sf/events.parquet")
      .select($"user_id", $"ts".cast("long"), $"event_id", $"event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._1).values.flatMap { es =>
      val seq = es.sortBy(e => (e._2, e._3)).map(_._4)
      seq.zip(seq.tail)
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val fromTot = trans.groupBy(_._1._1).map { case (f, xs) => f -> xs.values.sum }
    val expected = trans.toSeq.sortBy(_._1).map { case ((f, t), c) =>
      (f, t, c, fromTot(f), math.round(c.toDouble / fromTot(f) * 10000))
    }
    val got = Patterns.q162(spark, sf).collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    assert(got === expected)
  }

  test("q163 weighted median: full replay; half-mass property holds") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .select($"source", $"doc_id", size(split($"text", " ")).cast("long").as("len"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = docs.groupBy(_._1).toSeq.sortBy(_._1).map { case (src, xs) =>
      val sorted = xs.sortBy(x => (x._3, x._2)).map(_._3)
      val total = sorted.sum
      var cum = 0L
      val wm = sorted.find { l => cum += l; cum * 2 >= total }.get
      (src, total, wm)
    }
    val got = Patterns.q163(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
    // half-mass property: tokens in docs of length <= wm are >= half
    got.foreach { case (src, total, wm) =>
      val below = docs.filter(d => d._1 == src && d._3 <= wm).map(_._3).sum
      assert(below * 2 >= total, s"$src: $below of $total below $wm")
    }
  }
}
