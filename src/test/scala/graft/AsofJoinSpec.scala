package graft

import org.apache.spark.sql.functions._

import graft.ops.AsofJoin.asofJoin
import graft.ops.{ColStats, StatsAggregator}

/** As-of join semantics (backward, tie-inclusive, outer) and the typed
  * Aggregator UDAF surface.
  */
class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val quotes = Seq(
    ("A", 1L, 10.0), ("A", 5L, 11.0), ("A", 9L, 12.0),
    ("B", 4L, 99.0)
  ).toDF("sym", "qt", "px")

  private val trades = Seq(
    ("A", 0L, 100), // before any quote -> null
    ("A", 5L, 200), // tie with quote@5 -> 11.0
    ("A", 7L, 300), // between 5 and 9 -> 11.0
    ("A", 12L, 400), // after last -> 12.0
    ("B", 3L, 500), // before B's only quote -> null
    ("C", 1L, 600) // key with no quotes at all -> null
  ).toDF("sym", "tt", "qty")

  test("backward as-of: latest right row at or before each left time") {
    val out = asofJoin(trades, quotes, Seq("sym"), "tt", "qt")
      .orderBy("sym", "tt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("A", 0L, None),
      ("A", 5L, Some(11.0)),
      ("A", 7L, Some(11.0)),
      ("A", 12L, Some(12.0)),
      ("B", 3L, None),
      ("C", 1L, None)))
  }

  test("as-of carries multi-column payload atomically from one right row") {
    val right = Seq(("A", 1L, 10.0, "ten"), ("A", 5L, 11.0, "eleven"))
      .toDF("sym", "qt", "px", "label")
    val out = asofJoin(trades.filter($"sym" === "A"), right, Seq("sym"), "tt", "qt")
      .filter($"tt" === 7L).head()
    assert(out.getAs[Double]("asof_px") === 11.0)
    assert(out.getAs[String]("asof_label") === "eleven")
  }

  test("as-of join shuffles once on the key") {
    val df = asofJoin(trades, quotes, Seq("sym"), "tt", "qt")
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length <= 1, exec.toString)
  }

  test("forward as-of: earliest right row at or after each left time") {
    import graft.ops.AsofJoin
    val out = AsofJoin.asofJoinDir(trades, quotes, Seq("sym"), "tt", "qt", AsofJoin.Forward)
      .orderBy("sym", "tt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("A", 0L, Some(10.0)),  // earliest quote at/after 0 is qt=1
      ("A", 5L, Some(11.0)),  // tie at 5 matches
      ("A", 7L, Some(12.0)),  // next quote is qt=9
      ("A", 12L, None),       // nothing after 12
      ("B", 3L, Some(99.0)),  // B's quote at 4
      ("C", 1L, None)))
  }

  test("nearest as-of picks the closer side, backward on ties") {
    import graft.ops.AsofJoin
    val out = AsofJoin.asofJoinDir(trades, quotes, Seq("sym"), "tt", "qt", AsofJoin.Nearest)
      .orderBy("sym", "tt")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    assert(out.toSeq === Seq(
      ("A", 0L, Some(10.0)),  // only forward exists (qt=1)
      ("A", 5L, Some(11.0)),  // exact hit
      ("A", 7L, Some(11.0)),  // back dist 2 (qt=5) <= fwd dist 2 (qt=9): tie -> backward
      ("A", 12L, Some(12.0)), // only backward exists
      ("B", 3L, Some(99.0)),  // only forward exists
      ("C", 1L, None)))       // no quotes at all
  }

  test("nearest as-of costs exactly two keyed shuffles") {
    import graft.ops.AsofJoin
    val df = AsofJoin.asofJoinDir(trades, quotes, Seq("sym"), "tt", "qt", AsofJoin.Nearest)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val shuffles = exec.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(shuffles.length <= 2, exec.toString)
  }

  test("payload orderability check: maps/variant fall back, atomics/structs/arrays order") {
    import org.apache.spark.sql.types._
    import graft.ops.AsofJoin.isOrderable
    assert(isOrderable(StructType(Seq(StructField("a", DoubleType), StructField("b", StringType)))))
    assert(isOrderable(ArrayType(LongType)))
    assert(!isOrderable(MapType(StringType, LongType)))
    assert(!isOrderable(StructType(Seq(StructField("m", MapType(StringType, LongType))))))
    assert(!isOrderable(ArrayType(MapType(StringType, LongType))))
    assert(!isOrderable(VariantType))
  }

  test("as-of join with a map payload still resolves deterministically") {
    val right = Seq(("A", 1L, Map("p" -> 10.0)), ("A", 5L, Map("p" -> 11.0)))
      .toDF("sym", "qt", "m")
    val out = asofJoin(trades.filter($"sym" === "A"), right, Seq("sym"), "tt", "qt")
      .filter($"tt" === 7L).head()
    assert(out.getAs[Map[String, Double]]("asof_m") === Map("p" -> 11.0))
  }

  test("StatsAggregator computes single-pass stats, skipping nulls") {
    val agg = new StatsAggregator().toColumn
    val ds = Seq[java.lang.Double](1.0, 2.0, null, 4.0).toDS()
    val r: ColStats = ds.select(agg).head()
    assert(r === ColStats(3L, 1.0, 4.0, 7.0))
    assert(r.mean === 7.0 / 3)
  }

  test("StatsAggregator works as a grouped udaf over a DataFrame") {
    spark.udf.register("col_stats", org.apache.spark.sql.functions.udaf(new StatsAggregator))
    val out = Seq(("a", 1.0), ("a", 3.0), ("b", 5.0)).toDF("k", "v")
      .createOrReplaceTempView("t")
    val r = spark.sql("SELECT k, col_stats(v) AS s FROM t GROUP BY k ORDER BY k").collect()
    assert(r(0).getStruct(1).getLong(0) === 2L) // count for k=a
    assert(r(1).getStruct(1).getDouble(3) === 5.0) // sum for k=b
  }
}
