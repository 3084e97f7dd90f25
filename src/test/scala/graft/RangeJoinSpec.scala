package graft

import org.apache.spark.sql.functions._

import graft.ops.RangeJoin.rangeJoin

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val points = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 35L))
    .toDF("pid", "t")
  private val intervals = Seq(
    ("a", 0L, 10L),   // contains t=5
    ("b", 5L, 30L),   // contains 5, 15, 25
    ("c", 14L, 16L),  // contains 15
    ("d", 100L, 200L) // contains nothing
  ).toDF("iv", "s", "e")

  test("bucketed range join equals the naive non-equi join") {
    val naive = points.join(intervals, $"s" <= $"t" && $"t" <= $"e")
      .select("pid", "iv").orderBy("pid", "iv").collect().toSeq
    for (width <- Seq(1L, 7L, 10L, 1000L)) {
      val bucketed = rangeJoin(points, intervals, "t", "s", "e", width)
        .select("pid", "iv").orderBy("pid", "iv").collect().toSeq
      assert(bucketed === naive, s"width=$width")
    }
    assert(naive.map(r => (r.getLong(0), r.getString(1))) ===
      Seq((1L, "a"), (1L, "b"), (2L, "b"), (2L, "c"), (3L, "b")))
  }

  test("interval overlap join equals the naive overlap join, each pair exactly once") {
    import graft.ops.RangeJoin.intervalOverlapJoin
    val a = Seq(("x", 0L, 10L), ("y", 5L, 30L), ("z", 40L, 45L), ("w", -8L, -2L))
      .toDF("aid", "as", "ae")
    val b = Seq(("p", 8L, 12L), ("q", 28L, 50L), ("r", 60L, 70L), ("s", -5L, 1L))
      .toDF("bid", "bs", "be")
    val naive = a.join(b, $"as" <= $"be" && $"bs" <= $"ae")
      .select("aid", "bid").orderBy("aid", "bid")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(naive === Seq(("w", "s"), ("x", "p"), ("x", "s"),
      ("y", "p"), ("y", "q"), ("z", "q")))
    for (width <- Seq(1L, 4L, 16L, 1000L)) {
      val bucketed = intervalOverlapJoin(a, b, "as", "ae", "bs", "be", width)
        .select("aid", "bid").orderBy("aid", "bid")
        .collect().map(r => (r.getString(0), r.getString(1))).toSeq
      // equality (not set-equality) also proves the exactly-once contract:
      // a pair sharing k buckets must NOT appear k times
      assert(bucketed === naive, s"width=$width")
    }
  }

  test("bucketed plan avoids the nested-loop join") {
    val df = rangeJoin(points, intervals, "t", "s", "e", 10L)
    df.write.format("noop").mode("overwrite").save()
    val exec = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    val s = exec.toString
    assert(!s.contains("BroadcastNestedLoop") && !s.contains("CartesianProduct"), s)
  }
}
