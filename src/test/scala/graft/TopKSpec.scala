package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.TopKByScore

/** Semantics of the bounded-heap top-k aggregate: must equal the
  * windowed row_number form on every input shape, including the ones
  * that exercise partial-buffer serialize/merge across partitions.
  */
class TopKSpec extends SparkTestBase {
  import spark.implicits._

  private def windowed(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .withColumn("rk", row_number().over(
      Window.partitionBy($"key").orderBy($"score".desc, $"id")))
    .filter($"rk" <= k)
    .select($"key", $"rk".cast("long"), $"id", $"score")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  private def viaAgg(df: org.apache.spark.sql.DataFrame, k: Int) = df
    .groupBy($"key")
    .agg(TopKByScore.topK($"score", $"id", k).as("top"))
    .select($"key", posexplode($"top").as(Seq("i", "t")))
    .select($"key", ($"i" + 1).cast("long"), $"t.id", $"t.score")
    .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    .toSet

  test("topK equals the windowed form across partitions, ties, short groups") {
    // 200 rows over 3 keys; scores collide intentionally (i % 7) so
    // tie-break (lowest id wins) is exercised; 'tiny' has fewer rows
    // than k; repartition(7) forces partial buffers to serialize+merge.
    val df = ((1L to 200L).map(i => (s"g${i % 3}", i, (i % 7).toDouble)) ++
      Seq(("tiny", 900L, 5.0), ("tiny", 901L, 5.0)))
      .toDF("key", "id", "score")
      .repartition(7)
    assert(viaAgg(df, 4) === windowed(df, 4))
    assert(viaAgg(df, 1) === windowed(df, 1))
  }

  test("topK skips null scores and ids") {
    val df = Seq(
      ("a", Some(1L), Some(2.0)),
      ("a", None, Some(9.0)),          // null id — ignored
      ("a", Some(3L), None),           // null score — ignored
      ("a", Some(4L), Some(1.0))
    ).toDF("key", "id", "score")
    val got = df.groupBy($"key")
      .agg(TopKByScore.topK($"score", $"id", 3).as("top"))
      .select(explode($"top").as("t")).select($"t.id").as[Long].collect().toSeq
    assert(got === Seq(1L, 4L))
  }

  test("topK is deterministic across evaluations on a shuffled frame") {
    val df = (1L to 500L).map(i => (s"k${i % 5}", i, ((i * 37) % 11).toDouble))
      .toDF("key", "id", "score").repartition(13)
    val a = viaAgg(df, 3)
    val b = viaAgg(df, 3)
    assert(a === b)
  }
}
