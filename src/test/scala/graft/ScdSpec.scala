package graft

import org.apache.spark.sql.functions._

import graft.ops.Scd

/** SCD Type 2 semantics on a hand-built dimension: every row fate, plus
  * idempotence of re-applying the same snapshot.
  */
class ScdSpec extends SparkTestBase {
  import spark.implicits._

  private val d0 = java.sql.Date.valueOf("2024-01-01")
  private val d1 = java.sql.Date.valueOf("2024-06-01")

  private def dim() = Seq(
    // key 1: one history row + one current row
    (1L, "a-old", 10.0, d0, Some(d1), 0),
    (1L, "a", 11.0, d1, None, 1),
    (2L, "b", 20.0, d0, None, 1),
    (3L, "c", 30.0, d0, None, 1)
  ).toDF("k", "name", "bal", "valid_from", "valid_to", "is_current")

  private def incoming() = Seq(
    (2L, "b", 25.0), // changed balance
    (3L, "c", 30.0), // unchanged
    (4L, "d", 40.0)  // brand new; key 1 absent -> kept
  ).toDF("k", "name", "bal")

  private val batch = lit("2024-12-01").cast("date")

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2),
      r.getDate(3).toString, Option(r.getDate(4)).map(_.toString), r.getInt(5)))
      .toSet

  test("every row fate: history passes, changed closes+opens, new inserts") {
    val out = rows(Scd.scd2Apply(dim(), incoming(),
      Seq("k"), Seq("name", "bal"), batch))
    assert(out === Set(
      (1L, "a-old", 10.0, "2024-01-01", Some("2024-06-01"), 0), // history
      (1L, "a", 11.0, "2024-06-01", None, 1),                   // kept (absent)
      (2L, "b", 20.0, "2024-01-01", Some("2024-12-01"), 0),     // closed
      (2L, "b", 25.0, "2024-12-01", None, 1),                   // opened
      (3L, "c", 30.0, "2024-01-01", None, 1),                   // unchanged
      (4L, "d", 40.0, "2024-12-01", None, 1)))                  // new key
  }

  test("re-applying the same snapshot is a no-op") {
    val once = Scd.scd2Apply(dim(), incoming(), Seq("k"), Seq("name", "bal"), batch)
    val twice = Scd.scd2Apply(once, incoming(), Seq("k"), Seq("name", "bal"), batch)
    assert(rows(twice) === rows(once))
  }
}
