package graft

/** The custom expressions must be reachable from plain SQL via the
  * GraftExtensions function-registry injection (Engine sets
  * `spark.sql.extensions`).
  */
class SqlFunctionsSpec extends SparkTestBase {

  test("title_case is callable from SQL") {
    val r = spark.sql("SELECT title_case(\"o'brien smith\") AS t").head().getString(0)
    assert(r === "O'Brien Smith")
  }

  test("dot_product is callable from SQL") {
    val r = spark.sql(
      "SELECT dot_product(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
      .head().getDouble(0)
    assert(r === 32.0)
  }

  test("functions are documented in the registry") {
    val desc = spark.sql("DESCRIBE FUNCTION title_case").collect().mkString
    assert(desc.contains("title_case"))
  }

  test("top_k_by_score aggregate is callable from SQL") {
    val rows = spark.sql(
      """SELECT g, top_k_by_score(s, i, 2) AS top FROM VALUES
        |  ('a', 1.0d, 10L), ('a', 3.0d, 11L), ('a', 2.0d, 12L),
        |  ('b', 5.0d, 20L)
        |AS t(g, s, i) GROUP BY g ORDER BY g""".stripMargin).collect()
    val a = rows(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(r => (r.getDouble(0), r.getLong(1))) === Seq((3.0, 11L), (2.0, 12L)))
    val b = rows(1).getSeq[org.apache.spark.sql.Row](1)
    assert(b.map(r => (r.getDouble(0), r.getLong(1))) === Seq((5.0, 20L)))
  }

  test("top_k_by_score coerces int score / int id via implicit casts") {
    val r = spark.sql(
      """SELECT top_k_by_score(s, i, 1) AS top FROM VALUES
        |  (1, 10), (7, 11), (3, 12) AS t(s, i)""".stripMargin)
      .head().getSeq[org.apache.spark.sql.Row](0)
    assert(r.map(x => (x.getDouble(0), x.getLong(1))) === Seq((7.0, 11L)))
  }

  test("top_k_by_score rejects a non-literal k") {
    val e = intercept[Exception] {
      spark.sql("SELECT top_k_by_score(1.0d, 1L, 1 + 1) AS t").collect()
    }
    assert(e.getMessage.contains("literal") || e.getMessage.toLowerCase.contains("int"),
      e.getMessage)
  }
}
