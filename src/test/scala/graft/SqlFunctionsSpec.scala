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
}
