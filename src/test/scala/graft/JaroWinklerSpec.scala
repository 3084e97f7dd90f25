package graft

import org.apache.spark.sql.functions._

import graft.ops.{JaroWinkler, JaroWinklerUtil}
import org.apache.spark.unsafe.types.UTF8String

/** JaroWinkler expression semantics: the classic literature vectors
  * (cross-checked against DuckDB's `jaro_winkler_similarity`, which the
  * q252 oracle calls), the 0.7 boost threshold, the integer-halved
  * transposition count, null propagation, and interpreted/codegen
  * parity.
  */
class JaroWinklerSpec extends SparkTestBase {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.jw(UTF8String.fromString(a), UTF8String.fromString(b))

  test("classic vectors match the DuckDB oracle implementation") {
    // Values printed by DuckDB jaro_winkler_similarity on these pairs.
    val cases = Seq(
      ("martha", "marhta", 0.9611111111111111),
      ("dwayne", "duane", 0.8400000000000001),
      ("dixon", "dicksonx", 0.8133333333333332),
      ("abc", "abc", 1.0),
      ("", "abc", 0.0),
      ("ab", "ba", 0.0),                        // window 0: no matches
      ("abcdef", "bcadef", 0.9444444444444445), // odd t2: integer t=1
      ("crate", "trace", 0.7333333333333334),
      ("abcde", "abdce", 0.9466666666666665))
    for ((a, b, expected) <- cases) {
      assert(math.abs(jw(a, b) - expected) < 1e-12, s"jw($a, $b)")
      assert(jw(a, b) === jw(b, a), s"symmetry jw($a, $b)")
    }
  }

  test("winkler boost applies only above jaro 0.7") {
    // jaro = 0.611 with a 4-char common prefix: boost must NOT fire.
    assert(math.abs(jw("abcdxxxx", "abcdyyyyzzzz") - 0.611111111111111) < 1e-12)
    // dwayne/duane jaro ~0.822 > 0.7, prefix 1: boost fires.
    assert(jw("dwayne", "duane") > 0.83)
  }

  test("column API, SQL registry, and interpreted eval agree") {
    val df = Seq(("martha", "marhta"), ("dixon", "dicksonx"),
      ("small ring", "small ramp")).toDF("a", "b")
    val viaCol = df.select(JaroWinkler($"a", $"b")).collect().map(_.getDouble(0))
    df.createOrReplaceTempView("jw_pairs")
    val viaSql = spark.sql("SELECT jaro_winkler(a, b) FROM jw_pairs")
      .collect().map(_.getDouble(0))
    val direct = Seq(jw("martha", "marhta"), jw("dixon", "dicksonx"),
      jw("small ring", "small ramp"))
    assert(viaCol.toSeq === direct)
    assert(viaSql.toSeq === direct)
  }

  test("null propagates; non-string inputs fail analysis") {
    val r = spark.sql("SELECT jaro_winkler(CAST(NULL AS STRING), 'x')")
      .head()
    assert(r.isNullAt(0))
    intercept[Exception] {
      spark.sql("SELECT jaro_winkler(1, 'x')").collect()
    }
  }
}
