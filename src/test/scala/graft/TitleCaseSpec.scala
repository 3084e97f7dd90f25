package graft

import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.ops.{cleanName, TitleCase, TitleCaseUtil}

/** F1 semantics lock (SURVEY §7.4.1): Python `str.title()` word
  * boundaries, which `initcap` gets wrong — reference `migration.py:51-63`.
  */
class TitleCaseSpec extends SparkTestBase {

  private def title(s: String): String =
    TitleCaseUtil.titleCase(UTF8String.fromString(s)).toString

  test("apostrophe is a word boundary: o'brien -> O'Brien") {
    assert(title("o'brien") === "O'Brien")
  }

  test("hyphen is a word boundary: jean-luc -> Jean-Luc") {
    assert(title("jean-luc") === "Jean-Luc")
  }

  test("mixed case is fully renormalized: mR. SMith -> Mr. Smith") {
    assert(title("mR. SMith") === "Mr. Smith")
  }

  test("initcap would differ on the apostrophe case") {
    // Sanity check that the custom expression is actually needed.
    val viaInitcap = spark.sql("SELECT initcap(\"o'brien\") AS x")
      .head().getString(0)
    assert(viaInitcap === "O'brien")
    assert(title("o'brien") !== viaInitcap)
  }

  test("digits and punctuation pass through; letters after them upcase") {
    assert(title("3rd ave, apt 4b") === "3Rd Ave, Apt 4B")
    assert(title("a1a") === "A1A")
  }

  test("empty and whitespace-only strings") {
    assert(title("") === "")
    assert(title("   ") === "   ")
  }

  test("non-BMP letters (surrogate pairs) are handled per code point") {
    // DESERET letters: 𐐨 (small) / 𐐀 (capital) are a case pair off the BMP.
    // first (follows start) title-cases to 𐐀; second (follows a letter)
    // lower-cases to itself.
    assert(title("𐐨𐐨") === "𐐀𐐨")
  }

  test("idempotence on sample corpus") {
    for (s <- Seq("o'brien", "jean-luc", "  mR. SMith ", "3rd ave", "ALL CAPS", "ß sharp"))
      assert(title(title(s)) === title(s))
  }

  test("null propagates through the Column API") {
    import spark.implicits._
    val out = Seq[(Integer, String)]((1, null), (2, "ann lee"))
      .toDF("id", "name")
      .select(col("id"), TitleCase(col("name")).as("t"))
      .orderBy("id")
      .collect()
    assert(out(0).isNullAt(1))
    assert(out(1).getString(1) === "Ann Lee")
  }

  test("cleanName trims before title-casing") {
    import spark.implicits._
    val out = Seq("  mR. SMith ").toDF("name")
      .select(cleanName(col("name")).as("t")).head().getString(0)
    assert(out === "Mr. Smith")
  }

  test("expression participates in whole-stage codegen") {
    import spark.implicits._
    // A range source, not a local Seq: ConvertToLocalRelation would
    // constant-fold a literal input and leave no codegen stage to check.
    val df = spark.range(2)
      .select(TitleCase(concat(lit("x y"), $"id".cast("string"))).as("t"))
    val hasWSC = df.queryExecution.executedPlan.exists {
      case _: WholeStageCodegenExec => true
      case _ => false
    }
    assert(hasWSC, df.queryExecution.executedPlan.toString)
    assert(df.orderBy("t").head().getString(0) === "X Y0")
  }
}
