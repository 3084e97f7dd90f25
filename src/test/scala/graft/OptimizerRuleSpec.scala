package graft

import org.apache.spark.sql.functions._

import graft.ops.{NfcNormalize, StripAccents, UnicodeNorm}

/** The injected CollapseIdempotentNorms optimizer rule: nested
  * idempotent normalizers collapse to one call in the OPTIMIZED plan
  * (what codegen compiles), and semantics are unchanged.
  *
  * Inputs come from a parquet-backed table: over a LocalRelation,
  * ConvertToLocalRelation would evaluate the whole projection at
  * optimization time and there would be nothing left to count.
  */
class OptimizerRuleSpec extends SparkTestBase {

  private val docs = () =>
    Tables.table(spark, "/root/testdata/sf0.001", "documents")

  private def countExpr(df: org.apache.spark.sql.DataFrame,
      pred: org.apache.spark.sql.catalyst.expressions.Expression => Boolean): Int = {
    var n = 0
    df.queryExecution.optimizedPlan.transformAllExpressions {
      case e if pred(e) => n += 1; e
    }
    n
  }

  test("nfc(nfc(x)) collapses to one nfc call") {
    val df = docs().select(
      UnicodeNorm.nfcNormalize(UnicodeNorm.nfcNormalize(col("text"))).as("n"))
    assert(countExpr(df, _.isInstanceOf[NfcNormalize]) === 1)
  }

  test("strip(nfc(x)) drops the inner nfc (NFD(NFC(x)) = NFD(x))") {
    val df = docs().select(
      UnicodeNorm.stripAccents(UnicodeNorm.nfcNormalize(col("text"))).as("s"))
    assert(countExpr(df, _.isInstanceOf[NfcNormalize]) === 0)
    assert(countExpr(df, _.isInstanceOf[StripAccents]) === 1)
  }

  test("triple-nested strip_accents collapses fully; results unchanged") {
    val base = docs().limit(5)
    val nested = base.select(col("doc_id"), UnicodeNorm.stripAccents(
      UnicodeNorm.stripAccents(UnicodeNorm.stripAccents(col("text")))).as("s"))
    assert(countExpr(nested, _.isInstanceOf[StripAccents]) === 1)
    val single = base.select(col("doc_id"), UnicodeNorm.stripAccents(col("text")).as("s"))
    assert(nested.orderBy("doc_id").collect().map(_.getString(1)).toSeq ===
      single.orderBy("doc_id").collect().map(_.getString(1)).toSeq)
  }

  test("the rule fires for SQL-registered functions too") {
    docs().limit(1).createOrReplaceTempView("__norm_docs")
    val df = spark.sql(
      "SELECT nfc_normalize(nfc_normalize(text)) AS n FROM __norm_docs")
    assert(countExpr(df, _.isInstanceOf[NfcNormalize]) === 1)
  }
}
