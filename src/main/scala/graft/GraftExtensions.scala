package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.ops.{DeflateLen, DotProduct, JaroWinkler, NfcNormalize, StripAccents, TitleCase}

/** SparkSessionExtensions entry point: registers the engine's custom
  * Catalyst expressions in the SQL function registry, so `spark.sql`
  * users get them by name — not just the Scala Column API.
  *
  * Activated via `spark.sql.extensions=graft.GraftExtensions`
  * (Engine.session sets it).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, "")

  override def apply(ext: SparkSessionExtensions): Unit = {
    // Optimizer rule: collapse idempotent normalizer chains
    // (nfc_normalize/strip_accents/title_case) before codegen.
    ext.injectOptimizerRule(_ => graft.plans.CollapseIdempotentNorms)

    def arity(name: String, n: Int, children: Seq[Expression]): Unit =
      if (children.length != n)
        throw new IllegalArgumentException(
          s"$name expects $n argument(s), got ${children.length}")

    ext.injectFunction((
      new FunctionIdentifier("title_case"),
      info("title_case",
        "title_case(str) - Python str.title() semantics: letters after a non-letter upcase, letters after a letter downcase."),
      (children: Seq[Expression]) => {
        arity("title_case", 1, children); TitleCase(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("nfc_normalize"),
      info("nfc_normalize",
        "nfc_normalize(str) - Unicode canonical composition (NFC); combining sequences collapse to precomposed chars."),
      (children: Seq[Expression]) => {
        arity("nfc_normalize", 1, children); NfcNormalize(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("strip_accents"),
      info("strip_accents",
        "strip_accents(str) - NFD-decompose then drop combining marks (é→e, ü→u)."),
      (children: Seq[Expression]) => {
        arity("strip_accents", 1, children); StripAccents(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("deflate_len"),
      info("deflate_len",
        "deflate_len(str) - raw-DEFLATE length of the UTF-8 text at fixed level 6 (compression-ratio quality signal)."),
      (children: Seq[Expression]) => {
        arity("deflate_len", 1, children); DeflateLen(children.head)
      }))

    ext.injectFunction((
      new FunctionIdentifier("dot_product"),
      info("dot_product",
        "dot_product(a, b) - fused-loop dot product of two array<double> columns."),
      (children: Seq[Expression]) => {
        arity("dot_product", 2, children); DotProduct(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("jaro_winkler"),
      info("jaro_winkler",
        "jaro_winkler(a, b) - Jaro-Winkler similarity in [0,1]: Jaro with the 0.1-scaled common-prefix boost (cap 4) above 0.7."),
      (children: Seq[Expression]) => {
        arity("jaro_winkler", 2, children)
        JaroWinkler(children(0), children(1))
      }))

    ext.injectFunction((
      new FunctionIdentifier("top_k_by_score"),
      info("top_k_by_score",
        "top_k_by_score(score, id, k) - aggregate: bounded-heap top-k (score DESC, ties to lowest id) of (double, bigint) pairs; k must be a literal int."),
      (children: Seq[Expression]) => {
        arity("top_k_by_score", 3, children)
        val k = children(2) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"top_k_by_score: k must be a literal int, got $other")
        }
        graft.ops.TopKByScore(children(0), children(1), k)
      }))
  }
}
