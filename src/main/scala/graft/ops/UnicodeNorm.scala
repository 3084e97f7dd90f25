package graft.ops

import java.text.Normalizer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text normalization for corpus cleaning, as codegen'd
  * Catalyst expressions (Spark has no built-in normalizer; a real
  * training-data pipeline canonicalizes text before hashing/dedup —
  * `"café"` composed and `"café"` decomposed must produce the
  * SAME content hash, shingles, and fingerprints, or every dedup
  * operator silently misses cross-form duplicates).
  *
  * Two surfaces, both also SQL-registered via [[graft.GraftExtensions]]:
  *   - `nfc_normalize`: canonical composition (NFC) — the web-standard
  *     storage form; combining sequences collapse to precomposed chars.
  *   - `strip_accents`: NFD-decompose then drop combining marks — the
  *     classic matching/search normalization (é→e, ü→u).
  *
  * Same structure as [[TitleCase]]: `UnaryExpression` whose `doGenCode`
  * delegates to a static helper, so both stay inside whole-stage
  * codegen. The helpers short-circuit via `Normalizer.isNormalized`
  * (pure ASCII — the overwhelming hot path at corpus scale — never
  * allocates).
  */
object UnicodeNormUtil {
  def nfc(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Contract: output is ALWAYS in NFC, marks removed. The no-mark path
    * must still NFC-normalize (not return the input verbatim): for
    * mark-free but decomposed input — e.g. conjoining Hangul jamo,
    * which NFD leaves decomposed and which contains no Mn characters —
    * returning the input would make strip_accents(x) differ from
    * strip_accents(nfc_normalize(x)), breaking both the canonical-hash
    * use case and the CollapseIdempotentNorms rewrite that relies on
    * the equivalence. ASCII (the hot path) still short-circuits inside
    * [[nfc]] with zero allocation.
    */
  def stripAccents(s: UTF8String): UTF8String = {
    val d = Normalizer.normalize(s.toString, Normalizer.Form.NFD)
    var hasMark = false
    var i = 0
    while (i < d.length && !hasMark) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        hasMark = true
      i += 1
    }
    if (!hasMark) nfc(s)
    else {
      val sb = new java.lang.StringBuilder(d.length)
      var j = 0
      while (j < d.length) {
        val c = d.charAt(j)
        if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
        j += 1
      }
      UTF8String.fromString(
        Normalizer.normalize(sb.toString, Normalizer.Form.NFC))
    }
  }
}

sealed abstract class UnicodeNormExpr extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.sql}")
}

case class NfcNormalize(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "nfc_normalize"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.nfc(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.UnicodeNormUtil.nfc($c)")
  override protected def withNewChildInternal(newChild: Expression): NfcNormalize =
    copy(child = newChild)
}

case class StripAccents(child: Expression) extends UnicodeNormExpr {
  override def prettyName: String = "strip_accents"
  override protected def nullSafeEval(input: Any): Any =
    UnicodeNormUtil.stripAccents(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.UnicodeNormUtil.stripAccents($c)")
  override protected def withNewChildInternal(newChild: Expression): StripAccents =
    copy(child = newChild)
}

object UnicodeNorm {
  import org.apache.spark.sql.graftbridge.Bridge
  def nfcNormalize(col: Column): Column =
    Bridge.column(NfcNormalize(Bridge.expression(col)))
  def stripAccents(col: Column): Column =
    Bridge.column(StripAccents(Bridge.expression(col)))
}
