package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-`str.title()` semantics as a codegen'd Catalyst expression.
  *
  * The reference normalizes patient names with `name.strip().title()`
  * (reference `migration.py:51-63`). Python's `title()` uppercases a
  * letter that follows a NON-letter and lowercases a letter that follows
  * a letter — so `"o'brien"` → `"O'Brien"` and `"jean-luc"` →
  * `"Jean-Luc"`, where Spark's `initcap` (whitespace word boundaries)
  * yields `"O'brien"` / `"Jean-luc"`.
  *
  * Implemented as a native `UnaryExpression` with `doGenCode` delegating
  * to a static Java-callable method, so it stays inside whole-stage
  * codegen instead of falling out of the generated pipeline the way a
  * Scala UDF would.
  */
object TitleCaseUtil {
  /** Static entry point used by both interpreted eval and codegen. */
  def titleCase(s: UTF8String): UTF8String = {
    val str = s.toString
    val sb = new java.lang.StringBuilder(str.length)
    var prevLetter = false
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val isLetter = Character.isLetter(cp)
      val out =
        if (!isLetter) cp
        else if (prevLetter) Character.toLowerCase(cp)
        else Character.toTitleCase(cp)
      sb.appendCodePoint(out)
      prevLetter = isLetter
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

case class TitleCase(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"title_case requires a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "title_case"

  override protected def nullSafeEval(input: Any): Any =
    TitleCaseUtil.titleCase(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.TitleCaseUtil.titleCase($c)")

  override protected def withNewChildInternal(newChild: Expression): TitleCase =
    copy(child = newChild)
}

object TitleCase {
  /** Expose as a `Column` for the DataFrame API (via the sql-package
    * bridge, since the Column↔Expression converters are private[sql]
    * in Spark 4).
    */
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(col: Column): Column =
    Bridge.column(TitleCase(Bridge.expression(col)))
}
