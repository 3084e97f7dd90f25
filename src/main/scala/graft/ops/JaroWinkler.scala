package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Jaro–Winkler string similarity as a codegen'd Catalyst expression —
  * the record-linkage primitive (Winkler 1990) behind fuzzy entity
  * matching, complementing the Levenshtein path (q128): edit distance
  * counts operations, Jaro–Winkler rewards shared prefixes and
  * tolerates transpositions, which is what name/title matching wants.
  *
  * Canonical definition, matched against DuckDB's
  * `jaro_winkler_similarity` on the classic test vectors (martha/marhta
  * 0.9611, dwayne/duane 0.84, dixon/dicksonx 0.8133, ab/ba 0.0):
  *  - match window = max(|a|,|b|)/2 − 1 (floor, min 0);
  *  - m matches, t = half the transposed matched pairs;
  *  - jaro = (m/|a| + m/|b| + (m−t)/m) / 3, 0 when m = 0;
  *  - winkler boost ONLY when jaro > 0.7: jw = jaro + l·0.1·(1−jaro)
  *    with l = common prefix length capped at 4.
  *
  * Operates on UTF-16 code units of the decoded string (identical to
  * character semantics for the ASCII fixture data; documented caveat
  * for astral-plane text). Downstream consumers grid the score
  * (`Similarity.intScaled`) before any hash-compared decision, with
  * rounding margins spec-measured — the q134 discipline, since two
  * engines may differ in the last ulp of the division chain.
  *
  * `doGenCode` delegates to the static `JaroWinklerUtil.jw`, so the
  * expression stays inside whole-stage codegen (the TitleCase pattern).
  */
object JaroWinklerUtil {
  /** Static entry point used by both interpreted eval and codegen. */
  def jw(a: UTF8String, b: UTF8String): Double = {
    val x = a.toString
    val y = b.toString
    val la = x.length
    val lb = y.length
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val xFlags = new Array[Boolean](la)
    val yFlags = new Array[Boolean](lb)
    var m = 0
    var i = 0
    while (i < la) {
      val lo = math.max(0, i - window)
      val hi = math.min(lb - 1, i + window)
      var j = lo
      var found = false
      while (j <= hi && !found) {
        if (!yFlags(j) && y.charAt(j) == x.charAt(i)) {
          xFlags(i) = true
          yFlags(j) = true
          m += 1
          found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // transpositions: walk the matched chars of both strings in order
    var t2 = 0 // twice the transposition count
    var j = 0
    i = 0
    while (i < la) {
      if (xFlags(i)) {
        while (!yFlags(j)) j += 1
        if (x.charAt(i) != y.charAt(j)) t2 += 1
        j += 1
      }
      i += 1
    }
    val md = m.toDouble
    val jaro = (md / la + md / lb + (md - t2 / 2) / md) / 3.0
    if (jaro <= 0.7) return jaro
    var l = 0
    val maxL = math.min(4, math.min(la, lb))
    while (l < maxL && x.charAt(l) == y.charAt(l)) l += 1
    jaro + l * 0.1 * (1.0 - jaro)
  }
}

case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "jaro_winkler"

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == StringType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"jaro_winkler requires (string, string), got " +
        s"(${left.dataType.sql}, ${right.dataType.sql})")

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaroWinklerUtil.jw(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.ops.JaroWinklerUtil.jw($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(a: Column, b: Column): Column =
    Bridge.column(JaroWinkler(Bridge.expression(a), Bridge.expression(b)))
}
