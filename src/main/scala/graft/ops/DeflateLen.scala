package graft.ops

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Compression-ratio quality signal: DEFLATE length of the UTF-8 text
  * (fixed level, raw stream — deterministic for a given input). The
  * ratio deflate_len/byte_len is the classic cheap proxy for
  * repetitive/boilerplate documents — highly compressible text is
  * template noise, incompressible text is often binary junk; quality
  * corpora sit in a band between (used alongside the Gopher-style
  * rules in q92/q108).
  *
  * Engine-local (no DEFLATE in the oracle engine), so its query row is
  * rows-only by design — the determinism and known-ratio contracts are
  * unit-tested instead. Codegen'd like [[TitleCase]].
  */
object DeflateUtil {
  // One zlib stream + scratch buffer per executor thread, reset()
  // between rows: Deflater init/end is a JNI native-state cycle that
  // costs about as much as deflating a small document — per-row
  // allocation would double the operator. The thread-local lives for
  // the executor thread's lifetime (bounded: one native stream per
  // core), the standard pattern for per-row codec use.
  private val localDeflater = ThreadLocal.withInitial[Deflater](() =>
    new Deflater(6, true))
  private val localBuf = ThreadLocal.withInitial[Array[Byte]](() =>
    new Array[Byte](8192))

  /** Raw-DEFLATE output length at fixed level 6. zlib's algorithm is
    * fully deterministic for (input, level, strategy), so this is a
    * stable per-row metric, not an approximation.
    */
  def deflateLen(s: UTF8String): Int = {
    val bytes = s.getBytes
    val d = localDeflater.get()
    d.reset()
    d.setInput(bytes)
    d.finish()
    val buf = localBuf.get()
    var total = 0
    while (!d.finished()) total += d.deflate(buf)
    total
  }
}

case class DeflateLen(child: Expression) extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_len requires a string argument, got ${child.dataType.sql}")
  override def prettyName: String = "deflate_len"
  override protected def nullSafeEval(input: Any): Any =
    DeflateUtil.deflateLen(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.DeflateUtil.deflateLen($c)")
  override protected def withNewChildInternal(newChild: Expression): DeflateLen =
    copy(child = newChild)
}

object DeflateLen {
  import org.apache.spark.sql.graftbridge.Bridge
  def apply(col: Column): Column =
    Bridge.column(DeflateLen(Bridge.expression(col)))
}
