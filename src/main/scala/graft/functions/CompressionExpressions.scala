package graft.functions

import java.util.zip.Deflater

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `deflate_ratio(text)`: compressed/raw byte-length ratio of the
  * UTF-8 text at a fixed zlib level — the compression-based quality
  * signal training pipelines use beside token heuristics (a very low
  * ratio flags repetitive boilerplate, a ratio near/above 1 flags
  * high-entropy noise; both tails get filtered). Deterministic by
  * construction: fixed level, default strategy, whole-input deflate,
  * no dictionary.
  *
  * Ships as a library expression + unit spec rather than an oracled
  * query: zlib is not exposed in DuckDB SQL, so there is no
  * cross-engine oracle to hash against (the x8/x19 token-statistic
  * signals remain the oracled quality carriers).
  */
object CompressionExpressions {

  /** Static helper the generated code calls. One Deflater per call:
    * Deflater is stateful/not thread-safe, and its allocation is
    * trivial next to the deflate work itself. */
  def deflateRatio(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.isEmpty) return 1.0
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION, false)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](Math.max(64, raw.length + 32))
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total.toDouble / raw.length
    } finally d.end()
  }

  /** Column API. */
  def deflateRatio(c: Column): Column =
    GraftBridge.toColumn(DeflateRatio(GraftBridge.toExpression(c)))
}

case class DeflateRatio(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"deflate_ratio expects string, got ${child.dataType.simpleString}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "deflate_ratio"

  override def nullSafeEval(input: Any): Any =
    CompressionExpressions.deflateRatio(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.CompressionExpressions.deflateRatio($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
