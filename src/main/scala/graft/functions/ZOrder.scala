package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Morton (Z-order) interleaving for multi-dimensional data clustering.
  *
  * `bit_interleave(a, b)` weaves the low 16 bits of two keys into one
  * 32-bit curve position: sorting by it clusters BOTH dimensions at
  * once, so parquet min/max (zone-map) skipping serves range predicates
  * on either column — the multi-column generalization of
  * `io_sorted_layout`'s single-key clustering, and the standard layout
  * trick for 100 TB fact tables with more than one dominant filter
  * column (cf. the Z-ordering literature: Morton 1966; Orenstein &
  * Merrett 1984). Pure bit arithmetic, codegen'd: layout cost is the
  * one range-shuffle of the write, read-side cost is zero.
  */
object ZOrder {

  /** Spread the low 16 bits of x to even positions (magic-number dilate). */
  def spread16(x: Long): Long = {
    var v = x & 0xffffL
    v = (v | (v << 8)) & 0x00ff00ffL
    v = (v | (v << 4)) & 0x0f0f0f0fL
    v = (v | (v << 2)) & 0x33333333L
    v = (v | (v << 1)) & 0x55555555L
    v
  }

  /** Morton code of (a, b) over the low 16 bits of each. Called from
    * generated code. */
  def interleave(a: Long, b: Long): Long =
    spread16(a) | (spread16(b) << 1)

  /** Register `bit_interleave(a, b)` in this session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bit_interleave",
      exprs => BitInterleave(exprs(0), exprs(1)),
      "built-in")
}

case class BitInterleave(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bit_interleave"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = children.forall(_.dataType == LongType)
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bit_interleave needs (BIGINT, BIGINT), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.ZOrder.interleave($a, $b)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}
