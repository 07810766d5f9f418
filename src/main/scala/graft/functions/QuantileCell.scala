package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Rank-scaling for the z-order compact: `cell(v)` = the number of
  * quantile boundaries STRICTLY below v — a codegen'd binary search
  * over the (sorted, repeats-kept) boundary array instead of a
  * 255-branch chained when()-sum. Per-row cost drops from 255
  * comparisons per dimension to O(log 256), and the generated code is
  * one static call instead of a ~500-node expression tree — which
  * matters in a build whose code-cache reserve is documented as
  * load-bearing. Boundaries ride along as a shared reference object,
  * never serialized per row.
  *
  * Registered as `quantile_cell(value, bounds_array)`; the bounds
  * argument must be FOLDABLE (a literal array) — it is evaluated once
  * at plan time.
  */
object QuantileCell {

  /** Index of the first element ≥ v == count of elements strictly
    * below v. Duplicate boundaries stay counted — the repeats ARE the
    * equal-frequency weighting. Called from generated code. */
  def countBelow(bs: Array[Double], v: Double): Long = {
    var lo = 0
    var hi = bs.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (bs(mid) < v) lo = mid + 1 else hi = mid
    }
    lo.toLong
  }

  /** Register `quantile_cell(value, bounds)` in this session
    * (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "quantile_cell",
      exprs => {
        if (exprs.length != 2)
          throw new IllegalArgumentException(
            s"quantile_cell takes (value, bounds_array), got ${exprs.length} argument(s)")
        val bounds = exprs(1) match {
          case b if b.foldable && (b.dataType match {
                case ArrayType(DoubleType, _) => true
                case _ => false
              }) =>
            val ad = b.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            if ((0 until ad.numElements()).exists(ad.isNullAt))
              throw new IllegalArgumentException(
                "quantile_cell: bounds array must not contain nulls")
            ad.toDoubleArray()
          case other => throw new IllegalArgumentException(
            s"quantile_cell: bounds must be a literal ARRAY<DOUBLE>, " +
              s"got ${other.dataType} (foldable=${other.foldable})")
        }
        QuantileCellExpr(exprs(0), bounds.toIndexedSeq)
      },
      "built-in")
}

/** Bounds are held as an immutable Seq, NOT Array: a case class over an
  * Array compares by reference, so two semantically identical
  * expressions would never be `==` and Catalyst canonicalization /
  * semanticEquals / common-subexpression elimination would silently
  * miss them (r16 ADVICE). The runtime path still hands generated code
  * a primitive double[] (materialized once per plan, shared by
  * reference). */
case class QuantileCellExpr(child: Expression, bounds: IndexedSeq[Double])
    extends UnaryExpression {

  @transient private lazy val boundsArr: Array[Double] = bounds.toArray

  override def dataType: DataType = LongType
  override def prettyName: String = "quantile_cell"
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"quantile_cell needs a DOUBLE value, got ${child.dataType}")

  override def nullSafeEval(v: Any): Any =
    QuantileCell.countBelow(boundsArr, v.asInstanceOf[Double])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bounds", boundsArr, "double[]")
    defineCodeGen(ctx, ev, v => s"graft.functions.QuantileCell.countBelow($ref, $v)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
