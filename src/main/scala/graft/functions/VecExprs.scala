package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * The generic route — `aggregate(zip_with(a, b, ...), ...)` — evaluates a
  * lambda per element through interpreted HigherOrderFunction machinery:
  * ~26 s for 200k pair × 64-dim cosine at sf0.1. This expression compiles
  * to a tight primitive loop inside whole-stage codegen (no per-element
  * allocation), with identical numerics: left-to-right double accumulation
  * over double-cast floats, matching the DuckDB oracle's explicit fold.
  */
case class VecDotFloat(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0d
    var i   = 0
    while (i < n) {
      acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i   = ctx.freshName("i")
      val n   = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.getFloat($i)) * ((double) $b.getFloat($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Full product-quantization encode of one vector in one pass:
  * `pq_encode_packed(v, cvecs_flat, cnorm2)` → the packed BIGINT code
  * word Σ code_j << 8j. The codebooks ride as FOLDABLE literal arrays —
  * cvecs_flat = all PqM×PqK centroids' dims ordered by (sub_j, code_id,
  * dim), cnorm2 = the matching ‖c‖² — decoded ONCE per expression
  * instance, not per row.
  *
  * Replaces the relational argmin (posexplode into N×PqM subvectors ×
  * broadcast-join against PqK codebook rows × two aggregates — a
  * PqK-fold row blowup through an exchange) with a tight per-row loop.
  * Numerics are BIT-IDENTICAL to the relational form: the distance is
  * cnorm2 − 2·(left-to-right double accumulation over double-cast
  * floats) — exactly [[VecDotFloat]]'s op order — and the tie rule
  * (strictly-smaller keeps the first, so the lowest code_id wins ties)
  * matches min(struct(dist, code_id)). PqM/PqK/PqDim derive from the
  * array shapes; PqK ≤ 256 is required by the byte packing. */
case class PqEncodePacked(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  import org.apache.spark.sql.catalyst.analysis.TypeCheckResult

  override def dataType: DataType = LongType
  override def prettyName: String = "pq_encode_packed"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(FloatType, _), ArrayType(DoubleType, _))
          if second.foldable && third.foldable => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<float>, foldable array<float>, foldable array<double>), got ($a, $b, $c)")
    }

  // codebook literals decoded once per expression instance, not per row
  @transient private lazy val cvecs: Array[Float] =
    second.eval(null).asInstanceOf[ArrayData].toFloatArray()
  @transient private lazy val cnorm2: Array[Double] =
    third.eval(null).asInstanceOf[ArrayData].toDoubleArray()

  override def nullSafeEval(vAny: Any, ignoredB: Any, ignoredC: Any): Any = {
    val vArr = vAny.asInstanceOf[ArrayData]
    val nCodes = cnorm2.length            // PqM × PqK
    val dim = cvecs.length / nCodes       // PqDim
    val m = vArr.numElements() / dim      // PqM
    val k = nCodes / m                    // PqK
    var word = 0L
    var j = 0
    while (j < m) {
      var best = Double.PositiveInfinity
      var bestC = 0
      var c = 0
      while (c < k) {
        val entry = j * k + c
        val base = entry * dim
        var acc = 0d
        var i = 0
        while (i < dim) {
          acc += vArr.getFloat(j * dim + i).toDouble * cvecs(base + i).toDouble
          i += 1
        }
        val dist = cnorm2(entry) - 2.0 * acc
        if (dist < best) { best = dist; bestC = c }
        c += 1
      }
      word += bestC.toLong << (8 * j)
      j += 1
    }
    word
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object VecExprs {
  /** Register the vector expressions in this session's function registry
    * (idempotent) so they are usable from `expr(...)` and SQL. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_dot", exprs => VecDotFloat(exprs(0), exprs(1)), "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "pq_encode_packed", exprs => PqEncodePacked(exprs(0), exprs(1), exprs(2)), "built-in")
  }
}
