package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Exact distinct counting over a DENSE integer domain via a mergeable
  * bitmap — `bitmap_distinct(key, maxBits)` == COUNT(DISTINCT key) when
  * 0 <= key < maxBits.
  *
  * Why it exists at 100 TB: COUNT(DISTINCT) shuffles every distinct
  * value (two-phase expand), so its cost grows with cardinality ×
  * groups. A bitmap partial is FIXED-size (domain/8 bytes — a 100M-key
  * surrogate domain is 12.5 MB) and merges by OR, so the shuffle
  * carries one bitmap per partition per group no matter how many rows
  * or distinct keys flow through. The right tool for dense surrogate
  * domains (user ids, fact keys); for sparse or unbounded domains use
  * HLL (`agg_approx_distinct`) or plain count_distinct — documented
  * trade, enforced by a hard domain check (no silent wrong answers).
  */
case class BitmapDistinct(
    child: Expression,
    maxBits: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.BitSet] {

  require(maxBits >= 1 && maxBits <= (1 << 27),
    "need 1 <= maxBits <= 2^27 (a 16 MiB bitmap) — larger domains want HLL")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bitmap_distinct"
  override def dataType: DataType = LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bitmap_distinct needs an integral key, got $other")
    }

  override def createAggregationBuffer(): java.util.BitSet = new java.util.BitSet()

  override def update(buf: java.util.BitSet, input: InternalRow): java.util.BitSet = {
    val v = child.eval(input)
    if (v != null) {
      val k = v.asInstanceOf[Number].longValue()
      if (k < 0 || k >= maxBits)
        throw new IllegalArgumentException(
          s"bitmap_distinct: key $k outside dense domain [0, $maxBits) — " +
            "use agg_approx_distinct (HLL) for sparse/unbounded domains")
      buf.set(k.toInt)
    }
    buf
  }

  override def merge(buf: java.util.BitSet, other: java.util.BitSet): java.util.BitSet = {
    buf.or(other); buf
  }

  override def eval(buf: java.util.BitSet): Any = buf.cardinality().toLong
  override def serialize(buf: java.util.BitSet): Array[Byte] = buf.toByteArray
  override def deserialize(bytes: Array[Byte]): java.util.BitSet = java.util.BitSet.valueOf(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object BitmapDistinct {
  /** Register `bitmap_distinct(col, maxBits)` (idempotent); maxBits must
    * be an int literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bitmap_distinct",
      exprs => {
        require(exprs.length == 2, s"bitmap_distinct(col, maxBits) takes 2 args, got ${exprs.length}")
        BitmapDistinct(exprs(0), exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"maxBits must be an int literal, got $other")
        }).toAggregateExpression()
      },
      "built-in")
}
