package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Exact per-group top-k by score as a native mergeable aggregate —
  * `topk_by_score(score, id, k)` returns the k highest-(score, then
  * lowest-id) pairs of the group as an array of {score, id} structs.
  *
  * Why an aggregate when `ROW_NUMBER() ... WHERE rn <= k` exists (ref
  * LQY_query1.txt:94,110 and our win_row_number_topn): the window form is
  * an *operator* — it owns the whole plan node, so it cannot sit next to
  * other aggregates in one groupBy, cannot run inside a watermarked
  * streaming window (WindowExec is unsupported on streaming Datasets),
  * and (pre-WindowGroupLimit) sorts entire partitions. The aggregate
  * form is an *algebra*: O(k) state per group per task, map-side
  * combined before the shuffle, merged associatively — so top-k rides
  * the same hash-aggregate as sums/counts, streams incrementally, and
  * shuffles O(groups × k) rows at 100 TB regardless of input size.
  *
  * Determinism: total order is (score DESC, id ASC); equal (score, id)
  * duplicates are kept (multiset semantics), matching the SQL
  * ROW_NUMBER oracle ordered the same way.
  *
  * Buffer is an unsorted ArrayBuffer compacted to k whenever it reaches
  * 4k — amortized O(1) inserts with a hard O(k) state bound.
  */
case class TopKByScore(
    score: Expression,
    id: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[(Double, Long)]] {

  override def children: Seq[Expression] = Seq(score, id, kExpr)
  // analysis-time contract (AbstractDataType is private[sql], so the
  // CmEstimate pattern: checkInputDataTypes + Number-tolerant eval): a
  // wrong-typed argument fails analysis with a clear message instead of
  // a mid-job executor ClassCastException. The whitelist is the set of
  // PRIMITIVE numerics whose catalyst values implement java.lang.Number
  // — DecimalType is deliberately excluded (o.a.s.sql.types.Decimal is
  // NOT a Number, so accepting it would reintroduce the executor CCE
  // this check exists to prevent; callers cast decimals to double).
  private val primitiveNumerics: Set[DataType] =
    Set(DoubleType, FloatType, LongType, IntegerType, ShortType, ByteType)

  override def checkInputDataTypes(): TypeCheckResult = {
    def prim(e: Expression) = primitiveNumerics.contains(e.dataType)
    if (!prim(score))
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: score must be a primitive numeric (cast decimals to double), got ${score.dataType}")
    else if (!Set[DataType](LongType, IntegerType, ShortType, ByteType).contains(id.dataType))
      TypeCheckResult.TypeCheckFailure(s"topk_by_score: id must be integral, got ${id.dataType}")
    else if (!kExpr.foldable
      || !Set[DataType](LongType, IntegerType).contains(kExpr.dataType)
      || kExpr.eval(InternalRow.empty) == null)
      TypeCheckResult.TypeCheckFailure("topk_by_score: k must be a non-null integer literal")
    else if (kExpr.eval(InternalRow.empty).asInstanceOf[Number].longValue() < 1)
      // k <= 0 would pass analysis and silently return empty arrays
      // (with k = 0 every update() compacts) — fail fast instead
      TypeCheckResult.TypeCheckFailure(
        s"topk_by_score: k must be >= 1, got ${kExpr.eval(InternalRow.empty)}")
    else TypeCheckResult.TypeCheckSuccess
  }
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("score", DoubleType), StructField("id", LongType))),
    containsNull = false)
  override def prettyName: String = "topk_by_score"

  private lazy val k: Int = kExpr.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  // (score DESC, id ASC) under Spark SQL's total double order
  // (SQLOrderingUtil.compareDoubles: primitive == first — so -0.0 ties
  // 0.0, exactly like ORDER BY — then java.lang.Double.compare, which
  // puts NaN above +Inf). A plain `>` would make NaN incomparable:
  // sortWith could throw "Comparison method violates its general
  // contract!" or silently mis-rank NaN rows; raw Double.compare alone
  // would rank 0.0 strictly above -0.0, diverging from a ROW_NUMBER
  // oracle on signed-zero ties.
  private def beats(a: (Double, Long), b: (Double, Long)): Boolean = {
    val c = if (a._1 == b._1) 0 else java.lang.Double.compare(a._1, b._1)
    c > 0 || (c == 0 && a._2 < b._2)
  }

  private def compact(buf: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    if (buf.size > k) {
      val kept = buf.sortWith(beats).take(k)
      buf.clear()
      buf ++= kept
    }
    buf
  }

  override def createAggregationBuffer(): ArrayBuffer[(Double, Long)] = ArrayBuffer.empty

  override def update(
      buf: ArrayBuffer[(Double, Long)],
      input: InternalRow): ArrayBuffer[(Double, Long)] = {
    val s = score.eval(input)
    val i = id.eval(input)
    if (s != null && i != null) {
      buf += ((s.asInstanceOf[Number].doubleValue(), i.asInstanceOf[Number].longValue()))
      if (buf.size >= 4 * k) compact(buf)
    }
    buf
  }

  override def merge(
      b1: ArrayBuffer[(Double, Long)],
      b2: ArrayBuffer[(Double, Long)]): ArrayBuffer[(Double, Long)] = {
    b1 ++= b2
    if (b1.size >= 4 * k) compact(b1)
    b1
  }

  override def eval(buf: ArrayBuffer[(Double, Long)]): Any = {
    val top = buf.sortWith(beats).take(k)
    new GenericArrayData(top.map { case (s, i) => InternalRow(s, i) }.toArray[Any])
  }

  override def serialize(buf: ArrayBuffer[(Double, Long)]): Array[Byte] = {
    compact(buf) // never ship more than k entries
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (s, i) =>
      out.writeDouble(s)
      out.writeLong(i)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[(Double, Long)] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = new ArrayBuffer[(Double, Long)](n)
    var i = 0
    while (i < n) {
      buf += ((in.readDouble(), in.readLong()))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(score = newChildren(0), id = newChildren(1), kExpr = newChildren(2))
}

object TopKByScore {
  /** Register `topk_by_score(score DOUBLE, id BIGINT, k)` (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "topk_by_score",
      exprs => {
        // a clear arity error at analysis time, not IndexOutOfBounds
        require(exprs.length == 3,
          s"topk_by_score(score, id, k) expects 3 arguments, got ${exprs.length}")
        TopKByScore(exprs(0), exprs(1), exprs(2)).toAggregateExpression()
      },
      "built-in")
}
