package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable.ArrayBuffer

/** Native LISTAGG(x, sep) WITHIN GROUP (ORDER BY x) — the Oracle string
  * aggregation the reference uses for report headers
  * (/root/reference/LQY_query2.txt:31, LQY_query3.txt:35).
  *
  * A TypedImperativeAggregate with an ArrayBuffer buffer: values
  * accumulate unsorted (O(1) per row, partial-aggregate friendly — map
  * side combines before the shuffle), the sort happens once per group at
  * eval. Element order is UTF8String binary order == DuckDB's default
  * binary collation, so the oracle's `string_agg(x, sep ORDER BY x)`
  * matches byte-for-byte.
  *
  * The built-in composition `array_join(array_sort(collect_list(x)), sep)`
  * is semantically identical; this expression exists to keep the whole
  * aggregation in one operator (no intermediate array column) and as the
  * engine-depth pattern for sketches/UDAFs that have no built-in
  * composition.
  */
case class ListAggSorted(
    child: Expression,
    sep: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[ArrayBuffer[UTF8String]] {

  override def children: Seq[Expression] = Seq(child, sep)
  // SQL LISTAGG / string_agg return NULL (not '') for empty/all-null groups
  override def nullable: Boolean = true
  override def dataType: DataType = StringType
  override def prettyName: String = "listagg_sorted"

  private lazy val sepStr: String =
    Option(sep.eval(InternalRow.empty)).map(_.toString).getOrElse("")

  override def createAggregationBuffer(): ArrayBuffer[UTF8String] = ArrayBuffer.empty

  override def update(buf: ArrayBuffer[UTF8String], input: InternalRow): ArrayBuffer[UTF8String] = {
    val v = child.eval(input)
    if (v != null) buf += v.asInstanceOf[UTF8String].clone()
    buf
  }

  override def merge(b1: ArrayBuffer[UTF8String], b2: ArrayBuffer[UTF8String]): ArrayBuffer[UTF8String] = {
    b1 ++= b2
    b1
  }

  override def eval(buf: ArrayBuffer[UTF8String]): Any =
    if (buf.isEmpty) null
    else UTF8String.fromString(buf.sorted.map(_.toString).mkString(sepStr))

  override def serialize(buf: ArrayBuffer[UTF8String]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { s =>
      val bytes = s.getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): ArrayBuffer[UTF8String] = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = new ArrayBuffer[UTF8String](n)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      buf += UTF8String.fromBytes(b)
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): ListAggSorted =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): ListAggSorted =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), sep = newChildren(1))
}

object ListAggSorted {
  /** Register `listagg_sorted(col, sep)` in this session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "listagg_sorted",
      exprs => ListAggSorted(exprs(0), exprs(1)).toAggregateExpression(),
      "built-in")
}
