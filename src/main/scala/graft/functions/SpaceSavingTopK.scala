package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.collection.mutable

/** SpaceSaving (Metwally et al.) top-k heavy hitters as a native
  * TypedImperativeAggregate — the bounded-memory frequency summary for
  * corpus statistics that cannot hold exact counts (distinct n-grams at
  * 100 TB ≫ memory). Tracks `capacity` counters; an unseen item evicts
  * the minimum counter and inherits its count as error. Guarantees:
  * est_count ≥ true count ≥ est_count − max_err, and any item with true
  * frequency > n/capacity is present in the summary.
  *
  * Distributed shape: partial summaries build map-side (one pass, O(cap)
  * memory), merge by counter addition + re-trim — the standard mergeable-
  * summary algebra, so the whole aggregation is one shuffle of
  * O(partitions × capacity) counters, never the raw item stream.
  */
case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.LinkedHashMap[String, (Long, Long)]] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "spacesaving_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  type Buf = mutable.LinkedHashMap[String, (Long, Long)] // item -> (count, err)

  override def createAggregationBuffer(): Buf = mutable.LinkedHashMap.empty

  private def offer(buf: Buf, item: String, add: Long, err: Long): Unit =
    buf.get(item) match {
      case Some((c, e)) => buf(item) = (c + add, e + err)
      case None if buf.size < capacity => buf(item) = (add, err)
      case None =>
        // evict the min-count entry; the newcomer inherits its count as error
        val (minItem, (minC, _)) = buf.minBy { case (i, (c, _)) => (c, i) }
        buf.remove(minItem)
        buf(item) = (minC + add, minC + err)
    }

  override def update(buf: Buf, input: InternalRow): Buf = {
    val v = child.eval(input)
    if (v != null) offer(buf, v.toString, 1L, 0L)
    buf
  }

  override def merge(b1: Buf, b2: Buf): Buf = {
    b2.foreach { case (item, (c, e)) => offer(b1, item, c, e) }
    // re-trim: keep the `capacity` largest counters (deterministic tiebreak)
    if (b1.size > capacity) {
      val keep = b1.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(capacity)
      b1.clear()
      keep.foreach { case (i, ce) => b1(i) = ce }
    }
    b1
  }

  override def eval(buf: Buf): Any = {
    val top = buf.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Buf = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = mutable.LinkedHashMap.empty[String, (Long, Long)]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      buf(new String(b, "UTF-8")) = (in.readLong(), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): SpaceSavingTopK =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object SpaceSavingTopK {
  /** Register `spacesaving_topk(col, k, capacity)` in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "spacesaving_topk",
      exprs => {
        def intOf(e: Expression): Int =
          e.eval(InternalRow.empty).asInstanceOf[Number].intValue()
        SpaceSavingTopK(exprs(0), intOf(exprs(1)), intOf(exprs(2))).toAggregateExpression()
      },
      "built-in")
}
