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
/** Mutable SpaceSaving summary: item map plus a TreeSet min-index so the
  * eviction path is O(log capacity) instead of an O(capacity) scan per
  * evicted item (the scan made the sketch slower than the exact count it
  * replaces). */
final class SpaceSavingBuffer {
  val items = mutable.HashMap.empty[String, (Long, Long)] // item -> (count, err)
  // ordered (count, item) index for O(log n) min lookup/removal
  val byCount = mutable.TreeSet.empty[(Long, String)]

  def offer(capacity: Int, item: String, add: Long, err: Long): Unit =
    items.get(item) match {
      case Some((c, e)) =>
        byCount.remove((c, item))
        items(item) = (c + add, e + err)
        byCount.add((c + add, item))
      case None if items.size < capacity =>
        items(item) = (add, err)
        byCount.add((add, item))
      case None =>
        // evict the min-count entry; the newcomer inherits its count as error
        val min @ (minC, minItem) = byCount.head
        byCount.remove(min)
        items.remove(minItem)
        items(item) = (minC + add, minC + err)
        byCount.add((minC + add, item))
    }
}

case class SpaceSavingTopK(
    child: Expression,
    k: Int,
    capacity: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[SpaceSavingBuffer] {

  require(k >= 1 && capacity >= k, "need capacity >= k >= 1")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "spacesaving_topk"
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est_count", LongType, nullable = false),
    StructField("max_err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer(): SpaceSavingBuffer = new SpaceSavingBuffer

  override def update(buf: SpaceSavingBuffer, input: InternalRow): SpaceSavingBuffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(capacity, v.toString, 1L, 0L)
    buf
  }

  override def merge(b1: SpaceSavingBuffer, b2: SpaceSavingBuffer): SpaceSavingBuffer = {
    // Mergeable-summaries algebra (Agarwal et al., SIGMOD'12): an item
    // absent from one FULL summary may still have occurred up to that
    // summary's minimum count in its stream — credit that bound as both
    // count and error, then keep the top `capacity` counters. This keeps
    // est ≥ true and est − err ≤ true under ANY merge order; the earlier
    // fold-into-base merge could undercount an item evicted on one side.
    // The framework stores whichever buffer we return back into the agg
    // row, so returning a fresh buffer is fine.
    val m1 = if (b1.items.size >= capacity) b1.byCount.head._1 else 0L
    val m2 = if (b2.items.size >= capacity) b2.byCount.head._1 else 0L
    val union = (b1.items.keySet ++ b2.items.keySet).toSeq.map { item =>
      val (c1, e1) = b1.items.getOrElse(item, (m1, m1))
      val (c2, e2) = b2.items.getOrElse(item, (m2, m2))
      item -> (c1 + c2, e1 + e2)
    }
    val merged = new SpaceSavingBuffer
    union.sortBy { case (item, (c, _)) => (-c, item) }.take(capacity).foreach {
      case (item, (c, e)) =>
        merged.items(item) = (c, e)
        merged.byCount.add((c, item))
    }
    merged
  }

  override def eval(buf: SpaceSavingBuffer): Any = {
    val top = buf.items.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.take(k)
    new GenericArrayData(top.map { case (i, (c, e)) =>
      InternalRow(UTF8String.fromString(i), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: SpaceSavingBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.items.size)
    buf.items.foreach { case (i, (c, e)) =>
      val b = i.getBytes("UTF-8")
      out.writeInt(b.length); out.write(b); out.writeLong(c); out.writeLong(e)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): SpaceSavingBuffer = {
    val in  = new DataInputStream(new ByteArrayInputStream(bytes))
    val n   = in.readInt()
    val buf = new SpaceSavingBuffer
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b   = new Array[Byte](len)
      in.readFully(b)
      val item = new String(b, "UTF-8")
      val c    = in.readLong()
      val e    = in.readLong()
      buf.items(item) = (c, e)
      buf.byCount.add((c, item))
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
