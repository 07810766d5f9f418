package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** KMV (k-minimum-values) distinct sketch — `kmv_sketch(hash64, k)` keeps
  * the k smallest DISTINCT values of a uniform non-negative 63-bit hash
  * column and emits them as a sorted `array<bigint>` partial (Beyer et
  * al., "On Synopses for Distinct-Value Estimation Under Multiset
  * Operations", SIGMOD 2007 — the sketch family theta sketches
  * generalize).
  *
  * Why it exists at 100 TB: HLL partials (`agg_hll_partial_merge`)
  * union but cannot INTERSECT — cross-segment overlap ("how many users
  * are in both A and B") over persisted per-partition partials needs a
  * sample of the hash space, and KMV is exactly that: a fixed-size
  * (8·k bytes) mergeable uniform sample of the distinct-hash domain.
  * Two sketches combine into union/intersection/Jaccard estimates with
  * plain array arithmetic (see `agg_overlap_sketch`), with relative
  * error ~1/sqrt(k). The shuffle carries one k-array per partition per
  * group no matter how many rows flow through.
  *
  * Contract: the child must already BE a uniform hash in [0, 2^63) —
  * pass `shiftrightunsigned(xxhash64(x), 1)`. Hashing is kept OUTSIDE
  * the aggregate so the codegen'd xxhash64 does the per-row work and
  * the same hash values remain available to downstream estimate
  * arithmetic; a sketch of raw ids would be a (silently biased)
  * order-statistic of the id distribution, so negative inputs fail
  * loudly.
  *
  * A partial with FEWER than k values is the complete distinct-hash set
  * of its group (no information was discarded) — consumers exploit this
  * for exact small-side answers; see the `agg_overlap_sketch` plan.
  */
case class KmvSketch(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  require(k >= 16 && k <= (1 << 20),
    "need 16 <= k <= 2^20 — smaller gives no error bound, larger wants an exact distinct")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"kmv_sketch needs a bigint hash (shiftrightunsigned(xxhash64(x), 1)), got $other")
    }

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buf: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0)
        throw new IllegalArgumentException(
          s"kmv_sketch: negative input $h — pass shiftrightunsigned(xxhash64(x), 1), not raw values")
      if (buf.size < k) buf.add(h)
      else if (h < buf.last) { buf.add(h); if (buf.size > k) buf.pollLast() }
    }
    buf
  }

  override def merge(
      buf: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    buf.addAll(other)
    while (buf.size > k) buf.pollLast()
    buf
  }

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buf.size)
    val it = buf.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 } // TreeSet iterates ascending
    new GenericArrayData(arr)
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.size)
    buf.forEach(v => bb.putLong(v))
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new java.util.TreeSet[java.lang.Long]()
    while (bb.hasRemaining) out.add(bb.getLong)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object KmvSketch {
  /** Register `kmv_sketch(hash64, k)` (idempotent); k must be an int
    * literal. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kmv_sketch",
      exprs => {
        require(exprs.length == 2, s"kmv_sketch(hash64, k) takes 2 args, got ${exprs.length}")
        KmvSketch(exprs(0), exprs(1) match {
          case Literal(v: Int, IntegerType) => v
          case other => throw new IllegalArgumentException(s"k must be an int literal, got $other")
        }).toAggregateExpression()
      },
      "built-in")
}
