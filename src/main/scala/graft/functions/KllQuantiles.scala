package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

import scala.collection.mutable.ArrayBuffer

/** Mergeable quantile sketch as a native TypedImperativeAggregate — the
  * bounded-memory companion to the exact `agg_percentile`: a 100 TB
  * quantile cannot sort the column, it streams O(k·log n) summaries that
  * merge associatively (the KLL/MRL compactor family — Karnin, Lang,
  * Liberty, FOCS'16; Manku, Rajagopalan, Lindsay, SIGMOD'98 — in the
  * uniform-capacity variant, with DETERMINISTIC alternating compaction
  * instead of coin flips). Determinism caveat, stated precisely: the
  * alternating flip makes each single-partition compaction sequence
  * reproducible (no RNG anywhere), but the DISTRIBUTED result still
  * depends on the order partial sketches arrive at merge() — Spark
  * fetches shuffle blocks in nondeterministic order, so two runs can
  * keep different survivor sets. The rank-error bound (±ε per level
  * mass) holds for every merge order; only which values inside that
  * bound survive varies. Consumers must treat estimates as
  * bound-guaranteed, not run-reproducible — which is why
  * agg_quantile_sketch emits the EXACT value-at-rank and audits the
  * estimates against ε in-plan instead of hashing them.
  *
  * Structure: level i holds values of weight 2^i, at most `k` per level.
  * A full level sorts, keeps every other element (the survivor offset
  * alternates per compaction — the determinism trick), and promotes the
  * keepers to level i+1: count mass is preserved, each compaction
  * perturbs any rank by at most 2^i, and levels stay logarithmic in n.
  *
  * Distributed shape: partial sketches build map-side in one pass,
  * merge by level-wise concatenation + re-compaction — the mergeable-
  * summary algebra (Agarwal et al., SIGMOD'12), same as the
  * [[SpaceSavingTopK]] / [[BitmapDistinct]] partials: the shuffle
  * carries O(partitions × k·log n) doubles, never the column.
  */
final class KllBuffer(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  var flip: Boolean = false

  def update(v: Double): Unit = {
    levels(0) += v
    if (levels(0).length >= k) compact()
  }

  /** Compact every at-capacity level bottom-up (a promotion can fill the
    * level above, so one upward sweep settles the cascade). */
  def compact(): Unit = {
    var i = 0
    while (i < levels.length) {
      if (levels(i).length >= k) {
        val sorted = levels(i).sortInPlace()
        val offset = if (flip) 1 else 0
        flip = !flip
        if (i + 1 == levels.length) levels += ArrayBuffer.empty[Double]
        val next = levels(i + 1)
        var j = offset
        while (j < sorted.length) { next += sorted(j); j += 2 }
        // an odd straggler on the non-survivor side is dropped with its
        // partner kept at double weight — rank perturbation ≤ 2^i either
        // way, and alternation cancels the bias across compactions
        levels(i) = ArrayBuffer.empty[Double]
      }
      i += 1
    }
  }

  /** All (value, weight) pairs, weight = 2^level. */
  def weighted: Array[(Double, Long)] = {
    val out = ArrayBuffer.empty[(Double, Long)]
    var i = 0
    while (i < levels.length) {
      val w = 1L << i
      levels(i).foreach(v => out += ((v, w)))
      i += 1
    }
    out.toArray
  }

  /** Estimated value at quantile p: the smallest value whose cumulative
    * weight reaches p × total (clamped to at least one item). */
  def quantile(p: Double): Double = {
    val pairs = weighted.sortBy(_._1)
    val total = pairs.iterator.map(_._2).sum
    val target = math.max(1L, math.ceil(p * total).toLong)
    var cum = 0L
    var i = 0
    while (i < pairs.length) {
      cum += pairs(i)._2
      if (cum >= target) return pairs(i)._1
      i += 1
    }
    pairs.last._1
  }

  def isEmpty: Boolean = levels.forall(_.isEmpty)
}

case class KllQuantiles(
    child: Expression,
    k: Int,
    probs: Seq[Double],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[KllBuffer] {

  require(k >= 8, "need compactor capacity k >= 8")
  require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
    "quantile probabilities must lie in (0, 1]")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "kll_quantiles"
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def createAggregationBuffer(): KllBuffer = new KllBuffer(k)

  override def update(buf: KllBuffer, input: InternalRow): KllBuffer = {
    val v = child.eval(input)
    if (v != null) buf.update(KllQuantiles.toDouble(v))
    buf
  }

  override def merge(b1: KllBuffer, b2: KllBuffer): KllBuffer = {
    while (b1.levels.length < b2.levels.length) b1.levels += ArrayBuffer.empty[Double]
    var i = 0
    while (i < b2.levels.length) { b1.levels(i) ++= b2.levels(i); i += 1 }
    b1.compact()
    b1
  }

  override def eval(buf: KllBuffer): Any =
    // a GROUP BY never yields an empty group, but a global aggregate
    // over an empty relation does — answer with an empty estimate array
    // (the SpaceSavingTopK convention) instead of throwing
    if (buf.isEmpty) new GenericArrayData(Array.empty[Any])
    else new GenericArrayData(probs.map(buf.quantile).toArray[Any])

  override def serialize(buf: KllBuffer): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeBoolean(buf.flip)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllBuffer = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new KllBuffer(k)
    buf.flip = in.readBoolean()
    val n = in.readInt()
    buf.levels.clear()
    var i = 0
    while (i < n) {
      val m = in.readInt()
      val lvl = new ArrayBuffer[Double](m)
      var j = 0
      while (j < m) { lvl += in.readDouble(); j += 1 }
      buf.levels += lvl
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllQuantiles =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

object KllQuantiles {
  /** SQL numeric literals may eval to Decimal (not java.lang.Number). */
  private[functions] def toDouble(v: Any): Double = v match {
    case d: org.apache.spark.sql.types.Decimal => d.toDouble
    case n: Number                             => n.doubleValue()
  }

  /** Register `kll_quantiles(col, k, p1, p2, ...)` in this session. */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "kll_quantiles",
      exprs => {
        def numOf(e: Expression): Double = toDouble(e.eval(InternalRow.empty))
        KllQuantiles(exprs(0), numOf(exprs(1)).toInt, exprs.drop(2).map(numOf))
          .toAggregateExpression()
      },
      "built-in")
}
