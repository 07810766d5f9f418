package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Bloom filter: a mergeable bitset aggregate plus a codegen'd
  * membership probe — the map-side prefilter that makes set-membership
  * checks (benchmark decontamination, blocklist joins) scan-speed at
  * 100 TB. Build the filter over the BOUNDED side (a benchmark suite, a
  * blocklist), then probe the corpus side before any shuffle: only the
  * ~FP-rate fraction of rows ever reaches the exact verify join, so the
  * shuffle carries candidates instead of the corpus.
  *
  * Standard double-hashing construction (Kirsch & Mitzenmacher 2006):
  * bit_i = (h1 + i·h2) mod m from two FNV-1a 64 hashes of the item
  * bytes. The aggregate's algebra is bitwise OR — partial-aggregate
  * friendly, so partials build map-side and the shuffle moves
  * O(partitions × m/8) bytes, never the item stream.
  */
object BloomProbe {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime  = 0x100000001b3L

  /** FNV-1a 64 over the item bytes, seeded. Deterministic across JVMs. */
  def fnv(bytes: Array[Byte], seed: Long): Long = {
    var h = FnvOffset ^ seed
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FnvPrime
      i += 1
    }
    h
  }

  /** Set the k double-hashed bits for `item` in `bits` (in place). */
  def add(bits: Array[Byte], numHashes: Int, item: UTF8String): Unit = {
    val b  = item.getBytes
    val m  = bits.length.toLong * 8L
    val h1 = fnv(b, 0L)
    val h2 = fnv(b, 0x9e3779b97f4a7c15L) | 1L
    var i  = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      bits((pos >>> 3).toInt) = (bits((pos >>> 3).toInt) | (1 << (pos & 7L).toInt)).toByte
      i += 1
    }
  }

  /** Probe: true iff all k bits are set (no false negatives; false
    * positives at the sized FP rate). Called from generated code. */
  def contains(bits: Array[Byte], numHashes: Int, item: UTF8String): Boolean = {
    val b  = item.getBytes
    val m  = bits.length.toLong * 8L
    val h1 = fnv(b, 0L)
    val h2 = fnv(b, 0x9e3779b97f4a7c15L) | 1L
    var i  = 0
    while (i < numHashes) {
      val pos = java.lang.Long.remainderUnsigned(h1 + i.toLong * h2, m)
      if (((bits((pos >>> 3).toInt) >> (pos & 7L).toInt) & 1) == 0) return false
      i += 1
    }
    true
  }
}

/** `bloom_build(item, numBits, numHashes)`: aggregate a column of strings
  * into a Bloom bitset (BinaryType, numBits/8 bytes). */
case class BloomFilterBuild(
    child: Expression,
    numBits: Int,
    numHashes: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]] {

  require(numBits >= 64 && numBits % 8 == 0, "numBits must be a positive multiple of 8")
  require(numHashes >= 1 && numHashes <= 16, "need 1 <= numHashes <= 16")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "bloom_build"
  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_build needs a STRING item, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](numBits / 8)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) BloomProbe.add(buf, numHashes, v.asInstanceOf[UTF8String])
    buf
  }

  override def merge(buf: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < buf.length) { buf(i) = (buf(i) | other(i)).toByte; i += 1 }
    buf
  }

  override def eval(buf: Array[Byte]): Any = buf
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BloomFilterBuild =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `bloom_contains(bloomBytes, item)`: membership probe, codegen'd into
  * the scan's whole-stage loop (one static call, no allocation beyond
  * the item bytes). The filter side is typically a driver-built literal
  * (bounded build side), so the byte array is a constant in the
  * generated code's references. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_contains"

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"bloom_contains needs (BINARY, STRING), got (${left.dataType}, ${right.dataType})")

  override def nullSafeEval(bloom: Any, item: Any): Any =
    BloomProbe.contains(bloom.asInstanceOf[Array[Byte]], numHashes, item.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (bloom, item) =>
      s"graft.functions.BloomProbe.contains($bloom, $numHashes, $item)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object BloomFilter {
  /** Register `bloom_build(col, numBits, numHashes)` and
    * `bloom_contains(bloomBytes, col, numHashes)` in this session
    * (idempotent); int parameters must be literals. */
  def register(spark: SparkSession): Unit = {
    def lit(e: Expression, what: String): Int = e match {
      case Literal(v: Int, IntegerType) => v
      case other => throw new IllegalArgumentException(s"$what must be an int literal, got $other")
    }
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_build",
      exprs => {
        require(exprs.length == 3, s"bloom_build(col, numBits, numHashes) takes 3 args, got ${exprs.length}")
        BloomFilterBuild(exprs(0), lit(exprs(1), "numBits"), lit(exprs(2), "numHashes"))
          .toAggregateExpression()
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => {
        require(exprs.length == 3, s"bloom_contains(bloom, col, numHashes) takes 3 args, got ${exprs.length}")
        BloomMightContain(exprs(0), exprs(1), lit(exprs(2), "numHashes"))
      },
      "built-in")
  }
}
