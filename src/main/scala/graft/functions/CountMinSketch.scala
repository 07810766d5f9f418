package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Count-Min frequency sketch (Cormode & Muthukrishnan 2005, "An
  * improved data stream summary: the count-min sketch and its
  * applications") — `cm_sketch(key, d, w)` folds a bigint key stream
  * into a fixed d×w counter grid and emits it as one `array<bigint>` of
  * length d·w (row-major).
  *
  * Why it exists at 100 TB: SpaceSavingTopK answers "what are the top
  * items"; Count-Min answers "how often did THIS item occur" for ANY
  * item, from 8·d·w bytes of state, with the one-sided guarantee
  *   exact ≤ est ≤ exact + εN  (ε ≈ e/w, w.h.p. over d rows)
  * — the point-frequency primitive for join-skew detection, hot-key
  * routing, and n-gram frequency service where the key domain is far
  * too large to count exactly. Partials merge by element-wise addition
  * (the grid is a linear sketch), so map-side combine ships one 8·d·w-
  * byte buffer per partition no matter how many rows flowed through.
  *
  * The row hashes are a splitmix64 finalizer over (key, row) — public
  * constants (Steele et al., "Fast splittable pseudorandom number
  * generators"), reproduced in [[CmEstimate]] so the in-plan point
  * query indexes exactly the slots the aggregate incremented.
  */
object CmHash {
  /** Slot of `key` in row `row` of a width-`w` grid. */
  def slot(key: Long, row: Int, w: Int): Int = {
    var z = key + 0x9E3779B97F4A7C15L * (row + 1).toLong
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    (((z % w) + w) % w).toInt
  }
}

case class CountMinSketch(
    child: Expression,
    d: Int,
    w: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]] {

  require(d >= 1 && d <= 16, "need 1 <= d <= 16 depth rows")
  require(w >= 16 && w <= (1 << 24), "need 16 <= w <= 2^24 slots per row")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def prettyName: String = "cm_sketch"
  // the grid is emitted with its (d, w) config so a mis-configured
  // point query FAILS instead of silently indexing the wrong slots —
  // a transposed (d, w) has the same d·w product, so a length check
  // alone cannot catch it
  override def dataType: DataType = StructType(Seq(
    StructField("d", IntegerType, nullable = false),
    StructField("w", IntegerType, nullable = false),
    StructField("grid", ArrayType(LongType, containsNull = false), nullable = false)))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cm_sketch counts an integer key (hash strings first), got $other")
    }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](d * w)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.asInstanceOf[Number].longValue()
      var r = 0
      while (r < d) { buf(r * w + CmHash.slot(key, r, w)) += 1L; r += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b1.length) { b1(i) += b2(i); i += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any =
    InternalRow(d, w, new GenericArrayData(buf))

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    var i = 0
    while (i < buf.length) { bb.putLong(buf(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CountMinSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0))
}

/** `cm_estimate(sketch, key, d, w)` — min over the d row counters the
  * key hashes to: the Count-Min point estimate. The sketch struct
  * carries its own (d, w), and BOTH must match the query's literals —
  * a transposed config has the same d·w product but indexes slots other
  * hashes filled, which would silently break the one-sided guarantee.
  * CodegenFallback is fine here: the estimate runs once per QUERIED key
  * against a broadcast sketch row, never inside the corpus-side scan
  * (the aggregate does that work, codegen'd at its inputs). */
case class CmEstimate(sketch: Expression, key: Expression, d: Int, w: Int)
    extends Expression with CodegenFallback {

  override def children: Seq[Expression] = Seq(sketch, key)
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (sketch.dataType, key.dataType) match {
      case (StructType(fields), LongType)
          if fields.length == 3 && fields(2).dataType == ArrayType(LongType, containsNull = false) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cm_estimate needs (cm_sketch struct, bigint key), got $other")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "cm_estimate"

  override def eval(input: InternalRow): Any = {
    val sk = sketch.eval(input)
    val k = key.eval(input)
    if (sk == null || k == null) null
    else {
      val row = sk.asInstanceOf[InternalRow]
      val (skD, skW) = (row.getInt(0), row.getInt(1))
      require(skD == d && skW == w,
        s"cm_estimate(d=$d, w=$w) over a sketch built with (d=$skD, w=$skW) — config mismatch")
      val arr = row.getArray(2)
      var best = Long.MaxValue
      var r = 0
      val kk = k.asInstanceOf[Long]
      while (r < d) {
        val c = arr.getLong(r * w + CmHash.slot(kk, r, w))
        if (c < best) best = c
        r += 1
      }
      best
    }
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(sketch = newChildren(0), key = newChildren(1))
}

object CountMinSketch {
  private def intOf(e: Expression): Int =
    e.eval(InternalRow.empty).asInstanceOf[Number].intValue()

  /** Register `cm_sketch(key, d, w)` and `cm_estimate(sk, key, d, w)`
    * (idempotent); d and w must be int literals and must match between
    * the two calls. */
  def register(spark: SparkSession): Unit = {
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_sketch",
      exprs => {
        require(exprs.length == 3, s"cm_sketch(key, d, w) takes 3 args, got ${exprs.length}")
        CountMinSketch(exprs(0), intOf(exprs(1)), intOf(exprs(2))).toAggregateExpression()
      },
      "built-in")
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "cm_estimate",
      exprs => {
        require(exprs.length == 4, s"cm_estimate(sk, key, d, w) takes 4 args, got ${exprs.length}")
        CmEstimate(exprs(0), exprs(1), intOf(exprs(2)), intOf(exprs(3)))
      },
      "built-in")
  }
}
