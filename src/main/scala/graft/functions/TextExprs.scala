package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the dedup hot path.
  *
  * The generic formulations (`transform(sequence(0,15), k ->
  * array_min(transform(shingles, s -> xxhash64(k, s))))` etc.) evaluate an
  * interpreted lambda per (element × hash function): 73 s for MinHash over
  * sf0.1. These expressions do the same work in one pass over the shingle
  * array inside the JVM. CodegenFallback is deliberate: the win is the
  * O(n·k) → O(n) pass + no lambda machinery; these sit in a single
  * projection directly over the scan.
  */

/** 16-slot MinHash signature over a shingle array.
  * sig[k] = min over shingles of (h1 + k·h2) — the Kirsch-Mitzenmacher
  * construction over two independent xxhash64 draws, the standard way to
  * get k hash functions for one hash cost. */
case class MinHashSig(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }


  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val sig = Array.fill(MinHashSig.NumHashes)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        val s  = arr.getUTF8String(i)
        val h1 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x9747b28cL)
        val h2 = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 0x1b873593L)
        var k = 0
        while (k < MinHashSig.NumHashes) {
          val hk = h1 + k * h2
          if (hk < sig(k)) sig(k) = hk
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

object MinHashSig { val NumHashes = 16 }

/** 64-bit SimHash over a token array: per bit, the sign of
  * Σ_tokens (bit set in xxhash64(token) ? +1 : −1). */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }


  override def nullSafeEval(input: Any): Any = {
    val arr      = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) counters(bit) += 1 else counters(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (counters(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** min over shingles of md5(salt || shingle), as lowercase hex — the
  * portable fingerprint primitive (bit-identical to the DuckDB oracle's
  * `list_aggregate(list_transform(...), 'min')` over md5). */
case class MinMd5Salted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "min_md5_salted"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, string), got ($l, $r)")
  }


  override def nullSafeEval(shingles: Any, salt: Any): Any = {
    val arr       = shingles.asInstanceOf[ArrayData]
    val saltBytes = salt.asInstanceOf[UTF8String].getBytes
    val md        = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        md.reset()
        md.update(saltBytes)
        md.update(arr.getUTF8String(i).getBytes)
        val hex = MinMd5Salted.toHex(md.digest())
        if (best == null || hex.compareTo(best) < 0) best = hex
      }
      i += 1
    }
    if (best == null) null else UTF8String.fromString(best)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** max over shingles of md5(salt || shingle) — fp_max counterpart. */
case class MaxMd5Salted(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "max_md5_salted"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), StringType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, string), got ($l, $r)")
  }


  override def nullSafeEval(shingles: Any, salt: Any): Any = {
    val arr       = shingles.asInstanceOf[ArrayData]
    val saltBytes = salt.asInstanceOf[UTF8String].getBytes
    val md        = java.security.MessageDigest.getInstance("MD5")
    var best: String = null
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        md.reset()
        md.update(saltBytes)
        md.update(arr.getUTF8String(i).getBytes)
        val hex = MinMd5Salted.toHex(md.digest())
        if (best == null || hex.compareTo(best) > 0) best = hex
      }
      i += 1
    }
    if (best == null) null else UTF8String.fromString(best)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object MinMd5Salted {
  private val digits = "0123456789abcdef".toCharArray
  def toHex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      out(i * 2) = digits((bytes(i) >> 4) & 0xf)
      out(i * 2 + 1) = digits(bytes(i) & 0xf)
      i += 1
    }
    new String(out)
  }
}

object TextExprs {
  /** Register the text expressions in this session (idempotent). */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("minhash_sig", exprs => MinHashSig(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("simhash64", exprs => SimHash64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("min_md5_salted", exprs => MinMd5Salted(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("max_md5_salted", exprs => MaxMd5Salted(exprs(0), exprs(1)), "built-in")
  }
}
