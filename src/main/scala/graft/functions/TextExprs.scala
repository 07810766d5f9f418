package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression, XXH64}
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

/** Full 16-slot portable MinHash signature in ONE pass over the shingle
  * array: slot k (1-based) = min over shingles of md5("s<k>" || shingle)
  * as lowercase hex. Equivalent to 16 [[MinMd5Salted]] calls (slots 1 and
  * 2 are bit-identical to the f1/f2 fingerprints) but traverses the array
  * and materializes each shingle's bytes once instead of n times. Every
  * slot is reproducible in ANSI SQL (DuckDB: list_aggregate over md5), so
  * LSH band keys and signature-agreement counts built from it hash-match
  * an independent engine — unlike the xxhash64-based [[MinHashSig]],
  * which stays the cheaper choice where portability is not required. */
case class MinMd5Multi(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "min_md5_multi"

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"$prettyName requires (array<string>, int), got ($l, $r)")
  }

  // salts depend only on the (literal) salt count — build once per
  // expression instance, not once per row
  @transient private lazy val saltTable = new java.util.concurrent.ConcurrentHashMap[Int, Array[Array[Byte]]]()
  private def saltsFor(n: Int): Array[Array[Byte]] =
    saltTable.computeIfAbsent(n, m => Array.tabulate(m)(k => s"s${k + 1}".getBytes))

  override def nullSafeEval(shingles: Any, nSalts: Any): Any = {
    val arr  = shingles.asInstanceOf[ArrayData]
    val n    = nSalts.asInstanceOf[Int]
    val salts = saltsFor(n)
    val md    = java.security.MessageDigest.getInstance("MD5")
    val best  = new Array[String](n)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        val sBytes = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < n) {
          md.reset()
          md.update(salts(k))
          md.update(sBytes)
          val hex = MinMd5Salted.toHex(md.digest())
          if (best(k) == null || hex.compareTo(best(k)) < 0) best(k) = hex
          k += 1
        }
      }
      i += 1
    }
    if (best.contains(null)) null
    else new GenericArrayData(best.map(UTF8String.fromString(_).asInstanceOf[Any]))
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** 64-bit SimHash over a token array with a PORTABLE token hash: the
  * lower 64 bits of md5(token) — digest bytes 8..15 read little-endian,
  * exactly DuckDB's `md5_number_lower` — instead of [[SimHash64]]'s
  * engine-native xxhash64. Per bit, sign of Σ_tokens (bit set ? +1 : −1),
  * so an independent SQL engine reproduces the value bit-for-bit and
  * Hamming-distance pair sets become hash-checkable. */
case class SimHashMd5(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64_md5"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires array<string>, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val arr      = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    val md       = java.security.MessageDigest.getInstance("MD5")
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) { // null elements contribute nothing
        md.reset()
        md.update(arr.getUTF8String(i).getBytes)
        val d = md.digest()
        // digest bytes 8..15, little-endian == DuckDB md5_number_lower
        var h = 0L
        var j = 0
        while (j < 8) { h |= (d(8 + j) & 0xffL) << (8 * j); j += 1 }
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

/** The PORTABLE 64-bit string hash as a standalone scalar: the lower 64
  * bits of md5 (digest bytes 8..15 read little-endian) — bit-identical
  * to DuckDB's `md5_number_lower` (same bits; DuckDB renders them
  * unsigned, Spark signed — low-bit masks like `& 1023` agree either
  * way). [[SimHashMd5]] uses this hash internally per token; this
  * exposes it for feature-hashing ops (hashed n-gram buckets). */
case class Md5Lower64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def prettyName: String = "md5_lower64"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"$prettyName requires string, got $t")
  }

  override def nullSafeEval(input: Any): Any = {
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update(input.asInstanceOf[UTF8String].getBytes)
    val d = md.digest()
    var h = 0L
    var j = 0
    while (j < 8) { h |= (d(8 + j) & 0xffL) << (8 * j); j += 1 }
    h
  }

  override protected def withNewChildInternal(newChild: Expression): Expression = copy(newChild)
}

/** Winnowed k-gram fingerprints (Schleimer, Wilkerson & Aiken 2003) in one
  * pass. Shared engine for the two surface forms below; semantics are
  * bit-identical to the composed SQL
  * `array_distinct(transform(sequence(1, n_hs - w + 1), j ->
  *    array_min(slice(hs, j, w))))`
  * where `hs` is the md5-hex of each k-gram: window minima are taken on
  * the RAW 16-byte digests (lowercase-hex order equals unsigned-byte
  * order, so the min is the same element) and only the distinct minima
  * are hex-encoded — the composed form allocates a slice + concat + hex
  * string per POSITION, this allocates per FINGERPRINT (expected density
  * 2/(w+1)). Returns null when fewer than w grams exist (the callers'
  * `size(hs) >= w` gate), so `explode` drops short docs for free. */
private[functions] object Winnow {
  /** Unsigned lexicographic compare of two equal-length digests. */
  def cmp(a: Array[Byte], b: Array[Byte]): Int = {
    var i = 0
    while (i < a.length) {
      val d = (a(i) & 0xff) - (b(i) & 0xff)
      if (d != 0) return d
      i += 1
    }
    0
  }

  /** Distinct window-w minima of `digests`, first-occurrence order,
    * hex-encoded. */
  def fingerprints(digests: Array[Array[Byte]], w: Int): GenericArrayData = {
    val nh = digests.length
    val seen = new java.util.HashSet[java.nio.ByteBuffer]()
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    var j = 0
    while (j <= nh - w) {
      var best = digests(j)
      var t = j + 1
      while (t < j + w) {
        if (cmp(digests(t), best) < 0) best = digests(t)
        t += 1
      }
      if (seen.add(java.nio.ByteBuffer.wrap(best)))
        out += UTF8String.fromString(MinMd5Salted.toHex(best))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Winnowed fingerprints over word k-grams: the k-gram is
  * `concat_ws(' ', slice(ws, i, k))` (null words skipped, single-space
  * joined), hashed with md5 — the pipeline_pretrain_v2 decontamination
  * selection. `winnow_fps_words(ws, k, w)`. */
case class WinnowFpsWords(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps_words"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int, int), got ($a, $b, $c)")
    }

  override def nullSafeEval(wsAny: Any, kAny: Any, wAny: Any): Any = {
    val arr = wsAny.asInstanceOf[ArrayData]
    val k = kAny.asInstanceOf[Int]
    val w = wAny.asInstanceOf[Int]
    val n = arr.numElements()
    // hs length matches greatest(size(ws) - (k-1), 1): even a doc shorter
    // than one full k-gram contributes a single (truncated) gram
    val nh = math.max(n - (k - 1), 1)
    if (nh < w) return null
    // word bytes extracted ONCE per row — each word is re-read by k
    // overlapping grams, and getBytes per (gram × word) was the composed
    // form's dominant allocation
    val words = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      words(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nh)
    val space = ' '.toByte
    i = 0
    while (i < nh) {
      md.reset()
      var firstWord = true
      var t = i
      val end = math.min(i + k, n)
      while (t < end) {
        if (words(t) != null) { // concat_ws skips nulls
          if (!firstWord) md.update(space)
          md.update(words(t))
          firstWord = false
        }
        t += 1
      }
      digests(i) = md.digest()
      i += 1
    }
    Winnow.fingerprints(digests, w)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Winnowed fingerprints over CHARACTER k-grams: the k-gram is
  * `substring(text, i, k)` (code points, exactly Spark's substring /
  * DuckDB's substr), hashed with md5 over its UTF-8 bytes — the
  * text_winnowing_fingerprint selection. Zero per-gram allocation: a
  * code-point → byte-offset table is built once and each gram is hashed
  * directly from the row's UTF-8 buffer. `winnow_fps_chars(text, k, w)`. */
case class WinnowFpsChars(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "winnow_fps_chars"

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, IntegerType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (string, int, int), got ($a, $b, $c)")
    }

  override def nullSafeEval(textAny: Any, kAny: Any, wAny: Any): Any = {
    val s = textAny.asInstanceOf[UTF8String]
    val k = kAny.asInstanceOf[Int]
    val w = wAny.asInstanceOf[Int]
    val bytes = s.getBytes
    // offsets(c) = byte offset where code point c starts; offsets(nChars)
    // = total bytes. UTF-8 continuation bytes have the 10xxxxxx prefix.
    val offBuf = new Array[Int](bytes.length + 1)
    var nChars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) { offBuf(nChars) = b; nChars += 1 }
      b += 1
    }
    offBuf(nChars) = bytes.length
    val nh = nChars - k + 1 // callers gate on length >= k + w - 1
    if (nh < w) return null
    val md = java.security.MessageDigest.getInstance("MD5")
    val digests = new Array[Array[Byte]](nh)
    var i = 0
    while (i < nh) {
      md.reset()
      md.update(bytes, offBuf(i), offBuf(i + k) - offBuf(i))
      digests(i) = md.digest()
      i += 1
    }
    Winnow.fingerprints(digests, w)
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
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
    reg.createOrReplaceTempFunction("min_md5_multi", exprs => MinMd5Multi(exprs(0), exprs(1)), "built-in")
    reg.createOrReplaceTempFunction("simhash64_md5", exprs => SimHashMd5(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("md5_lower64", exprs => Md5Lower64(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("winnow_fps_words", exprs => WinnowFpsWords(exprs(0), exprs(1), exprs(2)), "built-in")
    reg.createOrReplaceTempFunction("winnow_fps_chars", exprs => WinnowFpsChars(exprs(0), exprs(1), exprs(2)), "built-in")
  }
}
