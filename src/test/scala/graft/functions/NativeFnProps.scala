package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Property-based checks for the round-4 native functions: the algebraic
  * guarantees the operators built on them rely on, for arbitrary inputs
  * rather than the fixture corpus. Driver-side (no Spark session): these
  * exercise the same code the codegen'd paths call. */
object NativeFnProps extends Properties("graft.functions") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val u16 = Gen.choose(0L, 0xffffL)

  property("zorder: interleave is a bijection on 16-bit pairs") =
    Prop.forAll(u16, u16, u16, u16) { (a, b, c, d) =>
      // distinct pairs never collide (deinterleave by bit extraction)
      val z1 = ZOrder.interleave(a, b)
      val z2 = ZOrder.interleave(c, d)
      ((a, b) == (c, d)) == (z1 == z2)
    }

  property("zorder: even bits recover a, odd bits recover b") =
    Prop.forAll(u16, u16) { (a, b) =>
      val z = ZOrder.interleave(a, b)
      var ra = 0L; var rb = 0L
      var i = 0
      while (i < 16) {
        ra |= ((z >> (2 * i)) & 1L) << i
        rb |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      ra == a && rb == b
    }

  property("zorder: fixing one dimension preserves the other's order") =
    Prop.forAll(u16, u16, u16) { (a1, a2, b) =>
      (ZOrder.interleave(a1, b) < ZOrder.interleave(a2, b)) == (a1 < a2) ||
        a1 == a2
    }

  private val strGen = Gen.listOf(Gen.alphaNumChar).map(_.mkString)

  property("bloom: an added item always probes true") =
    Prop.forAll(Gen.listOf(strGen), strGen) { (items, probe) =>
      val bits = new Array[Byte](1024)
      items.foreach(s => BloomProbe.add(bits, 5, UTF8String.fromString(s)))
      items.forall(s => BloomProbe.contains(bits, 5, UTF8String.fromString(s)))
    }

  property("bloom: merge (bitwise OR) equals sequential adds") =
    Prop.forAll(Gen.listOf(strGen), Gen.listOf(strGen)) { (xs, ys) =>
      val a = new Array[Byte](512)
      val b = new Array[Byte](512)
      xs.foreach(s => BloomProbe.add(a, 4, UTF8String.fromString(s)))
      ys.foreach(s => BloomProbe.add(b, 4, UTF8String.fromString(s)))
      val merged = a.zip(b).map { case (x, y) => (x | y).toByte }
      val seq = new Array[Byte](512)
      (xs ++ ys).foreach(s => BloomProbe.add(seq, 4, UTF8String.fromString(s)))
      java.util.Arrays.equals(merged, seq)
    }

  property("bloom: fnv is deterministic and seed-sensitive") =
    Prop.forAll(strGen) { s =>
      val bytes = s.getBytes("UTF-8")
      BloomProbe.fnv(bytes, 0L) == BloomProbe.fnv(bytes, 0L) &&
        (s.isEmpty || BloomProbe.fnv(bytes, 0L) != BloomProbe.fnv(bytes, 1L))
    }

  // ── winnowing expressions vs an independent straight-line reference ──

  private def md5Hex(bytes: Array[Byte]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    MinMd5Salted.toHex(md.digest(bytes))
  }

  /** Independent reference for the winnowing selection: k-gram hashes →
    * sliding-window-w string minima → first-occurrence distinct. */
  private def winnowRef(hs: IndexedSeq[String], w: Int): Option[IndexedSeq[String]] =
    if (hs.size < w) None
    else Some(hs.sliding(w).map(_.min).toIndexedSeq.distinct)

  private val wordGen = Gen.frequency(
    (8, Gen.listOf(Gen.alphaNumChar).map(_.mkString)),
    (1, Gen.const("naïve…")), // multi-byte UTF-8
    (1, Gen.const("")))
  private val wsGen = Gen.listOfN(20, wordGen).flatMap(l => Gen.choose(0, 20).map(l.take))
  private val kwGen = for { k <- Gen.choose(2, 8); w <- Gen.choose(2, 5) } yield (k, w)

  property("winnow_fps_words equals the straight-line reference") =
    Prop.forAll(wsGen, kwGen) { case (ws, (k, w)) =>
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        ws.map(s => UTF8String.fromString(s).asInstanceOf[Any]).toArray)
      val got = WinnowFpsWords(null, null, null).nullSafeEval(arr, k, w)
      val n = ws.size
      val nh = math.max(n - (k - 1), 1)
      val hs = (0 until nh).map { i =>
        md5Hex(ws.slice(i, math.min(i + k, n)).mkString(" ").getBytes("UTF-8"))
      }
      (winnowRef(hs, w), got) match {
        case (None, null) => true
        case (Some(want), g: org.apache.spark.sql.catalyst.util.GenericArrayData) =>
          g.array.toIndexedSeq.map(_.toString) == want
        case _ => false
      }
    }

  private val textGen = Gen.frequency(
    (8, Gen.listOf(Gen.alphaNumChar).map(_.mkString)),
    (2, Gen.listOf(Gen.oneOf('a', ' ', 'ß', '漢', 'é')).map(_.mkString)))

  property("winnow_fps_chars equals the straight-line code-point reference") =
    Prop.forAll(textGen, kwGen) { case (text, (k, w)) =>
      val got = WinnowFpsChars(null, null, null)
        .nullSafeEval(UTF8String.fromString(text), k, w)
      val cps = text.codePoints().toArray.map(cp => new String(Character.toChars(cp)))
      val nh = cps.length - k + 1
      val want =
        if (nh < w) None
        else winnowRef((0 until nh).map(i =>
          md5Hex(cps.slice(i, i + k).mkString.getBytes("UTF-8"))), w)
      (want, got) match {
        case (None, null) => true
        case (Some(ref), g: org.apache.spark.sql.catalyst.util.GenericArrayData) =>
          g.array.toIndexedSeq.map(_.toString) == ref
        case _ => false
      }
    }

  property("md5_lower64 equals the little-endian low half of the md5 digest") =
    Prop.forAll(strGen) { t =>
      val got = Md5Lower64(null).nullSafeEval(UTF8String.fromString(t)).asInstanceOf[Long]
      val d = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
      val want = (0 until 8).map(j => (d(8 + j) & 0xffL) << (8 * j)).foldLeft(0L)(_ | _)
      got == want
    }

  property("pq_encode_packed equals the relational argmin it replaced") =
    Prop.forAll(
      Gen.listOfN(16, Gen.chooseNum(-1.0f, 1.0f)),       // one 16-dim vector
      Gen.listOfN(4 * 8 * 4, Gen.chooseNum(-1.0f, 1.0f)) // m=4 subs × k=8 codes × 4 dims
    ) { (v, cb) =>
      import org.apache.spark.sql.catalyst.expressions.Literal
      import org.apache.spark.sql.types.{ArrayType, DoubleType, FloatType}
      val cnorm2 = cb.grouped(4).map(_.map(x => x.toDouble * x.toDouble).sum).toArray
      val e = PqEncodePacked(
        Literal.create(null, ArrayType(FloatType)),
        Literal.create(cb.toArray, ArrayType(FloatType)),
        Literal.create(cnorm2, ArrayType(DoubleType)))
      val arr = new org.apache.spark.sql.catalyst.util.GenericArrayData(
        v.map(_.asInstanceOf[Any]).toArray)
      val got = e.nullSafeEval(arr, null, null).asInstanceOf[Long]
      // reference: per sub, min(struct(dist, code)) with left-to-right
      // double-accumulated dots — the exact relational form
      var want = 0L
      for (j <- 0 until 4) {
        var best = Double.PositiveInfinity; var bestC = 0
        for (c <- 0 until 8) {
          var acc = 0d
          for (i <- 0 until 4)
            acc += v(j * 4 + i).toDouble * cb((j * 8 + c) * 4 + i).toDouble
          val dist = cnorm2(j * 8 + c) - 2.0 * acc
          if (dist < best) { best = dist; bestC = c }
        }
        want += bestC.toLong << (8 * j)
      }
      got == want
    }
}
