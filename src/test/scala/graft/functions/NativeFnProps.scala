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
}
