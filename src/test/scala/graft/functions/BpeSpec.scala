package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** Pins the BPE algorithm itself (the text_bpe_tokenize op is a
  * rows-only contract, so the algorithm's semantics are asserted here):
  * reference merge order on a hand-computable vocabulary, round-trip
  * identity, rank-greedy inference, determinism, and monotonicity. */
class BpeSpec extends AnyFunSuite {

  test("merge order follows weighted pair counts with lexicographic ties (hand example)") {
    // vocab: aaab x5, ab x3  →  pair counts: (a,a)=10, (a,b)=8
    // merge 1 = (a,a) → words: [aa,a,b]x5, [a,b]x3 → (aa,a)=5, (a,b)=8
    // merge 2 = (a,b) → words: [aa,ab]x5, [ab]x3   → (aa,ab)=5
    // merge 3 = (aa,ab)
    val merges = Bpe.train(Seq("aaab" -> 5L, "ab" -> 3L), 10)
    assert(merges == Vector("a" -> "a", "a" -> "b", "aa" -> "ab"))
  }

  test("lexicographic tie-break makes equal-count training deterministic") {
    // "xy" and "xz" both count 5: (x,y) vs (x,z) tie → (x,y) first
    val merges = Bpe.train(Seq("xy" -> 5L, "xz" -> 5L), 2)
    assert(merges == Vector("x" -> "y", "x" -> "z"))
  }

  test("encode round-trips every word and reproduces train-time segmentations") {
    val vocab = Seq("lower" -> 6L, "lowest" -> 3L, "newer" -> 4L, "wider" -> 2L)
    val merges = Bpe.train(vocab, 50)
    val ranks = merges.zipWithIndex.toMap
    val rng = new scala.util.Random(42)
    val words = vocab.map(_._1) ++ Seq("", "a", "low", "newest", "unseen", "日本語") ++
      (1 to 50).map(_ => rng.alphanumeric.take(1 + rng.nextInt(12)).mkString)
    words.foreach { w =>
      val pieces = Bpe.encode(w, ranks)
      assert(pieces.mkString == w, s"round-trip broke for '$w': $pieces")
      // no adjacent pair in the output may still be mergeable — greedy
      // inference must run to a fixed point
      pieces.sliding(2).foreach {
        case Vector(x, y) => assert(!ranks.contains((x, y)), s"unapplied merge ($x,$y) in '$w'")
        case _            =>
      }
    }
    // a word seen in training with enough merges collapses fully
    assert(Bpe.encode("lower", ranks).length < "lower".length)
  }

  test("training is deterministic and more merges never increase piece counts") {
    val vocab = (1 to 300).map { i =>
      val rng = new scala.util.Random(i)
      rng.alphanumeric.take(3 + rng.nextInt(9)).mkString.toLowerCase -> (1L + i % 17)
    }
    val a = Bpe.train(vocab, 120)
    val b = Bpe.train(vocab, 120)
    assert(a == b, "same vocabulary must always yield the same merge table")
    val few = Bpe.train(vocab, 30).zipWithIndex.toMap
    val many = a.zipWithIndex.toMap
    vocab.foreach { case (w, _) =>
      assert(Bpe.encode(w, many).length <= Bpe.encode(w, few).length,
        s"more merges grew the encoding of '$w'")
    }
  }

  test("unseen characters stay single symbols; empty ranks = character split") {
    assert(Bpe.encode("abc", Map.empty) == Vector("a", "b", "c"))
    val ranks = Bpe.train(Seq("aa" -> 5L), 5).zipWithIndex.toMap
    assert(Bpe.encode("zq", ranks) == Vector("z", "q"))
  }
}
