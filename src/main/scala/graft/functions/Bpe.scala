package graft.functions

import scala.collection.mutable

/** Deterministic byte-pair encoding (Sennrich, Haddow & Birch 2016,
  * "Neural Machine Translation of Rare Words with Subword Units") —
  * the subword tokenizer a pre-training pipeline counts token budgets
  * with, where whitespace word counts are only a proxy.
  *
  * Everything here is pure and deterministic: training ties break on
  * the lexicographically smallest pair, so the same word-frequency
  * vocabulary always yields the same merge table on every JVM — the
  * property the Spark op's dictionary join and the specs rely on.
  *
  * Scale split: [[train]] runs driver-side on a BOUNDED top-V
  * word-frequency table (the k-means-sample pattern — V·|word| work,
  * independent of corpus size); [[encode]] runs executor-side once per
  * DISTINCT token, and the corpus only ever sees a token→pieces
  * dictionary join.
  */
object Bpe {

  type Pair = (String, String)

  /** Greedy merge-table training on a word-frequency vocabulary.
    * Each iteration merges the adjacent symbol pair with the highest
    * weighted count (ties: lexicographically smallest pair), exactly
    * the reference algorithm of Sennrich et al. §3.2.
    */
  def train(vocab: Seq[(String, Long)], numMerges: Int): Vector[Pair] = {
    var words: Vector[(Vector[String], Long)] =
      vocab.sortBy { case (w, c) => (-c, w) }.toVector
        .map { case (w, c) => (w.map(_.toString).toVector, c) }
    val merges = Vector.newBuilder[Pair]
    var done = false
    var i = 0
    while (i < numMerges && !done) {
      val counts = mutable.Map.empty[Pair, Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val best = counts.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
        merges += best
        words = words.map { case (syms, c) => (mergeOnce(syms, best), c) }
        i += 1
      }
    }
    merges.result()
  }

  /** One left-to-right, non-overlapping merge pass of `pair`. */
  private def mergeOnce(syms: Vector[String], pair: Pair): Vector[String] = {
    val out = Vector.newBuilder[String]
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == pair._1 && syms(j + 1) == pair._2) {
        out += syms(j) + syms(j + 1)
        j += 2
      } else {
        out += syms(j)
        j += 1
      }
    }
    out.result()
  }

  /** Encode one word with a trained merge table: repeatedly apply the
    * lowest-rank (earliest-learned) applicable merge until none fits —
    * the standard inference rule, guaranteeing train-time segmentations
    * are reproduced and unseen character pairs stay unmerged. The
    * concatenation of the returned pieces is always the input word. */
  def encode(word: String, ranks: Map[Pair, Int]): Vector[String] = {
    if (word.isEmpty) return Vector.empty
    var syms = word.map(_.toString).toVector
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestPair: Pair = null
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestPair = (syms(j), syms(j + 1)) }
        j += 1
      }
      if (bestPair == null) continue = false
      else syms = mergeOnce(syms, bestPair)
    }
    syms
  }
}
