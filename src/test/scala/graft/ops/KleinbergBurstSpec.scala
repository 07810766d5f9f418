package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** events_burst_kleinberg's DP against a sequential brute-force
  * reference: with only 2^T state sequences, small fixtures can be
  * verified by EXHAUSTIVE minimization — the DP must always land on
  * the true minimum cost, and on the unique optimum whenever there is
  * one. (Cross-engine agreement needs only that Spark and the oracle
  * mirror the same tie DECISIONS, which they do by construction; this
  * spec pins that those decisions solve the optimization at all.) */
class KleinbergBurstSpec extends AnyFunSuite {

  private def costs(counts: IndexedSeq[Long]) = {
    val nd = counts.length
    val tot = counts.sum
    val gam = 2L * tot
    (gam,
      (n: Long) => math.abs(2L * nd * n - 2L * tot),
      (n: Long) => math.abs(2L * nd * n - 4L * tot))
  }

  private def seqCost(counts: IndexedSeq[Long], states: IndexedSeq[Boolean]): Long = {
    val (gam, cl, ch) = costs(counts)
    var c = if (states(0)) gam + ch(counts(0)) else cl(counts(0))
    for (t <- 1 until counts.length) {
      if (states(t) && !states(t - 1)) c += gam
      c += (if (states(t)) ch(counts(t)) else cl(counts(t)))
    }
    c
  }

  /** (minimum cost, set of optimal sequences) by exhaustive search. */
  private def bruteForce(counts: IndexedSeq[Long]): (Long, Set[IndexedSeq[Boolean]]) = {
    val all = (0 until (1 << counts.length))
      .map(m => IndexedSeq.tabulate(counts.length)(t => ((m >> t) & 1) == 1))
    val best = all.map(s => seqCost(counts, s)).min
    (best, all.filter(s => seqCost(counts, s) == best).toSet)
  }

  test("a sustained spike is flagged as one burst; singles are not") {
    // D=6, N=24: base 4/day, high target 8/day, gamma=48. The two
    // 10-count days are worth entering the high state for; the
    // flanking 1-count days are not.
    val counts = IndexedSeq(1L, 1L, 10L, 10L, 1L, 1L)
    val got = EventsOps.kleinbergStates(counts)
    assert(got == IndexedSeq(false, false, true, true, false, false))
    val (best, optima) = bruteForce(counts)
    assert(seqCost(counts, got) == best && optima == Set(got))
    // an isolated spike of the same height does NOT pay for gamma
    val single = IndexedSeq(1L, 1L, 10L, 1L, 1L, 1L)
    val gotSingle = EventsOps.kleinbergStates(single)
    assert(gotSingle.forall(!_), s"isolated spike must stay low: $gotSingle")
    assert(seqCost(single, gotSingle) == bruteForce(single)._1)
  }

  test("DP reaches the exhaustive minimum on random small series") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 200) {
      val nd = 2 + rnd.nextInt(9) // 2..10 days
      val counts = IndexedSeq.fill(nd)(rnd.nextInt(12).toLong)
      val dp = EventsOps.kleinbergStates(counts)
      val (best, optima) = bruteForce(counts)
      assert(seqCost(counts, dp) == best,
        s"trial $trial counts=$counts dp=$dp cost=${seqCost(counts, dp)} best=$best")
      if (optima.size == 1)
        assert(dp == optima.head, s"trial $trial unique optimum mismatch: $dp")
    }
  }

  test("sesLevels matches the hand-rolled recursion and converges on flat series") {
    // pinned: levels for [8, 0, 8, 4]: 8, (0+24)/4=6, (8+18)/4=6, (4+18)/4=5
    assert(EventsOps.sesLevels(IndexedSeq(8L, 0L, 8L, 4L)) ==
      IndexedSeq((8L, None), (6L, Some(8L)), (6L, Some(6L)), (5L, Some(6L))))
    // a flat series is its own fixpoint: level == n, residual 0 after t=1
    val flat = EventsOps.sesLevels(IndexedSeq.fill(10)(12L))
    assert(flat.forall(_._1 == 12L) && flat.tail.forall(_._2.contains(12L)))
    // independent fold reference on random series
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 50) {
      val counts = IndexedSeq.fill(2 + rnd.nextInt(20))(rnd.nextInt(100).toLong)
      var lvl = counts(0)
      val want = counts.zipWithIndex.map { case (n, i) =>
        if (i == 0) (lvl, None)
        else { val fc = lvl; lvl = (n + 3 * lvl) / 4; (lvl, Some(fc)) }
      }
      assert(EventsOps.sesLevels(counts) == want)
    }
  }

  test("holtLevels matches the fold reference, floors negatives, and tracks a linear ramp") {
    val U = EventsOps.HoltUnit
    // pinned: [8, 0, 8, 4] in micro-units — the trend goes NEGATIVE at
    // t=2, exercising the floorDiv-vs-truncation distinction (all
    // numerators here divide exactly, so the values are readable):
    // t=2: fc=8U, L=⌊(0+24U)/4⌋=6U, T=⌊(6U−8U)/4⌋=−U/2
    // t=3: fc=5.5U, L=⌊(8U+16.5U)/4⌋, T from it, etc.
    val pinned = EventsOps.holtLevels(IndexedSeq(8L, 0L, 8L, 4L))
    assert(pinned.head == ((8L * U, 0L, None)))
    assert(pinned(1) == ((6L * U, -U / 2, Some(8L * U))))
    // a flat series is its own fixpoint: level == n·U, trend == 0
    val flat = EventsOps.holtLevels(IndexedSeq.fill(10)(12L))
    assert(flat.forall(s => s._1 == 12L * U && s._2 == 0L) &&
      flat.tail.forall(_._3.contains(12L * U)))
    // on a long linear ramp the trend converges to the slope and the
    // forecast stops lagging (THE property SES lacks, and the property
    // unit-granularity integer floors LOSE — a slope-4 ramp sticks at
    // trend 1 without the fixed point scale)
    val ramp = (0 until 40).map(i => 10L + 4L * i)
    val h = EventsOps.holtLevels(ramp)
    assert(Math.floorDiv(h.last._2, U) == 4L, s"trend must converge to the slope: ${h.last}")
    val fcFloor = h.last._3.map(Math.floorDiv(_, U)).get
    assert(fcFloor >= ramp.last - 1 && fcFloor <= ramp.last,
      s"forecast must stop lagging (within 1 count): $fcFloor vs ${ramp.last}")
    // independent fold reference on random series (spans negative trends)
    val rnd = new scala.util.Random(11)
    for (_ <- 1 to 50) {
      val counts = IndexedSeq.fill(2 + rnd.nextInt(20))(rnd.nextInt(100).toLong)
      var lvl = counts(0) * U; var tr = 0L
      val want = counts.zipWithIndex.map { case (n, i) =>
        if (i == 0) (lvl, tr, None)
        else {
          val fc = lvl + tr
          val nl = Math.floorDiv(n * U + 3 * fc, 4)
          tr = Math.floorDiv(nl - lvl + 3 * tr, 4); lvl = nl
          (lvl, tr, Some(fc))
        }
      }
      assert(EventsOps.holtLevels(counts) == want)
    }
  }

  test("flat series never bursts; uniformly doubled tail bursts at the tail") {
    assert(EventsOps.kleinbergStates(IndexedSeq.fill(8)(5L)).forall(!_))
    // tail at 12 ≈ 1.7× the 7/day base toward the 14/day high target —
    // a 4-day run amortizes gamma (an 8-on-5 tail would not: verified
    // all-low is then genuinely optimal)
    val ramp = IndexedSeq(2L, 2L, 2L, 2L, 12L, 12L, 12L, 12L)
    val got = EventsOps.kleinbergStates(ramp)
    assert(seqCost(ramp, got) == bruteForce(ramp)._1)
    assert(got.takeRight(4).forall(identity) && got.take(4).forall(!_),
      s"tail must burst: $got")
  }

  test("events_burst_grouped's in-plan fold equals kleinbergStates on every group") {
    // the distributed Catalyst-fold Viterbi must agree with the pinned
    // driver-side DP (itself exhaustively verified above) group by
    // group — any drift in the fold's tie handling or the pred-array
    // indexing shows up here as a per-user label mismatch
    val spark = graft.SparkSuite.session
    val rows = graft.SparkEntry.queries("events_burst_grouped")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "grouped burst must produce rows")
    val byUser = rows.map(r => (r.getLong(0), r.getDate(1), r.getLong(2), r.getLong(3)))
      .groupBy(_._1)
    assert(byUser.size > 5, "the group key must be genuinely high-cardinality")
    byUser.foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
      val want = EventsOps.kleinbergStates(sorted.map(_._3).toIndexedSeq)
      val gotLabels = sorted.map(_._4 == 1L).toIndexedSeq
      assert(gotLabels == want, s"user $uid: fold labels diverge from the reference DP")
    }
  }
}
