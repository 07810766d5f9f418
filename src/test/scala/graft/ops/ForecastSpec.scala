package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** The round-11 forecasting tier: Holt–Winters (events_forecast_hw),
  * the classical decomposition (events_seasonal_decompose), and the
  * backtest eval (eval_forecast_backtest). The DuckDB oracle pins
  * cross-engine agreement; these specs pin that the recursions solve
  * the PROBLEM — the fixed-point state tracks the real-valued
  * recursion, seasonality is actually absorbed, and the eval's totals
  * are consistent with the standalone ops it measures. */
class ForecastSpec extends AnyFunSuite {

  private val U = EventsOps.HoltUnit.toDouble

  /** Real-valued additive HW (α=β=γ=1/4, m=7, zero-warmup seasonal) —
    * the un-quantized recursion the fixed-point one approximates. */
  private def hwReal(counts: IndexedSeq[Long]): IndexedSeq[Option[Double]] = {
    var level = counts(0).toDouble
    var trend = 0.0
    var seas = Vector.fill(7)(0.0)
    counts.zipWithIndex.map { case (n, i) =>
      if (i == 0) None
      else {
        val sm = seas.head
        val fc = level + trend + sm
        val nl = (n - sm + 3 * (level + trend)) / 4
        trend = (nl - level + 3 * trend) / 4
        val ns = (n - nl + 3 * sm) / 4
        level = nl
        seas = seas.tail :+ ns
        Some(fc)
      }
    }
  }

  test("hwLevels' fixed-point state stays within 1e-3 of the real recursion") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 30) {
      val nd = 10 + rnd.nextInt(60)
      val counts = IndexedSeq.fill(nd)(rnd.nextInt(1000).toLong)
      val fixed = EventsOps.hwLevels(counts).map(_._4.map(_ / U))
      val real = hwReal(counts)
      fixed.zip(real).zipWithIndex.foreach {
        case ((Some(f), Some(r)), t) =>
          // each floor loses < 2^-20; three floors/step over <=70 steps
          // stays far inside 1e-3 at count scale
          assert(math.abs(f - r) < 1e-3, s"trial $trial t=$t fixed=$f real=$r")
        case ((None, None), _) => ()
        case (pair, t) => fail(s"trial $trial t=$t definedness mismatch: $pair")
      }
    }
  }

  test("hwLevels absorbs a weekly pattern that Holt cannot") {
    // 6 weeks of a hard day-of-week spike: +140 every 7th day. After
    // the two-week warmup HW's seasonal slots carry the spike and its
    // holdout error collapses; trend-only Holt keeps paying for it.
    val counts = IndexedSeq.tabulate(42)(i => if (i % 7 == 3) 150L else 10L)
    def tailErr(fc: IndexedSeq[Option[Long]]) =
      (35 until 42).map(i => math.abs(counts(i) - fc(i).get)).sum
    val hwErr = tailErr(EventsOps.hwLevels(counts).map(_._4.map(Math.floorDiv(_, EventsOps.HoltUnit))))
    val holtErr = tailErr(EventsOps.holtLevels(counts).map(_._3.map(Math.floorDiv(_, EventsOps.HoltUnit))))
    assert(hwErr * 2 < holtErr, s"hw=$hwErr must beat holt=$holtErr by 2x on a periodic series")
  }

  test("hwLevels on a flat series degenerates to the flat fixpoint") {
    // no seasonality, no trend: level locks to n, seasonal slots stay
    // near 0, forecasts converge to n
    val flat = EventsOps.hwLevels(IndexedSeq.fill(30)(64L))
    val lastFc = flat.last._4.map(Math.floorDiv(_, EventsOps.HoltUnit))
    assert(lastFc.exists(fc => math.abs(fc - 64L) <= 1), s"flat forecast drifted: $lastFc")
  }

  test("events_seasonal_decompose satisfies the x7 identity and per-dow constancy") {
    val spark = graft.SparkSuite.session
    val rows = graft.SparkEntry.queries("events_seasonal_decompose")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "decomposition must produce rows")
    rows.foreach { r =>
      val (n, tr, se, re) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(7 * n == tr + se + re,
        s"7n = trend+seas+resid must hold by construction: $r")
    }
    // the seasonal component is a function of (type, dow) only
    rows.groupBy(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay % 7))
      .foreach { case (k, rs) =>
        assert(rs.map(_.getLong(4)).distinct.size == 1,
          s"seasonal must be constant per (type, dow): $k")
      }
  }

  test("events_forecast_ses_grouped's in-plan fold equals sesLevels on every group") {
    // the distributed Catalyst-fold SES must agree with the pinned
    // driver-side recursion (the one events_forecast_ses runs and the
    // oracle replays) group by group — drift in the fold's append
    // indexing or the forecast shift shows up as a per-user mismatch
    val spark = graft.SparkSuite.session
    val rows = graft.SparkEntry.queries("events_forecast_ses_grouped")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "grouped SES must produce rows")
    val byUser = rows.map(r => (r.getLong(0), r.getDate(1), r.getLong(2),
      r.getLong(3), if (r.isNullAt(4)) None else Some(r.getLong(4)))).groupBy(_._1)
    assert(byUser.size > 5, "the group key must be genuinely high-cardinality")
    byUser.foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
      val want = EventsOps.sesLevels(sorted.map(_._3).toIndexedSeq)
      val got = sorted.map(r => (r._4, r._5)).toIndexedSeq
      assert(got == want, s"user $uid: fold (level, forecast) diverge from sesLevels")
    }
  }

  test("events_forecast_holt_grouped's struct fold equals holtLevels on every group") {
    // the double recursion (level + trend, each step reading both
    // predecessors) is the fold pattern's hardest forecasting instance —
    // any drift in the struct-of-arrays append or the floor-division
    // step shows up as a per-user (level_u, trend_u, forecast) mismatch
    val spark = graft.SparkSuite.session
    val rows = graft.SparkEntry.queries("events_forecast_holt_grouped")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "grouped Holt must produce rows")
    val byUser = rows.map(r => (r.getLong(0), r.getDate(1), r.getLong(2),
      r.getLong(3), r.getLong(4),
      if (r.isNullAt(5)) None else Some(r.getLong(5)))).groupBy(_._1)
    assert(byUser.size > 5, "the group key must be genuinely high-cardinality")
    byUser.foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
      val want = EventsOps.holtLevels(sorted.map(_._3).toIndexedSeq)
        .map { case (lu, tu, fcU) => (lu, tu, fcU.map(Math.floorDiv(_, EventsOps.HoltUnit))) }
      val got = sorted.map(r => (r._4, r._5, r._6)).toIndexedSeq
      assert(got == want, s"user $uid: fold (level_u, trend_u, forecast) diverge from holtLevels")
    }
  }

  test("events_forecast_hw_grouped's ring-buffer fold equals hwLevels on every group") {
    // the capstone: level + trend + the 7-slot seasonal ring rotate
    // through nested lambda bindings — drift in the ring rotation, the
    // due-slot read, or the let-binding transform trick shows up as a
    // per-user (level_u, trend_u, seas_u, forecast) mismatch
    val spark = graft.SparkSuite.session
    val rows = graft.SparkEntry.queries("events_forecast_hw_grouped")(
      spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty, "grouped HW must produce rows")
    val byUser = rows.map(r => (r.getLong(0), r.getDate(1), r.getLong(2),
      r.getLong(3), r.getLong(4), r.getLong(5),
      if (r.isNullAt(6)) None else Some(r.getLong(6)))).groupBy(_._1)
    assert(byUser.size > 5, "the group key must be genuinely high-cardinality")
    byUser.foreach { case (uid, rs) =>
      val sorted = rs.sortBy(_._2.toLocalDate.toEpochDay)
      val want = EventsOps.hwLevels(sorted.map(_._3).toIndexedSeq)
        .map { case (lu, tu, su, fcU) =>
          (lu, tu, su, fcU.map(Math.floorDiv(_, EventsOps.HoltUnit))) }
      val got = sorted.map(r => (r._4, r._5, r._6, r._7)).toIndexedSeq
      assert(got == want, s"user $uid: fold state diverges from hwLevels")
    }
  }

  test("the grouped folds stay correct at a decade-long day spine (quadratic-append bound)") {
    // the fold accumulators append via concat, copying the prior array
    // each step — O(|days|²) element copies per group (the scaladoc
    // bound in EventsOps). This pins that at a 3,700-step spine (a
    // 10-year daily series) all three folds still complete promptly
    // AND agree with the pinned driver recursions element-for-element,
    // so the bound note stays an honest cost statement, not a cliff.
    val spark = graft.SparkSuite.session
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val n = 3700
    val counts = IndexedSeq.tabulate(n)(i => ((i * 2654435761L) >>> 20) % 7)
    val df = Seq((1L, counts)).toDF("user_id", "ns")
      .withColumn("nd", size(col("ns")))
    val t0 = System.nanoTime()
    val ses = df.withColumn("levels", expr(EventsOps.sesFoldSql))
      .select("levels").head().getSeq[Long](0).toIndexedSeq
    assert(ses == EventsOps.sesLevels(counts).map(_._1),
      "decade-spine SES fold diverges from the pinned recursion")
    val holt = df.withColumn("st", expr(EventsOps.holtFoldSql))
      .select(col("st.lus"), col("st.tus")).head()
    val wantHolt = EventsOps.holtLevels(counts)
    assert(holt.getSeq[Long](0).toIndexedSeq == wantHolt.map(_._1), "decade-spine Holt levels diverge")
    assert(holt.getSeq[Long](1).toIndexedSeq == wantHolt.map(_._2), "decade-spine Holt trends diverge")
    val hw = df.withColumn("st", expr(EventsOps.hwFoldSql))
      .select(col("st.lus"), col("st.tus"), col("st.sus")).head()
    val wantHw = EventsOps.hwLevels(counts)
    assert(hw.getSeq[Long](0).toIndexedSeq == wantHw.map(_._1), "decade-spine HW levels diverge")
    assert(hw.getSeq[Long](1).toIndexedSeq == wantHw.map(_._2), "decade-spine HW trends diverge")
    assert(hw.getSeq[Long](2).toIndexedSeq == wantHw.map(_._3), "decade-spine HW seasonals diverge")
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"decade-spine folds (3 x 3700 steps) ran in $secs%.2f s")
    assert(secs < 120, "the quadratic append must stay tolerable at a decade spine")
  }

  test("eval_forecast_backtest totals equal the standalone ops' holdout residuals") {
    val spark = graft.SparkSuite.session
    val dir = "/root/testdata/sf0.001"
    val bt = graft.SparkEntry.queries("eval_forecast_backtest")(spark, dir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(bt.nonEmpty && bt.keys.map(_._2).toSet == Set("naive", "ses", "holt", "hw"))
    // recompute ses + hw holdout errors from the standalone query output
    for (op <- Seq("events_forecast_ses" -> "ses", "events_forecast_hw" -> "hw")) {
      val byType = graft.SparkEntry.queries(op._1)(spark, dir).collect()
        .map(r => (r.getString(0), r.getDate(1).toLocalDate.toEpochDay,
          if (r.isNullAt(r.fieldIndex("resid"))) None
          else Some(r.getLong(r.fieldIndex("resid")))))
        .groupBy(_._1)
      byType.foreach { case (tp, rs) =>
        val tail = rs.sortBy(_._2).takeRight(7).flatMap(_._3)
        val (nEval, absErr) = bt((tp, op._2))
        assert(nEval == tail.size && absErr == tail.map(math.abs).sum,
          s"$tp/${op._2}: backtest ($nEval, $absErr) vs standalone tail ${tail.toSeq}")
      }
    }
  }
}
