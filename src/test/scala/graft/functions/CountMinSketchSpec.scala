package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The agg_freq_sketch oracle row pins the exact counts; the Count-Min
  * grid's own guarantees — one-sided error, the εN bound, linear-sketch
  * mergeability across adversarial partitionings, estimate/aggregate
  * hash agreement — are asserted here. */
class CountMinSketchSpec extends SparkSuite {

  private val (d, w) = (4, 2048)

  /** Zipf-ish key stream: key k appears ~40000/k times for k in 1..200 —
    * heavy hitters plus a long tail, the shape Count-Min is built for. */
  private def stream: DataFrame =
    spark.range(1, 201).select(col("id").as("k"), (lit(40000) / col("id")).cast("int").as("n"))
      .select(col("k"), explode(sequence(lit(1), col("n"))).as("i")).select("k")

  private def estimates(df: DataFrame): DataFrame = {
    CountMinSketch.register(spark)
    val sk = df.agg(expr(s"cm_sketch(k, $d, $w)").as("sk"), count(lit(1)).as("n_total"))
    val exact = df.groupBy("k").agg(count(lit(1)).as("exact"))
    exact.crossJoin(broadcast(sk))
      .select(col("k"), col("exact"), col("n_total"),
        expr(s"cm_estimate(sk, k, $d, $w)").as("est"))
  }

  test("estimates are one-sided (est >= exact) and within the eN bound") {
    val e = estimates(stream).cache()
    assert(e.filter(col("est") < col("exact")).count() == 0,
      "Count-Min never undercounts")
    val over = e.filter(
      col("est").cast("double") > col("exact").cast("double")
        + col("n_total").cast("double") * (8.0 / w)).count()
    assert(over == 0, s"$over keys exceeded the 8/w eN error bound")
    e.unpersist()
  }

  test("an absent key estimates at most eN (usually 0 on a sparse grid)") {
    CountMinSketch.register(spark)
    val df = stream
    val sk = df.agg(expr(s"cm_sketch(k, $d, $w)").as("sk"), count(lit(1)).as("n_total"))
    val absent = spark.range(100000, 100050).select(col("id").as("k"))
      .crossJoin(broadcast(sk))
      .select(expr(s"cm_estimate(sk, k, $d, $w)").as("est"), col("n_total"))
    assert(absent.filter(
      col("est").cast("double") > col("n_total").cast("double") * (8.0 / w)).count() == 0)
  }

  test("the grid is a linear sketch: adversarial partitioning changes nothing") {
    CountMinSketch.register(spark)
    // key-sorted ranges put each key's whole mass in one partition, so
    // the final grid is produced by the merge path, not a single stream
    val single = stream.coalesce(1).agg(expr(s"cm_sketch(k, $d, $w)"))
      .head.getStruct(0).getSeq[Long](2)
    val merged = stream.repartitionByRange(13, col("k")).agg(expr(s"cm_sketch(k, $d, $w)"))
      .head.getStruct(0).getSeq[Long](2)
    assert(single == merged, "element-wise merge must be exactly order-independent")
  }

  test("grid mass equals d x stream length (nothing dropped, nothing invented)") {
    CountMinSketch.register(spark)
    val row = stream.agg(expr(s"cm_sketch(k, $d, $w)").as("sk"), count(lit(1)).as("n")).head
    assert(row.getStruct(0).getSeq[Long](2).sum == d.toLong * row.getLong(1))
  }

  test("a mismatched (d, w) at query time fails loudly") {
    CountMinSketch.register(spark)
    // the key must be BIGINT: an IntegerType literal would be rejected by
    // checkInputDataTypes at analysis time and the runtime (d, w) guard —
    // the thing under test — would never execute
    val sk = stream.agg(expr(s"cm_sketch(k, $d, $w)").as("sk")).cache()
    def mismatchMsg(qd: Int, qw: Int): String = {
      val e = intercept[Exception] {
        sk.select(expr(s"cm_estimate(sk, CAST(1 AS BIGINT), $qd, $qw)")).collect()
      }
      Iterator.iterate[Throwable](e)(_.getCause).takeWhile(_ != null)
        .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    }
    assert(mismatchMsg(d, w * 2).contains("config mismatch"),
      "the runtime (d, w) require is what must throw")
    // the transposed config has the SAME d*w product — the struct's own
    // (d, w) is what catches it, not a length check
    assert(mismatchMsg(w, d).contains("config mismatch"))
    sk.unpersist()
  }
}
