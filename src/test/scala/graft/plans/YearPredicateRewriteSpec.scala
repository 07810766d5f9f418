package graft.plans

import graft.{SparkSuite, Tables}
import org.apache.spark.sql.functions._

class YearPredicateRewriteSpec extends SparkSuite {

  private def formattedPlan(df: org.apache.spark.sql.DataFrame): String = {
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) { df.explain("formatted") }
    out.toString
  }

  test("year(col) BETWEEN rewrites to a pushable date range with identical results") {
    YearPredicateRewrite.install(spark)
    val orders = Tables(spark, sf0001).orders

    val viaYear = orders.filter(year(col("o_orderdate")).between(1995, 1996))
    val viaDate = orders.filter(
      col("o_orderdate") >= lit("1995-01-01").cast("date")
        && col("o_orderdate") < lit("1997-01-01").cast("date"))

    // same rows
    assert(viaYear.count() == viaDate.count())
    assert(viaYear.count() > 0)
    // the rule rewrote the logical predicate...
    val optimized = viaYear.queryExecution.optimizedPlan.toString
    assert(optimized.contains(">= 1995-01-01") || optimized.contains("1995-01-01"),
      s"no date bound in optimized plan:\n$optimized")
    assert(!optimized.contains("year("), s"year() survived in optimized plan:\n$optimized")
    // ...and the range reaches the parquet scan as pushed filters
    val plan = formattedPlan(viaYear)
    assert(plan.contains("GreaterThanOrEqual(o_orderdate"), s"no pushed lower bound in:\n$plan")
    assert(plan.contains("LessThan(o_orderdate"), s"no pushed upper bound in:\n$plan")
  }

  test("equality, strict bounds and timestamp columns rewrite exactly") {
    YearPredicateRewrite.install(spark)
    val orders = Tables(spark, sf0001).orders
    val cases: Seq[(org.apache.spark.sql.Column, org.apache.spark.sql.Column)] = Seq(
      (year(col("o_orderdate")) === 1995)  -> (col("o_orderdate") >= lit("1995-01-01").cast("date")
        && col("o_orderdate") < lit("1996-01-01").cast("date")),
      (year(col("o_orderdate")) > 1995)    -> (col("o_orderdate") >= lit("1996-01-01").cast("date")),
      (year(col("o_orderdate")) < 1996)    -> (col("o_orderdate") < lit("1996-01-01").cast("date")),
      (year(col("o_orderdate")) <= 1996)   -> (col("o_orderdate") < lit("1997-01-01").cast("date")))
    cases.foreach { case (yearPred, datePred) =>
      val a = orders.filter(yearPred).count()
      val b = orders.filter(datePred).count()
      assert(a == b, s"rewrite changed semantics for $yearPred: $a vs $b")
    }
  }

  test("out-of-range year literals are left unrewritten, not a planning crash") {
    YearPredicateRewrite.install(spark)
    val orders = Tables(spark, sf0001).orders
    // valid always-false predicates; LocalDateTime.of would reject y+1
    assert(orders.filter(year(col("o_orderdate")) === 2147483647).count() == 0)
    assert(orders.filter(year(col("o_orderdate")) === 0).count() == 0)
    assert(orders.filter(year(col("o_orderdate")) > 9998).count() == 0)
  }
}
