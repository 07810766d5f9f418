package graft.etl

import graft.SparkSuite
import graft.gen.LibraryTables
import graft.queries.ReportRenderer
import org.apache.spark.sql.functions._

class IncrementalAndRendererSpec extends SparkSuite {
  import spark.implicits._

  lazy val oltp    = LibraryTables.generate(spark, 0.02)
  lazy val derived = graft.etl.Derivations.applyAll(oltp, "2024-06-30")
  lazy val dw      = InitialLoad(spark, derived)

  test("incremental load is idempotent: replaying the same batch changes nothing") {
    val once  = IncrementalLoad(spark, dw, derived, "2024-06-30")
    assert(once.factSales.count() == dw.factSales.count())
    assert(once.factBorrowing.count() == dw.factBorrowing.count())
    assert(once.factPurchase.count() == dw.factPurchase.count())
    assert(once.dimMembers.count() == dw.dimMembers.count())
  }

  test("incremental load appends only the genuinely new rows of an overlapping batch") {
    // batch = the same sales orders plus synthetic new ones (shifted ids)
    val extraOrders = derived.salesOrders.limit(10)
      .withColumn("order_id", concat(lit("SOX"), col("order_id")))
    val extraDetails = derived.salesDetails
      .join(derived.salesOrders.limit(10).select("order_id"), Seq("order_id"))
      .withColumn("order_id", concat(lit("SOX"), col("order_id")))
    val batch = derived.copy(
      salesOrders = derived.salesOrders.unionByName(extraOrders),
      salesDetails = derived.salesDetails.unionByName(extraDetails))
    val refreshed = IncrementalLoad(spark, dw, batch, "2024-06-30")
    val added = refreshed.factSales.count() - dw.factSales.count()
    assert(added == extraDetails.count(), s"expected ${extraDetails.count()} new fact rows, got $added")
  }

  test("incremental load versions existing members whose tracked attrs changed (SCD2)") {
    val someId = derived.members.select("member_id").orderBy("member_id").limit(1)
      .collect().head.getString(0)
    val batch = derived.copy(members =
      derived.members.withColumn("member_name",
        when(col("member_id") === someId, lit("Changed Name")).otherwise(col("member_name"))))
    val refreshed = IncrementalLoad(spark, dw, batch, "2024-07-31")
    // exactly one new version row appended for the changed member
    assert(refreshed.dimMembers.count() == dw.dimMembers.count() + 1)
    val versions = refreshed.dimMembers.filter(col("member_id") === someId)
      .select("member_name", "curr_ind", "member_key")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).sortBy(_._2)
    assert(versions.length == 2)
    val (closed, opened) = (versions.head, versions.last)
    assert(closed._2 == "N" && opened._2 == "Y")
    assert(opened._1 == "Changed Name")
    // the new version got a fresh surrogate key above the old max
    val oldMax = dw.dimMembers.agg(max(col("member_key"))).first().getLong(0)
    assert(opened._3 > oldMax && closed._3 <= oldMax)
    // facts resolve against the current version only — no fan-out
    assert(refreshed.factSales.count() == dw.factSales.count())
  }

  test("renderer emits BREAK-suppressed groups and COMPUTE subtotal rows") {
    val df = Seq(
      (1995L, "Fiction", 100.0), (1995L, "Mystery", 50.0),
      (1996L, "Fiction", 70.0)
    ).toDF("yr", "genre", "rev").orderBy("yr", "genre")
    val out = ReportRenderer.render(df, "Genre Sales", "yr", Seq("rev"))
    assert(out.contains("Genre Sales"))
    assert(out.contains("sum(1995)") && out.contains("150.00"))
    assert(out.contains("sum(1996)") && out.contains("70.00"))
    // 1995 appears once as a value (break suppression) plus once in subtotal
    assert(out.linesIterator.count(l => l.contains("| 1995 ")) == 1)
  }
}
