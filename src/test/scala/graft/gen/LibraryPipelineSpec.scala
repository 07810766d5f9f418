package graft.gen

import graft.SparkSuite
import graft.etl.{Derivations, InitialLoad}
import graft.queries.LibraryReports
import org.apache.spark.sql.functions._

/** End-to-end library-domain pipeline at 1/10 reference scale:
  * generate → derive (trigger rules) → star-schema load → reports.
  * Asserts the reference's own post-load validation properties
  * (SURVEY §5): volume targets, distribution mixes, amount invariants,
  * FactBorrowing PK collapse. */
class LibraryPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val scale = 0.1
  lazy val oltp    = LibraryTables.generate(spark, scale)
  lazy val derived = Derivations.applyAll(oltp, asOf = "2024-06-30")
  lazy val dw      = InitialLoad(spark, derived)

  test("generators hit the configured volume targets") {
    assert(oltp.members.count() == 750)
    assert(oltp.bookTitles.count() == 900)
    assert(oltp.bookCopies.count() == 4500)
    assert(oltp.suppliers.count() == 15)
    assert(oltp.discounts.count() == 64)
    val borrows = oltp.borrowedBooks.count()
    assert(borrows > 180000 && borrows < 200000, s"borrows=$borrows") // ~36/weekday
    val orders = oltp.salesOrders.count()
    assert(orders > 35000 && orders < 75000, s"orders=$orders") // 5-10/day
    assert(oltp.purchaseOrders.count() == 480) // 2/month over 240 months
  }

  test("generation is deterministic: same seed, same data") {
    val again = LibraryTables.generate(spark, scale)
    assert(oltp.members.except(again.members).count() == 0)
    assert(again.members.except(oltp.members).count() == 0)
    assert(oltp.salesDetails.except(again.salesDetails).count() == 0)
  }

  test("status mix follows the reference ratios (85/8/2/5)") {
    val mix = oltp.borrowedBooks.groupBy("return_status").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val total = mix.values.sum.toDouble
    assert(math.abs(mix("Returned") / total - 0.85) < 0.01)
    assert(math.abs(mix("Overdue") / total - 0.08) < 0.01)
    assert(math.abs(mix("Lost") / total - 0.02) < 0.01)
    assert(math.abs(mix("On loan") / total - 0.05) < 0.01)
  }

  test("derivations: member status matches the expiry rule exactly") {
    val bad = derived.members.filter(
      (col("member_status") === "Active") =!= (col("expire_date") >= lit("2024-06-30").cast("date")))
    assert(bad.count() == 0)
  }

  test("derivations: every copy with an open loan is Borrowed") {
    val open = oltp.borrowedBooks.filter($"return_status" === "On loan").select("copy_id").distinct()
    val flagged = derived.bookCopies.join(open, Seq("copy_id"))
    assert(flagged.filter($"copy_status" =!= "Borrowed").count() == 0)
  }

  test("invariant: PO total equals the sum of its line totals") {
    val lines = derived.purchaseDetails
      .join(oltp.bookTitles.select("book_id", "purchase_price"), Seq("book_id"))
      .groupBy("po_id")
      .agg(sum(($"quantity" * $"purchase_price").cast("decimal(12,2)")).cast("decimal(12,2)").as("calc"))
    val bad = derived.purchaseOrders.join(lines, Seq("po_id"))
      .filter($"total_amount" =!= $"calc")
    assert(bad.count() == 0)
  }

  test("invariant: sales line total = gross - discount, discount only in windows") {
    val sd = derived.salesDetails
    assert(sd.filter($"total_amount" =!= ($"gross_amount" - $"discount_amount")).count() == 0)
    // rows with a discount must fall inside some discount window
    val discounted = sd.filter($"discount_amount" > 0)
    val outside = discounted.join(
      oltp.discounts.select("start_date", "end_date"),
      $"sales_date".between($"start_date", $"end_date"), "left_anti")
    assert(outside.count() == 0)
  }

  test("FactBorrowing collapses the (date, member, book) PK like the reference") {
    val fb = dw.factBorrowing
    assert(fb.groupBy("date_key", "member_key", "book_key").count().filter($"count" > 1).count() == 0)
    // collapse actually occurred (same-day same-member same-book borrows exist)
    assert(fb.filter($"n_collapsed" > 1).count() > 0)
  }

  test("star schema is navigable: facts resolve every dim key") {
    assert(dw.factSales.join(dw.dimBook, Seq("book_key"), "left_anti").count() == 0)
    assert(dw.factSales.join(dw.dimMembers, Seq("member_key"), "left_anti").count() == 0)
    assert(dw.factPurchase.join(dw.dimSuppliers, Seq("supplier_key"), "left_anti").count() == 0)
    assert(dw.factSales.join(dw.dimDate, Seq("date_key"), "left_anti").count() == 0)
  }

  test("the three library reports run with sane shapes") {
    val p = LibraryReports.Params(yearFrom = 2005, yearTo = 2010, topN = 3)
    val q1 = LibraryReports.q1GenreSales(dw, p)
    assert(q1.count() > 0 && q1.filter($"rn" > 3).count() == 0)
    val q2 = LibraryReports.q2PurchaseSpend(dw, p)
    assert(q2.count() > 0)
    val q3 = LibraryReports.q3GrossMargin(dw, p.copy(states = Some(Seq("Selangor", "Johor"))))
    assert(q3.count() > 0)
    assert(q3.select("member_state").distinct().as[String].collect().toSet == Set("Selangor", "Johor"))
    // gender filter narrows q1 revenue
    val q1f = LibraryReports.q1GenreSales(dw, p.copy(gender = Some("F")))
    val totAll = q1.agg(sum($"tot_rev")).first().getDouble(0)
    val totF   = q1f.agg(sum($"tot_rev")).first().getDouble(0)
    assert(totF < totAll)
  }
}
