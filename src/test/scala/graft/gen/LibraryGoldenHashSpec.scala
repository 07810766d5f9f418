package graft.gen

import graft.SparkSuite
import graft.etl.Fingerprint

/** Golden-hash pin for the seeded generators (SURVEY §5.5): at seed 42 /
  * scale 0.1 every generated table must fold to exactly the hash pinned
  * here. Unlike the volume/ratio invariants in LibraryPipelineSpec, this
  * locks the full content — any change to a generator's draw order,
  * column set, or arithmetic shows up as a hash diff, which is the point:
  * "same seed ⇒ identical dataset" is now an asserted contract, not a
  * convention.
  *
  * The hashes are order-independent ([[graft.etl.Fingerprint]]), so a
  * different partitioning or shuffle layout does NOT break them — only a
  * genuine content change does. If a generator changes intentionally,
  * re-pin by running with -Dgraft.golden.print=true and copying the
  * printed table.
  */
class LibraryGoldenHashSpec extends SparkSuite {

  private lazy val oltp = LibraryTables.generate(spark, scale = 0.1, seed = 42)

  private lazy val tables: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "members"          -> oltp.members,
    "book_titles"      -> oltp.bookTitles,
    "book_copies"      -> oltp.bookCopies,
    "suppliers"        -> oltp.suppliers,
    "discounts"        -> oltp.discounts,
    "borrowed_books"   -> oltp.borrowedBooks,
    "sales_orders"     -> oltp.salesOrders,
    "sales_details"    -> oltp.salesDetails,
    "purchase_orders"  -> oltp.purchaseOrders,
    "purchase_details" -> oltp.purchaseDetails,
    "fines"            -> oltp.fines,
    "payments"         -> oltp.payments,
    "staff"            -> oltp.staff,
    "shifts"           -> oltp.shifts,
    "shift_schedules"  -> oltp.shiftSchedules,
    "staff_attendance" -> oltp.staffAttendance)

  // Pinned (rows, fold) per table at seed 42 / scale 0.1.
  private val golden: Map[String, (Long, Long)] = Map(
    "members" -> (750L, 4366992930777467979L),
    "book_titles" -> (900L, 2827936492370824069L),
    "book_copies" -> (4500L, 9215541034761020562L),
    "suppliers" -> (15L, 5175765116844605340L),
    "discounts" -> (64L, 8079657044170114422L),
    "borrowed_books" -> (187812L, 6654466630799458048L),
    "sales_orders" -> (55010L, 3911151179597908685L),
    "sales_details" -> (192136L, 1088747127500659949L),
    "purchase_orders" -> (480L, 4380450184492052340L),
    "purchase_details" -> (4053L, 665529391782313319L),
    "fines" -> (23571L, 2740951290576899072L),
    "payments" -> (3774L, 6957998018979465033L),
    "staff" -> (11L, 9029419201647485206L),
    "shifts" -> (11L, 8336643916999911447L),
    "shift_schedules" -> (57387L, 5033395361595882339L),
    "staff_attendance" -> (57387L, 2211345602456637962L))

  // Downstream of the generators: trigger derivations + star-schema load.
  // Surrogate keys are dense row_numbers over ordered natural keys and
  // every draw is (seed, id)-pure, so these layers pin too — locking the
  // full LibraryGen → Derivations → InitialLoad pipeline, not just its
  // inputs.
  private lazy val derived = graft.etl.Derivations.applyAll(oltp, asOf = "2024-06-30")
  private lazy val dw      = graft.etl.InitialLoad(spark, derived)

  private lazy val dwTables: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
    "derived_members"     -> derived.members,
    "derived_book_copies" -> derived.bookCopies,
    "derived_fines"       -> derived.fines,
    "derived_payments"    -> derived.payments,
    "dim_date"            -> dw.dimDate,
    "dim_members"         -> dw.dimMembers,
    "dim_book"            -> dw.dimBook,
    "dim_suppliers"       -> dw.dimSuppliers,
    "fact_sales"          -> dw.factSales,
    "fact_borrowing"      -> dw.factBorrowing,
    "fact_purchase"       -> dw.factPurchase)

  private val goldenDw: Map[String, (Long, Long)] = Map(
    "derived_members" -> (750L, 7466030662800470235L),
    "derived_book_copies" -> (4500L, 2533519492326566926L),
    "derived_fines" -> (23571L, 3916086392707339350L),
    "derived_payments" -> (3774L, 5896230748121794618L),
    "dim_date" -> (8036L, 2026390445546341785L),
    "dim_members" -> (750L, 7473890168493614967L),
    "dim_book" -> (900L, 8446852479077468569L),
    "dim_suppliers" -> (15L, 7975187859828683310L),
    "fact_sales" -> (192136L, 1928033623469699822L),
    "fact_borrowing" -> (187807L, 8015692544924351232L),
    "fact_purchase" -> (4053L, 899364023549699429L))

  test("seed 42 at scale 0.1 reproduces the pinned content hashes") {
    val actual = tables.map { case (name, df) => name -> Fingerprint.tableHash(df) }
    if (sys.props.get("graft.golden.print").contains("true") || golden.isEmpty
        || actual.exists { case (n, g) => golden.get(n) != Some(g) }) {
      actual.foreach { case (name, (n, fold)) =>
        info(s""""$name" -> (${n}L, ${fold}L),""")
      }
    }
    assert(golden.nonEmpty, "golden map is unpinned — run with -Dgraft.golden.print=true and pin")
    actual.foreach { case (name, got) =>
      assert(golden(name) == got,
        s"$name content drifted: expected ${golden(name)}, got $got — " +
          "generator output changed; re-pin only if the change is intentional")
    }
  }

  test("derivations + star-schema load reproduce the pinned content hashes") {
    val actual = dwTables.map { case (name, df) => name -> Fingerprint.tableHash(df) }
    if (sys.props.get("graft.golden.print").contains("true") || goldenDw.isEmpty
        || actual.exists { case (n, g) => goldenDw.get(n) != Some(g) }) {
      actual.foreach { case (name, (n, fold)) =>
        info(s""""$name" -> (${n}L, ${fold}L),""")
      }
    }
    assert(goldenDw.nonEmpty, "goldenDw map is unpinned — run with -Dgraft.golden.print=true and pin")
    actual.foreach { case (name, got) =>
      assert(goldenDw(name) == got,
        s"$name content drifted: expected ${goldenDw(name)}, got $got — " +
          "pipeline output changed; re-pin only if the change is intentional")
    }
  }
}
