package graft

import graft.etl.{Derivations, InitialLoad}
import graft.gen.LibraryTables
import graft.queries.LibraryReports
import org.apache.spark.sql.SparkSession

/** Runnable end-to-end demo of the library-domain pipeline:
  * generate OLTP → apply trigger derivations → star-schema load →
  * print the three OLAP reports.
  *
  * Usage: runMain graft.LibraryDemo [scale]   (1.0 = reference volumes)
  */
object LibraryDemo {
  def main(args: Array[String]): Unit = {
    val scale = args.headOption.map(_.toDouble).getOrElse(0.1)
    val cpus  = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-library-demo")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val oltp    = LibraryTables.generate(spark, scale)
    val derived = Derivations.applyAll(oltp, asOf = "2024-06-30")
    val dw      = InitialLoad(spark, derived)

    println(s"=== OLTP volumes (scale $scale) ===")
    Seq(
      "members" -> oltp.members, "bookTitles" -> oltp.bookTitles,
      "bookCopies" -> oltp.bookCopies, "borrowedBooks" -> oltp.borrowedBooks,
      "salesOrders" -> oltp.salesOrders, "salesDetails" -> oltp.salesDetails,
      "purchaseOrders" -> oltp.purchaseOrders, "purchaseDetails" -> oltp.purchaseDetails,
      "fines" -> oltp.fines, "payments" -> oltp.payments,
      "shiftSchedules" -> oltp.shiftSchedules, "staffAttendance" -> oltp.staffAttendance
    ).foreach { case (n, df) => println(f"  $n%-16s ${df.count()}%,10d rows") }

    println("=== Fines → payments (trigger derivations) ===")
    derived.fines.groupBy("fine_type", "fine_status").count()
      .orderBy("fine_type", "fine_status").show(10, truncate = false)
    println("=== Staff weekly hours (trg_check_weekly_hours) ===")
    Derivations.weeklyHours(derived.staffAttendance, oltp.shiftSchedules)
      .groupBy("over_limit").count().orderBy("over_limit").show()

    println("=== DW volumes ===")
    Seq(
      "dimDate" -> dw.dimDate, "dimMembers" -> dw.dimMembers, "dimBook" -> dw.dimBook,
      "factSales" -> dw.factSales, "factBorrowing" -> dw.factBorrowing,
      "factPurchase" -> dw.factPurchase
    ).foreach { case (n, df) => println(f"  $n%-16s ${df.count()}%,10d rows") }

    val p = LibraryReports.Params(yearFrom = 2005, yearTo = 2008, topN = 3)
    println("=== Q1: quarterly genre sales (top 3 per year, YoY) ===")
    LibraryReports.q1GenreSales(dw, p).show(12, truncate = false)
    println("=== Q2: purchase spend by primary genre (QoQ, densified) ===")
    LibraryReports.q2PurchaseSpend(dw, p).show(12, truncate = false)
    println("=== Q3: gross margin by member state (signals) ===")
    LibraryReports.q3GrossMargin(dw, p).show(12, truncate = false)
    println("=== Q4: fine revenue and collection by type ===")
    LibraryReports.q4FineRevenue(derived.fines, derived.payments, p).show(12, truncate = false)
    println("=== Q5: staffing utilization by role ===")
    LibraryReports.q5StaffUtilization(oltp.staff, oltp.shiftSchedules, derived.staffAttendance)
      .show(12, truncate = false)

    spark.stop()
  }
}
