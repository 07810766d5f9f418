package graft.queries

import graft.SparkSuite
import graft.etl.Derivations
import graft.gen.LibraryTables

/** Golden-pin for the RENDERED Q4/Q5 library reports at seed 42 / scale
  * 0.1 — the report-layer counterpart of LibraryGoldenHashSpec's data
  * pins: the generators' content is hash-locked, so the exact rendered
  * bytes (BREAK groups, COMPUTE subtotals, column widths, %.2f
  * formatting) are deterministic too, and a regression in either the
  * report queries or the renderer shows up as a pin diff. Every numeric
  * column in Q4/Q5 is decimal- or integer-derived (long/long divisions,
  * decimal sums), so no float nondeterminism can reach the bytes.
  *
  * On an INTENTIONAL report change, re-pin with
  * -Dgraft.golden.print=true and copy the printed values.
  */
class LibraryReportGoldenSpec extends SparkSuite {

  private lazy val oltp    = LibraryTables.generate(spark, scale = 0.1, seed = 42)
  private lazy val derived = Derivations.applyAll(oltp, asOf = "2024-06-30")

  private lazy val rendered: Seq[(String, String)] = Seq(
    "q4_fine_revenue" -> ReportRenderer.render(
      LibraryReports.q4FineRevenue(derived.fines, derived.payments),
      title = "Fine Revenue & Collection by Year and Type",
      breakCol = "cal_year",
      computeCols = Seq("billed", "collected")),
    "q5_staff_utilization" -> ReportRenderer.render(
      LibraryReports.q5StaffUtilization(oltp.staff, oltp.shiftSchedules, derived.staffAttendance),
      title = "Staffing Utilization by Role and Year",
      breakCol = "staff_role",
      computeCols = Seq("n_shifts", "worked_hours")))

  // Pinned (lineCount, md5) of each rendered report at seed 42 / scale 0.1.
  private val golden: Map[String, (Int, String)] = Map(
    "q4_fine_revenue" -> (84, "3278ca88dbff8b6f59a6b5579d5fb8a7"),
    "q5_staff_utilization" -> (114, "033e332adc54f192573018e1a60c6e29"))

  test("rendered Q4/Q5 report bytes match the seed-42 golden pins") {
    if (sys.props.get("graft.golden.print").contains("true") || golden.isEmpty) {
      rendered.foreach { case (name, text) =>
        val md5 = java.security.MessageDigest.getInstance("MD5")
          .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
        println(s"""    "$name" -> (${text.linesIterator.length}, "$md5"),""")
      }
    }
    assert(golden.nonEmpty, "golden map is unpinned — run with -Dgraft.golden.print=true and pin")
    rendered.foreach { case (name, text) =>
      val md5 = java.security.MessageDigest.getInstance("MD5")
        .digest(text.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val (wantLines, wantMd5) = golden(name)
      assert(text.linesIterator.length == wantLines,
        s"$name: rendered ${text.linesIterator.length} lines, pinned $wantLines")
      assert(md5 == wantMd5, s"$name: rendered bytes diverged from the seed-42 pin ($md5)")
    }
  }

  test("rendered reports carry BREAK groups and COMPUTE subtotals") {
    val q4 = rendered.head._2
    // one subtotal line per year group, labelled like SQL*Plus COMPUTE
    assert("sum\\(\\d{4}\\)".r.findAllIn(q4).nonEmpty, "Q4 lost its COMPUTE subtotal lines")
    // BREAK: a repeated year prints blank after its first row
    val q5 = rendered(1)._2
    assert(q5.linesIterator.count(_.trim.startsWith("|")) > 10)
    assert("sum\\(".r.findAllIn(q5).size >= 3, "Q5 should subtotal every role group")
  }
}
