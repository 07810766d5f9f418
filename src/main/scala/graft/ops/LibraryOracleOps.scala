package graft.ops

import graft.etl.Derivations
import graft.gen.LibraryTables
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-oracle coverage for the LIBRARY domain — closes the gap
  * where Q4/Q5 library reports and the 16 generators were pinned only
  * by golden hashes and never cross-checked by the DuckDB harness
  * (which by construction sees parquet files, not in-memory frames).
  *
  * The trick: the generated dataset is a pure function of (seed=42,
  * scale=0.1) — see gen/LibraryGen.scala's per-(seed,key) draws — so
  * each op PERSISTS the exact frames its report consumes to a fixed
  * parquet path inside the repo and the oracle SQL reads them back
  * with read_parquet(). The driver's execution order guarantees the
  * files exist before DuckDB runs: Verify materializes every query
  * (writing these side outputs) before the compare phase starts. From
  * then on the reports are rows+schema+hash-checked exactly like the
  * testdata queries.
  *
  * The reports themselves live in queries/LibraryReports.scala (one
  * (role|type, year)-grain shuffle each, dims broadcast); reference
  * anchors: 08_InsertFines.sql inspection queries (Q4),
  * 03_InsertStaffShift.sql + trg_auto_mark_late statuses (Q5).
  */
object LibraryOracleOps {

  /** Fixed location the oracle SQL references; inside the repo so no
    * foreign path is ever touched, deterministic at any launch cwd. */
  val DataDir = "/root/repo/target/librarydata"

  // generated once per JVM (the frames are deterministic; the golden
  // specs pin their content), shared by both ops and both Bench repeats
  private val derivedCache =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, LibraryTables]()

  private def derived(spark: SparkSession): LibraryTables =
    derivedCache.computeIfAbsent(
      spark,
      s => Derivations.applyAll(LibraryTables.generate(s, scale = 0.1, seed = 42), asOf = "2024-06-30"))

  private def persist(name: String, df: DataFrame): DataFrame = {
    df.coalesce(1).write.mode("overwrite").parquet(s"$DataDir/$name.parquet")
    df.sparkSession.read.parquet(s"$DataDir/$name.parquet")
  }

  val ops: Seq[OpQuery] = Seq(
    // ── lib_q4_fine_revenue: fines→payments revenue/collection report
    // over the seed-42 generated library (fine typing, trigger-derived
    // amounts and Paid statuses all upstream in etl/Derivations). Both
    // engines read the SAME persisted parquet, so the full generator +
    // derivation stack is hash-verified, not just golden-pinned.
    OpQuery.checked(
      "lib_q4_fine_revenue",
      s"""WITH f AS (SELECT * FROM read_parquet('$DataDir/fines.parquet/*.parquet')),
         |p AS (SELECT payment_id, payment_date
         |      FROM read_parquet('$DataDir/payments.parquet/*.parquet')),
         |j AS (SELECT f.fine_date, f.fine_type, f.fine_amount, f.fine_status,
         |             p.payment_date
         |      FROM f LEFT JOIN p ON p.payment_id = f.payment_id
         |      WHERE year(f.fine_date) BETWEEN 2005 AND 2024)
         |SELECT CAST(year(fine_date) AS BIGINT) AS cal_year, fine_type,
         |       CAST(count(*) AS BIGINT) AS n_fines,
         |       CAST(sum(fine_amount) AS DOUBLE) AS billed,
         |       CAST(sum(CASE WHEN fine_status = 'Paid' THEN fine_amount ELSE 0 END) AS DOUBLE)
         |         AS collected,
         |       CAST(sum(CASE WHEN fine_status = 'Paid' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS collection_rate,
         |       CAST(sum(CASE WHEN payment_date IS NOT NULL
         |                     THEN date_diff('day', fine_date, payment_date) END) AS DOUBLE)
         |         / nullif(sum(CASE WHEN payment_date IS NOT NULL THEN 1 ELSE 0 END), 0)
         |         AS avg_days_to_pay
         |FROM j GROUP BY 1, 2""".stripMargin
    ) { (spark, _) =>
      val t = derived(spark)
      graft.queries.LibraryReports.q4FineRevenue(
        persist("fines", t.fines), persist("payments", t.payments))
    },

    // ── lib_q5_staff_util: staffing utilization per (role, year) with
    // the trigger-derived Late/Absent statuses and the reference's
    // truncated-hour arithmetic ((end−start) µs div 3600000000 — both
    // engines floor the positive quotient identically).
    OpQuery.checked(
      "lib_q5_staff_util",
      s"""WITH a AS (SELECT * FROM read_parquet('$DataDir/staff_attendance.parquet/*.parquet')),
         |s AS (SELECT schedule_id, staff_id, shift_date
         |      FROM read_parquet('$DataDir/shift_schedules.parquet/*.parquet')),
         |st AS (SELECT staff_id, staff_role
         |       FROM read_parquet('$DataDir/staff.parquet/*.parquet'))
         |SELECT st.staff_role, CAST(year(s.shift_date) AS BIGINT) AS cal_year,
         |       CAST(count(*) AS BIGINT) AS n_shifts,
         |       CAST(sum(CASE WHEN a.attendance_status = 'Absent' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS absence_rate,
         |       CAST(sum(CASE WHEN a.attendance_status = 'Late' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS late_rate,
         |       CAST(sum(CASE WHEN a.actual_end_time IS NOT NULL
         |                     THEN (epoch_us(a.actual_end_time) - epoch_us(a.actual_start_time))
         |                          // 3600000000
         |                     ELSE 0 END) AS BIGINT) AS worked_hours
         |FROM a
         |JOIN s ON s.schedule_id = a.schedule_id
         |JOIN st ON st.staff_id = s.staff_id
         |GROUP BY 1, 2""".stripMargin
    ) { (spark, _) =>
      val t = derived(spark)
      graft.queries.LibraryReports.q5StaffUtilization(
        persist("staff", t.staff),
        persist("shift_schedules", t.shiftSchedules),
        persist("staff_attendance", t.staffAttendance))
    }
  )
}
