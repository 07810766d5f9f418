package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** DimDate builder — the date-spine dimension with derived calendar
  * attributes and a holiday calendar.
  *
  * Reference: /root/reference/05_InitialLoading.sql:157-203 builds DimDate
  * with a PL/SQL `CONNECT BY LEVEL` loop inserting one row at a time, plus
  * a HOLIDAY_LIST temp table (:76-152). Here the spine is a single
  * `sequence()` + explode projection — fully set-based, codegen'd, no
  * driver loop — and holidays are a broadcast lookup join.
  */
object DimDate {

  /** Fixed-date holidays (month, day, name) — the reproducible subset of
    * the reference's HOLIDAY_LIST (05_InitialLoading.sql:80-88). Moving
    * holidays (Easter etc., :89-110) are a driver-side generator feeding
    * the same lookup join; omitted here for determinism across engines. */
  val FixedHolidays: Seq[(Int, Int, String)] = Seq(
    (1, 1, "New Year"),
    (7, 4, "Independence Day"),
    (12, 25, "Christmas")
  )

  def build(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    import spark.implicits._
    val spine = spark.sql(
      s"SELECT explode(sequence(DATE'$startDate', DATE'$endDate', interval 1 day)) AS cal_date")

    val holidays = FixedHolidays
      .toDF("h_month", "h_day", "holiday_name")

    spine
      .join(
        broadcast(holidays),
        month(col("cal_date")) === col("h_month") && dayofmonth(col("cal_date")) === col("h_day"),
        "left_outer")
      .select(
        // surrogate key = yyyymmdd, stable and join-friendly (no sequence)
        (year(col("cal_date")) * 10000 + month(col("cal_date")) * 100 + dayofmonth(col("cal_date")))
          .cast("long").as("date_key"),
        col("cal_date"),
        year(col("cal_date")).cast("long").as("cal_year"),
        quarter(col("cal_date")).cast("long").as("cal_quarter"),
        month(col("cal_date")).cast("long").as("cal_month"),
        dayofmonth(col("cal_date")).cast("long").as("cal_dom"),
        dayofyear(col("cal_date")).cast("long").as("cal_doy"),
        (weekday(col("cal_date")) + 1).cast("long").as("iso_dow"),
        date_format(col("cal_date"), "MMMM").as("month_name"),
        // weekday indicator: reference treats Oracle D∈2..6 as weekdays
        // (05_InitialLoading.sql:188, Sunday=1 locale) == ISO dow 1..5
        when(weekday(col("cal_date")) < 5, "Y").otherwise("N").as("is_weekday"),
        when(col("holiday_name").isNotNull, "Y").otherwise("N").as("is_holiday"),
        coalesce(col("holiday_name"), lit("-")).as("holiday_name"),
        date_trunc("month", col("cal_date")).cast("date").as("month_start"),
        last_day(col("cal_date")).as("month_end")
      )
  }
}
