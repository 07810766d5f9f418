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
    * the reference's HOLIDAY_LIST (05_InitialLoading.sql:80-88). */
  val FixedHolidays: Seq[(Int, Int, String)] = Seq(
    (1, 1, "New Year"),
    (7, 4, "Independence Day"),
    (12, 25, "Christmas")
  )

  /** Moving holidays (ref get_moving_holiday, 05_InitialLoading.sql:89-110)
    * — the reference approximates each lunar/solar festival as pure year
    * arithmetic, which makes the whole calendar deterministic and
    * set-based. A holiday "of year y" can land in y+1 (the Hari Raya
    * offsets exceed 365 for later years), so the year spine starts two
    * years before the date spine and the lookup joins on the exact date. */
  def movingHolidays(spark: SparkSession, yearFrom: Int, yearTo: Int): DataFrame = {
    val years = spark.sql(s"SELECT explode(sequence($yearFrom, $yearTo)) AS y")
    def d(base: (Int, Int), offsetDays: org.apache.spark.sql.Column, name: String) =
      years.select(
        date_add(make_date(col("y"), lit(base._1), lit(base._2)), offsetDays.cast("int")).as("h_date"),
        lit(name).as("holiday_name"))
    d((1, 1), lit(354) + (col("y") - 2000) * 11, "Hari Raya Puasa")
      .unionByName(d((1, 1), lit(280) + (col("y") - 2000) * 11, "Hari Raya Haji"))
      .unionByName(d((1, 21), floor(pmod((col("y") - 1900) * 5 + 4, lit(60)) * 0.48), "Chinese New Year"))
      .unionByName(d((10, 15), pmod(col("y"), lit(19)) * 11, "Deepavali"))
      .unionByName(d((5, 1), pmod(col("y"), lit(19)) * 11, "Wesak"))
  }

  def build(spark: SparkSession, startDate: String, endDate: String): DataFrame = {
    import spark.implicits._
    val spine = spark.sql(
      s"SELECT explode(sequence(DATE'$startDate', DATE'$endDate', interval 1 day)) AS cal_date")

    val yearFrom = startDate.take(4).toInt - 2
    val yearTo   = endDate.take(4).toInt
    val fixed = FixedHolidays.toDF("h_month", "h_day", "holiday_name")
      .crossJoin(spark.sql(s"SELECT explode(sequence($yearFrom, $yearTo)) AS y"))
      .select(make_date(col("y"), col("h_month"), col("h_day")).as("h_date"), col("holiday_name"))
    // one name per date (deterministic pick if festivals ever collide)
    val holidays = fixed.unionByName(movingHolidays(spark, yearFrom, yearTo))
      .groupBy("h_date").agg(min(col("holiday_name")).as("holiday_name"))

    spine
      .join(broadcast(holidays), col("cal_date") === col("h_date"), "left_outer")
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
