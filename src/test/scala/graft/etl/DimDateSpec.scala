package graft.etl

import graft.SparkSuite
import org.apache.spark.sql.functions._

class DimDateSpec extends SparkSuite {
  import spark.implicits._

  lazy val dd = DimDate.build(spark, "1995-01-01", "1995-12-31").cache()

  test("spine is dense and keyed yyyymmdd") {
    assert(dd.count() == 365)
    assert(dd.select(countDistinct($"date_key")).first().getLong(0) == 365)
    val jan1 = dd.filter($"cal_date" === "1995-01-01").first()
    assert(jan1.getAs[Long]("date_key") == 19950101L)
    assert(jan1.getAs[String]("holiday_name") == "New Year")
    assert(jan1.getAs[String]("is_holiday") == "Y")
  }

  test("weekday flag follows ISO dow 1..5") {
    // 1995-01-01 was a Sunday (iso_dow 7), 1995-01-02 a Monday (1)
    assert(dd.filter($"cal_date" === "1995-01-01").first().getAs[String]("is_weekday") == "N")
    assert(dd.filter($"cal_date" === "1995-01-02").first().getAs[String]("is_weekday") == "Y")
    val byDow = dd.groupBy("iso_dow").count().orderBy("iso_dow").as[(Long, Long)].collect()
    assert(byDow.map(_._1).toSeq == (1L to 7L))
  }

  test("fixed and moving holidays are flagged, nothing else carries a name") {
    val named = dd.filter($"is_holiday" === "Y")
      .select("cal_date", "holiday_name").as[(java.sql.Date, String)].collect().toMap
      .map { case (d, n) => d.toString -> n }
    // the three fixed dates
    assert(named("1995-01-01") == "New Year")
    assert(named("1995-07-04") == "Independence Day")
    assert(named("1995-12-25") == "Christmas")
    // moving holidays (ref get_moving_holiday arithmetic):
    // Wesak 1995 = May 1 + (1995 % 19) * 11 = 1995-05-01, but Deepavali
    // computed for 1994 (Oct 15 + 18*11 days) lands on the same date and
    // the dedup picks the alphabetically-first name
    assert(named("1995-05-01") == "Deepavali")
    // Deepavali 1995 = Oct 15 + 0 = 1995-10-15
    assert(named("1995-10-15") == "Deepavali")
    // CNY 1995 = Jan 21 + floor((95*5+4) % 60 * 0.48) = Jan 21 + frac of 59*0.48=28 → 1995-02-18
    assert(named("1995-02-18") == "Chinese New Year")
    // Hari Raya Puasa computed FOR 1994 lands in 1995: Jan 1 1994 + 354 - 66 = +288 → 1994-10-16 (not in spine);
    // for 1995: Jan 1 1995 + 354 - 55 = +299 → 1995-10-27
    assert(named("1995-10-27") == "Hari Raya Puasa")
    assert(dd.filter($"is_holiday" === "N").filter($"holiday_name" =!= "-").count() == 0)
  }
}
