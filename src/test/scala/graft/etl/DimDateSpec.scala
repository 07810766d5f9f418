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

  test("exactly the three fixed holidays are flagged") {
    assert(dd.filter($"is_holiday" === "Y").count() == 3)
    assert(dd.filter($"is_holiday" === "N").filter($"holiday_name" =!= "-").count() == 0)
  }
}
