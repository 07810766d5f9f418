package graft.etl

import graft.SparkSuite
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSuite {
  import spark.implicits._

  private def dim0 = Scd2.initial(
    Seq((1L, "alice", "GOLD"), (2L, "bob", "SILVER"), (3L, "carol", "GOLD"))
      .toDF("id", "name", "tier"),
    "2020-01-01")

  test("scd2 closes old version and opens new on attribute change") {
    val changes = Seq((1L, "PLATINUM")).toDF("id", "tier")
    val out = Scd2.apply(dim0, changes, Seq("id"), Seq("tier"), "2021-06-01").cache()

    assert(out.count() == 4) // 2 untouched + 1 closed + 1 opened
    val v1 = out.filter($"id" === 1 && $"curr_ind" === "N").collect()
    assert(v1.length == 1)
    assert(v1.head.getAs[java.sql.Date]("expiration_date").toString == "2021-05-31")
    assert(v1.head.getAs[String]("tier") == "GOLD")
    val v2 = out.filter($"id" === 1 && $"curr_ind" === "Y").collect()
    assert(v2.length == 1)
    assert(v2.head.getAs[String]("tier") == "PLATINUM")
    assert(v2.head.getAs[java.sql.Date]("effective_date").toString == "2021-06-01")
  }

  test("scd2 no-ops when tracked attributes are unchanged") {
    val changes = Seq((3L, "GOLD")).toDF("id", "tier")
    val out = Scd2.apply(dim0, changes, Seq("id"), Seq("tier"), "2021-06-01")
    assert(out.count() == 3)
    assert(out.filter($"curr_ind" === "N").count() == 0)
  }

  test("scd2 preserves one-current-row-per-key across two generations") {
    val g1 = Scd2.apply(dim0, Seq((1L, "PLATINUM")).toDF("id", "tier"), Seq("id"), Seq("tier"), "2021-06-01")
    val g2 = Scd2.apply(g1, Seq((1L, "IRIDIUM"), (2L, "GOLD")).toDF("id", "tier"), Seq("id"), Seq("tier"), "2022-01-01")
    val perKey = g2.groupBy("id")
      .agg(sum(when($"curr_ind" === "Y", 1).otherwise(0)).as("n_curr"))
      .collect()
    assert(perKey.forall(_.getAs[Long]("n_curr") == 1))
    assert(g2.count() == 6) // 3 keys: id1 has 3 versions, id2 has 2, id3 has 1
    // version ranges never overlap: each next effective = prior expiration + 1
    val id1 = g2.filter($"id" === 1).orderBy("effective_date")
      .select("effective_date", "expiration_date").as[(java.sql.Date, java.sql.Date)].collect()
    id1.sliding(2).foreach { case Array((_, exp), (eff, _)) =>
      assert(exp.toLocalDate.plusDays(1) == eff.toLocalDate)
    }
  }
}
