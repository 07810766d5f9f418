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

  test("scd2 correct splits the containing version and leaves later ones alone") {
    // id1 has versions [2020-01-01, 2021-05-31] 'N' + [2021-06-01, eot] 'Y'
    val g1 = Scd2.apply(dim0, Seq((1L, "PLATINUM")).toDF("id", "tier"), Seq("id"), Seq("tier"), "2021-06-01")
    val out = Scd2.correct(g1, Seq((1L, "SILVER")).toDF("id", "tier"),
      Seq("id"), Seq("tier"), "2020-09-01")
    val id1 = out.filter($"id" === 1).orderBy("effective_date")
      .select("tier", "effective_date", "expiration_date", "curr_ind")
      .collect().map(r => (r.getString(0), r.getDate(1).toString, r.getDate(2).toString, r.getString(3)))
    assert(id1.toSeq == Seq(
      ("GOLD", "2020-01-01", "2020-08-31", "N"),      // truncated original
      ("SILVER", "2020-09-01", "2021-05-31", "N"),    // corrected slice, inherits 'N'
      ("PLATINUM", "2021-06-01", "9999-12-31", "Y")), // later version untouched
      s"unexpected corrected history: ${id1.toSeq}")
    // interval contiguity survives the split
    id1.map(t => (t._2, t._3)).sliding(2).foreach { case Array((_, exp), (eff, _)) =>
      assert(java.time.LocalDate.parse(exp).plusDays(1) == java.time.LocalDate.parse(eff))
    }
    // untouched keys are bit-identical
    assert(out.filter($"id" =!= 1).exceptAll(g1.filter($"id" =!= 1)).isEmpty)
  }

  test("scd2 correct overwrites in place when the correction date IS the version start") {
    val out = Scd2.correct(dim0, Seq((2L, "BRONZE")).toDF("id", "tier"),
      Seq("id"), Seq("tier"), "2020-01-01")
    val id2 = out.filter($"id" === 2).collect()
    assert(id2.length == 1, "no empty left piece may be created")
    assert(id2.head.getAs[String]("tier") == "BRONZE")
    assert(id2.head.getAs[String]("curr_ind") == "Y")
    assert(id2.head.getAs[java.sql.Date]("effective_date").toString == "2020-01-01")
    // a correction to the already-recorded value is a no-op
    val noop = Scd2.correct(dim0, Seq((3L, "GOLD")).toDF("id", "tier"),
      Seq("id"), Seq("tier"), "2020-06-01")
    assert(noop.exceptAll(dim0).isEmpty && dim0.exceptAll(noop).isEmpty)
  }

  test("scd2 correct rejects two correction rows for one business key") {
    // duplicate keys in the corrections frame would fan out every
    // version of the key through the left join — the in-plan guard must
    // turn that into a loud failure, not duplicated history
    val dup = Seq((1L, "SILVER"), (1L, "BRONZE")).toDF("id", "tier")
    val corrected = Scd2.correct(dim0, dup, Seq("id"), Seq("tier"), "2020-09-01")
    val ex = intercept[Exception] { corrected.count() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(
      chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("exactly one row per business key"))),
      s"expected the duplicate-correction assert, got: $ex")
  }

  test("scd2 correct rejects null business keys in corrections") {
    // a null key would slip past the count join (null-unsafe equi-join)
    // without its own guard — it must fail loudly, not vanish
    val nullKey = Seq((Option.empty[Long], "SILVER")).toDF("id", "tier")
    val corrected = Scd2.correct(dim0, nullKey, Seq("id"), Seq("tier"), "2020-09-01")
    val ex = intercept[Exception] { corrected.count() }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(
      chain(ex).exists(t =>
        Option(t.getMessage).exists(_.contains("null business keys"))),
      s"expected the null-key assert, got: $ex")
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
