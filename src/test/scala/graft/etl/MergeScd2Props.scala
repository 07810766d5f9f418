package graft.etl

import graft.SparkSuite
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean
import org.apache.spark.sql.functions._

/** Property-based checks (SURVEY §5 rebuild plan item 2): the merge and
  * SCD2 invariants the reference enforces procedurally hold for arbitrary
  * inputs, not just the demo data. */
object MergeScd2Props extends Properties("graft.etl") {

  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  private val rowsGen: Gen[List[(Long, String)]] =
    Gen.listOfN(12, Gen.zip(Gen.choose(1L, 8L), Gen.oneOf("a", "b", "c")))
      .map(_.distinctBy(_._1)) // one row per key

  property("insertMissing is idempotent and key-preserving") = Prop.forAll(rowsGen, rowsGen) { (ex, in) =>
    val existing = ex.toDF("k", "v")
    val incoming = in.toDF("k", "v")
    val once  = MergeUpsert.insertMissing(existing, incoming, Seq("k"))
    val twice = MergeUpsert.insertMissing(once, incoming, Seq("k"))
    val keys  = once.select("k").as[Long].collect().toSet
    keys == (ex.map(_._1).toSet ++ in.map(_._1).toSet) &&
      twice.count() == once.count() &&
      once.groupBy("k").count().filter(col("count") > 1).count() == 0
  }

  property("upsert: incoming wins, union of keys, no duplicates") = Prop.forAll(rowsGen, rowsGen) { (ex, in) =>
    val out = MergeUpsert.upsert(ex.toDF("k", "v"), in.toDF("k", "v"), Seq("k"))
      .as[(Long, String)].collect().toMap
    val expected = ex.toMap ++ in.toMap
    out == expected
  }

  property("scd2 invariants hold for arbitrary change sets") = Prop.forAll(rowsGen, rowsGen) { (init, chg) =>
    (init.nonEmpty && chg.nonEmpty) ==> {
      val dim = Scd2.initial(init.toDF("k", "v"), "2020-01-01")
      val out = Scd2.apply(dim, chg.filter(c => init.exists(_._1 == c._1)).toDF("k", "v"),
        Seq("k"), Seq("v"), "2021-06-01")
      // exactly one current row per key; ranges don't overlap
      val oneCurrent = out.groupBy("k")
        .agg(sum(when(col("curr_ind") === "Y", 1).otherwise(0)).as("n"))
        .filter(col("n") =!= 1).count() == 0
      val noOverlap = out.as("a").join(out.as("b"),
        col("a.k") === col("b.k") && col("a.effective_date") < col("b.effective_date")
          && col("a.expiration_date") >= col("b.effective_date")).count() == 0
      oneCurrent && noOverlap
    }
  }
}
