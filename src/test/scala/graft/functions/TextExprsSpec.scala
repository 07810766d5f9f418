package graft.functions

import graft.SparkSuite
import org.apache.spark.sql.functions._

/** Edge-case hardening for the native text expressions: null array
  * elements must be skipped (not NPE), inputs are type-checked, and
  * listagg_sorted follows SQL LISTAGG null semantics. */
class TextExprsSpec extends SparkSuite {
  import spark.implicits._

  private def withFns[A](f: => A): A = { TextExprs.register(spark); ListAggSorted.register(spark); f }

  test("null array elements are skipped by all four hash expressions") {
    withFns {
      val df = Seq(Tuple1(Seq[String]("abc", null, "def"))).toDF("arr")
      val out = df.selectExpr(
        "minhash_sig(arr) AS sig",
        "simhash64(arr) AS sh",
        "min_md5_salted(arr, 's1') AS mn",
        "max_md5_salted(arr, 's1') AS mx")
        .collect().head
      // same values as the null-free array — null elements contribute nothing
      val ref = Seq(Tuple1(Seq("abc", "def"))).toDF("arr").selectExpr(
        "minhash_sig(arr)", "simhash64(arr)",
        "min_md5_salted(arr, 's1')", "max_md5_salted(arr, 's1')")
        .collect().head
      assert(out.getSeq[Long](0) == ref.getSeq[Long](0))
      assert(out.getLong(1) == ref.getLong(1))
      assert(out.getString(2) == ref.getString(2))
      assert(out.getString(3) == ref.getString(3))
    }
  }

  test("non-array input fails analysis instead of crashing at runtime") {
    withFns {
      val err = intercept[Exception] {
        Seq(Tuple1("not an array")).toDF("s").selectExpr("minhash_sig(s)").collect()
      }
      assert(err.getMessage.toLowerCase.contains("array"))
    }
  }

  test("listagg_sorted returns NULL (not '') for all-null groups, like SQL LISTAGG") {
    withFns {
      val df = Seq(("g1", Option("b")), ("g1", Option("a")), ("g2", Option.empty[String]))
        .toDF("g", "v")
      val rows = df.groupBy("g").agg(expr("listagg_sorted(v, ',')").as("agg"))
        .orderBy("g").collect()
      assert(rows(0).getString(1) == "a,b")
      assert(rows(1).isNullAt(1))
    }
  }
}
