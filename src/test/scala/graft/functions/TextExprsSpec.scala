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

  test("winnow_fps_words matches the composed transform/md5/window-min/distinct form") {
    withFns {
      // includes: repeated words (duplicate minima to collapse), a null
      // word (concat_ws skip), multi-byte UTF-8, and docs on both sides
      // of the size(hs) >= w gate
      val docs = Seq(
        Seq("the", "quick", "brown", "fox", "jumps", "over", "the", "lazy",
          "dog", "and", "the", "quick", "brown", "fox", "jumps", "again"),
        Seq("a", "b", "c", "d", "e", "f", "g", "h", "i", "j", "k", "a", "b",
          "c", "d", "e", "f", "g", "h", "i", "j", "k"),
        Seq("naïve", "café", "über", "straße", "naïve", "café", "über",
          "straße", "naïve", "café", "über", "straße"),
        Seq("x", null, "y", "z", "w", "v", "u", "t", "s", "r", "q", "p"),
        Seq("too", "short"), // nh = 1 < w -> null -> no rows
        (1 to 40).map(i => s"w${i % 9}"))
      val df = docs.zipWithIndex.map { case (ws, i) => (i.toLong, ws) }.toDF("id", "ws")
      val composed = df
        .selectExpr("id",
          "transform(sequence(1, greatest(size(ws) - 7, 1)), i -> md5(concat_ws(' ', slice(ws, i, 8)))) AS hs")
        .filter("size(hs) >= 4")
        .selectExpr("id",
          "array_distinct(transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4)))) AS fps")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      val native = df
        .selectExpr("id", "winnow_fps_words(ws, 8, 4) AS fps")
        .filter("fps IS NOT NULL")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      assert(native.toSeq == composed.toSeq)
    }
  }

  test("winnow_fps_chars matches the composed substring/md5/window-min/distinct form") {
    withFns {
      val texts = Seq(
        "the quick brown fox jumps over the lazy dog the quick brown fox",
        "aaaaaaaaaaaaaaaaaaaaaaaa", // all-identical grams: one fingerprint
        "naïve café über straße — naïve café über straße", // multi-byte
        "0123456789ab", // 12 chars: nh = 5 windows
        "short", // below k + w - 1 -> null
        ("x" * 7) + "abcdefghijklmnopqrstuvwxyz")
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      val composed = df
        .filter(length(col("text")) >= 11)
        .selectExpr("id",
          "transform(sequence(1, char_length(text) - 7), i -> md5(substring(text, i, 8))) AS hs")
        .filter("size(hs) >= 4")
        .selectExpr("id",
          "array_distinct(transform(sequence(1, size(hs) - 3), j -> array_min(slice(hs, j, 4)))) AS fps")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      val native = df
        .filter(length(col("text")) >= 11)
        .selectExpr("id", "winnow_fps_chars(text, 8, 4) AS fps")
        .filter("fps IS NOT NULL")
        .orderBy("id").collect().map(r => (r.getLong(0), r.getSeq[String](1)))
      assert(native.toSeq == composed.toSeq)
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
