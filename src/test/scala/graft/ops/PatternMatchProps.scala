package graft.ops

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Randomized semantics checks for the MATCH_RECOGNIZE analog: the
  * distributed collect_list → array_sort → regex pipeline must agree
  * with a driver-side reference implementation (plain Scala sort +
  * java.util.regex) on arbitrary event streams and patterns.
  */
object PatternMatchProps extends Properties("graft.ops.patternmatch") {

  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  // a handful of funnel-ish patterns with distinct shapes — half without
  // a capture group, because the engine counts whole matches (group 0)
  // and must accept a genuinely plain regex
  private val patterns = Seq("(vc*p)", "(vp)", "(oo+p)", "(v[cp]*o)", "(p+)",
    "vc*p", "oo+p", "v[cp]*o", "p+", "vp?o")

  private val streamGen: Gen[(List[(Long, Long, String)], String)] = for {
    n   <- Gen.choose(1, 60)
    pat <- Gen.oneOf(patterns)
    es  <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 3L)
      t <- Gen.choose(0L, 20L)
      s <- Gen.oneOf("v", "c", "p", "o")
    } yield (u, t, s))
  } yield (es, pat)

  property("distributed pattern counts equal the single-threaded reference") =
    Prop.forAll(streamGen) { case (es, pat) =>
      es.nonEmpty ==> {
        // unique event ids make the (ts, event_id) order total in both paths
        val rows = es.zipWithIndex.map { case ((u, t, s), i) => (u, t, i.toLong, s) }
        val df = rows.toDF("user_id", "ts", "event_id", "sym")
        val got = PatternMatch.count(df, "user_id", Seq("ts", "event_id"), col("sym"), pat)
          .select("user_id", "seq_len", "n_matches")
          .as[(Long, Long, Long)].collect()
          .map { case (u, l, m) => u -> ((l, m)) }.toMap

        val want = rows.groupBy(_._1).map { case (u, rs) =>
          val seq = rs.sortBy(r => (r._2, r._3)).map(_._4).mkString
          u -> ((seq.length.toLong, pat.r.findAllIn(seq).length.toLong))
        }
        (got == want) :| s"pattern=$pat got=$got want=$want"
      }
    }

  property("distributed ALL ROWS PER MATCH output equals the single-threaded reference") =
    Prop.forAll(streamGen) { case (es, pat) =>
      es.nonEmpty ==> {
        val rows = es.zipWithIndex.map { case ((u, t, s), i) => (u, t, i.toLong, s) }
        val df = rows.toDF("user_id", "ts", "event_id", "sym")
        val got = PatternMatch.allRows(df, "user_id", Seq("ts", "event_id"), col("sym"), pat)
          .select("user_id", "match_no", "seq_idx", "event_id")
          .as[(Long, Long, Long, Long)].collect().toSet

        // reference: java.util.regex match spans over the sorted trace,
        // mapped back to the event at each consumed position
        val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
          val sorted = rs.sortBy(r => (r._2, r._3))
          val seq = sorted.map(_._4).mkString
          pat.r.findAllMatchIn(seq).toList.zipWithIndex.flatMap { case (m, i) =>
            (m.start until m.end).map(idx =>
              (u, (i + 1).toLong, (idx + 1).toLong, sorted(idx)._3))
          }
        }.toSet
        (got == want) :| s"pattern=$pat got=${got.size} rows want=${want.size} rows"
      }
    }

  property("distributed per-match MEASURES rows equal the single-threaded reference") =
    Prop.forAll(streamGen) { case (es, pat) =>
      es.nonEmpty ==> {
        val rows = es.zipWithIndex.map { case ((u, t, s), i) => (u, t, i.toLong, s) }
        val df = rows.toDF("user_id", "ts", "event_id", "sym")
        val got = PatternMatch.measures(df, "user_id", Seq("ts", "event_id"), col("sym"), pat)
          .select("user_id", "match_no", "matched", "match_len")
          .as[(Long, Long, String, Long)].collect().toSet

        val want = rows.groupBy(_._1).flatMap { case (u, rs) =>
          val seq = rs.sortBy(r => (r._2, r._3)).map(_._4).mkString
          pat.r.findAllIn(seq).toList.zipWithIndex.map { case (m, i) =>
            (u, (i + 1).toLong, m, m.length.toLong)
          }
        }.toSet
        (got == want) :| s"pattern=$pat got=$got want=$want"
      }
    }
}
