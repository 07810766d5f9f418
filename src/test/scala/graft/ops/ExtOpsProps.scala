package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Randomized semantics checks for the round-3 operators: the scalable
  * formulation (window-based as-of, decimal middle-sum median) must agree
  * with the naive reference formulation on arbitrary small inputs. */
object ExtOpsProps extends Properties("graft.ops.ext") {

  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  // (user, ts, isView) event streams: ts values are small ints
  private val eventsGen: Gen[List[(Long, Long, Boolean)]] = for {
    n  <- Gen.choose(1, 50)
    es <- Gen.listOfN(n, for {
      u <- Gen.choose(0L, 4L)
      t <- Gen.choose(0L, 30L)
      v <- Gen.oneOf(true, false)
    } yield (u, t, v))
  } yield es

  property("window as-of equals the naive latest-at-or-before pair scan") =
    Prop.forAll(eventsGen) { es =>
      es.nonEmpty ==> {
        // unique event ids give both formulations the same tie order
        val rows = es.zipWithIndex.map { case ((u, t, v), i) => (i.toLong, u, t, v) }
        val df = rows.toDF("event_id", "user_id", "ts", "is_view")
          .select(col("event_id"), col("user_id"), col("ts"),
            when(col("is_view"), col("ts")).as("view_ts"))
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val got = df.withColumn("asof", max(col("view_ts")).over(w))
          .filter(col("view_ts").isNull) // clicks
          .select("event_id", "asof")
          .as[(Long, Option[Long])].collect().toMap

        // naive: for each click, max view ts among views at-or-before in
        // (ts, event_id) order
        val views  = rows.filter(_._4)
        val clicks = rows.filterNot(_._4)
        val want = clicks.map { case (id, u, t, _) =>
          val prior = views.filter { case (vid, vu, vt, _) =>
            vu == u && (vt < t || (vt == t && vid < id))
          }
          id -> (if (prior.isEmpty) None else Some(prior.map(_._3).max))
        }.toMap
        got == want
      }
    }

  private val pricesGen: Gen[List[(String, Long)]] = for {
    n  <- Gen.choose(1, 60)
    xs <- Gen.listOfN(n, for {
      g <- Gen.oneOf("a", "b", "c")
      v <- Gen.choose(0L, 1000L)
    } yield (g, v))
  } yield xs

  property("middle-sum median equals the sorted-list median per group") =
    Prop.forAll(pricesGen) { xs =>
      xs.nonEmpty ==> {
        val df = xs.zipWithIndex.map { case ((g, v), i) => (g, v, i.toLong) }
          .toDF("g", "v", "k")
        val wOrd = Window.partitionBy("g").orderBy(col("v"), col("k"))
        val wAll = Window.partitionBy("g")
        val got = df
          .select(col("g"), col("v").cast("decimal(18,2)").as("v"),
            row_number().over(wOrd).as("rn"), count(lit(1)).over(wAll).as("n"))
          .groupBy("g")
          .agg(((sum(when(col("rn") === expr("(n + 1) div 2"), col("v")))
            + sum(when(col("rn") === expr("(n + 2) div 2"), col("v")))).cast("double") / 2)
            .as("med"))
          .as[(String, Double)].collect().toMap

        val want = xs.groupBy(_._1).map { case (g, vs) =>
          val s = vs.map(_._2).sorted
          val m =
            if (s.size % 2 == 1) s(s.size / 2).toDouble
            else (s(s.size / 2 - 1) + s(s.size / 2)) / 2.0
          g -> m
        }
        got == want
      }
    }
}
