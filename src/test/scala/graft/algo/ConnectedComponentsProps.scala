package graft.algo

import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

/** Randomized cross-check of the distributed min-label loop against a
  * driver-side union-find on the same edges — catches convergence /
  * checkpoint bugs (probe cadence, unpersist of a still-needed
  * generation) that fixed examples miss. */
object ConnectedComponentsProps extends Properties("graft.algo.cc") {

  private lazy val spark = graft.SparkSuite.session
  import spark.implicits._

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    edges.flatMap(e => Seq(e._1, e._2)).distinct.map(x => x -> find(x)).toMap
  }

  private val edgeListGen: Gen[List[(Long, Long)]] = for {
    n     <- Gen.choose(2, 40)
    m     <- Gen.choose(1, 60)
    edges <- Gen.listOfN(m, for {
      a <- Gen.choose(0L, n.toLong - 1)
      b <- Gen.choose(0L, n.toLong - 1)
    } yield (math.min(a, b), math.max(a, b)))
  } yield edges.filter(e => e._1 != e._2).distinct

  property("components equal a driver-side union-find on random graphs") =
    Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = ConnectedComponents.components(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    }

  property("a long chain (diameter >> checkEvery) converges to its min node") = {
    // exercises the probe-every-k loop well past one checkpoint generation
    val chain = (0L until 12L).map(i => (i, i + 1)).toList
    val got = ConnectedComponents.components(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    Prop(got.values.toSet == Set(0L) && got.keySet == (0L to 12L).toSet)
  }

  property("star contraction equals the union-find on random graphs") =
    Prop.forAll(edgeListGen) { edges =>
      edges.nonEmpty ==> {
        val got = ConnectedComponents.componentsStar(edges.toDF("a", "b"))
          .as[(Long, Long)].collect().toMap
        got == unionFind(edges)
      }
    }

  property("star contraction resolves a long chain in few rounds") = {
    // the O(log² n) case the default O(diameter) loop is slow on: a
    // 40-node chain must still land every node on component 0
    val chain = (0L until 40L).map(i => (i, i + 1)).toList
    val got = ConnectedComponents.componentsStar(chain.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    Prop(got.values.toSet == Set(0L) && got.keySet == (0L to 40L).toSet)
  }

  property("star contraction keeps self-loop-only nodes (contract parity)") = {
    val edges = List((5L, 5L), (1L, 2L))
    val got = ConnectedComponents.componentsStar(edges.toDF("a", "b"))
      .as[(Long, Long)].collect().toMap
    Prop(got == Map(5L -> 5L, 1L -> 1L, 2L -> 1L))
  }

  property("star contraction degrades to one row per node when maxIter is hit") = {
    // a chain too deep for one round: the result may be unconverged but
    // must never emit duplicate or contradictory rows for a node
    val chain = (0L until 10L).map(i => (i, i + 1)).toList
    val rows = ConnectedComponents.componentsStar(chain.toDF("a", "b"), maxIter = 1)
      .as[(Long, Long)].collect()
    Prop(rows.map(_._1).distinct.length == rows.length && rows.length == 11)
  }
}
