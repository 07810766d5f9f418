package graft.ops

import graft.{SparkEntry, SparkSuite, Tables}
import org.apache.spark.sql.functions._

/** Semantic checks for graph_pagerank: exact equality with a
  * single-threaded integer-PageRank reference on a fixture graph, and
  * the mass/floor invariants on the real co-purchase graph. (Value
  * parity with DuckDB is the oracle gate, replicated by tools/check.py.) */
class GraphOpsSpec extends SparkSuite {

  /** The same integer fixed-point, computed sequentially in plain Scala —
    * shares nothing with the Spark implementation but the spec. */
  private def refPageRank(
      edges: Seq[(Long, Long, Long)], nodes: Seq[Long], iters: Int, r0: Long): Map[Long, Long] = {
    val base = r0 * 15L / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(_ -> r0).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .groupBy(_._2)
        .map { case (dst, es) => dst -> es.map { case (s, _, w) => (r(s) / outdeg(s)) * w }.sum }
      r = nodes.map(n => n -> (base + mass.getOrElse(n, 0L) * 85L / 100L)).toMap
    }
    r
  }

  test("pageRank equals the single-threaded integer reference on a fixture") {
    import spark.implicits._
    // a hub (1), a relay (2), a leaf (3), and an isolated node (4)
    val fixture = Seq((1L, 2L, 2L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 3L))
    val edges = fixture.toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L).toDF("pk")
    for (iters <- 1 to 4) {
      val got = GraphOps.pageRank(edges, nodes, iters, r0 = 1000000L)
        .collect().map(row => row.getLong(0) -> row.getLong(1)).toMap
      assert(got == refPageRank(fixture, Seq(1L, 2L, 3L, 4L), iters, 1000000L),
        s"distributed and sequential fixed-points must agree exactly at iters=$iters")
    }
  }

  /** Sequential sync-LPA reference: argmax by (weight, then smallest
    * label) over in-neighbor labels; neighborless nodes keep their id. */
  private def refLabelProp(
      edges: Seq[(Long, Long, Long)], nodes: Seq[Long], iters: Int): Map[Long, Long] = {
    val byDst = edges.groupBy(_._2)
    var l = nodes.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      l = nodes.map { n =>
        byDst.get(n) match {
          case None => n -> n
          case Some(es) =>
            val wsums = es.groupBy(e => l(e._1)).map { case (lbl, g) => lbl -> g.map(_._3).sum }
            n -> wsums.toSeq.maxBy { case (lbl, w) => (w, -lbl) }._1
        }
      }.toMap
    }
    l
  }

  test("labelProp equals the single-threaded sync-LPA reference on a fixture") {
    import spark.implicits._
    // two cliques bridged by one weak edge; undirected → both directions
    val und = Seq((1L, 2L, 5L), (1L, 3L, 5L), (2L, 3L, 5L), (4L, 5L, 5L), (3L, 4L, 1L))
    val fixture = und ++ und.map { case (u, v, w) => (v, u, w) }
    val edges = fixture.toDF("src", "dst", "w")
    val nodes = (1L to 6L).toDF("pk") // 6 is isolated
    for (iters <- 1 to 3) {
      val got = GraphOps.labelProp(edges, nodes, iters)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refLabelProp(fixture, (1L to 6L), iters),
        s"distributed and sequential sync labelings must agree exactly at iters=$iters")
    }
  }

  test("graph_label_prop: total labeling over real node ids") {
    val df = SparkEntry.queries("graph_label_prop")(spark, sf0001).cache()
    val nodes = Tables(spark, sf0001).lineitem.select(col("l_partkey").as("pk")).distinct()
    assert(df.count() == nodes.count(), "every node must carry a community label")
    // labels can only ever be node ids (they start as ids and propagate)
    assert(df.join(nodes, col("community") === col("pk"), "left_anti").count() == 0,
      "a community label must be an existing node id")
    // the cascades must actually merge something
    assert(df.select("community").distinct().count() < df.count(),
      "two propagation rounds over a dense graph must form real communities")
    df.unpersist()
  }

  test("triangles: K4-plus-pendant fixture counts exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) + pendant 5-1
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("u", "v")
    val nodes = (1L to 5L).toDF("pk")
    val got = GraphOps.triangles(pairs, nodes)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 0L))
  }

  test("graph_triangles: oriented plan equals the direct a<b<c enumeration") {
    val df = SparkEntry.queries("graph_triangles")(spark, sf0001).cache()
    val li = Tables(spark, sf0001).lineitem.select("l_orderkey", "l_partkey")
    val pairs = GraphOps.coPairs(li).cache()
    // direct enumeration, no orientation — the oracle's plan, in Spark
    val direct = pairs.toDF("a", "b")
      .join(pairs.toDF("a", "c"), "a").filter(col("b") < col("c"))
      .join(pairs.toDF("b", "c"), Seq("b", "c"))
    val nTri = direct.count()
    assert(nTri > 0, "the fixture graph must contain triangles")
    assert(df.agg(sum("n_triangles")).head.getLong(0) == 3L * nTri,
      "per-node participation must sum to 3 x the triangle count")
    val directCorners = direct.select(col("a").as("pk"))
      .union(direct.select(col("b").as("pk")))
      .union(direct.select(col("c").as("pk")))
      .groupBy("pk").agg(count(lit(1)).as("n_direct"))
    val mismatch = df.join(directCorners, col("part_key") === col("pk"), "left_outer")
      .filter(coalesce(col("n_direct"), lit(0L)) =!= col("n_triangles"))
    assert(mismatch.count() == 0, "orientation is physical strategy only")
    pairs.unpersist(); df.unpersist()
  }

  test("edgeJaccard: K4-plus-pendant fixture ties exactly") {
    import spark.implicits._
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (1L, 5L))
      .toDF("u", "v")
    val got = GraphOps.edgeJaccard(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    // deg: 1→4, 2/3/4→3, 5→1; K4 edges carry 2 common neighbors each
    val want = Map(
      (1L, 2L) -> ((2L, 0.4)), (1L, 3L) -> ((2L, 0.4)), (1L, 4L) -> ((2L, 0.4)),
      (2L, 3L) -> ((2L, 0.5)), (2L, 4L) -> ((2L, 0.5)), (3L, 4L) -> ((2L, 0.5)),
      (1L, 5L) -> ((0L, 0.0)))
    assert(got == want)
  }

  test("graph_edge_jaccard: side sums tie back to the triangle count") {
    val li = Tables(spark, sf0001).lineitem.select("l_orderkey", "l_partkey")
    val pairs = GraphOps.coPairs(li).cache()
    val df = GraphOps.edgeJaccard(pairs).cache()
    assert(df.count() == pairs.count(), "one row per canonical edge")
    // every triangle strengthens exactly its three sides
    assert(df.agg(sum("n_common")).head.getLong(0) == 3L * GraphOps.triangleList(pairs).count(),
      "per-edge common-neighbor counts must sum to 3 x the triangle count")
    assert(df.filter(col("jaccard") < 0 || col("jaccard") > 1).count() == 0,
      "neighborhood Jaccard is a [0,1] measure")
    pairs.unpersist(); df.unpersist()
  }

  test("graph_pagerank: one row per node, base floor, and mass conservation") {
    val df = SparkEntry.queries("graph_pagerank")(spark, sf0001).cache()
    val nParts = Tables(spark, sf0001).lineitem.select("l_partkey").distinct().count()
    assert(df.count() == nParts, "every co-purchase node must emit a rank")
    assert(df.filter(col("rank_score") < 150000000000L).count() == 0,
      "the damping base is a hard floor for every node")
    // integer truncation only ever LOSES mass, and loses very little:
    // total stays within 3% of the initialized N * R0 (dangling mass is
    // zero here — every node that appears has at least one out-edge)
    val total = df.agg(sum("rank_score")).head.getLong(0)
    assert(total <= nParts * 1000000000000L, "rank mass cannot be created")
    assert(total >= (nParts * 1000000000000L * 97L) / 100L,
      "truncation loss must stay negligible")
    df.unpersist()
  }

  /** Sequential integer PPR reference: pageRank's fixed-point with the
    * teleport base restricted to the seed set. */
  private def refPpr(
      edges: Seq[(Long, Long, Long)], nodes: Seq[Long], seeds: Set[Long],
      iters: Int, r0: Long): Map[Long, Long] = {
    val base = r0 * 15L / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    var r = nodes.map(n => n -> (if (seeds(n)) r0 else 0L)).toMap
    for (_ <- 1 to iters) {
      val mass = edges
        .groupBy(_._2)
        .map { case (dst, es) => dst -> es.map { case (s, _, w) => (r(s) / outdeg(s)) * w }.sum }
      r = nodes.map(n =>
        n -> ((if (seeds(n)) base else 0L) + mass.getOrElse(n, 0L) * 85L / 100L)).toMap
    }
    r
  }

  test("personalizedPageRank equals the sequential reference and stays seed-local") {
    import spark.implicits._
    // two components: {1,2,3} strongly linked, {4,5} disjoint — mass
    // seeded at 1 must never reach the other component
    val fixture = Seq((1L, 2L, 2L), (2L, 1L, 1L), (2L, 3L, 1L), (3L, 1L, 3L), (4L, 5L, 1L), (5L, 4L, 1L))
    val edges = fixture.toDF("src", "dst", "w")
    val nodes = Seq(1L, 2L, 3L, 4L, 5L).toDF("pk")
    val seeds = Seq(1L).toDF("pk")
    for (iters <- 1 to 3) {
      val got = GraphOps.personalizedPageRank(edges, nodes, seeds, iters, r0 = 1000000L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refPpr(fixture, Seq(1L, 2L, 3L, 4L, 5L), Set(1L), iters, 1000000L),
        s"distributed and sequential PPR fixed-points must agree exactly at iters=$iters")
      assert(got(4L) == 0L && got(5L) == 0L,
        "teleport-less nodes outside the seed component must stay at exactly 0")
    }
  }

  /** Sequential multi-source BFS reference: level-synchronous set
    * expansion, min hop by first discovery. */
  private def refKhop(
      edges: Seq[(Long, Long)], seeds: Set[Long], hops: Int): Map[Long, Long] = {
    val adj = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._2).toSet }
    var dist = seeds.map(_ -> 0L).toMap
    var frontier = seeds
    for (i <- 1 to hops) {
      frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- dist.keySet
      dist = dist ++ frontier.map(_ -> i.toLong)
    }
    dist
  }

  test("khopReach equals the sequential BFS reference on a seeded random graph") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    // 120 nodes, ~480 directed edges, both directions emitted — dense
    // enough for real 2- and 3-hop frontiers, sparse enough to leave
    // unreachable nodes
    val dir0 = Seq.fill(240)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }.distinct
    val both = (dir0 ++ dir0.map(_.swap)).distinct
    val seeds = Set(3L, 77L)
    val got = GraphOps.khopReach(
      both.toDF("src", "dst"), seeds.toSeq.toDF("pk"), hops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == refKhop(both, seeds, 3),
      "distributed delta-frontier BFS must agree with the sequential reference")
  }

  test("khopReach emits each node at most once (first discovery wins)") {
    import spark.implicits._
    // diamond + far chain: 1→{2,3}→4→5, so 4 is discoverable twice at
    // hop 2 and 5 sits beyond a shorter path through the seed itself
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L), (4L, 5L), (1L, 5L))
    val df = GraphOps.khopReach(edges.toDF("src", "dst"), Seq(1L).toDF("pk"), 3).cache()
    assert(df.count() == df.select("pk").distinct().count(), "no node twice")
    val got = df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 0L, 2L -> 1L, 3L -> 1L, 5L -> 1L, 4L -> 2L))
    df.unpersist()
  }

  test("kcore peels the cascade fixture to exactly the K4 core") {
    import spark.implicits._
    // K4 on {1,2,3,4} (every node degree 3) + a cascade tail
    // 5–{3,4,6}, 6–{5,7}, 7–{6}: node 5 starts at degree 3, but round
    // 1 peels 6 (deg 2) and 7 (deg 1), which drops 5's survivor
    // degree to 2 — round 2 peels it. The multi-round cascade a
    // single-pass degree filter gets wrong.
    val und = Seq(
      (1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), // K4
      (5L, 3L), (5L, 4L), (5L, 6L), (6L, 7L))
    val both = (und ++ und.map(_.swap)).toDF("src", "dst")
    val got = GraphOps.kcore(both, k = 3, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"3-core must be exactly the K4 with degree 3, got $got")
    // single-pass check: a naive one-round filter would KEEP node 5
    val oneRound = GraphOps.kcore(both, k = 3, rounds = 1)
      .collect().map(_.getLong(0)).toSet
    assert(oneRound.contains(5L),
      "fixture must genuinely require the cascade (round 1 keeps node 5)")
  }

  test("graph_kcore: the unrolled round budget reaches the fixpoint") {
    val li = graft.Tables(spark, sf0001).lineitem.select("l_orderkey", "l_partkey")
    val strong = GraphOps.coEdges(li).filter(col("w") >= 2).select("src", "dst")
    val r5 = GraphOps.kcore(strong, k = 3, rounds = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val r6 = GraphOps.kcore(strong, k = 3, rounds = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(r6.nonEmpty, "the strong co-purchase graph is known to have a 3-core")
    assert(r5 == r6, "rounds 5 and 6 must agree — the 6-round oracle is a fixpoint")
    assert(r6.forall(_._2 >= 3), "every core member keeps >= k in-core neighbors")
  }

  test("ktruss peels the propped-triangle cascade fixture to exactly the K4") {
    import spark.implicits._
    // Central triangle {1,2,3}, each edge propped by a PRIVATE apex
    // triangle ({1,2,4}, {1,3,5}, {2,3,6}) whose outer edges sit in
    // exactly one triangle — round 1 peels all six outer edges
    // (support 1), which drops the central edges from support 2 to 1;
    // round 2 peels the central triangle too. A disjoint K4 on
    // {7,8,9,10} (every edge support 2) is the surviving 4-truss. The
    // multi-round cascade a one-shot support filter gets wrong.
    val canon = Seq(
      (1L, 2L), (1L, 3L), (2L, 3L), // central triangle
      (1L, 4L), (2L, 4L), (1L, 5L), (3L, 5L), (2L, 6L), (3L, 6L), // props
      (7L, 8L), (7L, 9L), (7L, 10L), (8L, 9L), (8L, 10L), (9L, 10L) // K4
    ).toDF("u", "v")
    val got = GraphOps.ktruss(canon, support = 2, rounds = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val k4 = Map((7L, 8L) -> 2L, (7L, 9L) -> 2L, (7L, 10L) -> 2L,
      (8L, 9L) -> 2L, (8L, 10L) -> 2L, (9L, 10L) -> 2L)
    assert(got == k4, s"4-truss must be exactly the disjoint K4, got $got")
    // half-peeled state after ONE round: the central triangle is intact
    // among round-1 survivors (each edge with its remaining mutual
    // credit of 1) — proof the fixture genuinely needs round 2
    val one = GraphOps.ktruss(canon, support = 2, rounds = 1)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(
      one((1L, 2L)) == 1L && one((1L, 3L)) == 1L && one((2L, 3L)) == 1L,
      s"round 1 must leave the central triangle half-peeled, got $one")
  }

  test("graph_ktruss: the round budget is a fixpoint and the truss property holds") {
    val li = graft.Tables(spark, sf0001).lineitem.select("l_orderkey", "l_partkey")
    val canon = GraphOps.coEdges(li)
      .filter(col("w") >= 2 && col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("v"))
    def asMap(rounds: Int) = GraphOps.ktruss(canon, support = 1, rounds = rounds)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val r3 = asMap(3)
    val r4 = asMap(4)
    assert(r4.nonEmpty, "the strong co-purchase graph is known to have a 3-truss")
    assert(r3 == r4, "rounds 3 and 4 must agree — the 4-round oracle is a fixpoint")
    assert(r4.values.forall(_ >= 1), "every surviving edge keeps >= support triangles")
  }

  test("coGraph artifact: set-equal to the direct derivation, rebuilt when torn") {
    val li = graft.Tables(spark, sf001).lineitem.select("l_orderkey", "l_partkey")
    val (edges, nodes) = GraphOps.coGraph(spark, li)
    val direct = GraphOps.coEdges(li)
    assert(edges.exceptAll(direct).isEmpty && direct.exceptAll(edges).isEmpty,
      "persisted edge artifact must be SET-equal to the relational derivation")
    val directNodes = GraphOps.coNodes(li)
    assert(directNodes.exceptAll(nodes).isEmpty && nodes.exceptAll(directNodes).isEmpty,
      "persisted node artifact must equal the node set")
    // torn-write recovery: delete the _SUCCESS marker — the next coGraph
    // call must rebuild rather than trust a possibly-partial directory
    val fp = graft.Artifacts.decFp(li,
      pmod(xxhash64(col("l_orderkey"), col("l_partkey")), lit(1000000007L)))
    val marker = new java.io.File(
      s"${GraphOps.GraphArtifactDir}/co_edges.parquet/corpus_fp=$fp/_SUCCESS")
    assert(marker.exists, "artifact write must leave a _SUCCESS marker")
    assert(marker.delete())
    val (rebuilt, _) = GraphOps.coGraph(spark, li)
    assert(marker.exists, "coGraph must rebuild a torn artifact")
    assert(rebuilt.exceptAll(direct).isEmpty && direct.exceptAll(rebuilt).isEmpty)
  }

  test("kcore: a seeded peel that exhausts its budget falls back to the unseeded rounds") {
    import spark.implicits._
    // a 12-node path peels from both ends under k=2 — ~L/2 rounds to
    // the (empty) fixpoint, so a 2-round budget CANNOT converge. A
    // seeded 2-round peel must then match the unseeded 2-round peel
    // (the round-count contract the oracle unrolls), not a
    // seed-dependent partial iterate.
    val path = (1L until 12L).map(i => (i, i + 1))
    val both = (path ++ path.map(_.swap)).toDF("src", "dst").localCheckpoint(true)
    // seed = the ROUND-1 survivors {2..11} (a valid superset of the
    // empty 2-core): without the fallback the seeded 2-round peel would
    // land on the scratch peel's round-3 iterate — strictly fewer
    // survivors than the scratch 2-round peel the oracle unrolls
    val ahead = (2L to 11L).toDF("pk")
    val seeded = GraphOps
      .kcore(both, k = 2, rounds = 2, edgesMaterialized = true, seed = Some(ahead))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratch = GraphOps.kcore(both, k = 2, rounds = 2, edgesMaterialized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seeded == scratch,
      "budget-exhausted seeded peel must reproduce the unseeded round chain")
  }

  test("kcore: seeding from the (k-1)-core survivors changes nothing") {
    // core(k) ⊆ core(k-1), so the seeded peel must land on the SAME
    // fixpoint (values included) as the from-scratch peel — the
    // invariant graph_coreness's incremental seeding rides on
    val li = graft.Tables(spark, sf001).lineitem.select("l_orderkey", "l_partkey")
    val strong = GraphOps.coEdges(li).filter(col("w") >= 2).select("src", "dst")
      .localCheckpoint(true)
    val c2 = GraphOps.kcore(strong, k = 2, rounds = 6, edgesMaterialized = true)
    val seeded = GraphOps
      .kcore(strong, k = 3, rounds = 6, edgesMaterialized = true, seed = Some(c2.select("pk")))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val scratch = GraphOps.kcore(strong, k = 3, rounds = 6, edgesMaterialized = true)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(seeded == scratch, "seeded and from-scratch peels must agree exactly")
  }

  test("graph_coreness: K=3 covers the verification graph (4-core empty), tiers nest") {
    // sf0.01 deliberately — the correctness gate's scale. At sf0.001 the
    // co-purchase graph is DENSER (200 parts, big basket overlap) and
    // its 4-core is non-empty, so K=3 is only the full spectrum at the
    // scale the oracle actually checks; elsewhere the op's contract is
    // the documented min(coreness, K) cap.
    val li = graft.Tables(spark, sf001).lineitem.select("l_orderkey", "l_partkey")
    val strong = GraphOps.coEdges(li).filter(col("w") >= 2).select("src", "dst")
      .localCheckpoint(true)
    assert(GraphOps.kcore(strong, k = 4, rounds = 6).count() == 0,
      "4-core must be empty at sf0.01 or the coreness budget truncates the gate")
    // every tier's 6-round budget must reach ITS fixpoint (the kcore
    // test asserts this for k=3 only; a non-converged k=1/k=2 chain
    // would make the oracle's membership diverge from survive())
    for (k <- 1 to 2) {
      val r5 = GraphOps.kcore(strong, k = k, rounds = 5).collect().map(_.getLong(0)).toSet
      val r6 = GraphOps.kcore(strong, k = k, rounds = 6).collect().map(_.getLong(0)).toSet
      assert(r5 == r6, s"k=$k peel must be a fixpoint within the round budget")
    }
    // nesting invariant: the k-cores form a chain c3 ⊆ c2 ⊆ c1
    val cores = (1 to 3).map(k =>
      GraphOps.kcore(strong, k = k, rounds = 6).collect().map(_.getLong(0)).toSet)
    assert(cores(2).subsetOf(cores(1)) && cores(1).subsetOf(cores(0)),
      "k-cores must nest")
    assert(cores(1).size > cores(2).size && cores(0).size > cores(1).size,
      "each tier should strictly grow on this graph (known distribution)")
  }
}
