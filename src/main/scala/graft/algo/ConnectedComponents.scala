package graft.algo

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation over an undirected edge
  * list — the clustering step that turns near-dup PAIRS into dedup
  * GROUPS (keep one canonical doc per component).
  *
  * Each round: every node takes the min label among itself and its
  * neighbors; converges in O(component diameter) rounds — and dup
  * clusters are near-cliques, so 2-3 rounds in practice. Each round is a
  * join + groupBy on the edge list, fully distributed.
  *
  * Scale discipline (this loop must survive 100× data):
  *   - `localCheckpoint(eager = true)` on every label generation truncates
  *     both logical-plan and RDD lineage — without it the DAG grows by one
  *     join+agg per round and round N replays rounds 1..N-1.
  *   - exactly ONE job per round (the eager checkpoint materialization);
  *     the convergence probe runs every `checkEvery` rounds as a
  *     short-circuit `isEmpty` (limit-1 scan) over the already-
  *     materialized generation, piggybacking on a `changed` flag computed
  *     inside the round — no second full-count job per round.
  *   - superseded generations are explicitly unpersisted so executor
  *     storage stays O(|V|), not O(rounds × |V|).
  *   - (At extreme diameters the same loop with large-star/small-star
  *     transforms halves round count; not needed at dup-cluster
  *     diameters.)
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns `a`, `b` (undirected).
    * @param checkEvery probe convergence every this many rounds (dup
    *        clusters converge in 2-3, so probing each round wastes a job).
    * @return (id, component) for every node appearing in `edges`,
    *         component = min node id in the connected component. */
  def components(edges: DataFrame, maxIter: Int = 20, checkEvery: Int = 2): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint(true)

    // localCheckpoint persists its RDD outside the CacheManager, so
    // Dataset.unpersist can't release superseded generations. The
    // checkpointed Dataset's analyzed plan is a LogicalRDD wrapping the
    // persisted RDD — hold that RDD directly and unpersist it once the
    // following generation has materialized. (An earlier version diffed
    // sc.getPersistentRDDs snapshots, which could sweep up — and evict —
    // RDDs persisted concurrently by other queries on the shared context.)
    var gen = sym.select(col("a").as("id")).distinct()
      .select(col("id"), col("id").as("label"), lit(false).as("changed"))
      .localCheckpoint(true)
    var genRdd = checkpointRdd(gen)
    var done   = false
    var i      = 0
    while (!done && i < maxIter) {
      val nbrMin = sym
        .join(gen.select("id", "label"), sym("b") === col("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("label")).as("nbr_label"))
      val next = gen
        .join(nbrMin, gen("id") === nbrMin("nid"), "left_outer")
        .select(
          gen("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"),
          (col("nbr_label").isNotNull && col("nbr_label") < col("label")).as("changed"))
        .localCheckpoint(true) // the round's single job; truncates lineage
      // free the superseded generation — `next` is fully materialized, so
      // nothing live references the old labels anymore.
      genRdd.foreach(_.unpersist(false))
      genRdd = checkpointRdd(next)
      gen = next
      i += 1
      if (i % checkEvery == 0 || i >= maxIter)
        done = gen.where(col("changed")).isEmpty // limit-1 probe on materialized data
    }
    // the edge artifact is only read while iterating — release it now. The
    // final generation stays persisted (it backs the returned frame);
    // callers that outlive the result should release(result) when done.
    checkpointRdd(sym).foreach(_.unpersist(false))
    gen.select(col("id"), col("label").as("component"))
  }

  /** Alternative loop: two-phase star contraction (Kiveris et al.,
    * "Connected Components in MapReduce and Beyond", SoCC'14). Alternating
    * large-star / small-star transforms converge in O(log² n) rounds
    * REGARDLESS of component diameter — the extreme-scale path where the
    * min-label loop above (O(diameter) rounds) degrades on chain-like
    * graphs. Dup clusters are near-cliques, so [[components]] stays the
    * default; this is the documented escape hatch. Same checkpoint /
    * unpersist discipline: one materialization per round plus two
    * single-row signature aggregations for the fixed-point probe.
    *
    * @return (id, component) for every node in `edges`, component = min
    *         node id — identical contract to [[components]]. */
  def componentsStar(edges: DataFrame, maxIter: Int = 30): DataFrame = {
    // node universe BEFORE dropping self-loops: a node appearing only in
    // (v, v) edges must still come back as (v, v), matching components()
    val nodes = edges.select(col("a").as("id"))
      .unionByName(edges.select(col("b").as("id")))
      .distinct()
      .localCheckpoint(true)
    // canonical orientation (x, y) with y < x
    var e = edges
      .select(greatest(col("a"), col("b")).as("x"), least(col("a"), col("b")).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .localCheckpoint(true)
    var eRdd = checkpointRdd(e)
    // edge-set fixed point probe: (count, order-independent hash XOR —
    // ANSI-safe where a 64-bit hash SUM would overflow). The previous
    // round's signature is carried over, so each round pays ONE probe job.
    def sig(df: DataFrame) =
      df.agg(count(lit(1)), expr("bit_xor(xxhash64(x, y))")).head()
    var prevSig = sig(e)
    var done    = false
    var i       = 0
    while (!done && i < maxIter) {
      // large-star: every node connects its LARGER neighbors to the min
      // of its closed neighborhood
      val sym = e.select(col("x").as("n"), col("y").as("w"))
        .unionByName(e.select(col("y").as("n"), col("x").as("w")))
      val mins = sym.groupBy("n").agg(min(col("w")).as("mn"))
      val large = sym.join(mins, "n")
        .filter(col("w") > col("n"))
        .select(col("w").as("x"), least(col("mn"), col("n")).as("y"))
        .distinct()
      // small-star: every node connects its smaller neighbors (and
      // itself) to the min of that set
      val smins = large.groupBy("x").agg(min(col("y")).as("m"))
      val next = large.join(smins, "x")
        .select(col("y").as("x"), col("m").as("y"))
        .filter(col("x") =!= col("y"))
        .unionByName(smins.select(col("x"), col("m").as("y")))
        .distinct()
        .localCheckpoint(true) // the round's materialization
      val nextSig = sig(next)
      done = nextSig == prevSig
      prevSig = nextSig
      eRdd.foreach(_.unpersist(false))
      eRdd = checkpointRdd(next)
      e = next
      i += 1
    }
    // At the fixed point e is a star per component (each non-root has
    // exactly one edge to the component min). If maxIter ran out first, a
    // node can still carry several outgoing edges — collapse to the min
    // so the contract (one row per id) degrades gracefully, exactly like
    // an unconverged components() run.
    val star = if (done) e else e.groupBy(col("x")).agg(min(col("y")).as("y"))
    nodes
      .join(star, nodes("id") === star("x"), "left_outer")
      .select(col("id"), coalesce(col("y"), col("id")).as("component"))
  }

  /** The persisted RDD backing a localCheckpoint'd Dataset (or a frame
    * derived from one): the first LogicalRDD leaf in the analyzed plan. */
  private def checkpointRdd(df: DataFrame): Option[RDD[_]] =
    df.queryExecution.analyzed.collectFirst { case lr: LogicalRDD => lr.rdd }

  /** Release every checkpointed RDD backing a [[components]] /
    * [[componentsStar]] result once the caller has fully consumed it
    * (componentsStar results are backed by TWO checkpoints: the node
    * universe and the final edge generation). */
  def release(result: DataFrame): Unit =
    result.queryExecution.analyzed
      .collect { case lr: LogicalRDD => lr.rdd }
      .foreach(_.unpersist(false))
}
