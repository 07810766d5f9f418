package graft.ops

import graft.SparkSuite
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The sim_topk_ivf_kmeans oracle row checks the exact (union-verified)
  * top-k; the pure-IVF branch's usefulness — finding most true neighbors
  * while scoring only nprobe/K of the corpus — is asserted here. */
class SimOpsSpec extends SparkSuite {

  test("ivf-kmeans pure path keeps recall@5 above the floor on the query sample") {
    val approxTop = SimOps.ivfKmeansApprox(spark, sf001)
      .withColumn("rnk", row_number().over(
        Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= 5)
      .select("query_id", "neighbor_id")
    val exactTop = graft.SparkEntry.queries("sim_topk_ivf_kmeans")(spark, sf001)
      .select("query_id", "neighbor_id")
    val total = exactTop.count()
    val hits  = exactTop.join(approxTop, Seq("query_id", "neighbor_id")).count()
    val recall = hits.toDouble / total
    assert(total > 0)
    assert(recall >= 0.5, s"IVF recall@5 degraded: $hits/$total = $recall")
  }

  test("ivf-pq recall@5 is at least the unquantized IVF's at equal nprobe") {
    val exactTop = graft.SparkEntry.queries("sim_topk_ivf_kmeans")(spark, sf001)
      .select("query_id", "neighbor_id").cache()
    val total = exactTop.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val top = df
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      exactTop.join(top, Seq("query_id", "neighbor_id")).count().toDouble / total
    }
    val ivfRecall = recallOf(SimOps.ivfKmeansApprox(spark, sf001))
    val pqRecall  = recallOf(SimOps.ivfPqApprox(spark, sf001))
    assert(total > 0)
    // the int8 shortlist + exact re-rank must not lose neighbors the
    // unquantized scan of the same probed cells would have found
    assert(pqRecall >= ivfRecall,
      s"PQ recall@5 below unquantized IVF at equal nprobe: pq=$pqRecall ivf=$ivfRecall")
    exactTop.unpersist()
  }

  test("true-PQ (m=8 codebooks, ADC) recall@5 matches the scalar-int8 path at equal nprobe/shortlist") {
    val exactTop = graft.SparkEntry.queries("sim_topk_ivf_kmeans")(spark, sf001)
      .select("query_id", "neighbor_id").cache()
    val total = exactTop.count()
    def recallOf(df: org.apache.spark.sql.DataFrame): Double = {
      val top = df
        .withColumn("rnk", row_number().over(
          Window.partitionBy("query_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
        .filter(col("rnk") <= 5)
        .select("query_id", "neighbor_id")
      exactTop.join(top, Seq("query_id", "neighbor_id")).count().toDouble / total
    }
    val int8Recall = recallOf(SimOps.ivfPqApprox(spark, sf001))
    val pq8Recall  = recallOf(SimOps.ivfPq8Approx(spark, sf001))
    assert(total > 0)
    // 32× compression must not cost recall on this corpus: the 8×256
    // codebooks + exact shortlist re-rank recover every neighbor the
    // 4×-compressed scalar-int8 scan finds (both are bounded above by
    // the same nprobe cell coverage)
    assert(pq8Recall >= int8Recall,
      s"PQ8 recall@5 below scalar-int8 at equal nprobe/shortlist: pq8=$pq8Recall int8=$int8Recall")
    exactTop.unpersist()
  }

  test("semantic dedup cluster branch finds only true drops, with bounded recall loss") {
    import spark.implicits._
    graft.functions.VecExprs.register(spark)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val pairCos = round(expr("vec_dot(a.embedding, b.embedding)") / (col("a.nrm") * col("b.nrm")), 6)
    val exactDrops = emb.as("a")
      .join(emb.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(pairCos >= 0.35)
      .select(col("b.vec_id").as("drop_id")).distinct()
      .as[Long].collect().toSet
    val centDf = SimOps.trainCentroidsDf(spark, emb)
    // the op's production branch: redundant top-3 cell assignment
    val clustered = emb.join(SimOps.assignCells(emb, centDf, topR = 3), Seq("vec_id"))
    val clusterDrops = clustered.as("a")
      .join(clustered.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .filter(pairCos >= 0.35)
      .select(col("b.vec_id").as("drop_id")).distinct()
      .as[Long].collect().toSet
    // soundness: a cell-confined pair is an all-pairs pair — never a false drop
    assert(clusterDrops.subsetOf(exactDrops),
      s"cluster branch dropped non-duplicates: ${clusterDrops -- exactDrops}")
    // recall: near-duplicate embeddings mostly co-cluster under the
    // redundant assignment (0.83 measured at seed-stable sf0.01; the
    // single-cell assignment sits at ~0.35 on this no-planted-dup corpus)
    assert(exactDrops.nonEmpty)
    val recall = clusterDrops.size.toDouble / exactDrops.size
    assert(recall >= 0.7, s"cluster-branch drop recall degraded: ${clusterDrops.size}/${exactDrops.size}")
  }

  test("knn-graph (cell-confined, the shipped op) keeps edge recall above the floor vs the exact graph") {
    graft.functions.VecExprs.register(spark)
    // exact top-3 graph, computed inline at spec scale (the all-pairs
    // form is fine over sf0.001's corpus; since r14 the OP never runs
    // it — that is the point of this assertion existing here)
    val emb = spark.read.parquet(s"$sf001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    val exactGraph = emb.as("a")
      .join(emb.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("vec_id"), col("b.vec_id").as("neighbor_id"),
        round(expr("vec_dot(a.embedding, b.embedding)") / (col("a.nrm") * col("b.nrm")), 6).as("cos_sim"))
      .withColumn("rnk", row_number().over(
        Window.partitionBy("vec_id").orderBy(col("cos_sim").desc, col("neighbor_id").asc)))
      .filter(col("rnk") <= 3)
      .select("vec_id", "neighbor_id").cache()
    val total = exactGraph.count()
    val shipped = graft.SparkEntry.queries("sim_knn_graph")(spark, sf001)
      .select("vec_id", "neighbor_id")
    val hits = exactGraph.join(shipped, Seq("vec_id", "neighbor_id")).count()
    assert(total > 0)
    // every vector must still get a full degree-3 adjacency from its cells
    // (count the vectors too — a vector with ZERO candidates contributes
    // no degree row at all and would otherwise pass vacuously)
    val degrees = shipped.groupBy("vec_id").count()
    assert(degrees.count() == exactGraph.select("vec_id").distinct().count(),
      "some vector produced no cell-confined candidates at all")
    assert(degrees.filter(col("count") =!= 3).count() == 0,
      "redundant cell assignment left a vector with fewer than 3 candidates")
    val recall = hits.toDouble / total
    assert(recall >= 0.5, s"knn-graph edge recall degraded: $hits/$total = $recall")
    exactGraph.unpersist()
  }
}
