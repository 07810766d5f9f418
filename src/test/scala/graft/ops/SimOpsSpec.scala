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
}
