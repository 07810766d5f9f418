package graft.algo

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by min-label propagation over an undirected edge
  * list — the clustering step that turns near-dup PAIRS into dedup
  * GROUPS (keep one canonical doc per component).
  *
  * Each round: every node takes the min label among itself and its
  * neighbors; converges in O(component diameter) rounds — and dup
  * clusters are near-cliques, so 2-3 rounds in practice. Each round is a
  * join + groupBy on the edge list, fully distributed; the driver only
  * evaluates the convergence counter. (At extreme scale the same loop
  * with the large-star/small-star transforms halves round count; not
  * needed at dup-cluster diameters.)
  */
object ConnectedComponents {

  /** @param edges DataFrame with two long columns `a`, `b` (undirected).
    * @return (id, component) for every node appearing in `edges`,
    *         component = min node id in the connected component. */
  def components(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col("a"), col("b"))
      .unionByName(edges.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .cache()

    var labels  = sym.select(col("a").as("id")).distinct().withColumn("label", col("id")).cache()
    var changed = 1L
    var i       = 0
    while (changed > 0 && i < maxIter) {
      val nbrMin = sym
        .join(labels, sym("b") === labels("id"))
        .groupBy(sym("a").as("nid"))
        .agg(min(col("label")).as("nbr_label"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("nid"), "left_outer")
        .select(col("id"), least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .cache()
      changed = next
        .join(labels.withColumnRenamed("label", "old_label"), "id")
        .filter(col("label") =!= col("old_label"))
        .count()
      labels = next
      i += 1
    }
    labels.select(col("id"), col("label").as("component"))
  }
}
