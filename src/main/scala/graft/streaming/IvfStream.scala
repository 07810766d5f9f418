package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types.StructType

/** Streaming IVF index maintenance — the ingest-side counterpart of the
  * batch ANN ops (graft.ops.SimOps): embedding batches arriving as
  * parquet files are assigned to the FROZEN coarse quantizer (the
  * centroid frame trained once, broadcast per batch) and landed in a
  * cell-partitioned parquet layout (`batch=<id>/bucket=<cell>/`), which
  * is exactly the layout a probed-cell ANN scan partition-prunes
  * against — each micro-batch owns (and on retry overwrites) its own
  * batch directory, so at-least-once redelivery cannot duplicate rows.
  *
  * The assignment is the SAME code path the batch ops use
  * ([[graft.ops.SimOps.assignCells]]: broadcast K centroids, argmax
  * dot, struct-max aggregation with map-side partials), so streamed and
  * batch index builds are replay-equivalent by construction — asserted
  * on real input files in IvfStreamSpec.
  *
  * Scale shape: per batch, one narrow broadcast join (K centroid rows)
  * + one aggregation shuffle carrying (vec_id, cell, score); writes
  * touch only the arriving batch's directory, so a 100 TB index never
  * rewrites existing data. The quantizer staying frozen is the production
  * contract (Faiss-style): re-training moves cell boundaries and would
  * require re-assigning the whole corpus — a deliberate batch
  * operation, not a streaming one.
  */
object IvfStream {

  /** Start appending arriving embedding files under `sourceDir` to the
    * cell-partitioned layout at `targetDir`, assigned via the frozen
    * `centDf` (centroid_id, cvec) quantizer. */
  def startIvfAppendSink(
      spark: SparkSession,
      sourceDir: String,
      targetDir: String,
      schema: StructType,
      centDf: DataFrame): StreamingQuery = {
    val src = spark.readStream.schema(schema).parquet(sourceDir)
    src.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val sp = batch.sparkSession
        graft.functions.VecExprs.register(sp)
        val emb = batch
          .select(col("vec_id"), col("embedding"))
          .withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
        // foreachBatch is at-least-once: a retry after a partial write
        // must not duplicate rows, so each batch owns a batch=<id>
        // directory and OVERWRITES it — the retry replaces its own
        // partial output instead of appending beside it (effective
        // exactly-once; readers partition-discover batch + bucket and
        // still cell-prune on bucket)
        emb.join(graft.ops.SimOps.assignCells(emb, centDf), Seq("vec_id"))
          .select(col("vec_id"), col("embedding"), col("bucket"))
          .write.mode("overwrite").partitionBy("bucket")
          .parquet(s"$targetDir/batch=$batchId")
      }
      .start()
  }
}
