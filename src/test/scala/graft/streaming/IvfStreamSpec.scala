package graft.streaming

import graft.SparkSuite
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming IVF maintenance: the cell-partitioned index built from
  * micro-batched deliveries must equal the batch assignment of the same
  * corpus under the same frozen quantizer (the Scd2StreamSpec
  * replay-equivalence pattern, applied to the ANN index). */
class IvfStreamSpec extends SparkSuite {

  private val schema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  test("replay equivalence on real input files: streamed index == batch assignCells") {
    graft.functions.VecExprs.register(spark)
    val corpus = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val emb = corpus.withColumn("nrm", sqrt(expr("vec_dot(embedding, embedding)")))
    // the frozen coarse quantizer, trained ONCE on the bootstrap corpus
    val centDf = graft.ops.SimOps.trainCentroidsDf(spark, emb).cache()
    centDf.count()

    val staged = java.nio.file.Files.createTempDirectory("graft_ivf_src").toString
    val target = java.nio.file.Files.createTempDirectory("graft_ivf_tgt").toString + "/index"

    // two deliveries split by id parity — the stream must assign each
    // batch independently yet land the same cells as one batch pass
    corpus.filter(col("vec_id") % 2 === 0)
      .coalesce(1).write.mode(SaveMode.Overwrite).parquet(staged)
    val q = IvfStream.startIvfAppendSink(spark, staged, target, schema, centDf)
    try {
      q.processAllAvailable()
      corpus.filter(col("vec_id") % 2 === 1)
        .coalesce(1).write.mode(SaveMode.Append).parquet(staged)
      q.processAllAvailable()
    } finally q.stop()

    val streamed = spark.read.parquet(target).select("vec_id", "bucket")
    val batch = graft.ops.SimOps.assignCells(emb, centDf)
    assert(streamed.count() == corpus.count(), "index must cover every delivered vector exactly once")
    assert(streamed.except(batch).count() == 0 && batch.except(streamed).count() == 0,
      "streamed cell assignment must equal the batch path under the frozen quantizer")

    // the layout IS cell-partitioned (batch=<id>/bucket=<cell>): each
    // delivery owns an overwrite-idempotent batch directory, and within
    // it one directory per occupied cell, so a probed-cell scan
    // partition-prunes on bucket instead of reading the index
    val batchDirs = new java.io.File(target).listFiles().filter(_.isDirectory)
      .filter(_.getName.startsWith("batch=")).toSeq
    assert(batchDirs.size == 2, s"expected one directory per delivery: $batchDirs")
    val cellDirs = batchDirs.flatMap(_.listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")))
    assert(cellDirs.nonEmpty, "expected bucket=<cell> partition directories")
    val distinctCells = streamed.select("bucket").distinct().count()
    assert(cellDirs.distinct.size == distinctCells,
      s"cell directories must cover exactly the occupied cells: " +
        s"dirs=${cellDirs.distinct.size} cells=$distinctCells")
    centDf.unpersist()
  }
}
