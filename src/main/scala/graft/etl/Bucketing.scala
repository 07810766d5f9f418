package graft.etl

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle data ON WRITE so repeated joins and
  * aggregations on the bucket key need no Exchange at read time.
  *
  * This is the storage-layout answer to the star schema's recurring
  * fact ⋈ fact joins (orders ⋈ lineitem on the order key at every load):
  * both sides bucketed by the key into the same bucket count join
  * bucket-to-bucket — zero shuffle, verified by the absence of Exchange
  * nodes in the plan (BucketingSpec). At warehouse scale this is the
  * single biggest recurring-cost saving the physical design can make.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed parquet table. */
  def writeBucketed(df: DataFrame, tableName: String, bucketCol: String, numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
      .sortBy(bucketCol)
      .saveAsTable(tableName)

  /** Join two tables bucketed on their join keys (shuffle-free when both
    * have the same bucket count). */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
