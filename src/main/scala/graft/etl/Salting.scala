package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation by key salting.
  *
  * When a shuffle join key is heavily skewed (one hot key → one straggler
  * task), salt the large side with a per-row bucket in [0, saltFactor) and
  * replicate the small side once per bucket: the hot key's rows spread
  * over saltFactor tasks. Join result is identical to the unsalted join —
  * each large row matches exactly its own salt copy.
  *
  * AQE's skew-join split (spark.sql.adaptive.skewJoin) handles most cases
  * automatically at runtime; explicit salting remains the tool when the
  * skewed side must ALSO aggregate on the hot key (two-stage partial agg
  * on (key, salt) first), or under engines/configs without AQE.
  */
object Salting {

  /** Equi-join `large ⋈ small` on largeKey == smallKey with the large
    * side salted across `saltFactor` buckets. */
  def saltedEquiJoin(large: DataFrame, small: DataFrame, largeKey: String, smallKey: String, saltFactor: Int): DataFrame = {
    // any per-row value works as the salt — it never influences results,
    // only task placement; a row-id hash spreads evenly and cheaply
    val salted = large.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
    val replicated = small.withColumn("__salt", explode(sequence(lit(0L), lit(saltFactor - 1L))))
    salted
      .join(replicated, salted(largeKey) === replicated(smallKey) && salted("__salt") === replicated("__salt"))
      .drop("__salt")
  }

  /** Two-stage skew-safe aggregation: partial agg on (key, salt), final
    * agg on key — the hot key's partial states spread across tasks. */
  def saltedSumByKey(df: DataFrame, key: String, valueCol: String, saltFactor: Int): DataFrame =
    df.withColumn("__salt", pmod(monotonically_increasing_id(), lit(saltFactor.toLong)))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
}
