package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MERGE-style upsert semantics over immutable storage (parquet).
  *
  * Reference: Oracle `MERGE ... WHEN NOT MATCHED THEN INSERT` and
  * update-matched variants (/root/reference/07_SubsequentLoading.sql:331-355,
  * 407-431; 08_InsertFines.sql:46-108).
  *
  * Spark realization: the merged state is `incoming ∪ (existing ⟕anti incoming)`
  * — incoming rows win on key collision, unmatched existing rows survive.
  * At scale both sides shuffle once on the key (or zero times if the target
  * is bucketed by the key); the anti join is the only extra pass, and AQE
  * will broadcast `incoming` when the delta is small — the common case for
  * incremental loads.
  */
object MergeUpsert {

  /** Upsert `incoming` into `existing` keyed on `keys` (incoming wins). */
  def upsert(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame = {
    val survivors = existing.join(incoming, keys, "left_anti")
    incoming.unionByName(survivors)
  }

  /** Insert-only merge (`WHEN NOT MATCHED THEN INSERT` with no update
    * branch): keeps all existing rows, appends only genuinely-new keys.
    * This is the reference's idempotent re-load guard
    * (07_SubsequentLoading.sql:42,93,122,162 NOT EXISTS inserts). */
  def insertMissing(existing: DataFrame, incoming: DataFrame, keys: Seq[String]): DataFrame =
    existing.unionByName(incoming.join(existing, keys, "left_anti"))

  /** Correlated-UPDATE rewrite: for every key present in `updates`, replace
    * the listed columns with the update's values; other rows pass through.
    * (Reference UPDATE-with-scalar-subquery, 07_SubsequentLoading.sql:288-322.)
    * `updates` must carry `keys ++ setCols`.
    */
  def updateMatched(target: DataFrame, updates: DataFrame, keys: Seq[String], setCols: Seq[String]): DataFrame = {
    val renamed = setCols.foldLeft(updates)((df, c) => df.withColumnRenamed(c, s"__new_$c"))
    val joined  = target.join(renamed.select((keys ++ setCols.map(c => s"__new_$c")).map(col): _*), keys, "left_outer")
    val applied = setCols.foldLeft(joined) { (df, c) =>
      df.withColumn(c, coalesce(col(s"__new_$c"), col(c)))
    }
    applied.select(target.columns.map(col).toIndexedSeq: _*)
  }
}
