package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One operator demo from SURVEY.md §2: a stable key, a DataFrame builder
  * over a testdata dir, and (where the semantics are ANSI-SQL-expressible)
  * an equivalent DuckDB oracle query for the driver's t2 hash-compare.
  */
final case class OpQuery(
    key: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object OpQuery {
  def checked(key: String, oracle: String)(run: (SparkSession, String) => DataFrame): OpQuery =
    OpQuery(key, run, Some(oracle))
}
