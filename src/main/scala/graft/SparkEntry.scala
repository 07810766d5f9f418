package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.ops._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator key from SURVEY §2 (plus the LLM-pipeline extensions) is
  * registered as an [[OpQuery]] in one of the `graft.ops` objects; this
  * object only assembles them into the driver's `queries` / `oracleSql` maps.
  */
object SparkEntry {

  /** Every implemented operator demo, in registration order. */
  val all: Seq[OpQuery] =
    CoreOps.ops ++ JoinOps.ops ++ AggOps.ops ++ EtlOps.ops ++ graft.queries.ReportQueries.ops ++
      TextOps.ops ++ SimOps.ops ++ EventsOps.ops ++ MultimodalOps.ops ++ ExtOps.ops ++
      PipelineOps.ops ++ GraphOps.ops ++ LibraryOracleOps.ops

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Q1 is the designated minimum end-to-end slice (SURVEY §7.5): star
    * join → quarter pivot → YoY LAG → top-N rank in one DAG. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_genre_sales")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.key -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case OpQuery(k, _, Some(sql)) => k -> sql }.toMap
}
