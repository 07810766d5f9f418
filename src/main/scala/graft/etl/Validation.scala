package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality validation as data: each rule is evaluated set-based in a
  * single pass per table and the report is itself a DataFrame.
  *
  * This is the reference's post-load validation practice (SURVEY §5 —
  * row-count checks, status-vs-expiry consistency, distribution checks,
  * amount invariants) made reusable: CHECK-constraint semantics from
  * 01_Create.sql become violation counters instead of runtime rejects,
  * which is the only form that works on immutable columnar storage.
  */
object Validation {

  final case class Rule(name: String, predicate: Column)

  /** Evaluate rules against a table in ONE aggregation pass (no per-rule
    * scan): each rule contributes a conditional counter. */
  def report(df: DataFrame, tableName: String, rules: Seq[Rule]): DataFrame = {
    val counters = rules.flatMap { r =>
      Seq(
        sum(when(!coalesce(r.predicate, lit(false)), 1L).otherwise(0L)).as(s"__viol_${r.name}"),
        count(lit(1)).as(s"__n_${r.name}"))
    }
    val wide = df.agg(counters.head, counters.tail: _*)
    val perRule = rules.map { r =>
      struct(
        lit(tableName).as("table_name"),
        lit(r.name).as("rule_name"),
        col(s"__n_${r.name}").as("n_checked"),
        col(s"__viol_${r.name}").as("n_violations"))
    }
    wide
      .select(explode(array(perRule: _*)).as("r"))
      .select("r.table_name", "r.rule_name", "r.n_checked", "r.n_violations")
  }

  /** FK-style orphan check: rows of `child` whose `key` has no match in
    * `parent` (a left-anti count — the FK constraints of 01_Create.sql). */
  def orphans(child: DataFrame, parent: DataFrame, childKey: String, parentKey: String): Long =
    child.join(parent, child(childKey) === parent(parentKey), "left_anti").count()
}
