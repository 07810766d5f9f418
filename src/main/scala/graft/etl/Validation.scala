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

  // ── The reference's validation triggers, shipped as batch rule sets ──
  // Each BEFORE-trigger RAISE_APPLICATION_ERROR becomes a violation
  // counter: immutable columnar storage can't veto single rows, so the
  // batch engine reports them instead (one agg pass per table).

  /** trg_bb_member_valid (ref 02_Trigger.sql:162-195): a borrow must name
    * an existing member and its borrowDate must fall inside the member's
    * [registrationDate, expireDate] window. One left-outer join against
    * the members dim (broadcast-sized ⇒ AQE broadcasts it), then the
    * trigger's three RAISE conditions as rules. */
  def bbMemberValid(borrowedBooks: DataFrame, members: DataFrame): DataFrame = {
    val joined = borrowedBooks.join(
      members.select(col("member_id"), col("registration_date"), col("expire_date"),
        lit(1).as("__member_found")),
      Seq("member_id"), "left_outer")
    report(joined, "borrowed_books", Seq(
      Rule("member_and_date_present", col("member_id").isNotNull && col("borrow_date").isNotNull),
      Rule("member_exists", col("__member_found").isNotNull),
      Rule("borrow_in_membership",
        col("borrow_date").between(col("registration_date"), col("expire_date")))))
  }

  /** trg_BookOrders_DiscDate (ref 02_Trigger.sql:383-409): an order that
    * carries a discountId must reference an existing discount whose
    * window contains the salesDate; NULL window bounds are open-ended
    * (the trigger only tests a bound when it IS NOT NULL). */
  def bookOrdersDiscDate(salesOrders: DataFrame, discounts: DataFrame): DataFrame = {
    val withDisc = salesOrders.filter(col("discount_id").isNotNull)
      .join(discounts.select(col("discount_id"), col("start_date"), col("end_date"),
        lit(1).as("__disc_found")), Seq("discount_id"), "left_outer")
    report(withDisc, "sales_orders", Seq(
      Rule("discount_exists", col("__disc_found").isNotNull),
      Rule("discount_active_on_sale",
        (col("start_date").isNull || col("sales_date") >= col("start_date")) &&
          (col("end_date").isNull || col("sales_date") <= col("end_date")))))
  }

  /** TRG_MANAGE_BOOK_DETAILS (ref 02_Trigger.sql:14-41): publication year
    * not in the future, non-negative prices, popularity within
    * [1.0, 5.0]. `asOfYear` replaces the trigger's EXTRACT(YEAR FROM
    * SYSDATE) so batch runs are reproducible. */
  def manageBookDetails(bookTitles: DataFrame, asOfYear: Int): DataFrame =
    report(bookTitles, "book_titles", Seq(
      Rule("year_not_future", col("publication_year") <= asOfYear),
      Rule("positive_prices", col("sales_price") >= 0 && col("purchase_price") >= 0),
      Rule("popularity_range", col("popularity").between(1.0, 5.0))))
}
