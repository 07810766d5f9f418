package graft.etl

import graft.gen.LibraryTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** The Kimball star-schema initial load (ref 05_InitialLoading.sql) —
  * dims with surrogate keys + SCD2 columns, three fact tables.
  *
  * Surrogate keys: dims are small by definition, so dense row_number
  * surrogates over the business key are fine (single-partition window on
  * a dim-sized input). Fact tables never get a surrogate — their grain is
  * the natural key — and dim keys reach facts through broadcast joins.
  * date_key is derivable (yyyymmdd), so DimDate needs no sequence at all.
  */
final case class DwTables(
    dimDate: DataFrame,
    dimMembers: DataFrame,
    dimBook: DataFrame,
    dimSuppliers: DataFrame,
    factSales: DataFrame,
    factBorrowing: DataFrame,
    factPurchase: DataFrame)

object InitialLoad {

  private def dateKey(d: org.apache.spark.sql.Column) =
    (year(d) * 10000 + month(d) * 100 + dayofmonth(d)).cast("long")

  /** Surrogate-key lookups resolve against the CURRENT dim version only
    * (ref 07_SubsequentLoading.sql joins on curr_ind = 'Y') — an SCD2 dim
    * with history must not fan facts out across versions. */
  private def currentOf(dim: DataFrame): DataFrame = dim.filter(col("curr_ind") === "Y")

  /** DimMembers (ref 05_InitialLoading.sql:226-290): age buckets, state /
    * city parsed from the address ("street, city, state" — the reference's
    * INSTR-from-the-end chains become split + element_at), SCD2 columns. */
  def dimMembers(members: DataFrame, asOf: String): DataFrame = {
    val parts = split(col("member_address"), ",\\s*")
    members.select(
      row_number().over(Window.orderBy(col("member_id"))).cast("long").as("member_key"),
      col("member_id"),
      col("member_name"),
      col("member_gender"),
      col("member_age"),
      when(col("member_age") < 25, "18-24")
        .when(col("member_age") < 40, "25-39")
        .when(col("member_age") < 60, "40-59")
        .otherwise("60+").as("age_band"),
      element_at(parts, -1).as("member_state"),
      element_at(parts, -2).as("member_city"),
      col("registration_date"),
      col("expire_date"),
      floor(months_between(lit(asOf).cast("date"), col("registration_date"))).cast("long")
        .as("membership_months"),
      col("registration_date").as("effective_date"),
      lit(Scd2.EndOfTime).cast("date").as("expiration_date"),
      lit("Y").as("curr_ind"))
  }

  /** DimBook (ref 05_InitialLoading.sql:209-220). */
  def dimBook(titles: DataFrame): DataFrame =
    titles.select(
      row_number().over(Window.orderBy(col("book_id"))).cast("long").as("book_key"),
      col("book_id"), col("title"), col("author"), col("genre"),
      col("publication_year"), col("sales_price"), col("purchase_price"), col("popularity"),
      lit("2004-07-01").cast("date").as("effective_date"),
      lit(Scd2.EndOfTime).cast("date").as("expiration_date"),
      lit("Y").as("curr_ind"))

  /** DimSuppliers (ref 05_InitialLoading.sql:295-317). */
  def dimSuppliers(suppliers: DataFrame): DataFrame =
    suppliers.select(
      row_number().over(Window.orderBy(col("supplier_id"))).cast("long").as("supplier_key"),
      col("supplier_id"), col("supplier_name"), col("supplier_email"), col("supplier_state"),
      lit("2004-07-01").cast("date").as("effective_date"),
      lit(Scd2.EndOfTime).cast("date").as("expiration_date"),
      lit("Y").as("curr_ind"))

  /** FactSales (ref 05_InitialLoading.sql:413-434): line grain, joined to
    * all dims via broadcast. Derived amounts must already be applied
    * (Derivations.salesDetailAmounts). */
  def factSales(details: DataFrame, orders: DataFrame, dimB: DataFrame, dimM: DataFrame): DataFrame =
    details
      .join(orders.select("order_id", "member_id"), Seq("order_id"))
      .join(broadcast(currentOf(dimB).select("book_id", "book_key")), Seq("book_id"))
      .join(broadcast(currentOf(dimM).select("member_id", "member_key")), Seq("member_id"))
      .select(
        col("order_id"), col("line_no"),
        dateKey(col("sales_date")).as("date_key"),
        col("book_key"), col("member_key"),
        col("quantity").cast("long").as("quantity"),
        col("gross_amount"), col("discount_amount"), col("total_amount"))

  /** FactBorrowing (ref 05_InitialLoading.sql:345-408): PK is
    * (date_key, member_key, book_key) — same-day same-member same-book
    * borrows COLLAPSE (SURVEY §7.4): metrics aggregate with MAX/AVG per
    * the reference's subsequent-load repair (07_SubsequentLoading.sql:362-368). */
  def factBorrowing(borrows: DataFrame, copies: DataFrame, dimB: DataFrame, dimM: DataFrame, asOf: String): DataFrame =
    borrows
      .join(broadcast(copies.select("copy_id", "book_id")), Seq("copy_id"))
      .join(broadcast(currentOf(dimB).select("book_id", "book_key")), Seq("book_id"))
      .join(broadcast(currentOf(dimM).select("member_id", "member_key")), Seq("member_id"))
      .withColumn("duration_days",
        when(col("return_date").isNotNull, datediff(col("return_date"), col("borrow_date")))
          .otherwise(datediff(lit(asOf).cast("date"), col("borrow_date"))))
      .withColumn("overdue_days",
        greatest(
          when(col("return_date").isNotNull, datediff(col("return_date"), col("due_date")))
            .otherwise(datediff(lit(asOf).cast("date"), col("due_date"))),
          lit(0)))
      .groupBy(dateKey(col("borrow_date")).as("date_key"), col("member_key"), col("book_key"))
      .agg(
        max(col("duration_days")).cast("long").as("duration_days"),
        max(col("overdue_days")).cast("long").as("overdue_days"),
        count(lit(1)).cast("long").as("n_collapsed"))

  /** FactPurchase (ref 05_InitialLoading.sql:322-340): PO-line grain. */
  def factPurchase(details: DataFrame, orders: DataFrame, titles: DataFrame, dimB: DataFrame, dimS: DataFrame): DataFrame =
    details
      .join(orders.select("po_id", "purchase_date", "supplier_id"), Seq("po_id"))
      .join(broadcast(titles.select("book_id", "purchase_price")), Seq("book_id"))
      .join(broadcast(currentOf(dimB).select("book_id", "book_key")), Seq("book_id"))
      .join(broadcast(currentOf(dimS).select("supplier_id", "supplier_key")), Seq("supplier_id"))
      .select(
        col("po_id"), col("line_no"),
        dateKey(col("purchase_date")).as("date_key"),
        col("book_key"), col("supplier_key"),
        col("quantity").cast("long").as("quantity"),
        (col("quantity") * col("purchase_price")).cast(DecimalType(12, 2)).as("line_total"))

  /** Full initial load over derived OLTP tables. */
  def apply(spark: SparkSession, t: LibraryTables, asOf: String = "2024-06-30"): DwTables = {
    val dd   = DimDate.build(spark, "2004-01-01", "2025-12-31")
    val dimM = dimMembers(t.members, asOf).cache()
    val dimB = dimBook(t.bookTitles).cache()
    val dimS = dimSuppliers(t.suppliers).cache()
    DwTables(
      dimDate = dd,
      dimMembers = dimM,
      dimBook = dimB,
      dimSuppliers = dimS,
      factSales = factSales(t.salesDetails, t.salesOrders, dimB, dimM),
      factBorrowing = factBorrowing(t.borrowedBooks, t.bookCopies, dimB, dimM, asOf),
      factPurchase = factPurchase(t.purchaseDetails, t.purchaseOrders, t.bookTitles, dimB, dimS))
  }
}
