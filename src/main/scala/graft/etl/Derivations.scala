package graft.etl

import graft.gen.LibraryTables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The reference's trigger logic (SURVEY §2.10) as deterministic batch
  * derivations, applied in dependency order. Spark has no row triggers;
  * each rule is a set-based join/projection over the whole table — which
  * is also the only formulation that scales (the reference disables these
  * triggers during bulk load for exactly this reason,
  * 12_InsertPurchase.sql:9-10).
  */
object Derivations {

  /** trg_auto_expire_membership (02_Trigger.sql:2-11): status from
    * expire_date vs the as-of date. */
  def memberStatus(members: DataFrame, asOf: String): DataFrame =
    members.withColumn("member_status",
      when(col("expire_date") < lit(asOf).cast("date"), "Expire").otherwise("Active"))

  /** TRG_MANAGE_BOOK_STATUS_BB (02_Trigger.sql:45-99): a copy is
    * 'Borrowed' while any open loan exists — semi-join on open loans. */
  def copyStatus(copies: DataFrame, borrows: DataFrame): DataFrame = {
    val open = borrows.filter(col("return_status") === "On loan").select("copy_id").distinct()
    copies
      .join(open.withColumn("is_open", lit(1)), Seq("copy_id"), "left_outer")
      .withColumn("copy_status", when(col("is_open").isNotNull, "Borrowed").otherwise(col("copy_status")))
      .drop("is_open")
  }

  /** TRG_CALCULATE_FINE_AMOUNT (02_Trigger.sql:199-224): Lost =
    * salesPrice + 20, Damage = salesPrice, Late = 30. NB the reference's
    * generator prices from purchasePrice instead (08_InsertFines.sql:50)
    * — `fromPurchasePrice = true` reproduces generator semantics, false
    * the trigger's. */
  def fineAmounts(fines: DataFrame, titles: DataFrame, fromPurchasePrice: Boolean = false): DataFrame = {
    val priceCol = if (fromPurchasePrice) col("purchase_price") else col("sales_price")
    fines
      .join(broadcast(titles.select(col("book_id"), priceCol.as("price"))), Seq("book_id"), "left_outer")
      .withColumn("fine_amount",
        when(col("fine_type") === "Lost Book", (col("price") + 20).cast(DecimalType(8, 2)))
          .when(col("fine_type") === "Damage", col("price").cast(DecimalType(8, 2)))
          .otherwise(lit(30).cast(DecimalType(8, 2))))
      .drop("price")
  }

  /** TRG_CALCULATE_PAYMENT_AMOUNT (02_Trigger.sql:227-246): payment =
    * Σ linked fines; membership registration = flat 50. */
  def paymentAmounts(payments: DataFrame, fines: DataFrame): DataFrame = {
    val fineTotals = fines.filter(col("payment_id").isNotNull)
      .groupBy("payment_id")
      .agg(sum(col("fine_amount")).cast(DecimalType(8, 2)).as("fine_total"))
    payments
      .join(fineTotals, Seq("payment_id"), "left_outer")
      .withColumn("pay_amount",
        when(col("payment_type") === "Membership Registration", lit(50).cast(DecimalType(8, 2)))
          .otherwise(coalesce(col("fine_total"), lit(0).cast(DecimalType(8, 2)))))
      .drop("fine_total")
  }

  /** TRG_MANAGE_PAYMENTS (02_Trigger.sql:271-297): a 'Fines' payment with
    * an amount marks its linked fines 'Paid' — the reference's only
    * cross-table trigger UPDATE, as a semi-join flip. */
  def finePaymentStatus(fines: DataFrame, payments: DataFrame): DataFrame = {
    val paying = payments
      .filter(col("payment_type") === "Fines" && col("pay_amount").isNotNull)
      .select(col("payment_id")).distinct()
    fines
      .join(paying.withColumn("is_paid", lit(1)), Seq("payment_id"), "left_outer")
      .withColumn("fine_status", when(col("is_paid").isNotNull, "Paid").otherwise(col("fine_status")))
      .drop("is_paid")
  }

  /** trg_salesdetails_calc_amounts (02_Trigger.sql:412-455): per line,
    * gross = qty × salesPrice; discountAmount = round(gross·rate/100, 2)
    * when the sale date falls in a discount window; total = gross − disc. */
  def salesDetailAmounts(details: DataFrame, titles: DataFrame, discounts: DataFrame): DataFrame = {
    val priced = details
      .join(broadcast(titles.select("book_id", "sales_price")), Seq("book_id"), "left_outer")
      .withColumn("gross_amount", (col("quantity") * col("sales_price")).cast(DecimalType(10, 2)))
    // range-join against the (tiny) discount windows; at most one window
    // applies per date in the generated calendar — keep the max rate if
    // windows ever overlap (deterministic).
    val withDisc = priced
      .join(
        broadcast(discounts.select(col("discount_rate"), col("start_date"), col("end_date"))),
        col("sales_date").between(col("start_date"), col("end_date")), "left_outer")
      .groupBy(priced.columns.map(col).toIndexedSeq: _*)
      .agg(max(col("discount_rate")).as("discount_rate"))
    withDisc
      .withColumn("discount_amount",
        coalesce(
          round(col("gross_amount") * col("discount_rate") / 100, 2).cast(DecimalType(10, 2)),
          lit(0).cast(DecimalType(10, 2))))
      .withColumn("total_amount", (col("gross_amount") - col("discount_amount")).cast(DecimalType(10, 2)))
  }

  /** trg_check_purchase_total / trg_guard_po_total (02_Trigger.sql:303-379):
    * PO total = Σ qty × purchasePrice, recomputed (derivation) and
    * checkable (invariant). */
  def purchaseOrderTotals(orders: DataFrame, details: DataFrame, titles: DataFrame): DataFrame = {
    val lineTotals = details
      .join(broadcast(titles.select("book_id", "purchase_price")), Seq("book_id"), "left_outer")
      .groupBy("po_id")
      .agg(sum((col("quantity") * col("purchase_price")).cast(DecimalType(12, 2)))
        .cast(DecimalType(12, 2)).as("total_amount"))
    orders.join(lineTotals, Seq("po_id"), "left_outer")
  }

  /** trg_dimbook_unavail_to_copies (06_Type2_DimBook.sql:2-16): the
    * reference's only DW→OLTP propagation — a book marked Unavailable on
    * its CURRENT DimBook version flips every copy of that book to
    * 'Unavailable'. Set-based: semi-join flip on book_id (the trigger's
    * "avoid useless writes" guard is free here — unchanged rows project
    * through untouched). */
  def dimBookUnavailToCopies(copies: DataFrame, dimBook: DataFrame): DataFrame = {
    val unavailable = dimBook
      .filter(col("curr_ind") === "Y" && upper(col("book_status")) === "UNAVAILABLE")
      .select("book_id").distinct()
    copies
      .join(broadcast(unavailable.withColumn("is_unavail", lit(1))), Seq("book_id"), "left_outer")
      .withColumn("copy_status",
        when(col("is_unavail").isNotNull, "Unavailable").otherwise(col("copy_status")))
      .drop("is_unavail")
  }

  /** trg_auto_mark_late (02_Trigger.sql:104-123): attendance status from
    * the punch-in vs the scheduled shift start — Late when actualStart is
    * strictly past the scheduled start, Present otherwise, Absent when
    * there is no punch at all. Set-based: one broadcast join to the (tiny)
    * schedule→shift lookup, no per-row trigger. */
  def attendanceStatus(attendance: DataFrame, schedules: DataFrame, shifts: DataFrame): DataFrame = {
    val sched = schedules
      .join(broadcast(shifts.select("shift_id", "start_time")), Seq("shift_id"))
      .select(col("schedule_id"), col("shift_date"), col("start_time"))
    attendance
      .join(broadcast(sched), Seq("schedule_id"), "left_outer")
      .withColumn("attendance_status",
        when(col("actual_start_time").isNull, "Absent")
          .when(col("actual_start_time") >
            to_timestamp(concat(col("shift_date"), lit(" "), col("start_time"))), "Late")
          .otherwise("Present"))
      .drop("shift_date", "start_time")
  }

  /** trg_check_weekly_hours (02_Trigger.sql:126-159): per (staff, ISO
    * week) worked-hour totals with the reference's interval arithmetic —
    * EXTRACT(DAY)*24 + EXTRACT(HOUR) of (end − start), i.e. whole hours
    * truncated. The trigger rejects inserts pushing a week over 40; the
    * batch derivation reports each week with its over-limit flag instead
    * (a constraint scan, not a row veto). One shuffle on (staff, week). */
  def weeklyHours(attendance: DataFrame, schedules: DataFrame, limit: Int = 40): DataFrame =
    attendance
      .filter(col("actual_start_time").isNotNull && col("actual_end_time").isNotNull)
      .join(schedules.select("schedule_id", "staff_id", "shift_date"), Seq("schedule_id"))
      .withColumn("worked_hours",
        ((unix_micros(col("actual_end_time")) - unix_micros(col("actual_start_time")))
          / lit(3600000000L)).cast("long"))
      .groupBy(col("staff_id"), date_trunc("week", col("shift_date")).cast("date").as("week_start"))
      .agg(
        count(lit(1)).as("shifts_worked"),
        sum(col("worked_hours")).cast("long").as("week_hours"))
      .withColumn("over_limit", (col("week_hours") > limit).cast("int"))

  /** Apply the full rule set in dependency order over generated tables:
    * fine amounts before payment sums before the paid-status flip. */
  def applyAll(t: LibraryTables, asOf: String): LibraryTables = {
    val finesPriced = fineAmounts(t.fines, t.bookTitles)
    val paymentsAmt = paymentAmounts(t.payments, finesPriced)
    t.copy(
      members = memberStatus(t.members, asOf),
      bookCopies = copyStatus(t.bookCopies, t.borrowedBooks),
      salesDetails = salesDetailAmounts(t.salesDetails, t.bookTitles, t.discounts),
      purchaseOrders = purchaseOrderTotals(t.purchaseOrders, t.purchaseDetails, t.bookTitles),
      fines = finePaymentStatus(finesPriced, paymentsAmt),
      payments = paymentsAmt,
      staffAttendance = attendanceStatus(t.staffAttendance, t.shiftSchedules, t.shifts))
  }
}
