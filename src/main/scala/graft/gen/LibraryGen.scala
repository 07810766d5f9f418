package graft.gen

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Seeded synthetic generators for the reference's library domain
  * (SURVEY §0 layer 2) — the Spark rewrite of the 8 PL/SQL generator
  * procedures, set-based instead of row-at-a-time loops.
  *
  * Determinism: the reference uses DBMS_RANDOM (irreproducible across
  * runs); here every "random" draw is a pure function of (seed, row id)
  * via xxhash64 — stable across partitionings, re-runs, and cluster
  * sizes, which `rand(seed)` is NOT (it seeds per-partition).
  *
  * Scale posture: every generator is `spark.range(n)` + projections —
  * embarrassingly parallel, no driver loop, no shuffle except where the
  * domain genuinely requires a join (e.g. borrow events → valid members).
  *
  * Volume targets follow the reference config (BASELINE.md):
  * 7,500 members / 9,000 titles / 45,000 copies / ~200k borrows /
  * ~55k sales orders / ~480 POs / 15 suppliers / 64 discounts over the
  * business window 2004-07-01 → 2024-06-30.
  */
object LibraryGen {

  val WindowStart = "2004-07-01"
  val WindowEnd   = "2024-06-30"
  val WindowDays  = 7305

  /** Uniform [0, 1) draw as a pure function of (seed, key). */
  private def u(seed: Long, key: Column): Column =
    pmod(xxhash64(lit(seed), key), lit(1000000L)).cast("double") / 1000000d

  /** Uniform integer in [lo, hi] as a pure function of (seed, key). */
  private def uniInt(seed: Long, key: Column, lo: Int, hi: Int): Column =
    (pmod(xxhash64(lit(seed), key), lit((hi - lo + 1).toLong)) + lo).cast("int")

  /** Pick one of a fixed candidate list, keyed. */
  private def pickOne(seed: Long, key: Column, choices: Seq[String]): Column =
    element_at(array(choices.map(lit): _*), (pmod(xxhash64(lit(seed), key), lit(choices.size.toLong)) + 1).cast("int"))

  /** Random date within the business window, keyed. */
  private def rndDate(seed: Long, key: Column): Column =
    date_add(lit(WindowStart).cast("date"), pmod(xxhash64(lit(seed), key), lit(WindowDays.toLong)).cast("int"))

  /** fmt_id: prefix + zero-padded number (ref 01_helpers.sql:48-53). */
  def fmtId(prefix: String, n: Column, len: Int): Column =
    concat(lit(prefix), lpad(n.cast("string"), len, "0"))

  private val genres = Seq(
    "Fiction", "Mystery", "Romance", "SciFi", "Fantasy", "Biography", "History",
    "Science", "Travel", "Cooking", "Art", "Poetry", "Children", "Business")
  private val states = Seq(
    "Selangor", "Johor", "Penang", "Sabah", "Sarawak", "Perak", "Kedah", "Kelantan")
  private val cities = Seq(
    "Shah Alam", "Johor Bahru", "George Town", "Kota Kinabalu", "Kuching", "Ipoh")

  /** Members (ref 02_InsertMembers.sql:46-185): 7,500 rows, ~75% active,
    * registration spread over the window, gender split ~65% F. */
  def members(spark: SparkSession, n: Int = 7500, seed: Long = 42): DataFrame = {
    val base = spark.range(1, n + 1L).toDF("seq")
    base.select(
      fmtId("M", col("seq"), 4).as("member_id"),
      concat(lit("Member "), col("seq")).as("member_name"),
      when(u(seed ^ 1, col("seq")) < 0.65, "F").otherwise("M").as("member_gender"),
      uniInt(seed ^ 2, col("seq"), 18, 80).as("member_age"),
      concat(lit("01"), lpad(pmod(xxhash64(lit(seed ^ 3), col("seq")), lit(100000000L)).cast("string"), 8, "0"))
        .as("member_phone"),
      concat(lit("member"), col("seq"), lit("@mail.example")).as("member_email"),
      // address: "street, city, state" — DimMembers parses state/city back out
      concat(
        col("seq"), lit(" Jalan Utama, "),
        pickOne(seed ^ 4, col("seq"), cities), lit(", "),
        pickOne(seed ^ 5, col("seq"), states)).as("member_address"),
      rndDate(seed ^ 6, col("seq")).as("registration_date"),
      uniInt(seed ^ 7, col("seq"), 0, 3).as("renewals"))
      .withColumn("expire_date",
        date_sub(add_months(col("registration_date"), (col("renewals") + 1) * 12), 1))
      .drop("renewals")
  }

  /** BookTitles (ref 04_InsertBookTitles.sql): 9,000 titles, 14 genres,
    * sales price 15–150, purchase price = 0.8 × sales. */
  def bookTitles(spark: SparkSession, n: Int = 9000, seed: Long = 42): DataFrame = {
    spark.range(1, n + 1L).toDF("seq").select(
      fmtId("B", col("seq"), 5).as("book_id"),
      concat(lit("Title "), col("seq")).as("title"),
      concat(lit("Author "), pmod(col("seq"), lit(997))).as("author"),
      pickOne(seed ^ 10, col("seq"), genres).as("genre"),
      uniInt(seed ^ 11, col("seq"), 1980, 2024).as("publication_year"),
      (uniInt(seed ^ 12, col("seq"), 1500, 15000).cast("double") / 100).cast(DecimalType(6, 2)).as("sales_price"),
      (uniInt(seed ^ 13, col("seq"), 0, 50).cast("double") / 10).cast(DecimalType(2, 1)).as("popularity"))
      .withColumn("purchase_price",
        (col("sales_price") * lit("0.8").cast(DecimalType(2, 1))).cast(DecimalType(6, 2)))
  }

  /** BookCopies (ref 05_InsertBookCopies.sql): 45,000 copies spread over
    * titles; status seeded Available (derivations flip to borrowed). */
  def bookCopies(spark: SparkSession, n: Int = 45000, titles: Int = 9000, seed: Long = 42): DataFrame = {
    spark.range(1, n + 1L).toDF("seq").select(
      fmtId("C", col("seq"), 6).as("copy_id"),
      fmtId("B", pmod(xxhash64(lit(seed ^ 20), col("seq")), lit(titles.toLong)) + 1, 5).as("book_id"),
      rndDate(seed ^ 21, col("seq")).as("acquired_date"),
      lit("Available").as("copy_status"))
  }

  /** Suppliers (ref 10_InsertSuppliers.sql): 15 static suppliers. */
  def suppliers(spark: SparkSession): DataFrame = {
    spark.range(1, 16).toDF("seq").select(
      fmtId("S", col("seq"), 3).as("supplier_id"),
      concat(lit("Supplier "), col("seq")).as("supplier_name"),
      concat(lit("supplier"), col("seq"), lit("@books.example")).as("supplier_email"),
      pickOne(99, col("seq"), states).as("supplier_state"))
  }

  /** Discounts (ref 11_InsertDiscount.sql): 64 windows D000–D063, each a
    * month-long window with a 5–30% rate, spread over the 20 years. */
  def discounts(spark: SparkSession, seed: Long = 42): DataFrame = {
    spark.range(0, 64).toDF("seq").select(
      fmtId("D", col("seq"), 3).as("discount_id"),
      concat(lit("Promo "), col("seq")).as("discount_name"),
      (uniInt(seed ^ 30, col("seq"), 1, 6) * 5).cast(DecimalType(4, 1)).as("discount_rate"),
      date_add(lit(WindowStart).cast("date"), (col("seq") * 114).cast("int")).as("start_date"))
      .withColumn("end_date", date_add(col("start_date"), 30))
  }

  /** BorrowedBooks (ref 06_InsertBorrowedBooks.sql): ~36 events per
    * weekday over the window (~190k), weekends skipped, status mix
    * 85% Returned / 8% Overdue / 2% Lost / 5% On loan. */
  def borrowedBooks(spark: SparkSession, members: DataFrame, copies: DataFrame, seed: Long = 42): DataFrame = {
    val mCount = members.count()
    val cCount = copies.count()
    // weekday spine × events-per-day, fully set-based
    val days = spark.sql(
      s"SELECT explode(sequence(DATE'$WindowStart', DATE'$WindowEnd', interval 1 day)) AS d")
      .filter(weekday(col("d")) < 5)
    val perDay = days.select(col("d"), explode(sequence(lit(1), lit(36))).as("slot"))
    // id = dayIndex*40 + slot: unique without a global row_number (which
    // would single-partition the generator; dense ids aren't needed here)
    val events = perDay.select(
      (datediff(col("d"), lit(WindowStart).cast("date")) * 40 + col("slot")).cast("long").as("seq"),
      col("d").as("borrow_date"))
    val keyed = events.select(
      fmtId("BR", col("seq"), 7).as("borrow_id"),
      col("borrow_date"),
      fmtId("M", pmod(xxhash64(lit(seed ^ 40), col("seq")), lit(mCount)) + 1, 4).as("member_id"),
      fmtId("C", pmod(xxhash64(lit(seed ^ 41), col("seq")), lit(cCount)) + 1, 6).as("copy_id"),
      u(seed ^ 42, col("seq")).as("statusDraw"),
      uniInt(seed ^ 43, col("seq"), 1, 7).as("lateDays"))
    keyed
      .withColumn("due_date", date_add(col("borrow_date"), 14))
      .withColumn("return_status",
        when(col("statusDraw") < 0.85, "Returned")
          .when(col("statusDraw") < 0.93, "Overdue")
          .when(col("statusDraw") < 0.95, "Lost")
          .otherwise("On loan"))
      .withColumn("return_date",
        when(col("return_status") === "Returned", date_add(col("borrow_date"), pmod(xxhash64(lit(seed ^ 44), col("borrow_id")), lit(14L)).cast("int")))
          .when(col("return_status") === "Overdue", date_add(col("due_date"), col("lateDays"))))
      .drop("statusDraw", "lateDays")
  }

  /** Sales orders + lines (ref 13_InsertSalesAndOrders.sql): 5–10 orders
    * per day (~55k orders), 1–6 lines each, qty 1–4. Orders carry the
    * discount active on their sales date (BookOrders.discountId,
    * 01_Create.sql:225-236) — valid by construction, which is exactly the
    * invariant trg_BookOrders_DiscDate enforces (02_Trigger.sql:383-409).
    * Returns (orders, details). */
  def sales(spark: SparkSession, titles: DataFrame, members: DataFrame, seed: Long = 42): (DataFrame, DataFrame) = {
    val tCount = titles.count()
    val mCount = members.count()
    val days = spark.sql(
      s"SELECT explode(sequence(DATE'$WindowStart', DATE'$WindowEnd', interval 1 day)) AS d")
    val perDay = days.select(col("d"), explode(sequence(lit(1), lit(10))).as("slot"))
      .filter(col("slot") <= uniInt(seed ^ 50, xxhash64(col("d")), 5, 10))
    val orders = perDay.select(
      (datediff(col("d"), lit(WindowStart).cast("date")) * 12 + col("slot")).cast("long").as("seq"),
      col("d").as("sales_date"))
      .select(
        fmtId("SO", col("seq"), 6).as("order_id"),
        col("sales_date"),
        fmtId("M", pmod(xxhash64(lit(seed ^ 51), col("seq")), lit(mCount)) + 1, 4).as("member_id"),
        uniInt(seed ^ 52, col("seq"), 1, 6).as("n_lines"))
      // discount active on the sales date (at most one window per date in
      // the generated calendar; max picks deterministically if they ever
      // overlap) — NULL outside every window
      .join(
        broadcast(discounts(spark, seed).select(col("discount_id"), col("start_date"), col("end_date"))),
        col("sales_date").between(col("start_date"), col("end_date")), "left_outer")
      .groupBy(col("order_id"), col("sales_date"), col("member_id"), col("n_lines"))
      .agg(max(col("discount_id")).as("discount_id"))
    val details = orders
      .select(col("order_id"), col("sales_date"), explode(sequence(lit(1), col("n_lines"))).as("line_no"))
      .select(
        col("order_id"), col("sales_date"), col("line_no"),
        fmtId("B", pmod(xxhash64(lit(seed ^ 53), concat(col("order_id"), col("line_no"))), lit(tCount)) + 1, 5)
          .as("book_id"),
        uniInt(seed ^ 54, concat(col("order_id"), col("line_no")), 1, 4).as("quantity"))
    (orders.drop("n_lines"), details)
  }

  /** Staff (ref 03_InsertStaffShift.sql:2-22): 11 static staff across the
    * 5 roles (1 manager, 2 assistants, 4 librarians, 2 security,
    * 2 cleaners); names/contacts synthetic. */
  def staff(spark: SparkSession): DataFrame = {
    spark.range(1, 12).toDF("seq").select(
      fmtId("S", col("seq"), 3).as("staff_id"),
      concat(lit("Staff "), col("seq")).as("staff_name"),
      concat(lit("staff"), col("seq"), lit("@library.example")).as("staff_email"),
      concat(lit("01"), lpad(col("seq").cast("string"), 8, "7")).as("staff_phone"),
      when(col("seq") === 1, "manager")
        .when(col("seq") <= 3, "assistant")
        .when(col("seq") <= 7, "librarian")
        .when(col("seq") <= 9, "security")
        .otherwise("cleaner").as("staff_role"))
  }

  /** Shift (ref 03_InsertStaffShift.sql:24-45): the 11 static shift
    * definitions with their start/end times-of-day. */
  def shifts(spark: SparkSession): DataFrame = {
    import spark.implicits._
    Seq(
      ("SH01", "Librarians Morning", "09:00:00", "15:30:00"),
      ("SH02", "Librarians Evening", "15:30:00", "22:00:00"),
      ("SH03", "Librarians FullDay", "09:00:00", "22:00:00"),
      ("SH04", "Assistants Morning", "09:00:00", "15:30:00"),
      ("SH05", "Assistants Evening", "15:30:00", "22:00:00"),
      ("SH06", "Assistants FullDay", "09:00:00", "22:00:00"),
      ("SH07", "Manager Duty", "09:00:00", "17:00:00"),
      ("SH08", "Security Morning", "09:00:00", "15:30:00"),
      ("SH09", "Security Evening", "15:30:00", "22:00:00"),
      ("SH10", "Cleaner Afternoon", "12:00:00", "14:00:00"),
      ("SH11", "Cleaner Night", "20:00:00", "22:00:00")
    ).toDF("shift_id", "shift_name", "start_time", "end_time")
  }

  /** ShiftSchedules (DDL 01_Create.sql:145-154; the reference ships no
    * data generator for this table): every staff member works every
    * weekday, shift picked from the role's eligible set (morning/evening
    * 45/45, full-day 10% where the role has one). UNIQUE (staffId,
    * shiftDate) holds by construction. */
  def shiftSchedules(spark: SparkSession, staffDf: DataFrame, seed: Long = 42): DataFrame = {
    val days = spark.sql(
      s"SELECT explode(sequence(DATE'$WindowStart', DATE'$WindowEnd', interval 1 day)) AS shift_date")
      .filter(weekday(col("shift_date")) < 5)
    val d = u(seed ^ 90, xxhash64(col("staff_id"), col("shift_date")))
    days.crossJoin(broadcast(staffDf.select("staff_id", "staff_role")))
      .withColumn("shift_id",
        when(col("staff_role") === "manager", "SH07")
          .when(col("staff_role") === "librarian",
            when(d < 0.45, "SH01").when(d < 0.90, "SH02").otherwise("SH03"))
          .when(col("staff_role") === "assistant",
            when(d < 0.45, "SH04").when(d < 0.90, "SH05").otherwise("SH06"))
          .when(col("staff_role") === "security", when(d < 0.5, "SH08").otherwise("SH09"))
          .otherwise(when(d < 0.5, "SH10").otherwise("SH11")))
      .select(
        concat(lit("SC"), substring(col("staff_id"), 2, 3),
          lpad(datediff(col("shift_date"), lit(WindowStart).cast("date")).cast("string"), 5, "0"))
          .as("schedule_id"),
        col("shift_id"), col("staff_id"), col("shift_date"))
  }

  /** StaffAttendance (DDL 01_Create.sql:157-168): ~3% absences; otherwise
    * punch-in −10..+29 min around the scheduled start (a positive offset
    * makes trg_auto_mark_late's derivation flag 'Late') and punch-out
    * 0..14 min past the scheduled end. attendanceStatus is left 'Present'
    * for the trigger derivation (Derivations.attendanceStatus) to fill,
    * mirroring the BEFORE INSERT trigger. */
  def staffAttendance(schedules: DataFrame, shiftsDf: DataFrame, seed: Long = 42): DataFrame = {
    val sched = schedules.join(broadcast(shiftsDf.select("shift_id", "start_time", "end_time")), Seq("shift_id"))
    val absent = u(seed ^ 91, col("schedule_id")) < 0.03
    val startOffsetMin = uniInt(seed ^ 92, col("schedule_id"), -10, 29)
    val endOffsetMin   = uniInt(seed ^ 93, col("schedule_id"), 0, 14)
    def at(time: Column, offsetMin: Column) =
      timestamp_seconds(unix_timestamp(to_timestamp(concat(col("shift_date"), lit(" "), time)))
        + offsetMin.cast("long") * 60)
    sched.select(
      concat(lit("A"), substring(col("schedule_id"), 3, 10)).as("attendance_id"),
      col("schedule_id"),
      lit("Present").as("attendance_status"),
      when(absent, lit(null).cast("timestamp"))
        .otherwise(at(col("start_time"), startOffsetMin)).as("actual_start_time"),
      when(absent, lit(null).cast("timestamp"))
        .otherwise(at(col("end_time"), endOffsetMin)).as("actual_end_time"))
  }

  /** Fines (ref 08_InsertFines.sql:46-108), set-based — three MERGE
    * sources become three filters over the borrow log:
    *   Lost Book:   returnStatus = 'Lost', fineDate = least(nvl(return,
    *                due+1), windowEnd);
    *   Late Return: returned 1..7 days past due → fineDate = returnDate;
    *   Damage:      ~3% of returned (seeded draw) → fineDate = returnDate.
    * Amounts are left NULL — TRG_CALCULATE_FINE_AMOUNT semantics live in
    * [[graft.etl.Derivations.fineAmounts]], which fills them exactly like
    * the trigger's WHEN (NEW.fineAmount IS NULL) path.
    * fine_id = 'F' + borrow digits + type code: the reference MERGEs on
    * (borrowId, fineType), so that pair IS the natural key — no global
    * sequence needed (a sequence would single-partition the generator). */
  def fines(borrows: DataFrame, copies: DataFrame, damageRate: Double = 0.03, seed: Long = 42): DataFrame = {
    val b = borrows.join(broadcast(copies.select("copy_id", "book_id")), Seq("copy_id"))
    val lost = b.filter(upper(col("return_status")) === "LOST")
      .select(col("borrow_id"), col("book_id"), col("member_id"),
        lit("Lost Book").as("fine_type"),
        least(coalesce(col("return_date"), date_add(col("due_date"), 1)),
          lit(WindowEnd).cast("date")).as("fine_date"))
    val late = b.filter(col("return_date").isNotNull
        && upper(col("return_status")).isin("OVERDUE", "RETURNED")
        && greatest(datediff(col("return_date"), col("due_date")), lit(0)).between(1, 7))
      .select(col("borrow_id"), col("book_id"), col("member_id"),
        lit("Late Return").as("fine_type"), col("return_date").as("fine_date"))
    val damage = b.filter(upper(col("return_status")) === "RETURNED"
        && col("return_date").isNotNull
        && u(seed ^ 70, col("borrow_id")) < damageRate)
      .select(col("borrow_id"), col("book_id"), col("member_id"),
        lit("Damage").as("fine_type"), col("return_date").as("fine_date"))
    lost.unionByName(late).unionByName(damage)
      .withColumn("fine_id",
        concat(lit("F"), substring(col("borrow_id"), 3, 10), lit("-"),
          upper(substring(col("fine_type"), 1, 2))))
      .withColumn("fine_status", lit("Unpaid"))
      .withColumn("payment_id", lit(null).cast("string"))
  }

  /** Payments (ref 07_InsertPayments.sql + 08_InsertFines.sql:154-193).
    *
    * Membership registrations: ~15/month over the window, member and date
    * seeded draws (the reference's 60% share of ~25/month).
    *
    * Fines payments: the reference loops monthly payment events, each
    * paying that member's ≤2 OLDEST unpaid fines (Lost Book first) dated
    * on or before the payment. Set-based equivalent: per member, order
    * fines (lost first, oldest first), pair consecutive fines, and let a
    * seeded draw decide how many leading pairs the member actually pays
    * (80% none / 15% one / 5% two) — same invariants (≤2 fines per
    * payment, oldest-first prefix paid, fineDate ≤ paymentDate, payment
    * amount = Σ linked fines via the trigger derivation), no sequential
    * driver loop. Amounts left NULL for Derivations.paymentAmounts.
    *
    * @return (payments without pay_amount, fine→payment links) */
  def payments(spark: SparkSession, members: DataFrame, fines: DataFrame, seed: Long = 42): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val methods = Seq("Tng", "Cash", "Duitnow")

    val mCount = members.count()
    val regMonths = spark.sql(
      s"SELECT explode(sequence(DATE'$WindowStart', DATE'$WindowEnd', interval 1 month)) AS m")
    val reg = regMonths.select(col("m"), explode(sequence(lit(1), lit(15))).as("slot"))
      .select((months_between(col("m"), lit(WindowStart).cast("date")).cast("long") * 16 + col("slot")).as("seq"), col("m"))
      .select(
        fmtId("P0", col("seq"), 6).as("payment_id"),
        fmtId("M", pmod(xxhash64(lit(seed ^ 81), col("seq")), lit(mCount)) + 1, 4).as("member_id"),
        least(date_add(col("m"), pmod(xxhash64(lit(seed ^ 82), col("seq")), lit(28L)).cast("int")),
          lit(WindowEnd).cast("date")).as("payment_date"),
        pickOne(seed ^ 83, col("seq"), methods).as("payment_method"),
        lit("Membership Registration").as("payment_type"),
        fmtId("R0", col("seq"), 6).as("receipt_no"))

    // fines payments: pair the member's fines lost-first/oldest-first,
    // keep a seeded number of leading pairs per member
    val w = Window.partitionBy("member_id")
      .orderBy(col("is_lost").desc, col("fine_date"), col("fine_id"))
    val ranked = fines
      .withColumn("is_lost", (col("fine_type") === "Lost Book").cast("int"))
      .withColumn("pair_idx", ((row_number().over(w) - 1) / 2).cast("int"))
      .withColumn("k_draw", u(seed ^ 84, xxhash64(col("member_id"))))
      .withColumn("k_pairs", when(col("k_draw") < 0.80, 0).when(col("k_draw") < 0.95, 1).otherwise(2))
    val paid = ranked.filter(col("pair_idx") < col("k_pairs"))
      .withColumn("payment_id",
        concat(lit("P1"), lpad(substring(col("member_id"), 2, 10), 5, "0"),
          lpad(col("pair_idx").cast("string"), 2, "0")))
    val finePays = paid.groupBy(col("payment_id"), col("member_id"))
      .agg(max(col("fine_date")).as("last_fine_date"))
      .select(
        col("payment_id"), col("member_id"),
        // paymentDate ≥ every linked fineDate by construction
        least(date_add(col("last_fine_date"),
          pmod(xxhash64(lit(seed ^ 85), col("payment_id")), lit(31L)).cast("int")),
          lit(WindowEnd).cast("date")).as("payment_date"),
        pickOne(seed ^ 86, xxhash64(col("payment_id")), methods).as("payment_method"),
        lit("Fines").as("payment_type"),
        concat(lit("R1"), substring(col("payment_id"), 3, 10)).as("receipt_no"))

    (reg.unionByName(finePays), paid.select(col("fine_id"), col("payment_id")))
  }

  /** Purchase orders + lines (ref 12_InsertPurchase.sql): ~2 POs per month
    * (~480), 7–10 lines each, qty 5–40. Returns (orders, details). */
  def purchases(spark: SparkSession, titles: DataFrame, seed: Long = 42): (DataFrame, DataFrame) = {
    val tCount = titles.count()
    val months = spark.sql(
      s"SELECT explode(sequence(DATE'$WindowStart', DATE'$WindowEnd', interval 1 month)) AS m")
    val perMonth = months.select(col("m"), explode(sequence(lit(1), lit(2))).as("slot"))
    val orders = perMonth.select(
      (months_between(col("m"), lit(WindowStart).cast("date")).cast("long") * 4 + col("slot")).as("seq"),
      col("m"), col("slot"))
      .select(
        fmtId("PO", col("seq"), 4).as("po_id"),
        date_add(col("m"), pmod(xxhash64(lit(seed ^ 60), col("seq")), lit(28L)).cast("int")).as("purchase_date"),
        fmtId("S", pmod(xxhash64(lit(seed ^ 61), col("seq")), lit(15L)) + 1, 3).as("supplier_id"),
        uniInt(seed ^ 62, col("seq"), 7, 10).as("n_lines"))
    val details = orders
      .select(col("po_id"), explode(sequence(lit(1), col("n_lines"))).as("line_no"))
      .select(
        col("po_id"), col("line_no"),
        fmtId("B", pmod(xxhash64(lit(seed ^ 63), concat(col("po_id"), col("line_no"))), lit(tCount)) + 1, 5)
          .as("book_id"),
        uniInt(seed ^ 64, concat(col("po_id"), col("line_no")), 5, 40).as("quantity"))
    (orders.drop("n_lines"), details)
  }
}

/** All generated OLTP tables, materialized once. */
final case class LibraryTables(
    members: DataFrame,
    bookTitles: DataFrame,
    bookCopies: DataFrame,
    suppliers: DataFrame,
    discounts: DataFrame,
    borrowedBooks: DataFrame,
    salesOrders: DataFrame,
    salesDetails: DataFrame,
    purchaseOrders: DataFrame,
    purchaseDetails: DataFrame,
    fines: DataFrame,
    payments: DataFrame,
    staff: DataFrame,
    shifts: DataFrame,
    shiftSchedules: DataFrame,
    staffAttendance: DataFrame)

object LibraryTables {
  /** Generate the full OLTP layer at a volume scale (1.0 = reference). */
  def generate(spark: SparkSession, scale: Double = 1.0, seed: Long = 42): LibraryTables = {
    val m  = LibraryGen.members(spark, math.max(1, (7500 * scale).toInt), seed).cache()
    val bt = LibraryGen.bookTitles(spark, math.max(1, (9000 * scale).toInt), seed).cache()
    val bc = LibraryGen.bookCopies(spark, math.max(1, (45000 * scale).toInt),
      math.max(1, (9000 * scale).toInt), seed).cache()
    val sup = LibraryGen.suppliers(spark)
    val dis = LibraryGen.discounts(spark, seed)
    val bb  = LibraryGen.borrowedBooks(spark, m, bc, seed).cache()
    val (so, sd) = LibraryGen.sales(spark, bt, m, seed)
    val (po, pd) = LibraryGen.purchases(spark, bt, seed)
    val fn0 = LibraryGen.fines(bb, bc, seed = seed).cache()
    val (pay, links) = LibraryGen.payments(spark, m, fn0, seed)
    // attach the generator's fine→payment links (amounts/status stay for
    // the trigger derivations, Derivations.applyAll)
    val fn = fn0.drop("payment_id").join(links, Seq("fine_id"), "left_outer")
    val st  = LibraryGen.staff(spark)
    val sh  = LibraryGen.shifts(spark)
    val ss  = LibraryGen.shiftSchedules(spark, st, seed)
    val sa  = LibraryGen.staffAttendance(ss, sh, seed)
    LibraryTables(m, bt, bc, sup, dis, bb, so, sd, po, pd, fn, pay, st, sh, ss, sa)
  }
}
