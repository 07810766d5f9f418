package graft.ops

import graft.etl.Derivations
import graft.gen.LibraryTables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-oracle coverage for the LIBRARY domain — closes the gap
  * where Q4/Q5 library reports and the 16 generators were pinned only
  * by golden hashes and never cross-checked by the DuckDB harness
  * (which by construction sees parquet files, not in-memory frames).
  *
  * The trick: the generated dataset is a pure function of (seed=42,
  * scale=0.1) — see gen/LibraryGen.scala's per-(seed,key) draws — so
  * each op PERSISTS the exact frames its report consumes to a fixed
  * parquet path inside the repo and the oracle SQL reads them back
  * with read_parquet(). The driver's execution order guarantees the
  * files exist before DuckDB runs: Verify materializes every query
  * (writing these side outputs) before the compare phase starts. From
  * then on the reports are rows+schema+hash-checked exactly like the
  * testdata queries.
  *
  * The reports themselves live in queries/LibraryReports.scala (one
  * (role|type, year)-grain shuffle each, dims broadcast); reference
  * anchors: 08_InsertFines.sql inspection queries (Q4),
  * 03_InsertStaffShift.sql + trg_auto_mark_late statuses (Q5).
  */
object LibraryOracleOps {

  /** Fixed location the oracle SQL references; inside the repo so no
    * foreign path is ever touched, deterministic at any launch cwd. */
  val DataDir = graft.Artifacts.Root + "/librarydata"

  // One-entry session cache instead of a SparkSession-keyed map: the
  // frames are deterministic (the golden specs pin their content) and
  // one session runs at a time in practice, so bounding the cache to the
  // CURRENT session keeps stopped sessions (and every DataFrame holding
  // them) collectable — the unbounded map retained them forever. All
  // access and every on-disk persist is serialized on this object, so
  // two sessions can never race overwrite-vs-read on a DataDir path.
  private final class SessionCache(val spark: SparkSession) {
    lazy val tables: LibraryTables =
      Derivations.applyAll(LibraryTables.generate(spark, scale = 0.1, seed = 42), asOf = "2024-06-30")
    val persisted = scala.collection.mutable.HashMap.empty[String, DataFrame]
    /** name → fully-built versioned store table (bootstrap + refresh
      * committed) for the lib_*_versioned ops; entries exist only for
      * COMPLETED builds (the EtlOps memo discipline). */
    val storeTables = scala.collection.mutable.HashMap.empty[String, String]
    lazy val dw: graft.etl.DwTables = {
      val d = graft.etl.InitialLoad(spark, tables)
      d.copy(
        dimDate = persistFrame(this, "dw_dim_date", d.dimDate),
        dimMembers = persistFrame(this, "dw_dim_members", d.dimMembers),
        dimBook = persistFrame(this, "dw_dim_book", d.dimBook),
        factSales = persistFrame(this, "dw_fact_sales", d.factSales),
        factBorrowing = persistFrame(this, "dw_fact_borrowing", d.factBorrowing),
        factPurchase = persistFrame(this, "dw_fact_purchase", d.factPurchase))
    }
  }

  @volatile private var cache: SessionCache = _

  private def forSession(spark: SparkSession): SessionCache = synchronized {
    if (cache == null || (cache.spark ne spark) || cache.spark.sparkContext.isStopped)
      cache = new SessionCache(spark)
    cache
  }

  private def derived(spark: SparkSession): LibraryTables = forSession(spark).tables

  // idempotent per (session, name): the frames are pure functions of
  // (seed, scale), so the second Bench repeat / a later op sharing a dim
  // must not pay the generate→derive→write pass again — only re-read
  private def persistFrame(c: SessionCache, name: String, df: DataFrame): DataFrame =
    synchronized {
      c.persisted.getOrElseUpdate(name, {
        df.coalesce(1).write.mode("overwrite").parquet(s"$DataDir/$name.parquet")
        df.sparkSession.read.parquet(s"$DataDir/$name.parquet")
      })
    }

  private def persist(name: String, df: DataFrame): DataFrame =
    persistFrame(forSession(df.sparkSession), name, df)

  // star-schema layer for the Q1–Q3 report oracles: InitialLoad over the
  // derived OLTP frames, with every frame a report touches swapped for
  // its persisted copy so both engines read the SAME parquet bytes
  private def persistedDw(spark: SparkSession): graft.etl.DwTables = forSession(spark).dw

  /** The `div10000(date_key)`-partitioned versioned FactSales (bootstrap
    * < 2024 + spec-carrying refresh ≥ 2023-07) — built once per session,
    * shared by lib_fact_partitioned (the pruned-read legs) and
    * lib_q1_versioned (the full Q1 report THROUGH the store). */
  private def factPartitionedTable(spark: SparkSession, dir: String): String = {
    val c = forSession(spark)
    val fsales = persistedDw(spark).factSales
    val spec = graft.etl.SnapshotStore.PartitionSpec("div10000", "date_key")
    synchronized {
      c.storeTables.getOrElseUpdate("fact_partitioned", {
        val t = EtlOps.freshStoreTable(dir, "lib_fact_part_")
        // one year per file: range-partition by the PARTITION VALUE
        val byYear = expr("CAST(date_key div 10000 AS BIGINT)")
        graft.etl.VersionedLoad.bootstrap(spark, t,
          fsales.filter(col("date_key") < 20240101L).repartitionByRange(8, byYear),
          asOfMicros = 1704067200000000L, // 2024-01-01T00:00:00Z, the load horizon
          statsCol = Some("date_key"), partitionSpec = Some(spec))
        // the refresh CARRIES the spec from the head manifest
        graft.etl.VersionedLoad.refresh(spark, t,
          fsales.filter(col("date_key") >= 20230701L).repartitionByRange(4, byYear),
          Seq("order_id", "line_no"),
          asOfMicros = 1735689600000000L) // 2025-01-01T00:00:00Z
        t
      })
    }
  }

  val ops: Seq[OpQuery] = Seq(
    // ── lib_q4_fine_revenue: fines→payments revenue/collection report
    // over the seed-42 generated library (fine typing, trigger-derived
    // amounts and Paid statuses all upstream in etl/Derivations). Both
    // engines read the SAME persisted parquet, so the full generator +
    // derivation stack is hash-verified, not just golden-pinned.
    OpQuery.checked(
      "lib_q4_fine_revenue",
      s"""WITH f AS (SELECT * FROM read_parquet('$DataDir/fines.parquet/*.parquet')),
         |p AS (SELECT payment_id, payment_date
         |      FROM read_parquet('$DataDir/payments.parquet/*.parquet')),
         |j AS (SELECT f.fine_date, f.fine_type, f.fine_amount, f.fine_status,
         |             p.payment_date
         |      FROM f LEFT JOIN p ON p.payment_id = f.payment_id
         |      WHERE year(f.fine_date) BETWEEN 2005 AND 2024)
         |SELECT CAST(year(fine_date) AS BIGINT) AS cal_year, fine_type,
         |       CAST(count(*) AS BIGINT) AS n_fines,
         |       CAST(sum(fine_amount) AS DOUBLE) AS billed,
         |       CAST(sum(CASE WHEN fine_status = 'Paid' THEN fine_amount ELSE 0 END) AS DOUBLE)
         |         AS collected,
         |       CAST(sum(CASE WHEN fine_status = 'Paid' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS collection_rate,
         |       CAST(sum(CASE WHEN payment_date IS NOT NULL
         |                     THEN date_diff('day', fine_date, payment_date) END) AS DOUBLE)
         |         / nullif(sum(CASE WHEN payment_date IS NOT NULL THEN 1 ELSE 0 END), 0)
         |         AS avg_days_to_pay
         |FROM j GROUP BY 1, 2""".stripMargin
    ) { (spark, _) =>
      val t = derived(spark)
      graft.queries.LibraryReports.q4FineRevenue(
        persist("fines", t.fines), persist("payments", t.payments))
    },

    // ── lib_q5_staff_util: staffing utilization per (role, year) with
    // the trigger-derived Late/Absent statuses and the reference's
    // truncated-hour arithmetic ((end−start) µs div 3600000000 — both
    // engines floor the positive quotient identically).
    OpQuery.checked(
      "lib_q5_staff_util",
      s"""WITH a AS (SELECT * FROM read_parquet('$DataDir/staff_attendance.parquet/*.parquet')),
         |s AS (SELECT schedule_id, staff_id, shift_date
         |      FROM read_parquet('$DataDir/shift_schedules.parquet/*.parquet')),
         |st AS (SELECT staff_id, staff_role
         |       FROM read_parquet('$DataDir/staff.parquet/*.parquet'))
         |SELECT st.staff_role, CAST(year(s.shift_date) AS BIGINT) AS cal_year,
         |       CAST(count(*) AS BIGINT) AS n_shifts,
         |       CAST(sum(CASE WHEN a.attendance_status = 'Absent' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS absence_rate,
         |       CAST(sum(CASE WHEN a.attendance_status = 'Late' THEN 1 ELSE 0 END) AS DOUBLE)
         |         / count(*) AS late_rate,
         |       CAST(sum(CASE WHEN a.actual_end_time IS NOT NULL
         |                     THEN (epoch_us(a.actual_end_time) - epoch_us(a.actual_start_time))
         |                          // 3600000000
         |                     ELSE 0 END) AS BIGINT) AS worked_hours
         |FROM a
         |JOIN s ON s.schedule_id = a.schedule_id
         |JOIN st ON st.staff_id = s.staff_id
         |GROUP BY 1, 2""".stripMargin
    ) { (spark, _) =>
      val t = derived(spark)
      graft.queries.LibraryReports.q5StaffUtilization(
        persist("staff", t.staff),
        persist("shift_schedules", t.shiftSchedules),
        persist("staff_attendance", t.staffAttendance))
    },

    // ── lib_q1_genre_sales: the reference's Q1 report (LQY_query1.txt:
    // 39-111) over the REAL library star schema — quarter pivot, YoY LAG,
    // top-5 genres per year — hash-checked through the persisted DW
    // parquet (generator → triggers → InitialLoad → report, end to end).
    OpQuery.checked(
      "lib_q1_genre_sales",
      s"""WITH fs AS (SELECT * FROM read_parquet('$DataDir/dw_fact_sales.parquet/*.parquet')
         |            WHERE date_key BETWEEN 20050101 AND 20241231),
         |dd AS (SELECT date_key, cal_year, cal_quarter
         |       FROM read_parquet('$DataDir/dw_dim_date.parquet/*.parquet')),
         |db AS (SELECT book_key, genre
         |       FROM read_parquet('$DataDir/dw_dim_book.parquet/*.parquet')),
         |dm AS (SELECT member_key
         |       FROM read_parquet('$DataDir/dw_dim_members.parquet/*.parquet')),
         |base AS (
         |  SELECT dd.cal_year, dd.cal_quarter, db.genre, sum(fs.total_amount) AS rev
         |  FROM fs JOIN dd USING (date_key) JOIN db USING (book_key) JOIN dm USING (member_key)
         |  GROUP BY 1, 2, 3),
         |piv AS (
         |  SELECT cal_year, genre,
         |         CAST(sum(CASE WHEN cal_quarter = 1 THEN rev ELSE 0 END) AS DOUBLE) AS q1_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 2 THEN rev ELSE 0 END) AS DOUBLE) AS q2_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 3 THEN rev ELSE 0 END) AS DOUBLE) AS q3_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 4 THEN rev ELSE 0 END) AS DOUBLE) AS q4_rev,
         |         sum(rev) AS tot_dec
         |  FROM base GROUP BY 1, 2),
         |r AS (
         |  SELECT *,
         |         lag(tot_dec) OVER (PARTITION BY genre ORDER BY cal_year) AS prev_tot,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY cal_year
         |                ORDER BY tot_dec DESC, genre ASC) AS BIGINT) AS rn
         |  FROM piv)
         |SELECT cal_year, genre, q1_rev, q2_rev, q3_rev, q4_rev,
         |       CAST(tot_dec AS DOUBLE) AS tot_rev,
         |       CAST(tot_dec - prev_tot AS DOUBLE) * 100 / CAST(prev_tot AS DOUBLE) AS yoy_pct,
         |       rn
         |FROM r WHERE rn <= 5""".stripMargin
    ) { (spark, _) =>
      graft.queries.LibraryReports.q1GenreSales(persistedDw(spark))
    },

    // ── lib_q2_primary_genre: Q2 (LQY_query2.txt:57-215) — spend
    // attributed to each PO's primary genre, densified over the
    // quarter × genre universe, QoQ LAG, top-5 per quarter; the
    // min(struct(−spend, genre)) primary pick is mirrored by the
    // oracle's (spend DESC, genre ASC) row_number.
    OpQuery.checked(
      "lib_q2_primary_genre",
      s"""WITH fp AS (SELECT * FROM read_parquet('$DataDir/dw_fact_purchase.parquet/*.parquet')
         |            WHERE date_key BETWEEN 20050101 AND 20241231),
         |dd AS (SELECT date_key, cal_year, cal_quarter
         |       FROM read_parquet('$DataDir/dw_dim_date.parquet/*.parquet')),
         |db AS (SELECT book_key, genre
         |       FROM read_parquet('$DataDir/dw_dim_book.parquet/*.parquet')),
         |pg AS (
         |  SELECT fp.po_id, dd.cal_year, dd.cal_quarter, db.genre,
         |         sum(fp.line_total) AS genre_spend
         |  FROM fp JOIN dd USING (date_key) JOIN db USING (book_key)
         |  GROUP BY 1, 2, 3, 4),
         |prim AS (
         |  SELECT po_id, cal_year, cal_quarter,
         |         sum(genre_spend) OVER (PARTITION BY po_id, cal_year, cal_quarter) AS po_spend,
         |         genre,
         |         ROW_NUMBER() OVER (PARTITION BY po_id, cal_year, cal_quarter
         |                ORDER BY genre_spend DESC, genre ASC) AS pick
         |  FROM pg),
         |attributed AS (
         |  SELECT cal_year, cal_quarter, genre,
         |         CAST(count(*) AS BIGINT) AS n_pos, sum(po_spend) AS spend_dec
         |  FROM prim WHERE pick = 1 GROUP BY 1, 2, 3),
         |dense AS (
         |  SELECT q.cal_year, q.cal_quarter, g.genre,
         |         coalesce(a.n_pos, 0) AS n_pos,
         |         coalesce(a.spend_dec, CAST(0 AS DECIMAL(18,2))) AS spend_dec
         |  FROM (SELECT DISTINCT cal_year, cal_quarter FROM attributed) q
         |  CROSS JOIN (SELECT DISTINCT genre FROM attributed) g
         |  LEFT JOIN attributed a
         |    ON a.cal_year = q.cal_year AND a.cal_quarter = q.cal_quarter AND a.genre = g.genre),
         |w AS (
         |  SELECT *,
         |         lag(spend_dec) OVER (PARTITION BY genre ORDER BY cal_year, cal_quarter)
         |           AS prev_spend,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY cal_year, cal_quarter
         |                ORDER BY spend_dec DESC, genre ASC) AS BIGINT) AS rn
         |  FROM dense)
         |SELECT cal_year, cal_quarter, genre, CAST(n_pos AS BIGINT) AS n_pos,
         |       CAST(spend_dec AS DOUBLE) AS spend,
         |       CAST(prev_spend AS DOUBLE) AS prev_spend,
         |       rn
         |FROM w
         |WHERE rn <= 5 AND NOT (spend_dec = 0 AND coalesce(prev_spend, 0) = 0)""".stripMargin
    ) { (spark, _) =>
      graft.queries.LibraryReports.q2PurchaseSpend(persistedDw(spark))
    },

    // ── lib_q3_margin_state: Q3 (LQY_query3.txt:62-135) — quarterly
    // gross margin by member state (cost = 0.8 × sales price, the
    // reference's purchase-price model), QoQ deltas with ALERT/GOOD/
    // STABLE signals; decimal arithmetic end-to-end, doubles only at
    // the edge.
    OpQuery.checked(
      "lib_q3_margin_state",
      s"""WITH fs AS (SELECT * FROM read_parquet('$DataDir/dw_fact_sales.parquet/*.parquet')
         |            WHERE date_key BETWEEN 20050101 AND 20241231),
         |dd AS (SELECT date_key, cal_year, cal_quarter
         |       FROM read_parquet('$DataDir/dw_dim_date.parquet/*.parquet')),
         |db AS (SELECT book_key, sales_price
         |       FROM read_parquet('$DataDir/dw_dim_book.parquet/*.parquet')),
         |dm AS (SELECT member_key, member_state
         |       FROM read_parquet('$DataDir/dw_dim_members.parquet/*.parquet')),
         |base AS (
         |  SELECT dd.cal_year, dd.cal_quarter, dm.member_state,
         |         sum(fs.total_amount) AS rev_dec,
         |         sum(db.sales_price * 0.8 * fs.quantity) AS cost_dec
         |  FROM fs JOIN dd USING (date_key) JOIN db USING (book_key) JOIN dm USING (member_key)
         |  GROUP BY 1, 2, 3),
         |w AS (
         |  SELECT *, rev_dec - cost_dec AS margin_dec,
         |         lag(rev_dec - cost_dec) OVER (PARTITION BY member_state
         |                ORDER BY cal_year, cal_quarter) AS prev_margin
         |  FROM base),
         |sig AS (
         |  SELECT *,
         |         CAST(margin_dec - prev_margin AS DOUBLE) * 100
         |           / CAST(prev_margin AS DOUBLE) AS qoq_pct
         |  FROM w)
         |SELECT cal_year, cal_quarter, member_state,
         |       CAST(rev_dec AS DOUBLE) AS revenue,
         |       CAST(cost_dec AS DOUBLE) AS cost,
         |       CAST(margin_dec AS DOUBLE) AS margin,
         |       qoq_pct,
         |       CASE WHEN qoq_pct IS NULL THEN 'N/A'
         |            WHEN qoq_pct < -10.0 THEN 'ALERT'
         |            WHEN qoq_pct > 10.0 THEN 'GOOD'
         |            ELSE 'STABLE' END AS signal
         |FROM sig""".stripMargin
    ) { (spark, _) =>
      graft.queries.LibraryReports.q3GrossMargin(persistedDw(spark))
    },

    // ── lib_fact_sales_versioned: the REFERENCE DOMAIN's incremental
    // fact refresh committed through the manifest-pointer store — what
    // etl_incremental_versioned demonstrates on TPC-H orders, run on
    // the actual library star (07_SubsequentLoading.sql:324-355's
    // FactSales MERGE): the pre-2023 FactSales slice bootstraps as
    // version 0 with its pinned load horizon, an overlapping batch
    // (H2-2022 onward — six months of replayed rows plus the genuinely
    // new 2023-24 lines) refreshes through VersionedLoad's anti-join on
    // the (order_id, line_no) grain, committing ONLY the delta files
    // and reusing the bootstrap's by reference, and the op reads the
    // history back three ways: version travel to 0 and 1 plus a
    // timestamp-travel read pinned BETWEEN the horizons (must resolve
    // the v0 state). The oracle recomputes all three legs relationally
    // from the SAME persisted dw_fact_sales parquet both engines read,
    // so a lost batch line, a double-applied overlap, or a mis-resolved
    // version/timestamp is a row diff. With this the reference's own
    // workload — not just the testdata shape — runs crash-safe:
    // bootstrap → refresh → travel on the real star.
    OpQuery.checked(
      "lib_fact_sales_versioned",
      s"""WITH f AS (SELECT * FROM read_parquet('$DataDir/dw_fact_sales.parquet/*.parquet')),
         |existing AS (SELECT * FROM f WHERE date_key < 20230101),
         |batch AS (SELECT * FROM f WHERE date_key >= 20220701),
         |loaded AS (
         |  SELECT * FROM existing
         |  UNION ALL
         |  SELECT b.* FROM batch b
         |  WHERE NOT EXISTS (SELECT 1 FROM existing e
         |                    WHERE e.order_id = b.order_id AND e.line_no = b.line_no)),
         |a0 AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |              CAST(count(*) AS BIGINT) AS n_lines,
         |              CAST(sum(total_amount) AS DOUBLE) AS amount
         |       FROM existing GROUP BY 1),
         |a1 AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |              CAST(count(*) AS BIGINT) AS n_lines,
         |              CAST(sum(total_amount) AS DOUBLE) AS amount
         |       FROM loaded GROUP BY 1),
         |ap AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |              CAST(count(*) AS BIGINT) AS n_lines,
         |              CAST(sum(total_amount) AS DOUBLE) AS amount
         |       FROM loaded WHERE date_key BETWEEN 20230101 AND 20241231 GROUP BY 1)
         |SELECT 'v0' AS leg, * FROM a0
         |UNION ALL SELECT 'v1', * FROM a1
         |UNION ALL SELECT 'asof_mid', * FROM a0
         |UNION ALL SELECT 'pruned', * FROM ap""".stripMargin
    ) { (spark, dir) =>
      val c = forSession(spark)
      val fs = persistedDw(spark).factSales
      val table = synchronized {
        c.storeTables.getOrElseUpdate("fact_sales_versioned", {
          val t = EtlOps.freshStoreTable(dir, "lib_fact_versioned_")
          val existing = fs.filter(col("date_key") < 20230101L)
          // date_key stats: every commit records per-file min/max so
          // the "pruned" leg's readKeyRange skips out-of-range files
          graft.etl.VersionedLoad.bootstrap(spark, t, existing,
            asOfMicros = 1672531200000000L, // 2023-01-01T00:00:00Z, the load horizon
            statsCol = Some("date_key"))
          val batch = fs.filter(col("date_key") >= 20220701L)
          graft.etl.VersionedLoad.refresh(spark, t, batch, Seq("order_id", "line_no"),
            asOfMicros = 1719792000000000L, // 2024-07-01T00:00:00Z, post-refresh horizon
            statsCol = Some("date_key"))
          t
        })
      }
      def yearAgg(df: DataFrame, leg: String) =
        df.groupBy(expr("date_key div 10000").as("yr"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("total_amount")).cast("double").as("amount"))
          .select(lit(leg).as("leg"), col("yr"), col("n_lines"), col("amount"))
      yearAgg(graft.etl.SnapshotStore.readVersion(spark, table, 0L).get, "v0")
        .unionByName(yearAgg(graft.etl.SnapshotStore.readVersion(spark, table, 1L).get, "v1"))
        // pinned strictly between the horizons: must resolve version 0
        .unionByName(yearAgg(
          graft.etl.SnapshotStore.readAsOf(spark, table, 1700000000000000L).get, "asof_mid"))
        // stats-pruned read on the star's date_key (the typed index on
        // the REAL library fact, r15): files outside 2023-24 are never
        // opened; the exact filter on top must match the oracle's WHERE
        .unionByName(yearAgg(
          graft.etl.SnapshotStore.readKeyRange(spark, table, "date_key",
            20230101L, 20241231L).get, "pruned"))
    },

    // ── lib_fact_borrowing_versioned: the reference's AGGREGATED
    // incremental MERGE run through the versioned store on the library
    // star (07_SubsequentLoading.sql:356-431 — FactBorrowing's
    // (date_key, member_key, book_key) grain with the MAX/MAX/AVG
    // collapse of same-day same-member same-book borrows, §7.4's
    // PK-collapse hazard): the pre-2023 FactBorrowing slice bootstraps
    // as version 0 (metrics pinned at the 2024-06-30 load horizon), an
    // overlapping batch RE-DERIVES the fact from BorrowedBooks
    // (borrow_date ≥ 2022-07-01) at a LATER as-of (2024-12-31) — so
    // open borrows' duration/overdue metrics GROW, exactly the
    // reference's correlated repair UPDATE (:288-322) — and commits
    // through VersionedLoad.merge's copy-on-write on the composite
    // grain: matched H2-2022 grain rows REPLACE with the repaired
    // metrics, the 2023-24 rows insert, untouched files ride along by
    // reference, all as ONE atomic version. The oracle replays the
    // derivation (joins, CASE arms, the grain GROUP BY) and the merge
    // relationally from the SAME persisted parquet, so a lost repair,
    // a stale survivor, a double-counted collapse group, or a
    // mis-resolved version is a hash diff.
    OpQuery.checked(
      "lib_fact_borrowing_versioned",
      s"""WITH fb AS (SELECT * FROM read_parquet('$DataDir/dw_fact_borrowing.parquet/*.parquet')),
         |bb AS (SELECT * FROM read_parquet('$DataDir/borrowed_books.parquet/*.parquet')),
         |bc AS (SELECT copy_id, book_id
         |       FROM read_parquet('$DataDir/book_copies.parquet/*.parquet')),
         |db AS (SELECT book_id, book_key
         |       FROM read_parquet('$DataDir/dw_dim_book.parquet/*.parquet')
         |       WHERE curr_ind = 'Y'),
         |dm AS (SELECT member_id, member_key
         |       FROM read_parquet('$DataDir/dw_dim_members.parquet/*.parquet')
         |       WHERE curr_ind = 'Y'),
         |existing AS (SELECT * FROM fb WHERE date_key < 20230101),
         |batch AS (
         |  SELECT CAST(year(bb.borrow_date)*10000 + month(bb.borrow_date)*100
         |              + day(bb.borrow_date) AS BIGINT) AS date_key,
         |         dm.member_key, db.book_key,
         |         CAST(max(CASE WHEN bb.return_date IS NOT NULL
         |                       THEN date_diff('day', bb.borrow_date, bb.return_date)
         |                       ELSE date_diff('day', bb.borrow_date, DATE '2024-12-31')
         |                  END) AS BIGINT) AS duration_days,
         |         CAST(max(greatest(CASE WHEN bb.return_date IS NOT NULL
         |                                THEN date_diff('day', bb.due_date, bb.return_date)
         |                                ELSE date_diff('day', bb.due_date, DATE '2024-12-31')
         |                           END, 0)) AS BIGINT) AS overdue_days,
         |         CAST(count(*) AS BIGINT) AS n_collapsed
         |  FROM bb JOIN bc USING (copy_id) JOIN db USING (book_id) JOIN dm USING (member_id)
         |  WHERE bb.borrow_date >= DATE '2022-07-01'
         |  GROUP BY 1, 2, 3),
         |merged AS (
         |  SELECT * FROM batch
         |  UNION ALL
         |  SELECT e.* FROM existing e
         |  WHERE NOT EXISTS (SELECT 1 FROM batch b
         |                    WHERE b.date_key = e.date_key AND b.member_key = e.member_key
         |                      AND b.book_key = e.book_key)),
         |a0 AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |              CAST(count(*) AS BIGINT) AS n_rows,
         |              CAST(sum(duration_days) AS BIGINT) AS dur_days,
         |              CAST(sum(overdue_days) AS BIGINT) AS ovd_days,
         |              CAST(sum(n_collapsed) AS BIGINT) AS n_borrows
         |       FROM existing GROUP BY 1),
         |a1 AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |              CAST(count(*) AS BIGINT) AS n_rows,
         |              CAST(sum(duration_days) AS BIGINT) AS dur_days,
         |              CAST(sum(overdue_days) AS BIGINT) AS ovd_days,
         |              CAST(sum(n_collapsed) AS BIGINT) AS n_borrows
         |       FROM merged GROUP BY 1)
         |SELECT 'v0' AS leg, * FROM a0
         |UNION ALL SELECT 'v1', * FROM a1""".stripMargin
    ) { (spark, dir) =>
      val c = forSession(spark)
      val t0 = derived(spark)
      val dw = persistedDw(spark)
      val bbP = persist("borrowed_books", t0.borrowedBooks)
      val bcP = persist("book_copies", t0.bookCopies)
      val table = synchronized {
        c.storeTables.getOrElseUpdate("fact_borrowing_versioned", {
          val t = EtlOps.freshStoreTable(dir, "lib_fb_versioned_")
          val existing = dw.factBorrowing.filter(col("date_key") < 20230101L)
          // stats on the grain's LEADING component: the merge's
          // touched-file location prunes on date_key even though the
          // grain is composite (sound superset — locateTouched)
          graft.etl.VersionedLoad.bootstrap(spark, t, existing,
            asOfMicros = 1672531200000000L, // 2023-01-01T00:00:00Z, the load horizon
            statsCol = Some("date_key"))
          // the batch RE-DERIVES the fact from the OLTP slice at the
          // later as-of — InitialLoad.factBorrowing IS the reference's
          // grain-collapse derivation, reused verbatim
          val batch = graft.etl.InitialLoad.factBorrowing(
            bbP.filter(col("borrow_date") >= lit("2022-07-01").cast("date")),
            bcP, dw.dimBook, dw.dimMembers, asOf = "2024-12-31")
          graft.etl.VersionedLoad.merge(spark, t, batch,
            Seq("date_key", "member_key", "book_key"),
            asOfMicros = Some(1735689600000000L), // 2025-01-01T00:00:00Z
            statsCol = Some("date_key"))
          t
        })
      }
      def yearAgg(df: DataFrame, leg: String) =
        df.groupBy(expr("date_key div 10000").as("yr"))
          .agg(count(lit(1)).as("n_rows"),
            sum(col("duration_days")).as("dur_days"),
            sum(col("overdue_days")).as("ovd_days"),
            sum(col("n_collapsed")).as("n_borrows"))
          .select(lit(leg).as("leg"), col("yr"), col("n_rows"),
            col("dur_days"), col("ovd_days"), col("n_borrows"))
      yearAgg(graft.etl.SnapshotStore.readVersion(spark, table, 0L).get, "v0")
        .unionByName(yearAgg(graft.etl.SnapshotStore.readVersion(spark, table, 1L).get, "v1"))
    },

    // ── lib_member_purge_versioned: the MEMBER-LEVEL GDPR purge across
    // the library star's FK web (01_Create.sql:63-78 ff. — Members and
    // its dependents BorrowedBooks, Fines, Payments), the cross-table
    // right-to-be-forgotten the single-table dedup_purge_versioned
    // cannot express: each OLTP table lives in its own versioned store,
    // the purge set (every ~37th member) CASCADES relationally to each
    // table's primary keys, and the four row-level deletes commit as
    // coordinated copy-on-write versions — each under occ +
    // withConflictRetry, so a racing writer surfaces as a retried
    // conflict, never a lost update. Three legs per table read back:
    // the pre-purge state (travelable for audit), the purged head (no
    // purged member's row survives anywhere in the web), and the CDC
    // delete pre-images a downstream replica would apply — per table,
    // so a table the cascade missed is a visible row diff. The oracle
    // replays the cascade and all three legs relationally from the SAME
    // persisted parquet; at 100 TB each delete costs O(touched files)
    // through its PK stats, never a table rewrite.
    OpQuery.checked(
      "lib_member_purge_versioned",
      s"""WITH m AS (SELECT * FROM read_parquet('$DataDir/members.parquet/*.parquet')),
         |bb AS (SELECT * FROM read_parquet('$DataDir/borrowed_books.parquet/*.parquet')),
         |f AS (SELECT * FROM read_parquet('$DataDir/fines.parquet/*.parquet')),
         |p AS (SELECT * FROM read_parquet('$DataDir/payments.parquet/*.parquet')),
         |purge AS (SELECT member_id FROM m
         |          WHERE CAST(substring(member_id, 2) AS INT) % 37 = 0),
         |legs AS (
         |  SELECT 'members' AS table_name, member_id FROM m
         |  UNION ALL SELECT 'borrowed_books', member_id FROM bb
         |  UNION ALL SELECT 'fines', member_id FROM f
         |  UNION ALL SELECT 'payments', member_id FROM p)
         |SELECT 'v0' AS leg, table_name, CAST(count(*) AS BIGINT) AS n_rows,
         |       CAST(count(DISTINCT member_id) AS BIGINT) AS n_members
         |FROM legs GROUP BY 2
         |UNION ALL
         |SELECT 'v1', table_name, CAST(count(*) AS BIGINT),
         |       CAST(count(DISTINCT member_id) AS BIGINT)
         |FROM legs l WHERE NOT EXISTS (SELECT 1 FROM purge WHERE purge.member_id = l.member_id)
         |GROUP BY 2
         |UNION ALL
         |SELECT 'deleted', table_name, CAST(count(*) AS BIGINT),
         |       CAST(count(DISTINCT member_id) AS BIGINT)
         |FROM legs l WHERE EXISTS (SELECT 1 FROM purge WHERE purge.member_id = l.member_id)
         |GROUP BY 2""".stripMargin
    ) { (spark, dir) =>
      val c = forSession(spark)
      val t0 = derived(spark)
      val mP  = persist("members", t0.members)
      val bbP = persist("borrowed_books", t0.borrowedBooks)
      val fP  = persist("fines", t0.fines)
      val pP  = persist("payments", t0.payments)
      val purge = mP
        .filter(substring(col("member_id"), 2, 10).cast("int") % 37 === 0)
        .select("member_id")
      // (store name, persisted frame, PK) — the FK web's dependents plus
      // the parent, each its own versioned table
      val webs: Seq[(String, DataFrame, String)] = Seq(
        ("members", mP, "member_id"), ("borrowed_books", bbP, "borrow_id"),
        ("fines", fP, "fine_id"), ("payments", pP, "payment_id"))
      val tables: Map[String, String] = synchronized {
        webs.map { case (name, frame, pk) =>
          name -> c.storeTables.getOrElseUpdate(s"member_purge_$name", {
            val t = EtlOps.freshStoreTable(dir, s"lib_purge_${name}_")
            graft.etl.VersionedLoad.bootstrap(spark, t, frame,
              asOfMicros = 1700000000000000L, statsCol = Some(pk))
            // the cascade: this table's PKs for the purged members —
            // computed relationally (the ON DELETE CASCADE the
            // reference's FK web implies), then executed as a
            // copy-on-write delete under occ + conflict retry + an
            // IDEMPOTENT txn marker: a driver that crashes between
            // tables reruns every step, applied tables skip by their
            // `x` marker, and the cross-table purge converges
            // all-or-nothing (the Delta txnAppId/txnVersion shape).
            // Txn version 1L is correct for THIS op's single-batch
            // lifecycle only — a RECURRING purge must BUMP the version
            // per batch (ver N+1 for the next member set) or the
            // second run silently skips as already-applied; ErasureSpec
            // "recurring purge" pins the bump-and-commit discipline.
            val delKeys = frame.join(purge, Seq("member_id"), "left_semi").select(pk)
            graft.etl.VersionedLoad.idempotent(
              graft.etl.VersionedLoad.withConflictRetry() {
                graft.etl.VersionedLoad.delete(spark, t, delKeys, Seq(pk),
                  asOfMicros = Some(1700000100000000L), statsCol = Some(pk), occ = true,
                  txn = Some(("lib_member_purge", 1L)))
              }): Unit
            t
          })
        }.toMap
      }
      // match the oracle's GROUP BY semantics exactly: an EMPTY leg
      // emits NO row (a global agg would emit a (0,0) row and
      // hash-diverge at a scale where some table holds no purged rows)
      def legAgg(df: DataFrame, leg: String, name: String) =
        df.agg(count(lit(1)).as("n_rows"),
            countDistinct(col("member_id")).as("n_members"))
          .filter(col("n_rows") > 0)
          .select(lit(leg).as("leg"), lit(name).as("table_name"),
            col("n_rows"), col("n_members"))
      webs.map { case (name, frame, pk) =>
        val t = tables(name)
        val delEvents = graft.etl.VersionedLoad.cdcBetween(spark, t, 0L, 1L,
            Seq(pk), Some(pk))
          .map(_.filter(col("_change_type") === "delete"))
          .getOrElse(frame.limit(0))
        legAgg(graft.etl.SnapshotStore.readVersion(spark, t, 0L).get, "v0", name)
          .unionByName(legAgg(
            graft.etl.SnapshotStore.readVersion(spark, t, 1L).get, "v1", name))
          .unionByName(legAgg(delEvents, "deleted", name))
      }.reduce(_.unionByName(_))
    },

    // ── lib_fact_partitioned: HIDDEN PARTITIONING on the real library
    // star (r16 — the partition-spec manifests run on the reference's
    // own workload): FactSales bootstraps under a `div10000(date_key)`
    // spec (the Iceberg truncate-family transform turning the yyyymmdd
    // long into its YEAR), a refresh carries the spec forward, and the
    // two legs are exactly the reference reports' `BETWEEN &p_year_from
    // AND &p_year_to` filter shape (LQY_query1.txt:50) answered by
    // opening only in-range year-partitions: the head confined to
    // 2023-2024, and a versionAsOf-resolved TRAVEL read of 2022 pruned
    // under the PRE-refresh manifest's own spec and values. Dual
    // pruning applies — files the v-line index cannot clear fall back
    // to their date_key stats. The oracle replays both legs as plain
    // year WHEREs over the SAME persisted parquet, so the transform
    // arithmetic (exact long floor-division on both engines), the
    // carried spec, and the travel resolution are all hash-checked.
    OpQuery.checked(
      "lib_fact_partitioned",
      s"""WITH f AS (SELECT * FROM read_parquet('$DataDir/dw_fact_sales.parquet/*.parquet')),
         |existing AS (SELECT * FROM f WHERE date_key < 20240101),
         |batch AS (SELECT * FROM f WHERE date_key >= 20230701),
         |loaded AS (
         |  SELECT * FROM existing
         |  UNION ALL
         |  SELECT b.* FROM batch b
         |  WHERE NOT EXISTS (SELECT 1 FROM existing e
         |                    WHERE e.order_id = b.order_id AND e.line_no = b.line_no)),
         |a_head AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |                  CAST(count(*) AS BIGINT) AS n_lines,
         |                  CAST(sum(total_amount) AS DOUBLE) AS amount
         |           FROM loaded WHERE date_key // 10000 BETWEEN 2023 AND 2024 GROUP BY 1),
         |a_v0 AS (SELECT CAST(date_key // 10000 AS BIGINT) AS yr,
         |                CAST(count(*) AS BIGINT) AS n_lines,
         |                CAST(sum(total_amount) AS DOUBLE) AS amount
         |         FROM existing WHERE date_key // 10000 = 2022 GROUP BY 1)
         |SELECT 'head_2324' AS leg, * FROM a_head
         |UNION ALL SELECT 'v0_22', * FROM a_v0""".stripMargin
    ) { (spark, dir) =>
      val table = factPartitionedTable(spark, dir)
      def yearAgg(df: DataFrame, leg: String) =
        df.groupBy(expr("date_key div 10000").as("yr"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("total_amount")).cast("double").as("amount"))
          .select(lit(leg).as("leg"), col("yr"), col("n_lines"), col("amount"))
      val s = graft.etl.SnapshotStore
      // travel: the instant between the horizons resolves the pre-refresh
      // version; the 2022 prune runs under THAT manifest
      val v0 = s.versionAsOf(spark, table, 1710000000000000L).get
      yearAgg(s.readPartitionRange(spark, table, 2023L, 2024L).get, "head_2324")
        .unionByName(yearAgg(
          s.readPartitionRange(spark, table, 2022L, 2022L, version = Some(v0)).get, "v0_22"))
    },

    // ── lib_q1_versioned: the reference's FULL Q1 report DAG
    // (LQY_query1.txt:39-111 — star join → quarter pivot → YoY LAG →
    // top-5 per year) run END-TO-END THROUGH the versioned store (r17
    // — the r16 verdict's missing #2): the fact side is the
    // div10000-partitioned FactSales read via readPartitionRange with
    // the report's own `BETWEEN &p_year_from AND &p_year_to` window
    // (2006-2023 — both edge years 2005/2024 exist in the table, so
    // the prune does real work), dims join broadcast exactly as the
    // flat-parquet lib_q1_genre_sales. This is the production read
    // path a 100 TB deployment runs daily: year partitions outside the
    // window are never opened (LibraryStoreSpec pins never-opened with
    // the destroyed-file device on the same DAG shape), and the report
    // result is hash-identical to the relational replay over the same
    // persisted parquet — the store is invisible in the answer, only
    // in the IO.
    OpQuery.checked(
      "lib_q1_versioned",
      s"""WITH fs AS (SELECT * FROM read_parquet('$DataDir/dw_fact_sales.parquet/*.parquet')
         |            WHERE date_key // 10000 BETWEEN 2006 AND 2023),
         |dd AS (SELECT date_key, cal_year, cal_quarter
         |       FROM read_parquet('$DataDir/dw_dim_date.parquet/*.parquet')),
         |db AS (SELECT book_key, genre
         |       FROM read_parquet('$DataDir/dw_dim_book.parquet/*.parquet')),
         |dm AS (SELECT member_key
         |       FROM read_parquet('$DataDir/dw_dim_members.parquet/*.parquet')),
         |base AS (
         |  SELECT dd.cal_year, dd.cal_quarter, db.genre, sum(fs.total_amount) AS rev
         |  FROM fs JOIN dd USING (date_key) JOIN db USING (book_key) JOIN dm USING (member_key)
         |  GROUP BY 1, 2, 3),
         |piv AS (
         |  SELECT cal_year, genre,
         |         CAST(sum(CASE WHEN cal_quarter = 1 THEN rev ELSE 0 END) AS DOUBLE) AS q1_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 2 THEN rev ELSE 0 END) AS DOUBLE) AS q2_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 3 THEN rev ELSE 0 END) AS DOUBLE) AS q3_rev,
         |         CAST(sum(CASE WHEN cal_quarter = 4 THEN rev ELSE 0 END) AS DOUBLE) AS q4_rev,
         |         sum(rev) AS tot_dec
         |  FROM base GROUP BY 1, 2),
         |r AS (
         |  SELECT *,
         |         lag(tot_dec) OVER (PARTITION BY genre ORDER BY cal_year) AS prev_tot,
         |         CAST(ROW_NUMBER() OVER (PARTITION BY cal_year
         |                ORDER BY tot_dec DESC, genre ASC) AS BIGINT) AS rn
         |  FROM piv)
         |SELECT cal_year, genre, q1_rev, q2_rev, q3_rev, q4_rev,
         |       CAST(tot_dec AS DOUBLE) AS tot_rev,
         |       CAST(tot_dec - prev_tot AS DOUBLE) * 100 / CAST(prev_tot AS DOUBLE) AS yoy_pct,
         |       rn
         |FROM r WHERE rn <= 5""".stripMargin
    ) { (spark, dir) =>
      val table = factPartitionedTable(spark, dir)
      val prunedFact = graft.etl.SnapshotStore
        .readPartitionRange(spark, table, 2006L, 2023L).get
      graft.queries.LibraryReports.q1GenreSales(
        persistedDw(spark).copy(factSales = prunedFact),
        graft.queries.LibraryReports.Params(yearFrom = 2006, yearTo = 2023))
    },

    // ── lib_fact_nullprune: NULL-COUNT data skipping on the library's
    // open-loan predicate (r17 — the r16 verdict's missing #4; the
    // reference's open-borrow measures are `returnDate IS NULL`-shaped,
    // 05_InitialLoading.sql:375-390): BorrowedBooks commits clustered
    // by return-status so files are (mostly) all-open or all-returned,
    // the manifest records per-file `r` row counts and `n return_date`
    // null counts alongside the typed date stats, and the two legs
    // read through [[graft.etl.SnapshotStore.readNullFilter]]: the
    // OPEN leg (IS NULL) prunes every fully-returned file (nulls = 0),
    // the RETURNED leg (IS NOT NULL) prunes every all-open file
    // (nulls = rows) — min/max stats can never answer either.
    // NullStatsSpec pins both prune directions with the destroyed-file
    // device; here the oracle replays both legs relationally, so the
    // recorded counts and the exact predicates must agree row-for-row.
    OpQuery.checked(
      "lib_fact_nullprune",
      s"""WITH bb AS (SELECT * FROM read_parquet('$DataDir/borrowed_books.parquet/*.parquet'))
         |SELECT 'open' AS leg, CAST(year(borrow_date) AS BIGINT) AS yr,
         |       CAST(count(*) AS BIGINT) AS n_loans,
         |       CAST(0 AS BIGINT) AS ret_days
         |FROM bb WHERE return_date IS NULL GROUP BY 2
         |UNION ALL
         |SELECT 'returned', CAST(year(borrow_date) AS BIGINT),
         |       CAST(count(*) AS BIGINT),
         |       CAST(COALESCE(sum(date_diff('day', borrow_date, return_date)), 0) AS BIGINT)
         |FROM bb WHERE return_date IS NOT NULL GROUP BY 2""".stripMargin
    ) { (spark, dir) =>
      val c = forSession(spark)
      val bbP = persist("borrowed_books", derived(spark).borrowedBooks)
      val table = synchronized {
        c.storeTables.getOrElseUpdate("fact_nullprune", {
          val t = EtlOps.freshStoreTable(dir, "lib_nullprune_")
          // cluster by OPEN-ness first, then by date: files land
          // all-open or all-returned, so the null-count index has
          // something to prune (an interleaved layout would degrade
          // every file to must-scan — recorded honestly, never wrongly)
          graft.etl.VersionedLoad.bootstrap(spark, t,
            bbP.repartitionByRange(6,
              col("return_date").isNull.cast("int"), col("borrow_date")),
            asOfMicros = 1700000000000000L,
            statsCol = Some("borrow_id"), statsCols = Seq("return_date"))
          t
        })
      }
      def legAgg(df: DataFrame, leg: String, retDays: Boolean) =
        df.groupBy(year(col("borrow_date")).cast("long").as("yr"))
          .agg(count(lit(1)).as("n_loans"),
            (if (retDays)
               coalesce(sum(datediff(col("return_date"), col("borrow_date"))), lit(0L))
             else lit(0L)).cast("long").as("ret_days"))
          .select(lit(leg).as("leg"), col("yr"), col("n_loans"), col("ret_days"))
      val s = graft.etl.SnapshotStore
      legAgg(s.readNullFilter(spark, table, "return_date", isNull = true).get,
          "open", retDays = false)
        .unionByName(legAgg(
          s.readNullFilter(spark, table, "return_date", isNull = false).get,
          "returned", retDays = true))
    }
  )
}
