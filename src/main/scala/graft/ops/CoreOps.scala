package graft.ops

import graft.{Norm, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.1/§2.2/§2.6/§2.7/§2.8 — scans, row generation, surrogate keys,
  * physical write paths, projections, filters, sorts, limits, deterministic
  * sampling, distinct, and the scalar-function packs.
  *
  * Reference semantics (Oracle PL/SQL) cited per op; realization is
  * declarative DataFrame code so Catalyst handles pushdown/pruning/codegen.
  */
object CoreOps {

  /** Scratch dir for ops that demonstrate physical write paths
    * (insert_select / delete_all). Unique per sfDir so sf0.01 verify and
    * sf0.1 bench never read each other's output, AND unique per JVM run
    * (pid + start nanos) so consecutive bench runs never inherit each
    * other's files or page-cache state — IO op timings measure THIS run's
    * write+read, not whatever a previous process left warm in the OS
    * cache. A shutdown hook removes the run's subtree. */
  private lazy val runRoot: String = {
    val root = new java.io.File(
      s"${sys.props("java.io.tmpdir")}/graft_scratch/run_${ProcessHandle.current().pid()}_${System.nanoTime()}")
    root.mkdirs()
    sys.addShutdownHook {
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
        f.delete(): Unit
      }
      rm(root)
    }
    root.getAbsolutePath
  }

  private[ops] def scratch(dir: String, name: String): String = {
    val tag = dir.replaceAll("[^A-Za-z0-9]", "_")
    s"$runRoot/$tag/$name"
  }

  val ops: Seq[OpQuery] = Seq(
    // ── scan_table: full scan + projection (ref LQY_query1.txt:46-49).
    // Column pruning reaches the parquet reader (ReadSchema shows 3 cols).
    OpQuery.checked(
      "scan_table",
      "SELECT p_partkey, p_name, p_type FROM part"
    ) { (spark, dir) =>
      Tables(spark, dir).part.select("p_partkey", "p_name", "p_type")
    },

    // ── row_generator: date-spine generation, the Spark-native rewrite of
    // Oracle `CONNECT BY LEVEL` loops (ref 05_InitialLoading.sql:162-166).
    // sequence()+explode is fully distributed — no driver-side loop.
    OpQuery.checked(
      "row_generator",
      """SELECT CAST(gs AS DATE) AS cal_date,
        |       CAST(year(gs) AS BIGINT) AS cal_year,
        |       CAST(quarter(gs) AS BIGINT) AS cal_quarter,
        |       CAST(month(gs) AS BIGINT) AS cal_month,
        |       CAST(isodow(gs) AS BIGINT) AS iso_dow
        |FROM generate_series(DATE '1995-01-01', DATE '1995-12-31', INTERVAL 1 DAY) AS t(gs)""".stripMargin
    ) { (spark, _) =>
      spark
        .sql("SELECT explode(sequence(DATE'1995-01-01', DATE'1995-12-31', interval 1 day)) AS cal_date")
        .select(
          col("cal_date"),
          year(col("cal_date")).cast("long").as("cal_year"),
          quarter(col("cal_date")).cast("long").as("cal_quarter"),
          month(col("cal_date")).cast("long").as("cal_month"),
          (weekday(col("cal_date")) + lit(1)).cast("long").as("iso_dow")
        )
    },

    // ── sequence_keys: dense deterministic surrogate keys replacing Oracle
    // sequences (ref 01_helpers.sql:22-32, 05_InitialLoading.sql:68-71).
    // row_number over a unique business key + prior max → dense and stable.
    OpQuery.checked(
      "sequence_keys",
      """SELECT CAST(ROW_NUMBER() OVER (ORDER BY s_name) + 1000 AS BIGINT) AS supp_key,
        |       s_suppkey, s_name FROM supplier""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).supplier.select(
        (row_number().over(Window.orderBy(col("s_name"))) + lit(1000)).cast("long").as("supp_key"),
        col("s_suppkey"),
        col("s_name")
      )
    },

    // ── insert_select: append query results to a stored table
    // (ref 05_InitialLoading.sql:209-219 etc.). Demonstrated physically:
    // write half the rows, append the other half, read back and aggregate.
    OpQuery.checked(
      "insert_select",
      """SELECT p_brand,
        |       CAST(count(*) AS BIGINT) AS n_parts,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) AS retail_sum
        |FROM part GROUP BY p_brand""".stripMargin
    ) { (spark, dir) =>
      val p    = Tables(spark, dir).part.select("p_partkey", "p_brand", "p_retailprice")
      val path = scratch(dir, "insert_select")
      p.filter(col("p_partkey") % 2 === 0).write.mode("overwrite").parquet(path)
      p.filter(col("p_partkey") % 2 =!= 0).write.mode("append").parquet(path)
      spark.read
        .parquet(path)
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"), Norm.dsum(col("p_retailprice")).as("retail_sum"))
    },

    // ── delete_all: bulk delete rewritten as overwrite-with-remainder
    // (ref 00_Deleteall.sql:1-27; no in-place DELETE on parquet).
    OpQuery.checked(
      "delete_all",
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n
        |FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus""".stripMargin
    ) { (spark, dir) =>
      val o    = Tables(spark, dir).orders.select("o_orderkey", "o_orderstatus")
      val path = scratch(dir, "delete_all")
      o.write.mode("overwrite").parquet(path)
      // "DELETE WHERE status='F'" == overwrite with the surviving rows.
      val survivors = spark.read.parquet(path).filter(col("o_orderstatus") =!= "F")
      val staged    = scratch(dir, "delete_all_v2")
      survivors.write.mode("overwrite").parquet(staged)
      spark.read.parquet(staged).groupBy("o_orderstatus").agg(count(lit(1)).as("n"))
    },

    // ── merge_upsert: MERGE WHEN NOT MATCHED (ref 07_SubsequentLoading
    // .sql:331-355): incoming wins, unmatched existing survives. Parquet
    // realization = incoming ∪ (existing ⟕anti incoming) — graft.etl.MergeUpsert.
    OpQuery.checked(
      "merge_upsert",
      """WITH existing AS (
        |  SELECT c_custkey, 'old' AS src, CAST(c_acctbal AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 3 <> 0),
        |incoming AS (
        |  SELECT c_custkey, 'new' AS src, CAST(c_acctbal + 100 AS DOUBLE) AS bal
        |  FROM customer WHERE c_custkey % 2 = 0)
        |SELECT * FROM incoming
        |UNION ALL
        |SELECT e.* FROM existing e
        |WHERE NOT EXISTS (SELECT 1 FROM incoming i WHERE i.c_custkey = e.c_custkey)""".stripMargin
    ) { (spark, dir) =>
      val c = Tables(spark, dir).customer
      val existing = c
        .filter(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey"), lit("old").as("src"), col("c_acctbal").cast("double").as("bal"))
      val incoming = c
        .filter(col("c_custkey") % 2 === 0)
        .select(col("c_custkey"), lit("new").as("src"), (col("c_acctbal") + 100).cast("double").as("bal"))
      graft.etl.MergeUpsert.upsert(existing, incoming, Seq("c_custkey"))
    },

    // ── update_correlated: UPDATE with correlated scalar subquery + EXISTS
    // guard (ref 07_SubsequentLoading.sql:288-322) → join + coalesce rewrite.
    OpQuery.checked(
      "update_correlated",
      """SELECT o.o_orderkey,
        |  CASE WHEN EXISTS (SELECT 1 FROM lineitem l
        |                    WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
        |       THEN 'R' ELSE o.o_orderstatus END AS new_status,
        |  CAST(COALESCE(
        |    (SELECT CAST(sum(CAST(l.l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |     FROM lineitem l
        |     WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R'),
        |    o.o_totalprice) AS DOUBLE) AS new_total
        |FROM orders o""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      val returned = t.lineitem
        .filter(col("l_returnflag") === "R")
        .groupBy(col("l_orderkey"))
        .agg(Norm.dsum(col("l_extendedprice")).as("ret_total"))
      t.orders
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_outer")
        .select(
          col("o_orderkey"),
          when(col("ret_total").isNotNull, lit("R")).otherwise(col("o_orderstatus")).as("new_status"),
          coalesce(col("ret_total"), col("o_totalprice")).cast("double").as("new_total")
        )
    },

    // ── io_csv_roundtrip: CSV sink + schema-on-read source (SURVEY §2.1
    // source/sink surface beyond parquet). Values survive the text
    // round-trip exactly because the projection is ints/strings only.
    OpQuery.checked(
      "io_csv_roundtrip",
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(c_nationkey) AS BIGINT) AS nat_sum
        |FROM customer GROUP BY c_mktsegment""".stripMargin
    ) { (spark, dir) =>
      val path = scratch(dir, "csv_roundtrip")
      Tables(spark, dir).customer
        .select("c_custkey", "c_mktsegment", "c_nationkey")
        .write.mode("overwrite").option("header", "true").csv(path)
      spark.read
        .option("header", "true")
        .schema("c_custkey BIGINT, c_mktsegment STRING, c_nationkey INT")
        .csv(path)
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"), sum(col("c_nationkey")).cast("long").as("nat_sum"))
    },

    // ── io_json_roundtrip: JSON-lines sink + source with explicit schema.
    OpQuery.checked(
      "io_json_roundtrip",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        |       CAST(min(o_orderkey) AS BIGINT) AS min_key
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    ) { (spark, dir) =>
      val path = scratch(dir, "json_roundtrip")
      Tables(spark, dir).orders
        .select("o_orderkey", "o_orderpriority")
        .write.mode("overwrite").json(path)
      spark.read
        .schema("o_orderkey BIGINT, o_orderpriority STRING")
        .json(path)
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"), min(col("o_orderkey")).cast("long").as("min_key"))
    },

    // ── io_orc_roundtrip: ORC sink + source — the columnar alternative to
    // parquet (same predicate-pushdown/column-pruning story); binary
    // round-trip, so decimals/doubles survive exactly.
    OpQuery.checked(
      "io_orc_roundtrip",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS qty_sum
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
    ) { (spark, dir) =>
      val path = scratch(dir, "orc_roundtrip")
      Tables(spark, dir).lineitem
        .select(col("l_returnflag"), col("l_linestatus"), col("l_quantity").cast("long").as("qty"))
        .write.mode("overwrite").orc(path)
      spark.read.orc(path)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), sum(col("qty")).as("qty_sum"))
    },

    // ── project_expr: computed projection — CASE bucketing, string build
    // (ref DimMembers load 05_InitialLoading.sql:230-289).
    OpQuery.checked(
      "project_expr",
      """SELECT c_custkey,
        |       upper(c_mktsegment) AS segment_uc,
        |       concat(substring(c_name, 1, 8), '#', lpad(CAST(c_nationkey AS VARCHAR), 3, '0')) AS tag,
        |       CASE WHEN c_acctbal < 0 THEN 'DEBT'
        |            WHEN c_acctbal < 5000 THEN 'LOW'
        |            ELSE 'HIGH' END AS tier,
        |       CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 2 AS DOUBLE) AS bal2
        |FROM customer""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).customer.select(
        col("c_custkey"),
        upper(col("c_mktsegment")).as("segment_uc"),
        concat(substring(col("c_name"), 1, 8), lit("#"), lpad(col("c_nationkey").cast("string"), 3, "0")).as("tag"),
        when(col("c_acctbal") < 0, "DEBT").when(col("c_acctbal") < 5000, "LOW").otherwise("HIGH").as("tier"),
        (Norm.dec(col("c_acctbal")) * 2).cast("double").as("bal2")
      )
    },

    // ── filter_basic: BETWEEN / IN / IS NOT NULL predicates
    // (ref 05_InitialLoading.sql:338,360,433; 08_InsertFines.sql:56-99).
    // All three reach the parquet scan as PushedFilters.
    OpQuery.checked(
      "filter_basic",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no, CAST(l_quantity AS DOUBLE) AS qty
        |FROM lineitem
        |WHERE l_shipdate BETWEEN DATE '1996-01-01' AND DATE '1996-12-31'
        |  AND l_returnflag IN ('A','R')
        |  AND l_linestatus IS NOT NULL""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .filter(
          col("l_shipdate").between(lit("1996-01-01").cast("date"), lit("1996-12-31").cast("date"))
            && col("l_returnflag").isin("A", "R")
            && col("l_linestatus").isNotNull
        )
        .select(col("l_orderkey"), col("l_linenumber").cast("long").as("line_no"), col("l_quantity").cast("double").as("qty"))
    },

    // ── filter_param: parameter-disabled predicate (ref LQY_query1.txt:50-51
    // `('&p'='%' OR col IN ...)`) — folded driver-side in Scala, so the
    // disabled branch costs nothing in the plan.
    OpQuery.checked(
      "filter_param",
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |WHERE c.c_mktsegment = 'BUILDING'
        |GROUP BY o_orderpriority""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      // Param object: segment = Some("BUILDING"); None would skip the filter
      // entirely (constant-folds the Oracle `'%'='%'` pattern).
      val segment: Option[String] = Some("BUILDING")
      val cust = segment.fold(t.customer)(s => t.customer.filter(col("c_mktsegment") === s))
      t.orders
        .join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
    },

    // ── split_param_list: comma-separated param → IN-list
    // (ref LQY_query2.txt:15-19 REGEXP_SUBSTR + CONNECT BY).
    OpQuery.checked(
      "split_param_list",
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_cust
        |FROM customer WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE','MACHINERY')
        |GROUP BY c_mktsegment""".stripMargin
    ) { (spark, dir) =>
      val raw      = "BUILDING, AUTOMOBILE ,MACHINERY"
      val segments = raw.split(",").map(_.trim).filter(_.nonEmpty)
      Tables(spark, dir).customer
        .filter(col("c_mktsegment").isin(segments.toIndexedSeq: _*))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"))
    },

    // ── sort_multi_key: final ORDER BY with mixed directions
    // (ref LQY_query1.txt:111 year ASC, amount DESC, genre ASC).
    OpQuery.checked(
      "sort_multi_key",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, n_name,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n   ON c.c_nationkey = n.n_nationkey
        |GROUP BY year(o_orderdate), n_name
        |ORDER BY yr ASC, spend DESC, n_name ASC""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      t.orders
        .join(t.customer, col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"), col("n_name"))
        .agg(Norm.dsum(col("o_totalprice")).as("spend"))
        .orderBy(col("yr").asc, col("spend").desc, col("n_name").asc)
    },

    // ── limit_rownum: ORDER BY + ROWNUM<=k → global top-k with tiebreak
    // (ref 08_InsertFines.sql:154-167). TakeOrderedAndProject in the plan —
    // no global sort of the full table.
    OpQuery.checked(
      "limit_rownum",
      """SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS total
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(col("o_orderkey"), col("o_totalprice").cast("double").as("total"))
        .orderBy(col("total").desc, col("o_orderkey").asc)
        .limit(5)
    },

    // ── sample_random: DBMS_RANDOM sampling (ref 08_InsertFines.sql:94-103)
    // replaced by a seedable multiplicative-hash Bernoulli sample — the only
    // way "random" stays reproducible across engines and re-runs.
    OpQuery.checked(
      "sample_random",
      """SELECT CAST(count(*) AS BIGINT) AS n_sampled,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sample_spend,
        |       CAST(min(o_orderkey) AS BIGINT) AS min_key,
        |       CAST(max(o_orderkey) AS BIGINT) AS max_key
        |FROM orders WHERE ((o_orderkey % 2147483648) * 2654435761) % 100 < 10""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .filter(Norm.hashBucket(col("o_orderkey"), 100) < 10)
        .agg(
          count(lit(1)).as("n_sampled"),
          Norm.dsum(col("o_totalprice")).as("sample_spend"),
          min(col("o_orderkey")).cast("long").as("min_key"),
          max(col("o_orderkey")).cast("long").as("max_key")
        )
    },

    // ── distinct: SELECT DISTINCT dedup (ref LQY_query2.txt:22,133-136).
    OpQuery.checked(
      "distinct",
      "SELECT DISTINCT c_mktsegment, CAST(c_nationkey AS BIGINT) AS nat FROM customer"
    ) { (spark, dir) =>
      Tables(spark, dir).customer
        .select(col("c_mktsegment"), col("c_nationkey").cast("long").as("nat"))
        .distinct()
    },

    // ── fn_string_pack: the reference's string-function surface in one
    // projection (SURVEY §2.8: UPPER/LOWER/TRIM/SUBSTR/LPAD/REPLACE/concat/
    // REGEXP_SUBSTR/INSTR-from-end → split+element_at).
    OpQuery.checked(
      "fn_string_pack",
      """SELECT p_partkey,
        |       upper(p_name) AS name_uc,
        |       lower(p_brand) AS brand_lc,
        |       trim(concat(' ', p_type, ' ')) AS type_trim,
        |       substring(p_type, 1, 6) AS type6,
        |       lpad(CAST(p_size AS VARCHAR), 4, '0') AS size_pad,
        |       replace(p_type, ' ', '_') AS type_snake,
        |       CAST(length(p_name) AS BIGINT) AS name_len,
        |       list_extract(str_split(p_type, ' '), -1) AS type_last_word,
        |       list_extract(str_split(p_type, ' '), 1) AS type_first_word,
        |       CASE WHEN p_type LIKE '%BRASS%' THEN 1 ELSE 0 END AS is_brass,
        |       regexp_extract(p_name, '([a-z]+)', 1) AS first_word
        |FROM part""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).part.select(
        col("p_partkey"),
        upper(col("p_name")).as("name_uc"),
        lower(col("p_brand")).as("brand_lc"),
        trim(concat(lit(" "), col("p_type"), lit(" "))).as("type_trim"),
        substring(col("p_type"), 1, 6).as("type6"),
        lpad(col("p_size").cast("string"), 4, "0").as("size_pad"),
        regexp_replace(col("p_type"), " ", "_").as("type_snake"),
        length(col("p_name")).cast("long").as("name_len"),
        element_at(split(col("p_type"), " "), -1).as("type_last_word"),
        element_at(split(col("p_type"), " "), 1).as("type_first_word"),
        when(col("p_type").like("%BRASS%"), 1L).otherwise(0L).as("is_brass"),
        regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word")
      )
    },

    // ── fn_date_pack: TRUNC/ADD_MONTHS/LAST_DAY/EXTRACT/TO_CHAR surface
    // (SURVEY §2.8 date table).
    OpQuery.checked(
      "fn_date_pack",
      """SELECT o_orderkey,
        |       CAST(o_orderdate AS DATE) AS od,
        |       CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(month(o_orderdate) AS BIGINT) AS mo,
        |       CAST(day(o_orderdate) AS BIGINT) AS dom,
        |       CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
        |       last_day(CAST(o_orderdate AS DATE)) AS month_end,
        |       CAST(o_orderdate AS DATE) + 30 AS plus30,
        |       CAST(CAST(o_orderdate AS DATE) + INTERVAL 2 MONTH AS DATE) AS plus2m,
        |       CAST(date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS days_since_epoch92,
        |       strftime(o_orderdate, '%Y-%m') AS ym
        |FROM orders""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders.select(
        col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"),
        year(col("o_orderdate")).cast("long").as("yr"),
        quarter(col("o_orderdate")).cast("long").as("qtr"),
        month(col("o_orderdate")).cast("long").as("mo"),
        dayofmonth(col("o_orderdate")).cast("long").as("dom"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month_start"),
        last_day(to_date(col("o_orderdate"))).as("month_end"),
        date_add(to_date(col("o_orderdate")), 30).as("plus30"),
        add_months(to_date(col("o_orderdate")), 2).as("plus2m"),
        datediff(to_date(col("o_orderdate")), lit("1992-01-01").cast("date")).cast("long").as("days_since_epoch92"),
        date_format(col("o_orderdate"), "yyyy-MM").as("ym")
      )
    },

    // ── fn_math_pack: ROUND/FLOOR/CEIL/MOD/GREATEST/LEAST/ABS
    // (SURVEY §2.8 math table). Rounding runs on exact decimals so Oracle
    // HALF_UP == DuckDB half-away behavior on these positive amounts.
    OpQuery.checked(
      "fn_math_pack",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        |       CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) / 7, 2) AS DOUBLE) AS price_div7,
        |       CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |       CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |       CAST(abs(l_quantity - 25) AS DOUBLE) AS qty_dev,
        |       CAST(l_orderkey % 7 AS BIGINT) AS key_mod7,
        |       CAST(greatest(l_quantity, 10) AS DOUBLE) AS qty_hi,
        |       CAST(least(l_quantity, 40) AS DOUBLE) AS qty_lo,
        |       CAST(sqrt(l_quantity) AS DOUBLE) AS qty_sqrt
        |FROM lineitem""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem.select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("line_no"),
        round(Norm.dec(col("l_extendedprice")) / 7, 2).cast("double").as("price_div7"),
        floor(col("l_extendedprice")).cast("long").as("price_floor"),
        ceil(col("l_extendedprice")).cast("long").as("price_ceil"),
        abs(col("l_quantity") - 25).cast("double").as("qty_dev"),
        (col("l_orderkey") % 7).cast("long").as("key_mod7"),
        greatest(col("l_quantity"), lit(10)).cast("double").as("qty_hi"),
        least(col("l_quantity"), lit(40)).cast("double").as("qty_lo"),
        sqrt(col("l_quantity")).cast("double").as("qty_sqrt")
      )
    },

    // ── fn_null_pack: NVL/COALESCE/NULLIF (SURVEY §2.8 null handling;
    // NULLIF guards div-by-zero exactly as LQY_query1.txt:72).
    OpQuery.checked(
      "fn_null_pack",
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no,
        |       CAST(coalesce(nullif(l_discount, 0.0), 0.05) AS DOUBLE) AS disc_or_default,
        |       CAST(CASE WHEN l_discount = 0.0 THEN NULL ELSE l_discount END AS DOUBLE) AS disc_nullable,
        |       CASE WHEN nullif(l_discount, 0.0) IS NULL THEN 'none' ELSE 'some' END AS disc_flag
        |FROM lineitem""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem.select(
        col("l_orderkey"),
        col("l_linenumber").cast("long").as("line_no"),
        coalesce(nullif(col("l_discount"), lit(0.0)), lit(0.05)).cast("double").as("disc_or_default"),
        when(col("l_discount") === 0.0, lit(null)).otherwise(col("l_discount")).cast("double").as("disc_nullable"),
        when(nullif(col("l_discount"), lit(0.0)).isNull, "none").otherwise("some").as("disc_flag")
      )
    }
  )
}
