package graft.ops

import graft.{Norm, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** SURVEY §2.4/§2.5 — aggregation + window surface: hash aggregation,
  * exact distinct counts, conditional pivot, multi-level re-aggregation,
  * scalar totals, LISTAGG, ratio-to-report, ROLLUP subtotals, top-N per
  * group, LAG deltas, whole-partition windows.
  *
  * All grouped sums run on DecimalType (order-independent) — partial
  * (map-side) aggregation stays enabled, which is the scalability
  * requirement: per-group state, not per-row shuffle.
  */
object AggOps {

  val ops: Seq[OpQuery] = Seq(
    // ── agg_hash: GROUP BY + SUM/COUNT, TPC-H-Q1 shape
    // (ref LQY_query1.txt:39-52).
    OpQuery.checked(
      "agg_hash",
      """SELECT l_returnflag, l_linestatus,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_qty
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Norm.dsum(col("l_quantity")).as("sum_qty"),
          Norm.dsum(col("l_extendedprice")).as("sum_base"),
          sum(Norm.dec(col("l_extendedprice")) * (lit(1) - col("l_discount").cast("decimal(4,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("n"),
          (sum(Norm.dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty")
        )
    },

    // ── agg_count_distinct: COUNT(DISTINCT) per group (ref LQY_query2.txt:123).
    // Exact (expand + two-phase agg); approx_count_distinct is the 100 TB
    // escape hatch when ±2% is acceptable.
    OpQuery.checked(
      "agg_count_distinct",
      """SELECT o_orderpriority,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        |       CAST(count(*) AS BIGINT) AS n_orders
        |FROM orders GROUP BY o_orderpriority""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n_orders"))
    },

    // ── agg_conditional_pivot: SUM(CASE WHEN qtr=N ...) manual pivot
    // (ref LQY_query1.txt:57-60).
    OpQuery.checked(
      "agg_conditional_pivot",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(sum(CASE WHEN quarter(o_orderdate)=1 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS q1_spend,
        |       CAST(sum(CASE WHEN quarter(o_orderdate)=2 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS q2_spend,
        |       CAST(sum(CASE WHEN quarter(o_orderdate)=3 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS q3_spend,
        |       CAST(sum(CASE WHEN quarter(o_orderdate)=4 THEN CAST(o_totalprice AS DECIMAL(18,2)) ELSE 0 END) AS DOUBLE) AS q4_spend,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS yr_total
        |FROM orders GROUP BY year(o_orderdate)""".stripMargin
    ) { (spark, dir) =>
      val p = Norm.dec(col("o_totalprice"))
      def q(n: Int) = sum(when(quarter(col("o_orderdate")) === n, p).otherwise(lit(0))).cast("double")
      Tables(spark, dir).orders
        .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
        .agg(
          q(1).as("q1_spend"), q(2).as("q2_spend"), q(3).as("q3_spend"), q(4).as("q4_spend"),
          sum(p).cast("double").as("yr_total")
        )
    },

    // ── agg_multi_level: re-aggregation of aggregates — line → customer →
    // segment (ref LQY_query2.txt:85-130 PO totals → genre rollup).
    OpQuery.checked(
      "agg_multi_level",
      """WITH per_cust AS (
        |  SELECT o_custkey, count(*) AS n_orders,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY o_custkey)
        |SELECT c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n_buyers,
        |       CAST(sum(n_orders) AS BIGINT) AS n_orders,
        |       CAST(sum(spend) AS DOUBLE) AS segment_spend
        |FROM per_cust JOIN customer ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      val perCust = t.orders
        .groupBy("o_custkey")
        .agg(count(lit(1)).as("n_orders"), sum(Norm.dec(col("o_totalprice"))).as("spend"))
      perCust
        .join(broadcast(t.customer), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment")
        .agg(
          count(lit(1)).as("n_buyers"),
          sum(col("n_orders")).cast("long").as("n_orders"),
          sum(col("spend")).cast("double").as("segment_spend")
        )
    },

    // ── agg_minmax_avg: MIN/MAX/AVG per group (ref 07_SubsequentLoading
    // .sql:366-368). AVG = exact-decimal sum / count, cast last.
    OpQuery.checked(
      "agg_minmax_avg",
      """SELECT p_brand,
        |       CAST(min(p_retailprice) AS DOUBLE) AS min_price,
        |       CAST(max(p_retailprice) AS DOUBLE) AS max_price,
        |       CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE) / count(*) AS avg_price,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM part GROUP BY p_brand""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).part
        .groupBy("p_brand")
        .agg(
          min(col("p_retailprice")).cast("double").as("min_price"),
          max(col("p_retailprice")).cast("double").as("max_price"),
          (sum(Norm.dec(col("p_retailprice"))).cast("double") / count(lit(1))).as("avg_price"),
          count(lit(1)).as("n")
        )
    },

    // ── agg_scalar_total: ungrouped scalar aggregate (ref SELECT SUM INTO v,
    // 02_Trigger.sql:235-238).
    OpQuery.checked(
      "agg_scalar_total",
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        |       CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS total_revenue,
        |       CAST(count(DISTINCT l_orderkey) AS BIGINT) AS n_orders
        |FROM lineitem""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem.agg(
        count(lit(1)).as("n_lines"),
        Norm.dsum(col("l_quantity")).as("total_qty"),
        Norm.dsum(col("l_extendedprice")).as("total_revenue"),
        countDistinct(col("l_orderkey")).as("n_orders")
      )
    },

    // ── agg_listagg: LISTAGG WITHIN GROUP ORDER BY (ref LQY_query2.txt:31)
    // via the native TypedImperativeAggregate (graft.functions
    // .ListAggSorted) — partial-aggregate friendly, sorted once per group
    // at eval; DuckDB's string_agg ORDER BY validates it byte-for-byte.
    OpQuery.checked(
      "agg_listagg",
      """SELECT r_name, string_agg(n_name, ', ' ORDER BY n_name) AS nations
        |FROM nation JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name""".stripMargin
    ) { (spark, dir) =>
      graft.functions.ListAggSorted.register(spark)
      val t = Tables(spark, dir)
      t.nation
        .join(broadcast(t.region), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(expr("listagg_sorted(n_name, ', ')").as("nations"))
    },

    // ── agg_ratio_to_report: share-of-total via whole-result window
    // (ref RATIO_TO_REPORT 02_InsertMembers.sql:225).
    OpQuery.checked(
      "agg_ratio_to_report",
      """SELECT c_mktsegment,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(count(*) AS DOUBLE) / CAST(sum(count(*)) OVER () AS DOUBLE) AS share
        |FROM customer GROUP BY c_mktsegment""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).customer
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"))
        .withColumn("share", col("n").cast("double") / sum(col("n")).over(Window.partitionBy()).cast("double"))
    },

    // ── agg_rollup_subtotals: SQL*Plus COMPUTE SUM subtotals
    // (ref LQY_query1.txt:36-37) in-engine via ROLLUP grouping sets.
    OpQuery.checked(
      "agg_rollup_subtotals",
      """SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
        |       CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
        |       CAST(GROUPING(year(o_orderdate)) AS BIGINT) AS g_yr,
        |       CAST(GROUPING(quarter(o_orderdate)) AS BIGINT) AS g_qtr,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        |GROUP BY ROLLUP(year(o_orderdate), quarter(o_orderdate))""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(year(col("o_orderdate")).cast("long").as("yr"), quarter(col("o_orderdate")).cast("long").as("qtr"),
          Norm.dec(col("o_totalprice")).as("p"))
        .rollup("yr", "qtr")
        .agg(
          grouping(col("yr")).cast("long").as("g_yr"),
          grouping(col("qtr")).cast("long").as("g_qtr"),
          sum(col("p")).cast("double").as("spend")
        )
        .select("yr", "qtr", "g_yr", "g_qtr", "spend")
    },

    // ── agg_cube_grouping: full CUBE grouping sets with GROUPING ids —
    // all four (priority × status) slices in one pass (Expand + single
    // shuffle), the complement of ROLLUP's prefix hierarchy.
    OpQuery.checked(
      "agg_cube_grouping",
      """SELECT o_orderpriority, o_orderstatus,
        |       CAST(GROUPING(o_orderpriority) AS BIGINT) AS g_pri,
        |       CAST(GROUPING(o_orderstatus) AS BIGINT) AS g_status,
        |       CAST(count(*) AS BIGINT) AS n,
        |       CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS spend
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).orders
        .select(col("o_orderpriority"), col("o_orderstatus"), Norm.dec(col("o_totalprice")).as("p"))
        .cube("o_orderpriority", "o_orderstatus")
        .agg(
          grouping(col("o_orderpriority")).cast("long").as("g_pri"),
          grouping(col("o_orderstatus")).cast("long").as("g_status"),
          count(lit(1)).as("n"),
          sum(col("p")).cast("double").as("spend"))
        .select("o_orderpriority", "o_orderstatus", "g_pri", "g_status", "n", "spend")
    },

    // ── agg_percentile: exact percentiles per group — Spark `percentile`
    // and DuckDB `quantile_cont` both use linear interpolation over the
    // sorted values, so the doubles match bit-for-bit.
    OpQuery.checked(
      "agg_percentile",
      """SELECT l_returnflag,
        |       CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS qty_p25,
        |       CAST(quantile_cont(l_quantity, 0.5) AS DOUBLE) AS qty_p50,
        |       CAST(quantile_cont(l_quantity, 0.75) AS DOUBLE) AS qty_p75,
        |       CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS price_p90
        |FROM lineitem GROUP BY l_returnflag""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).lineitem
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").cast("double").as("qty_p25"),
          expr("percentile(l_quantity, 0.5)").cast("double").as("qty_p50"),
          expr("percentile(l_quantity, 0.75)").cast("double").as("qty_p75"),
          expr("percentile(l_extendedprice, 0.9)").cast("double").as("price_p90"))
    },

    // ── agg_quantile_sketch: the 100 TB quantile — agg_percentile's
    // exact sort cannot run on a column that does not fit the cluster;
    // the production path streams a mergeable KLL-style sketch
    // (graft.functions.KllQuantiles: O(k·log n) memory, map-side
    // partials, level-wise merge). Oracle gate, sketch-verifying
    // variant of the ANN union template: the emitted quantile `q` is
    // the EXACT discrete value-at-rank (engine-neutral: it is a stored
    // double picked by integer rank arithmetic, no interpolation), and
    // the sketch branch stays in the executed plan because the emitted
    // `within_eps` column is computed FROM its estimates — the true
    // rank of every sketch estimate must land within ε=0.05 of its
    // target, or the row hash-fails the driver compare. The exact
    // branch (full per-group sort) and the rank-audit join are the
    // oracle-scale verification passes; at 100 TB only the sketch
    // branch runs.
    OpQuery.checked(
      "agg_quantile_sketch",
      """WITH t AS (SELECT l_returnflag AS g, l_extendedprice AS x FROM lineitem),
        |n AS (SELECT g, count(*) AS n FROM t GROUP BY g),
        |p AS (SELECT unnest([CAST(0.25 AS DOUBLE), CAST(0.5 AS DOUBLE),
        |                     CAST(0.75 AS DOUBLE), CAST(0.95 AS DOUBLE)]) AS p),
        |tg AS (SELECT g, n.n, p.p,
        |              greatest(1, CAST(ceil(p.p * n.n) AS BIGINT)) AS r
        |       FROM n CROSS JOIN p),
        |rk AS (SELECT g, x, row_number() OVER (PARTITION BY g ORDER BY x) AS rnk FROM t)
        |SELECT tg.g, tg.p, rk.x AS q, TRUE AS within_eps
        |FROM tg JOIN rk ON rk.g = tg.g AND rk.rnk = tg.r""".stripMargin
    ) { (spark, dir) =>
      graft.functions.KllQuantiles.register(spark)
      val probs = Seq(0.25, 0.5, 0.75, 0.95)
      val eps = 0.05
      val t = Tables(spark, dir).lineitem
        .select(col("l_returnflag").as("g"), col("l_extendedprice").as("x"))
      // sketch branch: one streaming pass, O(k·log n) state per group
      val est = t.groupBy("g")
        .agg(expr(s"kll_quantiles(x, 256, ${probs.mkString(", ")})").as("est"),
          count(lit(1)).as("n"))
        .select(col("g"), col("n"), posexplode(col("est")))
        .withColumnRenamed("pos", "p_idx").withColumnRenamed("col", "est_v")
      // in-plan audit of the sketch's error bound: true rank of each
      // estimate vs its target quantile (oracle-scale pass)
      val audited = t.join(est, Seq("g"))
        .groupBy("g", "p_idx", "n", "est_v")
        .agg(sum(when(col("x") <= col("est_v"), 1L).otherwise(0L)).as("r_est"))
        .withColumn("p", element_at(typedlit(probs), col("p_idx") + 1))
        .withColumn("within_eps",
          abs(col("r_est").cast("double") / col("n") - col("p")) <= eps)
      // exact branch: discrete value-at-rank r = ceil(p·n), clamped ≥ 1
      val targets = t.groupBy("g").agg(count(lit(1)).as("n"))
        .select(col("g"), col("n"), posexplode(typedlit(probs)))
        .withColumnRenamed("pos", "p_idx").withColumnRenamed("col", "p")
        .withColumn("r", greatest(lit(1L), ceil(col("p") * col("n")).cast("long")))
      val exact = t
        .withColumn("rnk", row_number().over(Window.partitionBy("g").orderBy("x")))
        .join(targets, Seq("g")).filter(col("rnk") === col("r"))
        .select(col("g"), col("p_idx"), col("p"), col("x").as("q"))
      exact.join(audited.select("g", "p_idx", "within_eps"), Seq("g", "p_idx"))
        .select(col("g"), col("p"), col("q"), col("within_eps"))
    },

    // ── agg_hll_partial_merge: re-aggregatable distinct counting — the
    // pre-aggregated-cube pattern. Level 1 builds fixed-size HLL
    // sketches (Spark's DataSketches hll_sketch_agg, lgK=14 ≈ 0.8%
    // error) per (status, bucket) — the partials a 100 TB pipeline
    // PERSISTS per partition/day so distincts re-aggregate without
    // re-scanning raw data; level 2 merges them with hll_union_agg and
    // estimates. Oracle gate, the agg_quantile_sketch pattern: the
    // emitted count is the exact COUNT(DISTINCT) (engine-neutral), and
    // the sketch branch stays in the executed plan because within_3pct
    // is computed FROM its estimate — drift past 3% hash-fails the
    // driver compare. At 100 TB only the sketch levels run; the exact
    // branch is the oracle-scale verification pass.
    OpQuery.checked(
      "agg_hll_partial_merge",
      """SELECT o_orderstatus,
        |       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
        |       TRUE AS within_3pct
        |FROM orders GROUP BY o_orderstatus""".stripMargin
    ) { (spark, dir) =>
      val orders = Tables(spark, dir).orders
      val partials = orders
        .groupBy(col("o_orderstatus"), Norm.hashBucket(col("o_orderkey"), 8).as("bucket"))
        .agg(expr("hll_sketch_agg(o_custkey, 14)").as("sk"))
      val merged = partials.groupBy("o_orderstatus")
        .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("est"))
      orders.groupBy("o_orderstatus")
        .agg(countDistinct(col("o_custkey")).as("n_customers"))
        .join(merged, Seq("o_orderstatus"))
        .select(col("o_orderstatus"), col("n_customers"),
          (abs(col("est") - col("n_customers")).cast("double")
            <= col("n_customers").cast("double") * 0.03).as("within_3pct"))
    },

    // ── agg_distinct_overlap: pairwise audience overlap — how many
    // customers appear in BOTH of two order-status segments, for every
    // segment pair (the set-intersection analytics theta sketches
    // approximate; exact here, and exactly scalable): dedup to the
    // (segment, entity) grain FIRST with a map-side-combining distinct,
    // then self-join on the entity key — co-partitioned, and the
    // per-entity fan-out is bounded by segments², never by row count.
    OpQuery.checked(
      "agg_distinct_overlap",
      """WITH su AS (SELECT DISTINCT o_orderstatus AS st, o_custkey AS c FROM orders)
        |SELECT a.st AS status_a, b.st AS status_b,
        |       CAST(count(*) AS BIGINT) AS n_both
        |FROM su a JOIN su b ON b.c = a.c AND a.st < b.st
        |GROUP BY 1, 2""".stripMargin
    ) { (spark, dir) =>
      statusOverlapPairs(statusEntityGrain(Tables(spark, dir).orders))
    },

    // ── agg_overlap_sketch: the SAME overlap, but from fixed-size KMV
    // sketches (graft.functions.KmvSketch — k min distinct hash values,
    // 8·k bytes, mergeable). agg_hll_partial_merge's HLL partials union
    // but cannot INTERSECT; KMV partials can: a sketch is a uniform
    // sample of the distinct-hash domain, so two segments' sketches
    // combine into union/intersection/Jaccard estimates with PLAIN array
    // arithmetic (Beyer et al., SIGMOD 2007) — no re-scan of raw data.
    // Level 1 builds per-(segment, bucket) partials (what a 100 TB
    // pipeline persists per day/partition); level 2 merges them with
    // array_union+sort+slice — codegen'd built-ins, demonstrating that
    // the persisted partials need no special union aggregate. Oracle
    // gate, the agg_quantile_sketch pattern: emitted n_both/n_union/
    // jaccard are EXACT (engine-neutral), and the sketch branch stays in
    // the executed plan because within_eps is computed FROM its
    // intersection estimate — drift past the bound hash-fails the driver
    // compare. At 100 TB only the sketch levels run; the exact self-join
    // is the oracle-scale verification pass. A sub-k UNION sketch is the
    // complete distinct-hash union of its pair, so small segment pairs
    // are answered exactly by construction.
    OpQuery.checked(
      "agg_overlap_sketch",
      """WITH su AS (SELECT DISTINCT o_orderstatus AS st, o_custkey AS c FROM orders),
        |cnt AS (SELECT st, CAST(count(*) AS BIGINT) AS n FROM su GROUP BY 1),
        |pairs AS (SELECT a.st AS status_a, b.st AS status_b, CAST(count(*) AS BIGINT) AS n_both
        |          FROM su a JOIN su b ON b.c = a.c AND a.st < b.st GROUP BY 1, 2)
        |SELECT p.status_a, p.status_b, p.n_both,
        |       CAST(ca.n + cb.n - p.n_both AS BIGINT) AS n_union,
        |       CAST(p.n_both AS DOUBLE) / CAST(ca.n + cb.n - p.n_both AS DOUBLE) AS jaccard,
        |       TRUE AS within_eps
        |FROM pairs p
        |JOIN cnt ca ON ca.st = p.status_a
        |JOIN cnt cb ON cb.st = p.status_b""".stripMargin
    ) { (spark, dir) =>
      graft.functions.KmvSketch.register(spark)
      // k=1024 → ~3% relative error (1/sqrt(k)); 8 KiB per partial
      val k = 1024
      val orders = Tables(spark, dir).orders
      // level 1: per-(segment, bucket) KMV partials over the codegen'd
      // 63-bit hash — fixed 8·k bytes each, map-side-combined
      val partials = orders
        .select(col("o_orderstatus").as("st"),
          expr("shiftrightunsigned(xxhash64(o_custkey), 1)").as("h"),
          Norm.hashBucket(col("o_orderkey"), 8).as("bucket"))
        .groupBy("st", "bucket")
        .agg(expr(s"kmv_sketch(h, $k)").as("sk"))
      // level 2: merge persisted partials with plain array arithmetic —
      // k smallest distinct across buckets is again a valid KMV sketch
      // segments-count rows of 8·k bytes; cached because the pair
      // self-join below consumes it twice (once per side) and the
      // alias-renamed subtrees defeat exchange reuse
      val sketches = partials.groupBy("st")
        .agg(slice(array_sort(array_distinct(flatten(collect_list(col("sk"))))), 1, k).as("sk"))
        .cache()
      // pair combine: union sketch = k smallest of A ∪ B; θ from its kth
      // value estimates the union cardinality, and the fraction of union-
      // sketch members present in BOTH input sketches estimates the
      // intersection. All built-in array ops; 2^63 rides IEEE doubles
      // identically in every engine, and only the audit bit consumes it.
      val twoP63 = 9.223372036854776e18
      // union sketch u = k smallest of A ∪ B. When u is SUB-k it is the
      // complete distinct-hash union (exact path — this is the only
      // condition under which exactness holds: sub-k INPUTS whose union
      // overflows k still need the estimator); at size k, θ from its kth
      // value gives the textbook KMV union estimate.
      val est = sketches.as("a")
        .join(sketches.as("b"), col("a.st") < col("b.st"))
        .select(col("a.st").as("status_a"), col("b.st").as("status_b"),
          slice(array_sort(array_union(col("a.sk"), col("b.sk"))), 1, k).as("u"),
          col("a.sk").as("ska"), col("b.sk").as("skb"))
        .select(col("status_a"), col("status_b"),
          when(size(col("u")) < k, size(col("u")).cast("double"))
            .otherwise(lit((k - 1).toDouble) * lit(twoP63) / element_at(col("u"), k).cast("double"))
            .as("union_est"),
          (size(array_intersect(array_intersect(col("u"), col("ska")), col("skb"))).cast("double")
            / size(col("u")).cast("double")).as("inter_frac"))
        .select(col("status_a"), col("status_b"),
          (col("inter_frac") * col("union_est")).as("inter_est"), col("union_est"))
      // exact branch (oracle-scale verification): the same dedup'd
      // self-join agg_distinct_overlap demonstrates, via the shared helper
      val su = statusEntityGrain(orders).cache()
      val cnt = su.groupBy("st").agg(count(lit(1)).as("n"))
      statusOverlapPairs(su)
        .join(cnt.select(col("st").as("status_a"), col("n").as("na")), Seq("status_a"))
        .join(cnt.select(col("st").as("status_b"), col("n").as("nb")), Seq("status_b"))
        .select(col("status_a"), col("status_b"), col("n_both"),
          (col("na") + col("nb") - col("n_both")).as("n_union"))
        .join(est, Seq("status_a", "status_b"))
        .select(col("status_a"), col("status_b"), col("n_both"), col("n_union"),
          (col("n_both").cast("double") / col("n_union").cast("double")).as("jaccard"),
          (abs(col("inter_est") - col("n_both").cast("double"))
            <= greatest(col("n_union").cast("double") * 0.12, lit(8.0))).as("within_eps"))
    },

    // ── agg_freq_sketch: point-frequency service from a Count-Min grid
    // (graft.functions.CountMinSketch). SpaceSaving answers "what are
    // the top keys"; Count-Min answers "how often did THIS key occur"
    // for ANY key from 8·d·w bytes — the skew-detection / hot-key-
    // routing primitive when the key domain dwarfs memory. One linear-
    // sketch aggregate over the fact table (map-side combine ships one
    // 64 KiB grid per partition), then the in-plan point query
    // (cm_estimate, same splitmix64 row hashes) runs once per QUERIED
    // key against the broadcast one-row grid. Oracle gate, the
    // agg_quantile_sketch pattern: emitted n_lines is the EXACT count,
    // and the sketch stays in the executed plan because within_bound is
    // computed FROM its estimate — Count-Min's one-sided guarantee
    // (exact ≤ est ≤ exact + εN) must hold or the row hash-fails the
    // driver compare. The audited ε is 8/w, the conventional e/w bound
    // with ~3× slack: at the theoretical 4/w each key fails with
    // p≈(1/4)^d, so ~70 queried keys under a fresh testdata hash draw
    // trip the deterministic gate with non-trivial probability; 8/w
    // makes that p≈(1/8)^d ≈ 2e-4 per key — real margin across data
    // regenerations. At 100 TB only the sketch side runs.
    OpQuery.checked(
      "agg_freq_sketch",
      """WITH q AS (SELECT p_partkey AS part_key FROM part WHERE p_partkey % 29 = 0),
        |c AS (SELECT l_partkey, CAST(count(*) AS BIGINT) AS n FROM lineitem GROUP BY 1)
        |SELECT q.part_key, CAST(COALESCE(c.n, 0) AS BIGINT) AS n_lines, TRUE AS within_bound
        |FROM q LEFT JOIN c ON c.l_partkey = q.part_key""".stripMargin
    ) { (spark, dir) =>
      graft.functions.CountMinSketch.register(spark)
      val (d, w) = (4, 2048)
      val t = Tables(spark, dir)
      val li = t.lineitem.select(col("l_partkey").as("k"))
      // one-row grid + the stream length its error bound is stated in
      val sk = li.agg(expr(s"cm_sketch(k, $d, $w)").as("sk"), count(lit(1)).as("n_total"))
      val queried = t.part.filter(pmod(col("p_partkey"), lit(29)) === 0)
        .select(col("p_partkey").as("part_key"))
      val exact = queried.join(
        li.groupBy(col("k").as("part_key")).agg(count(lit(1)).as("n_lines")),
        Seq("part_key"), "left_outer")
        .select(col("part_key"), coalesce(col("n_lines"), lit(0L)).as("n_lines"))
      exact.crossJoin(broadcast(sk))
        .select(col("part_key"), col("n_lines"),
          expr(s"cm_estimate(sk, part_key, $d, $w)").as("est"), col("n_total"))
        .select(col("part_key"), col("n_lines"),
          (col("est") >= col("n_lines") &&
            col("est").cast("double") <= col("n_lines").cast("double")
              + col("n_total").cast("double") * (8.0 / w)).as("within_bound"))
    },

    // ── win_row_number_topn: top-N per group with deterministic tiebreak
    // (ref LQY_query1.txt:94,110). Catalyst plans a WindowGroupLimit —
    // per-partition top-N before the shuffle, no full sort per group.
    OpQuery.checked(
      "win_row_number_topn",
      """SELECT * FROM (
        |  SELECT p_brand, p_partkey, CAST(p_retailprice AS DOUBLE) AS price,
        |         CAST(ROW_NUMBER() OVER (PARTITION BY p_brand
        |                                 ORDER BY p_retailprice DESC, p_partkey ASC) AS BIGINT) AS rn
        |  FROM part) WHERE rn <= 3""".stripMargin
    ) { (spark, dir) =>
      Tables(spark, dir).part
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice").cast("double").as("price"))
        .withColumn("rn", row_number().over(Window.partitionBy(col("p_brand"))
          .orderBy(col("price").desc, col("p_partkey").asc)).cast("long"))
        .filter(col("rn") <= 3)
    },

    // ── win_ntile_grouped: per-segment decile assignment at ROW grain —
    // `ntile(10) OVER (PARTITION BY event_type ORDER BY value)` — the
    // per-cohort score-bucketing every feature pipeline runs, and the
    // textbook LOW-CARDINALITY-partition-key trap: ~5 event types means
    // each window partition is a fifth of the corpus, sorted on ONE task
    // at any scale. Window-free rebuild: per-group rank + group size
    // from ONE composite-order GlobalRank.withGroupedRowNumber (range-
    // partitioned parallel sort, bounded cell-frame broadcast, rank =
    // arithmetic), then the decile is pure integer math on (rank, n)
    // via ntileOfRank — bit-identical to the SQL window. The oracle IS
    // the window form; plan-asserted group-key-window-free alongside
    // events_anomaly_mad in PlanQualitySpec.
    OpQuery.checked(
      "win_ntile_grouped",
      """SELECT event_id, event_type, CAST(value AS DOUBLE) AS value,
        |       CAST(ntile(10) OVER (PARTITION BY event_type
        |                            ORDER BY value, event_id) AS BIGINT) AS decile
        |FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL""".stripMargin
    ) { (spark, dir) =>
      // null group keys excluded on BOTH sides — the shared dailyGrid
      // null-exclusion contract; GlobalRank's in-plan guard would
      // otherwise turn a null event_type into a crash-vs-result
      // divergence (DuckDB ranks nulls as their own partition)
      val t = Tables(spark, dir).events
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"), col("value").cast("double").as("value"))
      graft.algo.GlobalRank
        .withGroupedRowNumber(
          t, Seq("event_type"), Seq(col("value").asc, col("event_id").asc), "rn", "n")
        .select(col("event_id"), col("event_type"), col("value"),
          graft.algo.GlobalRank.ntileOfRank(col("rn"), col("n"), 10).as("decile"))
    },

    // ── win_pctrank_grouped: per-cohort percent_rank + cume_dist at ROW
    // grain WITH REAL TIE SEMANTICS (score = floor(value), so RANK and
    // its peer class differ from ROW_NUMBER) — the same low-cardinality-
    // partition-key trap as win_ntile_grouped, promoted the same way:
    // ONE GlobalRank.withGroupedRowNumber over the composite order does
    // all the sorting TeraSort-shaped, then RANK = the tie class's MIN
    // row_number and the cume_dist numerator = its MAX row_number — one
    // map-side-combined aggregate at the (group, distinct score) grain
    // joined back (skew-safe: hot tie classes pre-reduce in the
    // combine; AQE handles a hot join key). percent_rank = (rank−1)/
    // (n−1) and cume_dist = max_rn/n are single BIGINT/BIGINT→DOUBLE
    // divisions, bit-identical in both engines; the oracle is the
    // explicit SQL-window form (rank(), partition counts) with the same
    // two divisions.
    OpQuery.checked(
      "win_pctrank_grouped",
      """WITH t AS (
        |  SELECT event_id, event_type,
        |         CAST(floor(CAST(value AS DOUBLE)) AS BIGINT) AS score
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |w AS (
        |  SELECT event_id, event_type, score,
        |         CAST(rank() OVER (PARTITION BY event_type ORDER BY score) AS BIGINT) AS rnk,
        |         CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
        |         CAST(count(*) OVER (PARTITION BY event_type, score) AS BIGINT) AS peers
        |  FROM t)
        |SELECT event_id, event_type, score,
        |       CASE WHEN n = 1 THEN 0.0
        |            ELSE CAST(rnk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE) END AS pct_rank,
        |       CAST(rnk + peers - 1 AS DOUBLE) / CAST(n AS DOUBLE) AS cume_dist
        |FROM w""".stripMargin
    ) { (spark, dir) =>
      // null group keys excluded on BOTH sides (dailyGrid contract) —
      // GlobalRank's null-group guard vs DuckDB's null partition would
      // otherwise diverge crash-vs-result
      val t = Tables(spark, dir).events
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_id"), col("event_type"),
          floor(col("value").cast("double")).cast("long").as("score"))
      val ranked = graft.algo.GlobalRank.withGroupedRowNumber(
        t, Seq("event_type"), Seq(col("score").asc, col("event_id").asc), "rn", "n")
      val ties = ranked.groupBy("event_type", "score")
        .agg(min(col("rn")).as("rnk"), max(col("rn")).as("max_rn"))
      ranked.join(ties, Seq("event_type", "score"))
        .select(col("event_id"), col("event_type"), col("score"),
          when(col("n") === 1, lit(0.0))
            .otherwise((col("rnk") - 1).cast("double") / (col("n") - 1).cast("double"))
            .as("pct_rank"),
          (col("max_rn").cast("double") / col("n").cast("double")).as("cume_dist"))
    },

    // ── agg_quantile_bands_grouped: EXACT per-group P10/P50/P90 as
    // value-at-rank ceil(p·n) — agg_percentile's scale path: Spark's
    // `percentile` aggregate buffers and sorts each group's values
    // INSIDE the agg buffer (fine at oracle scale, memory-unbounded per
    // group at 100 TB), while this plan takes the same discrete
    // quantiles from ONE GlobalRank.withGroupedRowNumber pass — range-
    // partitioned parallel sort, three rank-equality filters (pure
    // integer arithmetic) over the shared ranked frame, no per-group
    // state anywhere. Discrete (type-1) quantiles on purpose: a real
    // data value, no interpolation arithmetic to mirror.
    OpQuery.checked(
      "agg_quantile_bands_grouped",
      """WITH t AS (
        |  SELECT event_type, event_id, CAST(value AS DOUBLE) AS v
        |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL),
        |r AS (
        |  SELECT event_type, v,
        |         row_number() OVER (PARTITION BY event_type ORDER BY v, event_id) AS rn,
        |         count(*) OVER (PARTITION BY event_type) AS n
        |  FROM t)
        |SELECT event_type, CAST(10 AS BIGINT) AS pct, v FROM r WHERE rn = (n + 9) // 10
        |UNION ALL
        |SELECT event_type, CAST(50 AS BIGINT) AS pct, v FROM r WHERE rn = (n + 1) // 2
        |UNION ALL
        |SELECT event_type, CAST(90 AS BIGINT) AS pct, v FROM r WHERE rn = (9 * n + 9) // 10""".stripMargin
    ) { (spark, dir) =>
      // null group keys excluded on BOTH sides (dailyGrid contract)
      val t = Tables(spark, dir).events
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(col("event_type"), col("event_id"), col("value").cast("double").as("v"))
      // ONE pass over the ranked frame: each row emits the (possibly
      // empty) set of band ranks it occupies — three union branches
      // would re-run the rank window and broadcast join per band
      graft.algo.GlobalRank
        .withGroupedRowNumber(
          t, Seq("event_type"), Seq(col("v").asc, col("event_id").asc), "rn", "n")
        .select(col("event_type"),
          explode(expr(
            "filter(array(" +
              "if(rn = (n + 9) div 10, cast(10 as bigint), null), " +
              "if(rn = (n + 1) div 2, cast(50 as bigint), null), " +
              "if(rn = (9 * n + 9) div 10, cast(90 as bigint), null)), " +
              "x -> isnotnull(x))")).as("pct"),
          col("v"))
    },

    // ── win_lag: LAG deltas over ordered partitions — the YoY/QoQ engine
    // of all three reference reports (ref LQY_query1.txt:78,80).
    OpQuery.checked(
      "win_lag",
      """WITH monthly AS (
        |  SELECT c_mktsegment AS seg,
        |         CAST(year(o_orderdate)*100 + month(o_orderdate) AS BIGINT) AS ym,
        |         CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS rev
        |  FROM orders JOIN customer ON o_custkey = c_custkey
        |  GROUP BY c_mktsegment, year(o_orderdate)*100 + month(o_orderdate))
        |SELECT seg, ym, rev,
        |       lag(rev) OVER (PARTITION BY seg ORDER BY ym) AS prev_rev,
        |       rev - lag(rev) OVER (PARTITION BY seg ORDER BY ym) AS delta
        |FROM monthly""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      val monthly = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .groupBy(
          col("c_mktsegment").as("seg"),
          (year(col("o_orderdate")) * 100 + month(col("o_orderdate"))).cast("long").as("ym"))
        .agg(Norm.dsum(col("o_totalprice")).as("rev"))
      val w = Window.partitionBy(col("seg")).orderBy(col("ym"))
      monthly
        .withColumn("prev_rev", lag(col("rev"), 1).over(w))
        .withColumn("delta", col("rev") - col("prev_rev"))
    },

    // ── win_rank_family: the ranking-function family beyond ROW_NUMBER —
    // dense_rank, ntile quartiles, percent_rank, cume_dist per market
    // segment over customer spend. Total order (spend desc, custkey)
    // keeps every function cross-engine deterministic; one shuffle on the
    // segment, all four functions share the same window sort.
    OpQuery.checked(
      "win_rank_family",
      """WITH per_cust AS (
        |  SELECT c_mktsegment, c_custkey,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend_dec
        |  FROM orders JOIN customer ON c_custkey = o_custkey
        |  GROUP BY c_mktsegment, c_custkey)
        |SELECT c_mktsegment, c_custkey,
        |       CAST(spend_dec AS DOUBLE) AS spend,
        |       CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |       CAST(ntile(4) OVER w AS BIGINT) AS quartile,
        |       percent_rank() OVER w AS pct_rank,
        |       cume_dist() OVER w AS cume
        |FROM per_cust
        |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY spend_dec DESC, c_custkey)""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      val perCust = t.orders
        .join(broadcast(t.customer.select("c_custkey", "c_mktsegment")), col("c_custkey") === col("o_custkey"))
        .groupBy("c_mktsegment", "c_custkey")
        .agg(sum(Norm.dec(col("o_totalprice"))).as("spend_dec"))
      val w = Window.partitionBy("c_mktsegment").orderBy(col("spend_dec").desc, col("c_custkey"))
      perCust.select(
        col("c_mktsegment"), col("c_custkey"),
        col("spend_dec").cast("double").as("spend"),
        dense_rank().over(w).cast("long").as("drnk"),
        ntile(4).over(w).cast("long").as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
    },

    // ── win_whole_partition: aggregate OVER () — share of grand total
    // (ref 02_InsertMembers.sql:225) on revenue per nation.
    OpQuery.checked(
      "win_whole_partition",
      """WITH per_nation AS (
        |  SELECT n_name, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev_dec
        |  FROM orders
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation ON c_nationkey = n_nationkey
        |  GROUP BY n_name)
        |SELECT n_name, CAST(rev_dec AS DOUBLE) AS rev,
        |       CAST(rev_dec AS DOUBLE) / CAST(sum(rev_dec) OVER () AS DOUBLE) AS rev_share
        |FROM per_nation""".stripMargin
    ) { (spark, dir) =>
      val t = Tables(spark, dir)
      // Window-sum runs on exact decimal (order-independent); cast to double
      // only at the end, or the share drifts in the last bit vs the oracle.
      val perNation = t.orders
        .join(broadcast(t.customer), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t.nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(Norm.dec(col("o_totalprice"))).as("rev_dec"))
      perNation
        .select(
          col("n_name"),
          col("rev_dec").cast("double").as("rev"),
          (col("rev_dec").cast("double") / sum(col("rev_dec")).over(Window.partitionBy()).cast("double"))
            .as("rev_share"))
    },

    // ── win_range_frame: value-range window frames — rolling 7-day spend
    // per order priority with RANGE BETWEEN 6 PRECEDING AND CURRENT ROW
    // over a day-number order key (calendar-gap-aware, unlike ROWS
    // frames). Sum runs on exact decimal; one shuffle on the partition
    // key, frame evaluation is partition-local.
    OpQuery.checked(
      "win_range_frame",
      """WITH daily AS (
        |  SELECT o_orderpriority, CAST(o_orderdate AS DATE) AS od,
        |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
        |  FROM orders GROUP BY 1, 2),
        |d2 AS (SELECT *, datediff('day', DATE '1990-01-01', od) AS dnum FROM daily)
        |SELECT o_orderpriority, od,
        |       CAST(spend AS DOUBLE) AS day_spend,
        |       CAST(sum(spend) OVER (PARTITION BY o_orderpriority ORDER BY dnum
        |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE) AS spend_7d,
        |       CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY dnum
        |              RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT) AS days_in_frame
        |FROM d2""".stripMargin
    ) { (spark, dir) =>
      val daily = Tables(spark, dir).orders
        .groupBy(col("o_orderpriority"), to_date(col("o_orderdate")).as("od"))
        .agg(sum(Norm.dec(col("o_totalprice"))).as("spend"))
        .withColumn("dnum", datediff(col("od"), lit("1990-01-01").cast("date")).cast("long"))
      val frame = Window.partitionBy("o_orderpriority").orderBy("dnum").rangeBetween(-6, 0)
      daily.select(
        col("o_orderpriority"), col("od"),
        col("spend").cast("double").as("day_spend"),
        sum(col("spend")).over(frame).cast("double").as("spend_7d"),
        count(lit(1)).over(frame).cast("long").as("days_in_frame"))
    },

    // ── agg_topk_heap: per-group top-k as a MERGEABLE AGGREGATE
    // (graft.functions.TopKByScore) rather than a window operator — the
    // same top-N semantics as win_row_number_topn (ref
    // LQY_query1.txt:94,110) expressed as an algebra: O(k) state per
    // group per task, map-side combined, so the shuffle carries
    // O(groups × k) entries regardless of input size, it composes with
    // other aggregates in one groupBy (the count(*) here rides the same
    // hash-aggregate), and it runs unchanged inside watermarked
    // streaming windows where WindowExec is unsupported. Top-3 lineitems
    // by extended price per return flag, tie-broken by line id; the SQL
    // ROW_NUMBER oracle uses the identical (score DESC, id ASC) order.
    OpQuery.checked(
      "agg_topk_heap",
      """WITH li AS (
        |  SELECT l_returnflag,
        |         CAST(l_extendedprice AS DOUBLE) AS price,
        |         CAST(l_orderkey * 10 + l_linenumber AS BIGINT) AS line_id
        |  FROM lineitem),
        |n AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n_lines
        |      FROM li GROUP BY 1),
        |r AS (SELECT l_returnflag, price, line_id,
        |             CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
        |                    ORDER BY price DESC, line_id ASC) AS BIGINT) AS rn
        |      FROM li)
        |SELECT r.l_returnflag, r.rn, r.line_id, r.price, n.n_lines
        |FROM r JOIN n ON n.l_returnflag = r.l_returnflag
        |WHERE r.rn <= 3""".stripMargin
    ) { (spark, dir) =>
      graft.functions.TopKByScore.register(spark)
      val li = Tables(spark, dir).lineitem.select(
        col("l_returnflag"),
        col("l_extendedprice").cast("double").as("price"),
        (col("l_orderkey") * 10 + col("l_linenumber")).cast("long").as("line_id"))
      li.groupBy("l_returnflag")
        .agg(
          expr("topk_by_score(price, line_id, 3)").as("top"),
          count(lit(1)).as("n_lines"))
        .select(col("l_returnflag"), posexplode(col("top")), col("n_lines"))
        .select(
          col("l_returnflag"),
          (col("pos") + 1).cast("long").as("rn"),
          col("col.id").as("line_id"),
          col("col.score").as("price"),
          col("n_lines"))
    },

    // ── win_gap_fill: calendar resampling with last-observation-carried-
    // forward — the missing-day densification every time-series training
    // pipeline needs before building lag features (a model fed the
    // observed-days-only series silently learns the gap structure).
    // Scale shape: the calendar grid and the LOCF window live ENTIRELY on
    // the aggregated (priority, day) grain — constant in corpus size,
    // like events_cusum — never on raw orders; the grid is a
    // |priorities| × |days| cross join of two tiny frames, the bounds
    // come from a 1-row broadcast aggregate, and the fill itself is a
    // partition-local running last(ignoreNulls). Days before a series'
    // first observation stay NULL (no value to carry), flagged like
    // every filled row.
    OpQuery.checked(
      "win_gap_fill",
      s"""WITH $DailyGridSql
         |SELECT prio, day,
         |       CAST(last_value(spend IGNORE NULLS) OVER (
         |              PARTITION BY prio ORDER BY day
         |              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         |         AS spend_locf,
         |       (spend IS NULL) AS filled
         |FROM j""".stripMargin
    ) { (spark, dir) =>
      val locf = Window.partitionBy("prio").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      dailySpendGrid(spark, dir)
        .select(
          col("prio"), col("day"),
          last(col("spend"), ignoreNulls = true).over(locf).cast("double").as("spend_locf"),
          col("spend").isNull.as("filled"))
    },

    // ── win_interpolate: the other standard resample mode — LINEAR
    // interpolation between the surrounding observations instead of
    // win_gap_fill's LOCF. Same constant-size (priority, day) grain and
    // calendar grid; two partition-local passes (running last(ignoreNulls)
    // forward for the previous observation, first(ignoreNulls) over the
    // FOLLOWING frame for the next), then pure arithmetic:
    //   v = prev + (next − prev) × (day − prev_day) / (next_day − prev_day)
    // evaluated in DOUBLE with the identical operation order in both
    // engines (exact-decimal endpoints → nearest doubles, then the same
    // three IEEE ops), so the hash compare holds bit-for-bit. Days
    // outside [first, last] observation have no bracket and stay NULL.
    OpQuery.checked(
      "win_interpolate",
      s"""WITH $DailyGridSql,
         |br AS (
        |  SELECT prio, day, spend,
        |         CAST(last_value(spend IGNORE NULLS) OVER (PARTITION BY prio ORDER BY day
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS pv,
        |         last_value(CASE WHEN spend IS NOT NULL THEN day END IGNORE NULLS)
        |           OVER (PARTITION BY prio ORDER BY day
        |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pd,
        |         CAST(first_value(spend IGNORE NULLS) OVER (PARTITION BY prio ORDER BY day
        |                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS DOUBLE) AS nv,
        |         first_value(CASE WHEN spend IS NOT NULL THEN day END IGNORE NULLS)
        |           OVER (PARTITION BY prio ORDER BY day
        |                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nd
        |  FROM j)
        |SELECT prio, day,
        |       CASE WHEN spend IS NOT NULL THEN CAST(spend AS DOUBLE)
        |            WHEN pv IS NULL OR nv IS NULL THEN NULL
        |            ELSE pv + (nv - pv) * (CAST(datediff('day', pd, day) AS DOUBLE)
        |                                   / CAST(datediff('day', pd, nd) AS DOUBLE))
        |       END AS spend_lerp,
        |       (spend IS NULL) AS filled
        |FROM br""".stripMargin
    ) { (spark, dir) =>
      val back = Window.partitionBy("prio").orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val fwd = Window.partitionBy("prio").orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val obsDay = when(col("spend").isNotNull, col("day"))
      dailySpendGrid(spark, dir)
        .select(col("prio"), col("day"), col("spend"),
          last(col("spend"), ignoreNulls = true).over(back).cast("double").as("pv"),
          last(obsDay, ignoreNulls = true).over(back).as("pd"),
          first(col("spend"), ignoreNulls = true).over(fwd).cast("double").as("nv"),
          first(obsDay, ignoreNulls = true).over(fwd).as("nd"))
        .select(
          col("prio"), col("day"),
          when(col("spend").isNotNull, col("spend").cast("double"))
            .when(col("pv").isNull || col("nv").isNull, lit(null).cast("double"))
            .otherwise(col("pv") + (col("nv") - col("pv"))
              * (datediff(col("day"), col("pd")).cast("double")
                 / datediff(col("nd"), col("pd")).cast("double")))
            .as("spend_lerp"),
          col("spend").isNull.as("filled"))
    }
  )

  /** Shared resample scaffold (win_gap_fill + win_interpolate): daily
    * spend at the (priority, day) grain, densified over the full
    * calendar — bounds from a 1-row broadcast aggregate, calendar from
    * sequence(), a |priorities|×|days| grid cross join of two tiny
    * frames, then the observations left-joined on. Constant in corpus
    * size after the first aggregation; one helper so the two fill modes
    * can never disagree about the grid they fill. */
  private def dailySpendGrid(spark: org.apache.spark.sql.SparkSession, dir: String): org.apache.spark.sql.DataFrame = {
    val daily = Tables(spark, dir).orders
      .groupBy(col("o_orderpriority").as("prio"), to_date(col("o_orderdate")).as("od"))
      .agg(sum(Norm.dec(col("o_totalprice"))).as("spend"))
    val cal = daily.agg(min(col("od")).as("d0"), max(col("od")).as("dT"))
      .select(explode(expr("sequence(d0, dT, interval 1 day)")).as("day"))
    val grid = daily.select(col("prio")).distinct().crossJoin(broadcast(cal))
    grid.join(daily, grid("prio") === daily("prio") && col("day") === col("od"), "left")
      .select(grid("prio"), col("day"), col("spend"))
  }

  /** The oracle-side mirror of [[dailySpendGrid]] — CTEs ending in
    * `j(prio, day, spend)`. A def, not a val: the `ops` val above
    * initializes first, and a forward val reference would interpolate
    * null into the SQL. */
  private def DailyGridSql: String =
    """daily AS (
      |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS od,
      |         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
      |  FROM orders GROUP BY 1, 2),
      |b AS (SELECT min(od) AS d0, max(od) AS dT FROM daily),
      |cal AS (SELECT CAST(unnest(generate_series(b.d0, b.dT, INTERVAL 1 DAY)) AS DATE) AS day FROM b),
      |grid AS (SELECT p.prio, c.day
      |         FROM (SELECT DISTINCT prio FROM daily) p CROSS JOIN cal c),
      |j AS (SELECT g.prio, g.day, d.spend
      |      FROM grid g LEFT JOIN daily d ON d.prio = g.prio AND d.od = g.day)""".stripMargin

  /** The (segment, entity) grain both overlap ops dedup to first — a
    * map-side-combining distinct of (o_orderstatus, o_custkey). */
  private def statusEntityGrain(orders: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    orders.select(col("o_orderstatus").as("st"), col("o_custkey").as("c")).distinct()

  /** Exact pairwise overlap counts of a (st, c) grain: entity-key
    * self-join, fan-out bounded by segments² per entity — shared by
    * agg_distinct_overlap (as the whole op) and agg_overlap_sketch (as
    * its oracle-scale verification branch) so the two can never
    * silently diverge. */
  private def statusOverlapPairs(su: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
    su.as("a").join(su.as("b"), col("b.c") === col("a.c") && col("a.st") < col("b.st"))
      .groupBy(col("a.st").as("status_a"), col("b.st").as("status_b"))
      .agg(count(lit(1)).as("n_both"))
}
