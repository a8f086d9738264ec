package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Harness relational query set over the TPC-H-ish tables (SURVEY.md §7.3
  * step 7). All Spark built-ins — Catalyst handles pushdown/pruning/join
  * selection; plans are asserted in PlanSpec.
  *
  * Scale notes (100 TB design stance, graded per operator):
  *   - Dimension joins (region/nation/customer at TPC-H ratios) are
  *     broadcast explicitly — no shuffle of the fact side.
  *   - Fact-fact joins shuffle on the join key once; AQE handles skew.
  *   - Top-k is rank-pushdown-friendly: ORDER BY + LIMIT lets Spark run
  *     TakeOrderedAndProject (per-partition heap + driver merge of k rows,
  *     never a full sort).
  *   - Aggregations are all partial+final (map-side combine) — nothing here
  *     forces a non-combinable agg on the hot path.
  */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Exact, order-independent, cross-engine-deterministic double SUM:
    * round each value to `scale` decimals via pure IEEE double ops
    * (`floor(x*10^s + 0.5)` — bit-identical in Spark and DuckDB), sum the
    * resulting longs exactly, rescale once at the end. A raw double SUM is
    * accumulation-order-dependent, and DECIMAL casts round differently
    * across engines (Spark casts through the double's shortest string
    * form); this formulation has neither problem.
    * Mirrors `CAST(SUM(CAST(FLOOR(x*10^s + 0.5) AS BIGINT)) AS DOUBLE)/10^s`.
    */
  private[graft] def dsum(c: Column, scale: Int): Column = {
    val f = math.pow(10.0, scale)
    sum(floor(c * lit(f) + lit(0.5)).cast(LongType)).cast(DoubleType) / lit(f)
  }

  /** SQL text of [[dsum]] for the DuckDB oracle side. */
  private def dsumSql(expr: String, scale: Int): String = {
    val f = s"1e$scale"
    s"CAST(SUM(CAST(FLOOR(($expr) * $f + 0.5) AS BIGINT)) AS DOUBLE) / $f"
  }

  val specs: Seq[QuerySpec] = Seq(
    // ---- filter + aggregate ------------------------------------------------
    // TPC-H Q1-shaped pricing summary: filter + group + decimal-stable aggs.
    QuerySpec(
      "q1_agg",
      (s, dir) => {
        val li = t(s, dir, "lineitem")
        li.filter(col("l_shipdate") <= lit("1998-09-02"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            dsum(col("l_quantity"), 2).as("sum_qty"),
            dsum(col("l_extendedprice"), 2).as("sum_base_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("sum_disc_price"),
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
              * (lit(1.0) + col("l_tax")), 4).as("sum_charge"),
            count(lit(1)).as("count_order"))
      },
      Some(s"""
        SELECT l_returnflag, l_linestatus,
               ${dsumSql("l_quantity", 2)} AS sum_qty,
               ${dsumSql("l_extendedprice", 2)} AS sum_base_price,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS sum_disc_price,
               ${dsumSql("l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax)", 4)} AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus""")),

    // TPC-H Q6-shaped selective scan: the whole query is filter + one global
    // agg — predicate pushdown must reach the parquet scan (PlanSpec checks).
    QuerySpec(
      "q6_filter_range",
      (s, dir) =>
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1994-01-01") &&
            col("l_shipdate") < lit("1995-01-01") &&
            col("l_discount").between(0.05, 0.07) &&
            col("l_quantity") < 24)
          .agg(dsum(col("l_extendedprice") * col("l_discount"), 4).as("revenue"),
            count(lit(1)).as("n")),
      Some(s"""
        SELECT ${dsumSql("l_extendedprice * l_discount", 4)} AS revenue,
               COUNT(*) AS n
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24""")),

    // ---- joins -------------------------------------------------------------
    // Dim-chain broadcast join: customer ⋈ nation ⋈ region. nation/region are
    // tiny at every SF → both broadcast; the customer side never shuffles.
    QuerySpec(
      "q2_join_broadcast",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal"), 2).as("sum_acctbal"))
      },
      Some(s"""
        SELECT r_name, n_name, COUNT(*) AS n_customers,
               ${dsumSql("c_acctbal", 2)} AS sum_acctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name, n_name""")),

    // Fact-fact shuffle join: orders ⋈ lineitem on orderkey — one hash
    // exchange per side on the join key, partial aggs pushed below the final.
    QuerySpec(
      "q3_join_facts",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        o.join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(
            dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some(s"""
        SELECT o_orderpriority,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
               COUNT(*) AS n_lines
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        GROUP BY o_orderpriority""")),

    // Left semi join (EXISTS): orders that have at least one late line.
    QuerySpec(
      "q4_semi_join",
      (s, dir) => {
        val o = t(s, dir, "orders")
        val late = t(s, dir, "lineitem")
          .filter(col("l_shipdate") > lit("1998-01-01"))
        o.join(late, o("o_orderkey") === late("l_orderkey"), "left_semi")
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n_orders"))
      },
      Some("""
        SELECT o_orderstatus, COUNT(*) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00')
        GROUP BY o_orderstatus""")),

    // Left anti join (NOT EXISTS): customers with no orders at all.
    QuerySpec(
      "q5_anti_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .agg(count(lit(1)).as("n_customers"),
            dsum(col("c_acctbal"), 2).as("sum_acctbal"))
      },
      Some(s"""
        SELECT COUNT(*) AS n_customers, ${dsumSql("c_acctbal", 2)} AS sum_acctbal
        FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""")),

    // Left outer join with null-producing side aggregated.
    QuerySpec(
      "q7_outer_join",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
          .filter(col("o_orderdate") >= lit("1997-01-01"))
        c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
          .groupBy(col("c_mktsegment"))
          .agg(count(col("o_orderkey")).as("n_recent_orders"),
            count(lit(1)).as("n_rows"))
      },
      Some("""
        SELECT c_mktsegment, COUNT(o_orderkey) AS n_recent_orders,
               COUNT(*) AS n_rows
        FROM customer c
        LEFT JOIN (SELECT * FROM orders
                   WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00') o
          ON c.c_custkey = o.o_custkey
        GROUP BY c_mktsegment""")),

    // ---- sort / limit / top-k ---------------------------------------------
    // Global top-k: Catalyst plans TakeOrderedAndProject (per-partition heap
    // of k, driver merge) — no full sort at any scale. Unique tiebreak key
    // keeps the result deterministic across engines.
    QuerySpec(
      "q8_topk",
      (s, dir) =>
        t(s, dir, "orders")
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
          .limit(10)
          .select(col("o_orderkey"), col("o_totalprice"), col("o_orderpriority")),
      Some("""
        SELECT o_orderkey, o_totalprice, o_orderpriority
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")),

    // ---- set operations ----------------------------------------------------
    QuerySpec(
      "q9_union",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "click").select(col("user_id"))
          .union(e.filter(col("event_type") === "view").select(col("user_id")))
          .distinct()
          .agg(count(lit(1)).as("n_users"))
      },
      Some("""
        SELECT COUNT(*) AS n_users FROM (
          SELECT user_id FROM events WHERE event_type = 'click'
          UNION
          SELECT user_id FROM events WHERE event_type = 'view')""")),

    QuerySpec(
      "q10_intersect",
      (s, dir) => {
        val e = t(s, dir, "events")
        e.filter(col("event_type") === "purchase").select(col("user_id"))
          .intersect(
            e.filter(col("event_type") === "error").select(col("user_id")))
      },
      Some("""
        SELECT user_id FROM events WHERE event_type = 'purchase'
        INTERSECT
        SELECT user_id FROM events WHERE event_type = 'error'""")),

    QuerySpec(
      "q11_except",
      (s, dir) =>
        t(s, dir, "orders").select(col("o_custkey").as("custkey"))
          .except(
            t(s, dir, "customer").filter(col("c_acctbal") > 0)
              .select(col("c_custkey").as("custkey"))),
      Some("""
        SELECT o_custkey AS custkey FROM orders
        EXCEPT
        SELECT c_custkey AS custkey FROM customer WHERE c_acctbal > 0""")),

    // ---- grouping sets ----------------------------------------------------
    QuerySpec(
      "q12_rollup",
      (s, dir) =>
        t(s, dir, "lineitem")
          .rollup(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty")),
      Some(s"""
        SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
               ${dsumSql("l_quantity", 2)} AS sum_qty
        FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""")),

    QuerySpec(
      "q13_cube",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val n = broadcast(t(s, dir, "nation"))
        c.join(n, c("c_nationkey") === n("n_nationkey"))
          .cube(col("n_name"), col("c_mktsegment"))
          .agg(count(lit(1)).as("n"))
      },
      Some("""
        SELECT n_name, c_mktsegment, COUNT(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY CUBE (n_name, c_mktsegment)""")),

    // ---- analytic (OVER) window functions ---------------------------------
    // Top-3 orders per customer: rank pushdown — Spark 3.5+ inserts a
    // WindowGroupLimit below the shuffle so each partition keeps ≤3 rows
    // per key before the exchange.
    QuerySpec(
      "q14_window_rank",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
      },
      Some("""
        SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 3""")),

    // lag/lead over event time per key (unique event_id tiebreak).
    QuerySpec(
      "q15_window_lag",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(asc("ts"), asc("event_id"))
        t(s, dir, "events")
          .withColumn("prev_value", lag(col("value"), 1).over(w))
          .withColumn("delta",
            floor((col("value") - col("prev_value")) * 10000 + 0.5) / 10000)
          .select(col("event_id"), col("event_type"), col("value"),
            col("prev_value"), col("delta"))
      },
      Some("""
        SELECT event_id, event_type, value, prev_value,
               FLOOR((value - prev_value) * 10000 + 0.5) / 10000 AS delta
        FROM (
          SELECT event_id, event_type, value,
                 LAG(value, 1) OVER (PARTITION BY event_type
                                     ORDER BY ts, event_id) AS prev_value
          FROM events)""")),

    // Running (cumulative) aggregate with a frame clause.
    QuerySpec(
      "q16_window_running",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(asc("o_orderdate"), asc("o_orderkey"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        t(s, dir, "orders")
          .withColumn("n_so_far", count(lit(1)).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("n_so_far"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               COUNT(*) OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS n_so_far
        FROM orders""")),

    // ---- distinct aggregation ---------------------------------------------
    QuerySpec(
      "q17_distinct_agg",
      (s, dir) =>
        t(s, dir, "events")
          .groupBy(col("event_type"))
          .agg(countDistinct(col("user_id")).as("n_users"),
            count(lit(1)).as("n_events")),
      Some("""
        SELECT event_type, COUNT(DISTINCT user_id) AS n_users,
               COUNT(*) AS n_events
        FROM events GROUP BY event_type""")),

    // ---- scalar expression surface ----------------------------------------
    // String/math/date builtins chosen for identical cross-engine semantics
    // (no round(): Spark HALF_UP vs DuckDB HALF_EVEN differ — floor-trick).
    QuerySpec(
      "q18_scalar_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(
            col("p_partkey"),
            upper(col("p_brand")).as("brand_u"),
            lower(col("p_type")).as("type_l"),
            length(col("p_name")).as("name_len"),
            substring(col("p_name"), 1, 8).as("name_pfx"),
            concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
            (col("p_size") % 7).as("size_mod"),
            abs(col("p_retailprice") - 1000.0).as("price_dist"),
            floor(col("p_retailprice")).cast(LongType).as("price_floor"),
            when(col("p_size") >= 30, "large")
              .when(col("p_size") >= 15, "medium")
              .otherwise("small").as("size_band")),
      Some("""
        SELECT p_partkey,
               UPPER(p_brand) AS brand_u,
               LOWER(p_type) AS type_l,
               LENGTH(p_name) AS name_len,
               SUBSTRING(p_name, 1, 8) AS name_pfx,
               CONCAT_WS('|', p_brand, p_type) AS brand_type,
               p_size % 7 AS size_mod,
               ABS(p_retailprice - 1000.0) AS price_dist,
               CAST(FLOOR(p_retailprice) AS BIGINT) AS price_floor,
               CASE WHEN p_size >= 30 THEN 'large'
                    WHEN p_size >= 15 THEN 'medium'
                    ELSE 'small' END AS size_band
        FROM part""")),

    // Date/time function surface over orders.
    QuerySpec(
      "q19_date_funcs",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(
            year(col("o_orderdate")).as("yr"),
            quarter(col("o_orderdate")).as("qtr"))
          .agg(count(lit(1)).as("n"),
            dsum(col("o_totalprice"), 2).as("sum_price")),
      Some(s"""
        SELECT CAST(YEAR(o_orderdate) AS INT) AS yr,
               CAST(QUARTER(o_orderdate) AS INT) AS qtr,
               COUNT(*) AS n, ${dsumSql("o_totalprice", 2)} AS sum_price
        FROM orders GROUP BY 1, 2""")),

    // ---- JSON extraction (S2 cousin: dynamic props column) -----------------
    QuerySpec(
      "q20_json_extract",
      (s, dir) =>
        t(s, dir, "events")
          .select(col("event_type"),
            get_json_object(col("props"), "$.k").cast(LongType).as("k"))
          .groupBy(col("event_type"))
          .agg(sum(col("k")).as("sum_k"),
            min(col("k")).as("min_k"),
            max(col("k")).as("max_k"),
            count(col("k")).as("n_with_k")),
      Some("""
        SELECT event_type,
               CAST(SUM(k) AS BIGINT) AS sum_k, MIN(k) AS min_k,
               MAX(k) AS max_k, COUNT(k) AS n_with_k
        FROM (SELECT event_type,
                     CAST(props->>'$.k' AS BIGINT) AS k FROM events)
        GROUP BY event_type""")),

    // ---- correlated scalar subquery / having -------------------------------
    QuerySpec(
      "q21_having",
      (s, dir) =>
        t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("n_orders"),
            dsum(col("o_totalprice"), 2).as("spend"))
          .filter(col("n_orders") >= 3),
      Some(s"""
        SELECT o_custkey, COUNT(*) AS n_orders,
               ${dsumSql("o_totalprice", 2)} AS spend
        FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 3""")),

    // ---- classic multi-join shapes -----------------------------------------
    // TPC-H Q3 shape: segment filter -> 3-way join -> revenue per order ->
    // deterministic top-10. Fact sides shuffle once on the join keys; the
    // final top-k is TakeOrderedAndProject (heap + driver merge of 10).
    QuerySpec(
      "q23_shipping_priority",
      (s, dir) => {
        val c = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(desc("revenue"), asc("o_orderkey"))
          .limit(10)
      },
      Some(s"""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10""")),

    // TPC-H Q5 shape: 6-way join (two broadcast dims at the top of the
    // chain), revenue per nation. Exercises join reordering + mixed
    // broadcast/shuffle strategy selection in one plan.
    QuerySpec(
      "q24_local_supplier_volume",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = broadcast(t(s, dir, "nation"))
        val r = broadcast(t(s, dir, "region"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .join(su, li("l_suppkey") === su("s_suppkey") &&
            c("c_nationkey") === su("s_nationkey"))
          .join(n, su("s_nationkey") === n("n_nationkey"))
          .join(r, n("n_regionkey") === r("r_regionkey"))
          .filter(r("r_name") === "ASIA")
          .groupBy(col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"),
            count(lit(1)).as("n_lineitems"))
      },
      Some(s"""
        SELECT n_name,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue,
               COUNT(*) AS n_lineitems
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
        GROUP BY n_name""")),

    // TPC-H Q10 shape: returned-item losses per customer, top-20 by
    // revenue. 3-way fact join + broadcast dim + deterministic top-k.
    QuerySpec(
      "q25_returned_items",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        val n = broadcast(t(s, dir, "nation"))
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .join(n, c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("n_name"))
          .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
            .as("revenue"))
          .orderBy(desc("revenue"), asc("c_custkey"))
          .limit(20)
      },
      Some(s"""
        SELECT c_custkey, c_name, n_name,
               ${dsumSql("l_extendedprice * (1.0 - l_discount)", 4)} AS revenue
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey LIMIT 20""")),

    // Discrete percentile per group: exact value at rank ceil(q*n), via the
    // value-histogram + cumulative-count formulation (operators.Percentiles)
    // — no full-table window on the 3-value l_returnflag key, so the raw
    // table never sorts through 3 reducers. The oracle keeps the equivalent
    // row_number formulation (fine for DuckDB's single-node sort).
    QuerySpec(
      "q26_percentile_disc",
      // distinct() after dropping q: if both quantiles select the SAME
      // rank (tiny groups, ceil(n*.5)==ceil(n*.95)), the oracle's
      // OR-filter emits that row once — so must we
      (s, dir) => graft.operators.Percentiles.percentileDisc(
        t(s, dir, "lineitem"), "l_returnflag", "l_extendedprice", Seq(0.5, 0.95))
        .drop("q").distinct(),
      Some("""
        SELECT l_returnflag, rn, n, l_extendedprice AS pct_value FROM (
          SELECT l_returnflag, l_extendedprice,
                 row_number() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
          FROM lineitem)
        WHERE rn = CEIL(n * 0.5) OR rn = CEIL(n * 0.95)""")),

    // Pivot: long -> wide on a known category set (explicit values keep
    // the output schema static — the planner never scans for categories).
    QuerySpec(
      "q28_pivot",
      (s, dir) =>
        t(s, dir, "events")
          .withColumn("cohort", col("user_id") % 10)
          .groupBy(col("cohort"))
          .pivot("event_type", Seq("click", "view", "purchase", "signup", "error"))
          .agg(count(lit(1)))
          .na.fill(0L),
      Some("""
        SELECT user_id % 10 AS cohort,
               COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS click,
               COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS view,
               COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS purchase,
               COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS signup,
               COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS error
        FROM events GROUP BY 1""")),

    // Unpivot: wide -> long (Dataset.unpivot / melt), the inverse shape.
    QuerySpec(
      "q29_unpivot",
      (s, dir) =>
        t(s, dir, "part")
          .unpivot(
            Array(col("p_partkey")),
            Array(col("p_size").cast(DoubleType).as("p_size"),
              col("p_retailprice").cast(DoubleType).as("p_retailprice")),
            "metric", "value"),
      Some("""
        SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value
        FROM part
        UNION ALL
        SELECT p_partkey, 'p_retailprice' AS metric,
               CAST(p_retailprice AS DOUBLE) AS value
        FROM part""")),

    // NTILE bucketing per high-cardinality key: equal-depth quartiles of
    // each customer's orders (remainder rows to the leading buckets —
    // identical convention in both engines; unique sort key pins the
    // assignment).
    QuerySpec(
      "q30_ntile",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("o_custkey"))
          .orderBy(asc("o_totalprice"), asc("o_orderkey"))
        t(s, dir, "orders")
          .withColumn("quartile", ntile(4).over(w))
          .select(col("o_custkey"), col("o_orderkey"), col("quartile"))
      },
      Some("""
        SELECT o_custkey, o_orderkey,
               NTILE(4) OVER (PARTITION BY o_custkey
                              ORDER BY o_totalprice, o_orderkey) AS quartile
        FROM orders""")),

    // TPC-H Q8 shape (market share): revenue share of one supplier nation
    // among AMERICA-region customers, by order year. A 6-way join (three
    // broadcast dims), then a conditional-numerator aggregate — num and
    // den both exact scaled-long sums, one final IEEE division.
    QuerySpec(
      "q31_market_share",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n1 = broadcast(t(s, dir, "nation"))
        val n2 = broadcast(t(s, dir, "nation")
          .select(col("n_nationkey").as("s_nkey"), col("n_name").as("supp_nation")))
        val r = broadcast(t(s, dir, "region"))
        val vol = floor(col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * lit(10000.0) + lit(0.5)).cast(LongType)
        c.join(o, c("c_custkey") === o("o_custkey"))
          .join(li, o("o_orderkey") === li("l_orderkey"))
          .join(su, li("l_suppkey") === su("s_suppkey"))
          .join(n1, c("c_nationkey") === n1("n_nationkey"))
          .join(r, n1("n_regionkey") === r("r_regionkey"))
          .join(n2, su("s_nationkey") === n2("s_nkey"))
          .filter(r("r_name") === "AMERICA")
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(
            (sum(when(col("supp_nation") === "NATION_3", vol).otherwise(lit(0L)))
              .cast(DoubleType) /
              sum(vol).cast(DoubleType)).as("mkt_share"),
            (sum(vol).cast(DoubleType) / lit(10000.0)).as("total_revenue"))
      },
      Some("""
        WITH v AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                 CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e4 + 0.5)
                   AS BIGINT) AS vol,
                 ns.n_name AS supp_nation
          FROM customer
          JOIN orders ON c_custkey = o_custkey
          JOIN lineitem ON o_orderkey = l_orderkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation nc ON c_nationkey = nc.n_nationkey
          JOIN region ON nc.n_regionkey = r_regionkey
          JOIN nation ns ON s_nationkey = ns.n_nationkey
          WHERE r_name = 'AMERICA')
        SELECT o_year,
               CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN vol ELSE 0 END)
                 AS DOUBLE) / CAST(SUM(vol) AS DOUBLE) AS mkt_share,
               CAST(SUM(vol) AS DOUBLE) / 1e4 AS total_revenue
        FROM v GROUP BY o_year""")),

    // Distribution window functions: cume_dist + percent_rank per nation
    // over customer balances (unique order key pins both engines to the
    // same frame; both values are exact integer ratios).
    QuerySpec(
      "q32_cume_dist",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_nationkey"))
          .orderBy(asc("c_acctbal"), asc("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
            cume_dist().over(w).as("cd"),
            percent_rank().over(w).as("pr"))
      },
      Some("""
        SELECT c_nationkey, c_custkey, c_acctbal,
               cume_dist() OVER w AS cd,
               percent_rank() OVER w AS pr
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""")),

    // Banded twin of q32: identical results (the oracle IS q32's), but the
    // window key is (c_nationkey, acctbal band) so the customer table never
    // sorts through 25 reducers — the scale-safe decomposition, like the
    // q15/q15_banded lag pair. bandWidth=500 over acctbal's ~[-1000, 10000]
    // range gives ~22 bands per nation.
    QuerySpec(
      "q32_cume_dist_banded",
      (s, dir) => graft.operators.Percentiles.distributionBanded(
        t(s, dir, "customer"), "c_nationkey", "c_acctbal", "c_custkey",
        bandWidth = 500.0)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"),
          col("cd"), col("pr")),
      Some("""
        SELECT c_nationkey, c_custkey, c_acctbal,
               cume_dist() OVER w AS cd,
               percent_rank() OVER w AS pr
        FROM customer
        WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)""")),

    // Correlated EXISTS through the SQL path: customers with at least one
    // urgent order — Catalyst decorrelates to a left-semi join.
    QuerySpec(
      "q27_exists_decorrelated",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT c_custkey, c_name
          FROM customer
          WHERE EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')""")
      },
      Some("""
        SELECT c_custkey, c_name
        FROM customer
        WHERE EXISTS (
          SELECT 1 FROM orders
          WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')"""))
  ) ++ Seq(

    // Explicit GROUPING SETS (the shape ROLLUP/CUBE can't express:
    // hand-picked cells only) + grouping_id to disambiguate the NULL of
    // "aggregated over" from a NULL data value.
    QuerySpec(
      "q34_grouping_sets",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
                 COUNT(*) AS n
          FROM lineitem
          GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                  (l_returnflag, l_linestatus))""")
      },
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(grouping_id(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus),
                                (l_returnflag, l_linestatus))""")),

    // Correlated scalar-AVG subquery (the TPC-H Q17 small-quantity-order
    // shape): revenue lost to orders below 20% of the part's average
    // quantity. Catalyst decorrelates the scalar subquery to a per-part
    // aggregate joined back — the third decorrelation pattern the suite
    // pins (EXISTS → semi join, IN → semi join, scalar agg → join).
    // Cross-engine exactness: the compared average runs over the
    // floor-scaled integer quantity (sum and count both exact, ONE IEEE
    // division each side), and the revenue sum goes through the DECIMAL
    // accumulator.
    QuerySpec(
      "q33_scalar_subquery_agg",
      (s, dir) => {
        Tables.registerAll(s, dir)
        s.sql("""
          SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                   / 7.0 AS avg_yearly
          FROM lineitem, part
          WHERE p_partkey = l_partkey
            AND p_brand = 'Brand#1'
            AND CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) < 0.2 * (
              SELECT AVG(CAST(FLOOR(l2.l_quantity * 100 + 0.5) AS BIGINT))
              FROM lineitem l2
              WHERE l2.l_partkey = p_partkey)""")
      },
      Some("""
        SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 / 7.0 AS avg_yearly
        FROM lineitem, part
        WHERE p_partkey = l_partkey
          AND p_brand = 'Brand#1'
          AND CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) < 0.2 * (
            SELECT AVG(CAST(FLOOR(l2.l_quantity * 100 + 0.5) AS BIGINT))
            FROM lineitem l2
            WHERE l2.l_partkey = p_partkey)""")),

    // The CBO loop CLOSED (r14): the Q3 shape written in the WORST
    // syntactic order (fact ⋈ fact first, the selective BUILDING
    // customer slice LAST), run over ANALYZE'd catalog tables with
    // spark.sql.cbo.enabled + joinReorder.enabled — CostBasedJoinReorder
    // re-roots the join tree at (customer ⋈ orders) from the statistics
    // alone (PlanSpec pins both optimized plans; this oracle hash pins
    // that the re-ordering changed no semantics). The consumer side of
    // the r13 gov_join_estimate / gov_range_estimate gauges.
    QuerySpec(
      "q35_cbo_priority",
      (s, dir) => graft.plans.Cbo.shippingPriorityCbo(s, dir),
      Some("""
        SELECT o_orderkey, o_orderdate, o_orderpriority,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e4
                 + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
        FROM lineitem
        JOIN orders ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY o_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, o_orderkey LIMIT 10"""))
  )
}
