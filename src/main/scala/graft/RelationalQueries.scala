package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType}

/** Harness relational query set over the TPC-H-ish tables (SURVEY.md §7.3
  * step 7). All Spark built-ins — Catalyst handles pushdown/pruning/join
  * selection; we verify the plans in tests.
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
  private[graft] def dsum(c: org.apache.spark.sql.Column, scale: Int) = {
    val f = math.pow(10.0, scale)
    (sum(floor(c * lit(f) + lit(0.5)).cast(LongType)).cast(DoubleType) / lit(f))
  }

  val specs: Seq[QuerySpec] = Seq(
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
      Some("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(FLOOR(l_quantity * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
               CAST(SUM(CAST(FLOOR(l_extendedprice * 100.0 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base_price,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_disc_price,
               CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) * 10000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_charge,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus"""))
  )
}
