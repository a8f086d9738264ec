package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) modeling: turn a change-event feed
  * into an effective-dated dimension and join facts to the version that
  * was in force at each fact's own timestamp — the standard warehouse
  * answer to "what was this customer's tier WHEN the sale happened",
  * which no snapshot join can answer once the attribute has moved on.
  * (Extension surface — the reference demo has no dimensional modeling;
  * its closest notion is the latest-value candlestick close,
  * tumbling_window.py:64-96.)
  */
object Dimensions {

  /** Build the SCD-2 dimension from a change feed of
    * `(key, event_ts, attr)` rows derived here from orders: each
    * customer's orders are profile-change events carrying that order's
    * priority as the "current tier".
    *
    * Pipeline (all window/agg shapes, every order key unique so every
    * tiebreak is deterministic):
    *   1. collapse same-day events: `max_by(attr, o_orderkey)` — last
    *      write of the day wins;
    *   2. suppress no-op updates: drop an event equal to the previous
    *      day's surviving value (`lag` compare) — Type 2 versions exist
    *      only where the attribute actually changed;
    *   3. effective-date the survivors: `eff_from` = change day,
    *      `eff_to` = `lead(eff_from)` (NULL = current version),
    *      `version_no` = `row_number` per key.
    *
    * Scale: one shuffle on (key, day) for the collapse, then the three
    * window functions share ONE partitioning on key — Catalyst plans a
    * single Exchange + sort for steps 2-3. Output is |change events|
    * rows (dimension-sized, ~versions-per-customer × customers), never
    * fact-sized.
    */
  def scd2Dim(orders: DataFrame): DataFrame = {
    val byKey = Window.partitionBy("custkey").orderBy("eff_from")
    orders
      .groupBy(col("o_custkey").as("custkey"),
        col("o_orderdate").as("eff_from"))
      .agg(max_by(col("o_orderpriority"), col("o_orderkey")).as("tier"))
      .withColumn("prev_tier", lag(col("tier"), 1).over(byKey))
      .where(col("prev_tier").isNull || col("prev_tier") =!= col("tier"))
      .select(col("custkey"),
        row_number().over(byKey).as("version_no"),
        col("tier"),
        col("eff_from"),
        lead(col("eff_from"), 1).over(byKey).as("eff_to"))
  }

  /** Temporal fact join: every lineitem priced under the dimension
    * version in force AT ITS SHIP DATE —
    * `eff_from <= l_shipdate < eff_to` (open `eff_to` = current). The
    * fact row reaches its customer key through the standard
    * lineitem ⋈ orders equi-join; every fact matches exactly one
    * version (a customer's intervals tile `[first event, ∞)` and
    * `l_shipdate >= o_orderdate >=` that customer's first event day).
    *
    * Scale: the dimension join is an EQUI hash join on custkey with the
    * date range as a residual condition — never a nested-loop product
    * (PlanSpec pins it). The dimension side is versions-per-customer ×
    * customers — orders-of-magnitude under the fact table, broadcast-able
    * until customers themselves are huge, after which it shuffles on
    * custkey like any dim join. Output is a bounded (tier × year) grid.
    */
  def scd2FactJoin(orders: DataFrame, lineitem: DataFrame): DataFrame = {
    val dim = scd2Dim(orders)
    val facts = lineitem
      .join(orders.select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
    facts
      .join(dim,
        col("o_custkey") === col("custkey") &&
          col("eff_from") <= col("l_shipdate") &&
          (col("eff_to").isNull || col("l_shipdate") < col("eff_to")))
      .groupBy(col("tier"), year(col("l_shipdate")).as("yr"))
      .agg(count(lit(1)).as("n_items"),
        graft.RelationalQueries.dsum(
          col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
          .as("revenue"))
  }
}
