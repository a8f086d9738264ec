package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregations — the bounded-memory answers for
  * questions whose exact form needs a full shuffle of distinct values.
  * At 100 TB these are the difference between a mergeable constant-size
  * state per partition (HLL registers) and an unbounded distinct set.
  *
  * Approximate results are engine-specific (Spark's HLL++ vs any oracle's
  * own sketch), so these register with the rows-only check, and the exact
  * twin query is what the DuckDB oracle verifies.
  */
object Sketches {

  /** Per-key distinct-user cardinality, approximate (HLL++, rsd 2%).
    * rsd sizes the dense HLL register array quadratically (1% ⇒ 16 K
    * registers per (task, group) buffer, measurably merge-bound even on
    * small data); 2% keeps the guarantee useful at a quarter of the
    * buffer, and small cardinalities stay exact in sparse mode anyway.
    *
    * The accuracy witness lives in [[distinctUsersExact]], NOT in this
    * aggregate: mixing `count_distinct` into the same agg forces Spark's
    * dual-path distinct rewrite (an Expand that re-feeds every input row
    * through a second aggregation path), measured at ~4× the cost of the
    * pure sketch — exactly the shuffle-of-distinct-values the sketch
    * exists to avoid. FunctionsSpec joins the two queries and pins the
    * approximation error instead.
    */
  def distinctUsers(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id"), rsd = 0.02).as("approx_users"),
        count(lit(1)).as("n_events"))

  /** Exact twin of [[distinctUsers]]: the hash-checked accuracy witness. */
  def distinctUsersExact(events: DataFrame): DataFrame =
    events
      .groupBy(col("event_type"))
      .agg(
        count_distinct(col("user_id")).as("exact_users"),
        count(lit(1)).as("n_events"))

  /** The [[distinctUsers]] accuracy contract as an ORACLE-CHECKABLE query:
    * join the sketch against its exact twin and emit, per key, the exact
    * count plus whether the relative error respects the bound. The sketch
    * VALUE is engine-specific (Spark HLL++) and can never hash-match a
    * DuckDB oracle — but the bound can: when the sketch honors its
    * contract every row is (key, exact_users, within_bound = true), which
    * the oracle produces from the exact aggregation alone. A sketch
    * drifting out of bound flips the boolean and the driver's hash check
    * goes red — the FunctionsSpec assertion, now standing in the
    * correctness artifact. Bound: 2.5× the declared rsd (0.02) — HLL++
    * rsd is one standard deviation, so a 2.5σ gate is a stable-yet-real
    * contract (false-alarm odds ~1%, independent per key).
    */
  def distinctUsersBound(events: DataFrame, maxRelErr: Double = 0.05): DataFrame =
    distinctUsers(events)
      .join(distinctUsersExact(events).drop("n_events"), "event_type")
      .select(col("event_type"), col("exact_users"),
        (abs(col("approx_users") - col("exact_users")).cast("double") /
          col("exact_users").cast("double") <= maxRelErr).as("within_bound"))

  /** Heavy hitters: top-k users per event_type by event count — the exact
    * groupBy top-k that stands where a count-min sketch would if the
    * group-by were unaffordable. One count aggregation (map-side combine)
    * feeds the rank; the rn<=k filter becomes a WindowGroupLimit, so each
    * map partition pre-prunes to k rows per key before the exchange — the
    * per-reducer input is k × partitions, never |users| × |keys|.
    */
  def frequentItems(events: DataFrame, k: Int = 5): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type")).orderBy(desc("cnt"), asc("user_id"))
    events
      .groupBy(col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
  }

  /** Approximate quantiles of the value distribution per key
    * (percentile_approx with a fixed accuracy — mergeable sketch state).
    * One scalar row per (key, q): array results don't survive generic
    * row-compare harnesses, and a flat (event_type, q, value) row is what
    * a downstream consumer joins on anyway.
    */
  def valueQuantiles(events: DataFrame): DataFrame = {
    val qs = Seq(0.5, 0.95, 0.99)
    val qArr = array(qs.map(lit): _*)
    events
      .groupBy(col("event_type"))
      .agg(percentile_approx(col("value"), qArr, lit(10000)).as("qv"))
      .select(col("event_type"), posexplode(col("qv")).as(Seq("pos", "value")))
      .select(col("event_type"),
        element_at(qArr, col("pos") + 1).as("q"),
        col("value"))
  }

  /** The [[valueQuantiles]] accuracy contract as an oracle-checkable query
    * (the quantile sibling of [[distinctUsersBound]]). percentile_approx's
    * guarantee is on RANK, not value: the returned value's rank is within
    * n/accuracy of the UNROUNDED target rank q·n — QuantileSummaries'
    * own convention (a ceil'd target is half a rank stricter and FAILS on
    * real data: measured at sf0.1, rank errors land exactly at the
    * n/accuracy edge, e.g. 2 vs 1.9863 for n=19863). The check re-ranks
    * each sketch value against the raw distribution — lo/hi = counts
    * strictly-below / at-or-below, so the value occupies rank interval
    * [lo+1, hi] — and asserts that interval intersects
    * [q·n − ε, q·n + ε] with ε = max(n/accuracy, 1): the one-rank floor
    * is Spark's own documented `max(floor(relativeError·N), 1)` — below
    * it the unrounded q·n target sits between two ranks and even an
    * exact answer is half a rank "off". One corpus scan + a broadcast of the
    * |keys|·|qs|-row sketch table; when the contract holds the output is
    * (key, q, n_events, true) rows the oracle reproduces exactly.
    */
  def valueQuantilesBound(events: DataFrame, accuracy: Int = 10000): DataFrame = {
    val target = col("n_events").cast("double") * col("q")
    val eps = greatest(col("n_events").cast("double") / accuracy, lit(1.0))
    events
      .join(broadcast(valueQuantiles(events).withColumnRenamed("value", "qv")),
        Seq("event_type"))
      .groupBy(col("event_type"), col("q"))
      .agg(
        count(lit(1)).as("n_events"),
        sum(when(col("value") < col("qv"), 1L).otherwise(0L)).as("lo"),
        sum(when(col("value") <= col("qv"), 1L).otherwise(0L)).as("hi"))
      .select(col("event_type"), col("q"), col("n_events"),
        (col("hi").cast("double") >= target - eps &&
          (col("lo") + 1).cast("double") <= target + eps)
          .as("within_bound"))
  }
}
