package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact discrete percentiles, formulated for low-cardinality keys.
  *
  * The naive form — `row_number() OVER (PARTITION BY key ORDER BY value)`
  * over the raw table — funnels the WHOLE table through one reducer per
  * key; with a handful of distinct keys that is a single-machine sort of
  * 100 TB. This formulation never sorts raw rows:
  *
  *   1. histogram: `groupBy(key, value) -> count` — one shuffle with
  *      map-side combine; output size is |distinct (key, value)|, not |rows|.
  *   2. cumulative counts over the (small) histogram, per key.
  *   3. for each requested q, pick the bin containing rank `ceil(q·n)`.
  *
  * The only windowed data is the histogram, so the per-key reducer handles
  * |distinct values| rows — bounded by the value domain, independent of
  * table size. Results are identical to the row_number formulation: the
  * value at sort position ceil(q·n) is exactly the smallest value whose
  * cumulative count reaches that rank.
  */
object Percentiles {

  /** One row per (key, q): `(key, q, rn, n, pct_value)` where `rn =
    * ceil(q·n)` is the selected rank, `n` the key's row count, and
    * `pct_value` the exact q-th discrete percentile of `valCol`.
    * Deterministic with no tiebreak column — rank→value only depends on
    * the value ordering. Callers must drop null values first: engines
    * disagree on where nulls sort, so a null bucket would shift ranks
    * inconsistently.
    */
  def percentileDisc(
      df: DataFrame, keyCol: String, valCol: String, qs: Seq[Double]): DataFrame = {
    val hist = df.groupBy(col(keyCol), col(valCol)).agg(count(lit(1)).as("cnt"))
    val wCum = Window.partitionBy(col(keyCol)).orderBy(col(valCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(col(keyCol))
    hist
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("n", sum(col("cnt")).over(wAll))
      .select(col(keyCol), col(valCol), col("cnt"), col("cum"), col("n"),
        explode(array(qs.map(lit): _*)).as("q"))
      .withColumn("rn", ceil(col("n") * col("q")))
      // the bin containing rank rn: previous cumulative < rn <= cumulative
      .filter(col("cum") >= col("rn") && (col("cum") - col("cnt")) < col("rn"))
      .select(col(keyCol), col("q"), col("rn"), col("n"),
        col(valCol).as("pct_value"))
  }

  /** cume_dist + percent_rank over a LOW-cardinality key without funnelling
    * the raw table through |keys| reducers — the banded two-pass
    * decomposition (the distribution-window sibling of
    * [[TimeSeries.bandedLag]]). A plain
    * `cume_dist() OVER (PARTITION BY key ORDER BY val, tie)` with ~25
    * distinct keys sorts the whole table through 25 reducers — a
    * single-machine sort at 100 TB. Here the window key is (key, value
    * band), so parallelism scales with |keys| × |bands|:
    *
    *   1. in-band rank: `row_number` per (key, band) ordered by (val, tie) —
    *      partitions are value-bounded slices, embarrassingly parallel.
    *   2. band prefix counts: per-(key, band) row counts (one map-side-
    *      combinable aggregate), then a running sum over the per-key band
    *      sequence plus the key total — the windowed data is the tiny
    *      |keys| × |bands| aggregate, never raw rows. Broadcast back.
    *   3. global rank = prefix + in-band rank; cd = rank / total,
    *      pr = (rank − 1) / (total − 1) (0.0 for a single-row partition,
    *      both engines' convention).
    *
    * Identical to the single-window form because the band is a monotone
    * function of `valCol`: global (val, tie) order equals (band, val, tie)
    * order. REQUIRES (valCol, tieCol) unique within each key — with no
    * peer rows, cume_dist degenerates to rank/total (the tiebreak column
    * q32 already carries for cross-engine determinism).
    */
  def distributionBanded(
      df: DataFrame, keyCol: String, valCol: String, tieCol: String,
      bandWidth: Double): DataFrame = {
    val banded = df.select(col(keyCol), col(valCol), col(tieCol))
      .withColumn("band", floor(col(valCol) / lit(bandWidth)).cast("long"))
    val wBand = Window.partitionBy(col(keyCol), col("band"))
      .orderBy(asc(valCol), asc(tieCol))
    // per-(key, band) counts -> running prefix + key total over the tiny
    // band table (|keys| x |bands| rows); the raw table is never windowed
    // on the bare key
    val wBands = Window.partitionBy(col(keyCol)).orderBy(asc("band"))
    val carry = banded
      .groupBy(col(keyCol), col("band"))
      .agg(count(lit(1)).as("n_band"))
      .withColumn("prefix", coalesce(
        sum(col("n_band")).over(wBands.rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .withColumn("total",
        sum(col("n_band")).over(Window.partitionBy(col(keyCol))))
      .select(col(keyCol), col("band"), col("prefix"), col("total"))
    banded
      .withColumn("rnk", row_number().over(wBand))
      .join(broadcast(carry), Seq(keyCol, "band"))
      .withColumn("grank", col("prefix") + col("rnk"))
      .withColumn("cd", col("grank").cast("double") / col("total").cast("double"))
      .withColumn("pr", when(col("total") === 1L, lit(0.0))
        .otherwise((col("grank") - 1L).cast("double") /
          (col("total") - 1L).cast("double")))
      .select(col(keyCol), col(tieCol), col(valCol), col("cd"), col("pr"))
  }
}
