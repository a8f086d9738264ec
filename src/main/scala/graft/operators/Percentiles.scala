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
}
