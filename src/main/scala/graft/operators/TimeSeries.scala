package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators over the events stream (batch forms; the
  * streaming layer reuses the same transforms with watermarks).
  */
object TimeSeries {

  /** Resample to fixed buckets with exact-arithmetic mean.
    * One shuffle on (key, bucket); partial aggregation map-side.
    */
  def resample(events: DataFrame, width: String = "1 hour"): DataFrame =
    events
      .groupBy(window(col("ts"), width), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(floor(col("value") * 10000 + 0.5).cast("long")).cast("double") / 10000)
          .as("sum_value"))
      .select(col("event_type"), col("window.start").as("bucket"),
        col("n"), col("sum_value"),
        (col("sum_value") / col("n").cast("double")).as("avg_value"))

  /** Top-k rows per group (rank pushdown: the rn<=k filter becomes a
    * WindowGroupLimit, so partitions pre-prune to k rows per key before
    * the exchange).
    */
  def topKPerGroup(events: DataFrame, k: Int = 5): DataFrame = {
    val w = Window.partitionBy(col("event_type"))
      .orderBy(desc("value"), asc("event_id"))
    events
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("value"), col("rn"))
  }

  /** Session windows via Spark's native session_window: per user, events
    * merge into one session while each is within `gap` of the previous;
    * window end = last event + gap. Same islands as [[sessionize]] (the
    * lag/running-sum form), expressed as the engine-native session window —
    * also the shape the streaming layer uses with a watermark.
    */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"))

  /** Sessionization: per user, a new session starts after a gap > maxGap.
    * Two stacked window functions over the same (user, time) ordering —
    * one shuffle on user_id total.
    */
  def sessionize(events: DataFrame, maxGapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc("ts"), asc("event_id"))
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > maxGapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .select(col("user_id"), col("event_id"), col("session_id"))
  }
}
