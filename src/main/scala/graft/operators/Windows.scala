package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Event-time window aggregations — the reference's core query semantics.
  *
  * Tumbling candlestick: reference `flink/tumbling_window.py:164-198`
  * (SQL `GROUP BY TUMBLE(utc, INTERVAL '1' MINUTE), ticker` with
  * FIRST_VALUE/LAST_VALUE/MIN/MAX over price).
  * Sliding min: reference `flink/sliding_window.py:154-183`
  * (Table API `Slide.over(o).every(e).on(utc)` + `price.min`).
  *
  * FIRST_VALUE/LAST_VALUE are arrival-order in Flink group windows; we pin
  * the deterministic event-time reading (`min_by`/`max_by` on the event
  * time) per SURVEY.md §2 note (a). Batch and streaming share these exact
  * transformations; the streaming layer adds `withWatermark` before calling.
  */
object Windows {

  /** Per-(key, tumbling window) candlestick: open/close/min/max of `valCol`.
    * One window per row — Catalyst rewrites tumbling `window()` to a plain
    * projection (no Expand), so this is a single hash aggregate + one
    * shuffle on (key, window); partial aggregation runs map-side.
    */
  def candlestick(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valCol: String = "value",
      width: String = "1 minute"): DataFrame = {
    val ts = col(tsCol)
    val v = col(valCol)
    events
      .groupBy(window(ts, width), col(keyCol).as("ticker"))
      .agg(
        min_by(v, ts).as("first_price"),
        max_by(v, ts).as("last_price"),
        min(v).as("min_price"),
        max(v).as("max_price"))
      .select(
        col("ticker"),
        col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("first_price"), col("last_price"),
        col("min_price"), col("max_price"))
  }

  /** Per-(key, hopping window) MIN. Direct form: Spark expands each row to
    * over/every windows. Fine when the overlap factor is small; see
    * [[slidingMinTwoLevel]] for the scale path (SURVEY.md §2 note (b)).
    */
  def slidingMin(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valCol: String = "value",
      over: String = "10 minutes",
      every: String = "5 minutes"): DataFrame =
    events
      .groupBy(window(col(tsCol), over, every), col(keyCol).as("ticker"))
      .agg(min(col(valCol)).as("p"))
      .select(col("ticker"), col("p"), col("window.end").as("t"))

  /** Two-level decomposition of [[slidingMin]] for decomposable aggregates:
    * 1-`every` tumbling partial MIN per key (shrinks input to one row per
    * (key, pane) BEFORE any expansion), then each pane rolls up into the
    * over/every hopping windows it belongs to. At the reference's 8h/1min
    * config this turns a 480× row blowup of raw data into a 480× blowup of
    * already-aggregated panes — the difference between shuffling 100 TB×480
    * and shuffling (keys × panes)×480.
    */
  def slidingMinTwoLevel(
      events: DataFrame,
      tsCol: String = "ts",
      keyCol: String = "event_type",
      valCol: String = "value",
      over: String = "10 minutes",
      every: String = "5 minutes"): DataFrame = {
    val partial = events
      .groupBy(window(col(tsCol), every), col(keyCol).as("ticker"))
      .agg(min(col(valCol)).as("pane_min"))
      .select(col("ticker"), col("window.start").as("pane_start"), col("pane_min"))
    // Roll panes up into hopping windows keyed by the window they cover:
    // a pane starting at s belongs to windows ending at s+every .. s+over
    // (step `every`). window() on the pane start with the same over/every
    // reproduces exactly that assignment.
    partial
      .groupBy(window(col("pane_start"), over, every), col("ticker"))
      .agg(min(col("pane_min")).as("p"))
      .select(col("ticker"), col("p"), col("window.end").as("t"))
  }

  /** Schema-on-read projection (reference S2/S6): declare 3 of N fields,
    * rename to the reference's tick schema. Extra fields are pruned at the
    * parquet scan (ReadSchema shows only the 3 columns).
    */
  def tickProjection(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("ticker"),
      col("value").as("price"),
      col("ts").as("utc"))
}
