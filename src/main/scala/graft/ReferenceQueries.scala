package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.Windows

/** Batch-checkable forms of the reference's operator surface (SURVEY.md
  * §2-A), run over the `events` table (`ts→utc, event_type→ticker-like key,
  * value→price` per FIXTURES.md B). The streaming layer reuses the same
  * transformations via graft.streaming.
  */
object ReferenceQueries {

  private def events(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val specs: Seq[QuerySpec] = Seq(
    // S4 + S7 + S8: tumbling event-time candlestick
    // (flink/tumbling_window.py:164-198; event-time FIRST/LAST per SURVEY §2(a))
    QuerySpec(
      "candlestick_tumbling",
      (s, dir) => Windows.candlestick(events(s, dir)),
      Some("""
        SELECT event_type AS ticker,
               time_bucket(INTERVAL '1 minute', ts) AS window_start,
               time_bucket(INTERVAL '1 minute', ts) + INTERVAL '1 minute' AS window_end,
               arg_min(value, ts) AS first_price,
               arg_max(value, ts) AS last_price,
               min(value) AS min_price,
               max(value) AS max_price
        FROM events GROUP BY 1, 2, 3""")),

    // S5: hopping-window MIN, direct form (flink/sliding_window.py:154-183).
    // Window containment needs no predicate: for i in 0..1,
    // bucket5(ts) - i*5min <= ts < bucket5(ts) - i*5min + 10min always holds.
    QuerySpec(
      "sliding_window_min",
      (s, dir) => Windows.slidingMin(events(s, dir)),
      Some("""
        SELECT event_type AS ticker, min(value) AS p,
               time_bucket(INTERVAL '5 minutes', ts) - (INTERVAL '5 minutes' * i)
                 + INTERVAL '10 minutes' AS t
        FROM events, generate_series(0, 1) s(i)
        GROUP BY 1, 3""")),

    // S5 scale path: two-level (pane partial -> rollup) decomposition;
    // identical semantics, so the same oracle (SURVEY §2 note (b)).
    QuerySpec(
      "sliding_min_two_level",
      (s, dir) => Windows.slidingMinTwoLevel(events(s, dir)),
      Some("""
        SELECT event_type AS ticker, min(value) AS p,
               time_bucket(INTERVAL '5 minutes', ts) - (INTERVAL '5 minutes' * i)
                 + INTERVAL '10 minutes' AS t
        FROM events, generate_series(0, 1) s(i)
        GROUP BY 1, 3""")),

    // S2 + S6: schema-on-read projection to the reference tick schema
    // (3 of N fields survive; flink/tumbling_window.py:115-120).
    QuerySpec(
      "tick_projection",
      (s, dir) => Windows.tickProjection(events(s, dir)),
      Some("SELECT event_type AS ticker, value AS price, ts AS utc FROM events"))
  )
}
