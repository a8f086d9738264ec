package graft

import org.apache.spark.sql.Row
import graft.operators.Windows

/** Semantic unit tests for the reference-parity window operators
  * (SURVEY.md §5.2): hand-computed candlesticks, window-boundary rows
  * ([start, end) end-exclusive), and the sliding two-level equivalence.
  */
class WindowsSpec extends GraftSpec {
  import spark.implicits._

  private def ticks = Seq(
    // window [00:00, 00:01) for A — out-of-order arrival on purpose
    ("A", 12.0, ts("2024-01-01 00:00:40.000")),
    ("A", 10.0, ts("2024-01-01 00:00:10.000")),
    ("A", 9.5, ts("2024-01-01 00:00:59.999")),
    // boundary: exactly 00:01:00 belongs to the NEXT window
    ("A", 99.0, ts("2024-01-01 00:01:00.000")),
    // second key, same window
    ("B", 5.0, ts("2024-01-01 00:00:30.000"))
  ).toDF("ticker", "price", "utc")

  test("candlestick: event-time first/last, min/max, end-exclusive windows") {
    val rows = Windows.candlestick(ticks, tsCol = "utc", keyCol = "ticker",
        valCol = "price", width = "1 minute")
      .collect().map(r => (r.getString(0), r.getTimestamp(1).toString,
        r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))).toSet

    assert(rows === Set(
      // (ticker, window_start, first, last, min, max)
      ("A", "2024-01-01 00:00:00.0", 10.0, 9.5, 9.5, 12.0),
      ("A", "2024-01-01 00:01:00.0", 99.0, 99.0, 99.0, 99.0),
      ("B", "2024-01-01 00:00:00.0", 5.0, 5.0, 5.0, 5.0)))
  }

  test("candlestick invariants on random ticks: min <= first,last <= max") {
    val rnd = new scala.util.Random(7)
    val df = (1 to 500).map { i =>
      (s"T${i % 3}", rnd.nextDouble() * 100,
        new java.sql.Timestamp(1704067200000L + rnd.nextInt(600000).toLong))
    }.toDF("ticker", "price", "utc")
    Windows.candlestick(df, tsCol = "utc", keyCol = "ticker", valCol = "price")
      .collect().foreach { r =>
        val (first, last, mn, mx) =
          (r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6))
        assert(mn <= first && first <= mx, r.toString)
        assert(mn <= last && last <= mx, r.toString)
      }
  }

  test("sliding min: direct and two-level decomposition agree") {
    val ev = Tables.load(spark, sf, "events")
    val direct = Windows.slidingMin(ev).collect().map(rKey).toSet
    val twoLevel = Windows.slidingMinTwoLevel(ev).collect().map(rKey).toSet
    assert(direct.nonEmpty)
    assert(direct === twoLevel)
  }

  private def rKey(r: Row) = (r.getString(0), r.getDouble(1), r.getTimestamp(2).getTime)

  test("sliding min brute-force cross-check on a fixed tick set") {
    val df = Seq(
      ("A", 10.0, ts("2024-01-01 00:01:00.000")),
      ("A", 3.0, ts("2024-01-01 00:06:30.000")),
      ("A", 7.0, ts("2024-01-01 00:11:00.000"))
    ).toDF("ticker", "price", "utc")
    val got = Windows
      .slidingMin(df, tsCol = "utc", keyCol = "ticker", valCol = "price",
        over = "10 minutes", every = "5 minutes")
      .collect().map(rKey).toSet
    // Each tick t belongs to hopping windows [s, s+10m) with s in
    // {bucket5(t)-5m, bucket5(t)}; min per window:
    def t(s: String) = ts(s).getTime
    assert(got === Set(
      ("A", 10.0, t("2024-01-01 00:05:00.000")), // [-5, 5): only 00:01
      ("A", 3.0, t("2024-01-01 00:10:00.000")), // [0, 10): 10, 3
      ("A", 3.0, t("2024-01-01 00:15:00.000")), // [5, 15): 3, 7
      ("A", 7.0, t("2024-01-01 00:20:00.000")) // [10, 20): 7
    ))
  }

  test("tick projection schema golden (reference README source schema)") {
    val out = Windows.tickProjection(Tables.load(spark, sf, "events"))
    assert(out.schema.fields.map(f => (f.name, f.dataType.typeName)).toSeq === Seq(
      ("ticker", "string"), ("price", "double"), ("utc", "timestamp")))
  }
}
