package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Time-series operators over the events stream (batch forms; the
  * streaming layer reuses the same transforms with watermarks).
  */
object TimeSeries {

  /** Integer floor-division band id: exact at any magnitude (no FP
    * round-trip), floor (not truncate) semantics for pre-epoch instants —
    * `pmod` is non-negative, so subtracting it lands on the band's own
    * multiple before the exact integral `div`.
    */
  private def bandOf(ts: org.apache.spark.sql.Column, bandUs: Long)
      : org.apache.spark.sql.Column = {
    val us = unix_micros(ts)
    call_function("div", us - pmod(us, lit(bandUs)), lit(bandUs))
  }

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

  /** Seasonal-naive forecast backtest — the baseline every real forecast
    * must beat (forecast for day d = observed total at d − `seasonDays`),
    * scored as MAE over the days where both sides exist. This is the
    * capacity-planning sanity metric a feed pipeline keeps per stream:
    * if a model can't beat same-day-last-week, it ships nothing.
    *
    * Exactness: daily totals are exact scaled longs (⌊10⁴·v+½⌋ summed),
    * absolute errors exact long differences; only the final MAE is ONE
    * IEEE division of two exact integers — bit-stable cross-engine.
    * Shape: one bucket agg (map-side combinable) to |keys|·|days| rows,
    * then a self-equi-join on (key, day − season) at that bounded size,
    * then a per-key re-aggregation. The corpus is scanned once.
    */
  def seasonalNaiveBacktest(events: DataFrame, seasonDays: Int = 7): DataFrame = {
    val dayUs = 86400000000L
    val daily = events
      .select(col("event_type"),
        expr(s"unix_micros(ts) div ${dayUs}L").as("day"),
        floor(col("value") * 10000 + 0.5).cast("long").as("qv"))
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("qv")).as("sq"))
      .localCheckpoint(false)
    val prior = daily.select(col("event_type"),
      (col("day") + seasonDays).as("day"), col("sq").as("fq"))
    daily.join(prior, Seq("event_type", "day"))
      .select(col("event_type"), abs(col("sq") - col("fq")).as("err"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"), sum(col("err")).as("sum_abs_err"))
      .withColumn("mae",
        col("sum_abs_err").cast("double") / lit(10000.0) / col("n_days").cast("double"))
  }

  /** Gap-fill with linear interpolation — the regularization step that
    * turns an irregular event stream into the fixed-grid series a
    * downstream model or chart consumes (the `time_bucket_gapfill` /
    * `interpolate` shape of the time-series engines). Per key: bucket to a
    * fixed grid (exact integer epoch-micros division), generate the full
    * grid between the key's first and last observed bucket (`sequence` +
    * explode — scan-side, rows ≈ span/width per key), left-join the
    * observations back (keyed equi-join), and fill each empty bucket by
    * linear interpolation between its neighboring observed buckets via
    * IGNORE NULLS window frames. Empty buckets always have both neighbors
    * (the grid is bounded by observations). Float math is a fixed
    * expression tree over deterministically-derived doubles — exact
    * cross-engine.
    *
    * Scale: one shuffle for the bucket agg, one for the per-key window.
    * The window partitions by event_type (low cardinality) — at corpus
    * scale the banded two-pass decomposition (q15/q32 precedent) applies:
    * band the grid, run the IGNORE NULLS frames per (key, band), then
    * patch band edges with the per-band first/last observation table
    * (broadcast-small). Kept single-window here: the grid is
    * span/width · |keys| rows — BOUNDED BY TIME, not by corpus size, so
    * unlike row-keyed windows it grows with the calendar, not the data.
    */
  def gapfillInterpolate(events: DataFrame, widthMinutes: Int = 15): DataFrame = {
    val busWidth = widthMinutes * 60L * 1000000L
    val obs = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) div ${busWidth}L) * ${busWidth}L").as("bus"),
        col("value"))
      .groupBy(col("event_type"), col("bus"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 10000 + 0.5).cast("long")).as("sq"))
      .withColumn("av",
        col("sq").cast("double") / lit(10000.0) / col("n").cast("double"))
      // |observed buckets| rows — eagerly checkpointed so the bounds agg
      // and the grid join replay it instead of re-scanning the corpus
      // (quality-gate precedent; ONE event scan total)
      .localCheckpoint()
    val grid = obs
      .groupBy(col("event_type"))
      .agg(min(col("bus")).as("b0"), max(col("bus")).as("b1"))
      .select(col("event_type"),
        explode(sequence(col("b0"), col("b1"), lit(busWidth))).as("bus"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
    val wPrev = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = w.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    grid
      .join(obs.select(col("event_type"), col("bus"), col("n"), col("av")),
        Seq("event_type", "bus"), "left")
      .withColumn("pv", last(col("av"), ignoreNulls = true).over(wPrev))
      .withColumn("pb", last(when(col("av").isNotNull, col("bus")),
        ignoreNulls = true).over(wPrev))
      .withColumn("nv", first(col("av"), ignoreNulls = true).over(wNext))
      .withColumn("nb", first(when(col("av").isNotNull, col("bus")),
        ignoreNulls = true).over(wNext))
      .select(
        col("event_type"),
        timestamp_micros(col("bus")).as("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        when(col("av").isNotNull, col("av"))
          .otherwise(col("pv") + (col("nv") - col("pv")) *
            ((col("bus") - col("pb")).cast("double") /
              (col("nb") - col("pb")).cast("double"))).as("value_filled"),
        col("av").isNull.as("interpolated"))
  }

  /** Forward-fill gap-fill — the CAUSAL half of [[gapfillInterpolate]]:
    * empty grid buckets carry the last observed bucket average instead of
    * interpolating toward the (future) next observation. This is the only
    * fill a STREAM can compute at ingest (interpolation needs the next
    * value, which hasn't arrived when the gap closes), so this operator
    * is the batch twin the streaming grid-fill is pinned against —
    * identical grid, identical bucket averages, one window pass instead
    * of two.
    */
  def gapfillForwardFill(events: DataFrame, widthMinutes: Int = 15): DataFrame = {
    val busWidth = widthMinutes * 60L * 1000000L
    val obs = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) div ${busWidth}L) * ${busWidth}L").as("bus"),
        col("value"))
      .groupBy(col("event_type"), col("bus"))
      .agg(count(lit(1)).as("n"),
        sum(floor(col("value") * 10000 + 0.5).cast("long")).as("sq"))
      .withColumn("av",
        col("sq").cast("double") / lit(10000.0) / col("n").cast("double"))
      .localCheckpoint()
    val grid = obs
      .groupBy(col("event_type"))
      .agg(min(col("bus")).as("b0"), max(col("bus")).as("b1"))
      .select(col("event_type"),
        explode(sequence(col("b0"), col("b1"), lit(busWidth))).as("bus"))
    val wPrev = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid
      .join(obs.select(col("event_type"), col("bus"), col("n"), col("av")),
        Seq("event_type", "bus"), "left")
      .withColumn("pv", last(col("av"), ignoreNulls = true).over(wPrev))
      .select(
        col("event_type"),
        timestamp_micros(col("bus")).as("bucket"),
        coalesce(col("n"), lit(0L)).as("n_events"),
        col("pv").as("value_filled"),
        col("av").isNull.as("filled"))
  }

  /** Time-series subsequence similarity search (the EDBT 2019 "Time
    * Series Similarity Search for Streaming Data in Distributed Systems"
    * problem shape, batch form): resample each event type onto the fixed
    * bucket grid, slide a length-L window over every type's bucket-total
    * series, and return the k windows most similar to the QUERY window —
    * the latest complete window of `queryType` (which therefore ranks
    * itself first at distance 0, a built-in sanity anchor).
    *
    * Distances are EXACT: bucket totals are sums of floor-scaled longs
    * (1e2 — sized so an L-term sum of squared diffs stays far from Long
    * overflow at realistic volumes) and dist² = Σ(a_i−b_i)² is pure
    * integer arithmetic, so ordering is bit-identical cross-engine; ties
    * break on (event_type, bus). Shape: one resample aggregation, ONE
    * window pass gathering L-length arrays (frame-ordered collect_list —
    * rows carry L longs each, no row expansion), query broadcast as a
    * single row, `TakeOrderedAndProject` top-k. Subsequence count is
    * |grid|, calendar-sized like the gap-fill grid, NOT corpus-sized.
    */
  def subseqTopK(
      events: DataFrame, widthMinutes: Int = 15, length: Int = 8,
      k: Int = 10, queryType: String = "click"): DataFrame = {
    val busWidth = widthMinutes * 60L * 1000000L
    val tot = events
      .select(col("event_type"),
        expr(s"(unix_micros(ts) div ${busWidth}L) * ${busWidth}L").as("bus"),
        floor(col("value") * 100 + 0.5).cast("long").as("sv"))
      .groupBy(col("event_type"), col("bus"))
      .agg(sum(col("sv")).as("total"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bus"))
      .rowsBetween(Window.currentRow, length - 1)
    val wins = tot
      .withColumn("win", collect_list(col("total")).over(w))
      .filter(size(col("win")) === length)
      .select(col("event_type"), col("bus"), col("win"))
    val q = wins.filter(col("event_type") === queryType)
      .orderBy(desc("bus")).limit(1)
      .select(col("win").as("qwin"))
    wins.crossJoin(broadcast(q))
      .withColumn("dist2", expr(
        "aggregate(zip_with(win, qwin, (a, b) -> (a - b) * (a - b)), 0L, (acc, x) -> acc + x)"))
      .orderBy(asc("dist2"), asc("event_type"), asc("bus"))
      .limit(k)
      .select(col("event_type"),
        timestamp_micros(col("bus")).as("win_start"), col("dist2"))
  }

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

  /** Trailing time-RANGE window totals: per user, event count and exact
    * scaled-long value sum over [ts − window, ts] — the "activity in the
    * last hour, as of every event" readout. A RANGE frame on microseconds
    * (not ROWS): all events inside the interval count, however many there
    * are. Partitioned by high-cardinality user_id, so parallelism scales;
    * the sum is a windowed long sum (exact, order-independent).
    */
  def rangeFrameTotals(events: DataFrame, windowUs: Long = 3600000000L): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
      .rangeBetween(-windowUs, 0)
    events
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("value"))
      .withColumn("n_1h", count(lit(1)).over(w))
      .withColumn("sum_1h", sum(floor(col("value") * 10000 + 0.5).cast("long")).over(w))
      .select(col("event_id"), col("user_id"), col("n_1h"), col("sum_1h"))
  }

  /** Lag over a LOW-cardinality key without funnelling the raw table
    * through |keys| reducers: the banded decomposition. A plain
    * `lag() OVER (PARTITION BY event_type ORDER BY ts)` with ~5 distinct
    * keys sorts the whole table through 5 reducers — a single-machine sort
    * at 100 TB. Here the window key is (event_type, time band), so
    * parallelism scales with |keys| × |bands|:
    *
    *   1. in-band lag: standard window per (key, band) — partitions are
    *      time-bounded slices, embarrassingly parallel.
    *   2. boundary carry: per (key, band) the band's LAST value (one
    *      map-side-combinable aggregate), then `lag` over the per-key band
    *      sequence. Empty bands never appear in the aggregate, so the
    *      previous row is exactly the latest earlier non-empty band.
    *   3. each band's first row takes the carry; all others keep their
    *      in-band lag. The carry table is |keys| × |bands| rows — broadcast.
    *
    * Output and semantics are identical to the single-window form: global
    * (ts, event_id) order equals (band, ts, event_id) order because the
    * band is a monotone function of ts.
    */
  def bandedLag(events: DataFrame, bandSeconds: Long = 86400L): DataFrame = {
    val bandUs = bandSeconds * 1000000L
    val banded = events.withColumn("band", bandOf(col("ts"), bandUs))
    val wBand = Window.partitionBy(col("event_type"), col("band"))
      .orderBy(asc("ts"), asc("event_id"))
    val bounds = banded
      .groupBy(col("event_type"), col("band"))
      .agg(max_by(col("value"), struct(col("ts"), col("event_id"))).as("band_last"))
    // previous non-empty band's last value; this window IS keyed by the
    // bare low-cardinality key, but consumes only the tiny band aggregate
    val wBands = Window.partitionBy(col("event_type")).orderBy(asc("band"))
    val carry = bounds
      .withColumn("carry", lag(col("band_last"), 1).over(wBands))
      .select(col("event_type"), col("band"), col("carry"))
    banded
      .withColumn("prev_in_band", lag(col("value"), 1).over(wBand))
      .join(broadcast(carry), Seq("event_type", "band"), "left")
      .withColumn("prev_value", coalesce(col("prev_in_band"), col("carry")))
      .withColumn("delta",
        floor((col("value") - col("prev_value")) * 10000 + 0.5) / 10000)
      .select(col("event_id"), col("event_type"), col("value"),
        col("prev_value"), col("delta"))
  }

  /** Final exponentially-weighted moving average per user:
    * ewma = α·x + (1−α)·ewma, folded over the (ts, event_id)-ordered
    * series. EWMA is inherently sequential, but each step is the affine
    * map acc → α·x + β·acc (β = 1−α), and affine maps compose
    * associatively — so the fold decomposes over time bands with BOUNDED
    * state, instead of buffering a whole key's series (one hot key with
    * 10⁹ events would OOM an executor under a per-key collect_list):
    *
    *   1. per (user, band): the band's ordered values fold into its
    *      composite affine map (a, b) = (β^m, Σ α·x_i·β^(m−i)) — three
    *      scan-side array folds over ONE band's rows. The band holding
    *      the user's first event also folds its own EWMA `e` (init =
    *      first value), because the global init is not an affine step.
    *   2. per user: the per-band (a, b, e) rows — at most
    *      time_range / bandSeconds of them, INDEPENDENT of the per-key
    *      event count — compose in band order: e ← a·e + b.
    *
    * State per aggregation group is one (user, band) slice in stage 1 and
    * the tiny band summary list in stage 2; size `bandSeconds` so the
    * densest key×band slice fits an executor. The oracle runs the exact
    * same two-level fold (same IEEE ops in the same order), so results
    * are bit-identical; the banded value differs from a flat sequential
    * fold only by float re-association (≲1e-12 relative — CrossCheckSpec
    * pins it against the brute-force fold).
    */
  def ewma(events: DataFrame, alpha: Double = 0.2,
      bandSeconds: Long = 86400L): DataFrame = {
    val beta = 1 - alpha
    val bandUs = bandSeconds * 1000000L
    val perBand = events
      .withColumn("band", bandOf(col("ts"), bandUs))
      .groupBy(col("user_id"), col("band"))
      .agg(sort_array(collect_list(
        struct(col("ts"), col("event_id"), col("value")))).as("s"))
      .select(col("user_id"), col("band"), size(col("s")).as("m"),
        expr(s"aggregate(slice(s, 2, greatest(size(s) - 1, 0)), s[0].value, " +
          s"(acc, x) -> $alpha * x.value + $beta * acc)").as("e"),
        expr(s"aggregate(s, cast(1.0 as double), (a, x) -> a * $beta)").as("a"),
        expr(s"aggregate(s, cast(0.0 as double), " +
          s"(b, x) -> $beta * b + $alpha * x.value)").as("b"))
    perBand
      .groupBy(col("user_id"))
      .agg(sum(col("m")).as("n_events"),
        sort_array(collect_list(
          struct(col("band"), col("e"), col("a"), col("b")))).as("bands"))
      .select(col("user_id"), col("n_events"),
        expr("aggregate(slice(bands, 2, greatest(size(bands) - 1, 0)), " +
          "bands[0].e, (acc, t) -> t.a * acc + t.b)").as("ewma"))
  }

  /** Per-key z-score anomalies: events whose value sits more than z
    * standard deviations from the key's mean. Moments accumulate as EXACT
    * scaled-long sums (count, Σq, Σq² with q = round(value·100)) — a raw
    * double variance is accumulation-order-dependent and would diverge
    * across engines/partitionings; here the only float math is a fixed
    * sequence of divisions at the end, bit-identical everywhere. The
    * per-key stats table is |keys| rows — broadcast back onto the stream.
    * (Σq² bounds the exact range: ~1e12 per row at value≈1e2, safe to
    * ~9e6 rows per key per partial sum; beyond that widen q's scale or
    * use DECIMAL accumulators.)
    */
  def anomalies(events: DataFrame, z: Double = 3.0): DataFrame = {
    val q = floor(col("value") * 100 + 0.5).cast("long")
    val stats = events
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(q).as("s"), sum(q * q).as("ss"))
      .select(col("event_type"),
        (col("s").cast("double") / col("n").cast("double") / lit(100.0)).as("mean"),
        ((col("ss").cast("double") / col("n").cast("double") -
          (col("s").cast("double") / col("n").cast("double")) *
            (col("s").cast("double") / col("n").cast("double"))) / lit(10000.0))
          .as("variance"))
    events.join(broadcast(stats), "event_type")
      .filter(abs(col("value") - col("mean")) > lit(z) * sqrt(col("variance")))
      .select(col("event_id"), col("event_type"), col("value"), col("mean"))
  }

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

  /** Weekly retention cohorts: users grouped by the week of their first
    * event; a user is retained if any event lands in the cohort week + 7
    * days. Two aggregations keyed by high-cardinality user_id, one
    * user-keyed join, then a per-cohort rollup whose input is already ONE
    * row per user (and map-side combinable), so the low-cardinality
    * cohort key never sees raw events. The ratio is one IEEE division of
    * exact counts.
    */
  def retentionCohorts(events: DataFrame): DataFrame = {
    val first = events.groupBy(col("user_id"))
      .agg(date_trunc("week", min(col("ts"))).as("cohort_week"))
    val weeks = events
      .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
      .distinct()
    val retained = first.join(weeks, Seq("user_id"))
      .filter(col("w") === col("cohort_week") + expr("INTERVAL 7 DAYS"))
      .groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_retained"))
    first.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("n_users"))
      .join(retained, Seq("cohort_week"), "left")
      .select(col("cohort_week"),
        col("n_users"),
        coalesce(col("n_retained"), lit(0L)).as("n_retained"))
      .withColumn("retention",
        col("n_retained").cast("double") / col("n_users").cast("double"))
  }

  /** Trailing 7-day distinct active users per day (the rolling-DAU/WAU
    * readout). Exact rolling distinct is not a window aggregate — COUNT
    * (DISTINCT) over a moving frame re-counts each user once per day it
    * covers — so it decomposes as: distinct (day, user) pairs → each pair
    * CONTRIBUTES to 7 target days (scan-side explode, constant fan-out) →
    * distinct (target, user) → per-day count. Every exchange keys on the
    * high-cardinality (day, user); only the final count (input = one row
    * per user per day, map-side combinable) touches the low-cardinality
    * day key. Days with no events report nothing; trailing windows only
    * cover days that exist in the data (semi-join with the day set).
    */
  def rollingDistinctUsers(events: DataFrame, windowDays: Int = 7): DataFrame = {
    val dayUsers = events
      .select(to_date(col("ts")).as("d"), col("user_id"))
      .distinct()
    val days = dayUsers.select(col("d")).distinct()
    dayUsers
      .select(col("user_id"), explode(expr(
        s"transform(sequence(0, ${windowDays - 1}), i -> date_add(d, i))")).as("day"))
      .distinct()
      .join(days.withColumnRenamed("d", "day"), Seq("day"), "left_semi")
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_users_7d"))
  }

  /** Per-user funnel stages under a CONVERSION WINDOW (attribution-window
    * semantics, the form a production funnel actually uses): the funnel
    * anchors at the user's first `view` (t1) and later stages only count
    * within (t1, t1 + horizon] — first `click` strictly after t1, first
    * `purchase` strictly after that click, both inside the window. Emits
    * one row per user who viewed, with nullable t2/t3. The window is what
    * makes a STREAMING twin well-defined (a user's funnel is final once
    * the watermark passes t1 + horizon — see
    * `streaming.StreamingQueries.funnelStream`); this batch form is the
    * backfill, same staged-aggregation shape as [[funnelSteps]].
    */
  def funnelUserStages(events: DataFrame, horizonSeconds: Long = 86400L): DataFrame = {
    val iv = expr(s"INTERVAL $horizonSeconds SECONDS")
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isin("view", "click", "purchase"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1") && col("ts") <= col("t1") + iv)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t12 = t1.join(t2, Seq("user_id"), "left")
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t12.filter(col("t2").isNotNull), "user_id")
      .filter(col("ts") > col("t2") && col("ts") <= col("t1") + iv)
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t12.join(t3, Seq("user_id"), "left")
      .select(col("user_id"), col("t1"), col("t2"), col("t3"))
  }

  /** Ordered conversion funnel: per user, the first `view`, the first
    * `click` STRICTLY after it, the first `purchase` strictly after that;
    * the single-row readout counts users reaching each stage. Stage k+1
    * depends on stage k's timestamp, so the funnel is staged conditional
    * aggregations + user-keyed joins — every exchange keys on
    * high-cardinality user_id, per-stage state is ONE timestamp per user
    * (never a buffered event list — the same bounded-state stance as the
    * banded EWMA), and the type filter pushes to the scan so only the
    * three funnel event types are ever read.
    */
  def funnelSteps(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("event_type"), col("ts"))
      .filter(col("event_type").isin("view", "click", "purchase"))
    val t1 = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("t1"))
    val t2 = ev.filter(col("event_type") === "click")
      .join(t1, "user_id")
      .filter(col("ts") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t2"))
    val t3 = ev.filter(col("event_type") === "purchase")
      .join(t2, "user_id")
      .filter(col("ts") > col("t2"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("t3"))
    t1.join(t2, Seq("user_id"), "left").join(t3, Seq("user_id"), "left")
      .agg(
        count(col("t1")).as("n_view"),
        count(col("t2")).as("n_click_after_view"),
        count(col("t3")).as("n_purchase_after_click"))
  }

  /** Robust anomaly detection via median/MAD — the outlier rule that
    * survives what breaks [[anomalies]]' mean/σ z-score: a single extreme
    * value inflates both the mean and the variance until it masks itself
    * (and every smaller outlier), while the median and the median absolute
    * deviation have a 50% breakdown point. Flags rows with
    * |value − median| > z · 1.4826 · MAD (1.4826 ≈ 1/Φ⁻¹(¾) makes MAD a
    * consistent σ estimate under normality).
    *
    * Exactness: the median and the MAD are DISCRETE percentiles — actual
    * stored doubles picked by rank ([[Percentiles.percentileDisc]]), not
    * interpolations — so both engines compare against bit-identical
    * thresholds; |value − med| is a single IEEE subtraction.
    *
    * Scale: two histogram aggregations (map-side combinable, output
    * bounded by |distinct (key, value)|) + two broadcast joins — the raw
    * table is never windowed or sorted, unlike the textbook
    * `PERCENTILE_CONT OVER (PARTITION BY key)` form that funnels 100 TB
    * through |keys| reducers.
    */
  def anomaliesMad(events: DataFrame, z: Double = 3.0): DataFrame = {
    val med = Percentiles
      .percentileDisc(events.select(col("event_type"), col("value")),
        "event_type", "value", Seq(0.5))
      .select(col("event_type"), col("pct_value").as("med"))
    val withDev = events.join(broadcast(med), "event_type")
      .withColumn("adev", abs(col("value") - col("med")))
    val mad = Percentiles
      .percentileDisc(withDev.select(col("event_type"), col("adev")),
        "event_type", "adev", Seq(0.5))
      .select(col("event_type"), col("pct_value").as("mad"))
    withDev.join(broadcast(mad), "event_type")
      .filter(col("adev") > lit(z) * lit(1.4826) * col("mad"))
      .select(col("event_id"), col("event_type"), col("value"),
        col("med"), col("mad"))
  }

  /** CUSUM drift scan — the classic change-point screen (Page 1954): per
    * key, the running sum of deviations from the key's global mean peaks
    * exactly where the level shifts, and the top-|drift| rows are the
    * change-point candidates. Emits the k largest |drift| rows per key.
    *
    * Exactness: values floor-scale to longs (q = ⌊100·v+½⌋) and the drift
    * is kept in the mean-free integer form
    * `drift_i = n·Σ_{j≤i} q_j − i·Σq` (both sides multiplied by n·100, so
    * no division ever happens) — exact BIGINT at any accumulation order.
    * Magnitudes stay < n²·max|q|: fine in 64-bit up to ~10⁹ rows/key at
    * this value scale; beyond that the same expressions run in
    * DECIMAL(38,0) unchanged.
    *
    * Scale: the running sum is banded like [[bandedLag]] — in-band prefix
    * sums over (key, day) partitions plus a broadcast per-band carry
    * table — so the raw table never sorts through |keys| reducers; the
    * final top-k window is WindowGroupLimit-pruned to k rows per
    * partition before its exchange.
    */
  def cusumTopDrift(events: DataFrame, k: Int = 20): DataFrame = {
    val base = events.select(col("event_type"), col("event_id"), col("ts"),
      floor(col("value") * 100 + 0.5).cast("long").as("qv"),
      bandOf(col("ts"), 86400000000L).as("band"))
    val tot = base.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("qv")).as("s"))
    val wBand = Window.partitionBy(col("event_type"), col("band"))
      .orderBy(asc("ts"), asc("event_id"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wBands = Window.partitionBy(col("event_type")).orderBy(asc("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = base.groupBy(col("event_type"), col("band"))
      .agg(sum(col("qv")).as("bq"), count(lit(1)).as("bc"))
      .withColumn("pq", coalesce(sum(col("bq")).over(wBands), lit(0L)))
      .withColumn("pc", coalesce(sum(col("bc")).over(wBands), lit(0L)))
      .select(col("event_type"), col("band"), col("pq"), col("pc"))
    val wTop = Window.partitionBy(col("event_type"))
      .orderBy(desc("adrift"), asc("event_id"))
    base
      .withColumn("rq", sum(col("qv")).over(wBand))
      .withColumn("rc", count(lit(1)).over(wBand))
      .join(broadcast(carry), Seq("event_type", "band"))
      .join(broadcast(tot), Seq("event_type"))
      .withColumn("drift",
        col("n") * (col("pq") + col("rq")) - (col("pc") + col("rc")) * col("s"))
      .withColumn("adrift", abs(col("drift")))
      .withColumn("rn", row_number().over(wTop).cast("long"))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("event_id"), col("drift"), col("rn"))
  }

  /** Peak concurrency: the maximum number of simultaneously-open user
    * sessions, reported per day. Sessions are the same gap-split islands
    * as [[sessionize]]; a session is open on `[start, end]` INCLUSIVE,
    * so concurrency can only peak at a session-start instant and the
    * candidate at each distinct timestamp is
    * `running-before + starts-at-ts` — a GROUP-level formula with no
    * intra-timestamp ordering, which is what makes the sweep
    * deterministic on any engine (a row-level running max over tied
    * timestamps would be order-dependent).
    *
    * Scale — the classic global-prefix-sum problem, solved two-level
    * like the banded CUSUM above: the running sum within each day
    * partition is a day-partitioned window (parallel across days), and
    * only the per-day NET totals — a days-sized, metadata-scale table —
    * pass through the single-partition carry window before broadcasting
    * back. No corpus-sized frame is ever sorted on one partition.
    */
  def maxConcurrentSessions(
      events: DataFrame, maxGapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(asc("ts"), asc("event_id"))
    val sessions = events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") >
            maxGapMinutes * 60L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(min(col("ts")).as("s_start"), max(col("ts")).as("s_end"))
    val deltas = sessions
      .select(col("s_start").as("ts"), lit(1L).as("st"), lit(0L).as("en"))
      .unionByName(sessions
        .select(col("s_end").as("ts"), lit(0L).as("st"), lit(1L).as("en")))
    val points = deltas
      .groupBy(to_date(col("ts")).as("day"), col("ts"))
      .agg(sum(col("st")).as("ns"), sum(col("en")).as("ne"))
    val wDay = Window.partitionBy(col("day"))
      .orderBy(asc("ts")).rowsBetween(Window.unboundedPreceding, 0)
    val wCarry = Window.orderBy(asc("day"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = points.groupBy(col("day"))
      .agg(sum(col("ns") - col("ne")).as("net"))
      .withColumn("offset", coalesce(sum(col("net")).over(wCarry), lit(0L)))
      .select(col("day"), col("offset"))
    points
      .withColumn("run", sum(col("ns") - col("ne")).over(wDay))
      .join(broadcast(carry), Seq("day"))
      // candidate at ts = value after opening this instant's sessions but
      // before closing any: prefix-before + ns
      .withColumn("cand",
        col("offset") + col("run") - (col("ns") - col("ne")) + col("ns"))
      .groupBy(col("day"))
      .agg(max(col("cand")).as("max_concurrent"))
  }
}
