package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Buffer for [[CandlestickAggregator]]: firstTs = Long.MaxValue sentinel
  * marks the empty buffer.
  */
final case class CandleBuf(
    firstTs: Long, firstPrice: Double,
    lastTs: Long, lastPrice: Double,
    min: Double, max: Double)

final case class CandleResult(
    first_price: Double,
    last_price: Double,
    min_price: Double,
    max_price: Double)

/** Single-pass typed candlestick aggregator (SURVEY.md §7.4): one buffer
  * carries open/close/min/max instead of four separate aggregate
  * expressions. Semantics match Windows.candlestick exactly — event-time
  * first/last with the timestamp as the order key (min_by/max_by
  * equivalent), deterministic under any merge order because merge compares
  * timestamps, not arrival.
  *
  * This is the engine's Aggregator/UDAF surface; the four-built-in form
  * stays the default (it is equally single-pass inside one
  * HashAggregateExec and fully codegen'd — this form exists for callers
  * that want one typed buffer, e.g. mapGroups pipelines).
  */
object CandlestickAggregator {

  /** One input row: (utcMicros, price). */
  val agg: Aggregator[(Long, Double), CandleBuf, CandleResult] =
    new Aggregator[(Long, Double), CandleBuf, CandleResult] {
      override def zero: CandleBuf =
        CandleBuf(Long.MaxValue, 0.0, Long.MinValue, 0.0,
          Double.PositiveInfinity, Double.NegativeInfinity)

      // Ties on the timestamp break by price ((ts, price) lexicographic
      // min for first, max for last) — commutative and associative, so
      // results cannot depend on partition merge order even when two
      // events share a timestamp.
      private def firstWins(ts: Long, p: Double, ts2: Long, p2: Double): Boolean =
        ts < ts2 || (ts == ts2 && p <= p2)
      private def lastWins(ts: Long, p: Double, ts2: Long, p2: Double): Boolean =
        ts > ts2 || (ts == ts2 && p >= p2)

      override def reduce(b: CandleBuf, in: (Long, Double)): CandleBuf = {
        val (ts, p) = in
        val fw = firstWins(ts, p, b.firstTs, b.firstPrice)
        val lw = lastWins(ts, p, b.lastTs, b.lastPrice)
        CandleBuf(
          if (fw) ts else b.firstTs,
          if (fw) p else b.firstPrice,
          if (lw) ts else b.lastTs,
          if (lw) p else b.lastPrice,
          math.min(b.min, p), math.max(b.max, p))
      }

      override def merge(a: CandleBuf, b: CandleBuf): CandleBuf = {
        val fw = firstWins(a.firstTs, a.firstPrice, b.firstTs, b.firstPrice)
        val lw = lastWins(a.lastTs, a.lastPrice, b.lastTs, b.lastPrice)
        CandleBuf(
          if (fw) a.firstTs else b.firstTs,
          if (fw) a.firstPrice else b.firstPrice,
          if (lw) a.lastTs else b.lastTs,
          if (lw) a.lastPrice else b.lastPrice,
          math.min(a.min, b.min), math.max(a.max, b.max))
      }

      override def finish(b: CandleBuf): CandleResult =
        CandleResult(b.firstPrice, b.lastPrice, b.min, b.max)

      override def bufferEncoder: Encoder[CandleBuf] = Encoders.product[CandleBuf]

      override def outputEncoder: Encoder[CandleResult] = Encoders.product[CandleResult]
    }

  /** Column form: `candle(unix_micros(utc), price)` → struct(first_price,
    * last_price, min_price, max_price).
    */
  def candle(tsMicros: Column, price: Column): Column =
    udaf(agg, Encoders.tuple(Encoders.scalaLong, Encoders.scalaDouble))
      .apply(tsMicros, price)
}
