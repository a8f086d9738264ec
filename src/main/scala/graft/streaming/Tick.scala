package graft.streaming

import org.apache.spark.sql.types._

/** The reference's tick data model.
  *
  * The producer (reference `datagen/stock.py:17-33`) emits 8 JSON fields;
  * the table DDL (reference `flink/tumbling_window.py:115-120`) declares
  * only 3 — schema-on-read drops the rest (SURVEY.md §1.1). Both shapes
  * live here so sources and tests can exercise that projection.
  */
final case class Tick(ticker: String, price: Double, utc: java.sql.Timestamp)

object Tick {

  /** The declared (queryable) schema — reference DDL order. */
  val schema: StructType = StructType(Seq(
    StructField("ticker", StringType),
    StructField("price", DoubleType),
    StructField("utc", TimestampType)))

  /** The full wire shape the producer emits (reference `datagen/stock.py:
    * 24-33`); 5 of 8 fields are dropped by schema-on-read.
    */
  val producerSchema: StructType = StructType(Seq(
    StructField("utc", TimestampType),
    StructField("type", StringType),
    StructField("source", StringType),
    StructField("ticker", StringType),
    StructField("name", StringType),
    StructField("sector", StringType),
    StructField("industry", StringType),
    StructField("price", DoubleType)))

  /** The four demo tickers (reference `datagen/stock.py:28`). */
  val tickers: Seq[String] = Seq("AAPL", "AMZN", "MSFT", "TSLA")

  /** Wire timestamp formats (reference `flink/tumbling_window.py:104-113`):
    * the `json.timestamp_format_standard` option selects SQL or ISO-8601.
    */
  val TsFormatSql = "yyyy-MM-dd HH:mm:ss.SSS"
  val TsFormatIso = "yyyy-MM-dd'T'HH:mm:ss.SSS"

  def timestampFormat(standard: String): String = standard match {
    case "ISO-8601" => TsFormatIso
    case _ => TsFormatSql // reference default (tumbling_window.py:130)
  }
}
