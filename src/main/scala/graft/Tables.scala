package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.LongType

/** Loaders for the driver's read-only parquet tables (TESTDATA.md).
  *
  * All engine queries take `(SparkSession, sfDir)` and load through here so
  * the same code runs at any scale factor. Column pruning + predicate
  * pushdown reach the parquet scan because we return the raw declarative
  * scan and let Catalyst push through whatever the query composes on top.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (name == "events") events(spark, sfDir)
    else spark.read.parquet(s"$sfDir/$name.parquet")

  /** events.ts is parquet TIMESTAMP(NANOS), which Spark only reads as a raw
    * Long (`spark.sql.legacy.parquet.nanosAsLong`); convert to a proper
    * TimestampType by truncating to micros — exactly what DuckDB does when
    * it reads the same file, so oracle parity holds. The conf is set lazily
    * here so the code also works under a driver-owned SparkSession.
    */
  private def withMicrosTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case _ => df
    }

  private def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    withMicrosTs(spark.read.parquet(s"$sfDir/events.parquet"))
  }

  /** Register every table as a temp view (SURVEY.md S11) for spark.sql use. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => load(spark, sfDir, n).createOrReplaceTempView(n))
}
