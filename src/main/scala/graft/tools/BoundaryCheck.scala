package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scratch check: does Spark's session_window merge two events exactly
  * `gap` apart, or split them? (Determines the oracle's boundary operator.)
  */
object BoundaryCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:30:00")) // exactly 30 min later
    ).toDF("user_id", "ts")
    val n = df.groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .count().count()
    println(s"[boundary] sessions for exact-gap pair: $n (1 = merge, 2 = split)")
    spark.stop()
  }
}
