package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch profiling main: stage-by-stage wall times for the operators
  * being tuned. Not part of the driver contract.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val ev = Tables.load(spark, sfDir, "events")
    time("warm events")(ev.count())
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // dissect sketch_distinct_users: which term carries the fixed cost?
    for (i <- 1 to 2) {
      time(s"approx rsd=0.01 #$i")(run(ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.01))))
      time(s"approx rsd=0.05 #$i")(run(ev.groupBy(col("event_type"))
        .agg(approx_count_distinct(col("user_id"), rsd = 0.05))))
      time(s"exact distinct #$i")(run(ev.groupBy(col("event_type"))
        .agg(count_distinct(col("user_id")))))
      time(s"combined rsd=0.01 #$i")(run(graft.operators.Sketches.distinctUsers(ev)))
    }
    spark.stop()
  }
}
