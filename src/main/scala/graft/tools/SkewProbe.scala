package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, rand, sum, when}
import graft.operators.Joins

/** Pit AQE's OptimizeSkewedJoin against the manual skew-aware salted
  * join on the same skewed fixture — the measured lesson behind
  * q36_join_skew_aqe (r13 verdict #6): which mitigation wins at which
  * skew, with the unmitigated sort-merge join as the control.
  *
  * The fixture is SYNTHETIC (seeded, data-independent — the calibration
  * probe discipline): `n` probe rows over 10^6 join keys with 1/m of all
  * rows collapsed onto ONE hot key (m = 0 means no skew, the mitigation-
  * overhead baseline), an incompressible double payload, and a
  * 10^6-row build side. The harness parquet cannot drive this probe:
  * its single row group is ONE map output, and AQE splits skewed
  * partitions at map-output-block granularity — sub-second joins with
  * nothing to split measure noise. Broadcast is disabled throughout so
  * the skew reaches a sort-merge join (the 100 TB fact-fact case).
  *
  * Usage: runMain graft.tools.SkewProbe [nProbeRows] [reps]
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 10000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val keys = 1000000L
    val build = spark.range(keys)
      .select(col("id").as("k"), (col("id") % 5).cast("string").as("g"))
      .localCheckpoint()

    def probe(m: Int): DataFrame = {
      val base = spark.range(n).repartition(32)
      val k =
        if (m == 0) col("id") % keys
        else when(col("id") % m === 0, 0L).otherwise(col("id") % keys)
      base.select(k.as("k"), rand(7).as("v"))
    }
    def agg(p: DataFrame): DataFrame =
      p.join(build, Seq("k"))
        .groupBy(col("g"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt"))
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    def timeIt(f: => DataFrame): Double =
      (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(f)
        (System.nanoTime() - t0) / 1e9
      }.min
    val noSkewConfs = Seq(
      "spark.sql.adaptive.skewJoin.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val skewConfs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"
        -> "8388608",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8388608",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val out = Seq(0, 10, 3, 2).map { m =>
      val p = probe(m)
      val plain = Joins.withConfs(spark, noSkewConfs: _*) { timeIt(agg(p)) }
      val aqe = Joins.withConfs(spark, skewConfs: _*) { timeIt(agg(p)) }
      val manual = Joins.withConfs(spark, noSkewConfs: _*) {
        timeIt(
          Joins.saltedJoinSkewAware(p, "k", "v", build, "k",
            saltFactor = 32, hotThreshold = n / 32)
            .groupBy(col("g"))
            .agg(sum(col("v")).as("sv"), count(lit(1)).as("cnt")))
      }
      s""""m$m":{"plain_s":$plain,"aqe_s":$aqe,"manual_salted_s":$manual}"""
    }
    println(out.mkString("{", ",", s""","n":$n,"reps":$reps}"""))
    spark.stop()
  }
}
