package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables

/** Measured experiment: exact 13-gram decontamination, broadcast-join
  * form vs bloom-fronted form, interleaved reps at the given SF. Records
  * the survivor-row count of the bloom pre-filter so the admission rate
  * (true matches + false positives vs corpus windows) is visible next to
  * the wall time. Not part of the driver contract.
  *
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.BloomProbe
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
      println(f"[bloom] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = Tables.load(spark, sfDir, "documents")
    time("warm docs")(docs.count())
    import graft.operators.Dedup
    for (i <- 1 to 3) {
      time(s"split (broadcast join) #$i")(run(Dedup.decontaminateNgramSplit(docs)))
      time(s"bloom-fronted         #$i")(run(Dedup.decontaminateNgramBloom(docs)))
    }
    // admission rate of the bloom front ALONE: survivors of the scan-side
    // bloom probe BEFORE the verify join (true matches + false positives),
    // next to the train-window total and the post-join result rows
    import org.apache.spark.sql.functions.col
    val wh = Dedup.windowHashes(docs, w = 13, stride = 1)
      .select(col("doc_id"), col("whash")).distinct()
      .localCheckpoint()
    val coin = graft.operators.TextAnalysis.sampleCoin()
    val bloom = wh.filter(coin < 10)
      .agg(graft.functions.GraftFunctions.bloom_agg(
        col("whash"), 100000L, 800000L).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    val train = wh.filter(coin >= 10)
    val total = train.count()
    val admitted = train
      .filter(graft.functions.GraftFunctions.bloom_might_contain(bloom, col("whash")))
      .count()
    println(s"[bloom] train windows: $total, bloom-admitted: $admitted " +
      f"(${100.0 * admitted / total}%.3f%%)")
    println(s"[bloom] post-verify-join result rows: ${Dedup.decontaminateNgramBloom(docs).count()}")
    spark.stop()
  }
}
