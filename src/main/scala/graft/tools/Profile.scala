package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators._

/** Scratch profiling main: stage-by-stage wall times for the operators
  * being tuned. Not part of the driver contract.
  */
object Profile {
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
      println(f"[profile] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = Tables.load(spark, sfDir, "documents")
    time("warm docs")(docs.count())
    time("warm shuffle")(spark.range(100000).selectExpr("id % 9 k").groupBy("k").count().collect())
    time("signatures 1st")(Dedup.minhashSignatures(docs).count())
    time("signatures 2nd")(Dedup.minhashSignatures(docs).count())
    time("buckets")(Dedup.minhashBuckets(docs).count())
    time("pairs")(Dedup.minhashCandidatePairs(docs).count())
    time("pairs 2nd")(Dedup.minhashCandidatePairs(docs).count())
    time("jaccard")(Dedup.ngramJaccardPairs(docs).count())
    time("jaccard 2nd")(Dedup.ngramJaccardPairs(docs).count())
    spark.stop()
  }
}
