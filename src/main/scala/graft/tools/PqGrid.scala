package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{avg, sum}
import graft.Tables
import graft.operators.Similarity

/** Scratch diagnostic main: the PQ quality knobs measured — total
  * reconstruction error and ADC recall@10 (vs exact L2) across training
  * iterations, plus the error curve over codebook sizes. The numbers
  * behind the registered trained/untrained operating points. Not part of
  * the driver contract.
  *
  * SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 runMain graft.tools.PqGrid
  */
object PqGrid {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = Tables.load(spark, sfDir, "embeddings")
    def errOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("err")).head().getLong(0)
    def recallOf(df: org.apache.spark.sql.DataFrame): Double =
      df.agg(avg("recall")).head().getDouble(0)
    println(f"[pq] untrained err=${errOf(Similarity.pqCodes(emb))} " +
      f"recall@10=${recallOf(Similarity.annRecallPq(emb))}%.4f")
    for (it <- Seq(1, 2, 3))
      println(f"[pq] iters=$it err=${errOf(Similarity.pqCodesTrained(emb, iters = it))} " +
        f"recall@10=${recallOf(Similarity.annRecallPqTrained(emb, iters = it))}%.4f")
    for (nc <- Seq(8, 16, 32, 64))
      println(s"[pq] nCents=$nc err(untrained)=" +
        errOf(Similarity.pqCodes(emb, nCents = nc)))
    spark.stop()
  }
}
