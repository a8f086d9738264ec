package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Similarity

/** Scratch diagnostic main: recall@10 of the ANN variants against the
  * brute-force truth across the (iters, nProbe) knob grid — the numbers
  * behind the trained-IVF defaults. Not part of the driver contract.
  */
object RecallGrid {
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
    val truth = Similarity.cosineTopK(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val base = Similarity.annIvf(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    println(f"first-N single-probe recall=${(base & truth).size.toDouble / truth.size}%.3f")
    for (it <- Seq(1, 2, 3); np <- Seq(2, 3, 4, 6, 8)) {
      val t = Similarity.annIvfTrained(emb, 8, 10, 16, it, np).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      println(f"iters=$it nprobe=$np recall=${(t & truth).size.toDouble / truth.size}%.3f")
    }
    spark.stop()
  }
}
