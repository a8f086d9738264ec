package graft.tools

import org.apache.spark.sql.SparkSession
import graft.Tables
import graft.operators.Similarity

/** Scratch diagnostic main: recall@10 of the composed IVFADC index vs
  * exact L2 across the nProbe knob (candidate volume ≈ nProbe/nCells of
  * the corpus), against the full-corpus trained-ADC ceiling — the
  * numbers behind `sim_ann_ivfpq`'s nProbe=3 default and the recall
  * gate's 0.25 floor. Not part of the driver contract.
  */
object IvfPqGrid {
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
    val truth = Similarity.l2TopK(emb, 8, 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recallOf(rows: Array[(Long, Long)]): Double =
      (rows.toSet & truth).size.toDouble / truth.size
    // ceiling: trained ADC over the FULL corpus (no coarse pruning)
    val adc = Similarity.annRecallPqTrained(emb).collect()
      .map(r => r.getLong(2).toDouble / r.getLong(1)).sum / 8.0
    println(f"full-corpus trained-ADC recall=$adc%.3f (the no-pruning ceiling)")
    for (np <- Seq(1, 2, 3, 4, 8, 16)) {
      val t0 = System.nanoTime()
      val rows = Similarity.annIvfPq(emb, nProbe = np).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"nprobe=$np%2d recall=${recallOf(rows)}%.3f " +
        f"candidates~${np / 16.0}%.2f of corpus wall=$sec%.1fs")
    }
    spark.stop()
  }
}
