package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables

/** Scratch profiling main: stage-by-stage wall times for the operators
  * being tuned. Not part of the driver contract. Current target: the
  * ~1.8 s SF-independent fixed cost of sim_cosine_topk_q8 (its float
  * twin runs 0.3 s on the same corpus).
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
    def run(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val emb = Tables.load(spark, sfDir, "embeddings")
    time("warm embeddings")(emb.count())

    import graft.operators.Similarity
    for (i <- 1 to 3) {
      time(s"float topk #$i")(run(Similarity.cosineTopK(emb)))
      time(s"q8 topk    #$i")(run(Similarity.cosineTopKQuantized(emb)))
    }
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    for (i <- 1 to 2)
      time(s"q8 topk codegen-off #$i")(run(Similarity.cosineTopKQuantized(emb)))
    spark.conf.set("spark.sql.codegen.wholeStage", "true")

    // stage dissection: quantization scan alone, join+score without the
    // window, window without the score
    val qv = Similarity.quantizeInt8(emb)
    for (i <- 1 to 2) time(s"quantize scan #$i")(run(qv))
    spark.stop()
  }
}
