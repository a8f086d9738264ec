package graft.tools
import org.apache.spark.sql.SparkSession

/** Bitext blocker operating-point grid: recall of the LSH-blocked miner
  * vs the exact one at each bucket width — the measurement behind the
  * registered default (same discipline as IvfPqGrid/RecallGrid).
  */
object BitextGrid {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.load(spark, sf, "documents")
    val emb = graft.Tables.load(spark, sf, "embeddings")
    for (bits <- Seq(1, 2, 3, 4, 6)) {
      val r = graft.operators.Similarity.bitextRecall(docs, emb, bits = bits).head()
      println(s"bits=$bits exact=${r.getLong(0)} blocked=${r.getLong(1)} " +
        s"common=${r.getLong(2)} recall_bp=${r.getLong(3)}")
    }
    spark.stop()
  }
}
