package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Packing, TextAnalysis}

/** Scratch diagnostic main: OUT-OF-SAMPLE evaluation of the hashed-feature
  * quality model — train the weights on the `splitTrainHoldout` train
  * split, score the held-out 5%, and tally the confusion matrix against
  * the gopher weak labels on BOTH splits. `text_quality_model_eval`'s
  * registered matrix is in-sample by construction (one corpus, one
  * model); this measures whether the 1024-bucket weights generalize or
  * memorize. Not part of the driver contract.
  */
object ModelEval {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.load(spark, sfDir, "documents")
    val split = Packing.splitTrainHoldout(docs).select("doc_id", "split")
    val train = docs.join(split.filter(col("split") === "train"), "doc_id")
      .select(docs.columns.map(col): _*)
    val holdout = docs.join(split.filter(col("split") === "holdout"), "doc_id")
      .select(docs.columns.map(col): _*)
    val wts = TextAnalysis.qualityModelWeights(train).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def matrix(part: org.apache.spark.sql.DataFrame, label: String): Unit = {
      val cells = TextAnalysis.gopherRules(part).select(col("doc_id"), col("pass"))
        .join(part.select(col("doc_id"),
          (TextAnalysis.modelScore(col("text"), wts) > 0L).as("model_pass")),
          "doc_id")
        .groupBy(col("pass"), col("model_pass")).count().collect()
        .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
      val total = cells.values.sum
      val agree = cells.getOrElse((true, true), 0L) +
        cells.getOrElse((false, false), 0L)
      println(f"$label%-8s n=$total%5d agree=${agree.toDouble / total}%.3f " +
        f"tt=${cells.getOrElse((true, true), 0L)} " +
        f"ff=${cells.getOrElse((false, false), 0L)} " +
        f"tf=${cells.getOrElse((true, false), 0L)} " +
        f"ft=${cells.getOrElse((false, true), 0L)}")
    }
    matrix(train, "train")
    matrix(holdout, "holdout")
    spark.stop()
  }
}
