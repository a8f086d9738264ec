package graft.tools

import org.apache.spark.sql.SparkSession
import graft.operators.TextAnalysis

/** One-off measurement harness for the k=64 batched-BPE gauge: does the
  * batched selection still coincide with the 1-merge-per-pass sequential
  * reference at 64 merges on the harness corpus, how many passes does it
  * take, and what do the delta-maintained vs recounted count tables cost
  * in wall time. `rep` replicates the corpus N× with shifted doc ids —
  * the synthetic scale ladder the delta-vs-recount CROSSOVER measurement
  * needs (testdata tops out at sf0.1, below where the asymptotics meet).
  * Usage: runMain graft.tools.BpeProbe <sfDir> [k] [batch] [rep] [seq]
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val k = if (args.length > 1) args(1).toInt else 64
    val batch = if (args.length > 2) args(2).toInt else 8
    val rep = if (args.length > 3) args(3).toInt else 1
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.functions._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    val top = base.agg(max(col("doc_id"))).head.getLong(0) + 1L
    val docs = (0 until rep).map(i =>
      base.withColumn("doc_id", col("doc_id") + lit(i.toLong * top)))
      .reduce(_ unionByName _)
    val chars = docs.agg(sum(length(col("text")))).head.getLong(0)
    println(s"[probe] corpus: rep=$rep docs=${docs.count()} chars=$chars")
    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val ((bat, passes), tBat) =
      timed(TextAnalysis.bpeLearnBatched(docs, k, batch))
    println(s"[probe] batched: k=$k batch=$batch passes=$passes " +
      f"wall=$tBat%.1f s")
    val ((rec, passesR), tRec) =
      timed(TextAnalysis.bpeLearnBatched(docs, k, batch, recount = true))
    println(f"[probe] recount: passes=$passesR wall=$tRec%.1f s " +
      s"tables_equal=${bat == rec}")
    // the 1-merge-per-pass reference costs k full passes — opt-in only
    if (args.length > 4 && args(4) == "seq") {
      val (seq, tSeq) = timed(TextAnalysis.bpeLearn(docs, k))
      println(f"[probe] sequential: wall=$tSeq%.1f s")
      val diverge = seq.zip(bat).indexWhere { case (a, b) => a != b }
      println(s"[probe] batched==sequential: ${seq == bat}" +
        (if (diverge >= 0) s" (first divergence at round ${diverge + 1}: " +
          s"seq=${seq(diverge)} bat=${bat(diverge)})" else ""))
    }
    spark.stop()
  }
}
