package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, max}
import graft.operators.Similarity

/** Measure what posting compaction buys at search time: build the IVFADC
  * index from a base write plus `nAppends` delta batches (each touched
  * cell gains one file fragment per batch), time the probe-limited
  * search over the fragmented artifact, compact, time it again.
  *
  * Usage: runMain graft.tools.CompactProbe [sfDir] [nAppends]
  */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val nAppends = if (args.length > 1) args(1).toInt else 8
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = graft.Tables.load(spark, sfDir, "embeddings")
    val top = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val cut = top / 2L
    val dir = java.nio.file.Files.createTempDirectory("graft_cmpprobe").toString
    Similarity.writeIvfPqIndexFull(emb.filter(col("vec_id") < cut), dir)
    val step = (top - cut) / nAppends + 1L
    for (b <- 0 until nAppends) {
      val lo = cut + b * step
      val hi = math.min(top, lo + step)
      if (lo < hi) Similarity.appendIvfPqPostings(
        emb.filter(col("vec_id") >= lo && col("vec_id") < hi), dir)
    }
    def files() = {
      val cells = new java.io.File(s"$dir/postings").listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      cells.map(_.listFiles().count(_.getName.endsWith(".parquet"))).sum
    }
    def time(reps: Int): Seq[Double] = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Similarity.annIvfPqAppended(emb, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    val fragFiles = files()
    val frag = time(4)
    Similarity.compactIvfPqPostings(spark, dir)
    val compFiles = files()
    val comp = time(4)
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%.2f").mkString("/")
    println(s"files fragmented=$fragFiles compacted=$compFiles")
    println(s"search_s fragmented=${fmt(frag)} compacted=${fmt(comp)}")
    println(f"min fragmented=${frag.min}%.2f compacted=${comp.min}%.2f")
    spark.stop()
  }
}
