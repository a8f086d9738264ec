package graft
import org.apache.spark.sql.{DataFrame, SparkSession}
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val reps = math.max(1, sys.env.getOrElse("SPARK_GRAFT_BENCH_REPS", "3").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Pruning-proof action: a noop-format write consumes every output
    // column of every row, so Catalyst cannot collapse projection-only
    // pipelines into a parquet row count the way `.count()` could (column
    // pruning under count(1) deleted the very work being measured).
    def exec(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    // Warm the executor/codegen/scan paths once so the first measured query
    // doesn't pay JVM/JIT startup: a tiny shuffle, the parquet footers, the
    // array-expression path, and a tiny run of the heaviest operator shape
    // (so Janino compiles the shingle/hash pipeline before the measured
    // pass). Warmup is best effort — a missing table must not kill the run.
    def warm(f: => Unit): Unit = try f catch { case _: Throwable => () }
    warm(spark.range(10000).selectExpr("id % 7 k").groupBy("k").count().collect())
    warm(spark.read.parquet(s"$sfDir/region.parquet").count())
    warm(exec(spark.read.parquet(s"$sfDir/embeddings.parquet").limit(8)
      .selectExpr("size(embedding) s")))
    warm(exec(graft.operators.Dedup.minhashSignatures(
      spark.read.parquet(s"$sfDir/documents.parquet").limit(64))))
    // Each query runs `reps` times; report the min over SUCCESSFUL reps —
    // single-machine timing noise (GC, page cache, JIT recompiles) is
    // strictly additive, so the min is the least-noise estimate of the
    // plan's cost. A rep that throws contributes nothing (a fast failure
    // must not masquerade as a fast query); all-reps-failed reports -1 so
    // the breakage is visible in the JSON instead of a bogus latency.
    val results = Registry.benchQueries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val times = (1 to reps).flatMap { _ =>
        val t0 = System.nanoTime()
        try { exec(fn(spark, sfDir)); Some((System.nanoTime() - t0) / 1e9) }
        catch { case _: Throwable => None }
      }
      name -> (if (times.isEmpty) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // The headline total covers benchmark=true queries only; name the
    // excluded set in the output so totals are comparable across rounds.
    val excluded = Registry.all.filterNot(_.benchmark).map(_.name).sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir","reps":$reps,"action":"noop-write","excluded":$excluded}""")
    // The per-query line above can exceed a bounded tail capture (r1 and r3
    // both recorded parsed:null when the head of the line was cut off), so
    // repeat the headline as a short, self-contained JSON line LAST: any
    // tail window that sees the end of the output parses the total.
    println(s"""{"metric":"total","value":$total,"unit":"sec","sf":"$sfDir","reps":$reps,"action":"noop-write","nqueries":${results.size}}""")
    spark.stop()
  }
}
