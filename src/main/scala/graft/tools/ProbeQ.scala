package graft.tools
import org.apache.spark.sql.SparkSession
object ProbeQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.Registry.queries(name)(spark, sf)
      val t1 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val t2 = System.nanoTime()
      println(f"rep $rep construct ${(t1-t0)/1e9}%.2f s execute ${(t2-t1)/1e9}%.2f s")
    }
  }
}
