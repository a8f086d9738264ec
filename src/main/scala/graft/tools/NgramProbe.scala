package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Dedup

/** Diagnostic behind the ngramJaccardPairs plan choice (see its scaladoc):
  * times the candidate shapes for recovering the per-doc set size |A| and
  * counts duplicated shingle-construction expressions in each physical
  * plan. Measured at sf0.1 (warm): window-over-doc_id 1.85 s (transform
  * ×4), scan-side size 19-24 s (×8), sizes-join 8.7 s (×8); packing
  * (shingle, n) structs before the explode re-inlined size(sh) per
  * element and ran >1000 s. Conclusion: Generate-adjacent projections
  * re-inline non-cheap expressions, so pay the one extra keyed exchange.
  */
object NgramProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = Tables.load(spark, dir, "documents")

    def time(name: String, df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      val d = df
      d.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = d.queryExecution.executedPlan.toString
      val nTransform = "transform\\(sequence".r.findAllIn(plan).size
      val nDistinct = "array_distinct".r.findAllIn(plan).size
      val nMd5 = "concat_ws".r.findAllIn(plan).size
      println(f"PROBE $name%-12s $sec%7.2f s  transform=$nTransform distinct=$nDistinct concat=$nMd5")
    }

    def sharr: DataFrame = docs
      .select(col("doc_id"), split(lower(trim(col("text"))), "\\s+").as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("transform(sequence(1, size(toks)-2)," +
          " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))").as("shingles"))

    def pairsFrom(sh2: DataFrame, withN: Boolean, minJaccard: Double): DataFrame = {
      val listed =
        if (withN)
          sh2.groupBy(col("shingle"))
            .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
            .filter(size(col("ids")) > 1)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ids) - 2), i ->
                   transform(sequence(i + 1, size(ids) - 1), j ->
                     struct(ids[i].doc_id AS doc_a, ids[j].doc_id AS doc_b,
                            ids[i].n AS n_a, ids[j].n AS n_b))))""")).as("p"))
            .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
              col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
            .agg(count(lit(1)).as("n_common"))
        else
          sh2.groupBy(col("shingle"))
            .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
            .filter(size(col("ids")) > 1)
            .select(explode(expr(
              """flatten(transform(sequence(0, size(ids) - 2), i ->
                   transform(sequence(i + 1, size(ids) - 1), j ->
                     struct(ids[i] AS doc_a, ids[j] AS doc_b))))""")).as("p"))
            .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
            .agg(count(lit(1)).as("n_common"))
      listed
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= minJaccard)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
    }

    // r3 form: explode once per branch, n via window over doc_id
    def r3window(minJaccard: Double = 0.05, maxDf: Int = 100): DataFrame = {
      val exploded = sharr
        .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("shingle"))
      val hot = exploded.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > maxDf).select(col("shingle"))
      val sh2 = exploded
        .withColumn("n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
        .join(broadcast(hot), Seq("shingle"), "left_anti")
      pairsFrom(sh2, withN = true, minJaccard)
    }

    // sizes-join form: posting lists carry only doc ids; per-doc set sizes
    // come from a third scan joined onto the (tiny) pair set at the end
    def sizesJoin(minJaccard: Double = 0.05, maxDf: Int = 100): DataFrame = {
      val exploded = sharr
        .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("shingle"))
      val hot = exploded.groupBy(col("shingle"))
        .agg(count(lit(1)).as("df")).filter(col("df") > maxDf).select(col("shingle"))
      val sh2 = exploded.join(broadcast(hot), Seq("shingle"), "left_anti")
      val sizes = sharr.select(col("doc_id"),
        size(array_distinct(col("shingles"))).as("n"))
      val counted = sh2.groupBy(col("shingle"))
        .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
        .filter(size(col("ids")) > 1)
        .select(explode(expr(
          """flatten(transform(sequence(0, size(ids) - 2), i ->
               transform(sequence(i + 1, size(ids) - 1), j ->
                 struct(ids[i] AS doc_a, ids[j] AS doc_b))))""")).as("p"))
        .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"))
        .agg(count(lit(1)).as("n_common"))
      counted
        .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
        .withColumn("jaccard",
          col("n_common").cast("double") /
            (col("n_a") + col("n_b") - col("n_common")).cast("double"))
        .filter(col("jaccard") >= minJaccard)
        .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
    }

    time("shipped", Dedup.ngramJaccardPairs(docs))
    time("r3window", r3window())
    time("sizesjoin", sizesJoin())
    time("shipped2", Dedup.ngramJaccardPairs(docs))
    time("sizesjoin2", sizesJoin())
    spark.stop()
  }
}
