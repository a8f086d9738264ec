package graft

import graft.operators.StorageLayout
import org.apache.spark.sql.functions._

/** Z-order clustering: Morton-code correctness against a bit-by-bit
  * brute force, and the data-skipping gauge's invariants on the real
  * corpus (no false negatives; the two layouts price the same
  * selection; multi-dimensional clustering actually skips more).
  */
class StorageLayoutSpec extends GraftSpec {
  import spark.implicits._

  private def bruteInterleave(a: Long, b: Long): Long =
    (0 until 16).map { i =>
      (((a >> i) & 1L) << (2 * i)) | (((b >> i) & 1L) << (2 * i + 1))
    }.reduce(_ | _)

  test("zorder keys: engine Morton ladder equals the bit-by-bit brute force") {
    // rows 0 and 65535 pin the quantization to the identity, so the raw
    // values ARE the 16-bit inputs and the ladder is tested directly
    val vals = Seq((0L, 0L), (65535L, 65535L), (12345L, 54321L),
      (1L, 2L), (40000L, 3L), (32768L, 32767L), (21845L, 43690L))
    val df = vals.toDF("a", "b")
    val keyed = StorageLayout.zorderKeyed(df, "a", "b", 6)
      .select("a", "b", "qa", "qb", "zbucket", "lbucket").collect()
    keyed.foreach { r =>
      val (a, b) = (r.getAs[Long]("a"), r.getAs[Long]("b"))
      assert(r.getAs[Long]("qa") === a, s"quantization must be identity for $a")
      assert(r.getAs[Long]("qb") === b)
      assert(r.getAs[Long]("zbucket") === (bruteInterleave(a, b) >> 26),
        s"morton mismatch at ($a, $b)")
      assert(r.getAs[Long]("lbucket") === (a >> 10))
    }
  }

  test("skipping gauge: same selection, zone maps complete, z-order skips more") {
    val li = Tables.load(spark, sf, "lineitem")
    val g = StorageLayout.zorderSkippingGauge(li).collect()
      .map(r => r.getAs[String]("layout") -> r).toMap
    val (z, l) = (g("zorder"), g("linear"))
    // both layouts bucket ALL rows and select the same exact rows
    assert(z.getAs[Long]("rows_total") === l.getAs[Long]("rows_total"))
    assert(z.getAs[Long]("rows_selected") === l.getAs[Long]("rows_selected"))
    assert(z.getAs[Long]("rows_selected") > 0L)
    // zone maps have no false negatives: admitted rows cover the selection
    assert(z.getAs[Long]("rows_scanned") >= z.getAs[Long]("rows_selected"))
    assert(l.getAs[Long]("rows_scanned") >= l.getAs[Long]("rows_selected"))
    // the point of the layout: the 2-D box reads strictly fewer rows
    // under Morton clustering than under the single-column sort
    assert(z.getAs[Long]("rows_scanned") < l.getAs[Long]("rows_scanned"),
      s"z=${z.getAs[Long]("rows_scanned")} l=${l.getAs[Long]("rows_scanned")}")
  }

  test("zorder lookup equals the unclustered filter, rows drawn only from admitted cells") {
    val li = Tables.load(spark, sf, "lineitem")
    val scratch = java.nio.file.Files.createTempDirectory("graft_zl").toString
    val got = StorageLayout.zorderLookup(spark, li, scratch).collect()
      .map(r => r.getAs[Boolean]("qa_even") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("key_sum")))).toMap
    val expected = StorageLayout.zorderKeyed(
      li.select("l_orderkey", "l_partkey", "l_suppkey"),
      "l_partkey", "l_suppkey", 6)
      .where(col("qa").between(16384L, 22937L) &&
        col("qb").between(16384L, 22937L))
      .withColumn("qa_even", (col("qa") % 2) === 0)
      .groupBy("qa_even")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"),
        org.apache.spark.sql.functions.sum(col("l_orderkey")).as("key_sum"))
      .collect()
      .map(r => r.getAs[Boolean]("qa_even") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Long]("key_sum")))).toMap
    assert(got === expected)
  }

  test("schema evolution: merged read NULL-fills the old generation only") {
    val docs = Seq(
      (2L, "alpha beta", "en", "s1", 10L),
      (4L, "gamma", "en", "s1", 5L),
      (3L, "one two three", "en", "s2", 13L),
      (5L, "x y", "de", "s1", 3L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val root = java.nio.file.Files.createTempDirectory("graft_schevo").toString
    val got = StorageLayout.schemaEvolution(spark, docs, root).collect()
      .map(r => r.getAs[String]("lang") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("n_with_toks"),
          r.getAs[Long]("sum_toks")))).toMap
    // en: docs 2,4 (old gen, NULL n_toks) + doc 3 (new gen, 3 tokens);
    // de: doc 5 (new gen, 2 tokens)
    assert(got === Map("en" -> ((3L, 1L, 3L)), "de" -> ((1L, 1L, 2L))))
    // the physical contract: gen-1 files genuinely lack the column and
    // the merged read resurfaces it as NULL for exactly those rows
    assert(!spark.read.parquet(s"$root/g1").columns.contains("n_toks"))
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$root/g1", s"$root/g2")
    val nullIds = merged.where(col("n_toks").isNull)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(nullIds === Set(2L, 4L))
  }

  test("partition evolution: mixed-spec pruning reads the right files " +
    "and reassembles the exact slice") {
    // generation = md5(doc_id) coin: ids 1,3,6 land in g1; 2,4,5 in g2
    val docs = Seq(
      (1L, "alpha", "en", "src1", 5L),   // g1, in slice
      (3L, "beta", "en", "src2", 4L),    // g1, other source (same lang dir)
      (6L, "gamma", "de", "src1", 5L),   // g1, other lang
      (2L, "delta", "en", "src1", 5L),   // g2, in slice
      (4L, "epsilon", "en", "src2", 7L), // g2, other source dir
      (5L, "zeta", "zh", "src1", 4L)     // g2, other lang dir
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val root = java.nio.file.Files.createTempDirectory("graft_pevo").toString
    val got = StorageLayout.partitionEvolution(spark, docs, root)
      .collect()
      .map(r => r.getAs[String]("generation") ->
        ((r.getAs[Long]("n_docs"), r.getAs[Long]("sum_chars")))).toMap
    assert(got === Map("g1" -> ((1L, 5L)), "g2" -> ((1L, 5L))))
    // physical contract: gen-2 nests source under lang, gen-1 has no
    // source directories at all (its spec predates the evolution)
    assert(new java.io.File(s"$root/gen2/lang=en/source=src1").isDirectory)
    assert(new java.io.File(s"$root/gen2/lang=en/source=src2").isDirectory)
    assert(new java.io.File(s"$root/gen1/lang=en").isDirectory)
    assert(!new java.io.File(s"$root/gen1/lang=en")
      .listFiles.exists(_.getName.startsWith("source=")))
    // and the pruned scan shapes on THIS fixture (inputFiles reports the
    // unpruned relation, so pin the executed plans instead): gen-2
    // prunes on both keys, gen-1 pushes source as a data filter
    val g2p = spark.read.parquet(s"$root/gen2")
      .where(col("lang") === "en" && col("source") === "src1")
      .queryExecution.executedPlan.toString
    assert(g2p.contains("PartitionFilters") && g2p.contains("source"), g2p)
    val g1p = spark.read.parquet(s"$root/gen1")
      .where(col("lang") === "en" && col("source") === "src1")
      .queryExecution.executedPlan.toString
    val g1pf = "PartitionFilters: \\[[^\\]]*\\]".r.findFirstIn(g1p).getOrElse("")
    assert(g1pf.contains("lang") && !g1pf.contains("source"), g1p)
    assert(g1p.contains("EqualTo(source,src1)"), g1p)
  }

  private def manifestMap(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Double, Long, Long, Long)] =
    df.collect().map(r => r.getAs[String]("o_orderstatus") ->
      ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_price"),
        r.getAs[Long]("min_key"), r.getAs[Long]("max_key"),
        r.getAs[Long]("fp_xor")))).toMap

  test("csv round trip: typed columns survive the text cycle bit-exactly") {
    val orders = Tables.load(spark, sf, "orders")
    val scratch = java.nio.file.Files.createTempDirectory("graft_ocsv").toString
    val got = manifestMap(StorageLayout.csvRoundtrip(spark, orders, scratch))
    val want = manifestMap(StorageLayout.ordersManifest(
      orders.withColumn("fp", StorageLayout.ordersRowFp)))
    assert(got === want)
    assert(got.nonEmpty && got.values.map(_._1).sum > 0)
  }

  test("orc round trip: pushed key-range slice equals the parquet-computed slice") {
    val orders = Tables.load(spark, sf, "orders")
    val scratch = java.nio.file.Files.createTempDirectory("graft_oorc").toString
    val cap = 40000L
    val got = manifestMap(StorageLayout.orcRoundtrip(spark, orders, scratch, cap))
    val want = manifestMap(StorageLayout.ordersManifest(
      orders.where(col("o_orderkey") <= cap)
        .withColumn("fp", StorageLayout.ordersRowFp)))
    assert(got === want)
    assert(got.values.forall(_._4 <= cap))
  }

  test("orders row fingerprint is a tripwire: any column perturbation flips it") {
    val base = Seq((1L, 2L, "O", 123.45, ts("2020-01-02 03:04:05"), "1-URGENT"))
      .toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp_ntz"))
    def fp(df: org.apache.spark.sql.DataFrame): String =
      df.select(StorageLayout.ordersRowFp.as("fp")).head.getString(0)
    val orig = fp(base)
    // a cent of price, a microsecond of time, one key digit — each flips
    assert(fp(base.withColumn("o_totalprice", col("o_totalprice") + 0.01)) !== orig)
    assert(fp(base.withColumn("o_orderdate",
      col("o_orderdate") + expr("INTERVAL 1 MICROSECOND"))) !== orig)
    assert(fp(base.withColumn("o_orderkey", col("o_orderkey") + 1)) !== orig)
    assert(fp(base.withColumn("o_orderstatus", lit("F"))) !== orig)
  }

  test("csv bad records: every corrupt line quarantined, clean rows undamaged") {
    val orders = Tables.load(spark, sf, "orders")
    val scratch = java.nio.file.Files.createTempDirectory("graft_obad").toString
    val got = StorageLayout.csvBadRecords(spark, orders, scratch).collect()
      .map(r => r.getAs[String]("status") ->
        ((r.getAs[Long]("n_rows"), r.getAs[Double]("sum_price")))).toMap
    val nBad = orders.where(col("o_orderkey") % 97 === 0).count()
    assert(nBad > 0, "fixture must contain corrupt lines")
    assert(got("_corrupt") === ((nBad, 0.0)))
    // clean side: counts and exact decimal sums match parquet truth
    val want = orders.where(col("o_orderkey") % 97 =!= 0)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("s"))
      .collect()
      .map(r => r.getAs[String]("o_orderstatus") ->
        ((r.getAs[Long]("n"), r.getAs[Double]("s")))).toMap
    assert(got - "_corrupt" === want)
  }
}
