package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Cost-based-optimizer loop closure: feed ANALYZE TABLE statistics into
  * Catalyst and let them CHANGE A PLAN — the consumer side of the r13
  * statistics gauges (`gov_join_estimate` proved the MCV histogram's
  * join-cardinality accuracy, `gov_range_estimate` the equi-depth
  * histogram's range accuracy; this module makes Catalyst act on the
  * same class of statistics).
  *
  * Mechanics (all public Spark semantics):
  *   - column/table statistics attach to CATALOG tables, not ad-hoc
  *     `spark.read.parquet` frames — so the stats path registers the
  *     parquet files as external tables (scratch-keyed names, the
  *     bucketed-metastore discipline of `StorageLayout`) and runs
  *     `ANALYZE TABLE … COMPUTE STATISTICS` (rowCount/sizeInBytes) plus
  *     `… FOR COLUMNS` (ndv/min/max/nullCount per column);
  *   - `spark.sql.cbo.enabled` turns on stats-based estimation
  *     (FilterEstimation shrinks a filtered relation's rowCount using
  *     column min/max/ndv; JoinEstimation uses key ndv);
  *   - `spark.sql.cbo.joinReorder.enabled` turns on CostBasedJoinReorder,
  *     the DP re-ordering of consecutive INNER joins by estimated
  *     cost — the decision the r13 verdict asked to see flip;
  *   - `spark.sql.statistics.histogram.enabled` (set during ANALYZE)
  *     additionally stores equi-height histograms per column: Spark's
  *     FilterEstimation consults the histogram for RANGE predicates
  *     (the exact case `gov_range_estimate` measured at 17 bp vs the
  *     min-max model's 8320 bp) and falls back to uniform ndv/min-max
  *     interpolation without one. Equality predicates and join-key
  *     estimation use ndv either way.
  *
  * The registered query (`q35_cbo_priority`) is the TPC-H Q3 shape
  * WRITTEN IN THE WORST ORDER — lineitem ⋈ orders first, the selective
  * BUILDING-segment customer LAST, so the syntactic plan carries the
  * full fact-fact intermediate. With stats + CBO on, CostBasedJoinReorder
  * provably re-roots the join tree at (customer ⋈ orders) and joins
  * lineitem last (PlanSpec pins both optimized plans; the oracle hash
  * pins that re-ordering changed nothing semantically). At 100 TB this
  * exact flip is the difference between shuffling the fact table against
  * an unfiltered fact and against a 1/5-segment dimension slice.
  */
object Cbo {

  /** Register the three Q3 tables as external catalog tables over the
    * sf-dir parquet (idempotent per session; names keyed by the dir so
    * interleaved scale factors never clobber each other) and ANALYZE
    * table + join/filter columns. Returns logical-name → catalog-name.
    */
  /** The scratch-keyed catalog name a table registers under — ONE
    * formula shared with [[graft.Tables]]' stats-catalog redirect so the
    * sweep and the loaders can never disagree on the name.
    */
  def catalogName(table: String, dir: String): String =
    s"graft_cbo_${table}_${Integer.toHexString(dir.hashCode)}"

  def ensureStats(spark: SparkSession, dir: String): Map[String, String] =
    ensureTables(spark, dir, Map(
      "lineitem" -> Seq("l_orderkey", "l_extendedprice", "l_discount"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate"),
      "customer" -> Seq("c_custkey", "c_mktsegment")))

  /** ANALYZE'd catalog tables for EVERY relational table plus documents
    * and embeddings (events is exempt — its nanosecond timestamps need
    * the legacy long read, which has no catalog equivalent) — the
    * stats-ON-everywhere posture a production deployment runs with.
    * Column lists cover every join key and the selective filter/agg
    * columns the registered queries touch; heavy payload columns (text,
    * embedding) are deliberately excluded from FOR COLUMNS. Used by the
    * `tools/StatsSweep` breadth gauge and the [[graft.Tables]]
    * stats-catalog redirect.
    */
  def ensureStatsAll(spark: SparkSession, dir: String): Map[String, String] =
    ensureTables(spark, dir, Map(
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount", "l_shipdate",
        "l_returnflag", "l_linestatus"),
      "orders" -> Seq("o_orderkey", "o_custkey", "o_orderdate",
        "o_orderpriority", "o_totalprice"),
      "customer" -> Seq("c_custkey", "c_nationkey", "c_mktsegment"),
      "supplier" -> Seq("s_suppkey", "s_nationkey"),
      "part" -> Seq("p_partkey", "p_name"),
      "nation" -> Seq("n_nationkey", "n_regionkey", "n_name"),
      "region" -> Seq("r_regionkey", "r_name"),
      "documents" -> Seq("doc_id", "lang", "source", "n_chars"),
      "embeddings" -> Seq("vec_id")))

  /** Register + ANALYZE the missing tables CONCURRENTLY (guide §2.6:
    * independent jobs back-fill each other's stragglers — each table's
    * ANALYZE is a few small jobs whose tails would otherwise leave the
    * cores idle; the r18 baseline measured the sequential loop at 24.5 s
    * of the bench's setup, ~3× the parallel form). Parallelism is
    * bounded (4 in-flight) so the ANALYZE scans never oversubscribe the
    * executor; the histogram conf is session-global, so it is set ONCE
    * around the pool instead of per table (the per-table set/unset of
    * the sequential form would race across threads). Failure semantics
    * are unchanged: createAnalyzed drops its own half-made table, and
    * the FIRST failure is rethrown after all in-flight tables settle.
    */
  private def ensureTables(
      spark: SparkSession, dir: String,
      cols: Map[String, Seq[String]]): Map[String, String] = {
    val missing = cols.keys.toSeq.sorted
      .filter(t => !spark.catalog.tableExists(catalogName(t, dir)))
    if (missing.nonEmpty) {
      val prev = spark.conf.getOption("spark.sql.statistics.histogram.enabled")
      spark.conf.set("spark.sql.statistics.histogram.enabled", "true")
      val pool = java.util.concurrent.Executors.newFixedThreadPool(
        math.min(4, missing.size))
      try {
        val futures = missing.map { t =>
          pool.submit(new java.util.concurrent.Callable[Unit] {
            def call(): Unit = createAnalyzed(
              spark, catalogName(t, dir), s"$dir/$t.parquet", cols(t))
          })
        }
        // surface the first failure, but only after every task settled
        // (a half-running ANALYZE must not outlive this call)
        val errs = futures.flatMap(f =>
          try { f.get(); None }
          catch {
            case e: java.util.concurrent.ExecutionException =>
              Some(e.getCause)
          })
        errs.headOption.foreach(throw _)
      } finally {
        pool.shutdown()
        prev match {
          case Some(v) =>
            spark.conf.set("spark.sql.statistics.histogram.enabled", v)
          case None =>
            spark.conf.unset("spark.sql.statistics.histogram.enabled")
        }
      }
    }
    cols.keys.toSeq.sorted.map(t => t -> catalogName(t, dir)).toMap
  }

  /** CREATE + ANALYZE as one failure-atomic step: if any ANALYZE throws,
    * the table is DROPPED before rethrowing, so a later retry re-runs
    * the full sequence — otherwise tableExists would be true for the
    * rest of the session with no statistics attached, and CBO would
    * silently stop reordering while the oracle still passed.
    */
  private def createAnalyzed(
      spark: SparkSession, name: String, location: String,
      cols: Seq[String]): Unit = {
    spark.sql(s"CREATE TABLE $name USING parquet LOCATION '$location'")
    // Spark 4.1 FilterEstimation.evaluateBinary has no TimestampNTZType
    // case (scala.MatchError at FilterEstimation.scala:281) — column
    // stats on an NTZ column crash PLANNING of any query comparing it to
    // a literal once CBO is on (the StatsSweep breadth gauge surfaced
    // this on q4/q7's o_orderdate range filters; the driver's parquet
    // timestamps all read as NTZ). Excluding NTZ columns from FOR
    // COLUMNS makes estimation skip them (no stats -> default
    // selectivity) at the cost of date-range selectivity — the safe
    // posture until the upstream gap closes.
    val schema = spark.table(name).schema
    val safe = cols.filter(c =>
      schema(c).dataType != org.apache.spark.sql.types.TimestampNTZType)
    // histograms ride the same ANALYZE pass when enabled; stored per
    // column, consulted by range-predicate estimation. The conf is
    // session-global and is set by ensureTables around the (possibly
    // concurrent) table loop — setting it here per call would race
    // between the pool's threads.
    try {
      spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS")
      if (safe.nonEmpty)
        spark.sql(s"ANALYZE TABLE $name COMPUTE STATISTICS " +
          s"FOR COLUMNS ${safe.mkString(", ")}")
    } catch {
      case e: Throwable =>
        try spark.sql(s"DROP TABLE IF EXISTS $name")
        catch { case _: Throwable => () }
        throw e
    }
  }

  /** Run `body` with CBO + join reorder on, restoring prior conf values
    * after — callers must force execution (checkpoint/collect) INSIDE,
    * since Catalyst reads the conf at optimization time, not DataFrame
    * construction time.
    */
  def withCbo[T](spark: SparkSession)(body: => T): T = {
    val keys = Seq("spark.sql.cbo.enabled", "spark.sql.cbo.joinReorder.enabled")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    keys.foreach(k => spark.conf.set(k, "true"))
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** The Q3-shape SQL over the stats-bearing catalog tables, written in
    * the WORST syntactic order (fact ⋈ fact first, selective dim last).
    * Exposed so PlanSpec can pin the optimized plan under both conf
    * states against the identical text.
    */
  def prioritySql(t: Map[String, String]): String = s"""
    SELECT o_orderkey, o_orderdate, o_orderpriority,
           CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 1e4
             + 0.5) AS BIGINT)) AS DOUBLE) / 1e4 AS revenue
    FROM ${t("lineitem")}
    JOIN ${t("orders")} ON o_orderkey = l_orderkey
    JOIN ${t("customer")} ON c_custkey = o_custkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY o_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderkey LIMIT 10"""

  /** Registered query: Q3 through the statistics-fed CBO path. The
    * eager checkpoint materializes the result WHILE the CBO confs are
    * set (plans resolve at action time); reps after the first re-run
    * the already-analyzed tables, so the bench prices the CBO-planned
    * execution, with the one-time ANALYZE priced by the first rep.
    */
  def shippingPriorityCbo(spark: SparkSession, dir: String): DataFrame = {
    val t = ensureStats(spark, dir)
    withCbo(spark) {
      spark.sql(prioritySql(t)).localCheckpoint()
    }
  }
}
