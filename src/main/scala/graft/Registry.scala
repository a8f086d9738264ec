package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: the Spark implementation plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver replays on the same parquet tables.
  *
  * Oracle-parity rules used throughout (keep results bit-identical between
  * Spark and DuckDB so the driver's value hash matches):
  *   - Alias every computed column identically on both sides.
  *   - Double SUM/AVG go through an exact DECIMAL accumulator:
  *     `CAST(SUM(CAST(x AS DECIMAL(18,s))) AS DOUBLE)` — per-value rounding
  *     is deterministic, the sum is exact (order-independent), and the final
  *     double is identical on both engines. A raw double SUM is
  *     order-dependent and WILL eventually hash-mismatch.
  *   - Deterministic top-k: ORDER BY always ends in a unique key.
  *   - MIN_BY/MAX_BY (DuckDB arg_min/arg_max) only over unique order keys.
  *
  * Construction eagerness: most `run` functions only BUILD a plan, but the
  * split/checkpoint operators (quality gates, split decontamination, BPE,
  * IVF-trained ANN, and the persisted incremental-dedup round trip —
  * which also WRITES its index artifact and appends the delta's buckets)
  * run Spark jobs at DataFrame-construction time — an
  * eager localCheckpoint cutting a shared subtree's lineage, or a driver
  * loop over O(k) metadata rows. Timing a query must therefore wrap the
  * `run` CALL, not just the action (Bench does); checkpointed partitions
  * are reclaimed by the ContextCleaner once the returned frame is GC'd.
  */
/** @param setup optional one-time store build (the mutation half of a
  *   lifecycle query). `run` composes setup + the measured read leg and
  *   stays fully self-contained (the setup memoizes per process); Bench
  *   times `setup` separately ONCE (`setup_s`) so per-rep `queries`
  *   numbers price the read leg, comparable with pure-read queries,
  *   while setup + measured still prices the full lifecycle.
  */
final case class QuerySpec(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    benchmark: Boolean = true,
    setup: Option[(SparkSession, String) => Unit] = None)

object Registry {
  /** All registered queries, in SURVEY.md §2 inventory order. */
  def all: Seq[QuerySpec] =
    ReferenceQueries.specs ++ RelationalQueries.specs ++ ExtensionQueries.specs

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.run).toMap

  /** Headline single-query latency set for Bench: excludes queries flagged
    * benchmark=false (iterative multi-job operators whose wall time is
    * round-count-dominated, not engine-throughput-dominated). Everything
    * still runs through Verify's correctness gate.
    */
  def benchQueries: Map[String, (SparkSession, String) => DataFrame] =
    all.filter(_.benchmark).map(q => q.name -> q.run).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
