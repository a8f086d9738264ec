package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over relationship graphs derived from the warehouse
  * (extension surface — the reference demo has no graph operators; the
  * nearest in-repo relative is the iterative connected-components of
  * [[Dedup]]). The rank arithmetic is INTEGER-scaled throughout
  * (millionths, `DIV` division) so a fixed-iteration run is bit-exact on
  * any engine and any partitioning — the same determinism discipline as
  * the basis-point gauges: floating-point PageRank can never hash-match
  * across engines, integer PageRank always does.
  */
object Graphs {

  /** The co-supplier graph: an undirected edge links two suppliers that
    * ship lines of the SAME order (the "appears together" projection of
    * the order bipartite graph). Pair explosion is bounded by
    * lines-per-order (TPC-H ≤ 7 → ≤ 21 pairs per order), never
    * corpus-quadratic; the distinct collapses multiplicity.
    */
  def coSupplierEdges(lineitem: DataFrame): DataFrame = {
    val su = lineitem
      .select(col("l_orderkey").as("ok"), col("l_suppkey").as("s"))
      .distinct()
    val pairs = su.as("a")
      .join(su.as("b"),
        col("a.ok") === col("b.ok") && col("a.s") < col("b.s"))
      .select(col("a.s").as("src"), col("b.s").as("dst"))
      .distinct()
    pairs.unionByName(
      pairs.select(col("dst").as("src"), col("src").as("dst")))
  }

  /** Fixed-iteration PageRank in integer millionths: every node starts
    * at `scale`, each round
    * `rank'(v) = (15·scale) DIV 100 + (85 · Σ_u rank(u) DIV deg(u)) DIV 100`
    * over v's in-neighbors. All arithmetic is BIGINT `DIV`, so the
    * result is independent of accumulation order AND engine — the
    * DuckDB oracle unrolls the same rounds and hash-matches exactly.
    * Every node of the symmetric edge set has deg ≥ 1 and an in-edge,
    * so no dangling-mass term is needed.
    *
    * Scale: the edge list (joined once with out-degrees and
    * checkpointed) is the only big table; each round shuffles it once
    * to aggregate contributions by dst — k rounds = k edge-sized
    * map-side-combinable aggs, while the rank table stays node-sized
    * (broadcast-able until the node set itself is huge). The iteration
    * count is FIXED, not convergence-driven, so the job count is known
    * at plan time — the bounded-rounds discipline of the CC operator.
    */
  def pageRank(edges: DataFrame, iters: Int,
      scale: Long = 1000000L): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // (src, dst, deg(src)) — constant across rounds, computed once
    val withDeg = edges
      .join(deg.select(col("node").as("src"), col("deg")), Seq("src"))
      .localCheckpoint()
    var rank = deg.select(col("node"), lit(scale).as("pr"))
    (1 to iters).foreach { _ =>
      // both divisions are integral DIV (Spark's / on longs is float
      // division — never in the rank path)
      rank = withDeg
        .join(rank.select(col("node").as("src"), col("pr")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg((lit(15L * scale / 100L) +
          expr("(85 * sum(pr DIV deg)) DIV 100")).as("pr"))
    }
    deg.join(rank, Seq("node")).select("node", "deg", "pr")
  }

  /** Registered query: 3 PageRank rounds over the co-supplier graph,
    * every node reported with its degree and exact integer rank.
    */
  def coSupplierPageRank(lineitem: DataFrame): DataFrame =
    pageRank(coSupplierEdges(lineitem), iters = 3)
}
