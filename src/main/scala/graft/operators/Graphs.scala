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
  def coSupplierEdges(lineitem: DataFrame): DataFrame =
    coOccurrenceEdges(lineitem, "l_suppkey")

  /** Distinct undirected co-occurrence pairs (src < dst) of `itemCol`
    * values sharing an order, symmetrized. Pair enumeration rides the
    * per-basket arrays of ONE groupBy (collect_set dedups within the
    * basket; ≤ 7 lines/order bounds the C(k,2) explosion) instead of the
    * pre-r18 distinct-project + ok-keyed self-join + distinct — that
    * shape paid three data-sized exchanges and a sort-merge join where
    * this one pays two exchanges (basket agg, pair distinct) and no join
    * (guide §2.4; measured ~2 s of the 4.9 s triangle census at sf0.1
    * was edge building). The distinct pair list is checkpointed once —
    * it feeds both union branches and every downstream reference, and
    * identical subtrees under a Union get no runtime exchange reuse.
    */
  private def coOccurrenceEdges(lineitem: DataFrame, itemCol: String): DataFrame = {
    val pairs = lineitem
      .select(col("l_orderkey").as("ok"), col(itemCol).as("x"))
      .groupBy(col("ok"))
      .agg(sort_array(collect_set(col("x"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(xs) - 2), i ->
             transform(sequence(i + 1, size(xs) - 1), j ->
               struct(xs[i] AS src, xs[j] AS dst))))""")).as("p"))
      .select(col("p.src").as("src"), col("p.dst").as("dst"))
      .distinct()
      .localCheckpoint()
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
    // Establish the src partitioning ONCE (guide §2.4): the degree agg
    // reuses it with no exchange, the deg attachment joins in place
    // (deg's node-sized slice is the SHUFFLE-HASH build, so the edge
    // stream is never sorted), and — because the checkpoint preserves
    // the join's output partitioning — every round's rank join
    // exchanges only the node-sized rank table, never the edges.
    val e = edges.repartition(col("src")).localCheckpoint()
    val deg = e.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // (src, dst, deg(src)) — constant across rounds, computed once
    val withDeg = e
      .join(deg.select(col("node").as("src"), col("deg"))
        .hint("shuffle_hash"), Seq("src"))
      .localCheckpoint()
    var rank = deg.select(col("node"), lit(scale).as("pr"))
    (1 to iters).foreach { _ =>
      // both divisions are integral DIV (Spark's / on longs is float
      // division — never in the rank path)
      rank = withDeg
        .join(rank.select(col("node").as("src"), col("pr"))
          .hint("shuffle_hash"), Seq("src"))
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

  /** Per-node triangle counts + clustering coefficient (integer basis
    * points — the determinism discipline of [[pageRank]]) via
    * DEGREE-ORDERED edge orientation: every undirected edge is directed
    * from its (deg, id)-smaller endpoint to the larger, wedges are
    * enumerated only at each triangle's degree-MINIMAL corner, and the
    * closing edge is verified with one equi-join against the undirected
    * edge list. Each triangle is generated exactly once.
    *
    * Scale: orientation is what makes this survive skew — a celebrity
    * node of degree d contributes wedges only from its LOW-degree
    * in-neighbors, bounding total wedge count by O(m^1.5) (arboricity
    * bound) instead of Σ d² ≈ d_max² of the naive neighborhood
    * self-join. All joins are equi hash joins on node ids; nothing
    * materializes a full neighborhood in memory. cc_bp = (10000·2·tri)
    * DIV (deg·(deg−1)) is exact integer arithmetic, so the oracle (which
    * brute-forces triangles by id order — different algorithm) hash-
    * matches bit-for-bit.
    */
  /** One row per distinct triangle (v = the (deg, id)-minimal corner) —
    * the shared core of the exact census and the sampled estimator.
    *
    * In-neighbor adjacency arrays (in-neighbors = the (deg, id)-smaller
    * endpoints pointing at this node): a triangle {v,u,w} with v its
    * degree-minimal corner is exactly a v in ins(u) ∩ ins(w) for the
    * undirected closing edge (u, w) — so intersecting two bounded
    * arrays per edge replaces the wedge self-join. MEASURED (sf0.1,
    * part graph, 1.2M edges / 41M wedges / 1.9M triangles): the
    * wedge-materializing join ran 30-50 s because all 41M candidate
    * rows crossed two exchanges; this form ships 1.2M edge rows
    * carrying degree-bounded arrays and explodes only the 1.9M actual
    * triangles — 3-7 s, on par with a vectorized single-node engine.
    * Per-row work stays linear in the two array lengths (hash-set
    * intersect), so total work keeps the same Σ-degree-products bound
    * as wedge enumeration — without materializing it through a shuffle.
    */
  private[graft] def triangleRows(edges: DataFrame,
      maxInDegree: Int = 1 << 16): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // undirected once (src < dst), then orient by (deg, id). The degree
    // table is node-sized; joining it SHUFFLE-HASH (build = deg's
    // partition slice, a few bytes per node) spares the sort-merge's
    // sort of the edge-sized stream on both keys (guide §3.1) — the
    // edge stream is only ever hash-exchanged, never ordered.
    val und = edges.where(col("src") < col("dst"))
      .join(deg.select(col("node").as("src"), col("deg").as("sd"))
        .hint("shuffle_hash"), Seq("src"))
      .join(deg.select(col("node").as("dst"), col("deg").as("dd"))
        .hint("shuffle_hash"), Seq("dst"))
    val srcIsLo = col("sd") < col("dd") ||
      (col("sd") === col("dd") && col("src") < col("dst"))
    val oriented = und.select(
      when(srcIsLo, col("src")).otherwise(col("dst")).as("lo"),
      when(srcIsLo, col("dst")).otherwise(col("src")).as("hi"))
    // the degree-ordered orientation bounds every in-neighbor array by
    // O(√m) arboricity — but at 100 TB that is an ASSUMPTION about the
    // graph; make it OBSERVABLE: any array past `maxInDegree` raises a
    // named error (the row that would have OOMed an executor instead
    // names the hub node and its in-degree), results byte-identical
    // whenever the bound holds
    val inAdj = oriented.groupBy(col("hi").as("node"))
      .agg(sort_array(collect_list(col("lo"))).as("ins"))
      .withColumn("ins", expr(
        s"""CASE WHEN size(ins) <= $maxInDegree THEN ins
            ELSE raise_error(concat('graft.Graphs.triangleRows: oriented ',
              'in-degree ', cast(size(ins) AS STRING), ' at node ',
              cast(node AS STRING), ' exceeds the $maxInDegree cap — ',
              'the arboricity bound no longer holds on this graph'))
            END"""))
    // the closing joins attach each endpoint's in-neighbor array to the
    // undirected edge stream — build side = inAdj's partition slice (the
    // arboricity-bounded arrays the operator already assumes fit a
    // task), so SHUFFLE-HASH again spares sorting the edge stream twice
    edges.where(col("src") < col("dst"))
      .select(col("src").as("u"), col("dst").as("w"))
      .join(inAdj.select(col("node").as("u"), col("ins").as("iu"))
        .hint("shuffle_hash"), Seq("u"))
      .join(inAdj.select(col("node").as("w"), col("ins").as("iw"))
        .hint("shuffle_hash"), Seq("w"))
      .select(col("u"), col("w"),
        explode(array_intersect(col("iu"), col("iw"))).as("v"))
  }

  def triangleStats(edges: DataFrame): DataFrame = {
    val deg = edges.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // one pass over the triangle rows: each contributes its 3 corners
    val perNode = triangleRows(edges)
      .select(explode(array(col("v"), col("u"), col("w"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(perNode, Seq("node"), "left")
      .select(col("node"), col("deg"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
      .withColumn("cc_bp",
        when(col("deg") > 1,
          expr("(10000 * 2 * triangles) DIV (deg * (deg - 1))"))
          .otherwise(lit(0L)))
  }

  /** The part co-occurrence graph ("bought together"): an undirected
    * edge links two parts appearing in the SAME order. Same bounded
    * pair explosion as [[coSupplierEdges]] — but where the supplier
    * projection is DENSE (any two of the few suppliers co-occur
    * somewhere, so that graph approaches completeness and triangle
    * work is inherently quadratic in it), the part projection stays
    * SPARSE at every scale (the part universe grows with the corpus:
    * ~0.5% of possible edges at sf0.1), which is what makes triangle
    * and neighborhood analytics on it scale-safe.
    */
  def coPartEdges(lineitem: DataFrame): DataFrame =
    coOccurrenceEdges(lineitem, "l_partkey")

  /** Registered query: triangle census of the part co-occurrence graph
    * (the "frequently bought together" triad analysis).
    */
  def coPartTriangles(lineitem: DataFrame): DataFrame =
    triangleStats(coPartEdges(lineitem))

  /** DOULION-style sampled triangle count (Tsourakakis et al., KDD'09):
    * keep each undirected edge by a DETERMINISTIC md5 coin with
    * probability 1/mod, count triangles in the sampled subgraph, scale
    * by mod³ (a triangle survives iff all three edges do). The
    * deterministic coin makes the ESTIMATE itself engine-replayable —
    * the oracle computes the identical number, so the estimator is
    * hash-matched, not rows-only (the sketch-twin discipline applied to
    * graphs). At 100 TB this is the census you run first: 1/mod of the
    * edges, ~1/mod³ of the intersection work, one number out.
    */
  def triangleCountSampled(edges: DataFrame, mod: Int = 4): DataFrame = {
    val coin = expr(
      "cast(conv(substring(md5(cast(concat(cast(src as string), '_', " +
        s"cast(dst as string)) as binary)), 1, 8), 16, 10) as bigint) % $mod")
    val und = edges.where(col("src") < col("dst")).where(coin === 0)
    val sym = und.unionByName(
      und.select(col("dst").as("src"), col("src").as("dst")))
    val scale = mod.toLong * mod * mod
    triangleRows(sym)
      .agg((count(lit(1)) * lit(scale)).as("est_triangles"))
      .crossJoin(broadcast(
        und.agg(count(lit(1)).as("n_sampled_edges"))))
      .select(col("n_sampled_edges"), col("est_triangles"))
  }

  /** Accuracy contract for [[triangleCountSampled]]: the exact census
    * total beside the estimate, error in integer basis points, and the
    * bound verdict — all engine-exact, so estimator drift flips the
    * hash red (measured: 144 bp at sf0.01, 12 bp at sf0.1, bound 2000).
    */
  def triangleSampledBound(
      edges: DataFrame, mod: Int = 4, maxErrBp: Long = 2000L): DataFrame = {
    val exact = triangleStats(edges)
      .agg(expr("sum(triangles) DIV 3").as("exact_triangles"))
    exact.crossJoin(broadcast(
        triangleCountSampled(edges, mod).select(col("est_triangles"))))
      .withColumn("err_bp",
        expr("(10000 * abs(est_triangles - exact_triangles)) " +
          "DIV exact_triangles"))
      .withColumn("within_bound", col("err_bp") <= maxErrBp)
  }

  /** Fixed-round frontier BFS: exact hop distance from a seed set,
    * capped at `rounds` (unreached nodes are absent, dist is INT).
    * Classic frontier expansion — each round joins ONLY the newest
    * frontier (nodes first reached last round) against the edge list,
    * merges by min-distance, and checkpoints to cut the growing lineage
    * (the bounded-rounds discipline of [[pageRank]] and the dedup CC:
    * job count is known at plan time, never convergence-driven).
    *
    * Scale: per round one edge-sized equi join against a frontier that
    * is at most node-sized, one node-sized min-agg; distances fit the
    * visited table, never the edge list. K rounds = K bounded shuffles.
    */
  def bfsHops(edges: DataFrame, seeds: DataFrame, rounds: Int): DataFrame = {
    // Hash-partition the edge list by src ONCE and checkpoint: the
    // pre-r18 loop re-shuffled (and re-sorted) the full edge list in
    // EVERY round's frontier join; the checkpoint preserves the
    // partitioning, so each round now exchanges only the node-sized
    // frontier (guide §2.4 — one partitioning established once), and the
    // frontier side is the SHUFFLE-HASH build (node-sized per
    // partition), so the edge stream is never sorted either.
    val e = edges.repartition(col("src")).localCheckpoint()
    var dist = seeds.select(col("node"), lit(0).as("dist"))
      .localCheckpoint()
    (1 to rounds).foreach { i =>
      val frontier = dist.where(col("dist") === i - 1)
      val expanded = frontier.hint("shuffle_hash")
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node"), lit(i).as("dist"))
      dist = dist.unionByName(expanded)
        .groupBy("node").agg(min(col("dist")).as("dist"))
        .localCheckpoint()
    }
    dist
  }

  /** Registered query: 3-hop BFS over the part co-occurrence graph
    * seeded at one brand's parts — the affinity neighborhood expansion
    * (the dense co-supplier graph saturates in one hop; the sparse part
    * graph has real layers).
    */
  def coPartBfs(lineitem: DataFrame, part: DataFrame): DataFrame =
    bfsHops(
      coPartEdges(lineitem),
      part.where(col("p_brand") === "Brand#11")
        .select(col("p_partkey").as("node")),
      rounds = 3)

  /** Fixed-round k-core peel: `rounds` rounds of "drop every node whose
    * current degree < k", then the surviving subgraph's nodes with their
    * in-core degrees. The k-core (maximal subgraph of min-degree ≥ k) is
    * the fixpoint of this peel; a FIXED round count keeps the job count
    * known at plan time (the [[bfsHops]]/[[pageRank]] discipline) and
    * makes the intermediate states engine-exact — the oracle unrolls the
    * identical rounds, so the hash matches even mid-cascade. The
    * registered query's (k=80, 6 rounds) is MEASURED converged on the
    * part graph at both harness scale factors (sf0.01: 1903→…→1857
    * stable; sf0.1: 19154→…→18863 stable — a real multi-round cascade,
    * not a one-shot filter; spec-pinned that round 7 changes nothing).
    *
    * Scale: per round ONE edge-sized map-side-combinable degree agg and
    * two semi-joins against the node-sized survivor list (broadcast
    * while node count allows; Spark's size-based planning falls back to
    * a shuffle semi-join when the node set outgrows the threshold — both
    * are linear). The edge list shrinks monotonically, so round cost
    * only ever goes down; each round is lineage-cut.
    *
    * INPUT CONTRACT: `edges` must be SYMMETRIZED (both (u,v) and (v,u)
    * present, as [[coPartEdges]] emits) — degree is computed from the
    * src side alone, so an asymmetric edge list silently yields wrong
    * degrees and a wrong core. Symmetrize via union with the swapped
    * projection before calling if the source list is directed.
    */
  def kCore(edges: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = edges.localCheckpoint()
    (1 to rounds).foreach { _ =>
      val keep = e.groupBy(col("src").as("node"))
        .agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k)
        .select("node")
        .localCheckpoint()
      e = e.join(keep.select(col("node").as("src")), Seq("src"), "left_semi")
        .join(keep.select(col("node").as("dst")), Seq("dst"), "left_semi")
        .localCheckpoint()
    }
    e.groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
  }

  /** Registered query: the 80-core of the part co-occurrence graph —
    * the "stable affinity backbone" (nodes whose co-purchase
    * neighborhood survives iterated pruning of weakly-connected parts).
    */
  def coPartKCore(lineitem: DataFrame): DataFrame =
    kCore(coPartEdges(lineitem), k = 80, rounds = 6)
}
