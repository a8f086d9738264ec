package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Frequent-itemset / association-rule mining over order→item baskets
  * (extension surface — market-basket analytics; the reference demo has
  * no mining operators, `/root/reference` README.md:1-40 scopes the demo
  * to windowed tick aggregation). All rule metrics are INTEGER basis
  * points computed with `DIV` — the determinism discipline of
  * [[Graphs.pageRank]] — so the DuckDB oracle hash-matches bit-for-bit.
  * Minimum support is a FRACTION (basis points), never an absolute
  * count: an absolute threshold silently changes meaning as the corpus
  * grows (measured here: part-level triples ≥ 2 finds 12 itemsets at
  * sf0.01 and ZERO at sf0.1, because the item universe grows with the
  * corpus — a bp threshold reports the same density at every scale).
  *
  * Scale design: the only corpus-sized shuffles are (a) the distinct
  * (basket, item) projection and (b) the pair/triple-count aggregation
  * whose input is bounded by Σ C(basket_size, r) — lines-per-order ≤ 7
  * in the TPC-H shape, so the explosion is per-basket-bounded, never
  * corpus-quadratic (the [[Graphs.coPartEdges]] bound). Item supports
  * are item-universe-sized and broadcast back onto the pair table; the
  * basket total rides the scalar-broadcast idiom. Nothing all-pairs,
  * nothing driver-side.
  */
object Mining {

  /** Distinct (basket, item) at PART granularity — the sparse
    * projection (item universe grows with the corpus). Checkpointed
    * once because supports, pair counts, and the basket total all
    * re-read it (identical subtrees get no runtime exchange reuse — the
    * [[Graphs.coPartEdges]] lineage-cut discipline).
    */
  def partBaskets(lineitem: DataFrame): DataFrame =
    lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("item"))
      .distinct()
      .localCheckpoint()

  /** Distinct (basket, item) at BRAND granularity — the dense rollup
    * projection (fixed item universe, so co-occurrence density is
    * scale-stable). The brand lookup is a broadcast dimension join.
    */
  def brandBaskets(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem.select(col("l_orderkey").as("ok"), col("l_partkey"))
      .join(broadcast(part.select(col("p_partkey").as("l_partkey"),
        col("p_brand").as("item"))), Seq("l_partkey"))
      .select(col("ok"), col("item"))
      .distinct()
      .localCheckpoint()

  /** Association rules over item PAIRS: for every unordered pair with
    * co-occurrence ≥ `minPairCount`, both items' supports, the pair
    * support, and the classic rule metrics — support, confidence in both
    * directions, lift — in exact integer basis points:
    *
    *   support_bp  = 10000·n_ab DIV n_baskets
    *   conf_ab_bp  = 10000·n_ab DIV n_a          (a ⇒ b)
    *   conf_ba_bp  = 10000·n_ab DIV n_b          (b ⇒ a)
    *   lift_bp     = 10000·n_ab·n_baskets DIV (n_a·n_b)
    *
    * lift > 10000 bp means the pair co-occurs more than independence
    * predicts — the actual mining signal ("frequently bought together").
    * The count floor here is the CANDIDATE cut (≥ 2 just drops the
    * singleton noise floor); rule selection happens downstream on the
    * bp metrics.
    */
  def assocRules(baskets: DataFrame, minPairCount: Long = 2L): DataFrame = {
    val op = baskets
    // pair enumeration rides per-basket arrays (≤7 items/basket bounds
    // C(k,2)) off ONE basket-keyed agg — the pre-r18 ok-keyed self-join
    // paid a sort-merge join plus an extra exchange for the same
    // explosion (the Graphs.coOccurrenceEdges move; guide §2.4)
    val pairs = basketCombos2(op)
      .groupBy(col("p.item_a").as("item_a"), col("p.item_b").as("item_b"))
      .agg(count(lit(1)).as("n_ab"))
      .where(col("n_ab") >= minPairCount)
    val sup = op.groupBy(col("item")).agg(count(lit(1)).as("n"))
    pairs
      .join(broadcast(sup.select(col("item").as("item_a"), col("n").as("n_a"))),
        Seq("item_a"))
      .join(broadcast(sup.select(col("item").as("item_b"), col("n").as("n_b"))),
        Seq("item_b"))
      .crossJoin(broadcast(op.agg(count_distinct(col("ok")).as("n_baskets"))))
      .select(col("item_a"), col("item_b"), col("n_a"), col("n_b"),
        col("n_ab"), col("n_baskets"),
        expr("(10000 * n_ab) DIV n_baskets").as("support_bp"),
        expr("(10000 * n_ab) DIV n_a").as("conf_ab_bp"),
        expr("(10000 * n_ab) DIV n_b").as("conf_ba_bp"),
        expr("(10000 * n_ab * n_baskets) DIV (n_a * n_b)").as("lift_bp"))
  }

  /** Level-3 Apriori: frequent TRIPLES at `minSupportBp`, with the
    * levelwise candidate prune — a triple can only be frequent if all
    * three of its pairs are, so baskets are semi-joined down to items
    * appearing in ANY frequent pair BEFORE the 3-way explosion. The
    * prune is provably lossless (monotonicity of support), so the
    * unpruned oracle counts the same rows. On a sparse projection
    * ([[partBaskets]]) the prune collapses most of each basket and is
    * what keeps level 3 affordable; on a dense rollup projection
    * ([[brandBaskets]]) it keeps everything — structurally present,
    * honestly a no-op there. The prune side is a BROADCAST semi-join
    * (candidate items ≤ item universe); the count is one
    * map-side-combinable agg over the per-basket-bounded explosion.
    */
  def frequentTriples(baskets: DataFrame, minSupportBp: Long = 30L): DataFrame = {
    val op = baskets
    val nBaskets = broadcast(op.agg(count_distinct(col("ok")).as("n_baskets")))
    // level-2 counts off per-basket arrays (see assocRules) — no
    // self-join
    val freqPairs = basketCombos2(op)
      .groupBy(col("p.item_a").as("pa"), col("p.item_b").as("pb"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(nBaskets)
      .where(expr(s"(10000 * n) DIV n_baskets >= $minSupportBp"))
      .localCheckpoint() // small (frequent pairs only); feeds the prune
    val candidateItems = freqPairs.select(col("pa").as("item"))
      .unionByName(freqPairs.select(col("pb").as("item")))
      .distinct()
    val pruned = op.join(broadcast(candidateItems), Seq("item"), "left_semi")
    // level-3 explosion likewise rides the (pruned) per-basket arrays:
    // C(k,3) ≤ 35 rows per basket replaces the pre-r18 THREE-table
    // ok-keyed self-join (two sort-merge joins over the basket stream)
    pruned
      .groupBy(col("ok"))
      .agg(sort_array(collect_list(col("item"))).as("xs"))
      .filter(size(col("xs")) >= 3)
      .select(explode(expr(
        """flatten(flatten(transform(sequence(0, size(xs) - 3), i ->
             transform(sequence(i + 1, size(xs) - 2), j ->
               transform(sequence(j + 1, size(xs) - 1), k ->
                 struct(xs[i] AS item_a, xs[j] AS item_b,
                        xs[k] AS item_c))))))""")).as("t"))
      .groupBy(col("t.item_a").as("item_a"), col("t.item_b").as("item_b"),
        col("t.item_c").as("item_c"))
      .agg(count(lit(1)).as("n_abc"))
      .crossJoin(nBaskets)
      .withColumn("support_bp", expr("(10000 * n_abc) DIV n_baskets"))
      .where(col("support_bp") >= minSupportBp)
  }

  /** Ordered item pairs within each basket, exploded from one
    * basket-keyed agg: `p.item_a < p.item_b` by the sorted-array
    * construction (baskets are distinct (ok, item), so collect_list has
    * no duplicates and sort_array gives strict order). One exchange —
    * the pre-r18 ok-keyed self-join paid a second one plus the
    * sort-merge machinery for the identical C(k,2) explosion.
    */
  private def basketCombos2(op: DataFrame): DataFrame =
    op.groupBy(col("ok"))
      .agg(sort_array(collect_list(col("item"))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(xs) - 2), i ->
             transform(sequence(i + 1, size(xs) - 1), j ->
               struct(xs[i] AS item_a, xs[j] AS item_b))))""")).as("p"))
}
