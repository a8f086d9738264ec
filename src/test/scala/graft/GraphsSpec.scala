package graft

import graft.operators.Graphs

/** Integer PageRank semantics on hand-walked fixtures: exact per-round
  * values on a path graph, and the co-supplier edge derivation's
  * distinct/symmetry contract.
  */
class GraphsSpec extends GraftSpec {
  import spark.implicits._

  test("pagerank: two hand-walked rounds on a path graph, exact integers") {
    // path 1—2—3 (symmetric): deg 1,2,1
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L))
      .toDF("src", "dst")
    def ranks(iters: Int): Map[Long, Long] =
      Graphs.pageRank(edges, iters).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("pr")).toMap
    // round 1: ends get 150000 + 85%·(1000000 DIV 2); the middle gets
    // 150000 + 85%·(1000000 + 1000000)
    assert(ranks(1) === Map(1L -> 575000L, 2L -> 1850000L, 3L -> 575000L))
    // round 2 walks the round-1 values through the same formula
    assert(ranks(2) === Map(1L -> 936250L, 2L -> 1127500L, 3L -> 936250L))
  }

  test("co-supplier edges: per-order pairs, deduped across orders, symmetric") {
    val li = Seq(
      (10L, 1L), (10L, 2L), (10L, 3L), // order 10: suppliers 1,2,3
      (11L, 1L), (11L, 2L),            // order 11 repeats the 1-2 pair
      (11L, 1L),                       // duplicate line: same order+supplier
      (12L, 9L)                        // singleton order: no edges
    ).toDF("l_orderkey", "l_suppkey")
    val got = Graphs.coSupplierEdges(li).collect()
      .map(r => (r.getAs[Long]("src"), r.getAs[Long]("dst"))).toSet
    assert(got === Set(
      (1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 3L), (3L, 2L)))
  }
}
