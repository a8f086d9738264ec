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

  test("triangles: hand-walked square-with-diagonal incl. degree tie") {
    // square 1-2-3-4-1 plus diagonal 1-3: triangles {1,2,3} and {1,3,4};
    // the diagonal's endpoints tie on degree (3 = 3) so orientation
    // falls back to id order — the tie-break path is exercised
    val up = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
    val got = Graphs.triangleStats(edges).collect()
      .map(r => r.getAs[Long]("node") ->
        ((r.getAs[Long]("deg"), r.getAs[Long]("triangles"),
          r.getAs[Long]("cc_bp")))).toMap
    assert(got === Map(
      1L -> ((3L, 2L, 6666L)), // 2 of 3 possible: 40000 DIV 6
      2L -> ((2L, 1L, 10000L)),
      3L -> ((3L, 2L, 6666L)),
      4L -> ((2L, 1L, 10000L))))
  }

  test("triangles: the arboricity bound is observable — a hub past the " +
    "cap raises a named error instead of silently growing an array") {
    // square-with-diagonal: max oriented in-degree is 3 (node 3 receives
    // 1, 2 AND 4 after (deg, id) orientation — (3,4) orients 4→3 since
    // deg(4) < deg(3)) — cap 3 passes byte-identical, cap 1 raises with
    // the hub node named
    val up = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L), (1L, 3L))
    val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
    val ok = Graphs.triangleRows(edges, maxInDegree = 3).collect()
    val free = Graphs.triangleRows(edges).collect()
    assert(ok.map(_.toString).sorted.toSeq === free.map(_.toString).sorted.toSeq)
    val e = intercept[Exception] {
      Graphs.triangleRows(edges, maxInDegree = 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      if (t == null) Seq.empty
      else Option(t.getMessage).toSeq ++ msgs(t.getCause)
    assert(msgs(e).exists(_.contains("exceeds the 1 cap")),
      msgs(e).mkString(" | "))
  }

  test("triangles: brute-force equivalence on seeded random graphs") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val up = (1 to 40).map { _ =>
        val a = rnd.nextInt(12).toLong; val b = rnd.nextInt(12).toLong
        (math.min(a, b), math.max(a, b))
      }.filter(p => p._1 != p._2).distinct
      val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
      val got = Graphs.triangleStats(edges).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("triangles")).toMap
      val upSet = up.toSet
      val nodes = up.flatMap(p => Seq(p._1, p._2)).distinct
      val tris = for {
        x <- nodes; y <- nodes if x < y && upSet((x, y))
        z <- nodes if y < z && upSet((y, z)) && upSet((x, z))
      } yield (x, y, z)
      val exp = nodes.map(n =>
        n -> tris.count(t => t._1 == n || t._2 == n || t._3 == n).toLong).toMap
      assert(got === exp, s"seed $seed")
    }
  }

  test("bfs: exact hop layers on a path, cap honored, isolated seed kept") {
    // path 1-2-3-4-5; seed {1} plus isolated node 9 (no edges at all)
    val up = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
    val seeds = Seq(1L, 9L).toDF("node")
    val got = Graphs.bfsHops(edges, seeds, rounds = 3).collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Int]("dist")).toMap
    // node 5 is 4 hops out — absent under the 3-round cap; the isolated
    // seed is distance 0 by definition
    assert(got === Map(1L -> 0, 2L -> 1, 3L -> 2, 4L -> 3, 9L -> 0))
  }

  test("k-core: the peel cascades — removing leaves exposes new leaves") {
    // triangle 1-2-3 with a chain 3-4-5 hanging off it: the 2-core is
    // exactly the triangle, but node 4 only drops once 5 (deg 1) is
    // gone — one round is NOT enough, which is what the test pins
    val up = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
    def core(rounds: Int) = Graphs.kCore(edges, k = 2, rounds = rounds)
      .collect().map(r =>
        r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
    // round 1 removed only node 5; node 4 still present at deg 1
    assert(core(1) === Map(1L -> 2L, 2L -> 2L, 3L -> 3L, 4L -> 1L))
    // round 2 reaches the fixpoint: the bare triangle
    val fix = Map(1L -> 2L, 2L -> 2L, 3L -> 2L)
    assert(core(2) === fix)
    // converged: extra rounds change nothing
    assert(core(3) === fix)
  }

  test("k-core: seeded random graphs match a brute-force peel") {
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 3) {
      val n = 12
      val up = (for {
        a <- 0L until n.toLong; b <- (a + 1) until n.toLong
        if rnd.nextDouble() < 0.35
      } yield (a, b)).toSeq
      val edges = (up ++ up.map(_.swap)).toDF("src", "dst")
      val k = 3
      // brute: peel to the true fixpoint
      var es = up.toSet
      var changed = true
      while (changed) {
        val deg = (es.toSeq.flatMap(e => Seq(e._1, e._2)))
          .groupBy(identity).view.mapValues(_.size).toMap
        val keep = deg.filter(_._2 >= k).keySet
        val next = es.filter(e => keep(e._1) && keep(e._2))
        changed = next != es
        es = next
      }
      val exp = es.toSeq.flatMap(e => Seq(e._1, e._2))
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      // n rounds always suffice to converge on n nodes
      val got = Graphs.kCore(edges, k, rounds = n.toInt).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("core_deg")).toMap
      assert(got === exp, s"trial $trial")
    }
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
