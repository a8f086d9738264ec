package graft

import graft.operators.Mining

class MiningSpec extends GraftSpec {
  import spark.implicits._

  // 5 baskets over items 1..4:
  //   b1 {1,2,3}, b2 {1,2}, b3 {1,2,4}, b4 {3,4}, b5 {1}
  // supports: n1=4 n2=3 n3=2 n4=2; pairs: (1,2)x3 (1,3)x1 (2,3)x1
  // (1,4)x1 (2,4)x1 (3,4)x1
  private def baskets =
    Seq((1L, 1L), (1L, 2L), (1L, 3L),
        (2L, 1L), (2L, 2L),
        (3L, 1L), (3L, 2L), (3L, 4L),
        (4L, 3L), (4L, 4L),
        (5L, 1L)).toDF("ok", "item").localCheckpoint()

  test("assoc rules: support, both confidences, lift — exact integer bp") {
    val got = Mining.assocRules(baskets, minPairCount = 2L).collect()
    assert(got.length === 1) // only (1,2) reaches count 2
    val r = got.head
    assert(r.getAs[Long]("item_a") === 1L && r.getAs[Long]("item_b") === 2L)
    assert(r.getAs[Long]("n_a") === 4L && r.getAs[Long]("n_b") === 3L)
    assert(r.getAs[Long]("n_ab") === 3L && r.getAs[Long]("n_baskets") === 5L)
    assert(r.getAs[Long]("support_bp") === 6000L)   // 3/5
    assert(r.getAs[Long]("conf_ab_bp") === 7500L)   // 3/4
    assert(r.getAs[Long]("conf_ba_bp") === 10000L)  // 3/3
    // lift = 10000*3*5 / (4*3) = 12500 — co-occur above independence
    assert(r.getAs[Long]("lift_bp") === 12500L)
  }

  test("assoc rules: a basket never pairs an item with itself, and " +
    "duplicate lines collapse before pairing") {
    // raw lineitem shape: duplicate (order, part) lines must not inflate
    val li = Seq((1L, 10L), (1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
      .toDF("l_orderkey", "l_partkey")
    val got = Mining.assocRules(Mining.partBaskets(li), minPairCount = 2L)
      .collect()
    assert(got.length === 1)
    assert(got.head.getAs[Long]("n_ab") === 2L) // (10,20) in both baskets
    assert(got.head.getAs[Long]("n_a") === 2L)  // dup line counted once
  }

  test("frequent triples: bp threshold + Apriori prune is lossless on a " +
    "sparse fixture where the prune really collapses baskets") {
    // 10 baskets; {1,2,3} appears in 4 of them (support 4000 bp);
    // items 8, 9 appear once each inside big baskets — the frequent-pair
    // prune removes them before the 3-way explosion.
    val rows =
      Seq(1L -> Seq(1L, 2L, 3L, 8L), 2L -> Seq(1L, 2L, 3L, 9L),
          3L -> Seq(1L, 2L, 3L), 4L -> Seq(1L, 2L, 3L),
          5L -> Seq(4L), 6L -> Seq(5L), 7L -> Seq(6L), 8L -> Seq(7L),
          9L -> Seq(4L, 5L), 10L -> Seq(6L, 7L))
        .flatMap { case (ok, items) => items.map(ok -> _) }
        .toDF("ok", "item").localCheckpoint()
    val got = Mining.frequentTriples(rows, minSupportBp = 3000L).collect()
    assert(got.length === 1)
    val r = got.head
    assert((r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
      r.getAs[Long]("item_c")) === ((1L, 2L, 3L)))
    assert(r.getAs[Long]("n_abc") === 4L)
    assert(r.getAs[Long]("support_bp") === 4000L)
    // brute force over the same fixture: every triple at >= 3000 bp
    val items = rows.collect().map(x => (x.getLong(0), x.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = (for {
      trio <- items.values.flatMap(_.subsets(3)).map(_.toSeq.sorted)
    } yield trio).groupBy(identity).view.mapValues(_.size)
      .filter { case (_, n) => 10000L * n / 10 >= 3000L }.keys.toSet
    assert(brute === Set(Seq(1L, 2L, 3L)))
  }

  test("bp threshold is scale-free: doubling every basket keeps the " +
    "same frequent-triple set with the same support_bp") {
    val doubled = baskets.unionByName(
      baskets.select(($"ok" + 100L).as("ok"), $"item")).localCheckpoint()
    def trioSet(df: org.apache.spark.sql.DataFrame) =
      Mining.frequentTriples(df, minSupportBp = 2000L).collect()
        .map(r => (r.getAs[Long]("item_a"), r.getAs[Long]("item_b"),
          r.getAs[Long]("item_c"), r.getAs[Long]("support_bp"))).toSet
    val a = trioSet(baskets)
    assert(a === Set((1L, 2L, 3L, 2000L), (1L, 2L, 4L, 2000L)))
    assert(trioSet(doubled) === a)
  }
}
