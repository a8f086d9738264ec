package graft

import graft.operators.Dimensions

/** SCD Type-2 semantics on hand fixtures: same-day collapse, no-op
  * suppression, effective-date chaining, and the temporal fact join's
  * exactly-one-version matching (boundaries inclusive on eff_from,
  * exclusive on eff_to, open current version).
  */
class DimensionsSpec extends GraftSpec {
  import spark.implicits._

  private def d(s: String) = ts(s + " 00:00:00")

  // customer 1: two same-day events (max orderkey wins), a no-op update,
  // then a real change; customer 2: a single open version
  private def orders = Seq(
    (1L, 1L, "A", d("1995-01-01")),
    (2L, 1L, "B", d("1995-01-01")), // same day, higher key → B survives
    (3L, 1L, "B", d("1995-03-01")), // no-op update → suppressed
    (4L, 1L, "C", d("1995-06-01")), // real change → version 2
    (5L, 2L, "X", d("1995-02-01"))
  ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")

  test("scd2 build: same-day collapse, no-op suppression, effective chaining") {
    val got = Dimensions.scd2Dim(orders).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Int]("version_no"),
        r.getAs[String]("tier"), r.getAs[java.sql.Timestamp]("eff_from"),
        Option(r.getAs[java.sql.Timestamp]("eff_to")))).toSet
    assert(got === Set(
      // version 1 runs to the next CHANGE day (the 03-01 no-op left no
      // version boundary), version 2 is the open current version
      (1L, 1, "B", d("1995-01-01"), Some(d("1995-06-01"))),
      (1L, 2, "C", d("1995-06-01"), None),
      (2L, 1, "X", d("1995-02-01"), None)))
  }

  test("scd2 snapshot: exactly the version in force at the as-of date") {
    val got = Dimensions.scd2Snapshot(orders, "1995-03-15").collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Int]("version_no"),
        r.getAs[String]("tier"))).toSet
    // cust 1 is still on version 1 (the change lands 06-01); cust 2's
    // open version qualifies; nothing else exists yet
    assert(got === Set((1L, 1, "B"), (2L, 1, "X")))
  }

  test("scd2 merge: incremental tail equals the from-scratch rebuild") {
    // base feed (pre-cutoff): cust 1 has two versions, cust 2 one open
    val base = orders
    // delta feed (post-cutoff): cust 1 gets a no-op then a real change
    // (the no-op must be suppressed ACROSS the old/new boundary); cust 3
    // is brand new with its own internal no-op and a second version
    val delta = Seq(
      (10L, 1L, "C", d("1996-02-01")), // no-op vs the open C → suppressed
      (11L, 1L, "D", d("1996-03-01")), // real change → version 3
      (12L, 3L, "P", d("1996-02-01")),
      (13L, 3L, "P", d("1996-03-01")), // internal no-op
      (14L, 3L, "Q", d("1996-04-01"))
    ).toDF("o_orderkey", "o_custkey", "o_orderpriority", "o_orderdate")

    val dim = Dimensions.scd2Dim(base)
    val merged = Dimensions.scd2Merge(dim, delta).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Int]("version_no"),
        r.getAs[String]("tier"), r.getAs[java.sql.Timestamp]("eff_from"),
        Option(r.getAs[java.sql.Timestamp]("eff_to")))).toSet
    assert(merged === Set(
      (1L, 1, "B", d("1995-01-01"), Some(d("1995-06-01"))), // carried
      (1L, 2, "C", d("1995-06-01"), Some(d("1996-03-01"))), // re-closed
      (1L, 3, "D", d("1996-03-01"), None),
      (2L, 1, "X", d("1995-02-01"), None),                  // untouched
      (3L, 1, "P", d("1996-02-01"), Some(d("1996-04-01"))),
      (3L, 2, "Q", d("1996-04-01"), None)))

    // the merge theorem at spec scale: incremental ≡ rebuild
    val rebuilt = Dimensions.scd2Dim(base.unionByName(delta)).collect()
      .map(r => (r.getAs[Long]("custkey"), r.getAs[Int]("version_no"),
        r.getAs[String]("tier"), r.getAs[java.sql.Timestamp]("eff_from"),
        Option(r.getAs[java.sql.Timestamp]("eff_to")))).toSet
    assert(merged === rebuilt)
  }

  test("scd2 fact join: each fact priced under the version at its ship date") {
    // facts reach the dimension through their order's customer; ship
    // dates probe mid-interval, the inclusive eff_from boundary, the
    // exclusive eff_to boundary, and the open current version
    val lineitem = Seq(
      (1L, 100.0, 0.0, d("1995-02-15")), // cust 1 mid-interval → B
      (2L, 200.0, 0.5, d("1995-01-01")), // eff_from day itself → B
      (3L, 400.0, 0.0, d("1995-06-01")), // eff_to day → NEXT version C
      (4L, 800.0, 0.0, d("1996-01-01")), // open current version → C
      (5L, 1600.0, 0.0, d("1995-07-01")) // cust 2's single version → X
    ).toDF("l_orderkey", "l_extendedprice", "l_discount", "l_shipdate")
    val got = Dimensions.scd2FactJoin(orders, lineitem).collect()
      .map(r => (r.getAs[String]("tier"), r.getAs[Int]("yr"),
        r.getAs[Long]("n_items"), r.getAs[Double]("revenue"))).toSet
    assert(got === Set(
      ("B", 1995, 2L, 200.0), // 100 + 200·(1−0.5)
      ("C", 1995, 1L, 400.0),
      ("C", 1996, 1L, 800.0),
      ("X", 1995, 1L, 1600.0)))
  }
}
