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
