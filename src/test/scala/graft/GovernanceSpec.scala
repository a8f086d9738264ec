package graft

import graft.operators.Governance
import java.sql.Timestamp

class GovernanceSpec extends GraftSpec {
  import spark.implicits._

  test("snapshot diff: all four statuses, counted per source") {
    val base = Seq(
      (1L, "alpha", "s1"), (2L, "beta", "s1"), (3L, "gamma", "s2"),
      (4L, "delta", "s2")
    ).toDF("doc_id", "text", "source")
    val cur = Seq(
      (1L, "alpha", "s1"),          // unchanged
      (2L, "beta prime", "s1"),     // changed
      (3L, "Gamma  ", "s2"),        // unchanged — fp normalizes case/space
      (5L, "epsilon", "s2")         // added; 4 removed
    ).toDF("doc_id", "text", "source")
    val got = Governance.snapshotDiff(base, cur)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got === Map(
      ("s1", "unchanged") -> 1L, ("s1", "changed") -> 1L,
      ("s2", "unchanged") -> 1L, ("s2", "added") -> 1L,
      ("s2", "removed") -> 1L))
  }

  test("key skew: counts, deterministic rank, floor basis points") {
    // 10 rows: key 7 ×5, key 3 ×3, keys 1,2 ×1 — shares 5000/3000/1000 bp
    val rows = (Seq.fill(5)(7L) ++ Seq.fill(3)(3L) ++ Seq(1L, 2L))
      .map(k => (k, "x")).toDF("k", "pad")
    val got = Governance.keySkew(rows, "k", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getLong(3))).toSet
    assert(got === Set((7L, 5L, 1, 5000L), (3L, 3L, 2, 3000L), (1L, 1L, 3, 1000L)))
    // ties break by key ascending: with k=4 the second 1-count key appears
    val got4 = Governance.keySkew(rows, "k", 4)
      .collect().map(r => (r.getLong(0), r.getInt(2))).toSet
    assert(got4.contains((1L, 3)) && got4.contains((2L, 4)))
  }

  test("column profile: nulls, distincts, and type-stable rendering") {
    val rows = Seq(
      (Some(1L), Some(1.005), Some("b"), Some(Timestamp.valueOf("2020-01-02 10:30:00"))),
      (Some(2L), Some(2.5), None, Some(Timestamp.valueOf("2020-01-03 01:00:00"))),
      (None, Some(2.5), Some("a"), None)
    ).toDF("id", "qty", "flag", "ts")
    val got = Governance.profileColumns(rows, Seq("id", "qty", "flag", "ts"))
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    assert(got("id") === ((1L, 2L, "1", "2")))
    // doubles render through DECIMAL(18,2): 1.005 rounds HALF_UP to 1.01
    assert(got("qty") === ((0L, 2L, "1.01", "2.50")))
    assert(got("flag") === ((1L, 2L, "a", "b")))
    // timestamps render as their DATE — min/max commute with the cast
    assert(got("ts") === ((1L, 2L, "2020-01-02", "2020-01-03")))
  }

  test("snapshot drift histogram: exact bucket counts and cross-multiplied contrast") {
    // base: sizes 10,60,60 (buckets 0,1,1); current: 10,110,110,110
    // (buckets 0,2,2,2) — the shape shifts up a bucket
    val base = Seq((1L, 10L), (2L, 60L), (3L, 60L)).toDF("doc_id", "n_chars")
    val cur = Seq((1L, 10L), (4L, 110L), (5L, 110L), (6L, 110L))
      .toDF("doc_id", "n_chars")
    val got = Governance.snapshotDriftHist(base, cur, "n_chars")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // totals: base 3, cur 4; contrast = n_cur*3 - n_base*4
    assert(got === Map(
      0L -> ((1L, 1L, 1L * 3 - 1L * 4)),
      1L -> ((2L, 0L, 0L * 3 - 2L * 4)),
      2L -> ((0L, 3L, 3L * 3 - 0L * 4))))
  }

  test("fk orphans: violations counted per edge, duplicate parent keys don't inflate") {
    val child = Seq((1L, 10L), (2L, 10L), (3L, 11L), (4L, 99L), (5L, 98L))
      .toDF("id", "fk")
    // parent key 10 appears TWICE: the distinct collapse must keep the
    // left join 1:1 so n_rows stays 5, not 7
    val parent = Seq(10L, 10L, 11L, 12L).toDF("pk")
    val clean = Seq((1L, 12L)).toDF("id", "fk")
    val got = Governance.fkOrphans(Seq(
        ("child->parent", child, "fk", parent, "pk"),
        ("clean->parent", clean, "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === Map(
      "child->parent" -> ((5L, 2L)), // keys 99, 98 are orphans
      "clean->parent" -> ((1L, 0L))))
  }

  test("release manifest: order-free checksum, flips on any content change") {
    val docs = Seq(
      (1L, "alpha beta", "s1", 10L), (2L, "gamma", "s1", 5L),
      (3L, "delta", "s2", 5L)).toDF("doc_id", "text", "source", "n_chars")
    def manifest(df: org.apache.spark.sql.DataFrame) =
      Governance.releaseManifest(df).collect()
        .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
        .toMap
    val m = manifest(docs)
    // brute-force the xor: md5 of the canonical text, high 15 hex digits
    def term(t: String): Long = {
      val canon = t.trim.toLowerCase.replaceAll("\\s+", " ")
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(canon.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
    }
    assert(m("s1") === ((2L, 15L, term("alpha beta") ^ term("gamma"))))
    assert(m("s2") === ((1L, 5L, term("delta"))))
    // row order cannot move the checksum (xor commutes/associates)
    assert(manifest(docs.orderBy(org.apache.spark.sql.functions.desc("doc_id"))) === m)
    // one changed doc flips its source's checksum, counts catch size moves
    val changed = Seq(
      (1L, "alpha beta", "s1", 10L), (2L, "gamma PRIME", "s1", 11L),
      (3L, "delta", "s2", 5L)).toDF("doc_id", "text", "source", "n_chars")
    val mc = manifest(changed)
    assert(mc("s1")._3 !== m("s1")._3)
    assert(mc("s2") === m("s2"))
  }

  test("approx profiler: same nulls/min/max as exact; HLL exact at tiny cardinality; bound all-true") {
    val rows = Seq(
      (Some(1L), Some(1.005), Some("b"), Some(Timestamp.valueOf("2020-01-02 10:30:00"))),
      (Some(2L), Some(2.5), None, Some(Timestamp.valueOf("2020-01-03 01:00:00"))),
      (None, Some(2.5), Some("a"), None)
    ).toDF("id", "qty", "flag", "ts")
    val cols = Seq("id", "qty", "flag", "ts")
    val exact = Governance.profileColumns(rows, cols)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    val approx = Governance.profileColumnsApprox(rows, cols)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))).toMap
    // HLL++ is exact in its small-cardinality (sparse) regime, and
    // nulls/min/max share the render rule — the whole row must agree
    assert(approx === exact)
    val bound = Governance.profileColumnsApproxBound(rows, cols)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    assert(bound.length === 4 && bound.forall(_._3), bound.mkString(", "))
  }

  test("approx profiler plan: ONE scan, zero exchanges — vs one scan per column exact") {
    val li = Tables.load(spark, sf, "lineitem")
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val p = Governance.profileColumnsApprox(li, cols)
      .queryExecution.executedPlan.toString
    assert("Scan parquet".r.findAllIn(p).size === 1, p)
    assert(!p.contains("Exchange hashpartitioning"), p)
    // no Expand either: the sketch aggregate must not trigger the
    // multi-distinct dual-path rewrite the exact profiler avoids by
    // splitting into per-column scans
    assert(!p.contains("Expand"), p)
  }

  test("expectations: every constraint kind counts its violations exactly") {
    // adversarial fixture: one violation of each kind, planted
    val rows = Seq[(java.lang.Long, java.lang.Long, String, java.lang.Double)](
      (1L, 10L, "O", 5.0),
      (2L, null, "P", 0.0), // null custkey, bad status, non-positive price
      (2L, 11L, "F", 3.0)   // duplicate key 2
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    val checks = Seq(
      Governance.Expectation("custkey_not_null", "not_null",
        org.apache.spark.sql.functions.col("o_custkey").isNull),
      Governance.Expectation("status_in_o_f", "accepted_values",
        !org.apache.spark.sql.functions.col("o_orderstatus").isin("O", "F")),
      Governance.Expectation("price_positive", "range",
        !(org.apache.spark.sql.functions.col("o_totalprice") > 0.0)))
    val got = Governance.checkTable("t", rows, checks, Seq("o_orderkey"))
      .collect()
      .map(r => r.getAs[String]("check_name") ->
        ((r.getAs[Long]("violations"), r.getAs[Boolean]("passed")))).toMap
    assert(got === Map(
      "custkey_not_null" -> ((1L, false)),
      "status_in_o_f" -> ((1L, false)),
      "price_positive" -> ((1L, false)),
      "o_orderkey_unique" -> ((1L, false))))
    // referential counts orphan ROWS (both copies of key 3), and the
    // verdict goes green when the battery holds
    val facts = Seq(1L, 2L, 3L, 3L).toDF("fk")
    val parents = Seq(1L, 2L).toDF("pk")
    val ref = Governance.checkReferential("t", "fk_in_parent",
      facts, "fk", parents, "pk").collect().head
    assert(ref.getAs[Long]("violations") === 2L)
    assert(!ref.getAs[Boolean]("passed"))
    val clean = Governance.checkTable("t", rows,
      Seq(Governance.Expectation("key_not_null", "not_null",
        org.apache.spark.sql.functions.col("o_orderkey").isNull)))
      .collect().head
    assert(clean.getAs[Long]("violations") === 0L)
    assert(clean.getAs[Boolean]("passed"))
  }

  test("key skew plan: corpus scanned once, totals broadcast back") {
    val li = Tables.load(spark, sf, "lineitem")
    val df = Governance.keySkew(li, "l_partkey", 15)
    val p = df.queryExecution.executedPlan.toString
    // the key-count table is checkpointed: the parquet scan must not
    // appear in the final plan at all (lineage cut), and the grand total
    // joins back as a broadcast, never a shuffle
    assert(!p.contains("FileScan"), p)
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("join-cardinality estimate: MCV corrects what uniform misses") {
    // keys: a x4, b x3, c x2, d x1 -> true self-join size 16+9+4+1 = 30
    val rows = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).toDF("k")
    val r = Governance.joinCardinalityEstimate(rows, "k", topN = 2).head()
    assert(r.getAs[Long]("ndv") === 4L)
    assert(r.getAs[Long]("total_rows") === 10L)
    assert(r.getAs[Long]("actual_rows") === 30L)
    // uniform: 100 DIV 4 = 25 (err 1666 bp); MCV keeps a,b exactly and
    // models {c,d} as 3²/2 = 4: est 29 (err 333 bp)
    assert(r.getAs[Long]("est_uniform") === 25L)
    assert(r.getAs[Long]("est_mcv") === 29L)
    assert(r.getAs[Long]("err_uniform_bp") === 1666L)
    assert(r.getAs[Long]("err_mcv_bp") === 333L)
  }

  test("range estimate: equals a JVM brute force of the same integer " +
    "model, and the histogram beats min-max on skewed data") {
    val rnd = new scala.util.Random(11)
    for (trial <- 1 to 3) {
      val values = Seq.fill(200)(math.pow(rnd.nextDouble(), 3) * 500.0)
      val df = values.toDF("value")
      val (lo, hi, bk) = (5000L, 30000L, 10)
      val got = Governance.rangeSelectivityEstimate(df, "value", lo, hi, bk)
        .head()
      val v = values.map(x => math.floor(x * 100).toLong)
      val (mn, mx, n) = (v.min, v.max, v.size.toLong)
      val qx = v.map(x => (x - mn) * 65536 / (mx - mn + 1))
      val hist = qx.groupBy(identity).view.mapValues(_.size.toLong)
        .toSeq.sortBy(_._1)
      val cum = hist.scanLeft((0L, 0L, 0L)) {
        case ((_, _, c), (q, cn)) => (q, cn, c + cn) }.drop(1)
      def pick(rk: Long): Long =
        cum.find { case (_, cn, c) => c >= rk && c - cn < rk }.get._1
      val cks = 0L +: (1 to bk).map(k => pick((k * n + bk - 1) / bk) + 1)
      var est = 0L
      (1 to bk).foreach { k =>
        val d = (k * n + bk - 1) / bk - ((k - 1) * n + bk - 1) / bk
        val (cp, ck) = (cks(k - 1), cks(k))
        val frac =
          if (ck - cp > 0)
            10000L * math.max(0L, math.min(hi, ck) - math.max(lo, cp)) /
              (ck - cp)
          else if (cp - 1 >= lo && cp - 1 < hi) 10000L else 0L
        est += d * frac
      }
      est /= 10000
      val actual = qx.count(x => x >= lo && x < hi).toLong
      assert(got.getAs[Long]("est_hist") === est, s"trial $trial")
      assert(got.getAs[Long]("actual_rows") === actual, s"trial $trial")
      assert(got.getAs[Long]("err_hist_bp") <= got.getAs[Long]("err_minmax_bp"),
        s"trial $trial: hist ${got.getAs[Long]("err_hist_bp")} vs " +
          s"minmax ${got.getAs[Long]("err_minmax_bp")}")
    }
  }

  test("join estimate: ndv == topN degenerate — every key an MCV, " +
    "remainder term 0, never 0 DIV 0") {
    val rows = (Seq.fill(4)("a") ++ Seq.fill(3)("b") ++
      Seq.fill(2)("c") ++ Seq("d")).toDF("k")
    val r = Governance.joinCardinalityEstimate(rows, "k", topN = 4).head()
    // all 4 keys kept exactly -> the estimate IS the truth
    assert(r.getAs[Long]("est_mcv") === 30L)
    assert(r.getAs[Long]("err_mcv_bp") === 0L)
  }

  // heavy point mass: 80x1.0 collapses ranks 25/50/75 into grid cell 0,
  // so buckets 2 and 3 get zero-width spans [1, 1) — the degenerate case
  // the histogram artifact and the range model must both survive
  private def pointMassValues =
    (Seq.fill(80)(1.0) ++ Seq.fill(10)(2.0) ++ Seq.fill(10)(3.0))
      .toDF("value")

  test("equi-depth histogram: collapsed buckets are emitted with " +
    "actual_rows = 0 and a guarded err_bp, never silently dropped") {
    val got = Governance.equiDepthHistogram(pointMassValues, "value", 4)
      .collect().map(r => r.getAs[Int]("k") ->
        ((r.getAs[Long]("lo"), r.getAs[Long]("hi"),
          r.getAs[Long]("actual_rows"), r.getAs[Long]("err_bp")))).toMap
    assert(got.size === 4, s"all 4 buckets present: $got")
    // zero-width buckets: span [1, 1), 0 actual rows, err = 10000 * model
    assert(got(2) === ((1L, 1L, 0L, 250000L)))
    assert(got(3) === ((1L, 1L, 0L, 250000L)))
    assert(got(1)._3 === 80L)
    assert(got(4)._3 === 20L)
  }

  test("range estimate: a collapsed bucket's mass sits at grid cell " +
    "cprev - 1 — counted at [0,1), not double-counted at [1,2)") {
    // [0, 1): bucket 1 fully inside (d=25) + both collapsed buckets'
    // point mass at cell 0 (25 + 25) -> est 75 vs actual 80
    val r0 = Governance.rangeSelectivityEstimate(
      pointMassValues, "value", loQ = 0L, hiQ = 1L, buckets = 4).head()
    assert(r0.getAs[Long]("est_hist") === 75L)
    assert(r0.getAs[Long]("actual_rows") === 80L)
    // [1, 2): nothing lives there; the pre-fix model charged both
    // collapsed buckets (cprev = 1) here -> 50 phantom rows
    val r1 = Governance.rangeSelectivityEstimate(
      pointMassValues, "value", loQ = 1L, hiQ = 2L, buckets = 4).head()
    assert(r1.getAs[Long]("est_hist") === 0L)
    assert(r1.getAs[Long]("actual_rows") === 0L)
  }

  // customers: QI = (nation, seg, floor(bal/1000)).
  //   (1, A, 0.0..999) x3  -> class of 3 (risky at k=5)
  //   (1, A, 1000+)    x5  -> class of 5 (safe)
  //   (2, B, 0..)      x1  -> class of 1 (risky)
  //   (2, A, -500)     x1  -> bal_kb = -1 (floor, not trunc-toward-zero)
  private def kAnonCustomers = {
    val rows =
      Seq.fill(3)((1, "A", 500.0)) ++ Seq.fill(5)((1, "A", 1500.0)) ++
        Seq((2, "B", 10.0), (2, "A", -500.0))
    rows.zipWithIndex.map { case ((n, s, b), i) =>
      (i.toLong, n, s, b)
    }.toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
  }

  test("k-anonymity histogram: class sizes, record mass, risky verdict") {
    val got = Governance.kAnonymityHistogram(kAnonCustomers, k = 5)
      .collect()
      .map(r => r.getAs[Long]("class_size") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_records"),
          r.getAs[Boolean]("risky")))).toMap
    assert(got === Map(
      3L -> ((1L, 3L, true)),
      5L -> ((1L, 5L, false)),
      1L -> ((2L, 2L, true))))
  }

  test("k-anonymity ladder: rollup levels, risk shrinks walking up") {
    val got = Governance.kAnonymityLadder(kAnonCustomers, k = 5)
      .collect()
      .map(r => r.getAs[Long]("gid") ->
        ((r.getAs[Long]("n_classes"), r.getAs[Long]("n_records"),
          r.getAs[Long]("n_risky_classes"), r.getAs[Long]("n_risky_records"),
          r.getAs[Long]("risk_bp")))).toMap
    // gid 0: classes {3,5,1,1} -> risky 3 classes / 5 records
    assert(got(0L) === ((4L, 10L, 3L, 5L, 5000L)))
    // gid 1 (bal generalized): (1,A)x8 (2,B)x1 (2,A)x1 -> risky 2/2
    assert(got(1L) === ((3L, 10L, 2L, 2L, 2000L)))
    // gid 3 (nation only): 1x8, 2x2 -> risky 1 class / 2 records
    assert(got(3L) === ((2L, 10L, 1L, 2L, 2000L)))
    // gid 7 (fully generalized): one class of 10, safe
    assert(got(7L) === ((1L, 10L, 0L, 0L, 0L)))
    // every level partitions ALL records; risk is monotone non-increasing
    assert(got.values.forall(_._2 == 10L))
    val walk = Seq(got(0L), got(1L), got(3L), got(7L)).map(_._4)
    assert(walk.zip(walk.tail).forall { case (hi, lo) => lo <= hi })
  }

  test("k-anonymity ladder plan: one corpus scan, Expand carries the " +
    "rollup — adding a generalization level is never another pass") {
    val df = Governance.kAnonymityLadder(
      Tables.load(spark, sf, "customer"))
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("Expand"), p)
    assert("FileScan parquet".r.findAllIn(p).size === 1, p)
  }
}
