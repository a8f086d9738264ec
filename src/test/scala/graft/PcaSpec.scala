package graft

import graft.operators.Pca

class PcaSpec extends GraftSpec {
  import spark.implicits._

  test("jacobi: analytic eigenpairs of a hand-built symmetric matrix") {
    // [[2,1],[1,2]] has eigenvalues 3 (vector (1,1)/√2) and 1 ((1,-1)/√2)
    val (vals, vecs) = Pca.jacobiEigen(
      Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(vals(0) - 3.0) < 1e-12)
    assert(math.abs(vals(1) - 1.0) < 1e-12)
    val r = 1.0 / math.sqrt(2.0)
    assert(vecs(0).zip(Array(r, r)).forall(p => math.abs(p._1 - p._2) < 1e-12))
    // sign convention: largest-|component| entry positive
    assert(vecs(1)(0) > 0 || vecs(1)(1) > 0)
    assert(math.abs(math.abs(vecs(1)(0)) - r) < 1e-12)
  }

  test("jacobi: diagonal matrix is already solved, order by value desc") {
    val (vals, vecs) = Pca.jacobiEigen(Array(
      Array(1.0, 0.0, 0.0), Array(0.0, 5.0, 0.0), Array(0.0, 0.0, 3.0)))
    assert(vals.toSeq === Seq(5.0, 3.0, 1.0))
    assert(vecs(0).toSeq === Seq(0.0, 1.0, 0.0))
    assert(vecs(2).toSeq === Seq(1.0, 0.0, 0.0))
  }

  // 40 points on a line through 4-space (direction (3,4,0,0)/5, offsets
  // -19.5..19.5 scaled 0.01) plus tiny orthogonal jitter in dim 2:
  // the top-1 PC is the line direction, capturing nearly everything.
  private def lineEmb = {
    val rows = (0 until 40).map { m =>
      val t = (m - 19.5) * 0.01
      val jit = (m % 3 - 1) * 0.0001
      (m.toLong, Array(0.6f * t.toFloat, 0.8f * t.toFloat, jit.toFloat, 0.0f))
    }
    rows.toDF("vec_id", "embedding")
  }

  test("projection: top-1 PC of a planted line recovers it") {
    val proj = Pca.pcaProject(lineEmb, k = 1).collect()
      .map(r => r.getAs[Long]("vec_id") -> r.getAs[Long]("pc_0")).toMap
    // projected coordinate is the (centered) position along the line:
    // for row m it is (m − 19.5)·0.01 in 1e4-quantized units = (m−19.5)·100
    (0 until 40).foreach { m =>
      val want = ((m - 19.5) * 100.0).round
      assert(math.abs(proj(m.toLong) - want) <= 2, s"m=$m got ${proj(m.toLong)}")
    }
  }

  test("bound: the planted line passes a tight captured floor; " +
    "random-direction data cannot") {
    val row = Pca.pcaBound(lineEmb, k = 1, minCapturedBp = 9900L).head()
    assert(row.getAs[Boolean]("captured_ok"))
    assert(row.getAs[Boolean]("orthonormal_ok"))
    assert(row.getAs[Long]("n_vectors") === 40L)
    // same data, absurd floor — the boolean actually discriminates
    val bad = Pca.pcaBound(lineEmb, k = 1, minCapturedBp = 10001L).head()
    assert(!bad.getAs[Boolean]("captured_ok"))
  }

  test("determinism: projection is identical under repartitioning") {
    val a = Pca.pcaProject(lineEmb, k = 2).orderBy("vec_id").collect().toSeq
    val b = Pca.pcaProject(lineEmb.repartition(7), k = 2)
      .orderBy("vec_id").collect().toSeq
    assert(a === b)
  }

  test("planted fixture: top-8 of 16 dims captures ≥ 90% — the accept " +
    "verdict the near-random corpus can never emit") {
    val row = Pca.pcaBound(PlantedFixture.embDf(spark), k = 8,
      minCapturedBp = 9000L).head()
    assert(row.getAs[Boolean]("captured_ok"))
    assert(row.getAs[Boolean]("orthonormal_ok"))
    assert(row.getAs[Long]("n_vectors") === 96L)
  }

  test("moments merged: split-then-add equals a JVM brute force") {
    val rows = lineEmb.collect()
      .map(r => r.getAs[Seq[Float]]("embedding").toArray)
    def quant(x: Float): Long = math.floor(x.toDouble * 10000 + 0.5).toLong
    val d = rows.head.length
    val brute = (for {
      i <- 0 until d; j <- i until d
    } yield (i, j) -> (
      rows.map(v => quant(v(i)) * quant(v(j))).sum,
      rows.length.toLong,
      if (i == j) rows.map(v => quant(v(i))).sum else 0L)).toMap
    val got = Pca.momentsMerged(lineEmb).collect()
      .map(r => (r.getAs[Int]("i"), r.getAs[Int]("j")) ->
        ((r.getAs[Long]("g"), r.getAs[Long]("n_pairs"),
          r.getAs[Long]("s_diag")))).toMap
    assert(got.keySet === brute.keySet)
    brute.foreach { case (k, (g, n, s)) =>
      assert(got(k) === ((g, n, s)), s"cell $k") }
  }

  test("harness corpus: captured stays above the k/d floor and the " +
    "whole-plan projection has no shuffle") {
    val emb = Tables.load(spark, sf, "embeddings")
    val row = Pca.pcaBound(emb, k = 8, minCapturedBp = 1250L).head()
    assert(row.getAs[Boolean]("captured_ok"))
    assert(row.getAs[Boolean]("orthonormal_ok"))
    val proj = Pca.pcaProject(emb, k = 8)
    val p = proj.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), p) // scan-side: literal basis, HOF fold
  }
}
