package graft

import graft.operators.Similarity

class SimilaritySpec extends GraftSpec {

  test("quantized cosine top-k: self is top-1, recall vs float top-k reported") {
    val emb = Tables.load(spark, sf, "embeddings")
    val truth = graft.operators.Similarity.cosineTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = graft.operators.Similarity.cosineTopKQuantized(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3)))
    // every query's top hit is itself (cosine 1.0 survives quantization)
    got.filter(_._3 == 1).foreach { case (qid, vid, _) => assert(qid === vid) }
    val recall = (got.map(t => (t._1, t._2)).toSet & truth).size.toDouble / truth.size
    info(f"int8-cosine recall@10 = $recall%.3f vs float top-k")
    assert(recall >= 0.9, s"int8 quantization should barely move the top-k: $recall")
  }

  test("int8 quantization: codes bounded, round-trip error within scale/2") {
    val emb = Tables.load(spark, sf, "embeddings").limit(64)
    val vecs = emb.selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1)).toMap
    val rows = graft.operators.Similarity.quantizeInt8(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3)))
    assert(rows.length === vecs.map(_._2.size).sum, "one row per component")
    rows.foreach { case ((id, i), (q, scale)) =>
      assert(math.abs(q) <= 127, s"code out of int8 range: $q")
      val x = vecs(id)(i.toInt)
      if (scale > 0)
        assert(math.abs(x - q * scale) <= scale / 2 + 1e-12,
          s"dequant error beyond half a step at ($id, $i)")
      else assert(q === 0L)
    }
  }
  import spark.implicits._

  test("bitext mining: mutual-best only (hub dropped), margin = best − runner-up") {
    // a1 ≈ b1 strongly; a2's best is ALSO b1 (the hub case) but b1's best
    // is a1 — a2 must NOT pair. b2 pairs with a2 mutually. b3 is noise.
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)), // a1 (en)
      (2L, Array(0.6f, 0.8f, 0.0f)), // a2 (en)
      (11L, Array(0.9f, 0.1f, 0.0f)), // b1 (de): best a = a1
      (12L, Array(0.5f, 0.86f, 0.0f)), // b2 (de): best a = a2
      (13L, Array(0.0f, 0.0f, 1.0f)) // b3 (de): orthogonal noise
    ).toDF("vec_id", "embedding")
    val docs = Seq((1L, "en"), (2L, "en"), (11L, "de"), (12L, "de"), (13L, "de"))
      .toDF("doc_id", "lang")
    def cos(x: Array[Float], y: Array[Float]): Double = {
      // mirror the engine: per-term floor-scaled-long dot, exact norms
      val dot = x.zip(y).map { case (a, b) =>
        math.floor(a.toDouble * b.toDouble * 1e6 + 0.5).toLong }.sum
      def nrm(v: Array[Float]) = v.map(a =>
        math.floor(a.toDouble * a.toDouble * 1e6 + 0.5).toLong).sum
      dot.toDouble / math.sqrt(nrm(x).toDouble * nrm(y).toDouble)
    }
    val v = Map(1L -> Array(1.0f, 0.0f, 0.0f), 2L -> Array(0.6f, 0.8f, 0.0f),
      11L -> Array(0.9f, 0.1f, 0.0f), 12L -> Array(0.5f, 0.86f, 0.0f),
      13L -> Array(0.0f, 0.0f, 1.0f))
    val got = Similarity.bitextMine(docs, emb)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    assert(got.keySet === Set((1L, 11L), (2L, 12L)), got.keySet.toString)
    // a1: best b1, runner-up = max(cos(a1,b2), cos(a1,b3))
    val a1Scores = Seq(11L, 12L, 13L).map(b => cos(v(1L), v(b))).sorted.reverse
    assert(math.abs(got((1L, 11L))._1 - a1Scores.head) < 1e-12)
    assert(math.abs(got((1L, 11L))._2 - (a1Scores(0) - a1Scores(1))) < 1e-12)
  }

  test("planted fixture: clusters co-bucket by construction; gauges emit the accept verdict") {
    val emb = PlantedFixture.embDf(spark)
    val docs = PlantedFixture.docsDf(spark)
    // every member must land in its cluster base's bucket (the margin
    // argument realized): 8 clusters → exactly one bucket per cluster id
    val buckets = Similarity.lshBuckets(emb, 6, PlantedFixture.dim)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (c <- 0 until PlantedFixture.nClusters) {
      val ids = (0 until PlantedFixture.members)
        .map(m => (m * PlantedFixture.nClusters + c).toLong)
      assert(ids.map(buckets).distinct.size === 1,
        s"cluster $c split across buckets: ${ids.map(buckets).distinct}")
    }
    // bitext: all 8 planted pairs mined exactly AND through the blocker
    val r = Similarity.bitextRecall(docs, emb).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((8L, 8L, 8L, 10000L)))
    // the planted pairs are the (en_c, de_c) partners, cos ≈ 0.999
    val mined = Similarity.bitextMine(docs, emb).collect()
    assert(mined.map(x => (x.getLong(0), x.getLong(1))).toSet ===
      (0 until 8).map(c => (c.toLong, (8 + c).toLong)).toSet)
    mined.foreach(x => assert(x.getDouble(2) > 0.99, x.toString))
    // ANN: every query's exact top-10 is intra-cluster → LSH recall 1.0
    val rec = Similarity.annRecall(emb).collect()
    assert(rec.length === 8)
    rec.foreach(x => assert(x.getDouble(3) === 1.0, x.toString))
    // IVF contract too: the first-16 seed is two near-identical
    // centroids per cluster, so probes cover the query's whole cluster
    val recIvf = Similarity.annRecallIvf(emb, iters = 1, nProbe = 3).collect()
    assert(recIvf.length === 8)
    recIvf.foreach(x => assert(x.getDouble(3) === 1.0, x.toString))
    // and the SAME gauge on the near-random harness corpus stays low —
    // one gauge, both verdicts
    val rnd = Similarity.annRecall(Tables.load(spark, sf, "embeddings"))
      .agg(org.apache.spark.sql.functions.avg("recall")).head().getDouble(0)
    assert(rnd < 0.5, s"harness corpus unexpectedly clustered: $rnd")
  }

  test("bitext recall gauge equals the composed miners; blocked ⊆ same-bucket") {
    val docs = Tables.load(spark, sf, "documents")
    val emb = Tables.load(spark, sf, "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = pairs(Similarity.bitextMine(docs, emb))
    val blocked = pairs(Similarity.bitextMineBlocked(docs, emb))
    val r = Similarity.bitextRecall(docs, emb).head()
    assert(r.getLong(0) === exact.size.toLong)
    assert(r.getLong(1) === blocked.size.toLong)
    assert(r.getLong(2) === (exact & blocked).size.toLong)
    assert(r.getLong(3) ===
      (if (exact.isEmpty) 0L else (exact & blocked).size.toLong * 10000 / exact.size))
    // every blocked pair shares its LSH bucket by construction
    val buckets = Similarity.lshBuckets(emb).collect()
      .map(row => row.getLong(0) -> row.getLong(1)).toMap
    blocked.foreach { case (a, b) => assert(buckets(a) === buckets(b), s"($a,$b)") }
  }

  test("brute-force cosine: each query's top hit is itself with score 1.0") {
    val emb = Tables.load(spark, sf, "embeddings")
    val top1 = Similarity.cosineTopK(emb, nQueries = 4, k = 3)
      .filter($"rn" === 1).collect()
    assert(top1.length === 4)
    top1.foreach { r =>
      assert(r.getLong(0) === r.getLong(1), s"top-1 of ${r.getLong(0)} not itself")
      assert(r.getDouble(2) === 1.0)
    }
  }

  test("cosine scores are symmetric across the query/corpus roles") {
    val emb = Tables.load(spark, sf, "embeddings")
    val scores = Similarity.cosineTopK(emb, nQueries = 4, k = 50).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    for {
      ((q, v), s) <- scores if q != v && v < 4
      back <- scores.get((v, q))
    } assert(s === back, s"score($q,$v) != score($v,$q)")
  }

  test("ann lsh: bucketed results are a subset of brute-force candidates, top-1 self") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ann = Similarity.annLsh(emb, nQueries = 4, k = 10).collect()
    val annTop1 = ann.filter(_.getInt(3) == 1)
    assert(annTop1.nonEmpty)
    annTop1.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    // every (qid, vec) scored by ann must carry the same score brute force gives it
    val brute = Similarity.cosineTopK(emb, nQueries = 4, k = 2000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ann.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(brute(key) === r.getDouble(2), s"score mismatch at $key")
    }
  }

  test("ann ivf: top-1 is self, scores match brute force, recall reported") {
    val emb = Tables.load(spark, sf, "embeddings")
    val ivf = Similarity.annIvf(emb, nQueries = 8, k = 10).collect()
    ivf.filter(_.getInt(3) == 1).foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val brute = Similarity.cosineTopK(emb, nQueries = 8, k = 2000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) === r.getDouble(2))
    }
    val truth = Similarity.cosineTopK(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = ivf.map(r => (r.getLong(0), r.getLong(1))).toSet
    info(f"ann-ivf recall@10 = ${(got & truth).size.toDouble / truth.size}%.2f")
  }

  test("trained ivf: top-1 self, scores exact, recall >= first-N codebook") {
    val emb = Tables.load(spark, sf, "embeddings")
    val trained = Similarity.annIvfTrained(emb, nQueries = 8, k = 10).collect()
    trained.filter(_.getInt(3) == 1).foreach(r => assert(r.getLong(0) === r.getLong(1)))
    val brute = Similarity.cosineTopK(emb, nQueries = 8, k = 2000).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    trained.foreach { r =>
      assert(brute((r.getLong(0), r.getLong(1))) === r.getDouble(2))
    }
    val truth = Similarity.cosineTopK(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rTrained = (trained.map(r => (r.getLong(0), r.getLong(1))).toSet & truth)
      .size.toDouble / truth.size
    val standIn = Similarity.annIvf(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rStandIn = (standIn & truth).size.toDouble / truth.size
    info(f"trained-ivf(3-probe) recall@10 = $rTrained%.2f vs first-N $rStandIn%.2f")
    assert(rTrained >= rStandIn,
      f"trained 2-probe IVF must not lose recall: $rTrained%.2f < $rStandIn%.2f")
  }

  test("trained ivf codebook is reproducible and moves with the data") {
    val emb = Tables.load(spark, sf, "embeddings")
    val c1 = Similarity.ivfCentroidsTrained(emb, nCells = 16, iters = 2)
    val c2 = Similarity.ivfCentroidsTrained(emb, nCells = 16, iters = 2)
    assert(c1 === c2, "exact scaled-long update must be run-to-run identical")
    val init = Similarity.ivfCentroidsTrained(emb, nCells = 16, iters = 0)
    assert(c1 !== init, "two Lloyd rounds must move at least one centroid")
  }

  test("ann lsh recall@10 against brute force is reported and sane") {
    val emb = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.cosineTopK(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ann = Similarity.annLsh(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (ann & truth).size.toDouble / truth.size
    info(f"ann-lsh recall@10 = $recall%.2f (bits=6, ${truth.size} truth pairs)")
    assert(recall > 0.1) // 6-bit sign-LSH on random-ish vectors: self + near dups land together
  }

  test("lsh bucketing fails loudly on ragged or wrong-dim embeddings") {
    val ragged = Seq(
      (1L, Array(1.0f, 2.0f)),
      (2L, Array(1.0f, 2.0f, 3.0f))).toDF("vec_id", "embedding")
    // inferred path: the min/max validation rejects the ragged corpus
    intercept[IllegalArgumentException] { Similarity.lshBuckets(ragged) }
    // explicit-dim path: a wrong-length vector raises instead of silently
    // bucketing as if its tail were zero
    val two = Seq((1L, Array(1.0f, 2.0f))).toDF("vec_id", "embedding")
    val ex = intercept[Exception] {
      Similarity.lshBuckets(two, dim = 3).collect()
    }
    assert(ex.getMessage.contains("expected dim") ||
      Option(ex.getCause).exists(_.getMessage.contains("expected dim")), ex.toString)
    // explicit matching dim agrees with the inferred path
    val a = Similarity.lshBuckets(two).collect().map(r => (r.getLong(0), r.getLong(1)))
    val b = Similarity.lshBuckets(two, dim = 2).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(a.toSeq === b.toSeq)
  }

  test("multi-probe lsh strictly dominates single-probe recall") {
    val emb = Tables.load(spark, sf, "embeddings")
    val truth = Similarity.cosineTopK(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val single = Similarity.annLsh(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val multi = Similarity.annLshMultiProbe(emb, nQueries = 8, k = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rs = (single & truth).size.toDouble / truth.size
    val rm = (multi & truth).size.toDouble / truth.size
    info(f"multi-probe recall@10 = $rm%.2f vs single-probe $rs%.2f")
    assert(rm >= rs)
    // single-probe's candidate set is a subset of multi-probe's, so its
    // hits at full k can only be re-ranked away by better candidates
    assert(multi.nonEmpty)
  }

  test("semantic decontamination = cross-split slice of the near-dup pair graph") {
    // A (train, eval) leak is exactly an embedding near-dup pair with one
    // vector on each side of the md5-coin split: the unordered projection
    // of decontaminateSemantic must equal embeddingNearDupPairs filtered
    // to split-crossing pairs (same buckets, same exact-cosine threshold).
    val emb = Tables.load(spark, sf, "embeddings")
    def coin(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"s0:$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val got = Similarity.decontaminateSemantic(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    got.foreach { case (t, e) =>
      assert(coin(t) >= 10 && coin(e) < 10, s"split violated: ($t, $e)")
    }
    val expected = Similarity.embeddingNearDupPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
      .filter { case (a, b) => (coin(a) < 10) != (coin(b) < 10) }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    assert(got.map { case (t, e) =>
      (math.min(t, e), math.max(t, e)) }.toSet === expected)
  }

  test("semantic clusters equal the transitive closure of the pair graph") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.semanticClusters(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val n = emb.count()
    assert(got.values.sum === n, "clusters partition the corpus")
    // brute-force union-find over the collected pair graph
    val pairs = Similarity.embeddingNearDupPairs(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = emb.select("vec_id").collect().map(_.getLong(0))
    val exp = ids.groupBy(find).map { case (root, members) =>
      members.min -> members.length.toLong // min id IS the root by merge rule
    }
    assert(got === exp)
  }

  test("pq codes: brute-forced scaled-long argmin on the real corpus") {
    val emb = Tables.load(spark, sf, "embeddings")
    val raw = emb.selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def scl(x: Double): Long = math.floor(x * 1e6 + 0.5).toLong
    val cents = raw.filter(_._1 < 16).view.mapValues(_.map(scl)).toMap
    val got = Similarity.pqCodes(emb).collect().map { r =>
      r.getLong(0) -> ((0 until 8).map(s => r.getAs[Long](s"code_$s")),
        r.getAs[Long]("err"))
    }.toMap
    raw.foreach { case (id, v) =>
      val sv = v.map(scl)
      var err = 0L
      val codes = (0 until 8).map { s =>
        val byCent = cents.toSeq.map { case (c, cv) =>
          val d = (0 until 8).map { j =>
            val diff = sv(s * 8 + j) - cv(s * 8 + j); diff * diff
          }.sum
          (d, c)
        }.min // (distance, cent_id) lexicographic — the struct argmin
        err += byCent._1
        byCent._2
      }
      assert(got(id) === ((codes, err)), s"vec $id")
    }
    // the codebook vectors reconstruct themselves exactly
    (0L until 16L).foreach { c =>
      assert(got(c)._2 === 0L, s"centroid $c must have zero error")
    }
  }

  test("trained pq strictly reduces total reconstruction error") {
    val emb = Tables.load(spark, sf, "embeddings")
    def totalErr(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(org.apache.spark.sql.functions.sum("err")).head().getLong(0)
    val untrained = totalErr(Similarity.pqCodes(emb))
    val trained = totalErr(Similarity.pqCodesTrained(emb))
    // one Lloyd round moves every non-empty sub-centroid to its member
    // mean — the L2-optimal point for the assignment — so total error
    // must drop (strictly, on this corpus)
    assert(trained < untrained, s"trained $trained vs untrained $untrained")
  }

  test("l2 topk and pq-adc equal the brute-forced exact rankings") {
    val emb = Tables.load(spark, sf, "embeddings")
    val raw = emb.selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def scl(v: Array[Double]): Array[Long] =
      v.map(x => math.floor(x * 1e6 + 0.5).toLong)
    val sv = raw.view.mapValues(scl).toMap
    val cents = sv.filter(_._1 < 16)
    def l2(a: Array[Long], b: Array[Long]): Long =
      a.indices.map { i => val d = a(i) - b(i); d * d }.sum
    def topk(dists: Map[Long, Long]): Seq[(Long, Long, Long)] =
      dists.toSeq.sortBy { case (id, d) => (d, id) }.take(10).zipWithIndex
        .map { case ((id, d), i) => (id, d, i + 1L) }
    val queries = sv.keys.filter(_ < 8).toSeq
    // exact L2
    val gotL2 = Similarity.l2TopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    val expL2 = queries.flatMap { q =>
      topk(sv.view.mapValues(l2(sv(q), _)).toMap).map(t => (q, t._1, t._2, t._3))
    }
    assert(gotL2.toSet === expL2.toSet)
    // ADC = exact query vs PQ reconstruction
    def reconstruct(v: Array[Long]): Array[Long] = {
      val out = new Array[Long](v.length)
      for (s <- 0 until 8) {
        val code = cents.toSeq.map { case (c, cv) =>
          ((s * 8 until s * 8 + 8).map { i =>
            val d = v(i) - cv(i); d * d
          }.sum, c)
        }.min._2
        for (j <- 0 until 8) out(s * 8 + j) = cents(code)(s * 8 + j)
      }
      out
    }
    val recon = sv.view.mapValues(reconstruct).toMap
    val gotAdc = Similarity.annPqAdc(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    val expAdc = queries.flatMap { q =>
      topk(recon.view.mapValues(l2(sv(q), _)).toMap).map(t => (q, t._1, t._2, t._3))
    }
    assert(gotAdc.toSet === expAdc.toSet)
  }

  test("ivfadc: candidates confined to probed cells, persisted round trip exact") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Similarity.annIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    assert(got.nonEmpty)
    // every result's corpus vector must live in one of its query's 3
    // probed cells (the composition's whole point: no candidate outside
    // the coarse shortlist is ever ADC-scored)
    val ivfCents = Similarity.ivfCentroidsTrained(emb, 16, 1)
    val raw = emb.selectExpr("vec_id", "cast(embedding as array<double>) v")
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      def nrm(x: Array[Double]): Double =
        x.map(v => math.floor(v * v * 1e6 + 0.5)).sum
      a.indices.map(i => math.floor(a(i) * b(i) * 1e6 + 0.5)).sum /
        math.sqrt(nrm(a) * nrm(b))
    }
    def rankedCells(v: Array[Double]): Seq[Int] =
      ivfCents.map { case (j, cv) => (cos(v, cv.toArray), j) }
        .sortBy { case (s, j) => (-s, j) }.map(_._2)
    val cellOf = raw.view.mapValues(v => rankedCells(v).head).toMap
    got.foreach { case (qid, vid, _, _) =>
      val probes = rankedCells(raw(qid)).take(3).toSet
      assert(probes.contains(cellOf(vid)),
        s"q$qid result $vid sits in cell ${cellOf(vid)} outside probes $probes")
    }
    // the two-artifact write -> load -> search round trip is bit-exact
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_spec").toString
    Similarity.writeIvfPqIndex(emb, dir)
    val persisted = Similarity.annIvfPqPersisted(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    assert(persisted.toSet === got.toSet)
    // recall gate: the composed index must stay useful — on this corpus
    // 3/16 coarse pruning over trained-PQ codes holds recall@10 >= 0.25
    // (measured 0.3875 at sf0.01; structure-free embeddings are the worst
    // case for IVF pruning)
    val rec = Similarity.annRecallIvfPq(emb).collect()
    val mean = rec.map(_.getDouble(3)).sum / rec.length
    info(f"ivfadc recall@10 = $mean%.3f (nProbe=3/16, trained PQ)")
    assert(mean >= 0.25, f"ivfadc recall collapsed: $mean%.3f")
  }

  test("ivfadc re-rank: exact second stage dominates one-stage recall pointwise") {
    val emb = Tables.load(spark, sf, "embeddings")
    val one = Similarity.annRecallIvfPq(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    val two = Similarity.annRecallIvfPqRerank(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(two.keySet === one.keySet)
    // per query: every one-stage hit sits inside the 40-row shortlist,
    // and a true neighbor in the shortlist always survives the exact
    // re-rank (at most 9 others can beat it) — so domination is a
    // THEOREM here, not a tuning outcome
    one.foreach { case (q, r1) => assert(two(q) >= r1, s"q$q: ${two(q)} < $r1") }
    val m1 = one.values.sum / one.size
    val m2 = two.values.sum / two.size
    info(f"recall@10: one-stage $m1%.3f -> two-stage $m2%.3f (shortlist 40)")
    assert(m2 > m1, "re-rank bought no lift on the random corpus")
    // planted fixture: probes cover the query's cluster, the tight
    // cluster fills the shortlist's head, exact re-rank returns all 10
    val rec = Similarity
      .annRecallIvfPqRerank(PlantedFixture.embDf(spark)).collect()
    assert(rec.length === 8)
    rec.foreach(x => assert(x.getDouble(3) === 1.0, x.toString))
  }

  test("ivfadc append: frozen-codebook append equals one-shot union indexing") {
    import org.apache.spark.sql.functions.{col, max}
    val emb = Tables.load(spark, sf, "embeddings")
    val nAll = emb.count()
    val cut = (emb.agg(max(col("vec_id"))).head.getLong(0) + 1L) * 8L / 10L
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_app").toString
    // train + index the base 80% only
    Similarity.writeIvfPqIndexFull(emb.filter(col("vec_id") < cut), dir)
    val nBase = spark.read.parquet(s"$dir/postings").count()
    assert(nBase > 0 && nBase < nAll, s"split degenerate: $nBase of $nAll")
    // append the tail delta in TWO ingest batches against the FROZEN
    // codebooks — appends must be additive, never destructive
    val cut2 = (emb.agg(max(col("vec_id"))).head.getLong(0) + 1L) * 9L / 10L
    Similarity.appendIvfPqPostings(
      emb.filter(col("vec_id") >= cut && col("vec_id") < cut2), dir)
    Similarity.appendIvfPqPostings(emb.filter(col("vec_id") >= cut2), dir)
    assert(spark.read.parquet(s"$dir/postings").count() === nAll,
      "appends must extend the posting table to the full corpus")
    // the appended artifact search == the one-shot in-plan assignment of
    // the WHOLE corpus under the same loaded codebooks: assignment is a
    // pure per-row function of the frozen codebooks, so batch boundaries
    // cannot change a single posting
    val appended = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    val oneShot = Similarity.annIvfPqPersisted(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3).toLong))
    assert(appended.toSet === oneShot.toSet)
    assert(appended.nonEmpty)
  }

  test("ivfadc compact: one sorted file per cell, search and row set unchanged") {
    import org.apache.spark.sql.functions.{col, max}
    val emb = Tables.load(spark, sf, "embeddings")
    val top = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val (cut, mid) = (top * 8L / 10L, top * 9L / 10L)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_cmp").toString
    Similarity.writeIvfPqIndexFull(emb.filter(col("vec_id") < cut), dir)
    Similarity.appendIvfPqPostings(
      emb.filter(col("vec_id") >= cut && col("vec_id") < mid), dir)
    Similarity.appendIvfPqPostings(emb.filter(col("vec_id") >= mid), dir)
    def cellDirs = new java.io.File(s"$dir/postings").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
    def parquets(d: java.io.File) =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
    // fragmentation is real: at least one cell holds multiple file batches
    assert(cellDirs.exists(parquets(_).length > 1),
      s"fixture produced no fragmented cell: ${cellDirs.map(d =>
        d.getName -> parquets(d).length).mkString(", ")}")
    val before = spark.read.parquet(s"$dir/postings").collect()
      .map(_.toSeq).toSet
    val searchBefore = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    Similarity.compactIvfPqPostings(spark, dir)
    // compacted layout: exactly ONE parquet file per cell, no staging dir
    assert(cellDirs.nonEmpty)
    cellDirs.foreach(d => assert(parquets(d).length === 1,
      s"${d.getName} has ${parquets(d).length} files after compaction"))
    assert(!new java.io.File(s"$dir/postings_compacting").exists())
    // same rows, same search — compaction moved bytes, not data
    val after = spark.read.parquet(s"$dir/postings").collect()
      .map(_.toSeq).toSet
    assert(after === before)
    val searchAfter = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(searchAfter === searchBefore && searchAfter.nonEmpty)
  }

  test("filtered recall: truth and candidates confined to the allowed subset, " +
    "queries unrestricted") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
    val docs = Tables.load(spark, sf, "documents")
    val allowedIds = docs.filter(col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // the exact filtered truth: every neighbor allowed, full k per query
    val exact = Similarity.l2TopK(emb, k = 10,
      allowed = Some(docs.filter(col("lang") === "de")
        .select(col("doc_id").as("vec_id")))).collect()
    assert(exact.map(_.getAs[Long]("vec_id")).forall(allowedIds))
    assert(exact.groupBy(_.getAs[Long]("qid")).values.forall(_.length == 10))
    // query points include non-allowed ids (vec_id < 8 spans langs)
    assert(exact.map(_.getAs[Long]("qid")).distinct.length === 8)
    // the gauge: per-query recall well-formed against the filtered truth
    val g = Similarity.annRecallIvfPqFiltered(emb, docs).collect()
    assert(g.length === 8)
    g.foreach { r =>
      val (n, h) = (r.getAs[Long]("n_exact"), r.getAs[Long]("n_hit"))
      assert(n === 10L && h >= 0L && h <= n)
      assert(r.getAs[Double]("recall") === h.toDouble / n.toDouble)
    }
  }

  test("adaptive filtered search: results allowed-only and k-filled, " +
    "recall does not lose to the fixed probe") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
    val docs = Tables.load(spark, sf, "documents")
    val allowedIds = docs.filter(col("lang") === "de")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val res = Similarity.annIvfPqFilteredAdaptive(emb, docs).collect()
    assert(res.nonEmpty)
    assert(res.map(_.getAs[Long]("vec_id")).forall(allowedIds))
    // widening guarantees ≥ min(k, |allowed candidates probed|) — at this
    // corpus the allowed set far exceeds the shortlist, so k fills
    assert(res.groupBy(_.getAs[Long]("qid")).values.forall(_.length == 10))
    def mean(df: org.apache.spark.sql.DataFrame): Double = {
      val rs = df.collect(); rs.map(_.getAs[Double]("recall")).sum / rs.length
    }
    val fixed = mean(Similarity.annRecallIvfPqFiltered(emb, docs))
    val adaptive = mean(Similarity.annRecallIvfPqFilteredAdaptive(emb, docs))
    assert(adaptive >= fixed,
      s"widening + re-rank must not lose to the fixed probe: $adaptive vs $fixed")
  }

  test("adaptive filtered search: persisted-index serving is result-identical " +
    "to the in-plan-trained chain") {
    val emb = Tables.load(spark, sf, "embeddings")
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_adp").toString + "/index"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val inPlan = rows(Similarity.annIvfPqFilteredAdaptive(emb, docs))
    val persisted = rows(
      Similarity.annIvfPqFilteredAdaptivePersisted(emb, docs, dir))
    assert(persisted === inPlan && persisted.nonEmpty,
      "frozen-codebook serving must reproduce the in-plan-trained search")
  }

  test("rtbf purge: tombstoned ids never returned, appends cannot resurrect, " +
    "compact makes it physical and equals a rebuild from survivors") {
    import org.apache.spark.sql.functions.col
    val emb = Tables.load(spark, sf, "embeddings")
    val docs = Tables.load(spark, sf, "documents")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_purge").toString + "/index"
    Similarity.writeIvfPqIndexFull(emb, dir)
    val purged = emb.select(col("vec_id")).where(col("vec_id") % 10 === 3)
    val purgedIds = purged.collect().map(_.getLong(0)).toSet
    assert(purgedIds.nonEmpty)
    def searchIds(d: String) = Similarity.annIvfPqAppended(emb, d).collect()
      .map(_.getLong(1)).toSet
    // fixture sanity: purged ids ARE returned before the purge — top-1 is
    // self for every query, and qid 3 is purged, so the pin has teeth
    assert(searchIds(dir).exists(purgedIds), "fixture: no purged id in " +
      "pre-purge results — the never-returned pin would be vacuous")
    // (a) logically purged the moment the tombstone lands
    Similarity.purgeIvfPqPostings(spark, dir, purged)
    val afterPurge = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(afterPurge.nonEmpty &&
      !afterPurge.exists(t => purgedIds(t._2)))
    // every persisted serving path honors the tombstones
    assert(!Similarity.annIvfPqRerankPersisted(emb, dir).collect()
      .map(_.getLong(1)).exists(purgedIds))
    assert(!Similarity.annIvfPqFilteredAdaptivePersisted(emb, docs, dir)
      .collect().map(_.getLong(1)).exists(purgedIds))
    // (b) an append cannot resurrect a tombstoned id — even one that
    // re-ingests the purged vectors themselves
    Similarity.appendIvfPqPostings(
      emb.filter(col("vec_id") % 10 === 3), dir)
    assert(!searchIds(dir).exists(purgedIds),
      "append-after-purge resurrected a tombstoned id")
    // (c) compact = the physical half: postings lose the purged rows,
    // the tombstone set retires, and the artifact content equals a
    // rebuild that never saw the purged vectors (same frozen codebooks,
    // so assignment is identical row-for-row)
    val searchBefore = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    Similarity.compactIvfPqPostings(spark, dir)
    assert(!new java.io.File(s"$dir/tombstones").exists(),
      "compact must retire the folded tombstone set")
    // normalize column order: the artifact read appends the partition
    // column last, the in-plan assignment carries it second
    def normalized(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vec_id") +: col("cell").cast("int") +:
        (0 until 8).map(s => col(s"code_$s")): _*)
      .collect().map(_.toSeq).toSet
    val physical = normalized(Similarity.loadPostingsRaw(spark, dir))
    assert(!physical.exists(r => purgedIds(r.head.asInstanceOf[Long])),
      "purged rows survived the compact physically")
    val rebuilt = normalized(Similarity.assignPostings(
      emb.filter(col("vec_id") % 10 =!= 3), dir))
    assert(physical === rebuilt,
      "purge+compact must equal a rebuild from the surviving rows")
    assert(Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
      .toSet === searchBefore,
      "physical purge changed what the logical purge already served")
  }

  test("stream-maintained postings: folded window equals one-shot indexing, " +
    "replay and re-fold are no-ops") {
    import org.apache.spark.sql.functions.{col, max}
    val emb = Tables.load(spark, sf, "embeddings")
    val top = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val (cut, mid) = (top * 8L / 10L, top * 9L / 10L)
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_stream").toString
    val (dir, streamRoot) = (s"$root/index", s"$root/window")
    Similarity.writeIvfPqIndexFull(emb.filter(col("vec_id") < cut), dir)
    // two micro-batch maintenance slots, the second replayed (crash
    // semantics): the slot is mode=overwrite and assignment is a pure
    // function of the frozen codebooks, so the replay rewrites the
    // identical rows
    val b1 = emb.filter(col("vec_id") >= cut && col("vec_id") < mid)
    val b2 = emb.filter(col("vec_id") >= mid)
    graft.streaming.StreamingQueries.maintainAnnBatch(
      b1.toDF(), 0L, dir, streamRoot)
    graft.streaming.StreamingQueries.maintainAnnBatch(
      b2.toDF(), 1L, dir, streamRoot)
    val slot1 = spark.read.parquet(s"$streamRoot/batch=1").collect()
      .map(_.toSeq).toSet
    graft.streaming.StreamingQueries.maintainAnnBatch(
      b2.toDF(), 1L, dir, streamRoot) // replay
    assert(spark.read.parquet(s"$streamRoot/batch=1").collect()
      .map(_.toSeq).toSet === slot1, "replayed slot must be content-stable")
    // fold the window: the served artifact now covers base ∪ streamed,
    // row-identical to one-shot indexing under the same frozen codebooks
    Similarity.foldStreamPostings(spark, dir, streamRoot)
    assert(!new java.io.File(streamRoot).exists(),
      "fold must truncate the stream window")
    val folded = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    val oneShot = Similarity.annIvfPqPersisted(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(folded === oneShot && folded.nonEmpty)
    // a fold with no window is a no-op
    val before = Similarity.loadPostingsRaw(spark, dir).collect()
      .map(_.toSeq).toSet
    Similarity.foldStreamPostings(spark, dir, streamRoot)
    assert(Similarity.loadPostingsRaw(spark, dir).collect()
      .map(_.toSeq).toSet === before)
  }

  test("drift-gated rebuild: keep touches nothing, rebuild equals in-plan " +
    "full retrain and retires tombstones") {
    import org.apache.spark.sql.functions.{col, max}
    val emb = Tables.load(spark, sf, "embeddings")
    val top = emb.agg(max(col("vec_id"))).head.getLong(0) + 1L
    val cut = top * 8L / 10L
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_rebuild").toString + "/index"
    Similarity.writeIvfPqIndexFull(emb.filter(col("vec_id") < cut), dir)
    Similarity.appendIvfPqPostings(emb.filter(col("vec_id") >= cut), dir)
    // the decision row is the gauge's integer roll-up, and the action is
    // a pure function of (recall_bp, floor): the same gauge must flip
    // keep -> rebuild as the floor crosses the measured recall
    val d = Similarity.annRebuildGateDecision(emb, dir, floorBp = 10001L)
      .head
    val recallBp = d.getAs[Long]("recall_bp")
    assert(recallBp === d.getAs[Long]("n_hit") * 10000L /
      d.getAs[Long]("n_exact"))
    assert(d.getAs[String]("action") === "rebuild") // any index < 10001
    assert(Similarity.annRebuildGateDecision(emb, dir, floorBp = recallBp)
      .head.getAs[String]("action") === "keep") // floor at recall: serves
    def postings() = Similarity.loadPostingsRaw(spark, dir).collect()
      .map(_.toSeq).toSet
    def search() = Similarity.annIvfPqAppended(emb, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    // keep branch: the gated call returns the appended search and the
    // artifact is bit-identical — nothing retrained, nothing swapped
    val (p0, s0) = (postings(), search())
    val kept = Similarity.annRebuildGated(emb, dir, floorBp = 1L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(kept === s0 && postings() === p0,
      "a keep decision must leave the index untouched")
    // rebuild branch: retrain + re-encode + swap; the served search now
    // equals the in-plan full-corpus training chain
    val rebuilt =
      Similarity.annRebuildGated(emb, dir, floorBp = 10001L).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3)))
        .toSet
    val inPlan = Similarity.annIvfPq(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getInt(3))).toSet
    assert(rebuilt === inPlan && rebuilt.nonEmpty,
      "post-rebuild serving must equal full-corpus in-plan training")
    assert(!new java.io.File(s"${dir}_rebuilding").exists(),
      "rebuild must not leave its staging dir behind")
    // rebuild is the third tombstone resolution: purge, then rebuild
    // from the surviving corpus — tombstones retire with the old dir
    // and the purged rows are gone physically
    val purged = emb.select(col("vec_id")).where(col("vec_id") % 10 === 3)
    Similarity.purgeIvfPqPostings(spark, dir, purged)
    assert(new java.io.File(s"$dir/tombstones").exists())
    Similarity.rebuildIvfPqIndex(
      emb.filter(col("vec_id") % 10 =!= 3), dir)
    assert(!new java.io.File(s"$dir/tombstones").exists(),
      "rebuild from the surviving corpus must retire the tombstone set")
    val purgedIds = purged.collect().map(_.getLong(0)).toSet
    assert(!postings().exists(r => purgedIds(r.head.asInstanceOf[Long])),
      "purged rows survived the rebuild physically")
  }
}
