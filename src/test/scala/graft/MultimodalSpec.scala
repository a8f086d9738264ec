package graft

import graft.operators.Multimodal

class MultimodalSpec extends GraftSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "hello world"),
    (2L, "héllo wörld with multibyte çhars"),
    (3L, "x" * 300)).toDF("doc_id", "text")

  test("binary features: byte-accurate lengths and stable hashes") {
    val got = Multimodal.binaryFeatures(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(got(1L).getAs[Int]("n_bytes") === 11)
    // 3 two-byte chars in doc 2
    assert(got(2L).getAs[Int]("n_bytes") === 32 + 3)
    assert(got(1L).getAs[String]("content_md5") === "5eb63bbbe01eeed093cb22bb8f5acdc3")
    assert(got(1L).getAs[String]("header_hex") === "68656C6C6F20776F")
  }

  test("blob metadata struct prunes independently of the blob") {
    val meta = Multimodal.withBlob(docs).select("doc_id", "meta.n_bytes", "meta.format")
    val r = meta.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(r(1L) === 11)
    // the scan for a metadata-only query must not read the blob column
    assert(!meta.queryExecution.optimizedPlan.output.map(_.name).contains("blob"))
  }

  test("ppm round-trip: synthesized blob parses back to the exact pixels") {
    val imgs = Multimodal.decodePpm(spark, Multimodal.ppmBlob(docs))
      .collect().sortBy(_.doc_id)
    assert(imgs.length === 3)
    val byId = imgs.map(i => i.doc_id -> i).toMap
    // doc 1: 11 payload bytes -> one 8x1 image, text bytes then 0x00 pad
    val d1 = byId(1L)
    assert((d1.width, d1.height) === (8, 1))
    assert(d1.pixels.length === 24)
    assert(d1.pixels.take(11).toSeq === "hello world".getBytes("UTF-8").toSeq)
    assert(d1.pixels.drop(11).forall(_ == 0), "padding must decode as 0x00")
    // doc 3: 300 bytes -> ceil(300/24) = 13 rows
    val d3 = byId(3L)
    assert((d3.width, d3.height) === (8, 13))
    assert(d3.pixels.length === 312)
    assert(d3.pixels.take(300).forall(_ == 'x'.toByte))
    // partition-independent
    val re = Multimodal.decodePpm(spark,
      Multimodal.ppmBlob(docs.repartition(3))).collect().sortBy(_.doc_id)
    imgs.zip(re).foreach { case (a, b) =>
      assert(a.doc_id === b.doc_id && a.pixels.toSeq === b.pixels.toSeq)
    }
  }

  test("ppm parser: comments honored, malformed input fails loudly") {
    def blob(s: String): Array[Byte] = s.getBytes("ISO-8859-1")
    // a hand-written PPM with header comments, 2x1, known pixels
    val ok = Multimodal.parseP6(blob("P6\n# a comment\n2 1\n# more\n255\n" +
      "\u0001\u0002\u0003\u0004\u0005\u0006"))
    assert((ok._1, ok._2) === (2, 1))
    assert(ok._3.toSeq === Seq[Byte](1, 2, 3, 4, 5, 6))
    // wrong magic, truncated raster, oversize maxval all throw
    intercept[IllegalArgumentException](Multimodal.parseP6(blob("P5\n1 1\n255\nabc")))
    intercept[IllegalArgumentException](Multimodal.parseP6(blob("P6\n2 2\n255\nab")))
    intercept[IllegalArgumentException](Multimodal.parseP6(blob("P6\n1 1\n65535\nabc")))
  }

  test("pixel stats come from decoded pixels; 2x2 resize pools actual bytes") {
    val stats = Multimodal.pixelStats(spark, docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1 "hello world": channel sums of the padded byte plane, by hand
    val bs = "hello world".getBytes("UTF-8").map(_ & 0xff)
    def ch(m: Int) = bs.zipWithIndex.filter(_._2 % 3 == m).map(_._1.toLong).sum
    val r1 = stats(1L)
    assert(r1.getAs[Long]("sum_r") === ch(0))
    assert(r1.getAs[Long]("sum_g") === ch(1))
    assert(r1.getAs[Long]("sum_b") === ch(2))
    assert(r1.getAs[Double]("mean_luma") ===
      (299L * ch(0) + 587L * ch(1) + 114L * ch(2)).toDouble / (1000.0 * 8))
    // resize: 8x13 -> 4x7; output pixel (0,0,R) = floor-mean of the 2x2
    // block's R channel, hand-computed from doc 3's constant 'x' plane
    val d3 = Multimodal.decodePpm(spark, Multimodal.ppmBlob(docs))
      .filter(_.doc_id == 3L)
    val rz = Multimodal.resizeHalf(spark, d3).collect().head
    assert((rz.width, rz.height) === (4, 7))
    assert(rz.pixels.length === 4 * 7 * 3)
    // interior block fully inside the 'x' region: mean of four 'x' bytes
    assert((rz.pixels(0) & 0xff) === 'x'.toInt)
  }

  test("audio features: signed 16-bit LE decode, energy/crossings/peak exact") {
    // brute-force from the UTF-8 bytes directly (independent of the
    // operator's decode), incl. sign extension and the odd trailing byte
    def brute(text: String): (Long, Long, Long, Long) = {
      val b = text.getBytes("UTF-8")
      val vs = (0 until b.length / 2).map(i =>
        (((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort).toInt)
      val crossings = vs.sliding(2).count {
        case Seq(p, v) => (p < 0 && v > 0) || (p > 0 && v < 0)
        case _ => false
      }
      (vs.length.toLong, vs.map(v => v.toLong * v).sum, crossings.toLong,
        if (vs.isEmpty) 0L else vs.map(v => math.abs(v.toLong)).max)
    }
    // multibyte chars produce bytes >= 0x80 -> negative samples, so the
    // sign-extension and crossing paths are genuinely exercised
    val rows = Seq((1L, "hello world"), (2L, "héllo wörld with çhars"),
      (3L, "x"), (4L, "ab"))
    val got = Multimodal.audioFeatures(spark, rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    rows.foreach { case (id, t) => assert(got(id) === brute(t), s"doc $id") }
    assert(got(3L) === (0L, 0L, 0L, 0L), "odd single byte is not a sample")
    assert(got(2L)._3 > 0L,
      "multibyte bytes in the high position go negative -> sign crossings")
  }

  test("audio envelope hash: brute-forced bits; dup texts pair at hamming 0") {
    def bruteFp(text: String): Long = {
      val b = text.getBytes("UTF-8")
      val n = b.length / 2
      val e = new Array[Long](65)
      (0 until n).foreach { i =>
        val v = (((b(2 * i) & 0xff) | (b(2 * i + 1) << 8)).toShort).toLong
        e(((i.toLong * 65) / n).toInt) += v * v
      }
      (0 until 64).foldLeft(0L)((acc, j) =>
        if (e(j) > e(j + 1)) acc | (1L << j) else acc)
    }
    // long enough that all 65 frames carry samples; one exact dup pair;
    // a unicode doc exercising negative samples; a short doc with empty
    // tail frames (energy 0 runs -> descent bits 0)
    val base = "the quick brown fox jumps over the lazy dog " * 4
    val rows = Seq((1L, base), (2L, base), (3L, "héllo wörld çhars " * 8),
      (4L, "tiny"))
    val fp = Multimodal.audioEnvelopeHash(spark, rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (id, t) => assert(fp(id) === bruteFp(t), s"doc $id") }
    assert(fp(1L) === fp(2L))
    val pairs = Multimodal.audioHashPairs(spark, rows.toDF("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(pairs((1L, 2L)) === 0L)
  }

  test("aHash: brute-forced from raw bytes; pairs = exact all-pairs Hamming") {
    // independent Scala recomposition of the hash from the TEXT bytes —
    // no decoder, no Spark expressions — on the real sf0.001 corpus
    def brute(text: String): Long = {
      val payload = text.getBytes("UTF-8")
      val h = math.max(1L, math.ceil(payload.length / 24.0).toLong).toInt
      def byteAt(i: Int): Int = if (i < payload.length) payload(i) & 0xff else 0
      val cs = new Array[Long](64); val cc = new Array[Long](64)
      var total = 0L
      for (p <- 0 until h * 8) {
        val l = 299L * byteAt(p * 3) + 587L * byteAt(p * 3 + 1) +
          114L * byteAt(p * 3 + 2)
        val k = (p / 8 * 8 / h) * 8 + p % 8
        cs(k) += l; cc(k) += 1; total += l
      }
      (0 until 64).foldLeft(0L) { (acc, k) =>
        if (cs(k) * (8L * h) > total * cc(k)) acc | (1L << k) else acc
      }
    }
    val corpus = Tables.load(spark, sf, "documents").select("doc_id", "text")
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1))
    val expectedFp = texts.map { case (id, t) => id -> brute(t) }.toMap
    val gotFp = Multimodal.aHash(spark, corpus).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotFp === expectedFp)
    // pair recall is a pigeonhole GUARANTEE: the blocked join must equal
    // the quadratic all-pairs compare exactly, at the recall-bound radius
    val expectedPairs = (for {
      (a, fa) <- expectedFp.toSeq; (b, fb) <- expectedFp.toSeq if a < b
      d = java.lang.Long.bitCount(fa ^ fb) if d <= 7
    } yield (a, b, d.toLong)).toSet
    val gotPairs = Multimodal.phashPairs(spark, corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotPairs === expectedPairs)
    assert(gotPairs.nonEmpty, "the corpus's known dups must collide")
    assert(gotPairs.exists(_._3 === 0L), "exact dups hash identically")
  }

  test("frame sample: every stride-th fixed-size frame, 1 row -> n rows") {
    val got = Multimodal.frameSample(docs, frameBytes = 64, stride = 4).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2)))
    // doc 3: 300 bytes -> frames 0..4 (64,64,64,64,44), kept idx 0 and 4
    val d3 = got.filter(_._1 == 3L).sortBy(_._2)
    assert(d3.map(t => (t._2, t._3)).toSeq === Seq((0, 64), (4, 44)))
    // doc 1: 11 bytes -> single frame idx 0
    assert(got.filter(_._1 == 1L).toSeq === Seq((1L, 0, 11)))
  }

  test("video near-dup: containment on sampled frames, DF cap blocks hot frames") {
    // frameBytes=4, stride=2 → sampled frames are the 4-byte blocks at
    // indices 0, 2, 4 of each text
    val vids = Seq(
      (1L, "AAAABBBBCCCCDDDDEEEE"), // sampled: AAAA CCCC EEEE
      (2L, "AAAABBBBCCCCDDDDEEEE"), // identical → containment 10000
      (3L, "AAAABBBBCCCCDDDDZZZZ"), // shares AAAA CCCC → 6666
      (4L, "XXXXYYYYWWWWVVVVUUUU"), // disjoint
      (5L, "AAAABBBBAAAA") // sampled AAAA, AAAA → DISTINCT set of 1
    ).toDF("doc_id", "text")
    def run(minBp: Long, maxDf: Int) =
      Multimodal.videoNearDupPairs(vids, minBp, maxDf,
        frameBytes = 4, stride = 2).collect()
        .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
          ((r.getAs[Long]("shared_frames"), r.getAs[Long]("nf_a"),
            r.getAs[Long]("nf_b"), r.getAs[Long]("containment_bp")))).toMap

    val all = run(0L, 64)
    assert(all === Map(
      (1L, 2L) -> ((3L, 3L, 3L, 10000L)),
      (1L, 3L) -> ((2L, 3L, 3L, 6666L)),
      (2L, 3L) -> ((2L, 3L, 3L, 6666L)),
      // doc 5's whole (deduped) frame set is inside 1, 2, 3 → 10000
      (1L, 5L) -> ((1L, 3L, 1L, 10000L)),
      (2L, 5L) -> ((1L, 3L, 1L, 10000L)),
      (3L, 5L) -> ((1L, 3L, 1L, 10000L))))

    // thresholding: only full containment survives 7000 bp
    assert(run(7000L, 64).keySet ===
      Set((1L, 2L), (1L, 5L), (2L, 5L), (3L, 5L)))

    // DF cap: AAAA lives in docs 1,2,3,5 (df=4 > 3) → blocked out of the
    // intersection; denominators stay exact. (1,2) drop to 2/3, the
    // (·,5) pairs lose their only shared frame and vanish entirely
    val capped = run(0L, 3)
    assert(capped === Map(
      (1L, 2L) -> ((2L, 3L, 3L, 6666L)),
      (1L, 3L) -> ((1L, 3L, 3L, 3333L)),
      (2L, 3L) -> ((1L, 3L, 3L, 3333L))))
  }

  test("cross-modal linkage equals brute-forced joins of its two pair graphs") {
    import org.apache.spark.sql.functions.col
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val fx = Seq(
      (1L, base),
      (2L, base),                            // exact dup of 1: same bytes
      (3L, "  " + base.toUpperCase + "  "),  // same FINGERPRINT as 1 (case/
      // whitespace normalize) but different BYTES -> different pixels
      (4L, base.replace("w30", "zz")),       // near-dup text
      (5L, (1 to 30).map(i => s"q$i").mkString(" "))) // unrelated
      .toDF("doc_id", "text")
    val fp = operators.TextAnalysis.fingerprints(fx).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) != fp(4L))
    val ah = Multimodal.aHash(spark, fx).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // image->text: every phash pair annotated with fp equality
    val gotA = Multimodal.crossModalImageDups(spark, fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val expA = Multimodal.phashPairs(spark, fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        fp(r.getLong(0)) == fp(r.getLong(1)))).toSet
    assert(gotA === expA)
    // text->image: every minhash caption pair annotated with aHash hamming
    val gotB = Multimodal.crossModalTextDups(spark, fx).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getBoolean(3)))
      .toSet
    val expB = operators.Dedup.minhashCandidatePairs(fx).collect()
      .map { r =>
        val (a, b) = (r.getLong(0), r.getLong(1))
        val h = java.lang.Long.bitCount(ah(a) ^ ah(b)).toLong
        (a, b, h, h <= 7L)
      }.toSet
    assert(gotB === expB)
    // governance cells are non-trivial: the byte-identical dup pair is
    // img_dup=true with hamming 0, and the normalized-equal pair (1,3)
    // reaches the caption graph (identical shingles) even though its
    // bytes — hence possibly its pixels — differ
    assert(gotB.contains((1L, 2L, 0L, true)))
    assert(gotB.exists(t => t._1 == 1L && t._2 == 3L))
  }
}
