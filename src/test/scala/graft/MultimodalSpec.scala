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

  test("decode stub: deterministic, partition-independent features") {
    val a = Multimodal.decodeStub(spark, docs).collect().sortBy(_.doc_id)
    val b = Multimodal.decodeStub(spark, docs.repartition(3)).collect().sortBy(_.doc_id)
    assert(a.length === 3)
    a.zip(b).foreach { case (x, y) =>
      assert(x.doc_id === y.doc_id)
      assert(x.width === y.width && x.height === y.height)
      assert(x.features.toSeq === y.features.toSeq)
      assert(x.width >= 16 && x.width <= 143)
      assert(x.features.length === 8)
      assert(x.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("resize stub halves dimensions and pools features 2:1") {
    val feats = Multimodal.decodeStub(spark, docs)
    val resized = Multimodal.resizeStub(spark, feats).collect().sortBy(_.doc_id)
    val orig = feats.collect().sortBy(_.doc_id)
    orig.zip(resized).foreach { case (o, r) =>
      assert(r.width === math.max(1, o.width / 2))
      assert(r.features.length === o.features.length / 2)
      assert(r.features(0) === (o.features(0) + o.features(1)) / 2.0f)
    }
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
}
