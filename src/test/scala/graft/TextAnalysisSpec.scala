package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSpec {
  import spark.implicits._

  test("quality stats: hand-computed counts and ratios") {
    val docs = Seq((1L, "The cat is on the mat.")).toDF("doc_id", "text")
    val r = TextAnalysis.qualityStats(docs).collect().head
    assert(r.getAs[Int]("n_tokens") === 6)
    assert(r.getAs[Int]("n_chars") === 22)
    assert(r.getAs[Int]("n_stop") === 4) // the, is, on, the ("mat." keeps the dot)
    assert(r.getAs[Int]("n_alpha") === 16)
    assert(r.getAs[Int]("n_punct") === 1)
    assert(r.getAs[Double]("stop_ratio") === 4.0 / 6.0)
    assert(r.getAs[Double]("alpha_ratio") === 16.0 / 22.0)
  }

  test("lang id picks the language with most stopword hits, 'und' when none") {
    val docs = Seq(
      (1L, "the cat and the dog"),
      (2L, "der hund ist nicht da und das ist gut"),
      (3L, "le chat est dans la maison pour une nuit"),
      (4L, "xyzzy plugh")).toDF("doc_id", "text")
    val got = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("lang_pred")).toMap
    assert(got === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "und"))
  }

  test("token counts: words vs BPE-ish tokens") {
    val docs = Seq((1L, "Hello, world! It's fine.")).toDF("doc_id", "text")
    val r = TextAnalysis.tokenCounts(docs).collect().head
    assert(r.getAs[Int]("n_words") === 4)
    // Hello , world ! It ' s fine . -> 9
    assert(r.getAs[Int]("n_bpeish") === 9)
  }

  test("rolling hash is order-sensitive where set fingerprints are not") {
    val docs = Seq((1L, "alpha beta"), (2L, "beta alpha"), (3L, "alpha beta")).toDF("doc_id", "text")
    val fp = TextAnalysis.rollingHashFingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(3L))
    assert(fp(1L) !== fp(2L), "word order must change the rolling hash")
    assert(fp.values.forall(v => v >= 0 && v < 2147483647L))
  }

  test("fingerprint is whitespace- and case-insensitive, content-sensitive") {
    val docs = Seq((1L, "Spark  SQL"), (2L, "spark sql"), (3L, "spark sq")).toDF("doc_id", "text")
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }
}
