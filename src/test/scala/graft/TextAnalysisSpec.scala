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

  test("enrich fuses qualityStats + langId + fingerprints, identical values") {
    // the one-scan fused projection must equal the three standalone ops
    // row-for-row — bit-exact doubles, same tiebreaks
    val docs = Tables.load(spark, sf, "documents")
    val enriched = TextAnalysis.enrich(docs)
      .select("doc_id", "quality_score", "lang_pred", "fp", "n_tokens").collect()
      .map(r => r.getLong(0) -> ((r.get(1), r.getString(2), r.getString(3), r.getInt(4))))
      .toMap
    val quality = TextAnalysis.qualityStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.get(r.fieldIndex("quality_score")),
        r.getInt(r.fieldIndex("n_tokens"))))).toMap
    val lang = TextAnalysis.langId(docs).collect()
      .map(r => r.getLong(0) -> r.getString(r.fieldIndex("lang_pred"))).toMap
    val fp = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enriched.keySet === quality.keySet)
    enriched.foreach { case (id, (score, lp, f, nt)) =>
      assert((score, nt) === quality(id), s"doc $id quality")
      assert(lp === lang(id), s"doc $id lang")
      assert(f === fp(id), s"doc $id fp")
    }
    // extra input columns ride along (the streaming pipeline relies on it)
    assert(TextAnalysis.enrich(
      docs.withColumn("extra", org.apache.spark.sql.functions.lit(1)))
      .columns.contains("extra"))
  }

  test("deterministic sample: reproducible, monotone in rate, salt-varied") {
    val docs = Tables.load(spark, sf, "documents")
    val a = TextAnalysis.deterministicSample(docs).collect().map(_.getLong(0)).toSet
    val b = TextAnalysis.deterministicSample(docs).collect().map(_.getLong(0)).toSet
    assert(a === b, "same slice on every run")
    assert(TextAnalysis.deterministicSample(docs, pct = 100).count() === docs.count())
    assert(TextAnalysis.deterministicSample(docs, pct = 0).count() === 0L)
    val other = TextAnalysis.deterministicSample(docs, salt = "s1")
      .collect().map(_.getLong(0)).toSet
    assert(a !== other, "salt selects an independent slice")
  }

  test("quality gate keeps exactly the docs at or above the percentile bucket") {
    val docs = Tables.load(spark, sf, "documents")
    val kept = TextAnalysis.qualityGate(docs).collect()
    val total = docs.count()
    assert(kept.nonEmpty && kept.length < total)
    val thr = kept.head.getLong(2)
    kept.foreach(r => assert(r.getLong(1) >= thr))
    // the median gate keeps at least half the corpus (ties keep more)
    assert(kept.length >= total / 2)
  }

  test("quality gate ignores degenerate docs whose score is null") {
    val docs = Seq((1L, ""), (2L, "the cat is on the mat"),
      (3L, "the dog and the fox ran")).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityGate(docs).collect().map(_.getLong(0)).toSet
    assert(!kept.contains(1L), "empty text -> 0/0 ratios -> excluded")
    assert(kept.nonEmpty)
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
