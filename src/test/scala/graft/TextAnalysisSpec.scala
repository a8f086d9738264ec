package graft

import graft.operators.TextAnalysis

class TextAnalysisSpec extends GraftSpec {
  import spark.implicits._

  test("bpe merges: brute-force rounds, greedy non-overlapping rewrite") {
    // "x x x x" must merge to two "x x" tokens in round 1 (greedy
    // left-to-right, no overlap); the merged token then participates as a
    // unit in later rounds. Brute-force the same loop on driver strings.
    val docs = Seq(
      (1L, "x x x x a b"),
      (2L, "a b c a b c"),
      (3L, "x x a b")).toDF("doc_id", "text")
    def brute(corpus: Seq[Seq[String]], k: Int): Seq[(Long, String, Long)] = {
      var c = corpus
      (1 to k).map { r =>
        val counts = c.flatMap(t => t.zip(t.drop(1)))
          .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        c = c.map { t =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
              out += s"$a $b"; i += 2
            } else { out += t(i); i += 1 }
          }
          out.toSeq
        }
        (r.toLong, s"$a $b", n)
      }
    }
    val corpus = Seq("x x x x a b", "a b c a b c", "x x a b")
      .map(_.split(" ").toSeq)
    val expected = brute(corpus, 3)
    val got = TextAnalysis.bpeMerges(docs, k = 3).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
      .sortBy(_._1)
    assert(got === expected)
    // round 1 merges the most frequent pair; on this corpus that is
    // ("a","b") ×4 (the x-x run contributes only 3 adjacent pairs)
    assert(got.head._2 === "a b" && got.head._3 === 4L)

    // randomized cross-check: seeded random corpora over a tiny alphabet
    // (maximizing overlapping-run and tie cases), distributed loop ==
    // driver brute force for every round
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 3) {
      val corpus = (1 to 6).map { _ =>
        (1 to (5 + rnd.nextInt(20))).map(_ => s"w${rnd.nextInt(3)}")
      }
      val rdocs = corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val exp = brute(corpus, 3)
      val g = TextAnalysis.bpeMerges(rdocs, k = 3).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
        .sortBy(_._1)
      assert(g === exp, s"trial $trial diverged on corpus $corpus")
    }
  }

  test("tokenize_bpe applies the learned merges: fold == round-by-round rewrite") {
    // The scan-side fold (apply rule 1..k over the raw tokens) must equal
    // the learner's round-by-round corpus rewrite — brute-force the rounds
    // on driver strings and compare the final token table exactly.
    def bruteTokens(corpus: Seq[Seq[String]], k: Int): Seq[Seq[String]] = {
      var c = corpus
      for (_ <- 1 to k) {
        val counts = c.flatMap(t => t.zip(t.drop(1)))
          .groupBy(identity).map { case (p, v) => p -> v.size.toLong }
        val ((a, b), _) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        c = c.map { t =>
          val out = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < t.length) {
            if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
              out += s"$a $b"; i += 2
            } else { out += t(i); i += 1 }
          }
          out.toSeq
        }
      }
      c
    }
    val rnd = new scala.util.Random(7)
    val corpora = Seq(
      Seq("x x x x a b", "a b c a b c", "x x a b").map(_.split(" ").toSeq)) ++
      (1 to 3).map { _ =>
        (1 to 6).map { _ =>
          (5 + rnd.nextInt(20)) match {
            case n => (1 to n).map(_ => s"w${rnd.nextInt(3)}")
          }
        }
      }
    for (corpus <- corpora) {
      val docs = corpus.zipWithIndex
        .map { case (t, i) => (i.toLong, t.mkString(" ")) }
        .toDF("doc_id", "text")
      val expected = bruteTokens(corpus, 3).zipWithIndex.flatMap {
        case (toks, i) =>
          toks.zipWithIndex.map { case (tok, p) => (i.toLong, p + 1L, tok) }
      }.sorted
      val got = TextAnalysis.tokenizeBpe(docs, k = 3).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSeq.sorted
      assert(got === expected, s"diverged on corpus $corpus")
    }
  }

  test("bigram LM scoring agrees with brute force; short docs score zero") {
    for (seed <- 1 to 3) {
      val rnd = new scala.util.Random(seed)
      val corpus = (1 to 8).map { i =>
        i.toLong -> (1 to (if (i == 1) 1 else 3 + rnd.nextInt(12)))
          .map(_ => s"w${rnd.nextInt(5)}").mkString(" ")
      }
      val got = TextAnalysis.lmScore(corpus.toDF("doc_id", "text")).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
        .toMap
      val toks = corpus.map { case (id, t) => id -> t.split(" ").toSeq }
      val uni = toks.flatMap(_._2).groupBy(identity).map { case (a, v) => a -> v.size.toLong }
      val v = uni.size.toLong
      val bi = toks.flatMap { case (_, t) => t.zip(t.drop(1)) }
        .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      val expected = toks.map { case (id, t) =>
        val pqs = t.zip(t.drop(1)).map { case (a, b) =>
          math.floor(1e6 * (bi((a, b)) + 1).toDouble / (uni(a) + v).toDouble).toLong
        }
        val n = pqs.size.toLong
        id -> (n, pqs.sum,
          if (n > 0) pqs.sum.toDouble / n.toDouble else 0.0)
      }.toMap
      assert(got === expected, s"seed $seed")
      assert(got(1L) === ((0L, 0L, 0.0)), "1-token doc has no bigrams")
    }
  }

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

  test("vocab coverage: exact top-k occupancy with count-then-token tiebreak") {
    // freqs: a×5, b×3, c×3, d×1 — top-2 = a(5) + b(3) (b beats c on the
    // token tiebreak at equal count) → 8/12 = 6666 bp
    val docs = Seq(
      (1L, "a a a b b c"), (2L, "a a b c c d")
    ).toDF("doc_id", "text")
    val r = TextAnalysis.vocabCoverage(docs, k = 2).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ===
      ((2L, 8L, 12L, 6666L)))
    // k above the type count: coverage saturates at 10000 with the true
    // vocab size reported, not k
    val r2 = TextAnalysis.vocabCoverage(docs, k = 50).head()
    assert((r2.getLong(0), r2.getLong(3)) === ((4L, 10000L)))
  }

  test("compress ratio: brute-forced char-3gram diversity, degenerate lengths") {
    val rows = Seq(
      (1L, "aaaaaaaa"), // 6 grams, 1 distinct -> 1666 bp
      (2L, "abcdefgh"), // 6 grams, all distinct -> 10000 bp
      (3L, "ab"), // too short: 0 grams, null bp
      (4L, ""), (5L, "héllo héllo")) // unicode + a repeated word
    def brute(t: String): (Long, Long, Option[Long]) = {
      val g = (0 to t.length - 3).map(i => t.substring(i, i + 3))
      (g.size.toLong, g.distinct.size.toLong,
        if (g.isEmpty) None else Some(g.distinct.size.toLong * 10000 / g.size))
    }
    val got = TextAnalysis.compressRatio(rows.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))).toMap
    rows.foreach { case (id, t) => assert(got(id) === brute(t), s"doc $id") }
    assert(got(1L)._3.get < got(2L)._3.get, "repetition must score lower")
  }

  test("weighted sample: inclusion follows the brute-forced md5 coin, capped at 1") {
    val docs = Seq(
      (1L, "en", 0L),     // weight 0: never kept
      (2L, "en", 400L),   // at cap: always kept
      (3L, "en", 9999L),  // above cap: always kept
      (4L, "de", 200L), (5L, "de", 50L), (6L, "en", 123L)
    ).toDF("doc_id", "lang", "n_chars")
    def coin(salt: String, id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$salt:$id".getBytes("UTF-8"))
      val hex = md.take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val expected = Seq((1L, 0L), (2L, 400L), (3L, 9999L), (4L, 200L), (5L, 50L), (6L, 123L))
      .filter { case (id, w) => coin("w0", id) % 400 < math.min(w, 400L) }
      .map(_._1).toSet
    assert(expected.contains(2L) && expected.contains(3L) && !expected.contains(1L))
    val got = TextAnalysis.weightedSample(docs).collect().map(_.getLong(0)).toSet
    assert(got === expected)
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

  test("repetition stats match a brute-force recount on the corpus") {
    val docs = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.repetitionStats(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    docs.select("doc_id", "text").collect().foreach { row =>
      val id = row.getLong(0)
      val toks = row.getString(1).trim.toLowerCase.split("\\s+").toSeq
      val top = toks.groupBy(identity).values.map(_.size).max
      val bgs =
        if (toks.size < 2) Seq.empty[String]
        else toks.sliding(2).map(_.mkString(" ")).toSeq
      val r = got(id)
      assert(r.getAs[Long]("n_tokens") === toks.size.toLong, s"doc $id n")
      assert(r.getAs[Long]("top_token_count") === top.toLong, s"doc $id top")
      assert(r.getAs[Long]("n_bigrams") === bgs.size.toLong, s"doc $id bg")
      assert(r.getAs[Long]("n_dup_bigrams") ===
        (bgs.size - bgs.distinct.size).toLong, s"doc $id dup")
    }
  }

  test("repetition ratios flag a degenerate repeated doc") {
    import spark.implicits._
    val r = TextAnalysis.repetitionStats(
      Seq((9L, "spam spam spam spam"), (10L, "all words here differ"))
        .toDF("doc_id", "text"))
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(9L).getAs[Double]("top_token_ratio") === 1.0)
    assert(r(9L).getAs[Double]("dup_bigram_ratio") === 2.0 / 3.0)
    assert(r(10L).getAs[Long]("top_token_count") === 1L)
    assert(r(10L).getAs[Double]("dup_bigram_ratio") === 0.0)
  }

  test("scrub counts and redacts; hit paths on adversarial literals") {
    import spark.implicits._
    val docs = Seq(
      (1L, "contact bob@example.com or alice.smith+x@mail.co via 10.0.0.1"),
      (2L, "the key of the hash is a value of the key"),
      (3L, "monkeys hashing valued")) // substrings must NOT match (\b)
      .toDF("doc_id", "text")
    val r = TextAnalysis.scrub(docs).collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Long]("n_email") === 2L)
    assert(r(1L).getAs[Long]("n_ipv4") === 1L)
    assert(r(2L).getAs[Long]("n_denylist") === 4L)
    assert(r(2L).getAs[String]("redacted") ===
      "the [MASKED] of the [MASKED] is a [MASKED] of the [MASKED]")
    assert(r(3L).getAs[Long]("n_denylist") === 0L)
    assert(r(3L).getAs[String]("redacted") === "monkeys hashing valued")
  }

  test("vocab bigrams: pair counts with deterministic tiebreak") {
    import spark.implicits._
    val docs = Seq((1L, "a b a b c"), (2L, "a b x")).toDF("doc_id", "text")
    val r = TextAnalysis.vocabBigrams(docs, k = 3).collect()
      .map(x => (x.getString(0), x.getLong(1))).toSeq
    assert(r === Seq(("a b", 3L), ("b a", 1L), ("b c", 1L)))
  }

  test("per-language gate: each language thresholds on its own median") {
    import org.apache.spark.sql.functions._
    val docs = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.qualityGateByLang(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSet
    val scored = TextAnalysis.enrich(docs)
      .filter(col("quality_score").isNotNull && !isnan(col("quality_score")))
      .select(col("doc_id"), col("lang"),
        floor(col("quality_score") * 1000 + 0.5).cast("long").as("qs"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val exp = scored.groupBy(_._2).flatMap { case (lang, rows) =>
      val sorted = rows.map(_._3).sorted
      val thr = sorted(math.ceil(sorted.length * 0.5).toInt - 1)
      rows.filter(_._3 >= thr).map(r => (r._1, lang, r._3, thr)).toSeq
    }.toSet
    assert(got === exp)
    val thresholds = got.map(x => x._2 -> x._4).toMap
    info(s"per-lang thresholds: ${thresholds.toSeq.sortBy(_._1)}")
    assert(thresholds.values.toSet.size > 1,
      "languages threshold independently on this corpus")
  }

  test("per-group sample: exactly k per language, deterministic coin order") {
    val docs = Tables.load(spark, sf, "documents")
    val k = 5
    val got = TextAnalysis.samplePerGroup(docs, k = k).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getAs[Int]("rnk")))
    val groupSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.length === math.min(k.toLong, groupSizes(lang)), s"$lang size")
    }
    // brute force: smallest md5 coin first, doc_id tiebreak
    val byCoin = docs.select("doc_id", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._2).view.mapValues(_.map(_._1).sortBy(id =>
        (java.security.MessageDigest.getInstance("MD5")
          .digest(s"s0:$id".getBytes("UTF-8"))
          .map("%02x".format(_)).mkString, id)).take(k).toSet).toMap
    got.groupBy(_._2).foreach { case (lang, rows) =>
      assert(rows.map(_._1).toSet === byCoin(lang), s"$lang members")
    }
  }

  test("chunking covers every token at the declared stride") {
    val docs = Tables.load(spark, sf, "documents")
    val chunks = TextAnalysis.chunkDocuments(docs).collect().groupBy(_.getLong(0))
    docs.select("doc_id", "text").collect().foreach { row =>
      val id = row.getLong(0)
      val toks = row.getString(1).trim.toLowerCase.split("\\s+").toSeq
      val cs = chunks(id).sortBy(_.getAs[Long]("chunk_id"))
      assert(cs.length === math.max(1, (toks.size - 16 + 47) / 48), s"doc $id count")
      cs.foreach { c =>
        val start = c.getAs[Long]("chunk_id").toInt * 48
        val exp = toks.slice(start, start + 64)
        assert(c.getAs[String]("chunk_text") === exp.mkString(" "),
          s"doc $id chunk@$start")
        assert(c.getAs[Long]("n_chunk_tokens") === exp.size.toLong)
      }
      val lastStart = cs.last.getAs[Long]("chunk_id").toInt * 48
      assert(lastStart + 64 >= toks.size, s"doc $id tail covered")
    }
  }

  test("quality deciles: brute-forced rank-convention tiers, ties share") {
    val docs = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.qualityDeciles(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("qs"), r.getAs[Long]("tier")))
      .toMap
    val qsById = got.view.mapValues(_._1).toMap
    val sortedQs = qsById.values.toArray.sorted
    val n = sortedQs.length
    val cuts = (1 until 10).map(t => sortedQs(math.ceil(n * (t / 10.0)).toInt - 1))
    got.foreach { case (id, (qs, tier)) =>
      assert(tier === 1L + cuts.count(qs > _), s"doc $id tier")
    }
    // every decile is populated on the real corpus, ties share a tier,
    // and the ordering is monotone in score
    assert(got.values.map(_._2).toSet === (1L to 10L).toSet)
    val byQs = got.values.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    byQs.foreach { case (qs, tiers) =>
      assert(tiers.size === 1, s"qs $qs split across tiers $tiers")
    }
  }

  test("gopher rules: each rule trips on its own violation, exact bounds") {
    val longOk = (Seq.fill(15)("the quick") ++ Seq.fill(15)("brown fox"))
      .mkString(" ") // 60 tokens, 4 distinct, max freq 15/60 > 20% -> r_maxfreq fails
    // 150 tokens; "the"/"of" appear 30x = exactly 20% -> the closed
    // maxfreq bound (5*30 <= 150) passes on the boundary
    val balanced = (1 to 30).map(i => s"alpha$i bravo$i chars$i the of")
      .mkString(" ")
    val docs = Seq(
      (1L, "too short but the of fine"),         // r_wordcount fails (6 < 30)
      (2L, balanced),                            // all pass
      (3L, longOk),                              // r_maxfreq fails
      (4L, (1 to 40).map(_ => "a b").mkString(" ")) // meanlen 1 < 3 fails
    ).toDF("doc_id", "text")
    val r = TextAnalysis.gopherRules(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r(1L).getAs[Boolean]("r_wordcount") && !r(1L).getAs[Boolean]("pass"))
    assert(r(1L).getAs[Boolean]("r_stopwords"), "'the'+'of' = 2 distinct stops")
    assert(r(2L).getAs[Boolean]("pass"),
      s"balanced doc passes all rules: ${r(2L)}")
    assert(!r(3L).getAs[Boolean]("r_maxfreq") && r(3L).getAs[Boolean]("r_wordcount"))
    assert(!r(4L).getAs[Boolean]("r_meanlen") && !r(4L).getAs[Boolean]("pass"))
    // exact boundary: exactly 30 tokens with mean length exactly 3 sits
    // ON both closed bounds (wordcount lower, meanlen lower) and passes
    // them; the repeated "abc" trips only maxfreq
    val edge = Seq((9L, (1 to 28).map(_ => "abc").mkString(" ") + " the and"))
      .toDF("doc_id", "text")
    val e = TextAnalysis.gopherRules(edge).collect().head
    assert(e.getAs[Long]("n_tokens") === 30L && e.getAs[Long]("sum_len") === 90L)
    assert(e.getAs[Boolean]("r_wordcount") && e.getAs[Boolean]("r_meanlen"),
      e.toString)
    assert(!e.getAs[Boolean]("r_maxfreq"), "28/30 'abc' trips maxfreq")
  }

  test("bm25: brute-forced scores and ranking on a hand-built corpus") {
    val docs = Seq(
      (1L, "hash join hash merge sort"),
      (2L, "window sort order window window"),
      (3L, "stream batch data stream"),
      (4L, "hash"),
      (5L, "nothing relevant here at all"),
      (6L, "join join join join join join join join")).toDF("doc_id", "text")
    val got = TextAnalysis.bm25TopK(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    // independent recomposition in plain Scala
    val corpus = Seq(
      1L -> Seq("hash", "join", "hash", "merge", "sort"),
      2L -> Seq("window", "sort", "order", "window", "window"),
      3L -> Seq("stream", "batch", "data", "stream"),
      4L -> Seq("hash"),
      5L -> Seq("nothing", "relevant", "here", "at", "all"),
      6L -> Seq.fill(8)("join"))
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    def df(t: String) = corpus.count(_._2.contains(t)).toDouble
    def termScore(t: String, toks: Seq[String]): Long = {
      val tf = toks.count(_ == t).toDouble
      val idf = (n - df(t) + 0.5) / (df(t) + 0.5)
      val norm = 0.25 + 0.75 * (toks.size.toDouble / avgdl)
      math.floor(1000000.0 * ((idf * (tf * 2.2)) / (tf + 1.2 * norm))).toLong
    }
    val expected = (for {
      (qid, qterms) <- TextAnalysis.Bm25Queries
      (id, toks) <- corpus
      score = qterms.map(termScore(_, toks)).sum if score > 0
    } yield (qid, id, score))
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).zipWithIndex.map { case (r, i) =>
          (qid.toLong, r._2) -> (r._3, i + 1L)
        }
      }.toMap
    assert(got === expected)
    // tf saturation: doc 1 matches all three query-1 terms and must
    // outrank doc 6's 8x repetition of one term (k1 caps per-term gain)
    assert(got((1L, 1L))._2 === 1L, "multi-term match ranks first")
    assert(got((1L, 6L))._1 < got((1L, 1L))._1)
    assert(!got.contains((1L, 5L)), "zero-score docs never rank")
  }

  private val retrievalCorpus = Seq(
    1L -> "hash join hash merge sort",
    2L -> "window sort order window window",
    3L -> "stream batch data stream",
    4L -> "hash",
    5L -> "nothing relevant here at all",
    6L -> "join join join join join join join join")

  private def retrievalToks: Seq[(Long, Seq[String])] =
    retrievalCorpus.map { case (id, t) => id -> t.split(" ").toSeq }

  /** Brute-forced rare-term ranking: score = Σ_t tf·(N − df), all longs. */
  private def rareExpected(k: Int): Map[(Long, Long), (Long, Long)] = {
    val corpus = retrievalToks
    val n = corpus.size.toLong
    def df(t: String) = corpus.count(_._2.contains(t)).toLong
    (for {
      (qid, qterms) <- TextAnalysis.Bm25Queries
      (id, toks) <- corpus
      score = qterms.map(t => toks.count(_ == t).toLong * (n - df(t))).sum
      if score > 0
    } yield (qid, id, score))
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case (r, i) => (qid.toLong, r._2) -> (r._3, i + 1L)
        }
      }.toMap
  }

  test("rare-term ranking: brute-forced integer scores, tie-break by doc_id") {
    import spark.implicits._
    val docs = retrievalCorpus.toDF("doc_id", "text")
    val got = TextAnalysis.rareTermTopK(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3))).toMap
    assert(got === rareExpected(20))
    // orthogonality to bm25: no length normalization, so doc 6's 8x 'join'
    // repetition beats doc 1's single-copy multi-term match on query 1
    assert(got((1L, 6L))._1 > got((1L, 1L))._1,
      "rare-term must reward raw tf where bm25 saturates it")
  }

  /** Brute-forced RRF fusion of the two rankers' expected top-k lists. */
  private def rrfExpected(k: Int, kappa: Int)
      : Map[(Long, Long), (Option[Long], Option[Long], Double, Long)] = {
    val corpus = retrievalToks
    val n = corpus.size.toDouble
    val avgdl = corpus.map(_._2.size).sum.toDouble / n
    def dfd(t: String) = corpus.count(_._2.contains(t)).toDouble
    def termScore(t: String, toks: Seq[String]): Long = {
      val tf = toks.count(_ == t).toDouble
      val idf = (n - dfd(t) + 0.5) / (dfd(t) + 0.5)
      val norm = 0.25 + 0.75 * (toks.size.toDouble / avgdl)
      math.floor(1000000.0 * ((idf * (tf * 2.2)) / (tf + 1.2 * norm))).toLong
    }
    val bmRanks = (for {
      (qid, qterms) <- TextAnalysis.Bm25Queries
      (id, toks) <- corpus
      score = qterms.map(termScore(_, toks)).sum if score > 0
    } yield (qid, id, score))
      .groupBy(_._1).toSeq.flatMap { case (qid, rows) =>
        rows.sortBy(r => (-r._3, r._2)).take(k).zipWithIndex.map {
          case (r, i) => (qid.toLong, r._2) -> (i + 1L)
        }
      }.toMap
    val rareRanks = rareExpected(k).map { case (key, (_, rn)) => key -> rn }
    (bmRanks.keySet ++ rareRanks.keySet)
      .groupBy(_._1).toSeq.flatMap { case (qid, keys) =>
        val fused = keys.toSeq.map { case (_, id) =>
          val bm = bmRanks.get((qid, id))
          val rare = rareRanks.get((qid, id))
          // the operator's fixed (bm25, rare) addition order
          val rrf = bm.map(r => 1.0 / (kappa + r)).getOrElse(0.0) +
            rare.map(r => 1.0 / (kappa + r)).getOrElse(0.0)
          (id, bm, rare, rrf)
        }
        fused.sortBy(f => (-f._4, f._1)).take(k).zipWithIndex.map {
          case ((id, bm, rare, rrf), i) =>
            (qid, id) -> (bm, rare, rrf, i + 1L)
        }
      }.toMap
  }

  test("hybrid rrf: brute-forced fusion, single-list docs, kappa sensitivity") {
    import spark.implicits._
    val docs = retrievalCorpus.toDF("doc_id", "text")
    def collect(k: Int, kappa: Int) =
      TextAnalysis.hybridRrf(docs, k = k, kappa = kappa).collect()
        .map(r => (r.getLong(0), r.getLong(1)) ->
          (Option(r.get(2)).map(_.asInstanceOf[Long]),
            Option(r.get(3)).map(_.asInstanceOf[Long]),
            r.getDouble(4), r.getLong(5))).toMap
    // full lists (k=20 > corpus): every scored doc sits in both lists
    assert(collect(20, 60) === rrfExpected(20, 60))
    // truncated lists (k=2): the full-outer fusion input carries docs in
    // exactly one list; the survivors must still match brute force
    assert(collect(2, 60) === rrfExpected(2, 60))
    // k=1: bm25's top-1 (multi-term doc 1) and rare-term's top-1 (high-tf
    // doc 6) disagree, so BOTH fused candidates are single-list — the
    // coalesce(0) path — and their fused scores tie EXACTLY (1/61 each):
    // the winner is decided purely by the doc_id tie-break
    val got1 = collect(1, 60)
    assert(got1 === rrfExpected(1, 60))
    val single = got1.filter { case (_, (bm, rare, _, _)) =>
      bm.isEmpty != rare.isEmpty }
    assert(single.nonEmpty, "k=1 must surface a single-list doc")
    // kappa shifts the rank-decay curve; the same brute force at κ=1
    // must still match exactly (the fused scores change, ties re-break)
    assert(collect(2, 1) === rrfExpected(2, 1))
  }

  test("lm buckets: per-language rank-convention terciles, ties share") {
    val docs = Tables.load(spark, sf, "documents")
    val got = TextAnalysis.lmBuckets(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getString(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .toMap
    assert(got.nonEmpty)
    // brute-force the documented cutoff convention per language: cut_t =
    // sorted(sc)[⌈n·t/3⌉ − 1], tier = 1 + |{cuts < sc}|
    got.values.groupBy(_._1).foreach { case (lang, rows) =>
      val sorted = rows.map(_._2).toArray.sorted
      val n = sorted.length
      val cuts = Seq(1, 2).map(t =>
        sorted(math.ceil(n * (t / 3.0)).toInt - 1))
      rows.foreach { case (_, sc, tier, bucket) =>
        assert(tier === 1L + cuts.count(sc > _), s"$lang sc=$sc")
        assert(bucket === Seq("tail", "middle", "head")(tier.toInt - 1))
      }
      // ties share a tier by construction of the rank rule
      rows.groupBy(_._2).foreach { case (sc, same) =>
        assert(same.map(_._3).toSet.size === 1, s"$lang sc=$sc split tiers")
      }
    }
  }

  test("quality model: hand-computed weights and scores on a labeled corpus") {
    import spark.implicits._
    // 30+ tokens, mean len in [3,10], 2 stopwords, max freq <= n/5 -> pass;
    // the two short docs fail r_wordcount -> weak-negative labels
    val passText1 = (1 to 28).map(i => s"word$i") .mkString(" ") + " the and"
    val passText2 = (1 to 29).map(i => s"term$i").mkString(" ") + " the and"
    val corpus = Seq(
      (1L, passText1), (2L, passText2),
      (3L, "junk junk junk"), (4L, "word1 term1 the and"))
    val docs = corpus.toDF("doc_id", "text")
    val got = TextAnalysis.qualityModelScore(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // independent recomposition: md5 bucketing, gopher labels, smoothed
    // rate-contrast weights, per-doc mean — plain Scala end to end
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def bucket(t: String): Long = java.lang.Long.parseLong(md5hex(t).take(4), 16) % 1024
    val stops = Set("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")
    val toks = corpus.map { case (id, t) =>
      id -> t.toLowerCase.trim.split("\\s+").toSeq }
    def gopherPass(ts: Seq[String]): Boolean = {
      val n = ts.size.toLong
      val sumLen = ts.map(_.length.toLong).sum
      val maxCnt = ts.groupBy(identity).values.map(_.size).max.toLong
      val nStop = ts.distinct.count(stops)
      n >= 30 && n <= 100000 && 3 * n <= sumLen && sumLen <= 10 * n &&
        nStop >= 2 && 5 * maxCnt <= n
    }
    val labeled = toks.map { case (id, ts) => (id, ts, gopherPass(ts)) }
    assert(labeled.count(_._3) === 2, "corpus must carry both labels")
    val occ = labeled.flatMap { case (_, ts, p) => ts.map(t => (bucket(t), p)) }
    val cpos = occ.filter(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cneg = occ.filterNot(_._2).groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val (npos, nneg) = (cpos.values.sum, cneg.values.sum)
    def weight(b: Long): Long = {
      val (cp, cn) = (cpos.getOrElse(b, 0L), cneg.getOrElse(b, 0L))
      if (cp == 0 && cn == 0) 0L
      else {
        val num = (cp + 1) * (nneg + 1024) - (cn + 1) * (npos + 1024)
        val den = (cp + 1) * (nneg + 1024) + (cn + 1) * (npos + 1024)
        math.floor(1e6 * (num.toDouble / den.toDouble)).toLong
      }
    }
    val expected = labeled.map { case (id, ts, _) =>
      val raw = ts.map(t => weight(bucket(t))).sum
      val score = math.floor(raw.toDouble / ts.size.toDouble).toLong
      id -> (ts.size.toLong, raw, score, score > 0L)
    }.toMap
    assert(got === expected)
    // the model learned the contrast: weak-positive docs score above the
    // weak-negative ones
    assert(got(1L)._3 > got(3L)._3)
    // persisted round trip is bit-exact
    val dir = java.nio.file.Files.createTempDirectory("graft_qmodel_spec").toString
    TextAnalysis.writeQualityModel(docs, dir)
    val persisted = TextAnalysis.qualityModelScorePersisted(docs, dir).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(persisted === expected)
  }

  test("quality model eval: confusion matrix counts, diagonal dominates") {
    val docs = Tables.load(spark, sf, "documents")
    val cells = TextAnalysis.qualityModelEval(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val total = cells.values.sum
    // cross-check the marginals against the two source pipelines
    val nPass = TextAnalysis.gopherRules(docs)
      .filter(org.apache.spark.sql.functions.col("pass")).count()
    assert(cells.filter(_._1._1).values.sum === nPass)
    assert(total === docs.count())
    // in-sample agreement: the model must learn its own weak labels —
    // the diagonal strictly outweighs the off-diagonal
    val agree = cells.getOrElse((true, true), 0L) +
      cells.getOrElse((false, false), 0L)
    info(s"model/gopher agreement: $agree/$total")
    assert(agree * 2 > total, s"model failed to learn its labels: $cells")
  }

  test("calibrated gate: rank-convention cut brute-forced, accept <= npos") {
    import spark.implicits._
    // same labeled corpus as the model spec: docs 1-2 weak-pass, 3-4 fail
    val passText1 = (1 to 28).map(i => s"word$i").mkString(" ") + " the and"
    val passText2 = (1 to 29).map(i => s"term$i").mkString(" ") + " the and"
    val docs = Seq(
      (1L, passText1), (2L, passText2),
      (3L, "junk junk junk"), (4L, "word1 term1 the and"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.qualityModelCalibrated(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    // brute-force the threshold from the engine's own scores (the score
    // formula itself is pinned by the quality-model spec): cut = score at
    // ascending rank max(n - npos, 1); cal_pass = score > cut
    val scores = got.values.map(_._2).toSeq.sorted
    val npos = got.values.count(_._1)
    val rn = math.max(scores.size - npos, 1)
    val cut = scores(rn - 1)
    got.foreach { case (id, (_, sc, c, cp)) =>
      assert(c === cut, s"doc $id cut")
      assert(cp === (sc > cut), s"doc $id verdict")
    }
    // count calibration: ties share a side, so accepted <= npos exactly
    // when the cut bin straddles the boundary
    assert(got.values.count(_._4) <= npos)
    // on this corpus the model separates the classes, so the calibrated
    // gate reproduces the weak labels exactly
    assert(got.values.forall { case (p, _, _, cp) => p === cp })
  }

  test("calibrated gate eval: both error types populated, beats score>0") {
    val docs = Tables.load(spark, sf, "documents")
    val cal = TextAnalysis.qualityModelCalibratedEval(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    val naive = TextAnalysis.qualityModelEval(docs).collect()
      .map(r => (r.getBoolean(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    def errOf(m: Map[(Boolean, Boolean), Long]): Long =
      m.getOrElse((true, false), 0L) + m.getOrElse((false, true), 0L)
    info(s"calibrated cells: $cal")
    info(s"score>0 cells:    $naive")
    // the operating point trades false-accepts for false-rejects: both
    // error cells must be populated (score>0's false-reject cell is empty)
    assert(cal.getOrElse((false, true), 0L) > 0L, "no false-accepts")
    assert(cal.getOrElse((true, false), 0L) > 0L, "no false-rejects")
    // and the trade must WIN: lower total error than the naive threshold
    assert(errOf(cal) < errOf(naive),
      s"calibrated error ${errOf(cal)} !< naive ${errOf(naive)}")
  }

  test("source divergence: brute-forced integer contrast, top-k per source") {
    import spark.implicits._
    // sA leans 'alpha', sB leans 'beta'; 'common' is background in both
    val docs = Seq(
      (1L, "alpha alpha alpha common", "en", "sA"),
      (2L, "alpha common common", "en", "sA"),
      (3L, "beta beta common common", "en", "sB"),
      (4L, "beta common", "en", "sB"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.sourceDivergence(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // brute force: occurrences → (source, tok) counts → contrast
    val occ = Seq("sA" -> "alpha", "sA" -> "alpha", "sA" -> "alpha",
      "sA" -> "common", "sA" -> "alpha", "sA" -> "common", "sA" -> "common",
      "sB" -> "beta", "sB" -> "beta", "sB" -> "common", "sB" -> "common",
      "sB" -> "beta", "sB" -> "common")
    val cSt = occ.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val nS = occ.groupBy(_._1).view.mapValues(_.size.toLong).toMap
    val cT = occ.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = occ.size.toLong
    val expected = cSt.toSeq.map { case ((s, t), c) =>
      (s, t, c, cT(t), c * n - cT(t) * nS(s))
    }.filter(_._5 > 0)
      .groupBy(_._1).toSeq.flatMap { case (_, rows) =>
        rows.sortBy(r => (-r._5, r._2)).zipWithIndex.map { case (r, i) =>
          (r._1, r._2) -> (r._3, r._4, r._5, i + 1L)
        }
      }.toMap
    assert(got === expected)
    // each source's #1 divergent token is its signature word
    assert(got(("sA", "alpha"))._4 === 1L)
    assert(got(("sB", "beta"))._4 === 1L)
    // the background word is UNDER-represented in sA (negative contrast)
    // and must be filtered out
    assert(!got.contains(("sA", "common")))
  }

  test("yield funnel: stage counts drop monotonically, hand-checked corpus") {
    import spark.implicits._
    val passText = (1 to 28).map(i => s"word$i").mkString(" ") + " the and"
    val docs = Seq(
      (1L, passText),                       // keeper, passes the gate
      (2L, "  " + passText + "  "),         // whitespace dup of 1 -> dropped at dedup
      (3L, "short junk"),                   // keeper, fails the gate
      (4L, "short junk"))                   // exact dup of 3 -> dropped at dedup
      .toDF("doc_id", "text")
    val got = TextAnalysis.yieldFunnel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toMap
    // raw: 4 docs, 30+30+2+2 = 64 tokens; dedup keeps docs 1 and 3;
    // gate keeps doc 1 only
    assert(got("raw") === ((1L, 4L, 64L)))
    assert(got("dedup") === ((2L, 2L, 32L)))
    assert(got("gated") === ((3L, 1L, 30L)))
  }

  test("yield funnel: edge-whitespace docs dedup on the canonical fingerprint") {
    // A trailing newline survives trim() (which strips only spaces), so
    // the canonical fingerprint(text) keeps the folded edge space and the
    // doc is NOT an exact dup of its un-terminated twin. The funnel must
    // agree with fingerprints()/dedup_exact_docs on that key — a key
    // re-derived from re-joined tokens silently dropped the edge space
    // and under-counted distinct docs here.
    import spark.implicits._
    val passText = (1 to 28).map(i => s"word$i").mkString(" ") + " the and"
    val docs = Seq((1L, passText), (2L, passText + "\n")).toDF("doc_id", "text")
    val nDistinct = TextAnalysis.fingerprints(docs).select("fp").distinct().count()
    assert(nDistinct === 2L)
    val got = TextAnalysis.yieldFunnel(docs).collect()
      .map(r => r.getString(1) -> r.getLong(2)).toMap
    assert(got("dedup") === nDistinct)
  }

  test("model funnel: 4 stages, model stage equals calibrated keepers") {
    import spark.implicits._
    val passText1 = (1 to 28).map(i => s"word$i").mkString(" ") + " the and"
    val passText2 = (1 to 29).map(i => s"term$i").mkString(" ") + " the and"
    val docs = Seq(
      (1L, passText1), (2L, passText2),
      (3L, "junk junk junk"), (4L, "word1 term1 the and"),
      (5L, passText1))                       // exact dup of 1
      .toDF("doc_id", "text")
    val got = TextAnalysis.yieldFunnelModel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toMap
    // the first three stages equal the 3-stage funnel on the same corpus
    val base = TextAnalysis.yieldFunnel(docs).collect()
      .map(r => r.getString(1) -> (r.getLong(0), r.getLong(2), r.getLong(3)))
      .toMap
    Seq("raw", "dedup", "gated").foreach(s => assert(got(s) === base(s), s))
    // model stage = keepers passing gopher AND the calibrated cut,
    // cross-checked against the registered gate + fingerprint ops
    val cal = TextAnalysis.qualityModelCalibrated(docs).collect()
      .map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    val fps = TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val keepers = fps.groupBy(_._2).values.map(_.map(_._1).min).toSet
    val gopherPass = TextAnalysis.gopherRules(docs)
      .filter(org.apache.spark.sql.functions.col("pass"))
      .collect().map(_.getLong(0)).toSet
    val expModel = keepers.intersect(gopherPass).filter(cal)
    assert(got("model")._2 === expModel.size.toLong)
    // concrete hand-check: 5 raw, 4 after dedup (doc 5 is a copy),
    // {1,2} pass gopher, and the calibrated cut rejects nothing further
    // here among gopher-passers (they are the top scorers)
    assert(got("raw")._2 === 5L)
    assert(got("dedup")._2 === 4L)
    assert(got("gated")._2 === 2L)
    assert(got("model") === ((4L, expModel.size.toLong,
      got("model")._3)))
  }

  test("source stats: brute-forced counts, dup ratio, language spread") {
    import spark.implicits._
    val docs = Seq(
      (1L, "alpha beta gamma", "en", "sA"),
      (2L, "  ALPHA   beta GAMMA ", "en", "sA"), // same fp as doc 1
      (3L, "uno dos tres cuatro", "es", "sA"),
      (4L, "один два", "ru", "sB"))
      .toDF("doc_id", "text", "lang", "source")
    val got = TextAnalysis.sourceStats(docs).collect()
      .map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))
      .toMap
    assert(got("sA") === ((3L, 10L, 2L, 2L, 1.0 - 2.0 / 3.0)))
    assert(got("sB") === ((1L, 2L, 1L, 1L, 0.0)))
  }
}
