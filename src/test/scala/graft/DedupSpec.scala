package graft

import graft.operators.Dedup

class DedupSpec extends GraftSpec {
  import spark.implicits._

  private def docsDf(rows: (Long, String)*) = rows.toDF("doc_id", "text")

  test("exact dedup keeps deterministic winner per key group") {
    val events = Seq(
      (1L, 10L, "click", 1.5),
      (2L, 10L, "click", 9.9), // dup key, larger event_id -> loses
      (3L, 10L, "view", 2.0),
      (4L, 11L, "click", 3.0)
    ).toDF("event_id", "user_id", "event_type", "value")
    val got = Dedup.exactDedup(events).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
    assert(got === Set(
      (10L, "click", 1L, 1.5), (10L, "view", 3L, 2.0), (11L, "click", 4L, 3.0)))
  }

  private val textA = "the quick brown fox jumps over the lazy dog again and again"
  private val textB = "completely different words about spark catalyst optimizer internals"

  test("minhash: identical docs get identical signatures and pair up") {
    val docs = docsDf((1L, textA), (2L, textA), (3L, textB))
    val sigs = Dedup.minhashSignatures(docs).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    (0 to 7).foreach(j => assert(sigs((1L, j)) === sigs((2L, j))))
    val pairs = Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("simhash: identical docs equal; near-identical docs are close in hamming") {
    val near = textA + " tail"
    val fp = Dedup.simhash(docsDf((1L, textA), (2L, textA), (3L, near), (4L, textB)))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(1L) === fp(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(fp(1L), fp(3L)) < hamming(fp(1L), fp(4L)))
  }

  test("simhash pairs: pigeonhole banding finds exactly the brute-force pairs") {
    // Hamming <= 3 on 32 bits leaves at least one of 4 bytes untouched, so
    // byte-bucket blocking has PERFECT recall at the threshold — the banded
    // result must equal the all-pairs scan, not approximate it.
    val docs = docsDf(
      (1L, textA), (2L, textA), (3L, textA + " tail"), (4L, textB),
      (5L, "an entirely unrelated batch of tokens for the fifth document"))
    val got = Dedup.simhashNearDupPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val fps = Dedup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val brute = (for {
      a <- fps.keys; b <- fps.keys if a < b
      h = java.lang.Long.bitCount(fps(a) ^ fps(b)) if h <= 3
    } yield (a, b, h.toLong)).toSet
    assert(got === brute)
    assert(got.contains((1L, 2L, 0L)), "identical docs must pair at hamming 0")
  }

  test("ngram jaccard: identical docs score 1.0; shingle-disjoint docs absent") {
    val got = Dedup.ngramJaccardPairs(docsDf((1L, textA), (2L, textA), (3L, textB)))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    assert(got((1L, 2L)) === 1.0)
    assert(!got.contains((1L, 3L)))
  }

  test("ngram jaccard: DF cap blocks corpus-common shingles, bounding buckets") {
    // "x y z" appears in every doc (df=5); each doc's other shingles are
    // unique to it, so pairs exist ONLY through the hot shingle.
    val docs = docsDf((1 to 5).map(i => (i.toLong, s"w${i}a w${i}b x y z")): _*)
    // cap below the hot shingle's df: its posting list must never form, so
    // no pair survives — the 10^12-pair stopword bucket cannot materialize
    assert(Dedup.ngramJaccardPairs(docs, maxDf = 2).collect().isEmpty)
    // default cap is far above this corpus: all 10 pairs appear, jaccard
    // exact over FULL set sizes (1 shared of 3+3 shingles)
    val uncapped = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(3)))
    assert(uncapped.length === 10)
    uncapped.foreach { case (_, j) => assert(math.abs(j - 0.2) < 1e-12) }
  }

  test("ngram containment flags the contained doc that jaccard scores low") {
    // doc 2 is a strict prefix of doc 1: every doc-2 shingle is in doc 1,
    // so containment_b = 1.0 while jaccard = 3/13 stays under any
    // near-dup threshold — the quote/boilerplate case.
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron"
    val smallDoc = "alpha beta gamma delta epsilon"
    val docs = docsDf((1L, big), (2L, smallDoc), (3L, textB))
    val got = Dedup.ngramContainmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(got.keySet === Set((1L, 2L)))
    val (nCommon, ca, cb) = got((1L, 2L))
    assert(nCommon === 3L && cb === 1.0, "small doc fully contained")
    assert(ca === 3.0 / 13.0)
    val jac = Dedup.ngramJaccardPairs(docs, minJaccard = 0.3).collect()
    assert(!jac.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L),
      "jaccard under a 0.3 near-dup threshold misses the containment pair")
  }

  test("ngram fused pair stats: union of the sibling queries, same ratios") {
    // The fused query prices the shared pair core once; its output must be
    // exactly the union of what the two siblings flag, with identical
    // ratio values (same arithmetic over the same counts).
    val big = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron"
    val docs = docsDf(
      (1L, big), (2L, "alpha beta gamma delta epsilon"),
      (3L, textA), (4L, textA + " tail"), (5L, textB))
    val fused = Dedup.ngramPairStats(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))).toMap
    val jac = Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getDouble(3))).toMap
    val con = Dedup.ngramContainmentPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(fused.keySet === jac.keySet ++ con.keySet)
    jac.foreach { case (k, (n, j)) =>
      assert(fused(k)._1 === n && fused(k)._2 === j) }
    con.foreach { case (k, (n, ca, cb)) =>
      assert(fused(k)._1 === n && fused(k)._3 === ca && fused(k)._4 === cb) }
    // the containment-only pair (strict prefix) must survive the fused
    // OR-filter even though its jaccard is under the threshold
    assert(fused.contains((1L, 2L)) && fused((1L, 2L))._2 < 0.3)
  }

  test("minhash eval: confusion matrix equals the composed pair sets") {
    // arithmetic pin: the gauge must equal the confusion matrix composed
    // from the two independently-tested pair queries on the same fixture
    val docs = Tables.load(spark, sf, "documents")
    val truth = graft.operators.Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    val pred = graft.operators.Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val thr = 0.1
    val nTrue = truth.count(_._2 >= thr)
    val nTp = truth.count { case (p, j) => j >= thr && pred(p) }
    val nFn = nTrue - nTp
    val nFp = pred.count(p => truth.get(p).forall(_ < thr))
    val r = graft.operators.Dedup.minhashEval(docs, thr).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)) ===
      ((nTrue.toLong, pred.size.toLong, nTp.toLong, nFn.toLong, nFp.toLong)))
    assert(r.getLong(5) === (if (nTrue == 0) 0L else nTp.toLong * 10000 / nTrue))
    assert(r.getLong(6) === (if (pred.isEmpty) 0L else nTp.toLong * 10000 / pred.size))
    // the gauge is meaningful on this corpus: non-empty truth and a
    // populated false-accept cell (the blocker over-generates)
    assert(nTrue > 0 && nFp > 0)
  }

  test("ngram decontamination flags a verbatim 13-gram, not a 12-gram") {
    // coin(doc_id): md5-coin in [0,100) — find ids on each side of the split
    def coin(id: Long): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"s0:$id".getBytes("UTF-8"))
        .take(4).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex, 16) % 100
    }
    val evalId = (1L to 200L).find(coin(_) < 10).get
    val trainIds = (1L to 200L).filter(coin(_) >= 10).take(3)
    val thirteen = (1 to 13).map(i => s"g$i").mkString(" ")
    val twelve = (1 to 12).map(i => s"g$i").mkString(" ")
    val docs = Seq(
      evalId -> s"eval preamble $thirteen eval tail",
      // shares the full 13-gram (inside unrelated context) -> flagged
      trainIds(0) -> s"train alpha text $thirteen closing words",
      // shares only 12 of the 13 tokens contiguously -> NOT flagged
      trainIds(1) -> s"train beta text $twelve different ending",
      // nothing shared -> not flagged
      trainIds(2) -> "wholly unrelated training content here"
    ).toDF("doc_id", "text")
    val got = Dedup.decontaminateNgramSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq === Seq((trainIds(0), evalId, 1L)),
      s"exactly the verbatim-13-gram pair must flag, got ${got.toSeq}")
  }

  test("split decontamination equals the two-frame form on the same coin split") {
    val docs = Tables.load(spark, sf, "documents")
    val coin = graft.operators.TextAnalysis.sampleCoin()
    val two = Dedup.decontaminateNear(
      docs.filter(coin >= 10), docs.filter(coin < 10)).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val split = Dedup.decontaminateNearSplit(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(split === two, "single-scan split form must not change the leak set")
  }

  test("decontamination: only cross-corpus near-dups surface") {
    // docs 1/2 are near-dups of eval doc 3 -> both leak; the 1-2 pair is
    // WITHIN the training set and must not appear; 4 is clean
    val train = docsDf((1L, textA), (2L, textA), (4L, textB))
    val evalDocs = docsDf((3L, textA))
    val got = Dedup.decontaminateNear(train, evalDocs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 3L), (2L, 3L)))
  }

  test("near-dup clusters: components labelled by min doc id, singletons self") {
    // 1-2 identical, 3 identical to both via chain 2-3 (same text), 4 alone
    val docs = docsDf((1L, textA), (2L, textA), (3L, textA), (4L, textB))
    val got = Dedup.nearDupClusters(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L))
  }

  test("leakage-safe split: no candidate pair straddles splits; rollup conserves docs") {
    // 40 two-doc near-dup clusters whose members' doc_ids are far apart —
    // the exact shape where a doc-keyed coin WOULD scatter pairs across
    // splits; the cluster-keyed coin must never
    val rows = (0L until 40L).flatMap { c =>
      val t = s"cluster $c shares one body of words long enough to shingle into many grams $c"
      Seq((c, t, "s1", t.length.toLong), (c + 1000L, t, "s2", t.length.toLong))
    }
    val docs = rows.toDF("doc_id", "text", "source", "n_chars")
    val asg = Dedup.splitAssignments(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("split")).toMap
    val pairs = Dedup.minhashCandidatePairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.nonEmpty)
    pairs.foreach { case (a, b) =>
      assert(asg(a) === asg(b), s"near-dup pair ($a, $b) straddles splits")
    }
    // non-vacuous: the deterministic coin does produce multiple splits
    assert(asg.values.toSet.size >= 2, asg.values.toSet.toString)
    val roll = Dedup.leakageSafeSplit(docs).collect()
    assert(roll.map(_.getAs[Long]("n_docs")).sum === 80L)
    assert(roll.map(_.getAs[Long]("sum_chars")).sum ===
      rows.map(_._4).sum)
  }

  test("connected components: chain graph converges in O(log n) rounds") {
    // The adversarial shape for plain min-label propagation: a single
    // chain 0-1-2-...-63 has diameter 63, so propagation alone needs ~63
    // rounds. The pointer-halving shortcut doubles the label horizon per
    // round: ≤ ⌈log₂ n⌉ + 1 rounds (the +1 is the fixpoint-detection
    // round where the label sum stops moving).
    val n = 64
    val chain = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("doc_a", "doc_b")
    val (labels, rounds) = Dedup.connectedComponents(chain)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === n)
    got.foreach { case (_, c) => assert(c === 0L) }
    val bound = (math.log(n) / math.log(2)).ceil.toInt + 1
    assert(rounds <= bound, s"chain-$n must converge in <= $bound rounds, took $rounds")
  }

  test("connected components: two components + self-pair edge cases") {
    val pairs = Seq((5L, 3L), (3L, 9L), (20L, 21L), (7L, 7L)).toDF("doc_a", "doc_b")
    val (labels, _) = Dedup.connectedComponents(pairs)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(3L -> 3L, 5L -> 3L, 9L -> 3L, 20L -> 20L, 21L -> 20L, 7L -> 7L))
  }

  test("duplicated windows: shared paragraph flags both docs, unique text neither") {
    // docs 1 and 2 share a 20-token run (one "paragraph"); doc 3 is unique;
    // doc 4 is too short to hold a single 16-token window
    val shared = (1 to 20).map(i => s"s$i").mkString(" ")
    val docs = docsDf(
      (1L, s"intro one two three $shared"),
      (2L, s"$shared outro four five six"),
      (3L, (1 to 30).map(i => s"u$i").mkString(" ")),
      (4L, "tiny doc"))
    val r = Dedup.duplicatedWindowStats(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r.size === 4, "every doc reports, even window-less ones")
    assert(r(4L).getAs[Long]("n_windows") === 0L)
    assert(r(4L).getAs[Double]("dup_window_ratio") === 0.0)
    assert(r(3L).getAs[Long]("n_dup_windows") === 0L)
    assert(r(1L).getAs[Long]("n_dup_windows") > 0L, "shared paragraph detected in 1")
    assert(r(2L).getAs[Long]("n_dup_windows") > 0L, "shared paragraph detected in 2")
    // brute-force recount: window at stride-4 positions, dup iff the same
    // 16-token text occurs (at any position) in some OTHER doc
    val toks = Map(
      1L -> s"intro one two three $shared", 2L -> s"$shared outro four five six",
      3L -> (1 to 30).map(i => s"u$i").mkString(" "), 4L -> "tiny doc")
      .view.mapValues(_.toLowerCase.split("\\s+").toSeq).toMap
    def windows(ts: Seq[String]) =
      (0 to (ts.size - 16) / 4).map(p => ts.slice(p * 4, p * 4 + 16).mkString(" "))
    val byDoc = toks.filter(_._2.size >= 16).view.mapValues(windows).toMap
    byDoc.foreach { case (id, ws) =>
      val others = byDoc.removed(id).values.flatten.toSet
      val expDup = ws.count(others.contains)
      assert(r(id).getAs[Long]("n_windows") === ws.size.toLong, s"doc $id windows")
      assert(r(id).getAs[Long]("n_dup_windows") === expDup.toLong, s"doc $id dups")
    }
  }

  test("dup-window verification catches both stride-hash failure modes") {
    // pair (1, 2): FALSE POSITIVE — identical lowered tokens, differing
    // case. The stride hash flags every aligned window; the char-exact
    // verifier rejects them all.
    val capA = (1 to 16).map(i => s"Word$i").mkString(" ")
    val capB = capA.toLowerCase
    // pair (10, 11): one aligned shared run S (flagged + verified) and a
    // second true duplicated run T that sits at a stride-straddling
    // offset in 11 (start 18, not ≡ 0 mod 4) — never flagged, but the
    // stride-1 recheck counts it.
    val s16 = (1 to 16).map(i => s"s$i").mkString(" ")
    val t16 = (1 to 16).map(i => s"t$i").mkString(" ")
    val docs = docsDf(
      (1L, capA), (2L, capB),
      (10L, s"$s16 u1 u2 u3 u4 $t16"),
      (11L, s"$s16 v1 v2 $t16 w1 w2"))
    val r = Dedup.dupWindowVerification(docs).collect()
      .map(x => (x.getAs[Long]("doc_a"), x.getAs[Long]("doc_b")) -> x).toMap
    assert(r.keySet === Set((1L, 2L), (10L, 11L)))
    // false positive: flagged but zero char-exact, precision 0, and the
    // stride-1 ground truth confirms NOTHING is truly shared
    val fp = r((1L, 2L))
    assert(fp.getAs[Long]("n_flagged") === 1L)
    assert(fp.getAs[Long]("n_char_exact") === 0L)
    assert(fp.getAs[Long]("n_true_s1") === 0L)
    assert(fp.getAs[Long]("precision_bp") === 0L)
    // straddling miss: one aligned window flagged AND verified, but the
    // pair truly shares TWO distinct 16-token windows at stride 1 — the
    // T run the stride hash missed is caught by the exact recheck
    val st = r((10L, 11L))
    assert(st.getAs[Long]("n_flagged") === 1L)
    assert(st.getAs[Long]("n_char_exact") === 1L)
    assert(st.getAs[Long]("precision_bp") === 10000L)
    assert(st.getAs[Long]("n_true_s1") === 2L)
  }

  test("dedup by content fingerprint collapses whitespace variants") {
    val docs = docsDf((1L, "a  b\tc"), (2L, " a b c "), (3L, "a b d"))
    val fps = graft.operators.TextAnalysis.fingerprints(docs).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
  }

  test("incremental dedup: delta-vs-index hits match a brute-forced join") {
    val docs = Tables.load(spark, sf, "documents")
    val md = java.security.MessageDigest.getInstance("MD5")
    def coin(id: Long): Long = {
      val hex = md.digest(s"inc:$id".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      java.lang.Long.parseLong(hex, 16) % 100
    }
    // independent recomposition: collected bucket rows + Scala-side coin
    val bk = graft.operators.Dedup.minhashBuckets(docs.select("doc_id", "text"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val index = bk.collect { case (id, b, k) if coin(id) >= 10 => (b, k) }.toSet
    val expected = bk.filter(t => coin(t._1) < 10)
      .groupBy(_._1).view
      .mapValues(_.count(t => index((t._2, t._3))).toLong).toMap
    val deltaIds = docs.select("doc_id").collect().map(_.getLong(0))
      .filter(coin(_) < 10).toSet
    val got = graft.operators.Dedup.incrementalDedup(docs).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bucket_hits"), r.getAs[Boolean]("is_dup"))).toMap
    assert(got.keySet === deltaIds,
      "every delta doc verdicts exactly once, incl. short docs with no buckets")
    got.foreach { case (id, (n, dup)) =>
      assert(n === expected.getOrElse(id, 0L), s"doc $id hits")
      assert(dup === (n > 0L), s"doc $id flag")
    }
    assert(got.values.exists(_._2), "the corpus's known dups collide")
  }

  test("persisted incremental dedup: appended index at N+1 equals a fresh build") {
    // the daily-crawl ratchet: base index on batch 0, verdict+append batch
    // 1, then batch 2's verdicts over the APPENDED index must equal its
    // verdicts over an index built fresh from batches 0+1
    val base = docsDf(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "red green blue yellow purple"))
    val d1 = docsDf(
      (11L, "alpha beta gamma delta epsilon"), // dup of 1
      (12L, "totally novel content about ships"))
    val d2 = docsDf(
      (21L, "totally novel content about ships"), // dup of 12 — ONLY via the append
      (22L, "one two three four five six"),      // dup of 2 — via the base
      (23L, "hi"),                               // too short to shingle
      (24L, "fresh unseen words entirely here"))
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bucket_hits"), r.getAs[Boolean]("is_dup"))).toMap
    val path = java.nio.file.Files.createTempDirectory("graft_incidx").toString
    Dedup.writeBucketIndex(base, path)
    val v1 = verdicts(Dedup.incrementalDedupPersisted(d1, path))
    assert(v1(11L)._2 && !v1(12L)._2)
    // batch 2 against the ratcheted index...
    val v2 = verdicts(Dedup.incrementalDedupPersisted(d2, path))
    // ...equals batch 2 against a fresh index over batches 0+1
    val path2 = java.nio.file.Files.createTempDirectory("graft_incidx2").toString
    Dedup.writeBucketIndex(base.unionByName(d1), path2)
    val v2fresh = verdicts(
      Dedup.incrementalDedupPersisted(d2, path2, append = false))
    assert(v2 === v2fresh)
    assert(v2(21L)._2, "doc 21 collides only with appended batch-1 buckets")
    assert(v2(22L)._2 && !v2(24L)._2)
    assert(v2(23L) === (0L, false), "short docs verdict once, with no buckets")
    // the artifact grew by exactly the delta's bucket rows (4 bands/doc;
    // doc 23 contributes none), and the eager verdict checkpoint means v2
    // was computed before its own append landed
    val idxRows = spark.read.parquet(path).count()
    val baseRows = Dedup.minhashBuckets(base).count()
    val dRows = Dedup.minhashBuckets(d1).count() + Dedup.minhashBuckets(d2).count()
    assert(idxRows === baseRows + dRows)
  }

  test("bucket-index compaction: one sorted file per band, rows and verdicts unchanged") {
    val base = docsDf(
      (1L, "alpha beta gamma delta epsilon"),
      (2L, "one two three four five six"),
      (3L, "red green blue yellow purple"))
    val d1 = docsDf(
      (11L, "alpha beta gamma delta epsilon"), // dup of 1
      (12L, "totally novel content about ships"))
    val d2 = docsDf(
      (21L, "totally novel content about ships"), // dup via the append
      (22L, "one two three four five six"))       // dup via the base
    val path = java.nio.file.Files.createTempDirectory("graft_inccmp").toString
    Dedup.writeBucketIndex(base, path)
    Dedup.incrementalDedupPersisted(d1, path).collect() // verdict+append
    def bandDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("band="))
    def parquets(d: java.io.File) =
      d.listFiles().filter(_.getName.endsWith(".parquet"))
    assert(bandDirs.exists(parquets(_).length > 1),
      "fixture produced no fragmented band")
    val rowsBefore = spark.read.parquet(path).collect().map(_.toSeq).toSet
    Dedup.compactBucketIndex(spark, path)
    bandDirs.foreach(d => assert(parquets(d).length === 1,
      s"${d.getName} has ${parquets(d).length} files after compaction"))
    assert(!new java.io.File(s"${path}_compacting").exists())
    assert(spark.read.parquet(path).collect().map(_.toSeq).toSet === rowsBefore)
    // verdicts over the compacted index == over a fresh 0+1 index
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("n_bucket_hits"), r.getAs[Boolean]("is_dup"))).toMap
    val v2 = verdicts(Dedup.incrementalDedupPersisted(d2, path, append = false))
    val path2 = java.nio.file.Files.createTempDirectory("graft_inccmp2").toString
    Dedup.writeBucketIndex(base.unionByName(d1), path2)
    assert(v2 === verdicts(
      Dedup.incrementalDedupPersisted(d2, path2, append = false)))
    assert(v2(21L)._2 && v2(22L)._2)
  }

  test("decision diff: lexical-only, semantic-only, and shared pairs counted correctly") {
    // (1,2): dup in BOTH signals; (5,6): lexical only (identical text,
    // orthogonal embeddings); (3,4): semantic only (identical embedding,
    // unrelated text)
    val docs = docsDf(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "completely different subject matter entirely here"),
      (4L, "unrelated musings on distributed query engines"),
      (5L, "pack my box with five dozen liquor jugs today"),
      (6L, "pack my box with five dozen liquor jugs today"))
    val emb = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (2L, Array(1.0f, 0.0f, 0.0f, 0.1f)),
      (3L, Array(0.0f, 1.0f, 0.0f, 0.1f)),
      (4L, Array(0.0f, 1.0f, 0.0f, 0.1f)),
      (5L, Array(0.0f, 0.0f, 1.0f, 0.1f)),
      (6L, Array(0.1f, 0.2f, -0.9f, 0.1f)) // cos vs 5 well below 0.35? no — anti-aligned
    ).toDF("vec_id", "embedding")
    val r = Dedup.decisionDiff(docs, emb).head()
    val (nl, ns, nb) = (r.getLong(0), r.getLong(1), r.getLong(2))
    // lexical: the two identical-text pairs; semantic: (1,2) and (3,4)
    assert(nl === 2L, s"lexical $nl")
    assert(ns === 2L, s"semantic $ns")
    assert(nb === 1L, s"both $nb")
    assert(r.getLong(3) === 5000L && r.getLong(4) === 5000L)
  }

  test("hammingProbePairs == brute all-pairs on random fingerprints, both widths") {
    // the pigeonhole guarantee is width-generic: at the recall bound
    // (2*nSeg - 1) the blocked join must equal the quadratic compare on
    // ARBITRARY fingerprints — seeded randoms, not corpus-shaped ones
    val rnd = new scala.util.Random(20260813L)
    for ((nBits, maxHam) <- Seq((32, 3), (64, 7))) {
      val mask = if (nBits == 64) -1L else (1L << nBits) - 1
      val fps = (0L until 300L).map { id =>
        // cluster some fingerprints so true near-pairs exist: every 10th
        // doc perturbs the previous one by a few bits
        val v =
          if (id % 10 != 0 && rnd.nextBoolean()) {
            var x = rnd.nextLong() & mask; x // fresh
          } else rnd.nextLong() & mask
        id -> v
      }
      val clustered = fps.map { case (id, v) =>
        if (id % 3 == 0 && id > 0)
          id -> (fps((id - 1).toInt)._2 ^ (1L << rnd.nextInt(nBits)))
        else id -> v
      }
      val expected = (for {
        (a, fa) <- clustered; (b, fb) <- clustered if a < b
        d = java.lang.Long.bitCount(fa ^ fb) if d <= maxHam
      } yield (a, b, d.toLong)).toSet
      val df = clustered.toDF("doc_id", "fp")
      val got = graft.operators.Dedup.hammingProbePairs(df, "fp", nBits, maxHam)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got === expected, s"nBits=$nBits")
      assert(expected.nonEmpty, s"nBits=$nBits: the clustered fps must yield pairs")
    }
  }

  test("passage dedup: first corpus-wide occurrence survives (brute force)") {
    // width=2 passages: doc1 = [a b][c d], doc2 = [a b][x y] (shares one
    // passage with doc1), doc3 = [c d] twice (in-doc repeat + cross-doc),
    // doc4 unique, doc5 shorter than one window
    val docs = docsDf(
      (1L, "a b c d"),
      (2L, "a b x y"),
      (3L, "c d c d"),
      (4L, "p q r s"),
      (5L, "z"))
    val got = graft.operators.Dedup.passageDedup(docs, width = 2).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("n_passages"), r.getAs[Long]("n_dup_dropped"),
          r.getAs[Long]("n_tokens_kept"))).toMap
    // brute force: group occurrences by passage text, keep min (doc, widx)
    assert(got(1L) === ((2L, 0L, 4L)), "doc1 owns both its passages")
    assert(got(2L) === ((2L, 1L, 2L)), "doc2 loses [a b] to doc1")
    assert(got(3L) === ((2L, 2L, 0L)), "doc3 loses both [c d] to doc1's")
    assert(got(4L) === ((2L, 0L, 4L)))
    assert(got(5L) === ((1L, 0L, 1L)), "short doc is one sub-width passage")
  }

  test("cross-source dup stats: pair counts land in ordered source cells") {
    // sX self-duplicates (two copies of textA); sY copies sX (a third
    // copy); sZ is clean — so the matrix has a diagonal cell, one
    // off-diagonal cell, and no sZ row at all
    val docs = Seq(
      (1L, textA, "sX"), (2L, textA, "sX"),
      (3L, textA, "sY"), (4L, textB, "sZ"))
      .toDF("doc_id", "text", "source")
    val got = Dedup.crossSourceDupStats(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // pairs among the three textA copies: (1,2) in sX/sX, (1,3) and
    // (2,3) each in sX/sY
    assert(got === Map(("sX", "sX") -> 1L, ("sX", "sY") -> 2L))
  }

  test("script-aware tokens: ASCII bit-identical to the legacy split") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, split, lower, trim}
    // the seam's no-op contract: on text without Han/kana/Thai
    // codepoints (incl. accented Latin, digits, punctuation, tabs) the
    // segmented tokenization equals the raw lower+trim+split EXACTLY —
    // what keeps all ASCII oracles and persisted artifacts byte-stable
    val docs = Seq(
      (1L, "The QUICK brown\tfox  jumps"),
      (2L, "  café naïve Zürich 42 !? "),
      (3L, "a-b c_d e.f"),
      (4L, "single")).toDF("doc_id", "text")
    val seam = operators.TextAnalysis.tokensExploded(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    val legacy = docs.select(col("doc_id"),
      org.apache.spark.sql.functions.posexplode(
        split(lower(trim(col("text"))), "\\s+")).as(Seq("pos", "tok")))
      .collect().map(r => (r.getLong(0), r.getInt(1).toLong, r.getString(2)))
      .toSet
    assert(seam === legacy)
  }

  test("script-aware tokens: unsegmented scripts split per codepoint") {
    import spark.implicits._
    val docs = Seq(
      (1L, "大规模语言模型的训练数据质量"),
      (2L, "大规模语言模型的训练数据工程"),
      (3L, "機械学習モデルを訓練する"),
      (4L, "mixed 中文 and English 文本 tokens"),
      (5L, "ยินดี")).toDF("doc_id", "text")
    val toks = operators.TextAnalysis.tokensExploded(docs).collect()
      .map(r => (r.getLong(0), r.getString(2)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    // zh/ja: one token per ideograph/kana (12 resp. 14 codepoints);
    // thai: per codepoint including combining marks (documented)
    assert(toks(1L).size === 14 && toks(1L).forall(_.length == 1))
    assert(toks(3L).size === 12)
    assert(toks(5L).size === 5)
    // mixed text keeps Latin words whole and splits only the CJK runs
    assert(toks(4L) === Seq("mixed", "中", "文", "and", "english", "文", "本",
      "tokens"))
    // the payoff: per-character shingles make the zh near-dup pair
    // visible to the n-gram machinery (pre-seam: one token, no shingles,
    // invisible) — brute-forced jaccard = |common|/|union| of 3-gram sets
    val pairs = operators.Dedup.ngramJaccardPairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    def sh(s: Seq[String]): Set[String] =
      s.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet
    val (a, b) = (sh(toks(1L)), sh(toks(2L)))
    val expJ = a.intersect(b).size.toDouble / a.union(b).size.toDouble
    assert(pairs.contains((1L, 2L)), s"zh near-dup pair missing: $pairs")
    assert(pairs((1L, 2L)) === expJ)
  }
}
