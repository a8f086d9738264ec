package graft

import graft.operators.Packing

class PackingSpec extends GraftSpec {

  test("pack offsets equal the per-language running token sum (brute force)") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Packing.packTokenShards(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val raw = docs.select("doc_id", "lang", "text").collect()
      .map(r => (r.getLong(0), r.getString(1),
        r.getString(2).trim.toLowerCase.split("\\s+").length.toLong))
    raw.groupBy(_._2).foreach { case (lang, ds) =>
      var cum = 0L
      ds.sortBy(_._1).foreach { case (id, _, n) =>
        val r = got(id)
        assert(r.getAs[Long]("n_tokens") === n, s"doc $id tokens")
        assert(r.getAs[Long]("tok_offset") === cum, s"doc $id ($lang) offset")
        assert(r.getAs[Long]("shard_id") === cum / 4096L, s"doc $id shard")
        cum += n
      }
    }
    assert(got.size === raw.length, "every doc packed exactly once")
  }

  test("shard spans tile every doc exactly and chain across boundaries") {
    // tiny budget so boundary crossings are plentiful
    val docs = Tables.load(spark, sf, "documents")
    val budget = 64L
    val spans = Packing.packShardSpans(docs, budgetTokens = budget).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getBoolean(5)))
    val packed = Packing.packTokenShards(docs, budgetTokens = budget).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(2), r.getLong(3)))).toMap // n_tokens, tok_offset
    assert(spans.exists(_._6), "fixture must produce boundary crossings")
    spans.groupBy(_._1).foreach { case (id, ss) =>
      val (n, off) = packed(id)
      val inOrder = ss.sortBy(_._3)
      // spans tile the doc: total length = n_tokens, first starts at
      // off mod budget, shards are consecutive, every span but the last
      // is flagged `continues` and runs to the shard's end
      assert(inOrder.map(s => s._5 - s._4).sum === n, s"doc $id tiling")
      assert(inOrder.head._4 === off % budget, s"doc $id first start")
      assert(inOrder.map(_._3) === (inOrder.head._3 to inOrder.last._3),
        s"doc $id shards not consecutive")
      inOrder.init.foreach { s =>
        assert(s._6 && s._5 === budget, s"doc $id mid-span must fill to budget")
      }
      val last = inOrder.last
      assert(!last._6, s"doc $id last span must not continue")
      inOrder.tail.foreach(s => assert(s._4 === 0L, s"doc $id continuation start"))
    }
    assert(spans.groupBy(_._1).size === packed.size, "every doc has spans")
  }

  test("pack is band-width invariant (the banded decomposition is exact)") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Packing.packTokenShards(docs, bandWidth = 64L).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("tok_offset"))).toMap
    val b = Packing.packTokenShards(docs, bandWidth = 7L).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("tok_offset"))).toMap
    assert(a === b)
  }

  test("capped mixture: weights sum to 1, caps bind, rep factor exact") {
    val docs = Tables.load(spark, sf, "documents")
    // cap 100 binds on the tiny sf0.001 domains (the registered default,
    // 400, binds from sf0.01 up — same code path, different knob)
    val rows = Packing.mixCappedWeights(docs, capTokens = 100L).collect()
    val total = rows.map(_.getAs[Long]("capped_tokens")).sum
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    assert(rows.exists(r =>
      r.getAs[Long]("capped_tokens") < r.getAs[Long]("dom_tokens")),
      "at least one domain is capped on this corpus")
    rows.foreach { r =>
      val domTokens = r.getAs[Long]("dom_tokens")
      val capped = r.getAs[Long]("capped_tokens")
      assert(capped === math.min(domTokens, 100L))
      assert(r.getAs[Double]("weight") === capped.toDouble / total.toDouble)
      assert(r.getAs[Double]("rep_factor") ===
        (capped * 1000000L).toDouble / (total * domTokens).toDouble)
    }
  }

  test("temperature mixture: sqrt-scaled weights sum to 1 and flatten the head") {
    val docs = Tables.load(spark, sf, "documents")
    val rows = Packing.mixTemperature(docs).collect()
    val total = rows.map(_.getAs[Long]("s_alpha")).sum
    assert(math.abs(rows.map(_.getAs[Double]("weight")).sum - 1.0) < 1e-9)
    rows.foreach { r =>
      val domTokens = r.getAs[Long]("dom_tokens")
      val s = r.getAs[Long]("s_alpha")
      assert(s === math.floor(1000.0 * math.sqrt(domTokens.toDouble)).toLong)
      assert(r.getAs[Double]("weight") === s.toDouble / total.toDouble)
      assert(r.getAs[Double]("rep_factor") ===
        (s.toDouble / total.toDouble) * 1000000.0 / domTokens.toDouble)
    }
    // alpha = 1/2 flattens: the head domain's share shrinks vs proportional,
    // the tail domain's grows
    val byTokens = rows.sortBy(_.getAs[Long]("dom_tokens"))
    val allTokens = rows.map(_.getAs[Long]("dom_tokens")).sum.toDouble
    val head = byTokens.last
    val tail = byTokens.head
    assert(head.getAs[Double]("weight") <
      head.getAs[Long]("dom_tokens").toDouble / allTokens)
    assert(tail.getAs[Double]("weight") >
      tail.getAs[Long]("dom_tokens").toDouble / allTokens)
  }

  test("mixture materialization: copy counts replay the weights exactly") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Packing.mixApplySampling(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_copies")).toMap
    // brute-force the whole pipeline: domain weights -> rep factor ->
    // md5 bucket -> copies
    val raw = docs.select("doc_id", "lang", "source", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)),
        r.getString(3).trim.toLowerCase.split("\\s+").length.toLong))
    val domTok = raw.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    val sAlpha = domTok.view
      .mapValues(t => math.floor(1000.0 * math.sqrt(t.toDouble)).toLong).toMap
    val total = sAlpha.values.sum.toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    var totalCopies = 0L
    raw.foreach { case (id, dom, _) =>
      val rep = (sAlpha(dom) / total) * 1000000.0 / domTok(dom).toDouble
      val hex = md.digest(s"$id#mix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val bucket = java.lang.Long.parseLong(hex, 16)
      val extra = if (bucket < math.floor((rep - math.floor(rep)) *
        4294967296.0).toLong) 1L else 0L
      val expect = math.floor(rep).toLong + extra
      assert(got(id) === expect, s"doc $id copies")
      totalCopies += expect
    }
    assert(got.size === raw.length)
    // the materialized mixture should land near the token target in
    // expectation (hash buckets are uniform)
    val gotTokens = raw.map { case (id, _, n) => got(id) * n }.sum.toDouble
    assert(gotTokens > 700000 && gotTokens < 1300000,
      s"materialized tokens $gotTokens vs target 1000000")
  }

  test("cluster-balanced sampling: copy counts replay sqrt(cell-size) weights") {
    val emb = Tables.load(spark, sf, "embeddings")
    val got = Packing.mixClusterBalanced(emb).collect()
      .map(r => r.getLong(0) ->
        (r.getAs[Long]("cell"), r.getAs[Long]("n_vecs"),
          r.getAs[Long]("n_copies"))).toMap
    // independent recomposition of the mixture arithmetic from the
    // operator's OWN cell assignment (the assignment itself is verified
    // against the brute-forced sim_ann_ivf oracle CTE at the gate)
    val cells = graft.operators.Similarity.ivfCells(emb).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet === cells.keySet, "every vector samples exactly once")
    val sizes = cells.values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sAlpha = sizes.view
      .mapValues(n => math.floor(1000.0 * math.sqrt(n.toDouble)).toLong).toMap
    val total = sAlpha.values.sum.toDouble
    val md = java.security.MessageDigest.getInstance("MD5")
    got.foreach { case (id, (cell, nVecs, copies)) =>
      assert(cell === cells(id))
      assert(nVecs === sizes(cell))
      val rep = (sAlpha(cell) / total) * 100000.0 / sizes(cell).toDouble
      val hex = md.digest(s"$id#cmix".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val bucket = java.lang.Long.parseLong(hex, 16)
      val extra = if (bucket < math.floor((rep - math.floor(rep)) *
        4294967296.0).toLong) 1L else 0L
      assert(copies === math.floor(rep).toLong + extra, s"vec $id copies")
    }
    // flattening: a small cell's expected per-vec duplication exceeds a
    // large cell's (weight ∝ sqrt(size) ⇒ rep ∝ 1/sqrt(size))
    val reps = sizes.keys.map(c =>
      sizes(c) -> (sAlpha(c) / total) * 100000.0 / sizes(c).toDouble).toSeq
    assert(reps.minBy(_._1)._2 > reps.maxBy(_._1)._2)
  }

  test("train/holdout split: deterministic, exhaustive, and md5-faithful") {
    val docs = Tables.load(spark, sf, "documents")
    val a = Packing.splitTrainHoldout(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("bucket"), r.getAs[String]("split")))
      .toMap
    val b = Packing.splitTrainHoldout(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("bucket"), r.getAs[String]("split")))
      .toMap
    assert(a === b, "split is a pure function of doc_id")
    assert(a.size === docs.count(), "every doc assigned exactly once")
    val md = java.security.MessageDigest.getInstance("MD5")
    a.foreach { case (id, (bucket, split)) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.substring(0, 8)
      val expect = java.lang.Long.parseLong(hex, 16) % 100
      assert(bucket === expect, s"doc $id bucket")
      assert(split === (if (bucket < 95) "train" else "holdout"), s"doc $id split")
    }
    // 5% expected holdout; the md5 buckets should land in the right decade
    val frac = a.values.count(_._2 == "holdout").toDouble / a.size
    assert(frac > 0.005 && frac < 0.15, s"holdout fraction $frac")
  }

  test("global shuffle: a seed-stable permutation, contiguous within shards") {
    val docs = Tables.load(spark, sf, "documents")
    val n = docs.count()
    val rows = Packing.shuffleOrder(docs).collect()
    assert(rows.length === n && rows.map(_.getLong(0)).distinct.length === n,
      "a permutation: every doc exactly once")
    rows.groupBy(_.getAs[Long]("shard")).foreach { case (shard, rs) =>
      val ps = rs.map(_.getAs[Long]("pos")).sorted
      assert(ps === (1L to rs.length.toLong).toArray,
        s"shard $shard positions are 1..${rs.length}")
    }
    val again = Packing.shuffleOrder(docs).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .toMap
    assert(rows.map(r => r.getLong(0) ->
      (r.getAs[Long]("shard"), r.getAs[Long]("pos"))).toMap === again,
      "same seed, same permutation")
    val reseeded = Packing.shuffleOrder(docs, seed = 43L).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("shard"), r.getAs[Long]("pos")))
      .toMap
    assert(reseeded !== again, "different seed, different permutation")
    // the order within a shard must follow the md5 keys, not doc_id
    val shard0 = rows.filter(_.getAs[Long]("shard") === 0L)
      .sortBy(_.getAs[Long]("pos")).map(_.getLong(0))
    assert(shard0.length < 2 || !(shard0.sameElements(shard0.sorted)),
      "shuffled order is not doc_id order")
  }

  test("lm-tier mixture: copies follow the tier policy, tiers match lmBuckets") {
    val docs = Tables.load(spark, sf, "documents")
    val got = Packing.mixLmTiers(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3)))
      .toMap
    val tiers = graft.operators.TextAnalysis.lmBuckets(docs).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(3))).toMap
    assert(got.keySet === tiers.keySet)
    got.foreach { case (id, (lang, tier, copies)) =>
      assert((lang, tier) === tiers(id))
      // the CCNet policy: head 2x, middle 1x, tail dropped (= tier - 1)
      assert(copies === tier - 1L, s"doc $id tier $tier copies $copies")
    }
    // expected volume: heads double, tails vanish — per language the copy
    // sum equals n_middle + 2*n_head
    got.values.groupBy(_._1).foreach { case (lang, rows) =>
      val nHead = rows.count(_._2 == 3L)
      val nMid = rows.count(_._2 == 2L)
      assert(rows.map(_._3).sum === nMid + 2L * nHead, lang)
    }
  }

  test("bpe train: merges feed back and apply IN ORDER (precedence)") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq((1L, "a b c a b c a b c d")).toDF("doc_id", "text")
    val merges = TextAnalysis.bpeLearn(docs, 3)
    // round 1: (a,b) x3 (ties with (b,c), pair-asc tiebreak); round 2's
    // LEFT SIDE IS ROUND 1'S MERGED TOKEN -- the fed-back table; round 3
    // merges two round-2 units with the greedy odd-occurrence rule
    assert(merges(0) === ((1L, "a", "b", 3L)))
    assert(merges(1) === ((2L, "a b", "c", 3L)))
    assert(merges(2) === ((3L, "a b c", "a b c", 2L)))
    // precedence: a JVM replay of the rules IN ORDER reproduces the
    // engine's final token stream; the REVERSED order cannot (rule 2
    // finds no "a b" token before rule 1 has run)
    def apply1(toks: Seq[String], a: String, b: String): Seq[String] =
      toks.foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == a && t == b)
          acc.init :+ (a + " " + b)
        else acc :+ t
      }
    val base = "a b c a b c a b c d".split(" ").toSeq
    val rules = merges.map(m => (m._2, m._3))
    val inOrder = rules.foldLeft(base) { case (t, (a, b)) => apply1(t, a, b) }
    val reversed = rules.reverse.foldLeft(base) {
      case (t, (a, b)) => apply1(t, a, b)
    }
    val engine = TextAnalysis.tokenizeBpe(docs, 3)
      .orderBy("pos").collect().map(_.getString(2)).toSeq
    assert(engine === inOrder)
    assert(inOrder === Seq("a b c a b c", "a b c", "d"))
    assert(reversed !== inOrder, "rule order must matter on this fixture")
  }

  test("bpe artifact round trip: loaded table identical, coverage exact") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c a b c a b c d"),
      (2L, "a b e a b e")).toDF("doc_id", "text")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_bpe_spec").toString
    val loaded = TextAnalysis.bpeTrainPersisted(spark, docs, scratch, k = 2)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(loaded === TextAnalysis.bpeLearn(docs, 2))
    // coverage from the LOADED artifact: rule 1 (a,b) x5, rule 2 the
    // corpus-dependent follow-up; recompute expectations via the JVM fold
    def apply1(toks: Seq[String], a: String, b: String): Seq[String] =
      toks.foldLeft(Vector.empty[String]) { (acc, t) =>
        if (acc.nonEmpty && acc.last == a && t == b)
          acc.init :+ (a + " " + b)
        else acc :+ t
      }
    val rules = loaded.map(m => (m._2, m._3))
    val fin = Seq("a b c a b c a b c d", "a b e a b e")
      .map(_.split(" ").toSeq)
      .map(t => rules.foldLeft(t) { case (x, (a, b)) => apply1(x, a, b) })
    val nTok = fin.map(_.size).sum.toLong
    val nMerged = fin.map(_.count(_.contains(" "))).sum.toLong
    val cov = TextAnalysis.bpeCoverageTrained(spark, docs, scratch, k = 2)
      .head()
    assert(cov.getAs[Long]("n_tokens") === nTok)
    assert(cov.getAs[Long]("n_merged") === nMerged)
    assert(cov.getAs[Long]("merged_bp") === 10000L * nMerged / nTok)
  }

  test("batched bpe: non-interfering merges batch into one pass, table ≡ sequential") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // (a,b) and (c,d) share no chain tokens and no new pair ties them:
    // one pass selects both, and the merge table equals the
    // 1-merge-per-pass reference at half the passes
    val docs = Seq((1L, "a b a b c d c d")).toDF("doc_id", "text")
    val (bat, passes) = TextAnalysis.bpeLearnBatched(docs, k = 2, batchSize = 2)
    assert(passes === 1, "non-interfering top-2 must fit one pass")
    assert(bat === TextAnalysis.bpeLearn(docs, 2))
    assert(bat === Seq((1L, "a", "b", 2L), (2L, "c", "d", 2L)))
  }

  test("batched bpe: chain-interfering merges DEFER to a later pass with recounted stats") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    // top pair (x,y) x3; every other candidate chains with it ((y,z)'s
    // left is its right, (z,x)'s right is its left) — pass 1 must select
    // ONLY (x,y) and the deferred merge re-counts AFTER the rewrite
    // (where it becomes ("x y", z), the sequential round-2 pick)
    val docs = Seq((1L, "x y z x y z x y w")).toDF("doc_id", "text")
    val (bat, passes) = TextAnalysis.bpeLearnBatched(docs, k = 2, batchSize = 2)
    assert(passes === 2, "chained candidates must not share a pass")
    assert(bat === Seq((1L, "x", "y", 3L), (2L, "x y", "z", 2L)))
    // and deferral keeps the table equal to the sequential reference
    assert(bat === TextAnalysis.bpeLearn(docs, 2))
  }

  test("batched bpe artifact: persisted round trip identical to the in-process table") {
    import spark.implicits._
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c a b c a b c d"),
      (2L, "a b e a b e")).toDF("doc_id", "text")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_bpeb_spec").toString
    val loaded = TextAnalysis
      .bpeTrainBatchedPersisted(spark, docs, scratch, k = 2, batchSize = 2)
      .orderBy("merge_round").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
      .toSeq
    assert(loaded === TextAnalysis.bpeLearnBatched(docs, 2, 2)._1)
  }

  test("incremental pair counts ≡ full recount after a chain-free batch " +
    "(interfering, self-run, adjacent-merge, randomized corpora)") {
    import spark.implicits._
    import graft.operators.TextAnalysis._
    import org.apache.spark.sql.functions._
    def cntMap(df: org.apache.spark.sql.DataFrame): Map[(String, String), Long] =
      df.collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    def checkOnePass(docs: org.apache.spark.sql.DataFrame, batchSize: Int): Unit = {
      // whitespace split suffices here: the property is count algebra
      // over an arbitrary token sequence, not tokenizer parity
      val toks = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      val pairs = bpePairs(toks).localCheckpoint()
      val cnts = bpeCounts(pairs)
      val top = cnts.orderBy(desc("n"), asc("tok"), asc("nxt"))
        .limit(batchSize * 8).collect()
      if (top.isEmpty) return
      // the trainer's own chain-free greedy selection
      val lefts = scala.collection.mutable.Set.empty[String]
      val rights = scala.collection.mutable.Set.empty[String]
      val sel = scala.collection.mutable.ListBuffer.empty[(String, String)]
      for (r <- top if sel.size < batchSize) {
        val (a, b) = (r.getString(0), r.getString(1))
        if (!rights(a) && !lefts(b)) { sel += ((a, b)); lefts += a; rights += b }
      }
      val mergedAt = sel.toSeq.map { case (a, b) => bpeOccurrences(pairs, a, b) }
        .reduce(_ unionByName _).localCheckpoint()
      val recount = cntMap(bpeCounts(bpePairs(bpeRewrite(pairs, mergedAt))))
      val incr = cntMap(
        cnts.select(col("tok"), col("nxt"), col("n").as("dn"))
          .unionByName(bpeCountDelta(pairs, mergedAt))
          .groupBy(col("tok"), col("nxt")).agg(sum(col("dn")).as("n"))
          .filter(col("n") > 0))
      assert(incr === recount, docs.collect().mkString("; "))
    }
    // chain interference, a self-run, adjacent merges of the same pair
    checkOnePass(Seq((1L, "x y z x y z x y w")).toDF("doc_id", "text"), 2)
    checkOnePass(Seq((1L, "x x x x x")).toDF("doc_id", "text"), 2)
    checkOnePass(Seq((1L, "a b a b a b c")).toDF("doc_id", "text"), 2)
    // randomized corpora over a 4-letter alphabet (seeded): adjacency,
    // run, and doc-boundary cases arise by volume
    val rnd = new scala.util.Random(20260816L)
    for (_ <- 1 to 8) {
      val docs = (1 to 3).map { d =>
        val len = 5 + rnd.nextInt(26)
        (d.toLong, (1 to len).map(_ => ('a' + rnd.nextInt(4)).toChar.toString)
          .mkString(" "))
      }.toDF("doc_id", "text")
      checkOnePass(docs, 3)
    }
  }

  test("multi-pass trainer: delta-maintained and recounting arms select " +
    "identical merge tables in identical passes (the k64 gauge's A/B)") {
    import graft.operators.TextAnalysis.bpeLearnBatched
    val docs = Tables.load(spark, sf, "documents")
    val (delta, pd) = bpeLearnBatched(docs, 16, 8)
    val (rec, pr) = bpeLearnBatched(docs, 16, 8, recount = true)
    assert(delta === rec,
      "the recounting arm must reproduce the delta-maintained selection")
    assert(pd === pr && pd === 2,
      s"batches fill on this corpus: expected k/batchSize = 2 passes, " +
        s"got delta=$pd recount=$pr")
  }

  test("k64 trainer arm=auto picks the measured winner by corpus size; " +
    "an unknown arm is refused") {
    import graft.operators.TextAnalysis
    val docs = Tables.load(spark, sf, "documents")
    val scratch = java.nio.file.Files
      .createTempDirectory("graft_bpe_arm").toString
    // the spec corpus sits far below bpeDeltaMinChars (the measured
    // crossover bracket is 24-48M chars), so auto must take the recount
    // arm — visible in the artifact suffix the recount path writes
    assert(docs.agg(org.apache.spark.sql.functions.sum(
      org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")))).head.getLong(0) <
      TextAnalysis.bpeDeltaMinChars)
    TextAnalysis.bpeTrainK64(spark, docs, scratch, k = 8, batchSize = 4)
    assert(new java.io.File(s"$scratch/bpe_merges_k8_recount").exists(),
      "auto below the crossover must select the recount arm")
    assert(!new java.io.File(s"$scratch/bpe_merges_k8").exists())
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.bpeTrainK64(spark, docs, scratch, k = 8, batchSize = 4,
        arm = "bogus")
    }
    assert(e.getMessage.contains("auto|delta|recount"))
  }
}
