package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions.col

class EntityResolutionSpec extends GraftSpec {
  import spark.implicits._

  // (key, name): "gren widget"/"green widgt" are both 1 edit from
  // "green widget" but 2 edits from each other (and those two edits touch
  // DIFFERENT positions — the case that breaks naive prefix blocking);
  // "blue bolt"/"blue belt" is a plain substitution pair; "anvil" is a
  // singleton far from everything.
  private def partsDf = Seq(
    (1L, "green widget"), (2L, "gren widget"), (3L, "green widgt"),
    (4L, "green widget"), // repeated row: support 2, ent_id stays 1
    (5L, "blue bolt"), (6L, "blue belt"),
    (7L, "anvil"),
    // transitive chain: d(8,9)=2, d(9,10)=2, but d(8,10)=4 — the
    // endpoints must still co-cluster through the middle link
    (8L, "aaaaaa"), (9L, "aabbaa"), (10L, "bbbbaa")
  ).toDF("p_partkey", "p_name")

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (j == 0) i else if (i == 0) j else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("delete variants: exact ≤2-deletion neighborhood of a short string") {
    val got = EntityResolution.deleteVariants(Seq("abc").toDF("name"), 2)
      .collect().map(_.getString(1)).toSet
    // 0 deletions: abc; 1: bc, ac, ab; 2: a, b, c
    assert(got === Set("abc", "bc", "ac", "ab", "a", "b", "c"))
  }

  test("fuzzy pairs: SymSpell blocking equals brute-force levenshtein ≤ 2") {
    val names = partsDf.select("p_name").distinct().as[String].collect().sorted
    val brute = (for {
      a <- names; b <- names if a < b && lev(a, b) <= 2
    } yield (a, b)).toSet
    // the fixture must actually exercise a distance-2 pair whose edits hit
    // different positions (deletion-variant intersection, not prefix match)
    assert(brute.contains(("green widgt", "gren widget")))
    val gotPairs = EntityResolution.fuzzyPairs(partsDf, "p_name", "p_partkey")
      .select("name_a", "name_b").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotPairs === brute)
  }

  test("fuzzy pairs: distances and supports are exact") {
    val rows = EntityResolution.fuzzyPairs(partsDf, "p_name", "p_partkey")
      .collect().map(r => (r.getAs[String]("name_a"), r.getAs[String]("name_b"),
        r.getAs[Long]("dist"), r.getAs[Long]("support_a"), r.getAs[Long]("support_b")))
    rows.foreach { case (a, b, d, sa, sb) =>
      assert(d === lev(a, b).toLong)
      assert(sa === (if (a == "green widget") 2L else 1L))
      assert(sb === (if (b == "green widget") 2L else 1L))
    }
  }

  test("fuzzy pairs: blocking completeness on random strings, three seeds") {
    // small alphabet + short lengths force plenty of d<=2 pairs with
    // edits at arbitrary positions — the adversarial load for the
    // deletion-neighborhood completeness claim
    for (seed <- Seq(11, 23, 47)) {
      val rnd = new scala.util.Random(seed)
      val names = (1 to 40).map { i =>
        val len = 3 + rnd.nextInt(5)
        (i.toLong, (1 to len).map(_ => ('a' + rnd.nextInt(3)).toChar).mkString)
      }.distinct
      val df = names.toDF("p_partkey", "p_name")
      val distinctNames = names.map(_._2).distinct.sorted
      val brute = (for {
        a <- distinctNames; b <- distinctNames if a < b && lev(a, b) <= 2
      } yield (a, b)).toSet
      assert(brute.nonEmpty, s"seed $seed generated no pairs — weak fixture")
      val got = EntityResolution.fuzzyPairs(df, "p_name", "p_partkey")
        .select("name_a", "name_b").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(got === brute, s"seed $seed")
    }
  }

  test("entity clusters: transitive closure, chain endpoints beyond τ co-cluster") {
    val got = EntityResolution.entityClusters(partsDf, "p_name", "p_partkey")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[Long]("cluster")).toMap
    assert(got("green widget") === 1L)
    assert(got("gren widget") === 1L)
    assert(got("green widgt") === 1L)
    assert(got("blue bolt") === 5L)
    assert(got("blue belt") === 5L)
    assert(got("anvil") === 7L)
    // d(aaaaaa, bbbbaa) = 4 > τ — connected only through aabbaa
    assert(lev("aaaaaa", "bbbbaa") === 4)
    assert(got("aaaaaa") === 8L && got("aabbaa") === 8L && got("bbbbaa") === 8L)
  }

  test("canonical keys: every source row maps to its cluster's canonical name") {
    val got = EntityResolution.canonicalKeys(partsDf, "p_name", "p_partkey")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(
      1L -> "green widget", 2L -> "green widget", 3L -> "green widget",
      4L -> "green widget", 5L -> "blue bolt", 6L -> "blue bolt",
      7L -> "anvil", 8L -> "aaaaaa", 9L -> "aaaaaa", 10L -> "aaaaaa"))
  }

  test("delete variants generalize to τ=1 and τ=3 (exact neighborhoods)") {
    def delSet(s: String, tau: Int): Set[String] = {
      def once(x: String): Set[String] =
        x.indices.map(i => x.take(i) + x.drop(i + 1)).toSet
      (1 to tau).scanLeft(Set(s)) { (lvl, _) => lvl.flatMap(once) }
        .reduce(_ ++ _)
    }
    for (tau <- Seq(1, 3)) {
      val got = EntityResolution.deleteVariants(Seq("abcd").toDF("name"), tau)
        .collect().map(_.getString(1)).toSet
      assert(got === delSet("abcd", tau), s"tau=$tau")
    }
    // the generalized τ still blocks completely: all lev<=3 pairs found
    val names = Seq((1L, "abcde"), (2L, "xycdz"), (3L, "vwxyz"))
      .toDF("p_partkey", "p_name")
    val got3 = EntityResolution.fuzzyPairs(names, "p_name", "p_partkey",
        maxDist = 3)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(lev("abcde", "xycdz") === 3)
    assert(lev("abcde", "vwxyz") > 3 && lev("xycdz", "vwxyz") > 3)
    assert(got3 === Set(("abcde", "xycdz"))) // vwxyz is > 3 from both
  }

  test("hot-variant cap: adversarial short names stay bounded, trade is exactly the hot residues") {
    // every 2-char name over {a,b,c,d}: ANY two are within lev 2, and the
    // empty residue (plus each single char) is shared by many names — the
    // degenerate domain where the uncapped variant join goes quadratic in
    // the hottest residue's frequency
    val alpha = "abcd"
    val names = (for { a <- alpha; b <- alpha } yield s"$a$b").toSeq
    val df = names.zipWithIndex.map { case (n, i) => ((i + 1).toLong, n) }
      .toDF("p_partkey", "p_name")
    def delSet(s: String): Set[String] = {
      def once(x: String): Set[String] =
        x.indices.map(i => x.take(i) + x.drop(i + 1)).toSet
      Set(s) ++ once(s) ++ once(s).flatMap(once)
    }
    // brute-force replica of the cap: residue df over all names, residues
    // with df > cap dropped from both sides, pair survives iff it still
    // shares a residue (and lev <= 2, which here is every pair)
    val cap = 4
    val df0 = names.flatMap(n => delSet(n).map(n -> _))
    val residueDf = df0.groupBy(_._2).map { case (v, xs) => v -> xs.size }
    val hot = residueDf.filter(_._2 > cap).keySet
    assert(hot.contains(""), "fixture must actually produce a hot residue")
    val expect = (for {
      a <- names; b <- names if a < b
      if (delSet(a) & delSet(b)).exists(!hot.contains(_))
    } yield (a, b)).toSet
    val gotCapped = EntityResolution.fuzzyPairs(df, "p_name", "p_partkey",
        maxVariantDf = cap)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotCapped === expect)
    // no hot residue survives the bounded-set aggregate (NULL at
    // overflow — the same verdict the brute-forced `hot` set predicts)
    val survived = EntityResolution.deleteVariants(
        df.select(col("p_name").as("name")), 2)
      .groupBy(col("v"))
      .agg(graft.functions.GraftFunctions.bounded_collect_set(col("name"), cap)
        .as("names"))
      .where(col("names").isNotNull)
      .select("v").collect().map(_.getString(0)).toSet
    assert((survived & hot).isEmpty, s"hot residues leaked: ${survived & hot}")
    // and with the cap wide open the full brute-force pair set comes back
    val brute = (for { a <- names; b <- names if a < b } yield (a, b)).toSet
    val gotOpen = EntityResolution.fuzzyPairs(df, "p_name", "p_partkey",
        maxVariantDf = 1000)
      .select("name_a", "name_b").collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(gotOpen === brute)
    assert(gotCapped.subsetOf(gotOpen) && gotCapped.size < brute.size,
      "the cap must be a strict, bounded recall trade on this fixture")
  }

  test("canonical support: variant counts and re-keyed row totals") {
    val got = EntityResolution.canonicalSupport(partsDf, "p_name", "p_partkey")
      .collect().map(r => r.getAs[String]("canonical") ->
        ((r.getAs[Long]("n_variants"), r.getAs[Long]("total_rows")))).toMap
    assert(got === Map(
      "green widget" -> ((3L, 4L)), // 3 name variants, 4 corpus rows
      "blue bolt" -> ((2L, 2L)),
      "anvil" -> ((1L, 1L)),
      "aaaaaa" -> ((3L, 3L))))
  }
}
