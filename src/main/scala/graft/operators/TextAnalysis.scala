package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language ID, BPE-ish token counting, fingerprinting.
  *
  * Everything is a per-row projection (plus at most one per-doc explode /
  * re-aggregate) — embarrassingly parallel, no cross-document traffic, so
  * it scales linearly with input splits. All ratios are exact-integer
  * numerators/denominators divided once at the end (IEEE-deterministic for
  * the DuckDB oracle).
  */
object TextAnalysis {

  private val stopEn = Seq("the", "a", "and", "of", "to", "in", "is", "it", "on", "for")
  private val stopDe = Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "ich")
  private val stopFr = Seq("le", "la", "les", "et", "est", "un", "une", "dans", "pour", "que")

  private def hits(words: Seq[String]): org.apache.spark.sql.Column =
    expr(s"size(filter(toks, w -> w IN (${words.map(w => s"'$w'").mkString(",")})))")

  /** Per-document token statistics + a composite quality score.
    * score = 0.4·stopword_ratio + 0.3·alpha_ratio + 0.3·min(n_tokens,100)/100
    * — a standard cheap-heuristics quality gate (length, punctuation,
    * stopword density), all exact-arithmetic.
    */
  def qualityStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), col("text"),
        Dedup.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).as("n_tokens"),
        length(col("text")).as("n_chars"),
        hits(stopEn).as("n_stop"),
        length(regexp_replace(col("text"), "[^a-zA-Z]", "")).as("n_alpha"),
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).as("n_punct"))
      // null (not an ANSI divide-by-zero error) on degenerate denominators:
      // empty text has zero chars; downstream consumers (the quality gate)
      // filter the resulting null score
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          col("n_stop").cast("double") / col("n_tokens").cast("double")))
      .withColumn("alpha_ratio",
        when(col("n_chars") > 0,
          col("n_alpha").cast("double") / col("n_chars").cast("double")))
      .withColumn("quality_score",
        lit(0.4) * col("stop_ratio") + lit(0.3) * col("alpha_ratio") +
          lit(0.3) * (least(col("n_tokens"), lit(100)).cast("double") / lit(100.0)))

  /** The deterministic sampling coin in [0, 100): first 32 bits of
    * md5(salt:doc_id) mod 100 — shared by the samplers and the
    * decontamination split so "the 10% eval slice" means the same docs
    * everywhere.
    */
  def sampleCoin(
      salt: String = "s0",
      idCol: org.apache.spark.sql.Column = col("doc_id")): org.apache.spark.sql.Column =
    rawCoin(salt, idCol) % 100

  /** The raw 32-bit md5 coin behind [[sampleCoin]] — uniform on
    * [0, 2^32), reduced mod the caller's range.
    */
  private def rawCoin(
      salt: String,
      idCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(
      md5(concat(lit(salt), lit(":"), idCol.cast("string"))), 1, 8), 16, 10)
      .cast("long")

  /** Size-proportional deterministic sample (PPS Poisson sampling, the
    * survey-statistics design): each doc kept independently with
    * inclusion probability min(w, cap)/cap, weight w = its `weightCol`
    * (here n_chars — keep big documents more often, e.g. when sampling
    * for token-budgeted evals). Same md5 coin family as the other
    * samplers: reproducible, engine-portable, repartition-stable, and a
    * pure per-row integer predicate that pushes to the scan — zero
    * shuffle at any corpus size. Docs at or above `cap` are always kept
    * (probability 1), the exact-integer analogue of inclusion-capped
    * PPS.
    */
  def weightedSample(
      docs: DataFrame,
      weightCol: String = "n_chars",
      cap: Int = 400,
      salt: String = "w0"): DataFrame =
    docs.select(col("doc_id"), col("lang"), col(weightCol).as("w"))
      .filter((rawCoin(salt, col("doc_id")) % cap) < least(col("w"), lit(cap.toLong)))

  /** Deterministic content-keyed sample: keep a doc iff [[sampleCoin]]
    * lands below `pct`. Reproducible across runs and engines (no RNG
    * state), stable under repartitioning, and the salt gives independent
    * replicas — the standard way to cut a fixed, auditable slice of a
    * 100 TB corpus. Pure per-row filter: pushes to the scan, no shuffle.
    */
  def deterministicSample(docs: DataFrame, pct: Int = 10, salt: String = "s0"): DataFrame =
    docs.select(col("doc_id"), col("lang"))
      .filter(sampleCoin(salt) < pct)

  /** Stratified deterministic sample: per-language keep rates (e.g.
    * downsample the dominant language, keep all of a rare one) with the
    * same content-keyed md5 coin as [[deterministicSample]] — auditable,
    * reproducible, repartition-stable. Still a pure per-row filter: the
    * rate lookup is a literal CASE, so the whole predicate pushes to the
    * scan. The standard corpus-rebalancing move at 100 TB.
    */
  def stratifiedSample(
      docs: DataFrame,
      rates: Map[String, Int] = Map("en" -> 50, "de" -> 20),
      defaultPct: Int = 10,
      salt: String = "s0"): DataFrame = {
    val rate = rates.toSeq.sortBy(_._1).foldLeft(lit(defaultPct)) {
      case (acc, (k, v)) => when(col("lang") === k, lit(v)).otherwise(acc)
    }
    docs.select(col("doc_id"), col("lang"))
      .filter(sampleCoin(salt) < rate)
  }

  /** Deterministic K-per-group sample: within each group keep the K docs
    * with the smallest md5 coin (full digest string — collision-free
    * order, doc_id tiebreak). The per-group uniform eval-slice cut
    * ("K docs per language") with the samplers' auditability. The group
    * key may be LOW-cardinality, but rank ≤ K compiles to
    * WindowGroupLimit: each map task pre-prunes to K rows BEFORE the
    * exchange, so the per-group reducer sees ≤ K·n_map_partitions rows —
    * corpus-size-independent — not the whole group.
    */
  def samplePerGroup(docs: DataFrame, k: Int = 20, salt: String = "s0"): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("lang")).orderBy(asc("coin"), asc("doc_id"))
    docs
      .select(col("doc_id"), col("lang"),
        md5(concat(lit(salt), lit(":"), col("doc_id").cast("string"))).as("coin"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("lang"), col("rnk"))
  }

  /** Per-document TF-IDF top-k terms: tf = term count in the doc, df =
    * docs containing the term, score ∝ tf·N/df (the raw-ratio idf — same
    * ranking family as log-idf, but exactly representable cross-engine),
    * deterministic (score desc, term asc) tiebreak. Plan shape: one
    * (doc, term) hash agg (map-side combinable), one term-keyed df agg,
    * one term-keyed join, then a per-doc WindowGroupLimit top-k — every
    * key is high-cardinality, so parallelism scales with the corpus.
    */
  def tfidfTopK(docs: DataFrame, k: Int = 3): DataFrame = {
    val terms = docs.select(col("doc_id"), explode(Dedup.tokens(col("text"))).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(desc("score"), asc("term"))
    tf.join(dfreq, "term").crossJoin(broadcast(n))
      .withColumn("score", col("tf").cast("double") * col("n") / col("df"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("doc_id"), col("term"), col("tf"), col("df"), col("rnk"))
  }

  /** Corpus-percentile quality gate: keep documents whose quality score
    * (bucketed to 1e-3) reaches the corpus-wide q-th percentile bucket.
    * Bucketing makes the threshold an exact histogram percentile over a
    * BOUNDED domain (≤ 1001 distinct buckets), so the single-group window
    * in the threshold computation sees ≤ 1001 rows regardless of corpus
    * size — the trick that keeps an exact global percentile scale-safe.
    * The scored (doc_id, qs) projection is eagerly localCheckpoint-ed so
    * the CORPUS is read once: threshold and gate both replay the ~16-byte/
    * row checkpoint instead of re-running the text heuristics over a
    * second full scan (the same lineage-cut precedent as
    * [[Dedup.connectedComponents]]; at 100 TB a production run would
    * checkpoint the scored table to reliable storage instead).
    */
  def qualityGate(docs: DataFrame, q: Double = 0.5): DataFrame = {
    // degenerate docs (empty text -> 0/0 ratios) score NaN in Spark and
    // NULL in DuckDB; drop them BEFORE bucketing — an ANSI cast of NaN
    // to long throws, and engines disagree on where nulls sort in the
    // percentile ordering. Either way such docs could never pass a gate.
    val scored = qualityStats(docs)
      .filter(col("quality_score").isNotNull && !isnan(col("quality_score")))
      .select(col("doc_id"),
        floor(col("quality_score") * 1000 + 0.5).cast("long").as("qs"))
      .withColumn("corpus", lit(1L))
      .localCheckpoint()
    val thr = Percentiles.percentileDisc(scored, "corpus", "qs", Seq(q))
      .select(col("pct_value").as("thr"))
    scored.crossJoin(broadcast(thr))
      .filter(col("qs") >= col("thr"))
      .select(col("doc_id"), col("qs"), col("thr"))
  }

  /** Per-language percentile quality gate: [[qualityGate]]'s histogram
    * threshold computed PER language — each language keeps its own top
    * (1−q) share, so a rare language is not gated by the dominant one's
    * score distribution (the practical failure of a global threshold on a
    * multilingual corpus: the quality heuristics favor the stopword
    * list's language). Same scale shape as the global gate, now on real
    * group keys: the windowed data is the per-(lang, bucket) histogram —
    * ≤ |langs|·1001 rows — and the 5-row threshold table broadcasts back.
    * Like [[qualityGate]], the scored projection is eagerly
    * localCheckpoint-ed: ONE corpus scan runs the enrichment heuristics,
    * and both the threshold histogram and the gate join replay the tiny
    * (doc_id, lang, qs) checkpoint (PlanSpec pins the single scan).
    */
  def qualityGateByLang(docs: DataFrame, q: Double = 0.5): DataFrame = {
    val scored = enrich(docs)
      .filter(col("quality_score").isNotNull && !isnan(col("quality_score")))
      .select(col("doc_id"), col("lang"),
        floor(col("quality_score") * 1000 + 0.5).cast("long").as("qs"))
      .localCheckpoint()
    val thr = Percentiles.percentileDisc(scored, "lang", "qs", Seq(q))
      .select(col("lang"), col("pct_value").as("thr"))
    scored.join(broadcast(thr), Seq("lang"))
      .filter(col("qs") >= col("thr"))
      .select(col("doc_id"), col("lang"), col("qs"), col("thr"))
  }

  /** N-gram-heuristic language ID: count stopword hits per candidate
    * language; argmax with deterministic (hit-count desc, language asc)
    * tiebreak; 'und' (undetermined) when nothing hits.
    */
  def langId(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id"),
        hits(stopEn).as("en_hits"), hits(stopDe).as("de_hits"),
        hits(stopFr).as("fr_hits"))
      .withColumn("lang_pred",
        when(greatest(col("en_hits"), col("de_hits"), col("fr_hits")) === 0, "und")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))

  /** Language-ID quality evaluation: confusion counts of predicted vs
    * labelled language — the accuracy readout a pipeline monitors when the
    * corpus carries ground-truth labels.
    */
  def langIdConfusion(docs: DataFrame): DataFrame =
    langId(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))

  /** Token-length histogram per language: document counts in fixed-width
    * token-count buckets — the corpus length-distribution report every
    * curation run watches. One hash aggregation over scan-side stats.
    */
  def tokenHistogram(docs: DataFrame, bucketWidth: Int = 10): DataFrame =
    docs
      .select(col("lang"),
        (floor(size(Dedup.tokens(col("text"))) / lit(bucketWidth))
          * lit(bucketWidth.toLong)).as("bucket_lo"))
      .groupBy(col("lang"), col("bucket_lo"))
      .agg(count(lit(1)).as("n_docs"))

  /** BPE-ish token count: words and standalone punctuation each count as
    * one token (`\w+|[^\w\s]`) — the usual cheap proxy for LLM token cost.
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(split(trim(col("text")), "\\s+")).as("n_words"),
      size(expr("regexp_extract_all(text, '\\\\w+|[^\\\\w\\\\s]', 0)")).as("n_bpeish"))

  /** The script-aware tokenization itself as a query: (doc_id, pos, tok)
    * rows — the cross-engine evidence surface for the [[Dedup.tokens]]
    * seam (registered over a multiscript fixture, where the DuckDB
    * oracle replays the identical segment-then-split; the harness corpus
    * is ASCII, where the seam is a pinned no-op).
    */
  def tokensExploded(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"), col("tok"))

  /** Content fingerprint expression: md5 over whitespace-normalized
    * lowercase text — the exact-dup key for content-defined dedup across
    * shards. Exposed as a Column so batch ops and the streaming document
    * pipeline share the identical expression.
    */
  def fingerprint(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Content fingerprint: md5 over whitespace-normalized lowercase text —
    * the exact-dup key for content-defined dedup across shards.
    */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), fingerprint(col("text")).as("fp"))

  /** One-pass document enrichment: quality score, language ID, token
    * count, and content fingerprint in a SINGLE scan-side projection —
    * the fused form of [[qualityStats]] + [[langId]] + [[fingerprints]]
    * (identical formulas; TextAnalysisSpec pins the equality). A curation
    * run wants all three anyway, and fusing them reads the corpus once
    * instead of three times — at 100 TB that's the difference, since each
    * op alone is scan-dominated. Works on batch AND streaming frames
    * (pure projection, no shuffle); extra input columns ride along.
    */
  def enrich(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", Dedup.tokens(col("text")))
      // CollapseProject in Spark 4 keeps non-cheap shared exprs (toks)
      // single-evaluated across the consumers below.
      .withColumn("n_tokens", size(col("toks")))
      .withColumn("n_chars", length(col("text")))
      .withColumn("n_stop", hits(stopEn))
      .withColumn("n_alpha", length(regexp_replace(col("text"), "[^a-zA-Z]", "")))
      .withColumn("stop_ratio",
        when(col("n_tokens") > 0,
          col("n_stop").cast("double") / col("n_tokens").cast("double")))
      .withColumn("alpha_ratio",
        when(col("n_chars") > 0,
          col("n_alpha").cast("double") / col("n_chars").cast("double")))
      .withColumn("quality_score",
        lit(0.4) * col("stop_ratio") + lit(0.3) * col("alpha_ratio") +
          lit(0.3) * (least(col("n_tokens"), lit(100)).cast("double") / lit(100.0)))
      .withColumn("en_hits", hits(stopEn))
      .withColumn("de_hits", hits(stopDe))
      .withColumn("fr_hits", hits(stopFr))
      .withColumn("lang_pred",
        when(greatest(col("en_hits"), col("de_hits"), col("fr_hits")) === 0, "und")
          .when(col("en_hits") >= col("de_hits") && col("en_hits") >= col("fr_hits"), "en")
          .when(col("de_hits") >= col("fr_hits"), "de")
          .otherwise("fr"))
      .withColumn("fp", fingerprint(col("text")))
      .drop("toks", "n_stop", "n_alpha", "en_hits", "de_hits", "fr_hits",
        "stop_ratio", "alpha_ratio")

  /** Intra-document repetition signals (the Gopher-style quality gates a
    * curation run applies before any cross-document dedup): the fraction
    * of tokens taken by the single most frequent token, and the fraction
    * of token bigrams that are repeats. Both are pure scan-side per-row
    * expressions: the top-token count is a LINEAR fold over the sorted
    * token array (longest equal run = max multiplicity — no per-doc
    * explode/re-aggregate, no O(distinct²) nested filter), and the bigram
    * repeat count is `size − size(array_distinct)`. Ratios are one IEEE
    * division of exact integers, bit-stable cross-engine.
    */
  def repetitionStats(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        expr("""
          aggregate(
            array_sort(toks),
            named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'best', 0L),
            (acc, w) -> named_struct(
              'prev', w,
              'run', IF(w <=> acc.prev, acc.run + 1L, 1L),
              'best', GREATEST(acc.best, IF(w <=> acc.prev, acc.run + 1L, 1L))),
            acc -> acc.best)""").as("top_token_count"),
        expr("""
          IF(size(toks) < 2, array(),
             transform(sequence(1, size(toks) - 1),
                       i -> concat(toks[i-1], ' ', toks[i])))""").as("bigrams"))
      .select(
        col("doc_id"), col("n_tokens"), col("top_token_count"),
        size(col("bigrams")).cast("long").as("n_bigrams"),
        (size(col("bigrams")) - size(array_distinct(col("bigrams"))))
          .cast("long").as("n_dup_bigrams"))
      .withColumn("top_token_ratio",
        when(col("n_tokens") > 0,
          col("top_token_count").cast("double") / col("n_tokens").cast("double")))
      .withColumn("dup_bigram_ratio",
        when(col("n_bigrams") > 0,
          col("n_dup_bigrams").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)))

  /** PII / denylist patterns for [[scrub]]: kept to the regex subset with
    * identical semantics in Java regex and RE2 (character classes, bounded
    * repetition, word boundaries, alternation — no lookaround, no
    * backrefs), so the DuckDB oracle runs the very same patterns.
    */
  val emailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pattern = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val denylistPattern = "\\b(key|hash|value)\\b"

  /** PII / denylist scrub: per-document match counts for each pattern
    * class plus the redacted text (denylist terms masked). A compliance
    * pass over a 100 TB corpus is scan-dominated, and this is a pure
    * projection — counts and redaction in ONE pass over the text, no
    * shuffle, pipelined with any downstream gate. The synthetic corpus
    * contains no emails/IPs (counts 0 — still asserted by the oracle);
    * TextAnalysisSpec exercises the hit paths on adversarial literals.
    */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      size(regexp_extract_all(col("text"), lit(emailPattern), lit(0)))
        .cast("long").as("n_email"),
      size(regexp_extract_all(col("text"), lit(ipv4Pattern), lit(0)))
        .cast("long").as("n_ipv4"),
      size(regexp_extract_all(col("text"), lit(denylistPattern), lit(0)))
        .cast("long").as("n_denylist"),
      regexp_replace(col("text"), denylistPattern, "[MASKED]").as("redacted"))

  /** Corpus-wide top-k token bigrams — the pair-count step of BPE-style
    * vocabulary induction (each merge round is exactly "count adjacent
    * pairs, take the max"). One scan-side bigram expansion, one
    * high-cardinality hash agg (map-side combinable), then a global top-k
    * that Spark executes as TakeOrderedAndProject — per-partition heaps of
    * k rows to the driver, never a full sort shuffle. Deterministic
    * (count desc, bigram asc) tiebreak.
    */
  def vocabBigrams(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .select(Dedup.tokens(col("text")).as("toks"))
      .select(explode(expr(
        """IF(size(toks) < 2, array(),
              transform(sequence(1, size(toks) - 1),
                        i -> concat(toks[i-1], ' ', toks[i])))""")).as("bigram"))
      .groupBy(col("bigram"))
      .agg(count(lit(1)).as("n"))
      .orderBy(desc("n"), asc("bigram"))
      .limit(k)

  /** Iterative BPE merge loop — the k-round completion of [[vocabBigrams]]
    * (which is exactly ONE round's pair count). Round r: count adjacent
    * token pairs corpus-wide, pick the argmax (count desc, pair asc —
    * deterministic), then REWRITE every greedy non-overlapping occurrence
    * into a single merged token before the next round — the
    * `get_stats`/`merge_vocab` loop of Sennrich-style BPE at word level,
    * run as relational algebra. Driver-looped like
    * [[Similarity.ivfCentroidsTrained]]: only the k argmax rows ever reach
    * the driver (metadata, not data), the oracle unrolls the rounds in
    * SQL, and the query is bench-excluded (wall time = round count).
    *
    * The greedy left-to-right overlap rule ("x x x" merges once, third x
    * survives) is gaps-and-islands, not a fold: occurrences at dense
    * positions group into runs (pos − row_number is constant within a
    * run), and a run keeps its odd-indexed members. Every step is a
    * per-doc window or a hash agg — high-cardinality doc_id partitions,
    * no driver-side token data, and each round's survivor table is
    * localCheckpoint-ed so k rounds can't stack plans
    * ([[Dedup.connectedComponents]] precedent).
    */
  def bpeMerges(docs: DataFrame, k: Int = 3): DataFrame = {
    val sp = docs.sparkSession
    import sp.implicits._
    bpeLearn(docs, k)
      .map { case (r, a, b, n) => (r, a + " " + b, n) }
      .toDF("merge_round", "bigram", "n")
  }

  /** The learning loop behind [[bpeMerges]], returning the merge table as
    * driver-side (round, left, right, count) rows — the (a, b) split that
    * [[tokenizeBpe]] needs to APPLY the rules (the concatenated `bigram`
    * string alone is ambiguous once merged tokens themselves contain
    * spaces).
    */
  private[graft] def bpeLearn(
      docs: DataFrame, k: Int): Seq[(Long, String, String, Long)] = {
    val w = org.apache.spark.sql.expressions.Window
    var toks = docs.select(col("doc_id"),
      posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var exhausted = false
    for (_ <- 1 to k if !exhausted) {
      val byDoc = w.partitionBy(col("doc_id")).orderBy(col("pos"))
      // re-number to dense 1-based positions so run detection is pure
      // position arithmetic even after prior rounds removed rows
      val pairs = toks
        .withColumn("p", row_number().over(byDoc))
        .select(col("doc_id"), col("p"), col("tok"))
        .withColumn("nxt",
          lead(col("tok"), 1).over(w.partitionBy(col("doc_id")).orderBy(col("p"))))
      val top = pairs.filter(col("nxt").isNotNull)
        .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("n"))
        .orderBy(desc("n"), asc("tok"), asc("nxt")).limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, n) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((merges.size + 1L, a, b, n))
        val occ = pairs.filter(col("tok") === lit(a) && col("nxt") === lit(b))
          .select(col("doc_id"), col("p"))
        val sel = occ
          .withColumn("grp", col("p") -
            row_number().over(w.partitionBy(col("doc_id")).orderBy(col("p"))))
          .withColumn("rn",
            row_number().over(w.partitionBy(col("doc_id"), col("grp")).orderBy(col("p"))))
          .filter(col("rn") % 2 === 1)
          .select(col("doc_id"), col("p"))
        toks = pairs
          .join(sel.withColumn("m", lit(true)), Seq("doc_id", "p"), "left")
          .join(sel.select(col("doc_id"), (col("p") + 1).as("p"))
            .withColumn("drp", lit(true)), Seq("doc_id", "p"), "left")
          .filter(col("drp").isNull)
          .select(col("doc_id"), col("p").as("pos"),
            when(col("m"), concat(col("tok"), lit(" "), col("nxt")))
              .otherwise(col("tok")).as("tok"))
          .localCheckpoint()
      }
    }
    merges.toSeq
  }

  /** BPE TRAINER with the persisted-artifact round trip (the r13 verdict's
    * missing tokenizer-pipeline leg): run [[bpeLearn]] for `k` fixed
    * rounds (each round one corpus pair-count agg + a broadcast merge
    * substitution — the pageRank fixed-round discipline), persist the
    * merge table as the parquet artifact a tokenizer pipeline ships
    * (merge_round, lhs, rhs, n), LOAD it back, and return the loaded
    * frame — so the oracle (identical rounds unrolled in SQL, CTEs
    * materialized) hash-proves the write → read round trip lossless.
    * The artifact is k rows of metadata at any corpus size.
    */
  def bpeTrainPersisted(spark: SparkSession, docs: DataFrame,
      scratch: String, k: Int = 8): DataFrame = {
    import spark.implicits._
    val artifact = s"$scratch/bpe_merges"
    bpeLearn(docs, k)
      .toDF("merge_round", "lhs", "rhs", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(artifact)
    spark.read.parquet(artifact)
  }

  /** BATCHED BPE trainer — the real tokenizer-trainer move [[bpeLearn]]'s
    * 1-merge-per-pass loop can't scale to (a 32k vocab would be ~64k
    * Spark jobs): per corpus pass, count pairs ONCE, then select the top
    * `batchSize` pairwise NON-INTERFERING merges and defer the rest to
    * a later pass. Non-interference is the exact count-invariance
    * condition, not blanket token disjointness: rewriting "(a b)" only
    * destroys pairs of the form (x, a) / (b, y) (and creates (x, ab) /
    * (ab, y)), so a candidate (c, d) is safe beside (a, b) iff c ≠ b
    * and d ≠ a — the CHAIN cases. Same-left (a, x)/(a, y) or same-right
    * (x, b)/(y, b) pairs can't overlap positionally (one position has
    * one nxt) and leave each other's counts untouched, so they batch
    * together. Merge numbering is
    * selection order (count desc, pair asc — the sequential
    * tiebreak), so where batching semantics coincide with the
    * 1-merge-per-pass reference the merge TABLES are identical
    * (PackingSpec pins both the coincidence fixture and a forced-defer
    * fixture). Returns (merge table, passes used) — passes/k is the
    * jobs-saved ratio, ~1/batchSize when batches fill.
    */
  /** Dense-positioned token pairs of a corpus state: positions re-number
    * 1-based per doc, pair at p = (tok_p, tok_{p+1}), `nxt` null at doc
    * end — the shared substrate of the batched trainer's passes.
    */
  private[graft] def bpePairs(toks: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    toks
      .withColumn("p", row_number().over(
        w.partitionBy(col("doc_id")).orderBy(col("pos"))))
      .select(col("doc_id"), col("p"), col("tok"))
      .withColumn("nxt",
        lead(col("tok"), 1).over(w.partitionBy(col("doc_id")).orderBy(col("p"))))
  }

  /** Full pair-count table of a pairs frame — the pass-1 baseline that
    * [[bpeCountDelta]] maintains incrementally afterwards.
    */
  private[graft] def bpeCounts(pairs: DataFrame): DataFrame =
    pairs.filter(col("nxt").isNotNull)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("n"))

  /** Greedy non-overlapping occurrences of (a, b) via gaps-and-islands:
    * runs of dense positions keep their odd-indexed members ("x x x"
    * merges once, the third x survives).
    */
  private[graft] def bpeOccurrences(
      pairs: DataFrame, a: String, b: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
    pairs.filter(col("tok") === lit(a) && col("nxt") === lit(b))
      .select(col("doc_id"), col("p"))
      .withColumn("grp", col("p") -
        row_number().over(w.partitionBy(col("doc_id")).orderBy(col("p"))))
      .withColumn("rn", row_number().over(
        w.partitionBy(col("doc_id"), col("grp")).orderBy(col("p"))))
      .filter(col("rn") % 2 === 1)
      .select(col("doc_id"), col("p"))
  }

  /** Apply a chain-free merge batch: each position in `mergedAt` takes
    * its pair's concatenated form, its successor drops. The
    * chain-exclusion makes the unioned position sets collision-free —
    * q = p+1 across pairs needs c == b, q+1 = p needs d == a (both
    * deferred), and q = p needs (a,b) == (c,d).
    */
  private[graft] def bpeRewrite(pairs: DataFrame, mergedAt: DataFrame): DataFrame =
    pairs
      .join(mergedAt.withColumn("m", lit(true)), Seq("doc_id", "p"), "left")
      .join(mergedAt.select(col("doc_id"), (col("p") + 1).as("p"))
        .withColumn("drp", lit(true)), Seq("doc_id", "p"), "left")
      .filter(col("drp").isNull)
      .select(col("doc_id"), col("p").as("pos"),
        when(col("m"), concat(col("tok"), lit(" "), col("nxt")))
          .otherwise(col("tok")).as("tok"))

  /** INCREMENTAL pair-count delta of a chain-free merge batch — the 32k-
    * vocab move: only pairs with an endpoint ADJACENT to an applied merge
    * change counts, so maintaining the count table costs O(|merged
    * positions|) instead of a full corpus re-aggregation per pass.
    *
    * Closed algebra (S = merged positions, S+1 = dropped successors):
    * an OLD pair at position q changes iff one of its endpoints {q, q+1}
    * lies in S ∪ (S+1), i.e. q ∈ (S−1) ∪ S ∪ (S+1) — those count
    * negative. NEW pairs exist exactly where an endpoint is a merged
    * position: (tok_{p−1}, merged_p) when p−1 survives un-merged (a
    * dropped p−1 means p−2 ∈ S, whose own right-pair covers it; p−1 ∈ S
    * is impossible — adjacent selections are chain-excluded), and
    * (merged_p, newtok_{p+2}) where p+2's token is its merged form when
    * p+2 ∈ S (p+2 dropped would need p+1 ∈ S — impossible). The spec
    * pins delta-maintained ≡ recounted on interfering, self-run, and
    * randomized fixtures.
    */
  private[graft] def bpeCountDelta(
      pairs: DataFrame, mergedAt: DataFrame): DataFrame = {
    val affQ = mergedAt.select(col("doc_id"), (col("p") - 1).as("p"))
      .unionByName(mergedAt.select(col("doc_id"), col("p")))
      .unionByName(mergedAt.select(col("doc_id"), (col("p") + 1).as("p")))
      .distinct()
    val oldNeg = pairs.filter(col("nxt").isNotNull)
      .join(affQ, Seq("doc_id", "p"))
      .groupBy(col("tok"), col("nxt")).agg((-count(lit(1))).as("dn"))
    val m = mergedAt.join(pairs, Seq("doc_id", "p"))
      .select(col("doc_id"), col("p"),
        concat(col("tok"), lit(" "), col("nxt")).as("mtok"))
    val dropped = mergedAt.select(col("doc_id"), (col("p") + 1).as("p"))
    val leftNew = m.select(col("doc_id"), (col("p") - 1).as("p"), col("mtok"))
      .join(pairs.select(col("doc_id"), col("p"), col("tok")), Seq("doc_id", "p"))
      .join(dropped.withColumn("d", lit(true)), Seq("doc_id", "p"), "left")
      .filter(col("d").isNull)
      .select(col("tok"), col("mtok").as("nxt"))
    val rightNew = m
      .join(pairs.select(col("doc_id"), (col("p") - 2).as("p"),
        col("tok").as("rtok")), Seq("doc_id", "p"))
      .join(m.select(col("doc_id"), (col("p") - 2).as("p"),
        col("mtok").as("rmtok")), Seq("doc_id", "p"), "left")
      .select(col("mtok").as("tok"), coalesce(col("rmtok"), col("rtok")).as("nxt"))
    leftNew.unionByName(rightNew)
      .groupBy(col("tok"), col("nxt")).agg(count(lit(1)).as("dn"))
      .unionByName(oldNeg)
  }

  /** @param recount true = re-aggregate the full pair-count table every
    *   pass instead of maintaining it by [[bpeCountDelta]] — the A/B arm
    *   that prices what the incremental algebra saves (selection is
    *   identical either way; PackingSpec pins the equivalence).
    */
  private[graft] def bpeLearnBatched(
      docs: DataFrame, k: Int, batchSize: Int = 4,
      recount: Boolean = false)
      : (Seq[(Long, String, String, Long)], Int) = {
    var toks = docs.select(col("doc_id"),
      posexplode(Dedup.tokens(col("text"))).as(Seq("pos", "tok")))
    val merges = scala.collection.mutable.ListBuffer.empty[(Long, String, String, Long)]
    var passes = 0
    var exhausted = false
    // the maintained pair-count table: one full aggregation on pass 1,
    // then O(|merged positions|) deltas — the incremental discipline a
    // 32k-vocab run needs (recounting the corpus every pass was the
    // r15 ledger's residual note)
    var cnts: DataFrame = null
    while (merges.size < k && !exhausted) {
      passes += 1
      // checkpointed once per pass: selection support, the batch
      // rewrite, and the count delta all read the same pair frame
      val pairs = bpePairs(toks).localCheckpoint()
      if (cnts == null || recount) cnts = bpeCounts(pairs).localCheckpoint()
      // candidate list deep enough that deferrals can still fill the
      // batch (each kept pair blocks at most two tokens); only these
      // O(batch) metadata rows ever reach the driver
      val want = math.min(batchSize, k - merges.size)
      val top = cnts.orderBy(desc("n"), asc("tok"), asc("nxt"))
        .limit(batchSize * 8).collect()
      if (top.isEmpty) exhausted = true
      else {
        val lefts = scala.collection.mutable.Set.empty[String]
        val rights = scala.collection.mutable.Set.empty[String]
        val sel = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
        for (r <- top if sel.size < want) {
          val (a, b) = (r.getString(0), r.getString(1))
          // defer only the chain cases: candidate's left equals a
          // selected right, or candidate's right equals a selected left
          // (a == b within one pair is fine — the odd-occurrence rule
          // handles self-runs)
          if (!rights(a) && !lefts(b)) {
            sel += ((a, b, r.getLong(2))); lefts += a; rights += b
          }
        }
        sel.foreach { case (a, b, n) => merges += ((merges.size + 1L, a, b, n)) }
        val selAll = sel.toSeq
          .map { case (a, b, _) => bpeOccurrences(pairs, a, b) }
          .reduce(_ unionByName _).localCheckpoint()
        toks = bpeRewrite(pairs, selAll).localCheckpoint()
        cnts = cnts.select(col("tok"), col("nxt"), col("n").as("dn"))
          .unionByName(bpeCountDelta(pairs, selAll))
          .groupBy(col("tok"), col("nxt")).agg(sum(col("dn")).as("n"))
          .filter(col("n") > 0)
          .localCheckpoint()
      }
    }
    (merges.toSeq, passes)
  }

  /** [[bpeLearnBatched]] with the persisted-artifact round trip —
    * batchSize=4 over k=8 merges is 2 corpus passes instead of 8. The
    * returned merge table is hash-checked against the SAME sequential
    * 8-round oracle as [[bpeTrainPersisted]]: on the harness corpus the
    * top pairs are deep enough apart that batching and the
    * 1-merge-per-pass reference select identical tables (the
    * interference cases are PackingSpec fixtures), so one hash match
    * proves batched-selection ≡ sequential AND the artifact round trip,
    * at a quarter of the passes.
    */
  def bpeTrainBatchedPersisted(spark: SparkSession, docs: DataFrame,
      scratch: String, k: Int = 8, batchSize: Int = 4): DataFrame = {
    import spark.implicits._
    val artifact = s"$scratch/bpe_merges_batched"
    val (merges, _) = bpeLearnBatched(docs, k, batchSize)
    merges
      .toDF("merge_round", "lhs", "rhs", "n")
      .coalesce(1)
      .write.mode("overwrite").parquet(artifact)
    spark.read.parquet(artifact)
  }

  /** Corpus-size threshold (total text chars) where the delta-maintained
    * pair-count arm starts beating full recounting, measured on the
    * replicated-sf0.1 ladder (tools/BpeProbe `rep` arg, r18 — SURVEY
    * §8.21 records the runs): recounting's per-pass cost grows with the
    * corpus while the delta's is O(|merged positions|) + flat overhead,
    * so below the crossover the simple recount wins in absolute wall
    * time and above it the algebra does. The EXCLUSIVE (sbt-idle) rungs
    * bracket the crossover between ×16 (23.8 M chars: recount 102.8 s
    * vs delta 122.2 s) and ×32 (47.5 M chars: delta 180.9 s vs recount
    * 212.1 s); 35 M is the bracket's midpoint. The k64 trainer picks
    * its arm by ONE cheap column-pruned `sum(length(text))` against
    * this constant — both arms select identical merge tables
    * (PackingSpec pins it), so the choice can never flip a result,
    * only the bill.
    */
  val bpeDeltaMinChars: Long = 35000000L

  /** The realistic-vocab trainer GAUGE (r17): k=64 merges in batches of
    * 8 with the incremental pair-count algebra — the scale shape the
    * k=8/batch=4 demo only extrapolated to. Returns the merge table with
    * the PASS COUNT as a column, so the oracle (the sequential 64-round
    * unroll) pins all three claims in one hash: batched selection ≡
    * 1-merge-per-pass on this corpus, the artifact round trip is
    * lossless, and passes == k/batchSize (batches fill — deferrals never
    * cost an extra pass here). `arm` picks the pair-count maintenance
    * strategy: "recount" re-aggregates the full pair table every pass,
    * "delta" maintains it by [[bpeCountDelta]], and the default "auto"
    * chooses by MEASURED corpus size against [[bpeDeltaMinChars]] (the
    * r17 verdict's lesson: the delta arm's asymptotic is real but it
    * LOSES in absolute below the crossover, so defaulting to it at
    * harness SFs shipped the slower arm). Identical merge tables either
    * way — PackingSpec pins arm-equivalence — so the hash is
    * arm-invariant.
    */
  def bpeTrainK64(spark: SparkSession, docs: DataFrame, scratch: String,
      k: Int = 64, batchSize: Int = 8, arm: String = "auto"): DataFrame = {
    import spark.implicits._
    val recount = arm match {
      case "recount" => true
      case "delta" => false
      case "auto" =>
        docs.agg(sum(length(col("text")))).head.getLong(0) < bpeDeltaMinChars
      case other => throw new IllegalArgumentException(
        s"bpeTrainK64 arm must be auto|delta|recount, got $other")
    }
    val artifact =
      s"$scratch/bpe_merges_k$k" + (if (recount) "_recount" else "")
    val (merges, passes) = bpeLearnBatched(docs, k, batchSize, recount)
    merges.toDF("merge_round", "lhs", "rhs", "n")
      .withColumn("passes", lit(passes.toLong))
      .coalesce(1)
      .write.mode("overwrite").parquet(artifact)
    spark.read.parquet(artifact)
  }

  /** Vocabulary coverage of the TRAINED merge table over the corpus: load
    * the persisted artifact (building it first if absent — the query is
    * self-contained), apply the k rules in merge order with the
    * [[tokenizeBpe]] scan-side fold, and report how much of the final
    * token stream the learned vocabulary captured — total tokens, tokens
    * that are merged units (they contain the joining space; base tokens
    * never do), and the integer-bp share. The consuming leg of the
    * artifact round trip: the rules come back from parquet, not from the
    * in-process learner, so a lossy artifact would flip the hash.
    */
  def bpeCoverageTrained(spark: SparkSession, docs: DataFrame,
      scratch: String, k: Int = 8): DataFrame = {
    val artifact = s"$scratch/bpe_merges"
    val p = new org.apache.hadoop.fs.Path(artifact)
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    // validate a pre-existing artifact before reuse, not exists-only: an
    // artifact trained with a different k (or left stale in a shared
    // scratch) has a different row count, and consuming it would compute
    // coverage from rules that don't match the requested k — rebuild
    def loadRules(): Array[(String, String)] =
      spark.read.parquet(artifact)
        .orderBy(col("merge_round"))
        .collect()
        .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")))
    val rules = {
      val existing = if (fs.exists(p)) Some(loadRules()) else None
      existing.filter(_.length == k).getOrElse {
        bpeTrainPersisted(spark, docs, scratch, k)
        loadRules()
      }
    }
    val applied = rules.foldLeft(Dedup.tokens(col("text"))) {
      case (toksCol, (a, b)) =>
        aggregate(toksCol, array().cast("array<string>"),
          (acc, t) =>
            when(try_element_at(acc, lit(-1)) === lit(a) && t === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(a + " " + b))))
              .otherwise(concat(acc, array(t))))
    }
    docs.select(applied.as("toks"))
      .select(size(col("toks")).cast("long").as("nt"),
        expr("cast(size(filter(toks, t -> t like '% %')) as long)").as("nm"))
      .agg(sum(col("nt")).as("n_tokens"), sum(col("nm")).as("n_merged"))
      .select(col("n_tokens"), col("n_merged"),
        expr("(10000 * n_merged) DIV n_tokens").as("merged_bp"))
  }

  /** BPE APPLY — re-tokenize the corpus with a learned merge table, the
    * artifact a tokenizer pipeline actually ships (learn once on a sample,
    * apply everywhere). The k merge rules come back from [[bpeLearn]] as
    * O(k) driver rows (metadata, not data) and are baked into the plan as
    * literals — applying them is ONE scan with ZERO shuffle: per row, each
    * rule folds over the token array greedily left-to-right (`aggregate`:
    * if the accumulator's last token is `a` and the current is `b`, replace
    * the last with the merged token, else append). Left-to-right fold ≡ the
    * gaps-and-islands odd-occurrence rule the learner rewrites with — a
    * freshly merged token can never re-match as `a` within its own rule
    * ("a b" is strictly longer than "a") — so applying rules 1..k in order
    * reproduces the learner's round-by-round corpus exactly; the oracle
    * pins that by replaying the unrolled rounds in SQL and reading the
    * final token table. Output: (doc_id, pos, tok) with dense 1-based
    * positions, input-partitioned — a downstream write streams straight
    * out of the scan stage, and at 100 TB the merge table is still k rows.
    */
  def tokenizeBpe(docs: DataFrame, k: Int = 3): DataFrame = {
    val applied = bpeLearn(docs, k).foldLeft(Dedup.tokens(col("text"))) {
      case (toksCol, (_, a, b, _)) =>
        aggregate(toksCol, array().cast("array<string>"),
          (acc, t) =>
            when(try_element_at(acc, lit(-1)) === lit(a) && t === lit(b),
              concat(slice(acc, lit(1), size(acc) - 1),
                array(lit(a + " " + b))))
              .otherwise(concat(acc, array(t))))
    }
    docs
      .select(col("doc_id"), posexplode(applied).as(Seq("p", "tok")))
      .select(col("doc_id"), (col("p") + 1).cast("long").as("pos"), col("tok"))
  }

  /** Fixed-size overlapping token chunks — the context-window slicing
    * step that turns curated documents into training sequences (or RAG
    * passages). Chunk c covers tokens [c·stride, c·stride + chunkSize);
    * nChunks = max(1, ⌈(n − overlap)/stride⌉) so every token is covered
    * and no chunk is a strict suffix-duplicate of its predecessor.
    * Scan-side transform + posexplode: rows expand ≈ n/stride per doc with
    * ZERO shuffle — the output partitioning is the input's, so a
    * downstream `.write` streams straight out of the scan stage.
    */
  def chunkDocuments(docs: DataFrame, chunkSize: Int = 64, stride: Int = 48): DataFrame = {
    require(stride > 0 && chunkSize >= stride, "chunk must cover its stride")
    val overlap = chunkSize - stride
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .withColumn("n_chunks",
        greatest(lit(1L),
          expr(s"(size(toks) - $overlap + $stride - 1) div $stride")))
      .select(col("doc_id"),
        posexplode(expr(
          s"transform(sequence(0, n_chunks - 1), c -> slice(toks, c * $stride + 1, $chunkSize))")))
      .select(
        col("doc_id"),
        col("pos").cast("long").as("chunk_id"),
        size(col("col")).cast("long").as("n_chunk_tokens"),
        array_join(col("col"), " ").as("chunk_text"))
  }

  /** Corpus-LM document scoring — the KenLM-shaped quality filter real
    * curation pipelines run (CCNet/RefinedWeb score documents against an
    * n-gram language model and gate on the score): train an add-1-smoothed
    * bigram model on the corpus, then score each doc by its mean smoothed
    * bigram probability. Cross-engine-exact by construction: each
    * probability is ONE correctly-rounded double division
    * (1e6·(c(a,b)+1))/(c(a)+V) floor-scaled to a long, so the per-doc SUM
    * is exact integer arithmetic — no accumulation-order dependence — and
    * only the final mean divides.
    *
    * Shape (two passes, both keyed): a TRAIN pass builds the model — one
    * bigram hash agg + one unigram hash agg + the vocab scalar — and a
    * SCORE pass equi-joins doc bigrams to the model on (a, b) and
    * hash-aggs per doc. At 100 TB the model is the shipped artifact
    * (rows = |distinct bigrams|, corpus-bounded): training amortizes over
    * every corpus it scores, and the scoring join stays a well-keyed
    * shuffle (or a broadcast when the model fits). Docs with <2 tokens
    * score 0 over 0 bigrams.
    */
  def lmScore(docs: DataFrame): DataFrame = {
    val pairs = docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        """IF(size(t) < 2, array(),
              transform(sequence(1, size(t) - 1),
                        i -> struct(t[i-1] AS a, t[i] AS b)))""")).as("p"))
      .select(col("doc_id"), col("p.a").as("a"), col("p.b").as("b"))
    // vocab-sized and bigram-vocab-sized tables, eagerly checkpointed:
    // the vocab scalar and the model join replay them instead of
    // re-expanding the corpus, and the scoring join reads the MODEL as
    // the materialized artifact it is in a real pipeline — three corpus
    // scans total (unigram count, bigram count, scoring) instead of five
    val uni = docs
      .select(explode(Dedup.tokens(col("text"))).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("ca"))
      .localCheckpoint()
    val vocab = uni.agg(count(lit(1)).as("vocab"))
    val model = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("cab"))
      .join(uni, Seq("a"))
      .crossJoin(broadcast(vocab))
      .select(col("a"), col("b"),
        floor(lit(1e6) * (col("cab") + 1).cast("double") /
          (col("ca") + col("vocab")).cast("double")).cast("long").as("pq"))
      .localCheckpoint()
    val scored = pairs
      .join(model, Seq("a", "b"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("pq")).as("lm_score"))
    docs.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("lm_score"), lit(0L)).as("lm_score"),
        when(col("n_bigrams").isNotNull,
          col("lm_score").cast("double") / col("n_bigrams").cast("double"))
          .otherwise(lit(0.0)).as("mean_p6"))
  }

  /** Vocabulary coverage: what fraction of corpus token OCCURRENCES the
    * top-k most frequent token types cover — the tokenizer-design
    * metric (a k-entry vocab covering 97% of occurrences means 3% of
    * the stream falls to fallback/UNK handling). Exact integer basis
    * points; deterministic top-k (count desc, token asc).
    *
    * One corpus scan to the token-frequency table (map-side combinable,
    * |vocab| rows, checkpointed); the top-k rank is WindowGroupLimit-
    * pruned and the grand total re-reads the checkpointed frequency
    * table, not the corpus.
    */
  def vocabCoverage(docs: DataFrame, k: Int = 20): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val freq = docs
      .select(explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false)
    val top = freq
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("tok"))))
      .where(col("rnk") <= k)
      .agg(count(lit(1)).as("vocab_size"), sum(col("cnt")).as("covered"))
    val total = freq.agg(sum(col("cnt")).as("total_tokens"))
    top.join(broadcast(total))
      .select(col("vocab_size"), col("covered"), col("total_tokens"),
        expr("covered * 10000 DIV total_tokens").as("coverage_bp"))
  }

  /** Character-3-gram diversity — the compressibility proxy quality
    * signal (a low distinct-ngram ratio means the text is repetitive at
    * the CHARACTER level, the gzip-ratio heuristic of the public corpus
    * pipelines without the codec): per doc the 3-gram count, distinct
    * count, and their ratio in integer basis points. Complements
    * [[repetitionStats]] (token/bigram level): character n-grams catch
    * intra-token repetition ("aaaa…", repeated punctuation runs) that
    * token-level stats miss. Pure scan-side array expressions — no
    * explode, no shuffle; length/substring are code-point based and
    * identical cross-engine.
    */
  def compressRatio(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), expr(
        """IF(length(text) < 3, array(),
             transform(sequence(1, length(text) - 2),
                       i -> substring(text, i, 3)))""").as("g"))
      .select(col("doc_id"),
        size(col("g")).cast("long").as("n_grams"),
        size(array_distinct(col("g"))).cast("long").as("n_distinct"))
      .withColumn("diversity_bp",
        expr("IF(n_grams > 0, n_distinct * 10000 DIV n_grams, NULL)"))

  /** Rolling-hash fingerprint (Rabin–Karp shape): left-fold
    * h = (h*31 + wordHash) mod (2^31 - 1) over the token stream, where
    * wordHash is the first 32 bits of md5(word). Order-sensitive (unlike
    * the set-style fingerprints), computed scan-side as one `aggregate`
    * higher-order fold per row — no shuffle. The modulus keeps every
    * intermediate below 2^37, exact in 64-bit on any engine.
    */
  def rollingHashFingerprints(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      aggregate(
        Dedup.tokens(col("text")),
        lit(0L),
        (acc, w) => (acc * lit(31L) +
          conv(substring(md5(w), 1, 8), 16, 10).cast("long")) % lit(2147483647L))
        .as("rolling_fp"))

  /** Percentile quality TIERS — the graded form of [[qualityGate]]'s
    * binary cut, the primitive behind "train on the top 30%, anneal on
    * the top decile" curricula: every scored doc gets a stable decile
    * (1 = lowest) from the corpus score distribution. Tier boundaries
    * are the same rank-convention percentile values the gate uses
    * (value at rank ceil(n·t/tiles) — r7's dual-scale-verified
    * convention), so equal scores always share a tier: deterministic
    * where SQL ntile's tie-splitting is not, and stable when the corpus
    * grows by a few docs where equal-count tiles are not.
    *
    * Shape: the scored (doc_id, qs) checkpoint is ONE corpus scan
    * (quality-gate precedent); the cutoffs come from the ≤1001-row score
    * histogram and collapse to a single tiles−1-element array row that
    * broadcasts; tier assignment is a scan-side count-of-exceeded-cutoffs
    * over the checkpoint. No corpus-sized exchange anywhere.
    */
  def qualityDeciles(docs: DataFrame, tiles: Int = 10): DataFrame = {
    require(tiles >= 2, "at least two tiers")
    val scored = qualityStats(docs)
      .filter(col("quality_score").isNotNull && !isnan(col("quality_score")))
      .select(col("doc_id"),
        floor(col("quality_score") * 1000 + 0.5).cast("long").as("qs"))
      .withColumn("corpus", lit(1L))
      .localCheckpoint()
    val cuts = Percentiles
      .percentileDisc(scored, "corpus", "qs", (1 until tiles).map(_.toDouble / tiles))
      .agg(sort_array(collect_list(col("pct_value"))).as("cuts"))
    scored.crossJoin(broadcast(cuts))
      .select(col("doc_id"), col("qs"),
        (lit(1L) + size(filter(col("cuts"), c => col("qs") > c)).cast("long"))
          .as("tier"))
  }

  /** Stop list for the Gopher stop-word rule — the published list (Rae et
    * al. 2021 §A.1.1) plus "a"/"in", which the paper folds into its
    * larger heuristic set.
    */
  private val gopherStops =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  /** Gopher-style rule-based quality filter (Rae et al. 2021, "Scaling
    * Language Models: ... Gopher", §A.1.1 quality heuristics), the
    * rule-set stage every major corpus (MassiveText, RefinedWeb, Dolma)
    * runs BEFORE model-based scoring. Four of the published rules apply
    * to this corpus shape (no lines, no ellipses):
    *
    *   r_wordcount — token count in [30, 100000]
    *   r_meanlen   — mean token length in [3, 10] characters
    *   r_stopwords — contains >= 2 distinct stop-list words
    *   r_maxfreq   — most frequent token <= 20% of all tokens
    *
    * Every threshold is an exact cross-multiplied integer comparison
    * (3·n <= sum_len, 5·max_cnt <= n, ...) — no division anywhere, so
    * pass/fail is bit-identical on any engine and immune to the
    * ratio-rounding drift that plagues reimplementations of these
    * filters.
    *
    * Shape: a PURE scan-side projection — every per-doc stat comes from
    * the doc's own token array (the top-token count is a longest-run fold
    * over the sorted array; distinct stop hits are an array
    * intersection), so the filter has ZERO exchanges, fuses into the
    * scan, and the identical expression runs statelessly under a
    * streaming plan. The oracle computes the same stats via explode +
    * GROUP BY — two routes, one semantics.
    */
  def gopherRules(docs: DataFrame): DataFrame =
    gopherLabeled(docs).drop("t", "fp")

  /** [[gopherRules]] keeping the token array AND the canonical content
    * fingerprint alongside the verdict — the shared base the model-based
    * quality trainer reads its weak labels AND its features from in one
    * projection (one corpus scan, not a label-join). The fp column is
    * [[fingerprint]] over the ORIGINAL text (not a token re-join), so
    * every consumer dedups on the one canonical key; Catalyst prunes the
    * md5 out of consumers that drop it.
    */
  private def gopherLabeled(docs: DataFrame): DataFrame = {
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("t"),
        fingerprint(col("text")).as("fp"))
      .select(
        col("doc_id"), col("t"), col("fp"),
        size(col("t")).cast("long").as("n_tokens"),
        aggregate(col("t"), lit(0L), (acc, w) => acc + length(w).cast("long"))
          .as("sum_len"),
        expr(
          """aggregate(array_sort(t),
               named_struct('prev', CAST(NULL AS STRING), 'run', 0L, 'mx', 0L),
               (a, x) -> named_struct(
                 'prev', x,
                 'run', IF(a.prev <=> x, a.run + 1, 1L),
                 'mx', greatest(a.mx, IF(a.prev <=> x, a.run + 1, 1L))),
               a -> a.mx)""").as("max_cnt"),
        size(array_intersect(array_distinct(col("t")),
          array(gopherStops.map(lit): _*))).cast("long").as("n_stop_distinct"))
      .select(
        col("doc_id"), col("t"), col("fp"), col("n_tokens"), col("sum_len"),
        col("max_cnt"), col("n_stop_distinct"),
        (col("n_tokens") >= 30L && col("n_tokens") <= 100000L).as("r_wordcount"),
        (lit(3L) * col("n_tokens") <= col("sum_len") &&
          col("sum_len") <= lit(10L) * col("n_tokens")).as("r_meanlen"),
        (col("n_stop_distinct") >= 2L).as("r_stopwords"),
        (lit(5L) * col("max_cnt") <= col("n_tokens")).as("r_maxfreq"))
      .withColumn("pass",
        col("r_wordcount") && col("r_meanlen") &&
          col("r_stopwords") && col("r_maxfreq"))
  }

  // ---- model-based quality classifier ------------------------------------

  /** Token → hashed feature bucket: first 4 md5 hex digits (identical in
    * both engines) read as an integer, mod `buckets` — the hashing trick
    * every fastText-class quality classifier uses to bound the feature
    * space.
    */
  private def bucketOf(w: org.apache.spark.sql.Column, buckets: Int)
      : org.apache.spark.sql.Column =
    conv(substring(md5(w), 1, 4), 16, 10).cast("long") % buckets

  /** Hashed-feature linear quality model — the trained stage every
    * production pipeline runs AFTER rule-based gates (the DCLM /
    * FineWeb-edu pattern): weak labels come from the [[gopherRules]]
    * verdict, features are hashed token unigrams, and each bucket's
    * weight is the smoothed rate contrast
    * w(b) = ⌊1e6 · (r⁺−r⁻)/(r⁺+r⁻)⌋ with r± = (c±+1)/(N±+buckets) —
    * add-one-smoothed Naive-Bayes-style class rates, cross-multiplied so
    * both numerator and denominator are exact BIGINTs and the weight is
    * ONE IEEE division + floor (the lmScore exactness discipline: no
    * transcendentals, hash-exact cross-engine).
    *
    * Shape at 100 TB: labels + token arrays come from ONE
    * [[gopherLabeled]] projection (no label join); the explode feeds a
    * `buckets`-key aggregate whose partials map-side-combine to ≤buckets
    * rows per partition, so the exchange is metadata-sized regardless of
    * corpus size. (At extreme scale you train on a corpus sample and
    * ship the artifact — [[writeQualityModel]] is that path.)
    * Magnitudes: c±·N± products stay < 2⁶³ up to ~3e9 tokens per class;
    * beyond that the same expressions run in DECIMAL(38,0) unchanged.
    */
  def qualityModelWeights(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val b = buckets.toLong
    val counts = gopherLabeled(docs)
      .select(col("pass"), explode(col("t")).as("w"))
      .select(col("pass"), bucketOf(col("w"), buckets).as("b"))
      .groupBy(col("b"))
      .agg(sum(when(col("pass"), 1L).otherwise(0L)).as("cpos"),
        sum(when(!col("pass"), 1L).otherwise(0L)).as("cneg"))
    val tot = counts.agg(
      sum(col("cpos")).as("npos"), sum(col("cneg")).as("nneg"))
    val num = (col("cpos") + lit(1L)) * (col("nneg") + lit(b)) -
      (col("cneg") + lit(1L)) * (col("npos") + lit(b))
    val den = (col("cpos") + lit(1L)) * (col("nneg") + lit(b)) +
      (col("cneg") + lit(1L)) * (col("npos") + lit(b))
    counts.crossJoin(broadcast(tot))
      .select(col("b"),
        floor(lit(1e6) * (num.cast("double") / den.cast("double")))
          .cast("long").as("w"))
  }

  /** Score every doc with the trained weights BAKED AS LITERALS: the
    * O(buckets) weight table collects to the driver (metadata, the PQ
    * codebook class) and scoring is a zero-shuffle scan-side fold —
    * score(d) = ⌊Σ_t w(h(t)) / n_tokens⌋, an exact long sum and one
    * IEEE division. `model_pass` is the score>0 decision the gate
    * machinery composes with.
    */
  def qualityModelScore(docs: DataFrame, buckets: Int = 1024): DataFrame =
    scoreWithWeights(docs,
      qualityModelWeights(docs, buckets).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap,
      buckets)

  /** The scoring expression alone — ⌊Σ_t w(h(t)) / n_tokens⌋ over a text
    * column with the weights baked as literals — a PURE stateless Column,
    * so the identical projection runs batch and STREAMING (the ingest
    * model gate [[graft.streaming.DocPipeline.curateModelGated]] puts in
    * front of enrichment, the decontaminate-filter composition pattern).
    */
  def modelScore(
      text: org.apache.spark.sql.Column, wts: Map[Long, Long],
      buckets: Int = 1024): org.apache.spark.sql.Column = {
    // A weight keyed outside [0, buckets) means the table was trained
    // with a DIFFERENT bucket count than this scorer hashes with —
    // silently dropping it would mis-score every doc; fail loudly.
    require(wts.keys.forall(k => k >= 0L && k < buckets.toLong),
      s"weight bucket ids must lie in [0, $buckets): trained bucket count " +
        "differs from the scoring bucket count")
    val wCol = typedLit((0 until buckets).map(i => wts.getOrElse(i.toLong, 0L)))
    val t = Dedup.tokens(text)
    val raw = aggregate(t, lit(0L), (acc, x) =>
      acc + element_at(wCol, (bucketOf(x, buckets) + lit(1L)).cast("int")))
    floor(raw.cast("double") / size(t).cast("long").cast("double")).cast("long")
  }

  private def scoreWithWeights(
      docs: DataFrame, wts: Map[Long, Long], buckets: Int): DataFrame = {
    val wCol = typedLit((0 until buckets).map(i => wts.getOrElse(i.toLong, 0L)))
    docs.select(col("doc_id"), Dedup.tokens(col("text")).as("t"))
      .select(col("doc_id"), size(col("t")).cast("long").as("n_tokens"),
        aggregate(col("t"), lit(0L), (acc, x) =>
          acc + element_at(wCol, (bucketOf(x, buckets) + lit(1L)).cast("int")))
          .as("raw"))
      .select(col("doc_id"), col("n_tokens"), col("raw"),
        floor(col("raw").cast("double") / col("n_tokens").cast("double"))
          .cast("long").as("score"))
      .withColumn("model_pass", col("score") > 0L)
  }

  /** Model-vs-weak-label agreement — the confusion matrix every trained
    * quality stage ships with (the classifier-eval artifact): per
    * (gopher pass, model_pass) cell, doc counts. 4 rows out; exact
    * integer counts, so the eval hash-matches. In-sample by design at
    * this harness scale (the model trains on the same corpus it scores);
    * the spec checks the diagonal dominates — the model must actually
    * learn its weak labels.
    */
  def qualityModelEval(docs: DataFrame, buckets: Int = 1024): DataFrame =
    gopherRules(docs).select(col("doc_id"), col("pass"))
      .join(qualityModelScore(docs, buckets)
        .select(col("doc_id"), col("model_pass")), "doc_id")
      .groupBy(col("pass"), col("model_pass"))
      .agg(count(lit(1)).as("n"))

  /** CALIBRATED model quality gate — the production cut. `tools/ModelEval`
    * proved the naive score>0 decision is recall-only on this model
    * (zero false-rejects, every error a false-accept), so the gate
    * instead cuts the SCORE at the weak-label base rate: accept the
    * `npos` highest-scoring docs, where `npos` is the gopher-pass count —
    * the model ranks, the calibrated threshold decides (the
    * fastText/DCLM operating-point convention). The cut value is the
    * score at ascending rank `n − npos` (the [[Percentiles]] rank
    * convention), so equal scores share a fate — deterministic where a
    * count-exact cut is not, and hash-exact cross-engine.
    *
    * Shape at 100 TB: ONE corpus scan computes the weak label AND the
    * model score together ([[gopherLabeled]] + the literal-weights fold —
    * no label join), checkpointed; the rank row (1 row) and the score
    * histogram (≤|distinct scores| rows) both replay the checkpoint, the
    * cut broadcasts back, and the verdict is a scan-side comparison.
    * Training remains the one [[qualityModelWeights]] metadata aggregate.
    */
  def qualityModelCalibrated(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val scored = labeledScored(docs, buckets)
    scored.crossJoin(broadcast(scoreCutAtBaseRate(scored)))
      .select(col("doc_id"), col("pass"), col("score"), col("cut"),
        (col("score") > col("cut")).as("cal_pass"))
  }

  /** One-scan labeled + scored + fingerprinted base shared by the
    * calibrated gate and the model-stage funnel: (doc_id, fp, n_tokens,
    * pass, score), checkpointed — weak label, model score, and dedup key
    * all come from the SAME [[gopherLabeled]] projection (no label
    * join); the weight table is the one [[qualityModelWeights]] metadata
    * aggregate baked as literals.
    */
  private def labeledScored(docs: DataFrame, buckets: Int): DataFrame = {
    val wts = qualityModelWeights(docs, buckets).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val wCol = typedLit((0 until buckets).map(i => wts.getOrElse(i.toLong, 0L)))
    gopherLabeled(docs)
      .select(col("doc_id"), col("fp"), col("n_tokens"), col("pass"),
        floor(aggregate(col("t"), lit(0L), (acc, x) =>
          acc + element_at(wCol, (bucketOf(x, buckets) + lit(1L)).cast("int")))
          .cast("double") / size(col("t")).cast("long").cast("double"))
          .cast("long").as("score"))
      .localCheckpoint()
  }

  /** The base-rate cut as a 1-row broadcastable frame: the score value at
    * ascending rank max(n − npos, 1) (≥1 so the everything-passes corpus
    * degenerates to cut = min score, not an empty frame). Both the rank
    * row and the ≤|distinct scores| histogram replay the caller's
    * checkpoint — no corpus rescans.
    */
  private def scoreCutAtBaseRate(scored: DataFrame): DataFrame = {
    val ranks = scored.agg(
      greatest(count(lit(1)) - sum(when(col("pass"), 1L).otherwise(0L)), lit(1L))
        .as("rn"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("one")).orderBy(col("score"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    scored.withColumn("one", lit(1))
      .groupBy(col("one"), col("score")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .crossJoin(broadcast(ranks))
      .filter(col("cum") >= col("rn") && col("cum") - col("cnt") < col("rn"))
      .select(col("score").as("cut"))
  }

  /** [[yieldFunnel]] with the CALIBRATED MODEL stage appended — the
    * complete curation funnel a production pipeline publishes:
    * raw → exact-dedup → gopher rules → calibrated model gate, doc and
    * token counts per stage. Still effectively ONE corpus scan: the
    * [[labeledScored]] checkpoint carries tokens, fingerprint, weak
    * label, AND model score together; the cut and the keeper window
    * replay it; four conditional sums unpivot. Exact integers
    * end-to-end.
    */
  def yieldFunnelModel(docs: DataFrame, buckets: Int = 1024): DataFrame = {
    val scored = labeledScored(docs, buckets)
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val flagged = scored
      .crossJoin(broadcast(scoreCutAtBaseRate(scored)))
      .withColumn("keeper", col("doc_id") === min(col("doc_id")).over(w))
      .withColumn("cal", col("score") > col("cut"))
    flagged.agg(
      count(lit(1)).as("raw_docs"),
      sum(col("n_tokens")).as("raw_tokens"),
      sum(when(col("keeper"), 1L).otherwise(0L)).as("dedup_docs"),
      sum(when(col("keeper"), col("n_tokens")).otherwise(0L)).as("dedup_tokens"),
      sum(when(col("keeper") && col("pass"), 1L).otherwise(0L)).as("gated_docs"),
      sum(when(col("keeper") && col("pass"), col("n_tokens")).otherwise(0L))
        .as("gated_tokens"),
      sum(when(col("keeper") && col("pass") && col("cal"), 1L).otherwise(0L))
        .as("model_docs"),
      sum(when(col("keeper") && col("pass") && col("cal"), col("n_tokens"))
        .otherwise(0L)).as("model_tokens"))
      .select(expr(
        """stack(4,
             1L, 'raw',   raw_docs,   raw_tokens,
             2L, 'dedup', dedup_docs, dedup_tokens,
             3L, 'gated', gated_docs, gated_tokens,
             4L, 'model', model_docs, model_tokens)
           AS (stage_id, stage, n_docs, n_tokens)"""))
  }

  /** Confusion matrix of the CALIBRATED gate vs the gopher weak label —
    * the operating-point eval shipped next to [[qualityModelEval]]'s
    * score>0 matrix. Unlike that one, BOTH error cells are populated
    * here (the calibrated cut trades false-accepts for false-rejects),
    * and total error is lower — the spec pins both properties.
    */
  def qualityModelCalibratedEval(docs: DataFrame, buckets: Int = 1024): DataFrame =
    qualityModelCalibrated(docs, buckets)
      .groupBy(col("pass"), col("cal_pass"))
      .agg(count(lit(1)).as("n"))

  /** Per-source corpus governance stats — the dashboard row every
    * multi-source training pipeline keeps per ingest feed: doc and token
    * volume, exact-dup ratio (distinct content fingerprints vs docs),
    * and language spread. ONE corpus scan into a |sources|-row aggregate
    * (map-side combinable; the two distincts are the standard two-phase
    * expansion over (source, fp)/(source, lang) — still |sources|-keyed).
    * The dup ratio is one IEEE division of exact counts.
    */
  def sourceStats(docs: DataFrame): DataFrame =
    docs
      .select(col("source"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_toks"),
        fingerprint(col("text")).as("fp"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_toks")).as("n_tokens"),
        countDistinct(col("fp")).as("n_distinct"),
        countDistinct(col("lang")).as("n_langs"))
      .withColumn("dup_ratio",
        lit(1.0) - col("n_distinct").cast("double") / col("n_docs").cast("double"))

  /** Per-source token-distribution divergence — the drift/skew monitor a
    * multi-source pipeline runs next to [[sourceStats]]: for each source,
    * the k most OVER-represented tokens vs the corpus background. The
    * contrast is the cross-multiplied rate difference
    * c_st·N_corpus − c_t·N_s (>0 ⟺ token rate in the source exceeds the
    * corpus rate) — exact BIGINT, no division anywhere, so the ranking
    * hash-matches at any accumulation order. Magnitudes stay < 2⁶³ up to
    * ~3e9 corpus tokens; beyond that the same expressions run in
    * DECIMAL(38,0) unchanged.
    *
    * Shape at 100 TB: one corpus scan into the (source, token) count
    * aggregate (map-side combinable), checkpointed; the three marginals
    * replay the checkpoint. Source totals broadcast (|sources| rows);
    * the token-marginal join is (tok)-keyed hash — the vocabulary grows
    * with the corpus, so it must NOT broadcast. Top-k per source is
    * WindowGroupLimit-pruned.
    */
  def sourceDivergence(docs: DataFrame, k: Int = 5): DataFrame = {
    val st = docs
      .select(col("source"), explode(Dedup.tokens(col("text"))).as("tok"))
      .groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c_st"))
      .localCheckpoint()
    val bySource = st.groupBy(col("source")).agg(sum(col("c_st")).as("n_s"))
    val byTok = st.groupBy(col("tok")).agg(sum(col("c_st")).as("c_t"))
    val total = st.agg(sum(col("c_st")).as("n_corpus"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source")).orderBy(desc("contrast"), asc("tok"))
    st.join(broadcast(bySource), "source")
      .join(byTok, "tok")
      .crossJoin(broadcast(total))
      .withColumn("contrast",
        col("c_st") * col("n_corpus") - col("c_t") * col("n_s"))
      .filter(col("contrast") > 0L)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("source"), col("tok"), col("c_st"), col("c_t"),
        col("contrast"), col("rn"))
  }

  /** Unicode-NFC text canonicalization + the unicode-safe content
    * fingerprint: composed vs decomposed accents are the SAME visible
    * text but different bytes, so un-normalized md5 fingerprints
    * silently split dedup groups on multilingual corpora. The NFC pass
    * is the codegen'd [[graft.functions.NfcNormalize]] expression (no
    * UDF; fast path returns already-normalized text with zero
    * allocation), making this a pure scan-side projection.
    */
  def normalizeNfc(docs: DataFrame): DataFrame = {
    val norm = graft.functions.GraftFunctions.nfc_normalize(col("text"))
    docs.select(col("doc_id"), norm.as("norm_text"),
      fingerprint(norm).as("fp_nfc"))
  }

  /** Corpus yield funnel — the headline report every curation pipeline
    * publishes: doc and token counts at each stage of
    * raw → exact-dedup (canonical keeper per content fingerprint) →
    * quality gate (Gopher rules). ONE corpus scan computes tokens,
    * fingerprint, and the gate verdict together ([[gopherLabeled]] + the
    * canonical fp); the keeper flag is a min-doc_id window per fp (the
    * dedup groups are content-duplicate sets — bounded); the three stage
    * rows come from conditional sums over that single pass, unpivoted.
    * All counts exact integers.
    */
  def yieldFunnel(docs: DataFrame): DataFrame = {
    // dedup key = the one canonical fingerprint(text) carried through
    // gopherLabeled — NOT a token re-join, which diverges on edge
    // whitespace (split keeps an edge empty token, so the re-join gains
    // an edge space that fingerprint()'s trim strips on one side only)
    val base = gopherLabeled(docs)
      .select(col("doc_id"), col("n_tokens"), col("pass"), col("fp"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("fp"))
    val flagged = base
      .withColumn("keeper", col("doc_id") === min(col("doc_id")).over(w))
    flagged.agg(
      count(lit(1)).as("raw_docs"),
      sum(col("n_tokens")).as("raw_tokens"),
      sum(when(col("keeper"), 1L).otherwise(0L)).as("dedup_docs"),
      sum(when(col("keeper"), col("n_tokens")).otherwise(0L)).as("dedup_tokens"),
      sum(when(col("keeper") && col("pass"), 1L).otherwise(0L)).as("gated_docs"),
      sum(when(col("keeper") && col("pass"), col("n_tokens")).otherwise(0L))
        .as("gated_tokens"))
      .select(expr(
        """stack(3,
             1L, 'raw',   raw_docs,   raw_tokens,
             2L, 'dedup', dedup_docs, dedup_tokens,
             3L, 'gated', gated_docs, gated_tokens)
           AS (stage_id, stage, n_docs, n_tokens)"""))
  }

  /** Persist the trained weight table as the model ARTIFACT (b, w) —
    * O(buckets) rows of pure metadata, trained once and replayed by
    * every scoring pass (the [[Similarity.writeIvfPqIndex]] artifact
    * discipline applied to the quality model).
    */
  def writeQualityModel(
      docs: DataFrame, path: String, buckets: Int = 1024): Unit =
    qualityModelWeights(docs, buckets)
      .coalesce(1).write.mode("overwrite").parquet(path)

  /** [[qualityModelScore]] with weights from the LOADED artifact — longs
    * round-trip parquet bit-exactly, so the registered query hash-matches
    * the SAME oracle as `text_quality_model`, proving the round trip.
    */
  def qualityModelScorePersisted(
      docs: DataFrame, path: String, buckets: Int = 1024): DataFrame =
    scoreWithWeights(docs,
      docs.sparkSession.read.parquet(path).select(col("b"), col("w"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap,
      buckets)

  /** The canonical retrieval benchmark queries for [[bm25TopK]] — shared
    * with the oracle-SQL builder so both engines score the same terms.
    */
  val Bm25Queries: Seq[(Int, Seq[String])] = Seq(
    1 -> Seq("hash", "join", "merge"),
    2 -> Seq("window", "sort", "order"),
    3 -> Seq("stream", "batch", "data"))

  /** BM25 top-k retrieval — the lexical ranking function every
    * training-data/RAG pipeline keeps next to its embedding index
    * (Robertson–Spärck Jones; k1 = 1.2, b = 0.75, and the log-free
    * idf = (N − df + ½)/(df + ½) variant so every per-term score is a
    * fixed chain of individual IEEE ops — no transcendental whose last
    * ulp could differ across engines). Each term score floor-scales to a
    * long and the per-query score is an exact integer SUM of those longs
    * (order-free), so rankings hash-match the oracle bit-for-bit.
    *
    * Shape at 100 TB: term frequencies are scan-side array folds over
    * the token array (wide tf columns, no explode — the per-doc-stats
    * precedent), checkpointed once as the (doc_id, dl, tf_*) projection;
    * corpus stats (N, total length, per-term df) are ONE single-row agg
    * over the checkpoint, broadcast back; scoring + the per-query top-k
    * replay the checkpoint — one corpus scan total, and the only
    * exchange is the top-k window's (WindowGroupLimit prunes to k rows
    * per partition before it). Queries are few by nature, so the
    * per-qid window partitioning is not a funnel.
    */
  /** The shared per-term tf projection both rankers score from:
    * (doc_id, dl, tf_0..tf_m) — ONE corpus scan, checkpointed so each
    * downstream stats-agg + scoring replay reads the materialized rows
    * instead of rescanning parquet. [[hybridRrf]] builds this once and
    * feeds BOTH rankers (the r7 `ngramPairStats` price-the-shared-core
    * lesson applied to retrieval).
    */
  private def tfBase(docs: DataFrame, terms: Seq[String]): DataFrame =
    docs
      .select(col("doc_id"), Dedup.tokens(col("text")).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("long").as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("long").as(s"tf_$i")
        }: _*)
      .localCheckpoint()

  def bm25TopK(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])] = Bm25Queries,
      k: Int = 20): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    bm25FromBase(tfBase(docs, terms), terms, queries, k)
  }

  private def bm25FromBase(
      base: DataFrame,
      terms: Seq[String],
      queries: Seq[(Int, Seq[String])],
      k: Int): DataFrame = {
    val idx = terms.zipWithIndex.toMap
    val statCols = count(lit(1)).cast("long").as("n_docs") +:
      sum(col("dl")).as("total_dl") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val avgdl = col("total_dl").cast("double") / col("n_docs").cast("double")
    def termScore(i: Int): org.apache.spark.sql.Column = {
      val tf = col(s"tf_$i").cast("double")
      val df = col(s"df_$i").cast("double")
      val idf = (col("n_docs").cast("double") - df + lit(0.5)) / (df + lit(0.5))
      val norm = lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)
      val denom = tf + lit(1.2) * norm
      floor(lit(1000000.0) * ((idf * (tf * lit(2.2))) / denom)).cast("long")
    }
    val perQuery = queries.map { case (qid, qterms) =>
      scored.select(lit(qid).cast("long").as("qid"), col("doc_id"),
        qterms.map(t => termScore(idx(t))).reduce(_ + _).as("score"))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("score"), asc("doc_id"))
    perQuery
      .filter(col("score") > 0L)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
  }

  /** Rarity-weighted term-frequency ranking — the second, independent
    * lexical ranker behind [[hybridRrf]]: score = Σ_t tf(t,d)·(N − df_t).
    * Deliberately orthogonal to BM25's shape (no length normalization, no
    * tf saturation), so fusing the two lists is a real signal combination
    * rather than two copies of one ranking. All-integer arithmetic —
    * exact at any accumulation order. Same single-scan shape as
    * [[bm25TopK]]: scan-side tf folds checkpointed once, a one-row stats
    * broadcast, WindowGroupLimit-pruned top-k.
    */
  def rareTermTopK(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])] = Bm25Queries,
      k: Int = 20): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    rareFromBase(tfBase(docs, terms), terms, queries, k)
  }

  private def rareFromBase(
      base: DataFrame,
      terms: Seq[String],
      queries: Seq[(Int, Seq[String])],
      k: Int): DataFrame = {
    val idx = terms.zipWithIndex.toMap
    val statCols = count(lit(1)).cast("long").as("n_docs") +:
      terms.indices.map(i =>
        sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val scored = base.crossJoin(broadcast(stats))
    val perQuery = queries.map { case (qid, qterms) =>
      scored.select(lit(qid).cast("long").as("qid"), col("doc_id"),
        qterms.map(t => col(s"tf_${idx(t)}") *
          (col("n_docs") - col(s"df_${idx(t)}"))).reduce(_ + _).as("score"))
    }.reduce(_ unionByName _)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("score"), asc("doc_id"))
    perQuery
      .filter(col("score") > 0L)
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("score"), col("rn"))
  }

  /** Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009) —
    * the standard way a RAG/training-data pipeline combines its lexical
    * and its second retriever: fused(d) = Σ_lists 1/(κ + rank_list(d))
    * over the union of both top-k lists (κ = 60, the published constant;
    * a doc missing from a list contributes 0). RRF needs only RANKS, so
    * it composes rankers with incomparable score scales — exactly why
    * it's the default fusion in hybrid search.
    *
    * Exactness: each term is one IEEE division of exact integers and the
    * fused score is ONE addition in fixed (bm25, rare) order — the same
    * two-op chain in both engines, so ties and order hash-match (ties
    * break by doc_id).
    *
    * Scale: fuses two k-row-per-query lists — the join input is
    * O(queries·k) rows regardless of corpus size; all corpus-sized work
    * happens inside the two rankers, which score from ONE shared
    * [[tfBase]] checkpoint (the per-term tf projection is built and
    * materialized once, not once per ranker), so the whole fusion costs
    * one corpus scan plus O(queries·k) fusion rows.
    */
  def hybridRrf(
      docs: DataFrame,
      queries: Seq[(Int, Seq[String])] = Bm25Queries,
      k: Int = 20, kappa: Int = 60): DataFrame = {
    val terms = queries.flatMap(_._2).distinct
    val base = tfBase(docs, terms)
    val bm = bm25FromBase(base, terms, queries, k)
      .select(col("qid"), col("doc_id"), col("rn").as("bm25_rn"))
    val rare = rareFromBase(base, terms, queries, k)
      .select(col("qid"), col("doc_id"), col("rn").as("rare_rn"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(desc("rrf"), asc("doc_id"))
    bm.join(rare, Seq("qid", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(kappa.toLong) + col("bm25_rn")).cast("double"),
          lit(0.0)) +
          coalesce(lit(1.0) / (lit(kappa.toLong) + col("rare_rn")).cast("double"),
            lit(0.0)))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("qid"), col("doc_id"), col("bm25_rn"), col("rare_rn"),
        col("rrf"), col("rn"))
  }

  /** CCNet-style LM-score buckets (Wenzek et al. 2020): per LANGUAGE,
    * docs split into head/middle/tail terciles of the bigram-LM fluency
    * score — the bucket decision CCNet makes with its Kneser-Ney
    * perplexity, over [[lmScore]]'s in-engine model. Per-language cutoffs
    * (not corpus-global) so the dominant language's score distribution
    * never buckets the rest — the [[qualityGateByLang]] precedent.
    *
    * Tiers use the same rank-convention cutoff values as
    * [[qualityDeciles]] (value at rank ⌈n·t/3⌉ within the language):
    * deterministic under ties where ntile's tie-splitting is not. tier 3
    * (highest score) = head, 2 = middle, 1 = tail.
    *
    * Scale: the scored (doc_id, lang, sc) projection is checkpointed
    * once; cutoffs come from the histogram-aggregated
    * [[Percentiles.percentileDisc]] (never a raw-table window) and
    * broadcast as a per-language 2-element array; tier assignment is a
    * scan-side filter count over the checkpoint.
    */
  def lmBuckets(docs: DataFrame): DataFrame = {
    val scored = lmScore(docs)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"),
        floor(col("mean_p6") * lit(1e6) + lit(0.5)).cast("long").as("sc"))
      .localCheckpoint()
    val cuts = Percentiles
      .percentileDisc(scored, "lang", "sc", Seq(1.0 / 3, 2.0 / 3))
      .groupBy(col("lang"))
      .agg(sort_array(collect_list(col("pct_value"))).as("cuts"))
    scored.join(broadcast(cuts), "lang")
      .select(col("doc_id"), col("lang"), col("sc"),
        (lit(1L) + size(filter(col("cuts"), c => col("sc") > c)).cast("long"))
          .as("tier"))
      .withColumn("bucket",
        when(col("tier") === 3L, "head")
          .when(col("tier") === 2L, "middle")
          .otherwise("tail"))
  }
}
