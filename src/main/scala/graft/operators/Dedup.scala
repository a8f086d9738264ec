package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for large-scale document pipelines.
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce results
  * bit-for-bit (both engines ship identical md5); MinHash components are
  * exact BIGINT arithmetic over md5 halves — no engine-specific integer
  * hash.
  *
  * Scale design (100 TB stance):
  *   - exact dedup = one hash aggregation on the dedup key: shuffle once on
  *     the key, map-side partial combine keeps the exchange small when
  *     duplicates are common.
  *   - MinHash: signatures are computed scan-side (explode + re-aggregate
  *     per doc, no cross-doc traffic), then LSH banding turns the O(n²)
  *     pair search into a groupBy on (band, band-signature) — only docs
  *     sharing a bucket are ever joined. This is the standard
  *     shingle→minhash→band→bucket-join decomposition.
  *   - SimHash: one pass, per-doc constant work (32 bit-position partial
  *     sums), again no cross-doc traffic until the final bucket compare.
  */
object Dedup {

  /** Exact dedup: keep, per key group, the row with the smallest tiebreak.
    * Deterministic (unique tiebreak) and expressible as one hash aggregate.
    */
  def exactDedup(events: DataFrame): DataFrame =
    events
      .groupBy(col("user_id"), col("event_type"))
      .agg(
        min(col("event_id")).as("event_id"),
        min_by(col("value"), col("event_id")).as("value"))

  /** Content-canonical document dedup: group by the normalized-content
    * fingerprint, keep the min doc_id as the canonical representative and
    * report the multiplicity — the materialized output an exact-dedup
    * pipeline actually writes. One hash aggregation on the fingerprint
    * (map-side combined; duplicates collapse before the exchange).
    */
  def canonicalDocs(docs: DataFrame): DataFrame =
    TextAnalysis.fingerprints(docs)
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** Codepoint class of unsegmented scripts — CJK unified ideographs,
    * hiragana/katakana, Thai — as one capturing group, identical in Java
    * regex (Spark) and RE2 (DuckDB oracle, `\x{...}` spelling).
    */
  private[operators] val UnsegmentedScript =
    "([\\u3040-\\u30FF\\u4E00-\\u9FFF\\u0E00-\\u0E7F])"

  /** Script-aware tokenization — THE seam every token-consuming operator
    * inherits (quality rules + model, BM25/TF-IDF, divergence, LM
    * scoring, shingles → MinHash/n-gram dedup, the streaming gates).
    * Unsegmented scripts (Han, kana, Thai) carry no spaces, so a raw
    * whitespace split treats a whole line as ONE token and silently
    * blinds every token-based operator on multilingual corpora. The seam
    * first spaces out each such codepoint (the public CCNet/CLD3
    * character-fallback practice — per-character tokens feed the same
    * shingle/n-gram machinery as words), then applies the identical
    * lower+trim+split. On text containing NONE of those codepoints the
    * regex is a no-op and the output is BIT-IDENTICAL to the legacy
    * split (the NFC fast-path discipline), keeping every ASCII oracle
    * and artifact byte-stable. Thai combining marks become their own
    * tokens — accepted: the fallback serves fingerprints/shingles, not
    * linguistics, and a dictionary segmenter would slot in at this seam.
    * Cross-engine evidence lives in the `text_tokenize_multiscript`
    * fixture oracle; DedupSpec pins the ASCII no-op bit-identity.
    */
  private[graft] def tokens(text: Column): Column =
    split(lower(trim(regexp_replace(text, UnsegmentedScript, " $1 "))), "\\s+")

  /** Word 3-gram shingles of a document as ONE array column per doc —
    * no row expansion. Docs shorter than 3 tokens drop. Downstream
    * per-doc reductions (MinHash minima, distinct counts) then run as
    * scan-side array expressions instead of explode + shuffle +
    * re-aggregate, which is the difference between a projection and an
    * exchange of |docs| × |shingles| rows at 100 TB.
    */
  private def shingleArrays(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        expr("transform(sequence(1, size(toks)-2)," +
          " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))").as("shingles"))

  /** Fixed odd multipliers for the k hash functions (any odd constants
    * < 2^14 work; a_j·h stays under 2^62 so the modular product is exact
    * BIGINT arithmetic on both engines). Shared with the oracle SQL.
    */
  private[graft] val minhashMultipliers =
    Seq(10007L, 11261L, 12289L, 13007L, 14591L, 15233L, 16127L, 9173L)
  /** Mersenne prime 2^31 − 1: the modulus scrambling each h_j ordering.
    * It must be FAR below the 48-bit base-hash range — a·h then wraps the
    * modulus thousands of times, so the orderings under different
    * multipliers decorrelate. (With a modulus near 2^61 the product of a
    * 15-bit multiplier and a 48-bit hash barely wraps: small base hashes
    * keep one monotone order under every a_j, which collapses the k
    * components into one and floods LSH banding with candidates —
    * measured 3× on the test corpus.)
    */
  private[graft] val minhashMod = 2147483647L

  /** One row per doc with all k MinHash components as columns `h0..h{k-1}`:
    * h_j = min over shingles of (a_j · h) mod (2^31 − 1), where h is ONE
    * md5 per shingle truncated to its first 48 bits (12 hex chars) and the
    * a_j are fixed odd multipliers. The multiply-mod genuinely permutes
    * the ordering per j (a plain affine ha + j·hb has nearly-parallel
    * projection directions for adjacent j, which correlates band rows and
    * floods LSH with spurious candidates — measured 6× on the test
    * corpus). One digest per shingle replaces the k salted digests of the
    * naive scheme — an 8× cut in the dominant hash cost.
    *
    * Pure projection over the per-doc shingle array — the base-hash array
    * is computed once (its defining expression is non-cheap, which is
    * exactly what stops CollapseProject from inlining it into each of the
    * k consumers), then every component is `array_min(transform(...))`
    * over it: NO shuffle, no row expansion, one corpus scan — the shape
    * that survives 100 TB.
    */
  private def minhashWide(docs: DataFrame, k: Int): DataFrame =
    minhashWideFromShingles(shingleArrays(docs), k)

  /** [[minhashWide]] body over a pre-built (doc_id, shingles) frame — the
    * seam that lets [[minhashEval]] share ONE shingle scan between the
    * LSH and exact-Jaccard sides.
    */
  private def minhashWideFromShingles(sh: DataFrame, k: Int): DataFrame = {
    require(k <= minhashMultipliers.size, s"at most ${minhashMultipliers.size} components")
    sh
      .select(col("doc_id"), expr(
        "transform(shingles, s -> cast(conv(substring(md5(s), 1, 12), 16, 10) as bigint))")
        .as("hs"))
      .select(col("doc_id") +: (0 until k).map(j =>
        expr(s"array_min(transform(hs, h -> (${minhashMultipliers(j)}L * h) % ${minhashMod}L))")
          .as(s"h$j")): _*)
  }

  /** MinHash signatures: k hash functions h_j(s) = (a_j·h(s)) mod (2^31−1)
    * over one md5 per shingle; the signature component is the numeric min
    * per (doc, j). Output one row per (doc_id, j) — k rows per doc,
    * unpivoted from [[minhashWide]].
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8): DataFrame =
    minhashWide(docs, k)
      .select(col("doc_id"),
        posexplode(array((0 until k).map(j => col(s"h$j")): _*)).as(Seq("j", "minhash")))

  /** LSH banding over the MinHash signature: k hashes split into bands of
    * `rowsPerBand`; the bucket key is the concatenated band slice (sorted
    * within the band, so it is order-deterministic). Output one row per
    * (doc, band) — a pure projection over [[minhashWide]], no extra shuffle.
    */
  def minhashBuckets(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    bucketsFromWide(minhashWide(docs, k), k, rowsPerBand)

  private def bucketsFromWide(wide: DataFrame, k: Int, rowsPerBand: Int): DataFrame = {
    // ceil-divide so a non-divisible k still emits its partial final band
    val nBands = (k + rowsPerBand - 1) / rowsPerBand
    val bandKeys = (0 until nBands).map { b =>
      val slice = (b * rowsPerBand until math.min((b + 1) * rowsPerBand, k))
        .map(j => col(s"h$j"))
      // numeric sort, then stringify for the joined key (matches the
      // oracle's ORDER BY minhash + string_agg over the cast values)
      array_join(transform(array_sort(array(slice: _*)),
        x => x.cast("string")), "|")
    }
    wide
      .select(col("doc_id"),
        posexplode(array(bandKeys: _*)).as(Seq("band", "bucket_key")))
      .withColumn("band", col("band").cast(LongType))
  }

  /** Emit all ordered pairs (ids[i], ids[j]), i<j, from a sorted id array —
    * the bucket-local pair expansion shared by the LSH and inverted-index
    * blockers. Buckets are near-duplicate groups, so arrays stay tiny.
    */
  private[operators] def pairsOf(idsCol: String): Column =
    explode(expr(
      s"""flatten(transform(sequence(0, size($idsCol) - 2), i ->
            transform(sequence(i + 1, size($idsCol) - 1), j ->
              struct($idsCol[i] AS doc_a, $idsCol[j] AS doc_b))))"""))

  /** Candidate near-duplicate pairs: docs sharing any LSH bucket.
    *
    * Shape: group bucket members per (band, bucket_key) and expand pairs
    * locally — ONE aggregation over the bucket stream instead of a
    * self-join (which would build the whole signature subtree twice and
    * shuffle it twice). Collision groups are near-dup sets, so the
    * collect_list per bucket is bounded in practice; all-pairs never
    * materializes across buckets.
    */
  def minhashCandidatePairs(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    candidatePairsFromBuckets(minhashBuckets(docs, k, rowsPerBand))

  private def candidatePairsFromBuckets(buckets: DataFrame): DataFrame =
    buckets
      .groupBy(col("band"), col("bucket_key"))
      .agg(sort_array(collect_list(col("doc_id"))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(pairsOf("ids").as("p"))
      .select(col("p.doc_a"), col("p.doc_b"))
      .distinct()

  /** Cross-source contamination matrix — near-dup pair counts by
    * (source, source) cell, the governance view a multi-feed pipeline
    * reads to find which ingest feeds copy each other (off-diagonal) vs
    * self-duplicate (diagonal). Sources are ordered (least, greatest)
    * per pair so the matrix is upper-triangular and deterministic.
    * Shape: the pair set is [[minhashCandidatePairs]]' bucketed output
    * (never all-pairs, |pairs| bounded by collision groups); the two
    * source lookups are doc-keyed hash joins of PAIR rows against the
    * thin (doc_id, source) projection — pair-sized, not corpus-sized.
    */
  def crossSourceDupStats(docs: DataFrame): DataFrame = {
    val src = docs.select(col("doc_id"), col("source"))
    minhashCandidatePairs(docs)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("source_a")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("source_b")),
        "doc_b")
      .select(least(col("source_a"), col("source_b")).as("src_lo"),
        greatest(col("source_a"), col("source_b")).as("src_hi"))
      .groupBy(col("src_lo"), col("src_hi"))
      .agg(count(lit(1)).as("n_pairs"))
  }

  /** Connected components over an undirected (doc_a, doc_b) pair graph:
    * labels every node that appears in a pair with its component's minimum
    * id. Returns (labels, rounds) — the round count is the scalability
    * contract the spec pins.
    *
    * Each round is min-label propagation PLUS a pointer-halving shortcut
    * (the star-contraction move of the MapReduce-CC family — large-star/
    * small-star, Kiveris et al.):
    *
    *   1. propagate: ℓ'(u) = min(ℓ(u), min over edges (u,v) of ℓ(v)) —
    *      one join + one map-side-combinable aggregation.
    *   2. shortcut:  ℓ''(u) = ℓ'(ℓ'(u)) — one self-join of the label
    *      table. Labels are min-monotone (ℓ(u) ≤ u and every label IS a
    *      node of the same component), so jumping to the label's label
    *      stays in-component and only ever decreases.
    *
    * Propagation alone needs O(diameter) rounds — a 10⁶-node chain (the
    * adversarial shape: pairwise-chained near-dups) would run 10⁶ joins.
    * With the shortcut the label horizon doubles per round:
    * O(log diameter) rounds, ≤ ⌈log₂ n⌉ + 1 on the worst-case chain
    * (DedupSpec pins exactly that bound). Convergence is detected by the
    * strictly-monotone label sum — one cheap scalar per round; no data
    * ever collects to the driver.
    */
  private[graft] def connectedComponents(pairs0: DataFrame): (DataFrame, Int) = {
    // The pair graph is consumed once per round, so it is cached for the
    // loop's duration and released after (the returned plan reads only the
    // checkpointed final labels).
    val pairs = pairs0.persist()
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .union(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
    // Each round's label table is EAGERLY localCheckpoint-ed: the shortcut
    // self-join references the round's plan twice, so without lineage
    // truncation the logical plan doubles per round — exponential analysis
    // cost that OOMs the driver long before the data is big (measured on a
    // 64-node chain). Checkpointed label tables are (id, label) rows —
    // tiny, bounded by the round cap; a production run over unreliable
    // executors would swap in reliable checkpoints, same shape.
    var labels = edges.select(col("src").as("doc_id")).distinct()
      .withColumn("cluster", col("doc_id")).localCheckpoint(true)
    // Labels only ever decrease, so sum(cluster) is strictly monotone
    // until the fixpoint: one cheap scalar per round detects convergence.
    // (SUM over zero rows is NULL — a pair-free corpus converges at once.)
    def labelSum(df: DataFrame): Long =
      Option(df.agg(sum(col("cluster"))).head().get(0))
        .map(_.asInstanceOf[Long]).getOrElse(0L)
    var prevSum = labelSum(labels)
    var converged = false
    var rounds = 0
    while (!converged && rounds < 50) {
      val propagated = labels.join(edges, col("doc_id") === col("src"))
        .select(col("dst").as("doc_id"), col("cluster"))
        .unionByName(labels.select(col("doc_id"), col("cluster")))
        .groupBy(col("doc_id"))
        .agg(min(col("cluster")).as("cluster"))
      // pointer halving: follow the label's own label. Every label is a
      // node in `propagated` (labels start as node ids and min() only
      // selects existing labels), so the inner join is total; the alias
      // disambiguates the self-join.
      val l = propagated.select(col("doc_id").as("t_id"), col("cluster").as("t_cluster"))
      val shortcut = propagated
        .join(l, col("cluster") === col("t_id"))
        .select(col("doc_id"), col("t_cluster").as("cluster"))
        .localCheckpoint(true)
      val s = labelSum(shortcut)
      converged = s == prevSum
      prevSum = s
      labels = shortcut
      rounds += 1
    }
    if (!converged)
      Console.err.println(
        s"connectedComponents: round cap ($rounds) hit before convergence — " +
          "labels for high-diameter components may be non-minimal")
    pairs.unpersist()
    (labels, rounds)
  }

  /** Train/eval decontamination: training docs whose MinHash-LSH bucket
    * collides with any eval doc — the near-dup LEAK check a training-data
    * pipeline runs before shipping a corpus (an eval answer paraphrased
    * into the training set is exactly a cross-corpus near-dup; byte-exact
    * leaks are the fingerprint-equi-join special case). Both sides bucket
    * scan-side ([[minhashBuckets]] — per-doc signatures are independent of
    * the corpus, so filtering before bucketing changes nothing); the only
    * exchange is the (band, bucket_key) equi-join, and the eval side is
    * tiny in practice, so at scale it rides a broadcast while the training
    * corpus streams through one scan.
    */
  def decontaminateNear(
      train: DataFrame, evalDocs: DataFrame,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashBuckets(train, k, rowsPerBand)
      .select(col("band"), col("bucket_key"), col("doc_id").as("train_doc_id"))
      .join(
        broadcast(minhashBuckets(evalDocs, k, rowsPerBand)
          .select(col("band"), col("bucket_key"), col("doc_id").as("eval_doc_id"))),
        Seq("band", "bucket_key"))
      .select(col("train_doc_id"), col("eval_doc_id"))
      .distinct()

  /** [[decontaminateNear]] when train and eval are a SPLIT of one corpus
    * (the registered query's shape): bucket the corpus ONCE and eagerly
    * localCheckpoint the tiny (doc_id, band, bucket_key) table, then
    * filter both sides out of the checkpoint — the shingle+MinHash
    * signature pass (the expensive scan-side work) runs once instead of
    * once per side. Same quality-gate lineage-cut precedent; identical
    * results to calling [[decontaminateNear]] on the two filtered frames
    * (the r7 bench's second-highest cold line, 2.9 s, was exactly the
    * doubled signature pass).
    */
  def decontaminateNearSplit(
      docs: DataFrame, evalPct: Int = 10,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bk = minhashBuckets(docs, k, rowsPerBand)
      .select(col("doc_id"), col("band"), col("bucket_key"))
      .localCheckpoint()
    val coin = TextAnalysis.sampleCoin()
    bk.filter(coin >= evalPct)
      .select(col("band"), col("bucket_key"), col("doc_id").as("train_doc_id"))
      .join(
        broadcast(bk.filter(coin < evalPct)
          .select(col("band"), col("bucket_key"), col("doc_id").as("eval_doc_id"))),
        Seq("band", "bucket_key"))
      .select(col("train_doc_id"), col("eval_doc_id"))
      .distinct()
  }

  /** Incremental dedup of a DELTA against the standing corpus — the shape
    * a daily-crawl pipeline actually runs: the corpus's MinHash bucket
    * table is a PERSISTED index maintained across runs, and each new
    * batch is checked against it without rescanning the corpus. Here the
    * coin split carves a deterministic `deltaPct` slice as "the new
    * batch" and the rest as "the standing index"; per delta doc, how many
    * of its LSH buckets collide with the index and the resulting is_dup
    * verdict (any collision = near-dup candidate, the same candidate
    * semantics as [[minhashCandidatePairs]]).
    *
    * The join is explicitly SHUFFLE_HASH-hinted, NOT broadcast: unlike
    * the eval slice in [[decontaminateNearSplit]] (k/rpb rows per eval
    * doc, broadcast-sized by construction), the standing index grows
    * with the CORPUS — at 100 TB it is nowhere near any broadcast
    * ceiling, so the honest plan is a shuffle equi-join on
    * (band, bucket_key) with the k/rpb-rows-per-doc delta side streamed
    * against the index's hash table (no sort on either side). This is
    * the scale path ADVICE.md asked to document for the n-gram variant,
    * expressed as its own operator. PlanSpec pins the join stays
    * ShuffledHashJoin even when the test-scale index would fit a
    * broadcast.
    */
  def incrementalDedup(
      docs: DataFrame, deltaPct: Int = 10,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val bk = minhashBuckets(docs, k, rowsPerBand)
      .select(col("doc_id"), col("band"), col("bucket_key"))
      .localCheckpoint()
    val coin = TextAnalysis.sampleCoin("inc")
    val index = bk.filter(coin >= deltaPct)
      .select(col("band"), col("bucket_key")).distinct()
    val delta = bk.filter(coin < deltaPct)
    val hits = delta
      .join(index.hint("shuffle_hash"), Seq("band", "bucket_key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bucket_hits"))
    docs.filter(TextAnalysis.sampleCoin("inc") < deltaPct)
      .select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bucket_hits"), lit(0L)).as("n_bucket_hits"))
      .withColumn("is_dup", col("n_bucket_hits") > 0L)
  }

  /** Materialize the standing MinHash bucket index as a parquet ARTIFACT —
    * the persisted state [[incrementalDedupPersisted]] loads, checks a
    * delta against, and appends to. One row per (doc_id, band): the
    * per-doc attribution is kept (a distinct-(band, bucket_key) projection
    * would be smaller but could neither grow by appends nor answer "which
    * standing doc did the delta collide with" later). Partitioned by
    * `band`: every band's keys land in their own directory, so per-band
    * probes prune, and a batch append only adds files — never rewrites.
    */
  def writeBucketIndex(
      docs: DataFrame, indexPath: String,
      k: Int = 8, rowsPerBand: Int = 2): Unit =
    minhashBuckets(docs, k, rowsPerBand)
      .select(col("doc_id"), col("bucket_key"), col("band"))
      .write.mode("overwrite").partitionBy("band").parquet(indexPath)

  /** Fold a maintenance stream's batch-keyed bucket partitions
    * ([[graft.streaming.StreamingQueries.dedupIndexMaintained]]'s
    * `streamRoot`) back into the base band-partitioned index — the end
    * of the flush cadence: the stream externalized its state as
    * `batch=N` partitions; the fold compacts that window into the base
    * artifact the daily batch loop and every ad-hoc probe read, and
    * truncates the window. Set-merge via DISTINCT + a staged
    * write-then-rename swap (the [[graft.operators.StorageLayout
    * .compactPartitioned]] discipline) makes the fold idempotent across
    * every crash window: re-folding after a crash between swap and
    * stream-truncate re-merges an already-folded window into the same
    * set, a fold with no stream window is a no-op, and a crash INSIDE
    * the swap (base deleted, staging not yet renamed) self-heals on the
    * next call — the staging dir holds the complete merged set (its
    * write finished before the delete began), so it is promoted to base
    * before the re-fold re-merges the still-present window. Promotion
    * is gated on the staging write's `_SUCCESS` marker: only a staging
    * dir whose write COMMITTED may become base, so a crash mid-staging-
    * write can never promote a partial set.
    *
    * Atomicity assumption: directory delete and rename are atomic (HDFS
    * and local filesystems). On an object store (S3A), "rename" is a
    * non-atomic copy-then-delete and a crash mid-delete can leave a
    * PARTIAL base beside staging — this swap protocol is not safe
    * there; use a manifest-pointer commit (the [[graft.operators.Cdc]]
    * discipline, where the pointer write is the atomic step) instead.
    */
  def foldStreamIndex(
      spark: org.apache.spark.sql.SparkSession,
      baseIndex: String, streamRoot: String): Unit = {
    val cols = Seq("doc_id", "bucket_key", "band")
    StorageLayout.foldPartitionedIndex(spark, baseIndex, streamRoot,
      cols.map(col), cols, "band", Seq("bucket_key", "doc_id"))
  }

  /** [[incrementalDedup]] as the daily-crawl READ-CHECK-UPDATE loop it
    * documents: load the standing bucket index from its parquet artifact
    * ([[writeBucketIndex]]), verdict the delta batch against it, then
    * append the delta's own buckets so run N+1 sees batch N — the index
    * ratchets forward one batch per run without ever rescanning the
    * corpus (DedupSpec pins run N+1 over the appended index ≡ a fresh
    * index built at N+1 batches).
    *
    * Same SHUFFLE_HASH stance as [[incrementalDedup]] — the loaded index
    * grows with the corpus, so broadcast is the wrong plan at scale — and
    * the only corpus-shaped work per run is the DELTA's signature scan
    * (checkpointed once, shared by the probe and the append). The
    * verdict frame is EAGERLY checkpointed before the append so the
    * returned result can never observe the index mutating under it.
    * Idempotence across retries is the sink's job, not this operator's:
    * a production scheduler wraps the append in the batch-id manifest
    * pattern of [[graft.streaming.TickSink.ExactlyOnceParquet]].
    */
  def incrementalDedupPersisted(
      delta: DataFrame, indexPath: String,
      k: Int = 8, rowsPerBand: Int = 2, append: Boolean = true): DataFrame = {
    val spark = delta.sparkSession
    val deltaBk = minhashBuckets(delta, k, rowsPerBand)
      .select(col("doc_id"), col("band"), col("bucket_key"))
      .localCheckpoint()
    val index = spark.read.parquet(indexPath)
      .select(col("band"), col("bucket_key")).distinct()
    val hits = deltaBk
      .join(index.hint("shuffle_hash"), Seq("band", "bucket_key"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_bucket_hits"))
    val verdicts = delta.select(col("doc_id"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_bucket_hits"), lit(0L)).as("n_bucket_hits"))
      .withColumn("is_dup", col("n_bucket_hits") > 0L)
      .localCheckpoint()
    if (append)
      deltaBk.select(col("doc_id"), col("bucket_key"), col("band"))
        .write.mode("append").partitionBy("band").parquet(indexPath)
    verdicts
  }

  /** Lexical-vs-semantic dedup decision diff — the gauge that answers
    * the curation question both pipelines raise: how much does
    * embedding-space dedup ADD over the lexical blocker, and vice
    * versa? Full-outer joins the MinHash candidate pairs
    * ([[minhashCandidatePairs]], shared phrasing) against the
    * embedding-cosine near-dup pairs
    * ([[graft.operators.Similarity.embeddingNearDupPairs]], shared
    * meaning — doc_id ≡ vec_id in this corpus) and rolls up to one row:
    * pair counts, the overlap, and integer-bp coverage in each
    * direction. A corpus where semantic_covered_bp is low runs both
    * passes; one where it saturates can drop the expensive pass.
    * Both inputs are the already-priced blocked pipelines (never
    * all-pairs); the diff join runs at pair-table size.
    */
  def decisionDiff(
      docs: DataFrame, emb: DataFrame,
      bits: Int = 6, minScore: Double = 0.35,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val lex = minhashCandidatePairs(docs, k, rowsPerBand)
      .select(col("doc_a"), col("doc_b")).withColumn("lx", lit(1L))
    val sem = Similarity.embeddingNearDupPairs(emb, bits, minScore)
      .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b"))
      .withColumn("sm", lit(1L))
    lex.join(sem, Seq("doc_a", "doc_b"), "full_outer")
      .agg(
        sum(coalesce(col("lx"), lit(0L))).as("n_lexical"),
        sum(coalesce(col("sm"), lit(0L))).as("n_semantic"),
        sum(when(col("lx") === 1L && col("sm") === 1L, 1L).otherwise(0L))
          .as("n_both"))
      .select(col("n_lexical"), col("n_semantic"), col("n_both"),
        expr("n_both * 10000 DIV nullif(n_lexical, 0)").as("lexical_covered_bp"),
        expr("n_both * 10000 DIV nullif(n_semantic, 0)").as("semantic_covered_bp"))
  }

  /** Compact the standing bucket index: every appended batch adds one
    * file set per band directory, so after N daily runs each band's
    * probe pays N file opens. Rewrites into ONE file per band, rows
    * sorted by (bucket_key, doc_id) so a band probe reads clustered
    * row groups — [[graft.operators.StorageLayout.compactPartitioned]],
    * the same maintenance move as the IVFADC posting compaction. Rows
    * untouched: the registered query hash-matches the SAME oracle as
    * `dedup_incremental_persisted`, and DedupSpec pins layout + verdict
    * equivalence.
    */
  def compactBucketIndex(
      spark: org.apache.spark.sql.SparkSession, indexPath: String): Unit =
    StorageLayout.compactPartitioned(
      spark, indexPath, "band", Seq("bucket_key", "doc_id"))

  /** RTBF PURGE of the standing bucket index — the dedup half of the
    * derived-artifact sweep beside [[graft.operators.Similarity
    * .purgeIvfPqPostings]]: a doc purged from the store must also stop
    * colliding through its persisted shingle buckets, or future deltas
    * keep getting flagged against (and attributed to) a forgotten doc.
    * Physical staged rewrite, not a tombstone set: every doc holds a row
    * in EVERY band partition (no pruning to exploit), and the index is
    * rewritten whole by [[foldStreamIndex]] / [[compactBucketIndex]]
    * anyway, so the purge reuses exactly that swap discipline —
    * anti-join the purged ids, one sorted file per band, staged
    * write-then-rename. A purge set that touches nothing still pays one
    * index rewrite; batch RTBF requests to the fold cadence when that
    * matters.
    */
  def purgeBucketIndex(
      spark: org.apache.spark.sql.SparkSession, indexPath: String,
      purgedIds: DataFrame): Unit = {
    val ids = purgedIds
      .select(col(purgedIds.columns.head).cast("long").as("doc_id"))
      .distinct()
    val staging = s"${indexPath}_purging"
    spark.read.parquet(indexPath)
      .select(col("doc_id"), col("bucket_key"), col("band"))
      .join(ids, Seq("doc_id"), "left_anti")
      .repartition(col("band"))
      .sortWithinPartitions(col("band"), col("bucket_key"), col("doc_id"))
      .write.mode("overwrite").partitionBy("band").parquet(staging)
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(indexPath)
    val fs = p.getFileSystem(conf)
    fs.delete(p, true)
    require(fs.rename(new org.apache.hadoop.fs.Path(staging), p),
      s"purge swap failed: could not rename $staging to $indexPath")
  }

  /** [[minhashBuckets]] in WIDE form: the input columns plus one STRING
    * band-key column `bk0..bk{nBands-1}` per LSH band — no row expansion,
    * no doc filter, so the projection is STREAMING-SAFE (posexplode plus
    * the <3-token filter is fine in batch, but an ingest-side leak filter
    * must keep every incoming row exactly once). Docs too short to shingle
    * get null band keys, which match no real bucket — they cannot leak, so
    * every join shape built on these columns keeps them. The base-hash
    * array lands in its own projection (same CollapseProject protection as
    * [[minhashWide]]: the md5 pass is non-cheap and referenced k times, so
    * it is computed once per row, not once per consumer).
    */
  private[graft] def withBandKeys(
      docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    require(k <= minhashMultipliers.size, s"at most ${minhashMultipliers.size} components")
    val nBands = (k + rowsPerBand - 1) / rowsPerBand
    val toks = tokens(col("text"))
    val sh = when(size(toks) >= 3,
      transform(sequence(lit(1), size(toks) - 2), i =>
        concat_ws(" ", element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))
    val hs = transform(sh, s =>
      conv(substring(md5(s), 1, 12), 16, 10).cast(LongType))
    val mins = (0 until k).map(j => array_min(
      transform(col("__hs"), h => (lit(minhashMultipliers(j)) * h) % minhashMod)))
    val bandKeys = (0 until nBands).map { b =>
      val slice = (b * rowsPerBand until math.min((b + 1) * rowsPerBand, k))
        .map(mins)
      // guard, not a convenience: array_min over the empty shingle array
      // yields null mins and array_join SKIPS nulls, so without the when()
      // a <3-token doc would key as "" — a real (if improbable) bucket —
      // instead of the null that the null-matches-nothing contract needs
      when(size(col("__hs")) > 0,
        array_join(transform(array_sort(array(slice: _*)), x => x.cast("string")),
          "|")).as(s"bk$b")
    }
    docs.withColumn("__hs", hs)
      .select(docs.columns.map(col) ++ bandKeys: _*)
  }

  /** Ingest-side decontamination FILTER: drop every doc whose MinHash-LSH
    * bucket collides with the precomputed eval bucket table (the
    * [[minhashBuckets]] of the eval corpus — tiny by construction, k/rpb
    * rows per eval doc), keep the rest. Complement of
    * [[decontaminateNear]]'s leak REPORT, restated so the same code runs
    * under a STREAMING plan: "no band collides" is one broadcast LEFT ANTI
    * join per band on the wide band-key columns ([[withBandKeys]]) —
    * stream-static, stateless, zero shuffle on the doc side, and the eval
    * side rides a broadcast exactly as in the batch operator. Docs too
    * short to shingle have null band keys, match nothing, and pass — they
    * cannot leak. At 100 TB the corpus streams through one scan and the
    * nBands anti-joins share the one broadcast-sized eval table.
    */
  def decontaminateFilter(
      docs: DataFrame, evalBuckets: DataFrame,
      k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val nBands = (k + rowsPerBand - 1) / rowsPerBand
    val keyed = withBandKeys(docs, k, rowsPerBand)
    (0 until nBands).foldLeft(keyed) { (df, b) =>
      // no distinct() on the build side: LeftAnti only tests existence,
      // and deduplicating would cost the eval projection a shuffle
      df.join(
        broadcast(evalBuckets.filter(col("band") === b)
          .select(col("bucket_key").as(s"__ek$b"))),
        col(s"bk$b") === col(s"__ek$b"), "left_anti")
    }.select(docs.columns.map(col): _*)
  }

  /** Near-duplicate clusters: connected components over the MinHash
    * candidate-pair graph ([[connectedComponents]] — min-label
    * propagation with the pointer-halving shortcut, O(log diameter)
    * rounds), labelled by the component's minimum doc_id (which is also
    * the canonical "keep one" representative). Every doc appears —
    * singletons label themselves and never enter the iteration, so each
    * round touches |connected docs|, not |corpus|.
    */
  def nearDupClusters(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val (labels, _) = connectedComponents(minhashCandidatePairs(docs, k, rowsPerBand))
    docs.select(col("doc_id"))
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
      .unionByName(labels)
  }

  /** The curation decision on top of [[nearDupClusters]]: per near-dup
    * cluster keep the BEST doc — highest bucketed quality score
    * ([[TextAnalysis.qualityStats]], 1e-3 buckets — exact long compare),
    * ties to the smallest doc_id — and report the cluster multiplicity.
    * Degenerate docs (null/NaN score) rank behind every scored doc via
    * qs = −1 rather than erroring under ANSI.
    *
    * ONE hash aggregation over cluster (map-side combinable): the winner is
    * `max_by` over the (qs, −doc_id) order struct — unique because doc_id
    * is — so no per-cluster sort or window pass ever runs. Like the
    * clustering, wall time is propagation-round-dominated, so it shares
    * the benchmark=false flag.
    */
  def nearDupCanonical(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val scored = TextAnalysis.qualityStats(docs)
      .select(col("doc_id"),
        when(col("quality_score").isNull || isnan(col("quality_score")), lit(-1L))
          .otherwise(floor(col("quality_score") * 1000 + 0.5).cast(LongType)).as("qs"))
    nearDupClusters(docs, k, rowsPerBand)
      .join(scored, "doc_id")
      .groupBy(col("cluster"))
      .agg(
        max_by(struct(col("doc_id").as("keeper"), col("qs")),
          struct(col("qs"), (-col("doc_id")).as("nid"))).as("best"),
        count(lit(1)).as("n_members"))
      .select(col("cluster"), col("best.keeper").as("keeper"),
        col("best.qs").as("qs"), col("n_members"))
  }

  /** Leakage-guarded split assignment: train/val/test as a pure function
    * of the near-dup CLUSTER label ([[nearDupClusters]]), not the doc —
    * an md5 coin on the cluster id buckets 80/10/10. Because every
    * MinHash candidate pair is by construction inside one cluster, and
    * the whole cluster shares one coin, a near-dup pair can NEVER
    * straddle splits — eval contamination by near-duplicates of training
    * docs is ruled out structurally rather than filtered after the fact
    * (the standard failure of doc-hash splits, where two near-identical
    * crawls of a page land in train and test).
    *
    * Scale: the clustering is the existing log-round CC; the assignment
    * adds one scan-side hash on the label. Deterministic — the split is
    * reproducible from the corpus alone, no RNG state to ship.
    */
  def splitAssignments(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    nearDupClusters(docs, k, rowsPerBand)
      .withColumn("coin",
        conv(substring(md5(concat(lit("split:"), col("cluster").cast("string"))),
          1, 8), 16, 10).cast("long") % 100)
      .withColumn("split",
        when(col("coin") < 80, "train")
          .when(col("coin") < 90, "val").otherwise("test"))
      .select("doc_id", "cluster", "split")

  /** The registered rollup of [[splitAssignments]]: per (split, source)
    * doc and cluster counts, char volume, and the release-manifest xor
    * checksum — the record a training run pins its data split with.
    * Shares the clustering core's benchmark=false flag.
    */
  def leakageSafeSplit(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    docs.join(splitAssignments(docs, k, rowsPerBand), "doc_id")
      .select(col("split"), col("source"), col("cluster"), col("n_chars"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
      .groupBy(col("split"), col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("cluster")).as("n_clusters"),
        sum(col("n_chars")).as("sum_chars"),
        expr("bit_xor(cast(conv(substring(fp, 1, 15), 16, 10) as bigint))")
          .as("fp_xor"))

  /** Substring-level dedup signal (the Lee et al. "Deduplicating Training
    * Data Makes Language Models Better" pass, re-expressed relationally):
    * hash every w-token window at the given stride, find windows that
    * occur in ≥2 DISTINCT documents, and report per document how much of
    * it is covered by cross-document duplicated substrings. This catches
    * the boilerplate/quote overlap that whole-document fingerprints and
    * even MinHash miss (a long doc sharing one paragraph with another
    * scores low Jaccard but high window duplication).
    *
    * Shape: one scan-side window expansion (≈ n_tokens/stride rows per
    * doc — the documented cost of substring dedup; stride trades recall
    * for volume), a (doc, hash)-distinct + hash-keyed count to find
    * shared windows, a hash-keyed join back, and one doc-keyed agg.
    * Every exchange key is high-cardinality; the window hash is a 48-bit
    * md5 truncation (exact BIGINT, oracle-reproducible). At 100 TB the
    * shared-hash set rides a bloom filter in front of the join; here the
    * join IS the exact form of that filter.
    */
  def duplicatedWindowStats(docs: DataFrame, w: Int = 16, stride: Int = 4): DataFrame = {
    val pos = windowHashes(docs, w, stride)
    val shared = pos.select(col("doc_id"), col("whash")).distinct()
      .groupBy(col("whash"))
      .agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2)
      .select(col("whash"), lit(1L).as("is_dup"))
    val perDoc = pos
      .join(shared, Seq("whash"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(coalesce(col("is_dup"), lit(0L))).as("n_dup_windows"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup_windows"), lit(0L)).as("n_dup_windows"))
      .withColumn("dup_window_ratio",
        when(col("n_windows") > 0,
          col("n_dup_windows").cast("double") / col("n_windows").cast("double"))
          .otherwise(lit(0.0)))
  }

  /** Per-doc `w`-token window hashes at `stride` — the scan-side expansion
    * shared by [[duplicatedWindowStats]] and [[decontaminateNgramSplit]]:
    * one row per window position, hash = 48-bit md5 truncation of the
    * space-joined token slice (exact BIGINT, oracle-reproducible). Docs
    * shorter than `w` tokens produce no windows.
    */
  private[graft] def windowHashes(docs: DataFrame, w: Int, stride: Int): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= w)
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, (size(toks) - $w) div $stride),
              p -> cast(conv(substring(md5(concat_ws(' ',
                     slice(toks, p * $stride + 1, $w))), 1, 12), 16, 10) as bigint))"""))
        .as("whash"))

  /** Exact character-level verification BEHIND the stride-hash signal
    * (the Lee et al. discipline the r13 verdict flagged as missing):
    * [[duplicatedWindowStats]] flags windows by a 48-bit hash of the
    * LOWERCASED token slice at stride alignment — which admits two
    * approximation failure modes this report measures, pair-bounded:
    *
    *   - FALSE POSITIVES: window-aligned docs whose lowered tokens match
    *     but whose actual characters differ (case differences; 48-bit
    *     collisions). For every flagged pair, `n_char_exact` counts the
    *     flagged windows whose RAW (case-preserving) token slices are
    *     character-identical in both docs; `precision_bp` is the
    *     stride-hash precision.
    *   - STRIDE-STRADDLING MISSES: a true duplicated run sampled at
    *     stride alignment in one doc but off-alignment in the other is
    *     never flagged. For the flagged pairs only, `n_true_s1` counts
    *     the DISTINCT raw w-token windows shared at STRIDE 1 — the exact
    *     ground truth for that pair; n_true_s1 exceeding the aligned
    *     count exposes the straddled duplication.
    *
    * Scale: verification work is FLAGGED-pair-bounded — the raw window
    * strings ride only flagged occurrences (semi-join before the wide
    * column is carried), occurrence lists per window hash are DF-capped
    * at `maxDf` (the n-gram posting discipline; hotter boilerplate
    * windows are excluded, a documented lower-bound trade), and the
    * stride-1 recheck explodes only docs that appear in some flagged
    * pair. A pair with NO aligned window anywhere remains invisible by
    * construction — the stride-1 global pass is the exact (and
    * proportionally priced) form, which `decontaminateNgramSplit`
    * already runs for the decontamination case.
    *
    * Character canonicalization caveat: "character-identical" means the
    * single-space-joined raw token slice — the whitespace run between
    * tokens is canonicalized by the tokenizer (tabs vs spaces compare
    * equal); letters, case, and punctuation compare exactly.
    */
  def dupWindowVerification(docs: DataFrame, w: Int = 16, stride: Int = 4,
      maxDf: Int = 50): DataFrame = {
    // raw (case-preserving) tokens align 1:1 with Dedup.tokens' lowered
    // tokens: lower() never creates or removes whitespace, so
    // split(lower(s)) == map(lower, split(s)) and the hash below equals
    // windowHashes' exactly
    val base = docs
      .select(col("doc_id"),
        split(trim(regexp_replace(col("text"), UnsegmentedScript, " $1 ")),
          "\\s+").as("rtoks"))
      .filter(size(col("rtoks")) >= w)
      .localCheckpoint() // shared by the aligned pass and the s1 recheck
    val occ = base.select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, (size(rtoks) - $w) div $stride),
              p -> struct(
                cast(conv(substring(md5(concat_ws(' ',
                  slice(transform(rtoks, x -> lower(x)),
                    p * $stride + 1, $w))), 1, 12), 16, 10) as bigint)
                  as whash,
                concat_ws(' ', slice(rtoks, p * $stride + 1, $w)) as raw))"""))
        .as("wr"))
      .select(col("doc_id"), col("wr.whash").as("whash"),
        col("wr.raw").as("raw"))
      .distinct()
    val flagged = occ.select(col("doc_id"), col("whash")).distinct()
      .groupBy(col("whash")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= 2 && col("nd") <= maxDf)
      .select("whash")
    val focc = occ.join(flagged, Seq("whash"))
    val pw = focc
      .select(col("whash"), col("doc_id").as("doc_a"), col("raw").as("raw_a"))
      .join(focc.select(col("whash"), col("doc_id").as("doc_b"),
        col("raw").as("raw_b")), Seq("whash"))
      .where(col("doc_a") < col("doc_b"))
    val flaggedPairs = pw.groupBy(col("doc_a"), col("doc_b"))
      .agg(
        count_distinct(col("whash")).as("n_flagged"),
        count_distinct(when(col("raw_a") === col("raw_b"), col("whash")))
          .as("n_char_exact"))
    val docSet = flaggedPairs.select(col("doc_a").as("doc_id"))
      .union(flaggedPairs.select(col("doc_b"))).distinct()
    val s1 = base.join(docSet, Seq("doc_id"), "left_semi")
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, size(rtoks) - $w),
              p -> concat_ws(' ', slice(rtoks, p + 1, $w)))""")).as("rw"))
      .distinct()
    val true1 = flaggedPairs.select("doc_a", "doc_b")
      .join(s1.select(col("doc_id").as("doc_a"), col("rw")), Seq("doc_a"))
      .join(s1.select(col("doc_id").as("doc_b"), col("rw")),
        Seq("doc_b", "rw"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count_distinct(col("rw")).as("n_true_s1"))
    flaggedPairs.join(true1, Seq("doc_a", "doc_b"), "left")
      .select(col("doc_a"), col("doc_b"), col("n_flagged"),
        col("n_char_exact"),
        coalesce(col("n_true_s1"), lit(0L)).as("n_true_s1"),
        expr("(10000 * n_char_exact) DIV n_flagged").as("precision_bp"))
  }

  /** EXACT n-gram-collision decontamination — the third member of the
    * decontamination triad, next to the probabilistic
    * [[decontaminateNearSplit]] (MinHash buckets: whole-doc NEAR-dup
    * similarity) and the semantic
    * [[Similarity.decontaminateSemantic]] (embedding cosine): a training
    * doc is flagged against an eval doc iff they share at least one
    * VERBATIM `w`-token window — the "13-gram overlap" check training-data
    * pipelines run against benchmark suites, which catches a single
    * copied sentence that moves neither the whole-doc MinHash nor the
    * embedding. Stride 1 on both sides (exactness demands every offset;
    * at 100 TB a stride >1 is the documented recall-for-volume dial).
    * The (doc, whash)-distinct window table is computed ONCE and eagerly
    * checkpointed (same split shape as [[decontaminateNearSplit]]); the
    * ~`evalPct`% eval side broadcasts, and `n_shared` counts the distinct
    * shared windows per flagged pair — exact integers end-to-end.
    *
    * Broadcast ceiling (unlike [[decontaminateNearSplit]], whose eval
    * bucket table is k/rpb rows per doc, this one is ~1 row per eval
    * TOKEN): at ~16 bytes a (whash, doc_id) row, Spark's 8 GB broadcast
    * hard cap lands near ~10^8 distinct eval windows (~100 M eval tokens —
    * far above any benchmark suite, far below an eval corpus misused as a
    * second training split). Past that, pass `broadcastEval = false`: the
    * join keys both sides on `whash` anyway, so it degrades to one
    * well-keyed shuffle join, not a rewrite.
    */
  def decontaminateNgramSplit(
      docs: DataFrame, evalPct: Int = 10, w: Int = 13,
      broadcastEval: Boolean = true): DataFrame = {
    val wh = windowHashes(docs, w, stride = 1)
      .select(col("doc_id"), col("whash")).distinct()
      .localCheckpoint()
    val coin = TextAnalysis.sampleCoin()
    val evalSide = wh.filter(coin < evalPct)
      .select(col("whash"), col("doc_id").as("eval_doc_id"))
    wh.filter(coin >= evalPct)
      .select(col("whash"), col("doc_id").as("train_doc_id"))
      .join(if (broadcastEval) broadcast(evalSide) else evalSide, Seq("whash"))
      .groupBy(col("train_doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** [[decontaminateNgramSplit]] with the documented 100 TB front: a
    * BLOOM FILTER over the eval windows' hashes, built with Spark's own
    * runtime-filter aggregate and probed scan-side
    * ([[graft.functions.GraftFunctions.bloom_might_contain]] — a
    * codegen'd expression, no UDF), discards the overwhelming majority
    * of train windows BEFORE the verify join ever sees them. Semantics
    * are UNCHANGED — bloom false positives only admit extra rows into
    * the exact whash equi-join, which rejects them — so this registers
    * against the SAME oracle as `decontaminate_ngram`: the hash-match
    * is the proof that the fast path drops nothing.
    *
    * The filter binary (~`numBits`/8 bytes, default ~100 KB) is the one
    * driver-held artifact — the same O(metadata) class as the IVF
    * centroids — and inlines as a literal, the form
    * `BloomFilterMightContain` requires (Spark's InjectRuntimeFilter
    * feeds it a scalar subquery the same way). At 100 TB this is the
    * shape that keeps working after the eval window table outgrows the
    * broadcast ceiling: the bloom stays KB–MB regardless of eval size,
    * the verify join keys on whash either way.
    */
  def decontaminateNgramBloom(
      docs: DataFrame, evalPct: Int = 10, w: Int = 13,
      expectedItems: Long = 100000L, numBits: Long = 800000L): DataFrame = {
    val wh = windowHashes(docs, w, stride = 1)
      .select(col("doc_id"), col("whash")).distinct()
      .localCheckpoint()
    val coin = TextAnalysis.sampleCoin()
    val evalSide = wh.filter(coin < evalPct)
      .select(col("whash"), col("doc_id").as("eval_doc_id"))
    val bloom = evalSide
      .agg(graft.functions.GraftFunctions.bloom_agg(
        col("whash"), expectedItems, numBits).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    wh.filter(coin >= evalPct)
      .select(col("whash"), col("doc_id").as("train_doc_id"))
      .filter(graft.functions.GraftFunctions.bloom_might_contain(bloom, col("whash")))
      .join(broadcast(evalSide), Seq("whash"))
      .groupBy(col("train_doc_id"), col("eval_doc_id"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** 32-bit SimHash over word occurrences. The word hash is the first 32
    * bits of md5(word) (one hex-to-int conversion per word); bit i of the
    * fingerprint is the sign of Σ_words (2·bit_i(h) − 1). Cross-engine-
    * exact: md5 + integer shift/mask sums — the bit probes are integer
    * ops, not 32 per-word string substrings.
    *
    * Single-pass shape: one word row carries all 32 bit contributions as 32
    * sum expressions — one shuffle on doc_id with map-side partial
    * aggregation, no 32× row expansion and no second aggregation.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val words = docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"),
        conv(substring(md5(col("w")), 1, 8), 16, 10).cast(LongType).as("h"))
    val bitSums = (0 until 32).map(i =>
      sum(shiftright(col("h"), i).bitwiseAND(lit(1L)) * lit(2L) - lit(1L)).as(s"s$i"))
    words
      .groupBy(col("doc_id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("doc_id"),
        (0 until 32).map(i =>
          when(col(s"s$i") > 0, lit(1L << i)).otherwise(0L))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-duplicate candidate pairs: docs whose 32-bit [[simhash]]
    * fingerprints are within `maxHamming` bits — the constant-space member
    * of the near-dup family (one long per doc vs MinHash's k components).
    *
    * Blocking is pigeonhole + multi-probe over 16-bit HALVES: ≤3 flipped
    * bits land in 2 halves, so some half carries ≤1 flip — candidates are
    * exactly the pairs whose low or high half differs in ≤1 bit, found by
    * an equi-join between each doc's exact (half, value) keys and every
    * doc's 17 single-bit-probe keys (value XOR {0, 1<<0..1<<15}). The
    * exact bit_count(xor) check verifies in-bucket, pre-distinct.
    *
    * Why this shape and not byte-bands + per-bucket pair expansion
    * (measured at sf0.1, clustered corpus): 8-bit buckets collide every
    * doc pair sharing ONE byte — 2.54M candidate pairs for 83k true
    * pairs, the hottest bucket holding 1338 docs (≈900k pairs expanded
    * inside ONE collect_list row: a straggler task AND an unbounded
    * buffer as the corpus grows). The 16-bit probe join carries 34 small
    * rows per doc instead, cuts candidates 3.3× (770k, same 83k true
    * pairs — recall is a pigeonhole guarantee, not a tuning outcome),
    * partitions 256× finer, and shuffles through a plain equi-join that
    * no single aggregation row ever buffers. The fingerprint aggregation
    * is recomputed for each join side here; a production run over a
    * 100 TB corpus checkpoints the (doc_id, simhash) table first — it is
    * 16 bytes per doc.
    */
  def simhashNearDupPairs(docs: DataFrame, maxHamming: Int = 3): DataFrame =
    hammingProbePairs(simhash(docs), "simhash", nBits = 32, maxHamming)

  /** The pigeonhole + multi-probe Hamming blocker behind
    * [[simhashNearDupPairs]] and [[Multimodal.phashPairs]], generalized to
    * any 16-bit-segmented fingerprint width: an `nBits`-bit fingerprint
    * splits into nBits/16 segments; `maxHamming` flips spread over the
    * segments leave SOME segment with ≤ ⌊maxHamming / nSeg⌋ flips, so with
    * single-bit probes (value XOR {0, 1<<0..1<<15}) recall is guaranteed —
    * by construction, not tuning — for maxHamming ≤ 2·nSeg − 1. Candidates
    * surface from an equi-join between each doc's exact (segment, value)
    * keys and every doc's 17 probe keys; the exact bit_count(xor) check
    * verifies in-bucket, pre-distinct. 16-bit keys partition 256× finer
    * than byte bands and no aggregation row ever buffers a bucket's pair
    * expansion (the measured rationale at the 32-bit scale is documented
    * above; it only strengthens at 64 bits, where byte-band zero-segments
    * of short/padded inputs would be the hottest keys in the corpus).
    */
  private[graft] def hammingProbePairs(
      fp: DataFrame, fpCol: String, nBits: Int, maxHamming: Int): DataFrame = {
    require(nBits % 16 == 0, "fingerprint width must split into 16-bit segments")
    val nSeg = nBits / 16
    require(maxHamming <= 2 * nSeg - 1,
      s"$nSeg-segment single-bit probing only guarantees recall for " +
        s"maxHamming <= ${2 * nSeg - 1}")
    val segs = fp.select(col("doc_id"), col(fpCol),
      posexplode(array((0 until nSeg).map(s =>
        // arithmetic shift is fine: the segment mask discards fill bits
        shiftright(col(fpCol), 16 * s).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("seg", "sv")))
    val masks = array((0L +: (0 until 16).map(1L << _).toSeq).map(lit): _*)
    val probes = segs.select(col("doc_id").as("p_doc"), col(fpCol).as("p_fp"),
        col("seg").as("p_seg"),
        explode(masks).as("m"), col("sv").as("sv0"))
      .select(col("p_doc"), col("p_fp"), col("p_seg"),
        col("sv0").bitwiseXOR(col("m")).as("p_sv"))
    segs.join(probes,
        col("seg") === col("p_seg") && col("sv") === col("p_sv") &&
          col("doc_id") < col("p_doc"))
      .select(col("doc_id").as("doc_a"), col("p_doc").as("doc_b"),
        expr(s"bit_count($fpCol ^ p_fp)").cast(LongType).as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** N-gram Jaccard similarity for all candidate pairs that share at least
    * one shingle (inverted-index join on the shingle — the blocking step
    * that replaces the quadratic all-pairs compare at scale).
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|), exact integer arithmetic until the
    * final division.
    */
  def ngramJaccardPairs(
      docs: DataFrame, minJaccard: Double = 0.05, maxDf: Int = 100): DataFrame =
    ngramPairCounts(docs, maxDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))

  /** LSH quality gauge: the confusion matrix of MinHash candidate pairs
    * (the fast probabilistic blocker) against exact n-gram Jaccard ≥
    * `threshold` (the truth it approximates), plus integer basis-point
    * recall/precision. This is the measurement that justifies — or
    * revokes — running the cheap blocker instead of the exact pair scan
    * on the next corpus; the same contract discipline as the ANN
    * `sim_recall_*` twins, applied to dedup.
    *
    * One corpus scan: the (doc_id, shingles) arrays are checkpointed and
    * feed BOTH sides (LSH signatures and the inverted-index exact
    * pairs). Both pair sets are blocked/DF-capped — never all-pairs —
    * and the full-outer join runs at pair-table size. Truth pairs below
    * the emitter's 0.05 Jaccard floor count as non-dup: with `threshold`
    * above the floor the truth set is exact MODULO the shared `maxDf`
    * cap — intersection counts ignore shingles hotter than maxDf, so
    * truth Jaccard is a lower bound, and a pair sharing ONLY capped
    * shingles is absent from the truth side entirely (on a skewed
    * corpus the gauge can therefore misclassify a real dup as a false
    * positive and understate n_true; the oracle applies the identical
    * cap, so cross-engine parity holds regardless). Callers measuring a
    * skew-heavy corpus should raise maxDf for the eval run and pay the
    * hot posting lists once.
    * Output: one row — n_true, n_pred, n_tp, n_fn, n_fp, recall_bp,
    * precision_bp.
    */
  def minhashEval(
      docs: DataFrame, threshold: Double = 0.1,
      k: Int = 8, rowsPerBand: Int = 2, maxDf: Int = 100): DataFrame = {
    require(threshold >= 0.05, "truth below the emitter's Jaccard floor would be silently missing")
    val sh = shingleArrays(docs).localCheckpoint(false)
    val truth = ngramPairCountsFromShingles(sh, maxDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= 0.05)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    val pred = candidatePairsFromBuckets(
        bucketsFromWide(minhashWideFromShingles(sh, k), k, rowsPerBand))
      .withColumn("p", lit(1L))
    truth.join(pred, Seq("doc_a", "doc_b"), "full_outer")
      .select(coalesce(col("jaccard"), lit(0.0)).as("j"),
        coalesce(col("p"), lit(0L)).as("p"))
      .agg(
        sum(when(col("j") >= threshold, 1L).otherwise(0L)).as("n_true"),
        sum(col("p")).as("n_pred"),
        sum(when(col("j") >= threshold && col("p") === 1L, 1L).otherwise(0L)).as("n_tp"),
        sum(when(col("j") >= threshold && col("p") === 0L, 1L).otherwise(0L)).as("n_fn"),
        sum(when(col("j") < threshold && col("p") === 1L, 1L).otherwise(0L)).as("n_fp"))
      .select(col("n_true"), col("n_pred"), col("n_tp"), col("n_fn"), col("n_fp"),
        expr("n_tp * 10000 DIV nullif(n_true, 0)").as("recall_bp"),
        expr("n_tp * 10000 DIV nullif(n_pred, 0)").as("precision_bp"))
  }

  /** N-gram containment for the same candidate pairs: |A∩B|/|A| and
    * |A∩B|/|B| — the ASYMMETRIC near-dup measure. Jaccard misses the
    * quote/boilerplate case (a small doc wholly contained in a large one
    * scores low because the union is large); containment flags it from
    * either side. Same inverted-index pipeline and DF cap as
    * [[ngramJaccardPairs]] — one shared core, different final ratios.
    */
  def ngramContainmentPairs(
      docs: DataFrame, minContainment: Double = 0.5, maxDf: Int = 100): DataFrame =
    ngramPairCounts(docs, maxDf)
      .withColumn("containment_a",
        col("n_common").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_b",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(greatest(col("containment_a"), col("containment_b")) >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("containment_a"), col("containment_b"))

  /** Jaccard AND containment in ONE pass over the shared pair core — the
    * fused form of [[ngramJaccardPairs]] + [[ngramContainmentPairs]]. The
    * two measures share `ngramPairCounts` exactly (same inverted index,
    * same DF cap, same candidate pairs); running them as separate queries
    * prices the expensive core twice, which at 100 TB is a full second
    * corpus-wide shingle pass for three extra ratio columns. A pair
    * survives if EITHER measure flags it, so each sibling's output is a
    * filter+projection of this frame.
    */
  def ngramPairStats(
      docs: DataFrame,
      minJaccard: Double = 0.05,
      minContainment: Double = 0.5,
      maxDf: Int = 100): DataFrame =
    ngramPairCounts(docs, maxDf)
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .withColumn("containment_a",
        col("n_common").cast("double") / col("n_a").cast("double"))
      .withColumn("containment_b",
        col("n_common").cast("double") / col("n_b").cast("double"))
      .filter(col("jaccard") >= minJaccard ||
        greatest(col("containment_a"), col("containment_b")) >= minContainment)
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("jaccard"), col("containment_a"), col("containment_b"))

  /** Shared pair-counting core of the n-gram similarity family: one row
    * per blocked candidate pair with full set sizes and the (DF-capped)
    * intersection count — `(doc_a, doc_b, n_a, n_b, n_common)`.
    */
  private def ngramPairCounts(docs: DataFrame, maxDf: Int): DataFrame = {
    // Inverted index: group the posting list per shingle and expand
    // co-occurrence pairs locally (one shuffle on the shingle), instead of
    // a self-join that would rebuild and re-shuffle the shingle stream
    // twice. Per-doc dedup happens scan-side (array_distinct before the
    // explode — no global distinct shuffle); the |A| set size comes from
    // one window count over doc_id AFTER the explode.
    //
    // Why the window, when size() of the array before exploding looks
    // free? MEASURED (sf0.1, min of reps): carrying `size(array_distinct(
    // shingles))` past the explode makes Catalyst's Generate-adjacent
    // projection handling re-inline the non-cheap shingle-construction
    // expression into every consumer — transform(sequence(...)) appeared
    // 8× in the physical plan and the query went 1.85 s → 19-24 s.
    // Packing (shingle, n) structs before the explode was worse still
    // (size(sh) re-inlined PER ELEMENT: >1000 s), and joining sizes from
    // a third scan re-inlined too (8.7 s). The window re-exchanges the
    // exploded stream once, keyed by high-cardinality doc_id with tiny
    // per-doc groups — strictly cheaper than re-evaluating the shingle
    // transform even once, locally and at scale. PlanSpec pins the
    // duplication count, which is the thing that actually regresses.
    //
    // DF-filter blocking bounds the worst case: a shingle occurring in d
    // docs expands d(d-1)/2 pairs, so one stopword-ish shingle in 10^6 docs
    // would materialize a 10^12-pair bucket. Shingles with document
    // frequency > maxDf are dropped BEFORE the posting-list aggregation —
    // the standard DF cap: such shingles carry no near-dup signal (they are
    // corpus-common), and dropping them bounds every posting list (and its
    // collect_list buffer) by maxDf. Set sizes `n` are computed over the
    // FULL shingle set, so the Jaccard denominator stays exact; only the
    // intersection count ignores capped shingles (a lower bound for pairs
    // that share them). The DF pass is one count aggregation (map-side
    // combined) and the cap list is tiny, so it rides a broadcast anti-join.
    ngramPairCountsFromShingles(shingleArrays(docs), maxDf)
  }

  /** [[ngramPairCounts]] over a pre-built (doc_id, shingles) frame — see
    * [[minhashWideFromShingles]] for why the seam exists.
    */
  private def ngramPairCountsFromShingles(shingles: DataFrame, maxDf: Int): DataFrame = {
    val exploded = shingles
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("shingle"))
    val hot = exploded.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("shingle"))
    val sh = exploded
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .join(broadcast(hot), Seq("shingle"), "left_anti")
    sh.groupBy(col("shingle"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2), i ->
             transform(sequence(i + 1, size(ids) - 1), j ->
               struct(ids[i].doc_id AS doc_a, ids[j].doc_id AS doc_b,
                      ids[i].n AS n_a, ids[j].n AS n_b))))""")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.n_a").as("n_a"), col("p.n_b").as("n_b"))
      .agg(count(lit(1)).as("n_common"))
  }

  /** Passage-level exact dedup (the RefinedWeb / CCNet line-dedup pass,
    * adapted to fixed windows because this corpus has no line structure):
    * cut every doc into non-overlapping `width`-token passages, keep only
    * the FIRST occurrence of each distinct passage corpus-wide (first =
    * smallest (doc_id, window index)), and report per doc how many
    * passages and tokens survive. This removes repeated boilerplate
    * passages from every doc that carries them — a finer decision than
    * whole-doc dedup (doc survives, its duplicated passages don't) and a
    * coarser, much cheaper one than the stride-1 [[dupWindows]] signal.
    *
    * Shape: one scan-side window expansion (n_tokens/width rows per doc —
    * width× cheaper than stride-1), ONE exchange keyed by passage text for
    * the first-occurrence rank, one map-side-combinable re-aggregation by
    * doc. At 100 TB the rank key would be a 128-bit passage hash so the
    * shuffle ships 16-byte keys instead of passage strings (needs ~2^64
    * passages for a collision); text keying here keeps the operator
    * bit-exact against the SQL oracle.
    */
  def passageDedup(docs: DataFrame, width: Int = 32): DataFrame = {
    val passages = docs
      .select(col("doc_id"), tokens(col("text")).as("t"))
      .select(col("doc_id"), explode(expr(
        s"""transform(sequence(0, greatest(0, (size(t) + ${width - 1}) div $width - 1)),
              i -> struct(i AS widx,
                          array_join(slice(t, i * $width + 1, $width), ' ') AS ptext,
                          size(slice(t, i * $width + 1, $width)) AS ntok))""")).as("p"))
      .select(col("doc_id"), col("p.widx").as("widx"),
        col("p.ptext").as("ptext"), col("p.ntok").as("ntok"))
    val firstRank = org.apache.spark.sql.expressions.Window
      .partitionBy(col("ptext")).orderBy(col("doc_id"), col("widx"))
    passages
      .withColumn("rn", row_number().over(firstRank))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_passages"),
        sum(when(col("rn") > 1, 1L).otherwise(0L)).as("n_dup_dropped"),
        sum(when(col("rn") === 1, col("ntok").cast(LongType)).otherwise(0L))
          .as("n_tokens_kept"))
  }
}
