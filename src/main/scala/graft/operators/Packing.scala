package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-assembly operators for training runs: token-budget sequence
  * packing (which shard does each document's token stream land in) and
  * capped domain-mixture weights (how much of each source domain a run
  * samples). Both are the "turn a curated corpus into a training mix"
  * steps that follow dedup/gating in an LLM data pipeline.
  */
object Packing {

  /** Token-budget packing: lay each language's documents end-to-end in
    * doc_id order and cut the token stream into `budgetTokens`-sized
    * shards — every doc gets its global token offset and shard id. This
    * is a per-language running sum, and `lang` is LOW-cardinality, so the
    * naive window would funnel the whole corpus through ≤|langs| reducers
    * (the q15/q32 scale-killer). Banded two-pass decomposition instead:
    *
    *   1. in-band running sum over (lang, band = doc_id div bandWidth) —
    *      high-cardinality keys, parallelism scales with the corpus;
    *   2. per-(lang, band) totals → prefix sums over the TINY band
    *      aggregate (rows = bands × langs, independent of corpus rows),
    *      broadcast back;
    *   offset = band prefix + in-band cumsum − n_tokens.
    *
    * Size `bandWidth` so one (lang, band) slice fits an executor; the
    * only corpus-sized exchange is the (lang, band) window's.
    */
  def packTokenShards(
      docs: DataFrame,
      budgetTokens: Long = 4096L,
      bandWidth: Long = 64L): DataFrame = {
    val withTok = docs.select(
      col("doc_id"), col("lang"),
      size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
      expr(s"doc_id div $bandWidth").as("band"))
    val wBand = Window.partitionBy(col("lang"), col("band"))
      .orderBy(asc("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // strictly-previous bands' totals; this window IS keyed by the bare
    // low-cardinality key, but consumes only the tiny band aggregate
    val wPrefix = Window.partitionBy(col("lang")).orderBy(asc("band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val prefixes = withTok
      .groupBy(col("lang"), col("band"))
      .agg(sum(col("n_tokens")).as("band_total"))
      .withColumn("prefix", coalesce(sum(col("band_total")).over(wPrefix), lit(0L)))
      .select(col("lang"), col("band"), col("prefix"))
    withTok
      .withColumn("cum_in_band", sum(col("n_tokens")).over(wBand))
      .join(broadcast(prefixes), Seq("lang", "band"))
      // "offset" is a reserved word in the oracle dialect; tok_offset on
      // both sides keeps the names aligned for the driver's compare
      .withColumn("tok_offset", col("prefix") + col("cum_in_band") - col("n_tokens"))
      .withColumn("shard_id", expr(s"tok_offset div $budgetTokens"))
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("tok_offset"), col("shard_id"))
  }

  /** The loader contract [[packTokenShards]] implies but does not emit:
    * per (doc, shard) SPANS. A document whose token stream crosses a
    * shard boundary (shard_id only records where it STARTS) occupies a
    * suffix of one shard and a prefix of the next; the training loader
    * needs exactly that map — where in each shard every doc's tokens
    * sit, and whether the doc continues into the following shard (the
    * attention-boundary / loss-masking metadata of concatenation
    * packing). One row per touched shard: (doc_id, lang, shard_id,
    * start_in_shard, end_in_shard (exclusive), continues).
    *
    * Scan-side expansion over the packing output: each doc explodes to
    * exactly its span count (≥1, = 1 + boundary crossings), so total
    * rows = docs + crossings — no shuffle beyond [[packTokenShards]]'s
    * own banded pass. Spans tile each doc exactly (PackingSpec pins
    * sum(span) = n_tokens and the chain-across-boundary invariants).
    */
  def packShardSpans(
      docs: DataFrame,
      budgetTokens: Long = 4096L,
      bandWidth: Long = 64L): DataFrame =
    packTokenShards(docs, budgetTokens, bandWidth)
      .withColumn("end_off", col("tok_offset") + col("n_tokens"))
      .withColumn("shard_id", explode(sequence(
        expr(s"tok_offset div $budgetTokens"),
        expr(s"(end_off - 1) div $budgetTokens"))))
      .select(col("doc_id"), col("lang"), col("shard_id"),
        (greatest(col("tok_offset"), col("shard_id") * budgetTokens)
          - col("shard_id") * budgetTokens).as("start_in_shard"),
        (least(col("end_off"), (col("shard_id") + 1) * budgetTokens)
          - col("shard_id") * budgetTokens).as("end_in_shard"),
        (col("end_off") > (col("shard_id") + 1) * budgetTokens).as("continues"))

  /** Per-shard packing diagnostics over [[packTokenShards]] — the batch
    * shape report a training loader reads before consuming the shards:
    * docs and tokens per (lang, shard), span of packed offsets, and the
    * fill ratio against the token budget. Every shard except each
    * language's last should sit at (or one doc-boundary under) budget;
    * a systematically low fill means the budget is smaller than typical
    * documents and the packer is fragmenting. One map-side-combinable
    * aggregation over the packing output.
    */
  def packShardStats(docs: DataFrame, budgetTokens: Long = 4096L): DataFrame =
    packTokenShards(docs, budgetTokens)
      .groupBy(col("lang"), col("shard_id"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("shard_tokens"),
        min(col("tok_offset")).as("first_offset"),
        max(col("tok_offset") + col("n_tokens")).as("end_offset"))
      .withColumn("fill",
        col("shard_tokens").cast("double") / lit(budgetTokens.toDouble))

  /** Capped domain-mixture weights: per (lang, source) domain, weight ∝
    * min(domain_tokens, cap) — the standard "cap the dominant domains"
    * rebalancing (an exactly-representable stand-in for temperature
    * sampling: same shape, but every weight is a single IEEE division of
    * exact integers, so the oracle matches bit-for-bit where a pow(x, α)
    * sum would be accumulation-order-dependent). rep_factor is the
    * expected duplication of each domain under a `targetTokens` budget:
    * weight · target / domain_tokens. Each factor is cast to double
    * BEFORE the multiply: a Long×Long product (capTokens · dom_tokens)
    * silently wraps past 2^63 at corpus scale while the DuckDB oracle
    * would raise — double·double rounds identically on both engines
    * (one IEEE multiply each side, one final division), so parity holds
    * with no overflow cliff. One hash agg over a scan-side projection +
    * one broadcast scalar — output rows = |domains|, corpus-independent.
    */
  /** Temperature-scaled mixture weights — the multilingual source-balancing
    * formula (mC4/XLM-R style): sample domain i with probability
    * p_i^α / Σ_j p_j^α, flattening the head so low-resource domains
    * surface. Pinned at α = 1/2, where p^α is `sqrt` — correctly rounded
    * in IEEE 754 on every engine (a general `pow` is not), so parity
    * holds bit-for-bit: each sqrt floor-scales to a long (exact sum, no
    * accumulation-order dependence) and only the final weight divides.
    * Same shape as [[mixCappedWeights]]: one hash agg over a scan-side
    * projection + one broadcast scalar; output rows = |domains|.
    */
  def mixTemperature(docs: DataFrame, targetTokens: Long = 1000000L): DataFrame = {
    val dom = docs
      .select(col("lang"), col("source"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("dom_tokens"))
      .withColumn("s_alpha",
        floor(lit(1000.0) * sqrt(col("dom_tokens").cast("double"))).cast("long"))
      // |domains| rows — checkpointed so the total agg and the weight
      // projection replay it: ONE corpus scan, not two
      .localCheckpoint()
    val total = dom.agg(sum(col("s_alpha")).as("total_alpha"))
    dom.crossJoin(broadcast(total))
      .withColumn("weight",
        col("s_alpha").cast("double") / col("total_alpha").cast("double"))
      .withColumn("rep_factor",
        (col("weight") * lit(targetTokens).cast("double")) /
          col("dom_tokens").cast("double"))
      .select(col("lang"), col("source"), col("n_docs"), col("dom_tokens"),
        col("s_alpha"), col("weight"), col("rep_factor"))
  }

  def mixCappedWeights(
      docs: DataFrame,
      capTokens: Long = 400L,
      targetTokens: Long = 1000000L): DataFrame = {
    val dom = docs
      .select(col("lang"), col("source"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("dom_tokens"))
      .withColumn("capped_tokens", least(col("dom_tokens"), lit(capTokens)))
      // |domains| rows — checkpointed so the total agg and the weight
      // projection replay it: ONE corpus scan, not two
      .localCheckpoint()
    val total = dom.agg(sum(col("capped_tokens")).as("total_capped"))
    dom.crossJoin(broadcast(total))
      .withColumn("weight",
        col("capped_tokens").cast("double") / col("total_capped").cast("double"))
      .withColumn("rep_factor",
        (col("capped_tokens").cast("double") * lit(targetTokens).cast("double")) /
          (col("total_capped").cast("double") * col("dom_tokens").cast("double")))
      .select(col("lang"), col("source"), col("n_docs"), col("dom_tokens"),
        col("capped_tokens"), col("weight"), col("rep_factor"))
  }

  /** Deterministic train/holdout split: bucket = the first 8 hex digits
    * of md5(doc_id) mod 100, holdout = the top `holdoutPct` buckets.
    * Hash-splitting (not random-splitting) is THE way training pipelines
    * cut eval sets — the assignment is a pure function of the document
    * identity, so it is stable across re-runs, re-shards, and corpus
    * growth (a doc never migrates between splits when new data arrives).
    *
    * Pure scan-side projection: zero shuffles, zero joins — the split of
    * a 100 TB corpus costs exactly one pass (PlanSpec pins no Exchange).
    * md5 (not a seeded 64-bit hash) because the split must be portable:
    * any engine, any language can recompute the same assignment.
    */
  def splitTrainHoldout(docs: DataFrame, holdoutPct: Int = 5): DataFrame = {
    require(holdoutPct > 0 && holdoutPct < 100, "holdoutPct in (0,100)")
    docs.select(
        col("doc_id"), col("lang"),
        size(Dedup.tokens(col("text"))).cast("long").as("n_tokens"),
        expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100")
          .as("bucket"))
      .withColumn("split",
        when(col("bucket") < lit(100L - holdoutPct), lit("train"))
          .otherwise(lit("holdout")))
  }

  /** Materialize the temperature mixture ([[mixTemperature]]) into
    * per-document copy counts — the step that turns a weights table into
    * an actual training set. A domain with rep_factor r contributes
    * floor(r) copies of every doc plus one more for the deterministic
    * frac(r) fraction of docs: bucket = first 8 hex digits of
    * md5(doc_id#mix) (32 bits, uniform), the doc gets the extra copy iff
    * bucket < floor(frac(r)·2^32). Expected token volume per domain =
    * r · dom_tokens = its mixture share of the target budget, and the
    * choice of WHICH docs repeat is a pure function of doc identity —
    * stable across runs, no RNG state.
    *
    * Cost: the weights table is |domains| rows (broadcast); the corpus
    * side is one scan with a scan-side hash — zero corpus-sized shuffles
    * at any scale. rep_factor arithmetic is IEEE-deterministic (quotients
    * of exact integers), so floor/frac/threshold agree bit-for-bit with
    * the SQL oracle.
    */
  def mixApplySampling(docs: DataFrame, targetTokens: Long = 1000000L): DataFrame =
    applyMixture(docs,
      mixTemperature(docs, targetTokens)
        .select(col("lang"), col("source"), col("rep_factor")))

  /** The copy-count application on its own, against an ALREADY-COMPUTED
    * weights table — the form an ingest pipeline runs: weights are a
    * batch artifact recomputed daily, the corpus (or stream) side only
    * needs this stateless broadcast join + hash projection. The SAME
    * expression runs under a streaming plan (StreamingSpec pins stream ≡
    * batch against [[mixApplySampling]] on identical rows).
    */
  def applyMixture(docs: DataFrame, weights: DataFrame): DataFrame =
    withCopyCounts(docs.select(col("doc_id"), col("lang"), col("source")), weights)
      .select(col("doc_id"), col("lang"), col("source"), col("n_copies"))

  /** [[applyMixture]] preserving EVERY input column — the composable form
    * a pipeline stage uses mid-stream (curation columns ride along, the
    * mixture only appends `n_copies`). Same stateless broadcast
    * stream-static join + scan-side hash; the weights frame carries
    * (lang, source, rep_factor).
    */
  def withCopyCounts(docs: DataFrame, weights: DataFrame): DataFrame =
    docs
      .withColumn("__bucket",
        expr("CAST(conv(substring(md5(concat(CAST(doc_id AS STRING), '#mix')), 1, 8), 16, 10) AS BIGINT)"))
      .join(broadcast(weights), Seq("lang", "source"))
      .withColumn("n_copies",
        floor(col("rep_factor")).cast("long") +
          when(col("__bucket") <
            floor((col("rep_factor") - floor(col("rep_factor"))) *
              lit(4294967296.0)).cast("long"), 1L).otherwise(0L))
      .drop("__bucket", "rep_factor")

  /** Cluster-balanced sampling — the EMBEDDING-SPACE twin of the domain
    * mixture, closing the loop from ANN structure to corpus assembly:
    * every vector is assigned to its IVF cell ([[Similarity.ivfCells]] —
    * semantic clusters from the coarse quantizer), cells are weighted by
    * the α = 1/2 temperature formula over their SIZES
    * (weight_c ∝ sqrt(n_vecs_c) — flattens the head so rare semantic
    * regions surface, exactly [[mixTemperature]] with cluster cardinality
    * where that op uses domain tokens), and the weights materialize into
    * per-vector copy counts by the same deterministic md5-bucket scheme
    * as [[applyMixture]]. Expected sample volume per cell =
    * rep_factor·n_vecs = its sqrt-share of `targetVecs`.
    *
    * Shape at 100 TB: the cell assignment is one corpus scan against a
    * broadcast codebook; the (vec_id, cell) table is eagerly checkpointed
    * — it is the pipeline's cluster-index artifact (16 bytes/row, the
    * same class as the persisted dedup index), and both the size
    * aggregation and the per-vec apply replay it instead of re-running
    * assignment. Cell weights are |cells| rows (broadcast); no
    * corpus-sized shuffle anywhere. All weight arithmetic is the
    * oracle-exact sqrt + floor-scale + IEEE-division chain of
    * [[mixTemperature]].
    */
  def mixClusterBalanced(
      emb: DataFrame, targetVecs: Long = 100000L, nCells: Int = 16): DataFrame = {
    val cells = Similarity.ivfCells(emb, nCells).localCheckpoint()
    val cl = cells.groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vecs"))
      .withColumn("s_alpha",
        floor(lit(1000.0) * sqrt(col("n_vecs").cast("double"))).cast("long"))
      .localCheckpoint()
    val total = cl.agg(sum(col("s_alpha")).as("total_alpha"))
    val weights = cl.crossJoin(broadcast(total))
      .withColumn("weight",
        col("s_alpha").cast("double") / col("total_alpha").cast("double"))
      .withColumn("rep_factor",
        (col("weight") * lit(targetVecs).cast("double")) /
          col("n_vecs").cast("double"))
      .select(col("cell"), col("n_vecs"), col("rep_factor"))
    cells
      .withColumn("bucket", expr(
        "CAST(conv(substring(md5(concat(CAST(vec_id AS STRING), '#cmix')), 1, 8), 16, 10) AS BIGINT)"))
      .join(broadcast(weights), Seq("cell"))
      .select(col("vec_id"), col("cell"), col("n_vecs"),
        (floor(col("rep_factor")).cast("long") +
          when(col("bucket") <
            floor((col("rep_factor") - floor(col("rep_factor"))) *
              lit(4294967296.0)).cast("long"), 1L).otherwise(0L))
          .as("n_copies"))
  }

  /** Deterministic global shuffle for training order: each doc's shuffle
    * key is md5(doc_id # seed); shard = first 8 hex digits mod nShards
    * (scan-side), position-in-shard = rank by (key, doc_id) within the
    * shard. The (shard, pos) pair IS the epoch-stable random permutation
    * a training loader consumes — reproducible from the seed alone, no
    * stored state.
    *
    * Exactly ONE corpus-sized exchange (hash-partition by shard), the
    * information-theoretic minimum for a global shuffle: assignment is
    * embarrassingly parallel and ordering is a per-shard local sort. A
    * different seed is a different permutation with zero reshuffling of
    * the plan shape. nShards should be O(cluster cores) at scale so each
    * shard's sort fits an executor.
    */
  def shuffleOrder(docs: DataFrame, seed: Long = 42L, nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards > 0")
    val keyed = docs.select(
        col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit("#"), lit(seed.toString)))
          .as("skey"))
      .withColumn("shard",
        expr(s"CAST(conv(substring(skey, 1, 8), 16, 10) AS BIGINT) % $nShards"))
    keyed
      .withColumn("pos",
        row_number()
          .over(Window.partitionBy(col("shard")).orderBy(col("skey"), col("doc_id")))
          .cast("long"))
      .select(col("doc_id"), col("shard"), col("pos"))
  }

  /** CCNet-style quality-tiered mixture (Wenzek et al. 2020's bucket
    * policy as copy counts): the per-language LM-score terciles
    * ([[TextAnalysis.lmBuckets]]) drive INTEGER replication — head docs
    * upsample 2×, middle kept once, tail dropped — the curriculum knob
    * between the fluency model and corpus assembly. Pure integers (no
    * fractional md5 coin needed), so the mixture is exactly the tier
    * assignment plus a CASE; the plan inherits `text_lm_buckets`'
    * pinned checkpoint-replay shape with zero additional exchanges.
    */
  def mixLmTiers(docs: DataFrame): DataFrame =
    TextAnalysis.lmBuckets(docs)
      .withColumn("n_copies",
        when(col("tier") === 3L, 2L)
          .when(col("tier") === 2L, 1L)
          .otherwise(0L))
      .select(col("doc_id"), col("lang"), col("tier"), col("n_copies"))
}
