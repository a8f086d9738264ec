package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Deduplication operators for large-scale document pipelines.
  *
  * All hashing is md5-based so the DuckDB oracle can reproduce results
  * bit-for-bit (both engines ship identical md5); MinHash signatures are
  * lexicographic minima of hex digests — no engine-specific integer hash.
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

  /** Tokenize into lowercase whitespace words (shared by all text ops). */
  private[operators] def tokens(text: Column): Column =
    split(lower(trim(text)), "\\s+")

  /** Word 3-gram shingles of a document (1 row per doc in → exploded out).
    * Docs shorter than 3 tokens produce no shingles.
    */
  private def shingled(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .filter(size(col("toks")) >= 3)
      .select(col("doc_id"),
        explode(expr(
          "transform(sequence(1, size(toks)-2)," +
            " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))
          .as("shingle"))

  /** MinHash signatures: k hash functions h_j(s) = md5(j:s); the signature
    * component is the lexicographic min digest per (doc, j). Output one row
    * per (doc_id, j) — k rows per doc.
    */
  def minhashSignatures(docs: DataFrame, k: Int = 8): DataFrame =
    shingled(docs)
      .select(col("doc_id"),
        explode(expr(s"sequence(0, ${k - 1})")).as("j"),
        col("shingle"))
      .select(col("doc_id"), col("j"),
        md5(concat(col("j").cast("string"), lit(":"), col("shingle"))).as("h"))
      .groupBy(col("doc_id"), col("j"))
      .agg(min(col("h")).as("minhash"))

  /** LSH banding over the MinHash signature: k hashes split into bands of
    * `rowsPerBand`; the bucket key is the concatenated band slice. Output
    * one row per (doc, band).
    */
  def minhashBuckets(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame =
    minhashSignatures(docs, k)
      .withColumn("band", (col("j") / rowsPerBand).cast(LongType))
      .groupBy(col("doc_id"), col("band"))
      // j is unique within (doc, band) → array_sort makes the concat
      // order-deterministic without relying on agg input order.
      .agg(array_join(array_sort(collect_list(col("minhash"))), "|").as("bucket_key"))

  /** Candidate near-duplicate pairs: docs sharing any LSH bucket. The join
    * runs per-bucket (equi-join on (band, bucket_key)) — never all-pairs.
    */
  def minhashCandidatePairs(docs: DataFrame, k: Int = 8, rowsPerBand: Int = 2): DataFrame = {
    val b = minhashBuckets(docs, k, rowsPerBand)
    val l = b.select(col("band").as("l_band"), col("bucket_key").as("l_key"),
      col("doc_id").as("doc_a"))
    val r = b.select(col("band").as("r_band"), col("bucket_key").as("r_key"),
      col("doc_id").as("doc_b"))
    l.join(r, l("l_band") === r("r_band") && l("l_key") === r("r_key")
        && l("doc_a") < r("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
  }

  /** 32-bit SimHash over word occurrences. Bit i of the fingerprint is the
    * sign of Σ_words (±1), where the ±1 is hex digit i of md5(word) having
    * its high bit set. Cross-engine-exact: md5 + substring + integer sums.
    */
  def simhash(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(tokens(col("text"))).as("w"))
      .select(col("doc_id"), md5(col("w")).as("h"),
        explode(expr("sequence(1, 32)")).as("i"))
      .select(col("doc_id"), col("i"),
        when(col("h").substr(col("i"), lit(1))
          .isin("8", "9", "a", "b", "c", "d", "e", "f"), 1L)
          .otherwise(-1L).as("c"))
      .groupBy(col("doc_id"), col("i"))
      .agg(sum(col("c")).as("s"))
      .groupBy(col("doc_id"))
      .agg(sum(when(col("s") > 0,
        pow(lit(2.0), col("i") - 1).cast(LongType)).otherwise(0L))
        .as("simhash"))

  /** N-gram Jaccard similarity for all candidate pairs that share at least
    * one shingle (inverted-index join on the shingle — the blocking step
    * that replaces the quadratic all-pairs compare at scale).
    * jaccard = |A∩B| / (|A|+|B|-|A∩B|), exact integer arithmetic until the
    * final division.
    */
  def ngramJaccardPairs(docs: DataFrame, minJaccard: Double = 0.05): DataFrame = {
    val sh = shingled(docs).distinct()
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val l = sh.select(col("doc_id").as("doc_a"), col("shingle"))
    val r = sh.select(col("doc_id").as("doc_b"), col("shingle").as("shingle_b"))
    val common = l
      .join(r, l("shingle") === r("shingle_b") && l("doc_a") < r("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .withColumn("jaccard",
        col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common")).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select(col("doc_a"), col("doc_b"), col("n_common"), col("jaccard"))
  }
}
