package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Change-data-capture maintenance of a partitioned corpus snapshot —
  * the two moves a 100 TB deployment makes when a daily delta arrives,
  * instead of rebuilding the corpus:
  *
  *  1. [[cowUpsert]]: MERGE the delta into the snapshot copy-on-write,
  *     rewriting ONLY the partition directories the delta touches
  *     (partition-pruned read, staged write, directory swap — untouched
  *     partitions keep their files byte-for-byte, CdcSpec pins the
  *     listing).
  *  2. [[manifestIvm]]: maintain the release-manifest AGGREGATE
  *     algebraically from the delta alone — zero snapshot rescans.
  *     count/sum retract by sign; the xor checksum retracts by re-xoring
  *     the old term (xor is its own inverse). The incremental result is
  *     hash-checked against a full recompute by the oracle, which is the
  *     whole point: at 100 TB the full recompute is a corpus pass, the
  *     IVM merge is |delta| + |sources| rows.
  *
  * The delta itself is derived deterministically from the corpus (this
  * sandbox has no upstream feed): [[feed]] makes ONE pruned pass over
  * the [[dirtyLangs]] rows and materializes it — the stand-in for the
  * day's arriving CDC batch — and the op derivations ([[deletes]],
  * [[updates]], [[inserts]]) read that materialized batch, not the
  * corpus. Delete beats update on overlapping keys; inserted keys are
  * offset far above the live id range. Both engines derive the delta
  * from the same table with the same arithmetic, so the oracle sees the
  * same merge without any side channel.
  */
object Cdc {

  /** Languages the synthetic delta touches — the other partitions must
    * come through [[cowUpsert]] physically untouched.
    */
  val dirtyLangs: Seq[String] = Seq("de", "fr")

  private val insIdOffset = 1000000L

  /** The day's CDC batch, derived from the corpus in ONE pruned pass and
    * materialized (`localCheckpoint`) so the op derivations below never
    * re-scan the corpus — the operator-cost accounting treats this frame
    * as the arriving input, |delta|-sized, which is what it stands in
    * for.
    */
  def feed(docs: DataFrame): DataFrame =
    docs.where(col("lang").isin(dirtyLangs: _*))
      .select("doc_id", "text", "lang", "source", "n_chars")
      .localCheckpoint()

  /** Delete keys: every 11th id in the batch. Deletes win over updates
    * on overlap (the `% 11 <> 0` guard in [[updates]]).
    */
  def deletes(batch: DataFrame): DataFrame =
    batch.where(col("doc_id") % 11 === 0).select("doc_id")

  /** Update rows (full new image, as a CDC feed ships them): every 7th
    * id not deleted; text re-written, n_chars recomputed from it.
    */
  def updates(batch: DataFrame): DataFrame =
    batch
      .where(col("doc_id") % 7 === 0 && col("doc_id") % 11 =!= 0)
      .select(col("doc_id"),
        concat(lit("cdc1 "), col("text")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Insert rows: every 13th id, re-keyed above the live range (a row
    * can seed both an update and an insert — they land under different
    * keys).
    */
  def inserts(batch: DataFrame): DataFrame =
    batch
      .where(col("doc_id") % 13 === 0)
      .select((col("doc_id") + insIdOffset).as("doc_id"),
        concat(lit("ins "), col("text")).as("text"),
        col("lang"), col("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  /** Write the lang-partitioned base snapshot — the "yesterday" state
    * the merge maintains.
    */
  def writeSnapshot(docs: DataFrame, path: String): Unit =
    docs.select("doc_id", "text", "source", "n_chars", "lang")
      .write.mode("overwrite").partitionBy("lang").parquet(path)

  /** The rewritten content of the DIRTY partitions only: snapshot rows
    * of those partitions (a partition-pruned read — the `lang IN`
    * predicate must reach the scan as a PartitionFilter, PlanSpec pins
    * it) minus deleted/updated keys, plus the new images. Exposed
    * separately from [[mergeDelta]] so the plan is inspectable.
    */
  def rewrittenDirty(
      spark: SparkSession, batch: DataFrame, path: String): DataFrame = {
    val target = spark.read.parquet(path)
      .where(col("lang").isin(dirtyLangs: _*))
    val changedKeys = deletes(batch).union(updates(batch).select("doc_id"))
    val cols = target.columns.map(col).toSeq
    target
      .join(changedKeys, Seq("doc_id"), "left_anti")
      .unionByName(updates(batch).select(cols: _*))
      .unionByName(inserts(batch).select(cols: _*))
  }

  /** Copy-on-write MERGE of the batch into the snapshot at `path`:
    * stage the rewritten dirty partitions fully, then commit by
    * directory swap — old files stay readable until the new ones are
    * complete, clean partitions are never opened. At 100 TB with daily
    * deltas touching a handful of partitions, the merge reads and
    * writes |dirty| directories, not the corpus.
    */
  def mergeDelta(
      spark: SparkSession, batch: DataFrame, path: String): Unit = {
    val staging = s"$path.cow"
    rewrittenDirty(spark, batch, path)
      .write.mode("overwrite").partitionBy("lang").parquet(staging)
    val conf = spark.sessionState.newHadoopConf()
    val fs = new org.apache.hadoop.fs.Path(path).getFileSystem(conf)
    dirtyLangs.foreach { l =>
      val live = new org.apache.hadoop.fs.Path(s"$path/lang=$l")
      val staged = new org.apache.hadoop.fs.Path(s"$staging/lang=$l")
      fs.delete(live, true)
      require(fs.rename(staged, live),
        s"copy-on-write swap failed for partition lang=$l")
    }
    fs.delete(new org.apache.hadoop.fs.Path(staging), true)
  }

  /** The registered end-to-end form: write the snapshot, merge the
    * derived batch copy-on-write, and emit the per-lang release
    * manifest of the final snapshot — whose fp_xor hash-check proves
    * every partition (rewritten and untouched alike) carries exactly
    * the post-merge content the oracle computes from scratch.
    */
  def cowUpsert(spark: SparkSession, docs: DataFrame, scratch: String)
      : DataFrame = {
    val path = s"$scratch/snap"
    writeSnapshot(docs, path)
    mergeDelta(spark, feed(docs), path)
    Governance.releaseManifestBy(spark.read.parquet(path), "lang")
  }

  /** Signed per-row manifest effects of the batch: (source, d_docs,
    * d_chars, fp term). A delete retracts its old row; an update
    * retracts the old image and adds the new one (two rows); an insert
    * adds. One xor column serves both directions because xor is its own
    * inverse. Every input is the materialized batch — no corpus access.
    */
  def deltaEffects(batch: DataFrame): DataFrame = {
    def eff(rows: DataFrame, sign: Int): DataFrame =
      rows.select(col("source"),
        lit(sign.toLong).as("d_docs"),
        (col("n_chars") * sign).as("d_chars"),
        TextAnalysis.fingerprint(col("text")).as("fp"))
    eff(batch.join(deletes(batch), Seq("doc_id"), "left_semi"), -1)
      .unionByName(eff(
        batch.join(updates(batch).select("doc_id"), Seq("doc_id"),
          "left_semi"), -1))
      .unionByName(eff(updates(batch), 1))
      .unionByName(eff(inserts(batch), 1))
  }

  /** Incremental view maintenance of the per-source release manifest:
    * persist yesterday's manifest as an artifact, fold the batch's
    * signed effects into it per source, and return the merged manifest —
    * WITHOUT rescanning the snapshot. The oracle recomputes the manifest
    * from scratch over the post-merge corpus, so the hash match is the
    * IVM correctness proof: counts and sums retract by sign, the
    * checksum retracts by xor. Cost model at 100 TB: the artifact is
    * |sources| rows, the effects pass is |delta| rows — the corpus is
    * read zero times by the maintenance step, vs once for the recompute
    * this provably equals. (Building yesterday's artifact here costs the
    * one corpus pass "yesterday" already paid.)
    */
  def manifestIvm(spark: SparkSession, docs: DataFrame, scratch: String)
      : DataFrame = {
    val artifact = s"$scratch/manifest_base"
    Governance.releaseManifest(docs)
      .write.mode("overwrite").parquet(artifact)
    val base = spark.read.parquet(artifact)

    val eff = deltaEffects(feed(docs))
      .select(col("source"), col("d_docs"), col("d_chars"),
        expr("cast(conv(substring(fp, 1, 15), 16, 10) as bigint)")
          .as("fp_term"))
      .groupBy(col("source"))
      .agg(sum(col("d_docs")).as("dd"), sum(col("d_chars")).as("dc"),
        expr("bit_xor(fp_term)").as("dx"))

    base.join(eff, Seq("source"), "left")
      .select(col("source"),
        (col("n_docs") + coalesce(col("dd"), lit(0L))).as("n_docs"),
        (col("sum_chars") + coalesce(col("dc"), lit(0L))).as("sum_chars"),
        col("fp_xor").bitwiseXOR(coalesce(col("dx"), lit(0L))).as("fp_xor"))
  }
}
