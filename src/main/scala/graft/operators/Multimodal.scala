package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `BinaryType` columns plus a typed metadata struct. The real media codecs
  * are not available in this environment, so the decode step is a
  * deterministic stub ([[decodeStub]]) — but every piece of Spark plumbing
  * around it (binary columns, metadata schema, per-partition batch
  * processing with typed Encoders, feature schema) is real and tested.
  *
  * Scale design (100 TB stance): blobs are the widest column by far, so
  * every transform here is a narrow per-row projection (no shuffle, no
  * cross-row traffic) and feature extraction happens in the same stage as
  * the scan. Column pruning matters most: queries that only need metadata
  * never materialize the blob (the parquet reader prunes it), which is why
  * metadata lives in its own struct column instead of inside the blob.
  */
object Multimodal {

  /** A decoded-media feature row: what a real image decode would yield
    * (dimensions + a small feature vector), produced here by the stub.
    */
  final case class MediaFeatures(
      doc_id: Long,
      width: Int,
      height: Int,
      n_bytes: Int,
      features: Array[Float])

  /** Attach the opaque payload + typed metadata to each document. In a real
    * pipeline the blob is the raw image/audio bytes; here it is the UTF-8
    * text payload (deterministic, environment-independent).
    */
  def withBlob(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("blob"),
      struct(
        octet_length(encode(col("text"), "UTF-8")).as("n_bytes"),
        lit("utf8-text").as("format")).as("meta"))

  /** Pure-projection binary features — the oracle-checkable surface:
    * byte length, content hashes, and a header slice (what a format
    * sniffer reads). All codegen'd built-ins; the blob never shuffles.
    */
  def binaryFeatures(docs: DataFrame): DataFrame = {
    val blob = encode(col("text"), "UTF-8")
    docs.select(
      col("doc_id"),
      octet_length(blob).as("n_bytes"),
      md5(col("text")).as("content_md5"),
      sha2(col("text"), 256).as("content_sha256"),
      hex(substring(blob, 1, 8)).as("header_hex"))
  }

  /** Real scan-side header decode: fixed-offset binary field extraction —
    * the piece of a format sniffer/decoder that IS SQL-expressible (a PNG
    * IHDR or BMP header parse has exactly this shape: magic bytes, then
    * big-endian integer fields at fixed offsets). Reads bytes [1,4] as a
    * big-endian u32 `width`, [5,8] as `height`, byte 9 as `bit_depth`, and
    * the first two bytes as the `magic_hex` tag — via binary substring +
    * hex + base-16 conv, all codegen'd built-ins. Pure projection: the
    * blob never shuffles, and a metadata-only consumer still prunes it.
    * Blobs shorter than 9 bytes yield null fields (no ANSI error) — the
    * honest signal for a truncated payload.
    */
  def headerDecode(docs: DataFrame): DataFrame = {
    val blob = encode(col("text"), "UTF-8")
    def beField(off: Int, len: Int) =
      when(octet_length(blob) >= off + len - 1,
        conv(hex(substring(blob, off, len)), 16, 10).cast("long"))
    docs.select(
      col("doc_id"),
      beField(1, 4).as("width"),
      beField(5, 4).as("height"),
      beField(9, 1).as("bit_depth"),
      when(octet_length(blob) >= 2, hex(substring(blob, 1, 2))).as("magic_hex"))
  }

  /** Deterministic stand-in for a media decode: derives fake dimensions and
    * an 8-float feature vector from the blob's MD5. Runs per-partition over
    * an iterator — the exact batch shape a real decoder (or an Arrow-batch
    * UDF) would use, so swapping in a real codec changes only this body.
    */
  def decodeStub(spark: SparkSession, docs: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    docs.select(col("doc_id").cast("long"), encode(col("text"), "UTF-8").as("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val digest = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, blob) =>
          val h = digest.digest(blob)
          digest.reset()
          MediaFeatures(
            doc_id = id,
            width = 16 + (h(0) & 0x7f),
            height = 16 + (h(1) & 0x7f),
            n_bytes = blob.length,
            features = Array.tabulate(8)(i => (h(i * 2) & 0xff) / 255.0f))
        }
      }
  }

  /** Resize stub: the post-decode transform shape — scales the fake
    * dimensions and average-pools the feature vector 2:1, all typed and
    * per-row (the plumbing a real bilinear resize would occupy). Chains
    * after [[decodeStub]] with no shuffle.
    */
  def resizeStub(
      spark: SparkSession,
      feats: Dataset[MediaFeatures],
      scale: Double = 0.5): Dataset[MediaFeatures] = {
    import spark.implicits._
    feats.map { f =>
      val pooled = Array.tabulate(f.features.length / 2)(i =>
        (f.features(2 * i) + f.features(2 * i + 1)) / 2.0f)
      f.copy(
        width = math.max(1, (f.width * scale).toInt),
        height = math.max(1, (f.height * scale).toInt),
        features = pooled)
    }
  }

  /** Frame-sampling shape for video-like payloads: split the blob into
    * fixed-size "frames" and keep every `stride`-th — the plumbing (one
    * input row → variable output rows, no shuffle) of real frame sampling.
    */
  def frameSample(docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    withBlob(docs).select(
      col("doc_id"),
      posexplode(expr(
        s"""filter(
              transform(
                sequence(0, cast(floor((meta.n_bytes - 1) / $frameBytes) as int)),
                i -> struct(i as idx, substring(blob, i * $frameBytes + 1, $frameBytes) as frame)),
              f -> f.idx % $stride = 0)""")))
      .select(col("doc_id"), col("col.idx").as("frame_idx"),
        octet_length(col("col.frame")).as("frame_bytes"))
}
