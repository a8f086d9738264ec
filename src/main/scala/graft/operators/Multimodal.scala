package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video payloads are opaque
  * `BinaryType` columns plus a typed metadata struct, and the decode step
  * is a REAL image codec: binary P6 PPM (the netpbm raw-RGB format),
  * hand-rolled in pure JVM code ([[decodePpm]]) since no external codec
  * library ships in this environment. The corpus carries no real images,
  * so [[ppmBlob]] synthesizes a valid PPM per document from its text bytes
  * (deterministic, environment-independent) — the decoder then parses the
  * header and pixel plane like any PPM from disk, and every stat
  * downstream is computed from ACTUAL decoded pixels.
  *
  * Scale design (100 TB stance): blobs are the widest column by far, so
  * every transform here is a narrow per-row projection (no shuffle, no
  * cross-row traffic) and feature extraction happens in the same stage as
  * the scan. Column pruning matters most: queries that only need metadata
  * never materialize the blob (the parquet reader prunes it), which is why
  * metadata lives in its own struct column instead of inside the blob.
  */
object Multimodal {

  /** A decoded raster: parsed dimensions + the packed interleaved-RGB
    * pixel plane (3 bytes per pixel, row-major) — what any 8-bit RGB
    * decode yields regardless of container format.
    */
  final case class DecodedImage(
      doc_id: Long,
      width: Int,
      height: Int,
      pixels: Array[Byte])

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

  /** Fixed image width of the synthesized PPMs (pixels). */
  val PpmWidth = 8

  /** Synthesize a VALID binary P6 PPM per document, entirely in codegen'd
    * SQL expressions (real binary-column plumbing, zero shuffle): header
    * `P6\n8 {h}\n255\n` + the text's UTF-8 bytes as the RGB plane, padded
    * with 0x00 to exactly width·h·3 bytes, h = ⌈n_bytes/24⌉ (min 1).
    * The blob is a complete image file any netpbm reader opens — the
    * decoder below gets no side-channel: dimensions come OUT of the
    * parsed header, not from the text.
    */
  def ppmBlob(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("h", greatest(lit(1L),
        ceil(octet_length(col("payload")).cast("double") / (PpmWidth * 3))
          .cast("long")))
      .withColumn("nul", lit("\u0000"))
      .withColumn("padlen",
        (col("h") * (PpmWidth * 3) - octet_length(col("payload"))).cast("int"))
      .select(
        col("doc_id"),
        concat(
          encode(concat(lit(s"P6\n$PpmWidth "), col("h").cast("string"),
            lit("\n255\n")), "UTF-8"),
          col("payload"),
          encode(expr("repeat(nul, padlen)"), "UTF-8")).as("blob"))

  /** REAL image decode: a hand-rolled binary P6 PPM parser (netpbm spec:
    * magic `P6`, whitespace-separated ASCII width/height/maxval with
    * `#`-comment support, one whitespace byte, then width·height·3 raw
    * RGB bytes). Pure JVM, no codec dependency; malformed input fails
    * loudly (wrong magic, truncated pixel plane, maxval > 255) instead of
    * yielding garbage pixels. Runs per-partition over an iterator — the
    * batch shape any decoder occupies — and emits the parsed dimensions
    * plus the actual pixel plane. Narrow per-row projection: no shuffle.
    */
  def decodePpm(spark: SparkSession, blobs: DataFrame): Dataset[DecodedImage] = {
    import spark.implicits._
    blobs.select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val (w, h, px) = parseP6(blob)
          DecodedImage(id, w, h, px)
        }
      }
  }

  /** The parser core of [[decodePpm]] (exposed for tests): returns
    * (width, height, packed RGB plane). Throws on malformed input.
    */
  private[graft] def parseP6(blob: Array[Byte]): (Int, Int, Array[Byte]) = {
    var pos = 0
    def fail(msg: String) =
      throw new IllegalArgumentException(s"PPM parse error at byte $pos: $msg")
    if (blob.length < 2 || blob(0) != 'P' || blob(1) != '6') fail("magic is not P6")
    pos = 2
    def skipSpace(): Unit = {
      var more = true
      while (more && pos < blob.length) {
        val b = blob(pos)
        if (b == ' ' || b == '\n' || b == '\r' || b == '\t') pos += 1
        else if (b == '#') { while (pos < blob.length && blob(pos) != '\n') pos += 1 }
        else more = false
      }
    }
    def parseInt(): Int = {
      skipSpace()
      if (pos >= blob.length || blob(pos) < '0' || blob(pos) > '9') fail("expected digit")
      var v = 0
      while (pos < blob.length && blob(pos) >= '0' && blob(pos) <= '9') {
        v = v * 10 + (blob(pos) - '0'); pos += 1
      }
      v
    }
    val w = parseInt()
    val h = parseInt()
    val maxval = parseInt()
    if (w <= 0 || h <= 0) fail(s"non-positive dimensions ${w}x$h")
    if (maxval <= 0 || maxval > 255) fail(s"unsupported maxval $maxval")
    // exactly ONE whitespace byte separates the header from the raster
    if (pos >= blob.length || !(blob(pos) == ' ' || blob(pos) == '\n' ||
      blob(pos) == '\r' || blob(pos) == '\t')) fail("missing raster separator")
    pos += 1
    val need = w * h * 3
    if (blob.length - pos < need)
      fail(s"truncated pixel plane: need $need, have ${blob.length - pos}")
    (w, h, java.util.Arrays.copyOfRange(blob, pos, pos + need))
  }

  /** Pixel statistics from ACTUAL decoded pixels — the oracle-checkable
    * readout of the decode path: [[ppmBlob]] → [[decodePpm]] → exact
    * per-channel byte sums + mean BT.601 luma (integer numerator, ONE
    * IEEE division — bit-identical cross-engine). The DuckDB oracle
    * derives the same stats arithmetically from the documents' bytes, so
    * a parser that misreads the header, drops padding, or misaligns
    * channels hash-mismatches immediately.
    */
  def pixelStats(spark: SparkSession, docs: DataFrame): DataFrame =
    statsOf(spark, decodePpm(spark, ppmBlob(docs)))

  /** Pixel statistics of the RESIZED plane — the oracle-checkable readout
    * of the resize path: [[ppmBlob]] → [[decodePpm]] → [[resizeHalf]] →
    * channel sums. The DuckDB oracle recomputes every 2×2 block's
    * floor-mean arithmetically from the document bytes, so the box filter
    * itself (block geometry, odd-edge 1×2 blocks, floor division) is
    * hash-verified, not just spec-tested.
    */
  def resizeStats(spark: SparkSession, docs: DataFrame): DataFrame =
    statsOf(spark, resizeHalf(spark, decodePpm(spark, ppmBlob(docs))))

  /** Shared exact channel-sum readout: per image, per-channel byte sums
    * + mean BT.601 luma (integer numerator, ONE IEEE division —
    * bit-identical cross-engine).
    */
  private def statsOf(
      spark: SparkSession, imgs: Dataset[DecodedImage]): DataFrame = {
    import spark.implicits._
    imgs
      .map { img =>
        var (r, g, b) = (0L, 0L, 0L)
        var i = 0
        while (i < img.pixels.length) {
          val v = img.pixels(i) & 0xff
          (i % 3: @annotation.switch) match {
            case 0 => r += v
            case 1 => g += v
            case 2 => b += v
          }
          i += 1
        }
        val nPx = img.width.toLong * img.height
        (img.doc_id, img.width.toLong, img.height.toLong, nPx, r, g, b,
          (299L * r + 587L * g + 114L * b).toDouble / (1000.0 * nPx))
      }
      .toDF("doc_id", "width", "height", "n_px", "sum_r", "sum_g", "sum_b",
        "mean_luma")
  }

  /** Real 2×2 box-filter downscale on the decoded pixel plane: each output
    * channel is the floor-mean of the covered input pixels (1- or 2-wide
    * blocks at odd edges). Chains after [[decodePpm]] with no shuffle —
    * the per-row transform slot any resize/crop/augment occupies.
    */
  def resizeHalf(
      spark: SparkSession, imgs: Dataset[DecodedImage]): Dataset[DecodedImage] = {
    import spark.implicits._
    imgs.map { img =>
      val ow = (img.width + 1) / 2
      val oh = (img.height + 1) / 2
      val out = new Array[Byte](ow * oh * 3)
      for (oy <- 0 until oh; ox <- 0 until ow; c <- 0 until 3) {
        var sum = 0; var cnt = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val (x, y) = (ox * 2 + dx, oy * 2 + dy)
          if (x < img.width && y < img.height) {
            sum += img.pixels((y * img.width + x) * 3 + c) & 0xff
            cnt += 1
          }
        }
        out((oy * ow + ox) * 3 + c) = (sum / cnt).toByte
      }
      DecodedImage(img.doc_id, ow, oh, out)
    }
  }

  /** Perceptual average-hash (aHash) over the DECODED pixel plane — the
    * image twin of [[Dedup.simhash]]: downsample the raster onto an 8×8
    * grid (cell (oy, ox) collects the pixels with oy = ⌊y·8/h⌋,
    * ox = ⌊x·8/w⌋ — for h < 8 some cells are empty and their bit is 0),
    * compare each cell's mean luma to the whole image's mean, bit k =
    * oy·8+ox set iff the cell is strictly brighter. All integer ops:
    * luma is the BT.601 numerator (299r+587g+114b, never divided) and
    * the mean compare is cross-multiplied (cell_sum·n_total >
    * total_sum·n_cell), so the 64-bit fingerprint is bit-identical
    * cross-engine — the oracle re-derives it arithmetically from the
    * document bytes exactly like `mm_pixel_stats`. Chains after
    * [[decodePpm]] with no shuffle; 8 bytes per image downstream.
    */
  def aHash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    decodePpm(spark, ppmBlob(docs))
      .map { img =>
        val w = img.width; val h = img.height
        val cellSum = new Array[Long](64)
        val cellCnt = new Array[Long](64)
        var total = 0L
        var y = 0
        while (y < h) {
          val oy = y * 8 / h
          var x = 0
          while (x < w) {
            val base = (y * w + x) * 3
            val l = 299L * (img.pixels(base) & 0xff) +
              587L * (img.pixels(base + 1) & 0xff) +
              114L * (img.pixels(base + 2) & 0xff)
            val k = oy * 8 + x * 8 / w
            cellSum(k) += l; cellCnt(k) += 1; total += l
            x += 1
          }
          y += 1
        }
        val nPx = w.toLong * h
        var hash = 0L
        var k = 0
        while (k < 64) {
          if (cellSum(k) * nPx > total * cellCnt(k)) hash |= 1L << k
          k += 1
        }
        (img.doc_id, hash)
      }
      .toDF("doc_id", "phash")
  }

  /** Perceptual image near-duplicate pairs: images whose [[aHash]]
    * fingerprints are within `maxHamming` bits — image dedup at 100 TB,
    * completing decode → stats → dedup. Blocking reuses the SimHash
    * pigeonhole machinery ([[Dedup.hammingProbePairs]]) at 64-bit width:
    * four 16-bit segments × single-bit probes guarantee recall for
    * maxHamming ≤ 7 by construction; the exact bit_count(xor) verifies
    * in-bucket. Per-image work is one decode + 8 fingerprint bytes, so
    * the corpus-sized stages are exactly the SimHash ones.
    */
  def phashPairs(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame =
    Dedup.hammingProbePairs(aHash(spark, docs), "phash", nBits = 64, maxHamming)

  /** Image near-dup CLUSTERS: connected components over the [[phashPairs]]
    * graph — the keep-one decision for image dedup, mirroring
    * [[Dedup.nearDupClusters]] exactly (same min-label + pointer-halving
    * iteration, O(log diameter) rounds; singletons label themselves
    * without entering the loop). Completes the multimodal pipeline:
    * decode → stats → pairs → clusters.
    */
  def phashClusters(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame = {
    val (labels, _) = Dedup.connectedComponents(
      phashPairs(spark, docs, maxHamming).select(col("doc_a"), col("doc_b")))
    docs.select(col("doc_id"))
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .withColumn("cluster", col("doc_id"))
      .unionByName(labels)
  }

  /** Cross-modal dup linkage, image→text direction: the [[phashPairs]]
    * image-near-dup graph annotated with whether the two docs' TEXT
    * fingerprints match. `same_text = false` rows are the "same image,
    * different caption" contamination a multimodal training set must
    * catch — image dedup alone would keep one doc per image cluster and
    * silently drop caption diversity, text dedup alone never sees the
    * pair at all. doc_id is the blob↔text linkage key (blob and caption
    * live on the same document row).
    *
    * Shape at 100 TB: the pair graph is the already-blocked pigeonhole
    * output (pair-sized, never all-pairs); it joins the thin
    * (doc_id, fp) projection twice, keyed on doc ids — two hash joins
    * whose build side is the pair table, which is orders smaller than
    * the corpus.
    */
  def crossModalImageDups(spark: SparkSession, docs: DataFrame): DataFrame = {
    val fp = TextAnalysis.fingerprints(docs)
    phashPairs(spark, docs)
      .join(fp.select(col("doc_id").as("doc_a"), col("fp").as("fp_a")), "doc_a")
      .join(fp.select(col("doc_id").as("doc_b"), col("fp").as("fp_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("hamming"),
        (col("fp_a") === col("fp_b")).as("same_text"))
  }

  /** Cross-modal dup linkage, text→image direction: near-dup CAPTION
    * pairs (the MinHash candidate graph) annotated with their images'
    * aHash hamming distance and the `img_dup` verdict — "near-same text,
    * divergent image" is the inverse governance cell (e.g. one caption
    * recycled across unrelated images). Same pair-sized join shape as
    * [[crossModalImageDups]], against the (doc_id, phash) projection.
    */
  def crossModalTextDups(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame = {
    val h = aHash(spark, docs)
    val ham = bit_count(col("pa").bitwiseXOR(col("pb"))).cast("long")
    Dedup.minhashCandidatePairs(docs)
      .join(h.select(col("doc_id").as("doc_a"), col("phash").as("pa")), "doc_a")
      .join(h.select(col("doc_id").as("doc_b"), col("phash").as("pb")), "doc_b")
      .select(col("doc_a"), col("doc_b"), ham.as("hamming"),
        (ham <= maxHamming).as("img_dup"))
  }

  /** Audio feature extraction — the PCM twin of the image decode path:
    * the blob is interpreted as signed 16-bit little-endian mono PCM
    * (the WAV data-chunk layout; a trailing odd byte is not a sample and
    * drops), and the classic scan-side features come out as EXACT
    * integers: sample count, total energy (Σ v² — the loudness readout),
    * zero crossings (adjacent-sample sign flips — the crude pitch/noise
    * discriminator), and peak amplitude. Runs in the same
    * `mapPartitions` iterator slot as [[decodePpm]] (the batch shape any
    * codec occupies); per-row work is linear in the blob, no shuffle,
    * and the oracle re-derives every feature arithmetically from the
    * document bytes — decode and features are hash-verified.
    */
  def audioFeatures(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withBlob(docs).select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val n = blob.length / 2
          var energy = 0L
          var crossings = 0L
          var peak = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = ((blob(2 * i) & 0xff) | (blob(2 * i + 1) << 8)).toShort.toInt
            energy += v.toLong * v
            if (i > 0 && (prev < 0 && v > 0 || prev > 0 && v < 0)) crossings += 1
            if (math.abs(v.toLong) > peak) peak = math.abs(v.toLong)
            prev = v
            i += 1
          }
          (id, n.toLong, energy, crossings, peak)
        }
      }
      .toDF("doc_id", "n_samples", "energy", "n_zero_cross", "peak")
  }

  /** Chromaprint-shaped audio envelope fingerprint: the PCM stream is
    * cut into 65 equal frames (frame of sample i = ⌊i·65/n⌋), each
    * frame's exact integer energy Σv² is computed, and bit j of the
    * 64-bit fingerprint is 1 iff energy(j) > energy(j+1) — the energy
    * DESCENT pattern, which is amplitude-scale-free in shape and the
    * public acoustic-fingerprint idea (Chromaprint/AcoustID's
    * band-energy-difference bits) reduced to one band. Decode shares
    * the 16-bit-LE-PCM `mapPartitions` codec slot with
    * [[audioFeatures]]; output is (doc_id, afp).
    */
  def audioEnvelopeHash(spark: SparkSession, docs: DataFrame): DataFrame = {
    import spark.implicits._
    withBlob(docs).select(col("doc_id").cast("long"), col("blob"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, blob) =>
          val n = blob.length / 2
          val e = new Array[Long](65)
          var i = 0
          while (i < n) {
            val v = ((blob(2 * i) & 0xff) | (blob(2 * i + 1) << 8)).toShort.toLong
            e(((i.toLong * 65) / n).toInt) += v * v
            i += 1
          }
          var fp = 0L
          var j = 0
          while (j < 64) {
            if (e(j) > e(j + 1)) fp |= (1L << j)
            j += 1
          }
          (id, fp)
        }
      }
      .toDF("doc_id", "afp")
  }

  /** Audio near-duplicate pairs over the [[audioEnvelopeHash]]
    * fingerprints — the audio member of the near-dup family (text
    * SimHash, image aHash, audio envelope hash now all share
    * [[Dedup.hammingProbePairs]]'s pigeonhole blocker: four 16-bit
    * segments × single-bit probes, perfect recall for hamming ≤ 7,
    * exact bit_count verify in-bucket, never all-pairs).
    */
  def audioHashPairs(
      spark: SparkSession, docs: DataFrame, maxHamming: Int = 7): DataFrame =
    Dedup.hammingProbePairs(audioEnvelopeHash(spark, docs), "afp",
      nBits = 64, maxHamming)

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

  /** Sampled-frame fingerprints for video-like payloads: the
    * [[frameSample]] cut, each kept frame keyed by a 60-bit fingerprint
    * (md5 of the frame's hex image through the conv idiom — bit-exact
    * arithmetic any engine can replay). Scan-side: one input row →
    * samples rows, no shuffle.
    */
  def videoFrameFps(
      docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    withBlob(docs).select(
      col("doc_id"),
      posexplode(expr(
        s"""filter(
              transform(
                sequence(0, cast(floor((meta.n_bytes - 1) / $frameBytes) as int)),
                i -> struct(i as idx, substring(blob, i * $frameBytes + 1, $frameBytes) as frame)),
              f -> f.idx % $stride = 0)""")))
      .select(col("doc_id"),
        expr("cast(conv(substring(md5(cast(hex(col.frame) as binary)), 1, 15)" +
          ", 16, 10) as bigint)").as("fp"))

  /** Video-container near-dup: two payloads are near-duplicates when
    * their sampled-frame fingerprint SETS overlap by at least
    * `minContainBp` of the smaller side's frame count — the
    * frame-fingerprint posting-index design production video dedup uses
    * (trims, re-containered copies, and prefix-added variants all keep
    * most sampled frames bit-identical; integer containment in basis
    * points keeps the verdict engine-exact). The fourth modality of the
    * near-dup family: text SimHash, image aHash, audio envelope hash are
    * hamming-blocked; video blocks on EXACT frame identity, so the
    * blocker is the [[Dedup]] inverted-index shape rather than the
    * pigeonhole probe.
    *
    * Scale: the same DF-capped posting-list discipline as n-gram dedup —
    * a frame shared by more than `maxDf` payloads (a branded intro card,
    * a black frame) carries no pairing signal and would explode d(d-1)/2
    * pairs, so it is blocked out BEFORE the posting aggregation, which
    * bounds every collect_list buffer at maxDf. Frame counts `nf` are
    * taken over the FULL distinct frame set (one window keyed by
    * high-cardinality doc_id), so the containment denominator stays
    * exact; only the intersection ignores capped frames (a lower bound
    * for pairs sharing them) — the n-gram cap's documented trade.
    */
  def videoNearDupPairs(
      docs: DataFrame, minContainBp: Long = 5000L, maxDf: Int = 64,
      frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    val u = videoFrameFps(docs, frameBytes, stride).distinct()
    val hot = u.groupBy(col("fp"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") > maxDf)
      .select(col("fp"))
    val withN = u
      .withColumn("nf", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("doc_id"))))
      .join(broadcast(hot), Seq("fp"), "left_anti")
    withN.groupBy(col("fp"))
      .agg(sort_array(collect_list(struct(col("doc_id"), col("nf")))).as("ids"))
      .filter(size(col("ids")) > 1)
      .select(explode(expr(
        """flatten(transform(sequence(0, size(ids) - 2), i ->
             transform(sequence(i + 1, size(ids) - 1), j ->
               struct(ids[i].doc_id AS doc_a, ids[j].doc_id AS doc_b,
                      ids[i].nf AS nf_a, ids[j].nf AS nf_b))))""")).as("p"))
      .groupBy(col("p.doc_a").as("doc_a"), col("p.doc_b").as("doc_b"),
        col("p.nf_a").as("nf_a"), col("p.nf_b").as("nf_b"))
      .agg(count(lit(1)).as("shared_frames"))
      .withColumn("containment_bp",
        expr("(10000 * shared_frames) DIV least(nf_a, nf_b)"))
      .where(col("containment_bp") >= minContainBp)
      .select("doc_a", "doc_b", "shared_frames", "nf_a", "nf_b",
        "containment_bp")
  }
}
