package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with typed metadata, plus batch-shaped feature extraction.
  *
  * The real decode step (JPEG→pixels, PCM→spectrogram) is STUBBED —
  * the codecs aren't in this container — behind
  * [[FakeCodec.decodeDims]], a deterministic fake. Everything
  * Spark-side is real and tested: the binary schema, the metadata
  * derivation as codegen'd expressions, partition-batch processing via
  * `mapPartitions` (the Scala analog of `mapInPandas`: one iterator
  * per partition ≈ one Arrow batch), and the partitioning story
  * (binary blobs never shuffle — metadata extraction happens at scan,
  * only small typed columns move).
  */
object Multimodal {

  /** Typed metadata row for an asset (what a real decoder would emit). */
  final case class AssetMeta(
      doc_id: Long, byte_len: Long, checksum: String,
      width: Int, height: Int, kind: String)

  /** Deterministic stand-in for the media codec (STUB — see header). */
  object FakeCodec {
    /** "Decode" dimensions from content bytes: md5-derived, stable. */
    def decodeDims(bytes: Array[Byte]): (Int, Int) = {
      val h = java.security.MessageDigest.getInstance("MD5").digest(bytes)
      val w = 160 + (((h(0) & 0xff) << 8 | (h(1) & 0xff)) % 481) // 160..640
      val ht = 120 + (((h(2) & 0xff) << 8 | (h(3) & 0xff)) % 361) // 120..480
      (w, ht)
    }
  }

  /** Attach a binary payload column (here synthesized from text; in a
    * real pipeline this is the raw image/audio bytes column read from
    * parquet). */
  def withBinaryPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", encode(col("text"), "UTF-8"))

  /** Scan-stage metadata: pure Column expressions — no decode, no
    * shuffle, runs at parquet scan speed. */
  def scanMetadata(withPayload: DataFrame): DataFrame =
    withPayload.select(
      col("doc_id"),
      octet_length(col("payload")).cast("long").as("byte_len"),
      sha2(col("payload"), 256).as("checksum"),
      substring(sha2(col("payload"), 256), 1, 2).as("shard_key"))

  /** Batch feature extraction via mapPartitions — the decode-requiring
    * path. Iterator-per-partition keeps the codec initialized once per
    * partition (the point of mapInPandas batching). */
  def extractFeatures(spark: SparkSession, withPayload: DataFrame): Dataset[AssetMeta] = {
    import spark.implicits._
    withPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition codec init would go here (one digest per
        // partition for the same reason — see md5OfHex)
        val md = java.security.MessageDigest.getInstance("SHA-256")
        it.map { case (id, bytes) =>
          val (w, h) = FakeCodec.decodeDims(bytes)
          md.reset()
          val checksum = hexString(md.digest(bytes))
          AssetMeta(id, bytes.length.toLong, checksum, w, h,
            if (bytes.length % 2 == 0) "image" else "audio")
        }
      }
  }

  private val hexDigits = "0123456789abcdef".toCharArray

  /** Lowercase hex of `bytes[from, until)` as US-ASCII bytes, table-
    * driven. This is the hot inner loop of the slice-checksum
    * contract: `"%02x".format` per byte allocates a locale-aware
    * Formatter per call — measured ~10× the cost of the hash itself
    * across a frame-sampled corpus — and `bytes.slice` would copy the
    * frame a second time; indexing [from, until) avoids both. */
  private def hexAscii(bytes: Array[Byte], from: Int, until: Int): Array[Byte] = {
    val out = new Array[Byte]((until - from) * 2)
    var i = from; var j = 0
    while (i < until) {
      val b = bytes(i) & 0xff
      out(j) = hexDigits(b >> 4).toByte
      out(j + 1) = hexDigits(b & 0xf).toByte
      i += 1; j += 2
    }
    out
  }

  private def hexString(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(2 * i) = hexDigits(b >> 4)
      out(2 * i + 1) = hexDigits(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Slice-checksum contract shared with the x17/x18 DuckDB oracles:
    * md5 over the ASCII bytes of the LOWERCASE HEX rendering of the
    * slice. DuckDB's `md5` accepts only VARCHAR, so hashing the hex
    * string — `md5(lower(substr(hex(payload), 2*off+1, 2*len)))` on
    * the oracle side — is the byte-exact contract BOTH engines can
    * compute for any payload: no ASCII or valid-UTF-8 assumption on
    * the slice boundaries (a frame cut through a multi-byte char
    * still hashes identically). Equally injective in the bytes, so a
    * wrong slice offset still fails the hash compare. Callers pass a
    * per-partition MessageDigest (one init per partition, the codec-
    * batching shape) — `reset` + table-driven hex keep the per-frame
    * cost at the hash itself. */
  private def md5OfHex(md: java.security.MessageDigest,
      bytes: Array[Byte], from: Int, until: Int): String = {
    md.reset()
    hexString(md.digest(hexAscii(bytes, from, until)))
  }

  /** Thumbnail row emitted by the stubbed resizer. */
  final case class Thumb(
      doc_id: Long, width: Int, height: Int, thumb_w: Int, thumb_h: Int,
      thumb_len: Long, thumb_checksum: String)

  /** STUB resize: a real pipeline decodes pixels and downscales; the
    * deterministic fake derives source dims from [[FakeCodec]] and
    * "renders" the thumbnail as the payload's first `maxBytes` bytes
    * (quarter dims, floor, min 1). The Spark-side shape is the real
    * one: narrow mapPartitions over (id, binary) — blobs never
    * shuffle, one codec init per partition, small typed rows out. */
  def resize(spark: SparkSession, withPayload: DataFrame,
      maxBytes: Int = 256): Dataset[Thumb] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          val (w, h) = FakeCodec.decodeDims(bytes)
          val tbLen = math.min(bytes.length, maxBytes)
          Thumb(id, w, h, math.max(1, w / 4), math.max(1, h / 4),
            tbLen.toLong, md5OfHex(md, bytes, 0, tbLen))
        }
      }
  }

  /** Energy-trim summary for one (fake) audio payload. */
  final case class TrimmedAudio(
      doc_id: Long, n_frames: Int, n_kept: Int, energy_total: Long,
      kept_checksum: String)

  /** STUB audio silence trim (VAD analog): the payload is read as
    * fixed-`frameLen`-byte frames (the x18 accounting); a frame's
    * "energy" is its raw byte sum, and frames below `threshold` are
    * trimmed — exactly what a real voice-activity detector does to
    * leading/trailing silence and dead air before ASR or audio
    * tokenization, with byte-sum standing in for RMS on decoded PCM
    * (the codec isn't in this container; swap the energy fn, keep the
    * plan). Emits per-asset frame counts, total energy (exact
    * integer), and the md5-of-hex checksum over the KEPT frames
    * concatenated in order — the x17/x18 slice-checksum contract, so
    * the oracle proves byte-exactly which frames survived. Row-local
    * mapPartitions, one digest per partition; docs with no full frame
    * drop out (x18's inner semantics). */
  def energyTrim(spark: SparkSession, withPayload: DataFrame,
      frameLen: Int = 32, threshold: Int = 3000): Dataset[TrimmedAudio] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameLen
          if (nFrames == 0) Iterator.empty
          else {
            var total = 0L
            var kept = 0
            md.reset()
            var f = 0
            while (f < nFrames) {
              var e = 0L
              var i = f * frameLen
              while (i < (f + 1) * frameLen) { e += bytes(i) & 0xff; i += 1 }
              total += e
              if (e >= threshold) {
                kept += 1
                md.update(hexAscii(bytes, f * frameLen, (f + 1) * frameLen))
              }
              f += 1
            }
            Iterator.single(
              TrimmedAudio(id, nFrames, kept, total, hexString(md.digest())))
          }
        }
      }
  }

  /** 64-bit perceptual hash row. */
  final case class DHash(doc_id: Long, dhash: Long)

  /** 64-bit difference hash (dHash — Krawetz's gradient hash, the
    * standard cheap perceptual image fingerprint): downscale to a
    * 9×8 grayscale, then bit i·8+j = [px(i,j) > px(i,j+1)] — each bit
    * records a horizontal luminance gradient, which survives rescale/
    * recompress in a real decoder.
    *
    * The DECODE is the stubbed part (this container has no image
    * codecs, per the [[FakeCodec]] contract): the 9×8 grayscale here
    * is derived deterministically from the payload — row i's nine
    * pixels are the first nine bytes of md5(payload ∥ ":" ∥ i) — so
    * both engines can rebuild it byte-exactly (the x17 md5-nibble
    * oracle precedent). Consequence worth stating: md5 is avalanche,
    * so on the fake pixels only EXACT payload copies land within a
    * small Hamming radius; with a real decoder, near-identical images
    * (resized, re-encoded) differ in a few gradient bits and the SAME
    * downstream banding catches them. The Spark-side shape is the
    * real one either way: row-local mapPartitions (one digest init
    * per partition, the codec-batch shape), 8 bytes out per asset,
    * blobs never shuffle.
    *
    * Bit assembly matches the simhash64 convention: bits 0..62 OR
    * positively, bit 63 lands the long's sign bit — the same signed
    * value the oracle's two's-complement assembly builds. */
  def dHash64(spark: SparkSession, withPayload: DataFrame): Dataset[DHash] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.map { case (id, bytes) =>
          var h = 0L
          var i = 0
          while (i < 8) {
            md.reset()
            md.update(bytes)
            md.update(s":$i".getBytes("US-ASCII"))
            val row = md.digest()
            var j = 0
            while (j < 8) {
              if ((row(j) & 0xff) > (row(j + 1) & 0xff))
                h |= 1L << (i * 8 + j)
              j += 1
            }
            i += 1
          }
          DHash(id, h)
        }
      }
  }

  /** (doc_id, band, key) rows for a dHash table: 4 × 16-bit bands,
    * the simhash64 blocking convention — pigeonhole-lossless for
    * Hamming ≤ 3. */
  private def dhashBands(sigs: DataFrame): DataFrame = {
    val mask = (1L << 16) - 1
    sigs.select(col("doc_id"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("dhash"), b * 16).bitwiseAND(mask).as("key"))): _*))
        .as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"),
        col("bk.key").as("key"))
  }

  /** Persist a dHash store for incremental image near-dup checks —
    * the image-side twin of
    * [[graft.dedup.NearDup.saveSignatureStore]]: `path/bands` is the
    * banded candidate index (the ONLY table a new batch's probe
    * touches), `path/sigs` the 8-byte signatures for exact Hamming
    * verification on the colliding sliver. At 100 TB of assets the
    * corpus hashes are computed once at ingest; a daily batch pays
    * its own dHashes (row-local), a key-sized band join, and the
    * Hamming check on candidates — never a corpus rescan. */
  def saveDHashStore(spark: SparkSession, withPayload: DataFrame,
      path: String): Unit = {
    val sigs = dHash64(spark, withPayload).toDF()
    dhashBands(sigs).write.mode("overwrite").parquet(s"$path/bands")
    sigs.write.mode("overwrite").parquet(s"$path/sigs")
  }

  /** One micro-batch's image near-dup pairs against a persisted
    * [[saveDHashStore]]: (new_id, old_id, hamming ≤ maxHamming).
    * Blocking is lossless for maxHamming ≤ 3 (4 bands, pigeonhole),
    * so the result is bit-identical to the full cross-check the
    * oracle computes. */
  def incrementalDHashPairs(spark: SparkSession, storePath: String,
      batchWithPayload: DataFrame, maxHamming: Int = 3): DataFrame = {
    val bsigs = dHash64(spark, batchWithPayload).toDF()
    val sbands = spark.read.parquet(s"$storePath/bands")
      .withColumnRenamed("doc_id", "old_id")
    val ssigs = spark.read.parquet(s"$storePath/sigs")
      .select(col("doc_id").as("old_id"), col("dhash").as("old_dhash"))
    dhashBands(bsigs).withColumnRenamed("doc_id", "new_id")
      .join(sbands, Seq("band", "key"))
      .select(col("new_id"), col("old_id")).dropDuplicates()
      .join(bsigs.select(col("doc_id").as("new_id"), col("dhash")),
        Seq("new_id"))
      .join(ssigs, Seq("old_id"))
      .withColumn("hamming",
        bit_count(col("dhash").bitwiseXOR(col("old_dhash"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select(col("new_id"), col("old_id"), col("hamming"))
  }

  /** Batch-admission filter: drop every asset with a near-dup already
    * in the store, everything else rides through untouched — the
    * image twin of [[graft.streaming.DocStream.admitNearDups]], wired
    * through `foreachBatch` in a stream for the same reason (the
    * candidate pair table is not expressible in the stateless
    * streaming operator set; the batch-refreshed store IS the
    * state). */
  def admitImageDups(spark: SparkSession, batchWithPayload: DataFrame,
      storePath: String, maxHamming: Int = 3): DataFrame =
    batchWithPayload.join(
      incrementalDHashPairs(spark, storePath, batchWithPayload, maxHamming)
        .select(col("new_id").as("doc_id")).distinct(),
      Seq("doc_id"), "left_anti")

  /** One sampled frame of a (fake) video payload. */
  final case class Frame(doc_id: Long, frame_no: Int, frame_checksum: String)

  /** STUB frame sampler: treats the payload as fixed-`frameLen`-byte
    * frames and emits every `stride`-th FULL frame with its checksum —
    * the iterator-flatMap batch shape of a generator UDF (one input
    * row → n output rows, no shuffle until the caller aggregates).
    * A real sampler would swap the slice+md5 for a codec call; the
    * row accounting (floor(len/frameLen) frames, stride sampling)
    * is the part that must be right at 100 TB. */
  def frameSample(spark: SparkSession, withPayload: DataFrame,
      frameLen: Int = 32, stride: Int = 2): Dataset[Frame] = {
    import spark.implicits._
    withPayload.select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        it.flatMap { case (id, bytes) =>
          val nFrames = bytes.length / frameLen
          (0 until nFrames by stride).iterator.map { f =>
            Frame(id, f, md5OfHex(md, bytes, f * frameLen, (f + 1) * frameLen))
          }
        }
      }
  }
}
