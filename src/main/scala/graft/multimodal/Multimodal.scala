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
        // per-partition codec init would go here
        it.map { case (id, bytes) =>
          val (w, h) = FakeCodec.decodeDims(bytes)
          val md = java.security.MessageDigest.getInstance("SHA-256")
          val checksum = md.digest(bytes).map("%02x".format(_)).mkString
          AssetMeta(id, bytes.length.toLong, checksum, w, h,
            if (bytes.length % 2 == 0) "image" else "audio")
        }
      }
  }
}
