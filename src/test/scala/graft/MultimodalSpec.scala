package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.Tables
import graft.multimodal.Multimodal

/** Multimodal plumbing: stubbed decode/resize/frame-sample over the
  * binary payload column (schema, batch shape, row accounting). */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  val sf = TestSpark.sf

  private lazy val withPayload =
    Multimodal.withBinaryPayload(Tables.documents(spark, sf))

  test("resize emits one thumb per asset with quarter dims in codec range") {
    val docs = withPayload.count()
    val thumbs = Multimodal.resize(spark, withPayload).collect()
    assert(thumbs.length == docs)
    thumbs.foreach { t =>
      assert(t.width >= 160 && t.width <= 640, t)
      assert(t.height >= 120 && t.height <= 480, t)
      assert(t.thumb_w == math.max(1, t.width / 4), t)
      assert(t.thumb_h == math.max(1, t.height / 4), t)
      assert(t.thumb_len <= 256 && t.thumb_checksum.length == 32, t)
    }
  }

  test("frame sampler emits every stride-th full frame") {
    // per doc: floor(len/32) frames, strided by 2 → ceil(n/2) sampled
    val perDoc = withPayload
      .select(col("doc_id"), (octet_length(col("payload")) / 32).cast("int").as("n"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1) + 1) / 2).toMap
    val frames = Multimodal.frameSample(spark, withPayload).collect()
    val byDoc = frames.groupBy(_.doc_id).view.mapValues(_.length).toMap
    perDoc.filter(_._2 > 0).foreach { case (id, n) =>
      assert(byDoc.getOrElse(id, 0) == n, s"doc $id")
    }
    assert(frames.forall(f => f.frame_no % 2 == 0 && f.frame_checksum.length == 32))
    // deterministic: same input → same checksums
    val again = Multimodal.frameSample(spark, withPayload).collect()
    assert(frames.map(f => (f.doc_id, f.frame_no, f.frame_checksum)).toSet ==
      again.map(f => (f.doc_id, f.frame_no, f.frame_checksum)).toSet)
  }

  test("documents fixture is pure ASCII (x17/x18 oracle assumption)") {
    // the x17/x18 DuckDB oracles slice text by CHARACTER position while
    // the Spark side slices the UTF-8 payload by BYTE; they agree only
    // while char length == byte length. If the fixture ever grows
    // non-ASCII text this must fail loudly instead of the hash check
    // silently drifting.
    val nonAscii = graft.core.Tables.documents(spark, TestSpark.sf)
      .filter(length(col("text")) =!= octet_length(col("text").cast("binary")))
      .count()
    assert(nonAscii == 0,
      s"$nonAscii documents contain non-ASCII text; x17/x18 oracles " +
        "must switch to byte-based slicing (encode(text))")
  }
}
