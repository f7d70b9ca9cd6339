package graft

import org.apache.spark.sql.functions._
import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val media = Seq(
    (1L, "abcdefgh".getBytes("UTF-8")),
    (2L, ("x" * 300).getBytes("UTF-8")),
    (3L, null.asInstanceOf[Array[Byte]])
  ).toDF("id", "payload")

  test("withMediaMeta attaches typed struct without decoding") {
    val m = Multimodal.withMediaMeta(media, "payload", "image", "png")
    val r = m.filter($"id" === 2L).select("media_meta.*").first()
    assert(r.getAs[String]("media_type") == "image")
    assert(r.getAs[Long]("n_bytes") == 300L)
    assert(r.getAs[String]("checksum").length == 32)
    // null payload -> null bytes/checksum, no crash
    val n = m.filter($"id" === 3L).select("media_meta.*").first()
    assert(n.isNullAt(n.fieldIndex("n_bytes")))
  }

  test("decodeFeatures appends declared schema; nulls pass through") {
    val out = Multimodal.decodeFeatures(media, "payload")
    assert(out.columns.takeRight(4).toSeq == Seq("width", "height", "n_frames", "feature"))
    val r = out.filter($"id" === 1L).first()
    assert(r.getAs[Int]("width") == 16 + 8)
    val feat = r.getSeq[Float](r.fieldIndex("feature"))
    assert(feat.length == 8)
    // deterministic stub: 'a' = 97
    assert(math.abs(feat.head - 97 / 255.0f) < 1e-6)
    val n = out.filter($"id" === 3L).first()
    assert(n.isNullAt(n.fieldIndex("feature")))
  }

  test("sampleFrames fans out frame plans without decoding") {
    val out = Multimodal.sampleFrames(media.filter($"id" === 2L), "payload",
      frameBytes = 100, stride = 2)
    val frames = out.select("frame_no", "frame_start", "frame_bytes")
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(frames.toSeq == Seq((0, 0L, 100L), (2, 200L, 100L)))
  }

  test("chunkPayload splits and is reassemblable") {
    val out = Multimodal.chunkPayload(media.filter($"id" === 2L), "id", "payload", 128)
    val chunks = out.orderBy("chunk_no").collect()
      .map(_.getAs[Array[Byte]]("chunk"))
    assert(chunks.length == 3)
    assert(chunks.map(_.length).toSeq == Seq(128, 128, 44))
    assert(new String(chunks.flatten, "UTF-8") == "x" * 300)
  }
}
