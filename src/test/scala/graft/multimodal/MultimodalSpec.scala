package graft.multimodal

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("binary metadata: byte length and content hash over the payload") {
    val df = Multimodal.withBinaryMeta(Seq((1L, "abc")).toDF("doc_id", "text"), "text")
    val r = df.select("n_bytes", "content_sha").head()
    assert(r.getLong(0) === 3L)
    assert(r.getString(1) ===
      "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad") // sha256("abc")
  }

  test("frame sampling: stride/frameSize arithmetic and deterministic features") {
    // payload of 100 bytes, stride 40, frame 10 -> frames at 0, 40, 80
    val payload = ("x" * 100)
    val df = Multimodal.withBinaryMeta(Seq((7L, payload)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, stride = 40, frameSize = 10)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.frame_idx).toSeq === Seq(0, 1, 2))
    assert(frames.forall(_.n_bytes === 10))
    assert(frames.forall(_.mean_byte === 'x'.toInt.toDouble))
  }

  test("resize stub decimates payloads deterministically") {
    val df = Multimodal.withBinaryMeta(
      Seq((1L, "abcdefghij"), (2L, "xy")).toDF("doc_id", "text"), "text")
    val out = Multimodal.resizeAll(df, factor = 3)
      .select("doc_id", "n_bytes_resized").as[(Long, Int)].collect().sortBy(_._1)
    assert(out === Seq((1L, 4), (2L, 1))) // a,d,g,j and x
  }

  test("syntheticMedia emits genuine PNG-signed binary and frames it end-to-end") {
    val media = Multimodal.syntheticMedia(Seq(1L, 2L).toDF("doc_id"), "doc_id", nBytes = 120)
    val rows = media.as[(Long, Array[Byte])].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq === Seq(1L, 2L))
    rows.foreach { case (_, payload) =>
      assert(payload.length === 128)
      assert(payload.take(8).toSeq === Multimodal.PngSignature.toSeq)
      // genuine binary: bytes outside printable/UTF-8-text range appear
      assert(payload.exists(b => (b & 0xFF) > 0x7F))
    }
    // same seed -> same bytes (stable across runs and partitionings)
    val again = Multimodal.syntheticMedia(Seq(1L).toDF("doc_id"), "doc_id", nBytes = 120)
      .as[(Long, Array[Byte])].head()._2
    assert(again.toSeq === rows.head._2.toSeq)
    // frame sampling over the real bytes: 128/32 = 4 frames, means in range
    val frames = Multimodal.sampleFrames(media, stride = 32, frameSize = 32).collect()
    assert(frames.count(_.doc_id == 1L) === 4)
    assert(frames.forall(f => f.mean_byte >= 0.0 && f.mean_byte <= 255.0))
  }

  test("ragged tail frame is truncated, not padded") {
    val df = Multimodal.withBinaryMeta(Seq((7L, "a" * 25)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, stride = 10, frameSize = 10)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.n_bytes).toSeq === Seq(10, 10, 5))
  }
}
