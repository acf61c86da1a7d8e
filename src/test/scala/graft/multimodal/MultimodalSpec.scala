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

  test("ragged tail frame is truncated, not padded") {
    val df = Multimodal.withBinaryMeta(Seq((7L, "a" * 25)).toDF("doc_id", "text"), "text")
    val frames = Multimodal.sampleFrames(df, stride = 10, frameSize = 10)
      .collect().sortBy(_.frame_idx)
    assert(frames.map(_.n_bytes).toSeq === Seq(10, 10, 5))
  }
}
