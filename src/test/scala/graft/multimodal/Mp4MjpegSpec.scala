package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

class Mp4MjpegSpec extends AnyFunSuite {

  private def jpeg(seed: Long, w: Int = 8, h: Int = 8): Array[Byte] = {
    val rgb = new Array[Int](w * h)
    var x = seed
    for (i <- rgb.indices) {
      x = x * 6364136223846793005L + 1442695040888963407L
      rgb(i) = ((x >>> 40) & 0xFFFFFF).toInt
    }
    Multimodal.encodeJpeg(w, h, rgb)
  }

  test("round-trip: encode then atom-walk demux returns the exact frame bytes") {
    val frames = Seq(jpeg(1), jpeg(2), jpeg(3), jpeg(4))
    val mp4 = Mp4Mjpeg.encode(frames, 8, 8)
    assert(Mp4Mjpeg.isMp4(mp4))
    assert(!AviMjpeg.isAvi(mp4))
    val got = Mp4Mjpeg.decodeFrames(mp4)
    assert(got.length === 4)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
    // every demuxed frame decodes through the sniffing ImageIO path
    got.foreach(f => Multimodal.decodePng(f))
  }

  test("grammar violations fail fast with a reason") {
    val mp4 = Mp4Mjpeg.encode(Seq(jpeg(1), jpeg(2)), 8, 8)
    // truncation inside moov
    val trunc = mp4.take(40)
    val e1 = intercept[IllegalArgumentException] { Mp4Mjpeg.decodeFrames(trunc) }
    assert(e1.getMessage.contains("enclosure") || e1.getMessage.contains("truncated"),
      e1.getMessage)
    // not MP4 at all
    val e2 = intercept[IllegalArgumentException] {
      Mp4Mjpeg.decodeFrames(Array.fill[Byte](32)(7))
    }
    assert(e2.getMessage.contains("ftyp"))
    // a sample running past the file: cut into the trailing mdat
    val cutMdat = mp4.take(mp4.length - 10)
    val e3 = intercept[IllegalArgumentException] { Mp4Mjpeg.decodeFrames(cutMdat) }
    assert(e3.getMessage.nonEmpty)
  }

  private def fourccIndex(bytes: Array[Byte], fourcc: String): Int = {
    val needle = fourcc.getBytes("US-ASCII")
    bytes.indices.find(i => i + 4 <= bytes.length &&
      needle.indices.forall(k => bytes(i + k) == needle(k))).get
  }
  private def patchBe32(bytes: Array[Byte], at: Int, v: Int): Unit = {
    bytes(at) = ((v >> 24) & 0xFF).toByte; bytes(at + 1) = ((v >> 16) & 0xFF).toByte
    bytes(at + 2) = ((v >> 8) & 0xFF).toByte; bytes(at + 3) = (v & 0xFF).toByte
  }

  test("a corrupt fixed-size stsz with a 2^31-scale count fails fast, not OOM") {
    val mp4 = Mp4Mjpeg.encode(Seq(jpeg(1), jpeg(2)), 8, 8)
    // stsz payload layout after the fourcc: version+flags(4) fixed(4) count(4)
    val i = fourccIndex(mp4, "stsz")
    val patched = mp4.clone()
    patchBe32(patched, i + 8, 1)          // fixed sample size = 1 byte
    patchBe32(patched, i + 12, 0x7FFFF000) // count ~= 2^31: a multi-GB lie
    val e = intercept[IllegalArgumentException] { Mp4Mjpeg.decodeFrames(patched) }
    assert(e.getMessage.contains("stsz") && e.getMessage.contains("2147479552"),
      e.getMessage)
  }

  test("a second video track never overwrites the first track's sample table") {
    val frames = Seq(jpeg(11), jpeg(12))
    val mp4 = Mp4Mjpeg.encode(frames, 8, 8)
    // Splice a SECOND moov (same structure, stsz patched to fixed-size-1
    // samples) after mdat: pre-freeze, its stsz/stco/stsc would overwrite
    // track 1's geometry and slice 1-byte garbage frames.
    val moovStart = fourccIndex(mp4, "moov") - 4
    val moovSize = java.nio.ByteBuffer.wrap(mp4, moovStart, 4).getInt
    val moov2 = java.util.Arrays.copyOfRange(mp4, moovStart, moovStart + moovSize)
    patchBe32(moov2, fourccIndex(moov2, "stsz") + 8, 1) // fixed = 1 byte
    val spliced = mp4 ++ moov2
    val got = Mp4Mjpeg.decodeFrames(spliced)
    assert(got.length === 2)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("the H.264 seam: a non-JPEG codec fails fast NAMING the codec") {
    val mp4 = Mp4Mjpeg.encode(Seq(jpeg(5)), 8, 8)
    // patch the stsd sample-entry fourcc 'jpeg' -> 'avc1' in place
    val needle = "jpeg".getBytes("US-ASCII")
    val idx = mp4.indices.find(i => i + 4 <= mp4.length &&
      needle.indices.forall(k => mp4(i + k) == needle(k))).get
    val patched = mp4.clone()
    "avc1".getBytes("US-ASCII").zipWithIndex.foreach { case (b, k) => patched(idx + k) = b }
    val e = intercept[IllegalArgumentException] { Mp4Mjpeg.decodeFrames(patched) }
    assert(e.getMessage.contains("avc1") && e.getMessage.contains("no JDK decoder"),
      e.getMessage)
  }

  test("splitClipFrames routes MP4 payloads to the atom demuxer") {
    val frames = Seq(jpeg(9), jpeg(10))
    val viaSplit = Multimodal.splitClipFrames(Mp4Mjpeg.encode(frames, 8, 8))
    assert(viaSplit.length === 2)
    viaSplit.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }

  test("stsc with multi-sample chunks demuxes correctly (the general mapping)") {
    // hand-build a file whose stsc packs samples 2-per-chunk: re-encode,
    // then verify the demuxer's stsc expansion walks chunk-local offsets.
    // The writer emits 1-per-chunk; emulate 2-per-chunk by editing stsc
    // and halving stco to every other offset.
    val frames = Seq(jpeg(21), jpeg(22), jpeg(23), jpeg(24))
    val mp4 = Mp4Mjpeg.encode(frames, 8, 8)
    // locate boxes by fourcc scan (test-only convenience)
    def find(tag: String): Int = {
      val t = tag.getBytes("US-ASCII")
      mp4.indices.find(i => i + 4 <= mp4.length &&
        t.indices.forall(k => mp4(i + k) == t(k))).get
    }
    val bb = java.nio.ByteBuffer.wrap(mp4)
    val stscAt = find("stsc") - 4 // box start
    val stcoAt = find("stco") - 4
    // stsc payload: ver(4) count(4) then (first, spc, sdi): set spc = 2
    val patched = mp4.clone()
    val pb = java.nio.ByteBuffer.wrap(patched)
    pb.putInt(stscAt + 8 + 8 + 4, 2) // samples_per_chunk = 2
    // stco: keep offsets of chunks 1 and 3 only (now 2 chunks of 2)
    val o1 = bb.getInt(stcoAt + 8 + 8)
    val o3 = bb.getInt(stcoAt + 8 + 8 + 8)
    pb.putInt(stcoAt + 8 + 4, 2)  // entry count = 2
    pb.putInt(stcoAt + 8 + 8, o1)
    pb.putInt(stcoAt + 8 + 12, o3)
    val got = Mp4Mjpeg.decodeFrames(patched)
    assert(got.length === 4)
    got.zip(frames).foreach { case (a, b) => assert(a.toSeq === b.toSeq) }
  }
}
