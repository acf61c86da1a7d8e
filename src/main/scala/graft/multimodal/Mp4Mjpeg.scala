package graft.multimodal

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** A REAL MP4 (ISO base media file format) container for JPEG video
  * (round 10 — completes the container axis where [[AviMjpeg]] landed:
  * real crawls are MP4): a spec-conformant writer emitting
  * `ftyp moov(mvhd trak(tkhd mdia(mdhd hdlr minf(vmhd dinf
  * stbl(stsd stts stsc stsz stco))))) mdat`, and an atom-walking demuxer
  * that recovers the sample stream through the REAL sample-table
  * machinery: stsd names the codec, stsz the sample sizes, stsc the
  * sample→chunk mapping, stco the chunk file offsets — the walk any
  * standard demuxer performs. Boxes are big-endian [size type payload];
  * size==1 (64-bit largesize) and size==0 (to end-of-enclosure) are
  * handled as the spec requires.
  *
  * Codec seam (documented, not hidden): frames decode through the one
  * sniffing ImageIO entry, so only JPEG sample entries ('jpeg', the
  * QuickTime motion-JPEG-in-MP4 codec id, or 'mjpa') are decodable —
  * an 'avc1'/H.264 track fails fast naming the codec, because the JDK
  * ships no H.264 decoder (the same seam the AVI path documents for
  * non-MJPEG streams). Malformed/truncated payloads fail fast with a
  * reason — the media quarantine operators' input.
  *
  * Not implemented: edit lists (elts), fragmented MP4 (moof), co64
  * (64-bit chunk offsets). Multiple video tracks: the FIRST video
  * track's complete sample table wins; later traks are ignored (never
  * merged — a size/offset table from track 2 must not pair with track
  * 1's codec).
  */
object Mp4Mjpeg {

  private def fcc(s: String): Int = {
    require(s.length == 4)
    ((s(0) & 0xFF) << 24) | ((s(1) & 0xFF) << 16) | ((s(2) & 0xFF) << 8) | (s(3) & 0xFF)
  }

  private val Ftyp = fcc("ftyp"); private val Moov = fcc("moov")
  private val Mdat = fcc("mdat"); private val Trak = fcc("trak")
  private val Mdia = fcc("mdia"); private val Minf = fcc("minf")
  private val Stbl = fcc("stbl"); private val Stsd = fcc("stsd")
  private val Stsz = fcc("stsz"); private val Stco = fcc("stco")
  private val Stsc = fcc("stsc"); private val Hdlr = fcc("hdlr")
  private val Vide = fcc("vide")
  private val Jpeg = fcc("jpeg"); private val Mjpa = fcc("mjpa")

  /** Encode JPEG frames as a single-video-track MP4: 'jpeg' sample
    * entry, one sample per chunk (stsc {1,1,1}), explicit stsz sizes,
    * absolute stco offsets into the trailing mdat. */
  def encode(framesJpeg: Seq[Array[Byte]], width: Int, height: Int,
             fps: Int = 25): Array[Byte] = {
    require(framesJpeg.nonEmpty, "an MP4 needs at least one frame")
    require(fps > 0 && width > 0 && height > 0)
    val n = framesJpeg.length

    def box(tpe: String)(payload: ByteArrayOutputStream => Unit): Array[Byte] = {
      val b = new ByteArrayOutputStream()
      payload(b)
      val body = b.toByteArray
      val out = ByteBuffer.allocate(8 + body.length)
      out.putInt(8 + body.length); out.putInt(fcc(tpe)); out.put(body)
      out.array()
    }
    def be32(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >> 24) & 0xFF); o.write((v >> 16) & 0xFF)
      o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
    }
    def be16(o: ByteArrayOutputStream, v: Int): Unit = {
      o.write((v >> 8) & 0xFF); o.write(v & 0xFF)
    }
    def zeros(o: ByteArrayOutputStream, k: Int): Unit = (0 until k).foreach(_ => o.write(0))
    val identityMatrix: ByteArrayOutputStream => Unit = o => {
      be32(o, 0x10000); be32(o, 0); be32(o, 0)
      be32(o, 0); be32(o, 0x10000); be32(o, 0)
      be32(o, 0); be32(o, 0); be32(o, 0x40000000)
    }

    val ftyp = box("ftyp") { o =>
      be32(o, fcc("isom")); be32(o, 0x200); be32(o, fcc("isom")); be32(o, fcc("mp41"))
    }
    val duration = n * 1 // timescale = fps, one tick per frame
    val mvhd = box("mvhd") { o =>
      be32(o, 0) // version+flags
      be32(o, 0); be32(o, 0)        // creation/modification
      be32(o, fps); be32(o, duration)
      be32(o, 0x10000); be16(o, 0x100); zeros(o, 10)
      identityMatrix(o); zeros(o, 24); be32(o, 2) // next track id
    }
    val tkhd = box("tkhd") { o =>
      be32(o, 7) // version 0, flags: enabled|in-movie|in-preview
      be32(o, 0); be32(o, 0); be32(o, 1); be32(o, 0) // track id 1
      be32(o, duration); zeros(o, 8); be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0)
      identityMatrix(o)
      be32(o, width << 16); be32(o, height << 16) // 16.16 fixed
    }
    val mdhd = box("mdhd") { o =>
      be32(o, 0); be32(o, 0); be32(o, 0); be32(o, fps); be32(o, duration)
      be16(o, 0x55C4); be16(o, 0) // und language, predefined
    }
    val hdlr = box("hdlr") { o =>
      be32(o, 0); be32(o, 0); be32(o, Vide); zeros(o, 12); o.write(0) // empty name
    }
    val vmhd = box("vmhd") { o => be32(o, 1); zeros(o, 8) }
    val dinf = box("dinf") { o =>
      o.write(box("dref") { d =>
        be32(d, 0); be32(d, 1)
        d.write(box("url ") { u => be32(u, 1) }) // self-contained
      })
    }
    val stsd = box("stsd") { o =>
      be32(o, 0); be32(o, 1)
      o.write(box("jpeg") { e =>
        zeros(e, 6); be16(e, 1)        // reserved, data-reference index
        zeros(e, 16)                   // predefined/reserved
        be16(e, width); be16(e, height)
        be32(e, 0x480000); be32(e, 0x480000) // 72 dpi
        be32(e, 0); be16(e, 1)         // reserved, frame count
        zeros(e, 32)                   // compressor name (pascal, zeroed)
        be16(e, 24); be16(e, 0xFFFF)   // depth, predefined -1
      })
    }
    val stts = box("stts") { o => be32(o, 0); be32(o, 1); be32(o, n); be32(o, 1) }
    val stsc = box("stsc") { o => be32(o, 0); be32(o, 1); be32(o, 1); be32(o, 1); be32(o, 1) }
    val stsz = box("stsz") { o =>
      be32(o, 0); be32(o, 0); be32(o, n)
      framesJpeg.foreach(f => be32(o, f.length))
    }
    // stco needs the absolute mdat payload offsets, which depend on moov's
    // own size — build moov once with a placeholder to MEASURE it, then
    // rebuild with the real offsets (sizes are offset-independent).
    def buildMoov(offsets: Seq[Int]): Array[Byte] = {
      val stco = box("stco") { o =>
        be32(o, 0); be32(o, n); offsets.foreach(be32(o, _))
      }
      val stbl = box("stbl") { o =>
        o.write(stsd); o.write(stts); o.write(stsc); o.write(stsz); o.write(stco)
      }
      val minf = box("minf") { o => o.write(vmhd); o.write(dinf); o.write(stbl) }
      val mdia = box("mdia") { o => o.write(mdhd); o.write(hdlr); o.write(minf) }
      val trak = box("trak") { o => o.write(tkhd); o.write(mdia) }
      box("moov") { o => o.write(mvhd); o.write(trak) }
    }
    val moovSize = buildMoov(Seq.fill(n)(0)).length
    val mdatStart = ftyp.length + moovSize + 8
    val offsets = framesJpeg.scanLeft(mdatStart)(_ + _.length).dropRight(1)
    val moov = buildMoov(offsets)
    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    val mdatLen = 8 + framesJpeg.map(_.length).sum
    be32(out, mdatLen); be32(out, Mdat)
    framesJpeg.foreach(f => out.write(f, 0, f.length))
    out.toByteArray
  }

  /** True iff the payload carries the ISO-BMFF magic (an 'ftyp' box at
    * offset 0; cheap sniff, works on truncated payloads). */
  def isMp4(payload: Array[Byte]): Boolean =
    payload.length >= 8 &&
      ByteBuffer.wrap(payload, 4, 4).getInt == Ftyp

  private final case class SampleTable(
    codec: Int, sizes: Array[Int], chunkOffsets: Array[Int],
    stsc: Array[(Int, Int)]) // (first_chunk, samples_per_chunk)

  /** REAL demux: walk the atom tree, assemble the sample table from the
    * first video track's stsd/stsz/stsc/stco, and slice the samples out
    * of the file by the stco/stsc mapping. Fails fast (with a reason) on
    * truncation, grammar violations, a missing table, or a codec the JDK
    * cannot decode (the H.264 seam). */
  def decodeFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val bb = ByteBuffer.wrap(payload)
    require(payload.length >= 8, "payload too short for a box header")
    require(isMp4(payload), "payload does not start with an ftyp box")

    var table: Option[SampleTable] = None
    var inVideoTrack = false
    // Once the first video track's stbl has been consumed the table is
    // frozen: a second video track must not overwrite sizes/offsets with
    // its own (a chimera of track 1's codec and track 2's geometry).
    var frozen = false

    // one box at `pos` inside [pos, end); returns (type, payloadStart,
    // payloadEnd, nextBox)
    def header(pos: Int, end: Int): (Int, Int, Int, Int) = {
      require(pos + 8 <= end, s"truncated box header at $pos")
      val size = bb.getInt(pos)
      val tpe = bb.getInt(pos + 4)
      if (size == 0) (tpe, pos + 8, end, end) // to end of enclosure
      else if (size == 1) {
        require(pos + 16 <= end, s"truncated largesize header at $pos")
        val big = bb.getLong(pos + 8)
        require(big >= 16 && pos + big <= end,
          s"largesize box declares $big bytes past its enclosure")
        (tpe, pos + 16, pos + big.toInt, pos + big.toInt)
      } else {
        require(size >= 8 && pos + size <= end,
          s"box declares $size bytes past its enclosure ($pos..$end)")
        (tpe, pos + 8, pos + size, pos + size)
      }
    }

    def walk(start: Int, end: Int, depth: Int): Unit = {
      var pos = start
      while (pos < end) {
        val (tpe, pStart, pEnd, next) = header(pos, end)
        if (tpe == Trak) {
          inVideoTrack = false
          walk(pStart, pEnd, depth + 1)
          if (table.nonEmpty) frozen = true // first video track wins
        } else if (tpe == Moov || tpe == Mdia || tpe == Minf || tpe == Stbl)
          walk(pStart, pEnd, depth + 1)
        else if (tpe == Hdlr) {
          require(pEnd - pStart >= 12, "hdlr box too short")
          inVideoTrack = bb.getInt(pStart + 8) == Vide
        } else if (tpe == Stsd && inVideoTrack && !frozen && table.isEmpty) {
          require(pEnd - pStart >= 16, "stsd box too short")
          val codec = bb.getInt(pStart + 12) // first sample entry's fourcc
          table = Some(SampleTable(codec, Array.empty, Array.empty, Array.empty))
        } else if (tpe == Stsz && inVideoTrack && !frozen) {
          require(pEnd - pStart >= 12, "stsz box too short")
          val fixed = bb.getInt(pStart + 4)
          val count = bb.getInt(pStart + 8)
          // Bound count in BOTH branches: a sample is ≥1 byte, so a count
          // above the file length is a lie — without this, a corrupt
          // fixed-size stsz declaring count≈2^31 would Array.fill a
          // multi-GB buffer (OOM) instead of the fail-fast quarantine path.
          require(count >= 0 && count <= payload.length,
            s"stsz declares $count samples in a ${payload.length}-byte file")
          require(fixed != 0 || pStart + 12 + 4L * count <= pEnd,
            s"stsz declares $count sizes past the box")
          val sizes =
            if (fixed != 0) Array.fill(count)(fixed)
            else Array.tabulate(count)(i => bb.getInt(pStart + 12 + 4 * i))
          table = table.map(_.copy(sizes = sizes))
        } else if (tpe == Stco && inVideoTrack && !frozen) {
          require(pEnd - pStart >= 8, "stco box too short")
          val count = bb.getInt(pStart + 4)
          require(count >= 0 && pStart + 8 + 4L * count <= pEnd,
            s"stco declares $count offsets past the box")
          val offs = Array.tabulate(count)(i => bb.getInt(pStart + 8 + 4 * i))
          table = table.map(_.copy(chunkOffsets = offs))
        } else if (tpe == Stsc && inVideoTrack && !frozen) {
          require(pEnd - pStart >= 8, "stsc box too short")
          val count = bb.getInt(pStart + 4)
          require(count >= 0 && pStart + 8 + 12L * count <= pEnd,
            s"stsc declares $count entries past the box")
          val entries = Array.tabulate(count)(i =>
            (bb.getInt(pStart + 8 + 12 * i), bb.getInt(pStart + 12 + 12 * i)))
          table = table.map(_.copy(stsc = entries))
        }
        pos = next
      }
    }
    walk(0, payload.length, 0)

    val t = table.getOrElse(
      throw new IllegalArgumentException("no video stsd sample entry found"))
    require(t.codec == Jpeg || t.codec == Mjpa, {
      val c = Array((t.codec >> 24) & 0xFF, (t.codec >> 16) & 0xFF,
        (t.codec >> 8) & 0xFF, t.codec & 0xFF).map(_.toChar).mkString
      s"codec '$c' has no JDK decoder (only 'jpeg'/'mjpa' motion-JPEG decodes here)"
    })
    require(t.sizes.nonEmpty, "no stsz sample sizes found")
    require(t.chunkOffsets.nonEmpty, "no stco chunk offsets found")
    require(t.stsc.nonEmpty, "no stsc sample-to-chunk entries found")

    // expand stsc: samples-per-chunk for every chunk (entry i applies from
    // its first_chunk up to entry i+1's)
    val nChunks = t.chunkOffsets.length
    val perChunk = new Array[Int](nChunks)
    t.stsc.indices.foreach { i =>
      val (first, spc) = t.stsc(i)
      require(first >= 1 && first <= nChunks, s"stsc first_chunk $first out of range")
      val until = if (i + 1 < t.stsc.length) t.stsc(i + 1)._1 else nChunks + 1
      (first until until).foreach(c => perChunk(c - 1) = spc)
    }
    val frames = Seq.newBuilder[Array[Byte]]
    var sample = 0
    var chunk = 0
    while (chunk < nChunks && sample < t.sizes.length) {
      var off = t.chunkOffsets(chunk)
      var k = 0
      while (k < perChunk(chunk) && sample < t.sizes.length) {
        val len = t.sizes(sample)
        require(off >= 0 && len >= 0 && off.toLong + len <= payload.length,
          s"sample $sample at $off+$len runs past the ${payload.length}-byte file")
        frames += java.util.Arrays.copyOfRange(payload, off, off + len)
        off += len; sample += 1; k += 1
      }
      chunk += 1
    }
    require(sample == t.sizes.length,
      s"stsc/stco map only $sample of the ${t.sizes.length} declared samples")
    frames.result()
  }
}
