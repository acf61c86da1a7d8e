package graft.multimodal

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star, BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extract / resize / frame-sample as
  * distributed partition-level transforms — no driver collect, executor
  * batches.
  *
  * The IMAGE path is a real codec: payloads are genuine PNG files
  * (encoded and decoded with the JDK's `javax.imageio`, zero extra
  * dependencies), and every downstream feature is computed from actually
  * decoded pixels. The byte-stream path ([[sampleFrames]]) stays
  * codec-free by design: it models modalities whose payload is already a
  * decoded sample stream (PCM audio, sensor traces), where framing and
  * feature math are the whole operator.
  */
object Multimodal {

  // ImageIO defaults to spilling scratch buffers to temp FILES; executors
  // decode thousands of small images, so keep the scratch in memory.
  ImageIO.setUseCache(false)

  /** One sampled "frame" with its extracted features. */
  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, mean_byte: Double)

  /** Per-image metadata + channel statistics from REAL decoded pixels. */
  case class ImageFeatures(doc_id: Long, width: Int, height: Int,
                           mean_r: Double, mean_g: Double, mean_b: Double,
                           mean_luma: Double)

  /** Frame-sample a binary column holding an ALREADY-DECODED sample stream
    * (PCM audio, sensor bytes): every `stride` bytes take a `frameSize`
    * window and extract features. Runs as `mapPartitions` over the
    * executor partitions — no driver collect, batch-at-a-time. For images
    * use [[pngLumaFrames]], which really decodes first. */
  def sampleFrames(binDf: DataFrame, stride: Int, frameSize: Int): Dataset[Frame] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) => frames(id, payload, stride, frameSize) })
  }

  private def frames(id: Long, samples: Array[Byte], stride: Int, frameSize: Int): Iterator[Frame] =
    samples.indices.by(stride).iterator.map { off =>
      val frame = samples.slice(off, math.min(off + frameSize, samples.length))
      val mean = if (frame.isEmpty) 0.0
                 else frame.map(b => (b & 0xFF).toLong).sum.toDouble / frame.length
      Frame(id, off / stride, frame.length, mean)
    }

  /** Read a DIRECTORY of media files as (doc_id, path, n_bytes, payload)
    * via Spark's native `binaryFile` source — the bridge from real files
    * on object storage to every operator in this module (all of them key
    * on `doc_id` + `payload`). `doc_id` is the xxhash64 of the file path:
    * stable across runs and partitionings, no driver-side id assignment.
    * Partition parallelism, predicate pushdown on path/size, and the
    * usual file-listing scale-out come from the built-in source. */
  def readBinaryDir(spark: SparkSession, dir: String, glob: String = "*"): DataFrame =
    spark.read.format("binaryFile")
      .option("pathGlobFilter", glob)
      .load(dir)
      .select(xxhash64(col("path")).as("doc_id"), col("path"),
        col("length").as("n_bytes"), col("content").as("payload"))

  /** Typed metadata for an opaque binary payload — pure Column exprs
    * (byte length + content hash), oracle-checkable. */
  def withBinaryMeta(df: DataFrame, textToBinary: String): DataFrame =
    df.withColumn("payload", col(textToBinary).cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("content_sha", sha2(col("payload"), 256))

  // ---------------------------------------------------------------------
  // Real PNG codec path (javax.imageio — JDK-only, no added dependencies)
  // ---------------------------------------------------------------------

  /** Encode a packed 0xRRGGBB pixel array as a real PNG file. The JDK PNG
    * writer is deterministic for fixed pixels (fixed chunk layout + zlib
    * settings), so payload hashes are stable across runs. */
  def encodePng(width: Int, height: Int, rgb: Array[Int]): Array[Byte] = {
    require(rgb.length == width * height,
      s"pixel array has ${rgb.length} entries for ${width}x$height")
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, width, height, rgb, 0, width)
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** REAL decode: parse the container format and return the image. Fails
    * fast on non-image bytes instead of propagating nulls. */
  def decodePng(payload: Array[Byte]): BufferedImage = {
    val img = ImageIO.read(new ByteArrayInputStream(payload))
    require(img != null, "payload is not a decodable image")
    img
  }

  /** Packed 0xRRGGBB pixels of a decoded image, row-major. */
  def rgbPixels(img: BufferedImage): Array[Int] =
    img.getRGB(0, 0, img.getWidth, img.getHeight, null, 0, img.getWidth)

  /** Integer BT.601 luma plane of a decoded image — one byte per pixel,
    * (299r + 587g + 114b)/1000 in exact integer math (deterministic on
    * every JVM, unlike a float formula). */
  def lumaPlane(img: BufferedImage): Array[Byte] =
    rgbPixels(img).map { p =>
      val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      ((299 * r + 587 * g + 114 * b) / 1000).toByte
    }

  /** Deterministic REAL-PNG payloads: per input row, doc-id-seeded pseudo
    * pixels (splitmix chain — stable across runs and partitionings) are
    * encoded through the actual PNG writer on the executors. Stands in
    * for reading media files off object storage; everything downstream
    * decodes genuine PNG bytes. */
  def syntheticPng(df: DataFrame, idCol: String, width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rgb = new Array[Int](width * height)
        var h = id * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
        var i = 0
        while (i < rgb.length) {
          h = h * 6364136223846793005L + 1442695040888963407L
          rgb(i) = ((h >>> 40) & 0xFFFFFF).toInt
          i += 1
        }
        (id, encodePng(width, height, rgb))
      }
    }.toDF("doc_id", "payload")
  }

  /** Decode every payload (really — `ImageIO.read` per row, on the
    * executors) and extract per-channel pixel statistics. */
  def imageFeatures(binDf: DataFrame): Dataset[ImageFeatures] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = decodePng(payload)
        val px = rgbPixels(img)
        var (sr, sg, sb, sy) = (0L, 0L, 0L, 0L)
        px.foreach { p =>
          val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
          sr += r; sg += g; sb += b; sy += (299 * r + 587 * g + 114 * b) / 1000
        }
        val n = px.length.toDouble
        ImageFeatures(id, img.getWidth, img.getHeight,
          sr / n, sg / n, sb / n, sy / n)
      })
  }

  /** Frame-sample the DECODED luma plane of real PNG payloads: decode on
    * the executors, project to BT.601 luma, then the same framing math as
    * [[sampleFrames]] — features come from actual pixels, not container
    * bytes. */
  def pngLumaFrames(binDf: DataFrame, stride: Int, frameSize: Int): Dataset[Frame] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        frames(id, lumaPlane(decodePng(payload)), stride, frameSize)
      })
  }

  /** 64-bit difference hash (dHash) of a decoded image — the classic
    * perceptual fingerprint for image near-dup detection: nearest-neighbor
    * resample the BT.601 luma plane to a 9x8 grid (exact integer picks,
    * any input size), then bit (y*8+x) = 1 iff luma(x,y) > luma(x+1,y).
    * Robust to re-encoding and small edits; Hamming distance between
    * hashes tracks visual difference. All-integer math — bitwise
    * deterministic on every JVM. */
  def dHash64(img: BufferedImage): Long = {
    val (w, h) = (img.getWidth, img.getHeight)
    val px = rgbPixels(img)
    def lumaAt(gx: Int, gy: Int): Int = {
      val p = px(math.min(gy * h / 8, h - 1) * w + math.min(gx * w / 9, w - 1))
      val (r, g, b) = ((p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF)
      (299 * r + 587 * g + 114 * b) / 1000
    }
    var bits = 0L
    var y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        if (lumaAt(x, y) > lumaAt(x + 1, y)) bits |= 1L << (y * 8 + x)
        x += 1
      }
      y += 1
    }
    bits
  }

  /** Per-image dHash table (doc_id, dhash) — real decode per row on the
    * executors. */
  def imageDHashes(binDf: DataFrame): DataFrame = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) => (id, dHash64(decodePng(payload))) })
      .toDF("doc_id", "dhash")
  }

  /** Image near-duplicate pairs: dHash + the SimHash 16-bit-chunk
    * pigeonhole join ([[graft.operators.NearDup.simhashPairs]] — the pair
    * machinery is hash-agnostic): EVERY pair at Hamming distance <=
    * `maxHamming` (<= 3 for exactness) shares a chunk bucket, so the join
    * is bucket-local, never all-pairs. Returns (id_a, id_b, hamming). */
  def imageNearDupPairs(binDf: DataFrame, maxHamming: Int = 3): DataFrame =
    graft.operators.NearDup.simhashPairs(
        imageDHashes(binDf).withColumnRenamed("dhash", "simhash"), "doc_id",
        maxHamming)

  /** Dedup-on-arrival for images (the media twin of
    * `NearDup.incrementalLshCandidates`): near-dup pairs TOUCHING the new
    * batch — new×new plus new×stored — against a persisted dHash table
    * (`IndexStore.writeDHashes`/`readDHashes`), without recomputing or
    * rescanning the old corpus' media. Equals the full recompute over
    * old ∪ new restricted to pairs with at least one new id
    * (spec-asserted, the exactness contract incremental operators carry
    * here) — including the crowded-bucket cap, which is counted over the
    * UNION exactly as the full recompute and the text twin count it (a
    * new-side-only cap would both miss the blowup protection on stored
    * crowds and break the equality). A doc_id recurring in both tables
    * never self-pairs (strict id_a < id_b), matching the text twin's
    * recurring-id semantics. One bucket-local join over the tagged union. */
  def incrementalImageNearDups(newHashes: DataFrame, storedHashes: DataFrame,
                               maxHamming: Int = 3,
                               maxBucketSize: Int = graft.operators.NearDup.DefaultMaxBucketSize)
      : DataFrame = {
    import graft.operators.NearDup
    val tagged = NearDup.hashChunks16(newHashes, "doc_id", "dhash")
      .withColumn("__isnew", lit(true))
      .unionByName(NearDup.hashChunks16(storedHashes, "doc_id", "dhash")
        .withColumn("__isnew", lit(false)))
    // Cap rides the same (chunk, value) partitioning the join needs: one
    // window count over the union, over-cap buckets dropped in place;
    // materialized ONCE (it feeds both join sides).
    val w = org.apache.spark.sql.expressions.Window.partitionBy("__chunk", "__cv")
    val capped = tagged.withColumn("__bn", count(lit(1)).over(w))
      .where(col("__bn") <= maxBucketSize).drop("__bn")
      .localCheckpoint()
    val a = capped.select(col("__chunk"), col("__cv"), col("__id").as("id_a"),
      col("__h64").as("__ha"), col("__isnew").as("__na"))
    val b = capped.select(col("__chunk"), col("__cv"), col("__id").as("id_b"),
      col("__h64").as("__hb"), col("__isnew").as("__nb"))
    a.join(b, Seq("__chunk", "__cv"))
      .where(col("id_a") < col("id_b") && (col("__na") || col("__nb")))
      .select(col("id_a"), col("id_b"),
        bit_count(col("__ha").bitwiseXOR(col("__hb"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Deterministic near-dup PNG fixture: consecutive ids (2k, 2k+1) render
    * the SAME seeded pixels except the odd id blacks out pixel (0,0) — a
    * one-cell luma change, so the planted pair's dHash distance is <= 1
    * while unrelated images sit near the ~32-bit random-hash expectation.
    * The planted structure mirrors `ScaleBench.syntheticDocs`' text dups. */
  def syntheticPngNearDups(df: DataFrame, idCol: String,
                           width: Int, height: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val rgb = new Array[Int](width * height)
        var h = (id >> 1) * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
        var i = 0
        while (i < rgb.length) {
          h = h * 6364136223846793005L + 1442695040888963407L
          rgb(i) = ((h >>> 40) & 0xFFFFFF).toInt
          i += 1
        }
        if ((id & 1L) == 1L) rgb(0) = 0x000000
        (id, encodePng(width, height, rgb))
      }
    }.toDF("doc_id", "payload")
  }

  /** Split a multi-frame clip payload (concatenated PNG files — the
    * motion-JPEG-style stand-in for a video container; real video codecs
    * aren't in the JDK) into its frames by scanning for the 8-byte PNG
    * signature. Returns the frame payloads in order. (A signature
    * byte-string inside a frame's compressed data would mis-split — a
    * ~2^-64-per-kilobyte event; a real container format carries explicit
    * frame lengths, which is exactly what swapping this stand-in for a
    * video demuxer would change.) */
  def splitPngFrames(payload: Array[Byte]): Seq[Array[Byte]] = {
    val sig = Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)
    def isSigAt(i: Int): Boolean = {
      var k = 0
      while (k < 8 && payload(i + k) == sig(k)) k += 1
      k == 8
    }
    val starts = (0 to payload.length - 8).filter(isSigAt)
    require(starts.nonEmpty && starts.head == 0, "payload is not a PNG clip")
    starts.zipAll(starts.drop(1), 0, payload.length)
      .map { case (s, e) => payload.slice(s, e) }
  }

  /** A per-frame row of [[shotBoundaries]]: Hamming distance of this
    * frame's dHash to the previous frame's (null for frame 0), and the
    * cut flag. */
  case class ShotFrame(doc_id: Long, frame_idx: Int, hamming_prev: Option[Long],
                       is_cut: Boolean)

  /** Shot-boundary (scene-cut) detection over clip payloads: REALLY decode
    * every frame, dHash it, and flag frames whose Hamming distance to the
    * previous frame exceeds `cutThreshold` — the classic first stage of a
    * video-curation pipeline (sample one keyframe per shot instead of
    * every frame). Per-clip sequential work inside `mapPartitions`; clips
    * fan out across executors, so a corpus of clips scales with the clip
    * count. */
  def shotBoundaries(binDf: DataFrame, cutThreshold: Int = 10): Dataset[ShotFrame] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, payload) =>
        val hashes = splitPngFrames(payload).map(f => dHash64(decodePng(f)))
        hashes.indices.map { i =>
          if (i == 0) ShotFrame(id, 0, None, is_cut = false)
          else {
            val d = java.lang.Long.bitCount(hashes(i) ^ hashes(i - 1)).toLong
            ShotFrame(id, i, Some(d), d > cutThreshold)
          }
        }
      })
  }

  /** Deterministic clip fixture: `nFrames` real PNG frames concatenated,
    * with a new scene (fresh seeded pixels) every `shotLen` frames and
    * identical frames within a scene — so the true cut positions are
    * exactly the multiples of `shotLen`. */
  def syntheticPngClip(df: DataFrame, idCol: String, nFrames: Int,
                       width: Int, height: Int, shotLen: Int): DataFrame = {
    require(nFrames >= 1 && shotLen >= 1, "need nFrames >= 1 and shotLen >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val out = new ByteArrayOutputStream()
        (0 until nFrames).foreach { f =>
          val rgb = new Array[Int](width * height)
          var h = (id * 1000L + f / shotLen) * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
          var i = 0
          while (i < rgb.length) {
            h = h * 6364136223846793005L + 1442695040888963407L
            rgb(i) = ((h >>> 40) & 0xFFFFFF).toInt
            i += 1
          }
          out.write(encodePng(width, height, rgb))
        }
        (id, out.toByteArray)
      }
    }.toDF("doc_id", "payload")
  }

  /** REAL resize: decode, nearest-neighbor downsample by `factor` (exact
    * integer pixel picks — no interpolation, so bitwise deterministic on
    * every JVM), re-encode as PNG. Emits the resized payload with its new
    * dimensions and byte size; same distributed shape (binary in, smaller
    * binary out, per-partition batches). */
  def resizePng(binDf: DataFrame, factor: Int): DataFrame = {
    require(factor >= 1, s"resize factor must be >= 1, got $factor")
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, payload) =>
        val img = decodePng(payload)
        val (w, h) = (img.getWidth, img.getHeight)
        val (ow, oh) = ((w + factor - 1) / factor, (h + factor - 1) / factor)
        val in = rgbPixels(img)
        val out = new Array[Int](ow * oh)
        var y = 0
        while (y < oh) {
          var x = 0
          while (x < ow) { out(y * ow + x) = in(y * factor * w + x * factor) & 0xFFFFFF; x += 1 }
          y += 1
        }
        val resized = encodePng(ow, oh, out)
        (id, ow, oh, resized, resized.length)
      })
      .toDF("doc_id", "out_width", "out_height", "resized", "n_bytes_resized")
  }
}
