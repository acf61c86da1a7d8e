package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (north star, BASELINE.json): treat
  * image/audio/video payloads as opaque `binary` columns with typed
  * metadata, and run decode / feature-extract / frame-sample as distributed
  * partition-level transforms.
  *
  * The actual media codecs are STUBBED (this container has no image/audio
  * libraries — see `decodeStub`): the deterministic fake below stands in for
  * e.g. a JPEG decoder. Everything Spark-side — schemas, `mapPartitions`
  * batch shape, partitioning behavior — is real and tested, so swapping the
  * stub for a real codec is a one-function change.
  */
object Multimodal {

  /** One sampled "frame" with its extracted features. */
  case class Frame(doc_id: Long, frame_idx: Int, n_bytes: Int, mean_byte: Double)

  /** STUB decode: a real implementation would parse the container format
    * and return decoded samples; the deterministic fake returns the raw
    * bytes so the downstream feature math is exercised end-to-end. */
  def decodeStub(payload: Array[Byte]): Array[Byte] = payload

  /** Frame-sample a binary column: every `stride` bytes take a `frameSize`
    * window, decode (stub), and extract features. Runs as `mapPartitions`
    * over the executor partitions — no driver collect, batch-at-a-time. */
  def sampleFrames(binDf: DataFrame, stride: Int, frameSize: Int): Dataset[Frame] = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.flatMap { case (id, payload) =>
          val decoded = decodeStub(payload)
          decoded.indices.by(stride).iterator.map { off =>
            val frame = decoded.slice(off, math.min(off + frameSize, decoded.length))
            val mean = if (frame.isEmpty) 0.0
                       else frame.map(b => (b & 0xFF).toLong).sum.toDouble / frame.length
            Frame(id, off / stride, frame.length, mean)
          }
        }
      }
  }

  /** STUB resize: a real implementation would decode, rescale pixels, and
    * re-encode; the deterministic fake decimates the byte stream by
    * `factor`. Exercises the same distributed shape (binary in, smaller
    * binary out, per-partition batches). */
  def resizeStub(payload: Array[Byte], factor: Int): Array[Byte] =
    payload.indices.by(factor).map(payload).toArray

  /** Downsample every payload by `factor` via mapPartitions, keeping doc
    * ids and emitting the resized payload + its new size. */
  def resizeAll(binDf: DataFrame, factor: Int): DataFrame = {
    val spark = binDf.sparkSession
    import spark.implicits._
    binDf.select(col("doc_id").cast("long"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) =>
        val r = resizeStub(decodeStub(b), factor)
        (id, r, r.length)
      })
      .toDF("doc_id", "resized", "n_bytes_resized")
  }

  /** Typed metadata for an opaque binary payload — pure Column exprs
    * (byte length + content hash), oracle-checkable. */
  def withBinaryMeta(df: DataFrame, textToBinary: String): DataFrame =
    df.withColumn("payload", col(textToBinary).cast("binary"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("content_sha", sha2(col("payload"), 256))

  /** PNG file signature — the 8 magic bytes every real PNG starts with. */
  val PngSignature: Array[Byte] =
    Array(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte)

  /** Deterministic GENUINE-binary media payloads: PNG signature + `nBytes`
    * of doc-id-seeded pseudo-pixel bytes (full 0..255 range, including
    * values no UTF-8 text cast can produce). Stands in for reading real
    * media files so the frame-sampling pipeline is exercised over actual
    * bytes, not text recast as binary. Generated on executors
    * (mapPartitions), one payload per input row. */
  def syntheticMedia(df: DataFrame, idCol: String, nBytes: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long")).as[Long].mapPartitions { it =>
      it.map { id =>
        val out = new Array[Byte](PngSignature.length + nBytes)
        System.arraycopy(PngSignature, 0, out, 0, PngSignature.length)
        // splitmix-style chain seeded by doc id: stable across runs/partitions
        var h = id * 0x9E3779B97F4A7C15L + 0xBF58476D1CE4E5B9L
        var i = PngSignature.length
        while (i < out.length) {
          h = h * 6364136223846793005L + 1442695040888963407L
          out(i) = (h >>> 56).toByte
          i += 1
        }
        (id, out)
      }
    }.toDF("doc_id", "payload")
  }
}
