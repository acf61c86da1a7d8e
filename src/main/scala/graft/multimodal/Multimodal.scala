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
}
