package graft.streaming

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.{SparkSpec, Tables}

/** The "streaming twin" claim made concrete (SURVEY.md §3.3 entry 3): the
  * SAME StreamOps transform runs over a file-source `readStream` and over
  * the batch DataFrame, and produces identical results once the stream is
  * drained. This is the daily-updates future the reference names
  * (`README.md:49`) — incremental consumption of the events schema.
  */
class FileStreamSpec extends SparkSpec {

  test("file-source readStream through tumblingHourly equals the batch twin") {
    val events = Tables.load(spark, sf, "events")
    val dir = Files.createTempDirectory("graft_stream_in").toString
    // land the fixture as two "arriving" files
    events.where(col("event_id") % 2 === 0).write.parquet(s"$dir/part=a")
    events.where(col("event_id") % 2 === 1).write.parquet(s"$dir/part=b")

    val streamIn = spark.readStream
      .schema(events.schema)
      .option("maxFilesPerTrigger", "1") // force multiple micro-batches
      .parquet(s"$dir/part=*")
    assert(streamIn.isStreaming)

    val name = s"t${System.nanoTime()}"
    val q = StreamOps.tumblingHourly(streamIn)
      .writeStream.format("memory").queryName(name)
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table(name).orderBy("ws").collect().toSeq
    val batch = StreamOps.tumblingHourly(events).orderBy("ws").collect().toSeq
    assert(streamed === batch)
  }

  test("streaming sink lands date-partitioned parquet exactly once") {
    val events = Tables.load(spark, sf, "events")
    val in = Files.createTempDirectory("graft_sink_in").toString
    val out = Files.createTempDirectory("graft_sink_out").toString
    val ckpt = Files.createTempDirectory("graft_sink_ckpt").toString
    events.write.parquet(s"$in/batch1")

    val streamIn = spark.readStream.schema(events.schema).parquet(s"$in/*")
    StreamOps.sinkPartitioned(streamIn, out, ckpt)

    val landed = spark.read.parquet(out)
    assert(landed.count() === events.count())
    // Hive-style event_date= partition dirs exist, plus the native sink's
    // _spark_metadata commit log (the exactly-once mechanism)
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.contains("_spark_metadata"), "native file sink commit log expected")
    val parts = dirs.filterNot(_ == "_spark_metadata")
    assert(parts.nonEmpty && parts.forall(_.startsWith("event_date=")))
    // re-running against the same checkpoint is a no-op (exactly-once)
    StreamOps.sinkPartitioned(
      spark.readStream.schema(events.schema).parquet(s"$in/*"), out, ckpt)
    assert(spark.read.parquet(out).count() === events.count())
  }
}
