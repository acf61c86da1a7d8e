package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.StructType
import graft.operators.NearDup

/** Dedup-on-arrival: the streaming composition of the incremental LSH
  * index. Each micro-batch of documents is (1) banded
  * (`NearDup.lshBandTable` — corpus-independent, so bands never need
  * recomputation), (2) checked for near-dup candidates against the
  * PERSISTED band store plus itself (`NearDup.incrementalLshCandidates`),
  * (3) appended to the band store. The candidate stream is the input to
  * whatever policy downstream wants (drop new dups, cluster, flag).
  *
  * This is how a 100 TB corpus stays deduplicated under continuous
  * ingestion: per batch, work is |new bands| x (bucket collisions), never
  * a corpus re-sketch. The band store is a plain partitioned parquet
  * directory — at cluster scale it would be bucketed by `__bucket` so the
  * candidate join co-locates without a shuffle of the stored side.
  *
  * Idempotence note: the candidate OUTPUT for a replayed batch is
  * recomputed identically (deterministic hashes), but the band-store
  * append is at-least-once under batch replay; duplicate band rows only
  * create duplicate candidate PAIRS, which `distinct()` in the candidate
  * join absorbs — state converges, nothing is lost or double-deduped.
  */
object StreamingDedup {

  /** One micro-batch: returns the candidate pairs involving `newDocs` and
    * appends the batch's bands to the store. */
  def processBatch(newDocs: DataFrame, bandStoreDir: String,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val spark = newDocs.sparkSession
    val newBands = NearDup.lshBandTable(newDocs, idCol, col(textCol))
      .localCheckpoint() // reused twice (join + append) — compute once
    val exists = new Path(bandStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(bandStoreDir))
    val stored =
      if (exists) spark.read.parquet(bandStoreDir)
      else spark.emptyDataFrame.select(lit(0L).as("__id"), lit(0).as("__band"),
        lit(0L).as("__bucket")).limit(0)
    val candidates = NearDup.incrementalLshCandidates(newBands, stored)
    newBands.write.mode("append").parquet(bandStoreDir)
    candidates
  }

  /** Drain an incoming documents directory: per micro-batch, write the
    * candidate pairs to `candidatesDir` (append) and grow the band store.
    * AvailableNow + checkpoint — re-runnable as new files land. */
  def run(spark: SparkSession, incomingDir: String, schema: StructType,
          bandStoreDir: String, candidatesDir: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val q = spark.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        processBatch(batch, bandStoreDir, idCol, textCol)
          .write.mode("append").parquet(candidatesDir)
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
