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
  * Idempotence under batch replay (failure after a write, before the
  * checkpoint advanced): (1) the stored side is anti-joined against the
  * batch's own ids, so a surviving previous append of THIS batch never
  * joins itself — replayed candidates are byte-identical to the original
  * run; (2) both writes target a per-batch-id subdirectory with overwrite,
  * so a replay rewrites the same location instead of appending a second
  * copy. At-least-once delivery therefore converges to exactly-once state
  * AND exactly-once candidate output.
  */
object StreamingDedup {

  /** One micro-batch: returns the candidate pairs involving `newDocs` and
    * writes the batch's bands to the store. With `batchId` set, the band
    * write goes to a `batch=<id>` subdirectory with overwrite (replay-
    * idempotent); without it, a plain append (one-shot use). */
  def processBatch(newDocs: DataFrame, bandStoreDir: String,
                   idCol: String = "doc_id", textCol: String = "text",
                   batchId: Option[Long] = None): DataFrame = {
    val spark = newDocs.sparkSession
    val newBands = NearDup.lshBandTable(newDocs, idCol, col(textCol))
      .localCheckpoint() // reused three times (anti-join, join, write) — compute once
    val exists = new Path(bandStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(bandStoreDir))
    val stored =
      if (exists) {
        val all = spark.read.parquet(bandStoreDir)
        StoreLayout.check(all, bandStoreDir, batchId)
        // a replayed batch may have already written its own bands; drop
        // them so the replay emits exactly the original candidate set.
        // Keyed by BATCH, not doc id: the per-batch-id subdirectory layout
        // surfaces a `batch` partition column, so only THIS batch's prior
        // append is excluded — a doc id legitimately recurring in a later
        // batch keeps its stored bands, preserving candidate pairs between
        // other documents and the previously stored version of that id.
        val prior = batchId match {
          case Some(id) =>
            all.where(!(col("batch") <=> lit(id)))
          case None => // one-shot append path: no batch key, fall back to id
            // the id anti-join shields only THIS batch's ids — repeated
            // one-shot calls over overlapping corpora leave duplicate band
            // rows from earlier appends, which would inflate the union
            // bucket counts driving the crowded-bucket cap (dropping
            // buckets the full recompute would keep); distinct the stored
            // side so replays converge instead of compounding
            all.select(col("__id"), col("__band"), col("__bucket")).distinct()
              .join(newBands.select("__id").distinct(), Seq("__id"), "left_anti")
        }
        prior.select(col("__id"), col("__band"), col("__bucket"))
      }
      // empty-store fallback derives the schema from the real band table
      // (id type follows idCol — never a hardcoded LongType)
      else newBands.limit(0)
    // Materialize before the band write: on replay the overwrite below
    // replaces files the lazy candidate plan would still reference.
    val candidates = NearDup.incrementalLshCandidates(newBands, stored)
      .localCheckpoint()
    batchId match {
      case Some(id) =>
        newBands.write.mode("overwrite").parquet(s"$bandStoreDir/batch=$id")
      case None =>
        newBands.write.mode("append").parquet(bandStoreDir)
    }
    candidates
  }

  /** Media twin of [[processBatch]] (round 6): one micro-batch of image
    * payloads is dHashed (REAL decode per row), probed for near-dup
    * candidates against the persisted hash store plus itself
    * (`Multimodal.incrementalImageNearDups`), and appended to the store —
    * same replay-idempotent per-batch-id layout, same exactly-once
    * convergence argument. Per batch, work is |new images| decodes plus
    * bucket-local joins; stored media is NEVER rescanned (only its 8-byte
    * hashes are read back). */
  def processImageBatch(newMedia: DataFrame, hashStoreDir: String,
                        batchId: Option[Long] = None,
                        maxHamming: Int = 3,
                        quarantineDir: Option[String] = None): DataFrame = {
    import graft.multimodal.Multimodal
    val spark = newMedia.sparkSession
    // With a quarantine sink, a corrupt payload costs ONE quarantine row,
    // not the micro-batch (the crawl-arrival posture); without one the
    // batch stays fail-fast by contract.
    val hashed = quarantineDir match {
      case Some(qdir) =>
        val (good, quar) = Multimodal.imageDHashesQuarantined(newMedia)
        writeQuarantine(quar.toDF(), qdir, batchId)
        good
      case None => Multimodal.imageDHashes(newMedia)
    }
    val newHashes = hashed
      .localCheckpoint() // reused three times (anti-join, join, write)
    val exists = new Path(hashStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(hashStoreDir))
    val stored =
      if (exists) {
        val all = spark.read.parquet(hashStoreDir)
        StoreLayout.check(all, hashStoreDir, batchId)
        val prior = batchId match {
          case Some(id) =>
            all.where(!(col("batch") <=> lit(id)))
          case None =>
            // same one-shot-path caveat as processBatch: duplicate stored
            // (doc_id, dhash) rows from overlapping earlier appends would
            // inflate the union bucket counts behind the crowded-bucket cap
            all.select(col("doc_id"), col("dhash")).distinct()
              .join(newHashes.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
        }
        prior.select(col("doc_id"), col("dhash"))
      }
      else newHashes.limit(0)
    // newHashes is already materialized; decide the band mode here so the
    // incremental entry point's auto-route doesn't checkpoint it a second
    // time (its counts are cheap scans of the checkpointed/parquet sides)
    val useWide = newHashes.count() + stored.count() >= graft.operators.NearDup.WideHashThreshold
    val candidates = Multimodal.incrementalImageNearDups(newHashes, stored, maxHamming,
        wide = Some(useWide))
      .localCheckpoint()
    batchId match {
      case Some(id) =>
        newHashes.write.mode("overwrite").parquet(s"$hashStoreDir/batch=$id")
      case None =>
        newHashes.write.mode("append").parquet(hashStoreDir)
    }
    candidates
  }

  /** Quarantine rows land next to the candidate/store sinks with the same
    * replay idempotence: per-batch-id subdirectory with overwrite, plain
    * append on the one-shot path. */
  private def writeQuarantine(quar: DataFrame, dir: String,
                              batchId: Option[Long]): Unit = batchId match {
    case Some(id) => quar.write.mode("overwrite").parquet(s"$dir/batch=$id")
    case None => quar.write.mode("append").parquet(dir)
  }

  /** Audio twin of [[processImageBatch]] (round 7): one micro-batch of WAV
    * payloads is fingerprinted (`AudioWav.audioHash64`, real container
    * decode per row), probed for near-dup candidates against the
    * persisted hash store plus itself
    * (`AudioWav.incrementalAudioNearDups`), and appended to the store —
    * same replay-idempotent per-batch-id layout, same exactly-once
    * convergence argument. Stored audio is NEVER rescanned (only its
    * 8-byte hashes are read back). */
  def processAudioBatch(newMedia: DataFrame, hashStoreDir: String,
                        batchId: Option[Long] = None,
                        maxHamming: Int = 3,
                        quarantineDir: Option[String] = None,
                        spectral: Boolean = false): DataFrame = {
    import graft.multimodal.AudioWav
    val spark = newMedia.sparkSession
    // spectral = true runs the round-9 constant-Q fingerprint instead of
    // the Haar time hash — the store then holds cqhash values under the
    // same "ahash" column (one store dir holds ONE fingerprint kind; the
    // kinds collide numerically, so mixing dirs is the caller's bug, the
    // same homogeneity contract as the band/semantic stores).
    val hashFn: Array[Short] => Long =
      if (spectral) AudioWav.constantQHash64 else AudioWav.audioHash64
    val hashed = quarantineDir match {
      case Some(qdir) =>
        val (good, quar) = AudioWav.audioHashesQuarantined(newMedia, hashFn)
        writeQuarantine(quar.toDF(), qdir, batchId)
        good
      case None =>
        if (spectral) AudioWav.constantQHashes(newMedia)
          .withColumnRenamed("cqhash", "ahash")
        else AudioWav.audioHashes(newMedia)
    }
    val newHashes = hashed
      .localCheckpoint() // reused three times (anti-join, join, write)
    val exists = new Path(hashStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(hashStoreDir))
    val stored =
      if (exists) {
        val all = spark.read.parquet(hashStoreDir)
        StoreLayout.check(all, hashStoreDir, batchId)
        val prior = batchId match {
          case Some(id) =>
            all.where(!(col("batch") <=> lit(id)))
          case None =>
            // one-shot path: distinct the stored side so replayed appends
            // can't inflate the union bucket counts (see processBatch)
            all.select(col("doc_id"), col("ahash")).distinct()
              .join(newHashes.select("doc_id").distinct(), Seq("doc_id"), "left_anti")
        }
        prior.select(col("doc_id"), col("ahash"))
      }
      else newHashes.limit(0)
    // same explicit band-mode decision as processImageBatch: avoid the
    // auto-route's second materialization of the batch hashes
    val useWide = newHashes.count() + stored.count() >= graft.operators.NearDup.WideHashThreshold
    val candidates = AudioWav.incrementalAudioNearDups(newHashes, stored, maxHamming,
        wide = Some(useWide))
      .localCheckpoint()
    batchId match {
      case Some(id) =>
        newHashes.write.mode("overwrite").parquet(s"$hashStoreDir/batch=$id")
      case None =>
        newHashes.write.mode("append").parquet(hashStoreDir)
    }
    candidates
  }

  /** Drain an incoming audio directory through [[processAudioBatch]] —
    * the audio mirror of [[runImages]]. AvailableNow + checkpoint. */
  def runAudio(spark: SparkSession, incomingDir: String, schema: StructType,
               hashStoreDir: String, candidatesDir: String,
               checkpoint: String, quarantineDir: Option[String] = None,
               spectral: Boolean = false): Unit = {
    val q = spark.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processAudioBatch(batch, hashStoreDir, Some(batchId),
            quarantineDir = quarantineDir, spectral = spectral)
          .write.mode("overwrite").parquet(s"$candidatesDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Embedding twin of [[processImageBatch]] (round 8 — VERDICT r7
    * "What's missing" #1): one micro-batch of ALREADY-ASSIGNED vectors
    * (`__cluster`, idCol, vecCol — the assignment is the coarse
    * quantizer's job: `IvfAnn.assignToIndex` against the persisted
    * centroids in production, any deterministic rule in tests) is probed
    * for within-cell cosine pairs against the persisted cell store plus
    * itself (`SemDedup.incrementalPairsWithinCells` — new×new and
    * new×stored only, the stored corpus is never re-paired), then
    * appended to the store. Same replay-idempotent per-batch-id layout,
    * same exactly-once convergence argument as the text/image/audio
    * stores: a daily embedding drop costs |batch| × cell-occupancy, not
    * the full-corpus cell join `SemDedup.pairsWithinCells` re-runs. */
  def processEmbeddingBatch(newAssigned: DataFrame, cellStoreDir: String,
                            idCol: String = "vec_id", vecCol: String = "embedding",
                            minSim: Double = 0.5,
                            batchId: Option[Long] = None): DataFrame = {
    import graft.operators.SemDedup
    val spark = newAssigned.sparkSession
    val batch = newAssigned
      .select(col("__cluster"), col(idCol).as("__id"), col(vecCol).as("__vec"))
      .localCheckpoint() // reused three times (anti-join, join, write)
    val exists = new Path(cellStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(cellStoreDir))
    val stored =
      if (exists) {
        val all = spark.read.parquet(cellStoreDir)
        StoreLayout.check(all, cellStoreDir, batchId)
        val prior = batchId match {
          case Some(id) =>
            all.where(!(col("batch") <=> lit(id)))
          case None =>
            // one-shot path: distinct can't dedup float arrays cheaply by
            // value semantics drift, but (id, cluster) identify a stored
            // vector — keep first occurrence per id, then shield this
            // batch's ids (see processBatch's one-shot caveat)
            all.withColumn("__rn", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy("__id").orderBy("__cluster")))
              .where(col("__rn") === 1).drop("__rn")
              .join(batch.select("__id").distinct(), Seq("__id"), "left_anti")
        }
        prior.select(col("__cluster"), col("__id"), col("__vec"))
      }
      else batch.limit(0)
    val candidates = SemDedup.incrementalPairsWithinCells(
        batch, stored, "__id", "__vec", minSim)
      .localCheckpoint() // materialize before the store write (replay overwrite)
    batchId match {
      case Some(id) =>
        batch.write.mode("overwrite").parquet(s"$cellStoreDir/batch=$id")
      case None =>
        batch.write.mode("append").parquet(cellStoreDir)
    }
    candidates
  }

  /** Graph-index maintenance twin (round 11 — VERDICT r10 #7): one
    * micro-batch of ALREADY-ASSIGNED vectors is LINKED into the stored
    * NSW layer-0 adjacency: kNN against the persisted cell store plus
    * itself (`NswAnn.linkBatch` — new-src lists exactly the restricted
    * rebuild, forward edges mirrored so stored nodes route into day-2
    * content), the new edges appended to the EDGE store and the batch to
    * the CELL store, both under the same replay-idempotent per-batch-id
    * layout. The stored adjacency is NEVER rebuilt; the entry hierarchy
    * (cell-level metadata) is untouched by arrivals. Probes read
    * adjacency = stored edges ∪ edge-store appends. */
  def processGraphBatch(newAssigned: DataFrame, cellStoreDir: String,
                        edgeStoreDir: String, m: Int = 8,
                        idCol: String = "vec_id", vecCol: String = "embedding",
                        batchId: Option[Long] = None): DataFrame = {
    import graft.operators.NswAnn
    val spark = newAssigned.sparkSession
    val batch = newAssigned
      .select(col("__cluster"), col(idCol).as("__id"), col(vecCol).as("__vec"))
      .localCheckpoint() // reused three times (exclusion, join, write)
    val exists = new Path(cellStoreDir).getFileSystem(
      spark.sparkContext.hadoopConfiguration).exists(new Path(cellStoreDir))
    val stored =
      if (exists) {
        val all = spark.read.parquet(cellStoreDir)
        StoreLayout.check(all, cellStoreDir, batchId)
        val prior = batchId match {
          case Some(id) => all.where(!(col("batch") <=> lit(id)))
          case None =>
            all.withColumn("__rn", row_number().over(
                org.apache.spark.sql.expressions.Window
                  .partitionBy("__id").orderBy("__cluster")))
              .where(col("__rn") === 1).drop("__rn")
              .join(batch.select("__id").distinct(), Seq("__id"), "left_anti")
        }
        prior.select(col("__cluster"), col("__id"), col("__vec"))
      }
      else batch.limit(0)
    val newEdges = NswAnn.linkBatch(batch, stored, m)
      .localCheckpoint() // materialize before the store writes (replay overwrite)
    batchId match {
      case Some(id) =>
        batch.write.mode("overwrite").parquet(s"$cellStoreDir/batch=$id")
        newEdges.write.mode("overwrite").parquet(s"$edgeStoreDir/batch=$id")
      case None =>
        batch.write.mode("append").parquet(cellStoreDir)
        newEdges.write.mode("append").parquet(edgeStoreDir)
    }
    newEdges
  }

  /** Drain an incoming embeddings directory through
    * [[processEmbeddingBatch]] — AvailableNow + checkpoint, candidates
    * and cell store both keyed by batch id. `assign` maps a raw batch to
    * its `__cluster` assignment (the persisted quantizer's probe). */
  def runEmbeddings(spark: SparkSession, incomingDir: String, schema: StructType,
                    cellStoreDir: String, candidatesDir: String,
                    checkpoint: String, assign: DataFrame => DataFrame,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    minSim: Double = 0.5): Unit = {
    val q = spark.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processEmbeddingBatch(assign(batch), cellStoreDir, idCol, vecCol,
            minSim, Some(batchId))
          .write.mode("overwrite").parquet(s"$candidatesDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain an incoming media directory through [[processImageBatch]]:
    * per micro-batch, candidates to `candidatesDir`, hashes into the
    * store, both keyed by batch id. AvailableNow + checkpoint. */
  def runImages(spark: SparkSession, incomingDir: String, schema: StructType,
                hashStoreDir: String, candidatesDir: String,
                checkpoint: String, quarantineDir: Option[String] = None): Unit = {
    val q = spark.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processImageBatch(batch, hashStoreDir, Some(batchId),
            quarantineDir = quarantineDir)
          .write.mode("overwrite").parquet(s"$candidatesDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }

  /** Drain an incoming documents directory: per micro-batch, write the
    * candidate pairs to `candidatesDir` and grow the band store, both
    * keyed by batch id (replay rewrites, never duplicates). AvailableNow +
    * checkpoint — re-runnable as new files land. */
  def run(spark: SparkSession, incomingDir: String, schema: StructType,
          bandStoreDir: String, candidatesDir: String, checkpoint: String,
          idCol: String = "doc_id", textCol: String = "text"): Unit = {
    val q = spark.readStream.schema(schema).parquet(incomingDir)
      .writeStream
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, bandStoreDir, idCol, textCol, Some(batchId))
          .write.mode("overwrite").parquet(s"$candidatesDir/batch=$batchId")
      }
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
