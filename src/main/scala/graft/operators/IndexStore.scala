package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** On-disk lifecycle for the engine's ANN/dedup indexes. The LSH band
  * table, the IVF assignment + centroids, and the PQ codebooks + codes
  * are INDEXES: built once in an offline stage, stored as tables, probed
  * by every later run — a production pipeline never refits a quantizer or
  * re-sketches a corpus per query. `graft.util.Memo` models that within a
  * session; IndexStore is the durable form: a plain parquet directory
  * layout that a BRAND-NEW session can reload and probe with zero
  * recompute, and that the incremental operators
  * (`NearDup.incrementalLshCandidates`, `IvfAnn.assignToIndex`) append
  * against.
  *
  * All tables round-trip exactly (ids, band/bucket hashes, cluster ids,
  * centers, one-byte codes are all parquet-native types), so a probe
  * against the reloaded store is bit-identical to one against the
  * in-memory build — asserted by IndexStoreSpec and by the q_dedup8 /
  * q_sim7 / q_sim9 / q_sim12 queries, which serve from the reload.
  *
  * At cluster scale the band table and IVF assignment would be written
  * `bucketBy(__bucket / __cluster)` so probe joins co-locate without a
  * shuffle; the layout (one directory per table under a root) is the same.
  */
object IndexStore {

  private val Bands = "lsh_bands"
  private val IvfAssign = "ivf_assignment"
  private val IvfCenters = "ivf_centers"
  private val PqBooks = "pq_codebooks"
  private val PqCodes = "pq_codes"

  private def write(df: DataFrame, dir: String): Unit =
    df.write.mode("overwrite").parquet(dir)

  /** Persist an LSH band table (`NearDup.lshBandTable` shape:
    * __id, __band, __bucket). */
  def writeLshBands(bands: DataFrame, root: String): Unit =
    write(bands, s"$root/$Bands")

  def readLshBands(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$Bands")

  /** Persist an IVF index: the full assignment (corpus columns +
    * __cluster) and the (__cluster, __center) centroid table. */
  def writeIvf(assignment: DataFrame, centers: DataFrame, root: String): Unit = {
    write(assignment, s"$root/$IvfAssign")
    write(centers, s"$root/$IvfCenters")
  }

  def readIvf(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$root/$IvfAssign"),
      spark.read.parquet(s"$root/$IvfCenters"))

  /** Persist a PQ index: the (__subspace, __code, __center) codebooks and
    * the (id, __codes) one-byte code table. */
  def writePq(codebooks: DataFrame, codes: DataFrame, root: String): Unit = {
    write(codebooks, s"$root/$PqBooks")
    write(codes, s"$root/$PqCodes")
  }

  def readPq(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$root/$PqBooks"),
      spark.read.parquet(s"$root/$PqCodes"))

  private val DHashes = "image_dhashes"

  /** Persist an image dHash table (`Multimodal.imageDHashes` shape:
    * doc_id, dhash) — the media twin of the LSH band store. The 16-bit
    * chunk structure the near-dup join buckets on is recomputed from the
    * stored hash on probe (4 shifts per row — cheaper than storing the
    * exploded chunks 4x). */
  def writeDHashes(hashes: DataFrame, root: String): Unit =
    write(hashes, s"$root/$DHashes")

  def readDHashes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$DHashes")

  private val AudioHashes = "audio_ahashes"

  /** Persist an audio fingerprint table (`AudioWav.audioHashes` shape:
    * doc_id, ahash) — the audio twin of [[writeDHashes]]; probes recompute
    * the band structure from the stored 8-byte hash, same as the image
    * path. */
  def writeAudioHashes(hashes: DataFrame, root: String): Unit =
    write(hashes, s"$root/$AudioHashes")

  def readAudioHashes(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$AudioHashes")

  private val Postings = "bm25_postings"

  /** Persist a BM25 postings table (`Bm25.postings` shape: doc_id, term,
    * tf, dl) — the inverted index as a table. At cluster scale this is
    * written `bucketBy(term)` so per-query scoring joins prune to the
    * query terms' buckets; df/avgdl derive from it on read (vocab-sized
    * and one-row aggregates — never worth a second stored table that
    * could drift out of sync). */
  def writePostings(postings: DataFrame, root: String): Unit =
    write(postings, s"$root/$Postings")

  def readPostings(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$Postings")

  private val Cells = "semantic_cells"

  /** Persist a semantic-dedup cell assignment (`__cluster`, `__id`,
    * `__vec`) — the embedding twin of [[writeLshBands]]: the coarse
    * quantizer's assignment plus the vector itself, because the within-
    * cell probe needs the stored vectors for the exact-cosine verify
    * (unlike the hash stores, where 8 bytes replay the whole signature).
    * At cluster scale this is written `bucketBy(__cluster)` so day-2
    * probes co-locate without shuffling the stored corpus. */
  def writeCells(assigned: DataFrame, root: String): Unit =
    write(assigned, s"$root/$Cells")

  def readCells(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(s"$root/$Cells")

  private val NswNeighbors = "nsw_neighbors"
  private val NswEntries = "nsw_entries"
  private val NswHier = "nsw_hier"

  /** Persist an HNSW-style proximity graph ([[NswAnn.buildGraph]] shape:
    * neighbors(src, dst, sim) layer-0 lists + entries(__cluster,
    * entry_id, level) + hier(src, dst, sim, layer) upper-layer edges) —
    * the graph-ANN index as tables. At cluster scale the adjacency is
    * written `bucketBy(src)` so each probe hop's frontier join
    * co-locates without shuffling the graph; the hierarchy is
    * O(kUp · entries) rows and broadcasts. */
  def writeNsw(neighbors: DataFrame, entries: DataFrame, hier: DataFrame,
               root: String): Unit = {
    write(neighbors, s"$root/$NswNeighbors")
    write(entries, s"$root/$NswEntries")
    write(hier, s"$root/$NswHier")
  }

  def readNsw(spark: SparkSession, root: String): (DataFrame, DataFrame, DataFrame) =
    (spark.read.parquet(s"$root/$NswNeighbors"),
      spark.read.parquet(s"$root/$NswEntries"),
      spark.read.parquet(s"$root/$NswHier"))

  /** Whether a store root already holds any index table. */
  def exists(spark: SparkSession, root: String): Boolean = {
    val p = new Path(root)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }
}
