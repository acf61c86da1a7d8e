package graft.util

import java.util.concurrent.ConcurrentHashMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** JVM-wide memoization of shared query intermediates (IVF index, LSH
  * candidate pairs): several registered queries are stages of ONE logical
  * pipeline (e.g. candidates -> verify -> components), and recomputing the
  * shared prefix per query triples its cost. At cluster scale the same
  * role is played by a persisted intermediate table; in-process the
  * equivalent is persist + materialize once per (session, input, params).
  *
  * Keys include the Spark application id, so a new session never sees
  * another session's (possibly unpersisted) plans. Values are deterministic
  * (fixed hash seeds / fixed k-means seed), so reuse cannot change any
  * query's output — only its cost.
  */
object Memo {

  private val cache = new ConcurrentHashMap[String, AnyRef]()

  /** Build-once per (session, key). `build` runs at most once per key;
    * concurrent callers block until it completes. */
  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T =
    cache.computeIfAbsent(spark.sparkContext.applicationId + "|" + key,
      _ => build).asInstanceOf[T]

  /** DataFrame variant: persists (memory, disk spill) and materializes so
    * every later use is a cache scan, not a recompute. */
  def cachedDf(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached(spark, key) {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
}
