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

  /** Lazy holder so the (possibly long) build runs OUTSIDE the map's bin
    * lock: computeIfAbsent only constructs the holder; evaluation
    * synchronizes on the holder itself, so concurrent same-key callers
    * wait on each other while different keys proceed in parallel. */
  private final class Lazy(build: () => AnyRef) { lazy val value: AnyRef = build() }

  private val cache = new ConcurrentHashMap[String, Lazy]()
  private val hooked = ConcurrentHashMap.newKeySet[String]()

  /** Drop a session's entries when its application ends — persisted
    * DataFrames die with the context, so the holders would otherwise pin
    * dead plans for the JVM's lifetime (long test suites / notebooks). */
  private def hookEviction(spark: SparkSession): Unit = {
    val appId = spark.sparkContext.applicationId
    if (hooked.add(appId)) {
      spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            end: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          cache.keySet.removeIf(_.startsWith(appId + "|"))
          hooked.remove(appId)
        }
      })
    }
  }

  /** Build-once per (session, key). `build` runs at most once per key;
    * concurrent callers of the same key block until it completes. */
  def cached[T <: AnyRef](spark: SparkSession, key: String)(build: => T): T = {
    hookEviction(spark)
    cache.computeIfAbsent(spark.sparkContext.applicationId + "|" + key,
      _ => new Lazy(() => build)).value.asInstanceOf[T]
  }

  /** DataFrame variant: persists (memory, disk spill) and materializes so
    * every later use is a cache scan, not a recompute. */
  def cachedDf(spark: SparkSession, key: String)(build: => DataFrame): DataFrame =
    cached(spark, key) {
      val df = build.persist(StorageLevel.MEMORY_AND_DISK)
      df.count()
      df
    }
}
