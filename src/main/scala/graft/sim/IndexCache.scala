package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-wide cache of materialized ANN index artifacts (IVF centroids
  * and cell assignments, PQ codebooks and codes) — the deploy-time
  * split between INDEX BUILD and QUERY: a production system trains at
  * ingest and probes at query time, exactly as the CDC path decodes at
  * ingest and reads the landed table. Keyed by the caller's session
  * (applicationId) + a caller key; entries of stopped contexts are
  * evicted, and the build closure only runs on a miss.
  *
  * The build runs OUTSIDE the map's lock (plain get / putIfAbsent):
  * a multi-second training job must not block unrelated keys, and a
  * build composing other cached artifacts (IVF assignments read the
  * cached centroids) must not deadlock on a bin lock. Two racing
  * builders may both train; the loser unpersists its copy. */
object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def getOrBuild(spark: SparkSession, key: String)
                (build: => DataFrame): DataFrame = {
    cache.entrySet().removeIf(e => e.getValue.sparkSession.sparkContext.isStopped)
    val fullKey = s"${spark.sparkContext.applicationId}:$key"
    val hit = cache.get(fullKey)
    if (hit != null) return hit
    val built = build.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    built.count() // land eagerly: probes must not pay training
    val prev = cache.putIfAbsent(fullKey, built)
    if (prev != null) { built.unpersist(); prev } else built
  }

  /** Drop all cached artifacts, unpersisting live ones (test hook). */
  def clear(): Unit = {
    cache.values.forEach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
    }
    cache.clear()
  }
}
