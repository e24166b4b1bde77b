package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JVM-wide cache of materialized ANN index artifacts (IVF centroids
  * and cell assignments, PQ codebooks and codes) — the deploy-time
  * split between INDEX BUILD and QUERY: a production system trains at
  * ingest and probes at query time, exactly as the CDC path decodes at
  * ingest and reads the landed table. Keyed by the owning context's
  * applicationId + a caller key; entries of stopped contexts are
  * evicted, and the build closure only runs on a miss. */
object IndexCache {
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def getOrBuild(key: String)(build: => DataFrame): DataFrame = {
    cache.entrySet().removeIf(e => e.getValue.sparkSession.sparkContext.isStopped)
    lazy val built = build
    val appId = SparkSession.getActiveSession
      .map(_.sparkContext.applicationId)
      .getOrElse(built.sparkSession.sparkContext.applicationId)
    cache.computeIfAbsent(s"$appId:$key", _ => {
      val p = built.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      p.count() // land eagerly: probes must not pay training
      p
    })
  }

  /** Drop all cached artifacts, unpersisting live ones (test hook). */
  def clear(): Unit = {
    cache.values.forEach { df =>
      if (!df.sparkSession.sparkContext.isStopped) df.unpersist()
    }
    cache.clear()
  }
}
