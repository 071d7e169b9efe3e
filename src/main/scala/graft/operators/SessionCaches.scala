package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session-scoped shared-stage caches — the machinery behind
  * [[Dedup.sharedClusters]], [[Dedup.sharedContainment]] and
  * [[TextAnalysis.sharedGrams13]]: a heavy stage (cluster resolution,
  * containment pairs, the 13-gram index) is materialized ONCE per
  * (session, corpus-directory) and every consumer reads the
  * materialized form.
  *
  * Contract: entries assume an IMMUTABLE corpus directory for the
  * session's lifetime — the standing-table assumption every warehouse
  * consumer makes anyway (a changed corpus is a new directory/version,
  * not an in-place rewrite). Entries (and any checkpoint blocks they
  * pin) are evicted when the owning SparkContext stops, so a
  * long-lived JVM hosting many short-lived sessions does not
  * accumulate dead frames. */
private[graft] object SessionCaches {

  type Cache =
    java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]

  private val caches =
    new java.util.concurrent.CopyOnWriteArrayList[Cache]()

  private val registered = java.util.concurrent.ConcurrentHashMap
    .newKeySet[org.apache.spark.SparkContext]()

  /** A new cache wired into context-stop eviction. */
  def newCache(): Cache = {
    val c = new Cache()
    caches.add(c)
    c
  }

  /** computeIfAbsent with eviction registration; `build` decides its
    * own materialization (localCheckpoint, catalog table, ...). */
  def getOrBuild(cache: Cache, s: SparkSession, key: String)
      (build: => DataFrame): DataFrame =
    cache.computeIfAbsent((s, key), _ => {
      register(s)
      build
    })

  private def register(s: SparkSession): Unit = {
    val sc = s.sparkContext
    if (registered.add(sc))
      sc.addSparkListener(new org.apache.spark.scheduler.SparkListener {
        override def onApplicationEnd(
            e: org.apache.spark.scheduler.SparkListenerApplicationEnd): Unit = {
          caches.forEach(c => c.keySet.removeIf(_._1.sparkContext eq sc))
          registered.remove(sc)
        }
      })
  }
}
