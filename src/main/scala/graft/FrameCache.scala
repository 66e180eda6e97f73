package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-frame cache: the staging-table role a
  * warehouse plays for shared intermediates (shingle sets, capped
  * inverted indexes) — one persisted copy per (session, key), reused
  * by every consumer, LRU-evictable (MEMORY_AND_DISK).
  *
  * Entries are unpersisted and dropped when the owning session's
  * context ends (SparkListener on application end), so a long-lived
  * JVM that stops sessions or iterates over many data dirs neither
  * accumulates disk blocks the LRU can't evict nor pins dead
  * SparkSessions through strong map keys.
  */
private[graft] object FrameCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked =
    java.util.concurrent.ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrPersist(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      })
    }
    cache.computeIfAbsent((s, key),
      _ => build.persist(StorageLevel.MEMORY_AND_DISK))
  }

  /** Drop (and unpersist) every entry owned by `s`. */
  def evict(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala.filter(_._1 eq s).toList.foreach { k =>
      Option(cache.remove(k)).foreach { df =>
        // the context may already be down mid-shutdown — eviction must
        // still clear the map entry
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
    hooked.remove(s)
  }

  /** Number of live entries owned by `s` (spec observability). */
  def size(s: SparkSession): Int = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala.count(_._1 eq s)
  }
}
