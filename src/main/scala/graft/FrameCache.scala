package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Session-scoped persisted-frame cache: the staging-table role a
  * warehouse plays for shared intermediates (shingle sets, capped
  * inverted indexes) — one persisted copy per (session, key), reused
  * by every consumer, LRU-evictable (MEMORY_AND_DISK).
  *
  * Entries are unpersisted and dropped when the owning CONTEXT ends
  * (SparkListener on application end) or when a caller evicts a
  * session explicitly. Sessions sharing one SparkContext via
  * newSession() are NOT individually collected — Spark has no
  * session-end event, and a DataFrame value pins its session anyway —
  * so per-job-session deployments call evict(session) when the job
  * retires; the listener remains the backstop that clears everything
  * at context stop.
  */
private[graft] object FrameCache {

  private val cache =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), DataFrame]()
  private val hooked =
    new java.util.concurrent.ConcurrentHashMap[SparkSession, SparkListener]()

  def getOrPersist(s: SparkSession, key: String)(build: => DataFrame): DataFrame = {
    hooked.computeIfAbsent(s, { _ =>
      val l = new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      }
      s.sparkContext.addSparkListener(l)
      l
    })
    // REENTRANCY: a build closure may itself call getOrPersist for a
    // different key (dedup.clusters builds on dedup.shingled). Running
    // `build` inside ConcurrentHashMap.computeIfAbsent would then nest a
    // map insert inside a map compute — CHM throws
    // IllegalStateException("Recursive update") whenever the two keys
    // hash to the same bin, an identity-hash-dependent crash. So: lockless
    // get fast path, build+persist OUTSIDE the map, then putIfAbsent and
    // unpersist the losing copy of a rare concurrent double-build.
    val k = (s, key)
    val hit = cache.get(k)
    if (hit ne null) hit
    else {
      val built = build.persist(StorageLevel.MEMORY_AND_DISK)
      val prev = cache.putIfAbsent(k, built)
      if (prev eq null) built
      else {
        try built.unpersist(blocking = false) catch { case _: Throwable => () }
        prev
      }
    }
  }

  /** Drop (and unpersist) every entry owned by `s`, and detach its
    * context listener (a later getOrPersist re-registers one — never
    * two for the same live session).
    */
  def evict(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala.filter(_._1 eq s).toList.foreach { k =>
      Option(cache.remove(k)).foreach { df =>
        // the context may already be down mid-shutdown — eviction must
        // still clear the map entry
        try df.unpersist(blocking = false) catch { case _: Throwable => () }
      }
    }
    Option(hooked.remove(s)).foreach { l =>
      try s.sparkContext.removeSparkListener(l) catch { case _: Throwable => () }
    }
  }

  /** Drop (and unpersist) only the entries owned by `s` whose key
    * contains `keyPart` — the dir-scoped cleanup a test that stages
    * frames for a TEMPORARY corpus needs (a blanket [[evict]] there
    * would also unpersist every sf-keyed frame the rest of the suite
    * has warmed, silently ballooning suite runtime).
    */
  def evictMatching(s: SparkSession, keyPart: String): Unit = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala
      .filter(k => (k._1 eq s) && k._2.contains(keyPart)).toList
      .foreach { k =>
        Option(cache.remove(k)).foreach { df =>
          try df.unpersist(blocking = false) catch { case _: Throwable => () }
        }
      }
  }

  /** Number of live entries owned by `s` (spec observability). */
  def size(s: SparkSession): Int = {
    import scala.jdk.CollectionConverters._
    cache.keySet.asScala.count(_._1 eq s)
  }
}
