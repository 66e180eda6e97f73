package graft

import org.scalatest.funsuite.AnyFunSuite

/** Reentrancy contract for the session-scoped staging cache: a build
  * closure may itself stage a second key (dedup.clusters builds on
  * dedup.shingled). The round-4 implementation ran builds inside
  * ConcurrentHashMap.computeIfAbsent, which throws
  * IllegalStateException("Recursive update") whenever the outer and
  * nested (session, key) tuples hash into the same bin — an
  * identity-hash-dependent intermittent crash. These specs force the
  * colliding-bin case deterministically.
  */
class FrameCacheSpec extends AnyFunSuite {
  import SparkTestSession._

  /** CHM bin spread (java.util.concurrent.ConcurrentHashMap.spread). */
  private def spread(h: Int): Int = (h ^ (h >>> 16)) & 0x7fffffff

  test("nested getOrPersist through one build closure (colliding bins)") {
    val outer = "spec.reentrant.outer"
    // find an inner key whose (session, key) tuple lands in the same CHM
    // bin as the outer for any table size up to 64 (same low 6 spread
    // bits) — the exact condition under which the round-4 code crashed
    val outerBits = spread((spark, outer).hashCode()) & 63
    val inner = Iterator.from(0).map(i => s"spec.reentrant.inner.$i")
      .find(k => (spread((spark, k).hashCode()) & 63) == outerBits).get
    val df = FrameCache.getOrPersist(spark, outer) {
      val base = FrameCache.getOrPersist(spark, inner) {
        spark.range(10).toDF("id")
      }
      base.filter(org.apache.spark.sql.functions.col("id") < 5)
    }
    assert(df.count() === 5)
    // both keys cached: repeat builds must be no-ops
    var rebuilt = false
    FrameCache.getOrPersist(spark, outer) { rebuilt = true; spark.range(1).toDF("id") }
    FrameCache.getOrPersist(spark, inner) { rebuilt = true; spark.range(1).toDF("id") }
    assert(!rebuilt, "cached keys were rebuilt")
    // the spec's tiny range frames stay cached until the application-end
    // listener collects them — evict(spark) here would drop other suites'
    // shared stages
  }

  test("concurrent double-build of one key keeps a single cached copy") {
    val key = "spec.race.single"
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new java.util.concurrent.CyclicBarrier(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val futs = (1 to 2).map { _ =>
        pool.submit(new java.util.concurrent.Callable[org.apache.spark.sql.DataFrame] {
          def call() = {
            gate.await()
            FrameCache.getOrPersist(spark, key) {
              builds.incrementAndGet()
              spark.range(7).toDF("id")
            }
          }
        })
      }
      val frames = futs.map(_.get(60, java.util.concurrent.TimeUnit.SECONDS))
      // both callers see the same winning frame; the losing build (if the
      // race fired) was unpersisted, not leaked into the cache
      assert(frames.head eq frames.last)
      assert(frames.head.count() === 7)
      assert(builds.get() >= 1 && builds.get() <= 2)
      var rebuilt = false
      FrameCache.getOrPersist(spark, key) { rebuilt = true; spark.range(1).toDF("id") }
      assert(!rebuilt)
    } finally pool.shutdownNow()
  }
}
