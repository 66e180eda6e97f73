package graft

import org.apache.spark.sql.SparkSession

/** Canonical session settings for the engine. On a real cluster only
  * master/memory/shuffle-partition sizing changes; semantics-bearing
  * configs (UTC, nanos handling, AQE) stay identical.
  */
object GraftSession {
  def builder(cpus: String): SparkSession.Builder =
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      // events.parquet stores TIMESTAMP(NANOS); read as raw long nanos
      // and truncate explicitly (Tables.withMicroTs) — exact arithmetic,
      // identical to DuckDB's truncation.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")

  def get(cpus: String): SparkSession = {
    val s = builder(cpus).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    // opt-in persistent staged-artifact store (FrameCache disk layer):
    // point SPARK_GRAFT_INDEX_DIR at a directory and every staged
    // index artifact (PQ codebooks/codes, capped inverted indexes,
    // cluster maps, kNN candidate pairs) is written there once and
    // LOADED — not rebuilt — by every later session/JVM. The
    // build-once / ship-the-artifact production model; unset = the
    // session-scoped behavior of rounds 1-12.
    sys.env.get("SPARK_GRAFT_INDEX_DIR").filter(_.nonEmpty)
      .foreach(d => s.conf.set(FrameCache.IndexDirConf, d))
    s
  }
}
