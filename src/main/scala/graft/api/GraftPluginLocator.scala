package graft.api

import java.io.{File, FileInputStream}
import java.util.Properties

import org.apache.spark.sql.SparkSession

/** The reference's plugin entry point re-expressed
  * (CassandraPluginLocator.scala:27-54): `startup(configFile)` wires the
  * two plugin services — leader election and the listener registry —
  * and the getters throw `IllegalStateException` until it has run,
  * word-for-word the reference's lifecycle contract. The Cassandra
  * session the reference builds from `plugin.cassandra.contact.points`
  * maps to the (SparkSession, changelog dir) pair here — the keyspace
  * analog is the parquet changelog location (`graft.data.dir`), read
  * from the same java-properties config shape
  * (src/main/resources/plugin.properties of the reference).
  *
  * Live contact-point plumbing stays out of scope (SURVEY §6 — no
  * broker/Cassandra in the container); this is the drop-in seam a
  * reference caller's bootstrap code goes through.
  */
final class GraftPluginLocator(spark: SparkSession) {

  private var api: CoordinationApi = null
  private var registry: ListenerRegistry = null

  /** Reference signature: configure from a properties file carrying
    * `graft.data.dir` (the keyspace analog) and, optionally, the two
    * liveness knobs the reference exposes in util/Config.scala:62-66 —
    * `graft.le.ttl.ms` (leader-election/membership TTL, default 1h,
    * analog of `plugin.cassandra.le.renew.ttl.period.ms`) and
    * `graft.lr.pull.period.ms` (keyset-watcher poll period, default
    * 1 day, analog of `plugin.cassandra.lr.pull.period.ms`).
    */
  def startup(configFile: String): Unit = startup(configFile, Map.empty)

  /** Reference signature with overrides (util/Config.scala:27-37):
    * entries in `overrides` replace the file's values key-by-key —
    * the bootstrap shape the reference uses to thread broker-level
    * settings over a shared properties file.
    */
  def startup(configFile: String, overrides: Map[String, String]): Unit = {
    val props = new Properties()
    val in = new FileInputStream(new File(configFile))
    try props.load(in) finally in.close()
    overrides.foreach { case (k, v) => props.setProperty(k, v) }
    val dir = Option(props.getProperty("graft.data.dir")).getOrElse(
      throw new IllegalArgumentException(
        s"$configFile does not set graft.data.dir"))
    def msProp(key: String, defaultUs: Long): Long =
      Option(props.getProperty(key)).map { v =>
        val ms = v.trim.toLong
        require(ms > 0, s"$key must be positive, got $ms")
        ms * 1000L
      }.getOrElse(defaultUs)
    startupWithDir(dir,
      msProp("graft.le.ttl.ms",
        graft.queries.Coordination.DefaultTtlMicros),
      msProp("graft.lr.pull.period.ms",
        graft.queries.Coordination.DefaultPullPeriodMicros))
  }

  /** Programmatic form for callers that already hold the dir. */
  def startupWithDir(sfDir: String,
      ttlMicros: Long = graft.queries.Coordination.DefaultTtlMicros,
      pullPeriodMicros: Long =
        graft.queries.Coordination.DefaultPullPeriodMicros): Unit = {
    api = new CoordinationApi(spark, sfDir, ttlMicros, pullPeriodMicros)
    registry = new ListenerRegistry(api)
  }

  /** Leader-election service (getLeader/tenures/resign-aware views) —
    * the CoordinationApi carries the reference LeaderElection surface.
    */
  def getLeaderElection: CoordinationApi =
    Option(api).getOrElse(throw new IllegalStateException(
      "LeaderElection plugin is not initialized. Call " +
        "PluginLocator.startup(configFile) first"))

  def getListenerRegistry: ListenerRegistry =
    Option(registry).getOrElse(throw new IllegalStateException(
      "ListenerRegistry plugin is not initialized. Call " +
        "PluginLocator.startup(configFile) first"))
}
