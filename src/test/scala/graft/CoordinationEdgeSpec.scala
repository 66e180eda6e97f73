package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boundary semantics of the TTL/session logic, pinned with crafted
  * changelogs (the oracle gate covers the bulk distribution; these pin
  * the exact edges).
  */
class CoordinationEdgeSpec extends AnyFunSuite {
  import SparkTestSession._
  import spark.implicits._

  private val T0 = 1700000000000000L // µs
  private val TtlUs = 3600L * 1000000L

  /** Write a crafted changelog as events.parquet in a temp dir. */
  private def changelog(rows: Seq[(Long, Long, Long, String, Double)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_edge").toString
    rows.toDF("event_id", "us", "user_id", "event_type", "value")
      .withColumn("ts", timestamp_micros(col("us"))).drop("us")
      .withColumn("props", lit("{}"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("gap exactly == TTL stays one session; TTL+1us splits") {
    val dir = changelog(Seq(
      (0L, T0, 1L, "r1", 1.0),
      (1L, T0 + TtlUs, 1L, "r1", 1.0),       // == TTL: same session
      (2L, T0, 2L, "r1", 1.0),
      (3L, T0 + TtlUs + 1L, 2L, "r1", 1.0))) // > TTL: new session
    val tenures = SparkEntry.queries("leader_tenures")(spark, dir)
      .collect().map(r => (r.getAs[Long]("candidate"), r.getAs[Long]("n_renewals")))
    val byCand = tenures.groupBy(_._1).view.mapValues(_.length).toMap
    assert(byCand(1L) == 1, s"candidate 1 should have 1 session: $tenures")
    assert(byCand(2L) == 2, s"candidate 2 should have 2 sessions: $tenures")
  }

  test("leader = live candidate with earliest session start, tiebreak id") {
    val end = T0 + TtlUs + 1000L
    val dir = changelog(Seq(
      (0L, T0, 5L, "r1", 1.0),        // starts first but dies (no renewal)
      (1L, end - 10L, 3L, "r1", 1.0), // live, starts later
      (2L, end - 10L, 2L, "r1", 1.0), // live, same start as 3 → id tiebreak
      (3L, end, 9L, "r1", 1.0)))      // live, latest start (defines log end)
    val leaders = SparkEntry.queries("leader_election_replay")(spark, dir)
      .collect().map(r => r.getAs[String]("resource") -> r.getAs[Long]("leader"))
      .toMap
    // candidate 5's session ended > TTL before log end → not live;
    // 2 and 3 tie on session start → lower id wins (CAS stand-in order)
    assert(leaders("r1") == 2L, s"got $leaders")
  }

  test("value change feed: equal-value runs collapse, ts ties break by event_id") {
    val dir = changelog(Seq(
      (0L, T0, 1L, "ns", 1.0),
      (1L, T0 + 1L, 1L, "ns", 1.0),   // same value → suppressed
      (2L, T0 + 2L, 1L, "ns", 2.0),   // change → emitted
      (4L, T0 + 3L, 1L, "ns", 3.0),   // same ts as event 3, higher id → later
      (3L, T0 + 3L, 1L, "ns", 2.0)))  // same ts, lower id: 2.0 == prev → suppressed
    val feed = SparkEntry.queries("value_change_feed")(spark, dir)
      .collect().map(_.getAs[Long]("event_id"))
    assert(feed.toSeq == Seq(0L, 2L, 4L), s"got ${feed.toSeq}")
  }

  test("group membership: heartbeat exactly TTL before log end is still live") {
    val end = T0 + TtlUs
    val dir = changelog(Seq(
      (0L, T0, 1L, "g", 7.0),        // last hb exactly TTL before end → live
      (1L, T0 - 1L, 2L, "g", 8.0),   // 1µs too old → expired
      (2L, end, 3L, "g", 9.0)))      // defines log end
    val members = SparkEntry.queries("group_membership")(spark, dir)
      .collect().map(r => r.getAs[Long]("member") -> r.getAs[Double]("sup_data"))
      .toMap
    assert(members.keySet == Set(1L, 3L), s"got $members")
    assert(members(1L) == 7.0)
  }

  test("kv_ttl_snapshot: strict expiry boundary, latest-wins tiebreak") {
    val H = 3600L * 1000000L
    val ttl = graft.queries.Coordination.KvRowTtlMicros // 24h
    // log end T = T0+48h (key 1's write). Live iff last_write + ttl > T.
    val dir = changelog(Seq(
      (1L, T0 + 48 * H, 1L, "ns", 1.0),       // defines T; live
      (2L, T0 + 24 * H, 2L, "ns", 2.0),       // expires exactly AT T: dead
      (3L, T0 + 24 * H + 1, 3L, "ns", 3.0),   // 1µs inside: live
      (10L, T0 + 47 * H, 4L, "ns", 5.0),      // same-ts pair: event_id
      (11L, T0 + 47 * H, 4L, "ns", 6.0),      //   11 wins → value 6.0
      (4L, T0, 5L, "ns", 9.0)))                // ancient: dead
    val out = SparkEntry.queries("kv_ttl_snapshot")(spark, dir).collect()
      .map(r => r.getAs[Long]("key") ->
        ((r.getAs[Double]("value"), r.getAs[Long]("expires_us")))).toMap
    assert(out.keySet == Set(1L, 3L, 4L), s"live set wrong: $out")
    assert(out(1L) == ((1.0, T0 + 48 * H + ttl)))
    assert(out(3L) == ((3.0, T0 + 24 * H + 1 + ttl)))
    assert(out(4L)._1 == 6.0, "latest-wins tiebreak lost on equal ts")
  }

  test("kv_ttl_snapshot: live set grows monotonically with the TTL") {
    def keys(ttlUs: Long): Set[(String, Long)] =
      graft.queries.Coordination.kvTtlSnapshotTtl(ttlUs).fn(spark, sf)
        .collect()
        .map(r => (r.getAs[String]("namespace"), r.getAs[Long]("key"))).toSet
    val t1 = keys(graft.queries.Coordination.KvRowTtlMicros)
    val t4 = keys(4 * graft.queries.Coordination.KvRowTtlMicros)
    assert(t1.nonEmpty && t1.subsetOf(t4), "longer TTL must keep a superset")
    assert(t4.size > t1.size, "4x TTL should revive some expired keys here")
  }

  test("value_watch_coalesced: intra-tick change-and-revert and same-value " +
      "re-writes never notify; cross-tick change does") {
    val P = graft.queries.Coordination.WatchPullPeriodMicros
    val B = (T0 / P) * P // tick-aligned base
    val dir = changelog(Seq(
      // tick 0: 1.0 -> 2.0 -> 1.0 — the poll sees only the final 1.0
      (1L, B, 1L, "kv", 1.0),
      (2L, B + 10_000_000L, 1L, "kv", 2.0),
      (3L, B + 20_000_000L, 1L, "kv", 1.0),
      // tick 1: re-write of the already-current value — never notifies
      (4L, B + P + 5_000_000L, 1L, "kv", 1.0),
      // tick 2: real change — notifies with prev = 1.0
      (5L, B + 2 * P + 5_000_000L, 1L, "kv", 3.0)))
    try {
      val rows = SparkEntry.queries("value_watch_coalesced")(spark, dir)
        .collect()
        .map(r => (r.getAs[java.sql.Timestamp]("notify_ts").getTime * 1000L,
          r.getAs[Double]("value"),
          Option(r.getAs[java.lang.Double]("prev_value")).map(_.toDouble)))
      assert(rows.toSeq == Seq(
        ((B + P), 1.0, None), // first poll: coalesced final value, not 2.0
        ((B + 3 * P), 3.0, Some(1.0))),
        s"coalesced watch feed wrong: ${rows.toSeq}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
