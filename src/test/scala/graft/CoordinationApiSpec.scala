package graft

import graft.api.CoordinationApi
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class CoordinationApiSpec extends AnyFunSuite {
  import SparkTestSession._

  lazy val api = new CoordinationApi(spark, sf)

  test("fetch returns the latest value per key; firstWrite the first") {
    val ns = "click"
    val byKey = Tables.events(spark, sf)
      .filter(col("event_type") === ns)
      .orderBy(col("ts"), col("event_id"))
      .select(col("user_id"), col("value")).collect()
      .map(r => (r.getLong(0), r.getDouble(1)))
    val someKey = byKey.head._1
    val expectedLatest = byKey.filter(_._1 == someKey).last._2
    val expectedFirst = byKey.filter(_._1 == someKey).head._2
    assert(api.fetch(ns, someKey).contains(expectedLatest))
    assert(api.firstWrite(ns, someKey).contains(expectedFirst))
    assert(api.fetch(ns, 999999L).isEmpty)
  }

  test("snapshot and keySet agree with the registry queries") {
    val snap = api.snapshot("view")
    val full = SparkEntry.queries("kv_snapshot")(spark, sf)
      .filter(col("namespace") === "view")
    assert(snap.count() == full.count())
    assert(api.keySet("view").count() == full.count())
  }

  test("getLeader matches the replay query; membership is consistent") {
    val replay = SparkEntry.queries("leader_election_replay")(spark, sf)
      .collect().map(r => r.getAs[String]("resource") ->
        (r.getAs[Long]("leader"),
          Option(r.get(r.fieldIndex("sup_data"))).map(_.asInstanceOf[Double])))
      .toMap
    replay.foreach { case (res, pair) =>
      assert(api.getLeader(res).contains(pair))
    }
    val members = SparkEntry.queries("group_membership")(spark, sf)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("member")))
    members.take(3).foreach { case (g, m) => assert(api.isMember(g, m)) }
    assert(!api.isMember("click", 999999L))
  }

  test("fetchCas sequential fold equals the distributed kv_storage_replay") {
    val replay = SparkEntry.queries("kv_storage_replay")(spark, sf)
      .filter(col("namespace") === "click").collect()
      .map(r => r.getAs[Long]("key") -> r.getAs[Double]("value")).toMap
    val allKeys = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .select(col("user_id")).distinct().collect().map(_.getLong(0))
    // every key: present in the replay iff fetchCas returns it, same value
    allKeys.take(25).foreach { k =>
      assert(api.fetchCas("click", k) == replay.get(k), s"key $k")
    }
    // deleted/never-put keys exist (replay has fewer keys than the raw set)
    assert(replay.size < allKeys.length)
    assert(api.snapshotCas("click").count() == replay.size)
  }

  test("resign-aware leader and leave-aware membership honor tombstones") {
    val resign = SparkEntry.queries("leader_election_resign")(spark, sf)
      .collect().map(r => r.getAs[String]("resource") ->
        (r.getAs[Long]("leader"),
          Option(r.get(r.fieldIndex("sup_data"))).map(_.asInstanceOf[Double])))
      .toMap
    resign.foreach { case (res, pair) =>
      assert(api.getLeaderResignAware(res).contains(pair))
    }
    // leave-aware membership is a subset of plain TTL membership
    val plain = SparkEntry.queries("group_membership")(spark, sf)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("member"))).toSet
    val leave = SparkEntry.queries("group_membership_leave")(spark, sf)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("member"))).toSet
    assert(leave.subsetOf(plain))
    assert(leave.size < plain.size) // the convention produces real leaves
    leave.headOption.foreach { case (g, _) =>
      assert(api.membershipListLeaveAware(g).count() ==
        leave.count(_._1 == g))
    }
  }

  test("valueChanges matches the feed for one namespace") {
    val viaApi = api.valueChanges("error").count()
    val viaQuery = SparkEntry.queries("value_change_feed")(spark, sf)
      .filter(col("namespace") === "error").count()
    assert(viaApi == viaQuery)
  }

  test("listener registry: attach fires the feed in order, detach goes quiet") {
    import graft.api.{KeySetChangeListener, ListenerRegistry, ValueChangeListener}
    val reg = new ListenerRegistry(api)
    val ns = "click"
    val feed = api.valueChanges(ns)
      .orderBy(col("ts"), col("event_id")).collect()
    // the busiest key gives the ordering check teeth
    val key = feed.groupBy(_.getAs[Long]("key")).maxBy(_._2.length)._1
    val expected = feed.filter(_.getAs[Long]("key") == key)
      .map(_.getAs[Double]("value")).toSeq
    assert(expected.size >= 2)

    val got = scala.collection.mutable.Buffer.empty[Option[Double]]
    val got2 = scala.collection.mutable.Buffer.empty[Option[Double]]
    val l1 = new ValueChangeListener {
      def valueChanged(v: Option[Double]): Unit = got += v }
    val l2 = new ValueChangeListener {
      def valueChanged(v: Option[Double]): Unit = got2 += v }

    assert(!reg.hasValueWatcher(ns, key))
    reg.addValueChangeListener(ns, key, l1)
    assert(reg.hasValueWatcher(ns, key))          // first add attaches
    reg.addValueChangeListener(ns, key, l2)       // second piggybacks
    reg.replayValueChanges(ns)
    assert(got.flatten.toSeq == expected, "feed order/content diverged")
    assert(got2.flatten.toSeq == expected, "second listener missed rows")

    reg.removeValueChangeListener(ns, key, l2)
    assert(reg.hasValueWatcher(ns, key))          // one listener left
    reg.removeValueChangeListener(ns, key, l1)
    assert(!reg.hasValueWatcher(ns, key))         // last remove detaches
    got.clear()
    assert(reg.replayValueChanges(ns) == 0L && got.isEmpty)

    // keyset watcher: one firing per A5 feed row for the namespace
    val ksGot = scala.collection.mutable.Buffer.empty[Set[String]]
    val kl = new KeySetChangeListener {
      def keySetChanged(ks: Set[String]): Unit = ksGot += ks }
    assert(reg.replayKeySetChanges(ns) == 0L)     // nothing attached yet
    reg.addKeySetChangeListener(ns, kl)
    assert(reg.hasKeySetWatcher(ns))
    val fired = reg.replayKeySetChanges(ns)
    assert(fired == api.keySetChanges(ns).count(),
      "compare-and-fire count diverges from the A5 feed")
    assert(ksGot.size == fired)
    reg.removeKeySetChangeListener(ns, kl)
    assert(!reg.hasKeySetWatcher(ns))
  }

  test("leader-change listeners: attach replays the A23 feed, detach goes quiet") {
    import graft.api.{LeaderChangeListener, ListenerRegistry}
    val reg = new ListenerRegistry(api)
    val res = "click"
    val feed = api.leaderChanges(res)
      .orderBy(col("ts"), col("event_id")).collect()
      .map(_.getAs[Long]("new_leader")).toSeq
    assert(feed.size >= 2, "need a resource with real leadership churn")

    val got = scala.collection.mutable.Buffer.empty[Option[Long]]
    val got2 = scala.collection.mutable.Buffer.empty[Option[Long]]
    val l1 = new LeaderChangeListener {
      def onLeaderChange(v: Option[Long]): Unit = got += v }
    val l2 = new LeaderChangeListener {
      def onLeaderChange(v: Option[Long]): Unit = got2 += v }

    assert(reg.replayLeaderChanges(res) == 0L)    // nothing attached yet
    reg.addLeaderChangeListener(res, l1)
    assert(reg.hasLeaderWatcher(res))             // first add attaches
    reg.addLeaderChangeListener(res, l2)          // second piggybacks
    val fired = reg.replayLeaderChanges(res)
    assert(fired == feed.size, "firing count diverges from the A23 feed")
    assert(got.flatten.toSeq == feed, "feed order/content diverged")
    assert(got2.flatten.toSeq == feed, "second listener missed rows")

    reg.removeLeaderChangeListener(res, l2)
    assert(reg.hasLeaderWatcher(res))             // one listener left
    reg.removeLeaderChangeListener(res, l1)
    assert(!reg.hasLeaderWatcher(res))            // last remove detaches
    got.clear()
    assert(reg.replayLeaderChanges(res) == 0L && got.isEmpty)
  }

  test("group-membership listeners: per-tick snapshots fire on change only") {
    import graft.api.{GroupMembershipListener, ListenerRegistry}
    val reg = new ListenerRegistry(api)
    val grp = "signup"
    val got = scala.collection.mutable.Buffer.empty[Set[Long]]
    val gl = new GroupMembershipListener {
      def onGroupChange(m: Set[Long]): Unit = got += m }

    assert(reg.replayGroupChanges(grp) == 0L)     // nothing attached yet
    reg.addGroupMembershipListener(grp, gl)
    assert(reg.hasGroupWatcher(grp))
    val fired = reg.replayGroupChanges(grp)
    // same compare-and-fire dedup as the key-set watcher, typed —
    // firing count must equal the string-keyed replay's
    assert(fired == api.keySetChanges(grp).count(),
      "membership firing count diverges from the A5 feed")
    assert(got.size == fired)
    // every fired snapshot is the tick's member set: ids round-trip
    // through the typed interface (join/leave = set delta between ticks)
    assert(got.sliding(2).forall {
      case scala.collection.mutable.Buffer(a, b) => a != b
      case _ => true
    }, "consecutive identical snapshots should have been deduped")
    reg.removeGroupMembershipListener(grp, gl)
    assert(!reg.hasGroupWatcher(grp))
    got.clear()
    assert(reg.replayGroupChanges(grp) == 0L && got.isEmpty)
  }

  test("plugin locator: getters throw before startup, serve after (reference lifecycle)") {
    import graft.api.GraftPluginLocator
    val loc = new GraftPluginLocator(spark)
    val e1 = intercept[IllegalStateException](loc.getLeaderElection)
    assert(e1.getMessage.contains("startup(configFile)"))
    intercept[IllegalStateException](loc.getListenerRegistry)
    // config-file path, the reference signature
    val f = java.nio.file.Files.createTempFile("graft_plugin", ".properties")
    java.nio.file.Files.writeString(f, s"graft.data.dir=$sf\n")
    loc.startup(f.toString)
    // the served instance answers identically to a directly-built API
    assert(loc.getLeaderElection.getLeader("signup") == api.getLeader("signup"))
    assert(loc.getListenerRegistry != null)
    // a config without the dir key is rejected
    val bad = java.nio.file.Files.createTempFile("graft_plugin_bad", ".properties")
    java.nio.file.Files.writeString(bad, "unrelated=1\n")
    val e2 = intercept[IllegalArgumentException](
      new GraftPluginLocator(spark).startup(bad.toString))
    assert(e2.getMessage.contains("graft.data.dir"))
    // reference Config(file, overrides) signature: overrides replace
    // the file's values key-by-key — here the override SUPPLIES the
    // dir the file lacks, and a TTL override beats the file's value
    java.nio.file.Files.writeString(bad,
      "unrelated=1\ngraft.le.ttl.ms=1000\n")
    val loc3 = new GraftPluginLocator(spark)
    loc3.startup(bad.toString,
      Map("graft.data.dir" -> sf, "graft.le.ttl.ms" -> "7200000"))
    assert(loc3.getLeaderElection.ttl == 7200L * 1000000L,
      "override did not beat the file value")
    java.nio.file.Files.deleteIfExists(f)
    java.nio.file.Files.deleteIfExists(bad)
  }

  test("configured TTL threads through locator, API, and replay queries") {
    import graft.api.GraftPluginLocator
    val ttl30mUs = 1800L * 1000000L
    // locator: graft.le.ttl.ms / graft.lr.pull.period.ms are honored
    val f = java.nio.file.Files.createTempFile("graft_ttl", ".properties")
    java.nio.file.Files.writeString(f,
      s"graft.data.dir=$sf\ngraft.le.ttl.ms=1800000\n" +
        "graft.lr.pull.period.ms=43200000\n")
    val loc = new GraftPluginLocator(spark)
    loc.startup(f.toString)
    val api30 = loc.getLeaderElection
    assert(api30.ttl == ttl30mUs)
    assert(api30.pullPeriod == 43200000L * 1000L)
    // membership at TTL=30m == an independent driver-side replay:
    // latest record per (grp, member), alive iff within 30m of log end
    val ev = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"),
        unix_micros(col("ts")).as("us"), col("event_id")).collect()
    val logEnd = ev.map(_.getLong(2)).max
    val expected = ev.groupBy(r => (r.getString(0), r.getLong(1)))
      .view.mapValues(_.maxBy(r => (r.getLong(2), r.getLong(3))).getLong(2))
      .filter { case (_, us) => us >= logEnd - ttl30mUs }
      .keys.toSet
    val got = graft.queries.Coordination.groupMembershipTtl(ttl30mUs)
      .fn(spark, sf).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("member"))).toSet
    assert(got == expected)
    // the API view is built from the same parameterized query
    expected.groupBy(_._1).foreach { case (g, ms) =>
      val apiMembers = api30.membershipList(g).collect()
        .map(_.getAs[Long]("member")).toSet
      assert(apiMembers == ms.map(_._2))
    }
    // the knob is live: 30m membership must be a subset of the 1h one
    val got1h = SparkEntry.queries("group_membership")(spark, sf).collect()
      .map(r => (r.getAs[String]("grp"), r.getAs[Long]("member"))).toSet
    assert(got.subsetOf(got1h))
    java.nio.file.Files.deleteIfExists(f)
  }

  test("period-floored keyset ticks at one day equal date_trunc('day')") {
    val day = graft.queries.Coordination.DefaultPullPeriodMicros
    val a = graft.queries.Coordination
      .keysetChangeFeedPeriod(day).fn(spark, sf).collect()
      .map(_.toSeq).toSet
    val b = SparkEntry.queries("keyset_change_feed")(spark, sf).collect()
      .map(_.toSeq).toSet
    assert(a == b)
    // a shorter period observes at least as many change ticks
    val hourly = graft.queries.Coordination
      .keysetChangeFeedPeriod(3600L * 1000000L).fn(spark, sf).count()
    assert(hourly >= a.size)
  }

  test("append write path: mutations round-trip through the replay queries") {
    import java.nio.file.{Files, Paths, StandardCopyOption}
    // stage a writable deployment: changelog as a parquet DIRECTORY
    val dir = Files.createTempDirectory("graft_append").toString
    Files.createDirectory(Paths.get(s"$dir/events.parquet"))
    Files.copy(Paths.get(s"$sf/events.parquet"),
      Paths.get(s"$dir/events.parquet/base.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val wapi = new CoordinationApi(spark, dir)
    val logEnd = Tables.events(spark, dir)
      .agg(max(col("ts"))).collect()(0).getTimestamp(0)
    val after = new java.sql.Timestamp(logEnd.getTime + 1000)
    // Storage.put on a fresh key → visible to fetch and kv_snapshot
    val k = 990001L
    assert(wapi.fetch("click", k).isEmpty)
    val id1 = wapi.append("click", k, "put", 7.01, after)
    assert(wapi.fetch("click", k).contains(7.01))
    val snap = graft.queries.Coordination.kvSnapshot.fn(spark, dir)
      .filter(col("namespace") === "click" && col("key") === k).collect()
    assert(snap.length == 1 && snap(0).getAs[Double]("value") == 7.01)
    // update applies over the put (digit forced to 4 → 8.04)
    val id2 = wapi.append("click", k, "update", 8.04, new java.sql.Timestamp(after.getTime + 1000))
    assert(id2 == id1 + 1)
    assert(wapi.fetchCas("click", k).contains(8.04))
    // delete tombstones it under CAS replay
    wapi.append("click", k, "delete", 0.0, new java.sql.Timestamp(after.getTime + 2000))
    assert(wapi.fetchCas("click", k).isEmpty)
    // join/leave drive group_membership (leave-aware)
    val m = 990002L
    wapi.joinGroup("signup", m, 1.01, new java.sql.Timestamp(after.getTime + 3000))
    assert(wapi.membershipListLeaveAware("signup").collect()
      .exists(_.getAs[Long]("member") == m))
    wapi.leaveGroup("signup", m, new java.sql.Timestamp(after.getTime + 4000))
    assert(!wapi.membershipListLeaveAware("signup").collect()
      .exists(_.getAs[Long]("member") == m))
    // op validation and the read-only guard
    intercept[IllegalArgumentException](
      wapi.append("click", k, "upsert", 1.0, after))
    intercept[IllegalArgumentException](
      wapi.append("click", k, "update", -1.0, after))
    intercept[IllegalStateException](
      api.append("click", k, "put", 1.01, after)) // sf testdata: read-only file
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("group-event replay: transition fold ends at the leave-aware live set") {
    import graft.api.{GroupMembershipListener, ListenerRegistry}
    val reg = new ListenerRegistry(api)
    val grp = "signup"
    var last = Option.empty[Set[Long]]
    var fired = 0L
    val gl = new GroupMembershipListener {
      def onGroupChange(m: Set[Long]): Unit = { last = Some(m); fired += 1 } }

    assert(reg.replayGroupEvents(grp) == 0L)      // nothing attached yet
    reg.addGroupMembershipListener(grp, gl)
    val delivered = reg.replayGroupEvents(grp)
    assert(delivered == api.groupChanges(grp).count() && fired == delivered)
    // the fold's END STATE must equal the leave-aware membership list at
    // log end — the feed and the snapshot queries describe one world
    val live = SparkEntry.queries("group_membership_leave")(spark, sf)
      .filter(org.apache.spark.sql.functions.col("grp") === grp)
      .collect().map(_.getAs[Long]("member")).toSet
    assert(last.contains(live),
      s"replayed end state ${last.map(_.size)} != live membership ${live.size}")
    reg.removeGroupMembershipListener(grp, gl)
    assert(reg.replayGroupEvents(grp) == 0L)
  }

  test("storage-mutation listeners: applied ops replay in order, detach goes quiet") {
    import graft.api.{ListenerRegistry, StorageMutationListener}
    val reg = new ListenerRegistry(api)
    val ns = "click"
    // pick the key with the most applied mutations so put/update (and
    // likely delete) are all exercised
    val byKey = api.storageMutations(ns).collect()
      .groupBy(_.getAs[Long]("key"))
    val (key, feedRows) = byKey.maxBy(_._2.length)
    val feed = feedRows.sortBy(r =>
      (r.getAs[java.sql.Timestamp]("ts").getTime, r.getAs[Long]("event_id")))
      .map(r => (r.getAs[String]("op"),
        if (r.isNullAt(r.fieldIndex("new_value"))) None
        else Some(r.getAs[Double]("new_value")))).toSeq
    assert(feed.size >= 2, "need a key with real mutation churn")
    assert(feed.map(_._1).toSet.subsetOf(Set("put", "update", "delete")))
    // deletes carry None, writes carry Some
    feed.foreach { case (op, v) => assert((op == "delete") == v.isEmpty) }

    val got = scala.collection.mutable.Buffer.empty[(String, Option[Double])]
    val l = new StorageMutationListener {
      def onMutation(op: String, v: Option[Double]): Unit = got += ((op, v)) }

    assert(reg.replayStorageMutations(ns) == 0L)  // nothing attached yet
    reg.addStorageMutationListener(ns, key, l)
    assert(reg.hasMutationWatcher(ns, key))       // first add attaches
    reg.replayStorageMutations(ns)
    assert(got.toSeq == feed, "feed order/content diverged")

    reg.removeStorageMutationListener(ns, key, l)
    assert(!reg.hasMutationWatcher(ns, key))      // last remove detaches
    got.clear()
    assert(reg.replayStorageMutations(ns) == 0L && got.isEmpty)
  }
}
