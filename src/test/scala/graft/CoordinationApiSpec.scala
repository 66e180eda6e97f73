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
      .collect().map(r => r.getAs[String]("resource") -> r.getAs[Long]("leader"))
      .toMap
    replay.foreach { case (res, leader) =>
      assert(api.getLeader(res).contains(leader))
    }
    val members = SparkEntry.queries("group_membership")(spark, sf)
      .collect().map(r => (r.getAs[String]("grp"), r.getAs[Long]("member")))
    members.take(3).foreach { case (g, m) => assert(api.isMember(g, m)) }
    assert(!api.isMember("click", 999999L))
  }

  test("valueChanges matches the feed for one namespace") {
    val viaApi = api.valueChanges("error").count()
    val viaQuery = SparkEntry.queries("value_change_feed")(spark, sf)
      .filter(col("namespace") === "error").count()
    assert(viaApi == viaQuery)
  }
}
