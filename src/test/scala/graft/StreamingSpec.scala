package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("stream_change_feed equals the batch value_change_feed") {
    val stream = SparkEntry.queries("stream_change_feed")(spark, sf)
      .collect().map(r => (r.getAs[String]("namespace"), r.getAs[Long]("key"),
        r.getAs[Long]("event_id"))).toSet
    val batch = SparkEntry.queries("value_change_feed")(spark, sf)
      .collect().map(r => (r.getAs[String]("namespace"), r.getAs[Long]("key"),
        r.getAs[Long]("event_id"))).toSet
    assert(stream === batch)
  }

  test("stream_leader_election matches a sequential CAS replay") {
    val ttlUs = 3600L * 1000000L
    val events = Tables.events(spark, sf)
      .select(col("event_type"), col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(e => (e._3, e._4))
    // sequential replay: one pass over the whole log per resource
    val state = scala.collection.mutable.Map.empty[String, (Long, Long)] // leader, lastHb
    val expected = scala.collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
    events.foreach { case (res, cand, us, eid) =>
      state.get(res) match {
        case None =>
          expected += ((res, eid, cand, -1L)); state(res) = (cand, us)
        case Some((leader, lastHb)) if us - lastHb > ttlUs =>
          // expired row: even the former owner re-acquires fresh
          expected += ((res, eid, cand, leader)); state(res) = (cand, us)
        case Some((leader, _)) if leader == cand => state(res) = (cand, us)
        case _ => ()
      }
    }
    val got = SparkEntry.queries("stream_leader_election")(spark, sf)
      .collect().map(r => (r.getAs[String]("resource"), r.getAs[Long]("event_id"),
        r.getAs[Long]("new_leader"), r.getAs[Long]("prev_leader"))).toSet
    assert(got === expected.toSet)
  }

  test("stream_etl_upsert state equals batch compaction") {
    val stream = SparkEntry.queries("stream_etl_upsert")(spark, sf)
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[String]("key"),
        r.getAs[Long]("koffset"))).toSet
    val batch = SparkEntry.queries("etl_upsert_compact")(spark, sf)
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[String]("key"),
        r.getAs[Long]("koffset"))).toSet
    assert(stream === batch)
  }

  test("stateful streaming runs unchanged on the RocksDB state store") {
    // the production state-store provider (HDFSBackedStateStore is the
    // local default); same keyed-state semantics, disk-backed — prove
    // the operators run on it, not just claim they would
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // flatMapGroupsWithState-shaped state ...
      val rocks = SparkEntry.queries("stream_dedup_exact")(spark, sf)
        .collect().map(r => (r.getAs[String]("content_hash"),
          r.getAs[Long]("keeper_doc_id"))).toSet
      val batch = SparkEntry.queries("dedup_exact")(spark, sf)
        .collect().map(r => (r.getAs[String]("content_hash"),
          r.getAs[Long]("keeper_doc_id"))).toSet
      assert(rocks === batch)
      // ... and windowed-aggregation state (collect_set buffers) too
      val feedRocks = SparkEntry.queries("stream_keyset_feed")(spark, sf)
        .collect().map(r => (r.getAs[String]("namespace"),
          r.getAs[java.sql.Timestamp]("tick"), r.getAs[String]("digest"))).toSet
      spark.conf.unset(key)
      val feedDefault = SparkEntry.queries("stream_keyset_feed")(spark, sf)
        .collect().map(r => (r.getAs[String]("namespace"),
          r.getAs[java.sql.Timestamp]("tick"), r.getAs[String]("digest"))).toSet
      assert(feedRocks === feedDefault)
    } finally {
      prev match {
        case Some(v) => spark.conf.set(key, v)
        case None    => spark.conf.unset(key)
      }
    }
  }

  test("upsert sink merges correctly across MULTIPLE micro-batches") {
    // the single-file harness replay runs one batch and never exercises
    // the read-merge-overwrite branch; split the events into 4 files and
    // force one file per trigger so batch 2+ must read back bucket
    // state, merge, and dynamically overwrite only touched partitions
    val srcDir = java.nio.file.Files
      .createTempDirectory("graft_multibatch_src").toString
    Tables.events(spark, sf).repartition(4)
      .write.mode("overwrite").parquet(srcDir)
    val schema = spark.read.parquet(srcDir).schema
    val shaped = graft.queries.Coordination.kafkaShape(
      spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(srcDir))
    val got = graft.streaming.Streaming.runUpsert(spark, shaped)
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[String]("key"),
        r.getAs[Long]("koffset"))).toSet
    val batch = SparkEntry.queries("etl_upsert_compact")(spark, sf)
      .collect().map(r => (r.getAs[String]("topic"), r.getAs[String]("key"),
        r.getAs[Long]("koffset"))).toSet
    assert(got === batch)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(srcDir))
  }
}
