package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Forces the scale claim SURVEY makes for the dedup band joins: a
  * pathological hot band bucket (here 10% of all rows in ONE bucket —
  * the boilerplate-header shape at warehouse scale) must be SPLIT by
  * AQE skew-join across tasks, not serialized through one reducer.
  *
  * AQE's skew trigger is byte-based (partition > factor x median AND >
  * skewedPartitionThresholdInBytes, 256 MB default) — at test scale
  * every partition is KBs, so the thresholds are lowered to make the
  * mechanism observable; the MECHANISM, not the threshold constants,
  * is what the test pins. Broadcast is disabled so the join keeps the
  * shuffle (at 100 TB neither band side broadcasts), matching the
  * plan shape the claim is about.
  */
class DedupSkewSpec extends AnyFunSuite {
  import SparkTestSession._

  private val NDocs = 20000
  private val NBuckets = 997 // cold spread; ~18 docs per cold bucket

  /** doc → bucket: docs 0 mod 10 pile into the one hot bucket (10%),
    * the rest spread uniformly. Padded to band-bucket string width so
    * shuffle bytes resemble the real "b:h1:h2:h3:h4" keys.
    */
  private def bucketOf(id: Int): String =
    if (id % 10 == 0) "hot:0000000000:0000000000:0000000000:0000000000"
    else {
      val b = id % NBuckets
      s"cold:$b:${b * 7919}:${b * 104729}:${b * 1299709}"
    }

  test("band join splits a 10%-hot bucket via AQE skew-join, exact pairs") {
    val conf = spark.conf
    val tuned = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "1KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "2KB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      // enough initial shuffle partitions that the hot bucket DOMINATES
      // its partition (skew is judged vs the median partition; with the
      // session's 4 partitions the hot bucket hides among ~250 cold
      // buckets per partition and nothing is skewed)
      "spark.sql.shuffle.partitions" -> "200")
    val saved = tuned.keys.map(k => // unset keys read as null or throw
      k -> scala.util.Try(Option(conf.get(k))).toOption.flatten).toMap
    tuned.foreach { case (k, v) => conf.set(k, v) }
    try {
      import spark.implicits._
      val bands = (0 until NDocs)
        .map(id => (id.toLong, bucketOf(id))).toDF("doc_id", "bucket")
        .repartition(8) // give AQE per-partition stats to diagnose
      val cand = queries.Dedup.bandCandidates(bands)
      // execute THIS queryExecution (a .count() builds its own plan
      // tree whose adaptive execution is separate) so the executedPlan
      // below is the final adaptive plan of the inspected query
      val qe = cand.queryExecution
      val got = qe.toRdd.count()

      // exact expected pair count from the same driver-side assignment
      val sizes = (0 until NDocs).groupBy(bucketOf).values.map(_.size.toLong)
      val expected = sizes.map(n => n * (n - 1) / 2).sum
      assert(got == expected, s"pair count $got != $expected")

      // the executed (final adaptive) plan must mark the join skew-split
      val plan = qe.executedPlan.toString
      assert(plan.contains("skew=true"),
        "no skew-split join in the executed plan:\n" + plan.take(3000))
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }
}
