package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class BucketingSpec extends AnyFunSuite {
  import SparkTestSession._

  test("bucketed fact-fact join plans with ZERO exchanges below the aggregate") {
    val wh = java.nio.file.Files.createTempDirectory("graft_bucketed_wh").toString
    val (li, ord) = Bucketing.ensureBucketed(spark, sf, wh)
    // at test scale AQE would broadcast the small side and never reach
    // the bucketed join path; disable broadcast so the plan shows the
    // mechanics that matter at fact-fact scale (where neither side fits)
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqeBc = scala.util.Try(spark.conf.get(
      "spark.sql.adaptive.autoBroadcastJoinThreshold")).toOption
      .filter(_ != null)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
    val joined = Bucketing.bucketedJoin(spark, li, ord)

    // the join itself must read co-located buckets: no Exchange may
    // appear under the SortMergeJoin — only the final tiny aggregate
    // exchange (1 grouping column, |priorities| rows) survives
    val plan = joined.queryExecution.executedPlan.toString
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin"),
      s"expected bucketed SortMergeJoin, plan:\n$plan")
    assert(!joinSection.contains("Exchange"),
      s"bucketed join should not shuffle either side, plan:\n$plan")

    // and the same join on the raw (unbucketed) tables DOES shuffle —
    // the delta is the point of the technique
    val raw = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"))
    val rawJoinSection = raw.queryExecution.executedPlan.toString
      .split("HashAggregate").last
    assert(rawJoinSection.contains("Exchange"),
      "control: the unbucketed join was expected to shuffle")

    // correctness: bucketed result equals the straightforward join
    val got = joined.collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("n_items"), r.getAs[Double]("sum_qty")))).toMap
    val want = Tables.lineitem(spark, sf)
      .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
          .as("sum_qty"))
      .collect()
      .map(r => r.getAs[String]("o_orderpriority") ->
        ((r.getAs[Long]("n_items"), r.getAs[Double]("sum_qty")))).toMap
    assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
      prevAqeBc match {
        case Some(v) =>
          spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", v)
        case None =>
          spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
      spark.sql(s"DROP TABLE IF EXISTS $li")
      spark.sql(s"DROP TABLE IF EXISTS $ord")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(wh))
    }
  }
}
