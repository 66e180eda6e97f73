package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}

/** Shared runtime partition-pruning witness (round 18, factored out of
  * SimilaritySpec): an `explain` string showing a pruning predicate
  * does NOT prove pruning executed — a planned dynamic filter can
  * silently degrade to `dynamicpruningexpression(true)` at physical
  * planning (measured in round 17). The only trustworthy instrument is
  * the post-execution `numPartitions` driver metric on the file scan:
  * the count of hive partitions the executed scan actually read.
  */
object PruneCheck extends org.scalatest.Assertions {

  /** Recursive physical-plan walk: AQE wraps executed stages. */
  def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      scans(a.executedPlan)
    case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      scans(q.plan)
    case f: FileSourceScanExec => Seq(f)
    case other => other.children.flatMap(scans)
  }

  /** The runtime partitions-read metric of the file scan whose root
    * path contains `tag`, on an ALREADY-EXECUTED plan (the caller
    * collected the frame, or holds a foreachBatch trigger's
    * QueryExecution). Asserts the scan exists and carries a partition
    * filter at all.
    */
  def partitionsRead(qe: org.apache.spark.sql.execution.QueryExecution,
      tag: String): Long = {
    val scan = scans(qe.executedPlan).find(
      _.relation.location.rootPaths.exists(_.toString.contains(tag)))
    assert(scan.isDefined, s"no $tag file scan in the executed plan — " +
      "the probe is not reading the partitioned artifact")
    assert(scan.get.partitionFilters.nonEmpty,
      s"no partition filter on the $tag scan at all")
    val read = scan.get.metrics.get("numPartitions")
      .map(_.value).getOrElse(-1L)
    assert(read >= 0, s"$tag scan reports no numPartitions metric")
    read
  }

  /** Collect `frame` and assert its `tag` scan read strictly fewer than
    * `totalParts` partitions (and more than zero). Returns (rows,
    * partitions read) so callers can additionally pin the exact count
    * and row equality.
    */
  def checkPruned(frame: DataFrame, tag: String,
      totalParts: Int): (Array[org.apache.spark.sql.Row], Long) = {
    val rows = frame.collect()
    assert(rows.nonEmpty)
    val read = partitionsRead(frame.queryExecution, tag)
    assert(read > 0 && read < totalParts,
      s"$tag scan read $read of $totalParts partitions — not pruned")
    (rows, read)
  }
}
