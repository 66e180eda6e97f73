package graft.api

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Bounded-memory feed iteration for the driver-side callback layer
  * (ListenerRegistry replays, CoordinationApi.fetchCas): stream a
  * feed's rows to the driver in order WITHOUT collecting it whole — a
  * pathological single-key history must not OOM the driver — and
  * without a job per shuffle partition either (`toLocalIterator` runs
  * one Spark job per partition; over a plain `orderBy` that is one
  * job per shuffle partition — ~200 scheduler round-trips on default
  * cluster confs for a feed that fits in kilobytes). Range-partition
  * the feed into a FIXED small partition count and sort within:
  * RangePartitioner assigns ascending key ranges to ascending
  * partition ids, so iterating partitions in index order preserves
  * the global order at `FeedParts` jobs flat, with driver memory
  * bounded by one range's rows.
  */
private[api] object FeedIter {
  private val FeedParts = 4

  def rows(df: DataFrame, order: Column*): Iterator[Row] = {
    import scala.jdk.CollectionConverters._
    df.repartitionByRange(FeedParts, order: _*)
      .sortWithinPartitions(order: _*)
      .toLocalIterator().asScala
  }
}
