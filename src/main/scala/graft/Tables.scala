package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver testdata star schema.
  *
  * All graft operators take the scale-factor directory as a parameter so
  * the same code runs at sf0.001 (smoke), sf0.01 (oracle) and sf0.1+
  * (bench) — and, unchanged, against a cluster-scale warehouse path.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Normalize events.ts to TIMESTAMP (LTZ, micro precision) across
    * generator vintages, so every downstream `unix_micros(ts)` call
    * site sees one type:
    *  - TIMESTAMP(NANOS) files (rounds ≤8): Spark's vectorized reader
    *    rejects nanos, so they are read as raw longs
    *    (spark.sql.legacy.parquet.nanosAsLong — set in
    *    [[graft.GraftSession]]) and truncated to micros with exact
    *    integer floor-division, matching DuckDB's nanos→micros
    *    truncation so oracle timestamps are bit-identical.
    *  - TIMESTAMP(MICROS, not UTC-adjusted) files (round 9 regen):
    *    Spark reads TIMESTAMP_NTZ, which LTZ-only functions
    *    (unix_micros) reject; cast to TIMESTAMP — the session zone is
    *    pinned UTC, so the wall clock (and the stored micros DuckDB
    *    sees) is unchanged.
    */
  private[graft] def withMicroTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        // exact integer FLOOR division (DIV alone truncates toward zero,
        // which would diverge from DuckDB's floor for pre-epoch nanos)
        df.withColumn("ts", expr(
          "timestamp_micros(ts DIV 1000 - (CASE WHEN ts % 1000 < 0 THEN 1 ELSE 0 END))"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }

  /** Name → loader, the single source of which tables need
    * normalization beyond a raw read (currently only events).
    */
  def loaders: Map[String, (SparkSession, String) => DataFrame] =
    names.map { n =>
      n -> (if (n == "events") events _ else load(_: SparkSession, _: String, n))
    }.toMap

  /** Ingest-spread for map-KERNEL-HEAVY consumers: when the parquet
    * scan yields far fewer partitions than the session's parallelism
    * (the local test files are single-row-group, so the map side would
    * run on one core), hash-repartition on the row key to the full
    * executor width. Only worth it above expensive kernels
    * (shingle/minhash/SRP signature computation — measured 4–12×
    * faster) — for cheap map work the extra exchange of the raw rows
    * costs more than the single-task compute it saves, so this is
    * opt-in per consumer, NOT applied to every load. At warehouse
    * scale scans split natively into thousands of partitions and the
    * guard keeps it a no-op; hash-by-key is deterministic, so results
    * are unaffected.
    */
  private[graft] def spread(df: DataFrame, s: SparkSession, key: String): DataFrame = {
    val target = s.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 >= target) df
    else df.repartition(target, org.apache.spark.sql.functions.col(key))
  }

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame    = withMicroTs(load(s, d, "events"))
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}

/** One engine operator exposed through the driver contract: a named
  * DataFrame builder plus (when SQL-expressible) the exact DuckDB oracle.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String] = None)

object QueryDef {
  def oracled(name: String, sql: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, Some(sql))
  def rowsOnly(name: String)(fn: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, fn, None)
}
