package graft.tools
import graft._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool (r19): interleaved A/B of knn_recall_report shapes on one
  * warm session — A = the registered implementation (whatever shape is
  * compiled in), B = r18's 4-thread driver-pool materialization of the
  * same 9 per-method report rows. Same rows either way; this measures
  * shape, not semantics.
  */
object RecallAB {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val runs = sys.env.getOrElse("SPARK_GRAFT_RUNS", "4").toInt
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    if (spark.conf.get(FrameCache.IndexDirConf, "").isEmpty)
      spark.conf.set(FrameCache.IndexDirConf, FrameCache.defaultIndexDir)
    // bench-like warm-up: stage the similarity artifacts first
    queries.Similarity.warmStages(spark, sfDir)
    val a = SparkEntry.queries("knn_recall_report")
    def timeit(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[recallab] $label ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def poolVariant(s: SparkSession, d: String): DataFrame = {
      val exact = broadcast(queries.Similarity.exactAnchor(s, d))
      val denom = exact
        .agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact")).localCheckpoint()
      val exactMip = broadcast(queries.Similarity.exactMipAnchor(s, d))
      val denomMip = exactMip
        .agg(countDistinct(col("query_id")).as("n_queries"),
          count(lit(1)).as("n_exact")).localCheckpoint()
      def row(name: String, approx: DataFrame, anchor: DataFrame,
          anchorDenom: DataFrame): DataFrame = {
        val hits = approx.select(col("query_id"), col("neighbor_id"))
          .join(anchor, Seq("query_id", "neighbor_id"))
        anchorDenom.crossJoin(hits.agg(count(lit(1)).as("n_hits")))
          .select(lit(name).as("method"), col("n_queries"),
            lit(queries.Similarity.K).as("k"),
            col("n_exact"), col("n_hits"),
            (col("n_hits").cast("double") / col("n_exact")).as("recall"))
      }
      val im = queries.Similarity
      val specs: Seq[() => DataFrame] = Seq(
        () => row("knn_lsh", im.lsh.fn(s, d), exact, denom),
        () => row("knn_ivf", im.ivf.fn(s, d), exact, denom),
        () => row("knn_pq", im.pq.fn(s, d), exact, denom),
        () => row("knn_ivfpq", im.ivfPq.fn(s, d), exact, denom),
        () => row("knn_quantized", im.quantized.fn(s, d), exact, denom),
        () => row("knn_binary", im.binary.fn(s, d), exact, denom),
        () => row("knn_graph", im.graph.fn(s, d)
          .filter(col("query_id") < im.NQueries), exact, denom),
        () => row("knn_maxip_lsh", im.maxipLsh.fn(s, d), exactMip, denomMip))
      val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
      val rows =
        try {
          import scala.concurrent._
          import scala.concurrent.duration._
          implicit val ec: ExecutionContext =
            ExecutionContext.fromExecutor(pool)
          Await.result(
            Future.sequence(specs.map { mk =>
              Future { mk().localCheckpoint() } }), Duration.Inf)
        } finally pool.shutdown()
      rows.reduce(_ unionAll _).orderBy(col("method"))
    }
    (1 to runs).foreach { i =>
      timeit(s"A(registered) $i")(
        a(spark, sfDir).queryExecution.toRdd.count())
      timeit(s"B(pool4) $i")(
        poolVariant(spark, sfDir).queryExecution.toRdd.count())
    }
    spark.stop()
  }
}
