package graft.tools
import graft._

/** Dev tool: cross-SF growth probe (round 16, verdict ask #3). The
  * bench runs only at sf0.1, so O(n·√n) creep is invisible — this
  * times each query at sf0.001/0.01/0.1 (one warm run absorbing stage
  * builds + JIT, then min-of-2) and prints the growth exponent over
  * the decade sf0.01 → sf0.1: exp = log10(t(0.1)/t(0.01)). Fixed
  * per-query overhead (planning, codegen, streaming-harness setup)
  * DEFLATES the exponent, so a reading ≳1.3 is a strong super-linear
  * signal, not noise. Results land in SURVEY §8.14.
  */
object ScalingProbe {
  private val Default = Seq(
    "knn_recall_report", "stream_kv_ttl_upsert", "stream_key_skew_upsert",
    "stream_value_watch", "knn_rerank_sweep", "events_pagerank",
    "knn_probe_sweep", "orders_market_basket", "stream_leader_tenures",
    "supplier_lead_time", "knn_mmr", "source_overlap",
    "stream_group_change_feed", "corpus_curation", "stream_ewma",
    "dedup_banding_sweep", "dedup_winnow_clusters", "stream_ann_index_upsert",
    "stream_ann_codes_upsert")

  def main(args: Array[String]): Unit = {
    val sfs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
      "/root/testdata/sf0.1")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    val names = if (args.nonEmpty) args.toSeq else Default
    println(f"${"query"}%-28s t(.001) t(.01)  t(.1)   exp(.01→.1)")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      val ts = sfs.map { d =>
        fn(spark, d).queryExecution.toRdd.count() // warm: stages + JIT
        (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, d).queryExecution.toRdd.count()
          (System.nanoTime() - t0) / 1e9
        }.min
      }
      val exp = math.log(ts(2) / ts(1)) / math.log(10.0)
      println(f"$name%-28s ${ts(0)}%6.2f  ${ts(1)}%6.2f  ${ts(2)}%6.2f  $exp%5.2f")
    }
    spark.stop()
  }
}
