package graft

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR. Each query gets a warm-up execution (codegen,
  * JIT, file listing) and the reported time is the min of two timed
  * runs — steady-state throughput, not allocator noise from whatever
  * query happened to run before it in the shared JVM.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.get(cpus)
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // materialize the FULL plan: .count() would let the optimizer
      // prune every projection expression (a map-only query would time
      // as a metadata read); toRdd executes the physical plan as-is
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        timeOnce(fn)                       // warm-up (not reported)
        math.min(timeOnce(fn), timeOnce(fn))
      } catch { case _: Throwable => -1.0 }
      System.gc()
      name -> t
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
