package graft.tools
import graft._
/** Dev tool: print the formatted physical plan (and optionally time) of
  * selected SparkEntry queries at a given SF dir.
  */
object ExplainTool {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    args.foreach { name =>
      println(s"===== $name =====")
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"[time] $name ${(System.nanoTime()-t0)/1e9}%.2f s, $n rows")
      // post-execution adaptive plan: shows which exchanges AQE actually
      // materialized vs reused (the static plan repeats shared subtrees)
      if (sys.env.contains("SPARK_GRAFT_EXPLAIN_FINAL")) {
        df.collect()
        println(s"===== $name (final adaptive plan) =====")
        println(df.queryExecution.executedPlan.toString)
      }
    }
    spark.stop()
  }
}
