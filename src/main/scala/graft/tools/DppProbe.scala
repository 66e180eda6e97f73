package graft.tools

/** Dev tool: execute the IVF probe against the partitioned artifact
  * store and print the lists scan's partition filters + post-execution
  * driver metrics — the instrument that distinguishes a PLANNED dynamic
  * pruning filter from one that actually pruned at runtime
  * (`dynamicpruningexpression(true)` is the silent fallback). Extra
  * confs via DPP_CONF="k=v;k=v".
  */
object DppProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = graft.GraftSession.get(sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    sys.env.get("DPP_CONF").foreach(_.split(";").filter(_.nonEmpty).foreach { kv =>
      val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
    })
    val nProbe = sys.env.getOrElse("DPP_NPROBE", "1").toInt
    val df =
      if (sys.env.contains("DPP_MINIMAL")) {
        // canonical star-join DPP shape: selective dim broadcast-joined
        // to a k-partitioned fact
        import org.apache.spark.sql.functions._
        val dir = java.nio.file.Files.createTempDirectory("dpp_min").toString
        sys.addShutdownHook(org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(dir)))
        spark.range(10000).toDF("id")
          .withColumn("k", pmod(col("id"), lit(16)))
          .withColumn("v", col("id") * 2)
          .repartition(col("k"))
          .write.mode("overwrite").partitionBy("k").parquet(s"$dir/fact")
        val fact = spark.read.parquet(s"$dir/fact")
        val dim =
          if (sys.env.contains("DPP_DIM_CKPT"))
            spark.range(16).toDF("k")
              .withColumn("r", row_number().over(
                org.apache.spark.sql.expressions.Window.orderBy(col("k"))))
              .filter(col("r") <= 3).select(col("k"))
              .localCheckpoint()
              .filter(col("k") >= 0)
          else if (sys.env.contains("DPP_DIM_WINDOW"))
            spark.range(16).toDF("k")
              .withColumn("r", row_number().over(
                org.apache.spark.sql.expressions.Window.orderBy(col("k"))))
              .filter(col("r") <= 3).select(col("k"))
          else spark.range(16).toDF("k").filter(col("k") < 3)
        fact.join(broadcast(dim), Seq("k")).groupBy(col("k"))
          .agg(sum(col("v")).as("sv"))
      } else graft.queries.Similarity.ivfFrame(spark, sfDir, nProbe)
    df.collect()
    def scans(p: org.apache.spark.sql.execution.SparkPlan)
        : Seq[org.apache.spark.sql.execution.FileSourceScanExec] = p match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        scans(a.executedPlan)
      case q: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        scans(q.plan)
      case f: org.apache.spark.sql.execution.FileSourceScanExec => Seq(f)
      case o => o.children.flatMap(scans)
    }
    scans(df.queryExecution.executedPlan).foreach { f =>
      println("SCAN ..." + f.relation.location.rootPaths.mkString(",").takeRight(60))
      println("  filters: " + f.partitionFilters.mkString(" ; "))
      println("  metrics: " + f.metrics.toSeq.sortBy(_._1)
        .map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
    }
    spark.stop()
  }
}
