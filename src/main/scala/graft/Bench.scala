package graft

/** Driver-run benchmark: one JSON line with per-query seconds at
  * SPARK_GRAFT_SF_DIR.
  *
  * Methodology (round 6):
  *  - The dedup family's shared FrameCache stages (shingle frame,
  *    capped index, cluster map) are warmed BEFORE the timed loop and
  *    reported as their own `_stage` line item. Rounds 4-5 let the
  *    first query to touch a stage absorb its build (alphabetical
  *    accident: corpus_decontaminate), which made per-query numbers
  *    swing up to 5.8x between runs of byte-identical code.
  *  - Every query executes `SPARK_GRAFT_BENCH_RUNS` (default 3) times;
  *    if the median still exceeds 1 s, two more runs are added
  *    (median-of-5) — heavy queries are exactly where scheduler/GC
  *    noise is largest relative to the regression signal.
  *  - The reported figure is the MEDIAN: the first run carries
  *    residual first-touch costs (codegen, JIT, file listing) and the
  *    median discards it unless the query is genuinely that slow
  *    repeatedly, which is the regression signal we want.
  *
  * Record format: the driver captures only the LAST 2000 characters of
  * stdout, and sbt appends a ~76-char "[success] ..." trailer after our
  * line — every record through round 5 was clipped mid-line and
  * unparseable (`parsed: null`). So the line is kept under ~1920 chars:
  * values are Locale.ROOT-formatted (a comma-decimal default locale
  * would emit invalid JSON) at 2 decimals with trailing zeros stripped
  * (1 decimal at >= 10 s, integral at >= 100 s), and `sf` is the
  * numeric scale factor, not the full directory path.
  */
object Bench {

  /** Locale-ROOT, precision-banded, trailing-zero-stripped number. */
  private[graft] def fmt(v: Double): String = {
    val dp = if (math.abs(v) >= 100) 0 else if (math.abs(v) >= 10) 1 else 2
    val s = String.format(java.util.Locale.ROOT, s"%.${dp}f", Double.box(v))
    if (!s.contains('.')) s
    else {
      val t = s.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      if (t.isEmpty || t == "-") "0" else t
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.get(cpus)
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // materialize the FULL plan: .count() would let the optimizer
      // prune the very projections being measured; toRdd executes the
      // physical plan as-is
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // shared-stage warm-up, off the measured path, reported separately
    val stage0 = System.nanoTime()
    queries.Dedup.warmStages(spark, sfDir)
    val stageSec = (System.nanoTime() - stage0) / 1e9
    def median(xs: Seq[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t = try {
        val raw0 = Seq.fill(runs)(timeOnce(fn))
        // heavy queries get median-of-5: noise scales with runtime
        val raw = if (median(raw0) > 1.0 && runs < 5)
          raw0 ++ Seq.fill(5 - runs)(timeOnce(fn)) else raw0
        // per-run times to stderr on demand — the variance instrument
        // that pins down whether a slow median is consistent cost or a
        // one-off (first-touch, GC) the median already discards
        if (debug) System.err.println(
          "[bench] " + name + " runs=" +
            raw.map(x => String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))).mkString(","))
        median(raw)
      } catch { case _: Throwable => -1.0 }
      System.gc()
      name -> t
    }
    val qs = (("_stage" -> stageSec) +: results)
      .map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum + stageSec
    // numeric sf from the directory basename ("sf0.1" -> 0.1)
    val sfName = new java.io.File(sfDir).getName
    val sfNum = sfName.stripPrefix("sf")
    val sfJson = if (scala.util.Try(sfNum.toDouble).isSuccess) sfNum
      else "\"" + sfName + "\""
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$qs,"sf":$sfJson}""")
    spark.stop()
  }
}
