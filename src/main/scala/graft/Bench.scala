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
  *  - Every query executes `SPARK_GRAFT_BENCH_RUNS` (default 3) times,
  *    INTERLEAVED: the whole suite runs as separated passes (pass 1 of
  *    everything, then pass 2, ...), then queries whose fastest time
  *    still exceeds 1 s get two extra passes. Contention on this box
  *    arrives in multi-second bursts — back-to-back samples of one
  *    query all land inside a burst and no order statistic can recover
  *    the true cost; interleaving spreads each query's samples across
  *    the full suite duration (minutes apart), so a burst poisons at
  *    most one sample.
  *  - The reported figure is the MINIMUM. The shared-JVM noise here is
  *    strictly one-sided (GC pauses, CPU contention from co-tenant
  *    processes, first-touch JIT/codegen) — it only ever ADDS time —
  *    so min-of-N estimates the noise-free steady-state cost and is
  *    the reproducible statistic. Measured on this box: two
  *    back-to-back median-of-3/5 runs of identical code disagreed
  *    >25% on 19 of 73 queries (up to 4.3x); non-interleaved min still
  *    left 12 (correlated bursts); tools/bench_variance.py is the
  *    committed two-run check.
  *
  * Record format: the driver captures only the LAST 2000 characters of
  * stdout, and sbt appends a ~64-char "[success] ..." trailer after our
  * line — every record through round 5 was clipped mid-line and
  * unparseable (`parsed: null`). So the line is kept inside the budget
  * by an adaptive ladder: values are Locale.ROOT-formatted (a
  * comma-decimal default locale would emit invalid JSON) at 2 decimals,
  * degrading to 1 decimal, then dropping the `_stage` entry to stderr,
  * then folding the cheapest queries into one aggregate `_rest` entry.
  * `sf` is the numeric scale factor, and every run also writes the
  * full-precision unbudgeted record to BENCH_local.json.
  */
object Bench {

  // driver tail = 2000 chars, sbt's "[success] Total time: ..."
  // trailer + newlines ≈ 64 chars land after our line
  private val MaxLineChars = 1930

  /** Locale-ROOT, precision-capped, trailing-zero-stripped number. */
  private[graft] def fmt(v: Double, maxDp: Int = 2): String = {
    val dp = if (math.abs(v) >= 100) 0
      else if (math.abs(v) >= 10) math.min(1, maxDp) else maxDp
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
    // Default the artifact store to the gate's index dir (round 16 —
    // r15 "what's wrong" #3): the driver's per-round bench run sets no
    // SPARK_GRAFT_INDEX_DIR, so it ran session-mode — staged builds
    // landed inside query times and the round-named artifact was a
    // 263 s cold run while the gated (warm-load) artifact said 190 s.
    // Benching is the ONE main whose numbers are compared across
    // rounds, so it defaults to the store the gate populates: same box
    // ⇒ warm-load ≈ the gated numbers; fresh box ⇒ cold-build, both
    // recorded honestly in stage_mode. Explicit env still overrides;
    // other mains keep the opt-in default. The default is USER-scoped
    // (round 17 — r16 advice: a fixed world-writable /tmp path lets any
    // local user pre-create the store; the _GRAFT_META validation on
    // load is the second half of that fix) and gate.sh exports the same
    // path so the driver's env-less bench stays warm-load.
    if (spark.conf.get(FrameCache.IndexDirConf, "").isEmpty)
      spark.conf.set(FrameCache.IndexDirConf, FrameCache.defaultIndexDir)
    // a bench never races a live cross-JVM publisher (the gate runs
    // its bench invocations serially) — don't let a crashed earlier
    // run's unmarked artifact stall every affected key for the full
    // production publish grace
    if (spark.conf.get(FrameCache.PublishGraceConf, "").isEmpty)
      spark.conf.set(FrameCache.PublishGraceConf, "5000")
    def timeOnce(fn: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      // materialize the FULL plan: .count() would let the optimizer
      // prune the very projections being measured; toRdd executes the
      // physical plan as-is
      fn(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    val debug = sys.env.contains("SPARK_GRAFT_BENCH_DEBUG")
    // box-contention fingerprint: the MAX 1-min loadavg sampled across
    // the WHOLE run — before staging, after each stage family, and
    // after every pass. Staging is exactly the phase the degraded-box
    // gate fingerprints via _stage, so it must be inside the sampling
    // window. Our own local[32] work contributes; the signal is read
    // relative to other runs of the same suite.
    var loadMax = 0.0
    // synchronized: warmTimed now samples from concurrent family threads
    def sampleLoad(): Unit = Bench.synchronized {
      try {
        val l = new String(java.nio.file.Files.readAllBytes(
          java.nio.file.Paths.get("/proc/loadavg"))).split(" ")(0).toDouble
        if (l > loadMax) loadMax = l
      } catch { case _: Throwable => () }
    }
    sampleLoad()
    // shared-stage warm-up, off the measured path, reported separately;
    // per-family split to stderr — the diagnostic that tells a real
    // staging regression from a contended/cold box (first-touch JIT,
    // codegen, and first parquet reads all land in the first family)
    val stage0 = System.nanoTime()
    def warmTimed(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      System.err.println("[bench] _stage " + label + " " +
        String.format(java.util.Locale.ROOT, "%.2f",
          Double.box((System.nanoTime() - t0) / 1e9)) + " s")
      sampleLoad()
    }
    // Families warm CONCURRENTLY (r18): the staged loads are
    // independent parquet scans, and even the cold builds only share a
    // few cross-family kernels (text.winnowsel feeds dedup.winnowIdx),
    // which now build exactly once under FrameCache's per-key build
    // locks whichever family thread gets there first. Per-family
    // stderr lines are wall-clock ELAPSED of overlapping regions —
    // they no longer sum to `_stage` (the diagnostic caveat; in cold
    // mode a shared kernel's cost lands under whichever family built
    // it). `_stage` itself stays the honest wall time of the whole
    // warm-up window.
    val (diskB0, diskL0) = FrameCache.diskStats
    FrameCache.warmConcurrently(Seq(
      () => warmTimed("text")(queries.TextAnalysis.warmStages(spark, sfDir)),
      () => warmTimed("dedup")(queries.Dedup.warmStages(spark, sfDir)),
      () => warmTimed("similarity")(
        queries.Similarity.warmStages(spark, sfDir)),
      () => warmTimed("multimodal")(
        queries.Multimodal.warmStages(spark, sfDir))))
    val stageSec = (System.nanoTime() - stage0) / 1e9
    // stage-mode marker (round 14 — r13 advice): with the artifact
    // store on, run 1 of a gate pays cold build+write (~4x the warm
    // load) — without a mode flag in the record, cross-round _stage
    // comparisons attribute cache warmth to code changes (or a warm
    // cache masks a real staging regression). "session" = no store,
    // "cold-build" = any artifact built this run, "warm-load" = all
    // artifacts loaded.
    val (diskB1, diskL1) = FrameCache.diskStats
    // provisional mode from the warm-up window alone; finalized after
    // the passes (see below) so an artifact built LAZILY during a query
    // pass — outside the warmStages window — still flips the label to
    // cold-build instead of silently reading as "session"/"warm-load",
    // the cross-round misattribution this marker exists to prevent
    def modeFrom(b: Long, l: Long): String =
      if (spark.conf.get(FrameCache.IndexDirConf, "").isEmpty) "session"
      else if (b > 0) "cold-build"
      else if (l > 0) "warm-load"
      else "session"
    System.err.println(s"[bench] _stage mode ${modeFrom(diskB1 - diskB0, diskL1 - diskL0)} " +
      s"(warm-up: artifacts built ${diskB1 - diskB0}, loaded ${diskL1 - diskL0})")
    val named = SparkEntry.queries.toSeq.sortBy(_._1)
    val samples = scala.collection.mutable.Map.empty[String, List[Double]]
    def pass(sel: Seq[(String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame)]): Unit = {
      sel.foreach { case (name, fn) =>
        val t = try timeOnce(fn) catch { case _: Throwable => -1.0 }
        samples(name) = t :: samples.getOrElse(name, Nil)
        System.gc()
      }
      sampleLoad()
    }
    (1 to runs).foreach(_ => pass(named))
    // heavy queries get two extra interleaved passes: noise scales
    // with runtime (an errored query stays errored — no retry credit)
    val heavy = named.filter { case (n, _) =>
      val s = samples(n); s.forall(_ >= 0) && s.min > 1.0 }
    if (runs < 5) (1 to 2).foreach(_ => pass(heavy))
    val results = named.map { case (name, _) =>
      val s = samples(name)
      // per-run times to stderr on demand — the variance instrument
      // that pins down whether a slow min is consistent cost or the
      // whole sample was contended
      if (debug) System.err.println(
        "[bench] " + name + " runs=" + s.reverse
          .map(x => String.format(java.util.Locale.ROOT, "%.2f", Double.box(x))).mkString(","))
      name -> (if (s.exists(_ < 0)) -1.0 else s.min)
    }
    // finalize stage_mode over the WHOLE run — warm-up plus every pass
    val (diskB2, diskL2) = FrameCache.diskStats
    val stageMode = modeFrom(diskB2 - diskB0, diskL2 - diskL0)
    System.err.println(s"[bench] _stage mode $stageMode " +
      s"(whole run: artifacts built ${diskB2 - diskB0}, loaded ${diskL2 - diskL0})")
    val total = results.map(_._2).filter(_ >= 0).sum + stageSec
    // numeric sf from the directory basename ("sf0.1" -> 0.1)
    val sfName = new java.io.File(sfDir).getName
    val sfNum = sfName.stripPrefix("sf")
    val sfJson = if (scala.util.Try(sfNum.toDouble).isSuccess) sfNum
      else "\"" + sfName + "\""
    // adaptive precision ladder: 2dp → 1dp → drop _stage (to stderr) →
    // integral seconds at >= 10 s — so the line stays parseable inside
    // the driver's stdout tail as the query surface grows (hard floor
    // ≈ 23 chars/query → ~85 queries; past that the per-query map
    // itself outgrows the tail)
    def record(entries: Seq[(String, Double)], dp: Int): String = {
      val qs = entries.map { case (k, v) =>
        "\"" + k + "\":" + fmt(v, if (dp == 0 && math.abs(v) >= 10) 0 else math.max(dp, 1)) }
        .mkString("{", ",", "}")
      s"""{"metric":"total","value":${fmt(total, math.max(dp, 1))},"unit":"sec","queries":$qs,"sf":$sfJson,"load":${fmt(loadMax, 1)},"stage_mode":"$stageMode"}"""
    }
    val withStage = ("_stage" -> stageSec) +: results
    // final rung: fold the cheapest queries into one aggregate `_rest`
    // entry (count + summed seconds) until the line fits — totals stay
    // honest, errored queries (-1) are never hidden, and the dropped
    // per-query detail lives in BENCH_local.json. `_stage` is NEVER
    // folded: it is the degraded-box fingerprint bench_refresh.py and
    // the round comparisons gate on, and worth more in the driver
    // record than the cheapest per-query line items it displaces.
    def shrinkToFit(): String = {
      val droppable = results.filter(_._2 >= 0).sortBy(_._2)
      var k = 1
      var line = record(withStage, 1)
      while (line.length > MaxLineChars && k <= droppable.size) {
        val dropped = droppable.take(k).map(_._1).toSet
        val kept = withStage.filterNot(e => dropped.contains(e._1))
        line = record(kept ++ Seq("_rest_n" -> k.toDouble,
          "_rest" -> droppable.take(k).map(_._2).sum), 1)
        k += 1
      }
      line
    }
    val line = Iterator(record(withStage, 2), record(withStage, 1))
      .find(_.length <= MaxLineChars)
      .getOrElse(shrinkToFit())
    if (!line.contains("_stage")) System.err.println(
      f"[bench] _stage=$stageSec%.2f s (dropped from the record to fit the stdout tail)")
    if (line.length > MaxLineChars) System.err.println(
      s"[bench] record ${line.length} chars exceeds $MaxLineChars — driver tail may clip it")
    // full-precision record (2dp, _stage included, no length budget) as
    // a local artifact — the stdout line is the driver's record and may
    // have shed precision or _stage to fit the tail. Written to a
    // SCRATCH path by default: the committed BENCH_local.json is only
    // refreshed by tools/bench_refresh.py after a two-run variance +
    // degraded-box gate (round 7 shipped a contended-box artifact
    // because every ad-hoc run used to overwrite it in place).
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT",
      "/tmp/graft_bench_last.json")
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get(outPath), record(withStage, 2) + "\n")
    catch { case _: Throwable => () } // read-only target must not fail the bench
    println(line)
    spark.stop()
  }
}
