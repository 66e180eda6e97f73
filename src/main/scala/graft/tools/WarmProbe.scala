package graft.tools
import graft._

/** Dev tool: time the bench's `_stage` warm-up (all four families)
  * across fresh sessions — the A/B instrument for the warm-up
  * parallelism (each session re-loads the staged artifacts from the
  * index dir; JVM/JIT warmth is shared, so interleave modes and read
  * the later pairs).
  *
  * Usage: SPARK_GRAFT_INDEX_DIR=... sbt "runMain graft.tools.WarmProbe par seq par seq"
  */
object WarmProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val modes = if (args.nonEmpty) args.toSeq else Seq("par", "seq", "par", "seq")
    modes.foreach { mode =>
      val s = GraftSession.get(cpus)
      val t0 = System.nanoTime()
      val fams: Seq[() => Unit] = Seq(
        () => queries.TextAnalysis.warmStages(s, sfDir),
        () => queries.Dedup.warmStages(s, sfDir),
        () => queries.Similarity.warmStages(s, sfDir),
        () => queries.Multimodal.warmStages(s, sfDir))
      mode match {
        case "par" => FrameCache.warmConcurrently(fams)
        case _ => fams.foreach(_())
      }
      println(f"[warmprobe] $mode ${(System.nanoTime() - t0) / 1e9}%.2f s " +
        s"(loads=${FrameCache.diskStats._2})")
      s.stop()
    }
  }
}
