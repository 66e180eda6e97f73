package graft.tools

import graft.{GraftSession, SparkEntry}

/** One-off: recall of each approximate knn query vs its exact baseline
  * at an arbitrary SF dir (the spec pins sf0.001; the driver gates at
  * sf0.01).
  */
object RecallCheck {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    val s = GraftSession.get("8")
    def nb(name: String): Map[Long, Set[Long]] =
      SparkEntry.queries(name)(s, d).collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }
    val exact = nb("knn_bruteforce")
    val exactMip = nb("knn_maxip")
    for ((name, base) <- Seq("knn_lsh" -> exact, "knn_ivf" -> exact,
        "knn_pq" -> exact, "knn_maxip_lsh" -> exactMip)) {
      val got = nb(name)
      val hits = base.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
      println(f"RECALL $name ${hits.toDouble / base.values.map(_.size).sum}%.3f")
    }
    s.stop()
  }
}
