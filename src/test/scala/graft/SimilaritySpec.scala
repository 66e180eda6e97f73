package graft

import org.scalatest.funsuite.AnyFunSuite

class SimilaritySpec extends AnyFunSuite {
  import SparkTestSession._

  private def neighbors(name: String): Map[Long, Set[Long]] =
    SparkEntry.queries(name)(spark, sf).collect()
      .groupBy(_.getAs[Long]("query_id"))
      .map { case (q, rs) => q -> rs.map(_.getAs[Long]("neighbor_id")).toSet }

  lazy val exact: Map[Long, Set[Long]] = neighbors("knn_bruteforce")

  test("knn_bruteforce: 10 queries x 5 ranked neighbors, no self-match") {
    val rows = SparkEntry.queries("knn_bruteforce")(spark, sf).collect()
    assert(rows.length == 50)
    rows.foreach { r =>
      assert(r.getAs[Long]("neighbor_id") != r.getAs[Long]("query_id"))
      assert(r.getAs[Double]("cosine") <= 1.0 + 1e-9)
    }
    val ranks = rows.groupBy(_.getAs[Long]("query_id"))
      .values.map(_.map(_.getAs[Int]("rank")).sorted.toSeq)
    ranks.foreach(r => assert(r == (1 to 5)))
  }

  test("knn_lsh recall vs brute force is substantial") {
    val got = neighbors("knn_lsh")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"SRP-LSH recall@5 = $recall")
    assert(recall >= 0.4, s"recall $recall too low")
  }

  test("knn_ivf recall vs brute force is substantial") {
    val got = neighbors("knn_ivf")
    val hits = exact.map { case (q, n) => (got.getOrElse(q, Set.empty) & n).size }.sum
    val recall = hits.toDouble / exact.values.map(_.size).sum
    info(s"IVF nProbe=4/16 recall@5 = $recall")
    assert(recall >= 0.4, s"recall $recall too low")
  }
}
