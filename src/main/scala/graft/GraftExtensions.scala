package graft

import graft.functions.expressions._
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for graft's native expressions (SURVEY §2.G): register
  * via `spark.sql.extensions=graft.GraftExtensions` (or
  * `.withExtensions(new GraftExtensions)`) and every function is
  * callable from plain SQL on any node of the cluster.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String, usage: String) =
    new ExpressionInfo(classOf[GraftExtensions].getName, name, usage)

  private val fns: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("fingerprint64", "64-bit rolling polynomial fingerprint of a string",
      es => Fingerprint64(es.head)),
    ("tokenize_words", "lowercased [a-z0-9]+ word tokens",
      es => TokenizeWords(es.head)),
    ("shingles3", "distinct 3-gram word shingles of a token array",
      es => Shingles3(es.head)),
    ("simhash64", "64-bit SimHash of a token array",
      es => SimHash64(es.head)),
    ("minhash_sigs", "128-permutation MinHash signature of a shingle array",
      es => MinHashSigs(es.head)),
    ("cosine_sim", "cosine similarity of two float vectors",
      es => CosineSim(es.head, es(1))),
    ("dot_product", "dot product of two float vectors",
      es => DotProduct(es.head, es(1))),
    ("l2norm", "L2 norm of a float vector",
      es => L2Norm(es.head)))

  override def apply(e: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
