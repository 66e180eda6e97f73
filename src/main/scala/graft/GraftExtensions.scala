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
      es => L2Norm(es.head)),
    ("quantize_i8", "int8-quantize a float vector at a literal scale",
      es => QuantizeI8(es.head, evalScale(es(1)))),
    ("dequantize_i8", "invert quantize_i8 at the same literal scale",
      es => DequantizeI8(es.head, evalScale(es(1)))),
    ("cosine_sim_i8", "cosine of two int8-quantized vectors",
      es => CosineSimI8(es.head, es(1))),
    ("srp_sig", "signed-random-projection LSH signature (literal nBits)",
      es => SrpSig(es.head, evalInt(es(1)))),
    ("srp_sig_seeded", "seeded SRP signature for multi-table LSH (literal nBits, seed)",
      es => SrpSigSeeded(es.head, evalInt(es(1)), evalLong(es(2)))),
    ("top_cos_ids", "k cosine-nearest codebook indexes (literal k)",
      es => TopCosIds(es.head, es(1), evalInt(es(2)))),
    ("misra_gries", "Misra-Gries heavy-hitters summary of a string column (literal k)",
      es => graft.functions.MisraGriesAgg(es.head, evalInt(es(1)))),
    ("bottom_k", "k smallest (string key, bigint tag) pairs per group (literal k)",
      es => graft.functions.BottomKAgg(es.head, es(1), evalInt(es(2)))),
    ("count_min", "Count-Min sketch counters of a BIGINT column (literal depth, width)",
      es => graft.functions.CountMinAgg(es.head, evalInt(es(1)), evalInt(es(2)))))

  private def evalScale(e: Expression): Float = {
    require(e.foldable, "quantization scale must be a literal")
    e.eval().asInstanceOf[Number].floatValue
  }

  private def evalInt(e: Expression): Int = {
    require(e.foldable, "argument must be a literal")
    e.eval().asInstanceOf[Number].intValue
  }

  private def evalLong(e: Expression): Long = {
    require(e.foldable, "argument must be a literal")
    e.eval().asInstanceOf[Number].longValue
  }

  override def apply(e: SparkSessionExtensions): Unit =
    fns.foreach { case (name, usage, builder) =>
      e.injectFunction((FunctionIdentifier(name), info(name, usage), builder))
    }
}
