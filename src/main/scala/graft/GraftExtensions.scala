package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.expressions.{ArrayDot, ArrayJaccardFs, ArrayL2Sq, BloomMightContain, MinHashSig, NgramStats, SimHash64}

/** Session extensions: registers graft's native Catalyst expressions
  * as SQL functions. Activate with
  * `.config("spark.sql.extensions", "graft.GraftExtensions")` — then
  * `SELECT graft_simhash64(split(text, ' ')) FROM docs` works in
  * plain SQL, and operators pick the codegen'd implementation over
  * the Column-expression fallback automatically.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach(ext.injectFunction)
}

object GraftExtensions {
  private def arity(name: String, n: Int)(build: Seq[Expression] => Expression)
  : Seq[Expression] => Expression = { children =>
    require(children.length == n,
      s"$name requires exactly $n argument(s), got ${children.length}")
    build(children)
  }

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_simhash64"),
      new ExpressionInfo(classOf[SimHash64].getCanonicalName, "graft_simhash64"),
      arity("graft_simhash64", 1)(c => SimHash64(c.head))),
    (FunctionIdentifier("graft_jaccard_fs"),
      new ExpressionInfo(classOf[ArrayJaccardFs].getCanonicalName, "graft_jaccard_fs"),
      arity("graft_jaccard_fs", 2)(c => ArrayJaccardFs(c(0), c(1)))),
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[ArrayDot].getCanonicalName, "graft_dot"),
      arity("graft_dot", 2)(c => ArrayDot(c(0), c(1)))),
    (FunctionIdentifier("graft_l2sq"),
      new ExpressionInfo(classOf[ArrayL2Sq].getCanonicalName, "graft_l2sq"),
      arity("graft_l2sq", 2)(c => ArrayL2Sq(c(0), c(1)))),
    (FunctionIdentifier("graft_minhash_sig"),
      new ExpressionInfo(classOf[MinHashSig].getCanonicalName, "graft_minhash_sig"),
      arity("graft_minhash_sig", 2)(c => MinHashSig(c(0), c(1)))),
    (FunctionIdentifier("graft_ngram_stats"),
      new ExpressionInfo(classOf[NgramStats].getCanonicalName, "graft_ngram_stats"),
      arity("graft_ngram_stats", 2)(c => NgramStats(c(0), c(1)))),
    (FunctionIdentifier("graft_bloom_might_contain"),
      new ExpressionInfo(classOf[BloomMightContain].getCanonicalName, "graft_bloom_might_contain"),
      arity("graft_bloom_might_contain", 2)(c => BloomMightContain(c(0), c(1)))))
}
