package graft.functions

import graft.codec.Rfc4180Decode
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point: registers graft's custom Catalyst
  * expressions as SQL functions, so `spark.sql` users get the same surface
  * as the Column API. Install with
  * `.config("spark.sql.extensions", "graft.functions.GraftExtensions")`
  * or `SparkSession.builder().withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    def arity(name: String, n: Int)(children: Seq[Expression]): Seq[Expression] = {
      require(children.length == n,
        s"$name expects $n arguments, got ${children.length}")
      children
    }
    ext.injectFunction((
      FunctionIdentifier("range_remap"),
      new ExpressionInfo(classOf[RangeRemap].getName, "range_remap"),
      (children: Seq[Expression]) => {
        val Seq(v, b, o) = arity("range_remap", 3)(children)
        RangeRemap(v, b, o)
      }))
    ext.injectFunction((
      FunctionIdentifier("rfc4180_decode"),
      new ExpressionInfo(classOf[Rfc4180Decode].getName, "rfc4180_decode"),
      (children: Seq[Expression]) =>
        Rfc4180Decode(arity("rfc4180_decode", 1)(children).head)))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[Expression]) => {
        val Seq(a, b) = arity("cosine_sim", 2)(children)
        CosineSim(a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_doc_tokens"),
      new ExpressionInfo(classOf[BpeDocTokens].getName, "bpe_doc_tokens"),
      (children: Seq[Expression]) => {
        val Seq(t, a, b) = arity("bpe_doc_tokens", 3)(children)
        BpeDocTokens(t, a, b)
      }))
    ext.injectFunction((
      FunctionIdentifier("bpe_doc_ids"),
      new ExpressionInfo(classOf[BpeDocIds].getName, "bpe_doc_ids"),
      (children: Seq[Expression]) => {
        val Seq(t, a, b, v) = arity("bpe_doc_ids", 4)(children)
        BpeDocIds(t, a, b, v)
      }))
    ext.injectFunction((
      FunctionIdentifier("sq_dist_l2"),
      new ExpressionInfo(classOf[SqDistL2].getName, "sq_dist_l2"),
      (children: Seq[Expression]) => {
        val Seq(a, b) = arity("sq_dist_l2", 2)(children)
        SqDistL2(a, b)
      }))
    // literal range join -> codegen'd binary-search remap (plan rewrite)
    ext.injectOptimizerRule(_ => graft.plans.RangeJoinToRemap)
  }
}
