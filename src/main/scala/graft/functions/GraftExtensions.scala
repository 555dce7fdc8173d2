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
    ext.injectFunction((
      FunctionIdentifier("range_remap"),
      new ExpressionInfo(classOf[RangeRemap].getName, "range_remap"),
      (children: Seq[Expression]) =>
        RangeRemap(children(0), children(1), children(2))))
    ext.injectFunction((
      FunctionIdentifier("rfc4180_decode"),
      new ExpressionInfo(classOf[Rfc4180Decode].getName, "rfc4180_decode"),
      (children: Seq[Expression]) => Rfc4180Decode(children.head)))
  }
}
