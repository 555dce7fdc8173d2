package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Fused cosine-similarity kernel (SURVEY §2.B D3) as a native codegen'd
  * Catalyst expression: ONE pass over both arrays accumulating dot, |a|²
  * and |b|² in locals. The declarative formulation
  * (`aggregate(zip_with(a,b,_*_),...)` three times) allocates an
  * intermediate product array and walks each input three times per row —
  * at 100 TB the kernel IS the cost of a similarity scan, so the fused
  * loop is the hot-path form; the zip_with composition remains the
  * reference semantics.
  *
  * Bit-exact with the declarative form: each accumulator adds the same
  * terms in the same index order (same IEEE rounding sequence), and the
  * result is dot / (sqrt(na) * sqrt(nb)) — including 0/0 = NaN for empty
  * or all-zero inputs. NULL if either array is NULL, lengths differ, or
  * any element is NULL (zip_with pads the shorter side with null and the
  * null propagates through the sum the same way).
  */
case class CosineSim(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (x, y) => TypeCheckResult.TypeCheckFailure(
        s"cosine_sim expects (array<double>, array<double>), got ($x, $y)")
    }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xi = x.getDouble(i)
      val yi = y.getDouble(i)
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final double $xi = $x.getDouble($i);
         |    final double $yi = $y.getDouble($i);
         |    $dot += $xi * $yi;
         |    $na += $xi * $xi;
         |    $nb += $yi * $yi;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(a = newLeft, b = newRight)
}

object CosineSim {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(CosineSim(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
