package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Fused integer squared-L2 kernel (SURVEY §2.B D12/D16/D18) — the
  * [[CosineSim]] pattern applied to the fixed-point distance every
  * k-means/IVF/PQ plan computes per candidate row: one pass over both
  * long arrays accumulating Σ(x−y)² in a local, no intermediate array.
  * The declarative twin (`aggregate(zip_with(a,b,(x,y)=>(x-y)*(x-y)),
  * 0L, _+_)` — [[graft.llm.KMeans.sqDistDeclarative]]) allocates a
  * difference-product array and walks it again per row, interpreted;
  * in the trainers and probes the distance IS the scan cost, so the
  * fused loop is the hot-path form.
  *
  * Exactly equal to the twin — integer arithmetic, same terms, order
  * irrelevant (no rounding anywhere on the 2^20 grid; a 64-dim
  * distance is ≤ ~2^52, inside Long). NULL if either array is NULL,
  * lengths differ, or any element is NULL (matching zip_with's
  * null-padding propagation). */
case class SqDistL2(a: Expression, b: Expression) extends BinaryExpression {

  override def left: Expression = a
  override def right: Expression = b

  override def checkInputDataTypes(): TypeCheckResult =
    (a.dataType, b.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (x, y) => TypeCheckResult.TypeCheckFailure(
        s"sq_dist_l2 expects (array<bigint>, array<bigint>), got ($x, $y)")
    }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "sq_dist_l2"

  override def nullSafeEval(av: Any, bv: Any): Any = {
    val x = av.asInstanceOf[ArrayData]
    val y = bv.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val d = x.getLong(i) - y.getLong(i)
      acc += d * d
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |final int $n = $x.numElements();
         |if ($n != $y.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }
         |    final long $d = $x.getLong($i) - $y.getLong($i);
         |    $acc += $d * $d;
         |  }
         |  if (!${ev.isNull}) {
         |    ${ev.value} = $acc;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDistL2 =
    copy(a = newLeft, b = newRight)
}

object SqDistL2 {
  /** Column-API entry point. */
  def apply(a: Column, b: Column): Column =
    GraftBridge.column(SqDistL2(
      GraftBridge.expression(a), GraftBridge.expression(b)))
}
