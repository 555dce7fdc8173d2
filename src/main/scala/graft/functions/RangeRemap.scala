package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType}

/** The remap/binning kernel (SURVEY §2.B F9, reference R9/R31) as a native
  * codegen'd Catalyst expression: binary search over sorted half-open
  * bounds.
  *
  * `bounds` is the n+1 sorted bound array of n contiguous ranges
  * ([lo_0, lo_1, ..., lo_{n-1}, hi_{n-1}], the §1.4(3) contiguity
  * invariant makes one array enough); `outs` is the n output values.
  * A value maps to outs(i) for the unique i with
  * bounds(i) <= v < bounds(i+1) — min-inclusive / max-exclusive
  * (pyt:929, §1.4(1)) — and to NULL outside [bounds(0), bounds(n)).
  *
  * Scale posture: this is the J6 phase-2 path from SURVEY §7.4 — remap
  * WITHOUT a join. The broadcast-join formulation probes ranges linearly
  * per row and materializes a joined row; this expression runs inside
  * whole-stage codegen (O(log n) per value, no join operator at all) when
  * the per-layer bounds ride alongside the value, e.g. from a small
  * broadcast of one array-typed row per layer.
  */
case class RangeRemap(value: Expression, bounds: Expression, outs: Expression)
    extends TernaryExpression {

  override def first: Expression = value
  override def second: Expression = bounds
  override def third: Expression = outs

  override def checkInputDataTypes(): TypeCheckResult =
    (value.dataType, bounds.dataType, outs.dataType) match {
      case (DoubleType, ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (v, b, o) => TypeCheckResult.TypeCheckFailure(
        s"range_remap expects (double, array<double>, array<int>), got ($v, $b, $o)")
    }
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "range_remap"

  override def nullSafeEval(v: Any, bs: Any, os: Any): Any = {
    val x = v.asInstanceOf[Double]
    val b = bs.asInstanceOf[ArrayData]
    val o = os.asInstanceOf[ArrayData]
    val n = b.numElements()
    // malformed input (outs arity mismatch, null bounds) -> null, never an
    // out-of-bounds read: this is SQL-exposed via GraftExtensions.
    // NaN maps nowhere (its comparisons are all false, which would
    // otherwise fall through the guards INTO the binary search and
    // silently land in bucket 0 — diverging from the join formulation,
    // where a NaN value matches no range)
    if (x != x || n < 2 || o.numElements() != n - 1 ||
        b.isNullAt(0) || b.isNullAt(n - 1) ||
        x < b.getDouble(0) || x >= b.getDouble(n - 1)) null
    else {
      var lo = 0
      var hi = n - 1
      while (lo + 1 < hi) {
        val m = (lo + hi) >>> 1
        if (!b.isNullAt(m) && b.getDouble(m) <= x) lo = m else hi = m
      }
      if (o.isNullAt(lo)) null else o.getInt(lo)
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (v, b, o) => {
      val n = ctx.freshName("n")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val m = ctx.freshName("m")
      s"""
         |final int $n = $b.numElements();
         |if (java.lang.Double.isNaN($v) || $n < 2 || $o.numElements() != $n - 1 ||
         |    $b.isNullAt(0) || $b.isNullAt($n - 1) ||
         |    $v < $b.getDouble(0) || $v >= $b.getDouble($n - 1)) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $lo = 0;
         |  int $hi = $n - 1;
         |  while ($lo + 1 < $hi) {
         |    final int $m = ($lo + $hi) >>> 1;
         |    if (!$b.isNullAt($m) && $b.getDouble($m) <= $v) $lo = $m; else $hi = $m;
         |  }
         |  if ($o.isNullAt($lo)) { ${ev.isNull} = true; }
         |  else { ${ev.value} = $o.getInt($lo); }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): RangeRemap =
    copy(value = newFirst, bounds = newSecond, outs = newThird)
}

object RangeRemap {
  /** Column-API entry point. */
  def apply(value: Column, bounds: Column, outs: Column): Column =
    GraftBridge.column(RangeRemap(
      GraftBridge.expression(value),
      GraftBridge.expression(bounds),
      GraftBridge.expression(outs)))
}
