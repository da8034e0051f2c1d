package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * L1 (taxicab) distance of two `array<double>` columns, accumulated
 * left-to-right in fp64 — numerically identical to
 * `aggregate(zip_with(a, b, (x, y) -> abs(x - y)), 0d, _+_)` but
 * whole-stage-codegen'd: the HOF form materializes a fresh 64-element
 * array per pair and evaluates its lambdas interpreted, which dominates
 * blocked near-dup scans (|bucket|² pairs × dim). [[DotProduct]]'s
 * sibling for distance-shaped scores (q181 re-encode matching; any
 * histogram/feature-vector compare).
 */
case class L1Distance(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "l1_distance"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += math.abs(a.getDouble(i) - b.getDouble(i)); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $s += Math.abs($a.getDouble($i) - $b.getDouble($i));
      }
      ${ev.value} = $s;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): L1Distance =
    copy(left = newLeft, right = newRight)
}

object L1Distance {
  def ofColumns(a: Column, b: Column): Column =
    GraftColumnBridge.column(L1Distance(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
