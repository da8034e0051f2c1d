package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Dot product of two `array<double>` columns, accumulated left-to-right in
 * fp64 — numerically identical to
 * `aggregate(zip_with(a, b, _*_), 0d, _+_)` and to DuckDB's
 * `list_dot_product` (the oracle), but whole-stage-codegen'd: Spark's
 * higher-order functions evaluate lambdas interpreted per element, which
 * dominates brute-force similarity scans (|corpus|×|queries| pairs × dim).
 */
case class DotProduct(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName for every local: a fixed name collides (and silently drops the
    // whole stage to interpreted eval) when two instances of this expression
    // land in one generated function.
    val n = ctx.freshName("n"); val s = ctx.freshName("s"); val i = ctx.freshName("i")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $n = Math.min($a.numElements(), $b.numElements());
      double $s = 0.0;
      for (int $i = 0; $i < $n; $i++) {
        $s += $a.getDouble($i) * $b.getDouble($i);
      }
      ${ev.value} = $s;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

object DotProduct {
  def ofColumns(a: Column, b: Column): Column =
    GraftColumnBridge.column(DotProduct(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
