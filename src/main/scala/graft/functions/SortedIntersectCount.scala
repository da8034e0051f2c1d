package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * `|A ∩ B|` for two SORTED `array<bigint>` columns via a two-pointer merge —
 * O(n+m) primitive comparisons, zero allocation, whole-stage-codegen'd.
 *
 * The built-in `array_intersect` materializes a hash set per call (boxed
 * longs) and returns the full intersection array just to take its size; on a
 * pair-join with ~10⁵–10⁹ candidate pairs (n-gram / shingle dedup at corpus
 * scale) that's the dominant cost. Callers must pre-sort with `sort_array`
 * (once per document, not per pair) and deduplicate (`array_distinct`).
 */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = a.numElements(); val m = b.numElements()
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // freshName for every local: a fixed name collides (and silently drops the
    // whole stage to interpreted eval) when two instances of this expression
    // land in one generated function.
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val c = ctx.freshName("c")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $i = 0, $j = 0;
      int $n = $a.numElements(), $m = $b.numElements();
      long $c = 0L;
      while ($i < $n && $j < $m) {
        long x = $a.getLong($i);
        long y = $b.getLong($j);
        if (x == y) { $c++; $i++; $j++; }
        else if (x < y) { $i++; }
        else { $j++; }
      }
      ${ev.value} = $c;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column API for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
}
