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

/**
 * [[SortedIntersectCount]] with an EXACT Jaccard-floor early exit: while
 * merging, the best still-achievable intersection is `c + rem` with
 * `rem = min` of the unconsumed tails; once even that cannot reach
 * `jaccard = i/(n+m-i) >= floor`, the merge stops and returns -1.
 *
 * Contract: for any pair whose true Jaccard passes `floor`, the return
 * value IS the exact intersection count (the exit test is conservative by
 * a 0.5 absolute slack, orders of magnitude beyond the 1-ulp rounding of
 * the caller's own `i >= u*floor` / `i/u >= floor` double compare); a
 * below-floor pair returns either its exact count or -1 — both fail the
 * caller's floor filter identically (for floor > 0, -1 fails every form).
 * So swapping this kernel under a floor-filtered pair scan is
 * result-invariant while skipping ~2/3 of merge steps on dissimilar
 * pairs — the dominant population of a low-threshold sweep (q199's sf1
 * dense region measured 15x superlinear with the full merge).
 */
case class SortedIntersectCountBounded(
    left: Expression, right: Expression, floor: Double)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count_bounded"

  // The exit test is hoisted out of the merge's hot path: `imax <
  // (n+m-imax)*floor` rearranges to the PER-PAIR CONSTANT bound
  // `imax < (n+m)*floor/(1+floor)`, and since imax = c + min(tails) only
  // ever decreases, testing it every 32 steps is still conservative (a
  // lazy check can only exit LATER than an eager one). The 0.5 absolute
  // slack dwarfs every double-rounding difference vs the caller's own
  // floor compare, so no passing pair can ever be exited.
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = a.numElements(); val m = b.numElements()
    val bound = (n + m).toDouble * floor / (1.0 + floor) - 0.5
    while (i < n && j < m) {
      if ((c + math.min(n - i, m - j)).toDouble < bound) return -1L
      var lim = 32
      while (lim > 0 && i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
        lim -= 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val c = ctx.freshName("c"); val bound = ctx.freshName("bound")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $i = 0, $j = 0;
      int $n = $a.numElements(), $m = $b.numElements();
      long $c = 0L;
      double $bound = ($n + $m) * $floor / (1.0d + $floor) - 0.5d;
      while ($i < $n && $j < $m) {
        long rem = ($n - $i) < ($m - $j) ? ($n - $i) : ($m - $j);
        if ((double) ($c + rem) < $bound) { $c = -1L; break; }
        int lim = 32;
        while (lim > 0 && $i < $n && $j < $m) {
          long x = $a.getLong($i);
          long y = $b.getLong($j);
          if (x == y) { $c++; $i++; $j++; }
          else if (x < y) { $i++; }
          else { $j++; }
          lim--;
        }
      }
      ${ev.value} = $c;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountBounded =
    copy(left = newLeft, right = newRight)
}

/**
 * [[SortedIntersectCount]] with an EXACT CONTAINMENT-floor early exit — the
 * q81 complement of [[SortedIntersectCountBounded]]: the caller filters
 * `containment = i / min(n, m) >= floor`, so the merge can stop the moment
 * even the best still-achievable intersection `c + min(tails)` cannot reach
 * `floor * min(n, m)`. The Jaccard kernel is NOT reusable here (a small set
 * fully inside a big one passes containment while failing Jaccard — its
 * exit would drop true positives, the reason r19 left q81 on the full
 * kernel); this bound is the containment filter's own.
 *
 * Contract: for any pair whose true containment passes `floor`, the return
 * value IS the exact intersection count — the exit bound carries a 0.5
 * absolute slack below `floor * min(n, m)`, and `c + min(tails)` only ever
 * overestimates the final count, so a passing pair can never be exited
 * (the slack dwarfs the 1-ulp rounding of the caller's own double
 * compare). A below-floor pair returns its exact count or -1; for
 * floor > 0 both fail every `containment >= floor` form identically. The
 * bound is per-pair constant, so it is hoisted and checked every 32 merge
 * steps (lazy checks only exit LATER — still conservative).
 */
case class SortedIntersectCountBoundedContain(
    left: Expression, right: Expression, floor: Double)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "sorted_intersect_count_bounded_contain"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0L
    val n = a.numElements(); val m = b.numElements()
    val bound = math.min(n, m).toDouble * floor - 0.5
    while (i < n && j < m) {
      if ((c + math.min(n - i, m - j)).toDouble < bound) return -1L
      var lim = 32
      while (lim > 0 && i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
        lim -= 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val i = ctx.freshName("i"); val j = ctx.freshName("j")
    val n = ctx.freshName("n"); val m = ctx.freshName("m")
    val c = ctx.freshName("c"); val bound = ctx.freshName("bound")
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      int $i = 0, $j = 0;
      int $n = $a.numElements(), $m = $b.numElements();
      long $c = 0L;
      double $bound = ($n < $m ? $n : $m) * $floor - 0.5d;
      while ($i < $n && $j < $m) {
        long rem = ($n - $i) < ($m - $j) ? ($n - $i) : ($m - $j);
        if ((double) ($c + rem) < $bound) { $c = -1L; break; }
        int lim = 32;
        while (lim > 0 && $i < $n && $j < $m) {
          long x = $a.getLong($i);
          long y = $b.getLong($j);
          if (x == y) { $c++; $i++; $j++; }
          else if (x < y) { $i++; }
          else { $j++; }
          lim--;
        }
      }
      ${ev.value} = $c;""")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCountBoundedContain =
    copy(left = newLeft, right = newRight)
}

object GraftFunctions {
  /** Column API for [[SortedIntersectCount]]. */
  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftColumnBridge.column(SortedIntersectCount(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column API for [[SortedIntersectCountBounded]] — exact under any
    * downstream `jaccard >= floor` filter, -1 (filtered) below it. */
  def sortedIntersectCountBounded(a: Column, b: Column, floor: Double): Column =
    GraftColumnBridge.column(SortedIntersectCountBounded(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), floor))

  /** Column API for [[SortedIntersectCountBoundedContain]] — exact under
    * any downstream `inter / min(|a|,|b|) >= floor` filter, -1 (filtered)
    * below it. */
  def sortedIntersectCountBoundedContain(
      a: Column, b: Column, floor: Double): Column =
    GraftColumnBridge.column(SortedIntersectCountBoundedContain(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b), floor))
}
