package graft.functions

import org.apache.spark.sql.{Column, GraftColumnBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, IntegerType}

/**
 * Index (0-based) of the nearest center to an `array<double>` column under
 * squared-L2, over a plan-time-constant codebook — the map-only quantizer
 * assignment behind [[graft.operators.IvfIndex.build]].
 *
 * Numerics are BIT-IDENTICAL to the declarative form
 * `argmin_c aggregate(zip_with(emb, cb[c], (a,b) -> (a-b)*(a-b)), 0d, +)`
 * with first-minimum (lowest cell id) ties — the same fold
 * `IvfIndex.assignCells` evaluates, so build-vs-maintain assignment parity
 * is preserved by construction (IvfMaintainSpec pins it). It exists because
 * Spark's higher-order functions evaluate lambdas interpreted per element:
 * a nCells × dim HOF scan costs ~10³ interpreted expression-node evals per
 * row (measured 7 s of single-task CPU on q51's 16×64 assignment at sf0.1),
 * where this whole-stage-codegen'd loop is plain fused arithmetic.
 *
 * The codebook ships as a codegen reference object (one `double[][]` per
 * plan, serialized once per executor) — never a per-row literal walk.
 */
case class NearestCenter(child: Expression, centers: Array[Array[Double]])
  extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_center"

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    var best = 0
    var bd = Double.MaxValue
    var c = 0
    while (c < centers.length) {
      val ctr = centers(c)
      val n = math.min(a.numElements(), ctr.length)
      var d2 = 0.0
      var d = 0
      while (d < n) { val diff = a.getDouble(d) - ctr(d); d2 += diff * diff; d += 1 }
      if (d2 < bd) { bd = d2; best = c }
      c += 1
    }
    best
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("centers", centers, "double[][]")
    val best = ctx.freshName("best"); val bd = ctx.freshName("bd")
    val c = ctx.freshName("c"); val d2 = ctx.freshName("d2")
    val d = ctx.freshName("d"); val n = ctx.freshName("n")
    val ctr = ctx.freshName("ctr"); val diff = ctx.freshName("diff")
    nullSafeCodeGen(ctx, ev, a => s"""
      int $best = 0;
      double $bd = Double.MAX_VALUE;
      for (int $c = 0; $c < $cb.length; $c++) {
        double[] $ctr = $cb[$c];
        int $n = Math.min($a.numElements(), $ctr.length);
        double $d2 = 0.0;
        for (int $d = 0; $d < $n; $d++) {
          double $diff = $a.getDouble($d) - $ctr[$d];
          $d2 += $diff * $diff;
        }
        if ($d2 < $bd) { $bd = $d2; $best = $c; }
      }
      ${ev.value} = $best;""")
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCenter = copy(child = newChild)
}

object NearestCenter {
  def ofColumn(emb: Column, centers: Array[Array[Double]]): Column =
    GraftColumnBridge.column(NearestCenter(
      GraftColumnBridge.expression(emb), centers))
}
