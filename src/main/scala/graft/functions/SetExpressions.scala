package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodeGenerator, CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** |A ∩ B| for two SORTED long arrays (caller contract: `array_sort` of
  * distinct elements) via a linear merge — no per-pair hash set, no boxing.
  *
  * The hot path of candidate-pair verification in near-dup operators:
  * Spark's `array_intersect` allocates and fills an OpenHashSet per call;
  * on millions of candidate pairs × hundreds of elements the merge loop is
  * ~5× cheaper and stays inside WholeStageCodegen. Equal to
  * `size(array_intersect(a, b))` for sorted distinct inputs.
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {
  override def prettyName: String = "sorted_intersect_count"
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    val (n, m) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0L
    while (i < n && j < m) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val Seq(i, j, n, m, c, xv, yv) = Seq("i", "j", "n", "m", "c", "xv", "yv").map(ctx.freshName)
      s"""
        |int $n = $a.numElements(); int $m = $b.numElements();
        |int $i = 0; int $j = 0; long $c = 0L;
        |while ($i < $n && $j < $m) {
        |  long $xv = $a.getLong($i); long $yv = $b.getLong($j);
        |  if ($xv == $yv) { $c++; $i++; $j++; }
        |  else if ($xv < $yv) $i++; else $j++;
        |}
        |${ev.value} = $c;
      """.stripMargin
    })
  override protected def withNewChildrenInternal(l: Expression, r: Expression): Expression = copy(l, r)
}
